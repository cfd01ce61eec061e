package graft.llm

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

/** Distributed PCA (top principal component) over an embedding corpus —
  * the dimensionality-analysis step of an embedding pipeline, shaped for
  * 100 TB:
  *
  *   1. ONE distributed pass: the [[CovSums]] map-side-combining aggregate
  *      reduces the corpus to a (dim²/2 + dim + 1)-long buffer;
  *   2. the eigensolve runs on the DRIVER over the tiny dim×dim matrix
  *      (64×64 here) — O(dim²·iters) work, the same collect-a-constant
  *      pattern as the statistics tier, never O(rows);
  *   3. projection is a broadcast-free MAP-ONLY expression (the component
  *      vector inlines as 64 integer literals into one codegen'd
  *      projection) — no shuffle at all.
  *
  * Determinism contract (the DuckDB oracle replays the identical solve
  * relationally): the covariance matrix is the 8dp-rounded cells of
  * [[Covariance.covarianceCells]] (proven engine-identical); power
  * iteration runs in 2^20 fixed point where every sum is EXACT integer
  * arithmetic (order-free) and the only float steps are
  * division/multiplication/sqrt — all IEEE-exactly-rounded (sqrt is, ln
  * is not — that is why this uses power iteration, not an SVD), followed
  * by floor. Start vector is the exact constant 1/8 per component
  * (unit-norm for dim 64).
  */
object Pca {

  private val Scale = 1048576.0 // 2^20

  /** Power iteration in exact fixed point over the 8dp covariance cells.
    * Returns the 2^20-scaled component vector after `iters` rounds.
    * `cells` = (i, j, cov) upper triangle, 1-based. */
  def topComponentFixed(cells: Seq[(Int, Int, Double)], dim: Int,
      iters: Int): Array[Long] = {
    require(iters >= 1 && dim >= 1)
    // full matrix in 2^20 fixed point (floor, matching the SQL replay)
    val cfx = Array.ofDim[Long](dim, dim)
    cells.foreach { case (i, j, c) =>
      val v = math.floor(c * Scale).toLong
      cfx(i - 1)(j - 1) = v
      cfx(j - 1)(i - 1) = v
    }
    var v = Array.fill(dim)(131072L) // 0.125 * 2^20 — exact unit start
    for (_ <- 1 to iters) {
      // w = C·v (exact), rescaled back to 2^20 via floor(w / 2^20)
      val d = Array.tabulate(dim) { i =>
        var w = 0L
        var j = 0
        while (j < dim) { w += cfx(i)(j) * v(j); j += 1 }
        math.floor(w / Scale).toLong
      }
      val ss = d.map(x => x * x).sum // exact: |d_i| ≲ 2^26
      // renormalize to unit (2^20 scale); a zero matrix keeps the vector
      v =
        if (ss == 0L) v
        else d.map(x => math.floor(x.toDouble * Scale / math.sqrt(ss.toDouble)).toLong)
    }
    v
  }

  /** Projection scores of every embedding onto the top component.
    * Output: idCol, score (8dp). Map-only: embeddings quantize to 2^16
    * fixed point per component, the dot with the 2^20-scale component is
    * exact int64, and one division rescales (2^36). */
  def pcaProject(emb: DataFrame, idCol: String, vecCol: String,
      dim: Int, iters: Int): DataFrame = {
    val cells = Covariance.covarianceCells(emb, vecCol, dim)
      .select("i", "j", "cov").collect()
      .map(r => (r.getLong(0).toInt, r.getLong(1).toInt, r.getDouble(2)))
    val comp = topComponentFixed(cells.toSeq, dim, iters)
    val fx = transform(col(vecCol),
      x => floor(x.cast("double") * lit(65536.0)).cast("long"))
    val dot = (0 until dim)
      .map(j => element_at(col("__fx"), j + 1) * lit(comp(j)))
      .reduce(_ + _)
    emb.select(col(idCol), fx.as("__fx"))
      .select(col(idCol),
        round(dot.cast("double") / lit(68719476736.0), 8).as("score")) // 2^36
  }
}
