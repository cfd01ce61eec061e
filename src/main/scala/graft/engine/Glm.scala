package graft.engine

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/** Single-predictor logistic regression by iteratively reweighted least
  * squares (IRLS — the canonical GLM fit), as a FIXED number of unrolled
  * closed-form rounds, so the DuckDB oracle can replay the whole solve
  * (the q_ols_multi/q_pca_project precedent).
  *
  * Each round is ONE aggregation pass: per-row η = β₀ + β₁x, μ =
  * σ(η), w = μ(1−μ), working response z = η + (y−μ)/w, then the 2×2
  * weighted normal equations solve in closed form (Cramer). β updates
  * round to the 8dp grid between rounds.
  *
  * Determinism: x and y are exact; η is the shared IEEE expression;
  * σ(η) is the ONE transcendental — its result rounds to the 6dp grid
  * at birth (coarser than the house 8dp ln rule: with corpus-scale row
  * counts the probability of an exp() landing within a cross-libm ulp
  * of a ROUNDING boundary scales with rows×rounds, and 6dp buys 100×
  * margin at zero statistical cost), μ clamps to (ε, 1−ε) so w > 0,
  * every per-row moment term rounds to 8dp and sums in DECIMAL, and
  * the β solve is a scalar double formula rounded to 8dp.
  *
  * Shape: `iters` aggregation passes over the data (no joins — β is a
  * broadcast scalar row), map-side partials throughout — the textbook
  * distributed-GLM shape. */
object Glm {

  def logisticIrls(df: DataFrame, yCol: Column, xCol: Column,
      iters: Int = 3): DataFrame = {
    require(iters >= 1 && iters <= 10, s"iters=$iters")
    val spark = df.sparkSession
    import spark.implicits._
    // The IRLS working set, materialized ONCE: every round is a full
    // pass over (y, x), and without this each round re-runs the source
    // scan + cast chain (3 parquet decodes of the fit columns at
    // iters=3, plus whatever joins fed `df`). Two doubles per row is
    // the classic cached-training-set shape (16 B/row — ~10 GB across a
    // 1000-executor cluster at 600M rows, far under the input it
    // replaces). Measured at sf0.1 (isolated): q_logreg_irls 5.86 →
    // 5.42 s (REPS=5 min), q_calibration 7.66 → 7.14 s (REPS=3) — a
    // MODEST local win because per-round codegen/scheduling dominates
    // at 600k rows, but the scan elimination is the term that matters
    // at scale: iters+1 passes over the raw source become one
    // projection write + iters+1 passes over 16 B/row.
    // persist (NOT localCheckpoint): a checkpoint truncates lineage, so
    // on a real cluster one lost executor mid-fit kills the job with
    // unrecoverable blocks — persist keeps the recompute path; and the
    // blocks release DETERMINISTICALLY in the finally below instead of
    // waiting on ContextCleaner's GC-driven weak references (the
    // "persist leaks" round-1 lesson — safe here because every consumer
    // of `base` finishes inside this function; the returned betas are
    // literals).
    // Partitioning.spread: the 16 B/row working set inherits the SOURCE
    // scan's split count — 3 splits at sf0.1 (openCostInBytes floors the
    // 9.2 MB lineitem at 4 MB/split), so every IRLS round ran 3 tasks on
    // a 32-core session (ProfileQ: 3 × ~2.3 s stages = 70% of the
    // query). Round-robin-spreading the projection BEFORE persist puts
    // all `iters` passes at full parallelism; at 100 TB the guard
    // no-ops (scan splits >> cores). Sums are e8-integer-grid → order-
    // free, so redistribution cannot change a bit of the result.
    val base = Partitioning.spread(
      df.select(yCol.cast("double").as("y"),
          xCol.cast("double").as("x"))
        .where(col("y").isNotNull && col("x").isNotNull))
      .persist(org.apache.spark.storage.StorageLevel.MEMORY_AND_DISK)

    // 8dp-grid term in exact integer 1e-8 units: the INNER round is the
    // oracle's ROUND(expr, 8) verbatim; extracting its integer numerator
    // (×1e8 lands within an ulp of the integer, the outer round snaps
    // it) lets the sums run in LongType — measured ~2 s/round cheaper
    // than DECIMAL(28,8) sums at sf0.1, with identical totals
    // (Σ kᵢ·1e-8 = (Σ kᵢ)/1e8 exactly, converted back through
    // BigDecimal so the double is the correctly-rounded value at ANY
    // magnitude — a bare toDouble/1e8 double-rounds past 2^53 units).
    // Capacity: int64 wraps past ~3e11 rows per fit — shard and merge
    // beyond (the CovSums note).
    def e8(c: Column): Column =
      round(round(c, 8) * 100000000L).cast("long")

    // β travels through the rounds as a DRIVER-side pair of 8dp-grid
    // doubles injected as literals (the BPE-argmax/PCA documented-
    // collect class: ONE 2-value row per round, never row-scale) — a
    // nested broadcast-lineage formulation re-plans and re-codegens the
    // whole tower per consumer, measured 14.8 s vs ~1 s at sf0.1
    var b0 = 0.0
    var b1 = 0.0
    var n = 0L
    try {
    for (_ <- 1 to iters) {
      val eta = lit(b0) + lit(b1) * col("x")
      val mu0 = round(lit(1.0) / (lit(1.0) + exp(-eta)), 6)
      val mu = least(greatest(mu0, lit(1e-6)), lit(1.0 - 1e-6))
      val w = round(mu * (lit(1.0) - mu), 6)
      val z = eta + (col("y") - mu) / w
      // w and z materialize as projection columns FIRST: as aggregate
      // children the sigmoid chain would re-evaluate once per moment
      // expression (5× per row — measured 4 s vs <1 s per round at
      // sf0.1; the HOF-materialization rule)
      val row = base.select(col("x"), w.as("w"), z.as("z")).agg(
        count(lit(1)).as("n"),
        sum(e8(col("w"))).as("sw"),
        sum(e8(col("w") * col("x"))).as("swx"),
        sum(e8(col("w") * col("x") * col("x"))).as("swxx"),
        sum(e8(col("w") * col("z"))).as("swz"),
        sum(e8(col("w") * col("x") * col("z"))).as("swxz")).head()
      n = row.getAs[Long]("n")
      // empty input: the sums come back NULL (getAs would unbox to 0
      // and the solve would NaN-crash the driver) — return the
      // degenerate row, matching the lazy formulation's NULL betas
      if (n == 0L || row.isNullAt(row.fieldIndex("sw"))) {
        return Seq((n, Option.empty[Double], Option.empty[Double]))
          .toDF("n", "b0", "b1")
      }
      // unit sums → values via BigDecimal(unscaled, 8): the correctly-
      // rounded Σk·1e-8, bit-equal to the oracle's DECIMAL(28,8)→DOUBLE
      // cast at any magnitude
      def v(name: String): Double =
        new java.math.BigDecimal(
          java.math.BigInteger.valueOf(row.getAs[Long](name)), 8)
          .doubleValue()
      val sw = v("sw")
      val swx = v("swx")
      val swxx = v("swxx")
      val swz = v("swz")
      val swxz = v("swxz")
      val det = sw * swxx - swx * swx
      val b1Raw = (sw * swxz - swx * swz) / det
      // degenerate design (constant x → det 0, or zero weight mass):
      // NULL betas, never a driver NaN crash (BigDecimal(NaN) throws)
      if (!java.lang.Double.isFinite(b1Raw) || sw == 0.0) {
        return Seq((n, Option.empty[Double], Option.empty[Double]))
          .toDF("n", "b0", "b1")
      }
      // b1 rounds to the grid FIRST and the rounded value feeds b0 —
      // one unambiguous association order for the oracle to mirror
      b1 = BigDecimal(b1Raw)
        .setScale(8, BigDecimal.RoundingMode.HALF_UP).toDouble
      b0 = BigDecimal((swz - b1 * swx) / sw)
        .setScale(8, BigDecimal.RoundingMode.HALF_UP).toDouble
    }
    // Option-wrapped so both exits share one nullable schema
    Seq((n, Option(b0), Option(b1))).toDF("n", "b0", "b1")
    // the finally covers BOTH early returns and the normal exit — the
    // blocking=false release is async but explicit (no GC dependence)
    } finally base.unpersist(blocking = false)
  }
}
