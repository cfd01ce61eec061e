package graft.engine

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/** Poisson bootstrap confidence intervals (Chamandy et al. 2012, the
  * scale-correct bootstrap): instead of resampling n rows with
  * replacement — impossible to coordinate across a cluster — every row
  * independently draws a Poisson(1) weight per replicate, which matches
  * the multinomial bootstrap to O(1/n) and needs no global coordination
  * at all.
  *
  * Determinism: the Poisson draw never touches floating point — the
  * first 8 hex chars of `md5(seed|key|replicate)` compare against
  * PRECOMPUTED hex thresholds of the Poisson(1) CDF quantized to 2^32
  * (the md5-uniform house convention), so both engines draw identical
  * weights. The tail truncates at w = 10 (mass ≈ 1e-8 — a documented
  * bias far below the CI's own Monte-Carlo error). Replicate means are
  * exact-DECIMAL-sum ratios; the CI is the exact interpolated
  * percentile over the B replicate means.
  *
  * Shape: rows explode ×B map-side, aggregate with map-side partials
  * to (group, replicate) — the shuffle carries B rows per group. */
object Bootstrap {

  /** Poisson(1) CDF quantized to 2^32, as md5-comparable hex literals:
    * weight w = number of thresholds the hash prefix is ≥. */
  private val PoissonCdfHex = Seq(
    "5e2d58d8", "bc5ab1b1", "eb715e1d", "fb239797", "ff1025f5",
    "ffd90f3b", "fffa8b71", "ffff540c", "ffffed1f", "fffffe21",
    "ffffffd4")

  /** The CASE ladder mapping a hex prefix to its Poisson(1) weight —
    * exposed so oracle SQL can be generated from the same constants. */
  def poissonCaseSql(prefixExpr: String): String =
    "CASE " + PoissonCdfHex.zipWithIndex.map { case (h, i) =>
      s"WHEN $prefixExpr < '$h' THEN $i"
    }.mkString(" ") + s" ELSE ${PoissonCdfHex.length} END"

  private def poissonWeight(prefix: Column): Column =
    PoissonCdfHex.zipWithIndex.foldRight(
      lit(PoissonCdfHex.length): Column) { case ((h, i), acc) =>
      when(prefix < lit(h), i).otherwise(acc)
    }

  /** Percentile-bootstrap CI for the per-group mean of `valueCol`:
    * B replicates of the Poisson-weighted mean, then the exact
    * interpolated (lo, hi) percentiles across replicates. `keyCol`
    * must uniquely identify a row (it seeds the draw). Output: group,
    * n, mean, ci_lo, ci_hi. */
  def meanCi(df: DataFrame, groupCol: String, valueCol: String,
      keyCol: Column, b: Int = 50, lo: Double = 0.025,
      hi: Double = 0.975, seed: String = "boot"): DataFrame = {
    require(b >= 2 && lo < hi, s"b=$b lo=$lo hi=$hi")
    val base = df.where(col(valueCol).isNotNull)
      .select(col(groupCol).as("g"),
        col(valueCol).cast("decimal(18,2)").as("x"),
        keyCol.cast("string").as("k"))
    val exploded = base
      .select(col("g"), col("x"), col("k"),
        explode(sequence(lit(1), lit(b))).as("rep"))
      .withColumn("w", poissonWeight(substring(
        md5(concat(lit(s"$seed|"), col("k"), lit("|"),
          col("rep").cast("string"))), 1, 8)))
    val reps = exploded.groupBy(col("g"), col("rep"))
      .agg(sum(col("w").cast("decimal(28,0)") * col("x")).as("ws"),
        sum(col("w")).as("wn"))
      .select(col("g"), col("rep"),
        when(col("wn") > 0,
          col("ws").cast("double") / col("wn").cast("double"))
          .as("rep_mean"))
      .where(col("rep_mean").isNotNull)
    val point = base.groupBy(col("g"))
      .agg(count(lit(1)).as("n"),
        (sum(col("x")).cast("double") / count(lit(1))).as("mean"))
    point.join(
      reps.groupBy(col("g")).agg(
        round(percentile(col("rep_mean"), lit(lo)), 8).as("ci_lo"),
        round(percentile(col("rep_mean"), lit(hi)), 8).as("ci_hi")),
      "g")
      .select(col("g").as(groupCol), col("n"), round(col("mean"), 8)
        .as("mean"), col("ci_lo"), col("ci_hi"))
  }
}
