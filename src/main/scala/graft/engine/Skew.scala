package graft.engine

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/** Skew-handling utilities for the aggregation shapes AQE does not fix.
  *
  * AQE's skew-join splitting covers shuffle joins; a heavy-hitter
  * `groupBy` (one label holding 30% of a 100 TB table — exactly the DPE
  * label distribution shape) still funnels each hot key through a single
  * reducer. The standard fix is two-phase aggregation: salt the key,
  * aggregate partially per (key, salt), then merge the salt buckets.
  * Works for any algebraic aggregate (sum/count/min/max, decimal sums).
  *
  * Salting uses a deterministic hash of a tiebreak column rather than
  * rand() so results and partitioning are reproducible run-to-run.
  */
object Skew {

  /** Two-phase aggregation: `aggs` are applied per (keys, salt), then the
    * provided `merge` expressions combine the salt buckets. For purely
    * algebraic aggregates the same function works for both phases —
    * `twoPhaseAlgebraic` covers that common case. */
  def twoPhaseAgg(df: DataFrame, keys: Seq[String], saltCol: Column,
      buckets: Int, aggs: Seq[Column], merge: Seq[Column]): DataFrame = {
    val salted = df.withColumn("__salt", pmod(hash(saltCol), lit(buckets)))
    val phase1 = salted
      .groupBy((keys.map(col) :+ col("__salt")): _*)
      .agg(aggs.head, aggs.tail: _*)
    phase1.groupBy(keys.map(col): _*).agg(merge.head, merge.tail: _*)
  }

  /** Algebraic sum/count/min/max pipeline: each entry is
    * (outputName, aggregate builder, merge builder). */
  def twoPhaseAlgebraic(df: DataFrame, keys: Seq[String], saltCol: Column,
      buckets: Int,
      specs: Seq[(String, Column => Column, Column => Column)],
      valueCols: Seq[String]): DataFrame = {
    val aggs = specs.zip(valueCols).map { case ((name, f, _), v) =>
      f(col(v)).as(name)
    }
    val merges = specs.map { case (name, _, m) => m(col(name)).as(name) }
    twoPhaseAgg(df, keys, saltCol, buckets, aggs, merges)
  }

  /** Salted sum of a decimal-cast column — the engine's standard
    * deterministic measure aggregation, skew-proofed. */
  def saltedDecimalSum(df: DataFrame, keys: Seq[String], valueCol: String,
      saltCol: Column, buckets: Int = 32, scale: String = "decimal(18,2)",
      as: String = "sum_value"): DataFrame =
    twoPhaseAgg(df, keys, saltCol, buckets,
      aggs = Seq(sum(col(valueCol).cast(scale)).as(as)),
      merge = Seq(sum(col(as)).as(as)))
}
