package graft.engine

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types.NumericType

/** Column profiling: per-column non-null count, exact distinct count, and
  * min/max (numeric as double, other types as string) — the data-quality
  * report a pipeline runs before trusting a new extract (the reference
  * eyeballs dtype maps instead; this is its first-class analog).
  *
  * Scale: ONE aggregation job for all columns. Exact `countDistinct` over
  * many columns expands the input (one replica per distinct-aggregate) —
  * the exact report is for bounded column lists; pass `approx = true` to
  * swap in `approx_count_distinct` (HLL, no expand, one pass) when
  * profiling very wide/large tables where ±2% on distinct counts is fine.
  */
object Profile {

  def profile(df: DataFrame, columns: Seq[String],
      approx: Boolean = false): DataFrame = {
    require(columns.nonEmpty, "profile needs at least one column")
    val numeric = df.schema.fields
      .filter(_.dataType.isInstanceOf[NumericType]).map(_.name).toSet
    val aggs = columns.flatMap { c =>
      val nd = if (approx) approx_count_distinct(col(c))
        else countDistinct(col(c))
      Seq(count(col(c)).as(s"__nn_$c"), nd.as(s"__nd_$c")) ++ (
        if (numeric(c)) Seq(
          min(col(c)).cast("double").as(s"__mn_$c"),
          max(col(c)).cast("double").as(s"__mx_$c"),
          min(lit(null).cast("string")).as(s"__ms_$c"),
          min(lit(null).cast("string")).as(s"__xs_$c"))
        else Seq(
          min(lit(null).cast("double")).as(s"__mn_$c"),
          min(lit(null).cast("double")).as(s"__mx_$c"),
          min(col(c).cast("string")).as(s"__ms_$c"),
          max(col(c).cast("string")).as(s"__xs_$c")))
    }
    df.agg(aggs.head, aggs.tail: _*)
      .select(explode(array(columns.map(c => struct(
        lit(c).as("column_name"),
        col(s"__nn_$c").as("n_nonnull"),
        col(s"__nd_$c").as("n_distinct"),
        col(s"__mn_$c").as("min_num"),
        col(s"__mx_$c").as("max_num"),
        col(s"__ms_$c").as("min_str"),
        col(s"__xs_$c").as("max_str"))): _*)).as("p"))
      .select("p.*")
  }

  /** Equal-frequency discretization WITHOUT a global sort: one exact-
    * percentile aggregation computes the `buckets − 1` interior cut
    * points, then assignment is a map-side broadcast-join + when-chain —
    * the scale-correct form of `ntile()` over an unpartitioned window
    * (which funnels every row through one task). Buckets are 1-based;
    * values are assigned to the first bucket whose cut is ≥ the value
    * (boundary values go to the LOWER bucket — ties share a bucket, so
    * the result is value-based and partitioning-independent; bucket
    * populations are only approximately equal in the presence of ties,
    * the standard equal-frequency caveat). Nulls get bucket null. */
  def quantileBuckets(df: DataFrame, valueCol: String, buckets: Int,
      outCol: String = "bucket"): DataFrame = {
    require(buckets >= 2, s"buckets=$buckets")
    require(!df.columns.contains("__cuts"),
      "input already has a __cuts column")
    require(!df.columns.contains(outCol),
      s"input already has a '$outCol' column — pass a different outCol")
    val qs = (1 until buckets).map(_.toDouble / buckets)
    // exact cuts by default; spark.graft.percentile.approx swaps in the
    // bounded-memory sketch (Percentiles) with the identical plan shape
    val cuts = df.agg(Percentiles.pct(df.sparkSession, col(valueCol),
      lit(qs.toArray)).as("__cuts"))
    val assign = (1 until buckets).reverse
      .foldLeft(lit(buckets).cast("long")) { (acc, b) =>
        when(col(valueCol) <= element_at(col("__cuts"), b), lit(b).cast("long"))
          .otherwise(acc)
      }
    df.join(broadcast(cuts))
      .withColumn(outCol,
        when(col(valueCol).isNull, lit(null)).otherwise(assign))
      .drop("__cuts")
  }
}
