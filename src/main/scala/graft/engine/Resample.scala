package graft.engine

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/** Time-series regularization: resample irregular events onto a fixed
  * epoch-aligned grid and forward-fill the gaps — the standard shape for
  * turning an event stream into model-ready fixed-step features
  * (pandas' `resample().ffill()`, beyond the reference's surface).
  *
  * Scale design (100 TB):
  *   - The per-bucket representative is a keep-last window over (key,
  *     bucket) — same shuffle as any per-key window; explicit (ts, id)
  *     tiebreak keeps it deterministic under any partitioning.
  *   - The spine is generated per key from that key's own [min, max]
  *     bucket range (`sequence` + `explode`) — never a global calendar
  *     cross-join; a key's spine length is its own activity span.
  *   - The forward fill is one running `last(ignoreNulls)` window on the
  *     already-bucketed rows — linear, one shuffle, the same running-state
  *     trick as the as-of join.
  */
object Resample {

  /** Resample `df` onto a `stepUs`-wide grid per `keys`: one row per
    * (key, bucket) between each key's first and last event, carrying the
    * LAST observed `valueCol` in the bucket (ties broken by `usCol` then
    * `idCol` descending — latest wins), forward-filled across empty
    * buckets into `<valueCol>_ffill`.
    *
    * `usCol` must be epoch microseconds (long, non-negative — integral
    * truncation equals floor there, and the grid stays exact where double
    * arithmetic would round past 2^52).
    */
  def resampleFfill(df: DataFrame, keys: Seq[String], usCol: String,
      idCol: String, valueCol: String, stepUs: Long): DataFrame = {
    require(stepUs > 0, s"stepUs=$stepUs")
    val bucket = (col(usCol) - pmod(col(usCol), lit(stepUs))).as("__bucket")
    val based = df.select(
      keys.map(col) ++ Seq(col(usCol), col(idCol), col(valueCol), bucket): _*)
    // one representative per (key, bucket): the latest event in the bucket
    val wLast = Window.partitionBy((keys :+ "__bucket").map(col): _*)
      .orderBy(col(usCol).desc, col(idCol).desc)
    val points = based.withColumn("__rn", row_number().over(wLast))
      .where(col("__rn") === 1)
      .select(keys.map(col) ++ Seq(col("__bucket"), col(valueCol)): _*)
    // per-key spine across that key's own activity span
    val spine = based.groupBy(keys.map(col): _*)
      .agg(min(col("__bucket")).as("__lo"), max(col("__bucket")).as("__hi"))
      .select(keys.map(col) :+
        explode(sequence(col("__lo"), col("__hi"), lit(stepUs)))
          .as("__bucket"): _*)
    val wFill = Window.partitionBy(keys.map(col): _*).orderBy(col("__bucket"))
      .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    spine.join(points, keys :+ "__bucket", "left")
      .withColumn(s"${valueCol}_ffill",
        last(col(valueCol), ignoreNulls = true).over(wFill))
      .drop(valueCol)
      .withColumnRenamed("__bucket", "bucket_us")
  }
}
