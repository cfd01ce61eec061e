package graft.engine

import org.apache.spark.sql.{DataFrame, SparkSession}

/** Loaders for the driver testdata star schema (see /root/repo/TESTDATA.md).
  *
  * One parquet file per table; at cluster scale these would be directories of
  * many row-groups — `spark.read.parquet` handles both identically, and
  * Catalyst pushes filters/column pruning into the scan either way.
  */
object Tables {
  val names: Seq[String] = Seq("region", "nation", "customer", "supplier",
    "part", "orders", "lineitem", "events", "documents", "embeddings")

  def load(spark: SparkSession, dir: String, name: String): DataFrame =
    spark.read.parquet(s"$dir/$name.parquet")

  /** `events` with its timestamp normalized: generator versions have shipped
    * `ts` as parquet TIMESTAMP(NANOS) (which Spark's schema conversion
    * rejects outright) and as TIMESTAMP(MICROS). The scan therefore declares
    * an explicit read schema with `ts` as LONG — the reader hands back the
    * raw int64 under either logical annotation — and normalizes to
    * microseconds in-plan by magnitude: any in-range date is < 1e17 as
    * micros (year 5138) and > 1e17 as nanos (post-1973), so
    * `ts >= 1e17 → div 1000` is an exact, deterministic unit detector.
    * Schema-on-read only: no session conf is touched (the legacy
    * `nanosAsLong` conf would be a hidden global mutation on shared
    * sessions). The single shared entry point for every query over
    * `events`. */
  def events(spark: SparkSession, dir: String): DataFrame = {
    import org.apache.spark.sql.functions._
    spark.read
      .schema("event_id LONG, ts LONG, user_id LONG, event_type STRING, " +
        "value DOUBLE, props STRING")
      .parquet(s"$dir/events.parquet")
      .withColumn("ts",
        timestamp_micros(expr("IF(ts >= 100000000000000000, ts div 1000, ts)")))
  }
}
