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

  /** `events` with its timestamp normalized: the file stores parquet
    * TIMESTAMP(NANOS), which Spark's schema conversion rejects — so the
    * scan declares an explicit read schema with `ts` as LONG (the reader
    * then hands back the raw int64 nanos) and converts to a microsecond
    * timestamp in-plan (`div 1000` stays in exact int64). Schema-on-read
    * only: no session conf is touched (the legacy `nanosAsLong` conf would
    * be a hidden global mutation on shared sessions). The single shared
    * entry point for every query over `events`. */
  def events(spark: SparkSession, dir: String): DataFrame = {
    import org.apache.spark.sql.functions._
    spark.read
      .schema("event_id LONG, ts LONG, user_id LONG, event_type STRING, " +
        "value DOUBLE, props STRING")
      .parquet(s"$dir/events.parquet")
      .withColumn("ts", timestamp_micros(expr("ts div 1000")))
  }
}
