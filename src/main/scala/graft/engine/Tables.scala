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
}
