package graft

import java.nio.file.Files

import org.apache.spark.sql.functions._

import graft.pipeline.EtlPipeline
import graft.pipeline.EtlPipeline.Zones

class PipelineSpec extends SparkSpec {

  private val sfDir = "/root/testdata/sf0.001"

  private def tmpZones(): (Zones, String) = {
    val root = Files.createTempDirectory("graft_etl").toString
    (Zones(s"$root/bronze", s"$root/silver", s"$root/gold"), s"$root/db")
  }

  // fixed clock: zone file names embed the date; pin it for assertions
  private val clock = java.time.Clock.fixed(
    java.time.Instant.parse("2026-08-12T00:00:00Z"), java.time.ZoneOffset.UTC)

  test("EP1 end-to-end: extract -> transform -> load over medallion zones") {
    val (zones, db) = tmpZones()
    val gold = EtlPipeline.run(spark, sfDir, zones, db, batchId = "b1", clock)

    // zone contract: bronze/silver/gold files exist; gold names follow the
    // reference's `{entity}_{date}_{batch_id}` convention (transform.py:308)
    assert(new java.io.File(s"${zones.bronze}/merged_enedis_ban").exists())
    assert(new java.io.File(s"${zones.silver}/silver_data").exists())
    assert(new java.io.File(s"${zones.gold}/adresses_2026_08_12_b1").exists())

    // silver is batch-partitioned and stamped
    val silver = spark.read.parquet(s"${zones.silver}/silver_data")
    assert(silver.select("batch_id").distinct().count() === 1)

    // entities populated; defaults materialized for declared-but-absent col
    assert(gold("adresses").count() > 0)
    assert(gold("logements").count() > 0)
    assert(gold("logements").filter(col("conso_kwh_m2") === -1.0).count() === 0)
    val stats = gold("tests_statistiques")
    assert(stats.count() === 5) // one row per o_orderpriority label
    assert(stats.columns.contains("paired_t_test_p_value"))

    // loaded target exists and matches entity cardinality (keys distinct)
    val loaded = spark.read.parquet(s"$db/adresses")
    assert(loaded.count() === gold("adresses").count())
  }

  test("loader is idempotent: re-running the same batch appends nothing") {
    val (zones, db) = tmpZones()
    EtlPipeline.run(spark, sfDir, zones, db, batchId = "b1", clock)
    val before = spark.read.parquet(s"$db/logements").count()
    // replay load with identical gold zone
    EtlPipeline.load(spark, zones, db, Map(
      "adresses" -> Seq("c_custkey_ban"),
      "logements" -> Seq("o_orderkey_enedis"),
      "tests_statistiques" -> Seq("batch_id", "etiquette")), "b1", clock)
    val after = spark.read.parquet(s"$db/logements").count()
    assert(after === before)
  }

  test("instrumented run returns per-action telemetry records") {
    val (zones, db) = tmpZones()
    val (gold, records) =
      EtlPipeline.runInstrumented(spark, sfDir, zones, db, "b1", clock)
    assert(gold("adresses").count() > 0)
    assert(records.nonEmpty)
    assert(records.exists(r => !r.failed && r.durationNs > 0))
  }

  test("extract asserts required columns (E1 semantics)") {
    import spark.implicits._
    val bad = Seq((1, "x")).toDF("a", "b")
    val e = intercept[IllegalArgumentException] {
      EtlPipeline.assertRequired(bad, Seq("a", "missing_col"))
    }
    assert(e.getMessage.contains("missing_col"))
  }
}
