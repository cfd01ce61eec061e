package graft

import java.nio.file.Files

import org.apache.spark.sql.functions._

import graft.engine.{Sinks, Tables}

/** Bucketed co-located joins: the write-once/join-free pre-partitioning
  * strategy for repeated large joins. Asserts the actual physical plan has
  * NO shuffle exchange on either side of the join. */
class BucketingSpec extends SparkSpec {

  test("bucketed-by-key tables join with zero shuffle exchanges") {
    val wh = Files.createTempDirectory("graft_buckets").toString
    val dir = "/root/testdata/sf0.001"
    Sinks.bucketedTable(Tables.load(spark, dir, "orders"),
      "orders_bkt", s"$wh/orders", Seq("o_custkey"), numBuckets = 8)
    Sinks.bucketedTable(
      Tables.load(spark, dir, "customer").select("c_custkey", "c_mktsegment"),
      "customer_bkt", s"$wh/customer", Seq("c_custkey"), numBuckets = 8)
    try {
      // disable broadcast so the join would NEED a shuffle if buckets
      // weren't used
      spark.conf.set("spark.sql.autoBroadcastJoinThreshold", "-1")
      val joined = spark.table("orders_bkt")
        .join(spark.table("customer_bkt"), col("o_custkey") === col("c_custkey"))
      val n = joined.count()

      val plan = joined.queryExecution.executedPlan.toString
      assert(!plan.contains("Exchange"),
        s"bucketed join should be shuffle-free, got:\n$plan")

      // same result as the plain (shuffling) join
      val plain = Tables.load(spark, dir, "orders")
        .join(Tables.load(spark, dir, "customer"),
          col("o_custkey") === col("c_custkey"))
      assert(n === plain.count())
      assert(n > 0)
    } finally {
      spark.conf.set("spark.sql.autoBroadcastJoinThreshold", "10485760")
      spark.sql("DROP TABLE IF EXISTS orders_bkt")
      spark.sql("DROP TABLE IF EXISTS customer_bkt")
    }
  }

  test("bucketed band-table state: incremental dedup never reshuffles the corpus") {
    import graft.llm.Dedup
    val wh = Files.createTempDirectory("graft_bands").toString
    val dir = "/root/testdata/sf0.001"
    val docs = Tables.load(spark, dir, "documents")
    val corpus = docs.filter(pmod(col("doc_id"), lit(5)) =!= 0)
    val newBatch = docs.filter(pmod(col("doc_id"), lit(5)) === 0)
    // persist the corpus LSH state BUCKETED BY ITS JOIN KEY — the write-
    // once layout that lets every future ingest batch probe the corpus
    // bands without reshuffling them (at 100 TB the band table is the
    // big side; the batch is the small one)
    Sinks.bucketedTable(
      Dedup.bandTable(corpus, "doc_id", "text", 3, 3, 3),
      "bands_bkt", s"$wh/bands", Seq("band", "band_key"), numBuckets = 8)
    try {
      spark.conf.set("spark.sql.autoBroadcastJoinThreshold", "-1")
      spark.conf.set("spark.sql.adaptive.enabled", "false")
      val persisted = spark.table("bands_bkt")
      import org.apache.spark.sql.execution.FileSourceScanExec
      import org.apache.spark.sql.execution.exchange.ShuffleExchangeExec
      // assert on the LAZY candidate-join plan (the full incremental API
      // eagerly materializes its small verified output, leaving only a
      // checkpoint scan to inspect)
      val cand = Dedup.incrementalCandidates(
        Dedup.bandTable(newBatch, "doc_id", "text", 3, 3, 3), persisted)
      val exec = cand.queryExecution.executedPlan
      // the corpus band state is consumed through its buckets...
      val bucketedScans = exec.collect {
        case f: FileSourceScanExec if f.bucketedScan => f }
      assert(bucketedScans.nonEmpty, exec.toString)
      // ...and no BAND-KEY shuffle ever sits above a bucketed corpus
      // scan: the band join consumes the buckets directly, so only the
      // (small) batch side pays a band exchange. Downstream id-keyed
      // shuffles are legitimate and excluded.
      val offenders = exec.collect {
        case e: ShuffleExchangeExec
          if e.outputPartitioning.toString.contains("band") &&
            e.child.collect {
              case f: FileSourceScanExec if f.bucketedScan => f }.nonEmpty => e }
      assert(offenders.isEmpty,
        s"corpus band scan reshuffled on band keys:\n${offenders.mkString("\n")}")
      // and the full incremental result over the bucketed state equals the
      // unbucketed formulation
      val nd = Dedup.minhashNearDupsIncremental(newBatch, corpus, persisted,
        "doc_id", "text", n = 3, bands = 3, rowsPerBand = 3, threshold = 0.5)
      val plainBands = Dedup.bandTable(corpus, "doc_id", "text", 3, 3, 3)
      val expected = Dedup.minhashNearDupsIncremental(newBatch, corpus,
          plainBands, "doc_id", "text", 3, 3, 3, 0.5)
        .collect().map(_.toSeq).toSet
      assert(nd.collect().map(_.toSeq).toSet === expected)
    } finally {
      spark.conf.set("spark.sql.autoBroadcastJoinThreshold", "10485760")
      spark.conf.set("spark.sql.adaptive.enabled", "true")
      spark.sql("DROP TABLE IF EXISTS bands_bkt")
    }
  }
}
