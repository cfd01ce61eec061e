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
}
