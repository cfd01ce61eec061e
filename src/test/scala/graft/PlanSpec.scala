package graft

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.execution.WholeStageCodegenExec
import org.apache.spark.sql.execution.adaptive.AdaptiveSparkPlanExec
import org.apache.spark.sql.functions._

import graft.engine.Tables
import graft.queries.CoreRelational

/** Physical-plan assertions for the properties the 100 TB design relies on
  * (SCALING.md): filters reach the parquet scan, projections prune the read
  * schema, dimension joins broadcast, aggregations pre-reduce map-side, and
  * hot paths stay inside whole-stage codegen. These lock the *plan shape*,
  * not timings — a regression here (e.g. a refactor that hides a filter
  * behind a non-pushable expression) breaks at test time instead of
  * surfacing as a 100× slowdown at scale.
  */
class PlanSpec extends SparkSpec {
  private val dir = "/root/testdata/sf0.001"

  private def planString(df: DataFrame): String = {
    val p = df.queryExecution.executedPlan
    val unwrapped = p match {
      case a: AdaptiveSparkPlanExec => a.initialPlan
      case other => other
    }
    unwrapped.toString
  }

  test("equality filter is pushed into the parquet scan") {
    val df = Tables.load(spark, dir, "customer")
      .filter(col("c_mktsegment") === lit("BUILDING"))
    val plan = planString(df)
    assert(plan.contains("PushedFilters: ["), plan)
    assert(plan.contains("EqualTo(c_mktsegment,BUILDING)"), plan)
  }

  test("two-column projection prunes the parquet read schema") {
    val df = Tables.load(spark, dir, "lineitem")
      .select(col("l_orderkey"), col("l_quantity"))
    val plan = planString(df)
    assert(plan.contains("ReadSchema: struct<l_orderkey:"), plan)
    // the widest lineitem column must NOT be read for a 2-column projection
    assert(!plan.contains("l_comment"), plan)
  }

  test("flagship star join broadcasts the customer dimension") {
    val plan = planString(CoreRelational.flagship(spark, dir))
    assert(plan.contains("BroadcastHashJoin"), plan)
    // the fact-side revenue pre-aggregation reduces map-side before any
    // exchange: a partial aggregate must appear below the shuffle
    assert(plan.contains("partial_"), plan)
  }

  test("native expressions run inside whole-stage codegen") {
    graft.llm.SimHash.register(spark)
    val df = Tables.load(spark, dir, "documents")
      .select(col("doc_id"), expr("simhash64(text)").as("h"))
    val exec = df.queryExecution.executedPlan
    val unwrapped = exec match {
      case a: AdaptiveSparkPlanExec => a.initialPlan
      case other => other
    }
    val hasWscg = unwrapped.collect { case w: WholeStageCodegenExec => w }.nonEmpty
    assert(hasWscg, unwrapped.toString)
  }

  test("anti-join dedup ships keys only (pruned scan on the existing side)") {
    val orders = Tables.load(spark, dir, "orders")
    val existing = Tables.load(spark, dir, "orders").limit(100)
    val df = graft.engine.LoadDedup.antiJoinOnKeys(orders, existing, Seq("o_orderkey"))
    val plan = planString(df)
    // the anti-join's build side must read only the key column
    assert(plan.contains("LeftAnti"), plan)
  }
}
