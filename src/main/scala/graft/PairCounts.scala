package graft

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions._

/** Diagnostic main: the COUNTED pair/wedge volumes behind the
  * q_adamic_adar / q_item_cf scale dispositions (SCALING.md), so the
  * linearity argument extends into decades where the full queries are
  * single-box disk-bound.
  *
  * All numbers are computed WITHOUT materializing the pair sets — from
  * the group-size distribution in one hash aggregation instead of the
  * self-join (the pair volume is the quantity being measured, not a
  * thing to pay for):
  *  - wedge_join_rows: q_adamic_adar's post-cap self-join candidate
  *    volume Σ d² (symmetrized distinct co-supply edges, shared-neighbor
  *    degree in [2, 100] — the query's maxDeg). This is the metric the
  *    SCALING.md disposition pinned (18 034 987 at sf0.1 →
  *    180 349 870 at sf1; reproduced exactly by this main).
  *  - wedges: the distinct unordered wedge pairs Σ d(d−1)/2 of the same
  *    distribution (8 722 007 → 87 220 070, exactly 10×).
  *  - copairs: q_item_cf's exact co-pair volume — distinct (customer,
  *    part) basket rows, baskets ≤ 1000 kept (the query's maxBasket),
  *    Σ sz(sz−1)/2 (13 140 857 → 131 408 570, exactly 10×).
  *
  * Usage: SPARK_GRAFT_CPUS=32 tools/run_main.sh graft.PairCounts <dir>...
  */
object PairCounts {
  def main(args: Array[String]): Unit = {
    require(args.nonEmpty, "usage: graft.PairCounts <fixtureDir> [more...]")
    val cpus = sys.env.getOrElse("SPARK_GRAFT_CPUS", "4")
    val spark = SparkSession.builder()
      .master(s"local[$cpus]")
      .config("spark.sql.shuffle.partitions", cpus)
      .config("spark.sql.adaptive.enabled", "true")
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
    // every query-running main raises the ObjectHashAggregate hash-mode
    // capacity the same way (see TopK.raiseSortFallbackThreshold)
    graft.llm.TopK.raiseSortFallbackThreshold(spark)

    // Σ d(d−1)/2 — summed as the even integer d(d−1) and halved in Scala
    // (Spark's `/` on integers is true division → double)
    def choose2(dfGroupSizes: org.apache.spark.sql.DataFrame): Long =
      dfGroupSizes
        .agg(coalesce(sum(col("d") * (col("d") - 1L)), lit(0L)))
        .head().getLong(0) / 2

    args.foreach { dir =>
      val t0 = System.nanoTime()
      // q_adamic_adar's graph: part–supplier co-supply, suppliers offset.
      // Measured TWICE: once with the query's literal +1e6 offset (what
      // the registered query computes on this fixture), once with a
      // collision-free +1e9 offset — at replication factor ≥ 1000 the
      // literal offset SATURATES (shifted suppkeys reach 1e6, so
      // offset+suppkey overlaps shifted partkeys up to 2e7, merging part
      // and supplier nodes and deflating the capped wedge volume below
      // linear); the iso variant isolates the mechanism's true scaling.
      def wedgeMetrics(offset: Long): (Long, Long) = {
        val li = graft.engine.Tables.load(spark, dir, "lineitem")
          .select((col("l_suppkey") + offset).as("src"),
            col("l_partkey").as("dst"))
        val und = li.select(col("src").as("a"), col("dst").as("b"))
          .unionByName(li.select(col("dst").as("a"), col("src").as("b")))
          .where(col("a").isNotNull && col("b").isNotNull &&
            col("a") =!= col("b"))
          .distinct()
        val wdeg = und.groupBy(col("a")).agg(count(lit(1)).as("d"))
          .where(col("d") >= 2 && col("d") <= 100)
          .localCheckpoint()
        val joinRows = wdeg
          .agg(coalesce(sum(col("d") * col("d")), lit(0L)))
          .head().getLong(0)
        (joinRows, choose2(wdeg))
      }
      val (wedgeJoinRows, wedges) = wedgeMetrics(1000000L)
      val (wedgeJoinRowsIso, wedgesIso) = wedgeMetrics(1000000000L)
      // q_item_cf's baskets: distinct (customer, part), maxBasket=1000
      val o = graft.engine.Tables.load(spark, dir, "orders")
      val liraw = graft.engine.Tables.load(spark, dir, "lineitem")
      val inc = o.join(liraw, o("o_orderkey") === liraw("l_orderkey"))
        .select(col("o_custkey").as("b"), col("l_partkey").as("i"))
        .distinct()
      val copairs = choose2(
        inc.groupBy(col("b")).agg(count(lit(1)).as("d"))
          .where(col("d") <= 1000))
      val secs = (System.nanoTime() - t0) / 1e9
      println(f"""{"dir":"$dir","wedge_join_rows":$wedgeJoinRows,""" +
        f""""wedges":$wedges,"wedge_join_rows_iso":$wedgeJoinRowsIso,""" +
        f""""wedges_iso":$wedgesIso,"copairs":$copairs,""" +
        f""""secs":$secs%.1f}""")
      spark.catalog.clearCache()
      System.gc()
    }
    spark.stop()
  }
}
