package graft

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions._

/** Diagnostic main: the COUNTED pair/wedge volumes behind the
  * q_adamic_adar / q_item_cf scale dispositions (SCALING.md), so the
  * linearity argument extends into decades where the full queries are
  * single-box disk-bound.
  *
  * Both numbers are computed WITHOUT materializing the pair sets — the
  * wedge/co-pair count is Σ_g C(d_g, 2) over the group-size distribution,
  * one hash aggregation instead of the self-join (the pair volume is the
  * quantity being measured, not a thing to pay for):
  *  - wedges: q_adamic_adar's exact post-cap wedge volume — symmetrized
  *    distinct co-supply edges, shared-neighbor degree in [2, 100]
  *    (the query's maxDeg), Σ d(d−1)/2.
  *  - copairs: q_item_cf's exact co-pair volume — distinct (customer,
  *    part) basket rows, baskets ≤ 1000 kept (the query's maxBasket),
  *    Σ sz(sz−1)/2.
  * Methodology pinned against the committed sf0.1/sf1 counts
  * (18 034 987 → 180 348 870 wedges; 13 140 857 → 131 408 570 co-pairs).
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

    // Σ d(d−1)/2 — summed as the even integer d(d−1) and halved in Scala
    // (Spark's `/` on integers is true division → double)
    def choose2(dfGroupSizes: org.apache.spark.sql.DataFrame): Long =
      dfGroupSizes
        .agg(coalesce(sum(col("d") * (col("d") - 1L)), lit(0L)))
        .head().getLong(0) / 2

    args.foreach { dir =>
      val t0 = System.nanoTime()
      // q_adamic_adar's graph: part–supplier co-supply, suppliers offset
      val li = graft.engine.Tables.load(spark, dir, "lineitem")
        .select((col("l_suppkey") + 1000000L).as("src"),
          col("l_partkey").as("dst"))
      val und = li.select(col("src").as("a"), col("dst").as("b"))
        .unionByName(li.select(col("dst").as("a"), col("src").as("b")))
        .where(col("a").isNotNull && col("b").isNotNull &&
          col("a") =!= col("b"))
        .distinct()
      val wedges = choose2(
        und.groupBy(col("a")).agg(count(lit(1)).as("d"))
          .where(col("d") >= 2 && col("d") <= 100))
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
      println(f"""{"dir":"$dir","wedges":$wedges,"copairs":$copairs,""" +
        f""""secs":$secs%.1f}""")
      spark.catalog.clearCache()
      System.gc()
    }
    spark.stop()
  }
}
