package graft

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

import graft.llm.{DotProduct, TopK}

/** ANN-tier diagnostic: measures the IVF cell-assignment balance and the
  * EXACT candidate-pair volume (Σ over cells of probe-mass × assign-mass)
  * for the flat multi-probe router vs the two-level coarse-quantized one,
  * on a given embeddings fixture. Candidate volume — not routing rows —
  * is what the cell-equi-join actually streams, and it is entirely
  * determined by how evenly the router spreads assignment mass: a coarse
  * level that misroutes a slice of vectors into few super-cells bloats
  * those cells quadratically. This tool turns that from a hypothesis into
  * a per-fixture measurement (built after the sf100 run where the
  * two-level tier measured 3.3× SLOWER than flat — the smeared-replica
  * fixture's dim-0 fan-out defeats id-seeded coarse centroids).
  *
  * Mirrors the routing trees of
  * [[graft.llm.Similarity.ivfProbeTopKNeighbors]] and
  * [[graft.llm.Similarity.ivfHierProbeTopKNeighbors]] (same centroid
  * seeding, same tie-breaks) up to the probe/assign split, then reports
  * per-mode: cell count, max/p99 assign mass, and Σ probes×assigns.
  *
  * Usage: CELLBAL_DIR=/tmp/graft-sf10 CELLBAL_TCS=1024 CELLBAL_NPROBE=2 \
  *   tools/run_main.sh graft.CellBalance
  */
object CellBalance {

  def main(args: Array[String]): Unit = {
    val dir = sys.env.getOrElse("CELLBAL_DIR", "/root/testdata/sf0.1")
    val tcs = sys.env.getOrElse("CELLBAL_TCS", "1024").toInt
    val nprobe = sys.env.getOrElse("CELLBAL_NPROBE", "2").toInt
    val sprobe = sys.env.getOrElse("CELLBAL_SPROBE", "2").toInt
    val cpus = sys.env.getOrElse("SPARK_GRAFT_CPUS", "8")
    val spark = SparkSession.builder()
      .master(s"local[$cpus]")
      .config("spark.sql.shuffle.partitions", cpus)
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
    DotProduct.register(spark)
    TopK.register(spark)

    val emb = spark.read.parquet(s"$dir/embeddings.parquet")
    val withNorm = emb.select(col("vec_id").as("id"),
        transform(col("embedding"), x => x.cast("double")).as("v"))
      .withColumn("n2", DotProduct.dotSeq(col("v"), col("v")))
      .where(col("n2") > 0.0)
      .localCheckpoint()
    val n = withNorm.count()
    val cells = math.max(1L, n / tcs).toInt
    val scells = math.max(1, math.floor(math.sqrt(cells.toDouble)).toInt)
    val centroids = broadcast(withNorm.orderBy(col("id")).limit(cells)
      .toDF("cid", "cv", "cn2"))
    def cos(v: org.apache.spark.sql.Column, n2: org.apache.spark.sql.Column,
        cv: org.apache.spark.sql.Column, cn2: org.apache.spark.sql.Column) =
      DotProduct.dotSeq(v, cv) / sqrt(n2 * cn2)

    /** (id, probes[nprobe]) under the given candidate-centroid stream. */
    def routeTop(scored: DataFrame): DataFrame = scored
      .groupBy(col("id"))
      .agg(TopK.topKByScore(col("score"), col("cid"), lit(nprobe))
        .as("probes"))

    // flat: every vector scores every centroid
    val flatRouted = routeTop(withNorm.crossJoin(centroids)
      .select(col("id"),
        cos(col("v"), col("n2"), col("cv"), col("cn2")).as("score"),
        col("cid"))).localCheckpoint()

    // two-level: super-centroids, centroid→super map, sprobe super-cells
    val superCents = broadcast(withNorm.orderBy(col("id")).limit(scells)
      .toDF("sid", "sv", "sn2"))
    val cmap = broadcast(centroids.crossJoin(superCents)
      .select(col("cid"), col("cv"), col("cn2"),
        cos(col("cv"), col("cn2"), col("sv"), col("sn2")).as("score"),
        col("sid"))
      .groupBy(col("cid"))
      .agg(TopK.topKByScore(col("score"), col("sid"), lit(1)).as("s"),
        first(col("cv")).as("cv"), first(col("cn2")).as("cn2"))
      .select(col("cid"), col("cv"), col("cn2"),
        element_at(col("s"), 1).getField("id").as("sid")))
    val sroutes = withNorm.crossJoin(superCents)
      .select(col("id"), col("v"), col("n2"),
        cos(col("v"), col("n2"), col("sv"), col("sn2")).as("score"),
        col("sid"))
      .groupBy(col("id"))
      .agg(TopK.topKByScore(col("score"), col("sid"), lit(sprobe)).as("sps"),
        first(col("v")).as("v"), first(col("n2")).as("n2"))
      .select(col("id"), col("v"), col("n2"),
        explode(transform(col("sps"), p => p.getField("id"))).as("sid"))
    val hierRouted = routeTop(sroutes.join(cmap, Seq("sid"))
      .select(col("id"),
        cos(col("v"), col("n2"), col("cv"), col("cn2")).as("score"),
        col("cid"))).localCheckpoint()

    def report(tag: String, routed: DataFrame): Unit = {
      val assign = routed.select(
        element_at(col("probes"), 1).getField("id").as("cell"))
        .groupBy("cell").agg(count(lit(1)).as("a"))
      val probes = routed.select(
        explode(transform(col("probes"), p => p.getField("id"))).as("cell"))
        .groupBy("cell").agg(count(lit(1)).as("p"))
      val joined = assign.join(probes, Seq("cell"), "full")
        .na.fill(0L, Seq("a", "p"))
        .select(col("a"), col("p"), (col("a") * col("p")).as("pairs"))
        .agg(sum(col("pairs")).as("cand"), max(col("a")).as("maxA"),
          expr("percentile(a, 0.99)").as("p99A"),
          count(lit(1)).as("usedCells")).head()
      println(f"[cellbal] $tag n=$n cells=$cells scells=$scells " +
        f"usedCells=${joined.getAs[Long]("usedCells")} " +
        f"maxAssign=${joined.getAs[Long]("maxA")} " +
        f"p99Assign=${joined.getAs[Double]("p99A")}%.0f " +
        f"candidatePairs=${joined.getAs[Long]("cand")}")
    }
    report("flat", flatRouted)
    report("hier", hierRouted)
    spark.stop()
  }
}
