package graft

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

import graft.llm.{DotProduct, Similarity, TopK}

/** ANN-tier diagnostic: measures the IVF cell-assignment balance and the
  * EXACT candidate-pair volume (Σ over cells of probe-mass × assign-mass)
  * for the flat multi-probe router, the id-seeded two-level one, and the
  * k-means-TRAINED two-level one, on a given embeddings fixture.
  * Candidate volume — not routing rows — is what the cell-equi-join
  * actually streams, and it is entirely determined by how evenly the
  * router spreads assignment mass: a coarse level that misroutes a slice
  * of vectors into few super-cells bloats those cells quadratically.
  * This tool turns that from a hypothesis into a per-fixture measurement
  * (built after the sf100 run where the id-seeded two-level tier
  * measured 3.3× SLOWER than flat — the smeared-replica fixture's dim-0
  * fan-out defeats id-seeded coarse centroids; the trained mode was
  * added with the round-8 fix).
  *
  * Replays the PRODUCTION routing trees by construction: every stage is
  * the same `private[graft]` helper ([[graft.llm.Similarity.ivfNorm]] /
  * `lowestIdCentroids` / `idSeededSuperCents` / `trainedSuperCents` /
  * `flatRoute` / `hierRoute`) that
  * [[graft.llm.Similarity.ivfProbeTopKNeighbors]] and the hier tiers
  * execute — not a copy, so a seeding or tie-break change in Similarity
  * is measured here automatically.
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
    val trainIters = sys.env.getOrElse("CELLBAL_TRAIN_ITERS", "2").toInt
    // mode filter (comma list of flat,hier,trained) — re-measuring one
    // router shouldn't pay the others' n·cells routing scans
    val modes = sys.env.getOrElse("CELLBAL_MODES", "flat,hier,trained")
      .split(",").map(_.trim).toSet
    val cpus = sys.env.getOrElse("SPARK_GRAFT_CPUS", "8")
    val spark = SparkSession.builder()
      .master(s"local[$cpus]")
      .config("spark.sql.shuffle.partitions", cpus)
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
    DotProduct.register(spark)
    TopK.register(spark)
    TopK.raiseSortFallbackThreshold(spark)

    val emb = spark.read.parquet(s"$dir/embeddings.parquet")
    val withNorm = Similarity.ivfNorm(emb, "vec_id", "embedding")
      .localCheckpoint()
    val n = withNorm.count()
    val cells = math.max(1L, n / tcs).toInt
    val scells = math.max(1, math.floor(math.sqrt(cells.toDouble)).toInt)
    val centroids = Similarity.lowestIdCentroids(withNorm, cells)

    def flatRouted() = Similarity.flatRoute(withNorm, centroids, nprobe)
    // flat tier over TRAINED fine centroids (no coarse level) — the
    // "does training help the flat list level" measurement: same n·cells
    // routing cost as flat, only the cell partition differs
    def flatTrainedRouted() = Similarity.flatRoute(withNorm,
      broadcast(Similarity.trainedCentroids(
        Similarity.hashSample(withNorm, 4 * cells), cells, trainIters)
        .toDF("cid", "cv", "cn2")), nprobe)
    def hierRouted() = Similarity.hierRoute(withNorm, centroids,
      Similarity.idSeededSuperCents(withNorm, scells), nprobe, sprobe)
    // BOTH levels trained, the ivfHierProbeTopKNeighborsTrained
    // construction: fine centroids from a 4·cells corpus hash sample,
    // super-centroids from the trained fine centroids
    def trainedRouted() = {
      val fineCents = broadcast(Similarity.trainedCentroids(
        Similarity.hashSample(withNorm, 4 * cells), cells, trainIters)
        .toDF("cid", "cv", "cn2"))
      Similarity.hierRoute(withNorm, fineCents,
        Similarity.trainedCentroids(fineCents, scells, trainIters),
        nprobe, sprobe)
    }

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
    if (modes("flat")) report("flat", flatRouted())
    if (modes("flattrained")) report("flattrained", flatTrainedRouted())
    if (modes("hier")) report("hier", hierRouted())
    if (modes("trained")) report("trained", trainedRouted())
    spark.stop()
  }
}
