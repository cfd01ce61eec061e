package graft

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions._
import graft.llm.Dedup
import graft.engine.Tables

// dev-only scratch profiler; not part of the library surface
object Scratch {
  def main(args: Array[String]): Unit = {
    val cpus = sys.env.getOrElse("SCRATCH_CPUS", "4")
    val spark = SparkSession.builder()
      .master(s"local[$cpus]")
      .config("spark.sql.shuffle.partitions", cpus)
      .config("spark.sql.adaptive.enabled", "true")
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
    val docs = Tables.load(spark, "/root/testdata/sf0.1", "documents")
    def time(name: String)(f: => Long): Unit = {
      val t0 = System.nanoTime()
      val n = f
      println(f"[scratch] $name rows=$n ${(System.nanoTime() - t0) / 1e9}%.2f s")
    }
    // stage-by-stage minhash profile
    val shRaw = Dedup.rawShingles(docs, "doc_id", "text", 3)
    time("shRaw")(shRaw.count())
    val sigAggs = (0 until 9).map(p =>
      min(md5(concat(lit(s"$p|"), col("shingle")))).as(s"sig_$p")) :+
      countDistinct(col("shingle")).as("sz")
    time("sig-agg")(shRaw.groupBy(col("doc_id")).agg(sigAggs.head, sigAggs.tail: _*).count())
    val sigAggsNoCd = (0 until 9).map(p =>
      min(md5(concat(lit(s"$p|"), col("shingle")))).as(s"sig_$p"))
    time("sig-agg-no-countDistinct")(shRaw.groupBy(col("doc_id")).agg(sigAggsNoCd.head, sigAggsNoCd.tail: _*).count())
    // split-md5 variant: 5 md5 calls -> 10 64-bit halves, use 9
    val sigAggsSplit = (0 until 9).map { p =>
      val h = md5(concat(lit(s"${p / 2}|"), col("shingle")))
      min(substring(h, (p % 2) * 16 + 1, 16)).as(s"sig_$p")
    } :+ countDistinct(col("shingle")).as("sz")
    time("sig-agg-splitmd5")(shRaw.groupBy(col("doc_id")).agg(sigAggsSplit.head, sigAggsSplit.tail: _*).count())
    time("minhash-full")(Dedup.minhashNearDups(docs, "doc_id", "text", 3, 3, 3, 0.5).count())
    val pairs = Dedup.jaccardPairs(docs, "doc_id", "text", 3, 0.5).select("id1", "id2")
    time("jaccard-pairs")(pairs.count())
    time("dupClusters")(Dedup.dupClusters(pairs).count())
    time("dupClustersStar")(Dedup.dupClustersStar(pairs).count())
    spark.stop()
  }
}
