package graft

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions._

import graft.llm.Dedup

/** Dedup verify-stage diagnostic: measures what the sound size
  * prefilter removes on a given fixture — banding candidate pairs
  * before/after the filter, true ≥t pairs, and the implied verify-join
  * payload (each surviving pair carries two shingle-hash set arrays of
  * ~8 B per distinct shingle through the pair⋈sets exchange — the
  * measured sf100-spread disk frontier). Counts, not wall-clock: the
  * filter's value is fixture-dependent (it kills cross-length banding
  * false positives; a fixture whose candidates are all true near-dups
  * keeps its payload), so this is the per-fixture go/no-go instrument.
  *
  * Usage: DEDUPSTATS_DIR=/tmp/graft-sf10-spread \
  *   tools/run_main.sh graft.DedupStats
  */
object DedupStats {
  def main(args: Array[String]): Unit = {
    val dir = sys.env.getOrElse("DEDUPSTATS_DIR", "/root/testdata/sf0.1")
    val n = sys.env.getOrElse("DEDUPSTATS_N", "3").toInt
    val bands = sys.env.getOrElse("DEDUPSTATS_BANDS", "3").toInt
    val rows = sys.env.getOrElse("DEDUPSTATS_ROWS", "3").toInt
    val t = sys.env.getOrElse("DEDUPSTATS_T", "0.5").toDouble
    val cpus = sys.env.getOrElse("SPARK_GRAFT_CPUS", "8")
    val spark = SparkSession.builder()
      .master(s"local[$cpus]")
      .config("spark.sql.shuffle.partitions", cpus)
      .config("spark.sql.adaptive.enabled", "true")
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
    graft.llm.TopK.raiseSortFallbackThreshold(spark)

    val docs = spark.read.parquet(s"$dir/documents.parquet")
    val sizes = Dedup.rawShingles(docs, "doc_id", "text", n)
      .groupBy("doc_id")
      .agg(countDistinct(col("shingle")).as("sz"))
      .localCheckpoint()
    val cand = Dedup.minhashCandidates(docs, "doc_id", "text", n, bands,
      rows).localCheckpoint()
    val kept = Dedup.sizePrefilter(cand, sizes, "doc_id", t)
      .localCheckpoint()
    def payload(pairs: org.apache.spark.sql.DataFrame): Long =
      pairs.join(sizes.toDF("id1", "s1"), "id1")
        .join(sizes.toDF("id2", "s2"), "id2")
        .agg(coalesce(sum((col("s1") + col("s2")) * 8L), lit(0L)))
        .head().getLong(0)
    val nDocs = docs.count()
    val nCand = cand.count()
    val nKept = kept.count()
    val trueHits = Dedup.minhashNearDups(docs, "doc_id", "text", n,
      bands, rows, t).count()
    val (pc, pk) = (payload(cand), payload(kept))
    println(f"[dedupstats] dir=$dir docs=$nDocs candidates=$nCand " +
      f"kept=$nKept (${100.0 * nKept / math.max(1, nCand)}%.1f%%) " +
      f"true=$trueHits payloadMB pre=${pc / 1e6}%.1f post=${pk / 1e6}%.1f " +
      f"(${pc.toDouble / math.max(1, pk)}%.2fx reduction)")
    spark.stop()
  }
}
