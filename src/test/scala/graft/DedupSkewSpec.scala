package graft

import org.apache.spark.sql.functions._

import graft.llm.Dedup

/** Adversarial hot-bucket drill: a large group of IDENTICAL documents
  * shares every LSH band key, collecting one giant bucket. Two defenses,
  * both pinned here:
  *  1. AQE skew-join split keeps the banded candidate join's TASKS bounded
  *     (no straggler executor), asserted in the final adaptive plan;
  *  2. the production composition [[Dedup.nearDupClustersExactFirst]]
  *     collapses exact groups BEFORE banding, so total candidate work is
  *     quadratic in text diversity, not duplication — asserted by label
  *     equality with the naive path and by the collapsed candidate count.
  */
class DedupSkewSpec extends SparkSpec {
  import spark.implicits._

  // 400 identical docs (one hot bucket) + 80 distinct docs + one planted
  // near-dup pair; texts long enough for 3-gram shingles
  private lazy val skewDocs = {
    val hot = (1L to 400L).map(i =>
      (i, "identical hot bucket text shared by every clone of this document"))
    val cold = (1001L to 1080L).map(i =>
      (i, s"distinct cold document number $i about topic ${i % 7} entirely unlike others ${i * 31}"))
    val near = Seq(
      (2001L, "a planted near duplicate pair with mostly overlapping token content here"),
      (2002L, "a planted near duplicate pair with mostly overlapping token content there"))
    (hot ++ cold ++ near).toDF("doc_id", "text")
  }

  private def withConf[A](pairs: (String, String)*)(body: => A): A = {
    val prev = pairs.map { case (k, _) => k -> spark.conf.getOption(k) }
    pairs.foreach { case (k, v) => spark.conf.set(k, v) }
    try body
    finally prev.foreach {
      case (k, Some(v)) => spark.conf.set(k, v)
      case (k, None) => spark.conf.unset(k)
    }
  }

  test("hot LSH bucket: AQE splits the skewed band join within bounded time") {
    val t0 = System.nanoTime()
    val (pairCount, planStr) = withConf(
      // force the shuffled path (the tiny band table would broadcast) and
      // drop the skew thresholds to test-data scale
      "spark.sql.autoBroadcastJoinThreshold" -> "-1",
      "spark.sql.adaptive.enabled" -> "true",
      "spark.sql.adaptive.forceOptimizeSkewedJoin" -> "true",
      "spark.sql.adaptive.skewJoin.enabled" -> "true",
      "spark.sql.adaptive.skewJoin.skewedPartitionThresholdInBytes" -> "2KB",
      "spark.sql.adaptive.advisoryPartitionSizeInBytes" -> "1KB",
      "spark.sql.adaptive.skewJoin.skewedPartitionFactor" -> "1.0") {
      val bands = Dedup.bandTable(skewDocs, "doc_id", "text",
        n = 3, bands = 3, rowsPerBand = 3)
      val cand = Dedup.candidatePairsFromBands(bands)
      // collect() executes THIS dataset's QueryExecution, so the adaptive
      // plan below is the finalized one (count() would plan a fresh tree)
      val n = cand.collect().length.toLong
      (n, cand.queryExecution.executedPlan.toString)
    }
    val secs = (System.nanoTime() - t0) / 1e9
    // all 400 clones pair up: C(400,2) plus the planted near pair's bucket
    assert(pairCount >= 400L * 399 / 2)
    // the skewed join really was split by AQE
    assert(planStr.contains("skew=true"), s"no skew split in plan:\n$planStr")
    assert(secs < 60.0, s"hot-bucket candidate join took ${secs}s")
  }

  test("exact-first collapse: same labels as the naive path, linear bucket work") {
    val naive = Dedup.dupClusters(
        Dedup.minhashNearDups(skewDocs, "doc_id", "text", 3, 3, 3, 0.5)
          .select("id1", "id2"))
      .collect().map(r => (r.getLong(0), r.getLong(1))).toMap
    val collapsed = Dedup.nearDupClustersExactFirst(
        skewDocs, "doc_id", "text", 3, 3, 3, 0.5)
      .collect().map(r => (r.getLong(0), r.getLong(1))).toMap
    // every doc is labeled; hot clones all collapse to canonical id 1
    assert(collapsed.size === 482)
    assert((1L to 400L).forall(collapsed(_) == 1L))
    assert(collapsed(2002L) === 2001L)
    // naive path only labels docs that appear in some pair; where it does,
    // the labels agree exactly
    naive.foreach { case (id, c) => assert(collapsed(id) === c, s"id=$id") }
    // the collapsed path's banded join sees each distinct text once: the
    // candidate set is the planted near pair plus a handful of band
    // collisions among the 82 distinct texts — orders of magnitude below
    // the 79800 clone pairs the naive path generates
    val repCands = Dedup.minhashCandidates(
      skewDocs.dropDuplicates("text"), "doc_id", "text", 3, 3, 3).count()
    assert(repCands <= 200, s"collapsed candidates: $repCands")
  }

  test("exact-first collapse: null-text documents keep the every-input " +
      "contract (sentinel key; md5(NULL) would drop them from the join)") {
    import spark.implicits._
    val docs = Seq(
      (1L, "alpha beta gamma delta"),
      (2L, null.asInstanceOf[String]),
      (3L, null.asInstanceOf[String]),
      (4L, "alpha beta gamma delta")).toDF("doc_id", "text")
    val got = Dedup.nearDupClustersExactFirst(
        docs, "doc_id", "text", 3, 3, 3, 0.5)
      .collect().map(r => (r.getLong(0), r.getLong(1))).toMap
    // EVERY input document is labeled; the two null-text docs form one
    // exact-dup group under the smallest null-text id
    assert(got.size === 4)
    assert(got(2L) === 2L && got(3L) === 2L)
    assert(got(1L) === 1L && got(4L) === 1L)
  }
}
