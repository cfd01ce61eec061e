package graft

import org.apache.spark.sql.functions._

import graft.llm.{Dedup, SetSimJoin}

/** Prefix-filter exact set-similarity join: lossless-pruning equality
  * against the quadratic [[Dedup.jaccardPairs]] reference, plus the
  * ceil-arithmetic boundary the floating formulation would get wrong. */
class SetSimJoinSpec extends SparkSpec {
  import spark.implicits._

  private def pairSet(df: org.apache.spark.sql.DataFrame) =
    df.select("id1", "id2", "jaccard").collect()
      .map(r => (r.getLong(0), r.getLong(1), r.getDouble(2))).toSet

  test("equals the quadratic reference on the real corpus (3 thresholds)") {
    val docs = spark.read
      .parquet("/root/testdata/sf0.001/documents.parquet")
      .select("doc_id", "text")
    for (thr <- Seq(0.4, 0.5, 0.8)) {
      val fast = pairSet(SetSimJoin.jaccardJoin(docs, "doc_id", "text", 3, thr))
      val ref = pairSet(Dedup.jaccardPairs(docs, "doc_id", "text", 3, thr))
      assert(fast === ref, s"threshold $thr")
      assert(ref.nonEmpty || thr == 0.8, s"vacuous check at $thr")
    }
  }

  test("integral θ·sz boundary: prefix must use exact ceil (θ=0.3, sz=10)") {
    // Two 10-token sets overlapping in exactly 5 tokens: J = 5/15 ≥ 0.3.
    // With θ=0.3, ceil(0.3·10)=3 ⇒ prefix length 8. A float ceil seeing
    // 3.0000000000000004 would use length 7 — still fine here, so ALSO
    // make the only shared tokens the globally most frequent (prefix
    // tail) ones: every unshared token appears once (df=1, rarest ⇒
    // prefix head), shared tokens appear twice (df=2 ⇒ positions 6-10).
    // Shared tokens then occupy positions 6..8 of the correct 8-prefix;
    // a one-short prefix still keeps positions 6-7 — so to actually trip
    // an off-by-one the pair must hinge on position 8 exactly: unshared
    // df-1 tokens fill 1..5, shared fill 6..10, and J ≥ θ needs overlap
    // ≥ 3 ⇒ a qualifying partner must reach position 8. Verified against
    // the quadratic reference rather than hand-reasoned further.
    val a = "a1 a2 a3 a4 a5 s1 s2 s3 s4 s5"
    val b = "b1 b2 b3 b4 b5 s1 s2 s3 s4 s5"
    val docs = Seq((1L, a), (2L, b)).toDF("doc_id", "text")
    val fast = pairSet(SetSimJoin.jaccardJoin(docs, "doc_id", "text", 1, 0.3))
    val ref = pairSet(Dedup.jaccardPairs(docs, "doc_id", "text", 1, 0.3))
    assert(fast === ref)
    assert(fast.exists { case (1L, 2L, j) => j > 0.33 && j < 0.34; case _ => false })
  }

  test("randomized unigram sets match brute force across thresholds") {
    // Deterministic pseudo-random corpus: 40 docs over a 25-word vocab,
    // sizes 3..12 — small enough to brute-force, varied enough to hit
    // every prefix/size-filter branch.
    val rng = new scala.util.Random(20260814L)
    val vocab = (0 until 25).map(i => s"w$i")
    val docs = (1 to 40).map { id =>
      val sz = 3 + rng.nextInt(10)
      (id.toLong, rng.shuffle(vocab).take(sz).mkString(" "))
    }.toDF("doc_id", "text")
    for (thr <- Seq(0.2, 0.333333, 0.5, 0.75, 1.0)) {
      val fast = pairSet(SetSimJoin.jaccardJoin(docs, "doc_id", "text", 1, thr))
      val ref = pairSet(Dedup.jaccardPairs(docs, "doc_id", "text", 1, thr))
      assert(fast === ref, s"threshold $thr")
    }
  }

  test("identical docs pair at jaccard exactly 1.0 under θ=1.0") {
    val docs = Seq((1L, "x y z"), (2L, "x y z"), (3L, "x y q"))
      .toDF("doc_id", "text")
    val fast = pairSet(SetSimJoin.jaccardJoin(docs, "doc_id", "text", 1, 1.0))
    assert(fast === Set((1L, 2L, 1.0)))
  }
}
