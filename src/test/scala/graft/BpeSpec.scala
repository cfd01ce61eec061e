package graft

import graft.llm.Bpe

/** BPE merge training against the worked example of Sennrich et al.
  * (ACL 2016): vocabulary {low×5, lower×2, newest×6, widest×3} — merge
  * ranks and counts are hand-derivable, making the whole iterative
  * pipeline (vocab reduce → pair count → argmax → array merge) exactly
  * checkable. */
class BpeSpec extends SparkSpec {
  import spark.implicits._

  private val w = Bpe.Eow

  private lazy val docs = Seq((1L,
    (Seq.fill(5)("low") ++ Seq.fill(2)("lower") ++
      Seq.fill(6)("newest") ++ Seq.fill(3)("widest")).mkString(" ")))
    .toDF("doc_id", "text")

  test("learnMerges reproduces the hand-computed merge sequence") {
    val m = Bpe.learnMerges(docs, "text", numMerges = 4).collect()
      .map(r => (r.getInt(0), r.getString(1), r.getString(2), r.getLong(3)))
      .toSeq
    // round 1: (e,s) and (s,t</w>) tie at 9 → lexicographic left wins
    // round 2: (es,t</w>) 9; round 3: (l,o) 7; round 4: (e,w)/(n,e)/(w,est</w>)
    // tie at 6 → (e,w)
    assert(m === Seq(
      (0, "e", "s", 9L),
      (1, "es", s"t$w", 9L),
      (2, "l", "o", 7L),
      (3, "e", "w", 6L)))
  }

  test("segment replays the merge table over the vocabulary") {
    val table = Seq(("e", "s"), ("es", s"t$w"), ("l", "o"), ("e", "w"))
    val segs = Bpe.segment(docs, "text", table).collect()
      .map(r => r.getString(0) -> r.getSeq[String](1).toSeq).toMap
    assert(segs("newest") === Seq("n", "ew", s"est$w"))
    assert(segs("widest") === Seq("w", "i", "d", s"est$w"))
    assert(segs("low") === Seq("lo", s"w$w"))
    assert(segs("lower") === Seq("lo", "w", "e", s"r$w"))
  }

  test("mergePair is left-to-right non-overlapping") {
    val segs = Bpe.segment(Seq((1L, "aaa")).toDF("doc_id", "text"),
        "text", Seq(("a", "a")))
      .collect().map(r => r.getString(0) -> r.getSeq[String](1).toSeq).toMap
    // [a, a, a</w>] merges the FIRST adjacent pair only: [aa, a</w>]
    assert(segs("aaa") === Seq("aa", s"a$w"))
  }

  test("merge training stops when no pair repeats") {
    // every word distinct, every char distinct within and across words:
    // no pair reaches count 2, so zero merges come back
    val d = Seq((1L, "ab cd ef")).toDF("doc_id", "text")
    assert(Bpe.learnMerges(d, "text", numMerges = 5).count() === 0)
  }
}
