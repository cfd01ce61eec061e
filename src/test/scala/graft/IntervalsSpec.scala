package graft

import graft.engine.Intervals

/** Sweep-line peak concurrency: half-open semantics, instant netting,
  * per-group independence, malformed-interval guard. */
class IntervalsSpec extends SparkSpec {
  import spark.implicits._

  private def peaks(iv: Seq[(String, Long, Long)]): Map[String, (Long, Long)] =
    Intervals.maxConcurrency(iv.toDF("g", "s", "e"), "g", "s", "e")
      .as[(String, Long, Long)].collect()
      .map { case (g, p, at) => g -> (p, at) }.toMap

  test("overlapping stair: peak 2 first reached at t=5") {
    // [0,10) [5,15) [10,20): at t=10 one ends as one starts — still 2
    val got = peaks(Seq(("x", 0L, 10L), ("x", 5L, 15L), ("x", 10L, 20L)))
    assert(got === Map("x" -> (2L, 5L)))
  }

  test("end-meets-start does not double count (half-open intervals)") {
    val got = peaks(Seq(("x", 0L, 10L), ("x", 10L, 20L)))
    assert(got === Map("x" -> (1L, 0L)))
  }

  test("groups have independent timelines") {
    val got = peaks(Seq(
      ("a", 0L, 100L), ("a", 1L, 99L), ("a", 2L, 98L),
      ("b", 0L, 1L), ("b", 5L, 6L)))
    assert(got === Map("a" -> (3L, 2L), "b" -> (1L, 0L)))
  }

  test("zero-length interval is legal and contributes no concurrency") {
    // [5,5) nets to 0 at t=5; alone in its group the peak is 0
    val got = peaks(Seq(("z", 5L, 5L)))
    assert(got === Map("z" -> (0L, 5L)))
  }

  test("inverted interval (end < start) raises in-plan") {
    val ex = intercept[Exception] { peaks(Seq(("x", 10L, 0L))) }
    assert(ex.getMessage.contains("end < start"))
  }

  private def coverage(rows: Seq[(String, Long, Long)]) =
    Intervals.mergeCoverage(rows.toDF("g", "s", "e"), "g", "s", "e")
      .as[(String, Long, Long, Long, Long)].collect()
      .map(r => r._1 -> ((r._2, r._3, r._4, r._5))).toMap

  test("mergeCoverage: early long interval spans later short ones (running max)") {
    // [0,10) swallows [2,3) and [4,5); [12,14) is its own island
    val got = coverage(Seq(("a", 0L, 10L), ("a", 2L, 3L), ("a", 4L, 5L),
      ("a", 12L, 14L)))
    assert(got("a") === ((4L, 2L, 12L, 10L)))
  }

  test("mergeCoverage: touching intervals merge (half-open [s,e))") {
    val got = coverage(Seq(("t", 0L, 5L), ("t", 5L, 8L), ("t", 9L, 10L)))
    assert(got("t") === ((3L, 2L, 9L, 8L)))
  }

  test("mergeCoverage: groups are independent; identical intervals count") {
    val got = coverage(Seq(("x", 0L, 2L), ("x", 0L, 2L), ("y", 1L, 4L)))
    assert(got === Map("x" -> ((2L, 1L, 2L, 2L)), "y" -> ((1L, 1L, 3L, 3L))))
  }
}
