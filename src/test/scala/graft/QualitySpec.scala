package graft

import graft.engine.Quality
import graft.engine.Quality.Check

class QualitySpec extends SparkSpec {
  import spark.implicits._

  test("verify: one pass, correct metrics, pass and fail verdicts") {
    val df = Seq(
      (1L, Some("a"), 5.0), (2L, Some("b"), 7.0),
      (3L, None, 9.0), (3L, Some("a"), 11.0)).toDF("id", "tag", "v")
    val got = Quality.verify(df, Seq(
        Check("c1_complete", "tag", Quality.completeness("tag"), 1.0, 1.0),
        Check("c2_unique", "id", Quality.uniqueness("id"), 1.0, 1.0),
        Check("c3_vmin", "v", Quality.minOf("v"), 0.0, 100.0),
        Check("c4_accept", "tag",
          Quality.acceptedValues("tag", Seq("a", "b")), 1.0, 1.0)))
      .collect().map(r => r.getString(0) ->
        (r.getDouble(2), r.getBoolean(3))).toMap
    assert(got("c1_complete") == (0.75, false)) // one null of four
    assert(got("c2_unique") == (0.75, false))   // id 3 repeats
    assert(got("c3_vmin") == (5.0, true))
    assert(got("c4_accept") == (1.0, true))     // nulls excluded from base
    // single-scan contract: the whole suite is ONE logical Aggregate
    val aggs = Quality.verify(df, Seq(
        Check("a", "v", Quality.minOf("v"), 0, 1),
        Check("b", "v", Quality.maxOf("v"), 0, 1)))
      .queryExecution.optimizedPlan.collect {
        case a: org.apache.spark.sql.catalyst.plans.logical.Aggregate => a
      }
    assert(aggs.size == 1, aggs)
  }

  test("verify: all-null column yields a NULL rate and a failed verdict") {
    val df = Seq((1L, Option.empty[String]), (2L, None)).toDF("id", "tag")
    val r = Quality.verify(df, Seq(
        Check("accept", "tag", Quality.acceptedValues("tag", Seq("x")),
          1.0, 1.0)))
      .collect().head
    assert(r.isNullAt(2))
    assert(!r.getBoolean(3))
  }

test("robotsDecisions: specificity, longest-prefix, Allow tie win, " +
    "no-rule default, empty Disallow no-op") {
    import org.apache.spark.sql.functions.col
    val robots = Seq(
      // host A: * group with nested Allow under a Disallow + empty noop
      ("a", "User-agent: *\nDisallow: /p/\nAllow: /p/open\nDisallow:"),
      // host B: a specific group for graftbot OVERRIDES the * group
      ("b", "User-agent: *\nAllow: /\nUser-agent: graftbot\nDisallow: /"),
      // host C: consecutive UA head run shares the rules
      ("c", "User-agent: other\nUser-agent: graftbot\nDisallow: /x")
    ).toDF("host", "content")
    val urls = Seq(("a", "/p/x1"), ("a", "/p/open/2"), ("a", "/free"),
      ("b", "/anything"), ("c", "/x/deep"), ("c", "/y"),
      ("d", "/no-robots-host")).toDF("host", "path")
    val out = Quality.robotsDecisions(robots, "host", "content",
        urls, "host", "path", agent = "graftbot")
      .collect()
      .map(r => (r.getString(0), r.getString(1)) ->
        (r.getBoolean(2), Option(r.getString(3)))).toMap
    assert(out(("a", "/p/x1")) === ((false, Some("/p/"))))
    assert(out(("a", "/p/open/2")) === ((true, Some("/p/open"))))
    assert(out(("a", "/free")) === ((true, None)))
    assert(out(("b", "/anything")) === ((false, Some("/"))))
    assert(out(("c", "/x/deep")) === ((false, Some("/x"))))
    assert(out(("c", "/y")) === ((true, None)))
    assert(out(("d", "/no-robots-host")) === ((true, None)))
    // equal-length Allow/Disallow tie: Allow wins
    val tie = Seq(("t", "User-agent: *\nDisallow: /a\nAllow: /a"))
      .toDF("host", "content")
    val tu = Seq(("t", "/a/1")).toDF("host", "path")
    val tr = Quality.robotsDecisions(tie, "host", "content", tu,
      "host", "path", "graftbot").collect().head
    assert(tr.getBoolean(2) === true)
  }
}
