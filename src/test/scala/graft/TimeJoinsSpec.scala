package graft

import org.apache.spark.sql.Row
import graft.engine.TimeJoins

class TimeJoinsSpec extends SparkSpec {
  import spark.implicits._

  private def asof(left: Seq[(Long, Long, Long)], right: Seq[(Long, Long, Long, Double)]) = {
    val l = left.toDF("event_id", "user_id", "us")
    val r = right.toDF("view_id", "user_id", "us", "value")
      .select($"user_id", $"us", $"view_id", $"value")
    TimeJoins.asofJoinBackward(l, r, Seq("user_id"), "us", Seq("view_id", "value"))
      .select("event_id", "matched_view_id", "matched_value")
      .collect().map(r => r.getLong(0) -> ((Option(r.get(1)), Option(r.get(2))))).toMap
  }

  test("asof: latest at-or-before right row matches; none before -> null") {
    val m = asof(
      left = Seq((1L, 7L, 100L), (2L, 7L, 250L), (3L, 7L, 50L)),
      right = Seq((10L, 7L, 80L, 1.0), (11L, 7L, 200L, 2.0)))
    assert(m(1L) === (Some(10L), Some(1.0)))   // 80 <= 100 < 200
    assert(m(2L) === (Some(11L), Some(2.0)))   // latest of {80, 200}
    assert(m(3L) === (None, None))             // nothing at or before 50
  }

  test("asof: equal timestamp matches inclusively; partition keys isolate users") {
    val m = asof(
      left = Seq((1L, 7L, 100L), (2L, 8L, 100L)),
      right = Seq((10L, 7L, 100L, 1.0)))
    assert(m(1L) === (Some(10L), Some(1.0)))   // ts tie -> right row visible
    assert(m(2L) === (None, None))             // other user sees nothing
  }

  test("asof: right-side timestamp ties resolve to the largest tiebreak id") {
    val m = asof(
      left = Seq((1L, 7L, 100L)),
      right = Seq((10L, 7L, 90L, 1.0), (12L, 7L, 90L, 3.0), (11L, 7L, 90L, 2.0)))
    assert(m(1L) === (Some(12L), Some(3.0)))
  }

  test("range self-join: within-window pairs once each, across bucket boundaries") {
    // Δ=100 ⇒ buckets [0,100), [100,200)… ; (95,105) crosses the boundary,
    // (95,190) is 95 apart within Δ, (95,196) is 101 apart — out.
    val df = Seq((1L, 7L, 95L), (2L, 7L, 105L), (3L, 7L, 190L), (4L, 7L, 196L))
      .toDF("event_id", "user_id", "us")
    val got = TimeJoins.rangeSelfJoin(df, Seq("user_id"), "us", "event_id", 100L)
      .select("event_id_1", "event_id_2", "gap_us")
      .collect().map(r => (r.getLong(0), r.getLong(1), r.getLong(2))).toSet
    assert(got === Set((1L, 2L, 10L), (1L, 3L, 95L), (2L, 3L, 85L), (2L, 4L, 91L), (3L, 4L, 6L)))
  }

  test("asof: null payload fields stay atomic (no cross-row stitching)") {
    // right rows: (ts=10, vid=1, val=5.0) then (ts=20, vid=2, val=null).
    // The match for a click at ts=30 is vid=2 WITH ITS null value — a
    // per-column last(ignoreNulls) would stitch val=5.0 from the older row.
    val l = Seq((1L, 7L, 30L)).toDF("event_id", "user_id", "us")
    val r = Seq((10L, 7L, 10L, Some(5.0)), (2L, 7L, 20L, None))
      .toDF("view_id", "user_id", "us", "value")
      .select($"user_id", $"us", $"view_id", $"value")
    val row = TimeJoins.asofJoinBackward(l, r, Seq("user_id"), "us",
      Seq("view_id", "value")).head()
    assert(row.getAs[Long]("matched_view_id") === 2L)
    assert(row.isNullAt(row.fieldIndex("matched_value")))
  }

  test("range self-join: exact bucketing beyond 2^52 (no double rounding)") {
    val base = (1L << 53) + 11 // double division would round us/delta here
    val df = Seq((1L, 7L, base), (2L, 7L, base + 50L), (3L, 7L, base + 151L))
      .toDF("event_id", "user_id", "us")
    val got = TimeJoins.rangeSelfJoin(df, Seq("user_id"), "us", "event_id", 100L)
      .select("event_id_1", "event_id_2", "gap_us")
      .collect().map(r => (r.getLong(0), r.getLong(1), r.getLong(2))).toSet
    assert(got === Set((1L, 2L, 50L)))
  }

  test("asof matches brute force on randomized collision-heavy data") {
    val rnd = new scala.util.Random(42)
    for (_ <- 1 to 3) {
      // tiny ts/user domains force equal-ts ties and cross-user isolation
      val left = (1 to 60).map(i =>
        (i.toLong, rnd.nextInt(5).toLong, rnd.nextInt(20).toLong))
      val right = (101 to 160).map(i =>
        (i.toLong, rnd.nextInt(5).toLong, rnd.nextInt(20).toLong, rnd.nextInt(9).toDouble))
      val expected = left.map { case (id, u, ts) =>
        val best = right.filter(r => r._2 == u && r._3 <= ts)
          .sortBy(r => (r._3, r._1)).lastOption
        id -> ((best.map(_._1), best.map(_._4)))
      }.toMap
      assert(asof(left, right) === expected)
    }
  }

  test("range self-join matches brute force on randomized data") {
    val rnd = new scala.util.Random(7)
    for (_ <- 1 to 3) {
      val rows = (1 to 80).map(i =>
        (i.toLong, rnd.nextInt(4).toLong, rnd.nextInt(500).toLong))
      val delta = 1L + rnd.nextInt(120)
      val expected = (for {
        a <- rows; b <- rows
        if a._2 == b._2
        if a._3 < b._3 || (a._3 == b._3 && a._1 < b._1)
        if b._3 - a._3 <= delta
      } yield (a._2, a._1, b._1, b._3 - a._3)).toSet
      val got = TimeJoins.rangeSelfJoin(
          rows.toDF("event_id", "user_id", "us"),
          Seq("user_id"), "us", "event_id", delta)
        .collect().map { case Row(u: Long, a: Long, b: Long, g: Long) => (u, a, b, g) }.toSet
      assert(got === expected, s"delta=$delta")
    }
  }

  private def asofFwd(left: Seq[(Long, Long, Long)], right: Seq[(Long, Long, Long, Double)]) = {
    val l = left.toDF("event_id", "user_id", "us")
    val r = right.toDF("view_id", "user_id", "us", "value")
      .select($"user_id", $"us", $"view_id", $"value")
    TimeJoins.asofJoinForward(l, r, Seq("user_id"), "us", Seq("view_id", "value"))
      .select("event_id", "matched_view_id", "matched_value")
      .collect().map(r => r.getLong(0) -> ((Option(r.get(1)), Option(r.get(2))))).toMap
  }

  test("asof forward: earliest at-or-after right row matches; none after -> null") {
    val m = asofFwd(
      left = Seq((1L, 7L, 100L), (2L, 7L, 250L), (3L, 7L, 90L)),
      right = Seq((10L, 7L, 100L, 1.0), (11L, 7L, 200L, 2.0)))
    assert(m(1L) === (Some(10L), Some(1.0)))   // equal ts matches inclusively
    assert(m(2L) === (None, None))             // nothing at or after 250
    assert(m(3L) === (Some(10L), Some(1.0)))   // earliest of {100, 200}
  }

  test("asof forward: right-side ts ties resolve to the smallest tiebreak id") {
    val m = asofFwd(
      left = Seq((1L, 7L, 80L)),
      right = Seq((12L, 7L, 90L, 3.0), (10L, 7L, 90L, 1.0), (11L, 7L, 90L, 2.0)))
    assert(m(1L) === (Some(10L), Some(1.0)))
  }

  test("asof forward matches brute force on randomized collision-heavy data") {
    val rnd = new scala.util.Random(11)
    for (_ <- 1 to 3) {
      val left = (1 to 60).map(i =>
        (i.toLong, rnd.nextInt(5).toLong, rnd.nextInt(20).toLong))
      val right = (101 to 160).map(i =>
        (i.toLong, rnd.nextInt(5).toLong, rnd.nextInt(20).toLong, rnd.nextInt(9).toDouble))
      val expected = left.map { case (id, u, ts) =>
        val best = right.filter(r => r._2 == u && r._3 >= ts)
          .sortBy(r => (r._3, r._1)).headOption
        id -> ((best.map(_._1), best.map(_._4)))
      }.toMap
      assert(asofFwd(left, right) === expected)
    }
  }

  test("range self-join: equal-ts pair emitted once, ordered by id; users isolated") {
    val df = Seq((1L, 7L, 50L), (2L, 7L, 50L), (3L, 8L, 50L))
      .toDF("event_id", "user_id", "us")
    val got = TimeJoins.rangeSelfJoin(df, Seq("user_id"), "us", "event_id", 100L)
      .collect().map { case Row(u: Long, a: Long, b: Long, g: Long) => (u, a, b, g) }.toSet
    assert(got === Set((7L, 1L, 2L, 0L)))
  }
}
