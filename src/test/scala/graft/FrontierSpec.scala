package graft

import graft.engine.{Skyline, TimeSeries}

/** Hand-checkable pins for the frontier/burstiness/peaks trio. */
class FrontierSpec extends SparkSpec {
  import spark.implicits._

  test("skyline: staircase keeps only non-dominated points") {
    // (cost, gain): (1,5) frontier; (2,5) dominated (same gain, higher
    // cost); (2,7) frontier; (3,6) dominated by (2,7); (4,9) frontier
    val df = Seq((1L, 1.0, 5), (2L, 2.0, 5), (3L, 2.0, 7), (4L, 3.0, 6),
      (5L, 4.0, 9)).toDF("id", "cost", "gain")
    val r = Skyline.frontier2d(df, "id", "cost", "gain").collect()
      .map(_.getAs[Long]("id")).toSeq
    assert(r === Seq(1L, 3L, 5L))
  }

  test("skyline: co-optimal ties all survive (dominance needs one strict)") {
    val df = Seq((1L, 1.0, 5), (2L, 1.0, 5), (3L, 1.0, 4))
      .toDF("id", "cost", "gain")
    val r = Skyline.frontier2d(df, "id", "cost", "gain").collect()
      .map(_.getAs[Long]("id")).toSet
    assert(r === Set(1L, 2L)) // id 3: same cost, strictly less gain
  }

  test("burstiness: periodic gaps give B = -1 (sd = 0 → NULL cv guard)") {
    import java.sql.Timestamp
    // perfectly periodic: all gaps equal → variance 0 → cv/B NULL by
    // the degenerate guard (division semantics, not a -1 special case)
    val e = (1 to 5).map(i =>
      (1L, "a", new Timestamp(i * 60000L), i.toLong))
      .toDF("user_id", "event_type", "ts", "event_id")
    val r = TimeSeries.burstiness(e, Seq("user_id", "event_type"),
      "event_type", "ts", "event_id").head()
    assert(r.getAs[Long]("n_gaps") === 4L)
    assert(r.getAs[Double]("mean_gap_s") === 60.0)
    assert(r.isNullAt(r.fieldIndex("cv")))
  }

  test("burstiness: irregular gaps give positive cv, B in (-1, 1)") {
    import java.sql.Timestamp
    val times = Seq(0L, 1000L, 2000L, 60000L, 61000L, 300000L)
    val e = times.zipWithIndex.map { case (t, i) =>
      (1L, "a", new Timestamp(t), i.toLong) }
      .toDF("user_id", "event_type", "ts", "event_id")
    val r = TimeSeries.burstiness(e, Seq("user_id", "event_type"),
      "event_type", "ts", "event_id").head()
    val b = r.getAs[Double]("burstiness")
    assert(r.getAs[Double]("cv") > 1.0)
    assert(b > 0.0 && b < 1.0)
  }

  test("peaks: strict local maxima above the prominence floor") {
    // series 10,30,10,12,11,100,10: 30 and 100 are local maxima;
    // mean ≈ 26.1 → floor 1.2× ≈ 31.4 keeps only 100
    val s = Seq(10, 30, 10, 12, 11, 100, 10).zipWithIndex
      .map { case (v, i) => ("g", i.toLong, BigDecimal(v)) }
      .toDF("lbl", "t", "v")
    val r = TimeSeries.peaks(s, "lbl", "t", "v", factor = 1.2).collect()
    assert(r.length === 1)
    assert(r.head.getAs[Long]("t") === 5L)
    assert(r.head.getAs[Double]("v") === 100.0)
  }

  test("peaks: endpoints are never peaks (no neighbor)") {
    val s = Seq(100, 1, 99).zipWithIndex
      .map { case (v, i) => ("g", i.toLong, BigDecimal(v)) }
      .toDF("lbl", "t", "v")
    assert(TimeSeries.peaks(s, "lbl", "t", "v", factor = 0.0)
      .count() === 0L)
  }
}
