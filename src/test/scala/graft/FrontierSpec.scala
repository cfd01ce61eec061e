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

  test("percentile.approx flag: the sketch swaps in with the same plan " +
      "shape; lorenz bins shift by at most the interpolation convention; " +
      "ties-heavy impute/bucket cuts are bit-identical") {
    // spark.graft.percentile.approx swaps exact `percentile` (linear
    // interpolation) for the bounded-memory GK sketch, which returns an
    // ACTUAL data value. At fixture scale the sketch is rank-exact
    // (n << accuracy), so the only possible divergence is the
    // interpolation convention at a cut that falls between two adjacent
    // distinct values: the boundary row can move one bin. Pin exactly
    // that contract — never silently more — plus bit-identity on the
    // ties-heavy integer paths where every cut IS a data value.
    import graft.engine.Percentiles
    import org.apache.spark.sql.functions.{col, lit, when}
    val dir = "/root/testdata/sf0.001"
    assume(new java.io.File(s"$dir/lineitem.parquet").exists())
    val spec = QueryRegistry.byName("q_lorenz")
    def lorenz() = spec.run(spark, dir).collect()
      .map(r => (r.getString(0), r.getLong(1)) -> r.getLong(2)).toMap
    val exact = lorenz()
    assert(spark.conf.getOption(Percentiles.ApproxConf).isEmpty)
    spark.conf.set(Percentiles.ApproxConf, "true")
    try {
      val approx = lorenz()
      // same bins, group totals conserved, and only BOUNDARY rows move:
      // a bin is bounded by two cuts and each cut can snap to the
      // adjacent data value on either side (the interpolation-convention
      // shift), so the mechanism bounds the per-bin delta by the tied
      // rows at each of its two cut values — ≤ 2 on this fixture, where
      // prices at the decile cuts are untied
      assert(approx.keySet === exact.keySet)
      approx.foreach { case (k, n) =>
        assert(math.abs(n - exact(k)) <= 2L, s"bin $k: $n vs ${exact(k)}") }
      exact.keys.map(_._1).toSeq.distinct.foreach { g =>
        assert(approx.filter(_._1._1 == g).values.sum ===
          exact.filter(_._1._1 == g).values.sum) }
      // the flag is live: the aggregate in the plan is the sketch
      val plan = spec.run(spark, dir).queryExecution.optimizedPlan.toString
      assert(plan.contains("percentile_approx"), plan)
      // impute decisions bit-identical under the flag (integer-valued
      // l_quantity: heavy ties, every quantile lands on a data value)
      val li = graft.engine.Tables.load(spark, dir, "lineitem")
        .select(when(col("l_linenumber") >= 4, lit(null))
          .otherwise(col("l_quantity")).as("x1"))
      val dFlag = graft.engine.Impute.decisions(li, Seq("x1"))
      spark.conf.unset(Percentiles.ApproxConf)
      val dExact = graft.engine.Impute.decisions(li, Seq("x1"))
      assert(dFlag === dExact)
      // and quantileBuckets assignment is value-identical there too
      spark.conf.set(Percentiles.ApproxConf, "true")
      def buckets() = graft.engine.Profile.quantileBuckets(li, "x1", 4)
        .groupBy("bucket").count().collect()
        .map(r => (Option(r.get(0)), r.getLong(1))).toMap
      val bFlag = buckets()
      spark.conf.unset(Percentiles.ApproxConf)
      val bExact = buckets()
      assert(bFlag === bExact)
      // non-double NUMERIC columns must survive the flag: exact
      // `percentile` returns DoubleType but percentile_approx returns
      // the CHILD's type, so without the double cast inside
      // Percentiles.pct the flag would flip Impute's getAs[Double]
      // reads into ClassCastExceptions on int/long/decimal columns
      spark.conf.set(Percentiles.ApproxConf, "true")
      val longCol = spark.range(0, 100).toDF("v")
        .select(when(col("v") % 4 === 0, lit(null))
          .otherwise(col("v")).cast("long").as("x1"))
      val dLong = graft.engine.Impute.decisions(longCol, Seq("x1"))
      assert(dLong.nonEmpty && dLong.head.strategy.nonEmpty)
    } finally spark.conf.unset(Percentiles.ApproxConf)
  }

  test("percentile.approx flag reaches the Eval decile family: gains " +
      "bands and calibration bins shift boundary rows only; accuracy " +
      "conf misuse fails loudly naming the key") {
    // Same contract as the lorenz/impute pin above, for the two
    // remaining exact-`percentile` consumers (Eval.gainsTable,
    // Eval.calibrationBins): under the flag the GK sketch (rank-exact at
    // fixture scale) can snap each interpolated cut to an adjacent data
    // value, so a band bounded by two cuts moves at most the rows tied
    // at each cut — ≤ 2 here (cent-distinct prices / 6dp-distinct
    // probabilities) — and group totals are conserved.
    import graft.engine.Percentiles
    val dir = "/root/testdata/sf0.001"
    assume(new java.io.File(s"$dir/lineitem.parquet").exists())
    def bands(q: String) = QueryRegistry.byName(q).run(spark, dir)
      .collect().map(r => r.getLong(0) -> r.getLong(1)).toMap
    assert(spark.conf.getOption(Percentiles.ApproxConf).isEmpty)
    val exactG = bands("q_gains_table")
    val exactC = bands("q_calibration")
    spark.conf.set(Percentiles.ApproxConf, "true")
    try {
      for ((q, exact) <- Seq("q_gains_table" -> exactG,
          "q_calibration" -> exactC)) {
        val approx = bands(q)
        assert(approx.keySet === exact.keySet, q)
        approx.foreach { case (b, n) =>
          assert(math.abs(n - exact(b)) <= 2L, s"$q band $b: $n vs ${exact(b)}") }
        assert(approx.values.sum === exact.values.sum, q)
        val plan = QueryRegistry.byName(q).run(spark, dir)
          .queryExecution.optimizedPlan.toString
        assert(plan.contains("percentile_approx"), s"$q flag not live:\n$plan")
      }
      // conf validation: non-numeric and non-positive accuracy both fail
      // loudly, naming the conf key (never a bare NumberFormatException
      // or an opaque downstream analysis error)
      for (bad <- Seq("abc", "0", "-5")) {
        spark.conf.set(Percentiles.AccuracyConf, bad)
        val e = intercept[IllegalArgumentException] {
          Percentiles.accuracy(spark) }
        assert(e.getMessage.contains(Percentiles.AccuracyConf), e.getMessage)
        spark.conf.unset(Percentiles.AccuracyConf)
      }
    } finally {
      spark.conf.unset(Percentiles.ApproxConf)
      spark.conf.unset(Percentiles.AccuracyConf)
    }
  }
}
