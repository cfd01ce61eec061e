package graft

import graft.engine.RankStats

/** Analytic pins for the rank/robust-stats tier — every constant below is
  * derivable by hand (exact rank algebra on tiny inputs), so the tests
  * hold independently of any other statistics library. */
class RankStatsSpec extends SparkSpec {
  import spark.implicits._

  test("spearman: monotone = 1, anti-monotone = -1, known 0.8 case") {
    val mono = Seq((1.0, 10.0), (2.0, 20.0), (3.0, 25.0), (4.0, 90.0))
      .map { case (x, y) => ("g", x, y) }.toDF("lbl", "x", "y")
    assert(RankStats.spearman(mono, "lbl", "x", "y")
      .head().getAs[Double]("rho") === 1.0)

    val anti = Seq((1.0, 90.0), (2.0, 25.0), (3.0, 20.0), (4.0, 10.0))
      .map { case (x, y) => ("g", x, y) }.toDF("lbl", "x", "y")
    assert(RankStats.spearman(anti, "lbl", "x", "y")
      .head().getAs[Double]("rho") === -1.0)

    // x = 1..5, y = (2,1,4,3,5): rho = (5·53 − 15·15)/(5·55 − 15·15) = 0.8
    val known = Seq((1.0, 2.0), (2.0, 1.0), (3.0, 4.0), (4.0, 3.0),
        (5.0, 5.0))
      .map { case (x, y) => ("g", x, y) }.toDF("lbl", "x", "y")
    assert(math.abs(RankStats.spearman(known, "lbl", "x", "y")
      .head().getAs[Double]("rho") - 0.8) < 1e-9)
  }

  test("spearman: tied values mid-rank (x=[1,2,2,3] vs scaled copy = 1)") {
    val tied = Seq((1.0, 10.0), (2.0, 20.0), (2.0, 20.0), (3.0, 40.0))
      .map { case (x, y) => ("g", x, y) }.toDF("lbl", "x", "y")
    assert(RankStats.spearman(tied, "lbl", "x", "y")
      .head().getAs[Double]("rho") === 1.0)
  }

  test("kruskal-wallis: A=[1,2] B=[3,4] gives H = 2.4, no tie correction") {
    val df = Seq(("A", 1.0), ("A", 2.0), ("B", 3.0), ("B", 4.0))
      .toDF("f", "v")
    val r = RankStats.kruskalWallis(df, "f", "v").head()
    assert(r.getAs[Long]("n") === 4L)
    assert(math.abs(r.getAs[Double]("h") - 2.4) < 1e-9)
    assert(math.abs(r.getAs[Double]("h_corrected") - 2.4) < 1e-9)
  }

  test("kruskal-wallis: all values tied → h_corrected NULL, h = -3(N+1)+3(N+1)·…") {
    val df = Seq(("A", 5.0), ("A", 5.0), ("B", 5.0), ("B", 5.0))
      .toDF("f", "v")
    val r = RankStats.kruskalWallis(df, "f", "v").head()
    // correction C = 1 − (t³−t)/(N³−N) = 0 when every value ties
    assert(r.isNullAt(r.fieldIndex("h_corrected")))
  }

  test("brown-forsythe: identical deviation shapes → F = 0") {
    val df = Seq(("A", 1.0), ("A", 2.0), ("A", 3.0),
      ("B", 11.0), ("B", 12.0), ("B", 13.0)).toDF("g", "v")
    val r = RankStats.brownForsythe(df, "g", "v").head()
    assert(r.getAs[Long]("n") === 6L)
    assert(r.getAs[Double]("f_stat") === 0.0)
  }

  test("brown-forsythe: unequal spreads → F > 0") {
    val df = Seq(("A", 1.0), ("A", 1.1), ("A", 0.9),
      ("B", 0.0), ("B", 20.0), ("B", 10.0)).toDF("g", "v")
    val r = RankStats.brownForsythe(df, "g", "v").head()
    assert(r.getAs[Double]("f_stat") > 1.0)
  }

  test("mann-kendall: strictly increasing series → S = n(n−1)/2, known Z") {
    val df = (1L to 5L).map(i => ("g", i, BigDecimal(i * 10)))
      .toDF("lbl", "t", "v")
    val r = RankStats.mannKendall(df, "lbl", "t", "v").head()
    assert(r.getAs[Long]("s") === 10L)
    // var = 5·4·15/18; z = 9/sqrt(var) = 2.20454077
    val z = r.getAs[Double]("z")
    assert(math.abs(z - 9.0 / math.sqrt(5.0 * 4 * 15 / 18.0)) < 1e-8)
  }

  test("mann-kendall: constant series → S = 0, var = 0 (tie term) → z NULL") {
    val df = (1L to 4L).map(i => ("g", i, BigDecimal(7)))
      .toDF("lbl", "t", "v")
    val r = RankStats.mannKendall(df, "lbl", "t", "v").head()
    assert(r.getAs[Long]("s") === 0L)
    assert(r.isNullAt(r.fieldIndex("z")))
  }

  test("theil-sen: exact line v = 3t + noise-free → slope 3") {
    val df = (1L to 6L).map(i => ("g", i, BigDecimal(3 * i)))
      .toDF("lbl", "t", "v")
    val r = RankStats.theilSen(df, "lbl", "t", "v").head()
    assert(r.getAs[Long]("n_pairs") === 15L)
    assert(r.getAs[Double]("sen_slope") === 3.0)
  }

  test("theil-sen: one outlier does not move the median slope") {
    // v = 2t except t=6 → 100: most pairwise slopes stay 2
    val df = ((1L to 5L).map(i => ("g", i, BigDecimal(2 * i))) :+
      (("g", 6L, BigDecimal(100)))).toDF("lbl", "t", "v")
    val r = RankStats.theilSen(df, "lbl", "t", "v").head()
    assert(r.getAs[Double]("sen_slope") === 2.0)
  }
}
