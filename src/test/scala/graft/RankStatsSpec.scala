package graft

import graft.engine.RankStats
import org.apache.spark.sql.functions.col

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

  test("cohensD: unit-separated equal-variance groups pin d") {
    // a = {1,2,3}, b = {3,4,5}: means 2/4, each var 1 → pooled 1 →
    // d = -2; J = 1 − 3/(4·6−9) = 0.8 → g = -1.6
    val df = (Seq(1, 2, 3).map(v => ("g", "A", v.toDouble)) ++
      Seq(3, 4, 5).map(v => ("g", "B", v.toDouble)))
      .toDF("lbl", "smp", "v")
    val r = graft.engine.EffectSize.cohensD(df, "lbl", "v", "smp",
      "A", "B").head()
    assert(r.getAs[Double]("d") === -2.0)
    assert(r.getAs[Double]("g") === -1.6)
  }

  test("wilsonCi: brackets the rate and stays inside [0,1] at extremes") {
    val df = ((1 to 9).map(i => ("g", 1)) :+ (("g", 0)))
      .toDF("lbl", "s")
    val r = graft.engine.EffectSize.wilsonCi(df, "lbl", col("s")).head()
    assert(r.getAs[Double]("rate") === 0.9)
    val (lo, hi) = (r.getAs[Double]("ci_lo"), r.getAs[Double]("ci_hi"))
    assert(lo < 0.9 && 0.9 < hi && hi < 1.0 && lo > 0.0)
  }

  test("tukeyPairs: symmetric three-group layout gives symmetric q") {
    val df = (Seq(1, 2, 3).map(v => ("A", v.toDouble)) ++
      Seq(4, 5, 6).map(v => ("B", v.toDouble)) ++
      Seq(7, 8, 9).map(v => ("C", v.toDouble))).toDF("g", "v")
    val r = graft.engine.EffectSize.tukeyPairs(df, "g", "v").collect()
      .map(x => (x.getAs[String]("g1"), x.getAs[String]("g2")) ->
        (x.getAs[Double]("diff"), x.getAs[Double]("q_stat"))).toMap
    assert(r(("A", "B"))._1 === -3.0)
    assert(r(("B", "C"))._1 === -3.0)
    assert(r(("A", "B"))._2 === r(("B", "C"))._2)
    // each q rounds to 8dp independently — doubling a rounded value
    // can differ in the last digit
    assert(math.abs(r(("A", "C"))._2 - 2.0 * r(("A", "B"))._2) < 2e-8)
  }

  test("theil-sen: one outlier does not move the median slope") {
    // v = 2t except t=6 → 100: most pairwise slopes stay 2
    val df = ((1L to 5L).map(i => ("g", i, BigDecimal(2 * i))) :+
      (("g", 6L, BigDecimal(100)))).toDF("lbl", "t", "v")
    val r = RankStats.theilSen(df, "lbl", "t", "v").head()
    assert(r.getAs[Double]("sen_slope") === 2.0)
  }

  test("width-contract convention: every RankStats function mixing " +
    "DECIMAL aggregation with a double cast carries a WIDTH: comment") {
    // The round-6 sf1 Kruskal–Wallis defect was a decimal→double
    // conversion past ~16 significant digits — engine-dependent and
    // invisible at sf0.001. The convention: each function that sums in
    // DECIMAL and casts the sum to double must state (grep-ably, as a
    // `WIDTH:` comment) the significant-digit bound and where it breaks.
    // This audit fails compilation-adjacent instead of at the sf25 sweep.
    val src = scala.io.Source.fromFile(
      "src/main/scala/graft/engine/RankStats.scala", "UTF-8")
    val text = try src.mkString finally src.close()
    // split on top-level defs; block i spans def i .. def i+1
    val blocks = text.split("\n  def ").drop(1)
    assert(blocks.length >= 5, "expected the five RankStats functions")
    blocks.foreach { b =>
      val name = b.takeWhile(_ != '(')
      if (b.contains("decimal") && b.contains("cast(\"double\")"))
        assert(b.contains("WIDTH"),
          s"RankStats.$name mixes DECIMAL with a double cast but has " +
            "no WIDTH: width-contract comment")
    }
  }
}
