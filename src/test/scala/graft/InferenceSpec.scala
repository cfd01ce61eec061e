package graft

import graft.engine.{Eval, Governance, Stats, TimeSeries}
import graft.llm.Itemsets
import org.apache.spark.sql.functions._

/** Analytic pins for the round-5 inference tier. Every expected constant
  * below is derived by hand (exact rational arithmetic on tiny inputs) or
  * against a published closed form — never against another run of the
  * engine — so the suite holds independently of the DuckDB oracle.
  */
class InferenceSpec extends SparkSpec {
  import spark.implicits._

  // ---- log-gamma render (shared by engine plan and oracle) -------------

  test("lgammaSql matches ln((n-1)!) to 1e-10 for n = 1..20") {
    val df = spark.range(1, 21).toDF("x")
      .withColumn("lg", expr(Stats.lgammaSql("CAST(x AS DOUBLE)")))
    val got = df.orderBy("x").collect().map(_.getAs[Double]("lg"))
    val want = (1 to 20).map { n =>
      math.log((1 until n).foldLeft(1.0)((a, i) => a * i))
    }
    got.zip(want).foreach { case (g, w) =>
      assert(math.abs(g - w) < 1e-10, s"lgamma($got) vs $want")
    }
  }

  // ---- Fisher exact ----------------------------------------------------

  test("fisherExact: tea-tasting [[3,1],[1,3]] → p = 34/70") {
    // margins 4/4, n=8: C(4,k)C(4,4-k)/C(8,4) = (1,16,36,16,1)/70;
    // observed a=3 (term 16/70), two-sided = (1+16+16+1)/70
    val rows = Seq.fill(3)((true, true)) ++ Seq.fill(1)((true, false)) ++
      Seq.fill(1)((false, true)) ++ Seq.fill(3)((false, false))
    val df = rows.toDF("tr", "oc")
    val r = Stats.fisherExact(df, col("tr"), col("oc")).head()
    assert(r.getAs[Long]("a") === 3L && r.getAs[Long]("d") === 3L)
    assert(math.abs(r.getAs[Double]("p_two") - 34.0 / 70.0) < 1e-6)
  }

  test("fisherExact: independence-ish table includes all terms → p = 1") {
    // [[2,2],[2,2]]: all 5 terms ≤ the observed central term, sum = 1
    val rows = Seq.fill(2)((true, true)) ++ Seq.fill(2)((true, false)) ++
      Seq.fill(2)((false, true)) ++ Seq.fill(2)((false, false))
    val r = Stats.fisherExact(rows.toDF("tr", "oc"), col("tr"), col("oc"))
      .head()
    assert(math.abs(r.getAs[Double]("p_two") - 1.0) < 1e-6)
  }

test("fisherExact and binomSignTest keep the one-row contract on " +
    "empty input") {
    val empty = Seq.empty[(Boolean, Boolean)].toDF("tr", "oc")
    val fr = Stats.fisherExact(empty, col("tr"), col("oc")).collect()
    assert(fr.length === 1 && fr.head.isNullAt(5))
    val zeros = Seq(0.0, 0.0).map(Tuple1(_)).toDF("d")
    val br = Stats.binomSignTest(zeros, "d").collect()
    assert(br.length === 1)
    assert(br.head.getAs[Long]("n_nonzero") === 0L)
    assert(br.head.isNullAt(2))
  }

  test("fisherExact: p_two is capped at 1.0 (binomSignTest convention) " +
    "even when the 8dp term sum carries accumulated rounding") {
    // 500/500 balanced margins → 501 k-grid terms, central observed →
    // every term ≤ tobs; the exact sum is 1 and per-term 8dp rounding
    // can push the raw sum past 1. The cap must hold, NULL-gated.
    val n = 500
    val rows = Seq.fill(n / 2)((true, true)) ++
      Seq.fill(n / 2)((true, false)) ++ Seq.fill(n / 2)((false, true)) ++
      Seq.fill(n / 2)((false, false))
    val r = Stats.fisherExact(rows.toDF("tr", "oc"), col("tr"), col("oc"))
      .head()
    val p = r.getAs[Double]("p_two")
    assert(p <= 1.0 && p > 0.999, s"p_two=$p")
  }

  // ---- McNemar ----------------------------------------------------------

  test("mcnemar: b=3 c=1 → (|3-1|-1)²/4 = 0.25; b=c=0 → NULL") {
    val df = (Seq.fill(3)((true, false)) ++ Seq.fill(1)((false, true)) ++
      Seq.fill(4)((true, true))).toDF("a_ok", "b_ok")
    val r = Stats.mcnemar(df, col("a_ok"), col("b_ok")).head()
    assert(r.getAs[Long]("b_discordant") === 3L)
    assert(r.getAs[Long]("c_discordant") === 1L)
    assert(math.abs(r.getAs[Double]("chi2") - 0.25) < 1e-9)

    val agree = Seq((true, true), (false, false)).toDF("a_ok", "b_ok")
    assert(Stats.mcnemar(agree, col("a_ok"), col("b_ok"))
      .head().isNullAt(3))
  }

  // ---- Nelson–Aalen -----------------------------------------------------

  test("nelsonAalen: hand-cumulated hazard over a 3-time grid") {
    // t=1: 6 at risk, 2 deaths → 1/3; t=2: 4 at risk, 1 death (+1 cens)
    // → +1/4; t=3: 2 at risk, 0 deaths → +0
    val spans = Seq((1L, true), (1L, true), (2L, true), (2L, false),
      (3L, false), (3L, false)).toDF("dur", "ev")
    val rows = Stats.nelsonAalen(spans, "dur", "ev")
      .orderBy("duration").collect()
    assert(rows.map(_.getAs[Long]("at_risk")).toSeq === Seq(6L, 4L, 2L))
    val h = rows.map(_.getAs[Double]("cum_hazard"))
    assert(math.abs(h(0) - 1.0 / 3.0) < 1e-7)
    assert(math.abs(h(1) - (1.0 / 3.0 + 0.25)) < 1e-7)
    assert(math.abs(h(2) - h(1)) < 1e-12)
  }

  test("nelsonAalen: H(t1) = d/n and -ln(KM survival) bounds it above") {
    // single-time sanity: H(t1) = d/n while -ln S = -ln(1-d/n) ≥ H
    val spans = Seq((1L, true), (1L, false), (1L, false)).toDF("d", "e")
    val na = Stats.nelsonAalen(spans, "d", "e").head()
      .getAs[Double]("cum_hazard")
    val km = Stats.kaplanMeier(spans, "d", "e").head()
      .getAs[Double]("survival")
    assert(math.abs(na - 1.0 / 3.0) < 1e-7)
    assert(-math.log(km) >= na - 1e-9)
  }

  // ---- Kendall τ-b -------------------------------------------------------

  test("kendallTauB: y=(1,3,2,4) → (5-1)/6; monotone → 1; ties corrected") {
    val s1 = Seq(("g", 1L, 1.0), ("g", 2L, 3.0), ("g", 3L, 2.0),
      ("g", 4L, 4.0)).toDF("g", "i", "v")
    val r1 = Stats.kendallTauB(s1, "g", "i", "v").head()
    assert(r1.getAs[Long]("concordant") === 5L)
    assert(r1.getAs[Long]("discordant") === 1L)
    assert(math.abs(r1.getAs[Double]("tau_b") - 4.0 / 6.0) < 1e-8)

    val mono = Seq(("g", 1L, 1.0), ("g", 2L, 2.0), ("g", 3L, 3.0))
      .toDF("g", "i", "v")
    assert(math.abs(Stats.kendallTauB(mono, "g", "i", "v").head()
      .getAs[Double]("tau_b") - 1.0) < 1e-12)

    // y=(1,1,2): pairs=3, conc=2, tie=1 → tau = 2/sqrt(3·2)
    val tied = Seq(("g", 1L, 1.0), ("g", 2L, 1.0), ("g", 3L, 2.0))
      .toDF("g", "i", "v")
    assert(math.abs(Stats.kendallTauB(tied, "g", "i", "v").head()
      .getAs[Double]("tau_b") - 2.0 / math.sqrt(6.0)) < 1e-8)
  }

  // ---- BH-FDR -------------------------------------------------------------

  test("fdrBh: textbook step-up with a non-monotone raw sequence") {
    // p = (.01,.04,.03,.005): sorted (.005,.01,.03,.04), raw = p·4/i =
    // (.02,.02,.04,.04) → adj (cummin from right) = (.02,.02,.04,.04)
    val ps = Seq(("h1", 0.01), ("h2", 0.04), ("h3", 0.03), ("h4", 0.005))
      .toDF("h", "p")
    val rows = Stats.fdrBh(ps, "h", "p", alpha = 0.03)
      .orderBy("rank").collect()
    assert(rows.map(_.getAs[String]("h")).toSeq ===
      Seq("h4", "h1", "h3", "h2"))
    val adj = rows.map(_.getAs[Double]("p_adj"))
    assert(adj.zip(Seq(0.02, 0.02, 0.04, 0.04))
      .forall { case (a, b) => math.abs(a - b) < 1e-9 })
    assert(rows.map(_.getAs[Boolean]("reject")).toSeq ===
      Seq(true, true, false, false))
  }

  test("fdrBh: adjusted p capped at 1; NULL p dropped") {
    val ps = Seq(("a", 0.9), ("b", 0.95), ("c", Double.NaN))
      .toDF("h", "p")
      .select(col("h"), when(!isnan(col("p")), col("p")).as("p"))
    val rows = Stats.fdrBh(ps, "h", "p", alpha = 0.05).collect()
    assert(rows.length === 2)
    assert(rows.forall(_.getAs[Double]("p_adj") <= 1.0))
  }

  // ---- grouped sign-flip -----------------------------------------------

  test("groupedSignFlip: one-sided group gets small p, null group large") {
    val diffs = ((1 to 40).map(i => ("pos", s"k$i", 5.0)) ++
      (1 to 40).map(i => ("mix", s"k$i", if (i % 2 == 0) 1.0 else -1.0)))
      .toDF("g", "k", "d")
    val r = Stats.groupedSignFlip(diffs, "g", "k", "d", b = 99,
      seed = "t").collect().map(x =>
      x.getAs[String]("g") -> x.getAs[Double]("p_value")).toMap
    assert(r("pos") === 0.01) // no flip pattern can beat the all-positive sum
    assert(r("mix") > 0.2)    // T_obs = 0: every replicate is ≥ it
  }

  test("groupedSignFlip: NULL keys are listwise-dropped — t_obs, n and " +
    "the replicates cover the SAME rows") {
    // A NULL-keyed row is skipped by SignFlipSums.update; before the
    // fix it still entered t_obs/n, so the replicates were computed
    // over a different sample than the observed statistic.
    val withNull = (1 to 20).map(i => ("g", s"k$i", 5.0)) :+
      (("g", null: String, 1000.0))
    val clean = (1 to 20).map(i => ("g", s"k$i", 5.0))
    val got = Stats.groupedSignFlip(withNull.toDF("g", "k", "d"),
      "g", "k", "d", b = 32, seed = "n").head()
    val want = Stats.groupedSignFlip(clean.toDF("g", "k", "d"),
      "g", "k", "d", b = 32, seed = "n").head()
    assert(got.getAs[Long]("n") === 20L)
    assert(got.getAs[Double]("t_obs") === want.getAs[Double]("t_obs"))
    assert(got.getAs[Double]("p_value") === want.getAs[Double]("p_value"))
  }

  test("groupedSignFlip native flips match an independent MD5 recompute") {
    val rows = Seq(("g1", "a", 3.0), ("g1", "b", -1.5), ("g1", "c", 2.25),
      ("g2", "d", 10.0), ("g2", "e", -10.0))
    val df = rows.toDF("g", "k", "d")
    val b = 8
    val got = Stats.groupedSignFlip(df, "g", "k", "d", b, seed = "x")
      .collect().map(r => r.getAs[String]("g") ->
        r.getAs[Double]("p_value")).toMap
    def flip(key: String, r: Int): Boolean = {
      val hex = java.security.MessageDigest.getInstance("MD5")
        .digest(s"x|$key".getBytes("UTF-8"))
        .map("%02x".format(_)).mkString
      ((Character.digit(hex.charAt(r / 4), 16) >> (3 - r % 4)) & 1) == 1
    }
    val want = rows.groupBy(_._1).map { case (g, rs) =>
      val cents = rs.map(t => (t._2, math.round(t._3 * 100)))
      val tobs = cents.map(_._2).sum
      val ne = (0 until b).count { r =>
        val tb = cents.map { case (k, c) => if (flip(k, r)) -c else c }.sum
        math.abs(tb) >= math.abs(tobs)
      }
      g -> BigDecimal((1.0 + ne) / (b + 1.0))
        .setScale(8, BigDecimal.RoundingMode.HALF_UP).toDouble
    }
    assert(got === want)
  }

  // ---- average precision ---------------------------------------------------

  test("averagePrecision: hand AP with a tie block") {
    // scores desc: [0.9: +], [0.5: +,-  (tie block)], [0.1: -]
    // block precisions after block: 1/1, 2/3, 2/4 → AP = (1·1 + 1·(2/3))/2
    val df = Seq((0.9, true), (0.5, true), (0.5, false), (0.1, false))
      .toDF("s", "y")
    val r = Eval.averagePrecision(df, "s", col("y")).head()
    assert(r.getAs[Long]("n_pos") === 2L)
    assert(math.abs(r.getAs[Double]("avg_precision") -
      (1.0 + 2.0 / 3.0) / 2.0) < 1e-8)
  }

  test("averagePrecision: no positives → NULL; all positives → 1") {
    val none = Seq((0.9, false), (0.1, false)).toDF("s", "y")
    assert(Eval.averagePrecision(none, "s", col("y")).head().isNullAt(2))
    val all = Seq((0.9, true), (0.1, true)).toDF("s", "y")
    assert(math.abs(Eval.averagePrecision(all, "s", col("y")).head()
      .getAs[Double]("avg_precision") - 1.0) < 1e-12)
  }

  // ---- Cohen's kappa ---------------------------------------------------------

  test("cohensKappa: classic 2-class hand example") {
    // agree on 20+15 of 50; marginals A: 25/25, B: 30/20 →
    // po = .7, pe = (25·30 + 25·20)/2500 = .5 → kappa = .4
    val rows = Seq.fill(20)(("x", "x")) ++ Seq.fill(15)(("y", "y")) ++
      Seq.fill(10)(("x", "y")) ++ Seq.fill(5)(("y", "x"))
    val r = Eval.cohensKappa(rows.toDF("a", "b"), col("a"), col("b"))
      .head()
    assert(math.abs(r.getAs[Double]("po") - 0.7) < 1e-9)
    assert(math.abs(r.getAs[Double]("pe") - 0.5) < 1e-9)
    assert(math.abs(r.getAs[Double]("kappa") - 0.4) < 1e-9)
  }

  test("cohensKappa: identical raters → kappa 1; disjoint → kappa ≤ 0") {
    val same = Seq(("x", "x"), ("y", "y"), ("z", "z")).toDF("a", "b")
    assert(math.abs(Eval.cohensKappa(same, col("a"), col("b")).head()
      .getAs[Double]("kappa") - 1.0) < 1e-9)
    val disj = Seq(("x", "y"), ("y", "x")).toDF("a", "b")
    assert(Eval.cohensKappa(disj, col("a"), col("b")).head()
      .getAs[Double]("kappa") <= 0.0)
  }

  test("cohensKappa: NULL-labeled rows are listwise-dropped — po and pe " +
    "cover the same sample") {
    // Before the fix a NULL label counted in n and the p_o denominator
    // (null === null agrees as 0) but vanished from the p_e marginal
    // join — kappa biased. With the drop, the classic example's 0.4
    // must survive added NULL rows untouched.
    val rows = Seq.fill(20)(("x", "x")) ++ Seq.fill(15)(("y", "y")) ++
      Seq.fill(10)(("x", "y")) ++ Seq.fill(5)(("y", "x")) ++
      Seq.fill(10)((null: String, "x")) ++
      Seq.fill(4)(("y", null: String))
    val r = Eval.cohensKappa(rows.toDF("a", "b"), col("a"), col("b"))
      .head()
    assert(r.getAs[Long]("n") === 50L)
    assert(math.abs(r.getAs[Double]("po") - 0.7) < 1e-9)
    assert(math.abs(r.getAs[Double]("pe") - 0.5) < 1e-9)
    assert(math.abs(r.getAs[Double]("kappa") - 0.4) < 1e-9)
  }

  // ---- IPW ATE -----------------------------------------------------------

  test("ipwAte recovers a constant within-stratum effect exactly") {
    // stratum s0: control mean 100, s1: control mean 200; effect +10
    // everywhere. Unequal propensities and counts per stratum must not
    // bias the Hájek estimate of the effect.
    val rows =
      Seq.fill(8)(("s0", true, 110.0, 0.8)) ++
        Seq.fill(2)(("s0", false, 100.0, 0.8)) ++
        Seq.fill(3)(("s1", true, 210.0, 0.25)) ++
        Seq.fill(9)(("s1", false, 200.0, 0.25))
    val df = rows.toDF("str", "treat", "y", "p")
    val r = Eval.ipwAte(df, "str", col("treat"), "y", "p").head()
    assert(r.getAs[Long]("n_treat") === 11L)
    assert(r.getAs[Long]("n_ctrl") === 11L)
    // Hájek weights: treated mean = (8·110/.8 + 3·210/.25)/(8/.8+3/.25)
    val muT = (8 * 110 / 0.8 + 3 * 210 / 0.25) / (8 / 0.8 + 3 / 0.25)
    val muC = (2 * 100 / 0.2 + 9 * 200 / 0.75) / (2 / 0.2 + 9 / 0.75)
    assert(math.abs(r.getAs[Double]("mu_treat") - muT) < 1e-6)
    assert(math.abs(r.getAs[Double]("mu_ctrl") - muC) < 1e-6)
    assert(math.abs(r.getAs[Double]("ate") - (muT - muC)) < 1e-6)
  }

  test("ipwAte drops out-of-range propensities (visible in counts)") {
    val df = Seq(("s", true, 1.0, 0.5), ("s", false, 0.0, 0.5),
      ("bad", true, 9.0, 1.5)).toDF("str", "treat", "y", "p")
    val r = Eval.ipwAte(df, "str", col("treat"), "y", "p").head()
    assert(r.getAs[Long]("n_treat") === 1L)
  }

  // ---- empirical Bayes ----------------------------------------------------

  test("ebSmooth: low-n key shrinks harder toward the prior mean") {
    // many keys at rates .2/.4 establish an overdispersed prior; then a
    // 1/10 key and a 100/1000 key (same raw rate .1) must both land
    // between .1 and the prior mean, the low-n one strictly closer to it
    val bg = (1 to 10).map(i => (s"a$i", 20L, 100L)) ++
      (1 to 10).map(i => (s"b$i", 40L, 100L))
    val df = (bg ++ Seq(("lo", 1L, 10L), ("hi", 100L, 1000L)))
      .toDF("key", "k", "n")
    val out = Eval.ebSmooth(df, "key", "k", "n").collect()
      .map(r => r.getAs[String]("key") -> r.getAs[Double]("posterior"))
      .toMap
    // prior mean ≈ (10·.2 + 10·.4 + .1 + .1)/22 ≈ 0.2818
    assert(out("lo") > 0.1 && out("lo") < 0.29)
    assert(out("hi") > 0.1 && out("hi") < 0.29)
    assert(out("lo") > out("hi")) // low-n key sits closer to the prior mean
  }

  test("ebSmooth: degenerate prior (all rates equal) → NULL posterior") {
    val df = Seq(("a", 1L, 10L), ("b", 2L, 20L), ("c", 3L, 30L))
      .toDF("key", "k", "n")
    val rows = Eval.ebSmooth(df, "key", "k", "n").collect()
    assert(rows.forall(_.isNullAt(4)))
  }

  // ---- SAX ------------------------------------------------------------------

  test("saxSymbols: symbols follow the ±0.6745 breakpoints by hand") {
    // 4 chunks of 1 day with values 0, 10, 20, 30: mean 15, sd ≈ 12.9;
    // z = (-1.16, -0.39, 0.39, 1.16) → a, b, c, d
    val daily = Seq((0L, 0.0), (1L, 10.0), (2L, 20.0), (3L, 30.0))
      .toDF("day", "v")
    val rows = TimeSeries.saxSymbols(daily, "day", "v", 1)
      .orderBy("chunk").collect()
    assert(rows.map(_.getAs[String]("symbol")).toSeq ===
      Seq("a", "b", "c", "d"))
  }

  test("saxSymbols: zero-variance series → NULL symbols, PAA intact") {
    val daily = Seq((0L, 5.0), (1L, 5.0), (7L, 5.0), (8L, 5.0))
      .toDF("day", "v")
    val rows = TimeSeries.saxSymbols(daily, "day", "v", 7).collect()
    assert(rows.forall(_.isNullAt(3)))
    assert(rows.forall(_.getAs[Double]("paa") === 5.0))
  }

  // ---- sequential pairs -------------------------------------------------------

  test("sequentialPairs: strict first-occurrence order, ties dropped") {
    val ev = Seq(
      // session (1, 0): view@1 → click@2 → view@5 (repeat ignored)
      (1L, 0L, "view", 1L), (1L, 0L, "click", 2L), (1L, 0L, "view", 5L),
      // session (2, 0): click and view tie at 3 → no pair
      (2L, 0L, "click", 3L), (2L, 0L, "view", 3L),
      // session (3, 0): view@1 → click@9
      (3L, 0L, "view", 1L), (3L, 0L, "click", 9L))
      .toDF("user_id", "day", "event_type", "ts")
    val out = Itemsets.sequentialPairs(ev, Seq("user_id", "day"),
      "event_type", "ts", minSupport = 1L).collect()
      .map(r => (r.getAs[String]("item_a"), r.getAs[String]("item_b")) ->
        r.getAs[Long]("n_sessions")).toMap
    assert(out === Map(("view", "click") -> 2L))
  }

  // ---- CMH ---------------------------------------------------------------

  test("cmh: one stratum reduces to (a-E)²/V; OR_MH on a hand table") {
    // [[4,1],[1,4]]: n=10, E = 5·5/10 = 2.5, V = 5·5·5·5/(100·9),
    // OR_MH = (4·4/10)/(1·1/10) = 16
    val rows = Seq.fill(4)((0, true, true)) ++ Seq.fill(1)((0, true, false)) ++
      Seq.fill(1)((0, false, true)) ++ Seq.fill(4)((0, false, false))
    val df = rows.toDF("s", "tr", "oc")
    val r = Stats.cmh(df, "s", col("tr"), col("oc")).head()
    assert(r.getAs[Long]("o_a") === 4L)
    assert(math.abs(r.getAs[Double]("e_a") - 2.5) < 1e-9)
    assert(math.abs(r.getAs[Double]("variance") - 625.0 / 900.0) < 1e-7)
    val chi2 = 1.5 * 1.5 / (625.0 / 900.0)
    assert(math.abs(r.getAs[Double]("chi2") - chi2) < 1e-6)
    assert(math.abs(r.getAs[Double]("or_mh") - 16.0) < 1e-9)
  }

  test("cmh: a single-subject stratum is excluded from every sum") {
    val rows = Seq((0, true, true), (0, true, false), (0, false, true),
      (0, false, false), (1, true, true)) // stratum 1 has n=1
    val r = Stats.cmh(rows.toDF("s", "tr", "oc"), "s", col("tr"),
      col("oc")).head()
    assert(r.getAs[Long]("n_strata") === 1L)
    assert(r.getAs[Long]("o_a") === 1L)
  }

  // ---- binomial sign test -----------------------------------------------

  test("binomSignTest: k=n=5 → 2/32; k=3,n=4 → 10/16; zeros dropped") {
    val all = (1 to 5).map(i => Tuple1(i.toDouble)).toDF("d")
    val r1 = Stats.binomSignTest(all, "d").head()
    assert(r1.getAs[Long]("k_pos") === 5L)
    assert(math.abs(r1.getAs[Double]("p_two") - 2.0 / 32.0) < 1e-6)

    val mixed = Seq(1.0, 2.0, 3.0, -1.0, 0.0).map(Tuple1(_)).toDF("d")
    val r2 = Stats.binomSignTest(mixed, "d").head()
    assert(r2.getAs[Long]("n_nonzero") === 4L)
    assert(r2.getAs[Long]("k_pos") === 3L)
    // pmf = (1,4,6,4,1)/16; obs 4/16 → included 1+4+4+1 = 10/16
    assert(math.abs(r2.getAs[Double]("p_two") - 10.0 / 16.0) < 1e-6)
  }

  // ---- RMST -----------------------------------------------------------------

  test("rmst: hand-integrated KM step function, horizon clamps") {
    // event at t=2 (S→0.5), censored at t=5; τ=4:
    // 1·[0,2) + 0.5·[2,4) = 2 + 1 = 3
    val spans = Seq((2L, true), (5L, false)).toDF("dur", "ev")
    val r = Stats.rmst(spans, "dur", "ev", tau = 4L).head()
    assert(r.getAs[Long]("tau") === 4L)
    assert(math.abs(r.getAs[Double]("rmst") - 3.0) < 1e-7)
    // τ before the first event: survival never drops inside [0,τ)
    val r2 = Stats.rmst(spans, "dur", "ev", tau = 2L).head()
    assert(math.abs(r2.getAs[Double]("rmst") - 2.0) < 1e-9)
  }

  // ---- Page–Hinkley -----------------------------------------------------------

  test("pageHinkley: constant series → 0; a step up is detected at the step") {
    val flat = (1 to 10).map(i => ("g", i.toLong, 5.0)).toDF("g", "i", "x")
    val rf = TimeSeries.pageHinkley(flat, "g", "i", "x", 0.0).head()
    assert(rf.getAs[Double]("ph_stat") === 0.0)

    // x = (0, 10): terms (0, +5) → m = (0, 5), min = 0 → peak 5 at i=2
    val step = Seq(("g", 1L, 0.0), ("g", 2L, 10.0)).toDF("g", "i", "x")
    val rs = TimeSeries.pageHinkley(step, "g", "i", "x", 0.0).head()
    assert(math.abs(rs.getAs[Double]("ph_stat") - 5.0) < 1e-9)
    assert(rs.getAs[Long]("peak_at") === 2L)
  }

  // ---- CUPED ---------------------------------------------------------------

  test("cuped: a metric fully explained by the covariate adjusts to " +
    "equal arm means") {
    // y = 2x exactly → θ = 2, y' = 2x̄ for every row: both arms' adjusted
    // means equal 2·x̄ = 2·2.5 = 5 while raw means differ
    val df = Seq(("a", 1.0, 2.0), ("a", 2.0, 4.0), ("b", 3.0, 6.0),
      ("b", 4.0, 8.0)).toDF("arm", "x", "y")
    val rows = Eval.cuped(df, "arm", "x", "y").orderBy("arm").collect()
    assert(math.abs(rows(0).getAs[Double]("mean_adj") - 5.0) < 1e-7)
    assert(math.abs(rows(1).getAs[Double]("mean_adj") - 5.0) < 1e-7)
    assert(rows(0).getAs[Double]("mean_raw") === 3.0)
    assert(rows(1).getAs[Double]("mean_raw") === 7.0)
  }

  test("cuped: zero-variance covariate → NULL adjusted means") {
    val df = Seq(("a", 1.0, 2.0), ("b", 1.0, 4.0)).toDF("arm", "x", "y")
    val rows = Eval.cuped(df, "arm", "x", "y").collect()
    assert(rows.forall(_.isNullAt(3)))
  }

  // ---- SRM ---------------------------------------------------------------------

  test("srmCheck: hand χ² on a 60/40 split designed 50/50; vanished and " +
    "unmodelled arms fail loud") {
    val df = (Seq.fill(60)("a") ++ Seq.fill(40)("b")).map(Tuple1(_))
      .toDF("arm")
    val r = Eval.srmCheck(df, "arm", Seq("a" -> 0.5, "b" -> 0.5)).head()
    assert(r.getAs[Long]("n") === 100L)
    assert(math.abs(r.getAs[Double]("chi2") - 4.0) < 1e-9)

    // designed arm never observed: contributes its full e
    val r2 = Eval.srmCheck(df, "arm",
      Seq("a" -> 0.5, "b" -> 0.3, "c" -> 0.2)).head()
    assert(r2.getAs[Long]("n_arms") === 3L)
    assert(r2.getAs[Double]("chi2") > 4.0)

    // observed arm missing from the design: NULL statistic
    val r3 = Eval.srmCheck(df, "arm", Seq("a" -> 1.0)).head()
    assert(r3.isNullAt(2))
  }

test("srmCheck rejects a designed-zero ratio up front") {
    val df = Seq("a","b").map(Tuple1(_)).toDF("arm")
    intercept[IllegalArgumentException] {
      Eval.srmCheck(df, "arm", Seq("a" -> 1.0, "b" -> 0.0))
    }
  }

  test("ipwAte listwise-drops NULL outcomes (visible in counts, mean " +
    "unaffected)") {
    val df = Seq(("s", true, Some(10.0), 0.5), ("s", true, None, 0.5),
      ("s", false, Some(4.0), 0.5)).toDF("str", "treat", "y", "p")
    val r = Eval.ipwAte(df, "str", col("treat"), "y", "p").head()
    assert(r.getAs[Long]("n_treat") === 1L)
    assert(math.abs(r.getAs[Double]("mu_treat") - 10.0) < 1e-9)
  }

  test("averagePrecision drops NULL scores instead of ranking them") {
    val df = Seq((Some(0.9), true), (None, true), (Some(0.1), false))
      .toDF("s", "y")
    val r = Eval.averagePrecision(df, "s", col("y")).head()
    assert(r.getAs[Long]("n") === 2L)
    assert(r.getAs[Long]("n_pos") === 1L)
    assert(math.abs(r.getAs[Double]("avg_precision") - 1.0) < 1e-12)
  }

// ---- randomized response / RDD -------------------------------------

  test("randomizedResponse: debias matches an independent MD5 coin " +
    "recompute; all-true group lands near 1") {
    val rows = (1 to 200).map(i => ("g", s"u$i", true))
    val df = rows.toDF("g", "k", "truth")
    val r = Governance.randomizedResponse(df, "g", "k", col("truth"),
      q = 0.75, seed = "spec").head()
    def honest(key: String): Boolean = {
      val hex = java.security.MessageDigest.getInstance("MD5")
        .digest(s"spec|$key".getBytes("UTF-8"))
        .map("%02x".format(_)).mkString.take(8)
      hex < "c0000000"
    }
    val rep = rows.count(t => honest(t._2)) // truth=true: report=honest
    val ph = rep.toDouble / 200.0
    assert(math.abs(r.getAs[Double]("p_reported") - ph) < 1e-8)
    val pi = (ph + 0.75 - 1.0) / 0.5
    assert(math.abs(r.getAs[Double]("pi_hat") - pi) < 1e-8)
    assert(math.abs(r.getAs[Double]("pi_hat") - 1.0) < 0.2) // ~q ± noise
  }

  test("rddGap recovers a constructed jump exactly on noise-free sides") {
    // y = 2x + 7 (+10 at/after the cutoff), x on the cent grid
    val df = (-50 to 49).map { i =>
      val x = i.toDouble
      (x, 2.0 * x + 7.0 + (if (x >= 0) 10.0 else 0.0))
    }.toDF("x", "y")
    val r = Eval.rddGap(df, "x", "y", cutoff = 0.0, bandwidth = 30.0)
      .head()
    assert(r.getAs[Long]("n_left") === 30L)
    assert(r.getAs[Long]("n_right") === 30L)
    assert(math.abs(r.getAs[Double]("alpha_left") - 7.0) < 1e-6)
    assert(math.abs(r.getAs[Double]("alpha_right") - 17.0) < 1e-6)
    assert(math.abs(r.getAs[Double]("gap") - 10.0) < 1e-6)
  }

  test("rddGap: a degenerate side (single point) yields NULL, not a line") {
    val df = Seq((-1.0, 5.0), (0.0, 6.0), (1.0, 7.0)).toDF("x", "y")
    val r = Eval.rddGap(df, "x", "y", cutoff = 0.0, bandwidth = 2.0)
      .head()
    assert(r.isNullAt(2)) // one left point: no slope exists
    assert(r.isNullAt(4))
  }

// ---- license / hill / ucb ------------------------------------------

  test("licenseDetect: ladder priority and none-fallthrough") {
    val df = Seq(
      "Permission is hereby granted AND GNU General Public License",
      "licensed under the apache license",
      "plain text with no license at all",
      "Creative Commons Attribution 4.0").map(Tuple1(_)).toDF("text")
    val got = graft.llm.TextAnalysis.licenseDetect(df, "text")
      .collect().map(_.getAs[String]("license")).toSeq
    assert(got === Seq("mit", "apache", "none", "cc_by"))
  }

  test("hillTail: geometric top set gives alpha = 1/(2.5 ln 2)") {
    // top-5 of {16,8,4,2,1,0.5,...}: k=4, threshold x_(5)=1 →
    // mean ln ratio = (4+3+2+1)/4 · ln2 = 2.5 ln2
    val df = Seq(16.0, 8.0, 4.0, 2.0, 1.0, 0.5, 0.25)
      .zipWithIndex.map { case (v, i) => (v, s"k$i") }.toDF("v", "k")
    val r = Stats.hillTail(df, "v", "k", k = 4).head()
    assert(r.getAs[Double]("x_k") === 1.0)
    assert(math.abs(r.getAs[Double]("hill_alpha") -
      1.0 / (2.5 * math.log(2.0))) < 1e-6)
    // fewer than k+1 positive rows → NULL
    val small = Seq((3.0, "a"), (2.0, "b")).toDF("v", "k")
    assert(Stats.hillTail(small, "v", "k", k = 4).head().isNullAt(2))
  }

  test("ucbArms: under-pulled arm gets the bonus; ties choose the " +
    "smaller arm") {
    // arm a: 8 pulls mean 1.0; arm b: 2 pulls mean 1.0 → b's bonus is
    // larger → chosen = b
    val rows = Seq.fill(8)(("a", 1.0)) ++ Seq.fill(2)(("b", 1.0))
    val out = Eval.ucbArms(rows.toDF("arm", "r"), "arm", "r", c = 2.0)
      .collect().map(x => x.getAs[String]("arm") ->
        (x.getAs[Double]("ucb"), x.getAs[Boolean]("chosen"))).toMap
    assert(out("b")._1 > out("a")._1)
    assert(out("b")._2 && !out("a")._2)
    val wantB = 1.0 + math.sqrt(2.0 * math.log(10.0) / 2.0)
    assert(math.abs(out("b")._1 - wantB) < 1e-7)
    // exact tie (same n, same mean): the smaller arm is chosen
    val tie = Seq(("x", 1.0), ("y", 1.0)).toDF("arm", "r")
    val t = Eval.ucbArms(tie, "arm", "r").collect()
      .map(x => x.getAs[String]("arm") -> x.getAs[Boolean]("chosen"))
      .toMap
    assert(t("x") && !t("y"))
  }

  // ---- IPF raking -----------------------------------------------------------

  test("ipfRaking: margins converge to the targets; zero margins stay 0") {
    import org.apache.spark.sql.functions.{sum => fsum}
    val cells = Seq(("r1", "c1", 1L), ("r1", "c2", 1L), ("r2", "c1", 1L),
      ("r2", "c2", 3L)).toDF("nat", "prio", "w0")
    val rowT = Seq(("r1", 3.0), ("r2", 3.0)).toDF("nat", "target")
    val colT = Seq(("c1", 2.0), ("c2", 4.0)).toDF("prio", "target")
    val out = graft.engine.Reconcile.ipfRaking(cells, "nat", "prio",
      "w0", rowT, colT, rounds = 8)
    val rows = out.groupBy("nat").agg(fsum("weight").as("s"))
      .collect().map(r => r.getAs[String]("nat") -> r.getAs[Double]("s"))
      .toMap
    assert(math.abs(rows("r1") - 3.0) < 1e-3, rows)
    assert(math.abs(rows("r2") - 3.0) < 1e-3, rows)
    val cols = out.groupBy("prio").agg(fsum("weight").as("s"))
      .collect().map(r => r.getAs[String]("prio") -> r.getAs[Double]("s"))
      .toMap
    assert(math.abs(cols("c2") - 4.0) < 1e-3, cols)
  }

  test("ipfRaking: a cell with no row/col target raises in-plan instead " +
    "of silently vanishing its mass") {
    val cells = Seq(("r1", "c1", 1L), ("r9", "c1", 2L))
      .toDF("nat", "prio", "w0")
    val rowT = Seq(("r1", 3.0)).toDF("nat", "target") // r9 unmodelled
    val colT = Seq(("c1", 3.0)).toDF("prio", "target")
    def messages(t: Throwable): Seq[String] =
      Option(t).toSeq.flatMap(e =>
        Option(e.getMessage).toSeq ++ messages(e.getCause))
    val ex = intercept[Exception] {
      graft.engine.Reconcile.ipfRaking(cells, "nat", "prio", "w0",
        rowT, colT, rounds = 1).collect()
    }
    assert(messages(ex).exists(_.contains("no row target")),
      messages(ex).mkString(" | "))
    val colMiss = Seq(("c9", 1.0)).toDF("prio", "target")
    val ex2 = intercept[Exception] {
      graft.engine.Reconcile.ipfRaking(cells, "nat", "prio", "w0",
        Seq(("r1", 1.0), ("r9", 2.0)).toDF("nat", "target"), colMiss,
        rounds = 1).collect()
    }
    assert(messages(ex2).exists(_.contains("no col target")),
      messages(ex2).mkString(" | "))
  }

  test("ipfRaking: target keys with NO observed cells are tolerated — " +
    "mass cannot be created on an empty margin") {
    val cells = Seq(("r1", "c1", 2L)).toDF("nat", "prio", "w0")
    val rowT = Seq(("r1", 4.0), ("rGhost", 7.0)).toDF("nat", "target")
    val colT = Seq(("c1", 4.0)).toDF("prio", "target")
    val out = graft.engine.Reconcile.ipfRaking(cells, "nat", "prio",
      "w0", rowT, colT, rounds = 2).collect()
    assert(out.length === 1)
    assert(math.abs(out.head.getAs[Double]("weight") - 4.0) < 1e-9)
  }

  // ---- DP Laplace -----------------------------------------------------------

  test("dpLaplaceCounts: deterministic noise matches an independent " +
    "recompute of the inverse CDF") {
    val df = (1 to 100).map(i => Tuple1(s"key${i % 5}")).toDF("k")
    val out = Governance.dpLaplaceCounts(df, "k", epsilon = 0.5,
      seed = "spec").collect()
      .map(r => r.getAs[String]("k") -> r.getAs[Double]("noisy_count"))
      .toMap
    def expectedNoise(key: String): Double = {
      val md = java.security.MessageDigest.getInstance("MD5")
        .digest(s"spec|$key".getBytes("UTF-8"))
      val hex = md.map("%02x".format(_)).mkString.take(8)
      val u = (java.lang.Long.parseLong(hex, 16).toDouble + 0.5) /
        4294967296.0
      val c = u - 0.5
      val raw = -2.0 * (if (c < 0) -1.0 else 1.0) *
        math.log(1.0 - 2.0 * math.abs(c))
      BigDecimal(raw).setScale(6, BigDecimal.RoundingMode.HALF_UP)
        .toDouble
    }
    (0 until 5).foreach { i =>
      val key = s"key$i"
      val want = BigDecimal(20.0 + expectedNoise(key))
        .setScale(6, BigDecimal.RoundingMode.HALF_UP).toDouble
      assert(math.abs(out(key) - want) < 1e-9, s"$key")
    }
    // and the noise is actually non-trivial for at least one key
    assert((0 until 5).exists(i =>
      math.abs(out(s"key$i") - 20.0) > 1e-3))
  }
}
