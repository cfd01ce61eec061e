package graft.engine

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/** Rank-based and robust statistics beyond the reference's paired tests
  * (reference `transform.py:314-376` motivates the family; these are the
  * standard nonparametric complements a production screen runs beside
  * them): Spearman rank correlation, Kruskal–Wallis one-way rank ANOVA,
  * Brown–Forsythe (median-centered Levene) variance-homogeneity test,
  * Mann–Kendall trend screen and the Theil–Sen slope estimator.
  *
  * Shared scale discipline (the `ksStat`/`mannWhitneyStat` convention):
  * ties pre-aggregate into ONE row per distinct value map-side before any
  * rank window, so the cumulative windows sort value-DOMAIN-sized tables,
  * never row-sized ones; mid-ranks are carried as the exact INTEGER
  * `2·midrank = 2·cum_prev + c + 1`; every moment accumulates in DECIMAL
  * (exact, associative, partition-order-independent); cross-group float
  * reductions round each term to the 8dp grid first (the `q_anova` rule);
  * only the final scalar formula runs in floating point, written as the
  * same expression tree the DuckDB oracle evaluates.
  */
object RankStats {

  /** Spearman rank correlation per group: Pearson over tie-averaged ranks.
    *
    * Ranks are built value-level — `groupBy(g, v).count` then ONE
    * cumulative window over the distinct-value table per variable — and
    * equi-joined back to the rows, so no window ever sorts the full data
    * by a low-cardinality group key. The doubled midranks are integers;
    * all five moments (n, Σrx, Σry, Σrx², Σry², Σrx·ry) are exact
    * DECIMAL sums of integer products (≤ 4n³ — DECIMAL(38,0) holds to
    * n ≈ 1e11 rows per group), so rho is bit-stable under any
    * partitioning. Output: group, n, rho (8dp, NULL when a variable is
    * constant). */
  def spearman(df: DataFrame, groupCol: String, xCol: String,
      yCol: String): DataFrame = {
    val base = df.na.drop(Seq(xCol, yCol))
      .select(col(groupCol).as("g"),
        col(xCol).cast("decimal(18,2)").as("x"),
        col(yCol).cast("decimal(18,2)").as("y"))

    def rank2(valCol: String, out: String): DataFrame = {
      val ties = base.groupBy(col("g"), col(valCol).as(valCol))
        .agg(count(lit(1)).as("c"))
      val wCum = Window.partitionBy(col("g")).orderBy(col(valCol))
        .rowsBetween(Window.unboundedPreceding, -1)
      ties.select(col("g"), col(valCol),
        (coalesce(sum(col("c")).over(wCum), lit(0L)) * 2 + col("c") + 1)
          .as(out))
    }

    val ranked = base
      .join(rank2("x", "rx2"), Seq("g", "x"))
      .join(rank2("y", "ry2"), Seq("g", "y"))
      .select(col("g"), col("rx2"), col("ry2"))

    // cast to DECIMAL BEFORE multiplying — a LongType rank product wraps
    // past rank ≈ 3e9 (the mannWhitneyStat rule)
    // WIDTH: the five decimal moments cast to double below; the widest
    // (sxx/syy/sxy ≈ 4n³ per group) stays within double's exact-integer
    // range 2^53 to n ≈ 1.3e5 rows per group, and past that the rho
    // FORMULA is a ratio of same-magnitude terms whose shared leading
    // digits cancel identically in both engines only while the decimal
    // converts to ≤ ~15 significant digits (n ≈ 3e4); groups larger than
    // that need the kruskal-style per-term scaled grid. Recorded per the
    // decimal→double width-contract convention (see kruskalWallis).
    val d19 = "decimal(19,0)"
    val m = ranked.groupBy(col("g")).agg(
      count(lit(1)).as("n"),
      sum(col("rx2").cast(d19)).as("sx"),
      sum(col("ry2").cast(d19)).as("sy"),
      sum(col("rx2").cast(d19) * col("rx2").cast(d19)).as("sxx"),
      sum(col("ry2").cast(d19) * col("ry2").cast(d19)).as("syy"),
      sum(col("rx2").cast(d19) * col("ry2").cast(d19)).as("sxy"))
    val (nd, sxd, syd) = (col("n").cast("double"),
      col("sx").cast("double"), col("sy").cast("double"))
    val vx = nd * col("sxx").cast("double") - sxd * sxd
    val vy = nd * col("syy").cast("double") - syd * syd
    val cov = nd * col("sxy").cast("double") - sxd * syd
    m.select(col("g").as(groupCol), col("n"),
      when(vx > 0.0 && vy > 0.0,
        round(cov / (sqrt(vx) * sqrt(vy)), 8)).as("rho"))
  }

  /** Kruskal–Wallis one-way ANOVA on ranks across the `factorCol`
    * populations (the k-group generalization of Mann–Whitney), with the
    * standard tie correction.
    *
    *   H = 12/(N(N+1)) · Σ_g R_g²/n_g − 3(N+1),   H_c = H / C,
    *   C = 1 − Σ_t (t³−t) / (N³−N)
    *
    * Counts aggregate per (factor, value) and per value — the global
    * midrank window runs over the DISTINCT-value table only (single
    * partition by design, bounded by the value domain, the `ksStat`
    * convention) and rank sums R_g come from `Σ c_gv · 2·midrank_v`
    * without ever touching row-level data again. Σ R_g²/n_g rounds each
    * group's term to the 8dp grid and sums in DECIMAL (engine-ordered
    * float reduction would not be portable). Output (one row): k, n,
    * h (uncorrected, 8dp), h_corrected (8dp, NULL when all values tie). */
  def kruskalWallis(df: DataFrame, factorCol: String,
      valueCol: String): DataFrame = {
    // fv feeds THREE consumers (ranks' per-value rollup, the per-factor
    // rank sums, and the tie term via ranks) and Catalyst does not reuse
    // the exchange across them — unmaterialized, the full input is
    // scanned and aggregated 3× (measured: the r8 plan audit showed
    // three parquet scans). fv is bounded by |factors × value domain|
    // (the ksStat convention — the value grid, never the row count), so
    // one eager localCheckpoint trades a domain-sized materialization
    // for two full input passes; blocks free on RDD GC (the
    // verifiedOverlap rationale — never a CacheManager pin).
    // EAGER checkpoint, measured against the alternatives (REPS=3
    // minima): eager 0.50 s sf0.1 / 0.72 s sf1; lazy
    // localCheckpoint(false) 0.66 / 0.88 (the first job still computes
    // every subtree before blocks exist); no checkpoint at all 0.41 /
    // 1.56 (three full input scans — the r5 shape). The ~0.1 s eager-job
    // latency at gate scale buys 2.2× at sf1 and grows with the input.
    val fv = df.where(col(valueCol).isNotNull)
      .groupBy(col(factorCol).as("f"),
        col(valueCol).cast("decimal(18,2)").as("v"))
      .agg(count(lit(1)).as("cfv"))
      .localCheckpoint()
    val perV = fv.groupBy(col("v")).agg(sum(col("cfv")).as("c"))
    val wCum = Window.orderBy(col("v"))
      .rowsBetween(Window.unboundedPreceding, -1)
    val ranks = perV.select(col("v"),
      (coalesce(sum(col("c")).over(wCum), lit(0L)) * 2 + col("c") + 1)
        .as("mr2"),
      col("c"))

    val perF = fv.join(ranks, "v")
      .groupBy(col("f"))
      .agg(sum(col("cfv")).as("ng"),
        // cast BEFORE multiplying (the spearman rule): cfv·mr2 in
        // LongType wraps once tie-count × 2N passes 2^63
        sum(col("cfv").cast("decimal(19,0)") *
          col("mr2").cast("decimal(19,0)")).as("r2g"))
    // R_g = r2g/2; term_g = R_g²/(n_g·N(N+1)) rounded to the grid,
    // summed exactly. N(N+1) divides INSIDE the per-group term (not in
    // the final h expression): Σ R_g²/n_g alone reaches ~5e19 at sf1 —
    // a DECIMAL(28,8) with ~28 significant digits, and decimal→double
    // conversion is engine-dependent past ~16 significant digits (the
    // round-1 lesson; a 1-ulp difference in the converted sum flipped
    // h's 8th decimal at sf1). Scaled down, the summed decimal stays
    // ≤ ~15 significant digits through sf10 and converts identically.
    // WIDTH: (the decimal→double width-contract convention: every
    // DECIMAL that crosses to double states how many significant digits
    // it can carry and where that breaks)
    // WIDTH BOUNDS, honestly stated: r2g ~ N²/k must stay exact in the
    // double cast, which holds to 2^53 ≈ 9e15 (N ≈ 1.6e8 rows at k=3 —
    // past ~sf25 this term needs a decimal-division rewrite; the
    // hurstRs/rddGap width-bounded-grid convention, recorded here so
    // the next scale decade knows where the cliff is). GRID CONTRACT:
    // each term is 8dp-rounded, so h deviates from the unquantized
    // statistic by ≤ 12k·5e-9 — the per-stratum-term convention the
    // inference tier already uses (cmh e_t/v_t, fisher terms); KW is a
    // small-k omnibus test, so k stays in the dozens, not millions.
    // N rides a single-partition window over perF — the k-row GROUP
    // domain, never row-scale (the indexEncode discipline); this keeps
    // ONE pass over perF and the empty-input one-row k=0 contract.
    val wAll = Window.rowsBetween(Window.unboundedPreceding,
      Window.unboundedFollowing)
    val withN = perF.withColumn("__n", sum(col("ng")).over(wAll))
    val nTot = col("__n").cast("double")
    val term = round(col("r2g").cast("double") * col("r2g").cast("double") /
      (lit(4.0) * col("ng").cast("double")) /
      (nTot * (nTot + 1.0)), 8).cast("decimal(28,8)")
    val gAgg = withN.agg(count(lit(1)).as("k"), max(col("__n")).as("n"),
      sum(term).as("rterm"))
    // tie term Σ(t³−t) — doubles BEFORE multiplying (LongType t³ wraps
    // past t ≈ 2e6 duplicates of one value)
    val cd = col("c").cast("double")
    val tAgg = ranks.agg(
      coalesce(sum(when(col("c") > 1, cd * cd * cd - cd)), lit(0.0))
        .as("ties"))

    val nd = col("n").cast("double")
    // rterm already carries the 1/(N(N+1)) factor (see above)
    val h = lit(12.0) * col("rterm").cast("double") -
      lit(3.0) * (nd + 1.0)
    val corr = lit(1.0) - col("ties") / (nd * nd * nd - nd)
    gAgg.crossJoin(tAgg).select(col("k"), col("n"),
      when(col("k") > 1 && col("n") > col("k"), round(h, 8)).as("h"),
      when(col("k") > 1 && col("n") > col("k") && corr > 0.0,
        round(h / corr, 8)).as("h_corrected"))
  }

  /** Brown–Forsythe variance-homogeneity test (Levene with MEDIAN
    * centers — robust to the heavy tails that break the mean-centered
    * original): a one-way ANOVA F over per-group absolute deviations
    * from the group median.
    *
    * Exactness: values move to the integer MILLI grid (×1000 — the
    * half-cent interpolated medians land on multiples of 5), and the
    * doubled deviations e = 2·|x − med| are exact LONGS (e ≤ ~1e9 for
    * any sane value range, e² ≤ 1e18 fits a long), summed in
    * DECIMAL(38,0) — exact integers at any scale. Two passes: exact
    * percentile medians (k rows, broadcast back), then the moment
    * formula with every per-group term scaled by 1/(N·10⁶) and rounded
    * to the 8dp grid before the cross-group DECIMAL sum (the
    * kruskalWallis convention; F is the same ratio because numerator
    * and denominator scale identically).
    *
    * WIDTH: Σe² reaches ~4e22 already at sf1 (6M rows × 1e8-milli
    * deviations) — far past BOTH the old DECIMAL(28,8) term cap (the
    * round-7 sf1 crash: 1.35e21 would not fit) and the ~16-significant-
    * digit decimal→double portability cliff. The wide integer sums
    * therefore never convert directly: [[hiLoDouble]] splits them into
    * (hi, lo) = ((x − x mod 10¹²)/10¹², x mod 10¹²) — both exact
    * integers ≤ 2^53, converted exactly, recombined with two IEEE ops
    * both engines evaluate identically. Exact until Σe² ≈ 10¹²·2^53 ≈
    * 9e27 (~sf1e6 at this data shape). Output (one row): k, n,
    * f_stat (8dp). */
  def brownForsythe(df: DataFrame, groupCol: String,
      valueCol: String): DataFrame = {
    val xm = (col(valueCol).cast("decimal(18,2)") * 1000)
      .cast("long").as("xm")
    val base = df.where(col(valueCol).isNotNull)
      .select(col(groupCol).as("g"), xm)
    val med = base.groupBy(col("g"))
      .agg(percentile(col("xm"), lit(0.5)).as("med"))
    // e = 2·|xm − med|: med is integer-or-half, so e is an exact integer
    val dev = base.join(broadcast(med), "g")
      .select(col("g"),
        (abs(col("xm").cast("double") - col("med")) * 2).cast("long")
          .as("e"))
    // WIDTH: the doc contract above — wide integer DECIMAL sums go
    // through hiLoDouble (exact to Σe² ≈ 9e27), per-group terms scale by
    // 1/(N·10⁶) and 8dp-round before the cross-group decimal sum, so no
    // decimal here ever converts past ~14 significant digits.
    val d38 = "decimal(38,0)"
    val g = dev.groupBy(col("g")).agg(
      count(lit(1)).as("ng"),
      sum(col("e").cast(d38)).as("s1"),
      sum((col("e") * col("e")).cast(d38)).as("s2"))
    // N rides a single-partition window over the k-row group table (the
    // kruskalWallis convention — one pass, empty-input contract intact)
    val wAll = Window.rowsBetween(Window.unboundedPreceding,
      Window.unboundedFollowing)
    val withN = g.withColumn("__n", sum(col("ng")).over(wAll))
    val nd = col("__n").cast("double")
    val ngd = col("ng").cast("double")
    val sgu = hiLoDouble(col("s1")) / 2000.0 // Σ|dev| in value UNITS
    val ssgu = hiLoDouble(col("s2")) / 4.0e6 // Σ dev² in UNIT²
    val tG = round(sgu * sgu / ngd / nd, 8).cast("decimal(28,8)")
    val wG = round(ssgu / nd, 8).cast("decimal(28,8)")
    val sG = round(sgu, 8).cast("decimal(28,8)")
    val m = withN.agg(count(lit(1)).as("k"), max(col("__n")).as("n"),
      sum(sG).as("s"), sum(tG).as("t"), sum(wG).as("w"))
    val (kd, nd2) = (col("k").cast("double"), col("n").cast("double"))
    val sbar = col("s").cast("double") / nd2
    // ssb >= 0 by Cauchy–Schwarz; the 8dp term grid can push the
    // difference a few 1e-9 NEGATIVE (identical-shape groups), which
    // would surface as a nonsense negative F — clamp at the identity
    val ssb = greatest(col("t").cast("double") - sbar * sbar, lit(0.0))
    val ssw = col("w").cast("double") - col("t").cast("double")
    m.select(col("k"), col("n"),
      when(col("k") > 1 && col("n") > col("k") && ssw > 0.0,
        round((ssb / (kd - 1.0)) / (ssw / (nd2 - kd)), 8)).as("f_stat"))
  }

  /** Engine-portable wide-DECIMAL(38,0)→double conversion: decimal→double
    * is engine-dependent past ~16 significant digits (the round-1
    * lesson), so split x into (hi, lo) around 10¹² — `x − x mod 10¹²`
    * is exactly divisible, making the quotient exact in ANY division
    * rounding mode — convert both (exact: each ≤ 2^53 for x ≤ 9e27),
    * and recombine with two correctly-rounded IEEE ops both engines
    * evaluate identically. */
  private def hiLoDouble(c: Column): Column = {
    // WIDTH: hi and lo are exact integers ≤ 2^53 for inputs up to
    // ~9e27; both casts are therefore exact and the recombination is
    // two correctly-rounded IEEE ops — engine-portable by construction.
    val m = lit(1000000000000L).cast("decimal(13,0)")
    val lo = c % m
    val hi = ((c - lo) / m).cast("long")
    hi.cast("double") * lit(1.0e12) + lo.cast("long").cast("double")
  }

  /** Mann–Kendall trend test per group over an ordered series
    * (`tCol` integer time index, `vCol` exact DECIMAL value):
    * S = Σ_{i<j} sign(v_j − v_i), tie-corrected variance, and the
    * continuity-corrected normal Z.
    *
    * The O(n²) pair generation is bounded by the TIME GRID, not the
    * row count — callers pre-aggregate to a calendar spine first (the
    * registered query sums per day: ~2.4k days regardless of SF, so
    * ~3M pairs per group at ANY scale; the quadratic cost is a
    * constant of the calendar). sign() on DECIMAL differences is
    * exact; the variance products cast double BEFORE multiplying
    * (n(n−1)(2n+5) wraps LongType past n ≈ 1e6).
    * Output: group, n, s, z (8dp, NULL when var = 0). */
  def mannKendall(series: DataFrame, groupCol: String, tCol: String,
      vCol: String): DataFrame = {
    // null observations drop ENTIRELY (listwise): counting them in n
    // and the tie term while their pairs vanish from S would make the
    // variance inconsistent with the statistic (the corrMatrix rule)
    // WIDTH: the DECIMAL value difference casts to double only through
    // signum (±1/0 — width-free); S itself is a long count. The
    // variance products run in double from the start (doc above), so no
    // decimal→double conversion carries more than the time-grid count
    // (~2.4k) — nothing here approaches the 15-significant-digit cliff.
    val clean = series.where(col(vCol).isNotNull)
    val a = clean.select(col(groupCol).as("g"), col(tCol).as("t1"),
      col(vCol).as("v1"))
    val b = clean.select(col(groupCol).as("g"), col(tCol).as("t2"),
      col(vCol).as("v2"))
    val pairs = a.join(b, Seq("g")).where(col("t1") < col("t2"))
    val sAgg = pairs.groupBy(col("g")).agg(
      sum(signum((col("v2") - col("v1")).cast("double")).cast("long"))
        .as("s"),
      count(lit(1)).as("n_pairs"))
    val cd = count(lit(1)).cast("double")
    val ties = clean.groupBy(col(groupCol).as("g"), col(vCol).as("v"))
      .agg(cd.as("t"))
      .groupBy(col("g"))
      .agg(coalesce(sum(when(col("t") > 1,
          col("t") * (col("t") - 1) * (lit(2.0) * col("t") + 5))),
        lit(0.0)).as("tie_term"),
        sum(col("t")).cast("long").as("n"))
    val nd = col("n").cast("double")
    val variance = (nd * (nd - 1.0) * (lit(2.0) * nd + 5.0) -
      col("tie_term")) / 18.0
    val sd = col("s").cast("double")
    sAgg.join(ties, "g").select(col("g").as(groupCol), col("n"), col("s"),
      when(variance > 0.0, round(
        when(col("s") > 0, (sd - 1.0) / sqrt(variance))
          .when(col("s") < 0, (sd + 1.0) / sqrt(variance))
          .otherwise(lit(0.0)), 8)).as("z"))
  }

  /** Theil–Sen slope per group: the median of all pairwise slopes
    * (v_j − v_i)/(t_j − t_i), i < j — the robust regression slope
    * (breakdown point 29%) beside `corrOls`'s least-squares one.
    *
    * Same calendar-bounded pair generation as [[mannKendall]] (callers
    * pre-aggregate to the time grid). Slopes are DECIMAL-difference /
    * integer-difference doubles — the identical IEEE division both
    * engines evaluate — and the median is the exact interpolated
    * percentile over that double multiset (the `quantile_cont`
    * contract). Output: group, n_pairs, sen_slope (8dp). */
  def theilSen(series: DataFrame, groupCol: String, tCol: String,
      vCol: String): DataFrame = {
    // listwise null exclusion: a null observation would silently count
    // in n_pairs while its slope vanishes from the median multiset
    // WIDTH: the DECIMAL difference v2−v1 casts to double per PAIR —
    // on the (18,2) grid it is exact in double to |Δv| ≈ 9e13 (2^53
    // cents), far above any value spread here; no aggregation ever
    // widens a decimal before the cast.
    val clean = series.where(col(vCol).isNotNull)
    val a = clean.select(col(groupCol).as("g"), col(tCol).as("t1"),
      col(vCol).as("v1"))
    val b = clean.select(col(groupCol).as("g"), col(tCol).as("t2"),
      col(vCol).as("v2"))
    val slopes = a.join(b, Seq("g")).where(col("t1") < col("t2"))
      .select(col("g"),
        ((col("v2") - col("v1")).cast("double") /
          (col("t2") - col("t1")).cast("double")).as("slope"))
    slopes.groupBy(col("g")).agg(
        count(lit(1)).as("n_pairs"),
        round(percentile(col("slope"), lit(0.5)), 8).as("sen_slope"))
      .select(col("g").as(groupCol), col("n_pairs"), col("sen_slope"))
  }
}
