package graft.queries

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

import graft.QuerySpec
import graft.engine.{RankStats, Tables}

/** Rank-based and robust statistics (the nonparametric companions of
  * q_anova / q_mannwhitney / q_corr_ols): Spearman, Kruskal–Wallis,
  * Brown–Forsythe, and the calendar-grid trend screens (Mann–Kendall,
  * Theil–Sen). Reference `transform.py:314-376` motivates the family;
  * everything here follows the RankStats scale discipline (value-domain
  * rank windows, DECIMAL moments, 8dp-grid cross-group reductions).
  */
object RankStatsQueries {

  private def t(s: SparkSession, dir: String, name: String): DataFrame =
    Tables.load(s, dir, name)

  /** Per-returnflag daily quantity series — the calendar spine that
    * bounds the trend screens' pairwise stage by ~2.4k days at ANY SF. */
  private[queries] def dailySeries(s: SparkSession, dir: String): DataFrame =
    t(s, dir, "lineitem")
      .groupBy(col("l_returnflag"),
        datediff(to_date(col("l_shipdate")), lit("1992-01-01").cast("date"))
          .cast("long").as("day"))
      .agg(sum(col("l_quantity").cast("decimal(18,2)")).as("v"))

  private[queries] val dailySql =
    """SELECT l_returnflag,
      |       CAST(datediff('day', DATE '1992-01-01',
      |                     CAST(l_shipdate AS DATE)) AS BIGINT) AS day,
      |       SUM(CAST(l_quantity AS DECIMAL(18,2))) AS v
      |FROM lineitem GROUP BY 1, 2""".stripMargin

  def specs: Seq[QuerySpec] = Seq(

    // Spearman rank correlation per group — Pearson over tie-averaged
    // ranks; monotone-not-linear association beside q_corr_ols's Pearson.
    QuerySpec("q_spearman", (s, dir) => {
      RankStats.spearman(t(s, dir, "lineitem"), "l_returnflag",
          "l_quantity", "l_extendedprice")
        .orderBy("l_returnflag")
    }, Some(
      """WITH base AS (
        |  SELECT l_returnflag AS g,
        |         CAST(l_quantity AS DECIMAL(18,2)) AS x,
        |         CAST(l_extendedprice AS DECIMAL(18,2)) AS y
        |  FROM lineitem
        |  WHERE l_quantity IS NOT NULL AND l_extendedprice IS NOT NULL),
        |rx AS (
        |  SELECT g, x,
        |         2 * COALESCE(SUM(c) OVER (PARTITION BY g ORDER BY x
        |             ROWS BETWEEN UNBOUNDED PRECEDING AND 1 PRECEDING), 0)
        |           + c + 1 AS rx2
        |  FROM (SELECT g, x, COUNT(*) AS c FROM base GROUP BY g, x)),
        |ry AS (
        |  SELECT g, y,
        |         2 * COALESCE(SUM(c) OVER (PARTITION BY g ORDER BY y
        |             ROWS BETWEEN UNBOUNDED PRECEDING AND 1 PRECEDING), 0)
        |           + c + 1 AS ry2
        |  FROM (SELECT g, y, COUNT(*) AS c FROM base GROUP BY g, y)),
        |r AS (SELECT base.g AS g, rx2, ry2
        |      FROM base JOIN rx USING (g, x) JOIN ry USING (g, y)),
        |m AS (
        |  SELECT g, COUNT(*) AS n,
        |         SUM(CAST(rx2 AS DECIMAL(19,0))) AS sx,
        |         SUM(CAST(ry2 AS DECIMAL(19,0))) AS sy,
        |         SUM(CAST(rx2 AS DECIMAL(19,0))
        |             * CAST(rx2 AS DECIMAL(19,0))) AS sxx,
        |         SUM(CAST(ry2 AS DECIMAL(19,0))
        |             * CAST(ry2 AS DECIMAL(19,0))) AS syy,
        |         SUM(CAST(rx2 AS DECIMAL(19,0))
        |             * CAST(ry2 AS DECIMAL(19,0))) AS sxy
        |  FROM r GROUP BY g),
        |d AS (
        |  SELECT g, n, CAST(n AS DOUBLE) AS nd,
        |         CAST(sx AS DOUBLE) AS sxd, CAST(sy AS DOUBLE) AS syd,
        |         CAST(sxx AS DOUBLE) AS sxxd, CAST(syy AS DOUBLE) AS syyd,
        |         CAST(sxy AS DOUBLE) AS sxyd
        |  FROM m)
        |SELECT g AS l_returnflag, n,
        |       CASE WHEN nd * sxxd - sxd * sxd > 0.0
        |             AND nd * syyd - syd * syd > 0.0
        |            THEN ROUND((nd * sxyd - sxd * syd)
        |                       / (SQRT(nd * sxxd - sxd * sxd)
        |                          * SQRT(nd * syyd - syd * syd)), 8)
        |       END AS rho
        |FROM d ORDER BY l_returnflag""".stripMargin)),

    // Kruskal–Wallis one-way rank ANOVA across returnflag populations,
    // tie-corrected — the k-group generalization of q_mannwhitney.
    QuerySpec("q_kruskal_wallis", (s, dir) => {
      RankStats.kruskalWallis(t(s, dir, "lineitem"), "l_returnflag",
        "l_quantity")
    }, Some(
      """WITH fv AS (
        |  SELECT l_returnflag AS f,
        |         CAST(l_quantity AS DECIMAL(18,2)) AS v,
        |         COUNT(*) AS cfv
        |  FROM lineitem WHERE l_quantity IS NOT NULL GROUP BY 1, 2),
        |pv AS (SELECT v, CAST(SUM(cfv) AS BIGINT) AS c FROM fv GROUP BY v),
        |ranks AS (
        |  SELECT v,
        |         2 * COALESCE(SUM(c) OVER (ORDER BY v
        |             ROWS BETWEEN UNBOUNDED PRECEDING AND 1 PRECEDING), 0)
        |           + c + 1 AS mr2,
        |         c
        |  FROM pv),
        |pf AS (
        |  SELECT f, CAST(SUM(cfv) AS BIGINT) AS ng,
        |         SUM(CAST(cfv AS DECIMAL(19,0))
        |             * CAST(mr2 AS DECIMAL(19,0))) AS r2g
        |  FROM fv JOIN ranks USING (v) GROUP BY f),
        |pfn AS (SELECT pf.*, CAST(SUM(ng) OVER () AS BIGINT) AS nn
        |        FROM pf),
        |gagg AS (
        |  SELECT COUNT(*) AS k, MAX(nn) AS n,
        |         SUM(CAST(ROUND(CAST(r2g AS DOUBLE) * CAST(r2g AS DOUBLE)
        |                        / (4.0 * CAST(ng AS DOUBLE))
        |                        / (CAST(nn AS DOUBLE)
        |                           * (CAST(nn AS DOUBLE) + 1.0)), 8)
        |                  AS DECIMAL(28,8))) AS rterm
        |  FROM pfn),
        |tagg AS (
        |  SELECT COALESCE(SUM(CASE WHEN c > 1
        |           THEN CAST(c AS DOUBLE) * CAST(c AS DOUBLE)
        |                * CAST(c AS DOUBLE) - CAST(c AS DOUBLE) END), 0.0)
        |           AS ties
        |  FROM ranks),
        |d AS (
        |  SELECT k, n, CAST(n AS DOUBLE) AS nd,
        |         CAST(rterm AS DOUBLE) AS rt, ties
        |  FROM gagg CROSS JOIN tagg)
        |SELECT k, n,
        |       CASE WHEN k > 1 AND n > k
        |            THEN ROUND(12.0 * rt - 3.0 * (nd + 1.0), 8) END AS h,
        |       CASE WHEN k > 1 AND n > k
        |             AND 1.0 - ties / (nd * nd * nd - nd) > 0.0
        |            THEN ROUND((12.0 * rt - 3.0 * (nd + 1.0))
        |                       / (1.0 - ties / (nd * nd * nd - nd)), 8)
        |       END AS h_corrected
        |FROM d""".stripMargin)),

    // Brown–Forsythe variance-homogeneity (median-centered Levene):
    // ANOVA F over |x − group median| on the exact integer milli grid.
    // The wide integer sums (Σ(2d)² ≈ 4e22 at sf1) never convert to
    // double directly — decimal→double is engine-dependent past ~16
    // significant digits and the old DECIMAL(28,8) term overflowed at
    // sf1 — they split into exact (hi, lo) parts around 10¹² first
    // (RankStats.hiLoDouble, mirrored verbatim here); every per-group
    // term is then scaled by 1/(N·10⁶) and 8dp-grid-rounded before the
    // cross-group DECIMAL sum (F is the same ratio: numerator and
    // denominator scale identically).
    QuerySpec("q_levene_bf", (s, dir) => {
      RankStats.brownForsythe(t(s, dir, "lineitem"), "l_returnflag",
        "l_extendedprice")
    }, Some {
      def hiLo(c: String): String =
        s"CAST(CAST(($c - $c % 1000000000000) / 1000000000000 AS BIGINT) AS DOUBLE) * 1.0e12" +
          s" + CAST(CAST($c % 1000000000000 AS BIGINT) AS DOUBLE)"
      s"""WITH base AS (
        |  SELECT l_returnflag AS g,
        |         CAST(CAST(l_extendedprice AS DECIMAL(18,2)) * 1000
        |              AS BIGINT) AS xm
        |  FROM lineitem WHERE l_extendedprice IS NOT NULL),
        |med AS (SELECT g, quantile_cont(xm, 0.5) AS med
        |        FROM base GROUP BY g),
        |dev AS (
        |  SELECT base.g AS g,
        |         CAST(ABS(CAST(xm AS DOUBLE) - med) * 2 AS BIGINT) AS e
        |  FROM base JOIN med USING (g)),
        |gm AS (
        |  SELECT g, COUNT(*) AS ng,
        |         SUM(CAST(e AS DECIMAL(38,0))) AS s1,
        |         SUM(CAST(e * e AS DECIMAL(38,0))) AS s2
        |  FROM dev GROUP BY g),
        |gn AS (SELECT g, ng, s1, s2, SUM(ng) OVER () AS nn FROM gm),
        |terms AS (
        |  SELECT ng, nn,
        |         (${hiLo("s1")}) / 2000.0 AS sgu,
        |         (${hiLo("s2")}) / 4.0e6 AS ssgu
        |  FROM gn),
        |m AS (
        |  SELECT COUNT(*) AS k, CAST(MAX(nn) AS BIGINT) AS n,
        |         SUM(CAST(ROUND(sgu, 8) AS DECIMAL(28,8))) AS s,
        |         SUM(CAST(ROUND(sgu * sgu / CAST(ng AS DOUBLE)
        |                        / CAST(nn AS DOUBLE), 8)
        |                  AS DECIMAL(28,8))) AS t,
        |         SUM(CAST(ROUND(ssgu / CAST(nn AS DOUBLE), 8)
        |                  AS DECIMAL(28,8))) AS w
        |  FROM terms),
        |d AS (
        |  SELECT k, n, CAST(k AS DOUBLE) AS kd, CAST(n AS DOUBLE) AS nd,
        |         CAST(s AS DOUBLE) AS sd, CAST(t AS DOUBLE) AS td,
        |         CAST(w AS DOUBLE) AS wd
        |  FROM m)
        |SELECT k, n,
        |       CASE WHEN k > 1 AND n > k AND wd - td > 0.0
        |            THEN ROUND((GREATEST(td - (sd / nd) * (sd / nd), 0.0)
        |                        / (kd - 1.0))
        |                       / ((wd - td) / (nd - kd)), 8)
        |       END AS f_stat
        |FROM d""".stripMargin
    }),

    // Mann–Kendall trend screen over the per-returnflag daily quantity
    // series — monotone-trend detection with tie-corrected variance and
    // continuity-corrected Z. The pairwise stage is calendar-bounded.
    QuerySpec("q_mann_kendall", (s, dir) => {
      RankStats.mannKendall(dailySeries(s, dir), "l_returnflag",
          "day", "v")
        .orderBy("l_returnflag")
    }, Some(
      s"""WITH daily AS ($dailySql),
        |d2 AS (SELECT * FROM daily WHERE v IS NOT NULL),
        |pairs AS (
        |  SELECT a.l_returnflag AS g,
        |         CAST(SIGN(CAST(b.v - a.v AS DOUBLE)) AS BIGINT) AS sg
        |  FROM d2 a JOIN d2 b
        |    ON a.l_returnflag = b.l_returnflag AND a.day < b.day),
        |sa AS (SELECT g, CAST(SUM(sg) AS BIGINT) AS s FROM pairs GROUP BY g),
        |tv AS (SELECT l_returnflag AS g, v, CAST(COUNT(*) AS DOUBLE) AS t
        |       FROM d2 GROUP BY 1, 2),
        |ta AS (
        |  SELECT g,
        |         COALESCE(SUM(CASE WHEN t > 1
        |           THEN t * (t - 1) * (2.0 * t + 5) END), 0.0) AS tie_term,
        |         CAST(SUM(t) AS BIGINT) AS n
        |  FROM tv GROUP BY g),
        |d AS (
        |  SELECT sa.g AS g, n, s, CAST(n AS DOUBLE) AS nd,
        |         CAST(s AS DOUBLE) AS sd, tie_term
        |  FROM sa JOIN ta USING (g))
        |SELECT g AS l_returnflag, n, s,
        |       CASE WHEN (nd * (nd - 1.0) * (2.0 * nd + 5.0) - tie_term)
        |                 / 18.0 > 0.0
        |            THEN ROUND(CASE WHEN s > 0 THEN (sd - 1.0)
        |                   / SQRT((nd * (nd - 1.0) * (2.0 * nd + 5.0)
        |                           - tie_term) / 18.0)
        |                 WHEN s < 0 THEN (sd + 1.0)
        |                   / SQRT((nd * (nd - 1.0) * (2.0 * nd + 5.0)
        |                           - tie_term) / 18.0)
        |                 ELSE 0.0 END, 8)
        |       END AS z
        |FROM d ORDER BY l_returnflag""".stripMargin)),

    // Theil–Sen robust slope over the same daily series — the median of
    // all pairwise slopes (breakdown point 29%) beside q_corr_ols's OLS.
    QuerySpec("q_theil_sen", (s, dir) => {
      RankStats.theilSen(dailySeries(s, dir), "l_returnflag", "day", "v")
        .orderBy("l_returnflag")
    }, Some(
      s"""WITH daily AS ($dailySql),
        |d2 AS (SELECT * FROM daily WHERE v IS NOT NULL),
        |slopes AS (
        |  SELECT a.l_returnflag AS g,
        |         CAST(b.v - a.v AS DOUBLE)
        |           / CAST(b.day - a.day AS DOUBLE) AS slope
        |  FROM d2 a JOIN d2 b
        |    ON a.l_returnflag = b.l_returnflag AND a.day < b.day)
        |SELECT g AS l_returnflag, COUNT(*) AS n_pairs,
        |       ROUND(quantile_cont(slope, 0.5), 8) AS sen_slope
        |FROM slopes GROUP BY g ORDER BY g""".stripMargin)),

    // Cohen's d / Hedges' g between open and finished lines per
    // returnflag — effect size beside q_mannwhitney's test.
    QuerySpec("q_cohens_d", (s, dir) => {
      graft.engine.EffectSize.cohensD(t(s, dir, "lineitem"),
          "l_returnflag", "l_extendedprice", "l_linestatus", "O", "F")
        .orderBy("l_returnflag")
    }, Some(
      """WITH base AS (
        |  SELECT l_returnflag AS lbl, l_linestatus = 'O' AS is_a,
        |         CAST(l_extendedprice AS DECIMAL(18,2)) AS x
        |  FROM lineitem
        |  WHERE l_extendedprice IS NOT NULL
        |    AND l_linestatus IN ('O', 'F')),
        |m AS (
        |  SELECT lbl,
        |         CAST(SUM(CASE WHEN is_a THEN 1 ELSE 0 END) AS BIGINT)
        |           AS n1,
        |         SUM(CASE WHEN is_a THEN x END) AS s1,
        |         SUM(CASE WHEN is_a THEN x * x END) AS ss1,
        |         CAST(SUM(CASE WHEN is_a THEN 0 ELSE 1 END) AS BIGINT)
        |           AS n2,
        |         SUM(CASE WHEN NOT is_a THEN x END) AS s2,
        |         SUM(CASE WHEN NOT is_a THEN x * x END) AS ss2
        |  FROM base GROUP BY lbl),
        |d AS (
        |  SELECT lbl, n1, n2,
        |         CAST(n1 AS DOUBLE) AS n1d, CAST(n2 AS DOUBLE) AS n2d,
        |         CAST(s1 AS DOUBLE) AS s1d, CAST(s2 AS DOUBLE) AS s2d,
        |         CAST(ss1 AS DOUBLE) AS ss1d, CAST(ss2 AS DOUBLE) AS ss2d
        |  FROM m),
        |f AS (
        |  SELECT lbl, n1, n2, n1d, n2d,
        |         s1d / n1d - s2d / n2d AS delta,
        |         ((n1d - 1.0) * ((n1d * ss1d - s1d * s1d)
        |                         / (n1d * (n1d - 1.0)))
        |          + (n2d - 1.0) * ((n2d * ss2d - s2d * s2d)
        |                           / (n2d * (n2d - 1.0))))
        |           / (n1d + n2d - 2.0) AS pooled
        |  FROM d)
        |SELECT lbl AS l_returnflag, n1, n2,
        |       CASE WHEN n1 > 1 AND n2 > 1 AND pooled > 0.0
        |            THEN ROUND(delta / SQRT(pooled), 8) END AS d,
        |       CASE WHEN n1 > 1 AND n2 > 1 AND pooled > 0.0
        |            THEN ROUND(delta / SQRT(pooled)
        |                       * (CAST(1.0 AS DOUBLE)
        |                          - CAST(3.0 AS DOUBLE)
        |                            / (CAST(4.0 AS DOUBLE)
        |                               * (n1d + n2d) - 9.0)), 8)
        |       END AS g
        |FROM f ORDER BY l_returnflag""".stripMargin)),

    // Wilson score interval for the "large event" rate per event type
    // — the binomial CI that behaves at extreme rates.
    QuerySpec("q_wilson_ci", (s, dir) => {
      graft.engine.EffectSize.wilsonCi(t(s, dir, "events"),
          "event_type", (col("value") > 50.0).cast("int"))
        .orderBy("event_type")
    }, Some(
      """WITH m AS (
        |  SELECT event_type AS g, COUNT(*) AS n,
        |         CAST(SUM(CASE WHEN value > 50.0 THEN 1 ELSE 0 END)
        |              AS BIGINT) AS k
        |  FROM events WHERE value IS NOT NULL GROUP BY g),
        |d AS (
        |  SELECT g, n, k, CAST(n AS DOUBLE) AS nd,
        |         CAST(k AS DOUBLE) / CAST(n AS DOUBLE) AS p,
        |         CAST(1.96 AS DOUBLE) * CAST(1.96 AS DOUBLE) AS z2,
        |         CAST(1.96 AS DOUBLE) AS z
        |  FROM m),
        |f AS (
        |  SELECT g, n, k, p,
        |         (p + z2 / (nd * 2.0)) / (1.0 + z2 / nd) AS center,
        |         z * SQRT(p * (CAST(1.0 AS DOUBLE) - p) / nd
        |                  + z2 / (CAST(4.0 AS DOUBLE) * nd * nd))
        |           / (CAST(1.0 AS DOUBLE) + z2 / nd) AS half
        |  FROM d)
        |SELECT g AS event_type, n, k AS successes,
        |       ROUND(p, 8) AS rate,
        |       CASE WHEN n > 0 THEN ROUND(center - half, 8) END AS ci_lo,
        |       CASE WHEN n > 0 THEN ROUND(center + half, 8) END AS ci_hi
        |FROM f ORDER BY event_type""".stripMargin)),

    // Tukey-style pairwise standardized differences after q_anova:
    // which returnflag pairs drive the F. Pair stage is k²-bounded.
    QuerySpec("q_tukey_diffs", (s, dir) => {
      graft.engine.EffectSize.tukeyPairs(t(s, dir, "lineitem"),
        "l_returnflag", "l_quantity")
    }, Some(
      """WITH g AS (
        |  SELECT l_returnflag AS g, COUNT(*) AS ng,
        |         SUM(CAST(l_quantity AS DECIMAL(18,2))) AS sg,
        |         SUM(CAST(l_quantity AS DECIMAL(18,2))
        |             * CAST(l_quantity AS DECIMAL(18,2))) AS ssg
        |  FROM lineitem WHERE l_quantity IS NOT NULL GROUP BY 1),
        |tot AS (
        |  SELECT COUNT(*) AS k, CAST(SUM(ng) AS BIGINT) AS n,
        |         SUM(ssg) AS ss,
        |         SUM(CAST(ROUND(CAST(sg AS DOUBLE) * CAST(sg AS DOUBLE)
        |                        / CAST(ng AS DOUBLE), 8)
        |                  AS DECIMAL(28,8))) AS t
        |  FROM g),
        |mw AS (
        |  SELECT (CAST(ss AS DOUBLE) - CAST(t AS DOUBLE))
        |           / (CAST(n AS DOUBLE) - CAST(k AS DOUBLE)) AS msw
        |  FROM tot),
        |p AS (
        |  SELECT a.g AS g1, b.g AS g2, a.ng AS n1, b.ng AS n2,
        |         CAST(a.sg AS DOUBLE) / CAST(a.ng AS DOUBLE)
        |           - CAST(b.sg AS DOUBLE) / CAST(b.ng AS DOUBLE) AS diff,
        |         msw
        |  FROM g a JOIN g b ON a.g < b.g CROSS JOIN mw)
        |SELECT g1, g2, n1, n2, ROUND(diff, 8) AS diff,
        |       CASE WHEN msw > 0.0
        |            THEN ROUND(ABS(diff)
        |                       / SQRT(msw / 2.0
        |                              * (CAST(1.0 AS DOUBLE)
        |                                 / CAST(n1 AS DOUBLE)
        |                                 + CAST(1.0 AS DOUBLE)
        |                                 / CAST(n2 AS DOUBLE))), 8)
        |       END AS q_stat
        |FROM p ORDER BY g1, g2""".stripMargin))
  )
}
