package graft.queries

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

import graft.QuerySpec
import graft.engine.{Eval, Governance, Stats, Tables, TimeSeries}
import graft.llm.{Itemsets, Sampling}

/** Round-5 inference tier: multiple-testing control (BH-FDR over a
  * permutation-p family), small-count exact tests (Fisher 2×2, McNemar
  * paired), survival hazards (Nelson–Aalen), rank trend (Kendall τ-b),
  * design-based causal estimation (stratified IPW), retrieval scoring
  * (average precision, Cohen's κ), shrinkage (empirical-Bayes rates),
  * series symbolization (SAX), sequence mining (first-occurrence pairs),
  * and private release (Laplace-mechanism counts).
  *
  * House determinism rules throughout: exact DECIMAL until the final
  * scalar formula, 8dp grids around every libm call, md5-keyed
  * randomness, total ORDER BY on the output key. The Fisher test's
  * log-gamma is rendered ONCE ([[Stats.lgammaSql]]) and interpolated
  * into both the engine plan (via `expr`) and the DuckDB oracle, so the
  * two sides share literally one formula.
  */
object InferenceQueries {

  private def t(s: SparkSession, dir: String, name: String): DataFrame =
    Tables.load(s, dir, name)

  /** ln hypergeometric pmf shared by the q_fisher_exact engine plan and
    * oracle — the single-source render. */
  private val fisherLnp: String = Stats.hyperLnpSql(
    "CAST(r1 AS DOUBLE)", "CAST(c1 AS DOUBLE)",
    "CAST(n AS DOUBLE)", "CAST(k AS DOUBLE)")

  /** ln Binomial(n, ½) pmf at j — the q_binom_sign render (shared
    * Lanczos log-gamma; −0.693… = ln ½). */
  private val binomLnp: String =
    Stats.lnChooseSql("CAST(n AS DOUBLE)", "CAST(j AS DOUBLE)") +
      " + CAST(n AS DOUBLE) * (-0.6931471805599453e0)"

  /** One IPF half-round as oracle SQL: rescale `w` so the `key` margin
    * matches `tgt` — the same guarded-ratio tree as
    * [[graft.engine.Reconcile.ipfRaking]]'s scaleBy (single-sourced so
    * the 6 unrolled stages can't drift from the engine). */
  private def ipfStageSql(prev: String, key: String, tgt: String): String =
    s"""SELECT nat, prio, rt, ct,
       |  CASE WHEN CAST(SUM(CAST(w AS DECIMAL(38,8)))
       |              OVER (PARTITION BY $key) AS DOUBLE) > 0.0e0
       |       THEN ROUND(w * $tgt /
       |              CAST(SUM(CAST(w AS DECIMAL(38,8)))
       |                   OVER (PARTITION BY $key) AS DOUBLE), 8)
       |       ELSE 0.0e0 END AS w
       |FROM $prev""".stripMargin

  private val ipfOracle: String = {
    val stages = (1 to 3).flatMap { r =>
      Seq(s"r$r" -> ipfStageSql(if (r == 1) "b" else s"s${r - 1}",
        "nat", "rt"),
        s"s$r" -> ipfStageSql(s"r$r", "prio", "ct"))
    }.map { case (name, sql) => s"$name AS (\n$sql)" }.mkString(",\n")
    s"""WITH c0 AS (
       |  SELECT c_nationkey AS nat, o_orderpriority AS prio,
       |         COUNT(*) AS cnt
       |  FROM orders JOIN customer ON o_custkey = c_custkey
       |  GROUP BY 1, 2),
       |b AS (
       |  SELECT nat, prio, ROUND(CAST(cnt AS DOUBLE), 8) AS w,
       |         CAST(SUM(cnt) OVER () AS DOUBLE) / 25.0e0 AS rt,
       |         CAST(SUM(cnt) OVER () AS DOUBLE) / 5.0e0 AS ct
       |  FROM c0),
       |$stages
       |SELECT nat, prio, w AS weight FROM s3
       |ORDER BY nat, prio""".stripMargin
  }

  def specs: Seq[QuerySpec] = Seq(

    // Benjamini–Hochberg FDR over a 25-brand family of sign-flip
    // permutation p-values (B = 99, md5 flips, exact decimal replicate
    // sums): the multiple-testing closure over the per-group tests the
    // stats tier already runs one at a time.
    QuerySpec("q_fdr_bh", (s, dir) => {
      val li = t(s, dir, "lineitem")
      val pt = t(s, dir, "part")
      val diffs = li.join(pt, li("l_partkey") === pt("p_partkey"))
        .select(col("p_brand"),
          concat_ws("#", col("l_orderkey"), col("l_linenumber")).as("k"),
          ((col("l_tax") * 100.0).cast("decimal(18,2)") -
            (col("l_discount") * 100.0).cast("decimal(18,2)")).as("d"))
      val ps = Stats.groupedSignFlip(diffs, "p_brand", "k", "d",
        b = 99, seed = "fdr").drop("n", "t_obs")
      Stats.fdrBh(ps, "p_brand", "p_value", alpha = 0.10)
        .orderBy("rank")
    }, Some(
      """WITH d AS (
        |  SELECT p_brand AS g,
        |         CAST(l_orderkey AS VARCHAR) || '#' ||
        |           CAST(l_linenumber AS VARCHAR) AS k,
        |         CAST(l_tax * 100.0 AS DECIMAL(18,2)) -
        |           CAST(l_discount * 100.0 AS DECIMAL(18,2)) AS dd
        |  FROM lineitem JOIN part ON l_partkey = p_partkey),
        |obs AS (SELECT g, SUM(dd) AS tobs FROM d GROUP BY g),
        |r AS (
        |  SELECT g, bb.b AS b,
        |         SUM(CASE WHEN ((instr('0123456789abcdef',
        |                    substr(md5('fdr|' || k),
        |                           CAST(1 + bb.b // 4 AS INT), 1)) - 1)
        |                  >> CAST(3 - (bb.b % 4) AS INT)) & 1 = 1
        |             THEN -dd ELSE dd END) AS tb
        |  FROM d CROSS JOIN (SELECT unnest(range(0, 99)) AS b) bb
        |  GROUP BY g, bb.b),
        |ne AS (
        |  SELECT r.g,
        |         SUM(CASE WHEN ABS(tb) >= ABS(obs.tobs)
        |                  THEN 1 ELSE 0 END) AS ne
        |  FROM r JOIN obs ON r.g = obs.g GROUP BY r.g),
        |p AS (
        |  SELECT obs.g,
        |         ROUND((1.0 + COALESCE(ne.ne, 0)) / 100.0, 8) AS p
        |  FROM obs LEFT JOIN ne ON obs.g = ne.g),
        |bh AS (
        |  SELECT g, p, COUNT(*) OVER () AS m,
        |         ROW_NUMBER() OVER (ORDER BY p, g) AS rank
        |  FROM p WHERE p IS NOT NULL),
        |adj AS (
        |  SELECT g, rank, p,
        |         ROUND(LEAST(1.0, MIN(p * CAST(m AS DOUBLE)
        |                 / CAST(rank AS DOUBLE))
        |               OVER (ORDER BY p, g ROWS BETWEEN CURRENT ROW
        |                     AND UNBOUNDED FOLLOWING)), 8) AS p_adj
        |  FROM bh)
        |SELECT g AS p_brand, rank, ROUND(p, 8) AS p_value, p_adj,
        |       p_adj <= 0.1e0 AS reject
        |FROM adj ORDER BY rank""".stripMargin)),

    // Fisher's exact 2×2 (urgent-priority × finished-status over one
    // nation's orders — counts small enough that the χ² screen is the
    // wrong tool): hypergeometric terms from the shared Lanczos
    // log-gamma render, 8dp DECIMAL term grid, two-sided sum.
    QuerySpec("q_fisher_exact", (s, dir) => {
      val base = t(s, dir, "orders")
        .join(t(s, dir, "customer"),
          col("o_custkey") === col("c_custkey"))
        .where(col("c_nationkey") === 0)
      Stats.fisherExact(base,
        col("o_orderpriority") === "1-URGENT",
        col("o_orderstatus") === "F")
    }, Some(
      s"""WITH base AS (
         |  SELECT o_orderpriority = '1-URGENT' AS tr,
         |         o_orderstatus = 'F' AS oc
         |  FROM orders JOIN customer ON o_custkey = c_custkey
         |  WHERE c_nationkey = 0),
         |x AS (
         |  SELECT CAST(SUM(CASE WHEN tr AND oc THEN 1 ELSE 0 END)
         |              AS BIGINT) AS a,
         |         CAST(SUM(CASE WHEN tr AND NOT oc THEN 1 ELSE 0 END)
         |              AS BIGINT) AS b,
         |         CAST(SUM(CASE WHEN NOT tr AND oc THEN 1 ELSE 0 END)
         |              AS BIGINT) AS c,
         |         CAST(SUM(CASE WHEN NOT tr AND NOT oc THEN 1 ELSE 0 END)
         |              AS BIGINT) AS d
         |  FROM base),
         |e AS (SELECT a, b, c, d, a + b AS r1, a + c AS c1,
         |             a + b + c + d AS n FROM x),
         |ks AS (
         |  SELECT e.*, unnest(generate_series(GREATEST(0, r1 + c1 - n),
         |                                     LEAST(r1, c1))) AS k
         |  FROM e),
         |tm AS (
         |  SELECT a, b, c, d, k,
         |         CAST(ROUND(EXP($fisherLnp), 8) AS DECIMAL(20,8)) AS term
         |  FROM ks),
         |ob AS (SELECT term AS tobs FROM tm WHERE k = a)
         |SELECT tm.a, tm.b, tm.c, tm.d,
         |       CAST(SUM(CASE WHEN term <= tobs THEN 1 ELSE 0 END)
         |            AS BIGINT) AS n_terms,
         |       CASE WHEN SUM(CASE WHEN term <= tobs THEN term END)
         |              IS NOT NULL THEN
         |         LEAST(1.0e0,
         |               ROUND(CAST(SUM(CASE WHEN term <= tobs THEN term
         |                              END) AS DOUBLE), 8))
         |       END AS p_two
         |FROM tm CROSS JOIN ob
         |GROUP BY tm.a, tm.b, tm.c, tm.d""".stripMargin)),

    // McNemar's paired test: do a price rule and a priority rule
    // disagree asymmetrically about predicting finished orders?
    // Discordant cells only, continuity-corrected χ², exact integers
    // until the one final division.
    QuerySpec("q_mcnemar", (s, dir) => {
      val truth = col("o_orderstatus") === "F"
      Stats.mcnemar(t(s, dir, "orders"),
        (col("o_totalprice") > 150000.0) === truth,
        col("o_orderpriority").isin("1-URGENT", "2-HIGH") === truth)
    }, Some(
      """WITH b AS (
        |  SELECT (o_totalprice > 150000.0e0) = (o_orderstatus = 'F')
        |           AS a_ok,
        |         (o_orderpriority IN ('1-URGENT', '2-HIGH'))
        |           = (o_orderstatus = 'F') AS b_ok
        |  FROM orders),
        |g AS (
        |  SELECT COUNT(*) AS n,
        |         CAST(SUM(CASE WHEN a_ok AND NOT b_ok THEN 1 ELSE 0 END)
        |              AS BIGINT) AS b_discordant,
        |         CAST(SUM(CASE WHEN NOT a_ok AND b_ok THEN 1 ELSE 0 END)
        |              AS BIGINT) AS c_discordant
        |  FROM b)
        |SELECT n, b_discordant, c_discordant,
        |       CASE WHEN b_discordant + c_discordant > 0 THEN
        |         ROUND((ABS(b_discordant - c_discordant) - 1.0e0) *
        |               (ABS(b_discordant - c_discordant) - 1.0e0) /
        |               CAST(b_discordant + c_discordant AS DOUBLE), 8)
        |       END AS chi2
        |FROM g""".stripMargin)),

    // Nelson–Aalen cumulative hazard over the same user-lifetime spans
    // as q_kaplan_meier: 8dp hazard increments cumulated in DECIMAL
    // over the bounded duration grid.
    QuerySpec("q_nelson_aalen", (s, dir) => {
      val spans = Tables.events(s, dir)
        .groupBy("user_id")
        .agg(min(unix_micros(col("ts"))).as("mn"),
          max(unix_micros(col("ts"))).as("mx"))
      val cut = spans.agg((max(col("mx")) - lit(604800000000L)).as("cut"))
      val sp = spans.crossJoin(cut)
        .select(expr("(mx - mn) div 86400000000").as("dur"),
          (col("mx") <= col("cut")).as("ev"))
      Stats.nelsonAalen(sp, "dur", "ev").orderBy("duration")
    }, Some(
      """WITH s AS (
        |  SELECT user_id, MIN(epoch_us(ts)) AS mn, MAX(epoch_us(ts)) AS mx
        |  FROM events GROUP BY user_id),
        |c AS (SELECT MAX(mx) - 604800000000 AS cut FROM s),
        |sp AS (
        |  SELECT (mx - mn) // 86400000000 AS duration,
        |         mx <= c.cut AS ev
        |  FROM s CROSS JOIN c),
        |pd AS (
        |  SELECT duration,
        |         CAST(SUM(CASE WHEN ev THEN 1 ELSE 0 END) AS BIGINT)
        |           AS deaths,
        |         CAST(SUM(CASE WHEN ev THEN 0 ELSE 1 END) AS BIGINT)
        |           AS censored
        |  FROM sp GROUP BY duration),
        |wr AS (
        |  SELECT duration, deaths, censored,
        |         SUM(deaths + censored)
        |           OVER (ORDER BY duration ROWS UNBOUNDED PRECEDING)
        |           AS ended,
        |         SUM(deaths + censored) OVER () AS tot
        |  FROM pd),
        |ar AS (
        |  SELECT duration, deaths, censored,
        |         CAST(tot - ended + deaths + censored AS BIGINT) AS at_risk
        |  FROM wr),
        |hz AS (
        |  SELECT duration, at_risk, deaths, censored,
        |         CAST(CASE WHEN deaths = 0 THEN CAST(0.0 AS DOUBLE)
        |                   ELSE ROUND(CAST(deaths AS DOUBLE)
        |                              / CAST(at_risk AS DOUBLE), 8)
        |              END AS DECIMAL(20,8)) AS h
        |  FROM ar)
        |SELECT duration, at_risk, deaths, censored,
        |       CAST(SUM(h) OVER (ORDER BY duration
        |                         ROWS UNBOUNDED PRECEDING) AS DOUBLE)
        |         AS cum_hazard
        |FROM hz ORDER BY duration""".stripMargin)),

    // Kendall τ-b per returnflag over the monthly quantity series:
    // exact concordant/discordant/tie integers from a group-keyed
    // self-join over the bounded month grid, one sqrt at the end.
    QuerySpec("q_kendall_tau", (s, dir) => {
      val ser = t(s, dir, "lineitem")
        .where(col("l_shipdate").isNotNull)
        .groupBy(col("l_returnflag"),
          (year(col("l_shipdate")) * 12 + month(col("l_shipdate")))
            .as("m"))
        .agg(sum(col("l_quantity").cast("decimal(18,2)")).as("v"))
      Stats.kendallTauB(ser, "l_returnflag", "m", "v")
        .orderBy("l_returnflag")
    }, Some(
      """WITH s AS (
        |  SELECT l_returnflag AS g,
        |         year(l_shipdate) * 12 + month(l_shipdate) AS m,
        |         SUM(CAST(l_quantity AS DECIMAL(18,2))) AS v
        |  FROM lineitem WHERE l_shipdate IS NOT NULL
        |  GROUP BY 1, 2),
        |p AS (
        |  SELECT a.g,
        |         CASE WHEN a.v < b.v THEN 1 ELSE 0 END AS conc,
        |         CASE WHEN a.v > b.v THEN 1 ELSE 0 END AS disc,
        |         CASE WHEN a.v = b.v THEN 1 ELSE 0 END AS tie
        |  FROM s a JOIN s b ON a.g = b.g AND a.m < b.m)
        |SELECT g AS l_returnflag, COUNT(*) AS n_pairs,
        |       CAST(SUM(conc) AS BIGINT) AS concordant,
        |       CAST(SUM(disc) AS BIGINT) AS discordant,
        |       CASE WHEN SQRT(CAST(COUNT(*) AS DOUBLE) *
        |              (CAST(COUNT(*) AS DOUBLE) -
        |               CAST(SUM(tie) AS DOUBLE))) > 0.0 THEN
        |         ROUND(CAST(SUM(conc) - SUM(disc) AS DOUBLE) /
        |               SQRT(CAST(COUNT(*) AS DOUBLE) *
        |                    (CAST(COUNT(*) AS DOUBLE) -
        |                     CAST(SUM(tie) AS DOUBLE))), 8)
        |       END AS tau_b
        |FROM p GROUP BY g ORDER BY g""".stripMargin)),

    // Stratified IPW ATE: treatment assigned by md5 with a KNOWN
    // nation-stratum propensity (0.25 / 0.5 / 0.75) — the
    // design-based causal estimator beside q_did and q_nn_match.
    // Per-stratum Horvitz–Thompson terms on the 8dp grid, Hájek
    // normalization once at the end.
    QuerySpec("q_ipw_ate", (s, dir) => {
      val base = t(s, dir, "orders")
        .join(t(s, dir, "customer"),
          col("o_custkey") === col("c_custkey"))
        .select((col("c_nationkey") % 3).as("str"),
          col("o_orderkey"), col("o_totalprice"))
        .withColumn("p", when(col("str") === 0, 0.25)
          .when(col("str") === 1, 0.5).otherwise(0.75))
        .withColumn("thr", when(col("str") === 0, "40000000")
          .when(col("str") === 1, "80000000").otherwise("c0000000"))
        .withColumn("treat",
          Sampling.uniformHex("ipw", col("o_orderkey")) < col("thr"))
      Eval.ipwAte(base, "str", col("treat"), "o_totalprice", "p")
    }, Some(
      """WITH b AS (
        |  SELECT c_nationkey % 3 AS str, o_totalprice,
        |         CASE c_nationkey % 3 WHEN 0 THEN 0.25e0
        |              WHEN 1 THEN 0.5e0 ELSE 0.75e0 END AS p,
        |         substr(md5('ipw|' || CAST(o_orderkey AS VARCHAR)), 1, 8)
        |           < (CASE c_nationkey % 3 WHEN 0 THEN '40000000'
        |              WHEN 1 THEN '80000000' ELSE 'c0000000' END) AS treat
        |  FROM orders JOIN customer ON o_custkey = c_custkey),
        |ps AS (
        |  SELECT str, p,
        |         SUM(CASE WHEN treat
        |                  THEN CAST(o_totalprice AS DECIMAL(18,2)) END)
        |           AS syt,
        |         CAST(SUM(CASE WHEN treat THEN 1 ELSE 0 END) AS BIGINT)
        |           AS nt,
        |         SUM(CASE WHEN NOT treat
        |                  THEN CAST(o_totalprice AS DECIMAL(18,2)) END)
        |           AS syc,
        |         CAST(SUM(CASE WHEN NOT treat THEN 1 ELSE 0 END)
        |              AS BIGINT) AS nc
        |  FROM b GROUP BY str, p),
        |tot AS (
        |  SELECT CAST(SUM(nt) AS BIGINT) AS n_treat,
        |         CAST(SUM(nc) AS BIGINT) AS n_ctrl,
        |         SUM(CAST(ROUND(COALESCE(CAST(syt AS DOUBLE), 0.0) / p, 8)
        |                  AS DECIMAL(38,8))) AS wy_t,
        |         SUM(CAST(ROUND(CAST(nt AS DOUBLE) / p, 8)
        |                  AS DECIMAL(38,8))) AS w_t,
        |         SUM(CAST(ROUND(COALESCE(CAST(syc AS DOUBLE), 0.0)
        |                        / (1.0 - p), 8) AS DECIMAL(38,8)))
        |           AS wy_c,
        |         SUM(CAST(ROUND(CAST(nc AS DOUBLE) / (1.0 - p), 8)
        |                  AS DECIMAL(38,8))) AS w_c
        |  FROM ps)
        |SELECT n_treat, n_ctrl,
        |       ROUND(CASE WHEN CAST(w_t AS DOUBLE) > 0.0 THEN
        |         CAST(wy_t AS DOUBLE) / CAST(w_t AS DOUBLE) END, 8)
        |         AS mu_treat,
        |       ROUND(CASE WHEN CAST(w_c AS DOUBLE) > 0.0 THEN
        |         CAST(wy_c AS DOUBLE) / CAST(w_c AS DOUBLE) END, 8)
        |         AS mu_ctrl,
        |       ROUND((CASE WHEN CAST(w_t AS DOUBLE) > 0.0 THEN
        |                CAST(wy_t AS DOUBLE) / CAST(w_t AS DOUBLE) END) -
        |             (CASE WHEN CAST(w_c AS DOUBLE) > 0.0 THEN
        |                CAST(wy_c AS DOUBLE) / CAST(w_c AS DOUBLE) END),
        |             8) AS ate
        |FROM tot""".stripMargin)),

    // Average precision / PR-AUC with block tie handling over a coarse
    // price score predicting finished orders — the imbalance-robust
    // companion of q_auc. Distinct-score grid window, 10dp term grid.
    QuerySpec("q_pr_auc", (s, dir) => {
      val scored = t(s, dir, "orders")
        .select(round(col("o_totalprice") / 1000.0, 0).as("score"),
          col("o_orderstatus"))
      Eval.averagePrecision(scored, "score",
        col("o_orderstatus") === "F")
    }, Some(
      """WITH b AS (
        |  SELECT CAST(ROUND(o_totalprice / 1000.0e0, 0)
        |              AS DECIMAL(18,2)) AS s,
        |         CASE WHEN o_orderstatus = 'F' THEN 1 ELSE 0 END AS y
        |  FROM orders),
        |bl AS (
        |  SELECT s, COUNT(*) AS nb, CAST(SUM(y) AS BIGINT) AS pb
        |  FROM b GROUP BY s),
        |w AS (
        |  SELECT nb, pb,
        |         SUM(nb) OVER (ORDER BY s DESC
        |                       ROWS UNBOUNDED PRECEDING) AS cn,
        |         SUM(pb) OVER (ORDER BY s DESC
        |                       ROWS UNBOUNDED PRECEDING) AS cp
        |  FROM bl)
        |SELECT CAST(SUM(nb) AS BIGINT) AS n,
        |       CAST(SUM(pb) AS BIGINT) AS n_pos,
        |       CASE WHEN SUM(pb) > 0 THEN
        |         ROUND(CAST(SUM(CAST(ROUND(CAST(pb AS DOUBLE) *
        |                 CAST(cp AS DOUBLE) / CAST(cn AS DOUBLE), 10)
        |               AS DECIMAL(38,10))) AS DOUBLE)
        |               / CAST(SUM(pb) AS DOUBLE), 8)
        |       END AS avg_precision
        |FROM w""".stripMargin)),

    // Cohen's κ between the price rater and the priority rater on the
    // 3-class status domain — chance-corrected agreement, exact-integer
    // inputs to one final double formula.
    QuerySpec("q_cohens_kappa", (s, dir) => {
      val rA = when(col("o_totalprice") > 300000.0, "F")
        .when(col("o_totalprice") > 150000.0, "O").otherwise("P")
      val rB = when(col("o_orderpriority").isin("1-URGENT", "2-HIGH"), "F")
        .when(col("o_orderpriority") === "3-MEDIUM", "O").otherwise("P")
      Eval.cohensKappa(t(s, dir, "orders"), rA, rB)
    }, Some(
      """WITH b AS (
        |  SELECT CASE WHEN o_totalprice > 300000.0e0 THEN 'F'
        |              WHEN o_totalprice > 150000.0e0 THEN 'O'
        |              ELSE 'P' END AS a,
        |         CASE WHEN o_orderpriority IN ('1-URGENT', '2-HIGH')
        |              THEN 'F'
        |              WHEN o_orderpriority = '3-MEDIUM' THEN 'O'
        |              ELSE 'P' END AS bb
        |  FROM orders),
        |tot AS (
        |  SELECT COUNT(*) AS n,
        |         CAST(SUM(CASE WHEN a = bb THEN 1 ELSE 0 END) AS BIGINT)
        |           AS agree
        |  FROM b),
        |ma AS (SELECT a AS cls, COUNT(*) AS na FROM b GROUP BY a),
        |mb AS (SELECT bb AS cls, COUNT(*) AS nb FROM b GROUP BY bb),
        |ee AS (
        |  SELECT CAST(SUM(na * nb) AS BIGINT) AS ee
        |  FROM ma JOIN mb USING (cls))
        |SELECT n,
        |       ROUND(CAST(agree AS DOUBLE) / CAST(n AS DOUBLE), 8) AS po,
        |       ROUND(CAST(ee AS DOUBLE) /
        |             (CAST(n AS DOUBLE) * CAST(n AS DOUBLE)), 8) AS pe,
        |       CASE WHEN CAST(ee AS DOUBLE) /
        |                 (CAST(n AS DOUBLE) * CAST(n AS DOUBLE)) < 1.0
        |            THEN ROUND((CAST(agree AS DOUBLE) / CAST(n AS DOUBLE)
        |                   - CAST(ee AS DOUBLE) /
        |                     (CAST(n AS DOUBLE) * CAST(n AS DOUBLE))) /
        |                  (1.0 - CAST(ee AS DOUBLE) /
        |                     (CAST(n AS DOUBLE) * CAST(n AS DOUBLE))), 8)
        |       END AS kappa
        |FROM tot CROSS JOIN ee""".stripMargin)),

    // Empirical-Bayes shrinkage of per-supplier return rates: beta
    // prior fit by method of moments across suppliers, posterior mean
    // per supplier — low-volume suppliers shrink toward the global
    // rate, the league-table smoothing classic.
    QuerySpec("q_eb_smooth", (s, dir) => {
      val per = t(s, dir, "lineitem")
        .groupBy(col("l_suppkey"))
        .agg(sum(when(col("l_returnflag") === "R", 1L).otherwise(0L))
          .as("k"), count(lit(1)).as("n"))
      Eval.ebSmooth(per, "l_suppkey", "k", "n").orderBy("l_suppkey")
    }, Some(
      """WITH per AS (
        |  SELECT l_suppkey,
        |         CAST(SUM(CASE WHEN l_returnflag = 'R' THEN 1 ELSE 0 END)
        |              AS BIGINT) AS k,
        |         COUNT(*) AS n
        |  FROM lineitem GROUP BY l_suppkey),
        |b AS (
        |  SELECT l_suppkey, k, n,
        |         ROUND(CAST(k AS DOUBLE) / CAST(n AS DOUBLE), 8) AS r
        |  FROM per WHERE n > 0),
        |mo AS (
        |  SELECT COUNT(*) AS m,
        |         SUM(CAST(r AS DECIMAL(38,8))) AS sr,
        |         SUM(CAST(ROUND(r * r, 16) AS DECIMAL(38,16))) AS srr
        |  FROM b),
        |pr AS (
        |  SELECT CAST(sr AS DOUBLE) / CAST(m AS DOUBLE) AS mu,
        |         CASE WHEN m > 1
        |               AND (CAST(srr AS DOUBLE) - CAST(sr AS DOUBLE) *
        |                    CAST(sr AS DOUBLE) / CAST(m AS DOUBLE)) /
        |                   (CAST(m AS DOUBLE) - 1.0) > 0.0
        |               AND (CAST(srr AS DOUBLE) - CAST(sr AS DOUBLE) *
        |                    CAST(sr AS DOUBLE) / CAST(m AS DOUBLE)) /
        |                   (CAST(m AS DOUBLE) - 1.0)
        |                   < (CAST(sr AS DOUBLE) / CAST(m AS DOUBLE)) *
        |                     (1.0 - CAST(sr AS DOUBLE) / CAST(m AS DOUBLE))
        |              THEN (CAST(sr AS DOUBLE) / CAST(m AS DOUBLE)) *
        |                   (1.0 - CAST(sr AS DOUBLE) / CAST(m AS DOUBLE)) /
        |                   ((CAST(srr AS DOUBLE) - CAST(sr AS DOUBLE) *
        |                     CAST(sr AS DOUBLE) / CAST(m AS DOUBLE)) /
        |                    (CAST(m AS DOUBLE) - 1.0)) - 1.0
        |         END AS s
        |  FROM mo)
        |SELECT l_suppkey, n, k, r AS rate,
        |       ROUND((CAST(k AS DOUBLE) + mu * s) /
        |             (CAST(n AS DOUBLE) + s), 8) AS posterior
        |FROM b CROSS JOIN pr ORDER BY l_suppkey""".stripMargin)),

    // SAX symbolization of the daily-quantity series: 7-day PAA chunks,
    // z-normalized chunk means, 4-symbol standard-normal breakpoints.
    QuerySpec("q_sax_symbols", (s, dir) => {
      val daily = t(s, dir, "lineitem")
        .where(col("l_shipdate").isNotNull)
        .groupBy(datediff(to_date(col("l_shipdate")),
          lit("1992-01-01").cast("date")).as("day"))
        .agg(sum(col("l_quantity").cast("decimal(18,2)")).as("qty"))
      TimeSeries.saxSymbols(daily, "day", "qty", 7).orderBy("chunk")
    }, Some(
      """WITH d AS (
        |  SELECT CAST(date_diff('day', DATE '1992-01-01',
        |                        CAST(l_shipdate AS DATE)) AS BIGINT) AS day,
        |         SUM(CAST(l_quantity AS DECIMAL(18,2))) AS qty
        |  FROM lineitem WHERE l_shipdate IS NOT NULL GROUP BY 1),
        |ch AS (
        |  SELECT CAST(FLOOR(CAST(day AS DOUBLE) / 7.0e0) AS BIGINT)
        |           AS chunk,
        |         COUNT(*) AS n_days,
        |         SUM(CAST(qty AS DECIMAL(18,2))) AS sv
        |  FROM d GROUP BY 1),
        |pa AS (
        |  SELECT chunk, n_days,
        |         ROUND(CAST(sv AS DOUBLE) / CAST(n_days AS DOUBLE), 8)
        |           AS paa
        |  FROM ch),
        |mo AS (
        |  SELECT COUNT(*) AS m,
        |         SUM(CAST(paa AS DECIMAL(38,8))) AS sp,
        |         SUM(CAST(ROUND(paa * paa, 16) AS DECIMAL(38,16))) AS spp
        |  FROM pa),
        |pr AS (
        |  SELECT CAST(sp AS DOUBLE) / CAST(m AS DOUBLE) AS mu,
        |         CASE WHEN m > 1
        |               AND (CAST(spp AS DOUBLE) - CAST(sp AS DOUBLE) *
        |                    CAST(sp AS DOUBLE) / CAST(m AS DOUBLE)) /
        |                   (CAST(m AS DOUBLE) - 1.0) > 0.0
        |              THEN SQRT((CAST(spp AS DOUBLE) - CAST(sp AS DOUBLE) *
        |                    CAST(sp AS DOUBLE) / CAST(m AS DOUBLE)) /
        |                   (CAST(m AS DOUBLE) - 1.0))
        |         END AS sd
        |  FROM mo)
        |SELECT chunk, n_days, paa,
        |       CASE WHEN sd IS NOT NULL THEN
        |         CASE WHEN (paa - mu) / sd < -0.6745e0 THEN 'a'
        |              WHEN (paa - mu) / sd < 0.0e0 THEN 'b'
        |              WHEN (paa - mu) / sd < 0.6745e0 THEN 'c'
        |              ELSE 'd' END
        |       END AS symbol
        |FROM pa CROSS JOIN pr ORDER BY chunk""".stripMargin)),

    // Frequent sequential pairs over (user, day) sessions: which event
    // type's FIRST occurrence precedes which — the length-2 GSP tier
    // behind funnel discovery. Equal-timestamp pairs dropped (order
    // unobservable), support-filtered.
    QuerySpec("q_seq_pairs", (s, dir) => {
      val ev = Tables.events(s, dir)
        .select(col("user_id"),
          expr("unix_micros(ts) div 86400000000").as("day"),
          col("event_type"), col("ts"))
      Itemsets.sequentialPairs(ev, Seq("user_id", "day"),
          "event_type", "ts", minSupport = 10L)
        .orderBy("item_a", "item_b")
    }, Some(
      """WITH f AS (
        |  SELECT user_id, epoch_us(ts) // 86400000000 AS day,
        |         event_type, MIN(ts) AS t
        |  FROM events WHERE event_type IS NOT NULL AND ts IS NOT NULL
        |  GROUP BY 1, 2, 3)
        |SELECT a.event_type AS item_a, b.event_type AS item_b,
        |       COUNT(*) AS n_sessions
        |FROM f a JOIN f b
        |  ON a.user_id = b.user_id AND a.day = b.day AND a.t < b.t
        |GROUP BY 1, 2 HAVING COUNT(*) >= 10
        |ORDER BY item_a, item_b""".stripMargin)),

    // Laplace-mechanism private counts per nation (ε = 0.5,
    // sensitivity 1): md5-derived uniforms inverse-CDF'd to Laplace
    // noise on the 6dp grid — the release-side member of the privacy
    // tier beside the k-anonymity / l-diversity / t-closeness audits.
    QuerySpec("q_dp_laplace", (s, dir) => {
      val c = t(s, dir, "customer")
        .join(t(s, dir, "nation"),
          col("c_nationkey") === col("n_nationkey"))
      Governance.dpLaplaceCounts(c, "n_name", epsilon = 0.5, seed = "dp")
        .orderBy("n_name")
    }, Some(
      """WITH cnt AS (
        |  SELECT n_name, COUNT(*) AS c
        |  FROM customer JOIN nation ON c_nationkey = n_nationkey
        |  GROUP BY n_name),
        |u AS (
        |  SELECT n_name, c,
        |         ((instr('0123456789abcdef', substr(md5('dp|' || n_name), 1, 1)) - 1) * 268435456.0e0 +
        |          (instr('0123456789abcdef', substr(md5('dp|' || n_name), 2, 1)) - 1) * 16777216.0e0 +
        |          (instr('0123456789abcdef', substr(md5('dp|' || n_name), 3, 1)) - 1) * 1048576.0e0 +
        |          (instr('0123456789abcdef', substr(md5('dp|' || n_name), 4, 1)) - 1) * 65536.0e0 +
        |          (instr('0123456789abcdef', substr(md5('dp|' || n_name), 5, 1)) - 1) * 4096.0e0 +
        |          (instr('0123456789abcdef', substr(md5('dp|' || n_name), 6, 1)) - 1) * 256.0e0 +
        |          (instr('0123456789abcdef', substr(md5('dp|' || n_name), 7, 1)) - 1) * 16.0e0 +
        |          (instr('0123456789abcdef', substr(md5('dp|' || n_name), 8, 1)) - 1) * 1.0e0
        |          + 0.5e0) / 4294967296.0e0 AS uu
        |  FROM cnt)
        |SELECT n_name,
        |       ROUND(CAST(c AS DOUBLE) +
        |             ROUND(-2.0e0 *
        |                   (CASE WHEN (uu - 0.5e0) < 0.0e0
        |                         THEN -1.0e0 ELSE 1.0e0 END) *
        |                   LN(1.0e0 - 2.0e0 * ABS(uu - 0.5e0)), 6),
        |             6) AS noisy_count
        |FROM u ORDER BY n_name""".stripMargin)),

    // Cochran–Mantel–Haenszel stratified 2×2 test + MH pooled odds
    // ratio across the 25 nation strata — "is urgency associated with
    // finished status after controlling for nation", the stratified
    // complement of q_fisher_exact's single-stratum test.
    QuerySpec("q_cmh", (s, dir) => {
      val base = t(s, dir, "orders")
        .join(t(s, dir, "customer"),
          col("o_custkey") === col("c_custkey"))
      Stats.cmh(base, "c_nationkey",
        col("o_orderpriority") === "1-URGENT",
        col("o_orderstatus") === "F")
    }, Some(
      """WITH b AS (
        |  SELECT c_nationkey AS s, o_orderpriority = '1-URGENT' AS tr,
        |         o_orderstatus = 'F' AS oc
        |  FROM orders JOIN customer ON o_custkey = c_custkey),
        |x AS (
        |  SELECT s,
        |         CAST(SUM(CASE WHEN tr AND oc THEN 1 ELSE 0 END)
        |              AS BIGINT) AS a,
        |         CAST(SUM(CASE WHEN tr AND NOT oc THEN 1 ELSE 0 END)
        |              AS BIGINT) AS b,
        |         CAST(SUM(CASE WHEN NOT tr AND oc THEN 1 ELSE 0 END)
        |              AS BIGINT) AS c,
        |         CAST(SUM(CASE WHEN NOT tr AND NOT oc THEN 1 ELSE 0 END)
        |              AS BIGINT) AS d
        |  FROM b GROUP BY s),
        |t AS (
        |  SELECT a,
        |         ROUND(CAST(a + b AS DOUBLE) * CAST(a + c AS DOUBLE)
        |               / CAST(a + b + c + d AS DOUBLE), 8) AS e_t,
        |         ROUND(CAST(a + b AS DOUBLE) * CAST(c + d AS DOUBLE)
        |               * CAST(a + c AS DOUBLE) * CAST(b + d AS DOUBLE)
        |               / (CAST(a + b + c + d AS DOUBLE)
        |                  * CAST(a + b + c + d AS DOUBLE)
        |                  * CAST(a + b + c + d - 1 AS DOUBLE)), 8) AS v_t,
        |         ROUND(CAST(a AS DOUBLE) * CAST(d AS DOUBLE)
        |               / CAST(a + b + c + d AS DOUBLE), 8) AS or_n,
        |         ROUND(CAST(b AS DOUBLE) * CAST(c AS DOUBLE)
        |               / CAST(a + b + c + d AS DOUBLE), 8) AS or_d
        |  FROM x WHERE a + b + c + d > 1),
        |g AS (
        |  SELECT COUNT(*) AS n_strata, CAST(SUM(a) AS BIGINT) AS o_a,
        |         CAST(SUM(CAST(e_t AS DECIMAL(38,8))) AS DOUBLE) AS e_a,
        |         CAST(SUM(CAST(v_t AS DECIMAL(38,8))) AS DOUBLE)
        |           AS variance,
        |         CAST(SUM(CAST(or_n AS DECIMAL(38,8))) AS DOUBLE) AS orn,
        |         CAST(SUM(CAST(or_d AS DECIMAL(38,8))) AS DOUBLE) AS ord_
        |  FROM t)
        |SELECT n_strata, o_a, e_a, variance,
        |       CASE WHEN variance > 0.0 THEN
        |         ROUND((CAST(o_a AS DOUBLE) - e_a)
        |               * (CAST(o_a AS DOUBLE) - e_a) / variance, 8)
        |       END AS chi2,
        |       CASE WHEN ord_ > 0.0 THEN ROUND(orn / ord_, 8) END AS or_mh
        |FROM g""".stripMargin)),

    // Exact two-sided binomial sign test on per-customer first→last
    // order-value changes — the signs-only member beside q_perm_test
    // (magnitudes) and q_wilcoxon (ranks); Lanczos pmf grid, 8dp terms.
    QuerySpec("q_binom_sign", (s, dir) => {
      val key = struct(col("o_orderdate"), col("o_orderkey"))
      val diffs = t(s, dir, "orders")
        .groupBy(col("o_custkey"))
        .agg(min_by(col("o_totalprice"), key).as("__f"),
          max_by(col("o_totalprice"), key).as("__l"),
          count(lit(1)).as("__c"))
        .where(col("__c") >= 2)
        .select((col("__l").cast("decimal(18,2)") -
          col("__f").cast("decimal(18,2)")).as("d"))
      Stats.binomSignTest(diffs, "d")
    }, Some(
      s"""WITH o AS (
         |  SELECT o_custkey,
         |         FIRST_VALUE(o_totalprice) OVER w AS f,
         |         LAST_VALUE(o_totalprice) OVER w AS l,
         |         COUNT(*) OVER w AS c
         |  FROM orders
         |  WINDOW w AS (PARTITION BY o_custkey
         |               ORDER BY o_orderdate, o_orderkey
         |               ROWS BETWEEN UNBOUNDED PRECEDING
         |               AND UNBOUNDED FOLLOWING)),
         |fl AS (
         |  SELECT DISTINCT o_custkey,
         |         CAST(l AS DECIMAL(18,2)) - CAST(f AS DECIMAL(18,2)) AS d
         |  FROM o WHERE c >= 2),
         |cells AS (
         |  SELECT COUNT(*) AS n,
         |         CAST(SUM(CASE WHEN d > 0 THEN 1 ELSE 0 END) AS BIGINT)
         |           AS k
         |  FROM fl WHERE d <> 0),
         |js AS (
         |  SELECT n, k, unnest(generate_series(0, n)) AS j FROM cells),
         |tm AS (
         |  SELECT n, k, j,
         |         CAST(ROUND(EXP($binomLnp), 8) AS DECIMAL(20,8)) AS term
         |  FROM js),
         |ob AS (SELECT term AS tobs FROM tm WHERE j = k)
         |SELECT n AS n_nonzero, k AS k_pos,
         |       CASE WHEN SUM(CASE WHEN term <= tobs THEN term END)
         |              IS NOT NULL THEN
         |         LEAST(1.0e0, ROUND(CAST(SUM(CASE WHEN term <= tobs
         |                                          THEN term END)
         |                                  AS DOUBLE), 8))
         |       END AS p_two
         |FROM tm CROSS JOIN ob GROUP BY n, k""".stripMargin)),

    // Restricted mean survival time (τ = 30 days) over the same
    // user-lifetime spans as q_kaplan_meier / q_nelson_aalen: the area
    // under the KM step curve, 8dp segment areas summed in DECIMAL.
    QuerySpec("q_rmst", (s, dir) => {
      val spans = Tables.events(s, dir)
        .groupBy("user_id")
        .agg(min(unix_micros(col("ts"))).as("mn"),
          max(unix_micros(col("ts"))).as("mx"))
      val cut = spans.agg((max(col("mx")) - lit(604800000000L)).as("cut"))
      val sp = spans.crossJoin(cut)
        .select(expr("(mx - mn) div 86400000000").as("dur"),
          (col("mx") <= col("cut")).as("ev"))
      Stats.rmst(sp, "dur", "ev", tau = 30L)
    }, Some(
      """WITH s AS (
        |  SELECT user_id, MIN(epoch_us(ts)) AS mn, MAX(epoch_us(ts)) AS mx
        |  FROM events GROUP BY user_id),
        |c AS (SELECT MAX(mx) - 604800000000 AS cut FROM s),
        |sp AS (
        |  SELECT (mx - mn) // 86400000000 AS duration,
        |         mx <= c.cut AS ev
        |  FROM s CROSS JOIN c),
        |pd AS (
        |  SELECT duration,
        |         CAST(SUM(CASE WHEN ev THEN 1 ELSE 0 END) AS BIGINT)
        |           AS deaths,
        |         CAST(SUM(CASE WHEN ev THEN 0 ELSE 1 END) AS BIGINT)
        |           AS censored
        |  FROM sp GROUP BY duration),
        |wr AS (
        |  SELECT duration, deaths, censored,
        |         SUM(deaths + censored)
        |           OVER (ORDER BY duration ROWS UNBOUNDED PRECEDING)
        |           AS ended,
        |         SUM(deaths + censored) OVER () AS tot
        |  FROM pd),
        |ar AS (
        |  SELECT duration, deaths, censored,
        |         CAST(tot - ended + deaths + censored AS BIGINT) AS at_risk
        |  FROM wr),
        |lf AS (
        |  SELECT duration, at_risk, deaths,
        |         CAST(CASE WHEN deaths = 0 OR deaths = at_risk
        |                   THEN CAST(0.0 AS DOUBLE)
        |                   ELSE ROUND(ln(1.0 - CAST(deaths AS DOUBLE)
        |                                       / CAST(at_risk AS DOUBLE)),
        |                              8)
        |              END AS DECIMAL(20,8)) AS lnf,
        |         CASE WHEN deaths = at_risk THEN 1 ELSE 0 END AS z
        |  FROM ar),
        |fin AS (
        |  SELECT duration,
        |         CASE WHEN SUM(z) OVER (ORDER BY duration
        |                                ROWS UNBOUNDED PRECEDING) > 0
        |              THEN CAST(0.0 AS DOUBLE)
        |              ELSE ROUND(exp(CAST(SUM(lnf)
        |                     OVER (ORDER BY duration
        |                           ROWS UNBOUNDED PRECEDING) AS DOUBLE)),
        |                   8) END AS survival
        |  FROM lf),
        |seg AS (
        |  SELECT duration, survival,
        |         COALESCE(LEAD(duration) OVER (ORDER BY duration), 30)
        |           AS nxt
        |  FROM fin),
        |ar2 AS (
        |  SELECT CAST(ROUND(survival *
        |           CAST(LEAST(nxt, 30) - LEAST(duration, 30) AS DOUBLE),
        |           8) AS DECIMAL(38,8)) AS area
        |  FROM seg),
        |h AS (SELECT LEAST(MIN(duration), 30) AS h0,
        |             COUNT(*) AS n_times FROM fin)
        |SELECT CAST(30 AS BIGINT) AS tau, n_times,
        |       ROUND(CAST(h0 AS DOUBLE) +
        |             CAST((SELECT SUM(area) FROM ar2) AS DOUBLE), 8)
        |         AS rmst
        |FROM h""".stripMargin)),

    // Page–Hinkley drift screen per event type over the daily-total
    // series — the running-mean changepoint companion of q_cusum.
    QuerySpec("q_page_hinkley", (s, dir) => {
      val daily = Tables.events(s, dir)
        .where(col("value").isNotNull)
        .groupBy(col("event_type"),
          expr("unix_micros(ts) div 86400000000").as("day"))
        .agg(sum(col("value").cast("decimal(18,2)")).as("x"))
      TimeSeries.pageHinkley(daily, "event_type", "day", "x",
        delta = 0.0).orderBy("event_type")
    }, Some(
      """WITH d AS (
        |  SELECT event_type AS g, epoch_us(ts) // 86400000000 AS i,
        |         SUM(CAST(value AS DECIMAL(18,2))) AS x
        |  FROM events WHERE value IS NOT NULL GROUP BY 1, 2),
        |w AS (
        |  SELECT g, i,
        |         CAST(ROUND(CAST(x AS DOUBLE)
        |                - CAST(SUM(x) OVER win AS DOUBLE)
        |                  / CAST(COUNT(*) OVER win AS DOUBLE)
        |                - 0.0e0, 8) AS DECIMAL(38,8)) AS term
        |  FROM d
        |  WINDOW win AS (PARTITION BY g ORDER BY i
        |                 ROWS UNBOUNDED PRECEDING)),
        |m AS (
        |  SELECT g, i, SUM(term) OVER win AS mv
        |  FROM w
        |  WINDOW win AS (PARTITION BY g ORDER BY i
        |                 ROWS UNBOUNDED PRECEDING)),
        |gt AS (
        |  SELECT g, i, mv - MIN(mv) OVER win AS gtv
        |  FROM m
        |  WINDOW win AS (PARTITION BY g ORDER BY i
        |                 ROWS UNBOUNDED PRECEDING)),
        |mx AS (SELECT g, MAX(gtv) AS mg FROM gt GROUP BY g)
        |SELECT gt.g AS event_type, CAST(mx.mg AS DOUBLE) AS ph_stat,
        |       MIN(gt.i) AS peak_at
        |FROM gt JOIN mx ON gt.g = mx.g AND gt.gtv = mx.mg
        |GROUP BY gt.g, mx.mg ORDER BY event_type""".stripMargin)),

    // CUPED variance reduction: per-user pre-period spend adjusts the
    // post-period metric before the arm comparison — the A/B
    // sensitivity standard, θ and x̄ from one exact-moment pass.
    QuerySpec("q_cuped", (s, dir) => {
      val ev = Tables.events(s, dir)
      val cut = ev.agg((max(unix_micros(col("ts"))) -
        lit(1209600000000L)).as("cut"))
      val per = ev.crossJoin(cut)
        .where(col("value").isNotNull)
        .withColumn("post", unix_micros(col("ts")) >= col("cut"))
        .groupBy("user_id")
        .agg(sum(when(!col("post"), col("value").cast("decimal(18,2)")))
          .as("x"),
          sum(when(col("post"), col("value").cast("decimal(18,2)")))
            .as("y"))
        .where(col("x").isNotNull && col("y").isNotNull)
      val arms = Sampling.assignSplit(per, "user_id",
        Seq("a" -> 0.5, "b" -> 0.5), seed = "cuped", outCol = "arm")
      Eval.cuped(arms, "arm", "x", "y").orderBy("arm")
    }, Some(
      """WITH c AS (SELECT MAX(epoch_us(ts)) - 1209600000000 AS cut
        |           FROM events),
        |per AS (
        |  SELECT user_id,
        |         SUM(CASE WHEN epoch_us(ts) < c.cut
        |                  THEN CAST(value AS DECIMAL(18,2)) END) AS x,
        |         SUM(CASE WHEN epoch_us(ts) >= c.cut
        |                  THEN CAST(value AS DECIMAL(18,2)) END) AS y
        |  FROM events CROSS JOIN c
        |  WHERE value IS NOT NULL
        |  GROUP BY user_id),
        |b AS (
        |  SELECT CASE WHEN substr(md5('cuped|' ||
        |                     CAST(user_id AS VARCHAR)), 1, 8)
        |                   < '80000000'
        |              THEN 'a' ELSE 'b' END AS arm,
        |         CAST(x AS DECIMAL(18,2)) AS x,
        |         CAST(y AS DECIMAL(18,2)) AS y
        |  FROM per WHERE x IS NOT NULL AND y IS NOT NULL),
        |mo AS (
        |  SELECT COUNT(*) AS n, SUM(x) AS sx, SUM(y) AS sy,
        |         SUM(CAST(x * x AS DECIMAL(38,4))) AS sxx,
        |         SUM(CAST(x * y AS DECIMAL(38,4))) AS sxy
        |  FROM b),
        |pr AS (
        |  SELECT CASE WHEN CAST(sxx AS DOUBLE)
        |                   - CAST(sx AS DOUBLE) * CAST(sx AS DOUBLE)
        |                     / CAST(n AS DOUBLE) > 0.0
        |              THEN (CAST(sxy AS DOUBLE)
        |                    - CAST(sx AS DOUBLE) * CAST(sy AS DOUBLE)
        |                      / CAST(n AS DOUBLE))
        |                   / (CAST(sxx AS DOUBLE)
        |                      - CAST(sx AS DOUBLE) * CAST(sx AS DOUBLE)
        |                        / CAST(n AS DOUBLE))
        |         END AS theta,
        |         CAST(sx AS DOUBLE) / CAST(n AS DOUBLE) AS xbar
        |  FROM mo)
        |SELECT arm, COUNT(*) AS n,
        |       ROUND(CAST(SUM(y) AS DOUBLE) / CAST(COUNT(*) AS DOUBLE), 8)
        |         AS mean_raw,
        |       ROUND(CAST(SUM(CAST(ROUND(CAST(y AS DOUBLE)
        |                - theta * (CAST(x AS DOUBLE) - xbar), 8)
        |              AS DECIMAL(38,8))) AS DOUBLE)
        |             / CAST(COUNT(*) AS DOUBLE), 8) AS mean_adj
        |FROM b CROSS JOIN pr
        |GROUP BY arm ORDER BY arm""".stripMargin)),

    // Sample-ratio-mismatch pre-flight on a 50/30/20 md5 assignment:
    // χ² GOF of observed arm counts against the designed ratios.
    QuerySpec("q_srm", (s, dir) => {
      val sp = Sampling.assignSplit(t(s, dir, "orders"), "o_orderkey",
        Seq("a" -> 0.5, "b" -> 0.3, "c" -> 0.2), seed = "srm",
        outCol = "arm")
      Eval.srmCheck(sp, "arm",
        Seq("a" -> 0.5, "b" -> 0.3, "c" -> 0.2))
    }, Some(
      """WITH sp AS (
        |  SELECT CASE WHEN substr(md5('srm|' ||
        |                     CAST(o_orderkey AS VARCHAR)), 1, 8)
        |                   < '80000000' THEN 'a'
        |              WHEN substr(md5('srm|' ||
        |                     CAST(o_orderkey AS VARCHAR)), 1, 8)
        |                   < 'cccccccd' THEN 'b'
        |              ELSE 'c' END AS arm
        |  FROM orders),
        |o AS (SELECT arm, COUNT(*) AS ob FROM sp GROUP BY arm),
        |e AS (
        |  SELECT o.arm, ob, r, SUM(ob) OVER () AS n
        |  FROM o JOIN (VALUES ('a', 0.5e0), ('b', 0.3e0), ('c', 0.2e0))
        |         t(arm, r) ON o.arm = t.arm)
        |SELECT CAST(SUM(ob) AS BIGINT) AS n, COUNT(*) AS n_arms,
        |       ROUND(CAST(SUM(CAST(ROUND(
        |           (CAST(ob AS DOUBLE) - r * CAST(n AS DOUBLE))
        |         * (CAST(ob AS DOUBLE) - r * CAST(n AS DOUBLE))
        |         / (r * CAST(n AS DOUBLE)), 8) AS DECIMAL(38,8)))
        |         AS DOUBLE), 8) AS chi2
        |FROM e""".stripMargin)),

    // Randomized response (Warner 1965) — the LOCAL-DP member beside
    // q_dp_laplace: md5-coin honest/lie reports per customer, debiased
    // per-nation prevalence of positive balances.
    QuerySpec("q_rand_response", (s, dir) => {
      val base = t(s, dir, "customer")
        .join(t(s, dir, "nation"),
          col("c_nationkey") === col("n_nationkey"))
      Governance.randomizedResponse(base, "n_name", "c_custkey",
          col("c_acctbal") > 0.0, q = 0.75, seed = "rr")
        .orderBy("n_name")
    }, Some(
      """WITH b AS (
        |  SELECT n_name,
        |         CASE WHEN substr(md5('rr|' || CAST(c_custkey AS VARCHAR)),
        |                          1, 8) < 'c0000000'
        |              THEN c_acctbal > 0.0e0
        |              ELSE NOT (c_acctbal > 0.0e0) END AS rep
        |  FROM customer JOIN nation ON c_nationkey = n_nationkey)
        |SELECT n_name, COUNT(*) AS n,
        |       ROUND(CAST(SUM(CASE WHEN rep THEN 1 ELSE 0 END) AS DOUBLE)
        |             / CAST(COUNT(*) AS DOUBLE), 8) AS p_reported,
        |       ROUND((CAST(SUM(CASE WHEN rep THEN 1 ELSE 0 END) AS DOUBLE)
        |              / CAST(COUNT(*) AS DOUBLE) + 0.75e0 - 1.0e0)
        |             / 0.5e0, 8) AS pi_hat
        |FROM b GROUP BY n_name ORDER BY n_name""".stripMargin)),

    // Sharp regression discontinuity at a 250k order-value cutoff with
    // a CONSTRUCTED +50 jump (the estimator must recover it exactly on
    // noise-free linear sides) — the threshold member closing the
    // causal tier (q_did, q_ipw_ate, q_nn_match, q_rdd_gap).
    QuerySpec("q_rdd_gap", (s, dir) => {
      // NO explicit ROUND on y: Spark's exact-decimal ROUND and
      // DuckDB's float ROUND disagree on o/1000 = x.xx5 ties (caught by
      // the sf1 sweep); the correctly-rounded double→DECIMAL cast
      // inside rddGap grids it portably (exact .xx5 doubles cannot
      // occur: 1000a+5 ≢ 0 mod 125)
      val base = t(s, dir, "orders").select(
        col("o_totalprice").as("x"),
        (col("o_totalprice") / 1000.0 +
          when(col("o_totalprice") >= 250000.0, 50.0).otherwise(0.0))
          .as("y"))
      Eval.rddGap(base, "x", "y", cutoff = 250000.0,
        bandwidth = 100000.0)
    }, Some(
      """WITH b0 AS (
        |  SELECT CAST(o_totalprice AS DECIMAL(12,2))
        |           - CAST(250000.0e0 AS DECIMAL(12,2)) AS x,
        |         CAST(o_totalprice / 1000.0e0 +
        |              CASE WHEN o_totalprice >= 250000.0e0
        |                   THEN 50.0e0 ELSE 0.0e0 END
        |              AS DECIMAL(12,2)) AS y
        |  FROM orders
        |  WHERE o_totalprice IS NOT NULL),
        |b AS (SELECT x, y, x >= 0 AS r FROM b0
        |      WHERE x >= -100000.0e0 AND x < 100000.0e0),
        |mo AS (
        |  SELECT
        |    CAST(SUM(CASE WHEN NOT r THEN 1 ELSE 0 END) AS BIGINT) AS n_l,
        |    SUM(CASE WHEN NOT r THEN x END) AS sx_l,
        |    SUM(CASE WHEN NOT r THEN y END) AS sy_l,
        |    SUM(CASE WHEN NOT r THEN CAST(x * x AS DECIMAL(38,4)) END)
        |      AS sxx_l,
        |    SUM(CASE WHEN NOT r THEN CAST(x * y AS DECIMAL(38,4)) END)
        |      AS sxy_l,
        |    MIN(CASE WHEN NOT r THEN x END) AS xmin_l,
        |    MAX(CASE WHEN NOT r THEN x END) AS xmax_l,
        |    CAST(SUM(CASE WHEN r THEN 1 ELSE 0 END) AS BIGINT) AS n_r,
        |    SUM(CASE WHEN r THEN x END) AS sx_r,
        |    SUM(CASE WHEN r THEN y END) AS sy_r,
        |    SUM(CASE WHEN r THEN CAST(x * x AS DECIMAL(38,4)) END)
        |      AS sxx_r,
        |    SUM(CASE WHEN r THEN CAST(x * y AS DECIMAL(38,4)) END)
        |      AS sxy_r,
        |    MIN(CASE WHEN r THEN x END) AS xmin_r,
        |    MAX(CASE WHEN r THEN x END) AS xmax_r
        |  FROM b),
        |a AS (
        |  SELECT n_l AS n_left, n_r AS n_right,
        |    CASE WHEN n_l > 1 AND xmin_l <> xmax_l AND CAST(sxx_l AS DOUBLE)
        |           - CAST(sx_l AS DOUBLE) * CAST(sx_l AS DOUBLE)
        |             / CAST(n_l AS DOUBLE) > 0.0
        |         THEN CAST(sy_l AS DOUBLE) / CAST(n_l AS DOUBLE)
        |              - ((CAST(sxy_l AS DOUBLE) - CAST(sx_l AS DOUBLE)
        |                    * CAST(sy_l AS DOUBLE) / CAST(n_l AS DOUBLE))
        |                 / (CAST(sxx_l AS DOUBLE) - CAST(sx_l AS DOUBLE)
        |                    * CAST(sx_l AS DOUBLE) / CAST(n_l AS DOUBLE)))
        |                * (CAST(sx_l AS DOUBLE) / CAST(n_l AS DOUBLE))
        |    END AS al,
        |    CASE WHEN n_r > 1 AND xmin_r <> xmax_r AND CAST(sxx_r AS DOUBLE)
        |           - CAST(sx_r AS DOUBLE) * CAST(sx_r AS DOUBLE)
        |             / CAST(n_r AS DOUBLE) > 0.0
        |         THEN CAST(sy_r AS DOUBLE) / CAST(n_r AS DOUBLE)
        |              - ((CAST(sxy_r AS DOUBLE) - CAST(sx_r AS DOUBLE)
        |                    * CAST(sy_r AS DOUBLE) / CAST(n_r AS DOUBLE))
        |                 / (CAST(sxx_r AS DOUBLE) - CAST(sx_r AS DOUBLE)
        |                    * CAST(sx_r AS DOUBLE) / CAST(n_r AS DOUBLE)))
        |                * (CAST(sx_r AS DOUBLE) / CAST(n_r AS DOUBLE))
        |    END AS ar
        |  FROM mo)
        |SELECT n_left, n_right, ROUND(al, 8) AS alpha_left,
        |       ROUND(ar, 8) AS alpha_right, ROUND(ar - al, 8) AS gap
        |FROM a""".stripMargin)),

    // License-mention screen over documents with injected phrase
    // variants (the real kernel exercised against formula-derivable
    // labels — the WARC convention): routes copyleft / attribution
    // docs before training-corpus admission.
    QuerySpec("q_license_detect", (s, dir) => {
      val inj = when(col("doc_id") % 5 === 0,
        lit(" Permission is hereby granted, free of charge."))
        .when(col("doc_id") % 5 === 1,
          lit(" Licensed under the Apache License, Version 2.0."))
        .when(col("doc_id") % 5 === 2,
          lit(" Released under the GNU General Public License."))
        .when(col("doc_id") % 5 === 3,
          lit(" Creative Commons Attribution 4.0 International."))
        .otherwise(lit(""))
      graft.llm.TextAnalysis.licenseDetect(
          t(s, dir, "documents")
            .select(col("doc_id"), concat(col("text"), inj).as("text")),
          "text")
        .select(col("doc_id"), col("license"))
        .orderBy("doc_id")
    }, Some(
      """SELECT doc_id,
        |       CASE doc_id % 5 WHEN 0 THEN 'mit' WHEN 1 THEN 'apache'
        |            WHEN 2 THEN 'gpl' WHEN 3 THEN 'cc_by'
        |            ELSE 'none' END AS license
        |FROM documents ORDER BY doc_id""".stripMargin)),

    // Hill tail-index over the top-100 order values: the heavy-tail
    // exponent diagnostic (infinite-variance regimes mislead mean-based
    // monitors) — one bounded-heap TakeOrdered pass, ln grid on k+1 rows.
    QuerySpec("q_hill_tail", (s, dir) => {
      Stats.hillTail(t(s, dir, "orders"), "o_totalprice", "o_orderkey",
        k = 100)
    }, Some(
      """WITH top AS (
        |  SELECT CAST(o_totalprice AS DOUBLE) AS x,
        |         CAST(o_orderkey AS VARCHAR) AS k
        |  FROM orders WHERE o_totalprice > 0
        |  ORDER BY x DESC, k ASC LIMIT 101),
        |r0 AS (
        |  SELECT x, ROW_NUMBER() OVER (ORDER BY x DESC, k ASC) AS rn
        |  FROM top),
        |r AS (
        |  SELECT x, rn,
        |         MAX(CASE WHEN rn = 101 THEN x END) OVER () AS thr
        |  FROM r0)
        |SELECT CAST(100 AS BIGINT) AS k, ROUND(MAX(thr), 8) AS x_k,
        |       CASE WHEN SUM(CASE WHEN rn <= 100 THEN 1 ELSE 0 END) = 100
        |             AND CAST(SUM(CASE WHEN rn <= 100 THEN
        |                   CAST(ROUND(LN(x / thr), 8) AS DECIMAL(38,8))
        |                 END) AS DOUBLE) > 0.0
        |            THEN ROUND(100.0e0 / CAST(SUM(CASE WHEN rn <= 100 THEN
        |                   CAST(ROUND(LN(x / thr), 8) AS DECIMAL(38,8))
        |                 END) AS DOUBLE), 8)
        |       END AS hill_alpha
        |FROM r""".stripMargin)),

    // UCB1 allocation readout per event-type "arm" (reward = event
    // value): which arm the bandit pulls next, exploration bonus and
    // all — the adaptive complement of the fixed-split q_srm.
    QuerySpec("q_ucb_arms", (s, dir) => {
      Eval.ucbArms(Tables.events(s, dir), "event_type", "value", c = 2.0)
        .orderBy("arm")
    }, Some(
      """WITH b AS (
        |  SELECT event_type AS arm, CAST(value AS DECIMAL(18,2)) AS r
        |  FROM events WHERE event_type IS NOT NULL AND value IS NOT NULL),
        |per AS (SELECT arm, COUNT(*) AS n, SUM(r) AS sr FROM b GROUP BY arm),
        |tot AS (SELECT CAST(SUM(n) AS BIGINT) AS nn FROM per),
        |sc AS (
        |  SELECT arm, n,
        |         ROUND(CAST(sr AS DOUBLE) / CAST(n AS DOUBLE), 8)
        |           AS mean_reward,
        |         ROUND(CAST(sr AS DOUBLE) / CAST(n AS DOUBLE) +
        |               SQRT(2.0e0 * LN(CAST(nn AS DOUBLE))
        |                    / CAST(n AS DOUBLE)), 8) AS ucb
        |  FROM per CROSS JOIN tot),
        |mu AS (SELECT MAX(ucb) AS m FROM sc),
        |ca AS (SELECT MIN(arm) AS a FROM sc CROSS JOIN mu
        |       WHERE ucb = mu.m)
        |SELECT arm, n, mean_reward, ucb, arm = ca.a AS chosen
        |FROM sc CROSS JOIN ca ORDER BY arm""".stripMargin)),

    // IPF raking of the (nation × priority) order cells to uniform
    // margins, 3 fixed rounds — the survey-weighting /
    // table-standardization classic; margins are DECIMAL window sums,
    // each half-round one guarded 8dp ratio per cell.
    QuerySpec("q_ipf_rake", (s, dir) => {
      val cells = t(s, dir, "orders")
        .join(t(s, dir, "customer"),
          col("o_custkey") === col("c_custkey"))
        .groupBy(col("c_nationkey").as("nat"),
          col("o_orderpriority").as("prio"))
        .agg(count(lit(1)).as("w0"))
      val tot = cells.agg(sum(col("w0")).as("t"))
      val rowT = cells.select("nat").distinct().crossJoin(broadcast(tot))
        .select(col("nat"),
          (col("t").cast("double") / lit(25.0)).as("target"))
      val colT = cells.select("prio").distinct().crossJoin(broadcast(tot))
        .select(col("prio"),
          (col("t").cast("double") / lit(5.0)).as("target"))
      graft.engine.Reconcile.ipfRaking(cells, "nat", "prio", "w0",
        rowT, colT, rounds = 3).orderBy("nat", "prio")
    }, Some(ipfOracle))
  )
}
