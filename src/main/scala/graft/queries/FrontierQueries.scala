package graft.queries

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

import graft.QuerySpec
import graft.engine.{Skyline, Tables, TimeSeries}

/** Window-shaped analytics: Pareto frontier, burstiness, peak
  * detection — staircase/texture/alerting primitives over the same
  * value-domain window discipline as the rank-stats tier. */
object FrontierQueries {

  private def t(s: SparkSession, dir: String, name: String): DataFrame =
    Tables.load(s, dir, name)

  def specs: Seq[QuerySpec] = Seq(

    // Pareto frontier of parts on (min retail price, max size) — the
    // 2-D skyline as a running-max staircase over the distinct-price
    // domain, never a quadratic dominance join.
    QuerySpec("q_skyline", (s, dir) => {
      Skyline.frontier2d(t(s, dir, "part"), "p_partkey",
        "p_retailprice", "p_size")
    }, Some(
      """WITH base AS (
        |  SELECT p_partkey AS id,
        |         CAST(p_retailprice AS DECIMAL(18,2)) AS cost,
        |         CAST(p_size AS BIGINT) AS gain
        |  FROM part
        |  WHERE p_retailprice IS NOT NULL AND p_size IS NOT NULL),
        |pc AS (SELECT cost, MAX(gain) AS best FROM base GROUP BY cost),
        |kept AS (
        |  SELECT cost, best FROM (
        |    SELECT cost, best,
        |           MAX(best) OVER (ORDER BY cost
        |             ROWS BETWEEN UNBOUNDED PRECEDING AND 1 PRECEDING)
        |             AS prev_best
        |    FROM pc)
        |  WHERE prev_best IS NULL OR best > prev_best)
        |SELECT id, CAST(base.cost AS DOUBLE) AS cost, gain
        |FROM base JOIN kept
        |  ON base.cost = kept.cost AND base.gain = kept.best
        |ORDER BY cost, id""".stripMargin)),

    // Inter-event burstiness per event type (gaps within each user's
    // own stream): CV and the Goh–Barabási B score.
    QuerySpec("q_burstiness", (s, dir) => {
      TimeSeries.burstiness(t(s, dir, "events"),
          Seq("user_id", "event_type"), "event_type", "ts", "event_id")
        .orderBy("event_type")
    }, Some(
      """WITH gaps AS (
        |  SELECT event_type AS g,
        |         CAST(epoch_us(ts) AS BIGINT)
        |           - lag(CAST(epoch_us(ts) AS BIGINT), 1)
        |               OVER (PARTITION BY user_id, event_type
        |                     ORDER BY ts, event_id) AS gap
        |  FROM events WHERE ts IS NOT NULL),
        |m AS (
        |  SELECT g, COUNT(*) AS n_gaps,
        |         SUM(CAST(gap AS DECIMAL(38,0))) AS s,
        |         SUM(CAST(gap AS DECIMAL(19,0))
        |             * CAST(gap AS DECIMAL(19,0))) AS ss
        |  FROM gaps WHERE gap IS NOT NULL GROUP BY g),
        |d AS (
        |  SELECT g, n_gaps, CAST(n_gaps AS DOUBLE) AS nd,
        |         CAST(s AS DOUBLE) AS sd_, CAST(ss AS DOUBLE) AS ssd
        |  FROM m),
        |f AS (
        |  SELECT g, n_gaps, sd_ / nd AS mean,
        |         (nd * ssd - sd_ * sd_) / (nd * (nd - 1.0)) AS var
        |  FROM d)
        |-- SQRT stays INSIDE the var > 0 guard: gap² sums pass 2^53, so
        |-- near-constant gaps leave rounding noise of either sign and an
        |-- eager SQRT(negative) would abort the query
        |SELECT g AS event_type, n_gaps,
        |       ROUND(mean / 1000000.0, 8) AS mean_gap_s,
        |       CASE WHEN n_gaps > 1 AND mean > 0.0 AND var > 0.0
        |            THEN ROUND(SQRT(var) / mean, 8) END AS cv,
        |       CASE WHEN n_gaps > 1 AND var > 0.0 AND mean > 0.0
        |            THEN ROUND((SQRT(var) - mean) / (SQRT(var) + mean), 8)
        |       END AS burstiness
        |FROM f ORDER BY event_type""".stripMargin)),

    // Lorenz-curve points per returnflag: cumulative revenue share at
    // each value decile — the curve q_gini summarizes; per-group decile
    // cuts broadcast back (the RFM convention), cumulative walk over
    // ≤ 10 rows per group.
    QuerySpec("q_lorenz", (s, dir) => {
      import org.apache.spark.sql.expressions.Window
      val li = t(s, dir, "lineitem")
        .where(col("l_extendedprice").isNotNull)
        .select(col("l_returnflag").as("g"),
          col("l_extendedprice").cast("decimal(18,2)").as("x"))
      val probs = (1 until 10).map(_.toDouble / 10)
      // decile cuts honor spark.graft.percentile.approx (Percentiles):
      // exact by default for oracle parity, GK sketch at 100 TB scale
      val cuts = li.groupBy(col("g"))
        .agg(graft.engine.Percentiles.pct(s, col("x").cast("double"),
          typedlit(probs)).as("cuts"))
      val binned = li.join(broadcast(cuts), "g")
        .select(col("g"),
          aggregate(col("cuts"), lit(0L), (acc, e) =>
            acc + when(col("x").cast("double") > e, 1L).otherwise(0L))
            .as("decile"),
          col("x"))
      val perBin = binned.groupBy(col("g"), col("decile"))
        .agg(count(lit(1)).as("n"), sum(col("x")).as("v"))
      val tot = perBin.groupBy(col("g"))
        .agg(sum(col("v")).as("tv"))
      val wCum = Window.partitionBy(col("g")).orderBy(col("decile"))
        .rowsBetween(Window.unboundedPreceding, 0)
      perBin.join(broadcast(tot), "g")
        .withColumn("cum_v", sum(col("v")).over(wCum))
        .select(col("g").as("l_returnflag"), col("decile"), col("n"),
          round(col("v").cast("double") / col("tv").cast("double"), 8)
            .as("value_share"),
          round(col("cum_v").cast("double") / col("tv").cast("double"),
            8).as("cum_share"))
        .orderBy("l_returnflag", "decile")
    }, Some {
      val cutCols = (1 to 9).map(i =>
        s"quantile_cont(CAST(x AS DOUBLE), 0.$i) AS c$i").mkString(", ")
      val binExpr = (1 to 9).map(i =>
        s"(CASE WHEN CAST(x AS DOUBLE) > c$i THEN 1 ELSE 0 END)")
        .mkString(" + ")
      s"""WITH li AS (
         |  SELECT l_returnflag AS g,
         |         CAST(l_extendedprice AS DECIMAL(18,2)) AS x
         |  FROM lineitem WHERE l_extendedprice IS NOT NULL),
         |cuts AS (SELECT g, $cutCols FROM li GROUP BY g),
         |binned AS (
         |  SELECT li.g, CAST($binExpr AS BIGINT) AS decile, x
         |  FROM li JOIN cuts ON cuts.g = li.g),
         |pb AS (
         |  SELECT g, decile, COUNT(*) AS n, SUM(x) AS v
         |  FROM binned GROUP BY 1, 2),
         |tot AS (SELECT g, SUM(v) AS tv FROM pb GROUP BY g),
         |w AS (
         |  SELECT pb.g, decile, n, v, tv,
         |         SUM(v) OVER (PARTITION BY pb.g ORDER BY decile
         |           ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW)
         |           AS cum_v
         |  FROM pb JOIN tot ON tot.g = pb.g)
         |SELECT g AS l_returnflag, decile, n,
         |       ROUND(CAST(v AS DOUBLE) / CAST(tv AS DOUBLE), 8)
         |         AS value_share,
         |       ROUND(CAST(cum_v AS DOUBLE) / CAST(tv AS DOUBLE), 8)
         |         AS cum_share
         |FROM w ORDER BY l_returnflag, decile""".stripMargin
    }),

    // Dunning G² keyness of every (source, term): which words
    // characterize each source against the rest of the corpus.
    QuerySpec("q_keyness", (s, dir) => {
      graft.llm.Keyness.keyness(t(s, dir, "documents"), "source", "text")
        .orderBy("source", "term")
    }, Some(
      """WITH tk AS (
        |  SELECT source AS g,
        |         unnest(list_filter(string_split_regex(lower(text),
        |                                               '[^a-z0-9]+'),
        |                x -> x <> '')) AS w
        |  FROM documents),
        |gt AS (SELECT g, w, COUNT(*) AS a FROM tk GROUP BY 1, 2),
        |tt AS (SELECT w, CAST(SUM(a) AS BIGINT) AS t FROM gt GROUP BY w),
        |gtot AS (SELECT g, CAST(SUM(a) AS BIGINT) AS n1
        |         FROM gt GROUP BY g),
        |nt AS (SELECT CAST(SUM(n1) AS BIGINT) AS nn FROM gtot),
        |j AS (
        |  SELECT gt.g, gt.w, gt.a,
        |         CAST(gt.a AS DOUBLE) AS ad,
        |         CAST(tt.t - gt.a AS DOUBLE) AS bd,
        |         CAST(gtot.n1 AS DOUBLE) AS n1d,
        |         CAST(nt.nn - gtot.n1 AS DOUBLE) AS n2d,
        |         CAST(tt.t AS DOUBLE) AS td, CAST(nt.nn AS DOUBLE) AS nd
        |  FROM gt JOIN tt USING (w) JOIN gtot USING (g) CROSS JOIN nt)
        |SELECT g AS source, w AS term, a,
        |       ROUND(n1d * td / nd, 8) AS expected_a,
        |       ROUND(CAST(2.0 AS DOUBLE) * (
        |         (CASE WHEN ad > 0
        |               THEN ROUND(ad * ROUND(LN(ad / (n1d * td / nd)),
        |                                     8), 8)
        |               ELSE 0.0 END)
        |         + (CASE WHEN bd > 0
        |                 THEN ROUND(bd * ROUND(LN(bd / (n2d * td / nd)),
        |                                       8), 8)
        |                 ELSE 0.0 END)), 8) AS g2,
        |       ad / n1d > bd / n2d AS over_used
        |FROM j ORDER BY source, term""".stripMargin)),

    // Daily-volume peaks per returnflag: strict local maxima at least
    // 1.2× the series mean — the alerting primitive.
    QuerySpec("q_peak_detect", (s, dir) => {
      TimeSeries.peaks(RankStatsQueries.dailySeries(s, dir),
          "l_returnflag", "day", "v", factor = 1.2)
        .orderBy("l_returnflag", "day")
    }, Some(
      s"""WITH daily AS (${RankStatsQueries.dailySql}),
         |base AS (SELECT l_returnflag AS g, day, v FROM daily
         |         WHERE v IS NOT NULL),
         |means AS (
         |  SELECT g, CAST(SUM(v) AS DOUBLE) / COUNT(*) AS gmean
         |  FROM base GROUP BY g),
         |wins AS (
         |  SELECT g, day, v,
         |         lag(v, 1) OVER (PARTITION BY g ORDER BY day) AS prev,
         |         lead(v, 1) OVER (PARTITION BY g ORDER BY day) AS next
         |  FROM base)
         |SELECT wins.g AS l_returnflag, day, CAST(v AS DOUBLE) AS v
         |FROM wins JOIN means ON means.g = wins.g
         |WHERE prev IS NOT NULL AND next IS NOT NULL
         |  AND v > prev AND v > next
         |  AND CAST(v AS DOUBLE) > CAST(1.2 AS DOUBLE) * gmean
         |ORDER BY l_returnflag, day""".stripMargin))
  )
}
