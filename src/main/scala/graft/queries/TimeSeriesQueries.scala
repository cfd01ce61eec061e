package graft.queries

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

import graft.QuerySpec
import graft.engine.{Bootstrap, Tables, TimeSeries}

/** Time-series monitoring over the calendar-spine daily series (ACF
  * grid, Bollinger bands, rolling correlation, seasonality index) plus
  * the Poisson-bootstrap CI — the uncertainty layer over the point
  * statistics the stats tier reports. */
object TimeSeriesQueries {

  private def t(s: SparkSession, dir: String, name: String): DataFrame =
    Tables.load(s, dir, name)

  /** Two-metric daily series (quantity + revenue sums per returnflag). */
  private def dailyXY(s: SparkSession, dir: String): DataFrame =
    t(s, dir, "lineitem")
      .groupBy(col("l_returnflag"),
        datediff(to_date(col("l_shipdate")), lit("1992-01-01").cast("date"))
          .cast("long").as("day"))
      .agg(sum(col("l_quantity").cast("decimal(18,2)")).as("x"),
        sum(col("l_extendedprice").cast("decimal(18,2)")).as("y"))

  private val dailyXYSql =
    """SELECT l_returnflag,
      |       CAST(datediff('day', DATE '1992-01-01',
      |                     CAST(l_shipdate AS DATE)) AS BIGINT) AS day,
      |       SUM(CAST(l_quantity AS DECIMAL(18,2))) AS x,
      |       SUM(CAST(l_extendedprice AS DECIMAL(18,2))) AS y
      |FROM lineitem GROUP BY 1, 2""".stripMargin

  /** The shared Pearson-from-moments SQL tail (the q_corr_ols formula):
    * expects columns n, sx, sy, sxx, syy, sxy in scope. */
  private def pearsonSql(outName: String, extraCond: String = "") =
    s"""CASE WHEN CAST(n AS DOUBLE) * CAST(sxx AS DOUBLE)
       |          - CAST(sx AS DOUBLE) * CAST(sx AS DOUBLE) > 0
       |      AND CAST(n AS DOUBLE) * CAST(syy AS DOUBLE)
       |          - CAST(sy AS DOUBLE) * CAST(sy AS DOUBLE) > 0
       |      $extraCond
       |     THEN ROUND((CAST(n AS DOUBLE) * CAST(sxy AS DOUBLE)
       |                 - CAST(sx AS DOUBLE) * CAST(sy AS DOUBLE))
       |                / SQRT(CAST(n AS DOUBLE) * CAST(sxx AS DOUBLE)
       |                       - CAST(sx AS DOUBLE) * CAST(sx AS DOUBLE))
       |                / SQRT(CAST(n AS DOUBLE) * CAST(syy AS DOUBLE)
       |                       - CAST(sy AS DOUBLE) * CAST(sy AS DOUBLE)), 8)
       |END AS $outName""".stripMargin

  def specs: Seq[QuerySpec] = Seq(

    // ACF at lags 1..5 over the daily quantity series, one window pass —
    // the memory-structure diagnostic generalizing q_autocorr's lag-1.
    // Hurst exponent by rescaled-range analysis over the global daily
    // quantity series: complete 8/16/32/64-day blocks, exact n-scaled
    // cumdev cents, 8dp ln(R/S) means per size, H = log-log OLS slope.
    QuerySpec("q_hurst", (s, dir) => {
      val daily = t(s, dir, "lineitem")
        .where(col("l_shipdate").isNotNull)
        .groupBy(datediff(to_date(col("l_shipdate")),
          lit("1992-01-01").cast("date")).cast("long").as("day"))
        .agg(sum(col("l_quantity").cast("decimal(18,2)")).as("qty"))
      TimeSeries.hurstRs(daily, "day", "qty").orderBy("size")
    }, Some(
      """WITH d AS (
        |  SELECT CAST(datediff('day', DATE '1992-01-01',
        |                       CAST(l_shipdate AS DATE)) AS BIGINT) AS i,
        |         SUM(CAST(l_quantity AS DECIMAL(18,2))) AS x
        |  FROM lineitem WHERE l_shipdate IS NOT NULL GROUP BY 1),
        |sz AS (
        |  SELECT i, x, s, i // s AS blk
        |  FROM d CROSS JOIN (SELECT unnest([8, 16, 32, 64]) AS s)),
        |st AS (
        |  SELECT s, blk, COUNT(*) AS n, SUM(x) AS sx,
        |         SUM(CAST(x * x AS DECIMAL(38,4))) AS sxx
        |  FROM sz GROUP BY s, blk
        |  HAVING COUNT(*) = s),
        |dev AS (
        |  SELECT sz.s, sz.blk, st.n, st.sx, st.sxx,
        |         CAST(SUM(sz.x) OVER win AS DECIMAL(24,2))
        |           * CAST(st.n AS DECIMAL(8,0))
        |         - CAST(COUNT(*) OVER win AS DECIMAL(8,0))
        |           * CAST(st.sx AS DECIMAL(24,2)) AS cum
        |  FROM sz JOIN st ON sz.s = st.s AND sz.blk = st.blk
        |  WINDOW win AS (PARTITION BY sz.s, sz.blk ORDER BY sz.i
        |                 ROWS UNBOUNDED PRECEDING)),
        |pb AS (
        |  SELECT s, blk, n, sx, sxx,
        |         MAX(cum) - MIN(cum) AS rn
        |  FROM dev GROUP BY s, blk, n, sx, sxx),
        |lr AS (
        |  SELECT s,
        |         CAST(ROUND(LN((CAST(rn AS DOUBLE) / CAST(n AS DOUBLE))
        |           / SQRT((CAST(sxx AS DOUBLE) - CAST(sx AS DOUBLE)
        |                     * CAST(sx AS DOUBLE) / CAST(n AS DOUBLE))
        |                  / CAST(n AS DOUBLE))), 8) AS DECIMAL(38,8))
        |           AS lrs
        |  FROM pb
        |  WHERE (CAST(sxx AS DOUBLE) - CAST(sx AS DOUBLE)
        |           * CAST(sx AS DOUBLE) / CAST(n AS DOUBLE))
        |        / CAST(n AS DOUBLE) > 0.0),
        |ps AS (
        |  SELECT s, COUNT(*) AS n_blocks,
        |         ROUND(CAST(SUM(lrs) AS DOUBLE)
        |               / CAST(COUNT(*) AS DOUBLE), 8) AS ln_rs_mean,
        |         ROUND(LN(CAST(s AS DOUBLE)), 8) AS lns
        |  FROM lr GROUP BY s),
        |mo AS (
        |  SELECT COUNT(*) AS m,
        |         SUM(CAST(lns AS DECIMAL(38,8))) AS sa,
        |         SUM(CAST(ln_rs_mean AS DECIMAL(38,8))) AS sb,
        |         SUM(CAST(ROUND(lns * lns, 16) AS DECIMAL(38,16)))
        |           AS saa,
        |         SUM(CAST(ROUND(lns * ln_rs_mean, 16)
        |                  AS DECIMAL(38,16))) AS sab
        |  FROM ps),
        |h AS (
        |  SELECT CASE WHEN m > 1 AND
        |           CAST(saa AS DOUBLE) - CAST(sa AS DOUBLE)
        |             * CAST(sa AS DOUBLE) / CAST(m AS DOUBLE) > 0.0
        |         THEN ROUND((CAST(sab AS DOUBLE) - CAST(sa AS DOUBLE)
        |                * CAST(sb AS DOUBLE) / CAST(m AS DOUBLE))
        |              / (CAST(saa AS DOUBLE) - CAST(sa AS DOUBLE)
        |                 * CAST(sa AS DOUBLE) / CAST(m AS DOUBLE)), 8)
        |         END AS hurst
        |  FROM mo)
        |SELECT s AS size, n_blocks, ln_rs_mean, hurst
        |FROM ps CROSS JOIN h ORDER BY size""".stripMargin)),

    QuerySpec("q_acf_grid", (s, dir) => {
      TimeSeries.acfGrid(RankStatsQueries.dailySeries(s, dir),
          "l_returnflag", "day", "v", maxLag = 5)
        .orderBy("l_returnflag", "lag")
    }, Some {
      val lagCols = (1 to 5).map(k =>
        s"LAG(v, $k) OVER (PARTITION BY l_returnflag ORDER BY day) AS x$k")
        .mkString(",\n|         ")
      val branches = (1 to 5).map(k =>
        s"SELECT l_returnflag, $k AS lag, x$k AS x, v AS y FROM lagged")
        .mkString("\n|  UNION ALL ")
      s"""WITH daily AS (${RankStatsQueries.dailySql}),
         |lagged AS (
         |  SELECT l_returnflag, v,
         |         $lagCols
         |  FROM daily WHERE v IS NOT NULL),
         |pairs AS (
         |  $branches),
         |m AS (
         |  SELECT l_returnflag, lag, COUNT(*) AS n,
         |         SUM(x) AS sx, SUM(y) AS sy, SUM(x * x) AS sxx,
         |         SUM(y * y) AS syy, SUM(x * y) AS sxy
         |  FROM pairs WHERE x IS NOT NULL
         |  GROUP BY 1, 2)
         |SELECT l_returnflag, lag, n,
         |       ${pearsonSql("acf")}
         |FROM m ORDER BY l_returnflag, lag""".stripMargin
    }),

    // Bollinger bands (7-day, ±2σ) over daily quantity with breach
    // flags — bands from exact DECIMAL window sums, the breach compare
    // on the shared unrounded doubles.
    QuerySpec("q_bollinger", (s, dir) => {
      TimeSeries.bollinger(RankStatsQueries.dailySeries(s, dir),
          "l_returnflag", "day", "v", window = 7, k = 2.0)
        .orderBy("l_returnflag", "day")
    }, Some(
      s"""WITH daily AS (${RankStatsQueries.dailySql}),
         |w AS (
         |  SELECT l_returnflag, day, v,
         |         COUNT(*) OVER fr AS n, SUM(v) OVER fr AS s,
         |         SUM(v * v) OVER fr AS ss
         |  FROM daily WHERE v IS NOT NULL
         |  WINDOW fr AS (PARTITION BY l_returnflag ORDER BY day
         |                ROWS BETWEEN 6 PRECEDING AND CURRENT ROW)),
         |b AS (
         |  SELECT l_returnflag, day, v, n,
         |         CAST(s AS DOUBLE) / CAST(n AS DOUBLE) AS mean,
         |         SQRT((CAST(n AS DOUBLE) * CAST(ss AS DOUBLE)
         |               - CAST(s AS DOUBLE) * CAST(s AS DOUBLE))
         |              / (CAST(n AS DOUBLE) * (CAST(n AS DOUBLE) - 1.0)))
         |           AS sd
         |  FROM w)
         |SELECT l_returnflag, day, CAST(v AS DOUBLE) AS v,
         |       CASE WHEN n = 7 THEN ROUND(mean, 8) END AS mean,
         |       CASE WHEN n = 7
         |            THEN ROUND(mean - CAST(2.0 AS DOUBLE) * sd, 8)
         |       END AS lower,
         |       CASE WHEN n = 7
         |            THEN ROUND(mean + CAST(2.0 AS DOUBLE) * sd, 8)
         |       END AS upper,
         |       CASE WHEN n = 7
         |            THEN CAST(v AS DOUBLE)
         |                   > mean + CAST(2.0 AS DOUBLE) * sd
         |                 OR CAST(v AS DOUBLE)
         |                   < mean - CAST(2.0 AS DOUBLE) * sd
         |       END AS breach
         |FROM b ORDER BY l_returnflag, day""".stripMargin)),

    // Rolling 14-day quantity↔revenue correlation per returnflag —
    // the co-movement monitor (five DECIMAL window sums, one pass).
    QuerySpec("q_rolling_corr", (s, dir) => {
      TimeSeries.rollingCorr(dailyXY(s, dir), "l_returnflag", "day",
          "x", "y", window = 14)
        .orderBy("l_returnflag", "day")
    }, Some(
      s"""WITH daily AS ($dailyXYSql),
         |w AS (
         |  SELECT l_returnflag, day,
         |         COUNT(*) OVER fr AS n,
         |         SUM(x) OVER fr AS sx, SUM(y) OVER fr AS sy,
         |         SUM(x * x) OVER fr AS sxx, SUM(y * y) OVER fr AS syy,
         |         SUM(x * y) OVER fr AS sxy
         |  FROM daily WHERE x IS NOT NULL AND y IS NOT NULL
         |  WINDOW fr AS (PARTITION BY l_returnflag ORDER BY day
         |                ROWS BETWEEN 13 PRECEDING AND CURRENT ROW))
         |SELECT l_returnflag, day, n,
         |       ${pearsonSql("corr", "AND n = 14")}
         |FROM w ORDER BY l_returnflag, day""".stripMargin)),

    // Day-of-week seasonality index of event values per event type
    // (DuckDB's Sunday = 0 convention, the q_date_parts rule).
    QuerySpec("q_seasonal_profile", (s, dir) => {
      TimeSeries.seasonalProfile(t(s, dir, "events"), "event_type",
          (dayofweek(col("ts")) - 1).cast("long"), "value")
        .orderBy("event_type", "season")
    }, Some(
      """WITH per AS (
        |  SELECT event_type, CAST(dayofweek(ts) AS BIGINT) AS season,
        |         COUNT(*) AS n,
        |         SUM(CAST(value AS DECIMAL(18,2))) AS s
        |  FROM events WHERE value IS NOT NULL GROUP BY 1, 2),
        |tot AS (
        |  SELECT event_type, CAST(SUM(n) AS BIGINT) AS tn, SUM(s) AS ts
        |  FROM per GROUP BY event_type)
        |SELECT per.event_type, season, n,
        |       ROUND(CAST(per.s AS DOUBLE) / CAST(per.n AS DOUBLE), 8)
        |         AS season_mean,
        |       CASE WHEN CAST(tot.ts AS DOUBLE) / CAST(tot.tn AS DOUBLE)
        |                 > 0.0
        |            THEN ROUND((CAST(per.s AS DOUBLE)
        |                        / CAST(per.n AS DOUBLE))
        |                       / (CAST(tot.ts AS DOUBLE)
        |                          / CAST(tot.tn AS DOUBLE)), 8)
        |       END AS season_index
        |FROM per JOIN tot USING (event_type)
        |ORDER BY event_type, season""".stripMargin)),

    // Poisson-bootstrap 95% CI for the per-returnflag mean quantity:
    // 50 replicates of md5-drawn Poisson(1) weights (hex-threshold
    // draw — no floating point), exact percentile over replicate means.
    QuerySpec("q_bootstrap_ci", (s, dir) => {
      Bootstrap.meanCi(t(s, dir, "lineitem"), "l_returnflag",
          "l_quantity",
          concat(col("l_orderkey").cast("string"), lit("|"),
            col("l_linenumber").cast("string")),
          b = 50)
        .orderBy("l_returnflag")
    }, Some {
      val wCase = Bootstrap.poissonCaseSql("pfx")
      s"""WITH base AS (
         |  SELECT l_returnflag AS g,
         |         CAST(l_quantity AS DECIMAL(18,2)) AS x,
         |         CAST(l_orderkey AS VARCHAR) || '|'
         |           || CAST(l_linenumber AS VARCHAR) AS k
         |  FROM lineitem WHERE l_quantity IS NOT NULL),
         |hashed AS (
         |  SELECT g, x, chunk,
         |         md5('boot|' || k || '|' || CAST(chunk AS VARCHAR)) AS h
         |  FROM base CROSS JOIN
         |       (SELECT unnest(range(0, 13)) AS chunk)),
         |slotted AS (
         |  SELECT g, x, chunk * 4 + slot + 1 AS rep,
         |         SUBSTR(h, CAST(1 + 8 * slot AS INT), 8) AS pfx
         |  FROM hashed CROSS JOIN
         |       (SELECT unnest(range(0, 4)) AS slot)
         |  WHERE chunk * 4 + slot + 1 <= 50),
         |reps AS (
         |  SELECT g, rep, $wCase AS w, x
         |  FROM slotted),
         |rm AS (
         |  SELECT g, rep,
         |         CASE WHEN SUM(w) > 0
         |              THEN CAST(SUM(CAST(w AS DECIMAL(28,0)) * x)
         |                        AS DOUBLE) / CAST(SUM(w) AS DOUBLE)
         |         END AS rep_mean
         |  FROM reps GROUP BY 1, 2),
         |ci AS (
         |  SELECT g, ROUND(quantile_cont(rep_mean, 0.025), 8) AS ci_lo,
         |         ROUND(quantile_cont(rep_mean, 0.975), 8) AS ci_hi
         |  FROM rm WHERE rep_mean IS NOT NULL GROUP BY g),
         |pt AS (
         |  SELECT g, COUNT(*) AS n,
         |         ROUND(CAST(SUM(x) AS DOUBLE) / COUNT(*), 8) AS mean
         |  FROM base GROUP BY g)
         |SELECT pt.g AS l_returnflag, n, mean, ci_lo, ci_hi
         |FROM pt JOIN ci USING (g) ORDER BY l_returnflag""".stripMargin
    }),

    // Time-decayed top-20 parts by revenue (1-day half-life on the day
    // grid) — trending-items ranking in exact power-of-two integer
    // arithmetic (weights 2^(50−days_ago) units, zero beyond 50 days).
    QuerySpec("q_decayed_topk", (s, dir) => {
      TimeSeries.decayedTopK(t(s, dir, "lineitem"), "l_partkey",
        datediff(to_date(col("l_shipdate")),
          lit("1992-01-01").cast("date")).cast("long"),
        (col("l_extendedprice").cast("decimal(18,2)") * 100))
    }, Some(
      """WITH base AS (
        |  SELECT l_partkey AS item,
        |         CAST(datediff('day', DATE '1992-01-01',
        |                       CAST(l_shipdate AS DATE)) AS BIGINT) AS day,
        |         CAST(CAST(l_extendedprice AS DECIMAL(18,2)) * 100
        |              AS DECIMAL(18,0)) AS cents
        |  FROM lineitem),
        |mx AS (SELECT MAX(day) AS max_day FROM base),
        |w AS (
        |  SELECT item,
        |         CASE WHEN max_day - day BETWEEN 0 AND 50
        |              THEN cents * CAST(CAST(1 AS BIGINT)
        |                     << CAST(50 - (max_day - day) AS INTEGER)
        |                     AS DECIMAL(38,0))
        |              ELSE CAST(0 AS DECIMAL(38,0)) END AS w
        |  FROM base CROSS JOIN mx),
        |s AS (SELECT item, SUM(w) AS s FROM w GROUP BY item)
        |SELECT item,
        |       ROUND(CAST(s AS DOUBLE)
        |             / CAST(1125899906842624.0 AS DOUBLE), 8) AS decayed
        |FROM s ORDER BY decayed DESC, item LIMIT 20""".stripMargin)),

    // Last-touch attribution: purchases credit the user's most recent
    // click/view within 7 days (running-last struct window — the
    // asofJoinBackward shape on a single stream).
    QuerySpec("q_attribution", (s, dir) => {
      TimeSeries.lastTouchAttribution(t(s, dir, "events"), "user_id",
          "ts", "event_id", "event_type", "value",
          Seq("click", "view"), "purchase", windowDays = 7)
        .orderBy("touch_type")
    }, Some(
      // the window carries only the touch's UNIQUE event_id (DuckDB's
      // last_value over a CASE'd STRUCT returns inconsistent fields —
      // ts from the current row, typ from the touch); the touch row
      // joins back by id, which is stitch-safe by uniqueness
      """WITH lt AS (
        |  SELECT user_id, ts, event_id, event_type, value,
        |         last_value(CASE WHEN event_type IN ('click', 'view')
        |                         THEN event_id END IGNORE NULLS)
        |           OVER (PARTITION BY user_id ORDER BY ts, event_id
        |                 ROWS BETWEEN UNBOUNDED PRECEDING
        |                          AND 1 PRECEDING) AS lt_id
        |  FROM events WHERE ts IS NOT NULL),
        |tj AS (
        |  SELECT lt.ts, lt.event_type, lt.value,
        |         t.ts AS lts, t.event_type AS ltyp
        |  FROM lt LEFT JOIN events t ON t.event_id = lt.lt_id),
        |conv AS (
        |  SELECT CAST(value AS DECIMAL(18,2)) AS v,
        |         CASE WHEN lts IS NOT NULL
        |                AND lts >= ts - INTERVAL 7 DAY
        |              THEN ltyp ELSE '(none)' END AS touch_type
        |  FROM tj WHERE event_type = 'purchase')
        |SELECT touch_type, COUNT(*) AS n_conversions,
        |       ROUND(CAST(SUM(v) AS DOUBLE), 8) AS total_value
        |FROM conv GROUP BY touch_type ORDER BY touch_type""".stripMargin)),

    // "Unusual for a Tuesday": per (event_type, dow) cell mean/SD and
    // the count of ±3σ outliers within the cell.
    QuerySpec("q_seasonal_anomaly", (s, dir) => {
      TimeSeries.seasonalAnomalies(t(s, dir, "events"), "event_type",
          (dayofweek(col("ts")) - 1).cast("long"), "value", k = 3.0)
        .orderBy("event_type", "season")
    }, Some(
      """WITH base AS (
        |  SELECT event_type AS g, CAST(dayofweek(ts) AS BIGINT) AS season,
        |         CAST(value AS DECIMAL(18,2)) AS v
        |  FROM events WHERE value IS NOT NULL),
        |cells AS (
        |  SELECT g, season, COUNT(*) AS n, SUM(v) AS s, SUM(v * v) AS ss
        |  FROM base GROUP BY 1, 2),
        |st AS (
        |  SELECT g, season, n,
        |         CASE WHEN n > 1 THEN CAST(s AS DOUBLE) / CAST(n AS DOUBLE)
        |         END AS mean,
        |         CASE WHEN n > 1 THEN
        |           SQRT((CAST(n AS DOUBLE) * CAST(ss AS DOUBLE)
        |                 - CAST(s AS DOUBLE) * CAST(s AS DOUBLE))
        |                / (CAST(n AS DOUBLE) * (CAST(n AS DOUBLE) - 1.0)))
        |         END AS sd
        |  FROM cells)
        |SELECT st.g AS event_type, st.season, st.n,
        |       ROUND(mean, 8) AS mean, ROUND(sd, 8) AS sd,
        |       CAST(SUM(CASE WHEN sd IS NOT NULL AND sd > 0.0
        |                      AND ABS(CAST(v AS DOUBLE) - mean)
        |                          > CAST(3.0 AS DOUBLE) * sd
        |                     THEN 1 ELSE 0 END) AS BIGINT) AS n_anomalies
        |FROM base JOIN st ON base.g = st.g AND base.season = st.season
        |GROUP BY st.g, st.season, st.n, mean, sd
        |ORDER BY 1, 2""".stripMargin)),

    // Calendar-gap screen: (priority, day) pairs with no orders inside
    // the observed day range — the silent-feed freshness check.
    QuerySpec("q_missing_days", (s, dir) => {
      TimeSeries.missingDays(t(s, dir, "orders"), "o_orderpriority",
          datediff(to_date(col("o_orderdate")),
            lit("1992-01-01").cast("date")).cast("long"))
        .orderBy("o_orderpriority", "day")
    }, Some(
      """WITH base AS (
        |  SELECT DISTINCT o_orderpriority AS g,
        |         CAST(datediff('day', DATE '1992-01-01',
        |                       CAST(o_orderdate AS DATE)) AS BIGINT) AS day
        |  FROM orders
        |  WHERE o_orderpriority IS NOT NULL AND o_orderdate IS NOT NULL),
        |r AS (SELECT MIN(day) AS lo, MAX(day) AS hi FROM base),
        |spine AS (SELECT unnest(range(lo, hi + 1)) AS day FROM r),
        |groups AS (SELECT DISTINCT g FROM base)
        |SELECT groups.g AS o_orderpriority, spine.day AS day
        |FROM groups CROSS JOIN spine
        |LEFT JOIN base ON base.g = groups.g AND base.day = spine.day
        |WHERE base.g IS NULL
        |ORDER BY o_orderpriority, day""".stripMargin))
  )
}
