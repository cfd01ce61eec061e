package graft.engine

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/** Time-series diagnostics over ordered per-group series: multi-lag
  * autocorrelation, Bollinger bands, rolling correlation, and seasonal
  * profiles — the monitoring layer over the calendar-spine series the
  * trend screens ([[RankStats]]) already pre-aggregate.
  *
  * Scale discipline: every window partitions by the series key and runs
  * over CALENDAR-bounded daily rows (callers aggregate to the time grid
  * first), window state is exact DECIMAL sums, and only the final scalar
  * formulas run in floating point (identical expression trees on both
  * engines — the q_corr_ols convention).
  */
object TimeSeries {

  /** Autocorrelation function at lags 1..`maxLag` per group, all from
    * ONE window pass: `maxLag` lag() columns materialize side by side
    * over the same (group, order) sort, the (lag, x, y) pairs explode
    * map-side, and one aggregation computes the DECIMAL moment set per
    * (group, lag) — Pearson over the lag pairs (the q_autocorr formula,
    * generalized). Output: group, lag, n, acf (8dp, NULL on degenerate
    * variance). */
  def acfGrid(series: DataFrame, groupCol: String, orderCol: String,
      valueCol: String, maxLag: Int): DataFrame = {
    require(maxLag >= 1, s"maxLag=$maxLag")
    val w = Window.partitionBy(col(groupCol)).orderBy(col(orderCol))
    val y = col(valueCol).cast("decimal(18,2)")
    val lagged = series.select(
      (col(groupCol).as("g") +: y.as("y") +:
        (1 to maxLag).map(k => lag(y, k).over(w).as(s"x$k"))): _*)
    val pairs = lagged.select(col("g"), col("y"),
        explode(array((1 to maxLag).map(k =>
          struct(lit(k).as("lag"), col(s"x$k").as("x"))): _*)).as("p"))
      .select(col("g"), col("p.lag").as("lag"), col("p.x").as("x"),
        col("y"))
      .where(col("x").isNotNull)
    val m = pairs.groupBy(col("g"), col("lag")).agg(
      count(lit(1)).as("n"),
      sum(col("x")).as("sx"), sum(col("y")).as("sy"),
      sum(col("x") * col("x")).as("sxx"),
      sum(col("y") * col("y")).as("syy"),
      sum(col("x") * col("y")).as("sxy"))
    val (nd, sxd, syd) = (col("n").cast("double"),
      col("sx").cast("double"), col("sy").cast("double"))
    val num = nd * col("sxy").cast("double") - sxd * syd
    val denx = nd * col("sxx").cast("double") - sxd * sxd
    val deny = nd * col("syy").cast("double") - syd * syd
    m.select(col("g").as(groupCol), col("lag"), col("n"),
      when(denx > 0 && deny > 0,
        round(num / sqrt(denx) / sqrt(deny), 8)).as("acf"))
  }

  /** Bollinger bands: trailing `window`-row mean ± `k`·(sample stddev)
    * per group, with a breach flag where the value leaves the band.
    * Mean and stddev derive from exact DECIMAL window sums
    * (Σx, Σx², n); the band comparison runs on the UNROUNDED doubles —
    * the identical IEEE expression both engines evaluate — and only the
    * displayed band edges round to 8dp. Rows before a full window
    * report NULL bands (no partial-window guesses). Output: group,
    * order, v, mean, lower, upper, breach. */
  def bollinger(series: DataFrame, groupCol: String, orderCol: String,
      valueCol: String, window: Int, k: Double = 2.0): DataFrame = {
    require(window >= 2, s"window=$window")
    val w = Window.partitionBy(col("g")).orderBy(col("o"))
      .rowsBetween(-(window - 1), 0)
    val x = col(valueCol).cast("decimal(18,2)")
    val withSums = series.select(col(groupCol).as("g"),
        col(orderCol).as("o"), x.as("v"))
      .withColumn("n", count(lit(1)).over(w))
      .withColumn("s", sum(col("v")).over(w))
      .withColumn("ss", sum(col("v") * col("v")).over(w))
    val nd = col("n").cast("double")
    val mean = col("s").cast("double") / nd
    val variance = (nd * col("ss").cast("double") -
      col("s").cast("double") * col("s").cast("double")) /
      (nd * (nd - 1.0))
    val sd = sqrt(variance)
    val full = col("n") === window
    withSums.select(col("g").as(groupCol), col("o").as(orderCol),
      // double output (exact for grid values) — keeps the dumped dtype
      // aligned with the oracle's DECIMAL-sum-to-double conversion
      col("v").cast("double").as("v"),
      when(full, round(mean, 8)).as("mean"),
      when(full, round(mean - lit(k) * sd, 8)).as("lower"),
      when(full, round(mean + lit(k) * sd, 8)).as("upper"),
      when(full, col("v").cast("double") > mean + lit(k) * sd ||
        col("v").cast("double") < mean - lit(k) * sd).as("breach"))
  }

  /** Rolling Pearson correlation between two series over a trailing
    * `window`-row frame per group: five DECIMAL window sums feed the
    * same moment formula as [[acfGrid]]. Output: group, order, n,
    * corr (8dp; NULL before a full window or on zero variance). */
  def rollingCorr(series: DataFrame, groupCol: String, orderCol: String,
      xCol: String, yCol: String, window: Int): DataFrame = {
    require(window >= 2, s"window=$window")
    val w = Window.partitionBy(col("g")).orderBy(col("o"))
      .rowsBetween(-(window - 1), 0)
    val x = col(xCol).cast("decimal(18,2)")
    val y = col(yCol).cast("decimal(18,2)")
    val withSums = series.select(col(groupCol).as("g"),
        col(orderCol).as("o"), x.as("x"), y.as("y"))
      .withColumn("n", count(lit(1)).over(w))
      .withColumn("sx", sum(col("x")).over(w))
      .withColumn("sy", sum(col("y")).over(w))
      .withColumn("sxx", sum(col("x") * col("x")).over(w))
      .withColumn("syy", sum(col("y") * col("y")).over(w))
      .withColumn("sxy", sum(col("x") * col("y")).over(w))
    val nd = col("n").cast("double")
    val num = nd * col("sxy").cast("double") -
      col("sx").cast("double") * col("sy").cast("double")
    val denx = nd * col("sxx").cast("double") -
      col("sx").cast("double") * col("sx").cast("double")
    val deny = nd * col("syy").cast("double") -
      col("sy").cast("double") * col("sy").cast("double")
    withSums.select(col("g").as(groupCol), col("o").as(orderCol),
      col("n"),
      when(col("n") === window && denx > 0 && deny > 0,
        round(num / sqrt(denx) / sqrt(deny), 8)).as("corr"))
  }

  /** Seasonal profile: mean value per (group, season bucket) as an
    * INDEX against the group's overall mean (1.0 = no seasonality).
    * Means are exact-DECIMAL-sum / count doubles; the index is their
    * ratio — one grouped aggregation plus a group-total join. Output:
    * group, season, n, season_mean, season_index (8dp). */
  def seasonalProfile(df: DataFrame, groupCol: String, seasonCol: Column,
      valueCol: String): DataFrame = {
    val x = col(valueCol).cast("decimal(18,2)")
    val per = df.where(col(valueCol).isNotNull)
      .groupBy(col(groupCol).as("g"), seasonCol.as("season"))
      .agg(count(lit(1)).as("n"), sum(x).as("s"))
    val tot = per.groupBy(col("g"))
      .agg(sum(col("n")).as("tn"), sum(col("s")).as("ts"))
    val seasonMean = col("s").cast("double") / col("n").cast("double")
    val totalMean = col("ts").cast("double") / col("tn").cast("double")
    per.join(broadcast(tot), "g")
      .select(col("g").as(groupCol), col("season"), col("n"),
        round(seasonMean, 8).as("season_mean"),
        when(totalMean > 0.0, round(seasonMean / totalMean, 8))
          .as("season_index"))
  }
}
