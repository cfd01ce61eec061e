package graft.engine

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/** Declarative data-quality verification (the Deequ shape): a suite of
  * column constraints checked in ONE aggregation pass over the table —
  * the production extension of the reference's pre-flight schema assert
  * (`extract.py:317-331` checks required columns present and input
  * non-empty; a deployed pipeline also wants value-level invariants
  * before it loads).
  *
  * Every metric is a ratio/extreme of exact counts from a single
  * `agg(...)` (map-side partials, no join, no second scan — PlanSpec
  * locks the single-scan shape), then the scalar verdict row set is
  * exploded from that one aggregated row. Adding a constraint adds an
  * aggregate expression, never a pass. */
object Quality {

  /** One column constraint: `metric` aggregates to a double, `passed` =
    * metric within [lo, hi] (inclusive). */
  final case class Check(name: String, column: String, metric: Column,
      lo: Double, hi: Double)

  /** Degenerate-base guard (ANSI-safe, the jsDivergence convention): a
    * zero denominator yields a NULL metric — which [[verify]] turns into
    * a failed verdict — instead of an ANSI divide-by-zero error. */
  private def rate(num: Column, denom: Column): Column =
    when(denom =!= 0L, num.cast("double") / denom.cast("double"))

  /** Fraction of rows with `c` non-null. */
  def completeness(c: String): Column =
    rate(sum(when(col(c).isNotNull, 1L).otherwise(0L)), count(lit(1)))

  /** Distinct values over rows — 1.0 means the column is a key.
    * (Exact count_distinct: one distinct aggregate per suite keeps the
    * plan a single Expand pass; use approx_count_distinct for a second
    * uniqueness column at scale.) */
  def uniqueness(c: String): Column =
    rate(count_distinct(col(c)), count(lit(1)))

  /** Fraction of non-null values inside the accepted set; NULL (failed)
    * when the column is entirely null. */
  def acceptedValues(c: String, accepted: Seq[String]): Column =
    rate(sum(when(col(c).isin(accepted.map(lit): _*), 1L).otherwise(0L)),
      sum(when(col(c).isNotNull, 1L).otherwise(0L)))

  /** Fraction of non-null values matching an anchored regex; NULL
    * (failed) when the column is entirely null. */
  def patternRate(c: String, regex: String): Column =
    rate(sum(when(regexp_like(col(c).cast("string"), lit(regex)), 1L)
      .otherwise(0L)),
      sum(when(col(c).isNotNull, 1L).otherwise(0L)))

  def minOf(c: String): Column = min(col(c)).cast("double")
  def maxOf(c: String): Column = max(col(c)).cast("double")

  /** Run the suite: one aggregation pass, one verdict row per check.
    * Output: check_name, column_name, metric_value, passed — ordered by
    * check name. */
  def verify(df: DataFrame, checks: Seq[Check]): DataFrame = {
    require(checks.nonEmpty, "empty check suite")
    require(checks.map(_.name).distinct.size == checks.size,
      "check names must be unique")
    val aggd = df.agg(checks.head.metric.as(checks.head.name),
      checks.tail.map(c => c.metric.as(c.name)): _*)
    explodeReport(aggd, checks, Nil)
  }

  /** The suite per group — one verdict row per (group, check), still ONE
    * aggregation pass (now keyed): the per-source / per-partition monitor
    * that localizes which slice of an ingest went bad. */
  def verifyByGroup(df: DataFrame, groupCols: Seq[String],
      checks: Seq[Check]): DataFrame = {
    require(groupCols.nonEmpty, "groupCols must be non-empty")
    require(checks.nonEmpty, "empty check suite")
    require(checks.map(_.name).distinct.size == checks.size,
      "check names must be unique")
    val aggd = df.groupBy(groupCols.map(col): _*)
      .agg(checks.head.metric.as(checks.head.name),
        checks.tail.map(c => c.metric.as(c.name)): _*)
    explodeReport(aggd, checks, groupCols)
  }

  private def explodeReport(aggd: DataFrame, checks: Seq[Check],
      groupCols: Seq[String]): DataFrame = {
    val reports = checks.map { c =>
      struct(lit(c.name).as("check_name"), lit(c.column).as("column_name"),
        col(c.name).as("metric_value"),
        coalesce(col(c.name) >= lit(c.lo) && col(c.name) <= lit(c.hi),
          lit(false)).as("passed"))
    }
    aggd.select(groupCols.map(col) :+ explode(array(reports: _*)).as("r"): _*)
      .select(groupCols.map(col) ++ Seq(col("r.check_name"),
        col("r.column_name"), col("r.metric_value"), col("r.passed")): _*)
      .orderBy(groupCols.map(col) :+ col("check_name"): _*)
  }
}
