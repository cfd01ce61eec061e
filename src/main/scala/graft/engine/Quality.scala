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
  /** robots.txt parse → per-URL crawl decision (REP, RFC 9309): the
    * admission gate every crawl pipeline runs before fetching — "may
    * `agent` fetch this path on this host?". Takes the RAW robots.txt
    * text per host and a URL frame, and answers with the
    * longest-prefix-match rule.
    *
    * Group semantics (RFC 9309 §2.2.1): consecutive `User-agent:` lines
    * at a group's head share its rules; a host that has any group
    * naming `agent` EXACTLY uses ONLY those groups, otherwise the `*`
    * groups; no applicable rule → allowed. Empty `Disallow:` is a
    * no-op. Longest matching prefix wins; at equal length Allow wins
    * (the Google tie convention). Matching is literal prefix only (the
    * `*`/`$` wildcard extension is out of contract, documented).
    *
    * Shape: one posexplode over the robots lines (line numbers give the
    * running-group window, host-partitioned), rules join URLs on the
    * HOST key (never a cross), the winner is one max_by over the
    * bounded per-URL candidate set. Output: host, path, allowed,
    * rule_prefix (NULL when no rule applied). */
  def robotsDecisions(robots: DataFrame, hostCol: String,
      contentCol: String, urls: DataFrame, urlHostCol: String,
      pathCol: String, agent: String): DataFrame = {
    require(agent.nonEmpty && agent != "*",
      s"robotsDecisions: agent='$agent' (pass a concrete agent token)")
    val w = org.apache.spark.sql.expressions.Window
      .partitionBy(col("__h")).orderBy(col("__ln"))
    val lines = robots
      .select(col(hostCol).as("__h"),
        posexplode(split(col(contentCol), "\\r?\\n"))
          .as(Seq("__ln", "__line")))
      .withColumn("__line", trim(col("__line")))
      // strip trailing comments, keep the directive token + value
      .withColumn("__line",
        trim(regexp_replace(col("__line"), "#.*$", "")))
      .withColumn("__kind",
        when(lower(col("__line")).startsWith("user-agent:"), "ua")
          .when(lower(col("__line")).startsWith("disallow:"), "dis")
          .when(lower(col("__line")).startsWith("allow:"), "alw"))
      .withColumn("__val",
        trim(regexp_replace(col("__line"), "^[^:]*:", "")))
      .where(col("__kind").isNotNull)
    // a ua line STARTS a new group unless the previous kept line is
    // also ua (the consecutive-UA head run)
    val grouped = lines
      .withColumn("__prev", lag(col("__kind"), 1).over(w))
      .withColumn("__start",
        when(col("__kind") === "ua" &&
          (col("__prev").isNull || col("__prev") =!= "ua"), 1L)
          .otherwise(0L))
      .withColumn("__grp", sum(col("__start")).over(
        w.rowsBetween(org.apache.spark.sql.expressions.Window
          .unboundedPreceding, 0)))
      .where(col("__grp") > 0)
    val agents = grouped.where(col("__kind") === "ua")
      .groupBy(col("__h"), col("__grp"))
      .agg(max(lower(col("__val")) === agent.toLowerCase).as("__exact"),
        max(col("__val") === "*").as("__star"))
    val hostHasExact = agents.groupBy(col("__h"))
      .agg(max(col("__exact")).as("__has_exact"))
    val applicable = agents.join(hostHasExact, Seq("__h"))
      .where(when(col("__has_exact"), col("__exact"))
        .otherwise(col("__star")))
      .select(col("__h"), col("__grp"))
    val rules = grouped.where(col("__kind") =!= "ua")
      .join(applicable, Seq("__h", "__grp"))
      .where(length(col("__val")) > 0) // empty Disallow/Allow = no-op
      .select(col("__h"), col("__val").as("__prefix"),
        (col("__kind") === "alw").as("__allow"))
    val u = urls.select(col(urlHostCol).as("__h"), col(pathCol).as("path"))
    // LEFT join keeps every URL even when no rule matches its prefix —
    // the winner max_by skips non-matching rows via its NULL ordering
    // key, so "host has rules but none apply" still reports allowed
    u.join(rules, Seq("__h"), "left")
      .withColumn("__hit", col("__prefix").isNotNull &&
        col("path").startsWith(col("__prefix")))
      .groupBy(col("__h").as("host"), col("path"))
      .agg(
        max_by(struct(col("__allow"), col("__prefix")),
          when(col("__hit"),
            // longest prefix wins; Allow outranks Disallow on ties
            struct(length(col("__prefix")).as("l"),
              col("__allow").cast("int").as("a")))).as("__win"))
      .select(col("host"), col("path"),
        coalesce(col("__win.__allow"), lit(true)).as("allowed"),
        col("__win.__prefix").as("rule_prefix"))
  }
}
