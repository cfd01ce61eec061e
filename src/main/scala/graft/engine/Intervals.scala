package graft.engine

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._
import org.apache.spark.sql.expressions.Window

/** Interval-overlap analytics over event streams: the classic
  * sweep-line / +1−1 prefix-sum formulation of "how many intervals are
  * live at once" (max sessions in flight, peak connection counts, room
  * occupancy — the capacity question every operational dashboard asks).
  */
object Intervals {

  /** Merge overlapping/touching intervals per group into islands
    * (gaps-and-islands with a running-max boundary) and report coverage:
    * the "how much wall-clock was this tenant actually busy" question a
    * plain SUM of durations double-counts whenever intervals overlap.
    *
    * An island breaks where the next start exceeds the running max of
    * all previous ends (NOT the previous row's end — an early long
    * interval can span many later short ones). Touching intervals
    * (s == prev max e) merge, matching the half-open [s, e) reading.
    *
    * Scale shape: one group-partitioned sort (the one sort-bound step),
    * island ids by prefix sum, two keyed aggregations. Inverted inputs
    * are rejected in-plan like [[maxConcurrency]].
    * Output: groupCol, n_intervals, n_islands, covered (Σ island
    * lengths), longest (max island length) — in the input units. */
  def mergeCoverage(df: DataFrame, groupCol: String, startCol: String,
      endCol: String): DataFrame = {
    val guarded = df.withColumn("__s", boundaryGuard(groupCol, startCol, endCol))
      .select(col(groupCol), col("__s"), col(endCol).as("__e"))
    val w = Window.partitionBy(col(groupCol))
      .orderBy(col("__s"), col("__e"))
    val prevMax = max(col("__e"))
      .over(w.rowsBetween(Window.unboundedPreceding, -1))
    val brk = when(prevMax.isNull || col("__s") > prevMax, 1L).otherwise(0L)
    guarded
      .withColumn("__brk", brk)
      .withColumn("__isl", sum(col("__brk"))
        .over(w.rowsBetween(Window.unboundedPreceding, Window.currentRow)))
      .groupBy(col(groupCol), col("__isl"))
      .agg(count(lit(1)).as("__n"), min(col("__s")).as("__is"),
        max(col("__e")).as("__ie"))
      .groupBy(col(groupCol))
      .agg(sum(col("__n")).as("n_intervals"),
        count(lit(1)).as("n_islands"),
        sum(col("__ie") - col("__is")).as("covered"),
        max(col("__ie") - col("__is")).as("longest"))
  }

  /** Shared malformed-interval guard: inverted (end < start) AND null
    * boundaries raise in-plan. Nulls matter because the sweep's running
    * window sorts them NULLS FIRST in Spark but NULLS LAST in the SQL
    * oracle — a null row would silently deflate the prefix sums on one
    * engine and inflate them on the other (review-found), while the
    * contract here is "rejected, never silently skewed". */
  private def boundaryGuard(groupCol: String,
      startCol: String, endCol: String): org.apache.spark.sql.Column =
    when(col(startCol).isNull || col(endCol).isNull,
      raise_error(concat(lit("intervals: null boundary for group "),
        col(groupCol).cast("string"))))
      .when(col(endCol) < col(startCol),
        raise_error(concat(lit("intervals: end < start for group "),
          col(groupCol).cast("string"))))
      .otherwise(col(startCol))

  /** Peak concurrency per group over half-open intervals [start, end):
    * each interval contributes +1 at its start and −1 at its end, both
    * deltas at one boundary instant are NETTED before the running sum
    * (so the state is only observed BETWEEN instants — no intra-instant
    * ordering ambiguity, and end-meets-start at the same microsecond
    * does not double-count), and the peak is the max prefix sum.
    *
    * Scale shape: one map-side unpivot (2 rows per interval), one
    * (group, t) pre-aggregation that collapses the running-sum input to
    * DISTINCT boundary instants, then a window partitioned by GROUP —
    * the sort is per-group over boundary counts, not raw events. A
    * single global timeline would be a one-partition sort; callers
    * partition by a real dimension (tenant, type, day-with-overlap) as
    * this signature forces.
    *
    * Malformed inputs (inverted or null boundaries) are rejected by
    * [[boundaryGuard]] rather than silently skewing peaks.
    *
    * Output: groupCol, peak (max concurrent), peak_at (first boundary
    * instant, in the units of `startCol`/`endCol`, at which the peak is
    * reached). */
  def maxConcurrency(df: DataFrame, groupCol: String, startCol: String,
      endCol: String): DataFrame = {
    val guarded = df.withColumn("__s", boundaryGuard(groupCol, startCol, endCol))
    val deltas = guarded.select(col(groupCol), col("__s").as("t"), lit(1L).as("d"))
      .unionByName(guarded.select(col(groupCol), col(endCol).as("t"),
        lit(-1L).as("d")))
    val net = deltas.groupBy(col(groupCol), col("t"))
      .agg(sum(col("d")).as("net"))
    val cum = sum(col("net")).over(
      Window.partitionBy(col(groupCol)).orderBy(col("t"))
        .rowsBetween(Window.unboundedPreceding, Window.currentRow))
    val peak = max(col("cum")).over(Window.partitionBy(col(groupCol)))
    net.withColumn("cum", cum)
      .withColumn("peak", peak)
      .where(col("cum") === col("peak"))
      .groupBy(col(groupCol))
      .agg(max(col("peak")).as("peak"), min(col("t")).as("peak_at"))
  }
}
