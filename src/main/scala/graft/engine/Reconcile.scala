package graft.engine

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

/** Snapshot reconciliation: the audit complement of the engine's
  * idempotent load tier (the reference only APPENDS new keys,
  * `load.py:143-158`; an operator also wants to know what a refreshed
  * extract added, removed, and changed relative to what was loaded —
  * the diff a data-reconciliation report is built from).
  */
object Reconcile {

  /** Row-level diff of two keyed snapshots. Output: the key columns,
    * `change_type` ∈ added|removed|changed, and `changed_cols` (comma-
    * joined names of differing compare columns, in `compareCols` order;
    * null for added/removed). Unchanged rows are omitted — the report is
    * sized by the CHURN, not the table.
    *
    * Scale shape: ONE full-outer shuffle join on the key; presence is
    * tracked with sentinel literals (never by nullness of data columns,
    * which may be legitimately null); per-column change flags are
    * null-safe map-side comparisons. */
  def snapshotDiff(oldDf: DataFrame, newDf: DataFrame, keyCols: Seq[String],
      compareCols: Seq[String]): DataFrame = {
    require(keyCols.nonEmpty && compareCols.nonEmpty,
      "keyCols and compareCols must be non-empty")
    val o = oldDf.select(keyCols.map(col) ++
      compareCols.map(c => col(c).as(s"__o_$c")) :+
      lit(1).as("__in_old"): _*)
    val n = newDf.select(keyCols.map(col) ++
      compareCols.map(c => col(c).as(s"__n_$c")) :+
      lit(1).as("__in_new"): _*)
    val joined = o.join(n, keyCols, "full_outer")
    val diffs = compareCols.map(c =>
      when(!(col(s"__o_$c") <=> col(s"__n_$c")), lit(c)))
    joined.withColumn("change_type",
        when(col("__in_old").isNull, lit("added"))
          .when(col("__in_new").isNull, lit("removed"))
          .when(coalesce(diffs: _*).isNotNull, lit("changed")))
      .filter(col("change_type").isNotNull)
      .withColumn("changed_cols",
        when(col("change_type") === "changed",
          concat_ws(",", diffs: _*)))
      .select(keyCols.map(col) :+ col("change_type") :+
        col("changed_cols"): _*)
  }
}
