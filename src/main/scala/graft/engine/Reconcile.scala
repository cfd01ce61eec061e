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

  /** Iterative proportional fitting / raking (Deming & Stephan 1940):
    * scale the (row, col) cell weights so both margins match given
    * targets — the survey-weighting classic behind post-stratification
    * and contingency-table standardization. Each round: one row-margin
    * scaling then one column-margin scaling, each a margin aggregation
    * over the BOUNDED cell grid + a broadcast map-back; `rounds` is a
    * fixed literal (the IRLS convention — determinism over adaptive
    * stopping).
    *
    * Weights stay on the 8dp grid after every scaling (one rounded
    * double ratio per cell per half-round, identical expression tree on
    * both engines); margin sums are DECIMAL (order-free). Cells whose
    * current margin is 0 keep weight 0 (0/0 guards to 0 — mass cannot
    * be created on an empty margin).
    *
    * Target coverage is REQUIRED: a cell whose row or column key has no
    * target raises in-plan (the srmCheck unmodelled-arm stance — an
    * inner join here would silently vanish that cell's mass from the
    * raking). The converse — a target key with no observed cells — is
    * NOT an error: IPF simply cannot move mass onto an empty margin
    * (the 0-margin guard above), the shortfall is visible in the output
    * margins, and standard raking practice treats structurally-empty
    * cells as fixed zeros. Output per cell: rowCol, colCol, weight. */
  def ipfRaking(cells: DataFrame, rowCol: String, colCol: String,
      weightCol: String, rowTargets: DataFrame, colTargets: DataFrame,
      rounds: Int): DataFrame = {
    require(rounds >= 1 && rounds <= 20, s"ipfRaking: rounds=$rounds")
    import org.apache.spark.sql.expressions.Window
    // targets join ONCE before the loop and ride along as columns; each
    // half-round's margin is then a WINDOW over the cell grid, never a
    // self-join of the frame against its own aggregation — a join-based
    // margin would duplicate the lineage each half-round and the plan
    // would grow 2^(2·rounds) subtrees (a real OOM, caught by the
    // convergence drill at rounds = 8)
    val rt = broadcast(rowTargets.select(col(rowCol),
      col("target").cast("double").as("__rt")))
    val ct = broadcast(colTargets.select(col(colCol),
      col("target").cast("double").as("__ct")))
    def scaleBy(df: DataFrame, key: String, tCol: String): DataFrame = {
      val ms = sum(col("__w").cast("decimal(38,8)"))
        .over(Window.partitionBy(col(key)))
      df.withColumn("__ms", ms)
        .withColumn("__w",
          when(col("__ms").cast("double") > 0.0,
            round(col("__w") * col(tCol) /
              col("__ms").cast("double"), 8)).otherwise(lit(0.0)))
        .drop("__ms")
    }
    val start = cells.select(col(rowCol), col(colCol),
        round(col(weightCol).cast("double"), 8).as("__w"))
      .join(rt, Seq(rowCol), "left").join(ct, Seq(colCol), "left")
      .select(col(rowCol), col(colCol), col("__w"),
        when(col("__rt").isNull, raise_error(concat(
          lit("ipfRaking: no row target for "),
          col(rowCol).cast("string"))))
          .otherwise(col("__rt")).as("__rt"),
        when(col("__ct").isNull, raise_error(concat(
          lit("ipfRaking: no col target for "),
          col(colCol).cast("string"))))
          .otherwise(col("__ct")).as("__ct"))
    val done = (1 to rounds).foldLeft(start) { (df, _) =>
      scaleBy(scaleBy(df, rowCol, "__rt"), colCol, "__ct")
    }
    done.select(col(rowCol), col(colCol), col("__w").as("weight"))
  }
}
