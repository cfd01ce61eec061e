package graft.engine

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/** Scalar column derivations from the reference's transform/extract stages.
  *
  * Every one of these is a stock Catalyst expression — whole-stage-codegen'd,
  * null-propagating, and pushdown-transparent. The reference does each of
  * them as a row-wise Python lambda (`df.apply`); here they stay inside the
  * generated code of a single `Project`, so a 100 TB scan pays no
  * interpreter or shuffle cost for any of them.
  */
object Derive {

  /** E3 (`extract.py:348`): leading-substring code extract + integer cast,
    * e.g. departement = first 2 chars of the IRIS code. */
  def substrCode(c: Column, pos: Int, len: Int): Column =
    substring(c, pos, len).cast("long")

  /** E5 (`extract.py:351`): space-joined composite key (full address). */
  def concatKey(cols: Column*): Column = concat_ws(" ", cols: _*)

  /** E10 (`extract.py:458-459`): vectorized upper — just Catalyst `Upper`. */
  def toUpper(c: Column): Column = upper(c)

  /** T3 (`transform.py:146-160`): strip every non-digit character. */
  def digitsOnly(c: Column): Column = regexp_replace(c, "\\D", "")

  /** T4 (`transform.py:163-181`): unit upscale (MWh→kWh) from the first
    * existing candidate column, literal -1 when none exists. The column
    * choice is a plan-build-time decision, exactly like the reference's
    * `if input in df.columns` — not a per-row branch. */
  def scaledFromFirstExisting(df: DataFrame, candidates: Seq[String],
      factor: Double): Column =
    candidates.find(df.columns.contains)
      .map(c => col(c) * lit(factor))
      .getOrElse(lit(-1.0))

  /** T5 (`transform.py:184-193`): zero→null guard then divide; Spark's `/`
    * yields null on null denominator, reproducing pandas' NaN propagation. */
  def safeRatio(num: Column, denom: Column): Column =
    num / when(denom === 0, lit(null)).otherwise(denom)

  /** T6 (`transform.py:196-213`): absolute and signed differences. */
  def absDiff(a: Column, b: Column): Column = abs(a - b)
  def signedDiff(a: Column, b: Column): Column = a - b

  /** E11 (`extract.py:579`, `transform.py:371`): literal batch-id stamp. */
  def withBatchId(df: DataFrame, batchId: String): DataFrame =
    df.withColumn("batch_id", lit(batchId))

  /** Wide→long reshape (pandas `melt` — the dual of pivot): one output
    * row per (id row, value column). Spark's native `unpivot` plans this
    * as a single map-only Expand (no shuffle, no UNION of self-scans —
    * one pass over the input however many columns melt). Value columns
    * must share a type; numeric inputs are cast to double here. */
  def melt(df: DataFrame, idCols: Seq[String], valueCols: Seq[String],
      varName: String = "variable", valueName: String = "value"): DataFrame =
    df.select(idCols.map(col) ++
        valueCols.map(c => col(c).cast("double").as(c)): _*)
      .unpivot(idCols.map(col).toArray, valueCols.map(col).toArray,
        varName, valueName)
}
