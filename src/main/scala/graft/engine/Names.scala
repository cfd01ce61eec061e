package graft.engine

import java.text.Normalizer

import org.apache.spark.sql.DataFrame

/** Column-name hygiene (reference `utils/fonctions.py:59-73`):
  * unicode→ascii fold, non-alphanumeric runs → `_`, lowercase (U1), plus
  * alphabetical column re-ordering (U2) and bulk suffixing (E8,
  * `extract.py:506,527-528`).
  *
  * All of these are driver-side metadata rewrites: the resulting plan is a
  * bare `Project` over the scan, so they cost nothing at any data scale.
  */
object Names {

  /** U1: ascii-fold + `[^0-9a-zA-Z]+` → `_` + lowercase. Idempotent. */
  def normalize(name: String): String = {
    val folded = Normalizer.normalize(name, Normalizer.Form.NFKD)
      .replaceAll("\\p{M}+", "")
    folded.replaceAll("[^0-9a-zA-Z]+", "_").toLowerCase
  }

  def normalizeColumns(df: DataFrame): DataFrame =
    df.toDF(df.columns.map(normalize).toIndexedSeq: _*)

  /** U2: columns in alphabetical order (`utils/fonctions.py:69-73`). */
  def sortColumns(df: DataFrame): DataFrame =
    df.select(df.columns.sorted.map(df.col).toIndexedSeq: _*)

  /** E8: suffix every column, the reference's poor-man's join namespacing. */
  def withSuffix(df: DataFrame, suffix: String): DataFrame =
    df.toDF(df.columns.map(_ + suffix).toIndexedSeq: _*)

  /** E2: targeted renames; columns absent from the map pass through. */
  def rename(df: DataFrame, mapping: Map[String, String]): DataFrame =
    df.withColumnsRenamed(mapping)
}
