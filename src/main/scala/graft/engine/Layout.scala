package graft.engine

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/** Multi-dimensional data layout: Z-order (Morton) clustering for
  * min/max-stat data skipping.
  *
  * Why this matters at 100 TB: parquet scans prune row groups / files by
  * column min/max statistics. Sorting by ONE column gives tight ranges on
  * that column and full-range stats on every other — predicates on a
  * second dimension prune nothing. Interleaving the bits of two columns
  * and range-partitioning on the interleaved key gives every output file
  * a compact 2-D tile, so min/max stats are tight on BOTH columns and
  * predicates on EITHER dimension skip most files (the layout trick
  * behind Delta/Iceberg Z-ORDER clustering; Morton 1966).
  *
  * Determinism contract: the interleave is pure integer bit arithmetic
  * over the low `bits` of each (non-negative) input — reproducible in any
  * engine with shifts and AND, so the DuckDB oracle replays it exactly.
  */
object Layout {

  /** Z-value: bit-interleave of the low `bits` of two NON-NEGATIVE
    * integer columns (x in even positions, y in odd). Codegen-friendly —
    * a flat sum of shift/mask terms, no UDF. */
  def zValue(x: Column, y: Column, bits: Int = 16): Column = {
    require(bits >= 1 && bits <= 31, "bits must be in [1, 31]")
    val xl = x.cast("long")
    val yl = y.cast("long")
    (0 until bits).map { b =>
      shiftleft(shiftright(xl, b).bitwiseAND(lit(1L)), 2 * b) +
        shiftleft(shiftright(yl, b).bitwiseAND(lit(1L)), 2 * b + 1)
    }.reduce(_ + _)
  }

  /** Z-order-clustered parquet write: range-partition into `nFiles` on
    * the interleaved key, sort within partitions, drop the key. Each
    * output file then covers one compact tile of (xCol, yCol) space —
    * the reader prunes by footer min/max on either column. */
  def zorderWrite(df: DataFrame, xCol: String, yCol: String,
      nFiles: Int, path: String, bits: Int = 16): Unit =
    df.withColumn("__z", zValue(col(xCol), col(yCol), bits))
      .repartitionByRange(nFiles, col("__z"))
      .sortWithinPartitions("__z")
      .drop("__z")
      .write.mode("overwrite").parquet(path)

  /** Small-file compaction: rewrite a fragmented table (the residue of
    * incremental/streaming ingest — thousands of tiny files whose open
    * and footer cost dominates the scan) into `nFiles` parquet files,
    * 1-D-clustered on `sortCols` when given so footer min/max prune range
    * predicates on the leading column ([[zorderWrite]] is the 2-D twin).
    *
    * `nFiles` is the caller's target (corpus bytes / desired file size —
    * the same sizing arithmetic every table-maintenance job does); the
    * optional `maxRecordsPerFile` caps stragglers when the range
    * partitioning is skewed. One shuffle, no driver-side row handling. */
  def compactWrite(df: DataFrame, path: String, nFiles: Int,
      sortCols: Seq[String] = Nil, maxRecordsPerFile: Long = 0L): Unit = {
    require(nFiles >= 1, s"compactWrite: nFiles=$nFiles")
    val arranged =
      if (sortCols.nonEmpty)
        df.repartitionByRange(nFiles, sortCols.map(col): _*)
          .sortWithinPartitions(sortCols.map(col): _*)
      else df.repartition(nFiles)
    val writer = arranged.write.mode("overwrite")
    val capped =
      if (maxRecordsPerFile > 0L)
        writer.option("maxRecordsPerFile", maxRecordsPerFile)
      else writer
    capped.parquet(path)
  }
}
