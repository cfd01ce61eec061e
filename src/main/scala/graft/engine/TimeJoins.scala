package graft.engine

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/** Time-relationship joins over event streams — beyond the reference's
  * equi-join surface (its joins are all single-key equi, SURVEY §2 J1–J4),
  * these are the two temporal join shapes a large-scale event/training-data
  * pipeline needs: backward as-of ("latest right row at or before each left
  * row") and bounded range self-join ("pairs within Δt").
  *
  * Scale design (100 TB):
  *   - The as-of join is NOT a range join with a top-1: that formulation
  *     explodes candidates quadratically per key. Instead both sides are
  *     unioned and sorted once per partition key, and a running
  *     `last(ignoreNulls)` window carries the most recent right row forward —
  *     ONE shuffle on the partition keys, linear work, no candidate blowup.
  *     Skewed/hot keys: sub-bucket by coarse time range and carry boundary
  *     rows, same trick as sessionization.
  *   - The range self-join buckets time by the window width Δ: a pair within
  *     Δ always lands in the same or adjacent bucket, so candidates come from
  *     an equi-join on (keys, bucket) — shuffle-partitionable, skew handled
  *     by AQE — and the exact predicate filters the 2Δ candidate band down.
  *     Candidate count is |rows-per-bucket|² per key, bounded by Δ, never
  *     |rows-per-key|².
  */
object TimeJoins {

  /** Backward (inclusive) as-of join: for every left row, attach the latest
    * right row with `right.tsCol <= left.tsCol` within the same `partKeys`.
    *
    * `rightCols` are carried over, renamed `prefix + name`; rows of equal
    * timestamp on the right side are tie-broken by the FIRST rightCol
    * (ascending, last wins) so results are deterministic.
    */
  def asofJoinBackward(left: DataFrame, right: DataFrame,
      partKeys: Seq[String], tsCol: String,
      rightCols: Seq[String], prefix: String = "matched_"): DataFrame = {
    require(rightCols.nonEmpty, "asofJoinBackward needs at least one rightCol")
    val matched = rightCols.map(prefix + _)
    // The whole right payload rides in ONE struct: per-column
    // last(ignoreNulls) folds would stitch fields from DIFFERENT right
    // rows whenever a real payload field is null (the filler nulls on
    // left rows are indistinguishable from data nulls). The struct is
    // non-null exactly for right rows, so one last(ignoreNulls) carries
    // the matched row atomically, null payload fields included.
    val r = right.select(
      (partKeys :+ tsCol).map(col) ++
        rightCols.zip(matched).map { case (c, m) => col(c).as(m) }: _*)
      .withColumn("__p", struct(matched.map(col): _*))
      .withColumn("__side", lit(0))
    val l = left.withColumn("__side", lit(1))
    // Right rows sort before left rows at equal ts (inclusive match);
    // equal-ts right rows totally ordered by their payload columns.
    val w = Window
      .partitionBy(partKeys.map(col): _*)
      .orderBy(col(tsCol).asc +: col("__side").asc +:
        matched.map(col(_).asc_nulls_first): _*)
      .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    val withMatch = l.unionByName(r, allowMissingColumns = true)
      .withColumn("__p", last(col("__p"), ignoreNulls = true).over(w))
    matched.foldLeft(withMatch.where(col("__side") === 1)) {
      (d, m) => d.withColumn(m, col(s"__p.$m"))
    }.drop("__side", "__p")
  }

  /** Forward (inclusive) as-of join: for every left row, attach the EARLIEST
    * right row with `right.tsCol >= left.tsCol` within the same `partKeys` —
    * the mirror of [[asofJoinBackward]], same union + single-window design
    * (one shuffle, linear work, no per-key candidate blowup).
    *
    * Equal-timestamp right rows are tie-broken by the payload columns
    * ascending (first wins) so results are deterministic.
    */
  def asofJoinForward(left: DataFrame, right: DataFrame,
      partKeys: Seq[String], tsCol: String,
      rightCols: Seq[String], prefix: String = "matched_"): DataFrame = {
    require(rightCols.nonEmpty, "asofJoinForward needs at least one rightCol")
    val matched = rightCols.map(prefix + _)
    // Same atomic-payload trick as the backward join: the whole right row
    // rides in one struct so a single first(ignoreNulls) can't stitch
    // fields from different right rows when payload fields are null.
    val r = right.select(
      (partKeys :+ tsCol).map(col) ++
        rightCols.zip(matched).map { case (c, m) => col(c).as(m) }: _*)
      .withColumn("__p", struct(matched.map(col): _*))
      .withColumn("__side", lit(1))
    val l = left.withColumn("__side", lit(0))
    // Left rows sort before right rows at equal ts, so the forward-looking
    // window (current row → end) still sees the equal-ts right row
    // (inclusive match); equal-ts right rows totally ordered by payload.
    val w = Window
      .partitionBy(partKeys.map(col): _*)
      .orderBy(col(tsCol).asc +: col("__side").asc +:
        matched.map(col(_).asc_nulls_first): _*)
      .rowsBetween(Window.currentRow, Window.unboundedFollowing)
    val withMatch = l.unionByName(r, allowMissingColumns = true)
      .withColumn("__p", first(col("__p"), ignoreNulls = true).over(w))
    matched.foldLeft(withMatch.where(col("__side") === 0)) {
      (d, m) => d.withColumn(m, col(s"__p.$m"))
    }.drop("__side", "__p")
  }

  /** Bounded range self-join: all ordered pairs of rows sharing `partKeys`
    * whose `usCol` (epoch microseconds, long) values are within `withinUs`
    * of each other. Pair order is (earlier, later), ties broken by `idCol`,
    * each qualifying pair emitted exactly once.
    *
    * Output: partKeys, `<idCol>_1`, `<idCol>_2`, `gap_us`.
    */
  def rangeSelfJoin(df: DataFrame, partKeys: Seq[String], usCol: String,
      idCol: String, withinUs: Long): DataFrame = {
    require(withinUs > 0, "withinUs must be positive")
    val base = df.select((partKeys ++ Seq(usCol, idCol)).map(col): _*)
    // exact long floor-division: double division would round us/Δ for
    // |us| > 2^52 and mis-bucket boundary rows (pmod makes the numerator
    // an exact multiple, so integral `div` truncation IS floor)
    val bucket: Column =
      expr(s"(`$usCol` - pmod(`$usCol`, $withinUs)) div $withinUs")
    // earlier side keeps its own bucket; later side fans out to its bucket
    // and the previous one, so every within-Δ pair meets on exactly one key
    val a = base.withColumn("__b", bucket)
      .withColumnsRenamed(Map(usCol -> "__us1", idCol -> "__id1"))
    val b = base.withColumn("__b", explode(array(bucket, bucket - 1)))
      .withColumnsRenamed(Map(usCol -> "__us2", idCol -> "__id2"))
    a.join(b, partKeys :+ "__b")
      .where((col("__us1") < col("__us2")) ||
        (col("__us1") === col("__us2") && col("__id1") < col("__id2")))
      .where(col("__us2") - col("__us1") <= lit(withinUs))
      .select(partKeys.map(col) ++ Seq(
        col("__id1").as(s"${idCol}_1"), col("__id2").as(s"${idCol}_2"),
        (col("__us2") - col("__us1")).as("gap_us")): _*)
  }
}
