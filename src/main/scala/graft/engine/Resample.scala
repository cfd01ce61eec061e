package graft.engine

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/** Time-series regularization: resample irregular events onto a fixed
  * epoch-aligned grid and forward-fill the gaps — the standard shape for
  * turning an event stream into model-ready fixed-step features
  * (pandas' `resample().ffill()`, beyond the reference's surface).
  *
  * Scale design (100 TB):
  *   - The per-bucket representative is a keep-last window over (key,
  *     bucket) — same shuffle as any per-key window; explicit (ts, id)
  *     tiebreak keeps it deterministic under any partitioning.
  *   - The spine is generated per key from that key's own [min, max]
  *     bucket range (`sequence` + `explode`) — never a global calendar
  *     cross-join; a key's spine length is its own activity span.
  *   - The forward fill is one running `last(ignoreNulls)` window on the
  *     already-bucketed rows — linear, one shuffle, the same running-state
  *     trick as the as-of join.
  */
object Resample {

  /** Resample `df` onto a `stepUs`-wide grid per `keys`: one row per
    * (key, bucket) between each key's first and last event, carrying the
    * LAST observed `valueCol` in the bucket (ties broken by `usCol` then
    * `idCol` descending — latest wins), forward-filled across empty
    * buckets into `<valueCol>_ffill`.
    *
    * `usCol` must be epoch microseconds (long, non-negative — integral
    * truncation equals floor there, and the grid stays exact where double
    * arithmetic would round past 2^52).
    */
  def resampleFfill(df: DataFrame, keys: Seq[String], usCol: String,
      idCol: String, valueCol: String, stepUs: Long): DataFrame = {
    require(stepUs > 0, s"stepUs=$stepUs")
    val bucket = (col(usCol) - pmod(col(usCol), lit(stepUs))).as("__bucket")
    val based = df.select(
      keys.map(col) ++ Seq(col(usCol), col(idCol), col(valueCol), bucket): _*)
    // one representative per (key, bucket): the latest event in the bucket
    val wLast = Window.partitionBy((keys :+ "__bucket").map(col): _*)
      .orderBy(col(usCol).desc, col(idCol).desc)
    val points = based.withColumn("__rn", row_number().over(wLast))
      .where(col("__rn") === 1)
      .select(keys.map(col) ++ Seq(col("__bucket"), col(valueCol)): _*)
    // per-key spine across that key's own activity span
    val spine = based.groupBy(keys.map(col): _*)
      .agg(min(col("__bucket")).as("__lo"), max(col("__bucket")).as("__hi"))
      .select(keys.map(col) :+
        explode(sequence(col("__lo"), col("__hi"), lit(stepUs)))
          .as("__bucket"): _*)
    val wFill = Window.partitionBy(keys.map(col): _*).orderBy(col("__bucket"))
      .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    spine.join(points, keys :+ "__bucket", "left")
      .withColumn(s"${valueCol}_ffill",
        last(col(valueCol), ignoreNulls = true).over(wFill))
      .drop(valueCol)
      .withColumnRenamed("__bucket", "bucket_us")
  }

  /** Linear-interpolation sibling of [[resampleFfill]] (pandas
    * `resample().interpolate()`): empty buckets take the straight line
    * between the surrounding observed buckets instead of holding the
    * last value — the right regularization for continuously-varying
    * measurements (a forward fill staircases them).
    *
    * Same bucket/spine/shuffle shape; the fill step is two running
    * windows (previous and next observed point) over the one per-key
    * sort. The spine's endpoints are observed by construction (the
    * spine spans each key's own [min, max] observed bucket), so neither
    * neighbor is ever missing. The carried (bucket, value) scalars are
    * null exactly together (both derive from "value observed" rows), so
    * the separate-window stitch hazard does not apply.
    *
    * Exactness: a double lerp rounds half-values differently across
    * engines (binary-exact midpoints at the 8th digit DID diverge —
    * 9 rows at sf0.01), so the line is evaluated on the integer
    * cent × bucket-hop grid instead: numer = pv·(H−h) + nv·h in cents,
    * result = floor((2·numer·1e8 + 100H) / (200H)) / 1e8 — round-half-
    * toward-+inf for ANY sign. The scaled numerator rides DECIMAL (a
    * Long would overflow past |cents|·hops ≈ 4.6e10 — review-found),
    * and the floor uses the portable `(x − pmod(x,w)) div w` form
    * because Spark's `div` truncates toward zero while DuckDB's `//`
    * floors — they differ on negative values (review-found; the house
    * floor-div rule). Observed values pass through exact (raw double).
    * Bound: |value| < 1e16 (the DECIMAL(18,2) cent cast), and
    * |cents|·gap-hops must fit a Long (≲9e18); under ANSI mode an
    * overflowing cast raises rather than nulling. Both neighbor fields
    * (__pv AND __pb) key on the same __vc nullability so a non-ANSI
    * overflow can never pair one point's value with another's bucket
    * (review-found desync hazard). */
  def resampleInterp(df: DataFrame, keys: Seq[String], usCol: String,
      idCol: String, valueCol: String, stepUs: Long): DataFrame = {
    require(stepUs > 0, s"stepUs=$stepUs")
    val bucket = (col(usCol) - pmod(col(usCol), lit(stepUs))).as("__bucket")
    val based = df.select(
      keys.map(col) ++ Seq(col(usCol), col(idCol), col(valueCol), bucket): _*)
    val wLast = Window.partitionBy((keys :+ "__bucket").map(col): _*)
      .orderBy(col(usCol).desc, col(idCol).desc)
    val points = based.withColumn("__rn", row_number().over(wLast))
      .where(col("__rn") === 1)
      .select(keys.map(col) ++ Seq(col("__bucket"), col(valueCol),
        (col(valueCol).cast("decimal(18,2)") * 100).cast("long").as("__vc")): _*)
    val spine = based.groupBy(keys.map(col): _*)
      .agg(min(col("__bucket")).as("__lo"), max(col("__bucket")).as("__hi"))
      .select(keys.map(col) :+
        explode(sequence(col("__lo"), col("__hi"), lit(stepUs)))
          .as("__bucket"): _*)
    val base = Window.partitionBy(keys.map(col): _*).orderBy(col("__bucket"))
    val wPrev = base.rowsBetween(Window.unboundedPreceding, Window.currentRow)
    val wNext = base.rowsBetween(Window.currentRow, Window.unboundedFollowing)
    val v = col(valueCol)
    spine.join(points, keys :+ "__bucket", "left")
      .withColumn("__pv", last(col("__vc"), ignoreNulls = true).over(wPrev))
      .withColumn("__pb",
        last(when(col("__vc").isNotNull, col("__bucket")), ignoreNulls = true)
          .over(wPrev))
      .withColumn("__nv", first(col("__vc"), ignoreNulls = true).over(wNext))
      .withColumn("__nb",
        first(when(col("__vc").isNotNull, col("__bucket")), ignoreNulls = true)
          .over(wNext))
      // hop counts on the bucket grid: h in [0, H], H ≥ 1 on gap rows
      .withColumn("__hop", expr(s"(__bucket - __pb) div $stepUs"))
      .withColumn("__hops", expr(s"(__nb - __pb) div $stepUs"))
      .withColumn("__numer",
        col("__pv") * (col("__hops") - col("__hop")) + col("__nv") * col("__hop"))
      .withColumn("__num2",
        col("__numer").cast("decimal(26,0)") *
          lit(200000000L).cast("decimal(9,0)") + lit(100) * col("__hops"))
      .withColumn("__den2", lit(200) * col("__hops"))
      .withColumn(s"${valueCol}_interp",
        when(v.isNotNull, v)
          .otherwise(
            expr("(__num2 - pmod(__num2, __den2)) div __den2")
              .cast("double") / lit(100000000.0)))
      .select(keys.map(col) ++ Seq(col("__bucket").as("bucket_us"),
        col(s"${valueCol}_interp")): _*)
  }
}
