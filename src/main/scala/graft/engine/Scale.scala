package graft.engine

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

/** Numeric feature scaling — the trainer-facing normalization tier next
  * to the categorical encoders (Encode): min-max to [0,1] and the
  * median/IQR robust scaler, both per-group so one plan serves the
  * per-segment normalization a real feature pipeline wants (pass a
  * constant group for the global form).
  *
  * Scale shape (both): ONE narrow group-keyed aggregation builds the
  * per-group statistics (map-side partials; group-count-sized result),
  * broadcast join back, map-side arithmetic — the fact table never
  * shuffles, exactly the Encode map-back shape. The robust scaler's
  * quantiles ride [[Percentiles.pct]], so `spark.graft.percentile.approx`
  * swaps the exact value-multiset cut for the bounded-memory GK sketch
  * at 100 TB (same plan shape, the flag's documented contract).
  *
  * Determinism: min/max/percentile are order-free statistics; the final
  * scaled value is one double expression written identically in the
  * oracle and rounded to the shared 8dp grid. A zero range/IQR
  * (constant group) yields NULL, never an ANSI divide-by-zero.
  */
object Scale {

  /** Per-group min-max scaling: (x − min) / (max − min), NULL for
    * constant groups and NULL inputs. Output: input columns +
    * `outCol`. */
  def minMaxScale(df: DataFrame, valueCol: String, byCol: String,
      outCol: String = "scaled"): DataFrame = {
    require(!df.columns.contains(outCol),
      s"input already has a '$outCol' column — pass a different outCol")
    val x = col(valueCol).cast("double")
    val stats = df.where(col(valueCol).isNotNull)
      .groupBy(col(byCol))
      .agg(min(x).as("__mn"), max(x).as("__mx"))
    df.join(broadcast(stats), Seq(byCol), "left")
      .withColumn(outCol,
        round((x - col("__mn")) /
          when(col("__mx") =!= col("__mn"), col("__mx") - col("__mn")), 8))
      .drop("__mn", "__mx")
  }

  /** Per-group robust scaling: (x − median) / IQR — the
    * outlier-insensitive scaler (sklearn RobustScaler shape; the same
    * quartile machinery as the IQR imputation tier). NULL for
    * zero-IQR groups and NULL inputs. Output: input columns +
    * `outCol`. */
  def robustScale(df: DataFrame, valueCol: String, byCol: String,
      outCol: String = "scaled"): DataFrame = {
    require(!df.columns.contains(outCol),
      s"input already has a '$outCol' column — pass a different outCol")
    val spark = df.sparkSession
    val x = col(valueCol).cast("double")
    val stats = df.where(col(valueCol).isNotNull)
      .groupBy(col(byCol))
      .agg(
        Percentiles.pct(spark, x, lit(0.25)).as("__q1"),
        Percentiles.pct(spark, x, lit(0.5)).as("__med"),
        Percentiles.pct(spark, x, lit(0.75)).as("__q3"))
    df.join(broadcast(stats), Seq(byCol), "left")
      .withColumn(outCol,
        round((x - col("__med")) /
          when(col("__q3") =!= col("__q1"), col("__q3") - col("__q1")), 8))
      .drop("__q1", "__med", "__q3")
  }
}
