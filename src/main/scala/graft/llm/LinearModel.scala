package graft.llm

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

/** Linear-classifier inference over hashed features — the
  * quality-filter scoring pass of a training-data pipeline (the
  * fastText / CCNet-style shape: hash tokens to a fixed dim, dot with a
  * trained weight vector, threshold). Training happens offline; what a
  * 100 TB engine needs is the INFERENCE sweep, and that is exactly
  * dim-bounded work per document:
  *
  *  - features come from [[TextAnalysis.featureHash]] (map-only
  *    tokenize+hash, one (id, bucket) aggregation);
  *  - the weight vector is a dim-row table — broadcast by size, so the
  *    scoring join never shuffles the corpus;
  *  - the margin accumulates in INTEGER micro-units (weights are
  *    fixed-point, tf counts are integers), so the score is exact and
  *    engine-independent — no float dot-product drift, no
  *    transcendentals (the sigmoid is monotone, so thresholding the
  *    margin IS the classifier decision).
  *
  * Weights are (bucket, w_unit) with w_unit an integer in units of
  * 1/65536 — the fixed-point contract that keeps the plan exact.
  */
object LinearModel {

  /** Deterministic fixture weights: w_unit(bucket) =
    * first-4-hex-chars(md5("lw|bucket")) − 32768 ∈ [−32768, 32767] —
    * a reproducible stand-in for trained weights (production loads a
    * trained vector through the same (bucket, w_unit) contract). */
  def fixtureWeights(spark: SparkSession, dim: Int): DataFrame =
    spark.range(dim).select(col("id").as("bucket"),
      (conv(substring(md5(concat(lit("lw|"), col("id").cast("string"))),
        1, 4), 16, 10).cast("long") - 32768L).as("w_unit"))

  /** Score hashed features (from [[TextAnalysis.featureHash]]:
    * idCol, bucket, tf) against a weight table (bucket, w_unit).
    * Output: idCol, margin (exact multiple of 2⁻¹⁶, as double),
    * label (1 when margin > 0). The weight join is LEFT with a zero
    * fallback: a sparse production vector omits zero-weight buckets, and
    * an inner join would silently DROP any document whose every bucket
    * is absent (review-found) instead of scoring it margin 0 / label 0.
    * Docs absent from `features` (no tokens) emit no row — score what
    * was featurized. */
  def score(features: DataFrame, weights: DataFrame,
      idCol: String): DataFrame = {
    val unit = 65536.0 // margin·2¹⁶ stays well under 2⁵³: division exact
    features
      .join(broadcast(weights), Seq("bucket"), "left")
      .groupBy(col(idCol))
      .agg(sum(col("tf") * coalesce(col("w_unit"), lit(0L))).as("m_unit"))
      .select(col(idCol),
        (col("m_unit").cast("double") / lit(unit)).as("margin"),
        when(col("m_unit") > 0, lit(1)).otherwise(lit(0)).as("label"))
  }
}
