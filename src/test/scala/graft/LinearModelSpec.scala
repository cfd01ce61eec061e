package graft

import org.apache.spark.sql.functions._

import graft.llm.{LinearModel, TextAnalysis}

/** Fixed-point linear scoring: hand-checked margins, exactness of the
  * 2⁻¹⁶ unit arithmetic, and the decision threshold. */
class LinearModelSpec extends SparkSpec {
  import spark.implicits._

  test("margin is the exact integer dot product over 65536") {
    val feats = Seq((1L, 0L, 2L), (1L, 1L, 1L), (2L, 1L, 3L))
      .toDF("doc_id", "bucket", "tf")
    val w = Seq((0L, 100L), (1L, -40L)).toDF("bucket", "w_unit")
    val got = LinearModel.score(feats, w, "doc_id")
      .as[(Long, Double, Int)].collect()
      .map { case (k, m, l) => k -> ((m, l)) }.toMap
    // doc 1: 2*100 + 1*(-40) = 160 units; doc 2: 3*(-40) = -120 units
    assert(got === Map(1L -> (160.0 / 65536, 1), 2L -> (-120.0 / 65536, 0)))
  }

  test("zero margin classifies negative (strict threshold)") {
    val feats = Seq((1L, 0L, 1L), (1L, 1L, 1L)).toDF("doc_id", "bucket", "tf")
    val w = Seq((0L, 5L), (1L, -5L)).toDF("bucket", "w_unit")
    val got = LinearModel.score(feats, w, "doc_id")
      .as[(Long, Double, Int)].collect()
    assert(got.toSeq === Seq((1L, 0.0, 0)))
  }

  test("fixture weights are in [-32768, 32767] and stable") {
    val w = LinearModel.fixtureWeights(spark, 64)
      .as[(Long, Long)].collect().toMap
    assert(w.size === 64)
    assert(w.values.forall(v => v >= -32768 && v <= 32767))
    val again = LinearModel.fixtureWeights(spark, 64)
      .as[(Long, Long)].collect().toMap
    assert(w === again)
  }

  test("sparse weight table: docs with only unlisted buckets score 0, not vanish") {
    // a production vector omits zero-weight buckets — the inner join
    // dropped such docs entirely (review-found)
    val feats = Seq((1L, 1, 3L), (2L, 0, 2L)).toDF("doc_id", "bucket", "tf")
    val w = Seq((0, 5L)).toDF("bucket", "w_unit") // bucket 1 absent
    val got = LinearModel.score(feats, w, "doc_id")
      .collect().map(r => r.getLong(0) -> (r.getDouble(1), r.getInt(2))).toMap
    assert(got(1L) === ((0.0, 0)))          // unlisted bucket → margin 0
    assert(got(2L) === ((10.0 / 65536, 1))) // listed bucket scores
  }

  test("end-to-end over real docs: every margin is a multiple of 2^-16") {
    val docs = spark.read
      .parquet("/root/testdata/sf0.001/documents.parquet")
    val feats = TextAnalysis.featureHash(docs, "doc_id", "text", 64)
    val got = LinearModel
      .score(feats, LinearModel.fixtureWeights(spark, 64), "doc_id")
    val margins = got.select("margin").as[Double].collect()
    assert(margins.nonEmpty)
    assert(margins.forall(m => (m * 65536) == math.rint(m * 65536)))
  }
}
