package graft

import org.apache.spark.sql.functions._
import graft.engine.{Percentiles, Scale}

/** Hand-checkable pins for the numeric scaling tier
  * ([[graft.engine.Scale]]): endpoint mapping, constant-group NULLs,
  * null passthrough, and the approx-percentile flag contract on the
  * robust scaler. */
class ScaleSpec extends SparkSpec {
  import spark.implicits._

  test("minMaxScale: endpoints land on 0/1, interior interpolates, " +
      "constant group and null values scale to NULL") {
    val df = Seq(("g", Option(10.0)), ("g", Option(20.0)),
      ("g", Option(15.0)), ("g", Option.empty[Double]),
      ("c", Option(7.0)), ("c", Option(7.0))).toDF("grp", "x")
    val r = Scale.minMaxScale(df, "x", "grp").collect()
      .map(x => (x.getString(x.fieldIndex("grp")),
        Option(x.get(x.fieldIndex("x")))) ->
        Option(x.get(x.fieldIndex("scaled")))).toMap
    assert(r(("g", Some(10.0))) === Some(0.0))
    assert(r(("g", Some(20.0))) === Some(1.0))
    assert(r(("g", Some(15.0))) === Some(0.5))
    assert(r(("g", None)) === None)
    // constant group: zero range never divides — NULL, not a crash
    assert(r(("c", Some(7.0))) === None)
    intercept[IllegalArgumentException] {
      Scale.minMaxScale(df.withColumn("scaled", col("x")), "x", "grp") }
  }

  test("robustScale: median centers, IQR scales (1..5 pin), constant " +
      "group NULL") {
    // group g = 1..5: q1=2, med=3, q3=4 → scaled = (x-3)/2
    val df = (1 to 5).map(v => ("g", v.toDouble)) :+ ("c", 9.0) :+ ("c", 9.0)
    val r = Scale.robustScale(df.toDF("grp", "x"), "x", "grp").collect()
      .map(x => (x.getString(x.fieldIndex("grp")),
        x.getDouble(x.fieldIndex("x"))) ->
        Option(x.get(x.fieldIndex("scaled")))).toMap
    assert(r(("g", 1.0)) === Some(-1.0))
    assert(r(("g", 3.0)) === Some(0.0))
    assert(r(("g", 5.0)) === Some(1.0))
    assert(r(("c", 9.0)) === None)
  }

  test("quantileTransform: midrank ECDF with shared tie positions, " +
      "null passthrough") {
    val df = Seq(("g", Option(1.0)), ("g", Option(2.0)), ("g", Option(2.0)),
      ("g", Option(3.0)), ("g", Option.empty[Double])).toDF("grp", "x")
    val r = graft.engine.Scale.quantileTransform(df, "x", "grp").collect()
      .map(x => Option(x.get(x.fieldIndex("x"))) ->
        Option(x.get(x.fieldIndex("u")))).toMap
    // n=4: u(1)=(2·1−1)/8, u(2)=(2·3−2)/8 (both ties share it), u(3)=(2·4−1)/8
    assert(r(Some(1.0)) === Some(0.125))
    assert(r(Some(2.0)) === Some(0.5))
    assert(r(Some(3.0)) === Some(0.875))
    assert(r(None) === None)
    intercept[IllegalArgumentException] {
      graft.engine.Scale.quantileTransform(
        df.withColumn("u", col("x")), "x", "grp") }
  }

  test("robustScale honors spark.graft.percentile.approx: same plan " +
      "shape, identical answer on a small exact-representable group") {
    val df = (1 to 5).map(v => ("g", v.toDouble)).toDF("grp", "x")
    val exact = Scale.robustScale(df, "x", "grp")
      .orderBy("x").collect().map(_.toSeq)
    spark.conf.set(Percentiles.ApproxConf, "true")
    try {
      val approx = Scale.robustScale(df, "x", "grp")
        .orderBy("x").collect().map(_.toSeq)
      // GK with accuracy 10000 is exact on 5 values — the flag swaps the
      // sketch in without moving any cut here
      assert(approx.toSeq === exact.toSeq)
    } finally spark.conf.unset(Percentiles.ApproxConf)
  }
}
