package graft

import org.apache.spark.sql.functions._

import graft.engine.Ivm

/** Incremental view maintenance: maintained == recomputed, group
  * lifecycle (birth, death), and the malformed-CDC guards. */
class IvmSpec extends SparkSpec {
  import spark.implicits._

  private val keys = Seq("k")
  private val ms = Seq("v")

  private def rows(t: (String, Double)*) = t.toDF("k", "v")

  private def agg(df: org.apache.spark.sql.DataFrame) =
    df.collect().map(r => (r.getString(0), r.getLong(1),
      r.getDecimal(2).doubleValue())).toSet

  test("maintained aggregate equals full recompute (mixed delta)") {
    val base = rows("a" -> 1.0, "a" -> 2.0, "b" -> 5.0, "c" -> 7.0)
    // delete one 'a' row, update 'b' 5.0 -> 6.5 (as -1/+1), insert new 'd'
    val delta = Seq(
      ("a", 2.0, -1), ("b", 5.0, -1), ("b", 6.5, 1), ("d", 9.0, 1))
      .toDF("k", "v", "mult")
    val maintained = Ivm.applyDelta(
      Ivm.fullAgg(base, keys, ms), Ivm.deltaAgg(delta, keys, "mult", ms),
      keys, ms)
    val recomputed = Ivm.fullAgg(
      rows("a" -> 1.0, "b" -> 6.5, "c" -> 7.0, "d" -> 9.0), keys, ms)
    assert(agg(maintained) === agg(recomputed))
  }

  test("a fully-deleted group disappears from the view") {
    val base = rows("a" -> 1.0, "b" -> 2.0)
    val delta = Seq(("b", 2.0, -1)).toDF("k", "v", "mult")
    val out = Ivm.applyDelta(
      Ivm.fullAgg(base, keys, ms), Ivm.deltaAgg(delta, keys, "mult", ms),
      keys, ms)
    assert(out.select("k").as[String].collect().toSeq === Seq("a"))
  }

  test("deleting more rows than the base had raises in-plan") {
    val base = rows("a" -> 1.0)
    val delta = Seq(("a", 1.0, -1), ("a", 2.0, -1)).toDF("k", "v", "mult")
    val ex = intercept[Exception] {
      Ivm.applyDelta(
        Ivm.fullAgg(base, keys, ms), Ivm.deltaAgg(delta, keys, "mult", ms),
        keys, ms).collect()
    }
    assert(ex.getMessage.contains("negative count"))
  }

  test("a multiplicity other than +1/-1 raises in-plan") {
    val delta = Seq(("a", 1.0, 2)).toDF("k", "v", "mult")
    val ex = intercept[Exception] {
      Ivm.deltaAgg(delta, keys, "mult", ms).collect()
    }
    assert(ex.getMessage.contains("+1/-1"))
  }

  test("null-key groups maintain correctly (null-safe key join)") {
    // fullAgg emits a null-key group; a plain equi-join would orphan its
    // delta into a spurious negative-count error — review-found
    val base = Seq((Option.empty[String], 1.0), (None, 2.0), (Some("a"), 5.0))
      .toDF("k", "v")
    val d = Seq((Option.empty[String], 1.0, -1)).toDF("k", "v", "mult")
    val out = Ivm.applyDelta(Ivm.fullAgg(base, keys, ms),
        Ivm.deltaAgg(d, keys, "mult", ms), keys, ms)
      .collect().map(r => (Option(r.getString(0)), r.getLong(1),
        r.getDecimal(2).doubleValue())).toSet
    assert(out === Set((None, 1L, 2.0), (Some("a"), 1L, 5.0)))
  }

  test("zero count with residual sum raises (netted over-delete)") {
    // n nets to 0 but sums don't: the over-delete masked a real insert —
    // silently dropping the group would lose that insert (review-found)
    val base = rows("x" -> 1.0)
    val d = Seq(("x", 5.0, -1), ("x", 6.0, -1), ("x", 2.0, 1))
      .toDF("k", "v", "mult")
    val ex = intercept[Exception] {
      Ivm.applyDelta(Ivm.fullAgg(base, keys, ms),
        Ivm.deltaAgg(d, keys, "mult", ms), keys, ms).collect()
    }
    assert(ex.getMessage.contains("residual"))
    // a CLEAN full deletion (sums also net to zero) still just drops
    val clean = Seq(("x", 1.0, -1)).toDF("k", "v", "mult")
    assert(Ivm.applyDelta(Ivm.fullAgg(base, keys, ms),
      Ivm.deltaAgg(clean, keys, "mult", ms), keys, ms).count() === 0L)
  }

  test("delta application is associative: two batches == one combined") {
    val base = rows("a" -> 1.0, "a" -> 3.0, "b" -> 2.0)
    val d1 = Seq(("a", 1.0, -1), ("c", 4.0, 1)).toDF("k", "v", "mult")
    val d2 = Seq(("c", 4.0, -1), ("b", 8.0, 1)).toDF("k", "v", "mult")
    val stepwise = Ivm.applyDelta(
      Ivm.applyDelta(Ivm.fullAgg(base, keys, ms),
        Ivm.deltaAgg(d1, keys, "mult", ms), keys, ms),
      Ivm.deltaAgg(d2, keys, "mult", ms), keys, ms)
    val combined = Ivm.applyDelta(Ivm.fullAgg(base, keys, ms),
      Ivm.deltaAgg(d1.unionByName(d2), keys, "mult", ms), keys, ms)
    assert(agg(stepwise) === agg(combined))
  }
}
