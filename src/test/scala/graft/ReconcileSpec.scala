package graft

import graft.engine.Reconcile

class ReconcileSpec extends SparkSpec {
  import spark.implicits._

  test("snapshotDiff: add/remove/change classification, null-safe compares") {
    val old = Seq(
      (1L, Some("a"), Some(10.0)), // unchanged -> omitted
      (2L, Some("b"), Some(20.0)), // price changes
      (3L, None, Some(30.0)),      // null -> value: changed
      (4L, Some("d"), None),       // null stays null: unchanged -> omitted
      (5L, Some("e"), Some(50.0))  // removed
    ).toDF("k", "s", "p")
    val nw = Seq(
      (1L, Some("a"), Some(10.0)),
      (2L, Some("b"), Some(21.0)),
      (3L, Some("c"), Some(30.0)),
      (4L, Some("d"), None),
      (6L, Some("f"), Some(60.0)) // added
    ).toDF("k", "s", "p")
    val got = Reconcile.snapshotDiff(old, nw, Seq("k"), Seq("s", "p"))
      .orderBy("k")
      .collect().map(r => (r.getLong(0), r.getString(1), r.getString(2)))
    assert(got.toSeq === Seq(
      (2L, "changed", "p"),
      (3L, "changed", "s"),
      (5L, "removed", null),
      (6L, "added", null)))
    // both columns change -> names joined in compareCols order
    val both = Reconcile.snapshotDiff(
        Seq((9L, "x", 1.0)).toDF("k", "s", "p"),
        Seq((9L, "y", 2.0)).toDF("k", "s", "p"),
        Seq("k"), Seq("s", "p"))
      .collect().head
    assert((both.getString(1), both.getString(2)) === ("changed", "s,p"))
  }
}
