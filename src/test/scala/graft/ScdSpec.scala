package graft

import org.apache.spark.sql.functions._

import graft.engine.Scd

/** SCD type-2 merge semantics ([[graft.engine.Scd.scd2Apply]]): history
  * passthrough, unchanged-kept, changed-closed+reopened, new-key-opened,
  * and null-safe attribute comparison. */
class ScdSpec extends SparkSpec {
  import spark.implicits._

  private val d0 = java.sql.Date.valueOf("2024-01-01")
  private val d1 = java.sql.Date.valueOf("2024-06-01")
  private val dOld = java.sql.Date.valueOf("2023-01-01")

  // key 1: closed history + current (update changes attr)
  // key 2: current, update identical → kept open, no new version
  // key 3: current, no update → kept open
  // key 4: absent → opened by the batch
  // key 5: current with NULL attr, update NULL → unchanged (null-safe)
  // key 6: current with NULL attr, update non-NULL → changed
  private lazy val dim = Seq(
    (1L, Option("a-old"), dOld, Option(d0)),
    (1L, Option("a"), d0, Option.empty[java.sql.Date]),
    (2L, Option("b"), d0, Option.empty[java.sql.Date]),
    (3L, Option("c"), d0, Option.empty[java.sql.Date]),
    (5L, Option.empty[String], d0, Option.empty[java.sql.Date]),
    (6L, Option.empty[String], d0, Option.empty[java.sql.Date])
  ).toDF("k", "attr", "valid_from", "valid_to")

  private lazy val updates = Seq(
    (1L, Option("a2")),
    (2L, Option("b")),
    (4L, Option("d")),
    (5L, Option.empty[String]),
    (6L, Option("f"))
  ).toDF("k", "attr")

  test("scd2Apply: all five key paths produce the expected versions") {
    val got = Scd.scd2Apply(dim, updates, Seq("k"), Seq("attr"), lit(d1))
      .collect()
      .map(r => (r.getLong(0), Option(r.getString(1)),
        r.getDate(2), Option(r.getDate(3))))
      .toSet
    val expected = Set(
      (1L, Some("a-old"), dOld, Some(d0)),      // history untouched
      (1L, Some("a"), d0, Some(d1)),            // closed
      (1L, Some("a2"), d1, None),               // reopened
      (2L, Some("b"), d0, None),                // unchanged update → kept
      (3L, Some("c"), d0, None),                // untouched key → kept
      (4L, Some("d"), d1, None),                // new key → opened
      (5L, None, d0, None),                     // NULL == NULL → kept
      (6L, None, d0, Some(d1)),                 // NULL → value closes
      (6L, Some("f"), d1, None)
    )
    assert(got === expected)
  }

  test("scd2Apply: duplicate update keys raise instead of silently fanning out") {
    val dupUpd = updates.unionByName(
      Seq((1L, Option("zz"))).toDF("k", "attr"))
    val ex = intercept[Exception] {
      Scd.scd2Apply(dim, dupUpd, Seq("k"), Seq("attr"), lit(d1)).collect()
    }
    def messages(t: Throwable): Seq[String] =
      Option(t).toSeq.flatMap(e =>
        Option(e.getMessage).toSeq ++ messages(e.getCause))
    assert(messages(ex).exists(_.contains("more than one update row")),
      messages(ex).mkString(" | "))
  }

  test("scd2Apply: idempotent when re-applying the same batch") {
    val once = Scd.scd2Apply(dim, updates, Seq("k"), Seq("attr"), lit(d1))
    val twice = Scd.scd2Apply(once, updates, Seq("k"), Seq("attr"), lit(d1))
    val a = once.collect().map(_.toSeq).toSet
    val b = twice.collect().map(_.toSeq).toSet
    assert(a === b)
  }

  test("synthetic insert keys derived from max(key)+1 stay disjoint past the old 1e8 boundary") {
    // The registry's upsert/snapshot/scd2 queries derive their synthetic
    // "brand-new" keys as key + max(key) + 1 instead of a fixed +1e8
    // offset (which silently collides once real keys reach 1e8, at
    // SF >= ~16 for o_orderkey, turning intended inserts into updates).
    // Drill the boundary: existing keys straddle 1e8; the derived offset
    // must classify every synthetic row as an INSERT, never an update.
    val existing = Seq(
      (99999999L, "E"), (100000000L, "E"), (100000007L, "E"))
      .toDF("k", "status")
    val maxK = existing.agg(max(col("k")).as("__maxk"))
    val incoming = existing.crossJoin(broadcast(maxK))
      .select((col("k") + col("__maxk") + 1).as("k"), lit("N").as("status"))
    // fixed offset would alias 99999999 + 1e8 = 199999999 vs derived
    // 99999999 + 100000007 + 1 = 200000007 — all three derived keys are
    // strictly above max(existing), hence disjoint
    val merged = graft.engine.LoadDedup.upsert(
      existing, incoming, Seq("k"), Seq("status"))
    assert(merged.count() === 6L)
    assert(merged.filter(col("status") === "E").count() === 3L)
    assert(merged.filter(col("status") === "N").count() === 3L)
    val minNew = merged.filter(col("status") === "N")
      .agg(min(col("k"))).head().getLong(0)
    assert(minNew > 100000007L)
    // and the same derived-key construction through the SCD2 merge opens
    // three NEW versions (inserts), leaving the existing rows untouched
    val dim2 = existing.select(col("k"), col("status").as("attr"),
      lit(d0).as("valid_from"), lit(null).cast("date").as("valid_to"))
    val out = Scd.scd2Apply(dim2, incoming.select(col("k"),
      col("status").as("attr")), Seq("k"), Seq("attr"), lit(d1))
    assert(out.count() === 6L)
    assert(out.filter(col("valid_from") === lit(d0)).count() === 3L)
    assert(out.filter(col("valid_to").isNotNull).count() === 0L)
  }
}
