package graft

import graft.engine.Governance

/** Hand-checkable pins for the governance audits. */
class GovernanceSpec extends SparkSpec {
  import spark.implicits._

  test("kAnonymity: ladder levels, min group, suppression rows") {
    // QI (a,b): groups (x,1)×4, (x,2)×1, (y,1)×6 → level 0: min 1,
    // rows_below_k(5) = 4+1 = 5; level 1 (drop b): x×5, y×6 → min 5,
    // below-k 0; level 3 (all): 11 rows, one group
    val df = (Seq.fill(4)(("x", 1)) ++ Seq(("x", 2)) ++
      Seq.fill(6)(("y", 1))).toDF("a", "b")
    val r = Governance.kAnonymity(df, Seq("a", "b"), k = 5).collect()
      .map(x => x.getAs[Long]("level") ->
        (x.getAs[Long]("n_groups"), x.getAs[Long]("min_group"),
          x.getAs[Long]("rows_below_k"))).toMap
    assert(r(0L) === ((3L, 1L, 5L)))
    assert(r(1L) === ((2L, 5L, 0L)))
    assert(r(3L) === ((1L, 11L, 0L)))
  }

  test("lDiversity: distinct-sensitive counts, null sensitive excluded") {
    // group (x): sensitive {s1, s2, s2} → div 2; group (y): {s1} ×3 →
    // div 1; group (z): only NULLs → div 0. l = 2: y and z below →
    // groups_below_l 2, rows_below_l 3 + 2 = 5, diverse_frac 3/8
    val df = Seq(("x", Option("s1")), ("x", Option("s2")),
      ("x", Option("s2")), ("y", Option("s1")), ("y", Option("s1")),
      ("y", Option("s1")), ("z", Option.empty[String]),
      ("z", Option.empty[String])).toDF("qi", "s")
    val r = Governance.lDiversity(df, Seq("qi"), "s", l = 2).head()
    assert(r.getAs[Long]("n_groups") === 3L)
    assert(r.getAs[Long]("min_diversity") === 0L)
    assert(r.getAs[Long]("groups_below_l") === 2L)
    assert(r.getAs[Long]("rows_below_l") === 5L)
    assert(r.getAs[Double]("diverse_frac") === 0.375)
  }

  test("tCloseness: disjoint distributions hit max EMD, matching group 0") {
    // domain {1,2}: x all-1s, y all-2s (maximally far), z mirrors global
    val df = Seq(("x", 1L), ("x", 1L), ("y", 2L), ("y", 2L),
      ("z", 1L), ("z", 2L)).toDF("qi", "v")
    val r = Governance.tCloseness(df, Seq("qi"), "v", t = 0.3).collect()
      .map(x => x.getString(0) ->
        (x.getAs[Long]("n"), x.getAs[Double]("emd"),
          x.getAs[Boolean]("above_t"))).toMap
    // x: |cum_x·n − cum·n_x| at v=1: |2·6 − 3·2| = 6 → 6/(2·6·1) = 0.5
    assert(r("x") === ((2L, 0.5, true)))
    assert(r("y") === ((2L, 0.5, true)))
    assert(r("z") === ((2L, 0.0, false)))
  }

  test("tCloseness: fractional sensitive values stay distinct; a " +
      "single-valued domain is exactly 0, never NaN") {
    // truncating casts would merge 0.25/0.75 into one point (audit
    // false negative); native-type domains must not
    val frac = Seq(("x", 0.25), ("x", 0.25), ("y", 0.75), ("y", 0.75))
      .toDF("qi", "s")
    val rf = Governance.tCloseness(frac, Seq("qi"), "s", t = 0.3)
      .collect().map(x => x.getString(0) -> x.getAs[Double]("emd")).toMap
    assert(rf("x") === 0.5 && rf("y") === 0.5)
    // m = 1: every group IS the global distribution — EMD 0, no flag
    // (the raw 0/0 formula would yield NaN, which compares > t)
    val mono = Seq(("x", 7.0), ("y", 7.0)).toDF("qi", "s")
    val rm = Governance.tCloseness(mono, Seq("qi"), "s", t = 0.3)
      .collect().map(x => (x.getAs[Double]("emd"),
        x.getAs[Boolean]("above_t")))
    assert(rm.forall(_ === ((0.0, false))))
  }

  test("fdAudit: holding FD has zero g3, violating FD counts repairs") {
    val holds = Seq((1, "a"), (1, "a"), (2, "b")).toDF("k", "v")
    val h = Governance.fdAudit(holds, "k", "v").head()
    assert(h.getAs[Long]("violating_keys") === 0L)
    assert(h.getAs[Long]("g3_rows") === 0L)

    // key 1 → {a, a, b}: delete 1 row to repair; key 2 clean
    val viol = Seq((1, "a"), (1, "a"), (1, "b"), (2, "c")).toDF("k", "v")
    val v = Governance.fdAudit(viol, "k", "v").head()
    assert(v.getAs[Long]("n_keys") === 2L)
    assert(v.getAs[Long]("violating_keys") === 1L)
    assert(v.getAs[Long]("g3_rows") === 1L)
    assert(v.getAs[Double]("g3") === 0.25)
  }

  test("fdAudit: null keys and values are excluded") {
    val df = Seq((Some(1), Some("a")), (Some(1), None),
      (None, Some("b"))).toDF("k", "v")
    val r = Governance.fdAudit(df, "k", "v").head()
    assert(r.getAs[Long]("n_keys") === 1L)
    assert(r.getAs[Long]("violating_keys") === 0L)
  }

  test("inclusionDep: partial coverage and exact subset") {
    val a = Seq(1L, 2L, 3L).toDF("x")
    val b = Seq(2L, 3L, 4L).toDF("y")
    val r = Governance.inclusionDep(a, "x", b, "y", "A.x", "B.y").head()
    assert(r.getAs[Long]("n_a") === 3L)
    assert(r.getAs[Long]("n_matched") === 2L)
    assert(math.abs(r.getAs[Double]("coverage") - 2.0 / 3) < 1e-8)

    val full = Governance.inclusionDep(b, "y", b, "y", "B.y", "B.y").head()
    assert(full.getAs[Double]("coverage") === 1.0)
  }

  test("inclusionDep: keys compare by canonical string form, never silent coercion") {
    // INT 7 vs zero-padded VARCHAR '007': native coercion would call
    // them equal (and report bogus coverage); the string contract says
    // they differ — '7' matches only '7'
    val a = Seq(7, 8, 9).toDF("k")
    val b = Seq("007", "7", "x").toDF("k")
    val r = graft.engine.Governance.inclusionDep(a, "k", b, "k", "a.k", "b.k")
      .head()
    assert(r.getAs[Long]("n_a") === 3L)
    assert(r.getAs[Long]("n_matched") === 1L) // only 7 ↔ '7'
  }
}
