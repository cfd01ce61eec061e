package graft

import org.apache.spark.sql.functions._

import graft.llm.Graph

/** PageRank fixed-point semantics and triangle counting. */
class GraphSpec extends SparkSpec {
  import spark.implicits._

  private val S = 1L << 30

  test("pageRank matches a hand-computed fixed-point round on a 3-node chain") {
    // 1 -> 2 -> 3 : node 1 has no in-edges, node 3 is dangling
    val e = Seq((1L, 2L), (2L, 3L)).toDF("src", "dst")
    val got = Graph.pageRank(e, "src", "dst", iters = 1)
      .orderBy("node").as[(Long, Double)].collect()
    val n = 3L
    val r0 = S / n
    val base = (3L * S) / (20L * n)
    def rnd(fx: Long) = math.rint(fx.toDouble / S * 1e8) / 1e8
    // deg(1) = deg(2) = 1; node 1 gets no contributions
    val exp = Seq(
      1L -> rnd(base),
      2L -> rnd(base + (17L * (r0 / 1L)) / 20L),
      3L -> rnd(base + (17L * (r0 / 1L)) / 20L))
    assert(got.toSeq == exp)
  }

  test("pageRank mass flows over two iterations (ranks keep changing)") {
    val e = Seq((1L, 2L), (2L, 3L), (3L, 1L)).toDF("src", "dst")
    val r1 = Graph.pageRank(e, "src", "dst", iters = 1)
      .orderBy("node").as[(Long, Double)].collect().toSeq
    val r2 = Graph.pageRank(e, "src", "dst", iters = 2)
      .orderBy("node").as[(Long, Double)].collect().toSeq
    // a 3-cycle keeps uniform rank through every round: each node passes
    // its full rank along, so only the damping floor erodes the values
    assert(r1.map(_._2).distinct.size == 1)
    assert(r2.map(_._2).distinct.size == 1)
    // and mass decays monotonically under the floor-division contract
    assert(r2.head._2 <= r1.head._2)
  }

  test("pageRank deduplicates edges and ignores null endpoints") {
    val e = Seq(
        (Some(1L), Some(2L)), (Some(1L), Some(2L)),
        (None, Some(2L)), (Some(1L), None))
      .toDF("src", "dst")
    val got = Graph.pageRank(e, "src", "dst", iters = 1)
      .orderBy("node").as[(Long, Double)].collect()
    assert(got.map(_._1).toSeq == Seq(1L, 2L))
  }

  test("triangleCounts: K4 gives every node C(3,2)=3 triangles") {
    val k4 = (for {
      a <- 1 to 4; b <- 1 to 4 if a < b
    } yield (a.toLong, b.toLong)).toDF("id1", "id2")
    val got = Graph.triangleCounts(k4, "id1", "id2")
      .orderBy("node").as[(Long, Long)].collect()
    assert(got.toSeq == Seq(1L -> 3L, 2L -> 3L, 3L -> 3L, 4L -> 3L))
  }

  test("triangleCounts: direction, duplication, and self-loops are normalized") {
    // triangle {1,2,3} given with mixed directions + dup + self-loop;
    // node 4 hangs off node 3 (pendant — no triangle)
    val e = Seq((3L, 1L), (1L, 2L), (2L, 3L), (2L, 1L), (1L, 1L), (3L, 4L))
      .toDF("id1", "id2")
    val got = Graph.triangleCounts(e, "id1", "id2")
      .orderBy("node").as[(Long, Long)].collect()
    assert(got.toSeq == Seq(1L -> 1L, 2L -> 1L, 3L -> 1L))
  }

  private def lpa(edges: Seq[(Long, Long)], iters: Int): Map[Long, Long] =
    Graph.labelPropagation(edges.toDF("src", "dst"), "src", "dst", iters)
      .as[(Long, Long)].collect().toMap

  test("labelPropagation: a triangle converges to the min-id community") {
    assert(lpa(Seq((1L, 2L), (2L, 3L), (3L, 1L)), 3) ===
      Map(1L -> 1L, 2L -> 1L, 3L -> 1L))
  }

  test("labelPropagation: bridged triangles split into two communities") {
    // triangles {1,2,3} and {4,5,6} joined by the 3-4 bridge — one
    // connected COMPONENT, two LPA communities (hand-traced rounds)
    val e = Seq((1L, 2L), (2L, 3L), (3L, 1L),
      (4L, 5L), (5L, 6L), (6L, 4L), (3L, 4L))
    assert(lpa(e, 3) ===
      Map(1L -> 1L, 2L -> 1L, 3L -> 1L, 4L -> 3L, 5L -> 3L, 6L -> 3L))
  }

  test("kCore: a triangle with a pendant chain peels to the triangle") {
    // 1-2-3 triangle, chain 3-4-5: k=2 kills 5, then 4; triangle stays
    val e = Seq((1L, 2L), (2L, 3L), (3L, 1L), (3L, 4L), (4L, 5L))
      .toDF("src", "dst")
    val got = Graph.kCore(e, "src", "dst", k = 2, iters = 3)
      .as[(Long, Long)].collect().toMap
    assert(got === Map(1L -> 2L, 2L -> 2L, 3L -> 2L))
  }

  test("kCore: rounds past the fixpoint change nothing") {
    val e = Seq((1L, 2L), (2L, 3L), (3L, 1L), (3L, 4L), (4L, 5L))
      .toDF("src", "dst")
    val r3 = Graph.kCore(e, "src", "dst", 2, 3).as[(Long, Long)].collect().toMap
    val r5 = Graph.kCore(e, "src", "dst", 2, 5).as[(Long, Long)].collect().toMap
    assert(r3 === r5)
  }

  test("kCore fixpoint is reached within the registered rounds on the corpus") {
    // the q_kcore contract: 3 peels == the true 2-core on real testdata —
    // checked at BOTH scales the harness actually runs (review-found:
    // only sf0.001 was covered while the correctness gate runs sf0.01,
    // where a longer borderline chain could need a 4th peel)
    Seq("sf0.001", "sf0.01").foreach { sf =>
      val docs = spark.read
        .parquet(s"/root/testdata/$sf/documents.parquet")
      val pairs = graft.llm.Dedup.minhashNearDups(docs, "doc_id", "text",
        3, 3, 3, 0.5).select("id1", "id2")
      val r3 = Graph.kCore(pairs, "id1", "id2", 2, 3)
        .as[(Long, Long)].collect().toMap
      val r4 = Graph.kCore(pairs, "id1", "id2", 2, 4)
        .as[(Long, Long)].collect().toMap
      assert(r3 === r4, s"fixpoint not reached within 3 peels at $sf")
    }
  }

  test("labelPropagation: synchronous 2-cycle on an edge is deterministic") {
    // a single edge oscillates under synchronous updates — pinned, not
    // hidden: round parity decides which side of the swap you observe
    assert(lpa(Seq((1L, 2L)), 3) === Map(1L -> 2L, 2L -> 1L))
    assert(lpa(Seq((1L, 2L)), 2) === Map(1L -> 1L, 2L -> 2L))
  }

  private def bfs(edges: Seq[(Long, Long)], srcs: Seq[Long],
      hops: Int): Map[Long, Int] =
    Graph.bfsHops(edges.toDF("src", "dst"), "src", "dst",
        srcs.toDF("s"), "s", hops)
      .as[(Long, Int)].collect().toMap

  test("bfsHops: hop distance on a path, undirected, capped by maxHops") {
    // path 1-2-3-4-5, source {1}: edges are traversed both ways
    val e = Seq((1L, 2L), (2L, 3L), (3L, 4L), (4L, 5L))
    assert(bfs(e, Seq(1L), 2) === Map(1L -> 0, 2L -> 1, 3L -> 2))
    assert(bfs(e, Seq(1L), 4) ===
      Map(1L -> 0, 2L -> 1, 3L -> 2, 4L -> 3, 5L -> 4))
  }

  test("bfsHops: multi-source takes the minimum over sources") {
    val e = Seq((1L, 2L), (2L, 3L), (3L, 4L), (4L, 5L))
    assert(bfs(e, Seq(1L, 5L), 2) ===
      Map(1L -> 0, 2L -> 1, 3L -> 2, 4L -> 1, 5L -> 0))
  }

  test("bfsHops: rounds past convergence are no-ops; isolated sources keep dist 0") {
    val e = Seq((1L, 2L), (2L, 3L))
    // node 9 is a source absent from the edge set — reported at dist 0
    val r3 = bfs(e, Seq(1L, 9L), 3)
    val r5 = bfs(e, Seq(1L, 9L), 5)
    assert(r3 === Map(1L -> 0, 2L -> 1, 3L -> 2, 9L -> 0))
    assert(r3 === r5)
  }

  private def grid8(x: Double): Double =
    BigDecimal(x).setScale(8, BigDecimal.RoundingMode.HALF_UP).toDouble

  test("adamicAdar: path a-b-c predicts (a,c) with weight 1/ln(deg b)") {
    val e = Seq((1L, 2L), (2L, 3L)).toDF("src", "dst")
    val r = Graph.adamicAdar(e, "src", "dst").collect()
    assert(r.length === 1)
    val row = r.head
    assert((row.getAs[Long]("u"), row.getAs[Long]("v")) === ((1L, 3L)))
    assert(row.getAs[Long]("common") === 1L)
    assert(row.getAs[Double]("score") ===
      grid8(1.0 / grid8(math.log(2.0))))
  }

  test("adamicAdar: star center yields all leaf pairs; maxDeg excludes it") {
    val e = Seq((9L, 1L), (9L, 2L), (9L, 3L)).toDF("src", "dst")
    val r = Graph.adamicAdar(e, "src", "dst").collect()
    val w = grid8(1.0 / grid8(math.log(3.0)))
    assert(r.map(x => (x.getAs[Long]("u"), x.getAs[Long]("v"),
      x.getAs[Double]("score"))).toSet ===
      Set((1L, 2L, w), (1L, 3L, w), (2L, 3L, w)))
    assert(Graph.adamicAdar(e, "src", "dst", maxDeg = 2).count() === 0L)
  }

  test("adamicAdar: adjacent pairs are excluded") {
    // triangle: every pair is already an edge → nothing to predict
    val e = Seq((1L, 2L), (2L, 3L), (1L, 3L)).toDF("src", "dst")
    assert(Graph.adamicAdar(e, "src", "dst").count() === 0L)
  }

  test("hits: one round matches hand-run integer renormalization") {
    // u1 → {v1, v2}, u2 → {v1}
    val e = Seq((1L, 11L), (1L, 12L), (2L, 11L)).toDF("src", "dst")
    val got = Graph.hits(e, "src", "dst", iters = 1).collect()
      .map(r => (r.getAs[String]("side"), r.getAs[Long]("node")) ->
        r.getAs[Long]("score_e8")).toMap
    val unit = BigInt(100000000L)
    val rawA = Map(11L -> 2 * unit, 12L -> unit)
    val ta = rawA.values.sum
    val a = rawA.map { case (k, v) => k -> v * unit / ta }
    val rawH = Map(1L -> (a(11L) + a(12L)), 2L -> a(11L))
    val th = rawH.values.sum
    val h = rawH.map { case (k, v) => k -> v * unit / th }
    assert(got === (a.map { case (k, v) => ("auth", k) -> v.toLong } ++
      h.map { case (k, v) => ("hub", k) -> v.toLong }))
  }

  test("hits: symmetric hubs tie exactly") {
    val e = Seq((1L, 11L), (2L, 12L)).toDF("src", "dst")
    val got = Graph.hits(e, "src", "dst", iters = 3).collect()
      .map(r => (r.getAs[String]("side"), r.getAs[Long]("node")) ->
        r.getAs[Long]("score_e8")).toMap
    assert(got(("hub", 1L)) === got(("hub", 2L)))
    assert(got(("auth", 11L)) === got(("auth", 12L)))
  }
}
