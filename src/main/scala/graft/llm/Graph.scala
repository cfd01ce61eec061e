package graft.llm

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

import graft.engine.Checkpoints

/** Iterative graph centrality over an edge table — the ranking pass a
  * web-scale curation pipeline runs to weight sources by link authority
  * (Common Crawl publishes exactly this kind of host/domain ranking and
  * curation recipes select high-centrality domains; see Page et al. 1999,
  * "The PageRank Citation Ranking").
  *
  * Scale design (the per-iteration cost is the whole story at 100 TB):
  *  - the edge table is deduplicated, degree-annotated and materialized
  *    ONCE before the loop (one shuffle on src); every iteration then
  *    pays exactly one join of edges against the current rank vector and
  *    one aggregation shuffle of per-edge contributions on dst — work
  *    proportional to |E| per round, never |V|², and map-side partial
  *    sums compress the contribution shuffle to |V|-scale;
  *  - each round ends in a [[Checkpoints.iterationBarrier]], so lineage
  *    stays O(1) deep and a reliable checkpoint dir makes multi-hour runs
  *    executor-loss-safe (`spark.graft.checkpoint.reliable=true`);
  *  - ranks are EXACT fixed-point integers (2^30 scale): per-edge
  *    contribution is `rank div outdeg`, damping 0.85 is `(17·s) div 20`
  *    — floor division on non-negative longs, bit-identical on any
  *    engine, so a DuckDB oracle replays the whole solve by unrolling
  *    the iterations as CTEs (same trick as the PCA power iteration).
  *
  * Semantics contract (deterministic variant): dangling nodes (no
  * out-edges) do not redistribute their mass — it decays, as in the
  * original sum formulation r(v) = (1-d)/N + d·Σ r(u)/deg(u). Total mass
  * therefore shrinks per round; rank ORDER is unaffected for curation
  * thresholds, and the fixed-point floor makes the result exact rather
  * than approximately-normalized.
  */
object Graph {

  private val Scale = 1L << 30

  /** Symmetric closure of a directed/duplicated edge list as (a, b)
    * rows: both orientations, null endpoints and self-loops dropped,
    * deduplicated — the shared undirected-graph normalization of
    * [[labelPropagation]], [[kCore]] and [[bfsHops]] (one definition so
    * the null/self-loop policy cannot silently diverge between them). */
  private def symmetrize(edges: DataFrame, srcCol: String,
      dstCol: String): DataFrame = {
    val s = col(srcCol).cast("long")
    val d = col(dstCol).cast("long")
    edges.select(s.as("a"), d.as("b"))
      .unionByName(edges.select(d.as("a"), s.as("b")))
      .where(col("a").isNotNull && col("b").isNotNull &&
        col("a") =!= col("b"))
      .distinct()
  }

  /** PageRank after `iters` damped rounds (d = 0.85) over the distinct
    * directed edges `(srcCol, dstCol)`.
    * Output: node, rank (double, 8dp, fixed-point-exact underneath). */
  def pageRank(edges: DataFrame, srcCol: String, dstCol: String,
      iters: Int): DataFrame = {
    require(iters >= 1, "iters must be >= 1")
    val e = Checkpoints.iterationBarrier(
      edges.select(col(srcCol).cast("long").as("src"),
          col(dstCol).cast("long").as("dst"))
        .where(col("src").isNotNull && col("dst").isNotNull)
        .distinct())
    // barriered: `nodes` feeds the count, the initial ranks AND the left
    // join of every iteration — unbarriered, each round would re-run the
    // union+distinct shuffle.
    val nodes = Checkpoints.iterationBarrier(
      e.select(col("src").as("node"))
        .unionByName(e.select(col("dst").as("node"))).distinct())
    // |V| is a driver scalar (one count of an already-materialized edge
    // derivative) — O(1) result, the standard prologue of any PageRank.
    val n = nodes.count()
    require(n > 0, "empty edge set")
    val base = (3L * Scale) / (20L * n) // (1-d)·S/N, exact
    val outdeg = e.groupBy("src").agg(count(lit(1)).as("deg"))
    // degree-annotated edges, partitioned by src once, reused every round
    val eDeg = Checkpoints.iterationBarrier(
      e.repartition(col("src")).join(outdeg, "src"))
    var ranks = nodes.select(col("node"), lit(Scale / n).as("r"))
    for (_ <- 1 to iters) {
      val contrib = eDeg
        .join(ranks.withColumnRenamed("node", "src"), "src")
        .select(col("dst").as("node"), expr("r div deg").as("c"))
        .groupBy("node").agg(sum(col("c")).as("s"))
      ranks = Checkpoints.iterationBarrier(
        nodes.join(contrib, Seq("node"), "left")
          .select(col("node"),
            (lit(base) + expr("(17 * coalesce(s, 0L)) div 20")).as("r")))
    }
    ranks.select(col("node"),
      round(col("r").cast("double") / lit(Scale.toDouble), 8).as("rank"))
  }

  /** Triangle count per node over an UNDIRECTED simple graph given as
    * directed/duplicated edge rows. The classic edge-iterator shape:
    * orient every edge low→high id, join twice to close wedges, count.
    * Work is Σ deg(u)·deg(v) over edges — the standard bound; at web
    * scale the orientation (each wedge generated at its LOWEST-id apex
    * only, once) is what keeps hub nodes from exploding the wedge set.
    * Output: node, triangles. */
  def triangleCounts(edges: DataFrame, srcCol: String,
      dstCol: String): DataFrame = {
    val und = edges.select(
        least(col(srcCol).cast("long"), col(dstCol).cast("long")).as("a"),
        greatest(col(srcCol).cast("long"), col(dstCol).cast("long")).as("b"))
      .where(col("a") =!= col("b"))
      .distinct()
    val e = Checkpoints.iterationBarrier(und)
    // wedges a<b<c rooted at a; close with (b,c)
    val ab = e.toDF("a", "b")
    val ac = e.toDF("a", "c")
    val tri = ab.join(ac, "a").where(col("b") < col("c"))
      .join(e.toDF("b", "c"), Seq("b", "c"))
      .select(col("a"), col("b"), col("c"))
    val perNode = tri.select(explode(array(col("a"), col("b"), col("c"))).as("node"))
      .groupBy("node").agg(count(lit(1)).as("triangles"))
    perNode
  }

  /** Synchronous label propagation (Raghavan et al. 2007, Phys. Rev. E
    * 76) — community detection over an undirected graph, the
    * frequency-based complement of the connected-components clustering in
    * [[Dedup.dupClusters]]: CC says "reachable", LPA says "densely
    * attached", which separates chained borderline pairs from tight
    * duplicate communities.
    *
    * Deterministic variant (the published algorithm is randomized; a
    * cross-engine-checkable one cannot be): synchronous rounds, initial
    * label = node id, and
    *   label_{t+1}(v) = argmax over neighbor-label frequencies,
    *                    ties broken by SMALLEST label.
    * Every node in a symmetrized edge list has ≥ 1 neighbor, so there is
    * no keep-own-label branch. Synchronous LPA can 2-cycle on bipartite
    * structure — callers pick `iters`, and equal-round results are
    * bit-identical on any engine (the oracle unrolls the same rounds).
    *
    * Scale: per round, ONE join of the symmetric edge table against the
    * |V|-sized label vector and one (node, label) count — |E|-shaped like
    * a PageRank round, with [[Checkpoints.iterationBarrier]] keeping
    * lineage flat. The argmax is a per-node row_number window partitioned
    * by node — high-cardinality, never a global sort.
    * Output: node, community (the converged/final label). */
  def labelPropagation(edges: DataFrame, srcCol: String, dstCol: String,
      iters: Int): DataFrame = {
    require(iters >= 1, "iters must be >= 1")
    // symmetric closure, self-loops dropped (a self-loop votes for the
    // node's own stale label and slows mixing without changing limits)
    val e = Checkpoints.iterationBarrier(
      symmetrize(edges, srcCol, dstCol).repartition(col("b")))
    var labels = Checkpoints.iterationBarrier(
      e.select(col("a").as("node"), col("a").as("lbl")).distinct())
    val w = org.apache.spark.sql.expressions.Window
      .partitionBy(col("a")).orderBy(col("n").desc, col("lbl").asc)
    for (_ <- 1 to iters) {
      labels = Checkpoints.iterationBarrier(
        e.join(labels.withColumnRenamed("node", "b"), "b")
          .groupBy(col("a"), col("lbl")).agg(count(lit(1)).as("n"))
          .withColumn("rn", row_number().over(w))
          .where(col("rn") === 1)
          .select(col("a").as("node"), col("lbl")))
    }
    labels.select(col("node"), col("lbl").as("community"))
  }

  /** Multi-source BFS hop distance over an UNDIRECTED graph (frontier
    * relaxation — the reachability primitive under contamination blast-
    * radius audits and link-distance features; Malewicz et al. 2010's
    * Pregel presents exactly this as the canonical vertex program).
    *
    * Per round: ONE join of the |E|-sized symmetric edge table against
    * the current frontier plus a min-aggregation over |V| — cost follows
    * the frontier's incident edges, never |V|², and the min-combine is
    * map-side partial. Rounds are [[Checkpoints.iterationBarrier]]ed like
    * the PageRank loop. Distances are exact small integers, so a DuckDB
    * oracle replays the solve by unrolling rounds as CTEs.
    *
    * Semantics: `dist` = fewest edges from any source node (0 for the
    * sources themselves); nodes beyond `maxHops` are absent. The
    * union+min formulation makes each round idempotent past convergence
    * (extra rounds are no-ops), mirroring [[kCore]]'s contract.
    * Output: node, dist. */
  def bfsHops(edges: DataFrame, srcCol: String, dstCol: String,
      sources: DataFrame, sourceCol: String, maxHops: Int): DataFrame = {
    require(maxHops >= 1, s"maxHops=$maxHops")
    val e = Checkpoints.iterationBarrier(
      symmetrize(edges, srcCol, dstCol).repartition(col("a")))
    var dist = Checkpoints.iterationBarrier(
      sources.select(col(sourceCol).cast("long").as("node")).distinct()
        .select(col("node"), lit(0).as("dist")))
    for (k <- 1 to maxHops) {
      val next = e
        .join(dist.where(col("dist") === k - 1)
          .withColumnRenamed("node", "a"), "a")
        .select(col("b").as("node"), lit(k).as("dist"))
      dist = Checkpoints.iterationBarrier(
        dist.unionByName(next)
          .groupBy("node").agg(min(col("dist")).as("dist")))
    }
    dist
  }

  /** k-core peeling (Seidman 1983, "Network structure and minimum
    * degree"): iteratively remove nodes of degree < k and the edges they
    * carry; what survives is the subgraph where everyone has ≥ k
    * neighbors who also survived — the density screen that separates
    * tight near-dup communities from tendrils and chains (a k-core is
    * the standard "trusted dense region" cut in graph curation).
    *
    * `iters` bounds the peel rounds (each is one degree count + two
    * semi-joins — |E|-shaped, barriered); the fixpoint is reached when a
    * round removes nothing, which callers assert where they need the
    * true core (peeling is monotone, so extra rounds past the fixpoint
    * are free no-ops in result terms).
    *
    * Output: node, deg — nodes incident to a surviving edge, with their
    * degree in the induced subgraph. (An "alive" node whose neighbors
    * all died carries no surviving edge: it would be peeled next round,
    * and it is already absent here.) */
  def kCore(edges: DataFrame, srcCol: String, dstCol: String,
      k: Int, iters: Int): DataFrame = {
    require(k >= 1 && iters >= 1, s"k=$k iters=$iters")
    var cur = Checkpoints.iterationBarrier(symmetrize(edges, srcCol, dstCol))
    for (_ <- 1 to iters) {
      val alive = cur.groupBy(col("a")).agg(count(lit(1)).as("deg"))
        .where(col("deg") >= k).select(col("a"))
      cur = Checkpoints.iterationBarrier(
        cur.join(alive, Seq("a"), "left_semi")
          .join(alive.toDF("b"), Seq("b"), "left_semi"))
    }
    cur.groupBy(col("a")).agg(count(lit(1)).as("deg"))
      .select(col("a").as("node"), col("deg"))
  }

  /** Adamic–Adar link prediction (Adamic & Adar 2003) over the
    * undirected graph: for every NON-adjacent pair (u, v) with at least
    * one common neighbor,
    *
    *   AA(u, v) = Σ_{w ∈ N(u) ∩ N(v)} 1 / ln(deg(w))
    *
    * — shared rare neighbors count more than shared hubs. On the
    * near-dup pair graph this ranks the transitive links LSH banding
    * missed (the "should these clusters merge?" screen).
    *
    * Shape: pairs generate WEDGE-locally — one self-join of the
    * adjacency on the shared neighbor w, cost Σ_w deg(w)², the same
    * bucket-local bound as the winnowing pair stage; `maxDeg` caps the
    * wedge degree (the winnowing maxDf contract: hubs shared by
    * everyone carry ≈ no AA signal — 1/ln(deg) → 0 — but dominate the
    * quadratic cost, so excluding them is the documented recall trade
    * that keeps the stage linear); existing edges drop via one
    * anti-join. A common neighbor has deg ≥ 2 by construction, so
    * 1/ln(deg) is finite; each weight rounds to the 8dp grid at birth
    * and pair scores sum in DECIMAL. Output: top-k
    * (u, v, common, score) by (score DESC, u, v). */
  def adamicAdar(edges: DataFrame, srcCol: String, dstCol: String,
      topK: Int = 20, maxDeg: Int = Int.MaxValue): DataFrame = {
    val und = Checkpoints.iterationBarrier(symmetrize(edges, srcCol, dstCol))
    val deg = und.groupBy(col("a")).agg(count(lit(1)).as("deg"))
    // only deg ≥ 2 nodes can BE a common neighbor — filtering first also
    // keeps ANSI from evaluating 1/ln(1) on rows the wedge join would
    // drop anyway
    val w8 = und.join(deg.where(col("deg") >= 2 && col("deg") <= maxDeg), "a")
      .select(col("a").as("w"), col("b").as("n"),
        round(lit(1.0) / round(log(col("deg").cast("double")), 8), 8)
          .cast("decimal(28,8)").as("w8"))
    val u = w8.select(col("w"), col("n").as("u"), col("w8"))
    val v = w8.select(col("w"), col("n").as("v"))
    val scored = u.join(v, "w")
      .where(col("u") < col("v"))
      .groupBy(col("u"), col("v"))
      .agg(count(lit(1)).as("common"), sum(col("w8")).as("s"))
    scored
      .join(und.where(col("a") < col("b"))
          .select(col("a").as("u"), col("b").as("v")),
        Seq("u", "v"), "left_anti")
      .select(col("u"), col("v"), col("common"),
        round(col("s").cast("double"), 8).as("score"))
      .orderBy(col("score").desc, col("u"), col("v"))
      .limit(topK)
  }

  /** HITS hubs & authorities (Kleinberg 1999) after `iters` rounds over
    * the distinct directed edges, in EXACT integer fixed point: scores
    * live in 1e-8 units, and each round renormalizes by floor division
    *
    *   a(v) = (Σ_{u→v} h(u)) · 1e8 // Σ_v raw_a,
    *   h(u) = (Σ_{u→v} a(v)) · 1e8 // Σ_u raw_h
    *
    * so every intermediate is an exact DECIMAL integer (raw sums reach
    * |V|·1e8 ≈ 1e19 at a billion nodes — past BIGINT, inside
    * DECIMAL(38,0)/HUGEINT) and results are bit-identical across
    * engines and partitionings — the pageRank fixed-point discipline,
    * with per-round renormalization instead of damping because HITS
    * scores otherwise grow by a degree factor per round.
    *
    * Per-round cost: one join of edges against each score vector + two
    * aggregations — |E|-shaped, like pageRank. Output: (side ∈
    * {hub, auth}, node, score_e8) — score_e8/1e8 is the L1-normalized
    * score. */
  def hits(edges: DataFrame, srcCol: String, dstCol: String,
      iters: Int): DataFrame = {
    require(iters >= 1, s"iters=$iters")
    val e = Checkpoints.iterationBarrier(
      edges.select(col(srcCol).cast("long").as("src"),
          col(dstCol).cast("long").as("dst"))
        .where(col("src").isNotNull && col("dst").isNotNull)
        .distinct())
    val d38 = "decimal(38,0)"
    // exact floor division for non-negative decimals (the portable
    // (x − x mod s)/s form — Spark div and DuckDB // only agree on
    // non-negatives, which scores are)
    def fdiv(x: Column, s: Column): Column =
      ((x - pmod(x, s)) / s).cast(d38)

    val unit = lit(100000000L).cast(d38)
    var h = e.select(col("src").as("node")).distinct()
      .withColumn("h", unit)
    var a: DataFrame = null
    for (_ <- 1 to iters) {
      val rawA = e.join(h, e("src") === h("node"))
        .groupBy(col("dst")).agg(sum(col("h")).as("raw"))
      val sumA = rawA.agg(sum(col("raw")).as("t"))
      a = rawA.crossJoin(sumA)
        .select(col("dst").as("node"),
          fdiv(col("raw") * unit, col("t")).as("a"))
      a = Checkpoints.iterationBarrier(a)
      val rawH = e.join(a, e("dst") === a("node"))
        .groupBy(col("src")).agg(sum(col("a")).as("raw"))
      val sumH = rawH.agg(sum(col("raw")).as("t"))
      h = Checkpoints.iterationBarrier(rawH.crossJoin(sumH)
        .select(col("src").as("node"),
          fdiv(col("raw") * unit, col("t")).as("h")))
    }
    h.select(lit("hub").as("side"), col("node"),
        col("h").cast("long").as("score_e8"))
      .unionByName(a.select(lit("auth").as("side"), col("node"),
        col("a").cast("long").as("score_e8")))
  }
}
