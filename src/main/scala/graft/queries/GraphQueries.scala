package graft.queries

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

import graft.QuerySpec
import graft.engine.Tables
import graft.llm.{Dedup, Graph}

/** Graph operators over relational edge derivations: PageRank (the
  * source-authority ranking a web-curation pipeline weights domains by)
  * and per-node triangle counts (cluster-cohesion diagnostics over the
  * near-dup pair graph). Both are exact-integer formulations, so the
  * DuckDB oracles replay them bit-identically — PageRank by unrolling
  * the damped iterations as CTEs (the PCA-power-iteration trick).
  */
object GraphQueries {

  private def docs(s: SparkSession, dir: String): DataFrame =
    Tables.load(s, dir, "documents")

  /** customer → supplier purchase edges (supplier ids offset so the two
    * key spaces cannot collide in one node namespace). */
  private def purchaseEdges(s: SparkSession, dir: String): DataFrame = {
    val o = Tables.load(s, dir, "orders")
    val l = Tables.load(s, dir, "lineitem")
    o.join(l, o("o_orderkey") === l("l_orderkey"))
      .select(col("o_custkey").as("src"),
        (col("l_suppkey") + 1000000L).as("dst"))
  }

  /** Fixed-point PageRank oracle: S = 2^30, d = 17/20, `iters` unrolled
    * contribution/update CTE rounds (all floor division on non-negative
    * BIGINTs — exact in both engines). */
  private def pageRankOracle(iters: Int): String = {
    val S = "CAST(1073741824 AS BIGINT)"
    val rounds = (1 to iters).map { k =>
      val prev = s"r${k - 1}"
      s"""c$k AS MATERIALIZED (
         |  SELECT e.dst AS node, CAST(SUM(r.r // d.deg) AS BIGINT) AS s
         |  FROM e JOIN deg d ON d.src = e.src JOIN $prev r ON r.node = e.src
         |  GROUP BY e.dst),
         |r$k AS MATERIALIZED (
         |  SELECT nodes.node,
         |         CAST((3 * $S) // (20 * nn.n)
         |              + (17 * COALESCE(c.s, 0)) // 20 AS BIGINT) AS r
         |  FROM nodes CROSS JOIN nn LEFT JOIN c$k c ON c.node = nodes.node)"""
        .stripMargin
    }.mkString(",\n")
    s"""WITH e AS MATERIALIZED (
       |  SELECT DISTINCT o_custkey AS src,
       |         l_suppkey + 1000000 AS dst
       |  FROM orders JOIN lineitem ON l_orderkey = o_orderkey),
       |nodes AS MATERIALIZED (SELECT src AS node FROM e UNION SELECT dst FROM e),
       |nn AS (SELECT COUNT(*) AS n FROM nodes),
       |deg AS MATERIALIZED (SELECT src, COUNT(*) AS deg FROM e GROUP BY src),
       |r0 AS MATERIALIZED (SELECT node, CAST($S // nn.n AS BIGINT) AS r
       |       FROM nodes CROSS JOIN nn),
       |$rounds
       |SELECT node, ROUND(CAST(r AS DOUBLE) / 1073741824.0, 8) AS rank
       |FROM r$iters ORDER BY node""".stripMargin
  }

  def specs: Seq[QuerySpec] = Seq(

    // PageRank (3 damped rounds, exact 2^30 fixed point) over the
    // customer -> supplier purchase graph: per-iteration cost is one
    // edges ⋈ ranks join plus one contribution aggregation — the |E|-
    // proportional shape that holds at web scale. The oracle unrolls the
    // identical integer solve.
    QuerySpec("q_pagerank", (s, dir) => {
      Graph.pageRank(purchaseEdges(s, dir), "src", "dst", iters = 3)
        .orderBy("node")
    }, Some(pageRankOracle(3))),

    // Per-node triangle counts over the MinHash-LSH near-dup pair graph
    // (duplicate clusters are near-cliques, so triangle density is the
    // cohesion diagnostic separating tight duplicate groups from chains
    // of borderline pairs). Low->high orientation generates each wedge at
    // its lowest-id apex exactly once — the degeneracy-bounded shape.
    QuerySpec("q_triangles", (s, dir) => {
      val pairs = Dedup.minhashNearDups(docs(s, dir), "doc_id", "text",
          n = 3, bands = 3, rowsPerBand = 3, threshold = 0.5)
        .select("id1", "id2")
      Graph.triangleCounts(pairs, "id1", "id2")
        .orderBy("node")
    }, Some(
      s"""WITH ${DedupQueries.shingleCte},
         |${DedupQueries.minhashPairsCte},
         |und AS MATERIALIZED (SELECT id1 AS a, id2 AS b FROM mh_pairs),
         |tri AS (
         |  SELECT ab.a AS a, ab.b AS b, ac.b AS c
         |  FROM und ab
         |  JOIN und ac ON ac.a = ab.a AND ac.b > ab.b
         |  JOIN und bc ON bc.a = ab.b AND bc.b = ac.b),
         |tn AS (SELECT unnest([a, b, c]) AS node FROM tri)
         |SELECT node, COUNT(*) AS triangles
         |FROM tn GROUP BY node ORDER BY node""".stripMargin)),

    // Label propagation (3 synchronous rounds, deterministic min-tie
    // argmax) over the near-dup pair graph: frequency-based communities
    // beside q_dup_clusters' reachability components — a chain of
    // borderline pairs is ONE component but splits into several
    // communities. Per round: one |E| join + one (node,label) count —
    // the PageRank cost shape; the oracle unrolls identical rounds.
    QuerySpec("q_label_prop", (s, dir) => {
      val pairs = Dedup.minhashNearDups(docs(s, dir), "doc_id", "text",
          n = 3, bands = 3, rowsPerBand = 3, threshold = 0.5)
        .select("id1", "id2")
      Graph.labelPropagation(pairs, "id1", "id2", iters = 3)
        .orderBy("node")
    }, Some {
      val rounds = (1 to 3).map { k =>
        s"""l$k AS MATERIALIZED (
           |  SELECT node, lbl FROM (
           |    SELECT node, lbl,
           |           ROW_NUMBER() OVER (PARTITION BY node
           |                              ORDER BY n DESC, lbl) AS rn
           |    FROM (SELECT u.a AS node, p.lbl AS lbl, COUNT(*) AS n
           |          FROM und u JOIN l${k - 1} p ON p.node = u.b
           |          GROUP BY u.a, p.lbl))
           |  WHERE rn = 1)""".stripMargin
      }.mkString(",\n")
      s"""WITH ${DedupQueries.shingleCte},
         |${DedupQueries.minhashPairsCte},
         |und AS MATERIALIZED (SELECT id1 AS a, id2 AS b FROM mh_pairs
         |        UNION SELECT id2, id1 FROM mh_pairs),
         |l0 AS MATERIALIZED (SELECT DISTINCT a AS node, a AS lbl FROM und),
         |$rounds
         |SELECT node, lbl AS community FROM l3 ORDER BY node""".stripMargin
    }),

    // Multi-source BFS hop distances (4 frontier rounds) from one
    // nation's customers through the UNDIRECTED customer~supplier
    // purchase graph — the blast-radius / link-distance audit shape.
    // Per round one frontier⋈edges join + a map-side-combinable min
    // aggregation; the oracle unrolls identical union+min rounds.
    QuerySpec("q_bfs_hops", (s, dir) => {
      val sources = Tables.load(s, dir, "customer")
        .where(col("c_nationkey") === 1)
      Graph.bfsHops(purchaseEdges(s, dir), "src", "dst",
          sources, "c_custkey", maxHops = 4)
        .orderBy("node")
    }, Some {
      val rounds = (1 to 4).map { k =>
        s"""d$k AS MATERIALIZED (
           |  SELECT node, MIN(dist) AS dist FROM (
           |    SELECT node, dist FROM d${k - 1}
           |    UNION ALL
           |    SELECT e.b AS node, $k AS dist
           |    FROM e JOIN d${k - 1} p ON p.node = e.a AND p.dist = ${k - 1})
           |  GROUP BY node)""".stripMargin
      }.mkString(",\n")
      s"""WITH e0 AS MATERIALIZED (
         |  SELECT DISTINCT o_custkey AS src, l_suppkey + 1000000 AS dst
         |  FROM orders JOIN lineitem ON l_orderkey = o_orderkey),
         |e AS MATERIALIZED (SELECT src AS a, dst AS b FROM e0
         |      UNION SELECT dst, src FROM e0),
         |d0 AS MATERIALIZED (SELECT DISTINCT c_custkey AS node, 0 AS dist
         |       FROM customer WHERE c_nationkey = 1),
         |$rounds
         |SELECT node, dist FROM d4 ORDER BY node""".stripMargin
    }),

    // 2-core of the near-dup graph (3 peel rounds — GraphSpec asserts
    // the fixpoint lands within them on this corpus): chains and
    // tendrils of borderline pairs peel away, near-clique duplicate
    // communities survive — the density screen on top of reachability
    // (q_dup_clusters) and frequency (q_label_prop). Each round is one
    // degree count + two semi-joins, |E|-shaped.
    QuerySpec("q_kcore", (s, dir) => {
      val pairs = Dedup.minhashNearDups(docs(s, dir), "doc_id", "text",
          n = 3, bands = 3, rowsPerBand = 3, threshold = 0.5)
        .select("id1", "id2")
      Graph.kCore(pairs, "id1", "id2", k = 2, iters = 3)
        .orderBy("node")
    }, Some {
      val rounds = (1 to 3).map { k =>
        s"""a$k AS MATERIALIZED (SELECT a FROM e${k - 1} GROUP BY a HAVING COUNT(*) >= 2),
           |e$k AS MATERIALIZED (SELECT e.a, e.b FROM e${k - 1} e
           |        JOIN a$k x ON e.a = x.a JOIN a$k y ON e.b = y.a)"""
          .stripMargin
      }.mkString(",\n")
      s"""WITH ${DedupQueries.shingleCte},
         |${DedupQueries.minhashPairsCte},
         |e0 AS MATERIALIZED (SELECT id1 AS a, id2 AS b FROM mh_pairs
         |       UNION SELECT id2, id1 FROM mh_pairs),
         |$rounds
         |SELECT a AS node, COUNT(*) AS deg FROM e3
         |GROUP BY a ORDER BY node""".stripMargin
    }),

    // Adamic–Adar link prediction over the part–supplier co-supply
    // graph (supplier ids offset into their own key space): ranks
    // supplier pairs by shared RARE parts — wedge-local pair generation
    // (Σ deg² like the winnowing stage) with maxDeg = 100 excluding the
    // supplier-side hubs (deg ≈ 600: near-zero 1/ln signal, quadratic
    // cost — the documented maxDf-style cap), 8dp 1/ln weights, DECIMAL
    // pair sums.
    QuerySpec("q_adamic_adar", (s, dir) => {
      val li = Tables.load(s, dir, "lineitem")
        .select((col("l_suppkey") + 1000000L).as("src"),
          col("l_partkey").as("dst"))
      Graph.adamicAdar(li, "src", "dst", topK = 20, maxDeg = 100)
    }, Some(
      s"""WITH e AS MATERIALIZED (
         |  SELECT DISTINCT l_suppkey + 1000000 AS a, l_partkey AS b
         |  FROM lineitem
         |  UNION
         |  SELECT DISTINCT l_partkey, l_suppkey + 1000000 FROM lineitem),
         |deg AS MATERIALIZED (SELECT a, COUNT(*) AS deg FROM e GROUP BY a),
         |w8 AS MATERIALIZED (
         |  SELECT e.a AS w, e.b AS n,
         |         CAST(ROUND(CAST(1.0 AS DOUBLE)
         |                    / ROUND(LN(CAST(deg AS DOUBLE)), 8), 8)
         |              AS DECIMAL(28,8)) AS w8
         |  FROM e JOIN deg ON deg.a = e.a
         |  WHERE deg >= 2 AND deg <= 100),
         |p AS (
         |  SELECT u.n AS u, v.n AS v, COUNT(*) AS common, SUM(u.w8) AS s
         |  FROM w8 u JOIN w8 v ON u.w = v.w AND u.n < v.n
         |  GROUP BY 1, 2),
         |np AS (
         |  SELECT p.u, p.v, p.common, p.s
         |  FROM p LEFT JOIN e ON e.a = p.u AND e.b = p.v
         |  WHERE e.a IS NULL)
         |SELECT u, v, common, ROUND(CAST(s AS DOUBLE), 8) AS score
         |FROM np ORDER BY score DESC, u, v LIMIT 20""".stripMargin)),

    // HITS hubs & authorities over the purchase graph (hubs = customers,
    // authorities = suppliers) — exact integer e8 fixed point with
    // per-round L1 renormalization; the oracle unrolls the rounds on
    // HUGEINT floor division.
    QuerySpec("q_hits", (s, dir) => {
      Graph.hits(purchaseEdges(s, dir), "src", "dst", iters = 3)
        .orderBy("side", "node")
    }, Some {
      val rounds = (1 to 3).map { k =>
        s"""ra$k AS MATERIALIZED (
           |  SELECT e.dst AS node, CAST(SUM(h.h) AS HUGEINT) AS raw
           |  FROM e JOIN h${k - 1} h ON h.node = e.src GROUP BY e.dst),
           |ta$k AS (SELECT SUM(raw) AS t FROM ra$k),
           |a$k AS MATERIALIZED (SELECT node, (raw * 100000000) // t AS a
           |        FROM ra$k CROSS JOIN ta$k),
           |rh$k AS MATERIALIZED (
           |  SELECT e.src AS node, CAST(SUM(a.a) AS HUGEINT) AS raw
           |  FROM e JOIN a$k a ON a.node = e.dst GROUP BY e.src),
           |th$k AS (SELECT SUM(raw) AS t FROM rh$k),
           |h$k AS MATERIALIZED (SELECT node, (raw * 100000000) // t AS h
           |        FROM rh$k CROSS JOIN th$k)""".stripMargin
      }.mkString(",\n")
      s"""WITH e AS MATERIALIZED (
         |  SELECT DISTINCT o_custkey AS src,
         |         l_suppkey + 1000000 AS dst
         |  FROM orders JOIN lineitem ON l_orderkey = o_orderkey),
         |h0 AS MATERIALIZED (SELECT DISTINCT src AS node,
         |              CAST(100000000 AS HUGEINT) AS h FROM e),
         |$rounds
         |SELECT 'hub' AS side, node, CAST(h AS BIGINT) AS score_e8 FROM h3
         |UNION ALL
         |SELECT 'auth', node, CAST(a AS BIGINT) FROM a3
         |ORDER BY side, node""".stripMargin
    })
  )
}
