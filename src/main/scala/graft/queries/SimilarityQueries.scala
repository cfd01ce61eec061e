package graft.queries

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

import graft.QuerySpec
import graft.engine.Tables
import graft.llm.Similarity

/** Embedding similarity search (brute-force cosine top-k, sign-LSH ANN,
  * embedding near-dup) over `embeddings` (64-dim float vectors).
  *
  * All dot products are sequential left-folds in double on both sides, so
  * cosines are bit-identical across engines and threshold/rank comparisons
  * never straddle an ulp. */
object SimilarityQueries {

  private def emb(s: SparkSession, dir: String): DataFrame =
    Tables.load(s, dir, "embeddings")

  /** Oracle fragment: sequential-fold dot product of doc lists a.v · b.v. */
  private[queries] def dotSql(a: String, b: String): String =
    s"list_reduce(list_prepend(CAST(0 AS DOUBLE), " +
      s"list_transform(range(1, len($a) + 1), i -> $a[i] * $b[i])), " +
      s"(acc, x) -> acc + x)"

  private[queries] val normCte =
    s"""n AS (
       |  SELECT vec_id, v, ${dotSql("v", "v")} AS n2
       |  FROM (SELECT vec_id, embedding::DOUBLE[] AS v FROM embeddings))""".stripMargin

  /** Oracle fragment: IVF cell assignment (`cent` + `assign` CTEs over
    * `n`), the same tree as [[Similarity.ivfCells]] — centroids are the
    * `numCells` lowest-id vectors, each vector routes to its
    * highest-cosine centroid, ties to the smaller centroid id. */
  private val cellAssignCte: String =
    s"""assign AS (
       |  SELECT id, v, n2, cell FROM (
       |    SELECT n.vec_id AS id, n.v, n.n2, cent.cid AS cell,
       |           ROW_NUMBER() OVER (PARTITION BY n.vec_id
       |             ORDER BY ${dotSql("n.v", "cent.cv")} / SQRT(n.n2 * cent.cn2) DESC,
       |                      cent.cid ASC) AS rn
       |    FROM n CROSS JOIN cent) t
       |  WHERE rn = 1)""".stripMargin

  private[queries] def ivfAssignCte(numCells: Int): String =
    s"""cent AS (SELECT vec_id AS cid, v AS cv, n2 AS cn2 FROM n
       |         WHERE vec_id IN (SELECT vec_id FROM n ORDER BY vec_id LIMIT $numCells)),
       |$cellAssignCte""".stripMargin

  /** AUTO-cell variant of [[ivfAssignCte]] — ⌊√n⌋ centroids (min 1)
    * derived from COUNT(*) OVER (), mirroring
    * [[graft.llm.Similarity.ivfCells]]' `numCells <= 0` contract
    * (IEEE sqrt is correctly rounded, so both engines floor the SAME
    * double). */
  private[queries] val ivfAssignCteAuto: String =
    s"""cent AS (
       |  SELECT vec_id AS cid, v AS cv, n2 AS cn2 FROM (
       |    SELECT vec_id, v, n2,
       |           ROW_NUMBER() OVER (ORDER BY vec_id) AS rn,
       |           COUNT(*) OVER () AS nn
       |    FROM n) t
       |  WHERE rn <= GREATEST(1, CAST(FLOOR(SQRT(nn)) AS BIGINT))),
       |$cellAssignCte""".stripMargin

  /** Multi-probe IVF oracle fragment (expects the `n` norm CTE): `pos`
    * filters zero-norm vectors, `cent` takes the lowest
    * GREATEST(1, n // targetCellSize) ids as centroids (integer division
    * — exact in both engines, mirroring
    * [[graft.llm.Similarity.ivfProbeTopKNeighbors]]), `ranked` scores
    * every (vector, centroid), `assign` is the single nearest cell (the
    * data side), `probes` the nprobe nearest (the query side). */
  private[queries] def ivfProbeCte(targetCellSize: Int, nprobe: Int): String =
    s"""pos AS (SELECT vec_id, v, n2 FROM n WHERE n2 > 0),
       |cent AS (
       |  SELECT vec_id AS cid, v AS cv, n2 AS cn2 FROM (
       |    SELECT vec_id, v, n2,
       |           ROW_NUMBER() OVER (ORDER BY vec_id) AS rn,
       |           COUNT(*) OVER () AS nn
       |    FROM pos) t
       |  WHERE rn <= GREATEST(1, nn // $targetCellSize)),
       |ranked AS (
       |  SELECT p.vec_id AS id, p.v, p.n2, cent.cid AS cell,
       |         ROW_NUMBER() OVER (PARTITION BY p.vec_id
       |           ORDER BY ${dotSql("p.v", "cent.cv")} / SQRT(p.n2 * cent.cn2) DESC,
       |                    cent.cid ASC) AS rn
       |  FROM pos p CROSS JOIN cent),
       |assign AS (SELECT id, v, n2, cell FROM ranked WHERE rn = 1),
       |probes AS (SELECT id, v, n2, cell FROM ranked WHERE rn <= $nprobe)""".stripMargin

  /** Two-level multi-probe IVF oracle fragment (expects the `n` norm
    * CTE), mirroring [[graft.llm.Similarity.ivfHierProbeTopKNeighbors]]:
    * `scent` takes the lowest ⌊√cells⌋ centroid ids as SUPER-centroids
    * (IEEE sqrt is correctly rounded, so both engines floor the same
    * integer), `cmap` assigns each centroid to its nearest super-cell,
    * `sroute` probes each vector's `sprobe` nearest super-cells, and
    * `ranked` scores only the centroids mapped to those super-cells —
    * a centroid maps to exactly one super-cell, so (vector, centroid)
    * rows are unique and the final `assign`/`probes` split is the flat
    * fragment's shape verbatim. */
  private[queries] def ivfHierProbeCte(targetCellSize: Int, nprobe: Int,
      sprobe: Int): String =
    s"""pos AS (SELECT vec_id, v, n2 FROM n WHERE n2 > 0),
       |cent AS (
       |  SELECT vec_id AS cid, v AS cv, n2 AS cn2 FROM (
       |    SELECT vec_id, v, n2,
       |           ROW_NUMBER() OVER (ORDER BY vec_id) AS rn,
       |           COUNT(*) OVER () AS nn
       |    FROM pos) t
       |  WHERE rn <= GREATEST(1, nn // $targetCellSize)),
       |scent AS (
       |  SELECT cid AS sid, cv AS sv, cn2 AS sn2 FROM (
       |    SELECT cid, cv, cn2,
       |           ROW_NUMBER() OVER (ORDER BY cid) AS rn,
       |           COUNT(*) OVER () AS nc
       |    FROM cent) t
       |  WHERE rn <= GREATEST(1, CAST(FLOOR(SQRT(CAST(nc AS DOUBLE)))
       |                               AS BIGINT))),
       |cmap AS (
       |  SELECT cid, cv, cn2, sid FROM (
       |    SELECT c.cid, c.cv, c.cn2, s.sid,
       |           ROW_NUMBER() OVER (PARTITION BY c.cid
       |             ORDER BY ${dotSql("c.cv", "s.sv")} / SQRT(c.cn2 * s.sn2) DESC,
       |                      s.sid ASC) AS rn
       |    FROM cent c CROSS JOIN scent s) t
       |  WHERE rn = 1),
       |sroute AS (
       |  SELECT id, v, n2, sid FROM (
       |    SELECT p.vec_id AS id, p.v, p.n2, s.sid,
       |           ROW_NUMBER() OVER (PARTITION BY p.vec_id
       |             ORDER BY ${dotSql("p.v", "s.sv")} / SQRT(p.n2 * s.sn2) DESC,
       |                      s.sid ASC) AS rn
       |    FROM pos p CROSS JOIN scent s) t
       |  WHERE rn <= $sprobe),
       |ranked AS (
       |  SELECT r.id, r.v, r.n2, m.cid AS cell,
       |         ROW_NUMBER() OVER (PARTITION BY r.id
       |           ORDER BY ${dotSql("r.v", "m.cv")} / SQRT(r.n2 * m.cn2) DESC,
       |                    m.cid ASC) AS rn
       |  FROM sroute r JOIN cmap m ON r.sid = m.sid),
       |assign AS (SELECT id, v, n2, cell FROM ranked WHERE rn = 1),
       |probes AS (SELECT id, v, n2, cell FROM ranked WHERE rn <= $nprobe)""".stripMargin

  /** Unrolled deterministic Lloyd chain over a (cid, cv, cn2) training
    * CTE — the SQL twin of [[graft.llm.Similarity.trainedCentroids]],
    * emitted once per index level by [[ivfHierTrainedProbeCte]]. Seeds
    * are the `k` lowest-cid training rows; each round is an exact
    * integer-L2 assign (ties to the smaller seed) + a mean update
    * `ROUND(SUM(xi)/2^20/COUNT, 8)` re-quantized via FLOOR. CTE names
    * carry `pfx` (f = fine level, s = super level); the final means live
    * in `${"$"}{pfx}tm${"$"}{iters}`. `cvx`/`tm` are MATERIALIZED —
    * DuckDB 1.0 re-inlines CTEs at every reference and both feed
    * multiple consumers. */
  private def lloydSql(pfx: String, train: String, kSel: String,
      iters: Int): String = {
    val cvx = s"${pfx}cvx"
    val head =
      s"""$cvx AS MATERIALIZED (
         |  SELECT cid, unnest(range(1, len(cv) + 1)) AS dim,
         |         unnest(list_transform(range(1, len(cv) + 1),
         |                  d -> CAST(FLOOR(cv[d] * 1048576.0) AS BIGINT)))
         |           AS xi
         |  FROM $train),
         |${pfx}seed AS (
         |  SELECT cid AS cluster FROM (
         |    SELECT cid, ROW_NUMBER() OVER (ORDER BY cid) AS rn
         |    FROM $train) t
         |  WHERE rn <= ($kSel)),
         |${pfx}tc0 AS (SELECT s.cluster, c.dim, c.xi AS ci
         |        FROM ${pfx}seed s JOIN $cvx c ON c.cid = s.cluster)""".stripMargin
    val rounds = (1 to iters).map { i =>
      s"""${pfx}td$i AS (SELECT c0.cid, c.cluster,
         |              SUM((c0.xi - c.ci) * (c0.xi - c.ci)) AS d2
         |       FROM $cvx c0 JOIN ${pfx}tc${i - 1} c USING (dim)
         |       GROUP BY c0.cid, c.cluster),
         |${pfx}ta$i AS (SELECT cid, cluster FROM (
         |         SELECT cid, cluster,
         |                ROW_NUMBER() OVER (PARTITION BY cid
         |                                   ORDER BY d2, cluster) AS rn
         |         FROM ${pfx}td$i) WHERE rn = 1),
         |${pfx}tm$i AS MATERIALIZED (
         |        SELECT a.cluster, c0.dim,
         |               ROUND(CAST(SUM(c0.xi) AS DOUBLE) / 1048576.0
         |                     / COUNT(*), 8) AS m
         |        FROM ${pfx}ta$i a JOIN $cvx c0 ON c0.cid = a.cid
         |        GROUP BY a.cluster, c0.dim),
         |${pfx}tc$i AS (SELECT cluster, dim,
         |               CAST(FLOOR(m * 1048576.0) AS BIGINT) AS ci
         |        FROM ${pfx}tm$i)""".stripMargin
    }
    (head +: rounds).mkString(",\n")
  }

  /** Collect a Lloyd chain's final means into a centroid table
    * (`$idc`, `$vc` list, `$n2c` sequential-fold norm). */
  private def lloydCentSql(pfx: String, out: String, iters: Int,
      idc: String, vc: String, n2c: String): String =
    s"""$out AS MATERIALIZED (
       |  SELECT $idc, $vc, ${dotSql(vc, vc)} AS $n2c FROM (
       |    SELECT cluster AS $idc, list(m ORDER BY dim) AS $vc
       |    FROM ${pfx}tm$iters GROUP BY cluster))""".stripMargin

  /** Two-level multi-probe IVF oracle fragment with BOTH index levels
    * K-MEANS-TRAINED (expects the `n` norm CTE), mirroring
    * [[graft.llm.Similarity.ivfHierProbeTopKNeighborsTrained]]: `kf`/`ks`
    * derive cells and ⌊√cells⌋, `fsamp` is the deterministic md5-ordered
    * corpus sample of 4·cells vectors re-labeled cid = 1..size in hash
    * order (the [[graft.llm.Similarity.hashSample]] contract), the `f`
    * Lloyd chain trains the FINE centroids `fcent` on it (k = cells),
    * the `s` Lloyd chain trains the SUPER-centroids `scent` on `fcent`
    * itself (k = ⌊√cells⌋ — the coarse level clusters the centroid
    * set), and the routing split (cmap/sroute/ranked/assign/probes) is
    * the [[ivfHierProbeCte]] shape verbatim over the trained tables. */
  private[queries] def ivfHierTrainedProbeCte(targetCellSize: Int,
      nprobe: Int, sprobe: Int, trainIters: Int): String = {
    require(trainIters >= 1, s"trainIters=$trainIters")
    val head =
      s"""pos AS MATERIALIZED (SELECT vec_id, v, n2 FROM n WHERE n2 > 0),
         |kf AS (SELECT GREATEST(1, COUNT(*) // $targetCellSize) AS k
         |       FROM pos),
         |ks AS (SELECT GREATEST(1, CAST(FLOOR(SQRT(CAST(k AS DOUBLE)))
         |                              AS BIGINT)) AS k FROM kf),
         |fsamp AS MATERIALIZED (
         |  SELECT cid, cv, cn2 FROM (
         |    SELECT ROW_NUMBER() OVER (ORDER BY md5(CAST(vec_id AS VARCHAR)),
         |                              vec_id) AS cid,
         |           v AS cv, n2 AS cn2
         |    FROM pos) t
         |  WHERE cid <= 4 * (SELECT k FROM kf))""".stripMargin
    val fine = lloydSql("f", "fsamp", "SELECT k FROM kf", trainIters)
    val fcent = lloydCentSql("f", "fcent", trainIters, "cid", "cv", "cn2")
    val coarse = lloydSql("s", "fcent", "SELECT k FROM ks", trainIters)
    val scent = lloydCentSql("s", "scent", trainIters, "sid", "sv", "sn2")
    val tail =
      s"""cmap AS (
         |  SELECT cid, cv, cn2, sid FROM (
         |    SELECT c.cid, c.cv, c.cn2, s.sid,
         |           ROW_NUMBER() OVER (PARTITION BY c.cid
         |             ORDER BY ${dotSql("c.cv", "s.sv")} / SQRT(c.cn2 * s.sn2) DESC,
         |                      s.sid ASC) AS rn
         |    FROM fcent c CROSS JOIN scent s) t
         |  WHERE rn = 1),
         |sroute AS (
         |  SELECT id, v, n2, sid FROM (
         |    SELECT p.vec_id AS id, p.v, p.n2, s.sid,
         |           ROW_NUMBER() OVER (PARTITION BY p.vec_id
         |             ORDER BY ${dotSql("p.v", "s.sv")} / SQRT(p.n2 * s.sn2) DESC,
         |                      s.sid ASC) AS rn
         |    FROM pos p CROSS JOIN scent s) t
         |  WHERE rn <= $sprobe),
         |ranked AS (
         |  SELECT r.id, r.v, r.n2, m.cid AS cell,
         |         ROW_NUMBER() OVER (PARTITION BY r.id
         |           ORDER BY ${dotSql("r.v", "m.cv")} / SQRT(r.n2 * m.cn2) DESC,
         |                    m.cid ASC) AS rn
         |  FROM sroute r JOIN cmap m ON r.sid = m.sid),
         |assign AS (SELECT id, v, n2, cell FROM ranked WHERE rn = 1),
         |probes AS (SELECT id, v, n2, cell FROM ranked WHERE rn <= $nprobe)""".stripMargin
    Seq(head, fine, fcent, coarse, scent, tail).mkString(",\n")
  }

  def specs: Seq[QuerySpec] = Seq(

    // Vector norms through the declarative HOF surface (zip_with squares →
    // aggregate left-fold): the built-in form of the embedding math the
    // native DotProductExpr accelerates elsewhere — map-only, and the
    // fold order matches DuckDB's list_reduce exactly. Intermediate
    // arrays materialize as projection columns first (HOF lambdas
    // re-evaluate non-attribute argument subtrees per element).
    QuerySpec("q_vec_norm", (s, dir) => {
      emb(s, dir)
        .withColumn("__v", transform(col("embedding"), _.cast("double")))
        .withColumn("__sq", zip_with(col("__v"), col("__v"), _ * _))
        .select(col("vec_id"),
          round(sqrt(aggregate(col("__sq"), lit(0.0), _ + _)), 8).as("l2_norm"),
          size(col("embedding")).cast("long").as("dim"))
        .orderBy("vec_id")
    }, Some(
      s"""WITH $normCte
         |SELECT vec_id, ROUND(sqrt(n2), 8) AS l2_norm,
         |       CAST(len(v) AS BIGINT) AS dim
         |FROM n ORDER BY vec_id""".stripMargin)),

    // Exact top-3 neighbors per vector (brute force + per-id window).
    QuerySpec("q_cosine_topk", (s, dir) => {
      Similarity.topKNeighbors(emb(s, dir), "vec_id", "embedding", k = 3)
        .withColumn("rnk", col("rank").cast("long")).drop("rank")
        .orderBy("id", "rnk")
    }, Some(
      s"""WITH $normCte,
         |p AS (
         |  SELECT a.vec_id AS id, b.vec_id AS neighbor_id,
         |         ${dotSql("a.v", "b.v")} / SQRT(a.n2 * b.n2) AS cos
         |  FROM n a JOIN n b ON a.vec_id <> b.vec_id),
         |r AS (
         |  SELECT id, neighbor_id, cos,
         |         ROW_NUMBER() OVER (PARTITION BY id ORDER BY cos DESC, neighbor_id) AS rnk
         |  FROM p)
         |SELECT id, neighbor_id, rnk, ROUND(cos, 8) AS cos
         |FROM r WHERE rnk <= 3 ORDER BY id, rnk""".stripMargin),
      headline = true),

    // Matryoshka truncation fidelity: top-10 cosine neighbor overlap
    // between the full 64-dim embedding and its first 16 dims for a
    // bounded query set — "can we serve the short vector" measured.
    QuerySpec("q_mrl_overlap", (s, dir) => {
      Similarity.mrlOverlap(emb(s, dir), "vec_id", "embedding",
          prefixDim = 16, k = 10, queryPred = col("qid") < 10)
        .orderBy("id")
    }, Some(
      s"""WITH n0 AS (
         |  SELECT vec_id, v, p, ${dotSql("v", "v")} AS n2,
         |         ${dotSql("p", "p")} AS np2
         |  FROM (SELECT vec_id, embedding::DOUBLE[] AS v,
         |               (embedding::DOUBLE[])[1:16] AS p
         |        FROM embeddings)),
         |n AS (SELECT * FROM n0 WHERE n2 > 0.0 AND np2 > 0.0),
         |q AS (SELECT * FROM n WHERE vec_id < 10),
         |pr AS (
         |  SELECT q.vec_id AS qid, n.vec_id AS id,
         |         ${dotSql("q.v", "n.v")} / SQRT(q.n2 * n.n2) AS cf,
         |         ${dotSql("q.p", "n.p")} / SQRT(q.np2 * n.np2) AS cp
         |  FROM q JOIN n ON q.vec_id <> n.vec_id),
         |rf AS (SELECT qid, id, ROW_NUMBER() OVER (PARTITION BY qid
         |                ORDER BY cf DESC, id) AS r FROM pr),
         |rp AS (SELECT qid, id, ROW_NUMBER() OVER (PARTITION BY qid
         |                ORDER BY cp DESC, id) AS r FROM pr),
         |ov AS (
         |  SELECT f.qid, COUNT(*) AS c
         |  FROM (SELECT qid, id FROM rf WHERE r <= 10) f
         |  JOIN (SELECT qid, id FROM rp WHERE r <= 10) p2
         |    ON f.qid = p2.qid AND f.id = p2.id
         |  GROUP BY f.qid)
         |SELECT q.vec_id AS id,
         |       ROUND(CAST(COALESCE(ov.c, 0) AS DOUBLE) / 10.0e0, 8)
         |         AS overlap
         |FROM q LEFT JOIN ov ON q.vec_id = ov.qid
         |ORDER BY id""".stripMargin)),

    // Embedding-cosine near-dup pairs (brute-force verification tier).
    QuerySpec("q_embed_neardup", (s, dir) => {
      Similarity.cosinePairs(emb(s, dir), "vec_id", "embedding", minCos = 0.4)
        .orderBy("id1", "id2")
    }, Some(
      s"""WITH $normCte,
         |p AS (
         |  SELECT a.vec_id AS id1, b.vec_id AS id2,
         |         ${dotSql("a.v", "b.v")} / SQRT(a.n2 * b.n2) AS cos
         |  FROM n a JOIN n b ON a.vec_id < b.vec_id)
         |SELECT id1, id2, ROUND(cos, 8) AS cos
         |FROM p WHERE cos >= 0.4 ORDER BY id1, id2""".stripMargin)),

    // Sign-LSH ANN: 8 md5-derived ±1 hyperplanes → 8-bit bucket; candidates
    // share a bucket, verified with exact cosine ≥ 0.3 — the O(n) scale
    // path (the oracle re-derives the identical planes in SQL).
    QuerySpec("q_ann_lsh", (s, dir) => {
      Similarity.annPairs(emb(s, dir), "vec_id", "embedding",
        planes = 8, minCos = 0.3)
        .orderBy("id1", "id2")
    }, Some(
      s"""WITH $normCte,
         |planes AS (
         |  SELECT p, list_transform(range(1, 65),
         |           i -> CASE WHEN (instr('0123456789abcdef',
         |                  substr(md5('hp' || p || '|' || (i - 1)), 1, 1)) - 1) % 2 = 0
         |                THEN CAST(1 AS DOUBLE) ELSE CAST(-1 AS DOUBLE) END) AS r
         |  FROM (SELECT unnest(range(0, 8)) AS p)),
         |vb AS (
         |  SELECT vec_id, p,
         |         CASE WHEN ${dotSql("v", "r")} >= 0 THEN '1' ELSE '0' END AS bit
         |  FROM n CROSS JOIN planes),
         |bk AS (
         |  SELECT vec_id, string_agg(bit, '' ORDER BY p) AS bucket
         |  FROM vb GROUP BY vec_id),
         |p2 AS (
         |  SELECT a.vec_id AS id1, b.vec_id AS id2,
         |         ${dotSql("na.v", "nb.v")} / SQRT(na.n2 * nb.n2) AS cos
         |  FROM bk a
         |  JOIN bk b ON a.bucket = b.bucket AND a.vec_id < b.vec_id
         |  JOIN n na ON na.vec_id = a.vec_id
         |  JOIN n nb ON nb.vec_id = b.vec_id)
         |SELECT id1, id2, ROUND(cos, 8) AS cos
         |FROM p2 WHERE cos >= 0.3 ORDER BY id1, id2""".stripMargin)),

    // Cross-corpus semantic contamination: eval vectors (vec_id % 50 = 0)
    // with a cosine ≥ 0.3 neighbor among train vectors, candidates from a
    // shared 4-plane sign-LSH bucketing (16 buckets — a bucket equi-join,
    // never eval × train). The embedding-space complement of the n-gram
    // q_contamination.
    QuerySpec("q_semantic_contamination", (s, dir) => {
      val e = emb(s, dir)
      Similarity.crossContamination(
          e.filter(pmod(col("vec_id"), lit(50)) === 0),
          e.filter(pmod(col("vec_id"), lit(50)) =!= 0),
          "vec_id", "embedding", planes = 4, minCos = 0.3)
        .orderBy("vec_id")
    }, Some(
      s"""WITH $normCte,
         |planes AS (
         |  SELECT p, list_transform(range(1, 65),
         |           i -> CASE WHEN (instr('0123456789abcdef',
         |                  substr(md5('hp' || p || '|' || (i - 1)), 1, 1)) - 1) % 2 = 0
         |                THEN CAST(1 AS DOUBLE) ELSE CAST(-1 AS DOUBLE) END) AS r
         |  FROM (SELECT unnest(range(0, 4)) AS p)),
         |vb AS (
         |  SELECT vec_id, p,
         |         CASE WHEN ${dotSql("v", "r")} >= 0 THEN '1' ELSE '0' END AS bit
         |  FROM n CROSS JOIN planes),
         |bk AS (
         |  SELECT vec_id, string_agg(bit, '' ORDER BY p) AS bucket
         |  FROM vb GROUP BY vec_id),
         |p2 AS (
         |  SELECT l.vec_id AS eval_id,
         |         ${dotSql("nl.v", "nr.v")} / SQRT(nl.n2 * nr.n2) AS cos
         |  FROM bk l
         |  JOIN bk r ON l.bucket = r.bucket
         |  JOIN n nl ON nl.vec_id = l.vec_id
         |  JOIN n nr ON nr.vec_id = r.vec_id
         |  WHERE l.vec_id % 50 = 0 AND r.vec_id % 50 <> 0)
         |SELECT eval_id AS vec_id, COUNT(*) AS n_neighbors,
         |       ROUND(MAX(cos), 8) AS max_cos
         |FROM p2 WHERE cos >= 0.3
         |GROUP BY eval_id ORDER BY vec_id""".stripMargin)),

    // IVF ANN: nearest-of-16-centroids cell assignment (deterministic
    // tiebreak), intra-cell candidate search, exact-cosine verification.
    QuerySpec("q_ann_ivf", (s, dir) => {
      Similarity.ivfPairs(emb(s, dir), "vec_id", "embedding",
        numCells = 16, minCos = 0.3)
        .orderBy("id1", "id2")
    }, Some(
      s"""WITH $normCte,
         |${ivfAssignCte(16)},
         |p2 AS (
         |  SELECT a.id AS id1, b.id AS id2,
         |         ${dotSql("a.v", "b.v")} / SQRT(a.n2 * b.n2) AS cos
         |  FROM assign a JOIN assign b ON a.cell = b.cell AND a.id < b.id)
         |SELECT id1, id2, ROUND(cos, 8) AS cos
         |FROM p2 WHERE cos >= 0.3 ORDER BY id1, id2""".stripMargin)),

    // Hard-negative mining: per vector, the 3 highest-cosine SAME-CELL
    // vectors with a DIFFERENT label — the confusable negatives a
    // contrastive trainer wants (vs q_neg_sample's uniform draws). Same
    // IVF cell-equi-join cost shape as q_ann_ivf; the oracle replays
    // the assignment and the cell-local label-filtered top-k.
    QuerySpec("q_hard_negatives", (s, dir) => {
      Similarity.hardNegatives(emb(s, dir), "vec_id", "embedding",
          "label", k = 3, numCells = 16)
        .withColumn("rnk", col("rank").cast("long")).drop("rank")
        .orderBy("id", "rnk")
    }, Some(
      s"""WITH $normCte,
         |${ivfAssignCte(16)},
         |lbl AS (SELECT vec_id AS id, label AS l FROM embeddings),
         |p AS (
         |  SELECT a.id AS id, b.id AS neg_id,
         |         ${dotSql("a.v", "b.v")} / SQRT(a.n2 * b.n2) AS cos
         |  FROM assign a JOIN assign b
         |    ON a.cell = b.cell AND a.id <> b.id
         |  JOIN lbl la ON la.id = a.id
         |  JOIN lbl lb ON lb.id = b.id
         |  WHERE la.l <> lb.l),
         |r AS (
         |  SELECT id, neg_id, cos,
         |         ROW_NUMBER() OVER (PARTITION BY id
         |                            ORDER BY cos DESC, neg_id) AS rnk
         |  FROM p)
         |SELECT id, neg_id, rnk, ROUND(cos, 8) AS cos
         |FROM r WHERE rnk <= 3 ORDER BY id, rnk""".stripMargin)),

    // Int8-quantized cosine pairs: symmetric per-vector scalar
    // quantization (q = round(127·v/amax)); the uniform scale cancels in
    // cosine, so scores come from exact integer dot products — the
    // 4×-smaller storage/bandwidth tier of a 100 TB similarity pipeline.
    // Deterministic ±1 random projection to 8 dims (JL sketch tier):
    // md5-nibble sign matrix, exact fixed-point signed sums — the oracle
    // replays the identical matrix and arithmetic relationally.
    QuerySpec("q_rand_proj", (s, dir) => {
      Similarity.randomProjection(emb(s, dir), "vec_id", "embedding",
          outDim = 8)
        .orderBy("vec_id", "dim")
    }, Some(
      """WITH base AS (SELECT vec_id, embedding::DOUBLE[] AS v FROM embeddings),
        |vx AS (
        |  SELECT vec_id,
        |         unnest(range(1, len(v) + 1)) AS i,
        |         unnest(list_transform(range(1, len(v) + 1),
        |                  k -> CAST(FLOOR(v[k] * 1048576.0) AS BIGINT))) AS xi
        |  FROM base),
        |g AS (SELECT unnest(range(1, 9)) AS j),
        |s AS (
        |  SELECT vec_id, j,
        |         SUM(xi * (((instr('0123456789abcdef',
        |                      substr(md5('rp|' || CAST(i AS VARCHAR) || '|' ||
        |                             CAST(j AS VARCHAR)), 1, 1)) - 1) % 2) * 2 - 1)) AS acc
        |  FROM vx CROSS JOIN g GROUP BY vec_id, j)
        |SELECT vec_id, CAST(j AS BIGINT) AS dim,
        |       ROUND(CAST(acc AS DOUBLE) / 1048576.0, 8) AS value
        |FROM s ORDER BY vec_id, dim""".stripMargin)),

    QuerySpec("q_quantized_cos", (s, dir) => {
      Similarity.quantizedCosPairs(emb(s, dir), "vec_id", "embedding",
        minCos = 0.4)
        .orderBy("id1", "id2")
    }, Some(
      """WITH base AS (
        |  SELECT vec_id, v,
        |         list_aggregate(list_transform(v, x -> abs(x)), 'max') AS amax
        |  FROM (SELECT vec_id, embedding::DOUBLE[] AS v FROM embeddings)),
        |qv AS (
        |  SELECT vec_id,
        |         CASE WHEN amax <> 0
        |              THEN list_transform(v, x -> CAST(round(x * 127.0 / amax) AS BIGINT))
        |              ELSE list_transform(v, x -> CAST(0 AS BIGINT)) END AS q
        |  FROM base),
        |qn AS (
        |  SELECT vec_id, q,
        |         CAST(list_sum(list_transform(range(1, len(q) + 1), i -> q[i] * q[i])) AS DOUBLE) AS qn2
        |  FROM qv),
        |p AS (
        |  SELECT a.vec_id AS id1, b.vec_id AS id2,
        |         CAST(list_sum(list_transform(range(1, len(a.q) + 1), i -> a.q[i] * b.q[i])) AS DOUBLE)
        |           / SQRT(a.qn2 * b.qn2) AS qcos
        |  FROM qn a JOIN qn b ON a.vec_id < b.vec_id)
        |SELECT id1, id2, ROUND(qcos, 8) AS qcos
        |FROM p WHERE qcos >= 0.4 ORDER BY id1, id2""".stripMargin)),

    // Per-label embedding centroids (IVF training step / class
    // prototypes): fixed-point component sums (float→double→×2^20→floor
    // → exact long) so no float summation order exists on either engine.
    QuerySpec("q_embed_centroids", (s, dir) => {
      Similarity.labelCentroids(emb(s, dir), "label", "embedding")
        .orderBy("label", "dim")
    }, Some(
      """WITH e AS (SELECT label, embedding::DOUBLE[] AS v FROM embeddings),
        |x AS (
        |  SELECT label, v, unnest(range(1, len(v) + 1)) AS dim FROM e),
        |f AS (
        |  SELECT label, dim, CAST(FLOOR(v[dim] * 1048576.0) AS BIGINT) AS xi
        |  FROM x)
        |SELECT label, dim, COUNT(*) AS n,
        |       ROUND(CAST(SUM(xi) AS DOUBLE) / 1048576.0 / COUNT(*), 8) AS centroid
        |FROM f GROUP BY label, dim ORDER BY label, dim""".stripMargin)),

    // Nearest-centroid assignment (IVF routing / nearest-prototype
    // classification): exact fixed-point dot per (vector, label) — an
    // integer sum, so bit-deterministic; argmax ties to smallest label.
    QuerySpec("q_nearest_centroid", (s, dir) => {
      val e = emb(s, dir)
      val cents = Similarity.labelCentroids(e, "label", "embedding")
      Similarity.nearestCentroids(e, "vec_id", "embedding", cents)
        .orderBy("vec_id")
    }, Some(
      """WITH e AS (SELECT label, vec_id, embedding::DOUBLE[] AS v FROM embeddings),
        |xd AS (
        |  SELECT label, vec_id, v, unnest(range(1, len(v) + 1)) AS dim FROM e),
        |f AS (
        |  SELECT label, vec_id, dim,
        |         CAST(FLOOR(v[dim] * 1048576.0) AS BIGINT) AS xi
        |  FROM xd),
        |cent AS (
        |  SELECT label, dim,
        |         CAST(FLOOR(ROUND(CAST(SUM(xi) AS DOUBLE) / 1048576.0 / COUNT(*), 8)
        |                    * 1048576.0) AS BIGINT) AS ci
        |  FROM f GROUP BY label, dim),
        |scores AS (
        |  SELECT f.vec_id, c.label,
        |         CAST(SUM(f.xi * c.ci) AS BIGINT) AS s
        |  FROM f JOIN cent c USING (dim)
        |  GROUP BY f.vec_id, c.label),
        |ranked AS (
        |  SELECT vec_id, label, s,
        |         ROW_NUMBER() OVER (PARTITION BY vec_id
        |                            ORDER BY s DESC, label) AS rn
        |  FROM scores)
        |SELECT vec_id, label AS assigned_label,
        |       ROUND(CAST(s AS DOUBLE) / 1099511627776.0, 8) AS score
        |FROM ranked WHERE rn = 1 ORDER BY vec_id""".stripMargin)),

    // Deterministic k-means (k=4, 2 Lloyd iterations): lowest-id seeds,
    // exact fixed-point distances and centroid updates — the oracle
    // unrolls both iterations in SQL. Cluster labels are the seed ids.
    QuerySpec("q_kmeans", (s, dir) => {
      Similarity.kmeansAssign(emb(s, dir), "vec_id", "embedding",
          k = 4, iters = 2)
        .orderBy("vec_id")
    }, Some(
      s"""WITH $kmeansA2Cte
        |SELECT vec_id, cluster AS cluster_id FROM a2 ORDER BY vec_id""".stripMargin)),

    // Product quantization codes (PQ): 64-dim vectors → 8 subspaces × 16
    // codebook entries (subvectors of the 16 lowest-id vectors), nearest
    // entry by exact fixed-point integer L2 per subspace, ties to the
    // smallest code. The oracle replays codebook, distances, and argmin
    // relationally — every value is an exact integer.
    QuerySpec("q_pq_codes", (s, dir) => {
      Similarity.pqCodes(emb(s, dir), "vec_id", "embedding", m = 8, ksub = 16)
        .orderBy("vec_id", "subspace")
    }, Some(
      s"""WITH $pqCte
        |SELECT vec_id, s AS subspace, code, d2 FROM a
        |ORDER BY vec_id, subspace""".stripMargin)),

    // Asymmetric-distance (ADC) top-k over PQ codes: full-precision query
    // → per-query LUT of exact integer subspace distances → distance to a
    // coded vector = sum of LUT entries for its codes; top-5 per query,
    // ties to the smallest neighbor id, self excluded. The scan side
    // reads only the codes — the PQ promise at scale.
    QuerySpec("q_pq_adc", (s, dir) => {
      Similarity.pqAdcTopK(emb(s, dir), "vec_id", "embedding", m = 8,
          ksub = 16, queryIds = Seq(20L, 21L, 22L), k = 5)
        .orderBy("query_id", "rank")
    }, Some(
      s"""WITH $pqCte,
        |q AS (
        |  SELECT vec_id AS qid, s, j, xi FROM vx WHERE vec_id IN (20, 21, 22)),
        |lut AS (
        |  SELECT q.qid, q.s, cb.code,
        |         CAST(SUM((q.xi - cb.ci) * (q.xi - cb.ci)) AS BIGINT) AS ld2
        |  FROM q JOIN cb ON q.s = cb.s AND q.j = cb.j
        |  GROUP BY q.qid, q.s, cb.code),
        |adc AS (
        |  SELECT l.qid, a.vec_id, CAST(SUM(l.ld2) AS BIGINT) AS d2
        |  FROM a JOIN lut l ON a.s = l.s AND a.code = l.code
        |  WHERE a.vec_id <> l.qid
        |  GROUP BY l.qid, a.vec_id),
        |ranked AS (
        |  SELECT qid, vec_id, d2,
        |         ROW_NUMBER() OVER (PARTITION BY qid
        |                            ORDER BY d2, vec_id) AS rank
        |  FROM adc)
        |SELECT qid AS query_id, vec_id AS neighbor_id,
        |       CAST(rank AS INT) AS rank, d2
        |FROM ranked WHERE rank <= 5
        |ORDER BY query_id, rank""".stripMargin)),

    // PQ candidate-generation + exact re-rank (the production PQ shape:
    // ADC is a candidate GENERATOR, not a ranker): ADC picks the top-40
    // candidates per query (8×k, ties to the smallest id), then the
    // candidate set alone fetches full fixed-point vectors and re-ranks
    // by exact integer L2 over all 64 components. The oracle chains the
    // shared PQ CTE with the candidate cut and the exact re-rank join.
    QuerySpec("q_pq_rerank", (s, dir) => {
      Similarity.pqAdcRerank(emb(s, dir), "vec_id", "embedding", m = 8,
          ksub = 16, queryIds = Seq(20L, 21L, 22L), k = 5, cand = 40)
        .orderBy("query_id", "rank")
    }, Some(
      s"""WITH $pqCte,
        |q AS (
        |  SELECT vec_id AS qid, s, j, xi FROM vx WHERE vec_id IN (20, 21, 22)),
        |lut AS (
        |  SELECT q.qid, q.s, cb.code,
        |         CAST(SUM((q.xi - cb.ci) * (q.xi - cb.ci)) AS BIGINT) AS ld2
        |  FROM q JOIN cb ON q.s = cb.s AND q.j = cb.j
        |  GROUP BY q.qid, q.s, cb.code),
        |adc AS (
        |  SELECT l.qid, a.vec_id, CAST(SUM(l.ld2) AS BIGINT) AS ad2
        |  FROM a JOIN lut l ON a.s = l.s AND a.code = l.code
        |  WHERE a.vec_id <> l.qid
        |  GROUP BY l.qid, a.vec_id),
        |cands AS (
        |  SELECT qid, vec_id FROM (
        |    SELECT qid, vec_id,
        |           ROW_NUMBER() OVER (PARTITION BY qid
        |                              ORDER BY ad2, vec_id) AS crank
        |    FROM adc) t
        |  WHERE crank <= 40),
        |ex AS (
        |  SELECT c.qid, c.vec_id,
        |         CAST(SUM((nv.xi - q.xi) * (nv.xi - q.xi)) AS BIGINT) AS d2
        |  FROM cands c
        |  JOIN vx nv ON nv.vec_id = c.vec_id
        |  JOIN q ON q.qid = c.qid AND q.s = nv.s AND q.j = nv.j
        |  GROUP BY c.qid, c.vec_id),
        |ranked AS (
        |  SELECT qid, vec_id, d2,
        |         ROW_NUMBER() OVER (PARTITION BY qid
        |                            ORDER BY d2, vec_id) AS rank
        |  FROM ex)
        |SELECT qid AS query_id, vec_id AS neighbor_id,
        |       CAST(rank AS INT) AS rank, d2
        |FROM ranked WHERE rank <= 5
        |ORDER BY query_id, rank""".stripMargin)),

    // Reciprocal-rank fusion (Cormack et al. 2009, k=60) of the exact
    // cosine ranking and the PQ-ADC approximate ranking for the same
    // queries — the standard ensemble step of hybrid retrieval, and the
    // recall audit for the compressed tier (an ADC-only neighbor
    // surfacing high in the fusion = quantization disagreement worth
    // inspecting). Rank lists are output-sized (|queries|·k), so fusion
    // is a full-outer join + one bounded window — free after the two
    // retrievers.
    QuerySpec("q_rrf_fusion", (s, dir) => {
      import org.apache.spark.sql.expressions.Window
      val qids = Seq(20L, 21L, 22L)
      val e = emb(s, dir)
      val exact = Similarity.topKNeighbors(e, "vec_id", "embedding", k = 5)
        .where(col("id").isin(qids: _*))
        .select(col("id").as("query_id"), col("neighbor_id"),
          col("rank").as("r1"))
      val adc = Similarity.pqAdcTopK(e, "vec_id", "embedding", m = 8,
          ksub = 16, queryIds = qids, k = 5)
        .select(col("query_id"), col("neighbor_id"), col("rank").as("r2"))
      val rrf = round(
        coalesce(lit(1.0) / (col("r1") + lit(60)).cast("double"), lit(0.0)) +
          coalesce(lit(1.0) / (col("r2") + lit(60)).cast("double"), lit(0.0)),
        8)
      val w = Window.partitionBy(col("query_id"))
        .orderBy(col("rrf").desc, col("neighbor_id").asc)
      exact.join(adc, Seq("query_id", "neighbor_id"), "full_outer")
        .withColumn("rrf", rrf)
        .withColumn("fused_rank", row_number().over(w).cast("int"))
        .where(col("fused_rank") <= 5)
        .select(col("query_id"), col("neighbor_id"), col("fused_rank"),
          col("rrf"), col("r1"), col("r2"))
        .orderBy("query_id", "fused_rank")
    }, Some(
      s"""WITH $normCte,
        |$pqCte,
        |q AS (
        |  SELECT vec_id AS qid, s, j, xi FROM vx WHERE vec_id IN (20, 21, 22)),
        |lut AS (
        |  SELECT q.qid, q.s, cb.code,
        |         CAST(SUM((q.xi - cb.ci) * (q.xi - cb.ci)) AS BIGINT) AS ld2
        |  FROM q JOIN cb ON q.s = cb.s AND q.j = cb.j
        |  GROUP BY q.qid, q.s, cb.code),
        |adc AS (
        |  SELECT l.qid, a.vec_id, CAST(SUM(l.ld2) AS BIGINT) AS d2
        |  FROM a JOIN lut l ON a.s = l.s AND a.code = l.code
        |  WHERE a.vec_id <> l.qid
        |  GROUP BY l.qid, a.vec_id),
        |adcr AS (
        |  SELECT qid AS query_id, vec_id AS neighbor_id,
        |         ROW_NUMBER() OVER (PARTITION BY qid
        |                            ORDER BY d2, vec_id) AS r2
        |  FROM adc),
        |a1 AS (SELECT query_id, neighbor_id, r2 FROM adcr WHERE r2 <= 5),
        |cosp AS (
        |  SELECT a.vec_id AS query_id, b.vec_id AS neighbor_id,
        |         ${dotSql("a.v", "b.v")} / SQRT(a.n2 * b.n2) AS cos
        |  FROM n a JOIN n b ON a.vec_id <> b.vec_id
        |  WHERE a.vec_id IN (20, 21, 22)),
        |cosr AS (
        |  SELECT query_id, neighbor_id,
        |         ROW_NUMBER() OVER (PARTITION BY query_id
        |                            ORDER BY cos DESC, neighbor_id) AS r1
        |  FROM cosp),
        |e1 AS (SELECT query_id, neighbor_id, r1 FROM cosr WHERE r1 <= 5),
        |f AS (
        |  SELECT COALESCE(e1.query_id, a1.query_id) AS query_id,
        |         COALESCE(e1.neighbor_id, a1.neighbor_id) AS neighbor_id,
        |         e1.r1, a1.r2
        |  FROM e1 FULL OUTER JOIN a1
        |    ON e1.query_id = a1.query_id AND e1.neighbor_id = a1.neighbor_id),
        |g AS (
        |  SELECT query_id, neighbor_id,
        |         CAST(r1 AS INT) AS r1, CAST(r2 AS INT) AS r2,
        |         ROUND(COALESCE(CAST(1.0 AS DOUBLE) / CAST(60 + r1 AS DOUBLE),
        |                        CAST(0.0 AS DOUBLE))
        |               + COALESCE(CAST(1.0 AS DOUBLE) / CAST(60 + r2 AS DOUBLE),
        |                          CAST(0.0 AS DOUBLE)), 8) AS rrf
        |  FROM f),
        |h AS (
        |  SELECT query_id, neighbor_id, rrf, r1, r2,
        |         ROW_NUMBER() OVER (PARTITION BY query_id
        |                            ORDER BY rrf DESC, neighbor_id) AS fused_rank
        |  FROM g)
        |SELECT query_id, neighbor_id, CAST(fused_rank AS INT) AS fused_rank,
        |       rrf, r1, r2
        |FROM h WHERE fused_rank <= 5
        |ORDER BY query_id, fused_rank""".stripMargin)),

    // IVF-PQ (FAISS IVFADC layout): route to the cosine-nearest IVF cell,
    // rank the cell's candidates by PQ asymmetric distance — cell prunes
    // the scan, codes shrink the rest ~32×. The oracle chains the IVF
    // assignment CTE with the PQ CTE verbatim.
    QuerySpec("q_ivf_pq", (s, dir) => {
      Similarity.pqIvfTopK(emb(s, dir), "vec_id", "embedding",
          numCells = 16, m = 8, ksub = 16, queryIds = Seq(20L, 21L, 22L), k = 5)
        .orderBy("query_id", "rank")
    }, Some(
      s"""WITH $normCte,
        |cent AS (SELECT vec_id AS cid, v AS cv, n2 AS cn2 FROM n
         |         WHERE vec_id IN (SELECT vec_id FROM n ORDER BY vec_id LIMIT 16)),
        |assign AS (
        |  SELECT id, cell FROM (
        |    SELECT n.vec_id AS id, cent.cid AS cell,
        |           ROW_NUMBER() OVER (PARTITION BY n.vec_id
        |             ORDER BY ${dotSql("n.v", "cent.cv")} / SQRT(n.n2 * cent.cn2) DESC,
        |                      cent.cid ASC) AS rn
        |    FROM n CROSS JOIN cent) t
        |  WHERE rn = 1),
        |$pqCte,
        |qc AS (SELECT id AS qid, cell FROM assign WHERE id IN (20, 21, 22)),
        |q AS (
        |  SELECT vec_id AS qid, s, j, xi FROM vx WHERE vec_id IN (20, 21, 22)),
        |lut AS (
        |  SELECT q.qid, q.s, cb.code,
        |         CAST(SUM((q.xi - cb.ci) * (q.xi - cb.ci)) AS BIGINT) AS ld2
        |  FROM q JOIN cb ON q.s = cb.s AND q.j = cb.j
        |  GROUP BY q.qid, q.s, cb.code),
        |adc AS (
        |  SELECT qc.qid, a.vec_id, CAST(SUM(l.ld2) AS BIGINT) AS d2
        |  FROM a JOIN assign av ON av.id = a.vec_id
        |  JOIN qc ON qc.cell = av.cell AND a.vec_id <> qc.qid
        |  JOIN lut l ON l.qid = qc.qid AND l.s = a.s AND l.code = a.code
        |  GROUP BY qc.qid, a.vec_id),
        |ranked AS (
        |  SELECT qid, vec_id, d2,
        |         ROW_NUMBER() OVER (PARTITION BY qid
        |                            ORDER BY d2, vec_id) AS rank
        |  FROM adc)
        |SELECT qid AS query_id, vec_id AS neighbor_id,
        |       CAST(rank AS INT) AS rank, d2
        |FROM ranked WHERE rank <= 5
        |ORDER BY query_id, rank""".stripMargin)),

    // IVF-PQ + exact re-rank (the full FAISS-default retrieval shape:
    // route → compress → re-rank): the query's cell prunes the scan, ADC
    // ranks the cell's codes, the top-40 candidates (8×k) alone fetch
    // full fixed-point vectors for the exact integer L2 final ranking.
    QuerySpec("q_ivf_pq_rerank", (s, dir) => {
      Similarity.pqIvfRerank(emb(s, dir), "vec_id", "embedding",
          numCells = 16, m = 8, ksub = 16, queryIds = Seq(20L, 21L, 22L),
          k = 5, cand = 40)
        .orderBy("query_id", "rank")
    }, Some(
      s"""WITH $normCte,
        |cent AS (SELECT vec_id AS cid, v AS cv, n2 AS cn2 FROM n
         |         WHERE vec_id IN (SELECT vec_id FROM n ORDER BY vec_id LIMIT 16)),
        |assign AS (
        |  SELECT id, cell FROM (
        |    SELECT n.vec_id AS id, cent.cid AS cell,
        |           ROW_NUMBER() OVER (PARTITION BY n.vec_id
        |             ORDER BY ${dotSql("n.v", "cent.cv")} / SQRT(n.n2 * cent.cn2) DESC,
        |                      cent.cid ASC) AS rn
        |    FROM n CROSS JOIN cent) t
        |  WHERE rn = 1),
        |$pqCte,
        |qc AS (SELECT id AS qid, cell FROM assign WHERE id IN (20, 21, 22)),
        |q AS (
        |  SELECT vec_id AS qid, s, j, xi FROM vx WHERE vec_id IN (20, 21, 22)),
        |lut AS (
        |  SELECT q.qid, q.s, cb.code,
        |         CAST(SUM((q.xi - cb.ci) * (q.xi - cb.ci)) AS BIGINT) AS ld2
        |  FROM q JOIN cb ON q.s = cb.s AND q.j = cb.j
        |  GROUP BY q.qid, q.s, cb.code),
        |adc AS (
        |  SELECT qc.qid, a.vec_id, CAST(SUM(l.ld2) AS BIGINT) AS ad2
        |  FROM a JOIN assign av ON av.id = a.vec_id
        |  JOIN qc ON qc.cell = av.cell AND a.vec_id <> qc.qid
        |  JOIN lut l ON l.qid = qc.qid AND l.s = a.s AND l.code = a.code
        |  GROUP BY qc.qid, a.vec_id),
        |cands AS (
        |  SELECT qid, vec_id FROM (
        |    SELECT qid, vec_id,
        |           ROW_NUMBER() OVER (PARTITION BY qid
        |                              ORDER BY ad2, vec_id) AS crank
        |    FROM adc) t
        |  WHERE crank <= 40),
        |ex AS (
        |  SELECT c.qid, c.vec_id,
        |         CAST(SUM((nv.xi - q.xi) * (nv.xi - q.xi)) AS BIGINT) AS d2
        |  FROM cands c
        |  JOIN vx nv ON nv.vec_id = c.vec_id
        |  JOIN q ON q.qid = c.qid AND q.s = nv.s AND q.j = nv.j
        |  GROUP BY c.qid, c.vec_id),
        |ranked AS (
        |  SELECT qid, vec_id, d2,
        |         ROW_NUMBER() OVER (PARTITION BY qid
        |                            ORDER BY d2, vec_id) AS rank
        |  FROM ex)
        |SELECT qid AS query_id, vec_id AS neighbor_id,
        |       CAST(rank AS INT) AS rank, d2
        |FROM ranked WHERE rank <= 5
        |ORDER BY query_id, rank""".stripMargin)),

    // SemDeDup (cluster-then-compare semantic dedup): k-means cells from
    // the same deterministic Lloyd unroll, exact cosine only WITHIN each
    // cell, drop-the-higher-id greedy rule. The oracle reuses the k-means
    // CTE and mirrors the intra-cluster pair join.
    QuerySpec("q_semantic_dedup", (s, dir) => {
      Similarity.semanticDedup(emb(s, dir), "vec_id", "embedding",
          k = 4, iters = 2, minCos = 0.4)
        .orderBy("vec_id")
    }, Some(
      s"""WITH $kmeansA2Cte,
         |nn AS (SELECT e.vec_id, e.v, ${dotSql("e.v", "e.v")} AS n2 FROM e),
         |dp AS (
         |  SELECT y.vec_id AS dropped
         |  FROM a2 x JOIN a2 y ON x.cluster = y.cluster AND x.vec_id < y.vec_id
         |  JOIN nn a ON a.vec_id = x.vec_id
         |  JOIN nn b ON b.vec_id = y.vec_id
         |  WHERE (CASE WHEN SQRT(a.n2 * b.n2) <> 0
         |          THEN ${dotSql("a.v", "b.v")} / SQRT(a.n2 * b.n2) END) >= 0.4),
         |dd AS (SELECT DISTINCT dropped FROM dp)
         |SELECT a2.vec_id, a2.cluster AS cluster_id,
         |       (dd.dropped IS NULL) AS kept
         |FROM a2 LEFT JOIN dd ON dd.dropped = a2.vec_id
         |ORDER BY vec_id""".stripMargin))
  )

  /** PQ CTE chain (shared by q_pq_codes and q_pq_adc): fixed-point
    * subspace explode `vx(vec_id, s, j, xi)` → codebook `cb` (subvectors
    * of the 16 lowest-id vectors) → per-(vector, subspace, code) exact
    * integer L2 `d` → argmin assignment `a(vec_id, s, code, d2)`. */
  private val pqCte: String =
      """e AS (SELECT vec_id, embedding::DOUBLE[] AS v FROM embeddings),
        |xd AS (SELECT vec_id, v, unnest(range(1, len(v) + 1)) AS dim FROM e),
        |vx AS (SELECT vec_id,
        |              CAST((dim - 1) // 8 AS BIGINT) AS s,
        |              CAST((dim - 1) % 8 AS BIGINT) AS j,
        |              CAST(FLOOR(v[dim] * 1048576.0) AS BIGINT) AS xi
        |       FROM xd),
        |cb AS (SELECT vec_id AS code, s, j, xi AS ci FROM vx
        |       WHERE vec_id IN (SELECT vec_id FROM e ORDER BY vec_id LIMIT 16)),
        |d AS (SELECT vx.vec_id, vx.s, cb.code,
        |             CAST(SUM((vx.xi - cb.ci) * (vx.xi - cb.ci)) AS BIGINT) AS d2
        |      FROM vx JOIN cb ON vx.s = cb.s AND vx.j = cb.j
        |      GROUP BY vx.vec_id, vx.s, cb.code),
        |a AS (SELECT vec_id, s, code, d2 FROM (
        |        SELECT vec_id, s, code, d2,
        |               ROW_NUMBER() OVER (PARTITION BY vec_id, s
        |                                  ORDER BY d2, code) AS rn
        |        FROM d) WHERE rn = 1)""".stripMargin

  /** Deterministic k-means CTE chain (shared by q_kmeans and
    * q_semantic_dedup): seeds → 2 unrolled Lloyd rounds → final
    * assignment `a2(vec_id, cluster)`, with `e(vec_id, v)` the
    * double-cast embeddings. */
  private val kmeansA2Cte: String =
      """e AS (SELECT vec_id, embedding::DOUBLE[] AS v FROM embeddings),
        |xd AS (SELECT vec_id, v, unnest(range(1, len(v) + 1)) AS dim FROM e),
        |vx AS (SELECT vec_id, dim,
        |              CAST(FLOOR(v[dim] * 1048576.0) AS BIGINT) AS xi
        |       FROM xd),
        |seeds AS (SELECT vec_id AS cluster FROM e ORDER BY vec_id LIMIT 4),
        |c0 AS (SELECT s.cluster, vx.dim, vx.xi AS ci
        |       FROM seeds s JOIN vx ON vx.vec_id = s.cluster),
        |d1 AS (SELECT vx.vec_id, c.cluster,
        |              SUM((vx.xi - c.ci) * (vx.xi - c.ci)) AS d2
        |       FROM vx JOIN c0 c USING (dim) GROUP BY vx.vec_id, c.cluster),
        |a1 AS (SELECT vec_id, cluster FROM (
        |         SELECT vec_id, cluster,
        |                ROW_NUMBER() OVER (PARTITION BY vec_id
        |                                   ORDER BY d2, cluster) AS rn
        |         FROM d1) WHERE rn = 1),
        |c1 AS (SELECT a.cluster, vx.dim,
        |              CAST(FLOOR(ROUND(CAST(SUM(vx.xi) AS DOUBLE) / 1048576.0
        |                               / COUNT(*), 8) * 1048576.0) AS BIGINT) AS ci
        |       FROM a1 a JOIN vx ON vx.vec_id = a.vec_id
        |       GROUP BY a.cluster, vx.dim),
        |d2c AS (SELECT vx.vec_id, c.cluster,
        |               SUM((vx.xi - c.ci) * (vx.xi - c.ci)) AS d2
        |        FROM vx JOIN c1 c USING (dim) GROUP BY vx.vec_id, c.cluster),
        |a2 AS (SELECT vec_id, cluster FROM (
        |         SELECT vec_id, cluster,
        |                ROW_NUMBER() OVER (PARTITION BY vec_id
        |                                   ORDER BY d2, cluster) AS rn
        |         FROM d2c) WHERE rn = 1)""".stripMargin
}
