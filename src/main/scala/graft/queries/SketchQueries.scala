package graft.queries

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

import graft.QuerySpec
import graft.engine.Tables
import graft.llm.{Covariance, Sketches, TextAnalysis}

/** Sketch/summary-statistic operators: mergeable HLL cardinality, Count-Min
  * frequencies, and the Gram/covariance matrix aggregate — the
  * constant-state profiling passes a 100 TB corpus runs instead of exact
  * global aggregations. Every sketch is md5-derived and integer-exact, so
  * the DuckDB oracle replays the identical sketch (same buckets, same
  * estimates) in SQL.
  */
object SketchQueries {

  private def docs(s: SparkSession, dir: String): DataFrame =
    Tables.load(s, dir, "documents")

  /** Nibble-pair byte parse of md5 hex chars [p, p+1] (DuckDB side). */
  private def sqlHexByte(md5Expr: String, p: Int): String =
    s"((instr('0123456789abcdef', substr($md5Expr, $p, 1)) - 1) * 16 + " +
      s"(instr('0123456789abcdef', substr($md5Expr, ${p + 1}, 1)) - 1))"

  def specs: Seq[QuerySpec] = Seq(

    // HyperLogLog distinct users per event type (m=64, exact-integer
    // bucket sums, Flajolet estimate with the linear-counting small-range
    // branch — see Sketches.hllDistinct for the determinism contract).
    // exact_distinct rides along to expose the sketch error at test scale.
    QuerySpec("q_hll_distinct", (s, dir) => {
      Sketches.hllDistinct(Tables.events(s, dir), "event_type", "user_id")
        .orderBy("event_type")
    }, Some {
      val bMd5 = "md5('hllb|' || v)"
      s"""WITH v AS (
         |  SELECT event_type, CAST(user_id AS VARCHAR) AS v FROM events),
         |hb AS (
         |  SELECT event_type,
         |         ${sqlHexByte(bMd5, 1)} % 64 AS bucket,
         |         ltrim(substr(md5('hllr|' || v), 1, 16), '0') AS stripped
         |  FROM v),
         |r AS (
         |  SELECT event_type, bucket,
         |         LEAST(CASE WHEN stripped = '' THEN 65
         |                    ELSE (16 - length(stripped)) * 4
         |                         + CASE WHEN substr(stripped, 1, 1) = '1' THEN 3
         |                                WHEN substr(stripped, 1, 1) IN ('2','3') THEN 2
         |                                WHEN substr(stripped, 1, 1) IN ('4','5','6','7') THEN 1
         |                                ELSE 0 END + 1 END, 48) AS rho
         |  FROM hb),
         |pb AS (SELECT event_type, bucket, MAX(rho) AS rmax
         |       FROM r GROUP BY event_type, bucket),
         |sk AS (
         |  SELECT event_type,
         |         CAST(SUM(CAST(1 AS BIGINT) << (48 - rmax)) AS BIGINT)
         |           + (64 - COUNT(*)) * (CAST(1 AS BIGINT) << 48) AS s48,
         |         COUNT(*) AS buckets_used
         |  FROM pb GROUP BY event_type),
         |ex AS (SELECT event_type, COUNT(DISTINCT user_id) AS exact_distinct
         |       FROM events GROUP BY event_type),
         |est AS (
         |  SELECT event_type, buckets_used,
         |         CAST(0.709 AS DOUBLE) * CAST(64.0 AS DOUBLE)
         |           * CAST(64.0 AS DOUBLE) * CAST(281474976710656.0 AS DOUBLE)
         |           / CAST(s48 AS DOUBLE) AS raw
         |  FROM sk)
         |SELECT est.event_type,
         |       CASE WHEN raw <= CAST(160.0 AS DOUBLE) AND buckets_used < 64
         |            THEN ROUND(CAST(64.0 AS DOUBLE)
         |                       * ln(CAST(64.0 AS DOUBLE)
         |                            / CAST(64 - buckets_used AS DOUBLE)), 8)
         |            ELSE ROUND(raw, 8) END AS hll_estimate,
         |       buckets_used, exact_distinct
         |FROM est JOIN ex USING (event_type) ORDER BY event_type""".stripMargin
    }),

    // Join-size estimation by CMS inner product (AMS/Cormode-
    // Muthukrishnan): |orders ⋈ lineitem| on orderkey from two d×w
    // integer sketches — the cardinality estimate a cost-based planner
    // wants BEFORE paying for the join. Exact integer arithmetic end to
    // end; the true size rides along at test scale.
    QuerySpec("q_join_size_est", (s, dir) => {
      Sketches.cmsJoinSize(
        Tables.load(s, dir, "orders"), "o_orderkey",
        Tables.load(s, dir, "lineitem"), "l_orderkey")
    }, Some {
      def cellSql(vExpr: String) =
        sqlHexByte(s"md5('cms' || CAST(r AS VARCHAR) || '|' || $vExpr)", 1) +
          " % 128"
      s"""WITH ra AS (
         |  SELECT CAST(o_orderkey AS VARCHAR) AS value, unnest(range(4)) AS r
         |  FROM orders),
         |sa AS (
         |  SELECT r, ${cellSql("value")} AS cell, COUNT(*) AS ca
         |  FROM ra GROUP BY 1, 2),
         |rb AS (
         |  SELECT CAST(l_orderkey AS VARCHAR) AS value, unnest(range(4)) AS r
         |  FROM lineitem),
         |sb AS (
         |  SELECT r, ${cellSql("value")} AS cell, COUNT(*) AS cb
         |  FROM rb GROUP BY 1, 2),
         |ip AS (
         |  SELECT sa.r, CAST(SUM(sa.ca * sb.cb) AS BIGINT) AS ip
         |  FROM sa JOIN sb ON sa.r = sb.r AND sa.cell = sb.cell
         |  GROUP BY sa.r),
         |rid AS (SELECT unnest(range(4)) AS r),
         |e AS (SELECT CAST(MIN(COALESCE(ip.ip, 0)) AS BIGINT) AS est
         |      FROM rid LEFT JOIN ip ON ip.r = rid.r),
         |xa AS (SELECT CAST(o_orderkey AS VARCHAR) AS value, COUNT(*) AS na
         |       FROM orders GROUP BY 1),
         |xb AS (SELECT CAST(l_orderkey AS VARCHAR) AS value, COUNT(*) AS nb
         |       FROM lineitem GROUP BY 1),
         |x AS (SELECT CAST(COALESCE(SUM(na * nb), 0) AS BIGINT) AS exact
         |      FROM xa JOIN xb USING (value))
         |SELECT est, exact, 4 AS d, 128 AS w FROM e CROSS JOIN x""".stripMargin
    }),

    // HLL SET ALGEBRA: pairwise audience overlap between event types —
    // |A|, |B|, bucket-max |A∪B|, and |A∩B| by inclusion–exclusion, all
    // from the same per-type sketch states (|G|²·64 sketch rows, data-
    // independent after the one bucket-build pass). exact_intersect
    // rides along for the error column at test scale.
    QuerySpec("q_hll_intersect", (s, dir) => {
      Sketches.hllIntersect(Tables.events(s, dir), "event_type", "user_id")
        .orderBy("g1", "g2")
    }, Some {
      val bMd5 = "md5('hllb|' || v)"
      val estCase = (rawCol: String, usedCol: String) =>
        s"""CASE WHEN $rawCol <= CAST(160.0 AS DOUBLE) AND $usedCol < 64
           |     THEN ROUND(CAST(64.0 AS DOUBLE)
           |                * ln(CAST(64.0 AS DOUBLE)
           |                     / CAST(64 - $usedCol AS DOUBLE)), 8)
           |     ELSE ROUND($rawCol, 8) END""".stripMargin
      s"""WITH v AS (
         |  SELECT event_type, CAST(user_id AS VARCHAR) AS v FROM events),
         |hb AS (
         |  SELECT event_type,
         |         ${sqlHexByte(bMd5, 1)} % 64 AS bucket,
         |         ltrim(substr(md5('hllr|' || v), 1, 16), '0') AS stripped
         |  FROM v),
         |r AS (
         |  SELECT event_type, bucket,
         |         LEAST(CASE WHEN stripped = '' THEN 65
         |                    ELSE (16 - length(stripped)) * 4
         |                         + CASE WHEN substr(stripped, 1, 1) = '1' THEN 3
         |                                WHEN substr(stripped, 1, 1) IN ('2','3') THEN 2
         |                                WHEN substr(stripped, 1, 1) IN ('4','5','6','7') THEN 1
         |                                ELSE 0 END + 1 END, 48) AS rho
         |  FROM hb),
         |pb AS (SELECT event_type AS g, bucket, MAX(rho) AS rmax
         |       FROM r GROUP BY event_type, bucket),
         |sk1 AS (
         |  SELECT g,
         |         CAST(SUM(CAST(1 AS BIGINT) << (48 - rmax)) AS BIGINT)
         |           + (64 - COUNT(*)) * (CAST(1 AS BIGINT) << 48) AS s48,
         |         COUNT(*) AS used
         |  FROM pb GROUP BY g),
         |e1 AS (
         |  SELECT g, ${estCase(
        "(CAST(0.709 AS DOUBLE) * CAST(64.0 AS DOUBLE) * CAST(64.0 AS DOUBLE)" +
          " * CAST(281474976710656.0 AS DOUBLE) / CAST(s48 AS DOUBLE))", "used")}
         |           AS e
         |  FROM sk1),
         |gs AS (SELECT DISTINCT g FROM pb),
         |pairs AS (SELECT a.g AS g1, b.g AS g2 FROM gs a JOIN gs b ON a.g < b.g),
         |ps AS (
         |  SELECT g1, g2, bucket, MAX(rmax) AS rmax FROM (
         |    SELECT p.g1, p.g2, s.bucket, s.rmax
         |    FROM pairs p JOIN pb s ON s.g = p.g1
         |    UNION ALL
         |    SELECT p.g1, p.g2, s.bucket, s.rmax
         |    FROM pairs p JOIN pb s ON s.g = p.g2)
         |  GROUP BY g1, g2, bucket),
         |sku AS (
         |  SELECT g1, g2,
         |         CAST(SUM(CAST(1 AS BIGINT) << (48 - rmax)) AS BIGINT)
         |           + (64 - COUNT(*)) * (CAST(1 AS BIGINT) << 48) AS s48,
         |         COUNT(*) AS used
         |  FROM ps GROUP BY g1, g2),
         |eu AS (
         |  SELECT g1, g2, ${estCase(
        "(CAST(0.709 AS DOUBLE) * CAST(64.0 AS DOUBLE) * CAST(64.0 AS DOUBLE)" +
          " * CAST(281474976710656.0 AS DOUBLE) / CAST(s48 AS DOUBLE))", "used")}
         |           AS est_union
         |  FROM sku),
         |dv AS (SELECT DISTINCT event_type AS g, user_id FROM events),
         |ex AS (
         |  SELECT a.g AS g1, b.g AS g2, COUNT(*) AS exact_intersect
         |  FROM dv a JOIN dv b ON a.user_id = b.user_id AND a.g < b.g
         |  GROUP BY a.g, b.g)
         |SELECT eu.g1, eu.g2, ea.e AS est_a, eb.e AS est_b, eu.est_union,
         |       ROUND(ea.e + eb.e - eu.est_union, 8) AS est_intersect,
         |       COALESCE(ex.exact_intersect, 0) AS exact_intersect
         |FROM eu
         |JOIN e1 ea ON ea.g = eu.g1
         |JOIN e1 eb ON eb.g = eu.g2
         |LEFT JOIN ex ON ex.g1 = eu.g1 AND ex.g2 = eu.g2
         |ORDER BY eu.g1, eu.g2""".stripMargin
    }),

    // Sketch MERGEABILITY, proven end-to-end: the global distinct-user
    // estimate computed by merging the five per-event-type sketches
    // (max per bucket — sketches only, no rescan) must equal the direct
    // global sketch; the oracle derives both and the hash compare pins
    // merged == direct in both engines.
    QuerySpec("q_hll_merge", (s, dir) => {
      Sketches.hllMergeAll(Tables.events(s, dir), "event_type", "user_id")
    }, Some {
      val bMd5 = "md5('hllb|' || v)"
      s"""WITH v AS (
         |  SELECT event_type, CAST(user_id AS VARCHAR) AS v FROM events),
         |hb AS (
         |  SELECT event_type,
         |         ${sqlHexByte(bMd5, 1)} % 64 AS bucket,
         |         ltrim(substr(md5('hllr|' || v), 1, 16), '0') AS stripped
         |  FROM v),
         |r AS (
         |  SELECT event_type, bucket,
         |         LEAST(CASE WHEN stripped = '' THEN 65
         |                    ELSE (16 - length(stripped)) * 4
         |                         + CASE WHEN substr(stripped, 1, 1) = '1' THEN 3
         |                                WHEN substr(stripped, 1, 1) IN ('2','3') THEN 2
         |                                WHEN substr(stripped, 1, 1) IN ('4','5','6','7') THEN 1
         |                                ELSE 0 END + 1 END, 48) AS rho
         |  FROM hb),
         |pb AS (SELECT event_type, bucket, MAX(rho) AS rmax
         |       FROM r GROUP BY event_type, bucket),
         |mrg AS (SELECT bucket, MAX(rmax) AS rmax FROM pb GROUP BY bucket),
         |dir AS (SELECT bucket, MAX(rho) AS rmax FROM r GROUP BY bucket),
         |est_m AS (
         |  SELECT CAST(SUM(CAST(1 AS BIGINT) << (48 - rmax)) AS BIGINT)
         |           + (64 - COUNT(*)) * (CAST(1 AS BIGINT) << 48) AS s48,
         |         COUNT(*) AS bu
         |  FROM mrg),
         |est_d AS (
         |  SELECT CAST(SUM(CAST(1 AS BIGINT) << (48 - rmax)) AS BIGINT)
         |           + (64 - COUNT(*)) * (CAST(1 AS BIGINT) << 48) AS s48,
         |         COUNT(*) AS bu
         |  FROM dir),
         |fm AS (
         |  SELECT CASE WHEN CAST(0.709 AS DOUBLE) * CAST(64.0 AS DOUBLE)
         |                   * CAST(64.0 AS DOUBLE) * CAST(281474976710656.0 AS DOUBLE)
         |                   / CAST(s48 AS DOUBLE) <= CAST(160.0 AS DOUBLE) AND bu < 64
         |              THEN ROUND(CAST(64.0 AS DOUBLE)
         |                         * ln(CAST(64.0 AS DOUBLE) / CAST(64 - bu AS DOUBLE)), 8)
         |              ELSE ROUND(CAST(0.709 AS DOUBLE) * CAST(64.0 AS DOUBLE)
         |                         * CAST(64.0 AS DOUBLE) * CAST(281474976710656.0 AS DOUBLE)
         |                         / CAST(s48 AS DOUBLE), 8) END AS merged_estimate
         |  FROM est_m),
         |fd AS (
         |  SELECT CASE WHEN CAST(0.709 AS DOUBLE) * CAST(64.0 AS DOUBLE)
         |                   * CAST(64.0 AS DOUBLE) * CAST(281474976710656.0 AS DOUBLE)
         |                   / CAST(s48 AS DOUBLE) <= CAST(160.0 AS DOUBLE) AND bu < 64
         |              THEN ROUND(CAST(64.0 AS DOUBLE)
         |                         * ln(CAST(64.0 AS DOUBLE) / CAST(64 - bu AS DOUBLE)), 8)
         |              ELSE ROUND(CAST(0.709 AS DOUBLE) * CAST(64.0 AS DOUBLE)
         |                         * CAST(64.0 AS DOUBLE) * CAST(281474976710656.0 AS DOUBLE)
         |                         / CAST(s48 AS DOUBLE), 8) END AS direct_estimate
         |  FROM est_d),
         |ex AS (SELECT COUNT(DISTINCT user_id) AS exact_distinct FROM events)
         |SELECT merged_estimate, direct_estimate, exact_distinct
         |FROM fm CROSS JOIN fd CROSS JOIN ex""".stripMargin
    }),

    // Count-Min sketch (4×128) over document tokens, probed for every
    // distinct token: cms_est ≥ exact_cnt always (CM overestimation-only
    // guarantee — the spec asserts it).
    QuerySpec("q_cms_topk", (s, dir) => {
      val toks = docs(s, dir)
        .select(explode(TextAnalysis.tokens(col("text"))).as("token"))
      Sketches.cmsCounts(toks, "token")
        .select(col("value").as("token"), col("exact_cnt"), col("cms_est"))
        .orderBy("token")
    }, Some {
      def cMd5(tok: String) = s"md5('cms' || CAST(r AS VARCHAR) || '|' || $tok)"
      s"""WITH tk AS (
         |  SELECT unnest(list_filter(string_split_regex(lower(text), '[^a-z0-9]+'),
         |                x -> x <> '')) AS token
         |  FROM documents),
         |g AS (SELECT unnest(range(0, 4)) AS r),
         |cells AS (
         |  SELECT token, r, ${sqlHexByte(cMd5("token"), 1)} % 128 AS cell
         |  FROM tk CROSS JOIN g),
         |sketch AS (SELECT r, cell, COUNT(*) AS cnt FROM cells GROUP BY r, cell),
         |ex AS (SELECT token, COUNT(*) AS exact_cnt FROM tk GROUP BY token),
         |probe AS (
         |  SELECT ex.token, ex.exact_cnt, g.r,
         |         ${sqlHexByte(cMd5("ex.token"), 1)} % 128 AS cell
         |  FROM ex CROSS JOIN g)
         |SELECT p.token, p.exact_cnt, MIN(s.cnt) AS cms_est
         |FROM probe p JOIN sketch s USING (r, cell)
         |GROUP BY p.token, p.exact_cnt ORDER BY token""".stripMargin
    }),

    // Fixed-bin histogram quantiles of extended price per return flag —
    // the bounded-memory sketch tier beside the exact percentile
    // (q_group_quantiles): per-(group, bin) counts pre-reduce map-side,
    // estimate = upper edge of the ceil(q·n)-rank bin.
    QuerySpec("q_bin_quantiles", (s, dir) => {
      Sketches.binQuantiles(Tables.load(s, dir, "lineitem"),
          "l_returnflag", "l_extendedprice", binWidth = 100.0,
          qs = Seq(0.25, 0.5, 0.75, 0.95))
        .orderBy("l_returnflag", "q")
    }, Some(
      """WITH h AS (
        |  SELECT l_returnflag,
        |         CAST(FLOOR(CAST(l_extendedprice AS DOUBLE)
        |                    / CAST(100.0 AS DOUBLE)) AS BIGINT) AS bin,
        |         COUNT(*) AS cnt
        |  FROM lineitem GROUP BY l_returnflag, bin),
        |c AS (
        |  SELECT l_returnflag, bin,
        |         SUM(cnt) OVER (PARTITION BY l_returnflag ORDER BY bin) AS cum,
        |         SUM(cnt) OVER (PARTITION BY l_returnflag) AS n
        |  FROM h),
        |qx AS (SELECT CAST(unnest([0.25, 0.5, 0.75, 0.95]) AS DOUBLE) AS q),
        |cand AS (
        |  SELECT l_returnflag, q, bin, CAST(n AS BIGINT) AS n
        |  FROM c CROSS JOIN qx
        |  WHERE cum >= CEIL(q * n))
        |SELECT l_returnflag, q,
        |       ROUND(CAST(MIN(bin) + 1 AS DOUBLE) * CAST(100.0 AS DOUBLE), 8) AS est,
        |       n
        |FROM cand GROUP BY l_returnflag, q, n
        |ORDER BY l_returnflag, q""".stripMargin)),

    // Histogram-sketch merge, proven end-to-end (quantile counterpart of
    // q_hll_merge): per-event-type (bin, cnt) states merged by SUM — no
    // rescan — must yield the same quantile estimates as the direct
    // global histogram; the oracle derives both paths.
    QuerySpec("q_bin_quantile_merge", (s, dir) => {
      Sketches.binQuantileMerge(Tables.events(s, dir), "event_type",
          "value", binWidth = 5.0, qs = Seq(0.5, 0.9, 0.99))
        .orderBy("q")
    }, Some(
      """WITH b AS (
        |  SELECT event_type,
        |         CAST(FLOOR(CAST(value AS DOUBLE) / CAST(5.0 AS DOUBLE))
        |              AS BIGINT) AS bin
        |  FROM events),
        |pg AS (SELECT event_type, bin, COUNT(*) AS cnt
        |       FROM b GROUP BY event_type, bin),
        |mrg AS (SELECT bin, CAST(SUM(cnt) AS BIGINT) AS cnt
        |        FROM pg GROUP BY bin),
        |dct AS (SELECT bin, COUNT(*) AS cnt FROM b GROUP BY bin),
        |qx AS (SELECT CAST(unnest([0.5, 0.9, 0.99]) AS DOUBLE) AS q),
        |mc AS (SELECT bin, SUM(cnt) OVER (ORDER BY bin) AS cum,
        |              SUM(cnt) OVER () AS n FROM mrg),
        |dc AS (SELECT bin, SUM(cnt) OVER (ORDER BY bin) AS cum,
        |              SUM(cnt) OVER () AS n FROM dct),
        |mq AS (
        |  SELECT q, CAST(n AS BIGINT) AS n,
        |         ROUND(CAST(MIN(bin) + 1 AS DOUBLE) * CAST(5.0 AS DOUBLE), 8)
        |           AS merged_est
        |  FROM mc CROSS JOIN qx WHERE cum >= CEIL(q * n) GROUP BY q, n),
        |dq AS (
        |  SELECT q, CAST(n AS BIGINT) AS n,
        |         ROUND(CAST(MIN(bin) + 1 AS DOUBLE) * CAST(5.0 AS DOUBLE), 8)
        |           AS direct_est
        |  FROM dc CROSS JOIN qx WHERE cum >= CEIL(q * n) GROUP BY q, n)
        |SELECT mq.q, mq.n, mq.merged_est, dq.direct_est
        |FROM mq JOIN dq ON mq.q = dq.q AND mq.n = dq.n
        |ORDER BY mq.q""".stripMargin)),

    // Gram/covariance matrix of the embedding corpus (64×64 upper
    // triangle) via the native map-side-combining CovSums aggregate; the
    // oracle replays the identical fixed-point sums relationally.
    QuerySpec("q_embed_covariance", (s, dir) => {
      Covariance.covarianceCells(Tables.load(s, dir, "embeddings"),
          "embedding", dim = 64)
        .orderBy("i", "j")
    }, Some(
      s"""WITH $covCellsCte
        |SELECT i, j, n, cov FROM cc ORDER BY i, j""".stripMargin)),

    // Distributed PCA: CovSums sketch → driver power iteration (3 rounds,
    // exact 2^20 fixed point) → map-only projection. The oracle replays
    // the ENTIRE solve relationally — covariance cells, symmetric
    // expansion, three unrolled matrix-vector/renormalize rounds (exact
    // integer sums; the only float ops are IEEE-exact mul/div/sqrt), and
    // the fixed-point projection dot.
    QuerySpec("q_pca_project", (s, dir) => {
      graft.llm.Pca.pcaProject(Tables.load(s, dir, "embeddings"),
          "vec_id", "embedding", dim = 64, iters = 3)
        .orderBy("vec_id")
    }, Some {
      val iterCtes = (1 to 3).map { k =>
        val prev = if (k == 1) "v0" else s"v${k - 1}"
        s"""w$k AS (SELECT c.i, SUM(c.cfx * v.vj) AS w
           |        FROM cfull c JOIN $prev v ON v.j = c.j GROUP BY c.i),
           |d$k AS (SELECT i, CAST(FLOOR(w / 1048576.0) AS BIGINT) AS d FROM w$k),
           |s$k AS (SELECT SUM(d * d) AS ss FROM d$k),
           |v$k AS (SELECT i AS j,
           |          CAST(FLOOR(CAST(d AS DOUBLE) * 1048576.0
           |                     / SQRT(CAST(ss AS DOUBLE))) AS BIGINT) AS vj
           |        FROM d$k CROSS JOIN s$k)""".stripMargin
      }.mkString(",\n")
      s"""WITH $covCellsCte,
         |cfull AS (
         |  SELECT i, j, CAST(FLOOR(cov * 1048576.0) AS BIGINT) AS cfx FROM cc
         |  UNION ALL
         |  SELECT j, i, CAST(FLOOR(cov * 1048576.0) AS BIGINT) FROM cc WHERE i <> j),
         |v0 AS (SELECT unnest(range(1, 65)) AS j, CAST(131072 AS BIGINT) AS vj),
         |$iterCtes
         |SELECT f.vec_id,
         |       ROUND(CAST(SUM(f.xi * v3.vj) AS DOUBLE) / 68719476736.0, 8) AS score
         |FROM f JOIN v3 ON v3.j = f.d
         |GROUP BY f.vec_id ORDER BY vec_id""".stripMargin
    })
  )

  /** Shared oracle CTE chain: exact fixed-point Gram sums over the
    * embeddings (`f` at 2^16 scale) reduced to the 8dp upper-triangle
    * covariance cells `cc(i, j, n, cov)` — the SQL replay of
    * [[graft.llm.Covariance.covarianceCells]]. */
  private val covCellsCte: String =
    """e AS (SELECT vec_id, embedding::DOUBLE[] AS v FROM embeddings),
      |f AS (
      |  SELECT vec_id, unnest(range(1, len(v) + 1)) AS d,
      |         unnest(list_transform(range(1, len(v) + 1),
      |                  k -> CAST(FLOOR(v[k] * 65536.0) AS BIGINT))) AS xi
      |  FROM e),
      |cnt AS (SELECT COUNT(*) AS n FROM e),
      |sm AS (SELECT d, CAST(SUM(xi) AS BIGINT) AS si FROM f GROUP BY d),
      |pr AS (
      |  SELECT a.d AS i, b.d AS j, CAST(SUM(a.xi * b.xi) AS BIGINT) AS pij
      |  FROM f a JOIN f b ON a.vec_id = b.vec_id AND a.d <= b.d
      |  GROUP BY a.d, b.d),
      |cc AS (
      |  SELECT pr.i, pr.j, cnt.n,
      |         ROUND((CAST(pij AS DOUBLE) / 4294967296.0) / cnt.n
      |               - (CAST(sa.si AS DOUBLE) / 65536.0 / cnt.n)
      |                 * (CAST(sb.si AS DOUBLE) / 65536.0 / cnt.n), 8) AS cov
      |  FROM pr
      |  CROSS JOIN cnt
      |  JOIN sm sa ON sa.d = pr.i
      |  JOIN sm sb ON sb.d = pr.j)""".stripMargin
}
