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

    // Gram/covariance matrix of the embedding corpus (64×64 upper
    // triangle) via the native map-side-combining CovSums aggregate; the
    // oracle replays the identical fixed-point sums relationally.
    QuerySpec("q_embed_covariance", (s, dir) => {
      Covariance.register(s)
      val dim = 64
      val cs = Tables.load(s, dir, "embeddings")
        .select(transform(col("embedding"), x => x.cast("double")).as("v"))
        .agg(Covariance.covSums(col("v"), dim).as("cs"))
      val ij = cs
        .select(col("cs"), explode(sequence(lit(1), lit(dim))).as("i"))
        .select(col("cs"), col("i"),
          explode(sequence(col("i"), lit(dim))).as("j"))
      // upper-triangle index (1-based arrays): t = (i-1)*dim - (i-1)(i-2)/2 + (j-i) + 1
      val t = (col("i") - 1) * dim - (col("i") - 1) * (col("i") - 2) / 2 +
        (col("j") - col("i")) + 1
      ij.select(
          col("i").cast("long").as("i"), col("j").cast("long").as("j"),
          col("cs.n").as("n"),
          round((element_at(col("cs.p"), t.cast("int")).cast("double") /
              lit(4294967296.0)) / col("cs.n") -
            (element_at(col("cs.s"), col("i").cast("int")).cast("double") /
              lit(65536.0) / col("cs.n")) *
            (element_at(col("cs.s"), col("j").cast("int")).cast("double") /
              lit(65536.0) / col("cs.n")), 8).as("cov"))
        .orderBy("i", "j")
    }, Some(
      """WITH e AS (SELECT vec_id, embedding::DOUBLE[] AS v FROM embeddings),
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
        |  GROUP BY a.d, b.d)
        |SELECT pr.i, pr.j, cnt.n,
        |       ROUND((CAST(pij AS DOUBLE) / 4294967296.0) / cnt.n
        |             - (CAST(sa.si AS DOUBLE) / 65536.0 / cnt.n)
        |               * (CAST(sb.si AS DOUBLE) / 65536.0 / cnt.n), 8) AS cov
        |FROM pr
        |CROSS JOIN cnt
        |JOIN sm sa ON sa.d = pr.i
        |JOIN sm sb ON sb.d = pr.j
        |ORDER BY i, j""".stripMargin))
  )
}
