package graft.queries

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

import graft.QuerySpec
import graft.engine.Tables
import graft.llm.Retrieval

/** Sparse-lexical retrieval tier: BM25 ranking, RAKE keyword extraction,
  * and greedy MMR diversification — the retrieval surface beside
  * q_tfidf_cosine (sparse) and the ANN queries (dense). */
object RetrievalQueries {

  private def docs(s: SparkSession, dir: String): DataFrame =
    Tables.load(s, dir, "documents")

  /** Oracle fragment: SimilarityQueries' sequential-fold dot product —
    * ONE definition so the fold order can't silently diverge between
    * the similarity and retrieval oracles. */
  private def dotSql(a: String, b: String): String =
    SimilarityQueries.dotSql(a, b)

  /** The BM25 oracle body (top-20 for {dup, hash, window}) — shared by
    * q_bm25 and the q_ndcg evaluation that re-ranks it. */
  private[queries] val bm25OracleSql =
    """WITH base AS (
        |  SELECT doc_id AS doc,
        |         list_filter(string_split_regex(lower(text), '[^a-z0-9]+'),
        |                     x -> x <> '') AS ts
        |  FROM documents),
        |b2 AS (SELECT doc, CAST(len(ts) AS BIGINT) AS dl, ts FROM base),
        |scalar AS (SELECT COUNT(*) AS n_docs,
        |                  CAST(SUM(dl) AS BIGINT) AS sum_dl FROM b2),
        |tf AS (
        |  SELECT doc, dl, t, COUNT(*) AS tf
        |  FROM (SELECT doc, dl, unnest(ts) AS t FROM b2)
        |  WHERE t IN ('dup', 'hash', 'window')
        |  GROUP BY 1, 2, 3),
        |dfq AS (SELECT t, COUNT(*) AS df FROM tf GROUP BY t),
        |j AS (
        |  SELECT doc,
        |         CAST(ROUND(
        |           ROUND(LN(CAST(1.0 AS DOUBLE)
        |             + (CAST(n_docs AS DOUBLE) - CAST(df AS DOUBLE)
        |                + CAST(0.5 AS DOUBLE))
        |               / (CAST(df AS DOUBLE) + CAST(0.5 AS DOUBLE))), 8)
        |           * (CAST(tf AS DOUBLE) * CAST(2.2 AS DOUBLE)
        |              / (CAST(tf AS DOUBLE) + CAST(1.2 AS DOUBLE)
        |                 * (CAST(0.25 AS DOUBLE) + CAST(0.75 AS DOUBLE)
        |                    * CAST(dl AS DOUBLE)
        |                    / (CAST(sum_dl AS DOUBLE)
        |                       / CAST(n_docs AS DOUBLE))))), 8)
        |           AS DECIMAL(28,8)) AS contrib
        |  FROM tf JOIN dfq USING (t) CROSS JOIN scalar)
        |SELECT doc, ROUND(CAST(SUM(contrib) AS DOUBLE), 8) AS score,
        |       COUNT(*) AS n_terms
        |FROM j GROUP BY doc ORDER BY score DESC, doc LIMIT 20""".stripMargin

  def specs: Seq[QuerySpec] = Seq(

    // BM25 top-20 for the query {dup, hash, window} — "dup" is the
    // corpus's rare high-idf discriminator, the other two mid-frequency.
    // Postings filter to the 3 query terms BEFORE the shuffle; ln idf
    // and per-term contributions live on the 8dp grid, doc sums in
    // DECIMAL.
    QuerySpec("q_bm25", (s, dir) => {
      Retrieval.bm25(docs(s, dir), "doc_id", "text",
        Seq("dup", "hash", "window"))
    }, Some(bm25OracleSql)),

    // NDCG@10 of the BM25 ranking against graded relevance
    // rel = min(3, tf of "dup") — the retrieval-quality metric closing
    // the loop on the ranker (integer shiftleft gains, 8dp log2
    // discounts, DECIMAL DCG sums; ideal top-k via TakeOrdered).
    QuerySpec("q_ndcg", (s, dir) => {
      val d = docs(s, dir)
      val ranking = Retrieval.bm25(d, "doc_id", "text",
        Seq("dup", "hash", "window"))
      val rels = d.select(col("doc_id").as("doc"),
        least(size(filter(split(lower(col("text")), "[^a-z0-9]+"),
          t => t === lit("dup"))), lit(3)).as("rel"))
      Retrieval.ndcgAtK(ranking, "doc", "score", rels, "doc", "rel",
        k = 10)
    }, Some {
      val contribSql = (relExpr: String, rnk: String) =>
        s"CAST(ROUND(CAST((1 << $relExpr) - 1 AS DOUBLE) / " +
          s"ROUND(LOG2(CAST($rnk AS DOUBLE) + CAST(1.0 AS DOUBLE)), 8), 8)" +
          " AS DECIMAL(28,8))"
      s"""WITH bm AS ($bm25OracleSql),
         |rel AS (
         |  SELECT doc_id AS doc,
         |         LEAST(len(list_filter(
         |           list_filter(string_split_regex(lower(text),
         |                                          '[^a-z0-9]+'),
         |                       x -> x <> ''),
         |           t -> t = 'dup')), 3) AS rel
         |  FROM documents),
         |got AS (
         |  SELECT bm.doc AS doc, COALESCE(rel.rel, 0) AS rel,
         |         ROW_NUMBER() OVER (ORDER BY score DESC, bm.doc) AS rnk
         |  FROM bm LEFT JOIN rel ON rel.doc = bm.doc),
         |dcg AS (
         |  SELECT COALESCE(SUM(${contribSql("rel", "rnk")}),
         |                  CAST(0 AS DECIMAL(28,8))) AS dcg
         |  FROM got WHERE rnk <= 10),
         |ideal AS (
         |  SELECT rel, ROW_NUMBER() OVER (ORDER BY rel DESC, doc) AS rnk
         |  FROM rel ORDER BY rel DESC, doc LIMIT 10),
         |idcg AS (
         |  SELECT COALESCE(SUM(${contribSql("rel", "rnk")}),
         |                  CAST(0 AS DECIMAL(28,8))) AS idcg
         |  FROM ideal WHERE rnk <= 10)
         |SELECT CAST(10 AS BIGINT) AS k,
         |       ROUND(CAST(dcg AS DOUBLE), 8) AS dcg,
         |       ROUND(CAST(idcg AS DOUBLE), 8) AS idcg,
         |       CASE WHEN idcg > 0
         |            THEN ROUND(CAST(dcg AS DOUBLE)
         |                       / CAST(idcg AS DOUBLE), 8)
         |       END AS ndcg
         |FROM dcg CROSS JOIN idcg""".stripMargin
    }),

    // RAKE keywords: stopword-free phrase runs, deg/freq word scores,
    // phrase score = Σ word scores. The corpus's stopwords are {a, the};
    // the \b-anchored replace can't let consecutive stopwords shadow
    // each other (anchors don't consume characters).
    QuerySpec("q_rake_keywords", (s, dir) => {
      Retrieval.rakeKeywords(docs(s, dir), "text",
        Seq("a", "the"), maxLen = 3, topN = 20)
    }, Some(
      """WITH norm AS (
        |  SELECT ' ' || regexp_replace(lower(text), '[^a-z0-9]+', ' ', 'g')
        |         || ' ' AS t
        |  FROM documents),
        |ph AS (
        |  SELECT trim(p) AS phrase
        |  FROM (SELECT unnest(string_split(
        |                 regexp_replace(t, '\b(a|the)\b', '|', 'g'), '|'))
        |          AS p
        |        FROM norm)
        |  WHERE trim(p) <> ''),
        |ph2 AS (
        |  SELECT phrase,
        |         CAST(len(string_split(phrase, ' ')) AS BIGINT) AS n_words
        |  FROM ph
        |  WHERE CAST(len(string_split(phrase, ' ')) AS BIGINT) <= 3),
        |wstats AS (
        |  SELECT w,
        |         ROUND(CAST(SUM(n_words) AS DOUBLE)
        |               / CAST(COUNT(*) AS DOUBLE), 8) AS wscore
        |  FROM (SELECT n_words, unnest(string_split(phrase, ' ')) AS w
        |        FROM ph2)
        |  GROUP BY w),
        |pp AS (SELECT phrase, n_words, COUNT(*) AS occurrences
        |       FROM ph2 GROUP BY 1, 2),
        |pw AS (SELECT phrase, n_words, occurrences,
        |              unnest(string_split(phrase, ' ')) AS w
        |       FROM pp)
        |SELECT phrase, n_words, occurrences,
        |       ROUND(CAST(SUM(CAST(wscore AS DECIMAL(28,8))) AS DOUBLE), 8)
        |         AS score
        |FROM pw JOIN wstats USING (w)
        |GROUP BY phrase, n_words, occurrences
        |ORDER BY score DESC, phrase LIMIT 20""".stripMargin)),

    // Greedy MMR re-rank (λ = 0.7) of the exact-cosine top-20 for query
    // vector 0 — selection runs on the exact integer grid
    // (7·rel_e8 − 3·pen_e8, reported ×1000 on the fixed 1e-12 grid so
    // scores are comparable across λ scales), so the argmax order is
    // engine-portable by integer comparison; the oracle replays the
    // greedy recursion as a recursive CTE carrying the picked set.
    QuerySpec("q_mmr_rerank", (s, dir) => {
      Retrieval.mmrRerank(Tables.load(s, dir, "embeddings"),
        "vec_id", "embedding", queryId = 0L, candK = 20, selectK = 10)
    }, Some {
      val dotQ = dotSql("v", "qv")
      val dotAB = dotSql("a.v", "b.v")
      s"""WITH RECURSIVE
        |${SimilarityQueries.normCte},
        |q AS (SELECT v AS qv, n2 AS qn2 FROM n WHERE vec_id = 0),
        |cand AS (
        |  SELECT vec_id, v, n2,
        |         ROUND($dotQ / SQRT(n2 * qn2), 8) AS rel
        |  FROM n, q WHERE vec_id <> 0
        |  ORDER BY rel DESC, vec_id LIMIT 20),
        |pairs AS (
        |  SELECT a.vec_id AS i, b.vec_id AS j,
        |         CAST(ROUND(ROUND($dotAB / SQRT(a.n2 * b.n2), 8) * 1e8)
        |              AS BIGINT) AS sim8
        |  FROM cand a JOIN cand b ON a.vec_id <> b.vec_id),
        |r AS (SELECT vec_id, rel,
        |             CAST(ROUND(rel * 1e8) AS BIGINT) AS rel8 FROM cand),
        |sel(rank, vec_id, rel, mmr_e12, picked) AS (
        |  (SELECT CAST(1 AS BIGINT), vec_id, rel, 7000 * rel8, [vec_id]
        |   FROM r ORDER BY 7 * rel8 DESC, vec_id LIMIT 1)
        |  UNION ALL
        |  (SELECT s.rank + 1, c.vec_id, c.rel,
        |          7000 * c.rel8 - 3000 * (SELECT MAX(p.sim8) FROM pairs p
        |                            WHERE p.i = c.vec_id
        |                              AND list_contains(s.picked, p.j)),
        |          list_append(s.picked, c.vec_id)
        |   FROM sel s, r c
        |   WHERE s.rank < 10 AND NOT list_contains(s.picked, c.vec_id)
        |   ORDER BY 7 * c.rel8 - 3 * (SELECT MAX(p.sim8) FROM pairs p
        |                              WHERE p.i = c.vec_id
        |                                AND list_contains(s.picked, p.j))
        |              DESC,
        |            c.vec_id
        |   LIMIT 1))
        |SELECT rank, vec_id, rel, mmr_e12 FROM sel ORDER BY rank""".stripMargin
    })
  )
}
