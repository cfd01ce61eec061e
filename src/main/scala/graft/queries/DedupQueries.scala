package graft.queries

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

import graft.QuerySpec
import graft.engine.Tables
import graft.llm.Dedup

/** Document deduplication operators (exact, n-gram Jaccard, MinHash-LSH,
  * SimHash) over `documents`. Thresholds calibrated to the testdata: the
  * generator plants ~25 near-dup pairs at J ≥ 0.8, next-closest ≤ 0.1,
  * so 0.5 separates cleanly. */
object DedupQueries {

  private def docs(s: SparkSession, dir: String): DataFrame =
    Tables.load(s, dir, "documents")

  /** The production near-dup pair set (MinHash-LSH, verified ≥ 0.5) —
    * shared input of the cluster/canonical queries. */
  private def lshPairs(s: SparkSession, dir: String): DataFrame =
    Dedup.minhashNearDups(docs(s, dir), "doc_id", "text",
      n = 3, bands = 3, rowsPerBand = 3, threshold = 0.5)
      .select("id1", "id2")

  /** Shared oracle CTE: tokenized docs + distinct 3-gram shingle sets.
    * `sh`/`sizes` are MATERIALIZED: DuckDB 1.0 re-INLINES a CTE at every
    * reference (sh feeds sizes, sig and the double-sided mh_inter join),
    * and on chained oracles the re-evaluation compounds exponentially —
    * measured 308 s → 2.1 s on q_hits at sf0.1, and the round-6 sf1
    * sweep's 76 GB q_kcore spill was this, not data volume. */
  private[queries] val shingleCte =
    """toks AS (
      |  SELECT doc_id,
      |         list_filter(string_split_regex(lower(text), '[^a-z0-9]+'), x -> x <> '') AS t
      |  FROM documents),
      |sh AS MATERIALIZED (
      |  SELECT DISTINCT doc_id,
      |         unnest(CASE WHEN len(t) >= 3
      |                     THEN list_transform(range(1, len(t) - 1),
      |                            i -> array_to_string(list_slice(t, i, i + 2), ' '))
      |                     ELSE [] END) AS shingle
      |  FROM toks),
      |sizes AS MATERIALIZED (SELECT doc_id, COUNT(*) AS sz FROM sh GROUP BY doc_id)""".stripMargin

  /** CTE prefix for the EXACT (quadratic-input) cluster oracle: all-pairs
    * jaccard pairs → symmetric edges → recursive reachability. Retained as
    * the cross-validation tier (`q_dup_clusters_exact`). */
  private val dupClustersExactCtes: String =
    s"""WITH $shingleCte,
       |inter AS (
       |  SELECT a.doc_id AS id1, b.doc_id AS id2, COUNT(*) AS i
       |  FROM sh a JOIN sh b ON a.shingle = b.shingle AND a.doc_id < b.doc_id
       |  GROUP BY a.doc_id, b.doc_id),
       |pairs AS MATERIALIZED (
       |  SELECT id1, id2 FROM inter
       |  JOIN sizes s1 ON id1 = s1.doc_id
       |  JOIN sizes s2 ON id2 = s2.doc_id
       |  WHERE ROUND(CAST(i AS DOUBLE) / CAST(s1.sz + s2.sz - i AS DOUBLE), 8) >= 0.5),
       |edges AS MATERIALIZED (
       |  SELECT id1 AS src, id2 AS dst FROM pairs
       |  UNION SELECT id2, id1 FROM pairs),
       |reach AS (
       |  WITH RECURSIVE r(id, lbl) AS (
       |    SELECT src, src FROM edges
       |    UNION
       |    SELECT e.dst, r.lbl FROM r JOIN edges e ON e.src = r.id)
       |  SELECT * FROM r)""".stripMargin

  /** Oracle for the quadratic-input cluster variant: transitive closure via
    * a recursive CTE + per-node MIN label. */
  private val dupClustersExactOracle: String =
    s"""$dupClustersExactCtes
       |SELECT id, MIN(lbl) AS canonical_id
       |FROM reach GROUP BY id ORDER BY id""".stripMargin

  /** MinHash-LSH pair chain (follows `shingleCte` in a WITH list): 9
    * permutation mins → 3 banded buckets → candidate pairs → exact-Jaccard
    * verification. Ends in `mh_pairs(id1, id2, jaccard)` with the ≥ 0.5
    * threshold applied — the relational mirror of
    * [[graft.llm.Dedup.minhashNearDups]], shared by the near-dup oracle AND
    * the cluster/canonical oracles (which consume LSH pairs, not the
    * quadratic all-pairs set). */
  private[queries] val minhashPairsCte: String =
    """sig AS MATERIALIZED (
      |  SELECT doc_id,
      |         MIN(SUBSTR(md5('0|' || shingle), 1, 16))  AS s0,
      |         MIN(SUBSTR(md5('0|' || shingle), 17, 16)) AS s1,
      |         MIN(SUBSTR(md5('1|' || shingle), 1, 16))  AS s2,
      |         MIN(SUBSTR(md5('1|' || shingle), 17, 16)) AS s3,
      |         MIN(SUBSTR(md5('2|' || shingle), 1, 16))  AS s4,
      |         MIN(SUBSTR(md5('2|' || shingle), 17, 16)) AS s5,
      |         MIN(SUBSTR(md5('3|' || shingle), 1, 16))  AS s6,
      |         MIN(SUBSTR(md5('3|' || shingle), 17, 16)) AS s7,
      |         MIN(SUBSTR(md5('4|' || shingle), 1, 16))  AS s8
      |  FROM sh GROUP BY doc_id),
      |bands AS MATERIALIZED (
      |  SELECT doc_id, 0 AS band, md5(s0 || s1 || s2) AS band_key FROM sig
      |  UNION ALL SELECT doc_id, 1, md5(s3 || s4 || s5) FROM sig
      |  UNION ALL SELECT doc_id, 2, md5(s6 || s7 || s8) FROM sig),
      |cand AS (
      |  SELECT DISTINCT a.doc_id AS id1, b.doc_id AS id2
      |  FROM bands a JOIN bands b
      |    ON a.band = b.band AND a.band_key = b.band_key AND a.doc_id < b.doc_id),
      |mh_inter AS (
      |  SELECT c.id1, c.id2, COUNT(*) AS i
      |  FROM cand c
      |  JOIN sh a ON a.doc_id = c.id1
      |  JOIN sh b ON b.doc_id = c.id2 AND b.shingle = a.shingle
      |  GROUP BY c.id1, c.id2),
      |mh_pairs AS MATERIALIZED (
      |  SELECT id1, id2,
      |         ROUND(CAST(i AS DOUBLE) / CAST(s1.sz + s2.sz - i AS DOUBLE), 8) AS jaccard
      |  FROM mh_inter
      |  JOIN sizes s1 ON id1 = s1.doc_id
      |  JOIN sizes s2 ON id2 = s2.doc_id
      |  WHERE ROUND(CAST(i AS DOUBLE) / CAST(s1.sz + s2.sz - i AS DOUBLE), 8) >= 0.5)""".stripMargin

  /** The minhash-LSH oracle; `extraWhere` restricts the verified pair set
    * (ANDed after the threshold predicate). */
  private def minhashOracle(extraWhere: String): String =
    s"""WITH $shingleCte,
       |$minhashPairsCte
       |SELECT id1, id2, jaccard FROM mh_pairs
       |WHERE TRUE $extraWhere
       |ORDER BY id1, id2""".stripMargin

  /** CTE prefix for the PRODUCTION cluster oracles: LSH-verified pairs →
    * symmetric edges → recursive reachability — mirrors feeding
    * [[graft.llm.Dedup.dupClusters]] from [[graft.llm.Dedup.minhashNearDups]]. */
  private val dupClustersLshCtes: String =
    s"""WITH $shingleCte,
       |$minhashPairsCte,
       |edges AS MATERIALIZED (
       |  SELECT id1 AS src, id2 AS dst FROM mh_pairs
       |  UNION SELECT id2, id1 FROM mh_pairs),
       |reach AS (
       |  WITH RECURSIVE r(id, lbl) AS (
       |    SELECT src, src FROM edges
       |    UNION
       |    SELECT e.dst, r.lbl FROM r JOIN edges e ON e.src = r.id)
       |  SELECT * FROM r)""".stripMargin

  private val dupClustersLshOracle: String =
    s"""$dupClustersLshCtes
       |SELECT id, MIN(lbl) AS canonical_id
       |FROM reach GROUP BY id ORDER BY id""".stripMargin

  def specs: Seq[QuerySpec] = Seq(

    // Exact repeated spans (Lee et al. 2021 substring dedup): maximal
    // verbatim token runs shared between document pairs, from df-capped
    // positional k-gram postings merged along match diagonals — WHERE the
    // overlap is, where containment scores only how much. The oracle
    // replays the identical postings-join + gaps-and-islands arithmetic.
    QuerySpec("q_repeated_spans", (s, dir) => {
      graft.llm.Spans.repeatedSpans(docs(s, dir), "doc_id", "text",
          k = 8, maxDf = 10L, minTokens = 12)
        .orderBy("id1", "id2", "start1", "start2")
    }, Some(
      """WITH toks AS (
        |  SELECT doc_id,
        |         list_filter(string_split_regex(lower(text), '[^a-z0-9]+'),
        |                     x -> x <> '') AS t
        |  FROM documents),
        |grams AS (
        |  SELECT doc_id, i - 1 AS pos,
        |         array_to_string(list_slice(t, i, i + 7), ' ') AS gram
        |  FROM (SELECT doc_id, t, unnest(range(1, len(t) - 6)) AS i
        |        FROM toks WHERE len(t) >= 8)),
        |rare AS (
        |  SELECT gram FROM (SELECT gram, COUNT(DISTINCT doc_id) AS df
        |                    FROM grams GROUP BY gram)
        |  WHERE df BETWEEN 2 AND 10),
        |m AS (
        |  SELECT a.doc_id AS id1, b.doc_id AS id2, a.pos AS pos1,
        |         a.pos - b.pos AS diag
        |  FROM grams a JOIN rare r ON a.gram = r.gram
        |  JOIN grams b ON b.gram = a.gram AND a.doc_id < b.doc_id),
        |runs AS (
        |  SELECT id1, id2, diag, pos1,
        |         pos1 - ROW_NUMBER() OVER (PARTITION BY id1, id2, diag
        |                                   ORDER BY pos1) AS island
        |  FROM m)
        |SELECT id1, id2, CAST(MIN(pos1) AS BIGINT) AS start1,
        |       CAST(MIN(pos1) - diag AS BIGINT) AS start2,
        |       CAST(MAX(pos1) - MIN(pos1) + 8 AS BIGINT) AS len_tokens
        |FROM runs GROUP BY id1, id2, diag, island
        |HAVING MAX(pos1) - MIN(pos1) + 8 >= 12
        |ORDER BY id1, id2, start1, start2""".stripMargin)),

    // Exact dedup: hash-groupBy on md5(text). Duplicates are constructed by
    // self-union with offset ids (the raw table has none) so keeper/count
    // semantics are actually exercised.
    QuerySpec("q_dedup_exact", (s, dir) => {
      val d = docs(s, dir).select(col("doc_id"), col("text"))
      val all = d.unionByName(
        d.select((col("doc_id") + 1000000).as("doc_id"), col("text")))
      Dedup.exactGroups(all, "doc_id", "text").orderBy("text_md5")
    }, Some(
      """WITH all_docs AS (
        |  SELECT doc_id, text FROM documents
        |  UNION ALL
        |  SELECT doc_id + 1000000 AS doc_id, text FROM documents)
        |SELECT md5(text) AS text_md5, MIN(doc_id) AS keeper_id,
        |       COUNT(*) AS n_copies
        |FROM all_docs GROUP BY md5(text) ORDER BY text_md5""".stripMargin)),

    // All-pairs word-3-gram Jaccard ≥ 0.5 (quadratic baseline path).
    QuerySpec("q_ngram_jaccard", (s, dir) => {
      Dedup.jaccardPairs(docs(s, dir), "doc_id", "text", n = 3, threshold = 0.5)
        .orderBy("id1", "id2")
    }, Some(
      s"""WITH $shingleCte,
         |inter AS (
         |  SELECT a.doc_id AS id1, b.doc_id AS id2, COUNT(*) AS i
         |  FROM sh a JOIN sh b ON a.shingle = b.shingle AND a.doc_id < b.doc_id
         |  GROUP BY a.doc_id, b.doc_id)
         |SELECT id1, id2,
         |       ROUND(CAST(i AS DOUBLE) / CAST(s1.sz + s2.sz - i AS DOUBLE), 8) AS jaccard
         |FROM inter
         |JOIN sizes s1 ON id1 = s1.doc_id
         |JOIN sizes s2 ON id2 = s2.doc_id
         |WHERE ROUND(CAST(i AS DOUBLE) / CAST(s1.sz + s2.sz - i AS DOUBLE), 8) >= 0.5
         |ORDER BY id1, id2""".stripMargin)),

    // Prefix-filter EXACT similarity join (AllPairs/PPJoin) — the
    // scalable exact tier between q_ngram_jaccard (quadratic reference)
    // and q_minhash_lsh (probabilistic): candidates come only from each
    // set's globally-RAREST tokens (df-ascending prefixes) + a size
    // filter, then exact verification — lossless by the prefix-filtering
    // principle. The oracle is the brute-force quadratic join: equality
    // proves the pruning drops nothing. θ=0.4 exercises non-half-integer
    // ceil(θ·sz) pruning arithmetic (done in exact integers).
    // Fixture caveat: the synthetic corpus is template-generated
    // (max shingle df = 25), so the quadratic join is df²-BOUNDED here
    // and runs comparably; prefix filtering's order-of-magnitude win is
    // on Zipfian real-text df distributions, where the quadratic join
    // explodes on hot shingles that never enter a prefix.
    QuerySpec("q_setsim_join", (s, dir) => {
      graft.llm.SetSimJoin.jaccardJoin(docs(s, dir), "doc_id", "text",
          n = 3, threshold = 0.4)
        .orderBy("id1", "id2")
    }, Some(
      s"""WITH $shingleCte,
         |inter AS (
         |  SELECT a.doc_id AS id1, b.doc_id AS id2, COUNT(*) AS i
         |  FROM sh a JOIN sh b ON a.shingle = b.shingle AND a.doc_id < b.doc_id
         |  GROUP BY a.doc_id, b.doc_id)
         |SELECT id1, id2,
         |       ROUND(CAST(i AS DOUBLE) / CAST(s1.sz + s2.sz - i AS DOUBLE), 8) AS jaccard
         |FROM inter
         |JOIN sizes s1 ON id1 = s1.doc_id
         |JOIN sizes s2 ON id2 = s2.doc_id
         |WHERE ROUND(CAST(i AS DOUBLE) / CAST(s1.sz + s2.sz - i AS DOUBLE), 8) >= 0.4
         |ORDER BY id1, id2""".stripMargin)),

    // MinHash-LSH (9 perms = 3 bands × 3 rows) candidates, verified with
    // exact Jaccard ≥ 0.5 — the 100 TB near-dup path. Permutation mins are
    // lexicographic MIN over 16-hex-char halves of md5(seed|shingle) —
    // two 64-bit permutations per md5 call, reproducible in any engine.
    QuerySpec("q_minhash_lsh", (s, dir) => {
      Dedup.minhashNearDups(docs(s, dir), "doc_id", "text",
        n = 3, bands = 3, rowsPerBand = 3, threshold = 0.5)
        .orderBy("id1", "id2")
    }, Some(minhashOracle(extraWhere = "")), headline = true),

    // Incremental ingest: dedup a NEW batch (doc_id % 5 = 0) against the
    // EXISTING corpus via its persisted band table — only the batch is
    // hashed, the corpus text is read id-pruned for verification, and
    // corpus-corpus pairs are not re-examined. Equals the all-docs result
    // restricted to pairs touching the batch (which is the oracle).
    QuerySpec("q_incr_dedup", (s, dir) => {
      val all = docs(s, dir)
      val newBatch = all.filter(pmod(col("doc_id"), lit(5)) === 0)
      val corpus = all.filter(pmod(col("doc_id"), lit(5)) =!= 0)
      val corpusBands = Dedup.bandTable(corpus, "doc_id", "text",
        n = 3, bands = 3, rowsPerBand = 3)
      Dedup.minhashNearDupsIncremental(newBatch, corpus, corpusBands,
          "doc_id", "text", n = 3, bands = 3, rowsPerBand = 3, threshold = 0.5)
        .orderBy("id1", "id2")
    }, Some(minhashOracle(
      extraWhere = "AND (id1 % 5 = 0 OR id2 % 5 = 0)"))),


    // Duplicate clusters: connected components (min-label propagation)
    // over the near-dup pairs → (id, canonical id). Pairs come from the
    // LSH scale path (minhashNearDups — bucketed candidates, never
    // all-pairs), and the oracle mirrors that same LSH pipeline before its
    // recursive-CTE transitive closure.
    QuerySpec("q_dup_clusters", (s, dir) => {
      Dedup.dupClusters(lshPairs(s, dir)).orderBy("id")
    }, Some(dupClustersLshOracle)),

    // Same contract via alternating large-star/small-star contraction —
    // the O(log n)-round scale path for large-diameter components; result
    // is identical, so it shares the LSH recursive-CTE oracle.
    QuerySpec("q_dup_clusters_star", (s, dir) => {
      Dedup.dupClustersStar(lshPairs(s, dir)).orderBy("id")
    }, Some(dupClustersLshOracle)),

    // Cross-validation tier: the same CC contract fed from the EXACT
    // all-pairs Jaccard set (quadratic by documented contract, like
    // q_ngram_jaccard). Exists to pin that the LSH-fed production variant
    // loses nothing on data where both are computable.
    QuerySpec("q_dup_clusters_exact", (s, dir) => {
      val pairs = Dedup.jaccardPairs(docs(s, dir), "doc_id", "text",
        n = 3, threshold = 0.5).select("id1", "id2")
      Dedup.dupClusters(pairs).orderBy("id")
    }, Some(dupClustersExactOracle)),

    // Leakage-safe train/val/test split: the md5 split key is the
    // near-dup CLUSTER representative, not the doc id, so every member
    // of a duplicate cluster lands in the SAME split — the eval-leakage
    // guard q_train_split alone cannot give (a near-dup of a test doc in
    // train IS contamination; Lee et al. 2022 measure exactly this).
    // Cost on top of clustering: one left join + a map-only hash assign.
    QuerySpec("q_leakage_split", (s, dir) => {
      val withRep = docs(s, dir).select("doc_id")
        .join(Dedup.dupClusters(lshPairs(s, dir))
          .withColumnRenamed("id", "doc_id"), Seq("doc_id"), "left")
        .withColumn("cluster_id",
          coalesce(col("canonical_id"), col("doc_id")))
        .select("doc_id", "cluster_id")
      graft.llm.Sampling.assignSplit(withRep, "cluster_id",
          Seq("train" -> 0.8, "val" -> 0.1, "test" -> 0.1))
        .orderBy("doc_id")
    }, Some(
      s"""$dupClustersLshCtes,
         |clusters AS (
         |  SELECT id, MIN(lbl) AS canonical_id FROM reach GROUP BY id),
         |assign AS (
         |  SELECT d.doc_id, COALESCE(c.canonical_id, d.doc_id) AS cluster_id
         |  FROM documents d LEFT JOIN clusters c ON d.doc_id = c.id)
         |SELECT doc_id, cluster_id,
         |       CASE WHEN substr(md5('split|' || CAST(cluster_id AS VARCHAR)), 1, 8)
         |                 < 'cccccccd' THEN 'train'
         |            WHEN substr(md5('split|' || CAST(cluster_id AS VARCHAR)), 1, 8)
         |                 < 'e6666666' THEN 'val'
         |            ELSE 'test' END AS split
         |FROM assign ORDER BY doc_id""".stripMargin)),

    // Retention policy on top of the cluster labels: each near-dup cluster
    // keeps its longest member (ties to the smallest id); singletons keep
    // themselves. The corpus-dedup step that actually DROPS documents —
    // clusters come from the LSH pair path, like q_dup_clusters.
    QuerySpec("q_dedup_canonical", (s, dir) => {
      val d = docs(s, dir)
      Dedup.keepCanonical(d, "doc_id", "n_chars",
          Dedup.dupClusters(lshPairs(s, dir)))
        .orderBy("cluster_id")
    }, Some(
      s"""$dupClustersLshCtes,
         |clusters AS (
         |  SELECT id, MIN(lbl) AS canonical_id FROM reach GROUP BY id),
         |assign AS (
         |  SELECT d.doc_id, COALESCE(c.canonical_id, d.doc_id) AS cluster_id,
         |         d.n_chars
         |  FROM documents d LEFT JOIN clusters c ON d.doc_id = c.id),
         |ranked AS (
         |  SELECT cluster_id, doc_id,
         |         ROW_NUMBER() OVER (PARTITION BY cluster_id
         |                            ORDER BY n_chars DESC, doc_id) AS rn,
         |         COUNT(*) OVER (PARTITION BY cluster_id) AS n_docs
         |  FROM assign)
         |SELECT cluster_id, doc_id AS kept_id, n_docs
         |FROM ranked WHERE rn = 1 ORDER BY cluster_id""".stripMargin)),

    // Containment scoring over the LSH candidates: the asymmetric overlap
    // (|A∩B|/|A|, |A∩B|/|B|) that catches quotation/subset relations
    // symmetric Jaccard underweights. Shares candidates + verification
    // with q_minhash_lsh; the oracle extends the same CTE chain with the
    // per-side divisions.
    QuerySpec("q_containment", (s, dir) => {
      Dedup.containmentPairs(docs(s, dir), "doc_id", "text",
        n = 3, bands = 3, rowsPerBand = 3, minContainment = 0.6)
        .orderBy("id1", "id2")
    }, Some(
      s"""WITH $shingleCte,
         |$minhashPairsCte,
         |cont AS (
         |  SELECT id1, id2,
         |         ROUND(CAST(i AS DOUBLE) / CAST(s1.sz AS DOUBLE), 8) AS containment_1,
         |         ROUND(CAST(i AS DOUBLE) / CAST(s2.sz AS DOUBLE), 8) AS containment_2,
         |         ROUND(CAST(i AS DOUBLE) / CAST(s1.sz + s2.sz - i AS DOUBLE), 8) AS jaccard
         |  FROM mh_inter
         |  JOIN sizes s1 ON id1 = s1.doc_id
         |  JOIN sizes s2 ON id2 = s2.doc_id)
         |SELECT * FROM cont
         |WHERE GREATEST(containment_1, containment_2) >= 0.6
         |ORDER BY id1, id2""".stripMargin)),

    // Containment via WINNOWING candidates: any pair sharing a RARE
    // (df ≤ 20) 11-char substring (k=8, w=4) is guaranteed candidacy
    // regardless of Jaccard — the full-recall twin of q_containment for
    // low-J quotation pairs. The df cap is the scale contract: a
    // fingerprint in f docs emits f² candidate rows, and boilerplate
    // substrings (df in the thousands on this small-vocabulary corpus)
    // made the uncapped join quadratic — 211 s of a 276 s bench at sf0.1
    // before the cap, with zero discriminative value from those keys.
    // Oracle: the q_winnow fingerprint CTE + QUALIFY df filter generates
    // candidates, then the same word-3-gram overlap scoring.
    QuerySpec("q_containment_winnow", (s, dir) => {
      Dedup.containmentPairsWinnow(docs(s, dir), "doc_id", "text",
        n = 3, k = 8, w = 4, minContainment = 0.6, maxDf = 20)
        .orderBy("id1", "id2")
    }, Some(
      s"""WITH $shingleCte,
         |g AS (
         |  SELECT doc_id,
         |         CASE WHEN length(text) >= 8
         |              THEN list_transform(range(1, length(text) - 8 + 2),
         |                     i -> substr(md5(substr(text, i, 8)), 1, 8))
         |              ELSE [] END AS hs
         |  FROM documents),
         |wn AS (
         |  SELECT doc_id,
         |         CASE WHEN len(hs) >= 4
         |              THEN list_transform(range(1, len(hs) - 4 + 2),
         |                     j -> list_min(list_slice(hs, j, j + 3)))
         |              WHEN len(hs) > 0 THEN [list_min(hs)]
         |              ELSE [] END AS wins
         |  FROM g),
         |fp0 AS (SELECT doc_id, unnest(list_distinct(wins)) AS fingerprint FROM wn),
         |fp AS (
         |  SELECT doc_id, fingerprint FROM fp0
         |  QUALIFY COUNT(*) OVER (PARTITION BY fingerprint) <= 20),
         |cand AS (
         |  SELECT DISTINCT a.doc_id AS id1, b.doc_id AS id2
         |  FROM fp a JOIN fp b
         |    ON a.fingerprint = b.fingerprint AND a.doc_id < b.doc_id),
         |win_inter AS (
         |  SELECT c.id1, c.id2, COUNT(*) AS i
         |  FROM cand c
         |  JOIN sh a ON a.doc_id = c.id1
         |  JOIN sh b ON b.doc_id = c.id2 AND b.shingle = a.shingle
         |  GROUP BY c.id1, c.id2),
         |cont AS (
         |  SELECT id1, id2,
         |         ROUND(CAST(i AS DOUBLE) / CAST(s1.sz AS DOUBLE), 8) AS containment_1,
         |         ROUND(CAST(i AS DOUBLE) / CAST(s2.sz AS DOUBLE), 8) AS containment_2,
         |         ROUND(CAST(i AS DOUBLE) / CAST(s1.sz + s2.sz - i AS DOUBLE), 8) AS jaccard
         |  FROM win_inter
         |  JOIN sizes s1 ON id1 = s1.doc_id
         |  JOIN sizes s2 ON id2 = s2.doc_id)
         |SELECT * FROM cont
         |WHERE GREATEST(containment_1, containment_2) >= 0.6
         |ORDER BY id1, id2""".stripMargin)),

    // Benchmark decontamination: training docs (doc_id % 50 ≠ 0) sharing
    // any word 8-gram with the held-out eval slice (doc_id % 50 = 0) —
    // the n-gram overlap check that keeps test sets out of pretraining
    // data. Eval shingles broadcast; only matched occurrences shuffle.
    QuerySpec("q_contamination", (s, dir) => {
      val d = docs(s, dir)
      val eval = d.filter(pmod(col("doc_id"), lit(50)) === 0)
      val train = d.filter(pmod(col("doc_id"), lit(50)) =!= 0)
      Dedup.contaminatedDocs(train, eval, "doc_id", "text", n = 8)
        .orderBy("doc_id")
    }, Some(
      """WITH toks AS (
        |  SELECT doc_id,
        |         list_filter(string_split_regex(lower(text), '[^a-z0-9]+'), x -> x <> '') AS t
        |  FROM documents),
        |sh AS (
        |  SELECT DISTINCT doc_id,
        |         unnest(CASE WHEN len(t) >= 8
        |                     THEN list_transform(range(1, len(t) - 6),
        |                            i -> array_to_string(list_slice(t, i, i + 7), ' '))
        |                     ELSE [] END) AS shingle
        |  FROM toks),
        |ev AS (SELECT DISTINCT shingle FROM sh WHERE doc_id % 50 = 0),
        |tr AS (SELECT doc_id, shingle FROM sh WHERE doc_id % 50 <> 0)
        |SELECT doc_id, COUNT(*) AS n_shared
        |FROM tr JOIN ev USING (shingle)
        |GROUP BY doc_id ORDER BY doc_id""".stripMargin)),

    // Bloom-tier decontamination: same check as q_contamination, but the
    // eval shingles broadcast as BLOOM BITS (map-side prefilter) and the
    // exact verification is a shuffle join of probable hits only — the
    // tier for eval sets too large to broadcast as a set. No false
    // negatives, so the output is bit-identical to the exact join and the
    // oracle IS the exact SQL. Different split (doc_id % 25) so the
    // result set differs from q_contamination's.
    QuerySpec("q_bloom_decontam", (s, dir) => {
      val d = docs(s, dir)
      val eval = d.filter(pmod(col("doc_id"), lit(25)) === 0)
      val train = d.filter(pmod(col("doc_id"), lit(25)) =!= 0)
      Dedup.contaminatedDocsBloom(train, eval, "doc_id", "text", n = 8,
          expectedShingles = 200000L)
        .orderBy("doc_id")
    }, Some(
      """WITH toks AS (
        |  SELECT doc_id,
        |         list_filter(string_split_regex(lower(text), '[^a-z0-9]+'), x -> x <> '') AS t
        |  FROM documents),
        |sh AS (
        |  SELECT DISTINCT doc_id,
        |         unnest(CASE WHEN len(t) >= 8
        |                     THEN list_transform(range(1, len(t) - 6),
        |                            i -> array_to_string(list_slice(t, i, i + 7), ' '))
        |                     ELSE [] END) AS shingle
        |  FROM toks),
        |ev AS (SELECT DISTINCT shingle FROM sh WHERE doc_id % 25 = 0),
        |tr AS (SELECT doc_id, shingle FROM sh WHERE doc_id % 25 <> 0)
        |SELECT doc_id, COUNT(*) AS n_shared
        |FROM tr JOIN ev USING (shingle)
        |GROUP BY doc_id ORDER BY doc_id""".stripMargin)),

    // Exact-dup pre-collapse + LSH clusters — the hot-bucket-proof
    // composition (identical texts collapse to one representative BEFORE
    // banding, so candidate work scales with text diversity, not
    // duplication). Exact dups are constructed by self-union with offset
    // ids (the raw table has none); the oracle collapses groups on
    // md5(text), replays the LSH cluster pipeline over the (original-doc)
    // representatives, and expands labels back over the union.
    QuerySpec("q_dup_clusters_collapse", (s, dir) => {
      val d = docs(s, dir).select(col("doc_id"), col("text"))
      val all = d.unionByName(
        d.select((col("doc_id") + 1000000).as("doc_id"), col("text")))
      Dedup.nearDupClustersExactFirst(all, "doc_id", "text",
        n = 3, bands = 3, rowsPerBand = 3, threshold = 0.5)
        .orderBy("id")
    }, Some(
      s"""$dupClustersLshCtes,
         |clusters AS (
         |  SELECT id, MIN(lbl) AS canonical_id FROM reach GROUP BY id),
         |all_docs AS (
         |  SELECT doc_id, text FROM documents
         |  UNION ALL
         |  SELECT doc_id + 1000000 AS doc_id, text FROM documents),
         |grp AS (
         |  SELECT md5(text) AS k, MIN(doc_id) AS rep
         |  FROM all_docs GROUP BY md5(text))
         |SELECT a.doc_id AS id, COALESCE(c.canonical_id, g.rep) AS canonical_id
         |FROM all_docs a
         |JOIN grp g ON md5(a.text) = g.k
         |LEFT JOIN clusters c ON g.rep = c.id
         |ORDER BY id""".stripMargin)),

    // SimHash-64 fingerprints via the native Catalyst expression; the
    // oracle replays the identical bit derivation relationally
    // (md5 hex digits → ±weight per bit → sign vector).
    QuerySpec("q_simhash", (s, dir) => {
      Dedup.simhashFingerprints(docs(s, dir), "doc_id", "text")
        .orderBy("doc_id")
    }, Some(s"WITH $simhashFpCte\nSELECT doc_id, w0, w1, w2, w3 FROM fp ORDER BY doc_id"),
      headline = true),

    // SimHash near-dup pipeline: 4×16-bit band blocking (Hamming ≤ 3 ⇒
    // ≥1 shared word, pigeonhole) then exact bit_count(xor) verification.
    QuerySpec("q_simhash_neardup", (s, dir) => {
      Dedup.simhashNearDups(docs(s, dir), "doc_id", "text", maxHamming = 3)
        .orderBy("id1", "id2")
    }, Some(
      s"""WITH $simhashFpCte,
         |bands AS (
         |  SELECT doc_id, band,
         |         CASE band WHEN 0 THEN w0 WHEN 1 THEN w1
         |                   WHEN 2 THEN w2 ELSE w3 END AS word
         |  FROM fp CROSS JOIN (SELECT unnest(range(0, 4)) AS band)),
         |cand AS (
         |  SELECT DISTINCT a.doc_id AS id1, b.doc_id AS id2
         |  FROM bands a JOIN bands b
         |    ON a.band = b.band AND a.word = b.word AND a.doc_id < b.doc_id)
         |SELECT * FROM (
         |  SELECT id1, id2,
         |         CAST(bit_count(xor(f1.w0, f2.w0)) + bit_count(xor(f1.w1, f2.w1)) +
         |              bit_count(xor(f1.w2, f2.w2)) + bit_count(xor(f1.w3, f2.w3))
         |              AS BIGINT) AS hamming
         |  FROM cand
         |  JOIN fp f1 ON cand.id1 = f1.doc_id
         |  JOIN fp f2 ON cand.id2 = f2.doc_id)
         |WHERE hamming <= 3 ORDER BY id1, id2""".stripMargin)),

    // Segment-level exact dedup: fixed 10-token segments, corpus-wide
    // keep-first (by doc id then position), documents reassembled from
    // surviving segments — the "line dedup" pass of a web-corpus
    // pipeline, with the keep-first window running over md5 keys so the
    // shuffle never carries segment text (see Dedup.segmentDedup).
    QuerySpec("q_segment_dedup", (s, dir) => {
      Dedup.segmentDedup(docs(s, dir), "doc_id", "text", k = 10)
        .orderBy("doc_id")
    }, Some(
      """WITH t AS (
        |  SELECT doc_id, list_filter(string_split_regex(text, '\s+'),
        |                             x -> x <> '') AS toks
        |  FROM documents),
        |b AS (
        |  SELECT doc_id, toks,
        |         CAST(CEIL(len(toks) / 10.0) AS BIGINT) AS n_segs FROM t),
        |sx AS (
        |  SELECT doc_id, unnest(range(0, n_segs)) AS seg_idx, toks FROM b),
        |seg AS (
        |  SELECT doc_id, seg_idx,
        |         array_to_string(toks[(seg_idx * 10 + 1):(seg_idx * 10 + 10)],
        |                         ' ') AS seg_text
        |  FROM sx),
        |kept AS (
        |  SELECT doc_id, seg_idx, seg_text FROM (
        |    SELECT doc_id, seg_idx, seg_text,
        |           ROW_NUMBER() OVER (PARTITION BY seg_text
        |                              ORDER BY doc_id, seg_idx) AS rn
        |    FROM seg) WHERE rn = 1),
        |reb AS (
        |  SELECT doc_id, string_agg(seg_text, ' ' ORDER BY seg_idx) AS clean_text,
        |         COUNT(*) AS n_kept
        |  FROM kept GROUP BY doc_id)
        |SELECT b.doc_id, COALESCE(reb.clean_text, '') AS clean_text,
        |       b.n_segs, COALESCE(reb.n_kept, 0) AS n_kept
        |FROM b LEFT JOIN reb USING (doc_id) ORDER BY doc_id""".stripMargin))
  )

  /** Shared oracle CTE chain computing the 4×16-bit SimHash words in SQL
    * (md5 nibble bits, ±1 weighted by token count, sign → bit). */
  private[queries] val simhashFpCte: String =
    """tok AS (
        |  SELECT doc_id, word, COUNT(*) AS cnt FROM (
        |    SELECT doc_id,
        |           unnest(list_filter(string_split_regex(lower(text), '[^a-z0-9]+'),
        |                              x -> x <> '')) AS word
        |    FROM documents) GROUP BY doc_id, word),
        |bits AS (
        |  SELECT doc_id, j,
        |         SUM(cnt * (2 * (CAST(FLOOR(
        |               (instr('0123456789abcdef',
        |                      substr(md5(word), CAST(FLOOR(j / 4) AS INT) + 1, 1)) - 1)
        |               / POW(2, j % 4)) AS INT) % 2) - 1)) AS s
        |  FROM tok CROSS JOIN (SELECT unnest(range(0, 64)) AS j)
        |  GROUP BY doc_id, j),
        |fp AS (
        |  SELECT doc_id,
        |         CAST(SUM(CASE WHEN FLOOR(j / 16) = 0 AND s > 0 THEN CAST(POW(2, j % 16) AS BIGINT) ELSE 0 END) AS BIGINT) AS w0,
        |         CAST(SUM(CASE WHEN FLOOR(j / 16) = 1 AND s > 0 THEN CAST(POW(2, j % 16) AS BIGINT) ELSE 0 END) AS BIGINT) AS w1,
        |         CAST(SUM(CASE WHEN FLOOR(j / 16) = 2 AND s > 0 THEN CAST(POW(2, j % 16) AS BIGINT) ELSE 0 END) AS BIGINT) AS w2,
        |         CAST(SUM(CASE WHEN FLOOR(j / 16) = 3 AND s > 0 THEN CAST(POW(2, j % 16) AS BIGINT) ELSE 0 END) AS BIGINT) AS w3
        |  FROM bits GROUP BY doc_id)""".stripMargin
}
