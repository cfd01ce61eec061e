package graft

import graft.llm.Retrieval

/** Analytic pins for the retrieval tier — BM25 idf/tf algebra, RAKE
  * degree/frequency scoring, and MMR's relevance-vs-redundancy greedy,
  * all on hand-checkable inputs. */
class RetrievalSpec extends SparkSpec {
  import spark.implicits._

  test("bm25: rare term outranks common term at equal tf") {
    // "rare" appears in 1 of 4 docs, "common" in all 4 — doc 1 (rare)
    // must outscore doc 2 (common only), equal lengths
    val docs = Seq(
      (1L, "rare alpha beta"),
      (2L, "common alpha beta"),
      (3L, "common gamma delta"),
      (4L, "common epsilon zeta")).toDF("doc_id", "text")
    val r = Retrieval.bm25(docs, "doc_id", "text",
      Seq("rare", "common"), topK = 4).collect()
    assert(r.head.getAs[Long]("doc") === 1L)
    val scores = r.map(x => x.getAs[Long]("doc") -> x.getAs[Double]("score"))
      .toMap
    assert(scores(1L) > scores(2L))
    // docs 2..4 are symmetric in the query terms → identical scores
    assert(scores(2L) === scores(3L) && scores(3L) === scores(4L))
  }

  test("bm25: idf formula matches closed form for a single-term query") {
    // one doc, query term tf=2, dl=4, avgdl=4 → frac = 2·2.2/(2+1.2) = 1.375
    // idf = ln(1 + (1 − 1 + 0.5)/(1 + 0.5)) = ln(4/3)
    val docs = Seq((7L, "x x y z")).toDF("doc_id", "text")
    val r = Retrieval.bm25(docs, "doc_id", "text", Seq("x")).head()
    val idf8 = BigDecimal(math.log(1.0 + 0.5 / 1.5))
      .setScale(8, BigDecimal.RoundingMode.HALF_UP).toDouble
    val expected = BigDecimal(idf8 * 1.375)
      .setScale(8, BigDecimal.RoundingMode.HALF_UP).toDouble
    assert(math.abs(r.getAs[Double]("score") - expected) < 1e-12)
    assert(r.getAs[Long]("n_terms") === 1L)
  }

  test("rake: phrase split on stopwords, deg/freq scores") {
    // "deep learning" twice, "keyword" once; stopword 'of' splits.
    // deg(deep)=4, freq=2 → 2.0; deg(learning)=4 → 2.0; deg(keyword)=1 → 1.0
    // score("deep learning") = 4.0 > score("keyword") = 1.0
    val docs = Seq(
      (1L, "deep learning of keyword"),
      (2L, "deep learning")).toDF("doc_id", "text")
    val r = Retrieval.rakeKeywords(docs, "text", Seq("of"), topN = 10)
      .collect()
    val byPhrase = r.map(x => x.getAs[String]("phrase") ->
      (x.getAs[Double]("score"), x.getAs[Long]("occurrences"))).toMap
    assert(byPhrase("deep learning") === ((4.0, 2L)))
    assert(byPhrase("keyword") === ((1.0, 1L)))
    assert(r.head.getAs[String]("phrase") === "deep learning")
  }

  test("rake: consecutive stopwords don't shadow each other") {
    // " of of " — the \b replace must break BOTH, yielding no phantom
    // 'of' phrase
    val docs = Seq((1L, "alpha of of beta")).toDF("doc_id", "text")
    val phrases = Retrieval.rakeKeywords(docs, "text", Seq("of"), topN = 10)
      .collect().map(_.getAs[String]("phrase")).toSet
    assert(phrases === Set("alpha", "beta"))
  }

  test("rake: phrases longer than maxLen are dropped") {
    val docs = Seq((1L, "one two three four of short")).toDF("doc_id", "text")
    val phrases = Retrieval.rakeKeywords(docs, "text", Seq("of"),
      maxLen = 3, topN = 10).collect().map(_.getAs[String]("phrase")).toSet
    assert(phrases === Set("short"))
  }

  test("mmr: redundant near-duplicate is deferred below a diverse pick") {
    // q = (1,0,0); id1 = (0.8,0.6,0) and id3 = (0.8,−0.6,0) tie on
    // rel = 0.8 (id1 wins by id); id2 ≈ id1 (near-dup, sim ≈ 1,
    // mmr ≈ 0.7·0.8 − 0.3·1 = 0.26) vs id3 (sim(3,1) = 0.28,
    // mmr = 0.56 − 0.084 = 0.476) → diversity flips the order.
    val emb = Seq(
      (0L, Array(1.0f, 0.0f, 0.0f)),
      (1L, Array(0.8f, 0.6f, 0.0f)),
      (2L, Array(0.8f, 0.6f, 0.01f)),
      (3L, Array(0.8f, -0.6f, 0.0f))).toDF("vec_id", "embedding")
    val r = Retrieval.mmrRerank(emb, "vec_id", "embedding",
      queryId = 0L, candK = 3, selectK = 3).collect()
    val order = r.sortBy(_.getAs[Long]("rank")).map(_.getAs[Long]("vec_id"))
    assert(order.head === 1L) // highest relevance first
    assert(order(1) === 3L)   // diverse beats the near-dup of the pick
    assert(order(2) === 2L)
  }

  test("mmr: rank 1 carries mmr = 7000·rel_e8 on the fixed 1e-12 grid") {
    val emb = Seq(
      (0L, Array(1.0f, 0.0f)),
      (1L, Array(1.0f, 0.0f)),
      (2L, Array(0.0f, 1.0f))).toDF("vec_id", "embedding")
    val r = Retrieval.mmrRerank(emb, "vec_id", "embedding",
      queryId = 0L, candK = 2, selectK = 2).collect()
      .sortBy(_.getAs[Long]("rank"))
    assert(r.head.getAs[Long]("vec_id") === 1L)
    assert(r.head.getAs[Double]("rel") === 1.0)
    assert(r.head.getAs[Long]("mmr_e12") === 7000L * 100000000L)
  }

  test("mmr: lambda is honored as an exact decimal rational, rejected when too fine") {
    // λ = 1.0 → pure relevance: the near-duplicate of the first pick
    // (rel ≈ 0.79996) outranks the diverse-but-less-relevant vector 3
    // (rel ≈ 0.759) — the opposite of the default-λ diversified order
    val emb = Seq(
      (0L, Array(1.0f, 0.0f, 0.0f)),
      (1L, Array(0.8f, 0.6f, 0.0f)),
      (2L, Array(0.8f, 0.6f, 0.01f)),
      (3L, Array(0.7f, -0.6f, 0.0f))).toDF("vec_id", "embedding")
    val pure = Retrieval.mmrRerank(emb, "vec_id", "embedding",
      queryId = 0L, candK = 3, selectK = 3, lambda = 1.0).collect()
      .sortBy(_.getAs[Long]("rank")).map(_.getAs[Long]("vec_id"))
    assert(pure.toSeq === Seq(1L, 2L, 3L))
    // λ = 0.5 → 5/10 grid, reported ×1000 on the fixed 1e-12 grid:
    // rank-1 mmr is 5000·rel_e8 exactly
    val half = Retrieval.mmrRerank(emb, "vec_id", "embedding",
      queryId = 0L, candK = 3, selectK = 1, lambda = 0.5).collect()
    assert(half.head.getAs[Long]("mmr_e12") ===
      5000L * half.head.getAs[Double]("rel").*(1e8).round)
    // a λ that is not a <= 4-digit decimal fails loudly, never silently
    // rounded onto a different grid
    intercept[IllegalArgumentException] {
      Retrieval.mmrRerank(emb, "vec_id", "embedding",
        queryId = 0L, candK = 3, selectK = 1, lambda = 1.0 / 3.0)
    }
  }
}
