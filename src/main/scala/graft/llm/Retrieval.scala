package graft.llm

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/** Sparse lexical retrieval over the document corpus: BM25 ranking for a
  * fixed query-term set, RAKE keyword extraction, and greedy MMR
  * re-ranking over embedding candidates — the classic retrieval tier a
  * RAG/training-data pipeline runs beside the TF-IDF/ANN machinery
  * already in [[TextAnalysis]]/[[Similarity]].
  *
  * Scale shape: everything keys on tokens or query terms — the per-doc
  * stats are map-side token folds, the postings tables only carry the
  * |Q| query terms (filter BEFORE the shuffle), and the one global
  * scalar (N, avgdl) broadcasts as a single row. Determinism follows
  * the house rules: ln() rounds to the 8dp grid the moment it is
  * computed, per-term contributions round again after the rational
  * factor, and cross-term sums accumulate in DECIMAL.
  */
object Retrieval {

  /** Word tokens: lowercase, split on non-alphanumeric runs (the
    * TextAnalysis.tokens convention). */
  private def toks(text: Column): Column =
    filter(split(lower(text), "[^a-z0-9]+"), t => t =!= lit(""))

  /** BM25 document scores for a fixed bag of query terms (Robertson &
    * Spärck Jones; the Lucene `(k1+1)` numerator variant):
    *
    *   score(D,Q) = Σ_t idf(t) · tf·(k1+1) / (tf + k1·(1−b+b·|D|/avgdl)),
    *   idf(t) = ln(1 + (N − df + 0.5)/(df + 0.5))
    *
    * Tokens filter to the |Q| query terms BEFORE the tf aggregation, so
    * the shuffle carries only query-term postings — corpus size only
    * enters through the map-side doc-length fold and the single-row
    * (N, Σdl) scalar. idf rounds to the 8dp grid at birth (cross-libm ln
    * rule), each term's contribution rounds after the rational factor,
    * and the per-doc sum is exact DECIMAL — scores are partition-order
    * independent. Output: top-k rows (doc, score, n_terms) by
    * (score DESC, doc). */
  def bm25(docs: DataFrame, idCol: String, textCol: String,
      queryTerms: Seq[String], k1: Double = 1.2, b: Double = 0.75,
      topK: Int = 20): DataFrame = {
    val base = docs.select(col(idCol).as("doc"), toks(col(textCol)).as("ts"))
      .withColumn("dl", size(col("ts")).cast("long"))
    val scalar = base.agg(count(lit(1)).as("n_docs"),
      sum(col("dl")).as("sum_dl"))
    val tf = base
      .select(col("doc"), col("dl"), explode(col("ts")).as("t"))
      .where(col("t").isInCollection(queryTerms))
      .groupBy(col("doc"), col("dl"), col("t"))
      .agg(count(lit(1)).as("tf"))
    val df = tf.groupBy(col("t")).agg(count(lit(1)).as("df"))

    val nd = col("n_docs").cast("double")
    val idf8 = round(log(lit(1.0) +
      (nd - col("df").cast("double") + 0.5) /
        (col("df").cast("double") + 0.5)), 8)
    val avgdl = col("sum_dl").cast("double") / nd
    val tfd = col("tf").cast("double")
    val frac = tfd * (k1 + 1.0) /
      (tfd + lit(k1) * (lit(1.0 - b) + lit(b) * col("dl").cast("double") / avgdl))
    tf.join(broadcast(df), "t")
      .crossJoin(broadcast(scalar))
      .select(col("doc"),
        round(idf8 * frac, 8).cast("decimal(28,8)").as("contrib"))
      .groupBy(col("doc"))
      .agg(round(sum(col("contrib")).cast("double"), 8).as("score"),
        count(lit(1)).as("n_terms"))
      .orderBy(col("score").desc, col("doc"))
      .limit(topK)
  }

  /** RAKE keyword extraction (Rose et al. 2010): candidate phrases are
    * maximal stopword-free token runs; each word scores deg(w)/freq(w)
    * (degree counts the full length of every phrase containing w,
    * multiplicity included), and a phrase scores the sum of its words'
    * scores. Corpus-level: phrases aggregate across all documents and
    * the top-N by total score come back.
    *
    * The phrase split is a single `\b(stop…)\b → '|'` regex pass over
    * the normalized text (word-boundary anchors don't consume
    * characters, so consecutive stopwords can't shadow each other) —
    * map-only until the word/phrase aggregations. Word scores are
    * rational doubles rounded to the 8dp grid; phrase sums accumulate
    * in DECIMAL. Output: top-N (phrase, n_words, occurrences,
    * score) by (score DESC, phrase). */
  def rakeKeywords(docs: DataFrame, textCol: String,
      stopwords: Seq[String], maxLen: Int = 3, topN: Int = 20): DataFrame = {
    require(stopwords.nonEmpty && stopwords.forall(_.matches("[a-z0-9]+")),
      "stopwords must be non-empty lowercase tokens")
    val stopRe = "\\b(" + stopwords.mkString("|") + ")\\b"
    val norm = concat(lit(" "),
      regexp_replace(lower(col(textCol)), "[^a-z0-9]+", " "), lit(" "))
    val phrases = docs
      .select(explode(filter(
        transform(split(regexp_replace(norm, stopRe, "|"), "\\|"),
          p => trim(p)),
        p => p =!= lit(""))).as("phrase"))
      .withColumn("ws", split(col("phrase"), " "))
      .withColumn("n_words", size(col("ws")).cast("long"))
      .where(col("n_words") <= maxLen)

    val wordStats = phrases
      .select(col("n_words"), explode(col("ws")).as("w"))
      .groupBy(col("w"))
      .agg(sum(col("n_words")).as("deg"), count(lit(1)).as("freq"))
      .withColumn("wscore",
        round(col("deg").cast("double") / col("freq").cast("double"), 8))

    val perPhrase = phrases.groupBy(col("phrase"), col("n_words"))
      .agg(count(lit(1)).as("occurrences"))
    perPhrase
      .select(col("phrase"), col("n_words"), col("occurrences"),
        explode(split(col("phrase"), " ")).as("w"))
      .join(broadcast(wordStats.select(col("w"), col("wscore"))), "w")
      .groupBy(col("phrase"), col("n_words"), col("occurrences"))
      .agg(round(sum(col("wscore").cast("decimal(28,8)")).cast("double"), 8)
        .as("score"))
      .orderBy(col("score").desc, col("phrase"))
      .limit(topN)
  }

  /** NDCG@k (Järvelin & Kekäläinen 2002) of a ranking against graded
    * relevance labels — the retrieval-quality metric closing the loop on
    * [[bm25]]/MMR output:
    *
    *   DCG@k = Σ_{i≤k} (2^rel_i − 1) / log2(i + 1),   NDCG = DCG/IDCG
    *
    * with IDCG from the ideal (relevance-sorted) top-k over ALL judged
    * docs. Gains are exact integers (shiftleft, not pow); each rank's
    * log2 discount rounds to the 8dp grid, per-rank contributions round
    * again, and both DCG sums accumulate in DECIMAL. The ideal top-k
    * comes from orderBy+limit (TakeOrdered — map-side bounded); the
    * position windows then run over ≤ k rows. Output one row:
    * k, dcg, idcg, ndcg. */
  def ndcgAtK(ranking: DataFrame, docCol: String, scoreCol: String,
      rels: DataFrame, relDocCol: String, relCol: String,
      k: Int): DataFrame = {
    require(k >= 1, s"k=$k")
    val r = rels.select(col(relDocCol).as("doc"),
      col(relCol).cast("int").as("rel"))

    def dcgOf(df: DataFrame, order: Seq[Column], label: String) = {
      val w = Window.orderBy(order: _*)
      // integer 2^rel via shiftleft (expr form — the DSL helper takes a
      // literal shift only); exact for any graded relevance
      val gain = (expr("shiftleft(1L, rel)") - 1).cast("double")
      val disc8 = round(log2(col("rnk").cast("double") + 1.0), 8)
      df.limit(k)
        .withColumn("rnk", row_number().over(w))
        .where(col("rnk") <= k)
        .agg(coalesce(sum(round(gain / disc8, 8).cast("decimal(28,8)")),
          lit(0).cast("decimal(28,8)")).as(label))
    }

    val got = ranking
      .select(col(docCol).as("doc"), col(scoreCol).as("score"))
      .join(r, Seq("doc"), "left")
      .select(col("doc"), col("score"),
        coalesce(col("rel"), lit(0)).as("rel"))
      .orderBy(col("score").desc, col("doc"))
    val ideal = r.orderBy(col("rel").desc, col("doc"))

    val dcg = dcgOf(got, Seq(col("score").desc, col("doc")), "dcg")
    val idcg = dcgOf(ideal, Seq(col("rel").desc, col("doc")), "idcg")
    dcg.crossJoin(idcg).select(lit(k.toLong).as("k"),
      round(col("dcg").cast("double"), 8).as("dcg"),
      round(col("idcg").cast("double"), 8).as("idcg"),
      when(col("idcg") > 0,
        round(col("dcg").cast("double") / col("idcg").cast("double"), 8))
        .as("ndcg"))
  }

  /** Greedy Maximal Marginal Relevance re-ranking (Carbonell & Goldstein
    * 1998) of the exact-cosine top-`candK` candidates for one query
    * vector: repeatedly select
    *
    *   argmax_c λ·rel(c) − (1−λ)·max_{s∈S} sim(c, s)
    *
    * — relevance balanced against redundancy with what's already picked,
    * the standard diversification pass over a RAG retrieval.
    *
    * Scale shape: candidate selection is the distributed brute-force
    * cosine tier (`Similarity`'s exact path — swap in the ANN candidates
    * at corpus scale); the greedy selection itself runs driver-side over
    * the collected candK×candK similarity matrix — O(candK²) ≤ 400
    * doubles, bounded by the CONSTANT re-rank window, never by the
    * corpus (the localUnionFind/BPE-argmax documented-collect class).
    * All compared quantities (rel, sim, mmr) live on the 8dp grid with
    * id tiebreaks, so selection is total-order deterministic. λ must be
    * a decimal with ≤ 4 fractional digits in (0, 1] — it is read as the
    * EXACT rational p/10^s (BigDecimal of the shortest double repr), so
    * the MMR combination runs in exact integer arithmetic and no
    * cross-engine half-grid rounding can creep in. The reported score
    * is normalized onto the FIXED 1e-12 grid (`mmr_e12`) so values are
    * comparable across λ choices of different scale — 10^(4−s) is an
    * exact integer factor for every admissible λ. Output: (rank,
    * vec_id, rel, mmr_e12). */
  def mmrRerank(emb: DataFrame, idCol: String, vecCol: String,
      queryId: Long, candK: Int = 20, selectK: Int = 10,
      lambda: Double = 0.7): DataFrame = {
    val spark = emb.sparkSession
    import spark.implicits._

    val v = emb.select(col(idCol).cast("long").as("id"),
      transform(col(vecCol), _.cast("double")).as("v"))
    val withNorm = v.withColumn("n2",
      aggregate(zip_with(col("v"), col("v"), _ * _), lit(0.0), _ + _))
    val q = withNorm.where(col("id") === queryId)
      .select(col("v").as("qv"), col("n2").as("qn2"))

    def dot(a: Column, b: Column): Column =
      aggregate(zip_with(a, b, _ * _), lit(0.0), _ + _)

    val cand = withNorm.where(col("id") =!= queryId)
      .crossJoin(broadcast(q))
      .select(col("id"), col("v"), col("n2"),
        round(dot(col("v"), col("qv")) / sqrt(col("n2") * col("qn2")), 8)
          .as("rel"))
      .orderBy(col("rel").desc, col("id"))
      .limit(candK)

    val a = cand.select(col("id").as("i"), col("v").as("va"),
      col("n2").as("na"))
    val bb = cand.select(col("id").as("j"), col("v").as("vb"),
      col("n2").as("nb"))
    val sims = a.join(bb, col("i") =!= col("j"))
      .select(col("i"), col("j"),
        round(dot(col("va"), col("vb")) / sqrt(col("na") * col("nb")), 8)
          .as("sim"))

    // bounded collects: candK rows + candK·(candK−1) sim entries
    val rel = cand.select(col("id"), col("rel")).as[(Long, Double)]
      .collect().toMap
    val sim = sims.as[(Long, Long, Double)].collect()
      .map { case (i, j, s) => (i, j) -> s }.toMap

    // MMR combination on an EXACT integer grid: λ is read as the exact
    // rational p/10^s via BigDecimal of the double's shortest repr
    // (0.7 → 7/10, 0.25 → 25/100), and rel/sim are 8dp-grid values, so
    // p·rel_e8 − (10^s−p)·pen_e8 is exact integer arithmetic in
    // 1e-8/10^s units — λ·(8dp value) in double would land on half-grid
    // points where cross-engine ROUND diverges (the resample_interp
    // lesson). Scale is capped at 4 digits so p·1e8 stays far from
    // Long overflow; any finer λ request is rejected loudly instead of
    // silently rounded.
    val lambdaBd = java.math.BigDecimal.valueOf(lambda).stripTrailingZeros
    require(lambda > 0.0 && lambda <= 1.0 && lambdaBd.scale <= 4,
      s"lambda must be a decimal with <= 4 fractional digits in (0, 1], got $lambda")
    val den = math.pow(10, math.max(lambdaBd.scale, 0)).toLong
    val num = lambdaBd.movePointRight(math.max(lambdaBd.scale, 0))
      .longValueExact
    def e8(x: Double): Long = math.round(x * 1e8)
    var selected = Vector.empty[(Long, Long)] // (id, mmr grid units)
    var remaining = rel.keySet
    while (selected.size < math.min(selectK, rel.size)) {
      val scored = remaining.toSeq.map { c =>
        val pen =
          if (selected.isEmpty) 0L
          else selected.map { case (s, _) =>
            e8(sim.getOrElse((c, s), 0.0)) }.max
        (c, num * e8(rel(c)) - (den - num) * pen)
      }
      val (best, mmr) = scored.minBy { case (c, m) => (-m, c) }
      selected :+= ((best, mmr))
      remaining -= best
    }
    // normalize the per-λ grid (units 1e-8/den) onto the fixed 1e-12
    // grid: den | 10^4 by construction, so the factor is an exact
    // integer and scores from different λ scales stay comparable
    val toE12 = 10000L / den
    selected.zipWithIndex
      .map { case ((id, mmr), r) => (r + 1L, id, rel(id), mmr * toE12) }
      .toDF("rank", "vec_id", "rel", "mmr_e12")
  }
}
