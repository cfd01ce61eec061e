package graft.queries

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

import graft.QuerySpec
import graft.engine.Tables
import graft.llm.Bpe

/** BPE tokenizer training (Sennrich et al. 2016) as oracle-checked
  * queries — the tokenizer-training step of a pretraining pipeline
  * (reference analog: the token-level derivations of `transform.py`;
  * capability is from the builder brief's text-analysis tier).
  *
  * The DuckDB oracle replays the identical per-round argmax solve with
  * unrolled MATERIALIZED CTEs (the `q_pagerank` round-unrolling
  * precedent; MATERIALIZED because each round's vocabulary feeds BOTH
  * the next pair count and the next merge — inlined CTEs would expand
  * the chain 2^rounds times). The merge step is expressed in SQL as a
  * single left-to-right `replace` over the space-joined symbol string:
  * doubling every separator first (`' '→'  '`) makes each adjacent
  * symbol pair matchable exactly once with non-overlapping semantics —
  * bit-identical to the Scala fold in [[graft.llm.Bpe.mergePair]]
  * (prototype-verified against an independent reference implementation).
  */
object BpeQueries {

  private def docs(s: SparkSession, dir: String): DataFrame =
    Tables.load(s, dir, "documents")

  /** Merge rounds for the registered queries. Small enough that every
    * learned pair keeps count >= 2 on the synthetic corpus (the Scala
    * side stops below 2; the unrolled oracle cannot), large enough to
    * exercise merged-symbol pairs (rank 10 merges ('p','ar')). */
  private[queries] val NumMerges = 12

  /** CTE chain `v0, p1, m1, v1, ..., m{iters}, v{iters}`: v{k} is the
    * (word, cnt, space-joined symbols) vocabulary after k merges, m{k}
    * the k-th argmax pair (count desc, pair lexicographic). */
  private def bpeCtes(iters: Int): String = {
    val v0 =
      """v0 AS MATERIALIZED (
        |  SELECT word, CAST(COUNT(*) AS BIGINT) AS cnt,
        |         rtrim(regexp_replace(word, '(.)', '\1 ', 'g')) || '</w>' AS s
        |  FROM (SELECT unnest(list_filter(string_split_regex(lower(text), '[^a-z0-9]+'),
        |                                  x -> x <> '')) AS word
        |        FROM documents)
        |  GROUP BY word)""".stripMargin
    val rounds = (1 to iters).map { k =>
      val prev = s"v${k - 1}"
      s"""p$k AS MATERIALIZED (
         |  SELECT lft, rgt, SUM(cnt) AS n FROM (
         |    SELECT cnt, l[i] AS lft, l[i+1] AS rgt FROM (
         |      SELECT cnt, l, unnest(range(1, len(l))) AS i
         |      FROM (SELECT cnt, string_split(s, ' ') AS l FROM $prev)))
         |  GROUP BY lft, rgt),
         |m$k AS (SELECT lft, rgt, n FROM p$k ORDER BY n DESC, lft, rgt LIMIT 1),
         |v$k AS MATERIALIZED (
         |  SELECT v.word, v.cnt,
         |         trim(replace(replace(replace(' ' || v.s || ' ', ' ', '  '),
         |                              ' ' || m.lft || '  ' || m.rgt || ' ',
         |                              ' ' || m.lft || m.rgt || ' '),
         |                      '  ', ' ')) AS s
         |  FROM $prev v CROSS JOIN m$k m)""".stripMargin
    }.mkString(",\n")
    s"$v0,\n$rounds"
  }

  def specs: Seq[QuerySpec] = Seq(

    // Learned merge table: one corpus-wide (word, count) reduction, then
    // per-round cost proportional to VOCABULARY (not corpus) — the reason
    // BPE training is tractable at 100 TB. The collect per round is the
    // 1-row argmax driving the next literal merge.
    QuerySpec("q_bpe_merges", (s, dir) => {
      Bpe.learnMerges(docs(s, dir), "text", NumMerges).orderBy("rank")
    }, Some {
      val unions = (1 to NumMerges).map { k =>
        s"""SELECT ${k - 1} AS rank, lft AS "left", rgt AS "right",
           |       CAST(n AS BIGINT) AS pair_count FROM m$k""".stripMargin
      }.mkString("\nUNION ALL\n")
      s"""WITH ${bpeCtes(NumMerges)}
         |SELECT * FROM (
         |$unions
         |) ORDER BY rank""".stripMargin
    }),

    // Applying the learned table: segment the vocabulary by replaying the
    // merges in rank order (the inference-time half of the tokenizer).
    QuerySpec("q_bpe_segment", (s, dir) => {
      val d = docs(s, dir)
      val table = Bpe.learnMerges(d, "text", NumMerges)
        .orderBy("rank").collect()
        .map(r => (r.getString(1), r.getString(2))).toSeq
      Bpe.segment(d, "text", table)
        .select(col("word"), concat_ws(" ", col("syms")).as("segmented"),
          size(col("syms")).cast("long").as("n_tokens"))
        .orderBy("word")
    }, Some(
      s"""WITH ${bpeCtes(NumMerges)}
         |SELECT word, s AS segmented,
         |       CAST(len(string_split(s, ' ')) AS BIGINT) AS n_tokens
         |FROM v$NumMerges ORDER BY word""".stripMargin))
  )
}
