package graft.queries

import graft.QuerySpec

/** Embedding similarity search (brute-force cosine top-k, LSH-bucketed ANN)
  * over `embeddings`. */
object SimilarityQueries {
  def specs: Seq[QuerySpec] = Seq()
}
