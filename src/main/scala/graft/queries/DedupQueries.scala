package graft.queries

import graft.QuerySpec

/** Document deduplication operators (exact, MinHash-LSH, SimHash,
  * n-gram Jaccard) over `documents`. */
object DedupQueries {
  def specs: Seq[QuerySpec] = Seq()
}
