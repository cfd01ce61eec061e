package graft.queries

import graft.QuerySpec

/** Text-analysis operators over `documents` (lang-id, quality, tokens,
  * fingerprints) — the training-data-pipeline surface. */
object TextQueries {
  def specs: Seq[QuerySpec] = Seq()
}
