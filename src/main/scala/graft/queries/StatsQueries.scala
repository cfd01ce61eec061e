package graft.queries

import graft.QuerySpec

/** A1-A9: quantiles, IQR-conditional imputation, per-group paired tests. */
object StatsQueries {
  def specs: Seq[QuerySpec] = Seq()
}
