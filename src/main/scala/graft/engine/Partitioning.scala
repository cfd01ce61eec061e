package graft.engine

import org.apache.spark.sql.DataFrame

/** Scale-adaptive parallelism floor for iterative/multi-pass working
  * sets (guide-§2 shape: derive partitioning from the data and the
  * session, never a constant).
  *
  * Why it exists: a narrow working set projected off a compact source
  * can inherit VERY few scan splits — at sf0.1 the 9.2 MB lineitem
  * parquet packs into 3 splits (`spark.sql.files.openCostInBytes` floors
  * split size at 4 MB), so every subsequent pass over the persisted set
  * runs 3 tasks while the other 29 cores idle; measured on the IRLS fit:
  * each round was a ~2.3 s stage of 3 tasks (ProfileQ, round-10 open).
  * At 100 TB the same working set arrives in thousands of splits and
  * this helper is a structural NO-OP — the repartition only fires when
  * the plan's partition count is BELOW the session's default
  * parallelism, so it never fights AQE coalescing or adds a shuffle at
  * scale. The shuffle it does add locally moves the narrow projection
  * (~16 B/row working sets), not the source.
  *
  * Correctness: round-robin redistribution only — callers must be
  * order-free (integer-grid sums, percentiles, count aggregations; the
  * house determinism discipline already guarantees this for every
  * consumer).
  */
object Partitioning {

  /** Repartition `df` to the session default parallelism iff its
    * current physical plan yields fewer partitions; identity otherwise
    * (the 100 TB path). */
  def spread(df: DataFrame): DataFrame = {
    val par = df.sparkSession.sparkContext.defaultParallelism
    if (df.rdd.getNumPartitions < par) df.repartition(par) else df
  }
}
