package graft.engine

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.execution.FileSourceScanLike
import org.apache.spark.sql.execution.exchange.ShuffleExchangeLike

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
  * the ESTIMATED scan split count is below the session's default
  * parallelism, so it never fights AQE coalescing or adds a shuffle at
  * scale. The shuffle it does add locally moves the narrow projection
  * (~16 B/row working sets), not the source.
  *
  * The guard is EXECUTION-FREE (round-11 fix): round 10 probed
  * `df.rdd.getNumPartitions`, and with AQE on `Dataset.rdd` finalizes
  * the adaptive plan — eagerly EXECUTING every upstream shuffle stage
  * into a throwaway QueryExecution (an extra full-data pass per call;
  * the round-10 driver bench measured q_calibration 9.9 → 20.3 s from
  * exactly this plus a nested double-spread). The replacement reads
  * only STATIC planning information off the pre-AQE physical plan
  * (`queryExecution.sparkPlan` — pure driver-side planning, no job):
  *  - plan already contains a shuffle → partitions are already
  *    `spark.sql.shuffle.partitions` (a deliberate session setting) →
  *    identity. This also makes NESTED spreads free by construction:
  *    the inner call sees the outer call's exchange and no-ops.
  *  - otherwise the plan is narrow-over-scans: estimate the scan split
  *    count from the file-source statistics with Spark's own split
  *    formula (maxSplitBytes = min(maxPartitionBytes, max(openCost,
  *    paddedBytes/parallelism)); FilePartition.maxSplitBytes) and
  *    repartition only when that estimate is below the session
  *    parallelism. Non-file leaves (local relations, cached/RDD scans)
  *    conservatively count as already-parallel — at worst a spread
  *    opportunity is missed, never an extra shuffle paid.
  *
  * Correctness: round-robin redistribution only — callers must be
  * order-free (integer-grid sums, percentiles, count aggregations; the
  * house determinism discipline already guarantees this for every
  * consumer).
  */
object Partitioning {

  /** Repartition `df` to the session default parallelism iff its
    * statically ESTIMATED partition count is lower; identity otherwise
    * (the 100 TB path, and any plan already downstream of a shuffle).
    * Never runs a job: the decision is pure driver-side planning. */
  def spread(df: DataFrame): DataFrame = {
    val par = df.sparkSession.sparkContext.defaultParallelism
    val plan = df.queryExecution.sparkPlan // pre-AQE: planning only
    if (plan.find(_.isInstanceOf[ShuffleExchangeLike]).isDefined) df
    else if (estimatedScanSplits(df, par) < par) df.repartition(par)
    else df
  }

  /** [[spread]] for EXPANDING stages downstream of a shuffle (pair
    * generation, explode-by-labels): when the SOURCE is small, AQE
    * coalesces the post-aggregation shuffle to very few partitions
    * (`coalescePartitions.minPartitionSize` floors at 1 MB), which then
    * serializes a stage whose OUTPUT is quadratically larger than its
    * input — measured on q_item_cf round 11: the basket→pairs stage ran
    * 3 tasks over a 3.7 MB input while writing a 110 MB pair exchange
    * (4.4 s of a 8 s query). The guard is the same static scan-splits
    * estimate as [[spread]] — at 100 TB the scans dwarf the session
    * parallelism and this is an identity (no extra pass); locally it
    * adds one tiny repartition whose explicit partition count AQE
    * honors (user-specified numbers are never coalesced). */
  def spreadExpand(df: DataFrame): DataFrame = {
    val par = df.sparkSession.sparkContext.defaultParallelism
    if (estimatedScanSplits(df, par) < par) df.repartition(par) else df
  }

  /** Estimated split count of the plan's file-source leaves under
    * Spark's FilePartition.maxSplitBytes packing (per-file openCost
    * padding, bytesPerCore floor, maxPartitionBytes cap). Non-file
    * leaves count as `par` (assume already parallel — skip). */
  private def estimatedScanSplits(df: DataFrame, par: Int): Long = {
    val conf = df.sparkSession.sessionState.conf
    val maxBytes = math.max(1L, conf.filesMaxPartitionBytes)
    val openCost = math.max(1L, conf.filesOpenCostInBytes)
    df.queryExecution.sparkPlan.collectLeaves().map {
      case f: FileSourceScanLike =>
        val loc = f.relation.location
        val padded = loc.sizeInBytes +
          loc.inputFiles.length.toLong * openCost
        val split = math.min(maxBytes,
          math.max(openCost, padded / math.max(1, par)))
        math.max(1L, (padded + split - 1) / split)
      case _ => par.toLong
    }.sum
  }
}
