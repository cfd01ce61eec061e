package graft.engine

import org.apache.spark.sql.DataFrame

/** Materialization barriers for iterative algorithms (connected components,
  * Lloyd rounds): each round must cut lineage, or plans deepen unboundedly
  * and upstream similarity computations re-run per iteration.
  *
  * Two modes, selected per session:
  *  - DEFAULT (`localCheckpoint`): blocks live in executor storage — fast,
  *    no filesystem round-trip, ideal for local/dev and short jobs. NOT
  *    fault-tolerant: on a 1000-executor cluster, losing one executor
  *    mid-iteration loses blocks with no lineage left to recompute them.
  *  - RELIABLE (`spark.graft.checkpoint.reliable=true` + a checkpoint dir
  *    set via `sparkContext.setCheckpointDir`, HDFS/object-store at
  *    cluster scale): `checkpoint()` writes the RDD to the reliable store,
  *    surviving executor loss — the mode a multi-hour 100 TB CC job runs.
  *    Each iteration writes a NEW checkpoint and Spark does not delete
  *    superseded ones by default — on a real cluster also set
  *    `spark.cleaner.referenceTracking.cleanCheckpoints=true` at session
  *    build (ContextCleaner then removes a round's files once its RDD is
  *    unreferenced), or point the checkpoint dir at a storage path with a
  *    TTL/lifecycle rule; otherwise an N-round job retains N copies.
  *
  * Both are eager (materialize now), so callers can count on "computed
  * exactly once" semantics either way.
  */
object Checkpoints {

  /** Session conf key switching iteration barriers to reliable mode. */
  val ReliableConf = "spark.graft.checkpoint.reliable"

  def reliableEnabled(df: DataFrame): Boolean =
    df.sparkSession.conf.getOption(ReliableConf).exists(_.toBoolean)

  /** Materialize `df` now and return a lineage-free frame (see class doc
    * for the local-vs-reliable trade-off). */
  def iterationBarrier(df: DataFrame): DataFrame =
    if (reliableEnabled(df)) {
      require(df.sparkSession.sparkContext.getCheckpointDir.isDefined,
        s"$ReliableConf=true requires sparkContext.setCheckpointDir " +
          "(an HDFS/object-store path on a real cluster)")
      df.checkpoint()
    } else df.localCheckpoint()
}
