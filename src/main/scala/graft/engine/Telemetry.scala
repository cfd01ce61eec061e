package graft.engine

import java.util.concurrent.ConcurrentLinkedQueue

import scala.jdk.CollectionConverters._

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.execution.QueryExecution
import org.apache.spark.sql.util.QueryExecutionListener

/** The Spark-native analog of the reference's `decorator_logger` timing
  * wrapper (`utils/__init__.py:156-182`): instead of decorating Python
  * functions, a `QueryExecutionListener` observes every action's logical
  * plan + wall time on the session. Records are kept in-memory (bounded by
  * caller resets); a production deployment would forward them to a metrics
  * sink the same way the reference ships to ELK. */
object Telemetry {

  final case class QueryRecord(action: String, durationNs: Long,
      failed: Boolean)

  final class Recorder extends QueryExecutionListener {
    private val queue = new ConcurrentLinkedQueue[QueryRecord]()
    override def onSuccess(funcName: String, qe: QueryExecution,
        durationNs: Long): Unit =
      queue.add(QueryRecord(funcName, durationNs, failed = false))
    override def onFailure(funcName: String, qe: QueryExecution,
        exception: Exception): Unit =
      queue.add(QueryRecord(funcName, 0L, failed = true))
    def records: Seq[QueryRecord] = queue.iterator().asScala.toSeq
    def reset(): Unit = queue.clear()
  }

  /** Attach a recorder to the session; returns it for inspection. */
  def attach(spark: SparkSession): Recorder = {
    val r = new Recorder
    spark.listenerManager.register(r)
    r
  }
}
