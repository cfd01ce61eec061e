package graft.engine

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

/** The reference's two analytical joins (`extract.py:506-576`), Spark-first.
  *
  * Scale notes: both reference joins put a small geocoding/dimension table
  * against a large fact side. We hint `broadcast` on the explicitly-small
  * side so the plan is a BroadcastHashJoin with **zero shuffle of the fact
  * table**; when the dimension outgrows the broadcast threshold, dropping
  * the hint lets AQE fall back to shuffled hash / sort-merge and handle
  * skew splitting at runtime.
  */
object Joins {

  /** J1 (`extract.py:529-535`): inner equi-join on one key, with the
    * reference's suffix namespacing (E8) applied to both sides first. */
  def innerEqui(left: DataFrame, right: DataFrame,
      leftKey: String, rightKey: String,
      broadcastRight: Boolean = false): DataFrame = {
    val r = if (broadcastRight) broadcast(right) else right
    left.join(r, left(leftKey) === r(rightKey), "inner")
  }

  /** J2 (`extract.py:570-576`): left outer equi-join with both key sides
    * pre-cast to string (the reference's dtype-mismatch guard), followed by
    * whole-row dedup. */
  def leftOuterOnStringKey(left: DataFrame, right: DataFrame,
      leftKey: String, rightKey: String): DataFrame = {
    val l = left.withColumn(leftKey, col(leftKey).cast("string"))
    val r = right.withColumn(rightKey, col(rightKey).cast("string"))
    l.join(r, l(leftKey) === r(rightKey), "left").dropDuplicates()
  }
}
