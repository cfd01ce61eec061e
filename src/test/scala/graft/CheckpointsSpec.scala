package graft

import org.apache.spark.sql.functions._

import graft.engine.Checkpoints
import graft.llm.Dedup

/** Iteration-barrier modes: default localCheckpoint vs reliable
  * checkpoint() (cluster fault-tolerance). Both must materialize and both
  * must produce identical CC labels. */
class CheckpointsSpec extends SparkSpec {
  import spark.implicits._

  private def withReliable[A](body: => A): A = {
    val dir = java.nio.file.Files.createTempDirectory("graft-ckpt")
    spark.sparkContext.setCheckpointDir(dir.toString)
    spark.conf.set(Checkpoints.ReliableConf, "true")
    try body
    finally spark.conf.unset(Checkpoints.ReliableConf)
  }

  // a 2-chain, a 3-chain, and a self-contained triangle
  private lazy val pairs = Seq(
    (1L, 2L), (2L, 3L), (3L, 4L), (10L, 11L),
    (20L, 21L), (21L, 22L), (20L, 22L)).toDF("id1", "id2")

  test("reliable mode without a checkpoint dir fails fast with a clear error") {
    // fresh conf flag but NO setCheckpointDir → require() must trip before
    // any job runs (not a mid-iteration SparkException hours in)
    val prev = spark.sparkContext.getCheckpointDir
    spark.conf.set(Checkpoints.ReliableConf, "true")
    try {
      if (prev.isEmpty) {
        val ex = intercept[IllegalArgumentException] {
          Checkpoints.iterationBarrier(Seq((1L, 2L)).toDF("id1", "id2"))
        }
        assert(ex.getMessage.contains("setCheckpointDir"))
      } // else: another suite set a dir on the shared context — skip silently
    } finally spark.conf.unset(Checkpoints.ReliableConf)
  }
  test("reliable mode writes RDD checkpoints and yields identical clusters") {
    // force the distributed loop (not the driver union-find fast path) so
    // the per-iteration barrier actually runs in both modes
    val local = Dedup.dupClusters(pairs, localEdgeThreshold = 0)
      .collect().map(r => (r.getLong(0), r.getLong(1))).toSet
    val localStar = Dedup.dupClustersStar(pairs)
      .collect().map(r => (r.getLong(0), r.getLong(1))).toSet
    val (reliable, reliableStar) = withReliable {
      val a = Dedup.dupClusters(pairs, localEdgeThreshold = 0)
        .collect().map(r => (r.getLong(0), r.getLong(1))).toSet
      val b = Dedup.dupClustersStar(pairs)
        .collect().map(r => (r.getLong(0), r.getLong(1))).toSet
      // reliable checkpoints really hit the checkpoint dir
      val ckDir = new java.io.File(
        new java.net.URI(spark.sparkContext.getCheckpointDir.get))
      assert(ckDir.exists && ckDir.listFiles().nonEmpty)
      (a, b)
    }
    val expected = Set(
      (1L, 1L), (2L, 1L), (3L, 1L), (4L, 1L), (10L, 10L), (11L, 10L),
      (20L, 20L), (21L, 20L), (22L, 20L))
    assert(local === expected)
    assert(localStar === expected)
    assert(reliable === expected)
    assert(reliableStar === expected)
  }

}
