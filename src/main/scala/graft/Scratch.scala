package graft

import org.apache.spark.sql.SparkSession
import graft.llm.Dedup
import graft.engine.Tables

// dev-only scratch profiler; not part of the library surface
object Scratch {
  def main(args: Array[String]): Unit = {
    val wholeStage = sys.env.getOrElse("SCRATCH_WSCG", "true")
    val aqe = sys.env.getOrElse("SCRATCH_AQE", "true")
    val spark = SparkSession.builder()
      .master("local[32]")
      .config("spark.sql.shuffle.partitions", "32")
      .config("spark.sql.adaptive.enabled", aqe)
      .config("spark.sql.codegen.wholeStage", wholeStage)
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
    val docs = Tables.load(spark, "/root/testdata/sf0.1", "documents")
    def time(name: String)(f: => Long): Unit = {
      val t0 = System.nanoTime()
      val n = f
      println(f"[scratch] $name rows=$n ${(System.nanoTime() - t0) / 1e9}%.2f s")
    }
    time("cold-full")(Dedup.minhashNearDups(docs, "doc_id", "text", 3, 3, 3, 0.5).count())
    time("warm-full")(Dedup.minhashNearDups(docs, "doc_id", "text", 3, 3, 3, 0.5).count())
    import org.apache.spark.sql.execution.metric.SQLMetrics
    val cg = org.apache.spark.metrics.source.CodegenMetrics
    println(s"[scratch] codegen compileTime(ms) total=${cg.METRIC_COMPILATION_TIME.getSnapshot.getValues.sum}")
    println(s"[scratch] codegen generatedClassSize total=${cg.METRIC_GENERATED_CLASS_BYTECODE_SIZE.getSnapshot.getValues.sum}")
    spark.stop()
  }
}
