package graft

import org.apache.spark.sql.SparkSession

// dev-only scratch profiler; not part of the library surface
object Scratch {
  def main(args: Array[String]): Unit = {
    val cpus = sys.env.getOrElse("SCRATCH_CPUS", "4")
    val wscg = sys.env.getOrElse("SCRATCH_WSCG", "true")
    val aqe = sys.env.getOrElse("SCRATCH_AQE", "true")
    val factory = sys.env.getOrElse("SCRATCH_CG_FACTORY", "FALLBACK")
    val names = sys.env.getOrElse("SCRATCH_QUERIES",
      "q_dup_clusters").split(",").toSeq
    val dir = sys.env.getOrElse("SCRATCH_DIR", "/root/testdata/sf0.1")
    val spark = SparkSession.builder()
      .master(s"local[$cpus]")
      .config("spark.sql.shuffle.partitions", cpus)
      .config("spark.sql.adaptive.enabled", aqe)
      .config("spark.sql.codegen.wholeStage", wscg)
      .config("spark.sql.codegen.factoryMode", factory)
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
    graft.llm.TopK.raiseSortFallbackThreshold(spark)
    names.foreach { n =>
      val t0 = System.nanoTime()
      val cnt = QueryRegistry.byName(n).run(spark, dir).count()
      println(f"[scratch] $n wscg=$wscg aqe=$aqe factory=$factory " +
        f"rows=$cnt ${(System.nanoTime() - t0) / 1e9}%.2f s")
      spark.catalog.clearCache()
      System.gc()
    }
    spark.stop()
  }
}
