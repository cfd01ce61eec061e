package graft

import java.nio.file.Files

import graft.engine.{SchemaIO, Sinks, Sources}

class SourcesSpec extends SparkSpec {
  import spark.implicits._

  test("S1: semicolon CSV with header round-trips (extract.py:129-130 shape)") {
    val dir = Files.createTempDirectory("graft_csv").toString
    val csv = s"$dir/input.csv"
    Files.writeString(java.nio.file.Paths.get(csv),
      "annee;code_commune;adresse;conso_mwh\n" +
        "2023;06029;1 RUE DE LA PAIX;12.5\n" +
        "2023;06030;2 AVENUE FOCH;7.25\n")
    val df = Sources.csv(spark, csv)
    assert(df.columns.toSeq === Seq("annee", "code_commune", "adresse", "conso_mwh"))
    assert(df.count() === 2)
    assert(df.select("conso_mwh").as[Double].collect().sorted.toSeq === Seq(7.25, 12.5))
  }

  test("S6/S8: JSON-lines sink then scan preserves rows") {
    val dir = Files.createTempDirectory("graft_json").toString + "/out"
    val df = Seq((1L, "a", 1.5), (2L, "b", 2.5)).toDF("id", "name", "v")
    Sinks.jsonLines(df, dir)
    val back = Sources.jsonLines(spark, dir)
    assert(back.count() === 2)
    assert(back.columns.sorted.toSeq === Seq("id", "name", "v"))
  }

  test("S5: gzip parquet sink writes readable gzip files") {
    val dir = Files.createTempDirectory("graft_pq").toString + "/out"
    val df = Seq((1L, "x")).toDF("id", "s")
    Sinks.parquetGzip(df, dir)
    val files = new java.io.File(dir).listFiles().map(_.getName)
    assert(files.exists(_.contains(".gz.parquet")))
    assert(Sources.parquet(spark, dir).count() === 1)
  }

  test("S11: schema file save/load round-trip") {
    val f = Files.createTempDirectory("graft_schema").toString + "/schema.json"
    val df = Seq((1L, "x", 2.5)).toDF("id", "s", "v")
    SchemaIO.save(df.schema, f)
    val loaded = SchemaIO.load(f)
    assert(loaded.fieldNames.toSeq === Seq("id", "s", "v"))
  }
}
