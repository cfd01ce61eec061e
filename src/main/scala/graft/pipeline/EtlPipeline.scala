package graft.pipeline

import org.apache.spark.sql.{DataFrame, SaveMode, SparkSession}
import org.apache.spark.sql.functions._

import graft.engine._

/** The reference's three entry points (SURVEY.md §3: EP1 flow, EP2 extract,
  * EP3 transform, plus the loader) re-composed as pure
  * `DataFrame => DataFrame` stages over a medallion bronze/silver/gold
  * layout — no Prefect, no mutable pipeline classes; orchestration is
  * function composition, retries/scheduling belong to the caller.
  *
  * Dataflow shape mirrors `extract.py:590-640` on the testdata star schema:
  * a fact-side input joined inner against one enrichment table (J1), left
  * against a second after string-key casts (J2), suffix-namespaced (E8),
  * batch-stamped (E11); transform runs the reference's fixed chain
  * (`transform.py:382-409`): cast → impute → derive → split → stats; load
  * appends only new keys (J3/J4). Zone writes are the observable contract
  * (files per zone, `{batch_id}` partitioned); each stage boundary is an
  * explicit materialization barrier exactly like the reference's
  * bronze write→reload (`extract.py:539-561`).
  */
object EtlPipeline {

  final case class Zones(bronze: String, silver: String, gold: String)

  /** E1 (`extract.py:317-331`): schema assert — required columns present
    * and (optionally) input non-empty. The emptiness probe runs a one-row
    * job (`isEmpty` = limit-1 scan), so it is opt-in for hot paths. */
  def assertRequired(df: DataFrame, required: Seq[String],
      requireNonEmpty: Boolean = false): DataFrame = {
    val missing = required.filterNot(df.columns.contains)
    require(missing.isEmpty, s"missing required columns: $missing")
    if (requireNonEmpty) require(!df.isEmpty, "input frame is empty")
    df
  }

  /** EP2 extract: build the wide silver frame from the three sources,
    * write bronze + silver zones, return the silver frame (re-read from
    * the zone — the reference's memory barrier). */
  def extract(spark: SparkSession, sfDir: String, zones: Zones,
      batchId: String): DataFrame = {
    val customer = assertRequired(
      Tables.load(spark, sfDir, "customer"), Seq("c_custkey", "c_name"))
    val orders = Tables.load(spark, sfDir, "orders")
    val lineitem = Tables.load(spark, sfDir, "lineitem")

    // J1: fact ⋈ small dim (broadcast) with E8 suffix namespacing
    val e = Names.withSuffix(orders, "_enedis")
    val b = Names.withSuffix(customer, "_ban")
    val merged = Joins.innerEqui(e, b, "o_custkey_enedis", "c_custkey_ban",
      broadcastRight = true)
    Sinks.parquetGzip(merged, s"${zones.bronze}/merged_enedis_ban")

    // J2: ⟕ second source on string-cast keys + dedup (per-order rollup
    // keeps the join 1:1, as the reference's ademe-by-id_ban is)
    val perOrder = lineitem.groupBy(col("l_orderkey")).agg(
      sum(col("l_quantity").cast("decimal(18,2)")).cast("double")
        .as("quantite_totale_ademe"),
      sum((col("l_extendedprice") * (lit(1.0) - col("l_discount")))
        .cast("decimal(18,2)")).cast("double").as("montant_net_ademe"),
      count(lit(1)).cast("double").as("nb_lignes_ademe"))
    val bronze = Sources.parquet(spark, s"${zones.bronze}/merged_enedis_ban")
    val silver = Joins.leftOuterOnStringKey(bronze, perOrder,
      "o_orderkey_enedis", "l_orderkey")
    val stamped = Derive.withBatchId(Names.sortColumns(silver), batchId)
    Sinks.parquetGzip(stamped, s"${zones.silver}/silver_data",
      partitionByCols = Seq("batch_id"))
    Sources.parquet(spark, s"${zones.silver}/silver_data")
  }

  /** Gold entity declarations (shape of `schema_golden_data`): column
    * subsets + defaults for declared-but-absent columns. */
  val GoldEntities: Seq[Entities.EntitySpec] = Seq(
    Entities.EntitySpec("adresses", Seq(
      "c_custkey_ban" -> Entities.ColSpec("string", "N/C"),
      "c_name_ban" -> Entities.ColSpec("string", "N/C"),
      "c_mktsegment_ban" -> Entities.ColSpec("string", "N/C")),
      required = Seq("c_custkey_ban")),
    Entities.EntitySpec("logements", Seq(
      "o_orderkey_enedis" -> Entities.ColSpec("string", "N/C"),
      "c_custkey_ban" -> Entities.ColSpec("string", "N/C"),
      "conso_kwh" -> Entities.ColSpec("float64", -1.0),
      "conso_kwh_m2" -> Entities.ColSpec("float64", -1.0),
      "montant_net_ademe" -> Entities.ColSpec("float64", -1.0),
      "etiquette" -> Entities.ColSpec("string", "N/C"),
      "batch_id" -> Entities.ColSpec("string", "N/C")),
      required = Seq("o_orderkey_enedis")))

  /** EP3 transform: the reference's fixed chain (`transform.py:402-409`)
    * over the silver frame; returns the gold entity frames (written gzip
    * parquet under the gold zone). */
  def transform(spark: SparkSession, silver: DataFrame, zones: Zones,
      batchId: String,
      entitySpecs: Seq[Entities.EntitySpec] = GoldEntities,
      clock: java.time.Clock = java.time.Clock.systemUTC()): Map[String, DataFrame] = {
    // 1. casting (T1 inference; a declared schema would use Cast.applySchema)
    val (cast, _) = Cast.autoCastStringColumns(silver)

    // 2. imputation (A1-A4) on the float columns that carry nulls
    val floatCols = Seq("quantite_totale_ademe", "montant_net_ademe",
      "nb_lignes_ademe").filter(cast.columns.contains)
    val (filled, _) = Impute.fillFloats(cast, floatCols)

    // 3. derives (T3-T6 shapes)
    val derived = filled
      .withColumn("conso_kwh",
        Derive.scaledFromFirstExisting(filled,
          Seq("quantite_totale_ademe"), 1000.0))
      .withColumn("conso_kwh_m2",
        Derive.safeRatio(col("conso_kwh"), col("nb_lignes_ademe")))
      .withColumn("ecart_absolu",
        Derive.absDiff(col("montant_net_ademe"), col("conso_kwh")))
      .withColumn("etiquette", col("o_orderpriority_enedis"))

    // 4. split into gold entities (T7/T8/A10); a reference user passes
    // SchemaIO.referenceGoldEntities here to drive the original 6-table
    // gold model from the bundled config
    val entities = Entities.splitAll(derived, entitySpecs)

    // 5. per-label paired statistics (A5-A9) → tests_statistiques entity
    val stats = graft.engine.Stats.dpeStatistics(derived, "etiquette",
      "conso_kwh_m2", "montant_net_ademe", batchId)

    val all = entities + ("tests_statistiques" -> stats)
    // zone file naming mirrors the reference's `{entity}_{date}_{batch_id}`
    // contract (`transform.py:308`) — the loader locates the same run by
    // reconstructing the name from (batchId, clock)
    all.foreach { case (name, df) =>
      Sinks.parquetGzip(df, s"${zones.gold}/${Dates.zoneFileName(name, batchId, clock)}")
    }
    all
  }

  /** Loader (`load.py:181-212`): FK-ordered idempotent append of each gold
    * entity into the serving store — here a parquet target standing in for
    * the reference's Postgres (same anti-join-then-append contract as
    * `Sinks.jdbcAppendNew`). */
  def load(spark: SparkSession, zones: Zones, targetDir: String,
      keys: Map[String, Seq[String]], batchId: String,
      clock: java.time.Clock = java.time.Clock.systemUTC()): Unit = {
    val order = Seq("adresses", "logements", "tests_statistiques")
      .filter(keys.contains)
    order.foreach { entity =>
      val incoming = Sources.parquet(spark,
        s"${zones.gold}/${Dates.zoneFileName(entity, batchId, clock)}")
      val target = s"$targetDir/$entity"
      // existence via the Hadoop FS API, so hdfs://, s3a://, and local
      // targets all work (java.io.File would silently skip the anti-join
      // for any non-local URI and break idempotence)
      val targetPath = new org.apache.hadoop.fs.Path(target)
      val fs = targetPath.getFileSystem(spark.sessionState.newHadoopConf())
      val fresh =
        if (fs.exists(targetPath)) {
          val existing = Sources.parquet(spark, target)
          LoadDedup.antiJoinOnKeys(incoming, existing, keys(entity))
        } else incoming
      // deterministic keep-first needs a total tiebreak order: the key
      // columns alone are constant within a key partition, so order by
      // every column (sorted) to pin which duplicate survives.
      val deduped = LoadDedup.dedupKeepFirst(fresh, keys(entity),
        orderBy = fresh.columns.sorted.toSeq)
      deduped.write.mode(SaveMode.Append).parquet(target)
    }
  }

  /** EP1: the full E→T→L flow. */
  def run(spark: SparkSession, sfDir: String, zones: Zones, targetDir: String,
      batchId: String,
      clock: java.time.Clock = java.time.Clock.systemUTC()): Map[String, DataFrame] = {
    val silver = extract(spark, sfDir, zones, batchId)
    val gold = transform(spark, silver, zones, batchId, clock = clock)
    load(spark, zones, targetDir, Map(
      "adresses" -> Seq("c_custkey_ban"),
      "logements" -> Seq("o_orderkey_enedis"),
      "tests_statistiques" -> Seq("batch_id", "etiquette")), batchId, clock)
    gold
  }

  /** EP1 with per-action telemetry — the Spark-native analog of the
    * reference's `decorator_logger` timing wrapper around every pipeline
    * stage (`utils/__init__.py:156-182`): returns the gold entities plus
    * one (action, duration) record per executed job. */
  def runInstrumented(spark: SparkSession, sfDir: String, zones: Zones,
      targetDir: String, batchId: String,
      clock: java.time.Clock = java.time.Clock.systemUTC())
      : (Map[String, DataFrame], Seq[Telemetry.QueryRecord]) = {
    val recorder = Telemetry.attach(spark)
    try {
      val gold = run(spark, sfDir, zones, targetDir, batchId, clock)
      // QueryExecutionListener callbacks are delivered asynchronously on the
      // shared listener bus; bounded poll until the first record lands
      val deadline = System.nanoTime() + 5L * 1000 * 1000 * 1000
      while (recorder.records.isEmpty && System.nanoTime() < deadline)
        Thread.sleep(50)
      (gold, recorder.records)
    } finally spark.listenerManager.unregister(recorder)
  }
}
