package graft.engine

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/** Spatial join tier: grid-bucketed nearest-neighbor matching with
  * haversine distance — the engine-side shape of the reference's
  * geocoding domain (BAN resolves addresses to lat/lon coordinates,
  * `extract.py:167-171`; production consumers then match each point to
  * its nearest station/antenna/office).
  *
  * Determinism contract (cross-engine): every libm call (sin, cos, asin)
  * is pinned to 8dp immediately — the same convention as the ln/exp
  * grids elsewhere — and everything between pins is plain IEEE double
  * arithmetic written as the same expression tree in the DuckDB oracle,
  * so distances are bit-stable across engines and partitionings.
  * sqrt needs no pin (IEEE-exact in both engines).
  */
object Geo {

  private val DegToRad = 0.017453292519943295 // written as a literal in
  // BOTH engines — radians()/toRadians builtins differ in evaluation tree

  /** md5-derived uniform in [0,1): deterministic synthetic coordinate
    * source (the testdata carries no lat/lon; a real deployment replaces
    * this with its geocoded columns). */
  def md5Uniform(prefix: String, key: Column): Column =
    conv(substring(md5(concat(lit(prefix), key.cast("string"))), 1, 8),
      16, 10).cast("long").cast("double") / lit(4294967296.0)

  /** Attach France-ish synthetic coordinates derived from a key. */
  def withDerivedCoords(df: DataFrame, keyCol: String, saltLat: String,
      saltLon: String): DataFrame =
    df.withColumn("lat",
        lit(41.0) + md5Uniform(saltLat, col(keyCol)) * lit(10.0))
      .withColumn("lon",
        lit(-5.0) + md5Uniform(saltLon, col(keyCol)) * lit(13.0))

  /** Pinned haversine distance in km between two (lat, lon) pairs in
    * degrees. Each transcendental output rounds to 8dp before entering
    * arithmetic; the final distance is an exact product of pinned
    * doubles. */
  def haversineKm(lat1: Column, lon1: Column, lat2: Column,
      lon2: Column): Column = {
    val s1 = round(sin((lat2 - lat1) * lit(DegToRad) / lit(2.0)), 8)
    val s2 = round(sin((lon2 - lon1) * lit(DegToRad) / lit(2.0)), 8)
    val c1 = round(cos(lat1 * lit(DegToRad)), 8)
    val c2 = round(cos(lat2 * lit(DegToRad)), 8)
    val a = s1 * s1 + c1 * c2 * s2 * s2
    round(asin(sqrt(a)), 8) * lit(12742.0)
  }

  /** Nearest station per point via grid blocking: points and stations
    * hash into `cellDeg`-degree cells; each point probes its own cell and
    * the 8 neighbors (a 9-way map-side explode, then an equi-join on the
    * cell id — never a cross product), scores candidates with
    * [[haversineKm]], and keeps the minimum via a struct-min aggregation
    * (map-side partial, ties to the smallest station key). Points with no
    * station within the 3×3 neighborhood are absent — the documented
    * coverage-radius contract (cellDeg bounds the match distance).
    *
    * Scale shape: cost = points×9 candidate probes against a cell-keyed
    * station table — linear in points for fixed station density; the
    * worst skew (all stations in one cell) is the AQE skew-join case, not
    * a plan change. Output: pointKey, stationKey, dist_km. */
  def gridNearest(points: DataFrame, pointKey: String, stations: DataFrame,
      stationKey: String, cellDeg: Double): DataFrame = {
    require(cellDeg > 0, s"cellDeg=$cellDeg")
    candidates(points, pointKey, stations, stationKey, cellDeg)
      .groupBy(col("__pk"))
      .agg(min(struct(col("__d"), col("__sk"))).as("__best"))
      .select(col("__pk").as(pointKey),
        col("__best.__sk").as(stationKey),
        col("__best.__d").as("dist_km"))
  }

  /** Spatial range join: every (point, station) pair within `radiusKm`,
    * over the same 3×3 cell-blocked candidate generation as
    * [[gridNearest]]. COMPLETE only while the neighborhood covers the
    * radius: one cell spans at least `cellDeg·111.32·cos(maxLat)` km of
    * longitude, so the caller must keep `radiusKm` below that (enforced
    * here for the engine's 41..51° synthetic band — the guard a real
    * deployment re-derives from its own latitude range).
    * Output: pointKey, stationKey, dist_km — one row per pair in range. */
  def gridWithin(points: DataFrame, pointKey: String, stations: DataFrame,
      stationKey: String, cellDeg: Double, radiusKm: Double): DataFrame = {
    require(cellDeg > 0, s"cellDeg=$cellDeg")
    val minKmPerCell = cellDeg * 111.32 * math.cos(51.0 * DegToRad)
    require(radiusKm > 0 && radiusKm <= minKmPerCell,
      s"radiusKm=$radiusKm exceeds the $minKmPerCell km the 3x3 " +
        s"neighborhood guarantees at cellDeg=$cellDeg")
    candidates(points, pointKey, stations, stationKey, cellDeg)
      .filter(col("__d") <= lit(radiusKm))
      .select(col("__pk").as(pointKey), col("__sk").as(stationKey),
        col("__d").as("dist_km"))
  }

  /** Grid DBSCAN (Ester et al. 1996) over the cell-blocked radius pairs:
    * core points have `minPts` neighbors (self included) within `epsKm`;
    * clusters are connected components of core–core proximity
    * (min-core-id labels via [[graft.llm.Dedup.dupClusters]]' label
    * propagation); non-core points within `epsKm` of a core join that
    * core's cluster (ties to the smallest cluster label — pinned, where
    * the paper leaves border assignment arbitrary); the rest is noise.
    *
    * Scale shape: ONE radius self-join (the [[gridWithin]] cost bound)
    * feeds neighbor counts, core flags, core edges, and border
    * assignment; the only iteration is the CC label propagation, rounds
    * ∝ cluster diameter. Output: keyCol, role ∈ core|border|noise,
    * cluster_id (smallest member core id; null for noise). */
  def dbscan(points: DataFrame, keyCol: String, cellDeg: Double,
      epsKm: Double, minPts: Int): DataFrame = {
    require(minPts >= 1, s"minPts=$minPts")
    val nb = points.select(col(keyCol).as("__nb"), col("lat"), col("lon"))
    // The radius self-join feeds FOUR consumers (neighbor counts, two
    // core-edge semi-joins, border assignment) and the CC loop beyond —
    // barrier it once or every consumer re-runs the blocked join.
    val pairs = Checkpoints.iterationBarrier(
      gridWithin(points, keyCol, nb, "__nb", cellDeg, epsKm)
        .filter(col(keyCol) =!= col("__nb")))
    val counts = pairs.groupBy(col(keyCol)).agg(count(lit(1)).as("__n"))
    val coreIds = Checkpoints.iterationBarrier(points.select(col(keyCol))
      .join(counts, Seq(keyCol), "left")
      .filter(coalesce(col("__n"), lit(0L)) + 1 >= minPts)
      .select(col(keyCol)))
    val coreEdges = pairs
      .join(coreIds, Seq(keyCol), "left_semi")
      .join(coreIds.withColumnRenamed(keyCol, "__nb"), Seq("__nb"), "left_semi")
      .select(col(keyCol).as("id1"), col("__nb").as("id2"))
    val coreClusters = coreIds
      .join(graft.llm.Dedup.dupClusters(coreEdges)
        .withColumnRenamed("id", keyCol), Seq(keyCol), "left")
      .select(col(keyCol),
        coalesce(col("canonical_id"), col(keyCol)).as("cluster_id"))
    val border = pairs
      .join(coreClusters.withColumnRenamed(keyCol, "__nb"), Seq("__nb"))
      .join(coreIds, Seq(keyCol), "left_anti")
      .groupBy(col(keyCol))
      .agg(min(col("cluster_id")).as("cluster_id"))
    val assigned = coreClusters.withColumn("role", lit("core"))
      .unionByName(border.withColumn("role", lit("border")))
    points.select(col(keyCol))
      .join(assigned, Seq(keyCol), "left")
      .select(col(keyCol),
        coalesce(col("role"), lit("noise")).as("role"),
        col("cluster_id"))
  }

  /** Shared 3×3 cell-blocked candidate scoring: map-side 9-way explode on
    * the point side, equi-join on the cell id, pinned haversine. */
  private def candidates(points: DataFrame, pointKey: String,
      stations: DataFrame, stationKey: String, cellDeg: Double): DataFrame = {
    val cy = floor(col("lat") / lit(cellDeg)).cast("long")
    val cx = floor(col("lon") / lit(cellDeg)).cast("long")
    val st = stations.select(col(stationKey).as("__sk"),
      col("lat").as("__slat"), col("lon").as("__slon"),
      cy.as("__cy"), cx.as("__cx"))
    val probes = points.select(col(pointKey).as("__pk"),
        col("lat").as("__plat"), col("lon").as("__plon"),
        cy.as("__py"), cx.as("__px"))
      .withColumn("__dy", explode(array(lit(-1L), lit(0L), lit(1L))))
      .withColumn("__dx", explode(array(lit(-1L), lit(0L), lit(1L))))
      .select(col("__pk"), col("__plat"), col("__plon"),
        (col("__py") + col("__dy")).as("__cy"),
        (col("__px") + col("__dx")).as("__cx"))
    probes.join(st, Seq("__cy", "__cx"))
      .withColumn("__d", haversineKm(col("__plat"), col("__plon"),
        col("__slat"), col("__slon")))
  }
}
