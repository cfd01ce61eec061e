package graft.queries

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

import graft.QuerySpec
import graft.engine.{Geo, Tables}

/** Spatial tier over md5-derived synthetic coordinates (the testdata has
  * no lat/lon; the derivation is deterministic and replayed verbatim by
  * the oracle — a real deployment swaps in its geocoded columns, which is
  * exactly the reference's BAN output, `extract.py:167-171`).
  *
  * Determinism: every libm call in the haversine is pinned to 8dp (the
  * engine's ln/exp-grid convention); everything else is identical-tree
  * IEEE double arithmetic, so distances and nearest-station choices
  * hash-match across engines. */
object GeoQueries {

  private def t(s: SparkSession, dir: String, name: String): DataFrame =
    Tables.load(s, dir, name)

  /** Oracle fragment: the md5-uniform coordinate, same tree as
    * [[Geo.md5Uniform]]. */
  private def uSql(prefix: String, key: String): String =
    s"CAST(CAST(concat('0x', substr(md5('$prefix' || CAST($key AS VARCHAR)), " +
      s"1, 8)) AS UBIGINT) AS DOUBLE) / 4294967296.0"

  // MATERIALIZED: DuckDB 1.0 re-inlines a CTE at every reference — cust
  // feeds probes, the pair join AND the final projection, so the md5
  // coordinate derivation would otherwise recompute 3-4x (and on the
  // chained dbscan oracle the re-evaluation compounds; the DedupQueries
  // shingleCte note has the measured numbers)
  private def custCte =
    s"""cust AS MATERIALIZED (
       |  SELECT c_custkey,
       |         41.0 + ${uSql("glat|", "c_custkey")} * 10.0 AS lat,
       |         -5.0 + ${uSql("glon|", "c_custkey")} * 13.0 AS lon
       |  FROM customer)""".stripMargin

  private def suppCte =
    s"""supp AS MATERIALIZED (
       |  SELECT s_suppkey,
       |         41.0 + ${uSql("slat|", "s_suppkey")} * 10.0 AS lat,
       |         -5.0 + ${uSql("slon|", "s_suppkey")} * 13.0 AS lon
       |  FROM supplier)""".stripMargin

  /** Oracle fragment: 8dp-pinned haversine km, same tree as
    * [[Geo.haversineKm]]. */
  private def havSql(lat1: String, lon1: String, lat2: String,
      lon2: String): String = {
    val r = "0.017453292519943295"
    val s1 = s"ROUND(sin(($lat2 - $lat1) * $r / 2.0), 8)"
    val s2 = s"ROUND(sin(($lon2 - $lon1) * $r / 2.0), 8)"
    val c1 = s"ROUND(cos($lat1 * $r), 8)"
    val c2 = s"ROUND(cos($lat2 * $r), 8)"
    s"ROUND(asin(sqrt($s1 * $s1 + $c1 * $c2 * $s2 * $s2)), 8) * 12742.0"
  }

  def specs: Seq[QuerySpec] = Seq(

    // Cell occupancy: point counts per 0.5-degree grid cell — the
    // density histogram a spatial pipeline builds first, and the
    // standalone gate on the coordinate derivation + cell math.
    QuerySpec("q_geo_cells", (s, dir) => {
      Geo.withDerivedCoords(t(s, dir, "customer"), "c_custkey",
          "glat|", "glon|")
        .groupBy(floor(col("lat") / lit(0.5)).cast("long").as("cell_y"),
          floor(col("lon") / lit(0.5)).cast("long").as("cell_x"))
        .agg(count(lit(1)).as("n_points"))
        .orderBy("cell_y", "cell_x")
    }, Some(
      s"""WITH $custCte
         |SELECT CAST(FLOOR(lat / 0.5) AS BIGINT) AS cell_y,
         |       CAST(FLOOR(lon / 0.5) AS BIGINT) AS cell_x,
         |       COUNT(*) AS n_points
         |FROM cust GROUP BY 1, 2 ORDER BY cell_y, cell_x""".stripMargin)),

    // Grid-bucketed nearest station: each customer probes its 3x3 cell
    // neighborhood of suppliers, scores candidates with the pinned
    // haversine, keeps the minimum via struct-min (ties to the smallest
    // station key). Customers with no supplier within the neighborhood
    // are absent - the coverage-radius contract of cell blocking.
    QuerySpec("q_geo_nearest", (s, dir) => {
      val cust = Geo.withDerivedCoords(t(s, dir, "customer"), "c_custkey",
        "glat|", "glon|")
      val supp = Geo.withDerivedCoords(t(s, dir, "supplier"), "s_suppkey",
        "slat|", "slon|")
      Geo.gridNearest(cust, "c_custkey", supp, "s_suppkey", cellDeg = 0.5)
        .orderBy("c_custkey")
    }, Some(
      s"""WITH $custCte,
         |$suppCte,
         |probes AS (
         |  SELECT c.c_custkey, c.lat AS plat, c.lon AS plon,
         |         CAST(FLOOR(c.lat / 0.5) AS BIGINT) + dy.v AS cy,
         |         CAST(FLOOR(c.lon / 0.5) AS BIGINT) + dx.v AS cx
         |  FROM cust c
         |  CROSS JOIN (VALUES (-1), (0), (1)) AS dy(v)
         |  CROSS JOIN (VALUES (-1), (0), (1)) AS dx(v)),
         |cand AS (
         |  SELECT p.c_custkey, s.s_suppkey,
         |         ${havSql("p.plat", "p.plon", "s.lat", "s.lon")} AS d
         |  FROM probes p
         |  JOIN supp s
         |    ON CAST(FLOOR(s.lat / 0.5) AS BIGINT) = p.cy
         |   AND CAST(FLOOR(s.lon / 0.5) AS BIGINT) = p.cx),
         |ranked AS (
         |  SELECT c_custkey, s_suppkey, d,
         |         ROW_NUMBER() OVER (PARTITION BY c_custkey
         |                            ORDER BY d, s_suppkey) AS rn
         |  FROM cand)
         |SELECT c_custkey, s_suppkey, d AS dist_km
         |FROM ranked WHERE rn = 1 ORDER BY c_custkey""".stripMargin)),

    // Spatial range join: every customer-supplier pair within 30 km -
    // the "all stations serving this address" query. Same cell-blocked
    // candidates as q_geo_nearest; 30 km stays under the ~35 km of
    // longitude one half-degree cell guarantees at 51 deg, so the 3x3
    // neighborhood is complete for the radius.
    QuerySpec("q_geo_within", (s, dir) => {
      val cust = Geo.withDerivedCoords(t(s, dir, "customer"), "c_custkey",
        "glat|", "glon|")
      val supp = Geo.withDerivedCoords(t(s, dir, "supplier"), "s_suppkey",
        "slat|", "slon|")
      Geo.gridWithin(cust, "c_custkey", supp, "s_suppkey",
          cellDeg = 0.5, radiusKm = 30.0)
        .orderBy("c_custkey", "s_suppkey")
    }, Some(
      s"""WITH $custCte,
         |$suppCte,
         |probes AS (
         |  SELECT c.c_custkey, c.lat AS plat, c.lon AS plon,
         |         CAST(FLOOR(c.lat / 0.5) AS BIGINT) + dy.v AS cy,
         |         CAST(FLOOR(c.lon / 0.5) AS BIGINT) + dx.v AS cx
         |  FROM cust c
         |  CROSS JOIN (VALUES (-1), (0), (1)) AS dy(v)
         |  CROSS JOIN (VALUES (-1), (0), (1)) AS dx(v)),
         |cand AS (
         |  SELECT p.c_custkey, s.s_suppkey,
         |         ${havSql("p.plat", "p.plon", "s.lat", "s.lon")} AS d
         |  FROM probes p
         |  JOIN supp s
         |    ON CAST(FLOOR(s.lat / 0.5) AS BIGINT) = p.cy
         |   AND CAST(FLOOR(s.lon / 0.5) AS BIGINT) = p.cx)
         |SELECT c_custkey, s_suppkey, d AS dist_km
         |FROM cand WHERE d <= 30.0
         |ORDER BY c_custkey, s_suppkey""".stripMargin)),

    // Grid DBSCAN over customer points (eps 8 km, minPts 4): cores by
    // neighborhood count, clusters = min-core-id connected components of
    // core-core proximity, borders attach to their smallest in-range
    // cluster label, rest is noise. eps/minPts chosen so components stay
    // bounded at every scale factor (the recursive-CC oracle replays the
    // same label propagation; a supercritical eps would square it).
    QuerySpec("q_geo_dbscan", (s, dir) => {
      Geo.dbscan(
          Geo.withDerivedCoords(t(s, dir, "customer"), "c_custkey",
            "glat|", "glon|"),
          "c_custkey", cellDeg = 0.12, epsKm = 8.0, minPts = 4)
        .orderBy("c_custkey")
    }, Some {
      // Connected components as UNROLLED large/small-star contraction
      // rounds (Kiveris et al., the same algorithm the engine's
      // dupClustersStar runs) instead of a recursive reachability CTE.
      // The recursive form accumulates EVERY (id, reaching-label) pair —
      // m² rows for an m-node component, which at sf1 density (where the
      // whole 150k-point box is ONE supercritical component) was the
      // measured 108 GB RSS; min-label relax unrolls need O(diameter)
      // rounds (59 measured on that graph, pointer jumps barely helping).
      // Star contraction converges in O(log n) rounds — 7 measured at
      // sf1 — and its state is the (shrinking) edge set itself. 12
      // unrolled rounds carry margin, and the query FAILS LOUD (error())
      // if rounds 11 and 12 still differ, so an unconverged unroll can
      // never silently ship wrong labels. At the fixpoint the edge set
      // is the star forest (member, component-min-root) — exactly the
      // engine's label table.
      val starRounds = (1 to 12).map { k =>
        s"""s$k AS (SELECT a AS u, b AS v FROM e${k - 1}
           |        UNION ALL SELECT b, a FROM e${k - 1}),
           |m$k AS (SELECT u, LEAST(u, MIN(v)) AS m FROM s$k GROUP BY u),
           |ls$k AS MATERIALIZED (
           |  SELECT DISTINCT s.v AS a, m.m AS b
           |  FROM s$k s JOIN m$k m USING (u) WHERE s.v > s.u),
           |sm$k AS (SELECT a, MIN(b) AS m FROM ls$k GROUP BY a),
           |e$k AS MATERIALIZED (
           |  SELECT DISTINCT a, b FROM (
           |    SELECT l.b AS a, sm.m AS b FROM ls$k l
           |    JOIN sm$k sm USING (a) WHERE l.b <> sm.m
           |    UNION ALL SELECT a, m FROM sm$k) t)""".stripMargin
      }.mkString(",\n")
      s"""WITH $custCte,
         |probes AS (
         |  SELECT c.c_custkey, c.lat AS plat, c.lon AS plon,
         |         CAST(FLOOR(c.lat / 0.12) AS BIGINT) + dy.v AS cy,
         |         CAST(FLOOR(c.lon / 0.12) AS BIGINT) + dx.v AS cx
         |  FROM cust c
         |  CROSS JOIN (VALUES (-1), (0), (1)) AS dy(v)
         |  CROSS JOIN (VALUES (-1), (0), (1)) AS dx(v)),
         |pairs AS MATERIALIZED (
         |  SELECT p.c_custkey AS ak, s.c_custkey AS bk
         |  FROM probes p
         |  JOIN cust s
         |    ON CAST(FLOOR(s.lat / 0.12) AS BIGINT) = p.cy
         |   AND CAST(FLOOR(s.lon / 0.12) AS BIGINT) = p.cx
         |   AND p.c_custkey <> s.c_custkey
         |  WHERE ${havSql("p.plat", "p.plon", "s.lat", "s.lon")} <= 8.0),
         |nc AS (SELECT ak, COUNT(*) AS n FROM pairs GROUP BY ak),
         |core AS MATERIALIZED (
         |  SELECT c.c_custkey AS k FROM cust c LEFT JOIN nc ON nc.ak = c.c_custkey
         |  WHERE COALESCE(nc.n, 0) + 1 >= 4),
         |ce AS (
         |  SELECT p.ak AS id1, p.bk AS id2 FROM pairs p
         |  JOIN core c1 ON p.ak = c1.k JOIN core c2 ON p.bk = c2.k),
         |e0 AS MATERIALIZED (
         |  SELECT DISTINCT GREATEST(id1, id2) AS a, LEAST(id1, id2) AS b
         |  FROM ce WHERE id1 <> id2),
         |$starRounds,
         |conv AS (
         |  SELECT COUNT(*) AS d FROM (
         |    (SELECT * FROM e12 EXCEPT SELECT * FROM e11)
         |    UNION ALL
         |    (SELECT * FROM e11 EXCEPT SELECT * FROM e12)) x),
         |cl AS (
         |  SELECT a AS id, b AS cluster_id FROM e12
         |  WHERE CASE WHEN (SELECT d FROM conv) = 0 THEN 1
         |             ELSE CAST(error('q_geo_dbscan oracle: star contraction not converged in 12 rounds') AS INT)
         |        END = 1),
         |corecl AS MATERIALIZED (
         |  SELECT c.k, COALESCE(cl.cluster_id, c.k) AS cluster_id
         |  FROM core c LEFT JOIN cl ON cl.id = c.k),
         |border AS (
         |  SELECT p.ak AS k, MIN(cc.cluster_id) AS cluster_id
         |  FROM pairs p JOIN corecl cc ON p.bk = cc.k
         |  WHERE p.ak NOT IN (SELECT k FROM core)
         |  GROUP BY p.ak)
         |SELECT c.c_custkey, COALESCE(a.role, 'noise') AS role, a.cluster_id
         |FROM cust c
         |LEFT JOIN (
         |  SELECT k, 'core' AS role, cluster_id FROM corecl
         |  UNION ALL
         |  SELECT k, 'border', cluster_id FROM border) a ON a.k = c.c_custkey
         |ORDER BY c.c_custkey""".stripMargin
    }))
}
