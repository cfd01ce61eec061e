package graft

import org.apache.spark.sql.functions._

import graft.engine.Geo

class GeoSpec extends SparkSpec {
  import spark.implicits._

  test("haversineKm: known city distance within the 8dp-pin tolerance") {
    // Paris -> Lyon great-circle distance is ~391.5 km
    val d = Seq((48.8566, 2.3522, 45.7640, 4.8357))
      .toDF("lat1", "lon1", "lat2", "lon2")
      .select(Geo.haversineKm(col("lat1"), col("lon1"),
        col("lat2"), col("lon2")).as("d"))
      .as[Double].head()
    assert(math.abs(d - 391.5) < 1.0, d)
    // zero distance, antipodal sanity (half circumference ~ 20015 km)
    val z = Seq((10.0, 10.0, 10.0, 10.0)).toDF("a", "b", "c", "d")
      .select(Geo.haversineKm(col("a"), col("b"), col("c"), col("d")))
      .as[Double].head()
    assert(z == 0.0)
    val anti = Seq((0.0, 0.0, 0.0, 180.0)).toDF("a", "b", "c", "d")
      .select(Geo.haversineKm(col("a"), col("b"), col("c"), col("d")))
      .as[Double].head()
    assert(math.abs(anti - 20015.0) < 5.0, anti)
  }

  test("dbscan: core blob, border attachment, noise; labels are min core id") {
    // 4-point blob within ~3 km pairwise (minPts=4 -> all core), one
    // point ~7 km out reaching only one blob member (border), one far
    // point (noise). eps 10 km, cell 0.15 deg (>= 10.4 km of lon at 51N).
    val pts = Seq(
      (10L, 45.000, 3.000), (11L, 45.010, 3.010), (12L, 45.020, 3.000),
      (13L, 45.010, 2.990),
      (20L, 45.105, 3.000), // reaches only 12 (~9.5 km); others > 10 km
      (30L, 48.000, -2.000)
    ).toDF("id", "lat", "lon")
    val got = graft.engine.Geo
      .dbscan(pts, "id", cellDeg = 0.15, epsKm = 10.0, minPts = 4)
      .orderBy("id")
      .collect().map(r => (r.getLong(0), r.getString(1),
        if (r.isNullAt(2)) -1L else r.getLong(2))).toSeq
    assert(got === Seq(
      (10L, "core", 10L), (11L, "core", 10L), (12L, "core", 10L),
      (13L, "core", 10L), (20L, "border", 10L), (30L, "noise", -1L)))
  }

  test("gridNearest: picks the true nearest across a cell border; " +
      "uncovered points absent; ties break to smallest key") {
    val pts = Seq((1L, 45.01, 3.01), (2L, 48.0, -20.0)).toDF("id", "lat", "lon")
    val sts = Seq(
      (10L, 44.99, 2.99), // neighbor cell, ~2.6 km away: the true nearest
      (11L, 45.30, 3.30), // same cell as point 1 but farther (~37 km)
      (12L, 44.99, 2.99)  // same spot as 10: tie -> smaller key wins
    ).toDF("id", "lat", "lon")
    val got = Geo.gridNearest(pts, "id", sts, "id", cellDeg = 0.5)
      .collect().map(r => (r.getLong(0), r.getLong(1))).toSeq
    assert(got == Seq((1L, 10L))) // point 2 has no station in 3x3 -> absent
  }
}
