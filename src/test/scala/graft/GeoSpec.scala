package graft

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

import graft.spatial.Geo

/** Spatial query band (ref `document/LatLonPoint.java` box / distance /
  * polygon queries + `LatLonPointSortField` distance sort): the grid-pruned
  * kNN must be IDENTICAL to brute force, the dateline box must equal the
  * two-range predicate, the crossing-number polygon must agree with an
  * independent scalar ray caster, and the radius bbox must stay conservative
  * at the poles and across the antimeridian.
  */
class GeoSpec extends SparkTestBase {

  private lazy val pts: DataFrame = {
    import spark.implicits._
    // 4000 ids → the 0.1° synthetic lattice with collisions (ids 0 and
    // 1700·k share lat rows; distance ties exercise the id tie-break)
    Geo.syntheticPoints((0L until 4000L).toDF("doc_id"), "doc_id").cache()
  }

  private def bruteTopK(qLat: Double, qLon: Double, k: Int): Seq[(Long, Double)] =
    pts.withColumn("d", Geo.haversineMeters(lit(qLat), lit(qLon), col("lat"), col("lon")))
      .orderBy(col("d").asc, col("id").asc).limit(k)
      .select(col("id"), col("d")).collect()
      .map(r => (r.getLong(0), r.getDouble(1))).toSeq

  test("distanceTopK == brute force across query points, k, and cell sizes") {
    val queries = Seq(
      (37.7749, -122.4194), (0.0, 0.0), (89.5, 10.0), (-84.9, 179.95),
      (51.5, -0.13), (-33.86, 151.21), (10.0, -179.99))
    for ((qLat, qLon) <- queries; k <- Seq(1, 7, 50); cell <- Seq(5.0, 15.0, 45.0)) {
      val got = Geo.distanceTopK(pts, qLat, qLon, k, cell)
        .select(col("id"), col("dist_m")).collect()
        .map(r => (r.getLong(0), r.getDouble(1))).toSeq
      assert(got == bruteTopK(qLat, qLon, k),
        s"mismatch at q=($qLat,$qLon) k=$k cell=$cell")
    }
  }

  test("distanceTopK with k >= corpus returns everything, ordered") {
    val got = Geo.distanceTopK(pts, 12.3, 45.6, 5000, 15.0).count()
    assert(got == 4000)
  }

  test("dateline-crossing box == two-range predicate; plain box == between") {
    val crossing = Geo.boxQuery(pts, 10.0, 45.0, 170.0, -170.0)
    val expected = pts.where(col("lat").between(10.0, 45.0) &&
      (col("lon") >= 170.0 || col("lon") <= -170.0))
    assert(crossing.count() == expected.count() && crossing.count() > 0)
    assert(crossing.except(expected).isEmpty && expected.except(crossing).isEmpty)

    val plain = Geo.boxQuery(pts, -20.0, 20.0, -30.0, 30.0)
    val expected2 = pts.where(col("lat").between(-20.0, 20.0) && col("lon").between(-30.0, 30.0))
    assert(plain.except(expected2).isEmpty && expected2.except(plain).isEmpty)
  }

  test("distanceQuery: exact haversine refine inside a conservative bbox") {
    for ((qLat, qLon, r) <- Seq((48.8566, 2.3522, 3.0e6), (89.0, 0.0, 5.0e5),
        (0.0, 179.9, 2.0e6), (-60.0, -45.0, 1.0e7))) {
      val got = Geo.distanceQuery(pts, qLat, qLon, r).select(col("id")).collect()
        .map(_.getLong(0)).toSet
      val want = pts.withColumn("d",
          Geo.haversineMeters(lit(qLat), lit(qLon), col("lat"), col("lon")))
        .where(col("d") <= r).select(col("id")).collect().map(_.getLong(0)).toSet
      assert(got == want, s"radius mismatch at q=($qLat,$qLon,$r)")
    }
  }

  test("polygonContains agrees with an independent scalar ray caster") {
    val poly = Seq((35.0, -10.0), (60.0, -5.0), (55.0, 20.0), (40.0, 25.0), (45.0, 5.0))
    // independent scalar even-odd test (different loop shape, same geometry)
    def inside(lat: Double, lon: Double): Boolean = {
      val n = poly.size
      var c = false
      var i = 0; var j = n - 1
      while (i < n) {
        val (yi, xi) = poly(i); val (yj, xj) = poly(j)
        if (((yi > lat) != (yj > lat)) &&
            lon < (xj - xi) * (lat - yi) / (yj - yi) + xi) c = !c
        j = i; i += 1
      }
      c
    }
    val got = Geo.polygonQuery(pts, poly).select(col("id"), col("lat"), col("lon"))
      .collect().map(r => (r.getLong(0), r.getDouble(1), r.getDouble(2)))
    assert(got.nonEmpty)
    assert(got.forall { case (_, la, lo) => inside(la, lo) })
    val insideCount = pts.collect().count { r =>
      inside(r.getDouble(1), r.getDouble(2))
    }
    assert(got.length == insideCount)
  }

  test("polygonContainsSql mirrors polygonContains term-for-term") {
    val poly = Seq((0.0, 0.0), (10.0, 5.0), (0.0, 10.0))
    val sql = Geo.polygonContainsSql(poly)
    // replay the SQL predicate through Spark's parser — identical arithmetic
    // must give the identical match set
    val viaSql = pts.where(expr(sql)).select(col("id")).collect().map(_.getLong(0)).toSet
    val viaCol = pts.where(Geo.polygonContains(poly, col("lat"), col("lon")))
      .select(col("id")).collect().map(_.getLong(0)).toSet
    assert(viaSql == viaCol)
  }

  test("gridAgg counts partition the corpus exactly") {
    val agg = Geo.gridAgg(pts, 15.0)
    assert(agg.agg(sum(col("n"))).head().getLong(0) == 4000L)
    // every cell's mean sits inside the cell
    val bad = agg.where(
      floor(col("mean_lat") / 15.0).cast("long") =!= col("cell_lat") ||
      floor(col("mean_lon") / 15.0).cast("long") =!= col("cell_lon")).count()
    assert(bad == 0)
  }

  test("haversine sanity: zero distance, symmetry, known value") {
    import spark.implicits._
    val one = Seq((0.0, 0.0)).toDF("lat", "lon")
    val d0 = one.select(Geo.haversineMeters(lit(12.5), lit(7.25), lit(12.5), lit(7.25)))
      .head().getDouble(0)
    assert(d0 == 0.0)
    // quarter meridian ≈ 10,007,543 m on the mean sphere
    val dq = one.select(Geo.haversineMeters(lit(0.0), lit(0.0), lit(90.0), lit(0.0)))
      .head().getDouble(0)
    assert(math.abs(dq - math.Pi / 2 * Geo.EarthRadiusMeters) < 1.0)
    val dSym = one.select(
      Geo.haversineMeters(lit(10.0), lit(20.0), lit(-30.0), lit(140.0)) -
      Geo.haversineMeters(lit(-30.0), lit(140.0), lit(10.0), lit(20.0)))
      .head().getDouble(0)
    assert(dSym == 0.0)
  }
}
