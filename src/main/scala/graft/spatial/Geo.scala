package graft.spatial

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/** Geo-point queries over `(lat, lon)` double columns — the Spark-native
  * re-expression of the reference's `LatLonPoint` query family
  * (`/root/reference/lucene/core/src/java/org/apache/lucene/document/
  * LatLonPoint.java:220` newBoxQuery, `:296` newDistanceQuery, `:310`
  * newPolygonQuery; distance sort: `LatLonPointSortField.java` /
  * `LatLonPointDistanceComparator.java`).
  *
  * Where the reference prunes with a BKD tree over encoded ints, the Spark
  * shape is range predicates pushed to the Parquet scan (file/row-group
  * min-max pruning over `lat`/`lon` — the same two-phase "cheap bounding box
  * first, exact geometry second" plan `LatLonPointDistanceQuery.java` runs,
  * with Parquet statistics playing the BKD role) plus a coarse lat/lon grid
  * for kNN candidate selection. Every predicate and the haversine itself are
  * codegen'd column expressions — no UDFs, nothing driver-sized except the
  * bounded grid histogram (≤ 64,800 cells at 1°, independent of corpus
  * size).
  *
  * Exact (not sloppy) haversine: the reference's `SloppyMath.haversinMeters`
  * (`util/SloppyMath.java:47`) trades ≤40 cm error for speed via table-driven
  * trig; Spark's builtin `sin`/`cos`/`asin` are already intrinsics, so we
  * keep the exact formula — and the SQL oracle replicates it verbatim.
  */
object Geo {

  /** ref `geo/GeoUtils.java:79` EARTH_MEAN_RADIUS_METERS. */
  val EarthRadiusMeters: Double = 6371008.7714

  private val MaxDistanceMeters = math.Pi * EarthRadiusMeters

  /** Deterministic synthetic points from an integer id column — the
    * test/bench derivation (pure integer arithmetic, so the DuckDB oracle
    * reproduces it bit-for-bit): lat in [-85, 84.9], lon in [-180, 179.9]
    * on a 0.1° lattice.
    */
  def syntheticPoints(df: DataFrame, idCol: String): DataFrame =
    df.select(
      col(idCol).as("id"),
      (((col(idCol) * 37) % 1700).cast("double") / 10.0 - 85.0).as("lat"),
      (((col(idCol) * 73) % 3600).cast("double") / 10.0 - 180.0).as("lon"))

  /** Exact haversine great-circle distance in meters (degrees in). */
  def haversineMeters(lat1: Column, lon1: Column, lat2: Column, lon2: Column): Column = {
    val sLat = sin((radians(lat2) - radians(lat1)) / 2)
    val sLon = sin((radians(lon2) - radians(lon1)) / 2)
    val h = sLat * sLat + cos(radians(lat1)) * cos(radians(lat2)) * sLon * sLon
    lit(2.0 * EarthRadiusMeters) * asin(sqrt(h))
  }

  /** Driver-side exact haversine (same formula; used for grid-cell bounds). */
  private[spatial] def haversine(lat1: Double, lon1: Double, lat2: Double, lon2: Double): Double = {
    val sLat = math.sin(math.toRadians(lat2 - lat1) / 2)
    val sLon = math.sin(math.toRadians(lon2 - lon1) / 2)
    val h = sLat * sLat +
      math.cos(math.toRadians(lat1)) * math.cos(math.toRadians(lat2)) * sLon * sLon
    2.0 * EarthRadiusMeters * math.asin(math.min(1.0, math.sqrt(h)))
  }

  /** Bounding-box match (ref `LatLonPoint.newBoxQuery`). A box crossing the
    * antimeridian (`minLon > maxLon`) matches `lon >= minLon OR lon <=
    * maxLon` — the reference's two-range split. Pure range predicates →
    * Parquet row-group pruning.
    */
  def boxQuery(
      points: DataFrame,
      minLat: Double, maxLat: Double, minLon: Double, maxLon: Double
  ): DataFrame = {
    val latIn = col("lat") >= minLat && col("lat") <= maxLat
    val lonIn =
      if (minLon <= maxLon) col("lon") >= minLon && col("lon") <= maxLon
      else col("lon") >= minLon || col("lon") <= maxLon
    points.where(latIn && lonIn)
  }

  /** The bounding box enclosing a radius around a point (ref
    * `geo/Rectangle.java` fromPointDistance): lat span is exact; lon span
    * uses the meridian-convergence formula, widening to the full range when
    * the cap reaches a pole or crosses the antimeridian.
    * Returns (minLat, maxLat, lonPredicate).
    */
  private def radiusBox(qLat: Double, qLon: Double, radiusMeters: Double)
  : (Double, Double, Column) = {
    val latDelta = math.toDegrees(radiusMeters / EarthRadiusMeters)
    val minLat = math.max(-90.0, qLat - latDelta)
    val maxLat = math.min(90.0, qLat + latDelta)
    val sinRatio = math.sin(radiusMeters / EarthRadiusMeters) /
      math.cos(math.toRadians(qLat))
    val lonPred =
      if (minLat <= -90.0 + 1e-12 || maxLat >= 90.0 - 1e-12 ||
          radiusMeters / EarthRadiusMeters >= math.Pi / 2 ||
          math.abs(sinRatio) >= 1.0) lit(true)
      else {
        // tiny relative widening absorbs the asin/sin rounding of the bound
        // itself; the exact haversine refine makes the final answer exact
        val lonDelta = math.toDegrees(math.asin(sinRatio)) * (1 + 1e-9)
        val lo = qLon - lonDelta
        val hi = qLon + lonDelta
        if (lo < -180.0 || hi > 180.0) {
          // crosses the antimeridian: wrap into the two-range split
          val loW = if (lo < -180.0) lo + 360.0 else lo
          val hiW = if (hi > 180.0) hi - 360.0 else hi
          col("lon") >= loW || col("lon") <= hiW
        } else col("lon") >= lo && col("lon") <= hi
      }
    (minLat, maxLat, lonPred)
  }

  /** Distance (radius) match (ref `LatLonPoint.newDistanceQuery` /
    * `search/LatLonPointDistanceQuery.java`): pruned bounding-box scan,
    * exact haversine refine. Output keeps `dist_m`.
    */
  def distanceQuery(
      points: DataFrame, qLat: Double, qLon: Double, radiusMeters: Double
  ): DataFrame = {
    val (minLat, maxLat, lonPred) = radiusBox(qLat, qLon, radiusMeters)
    points
      .where(col("lat") >= minLat && col("lat") <= maxLat && lonPred)
      .withColumn("dist_m", haversineMeters(lit(qLat), lit(qLon), col("lat"), col("lon")))
      .where(col("dist_m") <= radiusMeters)
  }

  /** k nearest points by haversine distance, ties by id (ref
    * `LatLonPointSortField` distance sort + the searchAfter-style pruning in
    * `LatLonPointDistanceComparator.java`: competitive bounding boxes shrink
    * as the queue fills).
    *
    * Two-phase, scale-correct shape: (1) a coarse grid histogram (one
    * partial-agg shuffle to ≤ 64,800 rows regardless of corpus size) picks
    * candidate cells in min-possible-distance order until they hold ≥ k
    * points, giving a provable upper bound D on the k-th neighbor distance
    * (max corner distance of the chosen cells + the cell diagonal bound —
    * distance is 1-Lipschitz on the sphere surface); (2) a bounding-box
    * pruned scan filters `haversine <= D` and takes the exact top-k
    * (Catalyst `TakeOrderedAndProject`, per-partition heaps). Identical to
    * brute force by construction; GeoSpec asserts it.
    */
  def distanceTopK(
      points: DataFrame, qLat: Double, qLon: Double, k: Int,
      cellDeg: Double = 15.0
  ): DataFrame = {
    val cells = points
      .groupBy(floor(col("lat") / cellDeg).cast("long").as("clat"),
        floor(col("lon") / cellDeg).cast("long").as("clon"))
      .count()
      .collect()
      .map(r => (r.getLong(0), r.getLong(1), r.getLong(2)))
    val total = cells.map(_._3).sum
    val exact = points.withColumn(
      "dist_m", haversineMeters(lit(qLat), lit(qLon), col("lat"), col("lon")))
    if (total <= k || cells.isEmpty) {
      return exact.orderBy(col("dist_m").asc, col("id").asc).limit(k)
    }
    // min distance to a cell: haversine to the (lat-clamped, lon-nearest)
    // point of the cell — a point IN the cell, so an upper bound on the
    // cell's min; valid for candidate ORDERING (the guarantee D comes from
    // counts, not from this ordering being tight)
    def cellBounds(clat: Long, clon: Long): (Double, Double) = {
      val lo = clat * cellDeg; val hi = lo + cellDeg
      val lolon = clon * cellDeg; val hilon = lolon + cellDeg
      val cLat = math.max(lo, math.min(hi, qLat))
      // nearest lon within the cell under wraparound
      val cLon = {
        val cand = Seq(lolon, hilon, qLon).map { l =>
          val c = math.max(lolon, math.min(hilon, l))
          val d = math.abs(c - qLon) min math.abs(c - qLon + 360) min math.abs(c - qLon - 360)
          (c, d)
        }
        cand.minBy(_._2)._1
      }
      val near = haversine(qLat, qLon, cLat, cLon)
      val corners = for (la <- Seq(lo, hi); lo2 <- Seq(lolon, hilon))
        yield haversine(qLat, qLon, math.max(-90, math.min(90, la)), lo2)
      (near, corners.max)
    }
    val ordered = cells.map { case (clat, clon, n) =>
      val (near, far) = cellBounds(clat, clon); (near, far, n)
    }.sortBy(_._1)
    var acc = 0L; var d = 0.0; var i = 0
    while (acc < k && i < ordered.length) {
      acc += ordered(i)._3; d = math.max(d, ordered(i)._2); i += 1
    }
    // + cell diagonal bound: the corner max underestimates by at most the
    // in-cell surface diameter (<= R * rad(cellDeg) * 2)
    val dBound = math.min(MaxDistanceMeters,
      d + EarthRadiusMeters * math.toRadians(cellDeg) * 2.0)
    val (minLat, maxLat, lonPred) = radiusBox(qLat, qLon, dBound)
    exact
      .where(col("lat") >= minLat && col("lat") <= maxLat && lonPred)
      .where(col("dist_m") <= dBound)
      .orderBy(col("dist_m").asc, col("id").asc)
      .limit(k)
  }

  /** Point-in-polygon match (ref `LatLonPoint.newPolygonQuery` /
    * `geo/Polygon2D` via `EdgeTree.java`): bounding-box prefilter (pushable
    * range predicates — the reference's relateTriangle grid plays this
    * role), then an even-odd crossing-number test unrolled edge-by-edge into
    * one codegen'd boolean expression (x = lon, y = lat). Vertices are
    * (lat, lon); the polygon must not cross the antimeridian.
    */
  def polygonQuery(points: DataFrame, poly: Seq[(Double, Double)]): DataFrame = {
    require(poly.size >= 3, "polygon needs >= 3 vertices")
    points.where(polygonContains(poly, col("lat"), col("lon")))
  }

  /** The crossing-parity column for one polygon (shared with the oracle
    * generator so both sides evaluate the identical arithmetic).
    */
  def polygonContains(poly: Seq[(Double, Double)], lat: Column, lon: Column): Column = {
    val minLat = poly.map(_._1).min; val maxLat = poly.map(_._1).max
    val minLon = poly.map(_._2).min; val maxLon = poly.map(_._2).max
    val edges = poly.zip(poly.tail :+ poly.head)
    val crossings = edges.map { case ((y1, x1), (y2, x2)) =>
      // edge crosses the horizontal ray from (lon, lat) going +x
      val straddles = (lit(y1) > lat) =!= (lit(y2) > lat)
      val xAt = lit(x2 - x1) * (lat - y1) / lit(y2 - y1) + lit(x1)
      when(straddles && lon < xAt, 1).otherwise(0)
    }
    val inBox = lat >= minLat && lat <= maxLat && lon >= minLon && lon <= maxLon
    inBox && (crossings.reduce(_ + _) % 2 === 1)
  }

  /** The same crossing test as DuckDB SQL over columns `lat`/`lon` — the
    * oracle half of [[polygonContains]].
    */
  def polygonContainsSql(poly: Seq[(Double, Double)]): String = {
    val minLat = poly.map(_._1).min; val maxLat = poly.map(_._1).max
    val minLon = poly.map(_._2).min; val maxLon = poly.map(_._2).max
    val edges = poly.zip(poly.tail :+ poly.head)
    val terms = edges.map { case ((y1, x1), (y2, x2)) =>
      s"(CASE WHEN ((($y1) > lat) != (($y2) > lat)) AND " +
        s"lon < (($x2) - ($x1)) * (lat - ($y1)) / (($y2) - ($y1)) + ($x1) " +
        "THEN 1 ELSE 0 END)"
    }
    s"lat >= ($minLat) AND lat <= ($maxLat) AND lon >= ($minLon) AND lon <= ($maxLon) " +
      s"AND (${terms.mkString(" + ")}) % 2 = 1"
  }

  /** Grid aggregation (the geo-facet analog — ref
    * `facet/range/DoubleRangeFacetCounts` over LatLonDocValues): point count
    * + mean position per cellDeg×cellDeg cell. One partial-agg shuffle.
    */
  def gridAgg(points: DataFrame, cellDeg: Double): DataFrame =
    points
      .groupBy(floor(col("lat") / cellDeg).cast("long").as("cell_lat"),
        floor(col("lon") / cellDeg).cast("long").as("cell_lon"))
      .agg(count(lit(1)).as("n"),
        round(avg(col("lat")), 6).as("mean_lat"),
        round(avg(col("lon")), 6).as("mean_lon"))
}
