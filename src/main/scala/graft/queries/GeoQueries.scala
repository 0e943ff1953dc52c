package graft.queries

import org.apache.spark.sql.functions._
import graft.Tables.t
import graft.functions.{ExactAgg, GeoFunctions, Sql}
import graft.operators.SpatialJoin

/** Spatial operator coverage (SURVEY.md §2.3 J2-J4, §2.7 F21-F24).
  * The testdata has no geo columns, so coordinates are synthesized
  * deterministically from integer keys with EXACT integer arithmetic
  * (identical in Spark and DuckDB), then the spatial operators run on
  * top. Offsets are chosen so no point lands on a cell/polygon boundary
  * within double error.
  */
object GeoQueries {

  // point clouds in a 10x10 planar field, on a 0.01 grid
  private def cx(key: String) = s"(CAST(($key * 7919) % 1000 AS DOUBLE) / 100.0)"
  private def cy(key: String) = s"(CAST(($key * 104729) % 1000 AS DOUBLE) / 100.0)"
  private def cxCol(key: org.apache.spark.sql.Column) =
    ((key * 7919) % 1000).cast("double") / 100.0
  private def cyCol(key: org.apache.spark.sql.Column) =
    ((key * 104729) % 1000).cast("double") / 100.0

  /** Diamond polygons |x-cx|+|y-cy| <= r; centers on 0.005 offsets so no
    * 0.01-grid point hits a boundary. (poly_id, cx, cy, r)
    */
  private val diamonds = Seq(
    (1L, 2.505, 2.505, 1.505), (2L, 7.005, 5.005, 2.005),
    (3L, 5.005, 8.005, 1.205), (4L, 6.005, 1.005, 0.805))

  /** q23 — J2 point-in-polygon join: ray-cast vs broadcast polygon table
    * with bbox prefilter; zero shuffles on the point side. Oracle uses
    * the closed diamond form |dx|+|dy| <= r (same membership away from
    * boundaries, which the data construction guarantees).
    */
  private val q23 = Q("q23_pip_join",
    (s, dir) => {
      val pts = t(s, dir, "customer").select(col("c_custkey"),
        cxCol(col("c_custkey")).as("px"), cyCol(col("c_custkey")).as("py"))
      val polys = {
        import s.implicits._
        diamonds.toDF("poly_id", "dcx", "dcy", "dr")
          .withColumn("ring", expr(
            """array(struct(dcx + dr as x, dcy as y),
                     struct(dcx as x, dcy + dr as y),
                     struct(dcx - dr as x, dcy as y),
                     struct(dcx as x, dcy - dr as y))"""))
          .select(col("poly_id"), col("ring"))
      }
      SpatialJoin.pointInPolygonJoin(pts, polys, col("px"), col("py"), "ring")
        .groupBy(col("poly_id"))
        .agg(count(lit(1)).as("n_points"), min(col("c_custkey")).as("first_key"))
        .orderBy(col("poly_id"))
    },
    Some {
      val polyValues = diamonds.map { case (id, dx, dy, r) =>
        s"($id, $dx, $dy, $r)" }.mkString(", ")
      s"""WITH pts AS (SELECT c_custkey, ${cx("c_custkey")} AS px,
          ${cy("c_custkey")} AS py FROM customer),
        polys(poly_id, dcx, dcy, dr) AS (VALUES $polyValues)
        SELECT CAST(poly_id AS BIGINT) AS poly_id,
          COUNT(*) AS n_points, MIN(c_custkey) AS first_key
        FROM pts JOIN polys
          ON ABS(px - dcx) + ABS(py - dcy) <= dr
        GROUP BY poly_id ORDER BY poly_id"""
    })

  /** q24 — J3 radius join: grid-bucket + neighbor-cell equi-join + exact
    * distance (the reference's rtree-prefilter shape, one shuffle).
    * Oracle is the brute-force cross join — same exact predicate.
    */
  private val q24 = Q("q24_radius_join",
    (s, dir) => {
      val a = t(s, dir, "customer").select(col("c_custkey"),
        cxCol(col("c_custkey")).as("ax"), cyCol(col("c_custkey")).as("ay"))
      val b = t(s, dir, "supplier").select(col("s_suppkey"),
        cxCol(col("s_suppkey")).as("bx"), cyCol(col("s_suppkey")).as("by"))
      SpatialJoin.radiusJoin(a, b, col("ax"), col("ay"),
        col("bx"), col("by"), radius = 1.0)
        .select(col("c_custkey"), col("s_suppkey"), col("dist2"))
        .orderBy(col("c_custkey"), col("s_suppkey"))
    },
    Some(s"""WITH a AS (SELECT c_custkey, ${cx("c_custkey")} AS ax,
        ${cy("c_custkey")} AS ay FROM customer),
      b AS (SELECT s_suppkey, ${cx("s_suppkey")} AS bx,
        ${cy("s_suppkey")} AS by FROM supplier)
      SELECT c_custkey, s_suppkey,
        ((ax - bx) * (ax - bx) + (ay - by) * (ay - by)) AS dist2
      FROM a, b
      WHERE ((ax - bx) * (ax - bx) + (ay - by) * (ay - by)) <= 1.0
      ORDER BY c_custkey, s_suppkey"""))

  // Planar projection constants for q25 (computed once in Scala, the SAME
  // literals injected into the SQL mirror -> bit-equal, no trig in either
  // engine's query).
  private val lat0 = 53.55
  private val mPerDegLat = 111132.954
  private val mPerDegLon = 111320.0 * math.cos(lat0 * math.Pi / 180.0)

  /** q25 — the rental-rates minimum slice (SURVEY.md §7.2): synth
    * lon/lat -> planar meters -> closed-form 500 m grid cell -> per-cell
    * avg/count/stddev with the n==1 -> 0 rule. ONE exchange end to end.
    */
  private val q25 = Q("q25_geo_grid_agg",
    (s, dir) => {
      val pts = t(s, dir, "customer").select(
        col("c_custkey"), col("c_acctbal"),
        (lit(-113.7) + ((col("c_custkey") * 31) % 400).cast("double") / 1000.0)
          .as("lon"),
        (lit(53.4) + ((col("c_custkey") * 17) % 300).cast("double") / 1000.0)
          .as("lat"))
      val planar = pts
        .withColumn("x", (col("lon") - lit(-113.7)) * mPerDegLon)
        .withColumn("y", (col("lat") - lit(53.4)) * mPerDegLat)
      planar
        .withColumn("cell",
          GeoFunctions.gridCellId(col("x"), col("y"), 0.0, 0.0, 500.0, 64L))
        .groupBy(col("cell"))
        .agg(count(lit(1)).as("n"),
          ExactAgg.avgFx(col("c_acctbal")).as("avg_bal"),
          ExactAgg.stddevFx(col("c_acctbal")).as("std_bal"))
        .orderBy(col("cell"))
    },
    Some(s"""WITH pts AS (SELECT c_custkey, c_acctbal,
        (-113.7 + CAST((c_custkey * 31) % 400 AS DOUBLE) / 1000.0) AS lon,
        (53.4 + CAST((c_custkey * 17) % 300 AS DOUBLE) / 1000.0) AS lat
        FROM customer),
      planar AS (SELECT c_custkey, c_acctbal,
        ((lon - -113.7) * $mPerDegLon) AS x,
        ((lat - 53.4) * $mPerDegLat) AS y FROM pts)
      SELECT (CAST(FLOOR((y - 0.0) / 500.0) AS BIGINT) * 64 +
              CAST(FLOOR((x - 0.0) / 500.0) AS BIGINT)) AS cell,
        COUNT(*) AS n, ${Sql.avgFx("c_acctbal")} AS avg_bal,
        ${Sql.stddevFx("c_acctbal")} AS std_bal
      FROM planar GROUP BY cell ORDER BY cell"""))

  /** q26 — F22 WGS84->UTM (Krüger series) on synthesized Edmonton-area
    * lon/lat. The SQL mirror replays the identical series with the same
    * double literals; trig libm may differ in the last ulp between
    * engines, so both sides round to 4 dp (0.1 mm) — validated stable
    * at sf0.01.
    */
  private val q26 = Q("q26_utm_project",
    (s, dir) => {
      t(s, dir, "customer").select(
        col("c_custkey"),
        (lit(-114.2) + ((col("c_custkey") * 37) % 1200).cast("double") / 1000.0)
          .as("lon"),
        (lit(53.2) + ((col("c_custkey") * 53) % 700).cast("double") / 1000.0)
          .as("lat"))
        .withColumn("u", GeoFunctions.toUtm(col("lon"), col("lat"), 12))
        .select(col("c_custkey"),
          round(col("u.easting"), 4).as("easting"),
          round(col("u.northing"), 4).as("northing"))
        .orderBy(col("c_custkey"))
    },
    Some(GeoQueriesSqlMirror.utmSql))

  val all: Seq[Q] = Seq(q23, q24, q25, q26)
}

/** The Krüger-series UTM formula as DuckDB SQL, generated with the same
  * WGS84 constants as [[graft.functions.GeoFunctions.toUtm]] (keep the
  * two formula shapes identical — see that scaladoc).
  */
object GeoQueriesSqlMirror {
  private val A = 6378137.0
  private val F = 1.0 / 298.257223563
  private val K0 = 0.9996
  private val E2 = F * (2 - F)
  private val EP2 = E2 / (1 - E2)
  private val lon0 = -111.0 // zone 12

  /** The q26 synthesized Edmonton-area coordinates (keep the Scala
    * Column and SQL forms in GeoQueries/LifecycleQueries identical).
    */
  def lonSql(k: String): String =
    s"(-114.2 + CAST(($k * 37) % 1200 AS DOUBLE) / 1000.0)"
  def latSql(k: String): String =
    s"(53.2 + CAST(($k * 53) % 700 AS DOUBLE) / 1000.0)"

  /** The Krüger-series CTE chain `tm → terms → parts → utm`, carrying
    * `carry` columns through from a `pts` CTE that must provide
    * (lon, lat, carry…); `utm` holds UNROUNDED easting/northing.
    * Formula shape (operator order, literals) is identical to
    * [[graft.functions.GeoFunctions.toUtm]] — reused by q26 (rounded
    * comparison) and q246 (grid-cell floor; boundary margins audited,
    * see LifecycleQueries.q246).
    */
  def utmChain(carry: Seq[String]): String = {
    val cs = carry.mkString(", ")
    val m1 = 1 - E2 / 4 - 3 * E2 * E2 / 64 - 5 * E2 * E2 * E2 / 256
    val m2 = 3 * E2 / 8 + 3 * E2 * E2 / 32 + 45 * E2 * E2 * E2 / 1024
    val m3 = 15 * E2 * E2 / 256 + 45 * E2 * E2 * E2 / 1024
    val m4 = 35 * E2 * E2 * E2 / 3072
    s"""tm AS (SELECT $cs,
        (lat * ${math.Pi / 180.0}) AS phi,
        ((lon - $lon0) * ${math.Pi / 180.0}) AS dlam
        FROM pts),
      terms AS (SELECT $cs, phi, dlam,
        SIN(phi) AS sinphi, COS(phi) AS cosphi,
        (SIN(phi) / COS(phi)) AS tanphi,
        ($A / SQRT(1.0 - $E2 * SIN(phi) * SIN(phi))) AS nrad
        FROM tm),
      parts AS (SELECT $cs, phi, dlam, sinphi, cosphi, tanphi, nrad,
        (tanphi * tanphi) AS t,
        ($EP2 * cosphi * cosphi) AS c,
        (cosphi * dlam) AS aa,
        ($A * ($m1 * phi - $m2 * SIN(phi * 2) + $m3 * SIN(phi * 4)
          - $m4 * SIN(phi * 6))) AS m
        FROM terms),
      utm AS (SELECT $cs,
        ($K0 * nrad * (aa + (1.0 - t + c) * POW(aa, 3) / 6
          + (5.0 - 18.0 * t + t * t + 72.0 * c - 58.0 * $EP2)
            * POW(aa, 5) / 120) + 500000.0) AS easting,
        ($K0 * (m + nrad * tanphi * (POW(aa, 2) / 2
          + (5.0 - t + 9.0 * c + 4.0 * c * c) * POW(aa, 4) / 24
          + (61.0 - 58.0 * t + t * t + 600.0 * c - 330.0 * $EP2)
            * POW(aa, 6) / 720))) AS northing
        FROM parts)"""
  }

  val utmSql: String =
    s"""WITH pts AS (SELECT c_custkey,
        ${lonSql("c_custkey")} AS lon,
        ${latSql("c_custkey")} AS lat
        FROM customer),
      ${utmChain(Seq("c_custkey"))}
      SELECT c_custkey,
        ROUND(easting, 4) AS easting,
        ROUND(northing, 4) AS northing
      FROM utm ORDER BY c_custkey"""
}
