package graft.operators

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._
import graft.functions.GeoFunctions

/** Spatial joins re-expressed Spark-first (SURVEY.md §2.3 J2/J3):
  *
  *  - [[radiusJoin]] — the reference's rtree-prefilter + exact-distance
  *    loop (get_osm_data.py:63-128) becomes: bucket both sides into
  *    radius-sized grid cells, explode the left side to its 3×3 cell
  *    neighborhood, equi-join on the cell key (ONE hash shuffle — this
  *    is what scales; a cross join would be O(n·m)), then the exact
  *    distance predicate.
  *  - [[pointInPolygonJoin]] — gpd.sjoin(predicate="within")
  *    (get_zoning_data.py:60) becomes: broadcast the polygon table
  *    (zoning layers are ~10³ rows), bbox prefilter (cheap, codegen'd),
  *    then exact ray-cast. The stream side stays narrow — no shuffle at
  *    all.
  */
object SpatialJoin {

  /** Pairs (a, b) with planar distance² <= radius². Output keeps all
    * columns of both inputs plus `dist2`.
    */
  def radiusJoin(a: DataFrame, b: DataFrame,
                 ax: Column, ay: Column, bx: Column, by: Column,
                 radius: Double): DataFrame = {
    val r = radius
    val neighborhood = array(
      (for (dx <- -1 to 1; dy <- -1 to 1) yield
        struct((floor(ax / r).cast("long") + dx).as("cx"),
          (floor(ay / r).cast("long") + dy).as("cy"))): _*)
    val aCells = a.withColumn("__cell", explode(neighborhood))
    val bCells = b.withColumn("__cell",
      struct(floor(bx / r).cast("long").as("cx"),
        floor(by / r).cast("long").as("cy")))
    aCells.join(bCells, "__cell")
      .withColumn("dist2", GeoFunctions.distSq(ax, ay, bx, by))
      .filter(col("dist2") <= lit(r * r))
      .drop("__cell")
  }

  /** Points joined to the polygons containing them (inner). `polys` must
    * be small enough to broadcast; `ringCol` is array<struct<x,y>>.
    * Adds nothing beyond the two schemas.
    */
  def pointInPolygonJoin(points: DataFrame, polys: DataFrame,
                         px: Column, py: Column, ringCol: String)
      : DataFrame = {
    val ring = col(ringCol)
    // bbox precomputed on the polygon frame BEFORE broadcast by the
    // one-pass native kernel (codegen'd; an empty ring yields a null
    // bbox whose comparisons drop the row, like the HOF form it
    // replaced) — no interpreted lambda anywhere in the join plan
    val withBbox = polys.withColumn("__bbox",
      call_function("graft_poly_bbox", ring))
    points.crossJoin(broadcast(withBbox))
      .filter(px >= col("__bbox.minx") && px <= col("__bbox.maxx") &&
        py >= col("__bbox.miny") && py <= col("__bbox.maxy"))
      .filter(GeoFunctions.pointInPolygon(px, py, ring))
      .drop("__bbox")
  }
}
