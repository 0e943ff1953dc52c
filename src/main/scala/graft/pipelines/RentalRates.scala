package graft.pipelines

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._
import graft.functions.{ExactAgg, GeoFunctions, TextFunctions}
import graft.sources.TableStore

/** The rental-rates DAG (SURVEY.md §3.2, dags/DAG_get_rental_rates.py)
  * as one Spark job. The reference's per-cell containment loop
  * (aggregate_rental_rates.py:122-123, 4096 cells × all rows) collapses
  * to a closed-form cell-id projection + ONE groupBy exchange — the
  * engine's biggest asymptotic win (SURVEY.md §4).
  */
final class RentalRates(spark: SparkSession, store: TableStore) {

  /** get_liv_data.py:173-192 (U3): one building row -> one row per unit.
    * `units` is an array<struct> column in the feed.
    */
  def explodeUnits(buildings: DataFrame): DataFrame =
    buildings.select(
      col("name").as("building"),
      col("address"),
      round(col("lat").cast("double"), 10).as("latitude"),
      round(col("lng").cast("double"), 10).as("longitude"),
      explode(col("units")).as("u"))
      .select(
        md5(concat_ws(":", col("building"), col("address"),
          col("u.unit_no"))).as("uuid"),
        col("building"), col("address"),
        col("u.rate").as("rental_rate"),
        TextFunctions.safeCast(col("u.beds"), "int", lit(0)).as("bedrooms"),
        col("u.baths").as("bathrooms"),
        col("u.size").as("size"),
        col("latitude"), col("longitude"),
        col("u.date").as("date"))

  /** combine_and_format.py:85-131: dedupe-upsert into rent_listings on
    * the reference's 6-column unique key (K2).
    */
  def combineAndFormat(units: DataFrame): Unit =
    store.upsert("rent_listings", units,
      keys = Seq("building", "address", "rental_rate", "bedrooms",
        "bathrooms", "size"),
      tieBreak = Seq("uuid"))

  /** aggregate_rental_rates.py:93-170: numeric coercion (F11), dropna
    * (P4), UTM projection (F22), closed-form grid cell (F24/J4), per
    * (cell, bedrooms) avg/count/stddev with n==1 -> 0 (A1), append (K3).
    *
    * @param origin   (minEasting, minNorthing) of the grid, meters
    * @param gridSize extent in meters (reference: 32000)
    * @param cellSize cell edge in meters (reference: 500)
    */
  def aggregate(origin: (Double, Double), gridSize: Double = 32000.0,
                cellSize: Double = 500.0): DataFrame = {
    val nCellsX = (gridSize / cellSize).toLong
    val rents = store.read("rent_listings")
      .withColumn("rate_num",
        regexp_replace(col("rental_rate"), "[$,]", "").try_cast("double"))
      .na.drop(Seq("rate_num", "latitude", "longitude"))
      .withColumn("utm",
        GeoFunctions.toUtm(col("longitude"), col("latitude"), 12))
      // PER-AXIS range filter, not a packed-id range: a point west of
      // the grid with a positive row index (cx = -28, cy = 10) packs
      // to a legal-LOOKING id (10·64 − 28 = 612) and would silently
      // alias into cell (612 % 64, 612 div 64) — the reference's
      // containment join (aggregate_rental_rates.py:122-123) admits
      // only true containment, so must we (r13 fix, found while
      // mirroring this leg for the q246 lifecycle gate)
      .withColumn("__cx", GeoFunctions.gridCellX(
        col("utm.easting"), origin._1, cellSize))
      .withColumn("__cy", GeoFunctions.gridCellX(
        col("utm.northing"), origin._2, cellSize))
      .filter(col("__cx") >= 0 && col("__cx") < nCellsX &&
        col("__cy") >= 0 && col("__cy") < nCellsX)
      .withColumn("grid_id", col("__cy") * nCellsX + col("__cx"))
    val out = rents.groupBy(col("grid_id"), col("bedrooms"))
      .agg(
        ExactAgg.avgFx(col("rate_num")).as("avg_rate"),
        count(lit(1)).as("listing_count"),
        ExactAgg.stddevFx(col("rate_num")).as("std_dev"))
    store.append("avg_rent_listings", out)
    out
  }
}
