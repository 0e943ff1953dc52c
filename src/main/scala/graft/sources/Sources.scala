package graft.sources

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.types.StructType
import org.apache.spark.sql.functions._

/** File-backed sources standing in for the reference's fetch layer
  * (SURVEY.md §2.1 S1-S12). The engine's contract: every external feed
  * lands as files; reading them is a declarative scan so Catalyst can
  * prune columns and push filters.
  */
object Sources {

  /** S10 — the inter-task "table scan": all JSON blobs under a prefix,
    * with a declared schema (never inferred twice; schema drift fails
    * fast, matching the reference's P2 projection-or-die).
    * multiLine=false: one JSON object per line (JSONL) — the splittable,
    * scale-correct layout.
    */
  def jsonTable(spark: SparkSession, schema: StructType,
                pathGlob: String): DataFrame =
    spark.read.schema(schema).json(pathGlob)

  /** JSON documents where each FILE is one array of records (the
    * reference's GCS blob layout, combine_broker_listings.py:67-75).
    */
  def jsonArrayTable(spark: SparkSession, schema: StructType,
                     pathGlob: String): DataFrame =
    spark.read.schema(schema).option("multiLine", true).json(pathGlob)

  /** S12 — binary blob source (PDFs, images): path, length, content. */
  def binaryTable(spark: SparkSession, pathGlob: String,
                  suffix: Option[String] = None): DataFrame = {
    val df = spark.read.format("binaryFile").load(pathGlob)
    suffix.fold(df)(s => df.filter(col("path").endsWith(s)))
  }

  /** S11 — GeoJSON FeatureCollection: one row per feature with geometry
    * type/coordinates (raw json string) + properties map.
    */
  def geoJsonFeatures(spark: SparkSession, path: String): DataFrame = {
    val raw = spark.read.option("multiLine", true)
      .json(path)
    raw.select(explode(col("features")).as("f"))
      .select(
        col("f.geometry.type").as("geom_type"),
        to_json(col("f.geometry.coordinates")).as("coordinates_json"),
        col("f.properties.*"))
  }
}
