package graft.pipelines

import org.apache.spark.sql.types._

/** Declared schemas for every table the reference persists (SURVEY.md
  * §1.2). Inferred once from the reference's SQLAlchemy models, frozen
  * here — sources never re-infer (P2 projection-or-die semantics).
  */
object Schemas {

  /** combine_broker_listings.py:24-57 (PropertyListing model). */
  val propertyListing: StructType = StructType(Seq(
    StructField("uuid", StringType, nullable = false),
    StructField("title", StringType),
    StructField("address", StringType),
    StructField("city", StringType),
    StructField("province", StringType),
    StructField("price", StringType), // prices arrive as strings (§1.2)
    StructField("size", StringType),
    StructField("property_type", StringType),
    StructField("sale_or_lease", StringType),
    StructField("description", StringType),
    StructField("latitude", DoubleType),
    StructField("longitude", DoubleType),
    StructField("date_listed", StringType),
    StructField("brokerage", StringType),
    StructField("url", StringType),
    StructField("brokers", StringType), // JSON string at the sink (F10)
    StructField("brochure_urls", ArrayType(StringType))))

  /** Raw broker feeds BEFORE normalization — heterogeneous per source
    * (get_AV_listings.py:92-107, get_omada_listings.py:84-128,
    * get_royal_park_listings.py:78-103).
    */
  val avRaw: StructType = StructType(Seq(
    StructField("name", StringType),
    StructField("address", StringType),
    StructField("city", StringType),
    StructField("province", StringType),
    StructField("price", StringType),
    StructField("size", StringType),
    StructField("propertyType", StringType),
    StructField("status", StringType),
    StructField("description", StringType),
    StructField("location", StructType(Seq(
      StructField("lat", StringType), StructField("lng", StringType)))),
    StructField("slug", StringType),
    StructField("brochures", ArrayType(StringType))))

  val omadaRaw: StructType = StructType(Seq(
    StructField("title", StructType(Seq(StructField("rendered", StringType)))),
    StructField("address", StringType),
    StructField("city", StringType),
    StructField("price", StringType),
    StructField("size_min", StringType),
    StructField("size_max", StringType),
    StructField("listing_type", StringType),
    StructField("content", StructType(Seq(StructField("rendered", StringType)))),
    StructField("lat", StringType),
    StructField("lng", StringType),
    StructField("link", StringType)))

  val royalParkRaw: StructType = StructType(Seq(
    StructField("post_title", StringType),
    StructField("address", StringType),
    StructField("city", StringType),
    StructField("price", StringType),
    StructField("building_size", StringType),
    StructField("type", StringType),
    StructField("post_status", StringType),
    StructField("post_content", StringType),
    StructField("latitude", StringType),
    StructField("longitude", StringType),
    StructField("permalink", StringType)))

  /** combine_and_format.py:26-49 (RentalRate model). */
  val rentalRate: StructType = StructType(Seq(
    StructField("uuid", StringType, nullable = false),
    StructField("building", StringType),
    StructField("address", StringType),
    StructField("rental_rate", StringType),
    StructField("bedrooms", IntegerType),
    StructField("bathrooms", StringType),
    StructField("size", StringType),
    StructField("latitude", DoubleType),
    StructField("longitude", DoubleType),
    StructField("date", StringType)))

  /** aggregate_rental_rates.py:24-35 (AvgRentalRate model). */
  val avgRentalRate: StructType = StructType(Seq(
    StructField("grid_id", LongType),
    StructField("bedrooms", IntegerType),
    StructField("avg_rate", DoubleType),
    StructField("listing_count", LongType),
    StructField("std_dev", DoubleType)))

  /** get_edm_council_transcripts.py:59-76 (CouncilTranscript model);
    * timestamped transcript = map seconds -> text (§1.2).
    */
  val councilTranscript: StructType = StructType(Seq(
    StructField("video_url", StringType, nullable = false),
    StructField("title", StringType),
    StructField("date", StringType),
    StructField("transcript", MapType(LongType, StringType)),
    StructField("summarized", IntegerType),
    StructField("vectorized", IntegerType)))
}
