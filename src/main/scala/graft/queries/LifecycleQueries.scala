package graft.queries

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._
import graft.Tables.t

/** End-to-end pipeline-lifecycle capstones: each gate composes a FULL
  * reference DAG — normalize → union → enrich → upsert → archive —
  * over deterministic fixtures derived from the driver's parquet
  * tables, reads the final TableStore state back, and hash-compares
  * one scorecard against a DuckDB oracle that replays the whole
  * composition in SQL (the q149 release-pipeline pattern applied to
  * the reference's §3.1 property-listings DAG). The operators are all
  * individually gated elsewhere; what THIS gate catches is drift
  * across the composition — a normalize column rename, a changed
  * upsert key order, an archive that stops deleting — any of which
  * flips the single hash.
  */
object LifecycleQueries {

  /** Deterministic §3.1 broker-feed fixtures, generation-parameterized
    * (reference: get_AV_listings.py / get_omada_listings.py /
    * get_royal_park_listings.py field shapes; values derived from the
    * TPC-H tables so the DuckDB oracle can rebuild them exactly).
    * Generation 2 delists every ninth entity and — for the AV feed —
    * reopens the listings generation 1 marked closed, so one run pair
    * exercises insert, ON-CONFLICT-DO-NOTHING skip, and archive.
    */
  private def avFeed(customer: DataFrame, g: Int): DataFrame = {
    val base = customer.select(
      col("c_custkey").as("k"),
      col("c_name").as("slug"),
      col("c_name").as("name"),
      concat(lit("addr-"), col("c_custkey")).as("address"),
      when(col("c_custkey") % 3 === 0, "Edmonton").otherwise("Calgary")
        .as("city"),
      lit("AB").as("province"),
      when(col("c_custkey") % 5 === 0 && lit(g) === 1, "closed")
        .otherwise("active").as("status"),
      when(col("c_custkey") % 7 === 0, lit(null).cast("string"))
        .otherwise(col("c_mktsegment")).as("price"),
      col("c_mktsegment").as("size"),
      when(col("c_custkey") % 4 === 0, "Retail for Sale")
        .when(col("c_custkey") % 4 === 1, "Office for Lease")
        .when(col("c_custkey") % 4 === 2, "Industrial for Sale or Rent")
        .otherwise("Bare Land").as("propertyType"),
      lit(s"gen$g").as("description"),
      struct((col("c_custkey") % 90).cast("string").as("lat"),
        (col("c_custkey") % 120).cast("string").as("lng"))
        .as("location"),
      array(concat(lit("b-"), col("c_name"))).as("brochures"))
    if (g == 2) base.filter(col("k") % 9 =!= 0) else base
  }

  private def omadaFeed(supplier: DataFrame, g: Int): DataFrame = {
    val base = supplier.select(
      col("s_suppkey").as("k"),
      col("s_name").as("link"),
      struct(concat(lit("<b>"), col("s_name"), lit("</b>"))
        .as("rendered")).as("title"),
      concat(lit("saddr-"), col("s_suppkey")).as("address"),
      lit("Edmonton").as("city"),
      when(col("s_suppkey") % 2 === 0, lit(null).cast("string"))
        .otherwise(concat(lit("CAD "), col("s_suppkey"))).as("price"),
      when(col("s_suppkey") % 3 === 0, lit(null).cast("string"))
        .otherwise(col("s_suppkey").cast("string")).as("size_min"),
      when(col("s_suppkey") % 3 === 2,
        (col("s_suppkey") * 2).cast("string"))
        .otherwise(lit(null).cast("string")).as("size_max"),
      when(col("s_suppkey") % 3 === 0, "office for lease")
        .when(col("s_suppkey") % 3 === 1, "retail for sale")
        .otherwise("warehouse for rent").as("listing_type"),
      struct(concat(lit(s"<p>gen$g</p>")).as("rendered")).as("content"),
      (col("s_suppkey") % 85).cast("string").as("lat"),
      (col("s_suppkey") % 115).cast("string").as("lng"))
    if (g == 2) base.filter(col("k") % 9 =!= 0) else base
  }

  private def royalParkFeed(part: DataFrame, g: Int): DataFrame = {
    val base = part.select(
      col("p_partkey").as("k"),
      concat(lit("rp-"), col("p_partkey")).as("permalink"),
      col("p_name").as("post_title"),
      concat(lit("paddr-"), col("p_partkey")).as("address"),
      lit("Edmonton").as("city"),
      when(col("p_partkey") % 6 === 0, lit(null).cast("string"))
        .otherwise(col("p_brand")).as("price"),
      col("p_size").cast("string").as("building_size"),
      when(col("p_partkey") % 2 === 0, col("p_type"))
        .otherwise(concat(col("p_type"), lit(" lease"))).as("type"),
      lit(s"gen$g").as("post_content"),
      (col("p_partkey") % 95).cast("string").as("latitude"),
      (col("p_partkey") % 125).cast("string").as("longitude"))
    if (g == 2) base.filter(col("k") % 9 =!= 0) else base
  }

  /** q245 — the §3.1 PROPERTY-LISTINGS LIFECYCLE capstone: two full
    * [[graft.pipelines.PropertyListings.run]] passes (generation 1
    * then generation 2) against one TableStore — three broker
    * normalizers, union, sale-or-lease classifier, three broadcast
    * enrichment joins, lenient casts, ON-CONFLICT-DO-NOTHING upsert
    * on (latitude, longitude, address)
    * (combine_broker_listings.py:63-228), then the delisting archive
    * (archive_delisted_properties.py:93-147) — and one scorecard over
    * the final live + archived tables. The `tag` column IS the
    * DO-NOTHING proof: a key present in both generations must keep
    * its gen1 row (reference upsert semantics), so only
    * reopened-in-gen2 keys may carry gen2. The oracle replays the
    * whole composition from the same TPC-H-derived fixtures.
    */
  private val q245 = Q("q245_listings_lifecycle",
    (s, dir) => {
      val customer = t(s, dir, "customer")
      val supplier = t(s, dir, "supplier")
      val part = t(s, dir, "part")
      val brochure = customer.filter(col("c_custkey") % 2 === 0)
        .select(md5(concat(lit("av:"), col("c_name"))).as("uuid"),
          concat(lit("eb-"), col("c_custkey")).as("extra_brochure"))
      val osm = supplier.filter(col("s_suppkey") % 2 === 0)
        .select(md5(concat(lit("omada:"), col("s_name"))).as("uuid"),
          concat(lit("tag-"), col("s_suppkey")).as("osm_tag"))
      val zoning = part.filter(col("p_partkey") % 2 === 0)
        .select(md5(concat(lit("royal_park:rp-"), col("p_partkey")))
          .as("uuid"), col("p_brand").as("zone"))
      val root = java.nio.file.Files
        .createTempDirectory("graft_q245_life").toString
      val store = new graft.sources.TableStore(s, root)
      val pipe = new graft.pipelines.PropertyListings(s, store)
      for (g <- Seq(1, 2))
        pipe.run(avFeed(customer, g).drop("k"),
          omadaFeed(supplier, g).drop("k"),
          royalParkFeed(part, g).drop("k"),
          brochure, osm, zoning)
      val live = store.read("property_listings")
        .withColumn("tbl", lit("live"))
      val archived = store.read("archived_listings")
        .withColumn("tbl", lit("archived"))
      live.unionByName(archived)
        .groupBy(col("tbl"), col("brokerage"),
          col("description").as("tag"))
        .agg(count(lit(1)).as("n"),
          sum(when(col("sale_or_lease") === "Sale", 1L).otherwise(0L))
            .as("n_sale"),
          sum(when(col("sale_or_lease") === "Lease", 1L).otherwise(0L))
            .as("n_lease"),
          sum(when(col("sale_or_lease") === "Sale or Lease", 1L)
            .otherwise(0L)).as("n_sol"),
          sum(when(col("sale_or_lease") === "Unknown", 1L)
            .otherwise(0L)).as("n_unk"),
          sum(when(col("price") === "Unknown", 1L).otherwise(0L))
            .as("n_price_unknown"),
          sum(when(coalesce(col("extra_brochure"), col("osm_tag"),
            col("zone")).isNotNull, 1L).otherwise(0L))
            .as("n_enriched"),
          sum(col("latitude").cast("long")).as("sum_lat"),
          min(col("url")).as("min_url"),
          max(col("url")).as("max_url"))
        .orderBy(col("tbl"), col("brokerage"), col("tag"))
    },
    Some("""WITH
      av_raw AS (
        SELECT c_custkey AS k, c_name AS slug,
          'addr-' || c_custkey AS address,
          CASE WHEN c_custkey % 3 = 0 THEN 'Edmonton'
            ELSE 'Calgary' END AS city,
          CASE WHEN c_custkey % 7 = 0 THEN NULL
            ELSE c_mktsegment END AS price,
          CASE c_custkey % 4 WHEN 0 THEN 'Retail for Sale'
            WHEN 1 THEN 'Office for Lease'
            WHEN 2 THEN 'Industrial for Sale or Rent'
            ELSE 'Bare Land' END AS property_type,
          CAST(c_custkey % 90 AS DOUBLE) AS latitude,
          CAST(c_custkey % 120 AS DOUBLE) AS longitude
        FROM customer),
      av AS (
        SELECT g, md5('av:' || slug) AS uuid, address,
          price, property_type, 'gen' || g AS tag,
          latitude, longitude, 'av' AS brokerage,
          'https://avisonyoung.example/listing/' || slug AS url
        FROM av_raw, (SELECT UNNEST([1, 2]) AS g)
        WHERE city = 'Edmonton'
          AND NOT (k % 5 = 0 AND g = 1)
          AND NOT (k % 9 = 0 AND g = 2)),
      om_raw AS (
        SELECT s_suppkey AS k, s_name AS link,
          'saddr-' || s_suppkey AS address,
          CASE WHEN s_suppkey % 2 = 0 THEN NULL
            ELSE 'CAD ' || s_suppkey END AS price,
          CASE s_suppkey % 3 WHEN 0 THEN 'office for lease'
            WHEN 1 THEN 'retail for sale'
            ELSE 'warehouse for rent' END AS listing_type,
          CAST(s_suppkey % 85 AS DOUBLE) AS latitude,
          CAST(s_suppkey % 115 AS DOUBLE) AS longitude
        FROM supplier),
      om AS (
        SELECT g, md5('omada:' || link) AS uuid, address,
          price,
          ARRAY_TO_STRING(LIST_TRANSFORM(
            STRING_SPLIT(listing_type, ' '),
            x -> CONCAT(UPPER(x[1]), LOWER(SUBSTR(x, 2)))), ' ')
            AS property_type,
          'gen' || g AS tag, latitude, longitude,
          'omada' AS brokerage, link AS url
        FROM om_raw, (SELECT UNNEST([1, 2]) AS g)
        WHERE NOT (k % 9 = 0 AND g = 2)),
      rp_raw AS (
        SELECT p_partkey AS k, 'rp-' || p_partkey AS permalink,
          'paddr-' || p_partkey AS address,
          CASE WHEN p_partkey % 6 = 0 THEN NULL
            ELSE p_brand END AS price,
          CASE WHEN p_partkey % 2 = 0 THEN p_type
            ELSE p_type || ' lease' END AS property_type,
          CAST(p_partkey % 95 AS DOUBLE) AS latitude,
          CAST(p_partkey % 125 AS DOUBLE) AS longitude
        FROM part),
      rp AS (
        SELECT g, md5('royal_park:' || permalink) AS uuid, address,
          price, property_type, 'gen' || g AS tag,
          latitude, longitude, 'royal_park' AS brokerage,
          permalink AS url
        FROM rp_raw, (SELECT UNNEST([1, 2]) AS g)
        WHERE NOT (k % 9 = 0 AND g = 2)),
      unioned AS (
        SELECT * FROM av UNION ALL SELECT * FROM om
        UNION ALL SELECT * FROM rp),
      enr_b AS (SELECT md5('av:' || c_name) AS uuid,
          'eb-' || c_custkey AS extra_brochure
        FROM customer WHERE c_custkey % 2 = 0),
      enr_o AS (SELECT md5('omada:' || s_name) AS uuid,
          'tag-' || s_suppkey AS osm_tag
        FROM supplier WHERE s_suppkey % 2 = 0),
      enr_z AS (SELECT md5('royal_park:rp-' || p_partkey) AS uuid,
          p_brand AS zone
        FROM part WHERE p_partkey % 2 = 0),
      combined AS (
        SELECT u.g, u.brokerage, u.tag, u.address,
          u.latitude, u.longitude,
          CASE
            WHEN LOWER(COALESCE(u.property_type, '')) LIKE '%sale%'
              AND (LOWER(COALESCE(u.property_type, '')) LIKE '%lease%'
                OR LOWER(COALESCE(u.property_type, '')) LIKE '%rent%')
              THEN 'Sale or Lease'
            WHEN LOWER(COALESCE(u.property_type, '')) LIKE '%sale%'
              THEN 'Sale'
            WHEN LOWER(COALESCE(u.property_type, '')) LIKE '%lease%'
              OR LOWER(COALESCE(u.property_type, '')) LIKE '%rent%'
              THEN 'Lease'
            ELSE 'Unknown' END AS sale_or_lease,
          COALESCE(u.price, 'Unknown') AS price,
          b.extra_brochure, o.osm_tag, z.zone, u.url
        FROM unioned u
        LEFT JOIN enr_b b ON u.uuid = b.uuid
        LEFT JOIN enr_o o ON u.uuid = o.uuid
        LEFT JOIN enr_z z ON u.uuid = z.uuid),
      c1 AS (SELECT * FROM combined WHERE g = 1),
      c2 AS (SELECT * FROM combined WHERE g = 2),
      live AS (
        SELECT c1.* FROM c1 JOIN (SELECT DISTINCT latitude,
            longitude, address FROM c2) k
          USING (latitude, longitude, address)
        UNION ALL
        SELECT c2.* FROM c2
          ANTI JOIN c1 USING (latitude, longitude, address)),
      archived AS (
        SELECT c1.* FROM c1
          ANTI JOIN c2 USING (latitude, longitude, address)),
      rep AS (
        SELECT 'live' AS tbl, * FROM live
        UNION ALL SELECT 'archived', * FROM archived)
      SELECT tbl, brokerage, tag, COUNT(*) AS n,
        CAST(SUM(CASE WHEN sale_or_lease = 'Sale' THEN 1 ELSE 0 END)
          AS BIGINT) AS n_sale,
        CAST(SUM(CASE WHEN sale_or_lease = 'Lease' THEN 1 ELSE 0 END)
          AS BIGINT) AS n_lease,
        CAST(SUM(CASE WHEN sale_or_lease = 'Sale or Lease' THEN 1
          ELSE 0 END) AS BIGINT) AS n_sol,
        CAST(SUM(CASE WHEN sale_or_lease = 'Unknown' THEN 1 ELSE 0
          END) AS BIGINT) AS n_unk,
        CAST(SUM(CASE WHEN price = 'Unknown' THEN 1 ELSE 0 END)
          AS BIGINT) AS n_price_unknown,
        CAST(SUM(CASE WHEN COALESCE(extra_brochure, osm_tag, zone)
          IS NOT NULL THEN 1 ELSE 0 END) AS BIGINT) AS n_enriched,
        CAST(SUM(CAST(latitude AS BIGINT)) AS BIGINT) AS sum_lat,
        MIN(url) AS min_url, MAX(url) AS max_url
      FROM rep GROUP BY tbl, brokerage, tag
      ORDER BY tbl, brokerage, tag"""))

  val all: Seq[Q] = Seq(q245)
}
