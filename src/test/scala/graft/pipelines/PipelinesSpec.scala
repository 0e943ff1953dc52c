package graft.pipelines

import graft.SparkSpec
import graft.sources.TableStore
import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

trait StoreFixture { self: SparkSpec =>
  def withStore(f: TableStore => Unit): Unit = {
    val dir = java.nio.file.Files.createTempDirectory("graft_pipe").toString
    f(new TableStore(spark, dir))
  }
  def jsonDf(schema: org.apache.spark.sql.types.StructType,
             rows: String*): DataFrame = {
    import spark.implicits._
    spark.read.schema(schema).json(rows.toDS)
  }
}

class PropertyListingsSpec extends SparkSpec with StoreFixture {
  import spark.implicits._

  private def avRaw = jsonDf(Schemas.avRaw,
    """{"name":"Tower A","address":"1 Main St","city":"Edmonton","province":"AB",
       "price":"$1,200,000","size":"5000 SF","propertyType":"Office For Sale",
       "status":"active","description":"desc",
       "location":{"lat":"53.5461234567","lng":"-113.4938765432"},
       "slug":"tower-a","brochures":["b1.pdf"]}""",
    """{"name":"Closed One","address":"2 Main St","city":"Edmonton","province":"AB",
       "price":"1","size":"1","propertyType":"Office","status":"closed",
       "location":{"lat":"53.5","lng":"-113.5"},"slug":"closed","brochures":[]}""",
    """{"name":"Calgary One","address":"3 Main St","city":"Calgary","province":"AB",
       "price":"1","size":"1","propertyType":"Office","status":"active",
       "location":{"lat":"51.0","lng":"-114.0"},"slug":"cgy","brochures":[]}""")

  private def omadaRaw = jsonDf(Schemas.omadaRaw,
    """{"title":{"rendered":"<b>Retail Bay</b>"},"address":"4 Ave","city":"Edmonton",
       "price":"$25 PSF","size_min":"1200","size_max":"2400",
       "listing_type":"retail for lease",
       "content":{"rendered":"<p>Great spot</p>"},
       "lat":"53.54","lng":"-113.49","link":"https://omada.example/retail-bay"}""")

  private def royalParkRaw = jsonDf(Schemas.royalParkRaw,
    """{"post_title":"Warehouse C","address":"9 Yard Rd","city":"Edmonton",
       "price":"contact for sale or lease price","building_size":"20000 SF",
       "type":"industrial sale or lease","post_status":"publish",
       "post_content":"big","latitude":"53.50","longitude":"-113.40",
       "permalink":"https://rp.example/warehouse-c"}""")

  private def emptyEnrich = Seq.empty[(String, String)]
    .toDF("uuid", "unused").select($"uuid",
      lit(null).cast("string").as("enrich_note"))

  test("end-to-end: normalize, classify, upsert, idempotent, archive") {
    withStore { store =>
      val p = new PropertyListings(spark, store)
      def runAll(): Unit = p.run(avRaw, omadaRaw, royalParkRaw,
        emptyEnrich.withColumnRenamed("enrich_note", "brochure_name"),
        emptyEnrich.withColumnRenamed("enrich_note", "nearby_businesses"),
        emptyEnrich.withColumnRenamed("enrich_note", "zoning"))
      runAll()
      val t = store.read("property_listings")
      assert(t.count() == 3) // closed + non-Edmonton filtered out
      val byBrokerage = t.select($"brokerage", $"sale_or_lease")
        .as[(String, String)].collect().toMap
      assert(byBrokerage("av") == "Sale")
      assert(byBrokerage("omada") == "Lease")
      assert(byBrokerage("royal_park") == "Sale or Lease")
      // html stripped, size range concatenated
      val om = t.filter($"brokerage" === "omada").head()
      assert(om.getAs[String]("title") == "Retail Bay")
      assert(om.getAs[String]("size") == "1200 - 2400 SF")
      assert(om.getAs[String]("property_type") == "Retail For Lease")
      // idempotent
      runAll()
      assert(store.read("property_listings").count() == 3)
      assert(!store.exists("archived_listings"))
      // delist: drop royal park from the feed -> archived + removed
      val p2 = new PropertyListings(spark, store)
      p2.run(avRaw, omadaRaw,
        royalParkRaw.limit(0), // feed no longer contains it
        emptyEnrich.withColumnRenamed("enrich_note", "brochure_name"),
        emptyEnrich.withColumnRenamed("enrich_note", "nearby_businesses"),
        emptyEnrich.withColumnRenamed("enrich_note", "zoning"))
      assert(store.read("property_listings").count() == 2)
      assert(store.read("archived_listings").count() == 1)
      assert(store.read("archived_listings").head()
        .getAs[String]("brokerage") == "royal_park")
    }
  }
}

class RentalRatesSpec extends SparkSpec with StoreFixture {
  import spark.implicits._

  private val buildingsSchema = org.apache.spark.sql.types.StructType.fromDDL(
    "name string, address string, lat string, lng string, " +
      "units array<struct<unit_no:string,rate:string,beds:string," +
      "baths:string,size:string,date:string>>")

  test("explode units, upsert, closed-form grid aggregate") {
    withStore { store =>
      val r = new RentalRates(spark, store)
      val feed = jsonDf(buildingsSchema,
        """{"name":"Bldg1","address":"10 St","lat":"53.5461","lng":"-113.4938",
           "units":[{"unit_no":"101","rate":"$1,500","beds":"1","baths":"1","size":"600","date":"2026-01-01"},
                    {"unit_no":"102","rate":"$2,500","beds":"2","baths":"2","size":"900","date":"2026-01-01"},
                    {"unit_no":"103","rate":"not listed","beds":"1","baths":"1","size":"600","date":"2026-01-01"}]}""",
        """{"name":"Bldg2","address":"11 St","lat":"53.5465","lng":"-113.4942",
           "units":[{"unit_no":"201","rate":"$1,700","beds":"1","baths":"1","size":"650","date":"2026-01-01"}]}""")
      val units = r.explodeUnits(feed)
      assert(units.count() == 4)
      r.combineAndFormat(units)
      r.combineAndFormat(units) // idempotent upsert
      assert(store.read("rent_listings").count() == 4)
      // Edmonton UTM zone 12: easting ~334400, northing ~5934700
      val out = r.aggregate(origin = (320000.0, 5920000.0))
      // non-numeric "not listed" dropped; both buildings in same 500m cell
      val rows = out.select($"bedrooms", $"avg_rate", $"listing_count",
        $"std_dev").as[(Int, Double, Long, Double)].collect().toSet
      assert(rows.exists { case (beds, avg, n, std) =>
        beds == 1 && n == 2 && avg == 1600.0 && std > 0 })
      assert(rows.exists { case (beds, avg, n, std) =>
        beds == 2 && n == 1 && avg == 2500.0 && std == 0.0 })
    }
  }
}

class TranscriptsSpec extends SparkSpec with StoreFixture {
  import spark.implicits._

  test("ingest, chunk+embed, flag flip, retrieve+summarize") {
    withStore { store =>
      val tr = new Transcripts(spark, store, embedDim = 16)
      val scraped = Seq(
        ("https://yt/v1", "Meeting about zoning bylaws",
          "2026-01-05", (1L to 12L).map(i => i * 10 -> s"snippet$i zoning topic").toMap),
        ("https://yt/v2", "Meeting about transit budget",
          "2026-01-06", (1L to 7L).map(i => i * 10 -> s"transit line$i budget").toMap)
      ).toDF("video_url", "title", "date", "transcript")
      tr.ingest(scraped)
      assert(tr.newUrls(Seq("https://yt/v1", "https://yt/v3")
        .toDF("video_url")).as[String].collect().toSeq == Seq("https://yt/v3"))

      val vectors = tr.vectorize(n = 5, overlap = 2)
      // v1: 12 snippets -> chunks at k=0..3; v2: 7 -> k=0..2
      assert(vectors.count() == 7)
      assert(store.read("council_transcripts")
        .filter($"vectorized" === 1).count() == 2)
      // re-vectorize: nothing to do
      assert(tr.vectorize(n = 5, overlap = 2).count() == 0)
      assert(store.read("transcript_vectors").count() == 7)

      val summaries = tr.summarize(k = 3)
      assert(summaries.count() == 2)
      val s = summaries.filter($"video_url" === "https://yt/v1").head()
      assert(s.getAs[String]("summary").nonEmpty)
      assert(store.read("council_transcripts")
        .filter($"summarized" === 1).count() == 2)
      // incremental: second run summarizes nothing
      assert(tr.summarize(k = 3).count() == 0)
    }
  }
}
