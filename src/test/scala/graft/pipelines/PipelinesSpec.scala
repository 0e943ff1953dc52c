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
  /** True once every persistent RDD not in `before` is gone —
    * unpersist(blocking=false) releases asynchronously, so poll.
    */
  def drainsTo(before: scala.collection.Set[Int],
               timeoutMs: Long = 10000): Boolean = {
    val deadline = System.currentTimeMillis + timeoutMs
    while (System.currentTimeMillis < deadline) {
      if (spark.sparkContext.getPersistentRDDs.keySet.subsetOf(before))
        return true
      Thread.sleep(50)
    }
    spark.sparkContext.getPersistentRDDs.keySet.subsetOf(before)
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
      assert(byBrokerage("av") == "sale")
      assert(byBrokerage("omada") == "lease")
      assert(byBrokerage("royal_park") == "sale_or_lease")
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

  test("saleOrLease matches the reference classifier branch-for-branch") {
    withStore { store =>
      val p = new PropertyListings(spark, store)
      val in = Seq("Industrial for Sale or Lease", "Retail for Sale",
        "Office Sublease", "Sublease or Sale", "office for lease",
        "Warehouse for rent", "Bare Land", null)
      val out = in.toDF("t").select(p.saleOrLease($"t").as("c"))
        .as[String].collect().toSeq
      // "Sublease or Sale" lands in the sale+lease branch ("sublease"
      // CONTAINS "lease"), exactly as the reference's `in` checks do;
      // "rent" has no synonym branch and passes through unchanged;
      // null is the reference's bare-except -> '' path.
      assert(out == Seq("sale_or_lease", "sale", "sublease",
        "sale_or_lease", "lease", "Warehouse for rent", "Bare Land", ""))
    }
  }

  test("delist snapshot is scoped: the run leaves no cached/checkpoint RDDs") {
    withStore { store =>
      val before = spark.sparkContext.getPersistentRDDs.keySet
      val p = new PropertyListings(spark, store)
      def runAll(rp: DataFrame): Unit = p.run(avRaw, omadaRaw, rp,
        emptyEnrich.withColumnRenamed("enrich_note", "brochure_name"),
        emptyEnrich.withColumnRenamed("enrich_note", "nearby_businesses"),
        emptyEnrich.withColumnRenamed("enrich_note", "zoning"))
      runAll(royalParkRaw)
      runAll(royalParkRaw.limit(0)) // delists royal_park: archive + rewrite
      assert(store.read("property_listings").count() == 2)
      assert(store.read("archived_listings").count() == 1)
      // the delist snapshot (evaluated 3x across the archive append and
      // the table rewrite) is RDD-backed with a persist scoped to the
      // run — a localCheckpoint pivot would strand executor-storage
      // blocks here that nothing can release
      assert(drainsTo(before),
        s"run left cached RDDs: ${
          spark.sparkContext.getPersistentRDDs.keySet -- before}")
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

  test("[NONE] sentinel flips the flag without appending a summary row") {
    withStore { store =>
      val tr = new Transcripts(spark, store, embedDim = 16)
      // v1 has real content; v2's snippets have no token > 3 chars, so
      // the summarizer stub answers the [NONE] sentinel for it
      val scraped = Seq(
        ("https://yt/v1", "Meeting about zoning bylaws",
          "2026-01-05", (1L to 8L).map(i => i * 10 -> s"snippet$i zoning topic").toMap),
        ("https://yt/v2", "Meeting with nothing relevant",
          "2026-01-06", (1L to 6L).map(i => i * 10 -> "a bc de f").toMap)
      ).toDF("video_url", "title", "date", "transcript")
      tr.ingest(scraped)
      tr.vectorize(n = 5, overlap = 2)
      val summaries = tr.summarize(k = 3)
      // only the non-sentinel meeting produced a row…
      assert(summaries.select($"video_url").as[String].collect().toSeq ==
        Seq("https://yt/v1"))
      assert(store.read("transcript_summaries").count() == 1)
      // …but BOTH meetings are marked summarized (ref :285-288)
      assert(store.read("council_transcripts")
        .filter($"summarized" === 1).count() == 2)
      // and nothing is re-summarized later
      assert(tr.summarize(k = 3).count() == 0)
    }
  }

  test("reconcile re-queues flagged-vectorized transcripts missing vectors") {
    withStore { store =>
      val tr = new Transcripts(spark, store, embedDim = 16)
      val scraped = Seq(
        ("https://yt/v1", "Meeting one",
          "2026-01-05", (1L to 8L).map(i => i * 10 -> s"snippet$i zoning topic").toMap),
        ("https://yt/v2", "Meeting two",
          "2026-01-06", (1L to 6L).map(i => i * 10 -> s"transit line$i budget").toMap)
      ).toDF("video_url", "title", "date", "transcript")
      tr.ingest(scraped)
      tr.vectorize(n = 5, overlap = 2)
      // both flagged, both present: nothing to re-queue
      assert(tr.reconcile().count() == 0)
      // simulate the drifted state the reference repairs: flags say
      // vectorized but the vector store lost v2's chunks
      store.deleteByKeys("transcript_vectors",
        Seq("https://yt/v2").toDF("video_url"), Seq("video_url"))
      val requeued = tr.reconcile()
      assert(requeued.as[String].collect().toSeq == Seq("https://yt/v2"))
      assert(store.read("council_transcripts")
        .filter($"vectorized" === 0).select($"video_url")
        .as[String].collect().toSeq == Seq("https://yt/v2"))
      // the next vectorize run repairs exactly the orphan
      val repaired = tr.vectorize(n = 5, overlap = 2)
      assert(repaired.select($"video_url").distinct()
        .as[String].collect().toSeq == Seq("https://yt/v2"))
      assert(tr.reconcile().count() == 0)
    }
  }

  test("RDD snapshots survive flag-flip rewrites; no localCheckpoint blocks") {
    withStore { store =>
      val before = spark.sparkContext.getPersistentRDDs.keySet
      val tr = new Transcripts(spark, store, embedDim = 16)
      val scraped = Seq(
        ("https://yt/v1", "Meeting about zoning bylaws",
          "2026-01-05", (1L to 12L).map(i => i * 10 -> s"snippet$i zoning topic").toMap),
        ("https://yt/v2", "Meeting about transit budget",
          "2026-01-06", (1L to 7L).map(i => i * 10 -> s"transit line$i budget").toMap)
      ).toDF("video_url", "title", "date", "transcript")
      tr.ingest(scraped)
      // each site's returned frame is read only AFTER the table its
      // lineage scans was rewritten by the flag flip — the snapshot
      // must yield the pre-rewrite batch, not a re-read or a crash
      val vectors = tr.vectorize(n = 5, overlap = 2)   // rewrites council_transcripts
      val summaries = tr.summarize(k = 3)              // rewrites council_transcripts
      store.deleteByKeys("transcript_vectors",
        Seq("https://yt/v2").toDF("video_url"), Seq("video_url"))
      val orphans = tr.reconcile()                     // rewrites council_transcripts
      assert(vectors.count() == 7)
      assert(summaries.count() == 2)
      assert(orphans.as[String].collect().toSeq == Seq("https://yt/v2"))
      // stable on re-evaluation (cached snapshot, not replaced parquet)
      assert(vectors.count() == 7)
      assert(summaries.count() == 2)
      // returned frames are the release handles; with the old
      // localCheckpoint barriers these unpersists released nothing
      // (checkpoint blocks sit outside the cache manager) and the
      // drain below failed — the port makes every snapshot releasable
      vectors.unpersist(blocking = true)
      summaries.unpersist(blocking = true)
      orphans.unpersist(blocking = true)
      assert(drainsTo(before),
        s"pipeline left cached RDDs: ${
          spark.sparkContext.getPersistentRDDs.keySet -- before}")
    }
  }
}

/** Thin civic pipelines (SURVEY.md §7.1.5): permits, rezoning, bylaws. */
class BuildingPermitsSpec extends SparkSpec with StoreFixture {
  import spark.implicits._

  // Socrata feeds arrive as all-string JSON rows (F11 safe-cast surface)
  private def raw = Seq(
    // good row, full coordinates
    ("p1", "53.5", "-113.5", "120.5", "1 Main St", "250000", "2",
     "New", "House", "build a house", "Residential", "7", "2026",
     "2026-07-15T00:00:00", "Downtown", "RS"),
    // missing coords, geocodable address
    ("p2", null, null, "80", "9 Yard Rd", "99000", "1",
     "New", "Garage", "garage", "Residential", "7", "2026",
     "2026-07-16T00:00:00", "Westmount", "RS"),
    // missing coords AND no address -> reference skips the record
    ("p3", "0.0", "0.0", "10", null, "5", "0",
     "Demo", "Shed", "demo", "Commercial", "7", "2026",
     "2026-07-17T00:00:00", "Oliver", "CB1"),
    // predates the cutoff -> filtered server-side in the reference
    ("p4", "53.1", "-113.1", "1", "2 Old Rd", "1", "0",
     "Old", "House", "old", "Residential", "1", "2020",
     "2020-01-01T00:00:00", "Oliver", "RS"),
    // duplicate key-tuple of p1 -> ON CONFLICT DO NOTHING drops it
    ("p5", "53.5", "-113.5", "999", "1 Main St", "1", "0",
     "New", "House", "dup", "Residential", "7", "2026",
     "2026-07-15T00:00:00", "Downtown", "RS")
  ).toDF("uuid", "latitude", "longitude", "floor_area", "address",
    "construction_value", "units_added", "work_type", "building_type",
    "job_description", "job_category", "month_number", "year",
    "issue_date", "neighbourhood", "zoning")

  test("permits: safe casts, geocode fallback, skip rule, date parts, upsert") {
    withStore { store =>
      val p = new BuildingPermits(spark, store)
      p.run(raw, cutoffDate = "2026-04-01")
      p.run(raw, cutoffDate = "2026-04-01") // idempotent
      val out = store.read("building_permits")
      assert(out.count() == 2) // p1 (p5 deduped), p2 geocoded; p3, p4 gone
      val p1 = out.filter($"uuid" === "p1").head()
      assert(p1.getAs[Int]("permit_day") == 15)
      assert(p1.getAs[Int]("num_units") == 2)
      assert(p1.getAs[Double]("construction_value") == 250000.0)
      val p2 = out.filter($"uuid" === "p2").head()
      assert(p2.getAs[Double]("latitude") > 53.0) // geocoder stub filled it
      assert(p2.getAs[Double]("longitude") < -113.0)
    }
  }
}

class RezoningSpec extends SparkSpec with StoreFixture {
  import spark.implicits._

  private def raw = Seq(
    ("r1", "Rezoning", "In Review", "2010-01-01", "2026-01-05", "53.5", "-113.5"),
    ("r2", "Rezoning", "Approved", "2026-07-01", "2026-01-06", "53.6", "-113.6"),
    ("r3", "Rezoning", "Approved", "2019-01-01", "2026-01-07", "53.7", "-113.7"),
    ("r4", "Rezoning", "Refused", "2026-06-30", "2026-01-08", "53.8", "-113.8"),
    ("r5", "Road Closure", "In Review", "2026-07-01", "2026-01-09", "53.9", "-113.9")
  ).toDF("uuid", "application_type", "status", "council_approval_date",
    "created_date", "latitude", "longitude")
    .withColumn("file_number", lit("f"))
    .withColumn("address", lit("a")).withColumn("city", lit("Edmonton"))
    .withColumn("province", lit("AB")).withColumn("zone_change", lit("RS->RM"))
    .withColumn("council_public_hearing_date", lit(""))
    .withColumn("planner_contact", lit(""))

  test("rezoning: disjunctive status/date predicate + categorical filter + upsert") {
    withStore { store =>
      val rz = new Rezoning(spark, store)
      rz.run(raw, startDate = "2025-06-18", endDate = "2026-08-01")
      val kept = store.read("rezoned_properties")
        .select($"uuid").as[String].collect().toSet
      // r1 In Review (date irrelevant), r2/r4 decided within range;
      // r3 decided out of range, r5 not a rezoning application
      assert(kept == Set("r1", "r2", "r4"))
    }
  }
}

class ZoningBylawsSpec extends SparkSpec with StoreFixture {
  import spark.implicits._

  test("bylaws: title split + storeys cascade + modifier keying + rewrite") {
    withStore { store =>
      val pages = Seq(
        ("3.16 A6 - River Crossing Zone", "buildings up to 6 or 8 storeys", null),
        ("3.16 A6 - River Crossing Zone", "buildings up to 6 or 8 storeys", "f2.0"),
        ("Direct Control Provision", "no height maximum", null)
      ).toDF("zone_title", "height_text", "modifier")
      val zb = new ZoningBylaws(spark, store)
      zb.run(pages)
      zb.run(pages) // rewrite is a full refresh, stays 3 rows
      val out = store.read("zoning_bylaws").orderBy($"zone_key").collect()
      assert(out.length == 3)
      assert(out.map(_.getAs[String]("zone_key")).toSeq ==
        Seq("A6", "A6 f2.0", "Direct Control Provision"))
      assert(out(0).getAs[String]("section") == "3.16")
      assert(out(0).getAs[String]("storeys") == "Up to 6 or 8")
      assert(out(2).getAs[String]("section") == null)
      assert(out(2).getAs[String]("storeys") == null)
    }
  }

  test("bylaws: regulations modifier-merge rule + permitted_uses") {
    // mirrors get_edm_zoning_bylaw_data.py:226-250 + :314-316: tracked-
    // variable filter, last-wins duplicate regulation, regulation >
    // modifier on merge, Number of Storeys injected last
    val pages = Seq(
      ("3.1 RS - Small Scale", "up to 3 storeys", "f1.0",
        Seq("House", "Duplex"),
        Seq(("Maximum Height", "10m"), ("Parking", "2 stalls"),
          ("Floor Area Ratio", "0.6"), ("Maximum Height", "12m")),
        Map("Maximum Height" -> "LOSES", "Site Coverage" -> "45%",
          "Notes" -> "dropped")),
      ("3.2 A1 - Agriculture", "no limit", null,
        null.asInstanceOf[Seq[String]],
        null.asInstanceOf[Seq[(String, String)]],
        null.asInstanceOf[Map[String, String]])
    ).toDF("zone_title", "height_text", "modifier",
      "permitted_uses", "reg_pairs", "modifier_vars")
      .withColumn("regulation_rows",
        transform($"reg_pairs", p => struct(p.getField("_1").as("name"),
          p.getField("_2").as("value"))))
      .drop("reg_pairs")
    val out = ZoningBylaws.parse(pages).orderBy($"zone_key").collect()
    assert(out.length == 2)
    val rs = out.find(_.getAs[String]("zone_code") == "RS").get
    assert(rs.getAs[String]("zone_key") == "RS f1.0")
    assert(rs.getAs[Map[String, String]]("regulations") == Map(
      "Maximum Height" -> "12m",        // last duplicate wins, beats modifier
      "Floor Area Ratio" -> "0.6",      // Parking filtered (untracked)
      "Site Coverage" -> "45%",         // modifier survives (no collision)
      "Number of Storeys" -> "Up to 3"))// injected last from the cascade
    assert(rs.getAs[scala.collection.Seq[String]]("permitted_uses").toList ==
      List("House", "Duplex"))
    val a1 = out.find(_.getAs[String]("zone_code") == "A1").get
    assert(a1.getAs[Map[String, String]]("regulations") == Map.empty)
    assert(a1.getAs[scala.collection.Seq[String]]("permitted_uses") == null)
  }
}

/** REIT financial reports: PDF-text stand-in + keyword page sets +
  * prompt templating + stubbed extraction (REIT_metrics.py:109-243).
  */
class FinancialReportsSpec extends SparkSpec {
  import spark.implicits._

  private def reports = Seq(
    ("r1", ("Annual results. Total debt of 1,234,567 held.\f" +
      "Occupancy reached 95.4 percent this quarter.\f" +
      "EBITDA was 42 this year; net income of 7 reported.")
      .getBytes("UTF-8")),
    ("r2", "A short letter mentioning net income of 10 only."
      .getBytes("UTF-8"))
  ).toDF("report_id", "pdf")

  private def pipeline = new FinancialReports(spark)

  test("pdfPages explodes form-feed pages with 1-based numbering") {
    val pages = pipeline.pdfPages(reports, "report_id", "pdf")
    assert(pages.count() == 4)
    assert(pages.filter($"report_id" === "r1").count() == 3)
    assert(pages.filter($"report_id" === "r2" && $"page_num" === 1).count() == 1)
  }

  test("metric page sets, prompts, extraction stub, missing metrics") {
    val pages = pipeline.pdfPages(reports, "report_id", "pdf")
    val mp = pipeline.metricPages(pages).collect()
      .map(r => (r.getString(0), r.getString(1)) -> r.getSeq[Int](2)).toMap
    assert(mp(("r1", "debt_balance")) == Seq(1))
    assert(mp(("r1", "occupancy_rate")) == Seq(2))
    assert(mp(("r1", "ebitda")) == Seq(3))
    assert(mp(("r1", "net_income")) == Seq(3))
    assert(mp(("r2", "net_income")) == Seq(1))
    val vals = pipeline.extractMetrics(pages).collect()
      .map(r => (r.getString(0), r.getString(1)) ->
        r.getAs[Double]("extracted_value")).toMap
    assert(vals(("r1", "debt_balance")) == 1234567.0)
    assert(vals(("r1", "occupancy_rate")) == 95.4)
    assert(vals(("r2", "net_income")) == 10.0)
    val missing = pipeline.missingMetrics(pages)
      .filter($"report_id" === "r2").select($"metric").as[String]
      .collect().toSet
    assert(missing.size == 9 && !missing.contains("net_income"))
    val prompt = pipeline.prompts(pipeline.metricPages(pages))
      .filter($"report_id" === "r1" && $"metric" === "ebitda")
      .select($"prompt").as[String].head()
    assert(prompt.contains("EBITDA") && prompt.contains("number"))
    val full = pipeline.run(reports, "report_id", "pdf")
    assert(full.columns.toSet ==
      Set("report_id", "metric", "pages", "prompt", "extracted_value"))
  }
}
