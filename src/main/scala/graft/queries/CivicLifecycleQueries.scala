package graft.queries

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._
import graft.Tables.t

/** Round-14 lifecycle capstones for the four reference DAGs that had
  * every operator gated individually but no end-to-end composition
  * gate (the q245/q246/q247 pattern — that sweep caught a real
  * grid-aliasing bug in round 13, so it earns its keep): building
  * permits (q256, get_edm_building_permits.py:123-228), rezoning
  * (q257, get_edm_rezoning_data.py:52-116), zoning bylaws (q258,
  * get_edm_zoning_bylaw_data.py:82-399), REIT financial reports
  * (q259, REIT_metrics.py:177-376). Each runs its [[graft.pipelines]]
  * class over deterministic TPC-H-derived generations against a
  * scratch TableStore and hash-compares one scorecard against a
  * DuckDB oracle that replays the whole composition — normalize,
  * safe-cast defaults, geocode fallback, disjunctive filters, keyed
  * DO-NOTHING upsert / full-refresh rewrite / append accounting — in
  * SQL. What these gates catch is drift ACROSS the composition; the
  * individual operators are gated elsewhere (q03, q37, q54, …).
  */
object CivicLifecycleQueries {

  /** Deterministic Socrata-shaped permit feed
    * (get_edm_building_permits.py field shapes), all columns strings
    * as a JSON feed delivers them. Exercises every normalize leg: the
    * cutoff pushdown, safe-cast junk defaults ("NaN" — the
    * reference's explicit sentinel, mapped to the default, never a
    * real NaN — plus "n/a", "x", "m", a null), the
    * (0,0)-coordinate geocode fallback (k%5), the
    * Unknown-address skip rule (k%10 ⊂ k%5, so those rows drop), and
    * day/month extraction. `job_description` carries the generation
    * tag — the DO-NOTHING proof. Generation 1 is the even-key half;
    * generation 2 is the full feed, so overlapping keys must keep
    * gen1.
    */
  private def permitFeed(orders: DataFrame, g: Int): DataFrame = {
    val k = col("o_orderkey")
    val od = date_format(col("o_orderdate"), "yyyy-MM-dd")
    val src = if (g == 1) orders.filter(k % 2 === 0) else orders
    src.select(
      concat(lit("u"), k.cast("string"), lit("g"), lit(g.toString))
        .as("uuid"),
      when(k % 5 === 0, "0.0")
        .otherwise(concat(lit("54."),
          lpad((k % 1000).cast("string"), 3, "0"))).as("latitude"),
      when(k % 5 === 0, "0.0")
        .otherwise(concat(lit("-113."),
          lpad(((k / 1000).cast("long") % 1000).cast("string"), 3, "0")))
        .as("longitude"),
      when(k % 6 === 0, "NaN").when(k % 6 === 3, "n/a")
        .otherwise((k % 500).cast("string")).as("floor_area"),
      when(k % 10 === 0, "Unknown")
        .otherwise(concat(lit("addr-"), k.cast("string"))).as("address"),
      when(k % 7 === 0, lit(null).cast("string"))
        .otherwise(((k * 3) % 10000).cast("string"))
        .as("construction_value"),
      when(k % 4 === 1, "x").otherwise((k % 9).cast("string"))
        .as("units_added"),
      when(k % 3 === 0, "New").when(k % 3 === 1, "Renovation")
        .otherwise("Demolition").as("work_type"),
      when(k % 2 === 0, "Residential").otherwise("Commercial")
        .as("building_type"),
      lit(s"gen$g").as("job_description"),
      when(k % 2 === 0, "Major").otherwise("Minor").as("job_category"),
      when(k % 6 === 2, "m")
        .otherwise(month(col("o_orderdate")).cast("string"))
        .as("month_number"),
      year(col("o_orderdate")).cast("string").as("year"),
      concat(od, lit("T00:00:00.000")).as("issue_date"),
      concat(lit("n"), (k % 40).cast("string")).as("neighbourhood"),
      concat(lit("z"), (k % 15).cast("string")).as("zoning"))
  }

  /** q256 — the BUILDING-PERMITS LIFECYCLE capstone: two full
    * [[graft.pipelines.BuildingPermits.run]] generations against one
    * TableStore — `issue_date >= cutoff` pushdown (S7), per-field
    * safe-cast defaults (F11), the md5-kit geocode-fallback seam with
    * the reference's skip rule (U5, ref :160-183), day extraction
    * (F12), and the ON-CONFLICT-DO-NOTHING upsert on
    * (latitude, longitude, issue_date) (K2/K4). The oracle replays
    * everything, including the geocoder stub's exact md5-derived
    * coordinates and the intra-batch key-dedupe rank, so a drifted
    * cast default, a skipped skip rule, or an upsert that overwrites
    * gen1 all flip the hash.
    */
  private val q256 = Q("q256_permits_lifecycle",
    (s, dir) => {
      val orders = t(s, dir, "orders")
      Scratch.withDir("graft_q256_bp") { root =>
        val store = new graft.sources.TableStore(s, root)
        val pipe = new graft.pipelines.BuildingPermits(s, store)
        for (g <- Seq(1, 2))
          pipe.run(permitFeed(orders, g), cutoffDate = "1996-06-01")
        store.read("building_permits")
          .groupBy(col("description").as("tag"), col("work_type"))
          .agg(count(lit(1)).as("n"),
            sum(when(col("latitude") < 54.0, 1L).otherwise(0L))
              .as("n_geocoded"),
            sum(round(col("latitude") * 10000, 0).cast("long"))
              .as("sum_lat_q"),
            sum(round(col("longitude") * 10000, 0).cast("long"))
              .as("sum_lon_q"),
            sum(col("floor_area")).cast("long").as("sum_floor"),
            sum(col("construction_value")).cast("long").as("sum_cv"),
            sum(col("num_units").cast("long")).as("sum_units"),
            sum(col("permit_month").cast("long")).as("sum_month"),
            sum(col("permit_day").cast("long")).as("sum_day"),
            min(col("uuid")).as("min_uuid"),
            max(col("uuid")).as("max_uuid"),
            countDistinct(col("neighbourhood")).as("n_nbhd"))
          .orderBy(col("tag"), col("work_type"))
      }(s)
    },
    Some(s"""WITH gens AS (SELECT UNNEST([1, 2]) AS g),
      feed AS (
        SELECT o_orderkey AS k, g,
          'u' || o_orderkey || 'g' || g AS uuid,
          CASE WHEN o_orderkey % 5 = 0 THEN '0.0'
            ELSE '54.' || LPAD(CAST(o_orderkey % 1000 AS VARCHAR), 3, '0')
            END AS lat_raw,
          CASE WHEN o_orderkey % 5 = 0 THEN '0.0'
            ELSE '-113.' || LPAD(CAST((o_orderkey // 1000) % 1000
              AS VARCHAR), 3, '0') END AS lon_raw,
          CASE WHEN o_orderkey % 6 = 0 THEN 'NaN'
            WHEN o_orderkey % 6 = 3 THEN 'n/a'
            ELSE CAST(o_orderkey % 500 AS VARCHAR) END AS floor_raw,
          CASE WHEN o_orderkey % 10 = 0 THEN 'Unknown'
            ELSE 'addr-' || o_orderkey END AS address,
          CASE WHEN o_orderkey % 7 = 0 THEN NULL
            ELSE CAST((o_orderkey * 3) % 10000 AS VARCHAR) END AS cv_raw,
          CASE WHEN o_orderkey % 4 = 1 THEN 'x'
            ELSE CAST(o_orderkey % 9 AS VARCHAR) END AS units_raw,
          CASE WHEN o_orderkey % 3 = 0 THEN 'New'
            WHEN o_orderkey % 3 = 1 THEN 'Renovation'
            ELSE 'Demolition' END AS work_type,
          'gen' || g AS tag,
          CASE WHEN o_orderkey % 6 = 2 THEN 'm'
            ELSE CAST(EXTRACT(MONTH FROM o_orderdate) AS VARCHAR)
            END AS month_raw,
          strftime(o_orderdate, '%Y-%m-%d') || 'T00:00:00.000'
            AS issue_date,
          EXTRACT(DAY FROM o_orderdate) AS od_day,
          'n' || (o_orderkey % 40) AS neighbourhood
        FROM orders, gens
        WHERE NOT (g = 1 AND o_orderkey % 2 = 1)),
      norm AS (
        SELECT *,
          COALESCE(TRY_CAST(lat_raw AS DOUBLE), 0.0) AS lat0,
          COALESCE(TRY_CAST(lon_raw AS DOUBLE), 0.0) AS lon0,
          COALESCE(CASE WHEN ISNAN(TRY_CAST(floor_raw AS DOUBLE))
            THEN NULL ELSE TRY_CAST(floor_raw AS DOUBLE) END, 0.0)
            AS floor_area,
          COALESCE(TRY_CAST(cv_raw AS DOUBLE), 0.0) AS construction_value,
          COALESCE(TRY_CAST(units_raw AS INT), 0) AS num_units,
          COALESCE(TRY_CAST(month_raw AS INT), 0) AS permit_month,
          od_day AS permit_day
        FROM feed WHERE issue_date >= '1996-06-01'),
      geo AS (
        SELECT *,
          CASE WHEN (lat0 = 0.0 OR lon0 = 0.0) AND address <> 'Unknown'
            THEN 53.5 + CAST(${SamplingQueries.bucketSql("hla")} % 1000
              AS DOUBLE) / 10000.0
            ELSE lat0 END AS latitude,
          CASE WHEN (lat0 = 0.0 OR lon0 = 0.0) AND address <> 'Unknown'
            THEN -113.6 + CAST(${SamplingQueries.bucketSql("hlo")} % 1000
              AS DOUBLE) / 10000.0
            ELSE lon0 END AS longitude
        FROM (SELECT *, md5('geo_lat:' || address) AS hla,
            md5('geo_lon:' || address) AS hlo FROM norm)),
      kept AS (SELECT * FROM geo
        WHERE latitude <> 0.0 AND longitude <> 0.0),
      d AS (SELECT *, ROW_NUMBER() OVER (
          PARTITION BY g, latitude, longitude, issue_date
          ORDER BY uuid) AS rn
        FROM kept),
      g1 AS (SELECT * FROM d WHERE g = 1 AND rn = 1),
      g2 AS (SELECT * FROM d WHERE g = 2 AND rn = 1),
      fin AS (SELECT * FROM g1
        UNION ALL
        SELECT g2.* FROM g2
          ANTI JOIN g1 USING (latitude, longitude, issue_date))
      SELECT tag, work_type, COUNT(*) AS n,
        CAST(SUM(CASE WHEN latitude < 54.0 THEN 1 ELSE 0 END) AS BIGINT)
          AS n_geocoded,
        CAST(SUM(CAST(ROUND(latitude * 10000) AS BIGINT)) AS BIGINT)
          AS sum_lat_q,
        CAST(SUM(CAST(ROUND(longitude * 10000) AS BIGINT)) AS BIGINT)
          AS sum_lon_q,
        CAST(CAST(SUM(floor_area) AS DOUBLE) AS BIGINT) AS sum_floor,
        CAST(CAST(SUM(construction_value) AS DOUBLE) AS BIGINT) AS sum_cv,
        CAST(SUM(num_units) AS BIGINT) AS sum_units,
        CAST(SUM(permit_month) AS BIGINT) AS sum_month,
        CAST(SUM(permit_day) AS BIGINT) AS sum_day,
        MIN(uuid) AS min_uuid, MAX(uuid) AS max_uuid,
        COUNT(DISTINCT neighbourhood) AS n_nbhd
      FROM fin GROUP BY tag, work_type ORDER BY tag, work_type"""))

  /** Deterministic rezoning feed (get_edm_rezoning_data.py field
    * shapes): the SODA disjunction's three live statuses plus a
    * 'Cancelled' decoy, a 'Rezoning'/other application-type mix, null
    * coordinates defaulting to 0.0, `planner_contact` as the
    * generation tag.
    */
  private def rezoningFeed(orders: DataFrame, g: Int): DataFrame = {
    val k = col("o_orderkey")
    val od = date_format(col("o_orderdate"), "yyyy-MM-dd")
    val src = if (g == 1) orders.filter(k % 2 === 0) else orders
    src.select(
      concat(lit("u"), k.cast("string"), lit("g"), lit(g.toString))
        .as("uuid"),
      concat(lit("LDA-"), k.cast("string")).as("file_number"),
      od.as("created_date"),
      when(k % 3 === 0, "Rezoning").when(k % 3 === 1, "Subdivision")
        .otherwise("Road Closure").as("application_type"),
      concat(lit("addr-"), k.cast("string")).as("address"),
      when(k % 4 === 0, "Edmonton").otherwise("Sherwood Park").as("city"),
      lit("AB").as("province"),
      when(k % 11 === 0, lit(null).cast("string"))
        .otherwise(concat(lit("53."),
          lpad((k % 1000).cast("string"), 3, "0"))).as("latitude"),
      when(k % 11 === 0, lit(null).cast("string"))
        .otherwise(concat(lit("-113."),
          lpad(((k / 1000).cast("long") % 1000).cast("string"), 3, "0")))
        .as("longitude"),
      concat(lit("Z"), (k % 7).cast("string"), lit(" to Z"),
        (k % 5).cast("string")).as("zone_change"),
      when(k % 5 === 0, "In Review").when(k % 5 === 1, "Approved")
        .when(k % 5 === 2, "Refused").when(k % 5 === 3, "Cancelled")
        .otherwise("Approved").as("status"),
      od.as("council_public_hearing_date"),
      od.as("council_approval_date"),
      lit(s"gen$g").as("planner_contact"))
  }

  /** q257 — the REZONING LIFECYCLE capstone: two full
    * [[graft.pipelines.Rezoning.run]] generations — the SODA
    * disjunctive status/date predicate (S7/P6: In Review passes
    * regardless of date; Approved/Refused only inside the window;
    * Cancelled never), the categorical Rezoning filter (P5),
    * defaulted projection (F11), ON-CONFLICT-DO-NOTHING upsert on
    * (latitude, longitude, created_date) (K2). The null-coordinate
    * rows all collapse onto (0,0, created_date) keys, so the gate
    * also proves the key-dedupe + DO-NOTHING behavior under heavy key
    * collision.
    */
  private val q257 = Q("q257_rezoning_lifecycle",
    (s, dir) => {
      val orders = t(s, dir, "orders")
      Scratch.withDir("graft_q257_rz") { root =>
        val store = new graft.sources.TableStore(s, root)
        val pipe = new graft.pipelines.Rezoning(s, store)
        for (g <- Seq(1, 2))
          pipe.run(rezoningFeed(orders, g),
            startDate = "1994-01-01", endDate = "1996-12-31")
        store.read("rezoned_properties")
          .groupBy(col("planner_contact").as("tag"), col("status"))
          .agg(count(lit(1)).as("n"),
            sum(round(col("latitude") * 10000, 0).cast("long"))
              .as("sum_lat_q"),
            sum(when(col("latitude") === 0.0, 1L).otherwise(0L))
              .as("n_default_coord"),
            min(col("file_number")).as("min_file"),
            max(col("file_number")).as("max_file"),
            countDistinct(col("zone_change")).as("n_zc"),
            min(col("created_date")).as("min_created"),
            max(col("created_date")).as("max_created"))
          .orderBy(col("tag"), col("status"))
      }(s)
    },
    Some("""WITH gens AS (SELECT UNNEST([1, 2]) AS g),
      feed AS (
        SELECT o_orderkey AS k, g,
          'u' || o_orderkey || 'g' || g AS uuid,
          'LDA-' || o_orderkey AS file_number,
          strftime(o_orderdate, '%Y-%m-%d') AS created_date,
          CASE WHEN o_orderkey % 3 = 0 THEN 'Rezoning'
            WHEN o_orderkey % 3 = 1 THEN 'Subdivision'
            ELSE 'Road Closure' END AS application_type,
          CASE WHEN o_orderkey % 11 = 0 THEN NULL
            ELSE '53.' || LPAD(CAST(o_orderkey % 1000 AS VARCHAR), 3, '0')
            END AS lat_raw,
          CASE WHEN o_orderkey % 11 = 0 THEN NULL
            ELSE '-113.' || LPAD(CAST((o_orderkey // 1000) % 1000
              AS VARCHAR), 3, '0') END AS lon_raw,
          'Z' || (o_orderkey % 7) || ' to Z' || (o_orderkey % 5)
            AS zone_change,
          CASE WHEN o_orderkey % 5 = 0 THEN 'In Review'
            WHEN o_orderkey % 5 = 1 THEN 'Approved'
            WHEN o_orderkey % 5 = 2 THEN 'Refused'
            WHEN o_orderkey % 5 = 3 THEN 'Cancelled'
            ELSE 'Approved' END AS status,
          strftime(o_orderdate, '%Y-%m-%d') AS council_approval_date,
          'gen' || g AS tag
        FROM orders, gens
        WHERE NOT (g = 1 AND o_orderkey % 2 = 1)),
      norm AS (
        SELECT *,
          COALESCE(TRY_CAST(lat_raw AS DOUBLE), 0.0) AS latitude,
          COALESCE(TRY_CAST(lon_raw AS DOUBLE), 0.0) AS longitude
        FROM feed
        WHERE (status = 'In Review' OR (status IN ('Approved', 'Refused')
            AND council_approval_date
              BETWEEN '1994-01-01' AND '1996-12-31'))
          AND application_type = 'Rezoning'),
      d AS (SELECT *, ROW_NUMBER() OVER (
          PARTITION BY g, latitude, longitude, created_date
          ORDER BY uuid) AS rn
        FROM norm),
      g1 AS (SELECT * FROM d WHERE g = 1 AND rn = 1),
      g2 AS (SELECT * FROM d WHERE g = 2 AND rn = 1),
      fin AS (SELECT * FROM g1
        UNION ALL
        SELECT g2.* FROM g2
          ANTI JOIN g1 USING (latitude, longitude, created_date))
      SELECT tag, status, COUNT(*) AS n,
        CAST(SUM(CAST(ROUND(latitude * 10000) AS BIGINT)) AS BIGINT)
          AS sum_lat_q,
        CAST(SUM(CASE WHEN latitude = 0.0 THEN 1 ELSE 0 END) AS BIGINT)
          AS n_default_coord,
        MIN(file_number) AS min_file, MAX(file_number) AS max_file,
        COUNT(DISTINCT zone_change) AS n_zc,
        MIN(created_date) AS min_created, MAX(created_date) AS max_created
      FROM fin GROUP BY tag, status ORDER BY tag, status"""))

  /** q54's bylaw-page fixture, generation-parameterized: gen 2 drops
    * every ninth zone page, shifts every height number by one, and
    * re-values the Floor Area Ratio rows — so any gen-1 row surviving
    * the second full-refresh rewrite flips the hash.
    */
  private def bylawPages(orders: DataFrame, g: Int): DataFrame = {
    val k = col("o_orderkey")
    val xs = (k % 30 + g).cast("string")
    val c = (k % 6).cast("string")
    def reg(name: Column, value: Column) =
      struct(name.as("name"), value.as("value"))
    val emptyRegs = array().cast("array<struct<name:string,value:string>>")
    val base = orders.filter(k % 7 === 0)
    val src = if (g == 2) base.filter(k % 9 =!= 0) else base
    src.select(
      k.as("o_orderkey"),
      lit(s"gen$g").as("tag"),
      concat(xs, lit("."), c, lit(" Z"), k.cast("string"),
        lit(" - Test Zone "), c).as("zone_title"),
      when(k % 3 === 0, concat(lit("up to "), xs, lit(" storeys")))
        .when(k % 3 === 1, concat(xs, lit(" storeys ok")))
        .otherwise(lit("no limit")).as("height_text"),
      when(k % 2 === 0, concat(lit("f"), c)).as("modifier"),
      when(k % 4 =!= 0, array(concat(lit("b"), c), concat(lit("a"), xs)))
        .as("permitted_uses"),
      concat(
        array(reg(lit("Maximum Height"), concat(xs, lit("m"))),
          reg(lit("Parking stalls"), concat(lit("p"), c))),
        when(k % 2 === 0,
          array(reg(lit("Floor Area Ratio"),
            concat(lit("F"), c, lit("g"), lit(g.toString)))))
          .otherwise(emptyRegs),
        when(k % 5 === 0,
          array(reg(lit("Maximum Height"), concat(lit("DUP"), xs))))
          .otherwise(emptyRegs)).as("regulation_rows"),
      when(k % 2 === 0, map(
        lit("Maximum Height bonus"), concat(lit("mh"), c),
        lit("Site Coverage"), concat(lit("sc"), xs),
        lit("Notes"), lit("n"),
        lit("Floor Area Ratio"), concat(lit("MOD"), c)))
        .as("modifier_vars"))
  }

  /** q258 — the ZONING-BYLAWS LIFECYCLE capstone: two full
    * [[graft.pipelines.ZoningBylaws.run]] generations — the F14 title
    * split, the F13 storeys cascade with its injection precedence,
    * the tracked-variable regulations dict fold (q54's semantics),
    * and the daily DAG's FULL-REFRESH rewrite (K6): generation 2
    * fully replaces generation 1, so the oracle is the closed gen-2
    * form alone and any surviving gen-1 row (tag, dropped key, stale
    * height) fails the hash.
    */
  private val q258 = Q("q258_bylaws_lifecycle",
    (s, dir) => {
      val orders = t(s, dir, "orders")
      Scratch.withDir("graft_q258_zb") { root =>
        val store = new graft.sources.TableStore(s, root)
        val pipe = new graft.pipelines.ZoningBylaws(s, store)
        for (g <- Seq(1, 2)) pipe.run(bylawPages(orders, g))
        // bounded scorecard (the per-zone frame is ~|orders|/7 rows —
        // 190k at the 10x fixture): every assembled column folds into
        // an md5 row hash summed per (tag, k%6) group, so ANY row
        // drift still flips the hash while the collect stays ≤ 12 rows
        def f(c: org.apache.spark.sql.Column) = coalesce(c, lit("[N]"))
        val rows = store.read("zoning_bylaws").select(
          col("tag"), (col("o_orderkey") % 6).cast("long").as("c"),
          col("zone_key"),
          concat_ws("\u0001", f(col("zone_key")), f(col("section")),
            f(col("zone_code")), f(col("zone_name")), f(col("storeys")),
            f(array_join(array_sort(transform(
              map_entries(col("regulations")),
              e => concat(e.getField("key"), lit("="),
                e.getField("value")))), "|")),
            f(array_join(array_sort(col("permitted_uses")), ",")))
            .as("rowstr"))
        rows
          .withColumn("h", call_function("graft_md5_prefix",
            col("rowstr"), lit(8)))
          .groupBy(col("tag"), col("c"))
          .agg(count(lit(1)).as("n"),
            countDistinct(col("zone_key")).as("n_keys"),
            sum(col("h")).as("sum_hash"),
            sum(length(col("rowstr"))).cast("long").as("sum_len"),
            min(col("zone_key")).as("min_key"),
            max(col("zone_key")).as("max_key"))
          .orderBy(col("tag"), col("c"))
      }(s)
    },
    Some(s"""WITH src AS (
        SELECT o_orderkey AS k,
          CAST(o_orderkey % 30 + 2 AS VARCHAR) AS xs,
          CAST(o_orderkey % 6 AS VARCHAR) AS c
        FROM orders WHERE o_orderkey % 7 = 0 AND o_orderkey % 9 <> 0),
      zone AS (SELECT k, 'gen2' AS tag, k % 6 AS c,
        'Z' || k || CASE WHEN k % 2 = 0 THEN ' f' || c ELSE '' END
          AS zone_key,
        xs || '.' || c AS section,
        'Z' || k AS zone_code,
        'Test Zone ' || c AS zone_name,
        CASE WHEN k % 3 = 0 THEN 'Up to ' || xs
             WHEN k % 3 = 1 THEN xs
             ELSE NULL END AS storeys,
        CASE WHEN k % 2 = 0
          THEN 'Floor Area Ratio=F' || c || 'g2|Maximum Height bonus=mh'
            || c || '|'
          ELSE '' END
        || 'Maximum Height='
        || CASE WHEN k % 5 = 0 THEN 'DUP' || xs ELSE xs || 'm' END
        || CASE WHEN k % 3 = 0 THEN '|Number of Storeys=Up to ' || xs
                WHEN k % 3 = 1 THEN '|Number of Storeys=' || xs
                ELSE '' END
        || CASE WHEN k % 2 = 0 THEN '|Site Coverage=sc' || xs
                ELSE '' END AS regs,
        CASE WHEN k % 4 = 0 THEN NULL
             ELSE 'a' || xs || ',b' || c END AS uses
      FROM src),
      rowstrs AS (SELECT tag, c, zone_key,
          zone_key || CHR(1) || section || CHR(1) || zone_code
            || CHR(1) || zone_name || CHR(1) || COALESCE(storeys, '[N]')
            || CHR(1) || regs || CHR(1) || COALESCE(uses, '[N]')
            AS rowstr
        FROM zone),
      hashed AS (SELECT tag, c, zone_key, rowstr,
          ${SamplingQueries.bucketSql("md5(rowstr)")} AS h
        FROM rowstrs)
      SELECT tag, c, COUNT(*) AS n,
        COUNT(DISTINCT zone_key) AS n_keys,
        CAST(SUM(h) AS BIGINT) AS sum_hash,
        CAST(SUM(LENGTH(rowstr)) AS BIGINT) AS sum_len,
        MIN(zone_key) AS min_key, MAX(zone_key) AS max_key
      FROM hashed GROUP BY tag, c ORDER BY tag, c"""))

  /** Deterministic REIT-report fixture: one "PDF" per fiftieth
    * customer — UTF-8 text with form-feed page separators (the
    * declared PDF-decode stand-in, [[graft.pipelines.FinancialReports
    * .pdfPages]]) — six fixed pages whose metric keywords and
    * first-numeric values are closed functions of the key. Four
    * metrics (NAV, same-property NOI, acquisitions, development)
    * never appear, so every report exercises the missing-metric
    * accounting; pages 3–6 toggle by key so found-sets vary.
    */
  private def reportFeed(customer: DataFrame): DataFrame = {
    val k = col("c_custkey")
    val blank = lit("section intentionally blank")
    val p1 = lit("quarterly overview period one")
    val p2 = concat(lit("total debt "), (k * 3 + 7).cast("string"),
      lit(" with liabilities stable"))
    val p3 = when(k % 2 === 0, concat(lit("net income of "),
      (k * 5 + 11).cast("string"), lit(" noi context"))).otherwise(blank)
    val p4 = when(k % 3 === 0, concat(lit("funds from operations ffo "),
      (k * 7 + 13).cast("string"), lit(" and affo adjusted funds "),
      (k * 2 + 17).cast("string"))).otherwise(blank)
    val p5 = when(k % 4 === 0, concat(lit("occupancy sits at "),
      ((k % 89) + 1).cast("string"))).otherwise(blank)
    val p6 = when(k % 5 === 0, concat(lit("ebitda came to "),
      (k * 11 + 19).cast("string")))
      .otherwise(lit("appendix closing remarks"))
    customer.filter(k % 50 === 0).select(
      concat(lit("r"), k.cast("string")).as("report_id"),
      encode(concat_ws("\f", p1, p2, p3, p4, p5, p6), "UTF-8").as("pdf"))
  }

  /** q259 — the FINANCIAL-REPORTS LIFECYCLE capstone
    * ([[graft.pipelines.FinancialReports]], REIT_metrics.py:177-376):
    * binary PDFs → page explode → per-page keyword containment per
    * metric (F25) → sorted page sets (A6) → extraction prompts (F26)
    * → first-numeric stub extraction (U5) → missing-metric
    * accounting → ONE append of found ∪ missing rows to the store
    * (K3, the reference's session.add_all) → per-metric scorecard
    * over the read-back. The oracle replays the page synthesis, the
    * 17 (metric, key-term) containment pairs — including the
    * substring traps the reference inherits ("affo" contains "ffo",
    * "noi" is a bare substring) — the prompt template verbatim, and
    * the Not-Available accounting.
    */
  private val q259 = Q("q259_reports_lifecycle",
    (s, dir) => {
      val reports = reportFeed(t(s, dir, "customer"))
      Scratch.withDir("graft_q259_fr") { root =>
        val store = new graft.sources.TableStore(s, root)
        val fr = new graft.pipelines.FinancialReports(s)
        val pages = fr.pdfPages(reports, "report_id", "pdf").persist()
        val perMetric = fr.metricPages(pages).persist()
        val found = perMetric
          .join(fr.prompts(perMetric), Seq("report_id", "metric"))
          .join(fr.extractMetrics(pages), Seq("report_id", "metric"),
            "left")
          .select(col("report_id"), col("metric"),
            size(col("pages")).cast("long").as("n_pages"),
            element_at(col("pages"), 1).cast("long").as("first_page"),
            col("prompt"),
            col("extracted_value").cast("long").cast("string")
              .as("value"))
        val missing = fr.missingMetrics(pages)
          .select(col("report_id"), col("metric"),
            lit(0L).as("n_pages"),
            lit(null).cast("long").as("first_page"),
            lit(null).cast("string").as("prompt"),
            lit("Not Available").as("value"))
        store.append("report_metrics", found.unionByName(missing))
        pages.unpersist(); perMetric.unpersist()
        store.read("report_metrics")
          .groupBy(col("metric"))
          .agg(count(lit(1)).as("n_reports"),
            sum(when(col("value") =!= "Not Available", 1L).otherwise(0L))
              .as("n_found"),
            sum(when(col("value") === "Not Available", 1L).otherwise(0L))
              .as("n_missing"),
            sum(when(col("value") =!= "Not Available",
              col("value").cast("long")).otherwise(0L)).as("sum_val"),
            sum(col("n_pages")).as("sum_pages"),
            sum(coalesce(col("first_page"), lit(0L))).as("sum_first"),
            min(col("prompt")).as("min_prompt"))
          .orderBy(col("metric"))
      }(s)
    },
    Some("""WITH metrics(metric, metric_name, fmt, descr) AS (VALUES
        ('debt_balance', 'Debt Balance', 'number',
          'Total debt obligations of the company.'),
        ('net_income', 'Net Income (or loss)', 'number',
          'The company''s total profit or loss after all expenses.'),
        ('funds_from_operations', 'Funds From Operations (FFO)',
          'number', 'Net income adjusted for non-cash items.'),
        ('adjusted_funds_from_operations',
          'Adjusted Funds From Operations (AFFO)', 'number',
          'FFO further adjusted for capital expenditures and other relevant items.'),
        ('net_asset_value', 'Net Asset Value (NAV)', 'number',
          'The total value of assets minus liabilities.'),
        ('ebitda', 'EBITDA', 'number',
          'Earnings Before Interest, Taxes, Depreciation, and Amortization.'),
        ('occupancy_rate', 'Occupancy', 'percentage',
          'The percentage of rentable space currently leased compared to total available space.'),
        ('same_property_noi', 'Same Property NOI', 'number',
          'The operating income from properties held in both the current and prior periods, excluding new acquisitions or developments.'),
        ('investment_in_acquisitions', 'Investment in Acquisitions',
          'number', 'Capital spent on purchasing new properties.'),
        ('investment_in_development', 'Investment in Development',
          'number', 'Capital allocated for constructing or improving assets.')),
      terms(metric, term) AS (VALUES
        ('debt_balance', 'debt'), ('debt_balance', 'liabilities'),
        ('net_income', 'net income'),
        ('net_income', 'net operating income'), ('net_income', 'noi'),
        ('funds_from_operations', 'funds from operations'),
        ('funds_from_operations', 'ffo'),
        ('adjusted_funds_from_operations', 'adjusted funds'),
        ('adjusted_funds_from_operations', 'affo'),
        ('net_asset_value', 'net asset value'),
        ('net_asset_value', 'nav'),
        ('ebitda', 'ebitda'),
        ('occupancy_rate', 'occupancy'),
        ('same_property_noi', 'same property'),
        ('same_property_noi', 'same asset'),
        ('investment_in_acquisitions', 'acquisitions'),
        ('investment_in_development', 'development')),
      reps AS (SELECT c_custkey AS k, 'r' || c_custkey AS report_id
        FROM customer WHERE c_custkey % 50 = 0),
      pages AS (
        SELECT k, report_id, pn,
          CASE pn
            WHEN 1 THEN 'quarterly overview period one'
            WHEN 2 THEN 'total debt ' || (k * 3 + 7)
              || ' with liabilities stable'
            WHEN 3 THEN CASE WHEN k % 2 = 0
              THEN 'net income of ' || (k * 5 + 11) || ' noi context'
              ELSE 'section intentionally blank' END
            WHEN 4 THEN CASE WHEN k % 3 = 0
              THEN 'funds from operations ffo ' || (k * 7 + 13)
                || ' and affo adjusted funds ' || (k * 2 + 17)
              ELSE 'section intentionally blank' END
            WHEN 5 THEN CASE WHEN k % 4 = 0
              THEN 'occupancy sits at ' || ((k % 89) + 1)
              ELSE 'section intentionally blank' END
            ELSE CASE WHEN k % 5 = 0
              THEN 'ebitda came to ' || (k * 11 + 19)
              ELSE 'appendix closing remarks' END
          END AS pt
        FROM reps, (SELECT UNNEST([1, 2, 3, 4, 5, 6]) AS pn)),
      hits AS (SELECT DISTINCT p.report_id, t.metric, p.pn, p.pt
        FROM pages p JOIN terms t
          ON POSITION(t.term IN LOWER(p.pt)) > 0),
      pm AS (SELECT report_id, metric, COUNT(*) AS n_pages,
          MIN(pn) AS first_page
        FROM hits GROUP BY 1, 2),
      ev AS (SELECT report_id, metric,
          CAST(CAST(REPLACE(regexp_extract(pt, '([0-9][0-9,.]*)', 1),
            ',', '') AS DOUBLE) AS BIGINT) AS v
        FROM (SELECT *, ROW_NUMBER() OVER (
            PARTITION BY report_id, metric ORDER BY pn) AS rn
          FROM hits
          WHERE regexp_extract(pt, '([0-9][0-9,.]*)', 1) <> '')
        WHERE rn = 1),
      found AS (SELECT p.report_id, p.metric,
          CAST(p.n_pages AS BIGINT) AS n_pages,
          CAST(p.first_page AS BIGINT) AS first_page,
          'Extract the following metric from the attached report.'
            || CHR(10) || m.metric_name || ': ' || m.descr || CHR(10)
            || 'Respond with JSON {' || p.metric || ': ' || m.fmt
            || '}' AS prompt,
          CAST(e.v AS VARCHAR) AS value
        FROM pm p JOIN metrics m USING (metric)
        LEFT JOIN ev e USING (report_id, metric)),
      missing AS (SELECT report_id, metric,
          CAST(0 AS BIGINT) AS n_pages, CAST(NULL AS BIGINT) AS first_page,
          CAST(NULL AS VARCHAR) AS prompt, 'Not Available' AS value
        FROM (SELECT r.report_id, m.metric
          FROM reps r CROSS JOIN metrics m)
        ANTI JOIN pm USING (report_id, metric)),
      allr AS (SELECT * FROM found UNION ALL SELECT * FROM missing)
      SELECT metric, COUNT(*) AS n_reports,
        CAST(SUM(CASE WHEN value <> 'Not Available' THEN 1 ELSE 0 END)
          AS BIGINT) AS n_found,
        CAST(SUM(CASE WHEN value = 'Not Available' THEN 1 ELSE 0 END)
          AS BIGINT) AS n_missing,
        CAST(SUM(CASE WHEN value <> 'Not Available'
          THEN CAST(value AS BIGINT) ELSE 0 END) AS BIGINT) AS sum_val,
        CAST(SUM(n_pages) AS BIGINT) AS sum_pages,
        CAST(SUM(COALESCE(first_page, 0)) AS BIGINT) AS sum_first,
        MIN(prompt) AS min_prompt
      FROM allr GROUP BY metric ORDER BY metric"""))

  val all: Seq[Q] = Seq(q256, q257, q258, q259)
}
