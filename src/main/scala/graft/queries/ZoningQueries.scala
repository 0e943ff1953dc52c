package graft.queries

import org.apache.spark.sql.Column
import org.apache.spark.sql.functions._
import graft.Tables.t
import graft.functions.ZoningFunctions

/** Zoning-bylaw parsing coverage (SURVEY.md §2.7 F13/F14). The testdata
  * has no scraped bylaw pages, so deterministic bylaw-shaped text is
  * synthesized from `orders` columns identically on both engines and
  * then parsed with the reference's regex cascade / title split.
  */
object ZoningQueries {

  /** q37 — F13 storeys cascade + F14 zone-title split over synthesized
    * bylaw text: all five height cases, the no-match null, a parseable
    * title, and the reference's unparsable-title fallback. Narrow
    * projection — regex cascade is codegen'd, no shuffle beyond the
    * final presentation sort.
    */
  private val q37 = Q("q37_zoning_parse",
    (s, dir) => {
      val xs = (col("o_orderkey") % 30 + 1).cast("string")
      val ys = (col("o_orderkey") % 30 + 6).cast("string")
      val c = (col("o_orderkey") % 6).cast("string")
      val bylawText =
        when(col("o_orderkey") % 6 === 0,
            concat(lit("build up to "), xs, lit(" or "), ys, lit(" Storeys here")))
          .when(col("o_orderkey") % 6 === 1,
            concat(lit("Up To "), xs, lit(" storeys")))
          .when(col("o_orderkey") % 6 === 2,
            concat(lit("ranges from "), xs, lit(" to "), ys, lit(" storeys")))
          .when(col("o_orderkey") % 6 === 3,
            concat(xs, lit(" or "), ys, lit(" STOREYS permitted")))
          .when(col("o_orderkey") % 6 === 4,
            concat(lit("max height "), xs, lit(" storeys")))
          .otherwise(lit("no height limit"))
      val fullTitle =
        when(col("o_orderkey") % 4 === 0,
            concat(xs, lit("."), c, lit(" RS"), c, lit(" - Residential Small Scale")))
          .when(col("o_orderkey") % 4 === 1,
            concat(xs, lit(" A"), c, lit(" - Agriculture Zone")))
          .when(col("o_orderkey") % 4 === 2, lit("Direct Control Provision"))
          .otherwise(concat(lit("  "), xs, lit(".10 DC1 - Direct Development Control")))
      val parts = ZoningFunctions.zoneTitleParts(fullTitle)
      t(s, dir, "orders")
        .select(col("o_orderkey"),
          ZoningFunctions.storeysSummary(bylawText).as("storeys"),
          parts.getField("section").as("section"),
          parts.getField("zone_code").as("zone_code"),
          parts.getField("zone_name").as("zone_name"))
        .orderBy(col("o_orderkey"))
    },
    Some("""WITH src AS (
        SELECT o_orderkey,
          CAST(o_orderkey % 30 + 1 AS VARCHAR) AS xs,
          CAST(o_orderkey % 30 + 6 AS VARCHAR) AS ys,
          CAST(o_orderkey % 6 AS VARCHAR) AS c,
          o_orderkey % 6 AS cn, o_orderkey % 4 AS tc
        FROM orders),
      txt AS (
        SELECT o_orderkey,
          CASE cn
            WHEN 0 THEN 'build up to ' || xs || ' or ' || ys || ' Storeys here'
            WHEN 1 THEN 'Up To ' || xs || ' storeys'
            WHEN 2 THEN 'ranges from ' || xs || ' to ' || ys || ' storeys'
            WHEN 3 THEN xs || ' or ' || ys || ' STOREYS permitted'
            WHEN 4 THEN 'max height ' || xs || ' storeys'
            ELSE 'no height limit' END AS bt,
          CASE tc
            WHEN 0 THEN xs || '.' || c || ' RS' || c || ' - Residential Small Scale'
            WHEN 1 THEN xs || ' A' || c || ' - Agriculture Zone'
            WHEN 2 THEN 'Direct Control Provision'
            ELSE '  ' || xs || '.10 DC1 - Direct Development Control' END AS ft
        FROM src)
      SELECT o_orderkey,
        CASE
          WHEN regexp_extract(bt, '(?i)up\s*to\s*(\d+)\s*or\s*(\d+)\s*storeys', 1) <> ''
            THEN 'Up to ' || regexp_extract(bt, '(?i)up\s*to\s*(\d+)\s*or\s*(\d+)\s*storeys', 1)
              || ' or ' || regexp_extract(bt, '(?i)up\s*to\s*(\d+)\s*or\s*(\d+)\s*storeys', 2)
          WHEN regexp_extract(bt, '(?i)up\s*to\s*(\d+)\s*storeys', 1) <> ''
            THEN 'Up to ' || regexp_extract(bt, '(?i)up\s*to\s*(\d+)\s*storeys', 1)
          WHEN regexp_extract(bt, '(?i)(\d+)\s*to\s*(\d+)\s*storeys', 1) <> ''
            THEN regexp_extract(bt, '(?i)(\d+)\s*to\s*(\d+)\s*storeys', 1)
              || ' to ' || regexp_extract(bt, '(?i)(\d+)\s*to\s*(\d+)\s*storeys', 2)
          WHEN regexp_extract(bt, '(?i)(\d+)\s*or\s*(\d+)\s*storeys', 1) <> ''
            THEN regexp_extract(bt, '(?i)(\d+)\s*or\s*(\d+)\s*storeys', 1)
              || ' or ' || regexp_extract(bt, '(?i)(\d+)\s*or\s*(\d+)\s*storeys', 2)
          WHEN regexp_extract(bt, '(?i)(\d+)\s*storeys', 1) <> ''
            THEN regexp_extract(bt, '(?i)(\d+)\s*storeys', 1)
          ELSE NULL END AS storeys,
        CASE WHEN regexp_extract(ft, '^\s*(\d+(?:\.\d+)?)\s+([A-Z0-9.]+)\s*-\s*(.+)$', 2) <> ''
          THEN regexp_extract(ft, '^\s*(\d+(?:\.\d+)?)\s+([A-Z0-9.]+)\s*-\s*(.+)$', 1)
          ELSE NULL END AS section,
        CASE WHEN regexp_extract(ft, '^\s*(\d+(?:\.\d+)?)\s+([A-Z0-9.]+)\s*-\s*(.+)$', 2) <> ''
          THEN regexp_extract(ft, '^\s*(\d+(?:\.\d+)?)\s+([A-Z0-9.]+)\s*-\s*(.+)$', 2)
          ELSE ft END AS zone_code,
        CASE WHEN regexp_extract(ft, '^\s*(\d+(?:\.\d+)?)\s+([A-Z0-9.]+)\s*-\s*(.+)$', 2) <> ''
          THEN regexp_extract(ft, '^\s*(\d+(?:\.\d+)?)\s+([A-Z0-9.]+)\s*-\s*(.+)$', 3)
          ELSE ft END AS zone_name
      FROM txt ORDER BY o_orderkey"""))

  /** q54 — the bylaw regulations map end-to-end
    * ([[graft.pipelines.ZoningBylaws.parse]], ref
    * get_edm_zoning_bylaw_data.py:226-250): tracked-variable filter,
    * last-wins duplicate regulation, regulation-over-modifier merge
    * keyed "{zone_code} {modifier_code}", Number of Storeys injected
    * from the purpose cascade. Bylaw-shaped inputs are synthesized from
    * `orders` identically on both engines; the map is rendered as
    * sorted `k=v` entries so DuckDB can certify it without map types.
    * Per-row map work is CPU-heavy, so the single-file local input is
    * spread first (at scale the scan's own file splits provide this);
    * beyond that one spread, nothing shuffles before the presentation
    * sort.
    */
  private val q54 = Q("q54_bylaw_regulations",
    (s, dir) => {
      import graft.pipelines.ZoningBylaws
      val k = col("o_orderkey")
      val xs = (k % 30 + 1).cast("string")
      val c = (k % 6).cast("string")
      def reg(name: Column, value: Column) =
        struct(name.as("name"), value.as("value"))
      val emptyRegs = array().cast("array<struct<name:string,value:string>>")
      val pages = t(s, dir, "orders")
        // the operator's real domain is ~10^3 zone pages, not the full
        // orders table; k%7 keeps every mod-2/3/4/5/6 branch populated
        .filter(k % 7 === 0)
        .repartition(graft.Par.n, col("o_orderkey")).select(
        k.as("o_orderkey"),
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
            array(reg(lit("Floor Area Ratio"), concat(lit("F"), c))))
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
      ZoningBylaws.parse(pages).select(
        col("o_orderkey"),
        col("zone_key"),
        array_join(array_sort(transform(map_entries(col("regulations")),
          e => concat(e.getField("key"), lit("="), e.getField("value")))),
          "|").as("regs"),
        array_join(array_sort(col("permitted_uses")), ",").as("uses"))
        .orderBy(col("o_orderkey"))
    },
    Some("""WITH src AS (
        SELECT o_orderkey AS k,
          CAST(o_orderkey % 30 + 1 AS VARCHAR) AS xs,
          CAST(o_orderkey % 6 AS VARCHAR) AS c
        FROM orders WHERE o_orderkey % 7 = 0)
      SELECT k AS o_orderkey,
        'Z' || k || CASE WHEN k % 2 = 0 THEN ' f' || c ELSE '' END AS zone_key,
        CASE WHEN k % 2 = 0
          THEN 'Floor Area Ratio=F' || c || '|Maximum Height bonus=mh' || c || '|'
          ELSE '' END
        || 'Maximum Height=' || CASE WHEN k % 5 = 0 THEN 'DUP' || xs ELSE xs || 'm' END
        || CASE WHEN k % 3 = 0 THEN '|Number of Storeys=Up to ' || xs
                WHEN k % 3 = 1 THEN '|Number of Storeys=' || xs
                ELSE '' END
        || CASE WHEN k % 2 = 0 THEN '|Site Coverage=sc' || xs ELSE '' END AS regs,
        CASE WHEN k % 4 = 0 THEN NULL ELSE 'a' || xs || ',b' || c END AS uses
      FROM src ORDER BY o_orderkey"""))

  val all: Seq[Q] = Seq(q37, q54)
}
