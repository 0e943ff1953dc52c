package graft.functions

import org.apache.spark.sql.Column
import org.apache.spark.sql.functions._

/** Zoning-bylaw text parsing (SURVEY.md §2.7 F13/F14) — the reference's
  * scraped-bylaw scalar surface re-expressed as codegen'd column algebra:
  *
  *  - [[storeysSummary]]: the 5-case building-height regex cascade
  *    (get_edm_zoning_bylaw_data.py:80-116) — first matching case wins,
  *    exactly in reference order, null when no case matches.
  *  - [[zoneTitleParts]]: the "3.16 A6 - River Crossing Zone" title split
  *    (get_edm_zoning_bylaw_data.py:254-264) with the reference's
  *    fallback (section null, code = name = the unparsed title).
  *
  * Pure `regexp_extract`/`when` chains: Catalyst evaluates them inside
  * whole-stage codegen, and identical RE2-compatible patterns run under
  * DuckDB for the oracle.
  */
object ZoningFunctions {

  private val upToOr  = "(?i)up\\s*to\\s*(\\d+)\\s*or\\s*(\\d+)\\s*storeys"
  private val upTo    = "(?i)up\\s*to\\s*(\\d+)\\s*storeys"
  private val xToY    = "(?i)(\\d+)\\s*to\\s*(\\d+)\\s*storeys"
  private val xOrY    = "(?i)(\\d+)\\s*or\\s*(\\d+)\\s*storeys"
  private val single  = "(?i)(\\d+)\\s*storeys"

  /** F13 — storeys summary string from free-form bylaw height text:
    * "Up to X or Y" | "Up to X" | "X to Y" | "X or Y" | "X" | null.
    */
  def storeysSummary(text: Column): Column = {
    def g(pat: String, i: Int): Column = regexp_extract(text, pat, i)
    when(g(upToOr, 1) =!= "",
        concat(lit("Up to "), g(upToOr, 1), lit(" or "), g(upToOr, 2)))
      .when(g(upTo, 1) =!= "", concat(lit("Up to "), g(upTo, 1)))
      .when(g(xToY, 1) =!= "",
        concat(g(xToY, 1), lit(" to "), g(xToY, 2)))
      .when(g(xOrY, 1) =!= "",
        concat(g(xOrY, 1), lit(" or "), g(xOrY, 2)))
      .when(g(single, 1) =!= "", g(single, 1))
      .otherwise(lit(null).cast("string"))
  }

  private val titlePat = "^\\s*(\\d+(?:\\.\\d+)?)\\s+([A-Z0-9.]+)\\s*-\\s*(.+)$"

  /** F14 — zone title split into struct(section, zone_code, zone_name);
    * unparsable titles fall back to (null, title, title) as in the
    * reference.
    */
  def zoneTitleParts(title: Column): Column = {
    val matched = regexp_extract(title, titlePat, 2) =!= ""
    when(matched, struct(
        regexp_extract(title, titlePat, 1).as("section"),
        regexp_extract(title, titlePat, 2).as("zone_code"),
        regexp_extract(title, titlePat, 3).as("zone_name")))
      .otherwise(struct(
        lit(null).cast("string").as("section"),
        title.as("zone_code"),
        title.as("zone_name")))
  }
}
