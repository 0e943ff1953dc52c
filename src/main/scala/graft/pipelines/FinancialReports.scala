package graft.pipelines

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

/** REIT financial-report metric extraction (REIT_metrics.py:109-243) as
  * a Spark pipeline: PDF binary → per-page text rows → per-page keyword
  * containment (F25) per metric → per-metric sorted page sets (A6) →
  * extraction prompt templating (F26) → metric value extraction (U5
  * stub) → missing-metric report.
  *
  * Plan shape: one narrow page explode, one broadcast join against the
  * 10-row metric table, one groupBy — nothing else shuffles, so the
  * pipeline is bounded by the page scan at any corpus size.
  */
final class FinancialReports(spark: SparkSession) {

  import FinancialReports._

  /** PDF → page texts. The container has no PDF codec, so this is the
    * declared deterministic stand-in (same policy as Multimodal's
    * FakeDecoder): the fixture payload is UTF-8 text with form-feed
    * (\f) page separators — what PyMuPDF's get_text stream effectively
    * yields per page (ref create_pdf_subsets_for_metrics,
    * REIT_metrics.py:180-204). Real deployments swap a batched PDF
    * decoder into this seam; the binary-in / exploded-page-rows-out
    * contract and 1-based page numbering are the real interface.
    */
  def pdfPages(reports: DataFrame, idCol: String, pdfCol: String): DataFrame =
    reports
      .select(col(idCol).as("report_id"),
        posexplode(split(decode(col(pdfCol), "UTF-8"), "\f"))
          .as(Seq("page_idx", "page_text")))
      .withColumn("page_num", (col("page_idx") + 1).cast("int"))
      .drop("page_idx")

  /** Pages × metrics keyword containment (ref :186-194): a page hits a
    * metric when any key term appears in its lowercased text. The
    * metric table is 10 broadcast rows, so this is a narrow pass.
    */
  def metricHits(pages: DataFrame): DataFrame =
    pages.crossJoin(broadcast(metricsTable(spark)))
      .withColumn("hit",
        exists(col("key_terms"),
          t => lower(col("page_text")).contains(t)))
      .filter(col("hit")).drop("hit")

  /** Per-metric 1-based page sets, sorted ascending (ref :203-227). */
  def metricPages(pages: DataFrame): DataFrame =
    metricHits(pages)
      .groupBy(col("report_id"), col("metric"))
      .agg(sort_array(collect_set(col("page_num"))).as("pages"))

  /** Extraction prompt per found metric (F26 templating,
    * ref generate_prompts :230-242).
    */
  def prompts(found: DataFrame): DataFrame =
    found.join(broadcast(metricsTable(spark)), Seq("metric"))
      .select(col("report_id"), col("metric"),
        concat(
          lit("Extract the following metric from the attached report.\n"),
          col("metric_name"), lit(": "), col("prompt_description"),
          lit("\nRespond with JSON {"), col("metric"), lit(": "),
          col("metric_format"), lit("}")).as("prompt"))

  /** Metrics a report's pages never mention (ref missing_metrics
    * :239-241): anti-join of the full metric list against the found
    * set, per report.
    */
  def missingMetrics(pages: DataFrame): DataFrame =
    pages.select(col("report_id")).distinct()
      .crossJoin(broadcast(metricsTable(spark).select(col("metric"))))
      .join(metricPages(pages), Seq("report_id", "metric"), "left_anti")

  /** Metric value extraction — the LLM call's deterministic stand-in
    * (U5): first numeric token on the metric's earliest hit page,
    * commas stripped. Swappable seam; keeps the pipeline end-to-end
    * testable offline.
    */
  def extractMetrics(pages: DataFrame): DataFrame =
    metricHits(pages)
      .withColumn("val_str",
        regexp_replace(
          regexp_extract(col("page_text"), "([0-9][0-9,.]*)", 1), ",", ""))
      .filter(col("val_str") =!= "")
      .groupBy(col("report_id"), col("metric"))
      .agg(min_by(col("val_str"), col("page_num")).as("first_val"))
      .withColumn("extracted_value", col("first_val").cast("double"))
      .drop("first_val")

  /** Full run: (report_id, metric, pages, prompt, extracted_value).
    * The page explode feeds three consumers — persist it once so the
    * PDF decode + explode doesn't run per branch (recomputable lineage;
    * this is a pure read path, unlike the flag-rewrite pipelines that
    * need a localCheckpoint barrier against their own table rewrite).
    */
  def run(reports: DataFrame, idCol: String, pdfCol: String): DataFrame = {
    val pages = pdfPages(reports, idCol, pdfCol).persist()
    val perMetric = metricPages(pages).persist()
    perMetric
      .join(prompts(perMetric), Seq("report_id", "metric"))
      .join(extractMetrics(pages), Seq("report_id", "metric"), "left")
  }
}

object FinancialReports {

  /** The reference's metric configuration (REIT_metrics.py:110-172),
    * re-typed as data: (metric, display name, lowercase key terms,
    * format).
    */
  private val metrics: Seq[(String, String, Seq[String], String, String)] = Seq(
    ("debt_balance", "Debt Balance", Seq("debt", "liabilities"), "number",
      "Total debt obligations of the company."),
    ("net_income", "Net Income (or loss)",
      Seq("net income", "net operating income", "noi"), "number",
      "The company's total profit or loss after all expenses."),
    ("funds_from_operations", "Funds From Operations (FFO)",
      Seq("funds from operations", "ffo"), "number",
      "Net income adjusted for non-cash items."),
    ("adjusted_funds_from_operations", "Adjusted Funds From Operations (AFFO)",
      Seq("adjusted funds", "affo"), "number",
      "FFO further adjusted for capital expenditures and other relevant items."),
    ("net_asset_value", "Net Asset Value (NAV)",
      Seq("net asset value", "nav"), "number",
      "The total value of assets minus liabilities."),
    ("ebitda", "EBITDA", Seq("ebitda"), "number",
      "Earnings Before Interest, Taxes, Depreciation, and Amortization."),
    ("occupancy_rate", "Occupancy", Seq("occupancy"), "percentage",
      "The percentage of rentable space currently leased compared to total available space."),
    ("same_property_noi", "Same Property NOI",
      Seq("same property", "same asset"), "number",
      "The operating income from properties held in both the current and prior periods, excluding new acquisitions or developments."),
    ("investment_in_acquisitions", "Investment in Acquisitions",
      Seq("acquisitions"), "number",
      "Capital spent on purchasing new properties."),
    ("investment_in_development", "Investment in Development",
      Seq("development"), "number",
      "Capital allocated for constructing or improving assets."))

  def metricsTable(spark: SparkSession): DataFrame = {
    import spark.implicits._
    metrics.toDF("metric", "metric_name", "key_terms", "metric_format",
      "prompt_description")
  }
}
