package graft.pipelines

import graft.SparkSpec
import org.apache.spark.sql.functions._

class EnrichmentSpec extends SparkSpec {
  import spark.implicits._

  test("promptTemplate fills placeholders from bound columns") {
    val df = Seq(("Tower A", 12), ("Lot 7", 3)).toDF("title", "storeys")
    val p = Enrichment.promptTemplate(
      "Summarize {title} ({storeys} storeys): {title}",
      Map("title" -> $"title", "storeys" -> $"storeys"))
    val out = df.select(p.as("prompt")).as[String].collect()
    assert(out(0) == "Summarize Tower A (12 storeys): Tower A")
    assert(out(1) == "Summarize Lot 7 (3 storeys): Lot 7")
  }

  test("promptTemplate: null binding renders empty, not null prompt") {
    val df = Seq((Some("x"), None: Option[String])).toDF("a", "b")
    val out = df.select(Enrichment.promptTemplate("[{a}|{b}]",
      Map("a" -> $"a", "b" -> $"b")).as("p")).as[String].head()
    assert(out == "[x|]")
  }

  test("promptTemplate rejects unbound placeholders at build time") {
    intercept[IllegalArgumentException] {
      Enrichment.promptTemplate("{missing}", Map.empty)
    }
  }

  test("promptTemplate with no placeholders is the literal template") {
    val df = Seq(1).toDF("x")
    assert(df.select(Enrichment.promptTemplate("plain text", Map.empty))
      .as[String].head() == "plain text")
  }
}
