package graft.sources

import graft.SparkSpec
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types.StructType
import java.nio.file.{Files, Paths}

class SourcesSpec extends SparkSpec {
  import spark.implicits._

  test("jsonTable: schema'd JSONL multi-file scan (the S10 inter-task table)") {
    val dir = Files.createTempDirectory("graft_src").toString
    Files.write(Paths.get(dir, "a.json"),
      "{\"k\":1,\"v\":\"x\"}\n{\"k\":2,\"v\":\"y\"}".getBytes)
    Files.write(Paths.get(dir, "b.json"), "{\"k\":3,\"v\":\"z\"}".getBytes)
    val df = Sources.jsonTable(spark,
      StructType.fromDDL("k long, v string"), s"$dir/*.json")
    assert(df.count() == 3)
    assert(df.schema.fieldNames.toSeq == Seq("k", "v"))
  }

  test("geoJsonFeatures: FeatureCollection explodes to one row per feature") {
    val dir = Files.createTempDirectory("graft_geo").toString
    val geojson = """{"type":"FeatureCollection","features":[
      {"type":"Feature","geometry":{"type":"Point","coordinates":[-113.5,53.5]},
       "properties":{"name":"cafe","kind":"amenity"}},
      {"type":"Feature","geometry":{"type":"Point","coordinates":[-113.6,53.6]},
       "properties":{"name":"shop","kind":"business"}}]}"""
    Files.write(Paths.get(dir, "pois.json"), geojson.getBytes)
    val df = Sources.geoJsonFeatures(spark, s"$dir/pois.json")
    val rows = df.select($"geom_type", $"name", $"kind")
      .as[(String, String, String)].collect().toSet
    assert(rows == Set(("Point", "cafe", "amenity"),
      ("Point", "shop", "business")))
  }

  test("partitioned TableStore writes prune partitions at scan") {
    val dir = Files.createTempDirectory("graft_part").toString
    val ts = new TableStore(spark, dir)
    val df = spark.range(100)
      .withColumn("day", concat(lit("d"), $"id" % 5))
      .withColumn("v", $"id" * 2)
    ts.append("events_p", df, partitionBy = Seq("day"))
    val pruned = ts.read("events_p").filter($"day" === "d3")
    assert(pruned.count() == 20)
    // the filter must land in the scan's PartitionFilters (directory
    // pruning), and the executed scan must touch only day=d3 files
    val scanExec = pruned.queryExecution.executedPlan.collectFirst {
      case f: org.apache.spark.sql.execution.FileSourceScanExec => f
    }.get
    val pf = scanExec.partitionFilters.mkString(";")
    assert(pf.contains("day") && pf.contains("d3"), s"PartitionFilters: $pf")
    val listing = scanExec.selectedPartitions
    assert(listing.totalNumberOfFiles > 0 &&
      listing.totalNumberOfFiles < 20, // 5 days x 4 tasks unpruned
      s"files=${listing.totalNumberOfFiles}")
  }
}
