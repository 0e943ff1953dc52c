package graft.sources

import graft.SparkSpec
import org.apache.spark.sql.functions._
import java.nio.file.Files

/** Z-order clustering × file skipping: after `compactZOrder(x, y)` +
  * `analyze(x, y)`, a range predicate on EITHER dimension prunes
  * files; after a plain linear `compact(sortBy = x)`, only x prunes
  * and a y predicate must scan everything — the reason Z-order exists.
  */
class ZOrderSpec extends SparkSpec {
  import spark.implicits._

  private def freshStore() =
    new TableStore(spark, Files.createTempDirectory("graft_zo").toString)

  private def grid = spark.range(10000)
    .select(($"id" % 100).cast("long").as("x"),
      ($"id" / 100).cast("long").as("y"),
      $"id".as("payload"))

  test("compactZOrder: both dimensions prune; linear sort only one") {
    val ts = freshStore()
    ts.rewrite("t", grid.repartition(4))
    ts.compactZOrder("t", Seq("x", "y"), targetFiles = 16)
    val total = ts.read("t").inputFiles.length
    assert(total == 16)
    // permutation: identical contents
    assert(ts.read("t").as[(Long, Long, Long)].collect().sorted.toSeq ==
      grid.as[(Long, Long, Long)].collect().sorted.toSeq)
    ts.analyze("t", Seq("x", "y"))
    val xKept = ts.readWhere("t", $"x" >= 10 && $"x" <= 15)
    val yKept = ts.readWhere("t", $"y" >= 50 && $"y" <= 55)
    assert(xKept.inputFiles.length <= total / 2,
      s"x pruned to ${xKept.inputFiles.length} of $total")
    assert(yKept.inputFiles.length <= total / 2,
      s"y pruned to ${yKept.inputFiles.length} of $total")
    // pruned reads stay exact
    assert(xKept.count() == 6 * 100 && yKept.count() == 6 * 100)
    assert(xKept.select(sum($"payload")).as[Long].head() ==
      grid.filter($"x".between(10, 15)).select(sum($"payload"))
        .as[Long].head())

    // CONTRAST: linear clustering on x leaves y unprunable
    val lin = freshStore()
    lin.rewrite("t", grid.repartitionByRange(16, $"x")
      .sortWithinPartitions($"x"))
    lin.analyze("t", Seq("x", "y"))
    assert(lin.readWhere("t", $"x" >= 10 && $"x" <= 15)
      .inputFiles.length <= 3)
    assert(lin.readWhere("t", $"y" >= 50 && $"y" <= 55)
      .inputFiles.length == 16) // every file spans the full y domain
  }

  test("compactZOrder: deterministic, null and constant dims safe") {
    val ts = freshStore()
    ts.rewrite("t", spark.range(100)
      .select($"id".as("x"),
        when($"id" % 7 === 0, lit(null).cast("long"))
          .otherwise($"id" * 2).as("y"),
        lit(5L).as("c")))
    // constant + nullable dimensions must not throw, contents preserved
    ts.compactZOrder("t", Seq("x", "y", "c"), targetFiles = 4)
    val got = ts.read("t").as[(Long, Option[Long], Long)].collect().toSet
    assert(got.size == 100 && got.count(_._2.isEmpty) == 15)
  }

  test("compactZOrder on a partitioned table clusters within partitions") {
    val ts = freshStore()
    ts.append("t", grid.withColumn("day", concat(lit("d"), $"x" % 2)),
      partitionBy = Seq("day"))
    ts.compactZOrder("t", Seq("x", "y"), targetFiles = 4,
      partitionCols = Seq("day"))
    assert(ts.read("t").groupBy("day").count().as[(String, Long)]
      .collect().toMap == Map("d0" -> 5000L, "d1" -> 5000L))
  }
}
