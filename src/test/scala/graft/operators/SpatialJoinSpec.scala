package graft.operators

import graft.SparkSpec
import org.apache.spark.sql.functions._

class SpatialJoinSpec extends SparkSpec {
  import spark.implicits._

  test("radiusJoin matches brute force on a known cloud") {
    val a = (1 to 50).map(i => (i.toLong, (i * 13 % 40) / 4.0,
      (i * 29 % 40) / 4.0)).toDF("aid", "ax", "ay")
    val b = (1 to 30).map(i => (i.toLong, (i * 17 % 40) / 4.0,
      (i * 7 % 40) / 4.0)).toDF("bid", "bx", "by")
    val fast = SpatialJoin.radiusJoin(a, b, $"ax", $"ay", $"bx", $"by", 1.5)
      .select($"aid", $"bid").as[(Long, Long)].collect().toSet
    val brute = a.crossJoin(b)
      .filter(($"ax" - $"bx") * ($"ax" - $"bx") +
        ($"ay" - $"by") * ($"ay" - $"by") <= 1.5 * 1.5)
      .select($"aid", $"bid").as[(Long, Long)].collect().toSet
    assert(fast == brute)
    assert(brute.nonEmpty)
  }

  test("radiusJoin emits each qualifying pair exactly once") {
    val a = Seq((1L, 0.0, 0.0)).toDF("aid", "ax", "ay")
    val b = Seq((1L, 0.1, 0.1)).toDF("bid", "bx", "by")
    assert(SpatialJoin.radiusJoin(a, b, $"ax", $"ay", $"bx", $"by", 1.0)
      .count() == 1)
  }

  test("pointInPolygonJoin: concave polygon handled by ray casting") {
    // L-shaped (concave) polygon: unit square minus its top-right quadrant
    val ring = Seq(
      (0.0, 0.0), (1.0, 0.0), (1.0, 0.5), (0.5, 0.5), (0.5, 1.0), (0.0, 1.0))
    val polys = Seq((1L, ring)).toDF("poly_id", "ringRaw")
      .withColumn("ring",
        expr("transform(ringRaw, p -> struct(p._1 as x, p._2 as y))"))
      .select($"poly_id", $"ring")
    val pts = Seq((1L, 0.25, 0.25), (2L, 0.75, 0.75), (3L, 0.75, 0.25),
      (4L, 1.5, 0.5)).toDF("pid", "px", "py")
    val in = SpatialJoin.pointInPolygonJoin(pts, polys, $"px", $"py", "ring")
      .select($"pid").as[Long].collect().toSet
    assert(in == Set(1L, 3L)) // 2 is in the notch, 4 outside bbox
    // the bbox prefilter is the native one-pass kernel: no interpreted
    // lambda (HOF) anywhere in the join plan
    val plan = SpatialJoin.pointInPolygonJoin(pts, polys.select($"poly_id",
      $"ring"), $"px", $"py", "ring")
      .queryExecution.executedPlan.toString
    assert(!plan.contains("lambdafunction"), plan)
  }
}

class TableStoreSpec extends SparkSpec {
  import spark.implicits._
  import graft.sources.TableStore

  private def withStore(f: TableStore => Unit): Unit = {
    val dir = java.nio.file.Files.createTempDirectory("graft_ts").toString
    f(new TableStore(spark, dir))
  }

  test("append then read round-trips") { withStore { ts =>
    ts.append("t", Seq((1, "a"), (2, "b")).toDF("k", "v"))
    assert(ts.read("t").count() == 2)
  }}

  test("upsert = ON CONFLICT DO NOTHING, idempotent") { withStore { ts =>
    ts.upsert("t", Seq((1, "a"), (2, "b")).toDF("k", "v"), Seq("k"), Seq("v"))
    ts.upsert("t", Seq((2, "B"), (3, "c")).toDF("k", "v"), Seq("k"), Seq("v"))
    ts.upsert("t", Seq((2, "B"), (3, "c")).toDF("k", "v"), Seq("k"), Seq("v"))
    val out = ts.read("t").orderBy($"k").as[(Int, String)].collect().toSeq
    assert(out == Seq((1, "a"), (2, "b"), (3, "c")))
  }}

  test("deleteByKeys removes matching rows") { withStore { ts =>
    ts.append("t", Seq((1, "a"), (2, "b"), (3, "c")).toDF("k", "v"))
    ts.deleteByKeys("t", Seq(Tuple1(2)).toDF("k"), Seq("k"))
    assert(ts.read("t").select($"k").as[Int].collect().toSet == Set(1, 3))
  }}

  test("updateFlag flips only keyed rows") { withStore { ts =>
    ts.append("t", Seq((1, 0), (2, 0), (3, 0)).toDF("k", "done"))
    ts.updateFlag("t", Seq(Tuple1(1), Tuple1(3)).toDF("k"), Seq("k"),
      "done", 1)
    val out = ts.read("t").orderBy($"k").as[(Int, Int)].collect().toSeq
    assert(out == Seq((1, 1), (2, 0), (3, 1)))
  }}
}
