package graft.sources

import java.nio.file.Files

import graft.SparkSpec
import org.apache.spark.sql.functions._

/** [[TableStore.changesBetween]]: the incremental-consumer read.
  * Appends feed inserts, deletes feed deletes, an update feeds its
  * delete+insert pair, and a pure reorganization (compact) feeds
  * NOTHING — consumers see data changes, never layout changes.
  */
class ChangeFeedSpec extends SparkSpec {
  import spark.implicits._

  private def freshStore() = new TableStore(spark,
    Files.createTempDirectory("graft_cf").toString,
    retainGenerations = 10)

  private def feed(ts: TableStore, from: Long, to: Long)
      : Set[(Long, String, Int, String)] =
    ts.changesBetween("t", from, to)
      .select(col("id").cast("long"), col("name"), col("v").cast("int"),
        col("__change_type"))
      .collect()
      .map(r => (r.getLong(0), r.getString(1), r.getInt(2),
        r.getString(3))).toSet

  test("append → inserts; delete → deletes; compact → EMPTY; upsert update → pair") {
    val ts = freshStore()
    ts.append("t", Seq((1L, "a", 10), (2L, "b", 20)).toDF("id", "name", "v"))
    val g1 = ts.generations("t").last

    ts.append("t", Seq((3L, "c", 30)).toDF("id", "name", "v"))
    val g2 = ts.generations("t").last
    assert(feed(ts, g1, g2) == Set((3L, "c", 30, "insert")))

    ts.deleteByKeys("t", Seq(Tuple1(1L)).toDF("id"), Seq("id"))
    val g3 = ts.generations("t").last
    assert(feed(ts, g2, g3) == Set((1L, "a", 10, "delete")))

    ts.compact("t")
    val g4 = ts.generations("t").last
    assert(feed(ts, g3, g4) == Set.empty,
      "compaction rewrites layout, not data — the feed must be empty")

    // upsert is insert-if-absent: the existing key 2 is SKIPPED (no
    // churn → not in the feed), the new key 4 feeds one insert
    ts.upsert("t", Seq((2L, "b", 25), (4L, "d", 40)).toDF("id", "name", "v"),
      keys = Seq("id"), tieBreak = Seq("v"))
    val g5 = ts.generations("t").last
    assert(feed(ts, g4, g5) == Set((4L, "d", 40, "insert")))

    // spanning feed diffs ENDPOINT inventories only: the net change
    // over g1→g5 (transient states never surface)
    assert(feed(ts, g1, g5) == Set(
      (3L, "c", 30, "insert"),
      (4L, "d", 40, "insert"),
      (1L, "a", 10, "delete")))

    // and the identity span is empty
    assert(feed(ts, g5, g5) == Set.empty)
  }

  test("merge feeds exactly its update pair + its insert") {
    val ts = freshStore()
    ts.append("t", Seq((1L, "a", 10), (2L, "b", 20)).toDF("id", "name", "v"))
    val g1 = ts.generations("t").last
    ts.merge("t", Seq((2L, "b", 99), (7L, "g", 70)).toDF("id", "name", "v"),
      "id", TableStore.MergeUpdate(Seq("v")))
    val g2 = ts.generations("t").last
    assert(feed(ts, g1, g2) == Set(
      (2L, "b", 20, "delete"), (2L, "b", 99, "insert"),
      (7L, "g", 70, "insert")))
  }

  test("multiset semantics: dropping 2 of 3 duplicate copies feeds 2 deletes") {
    val ts = freshStore()
    val trip = Seq((1L, "d", 1), (1L, "d", 1), (1L, "d", 1))
      .toDF("id", "name", "v")
    ts.append("t", trip)
    val g1 = ts.generations("t").last
    // rewrite the table down to ONE copy
    ts.rewrite("t", trip.limit(1))
    val g2 = ts.generations("t").last
    val f = ts.changesBetween("t", g1, g2)
      .groupBy(col("__change_type")).count()
      .as[(String, Long)].collect().toMap
    assert(f == Map("delete" -> 2L), f.toString)
  }

  test("guards: future generation and unretained generation fail loudly") {
    val ts = freshStore()
    ts.append("t", Seq((1L, "a", 10)).toDF("id", "name", "v"))
    val g = ts.generations("t").last
    val e = intercept[IllegalArgumentException] {
      ts.changesBetween("t", g, g + 5)
    }
    assert(e.getMessage.contains("future"), e.getMessage)
    // a store built WITHOUT retention records no inventories
    val bare = new TableStore(spark,
      Files.createTempDirectory("graft_cf0").toString)
    bare.append("t", Seq((1L, "a", 10)).toDF("id", "name", "v"))
    bare.append("t", Seq((2L, "b", 20)).toDF("id", "name", "v"))
    val cur = bare.generations("t").last
    val e2 = intercept[IllegalArgumentException] {
      bare.changesBetween("t", cur - 1, cur).collect()
    }
    assert(e2.getMessage.contains("not retained"), e2.getMessage)
  }
}
