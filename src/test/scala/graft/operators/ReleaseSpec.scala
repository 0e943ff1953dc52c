package graft.operators

import java.nio.file.Files

import graft.SparkSpec
import graft.sources.TableStore
import org.apache.spark.sql.functions._

/** Release manifests ([[Release]]): pinned reads must reproduce the
  * release-time snapshot across churn, names are immutable, and aged
  * pins are reported rather than silently misread.
  */
class ReleaseSpec extends SparkSpec {
  import spark.implicits._

  test("record/readPinned reproduce the release-time snapshot across churn") {
    val store = new TableStore(spark,
      Files.createTempDirectory("graft_rel").toString,
      retainGenerations = 10)
    store.append("corpus", Seq((1L, "alpha"), (2L, "beta"))
      .toDF("doc_id", "text"))
    store.append("scores", Seq((1L, 10L), (2L, 20L))
      .toDF("doc_id", "score"))
    Release.record(store, "releases", "r1", Seq("corpus", "scores"),
      meta = Map("cut" -> "2026-08-15"))
    val before = store.read("corpus")
      .as[(Long, String)].collect().toSet
    // churn both tables after the cut
    store.append("corpus", Seq((3L, "gamma")).toDF("doc_id", "text"))
    store.deleteByKeys("scores", Seq(1L).toDF("doc_id"), Seq("doc_id"))
    assert(Release.readPinned(store, "releases", "r1", "corpus")
      .as[(Long, String)].collect().toSet == before)
    assert(Release.readPinned(store, "releases", "r1", "scores")
      .as[(Long, Long)].collect().toSet == Set((1L, 10L), (2L, 20L)))
    // pins round-trip; everything still reproducible
    assert(Release.pins(store, "releases", "r1").keySet ==
      Set("corpus", "scores"))
    assert(Release.unreproducible(store, "releases", "r1").isEmpty)
    // a second release pins the NEW heads and coexists
    Release.record(store, "releases", "r2", Seq("corpus", "scores"))
    assert(Release.readPinned(store, "releases", "r2", "corpus")
      .count() == 3)
    assert(Release.readPinned(store, "releases", "r1", "corpus")
      .count() == 2)
    // immutability + loud lookups
    intercept[IllegalArgumentException] {
      Release.record(store, "releases", "r1", Seq("corpus"))
    }
    intercept[IllegalArgumentException] {
      Release.pins(store, "releases", "nope")
    }
    intercept[IllegalArgumentException] {
      Release.readPinned(store, "releases", "r1", "unpinned_table")
    }
    // explicit pins (from a build's returned generation) are honored
    val g = store.generations("corpus").head
    Release.record(store, "releases", "r3", Seq("corpus"),
      explicitPins = Map("corpus" -> g))
    assert(Release.pins(store, "releases", "r3")("corpus") == g)
  }

  test("release pin <-> named tag round-trip serves the same bytes (q149's shape)") {
    val store = new TableStore(spark,
      Files.createTempDirectory("graft_rel_tag").toString,
      retainGenerations = 10)
    store.append("corpus", Seq((1L, "alpha"), (2L, "beta"))
      .toDF("doc_id", "text"))
    Release.record(store, "releases", "r1", Seq("corpus"))
    // tag the release's corpus pin by name, then churn the table:
    // readTag must keep serving the PINNED snapshot, bit-identical
    // to readPinned — the q149 gate's release-r1 wiring
    val pinned = Release.pins(store, "releases", "r1")("corpus")
    store.tag("corpus", "release-r1", Some(pinned))
    store.append("corpus", Seq((3L, "gamma")).toDF("doc_id", "text"))
    assert(store.tagGeneration("corpus", "release-r1")
      .contains(pinned))
    assert(store.readTag("corpus", "release-r1")
      .as[(Long, String)].collect().toSet ==
      Release.readPinned(store, "releases", "r1", "corpus")
        .as[(Long, String)].collect().toSet)
    assert(store.readTag("corpus", "release-r1").count() == 2)
    assert(store.read("corpus").count() == 3)
  }

  test("aged-out pins are reported, not silently misread") {
    val store = new TableStore(spark,
      Files.createTempDirectory("graft_rel2").toString,
      retainGenerations = 1)
    store.append("t", Seq((1L, "a")).toDF("k", "v"))
    Release.record(store, "releases", "r1", Seq("t"))
    // enough churn to age the pinned generation out of retention
    (0 until 3).foreach { i =>
      store.append("t", Seq((10L + i, "x")).toDF("k", "v"))
    }
    assert(Release.unreproducible(store, "releases", "r1") == Seq("t"))
  }
}
