package graft.streaming

import graft.SparkSpec
import org.apache.spark.sql.types.StructType
import java.nio.file.{Files, Paths}
import org.apache.spark.sql.functions.col

class StreamsSpec extends SparkSpec {
  import spark.implicits._

  private val schema = StructType.fromDDL(
    "event_id long, ts timestamp, user_id long, event_type string, value double")

  private def writeBatch(dir: String, name: String, rows: Seq[String]): Unit =
    Files.write(Paths.get(dir, name),
      rows.mkString("\n").getBytes("UTF-8"))

  test("windowed counts finalize as the watermark advances across AvailableNow runs") {
    val in = Files.createTempDirectory("graft_stream_in").toString
    val out = Files.createTempDirectory("graft_stream_out").toString
    val ckpt = Files.createTempDirectory("graft_stream_ckpt").toString

    writeBatch(in, "b1.json", Seq(
      """{"event_id":1,"ts":"2026-01-01T00:01:00Z","user_id":1,"event_type":"click","value":1.0}""",
      """{"event_id":2,"ts":"2026-01-01T00:02:00Z","user_id":2,"event_type":"click","value":2.0}""",
      """{"event_id":3,"ts":"2026-01-01T00:07:00Z","user_id":1,"event_type":"view","value":3.0}"""))
    def run(): Unit = Streams.runAvailableNow(
      Streams.windowedEventCounts(
        Streams.jsonStream(spark, schema, in),
        "ts", "event_type", "5 minutes", "1 minute"), out, ckpt)
    run()
    // second batch far enough in event time to close the earlier windows
    writeBatch(in, "b2.json", Seq(
      """{"event_id":4,"ts":"2026-01-01T01:00:00Z","user_id":3,"event_type":"click","value":4.0}"""))
    run()
    val res = spark.read.schema(StructType.fromDDL(
      "window_start timestamp, event_type string, n long, sum_value double"))
      .parquet(out)
      .select($"event_type", $"n", $"sum_value")
      .as[(String, Long, Double)].collect().toSet
    assert(res.contains(("click", 2L, 3.0))) // 00:00-00:05 window closed
    assert(res.contains(("view", 1L, 3.0)))  // 00:05-00:10 window closed
  }

  test("container-header decode runs on a stream (typed mapPartitions, no rdd)") {
    import graft.operators.Multimodal
    val in = Files.createTempDirectory("graft_hdr_in").toString
    val out = Files.createTempDirectory("graft_hdr_out").toString
    val ckpt = Files.createTempDirectory("graft_hdr_ckpt").toString
    Seq((1L, Multimodal.ImageBytes.png(12, 34)),
        (2L, Multimodal.ImageBytes.jpeg(56, 78)),
        (3L, Array[Byte](0, 1, 2)))
      .toDF("doc_id", "payload").write.mode("overwrite").parquet(in)
    val stream = spark.readStream
      .schema(StructType.fromDDL("doc_id long, payload binary"))
      .parquet(in)
    assert(stream.isStreaming)
    Streams.runAvailableNow(
      Multimodal.imageHeaders(stream, "doc_id", "payload"), out, ckpt)
    val res = spark.read.parquet(out).orderBy($"doc_id").collect()
    assert(res.length == 3)
    assert(res(0).getAs[String]("format") == "png" &&
      res(0).getAs[Int]("width") == 12)
    assert(res(1).getAs[String]("format") == "jpeg" &&
      res(1).getAs[Int]("height") == 78)
    assert(!res(2).getAs[Boolean]("ok"))
  }

  test("streaming dedup keeps first row per key within watermark") {
    val in = Files.createTempDirectory("graft_dedup_in").toString
    val out = Files.createTempDirectory("graft_dedup_out").toString
    val ckpt = Files.createTempDirectory("graft_dedup_ckpt").toString
    writeBatch(in, "b1.json", Seq(
      """{"event_id":1,"ts":"2026-01-01T00:01:00Z","user_id":1,"event_type":"click","value":1.0}""",
      """{"event_id":1,"ts":"2026-01-01T00:01:30Z","user_id":1,"event_type":"click","value":9.9}""",
      """{"event_id":2,"ts":"2026-01-01T00:02:00Z","user_id":2,"event_type":"view","value":2.0}"""))
    Streams.runAvailableNow(
      Streams.dedupStream(Streams.jsonStream(spark, schema, in),
        "ts", "10 minutes", Seq("event_id")), out, ckpt)
    val res = spark.read.schema(schema).parquet(out)
      .select($"event_id", $"value").as[(Long, Double)].collect().toSet
    assert(res == Set((1L, 1.0), (2L, 2.0)))
  }

  test("curation composes onto a stream: quality gate + dedup, incremental") {
    val in = Files.createTempDirectory("graft_cur_in").toString
    val out = Files.createTempDirectory("graft_cur_out").toString
    val ckpt = Files.createTempDirectory("graft_cur_ckpt").toString
    val docSchema = StructType.fromDDL(
      "doc_id long, ts timestamp, text string")
    val good = ("the quality of the data is good and " * 8) +
      "it works with that for this test run"
    def row(id: Long, t: String, text: String) =
      s"""{"doc_id":$id,"ts":"$t","text":"$text"}"""
    writeBatch(in, "b1.json", Seq(
      row(1, "2026-01-01T00:01:00Z", good),
      row(2, "2026-01-01T00:02:00Z", "too short"),   // fails word count
      row(3, "2026-01-01T00:03:00Z", good)))          // dup of 1 by text
    def run(): Unit = Streams.runAvailableNow(
      Streams.corpusIngest(
        Streams.jsonStream(spark, docSchema, in),
        "ts", "10 minutes", "text"),
      out, ckpt)
    run()
    // a later batch re-sends the same content: state drops it
    writeBatch(in, "b2.json", Seq(
      row(4, "2026-01-01T00:04:00Z", good)))
    run()
    val ids = spark.read.schema(StructType.fromDDL(
      "doc_id long, ts timestamp, text string, fp string"))
      .parquet(out).select($"doc_id").as[Long].collect().toSet
    assert(ids == Set(1L)) // 2 gated out; 3 and 4 dedup'd against 1
  }

  test("session windows merge within gap and finalize past the watermark") {
    val in = Files.createTempDirectory("graft_sess_in").toString
    val out = Files.createTempDirectory("graft_sess_out").toString
    val ckpt = Files.createTempDirectory("graft_sess_ckpt").toString
    // user 1: events 00:01 and 00:04 (gap 3m < 5m -> one session);
    // user 2: 00:01 and 00:20 (gap 19m -> two sessions)
    writeBatch(in, "b1.json", Seq(
      """{"event_id":1,"ts":"2026-01-01T00:01:00Z","user_id":1,"event_type":"click","value":1.0}""",
      """{"event_id":2,"ts":"2026-01-01T00:04:00Z","user_id":1,"event_type":"click","value":2.0}""",
      """{"event_id":3,"ts":"2026-01-01T00:01:00Z","user_id":2,"event_type":"view","value":3.0}""",
      """{"event_id":4,"ts":"2026-01-01T00:20:00Z","user_id":2,"event_type":"view","value":4.0}"""))
    def run(): Unit = Streams.runAvailableNow(
      Streams.sessionStats(Streams.jsonStream(spark, schema, in),
        "ts", "user_id", gap = "5 minutes", watermark = "1 minute"), out, ckpt)
    run()
    // advance event time far enough to close all earlier sessions
    writeBatch(in, "b2.json", Seq(
      """{"event_id":5,"ts":"2026-01-01T02:00:00Z","user_id":3,"event_type":"click","value":5.0}"""))
    run()
    val res = spark.read.schema(StructType.fromDDL(
      "session_start timestamp, session_end timestamp, user_id long, n_events long, sum_value double"))
      .parquet(out)
      .select($"user_id", $"n_events", $"sum_value")
      .as[(Long, Long, Double)].collect().toSet
    assert(res.contains((1L, 2L, 3.0))) // merged into one session
    assert(res.contains((2L, 1L, 3.0)) && res.contains((2L, 1L, 4.0)))
  }

  test("weightedReservoir converges to the batch sample across micro-batches") {
    import graft.operators.Sampling
    val in = Files.createTempDirectory("graft_wrs_in").toString
    val out = Files.createTempDirectory("graft_wrs_out").toString
    val ckpt = Files.createTempDirectory("graft_wrs_ckpt").toString
    val sch = StructType.fromDDL("id long, src string, w double")
    // two arbitrary splits of one corpus; batch twin sees the union
    val b1 = (0L until 40L).map(i => (i, s"s${i % 2}", 1.0 + (i % 7)))
    val b2 = (40L until 90L).map(i => (i, s"s${i % 2}", 1.0 + (i % 7)))
    def js(rows: Seq[(Long, String, Double)]) =
      rows.map(r => s"""{"id":${r._1},"src":"${r._2}","w":${r._3}}""")
    def run(): Unit = Streams.runAvailableNow(
      Streams.weightedReservoir(
        spark.readStream.schema(sch).json(in), "id", "w", "src",
        k = 5, salt = "wrs"), out, ckpt)
    writeBatch(in, "b1.json", js(b1))
    run()
    writeBatch(in, "b2.json", js(b2))
    run()
    val snaps = spark.read.parquet(out)
    // final snapshot per stratum = max ver
    val latest = snaps.groupBy($"stratum")
      .agg(org.apache.spark.sql.functions.max($"ver").as("ver"))
    val got = snaps.join(latest, Seq("stratum", "ver"))
      .select($"id", $"stratum", $"wkey", $"rk")
      .as[(Long, String, Long, Long)].collect().toSet
    val expect = Sampling.weightedTopK(
        (b1 ++ b2).toDF("id", "src", "w"), "id", "w", 5, "wrs",
        strataCol = Some("src"))
      .select($"id", $"src", $"wkey", $"rk")
      .as[(Long, String, Long, Long)].collect().toSet
    assert(got == expect)
    // both strata emitted in both batches: ver reached 2
    assert(latest.select($"ver").as[Long].collect().forall(_ == 2L))
  }

  test("weightedReservoir: re-delivered id with CHANGED weight keeps one entry (max key)") {
    import graft.operators.Sampling
    val in = Files.createTempDirectory("graft_wrs2_in").toString
    val out = Files.createTempDirectory("graft_wrs2_out").toString
    val ckpt = Files.createTempDirectory("graft_wrs2_ckpt").toString
    val sch = StructType.fromDDL("id long, src string, w double")
    // ids 1..4 arrive twice with DIFFERENT weights; k=4 holds them all,
    // so any failure to collapse would surface as duplicate ids
    val b1 = (1L to 4L).map(i => (i, "s", 1.0 + i))
    val b2 = (1L to 4L).map(i => (i, "s", 10.0 + i))
    def js(rows: Seq[(Long, String, Double)]) =
      rows.map(r => s"""{"id":${r._1},"src":"${r._2}","w":${r._3}}""")
    def run(): Unit = Streams.runAvailableNow(
      Streams.weightedReservoir(
        spark.readStream.schema(sch).json(in), "id", "w", "src",
        k = 4, salt = "wrs2"), out, ckpt)
    writeBatch(in, "b1.json", js(b1))
    run()
    writeBatch(in, "b2.json", js(b2))
    run()
    val snaps = spark.read.parquet(out)
    val latest = snaps.groupBy($"stratum")
      .agg(org.apache.spark.sql.functions.max($"ver").as("ver"))
    val got = snaps.join(latest, Seq("stratum", "ver"))
      .select($"id", $"wkey", $"rk").as[(Long, Long, Long)]
      .collect().toSeq.sortBy(_._3)
    // exactly one entry per id
    assert(got.map(_._1).distinct.length == got.length)
    assert(got.map(_._1).toSet == (1L to 4L).toSet)
    // each id carries the MAX of its two content-addressed keys —
    // arrival-order-independent, so batch replay on either single
    // delivery bounds it from below
    val k1 = Sampling.weightedTopK(b1.toDF("id", "src", "w"), "id",
        "w", 4, "wrs2", strataCol = Some("src"))
      .select($"id", $"wkey").as[(Long, Long)].collect().toMap
    val k2 = Sampling.weightedTopK(b2.toDF("id", "src", "w"), "id",
        "w", 4, "wrs2", strataCol = Some("src"))
      .select($"id", $"wkey").as[(Long, Long)].collect().toMap
    got.foreach { case (id, wk, _) =>
      assert(wk == math.max(k1(id), k2(id)),
        s"id $id: expected max(${k1(id)}, ${k2(id)}), got $wk")
    }
    // ranks descend by key with ascending-id ties (explicit Ordering)
    assert(got.sortBy(r => (-r._2, r._1)).map(_._3) == got.map(_._3))
  }

  test("appendStreamExactlyOnce: table holds every batch once across restarts") {
    import graft.sources.TableStore
    val in = Files.createTempDirectory("graft_eos_in").toString
    val ckpt = Files.createTempDirectory("graft_eos_ckpt").toString
    val root = Files.createTempDirectory("graft_eos_store").toString
    val store = new TableStore(spark, root)
    val sch = StructType.fromDDL("id long, v string")
    writeBatch(in, "b1.json",
      Seq("""{"id":1,"v":"a"}""", """{"id":2,"v":"b"}"""))
    def run(): Unit = Streams.appendStreamExactlyOnce(
      Streams.jsonStream(spark, sch, in), store, "t", "ingest", ckpt)
    run()
    assert(store.read("t").count() == 2)
    // drained restart with nothing new: no duplicates
    run()
    assert(store.read("t").count() == 2)
    writeBatch(in, "b2.json", Seq("""{"id":3,"v":"c"}"""))
    run()
    assert(store.read("t").as[(Long, String)].collect().toSet ==
      Set((1L, "a"), (2L, "b"), (3L, "c")))
    // the fence advanced with the stream's delivered batches
    assert(store.lastTxn("t", "ingest") >= 1L)
    // SINK-COMMITTED-BUT-CHECKPOINT-LOST replay: re-deliver batch ids
    // 0..n through the fence directly — every one must be skipped
    (0L to store.lastTxn("t", "ingest")).foreach { b =>
      assert(!store.appendExactlyOnce("t",
        Seq((99L, "dup")).toDF("id", "v"), "ingest", b))
    }
    assert(store.read("t").count() == 3)
  }


  test("expectIngestExactlyOnce: stream split == batch split; replays skip") {
    import graft.sources.TableStore
    import graft.operators.Expectations
    import graft.operators.Expectations.Rule
    val in = Files.createTempDirectory("graft_exp_in").toString
    val ckpt = Files.createTempDirectory("graft_exp_ckpt").toString
    val store =
      new TableStore(spark, Files.createTempDirectory("graft_exp").toString)
    val sch = StructType.fromDDL("id long, lang string, n long")
    val rules = Seq(Rule("n_min", col("n") >= 100L),
      Rule("lang_ok", col("lang").isin("en", "fr")))
    writeBatch(in, "b1.json", Seq(
      """{"id":1,"lang":"en","n":200}""",
      """{"id":2,"lang":"zh","n":200}"""))
    def run(): Unit = Streams.expectIngestExactlyOnce(
      Streams.jsonStream(spark, sch, in), store, "docs", "docs_bad",
      rules, "ing", ckpt)
    run()
    writeBatch(in, "b2.json", Seq(
      """{"id":3,"lang":"en","n":5}""",
      """{"id":4,"lang":"fr","n":300}"""))
    run()
    // drained restart: nothing duplicates
    run()
    assert(store.read("docs").select($"id").as[Long].collect().toSet
      == Set(1L, 4L))
    val bad = store.read("docs_bad")
      .select($"id", $"__violations").as[(Long, String)]
      .collect().toMap
    assert(bad == Map(2L -> "lang_ok", 3L -> "n_min"), bad.toString)
    // differential: the batch split of the union produces the same
    // routing (rules are stateless/row-local)
    val union = Seq((1L, "en", 200L), (2L, "zh", 200L),
      (3L, "en", 5L), (4L, "fr", 300L)).toDF("id", "lang", "n")
    val store2 =
      new TableStore(spark, Files.createTempDirectory("graft_exp2").toString)
    Expectations.appendExpect(store2, "docs", "docs_bad", union, rules)
    assert(store2.read("docs").select($"id").as[Long].collect().toSet
      == store.read("docs").select($"id").as[Long].collect().toSet)
    assert(store2.read("docs_bad")
      .select($"id", $"__violations").as[(Long, String)]
      .collect().toMap == bad)
    // fence replay: both streams' fences reject redelivery
    (0L to store.lastTxn("docs", "ing")).foreach { b =>
      assert(!store.appendExactlyOnce("docs",
        Seq((99L, "en", 999L)).toDF("id", "lang", "n"), "ing", b))
    }
    intercept[IllegalArgumentException] {
      Streams.expectIngestExactlyOnce(
        Streams.jsonStream(spark, sch, in), store, "x", "xq",
        rules, "bad#id", ckpt)
    }
  }

  test("mergeStreamExactlyOnce: CDC upsert folds batches once, replays skipped") {
    import graft.sources.TableStore
    val in = Files.createTempDirectory("graft_cdc_in").toString
    val ckpt = Files.createTempDirectory("graft_cdc_ckpt").toString
    val root = Files.createTempDirectory("graft_cdc_store").toString
    val store = new TableStore(spark, root)
    val sch = StructType.fromDDL("k long, v string")
    def run(): Unit = Streams.mergeStreamExactlyOnce(
      Streams.jsonStream(spark, sch, in), store, "t", "k",
      TableStore.MergeUpdate(Seq("v")), "cdc", ckpt)
    // first batch CREATES the table
    writeBatch(in, "b1.json",
      Seq("""{"k":1,"v":"a"}""", """{"k":2,"v":"b"}"""))
    run()
    assert(store.read("t").as[(Long, String)].collect().toSet ==
      Set((1L, "a"), (2L, "b")))
    // second batch: one update, one insert — folded exactly once
    writeBatch(in, "b2.json",
      Seq("""{"k":2,"v":"B2"}""", """{"k":3,"v":"c"}"""))
    run()
    assert(store.read("t").as[(Long, String)].collect().toSet ==
      Set((1L, "a"), (2L, "B2"), (3L, "c")))
    // drained restart: no re-application
    run()
    assert(store.read("t").count() == 3)
    // SINK-COMMITTED-BUT-CHECKPOINT-LOST replay through the fence:
    // every delivered batch id skips with -1 and the table is untouched
    (0L to store.lastTxn("t", "cdc")).foreach { b =>
      assert(store.merge("t", Seq((2L, "dup")).toDF("k", "v"), "k",
        TableStore.MergeUpdate(Seq("v")), txn = Some("cdc" -> b)) == -1L)
    }
    assert(store.read("t").as[(Long, String)].collect().toSet ==
      Set((1L, "a"), (2L, "B2"), (3L, "c")))
  }

  test("lexIndexMaintain: streamed CDC keeps the inverted index == full rebuild") {
    import graft.sources.TableStore
    import graft.operators.LexIndex
    val in = Files.createTempDirectory("graft_lexm_in").toString
    val ckpt = Files.createTempDirectory("graft_lexm_ckpt").toString
    val store = new TableStore(spark,
      Files.createTempDirectory("graft_lexm_store").toString,
      retainGenerations = 20)
    val sch = StructType.fromDDL("doc_id long, text string")
    // seed corpus + index before the stream starts
    store.append("corpus",
      Seq((1L, "spark join fast"), (2L, "hash table scan"))
        .toDF("doc_id", "text"))
    LexIndex.buildFromCorpus(store, "corpus", "lex", "doc_id", "text")
    def run(): Unit = Streams.lexIndexMaintain(
      Streams.jsonStream(spark, sch, in), store, "corpus", "lex",
      "doc_id", "text", "lexcdc", ckpt)
    def rebuilt(): Seq[(Long, Long, Long, Long)] = {
      val s2 = new TableStore(spark,
        Files.createTempDirectory("graft_lexm_rb").toString)
      s2.append("corpus", store.read("corpus"))
      LexIndex.buildFromCorpus(s2, "corpus", "lex", "doc_id", "text")
      served(s2)
    }
    def served(s: TableStore): Seq[(Long, Long, Long, Long)] =
      LexIndex.topKServed(s, "lex",
          Seq(0L -> "spark join", 1L -> "table scan"), 5)
        .select(col("qid").cast("long"), col("doc_id").cast("long"),
          col("score_q").cast("long"), col("rk").cast("long"))
        .as[(Long, Long, Long, Long)].collect().sorted.toSeq
    // batch 1: one update (doc 2) + one insert (doc 3)
    writeBatch(in, "b1.json",
      Seq("""{"doc_id":2,"text":"fast spark join scan"}""",
        """{"doc_id":3,"text":"window table join"}"""))
    run()
    assert(served(store) == rebuilt(), "after batch 1")
    // drained restart: no duplicate application
    run()
    assert(served(store) == rebuilt(), "after drained restart")
    // batch 2: another insert
    writeBatch(in, "b2.json", Seq("""{"doc_id":4,"text":"scan scan"}"""))
    run()
    assert(served(store) == rebuilt(), "after batch 2")
    // crash-between-merge-and-refresh simulation: churn the corpus
    // OUTSIDE the stream (the index now lags), then any refresh call
    // heals from the recorded anchor
    store.deleteByKeys("corpus", Seq(1L).toDF("doc_id"), Seq("doc_id"))
    LexIndex.refreshFromCorpus(store, "corpus", "lex", "doc_id", "text")
    assert(served(store) == rebuilt(), "after out-of-band churn heal")
  }

  test("dedupIndexMaintain: streamed admission keeps the corpus near-dup-free") {
    import graft.sources.TableStore
    import graft.operators.DedupIndex
    val in = Files.createTempDirectory("graft_dixm_in").toString
    val ckpt = Files.createTempDirectory("graft_dixm_ckpt").toString
    val store = new TableStore(spark,
      Files.createTempDirectory("graft_dixm_store").toString,
      retainGenerations = 20)
    val sch = StructType.fromDDL("doc_id long, text string")
    store.append("corpus", Seq(
      (1L, "alpha beta gamma delta epsilon zeta eta theta")
    ).toDF("doc_id", "text"))
    DedupIndex.buildFromCorpus(store, "corpus", "lsh", "doc_id", "text",
      shingleN = 2, k = 16, bands = 8)
    def run(): Unit = Streams.dedupIndexMaintain(
      Streams.jsonStream(spark, sch, in), store, "corpus", "lsh",
      "doc_id", "text", threshold = 0.5, "dixcdc", ckpt)
    def corpusIds(): Seq[Long] =
      store.read("corpus").select(col("doc_id")).as[Long]
        .collect().sorted.toSeq
    // b1: near-dup of corpus doc 1 (dropped), within-batch pair
    // (11 kept, 12 dropped), unique (kept)
    writeBatch(in, "b1.json", Seq(
      """{"doc_id":10,"text":"alpha beta gamma delta epsilon zeta eta iota"}""",
      """{"doc_id":11,"text":"one two three four five six seven eight nine"}""",
      """{"doc_id":12,"text":"one two three four five six seven eight ten"}""",
      """{"doc_id":13,"text":"completely different content about spark plans here"}"""))
    run()
    assert(corpusIds() == Seq(1L, 11L, 13L))
    // the refresh kept the index == a fresh rebuild of the admitted corpus
    val rebuilt = new TableStore(spark,
      Files.createTempDirectory("graft_dixm_rb").toString)
    rebuilt.append("corpus", store.read("corpus"))
    DedupIndex.buildFromCorpus(rebuilt, "corpus", "lsh", "doc_id",
      "text", shingleN = 2, k = 16, bands = 8)
    def bands(s: TableStore): Seq[(Long, Long)] =
      s.readWhere("lsh", col("component") === "band")
        .select(col("doc_id"), col("band"))
        .as[(Long, Long)].collect().sorted.toSeq
    assert(bands(store) == bands(rebuilt), "index == rebuild after b1")
    // b2: near-dup of doc 11 ADMITTED IN B1 — only the refreshed index
    // can catch it — plus another unique doc
    writeBatch(in, "b2.json", Seq(
      """{"doc_id":20,"text":"one two three four five six seven eight nine!"}""",
      """{"doc_id":21,"text":"fresh streaming material with novel words entirely"}"""))
    run()
    assert(corpusIds() == Seq(1L, 11L, 13L, 21L))
    // drained restart: nothing re-applies
    run()
    assert(corpusIds() == Seq(1L, 11L, 13L, 21L))
    // sink-committed-but-checkpoint-lost replay through the fence: a
    // replayed batch id computes a different admission set (its docs
    // are in the corpus now) but the merge fence discards it
    (0L to store.lastTxn("corpus", "dixcdc")).foreach { b =>
      assert(store.merge("corpus",
        Seq((99L, "whatever replay content")).toDF("doc_id", "text"),
        "doc_id", TableStore.MergeUpdate(Seq("text")),
        txn = Some("dixcdc" -> b)) == -1L)
    }
    assert(corpusIds() == Seq(1L, 11L, 13L, 21L))
  }

  test("funnelMaintain: streamed funnel == batch twin on ordered ingest") {
    import graft.operators.Funnel
    val in = Files.createTempDirectory("graft_fnl_in").toString
    val out = Files.createTempDirectory("graft_fnl_out").toString
    val ckpt = Files.createTempDirectory("graft_fnl_ckpt").toString
    val sch = StructType.fromDDL("u long, ty string, t long, id long")
    val all = Seq(
      (1L, "A", 100L, 1L), (1L, "B", 200L, 2L), (1L, "C", 300L, 3L),
      (2L, "B", 50L, 10L), (2L, "A", 100L, 11L), (2L, "B", 150L, 12L),
      (3L, "A", 100L, 20L), (3L, "C", 120L, 21L), (3L, "B", 150L, 22L),
      (3L, "C", 180L, 23L),
      (4L, "A", 100L, 30L), (4L, "B", 100L, 31L), (4L, "C", 101L, 32L))
    def js(rows: Seq[(Long, String, Long, Long)]) = rows.map(r =>
      s"""{"u":${r._1},"ty":"${r._2}","t":${r._3},"id":${r._4}}""")
    // event-ordered split: batch 1 = t <= 120, batch 2 = the rest —
    // the cross-batch case that only carried state can stitch (u3's
    // B@150 then C@180 complete against a batch-1 A@100)
    val (b1, b2) = all.sortBy(r => (r._3, r._4)).partition(_._3 <= 120)
    def run(): Unit = Streams.runAvailableNow(
      Streams.funnelMaintain(
        spark.readStream.schema(sch).json(in), "u", "t", "id", "ty",
        Seq("A", "B", "C"), maxSpanMicros = Some(500L)), out, ckpt)
    writeBatch(in, "b1.json", js(b1))
    run()
    writeBatch(in, "b2.json", js(b2))
    run()
    val got = spark.read.parquet(out)
      .select($"u", $"step", $"event_type", $"t", $"id")
      .as[(Long, Long, String, Long, Long)].collect().toSet
    val expect = Funnel.completions(all.toDF("u", "ty", "t", "id"),
        "u", "t", "id", "ty", Seq("A", "B", "C"),
        maxSpanMicros = Some(500L))
      .select($"u", $"step", $"event_type", $"t", $"id")
      .as[(Long, Long, String, Long, Long)].collect().toSet
    assert(got == expect, s"streamed $got != batch $expect")
    assert(expect.exists(e => e._1 == 3L && e._2 == 3L),
      "fixture must exercise a cross-batch completion")
    // drained restart emits nothing new
    run()
    assert(spark.read.parquet(out).count() == got.size.toLong)
  }

  test("transitionMaintain: summed increments == batch matrix counts") {
    import graft.operators.Funnel
    val in = Files.createTempDirectory("graft_trm_in").toString
    val out = Files.createTempDirectory("graft_trm_out").toString
    val ckpt = Files.createTempDirectory("graft_trm_ckpt").toString
    val sch = StructType.fromDDL("u long, ty string, t long, id long")
    val all = Seq(
      (1L, "A", 100L, 1L), (1L, "B", 200L, 2L), (1L, "A", 300L, 3L),
      (2L, "A", 100L, 10L), (2L, "B", 150L, 11L),
      (3L, "B", 110L, 20L), (3L, "A", 110L, 21L) // t-tie: id orders
    )
    def js(rows: Seq[(Long, String, Long, Long)]) = rows.map(r =>
      s"""{"u":${r._1},"ty":"${r._2}","t":${r._3},"id":${r._4}}""")
    // split at t <= 120: u1's B@200 and A@300 arrive in batch 2 — the
    // A@100->B@200 pair only exists if state bridges the batches
    val (b1, b2) = all.sortBy(r => (r._3, r._4)).partition(_._3 <= 120)
    def run(): Unit = Streams.runAvailableNow(
      Streams.transitionMaintain(
        spark.readStream.schema(sch).json(in), "u", "t", "id", "ty"),
      out, ckpt)
    writeBatch(in, "b1.json", js(b1))
    run()
    writeBatch(in, "b2.json", js(b2))
    run()
    val got = spark.read.parquet(out)
      .groupBy($"prev_type", $"next_type")
      .agg(org.apache.spark.sql.functions.sum($"n").as("n"))
      .as[(String, String, Long)].collect().toSet
    val expect = Funnel.transitionMatrix(all.toDF("u", "ty", "t", "id"),
        "u", "t", "id", "ty")
      .select($"prev_type", $"next_type", $"n")
      .as[(String, String, Long)].collect().toSet
    assert(got == expect, s"streamed $got != batch $expect")
    // the cross-batch pair must exist for the test to mean anything
    assert(expect.contains(("A", "B", 3L)) ||
      expect.exists(e => e._1 == "A" && e._2 == "B"))
    // drained restart emits nothing new
    run()
    val again = spark.read.parquet(out)
      .groupBy($"prev_type", $"next_type")
      .agg(org.apache.spark.sql.functions.sum($"n").as("n"))
      .as[(String, String, Long)].collect().toSet
    assert(again == got)
  }

  test("rapidRepeatMaintain: summed increments == batch double-fire counts") {
    import graft.operators.Funnel
    val in = Files.createTempDirectory("graft_rrm_in").toString
    val out = Files.createTempDirectory("graft_rrm_out").toString
    val ckpt = Files.createTempDirectory("graft_rrm_ckpt").toString
    val sch = StructType.fromDDL("u long, ty string, t long, id long")
    val all = Seq(
      (1L, "A", 100L, 1L), (1L, "A", 104L, 2L), // rapid (gap 4)
      (1L, "A", 130L, 3L),                      // rapid ACROSS batches? gap 26 > 5: no
      (1L, "A", 133L, 4L),                      // rapid (gap 3), cross-batch pair
      (2L, "A", 100L, 10L), (2L, "B", 103L, 11L), // cross-type: never
      (3L, "B", 110L, 20L), (3L, "B", 115L, 21L)  // rapid (gap 5 inclusive)
    )
    def js(rows: Seq[(Long, String, Long, Long)]) = rows.map(r =>
      s"""{"u":${r._1},"ty":"${r._2}","t":${r._3},"id":${r._4}}""")
    // split so u1's t=130 lands in batch 1 and t=133 in batch 2: the
    // rapid pair exists only if last-seen state bridges the batches
    val (b1, b2) = all.sortBy(r => (r._3, r._4)).partition(_._3 <= 130)
    def run(): Unit = Streams.runAvailableNow(
      Streams.rapidRepeatMaintain(
        spark.readStream.schema(sch).json(in), "u", "t", "id", "ty",
        withinMicros = 5L),
      out, ckpt)
    writeBatch(in, "b1.json", js(b1))
    run()
    writeBatch(in, "b2.json", js(b2))
    run()
    val got = spark.read.parquet(out)
      .groupBy($"event_type")
      .agg(org.apache.spark.sql.functions.sum($"n").as("n"),
        org.apache.spark.sql.functions.sum($"n_rapid").as("r"))
      .as[(String, Long, Long)].collect().toSet
    val expect = Funnel.rapidRepeats(all.toDF("u", "ty", "t", "id"),
        "u", "t", "id", "ty", withinMicros = 5L)
      .select($"event_type", $"n_events", $"n_rapid")
      .as[(String, Long, Long)].collect().toSet
    assert(got == expect, s"streamed $got != batch $expect")
    // the cross-batch rapid pair must exist for the test to bite
    assert(expect.contains(("A", 5L, 2L)), expect.toString)
    // drained restart emits nothing new
    run()
    val again = spark.read.parquet(out)
      .groupBy($"event_type")
      .agg(org.apache.spark.sql.functions.sum($"n").as("n"),
        org.apache.spark.sql.functions.sum($"n_rapid").as("r"))
      .as[(String, Long, Long)].collect().toSet
    assert(again == got)
  }

  test("winnowIndexMaintain: streamed passage admission tracks the index") {
    import graft.sources.TableStore
    import graft.operators.WinnowIndex
    val in = Files.createTempDirectory("graft_wixm_in").toString
    val ckpt = Files.createTempDirectory("graft_wixm_ckpt").toString
    val store = new TableStore(spark,
      Files.createTempDirectory("graft_wixm_store").toString,
      retainGenerations = 20)
    val sch = StructType.fromDDL("doc_id long, text string")
    val passage = "the quick brown fox jumps over the lazy dog tonight"
    store.append("corpus", Seq(
      (1L, s"corpus carrier of $passage and more words here")
    ).toDF("doc_id", "text"))
    WinnowIndex.buildFromCorpus(store, "corpus", "wix", "doc_id",
      "text", k = 3, w = 4)
    def run(): Unit = Streams.winnowIndexMaintain(
      Streams.jsonStream(spark, sch, in), store, "corpus", "wix",
      "doc_id", "text", minShared = 2L, "wixcdc", ckpt)
    def corpusIds(): Seq[Long] =
      store.read("corpus").select(col("doc_id")).as[Long]
        .collect().sorted.toSeq
    // b1: quotes the corpus passage (dropped); within-batch passage
    // pair (11 kept, 12 dropped); unique (kept)
    writeBatch(in, "b1.json", Seq(
      s"""{"doc_id":10,"text":"prefix words then $passage trailing"}""",
      """{"doc_id":11,"text":"eleven twelve thirteen fourteen fifteen sixteen seventeen eighteen"}""",
      """{"doc_id":12,"text":"other start eleven twelve thirteen fourteen fifteen sixteen seventeen eighteen"}""",
      """{"doc_id":13,"text":"completely novel material with no overlap anywhere at all"}"""))
    run()
    assert(corpusIds() == Seq(1L, 11L, 13L))
    // index == fresh rebuild of the admitted corpus
    val rebuilt = new TableStore(spark,
      Files.createTempDirectory("graft_wixm_rb").toString)
    rebuilt.append("corpus", store.read("corpus"))
    WinnowIndex.buildFromCorpus(rebuilt, "corpus", "wix", "doc_id",
      "text", k = 3, w = 4)
    def fps(s: TableStore): Seq[(Long, Long)] =
      s.readWhere("wix", col("component") === "fp")
        .select(col("doc_id"), col("fp"))
        .as[(Long, Long)].collect().sorted.toSeq
    assert(fps(store) == fps(rebuilt), "index != rebuild after b1")
    // b2: quotes doc 11 ADMITTED IN B1 — only the refreshed index can
    // catch it — plus a unique doc
    writeBatch(in, "b2.json", Seq(
      """{"doc_id":20,"text":"leading bits eleven twelve thirteen fourteen fifteen sixteen seventeen eighteen end"}""",
      """{"doc_id":21,"text":"entirely fresh streaming payload with original phrasing throughout"}"""))
    run()
    assert(corpusIds() == Seq(1L, 11L, 13L, 21L))
    // drained restart: nothing re-applies
    run()
    assert(corpusIds() == Seq(1L, 11L, 13L, 21L))
    // fence: replayed batch ids are discarded
    (0L to store.lastTxn("corpus", "wixcdc")).foreach { b =>
      assert(store.merge("corpus",
        Seq((99L, "replayed content")).toDF("doc_id", "text"),
        "doc_id", TableStore.MergeUpdate(Seq("text")),
        txn = Some("wixcdc" -> b)) == -1L)
    }
    assert(corpusIds() == Seq(1L, 11L, 13L, 21L))
  }

  test("lmIndexMaintain: streamed CDC keeps the count model == full rebuild") {
    import graft.sources.TableStore
    import graft.operators.LmIndex
    val in = Files.createTempDirectory("graft_lmm_in").toString
    val ckpt = Files.createTempDirectory("graft_lmm_ckpt").toString
    val store = new TableStore(spark,
      Files.createTempDirectory("graft_lmm_store").toString,
      retainGenerations = 20)
    val sch = StructType.fromDDL("doc_id long, text string")
    store.append("corpus",
      Seq((1L, "spark joins run fast"), (2L, "hash tables scan well"))
        .toDF("doc_id", "text"))
    LmIndex.buildFromCorpus(store, "corpus", "lm", "text")
    def run(): Unit = Streams.lmIndexMaintain(
      Streams.jsonStream(spark, sch, in), store, "corpus", "lm",
      "doc_id", "text", "lmcdc", ckpt)
    def servedModel(s: TableStore): Seq[(String, String, Long)] =
      s.read("lm").filter(col("component") =!= "stats" &&
          col("cnt") > 0L)
        .select(col("component"), col("gram"), col("cnt"))
        .as[(String, String, Long)].collect().sorted.toSeq
    def rebuilt(): Seq[(String, String, Long)] = {
      val s2 = new TableStore(spark,
        Files.createTempDirectory("graft_lmm_rb").toString)
      s2.append("corpus", store.read("corpus"))
      LmIndex.buildFromCorpus(s2, "corpus", "lm", "text")
      servedModel(s2)
    }
    // batch 1: update doc 2 + insert doc 3
    writeBatch(in, "b1.json",
      Seq("""{"doc_id":2,"text":"hash tables probe fast"}""",
        """{"doc_id":3,"text":"windows sort spark joins"}"""))
    run()
    assert(servedModel(store) == rebuilt(), "after batch 1")
    // drained restart: nothing re-applies (delta replays would
    // double-count — the fence and anchor must both hold)
    run()
    assert(servedModel(store) == rebuilt(), "after drained restart")
    writeBatch(in, "b2.json", Seq("""{"doc_id":4,"text":"scan scan scan"}"""))
    run()
    assert(servedModel(store) == rebuilt(), "after batch 2")
    // out-of-band churn then any refresh heals from the anchor
    store.deleteByKeys("corpus", Seq(1L).toDF("doc_id"), Seq("doc_id"))
    LmIndex.refreshFromCorpus(store, "corpus", "lm", "text")
    assert(servedModel(store) == rebuilt(), "after out-of-band churn")
  }

  test("dgimMaintain: 50%-bounded window counts in logarithmic state") {
    val in = Files.createTempDirectory("graft_dgim_in").toString
    val out = Files.createTempDirectory("graft_dgim_out").toString
    val ckpt = Files.createTempDirectory("graft_dgim_ckpt").toString
    val sch = StructType.fromDDL("k string, ts long")
    val W = 1000L
    def run(): Unit = Streams.runAvailableNow(
      Streams.dgimMaintain(Streams.jsonStream(spark, sch, in),
        "k", "ts", W), out, ckpt)
    def snap(): Map[String, (Long, Long, Long, Long, Long)] =
      spark.read.parquet(out)
        .as[(String, Long, Long, Long, Long, Long, Long, Long)]
        .collect().groupBy(_._1).map { case (g, rs) =>
          val r = rs.maxBy(_._8)
          g -> ((r._2, r._3, r._4, r._5, r._7))
        }
    // deterministic bursty stream: key a gets 200 events over 2000
    // ticks (half expire), key b gets 3 sparse events (exact regime)
    val aTs = (0 until 200).map(i => 1L + i * 10L)
    // two events stay as size-1 buckets (a third would merge a pair
    // and cost half the merged bucket) — the exact regime
    val bTs = Seq(100L, 990L)
    writeBatch(in, "b1.json",
      (aTs.take(120).map(t => s"""{"k":"a","ts":$t}""") ++
        bTs.map(t => s"""{"k":"b","ts":$t}""")))
    run()
    writeBatch(in, "b2.json",
      aTs.drop(120).map(t => s"""{"k":"a","ts":$t}"""))
    run()
    val s = snap()
    // exact window counts from the raw fixture
    def exact(ts: Seq[Long]): Long = {
      val newest = ts.max
      ts.count(t => t > newest - W && t <= newest).toLong
    }
    val (estA, totalA, oldestA, newestA, _) = s("a")
    assert(newestA == aTs.max)
    val exA = exact(aTs)
    // the DGIM sandwich: exact ∈ [total − oldest + 1, total], and the
    // half-oldest estimate is within the 50% guarantee
    assert(exA <= totalA && exA >= totalA - oldestA + 1,
      s"exact $exA vs total $totalA oldest $oldestA")
    assert(math.abs(estA - exA) <= (oldestA + 1) / 2)
    assert(math.abs(estA - exA) * 2 <= exA, "50% relative bound")
    // sparse key: few events -> size-1 buckets -> exact
    assert(s("b")._1 == exact(bTs))
    // a late event drops and is accounted, never corrupting state
    writeBatch(in, "b3.json", Seq("""{"k":"a","ts":5}"""))
    run()
    val s2 = snap()
    assert(s2("a")._5 == 1L, s"dropped_late = ${s2("a")._5}")
    assert(s2("a")._2 == totalA, "late event must not change buckets")
    // drained restart: no new snapshot rows, state intact
    val rows = spark.read.parquet(out).count()
    run()
    assert(spark.read.parquet(out).count() == rows)
  }

  test("screenAgainstCorpus drops standing-corpus dups in flight, exactly") {
    val in = Files.createTempDirectory("graft_scr_in").toString
    val out = Files.createTempDirectory("graft_scr_out").toString
    val ckpt = Files.createTempDirectory("graft_scr_ckpt").toString
    val docSchema = StructType.fromDDL("doc_id long, text string")
    val corpus = Seq(
      (100L, "the quick brown fox jumps over the lazy dog"),
      (101L, "standing corpus content")
    ).toDF("doc_id", "text")
    writeBatch(in, "b1.json", Seq(
      """{"doc_id":1,"text":"The quick brown fox jumps over the lazy dog!"}""",
      """{"doc_id":2,"text":"genuinely new streaming content"}""",
      """{"doc_id":3,"text":"standing corpus content"}"""))
    def run(est: Long): Unit = Streams.runAvailableNow(
      Streams.screenAgainstCorpus(
        Streams.jsonStream(spark, docSchema, in), corpus, "text",
        estItems = est), out, ckpt)
    // estItems=1 forces bloom false positives: the exact confirm join
    // must still admit only genuinely-new rows
    run(est = 1L)
    // a later micro-batch flows through the same baked bloom
    writeBatch(in, "b2.json", Seq(
      """{"doc_id":4,"text":"the quick brown fox jumps over the lazy dog"}""",
      """{"doc_id":5,"text":"more new content arriving later"}"""))
    run(est = 1L)
    val res = spark.read.schema(docSchema).parquet(out)
      .select($"doc_id").as[Long].collect().toSeq.sorted
    assert(res == Seq(2L, 5L))
  }


  test("hllMaintain converges to the batch registers; re-delivery is free") {
    import graft.operators.Sketches
    val in = Files.createTempDirectory("graft_hll_in").toString
    val out = Files.createTempDirectory("graft_hll_out").toString
    val ckpt = Files.createTempDirectory("graft_hll_ckpt").toString
    val sch = StructType.fromDDL("k string")
    val (p, salt) = (6, "shll")
    val keys = (0 until 300).map(i => s"k${i % 180}")
    val (b1, b2) = keys.splitAt(97)
    def js(rows: Seq[String]) = rows.map(k => s"""{"k":"$k"}""")
    def run(): Unit = Streams.runAvailableNow(
      Streams.hllMaintain(spark.readStream.schema(sch).json(in),
        "k", p, salt), out, ckpt)
    writeBatch(in, "b1.json", js(b1))
    run()
    writeBatch(in, "b2.json", js(b2))
    run()
    // a FULL re-delivery of batch 1 (sink-committed-but-lost replay):
    // max is idempotent, registers must not move
    writeBatch(in, "b3.json", js(b1))
    run()
    val snaps = spark.read.parquet(out)
    val latest = snaps.groupBy($"bucket")
      .agg(org.apache.spark.sql.functions.max($"ver").as("ver"))
    val got = snaps.join(latest, Seq("bucket", "ver"))
      .select($"bucket", $"m").as[(Long, Long)].collect().toSet
    val expect = Sketches.hllRegisters(keys.toDF("k"), Nil, "k", p, salt)
      .select($"bucket", $"m").as[(Long, Long)].collect().toSet
    assert(got == expect)
    // the maintained registers feed the SAME estimate as the batch path
    val se = Sketches.hllEstimate(
      snaps.join(latest, Seq("bucket", "ver")).select($"bucket", $"m"),
      Nil, p).select($"est").as[Long].head()
    val be = Sketches.hllEstimate(
      Sketches.hllRegisters(keys.toDF("k"), Nil, "k", p, salt),
      Nil, p).select($"est").as[Long].head()
    assert(se == be)
  }

  test("cmsMaintain converges to the batch sketch across micro-batches") {
    import graft.operators.Sketches
    val in = Files.createTempDirectory("graft_cms_in").toString
    val out = Files.createTempDirectory("graft_cms_out").toString
    val ckpt = Files.createTempDirectory("graft_cms_ckpt").toString
    val sch = StructType.fromDDL("tok string")
    val (depth, width, salt) = (4, 32, "scms")
    // a skewed token stream split arbitrarily into two batches
    val toks = (0 until 200).map(i => s"t${i % 13 % (i % 5 + 1)}")
    val (b1, b2) = toks.splitAt(73)
    def js(rows: Seq[String]) = rows.map(t => s"""{"tok":"$t"}""")
    def run(): Unit = Streams.runAvailableNow(
      Streams.cmsMaintain(spark.readStream.schema(sch).json(in),
        "tok", depth, width, salt), out, ckpt)
    writeBatch(in, "b1.json", js(b1))
    run()
    writeBatch(in, "b2.json", js(b2))
    run()
    val snaps = spark.read.parquet(out)
    val latest = snaps.groupBy($"row", $"bucket")
      .agg(org.apache.spark.sql.functions.max($"ver").as("ver"))
    val got = snaps.join(latest, Seq("row", "bucket", "ver"))
      .select($"row", $"bucket", $"c")
      .as[(Int, Long, Long)].collect().toSet
    val expect = Sketches.cmsBuild(toks.toDF("tok"), "tok", depth,
        width, salt)
      .as[(Int, Long, Long)].collect().toSet
    assert(got == expect)
    // estimates read from the maintained sketch equal the batch path
    val sketchDf = snaps.join(latest, Seq("row", "bucket", "ver"))
      .select($"row", $"bucket", $"c")
    val keys = toks.distinct.toDF("tok")
    val se = Sketches.cmsEstimate(sketchDf, keys, "tok", depth, width,
        salt).as[(String, Long)].collect().toMap
    val be = Sketches.cmsEstimate(
        Sketches.cmsBuild(toks.toDF("tok"), "tok", depth, width, salt),
        keys, "tok", depth, width, salt)
      .as[(String, Long)].collect().toMap
    assert(se == be)
  }

  test("bottomKMaintain converges to the batch sketch of the union; replays absorbed") {
    import graft.operators.Sketches
    val in = Files.createTempDirectory("graft_bkm_in").toString
    val out = Files.createTempDirectory("graft_bkm_out").toString
    val ckpt = Files.createTempDirectory("graft_bkm_ckpt").toString
    val sch = StructType.fromDDL("id long, g string, v long")
    val k = 6
    val b1 = (0L until 30L).map(i => (i, s"g${i % 2}", i * 10))
    val b2 = (30L until 80L).map(i => (i, s"g${i % 2}", i * 10))
    def js(rows: Seq[(Long, String, Long)]) =
      rows.map(r => s"""{"id":${r._1},"g":"${r._2}","v":${r._3}}""")
    def run(): Unit = Streams.runAvailableNow(
      Streams.bottomKMaintain(
        spark.readStream.schema(sch).json(in), "g", "id", "v", k,
        salt = "bkm"), out, ckpt)
    writeBatch(in, "b1.json", js(b1))
    run()
    writeBatch(in, "b2.json", js(b2))
    run()
    // a verbatim replay of batch 2 must change nothing but ver
    writeBatch(in, "b3.json", js(b2))
    run()
    val snaps = spark.read.parquet(out)
    val latest = snaps.groupBy($"grp")
      .agg(org.apache.spark.sql.functions.max($"ver").as("ver"))
    val got = snaps.join(latest, Seq("grp", "ver"))
      .select($"grp", $"h", $"key", $"v")
      .as[(String, Long, Long, Long)].collect().toSet
    val expect = Sketches.bottomKSample(
        (b1 ++ b2).toDF("id", "g", "v"), Seq("g"), "id", "v", k,
        salt = "bkm")
      .select($"g", $"__h", $"__key".cast("long"), $"__val".cast("long"))
      .as[(String, Long, Long, Long)].collect().toSet
    assert(got == expect)
    // and the derived quantiles agree with the batch sketch's
    val fromStream = snaps.join(latest, Seq("grp", "ver"))
      .select($"grp".as("g"), $"key".as("__key"), $"v".as("__val"),
        $"h".as("__h"))
    val qs = Seq(("p50", 1, 2))
    val a = Sketches.quantilesOfSample(fromStream, Seq("g"), qs)
      .as[(String, Long, Long)].collect().toSet
    val b = Sketches.bottomKQuantiles((b1 ++ b2).toDF("id", "g", "v"),
        Seq("g"), "id", "v", k, qs, salt = "bkm")
      .as[(String, Long, Long)].collect().toSet
    assert(a == b)
  }

  test("accountingByMaintain: summed increments == batch accounting of the union") {
    import graft.operators.Expectations
    import graft.operators.Expectations.Rule
    val in = Files.createTempDirectory("graft_abm_in").toString
    val out = Files.createTempDirectory("graft_abm_out").toString
    val ckpt = Files.createTempDirectory("graft_abm_ckpt").toString
    val sch = StructType.fromDDL("src string, v long, ty string")
    // nulls MUST violate (the pinned three-valued-logic stance) and a
    // row violating both rules counts under each but admits once
    val all = Seq(
      ("a", Some(5L), Some("x")), ("a", Some(-1L), Some("x")),
      ("a", None, Some("y")), ("a", Some(-2L), None),
      ("b", Some(1L), Some("y")), ("b", Some(2L), Some("z")))
    def js(rows: Seq[(String, Option[Long], Option[String])]) =
      rows.map { case (g, v, ty) =>
        val vs = v.map(_.toString).getOrElse("null")
        val ts = ty.map("\"" + _ + "\"").getOrElse("null")
        s"""{"src":"$g","v":$vs,"ty":$ts}"""
      }
    def rules = Seq(
      Rule("v_positive", col("v") > 0),
      Rule("ty_known", col("ty").isin("x", "y")))
    val (b1, b2) = all.splitAt(3) // the both-rules row crosses batches
    def run(): Unit = Streams.runAvailableNow(
      Streams.accountingByMaintain(
        spark.readStream.schema(sch).json(in), "src", rules),
      out, ckpt)
    writeBatch(in, "b1.json", js(b1)); run()
    writeBatch(in, "b2.json", js(b2)); run()
    val got = spark.read.parquet(out)
      .groupBy($"src", $"rule")
      .agg(org.apache.spark.sql.functions.sum($"n_rows").as("n"))
      .as[(String, String, Long)].collect().toSet
    // batch twin pivoted to the long shape
    val batch = Expectations.accountingBy(
        all.toDF("src", "v", "ty"), "src", rules)
      .collect().flatMap { r =>
        val g = r.getString(0)
        Seq((g, "__total", r.getLong(1)),
          (g, "v_positive", r.getLong(2)),
          (g, "ty_known", r.getLong(3)),
          (g, "__admitted", r.getLong(4)))
      }.toSet
    assert(got == batch, s"streamed $got != batch $batch")
    // the fixture must actually exercise the null-violates stance
    // (None value and None type both count) + a double-violation row
    assert(batch.contains(("a", "v_positive", 3L)), batch.toString)
    assert(batch.contains(("a", "ty_known", 1L)), batch.toString)
    assert(batch.contains(("a", "__admitted", 1L)), batch.toString)
    run() // drained restart emits nothing new
    val again = spark.read.parquet(out)
      .groupBy($"src", $"rule")
      .agg(org.apache.spark.sql.functions.sum($"n_rows").as("n"))
      .as[(String, String, Long)].collect().toSet
    assert(again == got)
  }

  test("accountingByMaintain preserves a non-string group key's type") {
    import graft.operators.Expectations.Rule
    val in = Files.createTempDirectory("graft_abm2_in").toString
    val out = Files.createTempDirectory("graft_abm2_out").toString
    val ckpt = Files.createTempDirectory("graft_abm2_ckpt").toString
    val sch = StructType.fromDDL("day long, v long")
    // a LONG group key (e.g. a day number): the streamed frame must
    // come back typed long, not the groupByKey-internal string — a
    // join against the batch twin needs no hidden cast
    writeBatch(in, "b1.json", Seq(
      """{"day":1,"v":5}""", """{"day":1,"v":-1}""",
      """{"day":20260101,"v":2}"""))
    Streams.runAvailableNow(
      Streams.accountingByMaintain(
        spark.readStream.schema(sch).json(in), "day",
        Seq(Rule("v_positive", col("v") > 0))),
      out, ckpt)
    val res = spark.read.parquet(out)
    assert(res.schema("day").dataType ==
      org.apache.spark.sql.types.LongType, res.schema.treeString)
    val got = res.groupBy($"day", $"rule")
      .agg(org.apache.spark.sql.functions.sum($"n_rows").as("n"))
      .as[(Long, String, Long)].collect().toSet
    assert(got == Set(
      (1L, "v_positive", 1L), (1L, "__admitted", 1L),
      (1L, "__total", 2L),
      (20260101L, "v_positive", 0L), (20260101L, "__admitted", 1L),
      (20260101L, "__total", 1L)), got.toString)
  }

  test("bucketCountsMaintain: spine-filled sums == batch dailyCountsFilled") {
    import graft.operators.Timeseries
    val in = Files.createTempDirectory("graft_bcm_in").toString
    val out = Files.createTempDirectory("graft_bcm_out").toString
    val ckpt = Files.createTempDirectory("graft_bcm_ckpt").toString
    val sch = StructType.fromDDL("tm long")
    val day = 86400000000L
    // days 10, 12, 15 active (11, 13, 14 silent); day 12 straddles
    // the batch split so its increments must SUM
    val all = Seq(10L * day + 5, 10L * day + 9, 12L * day + 1,
      12L * day + 2, 12L * day + 3, 15L * day + 7)
    def js(rows: Seq[Long]) = rows.map(t => s"""{"tm":$t}""")
    val (b1, b2) = all.splitAt(4)
    def run(): Unit = Streams.runAvailableNow(
      Streams.bucketCountsMaintain(
        spark.readStream.schema(sch).json(in), "tm"),
      out, ckpt)
    writeBatch(in, "b1.json", js(b1)); run()
    writeBatch(in, "b2.json", js(b2)); run()
    val summed = spark.read.parquet(out)
      .groupBy($"day")
      .agg(org.apache.spark.sql.functions.sum($"n").as("n"))
    val got = Timeseries.dailyCountsFilledFromCounts(summed)
      .as[(Long, Long)].collect().toSet
    val batch = Timeseries.dailyCountsFilled(all.toDF("tm"), "tm")
      .as[(Long, Long)].collect().toSet
    assert(got == batch, s"streamed $got != batch $batch")
    // silent days really are present as zeros
    assert(batch == Set((10L, 2L), (11L, 0L), (12L, 3L), (13L, 0L),
      (14L, 0L), (15L, 1L)))
    run() // drained restart emits nothing new
    val again = Timeseries.dailyCountsFilledFromCounts(
      spark.read.parquet(out).groupBy($"day")
        .agg(org.apache.spark.sql.functions.sum($"n").as("n")))
      .as[(Long, Long)].collect().toSet
    assert(again == got)
  }

  test("srmMaintain: srmFromCounts over summed increments == batch srmCheck") {
    import graft.operators.Sampling
    val in = Files.createTempDirectory("graft_srm_in").toString
    val out = Files.createTempDirectory("graft_srm_out").toString
    val ckpt = Files.createTempDirectory("graft_srm_ckpt").toString
    val sch = StructType.fromDDL("id long")
    val splits = Seq("train" -> 0.6, "test" -> 0.3) // 10% holdout
    val ids = (0L until 400L).toSeq
    def js(rows: Seq[Long]) = rows.map(i => s"""{"id":$i}""")
    val (b1, b2) = ids.splitAt(170)
    def run(): Unit = Streams.runAvailableNow(
      Streams.srmMaintain(
        spark.readStream.schema(sch).json(in), "id", splits, "srm"),
      out, ckpt)
    writeBatch(in, "b1.json", js(b1)); run()
    writeBatch(in, "b2.json", js(b2)); run()
    val summed = spark.read.parquet(out)
      .groupBy($"split")
      .agg(org.apache.spark.sql.functions.sum($"n_obs").as("n_obs"))
    val got = Sampling.srmFromCounts(summed, splits)
      .as[(String, Long, Long, Long)].collect().toSet
    val batch = Sampling.srmCheck(ids.toDF("id"), "id", splits, "srm")
      .as[(String, Long, Long, Long)].collect().toSet
    assert(got == batch, s"streamed $got != batch $batch")
    // all three cells observed (holdout included) and N conserved
    assert(got.map(_._1) == Set("train", "test", "[HOLDOUT]"))
    assert(got.toSeq.map(_._2).sum == 400L)
    run() // drained restart emits nothing new
    val again = Sampling.srmFromCounts(
      spark.read.parquet(out).groupBy($"split")
        .agg(org.apache.spark.sql.functions.sum($"n_obs").as("n_obs")),
      splits).as[(String, Long, Long, Long)].collect().toSet
    assert(again == got)
  }

  test("srmFromCounts refuses counts with unknown split names") {
    import graft.operators.Sampling
    val splits = Seq("train" -> 0.6, "test" -> 0.3)
    // a drifted persisted counts table: a renamed split would
    // otherwise fold silently into N and deflate every chi2 term
    val counts = Seq(("train", 100L), ("validation", 40L),
      ("test", 50L)).toDF("split", "n_obs")
    val e = intercept[IllegalArgumentException] {
      Sampling.srmFromCounts(counts, splits)
    }
    assert(e.getMessage.contains("validation"), e.getMessage)
    // null split names are reported too, not swallowed
    val withNull = Seq((Some("train"), 100L), (None, 7L))
      .toDF("split", "n_obs")
    val e2 = intercept[IllegalArgumentException] {
      Sampling.srmFromCounts(withNull, splits)
    }
    assert(e2.getMessage.contains("[NULL]"), e2.getMessage)
  }
}
