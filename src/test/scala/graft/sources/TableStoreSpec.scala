package graft.sources

import graft.SparkSpec
import org.apache.spark.sql.functions._
import java.nio.file.Files

/** K2/K6/K7/K8 through the Hadoop FileSystem API, incl. the
  * partition-targeted rewrite contract: a keyed mutation on a
  * partitioned table may only move bytes in partitions that contain an
  * affected key.
  */
class TableStoreSpec extends SparkSpec {
  import spark.implicits._

  /** part-file names per partition dir — the "did this dir get
    * rewritten" fingerprint (Spark part-file names are unique per job).
    */
  private def partFiles(dir: String): Map[String, Set[String]] = {
    val d = new java.io.File(dir)
    d.listFiles().filter(f => f.isDirectory && f.getName.contains("="))
      .map(p => p.getName ->
        p.listFiles().map(_.getName).filter(_.startsWith("part-")).toSet)
      .toMap
  }

  private def freshStore() = {
    val ts =
      new TableStore(spark, Files.createTempDirectory("graft_ts").toString)
    // crash-injection specs leave swapping manifests deliberately; the
    // live-swap patience window would add swapWaitMs per recover here
    ts.swapWaitMs = 0L
    ts
  }

  private def seedPartitioned(ts: TableStore, table: String): Unit =
    ts.append(table,
      spark.range(100)
        .select($"id", lit(0).as("flag"),
          concat(lit("d"), $"id" % 5).as("day")),
      partitionBy = Seq("day"))

  test("K7 partitioned updateFlag rewrites ONLY affected partition dirs") {
    val ts = freshStore()
    seedPartitioned(ts, "t")
    val dir = ts.read("t").inputFiles.head
      .replaceFirst("file:", "").replaceFirst("/day=.*", "")
    val before = partFiles(dir)
    // ids 2,7 both live in day=d2 (id%5==2) — only that dir may change
    ts.updateFlag("t", Seq(2L, 7L).toDF("id"), Seq("id"), "flag", 1,
      partitionCols = Seq("day"))
    val after = partFiles(dir)
    for (d <- Seq("day=d0", "day=d1", "day=d3", "day=d4"))
      assert(after(d) == before(d), s"$d was rewritten")
    assert(after("day=d2") != before("day=d2"), "day=d2 not rewritten")
    val rows = ts.read("t")
    assert(rows.count() == 100)
    assert(rows.filter($"flag" === 1).select($"id")
      .as[Long].collect().toSet == Set(2L, 7L))
  }

  test("K8 partitioned deleteByKeys removes an emptied partition dir") {
    val ts = freshStore()
    seedPartitioned(ts, "t")
    val dir = ts.read("t").inputFiles.head
      .replaceFirst("file:", "").replaceFirst("/day=.*", "")
    val before = partFiles(dir)
    // delete ALL of day=d1 (ids ≡ 1 mod 5) plus one row of d3
    val doomed = ((0L until 100L).filter(_ % 5 == 1) :+ 3L).toDF("id")
    ts.deleteByKeys("t", doomed, Seq("id"), partitionCols = Seq("day"))
    val after = partFiles(dir)
    assert(!after.contains("day=d1"), "emptied partition dir not deleted")
    for (d <- Seq("day=d0", "day=d2", "day=d4"))
      assert(after(d) == before(d), s"$d was rewritten")
    assert(after("day=d3") != before("day=d3"))
    val rows = ts.read("t")
    assert(rows.count() == 79)
    assert(rows.filter($"day" === "d1").count() == 0)
    assert(rows.filter($"id" === 3L).count() == 0)
  }

  test("no-hit keyed mutation touches nothing") {
    val ts = freshStore()
    seedPartitioned(ts, "t")
    val dir = ts.read("t").inputFiles.head
      .replaceFirst("file:", "").replaceFirst("/day=.*", "")
    val before = partFiles(dir)
    ts.updateFlag("t", Seq(1234L).toDF("id"), Seq("id"), "flag", 1,
      partitionCols = Seq("day"))
    assert(partFiles(dir) == before)
  }

  test("unpartitioned rewrite/updateFlag via Hadoop FS still round-trips") {
    val ts = freshStore()
    ts.append("u", (1L to 10L).toDF("id").withColumn("flag", lit(0)))
    ts.updateFlag("u", Seq(4L).toDF("id"), Seq("id"), "flag", 9)
    assert(ts.read("u").filter($"flag" === 9).select($"id")
      .as[Long].collect().toSeq == Seq(4L))
    ts.deleteByKeys("u", Seq(5L, 6L).toDF("id"), Seq("id"))
    assert(ts.read("u").count() == 8)
    assert(ts.exists("u") && !ts.exists("nope"))
  }

  test("partition-targeted rewrite leaves no checkpoint/cached RDDs behind") {
    val ts = freshStore()
    seedPartitioned(ts, "t")
    val cachedBefore = spark.sparkContext.getPersistentRDDs.keySet
    ts.updateFlag("t", Seq(2L).toDF("id"), Seq("id"), "flag", 1,
      partitionCols = Seq("day"))
    val cachedAfter = spark.sparkContext.getPersistentRDDs.keySet
    // a localCheckpoint pivot would register a persistent RDD whose
    // blocks live in executor storage (not fault-tolerant at scale)
    assert((cachedAfter -- cachedBefore).isEmpty,
      s"rewriteAffected left cached RDDs: ${cachedAfter -- cachedBefore}")
    assert(ts.read("t").filter($"flag" === 1).select($"id")
      .as[Long].collect().toSeq == Seq(2L))
  }

  test("mid-write failure leaves every partition intact (write-then-swap)") {
    val ts = freshStore()
    seedPartitioned(ts, "t")
    val dir = ts.read("t").inputFiles.head
      .replaceFirst("file:", "").replaceFirst("/day=.*", "")
    val before = partFiles(dir)
    // transform that fails mid-job, after some tasks have written rows
    val boom = intercept[Exception] {
      ts.rewriteAffected("t", Seq("day"),
        hitParts = ts.read("t").select($"day").distinct(),
        transform = df => df.withColumn("flag",
          when($"id" === 42L,
            raise_error(lit("simulated executor loss")).cast("int"))
            .otherwise($"flag")))
    }
    assert(boom != null)
    // the failed job only ever touched the __tmp sibling: the live
    // table's every partition dir still has its exact part-files
    assert(partFiles(dir) == before)
    assert(ts.read("t").count() == 100)
    assert(ts.read("t").filter($"flag" =!= 0).count() == 0)
  }

  test("partitioned upsert appends under the partition layout") {
    val ts = freshStore()
    seedPartitioned(ts, "t")
    val inc = Seq((50L, 1, "d0"), (200L, 1, "d0"), (201L, 1, "d9"))
      .toDF("id", "flag", "day")
    ts.upsert("t", inc, keys = Seq("id"), tieBreak = Seq("day"),
      partitionBy = Seq("day"))
    val rows = ts.read("t")
    assert(rows.count() == 102) // 50 conflicts, 200/201 new
    assert(rows.filter($"day" === "d9").count() == 1)
  }

  test("compact merges multi-file partitions only; content unchanged") {
    val ts = freshStore()
    // seed with ONE file per partition (repartition by the partition
    // column), then two more appends hit only d0/d1
    ts.append("t",
      spark.range(100)
        .select($"id", lit(0).as("flag"),
          concat(lit("d"), $"id" % 5).as("day"))
        .repartition($"day"),
      partitionBy = Seq("day"))
    (1 to 2).foreach { i =>
      ts.append("t",
        spark.range(100L * i, 100L * i + 10)
          .select($"id", lit(0).as("flag"),
            concat(lit("d"), $"id" % 2).as("day"))
          .repartition($"day"),
        partitionBy = Seq("day"))
    }
    val dir = ts.read("t").inputFiles.head
      .replaceFirst("file:", "").replaceFirst("/day=.*", "")
    val before = partFiles(dir)
    assert(before("day=d0").size == 3)
    assert(before("day=d2").size == 1) // only seeded once
    val rowsBefore = ts.read("t").orderBy($"id")
      .as[(Long, Int, String)].collect().toSeq

    ts.compact("t", partitionCols = Seq("day"))
    val after = partFiles(dir)
    // multi-file partitions collapsed to one file each
    assert(after("day=d0").size == 1)
    assert(after("day=d1").size == 1)
    // single-file partitions never moved: exact same part-file names
    assert(after("day=d2") == before("day=d2"))
    assert(after("day=d3") == before("day=d3"))
    assert(after("day=d4") == before("day=d4"))
    // contents byte-identical
    assert(ts.read("t").orderBy($"id")
      .as[(Long, Int, String)].collect().toSeq == rowsBefore)
    // idempotent: a second compact is a no-op (no dirs move)
    ts.compact("t", partitionCols = Seq("day"))
    assert(partFiles(dir) == after)
  }

  test("compact rewrites an unpartitioned table into targetFiles files") {
    val ts = freshStore()
    (0 until 4).foreach(i => ts.append("t",
      spark.range(10L * i, 10L * i + 10).toDF("id").repartition(3)))
    assert(new java.io.File(ts.read("t").inputFiles.head
      .replaceFirst("file:", "").replaceFirst("/[^/]*$", ""))
      .listFiles().count(_.getName.startsWith("part-")) >= 12)
    val before = ts.read("t").orderBy($"id").as[Long].collect().toSeq
    ts.compact("t", targetFiles = 2)
    val files = new java.io.File(ts.read("t").inputFiles.head
      .replaceFirst("file:", "").replaceFirst("/[^/]*$", ""))
      .listFiles().count(_.getName.startsWith("part-"))
    assert(files == 2)
    assert(ts.read("t").orderBy($"id").as[Long].collect().toSeq == before)
  }

  test("dedupAppend drops dups within a batch AND across batches") {
    val ts = freshStore()
    // doc 2 normalizes to doc 1's text (case/punct differences only)
    val batch1 = Seq((1L, "The quick brown fox"), (2L, "the QUICK brown fox!"),
      (3L, "something else entirely")).toDF("doc_id", "text")
    val kept1 = ts.dedupAppend("corpus", batch1, "doc_id", "text")
      .select($"doc_id").as[Long].collect().toSeq.sorted
    assert(kept1 == Seq(1L, 3L)) // min-id survivor within the batch
    // doc 4 duplicates STORED doc 1; doc 5 is new
    val batch2 = Seq((4L, "the quick brown fox"), (5L, "fresh content here"))
      .toDF("doc_id", "text")
    val kept2 = ts.dedupAppend("corpus", batch2, "doc_id", "text")
      .select($"doc_id").as[Long].collect().toSeq.sorted
    assert(kept2 == Seq(5L))
    assert(ts.read("corpus").select($"doc_id").as[Long].collect().toSeq.sorted
      == Seq(1L, 3L, 5L))
    // a batch already carrying 'fp' is rejected, never silently clobbered
    val clash = Seq((6L, "text", "caller-data")).toDF("doc_id", "text", "fp")
    intercept[IllegalArgumentException] {
      ts.dedupAppend("corpus", clash, "doc_id", "text")
    }
  }

  test("crash between the two renames of a full rewrite reads wholly-old") {
    val ts = freshStore()
    ts.append("u", (1L to 10L).toDF("id").withColumn("flag", lit(0)))
    ts.failAfterSwaps = 1 // kill after rename(dst -> old), before tmp -> dst
    val boom = intercept[IllegalStateException] {
      ts.updateFlag("u", Seq(4L).toDF("id"), Seq("id"), "flag", 9)
    }
    assert(boom.getMessage.contains("injected"))
    ts.failAfterSwaps = -1
    // the live dir is GONE at this instant — the manifest resolves the
    // read to the __old copy: wholly the previous generation
    assert(ts.exists("u"))
    assert(ts.read("u").filter($"flag" === 9).count() == 0)
    assert(ts.read("u").select($"id").as[Long].collect().toSet ==
      (1L to 10L).toSet)
    // the next mutation recovers the layout and applies cleanly
    ts.updateFlag("u", Seq(4L).toDF("id"), Seq("id"), "flag", 9)
    assert(ts.read("u").filter($"flag" === 9).select($"id")
      .as[Long].collect().toSeq == Seq(4L))
    assert(ts.readManifest("u").exists(m => !m.swapping))
  }

  test("crash mid multi-partition swap reads wholly-old, never mixed") {
    val ts = freshStore()
    seedPartitioned(ts, "t")
    // flag flip hits d1 AND d3; crash after d1's pair fully swapped,
    // mid-way through the second dir's pair
    ts.failAfterSwaps = 2
    intercept[IllegalStateException] {
      ts.updateFlag("t", Seq(1L, 3L).toDF("id"), Seq("id"), "flag", 1,
        partitionCols = Seq("day"))
    }
    ts.failAfterSwaps = -1
    // one partition already carries generation N+1 bytes in place — the
    // manifest must still resolve BOTH touched dirs to the old copies
    val rows = ts.read("t")
    assert(rows.count() == 100)
    assert(rows.filter($"flag" === 1).count() == 0, "mixed-generation read")
    // recovery (first op of the next mutation) rolls back, then the
    // retried mutation lands
    ts.updateFlag("t", Seq(1L, 3L).toDF("id"), Seq("id"), "flag", 1,
      partitionCols = Seq("day"))
    val after = ts.read("t")
    assert(after.count() == 100)
    assert(after.filter($"flag" === 1).select($"id")
      .as[Long].collect().toSet == Set(1L, 3L))
    // gen 1 = the seed append's first-time fenced rewrite; gen 2 = the
    // successfully retried flag flip
    assert(ts.readManifest("t").exists(m => !m.swapping && m.gen == 2L))
  }

  test("crash after a brand-new partition dir swaps in reads wholly-old") {
    val ts = freshStore()
    // table partitioned BY the flag column: flipping it writes a
    // brand-new flag=1 dir that has no committed copy (fresh)
    ts.append("t", spark.range(10).select($"id", lit(0).as("flag")),
      partitionBy = Seq("flag"))
    // flip ALL rows: written = {flag=1} (fresh), emptied = {flag=0};
    // crash lands after flag=1 renamed in AND flag=0 moved aside
    ts.failAfterSwaps = 2
    intercept[IllegalStateException] {
      ts.updateFlag("t", (0L until 10L).toDF("id"), Seq("id"), "flag", 1,
        partitionCols = Seq("flag"))
    }
    ts.failAfterSwaps = -1
    // the fresh dir holds only uncommitted generation-N+1 rows — a read
    // must exclude it or every row comes back twice (old + flipped)
    val rows = ts.read("t")
    assert(rows.count() == 10, "uncommitted fresh partition leaked")
    assert(rows.filter($"flag" === 1).count() == 0, "mixed-generation read")
    // recovery deletes the fresh dir and restores flag=0; the retried
    // flip then lands exactly once
    ts.updateFlag("t", (0L until 10L).toDF("id"), Seq("id"), "flag", 1,
      partitionCols = Seq("flag"))
    assert(ts.read("t").count() == 10, "duplicates after rollback")
    assert(ts.read("t").filter($"flag" === 1).count() == 10)
    assert(ts.readManifest("t").exists(m => !m.swapping))
  }

  test("crash after a FIRST-TIME rewrite renames in commits nothing") {
    val ts = freshStore()
    val df = (1L to 5L).toDF("id")
    ts.failAfterSwaps = 2 // after rename(tmp -> dst), before the commit
    intercept[IllegalStateException] { ts.rewrite("v", df) }
    ts.failAfterSwaps = -1
    // the committed generation is "no table" even though the renamed-in
    // dir survives on disk
    assert(!ts.exists("v"), "uncommitted first-time rewrite visible")
    intercept[IllegalStateException] { ts.read("v") }
    // the retried rewrite recovers (deletes the stranded dir) and lands
    ts.rewrite("v", df)
    assert(ts.exists("v"))
    assert(ts.read("v").count() == 5)
    assert(ts.readManifest("v").exists(m => !m.swapping && m.gen == 1L))
  }

  test("crash INSIDE one dir's file-by-file swap reads wholly-old (per-file manifest)") {
    val ts = freshStore()
    seedPartitioned(ts, "t")
    // second append makes day=d2 multi-file, so a partial per-file
    // rename is representable
    ts.append("t",
      spark.range(100, 140)
        .select($"id", lit(0).as("flag"), lit("d2").as("day")),
      partitionBy = Seq("day"))
    val dir = ts.read("t").inputFiles.head
      .replaceFirst("file:", "").replaceFirst("/day=.*", "")
    val committedIds = ts.read("t").select($"id").as[Long].collect().toSet
    assert(partFiles(dir)("day=d2").size >= 2)
    // crash right after d2's whole-dir move-aside (local rename is
    // atomic; the raw-S3 partial state is constructed below)
    ts.failAfterSwaps = 1
    intercept[IllegalStateException] {
      ts.updateFlag("t", Seq(2L).toDF("id"), Seq("id"), "flag", 9,
        partitionCols = Seq("day"))
    }
    ts.failAfterSwaps = -1
    // the manifest recorded d2's committed files
    val m = ts.readManifest("t").get
    assert(m.swapping && m.files("day=d2").nonEmpty)
    // construct the raw-S3 mid-rename state: a dir rename there is a
    // file-by-file copy+delete, so a crash strands committed files
    // SPLIT between the live dir and __old — move one back — and may
    // already have renamed uncommitted new-generation files in — copy
    // one from the still-present __tmp
    val bakD2 = new java.io.File(s"${dir}__old/day=d2")
    val curD2 = new java.io.File(s"$dir/day=d2")
    curD2.mkdirs()
    val split = bakD2.listFiles().filter(_.getName.startsWith("part-")).head
    java.nio.file.Files.move(split.toPath,
      new java.io.File(curD2, split.getName).toPath)
    // staging is writer-unique since round 8 — resolve the crashed
    // writer's staging sibling from the manifest's tmp= record
    val stagingName = m.tmp.get
    val tmpD2 = new java.io.File(
      new java.io.File(dir).getParent, s"$stagingName/day=d2")
    val leaked = tmpD2.listFiles().filter(_.getName.startsWith("part-")).head
    java.nio.file.Files.copy(leaked.toPath,
      new java.io.File(curD2, leaked.getName).toPath)
    // wholly-old read: every committed row exactly once (reassembled
    // from both halves of the split), no new-generation row
    val rows = ts.read("t")
    assert(rows.select($"id").as[Long].collect().toSet == committedIds)
    assert(rows.count() == committedIds.size, "duplicate rows from split dir")
    assert(rows.filter($"flag" === 9).count() == 0, "uncommitted rows leaked")
    // recovery reassembles the committed dir and drops the leaked file;
    // the retried mutation lands exactly once
    ts.updateFlag("t", Seq(2L).toDF("id"), Seq("id"), "flag", 9,
      partitionCols = Seq("day"))
    val after = ts.read("t")
    assert(after.select($"id").as[Long].collect().toSet == committedIds)
    assert(after.filter($"flag" === 9).select($"id")
      .as[Long].collect().toSeq == Seq(2L))
    assert(ts.readManifest("t").exists(m2 => !m2.swapping))
  }

  test("crash mid-append leaves the batch invisible; retry lands once") {
    val ts = freshStore()
    seedPartitioned(ts, "t") // 100 committed rows
    def batch() = spark.range(200, 240)
      .select($"id", lit(0).as("flag"), concat(lit("d"), $"id" % 5).as("day"))
    // crash after ONE incoming file already moved into the table
    ts.failAfterSwaps = 2
    intercept[IllegalStateException] {
      ts.append("t", batch(), partitionBy = Seq("day"))
    }
    ts.failAfterSwaps = -1
    // uncommitted batch files sit inside the table dir, but the
    // manifest's add-list keeps them out of the committed read
    val rows = ts.read("t")
    assert(rows.count() == 100, "partial append leaked into a read")
    assert(rows.filter($"id" >= 200).count() == 0)
    // the retried append recovers first, then lands exactly once
    ts.append("t", batch(), partitionBy = Seq("day"))
    val after = ts.read("t")
    assert(after.count() == 140, "duplicates or losses after recovery")
    assert(after.filter($"id" >= 200).count() == 40)
    assert(after.select($"id").distinct().count() == 140)
    assert(ts.readManifest("t").exists(m => !m.swapping))
  }

  test("crash while removing an emptied partition restores it on recovery") {
    val ts = freshStore()
    seedPartitioned(ts, "t")
    // delete all of d1 (emptied partition -> rename-aside, not delete)
    val doomed = (0L until 100L).filter(_ % 5 == 1).toDF("id")
    ts.failAfterSwaps = 1
    intercept[IllegalStateException] {
      ts.deleteByKeys("t", doomed, Seq("id"), partitionCols = Seq("day"))
    }
    ts.failAfterSwaps = -1
    // wholly-old: the emptied partition is still visible pre-recovery
    assert(ts.read("t").count() == 100)
    // and still there after a recovery triggered by an unrelated no-op
    ts.updateFlag("t", Seq(9999L).toDF("id"), Seq("id"), "flag", 1,
      partitionCols = Seq("day"))
    assert(ts.read("t").count() == 100)
    assert(ts.read("t").filter($"day" === "d1").count() == 20)
    // the retried delete then completes
    ts.deleteByKeys("t", doomed, Seq("id"), partitionCols = Seq("day"))
    assert(ts.read("t").count() == 80)
    assert(ts.read("t").filter($"day" === "d1").count() == 0)
  }

  private def retainedStore(keep: Int) =
    new TableStore(spark, Files.createTempDirectory("graft_tt").toString,
      retainGenerations = keep)

  test("time travel: every retained generation reads back exactly") {
    val ts = retainedStore(10)
    def snap(): Set[(Long, String, Int)] = ts.read("t")
      .select($"id", $"day", $"flag").as[(Long, String, Int)]
      .collect().toSet
    def at(g: Long): Set[(Long, String, Int)] = ts.readAt("t", g)
      .select($"id", $"day", $"flag").as[(Long, String, Int)]
      .collect().toSet
    seedPartitioned(ts, "t") // gen 1 (append routes through rewrite)
    val g1 = snap()
    ts.append("t", Seq((100L, "d3", 0)).toDF("id", "day", "flag"),
      partitionBy = Seq("day")) // gen 2
    val g2 = snap()
    ts.updateFlag("t", Seq(2L, 100L).toDF("id"), Seq("id"), "flag", 7,
      partitionCols = Seq("day")) // gen 3: partition-targeted rewrite
    val g3 = snap()
    ts.deleteByKeys("t", Seq(1L).toDF("id"), Seq("id"),
      partitionCols = Seq("day")) // gen 4
    val g4 = snap()
    assert(ts.generations("t") == Seq(1L, 2L, 3L, 4L))
    assert(at(1) == g1 && at(2) == g2 && at(3) == g3 && at(4) == g4)
    assert(g1 != g2 && g2 != g3 && g3 != g4)
    // compaction (gen 5) must not change ANY generation's contents
    ts.compact("t", partitionCols = Seq("day"), maxFiles = 0)
    assert(at(1) == g1 && at(2) == g2 && at(3) == g3 && at(4) == g4)
    assert(snap() == g4)
  }

  test("time travel: vacuum drops old generations loudly, keeps the window") {
    val ts = retainedStore(10)
    seedPartitioned(ts, "t") // gen 1
    val g1 = ts.read("t").count()
    ts.deleteByKeys("t", Seq(1L).toDF("id"), Seq("id"),
      partitionCols = Seq("day")) // gen 2
    ts.updateFlag("t", Seq(2L).toDF("id"), Seq("id"), "flag", 9,
      partitionCols = Seq("day")) // gen 3
    assert(ts.readAt("t", 1).count() == g1)
    ts.vacuum("t", keepLast = 1)
    assert(ts.generations("t") == Seq(2L, 3L))
    val e = intercept[IllegalArgumentException](ts.readAt("t", 1))
    assert(e.getMessage.contains("not retained"))
    assert(ts.readAt("t", 2).count() == g1 - 1)
    // future generations are rejected, current delegates to read
    intercept[IllegalArgumentException](ts.readAt("t", 99))
    assert(ts.readAt("t", 3).count() == ts.read("t").count())
  }

  test("time travel: retention window auto-prunes; retention-off store rejects") {
    val ts = retainedStore(2)
    seedPartitioned(ts, "t") // gen 1
    for (g <- 2 to 5) // gens 2..5
      ts.updateFlag("t", Seq(0L).toDF("id"), Seq("id"), "flag", g,
        partitionCols = Seq("day"))
    // window of 2 behind gen 5: gens 3, 4 (+ live 5)
    assert(ts.generations("t") == Seq(3L, 4L, 5L))
    assert(ts.readAt("t", 3).filter($"id" === 0L)
      .select($"flag").as[Int].head() == 3)
    val off = freshStore()
    seedPartitioned(off, "t")
    off.updateFlag("t", Seq(0L).toDF("id"), Seq("id"), "flag", 1,
      partitionCols = Seq("day"))
    intercept[IllegalArgumentException](off.readAt("t", 1))
  }

  test("time travel: a crash BETWEEN commit and dispose cannot destroy history") {
    // the post-commit window: the clean manifest has landed but __old
    // is not yet archived — the next mutation must SETTLE it into the
    // archive, not delete it (the pre-review code deleted it)
    val ts = retainedStore(10)
    seedPartitioned(ts, "t") // gen 1
    val g1 = ts.read("t").count()
    ts.failBeforeDispose = true
    intercept[IllegalStateException] {
      ts.deleteByKeys("t", Seq(1L).toDF("id"), Seq("id"),
        partitionCols = Seq("day"))
    }
    ts.failBeforeDispose = false
    // the delete COMMITTED (gen 2); gen-1 history resolves from __old
    assert(ts.read("t").count() == g1 - 1)
    assert(ts.readAt("t", 1).count() == g1)
    // the next mutation settles __old into the archive instead of
    // deleting it; history stays intact afterwards
    ts.updateFlag("t", Seq(2L).toDF("id"), Seq("id"), "flag", 3,
      partitionCols = Seq("day")) // gen 3
    assert(ts.generations("t") == Seq(1L, 2L, 3L))
    assert(ts.readAt("t", 1).count() == g1)
    assert(ts.readAt("t", 2).count() == g1 - 1)
  }

  test("time travel: an emptied generation reads back as zero rows") {
    val ts = retainedStore(10)
    seedPartitioned(ts, "t") // gen 1
    ts.deleteByKeys("t", (0L until 100L).toDF("id"), Seq("id"),
      partitionCols = Seq("day")) // gen 2: empties the table
    ts.append("t", Seq((500L, "d0", 1)).toDF("id", "day", "flag"),
      partitionBy = Seq("day")) // gen 3 (snapshots empty gen 2)
    assert(ts.readAt("t", 2).count() == 0)
    assert(ts.readAt("t", 1).count() == 100)
    assert(ts.read("t").count() == 1)
  }

  test("time travel: append-only retention window still prunes snapshots") {
    val ts = retainedStore(2)
    seedPartitioned(ts, "t") // gen 1
    for (i <- 0 until 4) // gens 2..5, appends only
      ts.append("t", Seq((1000L + i, "d0", 0)).toDF("id", "day", "flag"),
        partitionBy = Seq("day"))
    assert(ts.generations("t") == Seq(3L, 4L, 5L))
  }

  test("time travel: a crash mid-swap neither corrupts past generations nor leaks") {
    val ts = retainedStore(10)
    seedPartitioned(ts, "t") // gen 1
    val g1 = ts.readAt("t", 1).count() // forces snap resolution later
    ts.deleteByKeys("t", Seq(1L).toDF("id"), Seq("id"),
      partitionCols = Seq("day")) // gen 2
    ts.failAfterSwaps = 1
    intercept[IllegalStateException] {
      ts.updateFlag("t", Seq(2L).toDF("id"), Seq("id"), "flag", 5,
        partitionCols = Seq("day"))
    }
    ts.failAfterSwaps = -1
    // mid-crash: past generations still resolve (touched files sit in
    // __old, which readAt probes after the archives)
    assert(ts.readAt("t", 1).count() == g1)
    assert(ts.readAt("t", 2).count() == g1 - 1)
    // the retried mutation completes and history is intact
    ts.updateFlag("t", Seq(2L).toDF("id"), Seq("id"), "flag", 5,
      partitionCols = Seq("day")) // gen 3
    assert(ts.generations("t") == Seq(1L, 2L, 3L))
    assert(ts.readAt("t", 1).count() == g1)
    assert(ts.readAt("t", 2).count() == g1 - 1)
    assert(ts.read("t").filter($"flag" === 5).count() == 1)
  }

  /** Root-dir inventory: no staging (`__tmp.*`/`__add.*`), no `__old`,
    * exactly one commit manifest — the no-file-leaks check for the
    * optimistic-concurrency cases.
    */
  private def assertNoLeaks(root: String, table: String): Unit = {
    val names = new java.io.File(root).listFiles().map(_.getName).toSeq
    assert(!names.exists(_.contains("__tmp")), s"staging leak: $names")
    assert(!names.exists(_.contains("__add")), s"staging leak: $names")
    assert(!names.exists(_.contains("__old")), s"__old leak: $names")
    assert(names.count(_.startsWith(s"$table._graft_commit.")) == 1,
      s"manifest leak: $names")
  }


  test("append with a mismatched partition layout is rejected before commit") {
    val ts = freshStore()
    seedPartitioned(ts, "t")
    // flat append into the day-partitioned table would commit a mixed
    // layout that breaks partition discovery forever
    intercept[IllegalArgumentException] {
      ts.append("t", Seq((500L, 1, "d9")).toDF("id", "flag", "day"))
    }
    intercept[IllegalArgumentException] {
      ts.append("t", Seq((500L, 1, "d9")).toDF("id", "flag", "day"),
        partitionBy = Seq("flag"))
    }
    // the matching layout still appends
    ts.append("t", Seq((500L, 1, "d9")).toDF("id", "flag", "day"),
      partitionBy = Seq("day"))
    assert(ts.read("t").count() == 101)
  }

  test("OCC: a loser WAITS for the winner's live mid-swap instead of recovering it") {
    val root = Files.createTempDirectory("graft_liveswap").toString
    val a = new TableStore(spark, root)
    val b = new TableStore(spark, root)
    b.swapWaitMs = 15000L
    a.rewrite("t", Seq((1L, "seed")).toDF("k", "v"))
    val gate = new java.util.concurrent.CountDownLatch(1)
    val inSwap = new java.util.concurrent.CountDownLatch(1)
    a.midSwapPause = () => { inSwap.countDown(); gate.await() }
    val winner = new Thread(() =>
      a.append("t", Seq((2L, "winner")).toDF("k", "v")))
    winner.start()
    inSwap.await() // A holds a LIVE swapping manifest, renames pending
    // release the winner shortly after B starts waiting on its retry
    val releaser = new Thread(() => { Thread.sleep(800); gate.countDown() })
    releaser.start()
    // B collides with A's swapping head, must WAIT (not recover), then
    // land on top of A's commit
    b.append("t", Seq((3L, "loser")).toDF("k", "v"))
    winner.join(30000); releaser.join(30000)
    a.midSwapPause = () => ()
    // BOTH appends survived — the loser did not roll back the live swap
    assert(a.read("t").as[(Long, String)].collect().toSet ==
      Set((1L, "seed"), (2L, "winner"), (3L, "loser")))
    assert(!a.readManifest("t").get.swapping)
  }

  test("OCC: interleaved upsert+upsert — exactly one winner per sequence, loser retries clean") {
    val root = Files.createTempDirectory("graft_occ").toString
    val w1 = new TableStore(spark, root)
    val w2 = new TableStore(spark, root)
    w1.swapWaitMs = 0L; w2.swapWaitMs = 0L
    w1.rewrite("t", Seq((1L, "a"), (2L, "b")).toDF("k", "v")) // gen 1
    // w2 stages its batch, then w1 commits an OVERLAPPING upsert first:
    // w2's begin-commit CAS must lose, clean its staging, and retry
    // against w1's generation (key 3 now conflicts and is skipped)
    var fired = false
    w2.beforeBeginCommit = () => if (!fired) {
      fired = true
      w1.upsert("t", Seq((3L, "w1"), (4L, "w1")).toDF("k", "v"),
        Seq("k"), Seq("v")) // gen 2
    }
    w2.upsert("t", Seq((3L, "w2"), (5L, "w2")).toDF("k", "v"),
      Seq("k"), Seq("v")) // gen 3 on retry
    w2.beforeBeginCommit = () => ()
    assert(fired)
    // ON CONFLICT DO NOTHING serialized: w1 won key 3; w2's retry saw
    // it and inserted only its novel key
    assert(w1.read("t").as[(Long, String)].collect().toMap ==
      Map(1L -> "a", 2L -> "b", 3L -> "w1", 4L -> "w1", 5L -> "w2"))
    // one generation per commit — the two upserts serialized as 2 and 3
    assert(w1.readManifest("t").get.gen == 3)
    assert(!w1.readManifest("t").get.swapping)
    assertNoLeaks(root, "t")
    // every data file on disk is referenced by the read (none orphaned
    // by the loser's aborted first attempt)
    def dataFilesOnDisk(d: java.io.File): Seq[String] =
      d.listFiles().toSeq.flatMap { f =>
        if (f.isDirectory) dataFilesOnDisk(f)
        else if (f.getName.startsWith("part-")) Seq(f.getName) else Nil
      }
    val onDisk = dataFilesOnDisk(new java.io.File(s"$root/t")).sorted
    val scanned = w1.read("t").inputFiles.toSeq
      .map(_.split('/').last).sorted
    assert(onDisk == scanned, "orphaned data files in the table dir")
  }

  test("OCC: interleaved append vs rewrite serialize; appended rows survive a lost race") {
    val root = Files.createTempDirectory("graft_occ2").toString
    val w1 = new TableStore(spark, root)
    val w2 = new TableStore(spark, root)
    w1.swapWaitMs = 0L; w2.swapWaitMs = 0L
    w1.rewrite("t", Seq((1L, "a")).toDF("k", "v")) // gen 1
    var fired = false
    w2.beforeBeginCommit = () => if (!fired) {
      fired = true
      w1.rewrite("t", Seq((10L, "rw")).toDF("k", "v")) // gen 2
    }
    w2.append("t", Seq((20L, "ap")).toDF("k", "v")) // gen 3 on retry
    w2.beforeBeginCommit = () => ()
    // the append retried ON TOP of the rewrite — not lost, not doubled
    assert(w1.read("t").as[(Long, String)].collect().toSet ==
      Set((10L, "rw"), (20L, "ap")))
    assert(w1.readManifest("t").get.gen == 3)
    assertNoLeaks(root, "t")
  }

  test("OCC: retries exhausted surfaces ConcurrentCommitException; staging cleaned") {
    val root = Files.createTempDirectory("graft_occ3").toString
    val w1 = new TableStore(spark, root)
    val w0 = new TableStore(spark, root, maxCommitRetries = 0)
    w1.rewrite("t", Seq((1L, "a")).toDF("k", "v"))
    // the competing commit fires on EVERY attempt — w0 (no retries)
    // must abort loudly instead of committing on stale inputs
    w0.beforeBeginCommit =
      () => w1.append("t", Seq((9L, "x")).toDF("k", "v"))
    val e = intercept[ConcurrentCommitException] {
      w0.append("t", Seq((7L, "y")).toDF("k", "v"))
    }
    w0.beforeBeginCommit = () => ()
    assert(e.table == "t")
    // the loser's batch is NOT in the table; the winner's is; no staging
    assert(w1.read("t").as[(Long, String)].collect().toSet ==
      Set((1L, "a"), (9L, "x")))
    assertNoLeaks(root, "t")
  }

  test("OCC: crash between begin-commit CAS and first rename recovers; staging cleared") {
    val root = Files.createTempDirectory("graft_occ4").toString
    val ts = new TableStore(spark, root)
    ts.append("t", Seq((1L, "a")).toDF("k", "v"))
    ts.failAfterSwaps = 1 // throw AFTER the CAS, before any rename
    intercept[IllegalStateException] {
      ts.append("t", Seq((2L, "b")).toDF("k", "v"))
    }
    ts.failAfterSwaps = -1
    // the claimed-but-dead commit: swapping manifest with the staging
    // sibling recorded, batch invisible to reads
    val m = ts.readManifest("t").get
    assert(m.swapping && m.tmp.nonEmpty)
    assert(ts.read("t").count() == 1)
    // next mutation recovers: rollback manifest, staging deleted, then
    // the new batch lands exactly once
    ts.append("t", Seq((3L, "c")).toDF("k", "v"))
    assert(ts.read("t").as[(Long, String)].collect().toSet ==
      Set((1L, "a"), (3L, "c")))
    assertNoLeaks(root, "t")
  }

  test("readPinned: snapshot against concurrent appends; read sees them") {
    val root = Files.createTempDirectory("graft_pin").toString
    val w = new TableStore(spark, root)
    w.append("t", Seq((1L, "a", "d1"), (2L, "b", "d2")).toDF("k", "v", "day"),
      partitionBy = Seq("day"))
    val pinned = w.readPinned("t")
    assert(pinned.as[(Long, String, String)].collect().toSet ==
      Set((1L, "a", "d1"), (2L, "b", "d2")))
    // a concurrent writer appends — the PINNED frame must not see it,
    // a fresh read must (partition values survive via basePath)
    new TableStore(spark, root).append("t",
      Seq((3L, "c", "d1")).toDF("k", "v", "day"), partitionBy = Seq("day"))
    assert(pinned.as[(Long, String, String)].collect().toSet ==
      Set((1L, "a", "d1"), (2L, "b", "d2")),
      "pinned snapshot leaked a concurrent append")
    assert(w.read("t").as[(Long, String, String)].collect().toSet ==
      Set((1L, "a", "d1"), (2L, "b", "d2"), (3L, "c", "d1")))
    // a new pin picks up the appended generation
    assert(w.readPinned("t").count() == 3)
  }

  test("compact(sortBy): files come back clustered; contents unchanged") {
    val ts = freshStore()
    // many small appends with interleaved keys -> unsorted small files
    (0 until 6).foreach { b =>
      ts.append("t", Seq((b * 2 + 17L) % 13, (b * 7 + 5L) % 13)
        .map(k => (k, s"v$k", s"d${k % 2}")).toDF("k", "v", "day"),
        partitionBy = Seq("day"))
    }
    val before = ts.read("t").as[(Long, String, String)].collect().toSet
    ts.compact("t", partitionCols = Seq("day"), sortBy = Seq("k"))
    assert(ts.read("t").as[(Long, String, String)].collect().toSet ==
      before, "compaction changed contents")
    // every file individually sorted on k (row-group stats monotone)
    val dir = ts.read("t").inputFiles.head
      .replaceFirst("file:", "").replaceFirst("/day=.*", "")
    new java.io.File(dir).listFiles().filter(_.getName.contains("="))
      .foreach { p =>
        p.listFiles().filter(_.getName.startsWith("part-")).foreach { f =>
          val ks = spark.read.parquet(f.getAbsolutePath)
            .select($"k").as[Long].collect().toSeq
          assert(ks == ks.sorted, s"${f.getName} not clustered: $ks")
        }
      }
    // unpartitioned path too
    val ts2 = freshStore()
    ts2.append("u", Seq(5L, 1L, 9L, 3L).map(k => (k, s"v$k"))
      .toDF("k", "v"))
    ts2.compact("u", targetFiles = 1, sortBy = Seq("k"))
    assert(ts2.read("u").inputFiles.forall { f =>
      val ks = spark.read.parquet(f.replaceFirst("file:", ""))
        .select($"k").as[Long].collect().toSeq
      ks == ks.sorted
    })
  }

  test("appendEvolve: widens schema; old rows read NULL; conflicts throw") {
    val root = Files.createTempDirectory("graft_evo").toString
    val ts = new TableStore(spark, root)
    ts.append("t", Seq((1L, "a"), (2L, "b")).toDF("k", "v"))
    assert(!ts.isEvolved("t"))
    // batch carries a NEW column -> widened; earlier rows read NULL
    ts.appendEvolve("t", Seq((3L, "c", 0.9)).toDF("k", "v", "score"))
    assert(ts.isEvolved("t"))
    val rows = ts.read("t").select($"k", $"v", $"score")
      .as[(Long, String, Option[Double])].collect().toSet
    assert(rows == Set((1L, "a", None), (2L, "b", None),
      (3L, "c", Some(0.9))))
    // batch MISSING a table column -> typed NULL fill
    ts.appendEvolve("t", Seq((4L, 0.5)).toDF("k", "score"))
    assert(ts.read("t").filter($"k" === 4L)
      .select($"v", $"score").as[(Option[String], Option[Double])]
      .collect().toSeq == Seq((None, Some(0.5))))
    // readPinned and readAt-independent plain read agree post-evolution
    assert(ts.readPinned("t").count() == 4)
    // type conflict: loud, nothing written
    val e = intercept[IllegalArgumentException] {
      ts.appendEvolve("t", Seq((5L, 7)).toDF("k", "score"))
    }
    assert(e.getMessage.contains("score"))
    assert(ts.read("t").count() == 4)
    // plain append of the ORIGINAL narrow schema still reads merged
    // (append aligns nothing — parquet merge resolves missing as NULL)
    ts.appendEvolve("t", Seq((6L, "f")).toDF("k", "v"))
    assert(ts.read("t").filter($"k" === 6L).select($"score")
      .as[Option[Double]].collect().toSeq == Seq(None))
  }

  test("appendExactlyOnce: fence skips replays; survives interleaved writers and crashes") {
    val root = Files.createTempDirectory("graft_eo").toString
    val ts = new TableStore(spark, root)
    def batch(ids: Long*) = ids.map(i => (i, s"v$i")).toDF("k", "v")
    // batch 0 creates the table; replaying it is a no-op
    assert(ts.appendExactlyOnce("t", batch(1, 2), "sA", 0))
    assert(!ts.appendExactlyOnce("t", batch(1, 2), "sA", 0))
    assert(ts.lastTxn("t", "sA") == 0L)
    assert(ts.read("t").count() == 2)
    // the fence is PER STREAM: another stream's batch 0 still lands
    assert(ts.appendExactlyOnce("t", batch(10), "sB", 0))
    // a non-streaming writer's commits CARRY the fences forward
    ts.append("t", batch(20))
    new TableStore(spark, root).upsert("t", batch(21), Seq("k"), Seq("v"))
    assert(ts.lastTxn("t", "sA") == 0L && ts.lastTxn("t", "sB") == 0L)
    assert(!ts.appendExactlyOnce("t", batch(1, 2), "sA", 0),
      "interleaved commits re-opened the replay window")
    // batch 1 lands once; crash MID-APPEND of batch 2 leaves the fence
    // at 1, so the retried delivery of batch 2 appends exactly once
    assert(ts.appendExactlyOnce("t", batch(3), "sA", 1))
    ts.failAfterSwaps = 1
    intercept[IllegalStateException] {
      ts.appendExactlyOnce("t", batch(4), "sA", 2)
    }
    ts.failAfterSwaps = -1
    assert(ts.lastTxn("t", "sA") == 1L, "crashed batch advanced the fence")
    assert(ts.read("t").filter($"k" === 4L).count() == 0)
    assert(ts.appendExactlyOnce("t", batch(4), "sA", 2))
    assert(!ts.appendExactlyOnce("t", batch(4), "sA", 2))
    assert(ts.read("t").filter($"k" === 4L).count() == 1)
    assert(ts.read("t").count() == 7)
  }

  test("OCC: cleanStaging drops pre-CAS orphans, never the manifest-recorded staging") {
    val root = Files.createTempDirectory("graft_occ5").toString
    val ts = new TableStore(spark, root)
    ts.append("t", Seq((1L, "a")).toDF("k", "v"))
    // fabricate a pre-CAS orphan (writer died before its manifest)
    val orphan = new java.io.File(root, "t__add.deadbeef0000")
    orphan.mkdirs()
    new java.io.File(orphan, "part-orphan.parquet").createNewFile()
    // and a live crashed-after-CAS staging (manifest-recorded)
    ts.failAfterSwaps = 1
    intercept[IllegalStateException] {
      ts.append("t", Seq((2L, "b")).toDF("k", "v"))
    }
    ts.failAfterSwaps = -1
    val recorded = ts.readManifest("t").get.tmp.get
    ts.cleanStaging("t")
    val names = new java.io.File(root).listFiles().map(_.getName).toSet
    assert(!names.contains("t__add.deadbeef0000"), "orphan survived")
    assert(names.contains(recorded),
      "cleanStaging deleted the manifest-recorded (recover-owned) staging")
    // recover still owns the recorded staging
    ts.append("t", Seq((3L, "c")).toDF("k", "v"))
    assertNoLeaks(root, "t")
  }

  test("append layout guard: partitioned batch into a FLAT non-empty table rejects") {
    val ts = freshStore()
    // flat table WITH committed files — its layout is Nil, which is
    // NOT a waiver: a partitioned batch would commit partition dirs
    // next to root data files (broken partition discovery, not
    // auto-recoverable)
    ts.append("t", Seq((1L, "a", "d0")).toDF("k", "v", "day"))
    val e = intercept[IllegalArgumentException] {
      ts.append("t", Seq((2L, "b", "d1")).toDF("k", "v", "day"),
        partitionBy = Seq("day"))
    }
    assert(e.getMessage.contains("layouts must match"))
    // nothing committed, table still reads flat
    assert(ts.read("t").count() == 1)
    assert(ts.read("t").inputFiles.forall(!_.contains("day=")))
    // the reverse directions stay rejected too
    val ts2 = freshStore()
    seedPartitioned(ts2, "p")
    intercept[IllegalArgumentException] {
      ts2.append("p", Seq((1L, 0, "d9")).toDF("id", "flag", "day"))
    }
  }

  test("exactly-once fence: zombie commit between fence read and CAS anchor cannot double the batch") {
    val root = Files.createTempDirectory("graft_fence").toString
    val w1 = new TableStore(spark, root)
    val w2 = new TableStore(spark, root)
    w1.swapWaitMs = 0L; w2.swapWaitMs = 0L
    w1.append("t", Seq((1L, "seed")).toDF("k", "v"))
    assert(w1.appendExactlyOnce("t", Seq((2L, "b5")).toDF("k", "v"),
      "s", 5L))
    // the TOCTOU window: w1 reads fence=5 and decides to append batch
    // 6; a zombie (w2, the pre-crash incarnation's in-flight write)
    // commits the SAME batch before w1 reaches its CAS anchor. The
    // anchor sees the newer head, so the seq CAS alone would pass —
    // only the fence re-validation catches the replay.
    var fired = false
    w1.afterFenceRead = () => if (!fired) {
      fired = true
      assert(w2.appendExactlyOnce("t", Seq((3L, "b6")).toDF("k", "v"),
        "s", 6L))
    }
    val appended = w1.appendExactlyOnce("t",
      Seq((3L, "b6")).toDF("k", "v"), "s", 6L)
    w1.afterFenceRead = () => ()
    assert(fired)
    assert(!appended, "replayed batch must be fence-skipped")
    // batch 6 landed EXACTLY once
    assert(w1.read("t").count() == 3)
    assert(w1.lastTxn("t", "s") == 6L)
    assertNoLeaks(root, "t")
  }

  test("column order stays uniform across files: reordered appends and key deletes") {
    val ts = freshStore()
    // table whose KEY is not the first column — the antiDelete find
    ts.append("t", Seq(("a", 1L, 10L), ("b", 2L, 20L), ("c", 3L, 30L))
      .toDF("tag", "k", "v"))
    // 1. deleteByKeys must NOT persist the join's key-first order
    ts.deleteByKeys("t", Seq(2L).toDF("k"), Seq("k"))
    assert(ts.read("t").columns.toSeq == Seq("tag", "k", "v"))
    // 2. an append with the same columns in a DIFFERENT order is
    //    normalized to the committed order before it writes
    ts.append("t", Seq((4L, 40L, "d")).toDF("k", "v", "tag"))
    val files = ts.read("t").inputFiles
    assert(files.length >= 2)
    files.foreach { f =>
      val cols = spark.read.parquet(f).columns.toSeq
      assert(cols == Seq("tag", "k", "v"), s"$f has $cols")
    }
    // positional consumers see one stable order regardless of which
    // footer gets sampled
    assert(ts.read("t").as[(String, Long, Long)].collect().toSet ==
      Set(("a", 1L, 10L), ("c", 3L, 30L), ("d", 4L, 40L)))
  }

  test("append/rewrite return THIS commit's generation; readAt(pin) reproduces it") {
    // retention on: the returned generation is exercised as a
    // time-travel pin below
    val ts = new TableStore(spark,
      Files.createTempDirectory("graft_ts").toString,
      retainGenerations = 10)
    // first-time append routes through the fresh-table rewrite fence
    val g1 = ts.append("g", spark.range(5).toDF("id"))
    assert(g1 == ts.generations("g").last)
    val g2 = ts.append("g", spark.range(5, 10).toDF("id"))
    assert(g2 == g1 + 1 && g2 == ts.generations("g").last)
    // a batch that commits nothing returns the CURRENT generation
    // (whose content the no-op batch trivially reflects)
    val gE = ts.append("g", spark.range(0).toDF("id"))
    assert(gE == ts.generations("g").last)
    val g3 = ts.rewrite("g", spark.range(100, 103).toDF("id"))
    assert(g3 == ts.generations("g").last)
    // the returned value is the caller's reproducibility anchor: later
    // commits must not disturb what the pinned generation re-reads —
    // the race the old post-commit generations().last read had
    ts.append("g", spark.range(200, 210).toDF("id"))
    assert(ts.readAt("g", g3).as[Long].collect().toSet ==
      Set(100L, 101L, 102L))
    assert(ts.readAt("g", g2).as[Long].collect().toSet ==
      (0L until 10L).toSet)
  }

  test("named tags: human handles on pinned generations") {
    val ts = retainedStore(10)
    ts.append("t", spark.range(0, 5).toDF("id"))
    val g1 = ts.tag("t", "v1")
    ts.append("t", spark.range(5, 10).toDF("id"))
    val g2 = ts.tag("t", "v2")
    // v1 still reads the first five rows after the append
    assert(ts.readTag("t", "v1").as[Long].collect().toSet ==
      (0L until 5L).toSet)
    assert(ts.readTag("t", "v2").as[Long].collect().toSet ==
      (0L until 10L).toSet)
    assert(ts.tags("t") == Map("v1" -> g1, "v2" -> g2))
    // re-tag moves the name; drop removes only the name
    ts.tag("t", "v1", Some(g2))
    assert(ts.readTag("t", "v1").count() == 10L)
    ts.dropTag("t", "v1")
    assert(ts.tagGeneration("t", "v1").isEmpty)
    assert(ts.readAt("t", g1).count() == 5L) // generation untouched
    // explicit past-generation tagging works through retention
    ts.tag("t", "first", Some(g1))
    assert(ts.readTag("t", "first").count() == 5L)
    // guards are loud
    intercept[IllegalArgumentException] { ts.readTag("t", "nope") }
    intercept[IllegalArgumentException] { ts.tag("t", "bad.name") }
    intercept[IllegalArgumentException] { ts.tag("t", "") }
    intercept[IllegalArgumentException] {
      ts.tag("t", "future", Some(g2 + 50))
    }
    // unretained store: tagging a vacuumed generation fails loudly
    val bare = freshStore()
    bare.append("u", spark.range(0, 3).toDF("id"))
    val h1 = bare.tags("u") // no tags yet
    assert(h1.isEmpty)
    bare.append("u", spark.range(3, 6).toDF("id"))
    val old = bare.generations("u").head
    if (old < bare.generations("u").last)
      intercept[IllegalArgumentException] {
        bare.tag("u", "gone", Some(old))
      }
  }
}
