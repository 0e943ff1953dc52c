package graft.sources

import org.apache.hadoop.fs.{FileSystem, Path}
import org.apache.spark.sql.{DataFrame, SaveMode, SparkSession}
import org.apache.spark.sql.catalyst.catalog.ExternalCatalogUtils
import org.apache.spark.sql.functions.{broadcast, col}
import graft.operators.Upsert

/** Another writer committed a manifest between this mutation's read of
  * the table state and its begin-commit CAS (the Delta/Iceberg
  * optimistic-concurrency shape): the mutation's inputs are stale.
  * The public mutation methods catch this internally and retry the
  * WHOLE operation against the new generation up to
  * `maxCommitRetries` times; it escapes only when retries are
  * exhausted (sustained write contention — back off at the caller).
  */
final class ConcurrentCommitException(val table: String,
                                      val expectedSeq: Long,
                                      val foundSeq: Long,
                                      what: String = "manifest seq")
  extends RuntimeException(
    s"table $table: concurrent writer advanced $what to $foundSeq " +
      s"(this mutation read $what $expectedSeq) — inputs are " +
      "stale; retry the operation against the new generation")

/** Parquet-backed table store: the engine-native replacement for the
  * reference's Postgres/Supabase serving sink (SURVEY.md §2.1 S13,
  * K2/K3/K7/K8). A table = a parquet directory under `root`.
  *
  * Semantics re-expressed as DataFrame algebra:
  *  - append            = K3 plain insert
  *  - upsert(keys)      = K2 INSERT ... ON CONFLICT DO NOTHING
  *  - deleteByKeys      = K8 conditional delete
  *  - updateFlag        = K7 row update (flag flip) as a rewrite
  *
  * Storage goes through the Hadoop FileSystem API resolved from the
  * root path — the same store code runs on local fs, HDFS, or an
  * object store (s3a/gs/abfs), not just java.io. Mutations on
  * PARTITIONED tables are partition-targeted: `updateFlag` /
  * `deleteByKeys` with `partitionCols` rewrite only the partition
  * directories that contain affected keys (write to a `__tmp` sibling,
  * then per-partition rename swap), so a flag flip on one day of a
  * year-partitioned 100 TB table moves one day's bytes, not the year's,
  * and a crash at any point leaves each partition wholly old or wholly
  * new. Unpartitioned tables use the same temp-swap at table
  * granularity (single-writer assumption, SURVEY.md §7.4).
  *
  * CROSS-partition atomicity comes from a `_graft_commit` manifest (a
  * tiny sequenced sidecar FILE next to the table dir, so it never moves
  * with a dir rename): every rewrite records `state=swapping` plus the
  * touched partition dirs before the first rename and commits with a
  * `state=clean, generation+1` manifest after the last. [[read]]
  * resolves a swapping manifest by preferring each touched dir's
  * `__old` copy — a crash ANYWHERE inside the swap therefore reads as
  * wholly the previous generation, never a mix — and every mutation
  * rolls a crashed swap back to that generation before proceeding.
  * Manifest files are single small writes (atomic create on every FS;
  * a single PUT on object stores). On stores without atomic dir rename
  * (raw S3, where a dir rename is a file-by-file copy+delete) the
  * manifest also records the committed generation's data files PER
  * touched dir, so a crash inside a single dir's swap — files split
  * between the live dir and `__old` — still reads and recovers as
  * wholly the previous generation: individual object writes are atomic
  * even when dir renames are not, and the per-file list reassembles
  * exactly the committed files wherever each one landed.
  *
  * MULTI-WRITER commits are optimistic (round 8): every mutation
  * captures the head manifest sequence when it reads table state,
  * stages its output in a WRITER-UNIQUE sibling
  * (`<table>__tmp.<nonce>` / `<table>__add.<nonce>` — two concurrent
  * writers never share a staging dir), and claims the commit by
  * creating the swapping manifest at `seq+1` with CREATE-EXCLUSIVE —
  * the protocol's stated atomic FS primitive. Exactly one writer per
  * sequence number wins; the loser gets [[ConcurrentCommitException]]
  * BEFORE any live-tree rename, deletes its staging, and the public
  * mutation methods re-derive the whole operation (re-read, recompute,
  * re-stage) against the new generation up to `maxCommitRetries`
  * times — the Delta/Iceberg commit-CAS shape on the existing
  * manifest machinery. The swapping manifest doubles as the swap
  * lock: no competing writer can CAS past it, so the rename phase is
  * exclusive and `__old` stays single-owner. A retrying LOSER first
  * waits (`swapWaitMs`) for the winner's in-flight swap to settle, so
  * an ordinary collision never rolls back a live writer's swap.
  * Residual caveat: [[recover]] itself still treats a swapping head
  * as CRASHED — true liveness detection (leases) is out of scope, so
  * an EXTERNAL recover() run against a live writer, or a winner
  * stalled past the wait window, remains a protocol violation.
  */
final class TableStore(spark: SparkSession, root: String,
                       retainGenerations: Int = 0,
                       maxCommitRetries: Int = 5) {

  private def path(table: String) = s"$root/$table"
  private def hpath(table: String) = new Path(path(table))
  private def fsOf(p: Path): FileSystem =
    p.getFileSystem(spark.sessionState.newHadoopConf())

  /** Fault-injection seam for crash-consistency specs: when >= 0, the
    * Nth directory rename inside a swap throws, simulating a process
    * kill mid-swap. Never set outside tests.
    */
  private[sources] var failAfterSwaps: Int = -1
  private def swapFault(done: Int): Unit =
    if (failAfterSwaps >= 0 && done >= failAfterSwaps)
      throw new IllegalStateException("injected crash mid-swap")

  /** Second seam: throw AFTER the clean commit manifest but BEFORE the
    * `__old` sibling is disposed — the post-commit window where a
    * retained store's history sits in `__old`, not yet archived.
    */
  private[sources] var failBeforeDispose: Boolean = false
  private def disposeFault(): Unit =
    if (failBeforeDispose)
      throw new IllegalStateException("injected crash before dispose")

  /** Third seam: throw AFTER a predicate-delete's tombstone commit but
    * BEFORE its physical settle — the window where reads must exclude
    * tombstoned files that still exist on disk.
    */
  private[sources] var failBeforeSettle: Boolean = false
  private def settleFault(): Unit =
    if (failBeforeSettle)
      throw new IllegalStateException("injected crash before settle")

  // ------------------------------------------------------ commit manifest

  /** `dirs` = touched dirs that HAD a committed copy (rollback =
    * restore `__old`); `fresh` = dirs the swap creates that had NO
    * prior copy (rollback = delete — without the distinction a crash
    * after a fresh dir renames in would read/recover new-generation
    * rows alongside rolled-back old ones: mixed generations, then
    * duplicates). `files` = the committed generation's data-file names
    * per touched dir, recorded before the first rename: on stores
    * whose dir rename is file-by-file (raw S3), a crash INSIDE one
    * dir's swap strands its files split between the live dir and
    * `__old` — the per-file list lets [[read]]/[[recover]] reassemble
    * exactly the committed files wherever each one currently lives
    * (individual object copies are atomic even when dir renames are
    * not), closing the last non-atomic window. `adds` = file paths an
    * in-flight APPEND is moving into the table: they hold only
    * uncommitted new rows, so a crashed append reads and recovers as
    * the table WITHOUT them (the inverse of `files`, which lists the
    * committed inventory of a rewrite).
    */
  private[sources] case class Manifest(seq: Long, gen: Long,
                                       swapping: Boolean, dirs: Seq[String],
                                       fresh: Seq[String],
                                       files: Map[String, Seq[String]] = Map.empty,
                                       adds: Seq[String] = Nil,
                                       tmp: Option[String] = None,
                                       txns: Map[String, Long] = Map.empty,
                                       drops: Seq[String] = Nil)

  private def manifestName(table: String) = s"$table._graft_commit."

  /** Targeted glob, not a listing of the whole store root: the
    * manifest check runs on EVERY [[read]], and a root listStatus
    * would scale with the number of tables in the store. The remaining
    * cost per read is this one glob plus at most one small GET —
    * marginal next to the file listing the parquet scan itself does.
    */
  private def listManifests(table: String): Seq[(Long, Path)] = {
    val rootP = new Path(root)
    val fs = fsOf(rootP)
    val matched = fs.globStatus(new Path(rootP, manifestName(table) + "*"))
    if (matched == null) Nil
    else {
      val pre = manifestName(table)
      matched.toSeq.map(_.getPath)
        .flatMap(p => p.getName.stripPrefix(pre).toLongOption.map(_ -> p))
    }
  }

  // Committed-SCHEMA cache, keyed by (table, head manifest sequence):
  // every mutation consults the committed schema (column-order
  // normalization, type-conflict validation, assignment checks), and a
  // parquet schema inference pays a listing + footer read (~90 ms
  // measured) each time — the dominant fixed cost of small commits.
  // The committed schema can only change when a commit bumps the head
  // sequence, and the key is re-read from the ON-DISK head manifest,
  // so an external writer's commit invalidates naturally (the
  // Delta/Iceberg metadata-caching norm; data is never cached). One
  // entry per table: superseded generations evict.
  private val schemaCache = scala.collection.mutable.HashMap
    .empty[String, (Long, org.apache.spark.sql.types.StructType)]
  private def committedSchema(table: String)
      : org.apache.spark.sql.types.StructType = {
    val seq = readManifest(table).map(_.seq).getOrElse(-1L)
    schemaCache.synchronized { schemaCache.get(table) } match {
      case Some((s, sch)) if s == seq => sch
      case _ =>
        val sch = read(table).schema
        schemaCache.synchronized { schemaCache.update(table, (seq, sch)) }
        sch
    }
  }

  private[sources] def readManifest(table: String): Option[Manifest] = {
    // a concurrent writer prunes superseded manifests AFTER creating
    // its successor: the file we globbed can vanish before our open.
    // Re-list on FileNotFound — by then the successor exists (prune
    // strictly follows create), so the loop terminates
    var attempts = 0
    while (true) {
      val ms = listManifests(table)
      if (ms.isEmpty) return None
      val (seq, p) = ms.maxBy(_._1)
      val txt =
        try {
          val in = fsOf(p).open(p)
          try scala.io.Source.fromInputStream(in, "UTF-8").mkString
          finally in.close()
        } catch {
          case e: java.io.FileNotFoundException =>
            attempts += 1
            if (attempts > 50) throw e
            null
        }
      if (txt != null) return Some(parseManifest(seq, txt))
    }
    None
  }

  private def parseManifest(seq: Long, txt: String): Manifest = {
    val lines = txt.split("\n").toSeq.filter(_.nonEmpty)
      def vs(k: String) =
        lines.filter(_.startsWith(k + "=")).map(_.stripPrefix(k + "="))
      // `f=` lines belong to the most recent `dir=` line (positional:
      // file names join their dir without needing an escaped separator)
      val files = scala.collection.mutable.Map.empty[String, Vector[String]]
      var curDir: Option[String] = None
      lines.foreach { l =>
        if (l.startsWith("dir=")) curDir = Some(l.stripPrefix("dir="))
        else if (l.startsWith("new=")) curDir = None
        else if (l.startsWith("f=")) curDir.foreach { d =>
          files(d) = files.getOrElse(d, Vector.empty) :+ l.stripPrefix("f=")
        }
      }
      val txns = vs("txn").flatMap { t =>
        val cut = t.lastIndexOf(':')
        if (cut <= 0) None
        else t.drop(cut + 1).toLongOption.map(t.take(cut) -> _)
      }.toMap
    Manifest(seq, vs("gen").headOption.map(_.toLong).getOrElse(0L),
      vs("state").headOption.contains("swapping"), vs("dir"), vs("new"),
      files.toMap, vs("add"), vs("tmp").headOption, txns, vs("drop"))
  }

  /** New manifests get a fresh sequence number and older files are
    * pruned only after the new one exists — a crash between the two
    * leaves both on disk and readers take the max, so the manifest
    * itself needs no atomic overwrite.
    *
    * With `expectedPrev = Some(s)` this is the COMMIT CAS: the new
    * manifest is created with CREATE-EXCLUSIVE at exactly `s + 1`, and
    * a head past `s` (or losing the exclusive create) throws
    * [[ConcurrentCommitException]] — exactly one writer per sequence
    * number ever succeeds. Without it (recovery rollbacks), the write
    * retries fresh sequence numbers until one lands.
    */
  private def writeManifest(table: String, gen: Long, swapping: Boolean,
                            dirs: Seq[String],
                            fresh: Seq[String] = Nil,
                            files: Map[String, Seq[String]] = Map.empty,
                            adds: Seq[String] = Nil,
                            tmpName: Option[String] = None,
                            expectedPrev: Option[Long] = None,
                            txnUpdate: Option[(String, Long)] = None,
                            drops: Seq[String] = Nil): Unit = {
    val fs = fsOf(new Path(root))
    // stream-fencing records ride EVERY manifest (carried forward from
    // the head, updated only by an exactly-once commit) — losing one
    // on an unrelated commit would re-open the replay window
    val txns = readManifest(table).map(_.txns).getOrElse(Map.empty) ++
      txnUpdate
    val body = (Seq(s"gen=$gen",
      s"state=${if (swapping) "swapping" else "clean"}") ++
      dirs.flatMap(d => ("dir=" + d) +:
        files.getOrElse(d, Nil).map("f=" + _)) ++
      fresh.map("new=" + _) ++ adds.map("add=" + _) ++
      tmpName.map("tmp=" + _) ++
      txns.toSeq.sortBy(_._1).map { case (s, b) => s"txn=$s:$b" } ++
      drops.map("drop=" + _))
      .mkString("", "\n", "\n")
    // returns false only when the exclusive create lost a race
    def create(seq: Long, known: Seq[(Long, Path)]): Boolean = {
      val p = new Path(root, manifestName(table) + seq)
      val won =
        try {
          val out = fs.create(p, false)
          // from here the path is OURS (create was exclusive): a
          // write/close failure must DELETE the partial file before
          // escalating — "exists" alone cannot distinguish my
          // truncated manifest from a competitor's, and a truncated
          // manifest left as head parses as gen=0 with EMPTY txn
          // fences (re-opening every exactly-once replay window)
          try {
            try out.write(body.getBytes("UTF-8")) finally out.close()
          } catch {
            case e: Throwable =>
              try fs.delete(p, false) catch { case _: Throwable => () }
              throw e
          }
          true
        } catch {
          case e: java.io.IOException => if (fs.exists(p)) false else throw e
        }
      if (won) known.foreach { case (s, old) =>
        if (s < seq) fs.delete(old, false)
      }
      won
    }
    expectedPrev match {
      case Some(exp) =>
        val ms = listManifests(table)
        val head = ms.map(_._1).maxOption.getOrElse(0L)
        if (head != exp)
          throw new ConcurrentCommitException(table, exp, head)
        if (!create(exp + 1, ms))
          throw new ConcurrentCommitException(table, exp, exp + 1)
      case None =>
        var attempts = 0
        var done = false
        while (!done) {
          val ms = listManifests(table)
          done = create(ms.map(_._1).maxOption.getOrElse(0L) + 1, ms)
          attempts += 1
          if (!done && attempts > 50) throw new IllegalStateException(
            s"table $table: could not claim a manifest sequence after " +
              s"$attempts attempts — sustained manifest contention")
        }
    }
  }

  /** Unique per-mutation staging sibling (`<table><kind>.<nonce>`):
    * concurrent writers stage independently and never rename each
    * other's files in. Recorded in the swapping manifest (`tmp=`) so
    * [[recover]] can clear a crashed writer's staging.
    */
  private def freshStaging(table: String, kind: String): Path =
    new Path(path(table) + kind + "." +
      java.util.UUID.randomUUID().toString.replace("-", "").take(12))

  /** How long a retrying loser waits for the WINNING writer's swap
    * phase (renames + clean commit — normally milliseconds) to settle
    * before presuming the winner dead. Test seam; production default
    * is generous because a wrong "dead" call rolls back a live swap.
    */
  private[sources] var swapWaitMs: Long = 10000L

  /** After LOSING a commit CAS, the head manifest may be the winner's
    * LIVE in-flight swap. The body's recover() would treat it as
    * crashed and roll it back mid-rename — the protocol violation the
    * class doc forbids (the winner's files orphan, its clean commit
    * escalates). A loser KNOWS a competitor is alive (it just lost to
    * one), so it waits for the swap to settle; only a swap that makes
    * no progress for the full window is presumed crashed and left to
    * recover(). First-entry mutations (no collision observed) still
    * recover immediately — crash repair must not wait.
    */
  private def awaitSwapSettled(table: String): Unit = {
    val deadline = System.nanoTime + swapWaitMs * 1000000L
    while (System.nanoTime < deadline &&
        readManifest(table).exists(_.swapping)) {
      Thread.sleep(50)
    }
  }

  /** Every mutation's entry gate: if the head manifest is a swapping
    * one, it may be a LIVE competitor mid-rename — wait for it to
    * settle (normally milliseconds) before recover() treats whatever
    * remains as crashed. Zero overhead on the common clean-head path.
    */
  private def settleOrRecover(table: String): Unit = {
    if (readManifest(table).exists(_.swapping)) awaitSwapSettled(table)
    recover(table)
  }

  /** Retry a whole mutation on optimistic-commit collision: the body
    * must RE-DERIVE everything (re-read table state, recompute frames,
    * re-stage) each attempt — it runs against a newer generation.
    */
  private def retryCommit[T](body: => T): T = {
    var attempt = 0
    var lostTo: String = null
    while (true) {
      try {
        if (lostTo != null) awaitSwapSettled(lostTo)
        return body
      } catch {
        case e: ConcurrentCommitException =>
          attempt += 1
          if (attempt > maxCommitRetries) throw e
          lostTo = e.table
      }
    }
    throw new IllegalStateException("unreachable")
  }

  /** Test seam: invoked immediately before a mutation's begin-commit
    * CAS (after staging is written, before any manifest/rename) — a
    * spec interleaves a competing writer's full mutation here to force
    * a deterministic commit collision. Never set outside tests.
    */
  private[sources] var beforeBeginCommit: () => Unit = () => ()

  /** Fifth seam: invoked immediately AFTER a fenced mutation
    * ([[appendExactlyOnce]], [[merge]] with `txn`, [[refreshRollup]])
    * reads its txn fence and decides to proceed — a spec interleaves a
    * competing fenced commit here to prove the fence is re-validated
    * under the commit-CAS anchor (the zombie-writer TOCTOU window).
    * Never set outside tests.
    */
  private[sources] var afterFenceRead: () => Unit = () => ()

  /** Fence re-validation under the CAS anchor: a fenced mutation reads
    * `lastTxn` BEFORE staging, but only the head manifest captured as
    * the commit-CAS anchor is race-free — a zombie writer committing
    * the same fence between the two reads would otherwise be invisible
    * (the anchor sees the newer seq, the CAS succeeds, the batch lands
    * twice). Bodies call this on their anchored head; a mismatch
    * throws [[ConcurrentCommitException]] so `retryCommit` re-reads
    * the fence and skips the replay.
    */
  private def checkFence(table: String, head: Option[Manifest],
                         expected: Option[(String, Long)]): Unit =
    expected.foreach { case (k, v) =>
      val cur = head.flatMap(_.txns.get(k)).getOrElse(-1L)
      if (cur != v)
        throw new ConcurrentCommitException(table, v, cur,
          what = s"txn fence $k")
    }

  /** Fourth seam: invoked INSIDE an append's swap window (swapping
    * manifest committed, renames not yet run) — a spec blocks here to
    * hold a LIVE swap open while a competing writer collides, proving
    * the loser waits instead of rolling the live swap back. Never set
    * outside tests.
    */
  private[sources] var midSwapPause: () => Unit = () => ()

  /** Relative paths of the committed data files under `dir` (recursive:
    * an unpartitioned touched dir is the whole table tree). Metadata
    * sidecars (`_SUCCESS`, checksums) are not part of the committed
    * generation's rows and are skipped.
    */
  /** Target size for data files this store writes (bytes). Read from
    * `spark.graft.targetFileBytes` with the parquet-standard 128 MiB
    * default — scale-adaptive via conf, never a constant tuned to one
    * box.
    */
  private lazy val targetFileBytes: Long =
    spark.conf.getOption("spark.graft.targetFileBytes")
      .map(_.toLong).getOrElse(128L * 1024 * 1024)

  /** Compact a freshly-written FLAT staging dir whose output came out
    * badly fragmented — many files far below [[targetFileBytes]] (a
    * frame whose last stage was a 32-partition scan or a frozen cached
    * partitioning writes one near-empty file per task). Small files
    * hurt twice (guide: listing/planning per commit, footer-per-file
    * on every later read of the table), and at lifecycle-query scale
    * the read-back cost dominates the one extra tiny job this pays.
    * At production scale files approach the target and this never
    * triggers. Partitioned layouts pass through untouched (per-dir
    * sizing is the compact()/z-order path's business). Staging-only:
    * a crash here aborts cleanly, nothing has touched the live tree.
    */
  private def compactStaging(tmp: Path, fs: FileSystem,
                             partitionBy: Seq[String]): Unit = {
    if (partitionBy.nonEmpty) return
    val files = dataFiles(fs, tmp)
    if (files.size <= 1) return
    val bytes = files.map(r => fs.getFileStatus(sub(tmp, r)).getLen).sum
    val ideal = math.max(1L, (bytes + targetFileBytes - 1) / targetFileBytes)
    if (files.size <= 4 * ideal) return
    val tmp2 = new Path(tmp.getParent, tmp.getName + ".c")
    spark.read.parquet(tmp.toString).coalesce(ideal.toInt)
      .write.mode(SaveMode.Overwrite).parquet(tmp2.toString)
    fs.delete(tmp, true)
    fs.rename(tmp2, tmp)
  }

  private def dataFiles(fs: FileSystem, dir: Path, rel: String = ""): Seq[String] =
    if (!fs.exists(dir)) Nil
    else fs.listStatus(dir).toSeq.flatMap { st =>
      val name = st.getPath.getName
      val r = if (rel.isEmpty) name else s"$rel/$name"
      if (st.isDirectory) dataFiles(fs, st.getPath, r)
      else if (name.startsWith("_") || name.startsWith(".")) Nil
      else Seq(r)
    }

  private def sub(base: Path, rel: String): Path =
    if (rel.isEmpty) base else new Path(base, rel)

  /** Roll a crashed swap BACK to the manifest generation: every touched
    * dir whose `__old` copy exists is restored, every `fresh` dir (no
    * committed copy existed) is DELETED — it holds only uncommitted
    * new-generation rows — and siblings and the swapping manifest are
    * cleared. Mutations call this first; reads never mutate (they
    * resolve the crashed state logically instead).
    */
  private[sources] def recover(table: String): Unit =
    readManifest(table).filter(_.swapping).foreach { m =>
      val dst = hpath(table)
      val fs = fsOf(dst)
      val bak = new Path(path(table) + "__old")
      val tmp = new Path(path(table) + "__tmp")
      m.dirs.foreach { rel =>
        val o = sub(bak, rel)
        val c = sub(dst, rel)
        val committed = m.files.getOrElse(rel, Nil)
        if (committed.nonEmpty) {
          // per-file rollback: a crash INSIDE this dir's file-by-file
          // rename may have left committed files split between the
          // live dir and __old, and uncommitted new-generation files
          // already renamed in. Restore = drop data files not in the
          // committed list, then pull each committed file back from
          // __old wherever the swap had moved it.
          if (fs.exists(c)) {
            val keep = committed.toSet
            dataFiles(fs, c).foreach { rf =>
              if (!keep.contains(rf)) fs.delete(sub(c, rf), false)
            }
          }
          committed.foreach { rf =>
            val ob = sub(o, rf)
            if (fs.exists(ob)) {
              val cb = sub(c, rf)
              if (fs.exists(cb)) fs.delete(cb, false)
              fs.mkdirs(cb.getParent)
              fs.rename(ob, cb)
            }
          }
        } else if (fs.exists(o)) {
          // legacy manifest without a file list: whole-dir restore
          fs.delete(c, true)
          fs.mkdirs(c.getParent)
          fs.rename(o, c)
        }
      }
      m.fresh.foreach { rel => fs.delete(sub(dst, rel), true) }
      // crashed append: drop whichever uncommitted batch files already
      // moved in; the staging sibling holds the rest
      m.adds.foreach { rel => fs.delete(sub(dst, rel), false) }
      // the crashed writer's manifest-recorded staging sibling, plus
      // the legacy fixed-name siblings pre-unique-staging stores used
      m.tmp.foreach { name => fs.delete(new Path(root, name), true) }
      fs.delete(new Path(path(table) + "__add"), true)
      fs.delete(tmp, true)
      fs.delete(bak, true)
      writeManifest(table, m.gen, swapping = false, Nil)
    }

  def exists(table: String): Boolean = {
    val p = hpath(table)
    readManifest(table) match {
      // crashed FIRST-TIME rewrite: the committed generation is "no
      // table" even if the renamed-in dir survives on disk
      case Some(m) if m.swapping && m.fresh.contains("") =>
        fsOf(p).exists(new Path(path(table) + "__old"))
      case Some(m) if m.swapping =>
        fsOf(p).exists(p) ||
          fsOf(p).exists(new Path(path(table) + "__old"))
      case _ => fsOf(p).exists(p)
    }
  }

  /** Table scan. Under a `clean` manifest (or none) this is a plain
    * parquet read. Under a `swapping` manifest — a rewrite crashed
    * mid-swap — every touched dir with a surviving `__old` copy reads
    * from that copy, untouched and not-yet-swapped dirs read in place:
    * wholly the committed generation, never a mix of old and new.
    */
  def read(table: String): DataFrame = readManifest(table) match {
    case Some(m) if m.swapping =>
      val dstS = path(table)
      val bakS = dstS + "__old"
      val dst = new Path(dstS)
      val fs = fsOf(dst)
      val liveOld = m.dirs.filter(rel => fs.exists(sub(new Path(bakS), rel)))
      if (m.fresh.contains(""))
        // crashed first-time rewrite: the committed generation is "no
        // table"; whatever renamed in is uncommitted
        throw new IllegalStateException(
          s"table $table has no committed generation (first-time rewrite " +
            "crashed mid-swap); run a mutation to recover, or rewrite again")
      else if (m.adds.nonEmpty) {
        // crashed append: the committed generation is every data file
        // EXCEPT the listed uncommitted adds (whichever of them
        // already moved in)
        val keep = dataFiles(fs, dst).filterNot(m.adds.toSet)
        if (keep.isEmpty) throw new IllegalStateException(
          s"table $table: crashed append left no committed files")
        rd(table).option("basePath", dstS)
          .parquet(keep.map(r => s"$dstS/$r"): _*)
      }
      else if (m.files.nonEmpty) {
        // per-file reconstruction: the manifest lists the committed
        // generation's data files per touched dir, so even a crash
        // INSIDE one dir's file-by-file rename (raw-S3 semantics —
        // files split between the live dir and __old) reads as wholly
        // the committed generation: each listed file is taken from
        // __old if the swap moved it, else from the live dir, and
        // nothing not on the list is read from a touched dir.
        val bakP = new Path(bakS)
        val fromBak = Seq.newBuilder[String]
        val fromCur = Seq.newBuilder[String]
        m.dirs.foreach { rel =>
          val committed = m.files.getOrElse(rel, Nil)
          if (committed.isEmpty) {
            // a touched dir with no recorded files (committed-empty):
            // contributes no rows
          } else committed.foreach { rf =>
            val r = if (rel.isEmpty) rf else s"$rel/$rf"
            if (fs.exists(new Path(bakP, r))) fromBak += s"$bakS/$r"
            else fromCur += s"$dstS/$r"
          }
        }
        val touched = (m.dirs ++ m.fresh).toSet
        if (!touched.contains("")) {
          val depth = touched.head.count(_ == '/') + 1
          val allCur = if (fs.exists(dst)) leafDirs(fs, dst, depth, "") else Nil
          allCur.filterNot(touched).foreach(rel => fromCur += s"$dstS/$rel")
        }
        val bakPaths = fromBak.result()
        val curPaths = fromCur.result()
        val oldDf =
          if (bakPaths.isEmpty) None
          else Some(rd(table).option("basePath", bakS).parquet(bakPaths: _*))
        val curDf =
          if (curPaths.isEmpty) None
          else Some(rd(table).option("basePath", dstS).parquet(curPaths: _*))
        (oldDf, curDf) match {
          case (Some(o), Some(c)) => o.unionByName(c)
          case (Some(o), None)    => o
          case (None, Some(c))    => c
          case (None, None)       =>
            throw new IllegalStateException(
              s"table $table: crashed swap left no committed partitions")
        }
      }
      else if (liveOld.isEmpty && m.fresh.isEmpty)
        rd(table).parquet(dstS)
      else if (liveOld.contains("")) rd(table).parquet(bakS)
      else {
        val depth = (liveOld ++ m.fresh).head.count(_ == '/') + 1
        val allCur =
          if (fs.exists(dst)) leafDirs(fs, dst, depth, "") else Nil
        // fresh dirs hold ONLY uncommitted new-generation rows — a
        // crash after their rename-in must not leak them into a read
        // of the committed generation
        val curKeep = allCur.filterNot((liveOld ++ m.fresh).toSet)
        val oldDf =
          if (liveOld.isEmpty) None
          else Some(rd(table).option("basePath", bakS)
            .parquet(liveOld.map(r => s"$bakS/$r"): _*))
        val curDf =
          if (curKeep.isEmpty) None
          else Some(rd(table).option("basePath", dstS)
            .parquet(curKeep.map(r => s"$dstS/$r"): _*))
        (oldDf, curDf) match {
          case (Some(o), Some(c)) => o.unionByName(c)
          case (Some(o), None)    => o
          case (None, Some(c))    => c
          case (None, None)       =>
            throw new IllegalStateException(
              s"table $table: crashed swap left no committed partitions")
        }
      }
    case Some(m) if m.drops.nonEmpty =>
      // clean manifest with TOMBSTONES: a predicate delete committed
      // but its dropped files are not yet physically settled — the
      // committed generation is every data file EXCEPT the drops
      val dstS = path(table)
      val fs = fsOf(hpath(table))
      val keep = dataFiles(fs, hpath(table)).filterNot(m.drops.toSet)
      if (keep.isEmpty) rd(table).parquet(dstS).limit(0) // all rows deleted
      else rd(table).option("basePath", dstS)
        .parquet(keep.map(r => s"$dstS/$r"): _*)
    case _ => rd(table).parquet(path(table))
  }

  /** The committed data-file inventory: the physical listing minus any
    * unsettled tombstones on the head manifest. Every metadata-level
    * consumer (skipping, rollups, pinned reads) must use THIS, not the
    * raw listing — a raw listing between a predicate-delete commit and
    * its physical settle would resurrect deleted rows.
    */
  private def committedFiles(table: String, fs: FileSystem): Seq[String] = {
    val all = dataFiles(fs, hpath(table))
    readManifest(table).filter(!_.swapping).map(_.drops.toSet) match {
      case Some(d) if d.nonEmpty => all.filterNot(d)
      case _                     => all
    }
  }

  /** Physically settle committed tombstones: archive (retention) or
    * delete the dropped files, then write a fresh dropless clean
    * manifest at the SAME generation. Idempotent; a crash mid-settle
    * leaves the drops on the manifest and every read still excludes
    * them. Mutations call this before proceeding — a later clean
    * manifest that failed to carry the drops would resurrect the
    * deleted rows.
    */
  private def settleDrops(table: String, fs: FileSystem): Unit = {
    var done = false
    while (!done) {
      readManifest(table).filter(m => !m.swapping && m.drops.nonEmpty) match {
        case None => done = true
        case Some(m) =>
          val dst = hpath(table)
          m.drops.foreach { rel =>
            val p = sub(dst, rel)
            if (fs.exists(p)) {
              if (retainGenerations > 0) {
                // the dropped file belonged to the PREVIOUS generation
                val dest = new Path(
                  new Path(archiveRoot(table), s"gen=${m.gen - 1}"), rel)
                fs.mkdirs(dest.getParent)
                fs.rename(p, dest)
              } else fs.delete(p, false)
            }
          }
          // CAS at the observed head, NEVER the blind retry loop: a
          // concurrent writer may have advanced gen/txn fences while
          // we deleted — landing this pre-built body at a later
          // sequence would regress them. On collision, re-read and
          // re-derive (the physical deletes above are idempotent).
          try {
            writeManifest(table, m.gen, swapping = false, Nil,
              expectedPrev = Some(m.seq))
            done = true
          } catch {
            case _: ConcurrentCommitException => () // re-read, retry
          }
      }
    }
  }

  /** Reader SNAPSHOT against concurrent writers: pin the committed
    * data-file inventory NOW and return a frame over those explicit
    * paths. A plain [[read]] lists the directory at plan time and can
    * pick up a concurrent append's files arriving between planning
    * and execution (or between two actions on the same frame) —
    * `readPinned` cannot: the file list is fixed at this call.
    * Appends never move existing files, so the pinned frame stays
    * valid for the reader's lifetime under any number of concurrent
    * appends/upserts. Concurrent REWRITES move the pinned files
    * themselves: with retention on (`retainGenerations > 0`) replaced
    * files stay resolvable (archive) — a reader that must survive
    * rewrites should pin `generations().last` and use [[readAt]],
    * which re-probes per file. Cost: one recursive listing here.
    * Under a crashed-swap manifest this delegates to [[read]]'s
    * committed-generation resolution (already explicit-path-based).
    */
  def readPinned(table: String): DataFrame = readManifest(table) match {
    case Some(m) if m.swapping => read(table)
    case _ =>
      val dstS = path(table)
      val fs = fsOf(hpath(table))
      val files = committedFiles(table, fs)
      if (files.isEmpty) read(table) // empty or all-tombstoned: delegate
      else rd(table).option("basePath", dstS)
        .parquet(files.map(f => s"$dstS/$f"): _*)
  }

  /** Manifest-fenced append (K3): the batch lands in an `__add`
    * sibling first, the incoming file list is recorded in a swapping
    * manifest, and only then do the files move in (one rename each —
    * atomic per file on every store). A crash at ANY point reads and
    * recovers as the table WITHOUT the batch: before the manifest the
    * files are outside the table; after it, [[read]] excludes the
    * listed adds and [[recover]] deletes whichever of them already
    * moved. Without the fence a crash mid-write left a partial batch
    * VISIBLE (parquet scans do not honor _SUCCESS markers). A
    * first-time append routes through [[rewrite]]'s fresh-table fence.
    *
    * Returns the COMMITTED generation, taken from this append's own
    * commit CAS — under a concurrent writer on the same table,
    * re-reading `generations().last` after the call could observe a
    * LATER writer's generation and pin the wrong reproducibility
    * anchor; the returned value cannot. An empty batch commits
    * nothing and returns the current generation (whose content the
    * no-op batch trivially reflects).
    */
  def append(table: String, df: DataFrame,
             partitionBy: Seq[String] = Nil): Long =
    retryCommit(appendBody(table, df, partitionBy))

  /** `df` is BY-NAME on purpose: table-derived frames (an upsert's
    * anti-join, a dedup screen) pin their file LISTING when the frame
    * is created, so the frame must be constructed AFTER the CAS
    * anchor below — a concurrent commit between a pre-anchor listing
    * and the anchor would slide under the CAS with stale inputs (the
    * lost-update anomaly OCC exists to prevent). Callers pass the
    * frame-building EXPRESSION, not a pre-built val.
    */
  private def appendBody(table: String, df: => DataFrame,
                         partitionBy: Seq[String],
                         txnUpdate: Option[(String, Long)] = None,
                         expectedFence: Option[(String, Long)] = None)
      : Long = {
    settleOrRecover(table) // never append into a half-swapped layout
    if (!exists(table)) {
      return rewriteBody(table, df, partitionBy, txnUpdate,
        expectedFence = expectedFence)
    }
    val dst = hpath(table)
    val fs = fsOf(dst)
    settleOld(table, fs) // archive (not delete) a post-commit leftover
    settleDrops(table, fs) // physically retire committed tombstones
    // the state this mutation is based on; the begin-commit CAS below
    // validates nobody committed past it while we staged
    val head0 = readManifest(table)
    checkFence(table, head0, expectedFence)
    val seq0 = head0.map(_.seq).getOrElse(0L)
    val gen = head0.map(_.gen).getOrElse(0L)
    // layout guard: appending flat files into a partitioned table (or
    // with a DIFFERENT partitionBy — INCLUDING partitioned files into
    // a flat non-empty table) commits a mixed directory layout that
    // breaks partition discovery on every later read — reject BEFORE
    // staging (a committed layout corruption is not auto-recoverable).
    // Only a table with NO committed files waives the check: a flat
    // table's layout is Nil, which must still match the batch's.
    val committed = committedFiles(table, fs)
    val existingLayout = partitionLayoutOf(committed, "append")
    require(committed.isEmpty || existingLayout == partitionBy.toList,
      s"append: table $table is partitioned by " +
        s"[${existingLayout.mkString("/")}] but the batch uses " +
        s"partitionBy=[${partitionBy.mkString("/")}] — layouts must " +
        "match (empty = flat)")
    val tmp = freshStaging(table, "__add")
    try {
      val frame0 = df // listing happens HERE, after the anchor
      // COLUMN-ORDER normalization (defense in depth; the
      // Upsert.antiDelete find): parquet resolves a multi-file table's
      // schema from ONE sampled footer, so files whose columns agree
      // in NAME but not ORDER make every later read's column order
      // NONDETERMINISTIC. When the batch carries exactly the committed
      // columns in a different order, reorder it; a different column
      // SET is appendEvolve's business and passes through untouched.
      val frame =
        if (committed.isEmpty) frame0 // emptied table: no schema to match
        else scala.util.Try {
          val committedCols = committedSchema(table).map(_.name)
          if (committedCols.toSet == frame0.columns.toSet &&
              committedCols != frame0.columns.toSeq)
            frame0.select(committedCols.map(
              org.apache.spark.sql.functions.col): _*)
          else frame0
        } match { // best-effort: never block an append — but LOUDLY,
          // or a persistently unreadable committed schema silently
          // skips the reorder and writes the exact mis-ordered file
          // this normalization exists to prevent
          case scala.util.Success(f) => f
          case scala.util.Failure(e) =>
            org.slf4j.LoggerFactory.getLogger(classOf[TableStore]).warn(
              s"append $table: column-order normalization skipped — " +
                s"committed schema unreadable " +
                s"(${e.getClass.getSimpleName}: ${e.getMessage})")
            frame0
        }
      val w = frame.write.mode(SaveMode.Overwrite)
      (if (partitionBy.nonEmpty) w.partitionBy(partitionBy: _*) else w)
        .parquet(tmp.toString)
      compactStaging(tmp, fs, partitionBy)
      val incoming = dataFiles(fs, tmp)
      if (incoming.isEmpty) { fs.delete(tmp, true); return gen }
      beforeBeginCommit()
      // begin-commit CAS: claims seq0+1 or detects a concurrent commit
      // BEFORE any live-tree rename (abort is then staging-only)
      writeManifest(table, gen, swapping = true, Nil, Nil, Map.empty,
        adds = incoming, tmpName = Some(tmp.getName),
        expectedPrev = Some(seq0))
      midSwapPause() // test seam: hold the live swap open
      snapBeforeMutation(table, fs) // retention: outgoing-gen inventory
      var moves = 0
      incoming.foreach { rel =>
        val to = sub(dst, rel)
        fs.mkdirs(to.getParent)
        moves += 1; swapFault(moves)
        fs.rename(sub(tmp, rel), to)
      }
      commitManifest(table, gen + 1, seq0 + 1, txnUpdate)
      fs.delete(tmp, true)
      // appends replace nothing, so there is no __old to dispose — but
      // the retention window must still prune, or an append-only
      // workload accumulates one snapshot sidecar per batch forever
      if (retainGenerations > 0) vacuum(table, keepLast = retainGenerations)
    } catch {
      case e: ConcurrentCommitException => fs.delete(tmp, true); throw e
    }
    gen + 1
  }

  /** The clean generation-bump manifest, CAS'd at `swapSeq + 1`. A
    * collision HERE is not retryable contention — our swap held the
    * lock, so a competing manifest means another process recovered a
    * live swap (protocol violation: [[recover]] run while this writer
    * was alive). Escalate loudly instead of retrying into a tree two
    * writers both mutated.
    */
  private def commitManifest(table: String, newGen: Long,
                             swapSeq: Long,
                             txnUpdate: Option[(String, Long)] = None,
                             drops: Seq[String] = Nil): Unit =
    try writeManifest(table, newGen, swapping = false, Nil,
      expectedPrev = Some(swapSeq), txnUpdate = txnUpdate, drops = drops)
    catch {
      case e: ConcurrentCommitException => throw new IllegalStateException(
        s"table $table: manifest advanced past this writer's IN-FLIGHT " +
          "swap — recover() was run against a live writer. The tree " +
          "holds both writers' renames; inspect manifests and __old " +
          "before trusting reads.", e)
    }

  // ---------------------------------------------------- schema evolution

  private def evolvedMarker(table: String) =
    new Path(root, s"$table._graft_evolved")

  /** True once a schema-adding append has widened the table: reads
    * must merge footers (files written before the widening lack the
    * new columns). One existence probe per read — same order of cost
    * as the manifest glob every read already pays.
    */
  def isEvolved(table: String): Boolean = {
    val p = evolvedMarker(table)
    fsOf(p).exists(p)
  }

  /** The store's reader for `table`: plain parquet normally; with
    * footer-merging once the table's schema has evolved (pre-widening
    * files resolve the added columns as NULL).
    */
  private def rd(table: String) = {
    val r = spark.read
    if (isEvolved(table)) r.option("mergeSchema", "true") else r
  }

  /** Append with SCHEMA EVOLUTION: batch columns the table lacks are
    * ADDED (earlier files read them back as NULL via merged footers);
    * table columns the batch lacks are filled with typed NULLs; shared
    * columns must match types EXACTLY — a silent cast is how a
    * corpus-wide column turns to garbage, so mismatches throw. The
    * widening is recorded in a `._graft_evolved` marker (written
    * before the append commits: a crash in between costs only an
    * unnecessary footer merge, never a wrong read).
    */
  def appendEvolve(table: String, df: DataFrame,
                   partitionBy: Seq[String] = Nil): Unit = retryCommit {
    settleOrRecover(table)
    if (!exists(table)) { rewriteBody(table, df, partitionBy); () }
    else {
      val tableSchema = committedSchema(table)
      val batchSchema = df.schema
      val conflicts = tableSchema.flatMap { tf =>
        batchSchema.find(_.name == tf.name)
          .filter(_.dataType != tf.dataType)
          .map(bf => s"${tf.name}: table ${tf.dataType.simpleString} " +
            s"vs batch ${bf.dataType.simpleString}")
      }
      require(conflicts.isEmpty,
        "appendEvolve: column type conflict(s) — a silent cast would " +
          s"corrupt the corpus: ${conflicts.mkString("; ")}")
      // table columns first (their canonical order), new columns after
      val aligned = df.select(
        tableSchema.map { tf =>
          if (batchSchema.exists(_.name == tf.name)) col(tf.name)
          else org.apache.spark.sql.functions.lit(null)
            .cast(tf.dataType).as(tf.name)
        } ++ batchSchema.filterNot(bf =>
          tableSchema.exists(_.name == bf.name))
          .map(bf => col(bf.name)): _*)
      val widens = batchSchema.exists(bf =>
        !tableSchema.exists(_.name == bf.name))
      if (widens && !isEvolved(table))
        fsOf(evolvedMarker(table)).create(evolvedMarker(table), true).close()
      appendBody(table, aligned, partitionBy)
    }
  }

  /** Last batch id committed for `streamId`, −1 when none. */
  def lastTxn(table: String, streamId: String): Long =
    readManifest(table).flatMap(_.txns.get(streamId)).getOrElse(-1L)

  /** EXACTLY-ONCE idempotent append — the Delta txn-version pattern
    * for `foreachBatch` sinks: the (streamId, batchId) fence rides the
    * SAME clean commit manifest as the append (one atomic CAS commits
    * data + fence together), and a replayed batch whose id is ≤ the
    * recorded fence is SKIPPED. A crash between the sink commit and
    * the checkpoint advance therefore cannot duplicate the batch: the
    * restarted query re-delivers it, the fence rejects it. Fences are
    * carried forward across every other writer's commits (the manifest
    * writer preserves `txn=` records), so interleaved non-streaming
    * mutations never re-open the replay window. Batch ids must be
    * monotonically increasing per stream (the Structured Streaming
    * contract). Returns true when the batch appended, false when the
    * fence skipped a replay.
    */
  def appendExactlyOnce(table: String, df: DataFrame, streamId: String,
                        batchId: Long,
                        partitionBy: Seq[String] = Nil): Boolean = {
    require(streamId.nonEmpty && !streamId.contains('\n'),
      "streamId must be a non-empty single-line token")
    require(batchId >= 0, s"batchId >= 0, got $batchId")
    retryCommit {
      settleOrRecover(table)
      val fence = lastTxn(table, streamId)
      if (fence >= batchId) false
      else {
        afterFenceRead() // test seam: zombie-writer TOCTOU window
        // the fence observed above is re-validated under appendBody's
        // CAS anchor: a zombie committing this (streamId, batchId)
        // between the two reads advances the fence, fails the check,
        // and the retry's fence read skips the replay — without it
        // the anchor would see the newer head, the CAS would succeed,
        // and the batch would land twice
        appendBody(table, df, partitionBy,
          txnUpdate = Some(streamId -> batchId),
          expectedFence = Some(streamId -> fence))
        true
      }
    }
  }

  /** INSERT ... ON CONFLICT DO NOTHING: append only new-keyed rows.
    * `tieBreak` makes intra-batch dedup deterministic.
    */
  def upsert(table: String, incoming: DataFrame, keys: Seq[String],
             tieBreak: Seq[String], partitionBy: Seq[String] = Nil): Unit =
    retryCommit {
      // the anti-join's table read happens INSIDE the retry: a retry
      // after a commit collision re-lists and re-reads the winner's
      // generation, so already-inserted keys are seen and skipped
      settleOrRecover(table)
      if (!exists(table)) {
        appendBody(table, Upsert.dedupByKey(incoming, keys, tieBreak),
          partitionBy)
      } else {
        // frame built INSIDE the by-name argument: its table listing
        // runs under appendBody's CAS anchor
        appendBody(table, {
          val existing = read(table)
          Upsert.newRows(existing, incoming, keys, tieBreak)
            .select(existing.columns.map(col).toIndexedSeq: _*)
        }, partitionBy)
      }
    }

  /** Exact-dedup append: insert only batch rows whose normalized-text
    * fingerprint has never been stored — cross-batch dedup backed by
    * the store (the batch analogue of streaming corpus-ingest's
    * dropDuplicatesWithinWatermark, for corpora that grow by bulk
    * drops rather than streams). The survivor table carries the batch
    * columns plus `fp`. The anti-join needs only the store's fp column
    * (column pruning reaches the parquet scan), so a daily drop against
    * a 100 TB corpus store shuffles one fingerprint column, not the
    * corpus. Returns the rows appended (intra-batch dups removed with a
    * min-`idCol` tie-break, cross-batch dups removed via the store).
    */
  def dedupAppend(table: String, batch: DataFrame, idCol: String,
                  textCol: String,
                  partitionBy: Seq[String] = Nil): DataFrame = {
    // fp is this sink's column: silently overwriting caller data that
    // already carries one would corrupt it AND poison the cross-batch
    // anti-join — reject loudly instead
    require(!batch.columns.contains("fp"),
      "dedupAppend reserves the column name 'fp' for the stored " +
        "fingerprint; rename the batch's existing 'fp' column first")
    retryCommit {
      // whole derivation inside the retry AND inside the by-name
      // argument: a collision means another writer's batch just
      // landed — its fingerprints must join the anti-join's store
      // side, or this batch re-inserts its dups; building the frame
      // under appendBody's CAS anchor closes the same window against
      // commits that land while THIS attempt derives
      settleOrRecover(table)
      var out: DataFrame = null
      try {
        appendBody(table, {
          val fped = batch.withColumn("fp",
            graft.functions.TextFunctions.fingerprint(col(textCol)))
          val novel =
            if (!exists(table))
              Upsert.dedupByKey(fped, Seq("fp"), Seq(idCol))
            else Upsert.newRows(read(table), fped, Seq("fp"), Seq(idCol))
              .select(fped.columns.map(col).toIndexedSeq: _*)
          // Snapshot BEFORE the append mutates this plan's own input
          // ([[TableStore.snapshot]] rationale): the returned frame
          // must never re-run the anti-join against the table it was
          // just appended to. Scoped persist: the table is
          // append-only, so recompute from the pinned splits after
          // release still yields the pre-append snapshot.
          out = TableStore.snapshot(novel)
          out
        }, partitionBy)
        out
      } finally if (out != null) out.unpersist(blocking = false)
    }
  }

  /** Rewrite `table` without rows whose key-tuple appears in `toDelete`.
    * With `partitionCols`, only partitions holding a matching key are
    * rewritten; partitions left empty by the delete are removed.
    */
  def deleteByKeys(table: String, toDelete: DataFrame, keys: Seq[String],
                   partitionCols: Seq[String] = Nil): Unit = retryCommit {
    settleOrRecover(table) // hitParts reads the table lazily — fix layout first
    if (partitionCols.isEmpty)
      rewriteBody(table, Upsert.antiDelete(read(table), toDelete, keys), Nil)
    else
      rewriteAffectedBody(table, partitionCols,
        hitParts = read(table)
          .join(toDelete.select(keys.map(col): _*).distinct(), keys, "left_semi")
          .select(partitionCols.map(col): _*).distinct(),
        transform = Upsert.antiDelete(_, toDelete, keys))
  }

  /** PREDICATE DELETE with FILE-LEVEL targeting — `DELETE FROM table
    * WHERE pred` that moves only the bytes that might match: files
    * whose [[analyze]]d [min,max] window provably excludes the
    * predicate are NEVER read or rewritten (the GDPR-delete shape at
    * 100 TB: a keyed compliance delete on a clustered+analyzed table
    * touches the handful of files holding the key range, where
    * [[deleteByKeys]]'s unpartitioned path rewrites the table).
    * Rows where `pred` is NULL are KEPT — SQL DELETE semantics.
    *
    * Protocol (the append fence run in reverse): survivors of the
    * affected files are staged and fenced in as `add=` entries (a
    * crash mid-move reads as the table WITHOUT them — wholly the old
    * generation), and the clean gen+1 manifest carries the affected
    * files as `drop=` TOMBSTONES in the same commit CAS; reads
    * exclude tombstoned files immediately, and the physical retire
    * ([[settleDrops]]: archive under retention, else delete) runs
    * right after — or at the NEXT mutation if a crash intervenes.
    * Untouched files never move, so a concurrent [[readPinned]]
    * stays valid. Returns the number of affected (rewritten) files;
    * 0 = the stats proved nothing matched and nothing moved.
    *
    * With `partitionCols` the delete is partition-targeted instead
    * (the [[deleteByKeys]] machinery); returns affected partitions.
    */
  def deleteWhere(table: String, pred: org.apache.spark.sql.Column,
                  partitionCols: Seq[String] = Nil): Long = retryCommit {
    import org.apache.spark.sql.functions.{coalesce, lit, not}
    val keep = not(coalesce(pred, lit(false)))
    predicateMutation(table, pred, partitionCols, "deleteWhere",
      _.filter(keep))
  }

  /** PREDICATE UPDATE with FILE-LEVEL targeting — `UPDATE table SET
    * c = v WHERE pred` through the same stats-pruned
    * tombstone-and-fence machinery as [[deleteWhere]]: files the
    * predicate provably cannot touch never move. `assignments` values
    * are cast to each column's EXISTING type (a predicate update must
    * never drift the table schema); rows where `pred` is NULL are
    * unchanged — SQL UPDATE semantics. Returns affected files (or
    * partitions with `partitionCols`).
    */
  def updateWhere(table: String, pred: org.apache.spark.sql.Column,
                  assignments: Seq[(String, org.apache.spark.sql.Column)],
                  partitionCols: Seq[String] = Nil): Long = retryCommit {
    import org.apache.spark.sql.functions.{coalesce, lit, when}
    require(assignments.nonEmpty, "updateWhere: name at least one assignment")
    require(assignments.map(_._1).distinct.size == assignments.size,
      "updateWhere: duplicate assignment targets")
    val schema = committedSchema(table)
    assignments.foreach { case (c, _) =>
      require(schema.exists(_.name == c),
        s"updateWhere: column $c not in ${schema.map(_.name).mkString(",")}")
    }
    val byName = assignments.toMap
    // ONE simultaneous projection, never a withColumn chain: every
    // assignment (and the predicate itself) must read the PRE-update
    // row — a sequential fold would evaluate later assignments against
    // partially-updated values (swap a↔b breaks, and an assignment
    // that falsifies the predicate hides it from later assignments)
    def apply(df: DataFrame): DataFrame = df.select(
      schema.map { f =>
        byName.get(f.name) match {
          case Some(v) =>
            when(coalesce(pred, lit(false)), v.cast(f.dataType))
              .otherwise(col(f.name)).as(f.name)
          case None => col(f.name)
        }
      }: _*)
    predicateMutation(table, pred, partitionCols, "updateWhere", apply)
  }

  import TableStore.{MergeAction, MergeUpdate, MergeDelete}

  /** MERGE INTO — the canonical lakehouse upsert
    * (`WHEN MATCHED THEN UPDATE/DELETE, WHEN NOT MATCHED THEN
    * INSERT`), with FILE-LEVEL key-range targeting: only table files
    * whose analyzed `keyCol` window intersects the source's key range
    * are read and rewritten — files the stats prove key-disjoint
    * cannot contain a match, so a small keyed batch merged into a
    * clustered 100 TB table moves the files holding its key range,
    * not the table. Unmatched source rows are inserted (they ride the
    * same staged `add=` files as the rewritten survivors — one commit
    * CAS covers updates, deletes, and inserts atomically). Source
    * keys must be unique and non-null (checked loudly: a duplicate
    * source key makes "the matched row's new value" ambiguous).
    * Returns the number of table files rewritten (0 = pure insert).
    *
    * `source` must carry `keyCol` plus every column a `MergeUpdate`
    * names; inserted rows take the table's schema with NULLs for
    * table columns the source lacks, and source-only columns are
    * rejected (schema drift — use [[appendEvolve]] deliberately).
    *
    * `txn = Some(streamId -> batchId)` makes the merge EXACTLY-ONCE
    * for streaming `foreachBatch` upserts (the [[appendExactlyOnce]]
    * fence riding this merge's own commit CAS): a replayed batch id
    * at-or-below the fence returns −1 and changes nothing.
    */
  def merge(table: String, source: DataFrame, keyCol: String,
            whenMatched: MergeAction,
            insertNotMatched: Boolean = true,
            txn: Option[(String, Long)] = None): Long = retryCommit {
    import org.apache.spark.sql.functions._
    settleOrRecover(table)
    // exactly-once fence (the appendExactlyOnce pattern): a replayed
    // batch id at-or-below the recorded fence is SKIPPED — the fence
    // advances atomically with the merge's own commit below, and the
    // value observed HERE is re-validated under the commit-CAS anchor
    // (expectedFence): a zombie writer committing the same batch
    // between this read and the anchor fails the check and the retry
    // skips the replay instead of landing it twice
    val expectedFence: Option[(String, Long)] =
      txn.map { case (streamId, batchId) =>
        require(streamId.nonEmpty && !streamId.contains('\n'),
          "merge: streamId must be a non-empty single-line token")
        val fence = lastTxn(table, streamId)
        if (fence >= batchId) return -1L
        streamId -> fence
      }
    if (txn.nonEmpty) afterFenceRead() // test seam: TOCTOU window
    if (!this.exists(table)) {
      // first batch of a CDC stream: nothing to match — the inserts
      // CREATE the table (source schema), fence riding the commit
      require(insertNotMatched,
        s"merge: table $table does not exist and insertNotMatched=false")
      // pin the RAW source once: the null-key audit and the write both
      // read the snapshot — the un-pinned plan never re-executes (a
      // non-deterministic source would otherwise fail the audit
      // spuriously, and a big one would compute twice)
      val srcAll = TableStore.eagerSnapshot(source)
      try {
        val src0 = srcAll.filter(col(keyCol).isNotNull)
        val n = src0.count()
        require(n == srcAll.count(),
          "merge: source has NULL keys — a NULL can never match and " +
            "its insert would be unkeyable; filter or fix upstream")
        require(src0.select(keyCol).distinct().count() == n,
          "merge: duplicate source keys — matched-row result is ambiguous")
        rewriteBody(table, src0, Nil, txnUpdate = txn,
          expectedFence = expectedFence)
      } finally srcAll.unpersist(blocking = false)
      return 0L
    }
    val tableSchema = committedSchema(table)
    require(tableSchema.exists(_.name == keyCol),
      s"merge: key $keyCol not in table")
    require(source.columns.contains(keyCol),
      s"merge: key $keyCol not in source")
    val extras = source.columns.filterNot(c =>
      tableSchema.exists(_.name == c))
    require(extras.isEmpty,
      s"merge: source columns ${extras.mkString(",")} not in table — " +
        "widen with appendEvolve first if intended")
    // shared columns must match types EXACTLY (the appendEvolve
    // stance): a silent cast turns un-castable source values into
    // NULLs OVER matched rows — corpus corruption, not coercion
    val typeConflicts = source.schema.flatMap { sf =>
      tableSchema.find(_.name == sf.name)
        .filter(_.dataType != sf.dataType)
        .map(tf => s"${sf.name}: table ${tf.dataType.simpleString} " +
          s"vs source ${sf.dataType.simpleString}")
    }
    require(typeConflicts.isEmpty,
      "merge: column type conflict(s) — cast in the source explicitly: " +
        typeConflicts.mkString("; "))
    // the key itself never needs updating (matched ⇒ equal), and after
    // the __mk rename the source no longer HAS keyCol — drop it here
    val updateCols = whenMatched match {
      case MergeUpdate(cols) =>
        cols.foreach(c => require(
          source.columns.contains(c) && tableSchema.exists(_.name == c),
          s"merge: update column $c must exist in source and table"))
        cols.filterNot(_ == keyCol)
      case MergeDelete => Nil
    }
    // pin the RAW source once: audits, key-range probe,
    // matched-transform, and insert all read the snapshot — the
    // un-pinned plan never re-executes (non-deterministic sources stay
    // consistent; big ones compute once per attempt)
    val srcAll = TableStore.eagerSnapshot(source)
    try {
      val src = srcAll.filter(col(keyCol).isNotNull)
      val nSrc = src.count()
      require(nSrc == srcAll.count(),
        "merge: source has NULL keys — a NULL can never match and its " +
          "insert would be unkeyable; filter or fix upstream")
      require(src.select(keyCol).distinct().count() == nSrc,
        "merge: duplicate source keys — matched-row result is ambiguous")
      if (nSrc == 0) return 0L
      val mm = src.agg(min(col(keyCol)), max(col(keyCol))).head()
      val rangePred = col(keyCol).between(lit(mm.get(0)), lit(mm.get(1)))
      // inserted rows take the table's column set, NULL-filling gaps
      def asTableRows(df: DataFrame): DataFrame = df.select(
        tableSchema.map { f =>
          if (df.columns.contains(f.name)) col(f.name).cast(f.dataType)
          else lit(null).cast(f.dataType).as(f.name)
        }: _*)
      def transform(affected: DataFrame): DataFrame = {
        // no forced broadcast: AQE picks the strategy from the actual
        // source size (a large CDC batch must be allowed to shuffle)
        val srcK = src.withColumnRenamed(keyCol, "__mk")
        val hit = srcK
        val joined = affected.join(hit,
          affected(keyCol) === hit("__mk"), "left")
        val survivors = whenMatched match {
          case MergeDelete =>
            // dataframe-qualified projection: joined carries BOTH
            // sides' same-named columns
            joined.filter(col("__mk").isNull)
              .select(tableSchema.map(f => affected(f.name)): _*)
          case MergeUpdate(_) =>
            val updated = tableSchema.map { f =>
              if (updateCols.contains(f.name))
                when(col("__mk").isNotNull,
                  hit(f.name).cast(f.dataType))
                  .otherwise(affected(f.name)).as(f.name)
              else affected(f.name)
            }
            joined.select(updated: _*)
        }
        if (!insertNotMatched) survivors
        else {
          // unmatched = source keys absent from the AFFECTED rows;
          // complete because pruned files are stats-proven key-disjoint
          val matchedKeys = affected.select(col(keyCol).as("__mk"))
          val inserts = srcK.join(matchedKeys, Seq("__mk"), "left_anti")
            .withColumnRenamed("__mk", keyCol)
          survivors.unionByName(asTableRows(inserts))
        }
      }
      predicateMutation(table, rangePred, Nil, "merge",
        transform, txnUpdate = txn, commitOnEmpty = insertNotMatched,
        expectedFence = expectedFence)
    } finally srcAll.unpersist(blocking = false)
  }

  /** Partition column names implied by the committed files' directory
    * structure (empty = unpartitioned or no files); inconsistent
    * layouts fail loudly.
    */
  private def partitionLayoutOf(files: Seq[String],
                                op: String): List[String] =
    if (files.isEmpty) Nil
    else {
      val shapes = files.map(_.split("/").dropRight(1)
        .map(_.takeWhile(_ != '=')).toList).distinct
      require(shapes.size == 1,
        s"$op: inconsistent partition layouts: " +
          shapes.map(_.mkString("/")).mkString(" vs "))
      shapes.head
    }

  /** The shared stats-targeted mutation engine behind [[deleteWhere]] /
    * [[updateWhere]]: select affected files by the predicate's stats
    * window, replace them with `transform`(affected rows), tombstone
    * the originals. See [[deleteWhere]] for the crash protocol.
    */
  private def predicateMutation(table: String,
                                pred: org.apache.spark.sql.Column,
                                partitionCols: Seq[String], op: String,
                                transform: DataFrame => DataFrame,
                                txnUpdate: Option[(String, Long)] = None,
                                commitOnEmpty: Boolean = false,
                                expectedFence: Option[(String, Long)] = None)
      : Long = {
    settleOrRecover(table)
    require(this.exists(table), s"$op: table $table does not exist")
    require(txnUpdate.isEmpty || partitionCols.isEmpty,
      s"$op: txn fences ride the file-level commit path only")
    if (partitionCols.nonEmpty) {
      // hit-partition frame passed BY-NAME: its listing runs under
      // rewriteAffectedBody's CAS anchor, never before it
      rewriteAffectedBody(table, partitionCols,
        readWhere(table, pred)
          .select(partitionCols.map(col): _*).distinct(),
        transform)
    } else {
      val dst = hpath(table)
      val fs = fsOf(dst)
      settleOld(table, fs)
      settleDrops(table, fs)
      // capture the CAS anchor BEFORE any state read: a concurrent
      // commit landing between a later listing and the CAS would
      // otherwise pass the CAS with stale inputs (its files missing
      // from `all`/`affected` — silently skipped rows, or duplicate
      // merge inserts). Captured first, any such commit fails the CAS
      // and the whole mutation re-derives.
      val head0 = readManifest(table)
      checkFence(table, head0, expectedFence)
      val seq0 = head0.map(_.seq).getOrElse(0L)
      val gen = head0.map(_.gen).getOrElse(0L)
      val dstS = path(table)
      val all = committedFiles(table, fs)
      if (all.isEmpty && !commitOnEmpty) return 0L
      var sidecarCols: Seq[String] = Nil
      val affected: Seq[String] = readStatsSidecar(table) match {
        case None => all
        case Some(stats) =>
          sidecarCols = stats.values.flatMap(_.cols.keys).toSeq.distinct
          val conds = read(table).filter(pred)
            .queryExecution.optimizedPlan.collect {
              case f: org.apache.spark.sql.catalyst.plans.logical.Filter =>
                f.condition
            }
          all.filter(rel => stats.get(rel).forall(pf =>
            conds.forall(c => FileStats.mayMatch(c, pf))))
      }
      if (affected.isEmpty && !commitOnEmpty) return 0L
      // a PARTITIONED layout must be preserved: survivors are written
      // with the same partitionBy (derived from the dir structure the
      // files live in), so replacement files land INSIDE partition
      // dirs — a flat write would leave mixed root/partition files
      // and break partition discovery
      val layoutCols: Seq[String] = partitionLayoutOf(all, op)
      val tmp = freshStaging(table, "__add")
      try {
        // `commitOnEmpty` with no affected files still runs transform
        // (over zero rows) — merge's insert-only case commits its
        // inserts under THIS anchor, so a key committed concurrently
        // can never be insert-duplicated by a stale no-match decision
        val affectedFrame =
          if (affected.isEmpty) read(table).limit(0)
          else rd(table).option("basePath", dstS)
            .parquet(affected.map(r => s"$dstS/$r"): _*)
        val survivors = transform(affectedFrame)
        val w0 = survivors.write.mode(SaveMode.Overwrite)
        (if (layoutCols.isEmpty) w0 else w0.partitionBy(layoutCols: _*))
          .parquet(tmp.toString)
        var incoming = dataFiles(fs, tmp)
        if (incoming.isEmpty && affected.size == all.size) {
          // every row deleted: keep one empty schema-bearing file so
          // the settled table still reads (with its schema) as empty
          survivors.repartition(1).write.mode(SaveMode.Overwrite)
            .parquet(tmp.toString)
          incoming = dataFiles(fs, tmp)
        }
        beforeBeginCommit()
        // retention inventory BEFORE any commit: the outgoing
        // generation still owns every affected file here (a lost CAS
        // leaves an orphan snapshot that the retry overwrites)
        snapBeforeMutation(table, fs)
        if (incoming.isEmpty) {
          // no surviving bytes to move: the tombstone commit IS the CAS
          writeManifest(table, gen + 1, swapping = false, Nil,
            expectedPrev = Some(seq0), txnUpdate = txnUpdate,
            drops = affected)
          fs.delete(tmp, true)
        } else {
          writeManifest(table, gen, swapping = true, Nil, Nil, Map.empty,
            adds = incoming, tmpName = Some(tmp.getName),
            expectedPrev = Some(seq0))
          var moves = 0
          incoming.foreach { rel =>
            val to = sub(dst, rel)
            fs.mkdirs(to.getParent)
            moves += 1; swapFault(moves)
            fs.rename(sub(tmp, rel), to)
          }
          commitManifest(table, gen + 1, seq0 + 1, txnUpdate = txnUpdate,
            drops = affected)
          fs.delete(tmp, true)
        }
        settleFault()
        settleDrops(table, fs)
        if (retainGenerations > 0) vacuum(table, keepLast = retainGenerations)
        // keep skipping fresh: drop tombstoned entries, stat survivors
        // (the NEXT targeted delete would otherwise conservatively
        // rewrite every statless survivor file)
        if (sidecarCols.nonEmpty) analyzeIncremental(table, sidecarCols)
      } catch {
        case e: ConcurrentCommitException => fs.delete(tmp, true); throw e
      }
      affected.size.toLong
    }
  }

  /** Flag flip: set `flagCol = value` on rows whose key is in `keysDf`
    * (reference: summarized=1 / vectorized=1 rewrites). With
    * `partitionCols`, only the partitions containing a keyed row are
    * rewritten.
    */
  def updateFlag(table: String, keysDf: DataFrame, keys: Seq[String],
                 flagCol: String, value: Int,
                 partitionCols: Seq[String] = Nil): Unit = retryCommit {
    settleOrRecover(table) // hitParts reads the table lazily — fix layout first
    import org.apache.spark.sql.functions._
    def flip(df: DataFrame): DataFrame =
      df.join(keysDf.select(keys.map(col): _*).distinct()
        .withColumn("__hit", lit(1)), keys, "left")
        .withColumn(flagCol,
          when(col("__hit").isNotNull, lit(value)).otherwise(col(flagCol)))
        .drop("__hit")
    if (partitionCols.isEmpty) rewriteBody(table, flip(read(table)), Nil)
    else rewriteAffectedBody(table, partitionCols,
      hitParts = read(table)
        .join(keysDf.select(keys.map(col): _*).distinct(), keys, "left_semi")
        .select(partitionCols.map(col): _*).distinct(),
      transform = flip)
  }

  /** Small-file compaction — the operational companion to the mutation
    * paths: every append/upsert batch writes its own part-files, so a
    * frequently-updated table degrades into thousands of tiny files
    * whose listing and task-per-file overhead dominate scans at 100 TB.
    * Partitioned tables rewrite ONLY the partitions holding more than
    * `maxFiles` part-files (found with one metadata-cheap
    * `input_file_name` aggregation), one output file per partition
    * value, through the same per-partition temp-swap as
    * [[rewriteAffected]] — contents unchanged, untouched partitions
    * never move, a crash leaves each partition wholly old or new.
    * Unpartitioned tables rewrite into `targetFiles` files via the
    * [[rewrite]] temp-swap.
    *
    * `sortBy` additionally CLUSTERS each written file on the given
    * columns (`sortWithinPartitions` — no extra exchange beyond the
    * compaction's own repartition): parquet writes per-row-group
    * min/max statistics, so a point or range predicate on a sorted
    * column skips whole row groups at scan time instead of decoding
    * them — at 100 TB, sort-on-compact is the difference between a
    * key lookup reading one row group and reading the table. Contents
    * are unchanged (a sort is a permutation; spec-verified).
    */
  def compact(table: String, partitionCols: Seq[String] = Nil,
              maxFiles: Int = 1, targetFiles: Int = 8,
              sortBy: Seq[String] = Nil): Unit = retryCommit {
    settleOrRecover(table)
    import org.apache.spark.sql.functions._
    // the dynamic-partition writer inserts its own task-local sort on
    // the partition columns; prefixing them keeps that sort satisfied
    // so the sortBy clustering SURVIVES the write (without the prefix
    // the writer's re-sort scrambles it)
    def clustered(df: DataFrame): DataFrame =
      if (sortBy.isEmpty) df
      else df.sortWithinPartitions(
        (partitionCols ++ sortBy).map(col): _*)
    if (partitionCols.isEmpty) {
      rewriteBody(table, clustered(read(table).repartition(targetFiles)),
        Nil, preSized = true)
    } else {
      // input_file_name() is nondeterministic, so it must be projected
      // before the aggregate; the scan reads no data columns (footer
      // metadata + partition values only)
      // repartition BY the partition columns: each partition value
      // lands wholly in one task, so each swapped dir gets one file;
      // the hit frame is by-name — listed under the body's CAS anchor
      rewriteAffectedBody(table, partitionCols,
        read(table)
          .select(partitionCols.map(col) :+ input_file_name().as("__f"): _*)
          .groupBy(partitionCols.map(col): _*)
          .agg(countDistinct(col("__f")).as("__nf"))
          .filter(col("__nf") > maxFiles)
          .select(partitionCols.map(col): _*),
        transform =
          df => clustered(df.repartition(partitionCols.map(col): _*)))
      ()
    }
  }

  /** Z-ORDER clustering compaction (Delta's OPTIMIZE ZORDER BY shape,
    * [[ZOrder]]): rewrite the table into `targetFiles` files
    * range-partitioned and sorted on the Morton interleave of
    * `zCols`, so EVERY interleaved dimension gets bounded per-file
    * [min,max] windows — run [[analyze]] on the same columns after and
    * [[readWhere]] predicates on any one of them prune files, where a
    * plain `compact(sortBy)` clusters only its leading column. One
    * extra exchange vs `compact`: the range partition on the z-value
    * (which IS the clustering). The z-value is a transient sort key —
    * projected away before the write, so the stored schema is
    * unchanged; contents are a permutation (spec-verified). For
    * PARTITIONED tables pass `partitionCols`: clustering applies
    * within each partition and untouched partition semantics follow
    * [[compact]]'s partition-targeted rewrite.
    */
  def compactZOrder(table: String, zCols: Seq[String],
                    targetFiles: Int = 8,
                    partitionCols: Seq[String] = Nil): Unit = retryCommit {
    settleOrRecover(table)
    import org.apache.spark.sql.functions._
    def clustered(df: DataFrame): DataFrame = {
      val z = ZOrder.zColumn(df, zCols)
      val zdf = df.withColumn("__graft_z", z)
      val parted =
        if (partitionCols.isEmpty)
          zdf.repartitionByRange(targetFiles, col("__graft_z"))
        else zdf.repartition(partitionCols.map(col): _*)
      // the dynamic-partition writer re-sorts on partition columns;
      // prefixing them keeps the z clustering intact (same lesson as
      // compact(sortBy))
      parted.sortWithinPartitions(
        (partitionCols :+ "__graft_z").map(col): _*)
        .drop("__graft_z")
    }
    if (partitionCols.isEmpty)
      rewriteBody(table, clustered(read(table)), Nil, preSized = true)
    else {
      rewriteAffectedBody(table, partitionCols,
        read(table).select(partitionCols.map(col): _*).distinct(),
        transform = clustered)
      ()
    }
  }

  /** Full-table rewrite via temp dir + rename through the table's
    * FileSystem (single writer), manifest-fenced: `state=swapping` is
    * recorded before the first rename and the generation commits only
    * after the swap, so a crash between the two renames (the window on
    * stores without atomic dir rename) still [[read]]s as wholly the
    * old table — never missing, never mixed.
    *
    * Returns the COMMITTED generation from this rewrite's own commit
    * CAS (see [[append]] — a post-call `generations().last` can race
    * a concurrent writer; the returned value cannot).
    */
  def rewrite(table: String, df: DataFrame,
              partitionBy: Seq[String] = Nil): Long =
    // preSized: a public rewrite loads EXACTLY the caller's frame —
    // its partitioning (a repartitionByRange clustering, a bucketing
    // precursor) is deliberate layout, not accidental fragmentation,
    // so staging compaction keeps out; append/upsert/merge layouts
    // are store-owned and do compact
    retryCommit(rewriteBody(table, df, partitionBy, preSized = true))

  /** `df` BY-NAME for the same reason as [[appendBody]]: a rewrite
    * derived from the table's own state (deleteByKeys, updateFlag,
    * compact) must list files AFTER the CAS anchor.
    *
    * `preCommit` runs AFTER the begin-commit CAS claims the sequence
    * (swap lock held — no competing writer can commit) and BEFORE any
    * live-tree rename: side-effect writes that must pair atomically
    * with this commit (a rollup's folded-file sidecar) go here, where
    * a concurrent loser can never clobber them. A failure inside it
    * leaves a swapping manifest with zero renames done — recover()
    * rolls back cleanly and the orphan side effect is overwritten on
    * the next attempt.
    */
  private def rewriteBody(table: String, df: => DataFrame,
                          partitionBy: Seq[String],
                          txnUpdate: Option[(String, Long)] = None,
                          expectedFence: Option[(String, Long)] = None,
                          preCommit: () => Unit = () => (),
                          preSized: Boolean = false): Long = {
    settleOrRecover(table)
    val dst = hpath(table)
    val tmp = freshStaging(table, "__tmp")
    val bak = new Path(path(table) + "__old")
    val fs = fsOf(dst)
    settleOld(table, fs) // archive (not delete) a post-commit leftover
    settleDrops(table, fs) // physically retire committed tombstones
    // CAS anchor BEFORE the staging write: the write EXECUTES the
    // caller's frame (and its file listing) — state reads after this
    // line are covered by the CAS, reads before it are not
    val head0 = readManifest(table)
    checkFence(table, head0, expectedFence)
    val seq0 = head0.map(_.seq).getOrElse(0L)
    val gen = head0.map(_.gen).getOrElse(0L)
    val w = df.write.mode(SaveMode.Overwrite)
    (if (partitionBy.nonEmpty) w.partitionBy(partitionBy: _*) else w)
      .parquet(tmp.toString)
    // callers that SIZE their output deliberately (compact/z-order's
    // targetFiles) opt out of staging compaction
    if (!preSized) compactStaging(tmp, fs, partitionBy)
    try {
      // a first-time rewrite has no committed copy to fall back to: the
      // whole table is `fresh` (rollback = delete), not a swapped dir
      val firstTime = !fs.exists(dst)
      beforeBeginCommit()
      writeManifest(table, gen, swapping = true,
        if (firstTime) Nil else Seq(""),
        if (firstTime) Seq("") else Nil,
        // committed file inventory, recorded while dst is still intact
        if (firstTime) Map.empty else Map("" -> dataFiles(fs, dst)),
        tmpName = Some(tmp.getName), expectedPrev = Some(seq0))
      preCommit() // sequence claimed: paired side effects are exclusive
      snapBeforeMutation(table, fs) // retention: outgoing-gen inventory
      if (!firstTime) fs.rename(dst, bak)
      swapFault(1)
      fs.rename(tmp, dst)
      swapFault(2)
      commitManifest(table, gen + 1, seq0 + 1, txnUpdate)
      disposeOld(table, bak, gen, fs)
    } catch {
      case e: ConcurrentCommitException => fs.delete(tmp, true); throw e
    }
    gen + 1
  }

  /** Rewrite ONLY the partitions in `hitParts`, write-then-swap:
    * the transformed rows land in a sibling `<table>__tmp` first (the
    * live table is never an input AND an output of the same job, so no
    * lineage break is needed — and nothing fault-tolerance-critical
    * lives in executor storage, unlike a `localCheckpoint` pivot), then
    * each written partition dir is swapped into place with per-dir
    * `FileSystem.rename`. A crash leaves every partition wholly old or
    * wholly new — the same temp-swap guarantee as [[rewrite]], at
    * partition granularity. Affected partitions the transform emptied
    * are deleted; untouched partition dirs never move.
    */
  private[sources] def rewriteAffected(table: String,
                                       partitionCols: Seq[String],
                                       hitParts: => DataFrame,
                                       transform: DataFrame => DataFrame): Unit =
    retryCommit {
      rewriteAffectedBody(table, partitionCols, hitParts, transform); ()
    }

  /** `hitParts` BY-NAME ([[appendBody]]'s anchor rule). Returns the
    * number of affected partitions (0 = no-op).
    */
  private def rewriteAffectedBody(table: String,
                                  partitionCols: Seq[String],
                                  hitParts: => DataFrame,
                                  transform: DataFrame => DataFrame): Long = {
    settleOrRecover(table)
    val dst = hpath(table)
    val tmp = freshStaging(table, "__tmp")
    val bak = new Path(path(table) + "__old")
    val fs = fsOf(dst)
    settleOld(table, fs) // archive (not delete) a post-commit leftover
    settleDrops(table, fs) // physically retire committed tombstones
    // CAS anchor BEFORE the hit-partition collect and the staging
    // write: both read table state, and a commit landing after either
    // must fail the CAS, not slide under it
    val head0 = readManifest(table)
    val seq0 = head0.map(_.seq).getOrElse(0L)
    val gen = head0.map(_.gen).getOrElse(0L)
    val affected = hitParts.collect()
    if (affected.isEmpty) return 0L
    val affectedDf = broadcast(
      spark.createDataFrame(java.util.Arrays.asList(affected: _*),
        hitParts.schema))
    val updated = transform(
      read(table).join(affectedDf, partitionCols, "left_semi"))
    // phase 1: job output goes to the tmp sibling; a failure anywhere
    // in here leaves the live table byte-identical
    updated.write.mode(SaveMode.Overwrite)
      .partitionBy(partitionCols: _*).parquet(tmp.toString)
    try {

    // leaf partition dirs the job actually wrote (a transform may also
    // emit rows into partition values outside `affected`, e.g. a flag
    // flip on a partition column; one that empties a partition writes
    // no dir at all)
    val written = leafDirs(fs, tmp, partitionCols.length, "").toSet
    val affectedRels = affected.map { row =>
      partitionCols.zipWithIndex.map { case (c, i) =>
        val v = row.get(i)
        val s = if (v == null) ExternalCatalogUtils.DEFAULT_PARTITION_NAME
                else ExternalCatalogUtils.escapePathName(v.toString)
        s"${ExternalCatalogUtils.escapePathName(c)}=$s"
      }.mkString("/")
    }.toSet
    val emptied = affectedRels -- written

    // manifest fence: record the touched dirs BEFORE the first rename;
    // until the clean generation-bump manifest lands after the last
    // rename, reads resolve every touched dir to its __old copy — a
    // crash anywhere in phase 2 reads as wholly the old generation.
    // Written dirs with NO committed copy in the live table (a brand-new
    // partition value, e.g. a flag flip ON a partition column) go in as
    // `fresh`: they have no __old to restore, so rollback deletes them
    // and crash-window reads exclude them
    val freshRels = written.filter(rel => !fs.exists(new Path(dst, rel)))
    val touchedCommitted = ((written -- freshRels) ++ emptied).toSeq.sorted
    beforeBeginCommit()
    writeManifest(table, gen, swapping = true,
      touchedCommitted,
      freshRels.toSeq.sorted,
      // committed file inventory per touched dir, recorded while every
      // live dir is still intact (before the first rename)
      touchedCommitted.map(rel =>
        rel -> dataFiles(fs, new Path(dst, rel))).toMap,
      tmpName = Some(tmp.getName), expectedPrev = Some(seq0))
    snapBeforeMutation(table, fs) // retention: outgoing-gen inventory

    // phase 2: per-partition swap. Old data moves to the OUTSIDE
    // sibling `__old` (an `…__old` dir inside the table would read as
    // a bogus partition value if a crash stranded it), new dir renames
    // in — each dir is old or new at every instant, never truncated.
    var swaps = 0
    written.foreach { rel =>
      val cur = new Path(dst, rel)
      val old = new Path(bak, rel)
      if (fs.exists(cur)) {
        fs.mkdirs(old.getParent)
        fs.rename(cur, old)
      }
      swaps += 1; swapFault(swaps)
      fs.mkdirs(cur.getParent)
      fs.rename(new Path(tmp, rel), cur)
    }
    // affected partitions the transform emptied: moved aside, not
    // deleted, so rollback can restore them; cleanup removes __old
    emptied.foreach { rel =>
      val cur = new Path(dst, rel)
      if (fs.exists(cur)) {
        val old = new Path(bak, rel)
        fs.mkdirs(old.getParent)
        fs.rename(cur, old)
      }
      swaps += 1; swapFault(swaps)
    }
    commitManifest(table, gen + 1, seq0 + 1)
    fs.delete(tmp, true)
    disposeOld(table, bak, gen, fs)
    } catch {
      case e: ConcurrentCommitException => fs.delete(tmp, true); throw e
    }
    affected.length.toLong
  }

  /** Leaf partition dirs (relative `col=v/...` paths) `depth` levels
    * under `base`.
    */
  // ------------------------------------------------- file statistics

  private def statsPath(table: String) =
    new Path(root, s"$table._graft_stats")

  /** Compute and persist per-FILE min/max/null-count statistics for
    * `statsCols` — the store-level data-skipping index
    * ([[FileStats]]; Delta/Iceberg's file-stats shape on this store's
    * sidecar machinery). One metadata-bounded aggregate job: the scan
    * groups by `_metadata.file_path`, so the collected result is one
    * row per data file regardless of table size. Stats are keyed by
    * file name (Spark part names are UUID-unique), so entries for
    * files a later rewrite replaced are simply never consulted, and
    * files appended after the analyze are scanned unconditionally —
    * staleness degrades SKIPPING, never correctness. Timestamp
    * columns are projected to epoch micros before aggregation
    * (monotonic; assumes the engine's UTC-pinned session for NTZ).
    * Supported column types: integral, float/double (non-finite
    * boundaries drop that file's entry — conservative), decimal,
    * string, boolean, date, timestamp.
    */
  def analyze(table: String, statsCols: Seq[String]): Unit =
    analyze(table, statsCols, Nil)

  /** [[analyze]] with per-file BLOOM filters on `bloomCols` (⊆
    * `statsCols`): the equality/IN skipping complement to [min,max]
    * ranges. Interleaved or high-entropy keys give every file the same
    * wide range — no range ever prunes a point lookup — while a bloom
    * proves "this exact value is not in this file" with NO false
    * negatives, so `readWhere(key === x)` launches tasks only for the
    * handful of files that might hold x (the 100 TB point-read shape).
    * `bloomBits` sizes each filter (k = 4 double-hashed probes;
    * ~1% false-positive rate at bits/12 distinct values per file —
    * false positives cost I/O, never rows). Cost: `bloomBits/8` bytes
    * per (file, col) in the sidecar and k bounded collect_sets riding
    * the same one stats job.
    */
  def analyze(table: String, statsCols: Seq[String],
              bloomCols: Seq[String], bloomBits: Int = 8192): Unit = {
    require(statsCols.nonEmpty, "analyze: name at least one column")
    require(readManifest(table).forall(!_.swapping),
      s"table $table: crashed swap pending — run recover()/a mutation " +
        "before analyze")
    val stats = statsOf(readPinned(table), table, statsCols, bloomCols,
      bloomBits)
    writeStatsSidecar(table, stats)
  }

  /** Atomic (write-temp-then-rename) stats-sidecar replacement: an
    * in-place overwrite would let a concurrent [[readWhere]] /
    * predicate mutation open the sidecar mid-write and parse a
    * truncated line — an exception where the contract promises
    * "staleness degrades skipping, never correctness". The rename
    * leaves at most a brief no-sidecar window (dst deleted, rename
    * pending), which readers already degrade through (scan
    * everything); [[readStatsSidecar]] additionally treats any parse
    * failure as no-sidecar for stores whose rename is not atomic.
    */
  private def writeStatsSidecar(table: String,
                                stats: Map[String, FileStats.PerFile])
      : Unit = {
    val p = statsPath(table)
    val fs = fsOf(p)
    // prune temps orphaned by a crash between create and rename (or a
    // failed rename): nothing else ever reads or deletes them, so
    // repeated crashes would otherwise accumulate files forever
    try {
      fs.globStatus(new Path(p.toString + ".tmp.*")) match {
        case null => ()
        case stale => stale.foreach(s => fs.delete(s.getPath, false))
      }
    } catch { case scala.util.control.NonFatal(_) => () }
    val tmp = new Path(p.toString + ".tmp." +
      java.util.UUID.randomUUID().toString.replace("-", "").take(12))
    val out = fs.create(tmp, true)
    try out.write(FileStats.serialize(stats).getBytes("UTF-8"))
    finally out.close()
    // HDFS/local rename-onto-existing fails: clear dst first. The gap
    // between the two is the degrade-only no-sidecar window.
    if (fs.exists(p)) fs.delete(p, false)
    if (!fs.rename(tmp, p)) {
      fs.delete(tmp, false)
      throw new java.io.IOException(
        s"analyze: could not move stats sidecar into place for $table")
    }
  }

  /** The stats aggregation behind [[analyze]]/[[analyzeIncremental]]:
    * one job over `df` grouped by `_metadata.file_path`, collected as
    * one row per data file.
    */
  private def statsOf(df: DataFrame, table: String,
                      statsCols: Seq[String],
                      bloomCols: Seq[String] = Nil,
                      bloomBits: Int = 8192)
      : Map[String, FileStats.PerFile] = {
    import org.apache.spark.sql.functions._
    import org.apache.spark.sql.types._
    val schema = df.schema
    statsCols.foreach(c => require(schema.exists(_.name == c),
      s"analyze: column $c not in ${schema.map(_.name).mkString(",")}"))
    require(bloomCols.forall(statsCols.contains),
      s"analyze: bloomCols must be a subset of statsCols — extra: " +
        bloomCols.filterNot(statsCols.contains).mkString(","))
    require(bloomBits >= 64 && bloomBits % 64 == 0,
      s"analyze: bloomBits must be a positive multiple of 64, got $bloomBits")
    val bloomK = 4
    def normCol(c: String) = schema(schema.fieldIndex(c)).dataType match {
      case ByteType | ShortType | IntegerType | LongType =>
        col(c).cast(LongType)
      case FloatType  => col(c).cast(DoubleType)
      case DoubleType => col(c)
      case _: DecimalType | StringType | BooleanType => col(c)
      case DateType => datediff(col(c), to_date(lit("1970-01-01")))
      case TimestampType | TimestampNTZType =>
        unix_micros(col(c).cast(TimestampType))
      case other => throw new IllegalArgumentException(
        s"analyze: unsupported stats type ${other.simpleString} for $c")
    }
    // exact per-file column totals for SUM-SAFE types only: integral
    // sums in decimal(38,0), decimals widened to precision 38 at
    // their own scale. Float/double sums are order-dependent (a
    // metadata sum would not equal a re-scan), strings/bools/
    // dates/timestamps have no meaningful total — no sum recorded,
    // and aggWhere degrades those columns to scanning.
    def sumCol(c: String): Option[org.apache.spark.sql.Column] =
      schema(schema.fieldIndex(c)).dataType match {
        case ByteType | ShortType | IntegerType | LongType =>
          Some(sum(col(c).cast(DecimalType(38, 0))))
        case d: DecimalType =>
          Some(sum(col(c).cast(DecimalType(38, d.scale))))
        case _ => None
      }
    val aggs = statsCols.flatMap { c =>
      Seq(min(normCol(c)).as(s"__min_$c"), max(normCol(c)).as(s"__max_$c"),
        sum(col(c).isNull.cast(LongType)).as(s"__null_$c")) ++
        sumCol(c).map(_.as(s"__sum_$c"))
    }
    // bloom bit positions as k bounded collect_sets per column, riding
    // the SAME stats job: pos_i = (h1 + i·h2) mod m over the two
    // xxhash64 streams FileStats.bloomHashes replays driver-side.
    // Null rows hash to a constant position — one spurious bit, which
    // only widens false positives (never a false negative). Each
    // inner pmod is < m, so the sum stays far from Long overflow
    // (ANSI-safe).
    val bloomAggs = bloomCols.flatMap { c =>
      val h1 = pmod(xxhash64(normCol(c)), lit(bloomBits.toLong))
      val h2 = pmod(xxhash64(lit(FileStats.BloomSalt), normCol(c)),
        lit(bloomBits.toLong))
      (0 until bloomK).map(i => collect_set(
        pmod(h1 + lit(i.toLong) * h2, lit(bloomBits.toLong)).cast(IntegerType))
        .as(s"__bloom_${i}_$c"))
    }
    val perFile = df.withColumn("__path", col("_metadata.file_path"))
      .groupBy("__path")
      .agg(count(lit(1)).as("__rows"), (aggs ++ bloomAggs): _*)
      .collect() // one row per data file: metadata-scale by construction
    // URI-path compare: `_metadata.file_path` renders `file:///x` where
    // makeQualified renders `file:/x` — same location, different
    // authority spelling; the path component is the stable key
    val base = fsOf(hpath(table)).makeQualified(hpath(table)).toUri.getPath
    def comparable(v: Any): Option[Any] = v match {
      case null                 => None
      case l: java.lang.Long    => Some(new java.math.BigDecimal(l))
      case i: java.lang.Integer => Some(new java.math.BigDecimal(
        i.longValue()))
      case d: java.lang.Double =>
        if (d.isNaN || d.isInfinite) None
        else Some(new java.math.BigDecimal(d.doubleValue()))
      case b: java.math.BigDecimal => Some(b)
      case s: String               => Some(s)
      case b: java.lang.Boolean    => Some(b)
      case other => throw new IllegalStateException(
        s"analyze: unexpected aggregate value ${other.getClass}")
    }
    val stats = perFile.flatMap { r =>
      val full = new Path(r.getAs[String]("__path")).toUri.getPath
      if (!full.startsWith(base + "/")) None // foreign base: never prune
      else {
        val rel = full.stripPrefix(base + "/")
        val rows = r.getAs[Long]("__rows")
        def bloomOf(c: String): Option[FileStats.Bloom] =
          if (!bloomCols.contains(c)) None
          else {
            val words = new Array[Long](bloomBits / 64)
            (0 until bloomK).foreach { i =>
              r.getAs[scala.collection.Seq[Int]](s"__bloom_${i}_$c")
                .foreach(p => words(p >> 6) |= 1L << (p & 63))
            }
            Some(FileStats.Bloom(bloomBits, bloomK, words))
          }
        def sumOf(c: String): Option[java.math.BigDecimal] =
          if (!r.schema.exists(_.name == s"__sum_$c")) None
          else Option(r.getAs[java.math.BigDecimal](s"__sum_$c"))
            .orElse {
              // SUM is NULL for an all-null file (exact total 0) but
              // ALSO on decimal-38 overflow under non-ANSI Sum —
              // recording 0 there would silently corrupt aggWhere
              // totals, so only the provable all-null case maps to 0
              // and an overflowed file carries NO sum (demotes to
              // scanning, the degrade-I/O-never-totals contract)
              if (r.getAs[Long](s"__null_$c") == rows)
                Some(java.math.BigDecimal.ZERO)
              else None
            }
        val cols = statsCols.flatMap { c =>
          val nulls = r.getAs[Long](s"__null_$c")
          (comparable(r.getAs[Any](s"__min_$c")),
            comparable(r.getAs[Any](s"__max_$c"))) match {
            case (Some(mn), Some(mx)) =>
              Some(c -> FileStats.ColStats(rows, nulls, Some(mn), Some(mx),
                bloomOf(c), sumOf(c)))
            case (None, None) if nulls == rows => // all-null: prunable
              Some(c -> FileStats.ColStats(rows, nulls, None, None,
                None, sumOf(c)))
            case _ => None // non-finite boundary: no stats for this col
          }
        }.toMap
        Some(rel -> FileStats.PerFile(rows, cols))
      }
    }.toMap
    stats
  }

  /** INCREMENTAL [[analyze]]: compute stats ONLY for committed files
    * the sidecar does not know yet (appended since the last analyze)
    * and merge them in — the steady-state maintenance call for an
    * append-heavy corpus: cost scales with the NEW bytes, not the
    * table. Entries for files a rewrite replaced are pruned from the
    * sidecar (their names are gone from the inventory). `statsCols`
    * must match the previous analyze's columns for uniform skipping
    * (not enforced — files analyzed with fewer columns simply prune
    * on fewer; correctness is unaffected either way). No-op when
    * nothing is new.
    */
  def analyzeIncremental(table: String, statsCols: Seq[String]): Unit =
    analyzeIncremental(table, statsCols, Nil)

  /** [[analyzeIncremental]] with BLOOM filters on `bloomCols` for the
    * new files (see the bloom [[analyze]] overload); previously
    * analyzed files keep whatever stats (with or without blooms) they
    * already have — skipping uniformity is per-file, correctness is
    * unaffected either way.
    */
  def analyzeIncremental(table: String, statsCols: Seq[String],
                         bloomCols: Seq[String],
                         bloomBits: Int = 8192): Unit = {
    require(statsCols.nonEmpty, "analyzeIncremental: name at least one column")
    require(readManifest(table).forall(!_.swapping),
      s"table $table: crashed swap pending — run recover()/a mutation " +
        "before analyze")
    val fs = fsOf(hpath(table))
    val prior = readStatsSidecar(table) match {
      case Some(st) => st
      case None     => analyze(table, statsCols, bloomCols, bloomBits); return
    }
    val current = committedFiles(table, fs)
    val currentSet = current.toSet
    val missing = current.filterNot(prior.contains)
    val live = prior.view.filterKeys(currentSet).toMap
    if (missing.isEmpty) {
      if (live.size != prior.size) // rewrite pruned files: shrink sidecar
        writeStatsSidecar(table, live)
      return
    }
    val dstS = path(table)
    val delta = statsOf(
      rd(table).option("basePath", dstS)
        .parquet(missing.map(r => s"$dstS/$r"): _*),
      table, statsCols, bloomCols, bloomBits)
    writeStatsSidecar(table, live ++ delta)
  }

  /** The stats sidecar, if one exists (shared by [[readWhere]],
    * [[analyzeIncremental]], and the predicate mutations).
    */
  private def readStatsSidecar(table: String)
      : Option[Map[String, FileStats.PerFile]] = {
    val sp = statsPath(table)
    val fs = fsOf(sp)
    // ANY failure here — vanished between exists and open (concurrent
    // [[writeStatsSidecar]] replacement), or a truncated/garbled body
    // on a store without atomic rename — degrades to "no sidecar"
    // (scan everything): staleness may cost skipping, never
    // correctness, and never an exception in a reader. But the
    // degrade must stay OBSERVABLE: a persistent IO/permission
    // problem silently disabling skipping on every read would be an
    // invisible performance regression, so a sidecar that EXISTS yet
    // fails to open/parse logs one warning per table.
    try {
      if (!fs.exists(sp)) None
      else {
        val in = fs.open(sp)
        val txt =
          try scala.io.Source.fromInputStream(in, "UTF-8").mkString
          finally in.close()
        Some(FileStats.deserialize(txt))
      }
    } catch {
      case scala.util.control.NonFatal(e) =>
        if (TableStore.sidecarWarned.add(sp.toString))
          org.slf4j.LoggerFactory.getLogger(classOf[TableStore]).warn(
            s"stats sidecar for table $table exists but failed to " +
              s"open/parse (${e.getClass.getSimpleName}: ${e.getMessage}); " +
              "file skipping disabled for this table until a successful " +
              "analyze() — results remain correct, reads scan everything")
        None
    }
  }

  /** Predicate read with FILE-LEVEL skipping: files whose analyzed
    * [min,max]/null stats prove the predicate empty are excluded from
    * the scan — no task, no footer read — and the full predicate is
    * re-applied to the survivors, so pruning is invisible to results.
    * Files without stats (appended since the last [[analyze]], or a
    * column the analyze didn't cover) are always scanned. With no
    * sidecar, or under a crashed swap, this is exactly
    * `read(table).filter(pred)`.
    */
  def readWhere(table: String, pred: org.apache.spark.sql.Column): DataFrame = {
    def plain = read(table).filter(pred)
    if (readManifest(table).exists(_.swapping)) return plain
    val stats = readStatsSidecar(table) match {
      case Some(st) => st
      case None     => return plain
    }
    val fs = fsOf(hpath(table))
    val files = committedFiles(table, fs)
    if (files.isEmpty) return plain
    // the predicate's RESOLVED, constant-folded form: analyze+optimize
    // the filtered frame (driver-side, no job) and collect every
    // Filter condition — typed literals, no unresolved nodes, the
    // optimizer's implied-IsNotNull conjuncts included. A predicate
    // the optimizer folds away entirely leaves no Filter: no pruning.
    val conds = plain.queryExecution.optimizedPlan.collect {
      case f: org.apache.spark.sql.catalyst.plans.logical.Filter =>
        f.condition
    }
    val kept = files.filter(rel =>
      stats.get(rel).forall(pf =>
        conds.forall(c => FileStats.mayMatch(c, pf))))
    if (kept.size == files.size) plain
    else if (kept.isEmpty) plain.limit(0) // no file can match
    else rd(table).option("basePath", path(table))
      .parquet(kept.map(r => s"${path(table)}/$r"): _*)
      .filter(pred)
  }

  /** Predicate COUNT answered from METADATA wherever the stats sidecar
    * can prove it: each file is classified ALL (every row provably
    * matches — contributes its sidecar row count, zero I/O), NONE
    * (provably empty under the predicate — contributes 0), or
    * BOUNDARY (indeterminate — read and counted). At 100 TB a
    * time-range or partition-key count touches only the files
    * straddling the range edges; the interior — almost everything —
    * is settled from the sidecar. Exactness is unconditional: the
    * ALL/NONE proofs are [[FileStats.allMatch]]/[[FileStats.mayMatch]]
    * (both conservative, SQL null semantics), and stale-stats files
    * simply classify BOUNDARY and get read. Falls back to a plain
    * filtered count with no sidecar, under a live swap, or when the
    * optimizer folds the predicate away entirely (no Filter conjuncts
    * to prove against — including a literal-false predicate whose
    * plan collapses to an empty relation).
    */
  def countWhere(table: String, pred: org.apache.spark.sql.Column): Long =
    countWhereDetail(table, pred)._1

  /** [[countWhere]] + file accounting for audits and specs:
    * (count, provedAll, provedNone, scanned).
    */
  private[graft] def countWhereDetail(
      table: String, pred: org.apache.spark.sql.Column)
      : (Long, Int, Int, Int) = {
    def plain = read(table).filter(pred)
    def fallback = (plain.count(), 0, 0, -1)
    if (readManifest(table).exists(_.swapping)) return fallback
    val stats = readStatsSidecar(table) match {
      case Some(st) => st
      case None     => return fallback
    }
    val fs = fsOf(hpath(table))
    val files = committedFiles(table, fs)
    if (files.isEmpty) return (0L, 0, 0, 0)
    val conds = plain.queryExecution.optimizedPlan.collect {
      case f: org.apache.spark.sql.catalyst.plans.logical.Filter =>
        f.condition
    }
    // no Filter left: the optimizer folded the predicate — true AND
    // false both land here, so the metadata path cannot distinguish
    // them; execute the plain count (correctness over cleverness)
    if (conds.isEmpty) return fallback
    val (provedAll, rest) = files.partition(rel =>
      stats.get(rel).exists(pf =>
        conds.forall(c => FileStats.allMatch(c, pf))))
    val (scanned, provedNone) = rest.partition(rel =>
      stats.get(rel).forall(pf =>
        conds.forall(c => FileStats.mayMatch(c, pf))))
    val metaCount = provedAll.map(stats(_).rows).sum
    val scanCount =
      if (scanned.isEmpty) 0L
      else rd(table).option("basePath", path(table))
        .parquet(scanned.map(r => s"${path(table)}/$r"): _*)
        .filter(pred).count()
    (metaCount + scanCount, provedAll.size, provedNone.size,
      scanned.size)
  }

  /** METADATA-ONLY predicate AGGREGATES — [[countWhere]] extended to
    * (count, sum, min, max) of an integral/decimal `valueCol`: files
    * the stats sidecar PROVES all-matching contribute their recorded
    * row count, exact column total, and [min,max] with ZERO I/O;
    * provably-empty files are skipped; only BOUNDARY files (range
    * edges) are read, filtered, and aggregated — so a time-window
    * revenue total over a clustered 100 TB table touches the two edge
    * files, not the window. A proved-all file whose sidecar predates
    * the sum field (or whose `valueCol` was not analyzed) is demoted
    * to scanning — staleness degrades I/O, never totals. Falls back
    * to a full filtered aggregate when there is no usable sidecar or
    * the optimizer folded the predicate (the [[countWhere]]
    * contract). SUM/MIN/MAX skip NULLs; COUNT counts matching ROWS
    * (so it always equals [[countWhere]]). Float/double value columns
    * are rejected loudly: their sum is order-dependent, a metadata
    * total could not be certified against a scan.
    */
  def aggWhere(table: String, pred: org.apache.spark.sql.Column,
               valueCol: String): TableStore.AggWhere =
    aggWhereDetail(table, pred, valueCol)._1

  /** [[aggWhere]] + file accounting for audits and specs:
    * (agg, provedAll, provedNone, scanned).
    */
  private[graft] def aggWhereDetail(
      table: String, pred: org.apache.spark.sql.Column,
      valueCol: String): (TableStore.AggWhere, Int, Int, Int) = {
    import org.apache.spark.sql.functions._
    import org.apache.spark.sql.types._
    val schema = committedSchema(table)
    require(schema.exists(_.name == valueCol),
      s"aggWhere: column $valueCol not in " +
        schema.map(_.name).mkString(","))
    val scale = schema(schema.fieldIndex(valueCol)).dataType match {
      case ByteType | ShortType | IntegerType | LongType => 0
      case d: DecimalType => d.scale
      case other => throw new IllegalArgumentException(
        s"aggWhere: $valueCol is ${other.simpleString}; only " +
          "integral/decimal columns have exact order-independent sums")
    }
    val dt = DecimalType(38, scale)
    def aggOf(df: DataFrame): TableStore.AggWhere = {
      val r = df.agg(count(lit(1)), sum(col(valueCol).cast(dt)),
        min(col(valueCol).cast(dt)), max(col(valueCol).cast(dt))).head()
      val mn = Option(r.getAs[java.math.BigDecimal](2))
      val sm = Option(r.getAs[java.math.BigDecimal](1))
      // non-null values present but a NULL sum = decimal-38 overflow
      // under non-ANSI Sum; 0 would be silently wrong — fail loudly
      if (sm.isEmpty && mn.isDefined) throw new ArithmeticException(
        s"aggWhere($table, $valueCol): SUM overflowed decimal(38) " +
          "during the scan — the total is not representable exactly")
      TableStore.AggWhere(r.getLong(0),
        sm.getOrElse(java.math.BigDecimal.ZERO), mn,
        Option(r.getAs[java.math.BigDecimal](3)))
    }
    def fallback = (aggOf(read(table).filter(pred)), 0, 0, -1)
    if (readManifest(table).exists(_.swapping)) return fallback
    val stats = readStatsSidecar(table) match {
      case Some(st) => st
      case None     => return fallback
    }
    val fs = fsOf(hpath(table))
    val files = committedFiles(table, fs)
    if (files.isEmpty)
      return (TableStore.AggWhere(0L, java.math.BigDecimal.ZERO, None,
        None), 0, 0, 0)
    val conds = read(table).filter(pred)
      .queryExecution.optimizedPlan.collect {
        case f: org.apache.spark.sql.catalyst.plans.logical.Filter =>
          f.condition
      }
    if (conds.isEmpty) return fallback
    // a proved-all file is metadata-usable only with a recorded sum
    // for valueCol (all-null files carry sum 0)
    def metaUsable(rel: String): Boolean =
      stats.get(rel).exists(pf => pf.cols.get(valueCol)
        .exists(_.sum.isDefined) &&
        conds.forall(c => FileStats.allMatch(c, pf)))
    val (provedAll, rest) = files.partition(metaUsable)
    val (scanned, provedNone) = rest.partition(rel =>
      stats.get(rel).forall(pf =>
        conds.forall(c => FileStats.mayMatch(c, pf))))
    val meta = provedAll.foldLeft(TableStore.AggWhere(0L,
      java.math.BigDecimal.ZERO, None, None)) { (acc, rel) =>
      val pf = stats(rel); val cs = pf.cols(valueCol)
      def bd(v: Option[Any]) = v.collect {
        case b: java.math.BigDecimal => b
      }
      TableStore.AggWhere(acc.count + pf.rows,
        acc.sum.add(cs.sum.get),
        TableStore.minOpt(acc.min, bd(cs.min)),
        TableStore.maxOpt(acc.max, bd(cs.max)))
    }
    val scan =
      if (scanned.isEmpty)
        TableStore.AggWhere(0L, java.math.BigDecimal.ZERO, None, None)
      else aggOf(rd(table).option("basePath", path(table))
        .parquet(scanned.map(r => s"${path(table)}/$r"): _*)
        .filter(pred))
    (TableStore.AggWhere(meta.count + scan.count,
      meta.sum.add(scan.sum),
      TableStore.minOpt(meta.min, scan.min),
      TableStore.maxOpt(meta.max, scan.max)),
      provedAll.size, provedNone.size, scanned.size)
  }

  // ---------------------------------------------- incremental rollups

  private def rollupKey(src: String) = s"__rollup:$src"
  private def rollupSidecar(rollup: String, seq: Long) =
    new Path(root, s"$rollup._graft_rollup.$seq")

  private def readRollupSidecar(rollup: String, seq: Long): Set[String] = {
    val p = rollupSidecar(rollup, seq)
    val fs = fsOf(p)
    if (!fs.exists(p)) throw new IllegalStateException(
      s"rollup $rollup: folded-file sidecar seq $seq is missing — " +
        "state is unrecoverable incrementally; delete the rollup table " +
        "and refresh to rebuild")
    val in = fs.open(p)
    val txt =
      try scala.io.Source.fromInputStream(in, "UTF-8").mkString
      finally in.close()
    txt.split("\n").filter(_.startsWith("f=")).map(_.stripPrefix("f=")).toSet
  }

  /** INCREMENTAL AGGREGATE MAINTENANCE — keep `rollup` equal to
    * `src.groupBy(groupCols).agg(...)` by folding in ONLY the files
    * appended to `src` since the last refresh: at 100 TB the corpus
    * rescan is the cost that kills scheduled rollups, and every agg
    * kind here (`count`/`sum`/`min`/`max`) is MERGEABLE, so
    * new-files-partial + previous-rollup re-aggregated is exactly the
    * full recompute (spec-pinned). `aggs` = (outCol, kind, srcCol)
    * with kind ∈ count|sum|min|max (count ignores srcCol).
    *
    * Protocol (exactly-once under crashes AND concurrent refreshes,
    * the txn-fence shape): the whole derivation — fence read, folded
    * list, delta — runs inside the commit retry, the fence value it
    * observed is RE-VALIDATED under the rewrite's CAS anchor
    * (`expectedFence`), and the cumulative folded-file list is
    * written to its SEQUENCED sidecar only AFTER the begin-commit CAS
    * claims the sequence (`preCommit`) — so two overlapping refreshes
    * can never both fold the same delta (the loser's fence check
    * fails and it re-derives against the winner's state, normally a
    * no-op) and a loser can never clobber the winner's sidecar (it
    * never reaches the claimed region). A crash between the sidecar
    * write and the clean commit rolls back via recover(): the fence
    * stays at the old sequence, the next refresh re-derives the same
    * delta and overwrites the orphan sidecar; double-folding a file
    * is impossible because the list and the fence advance together.
    * A REWRITE/compaction of `src` (folded file names vanish from its
    * inventory) triggers a loud full rebuild — file identity is the
    * incremental contract, and silently treating renamed files as new
    * would double-count every row. Returns the number of source
    * files folded this call (0 = no-op).
    */
  def refreshRollup(src: String, rollup: String, groupCols: Seq[String],
                    aggs: Seq[(String, String, String)]): Long = {
    import org.apache.spark.sql.functions._
    require(groupCols.nonEmpty, "refreshRollup: name group columns")
    require(aggs.nonEmpty, "refreshRollup: name at least one aggregate")
    val kinds = Set("count", "sum", "min", "max")
    aggs.foreach { case (o, k, _) => require(kinds(k),
      s"refreshRollup: unsupported kind '$k' for $o (count|sum|min|max)") }
    require(this.exists(src),
      s"refreshRollup: source table $src does not exist")
    retryCommit {
    settleOrRecover(src)
    settleOrRecover(rollup)
    val fs = fsOf(hpath(src))
    val current = committedFiles(src, fs).toSet
    val n = lastTxn(rollup, rollupKey(src))
    afterFenceRead() // test seam: concurrent-refresh TOCTOU window
    val folded: Set[String] =
      if (n < 0) Set.empty
      else try readRollupSidecar(rollup, n) catch {
        // a concurrent refresh that advanced the fence past n also
        // prunes the seq-n sidecar — for a stale reader that is a
        // collision (re-derive against the new fence), not the
        // unrecoverable-state error a genuinely missing sidecar is
        case e: IllegalStateException =>
          val now = lastTxn(rollup, rollupKey(src))
          if (now != n)
            throw new ConcurrentCommitException(rollup, n, now,
              what = s"txn fence ${rollupKey(src)}")
          else throw e
      }
    val rebuild = (folded -- current).nonEmpty // src was rewritten
    val base = if (rebuild) Set.empty[String] else folded
    val newFiles = (current -- base).toSeq.sorted
    if (newFiles.isEmpty && !rebuild && n >= 0) 0L
    else {
    def widenSum(c: String): org.apache.spark.sql.Column =
      committedSchema(src).find(_.name == c).map(_.dataType) match {
        case Some(d: org.apache.spark.sql.types.DecimalType) =>
          col(c).cast(org.apache.spark.sql.types.DecimalType(38, d.scale))
        case _ => col(c)
      }
    val partialAggs = aggs.map {
      case (o, "count", _) => count(lit(1)).as(o)
      case (o, "sum", c)   => sum(widenSum(c)).as(o)
      case (o, "min", c)   => min(col(c)).as(o)
      case (o, "max", c)   => max(col(c)).as(o)
    }
    val mergeAggs = aggs.map {
      case (o, "count", _) => sum(col(o)).as(o)
      case (o, "sum", _)   => sum(col(o)).as(o)
      case (o, "min", _)   => min(col(o)).as(o)
      case (o, "max", _)   => max(col(o)).as(o)
    }
    val srcS = path(src)
    def partial(df: DataFrame): DataFrame =
      df.groupBy(groupCols.map(col): _*)
        .agg(partialAggs.head, partialAggs.tail: _*)
    val delta =
      if (newFiles.isEmpty) None
      else Some(partial(rd(src).option("basePath", srcS)
        .parquet(newFiles.map(r => s"$srcS/$r"): _*)))
    def prior =
      if (rebuild || n < 0 || !this.exists(rollup)) None
      else Some(read(rollup))
    def combined = (prior, delta) match {
      case (Some(p), Some(d)) =>
        p.unionByName(d).groupBy(groupCols.map(col): _*)
          .agg(mergeAggs.head, mergeAggs.tail: _*)
      case (None, Some(d)) =>
        // count partials are already final; re-merge is identity but
        // normalizes output types with the union path
        d.groupBy(groupCols.map(col): _*)
          .agg(mergeAggs.head, mergeAggs.tail: _*)
      case (Some(p), None) => p // rebuild with zero files cannot happen
      case (None, None)    => partial(read(src).limit(0))
    }
    // sidecar written INSIDE the claimed commit window (preCommit):
    // after the begin-commit CAS no competing refresh can reach this
    // point at the same sequence, so the winner's sidecar can never
    // be clobbered by a stale loser — and the fence value observed
    // above is re-validated under the same anchor (expectedFence),
    // closing the read-fence/commit TOCTOU (double-fold) window
    val cum = (if (rebuild) Set.empty[String] else base) ++ newFiles
    val sp = rollupSidecar(rollup, n + 1)
    rewriteBody(rollup, combined, Nil,
      txnUpdate = Some(rollupKey(src) -> (n + 1)),
      expectedFence = Some(rollupKey(src) -> n),
      preCommit = () => {
        val out = fsOf(sp).create(sp, true)
        try out.write(cum.toSeq.sorted.map("f=" + _)
          .mkString("", "\n", "\n").getBytes("UTF-8"))
        finally out.close()
      })
    // prune superseded sidecars (crash before this is harmless)
    val done = fsOf(sp)
    val old = done.globStatus(new Path(root, s"$rollup._graft_rollup.*"))
    if (old != null) old.foreach { st =>
      val s = st.getPath.getName.stripPrefix(s"$rollup._graft_rollup.")
      if (s.toLongOption.exists(_ < n + 1)) done.delete(st.getPath, false)
    }
    newFiles.size.toLong
    }
    }
  }

  private def leafDirs(fs: FileSystem, base: Path, depth: Int,
                       rel: String): Seq[String] =
    if (depth == 0) Seq(rel)
    else fs.listStatus(base).toSeq
      .filter(s => s.isDirectory && s.getPath.getName.contains("="))
      .flatMap(s => leafDirs(fs, s.getPath, depth - 1,
        if (rel.isEmpty) s.getPath.getName
        else s"$rel/${s.getPath.getName}"))

  // ------------------------------------------- generation retention
  //
  // Opt-in time travel (`retainGenerations > 0`): every mutation first
  // writes a SNAPSHOT manifest (`<table>._graft_snap.<gen>`) listing
  // the outgoing generation's complete data-file inventory, and the
  // cleanup phase ARCHIVES replaced files (one rename of the `__old`
  // sibling into `<table>__archive/gen=<g>/`) instead of deleting
  // them. Because Spark part-file names are UUID-unique, every file of
  // every generation exists at exactly one location forever — live
  // until replaced, then in the archive of the generation whose
  // mutation replaced it — so [[readAt]] resolves a past generation by
  // probing archives gen..current (then the in-flight `__old`, then
  // the live dir) per inventoried file. The archive sibling sits
  // OUTSIDE the table dir: live scans, `dataFiles`, and the commit
  // manifests never see it. Appends replace nothing, so a retained
  // append costs one inventory listing and no data movement; retention
  // is bounded — archives and snapshots older than
  // `current − retainGenerations` are pruned at each cleanup (or
  // explicitly via [[vacuum]]).

  private def archiveRoot(table: String) = new Path(path(table) + "__archive")
  private def snapName(table: String) = s"$table._graft_snap."

  private def writeSnap(table: String, gen: Long,
                        files: Seq[String]): Unit = {
    val p = new Path(root, snapName(table) + gen)
    val fs = fsOf(p)
    val out = fs.create(p, true) // overwrite: a rolled-back retry re-lists
    try out.write(files.map("f=" + _).mkString("", "\n", "\n")
      .getBytes("UTF-8"))
    finally out.close()
  }

  private def readSnap(table: String, gen: Long): Option[Seq[String]] = {
    val p = new Path(root, snapName(table) + gen)
    val fs = fsOf(p)
    if (!fs.exists(p)) None
    else {
      val in = fs.open(p)
      val txt =
        try scala.io.Source.fromInputStream(in, "UTF-8").mkString
        finally in.close()
      Some(txt.split("\n").toSeq.filter(_.startsWith("f="))
        .map(_.stripPrefix("f=")))
    }
  }

  /** Record the outgoing generation's inventory (no-op when retention
    * is off or the table does not exist yet). Call AFTER [[recover]]
    * and BEFORE the first rename of a mutation — the live tree is
    * still exactly the committed generation there.
    */
  private def snapBeforeMutation(table: String, fs: FileSystem): Unit =
    if (retainGenerations > 0 && fs.exists(hpath(table))) {
      val gen = readManifest(table).map(_.gen).getOrElse(0L)
      writeSnap(table, gen, dataFiles(fs, hpath(table)))
    }

  /** Cleanup-phase disposal of the `__old` sibling: archive under the
    * outgoing generation when retaining, delete otherwise. Prunes
    * archives/snapshots past the retention window either way.
    */
  private def disposeOld(table: String, bak: Path, outgoingGen: Long,
                         fs: FileSystem): Unit = {
    disposeFault()
    if (retainGenerations > 0 && fs.exists(bak)) {
      val dest = new Path(archiveRoot(table), s"gen=$outgoingGen")
      fs.delete(dest, true) // a rolled-back earlier attempt's leftovers
      fs.mkdirs(dest.getParent)
      fs.rename(bak, dest)
    } else fs.delete(bak, true)
    if (retainGenerations > 0)
      vacuum(table, keepLast = retainGenerations)
  }

  /** Settle a `__old` sibling left by a crash BETWEEN a clean commit
    * and its [[disposeOld]]: under a clean manifest the leftover holds
    * exactly the files the last mutation replaced (outgoing generation
    * = current − 1), so a retained store must ARCHIVE it — the
    * unconditional delete the mutation paths previously ran here
    * silently destroyed retained history in that window. [[readAt]]
    * already resolves from `__old` while the leftover sits unsettled.
    * Under a swapping manifest [[recover]] owns `__old`; no-op here.
    */
  private def settleOld(table: String, fs: FileSystem): Unit = {
    val bak = new Path(path(table) + "__old")
    if (fs.exists(bak) && readManifest(table).forall(!_.swapping)) {
      val cur = readManifest(table).map(_.gen).getOrElse(0L)
      disposeOld(table, bak, cur - 1, fs)
    }
  }

  /** Drop retained generations older than the last `keepLast`:
    * archives and snapshot manifests both. The live generation is
    * never touched.
    */
  def vacuum(table: String, keepLast: Int): Unit = {
    require(keepLast >= 0, s"keepLast >= 0, got $keepLast")
    val cur = readManifest(table).map(_.gen).getOrElse(0L)
    val cutoff = cur - keepLast
    val ar = archiveRoot(table)
    val fs = fsOf(ar)
    if (fs.exists(ar)) fs.listStatus(ar).foreach { st =>
      val name = st.getPath.getName
      if (name.startsWith("gen=") &&
          name.stripPrefix("gen=").toLongOption.exists(_ < cutoff))
        fs.delete(st.getPath, true)
    }
    val snaps = fs.globStatus(new Path(new Path(root),
      snapName(table) + "*"))
    if (snaps != null) snaps.foreach { st =>
      val g = st.getPath.getName.stripPrefix(snapName(table)).toLongOption
      if (g.exists(_ < cutoff)) fs.delete(st.getPath, false)
    }
  }

  /** Delete orphaned staging siblings (`<table>__tmp.*` /
    * `<table>__add.*`) not referenced by the head manifest — leftovers
    * of writers that died BEFORE their begin-commit CAS (after the
    * CAS, [[recover]] owns cleanup via the manifest's `tmp=` record).
    * Run only when no writer is active on the table: a LIVE writer's
    * in-flight staging is indistinguishable from an orphan.
    */
  def cleanStaging(table: String): Unit = {
    val rootP = new Path(root)
    val fs = fsOf(rootP)
    val live = readManifest(table).flatMap(_.tmp).toSet
    Seq("__tmp.*", "__add.*").foreach { pat =>
      val st = fs.globStatus(new Path(rootP, table + pat))
      if (st != null) st.foreach { s =>
        if (!live.contains(s.getPath.getName)) fs.delete(s.getPath, true)
      }
    }
  }

  /** Retained generations currently resolvable, ascending. */
  // ------------------------------------------------------ named tags

  private def tagPath(table: String, name: String) =
    new Path(root, s"$table._graft_tag_$name")

  private def requireTagName(name: String): Unit =
    require(name.nonEmpty && name.matches("[A-Za-z0-9_-]+"),
      s"tag name must be [A-Za-z0-9_-]+ (no dots — they would collide with temp files), got '$name'")

  /** Name a generation — the human handle on [[readAt]]'s pins
    * (release "v12" instead of generation 847): writes a tiny
    * sidecar file via the stats sidecar's write-temp-then-rename, so
    * a tag is always wholly old or wholly new. Re-tagging an existing
    * name moves it (documented: tags are mutable refs, generations
    * are the immutable truth); the tagged generation must be readable
    * NOW (current, or retained) — tagging the unretainable fails
    * loudly rather than minting a dangling name. Returns the tagged
    * generation.
    */
  def tag(table: String, name: String,
          gen: Option[Long] = None): Long = {
    requireTagName(name)
    val cur = readManifest(table).map(_.gen).getOrElse(
      throw new IllegalArgumentException(s"no such table: $table"))
    val g = gen.getOrElse(cur)
    if (g != cur) readAt(table, g) // loud existence/retention probe
    val p = tagPath(table, name)
    val fs = fsOf(p)
    val tmp = new Path(p.toString + ".tmp." +
      java.util.UUID.randomUUID().toString.replace("-", "").take(12))
    val out = fs.create(tmp, true)
    try out.write(g.toString.getBytes("UTF-8")) finally out.close()
    if (fs.exists(p)) fs.delete(p, false)
    if (!fs.rename(tmp, p)) {
      fs.delete(tmp, false)
      throw new java.io.IOException(
        s"tag: could not move tag $name into place for $table")
    }
    g
  }

  /** The generation a tag names, or None. A torn/corrupt tag file
    * reads as None (the sidecar degrade rule — never a crash).
    */
  def tagGeneration(table: String, name: String): Option[Long] = {
    requireTagName(name)
    val p = tagPath(table, name)
    val fs = fsOf(p)
    try {
      if (!fs.exists(p)) None
      else {
        val in = fs.open(p)
        val txt = try scala.io.Source.fromInputStream(in, "UTF-8")
          .mkString.trim finally in.close()
        txt.toLongOption
      }
    } catch { case scala.util.control.NonFatal(_) => None }
  }

  /** [[readAt]] by name: the table as of the tagged generation. */
  def readTag(table: String, name: String): DataFrame =
    readAt(table, tagGeneration(table, name).getOrElse(
      throw new IllegalArgumentException(
        s"table $table: no tag '$name'")))

  /** All tags on `table` (name → generation). */
  def tags(table: String): Map[String, Long] = {
    val fs = fsOf(new Path(root))
    val prefix = s"$table._graft_tag_"
    val hits = fs.globStatus(new Path(new Path(root), prefix + "*"))
    if (hits == null) Map.empty
    else hits.toSeq.flatMap { st =>
      val n = st.getPath.getName.stripPrefix(prefix)
      // glob also sees in-flight temps: skip anything not a pure name
      if (!n.matches("[A-Za-z0-9_-]+")) None
      else tagGeneration(table, n).map(n -> _)
    }.toMap
  }

  /** Delete a tag (the generation itself is untouched). */
  def dropTag(table: String, name: String): Unit = {
    requireTagName(name)
    val p = tagPath(table, name)
    fsOf(p).delete(p, false)
    ()
  }

  def generations(table: String): Seq[Long] = {
    val fs = fsOf(new Path(root))
    val snaps = fs.globStatus(new Path(new Path(root),
      snapName(table) + "*"))
    val past =
      if (snaps == null) Nil
      else snaps.toSeq.flatMap(
        _.getPath.getName.stripPrefix(snapName(table)).toLongOption)
    (past ++ readManifest(table).map(_.gen)).distinct.sorted
  }

  /** Time-travel read: the table exactly as of generation `asOfGen` —
    * the reproducible-corpus contract (pin the generation a training
    * run consumed; re-reading it later returns the identical rows no
    * matter what has been upserted, deleted, or compacted since).
    * `asOfGen == current` is the live [[read]]; past generations need
    * retention ([[TableStore]] built with `retainGenerations > 0`) and
    * fail loudly when the snapshot has been vacuumed or never existed.
    * Resolution cost: one existence probe per inventoried file per
    * archive generation in [gen, current) — bounded by the retention
    * window.
    */
  def readAt(table: String, asOfGen: Long): DataFrame = {
    val cur = readManifest(table).map(_.gen).getOrElse(0L)
    if (asOfGen == cur) return read(table)
    require(asOfGen < cur,
      s"table $table: generation $asOfGen is in the future (current $cur)")
    val files = readSnap(table, asOfGen).getOrElse(
      throw new IllegalArgumentException(
        s"table $table: generation $asOfGen is not retained — " +
          "retention off, vacuumed, or never committed"))
    // a legitimately empty generation (every row deleted) must read
    // back as zero rows, not an error; parquet files carry the schema,
    // so an empty generation borrows the live table's (documented: a
    // later schema-changing rewrite changes what an empty pin reads
    // back with — there are no rows for it to matter)
    if (files.isEmpty) return read(table).limit(0)
    readFilesResolved(table, files, asOfGen, cur)
  }

  /** Read `files` (relative paths) of generation `asOfGen`: each file
    * may sit in the live tree, a pending `__old` sibling, or any
    * retained `gen=h` archive for h in [asOfGen, cur) — a file
    * archived by a later rewrite landed under the generation it was
    * dropped FROM. Shared by [[readAt]] and [[changesBetween]].
    */
  private def readFilesResolved(table: String, files: Seq[String],
                                asOfGen: Long, cur: Long): DataFrame = {
    val dstS = path(table)
    val fs = fsOf(hpath(table))
    val bases: Seq[String] =
      (asOfGen until cur).map(h =>
        new Path(archiveRoot(table), s"gen=$h").toString) ++
        Seq(dstS + "__old", dstS)
    val byBase = scala.collection.mutable.LinkedHashMap
      .empty[String, Vector[String]]
    files.foreach { rel =>
      val base = bases.find(b => fs.exists(new Path(b, rel))).getOrElse(
        throw new IllegalStateException(
          s"table $table: file $rel of generation $asOfGen is missing " +
            "from the live tree and every retained archive"))
      byBase(base) = byBase.getOrElse(base, Vector.empty) :+ s"$base/$rel"
    }
    byBase.map { case (base, paths) =>
      rd(table).option("basePath", base).parquet(paths: _*)
    }.reduce(_ unionByName _)
  }

  /** CHANGE FEED between two committed generations: every row that is
    * in `toGen` but not `fromGen` (`__change_type = 'insert'`) and
    * every row in `fromGen` but not `toGen` (`'delete'`) — the
    * incremental-consumer primitive (downstream rollup/index/CDC
    * maintenance reads the delta, never the table). An update
    * surfaces as its delete + insert pair.
    *
    * Cost scales with the CHURN, not the table: only files that
    * CHANGED between the inventories are read (a file present in both
    * generations contributes nothing and is never opened), and the
    * one exchange is the multiset anti-join between added-file and
    * removed-file rows. That anti-join is also what makes pure
    * reorganizations invisible: a compaction / Z-order rewrite drops
    * and re-adds the same ROWS in different files, so both sides
    * cancel and the feed is EMPTY — consumers see data changes, never
    * layout changes. (Duplicate rows are handled as multisets:
    * going 3 copies → 1 copy feeds 2 deletes.)
    *
    * `fromGen`/`toGen` must be committed generations with retained
    * inventories ([[generations]]); `toGen` may be the live one.
    * `fromGen == toGen` returns the empty feed.
    */
  def changesBetween(table: String, fromGen: Long, toGen: Long)
      : DataFrame = {
    import org.apache.spark.sql.functions.lit
    require(fromGen <= toGen,
      s"changesBetween: fromGen $fromGen > toGen $toGen")
    val cur = readManifest(table).map(_.gen).getOrElse(0L)
    require(toGen <= cur,
      s"table $table: generation $toGen is in the future (current $cur)")
    def filesOf(gen: Long): Seq[String] =
      if (gen == cur) committedFiles(table, fsOf(hpath(table)))
      else readSnap(table, gen).getOrElse(
        throw new IllegalArgumentException(
          s"table $table: generation $gen is not retained — " +
            "retention off, vacuumed, or never committed"))
    val empty = read(table).limit(0)
      .withColumn("__change_type", lit("insert"))
    if (fromGen == toGen) return empty
    val from = filesOf(fromGen).toSet
    val to = filesOf(toGen).toSet
    val added = (to -- from).toSeq.sorted
    val removed = (from -- to).toSeq.sorted
    def rowsOf(rels: Seq[String], gen: Long): DataFrame =
      if (rels.isEmpty) read(table).limit(0)
      else readFilesResolved(table, rels, gen, cur)
    val ins = rowsOf(added, toGen)
    val del = rowsOf(removed, fromGen)
    ins.exceptAll(del).withColumn("__change_type", lit("insert"))
      .unionByName(
        del.exceptAll(ins).withColumn("__change_type", lit("delete")))
  }
}

object TableStore {

  /** Sidecar paths that already logged a read-degrade warning — keeps
    * [[TableStore.readStatsSidecar]]'s failure path observable without
    * flooding the log once per read.
    */
  private[sources] val sidecarWarned =
    java.util.concurrent.ConcurrentHashMap.newKeySet[String]()

  /** What [[TableStore.merge]] does to a matched row. */
  sealed trait MergeAction
  /** Overwrite the listed columns with the SOURCE row's values. */
  final case class MergeUpdate(cols: Seq[String]) extends MergeAction
  /** Remove matched rows. */
  case object MergeDelete extends MergeAction

  /** [[TableStore.aggWhere]]'s result: exact matching-row count,
    * exact column total (0 for no rows), and min/max over non-null
    * values (None when every matching value is NULL or no row
    * matches). All values are decimals at the column's own scale.
    */
  final case class AggWhere(count: Long, sum: java.math.BigDecimal,
                            min: Option[java.math.BigDecimal],
                            max: Option[java.math.BigDecimal])

  private[sources] def minOpt(a: Option[java.math.BigDecimal],
                              b: Option[java.math.BigDecimal])
      : Option[java.math.BigDecimal] = (a, b) match {
    case (Some(x), Some(y)) => Some(x.min(y))
    case _                  => a.orElse(b)
  }

  private[sources] def maxOpt(a: Option[java.math.BigDecimal],
                              b: Option[java.math.BigDecimal])
      : Option[java.math.BigDecimal] = (a, b) match {
    case (Some(x), Some(y)) => Some(x.max(y))
    case _                  => a.orElse(b)
  }

  /** RDD-backed snapshot of a frame that must survive a mutation of the
    * very table files it reads (K7/K8 flag-flip/delete rewrites). The
    * `LogicalRDD` is opaque to the write path's recache-by-path — the
    * plan is never re-executed against replaced files — and pins the
    * scan to the file splits planned here. Unlike `localCheckpoint`,
    * whose blocks die with their executors and can never be rebuilt,
    * lineage stays recomputable from the pre-mutation files for the
    * whole write phase (every rewrite is write-then-swap, so the old
    * files outlive the job that reads them).
    *
    * The frame comes back `persist()`ed but lazily materialized: run
    * the durable WRITE first (its job fills the cache while the old
    * files are still live), then the rewrite. A snapshot consumed only
    * inside the calling method is released in `finally`
    * ([[TableStore.dedupAppend]]); one returned to the caller IS the
    * release handle — `unpersist()` it when consumed.
    */
  def snapshot(df: DataFrame): DataFrame = {
    val s = df.sparkSession.createDataFrame(df.rdd, df.schema)
    s.persist()
    s
  }

  /** [[snapshot]] + eager materialization: the returned frame is fully
    * computed and pinned before control returns, so a caller can drop
    * its upstream's cache immediately (the double-pass operators'
    * `persistUpstream` contract). Releases the snapshot pin if the
    * materialization itself fails — no orphaned cache on error.
    */
  def eagerSnapshot(df: DataFrame): DataFrame = {
    val s = snapshot(df)
    try { s.count(); s }
    catch {
      case t: Throwable => s.unpersist(blocking = false); throw t
    }
  }
}
