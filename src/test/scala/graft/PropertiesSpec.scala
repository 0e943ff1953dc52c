package graft

import org.scalatest.funsuite.AnyFunSuite
import org.scalacheck.Gen
import org.apache.spark.sql.functions._
import graft.functions.{GeoFunctions, TextFunctions}
import graft.operators.Chunker

/** Property-based checks (SURVEY.md §5.4): totality of lenient casts,
  * chunker coverage/stride laws, grid-cell round-trip. Driven through
  * Spark on generated batches (one pass per property, not per case, to
  * keep the suite fast).
  */
class PropertiesSpec extends AnyFunSuite with SparkSpec {
  import spark.implicits._

  test("safeCast is total on arbitrary strings and preserves parseable ints") {
    val strs = Gen.listOfN(150, Gen.alphaNumStr).sample.getOrElse(Nil) ++
      Seq("", "  42  ", "-0", "9999999999999999999999", "123", "-456",
        "12.5", "0xff", "NaN", "+7", " -8 ", "1e3")
    val out = strs.toDF("s")
      .select($"s", TextFunctions.safeCast($"s", "int", lit(-1)).as("v"))
      .as[(String, Int)].collect()
    assert(out.length == strs.length) // no exceptions = total
    out.foreach { case (s, v) =>
      scala.util.Try(s.trim.toInt).toOption match {
        case Some(i) => assert(v == i, s"'$s'")
        case None => assert(v == -1, s"'$s'")
      }
    }
  }

  test("chunker: every element covered, sizes <= n, full chunks exactly n, stride respected") {
    for ((rows, n, ov0) <- Seq((1, 2, 0), (5, 5, 4), (10, 5, 2), (37, 7, 3),
      (60, 8, 6), (9, 3, 0), (13, 4, 1), (2, 2, 1), (30, 6, 5))) {
      val ov = math.min(ov0, n - 1)
      val stride = n - ov
      val df = (1 to rows).map(i => ("d", i, s"t$i")).toDF("doc", "ts", "tx")
      val chunks = Chunker.slidingChunks(df, "doc", Seq("ts"), "tx", n, ov)
        .select($"chunk_id", $"n_items", $"text")
        .as[(Long, Long, String)].collect().sortBy(_._1)
      // coverage: every element appears in some chunk
      val seen = chunks.flatMap(_._3.split(" ")).toSet
      assert(seen == (1 to rows).map(i => s"t$i").toSet)
      // sizes
      chunks.foreach { case (k, ni, text) =>
        assert(ni <= n && text.split(" ").length == ni)
        // chunk k holds rows (k*stride, k*stride + n]
        val expected = ((k * stride + 1) to math.min(k * stride + n, rows))
        assert(text == expected.map(i => s"t$i").mkString(" "))
      }
      // chunk ids are exactly 0..floor((rows-1)/stride)
      assert(chunks.map(_._1).toSeq == (0L to ((rows - 1) / stride)).toSeq)
    }
  }

  test("grid cell id round-trips: cell bounds contain the point") {
    val pts = Gen.listOfN(300,
      Gen.zip(Gen.chooseNum(-1000.0, 1000.0), Gen.chooseNum(-1000.0, 1000.0)))
      .sample.get
    val cell = 37.5; val minX = -1000.0; val minY = -1000.0; val nx = 100L
    val out = pts.toDF("x", "y")
      .select($"x", $"y",
        GeoFunctions.gridCellId($"x", $"y", minX, minY, cell, nx).as("c"))
      .as[(Double, Double, Long)].collect()
    out.foreach { case (x, y, c) =>
      val cx = c % nx; val cy = c / nx
      assert(x >= minX + cx * cell && x < minX + (cx + 1) * cell)
      assert(y >= minY + cy * cell && y < minY + (cy + 1) * cell)
    }
  }

  test("asof join == naive model on random collision-heavy data") {
    val rnd = new scala.util.Random(42)
    val keys = Seq("a", "b", "c")
    // small ts domain forces equal-ts ties and unmatched probes
    val probes = (1 to 120).map(i =>
      (i.toLong, keys(rnd.nextInt(3)), rnd.nextInt(40).toLong))
    val refs = (1 to 80).map(i =>
      (keys(rnd.nextInt(3)), rnd.nextInt(40).toLong, 1000L + i, rnd.nextDouble()))
    val pDf = probes.toDF("id", "k", "ts")
    val rDf = refs.toDF("k", "ts", "rid", "px")
    def naive(forward: Boolean): Map[Long, Option[Long]] =
      probes.map { case (id, k, ts) =>
        val c = refs.filter(r => r._1 == k &&
          (if (forward) r._2 >= ts else r._2 <= ts))
        // closest ts wins; equal-ts ties -> largest rid (both directions)
        val best = if (c.isEmpty) None else {
          val bestTs = if (forward) c.map(_._2).min else c.map(_._2).max
          Some(c.filter(_._2 == bestTs).map(_._3).max)
        }
        id -> best
      }.toMap
    for (fwd <- Seq(false, true)) {
      val got = (if (fwd)
        graft.operators.AsofJoin.forward(pDf, rDf, Seq("k"), "ts", Seq("rid"), "rid")
      else
        graft.operators.AsofJoin.backward(pDf, rDf, Seq("k"), "ts", Seq("rid"), "rid"))
        .select($"id", $"r_rid").collect()
        .map(r => r.getLong(0) -> (if (r.isNullAt(1)) None else Some(r.getLong(1))))
        .toMap
      assert(got == naive(fwd), s"forward=$fwd")
    }
  }

  test("range join == naive nested loop for any cell width") {
    val rnd = new scala.util.Random(7)
    val pts = (1 to 100).map(i => (i.toLong, s"k${rnd.nextInt(2)}",
      rnd.nextInt(200).toLong - 100))
    val ivs = (1 to 60).map { i =>
      val lo = rnd.nextInt(200).toLong - 100
      (1000L + i, s"k${rnd.nextInt(2)}", lo, lo + rnd.nextInt(30))
    }
    val expected = (for {
      (pid, pk, p) <- pts; (iid, ik, lo, hi) <- ivs
      if pk == ik && p >= lo && p <= hi
    } yield (pid, iid)).toSet
    for (w <- Seq(1L, 13L, 30L, 500L)) {
      val got = graft.operators.RangeJoin.pointInInterval(
        pts.toDF("pid", "k", "p"), ivs.toDF("iid", "k", "lo", "hi"),
        "p", "lo", "hi", w, Seq("k"))
        .select($"pid", $"iid").as[(Long, Long)].collect().toSet
      assert(got == expected, s"cellWidth=$w")
    }
  }

  test("sessionize == naive fold for random gaps") {
    val rnd = new scala.util.Random(13)
    val evs = (1 to 200).map(i =>
      (i.toLong, s"u${rnd.nextInt(4)}", rnd.nextInt(500).toLong))
    val gap = 20L
    val naive: Map[Long, Long] = evs.groupBy(_._2).flatMap { case (_, es) =>
      val sorted = es.sortBy(e => (e._3, e._1))
      var ord = 0L; var prev = Long.MinValue
      sorted.map { case (id, _, ts) =>
        if (prev == Long.MinValue || ts - prev > gap) ord += 1
        prev = ts
        id -> ord
      }
    }
    val got = graft.operators.Sessionize
      .assign(evs.toDF("id", "u", "ts"), "u", "ts", gap, tieCol = "id")
      .select($"id", $"session_ord").as[(Long, Long)].collect().toMap
    assert(got == naive)
  }

  test("fingerprint: normalization-equivalent strings collide, distinct tokens don't") {
    for (s <- Seq("abc", "Hello1", "ZZtop99", "q", "MixedCase42")) {
      val df = Seq(s, s.toUpperCase, s + "!", s + " x").toDF("t")
        .select(TextFunctions.fingerprint($"t").as("f")).as[String].collect()
      assert(df(0) == df(1) && df(0) == df(2)) // case/punct-invariant
      assert(df(0) != df(3)) // extra token changes it
    }
  }

  test("container parsers are total on arbitrary bytes (fuzz, never throw)") {
    import graft.operators.Multimodal
    import graft.sources.Warc
    val rnd = new scala.util.Random(20260814L)
    // random garbage at many lengths, plus valid blobs mutated at a
    // random position, plus all truncation prefixes of valid blobs —
    // the states a corrupt object store actually produces
    val valid = Seq(
      Multimodal.ImageBytes.png(33, 44),
      Multimodal.ImageBytes.jpeg(100, 50),
      Multimodal.ImageBytes.gif(9, 9),
      Multimodal.ImageBytes.bmp(7, 8),
      Multimodal.AudioBytes.wav(2, 22050, 16, 100L),
      Multimodal.VideoBytes.mp4(600, 1234L),
      Warc.encode(Seq(Warc.WarcRecord("response", "http://x",
        "2026-01-01T00:00:00Z", "abc".getBytes("UTF-8")))))
    val fuzz: Seq[Array[Byte]] =
      (0 until 300).map(_ => Array.fill(rnd.nextInt(200))(rnd.nextInt(256).toByte)) ++
      valid.flatMap { v =>
        (0 until 50).map { _ =>
          val m = v.clone()
          m(rnd.nextInt(m.length)) = rnd.nextInt(256).toByte
          m
        }
      } ++
      valid.flatMap(v => (0 to v.length).map(v.take))
    fuzz.foreach { b =>
      // totality is the assertion: any throw fails the test
      Multimodal.parseImageHeader(b)
      Multimodal.parseWavHeader(b)
      Multimodal.parseMp4Header(b)
      Warc.decode(b)
    }
  }
}
