package graft.sources

import graft.SparkSpec
import org.apache.spark.sql.functions._

class WarcSpec extends SparkSpec {
  import spark.implicits._

  private def rec(t: String, uri: String, payload: String) =
    Warc.WarcRecord(t, uri, "2026-01-01T00:00:00Z",
      payload.getBytes("UTF-8"))

  test("encode/decode round-trips multi-record blobs") {
    val recs = Seq(
      rec("response", "http://a", "<html>hello</html>"),
      rec("metadata", "http://a/meta", "en"),
      rec("response", "http://b", "")) // zero-length payload is legal
    val back = Warc.decode(Warc.encode(recs))
    assert(back.map(_.warcType) == recs.map(_.warcType))
    assert(back.map(_.targetUri) == recs.map(_.targetUri))
    assert(back.map(_.payload.toSeq) == recs.map(_.payload.toSeq))
  }

  test("decode returns the complete prefix and stops at malformation") {
    val recs = Seq(rec("response", "http://a", "payload-one"),
      rec("response", "http://b", "payload-two"))
    val full = Warc.encode(recs)
    val r0len = Warc.encode(recs.take(1)).length
    // truncated inside the second record: first survives
    assert(Warc.decode(full.take(r0len + 10)).map(_.targetUri) ==
      Seq("http://a"))
    // truncated inside the first header: nothing survives
    assert(Warc.decode(full.take(15)).isEmpty)
    // payload shorter than Content-Length claims: record dropped
    val lying = Warc.encode(Seq(rec("response", "http://a", "xyz")))
    assert(Warc.decode(lying.dropRight(6)).isEmpty) // eats separator+payload tail
    // garbage and empty inputs
    assert(Warc.decode(Array.empty[Byte]).isEmpty)
    assert(Warc.decode("HTTP/1.1 200 OK\r\n\r\n".getBytes("UTF-8")).isEmpty)
    // CRLF bytes INSIDE a payload must not derail the walk
    val tricky = Seq(rec("response", "http://c", "a\r\n\r\nb"),
      rec("metadata", "http://c/meta", "ok"))
    assert(Warc.decode(Warc.encode(tricky)).map(_.targetUri) ==
      Seq("http://c", "http://c/meta"))
  }

  test("records operator: one row per record, NULL blob contributes none") {
    val blob = Warc.encode(Seq(rec("response", "http://a", "hello"),
      rec("metadata", "http://a/meta", "en")))
    val df = Seq((1L, Option(blob)), (2L, Option.empty[Array[Byte]]))
      .toDF("doc_id", "payload")
    val out = Warc.records(df, "doc_id", "payload")
      .orderBy($"doc_id", $"rec_idx").collect()
    assert(out.length == 2)
    assert(out(0).getAs[String]("payload_text") == "hello" &&
      out(0).getAs[Long]("content_length") == 5L)
    assert(out(1).getAs[String]("warc_type") == "metadata")
  }
}
