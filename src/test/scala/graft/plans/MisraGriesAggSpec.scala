package graft.plans

import graft.SparkSpec
import graft.operators.Profile
import org.apache.spark.sql.functions._

class MisraGriesAggSpec extends SparkSpec {
  import spark.implicits._

  // Zipf-ish corpus with a known heavy tail: item i appears ~N/i times.
  private def zipf(n: Int): Seq[String] =
    (1 to 40).flatMap(i => Seq.fill(n / i)(s"tok$i"))

  test("sketch retains every phi-heavy item across partition merges") {
    val data = new scala.util.Random(7).shuffle(zipf(2000))
    val df = data.toDF("item").repartition(13) // forces partial merges
    val k = 20
    val row = df.agg(
      call_function("graft_mg", $"item", lit(k)).as("s"),
      count($"item").as("n")).head()
    val n = row.getLong(1)
    val kept = row.getSeq[org.apache.spark.sql.Row](0)
      .map(r => r.getString(0) -> r.getLong(1)).toMap
    assert(kept.size <= k)
    val exact = data.groupBy(identity).view.mapValues(_.size.toLong).toMap
    // MG guarantee: count > n/(k+1) => retained, counter >= count - n/(k+1)
    val bound = n.toDouble / (k + 1)
    exact.foreach { case (item, c) =>
      if (c > bound) {
        assert(kept.contains(item), s"$item (count $c > $bound) dropped")
        assert(kept(item) <= c, s"$item counter ${kept(item)} above true $c")
        assert(kept(item) >= c - bound,
          s"$item counter ${kept(item)} below ${c - bound}")
      }
    }
  }

  test("heavyHitters == exact groupBy/having, counts exact, k stressed") {
    val data = new scala.util.Random(11).shuffle(zipf(3000))
    val df = data.toDF("item").repartition(7)
    val phi = 0.05 // k = 40 counters vs 40 distinct items, partial sketches collide
    val got = Profile.heavyHitters(df, "item", phi)
      .orderBy($"cnt".desc, $"item").as[(String, Long)].collect().toSeq
    val n = data.size
    val threshold = math.ceil(phi * n).toLong
    val want = data.groupBy(identity).view
      .mapValues(_.size.toLong).toSeq
      .filter(_._2 >= threshold)
      .sortBy { case (item, c) => (-c, item) }
    assert(got == want)
  }

  test("null and empty inputs") {
    val df = Seq[Option[String]](None, None).toDF("item")
    assert(Profile.heavyHitters(df, "item", 0.5).collect().isEmpty)
    val empty = Seq.empty[String].toDF("item")
    assert(Profile.heavyHitters(empty, "item", 0.5).collect().isEmpty)
  }

  test("non-string items implicitly cast to their string form") {
    val df = (1 to 30).map(i => i % 3).toDF("item")
    val s = df.agg(call_function("graft_mg", $"item", lit(5)).as("s"))
      .head().getSeq[org.apache.spark.sql.Row](0)
      .map(r => (r.getString(0), r.getLong(1))).toMap
    assert(s == Map("0" -> 10L, "1" -> 10L, "2" -> 10L))
  }

  test("sketch output is deterministically ordered (lb desc, item asc)") {
    val df = (1 to 100).map(i => s"t${i % 5}").toDF("item")
    val s = df.agg(call_function("graft_mg", $"item", lit(10)).as("s"))
      .head().getSeq[org.apache.spark.sql.Row](0)
      .map(r => (r.getString(0), r.getLong(1)))
    assert(s == s.sortBy { case (item, lb) => (-lb, item) })
  }
}
