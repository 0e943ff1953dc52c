package graft.plans

import java.io.{ByteArrayInputStream, ByteArrayOutputStream, DataInputStream, DataOutputStream}
import java.nio.charset.StandardCharsets

import scala.collection.mutable

import org.apache.spark.sql.catalyst.InternalRow
import org.apache.spark.sql.catalyst.expressions.{Expression, GenericInternalRow, ImplicitCastInputTypes, Literal}
import org.apache.spark.sql.catalyst.expressions.aggregate.TypedImperativeAggregate
import org.apache.spark.sql.catalyst.util.GenericArrayData
import org.apache.spark.sql.types._
import org.apache.spark.unsafe.types.UTF8String

/** Misra–Gries heavy-hitters sketch as a mergeable typed aggregate:
  * at most `k` (item, counter) pairs per partial, merged with the
  * Agarwal et al. "Mergeable Summaries" (PODS'12) reduction — sum
  * counters, keep the k largest, subtract the (k+1)-th largest from
  * each survivor. Guarantees after any merge tree: every item with
  * true count > n/(k+1) retains a positive counter, and each counter
  * lower-bounds the true count by at most n/(k+1).
  *
  * Scale story (the reason this exists next to the exact q59 top-k):
  * a full `groupBy(token)` exchanges the ENTIRE vocabulary — at
  * 100 TB that shuffle is the job. This aggregate moves exactly k
  * counters per map partial through one final merge, so finding the
  * φ-heavy hitters costs a single narrow scan; an exact recount of
  * the ≤ k surviving candidates (broadcast semi-join, ≤ k distinct
  * keys) then removes all approximation from the reported counts —
  * [[graft.operators.Profile.heavyHitters]] wires the two stages.
  *
  * Output: array<struct<item string, lb bigint>> sorted by
  * (lb desc, item asc) — `lb` is the surviving counter (a lower
  * bound, NOT an exact count). Null items are ignored; an all-null
  * or empty input yields an empty array.
  *
  * No reference counterpart (the reference profiles exact pandas
  * value_counts on one node); this is the distributed-sketch
  * generalization, same family as [[graft.operators.Sketches]] KMV.
  */
case class MisraGriesAgg(
    child: Expression,
    k: Int,
    mutableAggBufferOffset: Int = 0,
    inputAggBufferOffset: Int = 0)
    extends TypedImperativeAggregate[mutable.HashMap[String, Long]]
    with ImplicitCastInputTypes {

  require(k >= 1, s"k must be >= 1, got $k")

  override def children: Seq[Expression] = Seq(child)
  // non-string items (ints, …) implicitly cast to their string form,
  // and an uncastable child fails analysis instead of throwing a
  // ClassCastException mid-job
  override def inputTypes: Seq[DataType] = Seq(StringType)
  override def nullable: Boolean = false
  override def dataType: DataType = ArrayType(
    StructType(Seq(
      StructField("item", StringType, nullable = false),
      StructField("lb", LongType, nullable = false))),
    containsNull = false)
  override def prettyName: String = "graft_mg"

  override def createAggregationBuffer(): mutable.HashMap[String, Long] =
    mutable.HashMap.empty[String, Long]

  override def update(buf: mutable.HashMap[String, Long],
                      input: InternalRow): mutable.HashMap[String, Long] = {
    val v = child.eval(input)
    if (v == null) return buf
    val item = v.asInstanceOf[UTF8String].toString
    buf.get(item) match {
      case Some(c) => buf.update(item, c + 1)
      case None if buf.size < k => buf.update(item, 1L)
      case None =>
        // classic MG step: no free counter — decrement all, drop zeros.
        // O(k) here, but each decrement cancels a previous increment,
        // so the total work over n updates is O(n) amortized.
        val dead = mutable.ArrayBuffer.empty[String]
        buf.foreachEntry { (key, c) =>
          if (c == 1L) dead += key else buf.update(key, c - 1)
        }
        dead.foreach(buf.remove)
    }
    buf
  }

  override def merge(buf: mutable.HashMap[String, Long],
                     other: mutable.HashMap[String, Long])
      : mutable.HashMap[String, Long] = {
    other.foreachEntry { (key, c) =>
      buf.update(key, buf.getOrElse(key, 0L) + c)
    }
    if (buf.size > k) {
      // mergeable-summaries reduction: subtract the (k+1)-th largest
      // counter from every entry; at most k survive.
      val counts = buf.values.toArray
      java.util.Arrays.sort(counts)
      val cut = counts(counts.length - k - 1)
      val dead = mutable.ArrayBuffer.empty[String]
      buf.foreachEntry { (key, c) =>
        if (c <= cut) dead += key else buf.update(key, c - cut)
      }
      dead.foreach(buf.remove)
    }
    buf
  }

  override def eval(buf: mutable.HashMap[String, Long]): Any = {
    val sorted = buf.toArray.sortBy { case (item, lb) => (-lb, item) }
    new GenericArrayData(sorted.map { case (item, lb) =>
      new GenericInternalRow(
        Array[Any](UTF8String.fromString(item), lb))
    })
  }

  override def serialize(buf: mutable.HashMap[String, Long]): Array[Byte] = {
    val bos = new ByteArrayOutputStream()
    val out = new DataOutputStream(bos)
    out.writeInt(buf.size)
    buf.foreachEntry { (key, c) =>
      val b = key.getBytes(StandardCharsets.UTF_8)
      out.writeInt(b.length)
      out.write(b)
      out.writeLong(c)
    }
    out.flush()
    bos.toByteArray
  }

  override def deserialize(bytes: Array[Byte]): mutable.HashMap[String, Long] = {
    val in = new DataInputStream(new ByteArrayInputStream(bytes))
    val n = in.readInt()
    val buf = mutable.HashMap.empty[String, Long]
    var i = 0
    while (i < n) {
      val len = in.readInt()
      val b = new Array[Byte](len)
      in.readFully(b)
      buf.update(new String(b, StandardCharsets.UTF_8), in.readLong())
      i += 1
    }
    buf
  }

  override def withNewMutableAggBufferOffset(newOffset: Int): MisraGriesAgg =
    copy(mutableAggBufferOffset = newOffset)
  override def withNewInputAggBufferOffset(newOffset: Int): MisraGriesAgg =
    copy(inputAggBufferOffset = newOffset)
  override protected def withNewChildrenInternal(
      newChildren: IndexedSeq[Expression]): MisraGriesAgg =
    copy(child = newChildren.head)
}

object MisraGriesAgg {
  /** Build from `call_function` args: (item, k) with k a foldable int. */
  def fromArgs(args: Seq[Expression]): MisraGriesAgg = {
    require(args.length == 2, "graft_mg(item, k)")
    val k = args(1) match {
      case Literal(v: Int, IntegerType) => v
      case other => throw new IllegalArgumentException(
        s"graft_mg k must be an int literal, got $other")
    }
    MisraGriesAgg(args.head, k)
  }
}
