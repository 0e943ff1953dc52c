package graft.plans

import org.apache.spark.sql.catalyst.expressions.{Expression, UnaryExpression}
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.catalyst.util.{ArrayData, GenericArrayData}
import org.apache.spark.sql.types._
import org.apache.spark.unsafe.types.UTF8String

/** Aho–Corasick multi-pattern matching (Aho & Corasick 1975, "Efficient
  * string matching: an aid to bibliographic search") — the blocklist
  * kernel behind C4-style badword filtering and policy-term screens:
  * ONE linear pass over each document finds which of K patterns occur,
  * instead of K `contains()` scans. At 100 TB with a realistic
  * blocklist (hundreds-to-thousands of phrases) the K-scan form is a
  * K× read amplification of the hottest loop in the corpus-clean
  * stage; the automaton is O(Σ|text| + matches) regardless of K.
  *
  * The automaton (goto/fail/output tables over a dense node list) is
  * built ONCE per expression from the foldable pattern-array argument
  * and rides into generated code as a reference object — the match
  * loop itself stays inside whole-stage codegen.
  */
final class AcAutomaton(val patterns: Array[String]) extends Serializable {
  require(patterns.nonEmpty, "AhoCorasick: empty pattern list")
  patterns.foreach(p => require(p != null && p.nonEmpty,
    "AhoCorasick: patterns must be non-empty and non-null"))

  // dense trie: per-node char→next map, fail link, matched pattern ids
  private val next = scala.collection.mutable.ArrayBuffer(
    scala.collection.mutable.HashMap.empty[Char, Int])
  private val outs = scala.collection.mutable.ArrayBuffer(List.empty[Int])
  private val fail = scala.collection.mutable.ArrayBuffer(0)

  patterns.zipWithIndex.foreach { case (p, id) =>
    var s = 0
    p.foreach { ch =>
      s = next(s).getOrElseUpdate(ch, {
        next += scala.collection.mutable.HashMap.empty[Char, Int]
        outs += Nil
        fail += 0
        next.size - 1
      })
    }
    outs(s) = id :: outs(s)
  }
  // BFS fail links; output sets inherit through the fail chain so a
  // pattern that is a suffix of another is reported at the same node
  locally {
    val q = scala.collection.mutable.Queue.empty[Int]
    next(0).valuesIterator.foreach { v => fail(v) = 0; q += v }
    while (q.nonEmpty) {
      val u = q.dequeue()
      next(u).foreach { case (ch, v) =>
        var f = fail(u)
        while (f != 0 && !next(f).contains(ch)) f = fail(f)
        fail(v) = if (next(f).contains(ch) && next(f)(ch) != v)
          next(f)(ch) else 0
        outs(v) = outs(v) ++ outs(fail(v))
        q += v
      }
    }
  }
  // allocation-free match tables: per-node sorted char keys + values
  // (binary search beats boxed map lookups in the per-character loop)
  private val keysArr: Array[Array[Char]] =
    next.map(m => m.keys.toArray.sorted).toArray
  private val valsArr: Array[Array[Int]] =
    next.indices.map(i => keysArr(i).map(next(i))).toArray
  private val failArr: Array[Int] = fail.toArray
  private val outsArr: Array[Array[Int]] = outs.map(_.toArray).toArray

  private def step(state0: Int, ch: Char): Int = {
    var s = state0
    while (true) {
      val idx = java.util.Arrays.binarySearch(keysArr(s), ch)
      if (idx >= 0) return valsArr(s)(idx)
      if (s == 0) return 0
      s = failArr(s)
    }
    0 // unreachable
  }

  /** Distinct matched pattern ids over `text`, ascending. */
  def matchedIds(text: UTF8String): ArrayData = {
    val s = text.toString
    val seen = new Array[Boolean](patterns.length)
    var state = 0
    var i = 0
    while (i < s.length) {
      state = step(state, s.charAt(i))
      val out = outsArr(state)
      var j = 0
      while (j < out.length) { seen(out(j)) = true; j += 1 }
      i += 1
    }
    val ids = Array.newBuilder[Any]
    var k = 0
    while (k < seen.length) { if (seen(k)) ids += k; k += 1 }
    new GenericArrayData(ids.result())
  }
}

/** `graft_ac_match(text, patterns)` → array<int> of DISTINCT matched
  * pattern indexes (ascending). `patterns` must be a foldable
  * array<string> literal — the automaton is compiled once at plan
  * time, never per row.
  */
case class AcMatchExpr(child: Expression, patternsExpr: Expression)
    extends UnaryExpression {
  override def dataType: DataType = ArrayType(IntegerType, containsNull = false)
  override def nullable: Boolean = child.nullable
  override def prettyName: String = "graft_ac_match"

  require(patternsExpr.foldable,
    "graft_ac_match: the pattern list must be a literal (foldable) — " +
      "the automaton is compiled once at plan time")

  @transient private lazy val automaton: AcAutomaton = {
    val arr = patternsExpr.eval(null).asInstanceOf[ArrayData]
    require(arr != null, "graft_ac_match: NULL pattern list")
    new AcAutomaton(Array.tabulate(arr.numElements())(i =>
      arr.getUTF8String(i).toString))
  }

  override def nullSafeEval(input: Any): Any =
    automaton.matchedIds(input.asInstanceOf[UTF8String])

  override protected def doGenCode(ctx: CodegenContext,
                                   ev: ExprCode): ExprCode = {
    val ac = ctx.addReferenceObj("acAutomaton", automaton,
      classOf[AcAutomaton].getName)
    defineCodeGen(ctx, ev, c => s"$ac.matchedIds($c)")
  }

  override protected def withNewChildInternal(n: Expression): AcMatchExpr =
    copy(child = n)
}
