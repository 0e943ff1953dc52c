package graft.plans

import org.apache.spark.sql.catalyst.InternalRow
import org.apache.spark.sql.catalyst.analysis.TypeCheckResult
import org.apache.spark.sql.catalyst.expressions.{BinaryExpression, Expression, TernaryExpression}
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
  private val patLen: Array[Int] = patterns.map(_.length)

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

  /** EVERY match occurrence over `text` as (id, start, end) rows,
    * sorted by (start, end, id). Offsets are UTF-16 char units
    * (`String.charAt` indexing — what JVM-side redaction via
    * `String.substring` consumes), `end` exclusive; on BMP-only /
    * ASCII text they coincide with code-point offsets. Overlapping and
    * nested matches are all emitted ("art" ⊂ "part" yields both) —
    * span-merge policy belongs to the caller (a redactor unions
    * overlapping spans; a policy filter may want each id's evidence).
    */
  def matchedSpans(text: UTF8String): ArrayData = {
    val s = text.toString
    val acc = scala.collection.mutable.ArrayBuffer.empty[(Int, Int, Int)]
    var state = 0
    var i = 0
    while (i < s.length) {
      state = step(state, s.charAt(i))
      val out = outsArr(state)
      var j = 0
      while (j < out.length) {
        val id = out(j)
        acc += ((i + 1 - patLen(id), i + 1, id))
        j += 1
      }
      i += 1
    }
    val sorted = acc.sortBy(identity)
    val rows = new Array[Any](sorted.length)
    var k = 0
    while (k < sorted.length) {
      val (st, en, id) = sorted(k)
      rows(k) = InternalRow(id, st, en)
      k += 1
    }
    new GenericArrayData(rows)
  }

  /** Redact every pattern occurrence from `text`: the UNION of all
    * match intervals is taken (overlapping/nested matches — "art" ⊂
    * "part" — merge into one maximal interval; adjacent intervals
    * merge too, so two abutting blocked terms leave one marker, never
    * a marker-pair that re-reads as content), and each maximal merged
    * interval is replaced by `replacement`. Same single automaton
    * pass as [[matchedSpans]] plus one output build.
    */
  def redact(text: UTF8String, replacement: UTF8String): UTF8String = {
    val s = text.toString
    // collect (start, end) sorted by start (scan order is by END; a
    // longer pattern can end later but start earlier, so sort)
    val iv = scala.collection.mutable.ArrayBuffer.empty[(Int, Int)]
    var state = 0
    var i = 0
    while (i < s.length) {
      state = step(state, s.charAt(i))
      val out = outsArr(state)
      var j = 0
      while (j < out.length) {
        iv += ((i + 1 - patLen(out(j)), i + 1))
        j += 1
      }
      i += 1
    }
    if (iv.isEmpty) return text
    val sorted = iv.sortBy(identity)
    val rep = replacement.toString
    val sb = new java.lang.StringBuilder(s.length)
    var pos = 0
    var curS = sorted(0)._1
    var curE = sorted(0)._2
    var k = 1
    def flush(): Unit = {
      sb.append(s, pos, curS).append(rep)
      pos = curE
    }
    while (k < sorted.length) {
      val (st, en) = sorted(k)
      if (st <= curE) { if (en > curE) curE = en } // overlap/adjacent
      else { flush(); curS = st; curE = en }
      k += 1
    }
    flush()
    sb.append(s, pos, s.length)
    UTF8String.fromString(sb.toString)
  }
}

/** Shared shape of the two Aho–Corasick expressions: left = text
  * column, right = foldable `array<string>` pattern literal (both
  * analyzed/type-checked as real children, so a wrong-typed pattern
  * argument fails analysis — not a runtime ClassCastException — and
  * the patterns participate in plan toString/canonicalization). The
  * automaton compiles once per expression at plan time and rides into
  * generated code as a reference object.
  */
trait AcExpression extends BinaryExpression {
  def textExpr: Expression
  def patternsExpr: Expression
  override def left: Expression = textExpr
  override def right: Expression = patternsExpr

  override def checkInputDataTypes(): TypeCheckResult = {
    if (textExpr.dataType != StringType)
      TypeCheckResult.TypeCheckFailure(
        s"$prettyName: text must be STRING, got ${textExpr.dataType.sql}")
    else if (!patternsExpr.dataType.isInstanceOf[ArrayType] ||
      patternsExpr.dataType.asInstanceOf[ArrayType].elementType != StringType)
      TypeCheckResult.TypeCheckFailure(
        s"$prettyName: patterns must be ARRAY<STRING>, got " +
          patternsExpr.dataType.sql)
    else if (!patternsExpr.foldable)
      TypeCheckResult.TypeCheckFailure(
        s"$prettyName: the pattern list must be a literal (foldable) — " +
          "the automaton is compiled once at plan time")
    else TypeCheckResult.TypeCheckSuccess
  }

  @transient protected lazy val automaton: AcAutomaton = {
    val arr = patternsExpr.eval(null).asInstanceOf[ArrayData]
    require(arr != null, s"$prettyName: NULL pattern list")
    new AcAutomaton(Array.tabulate(arr.numElements())(i =>
      arr.getUTF8String(i).toString))
  }
}

/** `graft_ac_match(text, patterns)` → array<int> of DISTINCT matched
  * pattern indexes (ascending) — the which-terms-occur screen shape.
  */
case class AcMatchExpr(textExpr: Expression, patternsExpr: Expression)
    extends AcExpression {
  override def dataType: DataType = ArrayType(IntegerType, containsNull = false)
  override def prettyName: String = "graft_ac_match"

  override def nullSafeEval(text: Any, pats: Any): Any =
    automaton.matchedIds(text.asInstanceOf[UTF8String])

  override protected def doGenCode(ctx: CodegenContext,
                                   ev: ExprCode): ExprCode = {
    val ac = ctx.addReferenceObj("acAutomaton", automaton,
      classOf[AcAutomaton].getName)
    defineCodeGen(ctx, ev, (c, _) => s"$ac.matchedIds($c)")
  }

  override protected def withNewChildrenInternal(
      newLeft: Expression, newRight: Expression): AcMatchExpr =
    copy(textExpr = newLeft, patternsExpr = newRight)
}

/** `graft_ac_spans(text, patterns)` →
  * `array<struct<id:int,start:int,end:int>>` of EVERY match occurrence
  * sorted by (start, end, id) — the redaction / span-policy shape (see
  * [[AcAutomaton.matchedSpans]] for the offset and overlap contract).
  */
case class AcSpansExpr(textExpr: Expression, patternsExpr: Expression)
    extends AcExpression {
  override def dataType: DataType = ArrayType(StructType(Seq(
    StructField("id", IntegerType, nullable = false),
    StructField("start", IntegerType, nullable = false),
    StructField("end", IntegerType, nullable = false))),
    containsNull = false)
  override def prettyName: String = "graft_ac_spans"

  override def nullSafeEval(text: Any, pats: Any): Any =
    automaton.matchedSpans(text.asInstanceOf[UTF8String])

  override protected def doGenCode(ctx: CodegenContext,
                                   ev: ExprCode): ExprCode = {
    val ac = ctx.addReferenceObj("acAutomaton", automaton,
      classOf[AcAutomaton].getName)
    defineCodeGen(ctx, ev, (c, _) => s"$ac.matchedSpans($c)")
  }

  override protected def withNewChildrenInternal(
      newLeft: Expression, newRight: Expression): AcSpansExpr =
    copy(textExpr = newLeft, patternsExpr = newRight)
}

/** `graft_ac_redact(text, patterns, replacement)` → text with the
  * UNION of all pattern-match intervals replaced by `replacement`
  * (see [[AcAutomaton.redact]] for the merge contract) — the
  * multi-term redaction path for policy screens: one automaton pass
  * instead of K sequential `regexp_replace` rewrites, and
  * union-of-intervals semantics instead of K order-dependent
  * leftmost-first rewrites. `patterns` and `replacement` must be
  * foldable; the automaton compiles once at plan time.
  */
case class AcRedactExpr(textExpr: Expression, patternsExpr: Expression,
                        replacementExpr: Expression)
    extends TernaryExpression {
  override def first: Expression = textExpr
  override def second: Expression = patternsExpr
  override def third: Expression = replacementExpr
  override def dataType: DataType = StringType
  override def prettyName: String = "graft_ac_redact"

  override def checkInputDataTypes(): TypeCheckResult = {
    if (textExpr.dataType != StringType)
      TypeCheckResult.TypeCheckFailure(
        s"$prettyName: text must be STRING, got ${textExpr.dataType.sql}")
    else if (!patternsExpr.dataType.isInstanceOf[ArrayType] ||
      patternsExpr.dataType.asInstanceOf[ArrayType].elementType != StringType)
      TypeCheckResult.TypeCheckFailure(
        s"$prettyName: patterns must be ARRAY<STRING>, got " +
          patternsExpr.dataType.sql)
    else if (!patternsExpr.foldable)
      TypeCheckResult.TypeCheckFailure(
        s"$prettyName: the pattern list must be a literal (foldable)")
    else if (replacementExpr.dataType != StringType ||
      !replacementExpr.foldable)
      TypeCheckResult.TypeCheckFailure(
        s"$prettyName: replacement must be a STRING literal")
    else TypeCheckResult.TypeCheckSuccess
  }

  @transient private lazy val automaton: AcAutomaton = {
    val arr = patternsExpr.eval(null).asInstanceOf[ArrayData]
    require(arr != null, s"$prettyName: NULL pattern list")
    new AcAutomaton(Array.tabulate(arr.numElements())(i =>
      arr.getUTF8String(i).toString))
  }

  override def nullSafeEval(text: Any, pats: Any, rep: Any): Any =
    automaton.redact(text.asInstanceOf[UTF8String],
      rep.asInstanceOf[UTF8String])

  override protected def doGenCode(ctx: CodegenContext,
                                   ev: ExprCode): ExprCode = {
    val ac = ctx.addReferenceObj("acAutomaton", automaton,
      classOf[AcAutomaton].getName)
    defineCodeGen(ctx, ev, (c, _, r) => s"$ac.redact($c, $r)")
  }

  override protected def withNewChildrenInternal(
      f: Expression, s: Expression, t: Expression): AcRedactExpr =
    copy(textExpr = f, patternsExpr = s, replacementExpr = t)
}
