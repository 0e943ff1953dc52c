package graft.sources

import org.apache.spark.sql.catalyst.analysis.UnresolvedAttribute
import org.apache.spark.sql.catalyst.expressions._
import org.apache.spark.sql.types._
import java.math.{BigDecimal => JBigDecimal}

/** Per-file column statistics and the conservative file-skipping
  * evaluator behind [[TableStore.analyze]] / [[TableStore.readWhere]] —
  * the Delta/Iceberg data-skipping shape on the store's own manifest
  * machinery. At 100 TB the scan a predicate CAN'T skip is the whole
  * job: parquet row-group stats prune within a file the scheduler
  * already opened, but only FILE-level stats prune the listing itself —
  * tasks are never launched, footers never read, for files whose
  * [min,max] window provably excludes the predicate.
  *
  * Correctness stance: skipping is an OPTIMIZATION ONLY. The evaluator
  * answers "can any row of this file satisfy the predicate?" and must
  * err toward `true`; the caller re-applies the full predicate to the
  * surviving files, so a too-conservative evaluator costs I/O, never
  * rows. Every value comparison is EXACT (integers and decimals via
  * [[JBigDecimal]]; doubles via the exact binary expansion
  * `new JBigDecimal(double)` — never a lossy string round-trip), and
  * anything the evaluator does not understand — an expression shape, a
  * column with no stats, a NaN boundary — keeps the file.
  *
  * Stats values are serialized with full round-trip fidelity:
  * `java.lang.Double.toString` (shortest-repr round-trip), decimal
  * plain strings, percent-encoded UTF-8 strings; timestamps/dates are
  * projected to epoch micros / days BEFORE aggregation (monotonic, so
  * min/max commute with the projection).
  */
object FileStats {

  /** One column's file-level stats. `min`/`max` are None when every
    * value in the file is NULL. Values are normalized comparables:
    * `JBigDecimal` for every numeric/date/timestamp kind, `String` for
    * strings, `java.lang.Boolean` for booleans.
    */
  final case class ColStats(rows: Long, nulls: Long,
                            min: Option[Any], max: Option[Any])

  /** `rows` = file row count; `cols` = per-column stats for the
    * analyzed columns (absent column ⇒ no pruning on it).
    */
  final case class PerFile(rows: Long, cols: Map[String, ColStats])

  // ------------------------------------------------------- serialization

  private def enc(s: String): String = {
    val sb = new StringBuilder(s.length)
    s.foreach {
      case '%'  => sb.append("%25")
      case '\t' => sb.append("%09")
      case '\n' => sb.append("%0a")
      case c    => sb.append(c)
    }
    sb.toString
  }

  private def dec(s: String): String =
    s.replace("%0a", "\n").replace("%09", "\t").replace("%25", "%")

  private def encVal(v: Option[Any]): String = v match {
    case None               => "-"
    case Some(b: JBigDecimal) => "n:" + b.toString
    case Some(s: String)    => "s:" + enc(s)
    case Some(b: java.lang.Boolean) => "b:" + b.toString
    case Some(other) => throw new IllegalStateException(
      s"unexpected stat value ${other.getClass}")
  }

  private def decVal(s: String): Option[Any] =
    if (s == "-") None
    else if (s.startsWith("n:")) Some(new JBigDecimal(s.drop(2)))
    else if (s.startsWith("s:")) Some(dec(s.drop(2)))
    else if (s.startsWith("b:")) Some(java.lang.Boolean.valueOf(s.drop(2)))
    else throw new IllegalStateException(s"bad stat value encoding: $s")

  /** `file rel path → PerFile` as sidecar lines, one per (file, col):
    * `s=<rel>\t<col>\t<rows>\t<nulls>\t<min>\t<max>` plus a bare
    * `r=<rel>\t<rows>` row-count line per file.
    */
  def serialize(stats: Map[String, PerFile]): String = {
    val sb = new StringBuilder
    stats.toSeq.sortBy(_._1).foreach { case (rel, pf) =>
      sb.append(s"r=${enc(rel)}\t${pf.rows}\n")
      pf.cols.toSeq.sortBy(_._1).foreach { case (c, cs) =>
        sb.append(s"s=${enc(rel)}\t${enc(c)}\t${cs.rows}\t${cs.nulls}\t" +
          s"${encVal(cs.min)}\t${encVal(cs.max)}\n")
      }
    }
    sb.toString
  }

  def deserialize(txt: String): Map[String, PerFile] = {
    val rows = scala.collection.mutable.Map.empty[String, Long]
    val cols = scala.collection.mutable
      .Map.empty[String, Map[String, ColStats]]
    txt.split("\n").filter(_.nonEmpty).foreach { l =>
      if (l.startsWith("r=")) {
        val p = l.drop(2).split("\t")
        rows(dec(p(0))) = p(1).toLong
      } else if (l.startsWith("s=")) {
        val p = l.drop(2).split("\t", -1)
        val rel = dec(p(0))
        cols(rel) = cols.getOrElse(rel, Map.empty) +
          (dec(p(1)) -> ColStats(p(2).toLong, p(3).toLong,
            decVal(p(4)), decVal(p(5))))
      }
    }
    rows.map { case (rel, n) =>
      rel -> PerFile(n, cols.getOrElse(rel, Map.empty))
    }.toMap
  }

  // --------------------------------------------- literal normalization

  /** Exact comparable for a literal's Catalyst-internal value, aligned
    * with the normalization [[TableStore.analyze]] applies before
    * aggregation (timestamps → micros, dates → days). None ⇒ this
    * literal kind is outside the evaluator's domain (keep the file).
    */
  private def normLit(v: Any, t: DataType): Option[Any] = {
    if (v == null) return None // null literal comparisons never prune here
    t match {
      case ByteType    => Some(new JBigDecimal(v.asInstanceOf[Byte].toLong))
      case ShortType   => Some(new JBigDecimal(v.asInstanceOf[Short].toLong))
      case IntegerType => Some(new JBigDecimal(v.asInstanceOf[Int].toLong))
      case LongType    => Some(new JBigDecimal(v.asInstanceOf[Long]))
      case FloatType =>
        val f = v.asInstanceOf[Float]
        if (f.isNaN || f.isInfinite) None
        else Some(new JBigDecimal(f.toDouble))
      case DoubleType =>
        val d = v.asInstanceOf[Double]
        if (d.isNaN || d.isInfinite) None else Some(new JBigDecimal(d))
      case _: DecimalType =>
        Some(v.asInstanceOf[org.apache.spark.sql.types.Decimal]
          .toJavaBigDecimal)
      case StringType  => Some(v.toString) // UTF8String → String
      case BooleanType => Some(java.lang.Boolean.valueOf(
        v.asInstanceOf[Boolean]))
      case DateType    => Some(new JBigDecimal(v.asInstanceOf[Int].toLong))
      case TimestampType | TimestampNTZType =>
        Some(new JBigDecimal(v.asInstanceOf[Long]))
      case _ => None
    }
  }

  /** Exact total-order compare of two normalized comparables; None when
    * the kinds are incompatible (schema drift between stats and
    * predicate — keep the file).
    */
  private def cmp(a: Any, b: Any): Option[Int] = (a, b) match {
    case (x: JBigDecimal, y: JBigDecimal) => Some(x.compareTo(y))
    case (x: String, y: String)           => Some(x.compareTo(y))
    case (x: java.lang.Boolean, y: java.lang.Boolean) =>
      Some(x.compareTo(y))
    case _ => None
  }

  // ------------------------------------------------- pruning evaluator

  private def attrName(e: Expression): Option[String] = e match {
    case a: UnresolvedAttribute => Some(a.name)
    case a: AttributeReference  => Some(a.name)
    case _                      => None
  }

  private def litOf(e: Expression): Option[(Any, DataType)] = e match {
    case Literal(v, t) => Some((v, t))
    case _             => None
  }

  /** Can any row of a file with stats `pf` satisfy `pred`? `false` only
    * on proof of emptiness; every unknown shape answers `true`.
    */
  def mayMatch(pred: Expression, pf: PerFile): Boolean = {
    if (pf.rows == 0L) return false

    def stats(name: String): Option[ColStats] = pf.cols.get(name)

    /** range test: does [min,max] admit a value `op` lit? */
    def rangeKeep(name: String, litV: Any, litT: DataType,
                  keepIf: (Int, Int) => Boolean): Boolean =
      (stats(name), normLit(litV, litT)) match {
        case (Some(cs), Some(l)) =>
          if (cs.rows == cs.nulls) false // all null: no value compares
          else (cs.min, cs.max) match {
            case (Some(mn), Some(mx)) =>
              (cmp(mn, l), cmp(mx, l)) match {
                case (Some(cMin), Some(cMax)) => keepIf(cMin, cMax)
                case _                        => true
              }
            case _ => true
          }
        case _ => true
      }

    def eval(e: Expression): Boolean = e match {
      case And(a, b) => eval(a) && eval(b)
      case Or(a, b)  => eval(a) || eval(b)

      case EqualTo(a, l) if attrName(a).isDefined && litOf(l).isDefined =>
        val (v, t) = litOf(l).get
        rangeKeep(attrName(a).get, v, t, (cMin, cMax) =>
          cMin <= 0 && cMax >= 0)
      case EqualTo(l, a) if attrName(a).isDefined && litOf(l).isDefined =>
        eval(EqualTo(a, l))

      case LessThan(a, l) if attrName(a).isDefined && litOf(l).isDefined =>
        val (v, t) = litOf(l).get
        rangeKeep(attrName(a).get, v, t, (cMin, _) => cMin < 0)
      case LessThan(l, a) if attrName(a).isDefined && litOf(l).isDefined =>
        eval(GreaterThan(a, l))

      case LessThanOrEqual(a, l)
          if attrName(a).isDefined && litOf(l).isDefined =>
        val (v, t) = litOf(l).get
        rangeKeep(attrName(a).get, v, t, (cMin, _) => cMin <= 0)
      case LessThanOrEqual(l, a)
          if attrName(a).isDefined && litOf(l).isDefined =>
        eval(GreaterThanOrEqual(a, l))

      case GreaterThan(a, l)
          if attrName(a).isDefined && litOf(l).isDefined =>
        val (v, t) = litOf(l).get
        rangeKeep(attrName(a).get, v, t, (_, cMax) => cMax > 0)
      case GreaterThan(l, a)
          if attrName(a).isDefined && litOf(l).isDefined =>
        eval(LessThan(a, l))

      case GreaterThanOrEqual(a, l)
          if attrName(a).isDefined && litOf(l).isDefined =>
        val (v, t) = litOf(l).get
        rangeKeep(attrName(a).get, v, t, (_, cMax) => cMax >= 0)
      case GreaterThanOrEqual(l, a)
          if attrName(a).isDefined && litOf(l).isDefined =>
        eval(LessThanOrEqual(a, l))

      case In(a, list) if attrName(a).isDefined &&
          list.nonEmpty && list.forall(litOf(_).isDefined) =>
        list.exists(l => eval(EqualTo(a, l)))

      // the optimizer's large-list form (values are internal reprs of
      // the child's type; only a resolved attribute knows that type)
      case InSet(a: AttributeReference, hset) if hset.nonEmpty =>
        hset.exists(v => eval(EqualTo(a, Literal(v, a.dataType))))

      case IsNull(a) if attrName(a).isDefined =>
        stats(attrName(a).get).forall(_.nulls > 0)
      case IsNotNull(a) if attrName(a).isDefined =>
        stats(attrName(a).get).forall(cs => cs.rows > cs.nulls)

      case Not(IsNull(a))    => eval(IsNotNull(a))
      case Not(IsNotNull(a)) => eval(IsNull(a))
      // != lit prunes only a constant file: min == max == lit, no nulls
      case Not(EqualTo(a, l))
          if attrName(a).isDefined && litOf(l).isDefined =>
        val (v, t) = litOf(l).get
        (stats(attrName(a).get), normLit(v, t)) match {
          case (Some(cs), Some(lit)) if cs.nulls == 0 =>
            (cs.min, cs.max) match {
              case (Some(mn), Some(mx)) =>
                !(cmp(mn, lit).contains(0) && cmp(mx, lit).contains(0))
              case _ => true
            }
          case _ => true
        }

      case StartsWith(a, l)
          if attrName(a).isDefined && litOf(l).isDefined =>
        litOf(l).get match {
          case (v, StringType) if v != null =>
            val prefix = v.toString
            stats(attrName(a).get) match {
              case Some(cs) if cs.rows > cs.nulls =>
                (cs.min, cs.max) match {
                  case (Some(mn: String), Some(mx: String)) =>
                    // prune only on proof: every prefixed string is
                    // >= prefix (so mx < prefix excludes) and any
                    // mn above the WHOLE prefix class — mn > prefix
                    // and not itself prefixed — excludes too
                    mx.compareTo(prefix) >= 0 &&
                      (mn.startsWith(prefix) || mn.compareTo(prefix) <= 0)
                  case _ => true
                }
              case Some(cs) => false // all-null: no string starts with p
              case None     => true
            }
          case _ => true
        }

      case _ => true // unknown shape: never prune
    }

    eval(pred)
  }
}
