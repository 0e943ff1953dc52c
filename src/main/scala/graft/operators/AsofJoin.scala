package graft.operators

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/** Backward as-of join — attach to each probe row the most recent
  * reference row (same keys, reference ts ≤ probe ts, inclusive). The
  * time-series enrichment operator Spark has no builtin for (north-star;
  * no reference analog).
  *
  * Implementation is the scale-correct tagged-union form: reference and
  * probe rows are unioned with a tag, hash-partitioned by key, and a
  * single growing-frame window (`last(..., ignoreNulls)` over
  * unboundedPreceding→currentRow) carries the latest reference payload
  * forward. ONE shuffle on the key, no range-condition join (which
  * Catalyst would execute as a per-key cartesian + filter), no per-key
  * state on the driver. Reference payload rides in ONE struct so a null
  * payload FIELD can't make `ignoreNulls` skip to an older row.
  *
  * At 100 TB: shuffle volume is |probe| + |reference| rows — the minimum
  * any key-partitioned formulation can move; for skewed keys use
  * [[backwardSalted]]/[[forwardSalted]], which split probe rows per
  * deterministic salt and replicate reference rows per salt bucket so a
  * hot key's window work spreads over `salts` reducers with identical
  * results.
  */
object AsofJoin {

  /** @param payloadCols reference columns to attach (prefixed `r_`)
    * @param tieCol      reference column breaking equal-ts ties
    *                    (largest wins — make it unique for determinism)
    * @param tolerance   max probe.ts − ref.ts (same units as tsCol);
    *                    matches farther back are nulled out
    */
  def backward(probe: DataFrame, reference: DataFrame, keyCols: Seq[String],
               tsCol: String, payloadCols: Seq[String], tieCol: String,
               tolerance: Option[Column] = None,
               prefix: String = "r_"): DataFrame =
    join0(probe, reference, keyCols, tsCol, payloadCols, tieCol,
      tolerance, prefix, forward = false)

  /** Forward variant: the EARLIEST reference at or after the probe ts
    * (inclusive; equal-ts ties still resolve to the largest `tieCol`).
    * Same single-shuffle shape — the window just runs over descending
    * time.
    */
  def forward(probe: DataFrame, reference: DataFrame, keyCols: Seq[String],
              tsCol: String, payloadCols: Seq[String], tieCol: String,
              tolerance: Option[Column] = None,
              prefix: String = "r_"): DataFrame =
    join0(probe, reference, keyCols, tsCol, payloadCols, tieCol,
      tolerance, prefix, forward = true)

  /** Hot-key backward as-of: identical results to [[backward]], with
    * each probe row routed to one of `salts` sub-partitions of its key
    * (deterministic [[Skew.saltColumn]] over `saltBy` — pass columns
    * that vary WITHIN the hot key, e.g. the probe row id) and the
    * reference side replicated into every sub-partition. Each (key,
    * salt) window sees the key's FULL reference history, so per-probe
    * results cannot change; the hot key's window sort+scan spreads over
    * `salts` reducers. Cost: reference shuffle volume × `salts` — use
    * when probe rows dominate a skewed key (the common shape: billions
    * of events against thousands of quotes).
    */
  def backwardSalted(probe: DataFrame, reference: DataFrame,
                     keyCols: Seq[String], tsCol: String,
                     payloadCols: Seq[String], tieCol: String,
                     saltBy: Seq[Column], salts: Int,
                     tolerance: Option[Column] = None,
                     prefix: String = "r_"): DataFrame =
    salted0(probe, reference, keyCols, tsCol, payloadCols, tieCol,
      saltBy, salts, tolerance, prefix, forward = false)

  /** Forward twin of [[backwardSalted]]. */
  def forwardSalted(probe: DataFrame, reference: DataFrame,
                    keyCols: Seq[String], tsCol: String,
                    payloadCols: Seq[String], tieCol: String,
                    saltBy: Seq[Column], salts: Int,
                    tolerance: Option[Column] = None,
                    prefix: String = "r_"): DataFrame =
    salted0(probe, reference, keyCols, tsCol, payloadCols, tieCol,
      saltBy, salts, tolerance, prefix, forward = true)

  private def salted0(probe: DataFrame, reference: DataFrame,
                      keyCols: Seq[String], tsCol: String,
                      payloadCols: Seq[String], tieCol: String,
                      saltBy: Seq[Column], salts: Int,
                      tolerance: Option[Column], prefix: String,
                      forward: Boolean): DataFrame = {
    require(salts >= 1, "salts >= 1")
    val saltCol = "__asof_salt"
    val saltedProbe = probe.withColumn(saltCol, Skew.saltColumn(saltBy, salts))
    val replicatedRef = reference.withColumn(saltCol,
      explode(sequence(lit(0), lit(salts - 1)).cast("array<long>")))
    join0(saltedProbe, replicatedRef, keyCols :+ saltCol, tsCol,
      payloadCols, tieCol, tolerance, prefix, forward)
      .drop(saltCol)
  }

  private def join0(probe: DataFrame, reference: DataFrame,
                    keyCols: Seq[String], tsCol: String,
                    payloadCols: Seq[String], tieCol: String,
                    tolerance: Option[Column], prefix: String,
                    forward: Boolean): DataFrame = {
    val probeCols = probe.columns.toSeq
    val lStructT = probe.select(struct(probeCols.map(col): _*)).schema.head.dataType
    val rPayload = (payloadCols :+ tsCol).distinct
    val rStructT = reference
      .select(struct(rPayload.map(col): _*)).schema.head.dataType

    val rSel = reference.select(
      keyCols.map(col) ++ Seq(
        col(tsCol).as("__ts"), lit(0).as("__tag"),
        col(tieCol).cast("long").as("__tie"),
        lit(null).cast(lStructT).as("__l"),
        struct(rPayload.map(col): _*).as("__r")): _*)
    val lSel = probe.select(
      keyCols.map(col) ++ Seq(
        col(tsCol).as("__ts"), lit(1).as("__tag"),
        lit(0L).as("__tie"),
        struct(probeCols.map(col): _*).as("__l"),
        lit(null).cast(rStructT).as("__r")): _*)

    val tsOrder = if (forward) col("__ts").desc else col("__ts").asc
    val w = Window.partitionBy(keyCols.map(col): _*)
      .orderBy(tsOrder, col("__tag").asc, col("__tie").asc)
      .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    // SQL join semantics: NULL keys match nothing. The window would
    // happily group all-null keys together (window partitioning treats
    // NULL = NULL), so the carried match is nulled out whenever any
    // join key is null.
    val keysOk = keyCols.map(col(_).isNotNull).reduce(_ && _)
    val matched = rSel.unionByName(lSel)
      .withColumn("__m",
        when(keysOk, last(col("__r"), ignoreNulls = true).over(w)))
      .filter(col("__tag") === 1)

    val inRange = tolerance match {
      case Some(tol) =>
        val delta =
          if (forward) col("__m").getField(tsCol) - col("__ts")
          else col("__ts") - col("__m").getField(tsCol)
        col("__m").isNotNull && delta <= tol
      case None => col("__m").isNotNull
    }
    val out = probeCols.map(c => col("__l").getField(c).as(c)) ++
      rPayload.map(p =>
        when(inRange, col("__m").getField(p)).as(s"$prefix$p"))
    matched.select(out: _*)
  }
}
