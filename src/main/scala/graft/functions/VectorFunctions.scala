package graft.functions

import org.apache.spark.sql.Column
import org.apache.spark.sql.functions._

/** Vector math over `ArrayType(FloatType)` embedding columns, built from
  * codegen'd Spark built-ins (`zip_with`, `aggregate`, `transform`) — no
  * UDFs, so the whole similarity pipeline stays inside WholeStageCodegen.
  *
  * Re-expresses the reference's Pinecone cosine retrieval
  * (transcripts_to_vector_db.py:280-313, SURVEY.md §1.1 "Vector index")
  * as column algebra. All accumulation in DOUBLE with a deterministic
  * left-to-right fold, so results are reproducible across partitionings
  * and match a same-order oracle bit-for-bit.
  */
object VectorFunctions {

  /** Left-to-right double-precision sum of an array column. */
  def arraySumD(a: Column): Column =
    aggregate(a, lit(0.0), (acc, x) => acc + x.cast("double"))

  def dot(a: Column, b: Column): Column =
    arraySumD(zip_with(a, b, (x, y) => x.cast("double") * y.cast("double")))

  def norm2(a: Column): Column =
    sqrt(arraySumD(transform(a, x => x.cast("double") * x.cast("double"))))

  /** Cosine similarity; null-safe on zero vectors (returns null).
    * Delegates to the native [[graft.plans.CosineSimExpr]] (requires
    * [[graft.plans.GraftExtensions]] on the session) — bit-equal to
    * [[cosineHof]], ~50× faster (tight loop vs interpreted lambdas).
    */
  def cosine(a: Column, b: Column): Column =
    call_function("graft_cosine", a, b)

  /** Composed-builtin cosine (fold over zip_with): the reference
    * implementation the native expression is validated against.
    */
  def cosineHof(a: Column, b: Column): Column = {
    val d = dot(a, b); val na = norm2(a); val nb = norm2(b)
    when(na === 0.0 || nb === 0.0, lit(null)).otherwise(d / (na * nb))
  }

  /** Squared euclidean distance. */
  def l2Sq(a: Column, b: Column): Column =
    arraySumD(zip_with(a, b,
      (x, y) => (x.cast("double") - y.cast("double")) *
        (x.cast("double") - y.cast("double"))))

  /** L2-normalize a vector (double array out). */
  def normalize(a: Column): Column = {
    val n = norm2(a)
    transform(a, x => x.cast("double") / n)
  }
}
