package graft.functions

import org.apache.spark.sql.Column
import org.apache.spark.sql.functions._

/** Embedding-vector primitives over ArrayType(FloatType) columns,
  * built from codegen'd higher-order functions (zip_with/aggregate) —
  * no UDFs, so they stay inside whole-stage codegen and never
  * deserialize rows (SURVEY.md §7.3).
  *
  * All arithmetic is widened to double and folded sequentially
  * (left-to-right), making results deterministic and engine-comparable.
  */
object VectorOps {

  /** Σ aᵢ·bᵢ in double precision — native codegen'd Catalyst
    * expression (graft.expr.FloatVecDot). Bit-for-bit equal to
    * [[dotHof]]; ~20× faster in O(n²) similarity joins. */
  def dot(a: Column, b: Column): Column = graft.expr.VectorExprs.dot(a, b)

  /** Reference higher-order-function formulation of [[dot]] — kept
    * for the equivalence property test and as the portable fallback. */
  def dotHof(a: Column, b: Column): Column =
    aggregate(
      zip_with(a, b, (x, y) => x.cast("double") * y.cast("double")),
      lit(0.0), (acc, v) => acc + v)

  /** ‖a‖₂ in double precision (same fold sequence as dot(a,a)). */
  def norm(a: Column): Column = sqrt(dot(a, a))

  /** Cosine similarity in double precision. */
  def cosine(a: Column, b: Column): Column =
    dot(a, b) / (norm(a) * norm(b))

  /** Squared L2 distance (cheaper than sqrt when only ranking). */
  def l2sq(a: Column, b: Column): Column =
    aggregate(
      zip_with(a, b, (x, y) => {
        val d = x.cast("double") - y.cast("double"); d * d
      }),
      lit(0.0), (acc, v) => acc + v)
}
