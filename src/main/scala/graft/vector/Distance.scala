package graft.vector

import org.apache.spark.sql.Column
import org.apache.spark.sql.functions._

/** Vector distance kernels over `array<float>` columns.
  *
  * Public entry points ([[l2]], [[dot]], [[cosine]]) use the fused
  * codegen expressions in [[VectorKernels]] — one primitive loop per
  * row inside whole-stage codegen. The `*Builtin` twins compose
  * codegen-free built-ins (`zip_with` + `aggregate`, which evaluate
  * interpreted); they define the numeric contract (float→double
  * widening, left-to-right accumulation) and back the equivalence
  * tests in DistanceSpec.
  *
  * Plays the role of Milvus's L2 kernel in the reference
  * (`/root/reference/extract_and_embed.py:54` — `metric_type="L2"`).
  */
object Distance {

  /** Euclidean (L2) distance — reference's similarity metric. */
  def l2(a: Column, b: Column): Column = VectorKernels.l2(a, b)

  /** Dot product. */
  def dot(a: Column, b: Column): Column = VectorKernels.dot(a, b)

  /** Cosine similarity = dot / (|a| * |b|). */
  def cosine(a: Column, b: Column): Column = VectorKernels.cosine(a, b)

  // ---- built-in-composed twins (numeric contract + test oracle) ----

  private def zipSum(a: Column, b: Column, f: (Column, Column) => Column): Column =
    aggregate(
      zip_with(a, b, (x, y) => f(x.cast("double"), y.cast("double"))),
      lit(0.0),
      (acc, v) => acc + v)

  def l2Builtin(a: Column, b: Column): Column =
    sqrt(zipSum(a, b, (x, y) => (x - y) * (x - y)))

  def dotBuiltin(a: Column, b: Column): Column =
    zipSum(a, b, (x, y) => x * y)

  /** L2 norm of a single vector. */
  def norm(a: Column): Column =
    sqrt(aggregate(transform(a, x => x.cast("double") * x.cast("double")),
      lit(0.0), (acc, v) => acc + v))

  def cosineBuiltin(a: Column, b: Column): Column =
    dotBuiltin(a, b) / (norm(a) * norm(b))
}
