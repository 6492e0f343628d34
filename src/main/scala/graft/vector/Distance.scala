package graft.vector

import org.apache.spark.sql.Column
import org.apache.spark.sql.functions._

/** Vector distance kernels over `array<float>` columns, composed from
  * codegen-capable built-ins (`zip_with` + `aggregate`), computed in
  * double precision with strict left-to-right accumulation so results
  * are bit-comparable with a columnar oracle evaluating in the same
  * order.
  *
  * Plays the role of Milvus's L2 kernel in the reference
  * (`/root/reference/extract_and_embed.py:54` — `metric_type="L2"`);
  * cosine/dot are the natural companions for the ANN extensions.
  *
  * Staying inside built-ins keeps the whole scoring pipeline in
  * whole-stage codegen — no UDF serialization boundary — which is what
  * makes the brute-force scan path viable as the exact baseline at
  * scale (the scan is embarrassingly parallel, no shuffle).
  */
object Distance {

  /** Sum of f(x, y) over zipped elements, in doubles, left-to-right. */
  private def zipSum(a: Column, b: Column, f: (Column, Column) => Column): Column =
    aggregate(
      zip_with(a, b, (x, y) => f(x.cast("double"), y.cast("double"))),
      lit(0.0),
      (acc, v) => acc + v)

  /** Euclidean (L2) distance — reference's similarity metric. */
  def l2(a: Column, b: Column): Column =
    sqrt(zipSum(a, b, (x, y) => (x - y) * (x - y)))

  /** Squared L2 — cheaper when only used for ranking. */
  def l2Sq(a: Column, b: Column): Column =
    zipSum(a, b, (x, y) => (x - y) * (x - y))

  /** Dot product. */
  def dot(a: Column, b: Column): Column =
    zipSum(a, b, (x, y) => x * y)

  /** L2 norm of a single vector. */
  def norm(a: Column): Column =
    sqrt(aggregate(transform(a, x => x.cast("double") * x.cast("double")),
      lit(0.0), (acc, v) => acc + v))

  /** Cosine similarity = dot / (|a| * |b|). */
  def cosine(a: Column, b: Column): Column =
    dot(a, b) / (norm(a) * norm(b))
}
