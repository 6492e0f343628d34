package graft.vector

import org.apache.spark.sql.Column
import org.apache.spark.sql.functions._

/** Scalar int8 quantization for embedding columns — the storage form
  * of a 100 TB vector corpus (4× smaller than float32; a 1536-dim
  * float corpus at reference scale is the difference between fitting
  * the serving tier in RAM or not). Symmetric per-vector scheme:
  * `scale = max(|x|) / 127`, `code_i = round(x_i / scale)` clamped to
  * [-127, 127]; the all-zero vector quantizes to zeros with scale 0.
  *
  * Pure columnar (`transform` / `aggregate` over the array — narrow
  * map, no shuffle). Dequantization is `code_i * scale`; the committed
  * contract is max reconstruction error ≤ scale/2, asserted per row in
  * QuantizeSpec and surfaced as `recon_err` here.
  */
object Quantize {

  /** Max |x| over a float array, as double. */
  private def maxAbs(e: Column): Column =
    aggregate(e, lit(0.0d), (m, x) => greatest(m, abs(x.cast("double"))))

  /** Struct `(scale double, codes array<int>, recon_err double)` for a
    * float-array column. The input array is bound to a lambda variable
    * (and the derived scale to an inner one) so each is evaluated once
    * per row regardless of how many lambdas reference it.
    *
    * The emitted scale is rounded to 8dp for cross-engine float
    * stability, which floors the usable magnitude: a vector whose
    * max |x| is below ~1.3e-6 stores scale 0. Embedding vectors are
    * unit-order; renormalize first if quantizing raw activations.
    */
  def int8(emb: Column): Column =
    element_at(
      transform(array(emb), e =>
        element_at(
          transform(array(maxAbs(e) / 127.0d), s => {
            val codes = transform(e, x =>
              when(s === 0.0d, lit(0))
                .otherwise(least(greatest(
                  round(x.cast("double") / s).cast("int"), lit(-127)), lit(127))))
            val err = aggregate(
              zip_with(e, codes, (x, c) => abs(x.cast("double") - c * s)),
              lit(0.0d), (m, v) => greatest(m, v))
            struct(round(s, 8).as("scale"), codes.as("codes"),
              round(err, 6).as("recon_err"))
          }), 1)), 1)

  /** DuckDB twin of [[int8]]'s fields, given a DOUBLE[]-castable
    * array expression; emits (scale, codes, recon_err) select items.
    */
  def int8Sql(arrExpr: String): (String, String, String) = {
    val e = s"CAST($arrExpr AS DOUBLE[])"
    val s = s"(list_max(list_transform($e, x -> abs(x))) / 127.0)"
    val codes = s"""list_transform($e, x -> CASE WHEN $s = 0 THEN 0
                   | ELSE CAST(least(greatest(round(x / $s), -127), 127) AS INTEGER) END)""".stripMargin
    val err = s"""list_max(list_transform($e, x -> abs(x -
                 | (CASE WHEN $s = 0 THEN 0 ELSE CAST(least(greatest(round(x / $s), -127), 127) AS INTEGER) END) * $s)))""".stripMargin
    (s"round($s, 8)", codes, s"round($err, 6)")
  }
}
