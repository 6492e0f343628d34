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

  // ---- binary (sign-bit) quantization ---------------------------------

  /** Sign-bit binarization: bit b is set iff `x_b > 0`, packed 32 bits
    * per BIGINT word, MSB-first — 32× smaller than float32, the
    * coarsest rung of the quantization ladder (below [[int8]] and the
    * PQ codes) and the standard first-pass filter of a two-stage
    * binary→exact search ([[hamming]] prunes, exact cosine re-ranks).
    * 32 bits per word, not 64: every packed value then stays below
    * 2³², so the powers of two are exact in double arithmetic and the
    * DuckDB twin computes the identical integers without relying on
    * engine-specific 64-bit shift overflow behavior. Pure columnar
    * HOF — narrow map, no shuffle, same plan contract as [[int8]].
    */
  def binary(emb: Column): Column =
    element_at(
      transform(array(emb), e =>
        transform(sequence(lit(1), floor((size(e) + 31) / 32).cast("int")), w =>
          aggregate(sequence(lit(1), lit(32)), lit(0L), (acc, b) => {
            val i = (w - 1) * 32 + b
            acc + when(i <= size(e) && element_at(e, i) > lit(0.0f),
              pow(lit(2.0d), (lit(32) - b).cast("double")).cast("long"))
              .otherwise(lit(0L))
          }))), 1)

  /** Hamming distance between two packed sign-bit arrays (popcount of
    * the wordwise XOR).
    */
  def hamming(a: Column, b: Column): Column =
    aggregate(zip_with(a, b, (x, y) => bit_count(x.bitwiseXOR(y)).cast("long")),
      lit(0L), (acc, v) => acc + v)

  /** DuckDB twin of [[binary]] over a list expression. */
  def binarySql(arr: String): String =
    s"""list_transform(range(1, CAST(floor((len($arr) + 31) / 32) AS BIGINT) + 1), w ->
       | CAST(list_sum(list_transform(range(1, 33), b ->
       |   CASE WHEN (w - 1) * 32 + b <= len($arr)
       |         AND $arr[CAST((w - 1) * 32 + b AS INTEGER)] > 0
       |        THEN CAST(pow(2, 32 - b) AS BIGINT) ELSE 0 END))
       |  AS BIGINT))""".stripMargin

  /** DuckDB twin of [[hamming]] over two packed lists. */
  def hammingSql(a: String, b: String): String =
    s"""CAST(list_sum(list_transform(range(1, len($a) + 1), i ->
       | bit_count(xor($a[CAST(i AS INTEGER)], $b[CAST(i AS INTEGER)]))))
       | AS BIGINT)""".stripMargin

  // ---- product quantization ------------------------------------------

  /** Trained PQ codebooks: `m` contiguous subspaces of `dim / m` dims,
    * `codebooks(s)` = that subspace's centroid list (≤ ksub entries —
    * capped at the sample's distinct subvector count).
    */
  final case class PqModel(dim: Int, m: Int,
                           codebooks: Array[Array[Array[Double]]]) {
    def dsub: Int = dim / m
    def ksub: Int = codebooks.map(_.length).max
  }

  /** Product quantization (Jégou et al., "Product Quantization for
    * Nearest Neighbor Search", 2011): the embedding is split into `m`
    * contiguous subvectors, each quantized independently against its
    * own `ksub`-entry codebook, so a vector stores as `m` small codes —
    * `m·log2(ksub)` bits instead of `dim × 32` — while distances remain
    * computable per subspace. Training mirrors [[graft.vector.Ann
    * .buildIvf]]: a deterministic hash-ordered driver-side sample, then
    * seeded Lloyd's per subspace (subspace `s` uses `seed + s`).
    * Codebooks train concurrently — they are independent.
    *
    * With `ksub` ≥ the number of distinct subvectors, every distinct
    * subvector becomes its own centroid (distinct-point init + one
    * Lloyd round is a fixed point), so encode→decode is EXACT — the
    * degradation gate that puts the whole train/encode/decode path
    * under the brute-force oracle (`ann_pq_full_codebook`), the same
    * trick as the IVF full-probe gate.
    */
  def trainPq(corpus: org.apache.spark.sql.DataFrame, emb: String = "embedding",
              m: Int = 8, ksub: Int = 256, seed: Long = 42L,
              maxIter: Int = 10, maxTrainRows: Int = 100000): PqModel = {
    require(m > 0 && ksub > 0, "m and ksub must be positive")
    val sample = corpus.select(col(emb))
      .orderBy(xxhash64(col(emb)), col(emb))
      .limit(maxTrainRows)
      .collect()
      .map(_.getSeq[Float](0).toArray.map(_.toDouble))
    require(sample.nonEmpty, "empty training sample")
    val dim = sample.head.length
    require(dim % m == 0, s"dim $dim is not divisible by m $m")
    val dsub = dim / m
    import scala.concurrent.{Await, Future}
    import scala.concurrent.ExecutionContext.Implicits.global
    val codebooks = Await.result(
      Future.sequence((0 until m).toVector.map(s => Future {
        Ann.lloyd(sample.map(_.slice(s * dsub, s * dsub + dsub)),
          ksub, maxIter, seed + s)
      })), scala.concurrent.duration.Duration.Inf).toArray
    PqModel(dim, m, codebooks)
  }

  /** PQ codes (`array<int>`, length m) for a float-array column — one
    * codegen nearest-centroid kernel per subspace over an array slice;
    * a narrow map, the 100 TB encode shape.
    */
  def pqEncode(model: PqModel, emb: Column): Column = {
    val d = model.dsub
    array((0 until model.m).map(s =>
      VectorKernels.nearestCentroid(slice(emb, s * d + 1, d),
        model.codebooks(s))): _*)
  }

  /** Reconstruction from PQ codes: per-subspace codebook lookup
    * (codebooks ride along as ONE nested array literal, not an
    * expression tree), concatenated back to a float array. L2 against
    * a reconstruction is exactly the ADC distance `Σ_s ‖q_s − c_s‖²`,
    * so decode + the existing distance kernels ARE the ADC scan.
    * Floats out: centroids are means of float-valued doubles, so the
    * cast loses nothing at full codebook (and one rounding step at
    * lossy settings, bounded by QuantizeSpec).
    */
  def pqDecode(model: PqModel, codes: Column): Column = {
    val lut = typedLit(model.codebooks.map(_.map(_.toSeq).toSeq).toSeq)
    flatten(transform(sequence(lit(0), lit(model.m - 1)),
      s => element_at(element_at(lut, s + 1),
        element_at(codes, s + 1) + 1)))
      .cast("array<float>")
  }

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
