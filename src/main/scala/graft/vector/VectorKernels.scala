package graft.vector

import org.apache.spark.sql.{Column, GraftColumnBridge}
import org.apache.spark.sql.catalyst.expressions.{BinaryExpression, Expression, UnaryExpression}
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.catalyst.util.ArrayData
import org.apache.spark.sql.types.{DataType, DoubleType}

/** Fused codegen kernels for vector distance — the "single
  * highest-value custom kernel" from SURVEY §4 (the role Milvus's SIMD
  * L2 loop plays in the reference, `/root/reference/extract_and_embed.py:54`).
  *
  * The built-in composition (`zip_with` + `aggregate`) is correct but
  * those higher-order functions evaluate interpreted, building an
  * intermediate boxed array per row. These expressions generate one
  * primitive `for` loop over the two `ArrayData` float buffers inside
  * whole-stage codegen — no allocation, no boxing, JIT-vectorizable.
  *
  * Numeric contract: identical results to [[Distance]]'s built-in
  * forms — float→double widening per element, strict left-to-right
  * accumulation, same final ops — so swapping kernels can never move a
  * rounded score.
  */
object VectorKernels {

  sealed abstract class FusedVectorOp(name: String) {
    /** Java statements computing `resultVar` from two ArrayData vars.
      * Every local MUST come from `ctx.freshName`: with non-nullable
      * children, `nullSafeCodeGen` inlines this block into the shared
      * projection scope, so two kernels in one projection would
      * redefine fixed names and kick the whole projection to the
      * interpreted fallback (janino "Redefinition of local variable").
      */
    def gen(ctx: CodegenContext, a: String, b: String, n: String, result: String): String
    /** Interpreted twin (same op order). */
    def eval(a: ArrayData, b: ArrayData, n: Int): Double
  }

  case object L2 extends FusedVectorOp("graft_l2") {
    def gen(ctx: CodegenContext, a: String, b: String, n: String, result: String): String = {
      val acc = ctx.freshName("acc"); val i = ctx.freshName("i")
      val d = ctx.freshName("d")
      s"""double $acc = 0.0;
         |for (int $i = 0; $i < $n; $i++) {
         |  double $d = (double) $a.getFloat($i) - (double) $b.getFloat($i);
         |  $acc += $d * $d;
         |}
         |$result = Math.sqrt($acc);""".stripMargin
    }
    def eval(a: ArrayData, b: ArrayData, n: Int): Double = {
      var acc = 0.0; var i = 0
      while (i < n) {
        val d = a.getFloat(i).toDouble - b.getFloat(i).toDouble
        acc += d * d; i += 1
      }
      math.sqrt(acc)
    }
  }

  case object Dot extends FusedVectorOp("graft_dot") {
    def gen(ctx: CodegenContext, a: String, b: String, n: String, result: String): String = {
      val acc = ctx.freshName("acc"); val i = ctx.freshName("i")
      s"""double $acc = 0.0;
         |for (int $i = 0; $i < $n; $i++) {
         |  $acc += (double) $a.getFloat($i) * (double) $b.getFloat($i);
         |}
         |$result = $acc;""".stripMargin
    }
    def eval(a: ArrayData, b: ArrayData, n: Int): Double = {
      var acc = 0.0; var i = 0
      while (i < n) { acc += a.getFloat(i).toDouble * b.getFloat(i).toDouble; i += 1 }
      acc
    }
  }

  /** dot / (‖a‖·‖b‖), with the three sums accumulated in separate
    * left-to-right passes' order (single fused loop, independent
    * accumulators — addition order per accumulator matches the
    * built-in form).
    */
  case object Cosine extends FusedVectorOp("graft_cosine") {
    def gen(ctx: CodegenContext, a: String, b: String, n: String, result: String): String = {
      val dot = ctx.freshName("dot"); val na = ctx.freshName("na")
      val nb = ctx.freshName("nb"); val i = ctx.freshName("i")
      val x = ctx.freshName("x"); val y = ctx.freshName("y")
      s"""double $dot = 0.0; double $na = 0.0; double $nb = 0.0;
         |for (int $i = 0; $i < $n; $i++) {
         |  double $x = (double) $a.getFloat($i);
         |  double $y = (double) $b.getFloat($i);
         |  $dot += $x * $y; $na += $x * $x; $nb += $y * $y;
         |}
         |$result = $dot / (Math.sqrt($na) * Math.sqrt($nb));""".stripMargin
    }
    def eval(a: ArrayData, b: ArrayData, n: Int): Double = {
      var dot = 0.0; var na = 0.0; var nb = 0.0; var i = 0
      while (i < n) {
        val x = a.getFloat(i).toDouble; val y = b.getFloat(i).toDouble
        dot += x * y; na += x * x; nb += y * y; i += 1
      }
      dot / (math.sqrt(na) * math.sqrt(nb))
    }
  }

  /** Binary expression over two `array<float>` columns; iterates over
    * the common prefix (min length), matching `zip_with` semantics for
    * equal-length inputs.
    */
  case class VectorDistance(left: Expression, right: Expression, op: FusedVectorOp)
      extends BinaryExpression {

    override def dataType: DataType = DoubleType
    override def prettyName: String = op.toString.toLowerCase + "_distance"

    override def nullSafeEval(a: Any, b: Any): Any = {
      val x = a.asInstanceOf[ArrayData]
      val y = b.asInstanceOf[ArrayData]
      op.eval(x, y, math.min(x.numElements(), y.numElements()))
    }

    override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
      nullSafeCodeGen(ctx, ev, (a, b) => {
        val n = ctx.freshName("n")
        s"""int $n = Math.min($a.numElements(), $b.numElements());
           |${op.gen(ctx, a, b, n, ev.value)}""".stripMargin
      })

    override protected def withNewChildrenInternal(newLeft: Expression,
                                                   newRight: Expression): Expression =
      copy(left = newLeft, right = newRight)
  }

  /** argmin_c ‖x − centroid_c‖² over a fixed centroid table (flattened
    * row-major `double[]`) — the IVF assignment step as one generated
    * loop nest. Ties (exact equal distance) resolve to the lowest
    * cluster index, so assignment is deterministic.
    */
  case class NearestCentroid(child: Expression, centroids: Array[Double], dim: Int)
      extends UnaryExpression {

    require(dim > 0 && centroids.length % dim == 0, "centroids must be k × dim")
    private val k = centroids.length / dim

    override def dataType: DataType = org.apache.spark.sql.types.IntegerType
    override def prettyName: String = "nearest_centroid"

    override def nullSafeEval(input: Any): Any = {
      val x = input.asInstanceOf[ArrayData]
      val n = math.min(dim, x.numElements())
      var best = 0
      var bestD = Double.MaxValue
      var c = 0
      while (c < k) {
        var d = 0.0
        val off = c * dim
        var j = 0
        while (j < n) {
          val t = x.getFloat(j).toDouble - centroids(off + j)
          d += t * t; j += 1
        }
        if (d < bestD) { bestD = d; best = c }
        c += 1
      }
      java.lang.Integer.valueOf(best)
    }

    override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
      nullSafeCodeGen(ctx, ev, input => {
        val cents = ctx.addReferenceObj("centroids", centroids, "double[]")
        val n    = ctx.freshName("n")
        val best = ctx.freshName("best")
        val bestD = ctx.freshName("bestD")
        val c    = ctx.freshName("c")
        val d    = ctx.freshName("d")
        val off  = ctx.freshName("off")
        val j    = ctx.freshName("j")
        val t    = ctx.freshName("t")
        s"""int $n = Math.min($dim, $input.numElements());
           |int $best = 0;
           |double $bestD = Double.MAX_VALUE;
           |for (int $c = 0; $c < $k; $c++) {
           |  double $d = 0.0;
           |  int $off = $c * $dim;
           |  for (int $j = 0; $j < $n; $j++) {
           |    double $t = (double) $input.getFloat($j) - $cents[$off + $j];
           |    $d += $t * $t;
           |  }
           |  if ($d < $bestD) { $bestD = $d; $best = $c; }
           |}
           |${ev.value} = $best;""".stripMargin
      })

    override protected def withNewChildInternal(newChild: Expression): Expression =
      copy(child = newChild)
  }

  /** The `nprobe` nearest centroids (ascending distance, ties to the
    * lower cluster index) as `array<int>` — the multi-probe variant of
    * [[NearestCentroid]] for IVF KNN JOINS: explode the array and
    * equi-join candidates on `cluster_id`. Insertion into two fixed
    * nprobe-sized arrays; nlist and nprobe are index constants, so the
    * generated loop nest is k·(dim + nprobe) per row.
    */
  case class NearestCentroids(child: Expression, centroids: Array[Double],
                              dim: Int, nprobe: Int)
      extends UnaryExpression {

    require(dim > 0 && centroids.length % dim == 0, "centroids must be k × dim")
    private val k = centroids.length / dim
    private val np = math.min(nprobe, k)
    require(np > 0, "nprobe must be positive")

    override def dataType: DataType =
      org.apache.spark.sql.types.ArrayType(
        org.apache.spark.sql.types.IntegerType, containsNull = false)
    override def prettyName: String = "nearest_centroids"

    override def nullSafeEval(input: Any): Any = {
      val x = input.asInstanceOf[ArrayData]
      val n = math.min(dim, x.numElements())
      val bestIdx = new Array[Int](np)
      val bestD = Array.fill(np)(Double.MaxValue)
      var filled = 0
      var c = 0
      while (c < k) {
        var d = 0.0
        val off = c * dim
        var j = 0
        while (j < n) {
          val t = x.getFloat(j).toDouble - centroids(off + j)
          d += t * t; j += 1
        }
        // strict < keeps equal-distance earlier (lower) indices in
        // place; a NaN distance (NaN input element) never inserts
        var p = np - 1
        if (d < bestD(p)) {
          if (filled < np) filled += 1
          while (p > 0 && d < bestD(p - 1)) {
            bestD(p) = bestD(p - 1); bestIdx(p) = bestIdx(p - 1); p -= 1
          }
          bestD(p) = d; bestIdx(p) = c
        }
        c += 1
      }
      // truncate to actually-inserted probes: an all-NaN query yields
      // an EMPTY probe list (no candidates), never phantom cluster-0
      // duplicates from the array's default zeros
      new org.apache.spark.sql.catalyst.util.GenericArrayData(
        if (filled == np) bestIdx else java.util.Arrays.copyOf(bestIdx, filled))
    }

    override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
      nullSafeCodeGen(ctx, ev, input => {
        val cents = ctx.addReferenceObj("centroids", centroids, "double[]")
        val n = ctx.freshName("n")
        val bi = ctx.freshName("bi")
        val bd = ctx.freshName("bd")
        val c = ctx.freshName("c")
        val d = ctx.freshName("d")
        val off = ctx.freshName("off")
        val j = ctx.freshName("j")
        val t = ctx.freshName("t")
        val p = ctx.freshName("p")
        val filled = ctx.freshName("filled")
        s"""int $n = Math.min($dim, $input.numElements());
           |int[] $bi = new int[$np];
           |double[] $bd = new double[$np];
           |java.util.Arrays.fill($bd, Double.MAX_VALUE);
           |int $filled = 0;
           |for (int $c = 0; $c < $k; $c++) {
           |  double $d = 0.0;
           |  int $off = $c * $dim;
           |  for (int $j = 0; $j < $n; $j++) {
           |    double $t = (double) $input.getFloat($j) - $cents[$off + $j];
           |    $d += $t * $t;
           |  }
           |  int $p = $np - 1;
           |  if ($d < $bd[$p]) {
           |    if ($filled < $np) $filled++;
           |    while ($p > 0 && $d < $bd[$p - 1]) {
           |      $bd[$p] = $bd[$p - 1]; $bi[$p] = $bi[$p - 1]; $p--;
           |    }
           |    $bd[$p] = $d; $bi[$p] = $c;
           |  }
           |}
           |${ev.value} = new org.apache.spark.sql.catalyst.util.GenericArrayData(
           |  $filled == $np ? $bi : java.util.Arrays.copyOf($bi, $filled));""".stripMargin
      })

    override protected def withNewChildInternal(newChild: Expression): Expression =
      copy(child = newChild)
  }

  /** Random-hyperplane LSH band keys for an `array<float>` embedding —
    * the signature step of cosine near-dup bucketing (sign-random-
    * projection LSH, public literature: Charikar's SimHash for angular
    * distance). `planes` is (bands·bits) × dim row-major; bit r of band
    * b is the sign of ⟨x, plane_{b·bits+r}⟩. Each output element packs
    * the band index above the sign bits, so keys never collide across
    * bands and a single `explode` + equi-join buckets all bands at
    * once — the same plan shape as MinHash banding
    * ([[graft.dedup.Dedup.minhashPairs]]).
    */
  case class HyperplaneBandKeys(child: Expression, planes: Array[Double],
                                dim: Int, bands: Int, bits: Int)
      extends UnaryExpression {

    require(bands > 0 && bits > 0 && bits <= 56, "need 0 < bits <= 56 sign bits per band")
    require(planes.length == bands * bits * dim, "planes must be (bands*bits) x dim")

    override def dataType: DataType =
      org.apache.spark.sql.types.ArrayType(org.apache.spark.sql.types.LongType,
        containsNull = false)
    override def prettyName: String = "hyperplane_band_keys"

    override def nullSafeEval(input: Any): Any = {
      val x = input.asInstanceOf[ArrayData]
      val n = math.min(dim, x.numElements())
      val out = new Array[Long](bands)
      var b = 0
      while (b < bands) {
        var key = b.toLong << bits
        var r = 0
        while (r < bits) {
          val off = (b * bits + r) * dim
          var dot = 0.0
          var j = 0
          while (j < n) { dot += x.getFloat(j).toDouble * planes(off + j); j += 1 }
          if (dot >= 0.0) key |= (1L << r)
          r += 1
        }
        out(b) = key
        b += 1
      }
      org.apache.spark.sql.catalyst.util.ArrayData.toArrayData(out)
    }

    override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
      nullSafeCodeGen(ctx, ev, input => {
        val pl  = ctx.addReferenceObj("planes", planes, "double[]")
        val n   = ctx.freshName("n")
        val out = ctx.freshName("out")
        val b   = ctx.freshName("b")
        val key = ctx.freshName("key")
        val r   = ctx.freshName("r")
        val off = ctx.freshName("off")
        val dot = ctx.freshName("dot")
        val j   = ctx.freshName("j")
        s"""int $n = Math.min($dim, $input.numElements());
           |long[] $out = new long[$bands];
           |for (int $b = 0; $b < $bands; $b++) {
           |  long $key = ((long) $b) << $bits;
           |  for (int $r = 0; $r < $bits; $r++) {
           |    int $off = ($b * $bits + $r) * $dim;
           |    double $dot = 0.0;
           |    for (int $j = 0; $j < $n; $j++) {
           |      $dot += (double) $input.getFloat($j) * $pl[$off + $j];
           |    }
           |    if ($dot >= 0.0) $key |= (1L << $r);
           |  }
           |  $out[$b] = $key;
           |}
           |${ev.value} = org.apache.spark.sql.catalyst.util.ArrayData.toArrayData($out);""".stripMargin
      })

    override protected def withNewChildInternal(newChild: Expression): Expression =
      copy(child = newChild)
  }

  def hyperplaneBandKeys(emb: Column, planes: Array[Double], dim: Int,
                         bands: Int, bits: Int): Column =
    GraftColumnBridge.column(HyperplaneBandKeys(
      GraftColumnBridge.expression(emb), planes, dim, bands, bits))

  def nearestCentroid(emb: Column, centroids: Array[Array[Double]]): Column = {
    val dim = centroids.head.length
    GraftColumnBridge.column(NearestCentroid(
      GraftColumnBridge.expression(emb), centroids.flatten, dim))
  }

  def nearestCentroids(emb: Column, centroids: Array[Array[Double]],
                       nprobe: Int): Column = {
    val dim = centroids.head.length
    GraftColumnBridge.column(NearestCentroids(
      GraftColumnBridge.expression(emb), centroids.flatten, dim, nprobe))
  }

  def l2(a: Column, b: Column): Column =
    GraftColumnBridge.column(VectorDistance(
      GraftColumnBridge.expression(a), GraftColumnBridge.expression(b), L2))

  def dot(a: Column, b: Column): Column =
    GraftColumnBridge.column(VectorDistance(
      GraftColumnBridge.expression(a), GraftColumnBridge.expression(b), Dot))

  def cosine(a: Column, b: Column): Column =
    GraftColumnBridge.column(VectorDistance(
      GraftColumnBridge.expression(a), GraftColumnBridge.expression(b), Cosine))
}
