package graft.dedup

import org.apache.spark.sql.{Column, GraftColumnBridge}
import org.apache.spark.sql.catalyst.expressions.{BinaryExpression, Expression, UnaryExpression}
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.catalyst.util.{ArrayData, GenericArrayData}
import org.apache.spark.sql.types.{ArrayType, DataType, LongType}

/** Codegen shingling kernels — the scan-side primitives of the dedup
  * pipelines (SURVEY §2.7 extensions; the role a tokenizer/fingerprint
  * stage plays ahead of the reference's embedding loop,
  * `/root/reference/extract_and_embed.py:62-68`).
  *
  * Round 1 carried shingles as `array<string>` built by an interpreted
  * higher-order `transform(sequence(...))` — re-evaluated on every
  * branch of the self-joins and shuffled as long strings. These kernels
  * collapse that to one generated loop per row producing a **sorted,
  * distinct `array<long>`** of 64-bit FNV-1a shingle hashes:
  *
  *  - recompute is cheap (no plan-level caching needed when a subtree
  *    is referenced 3–4× by a self-join),
  *  - shuffle payloads shrink ~8× (8-byte hash vs ~25-char n-gram),
  *  - set intersection becomes a linear merge over sorted longs
  *    ([[SortedIntersectCount]]) instead of a per-pair hash set.
  *
  * Hash contract: each shingle hash equals FNV-1a-64 over the UTF-8
  * bytes of the space-joined n-gram — byte-identical to hashing the
  * string `array_join(slice(tokens, i, n), " ")`, so
  * [[MinHashKernel.MinHashFromHashes]] reproduces the exact signatures
  * of the string-input [[MinHashKernel.MinHashSignature]]. Distinct
  * 64-bit collisions across a corpus' shingle universe are the usual
  * negligible-probability caveat of every hashed inverted index.
  */
object ShingleKernel {

  private val FnvOffset = -3750763034362895579L // FNV-1a 64 offset basis
  private val FnvPrime  = 1099511628211L

  /** tokens (`array<string>`) → sorted distinct `array<long>` of n-gram
    * shingle hashes. Texts shorter than n tokens yield one shingle (the
    * full token run) — same edge semantics as [[Dedup.shingles]].
    */
  case class ShingleHash64(child: Expression, n: Int) extends UnaryExpression {

    require(n >= 1, "shingle width must be >= 1")

    override def dataType: DataType = ArrayType(LongType, containsNull = false)
    override def prettyName: String = "shingle_hash64"

    override def nullSafeEval(input: Any): Any = {
      val toks = input.asInstanceOf[ArrayData]
      val nt = toks.numElements()
      val ns = math.max(nt - n + 1, 1)
      val out = new Array[Long](ns)
      var i = 0
      while (i < ns) {
        var h = FnvOffset
        var t = i
        val end = math.min(i + n, nt)
        while (t < end) {
          if (t > i) { h ^= 0x20L; h *= FnvPrime }
          val bytes = toks.getUTF8String(t).getBytes
          var j = 0
          while (j < bytes.length) { h ^= (bytes(j) & 0xffL); h *= FnvPrime; j += 1 }
          t += 1
        }
        out(i) = h
        i += 1
      }
      java.util.Arrays.sort(out)
      // in-place unique over the sorted run
      var w = 0
      var r = 0
      while (r < ns) {
        if (r == 0 || out(r) != out(r - 1)) { out(w) = out(r); w += 1 }
        r += 1
      }
      new GenericArrayData(if (w == ns) out else java.util.Arrays.copyOf(out, w))
    }

    override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
      nullSafeCodeGen(ctx, ev, input => {
        val nt  = ctx.freshName("nt")
        val ns  = ctx.freshName("ns")
        val out = ctx.freshName("out")
        val i   = ctx.freshName("i")
        val t   = ctx.freshName("t")
        val j   = ctx.freshName("j")
        val h   = ctx.freshName("h")
        val bs  = ctx.freshName("bs")
        val end = ctx.freshName("end")
        val w   = ctx.freshName("w")
        val r   = ctx.freshName("r")
        s"""int $nt = $input.numElements();
           |int $ns = Math.max($nt - ${n - 1}, 1);
           |long[] $out = new long[$ns];
           |for (int $i = 0; $i < $ns; $i++) {
           |  long $h = ${FnvOffset}L;
           |  int $end = Math.min($i + $n, $nt);
           |  for (int $t = $i; $t < $end; $t++) {
           |    if ($t > $i) { $h ^= 0x20L; $h *= ${FnvPrime}L; }
           |    byte[] $bs = $input.getUTF8String($t).getBytes();
           |    for (int $j = 0; $j < $bs.length; $j++) {
           |      $h ^= ($bs[$j] & 0xffL); $h *= ${FnvPrime}L;
           |    }
           |  }
           |  $out[$i] = $h;
           |}
           |java.util.Arrays.sort($out);
           |int $w = 0;
           |for (int $r = 0; $r < $ns; $r++) {
           |  if ($r == 0 || $out[$r] != $out[$r - 1]) { $out[$w] = $out[$r]; $w++; }
           |}
           |${ev.value} = new org.apache.spark.sql.catalyst.util.GenericArrayData(
           |  $w == $ns ? $out : java.util.Arrays.copyOf($out, $w));""".stripMargin
      })

    override protected def withNewChildInternal(newChild: Expression): Expression =
      copy(child = newChild)
  }

  /** |a ∩ b| for two SORTED distinct `array<long>` columns — one linear
    * merge, no allocation. The verification hot loop of the similarity
    * joins (runs once per candidate pair).
    */
  case class SortedIntersectCount(left: Expression, right: Expression)
      extends BinaryExpression {

    override def dataType: DataType = LongType
    override def prettyName: String = "sorted_intersect_count"

    override def nullSafeEval(a: Any, b: Any): Any = {
      val x = a.asInstanceOf[ArrayData]
      val y = b.asInstanceOf[ArrayData]
      var i = 0; var j = 0; var c = 0L
      val nx = x.numElements(); val ny = y.numElements()
      while (i < nx && j < ny) {
        val xv = x.getLong(i); val yv = y.getLong(j)
        if (xv == yv) { c += 1; i += 1; j += 1 }
        else if (xv < yv) i += 1
        else j += 1
      }
      java.lang.Long.valueOf(c)
    }

    override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
      nullSafeCodeGen(ctx, ev, (a, b) => {
        val i = ctx.freshName("i")
        val j = ctx.freshName("j")
        val c = ctx.freshName("c")
        val xv = ctx.freshName("xv")
        val yv = ctx.freshName("yv")
        s"""int $i = 0; int $j = 0; long $c = 0L;
           |while ($i < $a.numElements() && $j < $b.numElements()) {
           |  long $xv = $a.getLong($i);
           |  long $yv = $b.getLong($j);
           |  if ($xv == $yv) { $c++; $i++; $j++; }
           |  else if ($xv < $yv) { $i++; } else { $j++; }
           |}
           |${ev.value} = $c;""".stripMargin
      })

    override protected def withNewChildrenInternal(newLeft: Expression,
                                                   newRight: Expression): Expression =
      copy(left = newLeft, right = newRight)
  }

  /** MinHash signature (`array<long>`, one per band) → LSH band keys:
    * FNV-1a over (band index, the band's signature slice). Replaces the
    * interpreted slice/transform/array_join/xxhash64 composition — one
    * generated loop, and cheap enough to sit inline under an explode.
    */
  case class BandHash64(child: Expression, numBands: Int) extends UnaryExpression {

    require(numBands > 0, s"numBands must be positive, got $numBands")

    override def dataType: DataType = ArrayType(LongType, containsNull = false)
    override def prettyName: String = "band_hash64"

    // Signature length must be an exact multiple of numBands: integer
    // division would otherwise silently drop trailing elements (and a
    // signature shorter than numBands would collide every row).
    private def checkLen(n: Int): Unit =
      if (n % numBands != 0 || n < numBands)
        throw new IllegalArgumentException(
          s"band_hash64: signature length $n is not a positive multiple of numBands=$numBands")

    private def mix(h0: Long, v: Long): Long = {
      var h = h0
      var s = 0
      while (s < 64) { h ^= ((v >>> s) & 0xffL); h *= FnvPrime; s += 8 }
      h
    }

    override def nullSafeEval(input: Any): Any = {
      val sig = input.asInstanceOf[ArrayData]
      val n = sig.numElements()
      checkLen(n)
      val rows = n / numBands
      val out = new Array[Long](numBands)
      var b = 0
      while (b < numBands) {
        var h = mix(FnvOffset, b.toLong)
        var r = 0
        while (r < rows) { h = mix(h, sig.getLong(b * rows + r)); r += 1 }
        out(b) = h
        b += 1
      }
      new GenericArrayData(out)
    }

    override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
      nullSafeCodeGen(ctx, ev, input => {
        val rows = ctx.freshName("rows")
        val out  = ctx.freshName("out")
        val b    = ctx.freshName("b")
        val r    = ctx.freshName("r")
        val s    = ctx.freshName("s")
        val h    = ctx.freshName("h")
        val v    = ctx.freshName("v")
        s"""if ($input.numElements() % $numBands != 0 || $input.numElements() < $numBands) {
           |  throw new IllegalArgumentException(
           |    "band_hash64: signature length " + $input.numElements() +
           |    " is not a positive multiple of numBands=" + $numBands);
           |}
           |int $rows = $input.numElements() / $numBands;
           |long[] $out = new long[$numBands];
           |for (int $b = 0; $b < $numBands; $b++) {
           |  long $h = ${FnvOffset}L;
           |  for (int $r = -1; $r < $rows; $r++) {
           |    long $v = $r < 0 ? (long) $b : $input.getLong($b * $rows + $r);
           |    for (int $s = 0; $s < 64; $s += 8) {
           |      $h ^= (($v >>> $s) & 0xffL); $h *= ${FnvPrime}L;
           |    }
           |  }
           |  $out[$b] = $h;
           |}
           |${ev.value} = new org.apache.spark.sql.catalyst.util.GenericArrayData($out);""".stripMargin
      })

    override protected def withNewChildInternal(newChild: Expression): Expression =
      copy(child = newChild)
  }

  def shingleHash64(tokens: Column, n: Int): Column =
    GraftColumnBridge.column(ShingleHash64(GraftColumnBridge.expression(tokens), n))

  def sortedIntersectCount(a: Column, b: Column): Column =
    GraftColumnBridge.column(SortedIntersectCount(
      GraftColumnBridge.expression(a), GraftColumnBridge.expression(b)))

  def bandHash64(sig: Column, numBands: Int): Column =
    GraftColumnBridge.column(BandHash64(GraftColumnBridge.expression(sig), numBands))
}
