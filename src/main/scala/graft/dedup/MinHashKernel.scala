package graft.dedup

import org.apache.spark.sql.{Column, GraftColumnBridge}
import org.apache.spark.sql.catalyst.expressions.{Expression, UnaryExpression}
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.catalyst.util.{ArrayData, GenericArrayData}
import org.apache.spark.sql.types.{ArrayType, DataType, LongType}

/** Codegen MinHash signature kernel: one generated loop hashes each
  * shingle (FNV-1a over its UTF-8 bytes, folded to 31 bits) and updates
  * all permutation minima in place — primitive `long[]` state, no boxed
  * intermediate arrays. Replaces the interpreted higher-order fold that
  * dominated the LSH pipeline (higher-order functions never enter
  * whole-stage codegen).
  *
  * The affine permutation family matches [[Dedup]]'s published
  * construction: h_j(x) = (a_j·x + b_j) mod p, p = 2^31−1; operands
  * stay within 62 bits so ANSI overflow checking never trips.
  */
object MinHashKernel {

  private val P = 2147483647L // 2^31 - 1
  private val FnvOffset = -3750763034362895579L // FNV-1a 64 offset basis
  private val FnvPrime  = 1099511628211L

  case class MinHashSignature(child: Expression, permA: Array[Long], permB: Array[Long])
      extends UnaryExpression {

    private val numPerms = permA.length

    override def dataType: DataType = ArrayType(LongType, containsNull = false)
    override def prettyName: String = "minhash_signature"

    override def nullSafeEval(input: Any): Any = {
      val arr = input.asInstanceOf[ArrayData]
      val sig = Array.fill(numPerms)(P)
      var i = 0
      val n = arr.numElements()
      while (i < n) {
        val bytes = arr.getUTF8String(i).getBytes
        var h = FnvOffset
        var j = 0
        while (j < bytes.length) {
          h ^= (bytes(j) & 0xffL); h *= FnvPrime; j += 1
        }
        val base = java.lang.Math.floorMod(h, P)
        var p = 0
        while (p < numPerms) {
          val v = java.lang.Math.floorMod(base * permA(p) + permB(p), P)
          if (v < sig(p)) sig(p) = v
          p += 1
        }
        i += 1
      }
      new GenericArrayData(sig)
    }

    override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
      nullSafeCodeGen(ctx, ev, input => {
        val aRef = ctx.addReferenceObj("minhashPermA", permA, "long[]")
        val bRef = ctx.addReferenceObj("minhashPermB", permB, "long[]")
        val sig  = ctx.freshName("sig")
        val i    = ctx.freshName("i")
        val j    = ctx.freshName("j")
        val p    = ctx.freshName("p")
        val h    = ctx.freshName("h")
        val bs   = ctx.freshName("bs")
        val base = ctx.freshName("base")
        val v    = ctx.freshName("v")
        s"""long[] $sig = new long[$numPerms];
           |java.util.Arrays.fill($sig, ${P}L);
           |for (int $i = 0; $i < $input.numElements(); $i++) {
           |  byte[] $bs = $input.getUTF8String($i).getBytes();
           |  long $h = ${FnvOffset}L;
           |  for (int $j = 0; $j < $bs.length; $j++) {
           |    $h ^= ($bs[$j] & 0xffL); $h *= ${FnvPrime}L;
           |  }
           |  long $base = java.lang.Math.floorMod($h, ${P}L);
           |  for (int $p = 0; $p < $numPerms; $p++) {
           |    long $v = java.lang.Math.floorMod($base * $aRef[$p] + $bRef[$p], ${P}L);
           |    if ($v < $sig[$p]) $sig[$p] = $v;
           |  }
           |}
           |${ev.value} = new org.apache.spark.sql.catalyst.util.GenericArrayData($sig);""".stripMargin
      })

    override protected def withNewChildInternal(newChild: Expression): Expression =
      copy(child = newChild)
  }

  /** Signature column over an `array<string>` shingle column. */
  def signature(shingles: Column, permA: Seq[Long], permB: Seq[Long]): Column =
    GraftColumnBridge.column(MinHashSignature(
      GraftColumnBridge.expression(shingles), permA.toArray, permB.toArray))

  /** MinHash signature over PRE-HASHED shingles (`array<long>` of raw
    * FNV-1a-64 values, e.g. [[ShingleKernel.ShingleHash64]] output).
    * Skips the per-string byte loop; `floorMod(h, p)` then the affine
    * family — bit-identical signatures to [[MinHashSignature]] fed the
    * corresponding shingle strings.
    */
  case class MinHashFromHashes(child: Expression, permA: Array[Long], permB: Array[Long])
      extends UnaryExpression {

    private val numPerms = permA.length

    override def dataType: DataType = ArrayType(LongType, containsNull = false)
    override def prettyName: String = "minhash_from_hashes"

    override def nullSafeEval(input: Any): Any = {
      val arr = input.asInstanceOf[ArrayData]
      val sig = Array.fill(numPerms)(P)
      var i = 0
      val n = arr.numElements()
      while (i < n) {
        val base = java.lang.Math.floorMod(arr.getLong(i), P)
        var p = 0
        while (p < numPerms) {
          val v = java.lang.Math.floorMod(base * permA(p) + permB(p), P)
          if (v < sig(p)) sig(p) = v
          p += 1
        }
        i += 1
      }
      new GenericArrayData(sig)
    }

    override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
      nullSafeCodeGen(ctx, ev, input => {
        val aRef = ctx.addReferenceObj("minhashPermA", permA, "long[]")
        val bRef = ctx.addReferenceObj("minhashPermB", permB, "long[]")
        val sig  = ctx.freshName("sig")
        val i    = ctx.freshName("i")
        val p    = ctx.freshName("p")
        val base = ctx.freshName("base")
        val v    = ctx.freshName("v")
        s"""long[] $sig = new long[$numPerms];
           |java.util.Arrays.fill($sig, ${P}L);
           |for (int $i = 0; $i < $input.numElements(); $i++) {
           |  long $base = java.lang.Math.floorMod($input.getLong($i), ${P}L);
           |  for (int $p = 0; $p < $numPerms; $p++) {
           |    long $v = java.lang.Math.floorMod($base * $aRef[$p] + $bRef[$p], ${P}L);
           |    if ($v < $sig[$p]) $sig[$p] = $v;
           |  }
           |}
           |${ev.value} = new org.apache.spark.sql.catalyst.util.GenericArrayData($sig);""".stripMargin
      })

    override protected def withNewChildInternal(newChild: Expression): Expression =
      copy(child = newChild)
  }

  /** Signature column over an `array<long>` pre-hashed shingle column. */
  def signatureFromHashes(hashes: Column, permA: Seq[Long], permB: Seq[Long]): Column =
    GraftColumnBridge.column(MinHashFromHashes(
      GraftColumnBridge.expression(hashes), permA.toArray, permB.toArray))

  /** 64-bit SimHash over an `array<string>` token column: bit i of the
    * signature is the sign of Σ_tokens (2·bit_i(fnv64(token)) − 1).
    * The generated loop keeps a 64-int counter array and folds it to
    * one long — no expression-level shift-by-column restriction, full
    * 64 bits (the HOF form was capped at 32 by exact-double math).
    */
  case class SimHash64(child: Expression) extends UnaryExpression {

    override def dataType: DataType = org.apache.spark.sql.types.LongType
    override def prettyName: String = "simhash64"

    override def nullSafeEval(input: Any): Any = {
      val arr = input.asInstanceOf[ArrayData]
      val counts = new Array[Int](64)
      var i = 0
      val n = arr.numElements()
      while (i < n) {
        val bytes = arr.getUTF8String(i).getBytes
        var h = FnvOffset
        var j = 0
        while (j < bytes.length) { h ^= (bytes(j) & 0xffL); h *= FnvPrime; j += 1 }
        var b = 0
        while (b < 64) {
          if (((h >>> b) & 1L) == 1L) counts(b) += 1 else counts(b) -= 1
          b += 1
        }
        i += 1
      }
      var sig = 0L
      var b = 0
      while (b < 64) { if (counts(b) > 0) sig |= (1L << b); b += 1 }
      java.lang.Long.valueOf(sig)
    }

    override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
      nullSafeCodeGen(ctx, ev, input => {
        val counts = ctx.freshName("counts")
        val i = ctx.freshName("i")
        val j = ctx.freshName("j")
        val b = ctx.freshName("b")
        val h = ctx.freshName("h")
        val bs = ctx.freshName("bs")
        val sig = ctx.freshName("sig")
        s"""int[] $counts = new int[64];
           |for (int $i = 0; $i < $input.numElements(); $i++) {
           |  byte[] $bs = $input.getUTF8String($i).getBytes();
           |  long $h = ${FnvOffset}L;
           |  for (int $j = 0; $j < $bs.length; $j++) {
           |    $h ^= ($bs[$j] & 0xffL); $h *= ${FnvPrime}L;
           |  }
           |  for (int $b = 0; $b < 64; $b++) {
           |    if ((($h >>> $b) & 1L) == 1L) $counts[$b]++; else $counts[$b]--;
           |  }
           |}
           |long $sig = 0L;
           |for (int $b = 0; $b < 64; $b++) {
           |  if ($counts[$b] > 0) $sig |= (1L << $b);
           |}
           |${ev.value} = $sig;""".stripMargin
      })

    override protected def withNewChildInternal(newChild: Expression): Expression =
      copy(child = newChild)
  }

  def simhash64(tokens: Column): Column =
    GraftColumnBridge.column(SimHash64(GraftColumnBridge.expression(tokens)))
}
