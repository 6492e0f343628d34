package graft.text

import org.apache.spark.sql.{Column, GraftColumnBridge}
import org.apache.spark.sql.catalyst.expressions.{Expression, UnaryExpression}
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.catalyst.util.GenericArrayData
import org.apache.spark.sql.types.{ArrayType, DataType, LongType}
import org.apache.spark.unsafe.types.UTF8String

/** Codegen text kernels. [[TermStats]] fuses document length and
  * per-term term-frequency into ONE generated token scan — replacing
  * `size(split(...))` + one interpreted `size(filter(split(...)))` per
  * term (higher-order functions never enter whole-stage codegen, and
  * their lambda-bound trees are also excluded from subexpression
  * elimination, so the interpreted form re-splits the document
  * per-term, per-pass).
  *
  * Tokenization contract — BIT-IDENTICAL to
  * `split(lower(trim(text)), "\\s+")` (the [[TextAnalysis.bm25]]
  * oracle semantics), including its edge tokens:
  *  - `trim` strips 0x20 only; `\s` is `[ \t\n\x0B\f\r]`;
  *  - a leading separator run yields one leading EMPTY token, a
  *    trailing run one trailing empty token (Java `split` limit −1),
  *    and the empty string yields the singleton `[""]` — so `dl`
  *    counts those empties exactly as the column form does;
  *  - matching is byte-equality after UTF8String lowercasing (ASCII
  *    whitespace bytes cannot occur inside multi-byte UTF-8 chars, so
  *    the byte scan is Unicode-safe).
  */
object TextKernels {

  /** `array<long>` of length terms+1: `[dl, tf_0, …, tf_{n-1}]`.
    * `terms` is a Seq, NOT an Array: case-class equality over an
    * Array is reference equality, which would make two separately
    * built TermStats never `semanticEquals` — silently defeating the
    * subexpression elimination the kernel's one-scan design relies on.
    */
  case class TermStats(child: Expression, terms: Seq[String])
      extends UnaryExpression {

    private val numTerms = terms.length
    @transient private lazy val termBytes: Array[Array[Byte]] =
      terms.map(_.getBytes("UTF-8")).toArray

    override def dataType: DataType = ArrayType(LongType, containsNull = false)
    override def prettyName: String = "term_stats"

    override def nullSafeEval(input: Any): Any = {
      val t = input.asInstanceOf[UTF8String].toLowerCase.trim
      val bs = t.getBytes
      val out = new Array[Long](numTerms + 1)
      val n = bs.length
      if (n == 0) { out(0) = 1L } else {
        def ws(b: Byte): Boolean =
          b == 32 || b == 9 || b == 10 || b == 11 || b == 12 || b == 13
        if (ws(bs(0))) out(0) += 1L
        var i = 0
        while (i < n) {
          while (i < n && ws(bs(i))) i += 1
          if (i < n) {
            val start = i
            while (i < n && !ws(bs(i))) i += 1
            out(0) += 1L
            var p = 0
            while (p < numTerms) {
              val tb = termBytes(p)
              if (tb.length == i - start) {
                var j = 0
                while (j < tb.length && tb(j) == bs(start + j)) j += 1
                if (j == tb.length) out(p + 1) += 1L
              }
              p += 1
            }
          }
        }
        if (ws(bs(n - 1))) out(0) += 1L
      }
      new GenericArrayData(out)
    }

    override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
      nullSafeCodeGen(ctx, ev, input => {
        val tRef = ctx.addReferenceObj("termStatsTerms", termBytes, "byte[][]")
        val bs = ctx.freshName("bs")
        val out = ctx.freshName("out")
        val n = ctx.freshName("n")
        val i = ctx.freshName("i")
        val j = ctx.freshName("j")
        val p = ctx.freshName("p")
        val start = ctx.freshName("start")
        val tb = ctx.freshName("tb")
        // the ws predicate inlined as a bitmask test: bytes 9-13 and 32
        def ws(b: String) = s"($b == 32 || ($b >= 9 && $b <= 13))"
        s"""byte[] $bs = $input.toLowerCase().trim().getBytes();
           |int $n = $bs.length;
           |long[] $out = new long[${numTerms + 1}];
           |if ($n == 0) { $out[0] = 1L; } else {
           |  if (${ws(s"$bs[0]")}) $out[0]++;
           |  int $i = 0;
           |  while ($i < $n) {
           |    while ($i < $n && ${ws(s"$bs[$i]")}) $i++;
           |    if ($i < $n) {
           |      int $start = $i;
           |      while ($i < $n && !${ws(s"$bs[$i]")}) $i++;
           |      $out[0]++;
           |      for (int $p = 0; $p < $numTerms; $p++) {
           |        byte[] $tb = $tRef[$p];
           |        if ($tb.length == $i - $start) {
           |          int $j = 0;
           |          while ($j < $tb.length && $tb[$j] == $bs[$start + $j]) $j++;
           |          if ($j == $tb.length) $out[$p + 1]++;
           |        }
           |      }
           |    }
           |  }
           |  if (${ws(s"$bs[$n - 1]")}) $out[0]++;
           |}
           |${ev.value} = new org.apache.spark.sql.catalyst.util.GenericArrayData($out);""".stripMargin
      })

    override protected def withNewChildInternal(newChild: Expression): Expression =
      copy(child = newChild)
  }

  /** Term-stats column over a raw text column. */
  def termStats(text: Column, terms: Seq[String]): Column =
    GraftColumnBridge.column(TermStats(
      GraftColumnBridge.expression(text), terms.toList))
}
