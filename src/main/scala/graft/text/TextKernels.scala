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

  /** [[DocStats]] fuses EVERY per-document statistic the quality /
    * language-ID / curation path needs into one expression evaluating
    * its input once: `[ntok_ws, non_ws_chars, alpha_chars, punct_chars,
    * hits_group_0, …]`. Replaces one regex or higher-order-function
    * pass PER statistic (none of which enter whole-stage codegen, and
    * each of which re-materializes `split(lower(trim(text)))`).
    *
    * Two byte scans over the one evaluated child:
    *  - char scan on `trim(input)` (0x20-only trim, same as Spark's
    *    `trim`): code points = non-continuation bytes; `alpha` counts
    *    bytes in `[A-Za-z]` (exact for `regexp_count(c, "[A-Za-z]")` on
    *    the UNTRIMMED input — 0x20 is not alpha, and ASCII bytes never
    *    occur inside multi-byte UTF-8 chars); `punct` = code points −
    *    alpha − digits − ws chars, the char count of
    *    `[^A-Za-z0-9\s]` (any non-ASCII code point is punct — also
    *    trim-invariant since trim removes equal counts from the cp and
    *    ws terms); `non_ws_chars` = code points − ws chars, the length
    *    of `regexp_replace(trim(c), "\\s+", "")`.
    *  - token scan on `lower(trim(input))` with the exact [[TermStats]]
    *    tokenization contract, EXCEPT the empty string yields
    *    `ntok_ws = 0` ([[TextAnalysis.nTokensWs]]'s guard), not the
    *    `[""]` singleton; `hits_group_g` counts tokens byte-equal to
    *    any of group g's terms (groups are distinct-string sets, so
    *    this equals `size(filter(tokens, _ ∈ set))`).
    */
  case class DocStats(child: Expression, groups: Seq[Seq[String]])
      extends UnaryExpression {

    private val numGroups = groups.length
    // flattened (group index, term bytes) pairs for the match loop
    @transient private lazy val termGroup: Array[Int] =
      groups.zipWithIndex.flatMap { case (g, i) => g.map(_ => i) }.toArray
    @transient private lazy val termBytes: Array[Array[Byte]] =
      groups.flatten.map(_.getBytes("UTF-8")).toArray

    override def dataType: DataType = ArrayType(LongType, containsNull = false)
    override def prettyName: String = "doc_stats"

    override def nullSafeEval(input: Any): Any =
      evalWithMemo(input.asInstanceOf[UTF8String])

    /** Single entry point for the interpreted AND codegen paths,
      * fronted by the per-thread memo ([[TextKernels.docStatsMemo]]):
      * a quality/length screen re-evaluates this kernel MANY times per
      * row — filter pushdown re-inlines the expression through staged
      * projections, FilterExec has no subexpression elimination, and
      * conditional CASE branches (the langPick comparisons) are
      * excluded from codegen CSE. Measured 34× on the curation screen
      * at 10× data before the memo. All of one row's evaluations run
      * consecutively on one task thread, so one (groups, text, stats)
      * slot per thread collapses them to content-equality checks. The
      * stored key is a DEFENSIVE COPY (parquet readers reuse
      * UTF8String buffers across rows); a mutated buffer then simply
      * misses and recomputes — the memo can never serve wrong stats.
      */
    def evalWithMemo(raw: UTF8String): AnyRef = {
      val slot = TextKernels.docStatsMemo.get()
      if (slot(0) == groups && raw.equals(slot(1).asInstanceOf[UTF8String]))
        slot(2)
      else {
        val res = compute(raw)
        // size-capped: the slot pins its key for the thread's lifetime,
        // and a multi-MB outlier document is not worth holding per task
        // thread (it just recomputes — the memo can only SKIP work,
        // never change an answer). The defensive copy on a miss costs
        // one memcpy next to compute's two full scans.
        if (raw.numBytes <= TextKernels.DocStatsMemoMaxBytes) {
          slot(0) = groups
          slot(1) = raw.copy()
          slot(2) = res
        }
        res
      }
    }

    private def compute(raw: UTF8String): AnyRef = {
      val out = new Array[Long](4 + numGroups)
      def ws(b: Byte): Boolean =
        b == 32 || b == 9 || b == 10 || b == 11 || b == 12 || b == 13
      // char scan over trim(input)
      val cs = raw.trim.getBytes
      var cp = 0L; var wsc = 0L; var alpha = 0L; var digit = 0L
      var i = 0
      while (i < cs.length) {
        val b = cs(i)
        if ((b & 0xC0) != 0x80) cp += 1L
        if (ws(b)) wsc += 1L
        else if ((b >= 'A' && b <= 'Z') || (b >= 'a' && b <= 'z')) alpha += 1L
        else if (b >= '0' && b <= '9') digit += 1L
        i += 1
      }
      out(1) = cp - wsc
      out(2) = alpha
      out(3) = cp - wsc - alpha - digit
      // token scan over lower(trim(input))
      val bs = raw.toLowerCase.trim.getBytes
      val n = bs.length
      if (n > 0) {
        if (ws(bs(0))) out(0) += 1L
        i = 0
        while (i < n) {
          while (i < n && ws(bs(i))) i += 1
          if (i < n) {
            val start = i
            while (i < n && !ws(bs(i))) i += 1
            out(0) += 1L
            var p = 0
            while (p < termBytes.length) {
              val tb = termBytes(p)
              if (tb.length == i - start) {
                var j = 0
                while (j < tb.length && tb(j) == bs(start + j)) j += 1
                if (j == tb.length) out(4 + termGroup(p)) += 1L
              }
              p += 1
            }
          }
        }
        if (ws(bs(n - 1))) out(0) += 1L
      }
      new GenericArrayData(out)
    }

    // the generated code routes through the SAME memoized entry point
    // as the interpreted path (one virtual call per eval — noise next
    // to the O(text) scan it usually skips). Inlining the scan here,
    // as pre-r12, made every un-CSE'd reference pay the full kernel.
    override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
      nullSafeCodeGen(ctx, ev, input => {
        val ref = ctx.addReferenceObj("docStatsKernel", this,
          classOf[DocStats].getName)
        s"""${ev.value} = (org.apache.spark.sql.catalyst.util.ArrayData)
           |  $ref.evalWithMemo($input);""".stripMargin
      })

    override protected def withNewChildInternal(newChild: Expression): Expression =
      copy(child = newChild)
  }

  /** Per-thread single-entry memo for [[DocStats]]: (groups, text
    * copy, stats). OBJECT-level so every DocStats instance in a plan
    * shares it — instance-level state could never hit, since each
    * reference in the expression tree is its own instance. One slot
    * suffices: evaluations interleave per row, not per column config
    * (and a config thrash only costs a recompute, never a wrong
    * answer).
    */
  private[text] val docStatsMemo: ThreadLocal[Array[AnyRef]] =
    new ThreadLocal[Array[AnyRef]] {
      override def initialValue(): Array[AnyRef] = new Array[AnyRef](3)
    }

  /** Largest text the memo will pin per thread (outliers recompute). */
  private[text] val DocStatsMemoMaxBytes = 4 * 1024 * 1024

  /** Doc-stats column: groups as Lists so separately built instances
    * `semanticEquals` (CSE across a projection's output columns relies
    * on it — the whole point is ONE scan feeding every statistic).
    */
  def docStats(text: Column, groups: Seq[Seq[String]]): Column =
    GraftColumnBridge.column(DocStats(
      GraftColumnBridge.expression(text), groups.map(_.toList).toList))
}
