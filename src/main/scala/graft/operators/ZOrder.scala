package graft.operators

import org.apache.spark.sql.Column
import org.apache.spark.sql.functions._

/** Z-order (Morton) clustering keys — multi-dimensional data layout.
  *
  * Sorting a table by one column makes min/max file statistics prune
  * filters on THAT column only; a box query on the other dimension
  * scans everything. Interleaving the bits of two dimensions into one
  * sort key keeps BOTH dimensions' value ranges small within every
  * file (each file covers a z-curve segment ≈ a small rectangle), so
  * parquet footer stats prune selective filters on either column —
  * the layout trick behind Delta/Iceberg `ZORDER BY`, expressed here
  * as a plain deterministic integer expression usable with
  * [[graft.sources.Layout.writeShards]] or any `sortWithinPartitions`.
  *
  * Pure shift/mask arithmetic (no UDF, codegen-friendly, and an exact
  * DuckDB twin for the oracle). Inputs must be non-negative and below
  * 2^31 so the interleaved key stays positive in a signed long —
  * enforced with a range guard that nulls out-of-range rows rather
  * than silently folding their order.
  */
object ZOrder {

  private val Masks: Seq[(Int, Long)] = Seq(
    16 -> 0x0000FFFF0000FFFFL,
    8  -> 0x00FF00FF00FF00FFL,
    4  -> 0x0F0F0F0F0F0F0F0FL,
    2  -> 0x3333333333333333L,
    1  -> 0x5555555555555555L)

  /** Spread the low 32 bits of `c` over the even bit positions. */
  private def spread(c: Column): Column =
    Masks.foldLeft(c.cast("long")) { case (v, (s, m)) =>
      v.bitwiseOR(shiftleft(v, s)).bitwiseAND(lit(m))
    }

  private def spreadSql(e: String): String =
    Masks.foldLeft(s"CAST($e AS BIGINT)") { case (v, (s, m)) =>
      s"((($v) | (($v) << $s)) & $m)"
    }

  /** The 2-D Morton key: x in even bits, y in odd bits. Out-of-range
    * input (negative or ≥ 2^31) yields NULL.
    */
  def zValue(x: Column, y: Column): Column = {
    val ok = x >= 0 && x < 2147483648L && y >= 0 && y < 2147483648L
    when(ok, spread(x).bitwiseOR(shiftleft(spread(y), 1)))
  }

  /** DuckDB twin of [[zValue]]. */
  def zValueSql(xExpr: String, yExpr: String): String =
    s"""CASE WHEN ($xExpr) >= 0 AND ($xExpr) < 2147483648
       | AND ($yExpr) >= 0 AND ($yExpr) < 2147483648
       | THEN (${spreadSql(xExpr)}) | ((${spreadSql(yExpr)}) << 1)
       | ELSE NULL END""".stripMargin
}
