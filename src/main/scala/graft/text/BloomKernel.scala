package graft.text

import org.apache.spark.sql.{Column, GraftColumnBridge}
import org.apache.spark.sql.catalyst.expressions.{Expression, UnaryExpression}
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.types.{BooleanType, DataType}
import org.apache.spark.util.sketch.BloomFilter

/** Codegen Bloom-filter membership probe.
  *
  * [[BloomMightContainLong]] tests a `long` hash column against a
  * driver-built [[org.apache.spark.util.sketch.BloomFilter]] (Spark's
  * public sketch library — the same implementation backing
  * `DataFrameStatFunctions.bloomFilter` and AQE's runtime row-group
  * filters). The filter object ships to executors once via the
  * closure/reference mechanism (`addReferenceObj`), NOT per row, and
  * the probe stays inside whole-stage codegen, so the prefilter adds
  * one hash + O(k) bit tests per row to an otherwise unchanged scan.
  *
  * May return false positives by construction, NEVER false negatives —
  * callers must pair it with an exact verify stage when exact output
  * is required (see [[TextAnalysis.contaminationHitsBloom]]).
  */
object BloomKernel {

  case class BloomMightContainLong(child: Expression, filter: BloomFilter)
      extends UnaryExpression {

    override def dataType: DataType = BooleanType
    override def prettyName: String = "bloom_might_contain_long"

    override def nullSafeEval(input: Any): Any =
      filter.mightContainLong(input.asInstanceOf[Long])

    override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
      nullSafeCodeGen(ctx, ev, input => {
        val fRef = ctx.addReferenceObj("bloomFilter", filter,
          "org.apache.spark.util.sketch.BloomFilter")
        s"${ev.value} = $fRef.mightContainLong($input);"
      })

    override protected def withNewChildInternal(newChild: Expression): Expression =
      copy(child = newChild)
  }

  /** Membership-probe column over a `long` hash column. */
  def mightContainLong(hash: Column, filter: BloomFilter): Column =
    GraftColumnBridge.column(BloomMightContainLong(
      GraftColumnBridge.expression(hash), filter))
}
