package graft.text

import org.apache.spark.sql.Column
import org.apache.spark.sql.catalyst.expressions.{Expression, UnaryExpression}
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.types.{DataType, StringType}
import org.apache.spark.unsafe.types.UTF8String

import org.apache.spark.sql.GraftColumnBridge

/** Unicode NFC normalization as a codegen'd Catalyst expression.
  *
  * Why this exists: every hash-keyed stage in the engine — exact
  * dedup fingerprints, shingle/MinHash signatures, sha256 sampling
  * keys, BPE word histograms — treats byte-identical strings as
  * identical and NOTHING ELSE. The same visible text arrives from
  * real extractors in composed (é = U+00E9) and decomposed
  * (e + U+0301) forms, which hash apart and silently survive dedup
  * as "distinct" documents. Normalizing to NFC before any hashing
  * stage closes that hole; it belongs in the engine (not ad-hoc UDFs)
  * because a Scala UDF would break codegen and carry
  * serialization cost per row — this expression stays inside
  * whole-stage codegen like the other [[TextKernels]].
  *
  * Spark itself has no normalization function (SPARK-35353 lineage);
  * DuckDB's `nfc_normalize` is the oracle twin. `java.text.Normalizer`
  * implements Unicode UAX #15 canonical composition — both engines
  * target the same normal form, pinned by the gate on planted
  * composed/decomposed fixtures.
  */
object UnicodeNorm {

  case class NfcNormalize(child: Expression)
      extends UnaryExpression {

    override def dataType: DataType = StringType
    override def prettyName: String = "nfc_normalize"

    private def norm(s: UTF8String): UTF8String =
      UTF8String.fromString(java.text.Normalizer.normalize(
        s.toString, java.text.Normalizer.Form.NFC))

    override def nullSafeEval(input: Any): Any =
      norm(input.asInstanceOf[UTF8String])

    override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
      nullSafeCodeGen(ctx, ev, input => {
        s"""${ev.value} = org.apache.spark.unsafe.types.UTF8String.fromString(
           |  java.text.Normalizer.normalize($input.toString(),
           |    java.text.Normalizer.Form.NFC));""".stripMargin
      })

    override protected def withNewChildInternal(newChild: Expression): Expression =
      copy(child = newChild)
  }

  /** NFC-normalize a string column (codegen'd; null-safe). */
  def nfc(c: Column): Column =
    GraftColumnBridge.column(NfcNormalize(GraftColumnBridge.expression(c)))
}
