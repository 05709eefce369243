package graft.plans

import org.apache.spark.sql.Column
import org.apache.spark.sql.graftbridge.ColumnBridge
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.catalyst.expressions.{Expression, UnaryExpression}
import org.apache.spark.sql.types.{DataType, StringType}
import org.apache.spark.unsafe.types.UTF8String

/** Text canonicalization for corpus preparation: Unicode normalization
  * (NFC by default — composed/decomposed sequences of the same grapheme
  * become byte-identical, so hashing/dedup stop seeing "café" twice),
  * optional case folding, and whitespace-run collapse + trim.
  *
  * Spark has no built-in Unicode normalizer, so this is a native
  * Catalyst expression with real `doGenCode` (the TextHashExprs static
  * kernel pattern): the whole-stage-codegen'd call dispatches straight
  * into the JVM's `java.text.Normalizer` with zero interpreted-lambda
  * overhead, and a fast ASCII pre-scan skips normalization entirely for
  * the common case (NFC over ASCII is the identity).
  */
object TextNorm {

  /** Static kernel, invoked from generated code. `form` is the
    * java.text.Normalizer.Form ordinal (NFC=1 — see formOf). */
  def normalizeKernel(input: UTF8String, form: Int, lower: Boolean,
      collapseWs: Boolean): UTF8String = {
    var s = input.toString
    if (!isAscii(s)) {
      s = java.text.Normalizer.normalize(s, FORMS(form))
    }
    if (collapseWs) {
      s = s.trim.replaceAll("\\s+", " ")
    }
    var out = UTF8String.fromString(s)
    if (lower) out = out.toLowerCase
    out
  }

  private val FORMS = java.text.Normalizer.Form.values()

  def formOf(name: String): Int = {
    val f = java.text.Normalizer.Form.valueOf(name.toUpperCase)
    FORMS.indexOf(f)
  }

  private def isAscii(s: String): Boolean = {
    var i = 0
    while (i < s.length) {
      if (s.charAt(i) >= 0x80) return false
      i += 1
    }
    true
  }
}

/** Canonicalize a string column: Unicode-normalize (form = "NFC" |
  * "NFD" | "NFKC" | "NFKD"), optionally lowercase and collapse
  * whitespace runs. */
case class NormalizeText(child: Expression, form: String,
    lower: Boolean, collapseWs: Boolean) extends UnaryExpression {
  private val formIdx = TextNorm.formOf(form)

  override def dataType: DataType = StringType

  override protected def nullSafeEval(input: Any): Any =
    TextNorm.normalizeKernel(input.asInstanceOf[UTF8String], formIdx, lower, collapseWs)

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    nullSafeCodeGen(ctx, ev, in =>
      s"${ev.value} = graft.plans.TextNorm.normalizeKernel($in, $formIdx, $lower, $collapseWs);")

  override protected def withNewChildInternal(c: Expression): NormalizeText = copy(child = c)
}

object TextNormExpr {
  def normalize(text: Column, form: String = "NFC",
      lower: Boolean = false, collapseWs: Boolean = true): Column =
    ColumnBridge.column(NormalizeText(ColumnBridge.expression(text), form, lower, collapseWs))
}
