package graft.plans

import org.apache.spark.sql.Column
import org.apache.spark.sql.graftbridge.ColumnBridge
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.catalyst.expressions.{Expression, UnaryExpression}
import org.apache.spark.sql.types.{BinaryType, DataType, StringType}
import org.apache.spark.unsafe.types.UTF8String

/** Column-level gzip plumbing (r18) — the `.xml.gz` sitemap path and
  * any other per-value-compressed payload that arrives INSIDE a column
  * rather than as a file (files ride WarcGzInputFormat / the codec'd
  * file sources instead). Both directions are codegen'd native
  * expressions over [[graft.sources.WarcSource]]'s bounded RFC 1952
  * kernels: decode degrades a malformed or oversized stream to NULL
  * (counted, never garbled or thrown mid-task), encode emits the
  * deterministic single-member form (fixed header: MTIME 0, OS 255) so
  * fixture bytes are bit-reproducible. */
object GzipKernels {
  /** UTF-8 text of one gzip member, or null on malformed/oversized. */
  def gunzipText(b: Array[Byte]): UTF8String =
    graft.sources.WarcSource.gunzip(b)
      .map(UTF8String.fromBytes)
      .orNull

  /** One deterministic gzip member over the string's UTF-8 bytes. */
  def gzipBytes(s: UTF8String): Array[Byte] =
    graft.sources.WarcSource.gzipMember(s.getBytes)
}

/** Decode one gzip member (binary) to its UTF-8 text; NULL in or
  * malformed stream → NULL. */
case class GunzipText(child: Expression) extends UnaryExpression {
  override def dataType: DataType = StringType
  override def nullable: Boolean = true

  override protected def nullSafeEval(input: Any): Any =
    GzipKernels.gunzipText(input.asInstanceOf[Array[Byte]])

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    nullSafeCodeGen(ctx, ev, in =>
      s"""${ev.value} = graft.plans.GzipKernels.gunzipText($in);
         |if (${ev.value} == null) { ${ev.isNull} = true; }""".stripMargin)

  override protected def withNewChildInternal(c: Expression): GunzipText = copy(child = c)
}

/** Compress a string column's UTF-8 bytes as one deterministic gzip
  * member. NULL in, NULL out. */
case class GzipBytes(child: Expression) extends UnaryExpression {
  override def dataType: DataType = BinaryType

  override protected def nullSafeEval(input: Any): Any =
    GzipKernels.gzipBytes(input.asInstanceOf[UTF8String])

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    nullSafeCodeGen(ctx, ev, in =>
      s"${ev.value} = graft.plans.GzipKernels.gzipBytes($in);")

  override protected def withNewChildInternal(c: Expression): GzipBytes = copy(child = c)
}

object GzipExprs {
  /** gzip member (binary) → UTF-8 text; NULL on malformed. */
  def gunzipText(b: Column): Column =
    ColumnBridge.column(GunzipText(ColumnBridge.expression(b)))

  /** string → deterministic gzip member bytes. */
  def gzipBytes(s: Column): Column =
    ColumnBridge.column(GzipBytes(ColumnBridge.expression(s)))
}
