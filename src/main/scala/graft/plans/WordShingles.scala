package graft.plans

import org.apache.spark.sql.Column
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.catalyst.expressions.{Expression, UnaryExpression}
import org.apache.spark.sql.graftbridge.ColumnBridge
import org.apache.spark.sql.types.{ArrayType, DataType, StringType}
import org.apache.spark.unsafe.types.UTF8String

/** Word n-gram shingles of a text column in one per-row loop.
  *
  * The composable formulation — `transform(sequence(1, size-2), i =>
  * concat_ws(" ", element_at(toks,i), …))` — interprets a lambda per
  * shingle (≈6 µs each; dominated the MinHash bench at sf0.1). One
  * call per ROW with a tight Java tokenizer is ~100× less overhead, and
  * real `doGenCode` (static-kernel call, FloatDotProduct pattern) keeps
  * the expression inside WholeStageCodegen.
  *
  * Semantics are identical to the verified HOF version (and the DuckDB
  * oracle): tokens = `trim(text)` split on runs of whitespace; shingle i
  * = tokens[i..i+n-1] joined by single spaces; fewer than n tokens → [].
  * Lowercasing is the caller's job (compose with `lower`).
  */
case class WordShingles(child: Expression, n: Int)
    extends UnaryExpression {

  override def dataType: DataType = ArrayType(StringType, containsNull = false)

  override protected def nullSafeEval(input: Any): Any =
    TextHash.shingleKernel(input.asInstanceOf[UTF8String], n)

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    nullSafeCodeGen(ctx, ev, in =>
      s"${ev.value} = graft.plans.TextHash.shingleKernel($in, $n);")

  override protected def withNewChildInternal(c: Expression): WordShingles = copy(child = c)
}

object WordShingles {
  def shingles(text: Column, n: Int): Column =
    ColumnBridge.column(WordShingles(ColumnBridge.expression(text), n))
}
