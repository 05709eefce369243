package graft.plans

import org.apache.spark.sql.Column
import org.apache.spark.sql.catalyst.expressions.codegen.CodegenFallback
import org.apache.spark.sql.catalyst.expressions.{Expression, UnaryExpression}
import org.apache.spark.sql.catalyst.util.{ArrayData, GenericArrayData}
import org.apache.spark.sql.graftbridge.ColumnBridge
import org.apache.spark.sql.types.{ArrayType, DataType, StringType}
import org.apache.spark.unsafe.types.UTF8String

/** Word n-gram shingles of a text column in one per-row loop.
  *
  * The composable formulation — `transform(sequence(1, size-2), i =>
  * concat_ws(" ", element_at(toks,i), …))` — interprets a lambda per
  * shingle (≈6 µs each; dominated the MinHash bench at sf0.1). One
  * `eval` per ROW with a tight Java tokenizer is ~100× less overhead
  * and CodegenFallback costs one virtual call per row, not per element.
  *
  * Semantics are identical to the verified HOF version (and the DuckDB
  * oracle): tokens = `trim(text)` split on runs of whitespace; shingle i
  * = tokens[i..i+n-1] joined by single spaces; fewer than n tokens → [].
  * Lowercasing is the caller's job (compose with `lower`).
  */
case class WordShingles(child: Expression, n: Int)
    extends UnaryExpression with CodegenFallback {

  override def dataType: DataType = ArrayType(StringType, containsNull = false)

  override protected def nullSafeEval(input: Any): Any = {
    val toks = input.asInstanceOf[UTF8String].toString.trim.split("\\s+")
    if (toks.length < n) new GenericArrayData(Array.empty[Any])
    else {
      val out = new Array[Any](toks.length - n + 1)
      val sb = new java.lang.StringBuilder(64)
      var i = 0
      while (i < toks.length - n + 1) {
        sb.setLength(0)
        var k = 0
        while (k < n) { if (k > 0) sb.append(' '); sb.append(toks(i + k)); k += 1 }
        out(i) = UTF8String.fromString(sb.toString)
        i += 1
      }
      new GenericArrayData(out)
    }
  }

  override protected def withNewChildInternal(c: Expression): WordShingles = copy(child = c)
}

object WordShingles {
  def shingles(text: Column, n: Int): Column =
    ColumnBridge.column(WordShingles(ColumnBridge.expression(text), n))
}
