package graft.plans

import org.apache.spark.sql.Column
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.catalyst.expressions.{BinaryExpression, Expression, ExpectsInputTypes}
import org.apache.spark.sql.catalyst.util.ArrayData
import org.apache.spark.sql.graftbridge.ColumnBridge
import org.apache.spark.sql.types.{ArrayType, DataType, DoubleType, FloatType, LongType}

/** Native dot product over two `array<float>` columns, with whole-stage
  * codegen (SURVEY §4: custom `Expression` where built-ins can't express
  * the op efficiently).
  *
  * Spark's composable alternative — `aggregate(zip_with(a, b, _*_), 0d,
  * _+_)` — evaluates an interpreted lambda per element with per-element
  * row allocation; on 64-dim embeddings inside an O(N·M) similarity join
  * that interpretation dominated the benchmark (sim1/sim2/d5: 22–346 s at
  * sf0.1). This expression is a tight codegen'd loop: same strict
  * left-to-right double accumulation, so results are BIT-IDENTICAL to
  * both the HOF formulation and the DuckDB oracle's list_reduce fold —
  * only faster.
  */
case class FloatDotProduct(left: Expression, right: Expression)
    extends BinaryExpression with ExpectsInputTypes {

  override def dataType: DataType = DoubleType

  // Declared input types (ADVICE r9): without these, a mistyped call —
  // array<double> where array<float> is expected — reads raw ArrayData
  // with the wrong accessor and silently returns garbage; with them the
  // call fails (or coerces) at ANALYSIS time instead.
  override def inputTypes = Seq(ArrayType(FloatType), ArrayType(FloatType))

  override protected def nullSafeEval(a: Any, b: Any): Any = {
    val x = a.asInstanceOf[ArrayData]
    val y = b.asInstanceOf[ArrayData]
    val n = math.min(x.numElements(), y.numElements())
    var s = 0.0
    var i = 0
    while (i < n) { s += x.getFloat(i).toDouble * y.getFloat(i).toDouble; i += 1 }
    s
  }

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    nullSafeCodeGen(ctx, ev, (a, b) => {
      val n = ctx.freshName("n")
      val i = ctx.freshName("i")
      val s = ctx.freshName("s")
      s"""
         |int $n = java.lang.Math.min($a.numElements(), $b.numElements());
         |double $s = 0.0;
         |for (int $i = 0; $i < $n; $i++) {
         |  $s += (double) $a.getFloat($i) * (double) $b.getFloat($i);
         |}
         |${ev.value} = $s;
       """.stripMargin
    })

  override protected def withNewChildrenInternal(l: Expression, r: Expression): FloatDotProduct =
    copy(left = l, right = r)
}

object FloatDotProduct {
  /** Column-level entry point. */
  def dot(a: Column, b: Column): Column =
    ColumnBridge.column(FloatDotProduct(ColumnBridge.expression(a), ColumnBridge.expression(b)))
}

/** Dot product of a precomputed `array<double>` query table against an
  * `array<long>` code vector — the hot per-pair fold of the SQ8
  * asymmetric-distance scan (Similarity.topKIvfSq). Same strict
  * left-to-right double accumulation contract as [[FloatDotProduct]],
  * so the DuckDB oracle's list_reduce fold reproduces it bit-for-bit;
  * codegen'd because it runs once per (query, candidate) pair inside
  * the cell-restricted join, where an interpreted HOF would dominate
  * (the sim1/sim2 lesson documented above). */
case class CodeDotProduct(left: Expression, right: Expression)
    extends BinaryExpression with ExpectsInputTypes {

  override def dataType: DataType = DoubleType

  // Same analysis-time guard as [[FloatDotProduct]]: the ADC fold reads
  // getDouble/getLong directly, so mismatched element types must be
  // rejected before execution, not silently misread.
  override def inputTypes = Seq(ArrayType(DoubleType), ArrayType(LongType))

  override protected def nullSafeEval(a: Any, b: Any): Any = {
    val x = a.asInstanceOf[ArrayData]
    val y = b.asInstanceOf[ArrayData]
    val n = math.min(x.numElements(), y.numElements())
    var s = 0.0
    var i = 0
    while (i < n) { s += x.getDouble(i) * y.getLong(i).toDouble; i += 1 }
    s
  }

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    nullSafeCodeGen(ctx, ev, (a, b) => {
      val n = ctx.freshName("n")
      val i = ctx.freshName("i")
      val s = ctx.freshName("s")
      s"""
         |int $n = java.lang.Math.min($a.numElements(), $b.numElements());
         |double $s = 0.0;
         |for (int $i = 0; $i < $n; $i++) {
         |  $s += $a.getDouble($i) * (double) $b.getLong($i);
         |}
         |${ev.value} = $s;
       """.stripMargin
    })

  override protected def withNewChildrenInternal(l: Expression, r: Expression): CodeDotProduct =
    copy(left = l, right = r)
}

object CodeDotProduct {
  def dot(a: Column, b: Column): Column =
    ColumnBridge.column(CodeDotProduct(ColumnBridge.expression(a), ColumnBridge.expression(b)))
}
