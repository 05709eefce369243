package graft.plans

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.catalyst.InternalRow
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.catalyst.expressions.aggregate.TypedImperativeAggregate
import org.apache.spark.sql.catalyst.analysis.TypeCheckResult
import org.apache.spark.sql.catalyst.expressions.{Expression, UnaryExpression}
import org.apache.spark.sql.catalyst.util.GenericArrayData
import org.apache.spark.sql.functions._
import org.apache.spark.sql.graftbridge.ColumnBridge
import org.apache.spark.sql.types._
import org.apache.spark.unsafe.types.UTF8String
import org.apache.spark.util.sketch.CountMinSketch

/** Mergeable sketch aggregates — the 100 TB siblings of the exact
  * grouped-quantile (sk1) and exact heavy-hitter (tx5) queries, built on
  * the BitmapDistinct TypedImperativeAggregate template: per-partition
  * update, fixed-size binary partial across the shuffle, associative+
  * commutative merge.
  *
  * Both sketches are ADDITIVE-COUNTER designs, so merge is elementwise
  * sum — merge-order independent, which is what makes them safe under a
  * hash-compare oracle (order-sensitive sketches like Misra-Gries or GK
  * produce run-dependent results under Spark's nondeterministic partial
  * merge order).
  *
  * Reference anchor: the reference's stats queries run exact SQL at its
  * single-node scale (`ddb/src/members.rs` aggregate shapes); these are
  * the distributed-scale replacements, with sk1/tx5 as their oracles.
  */
object Sketches {

  /** Grouped quantiles from a fixed-bin histogram:
    * one array<long> of bin counts per group crosses the shuffle
    * regardless of group size. Exact whenever values land on the bin
    * grid (integer-valued measures with binWidth=1 — the fixture); off-
    * grid values degrade gracefully to ±binWidth/2 accuracy, the classic
    * binned-quantile trade at 100 TB. */
  def histQuantiles(c: Column, lo: Double, binWidth: Double, bins: Int,
      probs: Seq[Double]): Column =
    ColumnBridge.column(HistogramQuantile(ColumnBridge.expression(c),
      lo, binWidth, bins, probs).toAggregateExpression())

  /** Heavy hitters via count-min sketch: ONE fixed-size sketch (built by
    * Spark's native `count_min_sketch` aggregate — additive counters,
    * elementwise-sum merge) crosses the shuffle for the whole corpus,
    * then the candidate side (distinct tokens — the vocabulary, orders
    * of magnitude smaller than the corpus) probes the sketch and keeps
    * the top k with the tx5 tie-break (count desc, token asc).
    *
    * The sketch is an aggregate RESULT (a few hundred KB), so holding it
    * on the driver and re-embedding it in the probe expression is the
    * broadcast-small-side pattern, not a data collect. Estimates are
    * exact when no token pair collides in every sketch row — guaranteed
    * deterministically for a fixture-sized vocabulary at eps=1e-4, and
    * property-checked against the exact twin. */
  def cmTopTokens(toks: DataFrame, token: Column, k: Int,
      eps: Double = 1e-4, confidence: Double = 0.99, seed: Int = 42): DataFrame = {
    val skBytes = toks
      .agg(count_min_sketch(token, lit(eps), lit(confidence), lit(seed)))
      .head().getAs[Array[Byte]](0)
    val spark = toks.sparkSession
    // Spark's count_min_sketch aggregate yields NULL over zero rows —
    // an empty corpus has no heavy hitters, not a readFrom NPE
    if (skBytes == null) {
      return spark.createDataFrame(
        spark.sparkContext.emptyRDD[org.apache.spark.sql.Row],
        StructType(Seq(StructField("token", StringType), StructField("n", LongType, nullable = false))))
    }
    val est = ColumnBridge.column(
      CmEstimate(ColumnBridge.expression(col("token")), skBytes))
    toks.select(token.as("token")).distinct()
      .select(col("token"), est.as("n"))
      .orderBy(col("n").desc, col("token").asc)
      .limit(k)
  }
}

/** Mergeable binned-quantile aggregate: buffer = bins additive counters;
  * eval interpolates each requested quantile with the quantile_cont /
  * percentile convention (lower + (upper-lower)*frac at rank p*(n-1)),
  * reading order statistics off the cumulative counts. */
case class HistogramQuantile(
    child: Expression,
    lo: Double,
    binWidth: Double,
    bins: Int,
    probs: Seq[Double],
    mutableAggBufferOffset: Int = 0,
    inputAggBufferOffset: Int = 0)
  extends TypedImperativeAggregate[Array[Long]] {

  override def children: Seq[Expression] = Seq(child)
  // eval yields null for an all-NULL / empty group, so the schema must
  // say so — codegen trusts nullable=false and would corrupt the row
  override def nullable: Boolean = true
  override def dataType: DataType = ArrayType(DoubleType, containsNull = false)
  // analysis-time error instead of a runtime ClassCastException when the
  // measure column isn't DOUBLE (AbstractDataType is private[sql], so
  // this is the checkInputDataTypes spelling of ExpectsInputTypes)
  override def checkInputDataTypes(): TypeCheckResult =
    if (child.dataType == DoubleType) TypeCheckResult.TypeCheckSuccess
    else TypeCheckResult.TypeCheckFailure(
      s"histogram_quantile requires a DOUBLE measure, got ${child.dataType.sql}")

  override def createAggregationBuffer(): Array[Long] = new Array[Long](bins)

  override def update(buf: Array[Long], input: InternalRow): Array[Long] = {
    val v = child.eval(input)
    if (v != null) {
      val x = v.asInstanceOf[Double]
      val idx = math.floor((x - lo) / binWidth).toInt
      require(idx >= 0 && idx < bins,
        s"HistogramQuantile: value $x outside [$lo, ${lo + bins * binWidth})")
      buf(idx) += 1
    }
    buf
  }

  override def merge(buf: Array[Long], other: Array[Long]): Array[Long] = {
    var i = 0
    while (i < bins) { buf(i) += other(i); i += 1 }
    buf
  }

  /** Value of the 0-based k-th order statistic: the start of the bin
    * holding it (exact for on-grid values). */
  private def valueAt(buf: Array[Long], k: Long): Double = {
    var cum = 0L
    var i = 0
    while (i < bins) {
      cum += buf(i)
      if (cum > k) return lo + i * binWidth
      i += 1
    }
    throw new IllegalStateException(s"rank $k beyond histogram total $cum")
  }

  override def eval(buf: Array[Long]): Any = {
    var n = 0L
    var i = 0
    while (i < bins) { n += buf(i); i += 1 }
    if (n == 0) null
    else {
      val out = probs.map { p =>
        val h = p * (n - 1)
        val loK = math.floor(h).toLong
        val frac = h - loK
        val vLo = valueAt(buf, loK)
        val vHi = if (frac == 0.0) vLo else valueAt(buf, loK + 1)
        vLo + (vHi - vLo) * frac
      }
      new GenericArrayData(out.toArray)
    }
  }

  override def serialize(buf: Array[Long]): Array[Byte] = {
    val bb = java.nio.ByteBuffer.allocate(bins * 8)
    bb.asLongBuffer().put(buf)
    bb.array()
  }

  override def deserialize(bytes: Array[Byte]): Array[Long] = {
    val out = new Array[Long](bins)
    java.nio.ByteBuffer.wrap(bytes).asLongBuffer().get(out)
    out
  }

  override def withNewMutableAggBufferOffset(newOffset: Int): HistogramQuantile =
    copy(mutableAggBufferOffset = newOffset)
  override def withNewInputAggBufferOffset(newOffset: Int): HistogramQuantile =
    copy(inputAggBufferOffset = newOffset)
  override protected def withNewChildrenInternal(
      newChildren: IndexedSeq[Expression]): HistogramQuantile =
    copy(child = newChildren.head)
}

/** Scalar probe into a serialized count-min sketch: estimated count of the
  * string item. The sketch deserializes once per executor (transient
  * lazy), not per row; generated code calls back into the instance via a
  * reference object, keeping the probe inside WholeStageCodegen. */
case class CmEstimate(child: Expression, sketchBytes: Array[Byte])
    extends UnaryExpression {
  override def dataType: DataType = LongType

  @transient private lazy val sketch: CountMinSketch =
    CountMinSketch.readFrom(new java.io.ByteArrayInputStream(sketchBytes))

  def estimate(item: UTF8String): Long = sketch.estimateCount(item.toString)

  override protected def nullSafeEval(input: Any): Any =
    java.lang.Long.valueOf(estimate(input.asInstanceOf[UTF8String]))

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode = {
    val ref = ctx.addReferenceObj("cmEstimate", this, classOf[CmEstimate].getName)
    nullSafeCodeGen(ctx, ev, in => s"${ev.value} = $ref.estimate($in);")
  }

  override protected def withNewChildInternal(c: Expression): CmEstimate = copy(child = c)

  // Array[Byte] fields get reference equality from the case class, which
  // defeats expression canonicalization — compare sketch contents
  override def equals(o: Any): Boolean = o match {
    case c: CmEstimate =>
      child == c.child && java.util.Arrays.equals(sketchBytes, c.sketchBytes)
    case _ => false
  }
  override def hashCode(): Int =
    31 * child.hashCode() + java.util.Arrays.hashCode(sketchBytes)
}
