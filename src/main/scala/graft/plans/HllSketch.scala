package graft.plans

import org.apache.spark.sql.Column
import org.apache.spark.sql.catalyst.InternalRow
import org.apache.spark.sql.catalyst.expressions.Expression
import org.apache.spark.sql.catalyst.expressions.aggregate.TypedImperativeAggregate
import org.apache.spark.sql.graftbridge.ColumnBridge
import org.apache.spark.sql.types.{DataType, LongType}
import org.apache.spark.unsafe.types.UTF8String

/** HyperLogLog distinct-count sketch (Flajolet et al. 2007) as a
  * mergeable TypedImperativeAggregate — the approximate sibling of
  * [[BitmapDistinct]] for id spaces too large to bitmap (URLs, content
  * hashes, user agents at 100 TB). One 256-byte register array per group
  * crosses the shuffle regardless of cardinality; merge is a bytewise
  * max, so partial aggregation (map-side combine) applies and the
  * estimate is identical under any partitioning or merge order.
  *
  * Unlike library HLLs, the estimator here is INTEGER-EXACT so a SQL
  * oracle on another engine reproduces it bit-for-bit:
  *
  *  - the hashed value is the md5 of the key's string form — the repo's
  *    engine-portable hash convention (`md5(CAST(k AS VARCHAR))`);
  *  - register = first 2 hex chars (m = 256), w = next 15 hex chars
  *    (60 bits), rank rho = 61 − bitlength(w) (and 61 for w = 0);
  *  - the harmonic mean is computed over the exact rationals
  *    2^(61−rho) summed as a 128-bit integer (sum S ≤ 256·2^61), and
  *    the raw estimate is the single integer division
  *    `alphaNum·m²·2^61 div (alphaDen·S)` with alpha_256 = 0.7213 /
  *    (1 + 1.079/256) carried as the exact rational 1846528/2570790 —
  *    no float ever enters, so engines cannot disagree on rounding;
  *  - the small-range (linear-counting) correction `m·ln(m/V)` is the
  *    only transcendental step, so it is pre-tabulated once driver-side
  *    to micro precision ([[HllSketch.lcMicro]]) and both the aggregate
  *    and the generated oracle SQL read the SAME table — the k-means
  *    "model is driver state" contract applied to a constant.
  *
  * Standard single-estimator accuracy applies: ~1.04/sqrt(256) ≈ 6.5%
  * relative error. The child must be the md5 hex string of the key (use
  * [[HllSketch.estimate]] which applies the convention).
  */
case class HllSketch(
    child: Expression,
    mutableAggBufferOffset: Int = 0,
    inputAggBufferOffset: Int = 0)
  extends TypedImperativeAggregate[Array[Byte]] {

  override def children: Seq[Expression] = Seq(child)
  override def nullable: Boolean = false
  override def dataType: DataType = LongType

  override def createAggregationBuffer(): Array[Byte] = new Array[Byte](HllSketch.M)

  override def update(buf: Array[Byte], input: InternalRow): Array[Byte] = {
    val v = child.eval(input)
    if (v != null) {
      val hex = v.asInstanceOf[UTF8String].toString
      require(hex.length == 32, s"HllSketch: child must be a 32-char md5 hex, got '$hex'")
      val reg = Integer.parseInt(hex.substring(0, 2), 16)
      val w = java.lang.Long.parseLong(hex.substring(2, 17), 16)
      // w < 2^60, so nlz >= 4 and rho = nlz - 3 is the 1-based position
      // of the first set bit within the 60-bit window (61 when none).
      val rho = if (w == 0L) 61 else java.lang.Long.numberOfLeadingZeros(w) - 3
      if (rho > buf(reg)) buf(reg) = rho.toByte
    }
    buf
  }

  override def merge(buf: Array[Byte], other: Array[Byte]): Array[Byte] = {
    var j = 0
    while (j < HllSketch.M) {
      if (other(j) > buf(j)) buf(j) = other(j)
      j += 1
    }
    buf
  }

  override def eval(buf: Array[Byte]): Any = HllSketch.estimateFromRegisters(buf)

  override def serialize(buf: Array[Byte]): Array[Byte] = buf

  // merge mutates its first argument in place, so never alias the
  // incoming serialized bytes as a live buffer
  override def deserialize(bytes: Array[Byte]): Array[Byte] = bytes.clone()

  override def withNewMutableAggBufferOffset(newOffset: Int): HllSketch =
    copy(mutableAggBufferOffset = newOffset)
  override def withNewInputAggBufferOffset(newOffset: Int): HllSketch =
    copy(inputAggBufferOffset = newOffset)
  override protected def withNewChildrenInternal(
      newChildren: IndexedSeq[Expression]): HllSketch =
    copy(child = newChildren.head)
}

object HllSketch {
  /** Register count m (b = 8 index bits). */
  val M = 256

  /** alpha_256 = 0.7213/(1 + 1.079/256) as the exact rational
    * alphaNum/alphaDen (both over the same 10^4·256·10^3 denominator,
    * reduced by 10^3). */
  val alphaNum = 1846528L
  val alphaDen = 2570790L

  /** alphaNum · m² · 2^61 — the numerator of the raw estimate. */
  val rawNumerator: BigInt = BigInt(alphaNum) * M * M << 61

  /** Linear-counting table: lcMicro(V) = round(10^6 · ln(256/V)) for
    * V in [1, 256]. Tabulated once so the transcendental ln never has
    * to agree across engines — the oracle SQL embeds the same values
    * (see [[lcValuesSql]]). */
  val lcMicro: Array[Long] =
    (0 to M).map(v => if (v == 0) 0L else Math.round(1e6 * Math.log(M.toDouble / v))).toArray

  /** The raw/linear-counting estimator over a 256-byte register array —
    * all-integer, shared by eval and unit tests. */
  def estimateFromRegisters(regs: Array[Byte]): Long = {
    var s = BigInt(0)
    var zeros = 0
    var j = 0
    while (j < M) {
      val rho = regs(j).toInt
      if (rho == 0) zeros += 1
      s += BigInt(1) << (61 - rho)
      j += 1
    }
    val raw = rawNumerator / (BigInt(alphaDen) * s)
    if (zeros > 0 && raw <= BigInt(5 * M / 2)) (M.toLong * lcMicro(zeros)) / 1000000L
    else raw.toLong
  }

  /** Aggregate column: HLL estimate of distinct keys. `md5Hex` must be
    * `md5(CAST(key AS STRING))` so the oracle convention holds. */
  def estimate(md5Hex: Column): Column =
    ColumnBridge.column(HllSketch(ColumnBridge.expression(md5Hex)).toAggregateExpression())

  /** The linear-counting table as a SQL VALUES list `(v, lm)` — spliced
    * into oracle queries so both engines read the identical constants. */
  def lcValuesSql: String =
    (1 to M).map(v => s"($v, ${lcMicro(v)})").mkString(", ")

  /** The full estimator as oracle SQL: given CTE names for a table of
    * `(grp VARCHAR, hx md5-hex)` rows, yields CTE text ending in
    * `<out>(grp, est)`. Mirrors [[estimateFromRegisters]] step for step
    * in DuckDB integer arithmetic (HUGEINT sums, `//` division). */
  def estimatorSql(hxCte: String, out: String): String =
    s"${out}_b AS (SELECT grp, ('0x' || substr(hx, 1, 2))::BIGINT AS reg, " +
      s"('0x' || substr(hx, 3, 15))::BIGINT AS w FROM $hxCte), " +
      s"${out}_r AS (SELECT grp, reg, max(CASE WHEN w = 0 THEN 61 " +
      s"ELSE 61 - length(bin(w)) END) AS mj FROM ${out}_b GROUP BY 1, 2), " +
      s"${out}_s AS (SELECT grp, sum(CAST(1::BIGINT << (61 - mj) AS HUGEINT)) + " +
      s"CAST(256 - count(*) AS HUGEINT) * CAST(1::BIGINT << 61 AS HUGEINT) AS s, " +
      s"256 - count(*) AS v FROM ${out}_r GROUP BY 1), " +
      s"${out}_e AS (SELECT grp, v, CAST('$rawNumerator' AS HUGEINT) // " +
      s"($alphaDen * s) AS raw FROM ${out}_s), " +
      s"$out AS (SELECT e.grp, CAST(CASE WHEN e.v > 0 AND e.raw <= 640 " +
      s"THEN (256 * CAST(lc.lm AS BIGINT)) // 1000000 ELSE e.raw END AS BIGINT) AS est " +
      s"FROM ${out}_e e LEFT JOIN lc ON lc.v = e.v)"
}
