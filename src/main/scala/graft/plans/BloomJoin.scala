package graft.plans

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.catalyst.expressions.{Expression, UnaryExpression}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.graftbridge.ColumnBridge
import org.apache.spark.sql.types.{BooleanType, DataType}
import org.apache.spark.util.sketch.BloomFilter

/** Bloom-pruned semi-join: the shuffle-reduction pattern for the case
  * where the probe side is enormous (the 100 TB fact table), the build
  * side's KEY SET fits on the driver as a few-MB bloom filter, but the
  * build ROWS are too large or too hot to broadcast-join outright.
  *
  * Shape: build a bloom filter over the build side's join keys (one
  * collect of hashed bits — same cost class as a broadcast build), ship
  * it to every task inside a codegen'd `might_contain` expression, and
  * filter the probe side BEFORE its shuffle; a final exact semi-join
  * scrubs the bloom's false positives. The result is semantically
  * identical to a plain left-semi join — the bloom pass only exists so
  * that, at low join selectivity, the probe side shuffles `fpp + σ`
  * of its rows instead of all of them.
  *
  * (Spark's own runtime bloom pushdown — InjectRuntimeFilter — does
  * this automatically only for shuffle-join shapes it recognizes; this
  * operator is the explicit, composable form.)
  */
object BloomJoin {

  /** Build a bloom filter over `buildKey` (long keys).
    *
    * Sizing: `expectedItems` (caller knowledge — a table-stats row count,
    * a previous run's cardinality) skips the sizing pass entirely, making
    * the build ONE job. Without it, the NDV comes from a single
    * `approx_count_distinct` aggregation (one lightweight HLL sketch per
    * partition — no distinct-row shuffle, unlike the old
    * `distinct().count()` double pass) run at rsd=0.02 (Spark's default
    * 0.05 would make the 10% pad only ~2σ); 2% error + 10% pad is ~5σ,
    * so an undersized filter — realized fpp above the requested one —
    * is vanishingly unlikely. */
  def buildFilter(build: DataFrame, buildKey: Column, fpp: Double,
      expectedItems: Option[Long] = None): BloomFilter = {
    val n = expectedItems.getOrElse(
      (build.select(approx_count_distinct(buildKey, rsd = 0.02)).head().getLong(0) * 11L) / 10L)
    build.stat.bloomFilter(buildKey, math.max(1L, n), fpp)
  }

  /** Codegen'd membership probe over a driver-built filter. */
  def mightContain(key: Column, bf: BloomFilter): Column =
    ColumnBridge.column(BloomMightContain(ColumnBridge.expression(key), bf))

  /** probe ⋉ build on long keys, bloom-pruned before the shuffle.
    * Result ≡ `probe.join(build, probeKey === buildKey, "left_semi")`. */
  def semiJoin(probe: DataFrame, probeKey: Column,
      build: DataFrame, buildKey: Column, fpp: Double = 0.01,
      expectedItems: Option[Long] = None): DataFrame = {
    val bf = buildFilter(build, buildKey, fpp, expectedItems)
    probe.filter(mightContain(probeKey, bf))
      .join(build.select(buildKey.as("__bf_key")).distinct(),
        probeKey === col("__bf_key"), "left_semi")
  }

  /** probe ▷ build (LEFT ANTI) on arbitrary keys, bloom-pruned (r18 —
    * the crawled-set shape dp14 ships: at 100 TB the "already crawled"
    * side is billions of URLs, and MOST frontier candidates are new).
    * The bloom answers "definitely not crawled" for free: rows whose
    * xxhash64(key) the filter rules OUT pass the anti-join WITHOUT
    * shuffling — only the bloom-positive slice (fpp + the true-overlap
    * fraction of the probe) pays the exact anti-join, which runs on
    * the REAL key (not the hash), so a hash collision can never drop a
    * genuinely-new row. Result ≡
    * `probe.join(build, probeKey === buildKey, "left_anti")` exactly.
    *
    * (The semi-join dual prunes the KEPT side; here the bloom-negative
    * rows ARE the kept side, which is why anti-joins benefit even more
    * at low overlap.) */
  def antiJoin(probe: DataFrame, probeKey: Column,
      build: DataFrame, buildKey: Column, fpp: Double = 0.01,
      expectedItems: Option[Long] = None): DataFrame = {
    val bf = buildFilter(build, xxhash64(buildKey), fpp, expectedItems)
    val neg = probe.filter(!mightContain(xxhash64(probeKey), bf))
    val pos = probe.filter(mightContain(xxhash64(probeKey), bf))
      .join(build.select(buildKey.as("__bf_key")).distinct(),
        probeKey === col("__bf_key"), "left_anti")
    neg.unionByName(pos)
  }
}

/** `bf.mightContainLong(key)` as a codegen'd expression; the filter
  * rides the generated class as a reference object (broadcast by task
  * serialization, not rebuilt per row). */
case class BloomMightContain(child: Expression, bf: BloomFilter)
    extends UnaryExpression {
  override def dataType: DataType = BooleanType

  override protected def nullSafeEval(input: Any): Any =
    java.lang.Boolean.valueOf(bf.mightContainLong(input.asInstanceOf[Long]))

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode = {
    val ref = ctx.addReferenceObj("bloomFilter", bf,
      classOf[BloomFilter].getName)
    nullSafeCodeGen(ctx, ev, in => s"${ev.value} = $ref.mightContainLong($in);")
  }

  override protected def withNewChildInternal(c: Expression): BloomMightContain =
    copy(child = c)
}
