package graft.operators

import java.nio.charset.StandardCharsets

import org.apache.hadoop.fs.{FileSystem, Path}
import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/** Deterministic corpus shard writer (out1) — the step between "curated
  * corpus" and "training job". A training run wants the corpus as a fixed
  * number of shards whose membership and order do not depend on Spark's
  * partition layout, task scheduling, or retries, so that re-running the
  * export (or re-reading shard 17 of 1024) always yields the same bytes.
  *
  * Shard assignment is a pure map — `md5(key) mod numShards` — the same
  * content-stable convention as [[Sampling.bucket]], so it is reproducible
  * across runs AND across engines (the DuckDB oracle reproduces the
  * manifest bit-for-bit). No sampling-based range partitioner: Spark's
  * `repartitionByRange` draws reservoir samples whose boundaries shift
  * with the input split layout, which would make shard membership
  * layout-dependent — exactly what a training-data export can't have.
  *
  * The per-shard manifest (row count + order-independent content hash)
  * is the cheap integrity check a 100 TB export needs: a re-run, a
  * different cluster, or the DuckDB oracle can re-derive it and diff
  * without reading shard bytes side by side.
  */
object Sharding {

  /** Modulus for row/content hashes: a prime < 2³¹, so per-shard sums of
    * row hashes stay far from Long overflow (up to ~2³² rows per shard)
    * and DuckDB's HUGEINT sum agrees after one final mod. */
  val HashMod = 1000000007L

  /** Content-stable shard id in [0, numShards): 60-bit md5 prefix of the
    * key, mod shard count — the engine-portable twin of DuckDB's
    * `('0x' || substr(md5(k), 1, 15))::BIGINT % n`. */
  def shardId(key: Column, numShards: Int): Column = {
    require(numShards > 0, s"numShards must be positive, got $numShards")
    pmod(conv(substring(md5(key.cast("string")), 1, 15), 16, 10).cast("long"), lit(numShards))
  }

  /** Per-row content hash < [[HashMod]] over `key:content`. NULL content
    * propagates to a NULL hash (skipped by the shard sum) in both engines. */
  private def rowHash(key: Column, content: Column): Column =
    pmod(conv(substring(md5(concat(key.cast("string"), lit(":"), content.cast("string"))),
      1, 15), 16, 10).cast("long"), lit(HashMod))

  private def assigned(df: DataFrame, key: Column, content: Column, numShards: Int): DataFrame =
    df.withColumn("shard_id", shardId(key, numShards))
      .withColumn("row_hash", rowHash(key, content))

  /** Shard manifest: `(shard_id, n_rows, content_hash)` where the hash is
    * the mod-sum of row hashes — commutative, so it is independent of row
    * order and partitioning. One hash shuffle on shard_id (map-side
    * partial aggregation does most of the work); shards that receive no
    * rows are absent, as in the oracle. */
  def manifest(df: DataFrame, key: Column, content: Column, numShards: Int): DataFrame =
    assigned(df, key, content, numShards)
      .groupBy("shard_id")
      .agg(count(lit(1)).as("n_rows"),
        pmod(sum(col("row_hash")), lit(HashMod)).as("content_hash"))

  /** Write `df` as `numShards` deterministic parquet shards under
    * `path/data/shard_id=K/` plus a `MANIFEST.json` (one line per shard,
    * ascending shard_id). Each shard value hashes to exactly one task of
    * the `repartition(numShards, shard_id)` exchange, so every shard
    * directory holds ONE file, sorted by key — two runs produce
    * byte-identical manifests and shard contents regardless of input
    * partitioning. Returns the manifest.
    *
    * The manifest itself is O(numShards) rows — the driver-side JSON
    * write is the output contract (same stance as JsonOut), not a data
    * collect. */
  def write(df: DataFrame, key: Column, content: Column, numShards: Int, path: String): DataFrame = {
    val a = assigned(df, key, content, numShards)
    a.repartition(numShards, col("shard_id"))
      .sortWithinPartitions(col("shard_id"), key)
      .drop("row_hash")
      .write.mode("overwrite").partitionBy("shard_id").parquet(s"$path/data")

    // Manifest from the WRITTEN bytes, not a second scan+md5 of the
    // source (that would double the export's I/O and CPU at 100 TB):
    // the columnar re-read is cheap, and the manifest then describes
    // what is actually on disk — the same recompute verify() trusts.
    val m = recompute(df.sparkSession, path, key, content).orderBy("shard_id")
    val lines = m.collect().map { r =>
      s"""{"shard_id":${r.getLong(0)},"n_rows":${r.getLong(1)},"content_hash":${r.getLong(2)}}"""
    }
    val manifestPath = new Path(path, "MANIFEST.json")
    val fs = FileSystem.get(manifestPath.toUri, df.sparkSession.sparkContext.hadoopConfiguration)
    val out = fs.create(manifestPath, true)
    try out.write((lines.mkString("\n") + "\n").getBytes(StandardCharsets.UTF_8))
    finally out.close()
    writeShardCount(fs, path, numShards)
    m
  }

  /** The export's recorded modulus, `path/SHARDS.json` — [[append]]
    * validates against it: appending under a different shard count
    * would file batch rows by a different md5-mod modulus AND update
    * the manifest with that same wrong modulus, so [[verify]] would
    * still report all-ok while the export silently lost its
    * content-stable shard-lookup property. The manifest alone can't
    * carry this (empty shards are absent from it, so max+1
    * undercounts). */
  private def writeShardCount(fs: FileSystem, path: String, numShards: Int): Unit = {
    val p = new Path(path, "SHARDS.json")
    val out = fs.create(p, true)
    try out.write(s"""{"num_shards":$numShards}""".getBytes(StandardCharsets.UTF_8))
    finally out.close()
  }

  private def readShardCount(fs: FileSystem, path: String): Option[Int] = {
    val p = new Path(path, "SHARDS.json")
    if (!fs.exists(p)) None
    else {
      val in = fs.open(p)
      val txt = try scala.io.Source.fromInputStream(in, "UTF-8").mkString finally in.close()
      "\"num_shards\"\\s*:\\s*(\\d+)".r.findFirstMatchIn(txt).map(_.group(1).toInt)
    }
  }

  /** Append a batch to an existing export — the incremental half of the
    * shard contract, and the reason the manifest hash is a commutative
    * mod-sum. Assignment is content-stable (md5-mod), so batch rows land
    * in their deterministic shards as NEW files; existing shard bytes
    * are never read or rewritten. The manifest updates incrementally:
    * counts add, hashes combine as (old + delta) mod p. Cost = O(batch),
    * not O(corpus) — the property that makes a daily top-up of a 100 TB
    * export affordable. [[verify]] remains the audit that the
    * incremental arithmetic matches the bytes on disk (pinned in
    * DataOpsSpec against a full recompute). `numShards` must match the
    * export's recorded shard count (`SHARDS.json`, written by [[write]])
    * — validated before any bytes land. Returns the merged manifest. */
  def append(df: DataFrame, key: Column, content: Column, numShards: Int,
      path: String): DataFrame = {
    val spark = df.sparkSession
    val fsForCheck = FileSystem.get(new Path(path).toUri,
      spark.sparkContext.hadoopConfiguration)
    // Fail loudly on a modulus mismatch BEFORE writing anything: a wrong
    // numShards would both misfile the batch and update the manifest
    // under the same wrong modulus, leaving verify() green.
    readShardCount(fsForCheck, path) match {
      case Some(recorded) =>
        require(recorded == numShards,
          s"append numShards=$numShards does not match the export's recorded " +
          s"shard count $recorded ($path/SHARDS.json) — appending under a " +
          "different md5-mod modulus would silently break content-stable " +
          "shard lookup")
      case None =>
        throw new IllegalArgumentException(
          s"$path/SHARDS.json not found — append requires an export created " +
          "by Sharding.write (which records its shard count); cannot safely " +
          "validate the modulus of a bare data directory")
    }
    assigned(df, key, content, numShards)
      .repartition(numShards, col("shard_id"))
      .sortWithinPartitions(col("shard_id"), key)
      .drop("row_hash")
      .write.mode("append").partitionBy("shard_id").parquet(s"$path/data")
    val old = spark.read
      .schema("shard_id LONG, n_rows LONG, content_hash LONG")
      .json(s"$path/MANIFEST.json")
      .withColumnRenamed("n_rows", "old_rows")
      .withColumnRenamed("content_hash", "old_hash")
    val delta = manifest(df, key, content, numShards)
      .withColumnRenamed("n_rows", "d_rows")
      .withColumnRenamed("content_hash", "d_hash")
    // materialize BEFORE overwriting the manifest: the merged plan reads
    // MANIFEST.json lazily, so returning it un-collected would hand the
    // caller a frame that re-reads the UPDATED file on its next action
    // and double-counts the delta
    val rows = old.join(delta, Seq("shard_id"), "full_outer")
      .select(col("shard_id"),
        (coalesce(col("old_rows"), lit(0L)) + coalesce(col("d_rows"), lit(0L))).as("n_rows"),
        pmod(coalesce(col("old_hash"), lit(0L)) + coalesce(col("d_hash"), lit(0L)),
          lit(HashMod)).as("content_hash"))
      .orderBy("shard_id")
      .collect().map(r => (r.getLong(0), r.getLong(1), r.getLong(2))).toSeq
    val lines = rows.map { case (sid, n, h) =>
      s"""{"shard_id":$sid,"n_rows":$n,"content_hash":$h}"""
    }
    val manifestPath = new Path(path, "MANIFEST.json")
    val fs = FileSystem.get(manifestPath.toUri, spark.sparkContext.hadoopConfiguration)
    val out = fs.create(manifestPath, true)
    try out.write((lines.mkString("\n") + "\n").getBytes(StandardCharsets.UTF_8))
    finally out.close()
    import spark.implicits._
    rows.toDF("shard_id", "n_rows", "content_hash")
  }

  /** Per-shard counts + hashes recomputed from the files under
    * `path/data`, trusting nothing but bytes (shard_id rides in as the
    * written layout's partition column). Shared by [[write]] (so the
    * manifest describes what actually landed, with no second source
    * scan) and [[verify]]. */
  private def recompute(spark: org.apache.spark.sql.SparkSession, path: String,
      key: Column, content: Column): DataFrame =
    spark.read.parquet(s"$path/data")
      .groupBy(col("shard_id").cast("long").as("shard_id"))
      .agg(count(lit(1)).as("n_rows"),
        pmod(sum(rowHash(key, content)), lit(HashMod)).as("content_hash"))

  /** Integrity check (out2): recompute the manifest from the shard files
    * under `path/data` and diff it against the committed MANIFEST.json.
    * Returns one row per shard with `status`: `ok`, `count_mismatch`,
    * `hash_mismatch` (bit-rot / partial rewrite), `missing_shard`
    * (manifested but absent), or `extra_shard` (present but not
    * manifested). Cost = one pass over the shards (the same agg shape
    * as [[manifest]]) — no row-by-row compare against a second copy,
    * which is what makes the check affordable on a 100 TB export. */
  def verify(spark: org.apache.spark.sql.SparkSession, path: String,
      key: Column, content: Column): DataFrame = {
    val expected = spark.read
      .schema("shard_id LONG, n_rows LONG, content_hash LONG")
      .json(s"$path/MANIFEST.json")
      .withColumnRenamed("n_rows", "exp_rows")
      .withColumnRenamed("content_hash", "exp_hash")
    val actual = recompute(spark, path, key, content)
      .withColumnRenamed("n_rows", "act_rows")
      .withColumnRenamed("content_hash", "act_hash")
    expected.join(actual, Seq("shard_id"), "full_outer")
      .select(col("shard_id"), col("exp_rows"), col("act_rows"),
        col("exp_hash"), col("act_hash"),
        when(col("exp_rows").isNull, "extra_shard")
          .when(col("act_rows").isNull, "missing_shard")
          .when(col("exp_rows") =!= col("act_rows"), "count_mismatch")
          .when(col("exp_hash") =!= col("act_hash"), "hash_mismatch")
          .otherwise("ok").as("status"))
  }
}
