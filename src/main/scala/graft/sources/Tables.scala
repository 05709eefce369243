package graft.sources

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions.{broadcast, col, expr, timestamp_micros}

/** Fixture-table registry: the engine's scan layer over the driver's
  * parquet tables (TESTDATA.md). Mirrors the reference's source registry
  * role (`ddb/src/lib.rs:21-33` connects to the Drupal MySQL; here each
  * "table" is a parquet directory and Catalyst provides pushdown/pruning).
  *
  * Scale note: at 100 TB these reads keep predicate pushdown + column
  * pruning intact because every downstream operator is declared on the
  * DataFrame (never collected); small dimension tables are exposed with a
  * broadcast hint so dimension joins never shuffle the fact side.
  */
object Tables {
  /** Route the table-dir string to its source impl: a jdbc: URL scans
    * through the JDBC seam, anything else is a parquet directory. Every
    * catalog query takes its table dir as a parameter, so passing a JDBC
    * URL runs the whole catalog against a live warehouse unchanged. */
  def source(dir: String): TableSource =
    if (dir.startsWith("jdbc:")) JdbcStore(dir) else ParquetStore(dir)

  def t(spark: SparkSession, dir: String, name: String): DataFrame =
    source(dir).table(spark, name)

  def region(s: SparkSession, d: String): DataFrame   = t(s, d, "region")
  def nation(s: SparkSession, d: String): DataFrame   = t(s, d, "nation")
  def customer(s: SparkSession, d: String): DataFrame = t(s, d, "customer")
  def supplier(s: SparkSession, d: String): DataFrame = t(s, d, "supplier")
  def part(s: SparkSession, d: String): DataFrame     = t(s, d, "part")
  def orders(s: SparkSession, d: String): DataFrame   = t(s, d, "orders")
  def lineitem(s: SparkSession, d: String): DataFrame = t(s, d, "lineitem")
  /** events.parquet has shipped with either TIMESTAMP(NANOS) (which
    * Spark's parquet reader rejects — read nanos as long, truncate to
    * micros like DuckDB's µs TIMESTAMP does) or plain timestamp[us]
    * (typed, no workaround needed). Adapt to whichever schema the fixture
    * carries instead of assuming one, so a fixture regeneration can't
    * break every events-reading query again. */
  def events(s: SparkSession, d: String): DataFrame =
    if (d.startsWith("jdbc:")) t(s, d, "events") // DB timestamps arrive typed
    else {
      s.conf.set("spark.sql.legacy.parquet.nanosAsLong", "true")
      val raw = t(s, d, "events")
      raw.schema("ts").dataType match {
        case org.apache.spark.sql.types.LongType =>
          raw.withColumn("ts", timestamp_micros(expr("ts div 1000")))
        case org.apache.spark.sql.types.TimestampNTZType =>
          // session tz is UTC everywhere, so ntz→ltz keeps the instant;
          // ltz is what watermarks and the pre-regression plans expect
          raw.withColumn("ts",
            col("ts").cast(org.apache.spark.sql.types.TimestampType))
        case _ => raw // already TIMESTAMP (ltz)
      }
    }
  def documents(s: SparkSession, d: String): DataFrame  = t(s, d, "documents")
  def embeddings(s: SparkSession, d: String): DataFrame = t(s, d, "embeddings")

  /** Dimensions small enough to broadcast at any scale factor (region and
    * nation are fixed-cardinality; supplier/part grow with sf but stay
    * << fact tables — at 100 TB these would be bucketed instead; the
    * broadcast hint is correct for dims that fit in executor memory). */
  def regionB(s: SparkSession, d: String): DataFrame = broadcast(region(s, d))
  def nationB(s: SparkSession, d: String): DataFrame = broadcast(nation(s, d))
}
