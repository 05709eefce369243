package graft.sources

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions.col

/** Pre-bucketed table storage — the 100×-scale answer to the EAV
  * flagship's fact-side shuffles: a table written `bucketBy(n, key)`
  * exposes `HashPartitioning(key, n)` straight from the scan, so every
  * equi-join and aggregation ON that key across co-bucketed tables
  * plans with NO ShuffleExchange (ScaleSpec pins it on the assembly
  * join). At 100 TB that converts the assembly's per-query
  * multi-terabyte shuffles into a one-time layout cost paid at ingest,
  * exactly the trade a nightly-sync deployment wants.
  *
  * Mechanics: bucketing requires the table catalog (`saveAsTable`);
  * tables land in the session catalog over the warehouse directory,
  * names SF-tagged so scale factors coexist. The writer repartitions
  * by the bucket key first, so each bucket is ONE file — which also
  * makes the `sortBy` metadata usable at read (Spark trusts per-bucket
  * sortedness only for single-file buckets, eliding the sort under
  * sort-merge joins). */
object BucketedStore {

  /** Ensure `table` exists as a bucketed+sorted managed table holding
    * `df` (built only when absent); returns the table frame. One write
    * per (session, table): the in-memory catalog is session-scoped, so
    * a fresh session lays the table out once and every later query in
    * the session reads the bucketed files. */
  def ensure(s: SparkSession, table: String, df: => DataFrame, key: String,
      nBuckets: Int): DataFrame = {
    require(nBuckets >= 1, s"nBuckets must be >= 1, got $nBuckets")
    // The recursive stale-location delete below is scoped to OUR
    // namespace: in a shared or user-configured warehouse dir a bare
    // name collision with pre-existing data must never be silently
    // destroyed, so ensure() only manages graft_-prefixed tables.
    require(table.toLowerCase.startsWith("graft_"),
      s"BucketedStore.ensure manages only graft_-prefixed tables, got '$table'")
    if (!s.catalog.tableExists(table)) {
      // The in-memory catalog is session-scoped but the warehouse
      // DIRECTORY is not: a previous session's layout survives on disk
      // with no catalog entry, and saveAsTable refuses a managed table
      // whose location already exists (LOCATION_ALREADY_EXISTS). The
      // location is ours by construction — graft_ prefix enforced
      // above, same name, same derivation — so clear it and lay the
      // table out fresh.
      val loc = new org.apache.hadoop.fs.Path(
        s.conf.get("spark.sql.warehouse.dir"), table.toLowerCase)
      val fs = loc.getFileSystem(s.sparkContext.hadoopConfiguration)
      if (fs.exists(loc)) fs.delete(loc, true)
      df.repartition(nBuckets, col(key))
        .write.mode("overwrite").format("parquet")
        .bucketBy(nBuckets, key).sortBy(key)
        .saveAsTable(table)
    }
    s.table(table)
  }

  /** SF tag for table names (identifiers can't carry dots/slashes). */
  def sfTag(d: String): String =
    new java.io.File(d).getName.replaceAll("[^A-Za-z0-9]", "_")
}
