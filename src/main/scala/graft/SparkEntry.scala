package graft

import org.apache.spark.sql.{DataFrame, SparkSession}
import graft.queries.{Catalog, DataCatalog, MembersCatalog, Q}

/** Driver contract — see /root/repo/SURVEY.md §7 + the builder prompt.
  * The catalog lives in graft.queries.{Catalog, DataCatalog}; every entry
  * pairs a Spark DataFrame builder with (where SQL-expressible) the
  * equivalent DuckDB oracle query. */
object SparkEntry {

  private val all: Seq[(String, Q)] =
    Catalog.entries ++ DataCatalog.entries ++ MembersCatalog.entries ++
      graft.queries.DdbCatalog.entries

  /** Flagship query on /root/testdata/sf0.001; driver smoke-checks rows>0:
    * the composed members-by-club assembly (SURVEY §7.2). */
  def entry(spark: SparkSession): DataFrame =
    MembersCatalog.mbr1.build(spark, "/root/testdata/sf0.001")

  /** One entry per implemented operator from SURVEY.md §2. */
  def queries: Map[String, (SparkSession, String) => DataFrame] =
    all.map { case (name, q) => name -> q.build }.toMap

  /** For each key in queries, equivalent ANSI SQL runnable by DuckDB on
    * the same parquet tables. Omit for non-SQL-expressible ops. */
  def oracleSql: Map[String, String] =
    all.collect { case (name, Q(_, Some(sql))) => name -> sql }.toMap
}
