package graft.sources

import org.apache.spark.sql.{DataFrame, Row, SparkSession}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types.StructType

/** Paged-pull source (SURVEY §2.1 S4/S5): the reference unfolds REST
  * offset/count pagination into a lazy stream (`mailchimp/src/lib.rs:
  * 214-249`) and fans pages out 10-concurrent after reading the total
  * from list stats (`mailchimp/src/members.rs:24-48`).
  *
  * Spark shape: `spark.range(0, total, pageSize)` gives one row per page
  * offset; `mapPartitions` turns each offset into a page fetch running on
  * executors — page parallelism IS partition parallelism (set
  * `numSlices` = the reference's concurrency cap, 10). Projection
  * pushdown mirrors the `fields=` query param: the fetcher receives the
  * required column list and returns only those.
  *
  * The fetch function is injected so tests (and the local emulation) use
  * a deterministic in-JVM "API"; the production implementation does an
  * HTTP GET per page with the same signature. At 100 TB-scale sources
  * this generalizes to a DataSource V2 with SupportsPushDownRequiredColumns;
  * the partition-per-page execution model is identical.
  */
object PagedSource {

  /** A page fetch: (offset, count, fields) → rows (aligned to `fields`). */
  type Fetch = (Long, Int, Seq[String]) => Seq[Seq[Any]]

  def read(spark: SparkSession, schema: StructType, total: Long, pageSize: Int,
      concurrency: Int, fetch: Fetch): DataFrame = {
    val fields = schema.fieldNames.toSeq
    val pages = spark.range(0, total, pageSize.toLong, numPartitions = concurrency)
    val rows = pages.rdd.mapPartitions { offsets =>
      offsets.flatMap(off => fetch(off, pageSize, fields).map(Row.fromSeq))
    }
    spark.createDataFrame(rows, schema)
  }

  /** Deterministic in-JVM audience "API" over a seeded member list —
    * the emulation endpoint for tests and the local pipeline. */
  def syntheticAudience(n: Long): Fetch = (offset, count, fields) => {
    (offset until math.min(offset + count, n)).map { i =>
      val full = Map[String, Any](
        "id" -> f"member_$i%06d",
        "email" -> s"user$i@acme.org",
        "status" -> (if (i % 17 == 0) "cleaned" else "subscribed"),
        "rating" -> (i % 5).toInt)
      fields.map(full(_))
    }
  }
}
