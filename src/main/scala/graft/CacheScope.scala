package graft

import org.apache.spark.sql.DataFrame

/** Registry for operator-internal persisted intermediates, so a
  * long-lived session can release them after the consuming action
  * instead of accumulating cached RDDs until LRU eviction thrashes
  * executor storage.
  *
  * Operators that persist multi-consumer subtrees (the MinHash
  * signatures, the SimHash bands, the curation pipeline's dedup
  * checkpoint) register through [[persist]]; pipeline drivers
  * (Verify / Bench / Cli — anything that runs a query to completion)
  * call [[releaseAll]] once the action finishes. Each persist remains
  * individually justified while the query runs; this is the
  * unpersist-at-pipeline-end half of the contract.
  */
object CacheScope {
  private val live = new java.util.concurrent.ConcurrentLinkedQueue[DataFrame]()

  /** Persist `df` and track it for end-of-pipeline release. */
  def persist(df: DataFrame): DataFrame = {
    df.persist()
    live.add(df)
    df
  }

  /** Unpersist every tracked intermediate (idempotent; safe while other
    * queries build — they re-persist on registration). Non-blocking:
    * the RDDs leave the session's persistent-RDD map immediately, block
    * cleanup proceeds asynchronously. */
  def releaseAll(): Unit = {
    var df = live.poll()
    while (df != null) {
      df.unpersist(blocking = false)
      df = live.poll()
    }
  }
}
