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
  * (Verify / Bench / Cli / SyncPipeline / MailSyncPipeline /
  * MultiJobSync — anything that runs a query to completion) call
  * [[releaseAll]] once the action finishes. Each persist remains
  * individually justified while the query runs; this is the
  * unpersist-at-pipeline-end half of the contract.
  *
  * Concurrency contract: the registry is process-global, so
  * [[releaseAll]] must only run at a point where NO query is still
  * building or executing — one driver thread sequencing queries
  * (Verify/Bench/Cli), or a fan-out driver calling it strictly after
  * joining its workers (MultiJobSync releases after the pool drains,
  * never per-job). Calling it mid-build from another thread would
  * unpersist a live intermediate: results stay correct (Spark
  * recomputes from lineage) but the barrier the persist paid for is
  * lost. A long-lived server interleaving independent queries on many
  * threads needs per-scope tokens instead of this global registry —
  * deliberately out of scope for the current drivers, all of which
  * sequence.
  */
object CacheScope {
  private val live = new java.util.concurrent.ConcurrentLinkedQueue[DataFrame]()
  private val hooks = new java.util.concurrent.ConcurrentLinkedQueue[() => Unit]()

  /** Persist `df` and track it for end-of-pipeline release. */
  def persist(df: DataFrame): DataFrame = {
    df.persist()
    live.add(df)
    df
  }

  /** Register a STANDING release hook, run on every [[releaseAll]] —
    * for caches that memoize their persisted frames outside the `live`
    * queue and therefore need to evict their own bookkeeping alongside
    * the unpersist. Hooks stay registered for the life of the process;
    * register once per cache, not once per frame.
    *
    * Granularity warning (the r15 lesson): per-query drivers call
    * [[releaseAll]] after EVERY query, so a hook that evicts a cache
    * meant to amortize ACROSS queries (DrupalFixture's base tables)
    * regresses the whole family it serves — mbr4 ran 2.03× for one
    * round. Cross-query caches belong on [[onSessionRelease]] and must
    * bound their own memory (keyed LRU); [[onRelease]] is only for
    * state that really is per-query. */
  def onRelease(hook: () => Unit): Unit = hooks.add(hook)

  private val sessionHooks = new java.util.concurrent.ConcurrentLinkedQueue[() => Unit]()

  /** Register a SESSION-END release hook: run only by [[releaseSession]]
    * (which Bench/Verify/Cli call once, after their last query), never by
    * the per-query [[releaseAll]]. For caches that amortize across
    * queries — they stay warm through a whole driver run and still leave
    * nothing pinned when the run ends. */
  def onSessionRelease(hook: () => Unit): Unit = sessionHooks.add(hook)

  /** End-of-run release: everything [[releaseAll]] does, plus the
    * session-tier hooks. Call once per driver run, after the last
    * query's action completes. */
  def releaseSession(): Unit = {
    releaseAll()
    sessionHooks.forEach(h => h())
  }

  /** Unpersist every tracked intermediate and run the standing hooks.
    * Idempotent; must run only at a quiesced point (see the concurrency
    * contract above). Non-blocking: the RDDs leave the session's
    * persistent-RDD map immediately, block cleanup proceeds
    * asynchronously. */
  def releaseAll(): Unit = {
    var df = live.poll()
    while (df != null) {
      df.unpersist(blocking = false)
      df = live.poll()
    }
    hooks.forEach(h => h())
  }
}
