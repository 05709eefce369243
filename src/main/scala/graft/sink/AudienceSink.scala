package graft.sink

import java.util.concurrent.ConcurrentHashMap
import scala.jdk.CollectionConverters._

import org.apache.spark.sql.{DataFrame, Row}

/** Audience-style sink with the reference's Mailchimp semantics
  * (SURVEY §2.1 S11–S13), emulated over an in-JVM "service" so the
  * batch/retry/GC protocol is testable without the network:
  *
  *  - S11 `upsertMany`: members pushed from executors in chunks of ≤300
  *    per batch (`mailchimp/src/members.rs:130-134` — 500 documented as
  *    timing out), bounded sink-side parallelism via `repartition(n)`
  *    (reference: 8 concurrent batches), per-batch retry with exponential
  *    backoff capped at 5 s (`mailchimp/src/lib.rs:331-364`); returns the
  *    upserted id set for the subsequent retain.
  *  - S12 `retain`: delete audience rows whose id is NOT in the keep set,
  *    never touching `cleaned` members (`mailchimp/src/members.rs:68-97`).
  *  - S13 `updateTags`: per-member tag-state updates applied in chunks of
  *    1000 (`mailchimp/src/members.rs:249-274`).
  *
  * The executor-side closure captures only the sink id (a string); state
  * lives in a static registry — exactly where the real HTTP endpoint
  * would sit. Every operation is keyed upsert/delete, so Spark task
  * retries are idempotent (SURVEY §7.4.4). Swapping the registry calls
  * for REST POSTs yields the production sink unchanged.
  */
object AudienceSink {
  final class State {
    /** member id → (email, status, merge-json). */
    val members = new ConcurrentHashMap[String, (String, String, String)]()
    val tags = new ConcurrentHashMap[String, Set[String]]()
    /** injectable transient fault count (retry testing). */
    val failNextAttempts = new java.util.concurrent.atomic.AtomicInteger(0)
  }
  private val registry = new ConcurrentHashMap[String, State]()
  def state(id: String): State = registry.computeIfAbsent(id, _ => new State)

  /** Transport boundary: a real implementation POSTs the batch here. */
  private[sink] def postBatch(sinkId: String,
      rows: Seq[(String, String, String, String)]): Unit = {
    val st = state(sinkId)
    if (st.failNextAttempts.getAndUpdate(n => math.max(0, n - 1)) > 0)
      throw new java.io.IOException("transient sink error (injected)")
    rows.foreach { case (id, email, status, merge) =>
      st.members.put(id, (email, status, merge))
    }
  }

  private[sink] def withRetry[T](maxRetries: Int)(f: => T): T = {
    var delay = 50L
    var tries = 0
    while (tries <= maxRetries) {
      try return f
      catch {
        case _: java.io.IOException if tries < maxRetries =>
          tries += 1
          Thread.sleep(math.min(delay, 5000)) // cap 5 s like the reference
          delay *= 2
      }
    }
    throw new IllegalStateException("retries exhausted")
  }
}

final class AudienceSink(val sinkId: String, batchSize: Int = 300,
    sinkPartitions: Int = 8, maxRetries: Int = 3) extends Serializable {
  import AudienceSink._

  def size: Int = state(sinkId).members.size
  def get(id: String): Option[(String, String, String)] =
    Option(state(sinkId).members.get(id))
  def tagsOf(id: String): Set[String] =
    state(sinkId).tags.getOrDefault(id, Set.empty)
  def allIds: Set[String] = state(sinkId).members.keySet().asScala.toSet
  def injectTransientFailures(n: Int): Unit =
    state(sinkId).failNextAttempts.set(n)

  /** S11: df(id, email, status, merge_json) → set of upserted ids. */
  def upsertMany(df: DataFrame): Set[String] = {
    val (sid, bs, retries) = (sinkId, batchSize, maxRetries)
    df.select("id", "email", "status", "merge_json")
      .repartition(sinkPartitions)
      .foreachPartition { it: Iterator[Row] =>
        it.map(r => (r.getString(0), r.getString(1), r.getString(2), r.getString(3)))
          .grouped(bs)
          .foreach(batch => withRetry(retries)(postBatch(sid, batch)))
      }
    df.select("id").distinct().collect().map(_.getString(0)).toSet
  }

  /** S12: delete members not in `keep`, excluding cleaned. Returns count. */
  def retain(keep: Set[String]): Int = {
    val st = state(sinkId)
    val toDelete = st.members.asScala.collect {
      case (id, (_, status, _)) if status != "cleaned" && !keep.contains(id) => id
    }.toSeq
    toDelete.foreach { id => st.members.remove(id); st.tags.remove(id) }
    toDelete.size
  }

  /** S13: apply (id, tag, active) updates in chunks of 1000. */
  def updateTags(updates: DataFrame): Int = {
    val st = state(sinkId)
    val rows = updates.select("id", "tag", "active").collect()
    rows.grouped(1000).foreach { chunk =>
      chunk.foreach { r =>
        val (id, tag, active) = (r.getString(0), r.getString(1), r.getBoolean(2))
        st.tags.compute(id, (_, cur) => {
          val s = Option(cur).getOrElse(Set.empty[String])
          if (active) s + tag else s - tag
        })
      }
    }
    rows.length
  }
}
