package graft.streaming

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.streaming.{StreamingQuery, Trigger}
import org.apache.spark.sql.types._

/** Structured Streaming surface (SURVEY §2.9: the reference has no
  * event-time streaming — this is the Spark-native extension over the
  * driver's `events` table). Batch and stream share one transform so the
  * windowed aggregation is testable both ways; `Trigger.AvailableNow`
  * turns the periodic re-sync jobs of the reference into incremental
  * runs with checkpointed state.
  *
  * Scale: watermark + tumbling window keeps state bounded; the shuffle is
  * on (window, event_type) — low cardinality, map-side combined.
  */
object EventStream {

  /** events file schema — the fixture has shipped `ts` both as
    * TIMESTAMP(NANOS) (Spark reads it as raw INT64 under nanos-as-long;
    * converted to µs on ingest) and as plain timestamp[us] (typed). The
    * stream source adapts to whichever the directory carries. */
  def schemaWithTs(ts: DataType): StructType = StructType(Seq(
    StructField("event_id", LongType), StructField("ts", ts),
    StructField("user_id", LongType), StructField("event_type", StringType),
    StructField("value", DoubleType), StructField("props", StringType)))

  val schema: StructType = schemaWithTs(LongType)

  /** Schema-adaptive streaming reader over an events parquet directory:
    * probe the on-disk `ts` type with a batch schema read (driver-side,
    * footer only), then declare the matching stream schema. Keeps every
    * streaming runner immune to fixture-schema regeneration. */
  def streamSource(spark: SparkSession, eventsDir: String): DataFrame = {
    spark.conf.set("spark.sql.legacy.parquet.nanosAsLong", "true")
    spark.read.parquet(eventsDir).schema("ts").dataType match {
      case LongType =>
        spark.readStream.schema(schemaWithTs(LongType)).parquet(eventsDir)
          .withColumn("ts", timestamp_micros(expr("ts div 1000")))
      case typed =>
        // watermarks demand TIMESTAMP (ltz); the fixture's timestamp[us]
        // surfaces as NTZ — cast keeps the instant (session tz is UTC)
        spark.readStream.schema(schemaWithTs(typed)).parquet(eventsDir)
          .withColumn("ts", col("ts").cast(TimestampType))
    }
  }

  /** Shared transform: 1-hour tumbling window per event_type with exact
    * cents arithmetic (twin of DataCatalog.e1). */
  def windowedAgg(events: DataFrame): DataFrame =
    events
      .withWatermark("ts", "2 hours")
      .groupBy(window(col("ts"), "1 hour").as("w"), col("event_type"))
      .agg(count(lit(1)).as("n"),
        sum(round(col("value") * 100, 0).cast("long")).as("value_cents"))
      .select(col("w.start").as("window_start"), col("event_type"),
        col("n"), col("value_cents"))

  /** Run the windowed agg as a stream over a directory of parquet events,
    * drained synchronously into an in-memory sink (local testing shape;
    * production shape swaps source/sink formats, the transform is
    * unchanged). Returns the completed query; results in table `outName`. */
  def runAvailableNow(spark: SparkSession, eventsDir: String, outName: String): StreamingQuery = {
    val src = streamSource(spark, eventsDir)
    val q = windowedAgg(src).writeStream
      .outputMode("append")
      .format("memory")
      .queryName(outName)
      .trigger(Trigger.AvailableNow())
      .start()
    q.awaitTermination()
    q
  }

  /** Windowed approximate distinct users (e7's stream twin): per
    * (1-day tumbling window, event_type), the HLL estimate of unique
    * user_ids. THE point of the sketch in streaming: the per-group
    * state crossing micro-batches is the fixed 256-byte register
    * buffer (HllSketch is a TypedImperativeAggregate — serialize/
    * merge are the state-store contract), where an exact distinct
    * would hold every id seen in the window. Batch twin: the same
    * transform on a batch frame, oracle-gated as e7. */
  def windowedHll(events: DataFrame): DataFrame =
    events
      .withWatermark("ts", "2 hours")
      .groupBy(window(col("ts"), "1 day").as("w"), col("event_type"))
      .agg(graft.plans.HllSketch.estimate(md5(col("user_id").cast("string"))).as("est"))
      .select(col("w.start").as("window_start"), col("event_type"), col("est"))

  /** Run the windowed HLL distinct as a stream into a memory sink. */
  def runWindowHllAvailableNow(spark: SparkSession, eventsDir: String,
      outName: String): StreamingQuery = {
    val q = windowedHll(streamSource(spark, eventsDir)).writeStream
      .outputMode("append")
      .format("memory")
      .queryName(outName)
      .trigger(Trigger.AvailableNow())
      .start()
    q.awaitTermination()
    q
  }

  /** Stream-static enrichment (J9's streaming form): the event stream
    * joins a static dimension per micro-batch — state-free for inner
    * joins (no watermark needed), dimension broadcast to executors.
    * Works identically on a batch DataFrame (the twin the test uses). */
  def enrich(events: DataFrame, dim: DataFrame, dimKey: String,
      nameCol: String): DataFrame =
    events.join(broadcast(dim), events("user_id") === dim(dimKey))
      .select(events("event_id"), events("user_id"), events("event_type"),
        dim(nameCol).as("user_name"))

  /** Stream-static AS-OF join with staleness tolerance (t10's streaming
    * twin — the feature-store SERVING pattern: each event reads the
    * feature version that was current at its event time, unless that
    * version is staler than `tolSeconds`).
    *
    * The batch t10 formulation (union + per-key window forward fill,
    * Temporal.asofJoinTolerance) is not streamable — a global per-key
    * window over a stream is unbounded state. The streaming-legal
    * rewrite moves ALL the temporal logic to the STATIC side: the
    * versioned dimension is rewritten once at plan time into disjoint
    * validity intervals [vt, lead(vt)) (a batch window over the
    * dimension, O(versions)), and each event then matches AT MOST ONE
    * interval by equi-key + containment + staleness — a stateless
    * stream-static left join, append mode, no watermark state, the
    * interval frame broadcast per micro-batch. ScaleSpec pins this
    * formulation ≡ asofJoinTolerance on identical batch inputs, and
    * stream ≡ batch through the memory sink. */
  def asofEnrich(events: DataFrame, dim: DataFrame, key: String,
      eventTime: String, versionTime: String, valueCol: String,
      tolSeconds: Long, asOfValueName: String = "asof_value"): DataFrame = {
    require(tolSeconds > 0, s"tolSeconds must be positive, got $tolSeconds")
    val w = org.apache.spark.sql.expressions.Window
      .partitionBy(col("__dk")).orderBy(col("__vt"))
    val iv = dim.select(col(key).as("__dk"), col(versionTime).as("__vt"),
        col(valueCol).as("__v"))
      .withColumn("__vend", lead(col("__vt"), 1).over(w))
    events.join(broadcast(iv),
        events(key) === iv("__dk") &&
          col(eventTime) >= col("__vt") &&
          (col("__vend").isNull || col(eventTime) < col("__vend")) &&
          unix_micros(col(eventTime)) - unix_micros(col("__vt")) <=
            tolSeconds * 1000000L,
        "left")
      .select(events.columns.map(events(_)) :+ col("__v").as(asOfValueName): _*)
  }

  /** Run the stream-static as-of enrichment into a memory sink. */
  def runAsofEnrichAvailableNow(spark: SparkSession, eventsDir: String,
      dim: DataFrame, key: String, versionTime: String, valueCol: String,
      tolSeconds: Long, outName: String): StreamingQuery = {
    val src = streamSource(spark, eventsDir)
    val q = asofEnrich(src, dim, key, "ts", versionTime, valueCol, tolSeconds)
      .writeStream
      .outputMode("append")
      .format("memory")
      .queryName(outName)
      .trigger(Trigger.AvailableNow())
      .start()
    q.awaitTermination()
    q
  }

  /** Run the stream-static enrichment end-to-end into a memory sink. */
  def runEnrichAvailableNow(spark: SparkSession, eventsDir: String,
      dim: DataFrame, dimKey: String, nameCol: String,
      outName: String): StreamingQuery = {
    val src = streamSource(spark, eventsDir)
    val q = enrich(src, dim, dimKey, nameCol).writeStream
      .outputMode("append")
      .format("memory")
      .queryName(outName)
      .trigger(Trigger.AvailableNow())
      .start()
    q.awaitTermination()
    q
  }

  /** Stream-stream correlation join: each `view` event joined to
    * `purchase` events of the SAME user within one hour after it. Both
    * sides carry watermarks and the join condition bounds event time in
    * both directions, so Spark can expire join state (state is
    * O(events per watermark window), not O(stream)). The same function
    * applied to batch frames is the oracle twin. */
  def correlate(events: DataFrame): DataFrame = {
    val views = events.filter(col("event_type") === "view")
      .select(col("user_id"), col("event_id").as("view_id"), col("ts").as("view_ts"))
      .withWatermark("view_ts", "2 hours")
    val purchases = events.filter(col("event_type") === "purchase")
      .select(col("user_id").as("p_user"), col("event_id").as("purchase_id"),
        col("ts").as("purchase_ts"))
      .withWatermark("purchase_ts", "2 hours")
    views.join(purchases,
        col("user_id") === col("p_user") &&
          col("purchase_ts") >= col("view_ts") &&
          col("purchase_ts") <= col("view_ts") + expr("INTERVAL 1 HOUR"))
      .select(col("user_id"), col("view_id"), col("purchase_id"),
        col("view_ts"), col("purchase_ts"))
  }

  /** Run the stream-stream correlation end-to-end (two streaming readers
    * over the same directory) into a memory sink. */
  def runCorrelateAvailableNow(spark: SparkSession, eventsDir: String,
      outName: String): StreamingQuery = {
    def src = streamSource(spark, eventsDir)
    val q = correlate(src).writeStream
      .outputMode("append")
      .format("memory")
      .queryName(outName)
      .trigger(Trigger.AvailableNow())
      .start()
    q.awaitTermination()
    q
  }

  /** Streaming exact dedup — the streaming twin of the corpus dedup
    * family (D1): drop repeats of (user_id, event_type, ts) with state
    * bounded by the watermark (`dropDuplicatesWithinWatermark`: a key's
    * state is evicted once the watermark passes it, so state is O(keys
    * per watermark window), not O(stream)). Batch twin: dropDuplicates
    * on the same keys. */
  def dedupStream(events: DataFrame): DataFrame =
    events.withWatermark("ts", "2 hours")
      .dropDuplicatesWithinWatermark("user_id", "event_type", "ts")

  def dedupBatch(events: DataFrame): DataFrame =
    events.dropDuplicates("user_id", "event_type", "ts")

  /** Funnel analysis (e5): how many users progress through `stages` IN
    * ORDER — a user reaches stage k+1 only via an event strictly after
    * their earliest qualifying stage-k event (the standard product-
    * analytics funnel; strict `>` so a single timestamp can't satisfy
    * two stages). Output: one row per stage, `(stage_idx, stage,
    * n_users)`.
    *
    * Scale shape: stage k's cohort is a per-user 1-row frame
    * `(user_id, earliest_ts)` — each step is one equi-join of the
    * events against that cohort plus one user-keyed min aggregate, so
    * the whole funnel is `depth` hash shuffles on user_id with
    * map-side-combined mins, never a per-user event-sequence sort or a
    * collect_list of histories. Funnel depth bounds the plan, not the
    * event volume. */
  def funnel(events: DataFrame, stages: Seq[String]): DataFrame = {
    require(stages.nonEmpty, "funnel needs at least one stage")
    val cohorts = stages.tail.scanLeft(
      events.filter(col("event_type") === stages.head)
        .groupBy("user_id").agg(min("ts").as("t"))) { (prev, stage) =>
      events.join(prev.select(col("user_id"), col("t").as("t_prev")), Seq("user_id"))
        .filter(col("event_type") === stage && col("ts") > col("t_prev"))
        .groupBy("user_id").agg(min("ts").as("t"))
    }
    cohorts.zip(stages).zipWithIndex.map { case ((cohort, stage), i) =>
      cohort.agg(count(lit(1)).cast("long").as("n_users"))
        .select(lit(i + 1L).as("stage_idx"), lit(stage).as("stage"), col("n_users"))
    }.reduce(_.unionAll(_))
  }

  /** Streaming twin of [[funnel]] (e5): per-user state is one Long per
    * stage — the earliest time the user reached it under the batch
    * funnel's chained-min rule (stage k's time = min ts of stage-k
    * events STRICTLY after the final stage-(k−1) time). A single pass
    * over time-sorted events computes that rule exactly: processing
    * ascending (ts, event_id), each stage time is final the moment it
    * is set (no earlier event remains), so a stage-k event qualifies
    * iff its predecessor's final time is already set and smaller — the
    * identical quantifier the batch chain evaluates, including the
    * strict-inequality tie case in either processing order. Emits the
    * user's highest reached stage per micro-batch (latest row wins);
    * per-stage counts over the final rows ≡ the batch funnel card
    * (pinned in ScaleSpec). Cross-batch LATE data degrades gracefully:
    * a late stage-k event can only lower t(k) — never un-reach a
    * stage — and the in-order contract is the same one the decay twin
    * documents. */
  def funnelStream(events: DataFrame, stages: Seq[String]): DataFrame = {
    import org.apache.spark.sql.streaming.{GroupState, GroupStateTimeout, OutputMode}
    require(stages.nonEmpty, "funnel needs at least one stage")
    val spark = events.sparkSession
    import spark.implicits._
    val stageArr = stages.toArray
    val typed = events.select(col("user_id"), unix_micros(col("ts")).as("us"),
        col("event_id"), col("event_type"))
      .as[(Long, Long, Long, String)]
    def fn(uid: Long, evs: Iterator[(Long, Long, Long, String)],
        state: GroupState[Seq[Long]]): Iterator[FunnelOut] = {
      val sorted = evs.toArray.sortBy(e => (e._2, e._3))
      val t = state.getOption.getOrElse(Seq.fill(stageArr.length)(Long.MaxValue)).toArray
      sorted.foreach { case (_, us, _, typ) =>
        val k = stageArr.indexOf(typ)
        if (k == 0) { if (us < t(0)) t(0) = us }
        else if (k > 0 && t(k - 1) != Long.MaxValue && us > t(k - 1) && us < t(k))
          t(k) = us
      }
      state.update(t.toSeq)
      val reached = t.lastIndexWhere(_ != Long.MaxValue) + 1L
      Iterator.single(FunnelOut(uid, reached))
    }
    typed.groupByKey(_._1)
      .flatMapGroupsWithState(OutputMode.Append, GroupStateTimeout.NoTimeout)(fn)
      .toDF()
  }

  /** Drive the funnel twin over a parquet directory as a stream
    * (AvailableNow) into a memory sink. */
  def runFunnelAvailableNow(spark: SparkSession, eventsDir: String,
      stages: Seq[String], outName: String): StreamingQuery = {
    val src = streamSource(spark, eventsDir)
    val q = funnelStream(src, stages).writeStream
      .outputMode("append")
      .format("memory")
      .queryName(outName)
      .trigger(Trigger.AvailableNow())
      .start()
    q.awaitTermination()
    q
  }

  /** Run the streaming dedup end-to-end over a parquet directory into a
    * memory sink (same shape as runAvailableNow). */
  def runDedupAvailableNow(spark: SparkSession, eventsDir: String,
      outName: String): StreamingQuery = {
    val src = streamSource(spark, eventsDir)
    val q = dedupStream(src).writeStream
      .outputMode("append")
      .format("memory")
      .queryName(outName)
      .trigger(Trigger.AvailableNow())
      .start()
    q.awaitTermination()
    q
  }

  final case class SessionOut(user_id: Long, session_start: java.sql.Timestamp,
      session_end: java.sql.Timestamp, n_events: Long)

  final case class TranscriptOut(user_id: Long,
      session_start: java.sql.Timestamp, n_events: Long, transcript: String)

  final case class FunnelOut(user_id: Long, stage_reached: Long)

  final case class DecayOut(user_id: Long, n_events: Long, last_di: Long,
    score_micro: Long)
  final case class TransitionOut(user_id: Long, prev_type: String,
      next_type: String)

  /** Streaming twin of the e13 transition matrix's pair extraction:
    * per user, each event emits (prev_type, next_type) against the
    * last event held in state — O(1) state per user (the last (us,
    * event_id, type) triple), vs the batch lag window's full-history
    * shuffle. The downstream matrix is a plain streaming aggregation
    * over the emitted pairs. In-batch order is the same total
    * (us, event_id) order as the batch window, so the emitted pair
    * multiset ≡ batch (pinned in ScaleSpec). */
  def transitionStream(events: DataFrame): DataFrame = {
    import org.apache.spark.sql.streaming.{GroupState, GroupStateTimeout, OutputMode}
    val spark = events.sparkSession
    import spark.implicits._
    val typed = events.select(col("user_id"), unix_micros(col("ts")).as("us"),
        col("event_id"), col("event_type"))
      .as[(Long, Long, Long, String)]
    def fn(uid: Long, evs: Iterator[(Long, Long, Long, String)],
        state: GroupState[(Long, Long, String)]): Iterator[TransitionOut] = {
      val sorted = evs.toArray.sortBy(e => (e._2, e._3))
      var out = List.empty[TransitionOut]
      var cur = state.getOption
      sorted.foreach { case (_, us, eid, ty) =>
        cur.foreach { case (_, _, pt) => out ::= TransitionOut(uid, pt, ty) }
        cur = Some((us, eid, ty))
      }
      cur.foreach(state.update)
      out.reverseIterator
    }
    typed.groupByKey(_._1)
      .flatMapGroupsWithState(OutputMode.Append, GroupStateTimeout.NoTimeout)(fn)
      .toDF()
  }

  /** Arrival-decay engagement score (e17), batch side: each event adds
    * 10⁶ micro-points to its user's score AFTER the existing score
    * decays by one right-shift per whole week since the user's previous
    * event — the decayed-counter feature (CTR/engagement freshness)
    * with event-time semantics. Closed form: right-shifts compose
    * (a≫x≫y = a≫(x+y) for per-step shifts < 64), so event i finally
    * contributes 10⁶ ≫ min(Σ later gap-weeks, 62) — a SUFFIX sum of
    * lag-gaps, i.e. two keyed windows + one agg, no fold operator
    * needed in batch. Integer end-to-end: any partitioning, the DuckDB
    * oracle, and the O(1)-state streaming twin agree bit-for-bit
    * (contrast e10, whose decay anchors on a global reference day).
    * Output: (user_id, n_events, last_day, score_micro). */
  /** e19 — conversion-lag decile card: for every user whose first
    * `toType` event follows their first `fromType` event, the lag in
    * microseconds; the card reports the EXACT decile values (d = 0..10,
    * element at 1-based rank 1 + (n−1)·d DIV 10 under the total order
    * (lag, user_id)) — min, median, max and the shape between, integer
    * microseconds, engine-exact where an approximate percentile or a
    * float interpolation would not be. The product question behind it:
    * how long does signup→activation actually take, tail included.
    *
    * Scale shape: two type-filtered scans aggregate per user (map-side
    * combined), one user-keyed equi-join; the decile pick runs on
    * [[graft.operators.Ranking.globalRank]]'s two-level prefix-count
    * machinery — no global window over converted users (the qc13/mix6
    * discipline), and the 11-row decile frame joins against the ranked
    * frame on rank. */
  def conversionLagDeciles(events: DataFrame, fromType: String,
      toType: String): DataFrame = {
    val us = unix_micros(col("ts"))
    val firstA = events.filter(col("event_type") === fromType)
      .groupBy("user_id").agg(min(us).as("ta"))
    val lags = events.filter(col("event_type") === toType)
      .select(col("user_id"), us.as("tb"))
      .join(firstA, Seq("user_id")).filter(col("tb") > col("ta"))
      .groupBy(col("user_id"), col("ta"))
      .agg((min(col("tb")) - col("ta")).as("lag_us"))
      .select("user_id", "lag_us")
    val ranked = graft.CacheScope.persist(
      graft.operators.Ranking.globalRank(lags, col("user_id"), col("lag_us")))
    val n = ranked.agg(count(lit(1)).as("c"))
    events.sparkSession.range(0, 11).select(col("id").as("decile"))
      .crossJoin(broadcast(n))
      .select(col("decile"), expr("1 + ((c - 1) * decile) DIV 10").as("pick"))
      .join(ranked, col("pick") === col("rank"))
      .select(col("decile"), col("score").as("lag_us"))
  }

  def decayScore(events: DataFrame): DataFrame = {
    val base = events.select(col("user_id"), col("event_id"),
      datediff(to_date(col("ts")),
        lit(java.sql.Date.valueOf("1970-01-01"))).cast("long").as("di"))
    base.selectExpr("user_id", "event_id", "di",
        "(di - coalesce(lag(di) OVER (PARTITION BY user_id ORDER BY di, event_id), di)) DIV 7 AS gw")
      .selectExpr("user_id", "di",
        "sum(gw) OVER (PARTITION BY user_id ORDER BY di, event_id " +
          "ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) AS cum",
        "sum(gw) OVER (PARTITION BY user_id) AS total")
      .select(col("user_id"), col("di"),
        expr("shiftright(1000000L, CAST(least(total - cum, 62L) AS INT))").as("w"))
      .groupBy("user_id")
      .agg(count(lit(1)).cast("long").as("n_events"), max("di").as("ldi"),
        sum("w").as("score_micro"))
      .select(col("user_id"), col("n_events"),
        date_add(lit(java.sql.Date.valueOf("1970-01-01")),
          col("ldi").cast("int")).as("last_day"),
        col("score_micro"))
  }

  /** Streaming twin of [[decayScore]]: per-user state is THREE longs —
    * (count, last day index, running score) — updated per event as
    * score = (score ≫ min(gap-weeks, 62)) + 10⁶. Because per-step
    * shifts compose exactly into the batch suffix-sum form, the emitted
    * per-user row is bit-equal to the batch aggregate (pinned in
    * ScaleSpec), while the batch side's full-history windows become a
    * 24-byte value per user in the state store. In-batch order is the
    * same (di, event_id) total order as the batch windows. */
  def decayStream(events: DataFrame): DataFrame = {
    import org.apache.spark.sql.streaming.{GroupState, GroupStateTimeout, OutputMode}
    val spark = events.sparkSession
    import spark.implicits._
    val typed = events.select(col("user_id"),
        datediff(to_date(col("ts")),
          lit(java.sql.Date.valueOf("1970-01-01"))).cast("long").as("di"),
        col("event_id"))
      .as[(Long, Long, Long)]
    def fn(uid: Long, evs: Iterator[(Long, Long, Long)],
        state: GroupState[(Long, Long, Long)]): Iterator[DecayOut] = {
      val sorted = evs.toArray.sortBy(e => (e._2, e._3))
      var (cnt, last, score) = state.getOption.getOrElse((0L, 0L, 0L))
      sorted.foreach { case (_, di, _) =>
        // Clamp the gap non-negative: an event arriving in a LATER
        // micro-batch with di < state.last would otherwise feed a
        // negative shift count (Scala's >> masks mod 64 and silently
        // corrupts the score). Late data thus decays by 0 weeks —
        // stream ≡ batch still holds for in-order arrival, and
        // out-of-order arrival degrades gracefully instead of
        // corrupting state. `last` is a running MAX (batch last_day =
        // max(di)), so a late event can neither rewind the reported
        // last day nor inflate the NEXT in-order event's gap — the
        // degradation contract PropertySpec pins cross-batch.
        val gap = if (cnt == 0) 0L
          else math.min(math.max(di - last, 0L) / 7, 62L)
        score = (score >> gap.toInt) + 1000000L
        cnt += 1
        last = math.max(last, di)
      }
      state.update((cnt, last, score))
      if (cnt == 0) Iterator.empty
      else Iterator.single(DecayOut(uid, cnt, last, score))
    }
    typed.groupByKey(_._1)
      .flatMapGroupsWithState(OutputMode.Append, GroupStateTimeout.NoTimeout)(fn)
      .toDF()
  }

  /** Streaming twin of [[sessionTranscripts]] (e11): per user, event
    * types accumulate in gap-delimited session state; a CLOSED session
    * emits its ordered transcript, the open session's running type list
    * stays in state (bounded by session length, the same bound the
    * batch transcript carries). In-batch order is the total
    * (us, event_id, event_type) sort — identical to the batch twin's
    * post-aggregate array_sort, so a closed session's transcript is
    * bit-equal to the batch row (pinned in ScaleSpec). */
  def transcriptStream(events: DataFrame, gapMinutes: Int): DataFrame = {
    import org.apache.spark.sql.streaming.{GroupState, GroupStateTimeout, OutputMode}
    val spark = events.sparkSession
    import spark.implicits._
    val gapUs = gapMinutes.toLong * 60 * 1000000
    val typed = events.select(col("user_id"), unix_micros(col("ts")).as("us"),
        col("event_id"), col("event_type"))
      .as[(Long, Long, Long, String)]
    def tsOf(us: Long): java.sql.Timestamp = {
      val t = new java.sql.Timestamp(us / 1000)
      t.setNanos(((us % 1000000) * 1000).toInt)
      t
    }
    def fn(uid: Long, evs: Iterator[(Long, Long, Long, String)],
        state: GroupState[(Long, Long, Seq[String])]): Iterator[TranscriptOut] = {
      val sorted = evs.toArray.sortBy(e => (e._2, e._3, e._4))
      var out = List.empty[TranscriptOut]
      var cur = state.getOption
      sorted.foreach { case (_, t, _, ty) =>
        cur match {
          case Some((s, e, l)) if t - e <= gapUs => cur = Some((s, t, l :+ ty))
          case Some((s, e, l)) =>
            out ::= TranscriptOut(uid, tsOf(s), l.length.toLong, l.mkString("->"))
            cur = Some((t, t, Seq(ty)))
          case None => cur = Some((t, t, Seq(ty)))
        }
      }
      cur.foreach(state.update)
      out.reverseIterator
    }
    typed.groupByKey(_._1)
      .flatMapGroupsWithState(OutputMode.Append, GroupStateTimeout.NoTimeout)(fn)
      .toDF()
  }

  /** Stateful streaming sessionization via flatMapGroupsWithState
    * (§2.9 custom-state extension point): per user, events accumulate
    * into gap-delimited sessions; CLOSED sessions are emitted as soon as
    * a later event exceeds the gap, the still-open session stays in
    * state (bounded: one (start, end, count) triple per user). The batch
    * twin below emits open sessions too — tests assert exactly that
    * relationship. */
  def sessionizeStream(events: DataFrame, gapMinutes: Int): DataFrame = {
    import org.apache.spark.sql.streaming.{GroupState, GroupStateTimeout, OutputMode}
    val spark = events.sparkSession
    import spark.implicits._
    val gapUs = gapMinutes.toLong * 60 * 1000000
    val typed = events.select(col("user_id"), unix_micros(col("ts")).as("us"))
      .as[(Long, Long)]
    def tsOf(us: Long): java.sql.Timestamp = {
      val t = new java.sql.Timestamp(us / 1000)
      t.setNanos(((us % 1000000) * 1000).toInt)
      t
    }
    def fn(uid: Long, evs: Iterator[(Long, Long)],
        state: GroupState[(Long, Long, Long)]): Iterator[SessionOut] = {
      val sorted = evs.map(_._2).toArray.sorted
      var out = List.empty[SessionOut]
      var cur = state.getOption
      sorted.foreach { t =>
        cur match {
          case Some((s, e, n)) if t - e <= gapUs => cur = Some((s, t, n + 1))
          case Some((s, e, n)) =>
            out ::= SessionOut(uid, tsOf(s), tsOf(e), n)
            cur = Some((t, t, 1))
          case None => cur = Some((t, t, 1))
        }
      }
      cur.foreach(state.update)
      out.reverseIterator
    }
    typed.groupByKey(_._1)
      .flatMapGroupsWithState(OutputMode.Append, GroupStateTimeout.NoTimeout)(fn)
      .toDF()
  }

  /** Gap-based per-user sessionization (batch/deterministic form of the
    * `mapGroupsWithState` session op): a new session starts when the gap
    * to the previous event exceeds `gapMinutes`. Single shuffle on
    * user_id; the running sum stays inside the same window partition. */
  def sessionize(events: DataFrame, gapMinutes: Int): DataFrame =
    withSessionIds(events, gapMinutes)
      .groupBy(col("user_id"), col("sess_id"))
      .agg(min(col("ts")).as("session_start"), max(col("ts")).as("session_end"),
        count(lit(1)).as("n_events"))
      .drop("sess_id")

  /** Gaps-and-islands session ids shared by [[sessionize]] and
    * [[sessionTranscripts]]: two windows on ONE user_id shuffle. */
  private def withSessionIds(events: DataFrame, gapMinutes: Int): DataFrame = {
    val gapUs = gapMinutes.toLong * 60 * 1000000
    import org.apache.spark.sql.expressions.Window
    val w = Window.partitionBy(col("user_id")).orderBy(col("ts"), col("event_id"))
    events
      .withColumn("prev_ts", lag(col("ts"), 1).over(w))
      .withColumn("new_sess",
        (col("prev_ts").isNull ||
          unix_micros(col("ts")) - unix_micros(col("prev_ts")) > gapUs).cast("int"))
      .withColumn("sess_id", sum(col("new_sess")).over(
        w.rowsBetween(Window.unboundedPreceding, 0)))
  }

  /** Session transcript materialization (e11): each session serialized
    * into its ordered event-type string — the interaction-log-to-
    * training-example step (raw event streams become sequence examples
    * the way tx13 turns packed chunks into trainer text). Order inside
    * a session is the total (ts, event_id) order, imposed by sorting
    * the collected struct list AFTER the aggregate — `collect_list`
    * alone has no order guarantee under partitioned execution, so the
    * sort is what makes the transcript deterministic on any layout.
    * Same one-shuffle session machinery as [[sessionize]]; transcripts
    * are bounded by session length, not corpus size. */
  def sessionTranscripts(events: DataFrame, gapMinutes: Int): DataFrame =
    withSessionIds(events, gapMinutes)
      .groupBy(col("user_id"), col("sess_id"))
      .agg(min(col("ts")).as("session_start"),
        count(lit(1)).as("n_events"),
        concat_ws("->", expr(
          "transform(array_sort(collect_list(struct(ts, event_id, event_type))), x -> x.event_type)"))
          .as("transcript"))
      .drop("sess_id")
}
