package graft

import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite
import graft.operators.Temporal

/** As-of / range join semantics: tie-at-boundary, no-preceding-version,
  * latest-of-several, key isolation. */
class TemporalSpec extends AnyFunSuite {
  lazy val spark = TestSpark.spark
  import spark.implicits._

  private def ts(s: String) = java.sql.Timestamp.valueOf(s)

  test("asofJoin picks the latest version at or before each event") {
    val events = Seq(
      (1L, 100L, ts("2024-01-01 10:00:00")), // before any version → null
      (2L, 100L, ts("2024-01-01 12:00:00")), // exactly at v1 → v1 (tie matches)
      (3L, 100L, ts("2024-01-01 13:30:00")), // between v1 and v2 → v1
      (4L, 100L, ts("2024-01-01 15:00:00")), // after v2 → v2
      (5L, 200L, ts("2024-01-01 23:00:00"))  // other key: only its own versions
    ).toDF("event_id", "user_id", "ts")
    val versions = Seq(
      (100L, ts("2024-01-01 12:00:00"), "A"),
      (100L, ts("2024-01-01 14:00:00"), "B"),
      (200L, ts("2024-01-01 00:00:00"), "Z")
    ).toDF("user_id", "valid_from", "state")
    val got = Temporal.asofJoin(events, versions, "user_id", "ts",
        "valid_from", "state", "asof_state")
      .select("event_id", "asof_state").as[(Long, Option[String])]
      .collect().toMap
    assert(got == Map(1L -> None, 2L -> Some("A"), 3L -> Some("A"),
      4L -> Some("B"), 5L -> Some("Z")))
  }

  test("asofJoin preserves left row count and columns (left semantics)") {
    val events = Seq((1L, 9L, ts("2024-01-01 10:00:00"))).toDF("event_id", "user_id", "ts")
    val versions = Seq((8L, ts("2024-01-01 09:00:00"), "X"))
      .toDF("user_id", "valid_from", "state")
    val out = Temporal.asofJoin(events, versions, "user_id", "ts", "valid_from", "state")
    assert(out.columns.toSeq == Seq("event_id", "user_id", "ts", "asof_value"))
    assert(out.count() == 1 && out.filter(col("asof_value").isNull).count() == 1)
  }

  test("asofJoin == brute-force latest-version on random data") {
    val rnd = new scala.util.Random(42)
    for (_ <- 1 to 5) {
      val events = (1 to 60).map(i =>
        (i.toLong, (rnd.nextInt(4) + 1).toLong, ts(f"2024-01-01 ${rnd.nextInt(24)}%02d:${rnd.nextInt(60)}%02d:00")))
      val versions = (1 to 20).map(i =>
        ((rnd.nextInt(4) + 1).toLong, ts(f"2024-01-01 ${rnd.nextInt(24)}%02d:${rnd.nextInt(60)}%02d:00"), s"s$i"))
        // unique per (key, time): keep the last generated, like the
        // operator's pre-dedupe contract
        .groupBy(v => (v._1, v._2)).map(_._2.last).toSeq
      val expected = events.map { case (id, k, t) =>
        val cand = versions.filter(v => v._1 == k && !v._2.after(t))
        id -> (if (cand.isEmpty) None else Some(cand.maxBy(_._2.getTime)._3))
      }.toMap
      val got = Temporal.asofJoin(events.toDF("event_id", "user_id", "ts"),
          versions.toDF("user_id", "valid_from", "state"),
          "user_id", "ts", "valid_from", "state")
        .select("event_id", "asof_value").as[(Long, Option[String])]
        .collect().toMap
      assert(got == expected)
    }
  }

  test("rangeJoin matches only intervals containing the timestamp, per key") {
    val events = Seq(
      (1L, 7L, ts("2024-01-01 10:30:00")),
      (2L, 7L, ts("2024-01-01 13:00:00")),
      (3L, 8L, ts("2024-01-01 10:30:00"))).toDF("event_id", "user_id", "ts")
    val wins = Seq(
      (7L, ts("2024-01-01 10:00:00"), ts("2024-01-01 11:00:00"), 91L),
      (8L, ts("2024-01-01 10:00:00"), ts("2024-01-01 11:00:00"), 92L)
    ).toDF("user_id", "w_start", "w_end", "w_id")
    val got = Temporal.rangeJoin(events, wins, "user_id", "ts", "w_start", "w_end")
      .select("event_id", "w_id").as[(Long, Long)].collect().toSet
    assert(got == Set((1L, 91L), (3L, 92L))) // event 2 outside; keys isolated
  }

  test("rangeJoinBucketed ≡ naive range join; oversized interval fails loudly") {
    // windows up to 1h, probes scattered across bucket boundaries —
    // including a probe in a bucket the window only REACHES via its end
    val probes = Seq(
      (1L, ts("2024-01-01 10:59:00")), (2L, ts("2024-01-01 11:01:00")),
      (3L, ts("2024-01-01 12:30:00")), (4L, ts("2024-01-01 09:00:00")))
      .toDF("event_id", "ts")
    val wins = Seq(
      (91L, ts("2024-01-01 10:30:00"), ts("2024-01-01 11:15:00")),
      (92L, ts("2024-01-01 11:00:00"), ts("2024-01-01 12:00:00")),
      (93L, ts("2024-01-01 12:30:00"), ts("2024-01-01 12:30:00")))
      .toDF("w_id", "w_start", "w_end")
    val got = Temporal.rangeJoinBucketed(probes, "ts", wins,
        "w_start", "w_end", 3600000000L)
      .select("event_id", "w_id").as[(Long, Long)].collect().toSet
    val naive = probes.join(wins,
        col("ts") >= col("w_start") && col("ts") <= col("w_end"))
      .select("event_id", "w_id").as[(Long, Long)].collect().toSet
    assert(got == naive && got ==
      Set((1L, 91L), (2L, 91L), (2L, 92L), (3L, 93L)))
    // a window longer than the bucket would silently drop matches —
    // the operator must refuse it instead
    val tooLong = Seq((99L, ts("2024-01-01 10:00:00"), ts("2024-01-01 11:30:00")))
      .toDF("w_id", "w_start", "w_end")
    val err = intercept[IllegalArgumentException] {
      Temporal.rangeJoinBucketed(probes, "ts", tooLong,
        "w_start", "w_end", 3600000000L).collect()
    }
    assert(err.getMessage.contains("exceeds"))
  }

  test("mergeIntervals: overlap and touch merge, gaps split, keys isolated, duplicates counted") {
    val iv = Seq(
      (7L, 0L, 10L), (7L, 5L, 20L),   // overlap → one island
      (7L, 20L, 30L),                 // touches previous end → same island
      (7L, 32L, 40L),                 // gap of 2 → new island
      (7L, 33L, 35L),                 // contained → same island
      (8L, 0L, 10L),                  // other key untouched
      (8L, 0L, 10L)                   // exact duplicate → counted, same island
    ).toDF("user_id", "s0", "e0")
    val got = Temporal.mergeIntervals(iv, col("user_id"), col("s0"), col("e0"))
      .as[(Long, Long, Long, Long)].collect().sortBy(r => (r._1, r._2))
    assert(got.toSeq == Seq(
      (7L, 0L, 30L, 3L), (7L, 32L, 40L, 2L), (8L, 0L, 10L, 2L)))
  }
}
