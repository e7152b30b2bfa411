package graft

import java.sql.Timestamp

import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

import graft.streaming.EventStream

/** Event-time streaming operators over a synthetic events table: native
  * session_window sessionization (stream ≡ batch on the same plan) and
  * explicit flatMapGroupsWithState running state (stream ≡ batch groupBy).
  */
class EventStreamSpec extends AnyFunSuite {
  lazy val spark = TestSpark.spark
  import spark.implicits._

  /** Deterministic events: user 1 has two bursts 30h apart (two sessions at a
    * 24h gap), user 2 a single burst, user 3 events exactly 24h apart (the
    * boundary edge: Spark's session end is INCLUSIVE — an event at exactly
    * prev + gap extends the session, so they chain into ONE session).
    */
  private val base = java.time.Instant.parse("2024-03-01T00:00:00Z").toEpochMilli
  private def ts(hours: Double) = new Timestamp(base + (hours * 3600 * 1000).toLong)

  lazy val eventsDir: String = {
    val rows = Seq(
      (1L, ts(0.0), "click", 1.0), (1L, ts(0.5), "view", 2.0),
      (1L, ts(1.0), "click", 3.0),
      (1L, ts(31.0), "view", 4.0), (1L, ts(31.2), "click", 5.0),
      (2L, ts(2.0), "view", 10.0), (2L, ts(3.0), "view", 20.0),
      (3L, ts(0.0), "click", 7.0), (3L, ts(24.0), "click", 8.0),
      (3L, ts(48.0), "click", 9.0))
    val df = rows.zipWithIndex.map { case ((u, t, e, v), i) =>
      (i.toLong, t, u, e, v, """{"k": 1}""")
    }.toDF("event_id", "ts", "user_id", "event_type", "value", "props")
    val dir = s"${TestSpark.workDir}/events_fixture"
    // EventStream's file-stream source glob expects a single parquet FILE
    // named events.parquet (the testdata shape) — rename the part file
    val tmp = s"$dir/_tmp_events"
    df.coalesce(1).write.mode("overwrite").parquet(tmp)
    val part = new java.io.File(tmp).listFiles()
      .find(_.getName.endsWith(".parquet")).get
    java.nio.file.Files.createDirectories(java.nio.file.Paths.get(dir))
    java.nio.file.Files.move(part.toPath,
      java.nio.file.Paths.get(s"$dir/events.parquet"),
      java.nio.file.StandardCopyOption.REPLACE_EXISTING)
    dir
  }

  test("session_window: gap merge + exclusive end edge, stream == batch") {
    val batch = EventStream.sessionize(spark, eventsDir)
      .as[(Long, Timestamp, Timestamp, Long, Double)].collect().toSet
    // user 1: two sessions (3 then 2 events); user 2: one (2 events);
    // user 3: exactly-24h gaps chain (inclusive end) → ONE 3-event session
    assert(batch.count(_._1 == 1L) == 2)
    assert(batch.count(_._1 == 2L) == 1)
    assert(batch.count(_._1 == 3L) == 1)
    assert(batch.find(_._1 == 3L).get._4 == 3)
    val s1 = batch.filter(_._1 == 1L).toSeq.sortBy(_._2.getTime)
    assert(s1.head._4 == 3 && s1.head._5 == 6.0)
    // session end = last event + gap
    assert(s1.head._3.getTime - s1.head._2.getTime == (1 + 24) * 3600 * 1000L)
    // append-mode stream emits exactly the sessions the final watermark
    // (max ts - 10 min) has closed; open sessions are held back by design
    val stream = EventStream.sessionizeStream(spark, eventsDir)
      .as[(Long, Timestamp, Timestamp, Long, Double)].collect().toSet
    val maxTs = ts(48.0).getTime
    val closed = batch.filter(_._3.getTime <= maxTs - 10 * 60 * 1000L)
    assert(closed.nonEmpty && closed != batch,
      "fixture must have both closed and open sessions")
    assert(stream == closed,
      s"streamed sessions must equal the watermark-closed batch set: $stream vs $closed")
  }

  test("tumbling windows: append-mode stream == batch restricted to watermark-closed windows") {
    val batch = EventStream.windowedEventAgg(spark, eventsDir)
      .as[(Timestamp, String, Long, Double)].collect().toSet
    val append = EventStream.windowedEventAggAppend(spark, eventsDir)
      .as[(Timestamp, String, Long, Double)].collect().toSet
    // final watermark = max ts - 10 min; append emits windows with
    // end (= start + 5 min) <= watermark — same predicate as session windows
    val maxTs = ts(48.0).getTime
    val closed = batch.filter(_._1.getTime + 5 * 60 * 1000L <=
      maxTs - 10 * 60 * 1000L)
    assert(closed.nonEmpty && closed != batch,
      "fixture must have both closed and open windows")
    assert(append == closed,
      s"append-mode windows must equal the watermark-closed batch set: " +
        s"${append.size} vs ${closed.size}")
  }

  test("per-user windows: append-mode stream == complete restricted to watermark-closed windows") {
    val complete = EventStream.perUserActivity(spark, eventsDir)
      .as[(Long, Timestamp, Long)].collect().toSet
    val append = EventStream.perUserActivityAppend(spark, eventsDir)
      .as[(Long, Timestamp, Long)].collect().toSet
    // final watermark = max ts - 30 min; append emits (user, window) groups
    // with end (= start + 1 h) <= watermark
    val maxTs = ts(48.0).getTime
    val closed = complete.filter(_._2.getTime + 3600 * 1000L <=
      maxTs - 30 * 60 * 1000L)
    assert(closed.nonEmpty && closed != complete,
      "fixture must have both closed and open per-user windows")
    assert(append == closed,
      s"append-mode per-user windows must equal the watermark-closed set: " +
        s"${append.size} vs ${closed.size}")
  }

  test("flatMapGroupsWithState running totals == batch groupBy") {
    val got = EventStream.statefulUserTotals(spark, eventsDir)
      .as[(Long, Long, Double)].collect().toSet
    val want = spark.read.parquet(s"$eventsDir/events.parquet")
      .groupBy("user_id")
      .agg(count(lit(1)).as("n"), round(sum("value"), 4).as("s"))
      .as[(Long, Long, Double)].collect().toSet
    assert(got == want)
  }
}
