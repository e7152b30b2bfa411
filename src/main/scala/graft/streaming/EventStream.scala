package graft.streaming

import java.util.concurrent.atomic.AtomicInteger

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

/** Structured Streaming over the events table: watermarked, windowed
  * aggregation driven synchronously from a batch parquet source (memory
  * sink + processAllAvailable — the local smoke pattern).
  *
  * The reference is a batch engine with streamed execution (SURVEY.md §2.9);
  * this module adds genuine event-time streaming for incremental pipelines:
  * the same windowed aggregation works unchanged on a live file/kafka source.
  */
object EventStream {

  private val counter = new AtomicInteger(0)

  /** Streaming source over the events table. The table is a single parquet
    * file, so the file-stream source watches the parent dir with a glob
    * filter (a real deployment points this at an arriving-files directory).
    * TIMESTAMP_NTZ is cast to TIMESTAMP for event-time ops (session tz is
    * pinned to UTC, so the instant is unchanged).
    */
  private def readEvents(spark: SparkSession, sfDir: String) = {
    val schema = spark.read.parquet(s"$sfDir/events.parquet").schema
    spark.readStream.schema(schema)
      .option("pathGlobFilter", "events.parquet")
      .parquet(sfDir)
      .withColumn("ts", col("ts").cast("timestamp"))
  }

  /** Start the memory-sink stream, drain it, optionally wait for the
    * append-mode eviction batch, stop, and return the result table.
    * Deliberately keeps Spark's AUTO-MANAGED temporary checkpoint: an
    * explicit `checkpointLocation` was A/B-measured ~1 s SLOWER per run at
    * bench scale (the managed temp path has a cheaper lifecycle), even when
    * pointed at tmpfs — so the r6 attempt to relocate it was reverted on
    * the measurement (guide §1: re-measure after each change).
    */
  private def runStream(spark: SparkSession, agg: DataFrame, name: String,
                        mode: String, awaitEvict: Boolean): DataFrame = {
    val q = agg.writeStream.outputMode(mode).format("memory")
      .queryName(name).start()
    try {
      q.processAllAvailable()
      if (awaitEvict) awaitEvictionBatch(q, name)
    } finally q.stop()
    spark.table(name)
  }

  /** 5-minute tumbling-window counts/sums per event_type. Runs the stream to
    * completion over the static parquet and returns the result table.
    */
  def windowedEventAgg(spark: SparkSession, sfDir: String): DataFrame = {
    val stream = readEvents(spark, sfDir)
    val agg = stream
      .withWatermark("ts", "10 minutes")
      .groupBy(window(col("ts"), "5 minutes"), col("event_type"))
      .agg(count(lit(1)).as("n_events"),
        round(sum(col("value")), 4).as("sum_value"))
    val name = s"stream_events_${counter.incrementAndGet()}"
    runStream(spark, agg, name, "complete", awaitEvict = false)
      .select(col("window.start").as("win_start"), col("event_type"),
        col("n_events"), col("sum_value"))
      .orderBy("win_start", "event_type")
  }

  /** The APPEND-MODE twin of [[windowedEventAgg]] — the shape that scales:
    * complete-mode + memory sink re-emits (and driver-holds) the ENTIRE
    * aggregate every batch, fine only as a local smoke gate; append mode +
    * watermark EVICTS each window's state once the watermark passes its end
    * and emits it exactly once, so state is bounded by the watermark horizon
    * regardless of stream length — the 100 TB/unbounded-stream design.
    * Windows still open at end-of-input (end > final watermark = max ts -
    * delay) are absent by design; EventStreamSpec pins the closed-set
    * predicate against the batch result, and the driver gate's oracle
    * applies the same restriction in SQL.
    */
  def windowedEventAggAppend(spark: SparkSession, sfDir: String,
                             watermark: String = "10 minutes"): DataFrame = {
    val agg = readEvents(spark, sfDir)
      .withWatermark("ts", watermark)
      .groupBy(window(col("ts"), "5 minutes"), col("event_type"))
      .agg(count(lit(1)).as("n_events"),
        round(sum(col("value")), 4).as("sum_value"))
    val name = s"stream_events_append_${counter.incrementAndGet()}"
    runStream(spark, agg, name, "append", awaitEvict = true)
      .select(col("window.start").as("win_start"), col("event_type"),
        col("n_events"), col("sum_value"))
      .orderBy("win_start", "event_type")
  }

  /** Gap-based sessionization with the native `session_window` operator:
    * events of a user belong to one session while each is < `gap` after the
    * previous; session end = last event + gap (Spark merged-session
    * semantics). Batch form — the identical aggregation runs as a stream in
    * `sessionizeStream` (asserted equal in EventStreamSpec), which is the
    * point of declaring it on the DataFrame API: one plan, both runtimes.
    * Scale shape: one exchange keyed on user_id, sessions merged inside the
    * aggregation — never a self-join or window-function sort over all events.
    */
  def sessionize(spark: SparkSession, sfDir: String,
                 gap: String = "24 hours"): DataFrame =
    sessionAgg(spark.read.parquet(s"$sfDir/events.parquet")
      .withColumn("ts", col("ts").cast("timestamp")), gap)

  /** The same sessionization as a Structured Stream. Streaming session
    * windows REQUIRE append mode (anything else would pin unbounded session
    * state), so a session is emitted exactly once — when the watermark passes
    * its end and it can no longer grow. Sessions still open at end-of-input
    * are therefore absent by design; EventStreamSpec asserts the emitted set
    * equals the batch result restricted to watermark-closed sessions.
    */
  def sessionizeStream(spark: SparkSession, sfDir: String,
                       gap: String = "24 hours",
                       watermark: String = "10 minutes"): DataFrame = {
    val agg = sessionAgg(
      readEvents(spark, sfDir).withWatermark("ts", watermark), gap)
    val name = s"stream_sessions_${counter.incrementAndGet()}"
    // append-mode eviction happens in a NO-DATA micro-batch after the last
    // data batch (the watermark only advances at batch end), and
    // processAllAvailable doesn't wait for it — runStream blocks until a
    // committed batch with zero input rows proves the eviction pass ran
    runStream(spark, agg, name, "append", awaitEvict = true)
      .orderBy("user_id", "sess_start")
  }

  /** Block until a committed micro-batch with ZERO input rows proves the
    * append-mode watermark-eviction pass ran. THROWS on timeout instead of
    * returning: a silently incomplete session/window set would make a
    * downstream hash-compare fail confusingly — or worse, pass vacuously on
    * an empty result.
    */
  private def awaitEvictionBatch(q: org.apache.spark.sql.streaming.StreamingQuery,
                                 who: String, timeoutSec: Int = 30): Unit = {
    val deadline = System.nanoTime() + timeoutSec * 1000L * 1000 * 1000
    while ((q.lastProgress == null || q.lastProgress.numInputRows != 0) &&
           System.nanoTime() < deadline) Thread.sleep(10)
    if (q.lastProgress == null || q.lastProgress.numInputRows != 0)
      throw new IllegalStateException(s"[$who] no zero-input micro-batch " +
        s"observed within $timeoutSec s — watermark eviction did not run, " +
        "the emitted result would be incomplete " +
        "(is spark.sql.streaming.noDataMicroBatches.enabled=false?)")
  }

  private def sessionAgg(events: DataFrame, gap: String): DataFrame =
    events
      .groupBy(col("user_id"), session_window(col("ts"), gap).as("sw"))
      .agg(count(lit(1)).as("n_events"),
        round(sum(col("value")), 4).as("sum_value"))
      .select(col("user_id"), col("sw.start").as("sess_start"),
        col("sw.end").as("sess_end"), col("n_events"), col("sum_value"))

  /** Custom streaming state via flatMapGroupsWithState: per-user running
    * totals held in explicit GroupState (the mapGroups analog of the
    * reference's UB-PSI server-side cached state, psi/wrapper cache updates).
    * Emits one row per user per micro-batch with the running aggregate; on a
    * static input (one batch) the emission equals the batch groupBy — the
    * equivalence EventStreamSpec asserts.
    */
  def statefulUserTotals(spark: SparkSession, sfDir: String): DataFrame = {
    import spark.implicits._
    import org.apache.spark.sql.streaming.{GroupState, GroupStateTimeout, OutputMode}
    val stream = readEvents(spark, sfDir)
      .select(col("user_id"), col("value"))
      .as[(Long, Double)]
    val updated = stream.groupByKey(_._1)
      .flatMapGroupsWithState[(Long, Double), (Long, Long, Double)](
        OutputMode.Update(), GroupStateTimeout.NoTimeout()) {
        (user: Long, rows: Iterator[(Long, Double)],
         state: GroupState[(Long, Double)]) =>
          val (n0, s0) = state.getOption.getOrElse((0L, 0.0))
          var n = n0; var s = s0
          rows.foreach { r => n += 1; s += r._2 }
          state.update((n, s))
          Iterator((user, n, s))
      }
      .toDF("user_id", "n_events", "sum_value")
      .withColumn("sum_value", round(col("sum_value"), 4))
    val name = s"stream_state_${counter.incrementAndGet()}"
    runStream(spark, updated, name, "update", awaitEvict = false)
      .orderBy("user_id")
  }

  /** Per-user hourly activity (tumbling window). For genuine custom state
    * see `statefulUserTotals` (flatMapGroupsWithState); for gap sessions see
    * `sessionize`/`sessionizeStream` (native session_window).
    */
  def perUserActivity(spark: SparkSession, sfDir: String): DataFrame = {
    val stream = readEvents(spark, sfDir)
    val agg = stream
      .withWatermark("ts", "30 minutes")
      .groupBy(col("user_id"), window(col("ts"), "1 hour"))
      .agg(count(lit(1)).as("n"), approx_count_distinct("event_type").as("kinds"))
    val name = s"stream_users_${counter.incrementAndGet()}"
    runStream(spark, agg, name, "complete", awaitEvict = false)
      .select(col("user_id"), col("window.start").as("win_start"), col("n"))
      .orderBy("user_id", "win_start")
  }

  /** The APPEND-MODE twin of [[perUserActivity]] — same construction as
    * [[windowedEventAggAppend]]: complete-mode + memory sink re-emits (and
    * driver-holds) the ENTIRE per-user aggregate each batch, fine only as a
    * local smoke gate; with append mode the watermark EVICTS each (user,
    * window) group's state once it passes the window end and emits it
    * exactly once, so state is bounded by the watermark horizon regardless
    * of stream length. Windows still open at end-of-input (end > max ts -
    * 30 min) are absent by design; the driver gate's oracle applies the
    * same watermark-closed restriction in SQL.
    */
  def perUserActivityAppend(spark: SparkSession, sfDir: String,
                            watermark: String = "30 minutes"): DataFrame = {
    val agg = readEvents(spark, sfDir)
      .withWatermark("ts", watermark)
      .groupBy(col("user_id"), window(col("ts"), "1 hour"))
      .agg(count(lit(1)).as("n"), approx_count_distinct("event_type").as("kinds"))
    val name = s"stream_users_append_${counter.incrementAndGet()}"
    runStream(spark, agg, name, "append", awaitEvict = true)
      .select(col("user_id"), col("window.start").as("win_start"), col("n"))
      .orderBy("user_id", "win_start")
  }
}
