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
    val q = agg.writeStream
      .outputMode("complete")
      .format("memory")
      .queryName(name)
      .start()
    try { q.processAllAvailable() } finally { q.stop() }
    spark.table(name)
      .select(col("window.start").as("win_start"), col("event_type"),
        col("n_events"), col("sum_value"))
      .orderBy("win_start", "event_type")
  }

  /** Stateful sessionization demo: per-user event counts with
    * flatMapGroupsWithState-equivalent semantics via windowed dedup — kept
    * as a simple per-user tumbling session count here.
    */
  def perUserActivity(spark: SparkSession, sfDir: String): DataFrame = {
    val stream = readEvents(spark, sfDir)
    val agg = stream
      .withWatermark("ts", "30 minutes")
      .groupBy(col("user_id"), window(col("ts"), "1 hour"))
      .agg(count(lit(1)).as("n"), approx_count_distinct("event_type").as("kinds"))
    val name = s"stream_users_${counter.incrementAndGet()}"
    val q = agg.writeStream.outputMode("complete").format("memory")
      .queryName(name).start()
    try { q.processAllAvailable() } finally { q.stop() }
    spark.table(name)
      .select(col("user_id"), col("window.start").as("win_start"), col("n"))
      .orderBy("user_id", "win_start")
  }
}
