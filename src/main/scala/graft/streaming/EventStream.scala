package graft.streaming

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.streaming.{StreamingQuery, Trigger}
import org.apache.spark.sql.types.StructType

/** Structured Streaming surface for the engine: event-time windowed
  * aggregation with watermarking over the `events` table shape
  * (event_id, ts, user_id, event_type, value, props).
  *
  * The crawl loop itself is iterative batch (the reference has no
  * event-time semantics — SURVEY.md §2.8); this module covers the
  * streaming-analytics side of the pipeline: counters/rates over a live
  * event feed, the streaming twin of the batch events_topk/sessions
  * queries.
  */
object EventStream {

  val eventsSchema: StructType = StructType.fromDDL(
    "event_id bigint, ts timestamp, user_id bigint, event_type string, " +
      "value double, props string")

  /** 5-minute tumbling windows per event_type with a 10-minute watermark:
    * count + sum(value). Late events beyond the watermark are dropped —
    * the at-scale contract for unbounded inputs.
    */
  def windowedCounts(events: DataFrame): DataFrame =
    events
      .withWatermark("ts", "10 minutes")
      .groupBy(window(col("ts"), "5 minutes"), col("event_type"))
      .agg(count(lit(1)).as("n"), sum(col("value")).as("total_value"))
      .select(col("window.start").as("window_start"), col("event_type"),
        col("n"), col("total_value"))

  /** Per-user running event counts (complete-mode aggregate). */
  def perUserTotals(events: DataFrame): DataFrame =
    events.groupBy(col("user_id"))
      .agg(count(lit(1)).as("n_events"),
        approx_count_distinct(col("event_type")).as("n_types"))

  /** File-source stream over a parquet directory → memory sink, processed
    * synchronously (the local-mode test harness; swap source/sink for
    * Kafka in production).
    */
  def runOnce(spark: SparkSession, dir: String, queryName: String,
              transform: DataFrame => DataFrame,
              outputMode: String = "append"): StreamingQuery = {
    val stream = spark.readStream
      .schema(eventsSchema)
      .parquet(dir)
    val q = transform(stream).writeStream
      .outputMode(outputMode)
      .format("memory")
      .queryName(queryName)
      .trigger(Trigger.AvailableNow())
      .start()
    q
  }
}
