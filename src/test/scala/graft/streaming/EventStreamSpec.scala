package graft.streaming

import org.scalatest.funsuite.AnyFunSuite
import org.apache.spark.sql.functions._

/** Streaming results must equal the equivalent batch aggregation over the
  * same input (exactly-once file-source semantics).
  */
class EventStreamSpec extends AnyFunSuite {
  private lazy val spark = graft.engine.EngineSpec.spark

  private def eventsDir: String = {
    val dir = graft.engine.EngineSpec.tmpDir("events")
    // one time-sorted file: the file stream processes it in a single
    // trigger, so no event is late w.r.t. the watermark and the streaming
    // result is exactly the batch result
    spark.read.parquet("/root/testdata/sf0.001/events.parquet")
      .coalesce(1).sortWithinPartitions("ts")
      .write.mode("overwrite").parquet(dir)
    dir
  }

  test("windowed counts: streaming equals batch") {
    val dir = eventsDir
    val q = EventStream.runOnce(spark, dir, "win_counts", EventStream.windowedCounts)
    q.processAllAvailable()
    q.stop()
    val streamed = spark.sql("SELECT * FROM win_counts")
    val batch = EventStream.windowedCounts(spark.read.parquet(dir))
    // compare integer columns (epoch seconds for the window; double sums
    // and timestamp object rendering differ between the two paths)
    val key = Seq("date_format(window_start, 'yyyy-MM-dd HH:mm') AS ws", "event_type", "n")
    val s = streamed.selectExpr(key: _*).collect().map(_.toString).toSet
    val b = batch.selectExpr(key: _*).collect().map(_.toString).toSet
    assert(s.nonEmpty)
    // append mode emits only watermark-closed windows: the streamed result
    // is the batch result minus the unclosed tail (within the 10-min
    // watermark of the max event time)
    assert(s.subsetOf(b), s"streamed rows must be a subset of batch")
    assert(s.size >= b.size - 5,
      s"all but the tail windows must have closed: ${s.size} of ${b.size}")
  }

  test("per-user totals in complete mode") {
    val dir = eventsDir
    val q = EventStream.runOnce(spark, dir, "user_totals",
      EventStream.perUserTotals, outputMode = "complete")
    q.processAllAvailable()
    q.stop()
    val streamed = spark.sql("SELECT * FROM user_totals")
    val nUsers = spark.read.parquet(dir).select("user_id").distinct().count()
    assert(streamed.count() == nUsers)
    assert(streamed.agg(sum(col("n_events"))).first().getLong(0) ==
      spark.read.parquet(dir).count())
  }
}
