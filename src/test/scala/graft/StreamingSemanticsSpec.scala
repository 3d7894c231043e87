package graft

import org.apache.spark.sql.execution.streaming.runtime.MemoryStream
import org.apache.spark.sql.functions._
import org.apache.spark.sql.streaming.{GroupState, GroupStateTimeout, OutputMode}
import java.sql.Timestamp

/** Pins the streaming semantics the registry queries rely on (SURVEY.md §5.2):
  * watermark late-data drop, per-record rolling state (the reference's I6
  * semantics via flatMapGroupsWithState), and batch-vs-stream equivalence. */
class StreamingSemanticsSpec extends SparkSpec {
  import spark.implicits._

  private def ts(s: String) = Timestamp.valueOf(s)

  test("watermark drops late data in append-mode windowed aggregation") {
    implicit val sqlCtx = spark.sqlContext
    val input = MemoryStream[(Timestamp, Double)]
    val agg = input.toDF().toDF("ts", "v")
      .withWatermark("ts", "10 minutes")
      .groupBy(window(col("ts"), "1 hour").as("w"))
      .agg(count(lit(1)).as("n"))
      .select(col("w.start").as("ws"), col("n"))
    val q = agg.writeStream.outputMode(OutputMode.Append)
      .format("memory").queryName("wm_test").start()
    try {
      // batch 1: two events in the 10:00 window
      input.addData((ts("2024-01-01 10:05:00"), 1.0), (ts("2024-01-01 10:20:00"), 1.0))
      q.processAllAvailable()
      // batch 2: event far ahead — advances watermark past 10:00+1h+10m,
      // which finalizes and emits the 10:00 window
      input.addData((ts("2024-01-01 13:00:00"), 1.0))
      q.processAllAvailable()
      // batch 3: LATE event for the already-finalized 10:00 window → dropped
      input.addData((ts("2024-01-01 10:30:00"), 1.0))
      q.processAllAvailable()
      val rows = spark.table("wm_test")
        .select("ws", "n").as[(Timestamp, Long)].collect().toMap
      assert(rows(ts("2024-01-01 10:00:00")) == 2L,
        s"10:00 window must hold only the 2 on-time events, got $rows")
    } finally q.stop()
  }

  test("flatMapGroupsWithState emits a refreshed rolling sum per input batch (I6)") {
    implicit val sqlCtx = spark.sqlContext
    val input = MemoryStream[(String, Int)]
    val rolled = input.toDS()
      .groupByKey(_._1)
      .flatMapGroupsWithState[Long, (String, Long)](
        OutputMode.Update, GroupStateTimeout.NoTimeout) {
        (key: String, rows: Iterator[(String, Int)], state: GroupState[Long]) =>
          val total = state.getOption.getOrElse(0L) + rows.map(_._2.toLong).sum
          state.update(total)
          Iterator((key, total))
      }
    val q = rolled.toDF("word", "total").writeStream
      .outputMode(OutputMode.Update).format("memory").queryName("roll_test").start()
    try {
      input.addData(("a", 1), ("b", 2), ("a", 3))
      q.processAllAvailable()
      input.addData(("a", 10))
      q.processAllAvailable()
      val updates = spark.table("roll_test").as[(String, Long)].collect().toSeq
      // batch 1 emits a→4, b→2; batch 2 emits a→14 (refreshed rolling state)
      assert(updates.contains(("a", 4L)) && updates.contains(("b", 2L))
        && updates.contains(("a", 14L)), s"got $updates")
    } finally q.stop()
  }

  test("streaming final state equals batch aggregation (Dataflow equivalence)") {
    val streamed = streaming.StreamingQueries.streamRollingSum(spark, sf)
      .collect().map(r => (r.getLong(0), r.getLong(1), r.getDouble(2))).toSeq
    val batch = Tables.events(spark, sf)
      .groupBy("user_id")
      .agg(count(lit(1)).as("n"), round(sum("value"), 2).as("total"))
      .orderBy("user_id")
      .collect().map(r => (r.getLong(0), r.getLong(1), r.getDouble(2))).toSeq
    assert(streamed == batch)
  }

  test("streaming session windows (append mode) merge by 30-min gap") {
    implicit val sqlCtx = spark.sqlContext
    val input = MemoryStream[(Timestamp, Long)]
    val sessions = input.toDF().toDF("ts", "uid")
      .withWatermark("ts", "10 minutes")
      .groupBy(session_window(col("ts"), "30 minutes").as("w"), col("uid"))
      .agg(count(lit(1)).as("n"))
      .select(col("uid"), col("w.start").as("ss"), col("w.end").as("se"), col("n"))
    val q = sessions.writeStream.outputMode(OutputMode.Append)
      .format("memory").queryName("sess_test").start()
    try {
      // one user: two events 10 min apart (one session), one event 2 h later
      input.addData(
        (ts("2024-01-01 10:00:00"), 7L),
        (ts("2024-01-01 10:10:00"), 7L),
        (ts("2024-01-01 12:00:00"), 7L))
      q.processAllAvailable()
      // advance watermark far enough to finalize everything
      input.addData((ts("2024-01-01 15:00:00"), 8L))
      q.processAllAvailable()
      val rows = spark.table("sess_test")
        .filter(col("uid") === 7L)
        .select("ss", "se", "n").as[(Timestamp, Timestamp, Long)]
        .collect().sortBy(_._1.getTime).toSeq
      assert(rows == Seq(
        (ts("2024-01-01 10:00:00"), ts("2024-01-01 10:40:00"), 2L),
        (ts("2024-01-01 12:00:00"), ts("2024-01-01 12:30:00"), 1L)), s"got $rows")
    } finally q.stop()
  }

  test("dropDuplicatesWithinWatermark bounds dedup state by event time") {
    implicit val sqlCtx = spark.sqlContext
    val input = MemoryStream[(Timestamp, String)]
    val deduped = input.toDF().toDF("ts", "k")
      .withWatermark("ts", "10 minutes")
      .dropDuplicatesWithinWatermark("k")
    val q = deduped.writeStream.outputMode(OutputMode.Append)
      .format("memory").queryName("ddww_test").start()
    try {
      input.addData((ts("2024-01-01 10:00:00"), "a"), (ts("2024-01-01 10:01:00"), "a"))
      q.processAllAvailable()
      // watermark only advances at batch boundaries: push it past the "a"
      // entry's expiry (10:00 + 10 min) with an unrelated key first
      input.addData((ts("2024-01-01 11:00:00"), "x"))
      q.processAllAvailable()
      // same key after its state expired → re-emitted
      input.addData((ts("2024-01-01 12:00:00"), "a"))
      q.processAllAvailable()
      val n = spark.table("ddww_test").filter(col("k") === "a").count()
      assert(n == 2, s"expected first arrival + post-expiry re-emit, got $n")
    } finally q.stop()
  }

  test("streaming dedup keeps exactly the distinct key set") {
    val streamed = streaming.StreamingQueries.streamDedup(spark, sf)
      .collect().map(r => (r.getString(0), r.getLong(1))).toSeq
    val batch = Tables.events(spark, sf)
      .select("user_id", "event_type").distinct()
      .groupBy("event_type").agg(count(lit(1)).as("n"))
      .orderBy("event_type")
      .collect().map(r => (r.getString(0), r.getLong(1))).toSeq
    assert(streamed == batch)
  }
}
