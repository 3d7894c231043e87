package graft

import org.apache.spark.sql.{Encoders}
import org.apache.spark.sql.execution.streaming.runtime.MemoryStream
import org.apache.spark.sql.functions._
import org.apache.spark.sql.streaming._
import java.sql.Timestamp

/** Gap-sessionization on transformWithState with EVENT-TIME TIMERS: buffered
  * events live in ListState; each input batch registers a timer at that
  * batch's max event time + gap; when the watermark passes a timer, every
  * gap-delimited session that can no longer grow (end + gap <= watermark) is
  * emitted and evicted, and still-open sessions are retained. This is the
  * timer-driven close that session_window/`stream_session` get declaratively —
  * exercised here through the arbitrary-state API because that is what a
  * custom session policy (per-key gaps, session caps, early previews) needs. */
class SessionizeProcessor(gapMs: Long)
    extends StatefulProcessor[String, (String, Timestamp), (String, Long, Int)] {
  @transient private var buf: ListState[Long] = _

  override def init(outputMode: OutputMode, timeMode: TimeMode): Unit =
    buf = getHandle.getListState[Long]("buf", Encoders.scalaLong, TTLConfig.NONE)

  override def handleInputRows(key: String, rows: Iterator[(String, Timestamp)],
      timerValues: TimerValues): Iterator[(String, Long, Int)] = {
    val ts = rows.map(_._2.getTime).toArray
    ts.foreach(t => buf.appendValue(t))
    getHandle.registerTimer(ts.max + gapMs)
    Iterator.empty
  }

  override def handleExpiredTimer(key: String, timerValues: TimerValues,
      expiredTimerInfo: ExpiredTimerInfo): Iterator[(String, Long, Int)] = {
    val wm = timerValues.getCurrentWatermarkInMs()
    val sorted = buf.get().toArray.sorted
    if (sorted.isEmpty) return Iterator.empty
    // split the buffer into gap-sessions
    val sessions = sorted.tail.foldLeft(Vector(Vector(sorted.head))) {
      case (acc, t) =>
        if (t - acc.last.last < gapMs) acc.init :+ (acc.last :+ t)
        else acc :+ Vector(t)
    }
    val (closed, open) = sessions.partition(sess => sess.last + gapMs <= wm)
    buf.clear()
    open.flatten.foreach(t => buf.appendValue(t))
    // keep a timer covering the EARLIEST still-open session's close, so open
    // sessions drain as the watermark advances even if this key never sees
    // another input row (input-batch timers alone would strand them)
    open.headOption.foreach(sess => getHandle.registerTimer(sess.last + gapMs))
    closed.iterator.map(sess => (key, sess.head, sess.length))
  }
}

class TimerSessionSpec extends SparkSpec {

  test("event-time timers close gap sessions exactly when the watermark passes") {
    import spark.implicits._
    implicit val sqlCtx = spark.sqlContext
    val key = "spark.sql.streaming.stateStore.providerClass"
    spark.conf.set(key,
      "org.apache.spark.sql.execution.streaming.state.RocksDBStateStoreProvider")
    def t(s: String) = Timestamp.valueOf(s"2024-01-01 $s:00")

    val input = MemoryStream[(String, Timestamp)]
    val sessions = input.toDS()
      .withColumnRenamed("_2", "ts").withColumnRenamed("_1", "user")
      .withWatermark("ts", "10 minutes")
      .as[(String, Timestamp)]
      .groupByKey(_._1)
      .transformWithState(new SessionizeProcessor(30L * 60 * 1000),
        TimeMode.EventTime(), OutputMode.Append(),
        Encoders.product[(String, Long, Int)])
    val q = sessions.toDF("user", "session_start", "n").writeStream
      .outputMode(OutputMode.Append).format("memory")
      .queryName("timer_sessions").start()
    try {
      // session 1: two events 5 min apart
      input.addData(("a", t("10:00")), ("a", t("10:05")))
      q.processAllAvailable()
      // a lone later event advances the watermark to 11:50, past session 1's
      // close (10:35): processAllAvailable drains the now-eligible timer in a
      // follow-up batch and session 1 emits; 12:00 itself stays open
      input.addData(("a", t("12:00")))
      q.processAllAvailable()
      val afterFirst = spark.table("timer_sessions").as[(String, Long, Int)]
        .collect().toSet
      assert(afterFirst == Set(("a", t("10:00").getTime, 2)))

      // 13:00 pushes the watermark to 12:50, past session 2's close (12:30)
      input.addData(("a", t("13:00")))
      q.processAllAvailable()
      val afterSecond = spark.table("timer_sessions").as[(String, Long, Int)]
        .collect().toSet
      assert(afterSecond == Set(
        ("a", t("10:00").getTime, 2),
        ("a", t("12:00").getTime, 1)))

      // advancing far past the open sessions closes 13:00 and then 16:00 as
      // singleton sessions; the newest event (18:00) remains open
      input.addData(("a", t("16:00")))
      q.processAllAvailable()
      input.addData(("a", t("18:00")))
      q.processAllAvailable()
      val all = spark.table("timer_sessions").as[(String, Long, Int)]
        .collect().toSet
      assert(all == Set(
        ("a", t("10:00").getTime, 2),
        ("a", t("12:00").getTime, 1),
        ("a", t("13:00").getTime, 1),
        ("a", t("16:00").getTime, 1)))
    } finally q.stop()
  }
}
