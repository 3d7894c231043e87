package graft.queries

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.expressions.Window
import graft.Tables

/** Batch event-time operators over the events table: tumbling / sliding /
  * session windows and typed per-key rolling state. These are the bounded
  * twins of the streaming queries in graft.streaming — same window semantics,
  * same results — which is exactly Structured Streaming's model (a streaming
  * query is an incrementalized batch query; the Dataflow-model equivalence the
  * suite asserts).
  */
object EventTime {

  /** Tumbling 1-hour windows per event type (batch `window()`). The window
    * key is derived per-row, so this is scan → one shuffle on
    * (window, event_type) — the same plan shape at any scale. */
  def tumblingWindows(s: SparkSession, d: String): DataFrame =
    Tables.events(s, d)
      .groupBy(window(col("ts"), "1 hour").as("w"), col("event_type"))
      .agg(count(lit(1)).as("n"), round(sum("value"), 2).as("total"))
      .select(col("w.start").as("ws"), col("event_type"), col("n"), col("total"))
      .orderBy("ws", "event_type")

  /** Sliding windows: 2-hour length, 1-hour hop — each event lands in two
    * windows (Spark expands rows per overlapping window before the shuffle). */
  def slidingWindows(s: SparkSession, d: String): DataFrame =
    Tables.events(s, d)
      .groupBy(window(col("ts"), "2 hours", "1 hour").as("w"), col("event_type"))
      .agg(count(lit(1)).as("n"), round(sum("value"), 2).as("total"))
      .select(col("w.start").as("ws"), col("event_type"), col("n"), col("total"))
      .orderBy("ws", "event_type")

  /** Session windows per user (30-minute inactivity gap): Spark's
    * `session_window` merges per-key overlapping [ts, ts+gap) intervals;
    * session end = last event + gap. One shuffle on user_id. */
  def sessionWindows(s: SparkSession, d: String): DataFrame =
    Tables.events(s, d)
      .groupBy(session_window(col("ts"), "30 minutes").as("w"), col("user_id"))
      .agg(count(lit(1)).as("n"), round(sum("value"), 2).as("total"))
      .select(col("user_id"), col("w.start").as("session_start"),
        col("w.end").as("session_end"), col("n"), col("total"))
      .orderBy("user_id", "session_start")

  /** AS-OF join: each purchase matched to the same user's most recent click
    * at or before it (the time-series point-in-time join Spark has no native
    * operator for). Implementation is the scale-correct shape: union both
    * sides, ONE shuffle on user_id, and a running `last(click, ignoreNulls)`
    * window — O(n log n) per user partition, no range self-join, no candidate
    * blow-up. Clicks are pre-deduped to one per (user, ts) (max event_id) so
    * ties are deterministic; at equal timestamps the click sorts first, i.e.
    * "as of" is inclusive (purchase.ts >= click.ts — DuckDB ASOF semantics,
    * which the oracle uses). */
  def asofJoin(s: SparkSession, d: String): DataFrame = {
    val ev = Tables.events(s, d)
    val clicks = ev.filter(col("event_type") === "click")
      .select(col("user_id"), col("ts"), col("event_id").as("click_id"))
    val purchases = ev.filter(col("event_type") === "purchase")
      .select(col("event_id").as("purchase_id"), col("user_id"), col("ts"))
    graft.api.Graft.asofJoin(purchases, clicks, "user_id", "ts", "click_id")
      .select(col("purchase_id"), col("user_id"),
        col("click_id_asof").as("click_id"), col("ts_asof").as("click_ts"))
      .orderBy("purchase_id")
  }

  /** Nearest-direction as-of join (Graft.asofJoinNearest — pandas
    * merge_asof direction='nearest'): each purchase pairs with its
    * closest click in EITHER direction, ties toward the earlier click.
    * Same one-shuffle union+window machinery as asof_join, two ordered
    * windows instead of one. */
  def asofJoinNearest(s: SparkSession, d: String): DataFrame = {
    val ev = Tables.events(s, d)
    val clicks = ev.filter(col("event_type") === "click")
      .select(col("user_id"), col("ts"), col("event_id").as("click_id"))
    val purchases = ev.filter(col("event_type") === "purchase")
      .select(col("event_id").as("purchase_id"), col("user_id"), col("ts"))
    graft.api.Graft.asofJoinNearest(purchases, clicks, "user_id", "ts", "click_id")
      .select(col("purchase_id"), col("user_id"),
        col("click_id_nearest").as("click_id"),
        col("ts_nearest").as("click_ts"))
      .orderBy("purchase_id")
  }

  /** Registry `asof_join_tolerance` (Graft.asofJoinTolerance — pandas
    * merge_asof `tolerance=`): the backward as-of match kept only when
    * the click lies within ONE HOUR of the purchase — the staleness bound
    * a serving-time feature lookup enforces. */
  def asofJoinTolerance(s: SparkSession, d: String): DataFrame = {
    val ev = Tables.events(s, d)
    val clicks = ev.filter(col("event_type") === "click")
      .select(col("user_id"), col("ts"), col("event_id").as("click_id"))
    val purchases = ev.filter(col("event_type") === "purchase")
      .select(col("event_id").as("purchase_id"), col("user_id"), col("ts"))
    graft.api.Graft.asofJoinTolerance(purchases, clicks, "user_id", "ts",
        "click_id", toleranceSec = 3600L)
      .select(col("purchase_id"), col("user_id"),
        col("click_id_asof").as("click_id"), col("ts_asof").as("click_ts"))
      .orderBy("purchase_id")
  }

  /** Gap-filled hourly series: every (hour, event_type) cell in the data's
    * span, zero-filled where no events landed — `sequence()` generates the
    * time spine (driver-side-loop-free), the tiny type dimension is broadcast,
    * and the left join against the hourly aggregate is the only shuffle. */
  def gapFill(s: SparkSession, d: String): DataFrame =
    graft.api.Graft.gapFill(Tables.events(s, d), "ts", "event_type", "value")
      .select(col("ts_bucket").as("h"), col("event_type"), col("n"),
        round(col("total"), 2).as("total"))
      .orderBy("h", "event_type")

  /** CEP-style event pattern matching (the Table-planner's MATCH_RECOGNIZE
    * surface re-expressed Spark-first): per user in event-time order, match
    * (a) local-minimum value patterns (down-then-up, the V shape) and
    * (b) the sequence pattern `error` followed by a `purchase` within the
    * next two events. lag/lead over one per-key window — one shuffle, no
    * state machine; every pattern over a bounded lookahead compiles to this
    * shape. */
  def patternDetect(s: SparkSession, d: String): DataFrame = {
    val w = Window.partitionBy("user_id").orderBy("ts", "event_id")
    Tables.events(s, d)
      .withColumn("pv", lag("value", 1).over(w))
      .withColumn("nv", lead("value", 1).over(w))
      .withColumn("n1", lead("event_type", 1).over(w))
      .withColumn("n2", lead("event_type", 2).over(w))
      .withColumn("v_shape", col("pv") > col("value") && col("nv") > col("value"))
      .withColumn("error_to_purchase",
        col("event_type") === "error" &&
          (col("n1") === "purchase" || col("n2") === "purchase"))
      .filter(col("v_shape") || col("error_to_purchase"))
      .select(col("user_id"), col("event_id"), round(col("value"), 2).as("value"),
        col("v_shape"), col("error_to_purchase"))
      .orderBy("user_id", "event_id")
  }

  /** Cumulative (expanding) windows — Flink's CUMULATE TVF shape: within each
    * 6-hour bucket, emit hourly window-ends covering [bucket, bucket+k·1h),
    * k = 1..6; each event expands row-locally to the window-ends that contain
    * it (sequence + explode), then ONE shuffle aggregates per
    * (bucket, window_end, type). The early-firing dashboard aggregate. */
  def cumulateWindows(s: SparkSession, d: String): DataFrame =
    Tables.events(s, d)
      .withColumn("b", expr(
        "CAST(timestamp_seconds(floor(unix_seconds(CAST(ts AS TIMESTAMP)) / 21600) * 21600) AS TIMESTAMP_NTZ)"))
      .withColumn("k", explode(expr(
        "filter(sequence(1, 6), k -> ts < b + k * INTERVAL '1' HOUR)")))
      .withColumn("window_end", expr("b + k * INTERVAL '1' HOUR"))
      .groupBy("b", "window_end", "event_type")
      .agg(count(lit(1)).as("n"), round(sum("value"), 2).as("total"))
      .orderBy("b", "window_end", "event_type")

  /** The reference's I6 rolling keyed sum (StreamSocket.scala:15 `keyBy(0)
    * .sum(1)`) through the TYPED arbitrary-state API shape: groupByKey +
    * mapGroups folding a per-key accumulator. Batch twin of the
    * flatMapGroupsWithState streaming variant in the suite. */
  def rollingSumTyped(s: SparkSession, d: String): DataFrame = {
    import s.implicits._
    Tables.events(s, d)
      .select(col("user_id"), col("value"))
      .as[(Long, Double)]
      .groupByKey(_._1)
      .mapGroups { (uid, rows) =>
        var n = 0L
        var total = 0.0
        rows.foreach { r => n += 1; total += r._2 }
        (uid, n, total)
      }
      .toDF("user_id", "n", "total0")
      .select(col("user_id"), col("n"), round(col("total0"), 2).as("total"))
      .orderBy("user_id")
  }
}
