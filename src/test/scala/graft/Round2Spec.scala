package graft

import org.apache.spark.sql.functions._
import graft.functions.{Neighbor, TopKBuf, TopKNeighbors}
import graft.queries.{EventTime, Similarity}

/** Round-2 operator semantics: the fused top-k aggregate agrees with the
  * window-sort top-k, the as-of join agrees with a naive point-in-time
  * semi-aggregate, and the TopKNeighbors accumulator is order-insensitive. */
class Round2Spec extends SparkSpec {

  test("fused top-k aggregate returns exactly the window-sort top-k") {
    val agg = Similarity.knnTopkAgg(spark, sf).collect().map(_.toSeq)
    val win = Similarity.knnBruteForce(spark, sf).collect().map(_.toSeq)
    assert(agg.length == win.length && agg.length == 50)
    assert(agg.sameElements(win))
  }

  test("TopKNeighbors is insensitive to input order and split points") {
    val k = 5
    val agg = new TopKNeighbors(k)
    val rnd = new scala.util.Random(7)
    val items = Seq.tabulate(200)(i => Neighbor(i.toLong, i % 10, rnd.nextInt(50) / 10.0))
    val expected = items.sortBy(n => (-n.score, n.c_id)).take(k)
    // sequential reduce over three different shuffles
    for (seed <- 1 to 3) {
      val shuffled = new scala.util.Random(seed).shuffle(items)
      val seq = shuffled.foldLeft(agg.zero)(agg.reduce)
      assert(seq.items == expected)
      // partial/merge path: split into 4 partitions, reduce each, merge
      val parts = shuffled.grouped(50).map(_.foldLeft(agg.zero)(agg.reduce))
      val merged = parts.foldLeft(agg.zero)(agg.merge)
      assert(merged.items == expected)
    }
  }

  test("asofJoin matches the naive point-in-time join") {
    val out = EventTime.asofJoin(spark, sf)
    val ev = Tables.events(spark, sf)
    val clicks = ev.filter(col("event_type") === "click")
      .groupBy(col("user_id").as("cu"), col("ts").as("cts"))
      .agg(max("event_id").as("click_id"))
    val purchases = ev.filter(col("event_type") === "purchase")
      .select(col("event_id").as("purchase_id"), col("user_id"), col("ts"))
    // naive: all (purchase, earlier-click) pairs, keep the max click ts
    val naive = purchases.join(clicks,
        col("user_id") === col("cu") && col("cts") <= col("ts"))
      .groupBy("purchase_id", "user_id")
      .agg(expr("max_by(click_id, cts)").as("click_id"), max("cts").as("click_ts"))
      .orderBy("purchase_id")
    assert(out.collect().map(_.toSeq).sameElements(naive.collect().map(_.toSeq)))
  }

  test("gapFill covers every hour in the span with zero-filled cells") {
    val out = EventTime.gapFill(spark, sf).cache()
    val nTypes = Tables.events(spark, sf).select("event_type").distinct().count()
    val hours = out.select("h").distinct().count()
    assert(out.count() == nTypes * hours)
    // zero-filled cells exist and carry (0, 0.0)
    val zeros = out.filter(col("n") === 0)
    assert(zeros.filter(col("total") =!= 0.0).count() == 0)
    out.unpersist()
  }
}
