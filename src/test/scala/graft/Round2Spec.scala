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

  test("Graft.asofJoin API: inclusive point-in-time semantics on synthetic data") {
    import spark.implicits._
    val trades = Seq((1L, 10L, "t1"), (1L, 20L, "t2"), (2L, 5L, "t3"))
      .toDF("key", "ts", "tag")
    val quotes = Seq((1L, 8L, 100.0), (1L, 15L, 110.0), (1L, 20L, 120.0), (2L, 9L, 50.0))
      .toDF("key", "ts", "px")
    val out = graft.api.Graft.asofJoin(trades, quotes, "key", "ts", "px")
      .select("key", "ts", "tag", "px_asof", "ts_asof")
      .as[(Long, Long, String, Double, Long)].collect().toSet
    // t1 at ts=10 sees the ts=8 quote; t2 at ts=20 sees the ts=20 quote
    // (inclusive); t3 at ts=5 has no prior quote and is dropped
    assert(out == Set((1L, 10L, "t1", 100.0, 8L), (1L, 20L, "t2", 120.0, 20L)))
  }

  test("Graft.gapFill API: complete bucket x dim spine with zero fill") {
    import spark.implicits._
    val df = Seq(("2024-01-01 00:10:00", "a", 1.0), ("2024-01-01 02:20:00", "a", 2.0),
        ("2024-01-01 00:30:00", "b", 3.0))
      .toDF("ts0", "dim", "v")
      .select(col("ts0").cast("timestamp").as("ts"), col("dim"), col("v"))
    val out = graft.api.Graft.gapFill(df, "ts", "dim", "v").collect()
    assert(out.length == 6) // hours 00..02 x dims {a, b}
    assert(out.count(_.getAs[Long]("n") == 0L) == 3)
    assert(out.filter(_.getAs[Long]("n") == 0L).forall(_.getAs[Double]("total") == 0.0))
  }

  test("Graft.saltedJoin API equals the plain join") {
    import spark.implicits._
    val fact = Seq((1L, 10.0), (1L, 20.0), (2L, 5.0), (1L, 30.0)).toDF("k", "v")
    val dim = Seq((1L, "x"), (2L, "y"), (3L, "z")).toDF("dk", "name")
    val salted = graft.api.Graft.saltedJoin(fact, dim, "k", "dk", col("v"), 4)
      .select("k", "v", "name").as[(Long, Double, String)].collect().sorted.toSeq
    val plain = fact.join(dim, col("k") === col("dk"))
      .select("k", "v", "name").as[(Long, Double, String)].collect().sorted.toSeq
    assert(salted == plain)
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
