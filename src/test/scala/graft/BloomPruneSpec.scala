package graft

import org.apache.spark.sql.functions._

/** Runtime bloom-filter join pruning (Spark's runtime filter framework): for
  * a selective build side, the optimizer injects a bloom-filter aggregate on
  * that side and a might-contain probe below the big side's scan — rows that
  * cannot join die before the shuffle. At 100 TB this is the difference
  * between shuffling the whole fact table and shuffling the ~matching slice. */
class BloomPruneSpec extends SparkSpec {

  test("selective join injects a runtime bloom filter on the fact side") {
    val conf = Seq(
      "spark.sql.optimizer.runtime.bloomFilter.enabled" -> "true",
      "spark.sql.optimizer.runtime.bloomFilter.applicationSideScanSizeThreshold" -> "0",
      "spark.sql.optimizer.runtime.bloomFilter.creationSideThreshold" -> "100MB",
      "spark.sql.autoBroadcastJoinThreshold" -> "-1")
    val prev = conf.map { case (k, _) => k -> spark.conf.getOption(k) }
    conf.foreach { case (k, v) => spark.conf.set(k, v) }
    try {
      val li = Tables.lineitem(spark, sf).select("l_orderkey", "l_quantity")
      val sel = Tables.orders(spark, sf)
        .filter(col("o_totalprice") > 400000) // selective build side
        .select("o_orderkey")
      val joined = li.join(sel, col("l_orderkey") === col("o_orderkey"))
      val plan = joined.queryExecution.optimizedPlan.toString
      assert(plan.contains("bloom_filter_agg") || plan.contains("BloomFilter"),
        s"expected a runtime bloom filter in:\n$plan")
      // and it must not change results
      val n = joined.count()
      val expected = li.join(sel.hint("broadcast"),
        col("l_orderkey") === col("o_orderkey")).count()
      assert(n == expected)
    } finally prev.foreach {
      case (k, Some(v)) => spark.conf.set(k, v)
      case (k, None) => spark.conf.unset(k)
    }
  }
}
