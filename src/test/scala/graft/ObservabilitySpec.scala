package graft

import org.apache.spark.sql.Observation
import org.apache.spark.sql.functions._

/** Production-observability surface: `df.observe` collects named aggregate
  * metrics ON THE SIDE of a running job (no second scan, no collect), and
  * join strategy hints steer the physical plan — the knobs an operator of a
  * 100 TB pipeline reaches for before resorting to manual rewrites. */
class ObservabilitySpec extends SparkSpec {

  test("observe() collects row/sum/null metrics without a second scan") {
    val obs = Observation("lineitem_metrics")
    val df = Tables.lineitem(spark, sf)
      .observe(obs,
        count(lit(1)).as("n_rows"),
        sum("l_quantity").as("qty_total"),
        count(when(col("l_returnflag").isNull, 1)).as("null_flags"))
      .groupBy("l_returnflag").agg(sum("l_quantity").as("qty"))
    val grouped = df.collect()
    val m = obs.get
    // the side-channel totals must reconcile with the grouped result
    assert(m("n_rows") == Tables.lineitem(spark, sf).count())
    assert(math.abs(m("qty_total").asInstanceOf[Double]
      - grouped.map(_.getDouble(1)).sum) < 1e-6)
    assert(m("null_flags") == 0L)
  }

  test("join strategy hints are honored by the planner") {
    val li = Tables.lineitem(spark, sf).select("l_orderkey", "l_quantity")
    val o = Tables.orders(spark, sf).select("o_orderkey", "o_orderpriority")

    def planOf(hint: String): String =
      li.join(o.hint(hint), col("l_orderkey") === col("o_orderkey"))
        .queryExecution.executedPlan.toString

    assert(planOf("broadcast").contains("BroadcastHashJoin"))
    assert(planOf("shuffle_merge").contains("SortMergeJoin"))
    assert(planOf("shuffle_hash").contains("ShuffledHashJoin"))
    // identical results under every strategy
    val variants = Seq("broadcast", "shuffle_merge", "shuffle_hash").map { h =>
      li.join(o.hint(h), col("l_orderkey") === col("o_orderkey"))
        .groupBy("o_orderpriority").agg(sum("l_quantity").as("q"))
        .collect().map(r => r.getString(0) -> r.getDouble(1)).toMap
    }
    assert(variants.distinct.size == 1)
  }

  test("cached relation serves repeated readers from memory") {
    val c = Tables.customer(spark, sf).filter(col("c_acctbal") > 0)
    c.cache()
    try {
      c.count() // materialize
      val plan = c.queryExecution.withCachedData.toString
      assert(plan.contains("InMemoryRelation"))
      assert(c.groupBy("c_mktsegment").count().count() > 0)
    } finally c.unpersist()
  }
}
