package graft

import org.apache.spark.sql.functions._
import org.apache.spark.sql.execution.adaptive.AdaptiveSparkPlanExec

/** AQE skew handling: a join where 90% of the probe side shares one key must
  * be split by adaptive execution into multiple subtasks for the hot
  * partition (the automatic cure `SCALE.md` leans on before the manual
  * `Graft.saltedJoin`). Thresholds are forced low so the tiny local dataset
  * trips the same code path a hot key trips at 100 TB. */
class SkewJoinSpec extends SparkSpec {

  test("AQE splits a skewed join partition into parallel subtasks") {
    val conf = Seq(
      "spark.sql.adaptive.enabled" -> "true",
      "spark.sql.adaptive.skewJoin.enabled" -> "true",
      "spark.sql.adaptive.skewJoin.skewedPartitionFactor" -> "2",
      "spark.sql.adaptive.skewJoin.skewedPartitionThresholdInBytes" -> "8KB",
      "spark.sql.adaptive.advisoryPartitionSizeInBytes" -> "8KB",
      "spark.sql.adaptive.coalescePartitions.enabled" -> "false",
      "spark.sql.autoBroadcastJoinThreshold" -> "-1")
    val prev = conf.map { case (k, _) => k -> spark.conf.getOption(k) }
    conf.foreach { case (k, v) => spark.conf.set(k, v) }
    try {
      import spark.implicits._
      // 90% of the left side lands on key 0
      val left = spark.range(0, 100000)
        .select((when(col("id") % 10 =!= 0, 0L).otherwise(col("id")))
          .as("k"), col("id").as("payload"))
      val right = spark.range(0, 1000).select(col("id").as("k"),
        (col("id") * 2).as("rv"))
      val joined = left.join(right, "k")
      // collect() executes THIS DataFrame's QueryExecution (count() would
      // build a new one, leaving joined's adaptive plan unexecuted)
      val n = joined.collect().length.toLong
      // correctness first: key 0 matches 90001 left rows x 1 right row, the
      // other 9999 distinct left keys (10, 20, ...; those < 1000: 100 keys)
      val expected = left.groupBy("k").count().as[(Long, Long)].collect()
        .filter(_._1 < 1000).map(_._2).sum
      assert(n == expected)
      // the executed adaptive plan must have flagged the skewed partition
      val adaptive = joined.queryExecution.executedPlan.collectFirst {
        case a: AdaptiveSparkPlanExec => a
      }
      assert(adaptive.isDefined, "expected an adaptive plan")
      assert(adaptive.get.executedPlan.toString.contains("skew=true"),
        "expected the hot partition to be marked and split by AQE")
    } finally prev.foreach {
      case (k, Some(v)) => spark.conf.set(k, v)
      case (k, None) => spark.conf.unset(k)
    }
  }
}
