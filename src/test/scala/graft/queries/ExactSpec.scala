package graft.queries

import org.apache.spark.sql.functions._
import graft.SparkSpec

/** The Exact decimal helpers must make rounded sums order-independent and
  * equal to an exact BigDecimal model — the property the oracle gate's
  * stability rests on after the round-4 hardening sweep. */
class ExactSpec extends SparkSpec {
  import spark.implicits._

  test("sumRound2 over dec() equals a BigDecimal model and ignores row order") {
    val rnd = new scala.util.Random(31L)
    // money-like 2-decimal doubles, the fixture columns' shape
    val vals = Seq.fill(5000)(math.round(rnd.nextDouble() * 1e7) / 100.0)
    val model = vals.map(v => BigDecimal(v).setScale(4, BigDecimal.RoundingMode.HALF_UP))
      .sum.setScale(2, BigDecimal.RoundingMode.HALF_UP).toDouble

    def run(seq: Seq[Double], partitions: Int): Double =
      spark.createDataset(seq).repartition(partitions).toDF("v")
        .agg(Exact.sumRound2(Exact.dec(col("v"))).as("s"))
        .collect().head.getDouble(0)

    val a = run(vals, 3)
    val b = run(rnd.shuffle(vals), 7)
    assert(a == model, s"$a != model $model")
    assert(b == model, "order/partitioning changed an exact decimal sum")
  }

  test("dec() recovers every 2-decimal double exactly") {
    val vals = (0 until 10000).map(i => i / 100.0)
    val recovered = spark.createDataset(vals).toDF("v")
      .select(Exact.dec(col("v")).cast("double").as("r"), col("v"))
      .filter(col("r") =!= col("v")).count()
    assert(recovered == 0L)
  }
}
