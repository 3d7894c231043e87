package graft
import org.apache.spark.sql.SparkSession

/** Dev tool: print the formatted physical plan of one registry query and
  * time a single count — `runMain graft.Explain <query> <sfDir>`. The
  * fast loop for plan iteration (the "explain until it's the plan you'd
  * want" rule); PlanAudit pins the invariants the plans must keep. */
object Explain {
  def main(args: Array[String]): Unit = {
    require(args.length >= 2, "usage: Explain <query> <sfDir>")
    val cpus = sys.env.getOrElse("SPARK_GRAFT_CPUS", "32")
    val spark = SparkSession.builder().master(s"local[$cpus]")
      .config("spark.sql.shuffle.partitions", cpus)
      .config("spark.ui.enabled", "false")
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.sql.legacy.parquet.nanosAsLong", "true")
      .getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
    val df = SparkEntry.queries(args(0))(spark, args(1))
    df.explain("formatted")
    val t0 = System.nanoTime(); val n = df.count()
    println(s"rows=$n in ${(System.nanoTime() - t0) / 1e9}s")
    spark.stop()
  }
}
