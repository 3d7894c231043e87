package graft
import org.apache.spark.sql.SparkSession
object Bench {
  def main(args: Array[String]): Unit = {
    val sfDir = sys.env.getOrElse("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    val cpus = sys.env.getOrElse("SPARK_GRAFT_CPUS", "4")
    val spark = SparkSession.builder()
      .master(s"local[$cpus]")
      .config("spark.sql.shuffle.partitions", cpus)
      .config("spark.ui.enabled", "false")
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.sql.legacy.parquet.nanosAsLong", "true")
      .getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
    // Untimed warmup: pay the one-off JVM/executor/codegen bring-up before the
    // first timed query (it otherwise lands on whichever query sorts first and
    // distorts its number by ~4s).
    spark.range(1000).selectExpr("id % 7 AS k").groupBy("k").count().count()
    // ...including one-off expression-class/provider init (JCE ciphers, ICU
    // collators, XML/VARIANT parsers, sketch libs) that would otherwise be
    // billed to whichever query touches each first.
    spark.range(10).selectExpr(
      "cast(aes_decrypt(aes_encrypt(cast(id AS string), '0123456789abcdef', 'ECB'), '0123456789abcdef', 'ECB') AS string) AS a",
      "collate(cast(id AS string), 'UTF8_LCASE') AS c",
      "from_xml(to_xml(named_struct('v', id)), 'v BIGINT') AS x",
      "variant_get(parse_json(concat('{\"k\":', id, '}')), '$.k', 'int') AS v",
      "bitmap_bit_position(id) AS b")
      .groupBy("c").agg(
        org.apache.spark.sql.functions.expr("hll_sketch_estimate(hll_sketch_agg(a))"),
        org.apache.spark.sql.functions.expr("bitmap_count(bitmap_construct_agg(b))"),
        org.apache.spark.sql.functions.expr("mode(x.v)"),
        org.apache.spark.sql.functions.expr("median(v)")).count()
    // name-sorted order: run-to-run comparable timings (Map iteration order
    // would put the JVM/codegen warmup cost on an arbitrary query).
    val results = SparkEntry.queries.toSeq.sortBy(_._1).map { case (name, fn) =>
      val t0 = System.nanoTime()
      try { fn(spark, sfDir).count() } catch { case _: Throwable => -1L }
      name -> (System.nanoTime() - t0) / 1e9
    }
    val qs = results.map { case (k, v) => s"\"" + k + "\":" + v }
      .mkString("{", ",", "}")
    val total = if (results.nonEmpty) results.map(_._2).sum else 0.0
    spark.stop()
    // The contract is ONE JSON line as the last thing on stdout: print after
    // spark.stop() so no shutdown chatter can trail it.
    println(s"""{"metric":"total","value":$total,"unit":"sec","queries":$qs,"sf":"$sfDir"}""")
    Console.out.flush()
  }
}
