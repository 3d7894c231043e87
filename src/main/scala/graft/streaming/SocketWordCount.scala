package graft.streaming

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions._

/** Faithful re-expression of the reference program
  * (`/root/reference/study/src/main/scala/group/xc/flink/stream/demo1/StreamSocket.scala:12-16`):
  * socket text source → tokenize on single spaces → key by word → rolling
  * count → print sink, running forever.
  *
  * Mapping (SURVEY.md §2.A): socketTextStream → `format("socket")`;
  * flatMap(split) → `explode(split)`; keyBy(0).sum(1) → streaming
  * `groupBy("word").count()` in update mode (per-micro-batch refreshed rows —
  * the Spark-native equivalent of Flink's per-record emission; state agrees at
  * every batch boundary); print() → console sink; execute() →
  * `start().awaitTermination()`.
  *
  * Run: `sbt "runMain graft.streaming.SocketWordCount <host> <port>"`
  * (e.g. against `nc -lk 9999`).
  */
object SocketWordCount {
  def main(args: Array[String]): Unit = {
    val host = if (args.length > 0) args(0) else "localhost"
    val port = if (args.length > 1) args(1).toInt else 9999
    val spark = SparkSession.builder()
      .master(sys.env.getOrElse("SPARK_MASTER", "local[4]"))
      .appName("graft-socket-wordcount")
      .config("spark.sql.shuffle.partitions", "4")
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("WARN")

    val lines = spark.readStream
      .format("socket")
      .option("host", host)
      .option("port", port)
      .load()

    val counts = lines
      .select(explode(split(col("value"), " ", -1)).as("word"))
      .filter(length(col("word")) > 0)
      .groupBy("word")
      .count()

    val query = counts.writeStream
      .outputMode("update")
      .format("console")
      .start()
    query.awaitTermination()
  }
}
