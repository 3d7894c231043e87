package graft

import org.apache.spark.sql.SparkSession

/** Streaming throughput benchmark for the reference's own computation: the
  * rolling word count (StreamSocket.scala:12-16), driven by the `rate` source
  * at an overdriven rows/sec so the engine (not the source) is the bottleneck,
  * written to the `noop` sink so no sink cost is measured.
  *
  * The reference's socket source is a single TCP reader (parallelism 1, see
  * SURVEY.md I2) — its ingest ceiling is one thread's line-splitting. Here the
  * rate source generates per-partition and the word-count shuffle fans out
  * across all cores, which is the structural reason the Spark design scales
  * past it on one node and then horizontally.
  *
  * Run: `runMain graft.StreamBench [seconds]` → one JSON line:
  * lines/sec and words/sec (8 words per synthesized line) over the run.
  */
object StreamBench {
  def main(args: Array[String]): Unit = {
    val seconds = args.headOption.map(_.toInt).getOrElse(20)
    val cpus = sys.env.getOrElse("SPARK_GRAFT_CPUS", "4")
    val spark = SparkSession.builder()
      .master(s"local[$cpus]")
      .config("spark.sql.shuffle.partitions", cpus)
      .config("spark.ui.enabled", "false")
      .config("spark.sql.session.timeZone", "UTC")
      .getOrCreate()
    spark.sparkContext.setLogLevel("WARN")

    // rate-micro-batch delivers a FIXED batch size immediately on each
    // trigger (no wall-clock pacing), so the measured rate is engine-bound:
    // throughput = completed batches × rowsPerBatch / elapsed.
    val rate = spark.readStream.format("rate-micro-batch")
      .option("rowsPerBatch", 2000000L)
      .option("numPartitions", cpus.toInt)
      .load()
    // one 8-word line per row from a 1000-word vocabulary — same shape as the
    // reference's socket lines, synthesized instead of TCP-read
    val lines = rate.selectExpr(
      "concat_ws(' ', transform(sequence(0, 7), i -> concat('w', pmod(value * 31 + i * 7, 1000)))) AS text")
    // A listener tallies every progress event — q.recentProgress retains only
    // the last ~100 updates, which under-reports long runs.
    val rowsSeen = new java.util.concurrent.atomic.AtomicLong(0)
    val batchesSeen = new java.util.concurrent.atomic.AtomicLong(0)
    spark.streams.addListener(new org.apache.spark.sql.streaming.StreamingQueryListener {
      override def onQueryStarted(e: org.apache.spark.sql.streaming.StreamingQueryListener.QueryStartedEvent): Unit = ()
      override def onQueryProgress(e: org.apache.spark.sql.streaming.StreamingQueryListener.QueryProgressEvent): Unit = {
        rowsSeen.addAndGet(e.progress.numInputRows)
        batchesSeen.incrementAndGet()
      }
      override def onQueryTerminated(e: org.apache.spark.sql.streaming.StreamingQueryListener.QueryTerminatedEvent): Unit = ()
    })
    val counts = graft.api.Graft.rollingWordCount(lines, "text")
    val q = counts.writeStream.outputMode("update").format("noop").start()

    val t0 = System.nanoTime()
    while ((System.nanoTime() - t0) / 1e9 < seconds) Thread.sleep(200)
    // Snapshot rows AND elapsed at the same instant, before stop(): batches
    // that complete during stop() would otherwise count toward rows but not
    // time, inflating the reported rate by up to a full batch.
    val elapsed = (System.nanoTime() - t0) / 1e9
    val rows = rowsSeen.get()
    q.stop()
    spark.stop()
    println(f"""{"metric":"stream_wordcount_throughput","lines_per_sec":${rows / elapsed}%.0f,"words_per_sec":${8 * rows / elapsed}%.0f,"batches":${batchesSeen.get()},"seconds":$elapsed%.1f}""")
    Console.out.flush()
  }
}
