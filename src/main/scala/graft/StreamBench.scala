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
  * SELF-RULING (VERDICT r12 task 3): the raw number swung 499 k ↔ 1.296 M
  * lines/s across rounds on byte-identical code with no in-artifact evidence
  * either way (host-side CPU steal is invisible to the guest except through
  * wall time). Two mechanisms now ship IN the artifact:
  *   - best-of-N spaced sessions (default 3, 2 s apart) — a contention
  *     window shorter than the whole run is escaped by the best run;
  *   - a CALIBRATION micro-job (fixed CPU-bound shuffle, below) timed
  *     BEFORE AND AFTER each session (min of the bracket — a spike
  *     confined to one calibration read is discarded, ADVICE r13): under
  *     steal the calibration inflates by the same factor the throughput
  *     deflates, so `calibrated = raw · cal/calRef` is
  *     contention-invariant to first order. calRef is the frozen
  *     near-idle min-of-5 (2026-08-15, r13 binaries); re-freeze it
  *     whenever the calibration job or the host changes — the raw
  *     best-of-N stays the round-over-round headline, the MEDIAN
  *     calibrated value across sessions is the ruling (max would
  *     preferentially select residual cal inflation).
  *
  * Run: `runMain graft.StreamBench [seconds] [runs]` → one JSON line:
  * best-of-N raw lines/sec and words/sec (8 words per synthesized line),
  * per-run raw+calibration detail, and the calibrated ruling value.
  */
object StreamBench {
  /** Fixed CPU-bound calibration work: hash + shuffle + aggregate over all
    * cores — the same resource mix as the word-count micro-batches. Rows
    * sized so one reading is ~1.3 s on an idle 32-thread host: long enough
    * to sample a contention window, short enough to run per session. */
  private val calRows = 800000000L

  /** Frozen near-idle calibration reference (seconds): min over 5 spaced
    * in-session readings, local[32], guest load ≈ 0.9, 2026-08-15 (r13).
    * Same-session raw throughput read 1.66 M lines/s — the healthy-machine
    * band — so this reference anchors "calibrated == raw" to that state. */
  private val calRefSec = 0.985

  private def calibrate(spark: SparkSession, cpus: Int): Double = {
    val t0 = System.nanoTime()
    spark.range(0L, calRows, 1L, cpus)
      .selectExpr("pmod(xxhash64(id), 1000) AS k")
      .groupBy("k").count().count()
    (System.nanoTime() - t0) / 1e9
  }

  def main(args: Array[String]): Unit = {
    val seconds = args.headOption.map(_.toInt).getOrElse(20)
    val runs = args.drop(1).headOption.map(_.toInt).getOrElse(3)
    val cpus = sys.env.getOrElse("SPARK_GRAFT_CPUS", "4")
    val spark = SparkSession.builder()
      .master(s"local[$cpus]")
      .config("spark.sql.shuffle.partitions", cpus)
      .config("spark.ui.enabled", "false")
      .config("spark.sql.session.timeZone", "UTC")
      .getOrCreate()
    spark.sparkContext.setLogLevel("WARN")

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

    // untimed engine warm-up (micro-batch planner, state-store classes,
    // codegen) so run 1 measures the same machinery as runs 2..N
    calibrate(spark, cpus.toInt)

    def oneRun(): (Double, Long, Double) = {
      // rate-micro-batch delivers a FIXED batch size immediately on each
      // trigger (no wall-clock pacing), so the measured rate is engine-bound:
      // throughput = completed batches × rowsPerBatch / elapsed.
      val rate = spark.readStream.format("rate-micro-batch")
        .option("rowsPerBatch", 2000000L)
        .option("numPartitions", cpus.toInt)
        .load()
      // one 8-word line per row from a 1000-word vocabulary — same shape as
      // the reference's socket lines, synthesized instead of TCP-read
      val lines = rate.selectExpr(
        "concat_ws(' ', transform(sequence(0, 7), i -> concat('w', pmod(value * 31 + i * 7, 1000)))) AS text")
      val counts = graft.api.Graft.rollingWordCount(lines, "text")
      val rows0 = rowsSeen.get(); val batches0 = batchesSeen.get()
      val q = counts.writeStream.outputMode("update").format("noop").start()
      val t0 = System.nanoTime()
      while ((System.nanoTime() - t0) / 1e9 < seconds) Thread.sleep(200)
      // Snapshot rows AND elapsed at the same instant, before stop(): batches
      // that complete during stop() would otherwise count toward rows but not
      // time, inflating the reported rate by up to a full batch.
      val elapsed = (System.nanoTime() - t0) / 1e9
      val rows = rowsSeen.get() - rows0
      q.stop()
      (rows / elapsed, batchesSeen.get() - batches0, elapsed)
    }

    // BRACKETED calibration (ADVICE r13): a calibration read taken only
    // BEFORE the session can catch a contention spike the measured window
    // never sees — raw stays healthy, cal inflates, and best-of-N would
    // preferentially select that inflated product. Each session is now
    // bracketed (cal before AND after, min of the two — a spike confined
    // to either bracket is discarded), and the RULING is the MEDIAN
    // calibrated value across sessions, not the max; best-of-N stays the
    // raw headline only.
    val detail = (1 to runs).map { i =>
      if (i > 1) Thread.sleep(2000) // spaced sessions — escape short windows
      val calBefore = calibrate(spark, cpus.toInt)
      val (lps, batches, elapsed) = oneRun()
      val calAfter = calibrate(spark, cpus.toInt)
      val cal = math.min(calBefore, calAfter)
      (lps, calBefore, calAfter, lps * cal / calRefSec, batches, elapsed)
    }
    val bestRaw = detail.map(_._1).max
    val medCal = {
      val s = detail.map(_._4).sorted
      if (s.size % 2 == 1) s(s.size / 2)
      else (s(s.size / 2 - 1) + s(s.size / 2)) / 2.0
    }
    spark.stop()
    val runsJson = detail.map { case (lps, cb, ca, clps, batches, elapsed) =>
      f"""{"lines_per_sec":$lps%.0f,"cal_before_sec":$cb%.3f,"cal_after_sec":$ca%.3f,"calibrated_lines_per_sec":$clps%.0f,"batches":$batches,"seconds":$elapsed%.1f}"""
    }.mkString("[", ",", "]")
    println(f"""{"metric":"stream_wordcount_throughput","lines_per_sec":$bestRaw%.0f,"words_per_sec":${8 * bestRaw}%.0f,"calibrated_lines_per_sec":$medCal%.0f,"calibrated_words_per_sec":${8 * medCal}%.0f,"calibrated_stat":"median","cal_ref_sec":$calRefSec,"runs":$runsJson,"n_runs":$runs,"seconds_per_run":$seconds}""")
    Console.out.flush()
  }
}
