package graft
import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions.col

/** Dev tool (VERDICT r12 task 7): itemize where the online ingest loop's
  * wall time goes at a given scale — the loop's cost is machinery, not
  * data, and this splits the machinery into its three parts:
  *
  *   - `stage`: staging the corpus into ordered single-file micro-batches
  *     (the test harness's firehose — a production stream has no such
  *     step; files arrive on their own);
  *   - `work`: the three foreachBatch bodies run DIRECTLY on the staged
  *     files (row-local signatures + screen-against-earlier + fold-in) —
  *     the cost a production ingest actually pays per batch;
  *   - `full`: the complete streamOnlineDedup run (staging + micro-batch
  *     engine + work); `engine ≈ full − stage − work` is the Structured
  *     Streaming machinery (offset/commit logs, per-trigger planning,
  *     file-source listing).
  *
  * `runMain graft.IngestAB <sfDir> [passes]` → one JSON line. Min-of-N per
  * component (fresh dirs per pass — every reading is a cold loop, matching
  * the registry row's semantics). The loop keeps NO state store (its
  * exactly-once is batch-id-keyed overwrites; the checkpoint holds only
  * offsets/commits), so RocksDB changelog checkpointing does not apply —
  * verified by the `state_dir_exists` field read from the checkpoint. */
object IngestAB {
  def main(args: Array[String]): Unit = {
    val sfDir = if (args.nonEmpty) args(0) else "/root/testdata/sf0.1"
    val passes = args.drop(1).headOption.map(_.toInt).getOrElse(3)
    val cpus = sys.env.getOrElse("SPARK_GRAFT_CPUS", "32")
    val spark = SparkSession.builder().master(s"local[$cpus]")
      .config("spark.sql.shuffle.partitions", cpus)
      .config("spark.ui.enabled", "false")
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.sql.legacy.parquet.nanosAsLong", "true")
      .getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
    val docs = Tables.documents(spark, sfDir).select(col("doc_id"), col("text"))
    // untimed warmup
    spark.range(1000).selectExpr("id % 7 AS k").groupBy("k").count().count()
    def minOf(n: Int)(f: Int => Unit): Double =
      (1 to n).map { i =>
        val t0 = System.nanoTime(); f(i); (System.nanoTime() - t0) / 1e9
      }.min
    val scratch = s"/tmp/graft_ingest_ab/${spark.sparkContext.applicationId}"
    graft.queries.Formats.registerCleanup(scratch)
    val tStage = minOf(passes) { i =>
      graft.streaming.StreamingQueries.stageOrderedBatches(
        docs, s"$scratch/stage_$i", "doc_id", 3): Unit
    }
    // staged files for the direct-work passes (untimed, reused)
    val srcDir = graft.streaming.StreamingQueries.stageOrderedBatches(
      docs, s"$scratch/worksrc", "doc_id", 3)
    val tWork = minOf(passes) { i =>
      val base = s"$scratch/work_$i"
      for (b <- 0 until 3) {
        val batch = spark.read.parquet(s"$srcDir/batch$b.parquet")
        graft.streaming.StreamingQueries.onlineDedupBatch(spark,
          s"$base/index", s"$base/flags")(batch, b.toLong)
      }
      spark.read.parquet(s"$base/flags").count(): Unit
    }
    val tFull = minOf(passes) { _ =>
      graft.streaming.StreamingQueries.streamOnlineDedup(spark, sfDir)
        .count(): Unit
    }
    // the registry row's checkpoint: offsets/commits only — no state/ dir
    val ckpt = new java.io.File(
      s"/tmp/graft_stream_online/${spark.sparkContext.applicationId}/" +
        sfDir.replaceAll("[^A-Za-z0-9.]", "_") + "/ckpt")
    val stateDir = new java.io.File(ckpt, "state").exists()
    spark.stop()
    println(f"""{"metric":"ingest_loop_breakdown","sf":"$sfDir","passes":$passes,"stage_sec":$tStage%.3f,"work_sec":$tWork%.3f,"full_sec":$tFull%.3f,"engine_sec":${math.max(0.0, tFull - tStage - tWork)}%.3f,"state_dir_exists":$stateDir}""")
    Console.out.flush()
  }
}
