package graft
import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions.col

/** Dev tool: A/B the gram-family base hash — production xxhash64 vs the
  * cross-engine md5Hash60 the ORACLED registry queries pay — on the three
  * operators whose hot loop is the per-gram hash. `runMain graft.HashAB
  * <sfDir>`; min-of-3 per cell, one JSON line per operator. The md5 column
  * is what the bench measures (registry queries keep md5 so the DuckDB
  * oracle can mirror the fingerprints); the xxhash column is what a
  * production pipeline pays. */
object HashAB {
  def main(args: Array[String]): Unit = {
    val sfDir = if (args.nonEmpty) args(0) else "/root/testdata/sf0.1"
    // Optional op-name filter (args 2..n) so an sf1 run can pay for only the
    // cells under study instead of the whole table.
    val only: Set[String] = args.drop(1).toSet
    val cpus = sys.env.getOrElse("SPARK_GRAFT_CPUS", "32")
    val spark = SparkSession.builder().master(s"local[$cpus]")
      .config("spark.sql.shuffle.partitions", cpus)
      .config("spark.ui.enabled", "false")
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.sql.legacy.parquet.nanosAsLong", "true")
      .getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
    val docs = Tables.documents(spark, sfDir).select(col("doc_id"), col("text"))
    import graft.api.Graft
    val cases: Seq[(String, String, () => Long)] = Seq(
      ("doc_novelty", "md5", () => Graft.docNovelty(docs, "doc_id", "text",
        gramHash = Graft.md5Hash60).count()),
      ("doc_novelty", "xxh", () => Graft.docNovelty(docs, "doc_id", "text").count()),
      ("dedup_substring", "md5", () => Graft.substringOverlapCandidates(docs,
        "doc_id", "text", gramHash = Graft.md5Hash60).count()),
      ("dedup_substring", "xxh", () => Graft.substringOverlapCandidates(docs,
        "doc_id", "text").count()),
      ("dedup_winnow", "md5", () => Graft.winnowOverlapCandidates(docs,
        "doc_id", "text", gramHash = Graft.md5GramSql).count()),
      ("dedup_winnow", "xxh", () => Graft.winnowOverlapCandidates(docs,
        "doc_id", "text").count()),
      ("doc_winnowing", "md5", () => Graft.winnowFingerprints(docs,
        "doc_id", "text", gramHash = Graft.md5GramSql).count()),
      ("doc_winnowing", "xxh", () => Graft.winnowFingerprints(docs,
        "doc_id", "text").count()),
      // the two ingest loops (VERDICT r11 task 7): registry rows pay the
      // in-lambda md5 oracle tax; production passes the xx63 pair. Each
      // call re-stages its batches and re-runs the full stream (the staging
      // harness wipes the loop's base dir), so the timing is a cold loop.
      ("stream_online_dedup", "md5", () => graft.streaming.StreamingQueries
        .streamOnlineDedup(spark, sfDir, Graft.md5GramSql).count()),
      ("stream_online_dedup", "xxh", () => graft.streaming.StreamingQueries
        .streamOnlineDedup(spark, sfDir, Graft.xx63GramSql).count()),
      ("stream_decontaminate_stateless", "md5", () => graft.streaming
        .StreamingQueries.streamDecontaminateStateless(spark, sfDir,
          Graft.md5GramSql, Graft.md5Hash60).count()),
      ("stream_decontaminate_stateless", "xxh", () => graft.streaming
        .StreamingQueries.streamDecontaminateStateless(spark, sfDir,
          Graft.xx63GramSql, Graft.xxHash63).count()))
    // untimed warmup
    spark.range(1000).selectExpr("id % 7 AS k").groupBy("k").count().count()
    val selected = if (only.isEmpty) cases else cases.filter(c => only(c._1))
    val best = selected.map { case (op, hash, run) =>
      val t = (1 to 3).map { _ =>
        val t0 = System.nanoTime(); run(); (System.nanoTime() - t0) / 1e9
      }.min
      (op, hash, t)
    }
    best.groupBy(_._1).toSeq.sortBy(_._1).foreach { case (op, rows) =>
      val md5 = rows.find(_._2 == "md5").get._3
      val xxh = rows.find(_._2 == "xxh").get._3
      println(f"""{"op":"$op","md5_sec":$md5%.3f,"xxhash_sec":$xxh%.3f,"md5_over_xxh":${md5 / xxh}%.2f}""")
    }
    spark.stop()
  }
}
