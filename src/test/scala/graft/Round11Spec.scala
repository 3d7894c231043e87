package graft

import org.apache.spark.sql.Encoders
import org.apache.spark.sql.execution.streaming.runtime.MemoryStream
import org.apache.spark.sql.functions._
import org.apache.spark.sql.streaming.{OutputMode, TimeMode}
import java.sql.Timestamp

import graft.streaming.{KnnCand, KnnServingProcessor}

/** Round-11 pins: TTL eviction of the serving-shape kNN state, row-local ≡
  * grouped minhash signatures (the stateless-decontamination equivalence),
  * and the structural CTE materializer's edge cases. */
class Round11Spec extends SparkSpec {

  test("idle-query TTL evicts serving kNN state; a fresh probe re-creates it") {
    import spark.implicits._
    implicit val sqlCtx = spark.sqlContext
    val key = "spark.sql.streaming.stateStore.providerClass"
    spark.conf.set(key,
      "org.apache.spark.sql.execution.streaming.state.RocksDBStateStoreProvider")
    def t(s: String) = Timestamp.valueOf(s"2024-01-01 $s:00")
    val ttlMs = 10L * 60 * 1000 // 10 minutes

    val input = MemoryStream[KnnCand]
    val served = input.toDS()
      .withWatermark("ts", "0 seconds")
      .as[KnnCand]
      .groupByKey(_.q_id)
      .transformWithState(new KnnServingProcessor(5, ttlMs),
        TimeMode.EventTime(), OutputMode.Update(),
        Encoders.product[(Long, Int, Long, Int, Double, Long)])
      .toDF("q_id", "rn", "c_id", "label", "score6", "n_seen")
    val q = served.writeStream.outputMode("update")
      .format("memory").queryName("r11_knn_ttl").start()
    try {
      // batch 1: query 1 sees candidates 1 and 2 at 00:00
      input.addData(KnnCand(1L, 1L, 0, 0.9, t("00:00")),
        KnnCand(1L, 2L, 0, 0.8, t("00:00")))
      q.processAllAvailable()
      val b1 = spark.table("r11_knn_ttl")
        .filter(col("q_id") === 1).as[(Long, Int, Long, Int, Double, Long)]
        .collect().toSet
      assert(b1.map(r => (r._2, r._3)) == Set((1, 1L), (2, 2L)))
      assert(b1.forall(_._6 == 2L), "n_seen after batch 1 must be 2")

      // batch 2: unrelated query 2 at 01:00 advances the watermark far past
      // query 1's idle deadline (00:10)
      input.addData(KnnCand(2L, 7L, 0, 0.5, t("01:00")))
      q.processAllAvailable()
      // batch 3: query 2 again (inside ITS ttl) — processing this batch also
      // fires query 1's expired timer, clearing its state
      input.addData(KnnCand(2L, 8L, 0, 0.6, t("01:01")))
      q.processAllAvailable()

      // batch 4: FRESH probe for query 1 — state must have been evicted, so
      // the new top-k contains ONLY candidate 3 and n_seen restarts at 1
      input.addData(KnnCand(1L, 3L, 0, 0.4, t("01:02")))
      q.processAllAvailable()
      val q1Last = spark.table("r11_knn_ttl")
        .filter(col("q_id") === 1 && col("c_id") === 3)
        .as[(Long, Int, Long, Int, Double, Long)].collect().toSeq
      assert(q1Last.nonEmpty, "fresh probe must re-create state and emit")
      assert(q1Last.head._2 == 1 && q1Last.head._6 == 1L,
        s"state must be re-created from scratch after eviction, got $q1Last")
      // had eviction NOT happened, the refreshed top-k would have emitted
      // candidates 1 and 2 again alongside 3 with n_seen = 3
      val q1AtReset = spark.table("r11_knn_ttl")
        .filter(col("q_id") === 1 && col("n_seen") === 3).count()
      assert(q1AtReset == 0, "no emission may carry pre-eviction candidates")

      // query 2 stayed active within its TTL: candidates accumulate
      val q2 = spark.table("r11_knn_ttl")
        .filter(col("q_id") === 2).as[(Long, Int, Long, Int, Double, Long)]
        .collect()
      val q2Final = q2.filter(_._6 == q2.map(_._6).max)
      assert(q2Final.map(r => (r._2, r._3)).toSet == Set((1, 8L), (2, 7L)),
        "active query keeps merged top-k across batches")
    } finally {
      q.stop()
      spark.conf.unset(key)
    }
  }

  test("row-local minhash signature equals the grouped-aggregation signature") {
    import spark.implicits._
    val docs = Tables.documents(spark, sf).select(col("doc_id"), col("text"))
    val grouped = api.Graft.minhashSignatures(docs, "doc_id", "text",
        numHashes = 32, baseHash = api.Graft.md5Hash60, keepEmpty = false)
      .as[(Long, Seq[Long])].collect().toMap
    val rowLocal = api.Graft.minhashSignatureRowLocal(docs, "doc_id", "text",
        numHashes = 32, gramHashSql = api.Graft.md5GramSql)
      .as[(Long, Seq[Long])].collect().toMap
    assert(rowLocal.keySet == grouped.keySet)
    assert(rowLocal == grouped)
    // and the default hash pair agrees too (xx63GramSql ≡ xxHash63)
    val g2 = api.Graft.minhashSignatures(docs.limit(50), "doc_id", "text",
        keepEmpty = false).as[(Long, Seq[Long])].collect().toMap
    val r2 = api.Graft.minhashSignatureRowLocal(docs.limit(50), "doc_id", "text")
      .as[(Long, Seq[Long])].collect().toMap
    assert(r2 == g2)
  }

  test("materializeCtes rewrites every CTE header and nothing else") {
    // every oracle: stripping the inserted keyword recovers the raw SQL —
    // i.e. the rewrite is EXACTLY a set of MATERIALIZED insertions
    for ((name, raw) <- SparkEntry.oracleSqlRaw) {
      val rewritten = SparkEntry.materializeCtes(raw)
      // strip BOTH sides: some raw oracles hand-write MATERIALIZED already
      assert(rewritten.replace("AS MATERIALIZED (", "AS (") ==
        raw.replace("AS MATERIALIZED (", "AS ("),
        s"$name: rewrite must only insert MATERIALIZED")
      assert(SparkEntry.materializeCtes(rewritten) == rewritten,
        s"$name: rewrite must be idempotent")
      if (raw.contains("WITH "))
        assert(rewritten.contains("AS MATERIALIZED ("),
          s"$name: a WITH query must get at least one hint")
    }
  }

  test("materializeCtes edge cases: window clauses, mid-line headers, comments") {
    // multi-window clause: NEITHER window name is a CTE — untouched
    val win = "SELECT a, sum(b) OVER w1, avg(b) OVER w2 FROM t " +
      "WINDOW w1 AS (PARTITION BY c), w2 AS (ORDER BY d)"
    assert(SparkEntry.materializeCtes(win) == win)
    // mid-line CTE headers all rewritten
    val midline = "WITH a AS (SELECT 1), b AS (SELECT 2) SELECT * FROM a, b"
    assert(SparkEntry.materializeCtes(midline) ==
      "WITH a AS MATERIALIZED (SELECT 1), b AS MATERIALIZED (SELECT 2) SELECT * FROM a, b")
    // a CTE followed by a window clause in the main query: CTE yes, window no
    val both = "WITH x AS (SELECT 1 AS v) " +
      "SELECT v, sum(v) OVER w FROM x WINDOW w AS (ORDER BY v)"
    assert(SparkEntry.materializeCtes(both) ==
      "WITH x AS MATERIALIZED (SELECT 1 AS v) " +
      "SELECT v, sum(v) OVER w FROM x WINDOW w AS (ORDER BY v)")
    // an apostrophe inside a comment must not desync the scanner
    val comment = "WITH a AS (\n  -- it's a comment with ( and '\n  SELECT 1), " +
      "b AS (SELECT 2) SELECT * FROM a, b"
    val got = SparkEntry.materializeCtes(comment)
    assert(got.contains("a AS MATERIALIZED (") && got.contains("b AS MATERIALIZED ("))
    // a quoted string containing AS ( must not be rewritten
    val quoted = "WITH a AS (SELECT 'x AS (' AS s) SELECT * FROM a"
    assert(SparkEntry.materializeCtes(quoted) ==
      "WITH a AS MATERIALIZED (SELECT 'x AS (' AS s) SELECT * FROM a")
    // RECURSIVE keyword is skipped, the CTE still materialized
    val rec = "WITH RECURSIVE r AS (SELECT 1 UNION ALL SELECT n + 1 FROM r) " +
      "SELECT * FROM r"
    assert(SparkEntry.materializeCtes(rec) ==
      "WITH RECURSIVE r AS MATERIALIZED (SELECT 1 UNION ALL SELECT n + 1 FROM r) " +
      "SELECT * FROM r")
  }

  test("fold-in marker is the crash boundary: a missing marker forces a full rebuild") {
    // run once to build both index generations and commit the marker
    val first = queries.Dedup.dedupIndexFoldin(spark, sf).collect()
    val root = s"/tmp/graft_minhash_foldin/${spark.sparkContext.applicationId}"
    val base = root + "/" + sf.replaceAll("[^A-Za-z0-9.]", "_")
    val marker = new java.io.File(base, "_FOLDIN_DONE")
    val index = new java.io.File(base, "index")
    assert(marker.exists(), "fold-in must commit its marker")
    val filesAfterBuild = index.listFiles().map(_.getName).toSet
    // second call with the marker present: index untouched (served at rest)
    val second = queries.Dedup.dedupIndexFoldin(spark, sf).collect()
    assert(index.listFiles().map(_.getName).toSet == filesAfterBuild,
      "a committed index must be served, not rebuilt")
    assert(second.toSeq == first.toSeq)
    // crash simulation: marker gone, index half-present → full rebuild, and
    // the screen result is unchanged (rebuild ≡ original build)
    assert(marker.delete())
    index.listFiles().take(1).foreach(f => assert(f.delete()))
    val third = queries.Dedup.dedupIndexFoldin(spark, sf).collect()
    assert(marker.exists(), "rebuild must re-commit the marker")
    assert(third.toSeq == first.toSeq,
      "a rebuild after a simulated crash must reproduce the screen exactly")
  }

  test("IVF refresh marker: committed index served at rest, missing marker rebuilds") {
    val first = queries.Similarity.knnIvfRefresh(spark, sf).collect()
    val root = s"/tmp/graft_ivf_refresh/${spark.sparkContext.applicationId}"
    val baseDir = new java.io.File(root).listFiles()
      .find(_.getName.startsWith(sf.replaceAll("[^A-Za-z0-9.]", "_")))
      .getOrElse(fail(s"no refresh dir under $root"))
    val marker = new java.io.File(baseDir, "_REFRESH_DONE")
    assert(marker.exists(), "refresh must commit its marker")
    val second = queries.Similarity.knnIvfRefresh(spark, sf).collect()
    assert(second.toSeq == first.toSeq)
    assert(marker.delete())
    val third = queries.Similarity.knnIvfRefresh(spark, sf).collect()
    assert(marker.exists() && third.toSeq == first.toSeq,
      "a rebuild after a simulated crash must reproduce the search exactly")
  }
}
