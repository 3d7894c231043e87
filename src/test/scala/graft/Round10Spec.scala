package graft

import org.apache.spark.sql.functions._

/** Round-10 additions: CCNet-style paragraph dedup, hybrid RRF retrieval,
  * and streaming kNN against a static corpus. */
class Round10Spec extends SparkSpec {
  import spark.implicits._

  // ---------- paragraph dedup (Graft.paragraphDedup) ----------

  test("paragraphDedup keeps first occurrences and flags cross-doc repeats") {
    // parTokens = 2 → each two-token run is one paragraph
    val docs = Seq(
      (1L, "a b c d"),        // P1=[a b], P2=[c d]  — both first occurrences
      (2L, "a b e f"),        // P1 repeats (kept by doc 1), P3=[e f] fresh
      (3L, "c d"),            // P2 repeats — nothing kept
      (4L, "g h g h")         // within-doc repeat: first copy kept only
    ).toDF("doc_id", "text")
    val r = graft.api.Graft.paragraphDedup(docs, "doc_id", "text", parTokens = 2)
      .orderBy("doc_id")
      .as[(Long, Long, Long, Long, Double)].collect()
    assert(r === Array(
      (1L, 2L, 2L, 2L, 1.0),   // both paragraphs repeat elsewhere, both kept (first)
      (2L, 2L, 1L, 1L, 0.5),   // keeps only [e f]
      (3L, 1L, 1L, 0L, 0.0),   // its only paragraph lives in doc 1
      (4L, 2L, 2L, 1L, 0.5)))  // g h twice: both occurrences are "dup", one kept
  }

  test("paragraphDedup on an all-unique corpus keeps everything") {
    val docs = Seq((1L, "a b c"), (2L, "d e f"), (3L, "g h")).toDF("doc_id", "text")
    val r = graft.api.Graft.paragraphDedup(docs, "doc_id", "text", parTokens = 2)
    assert(r.filter(col("n_dup_pars") =!= 0 || col("kept4") =!= 1.0).isEmpty)
    // ceil(3/2)=2 paragraphs for 3 tokens, 1 for 2 tokens
    assert(r.orderBy("doc_id").select("n_pars").as[Long].collect() === Array(2L, 2L, 1L))
  }

  // ---------- hybrid RRF (Similarity.hybridRrf) ----------

  test("hybridRrf emits a full fused top-5 per query with sane ranks") {
    val r = queries.Similarity.hybridRrf(spark, sf)
    val rows = r.collect()
    assert(rows.length === 50) // 10 queries × top-5
    // per query: rn 1..5, rrf_q non-increasing, never the query itself
    r.as[(Long, Int, Long, Long, Int, Int)].collect()
      .groupBy(_._1).foreach { case (q, rs) =>
        val sorted = rs.sortBy(_._2)
        assert(sorted.map(_._2).toSeq === Seq(1, 2, 3, 4, 5), s"q=$q")
        assert(sorted.sliding(2).forall(p => p(0)._4 >= p(1)._4), s"q=$q rrf order")
        assert(rs.forall(_._3 != q), s"q=$q ranked itself")
        assert(rs.forall(x => x._5 >= 1), s"q=$q dense rank")
      }
  }

  test("hybridRrf fusion arithmetic: both-rank-1 beats rank-(1,3) beats dense-only") {
    // floor(2^20/61)·2 > floor(2^20/61)+floor(2^20/63) > floor(2^20/61)
    val both1 = 2 * (1048576 / 61)
    val r13 = 1048576 / 61 + 1048576 / 63
    assert(both1 > r13 && r13 > 1048576 / 61)
  }

  // ---------- span rewrite (Graft.duplicateSpanRewrite) ----------

  test("duplicateSpanRewrite drops exactly the corpus-duplicated 8-token spans") {
    val w = (1 to 10).map(i => s"w$i")
    val docs = Seq(
      (1L, w.mkString(" ")),                        // w1..w10
      (2L, (w.take(8) :+ "x" :+ "y").mkString(" ")), // shares the w1..w8 span
      (3L, (20 to 30).map(i => s"u$i").mkString(" "))) // untouched
      .toDF("doc_id", "text")
    val r = graft.api.Graft.duplicateSpanRewrite(docs, "doc_id", "text")
      .orderBy("doc_id")
      .as[(Long, Long, Long, Long, String)].collect()
    // doc 1: tokens 0..7 covered -> keeps "w9 w10"; doc 2 keeps "x y"
    assert(r.map(x => (x._1, x._2, x._3, x._4)) ===
      Array((1L, 10L, 2L, 1L), (2L, 10L, 2L, 1L), (3L, 11L, 11L, 0L)))
    val md5 = java.security.MessageDigest.getInstance("MD5")
    def h(s: String) = md5.digest(s.getBytes("UTF-8")).map("%02x".format(_)).mkString
    assert(r(0)._5 === h("w9 w10"))
    assert(r(1)._5 === h("x y"))
    assert(r(2)._5 === h((20 to 30).map(i => s"u$i").mkString(" ")))
  }

  test("duplicateSpanRewrite: within-doc repetition counts as duplication") {
    // one doc, the same 8-token run twice -> both occurrences flagged
    val span = (1 to 8).map(i => s"t$i").mkString(" ")
    val docs = Seq((7L, s"$span $span tail")).toDF("doc_id", "text")
    val r = graft.api.Graft.duplicateSpanRewrite(docs, "doc_id", "text")
      .as[(Long, Long, Long, Long, String)].head()
    // 17 tokens; the two exact span starts (0 and 8) are duplicated
    // fingerprints; the intermediate rotations are unique
    assert(r._2 === 17L)
    assert(r._3 === 1L)   // only "tail" survives
    assert(r._4 === 2L)
  }

  // ---------- fuzzy decontamination (PipelineOps.decontaminateMinhash) ----------

  test("minhash decontamination flags a planted paraphrased eval leak") {
    val base = (1 to 12).map(i => s"tok$i").mkString(" ") // 12 distinct tokens
    val train = Seq(
      (1L, base + " extra trailing words here"),           // the leak: shares most shingles
      (2L, (50 to 65).map(i => s"tok$i").mkString(" ")))   // unrelated
      .toDF("doc_id", "text")
    val evalSet = Seq((100L, base)).toDF("doc_id", "text")
    def sigs(df: org.apache.spark.sql.DataFrame) =
      api.Graft.minhashSignatures(df, "doc_id", "text", numHashes = 32,
        baseHash = api.Graft.md5Hash60)
    val flagged = api.Graft.minhashCandidatesAgainst(
        sigs(train), sigs(evalSet), "doc_id",
        bands = 8, rowsPerBand = 4, minEstJaccard = 0.2)
      .as[(Long, Long, Double)].collect()
    assert(flagged.map(f => (f._1, f._2)).toSet === Set((1L, 100L)))
    assert(flagged.head._3 > 0.2)
  }

  // ---------- at-rest IVF (Similarity.knnIvfPersisted) ----------

  test("knnIvfPersisted answers bit-identically to the in-memory knnIvf") {
    val atRest = queries.Similarity.knnIvfPersisted(spark, sf)
      .as[(Long, Int, Long, Int, Double)].collect().toSeq
    val inMem = queries.Similarity.knnIvf(spark, sf)
      .as[(Long, Int, Long, Int, Double)].collect().toSeq
    assert(atRest === inMem)
    assert(atRest.nonEmpty)
    // second call reuses the stored index (no retrain) and still matches
    val again = queries.Similarity.knnIvfPersisted(spark, sf)
      .as[(Long, Int, Long, Int, Double)].collect().toSeq
    assert(again === inMem)
  }

  // ---------- oracle CTE materialization (SparkEntry.materializeCtes) ----------

  test("materializeCtes rewrites CTE headers only, idempotently") {
    val sql =
      """WITH a AS (
        |  SELECT 1),
        |b AS (
        |  SELECT x, row_number() OVER (PARTITION BY y ORDER BY z) AS rn
        |  FROM t
        |  WINDOW w AS (PARTITION BY y))
        |SELECT * FROM b""".stripMargin
    val out = SparkEntry.materializeCtes(sql)
    assert(out.contains("WITH a AS MATERIALIZED ("))
    assert(out.contains("b AS MATERIALIZED ("))
    // window clauses and OVER(...) are untouched
    assert(out.contains("OVER (PARTITION BY y ORDER BY z)"))
    assert(out.contains("WINDOW w AS (PARTITION BY y)"))
    // idempotent: a second pass changes nothing
    assert(SparkEntry.materializeCtes(out) === out)
    // every emitted oracle carries at least one hint when it has a CTE —
    // except WITH RECURSIVE, whose column-list header (`walk(depth, nk)
    // AS (`) the regex correctly leaves alone: materializing a recursive
    // CTE would be invalid
    val withCtes = SparkEntry.oracleSql
      .filter { case (_, s) => s.contains("WITH ") && !s.contains("WITH RECURSIVE") }
    assert(withCtes.nonEmpty)
    assert(withCtes.forall { case (_, s) => s.contains("AS MATERIALIZED (") })
  }

  // ---------- grouped k-means (Graft.groupedKmeans) ----------

  test("groupedKmeans is bit-identical to independent per-group kmeans") {
    val vecs = (0L until 40L).flatMap { id =>
      Seq(0, 1).map(g => (g, id,
        Array.tabulate(4)(j => ((id * 7 + j * 3 + g * 11) % 13).toFloat / 13f)))
    }
    val df = vecs.toDF("grp", "id", "v")
    val (cents, assigns) = api.Graft.groupedKmeans(df, "grp", "id", "v",
      k = 3, iters = 2)
    for (g <- Seq(0, 1)) {
      val solo = api.Graft.kmeans(
        df.filter(col("grp") === g).select(col("id"), col("v")),
        "id", "v", k = 3, iters = 2)
      val cg = cents.filter(col("grp") === g)
        .select(col("c_id"), col("centroid")).as[(Long, Array[Float])]
        .collect().sortBy(_._1).map { case (c, a) => (c, a.toSeq) }
      val cs = solo.centroids.as[(Long, Array[Float])]
        .collect().sortBy(_._1).map { case (c, a) => (c, a.toSeq) }
      assert(cg === cs, s"centroids differ for group $g")
      val ag = assigns.filter(col("grp") === g)
        .select(col("id"), col("c_id")).as[(Long, Long)].collect().toMap
      val as_ = solo.assignments.as[(Long, Long)].collect().toMap
      assert(ag === as_, s"assignments differ for group $g")
    }
  }

  // ---------- streaming kNN (StreamingQueries.streamKnn) ----------

  test("streamKnn final state equals the batch brute-force top-5") {
    val streamed = streaming.StreamingQueries.streamKnn(spark, sf)
      .as[(Long, Int, Long, Int, Double)].collect().toSet
    val batch = queries.Similarity.knnBruteForce(spark, sf)
      .as[(Long, Int, Long, Int, Double)].collect().toSet
    assert(streamed === batch)
    assert(streamed.nonEmpty)
  }
}
