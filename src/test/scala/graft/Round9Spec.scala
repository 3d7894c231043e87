package graft

import org.apache.spark.sql.functions._

/** Round-9 additions: SemDeDup cluster-then-prune semantics, DSIR
  * importance weights, TextRank fixed-point PageRank, triangle counting by
  * degree-ordered orientation, and MMR diversity reranking. */
class Round9Spec extends SparkSpec {
  import spark.implicits._

  // ---------- SemDeDup (Graft.semanticDedup) ----------

  test("semanticDedup emits one decision per vector and keeps every cluster minimum") {
    val emb = Tables.embeddings(spark, sf).select(col("vec_id"), col("embedding"))
    val n = emb.count()
    val d = graft.api.Graft.semanticDedup(emb, "vec_id", "embedding", k = 8, iters = 2)
    assert(d.count() === n)
    assert(d.select("vec_id").distinct().count() === n)
    // a kept row has no dup_of; a dropped row names a strictly lower id
    assert(d.filter(col("keep") === 1 && col("dup_of").isNotNull).isEmpty)
    assert(d.filter(col("keep") === 0 && (col("dup_of").isNull
      || col("dup_of") >= col("vec_id"))).isEmpty)
    // the lowest id of every cluster has no lower-id partner -> always kept
    val minPerCluster = d.groupBy("c_id").agg(min("vec_id").as("vec_id"))
    assert(minPerCluster.join(d, Seq("c_id", "vec_id"))
      .filter(col("keep") === 0).isEmpty)
    // dup_of lives in the SAME cluster (pairs never cross a cluster boundary)
    val byId = d.select(col("vec_id").as("dup_of"), col("c_id").as("src_cluster"))
    assert(d.filter(col("dup_of").isNotNull).join(byId, "dup_of")
      .filter(col("c_id") =!= col("src_cluster")).isEmpty)
  }

  test("semanticDedup drops exact duplicates within a cluster, keeps distinct vectors") {
    val df = Seq(
      (1L, Array(1f, 0f, 0f, 0f)),
      (2L, Array(1f, 0f, 0f, 0f)),   // exact dup of 1
      (3L, Array(0.9f, 0.1f, 0f, 0f)), // near dup of 1 (cos ~ 0.994)
      (4L, Array(0f, 1f, 0f, 0f)),   // orthogonal to 1 but near 5
      (5L, Array(0f, 0.9f, 0.1f, 0f))).toDF("id", "v")
    val d = graft.api.Graft.semanticDedup(df, "id", "v", k = 2, iters = 2, tau = 0.9)
      .collect().map(r => r.getLong(0) -> (r.getInt(3), Option(r.get(2)))).toMap
    assert(d(1L)._1 === 1)
    assert(d(2L) === ((0, Some(1L))))
    assert(d(3L) === ((0, Some(1L))))
    assert(d(4L)._1 === 1)
    assert(d(5L) === ((0, Some(4L))))
  }

  test("semanticDedup is deterministic across runs") {
    val emb = Tables.embeddings(spark, sf).select(col("vec_id"), col("embedding"))
    val a = graft.api.Graft.semanticDedup(emb, "vec_id", "embedding", k = 8, iters = 2)
    val b = graft.api.Graft.semanticDedup(emb, "vec_id", "embedding", k = 8, iters = 2)
    assert(a.except(b).isEmpty && b.except(a).isEmpty)
  }

  test("semanticDedup fail-fasts when a cluster exceeds the declared occupancy") {
    val df = Seq(
      (1L, Array(1f, 0f)), (2L, Array(1f, 0.1f)), (3L, Array(1f, 0.2f)),
      (4L, Array(1f, 0.3f)), (5L, Array(1f, 0.4f))).toDF("id", "v")
    val e = intercept[Exception] {
      graft.api.Graft.semanticDedup(df, "id", "v", k = 1, iters = 1,
        maxClusterOccupancy = 2L).collect()
    }
    assert(e.getMessage.contains("maxClusterOccupancy") ||
      Option(e.getCause).exists(_.getMessage.contains("maxClusterOccupancy")))
  }

  // ---------- DSIR importance weights (Graft.dsirWeights) ----------

  test("dsirWeights ranks target-looking documents above source-only ones") {
    val docs = Seq(
      (1L, "aa bb cc aa bb", true),   // pure target vocabulary
      (2L, "aa bb cc cc aa", true),
      (3L, "xx yy zz xx yy", false),  // vocabulary never seen in target
      (4L, "aa bb xx yy zz", false)). // mixed
      toDF("id", "text", "is_t")
    val w = graft.api.Graft.dsirWeights(docs, "id", "text", col("is_t"), buckets = 64)
      .collect().map(r => r.getLong(0) -> r.getDouble(2)).toMap
    assert(w(1L) > w(4L) && w(2L) > w(4L))
    assert(w(4L) > w(3L))
    // token counts survive the scoring join
    val n = graft.api.Graft.dsirWeights(docs, "id", "text", col("is_t"), buckets = 64)
      .collect().map(r => r.getLong(0) -> r.getLong(1)).toMap
    assert(n(1L) === 5L && n(3L) === 5L)
  }

  test("dsir_select favors the English slice it targets") {
    val top = queries.TextAnalysis.dsirSelect(spark, sf)
    val enShare = top.filter(col("lang") === "en").count().toDouble / top.count()
    val corpusShare = Tables.documents(spark, sf).filter(col("lang") === "en").count().toDouble /
      Tables.documents(spark, sf).count()
    assert(enShare > corpusShare,
      s"top slice en share $enShare should beat corpus share $corpusShare")
  }

  // ---------- source divergence (Graft.sourceDivergence) ----------

  test("sourceDivergence: skewed sources diverge more; uniform entropy is ln(2)") {
    val docs = Seq(
      ("balanced", "x y x y x y x y"),
      ("balanced", "y x y x y x y x"),
      ("skewed", "x x x x x x x y")).toDF("src", "text")
    val r = graft.api.Graft.sourceDivergence(docs, "text", "src")
      .collect().map(row => row.getString(0) ->
        (row.getDouble(3), row.getDouble(4))).toMap
    // quantization can push a perfectly-aligned KL a few 2^-20 below zero,
    // never more
    assert(r("balanced")._1 > -1e-5 && r("skewed")._1 > r("balanced")._1)
    // balanced source is a uniform coin: H = ln 2
    assert(math.abs(r("balanced")._2 - math.log(2.0)) < 1e-3)
  }

  // ---------- DSIR selection pipeline ----------

  test("pipeline_select_dsir respects the token budget and the llr rank order") {
    val rows = queries.PipelineOps.pipelineSelectDsir(spark, sf)
      .orderBy(col("llr").desc, col("doc_id").asc).collect()
    assert(rows.nonEmpty)
    assert(rows.map(_.getLong(1)).sum <= 8000L)
    // cum_tokens is exactly the running sum in (llr desc, doc_id) order
    var cum = 0L
    rows.foreach { r =>
      cum += r.getLong(1)
      assert(r.getLong(3) === cum)
    }
    // every selected doc survived the gopher gate: >= 20 words
    assert(rows.forall(_.getLong(1) >= 20L))
  }

  // ---------- label propagation (Graft.labelPropagate) ----------

  test("labelPropagate spreads along a path and breaks vote ties to the smaller label") {
    val nodes = Seq(1L, 2L, 3L, 4L, 5L).toDF("n")
    val seeds = Seq((1L, 10L), (5L, 20L)).toDF("n", "lab")
    val edges = Seq((1L, 2L), (2L, 3L), (3L, 4L), (4L, 5L)).toDF("a", "b")
    def run(iters: Int) = graft.api.Graft.labelPropagate(nodes, "n",
        seeds, "n", "lab", edges, "a", "b", iters)
      .collect().map(x => x.getLong(0) -> (x.getInt(1), x.get(2))).toMap
    val r1 = run(1)
    // round 1 reaches exactly the direct neighbors; the middle is untouched
    assert(r1(2L)._2 === 10L && r1(4L)._2 === 20L && r1(3L)._2 === null)
    val r3 = run(3)
    // seeds clamped
    assert(r3(1L) === ((1, 10L)) && r3(5L) === ((1, 20L)))
    // round 2: the middle sees one vote per side -> tie -> smaller label;
    // round 3: node 4 then ALSO ties (3 says 10, 5 says 20) and flips to 10 —
    // synchronous re-evaluation, the documented Zhu-Ghahramani semantics
    assert(r3(3L)._2 === 10L && r3(4L)._2 === 10L && r3(2L)._2 === 10L)
  }

  test("labelPropagate leaves unreachable nodes unlabeled") {
    val nodes = Seq(1L, 2L, 9L).toDF("n")
    val seeds = Seq((1L, 7L)).toDF("n", "lab")
    val edges = Seq((1L, 2L)).toDF("a", "b")
    val r = graft.api.Graft.labelPropagate(nodes, "n", seeds, "n", "lab",
        edges, "a", "b", iters = 2)
      .collect().map(x => x.getLong(0) -> x.get(2)).toMap
    assert(r(2L) === 7L && r(9L) === null)
  }

  // ---------- streaming DSIR ----------

  test("stream_dsir final state equals the batch per-language rollup") {
    val stream = streaming.StreamingQueries.streamDsir(spark, sf).collect()
    val docs = Tables.documents(spark, sf)
    val batch = graft.api.Graft.dsirWeights(docs, "doc_id", "text",
        col("lang") === "en", buckets = 256)
      .join(docs.select("doc_id", "lang"), "doc_id")
      .groupBy("lang").agg(count(lit(1)).as("n_docs"))
      .collect().map(r => r.getString(0) -> r.getLong(1)).toMap
    assert(stream.nonEmpty)
    stream.foreach { r =>
      assert(r.getLong(1) === batch(r.getString(0)))
    }
  }

  // ---------- outliers + hard negatives ----------

  test("embedding_outliers ranks by distance and hard_negatives never returns the anchor's label") {
    val out = queries.Similarity.embeddingOutliers(spark, sf).collect()
    assert(out.length === 50)
    // descending distance, ties to the lower id
    assert(out.sliding(2).forall { case Array(a, b) =>
      a.getDouble(2) > b.getDouble(2) ||
        (a.getDouble(2) == b.getDouble(2) && a.getLong(0) < b.getLong(0))
    })
    val hn = queries.Similarity.hardNegatives(spark, sf).collect()
    assert(hn.nonEmpty)
    assert(hn.forall(r => r.getInt(4) != r.getInt(1)))
    // 3 negatives per anchor, rn 1..3
    assert(hn.groupBy(_.getLong(0)).values.forall(_.map(_.getInt(2)).sorted.sameElements(Seq(1, 2, 3))))
  }

  // ---------- PCA power iteration (Graft.pcaPowerIteration) ----------

  test("pcaPowerIteration recovers a planted principal direction") {
    // points spread along (0.6, 0.8) with tiny orthogonal jitter
    val pts = (1 to 40).map { t =>
      val s = (t - 20.5) / 4.0
      val eps = (t % 3 - 1) * 0.01
      (t.toLong, Array((s * 0.6 + eps * 0.8).toFloat, (s * 0.8 - eps * 0.6).toFloat))
    }
    val df = pts.toDF("id", "v")
    val r = graft.api.Graft.pcaPowerIteration(df, "id", "v", dim = 2, iters = 8)
      .collect()
    val l = r.map(_.getDouble(1))
    // unit norm, and the loading ratio matches the planted 0.6 : 0.8
    assert(math.abs(l.map(x => x * x).sum - 1.0) < 1e-6)
    assert(math.abs(math.abs(l(1) / l(0)) - 0.8 / 0.6) < 0.01)
    // lambda is the dominant variance - strictly positive here
    assert(r.head.getDouble(2) > 0.1)
  }

  // ---------- doc novelty (Graft.docNovelty) ----------

  test("docNovelty: exact duplicates score 0, unique phrasing scores 1") {
    val common = (1 to 10).map(i => s"w$i").mkString(" ")
    val unique = (1 to 10).map(i => s"u$i").mkString(" ")
    val docs = Seq((1L, common), (2L, common), (3L, unique)).toDF("id", "text")
    val r = graft.api.Graft.docNovelty(docs, "id", "text")
      .collect().map(x => x.getLong(0) -> x.getDouble(2)).toMap
    assert(r(1L) === 0.0 && r(2L) === 0.0 && r(3L) === 1.0)
    // short docs (< 8 tokens) are excluded, as in the dedup siblings
    val short = Seq((9L, "a b c")).toDF("id", "text")
    assert(graft.api.Graft.docNovelty(short, "id", "text").isEmpty)
  }

  // ---------- mixture application (Graft.applyMixture) ----------

  test("applyMixture keeps rate=1 strata whole, drops rate=0 strata, and is deterministic") {
    val df = (1L to 200L).map(i => (i, if (i % 2 == 0) "a" else "b")).toDF("id", "g")
    val rates = Seq(("a", 1.0), ("b", 0.0)).toDF("g", "rate")
    val kept = graft.api.Graft.applyMixture(df, "id", "g", rates)
    assert(kept.filter(col("g") === "b").isEmpty)
    // rate 1.0 -> floor(65536) threshold admits every 16-bit hash value
    assert(kept.filter(col("g") === "a").count() === 100L)
    val again = graft.api.Graft.applyMixture(df, "id", "g", rates)
    assert(kept.except(again).isEmpty)
  }

  test("applyMixture achieved rates track requested rates on a large stratum") {
    val df = (1L to 4000L).map(i => (i, "x")).toDF("id", "g")
    val rates = Seq(("x", 0.25)).toDF("g", "rate")
    val n = graft.api.Graft.applyMixture(df, "id", "g", rates).count()
    // md5 is uniform: expect ~1000, allow generous slack
    assert(n > 800L && n < 1200L, s"sampled $n of 4000 at rate 0.25")
  }

  // ---------- TextRank (Graft.textRank) ----------

  test("textRank ranks the hub of a star graph first") {
    val docs = Seq("hub spoke1", "hub spoke2", "hub spoke3", "hub spoke4")
      .toDF("text")
    val r = graft.api.Graft.textRank(docs, "text", iters = 5, topK = 10).collect()
    assert(r.head.getString(0) === "hub")
    // damped PageRank lower bound: every rank >= (1 - d)
    assert(r.forall(_.getDouble(1) >= 0.1499))
    // spokes are symmetric -> identical scores
    val spokes = r.filter(_.getString(0).startsWith("spoke")).map(_.getDouble(1))
    assert(spokes.length === 4 && spokes.distinct.length === 1)
  }

  // ---------- Triangle census (Graft.triangleCensus) ----------

  test("triangleCensus counts a known graph exactly") {
    // triangle {1,2,3} plus pendant edge (3,4): degrees 2,2,3,1
    val e = Seq((1L, 2L), (2L, 3L), (1L, 3L), (3L, 4L)).toDF("a", "b")
    val r = graft.api.Graft.triangleCensus(e, "a", "b").collect().head
    assert(r.getLong(0) === 4L)   // nodes
    assert(r.getLong(1) === 4L)   // edges
    assert(r.getLong(2) === 5L)   // open wedges: 1 + 1 + 3 + 0
    assert(r.getLong(3) === 1L)   // triangles
    assert(r.getDouble(4) === 0.6) // 3*1/5
  }

  // ---------- MMR diversity rerank (Graft.mmrSelect) ----------

  test("mmrSelect trades relevance for diversity exactly as the greedy objective says") {
    // c2 is nearly as relevant as c1 but redundant with it; c3 is less
    // relevant but orthogonal — MMR must pick c1 then c3 (plain top-2
    // would pick c1 then c2)
    val cands = Seq((7L, 1L, 0.90), (7L, 2L, 0.89), (7L, 3L, 0.50))
      .toDF("q", "c", "rel")
    val sims = Seq(
      (7L, 1L, 2L, 0.95), (7L, 2L, 1L, 0.95),
      (7L, 1L, 3L, 0.00), (7L, 3L, 1L, 0.00),
      (7L, 2L, 3L, 0.00), (7L, 3L, 2L, 0.00)).toDF("q", "a", "b", "s")
    val picks = graft.api.Graft.mmrSelect(cands, "q", "c", "rel",
        sims, "a", "b", "s", k = 3, lambda = 0.5)
      .orderBy("step").collect()
    assert(picks.map(_.getLong(2)).toSeq === Seq(1L, 3L, 2L))
    // step-2 objective: 0.5*0.5 - 0.5*0.0 = 0.25
    assert(math.abs(picks(1).getDouble(4) - 0.25) < 1e-12)
    // step-3 objective for the redundant c2: 0.5*0.89 - 0.5*0.95 = -0.03
    assert(math.abs(picks(2).getDouble(4) - (-0.03)) < 1e-12)
  }

  test("knn_mmr emits k steps per query and never repeats a candidate") {
    val r = queries.Similarity.knnMmr(spark, sf)
    val perQ = r.groupBy("q_id").agg(
      count(lit(1)).as("n"), countDistinct("c_id").as("nc"))
    assert(perQ.filter(col("n") =!= 5 || col("nc") =!= 5).isEmpty)
  }

  test("triangleCensus equals brute-force triple enumeration on random graphs") {
    val rng = new scala.util.Random(42)
    for (trial <- 1 to 3) {
      val n = 12
      val edges = (for {
        a <- 1 to n; b <- (a + 1) to n if rng.nextDouble() < 0.35
      } yield (a.toLong, b.toLong)).toList
      if (edges.nonEmpty) {
        val adj = edges.toSet
        def has(x: Long, y: Long) = adj.contains((math.min(x, y), math.max(x, y)))
        val nodes = edges.flatMap(e => Seq(e._1, e._2)).distinct.sorted
        val triples = (for {
          i <- nodes; j <- nodes if j > i; k <- nodes if k > j
          if has(i, j) && has(j, k) && has(i, k)
        } yield 1).size
        val wedges = nodes.map { v =>
          val d = edges.count(e => e._1 == v || e._2 == v).toLong
          d * (d - 1) / 2
        }.sum
        val r = graft.api.Graft.triangleCensus(edges.toDF("a", "b"), "a", "b")
          .collect().head
        assert(r.getLong(3) === triples.toLong, s"trial=$trial triangles")
        assert(r.getLong(2) === wedges, s"trial=$trial wedges")
      }
    }
  }

  test("mmrSelect equals a Scala-collections greedy reference on random inputs") {
    val rng = new scala.util.Random(7)
    for (trial <- 1 to 3) {
      val cands = (1L to 8L).map(c => (1L, c, math.floor(rng.nextDouble() * 1e6) / 1e6))
      val simMap = (for { a <- 1L to 8L; b <- 1L to 8L if a != b } yield {
        val s = math.floor(rng.nextDouble() * 1e6) / 1e6
        (math.min(a, b), math.max(a, b)) -> s
      }).toMap
      val sims = simMap.toSeq.flatMap { case ((a, b), s) =>
        Seq((1L, a, b, s), (1L, b, a, s)) }
      // greedy reference
      val rel = cands.map(c => c._2 -> c._3).toMap
      var sel = List.empty[Long]
      for (_ <- 1 to 4) {
        val rem = rel.keySet -- sel
        val best = rem.toSeq.map { c =>
          val ms = if (sel.isEmpty) 0.0
            else sel.map(s => simMap((math.min(c, s), math.max(c, s)))).max
          (0.5 * rel(c) - 0.5 * ms, c)
        }.sortBy { case (sc, c) => (-sc, c) }.head._2
        sel = sel :+ best
      }
      val got = graft.api.Graft.mmrSelect(
          cands.toDF("q", "c", "r"), "q", "c", "r",
          sims.toDF("q", "a", "b", "s"), "a", "b", "s", k = 4, lambda = 0.5)
        .orderBy("step").collect().map(_.getLong(2)).toList
      assert(got === sel, s"trial=$trial")
    }
  }

  test("triangleCensus on K4 finds all four triangles, and dedups input edges") {
    val k4 = (for {a <- 1L to 4L; b <- 1L to 4L if a < b} yield (a, b))
    // feed each edge twice in both orientations - the census must distinct()
    val e = (k4 ++ k4.map { case (a, b) => (b, a) }).toDF("a", "b")
    val r = graft.api.Graft.triangleCensus(e, "a", "b").collect().head
    assert(r.getLong(1) === 6L && r.getLong(3) === 4L && r.getDouble(4) === 1.0)
  }
}
