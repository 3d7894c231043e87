package graft

import org.apache.spark.sql.functions._
import org.apache.hadoop.fs.Path
import org.apache.parquet.hadoop.ParquetFileReader
import org.apache.parquet.hadoop.util.HadoopInputFile
import scala.jdk.CollectionConverters._

/** Round-7 additions: physical z-order prune-ability measured from real
  * parquet row-group footers, the multimodal edge-union clustering, and
  * regressions for the round-6 ADVICE fixes (MapType-safe tie-break hash,
  * scheme-aware KV-store existence probe, wildcard-safe JDBC tableExists). */
class Round7Spec extends SparkSpec {
  import spark.implicits._

  // ---------- z-order: row groups really are skippable ----------

  /** Row groups in `dir` whose [min,max] box on user_id AND value intersects
    * the top-corner box (user_id ≥ 8, value ≥ 150) — the groups a parquet
    * reader must touch; everything else is stats-pruned. Read straight from
    * the file footers, the same statistics the scan uses. (The box bounds
    * from ABOVE because at sf0.001 every row group's min on both dims is
    * near the global min — only the max side discriminates.) */
  private def touchableRowGroups(dir: String): (Int, Int) = {
    val conf = spark.sparkContext.hadoopConfiguration
    val fs = new Path(dir).getFileSystem(conf)
    val files = fs.listFiles(new Path(dir), true)
    var total = 0
    var touchable = 0
    while (files.hasNext) {
      val f = files.next()
      if (f.getPath.getName.endsWith(".parquet")) {
        val reader = ParquetFileReader.open(HadoopInputFile.fromPath(f.getPath, conf))
        try {
          val schema = reader.getFooter.getFileMetaData.getSchema
          val iU = schema.getFieldIndex("user_id")
          val iV = schema.getFieldIndex("value")
          reader.getFooter.getBlocks.asScala.foreach { block =>
            total += 1
            val su = block.getColumns.get(iU).getStatistics
            val sv = block.getColumns.get(iV).getStatistics
            val uMax = su.genericGetMax.asInstanceOf[java.lang.Long].longValue
            val vMax = sv.genericGetMax.asInstanceOf[java.lang.Double].doubleValue
            if (uMax >= 8L && vMax >= 150.0) touchable += 1
          }
        } finally reader.close()
      }
    }
    (touchable, total)
  }

  test("z-order layout makes row groups skippable where round-robin does not") {
    val events = Tables.events(spark, sf).select(col("user_id"), col("value"))
    val keyed = api.Graft.zorderKey(events, "user_id", "value", bits = 16)
    val zDir = "/tmp/graft_zorder_spec/sorted"
    val rrDir = "/tmp/graft_zorder_spec/roundrobin"
    // the z-ordered table: range-partitioned and sorted by zkey → every
    // file/row-group covers one Morton range, so BOTH dims' spans stay tight
    keyed.repartitionByRange(8, col("zkey")).sortWithinPartitions("zkey")
      .write.mode("overwrite").parquet(zDir)
    // the control: same rows, round-robin shuffled → every row group spans
    // nearly the full range of both dims
    keyed.repartition(8)
      .write.mode("overwrite").parquet(rrDir)
    val (zTouch, zTotal) = touchableRowGroups(zDir)
    val (rTouch, rTotal) = touchableRowGroups(rrDir)
    assert(zTotal >= 8 && rTotal >= 8)
    // round-robin: every row group intersects the corner box
    assert(rTouch == rTotal, s"control layout should be unprunable: $rTouch/$rTotal")
    // z-order: the corner box touches a strict minority of row groups
    assert(zTouch * 2 < zTotal,
      s"z-order layout should prune most row groups: touchable $zTouch of $zTotal")
    // and the readback answers agree between the two layouts
    val q = (d: String) => spark.read.parquet(d)
      .filter(col("user_id") >= 8 && col("value") >= 150.0).count()
    assert(q(zDir) == q(rrDir))
  }

  // ---------- multimodal edge-union clustering ----------

  test("clustersFromEdges unions modalities transitively") {
    val docs = Seq((1L, "t"), (2L, "t"), (3L, "t"), (4L, "t"), (9L, "t"))
      .toDF("doc_id", "text")
    // 1~2 by "text", 2~3 by "embedding": one cluster {1,2,3}; 4 and 9 isolated
    val textEdges = Seq((1L, 2L)).toDF("a", "b")
    val embEdges = Seq((2L, 3L)).toDF("a", "b")
    val got = api.Graft.clustersFromEdges(docs, "doc_id",
        textEdges.union(embEdges))
      .as[(Long, Long)].collect().toMap
    assert(got == Map(1L -> 1L, 2L -> 1L, 3L -> 1L, 4L -> 4L, 9L -> 9L))
  }

  // ---------- kmeans farthest-first init ----------

  test("kmeans farthest-first init separates clusters that first-k cannot") {
    // three line clusters; the k lowest ids all sit in cluster A, so the
    // first-k seeds start inside A and Lloyd merges B∪C around their
    // midpoint forever — the failure mode spread seeding exists to fix
    val pts = Seq(
      (1L, Array(0.00f)), (2L, Array(0.01f)), (3L, Array(0.02f)),
      (4L, Array(10.00f)), (5L, Array(10.01f)),
      (6L, Array(20.00f)), (7L, Array(20.01f))
    ).toDF("id", "vec")
    val ff = api.Graft.kmeans(pts, "id", "vec", k = 3, iters = 3,
      init = "farthest-first")
    assert(ff.centroids.count() == 3)
    val asg = ff.assignments.as[(Long, Long)].collect().toMap
    assert(Set(asg(1L), asg(2L), asg(3L)).size == 1)
    assert(asg(4L) == asg(5L) && asg(6L) == asg(7L))
    assert(Set(asg(1L), asg(4L), asg(6L)).size == 3,
      s"three true clusters must get three list_ids: $asg")
    // the first-k baseline on the same data cannot separate B from C
    val fk = api.Graft.kmeans(pts, "id", "vec", k = 3, iters = 3)
    val a2 = fk.assignments.as[(Long, Long)].collect().toMap
    assert(a2(4L) == a2(6L), s"first-k seeds all in A merge B and C: $a2")
  }

  // ---------- round-7 operators ----------

  test("bm25Rank matches a by-hand model and ranks tf/length correctly") {
    val docs = Seq(
      (1L, "stream stream x y"),   // tf=2, dl=4
      (2L, "stream x y z"),        // tf=1, dl=4
      (3L, "a b c d")              // no query term
    ).toDF("doc_id", "text")
    val got = api.Graft.bm25Rank(docs, "doc_id", "text", Seq("stream"))
      .as[(Long, Long, Double)].collect().toList
    // by-hand: N=3, avgdl=4, df=2 ⇒ idf = ln((3-2+0.5)/2.5 + 1) quantized
    val idfQ = math.floor(math.log((3.0 - 2 + 0.5) / (2 + 0.5) + 1.0) * 1048576.0) / 1048576.0
    def score(tf: Long): Double = // dl = avgdl ⇒ length norm is exactly 1
      BigDecimal(idfQ * (tf * 2.2) / (tf + 1.2 * (0.25 + 0.75)))
        .setScale(4, BigDecimal.RoundingMode.HALF_UP).toDouble
    assert(got.map(_._1) == List(1L, 2L), s"tf must dominate at equal dl: $got")
    assert(got.forall(_._2 == 1L))
    assert(got.map(_._3) == List(score(2), score(1)), s"by-hand mismatch: $got")
  }

  test("ngramContainmentCandidates finds subset pairs Jaccard misses") {
    val short = "p q r s t u"                       // 4 shingles
    val long  = short + " v w x y z a b c d e f g"  // contains all 4 + 12 more
    val docs = Seq((1L, short), (2L, long), (3L, "unrelated words only here"))
      .toDF("doc_id", "text")
    val cont = api.Graft.ngramContainmentCandidates(docs, "doc_id", "text",
      minContainment = 0.9).as[(Long, Long, Long, Double, Long)].collect()
    assert(cont.toList == List((1L, 2L, 4L, 1.0, 1L)),
      s"short doc fully contained in long, contained side = 1: ${cont.toList}")
    val jac = api.Graft.ngramJaccardCandidates(docs, "doc_id", "text",
      minJaccard = 0.5).count()
    assert(jac == 0, "the same pair is invisible at Jaccard >= 0.5")
  }

  test("selectByTokenBudget keeps the quality-ranked prefix within budget") {
    val docs = Seq(
      (1L, "a b c"),      // dup_ratio 0, 3 tokens
      (2L, "x x x x"),    // dup_ratio 0.75, 4 tokens — ranked last
      (3L, "p q r s")     // dup_ratio 0, 4 tokens
    ).toDF("doc_id", "text")
    val got = api.Graft.selectByTokenBudget(docs, "doc_id", "text", 7L)
      .as[(Long, Long, Long)].collect().sortBy(_._1).toList
    // rank order (dup asc, id): 1 (cum 3), 3 (cum 7), 2 (cum 11 > 7 dropped)
    assert(got == List((1L, 3L, 3L), (3L, 4L, 7L)), s"got $got")
  }

  test("temperatureMixture T=2 gives sqrt-proportional rates") {
    val docs = (1 to 9).map(i => (i.toLong, "en")) ++ (1 to 4).map(i => (i.toLong, "fr"))
    val got = api.Graft.temperatureMixture(docs.toDF("doc_id", "lang"), "lang")
      .as[(String, Long, Double)].collect()
      .map { case (k, n, r) => k -> ((n, r)) }.toMap
    assert(got == Map("en" -> (9L, 0.6), "fr" -> (4L, 0.4)), s"got $got")
  }

  // ---------- ADVICE r6 regressions ----------

  test("latestPerKey accepts frames with MapType columns (r6 ADVICE)") {
    val df = Seq(
      (1L, 10L, Map("a" -> 1)), (1L, 20L, Map("b" -> 2)),
      (2L, 5L, Map("c" -> 3))
    ).toDF("k", "v", "m")
    // pre-fix this threw DATATYPE_MISMATCH.HASH_MAP_TYPE
    val got = api.Graft.latestPerKey(df, "k", "v")
      .select("k", "v").as[(Long, Long)].collect().toSet
    assert(got == Set((1L, 20L), (2L, 5L)))
  }

  test("ParquetKeyValueStore resolves scheme-qualified dirs (r6 ADVICE)") {
    val dir = "file:///tmp/graft_kv_scheme_spec"
    org.apache.hadoop.fs.FileSystem.get(
      new java.net.URI(dir), spark.sparkContext.hadoopConfiguration)
      .delete(new Path(dir), true)
    val store = new connectors.ParquetKeyValueStore(dir, "v")
    store.upsert(Seq((1L, 10L), (2L, 10L)).toDF("k", "v"), "k")
    // second upsert for a DIFFERENT key must NOT destroy key 1's state:
    // a local-only java.io.File probe reports the file: URI absent and
    // overwrites with just this batch
    store.upsert(Seq((3L, 20L)).toDF("k", "v"), "k")
    val snap = store.snapshot(spark).as[(Long, Long)].collect().toSet
    assert(snap == Set((1L, 10L), (2L, 10L), (3L, 20L)))
  }

  // ---------- product quantization ----------

  test("productQuantize is lossless when subspace cardinality <= k") {
    // 4 prototypes per 2-dim subspace; ids 0..3 carry the 4 distinct
    // prototypes in BOTH subspaces, so the k-lowest-id init starts Lloyd on
    // the exact solution and the fixed-point means keep it there. With every
    // subvector ON a codebook entry, encoding is exact — the invariant that
    // makes ADC distance equal true distance (and PQ top-k equal exact
    // top-k); on data with more distinct subvectors than k the same
    // machinery degrades gracefully to nearest-centroid quantization.
    val protos = Seq(Seq(0f, 0f), Seq(10f, 0f), Seq(0f, 10f), Seq(10f, 10f))
    val diag = (0 until 4).map(i => (i.toLong, protos(i) ++ protos(i)))
    val rest = (for { a <- 0 until 4; b <- 0 until 4; if a != b }
      yield protos(a) ++ protos(b)).zipWithIndex
      .map { case (v, i) => ((i + 4).toLong, v) }
    val df = (diag ++ rest).toDF("vid", "vec")
      .select(col("vid"), col("vec").cast("array<float>").as("vec"))
    val pq = api.Graft.productQuantize(df, "vid", "vec", dim = 4, m = 2, k = 4)
    assert(pq.codebooks.count() == 8)   // m * k
    assert(pq.codes.count() == 32)      // N * m
    val mismatched = pq.codes
      .join(pq.codebooks.withColumnRenamed("c_id", "code"), Seq("sub", "code"))
      .join(df, "vid")
      .filter(expr("slice(vec, sub * 2 + 1, 2) <> centroid"))
    assert(mismatched.count() == 0, "a subvector did not encode to itself")
  }

  // ---------- incremental MinHash dedup ----------

  test("minhashCandidatesAgainst joins new x index only, never index x index") {
    val a = "the quick brown fox jumps over the lazy dog and runs far away"
    val aDup = a.replace("runs", "hops") // near-dup of a
    val index = Seq((1L, a), (2L, aDup),
      (3L, "completely different content about spark shuffles and parquet"))
    val fresh = Seq((10L, a), // exact copy of index doc 1
      (11L, "unrelated text with zero overlap whatsoever in any shingle"))
    def sigs(rows: Seq[(Long, String)]) = api.Graft.minhashSignatures(
      rows.toDF("doc_id", "text"), "doc_id", "text",
      numHashes = 32, baseHash = api.Graft.md5Hash60)
    val got = api.Graft.minhashCandidatesAgainst(
        sigs(fresh), sigs(index), "doc_id",
        bands = 8, rowsPerBand = 4, minEstJaccard = 0.2)
      .as[(Long, Long, Double)].collect()
    // the exact copy is found with a full-agreement signature
    assert(got.contains((10L, 1L, 1.0)), s"got ${got.toList}")
    // every pair is new x index: the index's internal near-dup (1,2) is the
    // index build's business, not the increment's
    assert(got.forall { case (n, i, _) => n >= 10L && i < 10L }, s"got ${got.toList}")
    // the unrelated new doc matches nothing
    assert(!got.exists(_._1 == 11L), s"got ${got.toList}")
  }

  // ---------- BPE pair counts ----------

  test("bpePairCounts weights pairs by corpus frequency over word types") {
    val docs = Seq("ab ab abc", "ab").toDF("text")
    val got = api.Graft.bpePairCounts(docs, "text", topK = 10)
      .as[(String, Long, Long)].collect().toList
    // word histogram: "ab" x3, "abc" x1; pairs: "ab" from both types
    // (3 + 1 occurrences), "bc" from "abc" only
    assert(got == List(("ab", 4L, 2L), ("bc", 1L, 1L)), s"got $got")
  }

  test("JdbcKeyValueStore: '_' in the table name does not false-match (r6 ADVICE)") {
    val url = "jdbc:derby:memory:graft_r7_wild;create=true"
    // create kv1state ONLY — the pre-fix getTables(null, null, 'kv_state')
    // pattern-matched it ('_' is a single-char wildcard) and skipped
    // initialization, then the first upsert read a missing table and failed
    val conn = java.sql.DriverManager.getConnection(url)
    try conn.createStatement().execute(
      "CREATE TABLE kv1state (k BIGINT, v BIGINT)")
    finally conn.close()
    val store = new connectors.JdbcKeyValueStore(url, "kv_state", "v")
    store.upsert(Seq((1L, 10L)).toDF("k", "v"), "k")
    // non-overlapping keys: a false-negative existence probe would Overwrite
    // and silently drop key 1 — the exact data-loss mode under test
    store.upsert(Seq((2L, 20L), (3L, 20L)).toDF("k", "v"), "k")
    val snap = store.snapshot(spark).as[(Long, Long)].collect().toSet
    assert(snap == Set((1L, 10L), (2L, 20L), (3L, 20L)))
  }
}
