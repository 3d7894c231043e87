package graft
import org.apache.spark.sql.SparkSession

/** Benchmark main: times every query in SparkEntry.queries on SPARK_GRAFT_SF_DIR.
  *
  * Contract: the LAST stdout line is ONE JSON object. The driver captures only
  * the last ~2000 chars of stdout, so that line must stay well under that —
  * per-query detail for all 100+ queries (~3KB) goes to BENCH_DETAIL.json and
  * to an earlier (non-contract) stdout line; the final line carries the total
  * plus a headline subset of per-query seconds.
  */
object Bench {
  /** Fixed CPU-bound calibration probe (the StreamBench bracket, VERDICT
    * r14 task 2, brought to the batch bench): hash + shuffle + aggregate
    * across all cores — the same resource mix as the registry queries.
    * Under host-side CPU steal the probe inflates by the same factor the
    * queries do, so `calibrated = raw · calRef / median(cal)` is
    * contention-invariant to first order, and the artifact carries the
    * evidence (every probe reading ships in BENCH_DETAIL.json). Sized to
    * ~0.6 s idle at local[32] — cheap enough to run every ~32 queries. */
  private val calRows = 400000000L

  /** Frozen near-idle calibration reference (seconds): min over 5 spaced
    * post-warmup readings (0.698/0.721/0.730/0.746/0.761), local[32],
    * guest load ≈ 1.3, 2026-08-16 (r15 host — the same session whose
    * controls read q1=0.44 s / word_count=0.33 s, i.e. ~1.25× the
    * profile-era machine; the profile-vs-today delta stays visible in the
    * controls ratio, NOT in this constant). Re-freeze when the probe or
    * host changes. */
  private val calRefSec = 0.698

  /** Median of the SAME 5 frozen readings — the reference for the MEDIAN
    * estimator. Each estimator divides by its own-statistic reference
    * (median/median, min/min): dividing the pass median by the idle MIN
    * made an uncontended pass read factor ≈ idle-median/idle-min ≈ 1.05,
    * a built-in ~5% favorable bias in calibrated_value (ADVICE r15). With
    * matched references a truly idle pass yields both factors ≈ 1.0. */
  private val calRefMedianSec = 0.730

  private def calibrate(spark: SparkSession, cpus: Int): Double = {
    val t0 = System.nanoTime()
    spark.range(0L, calRows, 1L, cpus)
      .selectExpr("pmod(xxhash64(id), 1000) AS k")
      .groupBy("k").count().count()
    (System.nanoTime() - t0) / 1e9
  }

  /** Runs one trivial stateful streaming query per state-store provider so
    * provider/class init happens before any timed query. Failures are
    * ignored — warmup must never take the bench down. */
  def warmStreaming(spark: SparkSession): Unit = {
    val key = "spark.sql.streaming.stateStore.providerClass"
    for (provider <- Seq[Option[String]](None,
        Some("org.apache.spark.sql.execution.streaming.state.RocksDBStateStoreProvider"))) {
      val prev = spark.conf.getOption(key)
      try {
        provider.foreach(spark.conf.set(key, _))
        import org.apache.spark.sql.execution.streaming.runtime.MemoryStream
        implicit val sqlCtx: org.apache.spark.sql.SQLContext = spark.sqlContext
        import spark.implicits._
        val ms = MemoryStream[Long]
        ms.addData(1L, 2L, 3L)
        val q = ms.toDF().groupBy("value").count()
          .writeStream.outputMode("complete").format("memory")
          .queryName(s"graft_warm_${provider.isDefined}").start()
        try q.processAllAvailable() finally q.stop()
      } catch { case _: Throwable => () }
      finally {
        prev match {
          case Some(v) => spark.conf.set(key, v)
          case None => spark.conf.unset(key)
        }
      }
    }
  }

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
    // ...and the streaming engine's one-off bring-up (micro-batch planner,
    // memory-sink classes, state-store providers — HDFS AND RocksDB, whose
    // native-lib load alone is ~1s): one trivial stateful query per provider,
    // so the 14 stream_* queries pay only their own micro-batch work.
    warmStreaming(spark)
    // ...and the calibration probe's own plan (codegen + exchange reuse):
    // an unwarmed first probe reads ~1.6× and would bias the pass-local
    // machine factor high from the very first bracket.
    calibrate(spark, cpus.toInt)
    // name-sorted order: run-to-run comparable timings (Map iteration order
    // would put the JVM/codegen warmup cost on an arbitrary query).
    // AB mode (args = query names): re-time just those queries, 3 passes,
    // min-of-3 per query — the one-command contention check VERDICT r4 asked
    // for (a wall-time spike on an untouched plan is machine noise iff a
    // clean back-to-back re-run lands at the frozen profile).
    // SPARK_GRAFT_BENCH_BREAK=<name>: fault injection for exercising the
    // loud-failure path (VERDICT r12 task 2) — the named query throws
    // instead of running, and the run must visibly fail (failures key +
    // nonzero exit), never ship a silent "fast pass".
    val breakName = sys.env.get("SPARK_GRAFT_BENCH_BREAK")
    val all = SparkEntry.queries.toSeq.sortBy(_._1).map { case (n, fn) =>
      if (breakName.contains(n))
        n -> ((_: SparkSession, _: String) => sys.error(
          s"deliberate fault injection: SPARK_GRAFT_BENCH_BREAK=$n"))
      else n -> fn
    }
    val (selected, passes) =
      if (args.nonEmpty) (all.filter { case (n, _) => args.contains(n) }, 3) else (all, 1)
    // COLD-BUILD ACCOUNTING (VERDICT r12 task 5): the shared at-rest
    // artifacts (minhash signature table; IVF centroid/posting tables) are
    // built once per session; untimed here they'd be charged to whichever
    // consumer runs first in-pass and then erased by its warm re-time — a
    // regression confined to the BUILD path would never trip the ruler.
    // Build them explicitly, timed, before the pass; costs ship in
    // BENCH_DETAIL.json under "builds" with the queries each serves.
    val selNames = selected.map(_._1).toSet
    def timedBuild[T](f: => T): Double = {
      val t0 = System.nanoTime(); f; (System.nanoTime() - t0) / 1e9
    }
    val builds: Seq[(String, Double, Seq[String])] = Seq[
        (String, () => Any, Seq[String])](
      ("minhash_sig_table",
        () => graft.queries.Dedup.ensureSignatureTable(spark, sfDir),
        Seq("dedup_incremental", "dedup_index_foldin",
          "decontaminate_minhash", "contamination_report",
          "stream_decontaminate", "stream_decontaminate_stateless",
          "stream_online_curate", "pipeline_end_to_end")),
      ("ivf_index",
        () => graft.queries.Similarity.ensurePersistedIvf(spark, sfDir),
        Seq("knn_ivf_persisted", "stream_knn_ivf", "cluster_balanced_sample",
          "ann_index_stats")),
      ("pq_model",
        () => graft.queries.Similarity.ensurePersistedPq(spark, sfDir),
        Seq("knn_pq", "knn_refine", "ann_recall")),
      ("ivfpq_index",
        () => graft.queries.Similarity.ensurePersistedIvfPq(spark, sfDir),
        Seq("knn_ivfpq")),
      ("dsir_model",
        () => graft.queries.TextAnalysis.ensureDsirModel(spark, sfDir),
        Seq("dsir_select", "stream_dsir", "stream_online_curate"))
    ).filter { case (_, _, serves) => serves.exists(selNames.contains) }
      .flatMap { case (name, build, serves) =>
        try Some((name, timedBuild(build()), serves))
        catch { case e: Throwable =>
          System.err.println(s"[bench] WARNING: artifact build $name failed " +
            s"(${e.getClass.getSimpleName}) — its consumers will build inline")
          None
        }
      }
    // Times one query end to end, then releases its persisted blocks AFTER
    // the timer stops: every localCheckpoint(true) barrier leaves
    // MEMORY_AND_DISK blocks that are dead once the query returns, but
    // without an unpersist they accumulate across the whole registry — at
    // sf1 the storage pool fills after the ann_* family and unrelated
    // downstream queries thrash (measured: date_funcs 151.7 s polluted vs
    // 0.51 s isolated min-of-3; cumulate_windows 85.3 vs 3.8). A production
    // job releases its checkpoints at job end; per-query isolation is the
    // honest per-query cost.
    // LOUD FAILURES (VERDICT r12 task 2): a thrown query must never ship
    // its wall time as a normal reading — the error is recorded per query,
    // surfaced in BENCH_DETAIL.json and the final line, and fails the run
    // with a nonzero exit. A later successful invocation of the same query
    // (AB pass, re-time) clears the record: only a query whose LAST
    // invocation failed is a failure.
    val failures = scala.collection.mutable.LinkedHashMap[String, String]()
    // wall time of the last FAILED invocation, kept only for display when a
    // query never succeeds: a failure's time-to-throw must never compete in
    // any min-of-N reduce (ADVICE r13: a query that throws fast on one
    // attempt and succeeds on another would otherwise ship the failure's
    // fast time as a clean reading), so timeOnce returns MaxValue on error
    // and the substitution back to a finite, visibly-failed reading happens
    // once, at results assembly.
    val failDt = scala.collection.mutable.HashMap[String, Double]()
    def timeOnce(name: String,
        fn: (SparkSession, String) => org.apache.spark.sql.DataFrame): Double = {
      val t0 = System.nanoTime()
      val ok =
        try { fn(spark, sfDir).count(); failures.remove(name); true }
        catch { case e: Throwable =>
          failures(name) = (s"${e.getClass.getSimpleName}: " +
            String.valueOf(e.getMessage).replaceAll("[\"\\\\\\s]+", " ").take(160))
          false
        }
      val dt = (System.nanoTime() - t0) / 1e9
      spark.sparkContext.getPersistentRDDs.values
        .foreach(_.unpersist(blocking = false))
      if (ok) dt else { failDt(name) = dt; Double.MaxValue }
    }
    // CALIBRATION BRACKET (VERDICT r14 task 2): a fixed probe runs before
    // the pass, every 32 queries inside it, and after it — the pass-local
    // machine factor (median probe / frozen calRef) ships in the artifact,
    // and the calibrated total factors ambient contention OUT so the judge
    // can rule on the artifact alone instead of re-running the registry.
    val calReadings = scala.collection.mutable.ArrayBuffer[Double]()
    // re-time-round probes land in their own buffer (ADVICE r15): the
    // factors are computed from the IN-PASS readings alone, and the
    // artifact ships the two sets under separate keys so an auditor
    // recomputing median/min from `readings` reproduces the shipped
    // factors exactly.
    val retimeReadings = scala.collection.mutable.ArrayBuffer[Double]()
    def probe(buf: scala.collection.mutable.ArrayBuffer[Double] = calReadings): Unit =
      buf += calibrate(spark, cpus.toInt)
    val inPass = (1 to passes).map { p =>
      if (p > 1) Thread.sleep(2000) // spaced passes (AB mode): escape bursts
      probe()
      val r = selected.zipWithIndex.map { case ((name, fn), i) =>
        if (i > 0 && i % 32 == 0) probe()
        name -> timeOnce(name, fn)
      }
      probe()
      r
    }.reduce((a, b) => a.zip(b).map { case ((n, x), (_, y)) => n -> math.min(x, y) })
    def median(xs: Seq[Double]): Double = {
      val s = xs.sorted
      if (s.isEmpty) calRefMedianSec
      else if (s.size % 2 == 1) s(s.size / 2)
      else (s(s.size / 2 - 1) + s(s.size / 2)) / 2.0
    }
    val medianCal = median(calReadings.toSeq)
    // pass-local machine factors, floored at 1 (a faster-than-reference
    // machine must not inflate the calibrated total past the raw one).
    // TWO estimators bracket the truth: the MEDIAN tracks sustained
    // contention (the r14 scenario — every probe inflates together) but
    // over-corrects bursty load the queries mostly missed; the MIN is
    // immune to bursts but one quiet probe under sustained load
    // under-corrects. Each divides by its OWN-statistic idle reference
    // (median/median, min/min — ADVICE r15). The artifact ships both, so
    // the true clean-machine total lies in [raw/medianFactor,
    // raw/minFactor] and a judge can rule from the bracket without
    // re-running.
    val machineFactor = math.max(1.0, medianCal / calRefMedianSec)
    val machineFactorMin = math.max(1.0,
      (if (calReadings.isEmpty) calRefSec else calReadings.min) / calRefSec)
    // SELF-RULING full pass (VERDICT r11 task 2): a single full pass has
    // breached the 2× gate twice (r9, r11) on unchanged-plan queries during
    // machine-contention windows, forcing a next-round min-of-3 ruling. The
    // full run now carries its own ruling: any query whose in-pass reading
    // exceeds 1.5× its frozen profile (tools/profiles.json, min over committed
    // sf0.1 readings on current-era plans; floor 1.5 s — sub-second queries are
    // noise-dominated; the r12 full passes showed ambient load elevates the
    // whole pass ~1.5-1.9× while every min-of-3 re-time lands at profile, so
    // the 2× trigger left real contention uncorrected) is re-timed min-of-3
    // after the pass completes, and
    // BOTH readings ship in the output. The official per-query value is the
    // min (a clean re-run at profile proves the in-pass spike was load, the
    // same evidence standard BASELINE.md Protocol #2 already codifies; a
    // real regression reproduces in the re-time and stays visible).
    // KNOWN LIMIT: for shared-artifact rows (dedup_incremental/_foldin,
    // knn_ivf_persisted) the re-time is warm, so the one-time artifact
    // BUILD cost is charged to no query — the documented AB semantics
    // (BASELINE r11/r12 rulings), but it also means a regression confined
    // to the cold build path never trips the ruler; the build is timed
    // separately in SCALE.md when it changes.
    // r12: sf1 passes self-rule too (tools/profiles_sf1.json — the r12 sf1
    // pass hit the same alphabetical contention window the sf0.1 passes
    // kept hitting; see SCALE.md "Round-12 sf1 full pass + ruling").
    val profileFile = sfDir.replaceAll("/+$", "") match {
      case p if p.endsWith("sf0.1") => "tools/profiles.json"
      case p if p.endsWith("sf1") => "tools/profiles_sf1.json"
      case _ => ""
    }
    // A load failure must NOT silently disable the ruling machinery: a full
    // pass without profiles ships contention-polluted readings as official
    // values — the exact failure this feature corrects. Warn loudly (the
    // driver captures stderr) so a CWD or key-rename mistake is visible.
    val profiles: Map[String, Double] =
      if (args.nonEmpty || profileFile.isEmpty) Map.empty
      else try {
        val node = new com.fasterxml.jackson.databind.ObjectMapper()
          .readTree(new java.io.File(profileFile)).get("profiles")
        import scala.jdk.CollectionConverters._
        val m = node.fields().asScala.map(e => e.getKey -> e.getValue.asDouble()).toMap
        if (m.isEmpty) System.err.println(
          s"[bench] WARNING: $profileFile loaded but empty — self-ruling disabled")
        m
      } catch { case e: Throwable =>
        System.err.println(s"[bench] WARNING: could not load $profileFile " +
          s"(${e.getClass.getSimpleName}: ${e.getMessage}) — self-ruling " +
          "DISABLED for this pass; in-pass readings ship unruled")
        Map.empty
      }
    val byNameSel = selected.toMap
    // a failed query's wall time is an error artifact, not a slow reading —
    // re-timing it would just fail thrice more. The flag trigger scales by
    // the pass-local machine factor (capped 2×): under a uniform slowdown
    // the whole registry reads high and the old fixed trigger queued ~30
    // re-times INTO the same contention window (r14 driver pass: min3 >
    // inpass on 30 rulings — wall time burned, nothing adjudicated); a
    // genuinely regressed query still exceeds factor × 1.5 × profile.
    // BURST SELF-ADJUDICATION (VERDICT r15 task 2): when the two factor
    // estimators diverge, the window was BURSTY — probes that happened to
    // land inside a steal burst read high while quiet-moment probes read
    // near idle. In exactly that regime the factor-scaled trigger is
    // wrong twice over: the scaled threshold lets 2-3× readings ship
    // unruled (r15 driver pass: 25 rows at 2-2.9× profile, e.g.
    // pipeline_curate_multimodal 16.14 s vs 6.16 clean), and re-times are
    // CHEAP because the burst has usually passed by end-of-pass. So on
    // divergence the trigger drops to the unscaled 1.5× profile; only
    // under agreeing factors (sustained, uniform contention) does it
    // scale, where re-timing into the same load would adjudicate nothing.
    val bursty = machineFactor / machineFactorMin > 1.15
    val trigFactor =
      if (bursty) 1.5 else 1.5 * math.min(machineFactor, 2.0)
    val flagged = inPass.filter { case (n, dt) =>
      !failures.contains(n) &&
        profiles.get(n).exists(p => dt > math.max(1.5, trigFactor * p))
    }.map(_._1)
    // ROUND-ROBIN re-times (VERDICT r14 task 2): three spaced rounds over
    // ALL flagged queries — the same query's attempts are separated by a
    // whole round plus a 2 s gap, so a steal burst shorter than a round
    // can't poison all three; each round is cal-bracketed so the rulings
    // carry their own contention context.
    val retimed: Map[String, Double] =
      if (flagged.isEmpty) Map.empty
      else {
        val rounds = (1 to 3).map { r =>
          if (r > 1) Thread.sleep(2000)
          probe(retimeReadings)
          flagged.map(n => n -> timeOnce(n, byNameSel(n))).toMap
        }
        flagged.map(n => n -> rounds.map(_(n)).min).toMap
      }
    val results = inPass.map { case (n, dt0) =>
      val dt = math.min(dt0, retimed.getOrElse(n, dt0))
      // a query with NO successful invocation ships its time-to-throw as a
      // finite reading — it is already marked in `failures` (per-query
      // "failed":true in the detail, name in the final line, nonzero exit),
      // so the number can never read as a quiet fast pass
      n -> (if (dt == Double.MaxValue) failDt.getOrElse(n, 0.0) else dt)
    }
    val total = if (results.nonEmpty) results.map(_._2).sum else 0.0
    def fmt(v: Double): String = f"$v%.3f"
    def dict(rs: Seq[(String, Double)]): String =
      rs.map { case (k, v) => s"\"" + k + "\":" + fmt(v) }.mkString("{", ",", "}")
    // Self-ruling detail: for every re-timed query, both the in-pass reading
    // and the clean min-of-3 — the official artifact carries its own
    // contention ruling (VERDICT r11 task 2).
    def rulingsJson(sel: Map[String, Double]): String =
      if (sel.isEmpty) ""
      else sel.toSeq.sortBy(_._1).map { case (n, m3) =>
        s"""\"$n\":{"inpass":${fmt(inPass.toMap.apply(n))},"min3":${fmt(m3)}}"""
      }.mkString(""","rulings":{""", ",", "}")
    val rulings = rulingsJson(retimed)
    // stdout last line is budget-bound (~2000 chars): cap inline rulings to
    // the 10 largest inpass/min3 ratios; the full set is in BENCH_DETAIL.json
    val rulingsLine = rulingsJson(
      retimed.toSeq.sortBy { case (n, m3) => -(inPass.toMap.apply(n) / math.max(m3, 0.001)) }
        .take(10).toMap)
    // per-query failure records ("failed": true + the error head) — a
    // thrown query is visible in the artifact, never a quiet fast "pass"
    def failuresJson: String =
      if (failures.isEmpty) ""
      else failures.toSeq.sortBy(_._1).map { case (n, msg) =>
        s"""\"$n\":{"failed":true,"error":"$msg"}"""
      }.mkString(""","failures":{""", ",", "}")
    // artifact build costs beside the readings of the queries they serve
    val buildsJson =
      if (builds.isEmpty) ""
      else builds.map { case (name, sec, serves) =>
        s"""\"$name\":{"sec":${fmt(sec)},"serves":${
          serves.mkString("[\"", "\",\"", "\"]")}}"""
      }.mkString(""","builds":{""", ",", "}")
    // calibrated total: the reading a near-idle host would have produced
    // (raw ÷ pass-local machine factor) — the contention-invariant number
    // the judge can rule on from the artifact alone. Every probe reading
    // ships so the factor itself is auditable.
    val calibratedTotal = total / machineFactor
    val calibratedFloor = total / machineFactorMin
    val calJson = {
      val readings = calReadings.map(fmt).mkString("[", ",", "]")
      val retimes = retimeReadings.map(fmt).mkString("[", ",", "]")
      s""","cal":{"ref_sec":${fmt(calRefSec)},"ref_median_sec":${fmt(calRefMedianSec)},"median_sec":${fmt(medianCal)},"machine_factor":${fmt(machineFactor)},"machine_factor_min":${fmt(machineFactorMin)},"bursty":$bursty,"calibrated_total":${fmt(calibratedTotal)},"calibrated_conservative":${fmt(calibratedFloor)},"readings":$readings,"retime_readings":$retimes}"""
    }
    val fullJson =
      s"""{"metric":"total","value":${fmt(total)},"unit":"sec","queries":${dict(results)}$calJson$rulings$buildsJson$failuresJson,"sf":"$sfDir"}"""
    // Full per-query detail: a file plus an earlier stdout line (both outside
    // the last-line contract, which only the compact line below satisfies).
    try {
      java.nio.file.Files.write(java.nio.file.Paths.get("BENCH_DETAIL.json"),
        fullJson.getBytes("UTF-8"))
    } catch { case _: Throwable => () }
    println(s"BENCH_FULL $fullJson")
    // Per-family subtotals (VERDICT r7 #9 — the registry passed 190 rows, so
    // a family regression can hide inside a flat total): four coarse families
    // by name shape; the full per-query detail stays in BENCH_DETAIL.json.
    val pipelinePrefixes = Seq("dedup_", "knn_", "bpe_", "quality_", "doc_",
      "chunk_", "vocab_", "select_", "mixture_", "pack_", "pipeline_",
      "split_", "lang_", "tfidf_", "text_", "token_", "ngram_",
      "decontaminate_", "ann_", "vector_", "zorder_", "sample_",
      "multimodal_", "pii_", "word_", "pmi_", "source_", "hybrid_",
      "contamination_", "cluster_", "corpus_", "boilerplate_", "tokenizer_",
      "span_", "curriculum_", "shard_", "bleu_", "chrf_", "rouge_",
      "retrieval_")
    def family(name: String): String =
      if (name.matches("q\\d+_.*")) "tpch"
      else if (name.startsWith("stream_")) "streaming"
      else if (pipelinePrefixes.exists(name.startsWith)) "pipeline"
      else "relational"
    val familyTotals = results.groupBy { case (n, _) => family(n) }
      .view.mapValues(_.map(_._2).sum).toSeq.sortBy(_._1)
    // Headline subset: canonical representatives of each family plus the
    // slowest queries this run — bounded so the final line stays < ~1500 chars.
    val canonical = Seq("q1_pricing_summary", "q5_local_supplier", "word_count",
      "dedup_minhash", "dedup_simhash", "knn_bruteforce", "tfidf_top_terms",
      "asof_join", "window_funcs", "stream_wordcount", "stream_session")
    val byName = results.toMap
    val slowest = results.sortBy(-_._2).take(12).map(_._1)
    val headlineNames = (canonical.filter(byName.contains) ++ slowest).distinct.take(20)
    val headline = results.filter { case (k, _) => headlineNames.contains(k) }
    // ADVICE r2: stop() may throw or hang shutdown chatter — never lose the line.
    try spark.stop() catch { case _: Throwable => () }
    // final line carries the failed NAMES (bounded; messages live in
    // BENCH_DETAIL.json) so a broken query is visible even from the
    // driver's last-line capture alone
    val failLine =
      if (failures.isEmpty) ""
      else s""","failures":${failures.keys.toSeq.sorted.take(8)
        .mkString("[\"", "\",\"", "\"]")},"n_failed":${failures.size}"""
    val calLine = s""","cal_median_sec":${fmt(medianCal)},"cal_ref_sec":${fmt(calRefSec)},"machine_factor":${fmt(machineFactor)},"machine_factor_min":${fmt(machineFactorMin)},"calibrated_value":${fmt(calibratedTotal)},"calibrated_conservative":${fmt(calibratedFloor)}"""
    println(s"""{"metric":"total","value":${fmt(total)},"unit":"sec","n_queries":${results.size}$calLine,"families":${dict(familyTotals)},"queries":${dict(headline)}$rulingsLine$failLine,"detail":"BENCH_DETAIL.json","sf":"$sfDir"}""")
    Console.out.flush()
    // nonzero exit on any failed query (VERDICT r12 task 2): a bench with a
    // thrown query must not look like a clean pass to ANY consumer
    if (failures.nonEmpty) sys.exit(1)
  }
}
