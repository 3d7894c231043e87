package graft.queries

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.expressions.Window
import graft.Tables

/** Round-4 pipeline operators: the cross-document / cross-run machinery a
  * training-data pipeline runs AFTER the per-document scoring and candidate
  * generation that the Dedup/TextAnalysis/Similarity families provide —
  * transitive dedup clustering, stratified corpus sampling, mergeable-sketch
  * rollups, snapshot upserts, funnel/retention analytics, and bucketed
  * (shuffle-free at rest) fact-fact joins.
  */
object PipelineOps {

  /** Transitive near-dup CLUSTERS (the step after candidate pairs): documents
    * sharing a head-8-token key OR a tail-8-token key are near-dup candidates;
    * connected components over those edges collapse chains (A~B on head,
    * B~C on tail ⇒ {A,B,C} one cluster) so a pipeline keeps one doc per
    * cluster. Edges are STAR edges — each doc connects to the minimum doc_id
    * of its bucket — so edge volume is 2·N, never sum(|bucket|²); components
    * come from Graft.connectedComponents (min-label propagation + pointer
    * jumping, O(log n) rounds of distributed joins).
    * Output: (doc_id, cluster_id = min doc_id in cluster, cluster_size). */
  /** (doc_id, cluster_id) for any (doc_id, text, …) frame — since round 7
    * this is the public `Graft.nearDupClusters` (promoted per VERDICT r6 #2);
    * kept as a local alias for the query bindings below. */
  private def headTailClusters(docs: DataFrame): DataFrame =
    graft.api.Graft.nearDupClusters(docs, "doc_id", "text")

  def dedupClusters(s: SparkSession, d: String): DataFrame = {
    val clustered =
      headTailClusters(Tables.documents(s, d).select(col("doc_id"), col("text")))
    // sizes by aggregate + join (not a partition-window count) for the same
    // hot-bucket reason as the star edges
    clustered
      .join(clustered.groupBy("cluster_id").agg(count(lit(1)).as("cluster_size")),
        "cluster_id")
      .select(col("doc_id"), col("cluster_id"), col("cluster_size"))
      .orderBy("doc_id")
  }

  /** Quality-aware cluster representatives — the CCNet/production reading
    * of dedup: a near-dup cluster keeps its BEST document, not its
    * first-by-id. "Best" here is the integer-exact key (longest text,
    * then min doc_id) so the choice is deterministic cross-engine; a
    * production caller swaps in any quality column with the same
    * struct-max shape. The per-cluster argmax runs as ONE aggregate of a
    * lexicographic struct (max(struct(len, -doc_id))) — an aggregate with
    * map-side combine, NOT a partition window, so a hot boilerplate
    * cluster at 100 TB streams instead of buffering in one task.
    * Output: one keep-list row per cluster. */
  def dedupKeepBest(s: SparkSession, d: String): DataFrame = {
    val docs = Tables.documents(s, d).select(col("doc_id"), col("text"))
    val clustered = headTailClusters(docs)
    val sized = clustered.join(
      docs.select(col("doc_id"), length(col("text")).cast("long").as("__len")),
      "doc_id")
    sized.groupBy("cluster_id")
      .agg(max(struct(col("__len"), (-col("doc_id")).as("__negid"))).as("__b"),
        count(lit(1)).as("cluster_size"))
      .select(col("cluster_id"),
        (-col("__b.__negid")).as("rep_id"),
        col("__b.__len").as("rep_len"),
        col("cluster_size"))
      .orderBy("cluster_id")
  }

  /** The COMPOSED curation pipeline — what a training-data run actually
    * executes, end to end: hold out the eval split → row-local
    * repetition-quality gate → transitive near-dup clustering, keeping one
    * representative per cluster → n-gram decontamination against the eval
    * split → final keep list. Every stage is one of this engine's operators;
    * the whole flow is a single lazy plan except the clustering rounds.
    * (The earlier pipeline_clean_corpus is the round-1 quality+exact-dedup
    * flow; this one exercises the round-4 cluster/decontaminate machinery.) */
  def pipelineCurateCorpus(s: SparkSession, d: String): DataFrame = {
    val all = Tables.documents(s, d)
    val evalSet = all.filter(col("doc_id") % 97 === 0).select(col("doc_id"), col("text"))
    val corpus = all.filter(col("doc_id") % 97 =!= 0)
      .select(col("doc_id"), col("text"), col("lang"), col("source"))
    // materialized ONCE: the row-local repetition gate (array_distinct +
    // per-token filters per doc) is consumed by the edge build, the cluster
    // join, and the representative filter — without the barrier each
    // consumer re-runs the scan+gate (measured ~1s/consumer at sf0.1)
    val quality = graft.api.Graft.repetitionMetrics(corpus, "text")
      .filter(col("dup_ratio") <= 0.9 && col("mean_tok_len").between(2.0, 12.0) &&
        col("top_token_frac") <= 0.3)
      .select(col("doc_id"), col("text"), col("lang"), col("source"))
      .localCheckpoint(true)
    val reps = quality.join(headTailClusters(quality), "doc_id")
      .filter(col("doc_id") === col("cluster_id"))
      .select(col("doc_id"), col("text"), col("lang"), col("source"))
    val contaminated = graft.api.Graft.ngramDecontaminate(
      reps.select(col("doc_id"), col("text")), evalSet, "doc_id", "text", n = 6)
    reps.join(contaminated.select("doc_id"), Seq("doc_id"), "left_anti")
      .select(col("doc_id"), col("lang"), col("source"))
      .orderBy("doc_id")
  }

  /** The MULTIMODAL composed curation pipeline (VERDICT r6 #5): the same
    * flow as pipelineCurateCorpus, but the near-dup edge set is the UNION of
    * the text star edges (head/tail-8 keys) and the embedding-cosine LSH
    * pairs (Dedup.embedPlanes, 4 bands × 8 bits, cosine ≥ 0.25) of the
    * quality-passing documents — one connected-components pass over both
    * modalities, so a chain like "A ~ B by text, B ~ C by embedding"
    * collapses to one representative. Embeddings join 1:1 on
    * doc_id = vec_id; restricting vectors to the quality survivors BEFORE
    * the LSH is equivalent to filtering pairs after (band candidacy is
    * pairwise) and shuffles less. Scale shape: text edges 2·N, embedding
    * candidates banded + id-slim, one CC (O(log n) rounds), broadcast
    * decontamination — same plan family as its unimodal sibling. */
  def pipelineCurateMultimodal(s: SparkSession, d: String): DataFrame = {
    val all = Tables.documents(s, d)
    val evalSet = all.filter(col("doc_id") % 97 === 0).select(col("doc_id"), col("text"))
    val corpus = all.filter(col("doc_id") % 97 =!= 0)
      .select(col("doc_id"), col("text"), col("lang"), col("source"))
    // materialized ONCE — same rationale as pipelineCurateCorpus, with a
    // fourth consumer here (the embedding join)
    val quality = graft.api.Graft.repetitionMetrics(corpus, "text")
      .filter(col("dup_ratio") <= 0.9 && col("mean_tok_len").between(2.0, 12.0) &&
        col("top_token_frac") <= 0.3)
      .select(col("doc_id"), col("text"), col("lang"), col("source"))
      .localCheckpoint(true)
    val textEdges = graft.api.Graft.nearDupStarEdges(quality, "doc_id", "text")
    val qualityVecs = Tables.embeddings(s, d)
      .join(quality.select(col("doc_id")), col("vec_id") === col("doc_id"))
      .select(col("vec_id"), col("embedding"))
    val embEdges = graft.api.Graft.cosineDedupLsh(
        qualityVecs, "vec_id", "embedding", Dedup.embedPlanes,
        bitsPerBand = 8, tau = 0.25)
      .select(col("id_a").as("a"), col("id_b").as("b"))
    val clustered = graft.api.Graft.clustersFromEdges(
      quality, "doc_id", textEdges.union(embEdges))
    val reps = quality.join(clustered, "doc_id")
      .filter(col("doc_id") === col("cluster_id"))
      .select(col("doc_id"), col("text"), col("lang"), col("source"))
    val contaminated = graft.api.Graft.ngramDecontaminate(
      reps.select(col("doc_id"), col("text")), evalSet, "doc_id", "text", n = 6)
    reps.join(contaminated.select("doc_id"), Seq("doc_id"), "left_anti")
      .select(col("doc_id"), col("lang"), col("source"))
      .orderBy("doc_id")
  }

  /** Stratified deterministic sampling: per-language keep rates (25% for the
    * over-represented 'en' stratum, 6.25% for the rest) decided by the first
    * hex digit of md5(doc_id) — reproducible across engines and runs, no RNG
    * state, embarrassingly parallel (the filter runs inside the scan). The
    * corpus-rebalancing primitive for training-data mixture control. */
  def sampleStratified(s: SparkSession, d: String): DataFrame = {
    val h = substring(md5(col("doc_id").cast("string")), 1, 1)
    Tables.documents(s, d)
      .filter(when(col("lang") === "en", h.isin("0", "1", "2", "3"))
        .otherwise(h === "0"))
      .select(col("doc_id"), col("lang"), col("source"), col("n_chars"))
      .orderBy("doc_id")
  }

  /** Leakage-free train/eval split: near-dup CLUSTERS (the same head/tail
    * star edges → connected components as dedup_clusters) are the unit of
    * assignment — a cluster lands wholly in eval iff the first hex digit of
    * md5(cluster_id) is '0' (~1/16), so near-duplicate documents can NEVER
    * straddle the split. This is decontamination BY CONSTRUCTION — the
    * complement of the post-hoc n-gram check (decontaminate_ngrams), and
    * what a real pretraining pipeline does before holding out eval data.
    * Deterministic and RNG-free (same rule family as sample_stratified).
    * Output: one row per split with document and cluster counts. */
  def splitLeakageFree(s: SparkSession, d: String): DataFrame =
    graft.api.Graft.leakageFreeSplit(
        Tables.documents(s, d).select(col("doc_id"), col("text")),
        "doc_id", "text")
      .groupBy("split")
      .agg(count(lit(1)).as("n_docs"),
        count_distinct(col("cluster_id")).as("n_clusters"))
      .orderBy("split")

  /** The PER-DOCUMENT split assignment a training run actually consumes
    * (VERDICT r6 #2): one row per document with its near-dup cluster and its
    * leakage-free train/eval side — the un-aggregated view of
    * split_leakage_free. */
  def splitAssignments(s: SparkSession, d: String): DataFrame =
    graft.api.Graft.leakageFreeSplit(
        Tables.documents(s, d).select(col("doc_id"), col("text")),
        "doc_id", "text")
      .select(col("doc_id"), col("cluster_id"), col("split"))
      .orderBy("doc_id")

  /** Token-budget corpus selection (Graft.selectByTokenBudget): the best
    * 10000 tokens of the corpus by the integer-exact repetition-quality
    * rank — the "data diet" step between scoring and training when the
    * compute budget, not the corpus, is the binding constraint. */
  def selectTokenBudget(s: SparkSession, d: String): DataFrame =
    graft.api.Graft.selectByTokenBudget(
        Tables.documents(s, d).select(col("doc_id"), col("text")),
        "doc_id", "text", budgetTokens = 10000L)
      .orderBy("doc_id")

  /** Temperature-scaled language mixture (Graft.temperatureMixture, T = 2):
    * sampling rates ∝ √n_lang — the multilingual rebalance that flattens
    * the head languages and boosts the tail, next to the uniform-target
    * mixture_weights. */
  def mixtureTemperature(s: SparkSession, d: String): DataFrame =
    graft.api.Graft.temperatureMixture(
        Tables.documents(s, d), "lang", temperature = 2.0)
      .orderBy("lang")

  /** Heavy hitters via the approx_top_k sketch (Spark 4.x): mergeable
    * frequent-items state, one pass, no per-key shuffle of the full key set.
    * The sketch is EXACT while distinct items ≤ its capacity (default 10000 —
    * event_type has 5), so the exact-count oracle holds at any sf of this
    * data; for open-domain keys at 100 TB the same query returns
    * ±capacity-bounded estimates. Re-sorted (count desc, item) for a
    * deterministic output order. */
  def sketchTopK(s: SparkSession, d: String): DataFrame =
    Tables.events(s, d)
      .agg(expr("approx_top_k(event_type, 3)").as("tk"))
      .select(explode(col("tk")).as("e"))
      .select(col("e.item").as("item"), col("e.count").cast("bigint").as("cnt"))
      .orderBy(col("cnt").desc, col("item"))

  /** Mergeable-sketch rollup: per-event-type HLL sketches union into a global
    * distinct-user count WITHOUT re-touching the raw data — the two-level
    * aggregation pattern behind incremental/partitioned distinct counting
    * (build sketches per partition/day, merge on demand). Scale bound: exact
    * only in the lgK=14 coupon regime (same caveat as hll_sketch). */
  def hllUnion(s: SparkSession, d: String): DataFrame =
    Tables.events(s, d)
      .groupBy("event_type")
      .agg(expr("hll_sketch_agg(user_id, 14)").as("sk"))
      .agg(expr("CAST(round(hll_sketch_estimate(hll_union_agg(sk))) AS BIGINT)")
        .as("n_users"))

  /** Count-Min Sketch point-frequency estimates (spark-sketch, built
    * distributed via df.stat with a fixed seed): the sketch is a fixed
    * eps/confidence-sized grid regardless of key cardinality — the mergeable
    * frequency twin of the HLL distinct sketch. With width 2/eps = 20000 ≫
    * the key domain here, estimates are collision-free and the exact-count
    * oracle holds; at open-domain scale the same call returns
    * ε·N-overcount-bounded estimates. Deterministic via the seed. */
  def sketchCountMin(s: SparkSession, d: String): DataFrame =
    sketchCountMinProbe(s, d, 0L until 10L)

  /** Point-query contract (ADVICE r4): CMS lookups are a driver/serving-side
    * operation, so the keys to probe are an explicit SMALL argument — never
    * collected from the data (a collect-from-data shape could silently grow
    * with the input). The sketch build itself is fully distributed. */
  def sketchCountMinProbe(s: SparkSession, d: String,
      probeKeys: Seq[Long]): DataFrame = {
    import s.implicits._
    val cms = Tables.events(s, d).stat.countMinSketch(col("user_id"),
      eps = 0.0001, confidence = 0.999, seed = 42)
    probeKeys.sorted.map(u => (u, cms.estimateCount(u))).toDF("user_id", "est_n")
  }

  /** Snapshot MERGE (upsert): apply a change set to a base table — updates
    * replace matching keys, inserts pass through, unmatched base rows
    * survive. Expressed as change-set ∪ (base ⟕̸ change-set) — one anti join
    * + one union, both shuffle-partitioned on the key; the incremental-
    * snapshot primitive (SCD type 1) for keeping a 100 TB corpus current
    * without rewriting unchanged rows' lineage. */
  def mergeUpsert(s: SparkSession, d: String): DataFrame = {
    val o = Tables.orders(s, d)
    val base = o.filter(col("o_orderkey") % 4 =!= 3)
      .select(col("o_orderkey"), round(col("o_totalprice"), 2).as("price"),
        lit("base").as("src"))
    val changes = o.filter(col("o_orderkey") % 2 === 0)
      .select(col("o_orderkey"), round(col("o_totalprice") + 100.0, 2).as("price"),
        lit("update").as("src"))
    graft.api.Graft.mergeUpsert(base, changes, "o_orderkey")
      .orderBy("o_orderkey")
  }

  /** SCD Type-2 history (Graft.scd2History): per-user event_type change
    * intervals from the events feed — consecutive unchanged states
    * compress, each surviving change gets [valid_from, valid_to) with the
    * open row flagged current. (ts, event_id) ordering makes the interval
    * sequence deterministic under equal timestamps. Completes the CDC
    * family next to merge_upsert (overwrite) and latestPerKey (SCD1). */
  def scd2History(s: SparkSession, d: String): DataFrame =
    graft.api.Graft.scd2History(
        Tables.events(s, d).select(col("user_id"), col("event_type"),
          col("ts"), col("event_id")),
        "user_id", "event_type", Seq("ts", "event_id"))
      .orderBy("user_id", "valid_from")

  /** Ordered funnel: how far each user advances through
    * signup → view → click → purchase, where each stage must occur at or
    * after the previous stage's FIRST occurrence. One conditional-min
    * aggregation per stage (a single shuffle on user_id), then a row-local
    * stage decision — no self-joins, no per-user event sorting. */
  def funnelAnalysis(s: SparkSession, d: String): DataFrame =
    graft.api.Graft.funnel(Tables.events(s, d), "user_id", "event_type", "ts",
        Seq("signup", "view", "click", "purchase"))
      .groupBy("stage")
      .agg(count(lit(1)).as("n_users"))
      .orderBy("stage")

  /** Weekly retention cohorts: users grouped by first-activity week; each
    * cell counts distinct users from cohort c still active k weeks later.
    * Two shuffles (first-week per user, then cohort × offset cells); the
    * distinct-user count per cell is the engagement-analytics shape that
    * motivates sketch rollups (hllUnion) when cells stop fitting exact. */
  def retentionCohorts(s: SparkSession, d: String): DataFrame =
    graft.api.Graft.retention(Tables.events(s, d), "user_id", "ts")
      .select(col("cohort_period").as("cohort_week"),
        col("period_offset").as("week_offset"), col("n_active").as("n_users"))
      .orderBy("cohort_week", "week_offset")

  /** C4/Gopher-style repetition-quality signals, entirely ROW-LOCAL (no
    * shuffle — the filter a 100 TB pipeline runs inside the scan before
    * anything pairwise): duplicate-token ratio, mean token length, and the
    * most-frequent-token fraction (O(tokens·distinct) per doc via
    * array lambdas, whole-stage codegen'd). `pass` applies the published
    * thresholds-style rule (repetition ≤ 0.9, 2 ≤ mean length ≤ 12,
    * top-token ≤ 0.3). */
  def qualityRepetition(s: SparkSession, d: String): DataFrame =
    graft.api.Graft.repetitionMetrics(
        Tables.documents(s, d).select(col("doc_id"), col("text")), "text")
      .select(col("doc_id"), col("n_tokens"), col("n_distinct"),
        col("dup_ratio"), col("mean_tok_len"), col("top_token_frac"))
      .withColumn("pass",
        col("dup_ratio") <= 0.9 && col("mean_tok_len").between(2.0, 12.0) &&
          col("top_token_frac") <= 0.3)
      .orderBy("doc_id")

  /** Benchmark decontamination: flag training documents sharing any 6-token
    * n-gram with a held-out eval set (doc_id % 97 == 0 stands in for the
    * benchmark corpus). The eval side's distinct grams are broadcast-sized by
    * construction (eval sets are small); the training side streams through
    * the gram join without ever pairing doc×doc — the standard
    * n-gram-overlap decontamination pass (as in public LM data pipelines)
    * at inverted-index cost. Output: contaminated doc ids with hit counts. */
  def decontaminateNgrams(s: SparkSession, d: String): DataFrame = {
    val docs = Tables.documents(s, d).select(col("doc_id"), col("text"))
    graft.api.Graft.ngramDecontaminate(
        docs.filter(col("doc_id") % 97 =!= 0),
        docs.filter(col("doc_id") % 97 === 0),
        "doc_id", "text", n = 6)
      .orderBy("doc_id")
  }

  /** `decontaminate_ngrams` through the Bloom-prescreen path
    * (Graft.bloomDecontaminate): same flagged set, hash-matched against the
    * SAME DuckDB oracle — the sketch only prunes, survivors are
    * exact-confirmed. The row exists to pin the 100 TB ingest shape: a
    * broadcast-sized Bloom gate (Spark's own runtime-filter expressions,
    * built explicitly) collapses the training gram stream to ~the true
    * contamination volume before the first join. */
  def decontaminateBloom(s: SparkSession, d: String): DataFrame = {
    val docs = Tables.documents(s, d).select(col("doc_id"), col("text"))
    graft.api.Graft.bloomDecontaminate(
        docs.filter(col("doc_id") % 97 =!= 0),
        docs.filter(col("doc_id") % 97 === 0),
        "doc_id", "text", n = 6)
      .orderBy("doc_id")
  }

  /** FUZZY benchmark decontamination (the Brown '20 §C production reading:
    * eval overlap is removed by NEAR-dup match, not only verbatim n-gram
    * hits — a lightly paraphrased eval document still leaks): the training
    * corpus is screened against a held-out eval set through the banded
    * MinHash new×index join —
    * Graft.minhashCandidatesAgainst, the dedup_incremental machinery with
    * the eval signatures as the at-rest side. The demo split is doc_id %
    * 17 (not ngrams' % 97): at gate scale the % 17 eval set actually
    * CONTAINS leaked near-dups, so the oracle checks real flagged rows,
    * not an empty frame. Output: every (train doc,
    * eval doc) pair at estimated Jaccard ≥ 0.2 — the rows a curation run
    * DROPS from training. The eval side is tiny by nature, so its banded
    * signatures broadcast and the screen is one linear pass over training
    * signatures, never train×train. */
  def decontaminateMinhash(s: SparkSession, d: String): DataFrame = {
    // both sides filter-prune the SHARED at-rest signature table (the
    // dedup_incremental artifact — one build, every minhash consumer):
    // signatures are a pure function of the text, so a doc_id-split read
    // is value-identical to recomputing per side, and the per-query cost
    // is the honest screen cost — the banded new×index join itself
    val all = s.read.parquet(Dedup.ensureSignatureTable(s, d))
    graft.api.Graft.minhashCandidatesAgainst(
        all.filter(col("doc_id") % 17 =!= 0),
        all.filter(col("doc_id") % 17 === 0),
        "doc_id", bands = 8, rowsPerBand = 4, minEstJaccard = 0.2)
      .select(col("new_id").as("doc_id"), col("index_id").as("eval_id"),
        col("est_jaccard"))
      .orderBy("doc_id", "eval_id")
  }

  /** Corpus mixture weights: per-language resampling factors that would
    * rebalance the corpus to a uniform language mix (weight = target share /
    * actual share). One tiny aggregate + window — the numbers `sample_
    * stratified`-style deterministic samplers consume as per-stratum rates. */
  def mixtureWeights(s: SparkSession, d: String): DataFrame = {
    val counts = Tables.documents(s, d).groupBy("lang")
      .agg(count(lit(1)).as("n_docs"))
    val w = Window.partitionBy()
    counts
      .withColumn("frac", round(col("n_docs") / sum("n_docs").over(w), 6))
      .withColumn("weight",
        round((lit(1.0) / count(lit(1)).over(w)) / (col("n_docs") / sum("n_docs").over(w)), 6))
      .select(col("lang"), col("n_docs"), col("frac"), col("weight"))
      .orderBy("lang")
  }

  /** Training-sequence packing rollup: documents chunk-concatenate into
    * 2048-token sequences (Graft.packSequences — distributed two-phase
    * prefix sum, no single-partition window), then one aggregate per
    * sequence. The batch-construction step between a curated corpus and a
    * training run; seq_tokens > 2048 happens exactly when a document
    * STARTS in the sequence and overflows it — the loader's
    * continuation-across-boundary case. */
  def packSequencesRollup(s: SparkSession, d: String): DataFrame =
    graft.api.Graft.packSequences(
        Tables.documents(s, d).select(col("doc_id"), col("text")),
        "doc_id", "text", seqLen = 2048)
      .groupBy("seq_id")
      .agg(count(lit(1)).as("n_docs"), sum("n_tokens").as("seq_tokens"),
        min("doc_id").as("first_doc"))
      .orderBy("seq_id")

  /** Bucketed co-partitioned join: both fact tables are written bucketed on
    * the join key (8 buckets, sorted), so the join runs WITHOUT a shuffle —
    * bucket i joins bucket i in place (AdvancedStateSpec pins the no-Exchange
    * plan). At 100 TB this is THE join strategy for repeatedly-joined fact
    * pairs: pay the partitioning once at write time, never at query time.
    * The query writes the bucketed tables to a temp warehouse dir, then
    * joins them through the catalog. */
  def joinBucketed(s: SparkSession, d: String): DataFrame = {
    // per-run temp warehouse + run-unique table names (Graft.bucketedJoin):
    // concurrent sessions never collide, and nothing leaks into the catalog —
    // the aggregate is materialized before the tables are dropped
    val wh = java.nio.file.Files.createTempDirectory("graft_bucketed_q").toString
    val bj = graft.api.Graft.bucketedJoin(
      Tables.lineitem(s, d).select("l_orderkey", "l_quantity"),
      Tables.orders(s, d).select("o_orderkey", "o_orderpriority"),
      "l_orderkey", "o_orderkey", nBuckets = 8, warehouseDir = wh)
    val out = bj.joined
      .groupBy("o_orderpriority")
      .agg(count(lit(1)).as("n_lines"), round(sum("l_quantity"), 2).as("sum_qty"))
      .localCheckpoint(true)
    bj.drop()
    new java.io.File(wh).delete()
    out.orderBy("o_orderpriority")
  }

  /** The mixture loop CLOSED (round 9): temperatureMixture's √n rates
    * (T = 2, bit-exact) drive Graft.applyMixture's 16-bit md5 gate, and the
    * report reads back what actually materialized — per language: corpus
    * docs, sampled docs, the achieved rate on the ratio4 grid, and sampled
    * token volume. Rates broadcast, data touched once; this is the step
    * between publishing mixture weights and training on the mix. */
  def pipelineApplyMixture(s: SparkSession, d: String): DataFrame = {
    val docs = Tables.documents(s, d)
    val rates = graft.api.Graft.temperatureMixture(docs, "lang", temperature = 2.0)
      .select(col("lang"), col("rate"))
    val mix = graft.api.Graft.applyMixture(docs, "doc_id", "lang", rates)
      .withColumn("__nt", size(split(col("text"), " ", -1)).cast("long"))
      .groupBy("lang")
      .agg(count(lit(1)).as("n_sampled"), sum("__nt").as("tok_volume"))
    docs.groupBy("lang").agg(count(lit(1)).as("n_docs"))
      .join(mix, Seq("lang"), "left")
      .select(col("lang"), col("n_docs"),
        coalesce(col("n_sampled"), lit(0L)).as("n_sampled"),
        coalesce(col("tok_volume"), lit(0L)).as("tok_volume"))
      .withColumn("achieved4", expr(
        "CAST((20000L * n_sampled + n_docs) DIV (2L * n_docs) AS DOUBLE) / 10000.0"))
      .orderBy("lang")
  }

  /** The DSIR-ranked SELECTION pipeline (round 9) — the "data diet" flow a
    * target-domain training run executes end to end: rule-based quality
    * gate (Gopher bundle) → exact dedup (min-id representative per content
    * hash) → DSIR importance model FIT ON THE SURVIVORS (target = the
    * English slice; fitting after cleaning is the order that keeps junk
    * out of the source distribution) → budget-prefix selection by
    * (llr desc, doc_id) until 8000 tokens. Four oracled operators composed
    * into one lazy plan; the running total is the distributed two-phase
    * prefix sum (Graft.budgetedPrefix), never a data-sized global window. */
  def pipelineSelectDsir(s: SparkSession, d: String): DataFrame = {
    val docs = Tables.documents(s, d)
    val pass = graft.api.Graft.gopherRules(
        docs.select(col("doc_id"), col("text")), "text", minWords = 20L)
      .filter(col("passes")).select("doc_id")
    val kept = graft.api.Graft.dedupExact(docs, "doc_id", "text")
      .select(col("keep_id").as("doc_id"))
    // materialized ONCE: the DSIR fit (model) and apply (score) passes both
    // read the gated frame — without the barrier the Gopher gate + exact
    // dedup joins re-run per pass
    val clean = docs.join(pass, "doc_id").join(kept, "doc_id")
      .localCheckpoint(true)
    val scored = graft.api.Graft.dsirWeights(clean, "doc_id", "text",
      isTarget = col("lang") === "en", buckets = 256)
    graft.api.Graft.budgetedPrefix(scored, "n_tokens",
        Seq(col("llr").desc, col("doc_id").asc), budgetTokens = 8000L)
      .join(docs.select(col("doc_id"), col("lang"), col("source")), "doc_id")
      .select(col("doc_id"), col("n_tokens"), col("llr"), col("cum_tokens"),
        col("lang"), col("source"))
      .orderBy("doc_id")
  }

  /** The FLAGSHIP end-to-end curation job (VERDICT r10 task 7) — the full
    * training-data pipeline every extension operator exists for, composed as
    * ONE DAG: hold out the eval split (doc_id % 97 = 0) → Gopher rule gate →
    * exact dedup (min-id representative per normalized content hash) →
    * MinHash near-dup clustering over the survivors (banded LSH pairs →
    * connected components → one representative per cluster) → FUZZY
    * decontamination of the representatives against the eval split (the
    * banded new×index screen, never index×index) → DSIR importance model
    * fit on the clean survivors (target = the English slice) → budget-prefix
    * selection to 8000 tokens → pack_sequences(512) assigning each selected
    * document its training-sequence id and offset.
    *
    * Scale shape: every stage is an already-oracled operator in its
    * 100 TB form — row-local gates, one |docs|·32-long signature shuffle
    * REUSED by both the self-join candidates and the decontamination screen
    * (one localCheckpoint barrier), pointer-jumping CC, broadcast DSIR
    * model, distributed two-phase prefix sums for both the budget cut and
    * the packing. Oracle: the whole chain unrolled into one DuckDB
    * WITH RECURSIVE — the final packed output hash-matches. */
  def pipelineEndToEnd(s: SparkSession, d: String): DataFrame = {
    val all = Tables.documents(s, d)
    val corpus = all.filter(col("doc_id") % 97 =!= 0)
      .select(col("doc_id"), col("text"), col("lang"), col("source"))
    // 1. Gopher gate
    val gated = graft.api.Graft.gopherRules(corpus, "text")
      .filter(col("passes"))
      .select(col("doc_id"), col("text"), col("lang"), col("source"))
    // 2. exact dedup among the gated survivors
    val kept = gated.join(
        graft.api.Graft.dedupExact(gated, "doc_id", "text")
          .select(col("keep_id").as("doc_id")), "doc_id")
      .localCheckpoint(true) // consumed by sigs, cluster join, DSIR fit+apply
    // 3. MinHash signatures of the kept docs from the SHARED at-rest
    //    signature table, semi-joined to the kept ids (signatures are a
    //    pure function of the unmodified text — value-identical to the
    //    fresh pass this used to run; keepEmpty=false ≡ isNotNull). One
    //    materialized frame still serves the near-dup self-candidates AND
    //    the decontamination screen.
    val sigs = s.read.parquet(Dedup.ensureSignatureTable(s, d))
      .join(kept.select("doc_id"), "doc_id")
      .filter(col("sig").isNotNull)
      .localCheckpoint(true)
    val pairs = graft.api.Graft.minhashCandidates(sigs, "doc_id",
        bands = 8, rowsPerBand = 4, minEstJaccard = 0.2)
      .select(col("id_a").as("a"), col("id_b").as("b"))
    val reps = kept.join(
        graft.api.Graft.clustersFromEdges(kept, "doc_id", pairs), "doc_id")
      .filter(col("doc_id") === col("cluster_id"))
      .select(col("doc_id"), col("text"), col("lang"), col("source"))
    // 4. fuzzy decontamination: representatives screened against the eval
    //    split's signatures (new × index only)
    // eval side = the shared at-rest signature table, filter-pruned (the
    // decontaminateMinhash artifact argument; keepEmpty=false ≡ isNotNull)
    val evalSigs = s.read.parquet(Dedup.ensureSignatureTable(s, d))
      .filter(col("doc_id") % 97 === 0 && col("sig").isNotNull)
    val flagged = graft.api.Graft.minhashCandidatesAgainst(
        sigs.join(reps.select("doc_id"), "doc_id"), evalSigs,
        "doc_id", bands = 8, rowsPerBand = 4, minEstJaccard = 0.2)
      .select(col("new_id").as("doc_id")).distinct()
    // materialized ONCE: the DSIR fit pass, the DSIR scoring pass, and the
    // packing join all read the clean frame — without the barrier each
    // consumer re-runs the cluster join + decontamination anti-join
    val clean = reps.join(flagged, Seq("doc_id"), "left_anti")
      .localCheckpoint(true)
    // 5. DSIR importance fit on the clean survivors, budget cut at 8000
    val scored = graft.api.Graft.dsirWeights(clean, "doc_id", "text",
      isTarget = col("lang") === "en", buckets = 256)
    // materialized ONCE: the packing input and the final join both read the
    // selection — without the barrier the whole DSIR model + score + prefix
    // chain runs twice
    val selected = graft.api.Graft.budgetedPrefix(scored, "n_tokens",
        Seq(col("llr").desc, col("doc_id").asc), budgetTokens = 8000L)
      .localCheckpoint(true)
    // 6. pack the selected docs into 512-token training sequences. The
    // selection is budget-BOUNDED by construction (≤ budget/min-doc-tokens
    // rows at any corpus size), so it broadcasts — the checkpointed frame
    // carries no stats, and without the hint Spark sort-merge-joins it
    val packed = graft.api.Graft.packSequences(
        clean.join(broadcast(selected.select("doc_id")), "doc_id")
          .select(col("doc_id"), col("text")),
        "doc_id", "text", seqLen = 512)
      .select(col("doc_id"), col("seq_id"), col("seq_offset"))
    broadcast(selected).join(packed, "doc_id")
      .select(col("doc_id"), col("n_tokens"), col("llr"),
        col("cum_tokens"), col("seq_id"), col("seq_offset"))
      .orderBy("doc_id")
  }

  /** Water-filling budget allocation (Graft.mixtureWaterfill) over the
    * per-language token inventory: weights proportional to DOC counts
    * (the "keep the document mix" target), budget = 2/3 of the corpus
    * token volume — low-volume languages saturate (every token taken) and
    * their shortfall re-flows to the rest, Σ alloc == budget EXACTLY
    * (integer Hamilton apportionment of the remainder). One corpus
    * aggregate; the solver windows over the language-count frame only. */
  def mixtureWaterfillQuery(s: SparkSession, d: String): DataFrame = {
    val inv = Tables.documents(s, d)
      .withColumn("__nt", size(split(col("text"), " ", -1)).cast("long"))
      .groupBy("lang")
      .agg(sum("__nt").as("avail_tokens"), count(lit(1)).as("n_docs"))
      .localCheckpoint(true) // consumed twice: budget aggregate + solver
    // eager .head() reads the CHECKPOINTED k-row language frame, not the
    // corpus — a driver-side scalar over source-count rows (ADVICE r12:
    // cheap by construction; a budget-as-column overload would save one
    // tiny job, not a scan)
    val budget = inv.agg(sum("avail_tokens")).head().getLong(0) * 2L / 3L
    graft.api.Graft.mixtureWaterfill(inv, "lang", "avail_tokens",
        weightCol = "n_docs", budget = budget)
      .withColumnRenamed("avail", "avail_tokens")
      .withColumnRenamed("weight", "n_docs")
      .orderBy("lang")
  }

  /** Multi-signal contamination REPORT — the rollup a curation run reads
    * before deciding which decontamination screen to trust: the same
    * train/eval split (doc_id % 17) screened three ways — verbatim
    * (normalized-text md5 equality), 6-gram overlap (the
    * decontaminate_ngrams machinery), and MinHash near-dup at est-Jaccard
    * ≥ 0.2 (the decontaminate_minhash machinery) — and per signal: flagged
    * training docs, eval docs hit, and the flag rate over the training
    * corpus (integer ratio4). Exact-verbatim misses paraphrases, n-gram
    * catches verbatim spans, MinHash catches global near-dups; the widths
    * differ and this report quantifies by how much. Every signal is one
    * linear pass over training with a broadcast eval side (eval sets are
    * tiny by nature); nothing is ever train×train. */
  def contaminationReport(s: SparkSession, d: String): DataFrame = {
    val docs = Tables.documents(s, d).select(col("doc_id"), col("text"))
    val train = docs.filter(col("doc_id") % 17 =!= 0)
    val evalSet = docs.filter(col("doc_id") % 17 === 0)
    // denominator rides the plan as a broadcast 1-row frame (the oracle's
    // `nt` CTE) — no eager count(), no extra corpus scan per invocation
    val nTrain = train.agg(count(lit(1)).as("__nt"))
    def report(signal: String, flagged: DataFrame, trainIdCol: String,
        evalIdCol: String): DataFrame =
      flagged.agg(
          countDistinct(col(trainIdCol)).as("n_flagged_train"),
          countDistinct(col(evalIdCol)).as("n_eval_hit"))
        .crossJoin(broadcast(nTrain))
        .select(lit(signal).as("signal"), col("n_flagged_train"),
          col("n_eval_hit"),
          expr("""CAST((20000L * n_flagged_train + __nt) DIV
                 |  (2L * __nt) AS DOUBLE) / 10000.0""".stripMargin)
            .as("flag_rate4"))
    def fp(part: DataFrame, out: String) = part.select(
      col("doc_id").as(out), md5(lower(trim(col("text")))).as("__fp"))
    val exactHits = fp(train, "t_id")
      .join(broadcast(fp(evalSet, "e_id")), "__fp")
    val gramHits = graft.api.Graft
      .shingles(train, "doc_id", "text", n = 6)
      .join(broadcast(graft.api.Graft.shingles(evalSet, "doc_id", "text", n = 6)
        .select(col("shingle"), col("doc_id").as("e_id")).distinct()), "shingle")
    // the minhash screen's two sides filter-prune the SHARED at-rest
    // signature table (value-identical — signatures are a pure function
    // of text; see decontaminateMinhash)
    val allSigs = s.read.parquet(Dedup.ensureSignatureTable(s, d))
    val mhHits = graft.api.Graft.minhashCandidatesAgainst(
      allSigs.filter(col("doc_id") % 17 =!= 0),
      allSigs.filter(col("doc_id") % 17 === 0), "doc_id",
      bands = 8, rowsPerBand = 4, minEstJaccard = 0.2)
    report("exact", exactHits, "t_id", "e_id")
      .unionByName(report("minhash", mhHits, "new_id", "index_id"))
      .unionByName(report("ngram6", gramHits, "doc_id", "e_id"))
      .orderBy("signal")
  }

  /** Cluster-balanced selection (Graft.clusterBalancedSample — the D4
    * diversity-sampling step, Tirumala '23) over the embeddings table:
    * k-means (k=10, the knn_ivf model verbatim) buckets the space, the
    * water-filling allocator hands each cluster an EQUAL share of a
    * half-corpus budget (small clusters saturate, their shortfall re-flows),
    * and each cluster keeps its md5-lowest ids. Exactly ⌊N/2⌋ output rows —
    * the conservation property the suite pins. Fully oracled: the knn_ivf
    * kmeans CTE prefix + the waterfill integer chain + md5 rank. */
  def clusterBalancedSample(s: SparkSession, d: String): DataFrame = {
    graft.functions.VectorFunctions.register(s)
    val e = Tables.embeddings(s, d)
    // eager count is a parquet count-star (row-group metadata only — no
    // column IO; ADVICE r12: cheap at any scale)
    val budget = e.count() / 2
    // the cluster assignment comes from the AT-REST IVF index (identical
    // k=10 / 3-iteration full-corpus Lloyd run — one artifact, one more
    // consumer): this row pays only the waterfill + ranked picks, the
    // production split between index maintenance and sampling jobs
    val (_, pPath) = Similarity.ensurePersistedIvf(s, d)
    graft.api.Graft.clusterBalancedSampleFromAssignments(
        // list_id reads back as INT from the hive partition dirs; the
        // training path carries it as BIGINT — cast so the output schema
        // (which the oracle compares) is identical either way
        s.read.parquet(pPath)
          .select(col("vec_id"), col("list_id").cast("long").as("list_id")),
        "vec_id", budget)
      .orderBy("list_id", "pick_rank")
  }

  /** CURRICULUM training order — the staged schedule curriculum-learning
    * runs produce from a quality signal (Bengio '09 for the idea; modern
    * corpus pipelines stage by classifier quality): documents split into
    * terciles of the integer-exact linearClassify score (percentile-disc
    * thresholds on the ratio4 grid — cumulative counts over the GRID,
    * never a document-sized rank window), best tercile first, and within
    * a stage the order is the deterministic md5 shuffle. The position is
    * a DISTRIBUTED two-phase rank: 16 hash-RANGE buckets (the md5 hex
    * prefix orders buckets consistently with the full key), a per-(stage,
    * bucket) local row_number, and a 48-row broadcast offset table — no
    * global single-partition window anywhere; at 100 TB grow the prefix
    * to 256/4096 buckets. Output: (doc_id, stage, pos, score) — the
    * materialized training schedule. */
  def curriculumOrder(s: SparkSession, d: String): DataFrame = {
    val scored = graft.api.Graft.linearClassify(
        Tables.documents(s, d), "doc_id", "text", buckets = 1024)
      .select(col("doc_id"), col("score"),
        floor(col("score") * 10000.0).cast("long").as("__qi"))
      // consumed by the count, the grid, and the staging join
      .localCheckpoint(true)
    // eager count over the checkpointed blocks — a block-count sum, not a
    // recompute of the classifier pass (ADVICE r12: cheap at call site)
    val n = scored.count()
    val grid = scored.groupBy("__qi").agg(count(lit(1)).as("__c"))
      .withColumn("__cum", sum("__c").over(Window.orderBy("__qi")))
    val th = grid.agg(
      min(when(col("__cum") >= lit((n + 2) / 3), col("__qi"))).as("__t_lo"),
      min(when(col("__cum") >= lit((2 * n + 2) / 3), col("__qi"))).as("__t_hi"))
    val staged = scored.crossJoin(broadcast(th))
      .withColumn("stage",
        when(col("__qi") > col("__t_hi"), lit(1))
          .when(col("__qi") > col("__t_lo"), lit(2)).otherwise(lit(3)))
      .withColumn("__hk", md5(col("doc_id").cast("string")))
      .withColumn("__b", substring(col("__hk"), 1, 1))
    val local = staged.withColumn("__lr", row_number().over(
      Window.partitionBy("stage", "__b").orderBy(col("__hk"), col("doc_id"))))
    val offs = staged.groupBy("stage", "__b").agg(count(lit(1)).as("__c"))
      .withColumn("__off", coalesce(sum("__c").over(
        Window.partitionBy("stage").orderBy("__b")
          .rowsBetween(Window.unboundedPreceding, -1)), lit(0L)))
      .select(col("stage"), col("__b"), col("__off"))
    local.join(broadcast(offs), Seq("stage", "__b"))
      .select(col("doc_id"), col("stage"),
        (col("__off") + col("__lr")).as("pos"), col("score"))
      .orderBy("stage", "pos")
  }

  /** Training-shard manifest (Graft.shardManifest): the corpus cut into
    * consecutive ~4096-token shards along the deterministic md5 order,
    * one manifest row per shard with counts and the order-invariant
    * bit_xor content fingerprint — the reproducibility artifact shipped
    * beside shard files. Distributed two-phase weighted prefix sum (16
    * hash-range buckets + broadcast offsets), suite-pinned equal to the
    * single-window form; fully oracled (all-integer). */
  def shardManifest(s: SparkSession, d: String): DataFrame =
    graft.api.Graft.shardManifest(
        Tables.documents(s, d).select(col("doc_id"), col("text")),
        "doc_id", "text", tokensPerShard = 4096L)
      .orderBy("shard_id")

  /** DATA-CONSTRAINED epoch plan (Muennighoff '23, arXiv:2305.16264 —
    * repeating data up to ~4 epochs is nearly as valuable as fresh data):
    * when the training budget EXCEEDS the corpus (here 1.5× the token
    * volume), allocate with per-source repetition caps — each language may
    * contribute up to 4×its inventory, the water-filling solver splits the
    * budget proportionally to doc counts, saturation now means "hit the
    * 4-epoch cap", and `epochs4` reads back how many passes over each
    * source the plan implies. Pure reuse of `Graft.mixtureWaterfill` with
    * avail' = 4·avail: the solver's integer-exactness argument transfers
    * verbatim (alloc conservation, Hamilton remainder), so the plan is
    * cross-engine exact. */
  def mixtureEpochs(s: SparkSession, d: String): DataFrame = {
    val inv = Tables.documents(s, d)
      .withColumn("__nt", size(split(col("text"), " ", -1)).cast("long"))
      .groupBy("lang")
      .agg(sum("__nt").as("avail_tokens"), count(lit(1)).as("n_docs"))
      .withColumn("__cap", col("avail_tokens") * 4L)
      .localCheckpoint(true) // budget aggregate + solver both read it
    // eager .head() over the checkpointed k-row frame — see
    // mixtureWaterfillQuery's note (ADVICE r12: cheap by construction)
    val budget = inv.agg(sum("avail_tokens")).head().getLong(0) * 3L / 2L
    graft.api.Graft.mixtureWaterfill(inv, "lang", "__cap",
        weightCol = "n_docs", budget = budget)
      .select(col("lang"), expr("avail DIV 4L").as("avail_tokens"),
        col("weight").as("n_docs"), col("saturated").as("capped"),
        col("alloc"),
        expr("""CAST((20000L * alloc + (avail DIV 4L))
               |  DIV (2L * (avail DIV 4L)) AS DOUBLE) / 10000.0"""
          .stripMargin).as("epochs4"))
      .orderBy("lang")
  }

  /** Cross-source overlap matrix (Graft.crossSourceOverlap): distinct
    * 16-token paragraph fingerprints shared by each source pair — the
    * mirror/syndication audit a curation run reads before deciding which
    * source to keep. Strata-distinct join: fan-out bounded by the source
    * count, never paragraph occupancy. */
  def sourceOverlap(s: SparkSession, d: String): DataFrame =
    graft.api.Graft.crossSourceOverlap(
        Tables.documents(s, d).select(col("doc_id"), col("source"), col("text")),
        "doc_id", "text", "source", parTokens = 16,
        baseHash = graft.api.Graft.md5Hash60)
      .orderBy("source_a", "source_b")

  /** Corpus snapshot diff (Graft.snapshotDiff): two deterministic
    * generations of the documents table — v0 drops doc_id % 13 = 5, v1
    * drops % 13 = 7 and rewrites (uppercases) % 13 = 2 — full-outer
    * fingerprint join, statuses rolled up per source. The audit step
    * between ingest runs: what did this generation add, drop, and touch,
    * and in which sources. */
  def corpusDiff(s: SparkSession, d: String): DataFrame = {
    val docs = Tables.documents(s, d)
      .select(col("doc_id"), col("source"), col("text"))
    val v0 = docs.filter(col("doc_id") % 13 =!= 5)
    val v1 = docs.filter(col("doc_id") % 13 =!= 7)
      .withColumn("text",
        when(col("doc_id") % 13 === 2, upper(col("text")))
          .otherwise(col("text")))
    graft.api.Graft.snapshotDiff(v0, v1, "doc_id", "text")
      .join(docs.select(col("doc_id"), col("source")), "doc_id")
      .groupBy("source", "status")
      .agg(count(lit(1)).as("n_docs"))
      .orderBy("source", "status")
  }

  /** One DoReMi domain-reweighting step (Graft.doremiReweight, Xie '23)
    * over the language domains: excess loss from the deterministic proxy
    * classifier, linearized multiplicative-weights update, before/after
    * mixture shares. One token-explode pass straight to the 5-row domain
    * frame; all solver arithmetic is k-row. */
  def mixtureDoremi(s: SparkSession, d: String): DataFrame =
    graft.api.Graft.doremiReweight(
        Tables.documents(s, d).select(col("doc_id"), col("lang"), col("text")),
        "doc_id", "text", "lang", buckets = 1024)
      .orderBy("lang")

  /** Per-source QUALITY DRIFT between two corpus generations — the monitor
    * an ingest pipeline reads beside corpus_diff: not just WHICH documents
    * changed, but whether each source's classifier-quality distribution
    * moved. Same two deterministic generations as corpus_diff (v0 drops
    * doc_id % 13 = 5; v1 drops % 13 = 7 and uppercases % 13 = 2 — the
    * uppercased tokens hash to different model buckets, so the drift is
    * real, not zero). Per source and generation: doc count and the
    * integer-exact mean of floor(score·10⁴) (round-half via the signed
    * ratio chain), then the delta. Two classifier passes, each linear;
    * everything after the per-source aggregate is source-count-sized. */
  def qualityDrift(s: SparkSession, d: String): DataFrame = {
    val docs = Tables.documents(s, d)
      .select(col("doc_id"), col("source"), col("text"))
    val v0 = docs.filter(col("doc_id") % 13 =!= 5)
    val v1 = docs.filter(col("doc_id") % 13 =!= 7)
      .withColumn("text",
        when(col("doc_id") % 13 === 2, upper(col("text")))
          .otherwise(col("text")))
    def perSource(v: DataFrame, nc: String, mc: String) =
      graft.api.Graft.linearClassify(
          v.select(col("doc_id"), col("text")), "doc_id", "text", 1024)
        .select(col("doc_id"),
          floor(col("score") * 10000.0).cast("long").as("__qi"))
        .join(v.select(col("doc_id"), col("source")), "doc_id")
        .groupBy("source")
        .agg(count(lit(1)).as(nc), sum("__qi").as("__qs"))
        .withColumn(mc, expr(
          s"""CAST(CASE WHEN __qs >= 0 THEN (2L * __qs + $nc) DIV (2L * $nc)
             |ELSE -((2L * -__qs + $nc) DIV (2L * $nc)) END AS DOUBLE)
             | / 10000.0""".stripMargin))
        .drop("__qs")
    perSource(v0, "n_v0", "mean_q_v0")
      .join(perSource(v1, "n_v1", "mean_q_v1"), "source")
      .withColumn("drift", round(col("mean_q_v1") - col("mean_q_v0"), 4))
      .orderBy("source")
  }

  /** Trailing-window event-rate anomaly flags (Graft.eventRateAnomalies):
    * per (event_type, hour), the z-score of this hour's volume against the
    * trailing 24 WALL-CLOCK hours (counts gap-filled onto a dense per-type
    * hour spine, so gap hours don't stretch the frame and zero-event hours
    * can flag — ADVICE r13). Hourly counts are the only data-sized pass;
    * the spine join and window run on the hour grid. */
  def eventAnomalies(s: SparkSession, d: String): DataFrame =
    graft.api.Graft.eventRateAnomalies(
        Tables.events(s, d), "ts", "event_type")
      .orderBy("event_type", "hour")

  /** Length-bucketed batch plan (Graft.lengthBucketPlan, fairseq-style
    * --max-tokens batching): per 16-token length bucket, the padding-waste
    * share and batch count at 16384 padded tokens per batch. Row-local
    * bucketing + one grid-sized aggregate. */
  def lengthBucketBatches(s: SparkSession, d: String): DataFrame =
    graft.api.Graft.lengthBucketPlan(
        Tables.documents(s, d).select(col("doc_id"), col("text")),
        "doc_id", "text", bucketTokens = 16, batchTokens = 16384)
      .orderBy("cap")

  /** Generation-over-generation 8-gram novelty per source (Graft
    * .ngramDrift): the content-level twin of corpus_diff, on the same
    * synthetic generations as quality_drift (gen0 drops %13==5, gen1
    * drops %13==7 and uppercases %13==2 — the rewrite creates REAL novel
    * n-grams, so the readout is non-trivial). */
  def ngramDrift(s: SparkSession, d: String): DataFrame = {
    val docs = Tables.documents(s, d)
      .select(col("doc_id"), col("source"), col("text"))
    val gen0 = docs.filter(col("doc_id") % 13 =!= 5)
    val gen1 = docs.filter(col("doc_id") % 13 =!= 7)
      .withColumn("text",
        when(col("doc_id") % 13 === 2, upper(col("text")))
          .otherwise(col("text")))
    graft.api.Graft.ngramDrift(gen0, gen1, "text", "source", n = 8)
      .orderBy("source")
  }

  /** Tokenizer drift across the quality_drift generations (Graft
    * .tokenizerDrift): retrain the 10-merge BPE on gen0 and gen1, diff the
    * merge tables per rank, overlap + Jaccard as constants. */
  def tokenizerDrift(s: SparkSession, d: String): DataFrame = {
    val docs = Tables.documents(s, d).select(col("doc_id"), col("text"))
    val gen0 = docs.filter(col("doc_id") % 13 =!= 5).select(col("text"))
    val gen1 = docs.filter(col("doc_id") % 13 =!= 7)
      .select(when(col("doc_id") % 13 === 2, upper(col("text")))
        .otherwise(col("text")).as("text"))
    graft.api.Graft.tokenizerDrift(gen0, gen1, "text", budget = 10)
      .orderBy("merge_rank")
  }

  /** Compute-optimal plan vs corpus supply (Graft.chinchillaPlan,
    * Hoffmann '22 + Muennighoff '23): per FLOP budget decade, optimal
    * N/D, the corpus's token supply, epochs needed, and the
    * data-constrained flag. */
  def chinchillaPlan(s: SparkSession, d: String): DataFrame =
    graft.api.Graft.chinchillaPlan(
        Tables.documents(s, d).select(col("text")), "text")
      .orderBy("budget_exp")

  /** K-anonymity audit on the customer quasi-identifiers (Graft
    * .kAnonymity): QI = (nation, market segment, 1000-wide balance
    * band); class-size histogram with row mass and ratio4 share. */
  def kAnonymity(s: SparkSession, d: String): DataFrame =
    graft.api.Graft.kAnonymity(
        Tables.customer(s, d),
        Seq(col("c_nationkey"), col("c_mktsegment"),
          floor(col("c_acctbal") / 1000.0).cast("long").as("bal_band")))
      .orderBy("k_bucket")

  /** Deterministic epoch-shuffle preview (Graft.epochShuffle): 4 epochs,
    * first 8 docs of each epoch's md5-keyed order via the fused min-k
    * aggregate — O(k) state per epoch, never a per-epoch global sort. */
  def epochShuffle(s: SparkSession, d: String): DataFrame =
    graft.api.Graft.epochShuffle(
        Tables.documents(s, d).select(col("doc_id")),
        "doc_id", epochs = 4, k = 8)
      .orderBy("epoch", "pos")

  /** Rendezvous/HRW shard assignment + rebalance audit (Graft
    * .rendezvousShards): every doc's home under 8 and 9 shards, the
    * (before, after) movement matrix — off-diagonal mass must sit in the
    * added shard's column, expected share 1 − 8/9. */
  def rendezvousShards(s: SparkSession, d: String): DataFrame =
    graft.api.Graft.rendezvousShards(
        Tables.documents(s, d).select(col("doc_id")),
        "doc_id", shards = 8, shardsAfter = 9)
      .orderBy("shard_before", "shard_after")

  /** Weighted reservoir sample (Graft.weightedReservoir, Efraimidis–
    * Spirakis A-ES): exactly 50 docs without replacement, inclusion ∝
    * tokens+1, deterministic exponential-race keys, fused min-k. */
  def weightedReservoir(s: SparkSession, d: String): DataFrame =
    graft.api.Graft.weightedReservoir(
        Tables.documents(s, d).select(col("doc_id"), col("text")),
        "doc_id", "text", k = 50)
      .orderBy("rank")

  /** Two-sample KS drift between the quality_drift generations (Graft
    * .ksDrift): binned-CDF Kolmogorov–Smirnov on the fixed 4096-cell
    * score grid, α=0.05 rejection. */
  def ksDrift(s: SparkSession, d: String): DataFrame = {
    val docs = Tables.documents(s, d).select(col("doc_id"), col("text"))
    val gen0 = docs.filter(col("doc_id") % 13 =!= 5).select(col("text"))
    val gen1 = docs.filter(col("doc_id") % 13 =!= 7)
      .select(when(col("doc_id") % 13 === 2, upper(col("text")))
        .otherwise(col("text")).as("text"))
    graft.api.Graft.ksDrift(gen0, gen1, "text", bins = 4096)
  }

  /** HLL inclusion–exclusion audience overlap across event-type pairs
    * (Graft.hllIntersect): one sketch aggregate, grid-pair unions,
    * intersection + Jaccard estimates (exact in the coupon regime). */
  def hllIntersect(s: SparkSession, d: String): DataFrame =
    graft.api.Graft.hllIntersect(
        Tables.events(s, d).select(col("event_type"), col("user_id")),
        "event_type", "user_id")
      .orderBy("type_a", "type_b")

  /** LPT shard→worker balance over the source grid (Graft.greedyBalance,
    * Graham '69): rank sources by token mass, assign each to the least-
    * loaded of 4 workers; makespan vs the ⌈Σt/W⌉ lower bound. */
  def greedyBalance(s: SparkSession, d: String): DataFrame =
    graft.api.Graft.greedyBalance(
        Tables.documents(s, d).select(col("text"), col("source")),
        "text", "source", workers = 4)
      .orderBy("rank")

  /** Packing-efficiency sweep (Graft.packingEfficiency): per candidate
    * max_len, sequences/pad-waste/chunked share — the choose-max_len
    * artifact beside pack_sequences. */
  def packingEfficiency(s: SparkSession, d: String): DataFrame =
    graft.api.Graft.packingEfficiency(
        Tables.documents(s, d).select(col("text")), "text")
      .orderBy("max_len")

  /** DP noisy release of per-(source, lang) doc counts (Graft
    * .dpNoisyCounts, ε=0.5): Laplace mechanism with hash-derived
    * deterministic noise, 1e-4 floor, clamp at 0. */
  def dpNoisyCounts(s: SparkSession, d: String): DataFrame =
    graft.api.Graft.dpNoisyCounts(
        Tables.documents(s, d).select(col("source"), col("lang")),
        Seq("source", "lang"), epsilon = 0.5)
      .orderBy("source", "lang")

  /** Population-stability-index drift between the quality_drift
    * generations (Graft.psiDrift): 10-cell constant score grid,
    * Laplace(+1) smoothing, floor(ln·2^20) log grid — the binned alarm
    * metric beside ks_drift's sup-norm test. */
  def psiDrift(s: SparkSession, d: String): DataFrame = {
    val docs = Tables.documents(s, d).select(col("doc_id"), col("text"))
    val gen0 = docs.filter(col("doc_id") % 13 =!= 5).select(col("text"))
    val gen1 = docs.filter(col("doc_id") % 13 =!= 7)
      .select(when(col("doc_id") % 13 === 2, upper(col("text")))
        .otherwise(col("text")).as("text"))
    graft.api.Graft.psiDrift(gen0, gen1, "text", bins = 10)
      .orderBy("bin")
  }

  /** l-diversity audit over event (type, hour-of-day) classes (Graft
    * .lDiversity): distinct users per quasi-identifier cell, l ≥ 5 to
    * pass — the sensitive-value companion to k_anonymity. */
  def lDiversity(s: SparkSession, d: String): DataFrame =
    graft.api.Graft.lDiversity(
        Tables.events(s, d),
        Seq(col("event_type"), hour(col("ts")).cast("long").as("hr")),
        col("user_id"), l = 5)
      .orderBy("event_type", "hr")

  /** Temporal train/test split with a 1-day embargo before a 7-day test
    * window (Graft.temporalEmbargoSplit): split sizes plus the
    * users-in-both group-leakage share of test users. */
  def splitTemporalEmbargo(s: SparkSession, d: String): DataFrame =
    graft.api.Graft.temporalEmbargoSplit(
        Tables.events(s, d).select(col("ts"), col("user_id")),
        "ts", "user_id", testDays = 7, embargoDays = 1)
      .orderBy("split")

  /** Blocked entity resolution over part names (Graft.entityResolution):
    * (brand, size) equality blocks, native true-Damerau-Levenshtein
    * kernel, per-brand pair/match/min-distance report — DuckDB's own
    * damerau_levenshtein independently pins the custom expression. */
  def entityResolution(s: SparkSession, d: String): DataFrame =
    graft.api.Graft.entityResolution(
        Tables.part(s, d)
          .select(col("p_partkey"), col("p_name"), col("p_brand"), col("p_size")),
        "p_partkey", "p_name", Seq("p_brand", "p_size"), "p_brand",
        maxDl = 4)
      .orderBy("p_brand")

  /** t-closeness audit over event-type classes (Graft.tCloseness):
    * EMD between each class's hour-of-day distribution and the global
    * one on the ordered 24-bin domain, t ≤ 0.2 to pass — the third leg
    * of the k-anonymity / l-diversity privacy triple. */
  def tCloseness(s: SparkSession, d: String): DataFrame =
    graft.api.Graft.tCloseness(
        Tables.events(s, d),
        col("event_type"), hour(col("ts")).cast("long"),
        bins = 24, threshold10000 = 2000)
      .orderBy("cls")

  /** Integer-quantized PageRank over the bipartite user↔event-type
    * engagement graph (Graft.pagerank): 5 damped power iterations on the
    * 2^-20 fixed-point grid, top-20 nodes — bit-identical to the DuckDB
    * unrolled-CTE twin. */
  def graphPagerank(s: SparkSession, d: String): DataFrame = {
    val ev = Tables.events(s, d).select(
        concat(lit("u"), col("user_id").cast("string")).as("u"),
        concat(lit("t"), col("event_type")).as("t"))
      .distinct()
    val edges = ev.select(col("u").as("src"), col("t").as("dst"))
      .union(ev.select(col("t").as("src"), col("u").as("dst")))
    graft.api.Graft.pagerank(edges, "src", "dst", iters = 5, topK = 20)
      .orderBy("rank")
  }

  /** Stratified 5-fold assignment over documents (Graft.kfoldAssign):
    * salted-hash folds, per-(fold, source) counts and within-source
    * shares. */
  def splitKfold(s: SparkSession, d: String): DataFrame =
    graft.api.Graft.kfoldAssign(
        Tables.documents(s, d).select(col("doc_id"), col("source")),
        "doc_id", "source", k = 5)
      .orderBy("fold", "source")

  /** Median/IQR robust outlier screen on event values per type (Graft
    * .robustScale): Tukey fences from 4dp-rounded quantiles, so the
    * cross-engine flag never rests on a last-ulp interpolation diff. */
  def robustScale(s: SparkSession, d: String): DataFrame =
    graft.api.Graft.robustScale(
        Tables.events(s, d).select(col("event_type"), col("value")),
        "event_type", "value")
      .orderBy("event_type")

  /** Gaps-and-islands activity streaks (Graft.activityStreaks): per-user
    * consecutive-active-day runs collapsed to a streak-length histogram. */
  def activityStreaks(s: SparkSession, d: String): DataFrame =
    graft.api.Graft.activityStreaks(
        Tables.events(s, d).select(col("user_id"), col("ts")),
        "user_id", "ts")
      .orderBy("streak_len")

  /** Registry `cdc_apply` (Graft.cdcApply): a deterministic I/U/D change
    * log built from orders — every order INSERTs at seq 1, every third
    * UPDATEs (+100.00) at seq 2, every fifth DELETEs at seq 3 — collapses
    * to the live snapshot (latest-wins, deletes drop), then rolls up per
    * priority. Prices ride as integer CENTS so the whole path is exact. */
  /** The I/U/D change log both cdc_apply and stream_cdc_apply consume:
    * every order INSERTs at seq 1, every third UPDATEs (+100.00) at seq 2,
    * every fifth DELETEs at seq 3; prices as integer cents. */
  private[graft] def cdcLog(s: SparkSession, d: String): DataFrame = {
    val o = Tables.orders(s, d).select(col("o_orderkey").as("k"),
      expr("CAST(round(o_totalprice * 100) AS BIGINT)").as("cents"),
      col("o_orderpriority").as("pri"))
    o.select(col("k"), lit(1L).as("seq"), lit("I").as("op"),
        col("cents"), col("pri"))
      .unionByName(o.filter(col("k") % 3 === 0)
        .select(col("k"), lit(2L).as("seq"), lit("U").as("op"),
          (col("cents") + 10000L).as("cents"), col("pri")))
      .unionByName(o.filter(col("k") % 5 === 0)
        .select(col("k"), lit(3L).as("seq"), lit("D").as("op"),
          col("cents"), col("pri")))
  }

  /** The per-priority live-snapshot rollup shared by both CDC rows. */
  private[graft] def cdcRollup(live: DataFrame): DataFrame =
    live.groupBy("pri")
      .agg(count(lit(1)).as("n_live"),
        round((sum("cents") / lit(100.0)), 2).as("total2"))
      .orderBy("pri")

  def cdcApply(s: SparkSession, d: String): DataFrame =
    cdcRollup(graft.api.Graft.cdcApply(cdcLog(s, d), "k", "seq", "op"))

  /** Registry `preference_stats` (Graft.preferenceLengthBias): disjoint
    * preference pairs from id-adjacent documents (even id = one side, id+1
    * the other), chosen = higher row-local uniqueness score (ties to the
    * even side) — the verbosity-bias audit for preference data. Pairing is
    * an EQUI join on doc_id+1, never a window over documents. */
  def preferenceStats(s: SparkSession, d: String): DataFrame = {
    val scored = Tables.documents(s, d)
      .withColumn("__t", expr("filter(split(text, ' ', -1), t -> length(t) > 0)"))
      .select(col("doc_id"), col("source"), col("n_chars"),
        expr("(1000000L * size(array_distinct(__t))) div size(__t)").as("score"))
    val a = scored.filter(col("doc_id") % 2 === 0)
      .select(col("doc_id").as("a_id"), col("source"),
        col("n_chars").as("a_len"), col("score").as("a_score"))
    val b = scored.select((col("doc_id") - 1).as("a_id"),
      col("n_chars").as("b_len"), col("score").as("b_score"))
    val pairs = a.join(b, "a_id")
      .select(col("source"),
        when(col("a_score") >= col("b_score"), col("a_len"))
          .otherwise(col("b_len")).as("chosen_len"),
        when(col("a_score") >= col("b_score"), col("b_len"))
          .otherwise(col("a_len")).as("rejected_len"),
        greatest(col("a_score"), col("b_score")).as("chosen_score"),
        least(col("a_score"), col("b_score")).as("rejected_score"))
    graft.api.Graft.preferenceLengthBias(pairs, "chosen_len", "rejected_len",
        "chosen_score", "rejected_score", "source")
      .orderBy("source")
  }

  /** Registry `dialog_stats` (Graft.dialogStats): documents serialize to
    * multi-turn JSON chat transcripts (8-token turns, roles alternating
    * user/assistant) and the operator parses them BACK with from_json —
    * the real SFT wire-format audit: dialog counts, mean turns, assistant
    * token share, ends-on-assistant rate per source. */
  def dialogStats(s: SparkSession, d: String): DataFrame = {
    val dialogs = Tables.documents(s, d)
      .withColumn("__t", expr("filter(split(text, ' ', -1), t -> length(t) > 0)"))
      .withColumn("__nt", expr("CAST(ceil(size(__t) / 8.0) AS INT)"))
      .select(col("source"),
        to_json(expr("""transform(sequence(1, __nt),
          i -> named_struct(
            'role', IF(i % 2 = 1, 'user', 'assistant'),
            'content', concat_ws(' ', slice(__t, (i - 1) * 8 + 1, 8))))"""))
          .as("dialog_json"))
    graft.api.Graft.dialogStats(dialogs, "dialog_json", "source")
      .orderBy("source")
  }

  /** Registry `dataset_card` (Graft.datasetCard): the per-source datasheet
    * row — volume, verbatim-dup share, language mix entropy, mean
    * uniqueness — the release artifact a corpus ships with. */
  def datasetCard(s: SparkSession, d: String): DataFrame =
    graft.api.Graft.datasetCard(Tables.documents(s, d),
        "doc_id", "text", "lang", "source")
      .orderBy("source")

  /** Shared scored frame for the correlation/MI rows: the row-local
    * integer uniqueness score beside the stored n_chars. */
  private def uniqScored(s: SparkSession, d: String): DataFrame =
    Tables.documents(s, d)
      .withColumn("__t", expr("filter(split(text, ' ', -1), t -> length(t) > 0)"))
      .select(col("doc_id"), col("lang"), col("source"), col("n_chars"),
        expr("(1000000L * size(array_distinct(__t))) div size(__t)").as("score"))

  /** Registry `signal_correlation` (Graft.signalCorrelation): Pearson +
    * tie-corrected Spearman between the uniqueness score and document
    * length per source — "is the cheap signal just length in disguise?" */
  def signalCorrelation(s: SparkSession, d: String): DataFrame =
    graft.api.Graft.signalCorrelation(uniqScored(s, d),
        "score", "n_chars", "source")
      .orderBy("source")

  /** Registry `mutual_information` (Graft.mutualInformation): MI between
    * the uniqueness-score decile and the source, per language — how much
    * does knowing the source tell you about quality (mixture-design
    * dependence check). */
  def mutualInformation(s: SparkSession, d: String): DataFrame =
    graft.api.Graft.mutualInformation(
        uniqScored(s, d).withColumn("bucket",
          expr("least(score div 100000, 9L)")),
        "bucket", "source", "lang")
      .orderBy("lang")

  /** Registry `skyline_select` (Graft.skylineSelect): the per-source
    * Pareto front on (uniqueness, length) — the documents no other
    * document beats on both signals, the multi-objective pick a single
    * threshold can't express. */
  def skylineSelect(s: SparkSession, d: String): DataFrame =
    graft.api.Graft.skylineSelect(uniqScored(s, d),
        "doc_id", "score", "n_chars", "source")
      .orderBy("source", "score")

  /** Registry `incremental_view` (Graft.applyAggDelta): the per-priority
    * (count, cents) materialized view maintained INCREMENTALLY under the
    * CDC feed — base view from the insert snapshot, then one grouped
    * delta frame (updates: +Δsum; deletes: −count, −current value)
    * applied without touching base data. Final view == the full
    * recompute, so the oracle is cdc_apply's verbatim. */
  def incrementalView(s: SparkSession, d: String): DataFrame = {
    val log = cdcLog(s, d)
    val base = log.filter(col("op") === "I")
      .groupBy("pri")
      .agg(count(lit(1)).as("n_live"), sum("cents").as("cents"))
    val deltas = log.filter(col("op") === "U")
      .select(col("pri"), lit(0L).as("n_live"), lit(10000L).as("cents"))
      .unionByName(log.filter(col("op") === "D")
        .select(col("pri"), lit(-1L).as("n_live"),
          (-(col("cents") + when(col("k") % 3 === 0, 10000L).otherwise(0L)))
            .as("cents")))
      .groupBy("pri")
      .agg(sum("n_live").as("n_live"), sum("cents").as("cents"))
    graft.api.Graft.applyAggDelta(base, deltas, "pri", "n_live", "cents")
      .select(col("pri"), col("n_live"),
        round(col("cents") / lit(100.0), 2).as("total2"))
      .orderBy("pri")
  }

  /** Registry `ab_test` (Graft.abTest): the experiment readout — variant
    * from user_id parity, conversion = any 'purchase' event, pooled
    * two-proportion z over exact integer counts. */
  def abTest(s: SparkSession, d: String): DataFrame =
    graft.api.Graft.abTest(
      Tables.events(s, d).select(col("user_id"),
        (col("user_id") % 2).as("variant"),
        (col("event_type") === "purchase" && col("value") > 180.0)
          .as("converted")),
      "user_id", "variant", "converted")

  /** Registry `ewma_monitor` (Graft.ewmaMonitor): per-type integer EWMA
    * over the gap-filled hourly spine — the streaming-friendly smoother
    * beside event_anomalies' trailing-window z-score. */
  def ewmaMonitor(s: SparkSession, d: String): DataFrame =
    graft.api.Graft.ewmaMonitor(
        Tables.events(s, d).select(col("ts"), col("event_type")),
        "ts", "event_type")
      .orderBy("event_type")

  /** Registry `attribution_touch` (Graft.attributionTouch): first-/last-
    * touch conversion attribution over the event stream — conversions are
    * high-value purchases (the ab_test rule), touches every other event
    * strictly before the user's first conversion. */
  def attributionTouch(s: SparkSession, d: String): DataFrame =
    graft.api.Graft.attributionTouch(
        Tables.events(s, d).withColumn("conv",
          col("event_type") === "purchase" && col("value") > 180.0),
        "user_id", "ts", "event_id", "event_type", "conv")
      .orderBy("channel")

  /** Registry `forecast_baseline` (Graft.forecastBaseline): the
    * seasonal-naive hour-of-day forecast scored on the second half of the
    * event timeline — the backtest baseline every forecaster must beat. */
  def forecastBaseline(s: SparkSession, d: String): DataFrame =
    graft.api.Graft.forecastBaseline(
        Tables.events(s, d).select(col("ts"), col("event_type")),
        "ts", "event_type")
      .orderBy("event_type")

  /** Registry `winsorized_stats` (Graft.winsorizedStats): the repair
    * companion to robust_scale — per-type event values clamp to exact
    * [p05, p95] and the means recompute on DECIMAL-exact sums. */
  def winsorizedStats(s: SparkSession, d: String): DataFrame =
    graft.api.Graft.winsorizedStats(
        Tables.events(s, d).select(col("event_type"), col("value")),
        "event_type", "value")
      .orderBy("event_type")
}
