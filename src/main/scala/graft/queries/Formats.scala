package graft.queries

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._
import graft.Tables

/** Format/serde surface (declared D8 — flink-json, study/pom.xml:169-174):
  * structured JSON parse (`from_json`), typed field extraction, and
  * re-serialization (`to_json`) — round-tripping inside one codegen stage. */
object Formats {
  /** Dirs registered here are recursively deleted at JVM exit — staging
    * trees are app-id-unique (see callers), so each session cleans only its
    * own tree and concurrent sessions never share a path. */
  private val cleanupDirs =
    new java.util.concurrent.ConcurrentHashMap[String, java.lang.Boolean]()

  /** Serializes schemaEvolution's generation writes (ADVICE r12). */
  private val evoLock = new Object
  private[graft] def registerCleanup(dir: String): Unit =
    if (cleanupDirs.putIfAbsent(dir, java.lang.Boolean.TRUE) == null) {
      Runtime.getRuntime.addShutdownHook(new Thread(() => {
        def rm(f: java.io.File): Unit = {
          if (f.isDirectory) Option(f.listFiles()).foreach(_.foreach(rm))
          f.delete(): Unit
        }
        rm(new java.io.File(dir))
      }))
    }

  /** App-unique, DATASET-unique artifact directory under /tmp/`rootName`:
    * the sanitized dataset path PLUS an md5 prefix of the raw path —
    * sanitization alone maps distinct dirs (/data/sf1, /data_sf1) to one
    * key, silently serving one dataset's artifact for the other. One
    * derivation shared by every at-rest artifact (IVF index, IVF refresh,
    * minhash fold-in index) so the disambiguation cannot be forgotten.
    * Registers `root` for JVM-exit cleanup. */
  private[graft] def artifactBase(s: org.apache.spark.sql.SparkSession,
      rootName: String, d: String): String = {
    val root = s"/tmp/$rootName/${s.sparkContext.applicationId}"
    registerCleanup(root)
    val pathHash = java.security.MessageDigest.getInstance("MD5")
      .digest(d.getBytes("UTF-8")).take(4).map("%02x".format(_)).mkString
    root + "/" + d.replaceAll("[^A-Za-z0-9.]", "_") + "_" + pathHash
  }

  def jsonRoundtrip(s: SparkSession, d: String): DataFrame =
    Tables.events(s, d)
      .select(
        col("event_id"),
        expr("from_json(props, 'k INT').k").as("k"),
        to_json(struct(col("user_id"), col("event_type"))).as("packed"))
      .orderBy("event_id")

  /** File-format round trip through the three batch interchange formats the
    * engine writes (csv with header+quoting, json lines, orc): documents go
    * out through each format and come back in, and the result proves
    * losslessness by aggregating text lengths per (lang, format) — any
    * mangled row would shift the sums off the parquet-direct oracle. */
  def formatRoundtrip(s: SparkSession, d: String): DataFrame = {
    // App-id-unique staging (same scheme as zorderPruneReadback): concurrent
    // sessions each write their own tree; cleaned up at JVM exit.
    val base = s"/tmp/graft_fmt_roundtrip/${s.sparkContext.applicationId}/" +
      d.replaceAll("[^A-Za-z0-9.]", "_")
    Formats.registerCleanup(s"/tmp/graft_fmt_roundtrip/${s.sparkContext.applicationId}")
    val docs = Tables.documents(s, d)
      .select(col("doc_id"), col("lang"), col("text"))
    docs.write.mode("overwrite").option("header", "true").csv(s"$base/csv")
    docs.write.mode("overwrite").json(s"$base/json")
    docs.write.mode("overwrite").orc(s"$base/orc")
    val csv = s.read.option("header", "true")
      .schema("doc_id LONG, lang STRING, text STRING").csv(s"$base/csv")
    val json = s.read.schema("doc_id LONG, lang STRING, text STRING")
      .json(s"$base/json")
    val orc = s.read.orc(s"$base/orc")
    Seq("csv" -> csv, "json" -> json, "orc" -> orc)
      .map { case (fmt, df) =>
        df.withColumn("fmt", lit(fmt))
          .groupBy("fmt", "lang")
          .agg(count(lit(1)).as("n_docs"),
            sum(length(col("text"))).as("total_chars"),
            min("doc_id").as("min_id"), max("doc_id").as("max_id"))
      }
      .reduce(_ unionByName _)
      .orderBy("fmt", "lang")
  }

  /** SCHEMA EVOLUTION across ingest generations — the lakehouse capability
    * every long-lived corpus table exercises: generation 1 writes
    * (doc_id, lang), generation 2 adds an `n_chars` column, and a
    * mergeSchema read unions the footers — generation-1 rows surface the
    * new column as NULL, nothing rewrites. The readout proves the merge:
    * per language, total docs vs docs CARRYING the evolved column, plus
    * the evolved column's sum (old rows contribute nothing). At 100 TB
    * mergeSchema's footer-scan cost is why production pins the schema in
    * a metastore/catalog and evolves it there; this row demonstrates the
    * file-level mechanics the catalog automates. */
  def schemaEvolution(s: SparkSession, d: String): DataFrame = {
    val base = artifactBase(s, "graft_schema_evo", d)
    // build-once guard (ADVICE r12): exists→write alone is check-then-act —
    // two same-session invocations racing it would run overlapping
    // overwrite jobs into the same generations while a concurrent
    // mergeSchema read lists the files (the ensureSignatureTable pattern:
    // JVM lock + a marker written only after both generations committed;
    // cross-session writers are isolated by artifactBase's app-id scoping)
    evoLock.synchronized {
      val marker = new org.apache.hadoop.fs.Path(base, "_GENS_DONE")
      val fs = marker.getFileSystem(s.sparkContext.hadoopConfiguration)
      if (!fs.exists(marker)) {
        val docs = Tables.documents(s, d)
        docs.filter(col("doc_id") % 3 === 0)
          .select(col("doc_id"), col("lang"))
          .write.mode("overwrite").parquet(s"$base/gen1")
        docs.filter(col("doc_id") % 3 =!= 0)
          .select(col("doc_id"), col("lang"), col("n_chars"))
          .write.mode("overwrite").parquet(s"$base/gen2")
        fs.create(marker, true).close()
      }
    }
    s.read.option("mergeSchema", "true").parquet(s"$base/gen1", s"$base/gen2")
      .groupBy("lang")
      .agg(count(lit(1)).as("n_docs"),
        count(col("n_chars")).as("n_evolved"),
        coalesce(sum("n_chars"), lit(0L)).as("total_chars"))
      .orderBy("lang")
  }

  /** Hive-style JSON path surface: json_tuple (generator form, LATERAL VIEW)
    * and get_json_object (scalar path) — the pre-VARIANT JSON access idioms
    * ported pipelines still carry. */
  def jsonTupleFuncs(s: SparkSession, d: String): DataFrame = {
    Tables.events(s, d).createOrReplaceTempView("graft_events_jt")
    s.sql(
      """SELECT event_id, t.kv AS kv_tuple,
        |  get_json_object(props, '$.k') AS kv_path
        |FROM graft_events_jt
        |LATERAL VIEW json_tuple(props, 'k') t AS kv
        |ORDER BY event_id""".stripMargin)
  }

  /** Row-level CSV serde functions (from_csv / to_csv): the per-record
    * sibling of the file-level CSV round trip — what a pipeline uses when CSV
    * payloads arrive inside another envelope (a message queue, a string
    * column). Row-local, schema-checked both directions. */
  def csvFuncs(s: SparkSession, d: String): DataFrame =
    Tables.events(s, d)
      .select(col("event_id"),
        expr("to_csv(named_struct('t', event_type, 'u', user_id))").as("packed"),
        expr("from_csv(concat(event_type, ',', user_id), 't STRING, u BIGINT').u")
          .as("unpacked_u"))
      .orderBy("event_id")

  /** Hive-style partitioned layout: write lineitem partitioned by
    * (l_returnflag, l_linestatus), then read back ONE partition and
    * aggregate. The readback filter matches only partition columns, so the
    * scan lists a single directory (`PartitionFilters` in the plan, asserted
    * by PlanAudit) — at 100 TB this is the difference between touching one
    * partition's files and the whole table. Results oracle-checked against
    * the unpartitioned parquet. */
  def partitionedWrite(s: SparkSession, d: String): DataFrame = {
    // App-id-unique staging (same scheme as zorderPruneReadback): concurrent
    // sessions each write their own tree; cleaned up at JVM exit.
    val base = s"/tmp/graft_part_write/${s.sparkContext.applicationId}/" +
      d.replaceAll("[^A-Za-z0-9.]", "_")
    Formats.registerCleanup(s"/tmp/graft_part_write/${s.sparkContext.applicationId}")
    Tables.lineitem(s, d)
      .select(col("l_orderkey"), col("l_quantity"), col("l_extendedprice"),
        col("l_returnflag"), col("l_linestatus"))
      .write.mode("overwrite")
      .partitionBy("l_returnflag", "l_linestatus")
      .parquet(base)
    s.read.parquet(base)
      .filter(col("l_returnflag") === "R" && col("l_linestatus") === "F")
      .groupBy("l_returnflag", "l_linestatus")
      .agg(count(lit(1)).as("n"),
        round(sum("l_quantity"), 2).as("sum_qty"),
        Exact.sumRound2(Exact.dec(col("l_extendedprice"))).as("sum_price"))
      .orderBy("l_returnflag", "l_linestatus")
  }

  /** Z-order layout demo (Graft.zorderKey): events keyed by the Morton
    * interleave of (user_id, value), then bucketed by the key's top 4 bits —
    * the 16 "files" a z-ordered write would produce. The per-bucket min/max
    * spans of BOTH dimensions stay tight (that's the point: parquet
    * row-group stats then prune predicates on either column), which the
    * oracle verifies bucket by bucket. */
  def zorderLayout(s: SparkSession, d: String): DataFrame =
    graft.api.Graft.zorderKey(
        Tables.events(s, d).select(col("user_id"), col("value")),
        "user_id", "value", bits = 16)
      .withColumn("bucket", expr("CAST(shiftright(zkey, 28) AS INT)"))
      .groupBy("bucket")
      .agg(count(lit(1)).as("n"),
        min("user_id").as("min_u"), max("user_id").as("max_u"),
        round(min("value"), 2).as("min_v"), round(max("value"), 2).as("max_v"))
      .orderBy("bucket")

  /** Z-order READBACK (VERDICT r6 #4 — closes the layout loop): events are
    * actually WRITTEN to parquet partitioned by the zkey's top-4-bit bucket
    * (the 16 files a z-ordered writer produces), then read back through a
    * 2-D corner-box predicate (user_id ≤ 30 AND value ≤ 100). The output
    * compares, for the z-order layout vs a user_id%16 hash layout of the
    * same rows, how many of the 16 buckets the box intersects: z-order
    * confines the corner box to the buckets whose leading interleaved bits
    * match (1 at sf0.01), while hash spreads it across ~all 16 — the
    * row-group-skipping argument made on real written-and-reread files.
    * The readback filter reaches the parquet scan as PushedFilters on BOTH
    * dimensions (PlanAudit-pinned); Round7Spec additionally verifies
    * physical row-group prune-ability from the parquet footers. */
  def zorderPruneReadback(s: SparkSession, d: String): DataFrame = {
    // Run-unique staging dir (app id), so concurrent sessions over the same
    // dataset can't clobber each other's overwrite-then-read (ADVICE r7);
    // within a session the path is stable, so re-invocations just overwrite.
    // The whole app-id tree is removed at JVM exit.
    val base = s"/tmp/graft_zorder_rb/${s.sparkContext.applicationId}/" +
      d.replaceAll("[^A-Za-z0-9.]", "_")
    Formats.registerCleanup(s"/tmp/graft_zorder_rb/${s.sparkContext.applicationId}")
    graft.api.Graft.zorderKey(
        Tables.events(s, d).select(col("event_id"), col("user_id"), col("value")),
        "user_id", "value", bits = 16)
      .withColumn("zbucket", expr("CAST(shiftright(zkey, 28) AS INT)"))
      .write.mode("overwrite").partitionBy("zbucket").parquet(base)
    val boxed = s.read.parquet(base)
      .filter(col("user_id") <= 30 && col("value") <= 100.0)
    def summarize(layout: String, bucket: org.apache.spark.sql.Column) =
      boxed.agg(
        lit(layout).as("layout"),
        count(lit(1)).as("n_rows_matched"),
        count_distinct(bucket).as("n_buckets_touched"))
    summarize("zorder", col("zbucket"))
      .unionByName(summarize("hash_mod16", col("user_id") % 16))
      .select(col("layout"), col("n_rows_matched"), col("n_buckets_touched"))
      .orderBy("layout")
  }
}
