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
