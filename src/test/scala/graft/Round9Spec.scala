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
}
