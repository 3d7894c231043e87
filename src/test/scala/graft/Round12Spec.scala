package graft

import org.apache.spark.sql.functions._

/** Round-12 pins (VERDICT r11 tasks):
  *   - dedup_minhash_mllib demoted from the registry to this suite pin
  *     (task 4, option 2): the MLlib hash family has no SQL twin, so the
  *     registry is now 100% oracled; the library path stays exercised and
  *     CONTRACT-checked here instead of rows-only-checked there.
  *   - registry == oracle-set invariant (the demotion's point, pinned so a
  *     future non-oracleable registry row is a deliberate, visible choice).
  */
class Round12Spec extends SparkSpec {
  import spark.implicits._

  test("every registry query has an oracle — the registry is 100% oracled") {
    val queries = SparkEntry.queries.keySet
    val oracled = SparkEntry.oracleSql.keySet
    assert(oracled.subsetOf(queries),
      s"oracle entries without a query: ${oracled -- queries}")
    assert(queries == oracled,
      s"registry rows without an oracle: ${queries -- oracled}")
  }

  test("MLlib MinHashLSH path: pairs are true near-dups and strong pairs are recalled") {
    // The demoted library-path row, pinned against ground truth: exact
    // 3-gram shingle Jaccard computed from the same table.
    val pairs = queries.Dedup.dedupMinhashMllib(spark, sf)
      .select("id_a", "id_b", "est_jaccard")
      .as[(Long, Long, Double)].collect().toSeq
    assert(pairs.nonEmpty, "sf0.001 corpus has near-dup pairs; MLlib found none")
    val shingleSets = api.Graft.shingles(
        Tables.documents(spark, sf).select(col("doc_id"), col("text")),
        "doc_id", "text")
      .groupBy("doc_id").agg(collect_set("shingle").as("sh"))
      .as[(Long, Seq[String])].collect()
      .map { case (id, sh) => id -> sh.toSet }.toMap
    def jac(a: Long, b: Long): Double = {
      val (x, y) = (shingleSets(a), shingleSets(b))
      if (x.isEmpty && y.isEmpty) 1.0
      else x.intersect(y).size.toDouble / x.union(y).size
    }
    // precision: approxSimilarityJoin's residual distance is EXACT Jaccard
    // over the hashed (2^18 HashingTF) shingle space; collisions can only
    // merge shingles, so raw-shingle Jaccard sits within a small tolerance
    // of the reported estimate and above the 0.2 gate minus that tolerance
    pairs.foreach { case (a, b, est) =>
      val j = jac(a, b)
      assert(j >= 0.15, s"pair ($a,$b) est=$est but raw Jaccard=$j")
      assert(math.abs(j - est) <= 0.05,
        s"pair ($a,$b): reported $est vs raw-shingle Jaccard $j")
    }
    // recall: every STRONG pair (raw Jaccard >= 0.5) must be found — with 8
    // single-row hash tables a j=0.5 pair collides in >= 1 table with
    // probability 1-(1-0.5)^8 = 99.6%, and the fixed seed makes the actual
    // outcome deterministic (this pin would catch a seed/table regression)
    val ids = shingleSets.keys.toSeq.sorted
    val strong = for {
      i <- ids; k <- ids if i < k && jac(i, k) >= 0.5
    } yield (i, k)
    val found = pairs.map(p => (p._1, p._2)).toSet
    assert(strong.forall(found.contains),
      s"strong pairs missed: ${strong.filterNot(found.contains)}")
  }
}
