package graft

import graft.queries.Modern

/** Semantics pins for the modern-SQL (Spark 4.x) surface beyond what the
  * DuckDB oracle already hash-checks: the invariants that make each query's
  * oracle VALID (exactness of the bitmap/HLL paths, losslessness of the
  * round trips, collation-vs-lower equivalence, recursion shape). */
class ModernSpec extends SparkSpec {

  test("recursive CTE walk visits every nation exactly once") {
    val rows = Modern.recursiveCte(spark, sf).collect()
    assert(rows.length == 25)
    assert(rows.map(_.getInt(1)).distinct.length == 25)       // all 25 nations
    assert(rows.map(_.getInt(0)).toSeq == (0 until 25))       // depths 0..24
  }

  test("bitmap exact-distinct equals count(DISTINCT)") {
    val bm = Modern.bitmapDistinct(spark, sf).collect()
      .map(r => r.getString(0) -> r.getLong(1)).toMap
    val exact = Tables.events(spark, sf)
      .groupBy("event_type").agg(org.apache.spark.sql.functions
        .countDistinct("user_id").as("n")).collect()
      .map(r => r.getString(0) -> r.getLong(1)).toMap
    assert(bm == exact)
  }

  test("HLL(lgK=14) estimate is exact at verification cardinalities") {
    val hll = Modern.hllSketch(spark, sf).collect()
      .map(r => r.getString(0) -> r.getLong(1)).toMap
    val exact = Tables.orders(spark, sf)
      .groupBy("o_orderpriority").agg(org.apache.spark.sql.functions
        .countDistinct("o_custkey").as("n")).collect()
      .map(r => r.getString(0) -> r.getLong(1)).toMap
    assert(hll == exact)
  }

  test("XML and AES round trips are lossless") {
    val xml = Modern.xmlRoundtrip(spark, sf)
    assert(xml.filter("c_name IS NULL OR acctbal IS NULL").count() == 0)
    val aes = Modern.aesRoundtrip(spark, sf).collect()
    assert(aes.nonEmpty)
    // ECB+PKCS ciphertext length is the next 16-byte multiple strictly above
    // the plaintext length (padding always added).
    assert(aes.forall { r =>
      val len = r.getInt(2)
      len % 16 == 0 && len > 0
    })
  }

  test("collated grouping merges case-mangled spellings per brand") {
    val rows = Modern.collationGroup(spark, sf).collect()
    val brands = Tables.part(spark, sf).select("p_brand").distinct().count()
    assert(rows.length == brands)                  // one group per brand
    assert(rows.forall(r => r.getString(0) == r.getString(0).toLowerCase))
  }

  test("variant path extraction matches from_json on the same column") {
    val v = Modern.variantFuncs(spark, sf).selectExpr("event_id", "k_val")
    val j = Tables.events(spark, sf)
      .selectExpr("event_id", "CAST(get_json_object(props, '$.k') AS INT) AS k_val")
    assert(v.exceptAll(j).count() == 0 && j.exceptAll(v).count() == 0)
  }

  test("listagg roster is sorted within each region") {
    val rows = Modern.listaggGroups(spark, sf).collect()
    assert(rows.length == 5)
    rows.foreach { r =>
      val names = r.getString(2).split(",").toSeq
      assert(names == names.sorted && names.length == r.getLong(1))
    }
  }
}
