package graft

import org.apache.spark.sql.functions._

/** Round-13 pins (VERDICT r12 tasks):
  *   - constant-size audit slice arithmetic (task 1): the threshold is
  *     integer-exact, ∝ 1/N, and reproduces r12's 1-in-4 slice at sf0.1.
  *   - mixtureWaterfill solver-frame guard (task 6): a data-sized frame
  *     fails fast at execution instead of silently single-partitioning.
  *   - profile completeness (task 4): every registry row has a frozen
  *     per-query profile, so a new query can never debut under the
  *     family-median fallback where its own regression is invisible.
  */
class Round13Spec extends SparkSpec {
  import spark.implicits._

  test("auditSliceThresholdHex: integer-exact, 1/N fraction, r12 slice reproduced") {
    // no slicing when the corpus fits the target
    assert(api.Graft.auditSliceThresholdHex(500L, 1250L).isEmpty)
    assert(api.Graft.auditSliceThresholdHex(1250L, 1250L).isEmpty)
    // sf0.1: N=5000, target=1250 → exactly 2^30 → the r12 1-in-4
    // first-digit slice (prefix < '40000000' ⟺ first hex digit ∈ 0..3)
    assert(api.Graft.auditSliceThresholdHex(5000L, 1250L).contains("40000000"))
    // sf1: N=50000 → fraction 1/40 — ten times thinner, same slice SIZE
    assert(api.Graft.auditSliceThresholdHex(50000L, 1250L).contains("06666666"))
    // threshold/2^32 under-approximates target/n by < 1/2^32 (floor), and
    // the fraction halves when the corpus doubles
    val t1 = java.lang.Long.parseLong(
      api.Graft.auditSliceThresholdHex(100000L, 1250L).get, 16)
    val t2 = java.lang.Long.parseLong(
      api.Graft.auditSliceThresholdHex(200000L, 1250L).get, 16)
    assert(math.abs(t1 - 2L * t2) <= 1L, s"fraction not ∝ 1/N: $t1 vs 2*$t2")
  }

  test("screenEvalBase slicing: explicit digits and equivalent threshold agree") {
    // target 125 of the 500 suite docs → threshold 0x40000000 — the same
    // documents as the explicit first-digit-in-0..3 slice, so the two
    // slicing forms must produce the identical confusion row
    val docs = Tables.documents(spark, sf).select(col("doc_id"), col("text"))
    val auto = api.Graft.minhashScreenEval(docs, "doc_id", "text",
        tau = 0.2, targetSliceDocs = 125L, baseHash = api.Graft.md5Hash60)
      .collect().toSeq
    val explicit = api.Graft.minhashScreenEval(docs, "doc_id", "text",
        tau = 0.2, sampleHexDigits = Seq("0", "1", "2", "3"),
        baseHash = api.Graft.md5Hash60)
      .collect().toSeq
    assert(auto == explicit, s"auto-slice $auto vs explicit-digit $explicit")
  }

  test("mixtureWaterfill: solver-frame ceiling fails fast, guard leaves results intact") {
    // a data-sized frame breaches the ceiling at EXECUTION time — the
    // raise_error rides the solver's own global window, no extra job
    val big = Tables.documents(spark, sf)
      .select(col("doc_id").as("src"), col("n_chars").as("avail"),
        lit(1L).as("w"))
    val ex = intercept[Exception] {
      api.Graft.mixtureWaterfill(big, "src", "avail", "w",
        budget = 1000L, solverMaxRows = 10).collect()
    }
    def messages(t: Throwable): Seq[String] =
      Option(t).toSeq.flatMap(e =>
        String.valueOf(e.getMessage) +: messages(e.getCause))
    assert(messages(ex).exists(_.contains("mixtureWaterfill")),
      s"expected the solver-frame guard message, got: ${messages(ex)}")
    // and a solver-sized frame still allocates exactly (guard is inert):
    // budget 100 over (a: avail 10, w 1), (b: avail 1000, w 1) → a
    // saturates at 10, the freed 40 re-flows to b → b gets 90
    val small = Seq(("a", 10L, 1L), ("b", 1000L, 1L))
      .toDF("src", "avail", "w")
    val out = api.Graft.mixtureWaterfill(small, "src", "avail", "w",
        budget = 100L)
      .select("src", "alloc").as[(String, Long)].collect().toMap
    assert(out == Map("a" -> 10L, "b" -> 90L), s"waterfill drifted: $out")
  }

  test("profile completeness: every registry row has a frozen per-query profile") {
    // VERDICT r12 task 4: without this, a brand-new query debuts under the
    // family-median fallback and its own slow reading never trips the
    // self-ruling bench's ruler. Enforced for BOTH profile files the bench
    // reads (sf0.1 and sf1).
    val registry = SparkEntry.queries.keySet
    for (file <- Seq("tools/profiles.json", "tools/profiles_sf1.json")) {
      val node = new com.fasterxml.jackson.databind.ObjectMapper()
        .readTree(new java.io.File(file)).get("profiles")
      import scala.jdk.CollectionConverters._
      val keys = node.fieldNames().asScala.toSet
      val missing = registry -- keys
      assert(missing.isEmpty,
        s"$file is missing profiles for registry rows: ${missing.toSeq.sorted}")
    }
  }
}
