package graft

import org.apache.spark.sql.functions._

/** Round-5 additions: the distributed two-phase-prefix-sum sequence packer
  * must equal a sequential single-threaded model — partition-boundary
  * invariance is exactly the operator's correctness claim. */
class Round5Spec extends SparkSpec {
  import spark.implicits._

  test("packSequences equals the sequential chunked-concatenation model") {
    val docs = Tables.documents(spark, sf).select(col("doc_id"), col("text"))
    val got = api.Graft.packSequences(docs, "doc_id", "text", seqLen = 512)
      .select("doc_id", "n_tokens", "seq_id", "seq_offset")
      .as[(Long, Long, Long, Long)].collect().sortBy(_._1).toSeq
    var cum = 0L
    val model = docs.as[(Long, String)].collect().sortBy(_._1).toSeq
      .map { case (id, text) =>
        // size(split(text, ' ', -1)) counts empty tokens — model matches
        val n = text.split(" ", -1).length.toLong
        val row = (id, n, cum / 512, cum % 512)
        cum += n
        row
      }
    assert(got == model)
    // conservation: every token lands in exactly one running position
    assert(got.map(_._2).sum == cum)
  }

  test("packSequences assigns overflowing docs to their starting sequence") {
    val docs = Seq(
      (1L, Seq.fill(300)("w").mkString(" ")),   // starts seq 0
      (2L, Seq.fill(300)("w").mkString(" ")),   // starts at 300, overflows into seq 1
      (3L, Seq.fill(10)("w").mkString(" "))     // starts at 600 -> seq 1
    ).toDF("doc_id", "text")
    val got = api.Graft.packSequences(docs, "doc_id", "text", seqLen = 512)
      .select("doc_id", "seq_id", "seq_offset")
      .as[(Long, Long, Long)].collect().sortBy(_._1).toSeq
    assert(got == Seq((1L, 0L, 0L), (2L, 0L, 300L), (3L, 1L, 88L)))
  }
}
