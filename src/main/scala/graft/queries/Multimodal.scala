package graft.queries

import org.apache.spark.sql.{DataFrame, Row, SparkSession}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types._
import graft.Tables
import graft.functions.VectorFunctions

// Row shapes for the typed decode path. Top-level (not nested/private) so
// Catalyst's generated (de)serializers can reach the constructors.
case class Asset(doc_id: Long, image: Array[Byte], meta_width: Int, meta_height: Int)
case class Decoded(doc_id: Long, n_bytes: Int, mean_byte: Double,
    max_byte: Int, width: Int, height: Int)

/** Multimodal-column plumbing (driver-mandated extension surface): treat
  * image/audio/video payloads as opaque `binary` columns with typed metadata,
  * carried through joins/partitioning like any other column, with decode /
  * feature-extraction as partition-batched compute.
  *
  * The container has no image/audio libraries, so the decoder is a clearly
  * marked deterministic STUB (derives "pixels" from the payload bytes); the
  * Spark-side plumbing — schema, binary column handling, partition-batched
  * iteration, metadata struct, modality join — is real and is what the 100 TB
  * design needs: payload bytes never hit the driver, decode happens inside
  * mapPartitions on executors, and the doc⋈vector join shuffles on the shared
  * id (or broadcasts, when one modality table is dimension-sized).
  */
object Multimodal {

  /** documents ⋈ embeddings by id: one row per asset carrying text stats, a
    * synthetic binary payload (stand-in for image bytes), typed metadata
    * derived from it, and the vector modality's norm. SQL-expressible → full
    * DuckDB oracle. */
  def multimodalJoin(s: SparkSession, d: String): DataFrame = {
    VectorFunctions.register(s)
    val docs = Tables.documents(s, d)
      .withColumn("image", unhex(md5(col("text"))))
      .select(
        col("doc_id"), col("lang"), col("n_chars"),
        col("image"),
        length(col("image")).as("image_bytes"),
        (col("n_chars") % 640 + 32).cast("int").as("meta_width"),
        ((col("n_chars") * 7) % 480 + 32).cast("int").as("meta_height"),
        lit("fake/rgb8").as("meta_format"))
    val vecs = Tables.embeddings(s, d)
      .select(col("vec_id"), col("label"),
        round(expr("sqrt(vec_dot(embedding, embedding))"), 4).as("emb_norm"))
    docs.join(vecs, col("doc_id") === col("vec_id"))
      .select("doc_id", "lang", "n_chars", "image_bytes",
        "meta_width", "meta_height", "meta_format", "label", "emb_norm")
      .orderBy("doc_id")
  }

  /** Video-style frame sampling over an opaque binary payload: each asset
    * carries a frame count in its metadata; `sequence()` + posexplode emit
    * one row per SAMPLED frame (every 2nd — the stride a real pipeline uses
    * to cap decode cost), and the per-frame "decode" is a deterministic stub
    * (md5 over payload-hex + frame index standing in for the frame's pixel
    * hash). The plumbing — metadata-driven fan-out, row-local generation, no
    * payload bytes through the driver — is the real 100 TB shape; only the
    * codec call is stubbed. */
  def multimodalFrames(s: SparkSession, d: String): DataFrame =
    Tables.documents(s, d)
      .withColumn("payload_hex", md5(col("text")))
      .withColumn("n_frames", (col("n_chars") % 8 + 2).cast("int"))
      .select(col("doc_id"), col("n_frames"),
        posexplode(expr("sequence(0, n_frames - 1)")).as(Seq("pos", "frame_idx")),
        col("payload_hex"))
      .filter(col("frame_idx") % 2 === 0)
      .select(col("doc_id"), col("n_frames"), col("frame_idx").cast("int").as("frame_idx"),
        md5(concat(col("payload_hex"), lit("-"), col("frame_idx"))).as("frame_hash"))
      .orderBy("doc_id", "frame_idx")

  /** Partition-batched decode + feature extraction over the binary column.
    * STUB DECODER: a real pipeline would decode image bytes here (JPEG →
    * pixel array) via a vectorized batch UDF; this container has no codec
    * libraries, so the "decode" deterministically treats the payload bytes as
    * the pixel buffer. Everything around it — typed Dataset, mapPartitions
    * batch shape (one iterator per partition, constant memory), executor-side
    * compute — is the real plumbing. Oracle: byte stats of md5 payloads are
    * reproducible in DuckDB-compatible SQL only via blob functions, so this
    * query is rows-only checked; the suite pins exact values instead. */
  def multimodalDecode(s: SparkSession, d: String): DataFrame = {
    import s.implicits._
    val assets = Tables.documents(s, d)
      .withColumn("image", unhex(md5(col("text"))))
      .select(
        col("doc_id"),
        col("image"),
        (col("n_chars") % 640 + 32).cast("int").as("meta_width"),
        ((col("n_chars") * 7) % 480 + 32).cast("int").as("meta_height"))
      .as[Asset]
    assets.mapPartitions { batch =>
      batch.map { a =>
        // --- stub decode: payload bytes stand in for decoded pixels ---
        val px = a.image
        var sum = 0L; var mx = 0; var i = 0
        while (i < px.length) {
          val v = px(i) & 0xff
          sum += v; if (v > mx) mx = v; i += 1
        }
        Decoded(a.doc_id, px.length,
          if (px.length == 0) 0.0 else sum.toDouble / px.length,
          mx, a.meta_width, a.meta_height)
      }
    }.toDF()
      .withColumn("mean_byte", round(col("mean_byte"), 4))
      .orderBy("doc_id")
  }
}
