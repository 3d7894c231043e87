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
