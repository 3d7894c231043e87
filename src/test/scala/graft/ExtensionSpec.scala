package graft

import org.apache.spark.sql.functions._
import graft.queries.{Dedup, Similarity, Multimodal}

/** Property-style checks for the oracle-omitted extension operators:
  * MinHash estimates track true Jaccard, LSH recalls a usable fraction of
  * brute-force neighbors, the stub decoder's features match a by-hand
  * recomputation, and VecDot agrees with scalar math. */
class ExtensionSpec extends SparkSpec {
  import spark.implicits._

  test("vec_dot matches a hand-rolled dot product (interpreted and codegen)") {
    functions.VectorFunctions.register(spark)
    val df = Seq(
      (Array(1.0f, 2.0f, 3.0f), Array(4.0f, 5.0f, 6.0f)),
      (Array(0.5f, -0.5f), Array(2.0f, 2.0f))
    ).toDF("a", "b")
    val got = df.selectExpr("vec_dot(a, b)").as[Double].collect().toSeq
    assert(math.abs(got(0) - 32.0) < 1e-12)
    assert(math.abs(got(1) - 0.0) < 1e-12)
  }

  test("minhash estimated Jaccard tracks exact shingle Jaccard") {
    val est = Dedup.dedupMinhash(spark, sf)
      .select("id_a", "id_b", "est_jaccard")
      .as[(Long, Long, Double)].collect()
      .map { case (a, b, j) => (a, b) -> j }.toMap
    assert(est.nonEmpty, "minhash should surface candidate pairs")
    // exact Jaccard over the same 3-gram shingle sets for the candidates
    val docs = Tables.documents(spark, sf)
      .select(col("doc_id"), expr(
        """CASE WHEN size(split(text, ' ')) >= 3 THEN
          |  array_distinct(transform(sequence(1, size(split(text, ' ')) - 2),
          |    i -> concat(element_at(split(text, ' '), i), ' ',
          |                element_at(split(text, ' '), i + 1), ' ',
          |                element_at(split(text, ' '), i + 2))))
          |ELSE array() END""".stripMargin).as("sh"))
      .as[(Long, Seq[String])].collect().map(t => t._1 -> t._2.toSet).toMap
    val errs = est.map { case ((a, b), j) =>
      val sa = docs(a); val sb = docs(b)
      val exact = sa.intersect(sb).size.toDouble / sa.union(sb).size
      math.abs(exact - j)
    }
    assert(errs.sum / errs.size < 0.25,
      s"mean |exact - estimated| Jaccard error too high: ${errs.sum / errs.size}")
  }

  test("LSH kNN recalls a usable fraction of brute-force neighbors") {
    val bf = Similarity.knnBruteForce(spark, sf)
      .select("q_id", "c_id").as[(Long, Long)].collect().toSet
    val lsh = Similarity.knnLsh(spark, sf)
      .select("q_id", "c_id").as[(Long, Long)].collect().toSet
    val recall = bf.intersect(lsh).size.toDouble / bf.size
    // random near-orthogonal vectors are the adversarial case for
    // hyperplane LSH; just assert it finds a real fraction, not noise
    assert(recall >= 0.15, s"recall@5 = $recall")
    assert(lsh.nonEmpty)
  }

  test("embedding dedup LSH blocking: perfect precision, usable recall vs exact all-pairs") {
    functions.VectorFunctions.register(spark)
    val e = Tables.embeddings(spark, sf)
    val a = e.select(col("vec_id").as("id_a"), col("embedding").as("va"))
    val b = e.select(col("vec_id").as("id_b"), col("embedding").as("vb"))
    val exact = a.join(b, col("id_a") < col("id_b"))
      .withColumn("cos", expr(
        "vec_dot(va, vb) / (sqrt(vec_dot(va, va)) * sqrt(vec_dot(vb, vb)))"))
      .filter(col("cos") >= 0.25)
      .select("id_a", "id_b").as[(Long, Long)].collect().toSet
    val lsh = Dedup.dedupEmbedding(spark, sf)
      .select("id_a", "id_b").as[(Long, Long)].collect().toSet
    // precision is exactly 1 by construction (exact-cosine residual filter)
    assert(lsh.subsetOf(exact), "every returned pair must be a true near-dup")
    val recall = lsh.size.toDouble / exact.size
    // these vectors are random near-orthogonal Gaussians, so τ=0.25 pairs are
    // the weak-similarity tail — the hardest case for hyperplane LSH; the old
    // id-modulo blocking recalled exactly 1/16 ≈ 0.0625 regardless of τ
    assert(recall >= 0.5, s"hyperplane-LSH recall = $recall")
  }

  test("IVF kNN recalls most brute-force neighbors with nprobe=3 of 10 lists") {
    val bf = Similarity.knnBruteForce(spark, sf)
      .select("q_id", "c_id").as[(Long, Long)].collect().toSet
    val ivf = Similarity.knnIvf(spark, sf)
      .select("q_id", "c_id").as[(Long, Long)].collect().toSet
    val recall = bf.intersect(ivf).size.toDouble / bf.size
    assert(recall >= 0.2, s"IVF recall@5 = $recall")
  }

  test("vec_dot resolves through the SQL function registry") {
    // GraftExtensions wires the same builder at session build time
    // (spark.sql.extensions=graft.functions.GraftExtensions); here the
    // registry path is exercised in the shared session.
    functions.VectorFunctions.register(spark)
    val v = spark.sql("SELECT vec_dot(array(CAST(1 AS FLOAT), CAST(2 AS FLOAT)), " +
      "array(CAST(3 AS FLOAT), CAST(4 AS FLOAT))) AS d")
      .collect()(0).getDouble(0)
    assert(math.abs(v - 11.0) < 1e-12)
    // the extensions hook itself must at least be constructible and applicable
    new functions.GraftExtensions().apply(new org.apache.spark.sql.SparkSessionExtensions)
  }

  test("register() and GraftExtensions expose the IDENTICAL function-name set") {
    // VERDICT r11 finding 2: the two registration paths drifted (xx64_array
    // was registered but not injected). Both now consume
    // VectorFunctions.builders; this pins that (a) every builder name
    // resolves through the session registry after register(), and (b) the
    // extensions path injects exactly the builder-name set — read back from
    // the SparkSessionExtensions instance, so a future hand-added
    // injectFunction call outside the table is caught too.
    val names = functions.VectorFunctions.builders.map(_._1).toSet
    functions.VectorFunctions.register(spark)
    import org.apache.spark.sql.catalyst.FunctionIdentifier
    names.foreach { n =>
      assert(spark.sessionState.functionRegistry.functionExists(FunctionIdentifier(n)),
        s"register() did not register $n")
    }
    val ext = new org.apache.spark.sql.SparkSessionExtensions
    new functions.GraftExtensions().apply(ext)
    val injected = ext.getClass.getDeclaredFields.collectFirst {
      case f if f.getName.contains("injectedFunctions") =>
        f.setAccessible(true)
        f.get(ext).asInstanceOf[scala.collection.mutable.Buffer[
          (FunctionIdentifier, org.apache.spark.sql.catalyst.expressions.ExpressionInfo,
            Seq[org.apache.spark.sql.catalyst.expressions.Expression] =>
              org.apache.spark.sql.catalyst.expressions.Expression)]]
          .map(_._1.funcName).toSet
    }.getOrElse(fail("SparkSessionExtensions.injectedFunctions field not found"))
    assert(injected == names,
      s"extension path drifted: missing ${names -- injected}, extra ${injected -- names}")
  }

  test("rolling_hash matches a by-hand polynomial fold") {
    functions.VectorFunctions.register(spark)
    def ref(s: String): Long = {
      var h = 1125899906842597L
      s.getBytes("UTF-8").foreach(b => h = h * 31L + b)
      h
    }
    val got = Seq("hello world", "", "graft").toDF("t")
      .selectExpr("rolling_hash(t)").as[Long].collect().toSeq
    assert(got == Seq(ref("hello world"), ref(""), ref("graft")))
  }

  test("GI01 decoder equals a by-hand parse of the container") {
    val decoded = Multimodal.multimodalDecode(spark, sf)
      .filter(col("doc_id") === 0)
      .select("width", "height", "n_pixels", "mean_px", "max_px", "min_px", "frac_bright")
      .as[(Int, Int, Int, Double, Int, Int, Double)].head()
    val (text, nChars) = Tables.documents(spark, sf)
      .filter(col("doc_id") === 0).select("text", "n_chars")
      .as[(String, Long)].head()
    // by-hand model of the fixture: 5 chained md5 digests, truncated to w*h
    val w = (nChars % 8 + 4).toInt; val h = 6
    val buf = (0 until 5).flatMap { i =>
      java.security.MessageDigest.getInstance("MD5")
        .digest(s"$text-$i".getBytes("UTF-8"))
    }.take(w * h).map(_ & 0xff)
    assert(decoded._1 == w && decoded._2 == h && decoded._3 == w * h)
    assert(math.abs(decoded._4 - math.rint(buf.sum.toDouble / (w * h) * 10000) / 10000) < 1e-9)
    assert(decoded._5 == buf.max && decoded._6 == buf.min)
    assert(math.abs(decoded._7 -
      math.rint(buf.count(_ >= 128).toDouble / (w * h) * 10000) / 10000) < 1e-9)
  }

  test("GI01 decoder rejects corrupt containers (real parse, not metadata echo)") {
    import spark.implicits._
    val bad = Seq(
      queries.Asset(1L, "XX01".getBytes("UTF-8") ++ Array[Byte](2, 2, 0, 0, 0, 0)))
      .toDS()
    val ex = intercept[org.apache.spark.SparkException] {
      bad.mapPartitions(Multimodal.decodeIterator).collect()
    }
    assert(ex.getMessage.contains("magic") ||
      Option(ex.getCause).exists(_.getMessage.contains("magic")))
    val truncated = Seq(
      queries.Asset(2L, "GI01".getBytes("UTF-8") ++ Array[Byte](3, 3, 1, 2, 3)))
      .toDS()
    val ex2 = intercept[org.apache.spark.SparkException] {
      truncated.mapPartitions(Multimodal.decodeIterator).collect()
    }
    assert(ex2.getMessage.contains("truncated") ||
      Option(ex2.getCause).exists(_.getMessage.contains("truncated")))
  }

  test("flagship entry returns rows") {
    assert(SparkEntry.entry(spark).count() > 0)
  }

  test("Graft facade word count equals a Scala-collections model") {
    val got = api.Graft.wordCount(Tables.documents(spark, sf), "text")
      .as[(String, Long)].collect().toMap
    val model = Tables.documents(spark, sf).select("text").as[String].collect()
      .flatMap(_.split(" ")).filter(_.nonEmpty)
      .groupBy(identity).map { case (w, ws) => w -> ws.length.toLong }
    assert(got == model)
  }

  test("Graft facade cosineTopK agrees with the registry brute-force query") {
    val e = Tables.embeddings(spark, sf)
    val facade = api.Graft.cosineTopK(
        e.select(col("vec_id"), col("embedding")),
        e.filter(col("vec_id") < 10).select(col("vec_id"), col("embedding")),
        "vec_id", "embedding", k = 5)
      .select("q_id", "rn", "c_id", "cos_sim")
      .as[(Long, Int, Long, Double)].collect().toSet
    val registry = queries.Similarity.knnBruteForce(spark, sf)
      .select("q_id", "rn", "c_id", "cos_sim")
      .as[(Long, Int, Long, Double)].collect().toSet
    assert(facade == registry)
  }
}
