package graft.ops.ext

import graft.TestSpark
import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

class DedupSpec extends AnyFunSuite {
  lazy val spark = TestSpark.spark
  import spark.implicits._

  val docs = Seq(
    (1L, "the quick brown fox jumps over the lazy dog"),
    (2L, "the quick brown fox jumps over the lazy dog"), // exact dup of 1
    (3L, "the quick brown fox jumps over the lazy cat"), // near dup
    (4L, "completely different words entirely here now")
  ).toDF("doc_id", "text")

  test("exactByHash keeps the min-id row per identical text") {
    val kept = Dedup.exactByHash(docs, "text", "doc_id")
      .select("doc_id").as[Long].collect().toSet
    assert(kept == Set(1L, 3L, 4L))
  }

  test("shingles are sliding distinct hashed word 3-grams") {
    val sh = docs.filter($"doc_id" === 4)
      .select(Dedup.shingles($"text", 3)).head.getSeq[Long](0)
    assert(sh.size == 4) // 6 tokens -> 4 shingles
    assert(sh.distinct.size == 4)
    // deterministic: same text always hashes to the same window set
    val again = docs.filter($"doc_id" === 4)
      .select(Dedup.shingles($"text", 3)).head.getSeq[Long](0)
    assert(sh.toSet == again.toSet)
  }

  test("jaccard of identical sets is 1, disjoint is 0") {
    val df = Seq((Seq("a b c", "b c d"), Seq("a b c", "b c d"),
      Seq("x y z", "y z w"))).toDF("a", "b", "c")
    val r = df.select(Dedup.jaccard($"a", $"b"), Dedup.jaccard($"a", $"c"))
      .head
    assert(r.getDouble(0) == 1.0 && r.getDouble(1) == 0.0)
  }

  test("minhash LSH surfaces near duplicates; exact classes collapse") {
    val pairs = Dedup.minhashNearDups(docs, "text", "doc_id",
      threshold = 0.5)
      .select("id_a", "id_b").as[(Long, Long)].collect().toSet
    assert(pairs == Set((1L, 3L))) // rep of {1,2} pairs with near-dup 3
    val expanded = Dedup.minhashNearDups(docs, "text", "doc_id",
      threshold = 0.5, includeExactDuplicates = true)
      .select("id_a", "id_b", "jaccard")
      .as[(Long, Long, Double)].collect().toSet
    // cross pairs for every member + the within-class pair at jaccard 1
    assert(expanded.map(p => (p._1, p._2)) ==
      Set((1L, 3L), (2L, 3L), (1L, 2L)))
    assert(expanded.collect { case (1L, 2L, j) => j } == Set(1.0))
  }

  test("1000-way exact-duplicate class cannot explode the band join") {
    // pre-pass collapses the class to one representative: candidate
    // generation sees ONE row for the class, not 10^6 band collisions
    val big = (1L to 1000L).map(i => (i, "all copies share this text"))
      .toDF("doc_id", "text")
      .unionByName(Seq(
        (2000L, "all copies share this text here"), // near-dup of the class
        (3000L, "something unrelated entirely different")).toDF("doc_id", "text"))
    val pairs = Dedup.minhashNearDups(big, "text", "doc_id",
      threshold = 0.5)
      .select("id_a", "id_b").as[(Long, Long)].collect().toSet
    assert(pairs == Set((1L, 2000L))) // representative carries the class
  }

  test("identical docs share a simhash; distinct docs differ") {
    val fp = Dedup.simhash(docs, "text", "doc_id")
      .collect().map(r => r.getLong(0) -> r.getLong(1)).toMap
    assert(fp(1L) == fp(2L))
    val hd = java.lang.Long.bitCount(fp(1L) ^ fp(4L))
    assert(hd > 10) // unrelated docs far apart in hamming space
  }
}

class SimilaritySpec extends AnyFunSuite {
  lazy val spark = TestSpark.spark
  import spark.implicits._

  test("dot/cosine match hand-computed values") {
    val df = Seq((Seq(1.0, 2.0, 3.0), Seq(4.0, 5.0, 6.0)))
      .toDF("a", "b")
    val r = df.select(Similarity.dot($"a", $"b"),
      Similarity.cosine($"a", $"a")).head
    assert(r.getDouble(0) == 32.0)
    assert(math.abs(r.getDouble(1) - 1.0) < 1e-12)
  }

  test("bruteForceTopK ranks the most similar vector first") {
    val corpus = Seq(
      (1L, Seq(1.0f, 0.0f)), (2L, Seq(0.9f, 0.1f)),
      (3L, Seq(0.0f, 1.0f)), (4L, Seq(-1.0f, 0.0f)))
      .toDF("vec_id", "embedding")
    val queries = corpus.filter($"vec_id" === 1)
    val top = Similarity.bruteForceTopK(corpus, queries,
      "embedding", "vec_id", k = 2).collect()
    assert(top.map(_.getLong(2)).toSeq == Seq(2L, 3L)) // by cosine desc
    assert(top.head.getInt(1) == 1)
  }

  test("lshBucket is deterministic across evaluations") {
    val df = Seq(Tuple1(Seq(0.5, -0.25, 1.0))).toDF("v")
    val b1 = df.select(Similarity.lshBucket($"v", 8)).head.getLong(0)
    val b2 = df.select(Similarity.lshBucket($"v", 8)).head.getLong(0)
    assert(b1 == b2)
  }
}

class TextAnalysisSpec extends AnyFunSuite {
  lazy val spark = TestSpark.spark
  import spark.implicits._

  test("langId picks the language with most stopword hits") {
    val df = Seq(
      (1, "the cat and the dog of the house"),
      (2, "der hund und die katze ist nicht hier"),
      (3, "xyzzy plugh qwerty")).toDF("id", "text")
    val out = df.select($"id", TextAnalysis.langId($"text")).collect()
      .map(r => r.getInt(0) -> r.getString(1)).toMap
    assert(out(1) == "en" && out(2) == "de" && out(3) == "und")
  }

  test("fingerprint matches a hand-rolled polynomial hash") {
    val expected = "ab".foldLeft(0L)((h, c) => (h * 31 + c.toInt) % 1000000007L)
    val got = Seq(Tuple1("ab")).toDF("text")
      .select(TextAnalysis.fingerprint($"text")).head.getLong(0)
    assert(got == expected)
  }

  test("token counts ignore empty splits") {
    val df = Seq(Tuple1("  two   words  ")).toDF("text")
    assert(df.select(TextAnalysis.tokenCount($"text")).head.getInt(0) == 2)
  }

  test("topTokens orders by count desc then token") {
    val df = Seq(Tuple1("b b a a c")).toDF("text")
    val top = TextAnalysis.topTokens(df, "text", 2).collect()
      .map(_.getString(0)).toSeq
    assert(top == Seq("a", "b")) // both count 2, lexicographic
  }

  test("quality score is bounded [0,1]") {
    val df = Seq(Tuple1("the and of to in is that it was for more text")).toDF("text")
    val s = TextAnalysis.qualityFeatures(df, "text")
      .select("quality_score").head.getDouble(0)
    assert(s >= 0.0 && s <= 1.0)
  }
}

class SamplingSpec extends AnyFunSuite {
  lazy val spark = TestSpark.spark
  import spark.implicits._

  test("thresholdHex maps rates to fixed-width lowercase hex") {
    assert(Sampling.thresholdHex(0.5) == "80000000")
    assert(Sampling.thresholdHex(0.125) == "20000000")
    assert(Sampling.thresholdHex(0.0) == "00000000")
    assert(Sampling.thresholdHex(1.0) == "ffffffff")
  }

  test("hash sample is deterministic and near the nominal rate") {
    val ids = (1L to 4000L).toDF("id")
    val once = Sampling.sample(ids, "id", 0.25).as[Long].collect().toSet
    val again = Sampling.sample(ids, "id", 0.25).as[Long].collect().toSet
    assert(once == again)
    assert(math.abs(once.size / 4000.0 - 0.25) < 0.03)
  }

  test("rate-0.25 sample is a subset of the rate-0.5 sample") {
    // threshold sampling nests: raising the rate only ADDS rows — the
    // property that makes staged corpus scale-ups reproducible
    val ids = (1L to 2000L).toDF("id")
    val small = Sampling.sample(ids, "id", 0.25).as[Long].collect().toSet
    val large = Sampling.sample(ids, "id", 0.5).as[Long].collect().toSet
    assert(small.subsetOf(large))
  }

  test("weighted sample: weight 0 drops all, 1 keeps all, mid is between") {
    val df = (1L to 2000L).toDF("id")
    assert(Sampling.weightedSample(df, "id", lit(0.0)).count() == 0)
    assert(Sampling.weightedSample(df, "id", lit(1.0)).count() == 2000)
    val mid = Sampling.weightedSample(df, "id", lit(0.3)).count()
    assert(math.abs(mid / 2000.0 - 0.3) < 0.05)
    // deterministic: same key set both times
    val a = Sampling.weightedSample(df, "id", lit(0.3)).as[Long].collect().toSet
    val b = Sampling.weightedSample(df, "id", lit(0.3)).as[Long].collect().toSet
    assert(a == b)
  }

  test("stratified rates apply per stratum with default fallback") {
    val df = (1L to 3000L).map(i =>
      (i, if (i % 3 == 0) "a" else if (i % 3 == 1) "b" else "c"))
      .toDF("id", "s")
    val out = Sampling.stratifiedSample(df, "id", "s",
      Map("a" -> 1.0, "b" -> 0.0), defaultRate = 0.5)
      .groupBy("s").count().as[(String, Long)].collect().toMap
    assert(out("a") == 1000L)
    assert(!out.contains("b"))
    assert(math.abs(out("c") / 1000.0 - 0.5) < 0.06)
  }
}

class MultimodalSpec extends AnyFunSuite {
  lazy val spark = TestSpark.spark

  test("format sniffing from magic bytes + byte-stat fallback") {
    val dir = java.nio.file.Files.createTempDirectory("graft-mm")
    // truncated payloads: magic sniffs, decode falls back to byte stats
    java.nio.file.Files.write(dir.resolve("x.png"),
      Array[Int](0x89, 0x50, 0x4E, 0x47, 0x0D, 0x0A, 0x1A, 0x0A, 1, 2, 3)
        .map(_.toByte))
    java.nio.file.Files.write(dir.resolve("y.jpg"),
      Array[Int](0xFF, 0xD8, 0xFF, 0xE0, 9, 9).map(_.toByte))
    val feats = Multimodal.decodeFeatures(
      Multimodal.readBinary(spark, dir.toString)).collect()
    val byName = feats.map(r => r.getString(0).split('/').last -> r).toMap
    assert(byName("x.png").getString(1) == "png"
      && byName("y.jpg").getString(1) == "jpeg")
    assert(feats.forall(r => r.isNullAt(3) && r.getSeq[Double](6).nonEmpty))
  }

  test("real PNG decode: exact dimensions and channel means") {
    val dir = java.nio.file.Files.createTempDirectory("graft-mm-png")
    val img = new java.awt.image.BufferedImage(8, 4,
      java.awt.image.BufferedImage.TYPE_INT_RGB)
    for (y <- 0 until 4; x <- 0 until 8)
      img.setRGB(x, y, (10 << 16) | (20 << 8) | (x + y)) // r=10 g=20 b=x+y
    javax.imageio.ImageIO.write(img, "png", dir.resolve("p.png").toFile)
    val r = Multimodal.decodeFeatures(
      Multimodal.readBinary(spark, dir.toString)).head
    assert(r.getInt(3) == 8 && r.getInt(4) == 4)
    val feat = r.getSeq[Double](6)
    val expB = (for (y <- 0 until 4; x <- 0 until 8) yield x + y)
      .sum.toDouble / 32
    assert(feat == Seq(10.0, 20.0, expB))
  }

  test("real WAV decode: frame count and sample mean") {
    val dir = java.nio.file.Files.createTempDirectory("graft-mm-wav")
    val samples = Array.tabulate(100)(i => (i % 256).toByte)
    val afmt = new javax.sound.sampled.AudioFormat(8000f, 8, 1, false, false)
    val ais = new javax.sound.sampled.AudioInputStream(
      new java.io.ByteArrayInputStream(samples), afmt, samples.length.toLong)
    javax.sound.sampled.AudioSystem.write(ais,
      javax.sound.sampled.AudioFileFormat.Type.WAVE,
      dir.resolve("w.wav").toFile)
    val r = Multimodal.decodeFeatures(
      Multimodal.readBinary(spark, dir.toString)).head
    assert(r.getString(1) == "wav")
    assert(r.getInt(5) == 100)
    assert(r.getSeq[Double](6).head == (0 until 100).sum.toDouble / 100)
  }
}
