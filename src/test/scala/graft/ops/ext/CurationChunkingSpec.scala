package graft.ops.ext

import graft.TestSpark
import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

class ChunkingSpec extends AnyFunSuite {
  lazy val spark = TestSpark.spark
  import spark.implicits._

  test("windows tile the token stream with the configured stride") {
    val df = Seq((1L, (1 to 10).map(i => s"t$i").mkString(" ")))
      .toDF("doc_id", "text")
    val got = Chunking.fixedTokenChunks(df, "text", chunkSize = 4, stride = 3)
      .select("chunk_id", "chunk_text", "n_chunk_tokens")
      .as[(Int, String, Int)].collect().sortBy(_._1).toSeq
    assert(got == Seq(
      (0, "t1 t2 t3 t4", 4),
      (1, "t4 t5 t6 t7", 4),
      (2, "t7 t8 t9 t10", 4)))
  }

  test("short and empty docs yield exactly one chunk") {
    val df = Seq((1L, "only two"), (2L, "")).toDF("doc_id", "text")
    val got = Chunking.fixedTokenChunks(df, "text", chunkSize = 64, stride = 48)
      .select("doc_id", "chunk_id", "chunk_text", "n_chunk_tokens")
      .as[(Long, Int, String, Int)].collect().sortBy(_._1).toSeq
    assert(got == Seq((1L, 0, "only two", 2), (2L, 0, "", 0)))
  }

  test("every token position is covered by some chunk") {
    val n = 157
    val df = Seq((1L, (1 to n).map(i => s"w$i").mkString(" ")))
      .toDF("doc_id", "text")
    val covered = Chunking.fixedTokenChunks(df, "text", 64, 48)
      .select("chunk_text").as[String].collect()
      .flatMap(_.split(" ")).toSet
    assert(covered == (1 to n).map(i => s"w$i").toSet)
  }
}

class PackingSpec extends AnyFunSuite {
  lazy val spark = TestSpark.spark
  import spark.implicits._

  private val chunks = Seq(
    // shard 0: token counts 100, 200, 30 -> cum 100, 300, 330
    (0L, 1L, 0, 100L), (0L, 1L, 1, 200L), (0L, 3L, 0, 30L),
    // shard 1: a single chunk larger than two budgets
    (1L, 2L, 0, 600L),
    // zero-token chunk must be ignored
    (0L, 9L, 0, 0L)
  ).toDF("shard", "doc_id", "chunk_id", "n")

  test("spans split across budget cuts; contributions sum to chunk size") {
    val out = Chunking.packSequences(chunks, "shard",
        Seq("doc_id", "chunk_id"), "n", budget = 256)
      .select("shard", "doc_id", "chunk_id", "seq_id", "tok_in_seq")
      .as[(Long, Long, Int, Long, Long)].collect().toSet
    assert(out == Set(
      (0L, 1L, 0, 0L, 100L),            // fits seq 0
      (0L, 1L, 1, 0L, 156L), (0L, 1L, 1, 1L, 44L), // straddles the cut
      (0L, 3L, 0, 1L, 30L),
      (1L, 2L, 0, 0L, 256L), (1L, 2L, 0, 1L, 256L), (1L, 2L, 0, 2L, 88L)))
  }

  test("interior sequences total exactly the budget") {
    val totals = Chunking.packSequences(chunks, "shard",
        Seq("doc_id", "chunk_id"), "n", budget = 256)
      .groupBy("shard", "seq_id").agg(sum("tok_in_seq").as("t"))
      .as[(Long, Long, Long)].collect()
    val maxSeq = totals.groupBy(_._1).view.mapValues(_.map(_._2).max).toMap
    totals.foreach { case (shard, seq, t) =>
      if (seq < maxSeq(shard)) assert(t == 256L, s"interior seq $shard/$seq")
      else assert(t <= 256L)
    }
  }
}

class HybridNearDupSpec extends AnyFunSuite {
  lazy val spark = TestSpark.spark
  import spark.implicits._

  // corpus with a SHORT near-dup pair (below the simhash envelope), a
  // LONG near-dup pair, and unrelated docs — the hybrid must find both
  // pairs; the simhash-only path only the long one
  private def mkCorpus() = {
    val longText = (1 to 80).map(i => s"tok$i").mkString(" ")
    val longMut = (1 to 78).map(i => s"tok$i").mkString(" ")
    val shortText = (1 to 20).map(i => s"s$i").mkString(" ")
    val shortMut = (1 to 19).map(i => s"s$i").mkString(" ")
    val noise = (1 to 50).map(j =>
      (100L + j, (1 to 40).map(i => s"n${j}x$i").mkString(" ")))
    (Seq((1L, longText), (2L, longMut), (3L, shortText), (4L, shortMut)) ++
      noise).toDF("doc_id", "text")
  }

  test("routes short pairs to minhash, long pairs to simhash — finds both") {
    val pairs = Dedup.hybridNearDups(mkCorpus(), "text", "doc_id",
        threshold = 0.8, minTokens = 50)
      .select("id_a", "id_b").as[(Long, Long)].collect().toSet
    assert(pairs == Set((1L, 2L), (3L, 4L)))
  }

  test("simhash-only path scopes to long docs (short pair out of envelope)") {
    val pairs = Dedup.simhashNearDupsVerified(mkCorpus(), "text", "doc_id",
        threshold = 0.8, minTokens = 50)
      .select("id_a", "id_b").as[(Long, Long)].collect().toSet
    assert(pairs == Set((1L, 2L)))
  }
}

class ConnectedComponentsSpec extends AnyFunSuite {
  lazy val spark = TestSpark.spark
  import spark.implicits._

  private def cc(pairs: Seq[(Long, Long)]): Map[Long, Long] =
    Dedup.connectedComponents(pairs.toDF("id_a", "id_b"))
      .as[(Long, Long)].collect().toMap

  test("a chain collapses transitively to its min id") {
    // 1-2, 2-3, 3-4: pairwise dropping would never link 1 and 4
    val got = cc(Seq((1L, 2L), (2L, 3L), (3L, 4L)))
    assert(got == Map(1L -> 1L, 2L -> 1L, 3L -> 1L, 4L -> 1L))
  }

  test("separate components keep separate canonical ids") {
    val got = cc(Seq((5L, 9L), (2L, 7L), (7L, 11L)))
    assert(got == Map(5L -> 5L, 9L -> 5L, 2L -> 2L, 7L -> 2L, 11L -> 2L))
  }

  test("a long chain needs more than one propagation round") {
    val n = 12
    val got = cc((1 until n).map(i => (i.toLong, i.toLong + 1)))
    assert(got == (1 to n).map(i => i.toLong -> 1L).toMap)
  }

  test("star with the center as max id still canonicalizes to min") {
    val got = cc(Seq((1L, 100L), (2L, 100L), (3L, 100L)))
    assert(got == Map(1L -> 1L, 2L -> 1L, 3L -> 1L, 100L -> 1L))
  }
}

/** Star contraction must assign exactly the same components as label
  * propagation — on shapes (chains) where the two differ most in round
  * count, and on seeded random graphs.
  */
class StarContractionSpec extends AnyFunSuite {
  lazy val spark = TestSpark.spark
  import spark.implicits._

  private def ccStar(pairs: Seq[(Long, Long)]): Map[Long, Long] =
    Dedup.connectedComponentsStar(pairs.toDF("id_a", "id_b"))
      .as[(Long, Long)].collect().toMap

  private def ccProp(pairs: Seq[(Long, Long)]): Map[Long, Long] =
    Dedup.connectedComponents(pairs.toDF("id_a", "id_b"))
      .as[(Long, Long)].collect().toMap

  test("chain, star, and two components match label propagation") {
    for (pairs <- Seq(
        (1 until 12).map(i => (i.toLong, i.toLong + 1)),
        Seq((1L, 100L), (2L, 100L), (3L, 100L)),
        Seq((5L, 9L), (2L, 7L), (7L, 11L), (3L, 4L)))) {
      assert(ccStar(pairs) == ccProp(pairs), s"diverged on $pairs")
    }
  }

  test("seeded random graphs match label propagation") {
    val rnd = new scala.util.Random(42)
    for (trial <- 1 to 3) {
      val n = 60
      val pairs = (1 to 80).map { _ =>
        val a = rnd.nextInt(n).toLong
        val b = rnd.nextInt(n).toLong
        (math.min(a, b), math.max(a, b) + 1)
      }.filter(p => p._1 != p._2)
      assert(ccStar(pairs) == ccProp(pairs), s"diverged on trial $trial")
    }
  }

  test("a 40-node chain converges within the default round budget") {
    val got = ccStar((1 until 40).map(i => (i.toLong, i.toLong + 1)))
    assert(got == (1 to 40).map(i => i.toLong -> 1L).toMap)
  }
}

class BloomDecontaminateSpec extends AnyFunSuite {
  lazy val spark = TestSpark.spark
  import spark.implicits._

  test("bloom hits dominate exact overlap; disjoint docs prune to zero") {
    val benchText = (1 to 40).map(i => s"b$i").mkString(" ")
    val corpus = Seq(
      (1L, benchText),                                  // fully contaminated
      (2L, (1 to 40).map(i => s"b$i").mkString(" ") + " extra tail here"),
      (3L, (1 to 40).map(i => s"c$i").mkString(" ")))   // disjoint
      .toDF("doc_id", "text")
    val bench = Seq((100L, benchText)).toDF("doc_id", "text")
    val bloom = Decontaminate.bloomShingleHits(corpus, bench, "text", "doc_id")
      .collect().map(r => r.getLong(0) -> (r.getLong(1), r.getLong(2))).toMap
    val exact = Decontaminate.ngramOverlap(corpus, bench, "text", "doc_id")
      .collect().map(r => r.getLong(0) -> r.getLong(2)).toMap
    // no false negatives: bloom_hits >= exact shared count, every doc
    for ((id, (_, hits)) <- bloom)
      assert(hits >= exact.getOrElse(id, 0L), s"doc $id")
    // doc 1: every shingle shared -> bloom must hit all of them
    assert(bloom(1L)._2 == bloom(1L)._1)
    // disjoint doc prunes to zero (tiny sets: fp mass is negligible)
    assert(bloom(3L)._2 == 0L)
  }
}

class CurationSpec extends AnyFunSuite {
  lazy val spark = TestSpark.spark
  import spark.implicits._

  test("each stage drops exactly the rows it should") {
    val good = (1 to 60).map(i => s"w$i").mkString(" ")
    val benchText = (1 to 60).map(i => s"b$i").mkString(" ")
    val docs = Seq(
      (1L, good, "en"),                       // survives
      (2L, "too short", "en"),                // quality gate
      (3L, good, "de"),                       // exact dup of 1 (larger id)
      (4L, (1 to 58).map(i => s"w$i").mkString(" "), "de"), // near-dup of 1
      (5L, benchText, "de")                   // contaminated vs benchmark
    ).toDF("doc_id", "text", "lang")
    val bench = Seq((100L, benchText)).toDF("doc_id", "text")
    val out = Curation.curate(docs, bench, "text", "doc_id", "lang",
        minTokens = 10, nearDupThreshold = 0.8, contaminationMax = 0.2,
        rates = Map.empty, defaultRate = 1.0)
      .select("doc_id").as[Long].collect().toSet
    assert(out == Set(1L))
  }

  test("near-dup stage canonicalizes clusters, not pairs") {
    // jaccard(1,3) and jaccard(2,3) >= 0.8 but jaccard(1,2) < 0.8: the
    // pair graph is a path 1-3-2, one component. Pairwise larger-id
    // dropping would keep {1, 2}; component canonicalization keeps only
    // the min id 1.
    val base = (1 to 60).map(i => s"w$i")
    val docs = Seq(
      (1L, base.drop(10).mkString(" "), "en"),  // w11..w60
      (2L, base.take(50).mkString(" "), "en"),  // w1..w50
      (3L, base.mkString(" "), "en")            // w1..w60
    ).toDF("doc_id", "text", "lang")
    val bench = Seq((100L, "nothing shared here at all")).toDF("doc_id", "text")
    val out = Curation.curate(docs, bench, "text", "doc_id", "lang",
        minTokens = 10, nearDupThreshold = 0.8, contaminationMax = 0.2,
        rates = Map.empty, defaultRate = 1.0)
      .select("doc_id").as[Long].collect().toSet
    assert(out == Set(1L))
  }

  test("sampling stage respects per-stratum rates deterministically") {
    val docs = (1L to 400L).map(i =>
      (i, s"doc $i " + (1 to 20).map(j => s"u${i}t$j").mkString(" "),
        if (i % 2 == 0) "en" else "fr")).toDF("doc_id", "text", "lang")
    val bench = Seq((9999L, "nothing shared here at all"))
      .toDF("doc_id", "text")
    val out = Curation.curate(docs, bench, "text", "doc_id", "lang",
      minTokens = 5, nearDupThreshold = 0.9, contaminationMax = 0.5,
      rates = Map("en" -> 0.0), defaultRate = 1.0)
    val langs = out.select("lang").as[String].collect()
    assert(!langs.contains("en"))
    assert(langs.count(_ == "fr") == 200)
  }
}
