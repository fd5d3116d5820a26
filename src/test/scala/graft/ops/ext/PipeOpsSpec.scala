package graft.ops.ext

import graft.TestSpark
import graft.ops.Cdc
import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

class SpanDedupSpec extends AnyFunSuite {
  lazy val spark = TestSpark.spark
  import spark.implicits._

  test("spans shared across docs are counted; doc-internal repeats are not") {
    val df = Seq(
      (1L, "a b c d"),       // spans: "a b c", "b c d"
      (2L, "a b c x"),       // spans: "a b c", "b c x"
      (3L, "z z"),           // short doc: single whole-doc span
      (4L, "p q r p q r")    // internal repeat: distinct spans only
    ).toDF("doc_id", "text")
    val got = SpanDedup.spanStats(df, "text", "doc_id", w = 3)
      .select("doc_id", "n_spans", "n_dup_spans", "dup_frac")
      .as[(Long, Long, Long, Double)].collect().sortBy(_._1).toSeq
    assert(got == Seq(
      (1L, 2L, 1L, 0.5),
      (2L, 2L, 1L, 0.5),
      (3L, 1L, 0L, 0.0),
      (4L, 3L, 0L, 0.0))) // p q r / q r p / r p q — each unique
  }

  test("dropDuplicatedSpans removes every doc touching a shared span") {
    val df = Seq((1L, "a b c d"), (2L, "a b c x"), (3L, "z z"))
      .toDF("doc_id", "text")
    val kept = SpanDedup.dropDuplicatedSpans(df, "text", "doc_id", w = 3)
      .select("doc_id").as[Long].collect().toSet
    assert(kept == Set(3L))
  }
}

class LmScoreSpec extends AnyFunSuite {
  lazy val spark = TestSpark.spark
  import spark.implicits._

  test("unigram NLL matches the closed form on a hand corpus") {
    // counts: a=2 b=2 c=1; N=5, V=3; smoothed p(t) = (c_t+1)/8
    val df = Seq((1L, "a a b"), (2L, "b c")).toDF("doc_id", "text")
    val got = LmScore.unigramNll(df, "text", "doc_id")
      .select("doc_id", "n_tokens", "nll")
      .as[(Long, Long, Double)].collect().sortBy(_._1).toSeq
    val exp1 = math.log(8) - math.log(3) // all tokens have c+1 = 3
    val exp2 = math.log(8) - (math.log(3) + math.log(2)) / 2
    assert(got.map(_._1) == Seq(1L, 2L))
    assert(got.map(_._2) == Seq(3L, 2L))
    assert(math.abs(got(0)._3 - exp1) < 1e-6)
    assert(math.abs(got(1)._3 - exp2) < 1e-6)
  }

  test("rarer tokens score higher NLL") {
    val df = Seq((1L, "common common common rare"), (2L, "common common"))
      .toDF("doc_id", "text")
    val nll = LmScore.unigramNll(df, "text", "doc_id")
      .select("doc_id", "nll").as[(Long, Double)].collect().toMap
    assert(nll(1L) > nll(2L))
  }
}

class MixtureSpec extends AnyFunSuite {
  lazy val spark = TestSpark.spark
  import spark.implicits._

  private val docs = (1 to 8).map(i => (i.toLong, if (i <= 6) "en" else "de"))
    .toDF("id", "lang")

  test("rebalances to the largest total satisfying the target mixture") {
    // en: 6 rows, de: 2 rows; targets 0.75/0.25 -> T = min(8, 8) = 8
    // -> take en 6, de 2 (already balanced)
    val kept = Mixture.rebalance(docs, "id", "lang",
      Map("en" -> 0.75, "de" -> 0.25))
    assert(kept.count() == 8)
    // targets 0.5/0.5 -> T = min(12, 4) = 4 -> take 2 + 2
    val even = Mixture.rebalance(docs, "id", "lang",
      Map("en" -> 0.5, "de" -> 0.5))
    val byLang = even.groupBy("lang").count()
      .as[(String, Long)].collect().toMap
    assert(byLang == Map("en" -> 2L, "de" -> 2L))
  }

  test("selection is deterministic and strata outside the map are dropped") {
    val a = Mixture.rebalance(docs, "id", "lang", Map("en" -> 1.0))
      .select("id").as[Long].collect().toSet
    val b = Mixture.rebalance(docs, "id", "lang", Map("en" -> 1.0))
      .select("id").as[Long].collect().toSet
    assert(a == b)
    assert(a.subsetOf((1L to 6L).toSet)) // no de rows
  }
}

class SemDedupSpec extends AnyFunSuite {
  lazy val spark = TestSpark.spark
  import spark.implicits._

  test("drops higher-id near-parallel cluster-mates, keeps the rest") {
    val df = Seq(
      (0L, Seq(1.0, 0.0)),   // centroid of cluster 0
      (1L, Seq(1.0, 0.01)),  // ~parallel to id 0 -> dropped
      (2L, Seq(0.0, 1.0)),   // centroid of cluster 2
      (3L, Seq(0.01, 1.0))   // ~parallel to id 2 -> dropped
    ).toDF("vec_id", "embedding")
    val kept = SemDedup.semDedup(df, "embedding", "vec_id",
      centroidEvery = 2, tau = 0.99)
      .as[(Long, Long)].collect().toSet
    assert(kept == Set((0L, 0L), (2L, 2L)))
  }

  test("orthogonal members of one cluster all survive") {
    val df = Seq(
      (0L, Seq(1.0, 0.0, 0.0)),
      (1L, Seq(0.9, 0.1, 0.0)), // same cluster, cosine ~0.994 < tau
      (2L, Seq(0.9, 0.0, 0.1))
    ).toDF("vec_id", "embedding")
    val kept = SemDedup.semDedup(df, "embedding", "vec_id",
      centroidEvery = 100, tau = 0.999) // single centroid = id 0
      .select("vec_id").as[Long].collect().toSet
    assert(kept == Set(0L, 1L, 2L))
  }
}

class ShardingSpec extends AnyFunSuite {
  lazy val spark = TestSpark.spark
  import spark.implicits._

  private val docs = (1 to 200)
    .map(i => (i.toLong, (i % 37 + 1).toLong)).toDF("id", "toks")

  test("two-level prefix sum matches the single-window reference") {
    val got = Sharding.assignShards(docs, "id", "toks", budget = 100L)
      .select("id", "shard").as[(Long, Long)].collect().toMap
    // reference: one global scan in md5(id) order
    val ordered = docs.as[(Long, Long)].collect()
      .map { case (id, t) =>
        (org.apache.commons.codec.digest.DigestUtils.md5Hex(id.toString)
          .substring(0, 8), id, t)
      }.sortBy(r => (r._1, r._2))
    var cum = 0L
    val exp = ordered.map { case (_, id, t) =>
      val shard = cum / 100L; cum += t; id -> shard
    }.toMap
    assert(got == exp)
  }

  test("shard-partitioned parquet write round-trips (the CLI shard flow)") {
    val out = java.nio.file.Files
      .createTempDirectory("graft-shards").toString
    Sharding.assignShards(docs, "id", "toks", budget = 100L)
      .write.mode("overwrite").partitionBy("shard").parquet(out)
    val back = spark.read.parquet(out)
    assert(back.count() == 200)
    // partition pruning: one shard's scan reads only that directory
    val one = back.filter(col("shard") === 0)
    val scanned = one.queryExecution.executedPlan.toString
    assert(one.count() > 0)
    assert(scanned.contains("PartitionFilters: [isnotnull(shard"),
      s"shard filter did not prune partitions:\n$scanned")
  }

  test("manifest conserves docs and tokens; shards are contiguous") {
    val m = Sharding.shardManifest(docs, "id", "toks", budget = 100L)
      .as[(Long, Long, Long)].collect().sortBy(_._1)
    assert(m.map(_._2).sum == 200L)
    assert(m.map(_._3).sum == docs.as[(Long, Long)].collect().map(_._2).sum)
    assert(m.map(_._1).toSeq == m.indices.map(_.toLong))
  }
}

class PipeArgContractSpec extends AnyFunSuite {
  lazy val spark = TestSpark.spark
  import spark.implicits._

  private lazy val df = Seq((1L, "x", "en")).toDF("id", "text", "lang")

  test("bad arguments fail fast with named errors, not downstream NPEs") {
    val e1 = intercept[IllegalArgumentException] {
      Mixture.rebalance(df, "id", "lang", Map.empty)
    }
    assert(e1.getMessage.contains("weights"))
    val e2 = intercept[IllegalArgumentException] {
      Mixture.rebalance(df, "id", "lang", Map("en" -> 0.0))
    }
    assert(e2.getMessage.contains("positive"))
    val e3 = intercept[IllegalArgumentException] {
      Sharding.assignShards(df.withColumn("t", lit(1L)), "id", "t", 0L)
    }
    assert(e3.getMessage.contains("budget"))
    val e4 = intercept[IllegalArgumentException] {
      KMeans.lloyd(Seq((1L, Seq(1.0))).toDF("vec_id", "embedding"),
        "embedding", "vec_id", 1, 0)
    }
    assert(e4.getMessage.contains("round"))
  }
}

class CdcSpec extends AnyFunSuite {
  lazy val spark = TestSpark.spark
  import spark.implicits._

  test("latest seq wins; deletes remove; untouched keys pass through") {
    val snap = Seq((1L, "a", 10.0), (2L, "b", 20.0), (3L, "c", 30.0),
      (4L, "d", 40.0)).toDF("k", "name", "price")
    val changes = Seq(
      (1L, "a2", 11.0, 1L, "U"),            // update
      (2L, "b", 20.0, 1L, "D"),             // delete
      (3L, "c2", 31.0, 1L, "U"),            // update...
      (3L, "c2", 31.0, 2L, "D"),            // ...then delete
      (5L, "e", 50.0, 1L, "U")              // insert (new key)
    ).toDF("k", "name", "price", "seq", "op")
    val got = Cdc.applyChangelog(snap, changes, "k", "seq", "op")
      .as[(Long, String, Double)].collect().toSet
    assert(got == Set((1L, "a2", 11.0), (4L, "d", 40.0), (5L, "e", 50.0)))
  }
}
