package graft.ops

import graft.TestSpark
import graft.ops.ext.{CorpusClean, Retrieval, SparseSim, TrainOrder}
import org.scalatest.funsuite.AnyFunSuite

/** Argument contracts for the round-4 operators: bad parameters fail
  * fast with a pointed message, not deep inside a Spark job.
  */
class ArgContractSpec extends AnyFunSuite {
  lazy val spark = TestSpark.spark
  import spark.implicits._

  lazy val docs = Seq((1L, "some text here")).toDF("doc_id", "text")

  test("FuzzyJoin rejects negative maxDist and zero blockPrefix") {
    val df = Seq((1L, "x")).toDF("id", "name")
    intercept[IllegalArgumentException](
      FuzzyJoin.join(df, df, "id", "name", "id", "name", maxDist = -1))
    intercept[IllegalArgumentException](
      FuzzyJoin.join(df, df, "id", "name", "id", "name", blockPrefix = 0))
  }

  test("TrainOrder rejects zero shards") {
    intercept[IllegalArgumentException](
      TrainOrder.shuffled(docs, "doc_id", nShards = 0))
  }

  test("boilerplateStrip rejects minDocs < 2") {
    intercept[IllegalArgumentException](
      CorpusClean.boilerplateStrip(docs, "text", "doc_id", minDocs = 1))
  }

  test("SparseSim rejects bad ngram / threshold / maxDf") {
    intercept[IllegalArgumentException](
      SparseSim.cosineJoin(docs, "text", "doc_id", 0.5, ngram = 0))
    intercept[IllegalArgumentException](
      SparseSim.cosineJoin(docs, "text", "doc_id", 0.0))
    intercept[IllegalArgumentException](
      SparseSim.cosineJoin(docs, "text", "doc_id", 0.5, maxDf = 0L))
  }

  test("Winsorize rejects inverted percentile bounds") {
    val df = Seq(("g", 1.0)).toDF("grp", "v")
    intercept[IllegalArgumentException](
      Winsorize.stats(df, "grp", "v", pLow = 0.9, pHigh = 0.1))
  }

  test("Retrieval rejects empty query and k < 1") {
    intercept[IllegalArgumentException](
      Retrieval.bm25TopK(docs, "text", "doc_id", Seq.empty))
    intercept[IllegalArgumentException](
      Retrieval.bm25TopK(docs, "text", "doc_id", Seq("x"), k = 0))
  }
}
