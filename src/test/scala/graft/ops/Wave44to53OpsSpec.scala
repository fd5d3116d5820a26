package graft.ops

import graft.TestSpark
import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

/** Hand-checkable fixtures for the wave 44–53 operators — textbook
  * cases small enough to verify on paper, beside the DuckDB oracle
  * gate (engine equivalence) these pin textbook correctness.
  */
class Wave44to53OpsSpec extends AnyFunSuite {
  lazy val spark = TestSpark.spark
  import spark.implicits._

  test("signBitWords: known bit pattern packs exactly") {
    val vec = Array.tabulate(64)(i => if (i == 0 || i == 33) 1.0 else -1.0)
    val r = Seq(Tuple1(vec)).toDF("v")
      .select(graft.ops.ext.Similarity.signBitWords(col("v")).as("w"))
      .select("w.lo", "w.hi").head()
    assert(r.getLong(0) == 1L)      // bit 0
    assert(r.getLong(1) == 2L)      // bit 33 -> hi bit 1
  }

  test("binaryQuantRecall: identical corpus gives recall 1") {
    // orthogonal-ish vectors whose sign patterns are unique: hamming
    // and cosine agree on ordering
    val vecs = (0 until 8).map { i =>
      (i.toLong, Array.tabulate(64)(d => if ((d / 8) == i) 1.0 else -1.0))
    }
    val df = vecs.toDF("id", "v")
    val out = graft.ops.ext.Similarity.binaryQuantRecall(
      df, df.filter(col("id") === 0), "v", "id", k = 3).head()
    assert(out.getAs[Double]("recall") >= 2.0 / 3.0,
      s"sign-unique vectors should mostly agree: $out")
  }

  test("minMaxFuse: doc in both lists at top fuses to rank 1") {
    val a = Seq((1L, 10.0), (2L, 5.0), (3L, 1.0)).toDF("doc_id", "score")
    val b = Seq((1L, 7.0), (4L, 3.0), (3L, 1.0)).toDF("doc_id", "score")
    val out = graft.ops.ext.Retrieval.minMaxFuse(a, b, 4).collect()
    assert(out.head.getAs[Long]("doc_id") == 1L)
    assert(out.head.getAs[Boolean]("in_a") &&
      out.head.getAs[Boolean]("in_b"))
  }

  test("queryLikelihoodTopK: the doc with more query terms ranks first") {
    val docs = Seq((1L, "spark spark spark filler filler"),
      (2L, "filler filler filler filler spark"),
      (3L, "nothing relevant here at all")).toDF("id", "text")
    val out = graft.ops.ext.Retrieval.queryLikelihoodTopK(docs, "text",
      "id", Seq("spark"), mu = 10.0, k = 3).collect()
    assert(out.head.getAs[Long]("doc_id") == 1L)
    assert(out.last.getAs[Long]("doc_id") == 3L)
  }

  test("dupRateCurve: fully duplicated corpus rates 1.0 at every n") {
    val docs = Seq.fill(3)("alpha beta gamma delta").toDF("text")
    val out = graft.ops.ext.TextAnalysis.dupRateCurve(docs, "text", 2)
      .collect()
    assert(out.forall(_.getAs[Double]("dup_rate") == 1.0))
  }

  test("modularity: two cliques partitioned correctly score high") {
    val e = Seq((1L, 2L), (2L, 3L), (1L, 3L), (4L, 5L), (5L, 6L),
      (4L, 6L), (3L, 4L)).toDF("src", "dst")
    val comm = Seq((1L, 1L), (2L, 1L), (3L, 1L), (4L, 4L), (5L, 4L),
      (6L, 4L)).toDF("node", "community")
    val q = Graph.modularity(e, comm).head().getAs[Double]("modularity")
    // known value: 2*(3/7 - (7/14)^2) = 0.357142857
    assert(math.abs(q - (2.0 * (3.0 / 7 - 0.25))) < 1e-4, s"Q=$q")
  }

  test("onionLayers: pendant chain peels before the core") {
    // triangle 1-2-3 with pendant path 3-4-5
    val e = Seq((1L, 2L), (2L, 3L), (1L, 3L), (3L, 4L), (4L, 5L))
      .toDF("src", "dst")
    val m = Graph.onionLayers(e, rounds = 4).collect()
      .map(r => r.getAs[Long]("node") -> r.getAs[Long]("layer")).toMap
    assert(m(5L) < m(1L), s"pendant must peel before the triangle: $m")
    assert(m(1L) == m(2L) && m(2L) == m(3L))
  }

  test("nextFitAudit: exact fills waste zero") {
    val docs = (1L to 8L).map(i => (i, 256L)).toDF("id", "len")
    val r = graft.ops.ext.Sharding.nextFitAudit(docs, "id", "len", 512L,
      byLengthDesc = false, shards = 1, strategy = "t").head()
    assert(r.getAs[Long]("n_bins") == 4L)
    assert(r.getAs[Long]("waste_tokens") == 0L)
  }

  test("nextFitAudit: length-desc packs tighter than adversarial arrival") {
    // arrival order 300,300,200,200,100,100: next-fit wastes;
    // sorted desc 300,300,200,200,100,100 same here — use mixed sizes
    val lens = Seq(400L, 200L, 400L, 200L, 100L, 100L)
    val docs = lens.zipWithIndex.map { case (l, i) => (i.toLong, l) }
      .toDF("id", "len")
    def bins(desc: Boolean) = graft.ops.ext.Sharding.nextFitAudit(
      docs, "id", "len", 512L, desc, 1, "t").head().getAs[Long]("n_bins")
    assert(bins(true) <= bins(false))
  }

  test("byAdjust is more conservative than bhAdjust") {
    val ps = (1 to 100).map(i => (i.toLong, i / 100.0)).toDF("id", "p")
    val bh = Hypothesis.bhAdjust(ps, "p", "id", 0.05)
      .filter(col("significant")).count()
    val by = Hypothesis.byAdjust(ps, "p", "id", 0.05)
      .filter(col("significant")).count()
    assert(by <= bh)
  }

  test("cochranQ: identical treatments give Q = 0") {
    val rows = for (s <- 1L to 10L; t <- 0L to 2L)
      yield (s, t, s <= 5)
    val r = Hypothesis.cochranQ(rows.toDF("s", "t", "x"), "s", "t",
      col("x")).head()
    assert(r.getAs[Double]("q_stat") == 0.0)
  }

  test("kruskalWallis: identical groups give H ~ 0") {
    val rows = for (g <- Seq("a", "b", "c"); v <- 1L to 20L)
      yield (g, v)
    val h = NonParam.kruskalWallis(rows.toDF("g", "v"), "g", "v")
      .head().getAs[Double]("h_corrected")
    assert(math.abs(h) < 0.01, s"H=$h")
  }

  test("partialCorrelation: x,y driven only by z partials out to ~0") {
    // x = z + small unique wiggle, y = 2z + different wiggle
    val rows = (1 to 200).map { i =>
      val z = (i % 20).toLong
      (z * 10 + (i % 3), z * 20 + (i % 7), z)
    }
    val r = NonParam.partialCorrelation(rows.toDF("x", "y", "z"),
      "x", "y", "z").head()
    assert(math.abs(r.getAs[Double]("r_xy")) > 0.9, "raw corr is strong")
    assert(math.abs(r.getAs[Double]("partial_r")) < 0.3,
      s"controlling z should collapse it: $r")
  }

  test("token bucket fold: admits at the configured rate") {
    import graft.streaming.Stateful._
    var stored: Option[BucketState] = None
    val st = new org.apache.spark.sql.streaming.GroupState[BucketState] {
      def exists = stored.isDefined
      def get = stored.get
      def getOption = stored
      def update(s: BucketState): Unit = stored = Some(s)
      def remove(): Unit = stored = None
      def hasTimedOut = false
      def setTimeoutDuration(d: Long): Unit = ()
      def setTimeoutDuration(d: String): Unit = ()
      def setTimeoutTimestamp(t: Long): Unit = ()
      def setTimeoutTimestamp(t: Long, a: String): Unit = ()
      def setTimeoutTimestamp(t: java.sql.Date): Unit = ()
      def setTimeoutTimestamp(t: java.sql.Date, a: String): Unit = ()
      def getCurrentWatermarkMs(): Long = 0L
      def getCurrentProcessingTimeMs(): Long = 0L
    }
    // cap 2 tokens, refill 1 token per 100us; 5 events 10us apart:
    // e1 admit (2->1), e2 admit (1.1->0.1), e3 reject (0.2), e4 reject
    // (0.3), e5 admit? 0.4 -> no. Then a late event at +1000us refills.
    val events = (1 to 5).map(i =>
      TimedEvent(1L, i * 10L, i.toLong, 0.0)) :+
      TimedEvent(1L, 2000L, 9L, 0.0)
    val out = updateBucket(2000000L, 100L)(1L, events.iterator, st).toSeq
    assert(out.count(_.admitted) == 3)
    assert(out.take(2).forall(_.admitted))
    assert(out.last.admitted) // the late event after full refill
  }
}
