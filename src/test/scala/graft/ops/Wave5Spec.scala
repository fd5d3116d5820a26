package graft.ops

import graft.TestSpark
import graft.io.Layout
import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

/** Unit suite for the wave-5 profiling/layout operators: z-order key
  * bit math, key discovery, correlation, histogram edges, drift
  * smoothing, prune estimation, MAD outliers.
  */
class Wave5Spec extends AnyFunSuite {
  lazy val spark = TestSpark.spark
  import spark.implicits._

  test("zorderKey interleaves bits (a even positions, b odd)") {
    val df = Seq((0L, 0L), (1L, 0L), (0L, 1L), (3L, 5L), (255L, 255L))
      .toDF("a", "b")
    val got = df.select(Layout.zorderKey(col("a"), col("b"), 8).as("z"))
      .as[Long].collect().toSeq
    def morton(a: Long, b: Long): Long =
      (0 until 8).map(i => (((a >> i) & 1) << (2 * i)) |
        (((b >> i) & 1) << (2 * i + 1))).reduce(_ | _)
    val want = Seq((0L, 0L), (1L, 0L), (0L, 1L), (3L, 5L), (255L, 255L))
      .map((morton _).tupled)
    assert(got == want)
    assert(want(1) == 1L && want(2) == 2L) // a → even bit, b → odd bit
    assert(want(4) == 65535L)              // 8+8 bits fully set
  }

  test("keyCandidates: unique no-null column is a key, others are not") {
    val df = Seq((1L, Some("x"), "a"), (2L, None, "a"), (3L, Some("y"), "b"))
      .toDF("id", "opt", "grp")
    val rows = Profile.keyCandidates(df).collect()
      .map(r => r.getString(0) -> ((r.getLong(1), r.getLong(2),
        r.getBoolean(3)))).toMap
    assert(rows("id") == ((3L, 0L, true)))
    assert(rows("opt") == ((2L, 1L, false))) // null breaks the key
    assert(rows("grp") == ((2L, 0L, false)))
  }

  test("correlationPairs matches a hand-computed Pearson") {
    // y = 2x exactly → corr 1; z anti-monotone in x → corr -1
    val df = Seq((1.0, 2.0, 3.0), (2.0, 4.0, 2.0), (3.0, 6.0, 1.0))
      .toDF("x", "y", "z")
    val got = Profile.correlationPairs(df, Seq("x", "y", "z")).collect()
      .map(r => (r.getString(0), r.getString(1)) -> r.getDouble(2)).toMap
    assert(got(("x", "y")) == 1.0)
    assert(got(("x", "z")) == -1.0)
    assert(got(("y", "z")) == -1.0)
  }

  test("histogram: max lands in last bucket, counts sum to n") {
    val df = (0 until 100).map(_.toDouble).toDF("v")
    val h = Profile.histogram(df, "v", 10).collect()
      .map(r => r.getLong(0) -> r.getLong(3)).toMap
    assert(h.keys.max == 9L && h.keys.min == 0L)
    assert(h.values.sum == 100L)
    // 99.0 (the max) is in bucket 9 via the least() edge rule, so the
    // last bucket holds [89.1, 99.0] → 10 values; interior buckets 10
    assert(h(9L) == 10L)
  }

  test("categoryDrift: identical distributions have zero KL, one-sided category drifts") {
    val l = Seq("a", "a", "b", "c").toDF("cat")
    val r = Seq("a", "a", "b", "b").toDF("cat")
    val rows = Profile.categoryDrift(l, r, "cat").collect()
      .map(x => x.getString(0) -> x).toMap
    // category c present only left: cnt_r coalesces to 0, KL finite
    assert(rows("c").getLong(2) == 0L)
    assert(rows("c").getDouble(5) > 0.0) // kl_pq positive for over-represented
    val same = Profile.categoryDrift(l, l, "cat").collect()
    assert(same.forall(r => r.getDouble(5) == 0.0 && r.getDouble(6) == 0.0))
  }

  test("pruneEstimate: sorted layout opens ~1 file for a narrow range, arrival opens all") {
    val df = (0 until 320)
      .map(i => (i.toLong, ((i * 7919) % 320).toDouble)).toDF("id", "v")
    val rows = Layout.pruneEstimate(df, "id", "v", files = 8,
      lo = 100.0, hi = 110.0).collect()
      .map(r => r.getString(0) -> ((r.getLong(1), r.getLong(2)))).toMap
    assert(rows("sorted")._1 == 8L && rows("arrival")._1 == 8L)
    assert(rows("sorted")._2 <= 2L)   // 11 of 320 values, 40-row files
    assert(rows("arrival")._2 == 8L)  // scattered values hit every file
  }

  test("BPE train reproduces the classic merge sequence with deterministic ties") {
    import graft.ops.ext.Bpe
    // Sennrich et al.'s example vocabulary. Round 1: (e,s)=9 ties
    // (s,t)=9 → lex tie-break picks (e,s). Round 2: (es,t)=9.
    // Round 3: (l,o)=7 ties (o,w)=7 → (l,o).
    val words = Seq(("low", 5L), ("lower", 2L), ("newest", 6L),
      ("widest", 3L)).toDF("word", "freq")
    val got = Bpe.train(words, 3).collect()
      .map(r => (r.getInt(0), r.getString(1), r.getString(2),
        r.getString(3), r.getLong(4))).toSeq
    assert(got == Seq((1, "e", "s", "es", 9L), (2, "es", "t", "est", 9L),
      (3, "l", "o", "lo", 7L)))
  }

  test("BPE merge fold is leftmost non-overlapping (chained runs collapse pairwise)") {
    import graft.ops.ext.Bpe
    // "aaaa" + merge (a,a) must give [aa, aa], not [aa, a, a] or [aaa, a]
    val words = Seq(("aaaa", 1L)).toDF("word", "freq")
    val m = Bpe.train(words, 2).collect()
      .map(r => (r.getInt(0), r.getString(3), r.getLong(4))).toSeq
    // round 1: (a,a) appears 3 times overlapping but weight counts raw
    // adjacencies = 3; round 2 operates on [aa, aa] → (aa,aa)=1
    assert(m == Seq((1, "aa", 3L), (2, "aaaa", 1L)))
  }

  test("quantileDrift: symmetric split has zero delta, shifted split doesn't") {
    // values 0..99 duplicated into both slices → identical quantiles
    val both = (0 until 100).flatMap(i =>
      Seq((true, i.toDouble), (false, i.toDouble))).toDF("is_l", "v")
    val same = Profile.quantileDrift(both, col("is_l"), "v",
      Seq(0.25, 0.5, 0.75)).collect()
    assert(same.forall(_.getDouble(3) == 0.0))
    // right slice shifted by +10 → every delta is exactly -10
    val shifted = (0 until 100).flatMap(i =>
      Seq((true, i.toDouble), (false, i + 10.0))).toDF("is_l", "v")
    val d = Profile.quantileDrift(shifted, col("is_l"), "v", Seq(0.5))
      .collect().head
    assert(d.getDouble(3) == -10.0)
  }

  test("footerStats decodes per-file min/max and drives real pruning") {
    val dir = java.nio.file.Files.createTempDirectory("graft-footer").toString
    // sortedWrite → 4 files with disjoint id ranges
    val df = (0L until 400L).map(i => (i, s"r$i")).toDF("id", "s")
    Layout.sortedWrite(df, Seq("id"), dir, numFiles = 4)
    val stats = Layout.footerStats(spark, dir, Seq("id"))
    val rows = stats.collect()
    assert(rows.map(_.getLong(6)).sum == 400L)        // row counts cover all
    assert(rows.forall(_.getLong(5) == 0L))           // no nulls
    // ranges are disjoint (modulo range-sampling boundaries): a point
    // predicate prunes to at most 2 of the 4 files on footer stats alone
    val hit = rows.count(r => r.getLong(3) <= 42L && r.getLong(4) >= 42L)
    assert(hit >= 1 && hit <= 2, s"expected footer pruning to ~1 file, hit $hit")
    // decoded bounds match the data
    assert(rows.map(_.getLong(3)).min == 0L && rows.map(_.getLong(4)).max == 399L)
  }

  test("attribution credits first and last touch before the FIRST conversion only") {
    import graft.ops.Funnel
    // user 1: view(1) click(2) purchase(3,$10) signup(4) purchase(5,$99)
    //   → first purchase at t=3 ($10): first touch view, last touch click;
    //     signup arrives after conversion and must not be credited
    // user 2: purchase with no prior touches → no credit anywhere
    val ev = Seq(
      (1L, 1L, "view", 0.0), (2L, 1L, "click", 0.0),
      (3L, 1L, "purchase", 10.0), (4L, 1L, "signup", 0.0),
      (5L, 1L, "purchase", 99.0), (6L, 2L, "purchase", 5.0))
      .toDF("event_id", "user_id", "event_type", "value")
      .withColumn("ts", col("event_id") * 1000L)
    val got = Funnel.attribution(ev, "user_id", "event_type", "ts",
      "event_id", "value", "purchase", Seq("view", "click", "signup"))
      .collect().map(r => r.getString(0) ->
        ((r.getLong(1), r.getDouble(2), r.getLong(3), r.getDouble(4)))).toMap
    assert(got == Map(
      "view" -> ((1L, 10.0, 0L, 0.0)),   // first-touch model
      "click" -> ((0L, 0.0, 1L, 10.0)))) // last-touch model
  }

  test("rankingMetrics: hand-computed NDCG/MRR for an imperfect ranking") {
    import graft.ops.ext.Retrieval
    // ranking: d1(rel 0), d2(rel 2), d3(rel 1); ideal order: d2, d3
    val ranked = Seq((1L, "d1"), (2L, "d2"), (3L, "d3"))
      .toDF("rank", "doc_id")
    val rel = Seq(("d2", 2), ("d3", 1)).toDF("doc_id", "rel")
    val r = Retrieval.rankingMetrics(ranked, rel, 3).collect().head
    val dcg = 3.0 / (math.log(3) / math.log(2)) + 1.0 / 2.0
    val idcg = 3.0 / 1.0 + 1.0 / (math.log(3) / math.log(2))
    assert(r.getInt(0) == 3)
    assert(math.abs(r.getDouble(1) - dcg) < 1e-6)
    assert(math.abs(r.getDouble(2) - idcg) < 1e-6)
    assert(math.abs(r.getDouble(3) - dcg / idcg) < 1e-6)
    assert(r.getDouble(4) == 0.5) // first relevant at rank 2
  }

  test("rocAuc: mid-rank tie handling matches the hand computation") {
    import graft.ops.ext.Eval
    // ascending ranks: 0.1(neg)=1, {0.5(pos), 0.5(neg)} midrank 2.5,
    // 0.9(pos)=4 -> U = (2.5+4) - 2*3/2 = 3.5 -> AUC = 3.5/4
    val scored = Seq((1L, 0.9, true), (2L, 0.5, true),
      (3L, 0.5, false), (4L, 0.1, false)).toDF("id", "score", "pos")
    val r = Eval.rocAuc(scored, "score", "pos").collect().head
    assert((r.getLong(0), r.getLong(1), r.getDouble(2)) == ((2L, 2L, 0.875)))
  }

  test("centroidAuc separable classes score a perfect 1.0") {
    import graft.ops.ext.Eval
    val df = Seq(
      (1L, Seq(1.0f, 0.0f), 1), (2L, Seq(0.9f, 0.1f), 1),
      (3L, Seq(0.0f, 1.0f), 0), (4L, Seq(0.1f, 0.9f), 0))
      .toDF("vec_id", "embedding", "label")
    val r = Eval.centroidAuc(df, "embedding", "vec_id", "label", 1)
      .collect().head
    assert((r.getLong(0), r.getLong(1), r.getDouble(2)) == ((2L, 2L, 1.0)))
  }

  test("ewma: sequential recurrence from the first element, hand-checked") {
    import graft.ops.Rolling
    // u1 in ts order: 1, 2, 4 -> s = 1, 1.25, 0.25*4+0.75*1.25 = 1.9375
    val df = Seq((1L, 30L, 1L, 4.0), (1L, 10L, 2L, 1.0), (1L, 20L, 3L, 2.0),
      (2L, 10L, 4L, 5.0))
      .toDF("user_id", "ts", "event_id", "value")
    val r = Rolling.ewma(df, Seq("user_id"), Seq(col("ts"), col("event_id")),
      "value", alpha = 0.25).orderBy("user_id").collect()
    assert(r.map(x => (x.getLong(0), x.getLong(1), x.getDouble(2))).toSeq ==
      Seq((1L, 3L, 1.9375), (2L, 1L, 5.0)))
    assert(math.abs(r(0).getDouble(3) - 2.333333) < 1e-9) // mean 7/3
  }

  test("frontier2d keeps exactly the non-dominated staircase") {
    import graft.ops.Skyline
    // (x min, y max); weak dominance removes (5, 0.95) via (3, 0.95)
    val pts = Seq((1L, 1L, 0.5), (2L, 2L, 0.9), (3L, 2L, 0.7),
      (4L, 3L, 0.8), (5L, 3L, 0.95), (6L, 5L, 0.95))
      .toDF("id", "x", "y")
    for (bw <- Seq(1, 16)) {
      val ids = Skyline.frontier2d(pts, "x", "y", "id", bucketWidth = bw)
        .select("id").collect().map(_.getLong(0)).toSeq
      assert(ids == Seq(1L, 2L, 5L), s"bucketWidth=$bw")
    }
  }

  test("dHash: brightness-shift invariant, gradient reversal flips all bits") {
    import graft.ops.ext.Multimodal
    def img(f: (Int, Int) => Int): java.awt.image.BufferedImage = {
      val b = new java.awt.image.BufferedImage(32, 32,
        java.awt.image.BufferedImage.TYPE_INT_RGB)
      for (y <- 0 until 32; x <- 0 until 32) {
        val v = f(x, y); b.setRGB(x, y, (v << 16) | (v << 8) | v)
      }
      b
    }
    val a = Multimodal.dHashFromImage(img((x, y) => 3 * x + y)).get
    val shifted = Multimodal.dHashFromImage(img((x, y) => 3 * x + y + 10)).get
    val rev = Multimodal.dHashFromImage(img((x, y) => 200 - 3 * x - y)).get
    assert(a == 0L)           // increasing in x: left mean < right, no bit set
    assert(shifted == a)      // uniform shift moves both means together
    assert(java.lang.Long.bitCount(a ^ rev) == 64) // every compare flips
    // smaller than the 9x8 grid: no hash
    val tiny = new java.awt.image.BufferedImage(4, 4,
      java.awt.image.BufferedImage.TYPE_INT_RGB)
    assert(Multimodal.dHashFromImage(tiny).isEmpty)
  }

  test("bhAdjust: textbook BH q-values with the right-tail running min") {
    import graft.ops.Hypothesis
    // p*n/rank = .04, .04, .04, .5 -> q = .04, .04, .04, .5
    val df = Seq((1L, 0.01), (2L, 0.02), (3L, 0.03), (4L, 0.5))
      .toDF("id", "p")
    val r = Hypothesis.bhAdjust(df, "p", "id").orderBy("rank").collect()
    assert(r.map(_.getDouble(3)).toSeq == Seq(0.04, 0.04, 0.04, 0.5))
    assert(r.map(_.getBoolean(4)).toSeq ==
      Seq(true, true, true, false)) // alpha = 0.05
  }

  test("chiSquare: hand-computed 2x2 independence statistic") {
    import graft.ops.Hypothesis
    // o = [[10,20],[20,10]]: e = 15 everywhere, chi2 = 4*25/15
    val rows = Seq.fill(10)(("x", "u")) ++ Seq.fill(20)(("x", "v")) ++
      Seq.fill(20)(("y", "u")) ++ Seq.fill(10)(("y", "v"))
    val r = Hypothesis.chiSquare(rows.toDF("a", "b"), "a", "b")
      .collect().head
    assert(math.abs(r.getDouble(0) - 100.0 / 15.0) < 1e-5)
    assert((r.getLong(1), r.getLong(2), r.getLong(3)) == ((1L, 60L, 4L)))
  }

  test("groupOls recovers a planted exact linear relation") {
    import graft.ops.Profile
    // y = 3x + 2 exactly -> slope 3, intercept 2, r2 = 1
    val df = (1 to 10).map(i => ("g", i.toDouble, 3.0 * i + 2))
      .toDF("g", "x", "y")
    val r = Profile.groupOls(df, "g", "x", "y").collect().head
    assert(r.getLong(1) == 10L)
    assert(r.getDouble(2) == 3.0 && r.getDouble(3) == 2.0
      && r.getDouble(4) == 1.0)
  }

  test("weightedMedian: integer 2-cum>=total selection, hand-checked") {
    import graft.ops.GroupStats
    val df = Seq(("g", 1.0, 1L, 1L), ("g", 2.0, 1L, 2L), ("g", 3.0, 10L, 3L),
      ("h", 1.0, 1L, 4L), ("h", 2.0, 1L, 5L))
      .toDF("grp", "x", "w", "id")
    val r = GroupStats.weightedMedian(df, "grp", "x", "w", Seq("id"))
      .orderBy("grp").collect()
    // g: weight 10 at x=3 dominates; h: balanced -> lower median x=1
    assert(r.map(x => (x.getString(0), x.getLong(1), x.getDouble(2))).toSeq
      == Seq(("g", 12L, 3.0), ("h", 2L, 1.0)))
  }

  test("gini: zero for uniform, 0.75 for one-giant of four") {
    import graft.ops.GroupStats
    val df = (Seq.fill(4)(("u", 5L)) ++ Seq(("g", 0L), ("g", 0L),
      ("g", 0L), ("g", 12L))).zipWithIndex
      .map { case ((g, x), i) => (g, x, i.toLong) }.toDF("grp", "x", "id")
    val r = GroupStats.gini(df, "grp", "x", "id").orderBy("grp").collect()
    assert(r.map(x => (x.getString(0), x.getDouble(2))).toSeq ==
      Seq(("g", 0.75), ("u", 0.0)))
  }

  test("tokenEntropy: two equiprobable tokens give ln 2 nats") {
    import graft.ops.ext.TextAnalysis
    val df = Seq(("en", "a a b b")).toDF("lang", "text")
    val r = TextAnalysis.tokenEntropy(df, "text", "lang").collect().head
    assert((r.getLong(1), r.getLong(2)) == ((4L, 2L)))
    assert(math.abs(r.getDouble(3) - math.log(2)) < 1e-6)
  }

  test("wordNgrams emits full windows only, as plain strings") {
    import graft.ops.ext.TextAnalysis
    val df = Seq(("a b c d", 1), ("a b", 2)).toDF("text", "id")
    val r = df.select(col("id"),
      TextAnalysis.wordNgrams(col("text"), 3).as("g"))
      .orderBy("id").collect()
    assert(r(0).getSeq[String](1) == Seq("a b c", "b c d"))
    assert(r(1).getSeq[String](1).isEmpty)
  }

  test("dominantEigen converges to the planted principal axis") {
    import graft.ops.ext.Spectral
    // M = diag(2, 0.5): dominant eigenvector (1, 0), eigenvalue 2
    val df = Seq((1L, Seq(2.0f, 0.0f)), (2L, Seq(-2.0f, 0.0f)),
      (3L, Seq(0.0f, 1.0f)), (4L, Seq(0.0f, -1.0f)))
      .toDF("vec_id", "embedding")
    val r = Spectral.dominantEigen(df, "embedding", "vec_id",
      dims = 2, iters = 3).collect()
    assert(math.abs(r(0).getDouble(1)) > 0.999)    // axis-0 loading
    assert(math.abs(r(1).getDouble(1)) < 0.02)     // axis-1 leaked
    assert(math.abs(r(0).getDouble(2) - 2.0) < 0.01) // eigenvalue
  }

  test("envelopeHash: gain-invariant, reversed ramp flips all bits") {
    import graft.ops.ext.Multimodal
    def buf(amp: Int, dens: Int => Int): Array[Byte] =
      Array.tabulate(1600) { i =>
        val (w, j) = (i / 100, i % 100)
        (if (j < dens(w)) 128 + amp else 128).toByte
      }
    val up = Multimodal.envelopeHashFromSamples(buf(40, w => 6 * (w + 1)), 16)
    val gain = Multimodal.envelopeHashFromSamples(buf(80, w => 6 * (w + 1)), 16)
    val down = Multimodal.envelopeHashFromSamples(buf(40, w => 6 * (16 - w)), 16)
    assert(up.get == 0L)
    assert(gain.get == up.get)
    assert(down.get == 0x7FFFL) // all 15 comparisons flip
    assert(Multimodal.envelopeHashFromSamples(Array.fill(8)(0.toByte), 16).isEmpty)
  }

  test("madOutliers flags only the planted extreme value") {
    // 20 values near 100 plus one at 10000 → MAD small, one outlier
    val vals = (0 until 20).map(i => ("g", 100.0 + i)) :+ (("g", 10000.0))
    val df = vals.toDF("grp", "v")
    val r = GroupStats.madOutliers(df, "grp", "v", k = 3.0).collect().head
    assert(r.getLong(1) == 21L)
    assert(r.getLong(4) == 1L)
    // a constant group has MAD 0 and no outliers (strict > keeps it clean)
    val c = Seq(("c", 5.0), ("c", 5.0), ("c", 5.0)).toDF("grp", "v")
    val rc = GroupStats.madOutliers(c, "grp", "v").collect().head
    assert(rc.getDouble(3) == 0.0 && rc.getLong(4) == 0L)
  }
}
