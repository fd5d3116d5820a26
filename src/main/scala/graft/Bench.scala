package graft
import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions.col
import java.nio.file.{Files, Paths}

/** Benchmark main -> one JSON line for the driver's BENCH_r{N}.json.
  *
  * Headline metric = the BASELINE.md-comparable workload: lineitem TSV
  * ingest (sniffed sep, inferred schema) -> melt to long form (ids =
  * l_orderkey, l_linenumber; 8 value columns, x8 row blowup) -> parquet
  * write, i.e. the reference's measured end-to-end pipeline
  * (`run_annotate.py:20-28` + `:202-211` + `:188` semantics). The TSV
  * fixture dump is test INPUT (the reference starts from existing TSV)
  * and is cached, not timed.
  *
  * Every SparkEntry query is also timed individually (noop sink — full
  * materialization, no output IO), reported under "queries" as the
  * MINIMUM of 3 runs, with the median alongside in "queries_median".
  * Single-shot timings put GC/compilation debt on whichever query it
  * lands on (round-1 recorded an 80 s outlier for an ~12 s query);
  * round-2 showed the median is not enough either — a bench run under
  * SUSTAINED external machine load (round-2's recorded run took 2.3x
  * the wall-clock of an idle run of the same build) inflates all three
  * trials, and the median keeps the inflation while the min sheds the
  * worst of it. Timing noise is one-sided (load only ever adds time),
  * so min-of-N is the standard estimator; "loadavg_start"/"loadavg_end"
  * (1-min /proc/loadavg) are recorded so a contended run is visible in
  * the artifact itself. A query that fails any run reports the -1.0
  * sentinel and its name under "errors", so a crash is never mistaken
  * for a fast success.
  */
object Bench {
  def main(args: Array[String]): Unit = {
    val sfDir = sys.env.getOrElse("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    val cpus = sys.env.getOrElse("SPARK_GRAFT_CPUS", "32")
    val spark = SparkSession.builder()
      .withExtensions(new graft.expr.GraftExtensions)
      .master(s"local[$cpus]")
      .config("spark.sql.shuffle.partitions", cpus)
      .config("spark.sql.adaptive.enabled", "true")
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("WARN")

    val sfName = Paths.get(sfDir).getFileName.toString
    // warm the session (JVM/codegen/FS init charged to nobody)
    spark.read.parquet(s"$sfDir/region.parquet").count()

    // -- headline: ingest -> melt -> parquet (reference semantics) -----
    val meltValues = Seq("l_partkey", "l_suppkey", "l_quantity",
      "l_extendedprice", "l_discount", "l_tax", "l_returnflag",
      "l_linestatus")
    def tsvFor(dir: String): String = {
      val tsv = graft.queries.CoreQueries.fixDir(dir) + "/bench_lineitem_tsv"
      if (!Files.exists(Paths.get(s"$tsv/_SUCCESS")))
        spark.read.parquet(s"$dir/lineitem.parquet")
          .write.mode("overwrite").option("sep", "\t")
          .option("header", "true").csv(tsv)
      tsv
    }
    def runE2eIn(dir: String, opts: graft.model.ReadOpts): Double = {
      val tsv = tsvFor(dir)
      val outName = Paths.get(dir).getFileName.toString
      val t0 = System.nanoTime()
      val ingested = graft.io.DsvReader.read(spark, s"$tsv/*.csv", opts)
        .select(("l_orderkey" +: "l_linenumber" +: meltValues).map(col): _*)
      val casted = meltValues.foldLeft(ingested)(
        (d, c) => d.withColumn(c, col(c).cast("string")))
      val long = graft.ops.Melt.melt(casted,
        Seq("l_orderkey", "l_linenumber"), meltValues)
      long.write.mode("overwrite").parquet(s"/tmp/graft_bench_out_$outName")
      (System.nanoTime() - t0) / 1e9
    }
    def runE2e(opts: graft.model.ReadOpts): Double = runE2eIn(sfDir, opts)
    // headline: full inference (pandas-equivalent semantics; what
    // BASELINE.md measured), best of 2 runs (first run pays one-off JIT
    // and FS cache effects the baseline measurement also excluded).
    // The sample-inference variant (one data pass — the at-scale
    // default) is reported alongside in "queries".
    val e2e = math.min(runE2e(graft.model.ReadOpts()),
      runE2e(graft.model.ReadOpts()))
    val e2eSample = runE2e(graft.model.ReadOpts(sampleInference = true))

    // -- per-query timings: median of 3, -1 sentinel on failure --------
    def timeOnce(fn: (SparkSession, String) => org.apache.spark.sql.DataFrame)
        : Either[String, Double] =
      try {
        val t0 = System.nanoTime()
        fn(spark, sfDir).write.format("noop").mode("overwrite").save()
        Right((System.nanoTime() - t0) / 1e9)
      } catch { case e: Throwable => Left(String.valueOf(e.getMessage)) }
      finally spark.catalog.clearCache() // each timed run starts uncached

    def loadavg(): String =
      try Files.readString(Paths.get("/proc/loadavg")).split(" ")(0)
      catch { case _: Throwable => "-1" }
    val loadStart = loadavg()
    // dev iteration: SPARK_GRAFT_BENCH_ONLY=q13_minhash_neardup,q53_...
    // times just those queries (the driver never sets it — full run)
    val only = sys.env.get("SPARK_GRAFT_BENCH_ONLY")
      .map(_.split(",").map(_.trim).toSet)
    val selected = SparkEntry.queries.toSeq.sortBy(_._1)
      .filter { case (n, _) => only.forall(_.contains(n)) }
    val results = selected.map { case (name, fn) =>
      val runs = (1 to 3).map(_ => timeOnce(fn))
      runs.collectFirst { case Left(msg) => msg } match {
        case Some(msg) =>
          System.err.println(s"[bench] $name failed: $msg")
          name -> (-1.0, -1.0)
        case None =>
          val ts = runs.collect { case Right(s) => s }.sorted
          name -> (ts.head, ts(1))
      }
    }
    val loadEnd = loadavg()
    val errors = results.collect { case (n, (v, _)) if v < 0 => "\"" + n + "\"" }
      .mkString("[", ",", "]")
    def obj(kvs: Seq[(String, Double)]): String =
      kvs.map { case (k, v) => "\"" + k + "\":" + v }.mkString("{", ",", "}")

    // -- sf1 section: one order-of-magnitude scale step ----------------
    // The round-4 verdict's ask: every scale claim was design-argued at
    // sf0.1 only — measure the headline + the historically slowest
    // queries once at 10× the gate scale (FK-consistent replication,
    // see BenchData). One timed run each (these are the slow tail; the
    // point is the growth RATIO across the 10× step, not a tight
    // estimate), under a wall-clock budget so a pathological query can
    // never eat the round's bench artifact.
    val sf1Json: String =
      if (sfName == "sf0.1" &&
          sys.env.getOrElse("SPARK_GRAFT_SF1", "1") == "1") {
        try {
          val sf1Dir = sys.env.getOrElse("SPARK_GRAFT_SF1_DIR",
            "/root/repo/benchdata/sf1")
          BenchData.ensureScaled(spark, sfDir, sf1Dir, factor = 10)
          val e2e1 = runE2eIn(sf1Dir, graft.model.ReadOpts())
          // the 15 slowest sf0.1 queries by the latest recorded min-of-3
          // (BENCH_LOCAL_r5), plus q226 kept as the regression sentinel
          // for the block-quadratic fix
          val slow15 = Seq("q296_bowtie", "q46_hybrid_neardup", "q262_bfs",
            "q261_ppr", "q232_bradley_terry", "q44_curation",
            "q328_leakage_split", "q278_copula_grid", "q249_hits",
            "q208_lsh_eval", "q53_dup_components", "q325_canonical_dedup",
            "q246_mrmr", "q315_minhash_calibration", "q77_pagerank",
            "q226_entity_resolution")
            .filter(SparkEntry.queries.contains)
          val budgetSec =
            sys.env.getOrElse("SPARK_GRAFT_SF1_BUDGET_SEC", "900").toDouble
          val t0 = System.nanoTime()
          val timed = slow15.flatMap { name =>
            if ((System.nanoTime() - t0) / 1e9 > budgetSec) None
            else timeOnce({ (s, _) =>
              SparkEntry.queries(name)(s, sf1Dir) }) match {
              case Right(sec) => Some(name -> sec)
              case Left(msg) =>
                System.err.println(s"[bench] sf1 $name failed: $msg")
                Some(name -> -1.0)
            }
          }
          s"""{"e2e_ingest_melt_parquet":$e2e1,"queries":${obj(timed)}}"""
        } catch { case e: Throwable =>
          System.err.println(s"[bench] sf1 section failed: ${e.getMessage}")
          "null"
        }
      } else "null"

    val qs = obj(results.map { case (k, (mn, _)) => k -> mn } :+
      ("e2e_sample_inference" -> e2eSample))
    val qsMed = obj(results.map { case (k, (_, md)) => k -> md })
    val full =
      s"""{"metric":"e2e_ingest_melt_parquet","value":$e2e,"unit":"sec","queries":$qs,"queries_median":$qsMed,"errors":$errors,"loadavg_start":$loadStart,"loadavg_end":$loadEnd,"sf":"$sfName","sf1":$sf1Json}"""
    // The full line is ~10 KB with 175 queries — longer than a log-tail
    // capture can hold. Persist it to a file, print it for whole-log
    // readers, and make the LAST stdout line a compact headline record
    // that survives any tail truncation (round-3's bench artifact was
    // lost mid-map to exactly this).
    val fullPath = Paths.get("bench_full.json").toAbsolutePath
    Files.writeString(fullPath, full + "\n")
    println(full)
    def r3(v: Double): Double = math.rint(v * 1000) / 1000
    val slowest = obj(results.filter(_._2._1 >= 0).sortBy(-_._2._1).take(15)
      .map { case (k, (mn, _)) => k -> r3(mn) })
    println(s"""{"metric":"e2e_ingest_melt_parquet","value":$e2e,"unit":"sec","sf":"$sfName","n_queries":${results.size},"errors":$errors,"loadavg_start":$loadStart,"loadavg_end":$loadEnd,"queries_file":"$fullPath","slowest_min_sec":$slowest,"sf1":$sf1Json}""")
    spark.stop()
  }
}
