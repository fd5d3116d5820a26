package graft

import org.apache.spark.sql.functions._
import org.apache.spark.sql.expressions.Window

/** Dev-only: per-stage profile of Oph.nearDups over the q445 corpus. */
object DevOphProf {
  def main(args: Array[String]): Unit = {
    val sfDir = sys.env.getOrElse("QS_DIR", "/root/testdata/sf0.1")
    val spark = Sessions.builder("32").getOrCreate()
    spark.sparkContext.setLogLevel("ERROR")
    import graft.ops.ext.Dedup
    val (shingleSize, k, threshold, shortDocShingles, maxBucket) =
      (3, 32, 0.8, 16, 4096)
    def t(tag: String)(f: => Unit): Unit = {
      val t0 = System.nanoTime()
      f
      println(f"[ophprof] $tag time=${(System.nanoTime() - t0) / 1e9}%.2f s")
    }
    for (rep <- 1 to 2) {
      // inline nearDupCorpus (private in queries package)
      val docs = spark.read.parquet(s"$sfDir/documents.parquet")
        .select("doc_id", "text")
      val toks0 = graft.ops.ext.TextAnalysis.tokens(col("text"))
      val mutated = docs.filter(col("doc_id") % 10 === 0)
        .select((col("doc_id") + 1000000L).as("doc_id"),
          concat_ws(" ", slice(toks0, lit(1),
            greatest(size(toks0) - 2, lit(1)))).as("text"))
      val df = docs.unionByName(mutated)
      val sh = df.select(col("doc_id").as("id"),
        Dedup.shingles(col("text"), shingleSize).as("sh")).persist()
      t("A_sh_build")(sh.write.format("noop").mode("overwrite").save())
      val hashed = sh.select(col("id"), explode(col("sh")).as("s"))
        .select(col("id"), xxhash64(col("s")).as("h"))
      val minAggs = (0 until k).map(i =>
        min(when(pmod(col("h"), lit(k)) === i, col("h"))).as(s"m$i"))
      val sigRows = hashed.groupBy("id").agg(minAggs.head, minAggs.tail: _*)
      t("B_sigRows")(sigRows.write.format("noop").mode("overwrite").save())
      val binKeys = sigRows.select(col("id"),
        explode(filter(array((0 until k).map(i =>
            struct(lit(i.toLong).as("bin"), col(s"m$i").as("key"))): _*),
          st => st.getField("key").isNotNull)).as("bk"))
        .select(col("id"), col("bk.bin").as("bin"), col("bk.key").as("key"))
      val shortKeys = sh.filter(size(col("sh")) < shortDocShingles)
        .select(col("id"), explode(col("sh")).as("key"))
        .withColumn("bin", lit(-1L))
        .select(col("id"), col("bin"), col("key"))
      val keys = binKeys.unionByName(shortKeys)
      val pinned = keys.repartition(
        keys.sparkSession.sessionState.conf.numShufflePartitions,
        col("bin"), col("key"))
      val capped = pinned.withColumn("__n", count(lit(1)).over(
          Window.partitionBy("bin", "key")))
        .filter(col("__n") <= maxBucket).drop("__n")
      t("C_capped")(capped.write.format("noop").mode("overwrite").save())
      val l = capped.select(col("bin"), col("key"), col("id").as("id_a"))
      val r = capped.select(col("bin"), col("key"), col("id").as("id_b"))
      val cand = l.join(r, Seq("bin", "key"))
        .filter(col("id_a") < col("id_b"))
        .select("id_a", "id_b").distinct()
      t("D_cand")(cand.write.format("noop").mode("overwrite").save())
      println(s"[ophprof] cand_rows=${cand.count()}")
      val candM = cand.localCheckpoint() // pin candidates: A/B the verify only
      for (ab <- 1 to 3) {
        val plain = candM
          .join(sh.select(col("id").as("id_a"), col("sh").as("sh_a")), "id_a")
          .join(sh.select(col("id").as("id_b"), col("sh").as("sh_b")), "id_b")
          .withColumn("__j",
            size(array_intersect(col("sh_a"), col("sh_b"))).cast("double") /
            (size(col("sh_a")) + size(col("sh_b"))
              - size(array_intersect(col("sh_a"), col("sh_b")))).cast("double"))
          .filter(col("__j") >= threshold)
          .select(col("id_a"), col("id_b"), round(col("__j"), 6).as("jaccard"))
        t(s"V_plain_$ab")(plain.write.format("noop").mode("overwrite").save())
        val gen = candM
          .join(sh.select(col("id").as("id_a"), col("sh").as("sh_a")), "id_a")
          .join(sh.select(col("id").as("id_b"), col("sh").as("sh_b")), "id_b")
          .withColumn("__i", explode(array(
            size(array_intersect(col("sh_a"), col("sh_b"))))))
          .withColumn("__j", col("__i").cast("double") /
            (size(col("sh_a")) + size(col("sh_b")) - col("__i")).cast("double"))
          .filter(col("__j") >= threshold)
          .select(col("id_a"), col("id_b"), round(col("__j"), 6).as("jaccard"))
        t(s"V_gen_$ab")(gen.write.format("noop").mode("overwrite").save())
      }
      val joinsOnly = cand
        .join(sh.select(col("id").as("id_a"), col("sh").as("sh_a")), "id_a")
        .join(sh.select(col("id").as("id_b"), col("sh").as("sh_b")), "id_b")
        .select(col("id_a"), col("id_b"),
          (size(col("sh_a")) + size(col("sh_b"))).as("__s"))
      t("E1_joins_only")(joinsOnly.write.format("noop").mode("overwrite").save())
      val bcast = broadcast(cand)
        .join(sh.select(col("id").as("id_a"), col("sh").as("sh_a")), "id_a")
        .join(sh.select(col("id").as("id_b"), col("sh").as("sh_b")), "id_b")
        .withColumn("__j", explode(array(
          Dedup.jaccard(col("sh_a"), col("sh_b")))))
        .filter(col("__j") >= threshold)
        .select(col("id_a"), col("id_b"), round(col("__j"), 6).as("jaccard"))
      t("E2_bcast_full")(bcast.write.format("noop").mode("overwrite").save())
      val interOnly = cand
        .join(sh.select(col("id").as("id_a"), col("sh").as("sh_a")), "id_a")
        .join(sh.select(col("id").as("id_b"), col("sh").as("sh_b")), "id_b")
        .withColumn("__i", explode(array(
          size(array_intersect(col("sh_a"), col("sh_b"))))))
        .withColumn("__j", col("__i").cast("double") /
          (size(col("sh_a")) + size(col("sh_b")) - col("__i")).cast("double"))
        .filter(col("__j") >= threshold)
        .select(col("id_a"), col("id_b"), round(col("__j"), 6).as("jaccard"))
      t("E3_inter_arith")(interOnly.write.format("noop").mode("overwrite").save())
      val full = cand
        .join(sh.select(col("id").as("id_a"), col("sh").as("sh_a")), "id_a")
        .join(sh.select(col("id").as("id_b"), col("sh").as("sh_b")), "id_b")
        .withColumn("__j", explode(array(
          Dedup.jaccard(col("sh_a"), col("sh_b")))))
        .filter(col("__j") >= threshold)
        .select(col("id_a"), col("id_b"), round(col("__j"), 6).as("jaccard"))
      t("E_full")(full.write.format("noop").mode("overwrite").save())
      spark.catalog.clearCache()
      println(s"[ophprof] --- rep $rep done")
    }
    spark.stop()
  }
}
