package graft.queries

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions._

/** Dev-only: per-stage timing of the q208 harness at QS_DIR scale. */
object DevQ208Prof {
  def main(args: Array[String]): Unit = {
    val dir = sys.env.getOrElse("QS_DIR", "/root/testdata/sf0.1")
    val s = SparkSession.builder().master("local[32]")
      .withExtensions(new graft.expr.GraftExtensions)
      .config("spark.sql.shuffle.partitions", 32)
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.ui.enabled", "false").getOrCreate()
    s.sparkContext.setLogLevel("ERROR")
    def t[A](label: String)(f: => A): A = {
      val t0 = System.nanoTime()
      val r = f
      println(f"$label: ${(System.nanoTime() - t0) / 1e9}%.2f s -> $r")
      r
    }
    t("warm")(s.read.parquet(s"$dir/region.parquet").count())
    t("corpus0")(ExtQueries.nearDupCorpus(s, dir).count())
    t("sample")(ExtQueries.nearDupSample(s, dir).count())
    t("sample2")(ExtQueries.nearDupSample(s, dir).count())
    val corpus = ExtQueries.nearDupSample(s, dir)
    val toks = graft.ops.ext.TextAnalysis.tokens(col("text"))
    val shs = corpus.select(col("doc_id"),
      array_distinct(transform(
        sequence(lit(1), greatest(size(toks) - 2, lit(1))),
        i => concat_ws(" ", slice(toks, i, lit(3))))).as("sh"))
      .filter(size(col("sh")) > 0)
    val gx = shs.select(col("doc_id"), explode(col("sh")).as("g")).persist()
    t("gx")(gx.count())
    val k = 16
    val mins = (0 until k).map(i =>
      min(md5(concat(lit(s"$i:"), col("g")))).as(s"m$i"))
    t("sig")(gx.groupBy("doc_id").agg(mins.head, mins.tail: _*).count())
    t("q208 full")(Wave12Queries.q208(s, dir).count())
    t("q208 again")(Wave12Queries.q208(s, dir).count())
    s.stop()
  }
}
