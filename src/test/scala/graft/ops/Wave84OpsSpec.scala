package graft.ops

import graft.TestSpark
import graft.ops.ext.{Dsir, Oph, TextClean}
import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

/** Unit semantics of the wave-84 operators: DSIR scoring directionality
  * and exactness, OPH estimator behavior on identical/disjoint/partial
  * sets, normalization rule accounting.
  */
class Wave84OpsSpec extends AnyFunSuite {
  lazy val spark = TestSpark.spark
  import spark.implicits._

  test("DSIR scores target-like docs above off-target docs") {
    // corpus: half "alpha beta" docs (the target look), half "zzz qqq"
    val corpus = ((1L to 20L).map(i => (i, "alpha beta gamma")) ++
      (21L to 40L).map(i => (i, "zzz qqq www"))).toDF("doc_id", "text")
    val target = (1L to 10L).map(i => (i, "alpha beta gamma gamma"))
      .toDF("doc_id", "text")
    val top = Dsir.importanceTopN(corpus, target, "text", "doc_id", 40)
      .collect()
    val rankOf = top.map(r => r.getLong(0) -> r.getLong(3)).toMap
    // every target-like doc ranks above every off-target doc
    val maxAlpha = (1L to 20L).map(rankOf).max
    val minZzz = (21L to 40L).map(rankOf).min
    assert(maxAlpha < minZzz,
      s"alpha docs must outrank zzz docs (got $maxAlpha vs $minZzz)")
    // identical docs get identical integer scores
    val scores = top.filter(_.getLong(0) <= 20L).map(_.getLong(2)).toSet
    assert(scores.size == 1, s"same-text docs must tie exactly: $scores")
  }

  test("OPH estimator: identical ~1, disjoint ~0, null without overlap") {
    val df = Seq(
      (1L, "the quick brown fox jumps over the lazy dog again and again",
        "the quick brown fox jumps over the lazy dog again and again"),
      (2L, "the quick brown fox jumps over the lazy dog again and again",
        "entirely different words compose this second document body here"),
      // empty texts shingle to the single empty shingle — identical
      (3L, "", "")).toDF("id", "ta", "tb")
    val est = df.select(col("id"), Oph.simEstimate(
      Oph.signature(col("ta"), 3, 32),
      Oph.signature(col("tb"), 3, 32)).as("e")).collect()
      .map(r => r.getLong(0) ->
        (if (r.isNullAt(1)) None else Some(r.getDouble(1)))).toMap
    assert(est(1L).contains(1.0), "identical texts must estimate 1.0")
    assert(est(2L).exists(_ <= 0.2), s"disjoint texts near 0: ${est(2L)}")
    assert(est(3L).contains(1.0), "empty texts are identical (one empty shingle)")
    // no mutually-defined bin -> null estimate
    val noOverlap = spark.sql(
      """SELECT array(CAST(NULL AS BIGINT), 5L) AS a,
        |       array(3L, CAST(NULL AS BIGINT)) AS b""".stripMargin)
      .select(Oph.simEstimate(col("a"), col("b")).as("e")).head()
    assert(noOverlap.isNullAt(0), "zero mutual bins must yield null")
  }

  test("grouped OPH signatures equal the expression form") {
    val df = Seq((1L, "a b c d e f g h i j k l m n o p q r s t"),
      (2L, "zz yy xx ww vv uu tt ss rr qq pp oo"),
      (3L, "one two")).toDF("doc_id", "text")
    val viaExpr = df.select(col("doc_id").as("id"),
      Oph.signature(col("text"), 3, 8).as("sig"))
    val viaGroup = Oph.signatures(df, "text", "doc_id", 3, 8)
    assert(viaGroup.except(viaExpr).isEmpty &&
      viaExpr.except(viaGroup).isEmpty,
      "grouped and expression OPH signatures must be identical")
  }

  test("normalization folds typography and accounts per rule") {
    val dirty = "\u201Chi\u201D \u2018x\u2019 a\u200Bb \u2013 c\u2026  d\te"
    val row = Seq(dirty).toDF("text")
      .select(TextClean.normCounts(col("text")) :+
        TextClean.normalize(col("text")).as("norm"): _*)
      .head()
    val counts = TextClean.NormRules.indices
      .map(i => TextClean.NormRules(i)._1 -> row.getInt(i)).toMap
    assert(counts("curly_double") == 2 && counts("curly_single") == 2)
    assert(counts("zero_width") == 1 && counts("dash") == 1)
    assert(counts("ellipsis") == 1)
    assert(counts("tab") == 1 && counts("ws_run") >= 1)
    assert(row.getString(TextClean.NormRules.size) ==
      "\"hi\" 'x' ab - c... d e")
  }
}
