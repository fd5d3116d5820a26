package graft.ops

import graft.TestSpark
import graft.io.Layout
import graft.ops.ext.TextAnalysis
import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

/** Wave-94 operator semantics: N-column Morton key, code-switching. */
class Wave94OpsSpec extends AnyFunSuite {
  lazy val spark = TestSpark.spark
  import spark.implicits._

  test("zorderKeyN places bit i of column j at position i*n+j") {
    val df = Seq((1L, 0L, 0L), (0L, 1L, 0L), (0L, 0L, 1L),
      (2L, 0L, 0L), (3L, 3L, 3L)).toDF("a", "b", "c")
    val out = df.select(Layout.zorderKeyN(
      Seq(col("a"), col("b"), col("c")), bits = 4).as("k"))
      .collect().map(_.getLong(0))
    // bit 0 of a -> pos 0; of b -> pos 1; of c -> pos 2
    assert(out(0) == 1L && out(1) == 2L && out(2) == 4L)
    // bit 1 of a -> pos 3
    assert(out(3) == 8L)
    // (3,3,3): bits 0+1 of each -> 0b111111
    assert(out(4) == 63L)
  }

  test("codeSwitch flags a glued bilingual document") {
    val en = "the cat and the dog of the house is in that it was for"
    val de = "der hund und die katze ist nicht ein tier mit auf zu"
    val docs = Seq(
      (1L, s"$en $en"),            // uniformly english
      (2L, s"$en $en $de $de"),    // glued: en half, de half
      (3L, "zz qq ww ee rr tt")    // no stopwords at all
    ).toDF("doc_id", "text")
    val out = TextAnalysis.codeSwitch(docs, "doc_id", "text")
      .orderBy("doc_id").collect()
    val r1 = out(0); val r2 = out(1); val r3 = out(2)
    assert((1 to 4).forall(i => r1.getString(i) == "en"))
    assert(r1.getLong(5) == 1L && !r1.getBoolean(6))
    // the glued doc: first quarters en, last quarters de
    assert(r2.getString(1) == "en" && r2.getString(4) == "de")
    assert(r2.getLong(5) == 2L && r2.getBoolean(6))
    assert((1 to 4).forall(i => r3.getString(i) == "und"))
    assert(r3.getLong(5) == 0L && !r3.getBoolean(6))
  }
}
