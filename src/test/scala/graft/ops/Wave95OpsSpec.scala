package graft.ops

import graft.TestSpark
import graft.queries.Wave95Queries
import org.scalatest.funsuite.AnyFunSuite

/** Wave-95 semantics, asserted on the sf0.001 corpus: the three
  * queries' structural invariants (values are oracle-checked; these
  * pin the properties the numbers must obey).
  */
class Wave95OpsSpec extends AnyFunSuite {
  lazy val spark = TestSpark.spark
  private val sf = "/root/testdata/sf0.001"

  test("bpe sweep: more merges never inflate the token count") {
    val rows = Wave95Queries.q472(spark, sf).collect()
    assert(rows.map(_.getLong(0)).toSeq == Seq(0L, 2L, 4L, 8L))
    // total_words constant across the sweep; subwords monotone down
    assert(rows.map(_.getLong(1)).distinct.length == 1)
    val sub = rows.map(_.getLong(2))
    assert(sub.zip(sub.tail).forall { case (a, b) => b <= a })
    // zero merges = character tokenization: chars per subword is 1
    assert(rows(0).getDouble(4) == 1.0)
  }

  test("youden threshold: J equals tpr - fpr and lies in [0, 1]") {
    val r = Wave95Queries.q473(spark, sf).collect()(0)
    val (tpr, fpr, j) = (r.getDouble(3), r.getDouble(4), r.getDouble(5))
    assert(math.abs(j - math.rint((tpr - fpr) * 1e6) / 1e6) < 2e-6)
    assert(j >= 0.0 && j <= 1.0 && tpr >= fpr)
  }

  test("ivf drift: counts conserve and chi2 terms are non-negative") {
    val rows = Wave95Queries.q474(spark, sf).collect()
    val base = rows.map(_.getLong(1)).sum
    val nw = rows.map(_.getLong(2)).sum
    assert(base + nw == 500L)  // every sf0.001 vector assigned once
    assert(nw == 100L)         // the vec_id % 5 == 0 split
    assert(rows.forall(_.getDouble(4) >= 0.0))
    // expectations are base-proportional: they sum to the new total
    val expSum = rows.map(_.getDouble(3)).sum
    assert(math.abs(expSum - nw) < 1e-3)
  }
}
