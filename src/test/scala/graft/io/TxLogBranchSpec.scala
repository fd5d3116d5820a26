package graft.io

import java.nio.file.Files

import graft.TestSpark
import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

/** Branch (write-audit-publish), orphan-reclamation, and tag semantics
  * of the table log: staged rows are invisible to main until publish,
  * publish moves zero bytes and rebases onto a moved head, orphan scan
  * reasons from every log (so live staging survives), and tags pin
  * versions through vacuum.
  */
class TxLogBranchSpec extends AnyFunSuite {
  lazy val spark = TestSpark.spark
  import spark.implicits._

  private def freshTable(): String =
    Files.createTempDirectory("graft_txbr").resolve("t").toString

  test("branch staging is invisible to main; publish fast-forwards by reference") {
    val t = freshTable()
    TxLog.commit(spark, t, Seq(1L, 2L).toDF("x"), targetFiles = 1)
    TxLog.branchCreate(t, "wap")
    TxLog.branchAppend(spark, t, "wap", Seq(3L, 4L).toDF("x"),
      targetFiles = 1)
    assert(TxLog.read(spark, t).count() == 2,
      "main must not see staged rows")
    assert(TxLog.branchRead(spark, t, "wap").count() == 4,
      "branch sees base + staged")
    val before = Files.walk(java.nio.file.Paths.get(t, "data"))
      .iterator()
    val files = Iterator.continually(before)
      .takeWhile(_.hasNext).map(_.next().toString)
      .filter(_.endsWith(".parquet")).toSet
    val v = TxLog.publish(t, "wap")
    assert(v == 2)
    assert(TxLog.read(spark, t).agg(sum("x")).head().getLong(0) == 10L)
    val after = Files.walk(java.nio.file.Paths.get(t, "data")).iterator()
    val filesAfter = Iterator.continually(after)
      .takeWhile(_.hasNext).map(_.next().toString)
      .filter(_.endsWith(".parquet")).toSet
    assert(files == filesAfter, "publish must move zero bytes")
  }

  test("publish rebases onto a head that moved after branchCreate") {
    val t = freshTable()
    TxLog.commit(spark, t, Seq(1L).toDF("x"), targetFiles = 1)
    TxLog.branchCreate(t, "wap")
    TxLog.branchAppend(spark, t, "wap", Seq(2L).toDF("x"), targetFiles = 1)
    // main moves while the branch is in audit
    TxLog.append(spark, t, Seq(10L).toDF("x"), targetFiles = 1)
    TxLog.publish(t, "wap")
    val xs = TxLog.read(spark, t).as[Long].collect().sorted.toSeq
    assert(xs == Seq(1L, 2L, 10L), "publish must keep concurrent appends")
  }

  test("publish preserves main's standing delete vectors") {
    val t = freshTable()
    TxLog.commit(spark, t, Seq(1L, 2L, 3L).toDF("x"), targetFiles = 1)
    TxLog.deleteWhere(spark, t, "x = 2", Seq("x"))
    TxLog.branchCreate(t, "wap")
    TxLog.branchAppend(spark, t, "wap", Seq(4L).toDF("x"), targetFiles = 1)
    TxLog.publish(t, "wap")
    val xs = TxLog.readResolved(spark, t).as[Long].collect().sorted.toSeq
    assert(xs == Seq(1L, 3L, 4L), "deleted row must stay deleted after publish")
  }

  test("orphan scan finds zombies and deleted branches, never live staging") {
    val t = freshTable()
    TxLog.commit(spark, t, Seq(1L).toDF("x"), targetFiles = 1)
    // zombie: data landed, entry never committed
    Seq(99L).toDF("x").repartition(1)
      .write.parquet(s"$t/data/zombie")
    // deleted branch leaves its staged dir unreachable
    TxLog.branchCreate(t, "doomed")
    TxLog.branchAppend(spark, t, "doomed", Seq(7L).toDF("x"),
      targetFiles = 1)
    TxLog.branchDelete(t, "doomed")
    // live branch must be protected
    TxLog.branchCreate(t, "live")
    TxLog.branchAppend(spark, t, "live", Seq(8L).toDF("x"), targetFiles = 1)
    assert(TxLog.findOrphans(t).size == 2)
    // a grace period shields everything just written
    assert(TxLog.findOrphans(t, graceMs = 3600L * 1000).isEmpty)
    assert(TxLog.vacuumOrphans(t) == 2)
    assert(TxLog.findOrphans(t).isEmpty)
    assert(TxLog.read(spark, t).count() == 1)
    assert(TxLog.branchRead(spark, t, "live").count() == 2)
  }

  test("vacuum never reclaims a directory an active branch references") {
    val t = freshTable()
    TxLog.commit(spark, t, Seq(1L, 2L).toDF("x"), targetFiles = 1)
    TxLog.branchCreate(t, "live")
    TxLog.compact(spark, t, targetFiles = 1)
    // without branch protection, v1's dir (only ref: the branch base)
    // would be swept by keepVersions=1
    assert(TxLog.vacuum(t, keepVersions = 1) == 0)
    assert(TxLog.branchRead(spark, t, "live").count() == 2)
  }

  test("a tag pins its version through vacuum; tagDelete releases it") {
    val t = freshTable()
    TxLog.commit(spark, t, Seq(1L, 2L).toDF("x"), targetFiles = 1)
    TxLog.tagCreate(t, "rel")
    TxLog.append(spark, t, Seq(3L).toDF("x"), targetFiles = 1)
    TxLog.compact(spark, t, targetFiles = 1)
    // v2's append dir is the only untagged unreferenced dir
    assert(TxLog.vacuum(t, keepVersions = 1) == 1)
    assert(TxLog.versions(t) == Seq(1, 3))
    assert(TxLog.readTag(spark, t, "rel").count() == 2)
    assert(TxLog.read(spark, t).count() == 3)
    assert(TxLog.tagDelete(t, "rel"))
    assert(TxLog.vacuum(t, keepVersions = 1) == 1)
    assert(TxLog.versions(t) == Seq(3))
    assert(TxLog.read(spark, t).count() == 3)
  }

  test("tagCreate refuses a version that does not exist") {
    val t = freshTable()
    TxLog.commit(spark, t, Seq(1L).toDF("x"), targetFiles = 1)
    intercept[IllegalArgumentException] {
      TxLog.tagCreate(t, "bad", Some(9))
    }
  }
}
