package graft.io

import java.nio.file.Files

import graft.TestSpark
import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

/** Semantics of the copy-on-write table log: dense versions, snapshot
  * isolation under append, content preservation under compaction, and
  * time travel after both.
  */
class TxLogSpec extends AnyFunSuite {
  lazy val spark = TestSpark.spark
  import spark.implicits._

  private def freshTable(): String =
    Files.createTempDirectory("graft_txlog").resolve("t").toString

  test("append commits are dense versions; reads are snapshots") {
    val t = freshTable()
    assert(TxLog.versions(t).isEmpty)
    val v1 = TxLog.commit(spark, t, Seq(1L, 2L).toDF("x"), targetFiles = 1)
    val v2 = TxLog.commit(spark, t, Seq(3L).toDF("x"), targetFiles = 1)
    assert((v1, v2) == (1, 2))
    assert(TxLog.versions(t) == Seq(1, 2))
    assert(TxLog.read(spark, t, Some(1)).count() == 2)
    assert(TxLog.read(spark, t).count() == 3)
  }

  test("compaction keeps the row set and old versions stay readable") {
    val t = freshTable()
    TxLog.commit(spark, t, (1L to 10L).toDF("x"), targetFiles = 2)
    TxLog.commit(spark, t, (11L to 20L).toDF("x"), targetFiles = 2)
    val v3 = TxLog.compact(spark, t, targetFiles = 1)
    assert(v3 == 3)
    val cur = TxLog.read(spark, t)
    assert(cur.count() == 20)
    assert(cur.agg(sum("x")).head().getLong(0) == (1L to 20L).sum)
    // layout changed: one directory, one file
    assert(cur.select(input_file_name().as("f")).distinct().count() == 1)
    // time travel: v1 still exactly the first commit
    assert(TxLog.read(spark, t, Some(1)).count() == 10)
  }

  test("data directories are immutable: commit never rewrites") {
    val t = freshTable()
    TxLog.commit(spark, t, Seq(1L).toDF("x"), targetFiles = 1)
    val before = Files.walk(java.nio.file.Paths.get(t, "data"))
      .iterator()
    val firstList = Iterator.continually(before)
      .takeWhile(_.hasNext).map(_.next().toString).toSet
    TxLog.commit(spark, t, Seq(2L).toDF("x"), targetFiles = 1)
    firstList.foreach(p =>
      assert(Files.exists(java.nio.file.Paths.get(p)),
        s"commit must not touch existing data: $p"))
  }

  test("vacuum deletes only unreferenced dirs; kept window still reads") {
    val t = freshTable()
    TxLog.commit(spark, t, Seq(1L, 2L).toDF("x"), targetFiles = 1)
    TxLog.commit(spark, t, Seq(3L).toDF("x"), targetFiles = 1)
    TxLog.compact(spark, t, targetFiles = 1)
    val removed = TxLog.vacuum(t, keepVersions = 1)
    assert(removed == 2)
    assert(TxLog.versions(t) == Seq(3))
    assert(TxLog.read(spark, t).count() == 3)
  }

  test("zone-mapped commits prune point reads to covering dirs") {
    val t = freshTable()
    TxLog.commitWithZone(spark, t, Seq((1L, 10L), (2L, 19L)).toDF("x", "z"),
      "z", targetFiles = 1)
    TxLog.commitWithZone(spark, t, Seq((3L, 20L), (4L, 29L)).toDF("x", "z"),
      "z", targetFiles = 1)
    val (df, scanned, total) = TxLog.readPruned(spark, t, "z", 25L)
    assert((scanned, total) == (1, 2))
    assert(df.filter(col("z") === 25L).count() == 0)
    assert(df.count() == 2)
  }

  test("point read outside every zone returns an empty typed frame") {
    val t = freshTable()
    TxLog.commitWithZone(spark, t, Seq((1L, 10L)).toDF("x", "z"),
      "z", targetFiles = 1)
    val (df, scanned, total) = TxLog.readPruned(spark, t, "z", 999L)
    assert((scanned, total) == (0, 1))
    assert(df.count() == 0)
    assert(df.columns.toSeq == Seq("x", "z"))
  }

  test("empty commit writes no zone sidecar and stays scannable") {
    val t = freshTable()
    TxLog.commitWithZone(spark, t, Seq((1L, 10L)).toDF("x", "z"),
      "z", targetFiles = 1)
    // an empty frame has no (min, max) envelope — must not NPE, and
    // the no-sidecar commit must fall back to always-scan
    TxLog.commitWithZone(spark, t,
      Seq.empty[(Long, Long)].toDF("x", "z"), "z", targetFiles = 1)
    val (_, scanned, total) = TxLog.readPruned(spark, t, "z", 10L)
    assert((scanned, total) == (2, 2))
  }

  test("vacuum removes the zone sidecars of deleted directories") {
    val t = freshTable()
    TxLog.commitWithZone(spark, t, Seq((1L, 10L)).toDF("x", "z"),
      "z", targetFiles = 1)
    TxLog.commitWithZone(spark, t, Seq((2L, 20L)).toDF("x", "z"),
      "z", targetFiles = 1)
    TxLog.compact(spark, t, targetFiles = 1)
    assert(TxLog.vacuum(t, keepVersions = 1) == 2)
    val orphans = Files.list(java.nio.file.Paths.get(t, "_log")).iterator()
    val zoneFiles = Iterator.continually(orphans).takeWhile(_.hasNext)
      .map(_.next().getFileName.toString).filter(_.startsWith("zone_")).toSeq
    assert(zoneFiles.isEmpty, s"orphan zone sidecars: $zoneFiles")
  }

  test("a second writer committing the same version fails loudly") {
    val t = freshTable()
    TxLog.commit(spark, t, Seq(1L).toDF("x"), targetFiles = 1)
    // two writers race the v2 commit: both computed v=2 from the same
    // snapshot; exactly one must win, the other must get the
    // ConcurrentCommitException (never silent last-wins)
    val start = new java.util.concurrent.CountDownLatch(1)
    val results =
      new java.util.concurrent.ConcurrentLinkedQueue[Either[Int, Int]]()
    val threads = (0 until 2).map { i =>
      // distinct payloads so a silent overwrite would be observable
      val sub = s"data/c2_w$i"
      Seq(100L + i).toDF("x")
        .write.mode("errorifexists").parquet(s"$t/$sub")
      new Thread(() => {
        start.await()
        try {
          TxLog.writeEntry(t, 2, Seq("data/c00001", sub))
          results.add(Right(i))
        } catch {
          case _: TxLog.ConcurrentCommitException => results.add(Left(i))
        }
      })
    }
    threads.foreach(_.start()); start.countDown()
    threads.foreach(_.join(30000))
    import scala.jdk.CollectionConverters._
    val rs = results.asScala.toList
    assert(rs.count(_.isRight) == 1,
      s"exactly one writer must win: $rs")
    assert(rs.count(_.isLeft) == 1,
      s"the loser must see ConcurrentCommitException: $rs")
    // the table stays consistent: v2 resolves to the winner's list
    assert(TxLog.read(spark, t, Some(2)).count() == 2)
  }
}
