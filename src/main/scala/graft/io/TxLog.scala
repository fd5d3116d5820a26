package graft.io

import java.nio.file.{Files, Path, Paths, StandardCopyOption}

import org.apache.spark.sql.{DataFrame, SparkSession}

/** Minimal copy-on-write table log — the versioned-parquet sink a lake
  * deployment needs for append + time travel + compaction without an
  * external table format dependency (offline classpath: no Delta/
  * Iceberg jars — see /root/repo/build.sbt).
  *
  * Layout: `<table>/_log/v<NNNNN>.json` (one JSON per committed
  * version, listing the data SUBDIRECTORIES the snapshot reads) and
  * `<table>/data/c<NNNNN>/` (one directory of parquet per commit —
  * data files are immutable once written; a commit only ever ADDS a
  * directory, a compaction replaces the list, never the bytes).
  *
  * Concurrency/atomicity: the log entry is written to a temp file and
  * renamed into place — on HDFS-compatible stores rename is atomic, so
  * readers see either the old or the new snapshot, never a partial
  * list (the same single-writer discipline as the reference's
  * dictionary write-back, run_annotate.py's append-only fields file).
  * Version numbers are dense; the current version is the max log file.
  *
  * Scale: a snapshot read is `spark.read.parquet(dirs*)` — partition
  * pruning, pushdown and split planning all apply per directory;
  * compaction rewrites data ONCE into a target-sized layout and
  * commits the swap as one rename. The log itself is O(versions) tiny
  * JSON files, never data-sized.
  */
object TxLog {

  private def logDir(table: String): Path = Paths.get(table, "_log")

  private def entryPath(table: String, v: Int): Path =
    logDir(table).resolve(f"v$v%05d.json")

  /** Versions present in the log, ascending (empty for a fresh table). */
  def versions(table: String): Seq[Int] = {
    val d = logDir(table)
    if (!Files.exists(d)) Seq.empty
    else {
      val it = Files.list(d).iterator()
      val vs = Iterator.continually(it)
        .takeWhile(_.hasNext).map(_.next())
        .map(_.getFileName.toString)
        .filter(n => n.startsWith("v") && n.endsWith(".json"))
        .map(n => n.stripPrefix("v").stripSuffix(".json").toInt)
        .toSeq
      vs.sorted
    }
  }

  def currentVersion(table: String): Option[Int] = versions(table).lastOption

  private def readEntry(table: String, v: Int): Seq[String] = {
    val txt = Files.readString(entryPath(table, v))
    // minimal parse of {"version":N,"dirs":["...","..."]} — the only
    // writer is `writeEntry` below, so the shape is fixed
    val m = raw""""dirs"\s*:\s*\[([^\]]*)\]""".r
      .findFirstMatchIn(txt)
      .getOrElse(sys.error(s"malformed log entry v$v for $table"))
    m.group(1).split(",").map(_.trim.stripPrefix("\"").stripSuffix("\""))
      .filter(_.nonEmpty).toSeq
  }

  private def writeEntry(table: String, v: Int, dirs: Seq[String]): Unit = {
    Files.createDirectories(logDir(table))
    val json = dirs.map("\"" + _ + "\"")
      .mkString(s"""{"version":$v,"dirs":[""", ",", "]}")
    val tmp = logDir(table).resolve(f".v$v%05d.json.tmp")
    Files.writeString(tmp, json)
    Files.move(tmp, entryPath(table, v), StandardCopyOption.ATOMIC_MOVE)
  }

  /** Append `df` as a new commit; returns the new version number. */
  def commit(spark: SparkSession, table: String, df: DataFrame,
      targetFiles: Int = 4): Int = {
    val v = currentVersion(table).getOrElse(0) + 1
    val sub = f"data/c$v%05d"
    df.repartition(targetFiles).write.mode("errorifexists")
      .parquet(s"$table/$sub")
    val prev = currentVersion(table).map(readEntry(table, _))
      .getOrElse(Seq.empty)
    writeEntry(table, v, prev :+ sub)
    v
  }

  /** Snapshot read — latest version, or time travel to `version`. */
  def read(spark: SparkSession, table: String,
      version: Option[Int] = None): DataFrame = {
    val v = version.orElse(currentVersion(table))
      .getOrElse(sys.error(s"no committed version in $table"))
    val dirs = readEntry(table, v).map(d => s"$table/$d")
    spark.read.parquet(dirs: _*)
  }

  /** Vacuum: delete data directories no snapshot in the kept-version
    * window references, and drop the log entries older than the window
    * — the retention step that makes compaction actually reclaim
    * space. `keepVersions` counts back from the current version;
    * time travel inside the window keeps working, older versions stop
    * resolving (the documented retention contract every table format
    * ships). Returns the number of data directories deleted.
    */
  def vacuum(table: String, keepVersions: Int = 1): Int = {
    require(keepVersions >= 1)
    val vs = versions(table)
    if (vs.isEmpty) return 0
    val kept = vs.takeRight(keepVersions)
    val referenced = kept.flatMap(readEntry(table, _)).toSet
    val dataRoot = Paths.get(table, "data")
    val all =
      if (!Files.exists(dataRoot)) Seq.empty[Path]
      else {
        val it = Files.list(dataRoot).iterator()
        Iterator.continually(it).takeWhile(_.hasNext).map(_.next()).toSeq
      }
    val doomed = all.filterNot(p => referenced.contains(s"data/${p.getFileName}"))
    doomed.foreach { dir =>
      val it = Files.walk(dir)
        .sorted(java.util.Comparator.reverseOrder[Path]()).iterator()
      while (it.hasNext) Files.delete(it.next())
    }
    vs.dropRight(keepVersions).foreach(v => Files.delete(entryPath(table, v)))
    doomed.size
  }

  /** Per-commit zone map: record the (min, max) of `zoneCol` for a
    * commit's directory in a sidecar next to the log entry. Written by
    * [[commitWithZone]]; consulted by [[readPruned]].
    */
  private def zonePath(table: String, sub: String): Path =
    Paths.get(table, sub.replace("data/", "_log/zone_") + ".json")

  /** Append `df` as a new commit AND record the zone map of `zoneCol`
    * (a long column) for the new directory — the footer-statistics
    * idea lifted to the table-format level, so a point/range read can
    * skip whole COMMITS without opening a single parquet footer.
    */
  def commitWithZone(spark: SparkSession, table: String, df: DataFrame,
      zoneCol: String, targetFiles: Int = 4): Int = {
    import org.apache.spark.sql.functions.{col, max => smax, min => smin}
    val v = commit(spark, table, df, targetFiles)
    val sub = f"data/c$v%05d"
    val r = spark.read.parquet(s"$table/$sub")
      .agg(smin(col(zoneCol)), smax(col(zoneCol))).head()
    Files.writeString(zonePath(table, sub),
      s"""{"col":"$zoneCol","min":${r.getLong(0)},"max":${r.getLong(1)}}""")
    v
  }

  /** Snapshot read pruned by the commit zone maps: only directories
    * whose [min, max] envelope can contain `point` are scanned;
    * directories without a sidecar are always scanned (safe fallback).
    * Returns (frame, dirsScanned, dirsTotal).
    */
  def readPruned(spark: SparkSession, table: String, zoneCol: String,
      point: Long): (DataFrame, Int, Int) = {
    val v = currentVersion(table)
      .getOrElse(sys.error(s"no committed version in $table"))
    val dirs = readEntry(table, v)
    val kept = dirs.filter { sub =>
      val zp = zonePath(table, sub)
      if (!Files.exists(zp)) true
      else {
        val txt = Files.readString(zp)
        def f(k: String): Long =
          raw""""$k":(-?\d+)""".r.findFirstMatchIn(txt).get.group(1).toLong
        f("min") <= point && point <= f("max")
      }
    }
    require(kept.nonEmpty, s"no commit's zone covers $point")
    (spark.read.parquet(kept.map(d => s"$table/$d"): _*),
      kept.size, dirs.size)
  }

  /** Incremental consumption: the rows ADDED by commits in
    * (fromVersion, toVersion] — i.e. the data directories present in
    * `to`'s snapshot but not in `from`'s. Only valid across APPEND
    * commits (a compaction/merge rewrites the list; consumers resync
    * from a snapshot read then — the same contract Delta/Iceberg CDC
    * readers document for rewrite commits).
    */
  def readChanges(spark: SparkSession, table: String, fromVersion: Int,
      toVersion: Int): DataFrame = {
    val before = readEntry(table, fromVersion).toSet
    val added = readEntry(table, toVersion).filterNot(before)
    require(added.nonEmpty,
      s"no appended data between v$fromVersion and v$toVersion")
    spark.read.parquet(added.map(d => s"$table/$d"): _*)
  }

  /** Copy-on-write MERGE (upsert): rows of the current snapshot whose
    * `keys` match a row in `updates` are REPLACED by the update row;
    * everything else is carried over. One anti join + one rewrite into
    * a fresh directory, committed as a list swap — old versions stay
    * readable, data files stay immutable.
    */
  def merge(spark: SparkSession, table: String, updates: DataFrame,
      keys: Seq[String], targetFiles: Int = 4): Int = {
    val cur = currentVersion(table)
      .getOrElse(sys.error(s"nothing to merge into in $table"))
    val v = cur + 1
    val sub = f"data/c$v%05d"
    val kept = read(spark, table, Some(cur)).join(updates, keys, "left_anti")
    kept.unionByName(updates).repartition(targetFiles)
      .write.mode("errorifexists").parquet(s"$table/$sub")
    writeEntry(table, v, Seq(sub))
    v
  }

  /** Rewrite the CURRENT snapshot into one fresh directory (the
    * small-file compaction) and commit the swap; row set is unchanged
    * (same data, new layout), old versions stay readable.
    */
  def compact(spark: SparkSession, table: String,
      targetFiles: Int = 4): Int = {
    val cur = currentVersion(table)
      .getOrElse(sys.error(s"nothing to compact in $table"))
    val v = cur + 1
    val sub = f"data/c$v%05d"
    read(spark, table, Some(cur)).repartition(targetFiles)
      .write.mode("errorifexists").parquet(s"$table/$sub")
    writeEntry(table, v, Seq(sub))
    v
  }
}
