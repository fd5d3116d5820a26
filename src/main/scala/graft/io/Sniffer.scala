package graft.io

import org.apache.hadoop.conf.Configuration
import org.apache.hadoop.fs.Path
import java.io.{BufferedReader, InputStreamReader}
import java.util.zip.GZIPInputStream

/** Driver-side delimiter sniffer — the Spark stand-in for the reference's
  * `pd.read_csv(sep=None, engine='python')` (csv.Sniffer;
  * `run_annotate.py:21`, `:37`). Spark's CSV source needs a concrete
  * separator, so we sample the head of one file per source and score
  * candidates. Runs once per source on the driver (a few KB of IO) —
  * never per row, so it costs nothing at 100 TB.
  *
  * Scoring: for each candidate sep, count quote-aware occurrences per
  * sampled line; a good sep has count >= 1 and identical counts across
  * lines (csv.Sniffer's consistency heuristic). Ties break by candidate
  * priority (tab, comma, semicolon, pipe) — matching csv.Sniffer's
  * preferred order.
  */
object Sniffer {
  val Candidates: Seq[Char] = Seq('\t', ',', ';', '|')
  val SampleBytes: Int = 64 * 1024
  val SampleLines: Int = 20

  /** Sniff the separator of the file at `path` (any Hadoop-visible FS;
    * gzip-transparent by extension, matching the reference's allowlist
    * `run_annotate.py:259`). Falls back to comma for single-column files.
    */
  def sniffSep(path: String, conf: Configuration = new Configuration())
      : String = {
    val lines = sampleLines(path, conf)
    sniffFromLines(lines).toString
  }

  def sniffFromLines(lines: Seq[String]): Char = {
    val usable = lines.filter(_.nonEmpty)
    if (usable.isEmpty) return ','
    val scored = Candidates.zipWithIndex.map { case (sep, prio) =>
      val counts = usable.map(countOutsideQuotes(_, sep))
      val consistent = counts.forall(_ == counts.head) && counts.head > 0
      val minCount = counts.min
      // consistent separators first, then higher column count, then priority
      (consistent, minCount, sep, prio)
    }
    val best = scored.sortBy { case (cons, cnt, _, prio) =>
      (if (cons) 0 else 1, -cnt, prio)
    }.head
    if (best._2 > 0) best._3 else ','
  }

  /** Count occurrences of `sep` outside double-quoted regions (RFC-4180
    * quoting, `""` escape).
    */
  def countOutsideQuotes(line: String, sep: Char): Int = {
    var inQuotes = false; var n = 0; var i = 0
    while (i < line.length) {
      val c = line.charAt(i)
      if (c == '"') inQuotes = !inQuotes
      else if (c == sep && !inQuotes) n += 1
      i += 1
    }
    n
  }

  private def sampleLines(path: String, conf: Configuration): Seq[String] = {
    val p = new Path(path)
    val fs = p.getFileSystem(conf)
    val raw = fs.open(p)
    val in =
      if (path.endsWith(".gz")) new GZIPInputStream(raw, SampleBytes)
      else raw
    val reader = new BufferedReader(new InputStreamReader(in, "UTF-8"))
    try {
      Iterator.continually(reader.readLine()).takeWhile(_ != null)
        .take(SampleLines).toList
    } finally reader.close()
  }

  /** Resolve one concrete file under a glob source to sniff (the first
    * match); driver-side listing only.
    */
  def firstMatchingFile(globPath: String,
                        conf: Configuration = new Configuration())
      : Option[String] = {
    val p = new Path(globPath)
    val fs = p.getFileSystem(conf)
    val statuses = Option(fs.globStatus(p)).getOrElse(Array.empty)
    statuses.find(_.isFile).map(_.getPath.toString)
      .orElse(statuses.headOption.map(_.getPath.toString))
  }
}
