package graft.ops.ext

import org.apache.spark.sql.{DataFrame, Row, SparkSession}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types._

/** Multimodal (image/audio/video) columns as opaque binary + typed
  * metadata (SURVEY §2.12 X4).
  *
  * Real, tested plumbing: the binary-file source, media-format sniffing
  * from magic bytes (pure expressions over the binary column), the
  * feature-record schema, and the partition-sized batch shape. The actual
  * media DECODE is stubbed behind [[stubDecodeFeatures]] — the image/audio
  * codecs are not on this classpath (zero-egress container); the stub is a
  * clearly-marked deterministic fake with the same signature a real
  * decoder would have (per-partition batched, columnar-friendly).
  *
  * At scale: `binaryFile` reads parallelize per file;
  * `spark.sql.files.maxPartitionBytes` + `pathGlobFilter` control batch
  * shape; features land in a flat struct so downstream filters prune
  * columns without touching payload bytes.
  */
object Multimodal {

  /** Read a directory of media files: (path, modificationTime, length,
    * content binary) — Spark's binaryFile source.
    */
  def readBinary(spark: SparkSession, dir: String, glob: String = "*")
      : DataFrame =
    spark.read.format("binaryFile")
      .option("pathGlobFilter", glob)
      .option("recursiveFileLookup", "true")
      .load(dir)

  /** Sniff media container from magic bytes — REAL (pure expressions on
    * the first payload bytes; no decode).
    */
  def withFormat(df: DataFrame, contentCol: String = "content"): DataFrame = {
    val head8 = hex(substring(col(contentCol), 1, 8))
    val head4 = hex(substring(col(contentCol), 1, 4))
    val riffType = hex(substring(col(contentCol), 9, 4))
    df.withColumn("format",
      when(head8.startsWith("89504E470D0A1A0A"), "png")
        .when(head4.startsWith("FFD8FF"), "jpeg")
        .when(head4 === "47494638", "gif")
        .when(head4 === "52494646" && riffType === "57415645", "wav")
        .when(head4 === "52494646" && riffType === "41564920", "avi")
        .when(head4 === "1A45DFA3", "mkv/webm")
        .when(hex(substring(col(contentCol), 5, 4)) === "66747970", "mp4")
        .otherwise("unknown"))
  }

  /** Feature record a real decoder would emit per media object. */
  val FeatureSchema: StructType = StructType(Seq(
    StructField("path", StringType, nullable = false),
    StructField("format", StringType, nullable = true),
    StructField("n_bytes", LongType, nullable = false),
    StructField("width", IntegerType, nullable = true),
    StructField("height", IntegerType, nullable = true),
    StructField("n_frames", IntegerType, nullable = true),
    StructField("feature", ArrayType(FloatType), nullable = true)))

  /** STUB DECODE — deterministic fake standing in for image/audio decode
    * (real codecs unavailable offline; see object doc). Mirrors the batch
    * shape of a real `mapPartitions` decoder: one iterator pass per
    * partition, no driver collect. Emits byte-statistics pseudo-features
    * (stable across runs) so downstream similarity/dedup plumbing is
    * exercisable end-to-end.
    */
  def stubDecodeFeatures(df: DataFrame, dim: Int = 8): DataFrame = {
    val spark = df.sparkSession
    val withFmt = withFormat(df)
    val rdd = withFmt.select("path", "format", "length", "content").rdd
      .mapPartitions { it =>
        it.map { r =>
          val path = r.getString(0)
          val fmt = r.getString(1)
          val bytes = Option(r.get(3))
            .map(_.asInstanceOf[Array[Byte]]).getOrElse(Array.empty[Byte])
          // fake "embedding": per-bucket byte-value means — deterministic
          val feat = new Array[Float](dim)
          if (bytes.nonEmpty) {
            val sums = new Array[Long](dim); val cnts = new Array[Long](dim)
            var i = 0
            while (i < bytes.length) {
              val b = i % dim; sums(b) += bytes(i) & 0xff; cnts(b) += 1; i += 1
            }
            var d = 0
            while (d < dim) {
              feat(d) = if (cnts(d) > 0) (sums(d).toDouble / cnts(d)).toFloat else 0f
              d += 1
            }
          }
          Row(path, fmt, r.getLong(2), null, null, null, feat.toSeq)
        }
      }
    spark.createDataFrame(rdd, FeatureSchema)
  }
}
