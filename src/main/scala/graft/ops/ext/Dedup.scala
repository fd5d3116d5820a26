package graft.ops.ext

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.expressions.Window

/** Deduplication operators for LLM training-data pipelines (SURVEY §2.12
  * X1/X2). All paths are pure `functions._` pipelines (whole-stage
  * codegen, no UDFs) and shuffle only on the keys that define the dedup —
  * the layout that survives 100 TB.
  *
  * Exact:   content hash (sha2-256) -> one shuffle on the hash.
  * MinHash: shingle -> k salted xxhash64 minima -> LSH bands -> bucket
  *          join -> jaccard verify. Candidate generation touches only
  *          colliding buckets, never the full n^2 pair space.
  * SimHash: 64-bit fingerprint = sign-aggregate of per-token hash bits;
  *          near-dups share fingerprints (or differ in few bits).
  */
object Dedup {

  /** Exact dedup on a content hash: keeps the row with the smallest `idCol`
    * per identical `textCol` (deterministic winner — `dropDuplicates` picks
    * an arbitrary row, which breaks result reproducibility across runs).
    * One hash-shuffle; at scale this is the minimal possible plan.
    */
  def exactByHash(df: DataFrame, textCol: String, idCol: String): DataFrame = {
    val w = Window.partitionBy(sha2(col(textCol), 256)).orderBy(col(idCol))
    df.withColumn("__rn", row_number().over(w))
      .filter(col("__rn") === 1).drop("__rn")
  }

  /** Word shingles of size n (lowercased, split on non-alphanumerics).
    * Pure expression: split -> filter empties -> sliding windows via
    * transform(sequence(...)).
    */
  def shingles(text: Column, n: Int = 3): Column = {
    val toks = filter(split(lower(text), "[^a-z0-9]+"), t => length(t) > 0)
    val count = greatest(size(toks) - (n - 1), lit(1))
    array_distinct(transform(sequence(lit(0), count - 1),
      i => concat_ws(" ", slice(toks, i + 1, lit(n)))))
  }

  /** k salted 64-bit min-hashes over a shingle array column. Salting by
    * literal concat keeps every hash inside codegen'd xxhash64 — no UDF,
    * no RNG (deterministic across runs/executors).
    */
  def minhashSignature(shingleCol: Column, k: Int): Column =
    array((0 until k).map { i =>
      array_min(transform(shingleCol, s => xxhash64(concat(s, lit(s"#$i")))))
    }: _*)

  /** LSH band keys: split the k-wide signature into `bands` bands of
    * k/bands rows each; band key = hash of the band slice + band index.
    */
  def bandKeys(sigCol: Column, k: Int, bands: Int): Column = {
    val rows = k / bands
    array((0 until bands).map { b =>
      struct(lit(b).as("band"),
        xxhash64(concat_ws(",",
          slice(sigCol, b * rows + 1, rows).cast("array<string>"))).as("key"))
    }: _*)
  }

  /** Exact pairwise Jaccard over two shingle-array columns. */
  def jaccard(a: Column, b: Column): Column = {
    val inter = size(array_intersect(a, b)).cast("double")
    val uni = size(array_union(a, b)).cast("double")
    when(uni === 0, 0.0).otherwise(inter / uni)
  }

  /** MinHash-LSH near-duplicate pairs: returns (id_a, id_b, jaccard) for
    * pairs sharing >= 1 LSH bucket AND exact shingle-jaccard >= threshold,
    * id_a < id_b. The bucket join shuffles on (band, key) only; the
    * verify step computes exact jaccard just for candidates.
    */
  def minhashNearDups(df: DataFrame, textCol: String, idCol: String,
                      shingleSize: Int = 3, k: Int = 64, bands: Int = 16,
                      threshold: Double = 0.8): DataFrame = {
    val withSig = df
      .select(col(idCol).as("id"), shingles(col(textCol), shingleSize).as("sh"))
      .withColumn("sig", minhashSignature(col("sh"), k))
      .withColumn("bucket", explode(bandKeys(col("sig"), k, bands)))
      .select(col("id"), col("sh"), col("bucket"))
    val a = withSig.select(col("bucket"), col("id").as("id_a"), col("sh").as("sh_a"))
    val b = withSig.select(col("bucket"), col("id").as("id_b"), col("sh").as("sh_b"))
    a.join(b, Seq("bucket"))
      .filter(col("id_a") < col("id_b"))
      .select(col("id_a"), col("id_b"), jaccard(col("sh_a"), col("sh_b")).as("jaccard"))
      .distinct()
      .filter(col("jaccard") >= threshold)
  }

  /** 64-bit SimHash fingerprint over word tokens: for each bit position,
    * sum +1/-1 votes of each token's xxhash64 bit; fingerprint bit = sign.
    * Pure expressions (explode + groupBy) — two shuffles on the id.
    */
  def simhash(df: DataFrame, textCol: String, idCol: String): DataFrame = {
    val toks = df.select(col(idCol).as("id"),
      explode(filter(split(lower(col(textCol)), "[^a-z0-9]+"),
        t => length(t) > 0)).as("tok"))
      .withColumn("h", xxhash64(col("tok")))
    val votes = (0 until 64).map { bit =>
      sum(when(shiftright(col("h"), bit).bitwiseAND(1) === 1, 1)
        .otherwise(-1)).as(s"b$bit")
    }
    val agg = toks.groupBy(col("id")).agg(votes.head, votes.tail: _*)
    val fp = (0 until 64).map { bit =>
      when(col(s"b$bit") > 0, shiftleft(lit(1L), bit)).otherwise(0L)
    }.reduce(_.bitwiseOR(_))
    agg.select(col("id"), fp.as("simhash"))
  }

  /** Hamming distance between two 64-bit fingerprints. */
  def hamming(a: Column, b: Column): Column = bit_count(a.bitwiseXOR(b))
}
