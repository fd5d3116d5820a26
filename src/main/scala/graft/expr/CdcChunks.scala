package graft.expr

import org.apache.spark.sql.catalyst.expressions.{Expression, UnaryExpression}
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.catalyst.util.{ArrayData, GenericArrayData}
import org.apache.spark.sql.types._
import org.apache.spark.unsafe.types.UTF8String

/** Content-defined chunking (CDC): text → array of chunk substrings,
  * with chunk boundaries decided by a rolling window hash of the LAST
  * 8 codepoints, so identical content produces identical chunks even
  * when its byte offset shifts (a prepended banner defeats fixed-size
  * chunking but realigns here after the first in-content boundary).
  * This is the storage-dedup / shifted-boilerplate-dedup primitive
  * (rsync/LBFS lineage), applied to corpus chunk dedup.
  *
  * Spec (mirrored EXACTLY by the q192 DuckDB oracle, which replays it
  * char-by-char with 7 `lag()`s — keep the two in lockstep):
  *   - positions i = 1..n index Unicode CODEPOINTS (DuckDB `substr`
  *     addresses characters, not bytes; we step by `Character.charCount`).
  *   - for i >= 8:  h_i = Σ_{j=0..7} cp(c_{i-j}) * W(j)  with
  *     W(j) = ((2j+1) * 2654435761) mod 2^30 (odd-multiplier mixing;
  *     the weighted sum stays < 2^54, BIGINT-safe for the oracle).
  *   - a chunk boundary falls AFTER position i iff h_i mod 64 == 0
  *     (expected chunk ≈ 64 chars; measured 59.3 mean / 43 median on
  *     the documents fixture).
  *   - the final chunk always ends at n; empty text → empty array.
  *
  * Why an Expression and not SQL: the declarative replay needs a
  * per-character explode (1000× row blowup) plus 7 lag windows plus a
  * per-chunk string_agg regroup — three shuffles of character rows. At
  * 100 TB that is the difference between a narrow map over documents
  * and shuffling 100 TB of single-character rows. The kernel is one
  * forward pass, zero per-char allocations, and participates in
  * whole-stage codegen via a direct static call (ShingleHashes pattern).
  */
case class CdcChunks(child: Expression) extends UnaryExpression {
  override def dataType: DataType = ArrayType(StringType, containsNull = false)
  override def prettyName: String = "cdc_chunks"

  override def nullSafeEval(input: Any): Any =
    CdcChunks.compute(input.asInstanceOf[UTF8String])

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    defineCodeGen(ctx, ev, c => s"graft.expr.CdcChunks$$.MODULE$$.compute($c)")

  override protected def withNewChildInternal(newChild: Expression): CdcChunks =
    copy(child = newChild)
}

object CdcChunks {
  // W(j) = ((2j+1) * 2654435761) mod 2^30 — duplicated as literals in
  // the q192 oracle SQL; change both or neither.
  private final val W: Array[Long] =
    Array(506952113L, 447114515L, 387276917L, 327439319L,
      267601721L, 207764123L, 147926525L, 88088927L)
  private final val WindowLen = 8
  private final val BoundaryMask = 64L

  /** Single forward pass over codepoints; shared by interpreted eval
    * and codegen. Returns the chunk substrings in document order.
    */
  def compute(text: UTF8String): ArrayData = {
    val s = text.toString
    val n = s.length // UTF-16 units; we walk codepoints within it
    val win = new Array[Long](WindowLen) // circular buffer of last 8 cps
    val out = scala.collection.mutable.ArrayBuffer.empty[UTF8String]
    var charIdx = 0
    var cpCount = 0
    var chunkStart = 0
    while (charIdx < n) {
      val cp = s.codePointAt(charIdx)
      val step = Character.charCount(cp)
      win(cpCount % WindowLen) = cp.toLong
      cpCount += 1
      if (cpCount >= WindowLen) {
        var h = 0L
        var j = 0
        while (j < WindowLen) {
          // c_{i-j} sits at buffer slot (cpCount-1-j) mod 8; cpCount>=8
          // keeps the index non-negative.
          h += win((cpCount - 1 - j) % WindowLen) * W(j)
          j += 1
        }
        if (h % BoundaryMask == 0L) {
          out += UTF8String.fromString(s.substring(chunkStart, charIdx + step))
          chunkStart = charIdx + step
        }
      }
      charIdx += step
    }
    if (chunkStart < n) out += UTF8String.fromString(s.substring(chunkStart, n))
    new GenericArrayData(out.toArray[Any])
  }
}
