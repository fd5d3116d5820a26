package graft.expr

import org.apache.spark.sql.catalyst.analysis.TypeCheckResult
import org.apache.spark.sql.catalyst.expressions.{Expression, UnaryExpression}
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.types.{DataType, LongType, StringType}
import org.apache.spark.unsafe.types.UTF8String

/** Deflate-compressed byte length of a string — the primitive under
  * the compression-ratio quality gate (the Gopher/FineWeb
  * "repetitiousness" signal: natural text compresses to a stable band;
  * templated/repetitive text compresses far below it, random noise
  * not at all). A codegen'd native expression for the same reason as
  * [[ShingleHashes]]: this runs once per document on the full text,
  * and a Scala UDF would break whole-stage codegen on every quality
  * scan that uses it.
  *
  * Determinism: java.util.zip.Deflater (zlib) at a FIXED level (6),
  * default strategy, one full-flush deflate of the UTF-8 bytes. Only
  * the LENGTH surfaces, never the compressed bytes, and the length is
  * deterministic for a given input on a given zlib — so queries built
  * on it expose engine-portable INVARIANTS (bounds, class orderings)
  * to the oracle rather than raw lengths (the q14/q17 discipline).
  *
  * The Deflater instance is thread-local and reset per call — per-row
  * allocation of a native zlib stream would dominate the scan.
  */
case class DeflateLen(child: Expression) extends UnaryExpression {
  override def checkInputDataTypes(): TypeCheckResult =
    if (child.dataType == StringType) TypeCheckResult.TypeCheckSuccess
    else TypeCheckResult.TypeCheckFailure(
      s"deflate_len needs a string input, got ${child.dataType}")

  override def dataType: DataType = LongType
  override def prettyName: String = "deflate_len"

  override def nullSafeEval(input: Any): Any =
    DeflateLen.compute(input.asInstanceOf[UTF8String])

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    defineCodeGen(ctx, ev, c =>
      s"graft.expr.DeflateLen$$.MODULE$$.compute($c)")

  override protected def withNewChildInternal(newChild: Expression): DeflateLen =
    copy(child = newChild)
}

object DeflateLen {
  // ends each thread's native zlib stream promptly once its thread
  // dies (the JDK's own internal cleaner frees it only at Deflater GC;
  // an executor that cycles thread pools would otherwise pin a native
  // stream per dead thread until then)
  private val cleaner = java.lang.ref.Cleaner.create()
  private val local = new ThreadLocal[java.util.zip.Deflater] {
    override def initialValue(): java.util.zip.Deflater = {
      val d = new java.util.zip.Deflater(6)
      cleaner.register(Thread.currentThread(), () => d.end())
      d
    }
  }
  private val buf = new ThreadLocal[Array[Byte]] {
    override def initialValue(): Array[Byte] = new Array[Byte](1 << 16)
  }

  def compute(s: UTF8String): Long = {
    val in = s.getBytes
    val d = local.get()
    d.reset()
    d.setInput(in)
    d.finish()
    var total = 0L
    val out = buf.get()
    while (!d.finished()) total += d.deflate(out)
    total
  }
}
