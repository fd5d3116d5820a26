package graft.expr

import java.nio.ByteBuffer

import org.apache.spark.sql.catalyst.InternalRow
import org.apache.spark.sql.catalyst.expressions.aggregate.TypedImperativeAggregate
import org.apache.spark.sql.catalyst.expressions.{Expression, GenericInternalRow}
import org.apache.spark.sql.catalyst.trees.UnaryLike
import org.apache.spark.sql.catalyst.util.{ArrayData, GenericArrayData}
import org.apache.spark.sql.types._

/** Native one-pass Gram-moment accumulator: the d² split-long cell sums
  * of Σ x·xᵀ over a corpus of double vectors, as a single
  * TypedImperativeAggregate.
  *
  * BIT-EXACT twin of the composed form it replaces (the
  * posexplode → id-equi-self-join → groupBy(i,j) build that
  * [[graft.ops.ext.Spectral.dominantEigen]] used): per (i,j) cell and
  * per row,
  *
  *   q  = floor((x_i·x_j + 4)·10⁸ + 0.5)  as a long
  *   n  += 1                 (even when either element is null — the
  *                            join's count(1) counted null-x rows)
  *   hi += q >> 20,  lo += q & 0xFFFFF     (skipped when either element
  *                            is null — sum() skips null q)
  *
  * identical quantization, identical hi/lo split, and long addition is
  * exactly associative+commutative, so partial aggregation order cannot
  * change a single bit. The join form streamed n·d² rows through a
  * shuffle-side hash aggregate (245 M rows for the sf0.1 embeddings
  * corpus — q146's entire 5–9 s); this kernel does the same d² updates
  * in a register-resident while-loop per input row, one buffer per
  * partition, and ships exactly 3·d² longs per partition to the merge.
  * That is the 100 TB shape: work O(n·d²) flops but traffic O(d²) per
  * partition, independent of n.
  *
  * Semantics contract (matches the join at its one call site): one
  * input row = one `id` group — callers with duplicate ids must
  * pre-combine, and elements past `dims` are ignored. Finite inputs
  * assumed (embedding envelope |x| ≤ 2 keeps q non-negative; the
  * equivalence for NaN/Inf is not claimed, same as the composed form's
  * scaladoc).
  *
  * Output: array<struct<i,j,n,hi,lo>> of the d² cells in row-major
  * order — the caller explodes (d² rows, trivial) and recombines
  * hi·2²⁰ + lo exactly as before.
  */
case class GramMoments(
    child: Expression,
    dims: Int,
    mutableAggBufferOffset: Int = 0,
    inputAggBufferOffset: Int = 0)
  extends TypedImperativeAggregate[Array[Long]] with UnaryLike[Expression] {

  private def d2 = dims * dims

  override def prettyName: String = "gram_moments"
  override def nullable: Boolean = false
  override def dataType: DataType = ArrayType(StructType(Seq(
    StructField("i", LongType, nullable = false),
    StructField("j", LongType, nullable = false),
    StructField("n", LongType, nullable = false),
    StructField("hi", LongType, nullable = false),
    StructField("lo", LongType, nullable = false))), containsNull = false)

  // layout: [n | hi | lo] blocks of d² longs each, row-major (i·dims+j)
  override def createAggregationBuffer(): Array[Long] = new Array[Long](3 * d2)

  override def update(buf: Array[Long], input: InternalRow): Array[Long] = {
    val a = child.eval(input)
    if (a == null) return buf
    val arr = a.asInstanceOf[ArrayData]
    val len = math.min(arr.numElements(), dims)
    val xs = new Array[Double](len)
    val ok = new Array[Boolean](len)
    var i = 0
    while (i < len) {
      if (!arr.isNullAt(i)) { ok(i) = true; xs(i) = arr.getDouble(i) }
      i += 1
    }
    i = 0
    while (i < len) {
      val base = i * dims
      if (ok(i)) {
        val xi = xs(i)
        var j = 0
        while (j < len) {
          buf(base + j) += 1L
          if (ok(j)) {
            val q = math.floor((xi * xs(j) + 4.0) * 1e8 + 0.5).toLong
            buf(d2 + base + j) += q >> 20
            buf(2 * d2 + base + j) += q & 1048575L
          }
          j += 1
        }
      } else {
        var j = 0
        while (j < len) { buf(base + j) += 1L; j += 1 }
      }
      i += 1
    }
    buf
  }

  override def merge(buf: Array[Long], other: Array[Long]): Array[Long] = {
    var k = 0
    while (k < buf.length) { buf(k) += other(k); k += 1 }
    buf
  }

  override def eval(buf: Array[Long]): Any = {
    val out = new Array[Any](d2)
    var i = 0
    while (i < dims) {
      var j = 0
      while (j < dims) {
        val c = i * dims + j
        out(c) = new GenericInternalRow(Array[Any](
          i.toLong, j.toLong, buf(c), buf(d2 + c), buf(2 * d2 + c)))
        j += 1
      }
      i += 1
    }
    new GenericArrayData(out)
  }

  override def serialize(buf: Array[Long]): Array[Byte] = {
    val bb = ByteBuffer.allocate(8 * buf.length)
    bb.asLongBuffer().put(buf)
    bb.array()
  }

  override def deserialize(bytes: Array[Byte]): Array[Long] = {
    val buf = new Array[Long](bytes.length / 8)
    ByteBuffer.wrap(bytes).asLongBuffer().get(buf)
    buf
  }

  override def withNewMutableAggBufferOffset(newOffset: Int): GramMoments =
    copy(mutableAggBufferOffset = newOffset)
  override def withNewInputAggBufferOffset(newOffset: Int): GramMoments =
    copy(inputAggBufferOffset = newOffset)
  override protected def withNewChildInternal(newChild: Expression): GramMoments =
    copy(child = newChild)
}
