package graft.io

import java.nio.{ByteBuffer, ByteOrder}

/** Minimal pure-JVM HDF5 (r)reader — SURVEY §2.1 S11, the north-star
  * "HDF to Parquet" path. No HDF5 library exists on this classpath
  * (zero-egress), so the format is decoded directly from the public
  * HDF5 File Format Specification (superblock v0, v1 object headers,
  * v1 B-trees, local heaps, symbol tables).
  *
  * Supported profile (what default-configured writers emit):
  *  - superblock version 0 (8-byte offsets/lengths, base address 0)
  *  - groups via symbol tables (v1 B-tree + local heap + SNOD), nested
  *  - datasets: v1 object headers (+ continuation messages), simple
  *    dataspace (rank 1-2), fixed-point and IEEE-float datatypes
  *    (little-endian, 1/2/4/8 bytes), layout v3 contiguous AND chunked
  *    (v1 B-tree node type 1) with optional deflate filter
  *
  * Everything else raises a clear error instead of misreading.
  *
  * Access is through [[H5In]] (positioned reads, Long offsets): a whole
  * file in memory ([[BytesIn]]) or seekable storage of any size — the
  * DataSource V2 wrapper ([[Hdf5DataSource]]) reads metadata once and
  * then only the chunk byte-ranges its row split needs, so file size is
  * not bounded by a single task's memory.
  */
object Hdf5Format {

  sealed trait H5Type { def byteSize: Int }
  case class H5Int(byteSize: Int, signed: Boolean) extends H5Type
  case class H5Float(byteSize: Int) extends H5Type

  /** One decoded dataset: `data` is an Array[Long] (all integer widths
    * widened) or Array[Double] (both float widths widened); `dims` is
    * the logical shape (row-major).
    */
  case class H5Dataset(name: String, dtype: H5Type, dims: Seq[Long],
                       data: AnyRef) {
    def rows: Long = if (dims.isEmpty) 1L else dims.head
  }

  /** Raw-storage description of one dataset (no payload decoded). */
  sealed trait Storage
  case class Contiguous(addr: Long) extends Storage
  case class ChunkRef(rowStart: Long, colStart: Long, addr: Long,
                      nBytes: Int)
  case class Chunked(chunkDims: Seq[Int], deflate: Boolean,
                     chunks: Seq[ChunkRef]) extends Storage

  /** Parsed dataset metadata: everything needed to plan and execute a
    * row-range read without touching payload bytes.
    */
  case class H5DatasetMeta(name: String, dtype: H5Type, dims: Seq[Long],
                           storage: Storage) {
    def rows: Long = if (dims.isEmpty) 1L else dims.head
    /** Elements per row (1 for rank-1, row width for rank-2). */
    def rowElems: Int = if (dims.size <= 1) 1 else dims(1).toInt
    def rowBytes: Long = rowElems.toLong * dtype.byteSize
  }

  private val Signature = Array(0x89, 'H', 'D', 'F', '\r', '\n', 0x1a, '\n')
    .map(_.toByte)
  private val Undef = -1L // 0xFFFF... = undefined address

  /** Positioned-read access to HDF5 bytes (all offsets Long). */
  trait H5In {
    def length: Long
    def slice(p: Long, n: Int): Array[Byte]
    def u8(p: Long): Int = slice(p, 1)(0) & 0xff
    def u16(p: Long): Int = wrap(slice(p, 2)).getShort & 0xffff
    def u32(p: Long): Long = wrap(slice(p, 4)).getInt & 0xffffffffL
    def u64(p: Long): Long = wrap(slice(p, 8)).getLong
    def ascii(p: Long, n: Int): String = new String(slice(p, n), "US-ASCII")
    def cstr(p: Long): String = {
      val sb = new java.io.ByteArrayOutputStream()
      var q = p
      var b = u8(q)
      while (b != 0) { sb.write(b); q += 1; b = u8(q) }
      new String(sb.toByteArray, "UTF-8")
    }
    private def wrap(a: Array[Byte]) =
      ByteBuffer.wrap(a).order(ByteOrder.LITTLE_ENDIAN)
  }

  /** Whole file in memory. */
  class BytesIn(bytes: Array[Byte]) extends H5In {
    def length: Long = bytes.length.toLong
    def slice(p: Long, n: Int): Array[Byte] = {
      val a = new Array[Byte](n)
      System.arraycopy(bytes, p.toInt, a, 0, n)
      a
    }
  }

  /** Whole-file parse (profile check + every dataset fully decoded). */
  def parse(bytes: Array[Byte]): Seq[H5Dataset] = {
    val in = new BytesIn(bytes)
    parseMeta(in).map(m => readRows(in, m, 0L, m.rows))
  }

  /** Structure-only parse: walks groups/object headers/chunk B-trees and
    * returns per-dataset metadata. Touches only metadata bytes — for a
    * chunked 100 GB file this is a few KB of reads.
    */
  def parseMeta(in: H5In): Seq[H5DatasetMeta] = {
    require(in.length > 96 && in.slice(0, 8).sameElements(Signature),
      "not an HDF5 file (bad signature)")
    val sbVersion = in.u8(8)
    require(sbVersion == 0,
      s"unsupported superblock version $sbVersion (profile: v0)")
    require(in.u8(13) == 8 && in.u8(14) == 8,
      "unsupported offset/length size (profile: 8 bytes)")
    // root group symbol table entry at 56: scratch holds btree+heap addrs
    val rootBtree = in.u64(80)
    val rootHeap = in.u64(88)
    val out = Seq.newBuilder[H5DatasetMeta]
    walkGroup(in, rootBtree, rootHeap, "", out)
    out.result()
  }

  // ---- group traversal ---------------------------------------------------

  private def walkGroup(b: H5In, btreeAddr: Long, heapAddr: Long,
                        prefix: String,
                        out: scala.collection.mutable.Builder[H5DatasetMeta, _])
      : Unit = {
    require(b.ascii(heapAddr, 4) == "HEAP", "bad local heap signature")
    val heapData = b.u64(heapAddr + 24)
    walkBtree(b, btreeAddr, heapData, prefix, out)
  }

  private def walkBtree(b: H5In, addr: Long, heapData: Long, prefix: String,
                        out: scala.collection.mutable.Builder[H5DatasetMeta, _])
      : Unit = {
    require(b.ascii(addr, 4) == "TREE", "bad B-tree signature")
    require(b.u8(addr + 4) == 0, "expected group B-tree (node type 0)")
    val level = b.u8(addr + 5)
    val n = b.u16(addr + 6)
    // entries: key(len=8) child(8) pairs after 8(sig/meta)+16(siblings)
    var q = addr + 24 + 8 // skip key 0
    (0 until n).foreach { _ =>
      val child = b.u64(q)
      if (level > 0) walkBtree(b, child, heapData, prefix, out)
      else walkSnod(b, child, heapData, prefix, out)
      q += 16 // child + next key
    }
  }

  private def walkSnod(b: H5In, addr: Long, heapData: Long, prefix: String,
                       out: scala.collection.mutable.Builder[H5DatasetMeta, _])
      : Unit = {
    require(b.ascii(addr, 4) == "SNOD", "bad symbol node signature")
    val n = b.u16(addr + 6)
    (0 until n).foreach { i =>
      val e = addr + 8 + i * 40
      val nameOff = b.u64(e)
      val ohAddr = b.u64(e + 8)
      val name = b.cstr(heapData + nameOff)
      readObject(b, ohAddr, s"$prefix$name", out)
    }
  }

  // ---- object headers ----------------------------------------------------

  private case class Messages(items: Seq[(Int, Long)]) // (type, bodyPos)

  private def readMessagesV1(b: H5In, addr: Long): Messages = {
    require(b.u8(addr) == 1,
      s"unsupported object header version ${b.u8(addr)}")
    var remaining = b.u16(addr + 2)
    val items = Seq.newBuilder[(Int, Long)]
    // v1 prefix is 12 bytes + 4 pad; blocks may continue via msg 0x10
    var blocks = List((addr + 16, b.u32(addr + 8)))
    while (blocks.nonEmpty && remaining > 0) {
      var (q, size) = blocks.head
      blocks = blocks.tail
      val end = q + size
      while (q + 8 <= end && remaining > 0) {
        val mtype = b.u16(q)
        val msize = b.u16(q + 2)
        val body = q + 8
        if (mtype == 0x0010) // continuation: offset(8) + length(8)
          blocks ::= ((b.u64(body), b.u64(body + 8)))
        else items += ((mtype, body))
        remaining -= 1
        q = body + msize
      }
    }
    Messages(items.result())
  }

  private def readObject(b: H5In, addr: Long, path: String,
                         out: scala.collection.mutable.Builder[H5DatasetMeta, _])
      : Unit = {
    val msgs = readMessagesV1(b, addr)
    msgs.items.find(_._1 == 0x0011) match {
      case Some((_, body)) => // symbol table message -> subgroup
        walkGroup(b, b.u64(body), b.u64(body + 8), s"$path/", out)
      case None =>
        datasetMeta(b, msgs, path).foreach(out += _)
    }
  }

  // ---- dataset metadata ----------------------------------------------------

  private def datasetMeta(b: H5In, msgs: Messages, name: String)
      : Option[H5DatasetMeta] = {
    val space = msgs.items.find(_._1 == 0x0001).map(_._2)
    val dtype = msgs.items.find(_._1 == 0x0003).map(_._2)
    val layout = msgs.items.find(_._1 == 0x0008).map(_._2)
    if (space.isEmpty || dtype.isEmpty || layout.isEmpty) return None

    // dataspace v1: version, rank, flags, 5 reserved, dims
    val sp = space.get
    val spVersion = b.u8(sp)
    val (rank, dimsPos) = spVersion match {
      case 1 => (b.u8(sp + 1), sp + 8)
      case 2 => (b.u8(sp + 1), sp + 4)
      case v => throw new IllegalArgumentException(s"dataspace v$v")
    }
    require(rank >= 1 && rank <= 2, s"unsupported rank $rank for $name")
    val dims = (0 until rank).map(i => b.u64(dimsPos + i * 8))

    // datatype: class+version byte, bitfields, size
    val dt = dtype.get
    val cls = b.u8(dt) & 0x0f
    val size = b.u32(dt + 4).toInt
    val bits0 = b.u8(dt + 1)
    require((bits0 & 1) == 0, s"big-endian data unsupported ($name)")
    val h5t: H5Type = cls match {
      case 0 => H5Int(size, signed = (bits0 & 0x08) != 0)
      case 1 => H5Float(size)
      case c => throw new IllegalArgumentException(
        s"unsupported datatype class $c for $name")
    }

    val lay = layout.get
    val version = b.u8(lay)
    require(version == 3, s"unsupported layout version $version ($name)")
    val storage = b.u8(lay + 1) match {
      case 1 => // contiguous: address(8), size(8)
        val addr = b.u64(lay + 2)
        require(addr != Undef, s"dataset $name has no allocated storage")
        Contiguous(addr)
      case 2 => // chunked: dimensionality(1), btree addr(8), dims u32*
        val ndims = b.u8(lay + 2) // rank + 1 (element size dim)
        val btree = b.u64(lay + 3)
        val chunkDims = (0 until ndims - 1)
          .map(i => b.u32(lay + 11 + i * 4).toInt)
        val refs = Seq.newBuilder[ChunkRef]
        collectChunks(b, btree, chunkDims.size, refs)
        Chunked(chunkDims, hasDeflate(b, msgs), refs.result())
      case c => throw new IllegalArgumentException(
        s"unsupported layout class $c ($name)")
    }
    Some(H5DatasetMeta(name, h5t, dims, storage))
  }

  private def hasDeflate(b: H5In, msgs: Messages): Boolean =
    msgs.items.find(_._1 == 0x000B).exists { case (_, p) =>
      // filter pipeline v1 only (8-byte header incl. reserved; name
      // padded to a multiple of 8; client data padded to even count).
      // v2 lays fields out differently (no name-length for ids < 256,
      // no padding) — reject rather than mis-walk.
      val version = b.u8(p)
      require(version == 1,
        s"unsupported filter pipeline version $version (profile: v1)")
      val nf = b.u8(p + 1)
      var q = p + 8
      (0 until nf).exists { _ =>
        val id = b.u16(q)
        val nameLen = b.u16(q + 2)
        val nvals = b.u16(q + 6)
        val namePad = (8 - nameLen % 8) % 8
        val valPad = if (nvals % 2 == 1) 4 else 0
        q += 8 + nameLen + namePad + nvals * 4 + valPad
        id == 1
      }
    }

  /** Chunk B-tree (v1, node type 1): keys carry (chunk bytes, filter
    * mask, offset coords); children are chunk payload addresses.
    */
  private def collectChunks(b: H5In, addr: Long, nCoordDims: Int,
                            out: scala.collection.mutable.Builder[ChunkRef, _])
      : Unit = {
    require(b.ascii(addr, 4) == "TREE", "bad chunk B-tree signature")
    require(b.u8(addr + 4) == 1, "expected chunk B-tree (node type 1)")
    val level = b.u8(addr + 5)
    val n = b.u16(addr + 6)
    val keySize = 8 + 8 * (nCoordDims + 1)
    var q = addr + 24
    (0 until n).foreach { _ =>
      val chunkBytes = b.u32(q).toInt
      val rowStart = b.u64(q + 8)
      val colStart = if (nCoordDims > 1) b.u64(q + 16) else 0L
      val child = b.u64(q + keySize)
      if (level > 0) collectChunks(b, child, nCoordDims, out)
      else out += ChunkRef(rowStart, colStart, child, chunkBytes)
      q += keySize + 8
    }
  }

  // ---- row-range decoding --------------------------------------------------

  /** Decode rows [r0, r1) of one dataset into an [[H5Dataset]] whose
    * leading dimension is (r1 - r0). Contiguous storage reads exactly
    * the row byte-range; chunked storage reads (and inflates) only the
    * chunks overlapping the range.
    */
  def readRows(in: H5In, m: H5DatasetMeta, r0: Long, r1: Long): H5Dataset = {
    require(r0 >= 0 && r1 <= m.rows && r0 <= r1,
      s"row range [$r0,$r1) out of [0,${m.rows}) for ${m.name}")
    val nRows = (r1 - r0).toInt
    val elemSize = m.dtype.byteSize
    val outBytes = nRows.toLong * m.rowBytes
    require(outBytes <= Int.MaxValue - 8,
      s"row range [$r0,$r1) of ${m.name} exceeds one task's buffer; " +
        "split into more partitions")
    val raw = new Array[Byte](outBytes.toInt)
    m.storage match {
      case Contiguous(addr) =>
        readRange(in, addr + r0 * m.rowBytes, raw, 0, raw.length)
      case Chunked(chunkDims, deflate, chunks) =>
        val cRows = chunkDims.head
        val cCols = if (chunkDims.size > 1) chunkDims(1) else 1
        val cols = m.rowElems
        chunks.foreach { c =>
          if (c.rowStart < r1 && c.rowStart + cRows > r0) {
            val chunkRaw = in.slice(c.addr, c.nBytes)
            val data = if (deflate) inflate(chunkRaw) else chunkRaw
            // rows of this chunk clipped to the requested range + the
            // dataset's true extent (edge chunks over-allocate)
            val rowLo = math.max(c.rowStart, r0)
            val rowHi = math.min(math.min(c.rowStart + cRows, r1), m.rows)
            val copyCols = math.min(cCols.toLong,
              cols - c.colStart).toInt
            var r = rowLo
            while (r < rowHi) {
              System.arraycopy(
                data, (((r - c.rowStart) * cCols) * elemSize).toInt,
                raw, (((r - r0) * cols + c.colStart) * elemSize).toInt,
                copyCols * elemSize)
              r += 1
            }
          }
        }
    }
    val outDims =
      if (m.dims.size <= 1) Seq(nRows.toLong)
      else Seq(nRows.toLong, m.dims(1))
    H5Dataset(m.name, m.dtype, outDims,
      convert(raw, m.dtype, nRows * m.rowElems))
  }

  /** Bulk read that tolerates `slice` size limits by chunking. */
  private def readRange(in: H5In, src: Long, dst: Array[Byte],
                        dstOff: Int, n: Int): Unit = {
    val step = 1 << 24 // 16 MiB per positioned read
    var done = 0
    while (done < n) {
      val take = math.min(step, n - done)
      val part = in.slice(src + done, take)
      System.arraycopy(part, 0, dst, dstOff + done, take)
      done += take
    }
  }

  private def inflate(in: Array[Byte]): Array[Byte] = {
    val inf = new java.util.zip.Inflater()
    inf.setInput(in)
    val buf = new java.io.ByteArrayOutputStream(in.length * 4)
    val tmp = new Array[Byte](8192)
    while (!inf.finished()) {
      val n = inf.inflate(tmp)
      if (n == 0 && inf.needsInput()) throw new IllegalStateException(
        "truncated deflate stream in HDF5 chunk")
      buf.write(tmp, 0, n)
    }
    inf.end()
    buf.toByteArray
  }

  private def convert(raw: Array[Byte], t: H5Type, n: Int): AnyRef = {
    val bb = ByteBuffer.wrap(raw).order(ByteOrder.LITTLE_ENDIAN)
    t match {
      case H5Int(sz, signed) =>
        val a = new Array[Long](n)
        var i = 0
        while (i < n) {
          a(i) = sz match {
            case 1 => if (signed) bb.get(i).toLong else (bb.get(i) & 0xff).toLong
            case 2 => if (signed) bb.getShort(i * 2).toLong
                      else (bb.getShort(i * 2) & 0xffff).toLong
            case 4 => if (signed) bb.getInt(i * 4).toLong
                      else bb.getInt(i * 4) & 0xffffffffL
            case 8 => bb.getLong(i * 8)
            case s => throw new IllegalArgumentException(s"int size $s")
          }
          i += 1
        }
        a
      case H5Float(sz) =>
        val a = new Array[Double](n)
        var i = 0
        while (i < n) {
          a(i) = sz match {
            case 4 => bb.getFloat(i * 4).toDouble
            case 8 => bb.getDouble(i * 8)
            case s => throw new IllegalArgumentException(s"float size $s")
          }
          i += 1
        }
        a
    }
  }
}
