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

  private val Signature = Array(0x89, 'H', 'D', 'F', '\r', '\n', 0x1a, '\n')
    .map(_.toByte)
  private val Undef = -1L // 0xFFFF... = undefined address

  private class Buf(bytes: Array[Byte]) {
    val bb: ByteBuffer = ByteBuffer.wrap(bytes).order(ByteOrder.LITTLE_ENDIAN)
    def u8(p: Int): Int = bb.get(p) & 0xff
    def u16(p: Int): Int = bb.getShort(p) & 0xffff
    def u32(p: Int): Long = bb.getInt(p) & 0xffffffffL
    def u64(p: Int): Long = bb.getLong(p)
    def slice(p: Int, n: Int): Array[Byte] = {
      val a = new Array[Byte](n); bb.position(p); bb.get(a); bb.position(0); a
    }
    def ascii(p: Int, n: Int): String = new String(slice(p, n), "US-ASCII")
    def cstr(p: Int): String = {
      var e = p; while (bb.get(e) != 0) e += 1
      new String(slice(p, e - p), "UTF-8")
    }
  }

  def parse(bytes: Array[Byte]): Seq[H5Dataset] = {
    val b = new Buf(bytes)
    require(bytes.length > 96 && Signature.indices.forall(i =>
      bytes(i) == Signature(i)), "not an HDF5 file (bad signature)")
    val sbVersion = b.u8(8)
    require(sbVersion == 0,
      s"unsupported superblock version $sbVersion (profile: v0)")
    require(b.u8(13) == 8 && b.u8(14) == 8,
      "unsupported offset/length size (profile: 8 bytes)")
    // root group symbol table entry at 56: scratch holds btree+heap addrs
    val rootBtree = b.u64(80)
    val rootHeap = b.u64(88)
    val out = Seq.newBuilder[H5Dataset]
    walkGroup(b, rootBtree, rootHeap, "", out)
    out.result()
  }

  // ---- group traversal ---------------------------------------------------

  private def walkGroup(b: Buf, btreeAddr: Long, heapAddr: Long,
                        prefix: String,
                        out: scala.collection.mutable.Builder[H5Dataset, _])
      : Unit = {
    require(b.ascii(heapAddr.toInt, 4) == "HEAP", "bad local heap signature")
    val heapData = b.u64(heapAddr.toInt + 24)
    walkBtree(b, btreeAddr, heapData, prefix, out)
  }

  private def walkBtree(b: Buf, addr: Long, heapData: Long, prefix: String,
                        out: scala.collection.mutable.Builder[H5Dataset, _])
      : Unit = {
    val p = addr.toInt
    require(b.ascii(p, 4) == "TREE", "bad B-tree signature")
    require(b.u8(p + 4) == 0, "expected group B-tree (node type 0)")
    val level = b.u8(p + 5)
    val n = b.u16(p + 6)
    // entries: key(len=8) child(8) pairs after 8(sig/meta)+16(siblings)
    var q = p + 24 + 8 // skip key 0
    (0 until n).foreach { _ =>
      val child = b.u64(q)
      if (level > 0) walkBtree(b, child, heapData, prefix, out)
      else walkSnod(b, child, heapData, prefix, out)
      q += 16 // child + next key
    }
  }

  private def walkSnod(b: Buf, addr: Long, heapData: Long, prefix: String,
                       out: scala.collection.mutable.Builder[H5Dataset, _])
      : Unit = {
    val p = addr.toInt
    require(b.ascii(p, 4) == "SNOD", "bad symbol node signature")
    val n = b.u16(p + 6)
    (0 until n).foreach { i =>
      val e = p + 8 + i * 40
      val nameOff = b.u64(e)
      val ohAddr = b.u64(e + 8)
      val name = b.cstr((heapData + nameOff).toInt)
      readObject(b, ohAddr, s"$prefix$name", out)
    }
  }

  // ---- object headers ----------------------------------------------------

  private case class Messages(items: Seq[(Int, Int)]) // (type, bodyPos)

  private def readMessagesV1(b: Buf, addr: Long): Messages = {
    val p = addr.toInt
    require(b.u8(p) == 1, s"unsupported object header version ${b.u8(p)}")
    var remaining = b.u16(p + 2)
    val items = Seq.newBuilder[(Int, Int)]
    // v1 prefix is 12 bytes + 4 pad; blocks may continue via msg 0x10
    var blocks = List((p + 16, b.u32(p + 8).toInt))
    while (blocks.nonEmpty && remaining > 0) {
      var (q, size) = blocks.head
      blocks = blocks.tail
      val end = q + size
      while (q + 8 <= end && remaining > 0) {
        val mtype = b.u16(q)
        val msize = b.u16(q + 2)
        val body = q + 8
        if (mtype == 0x0010) // continuation: offset(8) + length(8)
          blocks ::= ((b.u64(body).toInt, b.u64(body + 8).toInt))
        else items += ((mtype, body))
        remaining -= 1
        q = body + msize
      }
    }
    Messages(items.result())
  }

  private def readObject(b: Buf, addr: Long, path: String,
                         out: scala.collection.mutable.Builder[H5Dataset, _])
      : Unit = {
    val msgs = readMessagesV1(b, addr)
    msgs.items.find(_._1 == 0x0011) match {
      case Some((_, body)) => // symbol table message -> subgroup
        walkGroup(b, b.u64(body), b.u64(body + 8), s"$path/", out)
      case None =>
        decodeDataset(b, msgs, path).foreach(out += _)
    }
  }

  // ---- dataset decoding ---------------------------------------------------

  private def decodeDataset(b: Buf, msgs: Messages, name: String)
      : Option[H5Dataset] = {
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

    val total = dims.product.toInt
    val raw = readRawData(b, layout.get, msgs, total * size, dims, size, name)
    Some(H5Dataset(name, h5t, dims, convert(raw, h5t, total)))
  }

  private def readRawData(b: Buf, lay: Int, msgs: Messages, nBytes: Int,
                          dims: Seq[Long], elemSize: Int, name: String)
      : Array[Byte] = {
    val version = b.u8(lay)
    require(version == 3, s"unsupported layout version $version ($name)")
    b.u8(lay + 1) match {
      case 1 => // contiguous: address(8), size(8)
        val addr = b.u64(lay + 2)
        require(addr != Undef, s"dataset $name has no allocated storage")
        b.slice(addr.toInt, nBytes)
      case 2 => // chunked: dimensionality(1), btree addr(8), dims u32*
        val ndims = b.u8(lay + 2) // rank + 1 (element size dim)
        val btree = b.u64(lay + 3)
        val chunkDims = (0 until ndims - 1)
          .map(i => b.u32(lay + 11 + i * 4).toInt)
        val deflate = hasDeflate(b, msgs)
        val outArr = new Array[Byte](nBytes)
        readChunks(b, btree, chunkDims, dims.map(_.toInt), elemSize,
          deflate, outArr)
        outArr
      case c => throw new IllegalArgumentException(
        s"unsupported layout class $c ($name)")
    }
  }

  private def hasDeflate(b: Buf, msgs: Messages): Boolean =
    msgs.items.find(_._1 == 0x000B).exists { case (_, p) =>
      // filter pipeline v1: version, nfilters, 6 reserved; v2: no reserved
      val nf = b.u8(p + 1)
      var q = p + (if (b.u8(p) == 1) 8 else 2)
      (0 until nf).exists { _ =>
        val id = b.u16(q)
        val nameLen = b.u16(q + 2)
        val nvals = b.u16(q + 6)
        val pad = if (b.u8(p) == 1 && nvals % 2 == 1) 4 else if (nvals % 2 == 1) 4 else 0
        q += 8 + nameLen + nvals * 4 + pad
        id == 1
      }
    }

  /** Chunk B-tree (v1, node type 1): keys carry (chunk bytes, filter
    * mask, offset coords); children are chunk payload addresses.
    */
  private def readChunks(b: Buf, addr: Long, chunkDims: Seq[Int],
                         dims: Seq[Int], elemSize: Int, deflate: Boolean,
                         out: Array[Byte]): Unit = {
    val p = addr.toInt
    require(b.ascii(p, 4) == "TREE", "bad chunk B-tree signature")
    require(b.u8(p + 4) == 1, "expected chunk B-tree (node type 1)")
    val level = b.u8(p + 5)
    val n = b.u16(p + 6)
    val keySize = 8 + 8 * (chunkDims.size + 1)
    var q = p + 24
    (0 until n).foreach { _ =>
      val chunkBytes = b.u32(q).toInt
      val coords = chunkDims.indices.map(i => b.u64(q + 8 + i * 8).toInt)
      val child = b.u64(q + keySize)
      if (level > 0)
        readChunks(b, child, chunkDims, dims, elemSize, deflate, out)
      else {
        val rawChunk = b.slice(child.toInt, chunkBytes)
        val data = if (deflate) inflate(rawChunk) else rawChunk
        copyChunk(data, coords, chunkDims, dims, elemSize, out)
      }
      q += keySize + 8
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

  /** Copy a (possibly edge-clipped) chunk into the row-major output. */
  private def copyChunk(chunk: Array[Byte], coords: Seq[Int],
                        chunkDims: Seq[Int], dims: Seq[Int], elemSize: Int,
                        out: Array[Byte]): Unit = {
    if (dims.size == 1) {
      val start = coords.head
      val copyElems = math.min(chunkDims.head, dims.head - start)
      System.arraycopy(chunk, 0, out, start * elemSize,
        copyElems * elemSize)
    } else { // rank 2, row-major
      val Seq(rows, cols) = dims
      val Seq(cRows, cCols) = chunkDims
      val r0 = coords(0); val c0 = coords(1)
      val copyRows = math.min(cRows, rows - r0)
      val copyCols = math.min(cCols, cols - c0)
      var r = 0
      while (r < copyRows) {
        System.arraycopy(chunk, r * cCols * elemSize,
          out, ((r0 + r) * cols + c0) * elemSize, copyCols * elemSize)
        r += 1
      }
    }
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
