package graft.io

import java.nio.{ByteBuffer, ByteOrder}
import java.nio.file.{Files, Paths}

/** Minimal HDF5 WRITER — fixture/export tooling for [[Hdf5Format]].
  *
  * This exists because no HDF5 library (or h5py) is available in the
  * zero-egress environment: tests and the S11 demo query need real
  * HDF5 bytes, so we emit the same default profile libhdf5 writes
  * (superblock v0, root symbol table, v1 object headers, contiguous or
  * chunked+deflate layout, little-endian scalar types). The reader is
  * written against the public spec, not against this writer — the spec
  * pins both.
  */
object Hdf5Writer {

  sealed trait DType { def size: Int; def cls: Int }
  case object I32 extends DType { val size = 4; val cls = 0 }
  case object I64 extends DType { val size = 8; val cls = 0 }
  case object F32 extends DType { val size = 4; val cls = 1 }
  case object F64 extends DType { val size = 8; val cls = 1 }

  /** data: Array[Long] for I32/I64, Array[Double] for F32/F64;
    * dims row-major (rank 1 or 2).
    */
  case class Ds(name: String, dtype: DType, dims: Seq[Int], data: AnyRef,
                chunkDims: Option[Seq[Int]] = None, deflate: Boolean = false)

  private val Undef = Array.fill[Byte](8)(0xff.toByte)

  private class W {
    private var buf = new Array[Byte](1 << 16)
    var pos = 0
    private def ensure(n: Int): Unit =
      if (pos + n > buf.length) {
        val nb = new Array[Byte](math.max(buf.length * 2, pos + n))
        System.arraycopy(buf, 0, nb, 0, pos); buf = nb
      }
    def u8(v: Int): Unit = { ensure(1); buf(pos) = v.toByte; pos += 1 }
    def u16(v: Int): Unit = { ensure(2)
      buf(pos) = v.toByte; buf(pos + 1) = (v >> 8).toByte; pos += 2 }
    def u32(v: Long): Unit = { ensure(4)
      var i = 0; while (i < 4) { buf(pos + i) = (v >> (8 * i)).toByte; i += 1 }
      pos += 4 }
    def u64(v: Long): Unit = { ensure(8)
      var i = 0; while (i < 8) { buf(pos + i) = (v >> (8 * i)).toByte; i += 1 }
      pos += 8 }
    def bytes(b: Array[Byte]): Unit = { ensure(b.length)
      System.arraycopy(b, 0, buf, pos, b.length); pos += b.length }
    def pad8(): Unit = while (pos % 8 != 0) u8(0)
    def patch64(at: Int, v: Long): Unit = {
      var i = 0; while (i < 8) { buf(at + i) = (v >> (8 * i)).toByte; i += 1 } }
    def patch32(at: Int, v: Long): Unit = {
      var i = 0; while (i < 4) { buf(at + i) = (v >> (8 * i)).toByte; i += 1 } }
    def result: Array[Byte] = java.util.Arrays.copyOf(buf, pos)
  }

  def write(path: String, datasets: Seq[Ds]): Unit =
    Files.write(Paths.get(path), encode(datasets))

  def encode(datasets: Seq[Ds]): Array[Byte] = {
    val w = new W

    // ---- superblock v0 (96 bytes), addresses patched at the end ----
    w.bytes(Array(0x89, 'H', 'D', 'F', '\r', '\n', 0x1a, '\n').map(_.toByte))
    w.u8(0); w.u8(0); w.u8(0); w.u8(0) // sb ver, free ver, root ver, resv
    w.u8(0); w.u8(8); w.u8(8); w.u8(0) // shared ver, offsets, lengths, resv
    w.u16(4); w.u16(16)                // group leaf k, internal k
    w.u32(0)                           // consistency flags
    w.u64(0)                           // base address
    w.bytes(Undef)                     // free space
    val eofPatch = w.pos; w.u64(0)     // end of file (patched)
    w.bytes(Undef)                     // driver info
    // root symbol table entry
    w.u64(0)                           // link name offset
    val rootOhPatch = w.pos; w.u64(0)  // object header addr (patched)
    w.u32(1); w.u32(0)                 // cache type 1, reserved
    val rootBtreePatch = w.pos; w.u64(0)
    val rootHeapPatch = w.pos; w.u64(0)
    require(w.pos == 96)

    // ---- local heap with dataset names ----
    val nameOffsets = scala.collection.mutable.Map[String, Long]()
    val heapData = {
      val hw = new W
      hw.u64(0) // offset 0 reserved (empty name)
      datasets.foreach { d =>
        nameOffsets(d.name) = hw.pos.toLong
        hw.bytes(d.name.getBytes("UTF-8")); hw.u8(0); hw.pad8()
      }
      hw.result
    }
    val heapAddr = w.pos
    w.bytes("HEAP".getBytes("US-ASCII"))
    w.u8(0); w.u8(0); w.u8(0); w.u8(0)
    w.u64(heapData.length.toLong)      // data segment size
    w.u64(heapData.length.toLong)      // free list head: none (== size)
    val heapDataPatch = w.pos; w.u64(0)
    val heapDataAddr = w.pos
    w.patch64(heapDataPatch, heapDataAddr.toLong)
    w.bytes(heapData)

    // ---- root group object header: one symbol table message ----
    val rootOhAddr = w.pos
    w.u8(1); w.u8(0)                   // version, reserved
    w.u16(1)                           // nmessages
    w.u32(1)                           // refcount
    w.u32(24)                          // header size (one 16B msg + 8B hdr)
    w.u32(0)                           // padding to 16-byte prefix
    w.u16(0x0011); w.u16(16); w.u8(0); w.u8(0); w.u8(0); w.u8(0)
    val stBtreePatch = w.pos; w.u64(0)
    val stHeapPatch = w.pos; w.u64(0)

    // ---- dataset object headers + data ----
    val ohAddrs = datasets.map(d => d.name -> writeDataset(w, d)).toMap

    // ---- group B-tree (one leaf) + SNOD ----
    val snodAddr = w.pos
    w.bytes("SNOD".getBytes("US-ASCII"))
    w.u8(1); w.u8(0)
    w.u16(datasets.size)
    val sorted = datasets.sortBy(_.name) // symbol tables are name-ordered
    sorted.foreach { d =>
      w.u64(nameOffsets(d.name))
      w.u64(ohAddrs(d.name))
      w.u32(0); w.u32(0)               // cache type 0 (not a group)
      w.bytes(new Array[Byte](16))     // scratch
    }
    w.pad8()

    val btreeAddr = w.pos
    w.bytes("TREE".getBytes("US-ASCII"))
    w.u8(0); w.u8(0)                   // node type 0, level 0
    w.u16(1)                           // one child (the SNOD)
    w.bytes(Undef); w.bytes(Undef)     // siblings
    w.u64(0)                           // key 0
    w.u64(snodAddr.toLong)             // child 0
    w.u64(nameOffsets(sorted.last.name)) // key 1 (largest name)

    // ---- patches ----
    w.patch64(eofPatch, w.pos.toLong)
    w.patch64(rootOhPatch, rootOhAddr.toLong)
    w.patch64(rootBtreePatch, btreeAddr.toLong)
    w.patch64(rootHeapPatch, heapAddr.toLong)
    w.patch64(stBtreePatch, btreeAddr.toLong)
    w.patch64(stHeapPatch, heapAddr.toLong)
    w.result
  }

  /** Writes one dataset's object header (+ its raw/chunked data) and
    * returns the object header address.
    */
  private def writeDataset(w: W, d: Ds): Long = {
    val raw = encodeData(d)
    val rank = d.dims.size

    // message bodies ---------------------------------------------------
    val spaceBody = { val b = new W
      b.u8(1); b.u8(rank); b.u8(0); b.u8(0); b.u32(0)
      d.dims.foreach(x => b.u64(x.toLong)); b.pad8(); b.result }
    val typeBody = { val b = new W
      b.u8(0x10 | d.dtype.cls) // version 1, class
      d.dtype match {
        case I32 | I64 => b.u8(0x08); b.u8(0); b.u8(0) // signed, LE
          b.u32(d.dtype.size.toLong); b.u16(0); b.u16(d.dtype.size * 8)
        case F32 => b.u8(0x20); b.u8(0x3f); b.u8(0)    // IEEE LE
          b.u32(4L); b.u16(0); b.u16(32)
          b.u8(23); b.u8(8); b.u8(0); b.u8(23); b.u32(127L)
        case F64 => b.u8(0x20); b.u8(0x3f); b.u8(0)
          b.u32(8L); b.u16(0); b.u16(64)
          b.u8(52); b.u8(11); b.u8(0); b.u8(52); b.u32(1023L)
      }
      b.pad8(); b.result }

    d.chunkDims match {
      case None =>
        // contiguous: layout body needs the data address -> write data
        // after the header; the address is patched.
        val layoutBody = { val b = new W
          b.u8(3); b.u8(1); b.u64(0); b.u64(raw.length.toLong)
          b.pad8(); b.result }
        val msgs = Seq((0x0001, spaceBody), (0x0003, typeBody),
          (0x0008, layoutBody))
        val ohAddr = writeHeader(w, msgs)
        val layoutBodyPos = findMsgBody(w, ohAddr, 0x0008)
        w.pad8()
        val dataAddr = w.pos
        w.bytes(raw)
        w.patch64(layoutBodyPos + 2, dataAddr.toLong)
        ohAddr

      case Some(cd) =>
        // chunked: emit chunks (+deflate), then a 1-level chunk B-tree
        val chunks = sliceChunks(raw, d, cd)
        val chunkAddrs = chunks.map { case (coords, bytes) =>
          val payload = if (d.deflate) deflateBytes(bytes) else bytes
          w.pad8(); val a = w.pos; w.bytes(payload)
          (coords, payload.length, a)
        }
        w.pad8()
        val btreeAddr = w.pos
        w.bytes("TREE".getBytes("US-ASCII"))
        w.u8(1); w.u8(0)
        w.u16(chunkAddrs.size)
        w.bytes(Undef); w.bytes(Undef)
        chunkAddrs.foreach { case (coords, nbytes, addr) =>
          w.u32(nbytes.toLong); w.u32(0)
          coords.foreach(c => w.u64(c.toLong)); w.u64(0)
          w.u64(addr.toLong)
        }
        // final sentinel key
        w.u32(0); w.u32(0); d.dims.foreach(x => w.u64(x.toLong)); w.u64(0)

        val layoutBody = { val b = new W
          b.u8(3); b.u8(2); b.u8(cd.size + 1)
          b.u64(btreeAddr.toLong)
          cd.foreach(c => b.u32(c.toLong)); b.u32(d.dtype.size.toLong)
          b.pad8(); b.result }
        val filterBody = if (d.deflate) Some({ val b = new W
          b.u8(1); b.u8(1); b.u16(0); b.u32(0) // v1, 1 filter, reserved
          b.u16(1)                   // filter id: deflate
          b.u16(8)                   // name length
          b.u16(1)                   // flags: optional
          b.u16(1)                   // n client values
          b.bytes("deflate ".getBytes("US-ASCII"))
          b.u32(6L)                  // level
          b.u32(0L)                  // pad to even count
          b.result }) else None
        val msgs = Seq((0x0001, spaceBody), (0x0003, typeBody),
          (0x0008, layoutBody)) ++ filterBody.map((0x000B, _))
        writeHeader(w, msgs)
    }
  }

  private def writeHeader(w: W, msgs: Seq[(Int, Array[Byte])]): Long = {
    w.pad8()
    val addr = w.pos
    val total = msgs.map(8 + _._2.length).sum
    w.u8(1); w.u8(0)
    w.u16(msgs.size)
    w.u32(1)
    w.u32(total.toLong)
    w.u32(0)
    msgs.foreach { case (t, body) =>
      w.u16(t); w.u16(body.length); w.u8(0); w.u8(0); w.u8(0); w.u8(0)
      w.bytes(body)
    }
    addr.toLong
  }

  /** Locate a message body inside a header just written (for patching). */
  private def findMsgBody(w: W, ohAddr: Long, mtype: Int): Int = {
    val bytes = w.result
    val bb = ByteBuffer.wrap(bytes).order(ByteOrder.LITTLE_ENDIAN)
    val n = bb.getShort(ohAddr.toInt + 2) & 0xffff
    var q = ohAddr.toInt + 16
    (0 until n).foreach { _ =>
      val t = bb.getShort(q) & 0xffff
      val sz = bb.getShort(q + 2) & 0xffff
      if (t == mtype) return q + 8
      q += 8 + sz
    }
    throw new IllegalStateException(s"message $mtype not found")
  }

  private def encodeData(d: Ds): Array[Byte] = {
    val n = d.dims.product
    val bb = ByteBuffer.allocate(n * d.dtype.size)
      .order(ByteOrder.LITTLE_ENDIAN)
    (d.dtype, d.data) match {
      case (I32, a: Array[Long]) => a.foreach(v => bb.putInt(v.toInt))
      case (I64, a: Array[Long]) => a.foreach(bb.putLong)
      case (F32, a: Array[Double]) => a.foreach(v => bb.putFloat(v.toFloat))
      case (F64, a: Array[Double]) => a.foreach(bb.putDouble)
      case _ => throw new IllegalArgumentException(
        s"data array type does not match ${d.dtype}")
    }
    bb.array()
  }

  /** Split row-major data into chunk-grid pieces (edge chunks padded to
    * full chunk size with zeros, as libhdf5 does).
    */
  private def sliceChunks(raw: Array[Byte], d: Ds, cd: Seq[Int])
      : Seq[(Seq[Int], Array[Byte])] = {
    val es = d.dtype.size
    if (d.dims.size == 1) {
      val n = d.dims.head
      (0 until n by cd.head).map { start =>
        val chunk = new Array[Byte](cd.head * es)
        val copy = math.min(cd.head, n - start)
        System.arraycopy(raw, start * es, chunk, 0, copy * es)
        (Seq(start), chunk)
      }
    } else {
      val Seq(rows, cols) = d.dims
      val Seq(cr, cc) = cd
      for {
        r0 <- 0 until rows by cr
        c0 <- 0 until cols by cc
      } yield {
        val chunk = new Array[Byte](cr * cc * es)
        val copyR = math.min(cr, rows - r0)
        val copyC = math.min(cc, cols - c0)
        (0 until copyR).foreach { r =>
          System.arraycopy(raw, ((r0 + r) * cols + c0) * es,
            chunk, r * cc * es, copyC * es)
        }
        (Seq(r0, c0), chunk)
      }
    }
  }

  private def deflateBytes(in: Array[Byte]): Array[Byte] = {
    val df = new java.util.zip.Deflater(6)
    df.setInput(in); df.finish()
    val out = new java.io.ByteArrayOutputStream(in.length)
    val tmp = new Array[Byte](8192)
    while (!df.finished()) out.write(tmp, 0, df.deflate(tmp))
    df.end()
    out.toByteArray
  }
}
