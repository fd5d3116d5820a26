package graft.io

import graft.io.Hdf5Writer.{Ds, F64, I64}
import org.scalatest.funsuite.AnyFunSuite
import java.nio.file.{Files, Paths}

/** Negative-path suite for the pure-JVM HDF5 reader: the scaladoc
  * promise is "everything else raises a clear error instead of
  * misreading" — these specs pin it. Each case corrupts a real,
  * valid file (or asks for an out-of-profile shape) and asserts the
  * reader refuses with a message naming the failing structure, never
  * returning silently-wrong data.
  */
class Hdf5NegativeSpec extends AnyFunSuite {

  private def validFile(): Array[Byte] = {
    val p = Files.createTempDirectory("graft-h5neg").resolve("ok.h5")
    Hdf5Writer.write(p.toString, Seq(
      Ds("a", I64, Seq(4), Array(1L, 2L, 3L, 4L)),
      Ds("b", F64, Seq(4), Array(1.0, 2.0, 3.0, 4.0))))
    Files.readAllBytes(p)
  }

  private def find(hay: Array[Byte], needle: String): Int = {
    val n = needle.getBytes("US-ASCII")
    hay.indices.find(i => i + n.length <= hay.length &&
      n.indices.forall(j => hay(i + j) == n(j))).getOrElse(
      fail(s"fixture contains no '$needle' structure"))
  }

  test("truncated file is rejected as not-HDF5") {
    val e = intercept[IllegalArgumentException](
      Hdf5Format.parse(Array[Byte](1, 2, 3)))
    assert(e.getMessage.contains("not an HDF5 file"))
  }

  test("valid signature but unsupported superblock version") {
    val b = validFile()
    b(8) = 9 // superblock version byte right after the 8-byte signature
    val e = intercept[IllegalArgumentException](Hdf5Format.parse(b))
    assert(e.getMessage.contains("superblock version"))
  }

  test("corrupt local heap signature is named, not misread") {
    val b = validFile()
    val at = find(b, "HEAP")
    b(at) = 'X'.toByte
    val e = intercept[IllegalArgumentException](Hdf5Format.parse(b))
    assert(e.getMessage.contains("heap"))
  }

  test("corrupt group B-tree signature is named, not misread") {
    val b = validFile()
    val at = find(b, "TREE")
    b(at) = 'X'.toByte
    val e = intercept[IllegalArgumentException](Hdf5Format.parse(b))
    assert(e.getMessage.toLowerCase.contains("b-tree"))
  }

  test("corrupt symbol node signature is named, not misread") {
    val b = validFile()
    val at = find(b, "SNOD")
    b(at) = 'X'.toByte
    val e = intercept[IllegalArgumentException](Hdf5Format.parse(b))
    assert(e.getMessage.toLowerCase.contains("symbol"))
  }

  test("non-v1 object header version is rejected") {
    val b = validFile()
    // the object header of dataset "a": locate it via the SNOD entry is
    // involved; instead corrupt EVERY byte that begins a v1 header is
    // overkill — simplest deterministic probe: parse once to know the
    // file is valid, then flip the root header version byte (offset 24
    // + 8x4 = the superblock's root group symbol-table entry points at
    // it; the writer lays the root header immediately after the
    // superblock at offset 96)
    assert(Hdf5Format.parse(validFile()).nonEmpty)
    b(96) = 5 // writer emits the root v1 object header at 96
    val e = intercept[IllegalArgumentException](Hdf5Format.parse(b))
    assert(e.getMessage.nonEmpty) // clear refusal, wherever detected
  }
}
