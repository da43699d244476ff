package graft

import java.nio.{ByteBuffer, ByteOrder}
import java.nio.file.{Files, Paths}
import org.apache.spark.sql.functions._
import graft.api.GraftFrame
import graft.sources.Hdf5

/** Clean-room HDF5 store: roundtrips, byte-level spec pins (the writer's
  * output is checked field-for-field against the HDF5 File Format
  * Specification v3.0 layout it claims to emit), loud profile rejections,
  * and the multi-SNOD/continuation reader paths. dev/h5check.py is the
  * independent python parser of the same spec used to cross-validate
  * these bytes outside the JVM. */
class Hdf5Spec extends SparkSpecBase {

  private def tmp(name: String): String =
    Files.createTempDirectory("graft_h5").resolve(name).toString

  test("hdf5 roundtrip: multi-partition write, parallel read, exact doubles") {
    val n = 1000
    val df = spark.range(n).repartition(7) // non-trivial partitioning
      .select(col("id").cast("double").as("x"),
        (col("id") * col("id")).cast("double").as("y"),
        lit(math.Pi).as("z"))
      .orderBy("x")
    val path = tmp("rt.h5")
    val (rows, cols) = GraftFrame(df).toHdf5(path, Seq("x", "y", "z"), "m")
    assert(rows == n.toLong && cols == 3)
    val back = graft.api.GraftSession(spark)
      .readHdf5(path, "m", Seq("x", "y", "z")).df
      .orderBy("row_index").collect()
    assert(back.length == n)
    back.zipWithIndex.foreach { case (r, i) =>
      assert(r.getLong(0) == i.toLong)
      assert(r.getDouble(1) == i.toDouble)
      assert(r.getDouble(2) == i.toDouble * i)
      assert(r.getDouble(3) == math.Pi)
    }
  }

  test("hdf5 writer bytes match the spec layout field-for-field") {
    val path = tmp("pin.h5")
    val df = spark.range(3).select(col("id").cast("double").as("a"),
      (col("id") + 10).cast("double").as("b"))
    GraftFrame(df).toHdf5(path, Seq("a", "b"))
    val buf = ByteBuffer.wrap(Files.readAllBytes(Paths.get(path)))
      .order(ByteOrder.LITTLE_ENDIAN)
    // superblock v0
    val sig = new Array[Byte](8); buf.get(sig)
    assert(sig.toSeq == Seq[Byte](0x89.toByte, 'H', 'D', 'F', '\r', '\n', 0x1a, '\n'))
    assert(buf.get(8) == 0, "superblock version")
    assert(buf.get(13) == 8 && buf.get(14) == 8, "offset/length sizes")
    assert(buf.getShort(16) == 4 && buf.getShort(18) == 16, "group K values")
    assert(buf.getLong(24) == 0L, "base address")
    assert(buf.getLong(40) == buf.capacity().toLong, "EOF address == file size")
    val rootOh = buf.getLong(64)
    assert(rootOh == 96L)
    // root object header: v1, one symbol-table message
    assert(buf.get(96) == 1 && buf.getShort(98) == 1)
    assert(buf.getShort(112) == 0x0011, "symbol table message type")
    val btree = buf.getLong(120); val heap = buf.getLong(128)
    // the superblock scratch caches the same two addresses
    assert(buf.getLong(80) == btree && buf.getLong(88) == heap)
    assert(new String(Array(buf.get(heap.toInt), buf.get(heap.toInt + 1),
      buf.get(heap.toInt + 2), buf.get(heap.toInt + 3)).map(_.toChar))
      == "HEAP")
    // B-tree: group node, level 0, 1 entry; child SNOD carries "data"
    assert(buf.get(btree.toInt + 4) == 0 && buf.get(btree.toInt + 5) == 0)
    assert(buf.getShort(btree.toInt + 6) == 1)
    val snod = buf.getLong(btree.toInt + 24 + 8)
    assert(buf.getInt(snod.toInt) == ByteBuffer.wrap("SNOD".getBytes)
      .order(ByteOrder.LITTLE_ENDIAN).getInt(0))
    val dsetOh = buf.getLong(snod.toInt + 16)
    // datatype message: class 1 float, LE, IEEE binary64 properties
    val dt = dsetOh.toInt + 16
    assert(buf.getShort(dt) == 0x0003)
    assert((buf.get(dt + 8) & 0x0f) == 1, "datatype class float")
    assert((buf.get(dt + 9) & 0x01) == 0, "little-endian")
    assert(buf.getInt(dt + 12) == 8, "8-byte floats")
    assert(buf.getShort(dt + 16) == 0 && buf.getShort(dt + 18) == 64)
    assert(buf.get(dt + 20) == 52 && buf.get(dt + 21) == 11) // exponent
    assert(buf.get(dt + 22) == 0 && buf.get(dt + 23) == 52) //  mantissa
    assert(buf.getInt(dt + 24) == 1023, "exponent bias")
    // dataspace: rank 2, dims (3, 2)
    val ds = dt + 32
    assert(buf.getShort(ds) == 0x0001)
    assert(buf.get(ds + 8) == 1 && buf.get(ds + 9) == 2)
    assert(buf.getLong(ds + 16) == 3L && buf.getLong(ds + 24) == 2L)
    // layout v3 contiguous; data bytes are the row-major doubles
    val lay = ds + 32
    assert(buf.getShort(lay) == 0x0008)
    assert(buf.get(lay + 8) == 3 && buf.get(lay + 9) == 1)
    val dataAddr = buf.getLong(lay + 10)
    assert(buf.getLong(lay + 18) == 3L * 2 * 8)
    val vals = (0 until 6).map(i => buf.getDouble((dataAddr + i * 8).toInt))
    assert(vals == Seq(0.0, 10.0, 1.0, 11.0, 2.0, 12.0))
  }

  test("hdf5 empty frame and rank-1 read") {
    val path = tmp("empty.h5")
    val (r0, c0) = GraftFrame(
      spark.range(0).select(col("id").cast("double").as("x")))
      .toHdf5(path, Seq("x"))
    assert(r0 == 0L && c0 == 1)
    val back = Hdf5.read(spark, path, "data", Seq("x"))
    assert(back.count() == 0L)
    assert(back.columns.toSeq == Seq("row_index", "x"))
    // single column still roundtrips values
    val p1 = tmp("one.h5")
    GraftFrame(spark.range(5).select((col("id") * 1.5).as("v")))
      .toHdf5(p1, Seq("v"))
    val vs = Hdf5.read(spark, p1).orderBy("row_index")
      .select("c0").collect().map(_.getDouble(0)).toSeq
    assert(vs == Seq(0.0, 1.5, 3.0, 4.5, 6.0))
  }

  test("hdf5 reader rejects out-of-profile files loudly") {
    val path = tmp("bad.h5")
    GraftFrame(spark.range(4).select(col("id").cast("double").as("x")))
      .toHdf5(path, Seq("x"))
    val bytes = Files.readAllBytes(Paths.get(path))
    def mutated(mut: Array[Byte] => Unit, name: String): String = {
      val b = bytes.clone(); mut(b)
      val p = tmp(name); Files.write(Paths.get(p), b); p
    }
    // wrong signature
    val noSig = mutated(_(0) = 'X', "nosig.h5")
    assert(intercept[IllegalArgumentException](Hdf5.read(spark, noSig))
      .getMessage.contains("signature"))
    // superblock version 2 (a v2 file would have a different layout
    // entirely; the reader must refuse, not misparse)
    val v2 = mutated(_(8) = 2, "v2.h5")
    assert(intercept[IllegalArgumentException](Hdf5.read(spark, v2))
      .getMessage.contains("superblock"))
    // missing dataset name
    assert(intercept[IllegalArgumentException](
      Hdf5.read(spark, path, "nope")).getMessage.contains("no dataset"))
    // datatype flipped to class 0 fixed-point: find the 0x11 class byte
    // via the known layout (dsetOh + 24 from the pin test's offsets)
    val buf = ByteBuffer.wrap(bytes).order(ByteOrder.LITTLE_ENDIAN)
    val btree = buf.getLong(120)
    val snod = buf.getLong(btree.toInt + 24 + 8)
    val dsetOh = buf.getLong(snod.toInt + 16).toInt
    val intType = mutated(_(dsetOh + 24) = 0x10, "int.h5")
    assert(intercept[IllegalArgumentException](Hdf5.read(spark, intType))
      .getMessage.contains("class"))
    // layout class flipped to compact (class 0 — chunked is now read,
    // r15, so the refusal case moves to the remaining unsupported class)
    val layClsOff = dsetOh + 16 + 32 + 32 + 9
    val compact = mutated(_(layClsOff) = 0, "compact.h5")
    assert(intercept[IllegalArgumentException](Hdf5.read(spark, compact))
      .getMessage.contains("layout class"))
  }

  test("hdf5 chunked read: h5check.py-written file, exact doubles, loud rejects") {
    // the fixture is written by the INDEPENDENT python implementation
    // (dev/h5check.py --write-chunked): value(i, j) = i*1000 + j + 0.5,
    // 25 rows x 3 cols in 8-row chunks — 4 chunks, the last one padded
    val path = tmp("pychunked.h5")
    import scala.sys.process._
    val rc = Seq("python3", "dev/h5check.py", "--write-chunked",
      path, "data", "25", "3", "8").!
    assert(rc == 0, "dev/h5check.py --write-chunked failed")
    val got = Hdf5.read(spark, path).orderBy("row_index")
      .collect().map(r => (r.getLong(0), r.getDouble(1), r.getDouble(2), r.getDouble(3)))
    assert(got.length == 25)
    for ((i, a, b, c) <- got) {
      assert(a == i * 1000.0 + 0.5 && b == i * 1000.0 + 1.5 && c == i * 1000.0 + 2.5,
        s"row $i decoded wrong: ($a, $b, $c)")
    }
    // multi-chunk coverage is real: rows 24 (edge chunk) and 0 both present
    assert(got.head._1 == 0L && got.last._1 == 24L)

    // loud rejects on out-of-profile chunked variants
    val bytes = Files.readAllBytes(Paths.get(path))
    val buf = ByteBuffer.wrap(bytes).order(ByteOrder.LITTLE_ENDIAN)
    val btree = buf.getLong(120)
    val snod = buf.getLong(btree.toInt + 24 + 8)
    val dsetOh = buf.getLong(snod.toInt + 16).toInt
    val layBody = dsetOh + 16 + 32 + 32 + 8
    def mutated(mut: ByteBuffer => Unit, name: String): String = {
      val b = bytes.clone()
      mut(ByteBuffer.wrap(b).order(ByteOrder.LITTLE_ENDIAN))
      val p = tmp(name); Files.write(Paths.get(p), b); p
    }
    // column-split chunks (cols dim 3 -> 2) must refuse
    val split = mutated(_.putInt(layBody + 15, 2), "colsplit.h5")
    assert(intercept[IllegalArgumentException](Hdf5.read(spark, split))
      .getMessage.contains("column-split"))
    // a chunk with a nonzero key mask (skipped pipeline stages) must refuse
    val cbt = buf.getLong(layBody + 3)
    val masked = mutated(_.putInt(cbt.toInt + 24 + 4, 1), "masked.h5")
    assert(intercept[IllegalArgumentException](Hdf5.read(spark, masked))
      .getMessage.contains("filter mask"))
  }

  test("hdf5 filtered chunked read: gzip+shuffle+fletcher32 from h5check.py, loud rejects") {
    import scala.sys.process._
    def causes(e: Throwable): Seq[String] =
      Iterator.iterate(e)(_.getCause).takeWhile(_ != null).take(8)
        .map(t => Option(t.getMessage).getOrElse("")).toSeq
    // full pipeline: shuffle -> deflate -> fletcher32 (the h5py
    // compression='gzip', shuffle=True, fletcher32=True shape), edge
    // chunk padded; values are the h5check arithmetic fixture
    val path = tmp("pygzip.h5")
    assert(Seq("python3", "dev/h5check.py", "--write-gzip",
      path, "data", "997", "3", "64", "shuffle,fletcher32").! == 0)
    val got = Hdf5.read(spark, path).orderBy("row_index")
      .collect().map(r => (r.getLong(0), r.getDouble(1), r.getDouble(2), r.getDouble(3)))
    assert(got.length == 997 && got.head._1 == 0L && got.last._1 == 996L)
    for ((i, a, b, c) <- got)
      assert(a == i * 1000.0 + 0.5 && b == i * 1000.0 + 1.5 && c == i * 1000.0 + 2.5,
        s"row $i decoded wrong: ($a, $b, $c)")
    // deflate-only pipeline decodes too
    val p2 = tmp("pygzip2.h5")
    assert(Seq("python3", "dev/h5check.py", "--write-gzip",
      p2, "data", "100", "2", "16", "").! == 0)
    val g2 = Hdf5.read(spark, p2).orderBy("row_index").collect()
    assert(g2.length == 100 && g2(37).getDouble(1) == 37000.5
      && g2(37).getDouble(2) == 37001.5)
    // a corrupted stored chunk fails the fletcher32 verify LOUDLY
    val bytes = Files.readAllBytes(Paths.get(path))
    bytes(bytes.length - 1) = (bytes(bytes.length - 1) ^ 0x5A).toByte
    val bad = tmp("pygzip_bad.h5")
    Files.write(Paths.get(bad), bytes)
    val e = intercept[Throwable](Hdf5.read(spark, bad).collect())
    assert((causes(e) :+ e.toString).exists(m =>
      m.contains("fletcher32") || m.contains("deflate")), s"unexpected: $e")
    // a foreign filter id (szip = 4) refuses at plan time: the filter
    // message is the 4th header message; its first filter id sits at
    // body+8 (v1 header)
    val orig = Files.readAllBytes(Paths.get(path))
    val buf2 = ByteBuffer.wrap(orig).order(ByteOrder.LITTLE_ENDIAN)
    val btree2 = buf2.getLong(120)
    val snod2 = buf2.getLong(btree2.toInt + 24 + 8)
    val dsetOh2 = buf2.getLong(snod2.toInt + 16).toInt
    val filtIdAt = dsetOh2 + 16 + 32 + 32 + 32 + 8 + 8
    assert((buf2.getShort(filtIdAt) & 0xffff) == 2) // shuffle leads the pipeline
    buf2.putShort(filtIdAt, 4.toShort)
    val foreign = tmp("pygzip_szip.h5")
    Files.write(Paths.get(foreign), orig)
    assert(intercept[IllegalArgumentException](Hdf5.read(spark, foreign))
      .getMessage.contains("outside the deflate/shuffle/fletcher32 profile"))
  }

  test("hdf5 reader handles multi-SNOD btrees and header continuations") {
    // hand-build a file whose root B-tree has TWO SNOD children and whose
    // dataset header splits its messages across a continuation block —
    // the shapes h5py emits for many-link groups and grown headers.
    val path = tmp("multi.h5")
    GraftFrame(spark.range(3).select(col("id").cast("double").as("x")))
      .toHdf5(path, Seq("x"), "aaa")
    val base = Files.readAllBytes(Paths.get(path))
    val buf = ByteBuffer.wrap(base).order(ByteOrder.LITTLE_ENDIAN)
    val btree = buf.getLong(120).toInt
    val heap = buf.getLong(128).toInt
    val heapSeg = ByteBuffer.wrap(base, heap + 24, 8)
      .order(ByteOrder.LITTLE_ENDIAN).getLong.toInt
    val snod = buf.getLong(btree + 24 + 8).toInt
    val dsetOh = buf.getLong(snod + 16)

    val out = ByteBuffer.allocate(base.length + 512)
      .order(ByteOrder.LITTLE_ENDIAN)
    out.put(base)
    val ext = base.length
    // second name "zzz" appended into a grown heap copy: rewrite the heap
    // data segment in place is risky; instead extend the heap segment by
    // pointing the heap header at a NEW segment at `ext` carrying both
    // names, then add a second SNOD + a 2-entry btree.
    val segBytes = 32
    out.position(ext)
    out.putLong(0L) // offset 0: empty name
    out.put("aaa".getBytes); out.put(Array[Byte](0, 0, 0, 0, 0))
    out.put("zzz".getBytes); out.put(Array[Byte](0, 0, 0, 0, 0))
    val snod2 = ext + segBytes
    out.position(snod2)
    out.put("SNOD".getBytes); out.put(1.toByte); out.put(0.toByte)
    out.putShort(1.toShort)
    out.putLong(16L) // name offset of "zzz" in the new segment
    out.putLong(dsetOh) // same dataset object header
    out.putInt(0); out.putInt(0); out.putLong(0L); out.putLong(0L)
    val btree2 = snod2 + 8 + 40
    out.position(btree2)
    out.put("TREE".getBytes); out.put(0.toByte); out.put(0.toByte)
    out.putShort(2.toShort)
    out.putLong(-1L); out.putLong(-1L)
    out.putLong(0L); out.putLong(snod.toLong) // child 1: original "aaa"
    out.putLong(8L); out.putLong(snod2.toLong) // child 2: "zzz"
    out.putLong(16L)
    val end = btree2 + 24 + 5 * 8
    // point the root symbol-table message and scratch at the new btree,
    // and the heap header at the new data segment
    assert(end <= out.capacity())
    out.putLong(120, btree2.toLong)
    out.putLong(80, btree2.toLong)
    out.putLong(heap + 24, ext.toLong)
    out.putLong(heap + 8, segBytes.toLong)
    out.putLong(40, out.capacity().toLong) // EOF
    val p2 = tmp("twosnod.h5")
    Files.write(Paths.get(p2), out.array())
    val viaZzz = Hdf5.read(spark, p2, "zzz").orderBy("row_index")
      .select("c0").collect().map(_.getDouble(0)).toSeq
    assert(viaZzz == Seq(0.0, 1.0, 2.0))

    // continuation: move the layout message of "aaa" into a continuation
    // block — rewrite message 3 as a continuation pointing at a new block
    // holding the original layout message bytes.
    val cont = ByteBuffer.allocate(base.length + 64)
      .order(ByteOrder.LITTLE_ENDIAN)
    cont.put(base)
    val layMsg = (dsetOh + 16 + 32 + 32).toInt // 8 hdr + 24 body
    val blockAddr = base.length
    cont.position(blockAddr)
    cont.put(java.util.Arrays.copyOfRange(base, layMsg, layMsg + 32))
    // message 3 becomes the continuation; the layout message now lives in
    // the block, so the declared total message count grows to 4 (the
    // spec counts the continuation message AND the messages it reaches)
    cont.putShort((dsetOh + 2).toInt, 4.toShort)
    cont.position(layMsg)
    cont.putShort(0x0010.toShort); cont.putShort(24.toShort); cont.putInt(0)
    cont.putLong(blockAddr.toLong); cont.putLong(32L)
    cont.putLong(40, cont.capacity().toLong)
    val p3 = tmp("cont.h5")
    Files.write(Paths.get(p3), cont.array())
    val viaCont = Hdf5.read(spark, p3, "aaa").orderBy("row_index")
      .select("c0").collect().map(_.getDouble(0)).toSeq
    assert(viaCont == Seq(0.0, 1.0, 2.0))
  }
}
