package graft.sources

import java.io.RandomAccessFile
import java.nio.{ByteBuffer, ByteOrder}
import java.nio.file.{Files, Paths}
import org.apache.spark.sql.{DataFrame, Row, SparkSession}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types._

/** Minimal clean-room HDF5 tensor store (reference
  * mars/tensor/datastore/to_hdf5.py:56 `TensorHDF5DataStore` and
  * mars/tensor/datasource/from_hdf5.py:41 `fromhdf5`, which wrap h5py).
  * The HDF5 *file format* is a public specification (HDF5 File Format
  * Specification v3.0, The HDF Group); this module implements a small
  * profile of it directly on the JVM — no native libhdf5 — closing the
  * r13 "HDF5 de-scoped (native libs can't ship)" gap for the common
  * dense-matrix case.
  *
  * Profile WRITTEN (and byte-layout documented field-for-field below):
  * version-0 superblock, 8-byte offsets/lengths, one root group with a
  * v1 symbol-table (local heap + v1 B-tree + one SNOD), one dataset
  * under the root with a v1 object header carrying exactly three
  * messages — Datatype (class 1 float, IEEE 754 binary64,
  * little-endian), Dataspace (rank ≤ 2, no max dims), Data Layout
  * (version 3, class 1 contiguous) — and the raw data as one contiguous
  * little-endian float64 region. Any spec-conforming HDF5 reader
  * (h5py, HDFView, netCDF) reads such a file; `dev/h5check.py` is an
  * INDEPENDENT stdlib-python parser of the same spec used to
  * cross-validate the writer (two implementations, one spec).
  *
  * Profile READ (anything else fails loudly, never decodes garbage):
  * v0 superblock, v1 symbol-table groups (multi-SNOD B-trees and
  * object-header continuation blocks ARE handled — h5py emits both),
  * contiguous OR v1-B-tree chunked layout with full-width chunks —
  * UNFILTERED (r15) or through a gzip/shuffle/fletcher32 filter
  * pipeline (r16: deflate inflates via java.util.zip, shuffle is byte
  * arithmetic, fletcher32 is VERIFIED per H5checksum.c — the h5py
  * `compression='gzip', shuffle=True, fletcher32=True` shape; szip/
  * nbit/user filters, column-split chunks and compact layouts are
  * rejected), class-1 float64 little-endian datatype, rank-1/2
  * dataspace. The chunked fixtures in Hdf5Spec — plain AND compressed —
  * are written by the INDEPENDENT dev/h5check.py writer (two
  * implementations, one spec).
  *
  * Scale shape (same contract as [[Zarr]]): metadata is O(1) and
  * driver-side; the raw data region is written by PARALLEL tasks, each
  * positioned-writing its disjoint byte range through a FileChannel
  * (single shared POSIX path — HDF5 is a single-file format, so like
  * `to_csv` single-file this is the export path, not a shuffle-scale
  * sink; the read side parallelizes over row ranges with positioned
  * reads, ~256 MB of data per task in bounded <= 64 MB buffers).
  */
object Hdf5 {

  private val UNDEF = -1L // 0xFFFFFFFFFFFFFFFF: the spec's undefined address
  private val SIG = Array[Byte](0x89.toByte, 'H', 'D', 'F', '\r', '\n', 0x1a, '\n')
  private val GROUP_LEAF_K = 4 // SNOD capacity 2K symbols
  private val GROUP_INTERNAL_K = 16 // B-tree node capacity 2K children

  private def pad8(n: Int): Int = (n + 7) & ~7

  /** Write `valueCols` of `df` (row order = current frame order) as a
    * rank-2 contiguous float64 dataset named `dataset` in a fresh HDF5
    * file at `path`. Returns (rows, cols). */
  def write(df: DataFrame, path: String, valueCols: Seq[String],
      dataset: String = "data"): (Long, Int) = {
    require(valueCols.nonEmpty, "hdf5 write needs at least one value column")
    require(dataset.nonEmpty && !dataset.contains('/') && dataset.length < 256,
      s"hdf5: dataset must be a short root-level name, got '$dataset'")
    val c = valueCols.length
    val mat = df.select(valueCols.map(col(_).cast("double")): _*)
    val indexed = mat.rdd.zipWithIndex()
    // MEMORY_AND_DISK (r15 ADVICE): the export matrix is needed twice
    // (count + write); MEMORY_ONLY would silently recompute the lineage
    // for a bigger-than-memory export instead of spilling
    indexed.persist(org.apache.spark.storage.StorageLevel.MEMORY_AND_DISK)
    try {
      val n = indexed.count()
      val nameBytes = dataset.getBytes("UTF-8")

      // ---- fixed metadata layout (all addresses absolute, little-endian)
      val superblockAddr = 0L // 96 bytes: 24 fixed + 32 addresses + 40 root STE
      val rootOhAddr = 96L //   40 bytes: 16 v1 prefix+pad, 8 msg hdr, 16 symtab msg
      val heapAddr = 136L //    32-byte header + data segment
      val heapSegAddr = heapAddr + 32
      // heap offset 0 is a reserved empty-name slot (sorts before every
      // real link name — it is what B-tree key0 points at)
      val nameOff = 8L
      val heapSeg = 8 + pad8(nameBytes.length + 1)
      val btreeAddr = heapSegAddr + heapSeg // 24 hdr + 33 keys + 32 children
      val btreeSize = 24 + (2 * GROUP_INTERNAL_K + 1) * 8 + 2 * GROUP_INTERNAL_K * 8
      val snodAddr = btreeAddr + btreeSize // 8 hdr + 2K_leaf 40-byte entries
      val snodSize = 8 + 2 * GROUP_LEAF_K * 40
      val dsetOhAddr = snodAddr + snodSize // 16 prefix + 3 x (8 hdr + 24 body)
      val dsetOhSize = 16 + 3 * (8 + 24)
      val dataAddr = dsetOhAddr + dsetOhSize // already 8-aligned by construction
      val dataBytes = n * c * 8
      val eof = dataAddr + dataBytes

      val meta = ByteBuffer.allocate(dataAddr.toInt).order(ByteOrder.LITTLE_ENDIAN)
      // ---- superblock v0
      meta.put(SIG)
      meta.put(0.toByte) // superblock version
      meta.put(0.toByte) // free-space storage version
      meta.put(0.toByte) // root group symbol table version
      meta.put(0.toByte) // reserved
      meta.put(0.toByte) // shared header message format version
      meta.put(8.toByte) // size of offsets
      meta.put(8.toByte) // size of lengths
      meta.put(0.toByte) // reserved
      meta.putShort(GROUP_LEAF_K.toShort)
      meta.putShort(GROUP_INTERNAL_K.toShort)
      meta.putInt(0) // file consistency flags
      meta.putLong(0L) // base address
      meta.putLong(UNDEF) // free-space info address
      meta.putLong(eof) // end-of-file address
      meta.putLong(UNDEF) // driver information block address
      // root group symbol table entry (cache type 1: scratch caches
      // the B-tree + heap addresses, as the spec prescribes for groups)
      meta.putLong(0L) // link name offset (root has no name)
      meta.putLong(rootOhAddr)
      meta.putInt(1) // cache type 1
      meta.putInt(0) // reserved
      meta.putLong(btreeAddr) // scratch: v1 B-tree address
      meta.putLong(heapAddr) //  scratch: local heap address
      // ---- root group object header (v1)
      meta.put(1.toByte); meta.put(0.toByte) // version, reserved
      meta.putShort(1.toShort) // one message
      meta.putInt(1) // object reference count
      meta.putInt(8 + 16) // size of the message region
      meta.putInt(0) // v1 prefix padding to an 8-byte boundary
      meta.putShort(0x0011.toShort) // Symbol Table message
      meta.putShort(16.toShort); meta.putInt(0) // size, flags+reserved
      meta.putLong(btreeAddr); meta.putLong(heapAddr)
      // ---- local heap
      meta.put("HEAP".getBytes("US-ASCII"))
      meta.put(0.toByte); meta.put(0.toByte); meta.put(0.toByte); meta.put(0.toByte)
      meta.putLong(heapSeg.toLong) // data segment size
      meta.putLong(UNDEF) // free-list head offset (segment exactly sized)
      meta.putLong(heapSegAddr) // data segment address
      meta.position(heapSegAddr.toInt + nameOff.toInt)
      meta.put(nameBytes) // NUL terminator + pad are the buffer's zeros
      // ---- v1 B-tree, one leaf-level group node with one SNOD child
      meta.position(btreeAddr.toInt)
      meta.put("TREE".getBytes("US-ASCII"))
      meta.put(0.toByte) // node type 0 = group
      meta.put(0.toByte) // node level 0
      meta.putShort(1.toShort) // entries used
      meta.putLong(UNDEF); meta.putLong(UNDEF) // siblings
      meta.putLong(0L) // key0: heap offset of the empty name (lower bound)
      meta.putLong(snodAddr) // child0
      meta.putLong(nameOff) // key1: heap offset of the (largest) name in child0
      // ---- SNOD with the single dataset entry
      meta.position(snodAddr.toInt)
      meta.put("SNOD".getBytes("US-ASCII"))
      meta.put(1.toByte); meta.put(0.toByte) // version, reserved
      meta.putShort(1.toShort) // number of symbols
      meta.putLong(nameOff)
      meta.putLong(dsetOhAddr)
      meta.putInt(0); meta.putInt(0) // cache type 0, reserved
      meta.putLong(0L); meta.putLong(0L) // scratch
      // ---- dataset object header (v1): datatype, dataspace, layout
      meta.position(dsetOhAddr.toInt)
      meta.put(1.toByte); meta.put(0.toByte)
      meta.putShort(3.toShort)
      meta.putInt(1)
      meta.putInt(3 * (8 + 24))
      meta.putInt(0) // prefix padding
      // Datatype: class 1 (float), version 1; bit field: byte order LE,
      // implied-msb mantissa normalization (bits 4-5 = 10b), sign bit 63
      meta.putShort(0x0003.toShort); meta.putShort(24.toShort); meta.putInt(0)
      meta.put(0x11.toByte) // version 1 << 4 | class 1
      meta.put(0x20.toByte); meta.put(63.toByte); meta.put(0.toByte)
      meta.putInt(8) // datatype size in bytes
      meta.putShort(0.toShort) // bit offset
      meta.putShort(64.toShort) // bit precision
      meta.put(52.toByte); meta.put(11.toByte) // exponent location, size
      meta.put(0.toByte); meta.put(52.toByte) //  mantissa location, size
      meta.putInt(1023) // exponent bias (+ 4 trailing pad bytes land below)
      meta.putInt(0) // pad body 20 -> 24
      // Dataspace v1: rank 2, no max dims
      meta.putShort(0x0001.toShort); meta.putShort(24.toShort); meta.putInt(0)
      meta.put(1.toByte); meta.put(2.toByte); meta.put(0.toByte) // ver, rank, flags
      meta.put(Array[Byte](0, 0, 0, 0, 0)) // reserved
      meta.putLong(n); meta.putLong(c.toLong)
      // Data Layout v3 class 1 (contiguous)
      meta.putShort(0x0008.toShort); meta.putShort(24.toShort); meta.putInt(0)
      meta.put(3.toByte); meta.put(1.toByte)
      meta.putLong(if (n == 0L) UNDEF else dataAddr)
      meta.putLong(dataBytes)
      // (6 trailing zero bytes complete the padded 24-byte body)

      Files.deleteIfExists(Paths.get(path))
      val parent = Paths.get(path).toAbsolutePath.getParent
      if (parent != null) Files.createDirectories(parent)
      val raf = new RandomAccessFile(path, "rw")
      // one scratch byte PAST the declared eof holds a nonzero marker the
      // task writing the globally last row places (truncated away below):
      // the CRC check alone false-passes when the last row is all zeros
      // (its CRC equals the zero-prefilled region's — r15 ADVICE), the
      // marker cannot — a non-shared FS leaves it 0x00
      try { raf.setLength(if (n > 0) eof + 1 else eof); raf.write(meta.array()) }
      finally raf.close()

      if (n > 0L) {
        // parallel raw-data write: positioned disjoint ranges, one task
        // per input partition (shared POSIX path contract, see Scaladoc)
        // zipWithIndex assigns each partition one CONTIGUOUS ascending
        // index range, so a task seeks once and streams sequentially
        // (buffered — no per-row syscall). Each task returns its last
        // (row index, row crc32) so the driver can verify the sentinel.
        val rowBytes = c * 8
        val marks = indexed.mapPartitions { it =>
          if (!it.hasNext) Iterator.empty
          else {
            val (row0, i0) = it.next()
            val out = new RandomAccessFile(path, "rw")
            var lastIdx = i0
            val lastRow = new Array[Byte](rowBytes)
            try {
              out.seek(dataAddr + i0 * rowBytes)
              val bout = new java.io.BufferedOutputStream(
                new java.io.FileOutputStream(out.getFD), 1 << 16)
              var expect = i0
              val buf = ByteBuffer.allocate(rowBytes).order(ByteOrder.LITTLE_ENDIAN)
              def emit(row: Row, i: Long): Unit = {
                require(i == expect, s"hdf5 write invariant violated: row " +
                  s"index $i in a partition expecting $expect")
                expect += 1
                buf.clear()
                var j = 0
                while (j < c) {
                  buf.putDouble(if (row.isNullAt(j)) 0.0 else row.getDouble(j)); j += 1
                }
                bout.write(buf.array())
                System.arraycopy(buf.array(), 0, lastRow, 0, rowBytes)
                lastIdx = i
              }
              emit(row0, i0)
              it.foreach { case (row, i) => emit(row, i) }
              bout.flush()
              // the task owning the globally last row stamps the scratch
              // marker byte at `eof` (see the setLength note above)
              if (lastIdx == n - 1) { out.seek(dataAddr + n * rowBytes); out.write(0xA5) }
            } finally out.close()
            val crc = new java.util.zip.CRC32
            crc.update(lastRow)
            Iterator.single((lastIdx, crc.getValue))
          }
        }.collect() // bounded: one (long, long) per partition
        // SENTINEL (r15 ADVICE): on a cluster without a shared filesystem
        // the executor tasks would have written fresh LOCAL files and the
        // driver-side file's data region stays zero-filled — re-read the
        // globally last row here and require it matches what its writer
        // task reported. One row, driver-side, loud.
        val (sentinelIdx, sentinelCrc) = marks.maxBy(_._1)
        val back = new RandomAccessFile(path, "r")
        val sentinelBytes = new Array[Byte](rowBytes)
        val marker = try {
          back.seek(dataAddr + sentinelIdx * rowBytes)
          back.readFully(sentinelBytes)
          back.seek(eof); back.read()
        } finally back.close()
        val crc = new java.util.zip.CRC32
        crc.update(sentinelBytes)
        require(marker == 0xA5 && crc.getValue == sentinelCrc,
          s"hdf5 write: sentinel row $sentinelIdx (or its 0xA5 marker " +
            "byte) read back differently than its writer task reported — " +
            "`path` is NOT a shared filesystem across the executors (the " +
            "Scaladoc contract); the executors wrote local files and this " +
            "export is invalid")
        // drop the scratch marker: the spec requires file size == the
        // superblock's eof address (h5check enforces it)
        val trunc = new RandomAccessFile(path, "rw")
        try trunc.setLength(eof) finally trunc.close()
      }
      (n, c)
    } finally { indexed.unpersist(false); () }
  }

  // ---------------------------------------------------------------- read

  private final class At(path: String) {
    private val raf = new RandomAccessFile(path, "r")
    val length: Long = raf.length()
    def bytes(addr: Long, len: Int): ByteBuffer = {
      val a = new Array[Byte](len)
      raf.seek(addr); raf.readFully(a)
      ByteBuffer.wrap(a).order(ByteOrder.LITTLE_ENDIAN)
    }
    def close(): Unit = raf.close()
  }

  private sealed trait H5Layout
  /** Class-1 contiguous: one raw region. */
  private case class Contig(addr: Long, sizeBytes: Long) extends H5Layout
  /** One filter-pipeline stage: HDF5 filter id (1 deflate / 2 shuffle /
    * 3 fletcher32 — anything else refuses at [[locate]]) + client data. */
  private[sources] case class H5Filter(id: Int, cdata: Array[Int])
  /** Class-2 chunked (v1 B-tree, full-width chunks): (first row, data
    * address, STORED bytes) per chunk — stored == raw when `filters` is
    * empty, else the post-pipeline size; edge chunks are PADDED to the
    * full chunk size BEFORE filtering, so every chunk decodes to exactly
    * chunkRows x c x 8 bytes. */
  private case class Chunked(chunks: Seq[(Long, Long, Long)], chunkRows: Long,
      filters: Seq[H5Filter]) extends H5Layout

  private case class Dset(n: Long, c: Int, layout: H5Layout)

  /** Driver-side metadata walk: superblock -> root symbol table ->
    * B-tree/SNODs -> the named dataset's object header. */
  private def locate(path: String, dataset: String): Dset = {
    val f = new At(path)
    try {
      val sb = f.bytes(0, 96)
      val sig = new Array[Byte](8); sb.get(sig)
      require(java.util.Arrays.equals(sig, SIG), s"hdf5: bad signature in $path")
      val sbVer = sb.get()
      require(sbVer == 0, s"hdf5: only v0 superblocks are in the supported " +
        s"profile (got version $sbVer)")
      sb.position(13)
      val offSz = sb.get(); val lenSz = sb.get()
      require(offSz == 8 && lenSz == 8,
        s"hdf5: only 8-byte offsets/lengths supported (got $offSz/$lenSz)")
      sb.position(24)
      val base = sb.getLong
      require(base == 0L, s"hdf5: nonzero base address $base unsupported")
      sb.position(56) // root group symbol table entry
      sb.getLong // link name offset
      val rootOh = sb.getLong
      // read the symbol-table message from the root object header (works
      // for any cache type, so foreign files that leave scratch empty work)
      val rootMsgs = objectHeaderMessages(f, rootOh)
      val symtab = rootMsgs.find(_._1 == 0x0011).getOrElse(
        throw new IllegalArgumentException(
          "hdf5: root group has no symbol-table message (v2 'link' groups " +
            "are outside the supported profile"))._2
      val btreeAddr = symtab.getLong(0)
      val heapAddr = symtab.getLong(8)
      val heap = f.bytes(heapAddr, 32)
      val hsig = new Array[Byte](4); heap.get(hsig)
      require(new String(hsig, "US-ASCII") == "HEAP",
        s"hdf5: bad local heap signature at $heapAddr")
      heap.position(24)
      val heapSegAddr = heap.getLong

      def heapName(off: Long): String = {
        val sb2 = new StringBuilder
        var a = heapSegAddr + off
        var done = false
        while (!done) {
          // clamp to EOF (r15 ADVICE): a foreign file whose link name
          // sits near the end must reject loudly, not EOFException
          val len = math.min(64L, f.length - a).toInt
          require(len > 0, s"hdf5: unterminated link name at heap " +
            s"offset $off runs past end of file")
          val chunk = f.bytes(a, len)
          var i = 0
          while (i < len && !done) {
            val b = chunk.get(i)
            if (b == 0) done = true else { sb2.append(b.toChar); i += 1 }
          }
          a += len
        }
        sb2.toString
      }

      // walk the v1 B-tree to all SNODs (level > 0 children are B-trees)
      def snods(addr: Long): Seq[Long] = {
        val hdr = f.bytes(addr, 8)
        val tsig = new Array[Byte](4); hdr.get(tsig)
        require(new String(tsig, "US-ASCII") == "TREE",
          s"hdf5: bad B-tree signature at $addr")
        val nodeType = hdr.get(); val level = hdr.get()
        require(nodeType == 0, s"hdf5: B-tree node type $nodeType at $addr " +
          "(only group B-trees appear in the supported profile)")
        val used = hdr.getShort(6) & 0xffff
        val body = f.bytes(addr + 24, (2 * used + 1) * 8)
        val children = (0 until used).map(i => body.getLong((2 * i + 1) * 8))
        if (level == 0) children else children.flatMap(snods)
      }

      val entries: Seq[(String, Long)] = snods(btreeAddr).flatMap { sa =>
        val sh = f.bytes(sa, 8)
        val ssig = new Array[Byte](4); sh.get(ssig)
        require(new String(ssig, "US-ASCII") == "SNOD",
          s"hdf5: bad SNOD signature at $sa")
        val nsym = sh.getShort(6) & 0xffff
        (0 until nsym).map { i =>
          val e = f.bytes(sa + 8 + i * 40L, 16)
          (heapName(e.getLong(0)), e.getLong(8))
        }
      }
      val ohAddr = entries.collectFirst { case (nm, a) if nm == dataset => a }
        .getOrElse(throw new IllegalArgumentException(
          s"hdf5: no dataset '$dataset' at the root of $path " +
            s"(links found: ${entries.map(_._1).mkString(", ")})"))

      val msgs = objectHeaderMessages(f, ohAddr)
      val dt = msgs.find(_._1 == 0x0003).getOrElse(throw new
        IllegalArgumentException(s"hdf5: dataset '$dataset' has no datatype"))._2
      val clsVer = dt.get(0) & 0xff
      val cls = clsVer & 0x0f
      require(cls == 1, s"hdf5: datatype class $cls unsupported " +
        "(only class 1 float is in the profile)")
      require((dt.get(1) & 0x01) == 0, "hdf5: big-endian floats unsupported")
      require(dt.getInt(4) == 8,
        s"hdf5: only float64 supported (size ${dt.getInt(4)})")
      val ds = msgs.find(_._1 == 0x0001).getOrElse(throw new
        IllegalArgumentException(s"hdf5: dataset '$dataset' has no dataspace"))._2
      val dsVer = ds.get(0) & 0xff
      val rank = ds.get(1) & 0xff
      require(dsVer == 1 || dsVer == 2, s"hdf5: dataspace version $dsVer")
      require(rank == 1 || rank == 2,
        s"hdf5: rank $rank unsupported (profile is rank 1 or 2)")
      val dimsOff = if (dsVer == 1) 8 else 4
      val n = ds.getLong(dimsOff)
      val c = if (rank == 2) ds.getLong(dimsOff + 8).toInt else 1
      val lay = msgs.find(_._1 == 0x0008).getOrElse(throw new
        IllegalArgumentException(s"hdf5: dataset '$dataset' has no layout"))._2
      val layVer = lay.get(0) & 0xff
      require(layVer == 3, s"hdf5: layout message version $layVer " +
        "(profile is version 3)")
      val layCls = lay.get(1) & 0xff
      layCls match {
        case 1 =>
          require(!msgs.exists(_._1 == 0x000B),
            "hdf5: contiguous layout with a filter pipeline is not a " +
              "valid combination (filters apply to chunked storage only)")
          Dset(n, c, Contig(lay.getLong(2), lay.getLong(10)))
        case 2 =>
          // v1-B-tree chunked read (r15 VERDICT #6 — h5py writes chunked
          // whenever compression or resizability is on): full-width
          // chunks; gzip (deflate) + shuffle + fletcher32 filter
          // pipelines are DECODED (r16 VERDICT #4 — h5py applies gzip
          // whenever compression= is on, which is most real archival
          // tensors); any other filter refuses loudly. Column-split
          // chunks would need cross-chunk row assembly — still rejected.
          val filters = msgs.find(_._1 == 0x000B)
            .map(m => parseFilters(m._2)).getOrElse(Seq.empty)
          val dty = lay.get(2) & 0xff // dimensionality = rank + 1
          require(dty == rank + 1,
            s"hdf5: chunked layout dimensionality $dty for rank $rank")
          val btAddr = lay.getLong(3)
          val chunkRows = lay.getInt(11).toLong & 0xffffffffL
          val chunkCols =
            if (rank == 2) lay.getInt(15).toLong & 0xffffffffL else 1L
          val elemSz = lay.getInt(11 + 4 * (dty - 1)) & 0xffffffffL
          require(elemSz == 8, s"hdf5: chunk element size $elemSz (not float64)")
          require(chunkCols == c.toLong,
            s"hdf5: column-split chunks ($chunkCols of $c columns) are " +
              "outside the supported profile (chunks must span all columns)")
          val rawChunkBytes = chunkRows * chunkCols * 8
          val keyLen = 8 + 8 * dty
          // walk the type-1 (raw data chunk) v1 B-tree to its leaves
          def chunks(addr: Long): Seq[(Long, Long, Long)] = {
            val hdr = f.bytes(addr, 24)
            val tsig = new Array[Byte](4); hdr.get(tsig)
            require(new String(tsig, "US-ASCII") == "TREE",
              s"hdf5: bad chunk B-tree signature at $addr")
            val nodeType = hdr.get(); val level = hdr.get()
            require(nodeType == 1,
              s"hdf5: B-tree node type $nodeType in a chunk tree at $addr")
            val used = hdr.getShort(6) & 0xffff
            val body = f.bytes(addr + 24, used * (keyLen + 8))
            (0 until used).flatMap { i =>
              body.position(i * (keyLen + 8))
              val sizeBytes = body.getInt.toLong & 0xffffffffL
              val filterMask = body.getInt
              val rowOff = body.getLong // offset in dim 0 (elements)
              body.position(i * (keyLen + 8) + keyLen)
              val child = body.getLong
              if (level > 0) chunks(child)
              else {
                // mask bit i = pipeline stage i SKIPPED for this chunk —
                // a shape this reader never writes and won't guess at
                require(filterMask == 0,
                  s"hdf5: chunk at row $rowOff has a nonzero filter mask " +
                    s"($filterMask) — outside the supported profile")
                require(filters.nonEmpty || sizeBytes == rawChunkBytes,
                  s"hdf5: chunk at row $rowOff stores $sizeBytes bytes, " +
                    s"expected the unfiltered $rawChunkBytes")
                Seq((rowOff, child, sizeBytes))
              }
            }
          }
          val cs = chunks(btAddr).sortBy(_._1)
          // every row must be covered exactly once by the chunk grid
          cs.zipWithIndex.foreach { case ((off, _, _), i) =>
            require(off == i * chunkRows,
              s"hdf5: chunk grid hole — chunk $i starts at row $off, " +
                s"expected ${i * chunkRows}")
          }
          require(n == 0 || cs.nonEmpty && cs.length == (n + chunkRows - 1) / chunkRows,
            s"hdf5: ${cs.length} chunks cannot cover $n rows at $chunkRows rows/chunk")
          Dset(n, c, Chunked(cs, chunkRows, filters))
        case other =>
          throw new IllegalArgumentException(s"hdf5: layout class $other " +
            "unsupported (contiguous and unfiltered v1-B-tree chunked " +
            "are the supported profile)")
      }
    } finally f.close()
  }

  /** Filter-pipeline message (0x000B) v1/v2 → stages in pipeline (write)
    * order. Only deflate(1)/shuffle(2)/fletcher32(3) pass — anything
    * else (szip, nbit, user filters) refuses loudly at plan time rather
    * than decoding garbage. */
  private def parseFilters(body: ByteBuffer): Seq[H5Filter] = {
    val ver = body.get(0) & 0xff
    require(ver == 1 || ver == 2,
      s"hdf5: filter pipeline message version $ver (profile is v1/v2)")
    val nf = body.get(1) & 0xff
    var pos = if (ver == 1) 8 else 2
    (0 until nf).map { _ =>
      val id = body.getShort(pos) & 0xffff
      pos += 2
      var nameLen = 0
      if (ver == 1 || id >= 256) { nameLen = body.getShort(pos) & 0xffff; pos += 2 }
      body.getShort(pos) // flags (bit 0 = optional) — irrelevant on read
      val nvals = body.getShort(pos + 2) & 0xffff
      pos += 4
      if (ver == 1 && nameLen > 0) nameLen = pad8(nameLen)
      pos += nameLen
      val cdata = Array.tabulate(nvals)(i => body.getInt(pos + 4 * i))
      pos += 4 * nvals
      if (ver == 1 && nvals % 2 == 1) pos += 4 // odd client-data padding
      require(id == 1 || id == 2 || id == 3,
        s"hdf5: filter id $id is outside the deflate/shuffle/fletcher32 " +
          "profile — re-store without it")
      H5Filter(id, cdata)
    }
  }

  /** HDF5's fletcher32 (H5checksum.c): 16-bit words assembled BIG-endian
    * from the byte stream, sums folded every 360 words, an odd tail byte
    * used as the HIGH byte of a final word. */
  private[sources] def fletcher32(data: Array[Byte], len: Int): Long = {
    var s1 = 0L; var s2 = 0L
    val words = len / 2
    var i = 0
    while (i < words) {
      val block = math.min(360, words - i)
      var b = 0
      while (b < block) {
        s1 += ((data(2 * i) & 0xffL) << 8) | (data(2 * i + 1) & 0xffL)
        s2 += s1
        i += 1; b += 1
      }
      s1 = (s1 & 0xffff) + (s1 >>> 16)
      s2 = (s2 & 0xffff) + (s2 >>> 16)
    }
    if (len % 2 == 1) { s1 += (data(len - 1) & 0xffL) << 8; s2 += s1 }
    s1 = (s1 & 0xffff) + (s1 >>> 16)
    s2 = (s2 & 0xffff) + (s2 >>> 16)
    s1 = (s1 & 0xffff) + (s1 >>> 16)
    s2 = (s2 & 0xffff) + (s2 >>> 16)
    ((s2 & 0xffff) << 16) | (s1 & 0xffff)
  }

  /** Executor-side chunk decode: filter INVERSES in reverse pipeline
    * order — fletcher32 verify+strip, zlib inflate, byte unshuffle. The
    * decoded chunk must be exactly `rawBytes` (edge chunks are padded
    * before filtering). */
  private def decodeChunk(stored: Array[Byte], filters: Seq[H5Filter],
      rawBytes: Long): Array[Byte] = {
    var cur = stored
    filters.reverseIterator.foreach { f =>
      f.id match {
        case 3 =>
          require(cur.length >= 4, "hdf5: fletcher32 chunk shorter than its checksum")
          val want = java.nio.ByteBuffer.wrap(cur, cur.length - 4, 4)
            .order(ByteOrder.LITTLE_ENDIAN).getInt.toLong & 0xffffffffL
          val got = fletcher32(cur, cur.length - 4)
          require(got == want,
            s"hdf5: fletcher32 checksum mismatch (stored $want computed $got)")
          cur = java.util.Arrays.copyOf(cur, cur.length - 4)
        case 1 =>
          val inf = new java.util.zip.Inflater()
          inf.setInput(cur)
          val out = new java.io.ByteArrayOutputStream(
            math.min(rawBytes, 1L << 20).toInt)
          val buf = new Array[Byte](1 << 16)
          try {
            while (!inf.finished()) {
              val k = inf.inflate(buf)
              if (k == 0) {
                require(!inf.needsInput() && !inf.needsDictionary(),
                  "hdf5: truncated/invalid deflate chunk")
              } else out.write(buf, 0, k)
            }
          } finally inf.end()
          cur = out.toByteArray
        case 2 =>
          val es = if (f.cdata.nonEmpty) f.cdata(0) else 8
          require(es > 0 && cur.length % es == 0,
            s"hdf5: shuffle element size $es does not divide chunk ${cur.length}")
          val nElems = cur.length / es
          val out = new Array[Byte](cur.length)
          var k = 0
          while (k < es) {
            var i = 0
            while (i < nElems) { out(i * es + k) = cur(k * nElems + i); i += 1 }
            k += 1
          }
          cur = out
        case other =>
          throw new IllegalArgumentException(s"hdf5: filter id $other")
      }
    }
    require(cur.length.toLong == rawBytes,
      s"hdf5: decoded chunk is ${cur.length} bytes, expected $rawBytes")
    cur
  }

  /** All messages of a v1 object header, following continuation blocks
    * (type 0x0010) — returns (type, body) with body positioned at 0. */
  private def objectHeaderMessages(f: At, addr: Long): Seq[(Int, ByteBuffer)] = {
    val pre = f.bytes(addr, 16)
    val ver = pre.get(0)
    require(ver == 1, s"hdf5: object header version $ver at $addr " +
      "(v2 'OHDR' headers are outside the supported profile)")
    val nmsgs = pre.getShort(2) & 0xffff
    val firstLen = pre.getInt(8)
    val out = scala.collection.mutable.ArrayBuffer.empty[(Int, ByteBuffer)]
    var blocks = List((addr + 16, firstLen.toLong))
    var read = 0
    while (read < nmsgs && blocks.nonEmpty) {
      val (ba, blen) = blocks.head
      blocks = blocks.tail
      val buf = f.bytes(ba, blen.toInt)
      while (read < nmsgs && buf.remaining >= 8) {
        val tpe = buf.getShort & 0xffff
        val sz = buf.getShort & 0xffff
        buf.getInt // flags + reserved
        val body = new Array[Byte](sz)
        buf.get(body)
        val bb = ByteBuffer.wrap(body).order(ByteOrder.LITTLE_ENDIAN)
        if (tpe == 0x0010) blocks = blocks :+ ((bb.getLong(0), bb.getLong(8)))
        else out += ((tpe, bb))
        read += 1
      }
    }
    require(read == nmsgs,
      s"hdf5: object header at $addr declared $nmsgs messages, found $read")
    out.toSeq
  }

  /** Read a float64 dataset written by [[write]] (or any writer using
    * the same profile) back as (row_index, c0..c{k-1}). */
  def read(spark: SparkSession, path: String, dataset: String = "data",
      colNames: Seq[String] = Nil): DataFrame = {
    val d = locate(path, dataset)
    val names =
      if (colNames.nonEmpty) colNames else (0 until d.c).map(j => s"c$j")
    require(names.length == d.c,
      s"hdf5: ${names.length} column names for ${d.c} columns")
    val schema = StructType(StructField("row_index", LongType, nullable = false) +:
      names.map(StructField(_, DoubleType, nullable = false)))
    if (d.n == 0L)
      return spark.createDataFrame(spark.sparkContext.emptyRDD[Row], schema)
    val c = d.c
    val rowBytes = c * 8L
    val n = d.n
    val rows = d.layout match {
      case Contig(addr, sizeBytes) =>
        require(addr != UNDEF, s"hdf5: dataset '$dataset' has $n rows but " +
          "an undefined data address (unallocated dataset)")
        require(sizeBytes == n * rowBytes,
          s"hdf5: layout size $sizeBytes != $n x $c x 8")
        // task count from BYTES, not rows (r15 ADVICE: a row-based split
        // ignores column width — per-task buffers were unbounded for very
        // wide datasets and overflowed Int past ~2 GB/task): ~256 MB/task,
        // capped; and each task reads its range in <= 64 MB pieces so the
        // buffer stays bounded no matter how the division rounds.
        val totalBytes = n * rowBytes
        val nTasks = math.min(4096L,
          math.max(1L, (totalBytes + (256L << 20) - 1) / (256L << 20))).toInt
        val per = (n + nTasks - 1) / nTasks
        val pieceRows = math.max(1L, (64L << 20) / rowBytes)
        spark.sparkContext
          .parallelize(0 until nTasks, nTasks)
          .flatMap { t =>
            val first = t * per
            val last = math.min(n, first + per)
            if (first >= last) Iterator.empty
            else (first until last by pieceRows).iterator.flatMap { p0 =>
              val pEnd = math.min(last, p0 + pieceRows)
              val raf = new RandomAccessFile(path, "r")
              val bytes = new Array[Byte](((pEnd - p0) * rowBytes).toInt)
              try { raf.seek(addr + p0 * rowBytes); raf.readFully(bytes) }
              finally raf.close()
              val buf = ByteBuffer.wrap(bytes).order(ByteOrder.LITTLE_ENDIAN)
              (p0 until pEnd).iterator.map { i =>
                val base = ((i - p0) * rowBytes).toInt
                Row.fromSeq(i +: (0 until c).map(j => buf.getDouble(base + j * 8)))
              }
            }
          }
      case Chunked(chunkList, chunkRows, filters) =>
        val rawChunkBytes = chunkRows * rowBytes
        require(rawChunkBytes <= (1L << 30),
          s"hdf5: $rawChunkBytes-byte chunks exceed the 1 GB read bound")
        chunkList.foreach { case (rowOff, _, stored) =>
          require(stored <= (1L << 30),
            s"hdf5: stored chunk at row $rowOff is $stored bytes (> 1 GB)")
        }
        // parallelize over chunks, ~256 MB of RAW bytes per task (the
        // decode cost scales with raw, not stored, size); edge chunks
        // are padded on disk, so emit only rows < n
        val perTask = math.max(1L, (256L << 20) / rawChunkBytes).toInt
        val groups = chunkList.grouped(perTask).toSeq
        spark.sparkContext
          .parallelize(groups, groups.length)
          .flatMap { group =>
            group.iterator.flatMap { case (rowOff, addr, stored) =>
              val keep = math.min(chunkRows, n - rowOff)
              val raf = new RandomAccessFile(path, "r")
              val storedBytes = new Array[Byte](stored.toInt)
              try { raf.seek(addr); raf.readFully(storedBytes) }
              finally raf.close()
              val bytes =
                if (filters.isEmpty) storedBytes
                else decodeChunk(storedBytes, filters, rawChunkBytes)
              val buf = ByteBuffer.wrap(bytes).order(ByteOrder.LITTLE_ENDIAN)
              (0L until keep).iterator.map { r =>
                val base = (r * rowBytes).toInt
                Row.fromSeq((rowOff + r) +:
                  (0 until c).map(j => buf.getDouble(base + j * 8)))
              }
            }
          }
    }
    spark.createDataFrame(rows, schema)
  }
}
