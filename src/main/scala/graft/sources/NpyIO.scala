package graft.sources

import java.io.{DataInputStream, DataOutputStream, EOFException}
import java.nio.{ByteBuffer, ByteOrder}
import java.nio.charset.StandardCharsets

import org.apache.hadoop.conf.Configuration
import org.apache.hadoop.fs.{FileSystem, Path}
import org.apache.spark.sql.{DataFrame, Row, SparkSession}
import org.apache.spark.sql.types._

/** NumPy `.npy` matrix I/O — the reference's canonical vector artifact
  * (reference loaders.py:73-80 memory-maps `vectors.npy`; artifacts.py
  * writes it). The format is a public spec (NEP-1 / numpy.lib.format):
  *
  * {{{
  *   \x93NUMPY | major minor | header_len | header dict | raw C-order data
  *      6 B        2 B         2 B (v1) /    ASCII, space-padded so the
  *                             4 B (v2+)     data offset is 64-aligned
  * }}}
  *
  * READ is the distributed path and is designed for scale: the driver
  * parses only the header, then each task seeks its own byte range of the
  * data section through the Hadoop filesystem (HDFS/S3A/file) and reads
  * fixed-length rows — no single-node pass over the matrix, no shuffle,
  * ~`targetPartitionBytes` per task regardless of file size. A 100 TB-
  * scale corpus shipped as (several) .npy shards parallelises exactly
  * like a parquet scan.
  *
  * WRITE is a driver-side artifact utility (specs + interop): a .npy file
  * is single-stream by format, so the writer is sequential by nature; it
  * streams row-by-row (memory O(one row)) and exists to produce the
  * reference's artifact shape, not as a bulk sink — big corpora belong in
  * parquet.
  */
object NpyIO {

  /** Parsed .npy header. `rows`×`cols` C-order matrix starting at byte
    * `dataOffset`; 1-D arrays read as cols = 1. */
  final case class NpyHeader(descr: String, rows: Long, cols: Int, dataOffset: Long) {
    def itemSize: Int = NpyIO.itemSize(descr)
    def rowBytes: Long = cols.toLong * itemSize
  }

  private val Magic = Array[Byte](0x93.toByte, 'N', 'U', 'M', 'P', 'Y')

  /** Element width for the supported dtypes (little-endian float/int). */
  def itemSize(descr: String): Int = descr match {
    case "<f4" | "<i4" => 4
    case "<f8" | "<i8" => 8
    case other => throw new IllegalArgumentException(
      s"unsupported .npy descr '$other' (supported: <f4 <f8 <i4 <i8)")
  }

  private val HeaderRe =
    """'descr':\s*'([^']+)'.*'fortran_order':\s*(True|False).*'shape':\s*\(([^)]*)\)""".r

  /** Parse the header from an open stream positioned at byte 0. */
  def readHeader(in: DataInputStream): NpyHeader = {
    val magic = new Array[Byte](6)
    in.readFully(magic)
    if (!java.util.Arrays.equals(magic, Magic))
      throw new IllegalArgumentException("not a .npy file (bad magic)")
    val major = in.readUnsignedByte()
    in.readUnsignedByte() // minor — ignored
    val headerLen = major match {
      case 1 => // 2-byte little-endian
        val b = new Array[Byte](2); in.readFully(b)
        ByteBuffer.wrap(b).order(ByteOrder.LITTLE_ENDIAN).getShort & 0xFFFF
      case 2 | 3 => // 4-byte little-endian
        val b = new Array[Byte](4); in.readFully(b)
        val v = ByteBuffer.wrap(b).order(ByteOrder.LITTLE_ENDIAN).getInt
        if (v < 0) throw new IllegalArgumentException(s"header_len overflow: $v")
        v
      case v => throw new IllegalArgumentException(s"unsupported .npy version $v")
    }
    val hb = new Array[Byte](headerLen)
    in.readFully(hb)
    val header = new String(hb, StandardCharsets.US_ASCII)
    val (descr, fortran, shapeStr) = HeaderRe.findFirstMatchIn(header) match {
      case Some(m) => (m.group(1), m.group(2) == "True", m.group(3))
      case None => throw new IllegalArgumentException(s"unparseable .npy header: $header")
    }
    if (fortran) throw new IllegalArgumentException(
      ".npy fortran_order=True not supported (reference artifacts are C-order)")
    itemSize(descr) // validate dtype
    val dims = shapeStr.split(",").map(_.trim).filter(_.nonEmpty).map(_.toLong)
    val (rows, cols) = dims match {
      case Array(n) => (n, 1L)
      case Array(n, d) => (n, d)
      case _ => throw new IllegalArgumentException(
        s".npy shape (${shapeStr}) not 1-D/2-D")
    }
    if (cols > Int.MaxValue) throw new IllegalArgumentException(s"cols $cols > Int.MaxValue")
    val dataOffset = 6L + 2 + (if (major == 1) 2 else 4) + headerLen
    NpyHeader(descr, rows, cols.toInt, dataOffset)
  }

  /** Driver-side header read through the Hadoop filesystem (so hdfs:// /
    * s3a:// paths work the same as file://). Reads ~hundreds of bytes. */
  def readHeader(path: String, conf: Configuration = new Configuration()): NpyHeader = {
    val p = new Path(path)
    val fs = p.getFileSystem(conf)
    val in = new DataInputStream(fs.open(p))
    try readHeader(in) finally in.close()
  }

  /** Distributed matrix load: (row_id: Long, values: Array[Float]).
    * One task per ~`targetPartitionBytes` of data; each task opens the
    * file, seeks to `dataOffset + startRow·rowBytes`, and reads its rows
    * through a bounded refill buffer (≤ ~4 MB resident per task
    * regardless of split size). f8/i4/i8 values are converted to Float —
    * the embedding dtype — at read time. */
  def loadMatrix(spark: SparkSession, path: String,
                 idCol: String = "row_id", vecCol: String = "values",
                 targetPartitionBytes: Long = 128L << 20): DataFrame = {
    val h = readHeader(path)
    val rowBytes = h.rowBytes
    require(rowBytes > 0, s"empty rows: $h")
    val rowsPerTask = math.max(1L, targetPartitionBytes / rowBytes)
    val tasks = (0L until h.rows by rowsPerTask)
      .map(start => (start, math.min(rowsPerTask, h.rows - start)))
    val descr = h.descr
    val cols = h.cols
    val dataOffset = h.dataOffset
    val rdd = spark.sparkContext
      .parallelize(tasks, math.max(1, tasks.length))
      .flatMap { case (start, count) =>
        readRows(path, descr, cols, dataOffset, start, count)
      }
      .map { case (id, v) => Row(id, v) }
    val schema = StructType(Seq(
      StructField(idCol, LongType, nullable = false),
      StructField(vecCol, ArrayType(FloatType, containsNull = false), nullable = false)))
    spark.createDataFrame(rdd, schema)
  }

  /** One task's row range, as a lazily-refilled iterator: `chunk` rows per
    * refill, sized to ≤ ~4 MB, so a 128 MB split never holds more than the
    * refill buffer + one emitted row. */
  private def readRows(path: String, descr: String, cols: Int, dataOffset: Long,
                       start: Long, nRows: Long): Iterator[(Long, Array[Float])] = {
    val item = itemSize(descr)
    val rowBytes = cols.toLong * item
    val chunk = math.max(1L, (4L << 20) / rowBytes).min(nRows).toInt
    val p = new Path(path)
    val fs = p.getFileSystem(new Configuration())
    val in = fs.open(p)
    // a plan that stops early (limit/take/kill) abandons the iterator
    // before exhaustion — close with the task, not only on full drain
    Option(org.apache.spark.TaskContext.get())
      .foreach(_.addTaskCompletionListener[Unit] { _ =>
        try in.close() catch { case _: java.io.IOException => }
      })
    in.seek(dataOffset + start * rowBytes)
    val buf = new Array[Byte]((chunk * rowBytes).toInt)
    var emitted = 0L
    new Iterator[(Long, Array[Float])] {
      private var pending: Iterator[(Long, Array[Float])] = Iterator.empty
      private def refill(): Unit = {
        val n = math.min(chunk.toLong, nRows - emitted).toInt
        if (n <= 0) { in.close(); return }
        val bytes = (n * rowBytes).toInt
        try in.readFully(buf, 0, bytes)
        catch { case e: EOFException =>
          in.close()
          throw new IllegalStateException(
            s".npy truncated: expected $bytes bytes at row ${start + emitted}", e)
        }
        val bb = ByteBuffer.wrap(buf, 0, bytes).order(ByteOrder.LITTLE_ENDIAN)
        val base = start + emitted
        pending = (0 until n).iterator.map { i =>
          val v = new Array[Float](cols)
          var j = 0
          descr match {
            case "<f4" => val fb = bb.asFloatBuffer();
              fb.position(i * cols); while (j < cols) { v(j) = fb.get(); j += 1 }
            case "<f8" => val db = bb.asDoubleBuffer();
              db.position(i * cols); while (j < cols) { v(j) = db.get().toFloat; j += 1 }
            case "<i4" => val ib = bb.asIntBuffer();
              ib.position(i * cols); while (j < cols) { v(j) = ib.get().toFloat; j += 1 }
            case "<i8" => val lb = bb.asLongBuffer();
              lb.position(i * cols); while (j < cols) { v(j) = lb.get().toFloat; j += 1 }
          }
          (base + i, v)
        }
        emitted += n
      }
      def hasNext: Boolean = {
        if (pending.hasNext) true
        else if (emitted < nRows) { refill(); pending.hasNext }
        else { in.close(); false }
      }
      def next(): (Long, Array[Float]) = { if (!hasNext) Iterator.empty.next(); pending.next() }
    }
  }

  /** In-process (driver- or executor-local) full read of one .npy file as
    * a row-major float matrix — the weight-loading path (model tensors are
    * MBs, not corpora; the distributed loadMatrix is for data). */
  def readLocal(path: String, conf: Configuration = new Configuration()): Array[Array[Float]] = {
    val h = readHeader(path, conf)
    require(h.rows <= Int.MaxValue, s"readLocal on ${h.rows} rows — use loadMatrix")
    readRows(path, h.descr, h.cols, h.dataOffset, 0L, h.rows).map(_._2).toArray
  }

  /** Write a float32 .npy (v1.0 header, 64-aligned data offset) from a
    * row iterator — the reference's vectors.npy artifact shape. Driver-
    * side and sequential by format; memory O(one row). */
  def write(path: String, rows: Iterator[Array[Float]], nRows: Long, cols: Int,
            conf: Configuration = new Configuration()): Unit = {
    val p = new Path(path)
    val fs = p.getFileSystem(conf)
    val out = new DataOutputStream(new java.io.BufferedOutputStream(fs.create(p, true), 1 << 20))
    try {
      val dict = s"{'descr': '<f4', 'fortran_order': False, 'shape': ($nRows, $cols), }"
      // pad with spaces so magic(6)+ver(2)+len(2)+header is a multiple of 64,
      // header terminated by '\n' (numpy.lib.format)
      val unpadded = 6 + 2 + 2 + dict.length + 1
      val pad = (64 - unpadded % 64) % 64
      val header = dict + (" " * pad) + "\n"
      out.write(Magic)
      out.write(1); out.write(0)
      val lenB = ByteBuffer.allocate(2).order(ByteOrder.LITTLE_ENDIAN)
        .putShort(header.length.toShort).array()
      out.write(lenB)
      out.write(header.getBytes(StandardCharsets.US_ASCII))
      val bb = ByteBuffer.allocate(cols * 4).order(ByteOrder.LITTLE_ENDIAN)
      var written = 0L
      rows.foreach { r =>
        require(r.length == cols, s"row ${written} has ${r.length} cols, expected $cols")
        bb.clear()
        var j = 0
        while (j < cols) { bb.putFloat(r(j)); j += 1 }
        out.write(bb.array(), 0, cols * 4)
        written += 1
      }
      require(written == nRows, s"wrote $written rows, header promised $nRows")
    } finally out.close()
  }
}
