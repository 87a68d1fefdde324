package graft.sources

import com.fasterxml.jackson.databind.ObjectMapper
import org.apache.hadoop.fs.Path
import org.apache.spark.sql.SparkSession
import java.nio.{ByteBuffer, ByteOrder}

/** Deletion-vector support for the Delta bridge: parses the public DV
  * descriptor (add-action `deletionVector` JSON), resolves its storage
  * (inline Z85 payload, UUID-derived `.bin` file, or absolute path), and
  * decodes the serialized 64-bit roaring bitmap into a serializable,
  * queryable row-index set. All formats here are from the public Delta
  * protocol spec (Deletion Vector Descriptor Schema + Deletion Vector
  * Format) and the public RoaringFormatSpec; Z85 is ZeroMQ RFC 32.
  *
  * Scale shape: one DV is per-FILE metadata, decoded once on the driver
  * per scanned file and shipped to executors inside the per-file filter's
  * closure — bytes proportional to deleted-row count of that file, never
  * to table size. Row filtering itself is a bitmap `contains` per row.
  */
private[graft] object DeletionVectors {

  private val mapper = new ObjectMapper()

  final case class Descriptor(
      storageType: String,
      pathOrInlineDv: String,
      offset: Option[Int],
      sizeInBytes: Int,
      cardinality: Long)

  def parse(json: String): Descriptor = {
    val n = mapper.readTree(json)
    Descriptor(
      n.get("storageType").asText(),
      n.get("pathOrInlineDv").asText(),
      Option(n.get("offset")).filterNot(_.isNull).map(_.asInt()),
      n.get("sizeInBytes").asInt(),
      Option(n.get("cardinality")).filterNot(_.isNull).map(_.asLong()).getOrElse(-1L))
  }

  // --------------------------------------------------------------- Z85

  private val z85Alphabet =
    "0123456789abcdefghijklmnopqrstuvwxyzABCDEFGHIJKLMNOPQRSTUVWXYZ.-:+=^!/*?&<>()[]{}@%$#"
  private val z85Rev: Array[Int] = {
    val r = Array.fill(128)(-1)
    z85Alphabet.zipWithIndex.foreach { case (c, i) => r(c.toInt) = i }
    r
  }

  /** ZeroMQ Z85: every 5 chars decode to 4 bytes (big-endian base 85). */
  def z85Decode(s: String): Array[Byte] = {
    require(s.length % 5 == 0, s"Z85 length ${s.length} not a multiple of 5")
    val out = new Array[Byte](s.length / 5 * 4)
    var i = 0
    while (i < s.length) {
      var v = 0L
      var j = 0
      while (j < 5) {
        val c = s.charAt(i + j)
        val d = if (c < 128) z85Rev(c.toInt) else -1
        require(d >= 0, s"invalid Z85 character '$c'")
        v = v * 85 + d
        j += 1
      }
      val o = i / 5 * 4
      out(o) = (v >>> 24).toByte; out(o + 1) = (v >>> 16).toByte
      out(o + 2) = (v >>> 8).toByte; out(o + 3) = v.toByte
      i += 5
    }
    out
  }

  // ------------------------------------------------------ blob resolution

  private val portableMagic = 1681511377 // RoaringBitmapArray portable format

  /** Decode the descriptor into the set of deleted row indexes.
    * Storage types per spec: `i` inline (Z85 of the data), `u` a
    * `deletion_vector_<uuid>.bin` under the table (Z85 UUID with optional
    * random prefix), `p` an absolute path. File storage frames the data as
    * version byte 1 at offset 0, then per DV: 4-byte big-endian length,
    * the data bytes, 4-byte big-endian CRC-32 of the data.
    */
  def readBitmap(spark: SparkSession, tablePath: String, d: Descriptor): RoaringArray = {
    val data: Array[Byte] = d.storageType match {
      case "i" =>
        val b = z85Decode(d.pathOrInlineDv)
        // Z85 pads to 4-byte groups; sizeInBytes is the real length
        if (b.length == d.sizeInBytes) b else java.util.Arrays.copyOf(b, d.sizeInBytes)
      case "u" | "p" =>
        val file =
          if (d.storageType == "p") new Path(d.pathOrInlineDv)
          else {
            val enc = d.pathOrInlineDv
            require(enc.length >= 20, s"UUID DV path too short: $enc")
            val prefix = enc.dropRight(20)
            val uuidBytes = z85Decode(enc.takeRight(20))
            val bb = ByteBuffer.wrap(uuidBytes)
            val uuid = new java.util.UUID(bb.getLong, bb.getLong)
            val name = s"deletion_vector_$uuid.bin"
            if (prefix.isEmpty) new Path(tablePath, name)
            else new Path(new Path(tablePath, prefix), name)
          }
        val fs = file.getFileSystem(spark.sessionState.newHadoopConf())
        val in = fs.open(file)
        try {
          val off = d.offset.getOrElse(
            throw new IllegalArgumentException(s"file-stored DV missing offset: $d"))
          in.seek(off.toLong)
          val lenBuf = new Array[Byte](4)
          in.readFully(lenBuf)
          val len = ByteBuffer.wrap(lenBuf).getInt // big-endian
          require(len == d.sizeInBytes,
            s"DV length $len at offset $off != descriptor sizeInBytes ${d.sizeInBytes}")
          val buf = new Array[Byte](len)
          in.readFully(buf)
          val crcBuf = new Array[Byte](4)
          in.readFully(crcBuf)
          val crc = new java.util.zip.CRC32
          crc.update(buf)
          val expected = ByteBuffer.wrap(crcBuf).getInt
          require(crc.getValue.toInt == expected,
            s"DV checksum mismatch in $file at offset $off")
          buf
        } finally in.close()
      case other =>
        throw new IllegalArgumentException(s"unknown DV storageType '$other'")
    }
    val bb = ByteBuffer.wrap(data).order(ByteOrder.LITTLE_ENDIAN)
    val magic = bb.getInt
    require(magic == portableMagic,
      s"unsupported deletion-vector serialization magic $magic (expected portable $portableMagic)")
    val arr = RoaringArray.deserialize(bb)
    require(d.cardinality < 0 || arr.cardinality == d.cardinality,
      s"DV cardinality ${arr.cardinality} != descriptor ${d.cardinality}")
    arr
  }

  // ------------------------------------------ 64-bit roaring bitmap array

  /** A parsed RoaringBitmapArray: dense array of 32-bit roaring bitmaps
    * indexed by the high 32 bits of the row index. Immutable, serializable
    * (ships inside per-file filter closures), answers `contains`.
    */
  final class RoaringArray(val bitmaps: Array[Roaring32]) extends Serializable {
    def contains(v: Long): Boolean = {
      val high = (v >>> 32).toInt
      high < bitmaps.length && high >= 0 && bitmaps(high).contains(v.toInt)
    }
    def cardinality: Long = bitmaps.iterator.map(_.cardinality.toLong).sum
  }

  object RoaringArray {
    /** Portable RoaringBitmapArray: 8-byte LE bitmap count, then that many
      * standard-serialization 32-bit roaring bitmaps in key order (absent
      * keys are present as empty bitmaps).
      */
    def deserialize(bb: ByteBuffer): RoaringArray = {
      val n = bb.getLong
      require(n >= 0 && n < Int.MaxValue, s"implausible DV bitmap count $n")
      new RoaringArray(Array.fill(n.toInt)(Roaring32.deserialize(bb)))
    }
  }

  /** One 32-bit roaring bitmap (public RoaringFormatSpec): sorted 16-bit
    * container keys, each an array (sorted shorts), bitmap (1024 longs),
    * or run (sorted start/length pairs) container.
    */
  final class Roaring32(
      keys: Array[Short],
      containers: Array[AnyRef]) extends Serializable {
    def contains(v: Int): Boolean = {
      val key = (v >>> 16).toShort
      val idx = binarySearch(key)
      if (idx < 0) return false
      val low = v & 0xFFFF
      containers(idx) match {
        case arr: Array[Short] =>
          java.util.Arrays.binarySearch(arr, low.toShort) match {
            case i if i >= 0 => true
            case _ =>
              // binarySearch on shorts uses signed order; container values
              // are sorted UNSIGNED per spec, so search manually when the
              // container spans the sign boundary
              unsignedSearch(arr, low)
          }
        case words: Array[Long] => (words(low >>> 6) & (1L << (low & 63))) != 0
        case runs: Array[Int] => runContains(runs, low)
      }
    }

    private def unsignedSearch(arr: Array[Short], low: Int): Boolean = {
      var lo = 0; var hi = arr.length - 1
      while (lo <= hi) {
        val mid = (lo + hi) >>> 1
        val mv = arr(mid) & 0xFFFF
        if (mv == low) return true
        else if (mv < low) lo = mid + 1
        else hi = mid - 1
      }
      false
    }

    private def runContains(runs: Array[Int], low: Int): Boolean = {
      // runs packed as (start | (length << 16)); value in [start, start+length]
      var lo = 0; var hi = runs.length - 1
      while (lo <= hi) {
        val mid = (lo + hi) >>> 1
        val start = runs(mid) & 0xFFFF
        val len = runs(mid) >>> 16
        if (low < start) hi = mid - 1
        else if (low > start + len) lo = mid + 1
        else return true
      }
      false
    }

    private def binarySearch(key: Short): Int = {
      var lo = 0; var hi = keys.length - 1
      val k = key & 0xFFFF
      while (lo <= hi) {
        val mid = (lo + hi) >>> 1
        val mk = keys(mid) & 0xFFFF
        if (mk == k) return mid
        else if (mk < k) lo = mid + 1
        else hi = mid - 1
      }
      -1
    }

    def cardinality: Int = containers.iterator.map {
      case arr: Array[Short] => arr.length
      case words: Array[Long] => words.iterator.map(java.lang.Long.bitCount).sum
      case runs: Array[Int] => runs.iterator.map(r => (r >>> 16) + 1).sum
    }.sum
  }

  object Roaring32 {
    private val SerialCookieNoRuns = 12346
    private val SerialCookie = 12347
    private val NoOffsetThreshold = 4

    /** Standard roaring serialization (RoaringFormatSpec). `bb` must be
      * little-endian and positioned at the cookie; position advances past
      * the bitmap.
      */
    def deserialize(bb: ByteBuffer): Roaring32 = {
      val cookie = bb.getInt
      val (size, runFlags: Array[Byte]) =
        if ((cookie & 0xFFFF) == SerialCookie) {
          val n = (cookie >>> 16) + 1
          val flags = new Array[Byte]((n + 7) / 8)
          bb.get(flags)
          (n, flags)
        } else if (cookie == SerialCookieNoRuns) {
          (bb.getInt, Array.empty[Byte])
        } else {
          throw new IllegalArgumentException(s"not a roaring bitmap (cookie $cookie)")
        }
      def isRun(i: Int): Boolean =
        runFlags.nonEmpty && (runFlags(i / 8) & (1 << (i % 8))) != 0
      val keys = new Array[Short](size)
      val cards = new Array[Int](size)
      var i = 0
      while (i < size) {
        keys(i) = bb.getShort
        cards(i) = (bb.getShort & 0xFFFF) + 1
        i += 1
      }
      // offset headers present without run containers, or when size >= 4
      if (runFlags.isEmpty || size >= NoOffsetThreshold) {
        var j = 0
        while (j < size) { bb.getInt; j += 1 } // we read sequentially anyway
      }
      val containers = new Array[AnyRef](size)
      i = 0
      while (i < size) {
        if (isRun(i)) {
          val nRuns = bb.getShort & 0xFFFF
          val runs = new Array[Int](nRuns)
          var r = 0
          while (r < nRuns) {
            val start = bb.getShort & 0xFFFF
            val len = bb.getShort & 0xFFFF
            runs(r) = start | (len << 16)
            r += 1
          }
          containers(i) = runs
        } else if (cards(i) <= 4096) {
          val arr = new Array[Short](cards(i))
          var a = 0
          while (a < cards(i)) { arr(a) = bb.getShort; a += 1 }
          containers(i) = arr
        } else {
          val words = new Array[Long](1024)
          var w = 0
          while (w < 1024) { words(w) = bb.getLong; w += 1 }
          containers(i) = words
        }
        i += 1
      }
      new Roaring32(keys, containers)
    }
  }
}
