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
  /** Resolve a file-stored descriptor ("u" UUID-derived, "p" absolute) to
    * its `.bin` path. Used by the read path and by vacuum's live-set
    * accounting (a DV file referenced by a live add must never be
    * deleted). Inline ("i") descriptors have no file.
    */
  def dvFilePath(tablePath: String, d: Descriptor): Path = d.storageType match {
    case "p" => new Path(d.pathOrInlineDv)
    case "u" =>
      val enc = d.pathOrInlineDv
      require(enc.length >= 20, s"UUID DV path too short: $enc")
      val prefix = enc.dropRight(20)
      val uuidBytes = z85Decode(enc.takeRight(20))
      val bb = ByteBuffer.wrap(uuidBytes)
      val uuid = new java.util.UUID(bb.getLong, bb.getLong)
      val name = s"deletion_vector_$uuid.bin"
      if (prefix.isEmpty) new Path(tablePath, name)
      else new Path(new Path(tablePath, prefix), name)
    case other =>
      throw new IllegalArgumentException(s"DV storageType '$other' has no file")
  }

  def readBitmap(spark: SparkSession, tablePath: String, d: Descriptor): RoaringArray = {
    val data: Array[Byte] = d.storageType match {
      case "i" =>
        val b = z85Decode(d.pathOrInlineDv)
        // Z85 pads to 4-byte groups; sizeInBytes is the real length
        if (b.length == d.sizeInBytes) b else java.util.Arrays.copyOf(b, d.sizeInBytes)
      case "u" | "p" =>
        val file = dvFilePath(tablePath, d)
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
    val arr = decode(data)
    require(d.cardinality < 0 || arr.cardinality == d.cardinality,
      s"DV cardinality ${arr.cardinality} != descriptor ${d.cardinality}")
    arr
  }

  /** Iceberg v3 `deletion-vector-v1` puffin blob (public Iceberg Table
    * Spec v3, "Deletion vectors" — which adopted Delta's DV framing
    * verbatim for UniForm interop): 4-byte big-endian length of
    * (magic + vector), the portable magic, the 64-bit roaring bitmap,
    * then a 4-byte big-endian CRC-32 of (magic + vector). `offset` and
    * `size` come straight from the manifest entry (`content_offset` /
    * `content_size_in_bytes`), so the puffin FOOTER is never consulted
    * to read. Every mismatch (size, magic, CRC) fails loudly — a wrong
    * guess about a foreign writer's framing must never read wrong rows.
    */
  def readIcebergDv(
      fs: org.apache.hadoop.fs.FileSystem, path: Path,
      offset: Long, size: Long): RoaringArray =
    decode(readIcebergDvBytes(fs, path, offset, size))

  /** The CRC-verified serialized bitmap bytes (portable magic + roaring64)
    * of one blob, WITHOUT decoding — the v3 DV write path broadcasts these
    * to executors for consolidation, so the driver never materializes
    * position arrays.
    */
  def readIcebergDvBytes(
      fs: org.apache.hadoop.fs.FileSystem, path: Path,
      offset: Long, size: Long): Array[Byte] = {
    val in = fs.open(path)
    try {
      in.seek(offset)
      val lenBuf = new Array[Byte](4)
      in.readFully(lenBuf)
      val len = ByteBuffer.wrap(lenBuf).getInt // big-endian
      require(size < 0 || size == len + 8L,
        s"DV blob size $size != 4 + $len + 4 at $path:$offset")
      val buf = new Array[Byte](len)
      in.readFully(buf)
      val crcBuf = new Array[Byte](4)
      in.readFully(crcBuf)
      val crc = new java.util.zip.CRC32
      crc.update(buf)
      require(crc.getValue.toInt == ByteBuffer.wrap(crcBuf).getInt,
        s"DV checksum mismatch at $path:$offset")
      buf
    } finally in.close()
  }

  /** Decode serialized RoaringBitmapArray bytes (LE magic + bitmaps). */
  def decode(data: Array[Byte]): RoaringArray = {
    val bb = ByteBuffer.wrap(data).order(ByteOrder.LITTLE_ENDIAN)
    val magic = bb.getInt
    require(magic == portableMagic,
      s"unsupported deletion-vector serialization magic $magic (expected portable $portableMagic)")
    RoaringArray.deserialize(bb)
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

    /** Every set row index, ascending — the write path unions an existing
      * DV with newly deleted rows through this. Bounded by one file's
      * deleted-row count.
      */
    def toLongArray: Array[Long] = {
      val out = Array.newBuilder[Long]
      var h = 0
      while (h < bitmaps.length) {
        val hi = h.toLong << 32
        bitmaps(h).foreachValue(v => out += (hi | (v & 0xFFFFFFFFL)))
        h += 1
      }
      out.result()
    }
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

    /** Visit every set 32-bit value in ascending order. */
    def foreachValue(f: Int => Unit): Unit = {
      var i = 0
      while (i < keys.length) {
        val base = (keys(i) & 0xFFFF) << 16
        containers(i) match {
          case arr: Array[Short] => arr.foreach(s => f(base | (s & 0xFFFF)))
          case words: Array[Long] =>
            var w = 0
            while (w < 1024) {
              var bits = words(w)
              while (bits != 0) {
                f(base | (w << 6) | java.lang.Long.numberOfTrailingZeros(bits))
                bits &= bits - 1
              }
              w += 1
            }
          case runs: Array[Int] =>
            runs.foreach { r =>
              val start = r & 0xFFFF; val len = r >>> 16
              var v = start
              while (v <= start + len) { f(base | v); v += 1 }
            }
        }
        i += 1
      }
    }
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

  // ----------------------------------------------------------- write side

  /** Z85-encode `bytes` (zero-padded up to a 4-byte multiple; the caller
    * records the real length in the descriptor's `sizeInBytes`, which is
    * how [[readBitmap]] knows to truncate).
    */
  def z85Encode(bytes: Array[Byte]): String = {
    val padded =
      if (bytes.length % 4 == 0) bytes
      else java.util.Arrays.copyOf(bytes, (bytes.length / 4 + 1) * 4)
    val sb = new StringBuilder(padded.length / 4 * 5)
    var i = 0
    while (i < padded.length) {
      var v = ((padded(i) & 0xFFL) << 24) | ((padded(i + 1) & 0xFFL) << 16) |
        ((padded(i + 2) & 0xFFL) << 8) | (padded(i + 3) & 0xFFL)
      val out = new Array[Char](5)
      var j = 4
      while (j >= 0) { out(j) = z85Alphabet((v % 85).toInt); v /= 85; j -= 1 }
      sb.appendAll(out)
      i += 4
    }
    sb.toString
  }

  /** Serialize sorted-or-not row indexes into the portable
    * RoaringBitmapArray form [[readBitmap]] (and delta-spark/delta-rs)
    * decode: LE magic, 8-byte LE bitmap count (dense by high-32 key), then
    * per key a standard-serialization 32-bit roaring bitmap — cookie
    * 12346, container count, (key, cardinality-1) descriptors, offset
    * header, then sorted-short array containers (≤4096 values) or
    * 1024-long bitmap containers. Pure function — safe to run on
    * executors so the driver only ever sees the compressed bytes.
    */
  def serialize(rowIndexes: Array[Long]): Array[Byte] = {
    require(rowIndexes.nonEmpty, "empty deletion vector")
    val sorted = rowIndexes.clone().distinct.sorted
    require(sorted.head >= 0, s"negative row index ${sorted.head}")
    val maxHigh = (sorted.last >>> 32).toInt
    // group by high-32 key (dense array — absent keys are empty bitmaps)
    val byHigh = Array.fill(maxHigh + 1)(Array.newBuilder[Int])
    sorted.foreach(v => byHigh((v >>> 32).toInt) += v.toInt)

    def roaring32Bytes(values: Array[Int]): Array[Byte] = {
      // group low values by high-16 container key, preserving sorted order
      val keys = Array.newBuilder[Short]
      val containers = Array.newBuilder[Array[Int]]
      var i = 0
      while (i < values.length) {
        val key = values(i) >>> 16
        var j = i
        while (j < values.length && (values(j) >>> 16) == key) j += 1
        keys += key.toShort
        containers += values.slice(i, j).map(_ & 0xFFFF)
        i = j
      }
      val ks = keys.result(); val cs = containers.result()
      def containerBytes(c: Array[Int]): Int = if (c.length <= 4096) 2 * c.length else 8192
      val headerLen = 4 + 4 + 4 * ks.length + 4 * ks.length // cookie+count+desc+offsets
      val total = headerLen + cs.iterator.map(containerBytes).sum
      val bb = ByteBuffer.allocate(total).order(ByteOrder.LITTLE_ENDIAN)
      bb.putInt(12346) // SERIAL_COOKIE_NO_RUNCONTAINER
      bb.putInt(ks.length)
      var k = 0
      while (k < ks.length) {
        bb.putShort(ks(k)); bb.putShort((cs(k).length - 1).toShort); k += 1
      }
      var off = headerLen
      k = 0
      while (k < ks.length) { bb.putInt(off); off += containerBytes(cs(k)); k += 1 }
      k = 0
      while (k < ks.length) {
        val c = cs(k)
        if (c.length <= 4096) c.foreach(v => bb.putShort(v.toShort))
        else {
          val words = new Array[Long](1024)
          c.foreach(v => words(v >>> 6) |= 1L << (v & 63))
          words.foreach(bb.putLong)
        }
        k += 1
      }
      bb.array()
    }

    val bitmaps = byHigh.map(b => roaring32Bytes(b.result()))
    val out = ByteBuffer.allocate(4 + 8 + bitmaps.iterator.map(_.length).sum)
      .order(ByteOrder.LITTLE_ENDIAN)
    out.putInt(portableMagic)
    out.putLong(bitmaps.length.toLong)
    bitmaps.foreach(out.put)
    out.array()
  }

  /** Max serialized size that stays inline in the add action's JSON;
    * larger vectors go to a `.bin` sidecar (delta-spark's shape).
    */
  val InlineThresholdBytes = 4096

  /** Frame one or more serialized DVs into `.bin`-file bytes per the spec:
    * version byte 1, then per DV a 4-byte big-endian length, the data, and
    * a 4-byte big-endian CRC-32 of the data. Returns the framed blob and
    * each input's offset (pointing at its length word, as descriptors
    * expect).
    */
  def frameBinFile(dvs: Seq[Array[Byte]]): (Array[Byte], Seq[Int]) = {
    val total = 1 + dvs.iterator.map(_.length + 8).sum
    val bb = ByteBuffer.wrap(new Array[Byte](total)) // big-endian frames
    bb.put(1.toByte)
    val offsets = Seq.newBuilder[Int]
    dvs.foreach { d =>
      offsets += bb.position()
      bb.putInt(d.length)
      bb.put(d)
      val crc = new java.util.zip.CRC32
      crc.update(d)
      bb.putInt(crc.getValue.toInt)
    }
    (bb.array(), offsets.result())
  }

  /** Descriptor JSON for an inline DV. */
  def inlineDescriptorJson(data: Array[Byte], cardinality: Long): String = {
    val m = new ObjectMapper()
    val n = m.createObjectNode()
    n.put("storageType", "i")
    n.put("pathOrInlineDv", z85Encode(data))
    n.put("sizeInBytes", data.length)
    n.put("cardinality", cardinality)
    m.writeValueAsString(n)
  }

  /** Descriptor JSON for a DV at an absolute path (`storageType` "p") —
    * how shallow clones keep referencing the SOURCE table's `.bin`
    * sidecars after the add actions move to another table's log. */
  def absoluteDescriptorJson(
      path: String, offset: Option[Int], sizeInBytes: Int, cardinality: Long): String = {
    val m = new ObjectMapper()
    val n = m.createObjectNode()
    n.put("storageType", "p")
    n.put("pathOrInlineDv", path)
    offset.foreach(n.put("offset", _))
    n.put("sizeInBytes", sizeInBytes)
    n.put("cardinality", cardinality)
    m.writeValueAsString(n)
  }

  /** Descriptor JSON for a DV stored in a UUID-derived `.bin` under the
    * table root (`storageType` "u").
    */
  def uuidDescriptorJson(
      uuid: java.util.UUID, offset: Int, sizeInBytes: Int, cardinality: Long): String = {
    val bb = ByteBuffer.allocate(16)
    bb.putLong(uuid.getMostSignificantBits)
    bb.putLong(uuid.getLeastSignificantBits)
    val m = new ObjectMapper()
    val n = m.createObjectNode()
    n.put("storageType", "u")
    n.put("pathOrInlineDv", z85Encode(bb.array()))
    n.put("offset", offset)
    n.put("sizeInBytes", sizeInBytes)
    n.put("cardinality", cardinality)
    m.writeValueAsString(n)
  }
}
