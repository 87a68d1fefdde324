package graft.sources

import java.nio.{ByteBuffer, ByteOrder}
import org.apache.spark.sql.functions._
import graft.SparkSpec

/** Deletion-vector decoding against INDEPENDENTLY-constructed fixtures: a
  * test-side serializer writes the public formats (RoaringFormatSpec
  * containers, RoaringBitmapArray portable framing, the DV file layout,
  * Z85) and the main-side parser must read them back. Byte-level anchors
  * — the RFC 32 Z85 test vector and a hand-computed container layout —
  * pin the formats themselves, so serializer and parser can't drift
  * together.
  */
class DeletionVectorsSpec extends SparkSpec {

  // ------------------------------------------------- test-side serializers

  private val z85Alphabet =
    "0123456789abcdefghijklmnopqrstuvwxyzABCDEFGHIJKLMNOPQRSTUVWXYZ.-:+=^!/*?&<>()[]{}@%$#"

  private def z85Encode(bytes: Array[Byte]): String = {
    val padded =
      if (bytes.length % 4 == 0) bytes
      else java.util.Arrays.copyOf(bytes, bytes.length + (4 - bytes.length % 4))
    val sb = new StringBuilder
    var i = 0
    while (i < padded.length) {
      var v = 0L
      for (j <- 0 until 4) v = (v << 8) | (padded(i + j) & 0xFFL)
      val digits = new Array[Char](5)
      for (j <- 4 to 0 by -1) { digits(j) = z85Alphabet((v % 85).toInt); v /= 85 }
      sb.appendAll(digits)
      i += 4
    }
    sb.toString
  }

  /** Collapse sorted values into [start, len] runs. */
  private def toRuns(lows: Seq[Int]): Vector[(Int, Int)] =
    lows.foldLeft(Vector.empty[(Int, Int)]) { (acc, v) =>
      acc.lastOption match {
        case Some((s, l)) if s + l + 1 == v => acc.init :+ (s, l + 1)
        case _ => acc :+ (v, 0)
      }
    }

  private def runCount(lows: Seq[Int]): Int = toRuns(lows).size

  /** Standard 32-bit roaring serialization. Array containers ≤ 4096
    * values, bitmap containers above; `asRuns` forces run encoding.
    */
  private def ser32(values: Seq[Int], asRuns: Boolean = false): Array[Byte] = {
    val byKey = values.map(v => (v >>> 16, v & 0xFFFF)).groupBy(_._1).toSeq.sortBy(_._1)
    val n = byKey.size
    val bb = ByteBuffer.allocate(1 << 20).order(ByteOrder.LITTLE_ENDIAN)
    if (asRuns) {
      bb.putInt(12347 | ((n - 1) << 16))
      val flags = new Array[Byte]((n + 7) / 8)
      byKey.indices.foreach(i => flags(i / 8) = (flags(i / 8) | (1 << (i % 8))).toByte)
      bb.put(flags)
    } else {
      bb.putInt(12346); bb.putInt(n)
    }
    byKey.foreach { case (k, vs) =>
      bb.putShort(k.toShort); bb.putShort((vs.size - 1).toShort)
    }
    if (!asRuns || n >= 4) {
      // offset headers: byte position of each container's data from the
      // start of the serialized bitmap
      var pos = bb.position() + 4 * n
      byKey.foreach { case (_, vs) =>
        bb.putInt(pos)
        pos +=
          (if (asRuns) 2 + 4 * runCount(vs.map(_._2).sorted)
           else if (vs.size <= 4096) 2 * vs.size
           else 8192)
      }
    }
    byKey.foreach { case (_, vs) =>
      val lows = vs.map(_._2).sorted
      if (asRuns) {
        val runs = toRuns(lows)
        bb.putShort(runs.size.toShort)
        runs.foreach { case (s, l) => bb.putShort(s.toShort); bb.putShort(l.toShort) }
      } else if (lows.size <= 4096) {
        lows.foreach(v => bb.putShort(v.toShort))
      } else {
        val words = new Array[Long](1024)
        lows.foreach(v => words(v >>> 6) |= (1L << (v & 63)))
        words.foreach(bb.putLong)
      }
    }
    java.util.Arrays.copyOf(bb.array(), bb.position())
  }

  /** RoaringBitmapArray portable: magic, 8-byte LE count (dense to the
    * last non-empty key), bitmaps in key order.
    */
  private def serArray(values: Seq[Long]): Array[Byte] = {
    val byHigh = values.groupBy(v => (v >>> 32).toInt)
    val nBitmaps = if (byHigh.isEmpty) 0 else byHigh.keys.max + 1
    val parts = (0 until nBitmaps).map(k =>
      ser32(byHigh.getOrElse(k, Nil).map(v => v.toInt)))
    val bb = ByteBuffer.allocate(12 + parts.map(_.length).sum).order(ByteOrder.LITTLE_ENDIAN)
    bb.putInt(1681511377).putLong(nBitmaps.toLong)
    parts.foreach(bb.put)
    bb.array()
  }

  /** The on-disk DV file layout: format version byte 1, then at `offset`
    * each DV as 4-byte big-endian length + data + 4-byte big-endian CRC32.
    */
  private def writeDvFile(path: java.nio.file.Path, data: Array[Byte]): Int = {
    val crc = new java.util.zip.CRC32
    crc.update(data)
    val bb = ByteBuffer.allocate(1 + 4 + data.length + 4) // big-endian default
    bb.put(1.toByte).putInt(data.length).put(data).putInt(crc.getValue.toInt)
    java.nio.file.Files.createDirectories(path.getParent)
    java.nio.file.Files.write(path, bb.array())
    1 // the blob's offset
  }

  // ------------------------------------------------------------ unit tests

  test("Z85 decodes the RFC 32 test vector") {
    val hello = DeletionVectors.z85Decode("HelloWorld")
    assert(hello.map(b => f"${b & 0xFF}%02X").mkString == "864FD26FB559F75B")
    // and the test-side encoder round-trips through the main-side decoder
    val bytes = Array.tabulate[Byte](16)(i => (i * 17).toByte)
    assert(DeletionVectors.z85Decode(z85Encode(bytes)).toSeq == bytes.toSeq)
  }

  test("roaring containers: array (with sign boundary), bitmap, run, multi-key") {
    def parse(bytes: Array[Byte]) =
      DeletionVectors.Roaring32.deserialize(
        ByteBuffer.wrap(bytes).order(ByteOrder.LITTLE_ENDIAN))

    // hand-computed layout for {0, 2}: cookie 12346, 1 container, key 0
    // card 1, offset 16, shorts 0 and 2 — pins the format independently
    assert(ser32(Seq(0, 2)).map(b => f"${b & 0xFF}%02x").mkString ==
      "3a30000001000000000001001000000000000200")

    val arr = parse(ser32(Seq(1, 40000, 65535)))
    assert(arr.contains(1) && arr.contains(40000) && arr.contains(65535))
    assert(!arr.contains(0) && !arr.contains(39999) && !arr.contains(2))
    assert(arr.cardinality == 3)

    val big = parse(ser32(0 until 5000))
    assert(big.contains(0) && big.contains(4999) && !big.contains(5000))
    assert(big.cardinality == 5000)

    val runs = parse(ser32(Seq.range(10, 21) ++ Seq.range(100, 201) ++ Seq(40000), asRuns = true))
    assert(runs.contains(10) && runs.contains(20) && runs.contains(150) &&
      runs.contains(200) && runs.contains(40000))
    assert(!runs.contains(9) && !runs.contains(21) && !runs.contains(99) && !runs.contains(201))

    val multiKey = parse(ser32(Seq(5, 65536 + 7, 3 * 65536 + 9)))
    assert(multiKey.contains(5) && multiKey.contains(65536 + 7) && multiKey.contains(3 * 65536 + 9))
    assert(!multiKey.contains(65536 + 5) && !multiKey.contains(2 * 65536))
  }

  test("bitmap array: 64-bit keys, dense layout with empty middle bitmaps") {
    val values = Seq(5L, (1L << 32) + 7L, (3L << 32) + 1L) // key 2 is empty
    val bb = ByteBuffer.wrap(serArray(values)).order(ByteOrder.LITTLE_ENDIAN)
    assert(bb.getInt == 1681511377)
    val arr = DeletionVectors.RoaringArray.deserialize(bb)
    assert(values.forall(arr.contains))
    assert(!arr.contains(7L) && !arr.contains((2L << 32) + 5L) && !arr.contains((4L << 32)))
    assert(arr.cardinality == 3)
  }

  // ------------------------------------------------- end-to-end table read

  private implicit class IterOps[A](it: java.util.Iterator[A]) {
    def asScala: Iterator[A] = scala.jdk.CollectionConverters.IteratorHasAsScala(it).asScala
  }

  private val schemaJson =
    """{"type":"struct","fields":[
      |{"name":"id","type":"long","nullable":true,"metadata":{}},
      |{"name":"v","type":"string","nullable":true,"metadata":{}},
      |{"name":"part","type":"string","nullable":true,"metadata":{}}]}"""
      .stripMargin.replace("\n", "")

  private def metaLine: String =
    s"""{"metaData":{"id":"fixture-dv","schemaString":${com.fasterxml.jackson.databind.json.JsonMapper.builder().build().writeValueAsString(schemaJson)},"partitionColumns":["part"],"format":{"provider":"parquet"}}}"""

  private def commit(table: java.nio.file.Path, version: Long, lines: Seq[String]): Unit = {
    val log = table.resolve("_delta_log")
    java.nio.file.Files.createDirectories(log)
    java.nio.file.Files.writeString(log.resolve(f"$version%020d.json"),
      lines.mkString("", "\n", "\n"))
  }

  /** One single-part parquet of (id, v) rows in id order. */
  private def dataFile(table: java.nio.file.Path, rel: String, rows: Seq[(Long, String)]): Unit = {
    import spark.implicits._
    val tmp = table.resolve("_tmp_write")
    rows.toDF("id", "v").coalesce(1)
      .sortWithinPartitions("id").write.mode("overwrite").parquet(tmp.toString)
    val part = java.nio.file.Files.list(tmp).iterator().asScala
      .find(_.getFileName.toString.endsWith(".parquet")).get
    val dest = table.resolve(rel)
    java.nio.file.Files.createDirectories(dest.getParent)
    java.nio.file.Files.move(part, dest)
    org.apache.commons.io.FileUtils.deleteDirectory(tmp.toFile)
  }

  test("a Delta table with inline and file-stored DVs reads only live rows") {
    val table = tmpDir("delta-dv-read")
    dataFile(table, "part=a/f1.parquet", (0L until 10L).map(i => (i, s"a$i")))
    dataFile(table, "part=b/f2.parquet", (100L until 110L).map(i => (i, s"b$i")))
    dataFile(table, "part=b/f3.parquet", (200L until 205L).map(i => (i, s"c$i")))

    // f1: inline DV deleting row indexes 1, 3, 5 (ids 1, 3, 5)
    val inlineData = serArray(Seq(1L, 3L, 5L))
    val inline = s"""{"storageType":"i","pathOrInlineDv":"${z85Encode(inlineData)}","sizeInBytes":${inlineData.length},"cardinality":3}"""

    // f2: UUID-named DV file (with a random prefix dir) deleting indexes 0, 9
    val uuid = java.util.UUID.randomUUID()
    val uuidBytes = ByteBuffer.allocate(16)
      .putLong(uuid.getMostSignificantBits).putLong(uuid.getLeastSignificantBits).array()
    val fileData = serArray(Seq(0L, 9L))
    val offset = writeDvFile(
      table.resolve("xy").resolve(s"deletion_vector_$uuid.bin"), fileData)
    val stored = s"""{"storageType":"u","pathOrInlineDv":"xy${z85Encode(uuidBytes)}","offset":$offset,"sizeInBytes":${fileData.length},"cardinality":2}"""

    commit(table, 0L, Seq(
      """{"protocol":{"minReaderVersion":3,"minWriterVersion":7,"readerFeatures":["deletionVectors"],"writerFeatures":["deletionVectors"]}}""",
      metaLine,
      s"""{"add":{"path":"part=a/f1.parquet","partitionValues":{"part":"a"},"size":1,"modificationTime":1,"dataChange":true,"deletionVector":$inline}}""",
      s"""{"add":{"path":"part=b/f2.parquet","partitionValues":{"part":"b"},"size":1,"modificationTime":1,"dataChange":true,"deletionVector":$stored}}""",
      s"""{"add":{"path":"part=b/f3.parquet","partitionValues":{"part":"b"},"size":1,"modificationTime":1,"dataChange":true}}"""))

    val df = DeltaLog.read(spark, table.toString)
    assert(df.count() == 7 + 8 + 5)
    val ids = df.orderBy("id").select("id").collect().map(_.getLong(0)).toSeq
    assert(ids == Seq(0L, 2L, 4L, 6L, 7L, 8L, 9L) ++
      (101L until 109L) ++ (200L until 205L))
    // partition injection still applies to DV'd scans
    assert(df.filter(col("part") === "a").count() == 7)
    // and row-level values survive (the filter dropped whole rows, not cells)
    assert(df.filter(col("id") === 2L).select("v").collect().head.getString(0) == "a2")
  }

  test("corrupted DV checksum and wrong cardinality refuse loudly") {
    val table = tmpDir("delta-dv-bad")
    dataFile(table, "part=a/f1.parquet", (0L until 4L).map(i => (i, s"x$i")))
    val data = serArray(Seq(1L))
    val uuid = java.util.UUID.randomUUID()
    val uuidBytes = ByteBuffer.allocate(16)
      .putLong(uuid.getMostSignificantBits).putLong(uuid.getLeastSignificantBits).array()
    val dvPath = table.resolve(s"deletion_vector_$uuid.bin")
    val offset = writeDvFile(dvPath, data)
    // flip a payload byte: the CRC must catch it
    val raw = java.nio.file.Files.readAllBytes(dvPath)
    raw(6) = (raw(6) ^ 0x40).toByte
    java.nio.file.Files.write(dvPath, raw)
    commit(table, 0L, Seq(
      """{"protocol":{"minReaderVersion":3,"minWriterVersion":7,"readerFeatures":["deletionVectors"],"writerFeatures":["deletionVectors"]}}""",
      metaLine,
      s"""{"add":{"path":"part=a/f1.parquet","partitionValues":{"part":"a"},"size":1,"modificationTime":1,"dataChange":true,"deletionVector":{"storageType":"u","pathOrInlineDv":"${z85Encode(uuidBytes)}","offset":$offset,"sizeInBytes":${data.length},"cardinality":1}}}"""))
    val e = intercept[Exception](DeltaLog.read(spark, table.toString).count())
    assert(e.getMessage.contains("checksum"), e.getMessage)

    // wrong declared cardinality on an inline DV also refuses
    val table2 = tmpDir("delta-dv-card")
    dataFile(table2, "part=a/f1.parquet", (0L until 4L).map(i => (i, s"x$i")))
    val d2 = serArray(Seq(1L, 2L))
    commit(table2, 0L, Seq(
      """{"protocol":{"minReaderVersion":3,"minWriterVersion":7,"readerFeatures":["deletionVectors"],"writerFeatures":["deletionVectors"]}}""",
      metaLine,
      s"""{"add":{"path":"part=a/f1.parquet","partitionValues":{"part":"a"},"size":1,"modificationTime":1,"dataChange":true,"deletionVector":{"storageType":"i","pathOrInlineDv":"${z85Encode(d2)}","sizeInBytes":${d2.length},"cardinality":7}}}"""))
    val e2 = intercept[Exception](DeltaLog.read(spark, table2.toString).count())
    assert(e2.getMessage.contains("cardinality"), e2.getMessage)
  }

  test("writes to DV-featured tables go through (r8: this writer maintains DVs)") {
    import spark.implicits._
    val table = tmpDir("delta-dv-write")
    dataFile(table, "part=a/f1.parquet", (0L until 4L).map(i => (i, s"x$i")))
    commit(table, 0L, Seq(
      """{"protocol":{"minReaderVersion":3,"minWriterVersion":7,"readerFeatures":["deletionVectors"],"writerFeatures":["deletionVectors"]}}""",
      metaLine,
      """{"add":{"path":"part=a/f1.parquet","partitionValues":{"part":"a"},"size":1,"modificationTime":1,"dataChange":true}}"""))
    graft.destinations.DeltaWrite.append(
      spark, table.toString, Seq((9L, "nine", "a")).toDF("id", "v", "part"))
    val back = DeltaLog.read(spark, table.toString).collect().map(_.getLong(0)).toSet
    assert(back == Set(0L, 1L, 2L, 3L, 9L))
    // and delete() against the foreign-featured table works end-to-end
    // (copy-on-write here — the table carries the feature but not the
    // enableDeletionVectors opt-in that switches deletes to merge-on-read)
    graft.destinations.DeltaWrite.delete(spark, table.toString, "id <= 1")
    val after = DeltaLog.read(spark, table.toString).collect().map(_.getLong(0)).toSet
    assert(after == Set(2L, 3L, 9L))
  }
}
