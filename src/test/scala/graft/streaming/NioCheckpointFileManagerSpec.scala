package graft.streaming

import graft.SparkSpec
import org.apache.hadoop.conf.Configuration
import org.apache.hadoop.fs.{FileAlreadyExistsException, Path, PathFilter}
import java.nio.file.Files

/** The NIO checkpoint manager must carry the exact CheckpointFileManager
  * contract the streaming WAL relies on: atomic visibility on close, the
  * no-overwrite commit-race signal, cancel cleanliness, and list/open
  * round-trips — plus end-to-end equality of a streaming query's output
  * under this manager vs Spark's default.
  */
class NioCheckpointFileManagerSpec extends SparkSpec {

  private def mgr(root: java.nio.file.Path) =
    new NioCheckpointFileManager(new Path(root.toString), new Configuration(false))

  test("createAtomic: invisible until close, byte-exact after, temp gone") {
    val root = tmpDir("nio-cfm")
    val m = mgr(root)
    val dst = new Path(root.toString, "offsets/0")
    val out = m.createAtomic(dst, overwriteIfPossible = false)
    out.write("v1\n{\"batchWatermarkMs\":0}".getBytes("UTF-8"))
    assert(!m.exists(dst), "destination must not exist before close")
    out.close()
    assert(m.exists(dst))
    val in = m.open(dst)
    val buf = new Array[Byte](64)
    val n = in.read(buf); in.close()
    assert(new String(buf, 0, n, "UTF-8") === "v1\n{\"batchWatermarkMs\":0}")
    // no temp litter in the directory
    val names = m.list(new Path(root.toString, "offsets")).map(_.getPath.getName)
    assert(names.toSeq === Seq("0"))
  }

  test("no-overwrite close throws FileAlreadyExists; overwrite close wins") {
    val root = tmpDir("nio-cfm")
    val m = mgr(root)
    val dst = new Path(root.toString, "commits/7")
    val a = m.createAtomic(dst, overwriteIfPossible = false)
    a.write("first".getBytes); a.close()
    val b = m.createAtomic(dst, overwriteIfPossible = false)
    b.write("second".getBytes)
    intercept[FileAlreadyExistsException](b.close())
    // loser's temp cleaned up; winner's content intact
    assert(m.list(new Path(root.toString, "commits")).length === 1)
    val in = m.open(dst); val buf = new Array[Byte](16)
    val n = in.read(buf); in.close()
    assert(new String(buf, 0, n) === "first")
    val c = m.createAtomic(dst, overwriteIfPossible = true)
    c.write("third".getBytes); c.close()
    val in2 = m.open(dst); val n2 = in2.read(buf); in2.close()
    assert(new String(buf, 0, n2) === "third")
  }

  test("cancel deletes the temp and never publishes") {
    val root = tmpDir("nio-cfm")
    val m = mgr(root)
    m.mkdirs(new Path(root.toString, "state"))
    val dst = new Path(root.toString, "state/1.delta")
    val out = m.createAtomic(dst, overwriteIfPossible = true)
    out.write("partial".getBytes)
    out.cancel()
    assert(!m.exists(dst))
    assert(m.list(new Path(root.toString, "state")).isEmpty)
  }

  test("list filters, positioned reads, recursive delete") {
    val root = tmpDir("nio-cfm")
    val m = mgr(root)
    Seq("0", "1", ".1.tmp").foreach { n =>
      val o = m.createAtomic(new Path(root.toString, s"log/$n"), true)
      o.write(("payload-" + n).getBytes); o.close()
    }
    val visible = m.list(new Path(root.toString, "log"),
      new PathFilter { def accept(p: Path): Boolean = !p.getName.startsWith(".") })
    assert(visible.map(_.getPath.getName).sorted.toSeq === Seq("0", "1"))
    assert(visible.forall(_.getLen === 9))
    val in = m.open(new Path(root.toString, "log/1"))
    val b = new Array[Byte](1)
    in.readFully(8L, b) // positioned read: last byte without seeking
    assert(b(0).toChar === '1')
    in.seek(0); assert(in.getPos === 0)
    in.close()
    m.delete(new Path(root.toString, "log"))
    assert(!m.exists(new Path(root.toString, "log")))
    m.delete(new Path(root.toString, "log")) // idempotent on missing
  }

  test("streaming aggregation under the NIO manager equals the default manager") {
    import org.apache.spark.sql.functions._
    val src = tmpDir("nio-src")
    spark.range(0, 100).selectExpr("id % 7 AS k", "id AS v")
      .repartition(1).write.mode("overwrite").parquet(src.toString)
    def run(useNio: Boolean): Seq[(Long, Long)] = {
      val key = "spark.sql.streaming.checkpointFileManagerClass"
      val prev = spark.conf.getOption(key)
      if (useNio) spark.conf.set(key, classOf[NioCheckpointFileManager].getName)
      else spark.conf.unset(key)
      try {
        val ck = tmpDir(s"nio-ck-$useNio")
        val stream = spark.readStream
          .schema("k LONG, v LONG").parquet(src.toString)
          .groupBy(col("k")).agg(sum(col("v")).as("s"))
        val name = s"nio_cfm_sink_${useNio}_${System.nanoTime()}"
        val q = stream.writeStream.format("memory").queryName(name)
          .outputMode("complete")
          .option("checkpointLocation", ck.toString)
          .start()
        q.processAllAvailable(); q.stop()
        // under the NIO manager the checkpoint must actually carry state
        if (useNio)
          assert(Files.exists(ck.resolve("offsets/0")), "NIO WAL not written")
        spark.table(name).collect()
          .map(r => (r.getLong(0), r.getLong(1))).toSeq.sorted
      } finally prev.fold(spark.conf.unset(key))(spark.conf.set(key, _))
    }
    assert(run(useNio = true) === run(useNio = false))
  }
}
