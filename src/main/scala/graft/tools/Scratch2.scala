package graft.tools

import graft._
import graft.ops.Dedup
import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._
import org.apache.spark.storage.StorageLevel

/** Ad-hoc A/B of simhash pair-mining physical shapes. */
object Scratch2 {

  def variantB(docs: DataFrame, maxDistance: Int, cap: Int): DataFrame = {
    val chunks = maxDistance + 1
    val bitsPer = 64 / chunks
    val hashed = Dedup.simhash(docs, "doc_id", "text", portableHash = true)
      .persist(StorageLevel.MEMORY_AND_DISK)
    val keyed0 = hashed.select(col("doc_id"), col("simhash"),
      explode(array((0 until chunks).map { c =>
        struct(lit(c).as("chunk"),
          shiftright(col("simhash"), c * bitsPer)
            .bitwiseAND((1L << bitsPer) - 1).as("bits"))
      }: _*)).as("key"))
    val hot = keyed0.groupBy("key").agg(count(lit(1)).as("bs"))
      .filter(col("bs") > cap).select("key")
    val keyed = keyed0.join(broadcast(hot), Seq("key"), "left_anti")
    val a = keyed.select(col("key"), col("doc_id").as("id_a"), col("simhash").as("sh_a"))
    val b = keyed.select(col("key"), col("doc_id").as("id_b"), col("simhash").as("sh_b"))
    a.join(b, Seq("key"))
      .filter(col("id_a") < col("id_b"))
      .withColumn("distance", bit_count(col("sh_a").bitwiseXOR(col("sh_b"))))
      .filter(col("distance") <= maxDistance)
      .dropDuplicates("id_a", "id_b")
      .select("id_a", "id_b", "distance")
  }

  def variantC(docs: DataFrame, maxDistance: Int, cap: Int): DataFrame = {
    // window-based bucket size: one shuffle keys both the cap and the join
    import org.apache.spark.sql.expressions.Window
    val chunks = maxDistance + 1
    val bitsPer = 64 / chunks
    val hashed = Dedup.simhash(docs, "doc_id", "text", portableHash = true)
    val keyed0 = hashed.select(col("doc_id"), col("simhash"),
      explode(array((0 until chunks).map { c =>
        struct(lit(c).as("chunk"),
          shiftright(col("simhash"), c * bitsPer)
            .bitwiseAND((1L << bitsPer) - 1).as("bits"))
      }: _*)).as("key"))
    val keyed = keyed0
      .withColumn("bs", count(lit(1)).over(Window.partitionBy("key")))
      .filter(col("bs") <= cap)
      .drop("bs")
      .persist(StorageLevel.MEMORY_AND_DISK)
    val a = keyed.select(col("key"), col("doc_id").as("id_a"), col("simhash").as("sh_a"))
    val b = keyed.select(col("key"), col("doc_id").as("id_b"), col("simhash").as("sh_b"))
    a.join(b, Seq("key"))
      .filter(col("id_a") < col("id_b"))
      .withColumn("distance", bit_count(col("sh_a").bitwiseXOR(col("sh_b"))))
      .filter(col("distance") <= maxDistance)
      .dropDuplicates("id_a", "id_b")
      .select("id_a", "id_b", "distance")
  }

  def main(args: Array[String]): Unit = {
    val sfDir = sys.env.getOrElse("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    val spark = Sessions.local()
    val docs = spark.read.parquet(s"$sfDir/documents.parquet")
    def time[A](label: String)(f: => A): A = {
      val t0 = System.nanoTime(); val r = f
      println(f"PHASE $label ${(System.nanoTime() - t0) / 1e9}%.3f s"); r
    }
    def run(label: String, f: => DataFrame): Unit = {
      f.count(); spark.catalog.clearCache() // warm
      (1 to 3).foreach { i => time(s"$label-$i")(f.count()); spark.catalog.clearCache() }
    }
    run("A-current", Dedup.simhashPairs(docs, "doc_id", "text", maxDistance = 3, portableHash = true))
    run("B-filter-first", variantB(docs, 3, 10000))
    run("C-window-cap", variantC(docs, 3, 10000))
    spark.stop()
  }
}
