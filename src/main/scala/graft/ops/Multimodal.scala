package graft.ops

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types._

/** Multimodal column plumbing: image/audio/video as opaque `binary` payloads
  * with typed metadata.
  *
  * The Spark-side contract is the real deliverable here — schema, batch
  * shape, partition-friendly operations — while the codec itself is a
  * clearly-marked STUB (no image/audio libraries ship in this container).
  * Swapping [[stubDecodeFeatures]] for a real decoder (JNI/ONNX on
  * executors, or `mapInPandas`+PIL on a PySpark session) changes one
  * function and nothing else.
  *
  * Scale notes: payloads never move to the driver; chunking/sampling are
  * byte-slice expressions (codegen); per-row decode would run inside
  * `mapPartitions`, amortizing codec init per partition — the standard shape
  * for 100 TB media tables.
  */
object Multimodal {

  /** Typed metadata carried next to every payload. */
  val metadataSchema: StructType = StructType(Seq(
    StructField("format", StringType),
    StructField("width", IntegerType),
    StructField("height", IntegerType),
    StructField("duration_ms", LongType)))

  /** Wrap a binary column + format into the canonical payload struct. */
  def asset(data: Column, format: Column, width: Column, height: Column, durationMs: Column): Column =
    struct(
      data.as("data"),
      struct(format.as("format"), width.cast("int").as("width"),
        height.cast("int").as("height"), durationMs.cast("long").as("duration_ms")).as("meta"))

  /** Fixed-size byte frames sampled every `stride` bytes — the binary
    * analogue of video frame-sampling; pure expression (substr on binary).
    */
  def frameSample(data: Column, frameSize: Int, stride: Int): Column = {
    // integer floor-division so the frame count is exact (`/` alone is fp;
    // subtracting the remainder first makes the division exact)
    val span = greatest(length(data) - frameSize, lit(0))
    val lastIdx = ((span - pmod(span, lit(stride))) / stride).cast("int")
    transform(
      sequence(lit(0), lastIdx),
      i => substring(data, (i * stride + 1).cast("int"), lit(frameSize)))
  }

  def frameCount(data: Column, frameSize: Int, stride: Int): Column =
    size(frameSample(data, frameSize, stride))

  /** STUB decoder ??? — deterministic fake features standing in for a real
    * codec: byte length, a content hash, and a pseudo-"brightness" (mean of
    * a sampled byte prefix). The schema and distribution contract match what
    * a real `decode → feature-extract` would produce; only the math is fake.
    */
  def stubDecodeFeatures(data: Column): Column = {
    val prefix = substring(data, 1, 64)
    val bytes = transform(sequence(lit(1), least(length(prefix), lit(64))),
      i => ascii(substring(base64(substring(prefix, i.cast("int"), lit(1))), 1, 1)))
    struct(
      length(data).as("n_bytes"),
      md5(data).as("content_hash"),
      round(aggregate(bytes, lit(0L), (acc, b) => acc + b).cast("double") /
        greatest(least(length(prefix), lit(64)), lit(1)), 4).as("brightness_stub"))
  }

  /** "Resize" stub: re-chunk the payload to a target byte budget by uniform
    * sampling — keeps the plumbing (new payload struct, updated metadata)
    * honest while the pixel math is stubbed.
    */
  def resizeStub(payload: Column, targetBytes: Int): Column = {
    val data = payload.getField("data")
    val meta = payload.getField("meta")
    val sampled = substring(data, 1, targetBytes)
    struct(sampled.as("data"),
      struct(meta.getField("format").as("format"),
        (meta.getField("width") / 2).cast("int").as("width"),
        (meta.getField("height") / 2).cast("int").as("height"),
        meta.getField("duration_ms").as("duration_ms")).as("meta"))
  }

  /** End-to-end demo pipeline over a text table: fabricate binary payloads
    * (deterministic: utf8 bytes), then run the real plumbing — frame
    * sampling, stub feature extraction — entirely as expressions.
    */
  def featurize(docs: DataFrame, idCol: String, textCol: String): DataFrame = {
    val payload = asset(
      encode(col(textCol), "UTF-8"), lit("text/utf-8"),
      lit(0), lit(0), lit(0L))
    docs.select(col(idCol).as("doc_id"), payload.as("asset"))
      .select(
        col("doc_id"),
        col("asset.meta.format").as("format"),
        length(col("asset.data")).as("n_bytes"),
        frameCount(col("asset.data"), 256, 128).as("n_frames"),
        stubDecodeFeatures(col("asset.data")).as("features"))
  }
}
