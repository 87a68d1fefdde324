package graft.destinations

import org.apache.spark.sql.types._

/** Delta type widening (public PROTOCOL.md, reader+writer feature
  * `typeWidening`): a mergeSchema append whose incoming column is strictly
  * WIDER than the table's re-types the COLUMN instead of down-casting the
  * data — no file rewrite; old files keep their narrow parquet type and
  * scans up-cast, which is exactly what a 100 TB table needs when a
  * counter outgrows INT (the alternative is rewriting every byte). Each
  * change is recorded in the field's `delta.typeChanges` metadata
  * (fromType/toType — the STABLE feature's entry shape; `tableVersion`
  * belongs to the `typeWidening-preview` format and is deliberately NOT
  * written, so strict foreign readers of the stable feature never see an
  * unexpected field).
  *
  * The promotion matrix here is the subset of the protocol's matrix that
  * Spark 4's parquet readers (vectorized and parquet-mr) up-cast natively
  * — integer chain, float→double, integer→double (verified empirically in
  * TypeWideningSpec). date→timestamp-ntz and the →decimal promotions are
  * NOT offered: this engine's scan path cannot up-cast those per-file, and
  * silently refusing beats corrupting.
  */
object TypeWidening {

  /** Is `from → to` an allowed widening (strictly wider, lossless)? */
  def allowed(from: DataType, to: DataType): Boolean = (from, to) match {
    case (ByteType, ShortType | IntegerType | LongType | DoubleType) => true
    case (ShortType, IntegerType | LongType | DoubleType) => true
    case (IntegerType, LongType | DoubleType) => true
    case (FloatType, DoubleType) => true
    case _ => false
  }

  /** Delta schema-string primitive name (PROTOCOL.md Primitive Types). */
  def deltaTypeName(dt: DataType): String = dt match {
    case ByteType => "byte"
    case ShortType => "short"
    case IntegerType => "integer"
    case LongType => "long"
    case FloatType => "float"
    case DoubleType => "double"
    case other => other.typeName
  }

  /** The field re-typed to `to`, with the change appended to its
    * `delta.typeChanges` history (the stable feature's fromType/toType
    * entries, ordered — so the promotion chain stays reconstructable).
    */
  def widenField(f: StructField, to: DataType): StructField = {
    val entry = new MetadataBuilder()
      .putString("fromType", deltaTypeName(f.dataType))
      .putString("toType", deltaTypeName(to))
      .build()
    val prior =
      if (f.metadata.contains("delta.typeChanges"))
        f.metadata.getMetadataArray("delta.typeChanges")
      else Array.empty[Metadata]
    val meta = new MetadataBuilder()
      .withMetadata(f.metadata)
      .putMetadataArray("delta.typeChanges", prior :+ entry)
      .build()
    StructField(f.name, to, nullable = f.nullable, metadata = meta)
  }
}
