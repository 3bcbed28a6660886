package graft.multimodal

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types._

/** Multimodal column plumbing: images/audio/video ride through the
  * engine as opaque `binary` columns with a typed metadata struct.
  *
  * The Spark-side contract — schema, partition sizing, batch shape,
  * deterministic ids — is real and tested. The actual media DECODE step
  * is a STUB (this container has no image/audio codecs):
  * [[decodeFeaturesStub]] derives a deterministic fake feature vector
  * from the bytes via md5, with the same signature/shape a real
  * decoder (mapPartitions over a native codec, or a vectorized Python
  * worker in PySpark) would produce. Swap the stub for the codec call;
  * nothing else changes.
  *
  * Scale notes: media blobs make wide rows — keep
  * `spark.sql.files.maxPartitionBytes` small enough that a partition of
  * blobs fits executor memory, and never collect the bytes column.
  * Feature extraction is per-row (no shuffle); only the downstream
  * dedup/similarity steps shuffle, and those operate on the compact
  * features, never the blobs.
  */
object Multimodal {

  /** Canonical media row schema. */
  val mediaSchema: StructType = StructType(Seq(
    StructField("media_id", LongType, nullable = false),
    StructField("kind", StringType, nullable = false), // image|audio|video
    StructField("bytes", BinaryType, nullable = true),
    StructField("meta", StructType(Seq(
      StructField("width", IntegerType, nullable = true),
      StructField("height", IntegerType, nullable = true),
      StructField("channels", IntegerType, nullable = true),
      StructField("sample_rate", IntegerType, nullable = true),
      StructField("duration_ms", LongType, nullable = true))), nullable = true)))

  /** Demo/test helper: lift a text table into the media schema (UTF-8
    * bytes, synthetic metadata).
    */
  def fromText(df: DataFrame, idCol: String, textCol: String, kind: String = "image"): DataFrame =
    df.select(
      col(idCol).cast(LongType).as("media_id"),
      lit(kind).as("kind"),
      encode(col(textCol), "UTF-8").as("bytes"),
      struct(
        octet_length(col(textCol)).as("width"),
        lit(1).as("height"),
        lit(3).as("channels"),
        lit(null).cast(IntegerType).as("sample_rate"),
        octet_length(col(textCol)).cast(LongType).as("duration_ms")).as("meta"))

  /** Cheap byte-level stats — the non-stub part any pipeline wants
    * before decode (size filters, magic-byte checks, chunk hashes).
    */
  def byteStats(df: DataFrame, bytesCol: String = "bytes"): DataFrame =
    df.withColumn("n_bytes", octet_length(col(bytesCol)).cast(LongType))
      .withColumn("chunk_fp", md5(col(bytesCol)))

  /** STUB decode: deterministic fake `dim`-dimensional feature vector
    * in [0, 1), derived from md5(bytes, index). A real implementation
    * decodes the media and runs a feature extractor; signature and
    * output shape are identical.
    */
  def decodeFeaturesStub(bytesCol: Column, dim: Int): Column =
    transform(sequence(lit(1), lit(dim)), i =>
      conv(substring(md5(concat(bytesCol, i.cast(StringType).cast(BinaryType))), 1, 8), 16, 10)
        .cast(LongType).cast(DoubleType) / lit(4294967296.0))

  /** Frame-sampling plumbing for video rows: one output row per sampled
    * frame offset (every `everyMs` within `meta.duration_ms`). The
    * per-frame decode would plug into the exploded rows.
    */
  def frameSample(df: DataFrame, everyMs: Long): DataFrame =
    df.withColumn("frame_ms",
        explode(sequence(lit(0L), coalesce(col("meta.duration_ms"), lit(0L)),
          lit(everyMs))))

  /** Full stub pipeline: media rows -> per-row feature vectors. */
  def featurize(df: DataFrame, dim: Int = 16): DataFrame =
    byteStats(df)
      .withColumn("features", decodeFeaturesStub(col("bytes"), dim))
      .drop("bytes")
}
