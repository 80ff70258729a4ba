package graft.llm

import org.apache.spark.sql.{DataFrame, Dataset, Row}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types._

/** Multimodal column plumbing: image/audio/video payloads ride as
  * opaque `binary` columns with typed metadata; decode / feature
  * extraction runs batched per partition.
  *
  * The actual media decode is STUBBED (no image/audio libraries in
  * this environment): [[FakeDecoder.decode]] derives deterministic
  * "features" from the raw bytes, standing where a JNI/FFI decoder
  * would plug in. Everything around it — the schema contract, the
  * mapPartitions batch shape, partition sizing, and the columnar
  * metadata path — is real and tested.
  */
object Multimodal {

  /** Output schema of the decode stage: the contract a real decoder
    * must satisfy. */
  val DecodedSchema: StructType = StructType(Seq(
    StructField("media_id", LongType, nullable = false),
    StructField("n_bytes", LongType, nullable = false),
    StructField("width", LongType, nullable = false),
    StructField("height", LongType, nullable = false),
    StructField("checksum", StringType, nullable = false)
  ))

  /** STUB decoder: a real implementation would parse the codec
    * headers; this derives width/height deterministically from the
    * byte stream so tests and oracles can verify the plumbing. */
  object FakeDecoder {
    def decode(id: Long, bytes: Array[Byte]): Row = {
      val n = bytes.length.toLong
      val first = if (bytes.nonEmpty) java.lang.Byte.toUnsignedLong(bytes(0)) else 0L
      val md = java.security.MessageDigest.getInstance("MD5")
      val checksum = md.digest(bytes).map("%02x".format(_)).mkString
      Row(id, n, 16L + n % 16L, 16L + first % 16L, checksum)
    }
  }

  /** Attach a binary payload column (here synthesized from text —
    * stands in for reading image bytes from object storage). */
  def attachPayload(df: DataFrame, idCol: String, textCol: String): DataFrame =
    df.select(col(idCol).cast("long").as("media_id"),
      encode(col(textCol), "UTF-8").as("payload"))

  /** Batched per-partition decode — the mapPartitions shape a vectorized
    * (Arrow/pandas-UDF-style) decoder uses: one decoder instance per
    * partition, rows streamed through it, no per-row setup cost. */
  def decodeBatched(withPayload: DataFrame): DataFrame = {
    val spark = withPayload.sparkSession
    val rdd = withPayload.select("media_id", "payload").rdd.mapPartitions { it =>
      it.map(r => FakeDecoder.decode(r.getLong(0), r.getAs[Array[Byte]](1)))
    }
    spark.createDataFrame(rdd, DecodedSchema)
  }

  /** The same features as pure Column expressions — the codegen path
    * used when the "decode" is cheap metadata math (and the form the
    * DuckDB oracle replays). */
  def decodeExprs(withPayload: DataFrame): DataFrame =
    withPayload.select(
      col("media_id"),
      length(col("payload")).cast("long").as("n_bytes"),
      (lit(16L) + length(col("payload")).cast("long") % 16L).as("width"),
      (lit(16L) + ascii(col("payload").cast("string")) % 16L).as("height"),
      md5(col("payload")).as("checksum"))

  /** Frame-sampling shape: given per-media frame counts, emit one row
    * per sampled frame index (every `stride`-th frame) — the explode
    * pattern a video pipeline uses, kept fully columnar. */
  def sampleFrames(decoded: Dataset[Row], stride: Int): DataFrame =
    decoded
      .withColumn("n_frames", (col("n_bytes") % 64L) + 1L)
      .withColumn("frame_idx",
        explode(sequence(lit(0L), col("n_frames") - 1L, lit(stride.toLong))))
      .select("media_id", "n_frames", "frame_idx")

  /** Resize planning: fit-within (targetW, targetH) preserving aspect
    * ratio. The DIMENSION math is the real operator (it decides batch
    * shapes and memory downstream); the pixel resample itself is the
    * stubbed decoder's job. Pure integer arithmetic — `tw·h ≤ th·w`
    * picks the binding axis and the other dimension scales by an exact
    * integer floor-division, so any engine replays it bit-for-bit
    * (double-based scale factors differ in the last ulp). */
  def planResize(decoded: Dataset[Row], targetW: Long, targetH: Long): DataFrame =
    decoded
      .withColumn("dst_w",
        when(col("width") * targetH <= col("height") * targetW,
          expr(s"(width * $targetH) DIV height"))
          .otherwise(targetW))
      .withColumn("dst_h",
        when(col("width") * targetH <= col("height") * targetW, targetH)
          .otherwise(expr(s"(height * $targetW) DIV width")))
      .select(col("media_id"), col("width").as("src_w"), col("height").as("src_h"),
        col("dst_w"), col("dst_h"))

  /** Feature extraction stub: an 8-component vector derived from the
    * payload digest (each component `(ascii(hex_j) % 16) / 8 − 1`, the
    * same engine-replayable construction the inference stub uses) plus
    * its L1 norm — exact binary fractions, so sums compare
    * bit-for-bit. A real extractor (CLIP embedding, mel filterbank)
    * swaps in behind the same schema. */
  def extractFeatures(withPayload: DataFrame, dim: Int = 8): DataFrame = {
    require(dim >= 1 && dim <= 32, "md5 supplies 32 hex digits")
    val digest = md5(col("payload"))
    val vec = transform(sequence(lit(1), lit(dim)),
      j => (ascii(digest.substr(j, lit(1))) % 16).cast("double") / 8.0 - 1.0)
    withPayload.select(col("media_id"), vec.as("features"))
      .select(col("media_id"),
        org.apache.spark.sql.functions.size(col("features")).cast("long").as("n_dim"),
        element_at(col("features"), 1).as("f0"),
        aggregate(col("features"), lit(0.0), (a, x) => a + abs(x)).as("l1_norm"))
  }
}
