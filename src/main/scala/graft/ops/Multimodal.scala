package graft.ops

import org.apache.spark.sql.{DataFrame, Row, SparkSession}
import org.apache.spark.sql.catalyst.encoders.ExpressionEncoder
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types._

/** Multimodal-column plumbing: opaque `binary` payloads + typed metadata,
  * with decode / feature-extraction as partition-local batch transforms.
  *
  * The image/audio codecs are NOT in this environment, so the decode step
  * is a clearly-marked deterministic STUB (`stubFeaturize`) — but the
  * Spark-side plumbing is real and what matters at scale:
  *  - payloads travel as `BinaryType` columns (columnar, no row-object
  *    blowup), metadata as plain typed columns next to them;
  *  - feature extraction runs via `mapPartitions` so a real codec would
  *    amortize model/library init once per partition (the Scala analogue
  *    of pandas-batched UDFs);
  *  - output schema is fixed (`featSchema`) so downstream similarity /
  *    dedup operators (Similarity.scala) consume it directly.
  */
object Multimodal {

  /** Metadata for a binary payload: length + content hash (dedup key). */
  def withMetadata(df: DataFrame, binCol: String): DataFrame =
    df.withColumn("byte_len", length(col(binCol)).cast(LongType))
      .withColumn("content_sha", sha2(col(binCol), 256))

  /** Output schema of the featurizer: id, byte_len, first/last byte and a
    * fixed-width feature vector. */
  def featSchema: StructType = StructType(Seq(
    StructField("id", LongType),
    StructField("byte_len", LongType),
    StructField("first_byte", IntegerType),
    StructField("feature", ArrayType(FloatType))))

  /** STUB decoder/featurizer: a real implementation would decode the
    * image/audio payload and run a feature extractor per batch; this
    * deterministic fake derives a 4-dim feature from the raw bytes so
    * the full pipeline (schema, batching, partitioning) is exercised
    * end-to-end and testable. Replace the body, keep the signature. */
  def stubFeaturize(payload: Array[Byte]): Array[Float] = {
    // ??? <- real codec goes here; deterministic fake below
    var s0 = 0L; var s1 = 0L
    var i = 0
    while (i < payload.length) {
      s0 += payload(i) & 0xff
      s1 ^= (payload(i) & 0xffL) << (i % 48)
      i += 1
    }
    Array(s0.toFloat, (s0 % 251).toFloat, (s1 % 997).toFloat,
      payload.length.toFloat)
  }

  /** Frame sampling over an opaque video/audio payload: `n` fixed-width
    * `frameLen`-byte chunks at a uniform integer stride tiling
    * [0, len − frameLen] — the codec-free plumbing of video frame
    * extraction (a real pipeline swaps the byte slice for a decoder
    * keyframe read; row shape, distribution, and determinism are
    * identical). Pure codegen'd substring arithmetic — no UDF, no
    * shuffle; one output row per (id, frame_idx). Payloads shorter than
    * `frameLen` yield n copies of the whole payload (offset 0), keeping
    * the output shape fixed for downstream batch featurizers. */
  def frameSample(df: DataFrame, idCol: String, binCol: String,
      n: Int, frameLen: Int): DataFrame = {
    require(n >= 2 && frameLen >= 1)
    val len = length(col(binCol)).cast(LongType)
    val span = greatest(len - lit(frameLen.toLong), lit(0L))
    // double division is exact here (offsets ≪ 2^53), and floor(x/k)
    // written the same way in SQL engines reproduces identical offsets
    val offs = transform(sequence(lit(0L), lit((n - 1).toLong)),
      i => floor((i * span) / lit((n - 1).toDouble)).cast(LongType))
    df.select(col(idCol), col(binCol).as("_b"),
        posexplode(offs).as(Seq("frame_idx", "offset")))
      .select(col(idCol), col("frame_idx").cast(LongType).as("frame_idx"),
        col("offset"),
        col("_b").substr(col("offset").cast("int") + lit(1),
          lit(frameLen)).as("frame"))
  }

  /** Partition-local batch featurization of (idCol, binCol) rows. */
  def featurize(df: DataFrame, idCol: String, binCol: String): DataFrame = {
    val in = df.select(col(idCol).cast(LongType), col(binCol))
    val enc = ExpressionEncoder(featSchema)
    in.mapPartitions { rows =>
      // per-partition init of a real codec would happen HERE, once
      rows.map { r =>
        val id = r.getLong(0)
        val payload = r.getAs[Array[Byte]](1)
        val feat = stubFeaturize(payload)
        Row(id, payload.length.toLong,
          if (payload.nonEmpty) payload(0) & 0xff else -1, feat)
      }
    }(enc)
  }
}
