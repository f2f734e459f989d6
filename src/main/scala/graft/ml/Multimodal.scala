package graft.ml

import org.apache.spark.sql.{DataFrame, Dataset, Row, SparkSession}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types._

/** Multimodal column plumbing: image/audio/video as opaque `binary`
  * columns plus typed metadata, with decode/feature-extract as
  * `mapPartitions` batch transforms.
  *
  * The actual codec step is STUBBED (no image/audio libs in this
  * container) with a deterministic fake decoder — the Spark-side contract
  * (schema, partition-local batching, per-partition init cost amortized
  * across a partition, no shuffles) is real and tested. At scale this is
  * the standard shape: heavy per-row native decode work stays inside a
  * partition; only extracted features (small) flow onward.
  */
object Multimodal {

  /** Canonical media envelope. */
  val mediaSchema: StructType = StructType(Seq(
    StructField("media_id", LongType, nullable = false),
    StructField("modality", StringType, nullable = false), // image|audio|video
    StructField("data", BinaryType, nullable = true),      // opaque payload
    StructField("mime", StringType, nullable = true),
    StructField("width", IntegerType, nullable = true),
    StructField("height", IntegerType, nullable = true),
    StructField("duration_ms", LongType, nullable = true)))

  final case class MediaFeatures(media_id: Long, modality: String,
                                 n_bytes: Long, feature: Array[Double])

  /** STUB decoder: a real build would call the native codec here (e.g.
    * libjpeg/ffmpeg via JNI). Deterministic fake = 8 byte-histogram-ish
    * moments so tests are stable. Marked clearly as the seam to replace. */
  private def decodeStub(modality: String, data: Array[Byte]): Array[Double] = {
    // ??? <- real codec goes here; deterministic fake below
    if (data == null || data.isEmpty) Array.fill(8)(0.0)
    else {
      val out = new Array[Double](8)
      var i = 0
      while (i < data.length) { out(i % 8) += (data(i) & 0xFF) / 255.0; i += 1 }
      out.map(_ / math.max(1, data.length / 8))
    }
  }

  /** Feature extraction over media rows: partition-local, batched, with a
    * per-partition "codec init" once (the expensive part in real codecs). */
  def extractFeatures(media: DataFrame): Dataset[MediaFeatures] = {
    val spark = media.sparkSession
    import spark.implicits._
    media.select("media_id", "modality", "data").as[(Long, String, Array[Byte])]
      .mapPartitions { rows =>
        // per-partition codec init happens HERE (once), not per row
        rows.map { case (id, modality, data) =>
          MediaFeatures(id, modality,
            if (data == null) 0L else data.length.toLong,
            decodeStub(modality, data))
        }
      }
  }

  /** Frame-sample stub for video: emit `n` evenly-spaced (frame_idx,
    * offset_ms) rows per video — the explode-shaped plumbing is real. */
  def frameSample(media: DataFrame, n: Int): DataFrame =
    media.filter(col("modality") === "video")
      .withColumn("frame_idx", explode(sequence(lit(0), lit(n - 1))))
      .withColumn("offset_ms",
        floor(col("frame_idx").cast(DoubleType) / n * coalesce(col("duration_ms"), lit(0L))).cast(LongType))
      .select("media_id", "frame_idx", "offset_ms")

  /** Deterministic synthetic media table for tests (derived from the
    * documents table so it exists at every SF). */
  def syntheticMedia(spark: SparkSession, dir: String): DataFrame = {
    val docs = graft.core.Tables(spark, dir, "documents")
    docs.select(
      col("doc_id").as("media_id"),
      element_at(array(lit("image"), lit("audio"), lit("video")),
        (pmod(col("doc_id"), lit(3)) + 1).cast(IntegerType)).as("modality"),
      col("text").cast(BinaryType).as("data"),
      lit("application/octet-stream").as("mime"),
      lit(64).as("width"), lit(64).as("height"),
      (col("n_chars") * 10).as("duration_ms"))
  }
}
