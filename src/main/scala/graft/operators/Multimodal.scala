package graft.operators

import org.apache.spark.sql.{Column, DataFrame, Dataset, Row}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types._

/** Multimodal-column plumbing for a training-data pipeline: image/audio/
  * video travel as opaque `BINARY` payloads with a typed metadata struct;
  * decode / feature-extract / frame-sample run as partition-local batch
  * transforms (`mapPartitions` — the Scala analogue of a vectorized batch
  * UDF: one task per input split, batched row iteration, no driver hop).
  *
  * STUB NOTICE: this container ships no image/audio codecs, so
  * `decodeFeatures`'s "decoder" is a clearly-marked deterministic fake
  * (byte-level statistics standing in for pixel/sample decoding). The
  * Spark-side contract — schema, binary payload handling, batch shape,
  * partition distribution — is real and tested; swapping in a JNI/JavaCV
  * codec changes only the bytes→features function.
  */
object Multimodal {

  /** Typed metadata carried beside every payload. */
  val mediaMetaType: StructType = StructType(Seq(
    StructField("kind", StringType),          // image | audio | video
    StructField("width", IntegerType),
    StructField("height", IntegerType),
    StructField("sample_rate", IntegerType),
    StructField("duration_ms", LongType)))

  /** Manufacture a media table from any string column (UTF-8 bytes as the
    * opaque payload) — lets the pipeline be exercised on `documents`. */
  def asMedia(df: DataFrame, idCol: String, textCol: String): DataFrame =
    df.select(
      col(idCol).as("media_id"),
      encode(col(textCol), "UTF-8").as("payload"),
      struct(
        lit("image").as("kind"),
        (length(col(textCol)) % 640).cast("int").as("width"),
        (length(col(textCol)) % 480).cast("int").as("height"),
        lit(16000).as("sample_rate"),
        (length(col(textCol)) * 10L).as("duration_ms")).as("meta"))

  private val featureSchema = StructType(Seq(
    StructField("media_id", LongType),
    StructField("n_bytes", LongType),
    StructField("mean_byte", DoubleType),
    StructField("features", ArrayType(FloatType)))) // 8-bin byte histogram

  /** Decode + feature-extract, batched per partition. The fake decoder is
    * `???`-equivalent for real codecs: deterministic byte statistics in
    * place of pixel decoding (see stub notice above). */
  def decodeFeatures(media: DataFrame): DataFrame = {
    val spark = media.sparkSession
    val rdd = media.select(col("media_id").cast("long"), col("payload")).rdd
      .mapPartitions { it =>
        // batch shape: the iterator is consumed in chunks like a columnar
        // batch; state is per-partition, nothing escapes to the driver.
        it.grouped(256).flatMap { batch =>
          batch.iterator.map { r =>
            val id = r.getLong(0)
            val bytes = r.getAs[Array[Byte]](1)
            // --- STUB decoder start (deterministic fake, not a codec) ---
            val hist = new Array[Float](8)
            var sum = 0L
            var i = 0
            while (i < bytes.length) {
              val b = bytes(i) & 0xff
              hist(b >>> 5) += 1f
              sum += b
              i += 1
            }
            val n = math.max(1, bytes.length)
            var j = 0
            while (j < 8) { hist(j) /= n.toFloat; j += 1 }
            // --- STUB decoder end ---
            Row(id, bytes.length.toLong, sum.toDouble / n, hist.toSeq)
          }
        }
      }
    spark.createDataFrame(rdd, featureSchema)
  }

  /** Frame-sample: every `stride`-th fixed-size byte window of the payload
    * as its own row (video → frames). Pure built-ins (posexplode over a
    * computed slice index) — stays in codegen, no UDF. */
  def frameSample(media: DataFrame, frameBytes: Int, stride: Int): DataFrame = {
    val nFrames = greatest(lit(0),
      ((length(col("payload")) - frameBytes) / stride + 1).cast("int"))
    media
      .select(col("media_id"), col("payload"), nFrames.as("n_frames"))
      .filter(col("n_frames") > 0)
      .select(col("media_id"),
        posexplode(transform(sequence(lit(0), col("n_frames") - 1),
          i => substring(col("payload"), (i * stride + 1).cast("int"), lit(frameBytes))))
          .as(Seq("frame_idx", "frame")))
  }

  /** "Resize": crop/pad the payload to `targetBytes` (stand-in for a pixel
    * resize; binary-in binary-out contract). */
  def resizeStub(payload: Column, targetBytes: Int): Column =
    rpad(substring(payload, 1, targetBytes), targetBytes, Array[Byte](0))
}
