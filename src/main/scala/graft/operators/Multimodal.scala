package graft.operators

import org.apache.spark.sql.{DataFrame, Row}
import org.apache.spark.sql.catalyst.encoders.RowEncoder
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types._

import graft.functional.MayFail

/** Multimodal (image/audio/video) column handling for training-data
  * pipelines: media travels as an opaque `binary` column plus a typed
  * metadata struct; decode / feature-extract / resize / frame-sample run
  * as `mapPartitions` stages (the Scala equivalent of an arrow-batched
  * UDF: one decoder instantiation per partition, streaming iterator, no
  * per-row setup cost).
  *
  * The actual codec calls sit behind [[MediaDecoder]]; this container has
  * no image/audio libraries, so the default [[DeterministicFakeDecoder]]
  * derives metadata purely from the bytes — STUB clearly marked — while
  * the Spark-side plumbing (schema, partitioning, batch shape) is real
  * and tested. Swap in a JNI/javacv-backed decoder for production.
  */
object Multimodal {

  /** Decoded-media metadata schema — the contract decoders fill. */
  val imageMetaType: StructType = StructType(Seq(
    StructField("width", IntegerType, nullable = false),
    StructField("height", IntegerType, nullable = false),
    StructField("channels", IntegerType, nullable = false),
    StructField("format", StringType, nullable = false),
    StructField("mean_intensity", DoubleType, nullable = false)))

  val audioMetaType: StructType = StructType(Seq(
    StructField("sample_rate", IntegerType, nullable = false),
    StructField("n_samples", LongType, nullable = false),
    StructField("duration_sec", DoubleType, nullable = false),
    StructField("rms_energy", DoubleType, nullable = false)))

  trait MediaDecoder extends Serializable {
    def decodeImage(bytes: Array[Byte]): Row
    def decodeAudio(bytes: Array[Byte]): Row
  }

  /** STUB decoder: no codec library in this environment. Metadata is a
    * deterministic pure function of the payload so tests and oracles can
    * verify the pipeline; a real decoder implements the same contract. */
  object DeterministicFakeDecoder extends MediaDecoder {
    override def decodeImage(bytes: Array[Byte]): Row = {
      val n = bytes.length
      val width = math.max(1, math.sqrt(n.toDouble).floor.toInt)
      val height = math.max(1, math.ceil(n.toDouble / width).toInt)
      var sum = 0L
      var i = 0
      while (i < n) { sum += bytes(i) & 0xff; i += 1 }
      val mean = if (n == 0) 0.0 else sum.toDouble / n
      Row(width, height, 3, "rgb", mean)
    }
    override def decodeAudio(bytes: Array[Byte]): Row = {
      val sampleRate = 16000
      val nSamples = bytes.length.toLong / 2 // pretend 16-bit PCM
      var acc = 0.0
      var i = 0
      while (i + 1 < bytes.length) {
        val s = ((bytes(i) & 0xff) | (bytes(i + 1) << 8)).toShort / 32768.0
        acc += s * s
        i += 2
      }
      val rms = if (nSamples == 0) 0.0 else math.sqrt(acc / nSamples)
      Row(sampleRate, nSamples, nSamples.toDouble / sampleRate, rms)
    }
  }

  private def withDecodedMeta(
      df: DataFrame,
      binCol: String,
      metaCol: String,
      metaType: StructType,
      decode: (MediaDecoder, Array[Byte]) => Row,
      decoder: MediaDecoder): DataFrame = {
    val outSchema = df.schema.add(metaCol, metaType, nullable = true)
    val binIdx = df.schema.fieldIndex(binCol)
    df.mapPartitions { rows =>
      // one decoder handle per partition — the arrow-batch shape
      val d = decoder
      rows.map { row =>
        val bytes = row.getAs[Array[Byte]](binIdx)
        val meta = if (bytes == null) null else decode(d, bytes)
        Row.fromSeq(row.toSeq :+ meta)
      }
    }(RowEncoder.encoderFor(outSchema))
  }

  /** Decode an image binary column into a metadata struct. */
  def decodeImage(
      df: DataFrame,
      binCol: String,
      metaCol: String = "image_meta",
      decoder: MediaDecoder = DeterministicFakeDecoder): MayFail[DataFrame] =
    MayFail(withDecodedMeta(df, binCol, metaCol, imageMetaType,
      (d, b) => d.decodeImage(b), decoder))

  /** Decode an audio binary column into a metadata struct. */
  def decodeAudio(
      df: DataFrame,
      binCol: String,
      metaCol: String = "audio_meta",
      decoder: MediaDecoder = DeterministicFakeDecoder): MayFail[DataFrame] =
    MayFail(withDecodedMeta(df, binCol, metaCol, audioMetaType,
      (d, b) => d.decodeAudio(b), decoder))

  /** Feature extraction: fixed-dimension embedding per media payload —
    * here a normalized byte-value histogram (the deterministic stand-in
    * for a real encoder's pooled features; STUB decode, real plumbing).
    * Output is `array<float>` so it feeds directly into the `Similarity`
    * / `Dedup.embeddingNearDupPairs` operators. */
  def extractFeatures(
      df: DataFrame,
      binCol: String,
      dim: Int = 64,
      outCol: String = "features"): MayFail[DataFrame] = MayFail {
    val outSchema = df.schema.add(outCol, ArrayType(FloatType, containsNull = false), nullable = true)
    val binIdx = df.schema.fieldIndex(binCol)
    df.mapPartitions { rows =>
      rows.map { row =>
        val bytes = row.getAs[Array[Byte]](binIdx)
        val feat = if (bytes == null) null
        else {
          val hist = new Array[Float](dim)
          var i = 0
          while (i < bytes.length) { hist((bytes(i) & 0xff) * dim / 256) += 1f; i += 1 }
          if (bytes.length > 0) {
            var j = 0
            while (j < dim) { hist(j) /= bytes.length; j += 1 }
          }
          hist
        }
        Row.fromSeq(row.toSeq :+ feat)
      }
    }(RowEncoder.encoderFor(outSchema))
  }

  /** Rescale image metadata to a bounding box, preserving aspect ratio
    * (pure column arithmetic — no decode needed for metadata-only ops). */
  def resizeMeta(
      df: DataFrame,
      metaCol: String,
      maxW: Int,
      maxH: Int,
      outCol: String = "resized_meta"): MayFail[DataFrame] = MayFail {
    val w = col(s"$metaCol.width").cast("double")
    val h = col(s"$metaCol.height").cast("double")
    val scale = least(lit(maxW) / w, lit(maxH) / h, lit(1.0))
    // clamp: ceil(w * (maxW/w)) can land one pixel over the box when the
    // division rounds up in floating point (e.g. 25 * (7/25) = 7.0000…01)
    df.withColumn(outCol, struct(
      least(ceil(w * scale).cast("int"), lit(maxW)).as("width"),
      least(ceil(h * scale).cast("int"), lit(maxH)).as("height"),
      col(s"$metaCol.channels").as("channels"),
      col(s"$metaCol.format").as("format"),
      col(s"$metaCol.mean_intensity").as("mean_intensity")))
  }

  /** Sample up to `n` evenly spaced frame offsets from a video binary
    * (one output row per frame — the explode shape a real frame extractor
    * produces; frame payload slicing is decoder work, offsets are not). */
  def sampleFrames(
      df: DataFrame,
      binCol: String,
      n: Int,
      frameSize: Int = 1024): MayFail[DataFrame] = MayFail {
    val nFrames = greatest(lit(1),
      least(lit(n), (length(col(binCol)) / frameSize).cast("int")))
    df.withColumn("frame_idx",
        explode(sequence(lit(0), nFrames - 1)))
      .withColumn("frame_offset",
        (col("frame_idx") * (length(col(binCol)) / nFrames)).cast("long"))
  }
}
