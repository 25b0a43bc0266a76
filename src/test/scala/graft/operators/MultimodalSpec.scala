package graft.operators

import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

import graft.SparkTestBase

class MultimodalSpec extends AnyFunSuite {
  private lazy val spark = SparkTestBase.spark
  import spark.implicits._

  private lazy val media = Seq(
    (0L, Array.tabulate(100)(_.toByte)),
    (1L, Array.tabulate(7)(i => (i * 3).toByte)),
    (2L, Array.empty[Byte])
  ).toDF("id", "payload")

  test("decodeImage adds a typed metadata struct via mapPartitions") {
    val out = Multimodal.decodeImage(media, "payload").get
    assert(out.schema("image_meta").dataType == Multimodal.imageMetaType)
    val rows = out.orderBy("id")
      .select("image_meta.width", "image_meta.height", "image_meta.channels")
      .as[(Int, Int, Int)].collect()
    assert(rows(0) == ((10, 10, 3))) // 100 bytes → 10×10
    assert(rows(1) == ((2, 4, 3)))   // 7 bytes → floor(sqrt 7)=2, ceil(7/2)=4
    assert(rows(2) == ((1, 1, 3)))   // empty payload degenerates to 1×1
  }

  test("decodeImage handles null payloads") {
    val withNull = Seq((0L, Option(Array[Byte](1, 2, 3, 4))), (1L, Option.empty[Array[Byte]]))
      .toDF("id", "payload")
    val out = Multimodal.decodeImage(withNull, "payload").get.orderBy("id")
    assert(out.filter($"image_meta".isNull).select("id").as[Long].collect().toSeq == Seq(1L))
  }

  test("decodeAudio derives duration from payload size") {
    val out = Multimodal.decodeAudio(media, "payload").get.orderBy("id")
    val r = out.select("audio_meta.n_samples", "audio_meta.duration_sec")
      .as[(Long, Double)].collect()
    assert(r(0)._1 == 50L && math.abs(r(0)._2 - 50.0 / 16000) < 1e-12)
  }

  test("extractFeatures: normalized byte histogram feeds the ANN operators") {
    val out = Multimodal.extractFeatures(media, "payload", dim = 16).get
    val feats = out.orderBy("id").select("features").as[Option[Seq[Float]]].collect()
    assert(feats(0).get.length == 16)
    assert(math.abs(feats(0).get.sum - 1.0f) < 1e-5) // normalized
    assert(feats(2).get.forall(_ == 0f)) // empty payload → zero vector
    // pipe into embedding near-dup: identical payloads are found
    val dup = media.union(media.withColumn("id", $"id" + 10))
    val withFeat = Multimodal.extractFeatures(dup, "payload", dim = 16).get
      .filter($"id".isin(0L, 10L)) // the two copies of payload 0
    val pairs = Dedup.embeddingNearDupPairs(withFeat, "features", "id",
      threshold = 0.99, nBits = 2, tables = 4).get
    assert(pairs.count() >= 1)
  }

  test("resizeMeta preserves aspect ratio inside the bounding box") {
    val big = Seq((0L, Array.tabulate(10000)(_.toByte))).toDF("id", "payload") // 100×100
    val out = (for {
      d <- Multimodal.decodeImage(big, "payload")
      r <- Multimodal.resizeMeta(d, "image_meta", 50, 25)
    } yield r).get
    val (w, h) = out.select("resized_meta.width", "resized_meta.height")
      .as[(Int, Int)].head()
    assert(w == 25 && h == 25) // scale = min(50/100, 25/100) = 0.25
  }

  test("sampleFrames explodes rows to evenly spaced offsets") {
    val vid = Seq((0L, Array.tabulate(4096)(_.toByte))).toDF("id", "payload")
    val out = Multimodal.sampleFrames(vid, "payload", n = 4, frameSize = 1024).get
    val rows = out.select("frame_idx", "frame_offset").as[(Int, Long)].collect()
    assert(rows.map(_._1).toSeq == Seq(0, 1, 2, 3))
    assert(rows.map(_._2).toSeq == Seq(0L, 1024L, 2048L, 3072L))
  }

  test("JdkMediaDecoder really decodes PNG: planted dims, channels, exact mean") {
    val bytes = Multimodal.MediaSynth.pngBytes(13, 7, 200)
    // true PNG magic — these are real encoded bytes, not a fake
    assert((bytes(0) & 0xff) == 0x89 && bytes(1) == 'P'.toByte)
    val df = Seq((0L, bytes)).toDF("id", "payload")
    val out = Multimodal.decodeImage(df, "payload",
      decoder = Multimodal.JdkMediaDecoder).get
    val r = out.select("image_meta.width", "image_meta.height",
      "image_meta.channels", "image_meta.format", "image_meta.mean_intensity")
      .as[(Int, Int, Int, String, Double)].head()
    assert(r == ((13, 7, 3, "png", 200.0)))
  }

  test("JdkMediaDecoder really decodes WAV: rate, frames, exact RMS") {
    val bytes = Multimodal.MediaSynth.wavBytes(16000, 160, 16384)
    assert(new String(bytes.take(4)) == "RIFF") // real WAV container
    val df = Seq((0L, bytes)).toDF("id", "payload")
    val out = Multimodal.decodeAudio(df, "payload",
      decoder = Multimodal.JdkMediaDecoder).get
    val r = out.select("audio_meta.sample_rate", "audio_meta.n_samples",
      "audio_meta.duration_sec", "audio_meta.rms_energy")
      .as[(Int, Long, Double, Double)].head()
    assert(r._1 == 16000 && r._2 == 160L)
    assert(math.abs(r._3 - 0.01) < 1e-12)
    assert(r._4 == 16384.0 / 32768.0) // constant amplitude ⇒ rms exact
  }

  test("JdkMediaDecoder transcodes u-law and 8-bit WAV to PCM16 before analysis") {
    // µ-law: AudioSystem's own encoder round-trips through the decoder's
    // transcode path; log-quantization makes the constant amplitude only
    // approximately recoverable
    val ulaw = Multimodal.MediaSynth.ulawWavBytes(8000, 160, 8000)
    val r = Multimodal.JdkMediaDecoder.decodeAudio(ulaw)
    assert(r.getInt(0) == 8000 && r.getLong(1) == 160L)
    assert(math.abs(r.getDouble(3) - 8000.0 / 32768.0) < 0.05 * 8000.0 / 32768.0,
      s"u-law rms ${r.getDouble(3)}")
    // 8-bit unsigned PCM: the 8→16 widening is ~×256 (the converter
    // dithers the low byte — 1% bound, not exact)
    val w8 = Multimodal.MediaSynth.wav8Bytes(11025, 220, 200)
    val r8 = Multimodal.JdkMediaDecoder.decodeAudio(w8)
    assert(r8.getInt(0) == 11025 && r8.getLong(1) == 220L)
    assert(math.abs(r8.getDouble(3) - (200 - 128) * 256.0 / 32768.0) < 0.01,
      s"8-bit rms ${r8.getDouble(3)}")
    // duration comes from the transcoded frame count
    assert(math.abs(r8.getDouble(2) - 220.0 / 11025.0) < 1e-12)
  }

  test("JdkMediaDecoder decodes a non-constant image and a negative-amplitude wave") {
    // gradient image: mean of 0..255 rows is (0+255)/2 for even heights
    val img = new java.awt.image.BufferedImage(4, 256,
      java.awt.image.BufferedImage.TYPE_3BYTE_BGR)
    (0 until 256).foreach { y =>
      val g = (y << 16) | (y << 8) | y
      (0 until 4).foreach(x => img.setRGB(x, y, g))
    }
    val baos = new java.io.ByteArrayOutputStream()
    javax.imageio.ImageIO.write(img, "png", baos)
    val mean = Multimodal.JdkMediaDecoder.decodeImage(baos.toByteArray).getDouble(4)
    assert(mean == 127.5)
    val rms = Multimodal.JdkMediaDecoder
      .decodeAudio(Multimodal.MediaSynth.wavBytes(8000, 80, -8192)).getDouble(3)
    assert(rms == 8192.0 / 32768.0)
  }

  test("resizeImage really rescales pixels: bounding box honored, constant fill preserved") {
    val df = Seq(
      (0L, Multimodal.MediaSynth.pngBytes(100, 50, 60)), // downscale 0.32
      (1L, Multimodal.MediaSynth.pngBytes(10, 8, 200)),  // under the box: untouched
      (2L, null.asInstanceOf[Array[Byte]])
    ).toDF("id", "img")
    val out = (for {
      r <- Multimodal.resizeImage(df, "img", maxW = 32, maxH = 32)
      d <- Multimodal.decodeImage(r, "resized", metaCol = "m",
             decoder = Multimodal.JdkMediaDecoder)
    } yield d).get.orderBy("id")
    assert(out.filter($"resized".isNull).select("id").as[Long].collect().toSeq == Seq(2L))
    val rows = out.filter($"m".isNotNull)
      .select("m.width", "m.height", "m.mean_intensity")
      .as[(Int, Int, Double)].collect()
    assert(rows(0) == ((32, 16, 60.0))) // scale = 32/100; bilinear keeps the constant
    assert(rows(1) == ((10, 8, 200.0))) // never upscaled
  }

  test("fft matches the DFT definition on a known vector and is energy-preserving") {
    // DFT of [1,0,0,0] is [1,1,1,1]; of [1,1,1,1] is [4,0,0,0]
    val re1 = Array(1.0, 0.0, 0.0, 0.0); val im1 = new Array[Double](4)
    Multimodal.fft(re1, im1)
    assert(re1.forall(x => math.abs(x - 1.0) < 1e-12) && im1.forall(math.abs(_) < 1e-12))
    val re2 = Array(1.0, 1.0, 1.0, 1.0); val im2 = new Array[Double](4)
    Multimodal.fft(re2, im2)
    assert(math.abs(re2(0) - 4.0) < 1e-12 && (1 to 3).forall(i => math.abs(re2(i)) < 1e-12))
    // Parseval on a pseudo-random vector: Σ|x|² == Σ|X|²/N
    val rnd = new scala.util.Random(7)
    val x = Array.fill(256)(rnd.nextDouble() - 0.5)
    val (re, im) = (x.clone(), new Array[Double](256))
    Multimodal.fft(re, im)
    val lhs = x.map(v => v * v).sum
    val rhs = re.indices.map(i => re(i) * re(i) + im(i) * im(i)).sum / 256
    assert(math.abs(lhs - rhs) < 1e-9)
  }

  test("audioSpectralFeatures recovers a planted tone's exact bin") {
    val df = Seq(
      (0L, Multimodal.MediaSynth.sineWavBytes(16000, 1024, 25, 12000)),
      (1L, Multimodal.MediaSynth.wavBytes(16000, 1024, 5000)), // DC: no non-DC peak
      (2L, null.asInstanceOf[Array[Byte]])
    ).toDF("id", "aud")
    val out = Multimodal.audioSpectralFeatures(df, "aud").get.orderBy("id")
    assert(out.filter($"audio_spectrum".isNull).select("id").as[Long].collect().toSeq == Seq(2L))
    val r = out.filter($"audio_spectrum".isNotNull)
      .select("audio_spectrum.dominant_bin", "audio_spectrum.dominant_freq_hz",
        "audio_spectrum.spectral_centroid_hz")
      .as[(Int, Double, Double)].collect()
    assert(r(0)._1 == 25)
    assert(math.abs(r(0)._2 - 25.0 * 16000 / 1024) < 1e-9)
    // centroid of a pure tone sits at the tone (rounding noise shifts it <1 bin)
    assert(math.abs(r(0)._3 - r(0)._2) < 16000.0 / 1024)
  }

  test("extractFrames explodes a GFV1 container into decodable per-frame rows") {
    val container = Multimodal.MediaSynth.framesContainer(Seq(
      Multimodal.MediaSynth.pngBytes(8, 4, 10),
      Multimodal.MediaSynth.pngBytes(9, 5, 20),
      Multimodal.MediaSynth.pngBytes(10, 6, 30)))
    val df = Seq((0L, container), (1L, null.asInstanceOf[Array[Byte]])).toDF("id", "vid")
    val out = (for {
      fr <- Multimodal.extractFrames(df, "vid", maxFrames = 2) // cap applies
      d  <- Multimodal.decodeImage(fr, "frame", metaCol = "m",
              decoder = Multimodal.JdkMediaDecoder)
    } yield d).get
    val rows = out.select("id", "frame_idx", "m.width", "m.mean_intensity")
      .as[(Long, Int, Int, Double)].collect().sortBy(r => (r._1, r._2)).toSeq
    // null payload: zero rows; maxFrames = 2 keeps frames 0 and 1 only
    assert(rows == Seq((0L, 0, 8, 10.0), (0L, 1, 9, 20.0)))
    val bad = Seq((0L, "nope".getBytes)).toDF("id", "vid")
    val err = intercept[Exception] {
      Multimodal.extractFrames(bad, "vid").get.count()
    }
    assert(err.getMessage.contains("GFV1"))
  }

  test("extractFrames splits a RIFF/AVI MJPEG container into real JPEG frames") {
    val grays = Seq(30, 120, 220)
    val avi = Multimodal.MediaSynth.aviMjpegBytes(
      grays.map(g => Multimodal.MediaSynth.jpegBytes(16, 12, g)), 16, 12)
    val df = Seq((0L, avi)).toDF("id", "vid")
    val out = (for {
      fr <- Multimodal.extractFrames(df, "vid")
      d  <- Multimodal.decodeImage(fr, "frame", metaCol = "m",
              decoder = Multimodal.JdkMediaDecoder)
    } yield d).get
    val rows = out.select("id", "frame_idx", "m.width", "m.height", "m.format",
        "m.mean_intensity")
      .as[(Long, Int, Int, Int, String, Double)].collect().sortBy(_._2).toSeq
    // structure is lossless: count, order, dims, codec
    assert(rows.map(r => (r._2, r._3, r._4, r._5)) ==
      Seq((0, 16, 12, "jpeg"), (1, 16, 12, "jpeg"), (2, 16, 12, "jpeg")))
    // JPEG is lossy — constant-gray frames decode within a few levels
    rows.zip(grays).foreach { case (r, g) =>
      assert(math.abs(r._6 - g) <= 3.0, s"frame ${r._2}: ${r._6} vs $g")
    }
    // maxFrames caps in file order
    assert(Multimodal.extractFrames(df, "vid", maxFrames = 2).get.count() == 2)
    // a truncated container fails loudly, not as zero frames
    val trunc = Seq((0L, avi.dropRight(10))).toDF("id", "vid")
    val err = intercept[Exception] {
      Multimodal.extractFrames(trunc, "vid").get.count()
    }
    assert(err.getMessage.contains("RIFF"))
  }

  test("JdkMediaDecoder fails loudly on a payload no codec recognizes") {
    val err = intercept[Exception] {
      Multimodal.JdkMediaDecoder.decodeImage("not an image".getBytes)
    }
    assert(err.getMessage.contains("ImageIO"))
  }

  test("imageDHash replays the planted gradient arithmetic at the 9×8 grid") {
    // pixel = (base + sx·x + sy·y) mod 256; at 9×8 the bilinear sample is
    // identity, so bit(y·8+x) = (p(x+1,y) > p(x,y)) exactly.
    def expected(base: Int, sx: Int, sy: Int): Long = {
      var h = 0L
      for (y <- 0 until 8; x <- 0 until 8) {
        val p0 = (base + sx * x + sy * y) % 256
        val p1 = (base + sx * (x + 1) + sy * y) % 256
        if (p1 > p0) h |= 1L << (y * 8 + x)
      }
      h
    }
    val df = Seq(
      (0L, Multimodal.MediaSynth.gradientPngBytes(9, 8, 10, 33, 7)),
      (1L, Multimodal.MediaSynth.gradientPngBytes(9, 8, 200, 51, 3)),
      (2L, Multimodal.MediaSynth.pngBytes(9, 8, 128)) // constant → no bit set
    ).toDF("id", "img")
    val got = Multimodal.imageDHash(df, "img").get
      .orderBy("id").select("dhash").as[Long].collect()
    assert(got(0) == expected(10, 33, 7))
    assert(got(1) == expected(200, 51, 3))
    assert(got(2) == 0L)
  }

  test("imageDHash is invariant under block-replicated upscale and null-safe") {
    // a 90×80 image whose 10×10 blocks replicate the 9×8 gradient samples
    // back to the identical hash: align-centers sampling lands inside the
    // block, so downscale recovers the exact source pixels.
    val small = Multimodal.MediaSynth.gradientPngBytes(9, 8, 77, 29, 5)
    val big = {
      val img = new java.awt.image.BufferedImage(
        90, 80, java.awt.image.BufferedImage.TYPE_3BYTE_BGR)
      for (y <- 0 until 80; x <- 0 until 90) {
        val v = (77 + 29 * (x / 10) + 5 * (y / 10)) % 256
        img.setRGB(x, y, (v << 16) | (v << 8) | v)
      }
      val baos = new java.io.ByteArrayOutputStream()
      javax.imageio.ImageIO.write(img, "png", baos)
      baos.toByteArray
    }
    val df = Seq((0L, Option(small)), (1L, Option(big)), (2L, Option.empty[Array[Byte]]))
      .toDF("id", "img")
    val got = Multimodal.imageDHash(df, "img").get
      .orderBy("id").select("dhash").as[Option[Long]].collect()
    assert(got(0).isDefined && got(0) == got(1))
    assert(got(2).isEmpty)
  }

  test("imageDedup keeps one representative per transitive cluster") {
    val mk = (b: Int, sx: Int, sy: Int) =>
      Multimodal.MediaSynth.gradientPngBytes(9, 8, b, sx, sy)
    val df = Seq(
      (0L, mk(10, 33, 7)), (10L, mk(10, 33, 7)), // exact clones → keep 0
      (1L, mk(50, 41, 5)), (11L, mk(50, 42, 5)), // near pair → keep 1
      (2L, mk(0, 0, 91))                         // singleton survives
    ).toDF("id", "img")
    val kept = Multimodal.imageDedup(df, "img", "id",
        maxHamming = 6, maxBucket = Int.MaxValue).get
      .select("id").as[Long].collect().toSeq.sorted
    assert(kept == Seq(0L, 1L, 2L))
    // maxHamming = 0: only the exact clone collapses
    val keptExact = Multimodal.imageDedup(df, "img", "id",
        maxHamming = 0, maxBucket = Int.MaxValue).get
      .select("id").as[Long].collect().toSeq.sorted
    assert(keptExact == Seq(0L, 1L, 2L, 11L))
  }

  test("audioFingerprint recovers the planted per-frame dominant bins") {
    val df = Seq(
      (0L, Option(Multimodal.MediaSynth.frameSineWavBytes(8000, 256, Seq(5, 17, 40), 12000))),
      (1L, Option(Multimodal.MediaSynth.wavBytes(8000, 100, 500))), // < 1 frame
      (2L, Option.empty[Array[Byte]])
    ).toDF("id", "aud")
    val got = Multimodal.audioFingerprint(df, "aud", nFft = 256).get
      .orderBy("id").select("fingerprint").as[Option[Seq[Int]]].collect()
    assert(got(0).contains(Seq(5, 17, 40)))
    assert(got(1).contains(Seq.empty[Int])) // short clip → no full frame
    assert(got(2).isEmpty)                  // null payload → null fingerprint
  }

  test("audioNearDupPairs pairs clips agreeing on enough frames") {
    val mk = (cs: Seq[Int]) =>
      Multimodal.MediaSynth.frameSineWavBytes(8000, 256, cs, 12000)
    val df = Seq(
      (0L, mk(Seq(5, 17, 40, 8))), (10L, mk(Seq(5, 17, 40, 8))),  // identical
      (1L, mk(Seq(5, 17, 40, 9))),                                 // 3 of 4 match 0/10
      (2L, mk(Seq(90, 91, 92, 93)))                                // unrelated
    ).toDF("id", "aud")
    val pairs = Multimodal.audioNearDupPairs(df, "aud", "id",
        nFft = 256, minMatches = 3).get
      .orderBy("idA", "idB")
      .select("idA", "idB", "n_matches").as[(Long, Long, Long)].collect()
    assert(pairs.toSeq == Seq((0L, 1L, 3L), (0L, 10L, 4L), (1L, 10L, 3L)))
    // 2-frame banding: 4-frame clips with >= 3 agreeing frames always
    // keep one band intact (pigeonhole), so the emitted set is identical
    // to single-frame banding — just with a squared candidate-key space
    val banded = Multimodal.audioNearDupPairs(df, "aud", "id",
        nFft = 256, minMatches = 3, bandWidth = 2).get
      .orderBy("idA", "idB")
      .select("idA", "idB", "n_matches").as[(Long, Long, Long)].collect()
    assert(banded.toSeq == pairs.toSeq)
  }

  test("audioDedup keeps one representative per agreement cluster") {
    val mk = (cs: Seq[Int]) =>
      Multimodal.MediaSynth.frameSineWavBytes(8000, 256, cs, 12000)
    val df = Seq(
      (0L, mk(Seq(5, 17, 40, 8))), (10L, mk(Seq(5, 17, 40, 8))),  // clones
      (1L, mk(Seq(5, 17, 40, 9))),  // chains to 0/10 at 3-of-4
      (2L, mk(Seq(90, 91, 92, 93))) // singleton
    ).toDF("id", "aud")
    // minMatches 3: {0, 1, 10} is one transitive cluster → keep 0 and 2
    val kept = Multimodal.audioDedup(df, "aud", "id",
        nFft = 256, minMatches = 3).get
      .select("id").as[Long].collect().toSeq.sorted
    assert(kept == Seq(0L, 2L))
    // minMatches 4 (= frame count): only exact fingerprints collapse
    val keptExact = Multimodal.audioDedup(df, "aud", "id",
        nFft = 256, minMatches = 4, bandWidth = 2).get
      .select("id").as[Long].collect().toSeq.sorted
    assert(keptExact == Seq(0L, 1L, 2L))
  }

  test("imageNearDupPairs pairs planted near-duplicates via banded Hamming") {
    // ids 0/10 identical, 1/11 one gradient step apart (few wrap bits
    // flip), 2 unrelated (orthogonal vertical gradient — far from both)
    val mk = (b: Int, sx: Int, sy: Int) =>
      Multimodal.MediaSynth.gradientPngBytes(9, 8, b, sx, sy)
    val df = Seq(
      (0L, mk(10, 33, 7)), (10L, mk(10, 33, 7)),
      (1L, mk(50, 41, 5)), (11L, mk(50, 42, 5)),
      (2L, mk(0, 0, 91))
    ).toDF("id", "img")
    val pairs = Multimodal.imageNearDupPairs(df, "img", "id",
        maxHamming = 6, maxBucket = Int.MaxValue).get
      .orderBy("idA", "idB")
      .select("idA", "idB", "hamming").as[(Long, Long, Int)].collect()
    assert(pairs.contains((0L, 10L, 0)))
    assert(pairs.exists(p => p._1 == 1L && p._2 == 11L && p._3 <= 6))
    assert(!pairs.exists(p => p._1 == 2L || p._2 == 2L))
  }

  // --- video: frame-hash sequence fingerprints ----------------------------

  /** The dHash replay for a planted 9×8 gradient (see the imageDHash
    * replay test for the derivation). */
  private def gradHash(base: Int, sx: Int, sy: Int): Long = {
    var h = 0L
    for (y <- 0 until 8; x <- 0 until 8) {
      val p0 = (base + sx * x + sy * y) % 256
      val p1 = (base + sx * (x + 1) + sy * y) % 256
      if (p1 > p0) h |= 1L << (y * 8 + x)
    }
    h
  }

  private def gfv1Clip(frames: Seq[(Int, Int, Int)]): Array[Byte] =
    Multimodal.MediaSynth.framesContainer(frames.map { case (b, sx, sy) =>
      Multimodal.MediaSynth.gradientPngBytes(9, 8, b, sx, sy)
    })

  test("videoFingerprint recovers the planted per-frame dHash sequence") {
    val df = Seq(
      (0L, Option(gfv1Clip(Seq((10, 33, 7), (200, 51, 3))))),
      (1L, Option(Multimodal.MediaSynth.framesContainer(Seq.empty))),
      (2L, Option.empty[Array[Byte]])
    ).toDF("id", "vid")
    val got = Multimodal.videoFingerprint(df, "vid").get
      .orderBy("id").select("fingerprint").as[Option[Seq[Long]]].collect()
    assert(got(0).contains(Seq(gradHash(10, 33, 7), gradHash(200, 51, 3))))
    assert(got(1).contains(Seq.empty[Long])) // frameless clip → empty
    assert(got(2).isEmpty)                   // null payload → null
    // maxFrames caps the fingerprint in file order
    val capped = Multimodal.videoFingerprint(df.filter($"id" === 0), "vid",
        maxFrames = 1).get.select("fingerprint").as[Seq[Long]].head()
    assert(capped == Seq(gradHash(10, 33, 7)))
  }

  test("videoFingerprint hashes the RIFF/AVI MJPEG path end to end") {
    // byte-identical JPEG frames hash identically across clips; a
    // different gradient produces a different hash (sanity-checked by
    // decoding the frame directly — JPEG is lossy, so the EXPECTED hash
    // comes from the decoder, not the planted arithmetic)
    def jpegGrad(base: Int, sx: Int, sy: Int): Array[Byte] = {
      val img = new java.awt.image.BufferedImage(
        9, 8, java.awt.image.BufferedImage.TYPE_3BYTE_BGR)
      for (y <- 0 until 8; x <- 0 until 9) {
        val v = (base + sx * x + sy * y) % 256
        img.setRGB(x, y, (v << 16) | (v << 8) | v)
      }
      val baos = new java.io.ByteArrayOutputStream()
      javax.imageio.ImageIO.write(img, "jpg", baos)
      baos.toByteArray
    }
    val fa = jpegGrad(10, 33, 7)
    val fb = jpegGrad(40, 3, 51)
    def decodedHash(jpeg: Array[Byte]): Long = Multimodal.dhash64(
      javax.imageio.ImageIO.read(new java.io.ByteArrayInputStream(jpeg)))
    assert(decodedHash(fa) != decodedHash(fb)) // discriminative fixture
    val avi = (fs: Seq[Array[Byte]]) =>
      Multimodal.MediaSynth.aviMjpegBytes(fs, 9, 8)
    val df = Seq(
      (0L, avi(Seq(fa, fb))), (1L, avi(Seq(fa, fb))), // byte-identical clips
      (2L, avi(Seq(fb, fb)))
    ).toDF("id", "vid")
    val got = Multimodal.videoFingerprint(df, "vid").get
      .orderBy("id").select("fingerprint").as[Seq[Long]].collect()
    assert(got(0) == Seq(decodedHash(fa), decodedHash(fb)))
    assert(got(0) == got(1))
    assert(got(2) == Seq(decodedHash(fb), decodedHash(fb)))
    // and the pair op finds exactly the identical pair
    val pairs = Multimodal.videoNearDupPairs(df, "vid", "id",
        minMatches = 2).get
      .select("idA", "idB", "n_matches").as[(Long, Long, Long)].collect()
    assert(pairs.toSeq == Seq((0L, 1L, 2L)))
  }

  test("videoNearDupPairs pairs clips agreeing on enough frames") {
    val f = Seq((10, 33, 7), (50, 41, 5), (200, 51, 3), (90, 21, 9))
    val df = Seq(
      (0L, gfv1Clip(f)), (10L, gfv1Clip(f)),              // identical
      (1L, gfv1Clip(f.updated(3, (90, 22, 9)))),          // 3 of 4 match
      (2L, gfv1Clip(Seq((1, 2, 3), (4, 5, 6), (7, 8, 9), (11, 12, 13))))
    ).toDF("id", "vid")
    val pairs = Multimodal.videoNearDupPairs(df, "vid", "id",
        minMatches = 3).get
      .orderBy("idA", "idB")
      .select("idA", "idB", "n_matches").as[(Long, Long, Long)].collect()
    assert(pairs.toSeq == Seq((0L, 1L, 3L), (0L, 10L, 4L), (1L, 10L, 3L)))
    // 2-frame banding: >= 3 of 4 agreeing frames always keep one band
    // intact (pigeonhole) — same emitted set, squared key space
    val banded = Multimodal.videoNearDupPairs(df, "vid", "id",
        minMatches = 3, bandWidth = 2).get
      .orderBy("idA", "idB")
      .select("idA", "idB", "n_matches").as[(Long, Long, Long)].collect()
    assert(banded.toSeq == pairs.toSeq)
  }

  test("videoNearDupPairs frameHamming tolerance absorbs per-frame drift") {
    val f = Seq((10, 33, 7), (50, 41, 5), (200, 51, 3), (90, 21, 9))
    // clip 1's last frame is a one-gradient-step twin of clip 0's —
    // nonzero but small Hamming (the q152 construction)
    val drifted = f.updated(3, (90, 22, 9))
    val ham = java.lang.Long.bitCount(
      gradHash(90, 21, 9) ^ gradHash(90, 22, 9))
    assert(ham > 0 && ham <= 6) // fixture sanity: drifted, within tolerance
    val df = Seq((0L, gfv1Clip(f)), (1L, gfv1Clip(drifted))).toDF("id", "vid")
    // exact agreement: 3 of 4 frames
    val exact = Multimodal.videoNearDupPairs(df, "vid", "id",
        minMatches = 4).get.count()
    assert(exact == 0)
    // tolerant agreement: the drifted frame counts, 4 of 4 — candidates
    // still come from the three exactly-equal frames' bands
    val tolerant = Multimodal.videoNearDupPairs(df, "vid", "id",
        minMatches = 4, frameHamming = 6).get
      .select("idA", "idB", "n_matches").as[(Long, Long, Long)].collect()
    assert(tolerant.toSeq == Seq((0L, 1L, 4L)))
  }

  test("videoDedup keeps one representative per agreement cluster") {
    val f = Seq((10, 33, 7), (50, 41, 5), (200, 51, 3), (90, 21, 9))
    val df = Seq(
      (0L, gfv1Clip(f)), (10L, gfv1Clip(f)),     // clones
      (1L, gfv1Clip(f.updated(3, (90, 22, 9)))), // chains at 3-of-4
      (2L, gfv1Clip(Seq((1, 2, 3), (4, 5, 6), (7, 8, 9), (11, 12, 13))))
    ).toDF("id", "vid")
    val kept = Multimodal.videoDedup(df, "vid", "id", minMatches = 3).get
      .select("id").as[Long].collect().toSeq.sorted
    assert(kept == Seq(0L, 2L))
    // minMatches = frame count: only exact fingerprints collapse
    val keptExact = Multimodal.videoDedup(df, "vid", "id",
        minMatches = 4, bandWidth = 2).get
      .select("id").as[Long].collect().toSeq.sorted
    assert(keptExact == Seq(0L, 1L, 2L))
  }

  // --- incremental (batch-vs-reference) media dedup -----------------------

  test("imageDedupAgainst keeps only batch images absent from the reference") {
    val mk = (b: Int, sx: Int, sy: Int) =>
      Multimodal.MediaSynth.gradientPngBytes(9, 8, b, sx, sy)
    val reference = Seq((100L, mk(10, 33, 7)), (101L, mk(50, 41, 5)))
      .toDF("id", "img")
    val batch = Seq(
      (0L, mk(10, 33, 7)), // exact clone of ref 100 → dropped
      (1L, mk(50, 42, 5)), // near-dup of ref 101 (one gradient step) → dropped
      (2L, mk(0, 0, 91))   // new → kept
    ).toDF("id", "img")
    val kept = Multimodal.imageDedupAgainst(batch, reference, "img", "id",
        maxHamming = 6, maxBucket = Int.MaxValue).get
      .select("id").as[Long].collect().toSeq.sorted
    assert(kept == Seq(2L))
    // maxHamming = 0: only the exact clone drops
    val keptExact = Multimodal.imageDedupAgainst(batch, reference, "img", "id",
        maxHamming = 0, maxBucket = Int.MaxValue).get
      .select("id").as[Long].collect().toSeq.sorted
    assert(keptExact == Seq(1L, 2L))
  }

  test("audioDedupAgainst keeps only batch clips absent from the reference") {
    val mk = (cs: Seq[Int]) =>
      Multimodal.MediaSynth.frameSineWavBytes(8000, 256, cs, 12000)
    val reference = Seq((100L, mk(Seq(5, 17, 40, 8)))).toDF("id", "aud")
    val batch = Seq(
      (0L, mk(Seq(5, 17, 40, 8))),  // clone of ref → dropped
      (1L, mk(Seq(5, 17, 40, 9))),  // 3 of 4 frames agree → dropped
      (2L, mk(Seq(90, 91, 92, 93))) // new → kept
    ).toDF("id", "aud")
    val kept = Multimodal.audioDedupAgainst(batch, reference, "aud", "id",
        nFft = 256, minMatches = 3).get
      .select("id").as[Long].collect().toSeq.sorted
    assert(kept == Seq(2L))
    val keptExact = Multimodal.audioDedupAgainst(batch, reference, "aud", "id",
        nFft = 256, minMatches = 4, bandWidth = 2).get
      .select("id").as[Long].collect().toSeq.sorted
    assert(keptExact == Seq(1L, 2L))
  }

  test("videoDedupAgainst keeps only batch clips absent from the reference") {
    val f = Seq((10, 33, 7), (50, 41, 5), (200, 51, 3), (90, 21, 9))
    val reference = Seq((100L, gfv1Clip(f))).toDF("id", "vid")
    val batch = Seq(
      (0L, gfv1Clip(f)),                          // clone → dropped
      (1L, gfv1Clip(f.updated(3, (90, 22, 9)))),  // 3 of 4 → dropped
      (2L, gfv1Clip(Seq((1, 2, 3), (4, 5, 6), (7, 8, 9), (11, 12, 13))))
    ).toDF("id", "vid")
    val kept = Multimodal.videoDedupAgainst(batch, reference, "vid", "id",
        minMatches = 3).get
      .select("id").as[Long].collect().toSeq.sorted
    assert(kept == Seq(2L))
  }

  // --- cap observability ---------------------------------------------------

  test("media cap reports surface dropped buckets on degenerate corpora") {
    // image: 5 byte-identical images → 7 bands (64/⌊64/7⌋), each bucket
    // holding all 5; maxBucket = 3 drops every one — and the paired pair
    // generator emits NOTHING, which the report explains
    val img = Multimodal.MediaSynth.gradientPngBytes(9, 8, 10, 33, 7)
    val imgDf = (0L until 5L).map((_, img)).toDF("id", "img")
    val imgRep = Multimodal.imageCapReport(imgDf, "img", "id",
        maxHamming = 6, maxBucket = 3).get
      .as[(Long, Long, Long, Long)].head()
    assert(imgRep == ((7L, 7L, 35L, 5L)))
    assert(Multimodal.imageNearDupPairs(imgDf, "img", "id",
      maxHamming = 6, maxBucket = 3).get.count() == 0)
    // audio: 5 clips with identical 4-frame fingerprints (the all-silence
    // shape) → 4 single-frame bands, occupancy 5 each
    val aud = Multimodal.MediaSynth.frameSineWavBytes(8000, 256, Seq(5, 17, 40, 8), 12000)
    val audDf = (0L until 5L).map((_, aud)).toDF("id", "aud")
    val audRep = Multimodal.audioCapReport(audDf, "aud", "id",
        nFft = 256, maxBucket = 3).get
      .as[(Long, Long, Long, Long)].head()
    assert(audRep == ((4L, 4L, 20L, 5L)))
    assert(Multimodal.audioNearDupPairs(audDf, "aud", "id",
      nFft = 256, minMatches = 3, maxBucket = 3).get.count() == 0)
    // video: same shape over frame-hash bands
    val clip = gfv1Clip(Seq((10, 33, 7), (50, 41, 5), (200, 51, 3), (90, 21, 9)))
    val vidDf = (0L until 5L).map((_, clip)).toDF("id", "vid")
    val vidRep = Multimodal.videoCapReport(vidDf, "vid", "id", maxBucket = 3).get
      .as[(Long, Long, Long, Long)].head()
    assert(vidRep == ((4L, 4L, 20L, 5L)))
    // an adequate cap reports zero drops
    val ok = Multimodal.videoCapReport(vidDf, "vid", "id", maxBucket = 10).get
      .as[(Long, Long, Long, Long)].head()
    assert(ok == ((4L, 0L, 0L, 5L)))
  }

  test("simhashCapReport counts the exact banding simhashPairs builds") {
    val docs = Seq(
      (0L, "the quick brown fox jumps over the lazy dog"),
      (1L, "the quick brown fox jumps over the lazy dog"),
      (2L, "the quick brown fox jumps over the lazy dog"),
      (3L, "an entirely different document about spark internals")
    ).toDF("id", "text")
    // maxHamming = 3 → 16-bit bands × 4; the three clones share all 4
    // buckets (occupancy 3), doc 3 adds 4 singletons
    val rep = graft.operators.Dedup.simhashCapReport(docs, "text", "id",
        maxHamming = 3, maxBucket = 2).get
      .as[(Long, Long, Long, Long)].head()
    assert(rep == ((8L, 4L, 12L, 3L)))
    assert(graft.operators.Dedup.simhashPairs(docs, "text", "id",
      maxHamming = 3, maxBucket = 2).get.count() == 0)
  }

  // --- cache discipline ----------------------------------------------------

  test("dedup wrappers release their pinned fingerprint frames") {
    spark.catalog.clearCache()
    val mk = (b: Int, sx: Int, sy: Int) =>
      Multimodal.MediaSynth.gradientPngBytes(9, 8, b, sx, sy)
    val imgDf = Seq((0L, mk(10, 33, 7)), (1L, mk(10, 33, 7)), (2L, mk(0, 0, 91)))
      .toDF("id", "img")
    assert(Multimodal.imageDedup(imgDf, "img", "id",
      maxHamming = 0, maxBucket = Int.MaxValue).get.count() == 2)
    assert(spark.sharedState.cacheManager.isEmpty,
      "imageDedup must unpersist its slim hash frame")
    val aud = Multimodal.MediaSynth.frameSineWavBytes(8000, 256, Seq(5, 17, 40, 8), 12000)
    val audDf = Seq((0L, aud), (1L, aud)).toDF("id", "aud")
    assert(Multimodal.audioDedup(audDf, "aud", "id",
      nFft = 256, minMatches = 4).get.count() == 1)
    assert(spark.sharedState.cacheManager.isEmpty,
      "audioDedup must unpersist its slim fingerprint frame")
    val clip = gfv1Clip(Seq((10, 33, 7), (50, 41, 5)))
    val vidDf = Seq((0L, clip), (1L, clip)).toDF("id", "vid")
    assert(Multimodal.videoDedup(vidDf, "vid", "id", minMatches = 2).get.count() == 1)
    assert(spark.sharedState.cacheManager.isEmpty,
      "videoDedup must unpersist its slim fingerprint frame")
    assert(Multimodal.imageDedupAgainst(imgDf, imgDf, "img", "id",
      maxHamming = 0, maxBucket = Int.MaxValue).get.count() == 0)
    assert(spark.sharedState.cacheManager.isEmpty,
      "imageDedupAgainst must unpersist both slim hash frames")
    // the PAIR-level ops keep the documented persist by default (callers
    // that chain multiple reads off the pairs frame rely on it)...
    assert(Multimodal.imageNearDupPairs(imgDf, "img", "id",
      maxHamming = 0, maxBucket = Int.MaxValue).get.count() >= 1)
    assert(!spark.sharedState.cacheManager.isEmpty)
    spark.catalog.clearCache()
    // ...and release EXACTLY their own frame with materialize = true —
    // the long-running-service path, no clearCache footgun
    assert(Multimodal.imageNearDupPairs(imgDf, "img", "id",
      maxHamming = 0, maxBucket = Int.MaxValue, materialize = true)
      .get.count() >= 1)
    assert(spark.sharedState.cacheManager.isEmpty,
      "imageNearDupPairs(materialize = true) must unpersist its slim frame")
    assert(Multimodal.audioNearDupPairs(audDf, "aud", "id",
      nFft = 256, minMatches = 4, materialize = true).get.count() == 1)
    assert(spark.sharedState.cacheManager.isEmpty,
      "audioNearDupPairs(materialize = true) must unpersist its slim frame")
    assert(Multimodal.videoNearDupPairs(vidDf, "vid", "id",
      minMatches = 2, materialize = true).get.count() == 1)
    assert(spark.sharedState.cacheManager.isEmpty,
      "videoNearDupPairs(materialize = true) must unpersist its slim frame")
  }

  test("incremental cap reports count each side separately") {
    // batch: 3 clips sharing one fingerprint; reference: the same
    // fingerprint once plus a distinct one — at maxBucket = 2 the shared
    // bucket is dropped on the batch side (occupancy 3) but KEPT on the
    // reference side (occupancy 1): the per-side report must show the
    // asymmetry the cross-corpus join actually acts on.
    val aud = Multimodal.MediaSynth.frameSineWavBytes(8000, 256, Seq(5, 17, 40, 8), 12000)
    val other = Multimodal.MediaSynth.frameSineWavBytes(8000, 256, Seq(90, 91, 92, 93), 12000)
    val batch = (0L until 3L).map((_, aud)).toDF("id", "aud")
    val ref = Seq((10L, aud), (11L, other)).toDF("id", "aud")
    val rep = Multimodal.audioIncrementalCapReport(batch, ref, "aud", "id",
        nFft = 256, maxBucket = 2).get
      .orderBy("side")
      .as[(String, Long, Long, Long, Long)].collect()
    // 4 single-frame bands per fingerprint: batch = 4 buckets all at
    // occupancy 3 (dropped); reference = 8 singleton buckets, none dropped
    assert(rep(0) == (("batch", 4L, 4L, 12L, 3L)))
    assert(rep(1) == (("reference", 8L, 0L, 0L, 1L)))
  }
}
