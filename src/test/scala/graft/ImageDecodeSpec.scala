package graft

import org.apache.spark.sql.functions._
import graft.operators.Multimodal

/** Real-codec multimodal path: PNG encode → ImageIO decode round trip. */
class ImageDecodeSpec extends SparkSpec {

  test("payloads are genuine PNGs and decode reproduces the exact pixels") {
    val payloads = Multimodal.imagePayloads(spark, sf).cache()
    // every payload carries the PNG magic — these are real compressed files
    val magic = Array(0x89.toByte, 'P'.toByte, 'N'.toByte, 'G'.toByte)
    payloads.collect().foreach { m =>
      assert(m.payload.length > 8 && m.payload.take(4).sameElements(magic))
    }
    val feats = Multimodal.decodeImages(payloads).cache()
    assert(feats.count() == payloads.count())
    // geometry survives the codec round trip
    feats.collect().foreach { f =>
      assert(f.img_w == (8 + f.doc_id % 9).toInt &&
        f.img_h == (8 + (f.doc_id * 3) % 9).toInt &&
        f.n_pixels == f.img_w.toLong * f.img_h)
      assert(f.mean_r >= 0 && f.mean_r <= 255 &&
        f.mean_g >= 0 && f.mean_g <= 255 && f.mean_b >= 0 && f.mean_b <= 255)
    }
    // channel means match a direct recomputation from the source bytes for
    // one known doc — PNG is lossless, so equality is exact
    val docs = Tables.documents(spark, sf).select("doc_id", "text")
      .filter(length(col("text")) > 0).limit(1).collect()
    val (id, text) = (docs(0).getLong(0), docs(0).getString(1))
    val bytes = text.getBytes(java.nio.charset.StandardCharsets.UTF_8)
    val (w, h) = ((8 + id % 9).toInt, (8 + (id * 3) % 9).toInt)
    val exp = (0 until 3).map { c =>
      (0 until w * h).map(i => bytes((i * 3 + c) % bytes.length) & 0xff).sum
        .toDouble / (w * h)
    }
    val got = feats.filter(col("doc_id") === id).collect()(0)
    assert(math.abs(got.mean_r - exp(0)) < 1e-9 &&
      math.abs(got.mean_g - exp(1)) < 1e-9 &&
      math.abs(got.mean_b - exp(2)) < 1e-9)
    payloads.unpersist(); feats.unpersist()
  }

  test("bilinear resize: right shape, constant images stay constant, mean tracks") {
    import spark.implicits._
    implicit val enc = org.apache.spark.sql.Encoders.product[Multimodal.MediaIn]
    // constant-color source: every resampling scheme must reproduce the
    // constant exactly at any output size
    def constPng(id: Long, w: Int, h: Int, rgb: Int): Multimodal.MediaIn = {
      val img = new java.awt.image.BufferedImage(w, h,
        java.awt.image.BufferedImage.TYPE_INT_RGB)
      for (y <- 0 until h; x <- 0 until w) img.setRGB(x, y, rgb)
      val baos = new java.io.ByteArrayOutputStream()
      javax.imageio.ImageIO.write(img, "png", baos)
      Multimodal.MediaIn(id, baos.toByteArray)
    }
    val const = Seq(constPng(1L, 11, 7, 0x406080), constPng(2L, 3, 3, 0xFF0000)).toDS()
    val rz = Multimodal.resizeImages(const, 4, 4).collect().sortBy(_.doc_id)
    assert(rz.length == 2)
    rz.foreach { r =>
      assert(r.out_w == 4 && r.out_h == 4 && r.pixels.length == 4 * 4 * 3)
    }
    assert(rz(0).src_w == 11 && rz(0).src_h == 7)
    assert(math.abs(rz(0).mean_r - 0x40) < 1e-9 &&
      math.abs(rz(0).mean_g - 0x60) < 1e-9 && math.abs(rz(0).mean_b - 0x80) < 1e-9)
    assert(rz(0).pixels.grouped(3).forall(p =>
      math.abs(p(0) - 0x40 / 255f) < 1e-6 && math.abs(p(1) - 0x60 / 255f) < 1e-6 &&
        math.abs(p(2) - 0x80 / 255f) < 1e-6), "constant image not constant after resize")
    assert(math.abs(rz(1).mean_r - 255.0) < 1e-9 && rz(1).mean_g == 0.0)

    // corpus path: geometry contract + deterministic across runs
    val a = Multimodal.imageResize(spark, sf).collect()
      .map(r => (r.getLong(0), r.getInt(1), r.getInt(2), r.getInt(3), r.getInt(4)))
    assert(a.nonEmpty && a.forall { case (id, sw, sh, ow, oh) =>
      sw == (8 + id % 9).toInt && sh == (8 + (id * 3) % 9).toInt && ow == 4 && oh == 4
    })
    val b = Multimodal.imageResize(spark, sf).collect()
      .map(r => (r.getLong(0), r.getInt(1), r.getInt(2), r.getInt(3), r.getInt(4)))
    assert(a.sorted.sameElements(b.sorted))
    // junk payloads DLQ-drop through the resize path too
    val junk = Seq(Multimodal.MediaIn(-1L, Array[Byte](1, 2, 3))).toDS()
    assert(Multimodal.resizeImages(junk, 4, 4).count() == 0)
  }

  test("unreadable payloads drop out instead of failing the batch") {
    import spark.implicits._
    implicit val enc = org.apache.spark.sql.Encoders.product[Multimodal.MediaIn]
    val good = Multimodal.imagePayloads(spark, sf).limit(3)
    val junk = Seq(Multimodal.MediaIn(-1L, Array[Byte](1, 2, 3, 4))).toDS()
    val out = Multimodal.decodeImages(good.unionByName(junk)).collect()
    assert(out.length == 3 && !out.exists(_.doc_id == -1L))
  }

  test("WAV payloads are genuine RIFF files and decode reproduces the samples") {
    val payloads = Multimodal.audioPayloads(spark, sf).cache()
    payloads.collect().foreach { m =>
      assert(new String(m.payload.take(4), "US-ASCII") == "RIFF" &&
        new String(m.payload.slice(8, 12), "US-ASCII") == "WAVE")
    }
    val feats = Multimodal.decodeAudio(payloads).cache()
    assert(feats.count() == payloads.count())
    feats.collect().foreach { f =>
      assert(f.sample_rate == 8000 && f.n_channels == 1)
      assert(f.n_frames == 64 + f.doc_id % 129)
      assert(f.duration_ms == f.n_frames * 1000 / 8000)
      assert(f.peak <= 32768 && f.rms >= 0 && f.rms <= 32768)
    }
    // RMS matches a direct recomputation for one known doc (PCM lossless)
    val docs = Tables.documents(spark, sf).select("doc_id", "text")
      .filter(length(col("text")) > 0).limit(1).collect()
    val (id, text) = (docs(0).getLong(0), docs(0).getString(1))
    val bytes = text.getBytes(java.nio.charset.StandardCharsets.UTF_8)
    val n = 64 + (id % 129).toInt
    val samples = (0 until n).map(i => ((bytes((i * 5) % bytes.length) & 0xff) - 128) << 8)
    val expRms = math.sqrt(samples.map(s => s.toDouble * s).sum / n)
    val got = feats.filter(col("doc_id") === id).collect()(0)
    assert(math.abs(got.rms - expRms) < 1e-9)
    assert(got.peak == samples.map(math.abs).max)
    // junk bytes divert, not fail
    import spark.implicits._
    implicit val enc = org.apache.spark.sql.Encoders.product[Multimodal.MediaIn]
    val junk = Seq(Multimodal.MediaIn(-1L, Array[Byte](9, 9, 9, 9))).toDS()
    assert(Multimodal.decodeAudio(junk).count() == 0)
    payloads.unpersist(); feats.unpersist()
  }

  test("hand-rolled RIFF framing is byte-identical to AudioSystem.write") {
    // the encode arm frames PCM with the direct 44-byte header (wavBytes);
    // this pins it against the javax.sound.sampled writer it replaced —
    // any drift in the container layout fails here, not in a decoder
    val rnd = new scala.util.Random(42)
    for (n <- Seq(0, 1, 64, 193)) {
      val pcm = new Array[Byte](n * 2)
      rnd.nextBytes(pcm)
      val fmt = new javax.sound.sampled.AudioFormat(8000f, 16, 1, true, false)
      val ais = new javax.sound.sampled.AudioInputStream(
        new java.io.ByteArrayInputStream(pcm), fmt, n.toLong)
      val baos = new java.io.ByteArrayOutputStream()
      javax.sound.sampled.AudioSystem.write(ais,
        javax.sound.sampled.AudioFileFormat.Type.WAVE, baos)
      val expected = baos.toByteArray
      val got = Multimodal.wavBytes(pcm, 8000, channels = 1, bits = 16)
      assert(java.util.Arrays.equals(got, expected),
        s"n=$n: ${got.length} vs ${expected.length} bytes, " +
          s"header got=${got.take(44).mkString(",")} " +
          s"want=${expected.take(44).mkString(",")}")
    }
  }

  test("pHash: brightness-shift invariant, noise-tolerant, separates distinct images") {
    import spark.implicits._
    implicit val enc = org.apache.spark.sql.Encoders.product[Multimodal.MediaIn]
    def png(id: Long, f: (Int, Int) => Int): Multimodal.MediaIn = {
      val img = new java.awt.image.BufferedImage(48, 48,
        java.awt.image.BufferedImage.TYPE_INT_RGB)
      for (y <- 0 until 48; x <- 0 until 48) img.setRGB(x, y, f(x, y))
      val baos = new java.io.ByteArrayOutputStream()
      javax.imageio.ImageIO.write(img, "png", baos)
      Multimodal.MediaIn(id, baos.toByteArray)
    }
    def clamp(v: Int) = math.max(0, math.min(255, v))
    // textured base: diagonal gradient with a bright quadrant
    def base(x: Int, y: Int): Int = {
      val v = clamp((x * 5 + y * 3) % 256 / 2 + (if (x < 24 && y < 24) 96 else 0))
      (v << 16) | (v << 8) | v
    }
    val imgs = Seq(
      png(1L, base),
      // uniform brightness lift: DC-only change, hash must be IDENTICAL
      png(2L, (x, y) => { val v = clamp(((base(x, y) >> 16) & 0xff) + 20); (v << 16) | (v << 8) | v }),
      // sparse noise: a few pixels perturbed -> small Hamming distance
      png(3L, (x, y) => if ((x * 48 + y) % 97 == 0) 0xFFFFFF else base(x, y)),
      // structurally different: fine checkerboard
      png(4L, (x, y) => if ((x + y) % 2 == 0) 0xFFFFFF else 0)).toDS()
    val hashes = Multimodal.phashImages(imgs).collect().map(h => h.doc_id -> h.phash).toMap
    assert(hashes.size === 4)
    def ham(a: Long, b: Long) = java.lang.Long.bitCount(a ^ b)
    // DC is excluded from the hash, so a uniform lift can only flip bits
    // through bilinear integer rounding — allow ≤3 (pigeonhole: the
    // 4-band candidate join still must surface the pair)
    assert(ham(hashes(1L), hashes(2L)) <= 3,
      s"brightness shift moved pHash ${ham(hashes(1L), hashes(2L))} bits")
    assert(ham(hashes(1L), hashes(3L)) <= 10,
      s"noisy copy too far: ${ham(hashes(1L), hashes(3L))}")
    assert(ham(hashes(1L), hashes(4L)) > 16,
      s"distinct images too close: ${ham(hashes(1L), hashes(4L))}")
    // pair finder: planted near-dups surface, the checkerboard never pairs
    val pairs = Multimodal.phashPairs(Multimodal.phashImages(imgs).toDF())
      .collect().map(r => (r.getLong(0), r.getLong(1))).toSet
    assert(pairs.contains((1L, 2L)))
    assert(!pairs.exists { case (a, b) => a == 4L || b == 4L })
    // corpus query: one row per doc, hex hash, non-negative degree
    val out = Multimodal.phashDedup(spark, sf)
    assert(out.count() == Tables.documents(spark, sf).count())
    assert(out.filter(col("n_near_dups") < 0).count() == 0)
    // HammingBandCap never binds where planted-pair semantics are pinned:
    // the largest 16-bit band bucket over the corpus stays well below it
    val maxBkt = Multimodal.phashImages(Multimodal.imagePayloads(spark, sf)).toDF()
      .select(col("doc_id"), col("phash"),
        explode(sequence(lit(0), lit(3))).as("band"))
      .withColumn("band_val", expr("(phash >> (band * 16)) & 65535"))
      .groupBy("band", "band_val").agg(count(lit(1)).as("sz"))
      .agg(max(col("sz"))).head.getLong(0)
    assert(maxBkt <= Multimodal.HammingBandCap / 2,
      s"image Hamming band census too close to the cap at test scale: $maxBkt")
  }

  test("audio silence profile: planted runs measured exactly, level-invariant") {
    import spark.implicits._
    implicit val enc = org.apache.spark.sql.Encoders.product[Multimodal.MediaIn]
    def wavOf(id: Long, samples: Array[Int]): Multimodal.MediaIn = {
      val pcm = new Array[Byte](samples.length * 2)
      samples.zipWithIndex.foreach { case (v, i) =>
        pcm(2 * i) = (v & 0xff).toByte
        pcm(2 * i + 1) = ((v >> 8) & 0xff).toByte
      }
      val fmt = new javax.sound.sampled.AudioFormat(8000f, 16, 1, true, false)
      val ais = new javax.sound.sampled.AudioInputStream(
        new java.io.ByteArrayInputStream(pcm), fmt, samples.length.toLong)
      val baos = new java.io.ByteArrayOutputStream()
      javax.sound.sampled.AudioSystem.write(ais,
        javax.sound.sampled.AudioFileFormat.Type.WAVE, baos)
      Multimodal.MediaIn(id, baos.toByteArray)
    }
    // 100 silence + 50 loud + 30 silence; a half-level copy must read the
    // same profile (threshold is relative to the clip's own peak)
    val pattern = Array.fill(100)(0) ++ Array.fill(50)(16000) ++ Array.fill(30)(0)
    val half = pattern.map(_ / 2)
    val allZero = Array.fill(80)(0)
    val out = Multimodal.audioSilenceFrom(
        Seq(wavOf(1L, pattern), wavOf(2L, half), wavOf(3L, allZero)).toDS())
      .collect().map(s => s.doc_id -> s).toMap
    val p = out(1L)
    assert((p.n_samples, p.n_silent, p.longest_run, p.lead_silence,
      p.trail_silence, p.mostly_silent) === ((180L, 130L, 100L, 100L, 30L, true)))
    assert(p.silent_bp === 130L * 10000 / 180)
    val h = out(2L)
    assert((h.n_silent, h.longest_run, h.lead_silence, h.trail_silence) ===
      ((130L, 100L, 100L, 30L)), "half-level copy profile moved")
    val z = out(3L)
    assert((z.n_silent, z.silent_bp, z.lead_silence, z.mostly_silent) ===
      ((80L, 10000L, 80L, true)))
  }

  test("audio fingerprint: level-invariant, separates different spectra") {
    import spark.implicits._
    implicit val enc = org.apache.spark.sql.Encoders.product[Multimodal.MediaIn]
    def wav(id: Long, f: Int => Double): Multimodal.MediaIn = {
      val n = 17 * 16
      val pcm = new Array[Byte](n * 2)
      for (i <- 0 until n) {
        val v = math.max(-32768, math.min(32767, math.round(f(i)))).toInt
        pcm(2 * i) = (v & 0xff).toByte
        pcm(2 * i + 1) = ((v >> 8) & 0xff).toByte
      }
      val fmt = new javax.sound.sampled.AudioFormat(8000f, 16, 1, true, false)
      val ais = new javax.sound.sampled.AudioInputStream(
        new java.io.ByteArrayInputStream(pcm), fmt, n.toLong)
      val baos = new java.io.ByteArrayOutputStream()
      javax.sound.sampled.AudioSystem.write(ais,
        javax.sound.sampled.AudioFileFormat.Type.WAVE, baos)
      Multimodal.MediaIn(id, baos.toByteArray)
    }
    // both tone amplitudes vary per frame so EVERY band difference has a
    // signal-scale time component (a constant-energy band would leave
    // its bit to quantization noise, which does not scale with level)
    def tone(i: Int): Double = {
      val frame = i / 16
      (8000.0 + 900.0 * (frame % 5)) * math.sin(2 * math.Pi * 2 * i / 16.0) +
        (3000.0 + 800.0 * ((frame * 3) % 7)) * math.sin(2 * math.Pi * 4 * i / 16.0)
    }
    // different spectrum: energy in different bins, different modulation
    def other(i: Int): Double = {
      val frame = i / 16
      (6000.0 + 900.0 * ((frame * 2) % 5)) * math.sin(2 * math.Pi * 5 * i / 16.0) +
        (4000.0 + 700.0 * ((frame * 5) % 3)) * math.sin(2 * math.Pi * 1 * i / 16.0)
    }
    val ds = Seq(
      wav(1L, tone), wav(2L, i => 0.5 * tone(i)), wav(3L, other)).toDS()
    val fps = Multimodal.audioFingerprints(ds).collect()
      .map(h => h.doc_id -> h.afp).toMap
    assert(fps.size === 3)
    def ham(a: Long, b: Long) = java.lang.Long.bitCount(a ^ b)
    assert(ham(fps(1L), fps(2L)) <= 3,
      s"half-level copy moved ${ham(fps(1L), fps(2L))} bits")
    assert(ham(fps(1L), fps(3L)) > 16,
      s"different spectrum too close: ${ham(fps(1L), fps(3L))}")
    // corpus query: one row per doc
    val out = Multimodal.audioFpDedup(spark, sf)
    assert(out.count() == Tables.documents(spark, sf).count())
    // the audio census is the OPPOSITE story from images: synthesized
    // spectra concentrate so hard that at least one 16-bit band is shared
    // by (nearly) the whole corpus — the degenerate band whose UNCAPPED
    // self-join went quadratic in the 10× sweep (n²/2 candidate pairs).
    // Pin that the degeneracy is real (so the HammingBandCap in
    // phashPairs is load-bearing here, not dormant) …
    val n = Tables.documents(spark, sf).count()
    val maxBkt = Multimodal.audioFingerprints(Multimodal.audioPayloads(spark, sf)).toDF()
      .select(col("doc_id"), col("afp").as("phash"),
        explode(sequence(lit(0), lit(3))).as("band"))
      .withColumn("band_val", expr("(phash >> (band * 16)) & 65535"))
      .groupBy("band", "band_val").agg(count(lit(1)).as("sz"))
      .agg(max(col("sz"))).head.getLong(0)
    assert(maxBkt > Multimodal.HammingBandCap / 2,
      s"audio bands no longer concentrate ($maxBkt of $n) — revisit the cap rationale")
    // … and that the capped pair finder still surfaces near-dups through
    // the informative bands: the three synthetic WAVs above pinned pair
    // semantics; here the corpus query stayed one-row-per-doc (asserted
    // above) with bounded work regardless of the degenerate bucket.
  }

  test("video keyframes: the planted scene cut is detected, jitter is not") {
    val stats = Multimodal.videoKeyframeStats(spark, sf).collect()
      .map(r => r.getLong(0) -> ((r.getInt(1), r.getLong(2)))).toMap
    assert(stats.size == Tables.documents(spark, sf).count())
    val docs = Tables.documents(spark, sf)
      .select("doc_id").collect().map(_.getLong(0))
    // non-empty docs: even doc_ids carry a hard cut at frame 2 -> exactly
    // 2 keyframes (frame 0 + the cut); odd ones only jitter -> 1
    val texts = Tables.documents(spark, sf)
      .selectExpr("doc_id", "length(text) > 0 AS has").collect()
      .map(r => r.getLong(0) -> r.getBoolean(1)).toMap
    docs.filter(texts).foreach { id =>
      val (nf, nk) = stats(id)
      assert(nf == 4 + (id % 3).toInt, s"doc $id frame count $nf")
      if (id % 2 == 0) assert(nk == 2L, s"even doc $id keyframes $nk")
      else assert(nk == 1L, s"odd doc $id keyframes $nk")
    }
  }
}
