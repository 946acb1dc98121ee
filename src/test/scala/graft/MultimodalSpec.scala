package graft

import graft.domain.Multimodal
import graft.operators.ExternalProcess
import org.apache.spark.sql.functions._

class MultimodalSpec extends SparkSpec {
  import spark.implicits._

  private lazy val media = Multimodal.asMediaTable(
    Seq(("m1", Array[Byte](1, 2, 3, 4, 5)),
      ("m2", Array[Byte](9, 8, 7)),
      ("m3", null.asInstanceOf[Array[Byte]]))
      .toDF("id", "bytes"), "id", "bytes", "image/png")

  test("media table carries binary + typed metadata schema") {
    assert(media.schema("content").dataType.typeName === "binary")
    val metaFields = media.schema("meta").dataType
      .asInstanceOf[org.apache.spark.sql.types.StructType]
      .fields.map(f => (f.name, f.dataType)).toSeq
    assert(metaFields === Multimodal.mediaMetaType.fields
      .map(f => (f.name, f.dataType)).toSeq)
  }

  test("decodeFrames batches per partition, skips null payloads, deterministic") {
    val frames = Multimodal.decodeFrames(media, new Multimodal.FakeDecoder(3, 4))
    val got = frames.collect()
    assert(got.map(_.media_id).distinct.sorted.toSeq === Seq("m1", "m2"))
    assert(got.count(_.media_id == "m1") === 3)
    val again = Multimodal.decodeFrames(media, new Multimodal.FakeDecoder(3, 4))
      .collect()
    assert(got.map(f => (f.media_id, f.frameIdx, f.pixels.toSeq)).sortBy(x => (x._1, x._2)).toSeq ===
      again.map(f => (f.media_id, f.frameIdx, f.pixels.toSeq)).sortBy(x => (x._1, x._2)).toSeq)
  }

  test("sampleFrames keeps every stride-th frame") {
    val frames = Multimodal.decodeFrames(media, new Multimodal.FakeDecoder(4, 2))
    val sampled = Multimodal.sampleFrames(frames, 2).collect()
    assert(sampled.forall(_.frameIdx % 2 == 0))
    assert(sampled.count(_.media_id == "m1") === 2)
  }

  test("frameFeatures emits normalized histograms of the right shape") {
    val frames = Multimodal.decodeFrames(media, new Multimodal.FakeDecoder(1, 4))
    val feats = Multimodal.frameFeatures(frames).collect()
    feats.foreach { r =>
      val v = r.getSeq[Float](r.fieldIndex("features"))
      assert(v.length === 16)
      assert(math.abs(v.sum - 1.0f) < 1e-5)
    }
  }

  test("X24 dominantColors: pixel-share-ordered hex palette, crafted frame") {
    import Multimodal.DecodedFrame
    // RGB triples, levels=4 (bin centers 32/96/160/224):
    // 4 px of (200,30,20) → bins (3,0,0) → "#e02020"
    // 2 px of (10,20,220) → bins (0,0,3) → "#2020e0"
    // 1 px of (100,100,100) → bins (1,1,1) → "#606060"
    val px = (Seq.fill(4)(Seq(200, 30, 20)) ++ Seq.fill(2)(Seq(10, 20, 220)) ++
      Seq(Seq(100, 100, 100))).flatten.map(_.toByte).toArray
    val frames = Seq(DecodedFrame("art1", 0, 7, 1, px)).toDS()
    val palette = Multimodal.dominantColors(frames, k = 8, levels = 4)
      .select("palette").as[Seq[String]].collect()(0)
    assert(palette === Seq("#e02020", "#2020e0", "#606060"))
  }

  test("X24 dominantColors: counts merge across frames; ties break by bin desc") {
    import Multimodal.DecodedFrame
    val red = Seq(240, 16, 16).map(_.toByte).toArray   // bin (3,0,0)
    val blue = Seq(16, 16, 240).map(_.toByte).toArray  // bin (0,0,3)
    val frames = Seq(
      DecodedFrame("m", 0, 1, 1, red), DecodedFrame("m", 1, 1, 1, blue))
      .toDS()
    val palette = Multimodal.dominantColors(frames, k = 2, levels = 4)
      .select("palette").as[Seq[String]].collect()(0)
    // equal counts → higher bin id first (red bin 48 > blue bin 3),
    // mirroring the reference's reverse-sorted (count, index) ties
    assert(palette === Seq("#e02020", "#2020e0"))
  }

  test("S19/X24 octreePalette: adaptive shades where the fixed grid collapses to one bin") {
    import Multimodal.DecodedFrame
    // a dark-red gradient living entirely inside ONE levels=4 grid
    // cell (r ∈ [0,64), g=b=0): the fixed-bin palette is a single
    // color; the octree still separates k shades — the exact gap the
    // reference's adaptive quantize closes
    val px = Array.tabulate[Byte](64 * 3) { i =>
      if (i % 3 == 0) (i / 3).toByte else 0.toByte
    }
    val frames = Seq(DecodedFrame("g", 0, 64, 1, px)).toDS()
    val fixed = Multimodal.dominantColors(frames, k = 8, levels = 4)
      .select("palette").as[Seq[String]].collect()(0)
    assert(fixed.length === 1)
    val octree = Multimodal.octreePalette(frames, k = 8)
      .select("palette").as[Seq[String]].collect()(0)
    assert(octree.length === 8)
    assert(octree.distinct.length === 8)
    // every emitted color is a red shade from the gradient's range
    octree.foreach { hex =>
      assert(hex.endsWith("0000") && hex.startsWith("#"))
      assert(Integer.parseInt(hex.substring(1, 3), 16) < 64)
    }
  }

  test("S19/X24 octreePalette: share order, merged means, probe resample") {
    import Multimodal.DecodedFrame
    // two tight clusters, red 3x the pixels of blue: palette leads
    // with the red mean, and within-cluster variation merges to means
    val reds = Seq.fill(12)(Seq(200, 10, 10)) ++ Seq.fill(6)(Seq(204, 10, 10))
    val blues = Seq.fill(6)(Seq(10, 10, 200))
    val px = (reds ++ blues).flatten.map(_.toByte).toArray
    val frames = Seq(DecodedFrame("c", 0, 24, 1, px)).toDS()
    val palette = Multimodal.octreePalette(frames, k = 2)
      .select("palette").as[Seq[String]].collect()(0)
    assert(palette.length === 2)
    // red cluster mean: (12*200 + 6*204)/18 = 201 = 0xc9
    assert(palette(0) === "#c90a0a")
    assert(palette(1) === "#0a0ac8")
    // oversized frames resample to the probe edge first: a 200-wide
    // frame of one solid color still quantizes (and stays one color)
    val wide = Array.fill(200 * 3)(50.toByte)
    val solid = Multimodal.octreePalette(
        Seq(DecodedFrame("w", 0, 200, 1, wide)).toDS(), k = 8)
      .select("palette").as[Seq[String]].collect()(0)
    assert(solid === Seq("#323232"))
  }

  test("resizeFrames: nearest-neighbor downscale has known pixels") {
    import Multimodal.DecodedFrame
    // 4x4 gradient: pixel (x,y) = y*4+x; 2x2 NN → samples (0,0),(2,0),(0,2),(2,2)
    val px = Array.tabulate[Byte](16)(_.toByte)
    val frames = Seq(DecodedFrame("m", 0, 4, 4, px)).toDS()
    val out = Multimodal.resizeFrames(frames, 2, 2).collect()(0)
    assert(out.width === 2 && out.height === 2)
    assert(out.pixels.toSeq === Seq[Byte](0, 2, 8, 10))
  }

  test("executeResizePlan: full decode → ladder → resample chain") {
    import Multimodal.DecodedFrame
    val m = Seq(("a", 600, 300)).toDF("media_id", "w", "h")
      .select(col("media_id"), struct(lit("image/png").as("mime"),
        col("w").as("width"), col("h").as("height"),
        lit(null).cast("long").as("durationMs"),
        lit(null).cast("string").as("codec")).as("meta"))
    val plan = Multimodal.resizePlan(m) // targets 120, 300 (no upscale to 600→600x300 kept)
    val frames = Seq(DecodedFrame("a", 0, 600, 300,
      Array.tabulate[Byte](600 * 300)(i => (i % 251).toByte))).toDS()
    val out = Multimodal.executeResizePlan(frames, plan)
      .select("target", "width", "height")
      .collect().map(r => (r.getInt(0), r.getInt(1), r.getInt(2))).toSet
    assert(out.contains((120, 120, 60)))
    assert(out.contains((300, 300, 150)))
    val pxLens = Multimodal.executeResizePlan(frames, plan)
      .select("width", "height", "pixels").collect()
    pxLens.foreach(r =>
      assert(r.getAs[Array[Byte]](2).length === r.getInt(0) * r.getInt(1)))
  }

  test("resizePlan: ladder, aspect ratio, no upscale") {
    val m = Seq(("a", 600, 300), ("b", 100, 200)).toDF("media_id", "w", "h")
      .select(col("media_id"), struct(lit("image/png").as("mime"),
        col("w").as("width"), col("h").as("height"),
        lit(null).cast("long").as("durationMs"),
        lit(null).cast("string").as("codec")).as("meta"))
    val plan = Multimodal.resizePlan(m)
      .select("media_id", "target", "out_w", "out_h").collect()
      .map(r => (r.getString(0), r.getInt(1), r.getInt(2), r.getInt(3))).toSet
    // ("a" 600x300): targets 120,300,600 → (120,60),(300,150),(600,300)
    assert(plan.contains(("a", 120, 120, 60)))
    assert(plan.contains(("a", 600, 600, 300)))
    // ("b" 100x200): only 120 ≤ max(100,200) → (60,120); 300/600 dropped
    assert(plan.contains(("b", 120, 60, 120)))
    assert(!plan.exists(p => p._1 == "b" && p._2 > 200))
  }
  // --- S19 real decode: javax.imageio end-to-end ---------------------

  /** Encode a solid/striped test image to real PNG/JPEG bytes in-JVM. */
  private def encodeImage(w: Int, h: Int, fmt: String)(rgb: (Int, Int) => Int): Array[Byte] = {
    val img = new java.awt.image.BufferedImage(w, h,
      java.awt.image.BufferedImage.TYPE_INT_RGB)
    for (y <- 0 until h; x <- 0 until w) img.setRGB(x, y, rgb(x, y))
    val bos = new java.io.ByteArrayOutputStream()
    assert(javax.imageio.ImageIO.write(img, fmt, bos), s"no $fmt writer")
    bos.toByteArray
  }

  test("S19 ImageIODecoder decodes real PNG bytes to exact RGB pixels") {
    // left half pure red, right half pure blue — lossless in PNG
    val png = encodeImage(8, 4, "png")((x, _) => if (x < 4) 0xFF0000 else 0x0000FF)
    val jpegLike = encodeImage(6, 6, "png")((_, y) => if (y < 3) 0x00FF00 else 0x000000)
    val mediaDf = Multimodal.asMediaTable(
      Seq(("p1", png), ("p2", jpegLike), ("bad", Array[Byte](1, 2, 3)),
        ("nul", null.asInstanceOf[Array[Byte]])).toDF("id", "bytes"),
      "id", "bytes", "image/png")
    val frames = Multimodal.decodeFrames(mediaDf, new Multimodal.ImageIODecoder)
      .collect().sortBy(_.media_id)
    // corrupt + null payloads skipped, not fatal
    assert(frames.map(_.media_id).toSeq === Seq("p1", "p2"))
    val f1 = frames(0)
    assert((f1.width, f1.height) === (8, 4))
    assert(f1.pixels.length === 8 * 4 * 3)
    val (r0, g0, b0) = (f1.pixels(0) & 0xFF, f1.pixels(1) & 0xFF, f1.pixels(2) & 0xFF)
    assert((r0, g0, b0) === (255, 0, 0))
    val o = (0 * 8 + 7) * 3 // top-right pixel
    assert((f1.pixels(o) & 0xFF, f1.pixels(o + 1) & 0xFF, f1.pixels(o + 2) & 0xFF)
      === (0, 0, 255))
  }

  test("S19 WavDecoder decodes real PCM WAV; audioRms recovers the sine level") {
    // hand-built canonical 44-byte PCM WAV: 16-bit mono 8 kHz,
    // 2048 samples of a −6 dBFS 440 Hz sine
    val sampleRate = 8000; val n = 2048; val amp = 16384
    val pcm = new Array[Byte](n * 2)
    (0 until n).foreach { i =>
      val s = (amp * math.sin(2 * math.Pi * i * 440.0 / sampleRate)).toInt.toShort
      pcm(2 * i) = (s & 0xFF).toByte
      pcm(2 * i + 1) = ((s >> 8) & 0xFF).toByte
    }
    val bb = java.nio.ByteBuffer.allocate(44 + pcm.length)
      .order(java.nio.ByteOrder.LITTLE_ENDIAN)
    bb.put("RIFF".getBytes("US-ASCII")); bb.putInt(36 + pcm.length)
    bb.put("WAVE".getBytes("US-ASCII"))
    bb.put("fmt ".getBytes("US-ASCII")); bb.putInt(16)
    bb.putShort(1); bb.putShort(1) // PCM, mono
    bb.putInt(sampleRate); bb.putInt(sampleRate * 2) // byte rate
    bb.putShort(2); bb.putShort(16) // block align, bits
    bb.put("data".getBytes("US-ASCII")); bb.putInt(pcm.length); bb.put(pcm)
    val wav = bb.array()

    val dec = new Multimodal.WavDecoder(samplesPerFrame = 1024)
    val frames = dec.decode("a.wav", wav).toSeq
    assert(frames.map(_.frameIdx) === Seq(0, 1)) // 2048 / 1024 windows
    assert(frames.forall(f => f.width === 1024 && f.height === 1))
    assert(frames.head.pixels.length === 2048)
    // compressed/corrupt/null payloads skip, not fail
    assert(dec.decode("junk", Array[Byte](1, 2, 3)).isEmpty)
    assert(dec.decode("nul", null).isEmpty)

    // distributed: RMS of a sine = amp/√2 → −9.03 dBFS
    val rms = Multimodal.audioRms(spark.createDataset(frames))
      .collect().map(r => (r.getInt(1), r.getDouble(2), r.getDouble(3)))
      .sortBy(_._1)
    val expected = amp / math.sqrt(2) / 32768.0
    rms.foreach { case (_, r, db) =>
      assert(math.abs(r - expected) < 0.005, s"rms $r vs $expected")
      assert(math.abs(db - 20 * math.log10(expected)) < 0.2)
    }

    // big-endian AIFF of the SAME sine: the decoder must normalize to
    // 16-bit LE before the sample math — unswapped bytes would read
    // as noise and the recovered level would be wildly wrong
    import javax.sound.sampled.{AudioFileFormat, AudioFormat, AudioInputStream, AudioSystem}
    val bePcm = new Array[Byte](n * 2)
    (0 until n).foreach { i =>
      val s = (amp * math.sin(2 * math.Pi * i * 440.0 / sampleRate)).toInt.toShort
      bePcm(2 * i) = ((s >> 8) & 0xFF).toByte // high byte first
      bePcm(2 * i + 1) = (s & 0xFF).toByte
    }
    val beFmt = new AudioFormat(AudioFormat.Encoding.PCM_SIGNED,
      sampleRate.toFloat, 16, 1, 2, sampleRate.toFloat, true)
    val baos = new java.io.ByteArrayOutputStream()
    AudioSystem.write(
      new AudioInputStream(new java.io.ByteArrayInputStream(bePcm), beFmt, n),
      AudioFileFormat.Type.AIFF, baos)
    val aiffFrames = dec.decode("b.aiff", baos.toByteArray).toSeq
    assert(aiffFrames.length === 2)
    val beRms = Multimodal.audioRms(spark.createDataset(aiffFrames))
      .collect().map(_.getDouble(2))
    beRms.foreach(r => assert(math.abs(r - expected) < 0.005,
      s"AIFF rms $r vs $expected — endianness not normalized"))
  }

  test("S19 ImageIODecoder decodes JPEG (lossy: dims exact, color approximate)") {
    val jpg = encodeImage(16, 12, "jpg")((_, _) => 0xC82014)
    val mediaDf = Multimodal.asMediaTable(
      Seq(("j1", jpg)).toDF("id", "bytes"), "id", "bytes", "image/jpeg")
    val f = Multimodal.decodeFrames(mediaDf, new Multimodal.ImageIODecoder)
      .collect()(0)
    assert((f.width, f.height) === (16, 12))
    // lossy codec: each channel within a tolerance of the encoded color
    val (r, g, b) = (f.pixels(0) & 0xFF, f.pixels(1) & 0xFF, f.pixels(2) & 0xFF)
    assert(math.abs(r - 0xC8) <= 16 && math.abs(g - 0x20) <= 16 &&
      math.abs(b - 0x14) <= 16)
  }

  test("S19 end-to-end on real bytes: decode → resize ladder → dominant colors") {
    // 64×32, left 3/4 red-ish, right 1/4 blue-ish
    val png = encodeImage(64, 32, "png")((x, _) => if (x < 48) 0xE01010 else 0x1010E0)
    val mediaDf = Multimodal.asMediaTable(
        Seq(("art", png)).toDF("id", "bytes"), "id", "bytes", "image/png")
      .withColumn("meta", struct(col("meta.mime"),
        lit(64).as("width"), lit(32).as("height"),
        col("meta.durationMs"), col("meta.codec")))
    val frames = Multimodal.decodeFrames(mediaDf, new Multimodal.ImageIODecoder)
    // full ladder over real decoded pixels (channels=3: RGB triples)
    val plan = Multimodal.resizePlan(mediaDf, targets = Seq(16, 32))
    val resized = Multimodal.executeResizePlan(frames, plan, channels = 3)
      .collect().map(r => (r.getAs[Int]("target"),
        (r.getAs[Int]("width"), r.getAs[Int]("height"),
          r.getAs[Array[Byte]]("pixels").length))).toMap
    assert(resized(16) === ((16, 8, 16 * 8 * 3)))  // aspect preserved
    assert(resized(32) === ((32, 16, 32 * 16 * 3)))
    // palette share order from the real decode: red bin then blue bin
    val palette = Multimodal.dominantColors(frames, k = 2, levels = 4)
      .select("palette").as[Seq[String]].collect()(0)
    assert(palette === Seq("#e02020", "#2020e0"))
  }
}

class ExternalProcessSpec extends SparkSpec {
  import spark.implicits._

  test("runPerRow distributes commands and collects outputs") {
    val runner = new ExternalProcess.RecordingRunner(argv =>
      ExternalProcess.Result(0, s"ok:${argv.last}", ""))
    val cmds = Seq(("t1", Seq("ffprobe", "a.flac")),
      ("t2", Seq("ffprobe", "b.flac"))).toDS()
    val got = ExternalProcess.runPerRow(cmds, runner).collect()
      .map(o => o.key -> o.stdout).toMap
    assert(got === Map("t1" -> "ok:a.flac", "t2" -> "ok:b.flac"))
  }

  test("runFusedPerKey: one fused invocation per key, deterministic order") {
    val runner = new ExternalProcess.RecordingRunner(argv =>
      ExternalProcess.Result(0, argv.mkString("|"), ""))
    val rungs = Seq(
      ("trackA", Seq("ffmpeg", "-i", "a.flac", "-b:a", "128k", "a128.m4s")),
      ("trackA", Seq("ffmpeg", "-i", "a.flac", "-b:a", "64k", "a64.m4s")),
      ("trackB", Seq("ffmpeg", "-i", "b.flac", "-b:a", "64k", "b64.m4s")))
      .toDS()
    // fuse: shared decode flags from the first rung, then every rung's
    // output clause — the single-decode multi-output ffmpeg form
    val out = ExternalProcess.runFusedPerKey(rungs, runner) { argvs =>
      argvs.head.take(3) ++ argvs.flatMap(_.drop(3))
    }.collect().map(o => o.key -> o.stdout).toMap
    // one OUTPUT (= one subprocess) per key, not per rung; the echoed
    // argv proves both rungs ran inside trackA's single invocation,
    // sorted (128k before 64k lexicographically) → deterministic
    assert(out.size === 2)
    assert(out("trackA") ===
      "ffmpeg|-i|a.flac|-b:a|128k|a128.m4s|-b:a|64k|a64.m4s")
    assert(out("trackB") === "ffmpeg|-i|b.flac|-b:a|64k|b64.m4s")
  }

  test("CommandRunner runs a real subprocess and reports exit codes") {
    val r = new ExternalProcess.CommandRunner()
    val ok = r.run(Seq("sh", "-c", "printf hello"))
    assert(ok.exitCode === 0 && ok.stdout === "hello")
    val fail = r.run(Seq("sh", "-c", "exit 3"))
    assert(fail.exitCode === 3)
  }

  test("CommandRunner captures stderr and feeds stdin") {
    val r = new ExternalProcess.CommandRunner()
    val e = r.run(Seq("sh", "-c", "echo out; echo err >&2; exit 2"))
    assert(e.exitCode === 2 && e.stdout === "out\n" && e.stderr === "err\n")
    val s = r.run(Seq("cat"), Some("piped".getBytes("UTF-8")))
    assert(s.exitCode === 0 && s.stdout === "piped")
  }

  test("CommandRunner timeout fires on a hung child and kills it") {
    val r = new ExternalProcess.CommandRunner(timeoutSec = 1)
    val t0 = System.nanoTime()
    val res = r.run(Seq("sh", "-c", "sleep 600"))
    val elapsedSec = (System.nanoTime() - t0) / 1e9
    assert(res.exitCode === -1)
    assert(res.stderr.contains("timeout"))
    assert(elapsedSec < 30) // killed, not waited out
  }

  test("CommandRunner drains interleaved stdout/stderr beyond the pipe buffer") {
    // stderr fills its 64 KiB pipe while stdout still has data coming:
    // a sequential read-stdout-then-stderr runner deadlocks here.
    val r = new ExternalProcess.CommandRunner()
    val script = "i=0; while [ $i -lt 8 ]; do " +
      "head -c 65536 /dev/zero | tr '\\0' a; " +
      "head -c 65536 /dev/zero | tr '\\0' b >&2; " +
      "i=$((i+1)); done"
    val res = r.run(Seq("sh", "-c", script))
    assert(res.exitCode === 0)
    assert(res.stdout.length === 8 * 65536 && res.stdout.forall(_ == 'a'))
    assert(res.stderr.length === 8 * 65536 && res.stderr.forall(_ == 'b'))
  }

  // --- round 13: SubprocessDecoder (VERDICT r12 item 5 — the E1-E5
  // harness composed with the Decoder interface) ---------------------

  /** Canonical 16-bit mono 8 kHz PCM WAV with an amplitude-modulated
    * sine — adjacent RMS windows differ strongly, so the envelope
    * signature is information-bearing, not all-zero. */
  private def amWav(nWindows: Int): Array[Byte] = {
    val spw = 1024; val sampleRate = 8000
    val n = nWindows * spw
    val pcm = new Array[Byte](n * 2)
    (0 until n).foreach { i =>
      val w = i / spw
      val amp = 3000.0 + 2500.0 * math.sin(0.9 * w)
      val s = (amp * math.sin(2 * math.Pi * i * 440.0 / sampleRate)).toInt
      pcm(2 * i) = (s & 0xFF).toByte
      pcm(2 * i + 1) = ((s >> 8) & 0xFF).toByte
    }
    val bb = java.nio.ByteBuffer.allocate(44 + pcm.length)
      .order(java.nio.ByteOrder.LITTLE_ENDIAN)
    bb.put("RIFF".getBytes("US-ASCII")); bb.putInt(36 + pcm.length)
    bb.put("WAVE".getBytes("US-ASCII"))
    bb.put("fmt ".getBytes("US-ASCII")); bb.putInt(16)
    bb.putShort(1); bb.putShort(1)
    bb.putInt(sampleRate); bb.putInt(sampleRate * 2)
    bb.putShort(2); bb.putShort(16)
    bb.put("data".getBytes("US-ASCII")); bb.putInt(pcm.length); bb.put(pcm)
    bb.array()
  }

  private def gzipped(raw: Array[Byte]): Array[Byte] = {
    val bos = new java.io.ByteArrayOutputStream()
    val gz = new java.util.zip.GZIPOutputStream(bos)
    gz.write(raw); gz.close()
    bos.toByteArray
  }

  test("SubprocessDecoder: compressed bytes -> real gzip subprocess -> PCM -> audioRms -> envelope signature, equal to the direct WAV path") {
    import spark.implicits._
    val wav = amWav(62)
    // gzip stands in for the codec container: a REAL compression
    // format decoded by a REAL subprocess on the executors — the
    // ffmpeg/FLAC path below runs the identical composition when the
    // environment ships a transcoder binary
    val gzDecoder = new Multimodal.SubprocessDecoder(
      Seq("gzip", "-dc"), new Multimodal.WavDecoder(1024))
    def sigOf(bytes: Array[Byte], dec: Multimodal.Decoder): Map[String, Long] =
      graft.operators.MediaDedup.audioEnvelopeSig(Multimodal.audioRms(
        Multimodal.decodeFrames(Multimodal.asMediaTable(
          Seq(("m1", bytes)).toDF("id", "bytes"),
          "id", "bytes", "audio/x-test"), dec)))
        .collect().map(r => (r.getString(0), r.getLong(1))).toMap
    val viaSubprocess = sigOf(gzipped(wav), gzDecoder)
    val direct = sigOf(wav, new Multimodal.WavDecoder(1024))
    assert(direct.nonEmpty && direct("m1") != 0L)
    assert(viaSubprocess === direct)
  }

  test("SubprocessDecoder corrupt-blob contract: nonzero exit, garbage payload, and null all yield zero frames") {
    val dec = new Multimodal.SubprocessDecoder(
      Seq("gzip", "-dc"), new Multimodal.WavDecoder(1024))
    // garbage bytes: gzip exits nonzero -> zero frames, task survives
    assert(dec.decode("bad", Array[Byte](1, 2, 3)).isEmpty)
    assert(dec.decode("nul", null).isEmpty)
    // command that always fails
    val failing = new Multimodal.SubprocessDecoder(
      Seq("false"), new Multimodal.WavDecoder(1024))
    assert(failing.decode("m", amWav(3)).isEmpty)
    // binary that doesn't EXIST (round-13 review: the launch throw
    // must degrade to zero frames, not fail the task — registry
    // probing is driver-side, decode runs on executors whose image
    // may differ)
    val missing = new Multimodal.SubprocessDecoder(
      Seq("/nonexistent/transcoder-binary"),
      new Multimodal.WavDecoder(1024))
    assert(missing.decode("m", amWav(3)).isEmpty)
    // transcode succeeded but emitted a non-WAV container: the inner
    // decoder's own corrupt contract kicks in
    val passthrough = new Multimodal.SubprocessDecoder(
      Seq("cat"), new Multimodal.WavDecoder(1024))
    assert(passthrough.decode("txt",
      "not a wav at all".getBytes("UTF-8")).isEmpty)
  }

  test("compressedAudioDecoder registry: real FLAC/ffmpeg transcode when the environment ships one (LOUD skip otherwise)") {
    // the registry probes PATH; this container ships no transcoder,
    // so the test CANCELS by name instead of silently passing — on a
    // box with ffmpeg or flac it encodes the fixture and runs the
    // full decode -> PCM -> envelope chain against the direct path
    assume(Multimodal.compressedAudioDecoder().isDefined,
      "no ffmpeg/flac on PATH — the SubprocessDecoder composition is " +
        "covered by the real-gzip test above; install a transcoder " +
        "to exercise the codec registry end-to-end")
    val wav = amWav(62)
    val enc = new ExternalProcess.CommandRunner()
    // encode WAV -> FLAC with whichever tool exists
    val flacBytes =
      if (Multimodal.binaryOnPath("ffmpeg"))
        enc.runBinary(Seq("ffmpeg", "-v", "error", "-i", "-",
          "-f", "flac", "-"), Some(wav)).stdout
      else
        enc.runBinary(Seq("flac", "-cs", "-"), Some(wav)).stdout
    assert(flacBytes.nonEmpty)
    val dec = Multimodal.compressedAudioDecoder().get
    val frames = dec.decode("f1", flacBytes).toSeq
    val direct = new Multimodal.WavDecoder(1024).decode("f1", wav).toSeq
    assert(frames.map(_.frameIdx) === direct.map(_.frameIdx))
  }
}
