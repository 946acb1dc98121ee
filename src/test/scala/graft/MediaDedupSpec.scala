package graft

import graft.domain.Multimodal
import graft.domain.Multimodal.DecodedFrame
import graft.operators.MediaDedup
import org.apache.spark.sql.functions._

/** Multimodal near-dup: perceptual dHash + banded hamming pairing
  * (q83's operator surface) and the audio envelope twin — including
  * the REAL codec paths (PNG via ImageIO, WAV via the JDK sound
  * stack) the SQL oracle cannot exercise.
  */
class MediaDedupSpec extends SparkSpec {
  import spark.implicits._

  // --- signature properties -----------------------------------------

  test("dHash60 is exactly invariant to uniform brightness shift") {
    val w = 44; val h = 24
    val base = Array.tabulate[Byte](w * h)(i => ((i * 7 + i / w * 13) % 200).toByte)
    val brighter = base.map(b => ((b & 0xFF) + 20).toByte)
    val s1 = MediaDedup.dHash60(base, w, h)
    assert(s1 >= 0L && s1 < (1L << 60))
    assert(MediaDedup.dHash60(brighter, w, h) === s1)
  }

  test("dHash60 handles RGB via integer luma and skips unusable frames") {
    val w = 22; val h = 12
    val gray = Array.tabulate[Byte](w * h)(i => ((i * 31) % 256).toByte)
    // RGB frame whose luma equals the gray frame exactly (r=g=b)
    val rgb = new Array[Byte](w * h * 3)
    gray.zipWithIndex.foreach { case (g, i) =>
      rgb(3 * i) = g; rgb(3 * i + 1) = g; rgb(3 * i + 2) = g
    }
    assert(MediaDedup.dHash60(rgb, w, h) === MediaDedup.dHash60(gray, w, h))
    // unusable: null, too small for the grid, misshapen buffer
    assert(MediaDedup.dHash60(null, w, h) === -1L)
    assert(MediaDedup.dHash60(gray, 10, 5) === -1L)
    assert(MediaDedup.dHash60(new Array[Byte](17), w, h) === -1L)
    // imageDHash drops them (no sentinel banding)
    val frames = Seq(
      DecodedFrame("ok", 0, w, h, gray),
      DecodedFrame("bad", 0, w, h, new Array[Byte](17))).toDS()
    assert(MediaDedup.imageDHash(frames).select("media_id")
      .as[String].collect().toSeq === Seq("ok"))
  }

  // --- planted-dup recall on the q83 synthetic corpus ---------------

  test("q83 corpus: pigeonhole recall is total within hamming 3; no cross-parent pairs") {
    val ids = (0 until 200).map(_.toString)
    val frames = MediaDedup.syntheticFrameCorpus(ids.toDS())
    val pairs = MediaDedup.hammingPairs(MediaDedup.imageDHash(frames))
      .collect().map(r => (r.getString(0), r.getString(1), r.getInt(2)))
    val found = pairs.map(p => (p._1, p._2)).toSet
    // ground truth from the signature definition itself
    val variants = ids.filter(MediaDedup.hasVariant)
    assert(variants.size > 20, "planted rate should be ~19%")
    val within3 = variants.filter { id =>
      val a = MediaDedup.dHash60(MediaDedup.syntheticPixels(id),
        MediaDedup.FrameW, MediaDedup.FrameH)
      val b = MediaDedup.dHash60(
        MediaDedup.perturbedPixels(id, s"$id~v"),
        MediaDedup.FrameW, MediaDedup.FrameH)
      java.lang.Long.bitCount(a ^ b) <= 3
    }
    // 4×15 pigeonhole: every true ≤3 pair MUST appear (recall 1.0)
    within3.foreach(id => assert(found.contains((id, s"$id~v")),
      s"planted pair $id missing"))
    // the perturbation is a real cut: most variants land within 3
    assert(within3.size >= (variants.size * 8) / 10)
    // unrelated frames sit near hamming 30 — no cross-parent pairs
    assert(pairs.forall { case (a, b, _) => b == s"$a~v" })
  }

  test("stricter maxHamming cuts are accepted and nest (review r9 relaxation)") {
    val ids = (0 until 120).map(_.toString)
    val sigs = MediaDedup.imageDHash(
      MediaDedup.syntheticFrameCorpus(ids.toDS()))
    def pairsAt(h: Int) = MediaDedup.hammingPairs(sigs, maxHamming = h)
      .collect().map(r => (r.getString(0), r.getString(1), r.getInt(2))).toSet
    val p3 = pairsAt(3)
    val p1 = pairsAt(1)
    // nested: the hamming-1 set is exactly the <=1 slice of hamming-3
    assert(p1 === p3.filter(_._3 <= 1))
    assert(p1.size < p3.size, "the stricter cut must actually cut")
    // out of range still fails loudly
    val e = intercept[IllegalArgumentException](pairsAt(4))
    assert(e.getMessage.contains("hamming <= 3"))
  }

  // --- real PNG end-to-end (decode → dHash → pairs) ------------------

  private def encodePng(w: Int, h: Int)(rgb: (Int, Int) => Int): Array[Byte] = {
    val img = new java.awt.image.BufferedImage(w, h,
      java.awt.image.BufferedImage.TYPE_INT_RGB)
    for (y <- 0 until h; x <- 0 until w) img.setRGB(x, y, rgb(x, y))
    val bos = new java.io.ByteArrayOutputStream()
    assert(javax.imageio.ImageIO.write(img, "png", bos), "no png writer")
    bos.toByteArray
  }

  test("imageNearDupPairs finds a brightened PNG re-encode; skips corrupt payloads") {
    def tex(seed: Int)(x: Int, y: Int): Int = {
      val v = (x * 7 + y * 13 + seed * 101) % 200
      (v << 16) | (v << 8) | v
    }
    val base = encodePng(64, 48)(tex(1))
    // +2 on every channel: luma shifts uniformly, dHash is identical
    val bright = encodePng(64, 48)((x, y) => tex(1)(x, y) + 0x020202)
    val other = encodePng(64, 48)(tex(2))
    val media = Multimodal.asMediaTable(
      Seq(("img_a", base), ("img_a2", bright), ("img_b", other),
        ("img_corrupt", Array[Byte](9, 9, 9))).toDF("id", "bytes"),
      "id", "bytes", "image/png")
    val pairs = MediaDedup
      .imageNearDupPairs(media, new Multimodal.ImageIODecoder)
      .collect().map(r => (r.getString(0), r.getString(1), r.getInt(2)))
    assert(pairs.toSeq === Seq(("img_a", "img_a2", 0)))
  }

  // --- audio envelope near-dup ---------------------------------------

  /** Canonical 16-bit mono PCM WAV with an amplitude-modulated sine:
    * amp(window) = 3000 + 2500·sin(0.9·window) — adjacent windows
    * differ by far more than gain/shift noise. */
  private def wavBytes(nWindows: Int, gain: Double, shiftSamples: Int,
      phase: Double = 0.9): Array[Byte] = {
    val spw = 1024; val sampleRate = 8000
    val n = nWindows * spw
    val pcm = new Array[Byte](n * 2)
    (0 until n).foreach { i =>
      val src = i - shiftSamples
      val s =
        if (src < 0) 0
        else {
          val w = src / spw
          val amp = 3000.0 + 2500.0 * math.sin(phase * w)
          (gain * amp * math.sin(2 * math.Pi * src * 440.0 / sampleRate)).toInt
        }
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

  test("audioNearDupPairs pairs a gained+shifted re-encode; envelope sig is gain-invariant") {
    val orig = wavBytes(62, 1.0, 0)
    // half gain + 100-sample shift: the planted near-dup
    val dup = wavBytes(62, 0.5, 100)
    // different modulation: unrelated
    val other = wavBytes(62, 1.0, 0, phase = 2.3)
    val media = Multimodal.asMediaTable(
      Seq(("au_a", orig), ("au_a2", dup), ("au_b", other),
        ("au_corrupt", Array[Byte](1, 2, 3))).toDF("id", "bytes"),
      "id", "bytes", "audio/wav")
    val pairs = MediaDedup.audioNearDupPairs(media)
      .collect().map(r => (r.getString(0), r.getString(1), r.getInt(2)))
    assert(pairs.map(p => (p._1, p._2)).toSeq === Seq(("au_a", "au_a2")))
    assert(pairs.head._3 <= 3)
    // pure gain (no shift) leaves the signature IDENTICAL
    val sigs = MediaDedup.audioEnvelopeSig(Multimodal.audioRms(
      Multimodal.decodeFrames(Multimodal.asMediaTable(
        Seq(("g1", orig), ("g2", wavBytes(62, 0.25, 0))).toDF("id", "bytes"),
        "id", "bytes", "audio/wav"), new Multimodal.WavDecoder(1024))))
      .collect().map(r => (r.getString(0), r.getLong(1))).toMap
    assert(sigs("g1") === sigs("g2"))
  }

  test("audioEnvelopeSig skips media shorter than two windows") {
    val short = wavBytes(1, 1.0, 0)
    val sigs = MediaDedup.audioEnvelopeSig(Multimodal.audioRms(
      Multimodal.decodeFrames(Multimodal.asMediaTable(
        Seq(("s1", short)).toDF("id", "bytes"), "id", "bytes", "audio/wav"),
        new Multimodal.WavDecoder(1024))))
    assert(sigs.count() === 0L)
  }

  test("videoContainmentPairs: trimmed re-encoded clip scores 1.0 from its side; unrelated video never pairs") {
    import graft.domain.Multimodal.DecodedFrame
    // video A: 10 deterministic frames; video B: frames 2..7 of A,
    // RE-ENCODED (brightness-perturbed — the near-dup model, mostly
    // within hamming 3 per frame); video C: 10 unrelated frames
    val frames =
      (0 until 10).map(i => DecodedFrame("vidA", i, MediaDedup.FrameW,
        MediaDedup.FrameH, MediaDedup.syntheticPixels(s"A:$i"))) ++
      (0 until 6).map(j => DecodedFrame("vidB", j, MediaDedup.FrameW,
        MediaDedup.FrameH,
        MediaDedup.perturbedPixels(s"A:${j + 2}", s"B:$j"))) ++
      (0 until 10).map(i => DecodedFrame("vidC", i, MediaDedup.FrameW,
        MediaDedup.FrameH, MediaDedup.syntheticPixels(s"C:$i")))
    val sigs = MediaDedup.imageDHash(frames.toDS())
    val got = MediaDedup.videoContainmentPairs(sigs,
        minContainment = 0.5)
      .collect().map(r => (r.getString(0), r.getString(1)) ->
        ((r.getLong(2), r.getLong(3), r.getLong(4), r.getLong(5),
          r.getDouble(6)))).toMap
    assert(got.keySet === Set(("vidA", "vidB")),
      s"only the planted sub-clip pairs: ${got.keySet}")
    val (aM, bM, aF, bF, cont) = got(("vidA", "vidB"))
    assert(aF === 10L && bF === 6L)
    // every B frame derives from an A frame; perturbation keeps most
    // within hamming 3 (a handful may honestly exceed it — the q83
    // disclosure), so the B-side coverage drives containment
    assert(bM >= 5L && bM <= 6L && aM === bM)
    assert(cont === math.rint(bM.toDouble / 6L * 1e6) / 1e6,
      "containment is the max coverage ratio — the trimmed side's, round-6")
    // sub-clip recall even though A-side coverage is only 0.5-0.6:
    // the max() rule is what makes trims findable
    assert(cont >= 0.8)
    // partitioning-proof
    val rep = MediaDedup.videoContainmentPairs(
      sigs.repartition(7), minContainment = 0.5).count()
    assert(rep === 1L)
  }

  test("crossModalDupGroups: image and audio edges close transitively; min-id survivor; singleton media keep") {
    // image modality: A ~ Av (near sigs); audio: A ~ Aa. The union
    // closure must collapse {A, Av, Aa} into ONE group even though
    // Av and Aa never pair directly in any single modality. B is in
    // the image set only and pairs with nothing; C is audio-only.
    val imgSigs = Seq(
      ("A", 0x0F0FL), ("Av", 0x0F0EL),             // hamming 1
      ("B", 0x7AAA900000000L))                     // far from both
      .toDF("media_id", "sig")
    val audSigs = Seq(
      ("A", 0x333CL), ("Aa", 0x333DL),             // hamming 1
      ("C", 0x5AA5A5000000L))
      .toDF("media_id", "sig")
    val out = MediaDedup.crossModalDupGroups(Seq(imgSigs, audSigs))
      .collect()
      .map(r => r.getString(0) -> ((r.getString(1), r.getLong(2),
        r.getBoolean(3)))).toMap
    assert(out.keySet === Set("A", "Av", "Aa", "B", "C"),
      "one row per distinct media across modalities")
    assert(out("A") === (("A", 3L, true)), "A survives its triple")
    assert(out("Av") === (("A", 3L, false)))
    assert(out("Aa") === (("A", 3L, false)))
    assert(out("B") === (("B", 1L, true)) && out("C") === (("C", 1L, true)))
    // partitioning-proof: the survivor window and closure are keyed,
    // not order-dependent
    val rep = MediaDedup.crossModalDupGroups(
      Seq(imgSigs.repartition(7), audSigs.repartition(5)))
      .collect()
      .map(r => r.getString(0) -> ((r.getString(1), r.getLong(2),
        r.getBoolean(3)))).toMap
    assert(rep === out)
  }
  test("crossModalDupGroups: planted mega-component elects one survivor skew-safely (no partition-buffering window)") {
    // the operator contract does not bound component size — a viral
    // media re-encoded everywhere makes one component corpus-shaped.
    // 200 identical signatures form one 200-member component dwarfing
    // everything else; the election must stay aggregation + hash join
    // (partial min/count collapse the component map-side), never a
    // WindowExec that would buffer the whole component on one task.
    val n = 200
    val mega = (0 until n).map(i => (f"m$i%03d", 12345L))
    val lone = Seq(("z0", 99999L), ("z1", 1L << 59))
    val sigs = (mega ++ lone).toDF("media_id", "sig")
    val got = MediaDedup.crossModalDupGroups(Seq(sigs))
    val rows = got.collect()
    val inMega = rows.filter(_.getAs[Long]("group_size") == n)
    assert(inMega.length === n)
    assert(inMega.forall(_.getAs[String]("group_id") == "m000"))
    assert(inMega.count(_.getAs[Boolean]("keep")) === 1)
    assert(rows.filter(_.getAs[String]("media_id").startsWith("z"))
      .forall(r => r.getAs[Long]("group_size") == 1L && r.getAs[Boolean]("keep")))
    val plan = got.queryExecution.executedPlan.toString
    assert(!plan.contains("Window"), s"partition-buffering window in:\n$plan")
    assert(plan.contains("ShuffledHashJoin") || plan.contains("BroadcastHashJoin"),
      s"expected a hash-join election in:\n$plan")
  }
  test("admitIncremental ≡ crossModalDupGroups over corpus ∪ batch (the media admission grid's batch cell)") {
    // corpus = the parent frames (pairwise non-dup at hamming 3 — the
    // q83-corpus spec above pins that, so the survivor-set
    // precondition holds by construction); batch = the planted "~v"
    // variants plus fresh novel ids
    val ids = (0 until 150).map(_.toString)
    val parentSigs = MediaDedup.imageDHash(
        MediaDedup.syntheticFrameCorpus(ids.toDS())
          .filter((f: DecodedFrame) => !f.media_id.endsWith("~v")))
      .select(col("media_id"), col("sig"))
    val batchSigs = MediaDedup.imageDHash(
        MediaDedup.syntheticFrameCorpus(ids.toDS())
          .filter((f: DecodedFrame) => f.media_id.endsWith("~v")))
      .select(col("media_id"), col("sig"))
      .unionByName(MediaDedup.imageDHash(MediaDedup.syntheticFrameCorpus(
        (1000 until 1020).map(_.toString).toDS())
        .filter((f: DecodedFrame) => !f.media_id.endsWith("~v")))
        .select(col("media_id"), col("sig")))
    val got = MediaDedup.admitIncremental(batchSigs, parentSigs)
      .select("media_id").as[String].collect().toSet
    // the batch twin: union dedup, keep fresh survivors whose group
    // holds no corpus member
    val union = parentSigs.unionByName(batchSigs)
    val groups = MediaDedup.crossModalDupGroups(Seq(union))
    val corpusGroups = groups
      .join(parentSigs.select(col("media_id")), Seq("media_id"), "left_semi")
      .select(col("group_id")).distinct()
    val twin = groups
      .join(batchSigs.select(col("media_id")), Seq("media_id"), "left_semi")
      .filter(col("keep"))
      .join(corpusGroups, Seq("group_id"), "left_anti")
      .select("media_id").as[String].collect().toSet
    assert(got === twin)
    // structure sanity: most variants reject against their parent,
    // the hamming>3 outliers and the 20 novel ids admit
    val novel = (1000 until 1020).map(_.toString).toSet
    assert(novel.subsetOf(got))
    val variants = ids.filter(MediaDedup.hasVariant).map(i => s"$i~v").toSet
    assert((variants -- got).size >= (variants.size * 7) / 10,
      "most planted variants must reject against the corpus")
  }
  test("admitIncrementalWide: the q94 statement at Sig120 — variants reject, novels admit, guard derives from the band width") {
    // the admission grid's media cell at the WIDE width (round 12 —
    // the q96 discipline; everything after banding is the SAME
    // admitTail as the 60-bit path, so this pins the width-specific
    // pieces: array banding, per-word popcount verify, 20-bit guard)
    val ids = (0 until 150).map(_.toString)
    def sigsOf(ds: org.apache.spark.sql.Dataset[String],
        variants: Boolean) =
      MediaDedup.imageDHashWide(MediaDedup.syntheticFrameCorpusWide(ds)
          .filter((f: DecodedFrame) => f.media_id.endsWith("~v") == variants))
        .select(col("media_id"), col("sig"))
    val parentSigs = sigsOf(ids.toDS(), variants = false)
    val batchSigs = sigsOf(ids.toDS(), variants = true)
      .unionByName(sigsOf((1000 until 1020).map(_.toString).toDS(),
        variants = false))
    val got = MediaDedup.admitIncrementalWide(batchSigs, parentSigs)
      .select("media_id").as[String].collect().toSet
    // novel ids never pair with the corpus — always admitted
    val novel = (1000 until 1020).map(_.toString).toSet
    assert(novel.subsetOf(got))
    // most planted variants reject against their parent at the wide
    // pigeonhole bound (hamming <= 5 over 120 bits)
    val variants = ids.filter(MediaDedup.hasVariant).map(i => s"$i~v").toSet
    assert((variants -- got).size >= (variants.size * 7) / 10,
      "most planted variants must reject against the corpus")
    // the occupancy guard reads the ACTUAL band space: a corpus that
    // saturates 15-bit bands (n >> 15 > bound) sits far inside the
    // 20-bit space (n >> 20 = 0 here) — same rows, no guard trip
    val many = spark.range(40000).select(
      concat(lit("s"), $"id").as("media_id"),
      array($"id", $"id" + 1, $"id" + 2, $"id" + 3, $"id" + 4, $"id" + 5)
        .as("sig"))
    intercept[IllegalArgumentException] {
      MediaDedup.admitIncremental(
        many.select($"media_id", $"sig"(0).as("sig")),
        many.select($"media_id", $"sig"(0).as("sig")),
        maxExpectedOccupancy = 1)
    }
    assert(MediaDedup.admitIncrementalWide(many, many,
      maxExpectedOccupancy = 1).columns.nonEmpty)
  }

  test("band-occupancy guard: signature-space saturation fails loudly, in-regime corpora pass") {
    // the fixed-signature scale contract (SCALE.md round 11): 60-bit
    // bands saturate at occupancy n/2^15 >> 1 — candidates grow
    // ~n^2/2^15 and the measured 100x frame corpus OOMs. The guard is
    // the requireBoundedCells analog: loud at the bound, overridable
    // where the cost is provisioned for.
    val many = spark.range(40000)
      .select(concat(lit("s"), $"id").as("media_id"), $"id".as("sig"))
    val e = intercept[IllegalArgumentException] {
      MediaDedup.hammingPairs(many, maxExpectedOccupancy = 0)
    }
    assert(e.getMessage.contains("occupancy"))
    // raising the bound explicitly is the provisioned-cost escape
    assert(MediaDedup.hammingPairs(many, maxExpectedOccupancy = 2)
      .columns.nonEmpty)
    // the admission entry carries the same guard over both sides
    val e2 = intercept[IllegalArgumentException] {
      MediaDedup.admitIncremental(many, many, maxExpectedOccupancy = 1)
    }
    assert(e2.getMessage.contains("occupancy"))
    // boundary arithmetic: occupancy = n >> 15 — exactly at the bound
    // passes, one band-space past it fails
    graft.operators.Lsh.requireBoundedBuckets("spec", 2L * 32768, 2)
    intercept[IllegalArgumentException] {
      graft.operators.Lsh.requireBoundedBuckets("spec", 3L * 32768, 2)
    }
  }

  // --- the WIDE signature family (round 12 — the q89 fix) -----------

  test("dHashWide at Sig60 word-splits dHash60 exactly; wide skip contract holds") {
    // one arithmetic, two emissions: the wide hash at the 60-bit
    // spec must reproduce dHash60's bits band-word for band-word
    val w = 44; val h = 24
    (0 until 8).foreach { i =>
      val px = MediaDedup.syntheticPixels(s"eq$i")
      val s60 = MediaDedup.dHash60(px, w, h)
      val words = MediaDedup.dHashWide(px, w, h, MediaDedup.Sig60)
      assert(words.length === 4)
      (0 until 4).foreach(b =>
        assert(words(b) === ((s60 >> (b * 15)) & 32767),
          s"band $b of frame eq$i"))
    }
    // unusable frames: null out (the -1L analog), dropped by the
    // dataset operator
    assert(MediaDedup.dHashWide(null, w, h, MediaDedup.Sig120) === null)
    assert(MediaDedup.dHashWide(new Array[Byte](17), 64, 32,
      MediaDedup.Sig120) === null)
    assert(MediaDedup.dHashWide(new Array[Byte](64), 8, 8,
      MediaDedup.Sig120) === null) // below the 16x8 grid
    val frames = Seq(
      Multimodal.DecodedFrame("ok", 0, 64, 32, new Array[Byte](64 * 32)),
      Multimodal.DecodedFrame("bad", 0, 64, 32, new Array[Byte](17))).toDS()
    assert(MediaDedup.imageDHashWide(frames).select("media_id")
      .as[String].collect().toSeq === Seq("ok"))
  }

  test("hammingPairsWide at Sig60 ≡ hammingPairs: the wide kernel is the 60-bit kernel with the width freed") {
    val ids = (0 until 300).map(i => s"p$i").toDS()
    val frames = MediaDedup.syntheticFrameCorpus(ids)
    val narrow = MediaDedup.hammingPairs(MediaDedup.imageDHash(frames))
      .select("a_id", "b_id", "hamming").collect().map(_.toSeq).toSet
    val wide = MediaDedup.hammingPairsWide(
        MediaDedup.imageDHashWide(frames, MediaDedup.Sig60),
        MediaDedup.Sig60, maxHamming = 3)
      .select("a_id", "b_id", "hamming").collect().map(_.toSeq).toSet
    assert(narrow.nonEmpty && wide === narrow)
  }

  test("wide video corpus: planted trimmed clips contained at Sig120's pigeonhole threshold; cross-parent never pairs") {
    val ids = (0 until 250).map(i => s"v$i").toDS()
    val got = MediaDedup.videoContainmentPairsWide(
        MediaDedup.imageDHashWide(MediaDedup.syntheticVideoCorpusWide(ids)))
      .collect().map(r => (r.getString(0), r.getString(1))).toSet
    val planted = (0 until 250).map(i => s"v$i")
      .filter(MediaDedup.hasVariant).map(i => (i, s"$i~t"))
    assert(planted.nonEmpty)
    // most planted clips are found (the measured h<=5 rate is ~97%
    // per frame; containment needs 2 of 4) — a few honestly miss
    val found = planted.count(got)
    assert(found >= (planted.size * 8) / 10,
      s"found $found of ${planted.size} planted clips")
    // nothing pairs across parents: every surviving pair is a
    // planted (parent, clip) pair
    assert(got.forall { case (a, b) => b == s"$a~t" })
  }

  test("wide guard: the occupancy bound derives from the band WIDTH — the n that saturates 15-bit bands is in-regime at 20") {
    // the q89 outage arithmetic: 3.4M signatures = occupancy 103 at
    // 2^15 (fails the default bound 64), occupancy 3 at 2^20 (passes)
    val n = 3400000L
    intercept[IllegalArgumentException] {
      graft.operators.Lsh.requireBoundedBuckets("spec", n, 64, bandBits = 15)
    }
    graft.operators.Lsh.requireBoundedBuckets("spec", n, 64, bandBits = 20)
    // and the wide entries thread it: 40000 signatures sit at
    // occupancy 1 in the 2^15 space (the 60-bit entry FAILS at
    // bound 0 — pinned in the guard test above) but occupancy 0 in
    // the 2^20 space, so the wide entry passes at the SAME bound —
    // the 32x-larger band space, demonstrated at one n
    val sigs = spark.range(40000).select(
      concat(lit("s"), $"id").as("media_id"),
      array($"id", $"id" + 1, $"id" + 2, $"id" + 3, $"id" + 4, $"id" + 5)
        .as("sig"))
    assert(MediaDedup.hammingPairsWide(sigs, MediaDedup.Sig120,
      maxExpectedOccupancy = 0).columns.nonEmpty)
    // the pigeonhole require: maxHamming past bands-1 is refused
    val e = intercept[IllegalArgumentException] {
      MediaDedup.hammingPairsWide(sigs, MediaDedup.Sig120, maxHamming = 6)
    }
    assert(e.getMessage.contains("pigeonhole"))
    // width mismatch FAILS LOUDLY (round-12 review): a 4-word
    // (Sig60-shaped) relation reaching a Sig120 entry would
    // otherwise make the per-word hamming NULL — verify filters
    // silently drop pairs, stream anti-joins admit everything
    val narrow = spark.range(10).select(
      concat(lit("n"), $"id").as("media_id"),
      array($"id", $"id" + 1, $"id" + 2, $"id" + 3).as("sig"))
    val we = intercept[Exception] {
      MediaDedup.hammingPairsWide(narrow, MediaDedup.Sig120,
        maxExpectedOccupancy = 64).count()
    }
    assert(we.getMessage.contains("band words"), we.getMessage)
  }

  test("audioEnvelopeSigWide: Sig60 word-splits audioEnvelopeSig exactly; Sig120 words match brute-force gradients; skip contract holds") {
    // deterministic envelopes: m1 has all 121 windows (the full
    // Sig120 domain), m2 only 61 (upper bits must stay 0 — the
    // 60-bit family's own short-media behavior), s1 one window
    // (skipped: nothing to compare)
    def rms(id: String, n: Int) = (0 until n).map(k =>
      (id, k, ((k * 37 + 11 * id.hashCode.abs % 13) % 97) / 100.0))
    val env = (rms("m1", 121) ++ rms("m2", 61) ++ rms("s1", 1))
      .toDF("media_id", "frameIdx", "rms")
    // Sig60 parity: the wide sig at the legacy spec IS the legacy
    // long, word-split 4 x 15
    val legacy = MediaDedup.audioEnvelopeSig(env)
      .collect().map(r => r.getString(0) -> r.getLong(1)).toMap
    val wide60 = MediaDedup.audioEnvelopeSigWide(env, MediaDedup.Sig60)
      .collect().map(r => r.getString(0) -> r.getSeq[Long](1)).toMap
    assert(wide60.keySet === legacy.keySet)
    wide60.foreach { case (id, words) =>
      assert(words === (0 until 4).map(b => (legacy(id) >> (b * 15)) & 32767),
        s"$id: Sig60 words must split the legacy long")
    }
    // Sig120: brute force from the same envelope values
    val wide = MediaDedup.audioEnvelopeSigWide(env, MediaDedup.Sig120)
      .collect().map(r => r.getString(0) -> r.getSeq[Long](1)).toMap
    assert(wide.keySet === Set("m1", "m2"), "s1 has nothing to compare")
    def brute(id: String, n: Int): Seq[Long] = {
      val v = rms(id, n).map(_._3)
      val words = Array.fill(6)(0L)
      (0 until math.min(120, n - 1)).foreach { k =>
        if (v(k + 1) > v(k)) words(k / 20) |= 1L << (k % 20)
      }
      words.toSeq
    }
    assert(wide("m1") === brute("m1", 121))
    assert(wide("m2") === brute("m2", 61))
    assert(wide("m2").drop(3).forall(_ === 0L),
      "a 61-window media leaves its upper bands 0")
  }

  test("crossModalDupGroupsWide: Sig60 word-ized ≡ the legacy pipeline; Sig120 closes cross-modal chains through the shared tail") {
    // the legacy q88 fixture, word-ized: groups must be value-equal
    val imgSigs = Seq(
      ("A", 0x0F0FL), ("Av", 0x0F0EL),
      ("B", 0x7AAA900000000L)).toDF("media_id", "sig")
    val audSigs = Seq(
      ("A", 0x333CL), ("Aa", 0x333DL),
      ("C", 0x5AA5A5000000L)).toDF("media_id", "sig")
    def wordize(df: org.apache.spark.sql.DataFrame) = df.select(
      col("media_id"),
      array((0 until 4).map(b =>
        shiftright(col("sig"), b * 15).bitwiseAND(32767)): _*).as("sig"))
    def m(df: org.apache.spark.sql.DataFrame) = df.collect()
      .map(r => r.getString(0) -> ((r.getString(1), r.getLong(2),
        r.getBoolean(3)))).toMap
    assert(m(MediaDedup.crossModalDupGroupsWide(
        Seq(wordize(imgSigs), wordize(audSigs)), MediaDedup.Sig60))
      === m(MediaDedup.crossModalDupGroups(Seq(imgSigs, audSigs))))
    // the planted Sig120 fixture: image A~Av (hamming 1), audio A~Aa
    // (hamming 1) — the union closure collapses {A, Av, Aa} even
    // though Av and Aa never pair in any single modality; B/C pair
    // with nothing (every band word distinct from A's)
    val imgW = Seq(
      ("A", Seq(0x0F0FL, 0L, 0L, 0L, 0L, 0L)),
      ("Av", Seq(0x0F0EL, 0L, 0L, 0L, 0L, 0L)),
      ("B", Seq(0x12345L, 0x23456L, 0x34567L, 0x45678L, 0x56789L,
        0x6789AL))).toDF("media_id", "sig")
    val audW = Seq(
      ("A", Seq(0x333CL, 0L, 0L, 0L, 0L, 0L)),
      ("Aa", Seq(0x333DL, 0L, 0L, 0L, 0L, 0L)),
      ("C", Seq(0x9ABCDL, 0x8BCDEL, 0x7CDEFL, 0x6DEF0L, 0x5EF01L,
        0x4F012L))).toDF("media_id", "sig")
    val out = m(MediaDedup.crossModalDupGroupsWide(Seq(imgW, audW)))
    assert(out.keySet === Set("A", "Av", "Aa", "B", "C"))
    assert(out("A") === (("A", 3L, true)))
    assert(out("Av") === (("A", 3L, false)))
    assert(out("Aa") === (("A", 3L, false)))
    assert(out("B") === (("B", 1L, true)) && out("C") === (("C", 1L, true)))
  }

  test("audioNearDupPairsWide pairs the gained+shifted WAV re-encode end-to-end (codec → envelope → wide sig → wide kernel)") {
    val media = Multimodal.asMediaTable(
      Seq(("wau_a", wavBytes(130, 1.0, 0)),
        ("wau_a2", wavBytes(130, 0.5, 100)),
        ("wau_b", wavBytes(130, 1.0, 0, phase = 2.3)))
        .toDF("id", "bytes"),
      "id", "bytes", "audio/wav")
    val pairs = MediaDedup.audioNearDupPairsWide(media)
      .collect().map(r => (r.getString(0), r.getString(1), r.getInt(2)))
    assert(pairs.map(p => (p._1, p._2)).toSeq === Seq(("wau_a", "wau_a2")))
    assert(pairs.head._3 <= 5)
  }

  // --- round 13: the AUTO-WIDTH door (VERDICT r12 item 2) ------------

  test("sigSpecFor: narrowest in-occupancy width, boundaries at bound·2^bandBits, GENERATED past the ladder") {
    import MediaDedup._
    assert(sigSpecFor(0) === Sig60)
    assert(sigSpecFor(64L << 15) === Sig60) // 2,097,152 — the ceiling
    assert(sigSpecFor((64L << 15) + 1) === Sig120)
    assert(sigSpecFor(64L << 20) === Sig120) // 67,108,864
    assert(sigSpecFor((64L << 20) + 1) === Sig240)
    assert(sigSpecFor(64L << 24) === Sig240) // ~1.07e9
    // past the ladder the door GENERATES (round 14 — VERDICT r13
    // stretch 7, replacing the loud refusal): the Sig240 edge's
    // 10-band shape at the next sufficient band width — boundary
    // parity on both sides of the edge, same relative threshold
    // slack (bands/(bands−1)) as the edge itself
    val g = sigSpecFor((64L << 24) + 1)
    assert(g === SigSpec(10, 26, 25))
    assert(g.bands === Sig240.bands &&
      g.maxGuaranteedHamming === Sig240.maxGuaranteedHamming)
    assert(sigSpecFor(64L << 25) === SigSpec(10, 26, 25))
    assert(sigSpecFor((64L << 25) + 1) === SigSpec(10, 27, 26))
    // the provisioned cost is explicit and within the bound the
    // constructor sized for
    val c = SigCost(g, (64L << 24) + 1)
    assert(c.expectedOccupancy <= 64.0 && c.expectedOccupancy > 16.0)
    assert(c.candidateStreamPerBand === c.n.toDouble * c.expectedOccupancy)
    // a direct sigSpecGenerated call never returns a LADDER width —
    // it is the past-the-ladder tail (the door handles the ladder)
    assert(sigSpecGenerated(1000) === SigSpec(10, 26, 25))
    // the spec domain still bounds the width loudly
    val e = intercept[IllegalArgumentException] {
      sigSpecGenerated(Long.MaxValue, maxExpectedOccupancy = 1)
    }
    assert(e.getMessage.contains("62-bit"))
    // generated-width properties over a log sweep of corpus sizes:
    // occupancy holds the bound at the chosen width AND fails it one
    // band-bit narrower (minimality), the band count stays the
    // Sig240 edge's, and the grid realizes exactly bands x bandBits
    for {
      bound <- Seq(1L, 64L, 1024L)
      exp <- 25 to 45
      n <- Seq((bound << exp) - 1, bound << exp, (bound << exp) + 1)
    } {
      val g = sigSpecGenerated(n, bound)
      val tag = s"(n=$n bound=$bound)"
      // exact integer comparisons: a double ratio collapses at the
      // 2^53 precision edge (n = bound·2^43 + 1 reads as exactly
      // bound·2^43 in double — the implementation's ceil-div/nlz
      // arithmetic is what stays exact)
      assert(n <= (bound << g.bandBits),
        s"occupancy over bound $tag: $g")
      assert(g.bandBits == 25 || n > (bound << (g.bandBits - 1)),
        s"width not minimal $tag: $g")
      assert(g.bands == Sig240.bands && g.sigBits == g.bands * g.bandBits
        && g.tileRows == g.bands && g.tileCols == g.bandBits + 1, s"shape $tag: $g")
    }
    // the bound knob moves the boundary: a caller provisioning 2×
    // the occupancy keeps the narrow width 2× longer — the SAME
    // arithmetic requireBoundedBuckets polices downstream
    assert(sigSpecFor((64L << 15) + 1, maxExpectedOccupancy = 128)
      === Sig60)
    // Sig240 is a coherent family member: 10 × 24-bit bands over a
    // 16×16 grid, pigeonhole to hamming 9 (the held ~1-per-24-bits
    // relative threshold)
    assert(Sig240.sigBits === 240 && Sig240.bands === 10 &&
      Sig240.maxGuaranteedHamming === 9)
  }

  test("image/audio auto-width doors track the manual width on BOTH sides of the boundary (the topKAuto discipline)") {
    def tex(seed: Int)(x: Int, y: Int): Int = {
      val v = (x * 7 + y * 13 + seed * 101) % 200
      (v << 16) | (v << 8) | v
    }
    def rows(df: org.apache.spark.sql.DataFrame) =
      df.select("a_id", "b_id", "hamming")
        .collect().map(_.toSeq).toSet
    val imedia = Multimodal.asMediaTable(
      Seq(("da", encodePng(64, 48)(tex(1))),
        ("da2", encodePng(64, 48)((x, y) => tex(1)(x, y) + 0x020202)),
        ("db", encodePng(64, 48)(tex(2)))).toDF("id", "bytes"),
      "id", "bytes", "image/png")
    // gate-scale n → Sig60 → ≡ the legacy 60-bit entry exactly
    val i60 = rows(MediaDedup.imageNearDupPairsAuto(imedia,
      new Multimodal.ImageIODecoder))
    assert(i60.nonEmpty && i60 === rows(MediaDedup.imageNearDupPairs(
      imedia, new Multimodal.ImageIODecoder)))
    // n forced past the 60-bit ceiling → Sig120 ≡ the manual wide
    // call (the corpus itself stays gate-sized — n is the SIZING
    // input, the occupancy guard still counts the real relation)
    val iWide = rows(MediaDedup.imageNearDupPairsAuto(imedia,
      new Multimodal.ImageIODecoder, n = (64L << 15) + 1))
    assert(iWide.nonEmpty && iWide === rows(MediaDedup.hammingPairsWide(
      MediaDedup.imageDHashWide(Multimodal.decodeFrames(imedia,
        new Multimodal.ImageIODecoder), MediaDedup.Sig120)
        .filter(col("frameIdx") === 0), MediaDedup.Sig120)))
    val amedia = Multimodal.asMediaTable(
      Seq(("xau_a", wavBytes(130, 1.0, 0)),
        ("xau_a2", wavBytes(130, 0.5, 100)),
        ("xau_b", wavBytes(130, 1.0, 0, phase = 2.3)))
        .toDF("id", "bytes"),
      "id", "bytes", "audio/wav")
    val a60 = rows(MediaDedup.audioNearDupPairsAuto(amedia))
    assert(a60.nonEmpty &&
      a60 === rows(MediaDedup.audioNearDupPairs(amedia)))
    val aWide = rows(MediaDedup.audioNearDupPairsAuto(amedia,
      n = (64L << 15) + 1))
    assert(aWide.nonEmpty &&
      aWide === rows(MediaDedup.audioNearDupPairsWide(amedia)))
  }

  test("video auto-width door: frame-count sizing tracks the manual width both sides; Sig240 signs the wide corpus coherently") {
    val ids = (0 until 150).map(i => s"aw$i").toDS()
    val frames = MediaDedup.syntheticVideoCorpusWide(ids)
    def rows(df: org.apache.spark.sql.DataFrame) =
      df.collect().map(_.toSeq).toSet
    // default n counts frames (gate-scale → Sig60): ≡ the legacy
    // 60-bit containment chain
    val v60 = rows(MediaDedup.videoContainmentPairsAuto(frames))
    assert(v60.nonEmpty && v60 === rows(MediaDedup.videoContainmentPairs(
      MediaDedup.imageDHash(frames))))
    // forced past the ceiling → Sig120 ≡ the manual q96 chain
    val vWide = rows(MediaDedup.videoContainmentPairsAuto(frames,
      n = (64L << 15) + 1))
    assert(vWide.nonEmpty &&
      vWide === rows(MediaDedup.videoContainmentPairsWide(
        MediaDedup.imageDHashWide(frames, MediaDedup.Sig120))))
    // Sig240 end-to-end sanity on the same 64×32 frames (16×16 grid
    // in 4×2 px tiles): identical frames pair at hamming 0, the
    // planted trimmed clips still contain
    val v240 = MediaDedup.videoContainmentPairsWide(
      MediaDedup.imageDHashWide(frames, MediaDedup.Sig240),
      MediaDedup.Sig240)
    val got240 = v240.collect()
      .map(r => (r.getString(0), r.getString(1))).toSet
    assert(got240.nonEmpty && got240.forall { case (a, b) => b == s"$a~t" })
  }

  test("generated-width silent-skip guard: a small-frame corpus at a grid wider than its frames fails LOUDLY instead of returning zero pairs; an empty corpus stays legitimately empty (round 15 — VERDICT r14)") {
    import graft.domain.Multimodal.DecodedFrame
    // n forced deep past the ladder → sigSpecGenerated picks a grid
    // at least 26 px wide (b + 1 ≥ 26); these frames are 16×16, so
    // tileMeans skips every one — pre-guard the door returned an
    // EMPTY pair set indistinguishable from a clean corpus
    val tiny = Seq(
      DecodedFrame("sm_a", 0, 16, 16, Array.tabulate(256)(i => (i % 97).toByte)),
      DecodedFrame("sm_b", 0, 16, 16, Array.tabulate(256)(i => (i % 89).toByte))
    ).toDS()
    val bigN = 64L << 25 // → generated spec, bands=10, 26-col grid
    assert(MediaDedup.sigSpecFor(bigN).tileCols >= 26)
    val e = intercept[IllegalArgumentException](
      MediaDedup.videoContainmentPairsAuto(tiny, n = bigN))
    assert(e.getMessage.contains("every decoded frame was skipped") &&
      e.getMessage.contains("16x16"),
      s"guard message should name the skip and the frame: ${e.getMessage}")
    // the image door guards identically (same one-site check)
    val ie = intercept[IllegalArgumentException](
      MediaDedup.imageNearDupPairsAuto(
        Multimodal.asMediaTable(
          Seq(("sm_i", encodePng(16, 16)((x, y) => (x * y) % 200)))
            .toDF("id", "bytes"), "id", "bytes", "image/png"),
        new Multimodal.ImageIODecoder, n = bigN))
    assert(ie.getMessage.contains("every decoded frame was skipped"))
    // an EMPTY corpus is not a skip failure — the door returns the
    // legitimately empty relation
    val empty = Seq.empty[DecodedFrame].toDS()
    assert(MediaDedup.videoContainmentPairsAuto(empty, n = bigN)
      .isEmpty)
    // a corpus where NOTHING decoded to pixels is also loud (round-15
    // review: the per-blob corrupt-skip contract is correct blob by
    // blob, but a door whose entire input fell out must say so)
    val allCorrupt = Seq(
      DecodedFrame("c1", 0, 16, 16, null),
      DecodedFrame("c2", 0, 16, 16, null)).toDS()
    val ce = intercept[IllegalArgumentException](
      MediaDedup.videoContainmentPairsAuto(allCorrupt, n = 2))
    assert(ce.getMessage.contains("undecodable"))
    // and a corpus that FITS the generated grid still pairs (the
    // guard costs one first-survivor probe, never a behavior change;
    // 150 ids so the ~19% variant rate plants real containment pairs)
    val fits = MediaDedup.syntheticVideoCorpusWide(
      (0 until 150).map(i => s"gw$i").toDS())
    assert(MediaDedup.videoContainmentPairsAuto(fits, n = bigN)
      .collect().nonEmpty)
  }
}
