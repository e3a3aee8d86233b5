package graft

import graft.etl.MediaSynth
import graft.ops.Multimodal

/** Hand-computed expectations for the real BMP/WAV decoders: the byte-level
  * layout cases (BGR order, bottom-up rows, stride padding, RIFF chunk
  * skipping) that a formula-mirroring oracle cannot distinguish from a
  * decoder that never reads the bytes.
  */
class MultimodalSpec extends SparkSpec {

  test("decodeBmp reads a hand-built 2x2 BMP: BGR order, bottom-up rows, stride pad") {
    // 2x2, stride = ((3*2+3)/4)*4 = 8 => 2 pad bytes per row.
    // Pixels: (0,0)=R only, (1,0)=G only, (0,1)=B only, (1,1)=white.
    val px = Map((0, 0) -> (255, 0, 0), (1, 0) -> (0, 255, 0), (0, 1) -> (0, 0, 255), (1, 1) -> (255, 255, 255))
    val bytes = MediaSynth.bmp(2, 2, (x, y) => px((x, y)))
    assert(bytes.length == 54 + 8 * 2)
    // file stores the BOTTOM row (y=1) first, channels as B,G,R
    assert((bytes(54) & 0xff, bytes(55) & 0xff, bytes(56) & 0xff) == ((255, 0, 0))) // (0,1) blue => B=255
    assert((bytes(57) & 0xff, bytes(58) & 0xff, bytes(59) & 0xff) == ((255, 255, 255))) // (1,1) white
    val s = Multimodal.decodeBmp(7L, bytes)
    assert(s.width == 2 && s.height == 2)
    assert(s.sum_r == 255L + 255L)
    assert(s.sum_g == 255L + 255L)
    assert(s.sum_b == 255L + 255L)
  }

  test("decodeBmp rejects non-BMP and truncated bytes") {
    intercept[IllegalArgumentException](Multimodal.decodeBmp(1L, Array[Byte](1, 2, 3)))
    val ok = MediaSynth.bmp(4, 3, (_, _) => (1, 2, 3))
    intercept[IllegalArgumentException](Multimodal.decodeBmp(1L, ok.take(ok.length - 5)))
  }

  test("decodeWav computes sum-of-squares and peak; skips unknown RIFF chunks") {
    val samples = Array[Short](3, -4, 0, 32767, -32768)
    val bytes = MediaSynth.wav(samples)
    val s = Multimodal.decodeWav(9L, bytes)
    assert(s.n_samples == 5L)
    assert(s.sum_sq == 9L + 16L + 0L + 32767L * 32767 + 32768L * 32768)
    assert(s.peak == 32768L)

    // splice a LIST chunk between fmt and data — a real-file layout the
    // fixed-offset parse would misread
    val listChunk = "LIST".getBytes("US-ASCII") ++ Array[Byte](4, 0, 0, 0) ++ "INFO".getBytes("US-ASCII")
    val spliced = bytes.take(36) ++ listChunk ++ bytes.drop(36)
    // patch RIFF size (bytes 4..7, LE) to cover the extra 12 bytes
    val riffSize = java.nio.ByteBuffer.wrap(spliced, 4, 4)
      .order(java.nio.ByteOrder.LITTLE_ENDIAN)
    riffSize.putInt(spliced.length - 8)
    val s2 = Multimodal.decodeWav(9L, spliced)
    assert(s2 == s.copy())
  }

  test("wavQuality: hand clip/silence/DC counts over a built WAV; trunc-div DC on a negative mean") {
    val s = spark
    import s.implicits._
    // 8 samples: 2 clipped (|v| >= 32440), 4 silent (|v| <= 327: 0, 100,
    // -327, 300); sum = 32767 - 32440 + 0 + 100 - 327 - 500 + 300 - 560
    // = -660 -> dc_milli = (1000 * -660) div 8 = -82500
    val samples = Array[Short](32767, -32440, 0, 100, -327, -500, 300, -560)
    val media = Seq((5L, MediaSynth.wav(samples), "wav")).toDF("doc_id", "media", "kind")
    val got = Multimodal.wavQuality(media).head()
    assert(got.getLong(0) === 5L && got.getLong(1) === 8L)
    assert(got.getLong(2) === (1000000L * 2 / 8), "32767 and -32440 are clipped")
    assert(got.getLong(3) === (1000000L * 4 / 8), "0, 100, -327, 300 are silent")
    assert(got.getLong(4) === (1000L * -660 / 8), "trunc-div DC offset, negative mean")
  }

  test("decodeWav rejects malformed chunk sizes instead of looping or overreading") {
    val bytes = MediaSynth.wav(Array[Short](1, 2, 3))
    // negative size: would make the chunk walk non-advancing
    val neg = bytes.clone()
    java.nio.ByteBuffer.wrap(neg, 16, 4).order(java.nio.ByteOrder.LITTLE_ENDIAN).putInt(-8)
    val e1 = intercept[IllegalArgumentException](Multimodal.decodeWav(9L, neg))
    assert(e1.getMessage.contains("bad"))
    // oversized size: would read past the buffer
    val big = bytes.clone()
    java.nio.ByteBuffer.wrap(big, 40, 4).order(java.nio.ByteOrder.LITTLE_ENDIAN).putInt(1 << 20)
    val e2 = intercept[IllegalArgumentException](Multimodal.decodeWav(9L, big))
    assert(e2.getMessage.contains("bad"))
  }

  test("docBmp/docWav round-trip: decoded stats equal the generating formula") {
    val id = 41L
    val b = Multimodal.decodeBmp(id, MediaSynth.docBmp(id))
    val w = (4 + id % 5).toInt
    val h = (3 + id % 4).toInt
    assert(b.width == w && b.height == h)
    val grid = for { x <- 0 until w; y <- 0 until h } yield (x, y)
    assert(b.sum_r == grid.map { case (x, y) => (id + 7L * x + 13L * y) % 256 }.sum)
    assert(b.sum_g == grid.map { case (x, y) => (id * 3 + 5L * x + 11L * y) % 256 }.sum)
    assert(b.sum_b == grid.map { case (x, y) => (id * 5 + 3L * x + 17L * y) % 256 }.sum)

    val a = Multimodal.decodeWav(id, MediaSynth.docWav(id))
    val n = (64 + id % 64).toInt
    val smp = (0 until n).map(i => (id * 73 + i.toLong * 179) % 65536 - 32768)
    assert(a.n_samples == n.toLong)
    assert(a.sum_sq == smp.map(v => v * v).sum)
    assert(a.peak == smp.map(math.abs).max)
  }

  test("resizeBmpNearest: full-size resample reproduces decode sums; 2x2 matches the index formula") {
    for (id <- Seq(0L, 3L, 7L, 12L)) {
      val bytes = MediaSynth.docBmp(id)
      val full = Multimodal.decodeBmp(id, bytes)
      // identity resize must touch every pixel exactly once
      val same = Multimodal.resizeBmpNearest(id, bytes, full.width, full.height)
      assert((same.sum_r, same.sum_g, same.sum_b) == (full.sum_r, full.sum_g, full.sum_b))
      // 2x2: target (x,y) samples source (x*w div 2, y*h div 2)
      val w = (4 + id % 5).toInt
      val h = (3 + id % 4).toInt
      val pts = for (y <- 0 until 2; x <- 0 until 2) yield (x * w / 2, y * h / 2)
      val expR = pts.map { case (sx, sy) => (id + 7L * sx + 13L * sy) % 256 }.sum
      val r = Multimodal.resizeBmpNearest(id, bytes, 2, 2)
      assert(r.sum_r == expR, s"id=$id")
    }
  }

  test("sampleFrames strides the container index, decodes only selected frames") {
    val id = 5L // nf = 3 + 5%4 = 4 -> frames 0, 2 at every=2
    val got = Multimodal.sampleFrames(id, MediaSynth.docVideo(id), every = 2)
    assert(got.map(_.frame_id) == Seq(0, 2))
    val w = (4 + id % 5).toInt
    val h = (3 + id % 4).toInt
    for (fs <- got) {
      val exp = (for (y <- 0 until h; x <- 0 until w)
        yield (id + 19L * fs.frame_id + 7L * x + 13L * y) % 256).sum
      assert(fs.sum_r == exp, s"frame ${fs.frame_id}")
    }
    // every=1 returns all frames
    assert(Multimodal.sampleFrames(id, MediaSynth.docVideo(id), every = 1).size == 4)
    // every <= 0 is a clear argument error, not a mid-task ArithmeticException
    intercept[IllegalArgumentException](
      Multimodal.sampleFrames(id, MediaSynth.docVideo(id), every = 0))
    val s = spark
    import s.implicits._
    intercept[IllegalArgumentException](
      Multimodal.frameSamples(
        MediaSynth.mediaTable(Seq(1L).toDF("doc_id"), "video/gvid", MediaSynth.docVideo),
        every = -1))
  }

  test("aHashBmp: deterministic, halves fit 32 bits, near-identical images land close") {
    val h1 = Multimodal.aHashBmp(1L, MediaSynth.docBmp(1L))
    val h1b = Multimodal.aHashBmp(1L, MediaSynth.docBmp(1L))
    assert(h1 == h1b)
    assert(h1.hash_hi >= 0 && h1.hash_hi < (1L << 32))
    assert(h1.hash_lo >= 0 && h1.hash_lo < (1L << 32))
    // perturb ONE pixel's channels slightly: the perceptual hash moves by
    // at most a few bits, while a different image is far away
    val bytes = MediaSynth.docBmp(1L)
    val tweaked = bytes.clone()
    val off = java.nio.ByteBuffer.wrap(bytes).order(java.nio.ByteOrder.LITTLE_ENDIAN).getInt(10)
    tweaked(off) = ((bytes(off) & 0xff) ^ 1).toByte
    val ht = Multimodal.aHashBmp(1L, tweaked)
    def hamming(x: graft.ops.AHash, y: graft.ops.AHash): Int =
      java.lang.Long.bitCount(x.hash_hi ^ y.hash_hi) +
        java.lang.Long.bitCount(x.hash_lo ^ y.hash_lo)
    assert(hamming(h1, ht) <= 2, s"one-pixel tweak moved ${hamming(h1, ht)} bits")
    val h2 = Multimodal.aHashBmp(2L, MediaSynth.docBmp(2L))
    assert(hamming(h1, h2) > 2, "different images should differ in many bits")
  }

  test("wavZeroCrossings matches the sample-formula count") {
    val z = Multimodal.wavZeroCrossings(1L, MediaSynth.docWav(1L))
    val n = 64 + (1 % 64)
    val smp = (0 until n).map(i => ((1L * 73 + i * 179) % 65536 - 32768).toInt)
    val expected = (1 until n).count(i => smp(i - 1) * smp(i) < 0)
    assert(z == graft.ops.WavZc(1L, n.toLong, expected.toLong))
  }

  test("wavFingerprint: matches the hand-computed window bits; copies pair at hamming 0") {
    // hand-compute the 64-window energy bits from the generator formula
    val id = 5L
    val n = (64 + id % 64).toInt
    val amp = (0 until n).map(i => math.abs((id * 73 + i * 179) % 65536 - 32768))
    val tot = amp.sum
    var hi = 0L; var lo = 0L
    (0 until 64).foreach { w =>
      val ws = amp.slice(w * n / 64, (w + 1) * n / 64).sum
      if (64L * ws > tot) { if (w < 32) lo |= 1L << w else hi |= 1L << (w - 32) }
    }
    val fp = Multimodal.wavFingerprint(id, MediaSynth.docWav(id))
    assert(fp == graft.ops.WavFp(id, hi, lo))
    // a different clip's fingerprint differs in many bits
    val other = Multimodal.wavFingerprint(6L, MediaSynth.docWav(6L))
    val d = java.lang.Long.bitCount(fp.hash_hi ^ other.hash_hi) +
      java.lang.Long.bitCount(fp.hash_lo ^ other.hash_lo)
    assert(d > 3, s"distinct clips should not be near-dups (hamming $d)")
    // an exact re-upload under a fresh id pairs at hamming 0
    val s = spark
    import s.implicits._
    val hashes = Seq(
      (5L, fp.hash_hi, fp.hash_lo),
      (1000005L, fp.hash_hi, fp.hash_lo),
      (6L, other.hash_hi, other.hash_lo)
    ).toDF("doc_id", "hash_hi", "hash_lo")
    val pairs = graft.ops.Dedup.aHashPairs(hashes).collect()
      .map(r => (r.getLong(0), r.getLong(1), r.getLong(2)))
    assert(pairs.toSet == Set((5L, 1000005L, 0L)))
  }

  test("wavFingerprint: clips under 64 samples emit the all-zero fingerprint, not an exception") {
    // a valid-but-degenerate 3-sample PCM16 WAV must not kill a corpus
    // scan; the policy is the zero fingerprint (its band bucket is hot by
    // construction and the pair join's bucket cap drops it)
    val short = Multimodal.wavFingerprint(7L, MediaSynth.wav(Array[Short](5, -3, 2)))
    assert(short == graft.ops.WavFp(7L, 0L, 0L))
    // exactly 64 samples is the smallest fingerprintable clip
    val minimal = Multimodal.wavFingerprint(
      8L, MediaSynth.wav(Array.tabulate[Short](64)(i => (i * 37 % 1000).toShort)))
    assert(minimal.hash_hi != 0L || minimal.hash_lo != 0L)
  }

  test("bmpFeatures/wavFeatures produce decoded columns on a media DataFrame") {
    val s = spark
    import s.implicits._
    val docs = Seq(1L, 2L, 3L).toDF("doc_id")
    val bf = Multimodal
      .bmpFeatures(MediaSynth.mediaTable(docs, "image/bmp", MediaSynth.docBmp))
      .collect().map(r => r.getAs[Long]("doc_id") -> r).toMap
    assert(bf(2L).getAs[Long]("width") == 4 + 2 % 5)
    assert(bf(2L).getAs[Long]("height") == 3 + 2 % 4)
    val wf = Multimodal
      .wavFeatures(MediaSynth.mediaTable(docs, "audio/wav", MediaSynth.docWav))
      .collect().map(r => r.getAs[Long]("doc_id") -> r).toMap
    assert(wf(3L).getAs[Long]("n_samples") == 64 + 3 % 64)
    assert(wf(3L).getAs[Long]("peak") > 0)
  }

  test("faces consume ANY media source: binaryFile files and asMedia both feed bmpFeatures") {
    // The decoupling contract: an operator face must accept real bytes from
    // spark.read.format("binaryFile") (production shape) and from asMedia
    // over an in-memory binary column — no fixture coupling inside the op.
    val s = spark
    import s.implicits._
    val dir = java.nio.file.Files.createTempDirectory("bmps")
    try {
      for (id <- Seq(11L, 12L)) {
        java.nio.file.Files.write(dir.resolve(s"$id.bmp"), MediaSynth.docBmp(id))
      }
      val binDf = spark.read.format("binaryFile").load(dir.toString)
      val media = Multimodal.asMedia(
        binDf.select(
          org.apache.spark.sql.functions
            .regexp_extract(org.apache.spark.sql.functions.col("path"), "(\\d+)\\.bmp$", 1)
            .cast("long")
            .as("doc_id"),
          org.apache.spark.sql.functions.col("content")),
        binCol = "content",
        kind = "image/bmp")
      val viaFiles = Multimodal.bmpFeatures(media)
        .collect().map(r => r.getAs[Long]("doc_id") -> r.getAs[Long]("width")).toMap
      assert(viaFiles == Map(11L -> (4 + 11 % 5).toLong, 12L -> (4 + 12 % 5).toLong))

      // same bytes through asMedia over an in-memory binary column
      val inMem = Seq(11L, 12L).map(id => (id, MediaSynth.docBmp(id))).toDF("doc_id", "bytes")
      val viaAsMedia = Multimodal.bmpFeatures(Multimodal.asMedia(inMem, "bytes", "image/bmp"))
        .collect().map(r => r.getAs[Long]("doc_id") -> r.getAs[Long]("width")).toMap
      assert(viaAsMedia == viaFiles)
    } finally {
      import scala.jdk.CollectionConverters._
      java.nio.file.Files.list(dir).iterator().asScala.foreach(java.nio.file.Files.delete)
      java.nio.file.Files.delete(dir)
    }
  }

  test("frameAHashes + clipPairs: re-uploaded clip found, unrelated clips not paired") {
    val s = spark
    import s.implicits._
    import org.apache.spark.sql.functions.col
    // frame hashes equal aHashBmp of the directly-constructed frame BMPs
    val id = 5L
    val w = (4 + id % 5).toInt
    val h = (3 + id % 4).toInt
    val media = MediaSynth.mediaTable(Seq(id).toDF("doc_id"), "video/gvid", MediaSynth.docVideo)
    val hashes = Multimodal.frameAHashes(media, every = 2).collect()
      .map(r => r.getInt(1) -> ((r.getLong(2), r.getLong(3)))).toMap
    for ((f, hv) <- hashes) {
      val frame = MediaSynth.bmp(
        w, h,
        (x, y) =>
          (
            ((id + 19L * f + 7L * x + 13L * y) % 256).toInt,
            ((id * 3 + 19L * f + 5L * x + 11L * y) % 256).toInt,
            ((id * 5 + 19L * f + 3L * x + 17L * y) % 256).toInt))
      val direct = Multimodal.aHashBmp(id, frame)
      assert(hv == ((direct.hash_hi, direct.hash_lo)), s"frame $f")
    }
    // a re-upload (identical frame hashes under a new id) pairs with its
    // original at hamming 0 across >= minShared frames; an unrelated clip
    // does not pair with either
    val base = Multimodal.frameAHashes(
      MediaSynth.mediaTable(Seq(5L, 6L).toDF("doc_id"), "video/gvid", MediaSynth.docVideo),
      every = 1)
    val dup = base.filter(col("doc_id") === 5L)
      .select((col("doc_id") + 100).as("doc_id"), col("frame_id"), col("hash_hi"), col("hash_lo"))
    val pairs = graft.ops.Dedup.clipPairs(base.unionAll(dup)).collect()
      .map(r =>
        (r.getLong(0), r.getLong(1), r.getLong(2), r.getLong(3), r.getLong(4), r.getLong(5)))
    assert(pairs.exists(p => p._1 == 5L && p._2 == 105L && p._6 == 0L),
      s"re-upload must pair with its original: ${pairs.toSeq}")
    assert(!pairs.exists(p => p._1 == 6L || p._2 == 6L),
      s"unrelated clip must not pair: ${pairs.toSeq}")
    // the distinct-frame guard: every reported pair spans >= 2 distinct
    // frames on EACH side (n_frames_a, n_frames_b), not just 2 raw pairs
    assert(pairs.forall(p => p._4 >= 2 && p._5 >= 2), s"distinct-frame floors: ${pairs.toSeq}")
  }

  test("clipPairs: one hot frame matching many frames of another clip is not a dup") {
    val s = spark
    import s.implicits._
    // clip 1 has a single frame; clip 2 has 3 frames all identical to it
    // (static title card). Raw pair count = 3 >= minShared, but distinct
    // A-side frames = 1, so the pair must NOT be reported.
    val rows = Seq(
      (1L, 0, 7L, 9L),
      (2L, 0, 7L, 9L),
      (2L, 1, 7L, 9L),
      (2L, 2, 7L, 9L)).toDF("doc_id", "frame_id", "hash_hi", "hash_lo")
    assert(graft.ops.Dedup.clipPairs(rows).collect().isEmpty)
    // genuine overlap: two shared frames on both sides IS reported
    val real = Seq(
      (1L, 0, 7L, 9L), (1L, 1, 8L, 10L),
      (2L, 0, 7L, 9L), (2L, 1, 8L, 10L)).toDF("doc_id", "frame_id", "hash_hi", "hash_lo")
    val got = graft.ops.Dedup.clipPairs(real).collect()
    assert(got.length == 1 && got.head.getLong(0) == 1L && got.head.getLong(2) == 2L)
  }

  test("sceneCuts: diffs agree with a direct per-frame decode; both flags occur") {
    val s = spark
    import s.implicits._
    val ids = (1L to 40L).toSeq
    val got = Multimodal
      .sceneCuts(MediaSynth.mediaTable(ids.toDF("doc_id"), "video/gvid", MediaSynth.docVideo))
      .collect()
      .map(r => (r.getLong(0), r.getInt(1)) -> ((r.getLong(2), r.getLong(3))))
      .toMap
    // reference computation straight from sampleFrames on the same bytes
    val expected = ids.flatMap { id =>
      val fs = Multimodal.sampleFrames(id, MediaSynth.docVideo(id), every = 1)
      fs.map(f => f.frame_id -> (f.sum_r + f.sum_g + f.sum_b)).sliding(2).collect {
        case Seq((_, a), (fid, b)) => (id, fid) -> math.abs(b - a)
      }
    }.toMap
    assert(got.keySet == expected.keySet)
    got.foreach { case (k, (diff, cut)) =>
      assert(diff == expected(k), s"$k")
      assert(cut == (if (diff > 1500L) 1L else 0L))
    }
    val flags = got.values.map(_._2).toSet
    assert(flags == Set(0L, 1L), s"fixture must exercise both cut and non-cut: $flags")
  }
}
