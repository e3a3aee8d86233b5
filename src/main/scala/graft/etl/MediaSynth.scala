package graft.etl

import java.nio.{ByteBuffer, ByteOrder}

/** Deterministic media-file synthesis for the multimodal operators.
  *
  * Real deployments read image/audio bytes from an object store; this
  * container has no egress, so the fixture GENERATES genuine file bytes —
  * structurally valid BMP (BITMAPFILEHEADER + BITMAPINFOHEADER + bottom-up
  * 24bpp pixel rows with 4-byte stride padding) and WAV (RIFF/WAVE with
  * `fmt ` and `data` chunks, PCM16 mono) — whose content is a pure function
  * of `doc_id`. The decode side ([[graft.ops.Multimodal]]) parses these
  * bytes for real (header walk, stride math, chunk scan); the generating
  * formula is mirrored arithmetically in the DuckDB oracle, so the decoded
  * statistics are oracle-checkable end to end.
  */
object MediaSynth {

  /** Structurally valid 24bpp bottom-up BMP with the standard 54-byte header. */
  def bmp(width: Int, height: Int, rgb: (Int, Int) => (Int, Int, Int)): Array[Byte] = {
    val stride = ((3 * width + 3) / 4) * 4
    val dataSize = stride * height
    val buf = ByteBuffer.allocate(54 + dataSize).order(ByteOrder.LITTLE_ENDIAN)
    buf.put('B'.toByte).put('M'.toByte)
    buf.putInt(54 + dataSize) // file size
    buf.putInt(0) // reserved
    buf.putInt(54) // pixel-array offset
    buf.putInt(40) // BITMAPINFOHEADER size
    buf.putInt(width)
    buf.putInt(height) // positive => bottom-up row order
    buf.putShort(1) // planes
    buf.putShort(24) // bits per pixel
    buf.putInt(0) // BI_RGB (uncompressed)
    buf.putInt(dataSize)
    buf.putInt(2835).putInt(2835) // 72 DPI
    buf.putInt(0).putInt(0) // palette: none
    var row = 0
    while (row < height) {
      val y = height - 1 - row // file stores bottom row first
      var x = 0
      while (x < width) {
        val (r, g, b) = rgb(x, y)
        buf.put(b.toByte).put(g.toByte).put(r.toByte) // BGR on disk
        x += 1
      }
      var p = 3 * width
      while (p < stride) { buf.put(0.toByte); p += 1 }
      row += 1
    }
    buf.array()
  }

  /** PCM16 mono WAV: RIFF header, `fmt ` chunk, `data` chunk. */
  def wav(samples: Array[Short], sampleRate: Int = 8000): Array[Byte] = {
    val dataSize = samples.length * 2
    val buf = ByteBuffer.allocate(44 + dataSize).order(ByteOrder.LITTLE_ENDIAN)
    buf.put("RIFF".getBytes("US-ASCII")).putInt(36 + dataSize)
    buf.put("WAVE".getBytes("US-ASCII"))
    buf.put("fmt ".getBytes("US-ASCII")).putInt(16)
    buf.putShort(1) // PCM
    buf.putShort(1) // mono
    buf.putInt(sampleRate)
    buf.putInt(sampleRate * 2) // byte rate
    buf.putShort(2) // block align
    buf.putShort(16) // bits per sample
    buf.put("data".getBytes("US-ASCII")).putInt(dataSize)
    samples.foreach(buf.putShort)
    buf.array()
  }

  /** Per-doc BMP: w in 4..8, h in 3..6, channel values linear-congruential in
    * (doc_id, x, y) mod 256 — mirrored in the oracle as
    * `(doc_id + 7*(k % w) + 13*(k // w)) % 256` etc. over `range(0, w*h)`.
    */
  def docBmp(id: Long): Array[Byte] = {
    val w = (4 + id % 5).toInt
    val h = (3 + id % 4).toInt
    bmp(
      w,
      h,
      (x, y) =>
        (
          ((id + 7L * x + 13L * y) % 256).toInt,
          ((id * 3 + 5L * x + 11L * y) % 256).toInt,
          ((id * 5 + 3L * x + 17L * y) % 256).toInt))
  }

  /** Per-doc WAV: 64..127 samples, s(i) = (id*73 + i*179) % 65536 - 32768. */
  def docWav(id: Long): Array[Byte] = {
    val n = (64 + id % 64).toInt
    wav(Array.tabulate(n)(i => (((id * 73 + i.toLong * 179) % 65536) - 32768).toShort))
  }

  /** Minimal frame container: magic "GVID", frame count, then each frame as
    * a length-prefixed full BMP. Stand-in for a video container whose codec
    * is unavailable pure-JVM — the container walk, length-prefix framing,
    * and per-frame decode are the real work frame sampling does.
    */
  def video(frames: Seq[Array[Byte]]): Array[Byte] = {
    val buf = ByteBuffer
      .allocate(8 + frames.map(4 + _.length).sum)
      .order(ByteOrder.LITTLE_ENDIAN)
    buf.put("GVID".getBytes("US-ASCII")).putInt(frames.length)
    frames.foreach { f => buf.putInt(f.length); buf.put(f) }
    buf.array()
  }

  /** Fixture media TABLE per the [[graft.ops.Multimodal.asMedia]] contract
    * (`doc_id, kind, n_bytes, media`): ids from `docs` mapped through a
    * per-doc byte generator, partition-parallel. This is the bridge the
    * query registry and specs use to feed the decoupled multimodal faces;
    * production media arrives via `spark.read.format("binaryFile")` or a
    * parquet landing zone with the same four columns.
    */
  def mediaTable(
      docs: org.apache.spark.sql.DataFrame,
      kind: String,
      gen: Long => Array[Byte],
      idCol: String = "doc_id"): org.apache.spark.sql.DataFrame = {
    val spark = docs.sparkSession
    import org.apache.spark.sql.functions.col
    import spark.implicits._
    docs
      .select(col(idCol).cast("long"))
      .as[Long]
      .mapPartitions { ids =>
        ids.map { id =>
          val b = gen(id)
          graft.ops.MediaRow(id, kind, b.length.toLong, b)
        }
      }
      .toDF()
  }

  /** Per-doc clip: 3..6 frames of the doc's BMP geometry; frame f shifts the
    * red channel by 19·f — mirrored in the oracle as
    * `(doc_id + 19*f + 7*(k % w) + 13*(k // w)) % 256`.
    */
  def docVideo(id: Long): Array[Byte] = {
    val w = (4 + id % 5).toInt
    val h = (3 + id % 4).toInt
    val nf = (3 + id % 4).toInt
    video((0 until nf).map(f =>
      bmp(
        w,
        h,
        (x, y) =>
          (
            ((id + 19L * f + 7L * x + 13L * y) % 256).toInt,
            ((id * 3 + 19L * f + 5L * x + 11L * y) % 256).toInt,
            ((id * 5 + 19L * f + 3L * x + 17L * y) % 256).toInt))))
  }
}
