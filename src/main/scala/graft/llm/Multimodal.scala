package graft.llm

import graft.GraftQuery
import graft.io.Tables._
import org.apache.spark.sql.functions._

/** Multimodal column plumbing (B10): media as opaque `binary` columns with
  * typed metadata, "decoded" by a per-partition function.
  *
  * The decode step is a DETERMINISTIC STUB — real image/audio codecs are
  * not available in this environment.  What is real and tested is the
  * Spark-side plumbing a 100 TB media pipeline needs: a binary payload
  * column, a typed `Dataset` boundary, `mapPartitions` batch processing
  * (the Scala analog of `mapInPandas` — one iterator per partition, so a
  * real decoder would amortize model/codec init per partition, not per
  * row), and a typed feature schema out.  Swap `decodeStub` for a JNI/codec
  * call and nothing else changes.
  */
object Multimodal {

  /** Typed feature row produced by the decode step. */
  final case class MediaFeatures(
      doc_id: Long, n_bytes: Long, header_hex: String, fake_w: Long, fake_h: Long)

  /** STUB decoder: reads payload header bytes and emits deterministic fake
    * "image dimensions" — stands in for a real `decode -> resize ->
    * feature-extract` kernel. */
  private def decodeStub(docId: Long, payload: Array[Byte]): MediaFeatures = {
    val hx = payload.take(4).map(b => f"${b & 0xff}%02x").mkString
    MediaFeatures(
      doc_id = docId,
      n_bytes = payload.length.toLong,
      header_hex = hx,
      fake_w = (payload(0) & 0xff).toLong * 256 + (payload(1) & 0xff),
      fake_h = (payload(2) & 0xff).toLong * 256 + (payload(3) & 0xff))
  }

  /** Binary "media" column synthesized from text (UTF-8 bytes), decoded per
    * partition.  The oracle recomputes the same features from the text
    * bytes directly (ASCII corpus => byte arithmetic is reproducible). */
  val mmFeatures: GraftQuery = GraftQuery("q_mm_features",
    """SELECT doc_id,
      |  CAST(octet_length(encode(text)) AS BIGINT) AS n_bytes,
      |  lower(hex(substr(text, 1, 4))) AS header_hex,
      |  CAST(ascii(substr(text, 1, 1)) * 256 + ascii(substr(text, 2, 1)) AS BIGINT) AS fake_w,
      |  CAST(ascii(substr(text, 3, 1)) * 256 + ascii(substr(text, 4, 1)) AS BIGINT) AS fake_h
      |FROM documents WHERE length(text) >= 4""".stripMargin) { (spark, sfDir) =>
    import spark.implicits._
    documents(spark, sfDir)
      .filter(length(col("text")) >= 4)
      .select(col("doc_id"), encode(col("text"), "UTF-8").as("payload"))
      .as[(Long, Array[Byte])]
      .mapPartitions(_.map { case (id, payload) => decodeStub(id, payload) })
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

  val all: Seq[GraftQuery] = Seq(mmFeatures, mmFrameSample)
}
