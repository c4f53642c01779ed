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

  val all: Seq[GraftQuery] = Seq(mmFeatures)
}
