package graft.operators

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

import graft.sources.Tables

/** m01 — multimodal column plumbing (SURVEY.md §2): media as an opaque
  * `binary` payload + a typed metadata struct, processed batch-wise.
  *
  * The real decode (image/audio codecs) is STUBBED — this container has no
  * media libraries — by a deterministic fake: the payload is the document's
  * utf-8 bytes and "decoding" extracts byte-level features. Everything
  * Spark-side is real and is what would carry a genuine decoder at 100 TB:
  * the schema contract (payload: binary, meta: struct<width,height,format>),
  * a narrow columnar scan feeding it, per-partition batch processing via
  * mapPartitions over a typed Dataset (the Scala analog of the
  * mapInPandas/Arrow-batch shape a Python decoder UDF would use), and a
  * partition count sized so one batch ≈ one task.
  */
object Multimodal {

  /** Raw media row: what a real pipeline would read from a lakehouse table
    * of crawled media. */
  final case class MediaRow(doc_id: Long, payload: Array[Byte],
      width: Int, height: Int, format: String)

  /** Decoded features: the stub "decoder" output — deterministic byte
    * statistics standing in for pixel/sample features. */
  final case class MediaFeatures(doc_id: Long, width: Int, height: Int,
      format: String, n_bytes: Int, mean_byte: Double, head_hex: String)

  /** The stubbed decoder: a real implementation would decode `payload`
    * with an image/audio codec here. Deterministic fake = byte stats. */
  private def decodeStub(r: MediaRow): MediaFeatures = {
    val n = r.payload.length
    var sum = 0L
    var i = 0
    while (i < n) { sum += (r.payload(i) & 0xff); i += 1 }
    val mean = if (n == 0) 0.0 else sum.toDouble / n
    val head = r.payload.take(4).map(b => f"${b & 0xff}%02x").mkString
    MediaFeatures(r.doc_id, r.width, r.height, r.format, n, mean, head)
  }

  /** m01 — build the media table from documents (payload = utf-8 bytes,
    * metadata derived deterministically), then run the batched decode.
    * Rows-only (the stub has no DuckDB twin); MultimodalSpec pins the
    * schema contract and the byte-stat math.
    */
  def m01MultimodalMeta(spark: SparkSession, dir: String): DataFrame = {
    import spark.implicits._
    val media = Tables(spark, dir).documents
      .select(col("doc_id"), col("text").cast("binary").as("payload"),
        (pmod(col("doc_id"), lit(4)) * 160 + 320).cast("int").as("width"),
        (pmod(col("doc_id"), lit(3)) * 120 + 240).cast("int").as("height"),
        element_at(array(lit("png"), lit("jpeg"), lit("webp")),
          (pmod(col("doc_id"), lit(3)) + 1).cast("int")).as("format"))
      .as[MediaRow]
    media
      .mapPartitions(_.map(decodeStub))
      .toDF()
      .orderBy(col("doc_id"))
  }

  val oracle: Map[String, String] = Map.empty

  val queries: Map[String, (SparkSession, String) => DataFrame] = Map(
    "m01_multimodal_meta" -> (m01MultimodalMeta _)
  )
}
