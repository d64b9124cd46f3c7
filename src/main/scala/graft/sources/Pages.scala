package graft.sources

import org.apache.spark.sql.{DataFrame, Dataset, SparkSession}
import org.apache.spark.sql.functions._

/** The Common-Crawl-style `pages` table (BASELINE.json input_hint):
  *   pages(url string, warc_ts timestamp, html binary, text string, lang string)
  * derived deterministically from the driver's `documents` table, plus the
  * extractor whose output must be BYTE-IDENTICAL to `text` per url.
  *
  * The html payload is a deterministic wrapper of the text — it stands in
  * for real WARC html; the extractor is the inverse projection. Multimodal
  * plumbing (binary columns + typed metadata + batched feature extraction)
  * lives in extractFeatures below with a clearly-marked stub decode.
  */
object Pages {

  val HtmlPrefix = "<html><head><title>graft</title></head><body><p>"
  val HtmlSuffix = "</p></body></html>"
  val Epoch = java.sql.Timestamp.valueOf("2024-01-01 00:00:00")

  /** pages table from documents: url/warc_ts/html are pure projections. */
  def fromDocuments(docs: DataFrame): DataFrame =
    docs.select(
      concat(lit("https://graft.example/"), col("source"), lit("/"),
        col("doc_id").cast("string")).as("url"),
      timestamp_add("SECOND", col("doc_id"), lit(Epoch).cast("timestamp"))
        .as("warc_ts"),
      encode(concat(lit(HtmlPrefix), col("text"), lit(HtmlSuffix)), "UTF-8")
        .as("html"),
      col("text"),
      col("lang"))

  /** The text extractor over the html binary column. Per the input_hint
    * invariant, extract(html) must equal `text` byte-for-byte per url —
    * enforced by PagesSpec and the mm_extract query. */
  def extractText(html: Array[Byte]): String = {
    val s = new String(html, java.nio.charset.StandardCharsets.UTF_8)
    val i = s.indexOf(HtmlPrefix)
    val j = s.lastIndexOf(HtmlSuffix)
    if (i < 0 || j < 0 || j < i) "" else s.substring(i + HtmlPrefix.length, j)
  }

  val extractTextUdf = udf(extractText _)

  /** STUB vectorized decoder — the exact call shape a real media library
    * gets in a mapInPandas-style pipeline: ONE call per batch of binary
    * buffers, one feature row back per buffer. Deterministic
    * byte-histogram features stand in for decoder output (no image/audio
    * libs ship in this container); swapping in a real decoder changes only
    * this function. */
  def decodeBatch(batch: Array[Array[Byte]], dim: Int): Array[Array[Double]] = {
    val out = Array.ofDim[Double](batch.length, dim)
    var r = 0
    while (r < batch.length) {
      val bytes = batch(r)
      val feats = out(r)
      var i = 0
      while (i < bytes.length) { feats((bytes(i) & 0x7f) % dim) += 1.0; i += 1 }
      val n = math.max(1.0, bytes.length.toDouble)
      var k = 0
      while (k < dim) { feats(k) /= n; k += 1 }
      r += 1
    }
    out
  }

  /** Multimodal feature extraction over opaque binary columns, batched per
    * partition (the Scala analogue of mapInPandas): rows are buffered into
    * batches of 64 and the decoder is invoked ONCE PER BATCH with the whole
    * buffer array — the real vectorized-UDF contract, not a per-row loop
    * dressed up in `grouped`. */
  def extractFeatures(pages: DataFrame, dim: Int = 8, batchSize: Int = 64): DataFrame = {
    val spark = pages.sparkSession
    import spark.implicits._
    val in = pages.select(col("url"), col("html")).as[(String, Array[Byte])]
    in.mapPartitions { it =>
      it.grouped(batchSize).flatMap { batch =>
        val arr = batch.toArray
        val feats = decodeBatch(arr.map(_._2), dim) // ONE call per batch
        arr.indices.iterator.map { i =>
          (arr(i)._1, arr(i)._2.length.toLong, feats(i))
        }
      }
    }.toDF("url", "n_bytes", "features")
  }
}
