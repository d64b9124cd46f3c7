package graft.sources

import org.apache.spark.sql.{Column, DataFrame, Dataset, SparkSession}
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

  /** Deterministic crawl-noise augmentation for small scale factors: every
    * 10th page gains a syntactic URL variant of itself — the SAME resource
    * re-crawled 100k seconds later under a cosmetically different URL
    * (uppercase authority / www. prefix / explicit :443 / tracking query +
    * fragment + trailing slash, cycling by doc position). Gives
    * [[urlDedup]] true positives at test scale, like Dedup.augment. */
  def withUrlVariants(pages: DataFrame): DataFrame = {
    val scheme = regexp_extract(col("url"), "^([A-Za-z]+)://", 1)
    val host = regexp_extract(col("url"), "^[A-Za-z]+://([^/?#]+)", 1)
    val rest = regexp_extract(col("url"), "^[A-Za-z]+://[^/?#]+(.*)$", 1)
    // deterministic portable selector: the doc_id embedded in the url tail
    // (xxhash64 would be opaque to the cross-engine oracle)
    val pos = regexp_extract(col("url"), "([0-9]+)$", 1).cast("long")
    val variantUrl = when(pmod(pos, lit(40)) === 0,
      concat(upper(scheme), lit("://"), upper(host), rest))
      .when(pmod(pos, lit(40)) === 10,
        concat(scheme, lit("://www."), host, rest))
      .when(pmod(pos, lit(40)) === 20,
        concat(scheme, lit("://"), host, lit(":443"), rest))
      .otherwise(concat(scheme, lit("://"), host, rest,
        lit("/?utm_source=feed#frag")))
    val variants = pages
      .filter(pmod(pos, lit(10)) === 0)
      .select(variantUrl.as("url"),
        timestamp_add("SECOND", lit(100000), col("warc_ts")).as("warc_ts"),
        col("html"), col("text"), col("lang"))
    pages.unionByName(variants)
  }

  /** Canonical URL: fragment stripped, a sole utm tracking query dropped,
    * scheme+host lowercased, leading www. and default :443/:80 ports
    * removed, trailing slash trimmed. Every step is a single-match regex so
    * the DuckDB oracle applies the identical rewrites. */
  def canonicalUrl(url: Column): Column = {
    val noFrag = regexp_replace(url, "#.*$", "")
    val noUtm = regexp_replace(noFrag, "\\?utm_[a-z]+=[^&#]*$", "")
    val scheme = lower(regexp_extract(noUtm, "^([A-Za-z]+)://", 1))
    val host0 = lower(regexp_extract(noUtm, "^[A-Za-z]+://([^/?#]+)", 1))
    val host = regexp_replace(regexp_replace(host0, "^www\\.", ""),
      ":(443|80)$", "")
    val rest = regexp_replace(
      regexp_extract(noUtm, "^[A-Za-z]+://[^/?#]+(.*)$", 1), "/$", "")
    concat(scheme, lit("://"), host, rest)
  }

  /** Canonical-URL dedup — the first stage of every web-crawl pipeline:
    * group pages by canonical URL, keep the LATEST crawl (max warc_ts,
    * ties to the lexicographically largest raw url — a total order either
    * way, chosen because it is one max_by struct), and report the variant
    * count. ONE hash aggregate, no window, no skew surface; at 100 TB this
    * is a single shuffle on canonical_url. */
  def urlDedup(pages: DataFrame): DataFrame =
    pages
      .select(canonicalUrl(col("url")).as("canonical_url"), col("url"),
        col("warc_ts"))
      .groupBy(col("canonical_url"))
      .agg(
        count(lit(1)).cast("int").as("n_variants"),
        max_by(col("url"), struct(col("warc_ts"), col("url"))).as("kept_url"),
        max(col("warc_ts")).cast("long").as("last_ts"),
        min(col("warc_ts")).cast("long").as("first_ts"))

  /** Per-host document quota (the RefinedWeb/C4 anti-domination cap): keep
    * at most `k` pages per site, preferring the earliest crawl (total order
    * (warc_ts, url), so the selection is deterministic and equals the
    * row_number<=k definition the oracle uses). The synthetic corpus encodes
    * the site in the url's first path segment (every page shares one test
    * authority); production swaps the regex for the URL authority or a
    * registrable-domain extractor — the plan is unchanged.
    *
    * Scale shape: NO corpus-sized per-host window (a hot host — a mega-blog
    * platform — would pin an executor). Two salted aggregations instead:
    * fan each host across `fanout` sub-groups keyed by a url hash, take the
    * k earliest per sub-group (aggregation state = that sub-group only,
    * |host|/fanout rows; size fanout so this fits), then merge the at most
    * fanout*k survivors per host — bounded second stage regardless of host
    * skew. Same salting philosophy as plans/SaltedJoin. */
  def hostQuota(pages: DataFrame, k: Int = 10, fanout: Int = 16): DataFrame = {
    val host = regexp_extract(col("url"), "^[A-Za-z]+://[^/?#]+/([^/?#]+)", 1)
    val item = struct(col("warc_ts"), col("url"))
    pages
      .select(host.as("host"), col("url"), col("warc_ts"))
      .groupBy(col("host"), pmod(xxhash64(col("url")), lit(fanout)).as("fan"))
      .agg(slice(array_sort(collect_list(item)), 1, k).as("top"))
      .groupBy(col("host"))
      .agg(slice(array_sort(flatten(collect_list(col("top")))), 1, k).as("top"))
      .select(col("host"), explode(col("top")).as("kept"))
      .select(col("host"), col("kept.url").as("url"),
        col("kept.warc_ts").cast("long").as("warc_ts"))
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
