package graft.search

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

/** BM25 ranked retrieval over the documents table — the declarative
  * re-expression of the reference's Solr query side (opentapioca serves
  * every lookup through a Solr index, opentapioca/tagger.py:45-60; here the
  * inverted structure IS a DataFrame and Catalyst picks the physical plan).
  *
  * Scale shape at 100 TB: the query-term table is a literal broadcast, so
  * the only corpus-sized work is one explode+filter (pushed to the scan's
  * matched terms), one (doc_id, term) partial-aggregated count, one per-doc
  * sum, and a TakeOrderedAndProject top-k — no corpus-sized shuffle beyond
  * the per-doc aggregation, no driver-side loop. Corpus statistics (N,
  * avgdl) are a single scalar aggregate. With a static corpus they would be
  * precomputed once per snapshot like the dictionary artifacts.
  */
object Bm25 {

  /** Okapi BM25 with k1/b defaults and the Robertson–Spärck Jones idf
    * ln(1 + (N - df + 0.5)/(df + 0.5)) (always positive). Scores are
    * rounded to 6 decimals BEFORE the top-k ordering so the cross-engine
    * oracle selects an identical row set at the k boundary. */
  def search(docs: DataFrame, terms: Seq[String], k: Int = 20,
      k1: Double = 1.2, b: Double = 0.75): DataFrame = {
    val spark = docs.sparkSession
    import spark.implicits._
    val toks = split(col("text"), " ")
    val stats = docs
      .agg(count(lit(1)).cast("double").as("n"),
        avg(size(toks).cast("double")).as("avgdl"))
      .head()
    val (n, avgdl) = (stats.getDouble(0), stats.getDouble(1))
    val q = broadcast(terms.toDF("term"))
    // tf over query terms only: the explode never materializes non-matching
    // terms past the broadcast-hash-join probe
    val tf = docs
      .select(col("doc_id"), size(toks).cast("double").as("dl"),
        explode(toks).as("term"))
      .join(q, Seq("term"))
      .groupBy(col("doc_id"), col("term"))
      .agg(count(lit(1)).cast("double").as("tf"), first(col("dl")).as("dl"))
    // df per query term (<= |terms| rows -> broadcast back)
    val dfTbl = tf.groupBy(col("term")).agg(count(lit(1)).cast("double").as("df"))
    val idf = log(lit(1.0) + (lit(n) - col("df") + 0.5) / (col("df") + 0.5))
    val contrib = idf * col("tf") * lit(k1 + 1.0) /
      (col("tf") + lit(k1) * (lit(1.0 - b) + lit(b) * col("dl") / lit(avgdl)))
    tf.join(broadcast(dfTbl), Seq("term"))
      .groupBy(col("doc_id"))
      .agg(round(sum(contrib), 6).as("score"))
      .orderBy(col("score").desc, col("doc_id"))
      .limit(k)
  }
}
