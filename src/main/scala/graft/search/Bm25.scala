package graft.search

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

/** BM25 ranked retrieval over the documents table. The reference serves
  * every lookup through a Solr index (docs/install.rst, taggerfactory.py);
  * this models the RANKED-RETRIEVAL capability of that index generally —
  * what a user pointing Solr queries at the collection would get — rather
  * than re-deriving any one reference call site (tagger.py's tagging
  * endpoint is dictionary FST tagging, which lives in Mentions/
  * FusedAnnotate; it is not BM25). Here the inverted structure IS a
  * DataFrame and Catalyst picks the physical plan.
  *
  * Scale shape at 100 TB: the query-term table is a literal broadcast, so
  * the only corpus-sized work is one explode+filter (pushed to the scan's
  * matched terms), one (doc_id, term) partial-aggregated count, one per-doc
  * sum, and a TakeOrderedAndProject top-k — no corpus-sized shuffle beyond
  * the per-doc aggregation, no driver-side loop.
  */
object Bm25 {

  /** Okapi BM25 with k1/b defaults and the Robertson–Spärck Jones idf
    * ln(1 + (N - df + 0.5)/(df + 0.5)) (always positive). Scores are
    * rounded to 6 decimals BEFORE the top-k ordering so the cross-engine
    * oracle selects an identical row set at the k boundary.
    *
    * `corpusStats` = precomputed (N, avgdl). With a static corpus these
    * are computed once per snapshot alongside the dictionary artifacts and
    * passed in; left None, one scalar aggregate (an eager full-corpus
    * action) fetches them per call — fine for the driver-contract query,
    * wasteful inside a pipeline loop. An empty corpus returns an empty
    * result (avg() is NULL on zero rows; without the guard the stats fetch
    * would NPE). */
  def search(docs: DataFrame, terms: Seq[String], k: Int = 20,
      k1: Double = 1.2, b: Double = 0.75,
      corpusStats: Option[(Double, Double)] = None): DataFrame = {
    val spark = docs.sparkSession
    import spark.implicits._
    val toks = split(col("text"), " ")
    val (n, avgdl) = corpusStats.getOrElse {
      val stats = docs
        .agg(count(lit(1)).cast("double").as("n"),
          avg(size(toks).cast("double")).as("avgdl"))
        .head()
      if (stats.getDouble(0) == 0.0) (0.0, 0.0)
      else (stats.getDouble(0), stats.getDouble(1))
    }
    if (n == 0.0)
      return spark.emptyDataset[(Long, Double)].toDF("doc_id", "score")
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
