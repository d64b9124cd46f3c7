package graft.model

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._
import graft.text.TextOps

/** Bag-of-words unigram language model (languagemodel.py:21-88).
  *
  * Training ingests, per entity, the DEDUPLICATED set of words across the
  * entity's label + aliases (ingest_phrases, languagemodel.py:37-45); the
  * stored table keeps words with count >= threshold(2) but the smoothing
  * quotient uses the POST-threshold vocabulary size with the PRE-threshold
  * total count, matching the save->load lifecycle the reference tagger
  * actually runs with (save languagemodel.py:85-88, load + quotient
  * languagemodel.py:68-77,62-66).
  *
  *   ll(w)      = ln(smoothing + count(w)) - ln(smoothing*(1+V) + total)
  *   ll(phrase) = sum over bow-tokens;  mentions store the NEGATION
  *                (tagger.py:105,117)
  */
object Bow {

  val Smoothing = 1.0
  val Threshold = 2L

  final case class Model(wordCount: Map[String, Long], totalCount: Long) {
    val logQuotient: Double =
      math.log(Smoothing * (1 + wordCount.size) + totalCount)
    def wordLL(w: String): Double =
      math.log(Smoothing + wordCount.getOrElse(w, 0L)) - logQuotient
    def phraseLL(phrase: String): Double =
      TextOps.bowTokenize(phrase).map(wordLL).sum
  }

  /** Distributed build from the PARSED DUMP (train_from_dump,
    * languagemodel.py:96-126: every item with an `en` label contributes its
    * en label + en aliases, deduplicated per item — including items the
    * indexing profile later filters out). Explode per-item deduped
    * bow-tokens, hash-aggregate counts (map-side partial aggregation for
    * free). Returns (bow table with threshold applied, pre-threshold total
    * count). */
  def build(items: DataFrame): (DataFrame, Long) = {
    val spark = items.sparkSession
    import spark.implicits._
    val entityWords = udf { (label: String, aliases: Seq[String]) =>
      if (label == null) Seq.empty[String]
      else (Option(aliases).getOrElse(Seq.empty) :+ label)
        .flatMap(TextOps.bowTokenize).distinct
    }
    val words = items
      .select(
        col("it.labels")("en")("value").as("label"),
        expr("transform(coalesce(it.aliases['en'], array()), a -> a.value)").as("als"))
      .select(explode(entityWords($"label", $"als")).as("word"))
    val counts = words.groupBy($"word").agg(count(lit(1)).as("count"))
      .persist()
    val total = counts.agg(sum($"count")).head().getLong(0)
    val saved = counts.filter($"count" >= lit(Threshold))
    (saved, total)
  }

  /** Collect a (small) bow table into a broadcastable model. The bow table
    * for real Wikidata is ~10^7 rows / ~100MB — still broadcastable; beyond
    * that the ll lookup becomes a left join (SURVEY.md §2.3). */
  def collect(bow: DataFrame, total: Long): Model = {
    val m = bow.collect().map(r => r.getString(0) -> r.getLong(1)).toMap
    Model(m, total)
  }

  def buildModel(items: DataFrame): Model = {
    val (df, total) = build(items)
    val m = collect(df, total)
    df.unpersist()
    m
  }
}
