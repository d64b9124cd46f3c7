package graft.link

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.expressions.Window
import graft.functions.JaroWinkler.jaroWinkler

/** Pairwise mention scoring at the blocking key (north_rule): mentions that
  * share a normalized-surface blocking key are candidate same-entity pairs,
  * scored with Jaro-Winkler + Levenshtein surface similarity and the linked
  * entity agreement.
  *
  * Scale design: a naive within-block self-join is quadratic in the hot
  * (Zipfian) keys — "scan" alone would produce 10^10 pairs at web scale. We
  * use sorted-neighborhood pairing inside each block: mentions are ordered
  * deterministically within their block (doc_id, start) and each mention is
  * paired with its next `windowSize` neighbors — linear in block size,
  * shuffle-partitioned by block key, hot keys split by AQE. The F1 gate is
  * evaluated on exactly these deterministic labeled pairs.
  */
object Pairs {

  val WindowSize = 2

  /** Stable numeric mention id: doc_id * 10^8 + start * 10^4 + end offset
    * (spans are < 10^4 by the tagger text cap). */
  def mentionIdCol: org.apache.spark.sql.Column =
    (col("doc_id").cast("long") * lit(100000000L)) +
      (col("start").cast("long") * lit(10000L)) + col("end").cast("long")

  /** Sorted-neighborhood candidate pairs within each blocking key.
    * Input: linked mentions (doc_id, start, end, surface, norm_key,
    * best_qid). Output: one row per pair with surface similarities and the
    * same_entity decision (= linked entity agreement). */
  def candidatePairs(mentions: DataFrame, windowSize: Int = WindowSize): DataFrame = {
    val m = mentions
      .withColumn("mention_id", mentionIdCol)
      // blocking key = first token of the normalized surface: coarse enough
      // that one block mixes different entities ("merge" / "merge join" /
      // "sort merge join" variants), the realistic record-linkage setup
      .withColumn("block_key", split(col("norm_key"), " ").getItem(0))
    val w = Window.partitionBy(col("block_key")).orderBy(col("mention_id"))
    val withNext = (1 to windowSize).foldLeft(m) { (df, k) =>
      df.withColumn(s"next_id_$k", lead(col("mention_id"), k).over(w))
        .withColumn(s"next_surface_$k", lead(col("surface"), k).over(w))
        .withColumn(s"next_qid_$k", lead(col("best_qid"), k).over(w))
    }
    val pairCols = (1 to windowSize).map { k =>
      struct(col(s"next_id_$k").as("id2"), col(s"next_surface_$k").as("surface2"),
        col(s"next_qid_$k").as("qid2"))
    }
    withNext
      .select(col("block_key"), col("mention_id").as("id1"),
        col("surface").as("surface1"), col("best_qid").as("qid1"),
        explode(array(pairCols: _*)).as("p"))
      .filter(col("p.id2").isNotNull)
      .select(
        col("block_key"), col("id1"), col("p.id2").as("id2"),
        col("surface1"), col("p.surface2").as("surface2"),
        col("qid1"), col("p.qid2").as("qid2"))
      .withColumn("lev", levenshtein(col("surface1"), col("surface2")))
      .withColumn("jw", round(jaroWinkler(col("surface1"), col("surface2")), 6))
      .withColumn("same_entity",
        col("qid1").isNotNull && col("qid2").isNotNull && col("qid1") === col("qid2"))
  }

  /** same-entity edges for transitive clustering. */
  def sameEntityEdges(pairs: DataFrame): DataFrame =
    pairs.filter(col("same_entity"))
      .select(col("id1").as("src"), col("id2").as("dst"))

  /** Pairwise precision/recall/F1 of predicted same_entity labels vs gold
    * labels over the SAME pair universe (the gate in BASELINE.json). */
  def pairwiseF1(pairs: DataFrame, goldCol: String): (Double, Double, Double) = {
    val r = pairs.agg(
      sum(when(col("same_entity") && col(goldCol), 1L).otherwise(0L)).as("tp"),
      sum(when(col("same_entity") && !col(goldCol), 1L).otherwise(0L)).as("fp"),
      sum(when(!col("same_entity") && col(goldCol), 1L).otherwise(0L)).as("fn"))
      .head()
    val tp = r.getLong(0).toDouble
    val fp = r.getLong(1).toDouble
    val fn = r.getLong(2).toDouble
    val p = if (tp + fp > 0) tp / (tp + fp) else 1.0
    val rec = if (tp + fn > 0) tp / (tp + fn) else 1.0
    val f1 = if (p + rec > 0) 2 * p * rec / (p + rec) else 0.0
    (p, rec, f1)
  }
}
