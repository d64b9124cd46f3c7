package graft.link

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

/** The JSON annotation sink: the reference API response shape
  * (mention.json mention.py:22-30, tag.json tag.py:48-62, app.py:68-81)
  * as a `to_json(struct(...))` projection — one JSON document per page
  * with its mentions and candidate tags.
  */
object Annotations {

  /** Join best links with their candidate tags and serialize per doc:
    * {"doc_id":…, "annotations":[{"phrase","start","end","log_likelihood",
    * "best_qid","best_tag_label","tags":[{"id","label","rank","nb_statements",
    * "nb_sitelinks"}]}]} */
  def toJsonPerDoc(best: DataFrame, tags: DataFrame): DataFrame = {
    val tagStruct = struct(
      col("qid").as("id"), col("label"), col("rank"),
      col("nb_statements"), col("nb_sitelinks"), col("tag_order"))
    // best links carry log_likelihood themselves (BestLink schema)
    val tagsPerMention = tags
      .groupBy(col("doc_id"), col("start"), col("end"))
      .agg(sort_array(collect_list(tagStruct)).as("tags"))
    val mentions = best.join(tagsPerMention, Seq("doc_id", "start", "end"), "left")
      .select(col("doc_id"),
        struct(
          col("surface").as("phrase"), col("start"), col("end"),
          col("log_likelihood"),
          col("best_qid"), col("best_label").as("best_tag_label"),
          col("tags")).as("mention"))
    mentions
      .groupBy(col("doc_id"))
      .agg(sort_array(collect_list(struct(col("mention.start"),
        col("mention.end"), col("mention")))).as("sorted"))
      .select(col("doc_id"),
        to_json(struct(col("doc_id"),
          expr("transform(sorted, s -> s.mention)").as("annotations")))
          .as("json"))
  }
}
