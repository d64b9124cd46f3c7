package graft.link

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._
import graft.Pipeline
import graft.model.Bow
import graft.text.TextOps

/** Single-shuffle annotate pipeline (the 100 TB shape).
  *
  * Plan: pages scan -> flatMap n-gram spans (doc-local, no shuffle) ->
  * broadcast equi-join on the blocking key -> broadcast join of per-qid
  * features (rank precomputed from pagerank) -> groupByKey(doc_id), the
  * ONE shuffle -> flatMapGroups running NO_SUB overlap resolution, the
  * tagsLimit cap, the prune filter, per-mention top-10 by rank, and the
  * full context classifier in memory (DocClassifier.scoreDoc).
  *
  * Every per-document step is bounded (<= 500 spans x 10 tags), so the
  * fused group function is O(1) memory per key. The declarative stages
  * (Mentions/Scoring) remain the semantic oracle: FusedSpec pins this
  * path equal to the staged path, and the driver's DuckDB oracle checks
  * the staged path independently.
  */
object FusedAnnotate {

  /** per-qid static features, rank = 23 + ln(pagerank) folded in. */
  final case class QidFeat(label: String, edges: Array[Int],
      nbStatements: Int, nbSitelinks: Int, rank: Double)

  final case class SpanHit(doc_id: Long, norm_key: String, start: Int, end: Int,
      surface: String, qid: String)

  def qidFeatures(a: Pipeline.Artifacts): Map[String, QidFeat] = {
    val pr = a.pagerank
    val ranks = pr.ranks.collect().map(r => r.getLong(0) -> r.getDouble(1)).toMap
    a.entityDict.select("id", "label", "edges", "nb_statements", "nb_sitelinks")
      .collect().map { r =>
        val qid = r.getString(0)
        val qn = qid.drop(1).toLong
        val p =
          if (ranks.contains(qn)) ranks(qn)
          else if (qn <= pr.lastQid) pr.background
          else 0.01 / pr.n
        qid -> QidFeat(r.getString(1),
          r.getAs[scala.collection.Seq[Int]](2).toArray,
          r.getInt(3), r.getInt(4), 23.0 + math.log(p))
      }.toMap
  }

  /** Annotate end-to-end with one shuffle. Returns BestLink rows. */
  def annotate(docs: DataFrame, a: Pipeline.Artifacts,
      params: Scoring.Params, model: Scoring.SvmModel): DataFrame = {
    val spark = docs.sparkSession
    import spark.implicits._

    val feats = spark.sparkContext.broadcast(qidFeatures(a))
    val bow = spark.sparkContext.broadcast(a.bow)

    val spans = Mentions.candidateSpans(docs, a.maxKeyTokens)
    val hits = spans
      .join(broadcast(a.dictKeys.select("norm_key", "qid")), Seq("norm_key"))
      .select(col("doc_id"), col("norm_key"), col("start"), col("end"),
        col("surface"), col("qid"))
      .as[SpanHit]

    hits.groupByKey(_.doc_id).flatMapGroups { (docId, it) =>
      val all = it.toArray
      // distinct spans in document order (Solr returns spans ordered)
      val bySpan = all.groupBy(h => (h.start, h.end))
      val spansSorted = bySpan.keys.toArray.sortInPlaceBy(identity)
      // NO_SUB: drop spans strictly contained in another matched span
      val kept = spansSorted.filter { case (s, e) =>
        !spansSorted.exists { case (s2, e2) =>
          s2 <= s && e <= e2 && !(s2 == s && e2 == e)
        }
      }
      // tagsLimit cap (document order), prune filter
      val pruned = kept.take(Mentions.TagsLimitPerDoc).filter { case (s, e) =>
        !TextOps.prunePhrase(bySpan((s, e)).head.surface)
      }
      // per-mention candidates: top-10 by rank desc, qid asc
      val fm = feats.value
      val bm = bow.value
      val tags = pruned.flatMap { span =>
        val hs = bySpan(span)
        val surface = hs.head.surface
        val normKey = hs.head.norm_key
        val ll = -bm.phraseLL(surface)
        hs.map(_.qid).distinct
          .flatMap(q => fm.get(q).map(f => (q, f)))
          .sortBy { case (q, f) => (-f.rank, q) }
          .take(Mentions.TopTagsPerMention)
          .zipWithIndex
          .map { case ((q, f), i) =>
            DocClassifier.TagRow(docId, span._1, span._2, surface, normKey,
              ll, q, q.drop(1).toLong, f.label, f.edges.toSeq,
              f.nbStatements, f.nbSitelinks, f.rank, i + 1)
          }
      }
      if (tags.isEmpty) Iterator.empty
      else {
        val sorted: Array[DocClassifier.TagRow] =
          tags.toArray.sortBy(t => (t.start, t.end, t.tag_order))
        val scores = DocClassifier.scoreDoc(sorted, params, model)
        sorted.indices
          .groupBy(i => (sorted(i).start, sorted(i).end))
          .valuesIterator
          .flatMap { idxs =>
            idxs.filter(i => scores(i) > 0.0)
              .sortBy(i => (-scores(i), sorted(i).tag_order))
              .headOption
              .map { i =>
                val t = sorted(i)
                DocClassifier.BestLink(t.doc_id, t.start, t.end, t.surface,
                  t.norm_key, t.log_likelihood, t.qid, t.label, scores(i))
              }
          }
      }
    }.toDF()
  }
}
