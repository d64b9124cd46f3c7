package graft.link

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._
import graft.Pipeline
import graft.model.Bow
import graft.text.TextOps

/** Single-shuffle annotate pipeline (the 100 TB shape).
  *
  * Plan: pages scan -> flatMap n-gram spans (doc-local, no shuffle) ->
  * equi-join on the blocking key -> per-qid feature attachment (rank
  * precomputed from pagerank) -> groupByKey(doc_id), the ONE shuffle ->
  * flatMapGroups running NO_SUB overlap resolution, the tagsLimit cap,
  * the prune filter, per-mention top-10 by rank, and the full context
  * classifier in memory (DocClassifier.scoreDoc).
  *
  * Feature attachment has two strategies (size-gated, differential-tested
  * equal):
  *  - "broadcast": collect the (small) dictionary once and ship a map —
  *    thin shuffle rows, zero extra joins. Right while the dictionary fits
  *    comfortably on the driver (<= BroadcastDictLimit rows).
  *  - "join": per-qid features stay a DataFrame and attach via an
  *    equi-join on qid before the doc shuffle. No driver-side collect
  *    whose volume scales with dictionary size — the 10^7-10^8-item path.
  *
  * Every per-document step is bounded (<= 500 spans x 10 tags), so the
  * fused group function is O(1) memory per key. The declarative stages
  * (Mentions/Scoring) remain the semantic oracle: FusedSpec pins this
  * path equal to the staged path, and the driver's DuckDB oracle checks
  * the staged path independently.
  */
object FusedAnnotate {

  /** Above this dictionary size the "auto" strategy flips from the
    * collect+broadcast map to the qid equi-join. */
  val BroadcastDictLimit = 1000000L

  /** per-qid static features, rank = 23 + ln(pagerank) folded in. */
  final case class QidFeat(label: String, edges: Array[Int],
      nbStatements: Int, nbSitelinks: Int, rank: Double)

  final case class SpanHit(doc_id: Long, norm_key: String, start: Int, end: Int,
      surface: String, qid: String)

  /** A span hit with its entity features attached (the join strategy's
    * shuffle row). */
  final case class FeatHit(doc_id: Long, norm_key: String, start: Int, end: Int,
      surface: String, qid: String, label: String, edges: Seq[Int],
      nb_statements: Int, nb_sitelinks: Int, rank: Double)

  /** Per-qid feature FRAME (no driver collect): entity dict left-joined
    * with pagerank, OOV defaults folded in (wikidatagraph.py:165-170). */
  def qidFeatureFrame(a: Pipeline.Artifacts): DataFrame = {
    val pr = a.pagerank
    a.entityDict
      .select(col("id").as("qid"), col("label"), col("edges"),
        col("nb_statements"), col("nb_sitelinks"),
        expr("cast(substring(id, 2) as long)").as("qid_num"))
      .join(pr.ranks.select(col("qid").cast("long").as("qid_num"),
        col("rank").as("pr_rank")), Seq("qid_num"), "left")
      .withColumn("rank",
        lit(23.0) + log(graft.graph.PageRank.lookupExpr("qid_num", "pr_rank", pr)))
      .drop("qid_num", "pr_rank")
  }

  def qidFeatures(a: Pipeline.Artifacts): Map[String, QidFeat] =
    qidFeatureFrame(a)
      .select("qid", "label", "edges", "nb_statements", "nb_sitelinks", "rank")
      .collect().map { r =>
        r.getString(0) -> QidFeat(r.getString(1),
          r.getAs[scala.collection.Seq[Int]](2).toArray,
          r.getInt(3), r.getInt(4), r.getDouble(5))
      }.toMap

  /** Doc-local pipeline: NO_SUB -> tagsLimit -> prune -> top-10 by rank ->
    * context classifier -> per-mention argmax. Shared by both strategies. */
  private def processDoc(docId: Long, all: Array[FeatHit], bm: Bow.Model,
      params: Scoring.Params, model: Scoring.SvmModel): Iterator[DocClassifier.BestLink] = {
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
    val tags = pruned.flatMap { span =>
      val hs = bySpan(span)
      val surface = hs.head.surface
      val normKey = hs.head.norm_key
      val ll = -bm.phraseLL(surface)
      hs.groupBy(_.qid).values.map(_.head).toArray
        .sortBy(h => (-h.rank, h.qid))
        .take(Mentions.TopTagsPerMention)
        .zipWithIndex
        .map { case (h, i) =>
          DocClassifier.TagRow(docId, span._1, span._2, surface, normKey,
            ll, h.qid, h.qid.drop(1).toLong, h.label, h.edges,
            h.nb_statements, h.nb_sitelinks, h.rank, i + 1)
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
  }

  /** Annotate end-to-end with one shuffle. Returns BestLink rows.
    * strategy: "auto" (size-gated), "broadcast", or "join". */
  def annotate(docs: DataFrame, a: Pipeline.Artifacts,
      params: Scoring.Params, model: Scoring.SvmModel,
      strategy: String = "auto"): DataFrame = {
    val spark = docs.sparkSession
    import spark.implicits._

    val bow = spark.sparkContext.broadcast(a.bow)
    val spans = Mentions.candidateSpans(docs, a.maxKeyTokens)

    val useBroadcast = strategy match {
      case "broadcast" => true
      case "join" => false
      case "auto" => a.entityDict.count() <= BroadcastDictLimit
      case other => throw new IllegalArgumentException(s"unknown strategy: $other")
    }

    if (useBroadcast) {
      val feats = spark.sparkContext.broadcast(qidFeatures(a))
      val hits = spans
        .join(broadcast(a.dictKeys.select("norm_key", "qid")), Seq("norm_key"))
        .select(col("doc_id"), col("norm_key"), col("start"), col("end"),
          col("surface"), col("qid"))
        .as[SpanHit]
      hits.groupByKey(_.doc_id).flatMapGroups { (docId, it) =>
        val fm = feats.value
        val all = it.toArray.flatMap { h =>
          fm.get(h.qid).map(f => FeatHit(h.doc_id, h.norm_key, h.start, h.end,
            h.surface, h.qid, f.label, f.edges, f.nbStatements,
            f.nbSitelinks, f.rank))
        }
        processDoc(docId, all, bow.value, params, model)
      }.toDF()
    } else {
      // join strategy: features flow through the shuffle; the dict never
      // lands on the driver. dictKeys join stays an equi-join (Spark picks
      // broadcast vs shuffle by stats); feature join keys on qid.
      val hits = spans
        .join(a.dictKeys.select("norm_key", "qid"), Seq("norm_key"))
        .join(qidFeatureFrame(a), Seq("qid"))
        .select(col("doc_id"), col("norm_key"), col("start"), col("end"),
          col("surface"), col("qid"), col("label"), col("edges"),
          col("nb_statements"), col("nb_sitelinks"), col("rank"))
        .as[FeatHit]
      hits.groupByKey(_.doc_id).flatMapGroups { (docId, it) =>
        processDoc(docId, it.toArray, bow.value, params, model)
      }.toDF()
    }
  }
}
