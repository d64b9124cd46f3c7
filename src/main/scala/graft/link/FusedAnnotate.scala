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

  // Per-artifacts broadcast cache: annotate() used to collect the feature
  // map and re-broadcast it (plus the BOW model) on EVERY call — a fixed
  // per-call driver cost that ate into scaling efficiency. One broadcast
  // per Artifacts instance is the right lifecycle (the reference builds its
  // Solr index once and serves many tagging requests).
  // Keyed per (SparkContext, Artifacts): a broadcast created on a stopped
  // session must never be served to a new session reusing the same
  // Artifacts, and keying by context lets the listener below evict every
  // entry (broadcast handles + the collected feature maps) when its
  // application ends — the r3 ADVICE JVM-lifetime pin.
  private val bcCache =
    new java.util.concurrent.ConcurrentHashMap[
      (org.apache.spark.SparkContext, Pipeline.Artifacts),
      (org.apache.spark.broadcast.Broadcast[Bow.Model],
       org.apache.spark.broadcast.Broadcast[Map[String, QidFeat]])]()

  private val evictorInstalled =
    java.util.concurrent.ConcurrentHashMap.newKeySet[org.apache.spark.SparkContext]()

  private def broadcasts(spark: SparkSession, a: Pipeline.Artifacts) = {
    val sc = spark.sparkContext
    if (evictorInstalled.add(sc))
      sc.addSparkListener(new org.apache.spark.scheduler.SparkListener {
        override def onApplicationEnd(
            e: org.apache.spark.scheduler.SparkListenerApplicationEnd): Unit = {
          val it = bcCache.keySet().iterator()
          while (it.hasNext) { if (it.next()._1 eq sc) it.remove() }
          evictorInstalled.remove(sc); ()
        }
      })
    bcCache.computeIfAbsent((sc, a), _ =>
      (sc.broadcast(a.bow), sc.broadcast(qidFeatures(a))))
  }

  /** Doc-local pipeline: NO_SUB -> tagsLimit -> prune -> top-10 by rank ->
    * context classifier -> per-mention argmax. Shared by both strategies. */
  private def processDoc(docId: Long, all: Array[FeatHit], bm: Bow.Model,
      params: Scoring.Params, model: Scoring.SvmModel): Iterator[DocClassifier.BestLink] = {
    // Flat-array rewrite of the per-document tagger stage: the original
    // groupBy/exists version allocated a HashMap + per-span arrays and ran
    // an O(spans^2) containment scan; at 32 threads the allocation traffic
    // alone capped parallel scaling on this box. Semantics are pinned equal
    // to the staged declarative path by FusedSpec.
    if (all.isEmpty) return Iterator.empty
    // sort hits by (start, end); contiguous runs are the distinct spans in
    // document order (Solr returns spans ordered)
    java.util.Arrays.sort(all, (a: FeatHit, b: FeatHit) =>
      if (a.start != b.start) Integer.compare(a.start, b.start)
      else Integer.compare(a.end, b.end))
    // span run boundaries
    val runStart = new scala.collection.mutable.ArrayBuffer[Int](64)
    var i = 0
    while (i < all.length) {
      if (i == 0 || all(i).start != all(i - 1).start || all(i).end != all(i - 1).end)
        runStart += i
      i += 1
    }
    val nSpans = runStart.length
    // NO_SUB: a span is dropped iff strictly contained in another span.
    // Walk spans ordered by (start asc, end desc); every candidate
    // container precedes the contained span in that order, so one running
    // max over end positions replaces the O(spans^2) exists scan.
    val spanStart = new Array[Int](nSpans)
    val spanEnd = new Array[Int](nSpans)
    i = 0
    while (i < nSpans) {
      spanStart(i) = all(runStart(i)).start; spanEnd(i) = all(runStart(i)).end
      i += 1
    }
    // (start asc, end desc) order via a primitive packed-key sort: spans
    // are distinct (start, end) pairs bounded by the 10k text cap, so
    // (start << 14 | (16383 - end)) << 20 | idx sorts identically to the
    // previous boxed-Integer comparator sort without allocating an Integer
    // per span in the engine's hottest flatMapGroups (guide §1.2 /
    // per-task work)
    val packed = new Array[Long](nSpans)
    i = 0
    while (i < nSpans) {
      packed(i) = ((spanStart(i).toLong << 14 | (16383 - spanEnd(i)).toLong) << 20) | i.toLong
      i += 1
    }
    java.util.Arrays.sort(packed)
    val contained = new Array[Boolean](nSpans)
    var maxEnd = Int.MinValue
    i = 0
    while (i < nSpans) {
      val k = (packed(i) & 0xFFFFFL).toInt
      if (spanEnd(k) <= maxEnd) contained(k) = true
      else maxEnd = spanEnd(k)
      i += 1
    }
    // tagsLimit cap (document order) THEN prune filter (tagger.py:71-89)
    val keptIdx = new scala.collection.mutable.ArrayBuffer[Int](64)
    var taken = 0
    i = 0
    while (i < nSpans && taken < Mentions.TagsLimitPerDoc) {
      if (!contained(i)) {
        taken += 1
        if (!TextOps.prunePhrase(all(runStart(i)).surface)) keptIdx += i
      }
      i += 1
    }
    if (keptIdx.isEmpty) return Iterator.empty
    // per-mention candidates: dedup by qid (first hit wins), top-10 by
    // rank desc / qid asc, assembled directly in (start, end, tag_order)
    // order so the scoring pass needs no re-sort
    val tags = new scala.collection.mutable.ArrayBuffer[DocClassifier.TagRow](keptIdx.length * 4)
    keptIdx.foreach { k =>
      val lo = runStart(k)
      val hi = if (k + 1 < nSpans) runStart(k + 1) else all.length
      val surface = all(lo).surface
      val normKey = all(lo).norm_key
      val ll = -bm.phraseLL(surface)
      // dedup qid keeping first occurrence (run is small: <= a few dozen)
      val uniq = new scala.collection.mutable.ArrayBuffer[FeatHit](hi - lo)
      var j = lo
      while (j < hi) {
        val h = all(j)
        var seen = false
        var u = 0
        while (u < uniq.length && !seen) { if (uniq(u).qid == h.qid) seen = true; u += 1 }
        if (!seen) uniq += h
        j += 1
      }
      val byRank = uniq.toArray
      java.util.Arrays.sort(byRank, (a: FeatHit, b: FeatHit) =>
        if (a.rank != b.rank) java.lang.Double.compare(b.rank, a.rank)
        else a.qid.compareTo(b.qid))
      val top = math.min(byRank.length, Mentions.TopTagsPerMention)
      var t = 0
      while (t < top) {
        val h = byRank(t)
        tags += DocClassifier.TagRow(docId, spanStart(k), spanEnd(k), surface,
          normKey, ll, h.qid, h.qid.drop(1).toLong, h.label, h.edges,
          h.nb_statements, h.nb_sitelinks, h.rank, t + 1)
        t += 1
      }
    }
    val sorted = tags.toArray
    val scores = DocClassifier.scoreDoc(sorted, params, model)
    // per-mention argmax with score > 0; tags are grouped by span and
    // ordered by tag_order, so the first max in each run wins ties
    val out = new scala.collection.mutable.ArrayBuffer[DocClassifier.BestLink](nSpans)
    i = 0
    while (i < sorted.length) {
      val s = sorted(i).start; val e = sorted(i).end
      var hi = i
      while (hi < sorted.length && sorted(hi).start == s && sorted(hi).end == e) hi += 1
      var bestI = -1
      var bestScore = 0.0
      var j = i
      while (j < hi) {
        if (scores(j) > 0.0 && (bestI < 0 || scores(j) > bestScore)) {
          bestI = j; bestScore = scores(j)
        }
        j += 1
      }
      if (bestI >= 0) {
        val t = sorted(bestI)
        out += DocClassifier.BestLink(t.doc_id, t.start, t.end, t.surface,
          t.norm_key, t.log_likelihood, t.qid, t.label, scores(bestI))
      }
      i = hi
    }
    out.iterator
  }

  /** Annotate end-to-end with one shuffle. Returns BestLink rows.
    * strategy: "auto" (size-gated), "broadcast", "join", or "salted"
    * ("join" with the norm_key equi-join routed through
    * [[graft.plans.SaltedJoin]] — the explicit hot-alias-key salting path
    * for Zipfian web-mention skew once the dictionary outgrows broadcast;
    * `saltHotThreshold` is the estimated per-key row count above which a
    * key is salted). */
  def annotate(docs: DataFrame, a: Pipeline.Artifacts,
      params: Scoring.Params, model: Scoring.SvmModel,
      strategy: String = "auto",
      saltHotThreshold: Long = 500000L): DataFrame = {
    val spark = docs.sparkSession
    import spark.implicits._

    val bow = broadcasts(spark, a)._1
    val spans = Mentions.candidateSpans(docs, a.maxKeyTokens, a.analyzer,
      Some(Mentions.firstTokenFilter(a.dictKeys)))

    val useBroadcast = strategy match {
      case "broadcast" => true
      case "join" | "salted" => false
      case "auto" => a.dictCount <= BroadcastDictLimit
      case other => throw new IllegalArgumentException(s"unknown strategy: $other")
    }

    if (useBroadcast) {
      val feats = broadcasts(spark, a)._2
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
      // broadcast vs shuffle by stats); feature join keys on qid. "salted"
      // additionally scatters hot norm_keys over 16 shuffle partitions.
      val dictKeys = a.dictKeys.select("norm_key", "qid")
      val keyed =
        if (strategy == "salted")
          graft.plans.SaltedJoin.join(spans, dictKeys, "norm_key",
            salts = 16, hotThreshold = saltHotThreshold)
        else spans.join(dictKeys, Seq("norm_key"))
      val hits = keyed
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
