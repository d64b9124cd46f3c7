package graft.link

import org.apache.spark.sql.{DataFrame, Dataset}
import org.apache.spark.sql.functions._

/** Fused, document-local execution of the context classifier
  * (classifier.py:262-375): similarity graph, feature propagation and SVM
  * scoring computed per document inside one `flatMapGroups`.
  *
  * Why this exists alongside the declarative Scoring path: the classifier
  * is strictly doc-local with a bounded working set (<= 500 spans x 10 tags
  * per document, tagger.py:45,118), so expressing it as six doc-keyed
  * DataFrame joins shuffles the same rows repeatedly. Fusing turns the
  * whole stage into ONE shuffle (groupBy doc) + in-memory arithmetic —
  * exactly the reference's per-document numpy execution, distributed over
  * documents. The declarative path remains the semantic oracle; a
  * differential test pins fused == declarative.
  */
object DocClassifier {

  final case class TagRow(
      doc_id: Long, start: Int, end: Int, surface: String, norm_key: String,
      log_likelihood: Double, qid: String, qid_num: Long, label: String,
      edges: Seq[Int], nb_statements: Int, nb_sitelinks: Int,
      rank: Double, tag_order: Int)

  final case class BestLink(
      doc_id: Long, start: Int, end: Int, surface: String, norm_key: String,
      best_qid: String, best_label: String, score: Double)

  private def simFn(params: Scoring.Params): (Long, Set[Long], Long, Set[Long]) => Double =
    params.similarity match {
      case "direct_link" => (qa, ea, qb, eb) => {
        val d1 = if (qa == qb || ea.contains(qb)) 1.0 else 0.0
        val d2 = if (qb == qa || eb.contains(qa)) 1.0 else 0.0
        d1 + d2
      }
      case "edge_ratio" => (qa, ea, qb, eb) => {
        val a = ea + qa
        val b = eb + qb
        val common = a.intersect(b).size.toDouble
        0.5 * (common / a.size + common / b.size)
      }
      case "one_step" =>
        val beta = params.beta
        (qa, ea, qb, eb) => {
          val common = ea.intersect(eb).size.toDouble
          var p = 0.0
          if (qa == qb) p += beta * beta
          if (ea.contains(qb)) p += (1 - beta) * beta / ea.size
          if (eb.contains(qa)) p += beta * (1 - beta) / eb.size
          if (common > 0) p += (1 - beta) * (1 - beta) * (common / ea.size) * (common / eb.size)
          p
        }
      case other => throw new IllegalArgumentException(s"unknown similarity: $other")
    }

  /** Score every tag of one document; returns (tagIndex -> score). */
  def scoreDoc(tags: Array[TagRow], params: Scoring.Params,
      model: Scoring.SvmModel): Array[Double] = {
    val n = tags.length
    val sim = simFn(params)
    val edgeSets = tags.map(_.edges.iterator.map(_.toLong).toSet)
    val d = params.maxSimilarityDistance

    // similarity lists per tag (compute_similarities): src tag i -> list of
    // (dst tag j, weight); self entry first with the smoothing seed
    val adjSrc = new Array[Array[(Int, Double)]](n)
    var i = 0
    while (i < n) {
      val ti = tags(i)
      val buf = Array.newBuilder[(Int, Double)]
      buf += ((i, params.similaritySmoothing))
      var j = 0
      while (j < n) {
        val tj = tags(j)
        val distance = math.max(ti.start - tj.end, tj.start - ti.end)
        if (!(tj.start == ti.start && tj.end == ti.end) && distance <= d) {
          val s = (params.similaritySmoothing +
            sim(ti.qid_num, edgeSets(i), tj.qid_num, edgeSets(j))) *
            (d - distance).toDouble / d
          if (s > 0.0) buf += ((j, s))
        }
        j += 1
      }
      val entries = buf.result()
      val total = entries.iterator.map(_._2).sum
      adjSrc(i) = entries.map { case (k, v) => (k, v / total) }
      i += 1
    }

    // propagation: F'[dst] += w(src->dst) * F[src]
    var feats = tags.map(t => Array(t.log_likelihood, t.rank,
      t.nb_statements.toDouble, t.nb_sitelinks.toDouble, 1.0))
    val stacked = tags.map(_ => Array.newBuilder[Double])
    i = 0
    while (i < n) { stacked(i) ++= feats(i); i += 1 }
    var step = 0
    while (step < params.nbSteps) {
      val next = Array.fill(n)(new Array[Double](5))
      var src = 0
      while (src < n) {
        val f = feats(src)
        adjSrc(src).foreach { case (dst, w) =>
          val acc = next(dst)
          var k = 0
          while (k < 5) { acc(k) += w * f(k); k += 1 }
        }
        src += 1
      }
      feats = next
      i = 0
      while (i < n) { stacked(i) ++= feats(i); i += 1 }
      step += 1
    }

    stacked.map { b =>
      val x = b.result()
      var s = model.intercept
      var k = 0
      while (k < x.length) {
        s += model.weights(k) * ((x(k) - model.mean(k)) / model.scale(k))
        k += 1
      }
      s
    }
  }

  /** Fused best-link stage: one doc-keyed shuffle, in-memory classifier. */
  def bestLinks(tags: DataFrame, params: Scoring.Params,
      model: Scoring.SvmModel): DataFrame = {
    val spark = tags.sparkSession
    import spark.implicits._
    val typed: Dataset[TagRow] = tags.select(
      col("doc_id").cast("long"), col("start"), col("end"), col("surface"),
      col("norm_key"), col("log_likelihood").cast("double"), col("qid"),
      col("qid_num").cast("long"), col("label"), col("edges"),
      col("nb_statements").cast("int"), col("nb_sitelinks").cast("int"),
      col("rank").cast("double"), col("tag_order").cast("int")).as[TagRow]

    typed.groupByKey(_.doc_id).flatMapGroups { (_, it) =>
      val docTags = it.toArray.sortBy(t => (t.start, t.end, t.tag_order))
      val scores = scoreDoc(docTags, params, model)
      // per-mention argmax with score > 0, ties by tag_order
      // (classify_mentions, classifier.py:323-338)
      docTags.indices
        .groupBy(i => (docTags(i).start, docTags(i).end))
        .valuesIterator
        .flatMap { idxs =>
          val best = idxs
            .filter(i => scores(i) > 0.0)
            .sortBy(i => (-scores(i), docTags(i).tag_order))
            .headOption
          best.map { i =>
            val t = docTags(i)
            BestLink(t.doc_id, t.start, t.end, t.surface, t.norm_key,
              t.qid, t.label, scores(i))
          }
        }
    }.toDF()
  }
}
