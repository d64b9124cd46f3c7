package graft

import graft.dict.DictSpec

/** DuckDB oracle SQL generators. The entity-linking oracles recompute the
  * pipeline INDEPENDENTLY in SQL from literal inputs (the deterministic
  * dictionary spec inlined as VALUES), so the driver's DuckDB compare
  * genuinely re-derives mention extraction, ranking and pairing rather than
  * echoing the Spark output. Strings are generated from the single source
  * of truth (DictSpec) to prevent drift.
  */
object Oracles {

  private def q(s: String): String = "'" + s.replace("'", "''") + "'"

  // ---- literal inputs ------------------------------------------------------

  /** dict(norm_key, qid) VALUES clause. */
  def dictKeysValues: String =
    DictSpec.expectedDictKeys.sortBy(r => (r._1, r._2))
      .map { case (k, qid, _) => s"(${q(k)}, ${q(qid)})" }
      .mkString(", ")

  /** weighted graph edges (src, dst, w) VALUES clause. */
  def graphEdgeValues: String =
    DictSpec.weightedEdges
      .map { case (s, d, w) => s"($s, $d, $w)" }
      .mkString(", ")

  /** raw (item, term) rows feeding the BOW oracle: en label + en aliases of
    * EVERY dump item with an en label (train_from_dump semantics). */
  def bowTermValues: String =
    DictSpec.allEntities.flatMap { ent =>
      ent.labels.get("en").map { lbl =>
        (ent.aliases.getOrElse("en", Seq.empty) :+ lbl)
          .map(t => s"(${q(ent.qid)}, ${q(t)})")
      }
    }.flatten.mkString(", ")

  // ---- mention extraction (tokenize -> n-gram -> dict join -> NO_SUB ->
  //      cap -> prune) entirely in DuckDB SQL -------------------------------

  /** CTE chain ending in `mentions(doc_id, m_start, m_end, surface)`.
    * Tokenization = single-space split (byte-exact vs the engine tokenizer
    * on this corpus's character inventory: lowercase ASCII words, single
    * spaces); offsets reconstructed with a running-length window. */
  def mentionsCtes: String =
    s"""dict(norm_key, qid) AS (VALUES $dictKeysValues),
       |toks AS MATERIALIZED (
       |  SELECT doc_id,
       |         unnest(string_split(substr(text, 1, 10000), ' ')) AS tok,
       |         generate_subscripts(string_split(substr(text, 1, 10000), ' '), 1) AS i
       |  FROM documents
       |),
       |pos AS MATERIALIZED (
       |  SELECT doc_id, tok, i,
       |         CAST(coalesce(sum(length(tok) + 1) OVER (
       |           PARTITION BY doc_id ORDER BY i
       |           ROWS BETWEEN UNBOUNDED PRECEDING AND 1 PRECEDING), 0) AS INTEGER) AS s,
       |         CAST(coalesce(sum(length(tok) + 1) OVER (
       |           PARTITION BY doc_id ORDER BY i
       |           ROWS BETWEEN UNBOUNDED PRECEDING AND 1 PRECEDING), 0)
       |           + length(tok) AS INTEGER) AS e
       |  FROM toks
       |),
       |grams AS MATERIALIZED (
       |  SELECT doc_id, tok AS key, s, e FROM pos
       |  UNION ALL
       |  SELECT a.doc_id, a.tok || ' ' || b.tok, a.s, b.e
       |  FROM pos a JOIN pos b ON a.doc_id = b.doc_id AND b.i = a.i + 1
       |  UNION ALL
       |  SELECT a.doc_id, a.tok || ' ' || b.tok || ' ' || c.tok, a.s, c.e
       |  FROM pos a JOIN pos b ON a.doc_id = b.doc_id AND b.i = a.i + 1
       |       JOIN pos c ON a.doc_id = c.doc_id AND c.i = a.i + 2
       |),
       |matched AS MATERIALIZED (
       |  SELECT DISTINCT g.doc_id, g.s, g.e FROM grams g JOIN dict d ON g.key = d.norm_key
       |),
       |nosub AS (
       |  SELECT m.* FROM matched m
       |  WHERE NOT EXISTS (
       |    SELECT 1 FROM matched o
       |    WHERE o.doc_id = m.doc_id AND o.s <= m.s AND m.e <= o.e
       |      AND NOT (o.s = m.s AND o.e = m.e))
       |),
       |capped AS MATERIALIZED (
       |  SELECT *, row_number() OVER (PARTITION BY doc_id ORDER BY s, e) AS span_rank
       |  FROM nosub
       |),
       |mentions AS MATERIALIZED (
       |  SELECT c.doc_id, c.s AS m_start, c.e AS m_end,
       |         substr(d.text, c.s + 1, c.e - c.s) AS surface
       |  FROM capped c JOIN documents d ON d.doc_id = c.doc_id
       |  WHERE c.span_rank <= 500
       |    AND NOT (regexp_matches(substr(d.text, c.s + 1, c.e - c.s), '^([a-zA-Z0-9_]{1,2}|[0-9 ]{0,4})$$')
       |             AND substr(d.text, c.s + 1, c.e - c.s) = lower(substr(d.text, c.s + 1, c.e - c.s)))
       |)""".stripMargin

  val elMentionsSql: String =
    s"""WITH $mentionsCtes
       |SELECT doc_id, m_start, m_end, surface FROM mentions""".stripMargin

  // ---- pagerank: dense 16-iteration unrolled power method ------------------

  /** CTE chain ending in `pr(id, r)` over indices [0, N). */
  def pagerankCtes: String = {
    val n = DictSpec.graphN
    val sb = new StringBuilder
    sb.append(s"gedges(src, dst, w) AS MATERIALIZED (VALUES $graphEdgeValues),\n")
    sb.append(s"ids AS (SELECT CAST(range AS INTEGER) AS id FROM range(0, $n)),\n")
    sb.append(s"v0 AS MATERIALIZED (SELECT id, 1.0/$n AS r FROM ids)")
    for (k <- 1 to 16) {
      sb.append(s""",
        |nv$k AS MATERIALIZED (
        |  SELECT i.id, coalesce(s.mass, 0.0) AS m
        |  FROM ids i LEFT JOIN (
        |    SELECT dst, sum(w * v.r) AS mass
        |    FROM gedges e JOIN v${k - 1} v ON v.id = e.src GROUP BY dst) s
        |  ON s.dst = i.id
        |),
        |v$k AS MATERIALIZED (SELECT id, m + (1.0 - (SELECT sum(m) FROM nv$k)) / $n AS r FROM nv$k)""".stripMargin)
    }
    sb.append(",\npr AS MATERIALIZED (SELECT id, r FROM v16)")
    sb.toString
  }

  /** graph node set (sources and targets) as a SQL IN-list. */
  def graphNodeList: String =
    DictSpec.weightedEdges.flatMap(e => Seq(e._1, e._2)).distinct.sorted.mkString(", ")

  val elPagerankSql: String =
    s"""WITH $pagerankCtes
       |SELECT id AS qid_num, round(r, 6) AS rank FROM pr
       |WHERE id IN ($graphNodeList)""".stripMargin

  // ---- candidates: mentions x dict -> rank -> top 10 -----------------------

  val elCandidatesSql: String =
    s"""WITH $mentionsCtes,
       |$pagerankCtes,
       |cand AS MATERIALIZED (
       |  SELECT m.doc_id, m.m_start, m.m_end, d.qid,
       |         23.0 + ln(p.r) AS rank
       |  FROM mentions m
       |  JOIN dict d ON d.norm_key = m.surface
       |  JOIN pr p ON p.id = CAST(substr(d.qid, 2) AS INTEGER)
       |)
       |SELECT doc_id, m_start, m_end, qid, round(rank, 6) AS rank,
       |       CAST(tag_order AS INTEGER) AS tag_order
       |FROM (
       |  SELECT *, row_number() OVER (
       |    PARTITION BY doc_id, m_start, m_end
       |    ORDER BY rank DESC, qid) AS tag_order
       |  FROM cand)
       |WHERE tag_order <= 10""".stripMargin

  // ---- best link per mention (frozen default model: score == rank) --------

  val elAnnotateSql: String =
    s"""WITH $mentionsCtes,
       |$pagerankCtes,
       |cand AS MATERIALIZED (
       |  SELECT m.doc_id, m.m_start, m.m_end, m.surface, d.qid,
       |         23.0 + ln(p.r) AS rank
       |  FROM mentions m
       |  JOIN dict d ON d.norm_key = m.surface
       |  JOIN pr p ON p.id = CAST(substr(d.qid, 2) AS INTEGER)
       |)
       |SELECT doc_id, m_start, m_end, surface, qid AS best_qid
       |FROM (
       |  SELECT *, row_number() OVER (
       |    PARTITION BY doc_id, m_start, m_end
       |    ORDER BY rank DESC, qid) AS tag_order
       |  FROM cand)
       |WHERE tag_order = 1""".stripMargin

  // ---- best link under the frozen NON-TRIVIAL context model ---------------
  // Re-derives the whole classifier (classifier.py:262-375) in SQL:
  // per-qid features, BOW phrase log-likelihood, similarity edges with
  // distance decay + smoothing + per-source normalization, TWO unrolled
  // propagation steps, the standardized linear decision function, and the
  // per-mention argmax with score > 0.

  /** per-qid static features incl. the outgoing-edge list. */
  def featValues: String =
    DictSpec.expectedDict.sortBy(_.id).map { r =>
      val edges = r.edges.mkString("[", ",", "]")
      s"(${q(r.id)}, ${r.id.drop(1).toLong}, ${r.nbStatements}, " +
        s"${r.nbSitelinks}, $edges::BIGINT[])"
    }.mkString(", ")

  /** CTE chain ending in `surfll(surface, ll)`: the BOW phrase negative
    * log-likelihood of every distinct mention surface, from first
    * principles (requires `mentions` in scope). */
  def bowLlCtes: String =
    s"""bowterms(item, term) AS (VALUES $bowTermValues),
       |bowwords AS MATERIALIZED (
       |  SELECT DISTINCT item, unnest(string_split(term, ' ')) AS word FROM bowterms),
       |bowall AS MATERIALIZED (SELECT word, count(*) AS cnt FROM bowwords GROUP BY word),
       |bowsaved AS MATERIALIZED (SELECT word, cnt FROM bowall WHERE cnt >= 2),
       |bowq AS MATERIALIZED (
       |  SELECT ln(1.0 * (1 + (SELECT count(*) FROM bowsaved)) + (SELECT sum(cnt) FROM bowall)) AS lnq),
       |surfll AS MATERIALIZED (
       |  SELECT surface,
       |         -(SELECT sum(ln(1.0 + coalesce((SELECT cnt FROM bowsaved b WHERE b.word = t.w), 0))
       |                      - (SELECT lnq FROM bowq))
       |           FROM unnest(string_split(surface, ' ')) t(w)) AS ll
       |  FROM (SELECT DISTINCT surface FROM mentions)
       |)""".stripMargin

  val elAnnotateCtxSql: String = annotateSqlFor(graft.link.Scoring.ctxModel(2))

  /** el_annotate_trained: same full-classifier derivation under the FROZEN
    * spark.ml-TRAINED model (Scoring.trainedModel, graft.TrainFreeze). */
  val elAnnotateTrainedSql: String = annotateSqlFor(graft.link.Scoring.trainedModel())

  /** Full context-classifier oracle parameterized by the served model:
    * re-derives BOW ll, similarity edges w/ decay+smoothing+normalization,
    * two unrolled propagation steps, the standardized linear decision
    * function with the model's literals inlined, and the argmax. */
  def annotateSqlFor(model: graft.link.Scoring.SvmModel): String = {
    val cols = for (s <- 0 to 2; i <- 0 to 4) yield s"s${s}_$i"
    val scoreExpr = cols.zipWithIndex.map { case (c, k) =>
      s"${model.weights(k)} * (($c - ${model.mean(k)}) / ${model.scale(k)})"
    }.mkString("", "\n         + ", s"\n         + ${model.intercept}")
    s"""WITH $mentionsCtes,
       |$pagerankCtes,
       |feat(qid, qid_num, nb_statements, nb_sitelinks, edges) AS (VALUES $featValues),
       |cand0 AS MATERIALIZED (
       |  SELECT m.doc_id, m.m_start, m.m_end, m.surface, d.qid,
       |         23.0 + ln(p.r) AS rank,
       |         row_number() OVER (PARTITION BY m.doc_id, m.m_start, m.m_end
       |                            ORDER BY 23.0 + ln(p.r) DESC, d.qid) AS tag_order
       |  FROM mentions m
       |  JOIN dict d ON d.norm_key = m.surface
       |  JOIN pr p ON p.id = CAST(substr(d.qid, 2) AS INTEGER)
       |),
       |$bowLlCtes,
       |ctag AS MATERIALIZED (
       |  SELECT c.doc_id, c.m_start, c.m_end, c.surface, c.qid, c.rank, c.tag_order,
       |         f.qid_num, f.nb_statements, f.nb_sitelinks, f.edges, l.ll
       |  FROM cand0 c
       |  JOIN feat f ON f.qid = c.qid
       |  JOIN surfll l ON l.surface = c.surface
       |  WHERE c.tag_order <= 10
       |),
       |crosse AS MATERIALIZED (
       |  SELECT a.doc_id, a.m_start AS ss, a.m_end AS se, a.qid AS sq,
       |         b.m_start AS ds, b.m_end AS de, b.qid AS dq,
       |         (0.1 + (CASE WHEN a.qid_num = b.qid_num OR list_contains(a.edges, b.qid_num)
       |                 THEN 1.0 ELSE 0.0 END)
       |              + (CASE WHEN b.qid_num = a.qid_num OR list_contains(b.edges, a.qid_num)
       |                 THEN 1.0 ELSE 0.0 END))
       |           * (100.0 - greatest(a.m_start - b.m_end, b.m_start - a.m_end)) / 100.0 AS raw
       |  FROM ctag a JOIN ctag b
       |    ON a.doc_id = b.doc_id
       |   AND NOT (a.m_start = b.m_start AND a.m_end = b.m_end)
       |   AND greatest(a.m_start - b.m_end, b.m_start - a.m_end) <= 100
       |),
       |alledge AS MATERIALIZED (
       |  SELECT * FROM crosse WHERE raw > 0
       |  UNION ALL
       |  SELECT doc_id, m_start, m_end, qid, m_start, m_end, qid, 0.1 FROM ctag
       |),
       |wedge AS MATERIALIZED (
       |  SELECT doc_id, ss, se, sq, ds, de, dq,
       |         raw / sum(raw) OVER (PARTITION BY doc_id, ss, se, sq) AS w
       |  FROM alledge
       |),
       |s0 AS MATERIALIZED (
       |  SELECT doc_id, m_start, m_end, qid,
       |         ll AS s0_0, rank AS s0_1, CAST(nb_statements AS DOUBLE) AS s0_2,
       |         CAST(nb_sitelinks AS DOUBLE) AS s0_3, 1.0 AS s0_4
       |  FROM ctag),
       |p1 AS MATERIALIZED (
       |  SELECT e.doc_id, e.ds AS m_start, e.de AS m_end, e.dq AS qid,
       |         sum(e.w * s.s0_0) AS v0, sum(e.w * s.s0_1) AS v1, sum(e.w * s.s0_2) AS v2,
       |         sum(e.w * s.s0_3) AS v3, sum(e.w * s.s0_4) AS v4
       |  FROM wedge e JOIN s0 s
       |    ON s.doc_id = e.doc_id AND s.m_start = e.ss AND s.m_end = e.se AND s.qid = e.sq
       |  GROUP BY 1, 2, 3, 4),
       |s1 AS MATERIALIZED (
       |  SELECT t.doc_id, t.m_start, t.m_end, t.qid,
       |         coalesce(p.v0, 0.0) AS s1_0, coalesce(p.v1, 0.0) AS s1_1,
       |         coalesce(p.v2, 0.0) AS s1_2, coalesce(p.v3, 0.0) AS s1_3,
       |         coalesce(p.v4, 0.0) AS s1_4
       |  FROM s0 t LEFT JOIN p1 p USING (doc_id, m_start, m_end, qid)),
       |p2 AS MATERIALIZED (
       |  SELECT e.doc_id, e.ds AS m_start, e.de AS m_end, e.dq AS qid,
       |         sum(e.w * s.s1_0) AS v0, sum(e.w * s.s1_1) AS v1, sum(e.w * s.s1_2) AS v2,
       |         sum(e.w * s.s1_3) AS v3, sum(e.w * s.s1_4) AS v4
       |  FROM wedge e JOIN s1 s
       |    ON s.doc_id = e.doc_id AND s.m_start = e.ss AND s.m_end = e.se AND s.qid = e.sq
       |  GROUP BY 1, 2, 3, 4),
       |s2 AS MATERIALIZED (
       |  SELECT t.doc_id, t.m_start, t.m_end, t.qid,
       |         coalesce(p.v0, 0.0) AS s2_0, coalesce(p.v1, 0.0) AS s2_1,
       |         coalesce(p.v2, 0.0) AS s2_2, coalesce(p.v3, 0.0) AS s2_3,
       |         coalesce(p.v4, 0.0) AS s2_4
       |  FROM s1 t LEFT JOIN p2 p USING (doc_id, m_start, m_end, qid)),
       |scored AS MATERIALIZED (
       |  SELECT c.doc_id, c.m_start, c.m_end, c.surface, c.qid, c.tag_order, c.ll,
       |         $scoreExpr AS score
       |  FROM ctag c
       |  JOIN s0 USING (doc_id, m_start, m_end, qid)
       |  JOIN s1 USING (doc_id, m_start, m_end, qid)
       |  JOIN s2 USING (doc_id, m_start, m_end, qid))
       |SELECT doc_id, m_start, m_end, surface, qid AS best_qid,
       |       round(score, 6) AS score, round(ll, 6) AS log_likelihood
       |FROM (SELECT *, row_number() OVER (PARTITION BY doc_id, m_start, m_end
       |                                   ORDER BY score DESC, tag_order) AS rn
       |      FROM scored)
       |WHERE rn = 1 AND score > 0""".stripMargin
  }

  // ---- annotations JSON sink (parse-back projection) -----------------------
  // The Spark side serializes per-doc annotation JSON (mention.py:22-30
  // shape) and parses it BACK, projecting per-doc aggregates; the oracle
  // derives the same aggregates from the relational pipeline directly —
  // a corrupted/incomplete JSON document cannot hash-match.
  val elAnnotationsSql: String =
    s"""WITH $mentionsCtes,
       |$pagerankCtes,
       |$bowLlCtes,
       |cand AS MATERIALIZED (
       |  SELECT m.doc_id, m.m_start, m.m_end, m.surface, d.qid,
       |         row_number() OVER (PARTITION BY m.doc_id, m.m_start, m.m_end
       |                            ORDER BY 23.0 + ln(p.r) DESC, d.qid) AS tag_order
       |  FROM mentions m
       |  JOIN dict d ON d.norm_key = m.surface
       |  JOIN pr p ON p.id = CAST(substr(d.qid, 2) AS INTEGER)
       |),
       |best AS MATERIALIZED (SELECT * FROM cand WHERE tag_order = 1),
       |ntags AS MATERIALIZED (
       |  SELECT doc_id, m_start, m_end, count(*) AS nt
       |  FROM cand WHERE tag_order <= 10 GROUP BY 1, 2, 3)
       |SELECT b.doc_id,
       |       CAST(count(*) AS INTEGER) AS n_annotations,
       |       string_agg(b.qid, ',' ORDER BY b.m_start, b.m_end) AS qids,
       |       round(sum(l.ll), 4) AS sum_ll,
       |       CAST(sum(n.nt) AS INTEGER) AS n_tags
       |FROM best b
       |JOIN surfll l ON l.surface = b.surface
       |JOIN ntags n ON n.doc_id = b.doc_id AND n.m_start = b.m_start AND n.m_end = b.m_end
       |GROUP BY b.doc_id""".stripMargin

  // ---- pairs: sorted-neighborhood within blocking key ----------------------

  val elPairsSql: String =
    s"""WITH $mentionsCtes,
       |$pagerankCtes,
       |best AS MATERIALIZED (
       |  SELECT doc_id, m_start, m_end, surface, qid AS best_qid,
       |         doc_id * 100000000 + m_start * 10000 + m_end AS mention_id,
       |         split_part(surface, ' ', 1) AS block_key
       |  FROM (
       |    SELECT m.doc_id, m.m_start, m.m_end, m.surface, d.qid,
       |           row_number() OVER (
       |             PARTITION BY m.doc_id, m.m_start, m.m_end
       |             ORDER BY 23.0 + ln(p.r) DESC, d.qid) AS tag_order
       |    FROM mentions m
       |    JOIN dict d ON d.norm_key = m.surface
       |    JOIN pr p ON p.id = CAST(substr(d.qid, 2) AS INTEGER))
       |  WHERE tag_order = 1
       |),
       |neigh AS MATERIALIZED (
       |  SELECT block_key, mention_id AS id1, surface AS surface1, best_qid AS qid1,
       |         lead(mention_id, 1) OVER w AS n1_id,
       |         lead(surface, 1) OVER w AS n1_surface,
       |         lead(best_qid, 1) OVER w AS n1_qid,
       |         lead(mention_id, 2) OVER w AS n2_id,
       |         lead(surface, 2) OVER w AS n2_surface,
       |         lead(best_qid, 2) OVER w AS n2_qid
       |  FROM best
       |  WINDOW w AS (PARTITION BY block_key ORDER BY mention_id)
       |),
       |pairs AS (
       |  SELECT block_key, id1, n1_id AS id2, surface1, n1_surface AS surface2,
       |         qid1, n1_qid AS qid2 FROM neigh WHERE n1_id IS NOT NULL
       |  UNION ALL
       |  SELECT block_key, id1, n2_id AS id2, surface1, n2_surface AS surface2,
       |         qid1, n2_qid AS qid2 FROM neigh WHERE n2_id IS NOT NULL
       |)
       |SELECT block_key, id1, id2,
       |       CAST(levenshtein(surface1, surface2) AS INTEGER) AS lev,
       |       round(jaro_winkler_similarity(surface1, surface2), 6) AS jw,
       |       (qid1 IS NOT NULL AND qid2 IS NOT NULL AND qid1 = qid2) AS same_entity
       |FROM pairs""".stripMargin

  // ---- full mention clustering (el_clusters) -------------------------------
  // Independent algorithm: the generic large-star/small-star CC in Spark is
  // checked against a first-principles derivation that exploits the pairing
  // structure — same-entity edges only connect mentions of the SAME best_qid
  // at block-seq distance <= 2, so every component is a maximal run of
  // same-(block, qid) mentions with consecutive seq gaps <= 2, and its label
  // is the run's minimum mention id. No recursion needed.
  val elClustersSql: String =
    s"""WITH $mentionsCtes,
       |$pagerankCtes,
       |best AS MATERIALIZED (
       |  SELECT doc_id, m_start, m_end, surface, qid AS best_qid,
       |         doc_id * 100000000 + m_start * 10000 + m_end AS mention_id,
       |         split_part(surface, ' ', 1) AS block_key
       |  FROM (
       |    SELECT m.doc_id, m.m_start, m.m_end, m.surface, d.qid,
       |           row_number() OVER (
       |             PARTITION BY m.doc_id, m.m_start, m.m_end
       |             ORDER BY 23.0 + ln(p.r) DESC, d.qid) AS tag_order
       |    FROM mentions m
       |    JOIN dict d ON d.norm_key = m.surface
       |    JOIN pr p ON p.id = CAST(substr(d.qid, 2) AS INTEGER))
       |  WHERE tag_order = 1
       |),
       |seqd AS MATERIALIZED (
       |  SELECT *, row_number() OVER (PARTITION BY block_key ORDER BY mention_id) AS seq
       |  FROM best),
       |runs AS MATERIALIZED (
       |  SELECT *, CASE WHEN seq - lag(seq) OVER (
       |              PARTITION BY block_key, best_qid ORDER BY seq) <= 2
       |            THEN 0 ELSE 1 END AS brk
       |  FROM seqd),
       |grps AS MATERIALIZED (
       |  SELECT *, sum(brk) OVER (
       |    PARTITION BY block_key, best_qid ORDER BY seq) AS grp
       |  FROM runs)
       |SELECT CAST(mention_id AS BIGINT) AS node,
       |       CAST(min(mention_id) OVER (
       |         PARTITION BY block_key, best_qid, grp) AS BIGINT) AS component
       |FROM grps""".stripMargin

  // ---- ANN: LSH arithmetic is deterministic and portable — full oracles
  /** CTE chain ending in `sig(vec_id, vec, s)`: the 8-plane random-
    * hyperplane signature of every embedding, from first principles. */
  val lshSigCtes: String =
    """v AS MATERIALIZED (
      |  SELECT vec_id, embedding::DOUBLE[] AS vec FROM embeddings
      |),
      |comp AS MATERIALIZED (
      |  SELECT vec_id, unnest(vec) AS val, generate_subscripts(vec, 1) - 1 AS i FROM v
      |),
      |proj AS MATERIALIZED (
      |  SELECT c.vec_id, b.b AS b,
      |         sum(c.val * (CASE WHEN ((b.b + 1) * 2654435761 + 97 * c.i) % 2147483647 % 2 = 1
      |                      THEN 1.0 ELSE -1.0 END)) AS proj
      |  FROM comp c CROSS JOIN range(0, 8) b(b)
      |  GROUP BY c.vec_id, b.b
      |),
      |sigt AS MATERIALIZED (
      |  SELECT vec_id, sum(CASE WHEN proj > 0 THEN (1::BIGINT << b) ELSE 0 END) AS s
      |  FROM proj GROUP BY vec_id
      |),
      |sig AS MATERIALIZED (
      |  SELECT v.vec_id, v.vec, sigt.s FROM v JOIN sigt USING (vec_id)
      |)""".stripMargin

  val annLshSql: String =
    s"""WITH $lshSigCtes,
      |cand AS MATERIALIZED (
      |  SELECT q.vec_id AS query_id, c.vec_id AS cand_id,
      |         list_cosine_similarity(q.vec, c.vec) AS cos
      |  FROM sig q JOIN sig c ON q.s = c.s AND c.vec_id != q.vec_id
      |  WHERE q.vec_id % 100 = 0
      |)
      |SELECT query_id, cand_id, round(cos, 6) AS cos, CAST(rk AS INTEGER) AS rk
      |FROM (
      |  SELECT *, row_number() OVER (
      |    PARTITION BY query_id ORDER BY cos DESC, cand_id) AS rk
      |  FROM cand)
      |WHERE rk <= 5""".stripMargin

  /** IVF ANN (Ann.ivfTopK): centroids = 16 lowest-id vectors, cell =
    * argmax-cosine centroid (ties toward the lower cid), queries probe
    * their 4 nearest cells, exact top-5 re-rank inside probed cells.
    * list_cosine_similarity matches VectorOps.cosine bit-exactly (proven
    * by the green ann_topk row), so cell assignment, probe choice and
    * final ranks agree across engines. */
  val annIvfSql: String =
    """WITH emb AS MATERIALIZED (
      |  SELECT vec_id, embedding::DOUBLE[] AS vec FROM embeddings
      |),
      |cent AS MATERIALIZED (
      |  SELECT CAST(row_number() OVER (ORDER BY vec_id) - 1 AS INTEGER) AS cid,
      |         vec AS cvec
      |  FROM (SELECT vec_id, vec FROM emb ORDER BY vec_id LIMIT 16)
      |),
      |assigned AS MATERIALIZED (
      |  SELECT vec_id AS cand_id, cid, vec AS cand_vec FROM (
      |    SELECT e.vec_id, c.cid, e.vec,
      |           row_number() OVER (PARTITION BY e.vec_id
      |             ORDER BY list_cosine_similarity(e.vec, c.cvec) DESC, c.cid) AS rn
      |    FROM emb e CROSS JOIN cent c)
      |  WHERE rn = 1
      |),
      |probes AS MATERIALIZED (
      |  SELECT query_id, cid, qv FROM (
      |    SELECT e.vec_id AS query_id, c.cid, e.vec AS qv,
      |           row_number() OVER (PARTITION BY e.vec_id
      |             ORDER BY list_cosine_similarity(e.vec, c.cvec) DESC, c.cid) AS rn
      |    FROM emb e CROSS JOIN cent c
      |    WHERE e.vec_id % 100 = 0)
      |  WHERE rn <= 4
      |),
      |scored AS (
      |  SELECT p.query_id, a.cand_id,
      |         list_cosine_similarity(p.qv, a.cand_vec) AS cos
      |  FROM probes p JOIN assigned a USING (cid)
      |  WHERE a.cand_id != p.query_id
      |)
      |SELECT query_id, cand_id, round(cos, 6) AS cos, CAST(rk AS INTEGER) AS rk
      |FROM (
      |  SELECT *, row_number() OVER (
      |    PARTITION BY query_id ORDER BY cos DESC, cand_id) AS rk
      |  FROM scored)
      |WHERE rk <= 5""".stripMargin

  /** embedding-cosine near-dups over the augmented table (planted scaled
    * copies, float-exact in both engines): same-bucket pairs with exact
    * cosine >= threshold (thresholded unrounded, like ddJaccardSql). */
  val ddEmbedSql: String =
    s"""WITH vaug AS MATERIALIZED (
       |  SELECT vec_id, embedding FROM embeddings
       |  UNION ALL
       |  SELECT vec_id + 1000000,
       |         list_transform(embedding, x -> CAST(x * CAST(1.5 AS FLOAT) AS FLOAT))
       |  FROM embeddings WHERE vec_id % 100 = 0
       |),
       |${lshSigCtes.replace("FROM embeddings\n", "FROM vaug\n")},
       |dummy AS (SELECT 1)
       |SELECT a.vec_id AS id1, b.vec_id AS id2,
       |       round(list_cosine_similarity(a.vec, b.vec), 6) AS cos
       |FROM sig a JOIN sig b ON a.s = b.s AND a.vec_id < b.vec_id
       |WHERE list_cosine_similarity(a.vec, b.vec) >= 0.9""".stripMargin

  // ---- the three similarity kernels over blocking-key entity pairs --------
  // (similarities.py:28-69) re-derived arithmetically: constants are written
  // as the same double-precision products the Scala side evaluates
  // (0.85*0.85 etc.), so both engines run identical IEEE operations.

  val elSimSql: String =
    s"""WITH dict(norm_key, qid) AS (VALUES $dictKeysValues),
       |feat(qid, qid_num, nb_statements, nb_sitelinks, edges) AS (VALUES $featValues),
       |k AS (SELECT DISTINCT norm_key, qid FROM dict),
       |p AS (
       |  SELECT a.norm_key, a.qid AS qid_a, b.qid AS qid_b,
       |         fa.qid_num AS na, fb.qid_num AS nb,
       |         fa.edges AS ea, fb.edges AS eb
       |  FROM k a JOIN k b ON a.norm_key = b.norm_key AND a.qid < b.qid
       |  JOIN feat fa ON fa.qid = a.qid
       |  JOIN feat fb ON fb.qid = b.qid
       |),
       |q AS (
       |  SELECT *,
       |         list_distinct(list_append(ea, na)) AS au,
       |         list_distinct(list_append(eb, nb)) AS bu,
       |         list_distinct(ea) AS ad,
       |         list_distinct(eb) AS bd
       |  FROM p
       |)
       |SELECT norm_key, qid_a, qid_b,
       |  round((CASE WHEN na = nb OR list_contains(ea, nb) THEN 1.0 ELSE 0.0 END)
       |      + (CASE WHEN nb = na OR list_contains(eb, na) THEN 1.0 ELSE 0.0 END),
       |    6) AS sim_direct,
       |  round(0.5 * (CAST(len(list_intersect(au, bu)) AS DOUBLE) / CAST(len(au) AS DOUBLE)
       |             + CAST(len(list_intersect(au, bu)) AS DOUBLE) / CAST(len(bu) AS DOUBLE)),
       |    6) AS sim_edge_ratio,
       |  round((CASE WHEN na = nb THEN 0.85 * 0.85 ELSE 0.0 END)
       |      + (CASE WHEN list_contains(ad, nb)
       |         THEN ((1 - 0.85) * 0.85) / CAST(len(ad) AS DOUBLE) ELSE 0.0 END)
       |      + (CASE WHEN list_contains(bd, na)
       |         THEN (0.85 * (1 - 0.85)) / CAST(len(bd) AS DOUBLE) ELSE 0.0 END)
       |      + (CASE WHEN len(list_intersect(ad, bd)) > 0
       |         THEN ((1 - 0.85) * (1 - 0.85))
       |              * (CAST(len(list_intersect(ad, bd)) AS DOUBLE) / CAST(len(ad) AS DOUBLE))
       |              * (CAST(len(list_intersect(ad, bd)) AS DOUBLE) / CAST(len(bd) AS DOUBLE))
       |         ELSE 0.0 END),
       |    6) AS sim_one_step
       |FROM q""".stripMargin

  // ---- P/R/F1 evaluation (classifier.py:221-260) --------------------------
  // Trained-model best links scored with the ctx-model best links as the
  // judgment set: both full annotate chains are re-derived (nested WITH
  // scopes), then the evaluation arithmetic mirrors the Scala plan exactly
  // (same casts, same association order) so the rounded ratios agree.

  val elEvalSql: String =
    s"""WITH b AS MATERIALIZED ($elAnnotateTrainedSql),
       |g AS MATERIALIZED ($elAnnotateCtxSql),
       |counts AS (
       |  SELECT sum(CASE WHEN g.best_qid IS NOT NULL AND g.best_qid = b.best_qid
       |             THEN 1 ELSE 0 END) AS valid,
       |         count(*) AS preds
       |  FROM b LEFT JOIN g
       |    ON g.doc_id = b.doc_id AND g.m_start = b.m_start AND g.m_end = b.m_end
       |),
       |j AS (SELECT count(*) AS judgments FROM g),
       |r AS (
       |  SELECT valid, preds, judgments,
       |         CASE WHEN preds > 0
       |           THEN CAST(valid AS DOUBLE) / CAST(preds AS DOUBLE)
       |           ELSE 1.0 END AS p,
       |         CASE WHEN judgments > 0
       |           THEN CAST(valid AS DOUBLE) / CAST(judgments AS DOUBLE)
       |           ELSE 1.0 END AS rec
       |  FROM counts, j
       |)
       |SELECT CAST(valid AS BIGINT) AS valid, CAST(preds AS BIGINT) AS preds,
       |       CAST(judgments AS BIGINT) AS judgments,
       |       round(p, 6) AS precision,
       |       round(rec, 6) AS recall,
       |       round(CASE WHEN p + rec > 0 THEN 2.0 * p * rec / (p + rec)
       |             ELSE 0.0 END, 6) AS f1
       |FROM r""".stripMargin

  // ---- gold-phrase match join: labeled training pairs ----------------------

  /** planted gold (surface -> entity) VALUES list from the same
    * deterministic spec the training path uses (DictSpec.goldQidByKey). */
  def goldValues: String =
    DictSpec.goldQidByKey.toSeq.sortBy(_._1)
      .map { case (k, qid) => s"(${q(k)}, ${q(qid)})" }
      .mkString(", ")

  /** The reference's gold-phrase match join (classifier.py train path):
    * candidate tags labeled against the gold judgment set by inner span
    * match + qid equality — re-derived here by recomputing the candidate
    * set (mentions x dict x pagerank, top-10 per span) and joining the
    * inlined gold map on the span's surface. */
  val elGoldSql: String =
    s"""WITH $mentionsCtes,
       |$pagerankCtes,
       |cand AS MATERIALIZED (
       |  SELECT m.doc_id, m.m_start, m.m_end, m.surface, d.qid,
       |         23.0 + ln(p.r) AS rank
       |  FROM mentions m
       |  JOIN dict d ON d.norm_key = m.surface
       |  JOIN pr p ON p.id = CAST(substr(d.qid, 2) AS INTEGER)
       |),
       |top AS (
       |  SELECT doc_id, m_start, m_end, surface, qid FROM (
       |    SELECT *, row_number() OVER (
       |      PARTITION BY doc_id, m_start, m_end
       |      ORDER BY rank DESC, qid) AS tag_order
       |    FROM cand)
       |  WHERE tag_order <= 10),
       |gold(gsurface, gold_qid) AS (VALUES $goldValues)
       |SELECT t.doc_id, t.m_start, t.m_end, t.qid,
       |       CASE WHEN g.gold_qid = t.qid THEN 1.0 ELSE 0.0 END AS label
       |FROM top t LEFT JOIN gold g ON g.gsurface = t.surface""".stripMargin

  // ---- connected components over the alias-sharing qid graph --------------

  val elCcAliasSql: String =
    s"""WITH RECURSIVE dict(norm_key, qid) AS (VALUES $dictKeysValues),
       |nodes AS (SELECT DISTINCT CAST(substr(qid, 2) AS BIGINT) AS node FROM dict),
       |edges AS (
       |  SELECT DISTINCT CAST(substr(a.qid, 2) AS BIGINT) AS src,
       |                  CAST(substr(b.qid, 2) AS BIGINT) AS dst
       |  FROM dict a JOIN dict b ON a.norm_key = b.norm_key AND a.qid < b.qid
       |),
       |und AS (
       |  SELECT src AS u, dst AS v FROM edges
       |  UNION SELECT dst AS u, src AS v FROM edges
       |),
       |reach(node, lab) AS (
       |  SELECT node, node AS lab FROM nodes
       |  UNION
       |  SELECT r.node, e.v AS lab FROM reach r JOIN und e ON e.u = r.lab
       |)
       |SELECT node, CAST(min(lab) AS BIGINT) AS component
       |FROM reach GROUP BY node""".stripMargin

  // ---- dict build + keys + bow (plain-Scala expected values inlined) ------

  val elDictSql: String = {
    val rows = DictSpec.expectedDict.sortBy(_.id).map { r =>
      s"(${q(r.id)}, ${r.revid}, ${q(r.label)}, ${q(r.desc)}, ${r.edges.size}, " +
        s"${r.aliases.size}, ${r.extraAliases.size}, ${r.nbStatements}, ${r.nbSitelinks}, " +
        s"${r.types.getOrElse("Q200", false)}, ${r.types.getOrElse("P2002", false)})"
    }.mkString(", ")
    s"""SELECT id, CAST(revid AS BIGINT) AS revid, label, "desc",
       |CAST(n_edges AS INTEGER) AS n_edges, CAST(n_aliases AS INTEGER) AS n_aliases,
       |CAST(n_extra AS INTEGER) AS n_extra, CAST(nb_statements AS INTEGER) AS nb_statements,
       |CAST(nb_sitelinks AS INTEGER) AS nb_sitelinks, type_ok, prop_ok
       |FROM (VALUES $rows)
       |AS t(id, revid, label, "desc", n_edges, n_aliases, n_extra, nb_statements, nb_sitelinks, type_ok, prop_ok)""".stripMargin
  }

  val elDictKeysSql: String = {
    val rows = DictSpec.expectedDictKeys.sortBy(r => (r._1, r._2))
      .map { case (k, qid, n) => s"(${q(k)}, ${q(qid)}, $n)" }.mkString(", ")
    s"""SELECT norm_key, qid, CAST(n_tokens AS INTEGER) AS n_tokens
       |FROM (VALUES $rows) AS t(norm_key, qid, n_tokens)""".stripMargin
  }

  val elBowSql: String =
    s"""WITH terms(item, term) AS (VALUES $bowTermValues),
       |words AS (
       |  SELECT DISTINCT item, unnest(string_split(term, ' ')) AS word FROM terms
       |)
       |SELECT word, CAST(count(*) AS BIGINT) AS count
       |FROM words GROUP BY word HAVING count(*) >= 2""".stripMargin

  // ======================= dedup / textstats / ann =========================

  /** augmented corpus (near-dup plants, mirrors Dedup.augment) + token 3-gram
    * shingle ids with deterministic dense ranks. */
  val dedupBaseCtes: String =
    """aug AS MATERIALIZED (
      |  SELECT doc_id, text FROM documents
      |  UNION ALL
      |  SELECT doc_id + 1000000 AS doc_id,
      |         array_to_string(string_split(text, ' ')[6:], ' ') AS text
      |  FROM documents WHERE doc_id % 50 = 0
      |),
      |dtoks AS MATERIALIZED (
      |  SELECT doc_id,
      |         unnest(string_split(text, ' ')) AS tok,
      |         generate_subscripts(string_split(text, ' '), 1) AS i
      |  FROM aug
      |),
      |dsh AS MATERIALIZED (
      |  SELECT DISTINCT a.doc_id, a.tok || ' ' || b.tok || ' ' || c.tok AS shingle
      |  FROM dtoks a
      |  JOIN dtoks b ON b.doc_id = a.doc_id AND b.i = a.i + 1
      |  JOIN dtoks c ON c.doc_id = a.doc_id AND c.i = a.i + 2
      |),
      |vocab AS MATERIALIZED (
      |  SELECT shingle, CAST(row_number() OVER (ORDER BY shingle) AS BIGINT) AS sid
      |  FROM (SELECT DISTINCT shingle FROM dsh)
      |),
      |dids AS MATERIALIZED (
      |  SELECT d.doc_id, v.sid FROM dsh d JOIN vocab v USING (shingle)
      |)""".stripMargin

  /** MinHash (8 hashes) -> 4 bands of 2 -> bucket -> candidate pairs. */
  val minhashCtes: String =
    s"""$dedupBaseCtes,
       |sig AS MATERIALIZED (
       |  SELECT doc_id, t.h,
       |         min(((1 + 37 * t.h) * ((sid * 2654435761) % 2147483647)
       |              + (11 + 17 * t.h)) % 2147483647) AS v
       |  FROM dids, range(0, 8) t(h)
       |  GROUP BY doc_id, t.h
       |),
       |banded AS MATERIALIZED (
       |  SELECT doc_id, CAST(h // 2 AS INTEGER) AS band,
       |         sum(v * (CASE WHEN h % 2 = 0 THEN 1 ELSE 31 END)) % 2147483647 AS bucket
       |  FROM sig GROUP BY doc_id, h // 2
       |),
       |cand AS MATERIALIZED (
       |  SELECT DISTINCT a.doc_id AS doc1, b.doc_id AS doc2
       |  FROM banded a JOIN banded b
       |    ON a.band = b.band AND a.bucket = b.bucket AND a.doc_id < b.doc_id
       |)""".stripMargin

  val ddExactSql: String =
    """WITH g AS MATERIALIZED (
      |  SELECT text, CAST(min(doc_id) AS BIGINT) AS dup_group,
      |         CAST(count(*) AS BIGINT) AS group_size
      |  FROM documents GROUP BY text
      |)
      |SELECT d.doc_id, g.dup_group, g.group_size
      |FROM documents d JOIN g USING (text)""".stripMargin

  val ddMinhashSql: String =
    s"""WITH $minhashCtes
       |SELECT doc1, doc2 FROM cand""".stripMargin

  val ddSimhashSql: String =
    s"""WITH $dedupBaseCtes,
       |bits AS (
       |  SELECT doc_id, t.b,
       |         sum(CASE WHEN ((sid::HUGEINT * 11400714819323198485) >> (16 + t.b)) & 1 = 1
       |             THEN 1 ELSE -1 END) AS s
       |  FROM dids, range(0, 32) t(b)
       |  GROUP BY doc_id, t.b
       |)
       |SELECT doc_id,
       |       CAST(sum(CASE WHEN s > 0 THEN (1::BIGINT << b) ELSE 0 END) AS BIGINT) AS simhash
       |FROM bits GROUP BY doc_id""".stripMargin

  /** dd_simhash_pairs: the ddSimhashSql fingerprint CTE + Manku-style
    * Hamming banding — 4 contiguous 8-bit blocks, equi-join on
    * (band, block), exact bit_count(xor) <= 3 on candidates. */
  val ddSimhashPairsSql: String =
    s"""WITH $dedupBaseCtes,
       |bits AS (
       |  SELECT doc_id, t.b,
       |         sum(CASE WHEN ((sid::HUGEINT * 11400714819323198485) >> (16 + t.b)) & 1 = 1
       |             THEN 1 ELSE -1 END) AS s
       |  FROM dids, range(0, 32) t(b)
       |  GROUP BY doc_id, t.b
       |),
       |fp AS MATERIALIZED (
       |  SELECT doc_id,
       |         CAST(sum(CASE WHEN s > 0 THEN (1::BIGINT << b) ELSE 0 END) AS BIGINT) AS simhash
       |  FROM bits GROUP BY doc_id
       |),
       |banded AS MATERIALIZED (
       |  SELECT doc_id, simhash, t.b AS band,
       |         (simhash >> (t.b * 8)) & 255 AS key
       |  FROM fp, range(0, 4) t(b)
       |)
       |SELECT DISTINCT a.doc_id AS doc1, b.doc_id AS doc2,
       |       CAST(bit_count(xor(a.simhash, b.simhash)) AS BIGINT) AS hamming
       |FROM banded a
       |JOIN banded b ON b.band = a.band AND b.key = a.key AND b.doc_id > a.doc_id
       |WHERE bit_count(xor(a.simhash, b.simhash)) <= 3""".stripMargin

  val ddJaccardSql: String =
    s"""WITH $minhashCtes,
       |szs AS MATERIALIZED (SELECT doc_id, count(*) AS sz FROM dids GROUP BY doc_id),
       |inter AS MATERIALIZED (
       |  SELECT c.doc1, c.doc2, count(*) AS common
       |  FROM cand c
       |  JOIN dids a ON a.doc_id = c.doc1
       |  JOIN dids b ON b.doc_id = c.doc2 AND b.sid = a.sid
       |  GROUP BY c.doc1, c.doc2
       |)
       |SELECT i.doc1, i.doc2,
       |       round(CAST(i.common AS DOUBLE) / CAST(s1.sz + s2.sz - i.common AS DOUBLE), 6) AS jaccard
       |FROM inter i
       |JOIN szs s1 ON s1.doc_id = i.doc1
       |JOIN szs s2 ON s2.doc_id = i.doc2
       |WHERE CAST(i.common AS DOUBLE) / CAST(s1.sz + s2.sz - i.common AS DOUBLE) >= 0.5""".stripMargin

  /** dd_incr: the incremental crawl-delta pass must equal the one-shot
    * verified-pair set restricted to pairs touching the delta (the
    * augmented re-crawl variants, doc_id >= 10^6). The oracle knows
    * nothing about the committed index — only the result contract. */
  val ddIncrSql: String =
    s"""SELECT * FROM ($ddJaccardSql) q
       |WHERE q.doc1 >= 1000000 OR q.doc2 >= 1000000""".stripMargin

  /** dd_substr: cross-document exact-substring duplication (Lee et al.
    * 2022 granularity) re-derived — L=20 token grams at every position,
    * grams shared by >= 2 distinct docs, covered tokens via the same
    * merge-intervals running-max window per doc. The oracle groups shared
    * grams by the gram TEXT (semantics); Spark counts per 128-bit digest
    * (scale) — the dd_exact contract. Runs on the augmented corpus, whose
    * planted suffix variants guarantee long shared spans; the synthetic
    * texts also carry natural cross-doc 20-gram repeats, seen identically
    * by both engines. */
  val ddSubstrSql: String =
    """WITH aug AS MATERIALIZED (
      |  SELECT doc_id, text FROM documents
      |  UNION ALL
      |  SELECT doc_id + 1000000 AS doc_id,
      |         array_to_string(string_split(text, ' ')[6:], ' ') AS text
      |  FROM documents WHERE doc_id % 50 = 0
      |),
      |toks AS MATERIALIZED (
      |  SELECT doc_id, string_split(text, ' ') AS t FROM aug
      |),
      |grams AS MATERIALIZED (
      |  SELECT doc_id, generate_subscripts(gl, 1) AS pos, unnest(gl) AS gram
      |  FROM (SELECT doc_id,
      |               CASE WHEN len(t) >= 20
      |                    THEN list_transform(range(1, len(t) - 18),
      |                                        i -> array_to_string(t[i:i+19], ' '))
      |                    ELSE [] END AS gl
      |        FROM toks)
      |),
      |shared AS MATERIALIZED (
      |  SELECT gram FROM grams GROUP BY gram HAVING count(DISTINCT doc_id) >= 2
      |),
      |m AS (
      |  SELECT g.doc_id, g.pos, g.pos + 19 AS e
      |  FROM grams g JOIN shared USING (gram)
      |),
      |c AS (
      |  SELECT doc_id,
      |         greatest(0, e - greatest(
      |           coalesce(max(e) OVER (PARTITION BY doc_id ORDER BY pos
      |                                 ROWS BETWEEN UNBOUNDED PRECEDING
      |                                 AND 1 PRECEDING), -1),
      |           pos - 1)) AS contrib
      |  FROM m
      |),
      |cov AS (
      |  SELECT doc_id, CAST(sum(contrib) AS BIGINT) AS n_dup FROM c GROUP BY doc_id
      |)
      |SELECT a.doc_id,
      |       CAST(len(string_split(a.text, ' ')) AS INTEGER) AS n_tokens,
      |       coalesce(cov.n_dup, 0) AS n_dup_tokens,
      |       round(coalesce(cov.n_dup, 0) * 1.0
      |             / len(string_split(a.text, ' ')), 6) AS dup_frac
      |FROM aug a LEFT JOIN cov USING (doc_id)""".stripMargin

  /** dd_pipeline: the composed cleaning decision — template pages →
    * line-level boilerplate removal → exact dedup on the CLEANED text
    * (canonical = min doc_id; window-over-text here states the semantic,
    * Spark groups by digest) → quality + language id over the cleaned text
    * → one kept verdict. Exact-copy plants at doc_id mod 25 (id +3e6);
    * doc 0's copy deliberately survives dedup because the original keeps
    * its rare BADGE line — dedup-after-cleaning is order-sensitive. */
  def ddPipelineSql: String = {
    val stop = graft.textstats.TextStats.Markers.flatMap(_._2).distinct.sorted
      .map(q).mkString(", ")
    val markers = graft.textstats.TextStats.Markers.map { case (lang, ws) =>
      s"(${q(lang)}, [${ws.map(q).mkString(", ")}])"
    }.mkString(", ")
    s"""WITH copies AS MATERIALIZED (
       |  SELECT doc_id, text FROM documents
       |  UNION ALL
       |  SELECT doc_id + 3000000 AS doc_id, text
       |  FROM documents WHERE doc_id % 25 = 0
       |),
       |pages AS MATERIALIZED (
       |  SELECT doc_id,
       |         'SITE ' || (doc_id % 7) || ' NAV home about contact products'
       |           || chr(10)
       |           || CASE WHEN doc_id % 97 = 0
       |                   THEN 'BADGE award winner' || chr(10) ELSE '' END
       |           || text || chr(10)
       |           || 'COPYRIGHT site ' || (doc_id % 7) || ' all rights reserved'
       |           AS text
       |  FROM copies
       |),
       |lns AS MATERIALIZED (
       |  SELECT doc_id,
       |         generate_subscripts(string_split(text, chr(10)), 1) AS pos,
       |         unnest(string_split(text, chr(10))) AS line
       |  FROM pages
       |),
       |hot AS MATERIALIZED (
       |  SELECT line FROM lns GROUP BY line
       |  HAVING count(DISTINCT doc_id) >= 10
       |),
       |cleaned AS MATERIALIZED (
       |  SELECT l.doc_id,
       |         coalesce(string_agg(CASE WHEN h.line IS NULL THEN l.line END,
       |                             chr(10) ORDER BY l.pos), '') AS text
       |  FROM lns l LEFT JOIN hot h USING (line)
       |  GROUP BY l.doc_id
       |),
       |canon AS MATERIALIZED (
       |  SELECT doc_id, min(doc_id) OVER (PARTITION BY text) AS dup_group
       |  FROM cleaned
       |),
       |t AS MATERIALIZED (
       |  SELECT doc_id,
       |         CAST(len(string_split(text, ' ')) AS INTEGER) AS n_tokens,
       |         CAST(len(list_distinct(string_split(text, ' '))) AS DOUBLE) AS n_distinct,
       |         CAST(len(list_intersect(string_split(text, ' '), [$stop])) AS DOUBLE) AS n_stop,
       |         CAST(length(text) AS DOUBLE) AS n_chars
       |  FROM cleaned
       |),
       |qual AS MATERIALIZED (
       |  SELECT doc_id,
       |         round(0.4 * (n_distinct / n_tokens)
       |               + 0.3 * (1.0 - n_stop / n_tokens)
       |               + 0.3 * least((n_chars - (n_tokens - 1)) / n_tokens / 8.0, 1.0), 6)
       |           AS quality
       |  FROM t
       |),
       |m(lang, words) AS (VALUES $markers),
       |scores AS MATERIALIZED (
       |  SELECT c.doc_id, m.lang,
       |         len(list_intersect(string_split(c.text, ' '), m.words)) AS hits
       |  FROM cleaned c CROSS JOIN m
       |),
       |pred AS MATERIALIZED (
       |  SELECT doc_id,
       |         CASE WHEN hits > 0 THEN lang ELSE 'und' END AS pred_lang
       |  FROM (SELECT *, row_number() OVER (
       |          PARTITION BY doc_id ORDER BY hits DESC, lang) AS rn
       |        FROM scores)
       |  WHERE rn = 1
       |)
       |SELECT c.doc_id, canon.dup_group, pred.pred_lang, qual.quality,
       |       (canon.dup_group = c.doc_id AND qual.quality >= 0.64
       |        AND pred.pred_lang <> 'und') AS kept
       |FROM cleaned c
       |JOIN canon USING (doc_id)
       |JOIN qual USING (doc_id)
       |JOIN pred USING (doc_id)""".stripMargin
  }

  /** dd_lines: line-level boilerplate removal over deterministically
    * composed pages (Dedup.composePages reproduced verbatim: per-site
    * header/footer templates on doc_id mod 7, rare badge on mod 97).
    * A line is boilerplate when it occurs in >= 10 distinct docs; clean
    * text = surviving lines rejoined in original order. The oracle groups
    * hot lines by the line TEXT (semantics); Spark groups by a 128-bit
    * digest (scale) — same contract as dd_exact. */
  val ddLinesSql: String =
    """WITH pages AS MATERIALIZED (
      |  SELECT doc_id,
      |         'SITE ' || (doc_id % 7) || ' NAV home about contact products'
      |           || chr(10)
      |           || CASE WHEN doc_id % 97 = 0
      |                   THEN 'BADGE award winner' || chr(10) ELSE '' END
      |           || text || chr(10)
      |           || 'COPYRIGHT site ' || (doc_id % 7) || ' all rights reserved'
      |           AS text
      |  FROM documents
      |),
      |lines AS MATERIALIZED (
      |  SELECT doc_id,
      |         generate_subscripts(string_split(text, chr(10)), 1) AS pos,
      |         unnest(string_split(text, chr(10))) AS line
      |  FROM pages
      |),
      |hot AS MATERIALIZED (
      |  SELECT line FROM lines GROUP BY line
      |  HAVING count(DISTINCT doc_id) >= 10
      |)
      |SELECT l.doc_id,
      |       coalesce(string_agg(CASE WHEN h.line IS NULL THEN l.line END,
      |                           chr(10) ORDER BY l.pos), '') AS clean_text,
      |       CAST(count(*) AS BIGINT) AS n_lines,
      |       CAST(sum(CASE WHEN h.line IS NOT NULL THEN 1 ELSE 0 END)
      |            AS BIGINT) AS n_removed
      |FROM lines l LEFT JOIN hot h USING (line)
      |GROUP BY l.doc_id""".stripMargin

  /** dd_clusters: verified near-dup pairs (the ddJaccardSql pipeline) →
    * undirected reachability closure via a recursive CTE (with self-loops
    * so isolated docs appear) → cluster = min reachable id, canonical =
    * most-shingles member (ties: min doc_id), cluster_size. Independent of
    * the engine's alternating-star algorithm — the oracle only knows graph
    * reachability. */
  val ddClustersSql: String =
    s"""WITH RECURSIVE $minhashCtes,
       |szs AS MATERIALIZED (SELECT doc_id, count(*) AS sz FROM dids GROUP BY doc_id),
       |inter AS MATERIALIZED (
       |  SELECT c.doc1, c.doc2, count(*) AS common
       |  FROM cand c
       |  JOIN dids a ON a.doc_id = c.doc1
       |  JOIN dids b ON b.doc_id = c.doc2 AND b.sid = a.sid
       |  GROUP BY c.doc1, c.doc2
       |),
       |vp AS MATERIALIZED (
       |  SELECT i.doc1, i.doc2
       |  FROM inter i
       |  JOIN szs s1 ON s1.doc_id = i.doc1
       |  JOIN szs s2 ON s2.doc_id = i.doc2
       |  WHERE CAST(i.common AS DOUBLE) / CAST(s1.sz + s2.sz - i.common AS DOUBLE) >= 0.5
       |),
       |edges AS MATERIALIZED (
       |  SELECT doc1 AS a, doc2 AS b FROM vp
       |  UNION SELECT doc2 AS a, doc1 AS b FROM vp
       |  UNION SELECT doc_id AS a, doc_id AS b FROM aug
       |),
       |reach AS (
       |  SELECT a, b FROM edges
       |  UNION
       |  SELECT r.a, e.b FROM reach r JOIN edges e ON e.a = r.b
       |),
       |comp AS MATERIALIZED (
       |  SELECT a AS doc_id, CAST(min(b) AS BIGINT) AS cluster FROM reach GROUP BY a
       |),
       |mem AS MATERIALIZED (
       |  SELECT c.doc_id, c.cluster, COALESCE(s.sz, 0) AS sz
       |  FROM comp c LEFT JOIN szs s USING (doc_id)
       |),
       |canon AS MATERIALIZED (
       |  SELECT cluster, doc_id AS canonical, CAST(cnt AS BIGINT) AS cluster_size
       |  FROM (
       |    SELECT cluster, doc_id, sz,
       |           count(*) OVER (PARTITION BY cluster) AS cnt,
       |           row_number() OVER (PARTITION BY cluster ORDER BY sz DESC, doc_id) AS rn
       |    FROM mem)
       |  WHERE rn = 1
       |)
       |SELECT mem.doc_id, mem.cluster, canon.canonical, canon.cluster_size
       |FROM mem JOIN canon USING (cluster)""".stripMargin

  val annTopkSql: String =
    """WITH q AS MATERIALIZED (
      |  SELECT vec_id AS query_id, embedding::DOUBLE[] AS qv
      |  FROM embeddings WHERE vec_id % 100 = 0
      |),
      |c AS MATERIALIZED (
      |  SELECT vec_id AS cand_id, embedding::DOUBLE[] AS cv FROM embeddings
      |),
      |scored AS (
      |  SELECT q.query_id, c.cand_id, list_cosine_similarity(q.qv, c.cv) AS cos
      |  FROM q CROSS JOIN c WHERE c.cand_id != q.query_id
      |)
      |SELECT query_id, cand_id, round(cos, 6) AS cos, CAST(rk AS INTEGER) AS rk
      |FROM (
      |  SELECT *, row_number() OVER (
      |    PARTITION BY query_id ORDER BY cos DESC, cand_id) AS rk
      |  FROM scored)
      |WHERE rk <= 5""".stripMargin

  def tsLangidSql: String = {
    val markers = graft.textstats.TextStats.Markers.map { case (lang, ws) =>
      s"(${q(lang)}, [${ws.map(q).mkString(", ")}])"
    }.mkString(", ")
    s"""WITH m(lang, words) AS (VALUES $markers),
       |scores AS MATERIALIZED (
       |  SELECT d.doc_id, m.lang,
       |         len(list_intersect(string_split(d.text, ' '), m.words)) AS hits
       |  FROM documents d CROSS JOIN m
       |)
       |SELECT doc_id,
       |       CASE WHEN hits > 0 THEN lang ELSE 'und' END AS pred_lang,
       |       CAST(hits AS INTEGER) AS marker_hits
       |FROM (
       |  SELECT *, row_number() OVER (
       |    PARTITION BY doc_id ORDER BY hits DESC, lang) AS rn
       |  FROM scores)
       |WHERE rn = 1""".stripMargin
  }

  def tsQualitySql: String = {
    val stop = graft.textstats.TextStats.Markers.flatMap(_._2).distinct.sorted
      .map(q).mkString(", ")
    s"""WITH t AS MATERIALIZED (
       |  SELECT doc_id,
       |         CAST(len(string_split(text, ' ')) AS INTEGER) AS n_tokens,
       |         CAST(len(list_distinct(string_split(text, ' '))) AS DOUBLE) AS n_distinct,
       |         CAST(len(list_intersect(string_split(text, ' '), [$stop])) AS DOUBLE) AS n_stop,
       |         CAST(length(text) AS DOUBLE) AS n_chars
       |  FROM documents
       |)
       |SELECT doc_id, n_tokens,
       |       round(n_distinct / n_tokens, 6) AS distinct_ratio,
       |       round(n_stop / n_tokens, 6) AS stopword_ratio,
       |       round((n_chars - (n_tokens - 1)) / n_tokens, 6) AS mean_word_len,
       |       round(0.4 * (n_distinct / n_tokens) + 0.3 * (1.0 - n_stop / n_tokens)
       |             + 0.3 * least((n_chars - (n_tokens - 1)) / n_tokens / 8.0, 1.0), 6)
       |         AS quality
       |FROM t""".stripMargin
  }

  /** ts_bm25: Okapi BM25 (k1=1.2, b=0.75, RSJ idf) over whitespace tokens,
    * operation-ordered to mirror the Spark column arithmetic; scores
    * rounded to 6 BEFORE the top-k ordering so both engines select the
    * identical row set at the k boundary. Known residual risk: a score
    * sitting within ~5e-7 of a .5 rounding boundary could round apart if
    * the engines' float summation orders differ by an ulp; no corpus so
    * far (sf0.001-0.1) exhibits one. If a flake ever appears on a new
    * scale factor, widen the shared convention to round(...,5) here and
    * in Bm25.search rather than loosening the harness compare. */
  val tsBm25Sql: String =
    """WITH tok AS (
      |  SELECT doc_id, CAST(len(string_split(text, ' ')) AS DOUBLE) AS dl, t.term
      |  FROM documents, unnest(string_split(text, ' ')) t(term)
      |),
      |stats AS (
      |  SELECT CAST(count(*) AS DOUBLE) AS n,
      |         avg(CAST(len(string_split(text, ' ')) AS DOUBLE)) AS avgdl
      |  FROM documents
      |),
      |q AS (SELECT unnest(['merge','window','scan','vector','customer']) AS term),
      |tf AS MATERIALIZED (
      |  SELECT doc_id, term, CAST(count(*) AS DOUBLE) AS tf, min(dl) AS dl
      |  FROM tok JOIN q USING (term)
      |  GROUP BY doc_id, term
      |),
      |dfq AS (SELECT term, CAST(count(*) AS DOUBLE) AS df FROM tf GROUP BY term)
      |SELECT tf.doc_id,
      |       round(sum(ln(1.0 + (stats.n - dfq.df + 0.5) / (dfq.df + 0.5))
      |             * tf.tf * 2.2
      |             / (tf.tf + 1.2 * (0.25 + 0.75 * tf.dl / stats.avgdl))), 6)
      |         AS score
      |FROM tf, dfq, stats
      |WHERE tf.term = dfq.term
      |GROUP BY tf.doc_id
      |ORDER BY score DESC, tf.doc_id
      |LIMIT 20""".stripMargin

  val tsTokensSql: String =
    """SELECT doc_id,
      |       CAST(len(string_split(text, ' ')) AS INTEGER) AS ws_tokens,
      |       CAST((SELECT sum(CAST(ceil(length(t.tok) / 4.0) AS BIGINT))
      |             FROM unnest(string_split(text, ' ')) t(tok)) AS BIGINT) AS bpe_tokens
      |FROM documents""".stripMargin

  /** ts_profile: per-language corpus profile with EXACT type-7 length
    * percentiles — DuckDB quantile_cont and Spark's `percentile` use the
    * same linear interpolation (rank = p*(n-1)), so values compare exactly
    * under the repo's round-to-6 convention. */
  val tsProfileSql: String =
    """SELECT lang,
      |       CAST(count(*) AS BIGINT) AS n_docs,
      |       CAST(sum(len(string_split(text, ' '))) AS BIGINT) AS total_tokens,
      |       round(avg(n_chars), 6) AS mean_chars,
      |       round(quantile_cont(n_chars, 0.5), 6) AS p50_chars,
      |       round(quantile_cont(n_chars, 0.9), 6) AS p90_chars,
      |       round(quantile_cont(n_chars, 0.99), 6) AS p99_chars,
      |       min(n_chars) AS min_chars,
      |       max(n_chars) AS max_chars
      |FROM documents GROUP BY lang""".stripMargin

  /** ts_pack: the global exclusive prefix sum of whitespace-token counts in
    * doc_id order, sharded at 2048 tokens — the naive one-window SQL form
    * of the engine's two-phase distributed prefix sum. */
  val tsPackSql: String =
    """WITH c AS (
      |  SELECT doc_id,
      |         CAST(len(string_split(text, ' ')) AS BIGINT) AS tokens,
      |         COALESCE(CAST(SUM(CAST(len(string_split(text, ' ')) AS BIGINT))
      |           OVER (ORDER BY doc_id ROWS BETWEEN UNBOUNDED PRECEDING
      |                 AND 1 PRECEDING) AS BIGINT), 0) AS stream_offset
      |  FROM documents)
      |SELECT doc_id, tokens, stream_offset,
      |       CAST(floor(stream_offset / 2048.0) AS BIGINT) AS shard_id
      |FROM c""".stripMargin

  val tsFingerprintSql: String =
    """WITH ftoks AS MATERIALIZED (
      |  SELECT doc_id,
      |         unnest(string_split(text, ' ')) AS word,
      |         generate_subscripts(string_split(text, ' '), 1) - 1 AS pos
      |  FROM documents
      |),
      |fvocab AS MATERIALIZED (
      |  SELECT word, CAST(row_number() OVER (ORDER BY word) AS BIGINT) AS wid
      |  FROM (SELECT DISTINCT word FROM ftoks WHERE length(word) > 0)
      |)
      |SELECT t.doc_id,
      |       CAST(sum((v.wid * ((1 + 37 * (t.pos % 64)) % 2147483647)) % 2147483647)
      |            % 2147483647 AS BIGINT) AS fingerprint
      |FROM ftoks t JOIN fvocab v USING (word)
      |WHERE length(t.word) > 0
      |GROUP BY t.doc_id""".stripMargin

  /** Expected dictionary after the edit stream: last-write-wins +
    * delete_excluded re-derived in plain Scala, inlined as VALUES. */
  val streamUpsertSql: String = {
    val rows = DictSpec.expectedDictAfterStream.sortBy(_.id).map { r =>
      s"(${q(r.id)}, ${r.revid}, ${q(r.label)}, ${r.edges.size}, " +
        s"${r.aliases.size}, ${r.nbStatements}, ${r.nbSitelinks})"
    }.mkString(", ")
    s"""SELECT id, CAST(revid AS BIGINT) AS revid, label,
       |CAST(n_edges AS INTEGER) AS n_edges, CAST(n_aliases AS INTEGER) AS n_aliases,
       |CAST(nb_statements AS INTEGER) AS nb_statements,
       |CAST(nb_sitelinks AS INTEGER) AS nb_sitelinks
       |FROM (VALUES $rows)
       |AS t(id, revid, label, n_edges, n_aliases, nb_statements, nb_sitelinks)""".stripMargin
  }

  /** stream_dedup: the streamed union (events + full duplicate copy) deduped
    * on event_id within the watermark equals the distinct original table;
    * event_id is the events table's primary key, so DISTINCT is a no-op and
    * the oracle is a plain projection. */
  val streamDedupSql: String =
    """SELECT event_id, CAST(floor(epoch(ts)) AS BIGINT) AS ts_sec,
      |       user_id, event_type, value, props
      |FROM events""".stripMargin

  val streamWindowSql: String =
    """SELECT CAST(epoch(time_bucket(INTERVAL '1 hour', ts)) AS BIGINT) AS window_start,
      |       event_type,
      |       CAST(count(*) AS BIGINT) AS n,
      |       round(sum(value), 4) AS sum_value
      |FROM events GROUP BY 1, 2""".stripMargin

  /** mm_features: the stub decoder is a deterministic byte histogram of the
    * deterministic html wrapper (Pages.decodeBatch), so its first feature
    * f0 = |{bytes b : (b & 0x7f) % 8 == 0}| / len is pure arithmetic. The
    * corpus text is ASCII (mm_extract's char-length == byte-length oracle
    * row proves it), so byte counting becomes char counting:
    * length(html) - length(translate(html, <chars with code % 8 == 0>)).
    */
  def mmFeaturesSql: String = {
    // printable ASCII with code % 8 == 0: space ( 0 8 @ H P X ` h p x;
    // control codes 8/16/24 appended via chr() for exactness
    s"""WITH pages AS MATERIALIZED (
       |  SELECT 'https://graft.example/' || source || '/' || CAST(doc_id AS VARCHAR) AS url,
       |         '${graft.sources.Pages.HtmlPrefix}' || text || '${graft.sources.Pages.HtmlSuffix}' AS html
       |  FROM documents)
       |SELECT url, CAST(length(html) AS BIGINT) AS n_bytes,
       |       round((length(html) - length(translate(html, ' (08@HPX`hpx' || chr(8) || chr(16) || chr(24), ''))) * 1.0
       |             / greatest(1.0, length(html)), 6) AS f0
       |FROM pages""".stripMargin
  }

  /** ts_repetition: duplicate word-n-gram fractions (Gopher-style
    * repetition filter) recomputed with DuckDB list comprehensions over the
    * same corpus + the same planted 10-words-x5 pathological variants. */
  val tsRepetitionSql: String =
    """WITH corpus AS MATERIALIZED (
      |  SELECT doc_id, text FROM documents
      |  UNION ALL
      |  SELECT doc_id + 2000000,
      |         ten || repeat(' ' || ten, 4)
      |  FROM (SELECT doc_id,
      |               array_to_string((string_split(text, ' '))[1:10], ' ') AS ten,
      |               len(string_split(text, ' ')) AS n
      |        FROM documents WHERE doc_id % 50 = 0)
      |  WHERE n >= 10),
      |g AS (
      |  SELECT doc_id, len(t) AS n_tokens,
      |         list_transform(range(1, len(t)),
      |                        i -> t[i] || ' ' || t[i+1]) AS g2,
      |         list_transform(range(1, len(t) - 1),
      |                        i -> t[i] || ' ' || t[i+1] || ' ' || t[i+2]) AS g3
      |  FROM (SELECT doc_id, string_split(text, ' ') AS t FROM corpus)),
      |f AS (
      |  SELECT doc_id, n_tokens,
      |         round(CASE WHEN len(g2) > 0
      |               THEN (len(g2) - len(list_distinct(g2))) * 1.0 / len(g2)
      |               ELSE 0.0 END, 6) AS dup_bigram_frac,
      |         round(CASE WHEN len(g3) > 0
      |               THEN (len(g3) - len(list_distinct(g3))) * 1.0 / len(g3)
      |               ELSE 0.0 END, 6) AS dup_trigram_frac
      |  FROM g)
      |SELECT doc_id, CAST(n_tokens AS INTEGER) AS n_tokens,
      |       dup_bigram_frac, dup_trigram_frac,
      |       dup_bigram_frac >= 0.3 AS repetitive
      |FROM f""".stripMargin

  /** dd_url: canonical-URL dedup re-derived end-to-end — the pages table,
    * the planted syntactic URL variants, and every canonicalization rewrite
    * (fragment, sole utm query, case, www., default port, trailing slash)
    * applied independently with DuckDB's regex engine (all single-match
    * patterns, so replace-first == Spark's replace-all). */
  val ddUrlSql: String =
    """WITH base AS MATERIALIZED (
      |  SELECT 'https://graft.example/' || source || '/' || CAST(doc_id AS VARCHAR) AS url,
      |         TIMESTAMP '2024-01-01 00:00:00' + doc_id * INTERVAL 1 SECOND AS warc_ts,
      |         doc_id
      |  FROM documents),
      |pages AS MATERIALIZED (
      |  SELECT url, warc_ts FROM base
      |  UNION ALL
      |  SELECT CASE doc_id % 40
      |           WHEN 0 THEN 'HTTPS://GRAFT.EXAMPLE' || substr(url, 22)
      |           WHEN 10 THEN 'https://www.graft.example' || substr(url, 22)
      |           WHEN 20 THEN 'https://graft.example:443' || substr(url, 22)
      |           ELSE url || '/?utm_source=feed#frag'
      |         END,
      |         warc_ts + INTERVAL 100000 SECOND
      |  FROM base WHERE doc_id % 10 = 0),
      |canon AS (
      |  SELECT url, warc_ts,
      |         lower(regexp_extract(no_utm, '^([A-Za-z]+)://', 1)) || '://' ||
      |         regexp_replace(regexp_replace(
      |           lower(regexp_extract(no_utm, '^[A-Za-z]+://([^/?#]+)', 1)),
      |           '^www\.', ''), ':(443|80)$', '') ||
      |         regexp_replace(
      |           regexp_extract(no_utm, '^[A-Za-z]+://[^/?#]+(.*)$', 1), '/$', '')
      |           AS canonical_url
      |  FROM (SELECT url, warc_ts,
      |               regexp_replace(regexp_replace(url, '#.*$', ''),
      |                              '\?utm_[a-z]+=[^&#]*$', '') AS no_utm
      |        FROM pages)),
      |ranked AS (
      |  SELECT canonical_url, url, warc_ts,
      |         row_number() OVER (PARTITION BY canonical_url
      |                            ORDER BY warc_ts DESC, url DESC) AS rn,
      |         CAST(count(*) OVER (PARTITION BY canonical_url) AS INTEGER) AS n_variants,
      |         max(warc_ts) OVER (PARTITION BY canonical_url) AS last_w,
      |         min(warc_ts) OVER (PARTITION BY canonical_url) AS first_w
      |  FROM canon)
      |SELECT canonical_url, n_variants, url AS kept_url,
      |       CAST(epoch(last_w) AS BIGINT) AS last_ts,
      |       CAST(epoch(first_w) AS BIGINT) AS first_ts
      |FROM ranked WHERE rn = 1""".stripMargin

  /** dd_hostcap: per-host quota re-derived as the semantic definition —
    * row_number over (warc_ts, url) per site key, keep rn <= 10. The oracle
    * states the CONTRACT (a windowed rank); Spark meets it with two salted
    * aggregations (no corpus-sized per-host window) — equality holds
    * because (warc_ts, url) is a total order. */
  val ddHostcapSql: String =
    """WITH pages AS MATERIALIZED (
      |  SELECT 'https://graft.example/' || source || '/' || CAST(doc_id AS VARCHAR) AS url,
      |         TIMESTAMP '2024-01-01 00:00:00' + doc_id * INTERVAL 1 SECOND AS warc_ts
      |  FROM documents),
      |r AS (
      |  SELECT regexp_extract(url, '^[A-Za-z]+://[^/?#]+/([^/?#]+)', 1) AS host,
      |         url, warc_ts,
      |         row_number() OVER (
      |           PARTITION BY regexp_extract(url, '^[A-Za-z]+://[^/?#]+/([^/?#]+)', 1)
      |           ORDER BY warc_ts, url) AS rn
      |  FROM pages)
      |SELECT host, url, CAST(epoch(warc_ts) AS BIGINT) AS warc_ts
      |FROM r WHERE rn <= 10""".stripMargin

  def mmExtractSql: String = {
    val pre = graft.sources.Pages.HtmlPrefix.length
    val suf = graft.sources.Pages.HtmlSuffix.length
    s"""SELECT 'https://graft.example/' || source || '/' || CAST(doc_id AS VARCHAR) AS url,
       |       CAST(epoch(TIMESTAMP '2024-01-01 00:00:00' + doc_id * INTERVAL 1 SECOND) AS BIGINT) AS warc_ts,
       |       CAST($pre + length(text) + $suf AS INTEGER) AS html_len,
       |       CAST(length(text) AS INTEGER) AS text_len,
       |       TRUE AS extract_ok
       |FROM documents""".stripMargin
  }

  /** el_nif: the staged synthetic NIF corpus re-derived from first
    * principles — the decoded context texts come from DuckDB's OWN escape
    * decoder (SQL e-strings carry the same \" \n \t \\ sequences the Turtle
    * literals do), and the begin/end offsets from strpos over those decoded
    * texts, so the Spark side's single-pass Turtle unescape and the parsed
    * integer offsets are both independently checked. */
  val elNifSql: String =
    """WITH ctx(doc_uri, text) AS (VALUES
      |  ('http://graft.test/doc1', e'Said "hello" to Ada Lovelace\nin Paris.'),
      |  ('http://graft.test/doc2', e'Tabs\there and C:\\path meet Alan Turing.')),
      |m(doc_uri, surface, qid) AS (VALUES
      |  ('http://graft.test/doc1', 'Ada Lovelace', 'Q7259'),
      |  ('http://graft.test/doc1', 'Paris', 'Q90'),
      |  ('http://graft.test/doc2', 'Alan Turing', 'Q7251'))
      |SELECT c.doc_uri,
      |       CAST(strpos(c.text, m.surface) - 1 AS INTEGER) AS m_begin,
      |       CAST(strpos(c.text, m.surface) - 1 + length(m.surface) AS INTEGER) AS m_end,
      |       m.surface, m.qid,
      |       CAST(length(c.text) AS INTEGER) AS ctx_len,
      |       substr(c.text, strpos(c.text, m.surface), length(m.surface)) = m.surface AS anchor_ok
      |FROM m JOIN ctx c USING (doc_uri)""".stripMargin

  /** el_norm: qid/pid extraction re-derived with DuckDB's regex engine. */
  val elNormSql: String =
    """WITH u(url) AS (VALUES
      |  ('http://www.wikidata.org/entity/Q42'),
      |  ('https://www.wikidata.org/wiki/Q8502'),
      |  ('Q3918'),
      |  ('http://www.wikidata.org/prop/direct/P2427'),
      |  ('http://www.wikidata.org/entity/P31'),
      |  ('P2002'),
      |  ('http://www.wikidata.org/entity/statement/Q42-F078'),
      |  ('Q042'),
      |  ('q42'),
      |  ('http://example.org/other'))
      |SELECT url,
      |       NULLIF(regexp_extract(url, '(Q[1-9][0-9]*)$', 1), '') AS qid,
      |       NULLIF(regexp_extract(url, '(P[1-9][0-9]*)$', 1), '') AS pid
      |FROM u""".stripMargin

  /** el_fold: the frozen transliteration table cross-checked against
    * DuckDB's strip_accents for combining accents, explicit folds for the
    * ligature/punctuation rows strip_accents leaves alone (œ Æ ß ’ — the
    * Lucene ASCIIFolding behaviors), and unidecode's drop-unmapped rule as
    * a trailing non-ASCII strip. */
  val elFoldSql: String =
    """WITH t(raw) AS (VALUES
      |  ('café'), ('Ångström naïve'), ('Señor Peña'), ('l’œuvre de Æsop'),
      |  ('straße'), ('plain ASCII'), ('中文 mixed λ')),
      |f AS (SELECT raw,
      |  replace(replace(replace(replace(replace(
      |    strip_accents(raw), 'œ', 'oe'), 'Æ', 'AE'), 'æ', 'ae'),
      |    'ß', 'ss'), '’', '''') AS folded
      |  FROM t)
      |SELECT raw,
      |       regexp_replace(folded, '[^\x00-\x7F]', '', 'g') AS uni,
      |       folded
      |FROM f""".stripMargin

  /** ts_pii: PII counts + redaction re-derived with DuckDB's RE2 engine.
    * Patterns are shared constants written to mean the same thing in Java
    * regex and RE2; counts run on the raw text, redaction nests in the same
    * fixed order (email, phone, ip) with the 'g' flag matching Spark's
    * replace-all semantics. The planted-PII variants are rebuilt from the
    * same deterministic spec (every 25th doc, id +4*10^6). */
  def tsPiiSql: String = {
    import graft.textstats.TextStats.{PiiEmail, PiiPhone, PiiIp}
    s"""WITH pcorpus AS MATERIALIZED (
       |  SELECT doc_id, text FROM documents
       |  UNION ALL
       |  SELECT doc_id + 4000000,
       |         text || ' contact user' || CAST(doc_id AS VARCHAR)
       |              || '@mail-example.org or call 555-123-4567 alt 310 555 0199'
       |              || ' from 203.0.113.' || CAST(doc_id % 200 AS VARCHAR)
       |  FROM documents WHERE doc_id % 25 = 0)
       |SELECT doc_id,
       |  CAST(len(regexp_extract_all(text, '$PiiEmail')) AS INTEGER) AS n_emails,
       |  CAST(len(regexp_extract_all(text, '$PiiPhone')) AS INTEGER) AS n_phones,
       |  CAST(len(regexp_extract_all(text, '$PiiIp')) AS INTEGER) AS n_ips,
       |  regexp_replace(regexp_replace(regexp_replace(text,
       |    '$PiiEmail', '<EMAIL>', 'g'), '$PiiPhone', '<PHONE>', 'g'),
       |    '$PiiIp', '<IP>', 'g') AS clean_text
       |FROM pcorpus""".stripMargin
  }

  /** ts_sample: language-id (same argmax CTE as ts_langid) + the
    * deterministic multiplicative-scatter keep decision and per-language
    * quotas restated arithmetically. */
  def tsSampleSql: String = {
    val markers = graft.textstats.TextStats.Markers.map { case (lang, ws) =>
      s"(${q(lang)}, [${ws.map(q).mkString(", ")}])"
    }.mkString(", ")
    val quotaCase = "CASE pred_lang " + graft.textstats.TextStats.SampleQuota
      .map { case (l, p) => s"WHEN ${q(l)} THEN $p" }.mkString(" ") + " ELSE 0 END"
    s"""WITH m(lang, words) AS (VALUES $markers),
       |sscores AS MATERIALIZED (
       |  SELECT d.doc_id, m.lang,
       |         len(list_intersect(string_split(d.text, ' '), m.words)) AS hits
       |  FROM documents d CROSS JOIN m),
       |slang AS MATERIALIZED (
       |  SELECT doc_id,
       |         CASE WHEN hits > 0 THEN lang ELSE 'und' END AS pred_lang
       |  FROM (SELECT *, row_number() OVER (
       |          PARTITION BY doc_id ORDER BY hits DESC, lang) AS rn
       |        FROM sscores)
       |  WHERE rn = 1)
       |SELECT doc_id, pred_lang,
       |       CAST(((doc_id * 2654435761) % 1000003) % 1000 AS INTEGER) AS bucket,
       |       CAST($quotaCase AS INTEGER) AS quota_permille
       |FROM slang
       |WHERE ((doc_id * 2654435761) % 1000003) % 1000 < $quotaCase""".stripMargin
  }

  /** ts_lm: the corpus unigram LM and the per-doc mean negative
    * log-likelihood re-derived relationally (the reference's BOW smoothing:
    * ln(1 + c(w)) − ln(1 + V + total)). */
  val tsLmSql: String =
    """WITH ltoks AS MATERIALIZED (
      |  SELECT doc_id, unnest(string_split(text, ' ')) AS word FROM documents),
      |lt AS MATERIALIZED (SELECT doc_id, word FROM ltoks WHERE length(word) > 0),
      |lv AS MATERIALIZED (SELECT word, count(*) AS c FROM lt GROUP BY word),
      |ls AS MATERIALIZED (SELECT sum(c) AS total, count(*) AS v FROM lv)
      |SELECT doc_id, CAST(count(*) AS INTEGER) AS n_tokens,
      |       round(ln(1.0 + (SELECT v FROM ls) + (SELECT total FROM ls))
      |             - avg(ln(1.0 + c)), 6) AS avg_nll
      |FROM lt JOIN lv USING (word)
      |GROUP BY doc_id""".stripMargin

  /** dd_decontam: the benchmark gram set (8-gram at tokens 3..10 of every
    * 37th doc), every document's 8-grams via a list comprehension, and the
    * contamination report re-derived independently. */
  val ddDecontamSql: String =
    """WITH dt AS MATERIALIZED (
      |  SELECT doc_id, string_split(text, ' ') AS t FROM documents),
      |bench AS MATERIALIZED (
      |  SELECT DISTINCT array_to_string(t[3:10], ' ') AS gram
      |  FROM dt WHERE doc_id % 37 = 0 AND len(t) >= 10),
      |grams AS (
      |  SELECT doc_id, unnest(list_transform(range(1, len(t) - 6),
      |                                       i -> array_to_string(t[i:i+7], ' '))) AS gram
      |  FROM dt WHERE len(t) >= 8)
      |SELECT doc_id, CAST(count(DISTINCT gram) AS BIGINT) AS n_hits,
      |       min(gram) AS sample_gram
      |FROM grams JOIN bench USING (gram)
      |GROUP BY doc_id""".stripMargin

  /** fn_sql: the SQL-registered custom expressions (GraftExtensions) vs
    * DuckDB's built-ins — jaro_winkler_similarity matches the classic
    * 0.7-boost definition (same as el_pairs' scorer), and
    * list_cosine_similarity the index-ordered dot/norms (same as ann_*). */
  val fnSqlSql: String =
    """SELECT 'jw' AS fn, a.doc_id AS id,
      |       round(jaro_winkler_similarity(substring(a.text, 1, 40),
      |                                     substring(b.text, 1, 40)), 6) AS val
      |FROM documents a JOIN documents b ON b.doc_id = a.doc_id + 1
      |UNION ALL
      |SELECT 'cos' AS fn, e1.vec_id AS id,
      |       round(list_cosine_similarity(e1.embedding::DOUBLE[],
      |                                    e2.embedding::DOUBLE[]), 6) AS val
      |FROM embeddings e1 JOIN embeddings e2 ON e2.vec_id = e1.vec_id + 1""".stripMargin
}
