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
}
