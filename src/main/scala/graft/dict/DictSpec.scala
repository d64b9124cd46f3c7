package graft.dict

import graft.text.TextOps

/** One claim in the synthetic Wikidata-like dump.
  * `target` = entity value (emitted as {"entity-type","numeric-id","id"}),
  * `str` = string value (external identifier, e.g. P2002 twitter handle),
  * `qualifiers` = (pid, target-qid) pairs attached to the claim.
  */
final case class ClaimSpec(
    pid: String,
    target: Option[Int] = None,
    str: Option[String] = None,
    qualifiers: Seq[(String, Int)] = Nil)

final case class EntitySpec(
    qid: String,
    labels: Map[String, String],
    descriptions: Map[String, String],
    aliases: Map[String, Seq[String]],
    claims: Seq[ClaimSpec],
    nbSitelinks: Int,
    lastrevid: Long) {
  def qidNum: Int = qid.drop(1).toInt
}

/** Deterministic synthetic Wikidata-like entity dump over the corpus
  * vocabulary of the testdata documents tables (31 words, lowercase
  * ASCII). Shaped like the reference test dump
  * (/root/reference/tests/data/sample_wikidata_items.json.bz2, schema
  * {type,id,labels,descriptions,aliases,claims,sitelinks,lastrevid}).
  *
  * Design goals:
  *  - labels/aliases are 1-3 token phrases over the corpus vocabulary so
  *    that mention extraction over `documents` finds real, Zipf-skewed hits;
  *  - one ambiguous surface ("merge" -> Q2 alias, Q8 label) to exercise
  *    candidate ranking;
  *  - entities excluded by the type filter (Q13) and the missing-label
  *    filter (Q30), and a label-language-fallback entity (Q31), mirroring
  *    reference tests (tests/test_indexingprofile.py:96-107,
  *    tests/test_wditem.py:15-22);
  *  - nested spans ("slow query" contains "slow") to exercise NO_SUB
  *    overlap resolution (tagger.py:44).
  *
  * This object also carries a PLAIN-SCALA implementation of the reference
  * projection semantics (indexingprofile.py:106-157, wditem.py) used as an
  * independent oracle for the Spark/Catalyst implementation in DictBuild.
  */
object DictSpec {

  val Lang = "en"

  // ---- type hierarchy (P279 edges) --------------------------------------
  // Q200 "operator" is the profile's target type; Q201/Q202 are subclasses.
  // Q210/Q211 are an unrelated hierarchy used for exclusion tests.
  private def t(qid: Int, label: String, p279: Option[Int]): EntitySpec =
    EntitySpec(s"Q$qid", Map(Lang -> label), Map(Lang -> s"type: $label"),
      Map.empty, p279.map(q => ClaimSpec("P279", target = Some(q))).toSeq,
      nbSitelinks = 2, lastrevid = 1000L + qid)

  val typeEntities: Seq[EntitySpec] = Seq(
    t(200, "operator", None),
    t(201, "physical operator", Some(200)),
    t(202, "engine", Some(200)),
    t(210, "animal", None),
    t(211, "mammal", Some(210)),
  )

  // ---- concept entities ---------------------------------------------------
  private def e(
      qid: Int, label: String, aliases: Seq[String], p31: Int,
      related: Seq[Int], sl: Int,
      quals: Seq[(String, Int)] = Nil, p2002: Option[String] = None): EntitySpec = {
    val claims = Seq.newBuilder[ClaimSpec]
    claims += ClaimSpec("P31", target = Some(p31))
    related.zipWithIndex.foreach { case (r, i) =>
      claims += ClaimSpec("P361", target = Some(r),
        qualifiers = if (i == 0) quals else Nil)
    }
    p2002.foreach(h => claims += ClaimSpec("P2002", str = Some(h)))
    EntitySpec(s"Q$qid", Map(Lang -> label), Map(Lang -> s"the $label operator"),
      if (aliases.nonEmpty) Map(Lang -> aliases) else Map.empty,
      claims.result(), sl, 2000L + qid)
  }

  val conceptEntities: Seq[EntitySpec] = Seq(
    e(1, "hash join", Seq("hash merge join"), 201, Seq(11, 2, 8), 40,
      quals = Seq("P518" -> 15)),
    e(2, "sort merge join", Seq("merge join", "merge"), 201, Seq(10, 8), 30),
    e(3, "table scan", Seq("big scan"), 201, Seq(25, 4), 25),
    e(4, "scan", Nil, 201, Seq(3), 60),
    e(5, "window", Seq("window agg"), 201, Seq(12), 45),
    e(6, "spark", Nil, 202, Seq(7, 16), 80, p2002 = Some("sparkengine")),
    e(7, "stream", Nil, 201, Seq(6, 16), 35),
    e(8, "merge", Nil, 201, Seq(2, 10), 50),
    e(9, "filter", Nil, 201, Seq(14), 55),
    e(10, "sort", Nil, 201, Seq(8, 20), 48),
    e(11, "hash", Nil, 201, Seq(1), 52),
    e(12, "group", Seq("row group"), 201, Seq(5, 34), 39),
    e(13, "customer", Nil, 211, Seq(21), 10), // excluded: wrong type branch
    e(14, "query", Seq("slow query"), 201, Seq(9), 42),
    e(15, "vector", Nil, 201, Nil, 20),
    e(16, "batch", Nil, 201, Seq(7), 33),
    e(17, "key value", Nil, 201, Seq(15), 28),
    e(18, "data line", Seq("line data"), 201, Nil, 15),
    e(19, "dup", Nil, 201, Nil, 12),
    e(20, "order", Nil, 201, Seq(10), 38),
    e(21, "row", Nil, 201, Seq(12), 44),
    e(22, "fast sort", Nil, 201, Seq(10, 8), 18),
    e(23, "part", Nil, 201, Nil, 26),
    e(24, "big table", Seq("the big table"), 201, Seq(3), 22),
    e(25, "table", Nil, 201, Seq(3, 24), 58),
    e(26, "column", Nil, 201, Seq(25), 47),
    e(27, "value", Nil, 201, Seq(17), 41),
    e(28, "key", Nil, 201, Seq(17), 43),
    e(29, "line", Nil, 201, Seq(18), 36),
    // excluded: no label at all (entity_to_document label guard)
    EntitySpec("Q30", Map.empty, Map(Lang -> "mystery"), Map.empty,
      Seq(ClaimSpec("P31", target = Some(201))), 1, 2030L),
    // label fallback: only a French label (wditem.py:69-82)
    EntitySpec("Q31", Map("fr" -> "jointure"), Map.empty, Map.empty,
      Seq(ClaimSpec("P31", target = Some(201)),
          ClaimSpec("P361", target = Some(1))), 5, 2031L),
    e(32, "slow", Nil, 201, Seq(14), 29),
    e(33, "data", Nil, 201, Seq(18), 46),
    // alias "a": a stopword-like 1-char alias — every lowercase match is
    // killed by the prune filter (tagger.py:79-89), exercising prune at
    // corpus scale and the Zipf-hottest blocking key
    e(34, "agg", Seq("a"), 201, Seq(12, 8), 31),
    e(35, "small", Nil, 201, Nil, 27),
    e(36, "big", Nil, 201, Seq(24), 24),
  )

  val allEntities: Seq[EntitySpec] = typeEntities ++ conceptEntities

  // ---- JSON dump emission -------------------------------------------------
  private def jstr(s: String): String =
    "\"" + s.flatMap {
      case '"' => "\\\""
      case '\\' => "\\\\"
      case '\n' => "\\n"
      case c if c < ' ' => f"\\u${c.toInt}%04x"
      case c => c.toString
    } + "\""

  private def snakJson(pid: String, c: ClaimSpec): String = c.target match {
    case Some(q) =>
      s"""{"snaktype":"value","property":${jstr(pid)},"datavalue":{"value":{"entity-type":"item","numeric-id":$q,"id":"Q$q"},"type":"wikibase-entityid"}}"""
    case None =>
      s"""{"snaktype":"value","property":${jstr(pid)},"datavalue":{"value":${jstr(c.str.get)},"type":"string"}}"""
  }

  private def claimJson(c: ClaimSpec): String = {
    val quals =
      if (c.qualifiers.isEmpty) ""
      else {
        val byPid = c.qualifiers.groupBy(_._1).toSeq.sortBy(_._1)
        val body = byPid.map { case (pid, qs) =>
          jstr(pid) + ":[" + qs.map { case (p, q) =>
            s"""{"snaktype":"value","property":${jstr(p)},"datavalue":{"value":{"entity-type":"item","numeric-id":$q,"id":"Q$q"},"type":"wikibase-entityid"}}"""
          }.mkString(",") + "]"
        }.mkString(",")
        s""","qualifiers":{$body}"""
      }
    s"""{"mainsnak":${snakJson(c.pid, c)}$quals,"rank":"normal"}"""
  }

  /** JSON line in the wikidata-dump shape for one entity. */
  def entityJson(ent: EntitySpec): String = {
    val labels = ent.labels.map { case (l, v) =>
      jstr(l) + s""":{"language":${jstr(l)},"value":${jstr(v)}}"""
    }.mkString(",")
    val descs = ent.descriptions.map { case (l, v) =>
      jstr(l) + s""":{"language":${jstr(l)},"value":${jstr(v)}}"""
    }.mkString(",")
    val aliases = ent.aliases.map { case (l, vs) =>
      jstr(l) + ":[" + vs.map(v => s"""{"language":${jstr(l)},"value":${jstr(v)}}""").mkString(",") + "]"
    }.mkString(",")
    val claims = ent.claims.groupBy(_.pid).toSeq
      .sortBy { case (pid, _) => ent.claims.indexWhere(_.pid == pid) }
      .map { case (pid, cs) => jstr(pid) + ":[" + cs.map(claimJson).mkString(",") + "]" }
      .mkString(",")
    val sitelinks = (0 until ent.nbSitelinks).map { i =>
      jstr(s"wiki$i") + s""":{"site":${jstr(s"wiki$i")},"title":${jstr(ent.qid)}}"""
    }.mkString(",")
    s"""{"type":"item","id":${jstr(ent.qid)},"labels":{$labels},"descriptions":{$descs},"aliases":{$aliases},"claims":{$claims},"sitelinks":{$sitelinks},"lastrevid":${ent.lastrevid}}"""
  }

  /** The dump as it would appear on disk: JSON array lines with trailing
    * commas plus bracket garbage lines, exercising the dump-reader
    * semantics (readers/dumpreader.py:26-36). */
  def dumpLines: Seq[String] =
    Seq("[") ++ allEntities.map(e => entityJson(e) + ",") ++ Seq("]")

  // ---- edit-stream revision batch ------------------------------------------

  /** Deterministic revisions applied AFTER the base dump by the streaming
    * upsert (streamreader.py:16-71 + taggerfactory delete_excluded):
    * a label/alias edit, a previously-excluded item gaining the target type,
    * an item losing its type (must be deleted), and a brand-new item. */
  val revisionEntities: Seq[EntitySpec] = Seq(
    EntitySpec("Q2", Map(Lang -> "sort merge join"),
      Map(Lang -> "the sort merge join operator (revised)"),
      Map(Lang -> Seq("merge join")),
      Seq(ClaimSpec("P31", target = Some(201)), ClaimSpec("P361", target = Some(10))),
      31, 9102L),
    EntitySpec("Q13", Map(Lang -> "customer"),
      Map(Lang -> "the customer operator"), Map.empty,
      Seq(ClaimSpec("P31", target = Some(201)), ClaimSpec("P361", target = Some(21))),
      10, 9113L),
    EntitySpec("Q8", Map(Lang -> "merge"),
      Map(Lang -> "no longer an operator"), Map.empty,
      Seq(ClaimSpec("P31", target = Some(211))), 50, 9108L),
    EntitySpec("Q99", Map(Lang -> "compaction"),
      Map(Lang -> "the compaction operator"), Map(Lang -> Seq("compact")),
      Seq(ClaimSpec("P31", target = Some(202)), ClaimSpec("P361", target = Some(6))),
      7, 9199L))

  def revisionLines: Seq[String] =
    Seq("[") ++ revisionEntities.map(e => entityJson(e) + ",") ++ Seq("]")

  /** Expected dictionary after the stream: per id, the latest revision's
    * projection — present iff the latest revision still projects (plain
    * Scala re-derivation, the stream_upsert oracle). */
  lazy val expectedDictAfterStream: Seq[DictRow] = {
    val byId = scala.collection.mutable.LinkedHashMap[String, Option[DictRow]]()
    allEntities.foreach(e => byId(e.qid) = entityToDocument(e))
    revisionEntities.foreach(e => byId(e.qid) = entityToDocument(e))
    byId.values.flatten.toSeq
  }

  // ---- profile ------------------------------------------------------------
  final case class TypeConstraint(qid: String, pid: String)
  final case class AliasProperty(pid: String, prefix: Option[String])
  final case class Profile(
      language: String,
      restrictTypes: Seq[TypeConstraint],
      restrictProperties: Seq[String],
      aliasProperties: Seq[AliasProperty],
      name: String = "",
      solrconfig: String = "tapioca")

  /** Mirrors profiles/human_organization_location.json shape: restrict to
    * items typed (P31, subclass-of Q200) or bearing P2002; pull P2002 values
    * as "@"-prefixed extra aliases. */
  val profile: Profile = Profile(
    language = Lang,
    restrictTypes = Seq(TypeConstraint("Q200", "P31")),
    restrictProperties = Seq("P2002"),
    aliasProperties = Seq(AliasProperty("P2002", Some("@"))))

  // ---- plain-Scala reference semantics (independent oracle) ---------------

  /** P279 transitive-closure descendant set of `root` (typematcher.py:14-51),
    * reflexive. */
  def subclassClosure(root: Int): Set[Int] = {
    val edges = allEntities.flatMap { ent =>
      ent.claims.filter(_.pid == "P279").flatMap(_.target).map(p => ent.qidNum -> p)
    }
    val children = edges.groupBy(_._2).map { case (p, es) => p -> es.map(_._1).toSet }
    var closure = Set(root)
    var frontier = Set(root)
    while (frontier.nonEmpty) {
      val next = frontier.flatMap(q => children.getOrElse(q, Set.empty)) -- closure
      closure ++= next
      frontier = next
    }
    closure
  }

  final case class DictRow(
      id: String, revid: Long, label: String, desc: String,
      edges: Seq[Int], types: Map[String, Boolean],
      aliases: Seq[String], extraAliases: Seq[String],
      nbStatements: Int, nbSitelinks: Int)

  /** entity_to_document (indexingprofile.py:106-157) re-derived in plain
    * Scala. Returns None when the entity is filtered out. */
  def entityToDocument(ent: EntitySpec): Option[DictRow] = {
    val p31Types = ent.claims.filter(_.pid == "P31").flatMap(_.target)
    val typeFeatures: Map[String, Boolean] =
      profile.restrictTypes.map { c =>
        val closure = subclassClosure(c.qid.drop(1).toInt)
        c.qid -> p31Types.exists(closure.contains)
      }.toMap ++
        profile.restrictProperties.map { pid =>
          pid -> ent.claims.exists(c => c.pid == pid && c.str.isDefined)
        }.toMap
    val correctType = typeFeatures.values.exists(identity)
    val validItem = correctType ||
      (profile.restrictTypes.isEmpty && profile.restrictProperties.isEmpty)
    if (!validItem) return None

    val label = ent.labels.get(profile.language).orElse(ent.labels.get("en"))
      .orElse(ent.labels.values.headOption)
    if (label.isEmpty) return None

    val desc = ent.descriptions.getOrElse(profile.language, "")
    // all terms = labels in all languages + aliases, label removed; insertion
    // order (reference uses a Python set: order not semantically meaningful)
    val allTerms = (ent.labels.values.toSeq ++ ent.aliases.values.flatten).distinct
    val aliases = allTerms.filterNot(_ == label.get)
    // outgoing edges, P31 claims excluded, qualifiers included, with
    // multiplicity (wditem.py:15-40)
    val edges = ent.claims.filterNot(_.pid == "P31").flatMap { c =>
      c.target.toSeq ++ c.qualifiers.map(_._2)
    }
    val extra = profile.aliasProperties.flatMap { ap =>
      ent.claims.filter(c => c.pid == ap.pid && c.str.isDefined)
        .map(c => ap.prefix.getOrElse("") + c.str.get)
    }
    Some(DictRow(ent.qid, ent.lastrevid, label.get, desc, edges, typeFeatures,
      aliases, extra, ent.claims.size, ent.nbSitelinks))
  }

  lazy val expectedDict: Seq[DictRow] =
    allEntities.flatMap(entityToDocument)

  /** Blocking keys: normalized label + aliases + extra aliases per included
    * entity, via the tagger analyzer (managed-schema:63-75). */
  lazy val expectedDictKeys: Seq[(String, String, Int)] =
    expectedDict.flatMap { row =>
      (Seq(row.label) ++ row.aliases ++ row.extraAliases).map { term =>
        val toks = TextOps.tokenizeWithOffsets(term).map(_.norm)
        (toks.mkString(" "), row.id, toks.length)
      }
    }.filter(_._1.nonEmpty).distinct

  lazy val maxKeyTokens: Int = expectedDictKeys.map(_._3).max

  // ---- PageRank graph (plain Scala oracle) --------------------------------

  /** Raw outgoing edges including P31 (wikidatagraph.py preprocess default),
    * with multiplicity, for every entity whose id starts with Q. */
  lazy val rawGraphEdges: Seq[(Int, Int)] = allEntities.flatMap { ent =>
    ent.claims.flatMap(c => c.target.toSeq ++ c.qualifiers.map(_._2))
      .map(dst => ent.qidNum -> dst)
  }

  /** Row-normalized weighted edges following load_from_preprocessed_dump
    * (wikidatagraph.py:62-121): N = lastSourceQid+1; targets beyond that
    * dropped; weights normalized after the drop. */
  lazy val (graphN: Int, weightedEdges: Seq[(Int, Int, Double)]) = {
    val bySrc = rawGraphEdges.groupBy(_._1)
    val lastQid = bySrc.keys.max
    val edges = bySrc.toSeq.sortBy(_._1).flatMap { case (src, es) =>
      val kept = es.map(_._2).filter(_ <= lastQid)
      val total = kept.size.toDouble
      kept.groupBy(identity).toSeq.sortBy(_._1).map { case (dst, ds) =>
        (src, dst, ds.size / total)
      }
    }
    (lastQid + 1, edges)
  }

  /** Dense 16-iteration power method with uniform loss compensation
    * (wikidatagraph.py:131-157), plain Scala. */
  lazy val expectedPagerank: Map[Int, Double] = {
    val n = graphN
    var v = Array.fill(n)(1.0 / n)
    for (_ <- 0 until 16) {
      val nv = Array.fill(n)(0.0)
      weightedEdges.foreach { case (s, d, w) => nv(d) += v(s) * w }
      val l1 = nv.sum
      val comp = (1.0 - l1) / n
      var i = 0
      while (i < n) { nv(i) += comp; i += 1 }
      v = nv
    }
    v.zipWithIndex.map { case (r, q) => q -> r }.toMap
  }

  /** pagerank lookup incl. OOV default (wikidatagraph.py:165-170). */
  def pagerankOf(qidNum: Int): Double =
    if (qidNum < graphN) expectedPagerank(qidNum) else 0.01 / graphN

  // ---- BOW oracle (plain Scala, train_from_dump semantics) ----------------

  /** Per-item deduped en-label+en-alias bow tokens, counted across items
    * (languagemodel.py:96-126 + ingest_phrases 37-45). */
  lazy val expectedBowCounts: Map[String, Long] = {
    val perItem = allEntities.flatMap { ent =>
      ent.labels.get("en").map { lbl =>
        (ent.aliases.getOrElse("en", Seq.empty) :+ lbl)
          .flatMap(TextOps.bowTokenize).distinct
      }
    }
    perItem.flatten.groupBy(identity).map { case (w, ws) => w -> ws.size.toLong }
  }

  lazy val expectedBowTotal: Long = expectedBowCounts.values.sum

  lazy val expectedBowModel: graft.model.Bow.Model =
    graft.model.Bow.Model(
      expectedBowCounts.filter(_._2 >= graft.model.Bow.Threshold),
      expectedBowTotal)

  // ---- gold entity per surface (for the pairwise-F1 gate) -----------------

  /** Gold winner per ambiguous-or-not blocking key: the candidate with the
    * highest rank (23+ln pagerank), ties broken by smallest qid string (the
    * candidate ordering used by Mentions.candidates). For unambiguous keys
    * this is simply the only candidate — the planted linkage truth. */
  lazy val goldQidByKey: Map[String, String] =
    expectedDictKeys.groupBy(_._1).map { case (key, rows) =>
      key -> rows.map(_._2).sorted.maxBy(qid => pagerankOf(qid.drop(1).toInt))
    }
}
