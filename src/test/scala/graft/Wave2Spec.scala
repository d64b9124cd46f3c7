package graft

import org.scalatest.funsuite.AnyFunSuite
import org.apache.spark.sql.functions._
import graft.sources.Pages
import graft.ckpt.Snapshots
import graft.dedup.Dedup
import graft.textstats.TextStats

class Wave2Spec extends AnyFunSuite {
  lazy val spark = TestSpark.spark
  import spark.implicits._

  val sf = "/root/testdata/sf0.001"
  def docs = spark.read.parquet(s"$sf/documents.parquet")

  test("INVARIANT: extracted text is byte-identical per url (input_hint)") {
    val pages = Pages.fromDocuments(docs)
    val bad = pages
      .withColumn("extracted", Pages.extractTextUdf(col("html")))
      .filter(col("extracted") =!= col("text"))
      .count()
    assert(bad == 0)
    // and the raw bytes round-trip exactly
    val row = pages.select("html", "text").head()
    val extracted = Pages.extractText(row.getAs[Array[Byte]](0))
    assert(extracted.getBytes("UTF-8").sameElements(row.getString(1).getBytes("UTF-8")))
  }

  test("pages schema matches the input_hint shape") {
    val pages = Pages.fromDocuments(docs)
    assert(pages.schema.map(f => (f.name, f.dataType.simpleString)) == Seq(
      ("url", "string"), ("warc_ts", "timestamp"), ("html", "binary"),
      ("text", "string"), ("lang", "string")))
    assert(pages.select("url").distinct().count() == pages.count())
  }

  test("snapshot checkpoint: commit, lineage, per-partition counters, resume") {
    val root = java.nio.file.Files.createTempDirectory("graft-snap").toString
    var builds = 0
    def build = { builds += 1; docs.select("doc_id", "lang").repartition(3) }

    val (df1, tok1) = Snapshots.resumeOrRun(spark, root, "stage_a", Seq("src:0"))(build)
    assert(builds == 1 && df1.count() == 500 && tok1 == "stage_a:0")
    val (_, m) = (Snapshots.latest(spark, root, "stage_a").get)
    // resume: same lineage -> no recompute
    val (df2, tok2) = Snapshots.resumeOrRun(spark, root, "stage_a", Seq("src:0"))(build)
    assert(builds == 1 && tok2 == "stage_a:0" && df2.count() == 500)
    // changed upstream lineage -> recompute as snapshot 1
    val (_, tok3) = Snapshots.resumeOrRun(spark, root, "stage_a", Seq("src:1"))(build)
    assert(builds == 2 && tok3 == "stage_a:1")
    // manifest carries per-partition counters that sum to the row count
    val manifest = Snapshots.latest(spark, root, "stage_a").get._2
    assert(manifest.rows == 500 && manifest.inputs == Seq("src:1"))
  }

  test("exact dedup groups singletons to themselves and dups to min id") {
    val d = Seq((1L, "x y z"), (2L, "a b c"), (5L, "x y z")).toDF("doc_id", "text")
    val got = Dedup.exactDups(d).collect()
      .map(r => (r.getLong(0), r.getLong(1), r.getLong(2))).toSet
    assert(got == Set((1L, 1L, 2L), (5L, 1L, 2L), (2L, 2L, 1L)))
  }

  test("minhash LSH finds the planted near-dups and jaccard verifies them") {
    val aug = Dedup.augment(docs)
    val cand = Dedup.minhashCandidates(aug).cache()
    val pairs = cand.collect().map(r => (r.getLong(0), r.getLong(1))).toSet
    val planted = docs.select("doc_id").as[Long].collect().filter(_ % 50 == 0)
      .map(d => (d, d + 1000000L)).toSet
    // LSH is probabilistic by construction: short docs lose a large shingle
    // fraction to the 5-token drop, so a small miss rate is expected.
    val found = planted.intersect(pairs)
    assert(planted.nonEmpty && found.size >= (planted.size * 8) / 10,
      s"LSH recall too low: ${found.size}/${planted.size}")
    // every found planted pair survives the exact-Jaccard verify at 0.5
    val verified = Dedup.jaccardVerify(aug, cand, 0.5)
      .collect().map(r => (r.getLong(0), r.getLong(1))).toSet
    assert(found.subsetOf(verified))
  }

  test("near-dup clusters are transitive with min-id cluster and longest-doc canonical") {
    // a 3-chain of overlapping drafts + an unrelated doc: clustering must be
    // TRANSITIVE (1,2,3 together even if only adjacent pairs verify) with
    // cluster = min member id and canonical = the most-shingled member
    val t = (1 to 40).map(i => s"w$i").mkString(" ")
    val d = Seq(
      (10L, t),
      (20L, t.split(" ").drop(1).mkString(" ")),
      (30L, t.split(" ").drop(2).mkString(" ")),
      (99L, (1 to 40).map(i => s"z$i").mkString(" "))).toDF("doc_id", "text")
    val got = Dedup.nearDupClusters(spark, d).collect()
      .map(r => r.getLong(0) -> ((r.getLong(1), r.getLong(2), r.getLong(3)))).toMap
    assert(got(10L) == ((10L, 10L, 3L)))
    assert(got(20L) == ((10L, 10L, 3L)))
    assert(got(30L) == ((10L, 10L, 3L)))
    assert(got(99L) == ((99L, 99L, 1L)))

    // planted corpus dups land in the same cluster, base doc canonical
    val aug = Dedup.augment(docs)
    val clustered = Dedup.nearDupClusters(spark, aug).collect()
      .map(r => r.getLong(0) -> ((r.getLong(1), r.getLong(2), r.getLong(3)))).toMap
    val paired = clustered.keys.filter(_ >= 1000000L)
      .filter(v => clustered(v)._1 == clustered(v - 1000000L)._1).toSeq
    assert(paired.nonEmpty)
    paired.foreach { v =>
      val (cl, canon, sz) = clustered(v)
      // the corpus has its own exact/near dups, so a variant's cluster may
      // be wider than {base, variant}: assert the invariants instead —
      // cluster = min member id, size = member count, canonical a member
      val members = clustered.collect { case (id, (c, _, _)) if c == cl => id }
      assert(cl == members.min && sz == members.size.toLong
        && members.exists(_ == canon))
      // on an unambiguous {base, variant} cluster the base (5 tokens
      // longer, so strictly more shingles) must be the canonical doc
      if (members.toSet == Set(v, v - 1000000L)) assert(canon == v - 1000000L)
    }
    // singletons point at themselves
    val single = clustered.collect { case (id, (cl, canon, sz)) if sz == 1L =>
      (id, cl, canon) }
    assert(single.nonEmpty && single.forall { case (id, cl, canon) =>
      cl == id && canon == id })
  }

  test("simhash: near-dups are closer in hamming distance than random docs") {
    val aug = Dedup.augment(docs)
    val fp = Dedup.simhash(Dedup.docShingleIds(aug))
      .collect().map(r => r.getLong(0) -> r.getLong(1)).toMap
    def ham(a: Long, b: Long) = java.lang.Long.bitCount(a ^ b)
    val planted = fp.keys.filter(_ >= 1000000L).toSeq
    assert(planted.nonEmpty)
    val nearHam = planted.map(v => ham(fp(v), fp(v - 1000000L)))
    // random-pair baseline: consecutive raw docs
    val rawIds = fp.keys.filter(_ < 1000000L).toSeq.sorted
    val randHam = rawIds.zip(rawIds.tail).take(100).map { case (a, b) => ham(fp(a), fp(b)) }
    val nearMean = nearHam.sum.toDouble / nearHam.size
    val randMean = randHam.sum.toDouble / randHam.size
    assert(nearMean < randMean / 2,
      s"near-dup hamming $nearMean not clearly below random $randMean")
  }

  test("simhash banding: pairs equal the brute-force hamming<=3 set exactly") {
    val fpDf = Dedup.simhash(Dedup.docShingleIds(Dedup.augment(docs)))
    val fp = fpDf.collect().map(r => r.getLong(0) -> r.getLong(1))
    // brute-force oracle over all pairs in plain Scala (510 docs is cheap);
    // the pigeonhole guarantees banding finds EVERY such pair, and the
    // post-join bit_count filter guarantees nothing else survives
    def ham(a: Long, b: Long) = java.lang.Long.bitCount(a ^ b)
    val want = (for {
      (i, a) <- fp; (j, b) <- fp
      if i < j && ham(a, b) <= 3
    } yield (i, j, ham(a, b).toLong)).toSet
    val got = Dedup.simhashCandidates(fpDf).collect()
      .map(r => (r.getLong(0), r.getLong(1), r.getLong(2))).toSet
    assert(want.nonEmpty, "corpus should contain hamming<=3 pairs")
    assert(got == want)
  }

  test("bm25: hand corpus matches the closed form; top-k is score-ordered") {
    val hand = Seq(
      (1L, "merge merge scan the table"),
      (2L, "scan scan scan scan scan"),
      (3L, "window sort group by key"),
      (4L, "a b c d e f g h")).toDF("doc_id", "text")
    val terms = Seq("merge", "scan")
    val got = graft.search.Bm25.search(hand, terms, k = 3).collect()
      .map(r => r.getLong(0) -> r.getDouble(1)).toMap
    // plain-Scala closed form (k1=1.2, b=0.75, RSJ idf)
    val lens = Map(1L -> 5.0, 2L -> 5.0, 3L -> 5.0, 4L -> 8.0)
    val avgdl = lens.values.sum / 4
    val tf = Map((1L, "merge") -> 2.0, (1L, "scan") -> 1.0, (2L, "scan") -> 5.0)
    val df = Map("merge" -> 1.0, "scan" -> 2.0)
    def score(d: Long) = terms.map { t =>
      tf.get((d, t)).fold(0.0) { f =>
        math.log(1.0 + (4.0 - df(t) + 0.5) / (df(t) + 0.5)) * f * 2.2 /
          (f + 1.2 * (0.25 + 0.75 * lens(d) / avgdl))
      }
    }.sum
    assert(got.keySet == Set(1L, 2L))
    for ((d, s) <- got)
      assert(math.abs(s - score(d)) < 1e-6, s"doc $d: $s vs ${score(d)}")
    // doc 1 matches both terms including the rare one -> outranks doc 2
    assert(got(1L) > got(2L))
  }

  test("bm25: empty corpus yields empty result; precomputed stats match computed") {
    val empty = Seq.empty[(Long, String)].toDF("doc_id", "text")
    val r = graft.search.Bm25.search(empty, Seq("merge"))
    assert(r.count() == 0)
    assert(r.columns.toSeq == Seq("doc_id", "score"))
    // the static-corpus path: (N, avgdl) passed in = computed per call
    val hand = Seq(
      (1L, "merge merge scan the table"),
      (2L, "scan scan scan scan scan")).toDF("doc_id", "text")
    val computed = graft.search.Bm25.search(hand, Seq("merge", "scan"))
    val pre = graft.search.Bm25.search(hand, Seq("merge", "scan"),
      corpusStats = Some((2.0, 5.0)))
    assert(computed.collect().toSeq == pre.collect().toSeq)
  }

  test("langid predicts the marker language deterministically") {
    val d = Seq(
      (1L, "der hund und die katze ist da"),
      (2L, "the cat of the house is big"),
      (3L, "xyz qqq www")).toDF("doc_id", "text")
    val got = TextStats.langId(d).collect()
      .map(r => r.getLong(0) -> r.getString(1)).toMap
    assert(got == Map(1L -> "de", 2L -> "en", 3L -> "und"))
  }

  test("token counts + fingerprint are deterministic and positive") {
    val tc = TextStats.tokenCounts(docs).agg(
      sum(col("ws_tokens")), sum(col("bpe_tokens"))).head()
    assert(tc.getLong(0) > 0 && tc.getLong(1) >= tc.getLong(0))
    val fp = TextStats.fingerprint(docs)
    assert(fp.count() == 500)
    // position sensitivity: permuted doc gets a different fingerprint
    val d = Seq((1L, "alpha beta gamma"), (2L, "gamma beta alpha")).toDF("doc_id", "text")
    val two = TextStats.fingerprint(d).collect().map(_.getLong(1)).toSet
    assert(two.size == 2)
  }

  test("sequence packing: two-phase prefix sum equals the serial scan") {
    val got = TextStats.pack(docs, capacity = 512L)
      .collect().map(r => (r.getLong(0), r.getLong(1), r.getLong(2), r.getLong(3)))
      .sortBy(_._1)
    // serial oracle: scanLeft over doc_id-ordered token counts
    val toks = docs.select(col("doc_id"), size(split(col("text"), " ")).cast("long"))
      .collect().map(r => (r.getLong(0), r.getLong(1))).sortBy(_._1)
    val offsets = toks.map(_._2).scanLeft(0L)(_ + _)
    val want = toks.zip(offsets).map { case ((id, n), off) => (id, n, off, off / 512L) }
    assert(got.length == want.length)
    assert(got.sameElements(want))
    // and the packing is non-trivial: multiple shards, every shard's
    // starting docs fit the declared capacity order (offsets monotone)
    assert(got.map(_._4).distinct.length > 1)
  }

  test("incremental annotate equals the one-shot batch annotate") {
    val incr = Pipeline.annotateIncremental(spark, sf)
      .select("doc_id", "start", "end", "surface", "best_qid")
    val full = Pipeline.annotate(spark, sf)
      .select("doc_id", "start", "end", "surface", "best_qid")
    assert(incr.count() > 0)
    assert(incr.exceptAll(full).isEmpty && full.exceptAll(incr).isEmpty)
  }

  test("snapshot time travel: history, readAt, rollback") {
    val root = java.nio.file.Files.createTempDirectory("graft_timetravel").toString
    val v0 = Seq((1L, "a"), (2L, "b")).toDF("id", "v")
    val v1 = Seq((1L, "a2"), (3L, "c")).toDF("id", "v")
    Snapshots.commit(v0, root, "tbl")
    Snapshots.commit(v1, root, "tbl", inputs = Seq("tbl:0"))
    assert(Snapshots.history(spark, root, "tbl").map(_.snapshotId) == Seq(0L, 1L))
    // VERSION AS OF 0 still reads the old rows after the second commit
    val at0 = Snapshots.readAt(spark, root, "tbl", 0L).get
      .collect().map(r => (r.getLong(0), r.getString(1))).toSet
    assert(at0 == Set((1L, "a"), (2L, "b")))
    assert(Snapshots.readAt(spark, root, "tbl", 99L).isEmpty)
    // rollback re-exposes snapshot 0 as a NEW commit; history is append-only
    val (_, m) = Snapshots.rollback(spark, root, "tbl", 0L)
    assert(m.snapshotId == 2L && m.inputs == Seq("rollback:tbl:0"))
    val latest = Snapshots.latest(spark, root, "tbl").get._2
    assert(latest.snapshotId == 2L)
    val cur = spark.read.parquet(Snapshots.latest(spark, root, "tbl").get._1)
      .collect().map(r => (r.getLong(0), r.getString(1))).toSet
    assert(cur == at0)
    graft.link.Pairs.rmDir(root)
  }

  test("streaming windowed aggregation equals the batch aggregation") {
    val got = graft.streaming.EventStream.windowedCounts(spark, sf)
    val batch = spark.read
      .schema(graft.streaming.EventStream.eventsSchema)
      .parquet(s"$sf/events.parquet")
      .groupBy(window(col("ts"), "1 hour"), col("event_type"))
      .agg(count(lit(1)).as("n"), round(sum(col("value")), 4).as("sum_value"))
      .select(col("window.start").cast("long").as("window_start"),
        col("event_type"), col("n"), col("sum_value"))
    assert(got.count() > 0)
    assert(got.exceptAll(batch).isEmpty && batch.exceptAll(got).isEmpty)
  }

  test("streaming dedup drops the duplicate micro-batch entirely") {
    val got = graft.streaming.EventStream.dedupWithinWatermark(spark, sf)
    val events = spark.read
      .schema(graft.streaming.EventStream.eventsSchema)
      .parquet(s"$sf/events.parquet")
      .select(col("event_id"), col("ts").cast("long").as("ts_sec"),
        col("user_id"), col("event_type"), col("value"), col("props"))
    // input was 2x the table (a full duplicate copy streamed as batch 2);
    // the emitted set must equal the original rows exactly, each once
    assert(got.count() == events.count())
    assert(got.exceptAll(events).isEmpty && events.exceptAll(got).isEmpty)
  }

  test("stream upsert: kill/resume from checkpoint processes only new files") {
    import graft.streaming.EventStream
    import graft.dict.DictSpec
    val base = java.nio.file.Files.createTempDirectory("graft_stream_resume")
    val updates = base.resolve("updates"); java.nio.file.Files.createDirectory(updates)
    val ckpt = base.resolve("ckpt").toString
    val snaps = base.resolve("snaps").toString

    // phase 1: base dump only
    EventStream.stageUpdateFile(updates, "000.json", DictSpec.dumpLines, 0)
    EventStream.runDictUpsertStream(spark, updates.toString, ckpt, snaps)
    val after1 = Snapshots.latest(spark, snaps, "dict_stream").get._2
    assert(after1.snapshotId == 0L)
    assert(after1.rows == DictSpec.expectedDict.size)

    // phase 2: new file lands; a NEW query on the same checkpoint resumes
    // past batch 0 (the reference's --after cursor) and processes ONLY it
    EventStream.stageUpdateFile(updates, "001.json", DictSpec.revisionLines, 1)
    EventStream.runDictUpsertStream(spark, updates.toString, ckpt, snaps)
    val after2 = Snapshots.latest(spark, snaps, "dict_stream").get._2
    assert(after2.snapshotId == 1L, "resume must add exactly one snapshot")
    assert(after2.inputs.contains("dict_stream:0"), s"lineage: ${after2.inputs}")

    // final state == plain-Scala last-write-wins + delete_excluded oracle
    val got = EventStream.latestDict(spark, snaps)
      .select(col("id"), col("revid"), col("label")).collect()
      .map(r => r.getString(0) -> ((r.getLong(1), r.getString(2)))).toMap
    val want = DictSpec.expectedDictAfterStream
      .map(r => r.id -> ((r.revid, r.label))).toMap
    assert(got == want)
    assert(!got.contains("Q8")) // delete_excluded removed it
    assert(got.contains("Q13") && got.contains("Q99")) // gained / new
    assert(got("Q2")._1 == 9102L) // revision won by revid
  }

  test("dict upsert merge: updates win by revid, deletes handled upstream") {
    val current = Seq(("Q1", 5L, "old"), ("Q2", 3L, "keep")).toDF("id", "revid", "label")
    val updates = Seq(("Q1", 9L, "new"), ("Q3", 1L, "add")).toDF("id", "revid", "label")
    val merged = graft.streaming.EventStream.dictUpserts(spark, updates, current)
      .collect().map(r => r.getString(0) -> r.getString(2)).toMap
    assert(merged == Map("Q1" -> "new", "Q2" -> "keep", "Q3" -> "add"))
  }

  test("ann: brute-force topk is sane and lsh candidates are a subset source") {
    val emb = spark.read.parquet(s"$sf/embeddings.parquet")
    val bf = graft.sim.Ann.bruteForceTopK(emb, k = 5).cache()
    val q = bf.select("query_id").distinct().count()
    assert(q == emb.filter(col("vec_id") % 100 === 0).count())
    val grouped = bf.groupBy("query_id").count().collect()
    assert(grouped.forall(_.getLong(1) == 5))
    // cosine within [-1, 1]
    val mm = bf.agg(min("cos"), max("cos")).head()
    assert(mm.getDouble(0) >= -1.0000001 && mm.getDouble(1) <= 1.0000001)
    val lsh = graft.sim.Ann.lshTopK(emb, k = 5)
    assert(lsh.count() > 0)
  }

  test("ann: ivf with nprobe == numCells degenerates to exact brute force") {
    val emb = spark.read.parquet(s"$sf/embeddings.parquet")
    val bf = graft.sim.Ann.bruteForceTopK(emb, k = 5)
    val ivfAll = graft.sim.Ann.ivfTopK(emb, k = 5, numCells = 16, nprobe = 16)
    // probing every cell searches the whole corpus: same rows, same ranks
    assert(ivfAll.exceptAll(bf).isEmpty && bf.exceptAll(ivfAll).isEmpty)
  }

  test("ann: ivf at default nprobe is well-formed and recalls most of exact") {
    val emb = spark.read.parquet(s"$sf/embeddings.parquet")
    val bf = graft.sim.Ann.bruteForceTopK(emb, k = 5).cache()
    val ivf = graft.sim.Ann.ivfTopK(emb, k = 5).cache()
    val nq = emb.filter(col("vec_id") % 100 === 0).count()
    assert(ivf.select("query_id").distinct().count() == nq)
    assert(ivf.groupBy("query_id").count().collect().forall(_.getLong(1) <= 5))
    // every ivf hit carries the same cosine the exact path computes
    val joined = ivf.as("i").join(bf.as("b"),
      Seq("query_id", "cand_id")).filter(col("i.cos") =!= col("b.cos")).count()
    assert(joined == 0)
    // recall@5 of the 4/16-cell probe on this corpus (deterministic input):
    // at least half of the exact neighbors are found
    val hits = ivf.join(bf, Seq("query_id", "cand_id")).count()
    assert(hits >= (nq * 5) / 2, s"recall too low: $hits of ${nq * 5}")
    bf.unpersist(); ivf.unpersist()
  }

  test("repetition filter: planted 10x5 repeats flagged, natural corpus clean") {
    val rep = TextStats.repetition(TextStats.augmentRepetition(docs)).cache()
    val planted = rep.filter(col("doc_id") >= 2000000L)
    assert(planted.count() > 0)
    // every planted pathological doc is caught...
    assert(planted.filter(!col("repetitive")).count() == 0)
    // ...and is far above threshold (10 distinct grams of 49 -> ~0.8)
    assert(planted.agg(min("dup_bigram_frac")).head().getDouble(0) > 0.5)
    // natural corpus: nothing flagged (measured max 0.13 at sf0.01)
    assert(rep.filter(col("doc_id") < 2000000L && col("repetitive")).count() == 0)
    // hand example: "a b a b a" -> bigrams [a b, b a, a b, b a] -> dup 0.5
    val hand = TextStats.repetition(Seq((1L, "a b a b a")).toDF("doc_id", "text"))
      .head()
    assert(hand.getAs[Double]("dup_bigram_frac") == 0.5)
    assert(hand.getAs[Double]("dup_trigram_frac") == round2(1.0 / 3, 6))
    assert(hand.getAs[Boolean]("repetitive"))
    rep.unpersist()
  }

  private def round2(x: Double, d: Int): Double =
    BigDecimal(x).setScale(d, BigDecimal.RoundingMode.HALF_UP).toDouble

  test("canonical-URL dedup: variants collapse, latest crawl kept") {
    val ts0 = java.sql.Timestamp.valueOf("2024-01-01 00:00:00")
    val ts1 = java.sql.Timestamp.valueOf("2024-01-02 00:00:00")
    val p = Seq(
      ("https://a.example/x/1", ts0),
      ("HTTPS://A.EXAMPLE/x/1", ts1),               // case
      ("https://www.a.example/x/1", ts0),            // www
      ("https://a.example:443/x/1", ts0),            // default port
      ("https://a.example/x/1/?utm_source=feed#f", ts0), // query+frag+slash
      ("https://b.example/y", ts0)                   // untouched singleton
    ).toDF("url", "warc_ts")
    val got = Pages.urlDedup(p).collect()
      .map(r => (r.getString(0), r.getInt(1), r.getString(2))).toSet
    assert(got == Set(
      ("https://a.example/x/1", 5, "HTTPS://A.EXAMPLE/x/1"),
      ("https://b.example/y", 1, "https://b.example/y")))
    // end-to-end over the synthetic crawl: every variant collapses onto its
    // base page (canonical set == base url set) and counts add up
    val pages = Pages.withUrlVariants(Pages.fromDocuments(docs))
    val dd = Pages.urlDedup(pages).cache()
    val baseUrls = Pages.fromDocuments(docs).select("url")
    assert(dd.count() == baseUrls.count())
    assert(dd.join(baseUrls, dd("canonical_url") === baseUrls("url"), "left_anti")
      .count() == 0)
    assert(dd.agg(sum("n_variants")).head().getLong(0) == pages.count())
    dd.unpersist()
  }

  test("pii scrub: planted email/phone/ip all counted and redacted") {
    val scrubbed = TextStats.piiScrub(TextStats.augmentPii(docs)).cache()
    val planted = scrubbed.filter(col("doc_id") >= 4000000L)
    assert(planted.count() == docs.filter(col("doc_id") % 25 === 0).count())
    // every planted variant: exactly 1 email, 2 phones (both formats), 1 ip
    assert(planted.filter(col("n_emails") < 1 || col("n_phones") < 2 ||
      col("n_ips") < 1).count() == 0)
    // nothing planted survives redaction
    assert(planted.filter(col("clean_text").rlike(TextStats.PiiEmail) ||
      col("clean_text").rlike(TextStats.PiiPhone) ||
      col("clean_text").rlike(TextStats.PiiIp)).count() == 0)
    // hand example pins the exact redacted string
    val hand = TextStats.piiScrub(Seq(
      (1L, "mail a.b@x.org tel 555-123-4567 or 310 555 0199 ip 10.0.0.1 end"))
      .toDF("doc_id", "text")).head()
    assert(hand.getInt(1) == 1 && hand.getInt(2) == 2 && hand.getInt(3) == 1)
    assert(hand.getString(4) == "mail <EMAIL> tel <PHONE> or <PHONE> ip <IP> end")
    scrubbed.unpersist()
  }

  test("language-quota sampling: deterministic scatter, quotas respected") {
    val lang = TextStats.langId(docs).cache()
    val sampled = TextStats.sampleByLanguage(docs).cache()
    // every kept row obeys its quota; reruns are identical (no rand)
    assert(sampled.filter(col("bucket") >= col("quota_permille")).count() == 0)
    val again = TextStats.sampleByLanguage(docs)
    assert(sampled.exceptAll(again).count() == 0 &&
      again.exceptAll(sampled).count() == 0)
    // full-quota languages (de/fr/es at 1000 permille) are kept completely
    val full = lang.filter(col("pred_lang").isin("de", "fr", "es")).count()
    assert(sampled.filter(col("pred_lang").isin("de", "fr", "es")).count() == full)
    // the sampled set is a strict subset when any partial quota applies
    assert(sampled.count() < lang.count())
    lang.unpersist(); sampled.unpersist()
  }

  test("unigram-LM score: hand corpus matches closed form") {
    // vocab: c(a)=2 c(b)=2 c(c)=1, total=5, V=3 -> denom = ln(9)
    val d = Seq((1L, "a a b"), (2L, "b c")).toDF("doc_id", "text")
    val got = TextStats.lmScore(d).collect()
      .map(r => r.getLong(0) -> (r.getInt(1), r.getDouble(2))).toMap
    val denom = math.log(9.0)
    assert(got(1L)._1 == 3)
    assert(got(1L)._2 == round2(denom - math.log(3.0), 6))
    assert(got(2L)._1 == 2)
    assert(got(2L)._2 == round2(denom - (math.log(3.0) + math.log(2.0)) / 2, 6))
    // corpus-wide: every doc scored, scores positive (nll of a finite LM)
    val full = TextStats.lmScore(docs)
    assert(full.count() == docs.count())
    assert(full.filter(col("avg_nll") <= 0).count() == 0)
  }

  test("decontamination: planted benchmark grams found in their source docs") {
    val hits = Dedup.decontaminate(docs).cache()
    // every benchmark-contributing doc is (at least) self-contaminated
    val contributors = docs.filter(col("doc_id") % 37 === 0 &&
      size(split(col("text"), " ")) >= 10).select("doc_id")
    assert(contributors.join(hits, Seq("doc_id"), "left_anti").count() == 0)
    // hand corpus: doc 0 contributes tokens 3..10; doc 5 embeds them, doc 6 no
    val bench = (1 to 12).map(i => s"w$i").mkString(" ")
    val d = Seq(
      (0L, bench),
      (5L, "x y " + (3 to 10).map(i => s"w$i").mkString(" ") + " z"),
      (6L, "completely different words only here now")).toDF("doc_id", "text")
    val got = Dedup.decontaminate(d).collect()
      .map(r => (r.getLong(0), r.getLong(1))).toSet
    assert(got == Set((0L, 1L), (5L, 1L)))
    hits.unpersist()
  }

  test("decontamination: Bloom pre-filter path is row-identical to broadcast") {
    // the scale strategy (Bloom scan-side pre-filter + exact residual join)
    // must be indistinguishable from the broadcast equi-join — same rows,
    // same n_hits, same sample_gram — on the full sf0.001 corpus
    val broadcastPath = Dedup.decontaminate(docs)
    val bloomPath = Dedup.decontaminateBloom(docs)
    assert(broadcastPath.count() > 0)
    assert(broadcastPath.exceptAll(bloomPath).count() == 0)
    assert(bloomPath.exceptAll(broadcastPath).count() == 0)
    // and a hostile fpp (bloom passes nearly everything) still yields the
    // exact result — correctness never rides on the filter, only traffic
    val sloppy = Dedup.decontaminateBloom(docs, fpp = 0.5)
    assert(sloppy.exceptAll(broadcastPath).count() == 0)
  }

  test("unigram-LM score past the broadcast gate: shuffled join, rows identical") {
    // force the vocab past the size gate: the broadcast hint must be
    // dropped (a web-corpus vocabulary is billions of rows — broadcasting
    // it would OOM every executor) while the scores stay bit-identical.
    // autoBroadcastJoinThreshold is disabled for the comparison so the
    // planner's choice reflects ONLY the hint the gate emits — the tiny
    // test vocab would otherwise auto-broadcast on stats either way.
    val key = "spark.sql.autoBroadcastJoinThreshold"
    val saved = spark.conf.get(key)
    try {
      spark.conf.set(key, "-1")
      val gated = TextStats.lmScore(docs, broadcastVocabLimit = 0L)
      val gatedPlan = gated.queryExecution.sparkPlan.toString
      assert(!gatedPlan.contains("BroadcastHashJoin"),
        s"vocab join must not broadcast past the gate:\n$gatedPlan")
      val default = TextStats.lmScore(docs)
      assert(default.queryExecution.sparkPlan.toString.contains("BroadcastHashJoin"),
        "under the gate the vocab must still attach by broadcast")
      assert(default.exceptAll(gated).count() == 0)
      assert(gated.exceptAll(default).count() == 0)
    } finally spark.conf.set(key, saved)
  }

  test("multimodal feature extraction: batched, deterministic, normalized") {
    val pages = Pages.fromDocuments(docs.limit(100))
    val f = Pages.extractFeatures(pages).cache()
    assert(f.count() == 100)
    val r = f.head()
    val feats = r.getAs[scala.collection.Seq[Double]]("features")
    assert(feats.length == 8 && math.abs(feats.sum - 1.0) < 1e-9)
  }

  test("clean pipeline: copies dedupe, badge-protected copy survives, und dropped") {
    val out = Dedup.cleanCorpus(docs).collect()
      .map(r => r.getLong(0) ->
        ((r.getLong(1), r.getString(2), r.getBoolean(4)))).toMap
    assert(out.size == 520) // 500 docs + 20 planted exact copies
    // every planted copy except doc 0's dedupes onto its original (and is
    // therefore never kept); originals stay canonical
    for (d <- 25L until 500L by 25L) {
      assert(out(d + 3000000L)._1 == d && !out(d + 3000000L)._3, s"copy of $d")
      assert(out(d)._1 == d)
    }
    // doc 0 keeps its rare BADGE line, its copy does not: the CLEANED texts
    // differ, so dedup-after-cleaning leaves both canonical
    assert(out(3000000L)._1 == 3000000L)
    // the verdict composes: nothing kept is 'und' or non-canonical
    assert(out.forall { case (id, (grp, lang, kept)) =>
      !kept || (grp == id && lang != "und") })
    assert(out.values.exists(_._3) && out.values.exists(!_._3))
  }

  test("substring dedup: shared 25-span merges to 25, 19-span is invisible") {
    val span = (0 until 25).map(i => s"s$i").mkString(" ")
    val short = (0 until 19).map(i => s"t$i").mkString(" ")
    val rows = Seq(
      (1L, (0 until 8).map(i => s"a$i").mkString(" ") + " " + span + " " +
        (8 until 16).map(i => s"a$i").mkString(" ")),
      (2L, "b0 b1 " + span + " b2 b3"),
      (3L, "c0 c1 c2 " + short),
      (4L, "d0 d1 d2 " + short))
    val out = Dedup.substrDups(rows.toDF("doc_id", "text")).collect()
      .map(r => r.getLong(0) -> (r.getInt(1), r.getLong(2))).toMap
    // six overlapping 20-gram hits merge to ONE 25-token interval, not 120
    assert(out(1L) == ((41, 25L)))
    assert(out(2L) == ((29, 25L)))
    // a 19-token shared run has no 20-gram: below the span threshold
    assert(out(3L) == ((22, 0L)) && out(4L) == ((22, 0L)))
  }

  test("corpus profile: exact type-7 percentiles match the closed form") {
    val df = (1 to 10).map(i => ("xx", ("w " * i).trim, i.toLong))
      .toDF("lang", "text", "n_chars")
    val r = TextStats.profile(df).head()
    assert(r.getString(0) == "xx" && r.getLong(1) == 10L && r.getLong(2) == 55L)
    assert(r.getDouble(3) == 5.5) // mean
    // type-7: rank = p*(n-1) -> p50 = 5.5, p90 = 9.1, p99 = 9.91
    assert(r.getDouble(4) == 5.5 && r.getDouble(5) == 9.1 && r.getDouble(6) == 9.91)
    assert(r.getLong(7) == 1L && r.getLong(8) == 10L)
  }

  test("host quota: cap respected, earliest kept, salting is result-exact") {
    val pages = Pages.fromDocuments(docs)
    def quota(fanout: Int): Map[String, Set[String]] =
      Pages.hostQuota(pages, k = 10, fanout = fanout).collect()
        .map(r => (r.getString(0), r.getString(1))).groupBy(_._1)
        .map { case (h, g) => h -> g.map(_._2).toSet }
    val out = quota(16)
    // 20 sources x 25 docs at sf0.001 -> every host capped to exactly 10
    assert(out.keySet.size == 20 && out.values.forall(_.size == 10))
    // kept = the 10 earliest crawls (warc_ts ~ doc_id) per site
    val expected = docs.select("source", "doc_id").collect()
      .map(r => (r.getString(0), r.getLong(1))).groupBy(_._1)
      .map { case (s, g) => s -> g.map(_._2).sorted.take(10).toSet }
    for ((h, kept) <- out)
      assert(kept.map(_.split("/").last.toLong) == expected(h), s"host $h")
    // the fanout split must not change the selection (total-order argmin)
    assert(quota(1) == out && quota(64) == out)
  }

  test("line dedup: templates removed, rare badge kept, body order intact") {
    val orig = docs.select("doc_id", "text").collect()
      .map(r => r.getLong(0) -> r.getString(1)).toMap
    val out = Dedup.lineDedup(Dedup.composePages(docs)).collect()
    assert(out.length == orig.size)
    for (r <- out) {
      val (id, clean) = (r.getLong(0), r.getString(1))
      // header + footer occur in ~1/7 of the corpus each -> always removed
      assert(r.getLong(3) == 2, s"doc $id removed ${r.getLong(3)} lines")
      assert(!clean.contains("SITE ") && !clean.contains("COPYRIGHT"))
      if (id % 97 == 0) // badge is in only ~6 docs at sf0.001 -> kept
        assert(clean == s"BADGE award winner\n${orig(id)}" && r.getLong(2) == 4)
      else
        assert(clean == orig(id) && r.getLong(2) == 3)
    }
  }

  test("line dedup: threshold boundary, mid-doc removal, all-boilerplate doc") {
    // "ad" sits in exactly minDocs docs (removed, mid-document), "rare" in
    // minDocs-1 (kept); doc 99 is ONLY boilerplate -> clean_text == ""
    val rows = (0L until 3L).map(i => (i, s"u$i\nad\nv$i")) ++
      Seq((10L, "a\nrare"), (11L, "rare\nb"), (99L, "ad"))
    val out = Dedup.lineDedup(rows.toDF("doc_id", "text"), minDocs = 4L)
      .collect().map(r => r.getLong(0) ->
        (r.getString(1), r.getLong(2), r.getLong(3))).toMap
    assert(out(0L) == ("u0\nv0", 3L, 1L)) // removal preserves order
    assert(out(10L) == ("a\nrare", 2L, 0L)) // below threshold: kept
    assert(out(99L) == ("", 1L, 1L)) // fully-boilerplate doc survives empty
  }
}
