package graft.dedup

import org.apache.spark.sql.{Column, DataFrame, SparkSession}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.expressions.Window
import org.apache.spark.storage.StorageLevel

/** Large-scale training-data deduplication suite over the `documents` table.
  *
  * Every operator here is expressed so that an independent DuckDB oracle can
  * recompute it: hash functions are portable integer arithmetic over a
  * deterministic global shingle-rank table, not engine-native hash() calls.
  * (At 100 TB the rank table becomes xxhash64(shingle) — same plan shape,
  * no global window — the rank-based ids exist for cross-engine oracle
  * parity at test scale.)
  *
  * Scale notes: exact dedup is one hash aggregation; MinHash signatures are
  * per-row after one join against the shingle ids; LSH banding turns
  * near-dup discovery into an equi-join on (band, bucket) — linear shuffle,
  * no quadratic pair scan; SimHash is a per-row fold; the Jaccard verify
  * step runs only on LSH candidates. Standard web-scale constructions
  * (Broder 1997 / Charikar 2002).
  */
object Dedup {

  // portable 31-bit modulus for hash arithmetic (exact in doubles + BIGINTs)
  val P = 2147483647L // 2^31 - 1
  val ShingleSize = 3

  /** Exact duplicate groups: expose (doc_id, dup_group = min doc_id with
    * identical text, group_size).
    *
    * The group key is a 136-bit compound digest of the text — two
    * independent xxhash64 values plus the length — computed in the scan and
    * shuffled INSTEAD of the document body: grouping by the raw text would
    * carry the corpus through the exchange twice (once for the aggregate,
    * once for the group join-back), ~100x the shuffle volume at web scale
    * for identical output. Collision risk at 10^12 docs is ~n^2/2^129
    * (< 1e-14), far below the durability of the storage layer; a paranoid
    * caller can re-verify groups with one text-equality aggregate. */
  def exactDups(docs: DataFrame): DataFrame = {
    val hashed = docs.select(col("doc_id"),
      xxhash64(col("text")).as("h1"),
      xxhash64(col("text"), lit(1L)).as("h2"),
      length(col("text")).as("hlen"))
    val groups = hashed.groupBy(col("h1"), col("h2"), col("hlen"))
      .agg(min(col("doc_id")).as("dup_group"), count(lit(1)).as("group_size"))
    hashed.join(groups, Seq("h1", "h2", "hlen"))
      .select(col("doc_id"), col("dup_group"), col("group_size"))
  }

  /** token 3-gram shingles per doc (distinct). The set representation for
    * Jaccard/MinHash; word-sets would be degenerate on small vocabularies. */
  def docShingles(docs: DataFrame): DataFrame = {
    val toks = split(col("text"), " ")
    val sh = when(size(toks) >= ShingleSize,
      array_distinct(expr(
        s"transform(sequence(0, size(split(text, ' ')) - $ShingleSize), " +
          s"i -> concat_ws(' ', slice(split(text, ' '), i + 1, $ShingleSize)))")))
      .otherwise(array())
    docs.select(col("doc_id"), explode(sh).as("shingle"))
  }

  /** deterministic global shingle ids: dense rank over the sorted distinct
    * shingle set. Single-partition window is intentional here (oracle
    * parity at test scale — this mode is documented as NOT a scale path;
    * [[docShingleIds]] with idMode="xxhash64" is the production path). A
    * two-phase distributed rank was tried in round 6 and REVERTED: it
    * parallelized the ~2 s vocabulary sort but added a scratch snapshot +
    * four plan stages whose planning/codegen fixed cost ate the win at
    * every tested scale factor, and the mode never runs at real scale. */
  def shingleRanks(shingles: DataFrame): DataFrame =
    shingles.select(col("shingle")).distinct()
      .withColumn("sid", row_number().over(Window.orderBy(col("shingle"))).cast("long"))

  /** Shingle ids per doc. idMode:
    *  - "rank": dense ids via a global sort — cross-engine oracle parity,
    *    NOT a scale path (one-task window);
    *  - "xxhash64": sid = xxhash64(shingle) mod P — a pure per-row
    *    projection, no vocabulary table, no join, no window: the 100 TB
    *    path. Candidate sets are pinned equal across modes in-suite. */
  def docShingleIds(docs: DataFrame, idMode: String = "rank"): DataFrame = idMode match {
    case "rank" =>
      val sh = docShingles(docs)
      sh.join(broadcast(shingleRanks(sh)), Seq("shingle"))
        .select(col("doc_id"), col("sid"))
    case "xxhash64" =>
      docShingles(docs)
        .select(col("doc_id"), pmod(xxhash64(col("shingle")), lit(P)).as("sid"))
    case other => throw new IllegalArgumentException(s"unknown idMode: $other")
  }

  /** MinHash signatures: mh_i(doc) = min over shingles of
    * ((1+37i)*y + (11+17i)) mod P where y = (sid * 2654435761) mod P.
    * The scatter stage is load-bearing: dense rank-mode sids are tiny, so
    * affine maps on raw sid never wrap mod P and all "hash functions"
    * would share one argmin (the min-sid shingle) — one permutation
    * masquerading as eight. Scattering first makes the family behave as
    * independent permutations at any sid range. One row per (doc, i). */
  def minhashSignatures(ids: DataFrame, numHashes: Int): DataFrame = {
    val scat = (col("sid") * lit(2654435761L)) % lit(P)
    val hashes = (0 until numHashes).map { i =>
      min((lit(1L + 37L * i) * scat + lit(11L + 17L * i)) % lit(P)).as(s"mh_$i")
    }
    val sig = ids.groupBy(col("doc_id")).agg(hashes.head, hashes.tail: _*)
    val stacked = (0 until numHashes).map(i =>
      struct(lit(i).as("h"), col(s"mh_$i").as("v")))
    sig.select(col("doc_id"), explode(array(stacked: _*)).as("s"))
      .select(col("doc_id"), col("s.h").as("h"), col("s.v").as("v"))
  }

  /** LSH banding (numHashes/bands rows per band); bucket key =
    * sum(v * 31^(h mod rows)) mod P. Candidate pairs = docs sharing any
    * (band, bucket) — an equi-join, linear in collisions. */
  def bandBuckets(ids: DataFrame, numHashes: Int = 8, bands: Int = 4): DataFrame = {
    val rows = numHashes / bands
    minhashSignatures(ids, numHashes)
      .withColumn("band", (col("h") / lit(rows)).cast("int"))
      .withColumn("pw", when(col("h") % lit(rows) === 0, lit(1L)).otherwise(lit(31L)))
      .groupBy(col("doc_id"), col("band"))
      .agg((sum(col("v") * col("pw")) % lit(P)).as("bucket"))
  }

  /** Candidate near-dup pairs: docs sharing any LSH band bucket. */
  def minhashCandidates(docs: DataFrame, numHashes: Int = 8, bands: Int = 4,
      idMode: String = "rank", ids: Option[DataFrame] = None): DataFrame = {
    val banded = bandBuckets(ids.getOrElse(docShingleIds(docs, idMode)),
      numHashes, bands)
    val a = banded.select(col("band"), col("bucket"), col("doc_id").as("doc1"))
    val b = banded.select(col("band").as("band2"), col("bucket").as("bucket2"),
      col("doc_id").as("doc2"))
    a.join(b, col("band") === col("band2") && col("bucket") === col("bucket2") &&
        col("doc1") < col("doc2"))
      .select(col("doc1"), col("doc2"))
      .distinct()
  }

  /** SimHash fingerprint over shingle ids: bit b sign = bit (16+b) of
    * sid * 0x9E3779B97F4A7C15 (Fibonacci multiplicative hashing; the low 64
    * bits of the product are identical in Long two's-complement wrap and in
    * exact integer arithmetic, so the DuckDB oracle recomputes it with
    * HUGEINT); fingerprint bit set when the signed sum is positive.
    *
    * The previous bit function — parity of a linear-congruential value mod
    * 2^31-1 — was degenerate: its even multiplier made the parity depend on
    * the wrap count alone, so all 32 bits of one sid voted (nearly) the same
    * way and every fingerprint collapsed to ~0xAAAAAAAA or its complement
    * (6 distinct values over 300 random docs; 45% of RANDOM pairs inside
    * hamming<=3). The multiplicative-hash bits are measured balanced
    * (per-bit mean 0.500), pairwise independent (bit0/bit31 agreement
    * 0.4999), and give 300/300 distinct fingerprints with 0% of random
    * pairs inside hamming<=3 while 5%-perturbed near-dups land at 0-4. */
  def simhash(ids: DataFrame, bits: Int = 32): DataFrame = {
    require(bits <= 32, "bits 16..47 of the product are reconstructed")
    // ANSI mode forbids the wrapping 64-bit multiply, so reconstruct bits
    // 0..47 of sid * M from two overflow-safe sub-products (sid < 2^31,
    // M = Mhi*2^32 + Mlo): only the low 16 bits of sid*Mhi can reach the
    // b<=31 window, and every intermediate stays under 2^63.
    val h48 = ((col("sid") * lit(2135587861L)) % lit(1L << 48) +
      ((col("sid") * lit(2654435769L)) % lit(65536L)) * lit(4294967296L)) %
      lit(1L << 48)
    val hashed = ids.select(col("doc_id"), h48.as("h"))
    val bitCols = (0 until bits).map { b =>
      sum(when(shiftright(col("h"), 16 + b).bitwiseAND(lit(1L)) === 1,
        lit(1)).otherwise(lit(-1))).as(s"bit_$b")
    }
    val agg = hashed.groupBy(col("doc_id")).agg(bitCols.head, bitCols.tail: _*)
    val fp = (0 until bits).map { b =>
      when(col(s"bit_$b") > 0, lit(1L << b)).otherwise(lit(0L))
    }.reduce((x, y) => x + y)
    agg.select(col("doc_id"), fp.as("simhash"))
  }

  /** Hamming-adjacency candidate pairs over SimHash fingerprints — the
    * web-crawl near-dup construction of Manku/Jain/Das Sarma, WWW'07
    * ("Detecting Near-Duplicates for Web Crawling"): two fingerprints that
    * differ in <= maxHamming bits must agree EXACTLY on at least one of
    * `bands` contiguous bit-blocks whenever bands > maxHamming
    * (pigeonhole), so candidate generation is an equi-join on
    * (band, block value) — a linear shuffle, never an all-pairs scan — and
    * the exact Hamming check (bit_count of xor, codegen'd integer ops)
    * runs on candidates only. At test scale the 32-bit/8-bit-band split
    * matches the portable dd_simhash fingerprint so the DuckDB oracle can
    * re-derive pairs bit-for-bit; at 10^12 documents the same plan runs
    * with 64-bit fingerprints and band width >= ~log2(N/bands) bits so a
    * bucket holds O(1) expected docs (Manku's permuted-table sizing). */
  def simhashCandidates(fps: DataFrame, bits: Int = 32, bands: Int = 4,
      maxHamming: Int = 3): DataFrame = {
    require(bands > maxHamming, "pigeonhole needs bands > maxHamming")
    val width = bits / bands
    val mask = (1L << width) - 1
    val banded = fps.select(col("doc_id"), col("simhash"),
      explode(array((0 until bands).map(b => struct(lit(b).as("band"),
        shiftright(col("simhash"), b * width).bitwiseAND(lit(mask))
          .as("key"))): _*)).as("bk"))
      .select(col("doc_id"), col("simhash"),
        col("bk.band").as("band"), col("bk.key").as("key"))
    val left = banded.as("a")
    val right = banded.as("b")
    val hamming = bit_count(col("a.simhash").bitwiseXOR(col("b.simhash")))
    left.join(right,
        col("a.band") === col("b.band") && col("a.key") === col("b.key") &&
          col("a.doc_id") < col("b.doc_id"))
      .filter(hamming <= maxHamming)
      .select(col("a.doc_id").as("doc1"), col("b.doc_id").as("doc2"),
        hamming.cast("long").as("hamming"))
      .distinct() // a close pair can collide in several bands
  }

  /** Exact shingle-Jaccard verification of candidate pairs (the verify step
    * after LSH): |A ∩ B| / |A ∪ B| >= threshold. */
  def jaccardVerify(docs: DataFrame, pairs: DataFrame, threshold: Double,
      idMode: String = "rank", precomputedIds: Option[DataFrame] = None): DataFrame = {
    val ids = precomputedIds.getOrElse(docShingleIds(docs, idMode))
    val sizes = ids.groupBy(col("doc_id")).agg(count(lit(1)).as("sz"))
    val a = ids.select(col("doc_id").as("doc1"), col("sid"))
    val b = ids.select(col("doc_id").as("doc2"), col("sid"))
    val inter = pairs.join(a, Seq("doc1")).join(b, Seq("doc2", "sid"))
      .groupBy(col("doc1"), col("doc2")).agg(count(lit(1)).as("common"))
    inter
      .join(sizes.withColumnRenamed("doc_id", "doc1").withColumnRenamed("sz", "sz1"), Seq("doc1"))
      .join(sizes.withColumnRenamed("doc_id", "doc2").withColumnRenamed("sz", "sz2"), Seq("doc2"))
      .withColumn("jaccard_raw",
        col("common").cast("double") /
          (col("sz1") + col("sz2") - col("common")).cast("double"))
      // threshold on the UNROUNDED ratio (matches the oracle's WHERE);
      // round only the projected column
      .filter(col("jaccard_raw") >= lit(threshold))
      .select(col("doc1"), col("doc2"), round(col("jaccard_raw"), 6).as("jaccard"))
  }

  /** End-to-end crawl dedup decision: LSH candidates -> exact-Jaccard
    * verify (>= threshold) -> connected components over the verified
    * near-dup graph -> one row per doc with its cluster (min member id),
    * the cluster's canonical representative (most shingles, ties to the
    * smallest doc_id — "keep the longest copy") and the cluster size.
    * Docs to keep = rows with doc_id == canonical.
    *
    * Scale shape: candidate generation and verify are bucketed equi-joins
    * (linear shuffle), components the O(log n) alternating-star loop
    * shared with mention clustering (ConnectedComponents.scala), and
    * canonical selection ONE cluster-keyed struct-max aggregate with
    * map-side partials — no windows over the corpus. At 100 TB swap
    * idMode to "xxhash64" (per-row shingle ids, no vocabulary table). */
  def nearDupClusters(spark: SparkSession, docs: DataFrame,
      threshold: Double = 0.5, idMode: String = "rank",
      precomputedIds: Option[DataFrame] = None): DataFrame = {
    // precomputedIds: an already-persisted shingle-id frame shared across
    // the dedup family (Pipeline.augShingleIds) — the caller owns its
    // lifecycle; without it the ids are built and persisted here.
    val ids = precomputedIds.getOrElse(
      docShingleIds(docs, idMode).persist(StorageLevel.MEMORY_AND_DISK))
    val verified = jaccardVerify(docs,
        minhashCandidates(docs, idMode = idMode, ids = Some(ids)),
        threshold, precomputedIds = Some(ids))
      .select(col("doc1").as("src"), col("doc2").as("dst"))
    val comp = graft.link.ConnectedComponents.runWithIsolated(
      spark, docs.select(col("doc_id")), verified)
    val sizes = ids.groupBy(col("doc_id")).agg(count(lit(1)).as("sz"))
    val members = comp
      .select(col("node").as("doc_id"), col("component").as("cluster"))
      .join(sizes, Seq("doc_id"), "left")
      .withColumn("sz", coalesce(col("sz"), lit(0L)))
    // canonical = arg-max (sz, -doc_id): a single aggregate, not a window
    val canon = members.groupBy(col("cluster"))
      .agg(max(struct(col("sz"), (-col("doc_id")).as("neg"))).as("m"),
        count(lit(1)).as("cluster_size"))
      .select(col("cluster"), (-col("m.neg")).as("canonical"),
        col("cluster_size"))
    members.join(canon, Seq("cluster"))
      .select(col("doc_id"), col("cluster"), col("canonical"),
        col("cluster_size"))
  }

  /** Incremental crawl-delta near-dup detection: dedupe a NEW crawl batch
    * against a COMMITTED MinHash index without re-shingling the corpus —
    * the daily-ingest counterpart of [[nearDupClusters]]' one-shot pass.
    *
    * Day 1 builds the dedup index (per-doc shingle-id rows + LSH band
    * buckets) and commits it to snapshot tables (ckpt/Snapshots: atomic
    * manifest, per-partition lineage). Day 2 shingles ONLY the delta,
    * probes its band buckets against the committed buckets plus its own
    * (new-vs-corpus AND new-vs-new dups), and exact-Jaccard-verifies the
    * candidates. Committed docs never re-join each other — those pairs
    * were reported when they were ingested — so per-day work is
    * O(|delta| + collisions), not O(|corpus|).
    *
    * Result contract: identical to the one-shot verified-pair set
    * restricted to pairs with at least one delta member (pinned in
    * ScalePathSpec for both id modes). With idMode="xxhash64" (the 100 TB
    * path) shingle ids are content-addressed, so the committed index is
    * genuinely batch-independent — the delta is processed with no access
    * to day-1 text. The default "rank" mode shares the corpus-wide
    * vocabulary table across days for cross-engine oracle parity at test
    * scale (rank ids are not an incremental path, and are documented as
    * such at [[docShingleIds]]).
    *
    * `isDelta` is a predicate over `doc_id` marking the new batch. */
  def incrementalNearDups(spark: SparkSession, docs: DataFrame,
      isDelta: Column, threshold: Double = 0.5,
      idMode: String = "rank",
      precomputedIds: Option[DataFrame] = None): DataFrame = {
    import graft.ckpt.Snapshots
    val root = java.nio.file.Files.createTempDirectory("graft_ddincr").toString
    // --- day 1: build + COMMIT the index over the pre-existing corpus.
    // (In production this ran at the previous ingest; committing it here
    // makes the query exercise the same parquet read-back path the real
    // pipeline resumes from.)
    // Without precomputedIds (a persisted shared frame) the id subtree
    // below is EVALUATED THREE TIMES per call — day-1 commit, delta
    // banding, and the verify union — which profiling showed serialized
    // this query behind 3x the shingle pipeline.
    val ids = precomputedIds.getOrElse(docShingleIds(docs, idMode))
    val day1Ids = ids.filter(!isDelta)
    val (idsPath, mIds) =
      Snapshots.commit(day1Ids, root, "shingle_ids", Seq("crawl:day1"))
    val (bkPath, _) = Snapshots.commit(
      bandBuckets(spark.read.parquet(idsPath)), root, "band_buckets",
      Seq(s"shingle_ids:${mIds.snapshotId}"))
    // --- day 2: the delta arrives; only IT is shingled.
    val deltaIds = ids.filter(isDelta)
    val deltaBk = bandBuckets(deltaIds)
    val probe = deltaBk.select(col("band"), col("bucket"), col("doc_id").as("da"))
    val base = spark.read.parquet(bkPath).unionByName(deltaBk)
      .select(col("band"), col("bucket"), col("doc_id").as("db"))
    val cand = probe.join(base, Seq("band", "bucket"))
      .filter(col("da") =!= col("db"))
      .select(least(col("da"), col("db")).as("doc1"),
        greatest(col("da"), col("db")).as("doc2"))
      .distinct()
    val out = jaccardVerify(docs, cand, threshold,
      precomputedIds = Some(spark.read.parquet(idsPath).unionByName(deltaIds)))
    // the returned frame reads the committed snapshots lazily — clean the
    // scratch root at exit, not eagerly (round-4 advice pattern)
    graft.link.Pairs.cleanupOnExit(root)
    out
  }

  /** Benchmark n-gram decontamination (the GPT-3/PaLM training-data
    * hygiene pass): a document is contaminated when it contains any n-gram
    * from the benchmark set. The "benchmark" here is a deterministic slice
    * of the corpus itself — the 8-gram at tokens 3..10 of every 37th doc —
    * so the check has guaranteed true positives at test scale and the SQL
    * oracle can rebuild the identical set. Scale shape: the benchmark gram
    * set is tiny (eval suites are KBs, corpora are TBs) -> broadcast;
    * document n-grams are a per-row generator, the match an equi-join on
    * the gram string, the report one doc-keyed aggregate — a linear
    * shuffle, the shingle pipeline's cost class. */
  def decontaminate(docs: DataFrame, n: Int = 8): DataFrame = {
    val (bench, grams) = decontamInputs(docs, n)
    grams.join(broadcast(bench), Seq("gram"))
      .groupBy(col("doc_id"))
      .agg(countDistinct(col("gram")).as("n_hits"),
        min(col("gram")).as("sample_gram"))
  }

  /** (benchmark gram set, per-doc n-gram generator) shared by the broadcast
    * and Bloom decontamination paths — one definition so the two strategies
    * cannot drift. */
  private def decontamInputs(docs: DataFrame, n: Int): (DataFrame, DataFrame) = {
    val toks = split(col("text"), " ")
    val bench = docs
      .filter(col("doc_id") % 37 === 0 && size(toks) >= lit(n + 2))
      .select(array_join(slice(toks, 3, n), " ").as("gram"))
      .distinct()
    val grams = docs.select(col("doc_id"),
      explode(when(size(toks) >= n, expr(
        s"transform(sequence(0, size(split(text, ' ')) - $n), " +
          s"i -> concat_ws(' ', slice(split(text, ' '), i + 1, $n)))"))
        .otherwise(array())).as("gram"))
    (bench, grams)
  }

  /** Decontamination for benchmark sets past the broadcast limit. The
    * broadcast path above assumes the gram set fits every executor as raw
    * strings; a full eval-suite union at production scale (hundreds of
    * millions of grams) does not. This variant ships only a Bloom filter of
    * the set (~10 bits/gram at 1% fpp — 100M grams ≈ 120 MB vs many GB of
    * strings), applies it as a scan-side pre-filter on the exploded corpus
    * n-grams, and restores EXACTNESS with a residual equi-join against the
    * real gram table: only true hits plus the ~fpp false positives reach
    * the shuffle, so the join traffic is proportional to contamination, not
    * to corpus size. Result is row-identical to `decontaminate` (pinned by
    * Wave2Spec's differential and by sharing its DuckDB oracle in the
    * driver contract). The `mightContain` probe is a Scala UDF — the one
    * place the non-codegen cost is justified, because it deletes ~all rows
    * before the shuffle; the residual join is left unhinted so AQE picks
    * broadcast at test scale and shuffle-hash at eval-suite scale. */
  def decontaminateBloom(docs: DataFrame, n: Int = 8,
      fpp: Double = 0.01): DataFrame = {
    val (bench, grams) = decontamInputs(docs, n)
    val spark = docs.sparkSession
    // bloom sizing wants ~|bench| without paying bench's full distinct
    // pass. Each bench-side doc contributes at most one gram, so counting
    // docs under the SAME predicate bench uses (doc_id % 37 == 0) is a
    // true upper bound regardless of how sparse or skewed the ids are
    // (the previous |docs|/37 shortcut undersized the filter whenever ids
    // clustered on multiples of 37, silently raising the effective fpp);
    // a doc_id-only filtered count is one pruned-column scan, and the x2
    // headroom keeps the realized fpp at or under the requested one.
    val expected = math.max(1000L,
      docs.filter(col("doc_id") % 37 === 0).count() * 2)
    val bloom = bench.stat.bloomFilter("gram", expected, fpp)
    val bloomB = spark.sparkContext.broadcast(bloom)
    val mightContain =
      udf((g: String) => g != null && bloomB.value.mightContainString(g))
    grams.filter(mightContain(col("gram")))
      .join(bench, Seq("gram"))
      .groupBy(col("doc_id"))
      .agg(countDistinct(col("gram")).as("n_hits"),
        min(col("gram")).as("sample_gram"))
  }

  /** The end-to-end crawl-cleaning DECISION as ONE declarative plan — the
    * composition a real curation run executes nightly: template pages →
    * line-level boilerplate removal ([[lineDedup]]) → exact dedup on the
    * CLEANED text ([[exactDups]]; canonical = min doc_id) → quality scoring
    * and language id over the cleaned text (TextStats) → one `kept` verdict
    * per document. Every stage is the already-oracled operator applied
    * unchanged; Catalyst fuses the doc_id-keyed join-backs, so the whole
    * pass stays a handful of hash aggregations with no corpus window.
    *
    * Exact-copy plants (doc_id mod 25, id +3*10^6) make the dedup stage
    * observable at test scale — the driver corpus has no identical texts —
    * mirroring [[augment]]'s near-dup plants. One planted copy (doc 0's)
    * deliberately survives dedup: the original carries the rare BADGE line
    * its copy does not, so their CLEANED texts differ — dedup-after-cleaning
    * is order-sensitive, and both engines must agree on that. */
  def cleanCorpus(docs: DataFrame, minQuality: Double = 0.64): DataFrame = {
    import graft.textstats.TextStats
    val withCopies = docs.select(col("doc_id"), col("text")).unionByName(
      docs.filter(col("doc_id") % 25 === 0)
        .select((col("doc_id") + lit(3000000L)).as("doc_id"), col("text")))
    val cleaned = lineDedup(composePages(withCopies))
      .select(col("doc_id"), col("clean_text").as("text"))
    val canon = exactDups(cleaned).select(col("doc_id"), col("dup_group"))
    val qual = TextStats.quality(cleaned).select(col("doc_id"), col("quality"))
    val lang = TextStats.langId(cleaned).select(col("doc_id"), col("pred_lang"))
    cleaned.select(col("doc_id"))
      .join(canon, Seq("doc_id"))
      .join(qual, Seq("doc_id"))
      .join(lang, Seq("doc_id"))
      .select(col("doc_id"), col("dup_group"), col("pred_lang"), col("quality"),
        (col("dup_group") === col("doc_id") &&
          col("quality") >= lit(minQuality) &&
          col("pred_lang") =!= lit("und")).as("kept"))
  }

  /** Deterministic near-dup augmentation for small scale factors (the
    * driver corpus has no planted near-dups below sf0.1): every 50th doc
    * gets a variant with the first 5 tokens dropped, id +10^6. Pure
    * projection, reproducible in the SQL oracle. */
  def augment(docs: DataFrame): DataFrame = {
    val variant = docs.filter(col("doc_id") % 50 === 0)
      .select((col("doc_id") + lit(1000000L)).as("doc_id"),
        array_join(slice(split(col("text"), " "), 6, 1000000), " ").as("text"))
    docs.select(col("doc_id"), col("text")).unionByName(variant)
  }

  /** Cross-document exact-substring duplication (the Lee et al. 2022
    * "Deduplicating Training Data Makes Language Models Better" granularity):
    * for every document, the number of tokens covered by some L-token span
    * that also appears verbatim in ANOTHER document, plus the covered
    * fraction — the signal used to cut duplicated spans (or whole docs past
    * a threshold) out of a training corpus.
    *
    * Plan: one doc-local flatMap emits the L-gram at every position; grams
    * are counted per 128-bit digest (the gram STRING never rides an
    * exchange key — [[exactDups]]' rationale and collision math; a 31-bit
    * portable hash would birthday-collide at ~10^5 grams and silently
    * overcount); digests in >= 2 distinct docs join back to their positions;
    * covered-token counts come from a classic merge-intervals running-max
    * window PARTITIONED BY doc — bounded by tokens-per-document, never
    * corpus-sized — rather than exploding the L positions under each match
    * (an L-times row blowup exactly where duplication is worst). Within-doc
    * repetition is deliberately excluded (that is [[graft.textstats
    * .TextStats.repetition]]'s job): a span must occur in two DOCUMENTS. */
  def substrDups(docs: DataFrame, spanTokens: Int = 20): DataFrame = {
    val L = spanTokens
    val toks = split(col("text"), " ")
    val gl = when(size(toks) >= L, expr(
      s"transform(sequence(0, size(split(text, ' ')) - $L), " +
        s"i -> concat_ws(' ', slice(split(text, ' '), i + 1, $L)))"))
      .otherwise(array())
    val grams = docs.select(col("doc_id"), posexplode(gl).as(Seq("pos", "gram")))
    val hashed = grams.select(col("doc_id"), col("pos"),
      xxhash64(col("gram")).as("g1"),
      xxhash64(col("gram"), lit(1L)).as("g2"))
    val shared = hashed.groupBy(col("g1"), col("g2"))
      .agg(countDistinct(col("doc_id")).as("nd"))
      .filter(col("nd") >= 2).select(col("g1"), col("g2"))
    val matched = hashed.join(shared, Seq("g1", "g2"))
      .select(col("doc_id"), col("pos"), (col("pos") + lit(L - 1)).as("e"))
    val w = Window.partitionBy(col("doc_id")).orderBy(col("pos"))
      .rowsBetween(Window.unboundedPreceding, -1)
    val covered = matched
      .select(col("doc_id"), greatest(lit(0L),
        col("e") - greatest(coalesce(max(col("e")).over(w), lit(-1L)),
          col("pos") - lit(1))).as("contrib"))
      .groupBy(col("doc_id")).agg(sum(col("contrib")).as("n_dup_tokens"))
    docs.select(col("doc_id"), size(toks).as("n_tokens"))
      .join(covered, Seq("doc_id"), "left")
      .select(col("doc_id"), col("n_tokens"),
        coalesce(col("n_dup_tokens"), lit(0L)).as("n_dup_tokens"),
        round(coalesce(col("n_dup_tokens"), lit(0L)) / col("n_tokens"), 6)
          .as("dup_frac"))
  }

  /** Deterministic multi-line page assembly for [[lineDedup]]: the driver
    * corpus is single-line, so wrap each document in site-template
    * boilerplate the way a crawler sees rendered pages — a per-site nav
    * header (site = doc_id mod 7, each template lands on ~1/7 of the
    * corpus), the body, a per-site copyright footer, and a rare badge line
    * (doc_id mod 97) that stays BELOW the removal threshold at test scale.
    * Pure projection, reproduced verbatim in the SQL oracle. */
  def composePages(docs: DataFrame): DataFrame = {
    val site = (col("doc_id") % 7).cast("string")
    docs.select(col("doc_id"), concat(
      lit("SITE "), site, lit(" NAV home about contact products"), lit("\n"),
      when(col("doc_id") % 97 === 0, lit("BADGE award winner\n")).otherwise(lit("")),
      col("text"), lit("\n"),
      lit("COPYRIGHT site "), site, lit(" all rights reserved")).as("text"))
  }

  /** Line-level boilerplate removal (the CCNet / RefinedWeb cleaning pass):
    * drop every line that occurs in at least `minDocs` DISTINCT documents —
    * nav bars, cookie banners, copyright footers — and reassemble each
    * document from its surviving lines in original order.
    *
    * Scale shape: one explode (doc-local), one aggregation keyed on a
    * 128-bit line digest (the line TEXT never rides the exchange — same
    * rationale and collision math as [[exactDups]]), one join-back on the
    * digest, one doc-keyed regroup. The hot set is output-filtered to
    * lines crossing the threshold, so by construction it has at most
    * |lines|/minDocs entries and in practice is tiny (boilerplate is
    * boilerplate because few templates cover many pages) — AQE broadcasts
    * the join-back at runtime without a hint. No window over the corpus;
    * per-doc line order is restored inside the per-doc aggregate. */
  def lineDedup(docs: DataFrame, minDocs: Long = 10L): DataFrame = {
    val lines = docs.select(col("doc_id"),
      posexplode(split(col("text"), "\n")).as(Seq("pos", "line")))
    val hashed = lines.select(col("doc_id"), col("pos"), col("line"),
      xxhash64(col("line")).as("h1"),
      xxhash64(col("line"), lit(1L)).as("h2"))
    val hot = hashed.groupBy(col("h1"), col("h2"))
      .agg(countDistinct(col("doc_id")).as("nd"))
      .filter(col("nd") >= minDocs)
      .select(col("h1"), col("h2"), lit(1).as("hot"))
    hashed.join(hot, Seq("h1", "h2"), "left")
      .groupBy(col("doc_id"))
      .agg(
        array_join(transform(
          array_sort(collect_list(when(col("hot").isNull,
            struct(col("pos"), col("line"))))),
          x => x.getField("line")), "\n").as("clean_text"),
        count(lit(1)).as("n_lines"),
        sum(when(col("hot").isNotNull, 1L).otherwise(0L)).as("n_removed"))
      .select(col("doc_id"), col("clean_text"), col("n_lines"), col("n_removed"))
  }
}
