package graft.link

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

/** Transitive clustering: connected components via alternating
  * large-star / small-star DataFrame self-joins (north_rule; Kiveris et al.,
  * "Connected Components in MapReduce and Beyond", SoCC'14). No RDDs, no
  * GraphX: each round is groupBy(min) + join, working set persisted per
  * round (one materializing job each), converging in O(log n) rounds even
  * on the path-shaped blocks sorted-neighborhood pairing produces.
  *
  * Input: undirected edge list (src, dst) of same-entity links (longs).
  * Output: (node, component) where component = min node id reachable.
  */
object ConnectedComponents {

  /** large-star: for each node u, connect every strictly-larger neighbor v
    * to m = min(N(u) ∪ {u}). */
  private def largeStar(edges: DataFrame): DataFrame = {
    val bi = edges.select(col("src").as("u"), col("dst").as("v"))
      .unionByName(edges.select(col("dst").as("u"), col("src").as("v")))
    val mins = bi.groupBy("u").agg(least(min(col("v")), col("u")).as("m"))
    // pin shuffle-hash: per-round AQE broadcast decisions on the shrinking
    // working set are unstable (an occasional 20-40s round from a bad pick)
    bi.join(mins.hint("shuffle_hash"), "u")
      .filter(col("v") > col("u"))
      .select(col("v").as("src"), col("m").as("dst"))
  }

  /** Path compression (pointer jumping) on a min-oriented edge set
    * (every edge has dst < src, which both stars guarantee): map each edge
    * (a, b) to (a, f(b)) where f(x) = min out-neighbor of x, or x at a
    * root. Connectivity is preserved — the chain b > f(b) > f²(b) > …
    * telescopes, and each link (fᵏ(b), fᵏ⁺¹(b)) is itself an edge whose
    * image keeps the chain connected — and no self-loops can appear
    * (f(b) ≤ b < a). One groupBy + one edge-sized equi-join per
    * application; the sorted-neighborhood mention graph is path-shaped
    * (chains of seq→seq±{1,2} links), where plain alternating stars need
    * ~log₂(chain length) rounds with the edge count barely shrinking —
    * compression halves the remaining chain depth each round on top of
    * that, cutting rounds ~2x (measured 14 → 8 at sf0.1). Emits duplicate
    * edges; callers feed it into smallStar whose leading distinct dedups. */
  private def compress(edges: DataFrame): DataFrame = {
    val f = edges.groupBy(col("src")).agg(min(col("dst")).as("fm"))
      .select(col("src").as("via"), col("fm"))
    edges.join(f.hint("shuffle_hash"), col("dst") === col("via"), "left")
      .select(col("src"), coalesce(col("fm"), col("dst")).as("dst"))
  }

  /** small-star: orient edges large->small; connect each small neighbor
    * (and u itself) to the minimum. Deduplicates its input and output (the
    * only distincts in a round). */
  private def smallStar(edges: DataFrame): DataFrame = {
    val oriented = edges.select(
      greatest(col("src"), col("dst")).as("u"),
      least(col("src"), col("dst")).as("v"))
      .distinct()
    val mins = oriented.groupBy("u").agg(min(col("v")).as("m"))
    val nbr = oriented.join(mins.hint("shuffle_hash"), "u")
      .filter(col("v") =!= col("m"))
      .select(col("v").as("src"), col("m").as("dst"))
    val self = mins.select(col("u").as("src"), col("m").as("dst"))
    nbr.unionByName(self).distinct()
  }

  /** Runs to fixpoint; returns (node, component).
    *
    * Durability: by default rounds materialize via localCheckpoint (fast,
    * but blocks die with an executor — fine on local[k]). With `ckptRoot`
    * set (param or `spark.graft.cc.snapshotRoot` conf), every `ckptEvery`-th
    * round is COMMITTED through Snapshots.commit (parquet + manifest with
    * lineage + per-partition counters), the working frame is re-rooted on
    * the committed files, and a rerun on the SAME input (identified by the
    * initial edge-set signature in the manifest lineage) resumes from the
    * last committed round instead of round 0 — the north_rule's
    * resume-from-checkpoint contract, kill-tested in PairsCcSpec.
    * `onRound` observes each executed round index (tests use it to prove a
    * resumed run skipped the committed prefix). */
  def run(spark: SparkSession, edges: DataFrame, maxRounds: Int = 50,
      verbose: Boolean = false, ckptRoot: Option[String] = None,
      ckptEvery: Int = 3, onRound: Int => Unit = _ => ()): DataFrame = {
    def materialize(df: DataFrame): (DataFrame, (Long, Long)) = {
      // lazy localCheckpoint: truncates lineage across rounds (plan blowup
      // otherwise); the signature aggregation is the one materializing job.
      // No explicit repartition: the round body ends in a distinct(), which
      // already hash-partitions at AQE-coalesced width — an extra exchange
      // per round bought nothing.
      val p = df.localCheckpoint(false)
      val r = p.agg(count(lit(1)),
        coalesce(sum(hash(col("src"), col("dst")).cast("long")), lit(0L))).head()
      (p, (r.getLong(0), r.getLong(1)))
    }

    // Orient min-ward (dst < src) and materialize the deduped input at
    // session width (one shuffle over the raw edges).
    var (cur, sig) = materialize(
      edges.filter(col("src") =!= col("dst"))
        .select(col("src").cast("long").as("s"), col("dst").cast("long").as("d"))
        .select(greatest(col("s"), col("d")).as("src"),
          least(col("s"), col("d")).as("dst"))
        .distinct())
    val origParts = spark.conf.get("spark.sql.shuffle.partitions")

    // Committed-snapshot durability (opt-in): identify this input by its
    // initial edge-set signature; resume from the newest committed round
    // whose manifest lineage carries the same identity.
    val root = ckptRoot.orElse(spark.conf.getOption("spark.graft.cc.snapshotRoot"))
      .filter(_.nonEmpty)

    // Size-gated local endgame (the standard big-graph CC design, e.g.
    // GraphFrames' aggregateMessages loop with a local finisher): the
    // same-entity edge set of a mention graph is tiny relative to the
    // corpus — when it fits trivially on the driver (default 2M edges =
    // 32 MB; conf spark.graft.cc.localSolveEdges, 0 disables), a
    // driver-side union-find replaces the whole compression cascade + star
    // loop, whose cost at this size is pure scheduling latency. Checked on
    // the INITIAL signature so the eligible path pays for no distributed
    // rounds at all. At 10^12-document scale the edge set of a GLOBAL
    // graph exceeds any driver, so the loop path stays the default
    // whenever durability is requested (root defined) or the set is
    // large; the gate is measured per-input, exactly like a
    // broadcast-join threshold.
    val localMax =
      spark.conf.getOption("spark.graft.cc.localSolveEdges")
        .map(_.toLong).getOrElse(2000000L)
    if (root.isEmpty && sig._1 <= localMax) {
      val rows = cur.select(col("src"), col("dst")).collect()
      org.apache.spark.sql.graftbridge.Bridge.unpersistLocalCheckpoint(cur)
      val parent = new java.util.HashMap[Long, Long](rows.length * 2)
      def find(x: Long): Long = {
        var r = x
        while (parent.get(r) != r) r = parent.get(r)
        var c = x
        while (c != r) { val n = parent.get(c); parent.put(c, r); c = n }
        r
      }
      var i = 0
      while (i < rows.length) {
        val s = rows(i).getLong(0); val d = rows(i).getLong(1)
        if (!parent.containsKey(s)) parent.put(s, s)
        if (!parent.containsKey(d)) parent.put(d, d)
        val (a, b) = (find(s), find(d))
        // min-id root: matches the loop's component = min reachable node
        if (a < b) parent.put(b, a) else if (b < a) parent.put(a, b)
        i += 1
      }
      import scala.jdk.CollectionConverters._
      val out = parent.keySet().asScala.toSeq.map(n => (n, find(n)))
      import spark.implicits._
      // broadcast hint: the result is a driver-local relation bounded by
      // the localSolveEdges gate, but without the hint the callers'
      // join-backs (runWithIsolated, cluster canonical attach) planned a
      // shuffle join — the corpus-node side rode an Exchange and the local
      // relation was re-serialized into shuffle tasks with multi-second GC
      // (profiled: the two heaviest stages of el_clusters' tail). As a
      // broadcast build side it ships once and the node side stays in place.
      return broadcast(out.toDF("node", "component"))
    }

    // Size the loop's shuffles to the WORKING SET, not the session default:
    // the CC edge list is tiny relative to the corpus, and each round runs
    // ~5 shuffles — at full session width el_clusters spent more time on
    // task scheduling (hundreds of sub-second stages) than on data.
    val loopParts = math.max(4L, math.min(origParts.toLong, sig._1 / 250000L + 4L))
    spark.conf.set("spark.sql.shuffle.partitions", loopParts.toString)
    var prev0 = cur
    // Pre-loop compression cascade: 5 chained pointer jumps cut residual
    // chain depth ~32x before the first (much more expensive) star round —
    // the sorted-neighborhood mention graph is path-shaped, where the stars
    // alone need ~log2(chain) rounds. compress maps edges 1:1 (no growth),
    // so one trailing distinct washes all five applications.
    val pre = materialize(
      compress(compress(compress(compress(compress(cur))))).distinct())
    org.apache.spark.sql.graftbridge.Bridge.unpersistLocalCheckpoint(prev0)
    cur = pre._1
    sig = pre._2
    var prevSig = (-1L, 0L)
    var rounds = 0
    val inputId = s"cc-input:${sig._1}:${sig._2}"
    val Stage = "cc_rounds"
    for {
      r <- root
      (path, m) <- graft.ckpt.Snapshots.latest(spark, r, Stage)
      if m.inputs.headOption.contains(inputId)
    } {
      org.apache.spark.sql.graftbridge.Bridge.unpersistLocalCheckpoint(cur)
      cur = spark.read.parquet(path)
      rounds = m.inputs(1).stripPrefix("round:").toInt
      val s = m.inputs(2).stripPrefix("sig:").split(":")
      sig = (s(0).toLong, s(1).toLong)
      if (verbose) println(s"CC resume: round $rounds from $path")
    }

    try {
      while (sig != prevSig && rounds < maxRounds) {
        prevSig = sig
        val t0 = System.nanoTime()
        val prev = cur
        // exactly ONE alternation per materialization: largeStar/smallStar
        // each read their input several times (union + aggregate + join),
        // so chaining two rounds unmaterialized re-executes the inner
        // round's whole subtree multiplicatively (measured 7x slower)
        val (next, nextSig) = materialize(smallStar(compress(largeStar(cur))))
        // free the previous round's checkpoint blocks: leaving them cached
        // fills the block manager and degrades mid-run rounds 10-20x
        org.apache.spark.sql.graftbridge.Bridge.unpersistLocalCheckpoint(prev)
        cur = next
        sig = nextSig
        rounds += 1
        onRound(rounds)
        // commit every ckptEvery-th round: re-root the working frame on the
        // committed parquet (lineage + per-partition counters in the
        // manifest) so at most ckptEvery rounds replay after a crash
        root.foreach { r =>
          if (rounds % ckptEvery == 0) {
            val (path, _) = graft.ckpt.Snapshots.commit(cur, r, Stage,
              Seq(inputId, s"round:$rounds", s"sig:${sig._1}:${sig._2}"))
            org.apache.spark.sql.graftbridge.Bridge.unpersistLocalCheckpoint(cur)
            cur = spark.read.parquet(path)
          }
        }
        if (verbose) println(
          f"CC round $rounds%2d: edges=${sig._1}%10d  ${(System.nanoTime() - t0) / 1e9}%6.2f s")
      }
    } finally spark.conf.set("spark.sql.shuffle.partitions", origParts)
    require(sig == prevSig,
      s"connected components did not converge in ${maxRounds}x2 rounds")
    // fixpoint: every edge is (node -> component root)
    val members = cur.select(col("src").as("node"), col("dst").as("component"))
    val roots = cur.select(col("dst").as("node"), col("dst").as("component")).distinct()
    members.unionByName(roots).distinct()
  }

  /** Components including isolated nodes (component = the node itself). */
  def runWithIsolated(spark: SparkSession, nodes: DataFrame, edges: DataFrame): DataFrame = {
    val comp = run(spark, edges)
    val named = nodes.select(col(nodes.columns.head).cast("long").as("node")).distinct()
    named.join(comp, Seq("node"), "left")
      .select(col("node"), coalesce(col("component"), col("node")).as("component"))
  }
}
