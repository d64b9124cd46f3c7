package graft.graph

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

/** PageRank over the entity graph, reproducing the reference power method
  * exactly (wikidatagraph.py:123-157):
  *
  *   v_0 = uniform 1/N over indices [0, N);  N = lastSourceQid + 1
  *   v'  = v · M          (M row-normalized, targets > lastQid dropped)
  *   v'' = v' + (1 - ‖v'‖₁)/N    (uniform loss compensation)
  *   16 fixed iterations.
  *
  * Scale-first formulation: the dense vector is represented SPARSELY as
  * (rank rows for target nodes) + one scalar `background` shared by every
  * index that never receives edge mass. Those indices all hold exactly the
  * compensation value after each iteration, so a 10^8-wide vector costs
  * one scalar. Each iteration is one join + one aggregation; lineage is
  * truncated per round with localCheckpoint (SURVEY.md §4: iterative-loop
  * plan-lineage truncation).
  */
object PageRank {

  final case class Result(ranks: DataFrame, background: Double, n: Long, lastQid: Long)

  /** Raw (src, dst) multiplicity edges -> row-normalized weighted edges
    * following load_from_preprocessed_dump (wikidatagraph.py:62-121):
    * targets beyond the last source qid are dropped BEFORE normalization.
    * Input: edges(src long, dst long) with multiplicity rows.
    * Output: (src, dst, weight) with weight = count/sum(count) per src. */
  def normalizeEdges(raw: DataFrame): (DataFrame, Long) = {
    val lastQid = raw.agg(max(col("src"))).head().getLong(0)
    val counted = raw
      .filter(col("dst") <= lit(lastQid))
      .groupBy(col("src"), col("dst"))
      .agg(count(lit(1)).as("cnt"))
    // row normalization via a second aggregation (no window: a groupBy
    // + join keeps both sides partial-aggregated and AQE-coalesced)
    val totals = counted.groupBy(col("src")).agg(sum(col("cnt")).as("tot"))
    val weighted = counted.join(totals, "src")
      .select(col("src"), col("dst"), (col("cnt") / col("tot")).as("weight"))
    (weighted, lastQid)
  }

  /** 16-iteration power method. `edges` must be row-normalized.
    * Returns explicit ranks for every node that ever receives edge mass,
    * plus the shared background value for all other indices in [0, N).
    *
    * Durability: like ConnectedComponents.run, with `ckptRoot` (param or
    * `spark.graft.pagerank.snapshotRoot` conf) every `ckptEvery`-th
    * iteration commits the rank vector through Snapshots.commit and a rerun
    * on the same graph (identified by edge count + lastQid in the manifest
    * lineage) resumes from the last committed iteration — including a rerun
    * asking for MORE iterations, which continues from the committed prefix
    * (PageRankSpec pins the extended run equal to a fresh full run up to
    * aggregation-order ulps). */
  def run(spark: SparkSession, edges: DataFrame, lastQid: Long,
      iterations: Int = 16, ckptRoot: Option[String] = None,
      ckptEvery: Int = 4): Result = {
    val n = lastQid + 1
    // partition the working set proportionally to its size: a per-iteration
    // job over 64 near-empty partitions costs more in scheduling than in
    // compute (the graph is joined 16x, so per-round latency multiplies)
    // one agg job yields both the size (partitioning) and a content
    // signature (resume identity): count alone let a DIFFERENT graph with
    // the same edge count + max qid silently resume from a stale committed
    // snapshot — weight changes flip the hash, matching the CC loop's
    // edge-set signature discipline (ConnectedComponents.materialize)
    val sigRow = edges.agg(
      count(lit(1)),
      coalesce(sum(hash(col("src"), col("dst"), col("weight")).cast("long")),
        lit(0L))).head()
    val eCount = sigRow.getLong(0)
    val eHash = sigRow.getLong(1)
    val parts = math.max(1, math.min(spark.sparkContext.defaultParallelism * 2,
      (eCount / 100000L).toInt + 1))
    val e = edges.select(col("src"), col("dst"), col("weight"))
      .repartition(parts, col("src"))
      .persist(org.apache.spark.storage.StorageLevel.MEMORY_AND_DISK)
    e.count() // materialize once; reused 16x

    var ranks: DataFrame = null // (qid, rank) for explicit nodes
    var prev: DataFrame = null // kept to document round-to-round handoff
    var background = 1.0 / n
    var startIt = 0

    val root = ckptRoot
      .orElse(spark.conf.getOption("spark.graft.pagerank.snapshotRoot"))
      .filter(_.nonEmpty)
    val inputId = s"pr-input:$eCount:$eHash:$lastQid"
    val Stage = "pr_ranks"
    for {
      r <- root
      (path, m) <- graft.ckpt.Snapshots.latest(spark, r, Stage)
      if m.inputs.headOption.contains(inputId)
      doneIt = m.inputs(1).stripPrefix("it:").toInt
      if doneIt < iterations
    } {
      ranks = spark.read.parquet(path)
      background = m.inputs(2).stripPrefix("bg:").toDouble
      startIt = doneIt + 1
    }

    for (it <- startIt until iterations) {
      val srcRank =
        if (ranks == null) e.withColumn("srank", lit(background))
        else e.join(ranks.withColumnRenamed("qid", "src"), Seq("src"), "left")
          .withColumn("srank", coalesce(col("rank"), lit(background)))
      val nv = srcRank
        .groupBy(col("dst"))
        .agg(sum(col("srank") * col("weight")).as("mass"))
      // LAZY localCheckpoint truncates the logical plan (16 nested
      // join+agg rounds otherwise OOM the driver during planning); the l1
      // aggregation right after is the ONE materializing job per round
      val newRanks = nv.select(col("dst").as("qid"), col("mass").as("rank"))
        .repartition(parts, col("qid"))
        .localCheckpoint(false)
      val l1 = newRanks.agg(sum(col("rank"))).head().getDouble(0)
      // free the previous round's checkpoint blocks (the final round's stay:
      // they back the returned ranks frame)
      if (prev != null)
        org.apache.spark.sql.graftbridge.Bridge.unpersistLocalCheckpoint(prev)
      prev = newRanks
      val comp = (1.0 - l1) / n
      ranks = newRanks.withColumn("rank", col("rank") + lit(comp))
      background = comp
      // commit every ckptEvery-th iteration (and the final one): re-root
      // the rank vector on the committed parquet so a rerun resumes here
      root.foreach { r =>
        if ((it + 1) % ckptEvery == 0 || it == iterations - 1) {
          val (path, _) = graft.ckpt.Snapshots.commit(ranks, r, Stage,
            Seq(inputId, s"it:$it", s"bg:$background"))
          org.apache.spark.sql.graftbridge.Bridge.unpersistLocalCheckpoint(prev)
          prev = null
          ranks = spark.read.parquet(path)
        }
      }
    }
    e.unpersist()
    Result(ranks, background, n, lastQid)
  }

  /** pagerank lookup semantics incl. defaults (wikidatagraph.py:165-170):
    * explicit rank, else background for in-range ids, else 0.01/N. */
  def lookupExpr(qidNumCol: String, rankCol: String, res: Result) =
    when(col(rankCol).isNotNull, col(rankCol))
      .when(col(qidNumCol) <= lit(res.lastQid), lit(res.background))
      .otherwise(lit(0.01 / res.n))

  /** Raw graph edges (incl. P31, incl. qualifiers, with multiplicity) from a
    * parsed dump DataFrame — the preprocess_dump stage
    * (wikidatagraph.py:23-59) as a projection. */
  def rawEdgesFromItems(items: DataFrame): DataFrame =
    items
      .filter(col("it.id").startsWith("Q"))
      .select(
        expr("cast(substring(it.id, 2) as long)").as("src"),
        explode(expr(
          """filter(
            |  flatten(transform(flatten(map_values(coalesce(it.claims, map()))),
            |    c -> concat(
            |      array(try_variant_get(c.mainsnak.datavalue, '$.value["numeric-id"]', 'int')),
            |      transform(flatten(map_values(coalesce(c.qualifiers, map()))),
            |        q -> try_variant_get(q.datavalue, '$.value["numeric-id"]', 'int'))))),
            |  x -> x is not null)""".stripMargin)).as("dst32"))
      .select(col("src"), col("dst32").cast("long").as("dst"))
}
