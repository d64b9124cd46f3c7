package graft.link

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

/** Transitive clustering: connected components via alternating
  * large-star / small-star DataFrame self-joins (north_rule; Kiveris et al.,
  * "Connected Components in MapReduce and Beyond", SoCC'14). No RDDs, no
  * GraphX: each round is groupBy(min) + join, lineage truncated per round
  * with localCheckpoint, converging in O(log n) rounds even on the skewed
  * star-shaped clusters web entity data produces.
  *
  * Input: undirected edge list (src, dst) of same-entity links (longs).
  * Output: (node, component) where component = min node id reachable.
  */
object ConnectedComponents {

  /** large-star: for each node u, connect every strictly-larger neighbor v
    * to m = min(N(u) ∪ {u}). Keeps (v, m) edges with v > m. */
  private def largeStar(edges: DataFrame): DataFrame = {
    val bi = edges.select(col("src").as("u"), col("dst").as("v"))
      .unionByName(edges.select(col("dst").as("u"), col("src").as("v")))
    val mins = bi.groupBy("u").agg(least(min(col("v")), col("u")).as("m"))
    bi.join(mins, "u")
      .filter(col("v") > col("u"))
      .select(col("v").as("src"), col("m").as("dst"))
      .distinct()
  }

  /** small-star: orient edges large->small; connect each small neighbor
    * (and u itself) to the minimum. */
  private def smallStar(edges: DataFrame): DataFrame = {
    val oriented = edges.select(
      greatest(col("src"), col("dst")).as("u"),
      least(col("src"), col("dst")).as("v"))
      .distinct()
    val mins = oriented.groupBy("u").agg(min(col("v")).as("m"))
    val nbr = oriented.join(mins, "u")
      .filter(col("v") =!= col("m"))
      .select(col("v").as("src"), col("m").as("dst"))
    val self = mins.select(col("u").as("src"), col("m").as("dst"))
    nbr.unionByName(self).distinct()
  }

  /** Signature of an edge set for convergence detection: (count, sum of a
    * symmetric hash). One aggregation, no collect of the edge list. */
  private def signature(edges: DataFrame): (Long, Long) = {
    val r = edges.agg(
      count(lit(1)).as("c"),
      coalesce(sum(hash(col("src"), col("dst")).cast("long")), lit(0L)).as("h"))
      .head()
    (r.getLong(0), r.getLong(1))
  }

  /** Runs to fixpoint; returns (node, component). Nodes present only as
    * isolated vertices must be unioned in by the caller if desired. */
  def run(spark: SparkSession, edges: DataFrame, maxRounds: Int = 50): DataFrame = {
    var cur = edges
      .filter(col("src") =!= col("dst"))
      .select(col("src").cast("long").as("src"), col("dst").cast("long").as("dst"))
      .distinct()
      .localCheckpoint(true)
    var prevSig = (-1L, 0L)
    var rounds = 0
    var sig = signature(cur)
    while (sig != prevSig && rounds < maxRounds) {
      prevSig = sig
      cur = smallStar(largeStar(cur)).localCheckpoint(true)
      sig = signature(cur)
      rounds += 1
    }
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
