package graft

import org.apache.spark.sql.functions._

/** Scratch profiler for the connected-components path (not driver contract). */
object CcProbe {
  def main(args: Array[String]): Unit = {
    val cores = sys.env.getOrElse("SPARK_GRAFT_CPUS", "32").toInt
    val spark = BenchChild.session(cores)
    def timed[T](name: String)(f: => T): T = {
      val t0 = System.nanoTime()
      val r = f
      println(f"PROBE $name%-18s ${(System.nanoTime() - t0) / 1e9}%8.2f s")
      r
    }
    val a = timed("artifacts") { Pipeline.artifacts(spark) }
    val keys = a.dictKeys
    val x = keys.select(col("norm_key"), expr("cast(substring(qid, 2) as long)").as("qa"))
    val y = keys.select(col("norm_key").as("nk2"), expr("cast(substring(qid, 2) as long)").as("qb"))
    val edges = x.join(y, x("norm_key") === y("nk2") && col("qa") < col("qb"))
      .select(col("qa").as("src"), col("qb").as("dst")).distinct()
    val nodes = keys.select(expr("cast(substring(qid, 2) as long)").as("node")).distinct()
    timed("edges.count") { edges.count() }
    timed("cc-verbose") {
      graft.link.ConnectedComponents.run(spark, edges, verbose = true).count()
    }
    timed("cc-withIsolated") {
      graft.link.ConnectedComponents.runWithIsolated(spark, nodes, edges).count()
    }
    // the full mention-cluster path (el_clusters shape)
    val sfDir = sys.env.getOrElse("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    val best = timed("annotate") {
      val b = Pipeline.annotate(spark, sfDir)
      b.count(); b
    }
    val medges = timed("pairs-edges") {
      val e = graft.link.Pairs.sameEntityEdges(graft.link.Pairs.candidatePairs(best))
        .persist()
      println(s"PROBE   mention edges = ${e.count()}")
      e
    }
    timed("cc-mentions") {
      graft.link.ConnectedComponents.run(spark, medges, verbose = true).count()
    }
    spark.stop()
  }
}
