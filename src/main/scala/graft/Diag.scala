package graft

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

/** Stage-level timing diagnostics for the page pipeline (not part of the
  * driver contract; used to locate scaling bottlenecks). */
object Diag {
  def main(args: Array[String]): Unit = {
    val sfDir = sys.env.getOrElse("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    val replicate = sys.env.getOrElse("SPARK_GRAFT_BENCH_REPLICATE", "64").toInt
    val cores = sys.env.getOrElse("SPARK_GRAFT_CPUS", "32").toInt

    val spark = SparkSession.builder()
      .master(s"local[$cores]")
      .config("spark.sql.shuffle.partitions", (cores * 2).toString)
      .config("spark.sql.adaptive.enabled", "true")
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.ui.enabled", "false")
      .config("spark.local.dir", sys.env.getOrElse("SPARK_LOCAL_DIRS", "/dev/shm/graft-spark"))
      .getOrCreate()
    spark.sparkContext.setLogLevel("ERROR")

    def timed(name: String)(f: => Long): Unit = {
      val t0 = System.nanoTime()
      val n = f
      println(f"STAGE $name%-22s ${(System.nanoTime() - t0) / 1e9}%8.2f s   rows=$n")
    }

    import graft.link.{DocClassifier, Mentions, Pairs, Scoring}
    timed("artifacts") { Pipeline.buildArtifacts(spark); 1L }
    val a = Pipeline.artifacts(spark)

    val docs = spark.read.parquet(s"$sfDir/documents.parquet")
      .select(col("doc_id"), col("text"))
      .withColumn("rep", explode(lit((0 until replicate).toArray)))
      .select((col("doc_id") + col("rep").cast("long") * 10000000L).as("doc_id"), col("text"))
      .repartition(cores * 2)
      .persist(org.apache.spark.storage.StorageLevel.MEMORY_AND_DISK)
    timed("input") { docs.count() }

    val spans = Mentions.candidateSpans(docs, a.maxKeyTokens)
    val matched = Mentions.matchSpans(spans, a.dictKeys)
      .persist(org.apache.spark.storage.StorageLevel.MEMORY_AND_DISK)
    timed("spans+match") { matched.count() }

    val mentions = Mentions.resolveSpans(matched)
      .persist(org.apache.spark.storage.StorageLevel.MEMORY_AND_DISK)
    timed("nosub+prune") { mentions.count() }

    val tags = Mentions.candidates(mentions, a.dictKeys, a.entityDict, a.pagerank, a.bow)
      .persist(org.apache.spark.storage.StorageLevel.MEMORY_AND_DISK)
    timed("candidates") { tags.count() }

    val best = DocClassifier.bestLinks(tags, Scoring.Params(), Scoring.defaultModel())
      .persist(org.apache.spark.storage.StorageLevel.MEMORY_AND_DISK)
    timed("fused-classify") { best.count() }

    val pairs = Pairs.candidatePairs(best)
    timed("pairs") { pairs.count() }

    val clusters = graft.link.ConnectedComponents.runWithIsolated(
      spark,
      best.withColumn("mention_id", Pairs.mentionIdCol).select("mention_id"),
      Pairs.sameEntityEdges(Pairs.candidatePairs(best)))
    timed("clusters") { clusters.count() }

    spark.stop()
  }
}
