package graft

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

/** Per-round benchmark (driver contract: ONE JSON line on stdout).
  *
  * Two measurements:
  *  1. throughput scaling (the BASELINE.json north_rule gate): the page
  *     pipeline (mention extraction -> candidate ranking -> context scoring
  *     -> best link -> blocked pairs) timed end-to-end at local[8] and
  *     local[32] on the SAME input; pages/sec at both + efficiency
  *     = (qps_32 / qps_8) / 4. The bench corpus is the documents table
  *     deterministically replicated (env SPARK_GRAFT_BENCH_REPLICATE,
  *     default 8x) so parallel work dominates fixed per-job latency, as it
  *     would at real scale.
  *  2. per-query wall times for every SparkEntry query at local[32].
  *
  * Offline artifacts (dictionary/BOW/PageRank) are built once per session
  * and excluded from the throughput window — they are the reference's
  * offline indexing stages, not the page path.
  */
object Bench {

  private def session(cores: Int): SparkSession = {
    val s = SparkSession.builder()
      .master(s"local[$cores]")
      .appName(s"graft-bench-$cores")
      .config("spark.sql.shuffle.partitions", (cores * 2).toString)
      .config("spark.sql.adaptive.enabled", "true")
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.ui.enabled", "false")
      .config("spark.driver.memory", sys.env.getOrElse("SPARK_DRIVER_MEM", "8g"))
      .getOrCreate()
    s.sparkContext.setLogLevel("ERROR")
    s
  }

  /** replicated bench corpus: documents x K with distinct doc ids. */
  private def benchDocs(spark: SparkSession, sfDir: String, replicate: Int): DataFrame = {
    val docs = spark.read.parquet(s"$sfDir/documents.parquet")
      .select(col("doc_id"), col("text"))
    docs
      .withColumn("rep", explode(lit((0 until replicate).toArray)))
      .select((col("doc_id") + col("rep").cast("long") * 10000000L).as("doc_id"),
        col("text"))
      .repartition(spark.sparkContext.defaultParallelism * 2)
  }

  /** the timed page path: extraction -> candidates -> best links -> pairs.
    * Returns processed page count. */
  private def runPipeline(spark: SparkSession, docs: DataFrame,
      a: Pipeline.Artifacts): Long = {
    import graft.link.{DocClassifier, Mentions, Pairs, Scoring}
    val mentions = Mentions.extract(docs, a.dictKeys, a.maxKeyTokens)
    val tags = Mentions.candidates(mentions, a.dictKeys, a.entityDict, a.pagerank, a.bow)
    val best = DocClassifier.bestLinks(tags, Scoring.Params(), Scoring.defaultModel())
    val pairs = Pairs.candidatePairs(best)
    pairs.count()
  }

  private def timed[T](f: => T): (T, Double) = {
    val t0 = System.nanoTime()
    val r = f
    (r, (System.nanoTime() - t0) / 1e9)
  }

  def main(args: Array[String]): Unit = {
    val sfDir = sys.env.getOrElse("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    val replicate = sys.env.getOrElse("SPARK_GRAFT_BENCH_REPLICATE", "8").toInt
    val lowCores = 8
    val highCores = sys.env.getOrElse("SPARK_GRAFT_CPUS", "32").toInt

    // --- scaling measurement: same input, two parallelism levels ----------
    def throughput(cores: Int): (Double, Long, Double) = {
      val spark = session(cores)
      try {
        val a = Pipeline.buildArtifacts(spark) // offline stage, not timed
        val docs = benchDocs(spark, sfDir, replicate)
          .persist(org.apache.spark.storage.StorageLevel.MEMORY_AND_DISK)
        val nPages = docs.count() // materialize input outside the window
        runPipeline(spark, docs.limit(2048), a) // warmup: codegen + broadcasts
        val (_, secs) = timed(runPipeline(spark, docs, a))
        docs.unpersist()
        (nPages / secs, nPages, secs)
      } finally spark.stop()
    }

    val (qps8, pages8, secs8) = throughput(lowCores)
    val (qps32, _, secs32) = throughput(highCores)
    val efficiency = (qps32 / qps8) / (highCores.toDouble / lowCores)

    // --- per-query timings at the high parallelism level ------------------
    val spark = session(highCores)
    val queryTimes: Seq[(String, Double)] =
      SparkEntry.queries.toSeq.sortBy(_._1).map { case (name, fn) =>
        val (_, secs) =
          try timed { fn(spark, sfDir).count(); () }
          catch { case _: Throwable => ((), -1.0) }
        name -> secs
      }
    spark.stop()

    val qs = queryTimes.map { case (k, v) => "\"" + k + "\":" + f"$v%.3f" }
      .mkString("{", ",", "}")
    val total = queryTimes.map(_._2).filter(_ >= 0).sum
    println(
      f"""{"metric":"total","value":$total%.3f,"unit":"sec","queries":$qs%s,"sf":"$sfDir%s","pipeline_pages":$pages8%d,"pipeline_secs_8":$secs8%.3f,"pipeline_secs_32":$secs32%.3f,"pages_per_sec_8":$qps8%.1f,"pages_per_sec_32":$qps32%.1f,"scaling_efficiency":$efficiency%.3f,"replicate":$replicate%d}""")
  }
}
