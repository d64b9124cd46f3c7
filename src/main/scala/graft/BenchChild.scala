package graft

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

/** One benchmark measurement in one fresh JVM (spawned by graft.Bench).
  * Sequential Spark sessions inside a single JVM degrade measurably
  * (observed 15x on the second session), so every measurement is isolated.
  *
  * Modes:
  *   scale <cores>   — one warmed end-to-end pipeline run on the replicated
  *                     corpus; prints "SCALE cores pages secs"
  *   queries <cores> — per-driver-query wall times; prints "QT name secs"
  */
object BenchChild {

  def session(cores: Int): SparkSession = {
    val s = SparkSession.builder()
      .master(s"local[$cores]")
      .appName(s"graft-bench-$cores")
      .config("spark.sql.shuffle.partitions", (cores * 2).toString)
      .config("spark.sql.adaptive.enabled", "true")
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.ui.enabled", "false")
      .config("spark.local.dir", sys.env.getOrElse("SPARK_LOCAL_DIRS", "/dev/shm/graft-spark"))
      .getOrCreate()
    s.sparkContext.setLogLevel("ERROR")
    s
  }

  def benchDocs(spark: SparkSession, sfDir: String, replicate: Int): DataFrame =
    spark.read.parquet(s"$sfDir/documents.parquet")
      .select(col("doc_id"), col("text"))
      .withColumn("rep", explode(lit((0 until replicate).toArray)))
      .select((col("doc_id") + col("rep").cast("long") * 10000000L).as("doc_id"),
        col("text"))
      .repartition(spark.sparkContext.defaultParallelism * 2)

  def runPipeline(docs: DataFrame, a: Pipeline.Artifacts): Long = {
    import graft.link.{FusedAnnotate, Pairs, Scoring}
    Pairs.candidatePairs(
      FusedAnnotate.annotate(docs, a, Scoring.Params(), Scoring.defaultModel()))
      .count()
  }

  def main(args: Array[String]): Unit = {
    val mode = args(0)
    val cores = args(1).toInt
    val sfDir = sys.env.getOrElse("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    val replicate = sys.env.getOrElse("SPARK_GRAFT_BENCH_REPLICATE", "64").toInt
    val spark = session(cores)

    mode match {
      case "scale" =>
        val a = Pipeline.buildArtifacts(spark) // offline stage, untimed
        val docs = benchDocs(spark, sfDir, replicate)
          .persist(org.apache.spark.storage.StorageLevel.MEMORY_AND_DISK)
        val nPages = docs.count()
        runPipeline(docs.sample(0.05, 42), a) // warmup: codegen + broadcasts
        def gcSecs: Double = {
          import scala.jdk.CollectionConverters._
          java.lang.management.ManagementFactory.getGarbageCollectorMXBeans
            .asScala.map(_.getCollectionTime).sum / 1e3
        }
        val trials = sys.env.getOrElse("SPARK_BENCH_TRIALS", "3").toInt
        println(s"SCALE $cores $nPages")
        for (t <- 1 to trials) {
          val gc0 = gcSecs
          val t0 = System.nanoTime()
          runPipeline(docs, a)
          val secs = (System.nanoTime() - t0) / 1e9
          println(f"TRIAL $cores%d $secs%.3f ${gcSecs - gc0}%.3f $t%d")
        }
      case "queries" =>
        val only = args.drop(2).toSet // optional name filter for profiling
        Pipeline.artifacts(spark) // offline stage (dict/BOW/PageRank), untimed
        SparkEntry.queries.toSeq.sortBy(_._1)
          .filter { case (n, _) => only.isEmpty || only(n) }
          .foreach { case (name, fn) =>
          val t0 = System.nanoTime()
          val ok = try { fn(spark, sfDir).count(); true }
          catch { case _: Throwable => false }
          val secs = if (ok) (System.nanoTime() - t0) / 1e9 else -1.0
          println(f"QT $name%s $secs%.3f")
        }
    }
    spark.stop()
  }
}
