package graft

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions._

/** One throughput measurement in one JVM (diagnostic). */
object FusedProbe {
  def main(args: Array[String]): Unit = {
    val cores = sys.env.getOrElse("SPARK_GRAFT_CPUS", "32").toInt
    val sfDir = sys.env.getOrElse("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    val replicate = sys.env.getOrElse("SPARK_GRAFT_BENCH_REPLICATE", "128").toInt
    val spark = SparkSession.builder()
      .master(s"local[$cores]")
      .config("spark.sql.shuffle.partitions", (cores * 2).toString)
      .config("spark.sql.adaptive.enabled", "true")
      .config("spark.ui.enabled", "false")
      .config("spark.local.dir", sys.env.getOrElse("SPARK_LOCAL_DIRS", "/dev/shm/graft-spark"))
      .getOrCreate()
    spark.sparkContext.setLogLevel("ERROR")
    val a = Pipeline.buildArtifacts(spark)
    val docs = spark.read.parquet(s"$sfDir/documents.parquet")
      .select(col("doc_id"), col("text"))
      .withColumn("rep", explode(lit((0 until replicate).toArray)))
      .select((col("doc_id") + col("rep").cast("long") * 10000000L).as("doc_id"), col("text"))
      .repartition(cores * 2)
      .persist(org.apache.spark.storage.StorageLevel.MEMORY_AND_DISK)
    val n = docs.count()
    import graft.link.{FusedAnnotate, Pairs, Scoring}
    def run(): Long = Pairs.candidatePairs(
      FusedAnnotate.annotate(docs, a, Scoring.Params(), Scoring.defaultModel())).count()
    run() // warmup (full size: codegen + broadcasts)
    for (i <- 1 to 2) {
      val t0 = System.nanoTime()
      run()
      val secs = (System.nanoTime() - t0) / 1e9
      println(f"PROBE cores=$cores pages=$n iter=$i secs=$secs%.2f qps=${n / secs}%.1f")
    }
    spark.stop()
  }
}
