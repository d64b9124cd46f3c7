package graft

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions._

/** spark-submit entry point for the standalone-cluster scaling demo
  * (north_rule: "run by spark-submit ... at N and 4N executors with
  * throughput scaling efficiency >= 0.8").
  *
  * Unlike BenchChild — which pins a `local[n]` master because its job is
  * single-JVM trial isolation — this main inherits whatever master
  * spark-submit provides, so the same pipeline runs on a REAL
  * multi-executor cluster: scripts/standalone_bench.sh stands up a Spark
  * standalone master + worker on this host and submits the identical jar
  * at --total-executor-cores {N*c, 4N*c}, giving N and 4N separate
  * executor JVMs with their own heaps, shuffle servers and task threads
  * (the closest thing to a real cluster a single box can express; the
  * local[n] matrix in graft.Bench remains the statistically-hardened
  * artifact).
  *
  * Usage: ClusterPipeline <artifactsDir> <sfDir> <replicate> <trials>
  * Prints one "CLUSTER executors=E cores=C pages=P" line, then one
  * "CTRIAL <wallSecs>" per timed trial (after one untimed quarter-corpus
  * JIT warmup, matching the BenchChild protocol).
  */
object ClusterPipeline {

  def main(args: Array[String]): Unit = {
    val artDir = args(0)
    val sfDir = args(1)
    val replicate = args(2).toInt
    val trials = args(3).toInt

    val spark = SparkSession.builder()
      .appName("graft-cluster-pipeline")
      .config("spark.sql.adaptive.enabled", "true")
      .config("spark.sql.session.timeZone", "UTC")
      .getOrCreate()
    spark.sparkContext.setLogLevel("ERROR")
    // executors register asynchronously after the context starts: wait for
    // the full allotment (standalone maps --total-executor-cores to
    // spark.cores.max) or defaultParallelism under-reports and the shuffle
    // partition sizing below silently assumes a smaller cluster
    val wantCores = spark.conf.getOption("spark.cores.max").map(_.toInt)
    var waited = 0
    while (wantCores.exists(_ > spark.sparkContext.defaultParallelism)
        && waited < 60) {
      Thread.sleep(1000); waited += 1
    }
    // same task-packing rule as BenchChild scale mode: 4x total cores
    val totalCores = spark.sparkContext.defaultParallelism
    spark.conf.set("spark.sql.shuffle.partitions", (totalCores * 4).toString)
    spark.conf.set("spark.sql.adaptive.advisoryPartitionSizeInBytes", "16m")
    spark.conf.set("spark.sql.files.maxPartitionBytes", "32m")

    val a = Pipeline.loadArtifacts(spark, artDir)
    val docs = BenchChild.benchDocs(spark, sfDir, replicate)
      .persist(org.apache.spark.storage.StorageLevel.MEMORY_AND_DISK)
    val pages = docs.count()
    // executors = block-manager count minus the driver's
    val execs = spark.sparkContext.getExecutorMemoryStatus.size - 1
    println(s"CLUSTER executors=$execs cores=$totalCores pages=$pages")

    val warmup = docs.filter(pmod(col("doc_id"), lit(4)) === lit(0))
    BenchChild.runPipeline(warmup, a)
    for (_ <- 1 to trials) {
      System.gc()
      Thread.sleep(1000)
      val t0 = System.nanoTime()
      BenchChild.runPipeline(docs, a)
      println(f"CTRIAL ${(System.nanoTime() - t0) / 1e9}%.3f")
    }
    spark.stop()
  }
}
