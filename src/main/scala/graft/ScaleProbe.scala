package graft

import org.apache.spark.sql.functions._

/** Scratch profiler for the scaling pathology (not driver contract):
  * times the fused annotate alone, pairs-over-snapshot-blockSeq, and
  * pairs-over-checkpoint-blockSeq (the round-2 impl) at SPARK_GRAFT_CPUS
  * cores, each phase twice (2nd number is post-JIT). */
object ScaleProbe {
  def main(args: Array[String]): Unit = {
    val cores = sys.env.getOrElse("SPARK_GRAFT_CPUS", "16").toInt
    val sfDir = sys.env.getOrElse("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    val replicate = sys.env.getOrElse("SPARK_GRAFT_BENCH_REPLICATE", "128").toInt
    val phases = args.headOption.getOrElse("annotate,pairs,pairsCkpt").split(",").toSet
    val spark = BenchChild.session(cores)
    if (sys.env.get("SPARK_BENCH_STAGELOG").contains("1"))
      BenchChild.addStageLogger(spark)
    val a = Pipeline.buildArtifacts(spark)
    val docs = BenchChild.benchDocs(spark, sfDir, replicate)
      .persist(org.apache.spark.storage.StorageLevel.MEMORY_AND_DISK)
    val n = docs.count()
    println(s"PROBE cores=$cores pages=$n")
    import graft.link.{FusedAnnotate, Pairs, Scoring}

    def timed(name: String)(f: => Long): Unit = {
      for (i <- 1 to 2) {
        val t0 = System.nanoTime()
        val r = f
        println(f"PROBE $name%-12s iter=$i rows=$r%8d ${(System.nanoTime() - t0) / 1e9}%8.2f s")
      }
    }
    def annotated = FusedAnnotate.annotate(docs, a, Scoring.Params(), Scoring.defaultModel())
    if (phases("annotate")) timed("annotate") { annotated.count() }
    if (phases("pairs")) timed("pairs") {
      Pairs.candidatePairs(annotated).count()
    }
    if (phases("pairsCkpt")) timed("pairsCkpt") {
      val p = Pairs.candidatePairs(annotated, seqImpl = Pairs.blockSeqCheckpoint)
      val r = p.count()
      org.apache.spark.sql.graftbridge.Bridge.unpersistLocalCheckpoint(p)
      r
    }
    spark.stop()
  }
}
