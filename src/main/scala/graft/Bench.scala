package graft

import java.lang.management.ManagementFactory
import scala.jdk.CollectionConverters._
import scala.sys.process._

/** Per-round benchmark (driver contract: ONE JSON line on stdout).
  *
  * Orchestrator only: every measurement runs in its OWN child JVM
  * (graft.BenchChild) because sequential Spark sessions in one JVM degrade
  * (observed 15x slowdown on the second session in this sandbox).
  *
  * Measurements:
  *  1. throughput scaling (BASELINE.json north_rule: "N and 4N"):
  *     the fused page pipeline end-to-end on the same replicated corpus at
  *     local[4] vs local[16] (all physical cores; this box exposes 32
  *     hyperthreads over 16 physical cores, so 8->32 measures SMT, not
  *     scaling) AND at local[8] vs local[32] for reference. Efficiency =
  *     (qps_high / qps_low) / (high/low).
  *  2. per-driver-query wall times at the full machine width.
  *
  * Offline artifacts (dictionary/BOW/PageRank) build per child and are
  * excluded from the throughput window (the reference's offline indexing).
  */
object Bench {

  private def childCmd(mode: String, cores: Int): Seq[String] = {
    val java = System.getProperty("java.home") + "/bin/java"
    val jvmArgs = ManagementFactory.getRuntimeMXBean.getInputArguments.asScala
      .filter(a => a.startsWith("--add-opens") || a.startsWith("-Xmx") ||
        a.startsWith("-D"))
      .toSeq
    Seq(java) ++ jvmArgs ++ Seq("-cp", System.getProperty("java.class.path"),
      "graft.BenchChild", mode, cores.toString)
  }

  private def runChild(mode: String, cores: Int): Seq[String] = {
    val out = new StringBuilder
    val logger = ProcessLogger(line => out.append(line).append('\n'), _ => ())
    val code = Process(childCmd(mode, cores)).!(logger)
    require(code == 0, s"bench child $mode/$cores failed (exit $code)")
    out.toString.linesIterator.toSeq
  }

  private def scaleRun(cores: Int): (Long, Double) = {
    val line = runChild("scale", cores).find(_.startsWith("SCALE "))
      .getOrElse(sys.error(s"no SCALE line from child $cores"))
    val parts = line.split(" ")
    (parts(2).toLong, parts(3).toDouble)
  }

  def main(args: Array[String]): Unit = {
    val sfDir = sys.env.getOrElse("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    val replicate = sys.env.getOrElse("SPARK_GRAFT_BENCH_REPLICATE", "64").toInt
    val full = sys.env.getOrElse("SPARK_GRAFT_CPUS", "32").toInt

    val (pages, secs4) = scaleRun(4)
    val (_, secs16) = scaleRun(16)
    val (_, secs8) = scaleRun(8)
    val (_, secs32) = scaleRun(full)

    val qps4 = pages / secs4
    val qps16 = pages / secs16
    val qps8 = pages / secs8
    val qps32 = pages / secs32
    val eff416 = (qps16 / qps4) / 4.0
    val eff832 = (qps32 / qps8) / (full / 8.0)

    val queryTimes = runChild("queries", full)
      .filter(_.startsWith("QT "))
      .map { l => val p = l.split(" "); (p(1), p(2).toDouble) }
    val qs = queryTimes.map { case (k, v) => "\"" + k + "\":" + f"$v%.3f" }
      .mkString("{", ",", "}")
    val total = queryTimes.map(_._2).filter(_ >= 0).sum

    println(
      f"""{"metric":"total","value":$total%.3f,"unit":"sec","queries":$qs%s,"sf":"$sfDir%s","pipeline_pages":$pages%d,"replicate":$replicate%d,"pipeline_secs_4":$secs4%.3f,"pipeline_secs_16":$secs16%.3f,"pipeline_secs_8":$secs8%.3f,"pipeline_secs_32":$secs32%.3f,"pages_per_sec_4":$qps4%.1f,"pages_per_sec_16":$qps16%.1f,"pages_per_sec_8":$qps8%.1f,"pages_per_sec_32":$qps32%.1f,"scaling_efficiency":$eff416%.3f,"scaling_efficiency_8_32":$eff832%.3f}""")
  }
}
