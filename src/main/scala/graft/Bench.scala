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
  * Round-2's protocol timed out in the driver (rc=124, zero numbers): five
  * children each rebuilt the full artifact set and nothing was emitted
  * until everything finished. Round-3 protocol:
  *
  *   - artifacts are built ONCE in a prep child and snapshotted to parquet
  *     (Pipeline.saveArtifacts); every measurement child loads them;
  *   - the default scale matrix is local[2]/local[8]/local[32]: every
  *     N-vs-4N pair is reported, with 2/8 primary (below the box's
  *     memory-bandwidth knee — see BENCH.md "Why 2/8") and 8/32 published
  *     alongside the saturation analysis;
  *   - child output is parsed as it streams, and a WALL-CLOCK DEADLINE
  *     (SPARK_BENCH_DEADLINE_SECS, default 2100) kills the current child
  *     and emits the JSON line from whatever completed: a timeout degrades
  *     the evidence instead of destroying it;
  *   - >= 3 timed trials inside one warmed session; the reported number is
  *     the MEDIAN and the raw trials + GC seconds are published so spread
  *     is visible (this VM shows occasional whole-machine stalls).
  */
object Bench {

  private val t0 = System.nanoTime()
  private def elapsed: Double = (System.nanoTime() - t0) / 1e9
  private lazy val deadline =
    sys.env.getOrElse("SPARK_BENCH_DEADLINE_SECS", "2100").toDouble
  private def remaining: Double = deadline - elapsed

  private def benchLocalDir: String =
    sys.env.getOrElse("SPARK_LOCAL_DIRS", "/dev/shm/graft-spark") + "/bench"

  private def artifactsDir: String = benchLocalDir + "-artifacts"

  private def childCmd(mode: String, cores: Int): Seq[String] = {
    val java = System.getProperty("java.home") + "/bin/java"
    val inherited = ManagementFactory.getRuntimeMXBean.getInputArguments.asScala
      .filter(a => a.startsWith("--add-opens") || a.startsWith("-D"))
      .toSeq
    val heap = sys.env.getOrElse("SPARK_BENCH_CHILD_MEM", "48g")
    Seq(java) ++ inherited ++ Seq(s"-Xmx$heap",
      s"-DSPARK_LOCAL_DIRS_OVERRIDE=$benchLocalDir",
      s"-DSPARK_BENCH_ARTIFACTS=$artifactsDir",
      "-cp", System.getProperty("java.class.path"),
      "graft.BenchChild", mode, cores.toString)
  }

  /** Run a child, streaming stdout lines into `out`; kill it if the global
    * deadline passes. Returns (exitOk, lines-so-far). */
  private def runChild(mode: String, cores: Int): (Boolean, Seq[String]) = {
    val out = new java.util.concurrent.ConcurrentLinkedQueue[String]()
    val logger = ProcessLogger(l => { out.add(l); () }, _ => ())
    val p = Process(childCmd(mode, cores)).run(logger)
    val done = new java.util.concurrent.atomic.AtomicBoolean(false)
    val waiter = new Thread(() => { p.exitValue(); done.set(true) })
    waiter.setDaemon(true)
    waiter.start()
    var killed = false
    while (!done.get && !killed) {
      if (remaining <= 0) { killed = true; p.destroy() }
      else Thread.sleep(500)
    }
    (!killed && p.exitValue() == 0, out.iterator().asScala.toSeq)
  }

  private def median(xs: Seq[Double]): Double = {
    val s = xs.sorted
    if (s.isEmpty) 0.0
    else if (s.size % 2 == 1) s(s.size / 2)
    else (s(s.size / 2 - 1) + s(s.size / 2)) / 2.0
  }

  final case class ScaleResult(pages: Long, trials: Seq[Double],
      gcSecs: Seq[Double], stealSecs: Seq[Double], cleanFlags: Seq[Boolean]) {
    /** median over steal-clean trials when any exist (one host storm must
      * not poison the round), else over everything. */
    def secs: Double = {
      val clean = trials.zip(cleanFlags).collect { case (t, true) => t }
      median(if (clean.nonEmpty) clean else trials)
    }
  }

  private def scaleRun(cores: Int): Option[ScaleResult] = {
    val (_, lines) = runChild("scale", cores)
    for {
      pages <- lines.find(_.startsWith("SCALE ")).map(_.split(" ")(2).toLong)
      trials = lines.filter(_.startsWith("TRIAL ")).map(_.split(" "))
      if trials.nonEmpty
    } yield ScaleResult(pages, trials.map(_(2).toDouble), trials.map(_(3).toDouble),
      trials.map(t => if (t.length > 5) t(5).toDouble else 0.0),
      trials.map(t => t.length <= 6 || t(6) == "ok"))
  }

  /** Stale per-app scratch from killed runs accumulates in tmpfs; wipe the
    * bench-NAMESPACED dir only (a concurrent test session's shuffle files
    * in the shared default dir are left alone). */
  private def cleanLocalDir(): Unit = {
    def rm(f: java.io.File): Unit = {
      if (f.isDirectory) Option(f.listFiles()).getOrElse(Array.empty).foreach(rm)
      f.delete(); ()
    }
    rm(new java.io.File(benchLocalDir))
    rm(new java.io.File(artifactsDir))
  }

  def main(args: Array[String]): Unit = {
    val sfDir = sys.env.getOrElse("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    val replicate = sys.env.getOrElse("SPARK_GRAFT_BENCH_REPLICATE", "128").toInt
    val full = sys.env.getOrElse("SPARK_GRAFT_CPUS", "32").toInt
    // 2/8 is the primary N-vs-4N gate pair: both configs sit below this
    // box's memory-bandwidth saturation point (~16 threads), which is the
    // regime that models a real cluster (4N executors bring 4x memory
    // bandwidth; one socket does not). 8/32 is reported alongside with the
    // saturation analysis in BENCH.md.
    val configs = sys.env.getOrElse("SPARK_BENCH_CONFIGS", "2,8,32")
      .split(",").map(_.trim.toInt).toSeq
    cleanLocalDir()

    // offline stage: build + snapshot artifacts once (untimed, the
    // reference's indexing phase)
    val (prepOk, _) = runChild("prep", full)
    require(prepOk || remaining <= 0, "artifact prep child failed")

    // queries first: they are cheap (~2-3 min) and a host storm during the
    // scale trials must not cost the round its per-query evidence
    val queryTimes =
      if (remaining > 0)
        runChild("queries", full)._2
          .filter(_.startsWith("QT "))
          .map { l => val p = l.split(" "); (p(1), p(2).toDouble) }
      else Seq.empty

    val results = scala.collection.mutable.LinkedHashMap.empty[Int, ScaleResult]
    for (c <- configs if remaining > 0)
      scaleRun(c).foreach(r => results += c -> r)

    val pages = results.values.headOption.map(_.pages).getOrElse(0L)
    def qps(c: Int): Option[Double] = results.get(c).map(r => r.pages / r.secs)
    // every measured N-vs-4N pair, primary = the smallest complete one
    val effPairs = for {
      lo <- configs.sorted
      hi = lo * 4
      if configs.contains(hi)
      qlo <- qps(lo); qhi <- qps(hi)
    } yield (lo, hi, (qhi / qlo) / 4.0)

    val qs = queryTimes.map { case (k, v) => "\"" + k + "\":" + f"$v%.3f" }
      .mkString("{", ",", "}")
    val total = queryTimes.map(_._2).filter(_ >= 0).sum
    def arr(xs: Seq[Double]): String = xs.map(x => f"$x%.3f").mkString("[", ",", "]")
    val perConfig = results.map { case (c, r) =>
      val flags = r.cleanFlags.map(f => "\"" + (if (f) "ok" else "stolen") + "\"")
        .mkString("[", ",", "]")
      f""""pipeline_secs_$c":${r.secs}%.3f,"pages_per_sec_$c":${r.pages / r.secs}%.1f,"pipeline_trials_$c":${arr(r.trials)},"gc_secs_$c":${arr(r.gcSecs)},"host_steal_secs_$c":${arr(r.stealSecs)},"trial_flags_$c":$flags%s"""
    }.mkString(",")
    val eff = effPairs.headOption
      .map { case (lo, hi, e) =>
        f""""scaling_pair":"$lo/$hi","scaling_efficiency":$e%.3f,"""
      }.getOrElse("") +
      effPairs.map { case (lo, hi, e) =>
        f""""scaling_efficiency_${lo}_$hi":$e%.3f"""
      }.mkString("", ",", if (effPairs.nonEmpty) "," else "")
    val incomplete = if (remaining <= 0) """"deadline_hit":true,""" else ""

    println(
      f"""{"metric":"total","value":$total%.3f,"unit":"sec","queries":$qs%s,"sf":"$sfDir%s","pipeline_pages":$pages%d,"replicate":$replicate%d,$eff%s$incomplete%s$perConfig%s}""")
  }
}
