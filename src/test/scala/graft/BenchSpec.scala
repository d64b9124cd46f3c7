package graft

import org.scalatest.funsuite.AnyFunSuite
import org.json4s._
import org.json4s.jackson.JsonMethods

/** The round-3 bench destroyed its own evidence twice: the empty-matrix
  * JSON line had a trailing comma (driver recorded parsed:null) and the
  * trial parser read the ok/stolen flag from the wrong token (every trial
  * flagged stolen, clean-median never applied). These tests pin both. */
class BenchSpec extends AnyFunSuite {

  private def parse(s: String): JValue = JsonMethods.parse(s)

  private def trial(cores: Int, secs: Double, steal: Double, clean: Boolean,
      attempt: Int = 1, cpu: Double = 100.0) =
    Bench.Trial(cores, secs, 1.0, attempt, steal, 2.0, cpu, clean)

  test("parseTrial reads the exact line format BenchChild prints") {
    // literal format from BenchChild: TRIAL cores secs gc attempt steal sys cpu flag
    val line = f"TRIAL ${8}%d ${31.612}%.3f ${2.341}%.3f ${2}%d " +
      f"${1.2}%.1f ${4.5}%.1f ${201.337}%.3f ${"ok"}%s"
    val t = Bench.parseTrial(line).get
    assert(t.cores == 8)
    assert(t.secs == 31.612)
    assert(t.gcSecs == 2.341)
    assert(t.attempt == 2)
    assert(t.stealSecs == 1.2)
    assert(t.sysSecs == 4.5)
    assert(t.cpuSecs == 201.337)
    assert(t.clean)
    val stolen = Bench.parseTrial(
      "TRIAL 2 287.400 3.100 4 655.0 12.0 180.500 stolen").get
    assert(!stolen.clean)
    assert(stolen.flagOrDerived == "stolen")
    // kernel-storm flag (round 4): high machine-sys, low steal
    val sysStorm = Bench.parseTrial(
      "TRIAL 8 238.649 5.059 1 41.7 1377.4 1777.934 sys").get
    assert(!sysStorm.clean)
    assert(sysStorm.flagOrDerived == "sys")
    assert(sysStorm.sysSecs == 1377.4)
    assert(Bench.parseTrial("SCALE 8 320000").isEmpty)
    assert(Bench.parseTrial("TRIAL garbage").isEmpty)
  }

  test("emitJson parses with an EMPTY scale matrix and deadline_hit") {
    val j = parse(Bench.emitJson("/root/testdata/sf0.1", 128,
      Seq("q1_agg" -> 0.335, "el_clusters" -> 20.935), Seq(8, 2, 32),
      results = Seq.empty, deadlineHit = true))
    assert((j \ "deadline_hit") == JBool(true))
    assert((j \ "pipeline_pages") == JInt(0))
    assert((j \ "queries" \ "q1_agg") == JDouble(0.335))
    assert((j \ "scaling_efficiency") == JNothing)
  }

  test("emitJson parses with zero queries and zero results") {
    val j = parse(Bench.emitJson("/x", 1, Seq.empty, Seq(2, 8),
      Seq.empty, deadlineHit = false))
    assert((j \ "value") == JDouble(0.0))
    assert((j \ "deadline_hit") == JNothing)
  }

  test("emitJson publishes efficiency trio + per-config stats when measured") {
    val r8 = Bench.ScaleResult(640000,
      Seq(trial(8, 31.0, 1.0, clean = true, 1, 220.0),
        trial(8, 33.0, 2.0, clean = true, 2, 221.0),
        trial(8, 200.0, 300.0, clean = false, 3, 223.0)))
    val r2 = Bench.ScaleResult(640000,
      Seq(trial(2, 100.0, 0.5, clean = true, 1, 195.0),
        trial(2, 104.0, 0.5, clean = true, 2, 196.0),
        trial(2, 102.0, 0.5, clean = true, 3, 197.0)))
    val j = parse(Bench.emitJson("/x", 128, Seq("a" -> 1.0), Seq(8, 2),
      Seq(8 -> r8, 2 -> r2), deadlineHit = false))
    assert((j \ "scaling_pair") == JString("2/8"))
    // clean-median: 102 / 32 / 4
    assert((j \ "scaling_efficiency") == JDouble(0.797))
    // min wall: 100 / 31 / 4
    assert((j \ "scaling_efficiency_min_2_8") == JDouble(0.806))
    // cpu over clean trials only: 196 / 220.5
    assert((j \ "scaling_efficiency_cpu_2_8") == JDouble(0.889))
    assert((j \ "pipeline_secs_8") == JDouble(32.0))
    assert((j \ "pipeline_secs_min_8") == JDouble(31.0))
    assert((j \ "trial_flags_8") == JArray(List(
      JString("ok"), JString("ok"), JString("stolen"))))
    assert((j \ "cpu_secs_2") == JArray(List(
      JDouble(195.0), JDouble(196.0), JDouble(197.0))))
    // machine-sys per trial published (kernel-storm visibility)
    assert((j \ "host_sys_secs_2") == JArray(List(
      JDouble(2.0), JDouble(2.0), JDouble(2.0))))
  }

  test("config budgets weight by 1/sqrt(cores) and donate forward") {
    // driver order: 4,8,2,1,32 — the serial config gets 2x local[4]'s
    // share (sqrt rule: more than equal-wall, less than the storm-fragile
    // equal-trial 1/cores rule that starved the wide configs twice)
    val s4 = Bench.configBudgetShare(Seq(4, 8, 2, 1, 32))
    def w(c: Int) = 1.0 / math.sqrt(c.toDouble)
    val sum = Seq(4, 8, 2, 1, 32).map(w).sum
    assert(math.abs(s4 - w(4) / sum) < 1e-9)
    val s1 = Bench.configBudgetShare(Seq(1, 32))
    assert(s1 > 0.84) // most of what's left vs a 32-wide tail
    assert(s1 < 0.9) // but not the 1/cores near-starvation of the tail
    assert(math.abs(Bench.configBudgetShare(Seq(8)) - 1.0) < 1e-9)
    // shares over a whole pass sum to 1 when applied sequentially
    val cfgs = Seq(4, 8, 2, 1, 32)
    var rem = 1.0; var spent = 0.0
    for (i <- cfgs.indices) {
      val b = rem * Bench.configBudgetShare(cfgs.drop(i))
      spent += b; rem -= b
    }
    assert(math.abs(spent - 1.0) < 1e-9)
  }

  test("per-query steal map is published when present") {
    val j = parse(Bench.emitJson("/x", 128,
      Seq("el_candidates" -> 31.638, "q1_agg" -> 0.458), Seq(8, 2),
      Seq.empty, deadlineHit = false,
      querySteal = Seq("el_candidates" -> 272.2, "q1_agg" -> 0.0)))
    assert((j \ "queries_steal" \ "el_candidates") == JDouble(272.2))
    assert((j \ "queries" \ "el_candidates") == JDouble(31.638))
    // absent when the child predates the steal column
    val j2 = parse(Bench.emitJson("/x", 1, Seq("a" -> 1.0), Seq(2),
      Seq.empty, deadlineHit = false))
    assert((j2 \ "queries_steal") == JNothing)
  }

  test("warmup-skipped configs are flagged in the JSON") {
    val r1 = Bench.ScaleResult(640000,
      Seq(trial(1, 441.0, 46.7, clean = true, 1, 427.0)),
      warmupSkipped = true)
    val r4 = Bench.ScaleResult(640000,
      Seq(trial(4, 112.0, 1.0, clean = true, 1, 400.0)))
    val j = parse(Bench.emitJson("/x", 128, Seq.empty, Seq(4, 1),
      Seq(4 -> r4, 1 -> r1), deadlineHit = false))
    assert((j \ "warmup_skipped_1") == JBool(true))
    assert((j \ "warmup_skipped_4") == JNothing)
    assert((j \ "scaling_pair") == JString("1/4"))
  }

  test("all-stolen trials fall back to min-of-attempts") {
    val r = Bench.ScaleResult(1000,
      Seq(trial(8, 90.0, 100.0, clean = false),
        trial(8, 250.0, 400.0, clean = false),
        trial(8, 120.0, 200.0, clean = false)))
    assert(r.secs == 90.0)
    assert(r.minSecs == 90.0)
  }

  test("stdout line fits the driver's 2000-char tail; arrays drop to the full file") {
    // 55 queries + 4 configs x 3 trials — the round-4 shape whose line
    // outgrew the driver's tail and truncated its own queries map away
    val queries = (1 to 55).map(i => f"query_name_$i%02d" -> (i * 0.37))
    val steal = queries.map { case (n, _) => n -> 0.0 }
    def res(c: Int) = Bench.ScaleResult(640000, Seq(
      trial(c, 100.0 / c, 1.0, clean = true, 1, 260.0),
      trial(c, 101.0 / c, 1.0, clean = true, 2, 261.0),
      trial(c, 102.0 / c, 1.0, clean = true, 3, 262.0)))
    val configs = Seq(8, 2, 4, 1)
    val results = configs.map(c => c -> res(c))
    val line = Bench.emitJson("/root/testdata/sf0.1", 128, queries, configs,
      results, deadlineHit = false, querySteal = steal,
      fullPath = Some("evidence/bench_full_latest.json"))
    assert(line.length <= Bench.LineBudget,
      s"line is ${line.length} chars, over the ${Bench.LineBudget} budget")
    val j = parse(line)
    // gate-critical keys survive, diagnostics deferred to the full file
    assert((j \ "scaling_efficiency_1_4") != JNothing)
    assert((j \ "scaling_efficiency_cpu_2_8") != JNothing)
    assert((j \ "queries" \ "query_name_07") == JDouble(2.59))
    assert((j \ "pipeline_secs_1") != JNothing)
    assert((j \ "trial_flags_8") != JNothing)
    assert((j \ "full") == JString("evidence/bench_full_latest.json"))
    assert((j \ "cpu_secs_8") == JNothing, "arrays must defer to the full file")
    // calm run: the steal map is sparse-empty, never 55 zero rows (the
    // round-4 misread), and the full-budget emit has everything
    assert((j \ "queries_steal") == JNothing)
    val full = parse(Bench.emitJson("/x", 128, queries, configs, results,
      deadlineHit = false, querySteal = steal, budget = Int.MaxValue))
    assert((full \ "cpu_secs_8") != JNothing)
    assert((full \ "pipeline_trials_1") != JNothing)
  }

  test("gate-critical scaling keys sit at the END of the line (truncation-safe)") {
    val queries = (1 to 55).map(i => f"query_name_$i%02d" -> (i * 0.37))
    val r = Bench.ScaleResult(640000,
      Seq(trial(4, 25.0, 1.0, clean = true, 1, 100.0)))
    val line = Bench.emitJson("/x", 128, queries, Seq(4, 1),
      Seq(4 -> r, 1 -> r.copy(trials = Seq(trial(1, 100.0, 1.0, clean = true, 1, 100.0)))),
      deadlineHit = false)
    assert(line.lastIndexOf("scaling_efficiency") > line.indexOf("\"queries\""))
    assert(line.lastIndexOf("scaling_efficiency") > line.indexOf("pipeline_secs_4"))
  }

  test("per-query plausibility flags: fail, low, steal") {
    val times = Seq("a_fail" -> -1.0, "b_low" -> 0.01, "c_stormed" -> 10.0,
      "d_fine" -> 3.2)
    val steal = Seq("c_stormed" -> 40.0, "d_fine" -> 0.2)
    val flags = Bench.queryFlags(times, steal).toMap
    assert(flags == Map("a_fail" -> "fail", "b_low" -> "low",
      "c_stormed" -> "steal"))
    val j = parse(Bench.emitJson("/x", 1, times, Seq.empty, Seq.empty,
      deadlineHit = false, querySteal = steal))
    assert((j \ "queries_flags" \ "b_low") == JString("low"))
    assert((j \ "queries_flags" \ "d_fine") == JNothing)
  }

  test("warn trials parse clean but warn-free medians win") {
    val warn = Bench.parseTrial(
      "TRIAL 4 130.000 0.5 1 3.0 120.0 360.000 warn").get
    assert(warn.clean && warn.flagOrDerived == "warn")
    // one ok + two warn: the ok trial carries the estimate alone
    val r = Bench.ScaleResult(1000, Seq(
      warn, warn.copy(secs = 140.0),
      Bench.Trial(4, 96.0, 0.5, 3, 1.0, 20.0, 350.0, clean = true, flag = "ok")))
    assert(r.secs == 96.0)
    // all-warn: the warn median carries it (better than min-of-attempts)
    val rw = Bench.ScaleResult(1000, Seq(warn, warn.copy(secs = 140.0)))
    assert(rw.secs == 135.0)
  }

  test("a merged clean trial flips a flagged-only config to the clean median") {
    // the third-chance pass appends new trials to the recorded result
    val flagged = Bench.ScaleResult(1000,
      Seq(trial(8, 106.5, 737.9, clean = false)))
    assert(flagged.secs == 106.5) // min-of-attempts fallback
    val merged = flagged.copy(trials =
      flagged.trials ++ Seq(trial(8, 55.2, 380.0, clean = true)))
    assert(merged.secs == 55.2)      // clean median takes over
    assert(merged.minSecs == 55.2)   // and the min updates
    assert(merged.trials.size == 2)  // the stolen attempt stays published
  }

  test("all-warn pair publishes warn medians: the sixteenth-rehearsal shape") {
    // Literal trial lines from the sixteenth full run: neither primary-pair
    // side banked an ok trial, so both estimates come from the warn band
    // (symmetric weather inflation) and the sys-flagged local[4] attempt is
    // excluded from BOTH the wall and (post-rehearsal-19) the CPU estimate.
    val lo = Bench.ScaleResult(640000, Seq(
      Bench.parseTrial("TRIAL 1 408.094 1.299 1 54.4 106.9 397.886 warn").get))
    val hi = Bench.ScaleResult(640000, Seq(
      Bench.parseTrial("TRIAL 4 120.004 0.726 1 32.1 155.7 444.692 sys").get,
      Bench.parseTrial("TRIAL 4 104.232 0.693 2 14.1 70.7 389.378 warn").get))
    assert(hi.secs == 104.232)     // warn median ignores the sys attempt
    assert(hi.minSecs == 104.232)
    assert(hi.cpuSecs == 389.378)  // ...and so does the CPU estimate now
    val Seq(p) = Bench.scalingPairs(Seq(1, 4), Map(1 -> lo, 4 -> hi))
    def r3(x: Double) = math.rint(x * 1000) / 1000
    assert(r3(p.eff) == 0.979)     // published BENCH_r5 rehearsal-16 trio
    assert(r3(p.effMin) == 0.979)
    assert(r3(p.effCpu) == 1.022)  // was 0.954 when the sys CPU leaked in
  }

  test("sys-flagged CPU storms stay out of the CPU estimator: rehearsal 19") {
    // Literal trials from the nineteenth full run: the local[4] side held
    // one clean trial (392 CPU-s) and one sys-storm attempt whose kernel
    // time DOUBLED its recorded CPU (1078 CPU-s — sys time is charged to
    // process threads, so the CPU estimator is NOT storm-immune). The raw
    // all-attempts CPU median (735) published eff_cpu = 0.577 against the
    // lo side's 424; the ladder keeps the clean trial's CPU alone.
    val lo = Bench.ScaleResult(640000, Seq(
      Bench.parseTrial("TRIAL 1 432.399 1.025 1 18.0 112.2 424.306 warn").get))
    val hi = Bench.ScaleResult(640000, Seq(
      Bench.parseTrial("TRIAL 4 105.350 0.817 1 16.0 62.9 392.365 ok").get,
      Bench.parseTrial("TRIAL 4 300.213 10.041 2 155.2 725.3 1077.981 sys").get))
    assert(hi.cpuSecs == 392.365)
    val Seq(p) = Bench.scalingPairs(Seq(1, 4), Map(1 -> lo, 4 -> hi))
    def r3(x: Double) = math.rint(x * 1000) / 1000
    assert(r3(p.effCpu) == 1.081)  // published 0.577 pre-fix
    // all trials flagged: min-of-attempts is the least-contaminated CPU
    val allFlagged = Bench.ScaleResult(640000, Seq(
      Bench.parseTrial("TRIAL 4 300.213 10.041 1 155.2 725.3 1077.981 sys").get,
      Bench.parseTrial("TRIAL 4 250.000 5.000 2 120.0 500.0 800.000 stolen").get))
    assert(allFlagged.cpuSecs == 800.0)
  }

  test("gate pass funds the primary pair first, then the secondary") {
    def res(secs: Double) = Bench.ScaleResult(640000,
      Seq(trial(1, secs, 0.0, clean = true)))
    // primary 1/4 below gate (0.5), secondary 2/8 also below (0.625):
    // the primary is the gate-pass target while it reads < 0.8
    val both = Map(1 -> res(200.0), 4 -> res(100.0),
                   2 -> res(100.0), 8 -> res(40.0))
    val p1 = Bench.nextGatePair(Seq(8, 2, 4, 1), both).get
    assert((p1.lo, p1.hi) == (1, 4))
    // the eighteenth-rehearsal shape: primary cleared (0.942-ish), secondary
    // 0.759 — the pass now moves on to the secondary instead of stopping
    val primaryOk = Map(1 -> res(376.9), 4 -> res(100.0),
                        2 -> res(190.0), 8 -> res(62.6))
    val p2 = Bench.nextGatePair(Seq(8, 2, 4, 1), primaryOk).get
    assert((p2.lo, p2.hi) == (2, 8))
    // both pairs at/above gate: nothing to fund
    val allOk = Map(1 -> res(360.0), 4 -> res(100.0),
                    2 -> res(200.0), 8 -> res(60.0))
    assert(Bench.nextGatePair(Seq(8, 2, 4, 1), allOk).isEmpty)
    // a pair with a missing side never draws gate budget
    assert(Bench.nextGatePair(Seq(8, 2, 4, 1),
      Map(1 -> res(200.0))).isEmpty)
  }

  test("a retry that cannot finish inside its share is skipped, not launched") {
    // the fourteenth rehearsal's doomed launch: est=159 s into a 79 s share
    // (grace 60 s) -> 159*1.3+90 = 296.7 > 139 -> skip
    assert(!Bench.trialFits(159.0, 79.0))
    // a fast retry fits the same share: 30*1.3+90 = 129 < 139
    assert(Bench.trialFits(30.0, 79.0))
    // no estimate yet (first config of a cold matrix): always try
    assert(Bench.trialFits(0.0, 10.0))
    // large budgets scale the grace term: 400*1.3+90 = 610 < 500+125
    assert(Bench.trialFits(400.0, 500.0))
  }
}
