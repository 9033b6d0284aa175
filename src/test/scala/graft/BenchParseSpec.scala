package graft

import org.scalatest.funsuite.AnyFunSuite

/** Pins the baseline-section parser Bench uses for the regression gate.
  * Round-6 verdict flagged the old parser (regex over `indexOf('}')`) as
  * brittle: any nesting or a brace inside a string would silently
  * truncate the section and mis-gate every query after the cut. The
  * parser is now brace-balanced and quote-aware; these cases pin it. */
class BenchParseSpec extends AnyFunSuite {

  test("flat numeric section parses") {
    val txt = """{"metric":"total","queries":{"q_a":1.5,"q_b":0.25,"q_c":3e-2},"x":1}"""
    assert(Bench.section(txt, "queries") ===
      Map("q_a" -> 1.5, "q_b" -> 0.25, "q_c" -> 0.03))
  }

  test("missing key returns empty") {
    assert(Bench.section("""{"queries":{"q_a":1}}""", "queries_warm").isEmpty)
  }

  test("a brace inside a string elsewhere cannot truncate the section") {
    // rebase_log reasons are free text and may contain '}' — the old
    // indexOf('}') scan would have cut "queries" at that brace if the
    // log preceded it.
    val txt = """{"rebase_log":[{"reason":"window -> rank {by design}"}],""" +
      """"queries":{"q_a":1.0,"q_b":2.0}}"""
    assert(Bench.section(txt, "queries") === Map("q_a" -> 1.0, "q_b" -> 2.0))
  }

  test("a quoted brace INSIDE the section does not end it early") {
    val txt = """{"queries":{"q_a":1.0,"note":"has } brace","q_b":2.0}}"""
    val m = Bench.section(txt, "queries")
    assert(m("q_a") === 1.0 && m("q_b") === 2.0)
  }

  test("escaped quote inside a string is handled") {
    val txt = """{"queries":{"q_a":1.0,"note":"a \" quote } here","q_b":2.0}}"""
    val m = Bench.section(txt, "queries")
    assert(m("q_a") === 1.0 && m("q_b") === 2.0)
  }

  test("pretty-printed baseline (spaces/newlines after colons) still parses") {
    val txt = "{\n  \"queries\": {\n    \"q_a\": 1.0,\n    \"q_b\": 2.0\n  }\n}"
    assert(Bench.section(txt, "queries") === Map("q_a" -> 1.0, "q_b" -> 2.0))
  }

  test("torn (unterminated) section is treated as absent, not partial") {
    // A truncated baseline must not gate against a partial map — absent
    // baselines skip the gate entirely, which is the safe failure mode.
    val txt = """{"queries":{"q_a":1.0,"q_b":2."""
    assert(Bench.section(txt, "queries").isEmpty)
  }

  test("nested object inside the section does not truncate the outer map or leak inner keys") {
    val txt = """{"queries":{"q_a":1.0,"meta":{"inner":9.0},"q_b":2.0},"z":0}"""
    val m = Bench.section(txt, "queries")
    assert(m("q_a") === 1.0 && m("q_b") === 2.0)
    assert(!m.contains("inner"),
      "nested keys must not surface as phantom baseline entries")
    assert(m.size == 2)
  }

  test("gate kinds: dual, severe warm-only, and clean partition correctly") {
    // dual: both cold and warm past 1.5x with real warm delta
    assert(Bench.gateKind(cold = 3.0, warm = 3.0, oc = 1.0, ow = 1.0, 1.0, 1.0)
      .contains("dual"))
    // severe warm-only: warm 4x with cold at baseline
    assert(Bench.gateKind(cold = 1.0, warm = 4.0, oc = 1.0, ow = 1.0, 1.0, 1.0)
      .contains("severe_warm"))
    // clean: warm up but under the delta floor
    assert(Bench.gateKind(cold = 0.2, warm = 0.3, oc = 0.1, ow = 0.1, 1.0, 1.0)
      .isEmpty)
    // missing baseline (non-positive) never flags
    assert(Bench.gateKind(cold = 9.0, warm = 9.0, oc = 0.0, ow = 1.0, 1.0, 1.0)
      .isEmpty)
  }

  test("real baseline file parses and sections agree on keys") {
    val p = java.nio.file.Paths.get("bench_baseline.json")
    if (java.nio.file.Files.exists(p)) {
      val txt = java.nio.file.Files.readString(p)
      val cold = Bench.section(txt, "queries")
      val warm = Bench.section(txt, "queries_warm")
      assert(cold.nonEmpty && warm.nonEmpty)
      assert(cold.keySet === warm.keySet)
      assert(cold.values.forall(_ > 0))
    }
  }

  test("adjudicate: only a clean-box rerun breach confirms a regression") {
    val cpus = 32
    val quietExt = 0.5
    val loadedExt = 0.2 * cpus + 1
    // rerun cleared the gate -> noise, whatever the box looked like
    assert(Bench.adjudicate(rerunBreach = false, quietExt, 1.0, cpus) === "noise")
    assert(Bench.adjudicate(rerunBreach = false, loadedExt, 9.0, cpus) === "noise")
    // rerun breached on a quiet box -> the one confirmable case
    assert(Bench.adjudicate(rerunBreach = true, quietExt, 1.0, cpus) === "real")
    assert(Bench.adjudicate(rerunBreach = true, 0.2 * cpus, 1.0, cpus) === "real")
    // rerun breached under measured external pressure -> the round-8
    // phantom case: load noise with evidence, NOT a regression
    assert(Bench.adjudicate(rerunBreach = true, loadedExt, 1.0, cpus)
      === "contended_noise")
    assert(Bench.adjudicate(rerunBreach = true, 20.0 * cpus, 1.0, cpus)
      === "contended_noise")
    // the /proc measure DECIDES when available: a probe factor inflated
    // by our own GC cannot veto a quiet external measure (the round-9
    // self-inflation fix), and vice versa a quiet probe cannot launder
    // measured external load
    assert(Bench.adjudicate(rerunBreach = true, quietExt, 5.0, cpus) === "real")
    assert(Bench.adjudicate(rerunBreach = true, loadedExt,
      Bench.CalibContendedFactor - 0.1, cpus) === "contended_noise")
    // /proc unavailable (-1): fall back to the probe factor
    assert(Bench.adjudicate(rerunBreach = true, -1.0, 1.0, cpus) === "real")
    assert(Bench.adjudicate(rerunBreach = true, -1.0,
      Bench.CalibContendedFactor + 0.01, cpus) === "contended_noise")
  }

  test("extCores: /proc-delta external CPU attributes self vs other") {
    // synthetic jiffy tuples: 10s window on a 100 Hz clock; the box
    // burned 5000 busy jiffies of which we burned 3000 -> 2 ext cores
    assert(Bench.extCores((1000L, 500L), (6000L, 3500L), 10.0) === 2.0)
    // everything was us -> zero external
    assert(Bench.extCores((1000L, 500L), (6000L, 5500L), 10.0) === 0.0)
    // clock skew can make self exceed total busy; clamp at zero
    assert(Bench.extCores((1000L, 500L), (2000L, 2500L), 10.0) === 0.0)
    // unmeasurable inputs propagate as -1 (fallback to the probe)
    assert(Bench.extCores((-1L, -1L), (6000L, 3500L), 10.0) === -1.0)
    assert(Bench.extCores((1000L, 500L), (6000L, 3500L), 0.0) === -1.0)
    // the live reader returns plausible values on this (Linux) box
    val (busy, self) = Bench.jiffies()
    assert(busy > 0 && self > 0 && self <= busy)
  }

  test("extCores ignores own-JVM load (the GC self-inflation fix) but sees other processes") {
    val cpus = Runtime.getRuntime.availableProcessors()
    def window(sec: Double)(body: => Unit): Double = {
      val j0 = Bench.jiffies()
      val t0 = System.nanoTime()
      body
      Thread.sleep(math.max(0L, (sec * 1000).toLong -
        (System.nanoTime() - t0) / 1000000L))
      Bench.extCores(j0, Bench.jiffies(), (System.nanoTime() - t0) / 1e9)
    }
    // own-JVM busy threads (standing in for our GC workers) are SELF:
    // the external measure must stay quiet — exactly where the spin
    // probe self-inflates
    val stop = new java.util.concurrent.atomic.AtomicBoolean(false)
    val busy = (0 until cpus).map { t =>
      val th = new Thread(() => {
        var h = t.toLong
        while (!stop.get()) { h = h * 6364136223846793005L + 1442695040888963407L }
        if (h == 42L) System.err.print("")
      })
      th.setDaemon(true); th.start(); th
    }
    val selfLoaded =
      try window(1.0) {} finally { stop.set(true); busy.foreach(_.join(1000)) }
    assert(selfLoaded >= 0 && !Bench.extContended(selfLoaded, cpus),
      f"own-JVM load must not read as external contention (got $selfLoaded%.1f cores)")
    // a genuinely external busy process IS seen (spawned, then killed)
    val procs = (0 until math.min(8, cpus)).map { _ =>
      new ProcessBuilder("sh", "-c", "while : ; do : ; done").start()
    }
    val extLoaded = try window(1.5) {} finally procs.foreach(_.destroyForcibly())
    assert(extLoaded > math.min(8, cpus) * 0.5,
      f"external busy-loops must register (got $extLoaded%.1f cores)")
  }

  test("calibration probe measures external CPU pressure") {
    val cpus = Runtime.getRuntime.availableProcessors()
    // idle reference: best of three (first run also JIT-warms the loop)
    val ref = Seq.fill(3)(Bench.calibProbe(cpus)).min
    assert(ref > 0)
    // deliberate contention: 2x-cores busy-loop threads while probing.
    // With 3x cores runnable the probe must take >= ~3x; assert a loose
    // 1.5x so the pin survives scheduler variance on a shared test box.
    val stop = new java.util.concurrent.atomic.AtomicBoolean(false)
    val busy = (0 until 2 * cpus).map { t =>
      val th = new Thread(() => {
        var h = t.toLong
        while (!stop.get()) { h = h * 6364136223846793005L + 1442695040888963407L }
        if (h == 42L) System.err.print("")
      })
      th.setDaemon(true); th.start(); th
    }
    try {
      val contendedTime = Bench.calibProbe(cpus)
      assert(contendedTime / ref > 1.5,
        f"probe under 3x-subscription measured only ${contendedTime / ref}%.2fx inflation")
      assert(contendedTime / ref > Bench.CalibContendedFactor,
        "a deliberately loaded box must cross the contended threshold")
    } finally { stop.set(true); busy.foreach(_.join(1000)) }
  }
}
