package graft

import java.util.Random

import org.scalatest.funsuite.AnyFunSuite

import graft.core.Methods
import graft.engine.Families
import graft.models.ModelFamily

/** Empirical prediction-interval calibration harness.
  *
  * The engine's universal output contract is the reference's 5-column PI
  * table (TimeSeriesFunctions_GPL_0.5.1.R:99-100): normal-theory 80% and
  * 95% bands off each model's per-step sigma_h. Every other test verifies
  * structure (nesting, widening, bit-stability); this one verifies the
  * bands are statistically RIGHT: on seeded replicates of a known process
  * matched to each family's model class, the held-out future must fall
  * inside the 80% band ~80% of the time and the 95% band ~95% of the time.
  * A sigma mis-scaled by 2x in any family fails here loudly.
  *
  * Everything is seeded (java.util.Random's nextGaussian is specified,
  * platform-stable arithmetic), so measured coverages are deterministic
  * numbers, not flaky samples; they are also recorded in BASELINE.md.
  */
object Calibration {

  final case class Coverage(c80: Double, c95: Double, reps: Int, draws: Int) {
    override def toString: String = f"80%%=$c80%.4f 95%%=$c95%.4f (reps=$reps draws=$draws)"
  }

  /** Simulate `n + h` points of a named process; returns (train, future). */
  def simulate(proc: String, n: Int, h: Int, seed: Long): (Array[Double], Array[Double]) = {
    val r = new Random(seed)
    val total = n + h
    val y = new Array[Double](total)
    proc match {
      case "rw" => // random walk, sigma 1 -> NAIVE's exact model
        var v = 50.0
        var t = 0
        while (t < total) { v += r.nextGaussian(); y(t) = v; t += 1 }
      case "rw_drift" => // random walk with drift 0.3 -> DRIFT's exact model
        var v = 50.0
        var t = 0
        while (t < total) { v += 0.3 + r.nextGaussian(); y(t) = v; t += 1 }
      case "iid" => // iid N(20, 2^2) -> MEANF's exact model
        var t = 0
        while (t < total) { y(t) = 20.0 + 2.0 * r.nextGaussian(); t += 1 }
      case "ann" => // ETS(A,N,N) alpha=0.3 == ARIMA(0,1,1): SES/THETA/ETS class
        var l = 50.0
        var t = 0
        while (t < total) {
          val e = r.nextGaussian()
          y(t) = l + e
          l += 0.3 * e
          t += 1
        }
      case "aan" => // ETS(A,A,N) alpha=0.3 beta=0.08, mild trend -> ETS
        var l = 50.0
        var b = 0.2
        var t = 0
        while (t < total) {
          val e = r.nextGaussian()
          y(t) = l + b + e
          l += b + 0.3 * e
          b += 0.08 * e
          t += 1
        }
      case "aadn" => // damped trend ETS(A,Ad,N) phi=0.85 -> ETSDAMPED
        var l = 50.0
        var b = 0.5
        var t = 0
        while (t < total) {
          val e = r.nextGaussian()
          y(t) = l + 0.85 * b + e
          l += 0.85 * b + 0.3 * e
          b = 0.85 * b + 0.08 * e
          t += 1
        }
      case "ar1" => // y_t = 15 + 0.7 y_{t-1} + eps (mean 50) -> ARIMA
        var v = 50.0
        var t = 0
        while (t < total) { v = 15.0 + 0.7 * v + r.nextGaussian(); y(t) = v; t += 1 }
      case "srw" => // seasonal random walk m=7 -> SNAIVE / forced-D ARIMA
        val m = 7
        val base = Array.tabulate(m)(i => 50.0 + 4.0 * math.sin(2.0 * math.Pi * i / m))
        var t = 0
        while (t < total) {
          y(t) = (if (t < m) base(t) else y(t - m)) + r.nextGaussian()
          t += 1
        }
      case "seasonal_trend" => // trend + stable weekly shape + iid noise -> STL/TBATS/HYBRID
        var t = 0
        while (t < total) {
          y(t) = 50.0 + 0.1 * t +
            5.0 * math.sin(2.0 * math.Pi * t / 7.0) +
            2.0 * math.cos(4.0 * math.Pi * t / 7.0) +
            r.nextGaussian()
          t += 1
        }
      case "intermittent" => // Bernoulli(0.3) demand days, lognormal-ish sizes -> CROSTON/SBA/TSB
        var t = 0
        while (t < total) {
          y(t) = if (r.nextDouble() < 0.3) 5.0 * math.exp(0.4 * r.nextGaussian()) else 0.0
          t += 1
        }
      case other => throw new IllegalArgumentException(s"unknown process: $other")
    }
    (y.take(n), y.drop(n))
  }

  /** Fit `family` on `reps` seeded replicates of `proc`, forecast h, and
    * count how often the held-out future lands inside the 80/95 bands.
    * Replicates are independent (own seed) so they run in parallel.
    */
  def measure(family: ModelFamily, proc: String, m: Int, n: Int, h: Int,
      reps: Int, seed0: Long): Coverage = {
    // pack (in80, in95) into one long per replicate; totals stay far below 2^32
    val packed = java.util.stream.IntStream.range(0, reps).parallel().mapToLong { rep =>
      val (train, future) = simulate(proc, n, h, seed0 + rep.toLong * 1000003L)
      val fc = family.fit(train, m).forecast(h)
      var in80 = 0L
      var in95 = 0L
      var i = 0
      while (i < h) {
        val v = future(i)
        if (v >= fc.lower1(i) && v <= fc.upper1(i)) in80 += 1
        if (v >= fc.lower2(i) && v <= fc.upper2(i)) in95 += 1
        i += 1
      }
      (in80 << 32) | in95
    }.sum()
    val draws = reps * h
    Coverage((packed >>> 32).toDouble / draws, (packed & 0xffffffffL).toDouble / draws, reps, draws)
  }

  /** One calibration scenario: a family fitted on its matched process. */
  final case class Setup(method: String, proc: String, m: Int, n: Int, h: Int, reps: Int,
      lo80: Double = 0.70, hi80: Double = 0.90, lo95: Double = 0.88, hi95: Double = 0.99)

  /** Matched process per deterministic family. Replicate counts are
    * cost-scaled: closed-form fits are free (300+), optimizer-heavy
    * families (TBATS Nelder-Mead state space, HYBRID = 6 components + CV)
    * get fewer replicates x a longer horizon so the indicator count stays
    * statistically meaningful.
    */
  val setups: Seq[Setup] = Seq(
    Setup(Methods.NAIVE, "rw", 1, 150, 6, 300),
    Setup(Methods.DRIFT, "rw_drift", 1, 150, 6, 300),
    Setup(Methods.MEANF, "iid", 1, 150, 6, 300),
    Setup(Methods.SES, "ann", 1, 150, 6, 300),
    Setup(Methods.SNAIVE, "srw", 7, 140, 7, 300),
    Setup(Methods.THETA, "ann", 1, 150, 6, 200),
    Setup(Methods.ETS, "aan", 1, 150, 6, 200),
    Setup(Methods.ETSDAMPED, "aadn", 1, 150, 6, 200),
    Setup(Methods.ARIMA, "ar1", 1, 150, 6, 200),
    Setup(Methods.ARIMA_FORCE_SEASONALITY, "srw", 7, 140, 7, 120),
    Setup(Methods.STL, "seasonal_trend", 7, 140, 7, 120),
    Setup(Methods.TBATS, "seasonal_trend", 7, 98, 7, 60),
    Setup(Methods.HYBRID, "seasonal_trend", 7, 98, 7, 30))

  def runSetup(s: Setup): Coverage =
    measure(Families.byMethod(s.method), s.proc, s.m, s.n, s.h, s.reps, seed0 = 0xCA11B8L + s.method.hashCode)

  /** Coverage of the SPLIT-CONFORMAL bands (`Conformal.closedBands`) for
    * one family on seeded replicates — the distribution-free layer's
    * finite-sample guarantee (coverage ≥ cov under exchangeable scores)
    * measured empirically, exactly as [[measure]] does for the Gaussian
    * bands. */
  def measureConformal(method: String, proc: String, m: Int, n: Int, h: Int,
      reps: Int, seed0: Long): Coverage = {
    val packed = java.util.stream.IntStream.range(0, reps).parallel().mapToLong { rep =>
      val (train, future) = simulate(proc, n, h, seed0 + rep.toLong * 1000003L)
      // fit families run at their PRODUCTION refit budget (origins,
      // slice) from Conformal.FitConfBudget, so the coverage measured
      // here is the coverage the driver gate ships
      val fitBudget = graft.engine.Conformal.FitConfBudget
        .map { case (mm, o, sl) => s"CONFORMAL_$mm" -> ((mm, o, sl)) }.toMap
      val bander: (Array[Double], Int) => Seq[graft.engine.Conformal.ClosedBand] =
        if (method.startsWith("CONFORMAL_CROSTON") || method == "CONFORMAL_SBA" || method == "CONFORMAL_TSB")
          graft.engine.Conformal.intermittentBands
        else if (fitBudget.contains(method))
          (y, hh) => {
            val (mm, o, sl) = fitBudget(method)
            graft.engine.Conformal.fitConformalRows(y, hh, m, mm, o, sl).map(_._1)
          }
        else graft.engine.Conformal.closedBands(_, _, m)
      val bands = bander(train, h)
        .filter(_.method == method)
      var in80 = 0L
      var in95 = 0L
      bands.foreach { b =>
        val v = future(b.step.toInt - 1)
        if (v >= b.lower1 && v <= b.upper1) in80 += 1
        if (v >= b.lower2 && v <= b.upper2) in95 += 1
      }
      (in80 << 32) | in95
    }.sum()
    val draws = reps * h
    Coverage((packed >>> 32).toDouble / draws, (packed & 0xffffffffL).toDouble / draws, reps, draws)
  }

  /** Conformal scenarios: the same matched processes as the Gaussian
    * setups; the conformal guarantee is distribution-free, so coverage
    * must hold HERE too — and a broken score definition (wrong lag,
    * off-by-one origin, mis-ranked quantile) undershoots loudly. */
  val conformalSetups: Seq[(String, String, Int, Int)] = Seq(
    ("CONFORMAL_NAIVE", "rw", 1, 300),
    ("CONFORMAL_DRIFT", "rw_drift", 1, 300),
    ("CONFORMAL_MEANF", "iid", 1, 300),
    ("CONFORMAL_SNAIVE", "srw", 7, 300),
    ("CONFORMAL_SES", "ann", 1, 300),
    ("CONFORMAL_CROSTON", "intermittent", 1, 300),
    ("CONFORMAL_SBA", "intermittent", 1, 300),
    ("CONFORMAL_TSB", "intermittent", 1, 300),
    // fit families pay origins+1 refits per replicate (the rolling-
    // origin scheme), so replicate counts are cost-scaled like the
    // Gaussian setups' optimizer-heavy rows
    ("CONFORMAL_ARIMA", "ar1", 1, 40),
    ("CONFORMAL_ETS", "aan", 1, 60),
    ("CONFORMAL_THETA", "ann", 1, 120),
    // round-13: the remaining seven reference methods join the
    // conformal registry (Conformal.FitConfBudget). Replicate counts
    // are cost-scaled — each replicate pays origins+1 full fits, and
    // BAGGEDETS/HYBRID fits are themselves ensembles; their thinner
    // draw counts are backstopped by the driver-side
    // conformal_coverage_gates, which pools 420 real-corpus trials per
    // method per round
    ("CONFORMAL_ETSDAMPED", "aadn", 1, 60),
    ("CONFORMAL_ARIMA_FORCE_SEASONALITY", "srw", 7, 20),
    ("CONFORMAL_STL", "seasonal_trend", 7, 20),
    ("CONFORMAL_PROPHET", "seasonal_trend", 7, 40),
    // NN needs the larger draw count: at 12 reps (72 draws) the 95%
    // band measured a zero-miss sample — coverage 1.0, above the 0.995
    // ceiling — because misses cluster within a replicate's shared
    // calibration; 28 reps puts the expected miss count near 10
    ("CONFORMAL_NN", "ann", 1, 28),
    ("CONFORMAL_BAGGEDETS", "aan", 1, 8),
    ("CONFORMAL_HYBRID", "seasonal_trend", 7, 4))
}

/** Asserts every deterministic family's empirical 80/95 coverage sits in
  * the documented tolerance (80% band in [0.70, 0.90], 95% in [0.88,
  * 0.99]). Measured values are frozen in BASELINE.md.
  */
class CalibrationSpec extends AnyFunSuite {
  import Calibration._

  for (s <- setups) {
    test(s"${s.method} PI coverage on '${s.proc}' is calibrated") {
      val c = runSetup(s)
      info(s"${s.method}: $c")
      assert(c.c80 >= s.lo80 && c.c80 <= s.hi80,
        s"${s.method} 80% band empirical coverage ${c.c80} outside [${s.lo80}, ${s.hi80}]")
      assert(c.c95 >= s.lo95 && c.c95 <= s.hi95,
        s"${s.method} 95% band empirical coverage ${c.c95} outside [${s.lo95}, ${s.hi95}]")
    }
  }

  for ((method, proc, m, reps) <- conformalSetups) {
    test(s"$method conformal coverage on '$proc' honors the distribution-free guarantee") {
      val c = measureConformal(method, proc, m, n = 150, h = 6, reps = reps,
        seed0 = 0xC0F0A1L + method.hashCode)
      info(s"$method: $c")
      assert(c.c80 >= 0.70 && c.c80 <= 0.92,
        s"$method 80% conformal coverage ${c.c80} outside [0.70, 0.92]")
      assert(c.c95 >= 0.88 && c.c95 <= 0.995,
        s"$method 95% conformal coverage ${c.c95} outside [0.88, 0.995]")
    }
  }
}

/** Prints the full calibration table (for BASELINE.md):
  * `sbt "Test/runMain graft.CalibrationReport"`. */
object CalibrationReport {
  import Calibration._
  def main(args: Array[String]): Unit = {
    println(f"${"method"}%-26s ${"process"}%-15s ${"n"}%5s ${"h"}%3s ${"reps"}%5s ${"cov80"}%8s ${"cov95"}%8s")
    for (s <- setups) {
      val t0 = System.nanoTime()
      val c = runSetup(s)
      val secs = (System.nanoTime() - t0) / 1e9
      println(f"${s.method}%-26s ${s.proc}%-15s ${s.n}%5d ${s.h}%3d ${s.reps}%5d ${c.c80}%8.4f ${c.c95}%8.4f  (${secs}%.1f s)")
    }
  }
}
