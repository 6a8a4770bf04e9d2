package graft

import org.scalatest.funsuite.AnyFunSuite

import graft.core.{Forecasts, Methods}
import graft.engine.Families
import graft.models._

/** Per-family unit tests against hand-computable fixtures plus the flist
  * contract invariants (SURVEY.md §5.2/§5.3). Pure JVM — each fit runs
  * exactly as it would inside one executor task.
  */
class ModelFamiliesSpec extends AnyFunSuite {

  private val H = 14

  private def linear(n: Int, a: Double, b: Double, noise: Double = 0.0, seed: Long = 7): Array[Double] = {
    val rng = new java.util.Random(seed)
    Array.tabulate(n)(i => a + b * i + noise * rng.nextGaussian())
  }

  private def seasonal(n: Int, m: Int, amp: Double, base: Double): Array[Double] =
    Array.tabulate(n)(i => base + amp * math.sin(2 * math.Pi * (i % m) / m))

  private def checkContract(f: Forecasts, h: Int): Unit = {
    assert(f.length == h)
    (0 until h).foreach { j =>
      assert(f.lower2(j) <= f.lower1(j) + 1e-9, s"95 lower above 80 lower at $j")
      assert(f.lower1(j) <= f.mean(j) + 1e-9)
      assert(f.mean(j) <= f.upper1(j) + 1e-9)
      assert(f.upper1(j) <= f.upper2(j) + 1e-9)
      assert(java.lang.Double.isFinite(f.mean(j)))
    }
  }

  // ------------------------------------------------------------ ETS

  test("ETS on a constant series forecasts the constant") {
    val y = Array.fill(60)(5.0)
    val f = Ets.EtsFamily.fit(y, 1).forecast(H)
    checkContract(f, H)
    f.mean.foreach(v => assert(math.abs(v - 5.0) < 1e-6))
  }

  test("ETS recovers a linear trend (AAN-type forecast continues the slope)") {
    val y = linear(80, 10.0, 2.0, noise = 0.1)
    val f = Ets.EtsFamily.fit(y, 1).forecast(H)
    checkContract(f, H)
    val expected1 = 10.0 + 2.0 * 80
    val expectedH = 10.0 + 2.0 * (80 + H - 1)
    assert(math.abs(f.mean(0) - expected1) < 2.0, s"step1 ${f.mean(0)} vs $expected1")
    assert(math.abs(f.mean(H - 1) - expectedH) < 4.0, s"stepH ${f.mean(H - 1)} vs $expectedH")
  }

  test("ETS picks a seasonal class on strongly seasonal data and tracks the cycle") {
    val m = 7
    val y = seasonal(70, m, amp = 3.0, base = 20.0)
    val fit = Ets.fitAuto(y, m, Some(false)).get
    val f = Ets.forecast(fit, H)
    checkContract(f, H)
    // forecast at step j should be close to the seasonal pattern value
    (0 until H).foreach { j =>
      val expected = 20.0 + 3.0 * math.sin(2 * math.Pi * ((70 + j) % m) / m)
      assert(math.abs(f.mean(j) - expected) < 1.5, s"step ${j + 1}: ${f.mean(j)} vs $expected")
    }
  }

  test("ETSDAMPED uses a damped-trend class") {
    val y = linear(80, 5.0, 1.0, noise = 0.2)
    val model = Ets.EtsDampedFamily.fit(y, 1).asInstanceOf[Ets.EtsModel]
    assert(model.fitted.spec.damped)
    checkContract(model.forecast(H), H)
  }

  test("ETS params round-trip through the model store format") {
    val y = seasonal(70, 7, 2.0, 15.0)
    val model = Ets.EtsFamily.fit(y, 7)
    val restored = Ets.EtsFamily.fromParams(model.params)
    val a = model.forecast(H); val b = restored.forecast(H)
    (0 until H).foreach(j => assert(math.abs(a.mean(j) - b.mean(j)) < 1e-12))
  }

  // ------------------------------------------------------------ Theta

  test("Theta on a clean linear series drifts at about half the slope") {
    val y = linear(100, 0.0, 1.0)
    val f = Theta.ThetaFamily.fit(y, 1).forecast(H)
    checkContract(f, H)
    // successive increments ≈ slope/2 = 0.5
    val incr = (1 until H).map(j => f.mean(j) - f.mean(j - 1))
    incr.foreach(d => assert(math.abs(d - 0.5) < 0.1, s"drift increment $d"))
  }

  test("Theta seasonality test fires on periodic data and reseasonalizes") {
    val m = 7
    val y = Array.tabulate(84)(i => 100.0 * (1.0 + 0.3 * math.sin(2 * math.Pi * (i % m) / m)))
    assert(Theta.isSeasonal(y, m))
    val f = Theta.ThetaFamily.fit(y, m).forecast(H)
    checkContract(f, H)
    (0 until H).foreach { j =>
      val expected = 100.0 * (1.0 + 0.3 * math.sin(2 * math.Pi * ((84 + j) % m) / m))
      assert(math.abs(f.mean(j) - expected) / expected < 0.05)
    }
  }

  // ------------------------------------------------------------ STL

  test("STL decomposition separates trend and seasonal on a synthetic series") {
    val m = 7
    val n = 140
    val y = Array.tabulate(n)(i => 0.5 * i + 10.0 * math.sin(2 * math.Pi * (i % m) / m))
    val dec = Stl.decompose(y, m)
    // remainder should be small relative to the signal
    val remRms = math.sqrt(dec.remainder.map(r => r * r).sum / n)
    assert(remRms < 1.0, s"remainder RMS $remRms")
    // interior trend slope ≈ 0.5/step
    val mid = dec.trend.slice(30, n - 30)
    val slope = (mid.last - mid.head) / (mid.length - 1)
    assert(math.abs(slope - 0.5) < 0.1, s"trend slope $slope")
  }

  test("STL forecast re-adds the last seasonal cycle") {
    val m = 7
    val y = Array.tabulate(140)(i => 50.0 + 10.0 * math.sin(2 * math.Pi * (i % m) / m))
    val f = Stl.StlFamily.fit(y, m).forecast(H)
    checkContract(f, H)
    (0 until H).foreach { j =>
      val expected = 50.0 + 10.0 * math.sin(2 * math.Pi * ((140 + j) % m) / m)
      assert(math.abs(f.mean(j) - expected) < 2.0, s"step ${j + 1}: ${f.mean(j)} vs $expected")
    }
  }

  // ------------------------------------------------------------ ARIMA

  test("KPSS-based d selection: white noise → 0, random walk → ≥1") {
    val rng = new java.util.Random(11)
    val wn = Array.fill(300)(rng.nextGaussian())
    assert(Arima.selectD(wn) == 0)
    val rw = new Array[Double](300)
    var acc = 0.0
    (0 until 300).foreach { i => acc += rng.nextGaussian(); rw(i) = acc }
    assert(Arima.selectD(rw) >= 1)
  }

  test("ARIMA recovers an AR(1) coefficient") {
    val rng = new java.util.Random(23)
    val phi = 0.7
    val y = new Array[Double](400)
    (1 until 400).foreach(i => y(i) = phi * y(i - 1) + rng.nextGaussian())
    val (z, _, _) = Arima.difference(y, 0, 0, 1)
    val fit = Arima.fitCandidate(z, Arima.Order(1, 0, 0, 0, 0, 0, mean = true), 1).get
    assert(math.abs(fit.arReg(0) - phi) < 0.1, s"phi ${fit.arReg(0)}")
  }

  test("ARIMA auto fit on a drifting random walk produces finite, widening bands") {
    val rng = new java.util.Random(5)
    val y = new Array[Double](250)
    var acc = 100.0
    (0 until 250).foreach { i => acc += 0.5 + rng.nextGaussian() * 0.5; y(i) = acc }
    val model = Arima.ArimaFamily.fit(y, 1)
    val f = model.forecast(H)
    checkContract(f, H)
    val w1 = f.upper2(0) - f.lower2(0)
    val wH = f.upper2(H - 1) - f.lower2(H - 1)
    assert(wH > w1, "interval width must grow with horizon for integrated models")
  }

  test("ARIMA params round-trip") {
    val rng = new java.util.Random(31)
    val y = Array.tabulate(200)(i => 10.0 + 0.3 * i + rng.nextGaussian())
    val model = Arima.ArimaFamily.fit(y, 1).asInstanceOf[Arima.ArimaModel]
    val restored = Arima.fromParams(model.params)
    val a = model.forecast(H); val b = restored.forecast(H)
    (0 until H).foreach(j => assert(math.abs(a.mean(j) - b.mean(j)) < 1e-12))
  }

  test("Kalman exact likelihood matches the closed form on white noise") {
    val rng = new java.util.Random(5)
    val z = Array.fill(200)(rng.nextGaussian())
    val (negTwoLl, sigma2) = KalmanMl.exactNegLogLik(z, 0.0, Array(1.0), Array(1.0))
    val s2 = z.map(v => v * v).sum / z.length
    val expected = z.length * (math.log(2 * math.Pi) + math.log(s2) + 1.0)
    assert(math.abs(sigma2 - s2) < 1e-12)
    assert(math.abs(negTwoLl - expected) < 1e-9, s"$negTwoLl vs $expected")
  }

  test("coefToPacf inverts pacfToCoef for stationary AR polynomials") {
    val pacf = Array(0.6, -0.3, 0.2)
    val coef = Arima.pacfToCoef(pacf)
    val back = KalmanMl.coefToPacf(coef)
    pacf.zip(back).foreach { case (a, b) => assert(math.abs(a - b) < 1e-12, s"$a vs $b") }
  }

  test("Kalman exact likelihood equals the brute-force covariance likelihood") {
    // O(n³) reference: ψ-weight autocovariances → Toeplitz Σ → Cholesky
    def bruteNegTwoLl(z: Array[Double], mu: Double, arFull: Array[Double], maFull: Array[Double]): Double = {
      val n = z.length
      val p = arFull.length - 1; val q = maFull.length - 1
      val nPsi = 2000
      val psi = new Array[Double](nPsi)
      psi(0) = 1.0
      for (j <- 1 until nPsi) {
        var acc = if (j <= q) maFull(j) else 0.0
        for (i <- 1 to math.min(j, p)) acc -= arFull(i) * psi(j - i)
        psi(j) = acc
      }
      def gamma(k: Int): Double =
        (0 until nPsi - k).foldLeft(0.0)((s, j) => s + psi(j) * psi(j + k))
      val sig = Array.tabulate(n, n)((i, j) => gamma(math.abs(i - j)))
      val chol = Array.fill(n)(new Array[Double](n))
      for (i <- 0 until n; j <- 0 to i) {
        var s = sig(i)(j)
        for (k <- 0 until j) s -= chol(i)(k) * chol(j)(k)
        if (i == j) chol(i)(i) = math.sqrt(s) else chol(i)(j) = s / chol(j)(j)
      }
      val logDet = (0 until n).map(i => 2.0 * math.log(chol(i)(i))).sum
      val w = new Array[Double](n)
      for (i <- 0 until n) {
        var s = z(i) - mu
        for (k <- 0 until i) s -= chol(i)(k) * w(k)
        w(i) = s / chol(i)(i)
      }
      val s2 = w.map(v => v * v).sum / n
      n * math.log(2 * math.Pi) + n * math.log(s2) + logDet + n
    }
    val rng = new java.util.Random(3)
    val z = Array.fill(60)(rng.nextGaussian())
    val configs = Seq(
      (Array(1.0, -0.7), Array(1.0)),
      (Array(1.0, -0.5, 0.2), Array(1.0)),
      (Array(1.0), Array(1.0, 0.6)),
      (Array(1.0, -0.6), Array(1.0, 0.4)),
      (Array(1.0, -0.4, 0.1, -0.05), Array(1.0, 0.3, -0.2)))
    configs.foreach { case (ar, ma) =>
      val kal = KalmanMl.exactNegLogLik(z, 0.1, ar, ma)
      val brute = bruteNegTwoLl(z, 0.1, ar, ma)
      assert(math.abs(kal._1 - brute) < 1e-8,
        s"ar=${ar.mkString(",")} ma=${ma.mkString(",")}: ${kal._1} vs $brute")
    }
  }

  test("exact-ML refinement recovers the AR(1) coefficient from the CSS warm start") {
    val rng = new java.util.Random(42)
    val y = new Array[Double](300)
    var prev = 0.0
    (0 until 300).foreach { i => prev = 0.7 * prev + rng.nextGaussian(); y(i) = prev }
    val (z, _, _) = Arima.difference(y, 0, 0, 1)
    val css = Arima.fitCandidate(z, Arima.Order(1, 0, 0, 0, 0, 0, mean = true), 1).get
    val ml = Arima.fitCandidateExact(z, css, 1).get
    assert(math.abs(ml.arReg(0) - 0.7) < 0.1, s"phi ${ml.arReg(0)}")
    // the refinement must not worsen the exact likelihood vs the CSS coefs
    def ll(c: Arima.CandidateFit) = KalmanMl.exactNegLogLik(z, c.mu,
      Arima.expand(c.arReg, c.arSeas, 1),
      Arima.expand(c.maReg.map(-(_: Double)), c.maSeas.map(-(_: Double)), 1))._1
    assert(ll(ml) <= ll(css) + 1e-6)
  }

  test("exact-ML rescoring: random walk keeps d=1 and beats ARIMA(0,1,0) on its own criterion") {
    val rng = new java.util.Random(9)
    val y = new Array[Double](250)
    var acc = 0.0
    (0 until 250).foreach { i => acc += rng.nextGaussian(); y(i) = acc }
    val model = Arima.fitAuto(y, 1, forceSeasonal = false, Methods.ARIMA)
    assert(model.fit.order.d == 1, "KPSS must difference a random walk")
    // selection coherence: the winner's exact AICc is at least as good as
    // the null ARIMA(0,1,0)'s (which the grid must now contain)
    val (z, _, _) = Arima.difference(y, 1, 0, 1)
    val nullCss = Arima.fitCandidate(z, Arima.Order(0, 1, 0, 0, 0, 0, mean = false), 1).get
    val nullMl = Arima.fitCandidateExact(z, nullCss, 1).get
    assert(model.fit.aicc <= nullMl.aicc + 1e-9,
      s"winner ${model.fit.order} aicc ${model.fit.aicc} vs null ${nullMl.aicc}")
    checkContract(model.forecast(H), H)
  }

  test("rescore set always includes the lowest-complexity candidates") {
    val rng = new java.util.Random(4)
    val z = Array.fill(150)(rng.nextGaussian())
    val cands = Arima.candidateOrders(0, 0, 1, seasonal = false)
      .flatMap(o => Arima.fitCandidate(z, o, 1))
    val set = Arima.rescoreSet(cands)
    val minK = cands.map(_.order.k).min
    assert(set.exists(_.order.k == minK), "parsimonious candidate missing from rescore set")
    assert(set.size <= KalmanMl.RescoreTop + 3)
  }

  test("ARIMA_FORCE_SEASONALITY forces the seasonal difference and continues the pattern") {
    val m = 7
    val y = Array.tabulate(100)(i => 10.0 + (i % m) + 0.01 * i)
    val model = Arima.ArimaForceSeasonalFamily.fit(y, m).asInstanceOf[Arima.ArimaModel]
    assert(model.fit.order.bigD == 1)
    val f = model.forecast(H)
    checkContract(f, H)
    // deterministic seasonal ramp: seasonal difference is the constant
    // 0.01·m, so the forecast must track pattern + drift closely
    (0 until H).foreach { j =>
      val i = 100 + j
      val expected = 10.0 + (i % m) + 0.01 * i
      assert(math.abs(f.mean(j) - expected) < 0.35, s"step ${j + 1}: ${f.mean(j)} vs $expected")
    }
  }

  // ------------------------------------------------------------ Prophet

  test("ProphetLite recovers a weekly pattern over a linear trend") {
    val n = 200
    val days = Array.tabulate(n)(identity)
    val y = Array.tabulate(n)(d => 100.0 + 0.5 * d + 10.0 * math.sin(2 * math.Pi * (d % 7) / 7.0))
    val model = ProphetLite.fitDated(days, y)
    val f = model.forecast(H)
    checkContract(f, H)
    assert(f.lower1(0) == f.lower2(0) && f.upper1(0) == f.upper2(0),
      "Prophet duplicates its single band (R:381-382)")
    (0 until H).foreach { j =>
      val d = n + j
      val expected = 100.0 + 0.5 * d + 10.0 * math.sin(2 * math.Pi * (d % 7) / 7.0)
      assert(math.abs(f.mean(j) - expected) < 5.0, s"day $d: ${f.mean(j)} vs $expected")
    }
  }

  test("ProphetLite piecewise trend bends at a changepoint") {
    val n = 300
    val days = Array.tabulate(n)(identity)
    val y = Array.tabulate(n)(d => if (d < 150) 1.0 * d else 150.0 + 3.0 * (d - 150))
    val model = ProphetLite.fitDated(days, y)
    // forecast continues the POST-break slope (~3/day)
    val f = model.forecast(H)
    val slope = (f.mean(H - 1) - f.mean(0)) / (H - 1)
    assert(math.abs(slope - 3.0) < 0.5, s"extrapolated slope $slope")
  }

  test("ProphetLite intervals widen with horizon (trend-changepoint simulation)") {
    val n = 300
    val rng = new java.util.Random(17)
    val days = Array.tabulate(n)(identity)
    val y = Array.tabulate(n)(dd => 50.0 + 0.4 * dd + 3.0 * math.sin(2 * math.Pi * (dd % 7) / 7.0)
      + rng.nextGaussian())
    val model = ProphetLite.fitDated(days, y)
    val f = model.forecast(60)
    checkContract(f, 60)
    val w1 = f.upper1(0) - f.lower1(0)
    val w60 = f.upper1(59) - f.lower1(59)
    assert(w60 > w1, s"band must widen: $w1 → $w60")
    assert(f.lower1(10) == f.lower2(10) && f.upper1(10) == f.upper2(10), "single band duplicated")
    val again = model.forecast(60)
    assert(f.lower1.sameElements(again.lower1), "seeded simulation must be reproducible")
  }

  test("ProphetLite params round-trip") {
    val days = Array.tabulate(120)(identity)
    val y = Array.tabulate(120)(d => 10.0 + d * 0.2 + math.sin(d / 3.0))
    val model = ProphetLite.fitDated(days, y)
    val restored = ProphetLite.fromParams(model.params)
    val a = model.forecast(H); val b = restored.forecast(H)
    (0 until H).foreach(j => assert(math.abs(a.mean(j) - b.mean(j)) < 1e-12))
  }

  // ------------------------------------------------------------ NN

  test("NN fit is deterministic and respects the contract") {
    val rng = new java.util.Random(99)
    val y = new Array[Double](150)
    (1 until 150).foreach(i => y(i) = 0.8 * y(i - 1) + rng.nextGaussian() * 0.3)
    val f1 = NNar.NNFamily.fit(y, 1).forecast(H)
    val f2 = NNar.NNFamily.fit(y, 1).forecast(H)
    checkContract(f1, H)
    (0 until H).foreach { j =>
      assert(f1.mean(j) == f2.mean(j), "seeded NN must be bit-reproducible")
      assert(f1.lower1(j) == f2.lower1(j))
    }
  }

  test("NN tracks a strong AR(1) signal one step ahead") {
    val rng = new java.util.Random(42)
    val y = new Array[Double](300)
    y(0) = 5.0
    (1 until 300).foreach(i => y(i) = 0.95 * y(i - 1) + rng.nextGaussian() * 0.1)
    val f = NNar.NNFamily.fit(y, 1).forecast(1)
    assert(math.abs(f.mean(0) - 0.95 * y(299)) < 1.0, s"${f.mean(0)} vs ${0.95 * y(299)}")
  }

  // ------------------------------------------------------------ Bagged

  test("BaggedETS: replicate 0 is the original; ensemble band is min/max; deterministic") {
    val m = 7
    val y = Array.tabulate(84)(i => 30.0 + 5.0 * math.sin(2 * math.Pi * (i % m) / m) + 0.1 * i)
    val reps = Bagged.replicates(y, m, 10)
    assert(reps(0).sameElements(y))
    assert(Bagged.replicates(y, m, 10)(3).sameElements(reps(3)), "seeded bootstrap must repeat")
    val model = Bagged.BaggedFamily.fitN(y, m, 10)
    val f = model.forecast(H)
    checkContract(f, H)
    (0 until H).foreach { j =>
      assert(f.lower1(j) == f.lower2(j) && f.upper1(j) == f.upper2(j),
        "bagged duplicates its single band (R:216-217)")
    }
  }

  // ------------------------------------------------------------ Hybrid

  test("Hybrid weights are a convex combination and forecast honors the contract") {
    val m = 7
    val rng = new java.util.Random(3)
    val y = Array.tabulate(120)(i =>
      50.0 + 0.2 * i + 4.0 * math.sin(2 * math.Pi * (i % m) / m) + rng.nextGaussian() * 0.5)
    val model = Hybrid.HybridFamily.fitCv(y, m, cvHorizon = 10)
    val wSum = model.weights.values.sum
    assert(math.abs(wSum - 1.0) < 1e-9, s"weights sum $wSum")
    model.weights.values.foreach(w => assert(w >= 0))
    assert(model.weights.keySet == Hybrid.Components.toSet)
    checkContract(model.forecast(H), H)
  }

  test("Hybrid CV fold plan is rolling-origin: h+1 step-1 folds (R:326-328)") {
    // length-100 fixture, cvHorizon=10: windowSize = 100 − 2·10 = 80,
    // origins advance one observation per fold (cvts rolling semantics),
    // giving 11 folds — well past the 2 non-overlapping windows the old
    // scheme evaluated, and ≥3 as the verdict's done-criterion demands.
    val (h, origins) = Hybrid.cvPlan(n = 100, m = 7, cvHorizon = 10)
    assert(h == 10)
    assert(origins == (80 to 90), s"origins $origins")
    assert(origins.size == h + 1 && origins.size >= 3)
    assert(origins.step == 1, "folds must slide one origin at a time")
    // every fold trains on ≥ windowSize points and holds out exactly h
    origins.foreach(o => assert(o >= 80 && o + h <= 100))

    // weights on the same fixture actually come from that multi-fold plan:
    // distinct components ⇒ distinct pooled RMSE ⇒ non-uniform weights
    val m = 7
    val rng = new java.util.Random(5)
    val y = Array.tabulate(100)(i =>
      50.0 + 0.2 * i + 4.0 * math.sin(2 * math.Pi * (i % m) / m) + rng.nextGaussian() * 0.5)
    val w = Hybrid.HybridFamily.fitCv(y, m, cvHorizon = 10).weights
    assert(math.abs(w.values.sum - 1.0) < 1e-9)
    assert(w.values.max - w.values.min > 1e-6,
      "CV-informed weights should not collapse to the equal-weight fallback")

    // too-short series: empty plan ⇒ callers fall back to equal weights
    val (_, none) = Hybrid.cvPlan(n = 20, m = 7, cvHorizon = 10)
    assert(none.isEmpty)
  }

  // ------------------------------------------------------------ TBATS

  test("TBATS recovers a trigonometric weekly cycle over a trend") {
    val m = 7
    val rng = new java.util.Random(11)
    val y = Array.tabulate(140)(i =>
      30.0 + 0.1 * i + 5.0 * math.sin(2 * math.Pi * i / m) + rng.nextGaussian() * 0.2)
    val fit = Tbats.fitAuto(y, m).get
    assert(fit.cfg.k >= 1, "seasonal harmonics must be selected")
    val f = Tbats.forecast(fit, H)
    checkContract(f, H)
    (0 until H).foreach { j =>
      val t = 140 + j
      val expected = 30.0 + 0.1 * t + 5.0 * math.sin(2 * math.Pi * t / m)
      assert(math.abs(f.mean(j) - expected) < 1.5,
        s"step ${j + 1}: ${f.mean(j)} vs $expected")
    }
  }

  test("TBATS stepwise ARMA escalation reaches a second-order error model") {
    // level + ARMA(2,1) innovations with complex AR roots (pseudo-cyclic
    // error autocorrelation) — a structure ARMA(1,1) cannot represent,
    // so the stepwise (p,q) escalation must push past the old (1,1) cap
    val rng = new java.util.Random(7L)
    val n = 300
    val y = new Array[Double](n)
    var d1 = 0.0; var d2 = 0.0; var ePrev = 0.0
    var i = 0
    while (i < n) {
      val e = rng.nextGaussian()
      val d = 0.6 * d1 - 0.5 * d2 + 0.4 * ePrev + e
      y(i) = 50.0 + d
      d2 = d1; d1 = d; ePrev = e
      i += 1
    }
    val fit = Tbats.fitAuto(y, 1).get
    // the stepwise search must escalate past the (1,1) seeds; on this
    // draw AICc selects p=3 under the round-8 MaxArmaOrder=3 cap
    // (mild AICc overfit of the true order 2 — the point is that the
    // escalation path reaches high-order error structure at all, and
    // that the old (2,2) ceiling no longer binds)
    assert(fit.cfg.p >= 2,
      s"ARMA(2,1)-error series selected cfg ${fit.cfg} — second AR lag not reached")
    assert(fit.cfg.p <= Tbats.MaxArmaOrder && fit.cfg.q <= Tbats.MaxArmaOrder)
    checkContract(Tbats.forecast(fit, H), H)
  }

  test("Guerrero lambda: near 0 on a multiplicative series, high on an additive one") {
    val m = 7
    val mult = Array.tabulate(140)(i =>
      math.exp(0.02 * i + 0.3 * math.sin(2 * math.Pi * i / m)))
    val add = Array.tabulate(140)(i =>
      100.0 + 0.5 * i + 3.0 * math.sin(2 * math.Pi * i / m))
    assert(Tbats.guerreroLambda(mult, m) < 0.4, "log-scale series wants lambda near 0")
    assert(Tbats.guerreroLambda(add, m) > 0.5, "additive series wants lambda near 1")
  }

  test("TBATS Box-Cox round-trip and positive-band inverse mapping") {
    val m = 7
    val y = Array.tabulate(120)(i =>
      math.exp(0.01 * i + 0.25 * math.sin(2 * math.Pi * i / m) + 2.0))
    val fit = Tbats.fitAuto(y, m).get
    val f = Tbats.forecast(fit, H)
    checkContract(f, H)
    // inverse Box-Cox keeps every band on the positive data scale
    (0 until H).foreach(j => assert(f.lower2(j) > 0.0, s"band below 0 at ${j + 1}"))
    // transform round-trip identity
    val w = Tbats.boxCox(Array(2.5), 0.3)(0)
    assert(math.abs(Tbats.invBoxCox(w, 0.3) - 2.5) < 1e-12)
    assert(math.abs(Tbats.invBoxCox(Tbats.boxCox(Array(2.5), 0.0)(0), 0.0) - 2.5) < 1e-12)
  }

  test("TBATS params round-trip through the model store format") {
    val m = 7
    val y = Array.tabulate(100)(i =>
      20.0 + 2.0 * math.sin(2 * math.Pi * i / m) + 0.05 * i)
    val model = Tbats.TbatsFamily.fit(y, m)
    val back = Tbats.TbatsFamily.fromParams(model.params)
    val a = model.forecast(H); val b = back.forecast(H)
    (0 until H).foreach { j =>
      assert(a.mean(j) == b.mean(j), s"mean mismatch at ${j + 1}")
      assert(a.lower2(j) == b.lower2(j) && a.upper2(j) == b.upper2(j))
    }
  }

  // ------------------------------------------------------------ registry

  test("every reference method resolves in the family registry (R:6-7 parity)") {
    Methods.reference.foreach { m =>
      assert(Families.byMethod(m).method == m)
    }
    assert(Families.all.size == Methods.all.size)
  }

  test("slice(h) of a longer forecast equals the prefix (cache semantics R:110)") {
    val y = linear(60, 1.0, 0.5, noise = 0.05)
    Methods.reference.filterNot(_ == Methods.HYBRID).foreach { m =>
      val model = Families.byMethod(m).fit(y, 7)
      val long = model.forecast(28)
      val short = long.slice(14)
      assert(short.length == 14)
      (0 until 14).foreach(j => assert(short.mean(j) == long.mean(j), s"$m prefix mismatch"))
    }
  }
}
