package graft.models

import graft.core.{Forecasts, Methods, Stats}

/** Innovations-state-space exponential smoothing (the ETS family behind
  * `forecast::ets`, invoked by the reference at
  * TimeSeriesFunctions_GPL_0.5.1.R:167 with `damped = forceDamped`).
  *
  * Model space: error E ∈ {A, M} × trend T ∈ {N, A, Ad} × seasonal
  * S ∈ {N, A, M}, minus the numerically forbidden additive-error /
  * multiplicative-seasonal combinations (A,*,M) — the same restriction
  * `ets` applies. Selection is by AICc over the admissible set, exactly
  * the reference's behavior (AICc selection inside `ets`, R:167); the
  * `damped` flag restricts the trend space to Ad (ETSDAMPED) or {N, A}
  * (ETS), mirroring `ets(ts, damped = forceDamped)`.
  *
  * Estimation: smoothing parameters (α, β, γ, φ) plus initial level and
  * trend are optimized by Nelder–Mead on the innovations likelihood;
  * initial seasonal indices come from a classical-decomposition heuristic
  * (the same warm start `ets` uses) and are held fixed — a documented
  * simplification (SURVEY.md §7: bit-matching CRAN forecast is a
  * non-goal; correctness = the §5.2 invariants).
  *
  * Everything runs on one series (≤10k points, R:28 cap) inside a single
  * executor task: plain arrays, no allocation in the hot recursion.
  */
object Ets {

  /** One ETS model class, e.g. AAdN = additive error, damped trend, no
    * seasonality. */
  final case class Spec(error: Char, trend: Char, seasonal: Char) {
    override def toString: String = {
      val t = if (trend == 'D') "Ad" else trend.toString
      s"$error,$t,$seasonal"
    }
    def damped: Boolean = trend == 'D'
    def hasTrend: Boolean = trend != 'N'
    def hasSeasonal: Boolean = seasonal != 'N'
  }

  object Spec {
    def parse(s: String): Spec = {
      val parts = s.split(',')
      Spec(parts(0).head, if (parts(1) == "Ad") 'D' else parts(1).head, parts(2).head)
    }
  }

  /** Result of one filtered pass: innovations likelihood pieces + final
    * states (level, trend, seasonal ring ending at position n-1). */
  final case class FitState(
      sse: Double, logMuSum: Double, n: Int,
      level: Double, trend: Double, seasonal: Array[Double])

  /** Run the innovations filter. Seasonal indices are a ring indexed by
    * t mod m. Returns null-equivalent (sse = +inf) on numeric failure. */
  def filter(
      y: Array[Double], spec: Spec, m: Int,
      alpha: Double, beta: Double, gamma: Double, phi: Double,
      l0: Double, b0: Double, s0: Array[Double]): FitState = {
    val n = y.length
    var l = l0
    var b = b0
    val s = if (spec.hasSeasonal) s0.clone() else null
    var sse = 0.0
    var logMu = 0.0
    var t = 0
    while (t < n) {
      val ph = if (spec.damped) phi else 1.0
      val q = spec.trend match {
        case 'N' => l
        case _   => l + ph * b
      }
      val si = if (spec.hasSeasonal) s(t % m) else 0.0
      val mu = spec.seasonal match {
        case 'N' => q
        case 'A' => q + si
        case 'M' => q * si
      }
      if (!java.lang.Double.isFinite(mu) || (spec.error == 'M' && math.abs(mu) < 1e-10))
        return FitState(Double.PositiveInfinity, 0.0, n, l, b, s)
      val e = spec.error match {
        case 'A' => y(t) - mu
        case 'M' => (y(t) - mu) / mu
      }
      sse += e * e
      if (spec.error == 'M') logMu += math.log(math.abs(mu))
      // error-correction state updates
      val absErr = spec.error match { // error in absolute (level) units
        case 'A' => e
        case 'M' => spec.seasonal match {
          case 'M' => q * e      // relative error scaled by trend part
          case _   => mu * e
        }
      }
      val lNew = q + alpha * absErr
      val bNew = if (spec.hasTrend) ph * b + beta * absErr else 0.0
      if (spec.hasSeasonal) {
        s(t % m) = spec.seasonal match {
          case 'A' => si + gamma * e * (if (spec.error == 'M') mu else 1.0)
          case 'M' => si * (1.0 + gamma * e * (if (spec.error == 'M') 1.0 else 1.0 / math.max(math.abs(q), 1e-10)))
          case _   => si
        }
      }
      l = lNew; b = bNew
      if (!java.lang.Double.isFinite(l) || !java.lang.Double.isFinite(b))
        return FitState(Double.PositiveInfinity, 0.0, n, l, b, s)
      t += 1
    }
    FitState(sse, logMu, n, l, b, s)
  }

  /** -2·log-likelihood up to constants: n·log(SSE) for additive error,
    * + 2·Σlog|μ| for multiplicative (Hyndman et al. 2008, eq. 5.3). */
  def negLogLik(st: FitState, error: Char): Double =
    if (!java.lang.Double.isFinite(st.sse) || st.sse <= 0) Double.PositiveInfinity
    else st.n * math.log(st.sse) + (if (error == 'M') 2.0 * st.logMuSum else 0.0)

  /** Initial seasonal indices by classical decomposition over the first
    * cycles (centered-MA detrend → per-season average → normalize). */
  def seasonalInit(y: Array[Double], m: Int, multiplicative: Boolean): Array[Double] = {
    val n = y.length
    if (m <= 1 || n < 2 * m) {
      return Array.fill(math.max(m, 1))(if (multiplicative) 1.0 else 0.0)
    }
    val use = math.min(n, 10 * m)
    // centered moving average of order m
    val trend = new Array[Double](use)
    val half = m / 2
    var i = 0
    while (i < use) {
      if (i >= half && i < use - half) {
        var s = 0.0
        if (m % 2 == 0) {
          s = 0.5 * y(i - half) + 0.5 * y(i + half)
          var j = i - half + 1
          while (j < i + half) { s += y(j); j += 1 }
          trend(i) = s / m
        } else {
          var j = i - half
          while (j <= i + half) { s += y(j); j += 1 }
          trend(i) = s / m
        }
      } else trend(i) = Double.NaN
      i += 1
    }
    val sums = new Array[Double](m)
    val cnts = new Array[Int](m)
    i = 0
    while (i < use) {
      if (!trend(i).isNaN && (!multiplicative || math.abs(trend(i)) > 1e-10)) {
        val d = if (multiplicative) y(i) / trend(i) else y(i) - trend(i)
        sums(i % m) += d; cnts(i % m) += 1
      }
      i += 1
    }
    val idx = Array.tabulate(m)(j =>
      if (cnts(j) > 0) sums(j) / cnts(j) else (if (multiplicative) 1.0 else 0.0))
    // normalize: additive indices sum to 0, multiplicative average to 1
    if (multiplicative) {
      val mean = idx.sum / m
      if (math.abs(mean) > 1e-10) idx.map(_ / mean) else idx
    } else {
      val mean = idx.sum / m
      idx.map(_ - mean)
    }
  }

  /** Deseasonalized warm start for (l0, b0): OLS line over the first
    * min(n, 10m) adjusted values. */
  def levelTrendInit(y: Array[Double], m: Int, s0: Array[Double], seasonal: Char): (Double, Double) = {
    val use = math.min(y.length, math.max(10, 10 * math.max(m, 1)))
    val adj = new Array[Double](use)
    var i = 0
    while (i < use) {
      adj(i) = seasonal match {
        case 'A' => y(i) - s0(i % m)
        case 'M' => if (math.abs(s0(i % m)) > 1e-10) y(i) / s0(i % m) else y(i)
        case _   => y(i)
      }
      i += 1
    }
    val (inter, slope) = Optim.olsLine(adj)
    (inter, slope)
  }

  /** Parameter count for AICc: smoothing params + φ + initial states +
    * residual variance (the same counting `ets` uses). */
  def nParams(spec: Spec, m: Int): Int = {
    var k = 2 // alpha + sigma2
    if (spec.hasTrend) k += 2 // beta + b0
    if (spec.damped) k += 1 // phi
    if (spec.hasSeasonal) k += 1 + (m - 1) // gamma + seasonal states
    k + 1 // l0
  }

  final case class Fitted(
      spec: Spec, m: Int,
      alpha: Double, beta: Double, gamma: Double, phi: Double,
      level: Double, trend: Double, seasonal: Array[Double],
      lastIndex: Int, // (n-1) mod m — where the seasonal ring stops
      sigma2: Double, aicc: Double, negLL: Double)

  /** Fit one model class: NM over the free parameters with box penalties
    * (α ∈ (0,1), β < α, γ < 1−α, φ ∈ [0.8, 0.98] — the `ets` bounds). */
  def fitSpec(y: Array[Double], spec: Spec, m: Int): Option[Fitted] = {
    val n = y.length
    if (n < 4) return None
    if (spec.hasSeasonal && (m <= 1 || n < 2 * m + 2)) return None
    if ((spec.error == 'M' || spec.seasonal == 'M') && y.exists(_ <= 0)) return None

    val s0 = if (spec.hasSeasonal) seasonalInit(y, m, spec.seasonal == 'M')
             else Array.empty[Double]
    val (l0w, b0w) = levelTrendInit(y, m, s0, spec.seasonal)

    val yScale = math.max(1e-8, Stats.stddevSamp(y))
    // free vector: alpha, [beta], [gamma], [phi], l0, [b0]
    def unpack(x: Array[Double]): (Double, Double, Double, Double, Double, Double) = {
      var i = 0
      val a = x(i); i += 1
      val b = if (spec.hasTrend) { val v = x(i); i += 1; v } else 0.0
      val g = if (spec.hasSeasonal) { val v = x(i); i += 1; v } else 0.0
      val p = if (spec.damped) { val v = x(i); i += 1; v } else 1.0
      val l = x(i); i += 1
      val bb = if (spec.hasTrend) x(i) else 0.0
      (a, b, g, p, l, bb)
    }
    def objective(x: Array[Double]): Double = {
      val (a, b, g, p, l, bb) = unpack(x)
      if (a <= 1e-4 || a >= 0.9999) return 1e12
      if (spec.hasTrend && (b <= 1e-4 || b >= a)) return 1e12
      if (spec.hasSeasonal && (g <= 1e-4 || g >= 1.0 - a)) return 1e12
      if (spec.damped && (p < 0.8 || p > 0.98)) return 1e12
      val st = filter(y, spec, m, a, b, g, p, l, bb, s0)
      val v = negLogLik(st, spec.error)
      if (java.lang.Double.isFinite(v)) v else 1e12
    }
    val x0 = {
      val buf = scala.collection.mutable.ArrayBuffer[Double](0.3)
      if (spec.hasTrend) buf += 0.05
      if (spec.hasSeasonal) buf += 0.1
      if (spec.damped) buf += 0.95
      buf += l0w
      if (spec.hasTrend) buf += b0w
      buf.toArray
    }
    val step = x0.zipWithIndex.map { case (v, i) =>
      if (i < x0.length - (if (spec.hasTrend) 2 else 1)) 0.1
      else math.max(math.abs(v) * 0.1, yScale * 0.1)
    }
    // negLL magnitude ~n·log(SSE): 1e-6 relative is far below any
    // AICc-relevant difference (same reasoning as the ARIMA CSS fit)
    val (xb, fb) = Optim.nelderMead(objective, x0, step, maxIter = 600, tol = 1e-6)
    if (fb >= 1e12) return None
    val (a, b, g, p, l, bb) = unpack(xb)
    val st = filter(y, spec, m, a, b, g, p, l, bb, s0)
    if (!java.lang.Double.isFinite(st.sse)) return None
    val k = nParams(spec, m)
    val negLL = negLogLik(st, spec.error)
    val aicc =
      if (n - k - 1 <= 0) Double.PositiveInfinity
      else negLL + 2.0 * k + 2.0 * k * (k + 1.0) / (n - k - 1.0)
    val sigma2 = st.sse / n
    Some(Fitted(spec, m, a, b, g, p, st.level, st.trend,
      if (spec.hasSeasonal) st.seasonal else Array.empty,
      (n - 1) % math.max(m, 1), sigma2, aicc, negLL))
  }

  /** Admissible model classes given the data and the damped restriction
    * (`damped = Some(true)` → only Ad trends, the ETSDAMPED method;
    * `Some(false)` → only N/A trends, the plain ETS method — matching
    * `ets(ts, damped = forceDamped)` at R:167). */
  def candidateSpecs(y: Array[Double], m: Int, damped: Option[Boolean]): Seq[Spec] = {
    val errors = Seq('A', 'M')
    val trends = damped match {
      case Some(true)  => Seq('D')
      case Some(false) => Seq('N', 'A')
      case None        => Seq('N', 'A', 'D')
    }
    val seasonals = if (m > 1 && y.length >= 2 * m + 2) Seq('N', 'A', 'M') else Seq('N')
    for {
      e <- errors
      t <- trends
      s <- seasonals
      if !(e == 'A' && s == 'M') // forbidden class (unstable likelihood)
      if !(t == 'D' && e == 'N')
    } yield Spec(e, t, s)
  }

  /** Winner-only refinement that frees the seasonal INITIAL states
    * (heuristic-fixed during class selection): re-optimize the winning
    * class's smoothing parameters, level/trend inits, and m−1 free
    * seasonal states (the last is pinned by the normalization — sum 0
    * additive, mean 1 multiplicative), warm-started at the selection
    * optimum. `nParams` already counts the seasonal states, so AICc
    * dimensionality is unchanged — this is a pure likelihood
    * refinement, the same two-stage shape as the ARIMA CSS→exact-ML
    * rescore. Kept only when it does not worsen the likelihood. */
  def refineSeasonal(y: Array[Double], fit: Fitted, m: Int): Fitted = {
    val spec = fit.spec
    if (!spec.hasSeasonal || m <= 1) return fit
    val mult = spec.seasonal == 'M'
    val s0h = seasonalInit(y, m, mult)
    val (l0w, b0w) = levelTrendInit(y, m, s0h, spec.seasonal)
    val yScale = math.max(1e-8, Stats.stddevSamp(y))
    def buildS(tail: Array[Double]): Array[Double] = {
      val s = new Array[Double](m)
      System.arraycopy(tail, 0, s, 0, m - 1)
      s(m - 1) = if (mult) m - tail.sum else -tail.sum
      s
    }
    def unpack(x: Array[Double]): (Double, Double, Double, Double, Double, Double, Array[Double]) = {
      var i = 0
      val a = x(i); i += 1
      val b = if (spec.hasTrend) { val v = x(i); i += 1; v } else 0.0
      val g = x(i); i += 1
      val p = if (spec.damped) { val v = x(i); i += 1; v } else 1.0
      val l = x(i); i += 1
      val bb = if (spec.hasTrend) { val v = x(i); i += 1; v } else 0.0
      (a, b, g, p, l, bb, buildS(java.util.Arrays.copyOfRange(x, i, i + m - 1)))
    }
    def objective(x: Array[Double]): Double = {
      val (a, b, g, p, l, bb, s0) = unpack(x)
      if (a <= 1e-4 || a >= 0.9999) return 1e12
      if (spec.hasTrend && (b <= 1e-4 || b >= a)) return 1e12
      if (g <= 1e-4 || g >= 1.0 - a) return 1e12
      if (spec.damped && (p < 0.8 || p > 0.98)) return 1e12
      if (mult && s0.exists(_ <= 1e-6)) return 1e12
      val st = filter(y, spec, m, a, b, g, p, l, bb, s0)
      val v = negLogLik(st, spec.error)
      if (java.lang.Double.isFinite(v)) v else 1e12
    }
    val x0 = {
      val buf = scala.collection.mutable.ArrayBuffer[Double](fit.alpha)
      if (spec.hasTrend) buf += fit.beta
      buf += fit.gamma
      if (spec.damped) buf += fit.phi
      buf += l0w
      if (spec.hasTrend) buf += b0w
      buf ++= s0h.take(m - 1)
      buf.toArray
    }
    val nSmooth = x0.length - (m - 1) - (if (spec.hasTrend) 2 else 1)
    val step = x0.zipWithIndex.map { case (v, i) =>
      if (i < nSmooth) 0.05
      else if (i < x0.length - (m - 1)) math.max(math.abs(v) * 0.1, yScale * 0.1)
      else if (mult) 0.05 else math.max(math.abs(v) * 0.2, yScale * 0.05)
    }
    val (xb, fb) = Optim.nelderMead(objective, x0, step, maxIter = 800, tol = 1e-6)
    if (fb >= 1e12 || fb > fit.negLL) return fit
    val (a, b, g, p, l, bb, s0) = unpack(xb)
    val st = filter(y, spec, m, a, b, g, p, l, bb, s0)
    if (!java.lang.Double.isFinite(st.sse)) return fit
    val k = nParams(spec, m)
    val negLL = negLogLik(st, spec.error)
    val n = y.length
    val aicc =
      if (n - k - 1 <= 0) Double.PositiveInfinity
      else negLL + 2.0 * k + 2.0 * k * (k + 1.0) / (n - k - 1.0)
    Fitted(spec, m, a, b, g, p, st.level, st.trend, st.seasonal,
      (n - 1) % math.max(m, 1), st.sse / n, aicc, negLL)
  }

  /** AICc model selection over the admissible classes — `ets`'s outer
    * loop (R:167) — then seasonal-init refinement of the winner. */
  def fitAuto(y: Array[Double], m: Int, damped: Option[Boolean]): Option[Fitted] = {
    val fits = candidateSpecs(y, m, damped).flatMap(s => fitSpec(y, s, m))
    if (fits.isEmpty) None else Some(refineSeasonal(y, fits.minBy(_.aicc), m))
  }

  /** h-step forecast means + class-1/2 analytic variance approximation:
    * var_h = σ²(1 + Σ_{j=1}^{h-1} c_j²), c_j = α + βφ_j + γ·1[m|j]; for
    * multiplicative error the relative variance is scaled by μ_h²
    * (Hyndman et al. 2008 ch. 6 — exact for class 1, the standard
    * approximation for classes 2/3). */
  def forecast(f: Fitted, h: Int): Forecasts = {
    val m = math.max(f.m, 1)
    val mean = new Array[Double](h)
    val se = new Array[Double](h)
    var phiSum = 0.0
    var cSumSq = 0.0
    var j = 1
    while (j <= h) {
      val ph = if (f.spec.damped) { phiSum += math.pow(f.phi, j); phiSum } else j.toDouble
      val q = if (f.spec.hasTrend) f.level + ph * f.trend else f.level
      val si = if (f.spec.hasSeasonal) f.seasonal((f.lastIndex + j) % m) else 0.0
      val mu = f.spec.seasonal match {
        case 'N' => q
        case 'A' => q + si
        case 'M' => q * si
      }
      mean(j - 1) = mu
      val varH =
        if (j == 1) f.sigma2
        else f.sigma2 * (1.0 + cSumSq)
      se(j - 1) = f.spec.error match {
        case 'A' => math.sqrt(varH)
        case 'M' => math.abs(mu) * math.sqrt(varH)
      }
      // c_j for NEXT step's variance accumulation
      val phj = if (f.spec.damped) phiSum else j.toDouble
      val cj = f.alpha +
        (if (f.spec.hasTrend) f.beta * phj else 0.0) +
        (if (f.spec.hasSeasonal && j % m == 0) f.gamma else 0.0)
      cSumSq += cj * cj
      j += 1
    }
    Forecasts.gaussian(mean, se)
  }

  // ---------------------------------------------------------------- //
  //  ModelFamily wiring                                              //
  // ---------------------------------------------------------------- //

  final case class EtsModel(fitted: Fitted, methodName: String) extends SeriesModel {
    def method: String = methodName
    def forecast(h: Int): Forecasts = Ets.forecast(fitted, h)
    def params: ModelParams = ModelParams(
      Map(
        "smoothing" -> Array(fitted.alpha, fitted.beta, fitted.gamma, fitted.phi),
        "state" -> Array(fitted.level, fitted.trend, fitted.lastIndex.toDouble,
          fitted.m.toDouble, fitted.sigma2, fitted.aicc),
        "seasonal" -> (if (fitted.seasonal.isEmpty) Array(0.0) else fitted.seasonal)),
      Map("spec" -> fitted.spec.toString, "method" -> methodName))
  }

  private def rebuild(p: ModelParams): EtsModel = {
    val sm = p.d("smoothing"); val st = p.d("state")
    val spec = Spec.parse(p.s("spec"))
    val seas = if (spec.hasSeasonal) p.d("seasonal") else Array.empty[Double]
    EtsModel(Fitted(spec, st(3).toInt, sm(0), sm(1), sm(2), sm(3),
      st(0), st(1), seas, st(2).toInt, st(4), st(5), Double.NaN), p.s("method"))
  }

  /** ETS method (R:167, `damped = FALSE`). */
  object EtsFamily extends ModelFamily {
    val method: String = Methods.ETS
    def fit(y: Array[Double], frequency: Int): SeriesModel =
      EtsModel(fitAuto(y, frequency, Some(false))
        .getOrElse(fallback(y)), method)
    def fromParams(p: ModelParams): SeriesModel = rebuild(p)
  }

  /** ETSDAMPED method (R:167, `damped = TRUE`). */
  object EtsDampedFamily extends ModelFamily {
    val method: String = Methods.ETSDAMPED
    def fit(y: Array[Double], frequency: Int): SeriesModel =
      EtsModel(fitAuto(y, frequency, Some(true))
        .orElse(fitAuto(y, frequency, Some(false))) // degenerate series: fall back
        .getOrElse(fallback(y)), method)
    def fromParams(p: ModelParams): SeriesModel = rebuild(p)
  }

  /** Degenerate-series fallback (constant / too-short input): ANN with
    * level = last value, zero variance contribution beyond residuals. */
  def fallback(y: Array[Double]): Fitted = {
    val lvl = if (y.nonEmpty) y.last else 0.0
    val sse = if (y.length > 1) {
      val d = Stats.diff(y); d.map(x => x * x).sum
    } else 0.0
    Fitted(Spec('A', 'N', 'N'), 1, 0.9999, 0, 0, 1.0, lvl, 0, Array.empty, 0,
      if (y.length > 1) sse / y.length else 0.0, Double.PositiveInfinity, Double.PositiveInfinity)
  }
}
