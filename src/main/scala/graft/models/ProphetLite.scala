package graft.models

import graft.core.{Forecasts, Methods, Stats}

/** Prophet-shaped forecaster — the engine's `prophet(df, daily.seasonality
  * = 'auto', weekly.seasonality = 'auto')` (TimeSeriesFunctions_GPL_0.5.1
  * .R:371) + `make_future_dataframe(periods = h, freq = 'day',
  * include_history = FALSE)` (R:379).
  *
  * Prophet's MAP estimate is penalized least squares over a design matrix
  * of [piecewise-linear trend with hinge changepoints | Fourier seasonal
  * terms] — re-expressed here as an explicit ridge solve (normal
  * equations + Cholesky) on one series inside an executor task:
  *
  *  - trend: intercept k + slope·t + 25 hinge terms max(0, t − s_j),
  *    changepoints uniform over the first 80% of history (Prophet's
  *    n_changepoints/changepoint_range defaults), penalty from
  *    changepoint_prior_scale = 0.05;
  *  - weekly seasonality: Fourier order 3 on day-of-week (active when
  *    history spans ≥ 2 weeks — the 'auto' rule); yearly: order 10 on
  *    day/365.25 (active when span ≥ 2 years); penalty from
  *    seasonality_prior_scale = 10;
  *  - y scaled by max|y| (Prophet's scaling), σ from residuals;
  *  - ONE 80% band (interval_width = 0.8), duplicated into both contract
  *    levels exactly as the reference does with yhat_lower/upper
  *    (R:381-382).
  *
  * This is the only calendar-aware model (R:35-38): it consumes (epoch
  * day, y) pairs, not positional steps.
  */
object ProphetLite {

  val NChangepoints = 25
  val ChangepointRange = 0.8
  val WeeklyOrder = 3
  val YearlyOrder = 10
  // gaussian-approximated prior precisions on scaled y: weak enough that
  // genuine slope changes survive (Prophet's Laplace(0.05) prior is
  // sparsity-inducing, not hard shrinkage), strong enough to damp noise
  val ChangepointPenalty: Double = 1.0
  val SeasonalPenalty: Double = 1.0 / (2.0 * 10.0 * 10.0)

  final case class Design(cols: Int, changepoints: Array[Double],
      weekly: Boolean, yearly: Boolean, day0: Double, daySpan: Double)

  def design(days: Array[Int]): Design = {
    val day0 = days.head.toDouble
    val span = math.max(1.0, days.last.toDouble - day0)
    val nCp = math.min(NChangepoints, math.max(0, days.length - 2))
    val cps = Array.tabulate(nCp)(j => ChangepointRange * (j + 1.0) / (nCp + 1.0))
    val weekly = span >= 14
    val yearly = span >= 730
    val cols = 2 + nCp + (if (weekly) 2 * WeeklyOrder else 0) + (if (yearly) 2 * YearlyOrder else 0)
    Design(cols, cps, weekly, yearly, day0, span)
  }

  /** One design-matrix row for an absolute epoch day. */
  def row(d: Design, day: Double): Array[Double] = {
    val t = (day - d.day0) / d.daySpan
    val x = new Array[Double](d.cols)
    var c = 0
    x(c) = 1.0; c += 1
    x(c) = t; c += 1
    var j = 0
    while (j < d.changepoints.length) {
      x(c) = math.max(0.0, t - d.changepoints(j)); c += 1; j += 1
    }
    if (d.weekly) {
      val wpos = 2.0 * math.Pi * (day % 7.0) / 7.0
      var k = 1
      while (k <= WeeklyOrder) { x(c) = math.sin(k * wpos); c += 1; x(c) = math.cos(k * wpos); c += 1; k += 1 }
    }
    if (d.yearly) {
      val ypos = 2.0 * math.Pi * day / 365.25
      var k = 1
      while (k <= YearlyOrder) { x(c) = math.sin(k * ypos); c += 1; x(c) = math.cos(k * ypos); c += 1; k += 1 }
    }
    x
  }

  /** Per-column ridge penalties (flat prior on intercept/slope). */
  def penalties(d: Design): Array[Double] = {
    val lam = new Array[Double](d.cols)
    var c = 2
    var j = 0
    while (j < d.changepoints.length) { lam(c) = ChangepointPenalty; c += 1; j += 1 }
    while (c < d.cols) { lam(c) = SeasonalPenalty; c += 1 }
    lam
  }

  /** Solve (XᵀX + Λ)β = Xᵀy by Cholesky — the ridge/MAP normal-equation
    * solve (the `LinearRegression(solver="normal")` path, done in-task
    * so one executor fits one series without a driver round-trip). */
  def ridgeSolve(xtx: Array[Array[Double]], xty: Array[Double], lam: Array[Double]): Array[Double] = {
    val n = xty.length
    val a = Array.tabulate(n, n)((i, j) => xtx(i)(j) + (if (i == j) lam(i) + 1e-10 else 0.0))
    // Cholesky decomposition in place: a = L Lᵀ
    val L = Array.ofDim[Double](n, n)
    var i = 0
    while (i < n) {
      var j = 0
      while (j <= i) {
        var s = a(i)(j)
        var k = 0
        while (k < j) { s -= L(i)(k) * L(j)(k); k += 1 }
        if (i == j) L(i)(i) = math.sqrt(math.max(s, 1e-12))
        else L(i)(j) = s / L(j)(j)
        j += 1
      }
      i += 1
    }
    // forward/backward substitution
    val z = new Array[Double](n)
    i = 0
    while (i < n) {
      var s = xty(i)
      var k = 0
      while (k < i) { s -= L(i)(k) * z(k); k += 1 }
      z(i) = s / L(i)(i)
      i += 1
    }
    val beta = new Array[Double](n)
    i = n - 1
    while (i >= 0) {
      var s = z(i)
      var k = i + 1
      while (k < n) { s -= L(k)(i) * beta(k); k += 1 }
      beta(i) = s / L(i)(i)
      i -= 1
    }
    beta
  }

  final case class ProphetModel(
      d: Design, beta: Array[Double], yScale: Double, sigma: Double,
      lastDay: Int) extends SeriesModel {
    val method: String = Methods.PROPHET

    def predict(day: Double): Double = {
      val x = row(d, day)
      var s = 0.0
      var i = 0
      while (i < x.length) { s += x(i) * beta(i); i += 1 }
      s * yScale
    }

    /** Future = lastDay+1 … lastDay+h calendar days (freq='day', R:379).
      *
      * Intervals follow Prophet's own uncertainty model: future trend
      * changepoints arrive at the historical rate with Laplace(0, λ̂)
      * slope deltas (λ̂ = mean |fitted δ|), plus Gaussian observation
      * noise — 1000 seeded sample paths, 10th/90th percentiles
      * (interval_width = 0.8). The single band grows with horizon and
      * is duplicated into both contract levels (R:381-382). */
    def forecast(h: Int): Forecasts = {
      val mean = Array.tabulate(h)(i => predict(lastDay + 1.0 + i))
      val nCp = d.changepoints.length
      // Laplace scale of fitted slope deltas (hinge coefficients)
      val lambdaHat =
        if (nCp == 0) 0.0
        else {
          var s = 0.0
          var j = 0
          while (j < nCp) { s += math.abs(beta(2 + j)); j += 1 }
          math.max(s / nCp, 1e-12)
        }
      // changepoints per scaled-time unit over the changepoint range
      val cpRate = if (nCp == 0) 0.0 else nCp / ChangepointRange
      val dayStep = 1.0 / d.daySpan // one calendar day in scaled t units
      val sims = 1000
      val rng = new java.util.Random(Optim.seedOf(beta) ^ 0x70726f70L)
      val paths = Array.ofDim[Double](h, sims)
      var s = 0
      while (s < sims) {
        var slopeAdj = 0.0 // cumulative slope change, scaled-y per scaled-t
        var dev = 0.0      // cumulative trend deviation, scaled y
        var j = 0
        while (j < h) {
          if (rng.nextDouble() < cpRate * dayStep) {
            // Laplace(0, λ̂) via inverse CDF
            val u = rng.nextDouble() - 0.5
            slopeAdj += -lambdaHat * math.signum(u) * math.log(1.0 - 2.0 * math.abs(u))
          }
          dev += slopeAdj * dayStep
          paths(j)(s) = mean(j) + (dev + rng.nextGaussian() * sigma) * yScale
          j += 1
        }
        s += 1
      }
      val lower = new Array[Double](h)
      val upper = new Array[Double](h)
      var j = 0
      while (j < h) {
        val col = paths(j)
        java.util.Arrays.sort(col)
        def q(p: Double): Double = {
          val pos = (col.length - 1) * p
          val lo = pos.toInt
          val f = pos - lo
          if (lo + 1 < col.length) col(lo) * (1 - f) + col(lo + 1) * f else col(lo)
        }
        lower(j) = math.min(q(0.10), mean(j))
        upper(j) = math.max(q(0.90), mean(j))
        j += 1
      }
      Forecasts.singleBand(mean, lower, upper)
    }

    def params: ModelParams = ModelParams(
      Map(
        "beta" -> beta,
        "cps" -> (if (d.changepoints.isEmpty) Array(Double.NaN) else d.changepoints),
        "meta" -> Array(d.cols, if (d.weekly) 1.0 else 0.0, if (d.yearly) 1.0 else 0.0,
          d.day0, d.daySpan, yScale, sigma, lastDay.toDouble)),
      Map.empty)
  }

  def fromParams(p: ModelParams): ProphetModel = {
    val m = p.d("meta")
    val cpsRaw = p.d("cps")
    val cps = if (cpsRaw.length == 1 && cpsRaw(0).isNaN) Array.empty[Double] else cpsRaw
    ProphetModel(
      Design(m(0).toInt, cps, m(1) > 0.5, m(2) > 0.5, m(3), m(4)),
      p.d("beta"), m(5), m(6), m(7).toInt)
  }

  /** Fit from calendar-aware (epoch day, y) pairs — the returnDF=TRUE
    * path (R:369). */
  def fitDated(days: Array[Int], y: Array[Double]): ProphetModel = {
    require(days.length == y.length && y.nonEmpty)
    val d = design(days)
    val yScale = math.max(1e-8, y.map(math.abs).max)
    val ys = y.map(_ / yScale)
    val xtx = Array.ofDim[Double](d.cols, d.cols)
    val xty = new Array[Double](d.cols)
    var t = 0
    while (t < days.length) {
      val x = row(d, days(t).toDouble)
      var i = 0
      while (i < d.cols) {
        xty(i) += x(i) * ys(t)
        var j = 0
        while (j <= i) { xtx(i)(j) += x(i) * x(j); j += 1 }
        i += 1
      }
      t += 1
    }
    // mirror lower triangle
    var i = 0
    while (i < d.cols) { var j = i + 1; while (j < d.cols) { xtx(i)(j) = xtx(j)(i); j += 1 }; i += 1 }
    val beta = ridgeSolve(xtx, xty, penalties(d))
    // residual sigma on the scaled series
    var sse = 0.0
    t = 0
    while (t < days.length) {
      val x = row(d, days(t).toDouble)
      var s = 0.0
      var k = 0
      while (k < x.length) { s += x(k) * beta(k); k += 1 }
      val e = ys(t) - s
      sse += e * e
      t += 1
    }
    val sigma = math.sqrt(sse / math.max(1, days.length - 1))
    ProphetModel(d, beta, yScale, sigma, days.last)
  }

  object ProphetFamily extends ModelFamily {
    val method: String = Methods.PROPHET
    /** Positional fallback (consecutive days) — the real entry point is
      * [[fitDated]] via the calendar-aware store path. */
    def fit(y: Array[Double], frequency: Int): SeriesModel =
      fitDated(Array.tabulate(y.length)(identity), y)
    def fromParams(p: ModelParams): SeriesModel = ProphetLite.fromParams(p)
  }
}
