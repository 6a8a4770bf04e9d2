package graft.models

import graft.core.{Forecasts, Methods, Stats}

/** The Theta method — `thetam(ts)` from forecastHybrid, invoked by the
  * reference at TimeSeriesFunctions_GPL_0.5.1.R:129. Semantics (Assimako-
  * poulos & Nikolopoulos 2000 via the Hyndman & Billah 2003 equivalence):
  *
  *  1. Seasonality test: the lag-m autocorrelation is significant at 90%
  *     (|r_m| > 1.6449·sqrt((1 + 2·Σ_{k<m} r_k²)/n)) → classical
  *     multiplicative decomposition, deseasonalize y/s.
  *  2. SES on the (deseasonalized) series with optimized (α, ℓ0).
  *  3. Drift = half the OLS slope b of the series on 0..n−1 (the θ=0
  *     line), giving mean_h = ℓ_n + (b/2)·[(h−1) + (1−(1−α)^n)/α].
  *  4. Reseasonalize multiplicatively; prediction intervals use the SES
  *     (ANN) variance var_h = σ²(1 + (h−1)α²), scaled by the seasonal
  *     index — the same shape `forecast::thetaf` produces.
  */
object Theta {

  /** Autocorrelation r_1..r_{lag}. */
  def acf(y: Array[Double], maxLag: Int): Array[Double] = {
    val n = y.length
    val mu = Stats.mean(y)
    var c0 = 0.0
    var i = 0
    while (i < n) { val d = y(i) - mu; c0 += d * d; i += 1 }
    if (c0 <= 0) return Array.fill(maxLag)(0.0)
    Array.tabulate(maxLag) { k0 =>
      val k = k0 + 1
      var s = 0.0
      var t = k
      while (t < n) { s += (y(t) - mu) * (y(t - k) - mu); t += 1 }
      s / c0
    }
  }

  /** The 90%-significance seasonality test used by stheta/thetam. */
  def isSeasonal(y: Array[Double], m: Int): Boolean = {
    val n = y.length
    if (m <= 1 || n < 3 * m) return false
    val r = acf(y, m)
    var sumSq = 0.0
    var k = 0
    while (k < m - 1) { sumSq += r(k) * r(k); k += 1 }
    val limit = 1.6448536269514722 * math.sqrt((1.0 + 2.0 * sumSq) / n)
    math.abs(r(m - 1)) > limit
  }

  /** Classical multiplicative seasonal indices (centered-MA detrend →
    * per-season mean of ratios → normalize to mean 1). */
  def seasonalIndices(y: Array[Double], m: Int): Array[Double] =
    Ets.seasonalInit(y, m, multiplicative = true)

  /** SES fit: minimize SSE over (α, ℓ0). Returns (alpha, l0, finalLevel,
    * sse). */
  def sesFit(y: Array[Double]): (Double, Double, Double, Double) = {
    val n = y.length
    if (n == 0) return (0.5, 0.0, 0.0, 0.0)
    def run(a: Double, l0: Double): (Double, Double) = {
      var l = l0
      var sse = 0.0
      var t = 0
      while (t < n) { val e = y(t) - l; sse += e * e; l += a * e; t += 1 }
      (l, sse)
    }
    def obj(x: Array[Double]): Double = {
      if (x(0) <= 1e-4 || x(0) >= 0.9999) return 1e12
      run(x(0), x(1))._2
    }
    val (xb, _) = Optim.nelderMead(obj, Array(0.3, y.head),
      Array(0.1, math.max(1e-8, Stats.stddevSamp(y) * 0.1)), maxIter = 400)
    val a = math.min(0.9999, math.max(1e-4, xb(0)))
    val (lvl, sse) = run(a, xb(1))
    (a, xb(1), lvl, sse)
  }

  final case class ThetaModel(
      alpha: Double, level: Double, slope: Double, n: Int, sigma2: Double,
      seasonal: Array[Double], lastIndex: Int) extends SeriesModel {
    val method: String = Methods.THETA
    def forecast(h: Int): Forecasts = {
      val m = math.max(seasonal.length, 1)
      val driftScale = (1.0 - math.pow(1.0 - alpha, n)) / alpha
      val mean = new Array[Double](h)
      val se = new Array[Double](h)
      var j = 1
      while (j <= h) {
        val base = level + (slope / 2.0) * ((j - 1) + driftScale)
        val si = if (seasonal.nonEmpty) seasonal((lastIndex + j) % m) else 1.0
        mean(j - 1) = base * si
        se(j - 1) = math.sqrt(sigma2 * (1.0 + (j - 1) * alpha * alpha)) * si
        j += 1
      }
      Forecasts.gaussian(mean, se)
    }
    def params: ModelParams = ModelParams(
      Map("core" -> Array(alpha, level, slope, n.toDouble, sigma2, lastIndex.toDouble),
        "seasonal" -> (if (seasonal.isEmpty) Array(0.0) else seasonal),
        "hasSeasonal" -> Array(if (seasonal.isEmpty) 0.0 else 1.0)),
      Map.empty)
  }

  object ThetaFamily extends ModelFamily {
    val method: String = Methods.THETA
    def fit(y: Array[Double], frequency: Int): SeriesModel = {
      val seasonal = isSeasonal(y, frequency) && y.forall(_ > 0)
      val (si, adj) =
        if (seasonal) {
          val idx = seasonalIndices(y, frequency)
          val a = Array.tabulate(y.length)(t =>
            if (math.abs(idx(t % frequency)) > 1e-10) y(t) / idx(t % frequency) else y(t))
          (idx, a)
        } else (Array.empty[Double], y)
      val (alpha, _, lvl, sse) = sesFit(adj)
      val (_, slope) = Optim.olsLine(adj)
      val sigma2 = if (adj.length > 1) sse / adj.length else 0.0
      ThetaModel(alpha, lvl, slope, adj.length, sigma2, si,
        if (si.nonEmpty) (y.length - 1) % frequency else 0)
    }
    def fromParams(p: ModelParams): SeriesModel = {
      val c = p.d("core")
      val si = if (p.d1("hasSeasonal") > 0.5) p.d("seasonal") else Array.empty[Double]
      ThetaModel(c(0), c(1), c(2), c(3).toInt, c(4), si, c(5).toInt)
    }
  }
}
