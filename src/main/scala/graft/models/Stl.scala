package graft.models

import graft.core.{Forecasts, Methods}

/** Seasonal-trend decomposition by LOESS — the engine's `mstl(ts)`
  * (TimeSeriesFunctions_GPL_0.5.1.R:246). The saved "model" IS the
  * decomposition (trend + seasonal + remainder), exactly as the reference
  * persists the mstl object; forecasting (R:253-258, the `stlf` path)
  * fits a non-seasonal ETS to the seasonally-adjusted series and re-adds
  * the last seasonal cycle (seasonal-naive re-seasonalization).
  *
  * Decomposition follows Cleveland et al. 1990 (STL: A Seasonal-Trend
  * Decomposition Procedure Based on Loess) with mstl's defaults:
  * s.window = 13, s.degree = 1, 2 inner iterations, no robustness pass.
  * All math is plain-array, O(n·span), inside one executor task.
  */
object Stl {

  /** LOESS smoother: local weighted linear regression with tricube
    * weights over the `span` nearest points, evaluated at every
    * position 0..n-1 (jump = 1). Degree 1. */
  def loess(y: Array[Double], span: Int): Array[Double] = loessTr(y, span)._1

  /** Loess plus the exact trace of its smoother matrix (Σᵢ lᵢᵢ) — the
    * effective degrees of freedom the smooth consumes. At position i the
    * weight the local fit puts on y(i) itself is tri(0)·swxx/det (xᵢ = 0,
    * tricube weight 1), so the trace falls out of the same pass for free.
    * Used to un-shrink the remainder variance for prediction intervals.
    */
  def loessTr(y: Array[Double], span: Int): (Array[Double], Double) = {
    val n = y.length
    val q = math.max(2, math.min(span, n))
    val out = new Array[Double](n)
    var trace = 0.0
    var i = 0
    while (i < n) {
      // window of q nearest indices around i
      var lo = math.max(0, i - (q - 1) / 2)
      if (lo + q > n) lo = n - q
      val hi = lo + q - 1
      val dmax = math.max(i - lo, hi - i).toDouble.max(1.0)
      // weighted linear fit over [lo, hi]
      var sw = 0.0; var swx = 0.0; var swy = 0.0; var swxx = 0.0; var swxy = 0.0
      var j = lo
      while (j <= hi) {
        val d = math.abs(j - i) / dmax
        val tri = { val u = 1.0 - d * d * d; if (u <= 0) 0.0 else u * u * u }
        if (tri > 0) {
          val x = (j - i).toDouble
          sw += tri; swx += tri * x; swy += tri * y(j)
          swxx += tri * x * x; swxy += tri * x * y(j)
        }
        j += 1
      }
      val det = sw * swxx - swx * swx
      if (math.abs(det) > 1e-12) {
        out(i) = (swxx * swy - swx * swxy) / det // intercept at x=0 (= position i)
        trace += swxx / det
      } else {
        val swSafe = math.max(sw, 1e-12)
        out(i) = swy / swSafe
        trace += 1.0 / swSafe
      }
      i += 1
    }
    (out, trace)
  }

  /** Centered moving average of odd/even order, NaN-free interior only:
    * used by the STL low-pass filter (3×MA(m), MA(m), MA(3) chain). */
  private def ma(x: Array[Double], order: Int): Array[Double] = {
    val n = x.length - order + 1
    if (n <= 0) return Array.empty
    val out = new Array[Double](n)
    var s = 0.0
    var i = 0
    while (i < order) { s += x(i); i += 1 }
    out(0) = s / order
    i = order
    while (i < x.length) { s += x(i) - x(i - order); out(i - order + 1) = s / order; i += 1 }
    out
  }

  /** `df` is the effective degrees of freedom the smoothers consumed
    * (trace of the seasonal cycle-subseries loess matrices + trace of the
    * trend loess, from the final inner iteration). The remainder's
    * variance underestimates the true noise variance by roughly the
    * factor (n − df)/n — forecast bands must un-shrink by its inverse. */
  final case class Decomposition(
      trend: Array[Double], seasonal: Array[Double], remainder: Array[Double],
      df: Double = 0.0)

  /** One STL run (2 inner iterations, mstl defaults). For m <= 1 the
    * seasonal is zero and the trend is a single loess pass (mstl's
    * non-seasonal branch: supsmu-equivalent trend). */
  def decompose(y: Array[Double], m: Int, sWindow: Int = 13): Decomposition = {
    val n = y.length
    if (m <= 1 || n < 2 * m + 2) {
      val (trend, tr) = loessTr(y, trendSpan(n))
      val rem = Array.tabulate(n)(i => y(i) - trend(i))
      return Decomposition(trend, new Array[Double](n), rem, tr)
    }
    val trend = new Array[Double](n) // starts at 0
    var seasonal = new Array[Double](n)
    var df = 0.0
    var inner = 0
    while (inner < 2) {
      df = 0.0 // only the final iteration's traces describe the output
      // 1. detrend
      val det = Array.tabulate(n)(i => y(i) - trend(i))
      // 2. cycle-subseries smoothing, extended one cycle each side
      val cExt = new Array[Double](n + 2 * m)
      var k = 0
      while (k < m) {
        val len = (n - k + m - 1) / m
        val sub = new Array[Double](len)
        var j = 0
        while (j < len) { sub(j) = det(k + j * m); j += 1 }
        val (sm, smTr) = loessTr(sub, sWindow)
        df += smTr
        // linear-extrapolate one point before and after from the smooth
        val before = if (len >= 2) 2 * sm(0) - sm(1) else sm(0)
        val after = if (len >= 2) 2 * sm(len - 1) - sm(len - 2) else sm(len - 1)
        cExt(k) = before
        j = 0
        while (j < len) { cExt(m + k + j * m) = sm(j); j += 1 }
        val afterPos = m + k + len * m
        if (afterPos < cExt.length) cExt(afterPos) = after
        k += 1
      }
      // 3. low-pass: MA(m) ∘ MA(m) ∘ MA(3), then loess span n_l
      val lp1 = ma(cExt, m)
      val lp2 = ma(lp1, m)
      val lp3 = ma(lp2, 3)
      // lp3 has length n + 2m - 2(m-1) - 2 = n: aligned with y
      val lowPass = loess(lp3, oddAtLeast(m))
      // 4. seasonal = smoothed cycle-subseries minus low-pass
      val s = new Array[Double](n)
      var i = 0
      while (i < n) { s(i) = cExt(m + i) - lowPass(i); i += 1 }
      seasonal = s
      // 5-6. deseasonalize, trend loess
      val deseas = Array.tabulate(n)(i2 => y(i2) - seasonal(i2))
      val (t, tTr) = loessTr(deseas, trendSpanStl(m, sWindow))
      df += tTr
      System.arraycopy(t, 0, trend, 0, n)
      inner += 1
    }
    val rem = Array.tabulate(n)(i => y(i) - trend(i) - seasonal(i))
    Decomposition(trend, seasonal, rem, df)
  }

  private def oddAtLeast(v: Int): Int = if (v % 2 == 1) v else v + 1
  /** STL trend span: smallest odd ≥ 1.5m / (1 − 1.5/s.window). */
  def trendSpanStl(m: Int, sWindow: Int): Int =
    oddAtLeast(math.ceil(1.5 * m / (1.0 - 1.5 / sWindow)).toInt)
  /** Non-seasonal trend span (~10% of the series, odd, ≥ 7). */
  def trendSpan(n: Int): Int = oddAtLeast(math.max(7, n / 10))

  // ---------------------------------------------------------------- //
  //  STL forecast model (decomposition + ETS on adjusted series)      //
  // ---------------------------------------------------------------- //

  final case class StlModel(
      m: Int, lastSeasonalCycle: Array[Double], lastIndex: Int,
      etsPart: Ets.Fitted) extends SeriesModel {
    val method: String = Methods.STL
    def forecast(h: Int): Forecasts = {
      val base = Ets.forecast(etsPart, h)
      if (m <= 1) return base
      // seasonal-naive re-add of the last full cycle (R:254 semantics)
      val mean = new Array[Double](h)
      val l1 = new Array[Double](h); val l2 = new Array[Double](h)
      val u1 = new Array[Double](h); val u2 = new Array[Double](h)
      var j = 0
      while (j < h) {
        val si = lastSeasonalCycle((lastIndex + 1 + j) % m)
        mean(j) = base.mean(j) + si
        l1(j) = base.lower1(j) + si; l2(j) = base.lower2(j) + si
        u1(j) = base.upper1(j) + si; u2(j) = base.upper2(j) + si
        j += 1
      }
      Forecasts(l1, l2, mean, u1, u2)
    }
    def params: ModelParams = {
      val e = Ets.EtsModel(etsPart, Methods.ETS).params
      ModelParams(
        e.dparams ++ Map(
          "stl" -> Array(m.toDouble, lastIndex.toDouble),
          "cycle" -> (if (lastSeasonalCycle.isEmpty) Array(0.0) else lastSeasonalCycle)),
        e.sparams)
    }
  }

  object StlFamily extends ModelFamily {
    val method: String = Methods.STL
    def fit(y: Array[Double], frequency: Int): SeriesModel = {
      val dec = decompose(y, frequency)
      val adjusted = Array.tabulate(y.length)(i => y(i) - dec.seasonal(i))
      // stlf: non-seasonal ETS (model "ZZN") on the adjusted series
      val etsRaw = Ets.fitAuto(adjusted, 1, None).getOrElse(Ets.fallback(adjusted))
      // PI calibration: the loess smoothers absorb noise into trend +
      // seasonal (they consume dec.df effective degrees of freedom), so
      // the ETS residual variance on the adjusted series underestimates
      // the true noise variance by ~(n − df)/n. Un-shrink sigma² by the
      // inverse or the 80/95 bands undercover badly (measured 0.68/0.88
      // empirical coverage before the correction, 0.82/0.95 after —
      // CalibrationSpec, BASELINE.md).
      val n = y.length
      val inflate = n.toDouble / math.max(n - dec.df, math.max(4.0, 0.2 * n))
      val ets = etsRaw.copy(sigma2 = etsRaw.sigma2 * inflate)
      val m = if (frequency > 1 && y.length >= 2 * frequency + 2) frequency else 1
      // last full cycle, aligned so cycle(i) = seasonal value at position with (pos % m == i)
      val aligned =
        if (m > 1) {
          val c = new Array[Double](m)
          var k = 0
          while (k < m) { val pos = y.length - m + k; c(pos % m) = dec.seasonal(pos); k += 1 }
          c
        } else Array.empty[Double]
      StlModel(m, aligned, (y.length - 1) % math.max(m, 1), ets)
    }
    def fromParams(p: ModelParams): SeriesModel = {
      val e = Ets.EtsModel(
        {
          val sm = p.d("smoothing"); val st = p.d("state")
          val spec = Ets.Spec.parse(p.s("spec"))
          val seas = if (spec.hasSeasonal) p.d("seasonal") else Array.empty[Double]
          Ets.Fitted(spec, st(3).toInt, sm(0), sm(1), sm(2), sm(3),
            st(0), st(1), seas, st(2).toInt, st(4), st(5), Double.NaN)
        }, Methods.ETS)
      val stl = p.d("stl")
      val m = stl(0).toInt
      val cyc = if (m > 1) p.d("cycle") else Array.empty[Double]
      StlModel(m, cyc, stl(1).toInt, e.fitted)
    }
  }
}
