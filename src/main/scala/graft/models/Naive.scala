package graft.models

import graft.core.{Forecasts, Methods, Stats}

/** Deterministic closed-form baseline forecasters (engine extensions —
  * SURVEY.md §7 minimum slice; the reference has no closed-form methods,
  * but these exercise the full store/cache/contract pipeline with math the
  * DuckDB oracle can reproduce in ANSI SQL).
  *
  * Semantics (documented engine spec, shared verbatim with the oracle SQL):
  * with y_1..y_n, d_t = y_t - y_{t-1}, s_d = stddev_samp(d), z80/z95 the
  * normal quantiles behind forecast()'s default 80/95 bands (R:99-100):
  *
  *  - NAIVE:  mean_h = y_n;                se_h = s_d * sqrt(h)
  *  - DRIFT:  b = (y_n - y_1)/(n-1);       mean_h = y_n + b*h;
  *            se_h = s_d * sqrt(h * (1 + h/(n-1)))
  *  - MEANF:  mean_h = avg(y);             se_h = stddev_samp(y) * sqrt(1 + 1/n)
  *  - SNAIVE: m' = min(m, n), cycle = last m' values;
  *            mean_h = cycle[(h-1) mod m'];
  *            se_h = stddev_samp(y_t - y_{t-m'}) * sqrt(floor((h-1)/m') + 1)
  */
object NaiveFamilies {

  final case class NaiveModel(last: Double, sigma: Double) extends SeriesModel {
    val method: String = Methods.NAIVE
    def forecast(h: Int): Forecasts = {
      val mean = Array.fill(h)(last)
      val se = Array.tabulate(h)(i => sigma * math.sqrt(i + 1.0))
      Forecasts.gaussian(mean, se)
    }
    def params: ModelParams =
      ModelParams(Map("last" -> Array(last), "sigma" -> Array(sigma)), Map.empty)
  }

  object Naive extends ModelFamily {
    val method: String = Methods.NAIVE
    def fit(y: Array[Double], frequency: Int): SeriesModel =
      NaiveModel(y.last, Stats.stddevSamp(Stats.diff(y)))
    def fromParams(p: ModelParams): SeriesModel = NaiveModel(p.d1("last"), p.d1("sigma"))
  }

  final case class DriftModel(last: Double, slope: Double, n: Int, sigma: Double) extends SeriesModel {
    val method: String = Methods.DRIFT
    def forecast(h: Int): Forecasts = {
      val mean = Array.tabulate(h)(i => last + slope * (i + 1))
      val se = Array.tabulate(h) { i =>
        val k = i + 1.0
        // n = 1: no drift sample at all — sigma is 0 but k/(n−1) is ∞,
        // and 0·∞ would poison the bands with NaN
        if (n <= 1) 0.0 else sigma * math.sqrt(k * (1.0 + k / (n - 1.0)))
      }
      Forecasts.gaussian(mean, se)
    }
    def params: ModelParams = ModelParams(
      Map("last" -> Array(last), "slope" -> Array(slope), "n" -> Array(n.toDouble), "sigma" -> Array(sigma)),
      Map.empty)
  }

  object Drift extends ModelFamily {
    val method: String = Methods.DRIFT
    def fit(y: Array[Double], frequency: Int): SeriesModel = {
      val n = y.length
      val b = if (n > 1) (y.last - y.head) / (n - 1.0) else 0.0
      DriftModel(y.last, b, n, Stats.stddevSamp(Stats.diff(y)))
    }
    def fromParams(p: ModelParams): SeriesModel =
      DriftModel(p.d1("last"), p.d1("slope"), p.d1("n").toInt, p.d1("sigma"))
  }

  final case class MeanfModel(mu: Double, sd: Double, n: Int) extends SeriesModel {
    val method: String = Methods.MEANF
    def forecast(h: Int): Forecasts = {
      val mean = Array.fill(h)(mu)
      val se = Array.fill(h)(sd * math.sqrt(1.0 + 1.0 / n))
      Forecasts.gaussian(mean, se)
    }
    def params: ModelParams =
      ModelParams(Map("mu" -> Array(mu), "sd" -> Array(sd), "n" -> Array(n.toDouble)), Map.empty)
  }

  object Meanf extends ModelFamily {
    val method: String = Methods.MEANF
    def fit(y: Array[Double], frequency: Int): SeriesModel =
      MeanfModel(Stats.mean(y), Stats.stddevSamp(y), y.length)
    def fromParams(p: ModelParams): SeriesModel =
      MeanfModel(p.d1("mu"), p.d1("sd"), p.d1("n").toInt)
  }

  final case class SNaiveModel(cycle: Array[Double], sigma: Double) extends SeriesModel {
    val method: String = Methods.SNAIVE
    def forecast(h: Int): Forecasts = {
      val m = cycle.length
      val mean = Array.tabulate(h)(i => cycle(i % m))
      val se = Array.tabulate(h)(i => sigma * math.sqrt(i / m + 1.0))
      Forecasts.gaussian(mean, se)
    }
    def params: ModelParams =
      ModelParams(Map("cycle" -> cycle, "sigma" -> Array(sigma)), Map.empty)
  }

  /** Fixed-α SES (engine extension): l_t = α·y_t + (1−α)·l_{t−1} with
    * l_1 = y_1; mean_h = l_n (flat); se_h = s_d·sqrt(1 + (h−1)·α²)
    * (ANN-class variance with the naive-method σ estimate — documented
    * closed form so the oracle can reproduce it). α is fixed (0.3) so
    * the whole computation, including the state recursion, is
    * DuckDB-expressible via list_reduce. */
  final case class SesModel(level: Double, sigma: Double, alpha: Double) extends SeriesModel {
    val method: String = Methods.SES
    def forecast(h: Int): Forecasts = {
      val mean = Array.fill(h)(level)
      val se = Array.tabulate(h)(i => sigma * math.sqrt(1.0 + i * alpha * alpha))
      Forecasts.gaussian(mean, se)
    }
    def params: ModelParams =
      ModelParams(Map("core" -> Array(level, sigma, alpha)), Map.empty)
  }

  object Ses extends ModelFamily {
    val method: String = Methods.SES
    val Alpha = 0.3
    def fit(y: Array[Double], frequency: Int): SeriesModel = {
      var l = y.head
      var i = 1
      // literal 0.7, not (1.0 − Alpha): the oracle's lambda uses the
      // decimal literal 0.7 and the two doubles must be IDENTICAL bits
      while (i < y.length) { l = 0.3 * y(i) + 0.7 * l; i += 1 }
      SesModel(l, Stats.stddevSamp(Stats.diff(y)), Alpha)
    }
    def fromParams(p: ModelParams): SeriesModel = {
      val c = p.d("core"); SesModel(c(0), c(1), c(2))
    }
  }

  object SNaive extends ModelFamily {
    val method: String = Methods.SNAIVE
    def fit(y: Array[Double], frequency: Int): SeriesModel = {
      val m = math.max(1, math.min(frequency, y.length))
      SNaiveModel(y.takeRight(m), Stats.stddevSamp(Stats.diff(y, m)))
    }
    def fromParams(p: ModelParams): SeriesModel = SNaiveModel(p.d("cycle"), p.d1("sigma"))
  }
}
