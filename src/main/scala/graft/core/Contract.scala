package graft.core

/** Universal output contract of the engine — one row per forecast step.
  *
  * Mirrors the reference's 5-vector `flist` record (lower1/lower2/mean/
  * upper1/upper2 = 80% lower, 95% lower, point, 80% upper, 95% upper;
  * TimeSeriesFunctions_GPL_0.5.1.R:99-101) in long form: one row per step
  * instead of 5 parallel arrays, which makes horizon slicing (R:110) a
  * `filter(step <= h)` and keeps the cache a plain columnar table.
  */
final case class ForecastPoint(
    element: String,
    method: String,
    step: Int,
    lower1: Double,
    lower2: Double,
    mean: Double,
    upper1: Double,
    upper2: Double)

/** Dense per-step forecast arrays produced by a fitted model — the direct
  * analogue of the reference's `flist` (R:99-101). All five arrays have
  * equal length h.
  */
final case class Forecasts(
    lower1: Array[Double],
    lower2: Array[Double],
    mean: Array[Double],
    upper1: Array[Double],
    upper2: Array[Double]) {
  def length: Int = mean.length
  def toPoints(element: String, method: String): Seq[ForecastPoint] =
    (0 until length).map { i =>
      ForecastPoint(element, method, i + 1, lower1(i), lower2(i), mean(i), upper1(i), upper2(i))
    }
  /** Horizon slice — the reference's `subset(end = horizon)` / `x[1:horizon]`
    * (R:110, R:149). */
  def slice(h: Int): Forecasts =
    Forecasts(lower1.take(h), lower2.take(h), mean.take(h), upper1.take(h), upper2.take(h))
}

object Forecasts {
  /** Build symmetric normal-theory 80/95 bands around point forecasts
    * given per-step standard errors — how `forecast::forecast()` produces
    * the two-level bands the reference slices (R:99-100). */
  def gaussian(mean: Array[Double], se: Array[Double]): Forecasts = {
    require(mean.length == se.length)
    val l1 = new Array[Double](mean.length); val l2 = new Array[Double](mean.length)
    val u1 = new Array[Double](mean.length); val u2 = new Array[Double](mean.length)
    var i = 0
    while (i < mean.length) {
      l1(i) = mean(i) - Stats.Z80 * se(i); l2(i) = mean(i) - Stats.Z95 * se(i)
      u1(i) = mean(i) + Stats.Z80 * se(i); u2(i) = mean(i) + Stats.Z95 * se(i)
      i += 1
    }
    Forecasts(l1, l2, mean, u1, u2)
  }
  /** One-band methods duplicate their single interval into both levels —
    * bagged ETS (R:216-217) and Prophet (R:381-382). */
  def singleBand(mean: Array[Double], lower: Array[Double], upper: Array[Double]): Forecasts =
    Forecasts(lower, lower.clone(), mean, upper, upper.clone())
}

object Stats {
  /** qnorm(0.90) / qnorm(0.975) — the z multipliers behind forecast()'s
    * default `level = c(80, 95)` intervals (R:99-100). */
  val Z80 = 1.2815515655446004
  val Z95 = 1.959963984540054

  def mean(x: Array[Double]): Double = {
    var s = 0.0; var i = 0
    while (i < x.length) { s += x(i); i += 1 }
    s / x.length
  }
  /** Sample standard deviation (n-1 denominator) — matches DuckDB/Spark
    * `stddev_samp` for the oracle-checkable closed-form methods. */
  def stddevSamp(x: Array[Double]): Double = {
    if (x.length < 2) return 0.0
    val m = mean(x)
    var s = 0.0; var i = 0
    while (i < x.length) { val d = x(i) - m; s += d * d; i += 1 }
    math.sqrt(s / (x.length - 1))
  }
  def diff(x: Array[Double], lag: Int = 1): Array[Double] = {
    if (x.length <= lag) return Array.empty
    val out = new Array[Double](x.length - lag)
    var i = lag
    while (i < x.length) { out(i - lag) = x(i) - x(i - lag); i += 1 }
    out
  }
}

/** Method registry — mirrors `stringMethods` (R:6-7) byte-identically for
  * API parity (`getAvailableMethods`, R:12-14), plus the engine's own
  * closed-form extension methods (SURVEY.md §7 minimum slice).
  */
object Methods {
  // positional indexing into this vector IS the reference's dispatch (R:87, R:370)
  val ARIMA = "ARIMA"
  val ARIMA_FORCE_SEASONALITY = "ARIMA_FORCE_SEASONALITY"
  val THETA = "THETA"
  val ETS = "ETS"
  val ETSDAMPED = "ETSDAMPED"
  val BAGGEDETS = "BAGGEDETS"
  val STL = "STL"
  val NN = "NN"
  val HYBRID = "HYBRID"
  val PROPHET = "PROPHET"

  /** `getAvailableMethods()` parity (R:12-14). */
  val reference: Seq[String] = Seq(
    ARIMA, ARIMA_FORCE_SEASONALITY, THETA, ETS, ETSDAMPED,
    BAGGEDETS, STL, NN, HYBRID, PROPHET)

  // engine extensions: deterministic closed-form baselines (not in reference)
  val NAIVE = "NAIVE"
  val SNAIVE = "SNAIVE"
  val DRIFT = "DRIFT"
  val MEANF = "MEANF"
  /** Fixed-α simple exponential smoothing — the one recursive-state
    * method whose level the DuckDB oracle can replay exactly
    * (list_reduce), hash-checking the engine's state recursion. */
  val SES = "SES"
  val extensions: Seq[String] = Seq(NAIVE, SNAIVE, DRIFT, MEANF, SES)

  /** Component-only method: TBATS is forecastHybrid's sixth default
    * component (R:324-332) — fit/forecast/save/load all work, but it is
    * not part of the reference's public 10-method catalog (R:6-7). */
  val TBATS = "TBATS"

  val all: Seq[String] = (reference ++ extensions) :+ TBATS
}
