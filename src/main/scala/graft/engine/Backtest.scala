package graft.engine

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

/** Rolling-origin-free holdout backtest of the closed-form forecast
  * families — the accuracy-measurement step the reference leaves to its
  * caller (`TimeSeriesFunctions_GPL_0.5.1.R` trains and forecasts but
  * never scores): hold out the last `h` points of every series, forecast
  * them with each closed-form method trained on the prefix, and report
  * MAE/RMSE per (element, method).
  *
  * Only the CLOSED-FORM families (naive / drift / meanf — the methods
  * whose point forecasts are single algebraic expressions of prefix
  * stats) are registered here, because exactly those make the backtest
  * DuckDB-oracle-checkable end to end: the oracle re-derives forecast,
  * error, and both metrics from the same positional series. The
  * iterative families get their accuracy surface from CalibrationSpec +
  * `fit_quality_gates` instead.
  *
  * Scale shape: rides the session-cached [[graft.sources.SeriesStore]]
  * series table (one (element, values) row per series, ≤10k points —
  * the reference's own cap); the per-series compute is a single task's
  * arithmetic, the output is 3 rows per element. Arithmetic mirrors the
  * oracle exactly: double ops in h order, one division per mean, round
  * at the end.
  */
object Backtest {

  /** Inverse-MAE ensemble of the closed-form families — the
    * accuracy-WEIGHTED combination step that closes the backtest loop
    * (the reference's HYBRID averages its components equally,
    * `TimeSeriesFunctions_GPL_0.5.1.R:330`; production combiners weight
    * by validated error instead). Per element: the [[closedFormBacktest]]
    * holdout MAEs (6dp-rounded, the hash-verified quantities) become
    * weights w_m = 1/(mae_m + 1e-9), and the future h-step forecast is
    * the w-weighted mean of the three full-series closed-form points.
    * Every weight/combination op is plain double arithmetic in a FIXED
    * literal order (naive, drift, meanf — no aggregation exists whose
    * order could differ between engines), so the oracle replays the
    * identical IEEE sequence. Fully DuckDB-hash-verified end to end:
    * backtest errors → weights → combined forecast.
    *
    * Scale shape: one pass over the session-cached series table;
    * backtest + forecast arithmetic run in the same task per series;
    * output is h rows per element. */
  def ensembleForecast(spark: SparkSession, sfDir: String, h: Int = 7): DataFrame = {
    import spark.implicits._
    import java.math.{BigDecimal => JBD, RoundingMode => RM}
    def r6(x: Double): Double = JBD.valueOf(x).setScale(6, RM.HALF_UP).doubleValue()
    val out = graft.sources.SeriesStore.series(spark, sfDir).flatMap { s =>
      val v = s.values
      val n = v.length
      if (n <= 2 * h) Iterator.empty
      else {
        // holdout MAEs — the exact closedFormBacktest quantities
        val ntr = n - h
        val lastT = v(ntr - 1); val firstT = v(0)
        val muT = v.take(ntr).sum / ntr
        def mae(f: Int => Double): Double =
          r6((1 to h).map(i => math.abs(v(ntr + i - 1) - f(i))).sum / h)
        val maeN = mae(_ => lastT)
        val maeD = mae(i => lastT + (lastT - firstT) / (ntr - 1.0) * i)
        val maeM = mae(_ => muT)
        val wN = 1.0 / (maeN + 1.0e-9)
        val wD = 1.0 / (maeD + 1.0e-9)
        val wM = 1.0 / (maeM + 1.0e-9)
        val wSum = wN + wD + wM
        // full-series closed-form points for the FUTURE steps
        val last = v(n - 1); val first = v(0)
        val mu = v.sum / n
        (1 to h).iterator.map { i =>
          val fN = last
          val fD = last + (last - first) / (n - 1.0) * i
          val fM = mu
          val fc = (wN * fN + wD * fD + wM * fM) / wSum
          (s.element, i.toLong, r6(wN / wSum), r6(wD / wSum), r6(wM / wSum), r6(fc))
        }
      }
    }.toDF("element", "step", "w_naive", "w_drift", "w_meanf", "forecast")
    out.orderBy(col("element"), col("step"))
  }

  def closedFormBacktest(spark: SparkSession, sfDir: String, h: Int = 7): DataFrame = {
    import spark.implicits._
    val out = graft.sources.SeriesStore.series(spark, sfDir).flatMap { s =>
      val v = s.values
      val n = v.length
      // need a train prefix at least as long as the holdout (oracle: n > 2h)
      if (n <= 2 * h) Iterator.empty
      else {
        val ntr = n - h
        val last = v(ntr - 1)
        val first = v(0)
        val mu = v.take(ntr).sum / ntr
        def errs(f: Int => Double): Seq[Double] =
          (1 to h).map(i => v(ntr + i - 1) - f(i))
        Iterator(
          (s.element, "DRIFT", errs(i => last + (last - first) / (ntr - 1.0) * i)),
          (s.element, "MEANF", errs(_ => mu)),
          (s.element, "NAIVE", errs(_ => last))
        ).map { case (el, m, es) =>
          (el, m, es.map(math.abs).sum / h, math.sqrt(es.map(e => e * e).sum / h))
        }
      }
    }.toDF("element", "method", "mae_raw", "rmse_raw")
    out.select(col("element"), col("method"),
      round(col("mae_raw"), 6).as("mae"), round(col("rmse_raw"), 6).as("rmse"))
      .orderBy(col("element"), col("method"))
  }
}
