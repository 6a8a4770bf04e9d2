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
