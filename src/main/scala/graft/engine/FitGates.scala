package graft.engine

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

import graft.core.Methods
import graft.sources.SeriesStore

/** In-driver regression tripwire for the model-fit families — the
  * `ann_recall_gates` pattern applied to the forecast surface: the ten
  * reference methods (TimeSeriesFunctions_GPL_0.5.1.R:6-7) plus TBATS
  * are fit-internals-deep and not SQL-expressible, so their registered
  * queries are rows-only; this query distills each family's output into
  * cheap deterministic invariants and emits only (metric, ok) verdict
  * rows against a literal-TRUE oracle. A numeric regression — NaN
  * bands, inverted intervals, a dropped horizon row — now hash-
  * mismatches in the driver's correctness check instead of hiding
  * behind a rows-only record.
  *
  * Invariants per method (each aggregated over every series):
  *  - `h_rows`: exactly `horizon` forecast rows per series;
  *  - `bands_nested`: lower2 ≤ lower1 ≤ mean ≤ upper1 ≤ upper2 on every
  *    row (the 95% band contains the 80% band; single-band methods
  *    duplicate their band, so equality is allowed — R:216-217);
  *  - `finite`: every emitted number is finite (no NaN/Inf escaped the
  *    optimizer).
  *
  * Cost control: the fits run on the LAST [[SliceLen]] observations of
  * each series, not the full history — these are structural invariants
  * of the fit/forecast code path, not accuracy statements, and every
  * seasonality branch still engages (128 ≥ 3·frequency). The full-
  * history numeric behavior stays covered by the golden/calibration
  * suites; this query is the cheap always-on driver-side tripwire.
  * Fan-out shape is the engine's own: one (series × method) fit per
  * executor task, verdict reduce on (method) — params-only shuffles.
  */
object FitGates {

  /** Fit-slice length: long enough that every family takes its real
    * code path (seasonal ARIMA needs 3·freq = 21, NN's lag structure
    * ~4·freq, STL two full periods), short enough that all ~55 fits
    * cost ~a second on 32 cores. */
  val SliceLen = 128

  /** The rows-only families under gate: the reference's ten methods
    * (R:6-7) plus the TBATS component — every method whose registered
    * query has no DuckDB oracle. */
  val GatedMethods: Seq[String] =
    Methods.reference :+ Methods.TBATS

  def fitQualityGates(spark: SparkSession, sfDir: String,
      frequency: Int, horizon: Int): DataFrame = {
    import spark.implicits._
    val f = frequency
    val h = horizon
    val methods = GatedMethods
    val crossed = SeriesStore.series(spark, sfDir)
      .flatMap(s => methods.map(m => (m, s.element, s.values.takeRight(SliceLen))))
      .repartition(spark.sparkContext.defaultParallelism)
    val verdicts = crossed.map { case (m, el, y) =>
      val fc = Families.byMethod(m).fit(y, f).forecast(h)
      val all = fc.lower1 ++ fc.lower2 ++ fc.mean ++ fc.upper1 ++ fc.upper2
      val rowsOk = Seq(fc.lower1, fc.lower2, fc.mean, fc.upper1, fc.upper2)
        .forall(_.length == h)
      val nested = rowsOk && (0 until h).forall(i =>
        fc.lower2(i) <= fc.lower1(i) && fc.lower1(i) <= fc.mean(i) &&
          fc.mean(i) <= fc.upper1(i) && fc.upper1(i) <= fc.upper2(i))
      val finite = all.forall(java.lang.Double.isFinite)
      (m, el, rowsOk, nested, finite)
    }.toDF("method", "element", "rows_ok", "nested", "finite")
    verdicts.groupBy(col("method"))
      .agg(every(col("rows_ok")).as("h_rows"),
        every(col("nested")).as("bands_nested"),
        every(col("finite")).as("finite"))
      .select(explode(array(
        struct(concat(lower(col("method")), lit("_h_rows")).as("metric"), col("h_rows").as("ok")),
        struct(concat(lower(col("method")), lit("_bands_nested")).as("metric"), col("bands_nested").as("ok")),
        struct(concat(lower(col("method")), lit("_finite")).as("metric"), col("finite").as("ok")))).as("v"))
      .select(col("v.metric").as("metric"), col("v.ok").as("ok"))
      .orderBy(col("metric"))
  }
}
