package graft.models

import graft.core.Forecasts

/** Typed replacement for the reference's opaque saved-RDS model object
  * (R:47/R:54): every fitted model reduces to a schema'd parameter record
  * (`dparams` numeric arrays + `sparams` strings) that round-trips through
  * the Parquet model store — no binary blobs, no java serialization.
  */
final case class ModelParams(
    dparams: Map[String, Array[Double]],
    sparams: Map[String, String]) {
  def d(key: String): Array[Double] = dparams(key)
  def d1(key: String): Double = dparams(key)(0)
  def s(key: String): String = sparams(key)
}

/** A fitted per-series model: can forecast h steps ahead (the generic
  * `forecast(model, h)` the reference calls in every forecastX, e.g.
  * R:97-102) and serialize itself to typed params.
  */
trait SeriesModel extends Serializable {
  def method: String
  def forecast(h: Int): Forecasts
  def params: ModelParams
}

/** One forecasting method family: fit from raw values (the trainXModel
  * body) and rehydrate from stored params (the load path, R:50-55).
  * `fit` runs inside a single executor task on one series (≤10k points).
  */
trait ModelFamily extends Serializable {
  def method: String
  def fit(values: Array[Double], frequency: Int): SeriesModel
  def fromParams(p: ModelParams): SeriesModel
}
