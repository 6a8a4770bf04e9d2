package graft.engine

import org.apache.spark.sql.{DataFrame, Dataset, SparkSession}

import graft.core.{ForecastPoint, Methods}
import graft.models._
import graft.sources.{Series, SeriesStore}

/** Family registry — the engine's analogue of positional dispatch into
  * `stringMethods` (R:6-7, used at R:87, R:105, R:370). */
object Families {
  import NaiveFamilies._
  def byMethod(method: String): ModelFamily = method match {
    case Methods.NAIVE  => Naive
    case Methods.SNAIVE => SNaive
    case Methods.DRIFT  => Drift
    case Methods.MEANF  => Meanf
    case other          => registryExtra.getOrElse(other,
      throw new IllegalArgumentException(s"unknown method: $other"))
  }
  /** Filled in as model families land (ETS, ARIMA, ...). */
  @volatile var registryExtra: Map[String, ModelFamily] = Map.empty
}

/** Distributed fit + forecast: each series is one group, fitted inside one
  * executor task (`groupByKey.mapGroups` shape — SURVEY.md §2.2-J), then
  * expanded to h contract rows. The driver holds only plans and keys.
  */
object Forecaster {

  /** Fit `method` on every series and emit h forecast rows per series.
    * One shuffle (series materialization); fit math never leaves the
    * executors. */
  def forecastAll(
      spark: SparkSession,
      series: Dataset[Series],
      method: String,
      frequency: Int,
      horizon: Int): Dataset[ForecastPoint] = {
    import spark.implicits._
    val m = method // avoid capturing outer refs
    val f = frequency
    val h = horizon
    series.flatMap { s =>
      val model = Families.byMethod(m).fit(s.values, f)
      model.forecast(h).toPoints(s.element, m)
    }
  }

  /** Convenience: forecast every element in the store. */
  def forecastStore(
      spark: SparkSession,
      sfDir: String,
      method: String,
      frequency: Int,
      horizon: Int,
      elements: Seq[String] = Nil): DataFrame = {
    import spark.implicits._
    forecastAll(spark, SeriesStore.series(spark, sfDir, elements), method, frequency, horizon)
      .toDF()
      .orderBy("element", "step")
  }
}

/** The generic wrapper skeleton shared by all 7 reference wrappers
  * (R:104-124 etc.): 3-way branch —
  *  (a) model + valid cache  → load cache, slice to horizon (R:109-110);
  *  (b) model, stale cache   → re-forecast from saved params, refresh
  *                             cache (R:112-114);
  *  (c) miss                 → train (warming a 14-step cache, R:92-93),
  *                             forecast, persist cache only if
  *                             horizon > 14 (R:119-121).
  * So the cache always holds max(14, largest horizon seen since the last
  * train). Implemented once, generically, for every method family.
  */
final class Engine(spark: SparkSession, baseDir: String) {
  import spark.implicits._

  /** `forecastsCacheLength <- 14` (R:10). */
  val cacheLength: Int = 14

  val models = new ModelStore(spark, s"$baseDir/forecastModels")
  val cache = new ForecastCache(spark, s"$baseDir/forecastsCache")

  /** `getAvailableMethods()` (R:12-14). */
  def availableMethods: Seq[String] = Methods.reference

  private def fitOne(name: String, sfDir: String, method: String, frequency: Int): SeriesModel = {
    val family = Families.byMethod(method)
    val f = frequency
    // fit runs in an executor task (one series ≤ 10k points), not the driver
    SeriesStore.series(spark, sfDir, Seq(name))
      .map(s => ParamsRow.from(family.fit(s.values, f).params))
      .head() match { case row => family.fromParams(row.toParams) }
  }

  private def pointsDF(name: String, method: String, model: SeriesModel, h: Int): DataFrame =
    model.forecast(h).toPoints(name, method).toDF()

  /** The generic `forecastXWrapper` (R:104-124 / 143-163 / 182-202 / ...). */
  def forecast(name: String, sfDir: String, method: String, frequency: Int, horizon: Int): DataFrame = {
    val index = indexName(sfDir)
    if (models.exists(name, index, method)) {
      if (cache.isValid(name, index, method, horizon)) {
        cache.loadSliced(name, index, method, horizon) // (a) pure slice, no math
      } else {
        // (b) re-forecast from the persisted typed params — no refit
        val model = Families.byMethod(method).fromParams(models.load(name, index, method))
        val pts = pointsDF(name, method, model, horizon)
        cache.save(name, index, method, pts)
        pts
      }
    } else {
      // (c) full train; training itself warms a cacheLength-step cache
      val model = fitOne(name, sfDir, method, frequency)
      models.save(name, index, method, model.params)
      cache.save(name, index, method, pointsDF(name, method, model, cacheLength))
      val pts = pointsDF(name, method, model, horizon)
      if (horizon > cacheLength) cache.save(name, index, method, pts)
      pts
    }
  }

  /** The reference keys stores by ES index name; the engine keys by the
    * store directory's basename (e.g. "sf0.01"). */
  def indexName(sfDir: String): String =
    sfDir.stripSuffix("/").split('/').last
}

/** Encoder-friendly row shape for shipping ModelParams off executors. */
final case class ParamsRow(dk: Array[String], dv: Array[Array[Double]], sk: Array[String], sv: Array[String]) {
  def toParams: ModelParams = ModelParams(dk.zip(dv).toMap, sk.zip(sv).toMap)
}
object ParamsRow {
  def from(p: ModelParams): ParamsRow = {
    val d = p.dparams.toArray.sortBy(_._1)
    val s = p.sparams.toArray.sortBy(_._1)
    ParamsRow(d.map(_._1), d.map(_._2), s.map(_._1), s.map(_._2))
  }
}
