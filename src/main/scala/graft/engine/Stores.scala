package graft.engine

import org.apache.hadoop.fs.Path
import org.apache.spark.sql.{DataFrame, SaveMode, SparkSession}
import org.apache.spark.sql.functions._

import graft.core.ForecastPoint
import graft.models.ModelParams

/** Key sanitization + composition — `gsub("[^[:alnum:] ]", "", name)` and
  * the `clean_index_method` filename (R:43, R:45, repeated at R:51-53,
  * R:58-60, R:66-68). ASCII alnum + space semantics.
  */
object Names {
  def sanitize(name: String): String = name.replaceAll("[^a-zA-Z0-9 ]", "")
  def key(name: String, index: String, method: String): String =
    s"${sanitize(name)}_${index}_$method"
}

/** Base class for the two Parquet-backed stores that replace the
  * reference's RDS file trees (`forecastModels` R:8, `forecastsCache`
  * R:9). Identity stays "one directory per (cleanName, index, method)"
  * exactly as the reference keys files (R:45-46), but the payload is a
  * schema'd Parquet table. Existence checks go through the Hadoop
  * FileSystem API so the same code addresses HDFS/S3 on a real cluster.
  */
abstract class KeyedStore(spark: SparkSession, baseDir: String) {
  protected def path(name: String, index: String, method: String): String =
    s"$baseDir/${Names.key(name, index, method)}"

  def exists(name: String, index: String, method: String): Boolean = {
    val p = new Path(path(name, index, method))
    val fs = p.getFileSystem(spark.sparkContext.hadoopConfiguration)
    fs.exists(p)
  }
}

/** The model store (R:8, save R:91 / load R:112 / exists-check R:57-62).
  * One row per saved model: two map columns hold the typed params.
  */
final class ModelStore(spark: SparkSession, baseDir: String)
    extends KeyedStore(spark, baseDir) {
  import spark.implicits._

  def save(name: String, index: String, method: String, params: ModelParams): Unit =
    Seq((params.dparams.map { case (k, v) => (k, v.toSeq) }, params.sparams))
      .toDF("dparams", "sparams")
      .write.mode(SaveMode.Overwrite).parquet(path(name, index, method))

  def load(name: String, index: String, method: String): ModelParams = {
    val row = spark.read.parquet(path(name, index, method))
      .as[(Map[String, Seq[Double]], Map[String, String])]
      .head()
    ModelParams(row._1.map { case (k, v) => (k, v.toArray) }, row._2)
  }
}

/** Observation-store stamp recorded at train time (round-14 engine
  * extension — the signal [[graft.streaming.EventIngest]]'s scaladoc
  * promises): `(n_obs, max_ts)` of the EFFECTIVE series window (the
  * oldest-`MaxSeriesLength` capped, null-filtered observation set the
  * fit actually saw). `Engine.invalidateOnIngest` compares the current
  * window against this stamp; a streamed append that changes the
  * window invalidates both the model and its cache. Two longs per
  * (name, index, method) — metadata-scale by construction. */
final class StampStore(spark: SparkSession, baseDir: String)
    extends KeyedStore(spark, baseDir) {
  import spark.implicits._

  def save(name: String, index: String, method: String, nObs: Long, maxTs: Long): Unit =
    Seq((nObs, maxTs)).toDF("n_obs", "max_ts")
      .write.mode(SaveMode.Overwrite).parquet(path(name, index, method))

  def matches(name: String, index: String, method: String, nObs: Long, maxTs: Long): Boolean =
    exists(name, index, method) && {
      spark.read.parquet(path(name, index, method))
        .as[(Long, Long)].head() == ((nObs, maxTs))
    }
}

/** The forecast cache (R:9, validity R:64-82, slice-on-hit R:110).
  * Payload = the long-form ForecastPoint contract; validity is
  * `max(step) >= horizon`, the long-form equivalent of the reference's
  * `length(forecasts$mean) >= horizon` (R:71).
  */
final class ForecastCache(spark: SparkSession, baseDir: String)
    extends KeyedStore(spark, baseDir) {
  import spark.implicits._

  def save(name: String, index: String, method: String, points: DataFrame): Unit =
    points.write.mode(SaveMode.Overwrite).parquet(path(name, index, method))

  def isValid(name: String, index: String, method: String, horizon: Int): Boolean =
    exists(name, index, method) && {
      spark.read.parquet(path(name, index, method))
        .agg(max("step")).as[Int].head() >= horizon
    }

  /** Cache hit: pure slice, no model math (R:110 / R:149). */
  def loadSliced(name: String, index: String, method: String, horizon: Int): DataFrame =
    spark.read.parquet(path(name, index, method))
      .filter(col("step") <= horizon)

  def toDF(points: Seq[ForecastPoint]): DataFrame = points.toDF()
}
