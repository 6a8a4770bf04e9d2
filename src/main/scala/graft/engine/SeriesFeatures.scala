package graft.engine

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

import graft.sources.SeriesStore

/** Per-element screening features — the table a user reads BEFORE
  * choosing a method from the catalog (is there trend? persistence? is
  * the series long enough?): observation count, mean, sample std, OLS
  * trend slope over the positional clock, and lag-1 autocorrelation.
  *
  * Determinism contract (the house rule for cross-engine doubles):
  * every sum is an exact DECIMAL(18,4)-based accumulation (values are
  * 4dp in the store — the cast is lossless, proven by the existing
  * decimal oracles), step sums are exact BIGINTs, and each feature is
  * then ONE fixed sequence of double ops over those exact sums —
  * closed-form moments, slope = (nΣxy − ΣxΣy)/(nΣx² − (Σx)²), and r1 =
  * the Pearson correlation of (y_t, y_{t−1}) pairs from conditional
  * sums — so Spark and DuckDB execute identical IEEE arithmetic and
  * the 6dp-rounded outputs hash-match.
  *
  * Scale shape: the lag window and the aggregate share the element
  * partitioning — ONE shuffle total (the fit path's own bound), output
  * one row per element. Degenerate guards: slope NULL at n = 1, r1
  * NULL when either side of the pair correlation has zero variance
  * (constant series) or n < 3.
  */
object SeriesFeatures {

  def seriesFeatures(spark: SparkSession, sfDir: String): DataFrame = {
    val w = Window.partitionBy(col("element")).orderBy(col("x"))
    val d = SeriesStore.seriesDF(spark, sfDir)
      .select(col("element"), col("step").cast("long").as("x"),
        col("value").cast("decimal(18,4)").as("y"))
      .withColumn("yp", lag(col("y"), 1).over(w))
    val pair = col("yp").isNotNull
    val agg = d.groupBy(col("element")).agg(
      count(lit(1)).as("n"),
      sum(col("y")).as("sy"),
      sum(col("y") * col("y")).as("syy"),
      sum(col("x")).as("sx"),
      sum(col("x") * col("x")).as("sxx"),
      sum(col("y") * col("x")).as("sxy"),
      count(when(pair, 1)).as("n1"),
      sum(when(pair, col("y") * col("yp"))).as("sab"),
      sum(when(pair, col("yp"))).as("sa"),
      sum(when(pair, col("y"))).as("sb"),
      sum(when(pair, col("yp") * col("yp"))).as("saa"),
      sum(when(pair, col("y") * col("y"))).as("sbb"))
    def dbl(c: String) = col(c).cast("double")
    val nD = dbl("n"); val n1D = dbl("n1")
    val mean = dbl("sy") / nD
    val varE = (dbl("syy") - dbl("sy") * dbl("sy") / nD) / (nD - lit(1.0))
    val slopeDen = nD * dbl("sxx") - dbl("sx") * dbl("sx")
    val slope = (nD * dbl("sxy") - dbl("sx") * dbl("sy")) / nullif(slopeDen, lit(0.0))
    val covN = n1D * dbl("sab") - dbl("sa") * dbl("sb")
    val varA = n1D * dbl("saa") - dbl("sa") * dbl("sa")
    val varB = n1D * dbl("sbb") - dbl("sb") * dbl("sb")
    val r1 = covN / nullif(sqrt(varA * varB), lit(0.0))
    agg.select(col("element"), col("n").as("n_obs"),
        round(mean, 6).as("mean"),
        round(sqrt(greatest(varE, lit(0.0))), 6).as("std"),
        round(slope, 6).as("slope"),
        round(when(col("n1") >= 2, r1), 6).as("r1"))
      .orderBy(col("element"))
  }
}
