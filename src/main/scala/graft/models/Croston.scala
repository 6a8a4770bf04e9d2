package graft.models

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

/** Croston's method for INTERMITTENT demand — the forecast family the
  * reference's ten continuous-series methods cannot serve (an SES fit
  * on a mostly-zero series chases the zeros; Croston, Int. J. of
  * Forecasting's standard answer, smooths the nonzero demand SIZES and
  * the inter-demand INTERVALS separately and forecasts their ratio).
  * Extension family beyond `TimeSeriesFunctions_GPL_0.5.1.R:6-14`'s
  * method list, applied to the per-element CALENDAR demand series
  * (daily decimal-exact totals, absent days = exact zero demand — the
  * densified view `series_gapfill` introduced).
  *
  * Exactness contract (what makes this the first fully DuckDB-
  * hash-verified fit family beyond the closed forms): demands enter as
  * ONE `CAST(decimal-sum AS DOUBLE)`; both recursions are the literal
  * IEEE sequence `s + 0.1·(obs − s)` in step order; the forecast is one
  * division `z/p`, rounded at 6dp. The oracle replays the identical
  * recursion as a recursive CTE.
  *
  * Scale shape: one (element, day) aggregate shuffle; the calendar
  * spine explodes map-side from per-element min/max; the recursion is a
  * secondary-sorted `mapPartitions` linear scan with O(1) state per
  * element (the CUSUM/EWMA discipline) — raw events are touched once.
  */
object Croston {

  val Alpha = 0.1
  val Horizon = 7

  def forecast(spark: SparkSession, sfDir: String): DataFrame =
    rates(spark, sfDir)
      .crossJoin(spark.range(1, Horizon + 1).select(col("id").as("step")))
      .select(col("element"), col("step"),
        round(col("z") / col("p"), 6).as("mean"))
      .orderBy(col("element"), col("step"))

  /** Bias-corrected Croston variants — the standard intermittent-demand
    * set (Syntetos-Boylan Approximation and the Shale-Boylan-Johnston
    * correction) next to the classic ratio: Croston's z/p is biased
    * upward because E[1/p] > 1/E[p]; SBA multiplies by (1 − α/2)
    * (Syntetos & Boylan 2005), SBJ by (1 − α/(2−α)) (Shale, Boylan &
    * Johnston 2006, the Poisson-arrival correction). Both are ONE
    * constant multiply over the same SES recursions, so the oracle
    * replays them exactly; the classic ratio is emitted alongside so
    * the bias correction is visible in one frame. */
  def forecastVariants(spark: SparkSession, sfDir: String): DataFrame = {
    val fSba = 1.0 - Alpha / 2.0
    val fSbj = 1.0 - Alpha / (2.0 - Alpha)
    rates(spark, sfDir)
      .crossJoin(spark.range(1, Horizon + 1).select(col("id").as("step")))
      .select(col("element"), col("step"),
        explode(array(
          struct(lit("CROSTON").as("variant"),
            round(col("z") / col("p"), 6).as("mean")),
          struct(lit("SBA").as("variant"),
            round(lit(fSba) * (col("z") / col("p")), 6).as("mean")),
          struct(lit("SBJ").as("variant"),
            round(lit(fSbj) * (col("z") / col("p")), 6).as("mean")))).as("v"))
      .select(col("element"), col("v.variant").as("variant"),
        col("step"), col("v.mean").as("mean"))
      .orderBy(col("element"), col("variant"), col("step"))
  }

  /** Teunter–Syntetos–Babai (TSB, 2011) — the third member of the
    * standard intermittent-demand set next to Croston and SBA, and the
    * one that handles OBSOLESCENCE: Croston's interval estimate freezes
    * after the last demand (a product that stops selling keeps its old
    * forecast forever), while TSB smooths the demand PROBABILITY on
    * EVERY period — `d_t = 1{x_t > 0}`, `p ← p + α·(d_t − p)` — so a
    * dying stream decays the forecast toward zero geometrically. Sizes
    * smooth only on demand days exactly as Croston (`z ← z + α·(x − z)`)
    * and the forecast is the product `p·z`, flat over the horizon.
    *
    * Same exactness contract as the Croston/SBA recursions: both state
    * updates are the literal IEEE sequence at the shared [[Alpha]], the
    * forecast is one multiply rounded at 6dp, and the oracle replays
    * the recursion step-for-step as a recursive CTE (the probability
    * branch updates at every spine day, which the oracle mirrors with
    * an unconditional `p + 0.1·(d − p)` term). */
  def forecastTsb(spark: SparkSession, sfDir: String): DataFrame =
    tsbStates(spark, sfDir)
      .crossJoin(spark.range(1, Horizon + 1).select(col("id").as("step")))
      .select(col("element"), col("step"),
        round(col("z") * col("p"), 6).as("mean"))
      .orderBy(col("element"), col("step"))

  /** Final (z, p) TSB state per element: z = smoothed demand size
    * (demand days only), p = smoothed demand probability (every day).
    * Elements with no demand at all emit nothing (no size estimate
    * exists — the croston convention). */
  private def tsbStates(spark: SparkSession, sfDir: String): DataFrame = {
    import spark.implicits._
    densifiedDaily(spark, sfDir)
      .select(col("element"), col("day").cast("string").as("day_s"), col("x"))
      .as[(String, String, Double)]
      .repartition(col("element"))
      .sortWithinPartitions(col("element"), col("day_s"))
      .mapPartitions { it =>
        val out = scala.collection.mutable.ArrayBuffer.empty[(String, Double, Double)]
        var cur: String = null
        var z = Double.NaN; var p = Double.NaN
        def flush(): Unit =
          if (cur != null && !z.isNaN) out += ((cur, z, p))
        for ((el, _, x) <- it) {
          if (el != cur) { flush(); cur = el; z = Double.NaN; p = Double.NaN }
          val d = if (x > 0.0) 1.0 else 0.0
          p = if (p.isNaN) d else p + Alpha * (d - p)
          if (x > 0.0) z = if (z.isNaN) x else z + Alpha * (x - z)
        }
        flush()
        out.iterator
      }
      .toDF("element", "z", "p")
  }

  /** The densified calendar demand series every intermittent-demand
    * consumer shares: per-element daily decimal-exact totals on a
    * gap-free day spine (absent days = exact zero demand). */
  private[graft] def densifiedDaily(spark: SparkSession, sfDir: String): DataFrame = {
    val ev = graft.sources.Tables.events(spark, sfDir)
    val dayCol = ev.schema("ts").dataType match {
      case org.apache.spark.sql.types.LongType => graft.sources.Tables.tsDay("ts")
      case _ => to_date(col("ts"))
    }
    val daily = ev
      .filter(col("event_type").isNotNull && col("ts").isNotNull && col("value").isNotNull)
      .select(col("event_type").as("element"), dayCol.as("day"), col("value"))
      .groupBy(col("element"), col("day"))
      .agg(sum(col("value").cast("decimal(18,4)")).as("s"))
    val spine = daily.groupBy(col("element"))
      .agg(min(col("day")).as("d0"), max(col("day")).as("d1"))
      .select(col("element"), explode(sequence(col("d0"), col("d1"))).as("day"))
    spine.join(daily, Seq("element", "day"), "left")
      .select(col("element"), col("day"),
        coalesce(col("s").cast("double"), lit(0.0d)).as("x"))
  }

  /** The shared smoothed (demand-size z, interval p) state behind every
    * variant: SES recursions at [[Alpha]] over the densified calendar
    * demand series (one row per element). */
  private def rates(spark: SparkSession, sfDir: String): DataFrame = {
    import spark.implicits._
    val densified = densifiedDaily(spark, sfDir)
    densified
      .select(col("element"), col("day").cast("string").as("day_s"), col("x"))
      .as[(String, String, Double)]
      .repartition(col("element"))
      .sortWithinPartitions(col("element"), col("day_s"))
      .mapPartitions { it =>
        // per-element linear scan; emit (element, z, p) at boundaries
        val out = scala.collection.mutable.ArrayBuffer.empty[(String, Double, Double)]
        var cur: String = null
        var z = Double.NaN; var p = Double.NaN; var q = 1L
        def flush(): Unit =
          if (cur != null && !z.isNaN) out += ((cur, z, p))
        for ((el, _, x) <- it) {
          if (el != cur) { flush(); cur = el; z = Double.NaN; p = Double.NaN; q = 1L }
          if (x > 0.0) {
            // interval uses the PRE-update counter; p before z so the
            // "first demand" test sees the old state
            p = if (z.isNaN) q.toDouble else p + Alpha * (q.toDouble - p)
            z = if (z.isNaN) x else z + Alpha * (x - z)
            q = 1L
          } else q += 1L
        }
        flush()
        out.iterator
      }
      .toDF("element", "z", "p")
  }
}
