package graft.ops

import org.apache.spark.sql.{Column, DataFrame, SparkSession}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/** Product/event analytics over the events stream — the three reports
  * every behavioral pipeline runs next to sessionization (engine
  * extension past the reference's per-element time series pull,
  * `TimeSeriesFunctions_GPL_0.5.1.R:23-40`): cohort retention, ordered
  * funnel conversion, and rolling distinct actives. All three are pure
  * declarative plans with DuckDB oracles; the scale posture of each is
  * documented on the method (what shuffles, what it carries, what the
  * bounded expansions are).
  *
  * Clock contract (shared with `Relational.userSessions`): the driver
  * store's `ts` is an epoch-nanos LONG — days and microseconds are
  * derived with exact integer arithmetic (`DIV`), never double math; a
  * synthetic TIMESTAMP store is accepted through the same dual-type
  * branch.
  */
object EventAnalytics {

  /** (user_id, …) events with nulls dropped (a null user or clock is
    * attributable to no one / no time) and the ts normalized to an
    * exact integer microsecond column `tus` plus a calendar `day`. */
  private def userEvents(spark: SparkSession, sfDir: String): DataFrame = {
    val ev = graft.sources.Tables.events(spark, sfDir)
    val (tusCol, dayCol) = ev.schema("ts").dataType match {
      case org.apache.spark.sql.types.LongType =>
        (expr("ts DIV 1000"), graft.sources.Tables.tsDay("ts"))
      case _ => (unix_micros(col("ts")), to_date(col("ts")))
    }
    ev.filter(col("user_id").isNotNull && col("ts").isNotNull)
      .select(col("user_id"), col("event_type"), tusCol.as("tus"), dayCol.as("day"))
  }

  /** Cohort retention matrix: users cohorted by first-active day; for
    * each (cohort_day, day_offset) the count of cohort members active
    * that day and the retention rate vs the cohort size. Offset 0 is
    * the cohort size by construction (the first-seen day is an active
    * day), so `retention` is an exact-integer IEEE division — the
    * oracle hash-compares with no rounding.
    *
    * Scale shape: ONE shuffle on user_id does all the per-user work —
    * `min(day)` and `collect_set(day)` in the same aggregate (the set
    * holds distinct calendar DAYS, bounded by the observation span —
    * ≤365/user-year — never raw events), then the exploded
    * (cohort, offset, user) rows are unique per user so the matrix agg
    * is a plain count over (cohort_day, offset) — a second shuffle of
    * count partials on a |days|² -bounded key space. No joins. */
  def userRetention(spark: SparkSession, sfDir: String): DataFrame = {
    val perUser = userEvents(spark, sfDir)
      .groupBy(col("user_id"))
      .agg(min(col("day")).as("cohort_day"), collect_set(col("day")).as("days"))
    val matrix = perUser
      .select(col("user_id"), col("cohort_day"), explode(col("days")).as("day"))
      .groupBy(col("cohort_day"),
        datediff(col("day"), col("cohort_day")).cast("long").as("day_offset"))
      .agg(count(lit(1)).as("n_active"))
    matrix
      .withColumn("retention",
        col("n_active").cast("double") /
          first(col("n_active")).over(
            Window.partitionBy(col("cohort_day")).orderBy(col("day_offset"))).cast("double"))
      .orderBy(col("cohort_day"), col("day_offset"))
  }

  /** Ordered funnel conversion over the canonical view → click →
    * purchase steps: a user completes step k iff an event of step k's
    * type occurs AT OR AFTER the time they completed step k−1 (ties on
    * the exact microsecond count — "at the same instant" is not
    * "before"). Emits one row per step: users reaching it and the
    * conversion rate vs step 1 (NULL when nobody entered the funnel —
    * `nullif` on both sides, no 0/0).
    *
    * Scale shape: one shuffle on user_id serves all three chained
    * window mins (same partition key → Catalyst plans one Exchange,
    * three Window operators over one sort); the per-user (t1,t2,t3)
    * triple is then distinct-ed (rows carry 4 scalars) and reduced to a
    * SINGLE global row — stacked to 3 output rows driver-side-free. */
  def eventFunnel(spark: SparkSession, sfDir: String,
      steps: Seq[String] = Seq("view", "click", "purchase")): DataFrame = {
    require(steps.length == 3, "eventFunnel is specified for 3-step funnels")
    val w = Window.partitionBy(col("user_id"))
    val perUser = userEvents(spark, sfDir)
      .filter(col("event_type").isin(steps: _*))
      .withColumn("t1", min(when(col("event_type") === steps(0), col("tus"))).over(w))
      .withColumn("t2", min(when(col("event_type") === steps(1)
        && col("tus") >= col("t1"), col("tus"))).over(w))
      .withColumn("t3", min(when(col("event_type") === steps(2)
        && col("tus") >= col("t2"), col("tus"))).over(w))
      .select(col("user_id"), col("t1"), col("t2"), col("t3"))
      .distinct()
    perUser
      .agg(count(when(col("t1").isNotNull, 1)).as("n1"),
        count(when(col("t2").isNotNull, 1)).as("n2"),
        count(when(col("t3").isNotNull, 1)).as("n3"))
      .select(expr(
        s"""stack(3,
           |  1, '${steps(0)}', n1, CAST(n1 AS DOUBLE) / nullif(n1, 0),
           |  2, '${steps(1)}', n2, CAST(n2 AS DOUBLE) / nullif(n1, 0),
           |  3, '${steps(2)}', n3, CAST(n3 AS DOUBLE) / nullif(n1, 0)
           |) AS (step, event_type, n_users, conversion)""".stripMargin))
      .orderBy(col("step"))
  }

  /** Batch EWMA anomaly scan — the backfill twin of the streaming
    * detector (`EventIngest.anomalyStream`): every event is scored
    * z = (x − μ)/σ against the per-element exponentially-weighted
    * mean/variance BEFORE the point updates it, flagged once the state
    * is baked (≥ `minObs` points). Both paths call the SAME
    * `EventIngest.scoreStep`, so stream, batch, and the DuckDB
    * recursive-CTE oracle (which mirrors the operation order literally)
    * agree to the bit; outputs round to 6dp on both sides.
    *
    * Scale shape: recursive state has no relational form, so this is
    * the documented `mapPartitions` tier (SURVEY §2 preference (d)) —
    * but as a SECONDARY SORT, not a buffer: repartition by element,
    * sort within partitions by (element, tus, event_id), then a linear
    * scan that carries O(1) state and never materializes a group. The
    * one shuffle carries (element, tus, id, value); parallelism equals
    * element cardinality — the same keyed-scan bound as the fit
    * surface, and the stream processes the identical recursion
    * incrementally when cardinality is the bottleneck. */
  def ewmaAnomalies(spark: SparkSession, sfDir: String, alpha: Double = 0.1,
      zThreshold: Double = 3.0, minObs: Long = 10L): DataFrame = {
    import spark.implicits._
    val ev = graft.sources.Tables.events(spark, sfDir)
    val tusCol = ev.schema("ts").dataType match {
      case org.apache.spark.sql.types.LongType => expr("ts DIV 1000")
      case _ => unix_micros(col("ts"))
    }
    val scored = ev
      .filter(col("event_type").isNotNull && col("ts").isNotNull && col("value").isNotNull)
      .select(col("event_type").as("element"), tusCol.as("tus"),
        coalesce(col("event_id"), lit(0L)).as("event_id"), col("value").cast("double").as("x"))
      .as[(String, Long, Long, Double)]
      .repartition(col("element"))
      .sortWithinPartitions(col("element"), col("tus"), col("event_id"))
      .mapPartitions { it =>
        var cur: String = null
        var st = graft.streaming.EventIngest.EwmaState(0.0, 0.0, 0L)
        it.map { case (el, tus, _, x) =>
          if (el != cur) {
            cur = el
            st = graft.streaming.EventIngest.EwmaState(0.0, 0.0, 0L)
          }
          val (nst, z, anom) =
            graft.streaming.EventIngest.scoreStep(st, x, alpha, zThreshold, minObs)
          st = nst
          (el, tus, x, nst.mean, z, anom)
        }
      }
      .toDF("element", "tus", "value", "ewma", "zscore", "is_anomaly")
    scored
      .select(col("element"), col("tus"), col("value"),
        round(col("ewma"), 6).as("ewma"), round(col("zscore"), 6).as("zscore"),
        col("is_anomaly"))
      .orderBy(col("element"), col("tus"))
  }

  /** Two-sided CUSUM level-shift detection over each element's DAILY
    * mean — the changepoint monitor that complements [[ewmaAnomalies]]
    * (point outliers) by accumulating small persistent drifts until
    * they cross the decision interval (Page's cumulative-sum scheme;
    * k = 0.5σ slack, h = 5σ interval — the standard tabular CUSUM).
    *
    * Determinism contract (what makes this oracle-checkable): every
    * cross-row reduction is EXACT — daily means come from DECIMAL
    * value sums and BIGINT counts with ONE double division; the
    * reference μ0 is the prefix grand mean of the same exact sums; the
    * reference σ0 is derived from 1e-6-quantized daily means whose
    * squares accumulate in DECIMAL(38,0) — so the only floating-point
    * is a FIXED per-row operation sequence both engines execute
    * identically (sqrt is IEEE-correctly-rounded, the one library
    * function both agree on bit-exactly; pow is not and is never
    * used). The recursion itself (max(0, s + z − k)) is pure IEEE
    * adds/compares, mirrored literally by the DuckDB recursive CTE.
    *
    * Reference window: the first 40% of each element's observed days
    * (integer arithmetic) — scored days are the remaining 60%. A
    * near-constant prefix (σ0 < 1e-9) scores z = 0 like the EWMA
    * guard.
    *
    * Scale shape: the raw scan reduces to (element, day) partials in
    * one shuffle (the same daily-aggregate bound as everything else on
    * this table); prefix stats are an element-keyed aggregate joined
    * back by broadcast (|elements| rows); the recursion runs as a
    * secondary-sorted linear scan over the DAY table — O(days) state
    * rows per element, never raw events. */
  def cusumShifts(spark: SparkSession, sfDir: String,
      k: Double = 0.5, h: Double = 5.0): DataFrame = {
    import spark.implicits._
    val ev = graft.sources.Tables.events(spark, sfDir)
    val dayCol = ev.schema("ts").dataType match {
      case org.apache.spark.sql.types.LongType => graft.sources.Tables.tsDay("ts")
      case _ => to_date(col("ts"))
    }
    val daily = ev
      .filter(col("event_type").isNotNull && col("ts").isNotNull && col("value").isNotNull)
      .select(col("event_type").as("element"), dayCol.as("day"), col("value"))
      .groupBy(col("element"), col("day"))
      .agg(sum(col("value").cast("decimal(18,4)")).as("s"),
        count(lit(1)).cast("long").as("n"))
      .withColumn("m", col("s").cast("double") / col("n").cast("double"))
      .withColumn("q", floor(col("m") * lit(1000000.0d) + lit(0.5d)).cast("long"))
      .withColumn("idx", row_number().over(
        org.apache.spark.sql.expressions.Window
          .partitionBy(col("element")).orderBy(col("day"))))
    // prefix length P = ⌊2D/5⌋ per element (exact integer arithmetic)
    val withP = daily.join(
      broadcast(daily.groupBy(col("element"))
        .agg(count(lit(1)).cast("long").as("d_total"))
        .withColumn("p", (col("d_total") * 2L) / 5L)),
      "element")
    val prefStats = withP.filter(col("idx") <= col("p"))
      .groupBy(col("element"))
      .agg(sum(col("s")).as("ps"), sum(col("n")).as("pn"),
        sum(col("q").cast("decimal(38,0)")).as("pq"),
        sum((col("q").cast("decimal(19,0)") * col("q").cast("decimal(19,0)"))
          .cast("decimal(38,0)")).as("pqq"),
        count(lit(1)).cast("long").as("pd"))
      // μ0 and σ0 via a FIXED double op sequence from exact inputs
      .withColumn("mu0", col("ps").cast("double") / col("pn").cast("double"))
      .withColumn("mq", col("pq").cast("double") / col("pd").cast("double"))
      .withColumn("mqq", col("pqq").cast("double") / col("pd").cast("double"))
      .withColumn("sigma0",
        sqrt(col("mqq") - col("mq") * col("mq")) / lit(1000000.0d))
      .select(col("element"), col("mu0"), col("sigma0"))
    val scored = withP.filter(col("idx") > col("p"))
      .join(broadcast(prefStats), "element")
      .withColumn("z",
        when(col("sigma0") < lit(1e-9d), lit(0.0d))
          .otherwise((col("m") - col("mu0")) / col("sigma0")))
      .select(col("element"), col("day").cast("string").as("day_s"),
        col("m"), col("z"))
      .as[(String, String, Double, Double)]
      .repartition(col("element"))
      .sortWithinPartitions(col("element"), col("day_s"))
      .mapPartitions { it =>
        var cur: String = null
        var sp = 0.0; var sn = 0.0
        it.map { case (el, day, m, z) =>
          if (el != cur) { cur = el; sp = 0.0; sn = 0.0 }
          sp = math.max(0.0, sp + (z - k))
          sn = math.max(0.0, sn + (-z - k))
          (el, day, m, sp, sn, sp > h || sn > h)
        }
      }
      .toDF("element", "day_s", "daily_mean", "cusum_pos", "cusum_neg", "is_shift")
    scored.select(col("element"), col("day_s").cast("date").as("day"),
        round(col("daily_mean"), 6).as("daily_mean"),
        round(col("cusum_pos"), 6).as("cusum_pos"),
        round(col("cusum_neg"), 6).as("cusum_neg"), col("is_shift"))
      .orderBy("element", "day")
  }

  /** Robust (median/MAD) anomaly screen over per-element daily means —
    * the outlier-resistant tier of the anomaly family (EWMA tracks a
    * drifting mean, CUSUM detects sustained level shifts; MAD flags
    * single-day spikes WITHOUT letting the spike itself inflate the
    * scale estimate, which is exactly where z-scores fail).
    *
    * Exactness: the whole decision path is INTEGER arithmetic, so flags
    * hash-verify. Daily mean in micro-units = `(s4 * 100) DIV n` where
    * `s4` is the exact DECIMAL(18,4) day sum ×10⁴ as BIGINT. Medians
    * avoid interpolation (whose IEEE op order differs between engines)
    * by the DOUBLED-median trick: med2 = x(lo) + x(hi) with
    * lo = (n+1) DIV 2, hi = (n+2) DIV 2 — twice the type-7 median,
    * still an exact BIGINT. Deviations dev = |2·m − med2| (scaled 2×),
    * mad2 = dev(lo) + dev(hi) (scaled 4× the MAD), and the flag rule
    * |m − med| > K·MAD becomes the cross-multiplication
    * `2·dev > K·mad2` — no division anywhere. A zero MAD (constant
    * series) degenerates to flagging any deviation, the standard MAD
    * caveat, pinned by fixture.
    *
    * Scale shape: one (element, day) aggregate shuffle; both order
    * statistics are windows partitioned per element over the DAY table
    * (bounded by timeline length); the med/mad join is broadcast
    * (|elements| rows). Nothing touches raw events twice. */
  /** Population Stability Index per event type — the numeric-drift
    * monitor (the metric-feed sibling of the document tier's
    * `corpus_drift`): the observation span splits at its midpoint date,
    * the REFERENCE half defines decile bin edges (exact type-7
    * percentiles, the same quantile family `value_quantiles`
    * hash-verifies), and PSI = Σ (p₂−p₁)·ln(p₂/p₁) over the 10 bins
    * with add-one smoothing (so an emptied bin contributes a finite,
    * interpretable term instead of ±∞). PSI < 0.1 is stable, > 0.25 is
    * actionable drift — the thresholds reporting pipelines standardize
    * on.
    *
    * Scale + float posture: bin edges reduce to a 10-double row per
    * element (broadcast back); binning is a map-side array-lambda
    * count; the only corpus shuffle carries (element, bin, half)
    * count partials. Each PSI term is rounded to 12dp and summed as an
    * exact DECIMAL (order-free, the `term_zipf` trick), then one 6dp
    * round at output — ulp-identical in DuckDB. */
  def valuePsi(spark: SparkSession, sfDir: String): DataFrame = {
    val ev = graft.sources.Tables.events(spark, sfDir)
    val dayCol = ev.schema("ts").dataType match {
      case org.apache.spark.sql.types.LongType => graft.sources.Tables.tsDay("ts")
      case _ => to_date(col("ts"))
    }
    val base = ev
      .filter(col("event_type").isNotNull && col("ts").isNotNull && col("value").isNotNull)
      .select(col("event_type").as("element"), dayCol.as("day"), col("value"))
    val pivot = base.agg(min(col("day")).as("lo"), max(col("day")).as("hi"))
      .select(expr("date_add(lo, CAST(datediff(hi, lo) DIV 2 AS INT))").as("pivot"))
    val halves = base.crossJoin(broadcast(pivot))
      .withColumn("half", when(col("day") < col("pivot"), lit("ref")).otherwise(lit("cur")))
    val edges = halves.filter(col("half") === "ref")
      .groupBy(col("element"))
      .agg(expr(
        "transform(percentile(value, array(0.1,0.2,0.3,0.4,0.5,0.6,0.7,0.8,0.9)), e -> round(e, 6))")
        .as("edges"))
    val binned = halves.join(broadcast(edges), Seq("element"))
      .withColumn("bin", expr("size(filter(edges, b -> value > b))"))
      .groupBy(col("element"), col("half"), col("bin"))
      .agg(count(lit(1)).as("n"))
    val tot = binned.groupBy(col("element"), col("half")).agg(sum(col("n")).as("n_half"))
    // densify to all 10 bins so an emptied bin still contributes a term
    val allBins = binned.select(col("element")).distinct()
      .crossJoin(spark.range(10).select(col("id").cast("int").as("bin")))
      .join(tot, Seq("element"))
    val shares = allBins.join(binned, Seq("element", "half", "bin"), "left")
      .select(col("element"), col("half"), col("bin"),
        ((coalesce(col("n"), lit(0L)) + 1L).cast("double") /
          (col("n_half") + 10L).cast("double")).as("p"))
    val wide = shares.groupBy(col("element"), col("bin"))
      .agg(max(when(col("half") === "ref", col("p"))).as("p1"),
        max(when(col("half") === "cur", col("p"))).as("p2"))
    wide
      .select(col("element"),
        round((col("p2") - col("p1")) * log(col("p2") / col("p1")), 12)
          .cast("decimal(18,12)").as("term"))
      .groupBy(col("element"))
      .agg(round(sum(col("term")).cast("double"), 6).as("psi"))
      .orderBy(col("element"))
  }

  /** Seasonal-Hybrid ESD point anomalies (the Twitter AnomalyDetection
    * formulation) over per-element daily means — the seasonal-aware
    * member of the anomaly suite: EWMA/CUSUM/MAD all mistake a strong
    * weekly cycle for signal; S-H-ESD first removes the STL seasonal
    * component ([[graft.models.Stl.decompose]], the same kernel the
    * forecast family uses) plus the series MEDIAN (median, not trend —
    * the "hybrid" that keeps a level drift from masking point
    * anomalies), then runs a generalized ESD test with robust
    * median/MAD test statistics: iteratively remove the farthest
    * residual and compare R_i = |x−med|/MAD against the t-derived
    * critical value λ_i, flagging the largest prefix with R_i > λ_i
    * (commons-math3 `TDistribution` supplies the quantile — a public
    * Spark classpath dependency).
    *
    * Scale shape: identical to the fit surface — ONE element-keyed
    * shuffle of (element, day, exact-decimal daily partials); each
    * group is a ≤|days| array processed sequentially in its executor
    * (the ESD recursion is inherently ordered, exactly like the model
    * fits); output is anomaly rows only. Rows-only registered (STL +
    * iterative t-tests aren't SQL); the planted-spike fixture in
    * OpsSpec is the gate. */
  def shEsdAnomalies(spark: SparkSession, sfDir: String, alpha: Double = 0.05,
      maxFrac: Double = 0.05, period: Int = 7): DataFrame = {
    import spark.implicits._
    val ev = graft.sources.Tables.events(spark, sfDir)
    val dayCol = ev.schema("ts").dataType match {
      case org.apache.spark.sql.types.LongType => graft.sources.Tables.tsDay("ts")
      case _ => to_date(col("ts"))
    }
    val daily = ev
      .filter(col("event_type").isNotNull && col("ts").isNotNull && col("value").isNotNull)
      .select(col("event_type").as("element"), dayCol.cast("string").as("day"), col("value"))
      .groupBy(col("element"), col("day"))
      .agg((sum(col("value").cast("decimal(18,4)")).cast("double") /
        count(lit(1)).cast("double")).as("m"))
      .as[(String, String, Double)]
    def med(xs: Array[Double]): Double = {
      val s = xs.sorted
      val n = s.length
      if (n % 2 == 1) s(n / 2) else (s(n / 2 - 1) + s(n / 2)) / 2.0
    }
    val anomalies = daily.groupByKey(_._1).flatMapGroups { (elem, it) =>
      val rows = it.toArray.sortBy(_._2)
      val n = rows.length
      if (n < 2 * period + 2) Iterator.empty
      else {
        val y = rows.map(_._3)
        val dec = graft.models.Stl.decompose(y, period)
        val center = med(y)
        val resid = Array.tabulate(n)(i => y(i) - dec.seasonal(i) - center)
        val kMax = math.max(1, math.ceil(maxFrac * n).toInt)
        val active = scala.collection.mutable.ArrayBuffer.range(0, n)
        val cand = scala.collection.mutable.ArrayBuffer.empty[(Int, Double)]
        var numAnoms = 0
        var step = 1
        var degenerate = false
        while (step <= kMax && !degenerate) {
          val vals = active.map(resid).toArray
          val m0 = med(vals)
          val mad = 1.4826 * med(vals.map(v => math.abs(v - m0)))
          if (mad == 0.0 || active.length < 4) degenerate = true
          else {
            val (idx, r) = active.map(i => i -> math.abs(resid(i) - m0) / mad)
              .maxBy { case (i, ri) => (ri, -i) }
            val nn = active.length
            val p = 1.0 - alpha / (2.0 * nn)
            val t = new org.apache.commons.math3.distribution.TDistribution(nn - 2.0)
              .inverseCumulativeProbability(p)
            val lambda = (nn - 1.0) * t / math.sqrt((nn - 2.0 + t * t) * nn)
            cand += ((idx, r))
            if (r > lambda) numAnoms = step
            active -= idx
            step += 1
          }
        }
        cand.take(numAnoms).zipWithIndex.iterator.map { case ((i, r), rank) =>
          (elem, rows(i)._2, y(i), resid(i), r, (rank + 1).toLong)
        }
      }
    }.toDF("element", "day", "value", "resid", "r_stat", "esd_rank")
    anomalies
      .select(col("element"), to_date(col("day")).as("day"),
        round(col("value"), 6).as("value"), round(col("resid"), 6).as("resid"),
        round(col("r_stat"), 4).as("r_stat"), col("esd_rank"))
      .orderBy(col("element"), col("esd_rank"))
  }

  def madAnomalies(spark: SparkSession, sfDir: String, k: Long = 7L): DataFrame = {
    val ev = graft.sources.Tables.events(spark, sfDir)
    val dayCol = ev.schema("ts").dataType match {
      case org.apache.spark.sql.types.LongType => graft.sources.Tables.tsDay("ts")
      case _ => to_date(col("ts"))
    }
    val daily = ev
      .filter(col("event_type").isNotNull && col("ts").isNotNull && col("value").isNotNull)
      .select(col("event_type").as("element"), dayCol.as("day"), col("value"))
      .groupBy(col("element"), col("day"))
      .agg(sum(col("value").cast("decimal(18,4)")).as("s"),
        count(lit(1)).cast("long").as("n"))
      .withColumn("m", expr("CAST(s * 10000 AS BIGINT) * 100 DIV n"))
      .select(col("element"), col("day"), col("m"))
    val byVal = Window.partitionBy(col("element")).orderBy(col("m"))
    val counts = daily.groupBy(col("element")).agg(count(lit(1)).as("nd"))
      .withColumn("lo", expr("(nd + 1) DIV 2")).withColumn("hi", expr("(nd + 2) DIV 2"))
    val ranked = daily.withColumn("rn", row_number().over(byVal))
      .join(broadcast(counts), "element")
    val med2 = ranked
      .groupBy(col("element"))
      .agg((sum(when(col("rn") === col("lo"), col("m"))) +
        sum(when(col("rn") === col("hi"), col("m")))).as("med2"))
    val withDev = daily.join(broadcast(med2), "element")
      .withColumn("dev", abs(col("m") * 2L - col("med2")))
    val byDev = Window.partitionBy(col("element")).orderBy(col("dev"))
    val mad2 = withDev.withColumn("rn", row_number().over(byDev))
      .join(broadcast(counts), "element")
      .groupBy(col("element"))
      .agg((sum(when(col("rn") === col("lo"), col("dev"))) +
        sum(when(col("rn") === col("hi"), col("dev")))).as("mad2"))
    withDev.join(broadcast(mad2), "element")
      .select(col("element"), col("day"),
        (col("m").cast("double") / lit(1000000.0d)).as("daily_mean"),
        col("m").as("mean_micro"), col("med2"), col("dev"), col("mad2"),
        (col("dev") > lit(0L) && col("dev") * 2L > col("mad2") * lit(k)).as("is_anomaly"))
      .orderBy(col("element"), col("day"))
  }

  /** Nearest-rank winsorization of event values per element — the
    * standard heavy-tail cleaning step in front of any mean-based
    * aggregate (a single fat-fingered 1e9 reading otherwise owns the
    * day's sum). Bounds are the NEAREST-RANK (type-1) p05/p95 order
    * statistics — `lo = ⌈n/20⌉ = (n+19) DIV 20`, `hi = ⌈19n/20⌉` —
    * selected values, NOT interpolated: selection is exact on any
    * engine, so clamp decisions and outputs hash-verify with no
    * arithmetic on the values at all.
    *
    * Scale shape: one element-keyed shuffle serves the rank window;
    * bounds reduce to |elements| rows joined back by broadcast; the
    * clamp is a map-side projection. */
  def valueWinsorize(spark: SparkSession, sfDir: String): DataFrame = {
    val ev = graft.sources.Tables.events(spark, sfDir)
      .filter(col("event_type").isNotNull && col("value").isNotNull)
      .select(col("event_id"), col("event_type").as("element"), col("value"))
    val ranked = ev.withColumn("rn",
      row_number().over(Window.partitionBy(col("element")).orderBy(col("value"))))
    val loHi = ev.groupBy(col("element")).agg(count(lit(1)).as("n"))
      .withColumn("lo_rank", expr("(n + 19) DIV 20"))
      .withColumn("hi_rank", expr("(19 * n + 19) DIV 20"))
    val picked = ranked.join(broadcast(loHi), "element")
      .groupBy(col("element"))
      .agg(max(when(col("rn") === col("lo_rank"), col("value"))).as("p05"),
        max(when(col("rn") === col("hi_rank"), col("value"))).as("p95"))
    ev.join(broadcast(picked), "element")
      .select(col("event_id"), col("element"), col("value"), col("p05"), col("p95"),
        when(col("value") < col("p05"), col("p05"))
          .when(col("value") > col("p95"), col("p95"))
          .otherwise(col("value")).as("value_winsorized"),
        (col("value") < col("p05") || col("value") > col("p95")).as("clipped"))
      .orderBy(col("event_id"))
  }

  /** Per-(element, day) nearest-rank P50/P95 of event values — the
    * daily latency-percentile report every ops dashboard renders. The
    * [[valueWinsorize]] exactness rule applies: nearest-rank (type-1)
    * order statistics are SELECTED values, never interpolated, so the
    * whole row hash-verifies with no value arithmetic.
    *
    * Scale shape: one (element, day)-keyed Exchange serves the rank
    * window AND the count aggregate (same partitioning — Catalyst
    * plans one shuffle); output is one row per (element, day). */
  def dailyValuePercentiles(spark: SparkSession, sfDir: String): DataFrame = {
    val ev = graft.sources.Tables.events(spark, sfDir)
    val dayCol = ev.schema("ts").dataType match {
      case org.apache.spark.sql.types.LongType => graft.sources.Tables.tsDay("ts")
      case _ => to_date(col("ts"))
    }
    val vals = ev
      .filter(col("event_type").isNotNull && col("ts").isNotNull && col("value").isNotNull)
      .select(col("event_type").as("element"), dayCol.as("day"), col("value"))
    val grp = Window.partitionBy(col("element"), col("day"))
    val ranked = vals
      .withColumn("rn", row_number().over(grp.orderBy(col("value"))))
      .withColumn("cnt", count(lit(1)).over(grp))
    ranked
      .groupBy(col("element"), col("day"))
      .agg(count(lit(1)).as("n"),
        max(when(col("rn") === expr("(cnt + 1) DIV 2"), col("value"))).as("p50"),
        max(when(col("rn") === expr("(19 * cnt + 19) DIV 20"), col("value"))).as("p95"))
      .orderBy(col("element"), col("day"))
  }

  /** Rolling 7-day distinct active users per day (the WAU curve; the
    * same plan parameterizes to DAU/MAU). Formulated as CONTRIBUTION
    * EXPANSION, not a range self-join: each distinct (user, day)
    * activity contributes to the 7 window endpoints it is visible from,
    * then one distinct-count per day. Days past the last observed day
    * (partial windows of the future) are not reported.
    *
    * Scale shape: dedup to (user, day) first — one shuffle whose volume
    * is per-day actives, not raw events — then a map-side 7× explode of
    * that already-small table into a two-phase `count(DISTINCT user)`
    * per day (~|days| keys). The day-bounds filter broadcasts a 1-row
    * aggregate. The range-join alternative shuffles the activity table
    * once per window day at cluster scale; the expansion is strictly
    * cheaper because it never re-partitions raw events. */
  /** (event_id, user_id, tus, event_type) with the dual-clock rule —
    * the attribution paths need the event identity for deterministic
    * tie-breaks, which [[userEvents]] deliberately drops. */
  /** First-order event-type transition matrix over per-user sequences —
    * P(next = b | current = a), the Markov-chain building block behind
    * next-action prediction and funnel-drop diagnosis. Successor pairs
    * come from ONE `lead` window per user (ordered by the exact
    * microsecond clock with event_id as the deterministic tiebreak, so
    * both engines pair identical neighbors); counts are exact BIGINTs
    * and the probability is ONE IEEE division, so rows hash-verify.
    *
    * Scale shape: one user-keyed Exchange serves the sequence window;
    * the pair/total aggregates are two-phase over a |types|²-bounded
    * key space. Sequence state never leaves the window operator. */
  private def transitionCounts(spark: SparkSession, sfDir: String): DataFrame =
    identifiedEvents(spark, sfDir)
      .withColumn("next_type", lead(col("event_type"), 1).over(
        Window.partitionBy(col("user_id")).orderBy(col("tus"), col("event_id"))))
      .filter(col("next_type").isNotNull)
      .groupBy(col("event_type").as("cur"), col("next_type").as("nxt"))
      .agg(count(lit(1)).as("n_pair"))

  def eventTransitions(spark: SparkSession, sfDir: String): DataFrame = {
    val counts = transitionCounts(spark, sfDir)
    val totals = counts.groupBy(col("cur")).agg(sum(col("n_pair")).as("n_cur"))
    counts.join(broadcast(totals), "cur")
      .select(col("cur"), col("nxt"), col("n_pair"), col("n_cur"),
        (col("n_pair").cast("double") / col("n_cur").cast("double")).as("p"))
      .orderBy(col("cur"), col("nxt"))
  }

  /** Scaled-BIGINT precision of the stationary power iteration (the
    * PageRank idiom: exact integer mass, floor divisions, replayable
    * in SQL). Mass × transition-count products stay < 2⁶³ while any
    * (cur, nxt) pair count stays below ~9.2e6 per scale unit; a
    * petabyte deployment would widen the intermediates to
    * DECIMAL(38,0), changing nothing else. */
  val StatScale = 1000000000000L
  val StatIterations = 12

  /** Stationary distribution of the event-type Markov chain —
    * `event_transitions`' consumer: where a user's behavior settles if
    * the observed transition matrix keeps acting. `StatIterations`
    * power iterations of π' = π·P entirely in scaled BIGINT:
    * per-edge mass flow is `(m · n_pair) / n_cur` (exact floor on
    * non-negative longs — SQL DIV semantics), the incoming sum is
    * order-free integer addition, so every iteration is bit-replayable
    * by the unrolled-CTE oracle. States with no outgoing edges keep
    * receiving but never emit (mass drains deterministically —
    * reported, not renormalized).
    *
    * Scale posture: the ONLY corpus-scale work is the one user_id
    * window + grouped aggregate behind [[transitionCounts]]. Its
    * output — the (cur, nxt) edge table — is |event types|² rows and
    * the mass vector |event types|, both CATALOG-bounded (an event
    * taxonomy is tens of values at any corpus size), so the power
    * iteration runs driver-side over the collected counts: the d×d
    * eigensolve-on-driver idiom ([[Similarity]]'s spectral ops) rather
    * than 12 rounds of |types|-row distributed jobs whose cost is pure
    * scheduling latency (measured ~2 s of ~150 ms jobs at sf0.1,
    * independent of data size). The arithmetic is identical — floor
    * divisions on the same longs — so the oracle replay and every
    * invariant are unchanged. */
  def transitionStationary(spark: SparkSession, sfDir: String): DataFrame = {
    import spark.implicits._
    val counts = transitionCounts(spark, sfDir)
    val totals = counts.groupBy(col("cur")).agg(sum(col("n_pair")).as("n_cur"))
    // |types|²-bounded collect — metadata-scale by construction, but
    // GUARDED: the bound rests on event_type being a catalog-scale
    // taxonomy. A store with free-form high-cardinality types must
    // fail loudly here, not OOM the driver — the limit(N+1) caps what
    // CollectLimitExec ships to the driver, and seeing row N+1 proves
    // the taxonomy broke the contract. (2²⁰ edges ≈ a dense 1k-state
    // matrix — far above any real event catalog.)
    val maxEdges = 1 << 20
    val collected = counts.join(totals, "cur")
      .select(col("cur"), col("nxt"), col("n_pair"), col("n_cur"))
      .limit(maxEdges + 1)
      .collect()
    require(collected.length <= maxEdges,
      s"transitionStationary: > $maxEdges (cur, nxt) edges — event_type is not " +
        "catalog-scale here; the driver-side eigensolve contract does not apply. " +
        "Run the distributed iteration over the edge table instead.")
    val edges = collected
      .map(r => (r.getString(0), r.getString(1), r.getLong(2), r.getLong(3)))
    val states = (edges.map(_._1) ++ edges.map(_._2)).distinct.sorted
    val n = states.length.toLong
    var mass: Map[String, Long] = states.map(_ -> StatScale / n).toMap
    for (_ <- 1 to StatIterations) {
      val in = scala.collection.mutable.HashMap.empty[String, Long]
        .withDefaultValue(0L)
      edges.foreach { case (cur, nxt, nPair, nCur) =>
        in(nxt) += mass(cur) * nPair / nCur
      }
      mass = states.map(s => s -> in(s)).toMap
    }
    states.toSeq
      .map(s => (s, mass(s), mass(s).toDouble / StatScale.toDouble))
      .toDF("state", "mass_scaled", "pi")
      .orderBy(col("mass_scaled").desc, col("state"))
  }

  /** NEAREST-in-time join: for each purchase, the same-user click
    * minimizing |Δt| within ±1 h — the sensor-alignment semantic
    * (closest reading, either side) that as-of (latest-before,
    * `asof_daily_value`) and last-click (latest-in-window,
    * `click_attribution`) cannot express. Ties (equidistant before and
    * after) resolve to the EARLIER click, then the smaller id — pinned
    * by fixture and encoded in one `min(struct(absΔ, click_us,
    * click_id))` partial-merged aggregate. Unmatched purchases survive
    * with NULLs.
    *
    * Scale shape: the attribution banding widened to ±: clicks
    * register in THREE hour-buckets (b−1, b, b+1), purchases probe one,
    * so every pair within the tolerance meets in a (user, bucket)
    * EQUI-join and nothing farther ever materializes; a candidate
    * duplicated across shared buckets is harmless under min(). */
  def nearestClickJoin(spark: SparkSession, sfDir: String,
      windowUs: Long = 3600L * 1000000L): DataFrame = {
    val ev = identifiedEvents(spark, sfDir)
    val purchases = ev.filter(col("event_type") === "purchase")
      .select(col("event_id").as("purchase_id"), col("user_id"), col("tus").as("purchase_us"))
    val clicks = ev.filter(col("event_type") === "click")
      .select(col("event_id").as("click_id"), col("user_id").as("c_user"),
        col("tus").as("click_us"))
      .withColumn("c_bucket", explode(array(
        expr(s"click_us DIV $windowUs - 1"),
        expr(s"click_us DIV $windowUs"),
        expr(s"click_us DIV $windowUs + 1"))))
    val best = purchases
      .withColumn("p_bucket", expr(s"purchase_us DIV $windowUs"))
      .join(clicks,
        col("user_id") === col("c_user") &&
          col("p_bucket") === col("c_bucket") &&
          abs(col("click_us") - col("purchase_us")) <= windowUs)
      .groupBy(col("purchase_id"))
      .agg(min(struct(abs(col("click_us") - col("purchase_us")).as("ad"),
        col("click_us"), col("click_id"))).as("w"))
    purchases.join(best, Seq("purchase_id"), "left")
      .select(col("purchase_id"), col("user_id"), col("purchase_us"),
        col("w.click_id").as("click_id"), col("w.click_us").as("click_us"),
        (col("w.click_us") - col("purchase_us")).as("delta_us"),
        col("w.ad").as("abs_delta_us"))
      .orderBy(col("purchase_id"))
  }

  /** Longest consecutive-day activity streak per user — the
    * gaps-and-islands windowing staple (engagement scoring, habit
    * metrics): distinct active days minus their per-user row_number
    * collapse each maximal run to one constant (`day − rn` — the
    * island key), and one aggregate over the islands yields streak
    * lengths. Everything is exact integers.
    *
    * Scale shape: the corpus reduces to distinct (user, day) in one
    * shuffle; the row_number window and both aggregates all ride the
    * user partitioning (ONE Exchange). */
  def userStreaks(spark: SparkSession, sfDir: String): DataFrame = {
    val days = identifiedEvents(spark, sfDir)
      .select(col("user_id"), expr("tus DIV 86400000000").as("epoch_day"))
      .distinct()
    val islands = days
      .withColumn("grp", col("epoch_day") - row_number().over(
        Window.partitionBy(col("user_id")).orderBy(col("epoch_day"))))
      .groupBy(col("user_id"), col("grp"))
      .agg(count(lit(1)).as("len"))
    islands.groupBy(col("user_id"))
      .agg(sum(col("len")).as("n_active_days"),
        max(col("len")).as("longest_streak"),
        count(lit(1)).as("n_streaks"))
      .orderBy(col("user_id"))
  }

  /** Week-over-week churn: per week, the active-user count and how many
    * of them do NOT appear the following week — the retention
    * complement every growth dashboard tracks. The "absent next week"
    * test is a LEFT ANTI join whose key is the EXPRESSION equi pair
    * (user, wk+1 = wk) — Catalyst plans it as a hash anti join, never a
    * loop. The trailing week (no successor to test against) is
    * excluded. Weeks are exact integer epoch-week indices
    * (`tus DIV 604800000000`); churn rate is one IEEE division.
    *
    * Scale shape: the corpus reduces to distinct (user, week) in one
    * shuffle; the anti join and the count aggregate both key on that
    * deduplicated table. */
  def userChurn(spark: SparkSession, sfDir: String): DataFrame = {
    val weekly = identifiedEvents(spark, sfDir)
      .select(col("user_id"), expr("tus DIV 604800000000").as("wk"))
      .distinct()
    val lastWeek = weekly.agg(max(col("wk")).as("max_wk"))
    val churned = weekly.as("a")
      .join(weekly.as("b"),
        col("a.user_id") === col("b.user_id") && col("b.wk") === col("a.wk") + 1L,
        "left_anti")
      .groupBy(col("wk")).agg(count(lit(1)).as("n_churned"))
    weekly.groupBy(col("wk")).agg(count(lit(1)).as("n_active"))
      .join(churned, Seq("wk"), "left")
      .crossJoin(broadcast(lastWeek))
      .filter(col("wk") < col("max_wk"))
      .select(col("wk"), col("n_active"),
        coalesce(col("n_churned"), lit(0L)).as("n_churned"),
        (coalesce(col("n_churned"), lit(0L)).cast("double") /
          col("n_active").cast("double")).as("churn_rate"))
      .orderBy(col("wk"))
  }

  /** Syntetos–Boylan demand classification per element — the routing
    * report in front of the forecast families: ADI (average inter-
    * demand interval = calendar periods / demand periods) and CV²
    * (squared coefficient of variation of the demand sizes) place each
    * series in the smooth / intermittent / erratic / lumpy quadrant
    * (cuts 1.32 and 0.49, the published values), deciding Croston vs
    * the continuous-series methods.
    *
    * Exactness: every CLASS decision is an integer/decimal cross-
    * multiplication — `ADI ≥ 1.32` ⇔ `periods·100 ≥ 132·nd`, and
    * `CV² ≥ 0.49` ⇔ `100·(nd·Σq² − (Σq)²) ≥ 49·(Σq)²` over DECIMAL-
    * exact sums of the 1e-4-quantized daily demands — so no IEEE
    * boundary can flip a quadrant between engines. The reported adi
    * and cv2 doubles are each ONE division over the exact operands.
    *
    * Routing (round 11): each quadrant carries its standard method —
    * smooth/erratic → SES, intermittent → CROSTON, lumpy → SBA — and
    * an OBSOLESCENCE screen overrides to TSB: when the calendar's late
    * half holds fewer than half the early half's demand days
    * (`2·nd_late < nd_early`, exact integer counts split at the
    * integer midpoint day), the stream is dying and TSB's per-period
    * probability decay is the published answer (Teunter–Syntetos–
    * Babai 2011). */
  def demandClasses(spark: SparkSession, sfDir: String): DataFrame = {
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
      .withColumn("q", expr("CAST(s * 10000 AS DECIMAL(19,0))"))
    // the (element, day) frame is |elements|x|days| — metadata-scale, so
    // the min/max window re-read costs nothing and keeps one aggregation
    val w = Window.partitionBy(col("element"))
    val windowed = daily
      .withColumn("mn", min(col("day")).over(w))
      .withColumn("np_w",
        (datediff(max(col("day")).over(w), min(col("day")).over(w)) + 1).cast("long"))
      .withColumn("is_late",
        datediff(col("day"), col("mn")).cast("long") > expr("(np_w - 1) DIV 2"))
    val stats = windowed.groupBy(col("element"))
      .agg(
        first(col("np_w")).as("n_periods"),
        count(when(col("s") > 0, 1)).as("nd"),
        sum(when(col("s") > 0, col("q"))).cast("decimal(19,0)").as("sq"),
        sum(when(col("s") > 0, col("q") * col("q")).cast("decimal(27,0)"))
          .cast("decimal(27,0)").as("sqq"),
        count(when(col("s") > 0 && !col("is_late"), 1)).as("nd_early"),
        count(when(col("s") > 0 && col("is_late"), 1)).as("nd_late"))
    stats
      .withColumn("num",
        expr("CAST(nd AS DECIMAL(10,0)) * sqq - CAST(sq * sq AS DECIMAL(38,0))"))
      .withColumn("den", expr("CAST(sq * sq AS DECIMAL(38,0))"))
      .withColumn("demand_class",
        when(expr("n_periods * 100 < 132 * nd"),
          when(expr("100 * num < 49 * den"), lit("smooth")).otherwise(lit("erratic")))
          .otherwise(
            when(expr("100 * num < 49 * den"), lit("intermittent")).otherwise(lit("lumpy"))))
      .withColumn("obsolescence_risk", expr("nd_late * 2 < nd_early"))
      .select(col("element"), col("n_periods"), col("nd").as("n_demands"),
        round(col("n_periods").cast("double") / col("nd").cast("double"), 6).as("adi"),
        round(col("num").cast("double") / col("den").cast("double"), 6).as("cv2"),
        col("demand_class"),
        col("obsolescence_risk"),
        when(col("obsolescence_risk"), lit("TSB"))
          .when(col("demand_class") === "intermittent", lit("CROSTON"))
          .when(col("demand_class") === "lumpy", lit("SBA"))
          .otherwise(lit("SES"))
          .as("recommended"))
      .orderBy(col("element"))
  }

  private def identifiedEvents(spark: SparkSession, sfDir: String): DataFrame = {
    val ev = graft.sources.Tables.events(spark, sfDir)
    val tusCol = ev.schema("ts").dataType match {
      case org.apache.spark.sql.types.LongType => expr("ts DIV 1000")
      case _ => unix_micros(col("ts"))
    }
    ev.filter(col("user_id").isNotNull && col("ts").isNotNull)
      .select(col("event_id"), col("user_id"), tusCol.as("tus"), col("event_type"))
  }

  /** Last-click attribution: for each purchase, the latest click by the
    * same user within the attribution window before (or at) the
    * purchase — the event-joining pattern behind every conversion
    * report. Unattributed purchases are kept with NULL click columns.
    *
    * Scale shape — a BANDED equi-join, not a range join: the naive
    * formulation (`c.tus BETWEEN p.tus - W AND p.tus` as a join
    * predicate on user only) makes every active user a mini cross
    * join across their full history. Instead each click is registered
    * in exactly TWO time buckets of width W (its own and the next), a
    * purchase probes its single bucket, and the residual window
    * predicate filters inside the join — so the shuffle keys are
    * (user, hour-bucket), candidate fan-out is bounded by per-user
    * activity within ADJACENT hours, and no pair farther than W apart
    * is ever materialized. The last-click reduction is one
    * `max(struct(click_us, click_id))` partial-merged aggregate (ties:
    * latest click, then largest id — pinned by fixture).
    *
    * The streaming twin (`EventIngest.attributionPairs`) runs the same
    * window as a watermarked stream-stream join; OpsSpec proves pair
    * parity. */
  /** The banded-join candidate pair set (see [[clickAttribution]]) —
    * package-visible so the stream-parity test can compare it against
    * the stream-stream join's emissions. */
  private[graft] def attributionCandidates(spark: SparkSession, sfDir: String,
      windowUs: Long): DataFrame = {
    val ev = identifiedEvents(spark, sfDir)
    val purchases = ev.filter(col("event_type") === "purchase")
      .select(col("event_id").as("purchase_id"), col("user_id"), col("tus").as("purchase_us"))
    val clicks = ev.filter(col("event_type") === "click")
      .select(col("event_id").as("click_id"), col("user_id").as("c_user"), col("tus").as("click_us"))
      .withColumn("c_bucket", explode(array(
        expr(s"click_us DIV $windowUs"), expr(s"click_us DIV $windowUs + 1"))))
    purchases
      .withColumn("p_bucket", expr(s"purchase_us DIV $windowUs"))
      .join(clicks,
        col("user_id") === col("c_user") &&
          col("p_bucket") === col("c_bucket") &&
          col("click_us") <= col("purchase_us") &&
          col("purchase_us") - col("click_us") < windowUs)
      .select(col("purchase_id"), col("user_id"), col("purchase_us"),
        col("click_id"), col("click_us"))
  }

  def clickAttribution(spark: SparkSession, sfDir: String,
      windowUs: Long = 3600L * 1000000L): DataFrame = {
    val ev = identifiedEvents(spark, sfDir)
    val purchases = ev.filter(col("event_type") === "purchase")
      .select(col("event_id").as("purchase_id"), col("user_id"), col("tus").as("purchase_us"))
    val winners = attributionCandidates(spark, sfDir, windowUs)
      .groupBy(col("purchase_id"))
      .agg(max(struct(col("click_us"), col("click_id"))).as("w"))
    purchases.join(winners, Seq("purchase_id"), "left")
      .select(col("purchase_id"), col("user_id"), col("purchase_us"),
        col("w.click_id").as("click_id"), col("w.click_us").as("click_us"),
        (col("purchase_us") - col("w.click_us")).as("delta_us"))
      .orderBy(col("purchase_id"))
  }

  /** Day-of-week seasonality profile per element — the weekly-cycle
    * report that justifies the fit surface's frequency-7 default
    * (R:369's hard-coded 7) with data: per (element, ISO weekday) the
    * observation count and exact-decimal mean value. One map-side-
    * combined groupBy over a |elements|×7 key space; the mean is ONE
    * double division of an exact DECIMAL sum. */
  def weekdayProfile(spark: SparkSession, sfDir: String): DataFrame = {
    val ev = graft.sources.Tables.events(spark, sfDir)
    val dayCol = ev.schema("ts").dataType match {
      case org.apache.spark.sql.types.LongType => graft.sources.Tables.tsDay("ts")
      case _ => to_date(col("ts"))
    }
    ev.filter(col("event_type").isNotNull && col("ts").isNotNull && col("value").isNotNull)
      .select(col("event_type").as("element"),
        (weekday(dayCol) + 1).cast("long").as("dow"), col("value"))
      .groupBy(col("element"), col("dow"))
      .agg(count(lit(1)).as("n"),
        round(sum(col("value").cast("decimal(18,4)")).cast("double") /
          count(lit(1)).cast("double"), 6).as("mean_value"))
      .orderBy(col("element"), col("dow"))
  }

  /** Exact two-sample Kolmogorov–Smirnov test of the value distribution
    * between the two halves of the observation span — the EXACT,
    * binning-free member of the numeric-drift pair ([[valuePsi]] is the
    * decile-binned screen; KS is the confirmatory statistic a pipeline
    * runs on the elements PSI flags). D = max |F̂_ref(x) − F̂_cur(x)|
    * over observed values, computed exactly from cumulative counts; the
    * 5% verdict compares against the asymptotic critical value
    * c(0.05)·√((n₁+n₂)/(n₁·n₂)) with c(0.05) = √(−ln(0.025)/2) embedded
    * as the SAME literal in both engines (a library ln could differ in
    * the last ulp).
    *
    * Float posture: every ECDF step is one division of exact integer
    * counts; D is a max (order-free); both sides of the verdict are
    * 6dp-rounded before comparison.
    *
    * Scale shape: duplicates collapse FIRST (map-side-combined
    * groupBy(element, value) — the only corpus shuffle), so the
    * per-element cumulative window runs over |distinct values per
    * element|, not raw observations. An exact KS is inherently a
    * per-element ordered pass; at 100 TB the binned PSI tier screens
    * and this confirms the flagged elements. */
  def ksDrift(spark: SparkSession, sfDir: String): DataFrame = {
    val ev = graft.sources.Tables.events(spark, sfDir)
    val dayCol = ev.schema("ts").dataType match {
      case org.apache.spark.sql.types.LongType => graft.sources.Tables.tsDay("ts")
      case _ => to_date(col("ts"))
    }
    val base = ev
      .filter(col("event_type").isNotNull && col("ts").isNotNull && col("value").isNotNull)
      .select(col("event_type").as("element"), dayCol.as("day"), col("value"))
    val pivot = base.agg(min(col("day")).as("lo"), max(col("day")).as("hi"))
      .select(expr("date_add(lo, CAST(datediff(hi, lo) DIV 2 AS INT))").as("pivot"))
    val pts = base.crossJoin(broadcast(pivot))
      .groupBy(col("element"), col("value"))
      .agg(count(when(col("day") < col("pivot"), 1)).as("c1"),
        count(when(col("day") >= col("pivot"), 1)).as("c2"))
    val wCum = Window.partitionBy(col("element")).orderBy(col("value"))
      .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    val wEl = Window.partitionBy(col("element"))
    val cum = pts
      .withColumn("cum1", sum(col("c1")).over(wCum))
      .withColumn("cum2", sum(col("c2")).over(wCum))
      .withColumn("n1", sum(col("c1")).over(wEl))
      .withColumn("n2", sum(col("c2")).over(wEl))
    val agg = cum.filter(col("n1") > 0 && col("n2") > 0)
      .groupBy(col("element"))
      .agg(max(abs(col("cum1").cast("double") / col("n1").cast("double")
          - col("cum2").cast("double") / col("n2").cast("double"))).as("d_raw"),
        max(col("n1")).as("n_ref"), max(col("n2")).as("n_cur"))
    val crit = round(lit(1.3581015157406195) *
      sqrt((col("n_ref") + col("n_cur")).cast("double") /
        (col("n_ref") * col("n_cur")).cast("double")), 6)
    agg.select(col("element"), col("n_ref"), col("n_cur"),
        round(col("d_raw"), 6).as("d"), crit.as("critical_05"),
        (round(col("d_raw"), 6) > crit).as("drifted"))
      .orderBy(col("element"))
  }

  /** Tie-corrected Mann–Whitney U (rank-sum) test of the value
    * distribution between span halves — the LOCATION-shift member of
    * the drift suite (PSI screens by bins, [[ksDrift]] confirms any
    * shape change, MWU asks specifically "did the level move?", the
    * question a metric owner acts on). Rides the SAME collapsed
    * (element, value, half-counts) table as KS, so the marginal cost is
    * windows over distinct values.
    *
    * Exact-arithmetic derivation (everything integer until the final
    * z): for a distinct value with c₁+c₂ = t occurrences and C smaller
    * observations, the shared average rank is C + (t+1)/2, so
    * 2·R₁ = Σ c₁·(2C + t + 1) is an exact DECIMAL sum;
    * 2·U₁ = 2·R₁ − n₁(n₁+1). The tie-corrected variance is
    * σ² = n₁n₂/12 · ((N+1) − Σ(t³−t)/(N(N−1))) from the exact tie
    * spectrum; z = (2U₁ − n₁n₂)/(2σ) in ONE shared IEEE sequence, both
    * verdict sides 6dp-rounded (|z| vs 1.959963984540054). A fully
    * tied corpus (σ = 0) yields a NULL z and no flag.
    *
    * Scale shape: identical to [[ksDrift]] — the duplicate-collapse
    * groupBy is the only corpus shuffle; everything downstream runs on
    * |distinct values per element|. */
  def rankDrift(spark: SparkSession, sfDir: String): DataFrame = {
    val ev = graft.sources.Tables.events(spark, sfDir)
    val dayCol = ev.schema("ts").dataType match {
      case org.apache.spark.sql.types.LongType => graft.sources.Tables.tsDay("ts")
      case _ => to_date(col("ts"))
    }
    val base = ev
      .filter(col("event_type").isNotNull && col("ts").isNotNull && col("value").isNotNull)
      .select(col("event_type").as("element"), dayCol.as("day"), col("value"))
    val pivot = base.agg(min(col("day")).as("lo"), max(col("day")).as("hi"))
      .select(expr("date_add(lo, CAST(datediff(hi, lo) DIV 2 AS INT))").as("pivot"))
    val pts = base.crossJoin(broadcast(pivot))
      .groupBy(col("element"), col("value"))
      .agg(count(when(col("day") < col("pivot"), 1)).as("c1"),
        count(when(col("day") >= col("pivot"), 1)).as("c2"))
    val wCum = Window.partitionBy(col("element")).orderBy(col("value"))
      .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    val t = col("c1") + col("c2")
    // products go through DECIMAL(19,0) operands so nothing overflows a
    // LONG even at petabyte-scale per-element counts (the sketch-table
    // pattern); sums over those decimals are exact and order-free
    val d19 = (c: Column) => c.cast("decimal(19,0)")
    val cum = pts
      .withColumn("cbelow", sum(t).over(wCum) - t)
      .withColumn("r1_term",
        d19(col("c1")) * d19(lit(2) * col("cbelow") + t + 1))
      .withColumn("tie_term", d19(t) * d19(t) * d19(t) - d19(t))
    val agg = cum.groupBy(col("element"))
      .agg(sum(col("c1")).as("n1"), sum(col("c2")).as("n2"),
        sum(col("r1_term")).as("r1x2"), sum(col("tie_term")).as("ties"))
      .filter(col("n1") > 0 && col("n2") > 0)
    val nn = (col("n1") + col("n2")).cast("double")
    val n1d = col("n1").cast("double")
    val n2d = col("n2").cast("double")
    val sigma = sqrt(
      n1d * n2d / lit(12.0) *
        ((nn + lit(1.0)) - col("ties").cast("double") / (nn * (nn - lit(1.0)))))
    val zRaw = (col("r1x2").cast("double")
      - n1d * (col("n1") + 1).cast("double")
      - n1d * n2d) / (lit(2.0) * sigma)
    val z = when(sigma > 0, round(zRaw, 6))
    agg.select(col("element"), col("n1").as("n_ref"), col("n2").as("n_cur"),
        z.as("z"),
        coalesce(abs(z) > lit(1.959963984540054), lit(false)).as("shifted"))
      .orderBy(col("element"))
  }

  /** Chi-square homogeneity test of the event-type mix between the two
    * halves of the observation span — the CATEGORICAL member of the
    * drift suite ([[valuePsi]] monitors the numeric value distribution;
    * `corpus_drift` reports document-mix deltas without a significance
    * test). The span splits at its midpoint date (same pivot rule as
    * PSI); the statistic is the standard two-sample homogeneity form
    * χ² = Σ_cells (o−e)²/e with e = rowtot·coltot/N over the
    * |event types| × {ref, cur} table, df = k−1. The 5% critical value
    * is the Wilson–Hilferty cube approximation
    * df·(1 − 2/(9df) + z₀.₉₅·√(2/(9df)))³ — closed-form in BOTH engines
    * (pow-free: an explicit cube), so the drifted verdict is
    * oracle-checkable, unlike a library quantile.
    *
    * Float posture: each cell's (o−e)²/e is double with e derived from
    * exact integer counts, the ref and cur cells add in fixed order,
    * and the per-type contribution is 12dp-quantized before the
    * DECIMAL total (order-free); the verdict compares the 6dp-ROUNDED
    * statistic to the 6dp-ROUNDED critical value so an ulp cannot flip
    * it between engines.
    *
    * Scale shape: ONE corpus shuffle — the map-side-combined
    * (element, half) count aggregate; the totals/verdict windows run
    * over the |event types| frame. */
  def chi2Drift(spark: SparkSession, sfDir: String): DataFrame = {
    val ev = graft.sources.Tables.events(spark, sfDir)
    val dayCol = ev.schema("ts").dataType match {
      case org.apache.spark.sql.types.LongType => graft.sources.Tables.tsDay("ts")
      case _ => to_date(col("ts"))
    }
    val base = ev.filter(col("event_type").isNotNull && col("ts").isNotNull)
      .select(col("event_type").as("element"), dayCol.as("day"))
    val pivot = base.agg(min(col("day")).as("lo"), max(col("day")).as("hi"))
      .select(expr("date_add(lo, CAST(datediff(hi, lo) DIV 2 AS INT))").as("pivot"))
    val counts = base.crossJoin(broadcast(pivot))
      .groupBy(col("element"))
      .agg(count(when(col("day") < col("pivot"), 1)).as("n_ref"),
        count(when(col("day") >= col("pivot"), 1)).as("n_cur"))
    val w = Window.partitionBy()
    val n = (col("tot_ref") + col("tot_cur")).cast("double")
    def cellTerm(o: Column, colTot: Column): Column = {
      val e = (col("n_ref") + col("n_cur")).cast("double") * colTot.cast("double") / n
      (o.cast("double") - e) * (o.cast("double") - e) / e
    }
    val dfree = (col("k") - 1).cast("double")
    val whTerm = lit(1.0) - lit(2.0) / (lit(9.0) * dfree) +
      lit(1.6448536269514722) * sqrt(lit(2.0) / (lit(9.0) * dfree))
    counts
      .withColumn("tot_ref", sum(col("n_ref")).over(w))
      .withColumn("tot_cur", sum(col("n_cur")).over(w))
      .withColumn("k", count(lit(1)).over(w))
      // a single-day (or single-sided) span has no two halves to
      // compare — emit nothing rather than 0-expected-count NaNs
      .filter(col("tot_ref") > 0 && col("tot_cur") > 0)
      .withColumn("contrib_q",
        round(cellTerm(col("n_ref"), col("tot_ref")) +
          cellTerm(col("n_cur"), col("tot_cur")), 12).cast("decimal(18,12)"))
      .withColumn("chi2", round(sum(col("contrib_q")).over(w).cast("double"), 6))
      .withColumn("critical_05", round(dfree * whTerm * whTerm * whTerm, 6))
      .select(col("element"), col("n_ref"), col("n_cur"),
        round(col("contrib_q").cast("double"), 6).as("contrib"),
        col("chi2"), (col("k") - 1).as("df"), col("critical_05"),
        (col("chi2") > col("critical_05")).as("drifted"))
      .orderBy(col("element"))
  }

  /** Linear multi-touch attribution — the credit-SPLITTING member of
    * the attribution family ([[clickAttribution]] = last-touch,
    * [[nearestClickJoin]] = closest-touch): every click in the hour
    * before a purchase shares the conversion credit equally
    * (credit = 1/n_touches, the one IEEE division). Rides the SAME
    * banded candidate join ([[attributionCandidates]]: clicks
    * registered in two hour-buckets, purchases probe one, so shuffle
    * keys are (user, hour) and no pair beyond the window
    * materializes); the per-purchase touch count is one partial-merged
    * aggregate. Unattributed purchases survive with 0 touches and NULL
    * credit — the rows a funnel report needs to see. */
  def linearAttribution(spark: SparkSession, sfDir: String,
      windowUs: Long = 3600L * 1000000L): DataFrame = {
    val ev = identifiedEvents(spark, sfDir)
    val purchases = ev.filter(col("event_type") === "purchase")
      .select(col("event_id").as("purchase_id"), col("user_id"), col("tus").as("purchase_us"))
    val touches = attributionCandidates(spark, sfDir, windowUs)
      .groupBy(col("purchase_id"))
      .agg(count(lit(1)).as("n_touches"),
        min(col("click_us")).as("first_click_us"), max(col("click_us")).as("last_click_us"))
    purchases.join(touches, Seq("purchase_id"), "left")
      .select(col("purchase_id"), col("user_id"), col("purchase_us"),
        coalesce(col("n_touches"), lit(0L)).as("n_touches"),
        round(lit(1.0) / col("n_touches").cast("double"), 6).as("credit_each"),
        col("first_click_us"), col("last_click_us"))
      .orderBy(col("purchase_id"))
  }

  /** Concurrent-session load profile: for every hour where the count of
    * simultaneously-open sessions CHANGES, the new count — the classic
    * interval-overlap aggregation ("how many sessions were open at
    * t?"), computed WITHOUT an interval join.
    *
    * The naive plan is sessions ⋈ hours on `start ≤ h < end` — a range
    * join that degenerates to a nested loop (or an exploded
    * every-hour-per-session blowup) at scale. This uses the DIFFERENCE
    * ARRAY instead: each session contributes exactly two delta rows
    * (+1 at its start hour, −1 at the hour after its end), the deltas
    * aggregate per hour, and a single prefix sum over the hour axis
    * reconstructs the concurrency level. Cost: one map-side 2× expansion
    * of the (already aggregated) session table, one groupBy over
    * |distinct hours|, one window. The unpartitioned prefix-sum window
    * runs over the POST-aggregation hour table — bounded by timeline
    * length (~10⁵ rows for a decade of hours), never by data volume, so
    * the single-task window is safe at any corpus size.
    *
    * Sessions are [[Relational.userSessions]]' gap-merged intervals
    * (half-open [start, end)); hours with a net-zero delta (equal
    * starts and ends) are not change points and are dropped. */
  def sessionConcurrency(spark: SparkSession, sfDir: String, gapMinutes: Int = 30): DataFrame = {
    val hourUs = 3600L * 1000000L
    val deltas = Relational.userSessions(spark, sfDir, gapMinutes)
      .select(explode(array(
        // integer DIV, never double division: an hour-boundary landing
        // on a double rounding edge must not shift the change point
        struct(expr(s"session_start_us DIV $hourUs").as("h"), lit(1L).as("d")),
        struct(expr(s"(session_end_us - 1) DIV $hourUs + 1").as("h"), lit(-1L).as("d"))
      )).as("x"))
      .select(col("x.h").as("h"), col("x.d").as("d"))
      .groupBy(col("h")).agg(sum(col("d")).as("net"))
      .filter(col("net") =!= 0L)
    val w = Window.orderBy(col("h")).rowsBetween(Window.unboundedPreceding, Window.currentRow)
    deltas
      .withColumn("n_active", sum(col("net")).over(w))
      .select((col("h") * hourUs).as("hour_us"), col("net"), col("n_active"))
      .orderBy(col("hour_us"))
  }

  def rollingActiveUsers(spark: SparkSession, sfDir: String, windowDays: Int = 7): DataFrame = {
    val active = userEvents(spark, sfDir).select(col("user_id"), col("day")).distinct()
    val bounds = active.agg(max(col("day")).as("max_day"))
    active
      .select(col("user_id"),
        explode(sequence(col("day"), date_add(col("day"), windowDays - 1))).as("day"))
      .crossJoin(broadcast(bounds))
      .filter(col("day") <= col("max_day"))
      .groupBy(col("day"))
      .agg(countDistinct(col("user_id")).as(s"active_${windowDays}d"))
      .orderBy(col("day"))
  }

  /** One-day slice report off the TIME-SORTED events mirror
    * ([[graft.sources.LayoutStore]]): per event_type counts, distinct
    * users, and a decimal-exact value sum for a single calendar day.
    *
    * The answer is layout-independent (the oracle runs the same slice
    * over the raw table) — what the mirror buys is the SCAN: `ts_day`
    * is a stored integer column sorted with the file order, so the
    * pushed `ts_day = K` predicate prunes whole parquet row groups by
    * their min/max stats and the scan decodes ~1/30th of the corpus
    * instead of filtering it row by row. OpsSpec pins the behavior
    * causally: the same slice over a deliberately shuffled copy decodes
    * the full corpus, the sorted mirror doesn't. At 100 TB this is the
    * difference between a time-slice query costing O(slice) and
    * O(corpus) I/O — without the directory-per-day explosion that
    * `partitionBy` would impose on a high-cardinality time key. */
  def eventsDaySlice(spark: SparkSession, sfDir: String,
      day: java.time.LocalDate = java.time.LocalDate.of(2024, 1, 15)): DataFrame =
    graft.sources.LayoutStore.sorted(spark, sfDir)
      .filter(col("ts_day") === lit(day.toEpochDay.toInt))
      .groupBy(col("event_type"))
      .agg(count(lit(1)).as("n_events"),
        countDistinct(col("user_id")).as("n_users"),
        sum(col("value").cast("decimal(18,4)")).as("sum_dec"))
      .select(col("event_type"), col("n_events"), col("n_users"),
        col("sum_dec").cast("double").as("sum_value"))
      .orderBy(col("event_type"))

  /** One-user activity report off the Z-ORDERED mirror
    * ([[graft.sources.LayoutStore.zOrdered]]): per (day, event_type)
    * counts and decimal-exact value sums for a single user — the
    * entity-slice twin of [[eventsDaySlice]]. On the ts-sorted mirror
    * this predicate decodes the whole corpus (every row group spans all
    * users); on the Morton-interleaved layout the pushed `user_id = K`
    * prunes most row groups, and a day predicate would prune on the
    * SAME mirror too (both dimensions' stats are tight — OpsSpec
    * measures the contrast). Answer is layout-independent; the oracle
    * scans the raw table. */
  def eventsUserSlice(spark: SparkSession, sfDir: String, userId: Long = 7L): DataFrame =
    graft.sources.LayoutStore.zOrdered(spark, sfDir)
      .filter(col("user_id") === userId)
      .groupBy(col("ts_day"), col("event_type"))
      .agg(count(lit(1)).as("n_events"),
        sum(col("value").cast("decimal(18,4)")).as("sum_dec"))
      .select(date_add(lit(java.sql.Date.valueOf("1970-01-01")), col("ts_day")).as("day"),
        col("event_type"), col("n_events"),
        col("sum_dec").cast("double").as("sum_value"))
      .orderBy(col("day"), col("event_type"))

  /** Time-weighted average value per (event_type, day) — the TWAP-style
    * statistic that is correct over IRREGULARLY-spaced observations
    * where the arithmetic mean over-weights bursts: each event's value
    * holds until the next event of that type that day (the last one
    * holds to midnight), and the day's average is Σ value·duration /
    * Σ duration. Exactness contract: value is 4dp-fixed-pointed via
    * `floor(v·10⁴ + 0.5)` (the engine's round-half-up idiom — both
    * engines floor identically), each value_q·µs product is one exact
    * BIGINT (≤ 5.6e6 · 8.64e10 ≈ 4.8e17 < 2⁶³), the sums are exact
    * DECIMAL(38,0), and only the final two IEEE divisions cross
    * engines — so the oracle hash-matches with no tolerance. Lead
    * order tie-breaks on event_id (unique), never on ts alone.
    *
    * Scale shape: one shuffle on (event_type, day) for the lead window
    * + aggregate — the same key the daily rollups already use; output
    * is |types|·|days| rows. */
  def twapDaily(spark: SparkSession, sfDir: String): DataFrame = {
    val ev = graft.sources.Tables.events(spark, sfDir)
    val (tusCol, dayNumCol) = ev.schema("ts").dataType match {
      case org.apache.spark.sql.types.LongType =>
        (expr("ts DIV 1000"), expr(s"ts DIV ${graft.sources.Tables.NanosPerDay}"))
      case _ => (unix_micros(col("ts")),
        expr("unix_micros(ts) DIV 86400000000"))
    }
    val w = Window.partitionBy(col("event_type"), col("day_num"))
      .orderBy(col("tus"), col("event_id"))
    ev.filter(col("ts").isNotNull && col("value").isNotNull &&
        col("event_type").isNotNull && col("event_id").isNotNull)
      .select(col("event_id"), col("event_type"), col("value"),
        tusCol.as("tus"), dayNumCol.cast("long").as("day_num"))
      .withColumn("v_q", floor(col("value") * lit(10000.0d) + lit(0.5d)).cast("long"))
      .withColumn("dur_us",
        coalesce(lead(col("tus"), 1).over(w),
          (col("day_num") + 1) * lit(86400000000L)) - col("tus"))
      .groupBy(col("event_type"), col("day_num"))
      .agg(count(lit(1)).as("n_events"),
        sum((col("v_q") * col("dur_us")).cast("decimal(38,0)")).as("sum_vw"),
        sum(col("dur_us").cast("decimal(38,0)")).as("sum_w"))
      .select(col("event_type"),
        date_add(lit(java.sql.Date.valueOf("1970-01-01")),
          col("day_num").cast("int")).as("day"),
        col("n_events"),
        (col("sum_vw").cast("double") / col("sum_w").cast("double") /
          lit(10000.0d)).as("twap"))
      .orderBy(col("event_type"), col("day"))
  }

  /** Per-user activity cadence — the inter-event-gap distribution the
    * sessionization gap parameter (and any engagement model) should be
    * fit FROM rather than guessed: for each user, the event count and
    * the median / p90 gap between consecutive events in exact integer
    * minutes. Percentiles are nearest-rank selections over the
    * row-numbered per-user gap frame (the `daily_value_percentiles`
    * idiom — `rn = ceil(p·n)` via integer DIV), so every reported
    * value is an actual observed gap, hash-stable cross-engine. One
    * shuffle on user_id does the ordering window and the aggregate. */
  def userCadence(spark: SparkSession, sfDir: String): DataFrame = {
    val w = Window.partitionBy(col("user_id")).orderBy(col("tus"), col("event_id"))
    val gaps = identifiedEvents(spark, sfDir)
      .withColumn("nxt", lead(col("tus"), 1).over(w))
      .withColumn("gap_min", expr("(nxt - tus) DIV 60000000"))
    val grp = Window.partitionBy(col("user_id"))
    val ranked = gaps.filter(col("nxt").isNotNull)
      .withColumn("rn", row_number().over(grp.orderBy(col("gap_min"), col("event_id"))))
      .withColumn("cnt", count(lit(1)).over(grp))
    val stats = ranked.groupBy(col("user_id"))
      .agg(count(lit(1)).as("n_gaps"),
        max(when(col("rn") === expr("(cnt + 1) DIV 2"), col("gap_min")))
          .as("median_gap_min"),
        max(when(col("rn") === expr("(9 * cnt + 9) DIV 10"), col("gap_min")))
          .as("p90_gap_min"))
    identifiedEvents(spark, sfDir).groupBy(col("user_id"))
      .agg(count(lit(1)).as("n_events"))
      .join(stats, Seq("user_id"), "left")
      .select(col("user_id"), col("n_events"),
        coalesce(col("n_gaps"), lit(0L)).as("n_gaps"),
        col("median_gap_min"), col("p90_gap_min"))
      .orderBy(col("user_id"))
  }

  /** Data-driven seasonal-period detection — the evidence behind the
    * frequency the reference HARD-CODES to 7 (R:369 and every
    * `ts(..., frequency=7)` call): for each element's daily activity
    * counts (an integer-exact series), every candidate period p∈[2,10]
    * is scored by the between-phase sum of squares
    * Σ_phase (S_ph·C − S·C_ph)²/C_ph — the variance the phase grouping
    * explains, computed from BIGINT sums with one exact integer product
    * per phase (≤(S·C)² ≈ 3.6e9 « 2⁶³), each term 12dp-rounded into a
    * DECIMAL(30,12) sum (order-free), and the argmax ranked on the
    * exact DECIMAL with p as tie-break — so the winning period is
    * hash-stable cross-engine. Shuffles: the daily aggregate (|days|
    * keys) and a |days|·9-row phase aggregate; totals broadcast. */
  def dominantPeriod(spark: SparkSession, sfDir: String, maxPeriod: Int = 10): DataFrame = {
    val ev = graft.sources.Tables.events(spark, sfDir)
    val dayNumCol = ev.schema("ts").dataType match {
      case org.apache.spark.sql.types.LongType =>
        expr(s"ts DIV ${graft.sources.Tables.NanosPerDay}")
      case _ => expr("unix_micros(ts) DIV 86400000000")
    }
    val daily = ev.filter(col("ts").isNotNull && col("event_type").isNotNull)
      .select(col("event_type").as("element"), dayNumCol.as("day_num"))
      .groupBy(col("element"), col("day_num"))
      .agg(count(lit(1)).as("n_d"))
    val tot = daily.groupBy(col("element"))
      .agg(sum(col("n_d")).as("s"), count(lit(1)).as("c"))
    val ph = daily
      .withColumn("p", explode(array((2 to maxPeriod).map(lit(_)): _*)))
      .groupBy(col("element"), col("p"), (col("day_num") % col("p")).as("phase"))
      .agg(sum(col("n_d")).as("s_ph"), count(lit(1)).as("c_ph"))
    val sc = ph.join(broadcast(tot), "element")
      .withColumn("d", col("s_ph") * col("c") - col("s") * col("c_ph"))
      // square in DECIMAL(19,0)², exact up to (38,0): a LONG d wraps
      // silently past 2^63 under non-ANSI Spark while DuckDB errors —
      // the widening keeps both engines exact for ANY long d (same
      // move as transitionStationary's widening note)
      .withColumn("term",
        round((col("d").cast("decimal(19,0)") * col("d").cast("decimal(19,0)"))
          .cast("double") / col("c_ph").cast("double"), 12)
          .cast("decimal(30,12)"))
      .groupBy(col("element"), col("p")).agg(sum(col("term")).as("score"))
    val w = Window.partitionBy(col("element"))
      .orderBy(col("score").desc, col("p").asc)
    sc.withColumn("rn", row_number().over(w)).filter(col("rn") === 1)
      .select(col("element"), col("p").cast("long").as("best_period"),
        round(col("score").cast("double"), 6).as("score"),
        (col("p") === 7).as("is_weekly"))
      .orderBy(col("element"))
  }

  /** Rolling 28-day active users via MERGEABLE HLL sketches
    * (`hll_sketch_agg` / `hll_union_agg`, the Apache DataSketches
    * functions) — the formulation that makes rolling DISTINCT viable
    * at 100 TB: the exact plan (`rollingActiveUsers`) must carry every
    * (user, day) pair into every window it touches, ~windowDays× the
    * distinct-pair volume; this plan touches the corpus ONCE (one
    * per-day sketch aggregate, map-side partial-merged), and the
    * 28-way window union runs over |days| rows of ~KB sketches — the
    * corpus never re-shuffles, and in production the per-day sketches
    * persist so each new day costs one day's scan plus a |days|-row
    * merge. Estimate error at lgK=12 is ~1.6%; OpsSpec gates the
    * estimates within 5% of the exact rolling counts on the real
    * store, and the registered query is rows-only (sketch internals
    * are engine-specific by nature). */
  def rollingMauSketch(spark: SparkSession, sfDir: String, windowDays: Int = 28): DataFrame = {
    val perDay = userEvents(spark, sfDir)
      .groupBy(col("day"))
      .agg(expr("hll_sketch_agg(user_id, 12)").as("sk"))
    val bounds = perDay.agg(max(col("day")).as("max_day"))
    perDay
      .select(explode(sequence(col("day"), date_add(col("day"), windowDays - 1)))
        .as("win_day"), col("sk"))
      .crossJoin(broadcast(bounds))
      .filter(col("win_day") <= col("max_day"))
      .groupBy(col("win_day").as("day"))
      .agg(expr("hll_sketch_estimate(hll_union_agg(sk, false))").as("est"))
      .select(col("day"), floor(col("est") + lit(0.5d)).cast("long")
        .as(s"mau_${windowDays}d_est"))
      .orderBy(col("day"))
  }
}
