package graft.sources

import org.apache.spark.sql.{DataFrame, Dataset, SparkSession}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/** One named time series, materialized in an executor task. Values are in
  * evaluation-time order; calendar dates are discarded (positional `ts`
  * semantics, TimeSeriesFunctions_GPL_0.5.1.R:32) — ordering comes solely
  * from the source sort, gaps are NOT filled.
  */
final case class Series(element: String, values: Array[Double])

/** The engine's `searchElement` (R:23-40): scan the observation store with
  * server-side filter + project + sort + limit, returning either the
  * positional series shape (`returnDF = FALSE`, R:31-33) or the
  * calendar-aware (ds, y) shape used by Prophet (R:35-38).
  *
  * The store is the driver's `events` parquet (TESTDATA.md): `event_type`
  * plays the reference's element name, `ts` plays `evaluationDate`, `value`
  * is `value`. Filter/projection push down to the parquet scan (Catalyst
  * `PushDownPredicates` / `ColumnPruning` replace what Elasticsearch did
  * server-side in R:27-28).
  *
  * Scale posture: only one *series* (≤ `MaxSeriesLength` points, the
  * reference's `size = 10000` cap R:28) must ever fit in a single task;
  * the store itself is never collected.
  */
object SeriesStore {

  /** The reference's ES query cap `size = 10000` (R:28). */
  val MaxSeriesLength = 10000

  /** `ts` comes back as epoch-nanos LONG (exact) — see [[Tables.events]]. */
  def events(spark: SparkSession, sfDir: String): DataFrame =
    Tables.events(spark, sfDir)

  /** Oldest-`MaxSeriesLength` rows per element, in evaluation order — the
    * per-element analogue of ES `sort=evaluationDate:asc, size=10000`
    * (R:28). Ties broken by event_id for determinism. Emits
    * (element, step, ts, value) with step = 1-based position.
    */
  def observations(spark: SparkSession, sfDir: String, elements: Seq[String] = Nil): DataFrame = {
    val base = events(spark, sfDir)
      // a null measurement is not an observation: keep it out of the
      // series (and out of step numbering) rather than letting it NPE
      // the non-nullable Series encoder downstream; the predicate
      // pushes down to the scan like the element filter
      .filter(col("value").isNotNull)
      .select(col("event_type").as("element"), col("ts"), col("event_id"), col("value").cast("double"))
    val filtered =
      if (elements.isEmpty) base
      else if (elements.size == 1) base.filter(col("element") === elements.head)
      else base.filter(col("element").isin(elements: _*))
    val w = Window.partitionBy(col("element")).orderBy(col("ts").asc, col("event_id").asc)
    filtered
      .withColumn("step", row_number().over(w))
      .filter(col("step") <= MaxSeriesLength)
      .select(col("element"), col("step"), col("ts"), col("value"))
  }

  /** `searchElement(..., returnDF = FALSE)` (R:31-33): positional series,
    * dates discarded. One row per (element, step). */
  def seriesDF(spark: SparkSession, sfDir: String, elements: Seq[String] = Nil): DataFrame =
    observations(spark, sfDir, elements).select("element", "step", "value")

  /** `searchElement(..., returnDF = TRUE)` (R:35-38): calendar-aware
    * two-column (ds DATE, y DOUBLE) frame per element — Prophet's input. */
  def prophetDF(spark: SparkSession, sfDir: String, elements: Seq[String] = Nil): DataFrame =
    observations(spark, sfDir, elements)
      .select(col("element"), Tables.tsDay("ts").as("ds"), col("value").as("y"))

  /** Materialize one dense series per element — the `ts(values, ...)`
    * construction (R:32) — as a distributed Dataset. The ordered collect
    * happens inside one task per element via sort_array(collect_list);
    * the 10k cap guarantees it fits. This is the engine's one genuine
    * shuffle on the fit path (SURVEY.md §4).
    *
    * When the element-partitioned mirror of this corpus exists (laid
    * out once via [[ensurePartitioned]] — the administrative step a
    * 100 TB deployment does at ingest), the fit path reads THAT:
    * element filters become `PartitionFilters` (zero bytes read for
    * other elements) and the scan is already corpus-column-pruned.
    * Results are identical either way — the closed-form forecast
    * oracles (fc_naive/…/fc_ses) hash-check the partitioned path
    * end-to-end. */
  def series(spark: SparkSession, sfDir: String, elements: Seq[String] = Nil): Dataset[Series] = {
    import spark.implicits._
    def build = {
      val mirror = mirrorDir(sfDir)
      if (mirrorFresh(sfDir, mirror)) seriesFromPartitioned(spark, mirror, elements)
      else observations(spark, sfDir, elements)
        .groupBy(col("element"))
        .agg(sort_array(collect_list(struct(col("step"), col("value")))).as("pts"))
        .select(col("element"), col("pts.value").as("values"))
        .as[Series]
    }
    // the full-store read feeds EVERY fit query — materialize it once
    // per (app, corpus): one (element, values) row per series, ≤10k
    // points each, so the persisted table is per-series-bounded, not
    // corpus-bounded. Element-filtered reads stay uncached (partition-
    // pruned, already cheap).
    if (elements.nonEmpty) build
    else seriesCache.computeIfAbsent((spark.sparkContext.applicationId, sfDir),
      _ => build.persist(org.apache.spark.storage.StorageLevel.MEMORY_AND_DISK))
  }

  private val seriesCache =
    new java.util.concurrent.ConcurrentHashMap[(String, String), Dataset[Series]]()

  /** Release the cached series tables (long-lived multi-corpus sessions). */
  def clearCaches(): Unit = {
    seriesCache.values.forEach(ds => { ds.unpersist(); () })
    seriesCache.clear()
  }

  /** Location of the element-partitioned mirror for a corpus dir
    * (override the root with SPARK_GRAFT_STORE_DIR). */
  def mirrorDir(sfDir: String): String =
    sys.env.getOrElse("SPARK_GRAFT_STORE_DIR", "/tmp/graft_store") + "/" +
      sfDir.replaceAll("[^A-Za-z0-9._-]", "_") + "/events_by_element"

  /** A mirror is usable when its _SUCCESS marker exists and is no older
    * than the source events store (stale mirrors are rebuilt, never
    * silently read). */
  private def mirrorFresh(sfDir: String, mirror: String): Boolean = {
    val marker = new java.io.File(mirror, "_SUCCESS")
    marker.isFile && marker.lastModified >= new java.io.File(s"$sfDir/events.parquet").lastModified
  }

  private val mirrorBuilds = new java.util.concurrent.ConcurrentHashMap[String, String]()

  /** Build (or reuse) the element-partitioned mirror of `sfDir`'s
    * events store — the explicit layout step; [[series]] then picks it
    * up automatically. Memoized per JVM; other JVMs reuse the on-disk
    * copy via the freshness check. */
  def ensurePartitioned(spark: SparkSession, sfDir: String): String =
    mirrorBuilds.computeIfAbsent(sfDir, { _ =>
      val out = mirrorDir(sfDir)
      if (!mirrorFresh(sfDir, out)) writePartitioned(spark, sfDir, out)
      out
    })

  /** Write the observation store pre-partitioned by element — the
    * SURVEY.md §4 scale move: with the store laid out this way, the
    * per-series ordered collect reads only the matching element's
    * directory (partition pruning) and a follow-up repartition-by-key is
    * a directory-local operation, so the fit path's one shuffle becomes
    * map-side at 100 TB. */
  def writePartitioned(spark: SparkSession, sfDir: String, outDir: String): Unit =
    events(spark, sfDir)
      .withColumn("element", org.apache.spark.sql.functions.col("event_type"))
      .write.mode("overwrite")
      .partitionBy("element")
      .parquet(outDir)

  /** Series materialization over a pre-partitioned store: identical
    * output to [[series]]; the scan prunes to the requested elements'
    * partitions (`PartitionFilters` in the plan, zero data read for
    * other elements). */
  def seriesFromPartitioned(spark: SparkSession, partitionedDir: String,
      elements: Seq[String] = Nil): Dataset[Series] = {
    import spark.implicits._
    spark.conf.set("spark.sql.legacy.parquet.nanosAsLong", "true")
    val base = spark.read.parquet(partitionedDir)
      .filter(col("value").isNotNull) // same null-observation rule as [[observations]]
      .select(col("element"), col("ts"), col("event_id"), col("value").cast("double"))
    val filtered =
      if (elements.isEmpty) base
      else base.filter(col("element").isin(elements: _*))
    val w = Window.partitionBy(col("element")).orderBy(col("ts").asc, col("event_id").asc)
    filtered
      .withColumn("step", row_number().over(w))
      .filter(col("step") <= MaxSeriesLength)
      .groupBy(col("element"))
      .agg(sort_array(collect_list(struct(col("step"), col("value")))).as("pts"))
      .select(col("element"), col("pts.value").as("values"))
      .as[Series]
  }

  /** Calendar gap-fill with last-observation-carried-forward — the
    * ingest-hygiene step in front of any calendar-indexed consumer (the
    * reference's positional `ts` silently treats a 3-day outage as
    * adjacent points; a calendar pipeline must instead SEE the gap and
    * decide the fill). Per element: daily mean value (decimal-exact sum,
    * one double division), densified to every day in [first, last] via
    * `sequence()`, gaps filled by the running `last(_, ignoreNulls)`
    * window with `n_obs = 0` and `is_filled = true` marking synthetic
    * days.
    *
    * Scale shape: one (element, day) aggregate shuffle; the spine
    * explode is map-side from a per-element min/max row (≤ |elements| ×
    * timeline-days rows); the LOCF window is partitioned per element —
    * never global. */
  def gapFilledDaily(spark: SparkSession, sfDir: String): DataFrame = {
    val ev = events(spark, sfDir)
    // driver store: ts = epoch-nanos LONG; synthetic test stores may
    // write a plain TIMESTAMP — accept both (the shared dual-clock rule)
    val dayCol = ev.schema("ts").dataType match {
      case org.apache.spark.sql.types.LongType => Tables.tsDay("ts")
      case _ => to_date(col("ts"))
    }
    val daily = ev
      .filter(col("value").isNotNull) // same null-observation rule as [[observations]]
      .groupBy(col("event_type").as("element"), dayCol.as("day"))
      .agg(count(lit(1)).as("n_obs"),
        sum(col("value").cast("decimal(18,4)")).as("sum_dec"))
      .withColumn("day_value", col("sum_dec").cast("double") / col("n_obs"))
      .drop("sum_dec")
    val spine = daily.groupBy(col("element"))
      .agg(min(col("day")).as("d0"), max(col("day")).as("d1"))
      .select(col("element"), explode(sequence(col("d0"), col("d1"))).as("day"))
    val w = Window.partitionBy(col("element")).orderBy(col("day"))
      .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    spine.join(daily, Seq("element", "day"), "left")
      .select(col("element"), col("day"),
        coalesce(col("n_obs"), lit(0L)).as("n_obs"),
        round(last(col("day_value"), ignoreNulls = true).over(w), 6).as("value"),
        coalesce(col("n_obs"), lit(0L)).equalTo(0L).as("is_filled"))
      .orderBy(col("element"), col("day"))
  }

  /** Calendar-aware per-element series for Prophet: (element, epoch days
    * asc, values) — the only path that keeps dates (R:35-38, R:369). */
  def datedSeries(spark: SparkSession, sfDir: String, elements: Seq[String] = Nil): Dataset[(String, Array[Int], Array[Double])] = {
    import spark.implicits._
    observations(spark, sfDir, elements)
      .select(col("element"), col("step"),
        expr(s"CAST(ts DIV ${Tables.NanosPerDay} AS INT)").as("d"), col("value"))
      .groupBy(col("element"))
      .agg(sort_array(collect_list(struct(col("step"), col("d"), col("value")))).as("pts"))
      .select(col("element"), col("pts.d").as("days"), col("pts.value").as("values"))
      .as[(String, Array[Int], Array[Double])]
  }
}
