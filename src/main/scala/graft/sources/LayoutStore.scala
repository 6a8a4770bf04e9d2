package graft.sources

import org.apache.spark.sql.{DataFrame, SaveMode, SparkSession}
import org.apache.spark.sql.functions._

/** Time-sorted mirror of the `events` fact — the OTHER ingest-time
  * layout move, complementing [[BucketStore]] (which deletes join
  * shuffles) and [[SeriesStore]] (directory partition pruning): this
  * one makes time-slice scans cheap via parquet ROW-GROUP statistics.
  *
  * `repartitionByRange(ts)` + `sortWithinPartitions(ts)` writes the
  * stream globally time-ordered, so every row group's (min, max) on the
  * stored `ts_day` column covers a sliver of the calendar, and a pushed
  * `ts_day = K` predicate lets the parquet reader skip whole row groups
  * without decoding them. Directory partitioning (`partitionBy(day)`)
  * achieves the same pruning but explodes into one directory per day —
  * wrong for high-cardinality or multi-granularity time keys, where a
  * 100 TB feed would generate millions of tiny files; range-sorted row
  * groups keep file counts governed by data volume (`maxRecordsPerFile`
  * etc.) while pruning at finer-than-file granularity. Range
  * partitioning also spreads load by VOLUME, not by key: a hot day
  * simply spans more partitions (and files) instead of hot-spotting a
  * single writer task the way hash-on-day would.
  *
  * `ts_day` is stored as the exact integer epoch-day of the nanosecond
  * clock ([[Tables.tsDay]] semantics) so the slice predicate is a plain
  * integer equality — the form parquet min/max stats answer directly.
  *
  * Mirrors land under the same /tmp store as the bucketed tables and
  * are memoized per (app, corpus), an ingest-time cost like every other
  * layout in `sources/`.
  */
object LayoutStore {

  private val builds = new java.util.concurrent.ConcurrentHashMap[(String, String), Unit]()

  private def ident(sfDir: String): String =
    sfDir.replaceAll("[^A-Za-z0-9_]", "_").replaceAll("^_+", "")

  private def path(sfDir: String): String =
    sys.env.getOrElse("SPARK_GRAFT_STORE_DIR", "/tmp/graft_store") + "/" +
      ident(sfDir) + "/events_sorted"

  /** Events with `ts` normalized to epoch-nanos LONG — the driver
    * store's native clock; a synthetic TIMESTAMP store is accepted
    * through the same dual-type rule as `EventAnalytics`. */
  private def eventsNanos(spark: SparkSession, sfDir: String): DataFrame = {
    val ev = Tables.events(spark, sfDir)
    normalizeTs(ev)
  }

  private def normalizeTs(ev: DataFrame): DataFrame = {
    val tsLong = ev.schema("ts").dataType match {
      case org.apache.spark.sql.types.LongType => col("ts")
      case _ => unix_micros(col("ts")) * lit(1000L)
    }
    ev.withColumn("ts", tsLong)
  }

  /** Write (or reuse) the time-sorted events mirror for one corpus. */
  def ensureSorted(spark: SparkSession, sfDir: String): Unit =
    builds.computeIfAbsent((spark.sparkContext.applicationId, sfDir), _ => {
      val p = path(sfDir)
      if (!new java.io.File(p, "_SUCCESS").isFile) {
        eventsNanos(spark, sfDir)
          .withColumn("ts_day", expr(s"CAST(ts DIV ${Tables.NanosPerDay} AS INT)"))
          .repartitionByRange(col("ts"))
          .sortWithinPartitions(col("ts"))
          .write.mode(SaveMode.Overwrite).parquet(p)
      }
    })

  /** The sorted mirror (builds on first use). `ts` is epoch-nanos LONG
    * like [[Tables.events]]; `ts_day` is the stored integer epoch-day
    * the row-group stats prune on. */
  def sorted(spark: SparkSession, sfDir: String): DataFrame = {
    ensureSorted(spark, sfDir)
    spark.read.parquet(path(sfDir))
  }

  /** Incremental ingest: APPEND one batch of events to the mirror
    * without rewriting it. The pruning invariant is per ROW GROUP, not
    * global — each appended file only needs to be internally
    * ts-sorted for its row groups' (min, max) to stay tight, so daily
    * (or hourly) increments keep the whole mirror prunable forever with
    * O(increment) write cost. This is exactly why the mirror sorts by
    * range instead of directory-partitioning: an append never has to
    * touch, split, or compact existing day directories.
    *
    * `newEvents` must carry the raw schema (`ts` epoch-nanos LONG or
    * TIMESTAMP, plus the event columns); `ts_day` is derived here so
    * callers cannot write a mirror whose stats column disagrees with
    * the clock. */
  def appendBatch(spark: SparkSession, sfDir: String, newEvents: DataFrame): Unit = {
    ensureSorted(spark, sfDir)
    normalizeTs(newEvents)
      .withColumn("ts_day", expr(s"CAST(ts DIV ${Tables.NanosPerDay} AS INT)"))
      .repartitionByRange(col("ts"))
      .sortWithinPartitions(col("ts"))
      .write.mode(SaveMode.Append).parquet(path(sfDir))
  }
}
