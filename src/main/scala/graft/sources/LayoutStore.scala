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

  /** Write (or reuse) the time-sorted events mirror for one corpus. */
  def ensureSorted(spark: SparkSession, sfDir: String): Unit =
    builds.computeIfAbsent((spark.sparkContext.applicationId, sfDir), _ => {
      val p = path(sfDir)
      if (!new java.io.File(p, "_SUCCESS").isFile) {
        Tables.events(spark, sfDir)
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
}
