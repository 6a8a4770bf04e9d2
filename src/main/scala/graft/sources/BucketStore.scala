package graft.sources

import org.apache.spark.sql.{DataFrame, SaveMode, SparkSession}

/** Hash-bucketed mirrors of the two FACT tables, co-bucketed on the join
  * key — the storage-layout move that deletes the orders⋈lineitem shuffle
  * entirely.
  *
  * The reference engine joins its stores single-node, where co-location
  * is free; on a cluster the equivalent guarantee must be laid out at
  * INGEST time: `bucketBy(n, orderkey)` + `sortBy(orderkey)` writes each
  * table as n files whose rows are hash-routed by key, and Spark's
  * bucketed-scan rule then reports `HashPartitioning(orderkey, n)` to the
  * planner, so a SortMergeJoin of the two mirrors needs NO Exchange on
  * either side — and any aggregation keyed on (a superset of) the same
  * key reuses the distribution too. At 100 TB this converts the
  * pipeline's biggest repeated cost (re-shuffling the fact tables for
  * every fact-fact query) into a once-per-ingest write; local bucket
  * count is [[Buckets]], a cluster deployment scales it with the data
  * (the plan shape is bucket-count-independent).
  *
  * Bucketed writes go through the session catalog (`saveAsTable` — plain
  * `.parquet()` cannot record bucket metadata), registered as EXTERNAL
  * tables under /tmp so nothing lands in the repo; the in-memory catalog
  * dies with the session but the files are rewritten idempotently per
  * (app, corpus) via the memoized build, exactly like
  * [[SeriesStore.ensurePartitioned]].
  */
object BucketStore {

  /** Local bucket count: enough to spread local[32] without generating
    * thousands of tiny files at test SFs. */
  val Buckets = 8

  private val builds = new java.util.concurrent.ConcurrentHashMap[(String, String), Unit]()

  private def ident(sfDir: String): String =
    sfDir.replaceAll("[^A-Za-z0-9_]", "_").replaceAll("^_+", "")

  private def tableName(sfDir: String, table: String): String =
    s"graft_${ident(sfDir)}_${table}_by_orderkey"

  private def tablePath(sfDir: String, table: String): String =
    sys.env.getOrElse("SPARK_GRAFT_STORE_DIR", "/tmp/graft_store") + "/" +
      ident(sfDir) + s"/${table}_bucketed"

  /** Write (or reuse) the co-bucketed orders + lineitem mirrors for one
    * corpus; memoized per (app, corpus) like the series mirror. */
  def ensureBucketed(spark: SparkSession, sfDir: String): Unit =
    builds.computeIfAbsent((spark.sparkContext.applicationId, sfDir), _ => {
      write(spark, sfDir, "orders", "o_orderkey")
      write(spark, sfDir, "lineitem", "l_orderkey")
    })

  private def write(spark: SparkSession, sfDir: String, table: String, key: String): Unit = {
    val name = tableName(sfDir, table)
    // regenerated source (the driver rewrites testdata between rounds)
    // must force a rebuild — stale bucketed rows would silently skew
    // every consumer (the shared mirror-freshness rule)
    val fresh = new java.io.File(tablePath(sfDir, table), "_SUCCESS").isFile &&
      new java.io.File(tablePath(sfDir, table), "_SUCCESS").lastModified >=
        new java.io.File(s"$sfDir/$table.parquet").lastModified
    if (spark.catalog.tableExists(name) && !fresh) spark.sql(s"DROP TABLE $name")
    if (!spark.catalog.tableExists(name)) {
      Tables.table(spark, sfDir, table)
        .write.format("parquet")
        .bucketBy(Buckets, key).sortBy(key)
        .option("path", tablePath(sfDir, table))
        .mode(SaveMode.Overwrite)
        .saveAsTable(name)
    }
  }

  /** The bucketed mirror of one fact table (builds both on first use). */
  def bucketed(spark: SparkSession, sfDir: String, table: String): DataFrame = {
    ensureBucketed(spark, sfDir)
    spark.table(tableName(sfDir, table))
  }
}
