package graft.sources

import org.apache.spark.sql.{Column, DataFrame, SparkSession}
import org.apache.spark.sql.functions._

/** Central table loaders for the driver's testdata store (TESTDATA.md).
  *
  * `events.ts` is written as parquet TIMESTAMP(NANOS), which Spark cannot
  * represent natively (timestamps are microsecond precision). Truncating
  * to micros would be lossy here — the generator emits sub-microsecond
  * jitter — and a lossy order key could disagree with the DuckDB oracle's
  * native nanosecond ordering. So events are read with
  * `spark.sql.legacy.parquet.nanosAsLong`, keeping `ts` as an exact
  * epoch-nanos LONG; calendar projections are derived from it exactly.
  */
object Tables {

  def table(spark: SparkSession, sfDir: String, name: String): DataFrame =
    spark.read.parquet(s"$sfDir/$name.parquet")

  val NanosPerDay: Long = 86400L * 1000000000L

  /** events with `ts` as epoch-nanos LONG (exact; see scaladoc above). */
  def events(spark: SparkSession, sfDir: String): DataFrame = {
    spark.conf.set("spark.sql.legacy.parquet.nanosAsLong", "true")
    spark.read.parquet(s"$sfDir/events.parquet")
  }

  /** Calendar day of an epoch-nanos LONG ts column — exact integer
    * arithmetic (`DIV`, not double division: epoch-nanos exceed a
    * double's 53-bit mantissa), equal to DuckDB's `CAST(ts AS DATE)`. */
  def tsDay(tsCol: String): Column =
    date_add(lit(java.sql.Date.valueOf("1970-01-01")),
      expr(s"CAST($tsCol DIV $NanosPerDay AS INT)"))
}
