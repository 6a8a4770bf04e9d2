package graft.streaming

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

/** Structured-Streaming ingest of the observation store (engine
  * extension — SURVEY.md §2.2-H; the reference is batch pull-only and a
  * stale model must be deleted by hand). A stream of raw events becomes
  * watermarked per-day aggregates appended to the observation store, so
  * "new data arrived" is an actual cache-invalidation signal.
  *
  * Plan shape: readStream → event-time watermark (1 day of allowed
  * lateness) → tumbling 1-day window per element → append. State is
  * bounded by the watermark; the aggregation is partial-merge-able, so
  * at cluster scale each micro-batch shuffles only (element, window)
  * partial sums, never raw events.
  */
object EventIngest {

  /** Watermarked tumbling-day aggregation over a (possibly streaming)
    * events frame with columns (ts TIMESTAMP, event_type STRING,
    * value DOUBLE). Works identically for batch frames — the same plan
    * serves backfill and live ingest. */
  def dailyAggregate(events: DataFrame): DataFrame =
    events
      .withWatermark("ts", "1 day")
      .groupBy(col("event_type").as("element"), window(col("ts"), "1 day").as("w"))
      .agg(count(lit(1)).as("n_obs"), sum(col("value")).as("sum_value"),
        avg(col("value")).as("avg_value"))
      .select(col("element"), col("w.start").as("day_start"),
        col("n_obs"), col("sum_value"), col("avg_value"))

  /** Streaming exact dedup — the live-ingest guard of the dedup suite
    * (§2.3): drop events whose content fingerprint was already seen
    * within the watermark window. `dropDuplicatesWithinWatermark` keys
    * the state store on the fingerprint and expires entries once the
    * watermark passes, so state is bounded by (dedup horizon ×
    * ingest rate), not by stream length — the only formulation that
    * survives an unbounded stream. The fingerprint is the same
    * xxhash64(normalized text) key as the batch `Dedup
    * .exactByFingerprint`, so batch backfill and live ingest agree on
    * what "duplicate" means. */
  def dedupStream(docs: DataFrame): DataFrame =
    docs
      .withColumn("fp", xxhash64(regexp_replace(lower(trim(col("text"))), "\\s+", " ")))
      .withWatermark("ts", "1 day")
      .dropDuplicatesWithinWatermark("fp")

  /** Wire a parquet-directory stream of raw events into the daily
    * aggregate, appending to `outDir` with checkpointing — the live
    * observation-store writer. */
  def start(spark: SparkSession, inDir: String, outDir: String, checkpointDir: String): org.apache.spark.sql.streaming.StreamingQuery = {
    val schema = "event_id BIGINT, ts TIMESTAMP, user_id BIGINT, event_type STRING, value DOUBLE, props STRING"
    val stream = spark.readStream.schema(schema).parquet(inDir)
    dailyAggregate(stream)
      .writeStream
      .outputMode("append")
      .option("checkpointLocation", checkpointDir)
      .format("parquet")
      .option("path", outDir)
      .start()
  }
}
