package graft.ops

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

/** Deduplication operators over the `documents` table (north-star
  * extension surface). Exact dedup here; MinHash/SimHash/Jaccard variants
  * live in their own files.
  */
object Dedup {

  private def docs(spark: SparkSession, sfDir: String): DataFrame =
    spark.read.parquet(s"$sfDir/documents.parquet")

  /** Exact dedup with deterministic survivor choice: keep the lowest
    * doc_id per identical text. `groupBy` + `min_by` instead of a
    * row_number window: partial aggregation collapses duplicate groups
    * map-side, so the shuffle carries one survivor candidate per
    * (partition, text) rather than every row — the window form would
    * shuffle and sort the full table. */
  def exact(spark: SparkSession, sfDir: String): DataFrame =
    docs(spark, sfDir)
      .groupBy(col("text"))
      .agg(min_by(struct(col("doc_id"), col("lang"), col("source"), col("n_chars")),
        col("doc_id")).as("keep"))
      .select(col("keep.doc_id"), col("keep.lang"), col("keep.source"), col("keep.n_chars"))
      .orderBy(col("doc_id"))

  /** Scale path for exact dedup: aggregate on a 64-bit fingerprint of the
    * normalized text instead of the full text bytes — the shuffle moves
    * (hash, id) pairs only, never document bodies. Same survivor rule. */
  def exactByFingerprint(spark: SparkSession, sfDir: String): DataFrame = {
    val fp = xxhash64(regexp_replace(lower(trim(col("text"))), "\\s+", " "))
    docs(spark, sfDir)
      .select(col("doc_id"), fp.as("fp"))
      .groupBy(col("fp"))
      .agg(min(col("doc_id")).as("doc_id"))
      .select(col("doc_id"), col("fp"))
      .orderBy(col("doc_id"))
  }

  /** Duplicate-group summary: how many exact copies each surviving text
    * has (count > 1 ⇒ was duplicated). */
  def duplicateGroups(spark: SparkSession, sfDir: String): DataFrame =
    docs(spark, sfDir)
      .groupBy(col("text"))
      .agg(min(col("doc_id")).as("keeper_id"), count(lit(1)).as("n_copies"))
      .filter(col("n_copies") > 1)
      .select(col("keeper_id"), col("n_copies"))
      .orderBy(col("keeper_id"))
}
