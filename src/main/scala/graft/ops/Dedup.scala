package graft.ops

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/** Deduplication operators over the `documents` table (north-star
  * extension surface). Exact dedup here; MinHash/SimHash/Jaccard variants
  * live in their own files.
  */
object Dedup {

  private def docs(spark: SparkSession, sfDir: String): DataFrame =
    spark.read.parquet(s"$sfDir/documents.parquet")

  /** Exact dedup with deterministic survivor choice: keep the lowest
    * doc_id per identical text. One hash-partitioned shuffle on the text
    * key (at 100 TB: hash first, shuffle 8-byte keys, not full texts —
    * see `exactByFingerprint`). */
  def exact(spark: SparkSession, sfDir: String): DataFrame = {
    val w = Window.partitionBy(col("text")).orderBy(col("doc_id"))
    docs(spark, sfDir)
      .withColumn("rn", row_number().over(w))
      .filter(col("rn") === 1)
      .select(col("doc_id"), col("lang"), col("source"), col("n_chars"))
      .orderBy(col("doc_id"))
  }

  /** Scale path for exact dedup: shuffle on a 64-bit fingerprint of the
    * normalized text instead of the full text bytes — the shuffle moves
    * (id, hash) pairs only. Same survivor rule. */
  def exactByFingerprint(spark: SparkSession, sfDir: String): DataFrame = {
    val fp = xxhash64(regexp_replace(lower(trim(col("text"))), "\\s+", " "))
    val w = Window.partitionBy(col("fp")).orderBy(col("doc_id"))
    docs(spark, sfDir)
      .withColumn("fp", fp)
      .withColumn("rn", row_number().over(w))
      .filter(col("rn") === 1)
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
