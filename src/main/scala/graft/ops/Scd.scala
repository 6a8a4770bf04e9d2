package graft.ops

import org.apache.spark.sql.{Column, DataFrame, SparkSession}
import org.apache.spark.sql.functions._

/** Slowly-changing-dimension maintenance — the MERGE/CDC-apply step a
  * warehouse runs to keep dimension history under a stream of upserts
  * and tombstones (engine extension past the reference's read-only
  * store, `TimeSeriesFunctions_GPL_0.5.1.R:16-40`; the SCD type-2
  * contract — close the old version, open the new, never rewrite
  * history — is the public Kimball model).
  *
  * Spark-first shape: ONE full-outer equi-join between the snapshot and
  * the change batch on the business key, then each key's output rows
  * (closed old version / new current version / untouched row) are built
  * as an ARRAY of structs and exploded — a single pass, no
  * union-of-three-joins, no window. The change batch in production is
  * increment-sized, so the join broadcasts (AQE decides from measured
  * size); the snapshot side never shuffles in that regime. At 100 TB
  * the fallback is a key-shuffled SMJ — still one shuffle of each side,
  * and history stays append-only (closed rows are NEW rows, the base
  * files are never rewritten).
  *
  * No-op detection: an upsert whose attributes all null-safe-equal the
  * current version must NOT open a new version (CDC feeds routinely
  * re-send unchanged rows); the comparator is `<=>` across every
  * attribute column, so a null attribute equals itself and cannot fake
  * a change.
  */
object Scd {

  /** Batch timestamp of the applied change set (version epoch 1; the
    * base snapshot is epoch 0). */
  private val BatchTs = 1L

  /** Deterministic change batch derived from the snapshot itself (the
    * driver store ships no CDC feed): key mod 20 selects disjoint
    * cohorts — 3 → changed upsert (+100 balance), 5 → no-op upsert
    * (identical re-send), 7 → tombstone, 9 → brand-new key
    * (key + max(key), so inserts cannot collide with live keys). */
  private[graft] def changeBatch(customer: DataFrame): DataFrame = {
    val m = col("c_custkey") % 20
    val maxKey = customer.agg(max(col("c_custkey")).as("mk"))
    val upserts = customer.filter(m === 3)
      .withColumn("c_acctbal", col("c_acctbal") + 100.0d)
      .withColumn("op", lit("upsert"))
    val noops = customer.filter(m === 5).withColumn("op", lit("upsert"))
    val inserts = customer.filter(m === 9).crossJoin(broadcast(maxKey))
      .select((col("c_custkey") + col("mk")).as("c_custkey"),
        concat(lit("NEW_"), col("c_name")).as("c_name"),
        col("c_nationkey"), col("c_acctbal"), col("c_mktsegment"),
        lit("upsert").as("op"))
    val deletes = customer.filter(m === 7)
      .select(col("c_custkey"), lit(null).cast("string").as("c_name"),
        lit(null).cast("int").as("c_nationkey"),
        lit(null).cast("double").as("c_acctbal"),
        lit(null).cast("string").as("c_mktsegment"),
        lit("delete").as("op"))
    upserts.select(deletes.columns.map(col): _*)
      .unionByName(noops.select(deletes.columns.map(col): _*))
      .unionByName(inserts).unionByName(deletes)
  }

  private val attrs = Seq("c_name", "c_nationkey", "c_acctbal", "c_mktsegment")

  /** Apply `changes` to `base` (a current-rows-only snapshot at epoch
    * 0), emitting the full SCD2 table: (key, attributes, version,
    * valid_from, valid_to, is_current). */
  private[graft] def applyScd2(base: DataFrame, changes: DataFrame): DataFrame = {
    val b = base.select(col("c_custkey").as("bk") +:
      attrs.map(a => col(a).as(s"b_$a")): _*)
    val c = changes.select(col("c_custkey").as("ck") +:
      (attrs.map(a => col(a).as(s"c_$a")) :+ col("op")): _*)
    val joined = b.join(c, col("bk") === col("ck"), "full_outer")

    def ver(srcPrefix: String, version: Int, from: Long, to: Option[Long]): Column =
      struct(
        attrs.map(a => col(s"${srcPrefix}_$a").as(a)) ++ Seq(
          lit(version).as("version"), lit(from).as("valid_from"),
          to.map(lit(_)).getOrElse(lit(null)).cast("long").as("valid_to"),
          lit(to.isEmpty).as("is_current")): _*)

    // the attribute comparator: every column null-safe-equal → no-op
    val unchanged = attrs.map(a => col(s"b_$a") <=> col(s"c_$a")).reduce(_ && _)
    val rows =
      when(col("ck").isNull, array(ver("b", 1, 0L, None)))
        .when(col("bk").isNull, array(ver("c", 1, BatchTs, None)))
        .when(col("op") === "delete", array(ver("b", 1, 0L, Some(BatchTs))))
        .when(unchanged, array(ver("b", 1, 0L, None)))
        .otherwise(array(ver("b", 1, 0L, Some(BatchTs)), ver("c", 2, BatchTs, None)))
    joined
      .select(coalesce(col("bk"), col("ck")).as("c_custkey"), explode(rows).as("r"))
      .select(col("c_custkey") +: (attrs :+ "version" :+ "valid_from" :+
        "valid_to" :+ "is_current").map(f => col(s"r.$f").as(f)): _*)
      .orderBy("c_custkey", "version")
  }

  /** The registered query: derive the deterministic change batch and
    * apply it to the customer snapshot. */
  def scd2Merge(spark: SparkSession, sfDir: String): DataFrame = {
    val customer = graft.sources.Tables.table(spark, sfDir, "customer")
    applyScd2(customer, changeBatch(customer))
  }

  /** Point-in-time (time-travel) read of the SCD2 history — the
    * CONSUMER that justifies keeping versions at all: the dimension as
    * of epoch 0 (pre-batch) and epoch 1 (post-batch), each
    * reconstructed by the interval predicate
    * `valid_from ≤ t < coalesce(valid_to, ∞)`. The epoch-0 read must
    * equal the raw snapshot byte-for-byte and the epoch-1 read the
    * merged current state — and the ORACLE derives both from first
    * principles (raw customer + the change rules), never from the
    * history table, so a corrupted interval column cannot self-verify.
    * Map-side filter over the history; no new shuffles. */
  def scd2AsOf(spark: SparkSession, sfDir: String): DataFrame = {
    val hist = scd2Merge(spark, sfDir)
    Seq(0L, 1L).map { t =>
      hist.filter(col("valid_from") <= t &&
          (col("valid_to").isNull || col("valid_to") > t))
        .select((lit(t).as("as_of") +: col("c_custkey") +: attrs.map(col)): _*)
    }.reduce(_ unionByName _).orderBy(col("as_of"), col("c_custkey"))
  }
}
