package graft.ops

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

/** Frequency-sketch operators whose approximate core is wrapped in an
  * exact-recount second pass — the two-pass formulation that keeps the
  * output EXACT (and therefore DuckDB-oracle-checkable) while the
  * shuffle stays sketch-sized. Complements `sketch_aggregates`'s
  * HLL/KLL tier (whose internals are rows-only by nature).
  */
object Sketches {

  /** φ-heavy hitters (keys with frequency > φ·n) via per-partition
    * Misra-Gries + exact recount — the canonical two-pass heavy-hitter
    * plan for key spaces too wide to groupBy outright:
    *
    *  1. each partition runs Misra-Gries with k = ⌈2/φ⌉ counters (a
    *     bounded-memory linear scan; the decrement-all step amortizes
    *     to O(1)/item). Any key with global share > φ has local share
    *     ≥ φ > 1/k in SOME partition (averaging argument), so the
    *     union of survivors is a guaranteed SUPERSET of the answer —
    *     at most k keys per partition ever leave the executors.
    *  2. the survivor set (≤ k·partitions, broadcast) semi-joins the
    *     scan and only ITS keys are exactly recounted — the groupBy
    *     shuffles candidate-key partials, never the full key space.
    *
    * The final filter `count > φ·n` (one IEEE multiply of the exact
    * BIGINT total) makes the output exactly the φ-frequent set — the
    * sketch bounds WHAT is recounted, never what is reported, so the
    * whole operator hash-matches the brute-force oracle. */
  def heavyHitters(spark: SparkSession, sfDir: String, phi: Double = 0.0006): DataFrame = {
    import spark.implicits._
    val k = math.ceil(2.0 / phi).toInt
    val items = spark.read.parquet(s"$sfDir/lineitem.parquet")
      .select(col("l_partkey").as("key"))
    val candidates = items.as[Long].mapPartitions { it =>
      val counters = scala.collection.mutable.HashMap.empty[Long, Long]
      it.foreach { x =>
        counters.get(x) match {
          case Some(c) => counters.update(x, c + 1)
          case None if counters.size < k => counters.update(x, 1L)
          case None =>
            // decrement-all: each pass burns k counts and count mass is
            // bounded by the partition size, so passes amortize out
            val dead = List.newBuilder[Long]
            counters.foreach { case (key, c) =>
              if (c == 1L) dead += key else counters.update(key, c - 1)
            }
            dead.result().foreach(counters.remove)
        }
      }
      counters.keysIterator
    }.toDF("key").distinct()
    val total = items.agg(count(lit(1)).as("n_total"))
    items
      .join(broadcast(candidates), Seq("key"), "left_semi")
      .groupBy(col("key"))
      .agg(count(lit(1)).as("n"))
      .crossJoin(broadcast(total))
      .filter(col("n").cast("double") > col("n_total").cast("double") * phi)
      .select(col("key"), col("n"), col("n_total"))
      .orderBy(col("n").desc, col("key").asc)
  }
}
