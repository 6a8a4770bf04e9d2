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

  /** Near-duplicate CLUSTERS: connected components over the blocked-
    * Jaccard candidate pairs (threshold 0.95 word-unigram, the
    * hash-verified `ngram_jaccard` edge set), by iterative min-label
    * propagation — the dedup step that turns pairwise "A≈B" into "keep
    * one doc per transitive group", which pair lists alone cannot
    * express (A≈B, B≈C ⇒ {A,B,C} even when A̸≈C).
    *
    * Each round is one shuffled join + min-aggregation: every node
    * adopts the smallest label among itself and its neighbors. Rounds
    * needed = graph diameter ≤ O(log n) for near-dup clusters (which
    * are near-cliques — usually 2 rounds). The driver loop only
    * compares a per-round convergence COUNT (one long), never rows;
    * at 1000 executors each round is a plain distributed join. The
    * classic large-star/small-star optimization halves the rounds at
    * extreme diameters; near-dup graphs never get there.
    *
    * Output: (doc_id, cluster_id = min doc_id of the component,
    * cluster_size) for every document (singletons cluster with
    * themselves). Deterministic ⇒ DuckDB-oracle-checkable via a
    * recursive CTE. */
  def dupClusters(spark: SparkSession, sfDir: String, threshold: Double = 0.95): DataFrame = {
    val pairs = NearDup.blockedJaccard(spark, sfDir, threshold)
      .select(col("doc_a"), col("doc_b"))
    // undirected edge list, both directions
    val edges = pairs.union(pairs.select(col("doc_b").as("doc_a"), col("doc_a").as("doc_b")))
      .withColumnRenamed("doc_a", "src").withColumnRenamed("doc_b", "dst")
      .localCheckpoint() // the edge set is reused every round — cut the lineage once
    var labels = docs(spark, sfDir)
      .select(col("doc_id"), col("doc_id").as("cluster_id"))
      .localCheckpoint()
    var changed = 1L
    var rounds = 0
    while (changed > 0 && rounds < 20) {
      val neighborMin = edges
        .join(labels.withColumnRenamed("doc_id", "src"), "src")
        .groupBy(col("dst").as("doc_id"))
        .agg(min(col("cluster_id")).as("nbr_min"))
      val next = labels
        .join(neighborMin, Seq("doc_id"), "left")
        .select(col("doc_id"),
          least(col("cluster_id"), coalesce(col("nbr_min"), col("cluster_id"))).as("cluster_id"),
          (coalesce(col("nbr_min"), col("cluster_id")) < col("cluster_id")).as("chg"))
        .localCheckpoint() // truncate the per-round lineage (iterative plan growth)
      // convergence probe scans the (tiny, checkpointed) label table only
      changed = next.filter(col("chg")).count()
      labels = next.select(col("doc_id"), col("cluster_id"))
      rounds += 1
    }
    val sizes = labels.groupBy(col("cluster_id")).agg(count(lit(1)).as("cluster_size"))
    labels.join(sizes, "cluster_id")
      .select(col("doc_id"), col("cluster_id"), col("cluster_size"))
      .orderBy(col("doc_id"))
  }

  /** The composed curation pipeline — what a training-data run actually
    * executes over 100 TB: quality filter → PII screen → one-per-near-
    * dup-cluster dedup, in one declarative plan.
    *
    * Keep a document iff (a) its composite quality score ≥ `minQuality`
    * ([[TextAnalysis.qualityScore]]), (b) the PII scan found nothing
    * ([[TextAnalysis.piiScan]]), and (c) it is its near-dup cluster's
    * representative (`doc_id == cluster_id` from [[dupClusters]] —
    * cluster structure is computed over the FULL corpus, so the
    * min-doc_id representative is stable regardless of which members
    * the filters drop). Each input is itself hash-verified against its
    * own oracle; the composition is verified against a combined oracle
    * too, so the end-to-end keep set is exact, not just plausible. */
  def curateCorpus(spark: SparkSession, sfDir: String, minQuality: Double = 0.5): DataFrame = {
    val quality = graft.ops.TextAnalysis.qualityScore(spark, sfDir)
      .select(col("doc_id"), col("lang"), col("source"), col("quality"))
    val pii = graft.ops.TextAnalysis.piiScan(spark, sfDir)
      .select(col("doc_id"), col("flagged"))
    val clusters = dupClusters(spark, sfDir)
      .select(col("doc_id"), col("cluster_id"))
    quality
      .join(pii, "doc_id")
      .join(clusters, "doc_id")
      .filter(col("quality") >= minQuality && !col("flagged")
        && col("doc_id") === col("cluster_id"))
      .select(col("doc_id"), col("lang"), col("source"), col("quality"))
      .orderBy(col("doc_id"))
  }
}
