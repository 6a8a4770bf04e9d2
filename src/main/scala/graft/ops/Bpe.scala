package graft.ops

import scala.collection.mutable.ArrayBuffer

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/** Distributed byte-pair-encoding merge TRAINING — the step past
  * `token_pmi`'s merge-priority statistic: actually learn the first K
  * merge rules from the corpus (engine extension past the reference
  * store, `TimeSeriesFunctions_GPL_0.5.1.R:16-40`; the algorithm is
  * the public Sennrich et al. BPE).
  *
  * The scale move is the WORD-FREQUENCY COLLAPSE: one corpus-scale
  * aggregate reduces the training set to (distinct word, count) —
  * vocabulary-sized, millions of rows at 100 TB, never corpus-sized —
  * and every subsequent iteration runs windows and aggregates over
  * that collapsed table. Pair statistics weight each word's pairs by
  * its corpus count, exactly like the reference implementation's
  * dictionary form.
  *
  * Merge semantics per step (both engines replay identically):
  * pair counts include overlapping occurrences ("aaa" contributes
  * (a,a) twice — the classic counting), the winning pair is
  * total-ordered by (count DESC, left ASC, right ASC), and the merge
  * applies LEFT-TO-RIGHT NON-OVERLAPPING: within each maximal run of
  * consecutive match positions, only even offsets from the run start
  * merge — a pure window formulation (gaps-and-islands run ids +
  * offset parity), no sequential scan, no recursion.
  *
  * The per-step top-1 pair is a 1-row driver collect (metadata-scale
  * by design, the same class as the bloom sizing probes); the symbol
  * table is lineage-cut per iteration like the PageRank loop.
  */
object Bpe {

  /** Number of merge rules learned by the registered query (the
    * oracle unrolls exactly this many steps). */
  val Steps = 6

  private[graft] def wordCounts(spark: SparkSession, sfDir: String): DataFrame =
    spark.read.parquet(s"$sfDir/documents.parquet")
      .select(explode(split(lower(trim(coalesce(col("text"), lit("")))), "\\s+"))
        .as("word"))
      .filter(length(col("word")) > 0)
      .groupBy(col("word")).agg(count(lit(1)).as("n"))

  /** The learned merge table: (step, pair_a, pair_b, n_pairs) with
    * n_pairs the weighted (overlap-inclusive) pair count at selection
    * time. Emits fewer than `steps` rows iff the symbol table runs out
    * of adjacent pairs first. */
  def bpeMerges(spark: SparkSession, sfDir: String, steps: Int = Steps): DataFrame = {
    import spark.implicits._
    trainState(spark, sfDir, steps)._1
      .toDF("step", "pair_a", "pair_b", "n_pairs").orderBy(col("step"))
  }

  /** Session cache of the trained state, keyed by (app, corpus,
    * steps): `bpe_merges` and `bpe_token_stats` share one training run
    * instead of each paying the K-iteration loop (the measured cost of
    * not caching was the consumer re-training at 2.2 s per bench
    * invocation). The final symbol table is vocabulary-sized and
    * already lineage-cut, so holding it is metadata-scale. */
  private val stateCache = new java.util.concurrent.ConcurrentHashMap[
    (String, String, Int), (Seq[(Long, String, String, Long)], DataFrame)]()

  /** Release the trained-state cache (the resident-service release
    * contract every other session cache honors — see
    * `Dedup.clearCaches`). The held symbol tables are localCheckpointed
    * DataFrames whose blocks live in executor block memory; dropping
    * the references lets the ContextCleaner reclaim the checkpoint
    * RDDs once no plan holds them. */
  def clearCaches(): Unit = {
    stateCache.values.forEach(v => v._2.unpersist())
    stateCache.clear()
    batchedCache.clear()
  }

  /** Training loop shared by the merge table and its consumer: returns
    * the merge rules AND the final per-word symbol table. */
  private def trainState(spark: SparkSession, sfDir: String, steps: Int)
      : (Seq[(Long, String, String, Long)], DataFrame) =
    stateCache.computeIfAbsent(
      (spark.sparkContext.applicationId, sfDir, steps),
      _ => trainStateUncached(spark, sfDir, steps))

  private def trainStateUncached(spark: SparkSession, sfDir: String, steps: Int)
      : (Seq[(Long, String, String, Long)], DataFrame) = {
    var syms = wordCounts(spark, sfDir)
      .select(col("word"), col("n"),
        posexplode(expr(
          "transform(sequence(1, length(word)), i -> substring(word, i, 1))"))
          .as(Seq("pos", "sym")))
      .localCheckpoint()
    val merges = ArrayBuffer[(Long, String, String, Long)]()
    var exhausted = false
    for (k <- 1 to steps if !exhausted) {
      val w = Window.partitionBy(col("word")).orderBy(col("pos"))
      val withNext = syms.withColumn("nxt", lead(col("sym"), 1).over(w))
      val top = withNext.filter(col("nxt").isNotNull)
        .groupBy(col("sym"), col("nxt")).agg(sum(col("n")).as("cnt"))
        .orderBy(col("cnt").desc, col("sym").asc, col("nxt").asc)
        .limit(1).collect()
      if (top.isEmpty) exhausted = true
      else {
        val (pa, pb, cnt) = (top(0).getString(0), top(0).getString(1), top(0).getLong(2))
        merges += ((k.toLong, pa, pb, cnt))
        val marked = withNext
          .withColumn("m", coalesce(
            col("sym") === lit(pa) && col("nxt") === lit(pb), lit(false)))
          .withColumn("m_start",
            col("m") && !coalesce(lag(col("m"), 1).over(w), lit(false)))
          .withColumn("grp", sum(col("m_start").cast("int")).over(w))
          .withColumn("run_start", min(when(col("m"), col("pos")))
            .over(Window.partitionBy(col("word"), col("grp"))))
          .withColumn("do_merge",
            col("m") && (col("pos") - col("run_start")) % 2 === 0)
          .withColumn("consumed",
            coalesce(lag(col("do_merge"), 1).over(w), lit(false)))
        syms = marked.filter(!col("consumed"))
          .select(col("word"), col("n"),
            when(col("do_merge"), concat(col("sym"), col("nxt")))
              .otherwise(col("sym")).as("sym"),
            row_number().over(w).as("pos"))
          .localCheckpoint()
      }
    }
    (merges.toSeq, syms)
  }

  /** BATCHED merge selection — the production-vocabulary path. The
    * top-1-per-iteration loop above is the textbook algorithm and the
    * oracle anchor, but its driver round-trip count is O(#merges): a
    * 30k-merge vocabulary would mean 30k distributed jobs of pure
    * scheduling latency. This variant learns MANY merges per
    * distributed round with the standard non-interacting batch trick:
    *
    *  1. count pairs once (same weighted, overlap-inclusive counts),
    *  2. collect the top candidate slice to the driver (bounded:
    *     ≤ 8·want rows of (sym, nxt, cnt) — metadata-scale at any
    *     production vocabulary),
    *  3. accept candidates in rank order (cnt DESC, sym, nxt), greedily
    *     skipping any pair that CHAINS with an already-accepted pair of
    *     this round — its right symbol is some accepted pair's left, or
    *     its left is some accepted pair's right,
    *  4. apply every accepted merge in ONE window pass.
    *
    * Chain exclusion is the EXACT interaction condition, not a coarse
    * proxy: two matches of different accepted pairs can only touch by
    * being adjacent (positions p, p+1 then p+1, p+2), which forces
    * b_i = a_j — precisely the blocked relation — so matches of
    * different pairs never overlap, every maximal match run involves
    * one pair (the run-parity logic applies unchanged), and applying
    * one accepted merge can neither create nor destroy another's match
    * (the merged symbol is new to the round). Simultaneous application
    * is therefore EXACTLY sequential application. Round 13 relaxed the
    * earlier all-symbols-disjoint rule to this (left-left and
    * right-right sharing is harmless — "th"+"sh" coexist; "th"+"he"
    * still block on the chained h): at a 6k-word vocabulary the
    * disjoint rule averaged 27 accepts/round and stalled at 868
    * merges in 32 rounds; chain exclusion reaches 1024 well inside
    * the soak's 32-round gate. What batching changes vs the
    * sequential textbook loop is only selection VISIBILITY: counts
    * refresh once per round, not per merge — the standard, documented
    * batched-BPE approximation. With `perRoundCap = 1` the loop
    * degenerates to the exact algorithm (pinned against [[bpeMerges]]
    * in OpsSpec).
    *
    * Emits (round, step, pair_a, pair_b, n_pairs): `round` = the
    * distributed round that learned the rule, `step` = global rule
    * order, `n_pairs` = the weighted count at that round's selection
    * time. */
  def bpeMergesBatched(spark: SparkSession, sfDir: String,
      targetMerges: Int = 64, maxRounds: Int = 8,
      perRoundCap: Int = Int.MaxValue): DataFrame = {
    import spark.implicits._
    batchedCache.computeIfAbsent(
      (spark.sparkContext.applicationId, sfDir, targetMerges, maxRounds, perRoundCap),
      _ => trainBatchedUncached(spark, sfDir, targetMerges, maxRounds, perRoundCap))
      .toDF("round", "step", "pair_a", "pair_b", "n_pairs")
      .orderBy(col("step"))
  }

  private val batchedCache = new java.util.concurrent.ConcurrentHashMap[
    (String, String, Int, Int, Int), Seq[(Long, Long, String, String, Long)]]()

  private def trainBatchedUncached(spark: SparkSession, sfDir: String,
      targetMerges: Int, maxRounds: Int, perRoundCap: Int)
      : Seq[(Long, Long, String, String, Long)] = {
    var syms = wordCounts(spark, sfDir)
      .select(col("word"), col("n"),
        posexplode(expr(
          "transform(sequence(1, length(word)), i -> substring(word, i, 1))"))
          .as(Seq("pos", "sym")))
      .localCheckpoint()
    val merges = ArrayBuffer[(Long, Long, String, String, Long)]()
    var round = 0
    var exhausted = false
    while (merges.size < targetMerges && round < maxRounds && !exhausted) {
      round += 1
      val w = Window.partitionBy(col("word")).orderBy(col("pos"))
      val withNext = syms.withColumn("nxt", lead(col("sym"), 1).over(w))
      // candidate slice: enough rank-ordered rows that the greedy
      // disjointness filter can fill the round even when hot symbols
      // cluster at the top (each acceptance blocks only pairs touching
      // its 2 symbols)
      val want = math.min(perRoundCap, targetMerges - merges.size)
      val cand = withNext.filter(col("nxt").isNotNull)
        .groupBy(col("sym"), col("nxt")).agg(sum(col("n")).as("cnt"))
        .orderBy(col("cnt").desc, col("sym").asc, col("nxt").asc)
        .limit(math.max(64, want * 8)).collect()
      if (cand.isEmpty) exhausted = true
      else {
        // chain exclusion: a new (a, b) is safe iff b is no accepted
        // left AND a is no accepted right (the adjacency argument) —
        // plus the string-keyed corner: neither member may EQUAL a
        // symbol another accepted merge produces this round (its
        // concat), and the new concat may not be a symbol an accepted
        // pair consumes; otherwise sequential application would see
        // matches the simultaneous pass cannot.
        val lefts = scala.collection.mutable.HashSet.empty[String]
        val rights = scala.collection.mutable.HashSet.empty[String]
        val concats = scala.collection.mutable.HashSet.empty[String]
        val accepted = ArrayBuffer[(String, String, Long)]()
        val it = cand.iterator
        while (accepted.size < want && it.hasNext) {
          val r = it.next()
          val (a, b) = (r.getString(0), r.getString(1))
          val cc = a + b
          if (!lefts.contains(b) && !rights.contains(a) &&
              !concats.contains(a) && !concats.contains(b) &&
              !lefts.contains(cc) && !rights.contains(cc)) {
            accepted += ((a, b, r.getLong(2)))
            lefts += a; rights += b; concats += cc
          }
        }
        accepted.foreach { case (a, b, c) =>
          merges += ((round.toLong, merges.size + 1L, a, b, c))
        }
        // a SET-membership match, not a reduce(_||_) disjunction: at
        // production batch sizes (hundreds of accepts per round) the
        // Or-tree is deep enough to overflow the Column-conversion
        // stack, while In/InSet over a composite key stays flat and
        // whole-stage-codegen'd. A NUL separator can't occur inside a
        // symbol (symbols come from whitespace-split words), so the
        // composite key is collision-free.
        val keys = accepted.map { case (a, b, _) => a + "\u0000" + b }
        val isMatch = col("nxt").isNotNull &&
          concat(col("sym"), lit("\u0000"), col("nxt")).isin(keys.toSeq: _*)
        val marked = withNext
          .withColumn("m", coalesce(isMatch, lit(false)))
          .withColumn("m_start",
            col("m") && !coalesce(lag(col("m"), 1).over(w), lit(false)))
          .withColumn("grp", sum(col("m_start").cast("int")).over(w))
          .withColumn("run_start", min(when(col("m"), col("pos")))
            .over(Window.partitionBy(col("word"), col("grp"))))
          .withColumn("do_merge",
            col("m") && (col("pos") - col("run_start")) % 2 === 0)
          .withColumn("consumed",
            coalesce(lag(col("do_merge"), 1).over(w), lit(false)))
        syms = marked.filter(!col("consumed"))
          .select(col("word"), col("n"),
            when(col("do_merge"), concat(col("sym"), col("nxt")))
              .otherwise(col("sym")).as("sym"),
            row_number().over(w).as("pos"))
          .localCheckpoint()
      }
    }
    merges.toSeq
  }

  /** The merge table's CONSUMER (no signature tables to nowhere): the
    * learned rules applied back to the corpus as a tokenizer-quality
    * report — per (lang, source): documents, word instances, character
    * mass, the BPE token count under the trained vocabulary, and the
    * chars-per-token compression ratio (the number a tokenizer team
    * actually tracks per language). The final symbol table is
    * vocabulary-sized; the per-word token counts broadcast back onto
    * the corpus word explode, so the only corpus-scale shuffle is the
    * (lang, source) aggregate of count partials. */
  def bpeTokenStats(spark: SparkSession, sfDir: String, steps: Int = Steps): DataFrame = {
    val perWord = trainState(spark, sfDir, steps)._2
      .groupBy(col("word")).agg(count(lit(1)).as("n_sym"))
    spark.read.parquet(s"$sfDir/documents.parquet")
      .select(col("doc_id"), col("lang"), col("source"),
        explode(split(lower(trim(coalesce(col("text"), lit("")))), "\\s+"))
          .as("word"))
      .filter(length(col("word")) > 0)
      .join(broadcast(perWord), "word")
      .groupBy(col("lang"), col("source"))
      .agg(countDistinct(col("doc_id")).as("n_docs"),
        count(lit(1)).as("n_words"),
        sum(length(col("word"))).as("n_chars"),
        sum(col("n_sym")).as("n_bpe_tokens"))
      .select(col("lang"), col("source"), col("n_docs"), col("n_words"),
        col("n_chars"), col("n_bpe_tokens"),
        round(col("n_chars").cast("double") /
          col("n_bpe_tokens").cast("double"), 6).as("chars_per_token"))
      .orderBy(col("lang"), col("source"))
  }
}
