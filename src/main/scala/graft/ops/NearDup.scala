package graft.ops

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

/** Near-duplicate detection over the `documents` table — the LLM-data-
  * pipeline dedup suite (north-star extensions; not in the reference).
  *
  * Three tiers, by scale posture:
  *  - `blockedJaccard`: EXACT token-set Jaccard, but only within
  *    (lang, source) blocks — the classic blocking trick that keeps the
  *    shingle self-join from exploding (an unblocked join on a common
  *    token is O(docs²) at 100 TB). Fully oracle-checkable SQL.
  *  - `minhashCandidates`: MinHash + banded LSH built from codegen'd
  *    built-in expressions (a custom AND-8/OR-4 banding scheme — MLlib's
  *    `MinHashLSH` is OR-only and degenerates to all-pairs on
  *    self-similar corpora) — the 100 TB path: candidate generation is a
  *    hash-bucket equi-join with a deterministic per-bucket size cap,
  *    never all-pairs. Seeded, deterministic.
  *  - `simhash`: 64-bit SimHash signatures from xxhash64 token hashes,
  *    computed entirely with codegen'd built-in expressions (64 parallel
  *    conditional sums — no UDF), plus banded 16-bit keys for bucketing.
  */
object NearDup {

  private def docs(spark: SparkSession, sfDir: String): DataFrame =
    spark.read.parquet(s"$sfDir/documents.parquet")

  /** Distinct lowercase whitespace tokens per doc. */
  private def tokens(spark: SparkSession, sfDir: String): DataFrame =
    shingles(spark, sfDir, 1)

  /** Distinct word n-gram shingle HASHES per doc (n = 1 → hashed token
    * set). Tokens are hashed once (`xxhash64` inside a `transform` —
    * one pass over the split array) and n-grams are composed by hashing
    * the n consecutive token hashes — pure 8-byte arithmetic, so no
    * n-word strings are ever built or re-hashed (the string form made
    * the bigram join ~4× the unigram cost). A doc shorter than n
    * contributes one shingle, the fold-hash of its whole token-hash
    * array (mirroring the clamped-slice semantics of the string form
    * without an out-of-bounds `element_at` under ANSI).
    *
    * Exactness: set cardinalities and cross-doc equalities match the
    * string-shingle form unless two distinct token sequences collide in
    * the composed hash — p ≈ d²/2⁶⁵, the same negligible bound as the
    * token-hash join (and the DuckDB oracles, which build real
    * `chr(1)`-separated shingle strings, hash-verify the outputs). */
  def shingles(spark: SparkSession, sfDir: String, n: Int): DataFrame = {
    val base = docs(spark, sfDir)
      .select(col("doc_id"), col("lang"), col("source"),
        expr("transform(split(lower(trim(text)), '\\\\s+'), w -> xxhash64(w))").as("th"))
    val sh =
      if (n <= 1) col("th")
      else {
        val comp = (0 until n).map(j => s"element_at(th, i + $j)").mkString(", ")
        expr(
          s"""CASE WHEN size(th) < $n
             |  THEN array(aggregate(th, CAST($n AS BIGINT), (acc, x) -> xxhash64(acc, x)))
             |  ELSE transform(sequence(1, size(th) - ${n - 1}), i -> xxhash64($comp))
             |END""".stripMargin)
      }
    base.select(col("doc_id"), col("lang"), col("source"), array_distinct(sh).as("toks"))
  }

  /** Exact token-set Jaccard within (lang, source) blocks: explode →
    * equi-join on (block, token) → per-pair intersection count →
    * |A∪B| = |A| + |B| − |A∩B|. One shuffle on the block+token key; the
    * block bound keeps each join group small regardless of corpus size.
    *
    * The join key is xxhash64(token), not the token string: the hot
    * shuffle carries 8-byte longs instead of variable-length text, and
    * the sort/compare in the join is primitive. Exactness argument: a
    * token-hash collision WITHIN one (lang, source, doc-pair) group is
    * the only way a count can differ from the string join — p ≈ d²/2⁶⁵
    * for d distinct tokens per block, negligible even at 10⁹ tokens
    * (and the DuckDB oracle, which joins on strings, hash-verifies the
    * result at test scale).
    *
    * Thresholds ≥ [[PairFloor]] share one cached pair build per
    * (app, corpus, ngram) — see [[PairFloor]]'s scaladoc for the
    * output-identity argument. */
  def blockedJaccard(spark: SparkSession, sfDir: String, threshold: Double = 0.95,
      ngram: Int = 1): DataFrame =
    if (threshold >= PairFloor)
      cachedFloorPairs(spark, sfDir, ngram)
        .filter(col("jaccard") >= threshold)
        .orderBy(col("doc_a"), col("doc_b"))
    else blockedJaccardDirect(spark, sfDir, threshold, ngram)

  /** Loosest threshold any registered consumer uses (`split_leakage`'s
    * 0.8). The exploded token self-join — the expensive subplan — is
    * computed ONCE per (app, corpus, ngram) at this floor, persisted
    * (a (long, long, double) pair table — 38k rows at sf0.1), and every
    * tighter threshold (`ngram_jaccard` 0.95, the CC edge set 0.95)
    * derives by a filter: provably identical output, because any pair
    * accepted at round(J,4) ≥ t ≥ 0.8 survives the floor's slackened
    * length-prune too. */
  val PairFloor = 0.8

  private val floorPairCache =
    new java.util.concurrent.ConcurrentHashMap[(String, String, Int), DataFrame]()

  private def cachedFloorPairs(spark: SparkSession, sfDir: String, ngram: Int): DataFrame =
    floorPairCache.computeIfAbsent((spark.sparkContext.applicationId, sfDir, ngram),
      _ => blockedJaccardDirect(spark, sfDir, PairFloor, ngram)
        .persist(org.apache.spark.storage.StorageLevel.MEMORY_AND_DISK))

  /** Largest-label-block cardinality for the exact-tier guard, cached
    * per (app, corpus) — see the call site in [[embeddingNearDup]]. */
  private val maxBlockCache =
    new java.util.concurrent.ConcurrentHashMap[(String, String), java.lang.Long]()

  /** Release the cached pair tables (see `Dedup.clearCaches` for why a
    * long-lived session wants this). */
  def clearCaches(): Unit = {
    maxBlockCache.clear()
    floorPairCache.values.forEach(df => { df.unpersist(); () })
    floorPairCache.clear()
    simhashSigCache.values.forEach(df => { df.unpersist(); () })
    simhashSigCache.clear()
    minhashSigCache.values.forEach(df => { df.unpersist(); () })
    minhashSigCache.clear()
    minhashBucketCache.values.forEach(df => { df.unpersist(); () })
    minhashBucketCache.clear()
    trigramTfCache.values.forEach(df => { df.unpersist(); () })
    trigramTfCache.clear()
    spanCache.values.forEach(df => { df.unpersist(); () })
    spanCache.clear()
  }

  private def blockedJaccardDirect(spark: SparkSession, sfDir: String, threshold: Double,
      ngram: Int): DataFrame = {
    // toks already ARE the 8-byte shingle hashes — explode and join
    val t = shingles(spark, sfDir, ngram)
      .select(col("doc_id"), col("lang"), col("source"),
        size(col("toks")).as("n"), explode(col("toks")).as("w"))
    val a = t.select(col("lang"), col("source"), col("w"),
      col("doc_id").as("doc_a"), col("n").as("na"))
    val b = t.select(col("lang"), col("source"), col("w"),
      col("doc_id").as("doc_b"), col("n").as("nb"))
    a.join(b, Seq("lang", "source", "w"))
      .filter(col("doc_a") < col("doc_b"))
      // length filter (standard set-similarity-join pruning): J(A,B) ≤
      // min(|A|,|B|)/max(|A|,|B|), so J ≥ t requires the token-set
      // sizes to be within a factor t — it drops cross-size pairs
      // BEFORE the count aggregation. The final acceptance compares
      // round(J, 4) ≥ t, which admits raw J down to t − 0.00005, so the
      // prune uses that slackened bound too — otherwise a pair sitting
      // exactly on the rounding boundary could pass the oracle's HAVING
      // while being size-pruned here
      .filter(col("na") >= col("nb") * (threshold - 0.00005)
        && col("nb") >= col("na") * (threshold - 0.00005))
      .groupBy(col("doc_a"), col("doc_b"), col("na"), col("nb"))
      .agg(count(lit(1)).as("inter"))
      .withColumn("jaccard",
        round(col("inter").cast("double") / (col("na") + col("nb") - col("inter")), 4))
      .filter(col("jaccard") >= threshold)
      .select(col("doc_a"), col("doc_b"), col("jaccard"))
      .orderBy(col("doc_a"), col("doc_b"))
  }

  val MinhashHashes = 32
  val MinhashBands = 4 // 4 bands × 8 rows: AND-8 then OR-4
  /** Deterministic per-bucket population cap for the band self-join.
    * A band bucket with more than this many docs is split into
    * ceil(n/cap) salt groups by a secondary hash of doc_id and pairs are
    * only generated within a salt group — bounding the join at
    * O(buckets · cap²) instead of O(hottest-bucket²). Recall cost: a
    * true pair in an oversized bucket survives that band with
    * probability ~1/nsplits, but near-duplicates collide in several of
    * the 4 OR'd bands, so the measured recall loss is small (and at
    * 100 TB an uncapped hot bucket is not a recall question but an
    * out-of-time question). */
  val MinhashMaxBucket = 512

  /** MinHash signatures + banded LSH candidate pairs, entirely in
    * codegen'd built-in expressions (no UDF, no vector objects):
    *
    *  1. signature: 32 per-document mins of `xxhash64(i, xxhash64(token))`
    *     — one aggregation pass, shuffle carries (doc_id, 32 longs);
    *  2. bands: 4 keys of 8 signature rows each (AND-amplification —
    *     r = 8 rows per band suppresses the bucket blow-up that a
    *     1-row-per-table scheme (e.g. MLlib MinHashLSH) suffers on a
    *     self-similar corpus, where OR-only banding degenerates to the
    *     all-pairs join);
    *  3. candidates: equi-join on the (band, salt) key shuffling ONLY
    *     (band, salt, doc_id) — never tokens or text — with oversized
    *     buckets split into ≤[[MinhashMaxBucket]]-doc salt groups (see
    *     the cap's scaladoc) — then distinct;
    *  4. similarity: the MinHash ESTIMATE (matching signature fraction),
    *     computed by plain equi-joins of the signature table back on
    *     both sides — 32 integer compares per candidate, codegen'd. No
    *     broadcast hints: the signature table is O(corpus) and cannot be
    *     assumed executor-memory-sized at 100 TB; AQE still picks a
    *     broadcast when the measured size allows it.
    *
    * CANDIDATE semantics: the estimate filter keeps
    * `est ≥ threshold − 2σ`, σ = √(t(1−t)/32) — the estimate of a pair
    * sitting AT the true threshold is Binomial(32, t)/32, so a strict
    * `est ≥ t` cut drops ~half of exactly-threshold pairs (sf0.1
    * measured pair recall 0.58 strict → 0.68 with slack; at sf0.001
    * every exact pair is a J=1 twin, which is why the small-scale gate
    * could not see it). A candidate generator must over-approximate —
    * exact confirmation is the consumer's job (the dedup pipeline
    * verifies with true Jaccard on the candidate set).
    *
    * The right recall metric for dedup is COMPONENT-level, not
    * pair-level: this corpus's exact J ≥ 0.95 edges are dominated by
    * large duplicate cliques whose band buckets split under the
    * 512 cap, capping within-clique pair survival at 1−(3/4)⁴ ≈ 0.68
    * — but a clique only needs a spanning subset of its edges to land
    * in one component, and refusing to emit all C(n,2) clique edges is
    * the cap's entire point at 100 TB. Measured at sf0.1: pair recall
    * 0.68, component recall 1.00 (every exact pair's endpoints
    * connected in the candidate graph) — the latter is gated in
    * OpsSpec. Band-hit recall at j ≥ 0.95 for an un-split bucket is
    * 1−(1−0.95⁸)⁴ ≈ 0.96. Seeded and deterministic; `jaccard_est` is
    * emitted so consumers can re-tighten. */
  def minhashCandidates(spark: SparkSession, sfDir: String, threshold: Double = 0.95,
      ngram: Int = 1): DataFrame = {
    // ngram > 1 = the SCALE path for phrase-level near-dup: the exact
    // bigram join costs ~5x the unigram tier on vocab-dense corpora,
    // while the minhash cost is ngram-independent (32 mins per doc)
    val sigs = minhashSigs(spark, sfDir, ngram)
    val bucketed = minhashBuckets(spark, sfDir, ngram)
    // dedup candidates BEFORE the signature joins: the distinct shuffle
    // carries 16-byte id pairs, which measures ~2.5× cheaper than
    // streaming every duplicate through the 64-column estimate
    val cand = bucketed.as("a")
      .join(bucketed.as("b"),
        col("a.band") === col("b.band") && col("a.salt") === col("b.salt")
          && col("a.doc_id") < col("b.doc_id"))
      .select(col("a.doc_id").as("doc_a"), col("b.doc_id").as("doc_b"))
      .distinct()
    val sa = sigs.select(col("doc_id").as("doc_a") +:
      (0 until MinhashHashes).map(i => col(s"m$i").as(s"a$i")): _*)
    val sb = sigs.select(col("doc_id").as("doc_b") +:
      (0 until MinhashHashes).map(i => col(s"m$i").as(s"b$i")): _*)
    val matches = (0 until MinhashHashes)
      .map(i => when(col(s"a$i") === col(s"b$i"), 1).otherwise(0))
      .reduce(_ + _)
    cand
      .join(sa, "doc_a")
      .join(sb, "doc_b")
      .withColumn("jaccard_est", round(matches.cast("double") / MinhashHashes, 4))
      .filter(col("jaccard_est") >=
        threshold - 2 * math.sqrt(threshold * (1 - threshold) / MinhashHashes))
      .select(col("doc_a"), col("doc_b"), col("jaccard_est"))
      .orderBy(col("doc_a"), col("doc_b"))
  }

  /** MinHash probe of a SMALL id set against the whole corpus — the
    * asymmetric sibling of [[minhashCandidates]]'s self-join, built for
    * benchmark decontamination: the probe side (eval docs) is
    * benchmark-sized, so its band keys broadcast and the corpus bucket
    * table STREAMS map-side into the join — no self-join, no salt
    * needed (salting exists to cap the self-join's bucket²  blowup; a
    * broadcast probe is linear in the bucket size by construction).
    * Candidates dedup to bare (eval_id, doc_id) pairs before the
    * 64-column signature estimate joins, same as the self-join tier.
    * Output: (eval_id, doc_id, jaccard_est ≥ threshold), self-pairs
    * excluded. */
  def minhashAgainst(spark: SparkSession, sfDir: String, evalIds: DataFrame,
      threshold: Double, ngram: Int = 1): DataFrame = {
    val bucketed = minhashBuckets(spark, sfDir, ngram)
    val evalBands = bucketed
      .join(broadcast(evalIds), bucketed("doc_id") === evalIds("eval_id"))
      .select(col("eval_id"), col("band")).distinct()
    val cand = bucketed
      .join(broadcast(evalBands), Seq("band"))
      .filter(col("doc_id") =!= col("eval_id"))
      .select(col("eval_id"), col("doc_id")).distinct()
    val sigs = minhashSigs(spark, sfDir, ngram)
    val se = sigs.select(col("doc_id").as("eval_id") +:
      (0 until MinhashHashes).map(i => col(s"m$i").as(s"a$i")): _*)
    val sd = sigs.select(col("doc_id") +:
      (0 until MinhashHashes).map(i => col(s"m$i").as(s"b$i")): _*)
    val matches = (0 until MinhashHashes)
      .map(i => when(col(s"a$i") === col(s"b$i"), 1).otherwise(0))
      .reduce(_ + _)
    cand
      .join(broadcast(se), "eval_id")
      .join(sd, "doc_id")
      .withColumn("jaccard_est", round(matches.cast("double") / MinhashHashes, 4))
      .filter(col("jaccard_est") >= threshold)
      .select(col("eval_id"), col("doc_id"), col("jaccard_est"))
      .orderBy(col("eval_id"), col("doc_id"))
  }

  /** Session cache of the salted band-bucket table, keyed like the
    * signature cache: band-key derivation + the bucket-count window +
    * salt assignment is deterministic per corpus and read by BOTH sides
    * of the candidate self-join on every invocation (plus the recall
    * gate) — computed once, persisted (4 small columns per (doc,
    * band)). */
  private val minhashBucketCache =
    new java.util.concurrent.ConcurrentHashMap[(String, String, Int), DataFrame]()

  private def minhashBuckets(spark: SparkSession, sfDir: String, ngram: Int): DataFrame =
    minhashBucketCache.computeIfAbsent((spark.sparkContext.applicationId, sfDir, ngram), { _ =>
      val rowsPerBand = MinhashHashes / MinhashBands
      val sigs = minhashSigs(spark, sfDir, ngram)
      val bandRows = (0 until MinhashBands).map { b =>
        val key = xxhash64(lit(b) +: (b * rowsPerBand until (b + 1) * rowsPerBand).map(i => col(s"m$i")): _*)
        sigs.select(col("doc_id"), key.as("band"))
      }.reduce(_ union _)
      // bound hot buckets before the self-join: count each band bucket
      // with a window over the band partition (one shuffle, no
      // join-back), then split oversized buckets into salt groups by a
      // secondary doc_id hash
      val bw = org.apache.spark.sql.expressions.Window.partitionBy(col("band"))
      bandRows
        .withColumn("nsplits",
          greatest(lit(1L),
            ceil(count(lit(1)).over(bw).cast("double") / MinhashMaxBucket).cast("long")))
        // fold the band key into the salt: a doc_id-only salt is the
        // SAME split in every band, so a pair split apart in one
        // oversized bucket loses every OR'd chance at once (see the
        // matching fix in Similarity.lshTopK, measured there at sf0.1)
        .select(col("band"), col("doc_id"),
          pmod(xxhash64(lit("salt"), col("band"), col("doc_id")), col("nsplits")).as("salt"))
        .persist(org.apache.spark.storage.StorageLevel.MEMORY_AND_DISK)
    })

  private val minhashSigCache =
    new java.util.concurrent.ConcurrentHashMap[(String, String, Int), DataFrame]()

  /** The (doc_id, m0..m31) MinHash signature table — computed once per
    * (app, corpus, ngram) and persisted (~260 bytes/doc): one
    * invocation of [[minhashCandidates]] reads it THREE times (banding
    * plus both sides of the estimate join), so without the cache the
    * shingle scan + 32-way min aggregate runs three times per call. */
  private def minhashSigs(spark: SparkSession, sfDir: String, ngram: Int): DataFrame =
    minhashSigCache.computeIfAbsent((spark.sparkContext.applicationId, sfDir, ngram), { _ =>
      val t = shingles(spark, sfDir, ngram)
        // toks already hold xxhash64(token) — same h values as before the
        // shingle layer pre-hashed, one hash pass saved
        .select(col("doc_id"), explode(col("toks")).as("h"))
      val sigCols = (0 until MinhashHashes).map(i => min(xxhash64(lit(i), col("h"))).as(s"m$i"))
      t.groupBy(col("doc_id")).agg(sigCols.head, sigCols.tail: _*)
        .persist(org.apache.spark.storage.StorageLevel.MEMORY_AND_DISK)
    })

  /** 64-bit SimHash per document from xxhash64 token hashes: for each bit
    * position, sum ±1 over the token set; the sign becomes the signature
    * bit. Pure built-in expressions (explode + 64 conditional sums →
    * whole-stage codegen); the shuffle carries (doc_id, 64 ints), never
    * text. Also emits a 16-bit band key — equal high-band docs are
    * hamming-near candidates (bucketing for the 100 TB path). */
  def simhash(spark: SparkSession, sfDir: String): DataFrame =
    simhashSigs(spark, sfDir)
      .select(col("doc_id"), col("simhash"),
        shiftrightunsigned(col("simhash"), 48).as("band_hi16"))
      .orderBy(col("doc_id"))

  private val simhashSigCache =
    new java.util.concurrent.ConcurrentHashMap[(String, String), DataFrame]()

  /** The (doc_id, simhash) signature table shared by [[simhash]] and
    * [[simhashHammingPairs]] — computed once per (app, corpus) and
    * persisted (16 bytes/doc), like the floor-pair and CC-label caches:
    * the signature pass is the token-scan + 64-way conditional-sum
    * aggregate, and both consumers (and both sides of the pair
    * self-join) want the identical table. */
  private def simhashSigs(spark: SparkSession, sfDir: String): DataFrame =
    simhashSigCache.computeIfAbsent((spark.sparkContext.applicationId, sfDir),
      _ => simhashSigsDirect(spark, sfDir)
        .persist(org.apache.spark.storage.StorageLevel.MEMORY_AND_DISK))

  private def simhashSigsDirect(spark: SparkSession, sfDir: String): DataFrame = {
    val t = tokens(spark, sfDir)
      // toks already hold xxhash64(token) — same h values as before the
      // shingle layer pre-hashed, one hash pass saved
      .select(col("doc_id"), explode(col("toks")).as("h"))
    val bitSums = (0 until 64).map { i =>
      sum(when(shiftright(col("h"), i).bitwiseAND(1) === 1, 1).otherwise(-1)).as(s"b$i")
    }
    val sig = (0 until 64).map { i =>
      when(col(s"b$i") > 0, shiftleft(lit(1L), i)).otherwise(0L)
    }.reduce((a, b) => a.bitwiseOR(b))
    t.groupBy(col("doc_id"))
      .agg(bitSums.head, bitSums.tail: _*)
      .withColumn("simhash", sig)
      .select(col("doc_id"), col("simhash"))
  }

  /** Per-bucket cap for the simhash band self-join — same scheme and
    * rationale as [[MinhashMaxBucket]]. */
  val SimhashMaxBucket = 512

  /** SimHash near-dup pairs — the consumer of the [[simhash]] signature
    * table (Manku et al. 2007, the web-dedup design): split the 64-bit
    * signature into `bands` disjoint bands; by pigeonhole, any pair at
    * hamming distance ≤ bands−1 agrees EXACTLY on at least one band, so
    * the band equi-join has guaranteed candidate recall up to that
    * radius (probabilistic above it — the pair must still collide in
    * one band); the exact `bit_count(a XOR b) ≤ r` filter then keeps
    * true hamming neighbors. All built-in expressions; the band shuffle
    * carries (band idx, band key, salt, doc_id, 8-byte signature) —
    * never tokens or text — with hot buckets salt-capped at
    * [[SimhashMaxBucket]] like the minhash join.
    *
    * The registered operating point is Manku's web-dedup configuration
    * (radius 3, 4 bands — 16-bit band keys, 64Ki buckets per band):
    * the 100 TB long-doc setting, where a near-dup of a multi-kB page
    * perturbs a tiny fraction of the feature mass and lands at
    * hamming ≤ 3. 64-bit SimHash is dimensioned for that regime ONLY —
    * on this short-doc testdata (median 56 tokens/doc) each changed
    * token moves ~2% of every sign-sum, so the measured hamming of the
    * exact Jaccard-0.95 twins spreads over 0–11+ while templated
    * NON-twin pairs crowd the same range: at sf0.1, widening the radius
    * to 11 (8 bands) emits 2.25 M pairs at 0.53 recall / 0.06%
    * precision vs the exact J ≥ 0.95 edge set — noise, not dedup.
    * Measured recall at (3, 4): 0.30 (sf0.01) / 0.20 (sf0.1),
    * quantifying WHY short-doc token-set near-dup routes to
    * [[minhashCandidates]] (recall-gated ≥ 0.8), with simhash as the
    * long-doc tool. What the suite gates for THIS operator is the
    * mechanism, not corpus fit: the pigeonhole guarantee (every pair
    * within hamming ≤ bands−1 whose bucket is not salt-split MUST be
    * emitted) and the exactness of the hamming filter — see OpsSpec. */
  def simhashHammingPairs(spark: SparkSession, sfDir: String, maxHamming: Int = 3,
      bands: Int = 4): DataFrame =
    bandedHammingPairs(simhashSigs(spark, sfDir).select(col("doc_id"), col("simhash").as("sig")),
      maxHamming, bands, SimhashMaxBucket)

  /** The generic banded hamming-neighbor join over any (doc_id, sig)
    * 64-bit signature table — the machinery behind
    * [[simhashHammingPairs]] and `Multimodal.mediaNearDup`: explode
    * each signature into `bands` disjoint band keys (pigeonhole:
    * hamming ≤ bands−1 guarantees an exact band agreement), equi-join
    * on (band index, band key, salt) with the decorrelated salted
    * bucket cap, then keep pairs passing the exact
    * `bit_count(a XOR b) ≤ maxHamming` filter. Shuffles carry
    * (band idx, band key, salt, doc_id, 8-byte sig) — never payloads. */
  private[ops] def bandedHammingPairs(sigs: DataFrame, maxHamming: Int,
      bands: Int, cap: Int): DataFrame = {
    require(64 % bands == 0, s"bands must divide 64: $bands")
    val width = 64 / bands
    val mask = (1L << width) - 1
    val banded = sigs.select(col("doc_id"), col("sig"),
        explode(array((0 until bands).map { b =>
          struct(lit(b).as("bi"),
            shiftrightunsigned(col("sig"), b * width).bitwiseAND(lit(mask)).as("bk"))
        }: _*)).as("band"))
      .select(col("doc_id"), col("sig"),
        col("band.bi").as("bi"), col("band.bk").as("bk"))
    val bw = org.apache.spark.sql.expressions.Window.partitionBy(col("bi"), col("bk"))
    val bucketed = banded
      .withColumn("nsplits",
        greatest(lit(1L),
          ceil(count(lit(1)).over(bw).cast("double") / cap).cast("long")))
      // band-decorrelated salt, as in minhash/lshTopK: fold (bi, bk) in
      .select(col("bi"), col("bk"), col("doc_id"), col("sig"),
        pmod(xxhash64(lit("salt"), col("bi"), col("bk"), col("doc_id")), col("nsplits"))
          .as("salt"))
    bucketed.as("a")
      .join(bucketed.as("b"),
        col("a.bi") === col("b.bi") && col("a.bk") === col("b.bk")
          && col("a.salt") === col("b.salt") && col("a.doc_id") < col("b.doc_id"))
      .select(col("a.doc_id").as("doc_a"), col("b.doc_id").as("doc_b"),
        expr("bit_count(a.sig ^ b.sig)").cast("long").as("hamming"))
      .filter(col("hamming") <= maxHamming)
      .distinct()
      .orderBy(col("doc_a"), col("doc_b"))
  }

  /** Exact repeated-span detection — the third dedup tier, complementing
    * whole-document Jaccard (this file) and the sampled winnow sketch
    * (`TextAnalysis.winnowOverlap`): training pipelines also run an
    * EXACT repeated-substring pass (Lee et al. 2022, "Deduplicating
    * Training Data Makes Language Models Better"), because a verbatim
    * paragraph shared by two otherwise-different documents sails under
    * both whole-doc similarity and a sampled sketch's floor.
    *
    * Suffix-array machinery is replaced by the Spark-native equivalent:
    * positional k-token grams (composed 8-byte hashes, same arithmetic
    * as [[shingles]] but position-keyed and NON-distinct) equi-joined
    * across documents, then maximal runs reassembled per (pair,
    * diagonal) — a shared span of L ≥ k tokens appears as L−k+1
    * consecutive gram positions on one diagonal (pos_a − pos_b
    * constant), so an islands window (pos_a − row_number) recovers the
    * maximal span exactly. Output: one row per maximal shared span —
    * (doc_a, doc_b, a_start, b_start, span_tokens), 1-based token
    * offsets.
    *
    * Scale posture: the gram join shuffles (8-byte gram hash, doc_id,
    * pos) — never text — and [[SpanDfCap]] drops grams occurring more
    * than that many times corpus-wide BEFORE the self-join (a viral
    * boilerplate k-gram with c occurrences would otherwise contribute
    * c² join rows; the cap is part of the operator's declared semantics
    * and the DuckDB oracle applies the identical rule, so the output
    * stays exact, not just plausible). The islands window partitions by
    * (pair, diagonal) — match-set-sized, never corpus-sized.
    * Hash-composition exactness argument is [[shingles]]'s: collisions
    * p ≈ d²/2⁶⁵, and the string-built oracle hash-verifies at test
    * scale. */
  /** Session cache of the maximal-span table, keyed (app, corpus, k,
    * dfCap): three registered consumers (`substring_dedup`,
    * `substring_dup_coverage`, `split_substring_leakage`) and the sf1
    * soak all start from the same positional-gram join — one build per
    * corpus serves all (the signature-cache lifecycle). */
  private val spanCache =
    new java.util.concurrent.ConcurrentHashMap[(String, String, Int, Int), DataFrame]()

  def substringSpans(spark: SparkSession, sfDir: String, k: Int = 16,
      dfCap: Int = SpanDfCap): DataFrame =
    spanCache.computeIfAbsent(
      (spark.sparkContext.applicationId, sfDir, k, dfCap),
      _ => substringSpansDirect(spark, sfDir, k, dfCap)
        .persist(org.apache.spark.storage.StorageLevel.MEMORY_AND_DISK))

  private def substringSpansDirect(spark: SparkSession, sfDir: String, k: Int,
      dfCap: Int): DataFrame = {
    val base = docs(spark, sfDir)
      .select(col("doc_id"),
        expr("transform(split(lower(trim(text)), '\\\\s+'), w -> xxhash64(w))").as("th"))
      .filter(size(col("th")) >= k)
    val comp = (0 until k).map(j => s"element_at(th, CAST(i + $j AS INT))").mkString(", ")
    val grams = base.select(col("doc_id"),
        explode(expr(
          s"transform(sequence(1, size(th) - ${k - 1}), i -> struct(CAST(i AS BIGINT) AS pos, xxhash64($comp) AS gh))"))
          .as("g"))
      .select(col("doc_id"), col("g.pos").as("pos"), col("g.gh").as("gh"))
    // hot-gram cap applied before the self-join; the count window and
    // the join shuffle share the gh partitioning (ReuseExchange)
    val gw = org.apache.spark.sql.expressions.Window.partitionBy(col("gh"))
    val capped = grams
      .withColumn("cnt", count(lit(1)).over(gw))
      .filter(col("cnt") <= dfCap)
      .select(col("doc_id"), col("pos"), col("gh"))
    val a = capped.select(col("gh"), col("doc_id").as("doc_a"), col("pos").as("pos_a"))
    val b = capped.select(col("gh"), col("doc_id").as("doc_b"), col("pos").as("pos_b"))
    val matches = a.join(b, "gh")
      .filter(col("doc_a") < col("doc_b"))
      .select(col("doc_a"), col("doc_b"), col("pos_a"), col("pos_b"),
        (col("pos_a") - col("pos_b")).as("diag"))
    val iw = org.apache.spark.sql.expressions.Window
      .partitionBy(col("doc_a"), col("doc_b"), col("diag")).orderBy(col("pos_a"))
    matches
      .withColumn("grp", col("pos_a") - row_number().over(iw))
      .groupBy(col("doc_a"), col("doc_b"), col("diag"), col("grp"))
      .agg(min(col("pos_a")).as("a_start"), min(col("pos_b")).as("b_start"),
        (max(col("pos_a")) - min(col("pos_a")) + k).as("span_tokens"))
      .select(col("doc_a"), col("doc_b"), col("a_start"), col("b_start"),
        col("span_tokens"))
      .orderBy(col("doc_a"), col("doc_b"), col("a_start"), col("b_start"))
  }

  /** Corpus-wide occurrence cap for one k-gram in [[substringSpans]] —
    * grams hotter than this (site-chrome boilerplate at web scale) are
    * excluded from span building BY DEFINITION, bounding the self-join
    * at O(grams · cap) instead of O(hottest²). Part of the declared
    * semantics: the oracle applies the same rule. */
  val SpanDfCap = 256

  /** The consumer of [[substringSpans]] — the DROP decision of exact
    * substring dedup (Lee et al. remove the later copy of every
    * repeated span): per document, how many of its tokens are covered
    * by spans it shares with LOWER-id documents (the first occurrence
    * keeps; every span table row already has doc_a < doc_b, so the
    * doc_b side pays). Overlapping/adjacent spans are merged into
    * maximal intervals first — two overlapping 20-token spans cover at
    * most their union, not 40 tokens — via the classic running-max
    * islands window (half-open [s, e) arithmetic). Output: (doc_id,
    * dup_islands, dup_tokens, n_tok, dup_frac) for every document that
    * has any covered span. Window partitions are per-document interval
    * sets — span-table-sized, never corpus-sized; fully
    * oracle-checkable (the span CTE extended with the same two
    * windows). */
  def substringDupCoverage(spark: SparkSession, sfDir: String, k: Int = 16,
      dfCap: Int = SpanDfCap): DataFrame = {
    val iv = substringSpans(spark, sfDir, k, dfCap)
      .select(col("doc_b").as("doc_id"), col("b_start").as("s"),
        (col("b_start") + col("span_tokens")).as("e"))
    val ow = org.apache.spark.sql.expressions.Window
      .partitionBy(col("doc_id")).orderBy(col("s"), col("e"))
    val islands = iv
      .withColumn("prev_max", max(col("e")).over(ow.rowsBetween(Long.MinValue, -1)))
      .withColumn("new_island",
        when(col("prev_max").isNull || col("s") > col("prev_max"), 1L).otherwise(0L))
      .withColumn("island", sum(col("new_island")).over(ow.rowsBetween(Long.MinValue, 0)))
      .groupBy(col("doc_id"), col("island"))
      .agg(min(col("s")).as("is"), max(col("e")).as("ie"))
    val toks = docs(spark, sfDir).select(col("doc_id"),
      size(split(trim(col("text")), "\\s+")).cast("long").as("n_tok"))
    islands.groupBy(col("doc_id"))
      .agg(count(lit(1)).as("dup_islands"), sum(col("ie") - col("is")).as("dup_tokens"))
      .join(toks, "doc_id")
      .select(col("doc_id"), col("dup_islands"), col("dup_tokens"), col("n_tok"),
        round(col("dup_tokens").cast("double") / col("n_tok"), 6).as("dup_frac"))
      .orderBy(col("doc_id"))
  }

  /** Embedding-cosine near-dup pairs (brute force, double math). The
    * dot/norm fold is `aggregate(zip_with(...))` — sequential, codegen'd,
    * no UDF. Blocked by `label` (the embeddings table's natural cluster
    * key) for the same O(pairs) reason as `blockedJaccard`; the unblocked
    * scale path is `Similarity.lshCandidates`. */
  def embeddingNearDup(spark: SparkSession, sfDir: String, threshold: Double = 0.45): DataFrame = {
    val e = spark.read.parquet(s"$sfDir/embeddings.parquet")
      .select(col("vec_id"), col("label"),
        transform(col("embedding"), x => x.cast("double")).as("v"))
    // the label blocking bounds the pair count at Σ|block|², so the
    // honest cardinality guard is on the LARGEST block — a corpus whose
    // biggest label cluster exceeds the exact-tier ceiling needs the
    // LSH/IVF path regardless of its total size. Cached per (app,
    // corpus) like Similarity's corpusCount: this is a registered query
    // the bench times twice, and an eager aggregate job per call would
    // put the guard itself on the benchmarked surface (review finding)
    // null labels never survive the equi-join (and null embeddings never
    // produce a pair), so the guard counts only rows that can actually
    // generate work — a corpus dominated by unlabeled vectors must not
    // be refused for its null block (ADVICE r13)
    val maxBlock = maxBlockCache.computeIfAbsent(
      (spark.sparkContext.applicationId, sfDir),
      _ => java.lang.Long.valueOf(e
        .filter(col("label").isNotNull && col("v").isNotNull)
        .groupBy(col("label")).count()
        .agg(org.apache.spark.sql.functions.max(col("count"))).collect()
        .headOption.flatMap(r => Option(r.get(0)).map(_.asInstanceOf[Long]))
        .getOrElse(0L))).longValue()
    Similarity.requireExactTier(maxBlock, "embeddingNearDup (largest label block)")
    val a = e.select(col("label"), col("vec_id").as("vec_a"), col("v").as("va"))
    val b = e.select(col("label"), col("vec_id").as("vec_b"), col("v").as("vb"))
    a.join(b, Seq("label"))
      .filter(col("vec_a") < col("vec_b"))
      // native fused dot/norm/cosine kernel (graft.functions) — one
      // codegen'd loop per pair, index-order accumulation = oracle math
      .withColumn("cosine",
        round(graft.functions.VectorFunctions.cosine_sim(col("va"), col("vb")), 4))
      .filter(col("cosine") >= threshold)
      .select(col("vec_a"), col("vec_b"), col("cosine"))
      .orderBy(col("vec_a"), col("vec_b"))
  }

  /** Typo-tolerant key matching: EXACT Hamming-≤-`maxDist` pairs over a
    * fixed-width normalized key (lowercased first `width` chars, padded
    * to `width`) — the entity-resolution primitive for title/URL-style
    * keys where corruption is positional (OCR noise, case flips, single
    * typos). Complements the shingle tiers: Jaccard/minhash are
    * shift-invariant but blind to which positions differ; this tier is
    * positional and exact. Shift-tolerant matching stays the shingle
    * tiers' job — that division of labor is what keeps BOTH exact.
    *
    * Exactness by pigeonhole: the key is cut into `maxDist + 1` equal
    * chunks; ≤ `maxDist` substitutions cannot touch every chunk, so any
    * qualifying pair shares at least one (chunk_idx, chunk_value) — an
    * EQUI-join, never a similarity join. No frequency cap and no salt:
    * recall is 1 by construction, and a hot chunk value (a shared
    * template prefix) is ordinary equi-join skew, which is AQE's job
    * (the skew-split behavior is pinned in OpsSpec), not a reason to
    * drop candidates. Shuffle carries (8-byte chunk hash? no — the
    * chunk string itself, ≤ width/(maxDist+1) chars) + id + the padded
    * key for the verify step; the verify is one codegen'd zip_with fold
    * per candidate, and candidates per doc are bounded by its chunks'
    * bucket sizes.
    *
    * DuckDB's char-based `hamming()` (padded keys are equal-length by
    * construction) re-derives dist on the oracle side — fully
    * hash-checked. */
  def fuzzyKeyPairs(spark: SparkSession, sfDir: String, width: Int = 24,
      maxDist: Int = 2): DataFrame = {
    require(width % (maxDist + 1) == 0, "width must split into equal chunks")
    val cw = width / (maxDist + 1)
    val keys = docs(spark, sfDir)
      .filter(length(trim(coalesce(col("text"), lit("")))) > 0)
      .select(col("doc_id"),
        rpad(lower(substring(col("text"), 1, width)), width, "\u0001").as("key"))
    val chunked = keys.select(col("doc_id"), col("key"),
      explode(expr(s"transform(sequence(0, $maxDist), i -> " +
        s"struct(i AS idx, substring(key, i * $cw + 1, $cw) AS chunk))")).as("c"))
      .select(col("doc_id"), col("key"), col("c.idx"), col("c.chunk"))
    val a = chunked.select(col("idx"), col("chunk"),
      col("doc_id").as("doc_a"), col("key").as("key_a"))
    val b = chunked.select(col("idx"), col("chunk"),
      col("doc_id").as("doc_b"), col("key").as("key_b"))
    a.join(b, Seq("idx", "chunk"))
      .filter(col("doc_a") < col("doc_b"))
      .select(col("doc_a"), col("doc_b"), col("key_a"), col("key_b"))
      .distinct() // a pair may share several chunks
      .withColumn("dist",
        expr("aggregate(zip_with(split(key_a, ''), split(key_b, ''), " +
          "(x, y) -> IF(x = y, 0, 1)), 0, (acc, d) -> acc + d)"))
      .filter(col("dist") <= maxDist)
      .select(col("doc_a"), col("doc_b"), col("dist"))
      .orderBy(col("doc_a"), col("doc_b"))
  }

  /** Sorted-neighborhood dedup candidates (Hernández–Stolfo): sort the
    * corpus ONCE by a normalized key and compare only records within a
    * fixed window of the sort order — the third blocking family beside
    * hash blocking (`blockedJaccard`) and LSH banding
    * (`minhashCandidates`): O(n·w) candidates at any corpus size, and
    * the method of choice when near-duplicates share PREFIXES (titles,
    * URLs, names) rather than token sets.
    *
    * Scale shape: the global sort rank reuses the deciles machinery —
    * range repartition + `zipWithIndex` on ONE RDD instance (never a
    * single-task unpartitioned window); windowed pairs form by a
    * two-bucket banded EQUI-join on `rank DIV w` (a pair ≤ w apart
    * shares at least one bucket by construction — same pigeonhole as
    * the attribution time-banding), deduped on the pair. The verify
    * tier is `levenshtein` on the fixed 40-char keys, identical in both
    * engines on this ASCII-normalized input.
    *
    * Exactness: the sort key (key, doc_id) is a total order, so the
    * global rank — and with it the emitted pair set — is deterministic
    * at any partitioning; the oracle replays it with a plain
    * row_number. */
  def sortedNeighborhoodPairs(spark: SparkSession, sfDir: String,
      window: Int = 4, maxLev: Int = 10): DataFrame = {
    import spark.implicits._
    val nPart = spark.conf.get("spark.sql.shuffle.partitions").toInt
    val keyed = spark.read.parquet(s"$sfDir/documents.parquet")
      .filter(col("text").isNotNull && length(trim(col("text"))) > 0)
      .select(col("doc_id"),
        substring(regexp_replace(lower(trim(col("text"))), "\\s+", " "), 1, 40).as("key"))
    val rdd = keyed
      .repartitionByRange(nPart, col("key").asc, col("doc_id").asc)
      .sortWithinPartitions(col("key").asc, col("doc_id").asc)
      .as[(Long, String)].rdd
    val ranked = rdd.zipWithIndex()
      .map { case ((id, key), i) => (id, key, i + 1) }
      .toDF("doc_id", "key", "rnk")
    // Pin the banded self-join's distribution by bucket at the session's
    // shuffle parallelism (round 19, guide §2.4/§2.5): the join's shuffle
    // is tiny in BYTES (~0.4 MB at bench SF) but compute-amplified — every
    // surviving pair pays a 40×40 levenshtein — so AQE's byte-blind
    // coalescing folded it to ONE task (profiled 1.5 s single-task on a
    // 32-core session, the query's dominant stage). An explicit
    // numPartitions repartition is exempt from AQE coalescing, and both
    // self-join sides inherit it, so the join itself stays exchange-free.
    // Buckets are rank-derived and dense, so hash(bucket) spreads evenly;
    // pair SEMANTICS are partition-independent (equi-join + distinct).
    val reg = ranked.withColumn("bucket",
      explode(array(expr(s"rnk DIV $window"), expr(s"rnk DIV $window + 1"))))
      .repartition(nPart, col("bucket"))
    reg.as("a")
      .join(reg.as("b"),
        col("a.bucket") === col("b.bucket") &&
          col("b.rnk") > col("a.rnk") &&
          col("b.rnk") - col("a.rnk") <= window)
      .select(col("a.doc_id").as("doc_a"), col("b.doc_id").as("doc_b"),
        (col("b.rnk") - col("a.rnk")).as("rank_gap"),
        levenshtein(col("a.key"), col("b.key")).cast("long").as("key_lev"))
      .distinct() // a pair ≤ w apart can share both banded buckets
      .filter(col("key_lev") <= maxLev)
      .orderBy(col("doc_a"), col("doc_b"))
  }

  /** WEIGHTED sparse-similarity join — the TF-IDF cosine tier the
    * unweighted set tiers (Jaccard, minhash, winnow) can't rank with:
    * terms are token TRIGRAMS, each document's weight vector is
    * length-normalized tf · ln(N/df), and the pair score is the true
    * cosine over the df-capped vocabulary. The df cap (default 50) is
    * the operator's SEMANTIC, not an approximation dodge: a trigram in
    * >cap documents is boilerplate that carries no identity signal,
    * and capping it bounds the postings join at C(cap,2) pairs per
    * term — the only thing standing between a sparse self-join and a
    * hot-term quadratic blowup at 100 TB (same df-cap move as
    * `winnow_overlap`). Trigram construction is window `lead`, not a
    * higher-order lambda (the `phrase_search` lesson: interpreted
    * per-element lambdas are the slow path).
    *
    * Float discipline: weights stay O(1) by length normalization so
    * every cross-engine product is 12dp-rounded into DECIMAL sums
    * (order-free, ulp-absorbing); norms and the final divide are then
    * single deterministic IEEE ops, and the cosine rounds to 6dp
    * before the threshold compare. */
  /** Session cache of the per-document trigram tf frame: the operator
    * consumes it FOUR times (df counts, weights for norms, and both
    * sides of the postings self-join), and without persistence each
    * use replays the corpus-scale posexplode + window lineage — the
    * measured bulk of the exact weighted tier's cost. The frame is
    * vocabulary×doc-sized (ids + 8-char grams + two ints), far smaller
    * than the exploded token stream it collapses. */
  private val trigramTfCache =
    new java.util.concurrent.ConcurrentHashMap[(String, String), DataFrame]()

  /** Round-15: the frame builds with the fused [[graft.functions
    * .TrigramTf]] codegen kernel — tokenize, trigram, and per-doc tf
    * count in one pass per row, explode-only after — deleting the
    * corpus-scale posexplode + per-doc `lead` window exchange + (doc,
    * gram) groupBy the old lineage paid (the suite's slowest query;
    * the PhrasePositions precedent). OpsSpec pins kernel ≡ legacy
    * lineage row-for-row; the tfidf_cosine_pairs oracle hash is
    * unchanged. */
  private def trigramTf(spark: SparkSession, sfDir: String): DataFrame =
    trigramTfCache.computeIfAbsent((spark.sparkContext.applicationId, sfDir), _ => {
      val base = spark.read.parquet(s"$sfDir/documents.parquet")
        .select(col("doc_id"), graft.functions.ScaleFunctions.trigram_tf(
          lower(trim(coalesce(col("text"), lit(""))))).as("k"))
        .select(col("doc_id"), col("k.dl").as("dl"), explode(col("k.grams")).as("gt"))
        .select(col("doc_id"), col("dl"), col("gt.g").as("g"), col("gt.tf").as("tf"))
        // Persist HASH-PARTITIONED BY GRAM at the session's shuffle
        // parallelism (round 19, guide §2.4/§2.5): the frame's expensive
        // consumers are all g-keyed — the corpus-stat window below and
        // BOTH sides of the postings self-join — so the cached
        // partitioning is reused and those operators run exchange-free
        // at full parallelism. Without this the cache inherited the
        // file scan's split count (ONE partition at bench SF — a 5 MB
        // corpus is one split), and because the cached scan has no
        // Exchange, AQE could never re-split it: the C(df,2)
        // pair-expansion stage, the tier's measured bulk, ran as a
        // single task on a 32-core session (profiled 5.0 s of the
        // query's 7.6 s warm pass). Grams are high-cardinality, so
        // hash(g) spreads evenly; the df ≤ cap bound already caps any
        // one gram's expansion at C(cap,2).
        .repartition(spark.sessionState.conf.numShufflePartitions, col("g"))
      // Fold the corpus statistics INTO the cached frame (round 19,
      // guide §2.2 — shuffle/scan less): df by an exchange-free window
      // over the g-partitioned frame, n_docs by a 1-row broadcast. The
      // old shape recomputed wgt = tf ⋈ df ⋈ n PER CONSUMER — profiled
      // as 8 separate cache scans + 2 joins per query pass; with the
      // stats resident, weighting is a pure map and the query reads
      // the cache exactly 3× (norms + both join sides). df is stored
      // UNCAPPED so the per-query dfCap filter semantics (and the
      // bit-exact wgt doubles) are unchanged.
      augmentTfStats(base)
        .persist(org.apache.spark.storage.StorageLevel.MEMORY_AND_DISK)
    })

  /** Attach per-gram document frequency and the corpus document count to
    * a (doc_id, dl, g, tf) frame — shared by the session cache above and
    * the legacy-lineage path (BenchTfidf) so both run the same plan. */
  private[graft] def augmentTfStats(base: DataFrame): DataFrame = {
    val nDocs = base.select(col("doc_id")).distinct()
      .agg(count(lit(1)).as("n_docs"))
    base
      .withColumn("df", count(lit(1)).over(
        org.apache.spark.sql.expressions.Window.partitionBy(col("g"))))
      .crossJoin(broadcast(nDocs))
  }

  def tfidfCosinePairs(spark: SparkSession, sfDir: String,
      dfCap: Int = 50, minCos: Double = 0.5): DataFrame =
    tfidfCosinePairsFrom(trigramTf(spark, sfDir), dfCap, minCos)

  /** The weighting + postings-join stage over an arbitrary (doc_id, dl,
    * g, tf) frame — split out so the round-16 kernel-vs-legacy bench
    * (`graft.BenchTfidf`, test scope) can time the SAME downstream plan
    * over both tf lineages. */
  private[graft] def tfidfCosinePairsFrom(tf0: DataFrame,
      dfCap: Int = 50, minCos: Double = 0.5): DataFrame = {
    // accept both the stats-resident session-cached frame and a bare
    // (doc_id, dl, g, tf) lineage (BenchTfidf's legacy tier)
    val tf = if (tf0.columns.contains("df")) tf0 else augmentTfStats(tf0)
    // df = N terms carry zero information (idf = 0): they contribute
    // nothing to dot or norms, and a document made ENTIRELY of them
    // would have a zero norm — the 0/0 cosine the null-text sweep
    // caught. Excluding them by the integer predicate (df < N) keeps
    // every surviving pair's cosine bit-identical and removes the
    // degenerate division in both engines.
    val wgt = tf
      .filter(col("df") <= dfCap && col("df") < col("n_docs"))
      .select(col("doc_id"), col("g"),
        (col("tf").cast("double") / col("dl").cast("double") *
          log(col("n_docs").cast("double") / col("df").cast("double"))).as("wgt"))
    val norms = wgt.groupBy(col("doc_id"))
      .agg(sum(round(col("wgt") * col("wgt"), 12).cast("decimal(30,12)"))
        .as("norm2"))
      .select(col("doc_id"), sqrt(col("norm2").cast("double")).as("nrm"))
    val dots = wgt.as("a").join(wgt.as("b"),
        col("a.g") === col("b.g") && col("a.doc_id") < col("b.doc_id"))
      .groupBy(col("a.doc_id").as("doc_a"), col("b.doc_id").as("doc_b"))
      .agg(sum(round(col("a.wgt") * col("b.wgt"), 12).cast("decimal(30,12)"))
        .as("dot"))
    dots
      .join(norms.select(col("doc_id").as("doc_a"), col("nrm").as("na")), "doc_a")
      .join(norms.select(col("doc_id").as("doc_b"), col("nrm").as("nb")), "doc_b")
      .select(col("doc_a"), col("doc_b"),
        round(col("dot").cast("double") / (col("na") * col("nb")), 6).as("cos"))
      .filter(col("cos") >= minCos)
      .orderBy(col("doc_a"), col("doc_b"))
  }
}
