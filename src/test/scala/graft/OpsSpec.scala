package graft

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.execution.streaming.runtime.MemoryStream
import org.apache.spark.sql.functions._
import org.scalatest.BeforeAndAfterAll
import org.scalatest.funsuite.AnyFunSuite

import graft.ops.{Multimodal, NearDup, Relational, Similarity, TextAnalysis}
import graft.streaming.EventIngest

/** Operator-level Spark tests over the sf0.001 testdata (small, fast) —
  * near-dup, similarity, multimodal plumbing, as-of join, and the
  * streaming ingest path.
  */
class OpsSpec extends AnyFunSuite with BeforeAndAfterAll {

  private val sfDir = "/root/testdata/sf0.001"
  private lazy val spark: SparkSession = SparkSession.builder()
    .master("local[4]")
    .config("spark.sql.shuffle.partitions", "4")
    .config("spark.ui.enabled", "false")
    .config("spark.sql.session.timeZone", "UTC")
    .getOrCreate()

  override def afterAll(): Unit = spark.stop()

  test("bench JSON string escaping survives quotes, backslashes, and control chars") {
    // ADVICE carryover (round 13 #7): a corpus path with a quote or
    // backslash must produce a VALID artifact line
    assert(graft.Bench.jstr("plain") == "\"plain\"")
    assert(graft.Bench.jstr("""a"b\c""") == """"a\"b\\c"""")
    assert(graft.Bench.jstr("t\tn\n") == "\"t\\u0009n\\u000a\"")
    // round-trips through a real JSON parser (the driver's view) —
    // Jackson rides Spark's classpath
    val tricky = "/tmp/we\"ird\\dir"
    val line = s"""{"sf":${graft.Bench.jstr(tricky)}}"""
    val node = new com.fasterxml.jackson.databind.ObjectMapper().readTree(line)
    assert(node.get("sf").asText() == tricky, s"round-trip: $line")
  }

  test("blockedJaccard pairs are symmetric-free, thresholded, and block-local") {
    val rows = NearDup.blockedJaccard(spark, sfDir, 0.9).collect()
    rows.foreach { r =>
      assert(r.getLong(0) < r.getLong(1), "doc_a < doc_b canonical order")
      assert(r.getDouble(2) >= 0.9)
    }
  }

  test("minhash LSH candidates cover the exact blocked-jaccard pairs (recall)") {
    val exact = NearDup.blockedJaccard(spark, sfDir, 0.95)
      .select("doc_a", "doc_b").collect().map(r => (r.getLong(0), r.getLong(1))).toSet
    val approx = NearDup.minhashCandidates(spark, sfDir, 0.95)
      .select("doc_a", "doc_b").collect().map(r => (r.getLong(0), r.getLong(1))).toSet
    if (exact.nonEmpty) {
      val recall = exact.intersect(approx).size.toDouble / exact.size
      assert(recall >= 0.8, s"LSH recall $recall over ${exact.size} exact pairs")
    }
  }

  test("bigram minhash covers the exact bigram pairs (phrase-level scale path)") {
    val exact = NearDup.blockedJaccard(spark, sfDir, 0.9, ngram = 2)
      .select("doc_a", "doc_b").collect().map(r => (r.getLong(0), r.getLong(1))).toSet
    val approx = NearDup.minhashCandidates(spark, sfDir, 0.9, ngram = 2)
      .select("doc_a", "doc_b").collect().map(r => (r.getLong(0), r.getLong(1))).toSet
    if (exact.nonEmpty) {
      val recall = exact.intersect(approx).size.toDouble / exact.size
      assert(recall >= 0.8, s"bigram LSH recall $recall over ${exact.size} exact pairs")
    }
  }

  test("simhash signatures are deterministic and 64-bit") {
    val a = NearDup.simhash(spark, sfDir).collect()
    val b = NearDup.simhash(spark, sfDir).collect()
    assert(a.length == b.length && a.length > 0)
    a.zip(b).foreach { case (x, y) =>
      assert(x.getLong(1) == y.getLong(1), "signature must be stable")
      assert(x.getLong(2) == (x.getLong(1) >>> 48), "band key = high 16 bits")
    }
  }

  test("simhash hamming pairs == the full hamming<=3 pair set (pigeonhole guarantee)") {
    // The gate for this operator is the MECHANISM, not corpus fit
    // (SimHash is the long-doc tool; short-doc corpus fit is minhash's
    // recall-gated job — see the simhashHammingPairs scaladoc):
    //  - completeness: hamming <= bands-1 = 3 forces exact equality in
    //    >= 1 of the 4 disjoint 16-bit bands (pigeonhole), so absent a
    //    salt-split every such pair MUST be emitted;
    //  - soundness: the bit_count(xor) filter keeps nothing beyond the
    //    radius.
    // At this scale no band bucket approaches the 512 salt cap, so the
    // emitted set must EQUAL the brute-force hamming<=3 set exactly.
    val sigs = NearDup.simhash(spark, sfDir)
      .select("doc_id", "simhash").collect()
      .map(r => r.getLong(0) -> r.getLong(1)).sortBy(_._1)
    val brute = (for {
      i <- sigs.indices.iterator
      j <- (i + 1) until sigs.length
      if java.lang.Long.bitCount(sigs(i)._2 ^ sigs(j)._2) <= 3
    } yield (sigs(i)._1, sigs(j)._1)).toSet
    val pairs = NearDup.simhashHammingPairs(spark, sfDir).collect()
    pairs.foreach { r =>
      assert(r.getLong(0) < r.getLong(1), "doc_a < doc_b canonical order")
      assert(r.getLong(2) <= 3, "hamming bounded by the radius (soundness)")
    }
    val emitted = pairs.map(r => (r.getLong(0), r.getLong(1))).toSet
    assert(emitted == brute,
      s"banded join must recover the hamming<=3 set exactly: " +
        s"missed ${(brute -- emitted).take(5)}, extra ${(emitted -- brute).take(5)}")
    info(s"${emitted.size} hamming<=3 pairs over ${sigs.length} docs recovered exactly")
  }

  test("cosineTopK is exact: each neighbor list is sorted and self-free") {
    val rows = Similarity.cosineTopK(spark, sfDir, k = 3).collect()
    val byVec = rows.groupBy(_.getLong(0))
    byVec.foreach { case (vid, ns) =>
      val sims = ns.sortBy(_.getLong(1)).map(_.getDouble(3))
      assert(sims.length <= 3)
      assert(sims.sameElements(sims.sortBy(-(_: Double))), s"vec $vid not sorted")
      ns.foreach(r => assert(r.getLong(2) != vid, "no self-neighbor"))
    }
  }

  test("LSH top-k similarities match the exact ranking where candidates overlap") {
    val exact = Similarity.cosineTopK(spark, sfDir, k = 1).collect()
      .map(r => r.getLong(0) -> (r.getLong(2), r.getDouble(3))).toMap
    val approx = Similarity.lshTopK(spark, sfDir, k = 1, bucketLength = 2.0).collect()
      .map(r => r.getLong(0) -> (r.getLong(2), r.getDouble(3))).toMap
    // wide buckets admit most of each projection's range, so misses come
    // only from bucket recall (pairs never co-hashed in any of the 4
    // tables); reported sims are exact (rerank), so where the top-1
    // candidate was found the similarity must match brute force
    val agree = exact.keys.count(k => approx.get(k).exists(_._1 == exact(k)._1))
    assert(agree >= (exact.size * 0.75).toInt, s"$agree/${exact.size} top-1 agreement")
  }

  test("IVF top-k agrees with exact search when every cell is probed") {
    // nprobe == nlist ⇒ no cells are skipped ⇒ must equal brute force
    val exact = Similarity.cosineTopK(spark, sfDir, k = 3).collect()
      .map(r => (r.getLong(0), r.getLong(1)) -> r.getLong(2)).toMap
    val ivf = Similarity.ivfTopK(spark, sfDir, k = 3, nlist = 4, nprobe = 4).collect()
      .map(r => (r.getLong(0), r.getLong(1)) -> r.getLong(2)).toMap
    assert(ivf == exact, "full-probe IVF must reproduce the exact ranking")
    // partial probe keeps self-cell recall reasonable
    val partial = Similarity.ivfTopK(spark, sfDir, k = 3, nlist = 4, nprobe = 2).collect()
      .map(r => (r.getLong(0), r.getLong(1)) -> r.getLong(2)).toMap
    val agree = exact.keys.count(kk => partial.get(kk).contains(exact(kk)))
    assert(agree >= (exact.size * 0.5).toInt, s"partial-probe agreement $agree/${exact.size}")
  }

  test("IVF index persists across sessions and rebuilds when the corpus changes") {
    // round-14 index store: fit once → parquet (centroids +
    // cell-partitioned inverted lists); a fresh cache must LOAD the
    // identical quantizer; a regenerated corpus must force a refit
    import spark.implicits._
    val dir = java.nio.file.Files.createTempDirectory("graft-ivf-store").toString
    def writeCorpus(seedShift: Long): Unit = {
      (0L until 300L).map { id =>
        val r = new java.util.Random(id * 31L + 7L + seedShift)
        (id, Array.fill(16)(r.nextGaussian().toFloat), (id % 5).toInt)
      }.toDF("vec_id", "embedding", "label")
        .write.mode("overwrite").parquet(s"$dir/embeddings.parquet")
    }
    writeCorpus(0L)
    def topk() = Similarity.ivfTopK(spark, dir, k = 3).collect()
      .map(r => (r.getLong(0), r.getLong(1), r.getLong(2), r.getDouble(3))).toSeq
    val fitted = topk()
    val marker = new java.io.File(Similarity.indexDir(dir, 0), "_SUCCESS")
    assert(marker.isFile, "index persisted at first fit")
    val builtAt = marker.lastModified
    // new cache generation → the LOAD path; results must be identical
    Similarity.clearCaches()
    val loaded = topk()
    assert(loaded == fitted, "loaded index must reproduce the fitted ranking")
    assert(marker.lastModified == builtAt, "second session loaded, not refit")
    // regenerated corpus → stale marker → refit (and a DIFFERENT
    // ranking, proving the old index was not silently served)
    Thread.sleep(1100) // dir mtime granularity
    writeCorpus(777L)
    Similarity.clearCaches()
    val refit = topk()
    assert(marker.lastModified > builtAt, "stale index must rebuild")
    assert(refit != fitted, "rebuilt index reflects the new corpus")
  }

  test("IVF index append: new vectors join the inverted lists without a refit") {
    import spark.implicits._
    val dir = java.nio.file.Files.createTempDirectory("graft-ivf-append").toString
    def rows(ids: Range, shift: Long) = ids.map { i =>
      val r = new java.util.Random(i * 31L + 7L + shift)
      (i.toLong, Array.fill(16)(r.nextGaussian().toFloat), (i % 5))
    }.toDF("vec_id", "embedding", "label")
    rows(0 until 300, 0L).write.mode("overwrite").parquet(s"$dir/embeddings.parquet")
    Similarity.ivfTopK(spark, dir, k = 3).collect() // builds + persists
    val centsBefore = spark.read.parquet(s"${Similarity.indexDir(dir, 0)}/centroids")
      .collect().map(r => r.getInt(0) -> r.getSeq[Double](1).toSeq).toMap
    val assignedBefore = spark.read.parquet(Similarity.cellsPath(Similarity.indexDir(dir, 0)))
      .select("vec_id", "cell").collect().map(r => r.getLong(0) -> r.getInt(1)).toMap

    // the store grows; append assigns ONLY the new ids, no refit
    rows(300 until 360, 99L).write.mode("append").parquet(s"$dir/embeddings.parquet")
    val added = Similarity.ivfIndexAppend(spark, dir)
    assert(added == 60L, s"added $added")
    assert(Similarity.ivfIndexAppend(spark, dir) == 0L, "idempotent re-append")

    val cellsDir = Similarity.cellsPath(Similarity.indexDir(dir, 0))
    val after = spark.read.parquet(cellsDir)
      .select("vec_id", "cell").collect().map(r => r.getLong(0) -> r.getInt(1)).toMap
    assert(after.size == 360, s"${after.size} indexed")
    // centroids untouched (no refit), existing assignments untouched
    val centsAfter = spark.read.parquet(s"${Similarity.indexDir(dir, 0)}/centroids")
      .collect().map(r => r.getInt(0) -> r.getSeq[Double](1).toSeq).toMap
    assert(centsAfter == centsBefore, "append must not refit centroids")
    assignedBefore.foreach { case (id, c) =>
      assert(after(id) == c, s"existing assignment moved for $id") }
    // each appended vector sits in its argmin-L2 cell (exact contract)
    val newVecs = rows(300 until 360, 99L).collect()
      .map(r => r.getLong(0) -> r.getSeq[Float](1).map(_.toDouble).toArray).toMap
    val cents = centsBefore.toSeq.sortBy(_._1).map(_._2.toArray)
    newVecs.foreach { case (id, v) =>
      val best = cents.zipWithIndex.minBy { case (c, _) =>
        var s = 0.0; var j = 0
        while (j < c.length) { val d = v(j) - c(j); s += d * d; j += 1 }
        (s, 0) }._2
      assert(after(id) == best, s"appended $id assigned ${after(id)}, argmin $best")
    }
    // and the query surface serves the grown corpus: appended ids appear
    // as queries with exact-reranked neighbors
    val topk = Similarity.ivfTopK(spark, dir, k = 3).collect()
      .map(_.getLong(0)).toSet
    assert((300L until 360L).forall(topk.contains), "appended ids queryable")
  }

  test("searchVector: full-probe equals brute force; default probes recall the top-5; self at rank 1") {
    // the online serving shape — single query vector against the
    // persisted index, partition-pruned cell reads, exact rerank
    val vecs = spark.read.parquet(s"$sfDir/embeddings.parquet")
      .filter(col("embedding").isNotNull)
      .select(col("vec_id"), col("embedding")).collect()
      .map(r => r.getLong(0) -> r.getSeq[Float](1).map(_.toDouble).toArray).toMap
    def cos(a: Array[Double], b: Array[Double]): Double = {
      var dot = 0.0; var na = 0.0; var nb = 0.0; var i = 0
      val n = math.min(a.length, b.length)
      while (i < n) { dot += a(i) * b(i); na += a(i) * a(i); nb += b(i) * b(i); i += 1 }
      val d = math.sqrt(na) * math.sqrt(nb); if (d == 0.0) 0.0 else dot / d
    }
    def brute(q: Array[Double], k: Int): Seq[Long] =
      vecs.toSeq.map { case (id, v) => (id, cos(q, v)) }
        .sortBy { case (id, s) => (-s, id) }.take(k).map(_._1)
    // in-corpus query, every cell probed: must equal brute force
    // exactly (including itself at rank 1, sim 1.0 — external-query
    // semantics have no self to exclude)
    val q0 = vecs(0L)
    val full = Similarity.searchVector(spark, sfDir, q0, k = 5, nprobe = 10000)
      .collect().map(r => (r.getLong(0), r.getLong(1), r.getDouble(2)))
    assert(full.map(_._2).toSeq == brute(q0, 5), "full probe == brute force")
    assert(full.head == ((1L, 0L, 1.0)), s"self at rank 1: ${full.head}")
    // default probe schedule: k rows, descending sims, strong overlap
    val part = Similarity.searchVector(spark, sfDir, q0).collect()
      .map(r => (r.getLong(0), r.getLong(1), r.getDouble(2)))
    assert(part.length == 5, s"k rows: ${part.length}")
    assert(part.map(_._3).sameElements(part.map(_._3).sorted(Ordering[Double].reverse)))
    assert(part.map(_._2).toSet.intersect(brute(q0, 5).toSet).size >= 4,
      s"default probes recall >= 4/5: ${part.map(_._2).toSeq} vs ${brute(q0, 5)}")
    // an OUT-of-corpus query vector (perturbed q0) still serves k rows
    val qx = q0.map(x => x * 0.9 + 0.01)
    val ext = Similarity.searchVector(spark, sfDir, qx).collect()
    assert(ext.length == 5, "external query serves k rows")
    // filtered serving: the pool predicate composes — the adaptive
    // schedule probes every cell at this selectivity, so the result
    // must equal brute force restricted to the pool, all in-pool
    val poolLabels = spark.read.parquet(s"$sfDir/embeddings.parquet")
      .filter(col("label") === 3).select(col("vec_id")).collect()
      .map(_.getLong(0)).toSet
    val filt = Similarity.searchVector(spark, sfDir, q0,
        poolPred = Some(col("label") === 3)).collect()
      .map(r => (r.getLong(0), r.getLong(1), r.getDouble(2)))
    assert(filt.length == 5 && filt.forall(r => poolLabels.contains(r._2)),
      s"filtered serving returns k in-pool rows: $filt")
    val bruteF = vecs.toSeq.filter(kv => poolLabels.contains(kv._1))
      .map { case (id, v) => (id, cos(q0, v)) }
      .sortBy { case (id, s) => (-s, id) }.take(5).map(_._1)
    assert(filt.map(_._2).toSeq == bruteF,
      s"filtered serving == brute force over the pool: ${filt.map(_._2).toSeq} vs $bruteF")
    // round 17: the SECOND stats-backed column — a lang predicate
    // (attached from documents at build time) serves the same way
    val poolLang = spark.read.parquet(s"$sfDir/documents.parquet")
      .filter(col("lang") === "en").select(col("doc_id")).collect()
      .map(_.getLong(0)).toSet
    val filtL = Similarity.searchVector(spark, sfDir, q0,
        poolPred = Some(col("lang") === "en")).collect()
      .map(r => (r.getLong(0), r.getLong(1), r.getDouble(2)))
    assert(filtL.length == 5 && filtL.forall(r => poolLang.contains(r._2)),
      s"lang-filtered serving returns k in-pool rows: ${filtL.toSeq}")
    val bruteL = vecs.toSeq.filter(kv => poolLang.contains(kv._1))
      .map { case (id, v) => (id, cos(q0, v)) }
      .sortBy { case (id, s) => (-s, id) }.take(5).map(_._1)
    assert(filtL.map(_._2).toSeq == bruteL,
      s"lang-filtered == brute force over the pool: ${filtL.map(_._2).toSeq} vs $bruteL")
  }

  test("PQ codes persist in the index store: fit and load are bit-identical, appends re-derive") {
    import spark.implicits._
    val dir = java.nio.file.Files.createTempDirectory("graft-pq-store").toString
    def rows(ids: Range, shift: Long) = ids.map { i =>
      val r = new java.util.Random(i * 31L + 7L + shift)
      (i.toLong, Array.fill(16)(r.nextGaussian().toFloat), (i % 5))
    }.toDF("vec_id", "embedding", "label")
    rows(0 until 300, 0L).write.mode("overwrite").parquet(s"$dir/embeddings.parquet")
    def pq() = Similarity.ivfPqTopK(spark, dir, k = 3).collect()
      .map(r => (r.getLong(0), r.getLong(1), r.getLong(2), r.getDouble(3))).toSeq
    val fitted = pq()
    val pqMarker = new java.io.File(s"${Similarity.indexDir(dir, 0)}/pq", "_SUCCESS")
    assert(pqMarker.isFile, "pq codes persisted at first use")
    val builtAt = pqMarker.lastModified
    // fresh cache generation: the LOAD path must reproduce the ranking
    // without re-encoding (marker untouched)
    Similarity.clearCaches()
    assert(pq() == fitted, "loaded pq codes must reproduce the fitted ranking")
    assert(pqMarker.lastModified == builtAt, "second session loaded, not re-encoded")
    // a grown store invalidates the codes by the mirror rule: the
    // appended ids must appear both as queries and with fresh codes
    Thread.sleep(1100)
    rows(300 until 360, 99L).write.mode("append").parquet(s"$dir/embeddings.parquet")
    assert(Similarity.ivfIndexAppend(spark, dir) == 60L)
    val grown = pq()
    assert(pqMarker.lastModified > builtAt, "grown corpus must re-derive the codes")
    assert(grown.map(_._1).toSet.intersect((300L until 360L).toSet).size == 60,
      "appended ids queryable through the pq tier")
  }

  test("compactIvfIndex folds append-grown cell directories; content and queries unchanged") {
    import spark.implicits._
    val dir = java.nio.file.Files.createTempDirectory("graft-ivf-compact").toString
    def rows(ids: Range, shift: Long) = ids.map { i =>
      val r = new java.util.Random(i * 31L + 7L + shift)
      (i.toLong, Array.fill(16)(r.nextGaussian().toFloat), (i % 5))
    }.toDF("vec_id", "embedding", "label")
    rows(0 until 300, 0L).write.mode("overwrite").parquet(s"$dir/embeddings.parquet")
    Similarity.ivfTopK(spark, dir, k = 3).collect() // build + persist
    // three append batches → three file sets per touched cell
    (0 until 3).foreach { b =>
      rows(300 + 40 * b until 340 + 40 * b, 99L + b)
        .write.mode("append").parquet(s"$dir/embeddings.parquet")
      assert(Similarity.ivfIndexAppend(spark, dir) == 40L)
    }
    def cellsDir = Similarity.cellsPath(Similarity.indexDir(dir, 0))
    def parquetFiles(): Long = java.nio.file.Files.walk(java.nio.file.Paths.get(cellsDir))
      .filter(p => p.toString.endsWith(".parquet")).count()
    def content() = spark.read.parquet(cellsDir)
      .select(col("vec_id"), col("cell").cast("int")).collect()
      .map(r => r.getLong(0) -> r.getInt(1)).toMap
    def topk() = Similarity.ivfTopK(spark, dir, k = 3).collect()
      .map(r => (r.getLong(0), r.getLong(1), r.getLong(2), r.getDouble(3))).toSeq
    val filesBefore = parquetFiles()
    val contentBefore = content()
    val topkBefore = topk()
    val marker = new java.io.File(Similarity.indexDir(dir, 0), "_SUCCESS")
    val markerAt = marker.lastModified
    Similarity.compactIvfIndex(spark, dir)
    assert(parquetFiles() < filesBefore,
      s"compaction must reduce file count: $filesBefore -> ${parquetFiles()}")
    assert(content() == contentBefore, "compaction must preserve every assignment")
    assert(topk() == topkBefore, "queries identical over the compacted store")
    assert(marker.lastModified == markerAt,
      "compaction must not touch the freshness marker")
    assert(Similarity.appendedCount(Similarity.indexDir(dir, 0)) == 120L,
      "compaction must not reset the drift meta")
  }

  test("compaction swap is generation-pointed: a concurrent reader never observes a missing store") {
    import spark.implicits._
    val dir = java.nio.file.Files.createTempDirectory("graft-ivf-genswap").toString
    val rows = (0 until 300).map { i =>
      val r = new java.util.Random(i * 31L + 7L)
      (i.toLong, Array.fill(16)(r.nextGaussian().toFloat), (i % 5))
    }.toDF("vec_id", "embedding", "label")
    rows.write.mode("overwrite").parquet(s"$dir/embeddings.parquet")
    Similarity.ivfTopK(spark, dir, k = 3).collect() // build + persist
    val idxDir = Similarity.indexDir(dir, 0)
    val n = spark.read.parquet(Similarity.cellsPath(idxDir)).count()
    // the round-15 two-move swap had a window where the cells path did
    // not exist; the generation pointer must keep the resolved store
    // continuously readable through repeated compactions
    val stop = new java.util.concurrent.atomic.AtomicBoolean(false)
    val failures = new java.util.concurrent.ConcurrentLinkedQueue[String]()
    val reader = new Thread(() => {
      while (!stop.get()) {
        try {
          val c = spark.read.parquet(Similarity.cellsPath(idxDir)).count()
          if (c != n) failures.add(s"read $c rows, expected $n")
        } catch { case e: Throwable => failures.add(e.toString) }
      }
    })
    reader.start()
    try (0 until 3).foreach(_ => Similarity.compactIvfIndex(spark, dir))
    finally { stop.set(true); reader.join(60000) }
    assert(failures.isEmpty, s"concurrent reads failed: $failures")
    // retention: live generation plus exactly the superseded one
    val gens = new java.io.File(idxDir).listFiles().map(_.getName)
      .filter(nm => nm == "cells" || (nm.startsWith("cells.g") && !nm.endsWith(".tmp")))
    assert(gens.length == 2, s"retention keeps live + superseded: ${gens.toSeq}")
    assert(Similarity.cellsPath(idxDir).endsWith("cells.g3"), "pointer advanced per fold")
    assert(spark.read.parquet(Similarity.cellsPath(idxDir)).count() == n, "content preserved")
  }

  test("ivfIndexDelete: tombstoned vectors never serve; compaction folds them; appends cannot resurrect") {
    import spark.implicits._
    val dir = java.nio.file.Files.createTempDirectory("graft-ivf-delete").toString
    def rows(ids: Range, shift: Long) = ids.map { i =>
      val r = new java.util.Random(i * 31L + 7L + shift)
      (i.toLong, Array.fill(16)(r.nextGaussian().toFloat), (i % 5))
    }.toDF("vec_id", "embedding", "label")
    rows(0 until 300, 0L).write.mode("overwrite").parquet(s"$dir/embeddings.parquet")
    def topk() = Similarity.ivfTopK(spark, dir, k = 3).collect()
      .map(r => (r.getLong(0), r.getLong(1), r.getLong(2), r.getDouble(3))).toSeq
    topk() // build + persist the index
    val idxDir = Similarity.indexDir(dir, 0)
    val victims = Seq(0L, 1L, 2L)
    assert(Similarity.ivfIndexDelete(spark, dir, victims) == 3L, "three newly tombstoned")
    assert(Similarity.ivfIndexDelete(spark, dir, victims) == 0L, "delete is idempotent")
    assert(Similarity.ivfIndexDelete(spark, dir, Seq(999999L)) == 0L,
      "an id that was never indexed does not count")
    // neither query nor neighbor role serves a deleted vector
    val served = topk()
    assert(served.forall(r => !victims.contains(r._1) && !victims.contains(r._3)),
      "deleted ids must not appear on either side of the batch top-k")
    assert(served.groupBy(_._1).size == 297, "every surviving vector still queries")
    // the serving path excludes them too — and still fills k
    val q5 = spark.read.parquet(s"$dir/embeddings.parquet")
      .filter(col("vec_id") === 5L).collect().head
      .getSeq[Float](1).map(_.toDouble).toArray
    val sv = Similarity.searchVector(spark, dir, q5, k = 5).collect()
      .map(r => (r.getLong(0), r.getLong(1)))
    assert(sv.length == 5 && sv.forall(r => !victims.contains(r._2)),
      s"single-query serving excludes tombstoned ids: ${sv.toSeq}")
    // the LSH path honors the same takedown registry (round 16): a
    // takedown applied to the default generation must not serve
    // through lshTopK in either role
    val lshServed = Similarity.lshTopK(spark, dir, k = 3).collect()
      .map(r => (r.getLong(0), r.getLong(2)))
    assert(lshServed.forall(r => !victims.contains(r._1) && !victims.contains(r._2)),
      "deleted ids must not appear on either side of the LSH top-k")
    // rows stay PHYSICAL until compaction, then fold out; results and
    // the tombstone set itself must survive the fold
    def physicalVictims(): Long = spark.read.parquet(Similarity.cellsPath(idxDir))
      .filter(col("vec_id").isin(0L, 1L, 2L)).count()
    assert(physicalVictims() == 3L, "tombstoned rows stay physical before compaction")
    Similarity.compactIvfIndex(spark, dir)
    assert(physicalVictims() == 0L, "compaction folds tombstoned rows out")
    assert(topk() == served, "queries identical across the tombstone fold")
    assert(Similarity.tombstoneCount(spark, idxDir) == 3L,
      "the tombstone set survives compaction")
    // the corpus still holds the victims' vectors — an append must not
    // bring them back
    assert(Similarity.ivfIndexAppend(spark, dir) == 0L, "append cannot resurrect")
    assert(topk() == served, "post-append results unchanged")
    // a real append still works, and the victims stay excluded
    rows(300 until 340, 99L).write.mode("append").parquet(s"$dir/embeddings.parquet")
    assert(Similarity.ivfIndexAppend(spark, dir) == 40L, "genuine growth still appends")
    val grown = topk()
    assert(grown.map(_._1).toSet.intersect((300L until 340L).toSet).size == 40,
      "appended ids queryable")
    assert(grown.forall(r => !victims.contains(r._1) && !victims.contains(r._3)),
      "victims stay deleted through growth")
    // ensure's tombstone-pressure policy: delete enough to cross the
    // physical-dead ceiling and the ensure step compacts on its own
    val bulk = (10L until 110L).toSeq
    assert(Similarity.ivfIndexDelete(spark, dir, bulk) == 100L)
    assert(spark.read.parquet(Similarity.cellsPath(idxDir))
      .filter(col("vec_id").isin(bulk.map(x => x: Any): _*)).count() == 100L,
      "bulk tombstones physical before the ensure step")
    Similarity.ensureIvfIndex(spark, dir)
    assert(spark.read.parquet(Similarity.cellsPath(idxDir))
      .filter(col("vec_id").isin(bulk.map(x => x: Any): _*)).count() == 0L,
      "ensureIvfIndex compacts past the dead-row ceiling")
    assert(new java.io.File(idxDir, "_SUCCESS").isFile, "marker intact")
    // an AUTOMATIC drift rebuild must carry deletions into the new
    // generation — the refit swaps the whole store dir away, and a
    // maintenance policy acting on its own must not undo takedowns
    Similarity.ensureIvfIndex(spark, dir, maxBalanceRatio = 0.5)
    assert(Similarity.tombstoneCount(spark, idxDir) == 103L,
      "auto-rebuild preserves the tombstone set")
    val rebuilt = topk()
    assert(rebuilt.forall(r => !victims.contains(r._1) && !victims.contains(r._3)),
      "victims stay deleted through the auto-rebuild")
    assert(rebuilt.forall(r => !bulk.contains(r._1) && !bulk.contains(r._3)),
      "bulk deletions stay deleted through the auto-rebuild")
  }

  test("ivfIndexDelete binds corpus ids awaiting an append: an in-flight ingest cannot resurrect a takedown") {
    import spark.implicits._
    val dir = java.nio.file.Files.createTempDirectory("graft-ivf-pending-del").toString
    def rows(ids: Range, shift: Long) = ids.map { i =>
      val r = new java.util.Random(i * 31L + 7L + shift)
      (i.toLong, Array.fill(16)(r.nextGaussian().toFloat), (i % 5))
    }.toDF("vec_id", "embedding", "label")
    rows(0 until 300, 0L).write.mode("overwrite").parquet(s"$dir/embeddings.parquet")
    Similarity.ivfTopK(spark, dir, k = 3).collect() // build + persist
    // the corpus grows but the index append has NOT run yet — the
    // takedown arrives mid-ingest and must still record a tombstone
    // (ADVICE r16: binding only physically-indexed ids let the next
    // append index and serve the taken-down vector)
    rows(300 until 340, 99L).write.mode("append").parquet(s"$dir/embeddings.parquet")
    assert(Similarity.ivfIndexDelete(spark, dir, Seq(300L)) == 1L,
      "a takedown on a corpus-present, not-yet-indexed id records a tombstone")
    assert(Similarity.ivfIndexDelete(spark, dir, Seq(999999L)) == 0L,
      "a never-seen id still does not count")
    assert(Similarity.ivfIndexAppend(spark, dir) == 39L,
      "the append skips the taken-down id")
    val served = Similarity.ivfTopK(spark, dir, k = 3).collect()
      .flatMap(r => Seq(r.getLong(0), r.getLong(2))).toSet
    assert(!served.contains(300L), "the taken-down id never serves")
    assert((301L until 340L).forall(served.contains), "the rest of the batch serves")
  }

  test("lshIndexAppend: incremental growth matches a full rebuild; no-op and ghost guards hold") {
    import spark.implicits._
    val dir = java.nio.file.Files.createTempDirectory("graft-lsh-append").toString
    def rows(ids: Range, shift: Long) = ids.map { i =>
      val r = new java.util.Random(i * 31L + 7L + shift)
      (i.toLong, Array.fill(16)(r.nextGaussian().toFloat), (i % 5))
    }.toDF("vec_id", "embedding", "label")
    rows(0 until 300, 0L).write.mode("overwrite").parquet(s"$dir/embeddings.parquet")
    def topk() = Similarity.lshTopK(spark, dir, k = 3).collect()
      .map(r => (r.getLong(0), r.getLong(1), r.getLong(2), r.getDouble(3))).toSeq
    topk() // build + persist the bucket store
    val idxDir = Similarity.lshIndexDir(dir, 8, 2.0)
    assert(new java.io.File(idxDir, "_SUCCESS").isFile, "bucket store persisted")
    // unchanged corpus: a no-op that keeps the marker fresh
    assert(Similarity.lshIndexAppend(spark, dir) == 0L, "no-op on unchanged corpus")
    // grow the corpus; the append buckets ONLY the new vectors
    rows(300 until 340, 99L).write.mode("append").parquet(s"$dir/embeddings.parquet")
    assert(Similarity.lshIndexAppend(spark, dir) == 40L, "40 vectors bucketed")
    val appended = topk()
    assert(appended.map(_._1).toSet.intersect((300L until 340L).toSet).size == 40,
      "appended ids queryable through LSH")
    // append-vs-rebuild bit-identity at this geometry (g identical on
    // both sides of the growth, every bucket under the salt cap): a
    // from-scratch rebuild over the grown corpus serves the same top-k
    Similarity.clearCaches()
    val del = new scala.reflect.io.Directory(new java.io.File(idxDir))
    del.deleteRecursively()
    val rebuilt = topk()
    assert(appended == rebuilt, "append-vs-rebuild top-k identical")
    // ghost guard: a shrunk corpus refuses the append loudly
    rows(0 until 100, 0L).write.mode("overwrite").parquet(s"$dir/embeddings.parquet")
    Similarity.clearCaches()
    val ex = intercept[IllegalArgumentException](Similarity.lshIndexAppend(spark, dir))
    assert(ex.getMessage.contains("rewritten or shrank"))
  }

  test("LSH content sidecar: covers appended vectors, exempts takedown-replace, folds at compaction") {
    import spark.implicits._
    val dir = java.nio.file.Files.createTempDirectory("graft-lsh-sidecar").toString
    def mixed(n: Int, shiftFor: Int => Long) = (0 until n).map { i =>
      val r = new java.util.Random(i * 31L + 7L + shiftFor(i))
      (i.toLong, Array.fill(16)(r.nextGaussian().toFloat), (i % 5))
    }.toDF("vec_id", "embedding", "label")
    def baseShift(i: Int): Long = if (i >= 300) 99L else 0L
    mixed(300, baseShift).write.mode("overwrite").parquet(s"$dir/embeddings.parquet")
    Similarity.lshTopK(spark, dir, k = 3).collect() // build store + sidecar
    val idxDir = Similarity.lshIndexDir(dir, 8, 2.0)
    mixed(340, baseShift).write.mode("overwrite").parquet(s"$dir/embeddings.parquet")
    Similarity.clearCaches()
    assert(Similarity.lshIndexAppend(spark, dir) == 40L)
    // ADVICE r17 (medium): the sidecar rows must be MATERIALIZED before
    // the buckets write — a lazily re-evaluated anti-join would see the
    // appended ids as indexed and leave them out of the sidecar
    assert(spark.read.parquet(s"$idxDir/vhashes").count() == 340L,
      "sidecar must cover the appended vectors")
    // ...which is what makes a later rewrite of an APPENDED vector
    // refusable at all
    mixed(340, i => if (i == 320) 555L else baseShift(i))
      .write.mode("overwrite").parquet(s"$dir/embeddings.parquet")
    Similarity.clearCaches()
    val ex = intercept[IllegalArgumentException](Similarity.lshIndexAppend(spark, dir))
    assert(ex.getMessage.contains("changed content"), ex.getMessage)
    // ADVICE r17 (low): takedown-replace — tombstoning the rewritten
    // vector exempts its stale hash row; the append no longer refuses
    // (previously it refused FOREVER, vhashes surviving compaction)
    Similarity.ivfTopK(spark, dir, k = 3).collect() // registry's index generation
    Similarity.ivfIndexDelete(spark, dir, Seq(320L))
    Similarity.clearCaches()
    assert(Similarity.lshIndexAppend(spark, dir) == 0L,
      "takedown-replace must not refuse the append")
    // compaction folds the tombstoned id out of the sidecar too
    Similarity.compactLshIndex(spark, dir)
    val vh = spark.read.parquet(s"$idxDir/vhashes")
    assert(vh.filter(col("vec_id") === 320L).count() == 0L,
      "compaction must fold the tombstoned hash row")
    assert(vh.count() == 339L)
  }

  test("manifest fast path refuses a NEW file re-shipping an indexed id with changed content (round 19)") {
    import spark.implicits._
    val dir = java.nio.file.Files.createTempDirectory("graft-reship").toString
    def rows(ids: Range, shift: Long) = ids.map { i =>
      val r = new java.util.Random(i * 31L + 7L + shift)
      (i.toLong, Array.fill(16)(r.nextGaussian().toFloat), (i % 5))
    }.toDF("vec_id", "embedding", "label")
    rows(0 until 300, 0L).write.mode("overwrite").parquet(s"$dir/embeddings.parquet")
    Similarity.ivfTopK(spark, dir, k = 3).collect() // builds + persists
    // first append runs the slow-path guards and certifies the manifest
    rows(300 until 320, 1L).write.mode("append").parquet(s"$dir/embeddings.parquet")
    assert(Similarity.ivfIndexAppend(spark, dir) == 20L)
    // duplicate re-delivery of UNCHANGED bytes rides the fast path:
    // passes, and only the genuinely-new id is appended
    rows(7 until 8, 0L).union(rows(320 until 321, 2L))
      .write.mode("append").parquet(s"$dir/embeddings.parquet")
    assert(Similarity.ivfIndexAppend(spark, dir) == 1L,
      "identical re-delivery must pass and add only the new id")
    val cellsDir = Similarity.cellsPath(Similarity.indexDir(dir, 0))
    val cellsBefore = spark.read.parquet(cellsDir)
      .select("vec_id", "cell").collect().map(r => (r.getLong(0), r.getInt(1))).sorted.toSeq
    // a NEW file re-shipping id 5 with CHANGED content + one new id: old
    // files all intact, so the manifest fast path engages — and the
    // round-19 increment guard must refuse what the slow path would have
    rows(5 until 6, 12345L).union(rows(321 until 322, 3L))
      .write.mode("append").parquet(s"$dir/embeddings.parquet")
    val e = intercept[IllegalArgumentException](Similarity.ivfIndexAppend(spark, dir))
    assert(e.getMessage.contains("re-shipped"), e.getMessage)
    // the refusal happened before any write: the store is unchanged
    Similarity.clearCaches()
    val cellsAfter = spark.read.parquet(cellsDir)
      .select("vec_id", "cell").collect().map(r => (r.getLong(0), r.getInt(1))).sorted.toSeq
    assert(cellsAfter == cellsBefore, "refused append must leave the store untouched")
  }

  test("LSH manifest fast path refuses a re-shipped changed id (round 19)") {
    import spark.implicits._
    val dir = java.nio.file.Files.createTempDirectory("graft-lsh-reship").toString
    def rows(ids: Range, shift: Long) = ids.map { i =>
      val r = new java.util.Random(i * 31L + 7L + shift)
      (i.toLong, Array.fill(16)(r.nextGaussian().toFloat), (i % 5))
    }.toDF("vec_id", "embedding", "label")
    rows(0 until 300, 0L).write.mode("overwrite").parquet(s"$dir/embeddings.parquet")
    Similarity.lshTopK(spark, dir, k = 3).collect() // build store + sidecar
    // first append: slow path, certifies the manifest
    rows(300 until 310, 1L).write.mode("append").parquet(s"$dir/embeddings.parquet")
    assert(Similarity.lshIndexAppend(spark, dir) == 10L)
    // NEW file re-shipping id 9 with changed content, old files intact →
    // fast path engages, increment guard must refuse via the sidecar
    rows(9 until 10, 777L).union(rows(310 until 311, 2L))
      .write.mode("append").parquet(s"$dir/embeddings.parquet")
    Similarity.clearCaches()
    val e = intercept[IllegalArgumentException](Similarity.lshIndexAppend(spark, dir))
    assert(e.getMessage.contains("re-shipped"), e.getMessage)
  }

  test("streaming vector ingest: landed batches grow the corpus and index; replay cannot double-ingest") {
    import spark.implicits._
    val dir = java.nio.file.Files.createTempDirectory("graft-vecingest").toString
    def rows(ids: Range, shift: Long) = ids.map { i =>
      val r = new java.util.Random(i * 31L + 7L + shift)
      (i.toLong, Array.fill(16)(r.nextGaussian().toFloat), (i % 5))
    }.toDF("vec_id", "embedding", "label")
    rows(0 until 300, 0L).write.mode("overwrite").parquet(s"$dir/embeddings.parquet")
    Similarity.ivfTopK(spark, dir, k = 3).collect() // ingest-time index build
    val idxDir = Similarity.indexDir(dir, 0)
    val centsBefore = spark.read.parquet(s"$idxDir/centroids")
      .collect().map(r => r.getInt(0) -> r.getSeq[Double](1).toSeq).toMap
    // two encoder-fleet files land; maxFilesPerTrigger=1 makes each its
    // own micro-batch — the production one-file-one-batch cadence
    val landing = s"$dir/landing"
    rows(300 until 340, 99L).coalesce(1).write.mode("append").parquet(landing)
    rows(340 until 380, 99L).coalesce(1).write.mode("append").parquet(landing)
    val gained = EventIngest.vectorIngestAvailableNow(spark, landing, dir)
    assert(gained == 80L, s"index gained $gained of 80 landed vectors")
    val corpusN = spark.read.parquet(s"$dir/embeddings.parquet").count()
    val indexedN = spark.read.parquet(Similarity.cellsPath(idxDir)).count()
    assert(corpusN == 380L && indexedN == 380L, s"corpus $corpusN, indexed $indexedN")
    // per-batch append under FIXED centroids — no refit happened
    val centsAfter = spark.read.parquet(s"$idxDir/centroids")
      .collect().map(r => r.getInt(0) -> r.getSeq[Double](1).toSeq).toMap
    assert(centsAfter == centsBefore, "streaming ingest must not refit centroids")
    // the grown index serves the landed ids
    val topk = Similarity.ivfTopK(spark, dir, k = 3).collect().map(_.getLong(0)).toSet
    assert((300L until 380L).forall(topk.contains), "landed ids queryable")
    // a full replay of the same landing dir (fresh checkpoint = every
    // batch replays) must be a no-op on both legs: stamps guard the
    // corpus, the anti-join guards the index
    val replayGained = EventIngest.vectorIngestAvailableNow(spark, landing, dir)
    assert(replayGained == 0L, s"replay gained $replayGained")
    assert(spark.read.parquet(s"$dir/embeddings.parquet").count() == 380L,
      "replayed batches must not double-ingest the corpus")
    assert(spark.read.parquet(Similarity.cellsPath(idxDir)).count() == 380L,
      "replayed batches must not double-index")
    // batch renumbering must not alias stamps: retention removes one
    // landed file, a NEW file lands, and a fresh run (fresh checkpoint
    // → batch numbering restarts at 0) must still ingest the new file
    // — a batchId-keyed stamp silently dropped it (round-15 review)
    val landed = new java.io.File(landing).listFiles()
      .filter(_.getName.endsWith(".parquet"))
    assert(landed.length >= 2, "fixture expects two landed files")
    landed.head.delete()
    rows(380 until 420, 99L).coalesce(1).write.mode("append").parquet(landing)
    val lateGained = EventIngest.vectorIngestAvailableNow(spark, landing, dir)
    assert(lateGained == 40L,
      s"the newly landed file must ingest despite batch renumbering: $lateGained")
    assert(spark.read.parquet(s"$dir/embeddings.parquet").count() == 420L,
      "corpus holds exactly the union of landed files")
    assert(spark.read.parquet(Similarity.cellsPath(idxDir)).count() == 420L, "index follows")
    // basename collisions across landing dirs must not drop data
    // (ADVICE r16: a basename-keyed stamp silently skipped the second
    // dir's file): two dirs each land a file literally named
    // batch.parquet and both must ingest
    def landFixed(landing: String, ids: Range): Unit = {
      val tmp = java.nio.file.Files.createTempDirectory("graft-land").toString
      rows(ids, 99L).coalesce(1).write.mode("overwrite").parquet(tmp)
      val part = new java.io.File(tmp).listFiles()
        .filter(_.getName.endsWith(".parquet")).head
      new java.io.File(landing).mkdirs()
      java.nio.file.Files.move(part.toPath,
        java.nio.file.Paths.get(landing, "batch.parquet"))
      ()
    }
    landFixed(s"$dir/landing2", 420 until 460)
    landFixed(s"$dir/landing3", 460 until 500)
    assert(EventIngest.vectorIngestAvailableNow(spark, s"$dir/landing2", dir) == 40L)
    assert(EventIngest.vectorIngestAvailableNow(spark, s"$dir/landing3", dir) == 40L,
      "a same-basename file from a second landing dir must still ingest")
    assert(spark.read.parquet(s"$dir/embeddings.parquet").count() == 500L,
      "both fixed-name files reached the corpus")
    // legacy-stamp era bounding (ADVICE r17). (a) the migration still
    // works: a file that landed BEFORE its legacy basename stamp was
    // written (the pre-upgrade sequence) is skipped and migrated...
    val stampDir = new java.io.File(s"$dir/_vec_ingest")
    val t0 = System.currentTimeMillis() - 3600_000L
    landFixed(s"$dir/landing4", 500 until 540)
    val f4 = new java.io.File(s"$dir/landing4/batch.parquet")
    assert(f4.setLastModified(t0 - 60_000L))
    val legacy = new java.io.File(stampDir,
      java.net.URLEncoder.encode("batch.parquet", "UTF-8"))
    legacy.createNewFile()
    assert(legacy.setLastModified(t0))
    assert(EventIngest.vectorIngestAvailableNow(spark, s"$dir/landing4", dir) == 0L,
      "a legacy-stamped pre-upgrade file must not re-ingest")
    assert(spark.read.parquet(s"$dir/embeddings.parquet").count() == 500L)
    // ...(b) but a POST-upgrade file (mtime after the newest legacy
    // stamp) whose basename merely collides must ingest — before the
    // bound it was stamped-and-skipped forever (silent data loss)
    landFixed(s"$dir/landing5", 500 until 540)
    assert(EventIngest.vectorIngestAvailableNow(spark, s"$dir/landing5", dir) == 40L,
      "a post-upgrade basename collision must not be skipped")
    assert(spark.read.parquet(s"$dir/embeddings.parquet").count() == 540L)
  }

  test("filtered serving reads pool cardinality from index metadata: no corpus job, stats maintained") {
    import spark.implicits._
    val dir = java.nio.file.Files.createTempDirectory("graft-label-stats").toString
    def rows(ids: Range, shift: Long) = ids.map { i =>
      val r = new java.util.Random(i * 31L + 7L + shift)
      (i.toLong, Array.fill(16)(r.nextGaussian().toFloat), (i % 5))
    }.toDF("vec_id", "embedding", "label")
    rows(0 until 300, 0L).write.mode("overwrite").parquet(s"$dir/embeddings.parquet")
    Similarity.ivfTopK(spark, dir, k = 3).collect() // build + persist (writes _label_stats)
    val idxDir = Similarity.indexDir(dir, 0)
    assert(new java.io.File(idxDir, "_label_stats").isFile, "stats committed with the store")
    def stats() = Similarity.indexLabelStats(spark, dir).collect()
      .map(r => r.getInt(0) -> r.getLong(1)).toMap
    assert(stats() == Map(0 -> 60L, 1 -> 60L, 2 -> 60L, 3 -> 60L, 4 -> 60L))
    // a label-only pool predicate serves WITHOUT any corpus-side scan:
    // selectivity comes from the stats file, the predicate applies
    // inside the pruned cell read (round-16 verdict ask #4)
    val q5 = spark.read.parquet(s"$dir/embeddings.parquet")
      .filter(col("vec_id") === 5L).collect().head
      .getSeq[Float](1).map(_.toDouble).toArray
    val filt = Similarity.searchVector(spark, dir, q5, poolPred = Some(col("label") === 3))
    val plan = filt.queryExecution.executedPlan.toString
    assert(!plan.contains("embeddings.parquet"),
      s"filtered serving must not scan the corpus:\n$plan")
    assert(plan.contains("PartitionFilters: [cell"), "pruned cell read survives")
    val got = filt.collect().map(r => (r.getLong(1), r.getDouble(2)))
    assert(got.length == 5 && got.forall(_._1 % 5 == 3), s"k in-pool rows: ${got.toSeq}")
    // delete maintains the live counts (victims are all label 0)
    assert(Similarity.ivfIndexDelete(spark, dir, Seq(0L, 5L, 10L)) == 3L)
    assert(stats() == Map(0 -> 57L, 1 -> 60L, 2 -> 60L, 3 -> 60L, 4 -> 60L),
      s"delete decrements the deleted labels: ${stats()}")
    // compaction leaves the live set (and so the stats) unchanged
    Similarity.compactIvfIndex(spark, dir)
    assert(stats() == Map(0 -> 57L, 1 -> 60L, 2 -> 60L, 3 -> 60L, 4 -> 60L))
    // append folds the increment's labels in (40 ids, 8 per label)
    rows(300 until 340, 99L).write.mode("append").parquet(s"$dir/embeddings.parquet")
    assert(Similarity.ivfIndexAppend(spark, dir) == 40L)
    assert(stats() == Map(0 -> 65L, 1 -> 68L, 2 -> 68L, 3 -> 68L, 4 -> 68L),
      s"append merges the new labels: ${stats()}")
    // the post-delete filtered search never serves a victim
    val f0 = Similarity.searchVector(spark, dir, q5, poolPred = Some(col("label") === 0))
      .collect().map(_.getLong(1))
    assert(f0.length == 5 && f0.forall(id => id % 5 == 0 && !Seq(0L, 5L, 10L).contains(id)),
      s"deleted label-0 ids never serve: ${f0.toSeq}")
  }

  test("searchVectorMmr: lambda=1 equals plain serving; diversity escapes a duplicate shell") {
    import spark.implicits._
    val dir = java.nio.file.Files.createTempDirectory("graft-mmr").toString
    // planted geometry: 12 near-copies of one direction (the duplicate
    // shell a plain top-k drowns in) + 48 spread documents
    val rnd = new java.util.Random(7L)
    val base = Array.fill(16)(rnd.nextGaussian())
    val rows = (0 until 60).map { i =>
      val v =
        if (i < 12) base.map(x => (x + 0.01 * rnd.nextGaussian()).toFloat)
        else Array.fill(16)(rnd.nextGaussian().toFloat)
      (i.toLong, v, i % 5)
    }.toDF("vec_id", "embedding", "label")
    rows.write.mode("overwrite").parquet(s"$dir/embeddings.parquet")
    val q = base
    val plain = Similarity.searchVector(spark, dir, q, k = 5).collect()
      .map(_.getLong(1)).toSeq
    assert(plain.forall(_ < 12L), s"fixture: plain top-5 is all shell: $plain")
    // lambda = 1: the redundancy term vanishes — exactly the plain ranking
    val mmr1 = Similarity.searchVectorMmr(spark, dir, q, k = 5, lambda = 1.0)
      .collect().map(_.getLong(1)).toSeq
    assert(mmr1 == plain, s"lambda=1 must equal plain serving: $mmr1 vs $plain")
    // lambda = 0.5: k filled, ranks 1..k, first pick is the top-1, the
    // selection draws from the fetched candidates, and at least one
    // pick ESCAPES the shell (the operator's purpose)
    val mmr = Similarity.searchVectorMmr(spark, dir, q, k = 5).collect()
      .map(r => (r.getLong(0), r.getLong(1)))
    assert(mmr.length == 5 && mmr.map(_._1).toSeq == (1L to 5L),
      s"k rows ranked 1..k: ${mmr.toSeq}")
    assert(mmr.head._2 == plain.head, "first MMR pick is always the top-1")
    val cand = Similarity.searchVector(spark, dir, q, k = 20).collect()
      .map(_.getLong(1)).toSet
    assert(mmr.map(_._2).forall(cand.contains), "picks come from the candidate fetch")
    assert(mmr.exists(_._2 >= 12L),
      s"diversity must escape the duplicate shell: ${mmr.map(_._2).toSeq}")
    // scores are monotone non-increasing in selection order
    val scores = Similarity.searchVectorMmr(spark, dir, q, k = 5).collect()
      .map(_.getDouble(3)).toSeq
    assert(scores == scores.sorted.reverse, s"greedy scores monotone: $scores")
    // a pool predicate composes: every pick is in-pool (round 16 — the
    // candidate fetch itself is filtered, not the picks after the fact)
    val mmrF = Similarity.searchVectorMmr(spark, dir, q, k = 3,
      poolPred = Some(col("label") === 2)).collect().map(_.getLong(1))
    assert(mmrF.nonEmpty && mmrF.forall(_ % 5 == 2),
      s"filtered MMR picks stay in-pool: ${mmrF.toSeq}")
  }

  test("batched serving is bit-identical to the per-query loop") {
    import org.apache.spark.sql.functions.transform
    val qs = spark.read.parquet(s"$sfDir/embeddings.parquet")
      .filter(col("vec_id") < 8L && col("embedding").isNotNull)
      .orderBy(col("vec_id"))
      .select(transform(col("embedding"), x => x.cast("double")).as("v"))
      .collect().map(_.getSeq[Double](0).toArray).toSeq
    assert(qs.length == 8)
    val batch = Similarity.searchVectors(spark, sfDir, qs, k = 5).collect()
      .map(r => (r.getLong(0), r.getLong(1), r.getLong(2), r.getDouble(3))).toSeq
    val looped = qs.zipWithIndex.flatMap { case (q, i) =>
      Similarity.searchVector(spark, sfDir, q, k = 5).collect()
        .map(r => (i.toLong, r.getLong(0), r.getLong(1), r.getDouble(2)))
    }
    assert(batch == looped, s"batch (${batch.take(3)}...) vs loop (${looped.take(3)}...)")
    // the pool predicate composes identically (stats-driven widening
    // shared across the batch)
    val batchF = Similarity.searchVectors(spark, sfDir, qs.take(3), k = 5,
        poolPred = Some(col("label") === 3)).collect()
      .map(r => (r.getLong(0), r.getLong(1), r.getLong(2), r.getDouble(3))).toSeq
    val loopedF = qs.take(3).zipWithIndex.flatMap { case (q, i) =>
      Similarity.searchVector(spark, sfDir, q, k = 5,
          poolPred = Some(col("label") === 3)).collect()
        .map(r => (i.toLong, r.getLong(0), r.getLong(1), r.getDouble(2)))
    }
    assert(batchF == loopedF)
    // empty batch serves an empty frame with the right schema
    val empty = Similarity.searchVectors(spark, sfDir, Seq.empty)
    assert(empty.columns.toSeq == Seq("query_id", "rank", "vec_id", "sim"))
    assert(empty.count() == 0L)
    // the driver-hashed verdict row agrees
    val gate = Similarity.servingBatchGate(spark, sfDir).collect()
    assert(gate.length == 1 && gate(0).getBoolean(1), "serving batch gate true")
  }

  test("online hybrid serving agrees with the corpus-wide hybrid_search on the same query") {
    // verdict r17 ask #5: the online verb (persisted-index serving,
    // IVF vector leg) and the corpus-wide analytic (exact cosine leg)
    // fuse by the same RRF rule over the same lexical ranking — pin
    // the shared parts exactly, and the vector legs up to the online
    // tier's self-hit offset
    import org.apache.spark.sql.functions.transform
    val qv = spark.read.parquet(s"$sfDir/embeddings.parquet")
      .filter(col("vec_id") === 0L && col("embedding").isNotNull)
      .select(transform(col("embedding"), x => x.cast("double")).as("v"))
      .collect()(0).getSeq[Double](0).toArray
    val terms = Seq("spark", "join", "query") // bm25Search's own query
    def rowsOf(df: org.apache.spark.sql.DataFrame, hasQid: Boolean) =
      df.collect().map { r =>
        val o = if (hasQid) 1 else 0
        (r.getLong(o), if (r.isNullAt(o + 1)) None else Some(r.getLong(o + 1)),
          if (r.isNullAt(o + 2)) None else Some(r.getLong(o + 2)), r.getDouble(o + 3))
      }.toSeq
    val online = rowsOf(
      Similarity.searchHybrid(spark, sfDir, terms, qv, k = 200, fetch = 50), false)
    val wide = rowsOf(Similarity.hybridSearch(spark, sfDir, k = 200), false)
    // the fusion rule itself: every row's rrf re-derives from its own
    // component ranks, in both tiers
    def rrfOk(rows: Seq[(Long, Option[Long], Option[Long], Double)]) =
      rows.forall { case (_, rl, rv, s) =>
        val expect = rl.map(r => 1.0 / (60 + r)).getOrElse(0.0) +
          rv.map(r => 1.0 / (60 + r)).getOrElse(0.0)
        math.abs(BigDecimal(expect).setScale(6,
          BigDecimal.RoundingMode.HALF_UP).toDouble - s) < 1e-9
      }
    assert(rrfOk(online) && rrfOk(wide), "rrf must re-derive from the rank columns")
    // identical lexical ranking: both legs are the same deterministic
    // BM25 top-50 over the same corpus
    def lexMap(rows: Seq[(Long, Option[Long], Option[Long], Double)]) =
      rows.flatMap { case (d, rl, _, _) => rl.map(d -> _) }.toMap
    assert(lexMap(online) == lexMap(wide), "lexical ranks must agree exactly")
    // vector legs: the online tier serves the query itself at rank 1
    // (the corpus-wide analytic excludes self-pairs), so shared docs
    // sit exactly one rank apart; require the overlap to be the
    // recall-gate class, not a handful
    def vecMap(rows: Seq[(Long, Option[Long], Option[Long], Double)]) =
      rows.flatMap { case (d, _, rv, _) => rv.map(d -> _) }.toMap
    val (vo, vw) = (vecMap(online), vecMap(wide))
    val shared = vo.keySet intersect vw.keySet
    assert(shared.size >= (vw.size * 9) / 10,
      s"vector-leg overlap ${shared.size}/${vw.size} below the recall class")
    // both tiers rank by exact cosine (the online tier reranks its
    // candidates exactly), so the shared docs must appear in the SAME
    // relative order — ranks can shift absolutely where one list holds
    // a doc the other missed (IVF probes) or the self-hit
    val sharedSeq = shared.toSeq
    assert(sharedSeq.sortBy(vo) == sharedSeq.sortBy(vw),
      "shared vector docs must keep their exact-cosine relative order")
    assert(vo.get(0L).contains(1L), "online vector leg self-hit at rank 1")
  }

  test("batched hybrid serving is bit-identical to the per-query loop") {
    import org.apache.spark.sql.functions.transform
    val qvs = spark.read.parquet(s"$sfDir/embeddings.parquet")
      .filter(col("vec_id") < 3L && col("embedding").isNotNull)
      .orderBy(col("vec_id"))
      .select(transform(col("embedding"), x => x.cast("double")).as("v"))
      .collect().map(_.getSeq[Double](0).toArray).toSeq
    assert(qvs.length == 3)
    val termSets = Seq(Seq("spark", "join", "query"),
      Seq("data", "table", "hash"), Seq("oovxyz", "filter")) // one lex-weak leg
    val reqs = qvs.zipWithIndex.map { case (v, i) => (termSets(i), v) }
    def key(r: org.apache.spark.sql.Row, off: Int) = (
      r.getLong(off), if (r.isNullAt(off + 1)) -1L else r.getLong(off + 1),
      if (r.isNullAt(off + 2)) -1L else r.getLong(off + 2), r.getDouble(off + 3))
    val batch = Similarity.searchHybridBatch(spark, sfDir, reqs).collect()
      .map(r => (r.getLong(0), key(r, 1))).toSeq
    val looped = reqs.zipWithIndex.flatMap { case ((ts, v), i) =>
      Similarity.searchHybrid(spark, sfDir, ts, v).collect()
        .map(r => (i.toLong, key(r, 0)))
    }
    assert(batch == looped, s"batch=${batch.take(4)}... loop=${looped.take(4)}...")
    val empty = Similarity.searchHybridBatch(spark, sfDir, Seq.empty)
    assert(empty.columns.toSeq == Seq("query_id", "doc_id", "r_lex", "r_vec", "rrf"))
    assert(empty.count() == 0L)
  }

  test("hybrid serving fuses the two index tiers by reciprocal rank") {
    import org.apache.spark.sql.functions.transform
    val qv = spark.read.parquet(s"$sfDir/embeddings.parquet")
      .filter(col("vec_id") === 0L && col("embedding").isNotNull)
      .select(transform(col("embedding"), x => x.cast("double")).as("v"))
      .collect()(0).getSeq[Double](0).toArray
    val terms = Seq("spark", "join", "query")
    val got = Similarity.searchHybrid(spark, sfDir, terms, qv, k = 10)
      .collect().map(r => (r.getLong(0),
        if (r.isNullAt(1)) None else Some(r.getLong(1)),
        if (r.isNullAt(2)) None else Some(r.getLong(2)),
        r.getDouble(3))).toSeq
    assert(got.nonEmpty && got.length <= 10)
    // expected fusion recomputed from the component verbs
    val lex = graft.ops.Lexical.searchText(spark, sfDir, terms, 50)
      .collect().map(_.getLong(0)).zipWithIndex
      .map { case (d, i) => d -> (i + 1L) }.toMap
    val vec = Similarity.searchVector(spark, sfDir, qv, k = 50)
      .collect().map(_.getLong(1)).zipWithIndex
      .map { case (d, i) => d -> (i + 1L) }.toMap
    def r6(x: Double) =
      BigDecimal(x).setScale(6, BigDecimal.RoundingMode.HALF_UP).toDouble
    val expected = (lex.keySet ++ vec.keySet).toSeq.map { d =>
      (d, lex.get(d), vec.get(d),
        r6(lex.get(d).map(r => 1.0 / (60 + r)).getOrElse(0.0) +
          vec.get(d).map(r => 1.0 / (60 + r)).getOrElse(0.0)))
    }.sortBy { case (d, _, _, s) => (-s, d) }.take(10)
    assert(got == expected, s"got=$got expected=$expected")
    // the rrf ordering is monotone non-increasing and the self doc
    // (vec 0, rank 1 on the vector side) is present
    assert(got.map(_._4) == got.map(_._4).sorted.reverse)
    assert(got.exists(_._1 == 0L), "vector self-hit fused in")
  }

  test("index lifecycle gates: all verdict rows ok on the test corpus") {
    val rows = Similarity.indexLifecycleGates(spark, sfDir).collect()
    assert(rows.map(_.getString(0)).toSeq ==
      Seq("append_cannot_resurrect", "compact_folds_tombstones",
        "compact_preserves_results", "deleted_never_served",
        "ivf_append_content_guard", "k_stays_filled",
        "lsh_append_noop", "lsh_compact_folds_tombstones",
        "lsh_compact_preserves_live_rows", "lsh_deleted_never_served"))
    rows.foreach(r => assert(r.getBoolean(1), s"${r.getString(0)} verdict false"))
  }

  test("label-stats drift: a merge that would go negative records an incident loudly") {
    // round-17 verdict ask #6: the silent max(0, ...) clamp let a
    // drifted stats file quietly mis-widen probes — now it floors AND
    // records, and ivfIndexHealth gates on the incident count
    val dir = java.nio.file.Files.createTempDirectory("graft-drift").toString
    Similarity.writeLabelStats(dir, Map(Some(1) -> 5L, Some(2) -> 3L))
    assert(Similarity.labelStatsDriftCount(dir) == 0L)
    // subtract more of label 2 than the stats ever saw
    Similarity.mergeLabelStats(dir, Map(Some(2) -> -10L))
    assert(Similarity.labelStatsDriftCount(dir) == 1L, "incident recorded")
    val after = Similarity.readLabelStats(dir).get
    assert(after == Map(Some(1) -> 5L), s"floored at zero: $after")
    // a healthy merge does not grow the counter
    Similarity.mergeLabelStats(dir, Map(Some(1) -> -2L))
    assert(Similarity.labelStatsDriftCount(dir) == 1L)
  }

  test("LSH index health: all signals ok on the test corpus") {
    val rows = Similarity.lshIndexHealth(spark, sfDir).collect()
    assert(rows.map(_.getString(0)).toSeq ==
      Seq("lsh_dead_rows_frac", "lsh_salt_group_max_over_cap",
        "lsh_tables_complete"))
    rows.foreach(r => assert(r.getBoolean(2), s"${r.getString(0)} verdict false"))
  }

  test("IVF append guard: refuses a shrunk corpus; a no-op append leaves a stale marker stale") {
    // ADVICE r14: ivfIndexAppend anti-joined on vec_id only and always
    // renewed the marker — a rewritten store could read as fresh while
    // the index served ghost/stale vectors
    import spark.implicits._
    def rows(ids: Range, shift: Long) = ids.map { i =>
      val r = new java.util.Random(i * 31L + 7L + shift)
      (i.toLong, Array.fill(16)(r.nextGaussian().toFloat), (i % 5))
    }.toDF("vec_id", "embedding", "label")
    // case 1: the corpus SHRANK — indexed ids are no longer a subset
    val dirA = java.nio.file.Files.createTempDirectory("graft-ivf-shrink").toString
    rows(0 until 300, 0L).write.mode("overwrite").parquet(s"$dirA/embeddings.parquet")
    Similarity.ivfTopK(spark, dirA, k = 3).collect()
    rows(0 until 200, 0L).write.mode("overwrite").parquet(s"$dirA/embeddings.parquet")
    Similarity.clearCaches()
    val ex = intercept[IllegalArgumentException] {
      Similarity.ivfIndexAppend(spark, dirA)
    }
    assert(ex.getMessage.contains("ghost") || ex.getMessage.contains("no longer"),
      s"must name the rewrite: ${ex.getMessage}")
    // case 2: same id set, REWRITTEN vectors — ids alone cannot see it,
    // but the stored cells ARE the content address (round 18, verdict
    // r17 ask #1): the append must REFUSE loudly instead of silently
    // no-op'ing, and the marker stays stale so the next reader refits
    val dirB = java.nio.file.Files.createTempDirectory("graft-ivf-rewrite").toString
    rows(0 until 300, 0L).write.mode("overwrite").parquet(s"$dirB/embeddings.parquet")
    Similarity.ivfTopK(spark, dirB, k = 3).collect()
    val marker = new java.io.File(Similarity.indexDir(dirB, 0), "_SUCCESS")
    val builtAt = marker.lastModified
    Thread.sleep(1100) // mtime granularity
    rows(0 until 300, 555L).write.mode("overwrite").parquet(s"$dirB/embeddings.parquet")
    Similarity.clearCaches()
    val exB = intercept[IllegalArgumentException] {
      Similarity.ivfIndexAppend(spark, dirB)
    }
    assert(exB.getMessage.contains("changed content"),
      s"must name the content rewrite: ${exB.getMessage}")
    assert(marker.lastModified == builtAt,
      "a refused append over a rewritten store must not certify freshness")
    // and the normal read path now refits instead of loading the ghost
    Similarity.ivfTopK(spark, dirB, k = 3).collect()
    assert(marker.lastModified > builtAt, "stale index must refit on next read")
    // case 3: a rewrite that KEPT every id and ADDED more — the exact
    // hole the content guard closes: the ghost check passes (ids are a
    // superset) but the cells were assigned from the old vectors
    val dirC = java.nio.file.Files.createTempDirectory("graft-ivf-growrewrite").toString
    rows(0 until 300, 0L).write.mode("overwrite").parquet(s"$dirC/embeddings.parquet")
    Similarity.ivfTopK(spark, dirC, k = 3).collect()
    rows(0 until 360, 555L).write.mode("overwrite").parquet(s"$dirC/embeddings.parquet")
    Similarity.clearCaches()
    val exC = intercept[IllegalArgumentException] {
      Similarity.ivfIndexAppend(spark, dirC)
    }
    assert(exC.getMessage.contains("changed content"),
      s"growth-masked rewrite must refuse: ${exC.getMessage}")
    // case 4: the manifest FAST PATH (round 18) must never mask a
    // rewrite — a successful append certifies the corpus files, and a
    // later rewrite (new files, coverage broken) must still fall
    // through to the content guard and refuse
    val dirD = java.nio.file.Files.createTempDirectory("graft-ivf-manifest").toString
    rows(0 until 300, 0L).write.mode("overwrite").parquet(s"$dirD/embeddings.parquet")
    Similarity.ivfTopK(spark, dirD, k = 3).collect()
    rows(300 until 340, 99L).write.mode("append").parquet(s"$dirD/embeddings.parquet")
    assert(Similarity.ivfIndexAppend(spark, dirD) == 40L) // slow path, writes manifest
    assert(new java.io.File(Similarity.indexDir(dirD, 0), "_corpus_manifest").isFile,
      "a successful append must certify the corpus manifest")
    // growth under an intact manifest: the fast path appends normally
    rows(340 until 360, 99L).write.mode("append").parquet(s"$dirD/embeddings.parquet")
    assert(Similarity.ivfIndexAppend(spark, dirD) == 20L, "fast-path growth appends")
    // rewrite: old corpus files replaced — coverage broken, refusal
    rows(0 until 400, 555L).write.mode("overwrite").parquet(s"$dirD/embeddings.parquet")
    Similarity.clearCaches()
    val exD = intercept[IllegalArgumentException] {
      Similarity.ivfIndexAppend(spark, dirD)
    }
    assert(exD.getMessage.contains("changed content"),
      s"rewrite after a certified append must still refuse: ${exD.getMessage}")
  }

  test("refits carry takedowns: a stale-marker rebuild must not resurrect deleted ids") {
    // round 18 (found by the lexical health-card spec, then audited
    // across tiers): the staleness-refit branch passed an empty carry
    // set, so corpus growth WITHOUT an index append (files landing
    // directly) followed by the automatic refit re-indexed and served
    // still-in-corpus taken-down vectors
    import spark.implicits._
    def rows(ids: Range, shift: Long) = ids.map { i =>
      val r = new java.util.Random(i * 31L + 7L + shift)
      (i.toLong, Array.fill(16)(r.nextGaussian().toFloat), (i % 5))
    }.toDF("vec_id", "embedding", "label")
    val dir = java.nio.file.Files.createTempDirectory("graft-carry").toString
    rows(0 until 300, 0L).write.mode("overwrite").parquet(s"$dir/embeddings.parquet")
    Similarity.ivfTopK(spark, dir, k = 3).collect()
    Similarity.ivfIndexDelete(spark, dir, Seq(5L))
    Thread.sleep(1100) // mtime granularity: make the corpus visibly newer
    rows(300 until 340, 99L).write.mode("append").parquet(s"$dir/embeddings.parquet")
    Similarity.clearCaches()
    val topk = Similarity.ivfTopK(spark, dir, k = 3).collect()
      .map(r => (r.getLong(0), r.getLong(2)))
    assert(topk.nonEmpty && !topk.exists(p => p._1 == 5L || p._2 == 5L),
      "stale-marker refit must not serve the taken-down vector")
    assert(Similarity.tombstoneCount(spark, Similarity.indexDir(dir, 0)) == 1L,
      "the registry must survive the refit swap")
    // the lexical twin: rebuild after takedown (the health-card test
    // pins serving identity; here pin the registry survival itself)
    val ldir = java.nio.file.Files.createTempDirectory("graft-carrylex").toString
    (1L to 9L).map(i => (i, "en", "s", s"alpha beta w$i", 3L))
      .toDF("doc_id", "lang", "source", "text", "n_chars")
      .coalesce(1).write.parquet(s"$ldir/documents.parquet")
    graft.ops.Lexical.ensureLexIndex(spark, ldir)
    assert(graft.ops.Lexical.lexIndexDelete(spark, ldir, Seq(4L)) == 1L)
    Thread.sleep(1100)
    (10L to 12L).map(i => (i, "en", "s", s"alpha beta w$i", 3L))
      .toDF("doc_id", "lang", "source", "text", "n_chars")
      .coalesce(1).write.mode("append").parquet(s"$ldir/documents.parquet")
    graft.ops.Lexical.clearAllLexCaches()
    val served = graft.ops.Lexical.searchText(spark, ldir, Seq("alpha"), 20)
      .collect().map(_.getLong(0)).toSet
    assert(!served.contains(4L), "lexical rebuild must not resurrect the takedown")
    assert((10L to 12L).forall(served.contains), "rebuild indexed the landed docs")
  }

  test("ensureIvfIndex: a skew-planted append flips a rebuild and balance returns under the ceiling") {
    // round-15 drift policy: ivfIndexAppend grows the lists under
    // FIXED centroids; when the appended mass dominates (or piles into
    // few cells), the ensure step must refit rather than keep serving
    // the drifted geometry
    import spark.implicits._
    val dir = java.nio.file.Files.createTempDirectory("graft-ivf-drift").toString
    def blob(ids: Range, center: Double, spread: Double) = ids.map { i =>
      val r = new java.util.Random(i * 131L + 11L)
      (i.toLong, Array.fill(8)((center + spread * r.nextGaussian()).toFloat), (i % 5))
    }.toDF("vec_id", "embedding", "label")
    blob(0 until 200, 0.0, 1.0).write.mode("overwrite").parquet(s"$dir/embeddings.parquet")
    graft.ops.Similarity.ensureIvfIndex(spark, dir)
    val idxDir = Similarity.indexDir(dir, 0)
    val marker = new java.io.File(idxDir, "_SUCCESS")
    val builtAt = marker.lastModified
    // append a DOMINANT far-away blob: the old centroids can't
    // represent it (occupancy piles up) and it outweighs the fit
    Thread.sleep(1100)
    blob(200 until 600, 8.0, 1.0).write.mode("append").parquet(s"$dir/embeddings.parquet")
    assert(Similarity.ivfIndexAppend(spark, dir) == 400L)
    assert(Similarity.appendedCount(idxDir) == 400L, "append meta recorded")
    val before = Similarity.cellBalanceReport(spark, dir).collect()(0)
      .getAs[Double]("balance_ratio")
    info(f"planted drift balance_ratio $before%.2f")
    Thread.sleep(1100)
    Similarity.ensureIvfIndex(spark, dir) // appended_frac 400/600 > 0.5 (and skewed)
    assert(marker.lastModified > builtAt, "drift must trigger a rebuild")
    assert(Similarity.appendedCount(idxDir) == 0L, "rebuild resets the append meta")
    val after = Similarity.cellBalanceReport(spark, dir).collect()(0)
      .getAs[Double]("balance_ratio")
    info(f"post-rebuild balance_ratio $after%.2f")
    assert(after <= 8.0, f"refit balance must return under the soak ceiling: $after%.2f")
    assert(after < before || before <= 8.0,
      f"rebuild must not worsen a skewed quantizer: $before%.2f -> $after%.2f")
    // healthy index: a second ensure is a no-op (idempotent)
    val rebuiltAt = marker.lastModified
    Similarity.ensureIvfIndex(spark, dir)
    assert(marker.lastModified == rebuiltAt, "healthy ensure must not rebuild")
  }

  test("nearest_cells kernel is bit-identical to the literal array_sort formulation") {
    // the codegen'd probe-selection expression replaced a literal
    // (dist, cell)-struct array_sort tree (round 14 — at nlist ≈ 1000
    // that tree is ~10⁵ Catalyst nodes); this is the bit-compatibility
    // property: same IEEE accumulation order, same (dist, cell)
    // tie-break, over randomized vectors INCLUDING planted exact ties
    import spark.implicits._
    import org.apache.spark.sql.functions._
    val rng = new scala.util.Random(4242)
    val d = 16
    val centroids = Array.fill(23)(Array.fill(d)(rng.nextGaussian()))
    // plant a duplicate centroid so the (dist, cell) tie-break actually
    // fires: cells 7 and 19 are identical
    centroids(19) = centroids(7).clone()
    val vecs = (0 until 200).map { i =>
      if (i % 17 == 0) (i.toLong, centroids(7).toSeq) // exact tie hit
      else (i.toLong, Array.fill(d)(rng.nextGaussian()).toSeq)
    }
    val df = vecs.toDF("vec_id", "v")
    val np = 6
    val fast = df.select(col("vec_id"),
        graft.functions.VectorFunctions.nearest_cells(col("v"), centroids, np).as("cells"))
      .collect().map(r => r.getLong(0) -> r.getSeq[Int](1).toSeq).toMap
    val distStructs = array(centroids.zipWithIndex.map { case (c, i) =>
      val carr = array(scala.collection.immutable.ArraySeq.unsafeWrapArray(c.map(lit(_))): _*)
      struct(
        aggregate(zip_with(col("v"), carr, (x, cc) => { val dd = x - cc; dd * dd }),
          lit(0.0d), (acc, e) => acc + e).as("dist"),
        lit(i).as("cell"))
    }.toIndexedSeq: _*)
    val refMap = df
      .withColumn("slices", slice(array_sort(distStructs), 1, np))
      .select(col("vec_id"), expr("transform(slices, s -> s.cell)").as("cells"))
      .collect().map(r => r.getLong(0) -> r.getSeq[Int](1).toSeq).toMap
    assert(fast == refMap, "nearest_cells diverged from the literal formulation")
    // the tie rows really did rank both duplicate cells, in index order
    val tieRow = fast(0L)
    assert(tieRow.indexOf(7) >= 0 && tieRow.indexOf(19) == tieRow.indexOf(7) + 1,
      s"tie-break order: $tieRow")
  }

  test("ANN recall@5 vs exact cosine top-k stays above the 0.9 gate (sf0.01)") {
    // the scaladocs of lshTopK/ivfTopK promise tunable recall — this is
    // the measurement: mean per-query |approx∩exact|/5 on the sf0.01
    // embeddings (500 vectors), at the registered default parameters.
    // Measured values are recorded in BASELINE.md.
    val dir = "/root/testdata/sf0.01"
    def topSets(df: org.apache.spark.sql.DataFrame): Map[Long, Set[Long]] =
      df.collect().map(r => (r.getLong(0), r.getLong(2)))
        .groupBy(_._1).view.mapValues(_.map(_._2).toSet).toMap
    val exact = topSets(Similarity.cosineTopK(spark, dir, k = 5))
    assert(exact.nonEmpty)
    def recall(approx: Map[Long, Set[Long]]): Double = {
      val per = exact.map { case (v, ex) =>
        approx.getOrElse(v, Set.empty).intersect(ex).size.toDouble / ex.size }
      per.sum / per.size
    }
    val lsh = recall(topSets(Similarity.lshTopK(spark, dir, k = 5)))
    val ivf = recall(topSets(Similarity.ivfTopK(spark, dir, k = 5)))
    val pq = recall(topSets(Similarity.ivfPqTopK(spark, dir, k = 5)))
    info(f"recall@5 on sf0.01: lsh=$lsh%.4f ivf=$ivf%.4f pq=$pq%.4f")
    assert(lsh >= 0.9, f"LSH recall@5 $lsh%.4f fell below the 0.9 gate")
    assert(ivf >= 0.9, f"IVF recall@5 $ivf%.4f fell below the 0.9 gate")
    assert(pq >= 0.9, f"IVF-PQ recall@5 $pq%.4f fell below the 0.9 gate")
  }

  test("minhash component-level recall is total at sf0.1, where cliques split buckets") {
    // The sf0.001 pair-recall gate above cannot see either failure mode
    // that only appears at scale: (1) estimator variance at the
    // threshold (every small-scale exact pair is a J=1 twin) and
    // (2) the 512-doc bucket cap splitting large duplicate cliques.
    // The gate that matters for dedup is CONNECTIVITY: every exact
    // J >= 0.95 pair's endpoints must land in one component of the
    // candidate graph — cliques may lose individual edges to the salt
    // cap (measured pair recall 0.68, by design), but never cohesion.
    val dir = "/root/testdata/sf0.1"
    assume(new java.io.File(dir).isDirectory, s"$dir not generated")
    val exact = NearDup.blockedJaccard(spark, dir, 0.95)
      .select("doc_a", "doc_b").collect().map(r => (r.getLong(0), r.getLong(1)))
    assume(exact.nonEmpty)
    val approx = NearDup.minhashCandidates(spark, dir, 0.95)
      .select("doc_a", "doc_b").collect().map(r => (r.getLong(0), r.getLong(1)))
    val parent = scala.collection.mutable.Map[Long, Long]()
    def find(x: Long): Long = {
      var r = x
      while (parent.getOrElse(r, r) != r) r = parent.getOrElse(r, r)
      var c = x
      while (parent.getOrElse(c, c) != c) { val n = parent.getOrElse(c, c); parent(c) = r; c = n }
      r
    }
    approx.foreach { case (a, b) =>
      val ra = find(a); val rb = find(b); if (ra != rb) parent(ra) = rb }
    val connected = exact.count { case (a, b) => find(a) == find(b) }
    val compRecall = connected.toDouble / exact.length
    info(f"sf0.1: ${exact.length} exact pairs, ${approx.length} candidates, " +
      f"component recall $compRecall%.4f")
    assert(compRecall >= 0.99,
      f"component recall $compRecall%.4f — candidate graph lost near-dup cohesion")
  }

  test("ANN recall@5 holds at sf0.1, where the salted bucket cap engages") {
    // At sf0.01 (500 vectors) no LSH bucket reaches the 512 cap, so the
    // gate above cannot see salt-split recall loss — which is how a
    // vec_id-only salt (identical split in every table, voiding the OR
    // across tables) shipped with measured sf0.1 recall 0.51 while the
    // small-scale gate read 0.997. This gate runs where buckets DO
    // split; the decorrelated (table,bucket)-keyed salt measures 0.935.
    val dir = "/root/testdata/sf0.1"
    assume(new java.io.File(dir).isDirectory, s"$dir not generated")
    def topSets(df: org.apache.spark.sql.DataFrame): Map[Long, Set[Long]] =
      df.collect().map(r => (r.getLong(0), r.getLong(2)))
        .groupBy(_._1).view.mapValues(_.map(_._2).toSet).toMap
    val exact = topSets(Similarity.cosineTopK(spark, dir, k = 5))
    assert(exact.nonEmpty)
    def recall(sets: Map[Long, Set[Long]]): Double = {
      val recs = exact.map { case (v, ex) =>
        sets.getOrElse(v, Set.empty).intersect(ex).size.toDouble / ex.size }
      recs.sum / recs.size
    }
    val lsh = recall(topSets(Similarity.lshTopK(spark, dir, k = 5)))
    val ivf = recall(topSets(Similarity.ivfTopK(spark, dir, k = 5)))
    val pq = recall(topSets(Similarity.ivfPqTopK(spark, dir, k = 5)))
    info(f"recall@5 on sf0.1: lsh=$lsh%.4f ivf=$ivf%.4f pq=$pq%.4f")
    assert(lsh >= 0.9, f"LSH recall@5 $lsh%.4f fell below the 0.9 gate at sf0.1")
    assert(ivf >= 0.9, f"IVF recall@5 $ivf%.4f fell below the 0.9 gate at sf0.1")
    assert(pq >= 0.9, f"IVF-PQ recall@5 $pq%.4f fell below the 0.9 gate at sf0.1")
  }

  test("int8 quantization: max reconstruction error bounded by half a quantization step") {
    val rows = Similarity.quantizeStats(spark, sfDir).collect()
    assert(rows.nonEmpty)
    rows.foreach { r =>
      val scale = r.getDouble(1); val mse = r.getDouble(2); val maxErr = r.getDouble(3)
      assert(scale > 0)
      // both outputs are rounded to 6dp, so allow that rounding slack
      assert(maxErr <= scale / 2.0 + 1e-6, s"vec ${r.getLong(0)}: maxErr $maxErr vs step $scale")
      assert(mse <= maxErr * maxErr + 1e-12)
    }
    val cells = Similarity.residualQuantizeStats(spark, sfDir, nlist = 4).collect()
    assert(cells.length == 4)
    assert(cells.map(_.getLong(1)).sum == spark.read.parquet(s"$sfDir/embeddings.parquet").count())
    cells.foreach(c => assert(c.getDouble(2) >= 0.0))
  }

  test("multimodal batched decode emits stub features consistent with payload bytes") {
    val feats = Multimodal.mediaFeatures(spark, sfDir).collect()
    assert(feats.nonEmpty)
    feats.foreach { r =>
      val kind = r.getString(1); val n = r.getLong(2)
      val (w, h, f) = Multimodal.decodeStub(kind, new Array[Byte](n.toInt))
      assert(r.getLong(3) == w && r.getLong(4) == h && r.getLong(5) == f,
        s"doc ${r.getLong(0)} features must equal the stub on $n bytes")
    }
  }

  test("winnowing sketch: bottom-k of the window hashes, stable, scalar rows") {
    val rows = graft.ops.TextAnalysis.winnowFingerprints(spark, sfDir).collect()
    assert(rows.nonEmpty)
    // one row per (doc_id, rank, window_hash, n_windows) sketch slot
    rows.groupBy(_.getLong(0)).foreach { case (docId, slots) =>
      val byRank = slots.sortBy(_.getLong(1))
      assert(byRank.length <= 4, s"doc $docId sketch larger than sketchSize")
      assert(byRank.map(_.getLong(1)).sameElements(1L to byRank.length),
        s"doc $docId ranks must be 1..k")
      val hashes = byRank.map(_.getLong(2))
      assert(hashes.sameElements(hashes.sorted), "sketch is the sorted bottom-k")
      slots.foreach(r => assert(r.getLong(3) >= byRank.length))
    }
    val again = graft.ops.TextAnalysis.winnowFingerprints(spark, sfDir).collect()
    assert(rows.map(r => (r.getLong(0), r.getLong(1), r.getLong(2))).toSeq ==
      again.map(r => (r.getLong(0), r.getLong(1), r.getLong(2))).toSeq)
  }

  test("dup clusters: edge endpoints share a cluster, cluster_id is the member min") {
    import graft.ops.Dedup
    val pairs = NearDup.blockedJaccard(spark, sfDir, 0.95)
      .select("doc_a", "doc_b").collect().map(r => (r.getLong(0), r.getLong(1)))
    val clusters = Dedup.dupClusters(spark, sfDir).collect()
      .map(r => r.getLong(0) -> (r.getLong(1), r.getLong(2))).toMap
    // every document is labeled
    val nDocs = spark.read.parquet(s"$sfDir/documents.parquet").count()
    assert(clusters.size == nDocs)
    // transitivity: each edge's endpoints landed in the same cluster
    pairs.foreach { case (a, b) =>
      assert(clusters(a)._1 == clusters(b)._1, s"edge ($a,$b) split across clusters")
    }
    // cluster_id is the min member; sizes are consistent
    clusters.groupBy(_._2._1).foreach { case (cid, members) =>
      assert(cid == members.keys.min, s"cluster $cid is not its min member")
      members.values.foreach { case (_, sz) => assert(sz == members.size) }
    }
  }

  test("curated corpus = quality-pass AND pii-clean AND survivor representative") {
    import graft.ops.{Dedup, TextAnalysis}
    val kept = Dedup.curateCorpus(spark, sfDir).collect().map(_.getLong(0)).toSet
    val quality = TextAnalysis.qualityScore(spark, sfDir).collect()
      .map(r => r.getLong(0) -> r.getDouble(6)).toMap
    val flagged = TextAnalysis.piiScan(spark, sfDir).collect()
      .map(r => r.getLong(0) -> r.getBoolean(4)).toMap
    val clusterOf = Dedup.dupClusters(spark, sfDir).collect()
      .map(r => r.getLong(0) -> r.getLong(1)).toMap
    // representative among SURVIVORS: a cluster contributes its min
    // filter-passing member, so a cluster is only lost when every
    // member fails the screens
    val survivors = quality.keySet.filter(d => quality(d) >= 0.5 && !flagged(d))
    val expected = survivors.groupBy(clusterOf).values.map(_.min).toSet
    assert(kept == expected,
      s"curation set mismatch: extra=${kept -- expected} missing=${expected -- kept}")
    assert(kept.nonEmpty, "curation should keep at least one document at sf0.001")
  }

  test("near-dup chain with diameter past the old round cap converges to one cluster") {
    import spark.implicits._
    // 30 docs, each a 40-token sliding window shifted by one: consecutive
    // docs share 39/41 tokens (J ≈ 0.9512 ≥ 0.95) but docs two apart only
    // 38/42 (J ≈ 0.9048) — a pure PATH graph of diameter 29, the shape
    // that silently defeated a diameter-bounded min-label loop with a
    // 20-round cap. Large/small-star must still contract it to a single
    // min-rooted cluster (plus leave an unrelated singleton alone).
    val n = 30
    val width = 40
    val dir = java.nio.file.Files.createTempDirectory("graft-chain").toString
    val rows = (0 until n).map { i =>
      val text = (i until i + width).map(j => f"w$j%04d").mkString(" ")
      (i.toLong + 1, "en", "chain", text, text.length.toLong)
    } :+ ((100L, "en", "chain", "entirely different tokens here", 30L))
    rows.toDF("doc_id", "lang", "source", "text", "n_chars")
      .coalesce(1).write.parquet(s"$dir/documents.parquet")
    // sanity: the edge set really is a path (only consecutive pairs)
    val edges = NearDup.blockedJaccard(spark, dir, 0.95).collect()
      .map(r => (r.getLong(0), r.getLong(1))).toSet
    assert(edges == (1 until n).map(i => (i.toLong, i.toLong + 1)).toSet,
      s"fixture must form a path graph, got $edges")
    val clusters = graft.ops.Dedup.dupClusters(spark, dir).collect()
      .map(r => (r.getLong(0), r.getLong(1), r.getLong(2)))
    assert(clusters.length == n + 1)
    clusters.filter(_._1 <= n).foreach { case (d, cid, sz) =>
      assert(cid == 1L, s"doc $d labeled $cid, expected the component min 1")
      assert(sz == n.toLong)
    }
    val singleton = clusters.find(_._1 == 100L).get
    assert(singleton._2 == 100L && singleton._3 == 1L)
  }

  test("tf-idf top terms: ranks dense, scores consistent with tf and df") {
    val rows = graft.ops.TextAnalysis.tfidfTopTerms(spark, sfDir).collect()
    assert(rows.nonEmpty)
    val nDocs = spark.read.parquet(s"$sfDir/documents.parquet").count()
    rows.groupBy(_.getLong(0)).foreach { case (docId, rs) =>
      val ranks = rs.map(_.getLong(1)).sorted
      assert(ranks.sameElements(1L to ranks.length), s"doc $docId ranks not dense")
      rs.foreach { r =>
        val tf = r.getLong(3); val df = r.getLong(4); val score = r.getDouble(5)
        assert(tf >= 1 && df >= 1 && df <= nDocs)
        val expected = tf * (math.log((nDocs + 1.0) / (df + 1.0)) + 1.0)
        assert(math.abs(score - expected) < 1e-4, s"doc $docId term ${r.getString(2)}")
      }
    }
  }

  test("bm25 search: scores match the closed form on a planted corpus") {
    import spark.implicits._
    val dir = java.nio.file.Files.createTempDirectory("graft-bm25").toString
    // N=3, avgdl=3: doc 1 hits (spark x2, join), doc 2 hits (spark), doc 3 none
    Seq((1L, "en", "s", "spark spark join", 16L),
        (2L, "en", "s", "spark other words here", 22L),
        (3L, "en", "s", "nothing relevant", 16L))
      .toDF("doc_id", "lang", "source", "text", "n_chars")
      .coalesce(1).write.parquet(s"$dir/documents.parquet")
    def contrib(df: Long, tf: Double, dl: Double): BigDecimal = {
      val idf = math.log(1.0 + (3.0 - df + 0.5) / (df + 0.5))
      val raw = idf * tf * 2.2 / (tf + 1.2 * (0.25 + 0.75 * dl / 3.0))
      BigDecimal(raw).setScale(8, BigDecimal.RoundingMode.HALF_UP)
    }
    val got = graft.ops.TextAnalysis.bm25Search(spark, dir).collect()
      .map(r => (r.getLong(0), r.getLong(1), r.getDouble(2)))
    val exp1 = (contrib(2, 2.0, 3.0) + contrib(1, 1.0, 3.0)).toDouble
    val exp2 = contrib(2, 1.0, 4.0).toDouble
    assert(got.map(_._1).toSeq == Seq(1L, 2L), "ranking and membership")
    assert(got(0)._2 == 2L && got(1)._2 == 1L, "matched-term counts")
    assert(math.abs(got(0)._3 - exp1) < 1e-6, s"doc 1 score ${got(0)._3} vs $exp1")
    assert(math.abs(got(1)._3 - exp2) < 1e-6, s"doc 2 score ${got(1)._3} vs $exp2")
  }

  test("pii scan counts match a direct regex count on the raw text") {
    val texts = spark.read.parquet(s"$sfDir/documents.parquet")
      .select("doc_id", "text").collect().map(r => r.getLong(0) -> r.getString(1)).toMap
    val rows = graft.ops.TextAnalysis.piiScan(spark, sfDir).collect()
    assert(rows.length == texts.size)
    def countOf(pattern: String, s: String): Long =
      java.util.regex.Pattern.compile(pattern).matcher(s).results().count()
    rows.foreach { r =>
      val t = texts(r.getLong(0))
      assert(r.getLong(1) == countOf("[A-Za-z0-9._%+-]+@[A-Za-z0-9.-]+\\.[A-Za-z][A-Za-z]+", t))
      assert(r.getLong(2) == countOf("https?://[^ \\t\\n]+", t))
      assert(r.getLong(3) == countOf("[0-9]{9,}", t))
      assert(r.getBoolean(4) == (r.getLong(1) + r.getLong(2) + r.getLong(3) > 0))
    }
  }

  test("rollup subtotals: each region's ALL row equals the sum of its nation rows") {
    val rows = Relational.revenueRollup(spark, sfDir).collect()
      .map(r => (r.getString(0), r.getString(1), r.getLong(2), r.getDouble(3)))
    val grand = rows.filter(r => r._1 == "ALL" && r._2 == "ALL")
    assert(grand.length == 1)
    val regions = rows.filter(r => r._1 != "ALL" && r._2 == "ALL")
    regions.foreach { case (region, _, n, total) =>
      val nations = rows.filter(r => r._1 == region && r._2 != "ALL")
      assert(nations.map(_._3).sum == n, s"$region order-count subtotal")
      assert(math.abs(nations.map(_._4).sum - total) < 1e-4, s"$region revenue subtotal")
    }
    assert(regions.map(_._3).sum == grand.head._3, "grand total")
  }

  test("7-day range frame shrinks over gaps (frame sum never exceeds 7 daily rows)") {
    val rows = Relational.sliding7dRevenue(spark, sfDir).collect()
      .map(r => (r.getString(0), r.getDate(1).toLocalDate.toEpochDay, r.getDouble(2), r.getDouble(3)))
    rows.groupBy(_._1).foreach { case (_, rs) =>
      val byDay = rs.sortBy(_._2)
      byDay.foreach { case (_, day, _, v7) =>
        val expected = byDay.filter(r => r._2 <= day && r._2 > day - 7).map(_._3).sum
        assert(math.abs(v7 - expected) < 1e-4, s"day $day trailing sum $v7 vs $expected")
      }
    }
  }

  test("as-of daily spine is dense per key and forward-fills gaps") {
    val rows = Relational.asofDailySpine(spark, sfDir).collect()
    val byType = rows.groupBy(_.getString(0))
    byType.foreach { case (_, rs) =>
      val days = rs.map(_.getDate(1).toLocalDate.toEpochDay)
      assert(days.max - days.min + 1 == days.length, "spine must be dense")
      rs.foreach(r => assert(!r.isNullAt(2), "asof value must be forward-filled"))
    }
  }

  test("partitioned store round-trip: pruned read reproduces the direct series") {
    val out = java.nio.file.Files.createTempDirectory("graft-part").toString + "/events_part"
    graft.sources.SeriesStore.writePartitioned(spark, sfDir, out)
    val direct = graft.sources.SeriesStore.series(spark, sfDir, Seq("error")).collect()
    val pruned = graft.sources.SeriesStore.seriesFromPartitioned(spark, out, Seq("error")).collect()
    assert(direct.length == 1 && pruned.length == 1)
    assert(direct.head.values.sameElements(pruned.head.values))
    // the element filter must reach the scan as a partition filter
    val plan = graft.sources.SeriesStore.seriesFromPartitioned(spark, out, Seq("error"))
      .queryExecution.executedPlan.toString
    assert(plan.contains("PartitionFilters") && plan.contains("error"),
      "element filter should prune partitions")
  }

  test("fit path defaults to the partitioned mirror once laid out") {
    graft.sources.SeriesStore.ensurePartitioned(spark, sfDir)
    val plan = graft.sources.SeriesStore.series(spark, sfDir, Seq("error"))
      .queryExecution.executedPlan.toString
    assert(plan.contains("PartitionFilters") && plan.contains("error"),
      "series() should read the element-partitioned mirror with a partition filter")
    // and the unfiltered store fit returns the same series as the flat scan
    val viaMirror = graft.sources.SeriesStore.series(spark, sfDir).collect()
      .map(s => s.element -> s.values.toSeq).toMap
    val flat = graft.sources.SeriesStore.observations(spark, sfDir)
      .groupBy(org.apache.spark.sql.functions.col("element"))
      .agg(org.apache.spark.sql.functions.sort_array(
        org.apache.spark.sql.functions.collect_list(org.apache.spark.sql.functions.struct(
          org.apache.spark.sql.functions.col("step"), org.apache.spark.sql.functions.col("value")))).as("pts"))
      .select(org.apache.spark.sql.functions.col("element"),
        org.apache.spark.sql.functions.col("pts.value").as("values"))
      .collect().map(r => r.getString(0) -> r.getSeq[Double](1)).toMap
    assert(viaMirror == flat, "mirror fit path must reproduce the flat-scan series")
  }

  test("content-hash split: deterministic, sane shares, copies co-located") {
    import graft.ops.Curation
    val rows = Curation.corpusSplit(spark, sfDir).collect()
      .map(r => (r.getLong(0), r.getString(3)))
    assert(rows.nonEmpty)
    val again = Curation.corpusSplit(spark, sfDir).collect()
      .map(r => (r.getLong(0), r.getString(3)))
    assert(rows.toSeq == again.toSeq, "split assignment must be deterministic")
    val trainShare = rows.count(_._2 == "train").toDouble / rows.length
    assert(trainShare > 0.75 && trainShare < 0.98, s"train share $trainShare off target ~0.9")
    // byte-identical duplicates hash to the same split by construction
    val split = rows.toMap
    val dupGroups = spark.read.parquet(s"$sfDir/documents.parquet")
      .groupBy(org.apache.spark.sql.functions.col("text"))
      .agg(org.apache.spark.sql.functions.collect_list("doc_id").as("ids"))
      .collect().map(_.getSeq[Long](1)).filter(_.length > 1)
    dupGroups.foreach { ids =>
      assert(ids.map(split).toSet.size == 1, s"copies $ids split across partitions")
    }
  }

  test("split leakage pairs are cross-split near-duplicates at the 0.8 threshold") {
    import graft.ops.Curation
    val pairs = NearDup.blockedJaccard(spark, sfDir, 0.8).collect()
      .map(r => (r.getLong(0), r.getLong(1)) -> r.getDouble(2)).toMap
    val split = Curation.corpusSplit(spark, sfDir).collect()
      .map(r => r.getLong(0) -> r.getString(3)).toMap
    val leaks = Curation.splitLeakage(spark, sfDir).collect()
    leaks.foreach { r =>
      val (a, b) = (r.getLong(0), r.getLong(1))
      assert(pairs.contains((a, b)), s"leak ($a,$b) is not a near-dup pair")
      assert(r.getString(2) == split(a) && r.getString(3) == split(b))
      assert(split(a) != split(b), "leak endpoints must sit in different splits")
      assert(r.getDouble(4) >= 0.8)
    }
    // completeness: every cross-split near-dup pair is reported
    val expected = pairs.keys.count { case (a, b) => split(a) != split(b) }
    assert(leaks.length == expected, s"${leaks.length} leaks vs $expected cross-split pairs")
  }

  test("repetition stats flag a constructed spam document") {
    import spark.implicits._
    val dir = java.nio.file.Files.createTempDirectory("graft-rep").toString
    Seq(
      (1L, "en", "s", "buy now " * 50 + "limited offer", 0L),
      (2L, "en", "s", (1 to 100).map(i => s"tok$i").mkString(" "), 0L))
      .toDF("doc_id", "lang", "source", "text", "n_chars")
      .coalesce(1).write.parquet(s"$dir/documents.parquet")
    val rows = graft.ops.Curation.repetitionStats(spark, dir).collect()
      .map(r => r.getLong(0) -> (r.getLong(1), r.getLong(2), r.getDouble(3), r.getLong(4))).toMap
    val (spamTotal, spamDistinct, spamFrac, spamMax) = rows(1L)
    assert(spamDistinct <= spamTotal && spamFrac > 0.9 && spamMax > 10,
      s"spam doc should be dominated by repeated trigrams: $rows")
    val (_, _, cleanFrac, cleanMax) = rows(2L)
    assert(cleanFrac == 0.0 && cleanMax == 1L, "all-distinct doc has zero repetition")
  }

  test("source overlap matrix counts cross- and same-source duplicate pairs") {
    // the shipped corpora are exact-dup-free (source_overlap is 0 rows
    // there, matching its oracle), so the combination math c_a·c_b /
    // C(c,2) needs a constructed fixture with known overlap
    import spark.implicits._
    val dir = java.nio.file.Files.createTempDirectory("graft-overlap").toString
    Seq(
      (1L, "en", "s1", "xxx", 3L), (2L, "en", "s1", "yyy", 3L),
      (3L, "en", "s2", "xxx", 3L), (4L, "en", "s2", "xxx", 3L),
      (5L, "en", "s3", "yyy", 3L), (6L, "en", "s3", "zzz", 3L))
      .toDF("doc_id", "lang", "source", "text", "n_chars")
      .coalesce(1).write.parquet(s"$dir/documents.parquet")
    val engine = graft.ops.Curation.sourceOverlap(spark, dir).collect()
      .map(r => (r.getString(0), r.getString(1)) -> r.getLong(2)).toMap
    // "xxx": d1(s1), d3+d4(s2) → (s1,s2)=1·2, (s2,s2)=C(2,2); "yyy": (s1,s3)=1
    assert(engine == Map(("s1", "s2") -> 2L, ("s2", "s2") -> 1L, ("s1", "s3") -> 1L),
      s"got $engine")
  }

  test("embedding outlier screen: z-scores centered per cell, planted outlier flagged") {
    import spark.implicits._
    val rows = Similarity.embeddingOutliers(spark, sfDir).collect()
    assert(rows.length == 500)
    rows.foreach { r =>
      assert(java.lang.Double.isFinite(r.getDouble(4)), "z finite")
      assert(r.getBoolean(5) ==
        (math.abs(r.getDouble(4)) > 3.0 || r.getLong(2) <= 1L),
        "flag iff |z| > 3 or isolated in a singleton cell")
    }
    // per-cell z means ~0 by construction
    val byCell = rows.groupBy(_.getInt(1)).values
    byCell.filter(_.length > 1).foreach { cell =>
      val mz = cell.map(_.getDouble(4)).sum / cell.length
      assert(math.abs(mz) < 0.05, s"per-cell z mean $mz should be ~0")
    }
    // a planted far-away vector must flag (it isolates into a singleton
    // cell, which is exactly what the population rule exists for);
    // its tight cluster must stay mostly unflagged
    val dir = java.nio.file.Files.createTempDirectory("graft-outlier").toString
    val rng = new scala.util.Random(11L)
    val cluster = (0L until 60L).map(i =>
      (i, 0, Array.tabulate(8)(d => (d + 1).toFloat + rng.nextGaussian().toFloat * 0.05f)))
    val outlier = (999L, 0, Array.fill(8)(60.0f))
    (cluster :+ outlier).toDF("vec_id", "label", "embedding")
      .coalesce(1).write.parquet(s"$dir/embeddings.parquet")
    val planted = Similarity.embeddingOutliers(spark, dir).collect()
      .map(r => r.getLong(0) -> r.getBoolean(5)).toMap
    assert(planted(999L), "the planted far vector must be flagged")
    assert(planted.count(_._2) <= 3, "the tight cluster must stay mostly unflagged")
  }

  test("ngram novelty: duplicate scores 0, fresh 1, overlap exact; null/short handled") {
    import spark.implicits._
    val dir = java.nio.file.Files.createTempDirectory("graft-novelty").toString
    val a = (1 to 12).map(i => s"w$i").mkString(" ")            // 5 grams, all first
    val b = a                                                   // verbatim dup -> 0
    val c = ((1 to 8).map(i => s"w$i") ++ (1 to 8).map(i => s"x$i")).mkString(" ")
    val e = "p q r"                                             // <8 tokens: 1 whole-seq gram
    Seq((1L, Option(a)), (2L, Option(b)), (3L, Option(c)),
      (4L, Option.empty[String]), (5L, Option(e)))
      .map { case (id, t) => (id, "en", "s", t.orNull, t.map(_.length.toLong).getOrElse(0L)) }
      .toDF("doc_id", "lang", "source", "text", "n_chars")
      .coalesce(1).write.parquet(s"$dir/documents.parquet")
    val got = graft.ops.Curation.ngramNovelty(spark, dir).collect()
      .map(r => r.getLong(0) -> (r.getLong(1), r.getLong(2),
        if (r.isNullAt(3)) Double.NaN else r.getDouble(3))).toMap
    assert(got(1L) == ((5L, 5L, 1.0)), s"fresh doc fully novel: ${got(1L)}")
    assert(got(2L) == ((5L, 0L, 0.0)), s"verbatim dup scores 0: ${got(2L)}")
    // c: gram 1 lies inside a's first 8 tokens (seen), grams 2-9 carry
    // an x-token each (novel) -> 8/9
    assert(got(3L)._1 == 9L && got(3L)._2 == 8L &&
      math.abs(got(3L)._3 - 8.0 / 9.0) < 1e-6, s"overlap doc: ${got(3L)}")
    assert(got(4L)._1 == 0L && got(4L)._3.isNaN, s"null text: ${got(4L)}")
    assert(got(5L) == ((1L, 1L, 1.0)), s"short doc whole-seq gram: ${got(5L)}")
  }

  test("ngram novelty viral-duplicate corpus: hot gram correct, no window buffer") {
    import spark.implicits._
    // every doc repeats ONE universal 8-gram (the viral-boilerplate
    // regime where a window-over-gram first-occurrence would buffer the
    // whole corpus in a single task) plus one private gram
    val dir = java.nio.file.Files.createTempDirectory("graft-viral").toString
    val boiler = (1 to 8).map(i => s"b$i").mkString(" ")
    (0L until 200L).map(id =>
        (id, "en", "s", s"$boiler u${id}a u${id}b u${id}c u${id}d u${id}e u${id}f u${id}g u${id}h",
          1L))
      .toDF("doc_id", "lang", "source", "text", "n_chars")
      .coalesce(1).write.parquet(s"$dir/documents.parquet")
    val df = graft.ops.Curation.ngramNovelty(spark, dir)
    // the first-occurrence pass must be an aggregate + equi-join, never
    // a gram-partitioned window (single-task hot-gram buffer at scale)
    val plan = df.queryExecution.executedPlan.toString
    assert(!plan.contains("Window"),
      "ngram_novelty must not use a window over grams")
    val got = df.collect()
      .map(r => r.getLong(0) -> (r.getLong(1), r.getLong(2))).toMap
    // doc 0 owns the boilerplate gram's first occurrence: all 9 grams
    // novel; every later doc re-sees it: 8 of 9 novel
    assert(got(0L) == ((9L, 9L)), s"doc 0: ${got(0L)}")
    (1L until 200L).foreach(id =>
      assert(got(id) == ((9L, 8L)), s"doc $id: ${got(id)}"))
  }

  test("sketch/stream gates: every verdict row TRUE, metric set exact") {
    val rows = graft.ops.SketchStreamGates.gates(spark, sfDir).collect()
      .map(r => r.getString(0) -> r.getBoolean(1))
    assert(rows.map(_._1).toSeq ==
      graft.ops.SketchStreamGates.Metrics.sorted,
      s"metric set must match the declared list: ${rows.map(_._1).toSeq}")
    rows.foreach { case (m, ok) => assert(ok, s"gate $m must hold on the store") }
  }

  test("session caches release and rebuild cleanly across clearCaches") {
    // the resident-service contract: a long-lived session churning
    // corpus snapshots must be able to drop every persisted table and
    // get identical answers on recompute
    val before = (
      graft.ops.Dedup.dupClusters(spark, sfDir).collect().toSeq,
      graft.ops.Dedup.semanticDedup(spark, sfDir).collect().toSeq,
      graft.ops.TextAnalysis.winnowOverlap(spark, sfDir).collect().toSeq,
      Similarity.ivfTopK(spark, sfDir).collect().toSeq,
      graft.ops.Bpe.bpeMerges(spark, sfDir).collect().toSeq,
      graft.ops.ScalePatterns.bloomCascadeRevenue(spark, sfDir).collect().toSeq)
    graft.ops.Dedup.clearCaches()
    graft.ops.NearDup.clearCaches()
    graft.ops.Similarity.clearCaches()
    graft.ops.TextAnalysis.clearCaches()
    graft.ops.QualityModel.clearCaches()
    graft.ops.Affinity.clearCaches()
    graft.ops.Bpe.clearCaches()
    graft.ops.ScalePatterns.clearCaches()
    graft.ops.Multimodal.clearCaches()
    graft.ops.SketchStreamGates.clearCaches()
    graft.ops.Curation.clearCaches()
    graft.engine.Conformal.clearCaches()
    val after = (
      graft.ops.Dedup.dupClusters(spark, sfDir).collect().toSeq,
      graft.ops.Dedup.semanticDedup(spark, sfDir).collect().toSeq,
      graft.ops.TextAnalysis.winnowOverlap(spark, sfDir).collect().toSeq,
      Similarity.ivfTopK(spark, sfDir).collect().toSeq,
      graft.ops.Bpe.bpeMerges(spark, sfDir).collect().toSeq,
      graft.ops.ScalePatterns.bloomCascadeRevenue(spark, sfDir).collect().toSeq)
    assert(before == after, "recomputed results must equal the cached ones")
  }

  test("viral-duplicate skew: caps bound the joins, connectivity and counts stay exact") {
    // The scale claims that otherwise live only in scaladocs, asserted
    // on a constructed worst case: ONE text duplicated 600× across two
    // sources (a clique whose band buckets exceed the 512 salt cap),
    // plus a few ordinary documents.
    import spark.implicits._
    val dir = java.nio.file.Files.createTempDirectory("graft-viral").toString
    val viralText = "please share this important announcement with all of your " +
      "friends because the committee has decided that the annual meeting will " +
      "now happen on the first day of the coming month in the town hall"
    val clique = (0L until 600L).map(i =>
      (i, "en", if (i < 300) "s1" else "s2", viralText, viralText.length.toLong))
    val t900 = "the river keeps its own slow schedule through the valley floor and " +
      "the people of the town have learned to read the water line on the old stone " +
      "bridge because it tells them more about the season than any calendar on the " +
      "wall of the station ever could and they trust it completely"
    val t901 = "a workshop on pottery glazes runs every second weekend downtown and " +
      "the teacher brings a crate of samples from the kiln so that the students can " +
      "see how the same clay takes a different color when the heat and the minerals " +
      "in the glaze are allowed to argue with each other for an afternoon"
    val t902 = "migratory birds favor the eastern shore when the wind turns cold and " +
      "the observers on the headland count them through the morning with the patience " +
      "of people who know that the light will not hold and that the flocks they miss " +
      "today will not come back along the same line of the coast"
    val normals = Seq(
      (900L, "en", "s1", t900, t900.length.toLong),
      (901L, "en", "s2", t901, t901.length.toLong),
      (902L, "en", "s1", t902, t902.length.toLong))
    (clique ++ normals).toDF("doc_id", "lang", "source", "text", "n_chars")
      .repartition(4).write.parquet(s"$dir/documents.parquet")

    // (1) minhash candidates: the 512 cap splits the clique's buckets,
    // so the emitted edge set must be SMALLER than the full clique —
    // yet union-find over it must still connect all 600 copies (the
    // spanning property dedup consumes; pair enumeration is sacrificed
    // by design)
    val cand = NearDup.minhashCandidates(spark, dir, 0.95)
      .select("doc_a", "doc_b").collect().map(r => (r.getLong(0), r.getLong(1)))
    val fullClique = 600L * 599 / 2
    assert(cand.length < fullClique,
      s"salt cap must drop clique edges: got ${cand.length} of $fullClique")
    val parent = scala.collection.mutable.Map[Long, Long]()
    def find(x: Long): Long = {
      val p = parent.getOrElse(x, x)
      if (p == x) x else { val r = find(p); parent(x) = r; r }
    }
    cand.foreach { case (a, b) =>
      val (ra, rb) = (find(a), find(b))
      if (ra != rb) parent(math.max(ra, rb)) = math.min(ra, rb)
    }
    assert((0L until 600L).forall(find(_) == 0L),
      "every viral copy must stay connected through the capped candidate graph")
    info(s"clique candidates ${cand.length} / $fullClique possible, one component")

    // (2) text-tier clustering converges (no round-cap throw) and labels
    // the per-(lang,source) cliques exactly
    val clusters = graft.ops.Dedup.dupClusters(spark, dir).collect()
      .map(r => r.getLong(0) -> (r.getLong(1), r.getLong(2)))
    assert(clusters.count { case (_, (cid, sz)) => cid == 0L && sz == 300L } == 300)
    assert(clusters.count { case (_, (cid, sz)) => cid == 300L && sz == 300L } == 300)

    // (3) composed curation keeps exactly one representative per
    // surviving cluster: min doc_id of each source's clique + normals
    val kept = graft.ops.Dedup.curateCorpus(spark, dir).collect().map(_.getLong(0)).toSet
    assert(kept == Set(0L, 300L, 900L, 901L, 902L), s"got $kept")

    // (4) source_overlap: rows stay |source-pairs|-scale with EXACT
    // combination counts — never a 600² doc-level join
    val overlap = graft.ops.Curation.sourceOverlap(spark, dir).collect()
      .map(r => (r.getString(0), r.getString(1)) -> r.getLong(2)).toMap
    assert(overlap == Map(
      ("s1", "s1") -> (300L * 299 / 2), ("s1", "s2") -> 300L * 300,
      ("s2", "s2") -> (300L * 299 / 2)), s"got $overlap")

    // (5) a hot LSH bucket (520 identical vectors > the 512 cap, plus
    // seeded noise): every hot-bucket query still gets its full k at
    // similarity 1.0 through the salted split
    val rng = new scala.util.Random(7L)
    val base = Array.fill(8)(rng.nextGaussian().toFloat)
    val hot = (0L until 520L).map(i => (i, 0, base.clone()))
    val noise = (600L until 630L).map(i => (i, 1, Array.fill(8)(rng.nextGaussian().toFloat)))
    (hot ++ noise).toDF("vec_id", "label", "embedding")
      .repartition(4).write.parquet(s"$dir/embeddings.parquet")
    val topk = Similarity.lshTopK(spark, dir, k = 5).collect()
      .filter(_.getLong(0) < 520L)
    val byQuery = topk.groupBy(_.getLong(0))
    assert(byQuery.size == 520 && byQuery.values.forall(_.length == 5),
      "every hot-bucket query keeps a full k=5 neighbor list")
    assert(topk.forall(r => r.getDouble(3) == 1.0),
      "identical-vector neighbors rerank at exactly 1.0")
  }

  test("doc chunks: stride-aligned, overlap-consistent, and lossless") {
    val chunks = graft.ops.TextAnalysis.docChunks(spark, sfDir, chunk = 64, overlap = 16)
      .collect()
      .groupBy(_.getLong(0))
    assert(chunks.nonEmpty)
    val docs = spark.read.parquet(s"$sfDir/documents.parquet")
      .select("doc_id", "text").collect()
      .map(r => r.getLong(0) -> r.getString(1).trim.split("\\s+").toSeq).toMap
    chunks.foreach { case (docId, rows) =>
      val sorted = rows.sortBy(_.getLong(1))
      val toks = docs(docId)
      sorted.zipWithIndex.foreach { case (r, i) =>
        assert(r.getLong(1) == i, "chunk ids dense from 0")
        assert(r.getLong(2) == i * 48L, "starts advance by the stride")
        val expect = toks.slice(i * 48, i * 48 + 64)
        assert(r.getLong(3) == expect.length, s"doc $docId chunk $i token count")
        assert(r.getString(4) == expect.mkString(" "), s"doc $docId chunk $i text")
      }
      // lossless: dropping each chunk's 16-token overlap head (except
      // the first) reconstructs the document's token stream exactly
      val rebuilt = sorted.zipWithIndex.flatMap { case (r, i) =>
        val ts = r.getString(4).split(" ").toSeq
        if (i == 0) ts else ts.drop(16)
      }
      assert(rebuilt.toSeq == toks, s"doc $docId must reconstruct from its chunks")
    }
  }

  test("bigram perplexity separates repetitive boilerplate from alien transitions") {
    import spark.implicits._
    val dir = java.nio.file.Files.createTempDirectory("graft-ppl").toString
    val normal = (1L to 20L).map(i =>
      (i, "en", "s", s"the cat number $i sat on the mat and the dog slept near the door", 60L))
    // repetitive: one bigram over and over -> transitions the corpus LM
    // has seen many times -> LOW perplexity
    val boiler = (100L, "en", "s", ("buy now " * 30).trim, 240L)
    // alien: word transitions appearing nowhere else -> HIGH perplexity
    val alien = (101L, "en", "s",
      "zyx qwv plk mnb vcx asd fgh jkl poi uyt rew qas zxc edc rfv tgb yhn ujm", 70L)
    (normal :+ boiler :+ alien)
      .toDF("doc_id", "lang", "source", "text", "n_chars")
      .coalesce(1).write.parquet(s"$dir/documents.parquet")
    val ppl = graft.ops.TextAnalysis.docPerplexity(spark, dir).collect()
      .map(r => r.getLong(0) -> r.getDouble(2)).toMap
    val normalMean = normal.map(n => ppl(n._1)).sum / normal.size
    assert(ppl(100L) < normalMean,
      s"repeated bigrams must score below the normal docs: ${ppl(100L)} vs $normalMean")
    assert(ppl(101L) > normalMean * 2,
      s"unique transitions must score far above the normal docs: ${ppl(101L)} vs $normalMean")
  }

  test("distilled quality classifier generalizes to the held-out splits") {
    // sf0.1 is the PRIMARY gate (its held-out slice is hundreds of docs;
    // the sf0.001 slice is ~56 docs and near-vacuous — kept as a smoke
    // check only)
    Seq(sfDir, "/root/testdata/sf0.01", "/root/testdata/sf0.1").foreach(checkQualityModelAuc)
  }

  private def checkQualityModelAuc(dir: String): Unit = {
    assume(new java.io.File(dir).isDirectory, s"$dir not generated")
    val heuristic = graft.ops.TextAnalysis.qualityScore(spark, dir).collect()
      .map(r => r.getLong(0) -> (r.getDouble(6) >= 0.5)).toMap
    val scored = graft.ops.QualityModel.modelScores(spark, dir).collect()
    assert(scored.length == heuristic.size, "every document is scored")
    val holdout = scored.filterNot(_.getBoolean(3))
    assert(holdout.nonEmpty, "val/test hash buckets must be non-empty")
    // AUC of the model probability against the rule-screen verdict on
    // documents the fit never saw — the distillation quality gate
    val ranked = holdout.map(r => (r.getDouble(1), heuristic(r.getLong(0))))
    val pos = ranked.count(_._2).toLong
    val neg = ranked.length - pos
    assume(pos > 0 && neg > 0, "held-out slice needs both classes")
    // exact Mann-Whitney AUC with tie correction
    val sorted = ranked.sortBy(_._1)
    var rankSum = 0.0
    var i = 0
    while (i < sorted.length) {
      var j = i
      while (j < sorted.length && sorted(j)._1 == sorted(i)._1) j += 1
      val avgRank = (i + 1 + j) / 2.0 // ranks are 1-based; ties share the mean rank
      var t = i
      while (t < j) { if (sorted(t)._2) rankSum += avgRank; t += 1 }
      i = j
    }
    val auc = (rankSum - pos * (pos + 1) / 2.0) / (pos.toDouble * neg)
    info(f"$dir held-out AUC $auc%.4f over ${holdout.length} docs ($pos pos / $neg neg)")
    assert(auc >= 0.75, f"distilled classifier AUC $auc%.4f below the 0.75 gate")
  }

  test("term zipf: head fit has negative power-law slope on natural text") {
    val r = TextAnalysis.termZipf(spark, sfDir).collect()
    assert(r.length == 1)
    // sf0.001's synthetic generator has a ~31-word vocabulary — the
    // gate is the fit's SIGN and finiteness, not natural-corpus shape
    assert(r.head.getLong(0) > 10L, s"vocab head present: ${r.head}")
    val slope = r.head.getDouble(1)
    assert(slope < 0.0 && slope > -3.0, s"zipfian slope expected, got $slope")
  }

  test("encoding quality: planted mojibake counted exactly, null text screens clean") {
    import spark.implicits._
    val dir = java.nio.file.Files.createTempDirectory("graft-enc").toString
    val clean = "plain ascii text with tabs\tand\nnewlines"
    val ctrl = "bad \u0001byte\u0007and\u0013more" // 3 C0 control chars
    val fffd = "lossy � decode �� here"       // 3 replacement chars
    val uni = "café résumé"                   // 3 non-ascii, len 11
    Seq((1L, "en", "s", clean, clean.length.toLong), (2L, "en", "s", ctrl, ctrl.length.toLong),
        (3L, "en", "s", fffd, fffd.length.toLong), (4L, "fr", "s", uni, uni.length.toLong),
        (5L, "en", "s", null.asInstanceOf[String], 0L))
      .toDF("doc_id", "lang", "source", "text", "n_chars")
      .coalesce(1).write.parquet(s"$dir/documents.parquet")
    val rows = TextAnalysis.encodingQuality(spark, dir).collect()
      .map(r => r.getLong(0) -> ((r.getLong(2), r.getLong(3), r.getDouble(4), r.getBoolean(5))))
      .toMap
    assert(rows(1L) == ((0L, 0L, 0.0, true)), s"clean doc: ${rows(1L)}")
    assert(rows(2L)._1 == 3L && !rows(2L)._4, s"3 control chars flag: ${rows(2L)}")
    assert(rows(3L)._2 == 3L && !rows(3L)._4, s"3 replacement chars flag: ${rows(3L)}")
    // U+FFFD is non-ascii but not a C0 control; accents count toward the ratio
    assert(rows(4L) == ((0L, 0L, 0.272727, true)),
      s"accented doc clean with exact ratio: ${rows(4L)}")
    assert(rows(5L) == ((0L, 0L, 0.0, true)), s"null text screens clean: ${rows(5L)}")
  }

  test("substring spans: planted verbatim run recovered with exact offsets") {
    import spark.implicits._
    val dir = java.nio.file.Files.createTempDirectory("graft-span").toString
    val span = (1 to 20).map(i => s"shared$i").mkString(" ")
    val d1 = "alpha beta gamma " + span + " tail1 tail2"  // span tokens 4..23
    val d2 = "x1 x2 x3 x4 x5 " + span + " end"            // span tokens 6..25
    val d3 = (1 to 30).map(i => s"unique$i").mkString(" ")
    Seq((1L, "en", "s", d1, d1.length.toLong), (2L, "en", "s", d2, d2.length.toLong),
        (3L, "en", "s", d3, d3.length.toLong))
      .toDF("doc_id", "lang", "source", "text", "n_chars")
      .coalesce(1).write.parquet(s"$dir/documents.parquet")
    val rows = NearDup.substringSpans(spark, dir).collect()
    assert(rows.length == 1, s"exactly the one planted span: ${rows.mkString(", ")}")
    val r = rows.head
    assert((r.getLong(0), r.getLong(1), r.getLong(2), r.getLong(3), r.getLong(4)) ==
      ((1L, 2L, 4L, 6L, 20L)), s"maximal span with exact offsets: $r")
    // the declared hot-gram cap excludes over-shared grams by definition
    assert(NearDup.substringSpans(spark, dir, dfCap = 1).count() == 0L)
  }

  test("substring dup coverage: overlapping spans merge, first occurrence never pays") {
    import spark.implicits._
    val dir = java.nio.file.Files.createTempDirectory("graft-spancov").toString
    val span = (1 to 20).map(i => s"shared$i").mkString(" ")
    val d1 = "alpha beta gamma " + span + " tail1 tail2" // first occurrence — keeps
    val d2 = "x1 x2 x3 x4 x5 " + span + " end"           // pays for the span vs d1
    val d4 = "y1 y2 " + span + " tail1 tail2"            // overlapping spans vs d1 AND d2
    Seq((1L, "en", "s", d1, d1.length.toLong), (2L, "en", "s", d2, d2.length.toLong),
        (4L, "en", "s", d4, d4.length.toLong))
      .toDF("doc_id", "lang", "source", "text", "n_chars")
      .coalesce(1).write.parquet(s"$dir/documents.parquet")
    val cov = NearDup.substringDupCoverage(spark, dir).collect()
      .map(r => r.getLong(0) -> ((r.getLong(1), r.getLong(2), r.getLong(3)))).toMap
    assert(!cov.contains(1L), "the lowest-id copy keeps all its spans")
    // d2 shares exactly the 20-token span with d1 (26 tokens total)
    assert(cov(2L) == ((1L, 20L, 26L)), s"d2 coverage: ${cov.get(2L)}")
    // d4 shares span+tail (22 tokens) with d1 and the bare span (20)
    // with d2 — the two overlapping intervals MERGE to one 22-token
    // island, not 42 double-counted tokens
    assert(cov(4L) == ((1L, 22L, 24L)), s"d4 merged coverage: ${cov.get(4L)}")
  }

  test("media near-dup: same-size local edit lands within the hamming radius") {
    import spark.implicits._
    val dir = java.nio.file.Files.createTempDirectory("graft-mediand").toString
    val base = ("the quick brown fox jumps over the lazy dog while a calm river " +
      "flows beside the old stone bridge in the quiet morning light of early june") * 2
    // same-LENGTH edit: a handful of characters replaced mid-payload —
    // the analogue of a local pixel edit on an equal-dimension image
    val edited = base.updated(40, 'X').updated(41, 'Y').updated(120, 'Z')
    val other = base.reverse // same length, totally different structure
    val rows = Seq(
      (3L, "en", "s", Some(base), base.length.toLong),      // image
      (4L, "en", "s", Some(base), base.length.toLong),      // audio — excluded
      (6L, "en", "s", Some(edited), edited.length.toLong),  // image, near-dup of 3
      (9L, "en", "s", Some(other), other.length.toLong),    // image, unrelated
      (12L, "en", "s", Option.empty[String], 0L),           // empty payloads:
      (15L, "en", "s", Option.empty[String], 0L))           //   identical media
    rows.toDF("doc_id", "lang", "source", "text", "n_chars")
      .coalesce(1).write.parquet(s"$dir/documents.parquet")
    val pairs = Multimodal.mediaNearDup(spark, dir).collect()
      .map(r => (r.getLong(0), r.getLong(1)) -> r.getLong(2)).toMap
    assert(pairs.contains((3L, 6L)), s"planted same-size edit must pair: $pairs")
    assert(pairs((3L, 6L)) > 0L, "an edited payload is near, not identical")
    assert(pairs.get((12L, 15L)).contains(0L), "empty payloads are identical media")
    assert(!pairs.keySet.exists(p => p._1 == 4L || p._2 == 4L), "audio rows excluded")
    assert(!pairs.contains((3L, 9L)) && !pairs.contains((6L, 9L)),
      s"an unrelated same-length payload stays out: $pairs")
  }

  test("fit-quality gates: every (method, invariant) verdict is ok") {
    val rows = graft.engine.FitGates.fitQualityGates(spark, sfDir, 7, 14).collect()
    assert(rows.length == graft.engine.FitGates.GatedMethods.length * 3,
      s"one verdict row per (method, invariant): ${rows.length}")
    val bad = rows.filterNot(_.getBoolean(1)).map(_.getString(0))
    assert(bad.isEmpty, s"failed invariants: ${bad.mkString(", ")}")
  }

  test("recall-gate verdict rows are all ok (the partial oracle holds)") {
    val rows = Similarity.recallGates(spark, sfDir).collect()
    assert(rows.map(_.getString(0)).toSeq ==
      Seq("ann_ivf_filtered_recall_at_5", "ann_ivf_range_recall",
        "ann_ivf_recall_at_5", "ann_lsh_recall_at_5",
        "ann_pq_filtered_recall_at_5", "ann_pq_recall_at_5",
        "minhash_component_recall"))
    rows.foreach(r => assert(r.getBoolean(2), s"${r.getString(0)} verdict false"))
  }

  test("filtered PQ search: k filled, in-pool, and agreeing with the exact filtered tier at full probes") {
    val labels = spark.read.parquet(s"$sfDir/embeddings.parquet")
      .filter(col("embedding").isNotNull)
      .select(col("vec_id"), col("label")).collect()
      .map(r => r.getLong(0) -> (if (r.isNullAt(1)) -1 else r.getInt(1))).toMap
    val pool = labels.filter(_._2 == 3).keySet
    val got = Similarity.ivfPqTopKFiltered(spark, sfDir, k = 5).collect()
      .map(r => (r.getLong(0), r.getLong(1), r.getLong(2)))
    val perQuery = got.groupBy(_._1)
    assert(perQuery.size == labels.size,
      s"every vector queries: ${perQuery.size} of ${labels.size}")
    perQuery.foreach { case (q, rows) =>
      assert(rows.length == 5, s"query $q under-filled: ${rows.length} of 5")
      rows.foreach { case (_, _, nb) =>
        assert(pool.contains(nb), s"query $q returned out-of-pool neighbor $nb")
        assert(nb != q, s"query $q returned itself")
      }
    }
    // at this scale the adaptive schedule probes every cell and the
    // rerank margin absorbs the quantization: strong agreement with
    // the exact filtered tier
    val exact = Similarity.cosineTopKFiltered(spark, sfDir, k = 5).collect()
      .map(r => (r.getLong(0), r.getLong(2))).toSet
    val gotPairs = got.map { case (q, _, nb) => (q, nb) }.toSet
    val agree = gotPairs.intersect(exact).size.toDouble / exact.size
    assert(agree >= 0.9, f"filtered PQ agreement $agree%.4f >= 0.9")
  }

  test("range search: exact tier equals brute force; IVF tier is precise and full-probe complete") {
    val vecs = spark.read.parquet(s"$sfDir/embeddings.parquet")
      .filter(col("embedding").isNotNull)
      .select(col("vec_id"), col("embedding")).collect()
      .map(r => r.getLong(0) -> r.getSeq[Float](1).map(_.toDouble).toArray).toMap
    def cos(a: Array[Double], b: Array[Double]): Double = {
      var dot = 0.0; var na = 0.0; var nb = 0.0; var i = 0
      val n = math.min(a.length, b.length)
      while (i < n) { dot += a(i) * b(i); na += a(i) * a(i); nb += b(i) * b(i); i += 1 }
      val d = math.sqrt(na) * math.sqrt(nb); if (d == 0.0) 0.0 else dot / d
    }
    val tau = 0.2
    val brute = (for {
      (q, qv) <- vecs.toSeq if q % 50 == 0
      (o, ov) <- vecs.toSeq if o != q
      s = cos(qv, ov) if s >= tau
    } yield (q, o)).toSet
    assert(brute.nonEmpty, "fixture must have in-radius pairs at tau = 0.2")
    val exact = Similarity.cosineRangeSearch(spark, sfDir).collect()
      .map(r => (r.getLong(0), r.getLong(1))).toSet
    assert(exact == brute,
      s"exact range == brute force: ${(brute -- exact).take(3)} missing, " +
        s"${(exact -- brute).take(3)} extra")
    // IVF tier: precision 1 by construction (exact filter on candidates)
    val ivf = Similarity.ivfRangeSearch(spark, sfDir).collect()
      .map(r => (r.getLong(0), r.getLong(1))).toSet
    assert(ivf.subsetOf(brute), s"IVF range must be precise: ${(ivf -- brute).take(3)}")
    // default probe schedule covers the shell at this scale
    assert(ivf.size >= math.ceil(brute.size * 0.9).toInt,
      s"default-probe shell recall >= 0.9: ${ivf.size} of ${brute.size}")
    // full probes enumerate the shell exactly (every pair meets in a cell)
    val full = Similarity.ivfRangeSearch(spark, sfDir, nprobe = 10000).collect()
      .map(r => (r.getLong(0), r.getLong(1))).toSet
    assert(full == brute,
      s"full-probe IVF range == exact: ${(brute -- full).take(3)} missing")
  }

  test("filtered ANN search: k stays filled under a selective pool predicate") {
    // the whole point of the filtered tier (round 15): post-filtering
    // an unfiltered top-k under-fills k when the predicate is
    // selective — the selectivity-adaptive probe schedule must not.
    // label = 3 keeps ~10% of the corpus; the pool still has >= k+1
    // members, so every query must return exactly k rows, every
    // returned neighbor must satisfy the predicate, and no query may
    // return itself.
    val labels = spark.read.parquet(s"$sfDir/embeddings.parquet")
      .filter(col("embedding").isNotNull)
      .select(col("vec_id"), col("label")).collect()
      .map(r => r.getLong(0) -> (if (r.isNullAt(1)) -1 else r.getInt(1))).toMap
    val pool = labels.filter(_._2 == 3).keySet
    assert(pool.size >= 6, s"fixture needs a pool of >= k+1: ${pool.size}")
    val got = Similarity.ivfTopKFiltered(spark, sfDir, k = 5).collect()
      .map(r => (r.getLong(0), r.getLong(1), r.getLong(2)))
    val perQuery = got.groupBy(_._1)
    assert(perQuery.size == labels.size,
      s"every vector queries: ${perQuery.size} of ${labels.size}")
    perQuery.foreach { case (q, rows) =>
      assert(rows.length == 5, s"query $q under-filled: ${rows.length} of 5")
      rows.foreach { case (_, _, nb) =>
        assert(pool.contains(nb), s"query $q returned out-of-pool neighbor $nb")
        assert(nb != q, s"query $q returned itself")
      }
    }
    // and the filtered results agree with the exact filtered tier at
    // this scale (the adaptive schedule probes every cell here, so the
    // candidate set IS the filtered pool — recall must be 1.0)
    val exact = Similarity.cosineTopKFiltered(spark, sfDir, k = 5).collect()
      .map(r => (r.getLong(0), r.getLong(2))).toSet
    val gotPairs = got.map { case (q, _, nb) => (q, nb) }.toSet
    assert(gotPairs == exact,
      s"full-probe filtered IVF must equal the exact filtered tier: " +
        s"${(exact -- gotPairs).take(3)} missing, ${(gotPairs -- exact).take(3)} extra")
  }

  test("semantic dedup IVF agreement holds at sf0.1 (more cells, tighter blocking)") {
    // the sf0.001 gate sees 22 cells; at sf0.1 the auto quantizer
    // allocates ~63 probed cells over 2000 vectors — the regime where
    // cell blocking could silently shed cross-cell edges (the same
    // only-visible-at-scale class as the IVF recall and LSH salt bugs)
    val dir = "/root/testdata/sf0.1"
    assume(new java.io.File(dir).isDirectory, s"$dir not generated")
    val exact = graft.ops.Dedup.semanticDedup(spark, dir).collect()
    val keepExact = exact.filter(_.getBoolean(3)).map(_.getLong(0)).toSet
    // shipped defaults (nprobe=4): the measured-at-scale choice — 2
    // probes read 0.71 here while the sf0.001 gate read 0.96
    val ivf = graft.ops.Dedup.semanticDedupIvf(spark, dir).collect()
    val keepIvf = ivf.filter(_.getBoolean(3)).map(_.getLong(0)).toSet
    val agreement = keepExact.intersect(keepIvf).size.toDouble /
      math.max(keepExact.union(keepIvf).size, 1)
    info(f"sf0.1 keep-set Jaccard agreement $agreement%.4f " +
      s"(exact keeps ${keepExact.size}, ivf keeps ${keepIvf.size})")
    assert(agreement >= 0.9,
      f"cell blocking must hold at the scale where cells multiply: $agreement%.4f")
  }

  test("recall-gate verdicts hold at sf0.1 (cap-splitting scale)") {
    // the bench runs this query at sf0.1; a verdict that silently reads
    // false there would make the registered gate misleading even though
    // only sf0.01 is hash-checked — so pin the large-scale behavior too
    val dir = "/root/testdata/sf0.1"
    assume(new java.io.File(dir).isDirectory, s"$dir not generated")
    val rows = Similarity.recallGates(spark, dir).collect()
    rows.foreach(r => assert(r.getBoolean(2), s"${r.getString(0)} verdict false at sf0.1"))
  }

  test("winnow overlap finds a planted shared substring and ignores hot windows") {
    import spark.implicits._
    val dir = java.nio.file.Files.createTempDirectory("graft-winnow").toString
    val shared = "the migration of the monarch butterflies crosses three thousand " +
      "kilometers of open country every autumn without a single rest day"
    val docA = s"report one begins here $shared and then concludes alpha"
    val docB = s"totally different preamble text $shared with another ending beta"
    val docC = "unrelated prose about submarine cables and their repair ships in rough seas"
    // 100 copies of one viral text: every sketch hash has df=100 > maxDf,
    // so the guard must drop them all — no c² pair explosion, no pairs
    val viral = (100L until 200L).map(i =>
      (i, "en", "s", "breaking news everyone please share this exact message now", 60L))
    val rows = Seq((1L, "en", "s", docA, docA.length.toLong),
      (2L, "en", "s", docB, docB.length.toLong),
      (3L, "en", "s", docC, docC.length.toLong)) ++ viral
    rows.toDF("doc_id", "lang", "source", "text", "n_chars")
      .coalesce(1).write.parquet(s"$dir/documents.parquet")
    val pairs = graft.ops.TextAnalysis.winnowOverlap(spark, dir).collect()
      .map(r => (r.getLong(0), r.getLong(1)) -> r.getLong(2)).toMap
    assert(pairs.contains((1L, 2L)),
      s"planted shared substring must surface the (1,2) pair; got ${pairs.keys.toSeq.sorted}")
    assert(pairs((1L, 2L)) >= 2, "the shared run must dominate both bottom-k sketches")
    assert(!pairs.keys.exists { case (a, b) => a == 3L || b == 3L },
      "the unrelated document shares no slots")
    assert(!pairs.keys.exists { case (a, b) => a >= 100L || b >= 100L },
      "df-capped hashes must not pair the viral copies")
    // the substring decontamination tier: exactly the overlap pairs
    // whose endpoints hash into different splits
    val leak = graft.ops.Curation.splitSubstringLeakage(spark, dir).collect()
    leak.foreach { r =>
      assert(r.getString(2) != r.getString(3), "leakage rows must cross splits")
      assert(pairs.contains((r.getLong(0), r.getLong(1))),
        "leakage rows must be winnow-overlap pairs")
    }
  }

  test("semantic dedup: components of the cosine graph, one representative each") {
    val rows = graft.ops.Dedup.semanticDedup(spark, sfDir).collect()
    assert(rows.nonEmpty)
    // partition properties: cluster_id is the member min, sizes agree,
    // exactly one keep per cluster and it is the representative
    val byCluster = rows.groupBy(_.getLong(1))
    byCluster.foreach { case (cid, ms) =>
      assert(ms.map(_.getLong(0)).min == cid, s"cluster $cid id must be the member min")
      ms.foreach { r =>
        assert(r.getLong(2) == ms.length, s"cluster $cid size mismatch")
        assert(r.getBoolean(3) == (r.getLong(0) == cid), "keep iff representative")
      }
    }
    assert(byCluster.values.exists(_.length > 1),
      "fixture corpus must contain at least one multi-member semantic component")
    // labels must equal a brute-force union-find over the exact
    // UNBLOCKED cosine edge set, computed here from first principles
    val vecs = spark.read.parquet(s"$sfDir/embeddings.parquet")
      .select("vec_id", "embedding").collect()
      .map(r => r.getLong(0) -> r.getSeq[Float](1).map(_.toDouble).toArray)
      .sortBy(_._1)
    def cos(x: Array[Double], y: Array[Double]): Double = {
      var (d, nx, ny, i) = (0.0, 0.0, 0.0, 0)
      while (i < x.length) { d += x(i) * y(i); nx += x(i) * x(i); ny += y(i) * y(i); i += 1 }
      val den = math.sqrt(nx) * math.sqrt(ny)
      if (den == 0) 0.0 else d / den
    }
    val edges = for {
      i <- vecs.indices
      j <- (i + 1) until vecs.length
      if BigDecimal(cos(vecs(i)._2, vecs(j)._2)).setScale(4, BigDecimal.RoundingMode.HALF_UP) >= 0.40
    } yield (vecs(i)._1, vecs(j)._1)
    val parent = scala.collection.mutable.Map[Long, Long]()
    def find(x: Long): Long = {
      val p = parent.getOrElse(x, x)
      if (p == x) x else { val r = find(p); parent(x) = r; r }
    }
    edges.foreach { case (a, b) =>
      val (ra, rb) = (find(a), find(b))
      if (ra != rb) parent(math.max(ra, rb)) = math.min(ra, rb)
    }
    rows.foreach { r =>
      assert(find(r.getLong(0)) == r.getLong(1),
        s"vec ${r.getLong(0)}: starContract label ${r.getLong(1)} != union-find ${find(r.getLong(0))}")
    }
    info(s"${byCluster.size} components over ${rows.length} vectors, " +
      s"${rows.count(_.getBoolean(3))} kept")
  }

  test("IVF-cell-blocked semantic dedup agrees with the exact unblocked path") {
    val exact = graft.ops.Dedup.semanticDedup(spark, sfDir).collect()
    val ivf = graft.ops.Dedup.semanticDedupIvf(spark, sfDir).collect()
    assert(ivf.length == exact.length, "both paths label every vector")
    val keepExact = exact.filter(_.getBoolean(3)).map(_.getLong(0)).toSet
    val keepIvf = ivf.filter(_.getBoolean(3)).map(_.getLong(0)).toSet
    val agreement = keepExact.intersect(keepIvf).size.toDouble /
      math.max(keepExact.union(keepIvf).size, 1)
    info(f"keep-set Jaccard agreement $agreement%.4f " +
      s"(exact keeps ${keepExact.size}, ivf keeps ${keepIvf.size})")
    assert(agreement >= 0.9,
      f"unsupervised-cell blocking must recover the labeled blocking: $agreement%.4f")
  }

  test("curation funnel: stages monotone, endpoints match raw corpus and curated keep-set") {
    val f = graft.ops.Dedup.curationFunnel(spark, sfDir).collect()
      .map(r => (r.getLong(0), r.getString(1), r.getLong(2), r.getLong(3))).sortBy(_._1)
    assert(f.map(_._2).toSeq == Seq("raw", "quality", "pii_clean", "dedup_rep"))
    f.sliding(2).foreach { case Array(a, b) =>
      assert(b._3 <= a._3 && b._4 <= a._4, s"funnel not monotone: $a -> $b")
    }
    val nDocs = spark.read.parquet(s"$sfDir/documents.parquet").count()
    assert(f(0)._3 == nDocs, "stage 1 must count the raw corpus")
    val curated = graft.ops.Dedup.curateCorpus(spark, sfDir).count()
    assert(f(3)._3 == curated, "final stage must equal the curate_corpus keep-set")
    // an empty corpus still reports the full 4-row funnel, all zeros
    val dir = java.nio.file.Files.createTempDirectory("graft-funnel-empty").toString
    import spark.implicits._
    Seq.empty[(Long, String, String, String, Long)]
      .toDF("doc_id", "lang", "source", "text", "n_chars")
      .write.parquet(s"$dir/documents.parquet")
    val empty = graft.ops.Dedup.curationFunnel(spark, dir).collect()
    assert(empty.length == 4 && empty.forall(r => r.getLong(2) == 0L && r.getLong(3) == 0L))
  }

  test("vocab coverage: contiguous ranks, monotone counts and cumulative share") {
    // k larger than the sf0.001 vocabulary (31 types): the head is the
    // WHOLE vocabulary and cumulative coverage must close at exactly 1
    val rows = graft.ops.TextAnalysis.vocabCoverage(spark, sfDir, k = 50).collect()
    assert(rows.nonEmpty && rows.length <= 50)
    assert(rows.map(_.getLong(0)).toSeq == (1L to rows.length.toLong))
    if (rows.length < 50)
      assert(math.abs(rows.last.getDouble(4) - 1.0) < 1e-12,
        "a head covering the whole vocabulary must sum to share 1")
    rows.map(_.getLong(2)).sliding(2).foreach { case Array(a, b) =>
      assert(b <= a, "counts must be non-increasing down the ranking")
    }
    val shares = rows.map(_.getDouble(3))
    val cums = rows.map(_.getDouble(4))
    assert(math.abs(shares.sum - cums.last) < 1e-9,
      "cumulative share must equal the sum of the head's shares")
    cums.sliding(2).foreach { case Array(a, b) => assert(b > a) }
    assert(cums.last <= 1.0 + 1e-12 && cums.last > 0.1,
      s"a 50-type head should cover a meaningful slice, got ${cums.last}")
  }

  test("embedding dim stats: exact moments on a constructed fixture, nulls ignored") {
    import spark.implicits._
    val dir = java.nio.file.Files.createTempDirectory("graft-dimstats").toString
    // dim 0: values 1,2,3 -> mean 2, population std sqrt(2/3), min 1 max 3;
    // dim 1: constant 5 -> std exactly 0; the null row must not count
    Seq((1L, Option(Seq(1.0f, 5.0f)), 0), (2L, Option(Seq(2.0f, 5.0f)), 0),
        (3L, Option(Seq(3.0f, 5.0f)), 0), (4L, Option.empty[Seq[Float]], 1))
      .toDF("vec_id", "embedding", "label")
      .coalesce(1).write.parquet(s"$dir/embeddings.parquet")
    val rows = Similarity.embeddingDimStats(spark, dir).collect()
    assert(rows.length == 2)
    val d0 = rows.find(_.getLong(0) == 0L).get
    assert(d0.getLong(1) == 3L, "null embedding must be excluded from n")
    assert(math.abs(d0.getDouble(2) - 2.0) < 1e-9)
    assert(math.abs(d0.getDouble(3) - math.sqrt(2.0 / 3.0)) < 1e-6)
    assert(d0.getDouble(4) == 1.0 && d0.getDouble(5) == 3.0)
    val d1 = rows.find(_.getLong(0) == 1L).get
    assert(d1.getDouble(3) == 0.0 && math.abs(d1.getDouble(2) - 5.0) < 1e-9)
  }

  test("every document operator tolerates an empty corpus") {
    import spark.implicits._
    val dir = java.nio.file.Files.createTempDirectory("graft-empty").toString
    Seq.empty[(Long, String, String, String, Long)]
      .toDF("doc_id", "lang", "source", "text", "n_chars")
      .write.parquet(s"$dir/documents.parquet")
    val ops: Seq[(String, () => Long)] = Seq(
      "dedup_exact" -> (() => graft.ops.Dedup.exact(spark, dir).count()),
      "dedup_fp" -> (() => graft.ops.Dedup.exactByFingerprint(spark, dir).count()),
      "dup_groups" -> (() => graft.ops.Dedup.duplicateGroups(spark, dir).count()),
      "dup_clusters" -> (() => graft.ops.Dedup.dupClusters(spark, dir).count()),
      "curate" -> (() => graft.ops.Dedup.curateCorpus(spark, dir).count()),
      "jaccard" -> (() => NearDup.blockedJaccard(spark, dir, 0.9).count()),
      "minhash" -> (() => NearDup.minhashCandidates(spark, dir).count()),
      "simhash" -> (() => NearDup.simhash(spark, dir).count()),
      "split" -> (() => graft.ops.Curation.corpusSplit(spark, dir).count()),
      "leakage" -> (() => graft.ops.Curation.splitLeakage(spark, dir).count()),
      "repetition" -> (() => graft.ops.Curation.repetitionStats(spark, dir).count()),
      "mixture" -> (() => graft.ops.Curation.corpusMixture(spark, dir).count()),
      "overlap" -> (() => graft.ops.Curation.sourceOverlap(spark, dir).count()),
      "quality" -> (() => graft.ops.TextAnalysis.qualityScore(spark, dir).count()),
      "pii" -> (() => graft.ops.TextAnalysis.piiScan(spark, dir).count()),
      "tfidf" -> (() => graft.ops.TextAnalysis.tfidfTopTerms(spark, dir).count()),
      "bm25" -> (() => graft.ops.TextAnalysis.bm25Search(spark, dir).count()),
      "winnow" -> (() => graft.ops.TextAnalysis.winnowFingerprints(spark, dir).count()),
      "winnow_overlap" -> (() => graft.ops.TextAnalysis.winnowOverlap(spark, dir).count()),
      "quality_model" -> (() => graft.ops.QualityModel.modelScores(spark, dir).count()),
      "perplexity" -> (() => graft.ops.TextAnalysis.docPerplexity(spark, dir).count()),
      "substr_leakage" -> (() => graft.ops.Curation.splitSubstringLeakage(spark, dir).count()),
      "chunks" -> (() => graft.ops.TextAnalysis.docChunks(spark, dir).count()),
      "resize" -> (() => Multimodal.mediaResize(spark, dir).count()),
      "frames" -> (() => Multimodal.frameSample(spark, dir).count()),
      "manifest" -> (() => graft.ops.Curation.trainingManifest(spark, dir).count()),
      "resample" -> (() => graft.ops.Curation.corpusResample(spark, dir).count()),
      "pack" -> (() => graft.ops.Curation.packSequences(spark, dir).count()),
      "pack_eff" -> (() => graft.ops.Curation.packEfficiency(spark, dir).count()),
      "substring_dedup" -> (() => NearDup.substringSpans(spark, dir).count()),
      "dedup_increment" -> (() => graft.ops.Dedup.dedupIncrement(spark, dir).count()),
      "media_near_dup" -> (() => Multimodal.mediaNearDup(spark, dir).count()))
    ops.foreach { case (name, run) =>
      val n = try run() catch {
        case e: Throwable => fail(s"$name threw on an empty corpus: $e")
      }
      assert(n == 0L, s"$name returned $n rows from an empty corpus")
    }
  }

  test("null text and null lang rows flow through every document operator") {
    // real feeds ship null fields; nothing may crash, and null-text
    // rows must not silently vanish from per-document outputs
    import spark.implicits._
    val dir = java.nio.file.Files.createTempDirectory("graft-null").toString
    val good = "the quick brown fox and the lazy dog sit on the hill with a friend " * 10
    Seq((1L, Some("en"), Some("s"), Some(good), Some(good.length.toLong)),
        (2L, Some("en"), Some("s"), None, None),           // null text
        (3L, None, None, Some(good + " twice"), Some(good.length + 6L)))  // null lang/source
      .toDF("doc_id", "lang", "source", "text", "n_chars")
      .coalesce(1).write.parquet(s"$dir/documents.parquet")
    val perDoc: Seq[(String, () => Long)] = Seq(
      "quality_score" -> (() => graft.ops.TextAnalysis.qualityScore(spark, dir).count()),
      "text_stats" -> (() => graft.ops.TextAnalysis.textStats(spark, dir).count()),
      "token_counts" -> (() => graft.ops.TextAnalysis.tokenCounts(spark, dir).count()),
      "lang_id" -> (() => graft.ops.TextAnalysis.langId(spark, dir).count()),
      "pii_scan" -> (() => graft.ops.TextAnalysis.piiScan(spark, dir).count()),
      "fingerprints" -> (() => graft.ops.TextAnalysis.fingerprints(spark, dir).count()),
      "encoding_quality" -> (() => graft.ops.TextAnalysis.encodingQuality(spark, dir).count()),
      "corpus_split" -> (() => graft.ops.Curation.corpusSplit(spark, dir).count()))
    perDoc.foreach { case (name, run) =>
      val n = try run() catch {
        case e: Throwable => fail(s"$name threw on null fields: $e")
      }
      info(s"$name: $n rows of 3")
    }
    // the non-per-doc ops must at least not crash
    Seq(
      "dedup_exact" -> (() => graft.ops.Dedup.exact(spark, dir).count()),
      "dedup_fp" -> (() => graft.ops.Dedup.exactByFingerprint(spark, dir).count()),
      "dup_clusters" -> (() => graft.ops.Dedup.dupClusters(spark, dir).count()),
      "curate" -> (() => graft.ops.Dedup.curateCorpus(spark, dir).count()),
      "winnow" -> (() => graft.ops.TextAnalysis.winnowFingerprints(spark, dir).count()),
      "winnow_overlap" -> (() => graft.ops.TextAnalysis.winnowOverlap(spark, dir).count()),
      "perplexity" -> (() => graft.ops.TextAnalysis.docPerplexity(spark, dir).count()),
      "chunks" -> (() => graft.ops.TextAnalysis.docChunks(spark, dir).count()),
      "repetition" -> (() => graft.ops.Curation.repetitionStats(spark, dir).count()),
      "mixture" -> (() => graft.ops.Curation.corpusMixture(spark, dir).count()),
      "resample" -> (() => graft.ops.Curation.corpusResample(spark, dir).count()),
      "pack" -> (() => graft.ops.Curation.packSequences(spark, dir).count()),
      "pack_eff" -> (() => graft.ops.Curation.packEfficiency(spark, dir).count()),
      "manifest" -> (() => graft.ops.Curation.trainingManifest(spark, dir).count()),
      "overlap" -> (() => graft.ops.Curation.sourceOverlap(spark, dir).count()),
      "media" -> (() => Multimodal.mediaFeatures(spark, dir).count()),
      "media_near_dup" -> (() => Multimodal.mediaNearDup(spark, dir).count()),
      "substring_dedup" -> (() => NearDup.substringSpans(spark, dir).count()),
      "dedup_increment" -> (() => graft.ops.Dedup.dedupIncrement(spark, dir).count()),
      "funnel" -> (() => graft.ops.Dedup.curationFunnel(spark, dir).count()),
      "vocab" -> (() => graft.ops.TextAnalysis.vocabCoverage(spark, dir).count()),
      // null text drops out of tf but still counts toward N/avgdl —
      // identical on both engines (count(*) vs null-skipping sum)
      "bm25" -> (() => graft.ops.TextAnalysis.bm25Search(spark, dir).count()),
      // round-10 document operators join the sweep
      "term_zipf" -> (() => graft.ops.TextAnalysis.termZipf(spark, dir).count()),
      "vocab_oov" -> (() => graft.ops.TextAnalysis.vocabOovRate(spark, dir).count()),
      "lang_mismatch" -> (() => graft.ops.TextAnalysis.langMismatch(spark, dir).count()),
      "shard_plan" -> (() => graft.ops.Curation.corpusShardPlan(spark, dir).count()),
      "cross_source_dups" -> (() => graft.ops.Dedup.crossSourceDupMatrix(spark, dir).count()),
      "fuzzy_contamination" -> (() => graft.ops.Curation.evalContaminationFuzzy(spark, dir).count()),
      // shuffle-economy-tier document operators join the sweep (all
      // three coalesce null text to '' before tokenizing/scoring)
      "char_entropy" -> (() => graft.ops.ScalePatterns.charEntropy(spark, dir).count()),
      "phrase_search" -> (() => graft.ops.TextAnalysis.phraseSearch(spark, dir).count()),
      "token_pmi" -> (() => graft.ops.TextAnalysis.tokenPmi(spark, dir).count()),
      "tfidf_cosine_pairs" -> (() => NearDup.tfidfCosinePairs(spark, dir).count()),
      "lang_confusion" -> (() => graft.ops.TextAnalysis.langConfusion(spark, dir).count()),
      "bpe_merges" -> (() => graft.ops.Bpe.bpeMerges(spark, dir).count())
    ).foreach { case (name, run) =>
      try run() catch {
        case e: Throwable => fail(s"$name threw on null fields: $e")
      }
    }
  }

  test("a null text row flows through the quality-model fit and scorers") {
    // the round-8 null campaign missed quality_model: RegexTokenizer's
    // UDF NPEs on null text, so a real feed with one null row crashed
    // quality_model_scores (and the streaming scorer). The corpus here
    // is built so the weak labels span both classes with overwhelming
    // hash-split probability, forcing a real fit + full-corpus featurize.
    import spark.implicits._
    val dir = java.nio.file.Files.createTempDirectory("graft-nullqm").toString
    val good = "the quick brown fox and the lazy dog sit on the hill with a friend " * 10
    val junk = "!!! ### $$$ %%% ^^^ &&& *** ((( )))"
    val rows = (0L until 10L).map(i => (i, "en", "s", Some(good + s" variant $i"), 700L)) ++
      (10L until 20L).map(i => (i, "en", "s", Some(junk + s" $i"), 40L)) :+
      ((99L, "en", "s", Option.empty[String], 0L))
    rows.toDF("doc_id", "lang", "source", "text", "n_chars")
      .coalesce(1).write.parquet(s"$dir/documents.parquet")
    val scored = graft.ops.QualityModel.modelScores(spark, dir).collect()
    assert(scored.length == 21, s"every document (incl. the null-text row) scores: ${scored.length}")
    val nullRow = scored.filter(_.getLong(0) == 99L)
    assert(nullRow.length == 1 && !nullRow.head.isNullAt(1),
      "the null-text row gets a real probability (empty bag of words)")
    assert(!nullRow.head.getBoolean(3), "a null-text row is never in the fit split")
    // the serving path shares featurize — must survive the same feed
    assert(graft.ops.QualityModel.scoreStream(spark, dir,
      spark.read.parquet(s"$dir/documents.parquet")).count() == 21L)
  }

  test("null embedding rows flow through every vector operator") {
    import spark.implicits._
    val dir = java.nio.file.Files.createTempDirectory("graft-nullvec").toString
    val rng = new scala.util.Random(13L)
    val ok = (0L until 40L).map(i => (i, (i % 2).toInt,
      Some(Array.fill(8)(rng.nextGaussian().toFloat))))
    val nullRow = (99L, 0, Option.empty[Array[Float]])
    (ok :+ nullRow).toDF("vec_id", "label", "embedding")
      .coalesce(1).write.parquet(s"$dir/embeddings.parquet")
    Seq(
      "cosine_topk" -> (() => Similarity.cosineTopK(spark, dir, 3).count()),
      "lsh_topk" -> (() => Similarity.lshTopK(spark, dir, 3).count()),
      "ivf_topk" -> (() => Similarity.ivfTopK(spark, dir, 3).count()),
      "embedding_stats" -> (() => Similarity.embeddingStats(spark, dir).count()),
      "quantize" -> (() => Similarity.quantizeStats(spark, dir).count()),
      "residual_quantize" -> (() => Similarity.residualQuantizeStats(spark, dir).count()),
      "ivf_pq_topk" -> (() => Similarity.ivfPqTopK(spark, dir, 3).count()),
      "outliers" -> (() => Similarity.embeddingOutliers(spark, dir).count()),
      "semantic" -> (() => graft.ops.Dedup.semanticDedup(spark, dir).count()),
      "semantic_ivf" -> (() => graft.ops.Dedup.semanticDedupIvf(spark, dir).count()),
      "near_dup" -> (() => NearDup.embeddingNearDup(spark, dir).count()),
      "dim_stats" -> (() => Similarity.embeddingDimStats(spark, dir).count()),
      "spectrum" -> (() => Similarity.embeddingSpectrum(spark, dir).count()),
      "whiten" -> (() => Similarity.embeddingWhiten(spark, dir).count()),
      "knn_accuracy" -> (() => Similarity.labelKnnAccuracy(spark, dir).count())
    ).foreach { case (name, run) =>
      try run() catch {
        case e: Throwable => fail(s"$name threw on a null embedding: $e")
      }
    }
    // events with a null value/user must not break the fit path or the
    // relational aggregates (null observations are not observations)
    val edir = java.nio.file.Files.createTempDirectory("graft-nullev").toString
    val t0 = 86400000L * 19000
    (0 until 30).map { i =>
      (new java.sql.Timestamp(t0 + i * 3600000L), "purchase", i.toLong,
        if (i % 7 == 3) None else Some(100L + i),
        if (i % 5 == 2) Option.empty[Double] else Some(10.0 + i), """{"k":"v"}""")
    }.toDF("ts", "event_type", "event_id", "user_id", "value", "props")
      .coalesce(1).write.parquet(s"$edir/events.parquet")
    Seq(
      "fc_naive" -> (() => SparkEntry.queries("fc_naive")(spark, edir).count()),
      "user_activity" -> (() => SparkEntry.queries("user_activity")(spark, edir).count()),
      "value_quantiles" -> (() => SparkEntry.queries("value_quantiles")(spark, edir).count()),
      "user_sessions" -> (() => Relational.userSessions(spark, edir).count()),
      "stream_sessions" -> (() => EventIngest.sessionsAvailableNow(spark, edir).count()),
      "user_retention" -> (() => graft.ops.EventAnalytics.userRetention(spark, edir).count()),
      "event_funnel" -> (() => graft.ops.EventAnalytics.eventFunnel(spark, edir).count()),
      "rolling_active_users" -> (() => graft.ops.EventAnalytics.rollingActiveUsers(spark, edir).count()),
      "ewma_anomalies" -> (() => graft.ops.EventAnalytics.ewmaAnomalies(spark, edir).count()),
      // round-9-late event operators join the sweep
      "cusum_shifts" -> (() => graft.ops.EventAnalytics.cusumShifts(spark, edir).count()),
      "mad_anomalies" -> (() => graft.ops.EventAnalytics.madAnomalies(spark, edir).count()),
      "value_winsorize" -> (() => graft.ops.EventAnalytics.valueWinsorize(spark, edir).count()),
      "daily_value_percentiles" -> (() =>
        graft.ops.EventAnalytics.dailyValuePercentiles(spark, edir).count()),
      "event_transitions" -> (() => graft.ops.EventAnalytics.eventTransitions(spark, edir).count()),
      "user_churn" -> (() => graft.ops.EventAnalytics.userChurn(spark, edir).count()),
      "fc_croston" -> (() => graft.models.Croston.forecast(spark, edir).count()),
      "fc_croston_tsb" -> (() => graft.models.Croston.forecastTsb(spark, edir).count()),
      "fc_conformal_all" -> (() => graft.engine.Conformal.conformalAll(spark, edir).count()),
      "demand_classes" -> (() => graft.ops.EventAnalytics.demandClasses(spark, edir).count()),
      "stream_attribution" -> (() =>
        EventIngest.attributionPairsAvailableNow(spark, edir).count()),
      // round-10 event operators join the sweep
      "value_psi" -> (() => graft.ops.EventAnalytics.valuePsi(spark, edir).count()),
      "shesd" -> (() => graft.ops.EventAnalytics.shEsdAnomalies(spark, edir).count()),
      "weekday_profile" -> (() => graft.ops.EventAnalytics.weekdayProfile(spark, edir).count()),
      "linear_attribution" -> (() =>
        graft.ops.EventAnalytics.linearAttribution(spark, edir).count()),
      "stream_heavy_hitters" -> (() =>
        EventIngest.heavyHitterStreamAvailableNow(spark, edir).count()),
      // round-9-closing operators join the sweep
      "fc_conformal" -> (() => graft.engine.Conformal.conformalNaive(spark, edir).count()),
      "fc_hierarchical" -> (() => graft.engine.Conformal.hierarchicalDrift(spark, edir).count()),
      "chi2_drift" -> (() => graft.ops.EventAnalytics.chi2Drift(spark, edir).count()),
      "ks_drift" -> (() => graft.ops.EventAnalytics.ksDrift(spark, edir).count()),
      "rank_drift" -> (() => graft.ops.EventAnalytics.rankDrift(spark, edir).count()),
      "fc_ensemble" -> (() => graft.engine.Backtest.ensembleForecast(spark, edir).count()),
      "stream_drift" -> (() => EventIngest.driftMonitorAvailableNow(spark, edir).count()),
      // shuffle-economy-tier event operators join the sweep
      "twap_daily" -> (() => graft.ops.EventAnalytics.twapDaily(spark, edir).count()),
      "dominant_period" -> (() =>
        graft.ops.EventAnalytics.dominantPeriod(spark, edir).count()),
      "transition_stationary" -> (() =>
        graft.ops.EventAnalytics.transitionStationary(spark, edir).count()),
      "user_cadence" -> (() => graft.ops.EventAnalytics.userCadence(spark, edir).count()),
      "rolling_mau_sketch" -> (() =>
        graft.ops.EventAnalytics.rollingMauSketch(spark, edir).count())
    ).foreach { case (name, run) =>
      try run() catch {
        case e: Throwable => fail(s"$name threw on null event fields: $e")
      }
    }
  }

  test("conformal naive: linear series collapses both bands to ±h; bands nest on real data") {
    import spark.implicits._
    // strictly linear series: every |h-step error| equals h·slope, so the
    // conformal quantile at ANY coverage is exactly h·slope — the band is
    // point ± h·slope and the 80/95 bands coincide. Pins the rank
    // selection (a rank off by one would still land on the same value
    // only here; the real-data nesting check below catches direction).
    val dir = java.nio.file.Files.createTempDirectory("graft-conf").toString
    val t0 = 86400000L * 19000
    (0 until 40).map(i => (new java.sql.Timestamp(t0 + i * 3600000L), "lin",
        i.toLong, Option(1L), Some(5.0 + 3.0 * i), "{}"))
      .toDF("ts", "event_type", "event_id", "user_id", "value", "props")
      .coalesce(1).write.parquet(s"$dir/events.parquet")
    val rows = graft.engine.Conformal.conformalNaive(spark, dir).collect()
    assert(rows.length == 14, s"14 steps expected, got ${rows.length}")
    rows.foreach { r =>
      val (step, l1, l2, m, u1, u2) = (r.getLong(2), r.getDouble(3), r.getDouble(4),
        r.getDouble(5), r.getDouble(6), r.getDouble(7))
      val last = 5.0 + 3.0 * 39
      assert(m == last, s"point forecast must be the last value, got $m")
      assert(l1 == last - 3.0 * step && l2 == l1 && u1 == last + 3.0 * step && u2 == u1,
        s"linear series: band must be ±${3 * step} at step $step, got [$l1,$l2,$u1,$u2]")
    }
    // real corpus: 95% band must contain the 80% band, both contain the point
    graft.engine.Conformal.conformalNaive(spark, sfDir).collect().foreach { r =>
      val (l1, l2, m, u1, u2) = (r.getDouble(3), r.getDouble(4), r.getDouble(5),
        r.getDouble(6), r.getDouble(7))
      assert(l2 <= l1 && l1 <= m && m <= u1 && u1 <= u2,
        s"band nesting violated: $l2 $l1 $m $u1 $u2")
    }
  }

  test("conformal fit families: full method-step grid, nested finite bands, centers equal the full fits") {
    val rows = graft.engine.Conformal.conformalFit(spark, sfDir).collect()
    assert(rows.nonEmpty, "conformalFit produced no bands on the store")
    val byElM = rows.groupBy(r => (r.getString(0), r.getString(1)))
    val methods = rows.map(_.getString(1)).distinct.sorted
    assert(methods.toSeq == Seq("CONFORMAL_ARIMA", "CONFORMAL_ETS", "CONFORMAL_THETA"),
      s"methods: ${methods.toSeq}")
    byElM.foreach { case ((el, m), rs) =>
      assert(rs.map(_.getLong(2)).sorted.toSeq == (1L to 14L).toSeq,
        s"($el, $m): steps ${rs.map(_.getLong(2)).sorted.toSeq}")
    }
    rows.foreach { r =>
      val vals = (3 to 7).map(r.getDouble)
      assert(vals.forall(java.lang.Double.isFinite), s"non-finite band: $r")
      val Seq(l1, l2, m, u1, u2) = vals
      assert(l2 <= l1 && l1 <= m && m <= u1 && u1 <= u2,
        s"band nesting violated: $r")
    }
    // the band CENTER is the family's own full-series point forecast
    // (on the FitSliceLen trailing window the refit loop uses)
    val series = graft.sources.SeriesStore.series(spark, sfDir).collect()
    val s0 = series.minBy(_.element)
    val v = s0.values.takeRight(graft.engine.Conformal.FitSliceLen)
    for (m <- Seq(graft.core.Methods.ARIMA, graft.core.Methods.ETS, graft.core.Methods.THETA)) {
      val want = graft.engine.Families.byMethod(m).fit(v, 7).forecast(14).mean
        .map(x => java.math.BigDecimal.valueOf(x)
          .setScale(6, java.math.RoundingMode.HALF_UP).doubleValue())
      val got = rows.filter(r => r.getString(0) == s0.element &&
          r.getString(1) == s"CONFORMAL_$m")
        .sortBy(_.getLong(2)).map(_.getDouble(5))
      assert(got.toSeq == want.toSeq,
        s"${s0.element}/$m center mismatch: ${got.toSeq} vs ${want.toSeq}")
    }
  }

  test("conformal ext + coverage gates: all ten reference methods banded, every gate ok") {
    // the extension surface carries exactly the seven non-fc_conformal_fit
    // reference methods, full step grids, nested finite bands
    val ext = graft.engine.Conformal.conformalFitExt(spark, sfDir).collect()
    val extMethods = ext.map(_.getString(1)).distinct.sorted.toSeq
    assert(extMethods == Seq("CONFORMAL_ARIMA_FORCE_SEASONALITY",
      "CONFORMAL_BAGGEDETS", "CONFORMAL_ETSDAMPED", "CONFORMAL_HYBRID",
      "CONFORMAL_NN", "CONFORMAL_PROPHET", "CONFORMAL_STL"), s"methods: $extMethods")
    ext.groupBy(r => (r.getString(0), r.getString(1))).foreach { case ((el, m), rs) =>
      assert(rs.map(_.getLong(2)).sorted.toSeq == (1L to 14L).toSeq,
        s"($el, $m): steps ${rs.map(_.getLong(2)).sorted.toSeq}")
    }
    ext.foreach { r =>
      val vals = (3 to 7).map(r.getDouble)
      assert(vals.forall(java.lang.Double.isFinite), s"non-finite band: $r")
      val Seq(l1, l2, m, u1, u2) = vals
      assert(l2 <= l1 && l1 <= m && m <= u1 && u1 <= u2, s"band nesting violated: $r")
    }
    // the driver-facing verdict: 10 methods x 2 bands + the
    // completeness row, every ok TRUE on the real store
    val gates = graft.engine.Conformal.conformalCoverageGates(spark, sfDir).collect()
      .map(r => r.getString(0) -> r.getBoolean(1))
    assert(gates.length == 21, s"gate rows: ${gates.length}")
    assert(gates.map(_._1).sorted.toSeq ==
      graft.engine.Conformal.CoverageGateMetrics.sorted, "metric list drift")
    val bad = gates.filter(!_._2)
    assert(bad.isEmpty, s"coverage gates failing: ${bad.map(_._1).toSeq}")
  }

  test("closedBands: freq >= n omits SNAIVE instead of indexing an empty score array") {
    // every seasonal lag falls before the series start -> zero SNAIVE
    // scores; the family must be skipped (mirroring the oracle's inner
    // join), not crash on scores(-1)
    val v = Array.tabulate(40)(i => 10.0 + i)
    val bands = graft.engine.Conformal.closedBands(v, h = 3, freq = 60)
    val methods = bands.map(_.method).toSet
    assert(!methods.contains("CONFORMAL_SNAIVE"),
      s"SNAIVE must be absent when no lag is in range: $methods")
    assert(methods == Set("CONFORMAL_NAIVE", "CONFORMAL_DRIFT",
      "CONFORMAL_MEANF", "CONFORMAL_SES"), s"other families intact: $methods")
    assert(bands.count(_.method == "CONFORMAL_SES") == 3, "SES at every step")
    // sanity at a seasonal freq: all five families present
    val full = graft.engine.Conformal.closedBands(v, h = 3, freq = 7)
    assert(full.map(_.method).toSet.size == 5, "five families at freq 7")
  }

  test("hierarchical drift: aligned leaves cohere (gap 0), ragged leaves do not") {
    import spark.implicits._
    val t0 = 86400000L * 19000
    def write(rows: Seq[(java.sql.Timestamp, String, Long, Option[Long], Option[Double], String)]) = {
      val dir = java.nio.file.Files.createTempDirectory("graft-hier").toString
      rows.toDF("ts", "event_type", "event_id", "user_id", "value", "props")
        .coalesce(1).write.parquet(s"$dir/events.parquet")
      dir
    }
    // both leaves span the same 10 days → drift-of-sum = sum-of-drifts
    // exactly (up to the 9dp slope quantization), so every gap is ~0
    val aligned = write((0 until 10).flatMap(d => Seq(
      (new java.sql.Timestamp(t0 + d * 86400000L), "a", d.toLong * 2, Option(1L), Some(10.0 + d), "{}"),
      (new java.sql.Timestamp(t0 + d * 86400000L), "b", d.toLong * 2 + 1, Option(1L), Some(50.0 + 2 * d), "{}"))))
    val ar = graft.engine.Conformal.hierarchicalDrift(spark, aligned).collect()
    assert(ar.length == 7 && ar.forall(_.getLong(1) == 2L))
    ar.foreach(r => assert(math.abs(r.getDouble(4)) < 1e-4,
      s"aligned leaves must reconcile, gap ${r.getDouble(4)}"))
    // leaf b exists only in the second half → the aggregate's own drift
    // sees the b-onset jump as trend; the bottom-up sum does not
    val ragged = write((0 until 10).flatMap(d =>
      Seq((new java.sql.Timestamp(t0 + d * 86400000L), "a", d.toLong * 2, Option(1L), Some(10.0 + d), "{}")) ++
      (if (d >= 5) Seq((new java.sql.Timestamp(t0 + d * 86400000L), "b", d.toLong * 2 + 1, Option(1L), Some(100.0), "{}"))
       else Nil)))
    val rr = graft.engine.Conformal.hierarchicalDrift(spark, ragged).collect()
    assert(rr.forall(r => math.abs(r.getDouble(4)) > 1.0),
      s"ragged leaves must show a coherence gap, got ${rr.map(_.getDouble(4)).mkString(",")}")
  }

  test("chi2 drift: identical halves score 0, a planted mix shift flags") {
    import spark.implicits._
    val t0 = 86400000L * 19000
    def write(rows: Seq[(java.sql.Timestamp, String, Long, Option[Long], Option[Double], String)]) = {
      val dir = java.nio.file.Files.createTempDirectory("graft-chi2").toString
      rows.toDF("ts", "event_type", "event_id", "user_id", "value", "props")
        .coalesce(1).write.parquet(s"$dir/events.parquet")
      dir
    }
    // 10-day span, pivot at day 5: identical per-type counts in both halves
    val same = write((0 until 10).flatMap(d => (0 until 3).map(i =>
      (new java.sql.Timestamp(t0 + d * 86400000L), if (i == 0) "x" else "y",
        (d * 3 + i).toLong, Option(1L), Some(1.0), "{}"))))
    val sr = graft.ops.EventAnalytics.chi2Drift(spark, same).collect()
    assert(sr.nonEmpty && sr.forall(r => r.getDouble(4) == 0.0 && !r.getBoolean(7)),
      "identical halves must score chi2 = 0, drifted = false")
    // type y: 20/day in the first half, 1/day in the second — strong shift
    val shifted = write((0 until 10).flatMap { d =>
      val ys = if (d < 5) 20 else 1
      (0 until 5).map(i => (new java.sql.Timestamp(t0 + d * 86400000L), "x",
        (d * 100 + i).toLong, Option(1L), Some(1.0), "{}")) ++
      (0 until ys).map(i => (new java.sql.Timestamp(t0 + d * 86400000L), "y",
        (d * 100 + 50 + i).toLong, Option(1L), Some(1.0), "{}"))
    })
    val dr = graft.ops.EventAnalytics.chi2Drift(spark, shifted).collect()
    assert(dr.forall(_.getBoolean(7)), "planted mix shift must flag drifted on every row")
    assert(dr.head.getDouble(4) > dr.head.getDouble(6),
      "statistic must clear the critical value")
    // degenerate single-day span: no halves to compare, empty verdict
    val oneDay = write((0 until 6).map(i =>
      (new java.sql.Timestamp(t0), "x", i.toLong, Option(1L), Some(1.0), "{}")))
    assert(graft.ops.EventAnalytics.chi2Drift(spark, oneDay).count() == 0L)
  }

  test("ks drift: identical halves score D = 0, a disjoint value shift scores D = 1") {
    import spark.implicits._
    val t0 = 86400000L * 19000
    def write(rows: Seq[(java.sql.Timestamp, String, Long, Option[Long], Option[Double], String)]) = {
      val dir = java.nio.file.Files.createTempDirectory("graft-ks").toString
      rows.toDF("ts", "event_type", "event_id", "user_id", "value", "props")
        .coalesce(1).write.parquet(s"$dir/events.parquet")
      dir
    }
    // same ten values in both halves → the ECDFs coincide everywhere
    val same = write((0 until 10).flatMap(d => (1 to 10).map(v =>
      (new java.sql.Timestamp(t0 + d * 86400000L), "x",
        (d * 10 + v).toLong, Option(1L), Some(v.toDouble), "{}"))))
    val sr = graft.ops.EventAnalytics.ksDrift(spark, same).collect()
    assert(sr.length == 1 && sr.head.getDouble(3) == 0.0 && !sr.head.getBoolean(5),
      s"identical halves must score D = 0: ${sr.mkString}")
    // disjoint supports → D = 1, far past the 5% critical value. The
    // midpoint pivot of a 10-day span is day 4 (lo + 9 DIV 2), so the
    // ref half is days 0-3 and the cur half days 4-9 — the value shift
    // is planted exactly on that boundary
    val shifted = write((0 until 10).flatMap(d => (1 to 10).map(v =>
      (new java.sql.Timestamp(t0 + d * 86400000L), "x", (d * 10 + v).toLong,
        Option(1L), Some(if (d < 4) v.toDouble else 100.0 + v), "{}"))))
    val dr = graft.ops.EventAnalytics.ksDrift(spark, shifted).collect()
    assert(dr.length == 1 && dr.head.getDouble(3) == 1.0 && dr.head.getBoolean(5),
      s"disjoint halves must score D = 1 and flag: ${dr.mkString}")
    assert(dr.head.getLong(1) == 40L && dr.head.getLong(2) == 60L)
  }

  test("rank drift: hand-computed tie-corrected z pinned; fully tied corpus yields NULL z") {
    import spark.implicits._
    val t0 = 86400000L * 19000
    def write(rows: Seq[(java.sql.Timestamp, String, Long, Option[Long], Option[Double], String)]) = {
      val dir = java.nio.file.Files.createTempDirectory("graft-mwu").toString
      rows.toDF("ts", "event_type", "event_id", "user_id", "value", "props")
        .coalesce(1).write.parquet(s"$dir/events.parquet")
      dir
    }
    // 3-day span → pivot at day 1: ref = day 0 values [1,2,2,3], cur =
    // days 1-2 values [3,3,4,5]. Hand derivation (average ranks over the
    // pooled 1,2,2,3,3,3,4,5): R1 = 1 + 2.5 + 2.5 + 5 = 11, U1 = 1,
    // ties Σ(t³−t) = 24 + 6 = 30, σ = √(16/12·(9 − 30/56)) = 3.35942…,
    // z = (1 − 8)/σ = −2.083692 — a real location shift at 5%.
    val refVals = Seq(1.0, 2.0, 2.0, 3.0); val curVals = Seq(3.0, 3.0, 4.0, 5.0)
    val shifted = write(
      refVals.zipWithIndex.map { case (v, i) =>
        (new java.sql.Timestamp(t0), "x", i.toLong, Option(1L), Some(v), "{}") } ++
      curVals.zipWithIndex.map { case (v, i) =>
        (new java.sql.Timestamp(t0 + (1 + i % 2) * 86400000L), "x", (10 + i).toLong,
          Option(1L), Some(v), "{}") })
    val dr = graft.ops.EventAnalytics.rankDrift(spark, shifted).collect()
    assert(dr.length == 1 && dr.head.getLong(1) == 4L && dr.head.getLong(2) == 4L)
    assert(dr.head.getDouble(3) == -2.083692 && dr.head.getBoolean(4),
      s"hand-computed z must match exactly: ${dr.mkString}")
    // every value identical → zero rank variance → NULL z, no flag
    val tied = write((0 until 9).map(i =>
      (new java.sql.Timestamp(t0 + (i / 3) * 86400000L), "x", i.toLong,
        Option(1L), Some(7.0), "{}")))
    val tr = graft.ops.EventAnalytics.rankDrift(spark, tied).collect()
    assert(tr.length == 1 && tr.head.isNullAt(3) && !tr.head.getBoolean(4),
      s"fully tied corpus must yield NULL z and no flag: ${tr.mkString}")
  }

  test("ensemble forecast: constant series splits weights equally; trend favors drift") {
    import spark.implicits._
    val t0 = 86400000L * 19000
    def write(vals: Seq[(String, Int, Double)]) = {
      val dir = java.nio.file.Files.createTempDirectory("graft-ens").toString
      vals.map { case (el, i, v) =>
        (new java.sql.Timestamp(t0 + i * 3600000L), el, i.toLong, Option(1L), Some(v), "{}") }
        .toDF("ts", "event_type", "event_id", "user_id", "value", "props")
        .coalesce(1).write.parquet(s"$dir/events.parquet")
      dir
    }
    // constant series: every family backtests to MAE 0 → equal thirds,
    // and every family forecasts the constant
    val const = write((0 until 30).map(i => ("c", i, 42.0)))
    val cr = graft.engine.Backtest.ensembleForecast(spark, const).collect()
    assert(cr.length == 7)
    cr.foreach { r =>
      assert(r.getDouble(2) == 0.333333 && r.getDouble(3) == 0.333333 &&
        r.getDouble(4) == 0.333333, s"equal thirds expected: $r")
      assert(r.getDouble(5) == 42.0, s"constant forecast expected: $r")
    }
    // strict linear trend: drift backtests to MAE 0 and must dominate;
    // the combined forecast stays within the three family points
    val lin = write((0 until 30).map(i => ("l", i, 10.0 + 2.0 * i)))
    val lr = graft.engine.Backtest.ensembleForecast(spark, lin).collect()
    lr.foreach { r =>
      val (step, wn, wd, wm, fc) =
        (r.getLong(1), r.getDouble(2), r.getDouble(3), r.getDouble(4), r.getDouble(5))
      assert(wd > 0.99 && wd > wn && wd > wm, s"drift must dominate on a pure trend: $r")
      val fD = 68.0 + 2.0 * step
      val lo = math.min(68.0, math.min(fD, 39.0)); val hi = math.max(68.0, math.max(fD, 39.0))
      assert(fc >= lo && fc <= hi, s"combined forecast must sit inside the family span: $r")
      assert(math.abs(fc - fD) < 0.5, s"near-pure drift expected at step $step: $fc vs $fD")
    }
  }

  test("empty and whitespace-only documents score instead of crashing") {
    // ANSI mode turns x/0 into a runtime error: quality/text_stats used
    // to divide by length(text) and died on empty docs (routine in real
    // feeds). The greatest(len, 1) guard makes the ratios total.
    import spark.implicits._
    val dir = java.nio.file.Files.createTempDirectory("graft-emptytext").toString
    val good = "the quick brown fox and the lazy dog sit on the hill with a friend " * 10
    Seq((1L, "en", "s", "", 0L), (2L, "en", "s", "   ", 3L),
        (3L, "en", "s", good, good.length.toLong))
      .toDF("doc_id", "lang", "source", "text", "n_chars")
      .coalesce(1).write.parquet(s"$dir/documents.parquet")
    val q = graft.ops.TextAnalysis.qualityScore(spark, dir).collect()
      .map(r => r.getLong(0) -> r.getDouble(6)).toMap
    assert(q.size == 3 && q.values.forall(v => !v.isNaN))
    val ts = graft.ops.TextAnalysis.textStats(spark, dir).collect()
      .map(r => r.getLong(0) -> r.getDouble(5)).toMap
    assert(ts(1L) == 0.0, "empty text has uppercase ratio 0")
    // the composed pipeline runs end to end over the degenerate docs
    // and keeps exactly the quality-passing one
    assert(graft.ops.Dedup.curateCorpus(spark, dir).collect()
      .map(_.getLong(0)).toSeq == Seq(3L))
  }

  test("zero-norm vectors and an empty events store degrade gracefully") {
    import spark.implicits._
    val dir = java.nio.file.Files.createTempDirectory("graft-zero").toString
    Seq((1L, 0, Array(0.0f, 0.0f, 0.0f, 0.0f)),
        (2L, 0, Array(1.0f, 2.0f, 3.0f, 4.0f)),
        (3L, 1, Array(4.0f, 3.0f, 2.0f, 1.0f)))
      .toDF("vec_id", "label", "embedding")
      .coalesce(1).write.parquet(s"$dir/embeddings.parquet")
    // the fused cosine kernel scores a zero-norm pair 0, never NaN/∞
    val sims = Similarity.cosineTopK(spark, dir, 2).collect()
    assert(sims.nonEmpty)
    sims.foreach(r => assert(java.lang.Double.isFinite(r.getDouble(3))))
    assert(sims.filter(_.getLong(0) == 1L).forall(_.getDouble(3) == 0.0))
    // all-zero vector quantizes with zero scale/error, not a crash
    val qz = Similarity.quantizeStats(spark, dir).collect()
      .map(r => r.getLong(0) -> r.getDouble(1)).toMap
    assert(qz(1L) == 0.0)
    // semantic dedup: the zero-norm vector scores 0 against everything
    // (a singleton, kept); vecs 2 and 3 have cosine 20/30 ≈ 0.67 ≥ 0.4
    // so they form one component and only vec 2 survives
    val sd = graft.ops.Dedup.semanticDedup(spark, dir).collect().sortBy(_.getLong(0))
    assert(sd.map(_.getLong(0)).toSeq == Seq(1L, 2L, 3L))
    assert(sd.map(_.getBoolean(3)).toSeq == Seq(true, true, false))
    assert(sd(2).getLong(1) == 2L && sd(2).getLong(2) == 2L)
    // and an EMPTY embeddings store flows through both dedup paths
    val mdir = java.nio.file.Files.createTempDirectory("graft-zero-emb").toString
    Seq.empty[(Long, Int, Array[Float])].toDF("vec_id", "label", "embedding")
      .write.parquet(s"$mdir/embeddings.parquet")
    assert(graft.ops.Dedup.semanticDedup(spark, mdir).count() == 0L)
    assert(graft.ops.Dedup.semanticDedupIvf(spark, mdir).count() == 0L)
    // an empty events store flows through the whole fit pipeline
    val edir = java.nio.file.Files.createTempDirectory("graft-zero-ev").toString
    Seq.empty[(java.sql.Timestamp, String, Long, Long, Double, String)]
      .toDF("ts", "event_type", "event_id", "user_id", "value", "props")
      .write.parquet(s"$edir/events.parquet")
    assert(SparkEntry.queries("fc_naive")(spark, edir).collect().isEmpty)
  }

  test("corpus mixture shares sum to one and counts match the raw table") {
    val rows = graft.ops.Curation.corpusMixture(spark, sfDir).collect()
    assert(rows.nonEmpty)
    val nDocs = spark.read.parquet(s"$sfDir/documents.parquet").count()
    assert(rows.map(_.getLong(2)).sum == nDocs)
    assert(math.abs(rows.map(_.getDouble(4)).sum - 1.0) < 1e-3, "doc shares")
    assert(math.abs(rows.map(_.getDouble(5)).sum - 1.0) < 1e-3, "token shares")
  }

  test("corpusResample: deterministic, rate-bounded, and rate-1 strata kept whole") {
    val out = graft.ops.Curation.corpusResample(spark, sfDir).collect()
    val again = graft.ops.Curation.corpusResample(spark, sfDir).collect()
    assert(out.length == again.length && out.map(_.toString).sameElements(again.map(_.toString)),
      "hash-threshold sampling must be bit-reproducible")
    assert(out.nonEmpty)
    out.foreach { r =>
      val rate = r.getDouble(4)
      assert(rate > 0 && rate <= 1.0, s"rate $rate out of (0, 1]")
    }
    // a stratum whose budget is at or under the median has rate 1 and
    // must survive the filter intact
    val fullByStratum = spark.read.parquet(s"$sfDir/documents.parquet")
      .groupBy("lang", "source").count().collect()
      .map(r => (r.getString(0), r.getString(1)) -> r.getLong(2)).toMap
    val keptByStratum = out.groupBy(r => (r.getString(1), r.getString(2)))
    keptByStratum.foreach { case (k, rows) =>
      val full = fullByStratum(k)
      val rate = rows.head.getDouble(4)
      if (rate == 1.0)
        assert(rows.length.toLong == full, s"rate-1 stratum $k lost documents")
      else {
        assert(rows.length.toLong <= full, s"stratum $k gained documents")
        // per-doc keep is an independent uniform draw; hold the count to
        // a 4-sigma binomial band (vacuous for tiny strata, sharp for
        // large ones — what the property should be for a sampler)
        val sigma = math.sqrt(full * rate * (1 - rate))
        assert(math.abs(rows.length - rate * full) <= 4 * sigma + 1,
          s"stratum $k kept ${rows.length} of $full at rate $rate — outside 4-sigma")
      }
    }
  }

  test("packSequences: per-shard offsets are a gapless cumsum and bins contiguous") {
    val budget = 2048
    val rows = graft.ops.Curation.packSequences(spark, sfDir, budget).collect()
    assert(rows.nonEmpty)
    val shards = rows.groupBy(r => (r.getString(0), r.getString(1), r.getString(2)))
    shards.foreach { case (shard, rs) =>
      val ordered = rs.sortBy(_.getLong(3)) // doc_id order within the shard
      var expectedOff = 0L
      ordered.foreach { r =>
        assert(r.getLong(5) == expectedOff,
          s"shard $shard doc ${r.getLong(3)}: start_off ${r.getLong(5)} != cumsum $expectedOff")
        assert(r.getLong(6) == expectedOff / budget,
          s"shard $shard doc ${r.getLong(3)}: bin mismatch")
        expectedOff += r.getLong(4)
      }
      val bins = ordered.map(_.getLong(6)).distinct.sorted
      assert(bins.sameElements(bins.indices.map(_.toLong)), s"shard $shard bins not contiguous")
    }
  }

  test("pack efficiency re-derives exactly from the packing table") {
    val packed = graft.ops.Curation.packSequences(spark, sfDir).collect()
      .map(r => (r.getString(0), r.getString(1), r.getString(2), r.getLong(4), r.getLong(6)))
    val eff = graft.ops.Curation.packEfficiency(spark, sfDir).collect()
      .map(r => (r.getString(0), r.getLong(1), r.getLong(2), r.getLong(3), r.getLong(4), r.getDouble(5)))
    assert(eff.nonEmpty)
    eff.foreach { case (split, nShards, nBins, nDocs, nTokens, fill) =>
      val rows = packed.filter(_._1 == split)
      assert(nShards == rows.map(r => (r._2, r._3)).distinct.length)
      assert(nBins == rows.map(r => (r._2, r._3, r._5)).distinct.length)
      assert(nDocs == rows.length)
      assert(nTokens == rows.map(_._4).sum)
      assert(fill == nTokens.toDouble / (nBins * 2048L).toDouble)
      assert(fill > 0.0)
    }
  }

  test("training manifest covers exactly the curated keep-set with gapless shard offsets") {
    val kept = graft.ops.Dedup.curateCorpus(spark, sfDir).collect().map(_.getLong(0)).toSet
    val man = graft.ops.Curation.trainingManifest(spark, sfDir).collect()
    assert(man.map(_.getLong(3)).toSet == kept,
      "manifest rows must be the curated survivors, nothing more or less")
    // per shard: offsets are a gapless cumsum in doc_id order
    man.groupBy(r => (r.getString(0), r.getString(1), r.getString(2))).foreach {
      case (shard, rows) =>
        val sorted = rows.sortBy(_.getLong(3))
        var off = 0L
        sorted.foreach { r =>
          assert(r.getLong(5) == off, s"offset gap in shard $shard at doc ${r.getLong(3)}")
          assert(r.getLong(6) == off / 2048, "bin = start_off / budget")
          off += r.getLong(4)
        }
    }
  }

  test("streaming quality-model scoring matches the batch scorer row for row") {
    import spark.implicits._
    implicit val sq = spark.sqlContext
    val texts = Seq(
      (1L, "the quick brown fox and the lazy dog sit on the hill with a friend " * 8),
      (2L, "@@@@ !!!! #### %%%% &&&& ****"),
      (3L, "a calm morning walk along the shore with the tide going out slowly " * 6))
    val batch = graft.ops.QualityModel.scoreStream(spark, sfDir,
        texts.toDF("doc_id", "text")).collect()
      .map(r => r.getLong(0) -> (r.getDouble(1), r.getBoolean(2))).toMap
    val mem = MemoryStream[(Long, String)]
    mem.addData(texts: _*)
    val q = graft.ops.QualityModel.scoreStream(spark, sfDir,
        mem.toDF().toDF("doc_id", "text"))
      .writeStream.format("memory").queryName("qm_out").outputMode("append").start()
    try {
      q.processAllAvailable()
      val streamed = spark.table("qm_out").collect()
        .map(r => r.getLong(0) -> (r.getDouble(1), r.getBoolean(2))).toMap
      assert(streamed == batch,
        s"stream and batch scoring must agree: $streamed vs $batch")
      assert(!streamed(2L)._2, "the junk document must be screened out")
    } finally q.stop()
  }

  test("streaming curation screens, splits, and dedups like the batch pipeline") {
    import spark.implicits._
    implicit val sq = spark.sqlContext
    val good = "the quick brown fox and the lazy dog sit on the hill with a friend " * 10
    val pii = good + " contact me at someone@example.com"
    val junk = "@@@@ !!!! ####"
    val t0 = new java.sql.Timestamp(86400000L * 19000)
    def ts(ms: Long) = new java.sql.Timestamp(t0.getTime + ms)
    val mem = MemoryStream[(Long, java.sql.Timestamp, String)]
    mem.addData(
      (1L, ts(0), good),
      (2L, ts(1000), pii),   // PII screen drops
      (3L, ts(2000), junk),  // quality screen drops
      (4L, ts(3000), good))  // exact duplicate of 1 inside the watermark
    val stream = mem.toDF().toDF("doc_id", "ts", "text")
    val q = EventIngest.curateDocStream(stream)
      .select("doc_id", "split")
      .writeStream.format("memory").queryName("curate_out").outputMode("append").start()
    try {
      q.processAllAvailable()
      val out = spark.table("curate_out").collect()
        .map(r => (r.getLong(0), r.getString(1)))
      assert(out.map(_._1).toSet == Set(1L), s"only the first good doc survives; got ${out.toSeq}")
      // split assignment must equal the deterministic batch expression
      val batchSplit = Seq(Tuple1(good)).toDF("text")
        .select(graft.ops.Curation.splitExpr).head().getString(0)
      assert(out.head._2 == batchSplit, "stream and batch must assign the same split")
    } finally q.stop()
  }

  test("word-bigram shingles discriminate where token sets cannot") {
    // this corpus: near-identical vocabularies but random word order ⇒
    // unigram jaccard is high while bigram jaccard collapses
    val uni = NearDup.blockedJaccard(spark, sfDir, threshold = 0.9, ngram = 1).count()
    val bi = NearDup.blockedJaccard(spark, sfDir, threshold = 0.9, ngram = 2).count()
    assert(bi <= uni, s"bigram pairs ($bi) should not exceed unigram pairs ($uni)")
  }

  test("hybrid grid fan-out matches the single-task fit (weights and points)") {
    import spark.implicits._
    val ser = graft.sources.SeriesStore.series(spark, sfDir, Seq("purchase"))
    val grid = graft.engine.Forecaster
      .forecastHybrid(spark, ser, frequency = 7, horizon = 8, cvHorizon = 8)
      .collect().sortBy(_.step)
    val y = ser.collect().head.values
    val single = graft.models.Hybrid.HybridFamily.fitCv(y, 7, cvHorizon = 8).forecast(8)
    assert(grid.length == 8)
    grid.zipWithIndex.foreach { case (p, j) =>
      assert(math.abs(p.mean - single.mean(j)) < 1e-9,
        s"grid vs single-task point at step ${j + 1}: ${p.mean} vs ${single.mean(j)}")
    }
  }

  test("session windows: event exactly one gap later MERGES (inclusive window end)") {
    // pins the oracle's break predicate (diff > gap splits; diff == gap
    // merges): u1: 0us and 1000us merge, and 1000us + gap lands exactly
    // on the window end -> MERGED, extending the session. u2: one
    // session; u3 (gap + 1) splits.
    import spark.implicits._
    val dir = java.nio.file.Files.createTempDirectory("graft-sess").toString
    val gapUs = 30L * 60L * 1000000L
    Seq((1L, 0L, 2.0), (1L, 1000L, 3.0), (1L, 1000L + gapUs, 5.0),
        (2L, 0L, 1.0), (2L, gapUs - 1L, 1.0),
        (3L, 0L, 4.0), (3L, gapUs + 1L, 6.0))
      .toDF("user_id", "us", "value")
      .select(col("user_id"), timestamp_micros(col("us")).as("ts"), col("value"))
      .coalesce(1).write.parquet(s"$dir/events.parquet")
    val out = Relational.userSessions(spark, dir).collect()
      .map(r => (r.getLong(0), r.getLong(1), r.getLong(2), r.getLong(3), r.getDouble(4)))
    val expected = Seq(
      (1L, 0L, 1000L + 2 * gapUs, 3L, 10.0),  // boundary event MERGES, end = last + gap
      (2L, 0L, gapUs - 1L + gapUs, 2L, 2.0),
      (3L, 0L, gapUs, 1L, 4.0),               // gap + 1 splits
      (3L, gapUs + 1L, 2 * gapUs + 1L, 1L, 6.0))
    assert(out.toSeq == expected, s"got ${out.mkString(",")}")
  }

  test("session concurrency: difference-array profile, hour-boundary end exclusive") {
    import spark.implicits._
    val dir = java.nio.file.Files.createTempDirectory("graft-conc").toString
    val hourUs = 3600L * 1000000L; val minUs = 60L * 1000000L
    // A: events 10:00+10:10 -> session [10:00, 10:40); B: 10:30 ->
    // [10:30, 11:00) — ends EXACTLY on the hour boundary, so hour 10 is
    // its last active hour; C: 11:05 -> [11:05, 11:35)
    Seq((1L, 10L * hourUs), (1L, 10L * hourUs + 10L * minUs),
        (2L, 10L * hourUs + 30L * minUs), (3L, 11L * hourUs + 5L * minUs))
      .toDF("user_id", "us")
      .select(col("user_id"), timestamp_micros(col("us")).as("ts"), lit(1.0).as("value"))
      .coalesce(1).write.parquet(s"$dir/events.parquet")
    val out = graft.ops.EventAnalytics.sessionConcurrency(spark, dir).collect()
      .map(r => (r.getLong(0), r.getLong(1), r.getLong(2)))
    val expected = Seq(
      (10L * hourUs, 2L, 2L),   // A and B open
      (11L * hourUs, -1L, 1L),  // A and B closed, C opens
      (12L * hourUs, -1L, 0L))  // C closed
    assert(out.toSeq == expected, s"got ${out.mkString(",")}")
  }

  test("series gapfill: a 3-day outage densifies with LOCF and is_filled flags") {
    import spark.implicits._
    val dir = java.nio.file.Files.createTempDirectory("graft-gapfill").toString
    val day = 86400L * 1000000L
    // element a: days 10 (two obs, mean 3.0), 11, then a 3-day gap, 15
    Seq((10L * day, 2.0), (10L * day + 1000L, 4.0), (11L * day, 5.0), (15L * day, 9.0))
      .toDF("us", "value")
      .select(timestamp_micros(col("us")).as("ts"), lit("a").as("event_type"),
        col("value"), lit(1L).as("user_id"), lit(1L).as("event_id"))
      .coalesce(1).write.parquet(s"$dir/events.parquet")
    val out = graft.sources.SeriesStore.gapFilledDaily(spark, dir).collect()
      .map(r => (r.getDate(1).toString, r.getLong(2), r.getDouble(3), r.getBoolean(4)))
    val expected = Seq(
      ("1970-01-11", 2L, 3.0, false),  // mean of 2.0 and 4.0
      ("1970-01-12", 1L, 5.0, false),
      ("1970-01-13", 0L, 5.0, true),   // LOCF from day 11
      ("1970-01-14", 0L, 5.0, true),
      ("1970-01-15", 0L, 5.0, true),
      ("1970-01-16", 1L, 9.0, false))
    assert(out.toSeq == expected, s"got ${out.mkString(",")}")
  }

  test("incremental dedup: exact beats near, partner is lowest base id, novel kept") {
    import spark.implicits._
    val dir = java.nio.file.Files.createTempDirectory("graft-incdedup").toString
    val w40 = (0 until 40).map(i => f"w$i%02d").mkString(" ")
    // ids % 7 == 0 are the arriving batch; 1..4 are the base corpus
    Seq(
      (1L, "alpha bravo charlie delta echo"),          // base
      (2L, w40),                                       // base
      (3L, "foxtrot golf hotel india juliet kilo"),    // base
      (4L, "ALPHA bravo  charlie delta echo"),         // base, same norm as 1
      (7L, "  Alpha  BRAVO charlie   delta ECHO "),    // exact dup of 1 AND 4 -> min base 1
      (14L, "lima mike november oscar papa quebec"),   // novel
      (21L, w40 + " zulu"),                            // J = 40/41 vs base 2 -> near
      (28L, "romeo sierra tango uniform victor xray")) // novel
      .toDF("doc_id", "text")
      .select(col("doc_id"), lit("en").as("lang"), lit("s").as("source"),
        col("text"), length(col("text")).cast("long").as("n_chars"))
      .coalesce(1).write.parquet(s"$dir/documents.parquet")
    val out = graft.ops.Dedup.dedupIncrement(spark, dir).collect()
      .map(r => (r.getLong(0), r.getString(1), if (r.isNullAt(2)) -1L else r.getLong(2)))
    val expected = Seq(
      (7L, "drop_exact", 1L),   // exact wins over the implied jaccard-1.0 near edge
      (14L, "kept", -1L),
      (21L, "drop_near", 2L),
      (28L, "kept", -1L))
    assert(out.toSeq == expected, s"got ${out.mkString(",")}")
  }

  test("click attribution: window edges and tie-break pinned by fixture") {
    import spark.implicits._
    val dir = java.nio.file.Files.createTempDirectory("graft-attr").toString
    val hourUs = 3600L * 1000000L
    // user 1: clicks at t=0 and t=10 (tie on nothing), purchase at
    // t=hourUs -> click at t=0 is EXACTLY one hour before: excluded
    // (strict p-c < W); click at t=10 wins. A second click at the same
    // microsecond as the winner but higher id must win the tie.
    // user 2: purchase with no click in window -> NULL attribution.
    val rows = Seq(
      (100L, 0L, 1L, "click"), (101L, 10L, 1L, "click"),
      (102L, 10L, 1L, "click"), // same instant as 101, higher id
      (103L, hourUs, 1L, "purchase"),
      (104L, 5L * hourUs, 2L, "purchase"), (105L, hourUs, 2L, "click"))
    rows.toDF("event_id", "us", "user_id", "event_type")
      .select(col("event_id"), timestamp_micros(col("us")).as("ts"),
        col("user_id"), col("event_type"), lit(1.0).as("value"))
      .coalesce(1).write.parquet(s"$dir/events.parquet")
    val out = graft.ops.EventAnalytics.clickAttribution(spark, dir).collect()
      .map(r => (r.getLong(0), if (r.isNullAt(3)) -1L else r.getLong(3),
        if (r.isNullAt(5)) -1L else r.getLong(5)))
    assert(out.toSeq == Seq((103L, 102L, hourUs - 10L), (104L, -1L, -1L)),
      s"got ${out.mkString(",")}")
  }

  test("stream-stream attribution join emits exactly the batch banded-join pairs") {
    val batch = graft.ops.EventAnalytics
      .attributionCandidates(spark, sfDir, 3600L * 1000000L)
      .select("purchase_id", "click_id", "purchase_us", "click_us").collect()
      .map(r => (r.getLong(0), r.getLong(1), r.getLong(2), r.getLong(3))).toSet
    val streamed = EventIngest.attributionPairsAvailableNow(spark, sfDir)
      .select("purchase_id", "click_id", "purchase_us", "click_us").collect()
      .map(r => (r.getLong(0), r.getLong(1), r.getLong(2), r.getLong(3))).toSet
    assert(streamed.nonEmpty, "parity test needs a non-empty pair set")
    assert(streamed == batch,
      s"stream ${streamed.size} pairs vs batch ${batch.size}; " +
        s"only-stream=${(streamed -- batch).take(3)} only-batch=${(batch -- streamed).take(3)}")
  }

  test("AvailableNow stream: window closing exactly at the watermark is emitted, open one held") {
    // pins the oracle's release predicate (window.end <= watermark):
    // max ts = day 12 -> wm = day 11 = END of the [day10, day11) window,
    // so day 10 must be emitted and day 12 (still open) must not
    import spark.implicits._
    val dir = java.nio.file.Files.createTempDirectory("graft-avnow").toString
    val day = 86400000L
    Seq((new java.sql.Timestamp(day * 10 + 5000), "a", 1.5),
        (new java.sql.Timestamp(day * 12), "a", 2.0))
      .toDF("ts", "event_type", "value")
      .coalesce(1).write.parquet(s"$dir/events.parquet")
    val out = EventIngest.dailyAggregateAvailableNow(spark, dir).collect()
      .map(r => (r.getString(0), r.getDate(1).toString, r.getLong(2), r.getDouble(3)))
    assert(out.toSeq == Seq(("a", "1970-01-11", 1L, 1.5)),
      s"exactly the boundary window, got ${out.mkString(",")}")
  }

  test("AvailableNow sessions: session ending exactly at the watermark is emitted, ms residue floors") {
    // pins the session release predicate (end_us <= wm_ms * 1000): the
    // clock-driving event carries a 999us sub-millisecond residue that
    // Spark's ms watermark must floor away, landing wm EXACTLY on user
    // 1's session end (emit); user 3 ends 1ms later (hold); the clock
    // driver's own session is open (hold).
    import spark.implicits._
    val dir = java.nio.file.Files.createTempDirectory("graft-sess-avnow").toString
    val gapUs = 30L * 60L * 1000000L
    val dayUs = 86400000000L
    Seq((1L, 0L, 2.5),
        (3L, 1000L, 4.0),
        (2L, dayUs + gapUs + 999L, 1.0))
      .toDF("user_id", "us", "value")
      .select(col("user_id"), timestamp_micros(col("us")).as("ts"), col("value"))
      .coalesce(1).write.parquet(s"$dir/events.parquet")
    val out = EventIngest.sessionsAvailableNow(spark, dir).collect()
      .map(r => (r.getLong(0), r.getLong(1), r.getLong(2), r.getLong(3), r.getDouble(4)))
    assert(out.toSeq == Seq((1L, 0L, gapUs, 1L, 2.5)),
      s"exactly the boundary session, got ${out.mkString(",")}")
  }

  test("event funnel: steps must be reached in order, ties on the exact microsecond count") {
    import spark.implicits._
    val dir = java.nio.file.Files.createTempDirectory("graft-funnel").toString
    // u1 completes in order; u2's click precedes their first view (does
    // not count) so the later purchase can't count either; u3's click at
    // the SAME microsecond as the view counts, but their purchase came
    // earlier; u4 never views (enters no step)
    Seq((1L, 10L, "view"), (1L, 20L, "click"), (1L, 30L, "purchase"),
        (2L, 5L, "click"), (2L, 10L, "view"), (2L, 20L, "purchase"),
        (3L, 10L, "view"), (3L, 10L, "click"), (3L, 9L, "purchase"),
        (4L, 10L, "purchase"))
      .toDF("user_id", "us", "event_type")
      .select(col("user_id"), timestamp_micros(col("us")).as("ts"), col("event_type"))
      .coalesce(1).write.parquet(s"$dir/events.parquet")
    val out = graft.ops.EventAnalytics.eventFunnel(spark, dir).collect()
      .map(r => (r.getInt(0), r.getString(1), r.getLong(2), r.getDouble(3)))
    assert(out.toSeq == Seq(
      (1, "view", 3L, 1.0), (2, "click", 2L, 2.0 / 3.0), (3, "purchase", 1L, 1.0 / 3.0)),
      s"got ${out.mkString(",")}")
  }

  test("user retention: cohort by first-active day, offset 0 is the cohort size") {
    import spark.implicits._
    val dir = java.nio.file.Files.createTempDirectory("graft-retention").toString
    val dayUs = 86400000000L
    Seq((1L, 0L), (1L, 1L), (1L, 3L), (2L, 0L), (2L, 3L), (3L, 1L), (3L, 2L))
      .toDF("user_id", "d")
      .select(col("user_id"), timestamp_micros(col("d") * dayUs).as("ts"),
        lit("view").as("event_type"))
      .coalesce(1).write.parquet(s"$dir/events.parquet")
    val out = graft.ops.EventAnalytics.userRetention(spark, dir).collect()
      .map(r => (r.getDate(0).toString, r.getLong(1), r.getLong(2), r.getDouble(3)))
    assert(out.toSeq == Seq(
      ("1970-01-01", 0L, 2L, 1.0), ("1970-01-01", 1L, 1L, 0.5), ("1970-01-01", 3L, 2L, 1.0),
      ("1970-01-02", 0L, 1L, 1.0), ("1970-01-02", 1L, 1L, 1.0)),
      s"got ${out.mkString(",")}")
  }

  test("rolling actives: a user is visible for 7 days, partial future windows unreported") {
    import spark.implicits._
    val dir = java.nio.file.Files.createTempDirectory("graft-rolling").toString
    val dayUs = 86400000000L
    Seq((1L, 0L), (2L, 3L))
      .toDF("user_id", "d")
      .select(col("user_id"), timestamp_micros(col("d") * dayUs).as("ts"),
        lit("view").as("event_type"))
      .coalesce(1).write.parquet(s"$dir/events.parquet")
    val out = graft.ops.EventAnalytics.rollingActiveUsers(spark, dir).collect()
      .map(r => (r.getDate(0).toString, r.getLong(1)))
    assert(out.toSeq == Seq(("1970-01-01", 1L), ("1970-01-02", 1L),
      ("1970-01-03", 1L), ("1970-01-04", 2L)), s"got ${out.mkString(",")}")
  }

  test("multi-way join plans: Q3 takes top-k without a global sort, dims broadcast") {
    val q3 = Relational.shippingPriority(spark, sfDir)
      .queryExecution.executedPlan.toString
    assert(q3.contains("TakeOrderedAndProject"), s"Q3 must TakeOrderedAndProject:\n$q3")
    assert(q3.contains("BroadcastHashJoin"), "Q3's filtered customer dim must broadcast")
    val q5 = Relational.localSupplierVolume(spark, sfDir)
      .queryExecution.executedPlan.toString
    assert(q5.contains("BroadcastHashJoin"), "Q5's dimension sides must broadcast")
    // the cycle-closing c_nationkey = s_nationkey edge must be an
    // equi-join condition, not a post-join filter over a wider join
    assert(!q5.contains("CartesianProduct") && !q5.contains("BroadcastNestedLoopJoin"),
      s"Q5 must stay all-equi-join:\n$q5")
  }

  test("correlated subqueries decorrelate: semi/anti/agg-join, no nested loops") {
    val plans = Seq("sql_exists_agg", "sql_scalar_subquery", "sql_dormant_customers",
      "sql_top_supplier", "sql_large_orders", "sql_waiting_suppliers",
      "sql_part_concentration")
      .map(n => n -> SparkEntry.queries(n)(spark, sfDir).queryExecution.executedPlan.toString)
    plans.foreach { case (n, p) =>
      assert(!p.contains("CartesianProduct") && !p.contains("BroadcastNestedLoopJoin"),
        s"$n must decorrelate to equi-joins:\n$p")
    }
    val byName = plans.toMap
    assert(byName("sql_exists_agg").contains("LeftSemi"),
      "EXISTS must become a semi join")
    assert(byName("sql_dormant_customers").contains("LeftAnti"),
      "NOT EXISTS must become an anti join")
    // Q18's IN over a HAVING'd aggregate: semi join whose build side is
    // an aggregate, not a scan
    assert(byName("sql_large_orders").contains("LeftSemi"),
      "IN (aggregate subquery) must become a semi join")
    // Q21's twin correlations on one fact: the EXISTS survives as a
    // semi, the NOT EXISTS (with its outer-column o_orderdate predicate)
    // as an anti — all equi-keyed on l_orderkey
    assert(byName("sql_waiting_suppliers").contains("LeftSemi")
      && byName("sql_waiting_suppliers").contains("LeftAnti"),
      "Q21 must decorrelate both self-subqueries to semi + anti joins")
  }

  test("runtime bloom filter prunes a shuffled fact join from a selective build side") {
    // the third runtime-adaptivity pin (with AQE skew split and AQE
    // coalesce): when a selective dim filters a shuffled fact-fact
    // join, Spark injects a bloom MightContain probe on the fact scan
    // side so non-joining rows die before the shuffle. Thresholds are
    // test-sized; the assertion is on the optimized plan's filter.
    val confs = Seq(
      "spark.sql.autoBroadcastJoinThreshold" -> "-1",
      "spark.sql.optimizer.runtime.bloomFilter.enabled" -> "true",
      "spark.sql.optimizer.runtime.bloomFilter.creationSideThreshold" -> "10MB",
      "spark.sql.optimizer.runtime.bloomFilter.applicationSideScanSizeThreshold" -> "0")
    val saved = confs.map { case (k, _) => k -> spark.conf.getOption(k) }
    confs.foreach { case (k, v) => spark.conf.set(k, v) }
    try {
      val fact = graft.sources.Tables.table(spark, sfDir, "lineitem")
      val sel = graft.sources.Tables.table(spark, sfDir, "orders")
        .filter(col("o_orderpriority") === "1-URGENT")
      val joined = fact.join(sel, col("l_orderkey") === col("o_orderkey"))
        .groupBy(col("o_orderpriority")).agg(sum(col("l_quantity")).as("q"))
      val optimized = joined.queryExecution.optimizedPlan.toString
      assert(optimized.contains("bloom_filter_agg") || optimized.contains("BloomFilter"),
        s"runtime bloom filter must be injected on the probe side:\n$optimized")
      assert(joined.collect().nonEmpty)
    } finally saved.foreach {
      case (k, Some(v)) => spark.conf.set(k, v)
      case (k, None) => spark.conf.unset(k)
    }
  }

  test("AQE splits a skewed join partition at runtime") {
    // the engine's declared skew posture: static plans stay declarative
    // and RUNTIME skew is AQE's job — this pins that the config path
    // actually engages. One key owns half of a 200k-row fact side; with
    // broadcast off (forcing SMJ) and test-sized skew thresholds, AQE
    // must rewrite the hot partition into multiple reader splits.
    import spark.implicits._
    val confs = Seq(
      "spark.sql.autoBroadcastJoinThreshold" -> "-1",
      "spark.sql.adaptive.skewJoin.skewedPartitionFactor" -> "2",
      "spark.sql.adaptive.skewJoin.skewedPartitionThresholdInBytes" -> "262144",
      "spark.sql.adaptive.advisoryPartitionSizeInBytes" -> "131072")
    val saved = confs.map { case (k, _) => k -> spark.conf.getOption(k) }
    confs.foreach { case (k, v) => spark.conf.set(k, v) }
    try {
      val fact = spark.range(200000L)
        .select(when(col("id") % 2 === 0L, 0L).otherwise(col("id")).as("k"),
          col("id").as("v"))
      val dim = spark.range(2000L).select(col("id").as("k"), (col("id") * 2L).as("w"))
      val joined = fact.join(dim, "k")
      // execute THIS QueryExecution (count() would plan a separate one
      // whose AdaptiveSparkPlan never finalizes on `joined`)
      assert(joined.collect().length == 101000L) // hot key 0 (100k) + odd ids < 2000 (1k)
      val plan = joined.queryExecution.executedPlan.toString
      assert(plan.contains("SortMergeJoin"), s"skew test must run SMJ:\n$plan")
      assert(plan.contains("skew=true"), s"AQE must mark the skewed join:\n$plan")
      assert(plan.contains("AQEShuffleRead coalesced and skewed"),
        s"AQE must split the hot partition into skewed reader splits:\n$plan")
    } finally saved.foreach {
      case (k, Some(v)) => spark.conf.set(k, v)
      case (k, None) => spark.conf.unset(k)
    }
  }

  test("bucketed fact-fact join: SMJ + per-order agg with zero Exchange nodes") {
    val df = Relational.bucketedJoinRevenue(spark, sfDir)
    val plan = df.queryExecution.executedPlan.toString
    assert(plan.contains("SortMergeJoin"), s"co-bucketed join must SMJ:\n$plan")
    // the whole point of the bucketed layout: no Exchange anywhere —
    // not on either join side, not for the orderkey-keyed aggregate
    assert(!plan.contains("Exchange"), s"bucketed plan must have zero Exchange nodes:\n$plan")
    assert(plan.contains("TakeOrderedAndProject"), "top-k must not globally sort")
    // and the mirrors hold exactly the source rows
    assert(df.count() == 10)
  }

  test("ewma anomalies: a spike flags only once the state is baked") {
    import spark.implicits._
    val dir = java.nio.file.Files.createTempDirectory("graft-ewma").toString
    // element "a": 12 alternating baseline points, a spike at n=13
    // (baked, must flag), recovery, then nothing else flags.
    // element "b": a spike at n=5 (unbaked, must NOT flag).
    val a = (0 until 12).map(i => ("a", i.toLong, if (i % 2 == 0) 10.0 else 12.0)) ++
      Seq(("a", 12L, 1000.0), ("a", 13L, 11.0))
    val b = (0 until 4).map(i => ("b", i.toLong, if (i % 2 == 0) 5.0 else 6.0)) ++
      Seq(("b", 4L, 500.0))
    (a ++ b).zipWithIndex.map { case ((el, s, v), id) => (el, s, v, id.toLong) }
      .toDF("event_type", "s", "value", "event_id")
      .select(col("event_type"), timestamp_micros(col("s") * 1000000L).as("ts"),
        col("value"), col("event_id"))
      .coalesce(1).write.parquet(s"$dir/events.parquet")
    val out = graft.ops.EventAnalytics.ewmaAnomalies(spark, dir).collect()
      .map(r => (r.getString(0), r.getLong(1), r.getDouble(2), r.getBoolean(5)))
    val flagged = out.filter(_._4).map(p => (p._1, p._3)).toSeq
    assert(flagged == Seq(("a", 1000.0)), s"only the baked spike flags, got ${out.mkString(",")}")
  }

  test("batch ewma scan equals the flatMapGroupsWithState detector on the same store") {
    import spark.implicits._
    val ev = graft.sources.Tables.events(spark, sfDir)
    val src = ev
      .filter(col("event_type").isNotNull && col("ts").isNotNull && col("value").isNotNull)
      .select(col("event_type"), timestamp_micros(expr("ts DIV 1000")).as("ts"), col("value"))
    // flatMapGroupsWithState runs on a batch Dataset with empty state
    val stream = EventIngest.anomalyStream(src).collect()
      .map(p => (p.element, p.ts.getTime * 1000L + p.ts.getNanos / 1000L % 1000L,
        BigDecimal(p.ewma).setScale(6, BigDecimal.RoundingMode.HALF_UP),
        BigDecimal(p.zscore).setScale(6, BigDecimal.RoundingMode.HALF_UP),
        p.isAnomaly)).toSet
    val batch = graft.ops.EventAnalytics.ewmaAnomalies(spark, sfDir).collect()
      .map(r => (r.getString(0), r.getLong(1),
        BigDecimal(r.getDouble(3)).setScale(6, BigDecimal.RoundingMode.HALF_UP),
        BigDecimal(r.getDouble(4)).setScale(6, BigDecimal.RoundingMode.HALF_UP),
        r.getBoolean(5))).toSet
    assert(batch.nonEmpty && batch == stream,
      s"batch ${batch.size} vs stream ${stream.size}; diff ${(batch diff stream).take(3)}")
  }

  test("session bound filters survive Catalyst pushdown (aggregate-derived bounds)") {
    // round-14 regression, found by the 1M soak: a filter on a
    // w.end-derived column is pushed BELOW MergingSessions (Catalyst
    // treats grouping expressions as stable, but the merge rewrites
    // them), evaluating on per-event pre-merge windows — it split every
    // session whose neighbor events straddled the cutoff. Sessions now
    // derive bounds from min/max AGGREGATES, which no filter can cross.
    // Fixture: two events 20 min apart (30-min gap ⇒ ONE session whose
    // end lies past the cutoff; the first event's pre-merge window end
    // does NOT). Under the old shape the filter kept a phantom
    // single-event session; the correct answer is zero rows.
    import spark.implicits._
    val dir = java.nio.file.Files.createTempDirectory("graft-sess-push").toString
    val t0 = 1700000000000L // ms
    Seq(
      (1L, new java.sql.Timestamp(t0), 5L, "a", 1.0, "{}"),
      (2L, new java.sql.Timestamp(t0 + 20L * 60000L), 5L, "a", 2.0, "{}"))
      .toDF("event_id", "ts", "user_id", "event_type", "value", "props")
      .write.parquet(s"$dir/events.parquet")
    val sessions = Relational.userSessions(spark, dir)
    val all = sessions.collect()
    assert(all.length == 1 && all.head.getLong(3) == 2L, s"must merge: ${all.toSeq}")
    val endUs = all.head.getLong(2)
    assert(endUs == (t0 + 20L * 60000L + 30L * 60000L) * 1000L,
      "session end = last event + gap")
    // cutoff between the first event's pre-merge window end and the
    // true merged end: the filtered result must be EMPTY (the session
    // is still open at the cutoff), not a phantom split
    val cutoff = (t0 + 35L * 60000L) * 1000L
    val closed = sessions.filter(col("session_end_us") <= cutoff).collect()
    assert(closed.isEmpty,
      s"filter pushed below the session merge resurrected a split: ${closed.toSeq}")
    // and a cutoff past the true end keeps the merged session intact
    val later = sessions.filter(col("session_end_us") <= endUs).collect()
    assert(later.length == 1 && later.head.getLong(3) == 2L)
  }

  test("streaming sessions equal the batch sessions filtered to the watermark-closed set") {
    // parity on the real store: AvailableNow's emitted set must be
    // exactly the batch gaps-and-islands sessions whose end clears the
    // final watermark (max event us, ms-floored, minus 1 day). The max
    // event time is recoverable from the batch output itself: every
    // session end = last event + gap.
    val gapUs = 30L * 60L * 1000000L
    val batch = Relational.userSessions(spark, sfDir).collect()
      .map(r => (r.getLong(0), r.getLong(1), r.getLong(2), r.getLong(3), r.getDouble(4)))
    val maxUs = batch.map(_._3).max - gapUs
    val wmUs = (maxUs / 1000L - 86400000L) * 1000L
    val expected = batch.filter(_._3 <= wmUs).toSeq
    val streamed = EventIngest.sessionsAvailableNow(spark, sfDir).collect()
      .map(r => (r.getLong(0), r.getLong(1), r.getLong(2), r.getLong(3), r.getDouble(4))).toSeq
    assert(streamed.nonEmpty && streamed == expected,
      s"stream ${streamed.length} rows vs batch-closed ${expected.length}")
  }

  test("file-source streaming ingest writes watermark-closed daily aggregates") {
    import spark.implicits._
    val base = java.nio.file.Files.createTempDirectory("graft-stream").toString
    val inDir = s"$base/in"; val outDir = s"$base/out"; val ckDir = s"$base/ck"
    val day = 86400000L
    def ts(ms: Long) = new java.sql.Timestamp(ms)
    // two closed days + one open day (watermark holds the last back)
    Seq(
      (1L, ts(day * 100 + 1000), 10L, "a", 2.0, "{}"),
      (2L, ts(day * 100 + 2000), 11L, "a", 4.0, "{}"),
      (3L, ts(day * 101 + 1000), 12L, "a", 6.0, "{}"),
      (4L, ts(day * 105), 13L, "a", 0.0, "{}"))
      .toDF("event_id", "ts", "user_id", "event_type", "value", "props")
      .coalesce(1).write.parquet(inDir)
    val q = EventIngest.start(spark, inDir, outDir, ckDir)
    try q.processAllAvailable() finally q.stop()
    val out = spark.read.parquet(outDir)
      .select("element", "day_start", "n_obs", "avg_value").collect()
      .map(r => (r.getString(0), r.getTimestamp(1).getTime, r.getLong(2), r.getDouble(3))).toSet
    assert(out.contains(("a", day * 100, 2L, 3.0)), s"day-100 aggregate; got $out")
    assert(out.contains(("a", day * 101, 1L, 6.0)))
  }

  test("checkpointed file sink: restart is exactly-once, increments append cleanly") {
    import spark.implicits._
    val base = java.nio.file.Files.createTempDirectory("graft-restart").toString
    val inDir = s"$base/in"; val outDir = s"$base/out"; val ckDir = s"$base/ck"
    val day = 86400000L
    def ts(ms: Long) = new java.sql.Timestamp(ms)
    def rows(outDir: String) = spark.read.parquet(outDir)
      .select("element", "day_start", "n_obs").collect()
      .map(r => (r.getString(0), r.getTimestamp(1).getTime, r.getLong(2))).toSeq
    Seq((1L, ts(day * 200 + 1000), 1L, "a", 1.0, "{}"),
      (2L, ts(day * 200 + 2000), 2L, "a", 3.0, "{}"),
      (3L, ts(day * 205), 3L, "a", 0.0, "{}")) // advances the watermark
      .toDF("event_id", "ts", "user_id", "event_type", "value", "props")
      .coalesce(1).write.parquet(inDir)
    val q1 = EventIngest.start(spark, inDir, outDir, ckDir)
    try q1.processAllAvailable() finally q1.stop()
    val afterFirst = rows(outDir)
    assert(afterFirst.count(_._2 == day * 200) == 1, s"day-200 closed once: $afterFirst")
    // restart with the SAME checkpoint and UNCHANGED input: the sink
    // must not re-emit anything (exactly-once across restarts)
    val q2 = EventIngest.start(spark, inDir, outDir, ckDir)
    try q2.processAllAvailable() finally q2.stop()
    assert(rows(outDir).sorted == afterFirst.sorted,
      "restart with no new input must add zero rows")
    // drop an increment file; a third incarnation processes ONLY it
    Seq((4L, ts(day * 206 + 1000), 4L, "b", 5.0, "{}"),
      (5L, ts(day * 210), 5L, "b", 0.0, "{}"))
      .toDF("event_id", "ts", "user_id", "event_type", "value", "props")
      .coalesce(1).write.mode("append").parquet(inDir)
    val q3 = EventIngest.start(spark, inDir, outDir, ckDir)
    try q3.processAllAvailable() finally q3.stop()
    val afterThird = rows(outDir)
    assert(afterThird.count(_._2 == day * 200) == 1,
      s"old windows must not duplicate on restart: $afterThird")
    assert(afterThird.exists(r => r._1 == "b" && r._2 == day * 206),
      s"the increment's closed window must appear: $afterThird")
  }

  test("streaming dedup drops watermark-window duplicates and keeps distinct texts") {
    import spark.implicits._
    implicit val sq = spark.sqlContext
    val mem = MemoryStream[(java.sql.Timestamp, String)]
    val t0 = 86400000L * 19000
    mem.addData(
      (new java.sql.Timestamp(t0 + 1000), "alpha beta"),
      (new java.sql.Timestamp(t0 + 2000), "alpha  beta"),  // same normalized fingerprint
      (new java.sql.Timestamp(t0 + 3000), "gamma delta"),
      (new java.sql.Timestamp(t0 + 4000), "ALPHA BETA"))   // lowercased ⇒ duplicate again
    val q = EventIngest.dedupStream(mem.toDF().toDF("ts", "text"))
      .writeStream.format("memory").queryName("dedup_out").outputMode("append").start()
    try {
      q.processAllAvailable()
      val texts = spark.table("dedup_out").select("text").collect().map(_.getString(0))
      assert(texts.length == 2, s"expected 2 survivors, got ${texts.mkString("|")}")
      val fps = texts.map(t => t.toLowerCase.trim.replaceAll("\\s+", " ")).toSet
      assert(fps == Set("alpha beta", "gamma delta"))
    } finally q.stop()
  }

  test("streaming anomaly detector: custom EWMA state flags a level shift across batches") {
    import spark.implicits._
    implicit val sq = spark.sqlContext
    val mem = MemoryStream[(String, java.sql.Timestamp, Double)]
    val t0 = 86400000L * 19000
    def ev(i: Int, v: Double) = ("a", new java.sql.Timestamp(t0 + i * 1000L), v)
    // batch 1: a stable signal establishes the state
    mem.addData((1 to 20).map(i => ev(i, 10.0 + (if (i % 2 == 0) 0.1 else -0.1))): _*)
    val q = EventIngest.anomalyStream(
        mem.toDF().toDF("event_type", "ts", "value"), alpha = 0.1, zThreshold = 3.0)
      .writeStream.format("memory").queryName("anomaly_out").outputMode("append").start()
    try {
      q.processAllAvailable()
      // batch 2: a 100x spike must flag against the carried-over state
      mem.addData(ev(21, 1000.0), ev(22, 10.0))
      q.processAllAvailable()
      val rows = spark.table("anomaly_out")
        .select("value", "zscore", "isAnomaly").collect()
        .map(r => (r.getDouble(0), r.getDouble(1), r.getBoolean(2)))
      assert(rows.length == 22)
      val spike = rows.filter(_._1 == 1000.0)
      assert(spike.length == 1 && spike.head._3, s"spike must flag, got ${spike.mkString}")
      assert(spike.head._2 > 3.0)
      // the stable stretch must NOT flag (state crossed the batch boundary)
      assert(rows.filter(_._1 < 100).forall(!_._3), "stable points must not flag")
    } finally q.stop()
  }

  test("streaming daily aggregate matches the batch plan on the same data") {
    import spark.implicits._
    implicit val sq = spark.sqlContext
    val mem = MemoryStream[(java.sql.Timestamp, String, Double)]
    val day0 = 86400000L * 19000
    mem.addData(
      (new java.sql.Timestamp(day0 + 1000), "a", 1.0),
      (new java.sql.Timestamp(day0 + 2000), "a", 3.0),
      (new java.sql.Timestamp(day0 + 86400000L + 1000), "a", 5.0),
      (new java.sql.Timestamp(day0 + 3000), "b", 7.0))
    val stream = mem.toDF().toDF("ts", "event_type", "value")
    val q = EventIngest.dailyAggregate(stream)
      .writeStream.format("memory").queryName("daily_out").outputMode("append").start()
    try {
      q.processAllAvailable()
      // append mode emits only watermark-closed windows; advance the clock
      mem.addData((new java.sql.Timestamp(day0 + 86400000L * 5), "a", 0.0))
      q.processAllAvailable()
      val out = spark.table("daily_out").collect()
        .map(r => (r.getString(0), r.getTimestamp(1).getTime, r.getLong(2), r.getDouble(3)))
      assert(out.contains(("a", day0, 2L, 4.0)), s"day-0 'a' aggregate; got ${out.mkString(",")}")
      assert(out.contains(("b", day0, 1L, 7.0)))
      assert(out.contains(("a", day0 + 86400000L, 1L, 5.0)))
    } finally q.stop()
  }

  test("temperature mix flattens: small strata up-sampled, large down-sampled, shares sum to 1") {
    val rows = graft.ops.Curation.corpusTemperatureMix(spark, sfDir).collect()
      .map(r => (r.getDouble(3), r.getDouble(4), r.getDouble(5)))
    assert(rows.length > 1)
    assert(math.abs(rows.map(_._2).sum - 1.0) < 1e-3, "tempered shares sum to 1")
    val smallest = rows.minBy(_._1); val largest = rows.maxBy(_._1)
    assert(smallest._3 > 1.0, s"low-resource stratum must up-sample: $smallest")
    assert(largest._3 < 1.0, s"high-resource stratum must down-sample: $largest")
    // alpha = 0.5 preserves the share ORDER while compressing ratios
    assert(rows.sortBy(_._1).map(_._2).sameElements(rows.map(_._2).sorted),
      "tempering is monotone in the raw share")
  }

  test("series features: linear series has exact slope and r1 = 1, constant degrades to NULLs") {
    import spark.implicits._
    val dir = java.nio.file.Files.createTempDirectory("graft-feat").toString
    val rows =
      (1 to 10).map(i => (i.toLong, new java.sql.Timestamp(i * 60000L), "lin", 2.0 * i + 3.0)) ++
      (1 to 8).map(i => (100L + i, new java.sql.Timestamp(i * 60000L), "const", 4.0))
    rows.toDF("event_id", "ts", "event_type", "value")
      .coalesce(1).write.parquet(s"$dir/events.parquet")
    val f = graft.engine.SeriesFeatures.seriesFeatures(spark, dir).collect()
      .map(r => r.getString(0) -> r).toMap
    val lin = f("lin")
    assert(lin.getLong(1) == 10L)
    assert(math.abs(lin.getDouble(2) - 14.0) < 1e-9, "mean of 5,7,...,23")
    assert(math.abs(lin.getDouble(4) - 2.0) < 1e-9, "OLS slope of 2i+3")
    assert(math.abs(lin.getDouble(5) - 1.0) < 1e-9, "arithmetic progression ⇒ r1 = 1")
    val c = f("const")
    assert(c.getDouble(3) == 0.0, "constant ⇒ std 0")
    assert(c.getDouble(4) == 0.0, "constant ⇒ slope 0")
    assert(c.isNullAt(5), "constant ⇒ r1 undefined (zero variance)")
  }

  test("approx table profile: HLL++ NDV within ±5% of exact, per column") {
    val exact = graft.ops.Relational.tableProfile(spark, sfDir).collect()
      .map(r => r.getString(0) -> r.getLong(3)).toMap
    val approx = graft.ops.Relational.tableProfileApprox(spark, sfDir).collect()
      .map(r => (r.getString(0), r.getLong(1), r.getLong(2), r.getLong(3)))
    assert(approx.length == exact.size)
    approx.foreach { case (c, nRows, nNull, nd) =>
      val ex = exact(c)
      assert(math.abs(nd - ex) <= math.max(1L, (ex * 0.05).toLong),
        s"$c: approx NDV $nd vs exact $ex exceeds 5%")
      assert(nRows > 0 && nNull >= 0)
    }
  }

  test("sorted mirror append: increment lands prunable, slices stay exact") {
    import spark.implicits._
    val dir = java.nio.file.Files.createTempDirectory("graft-append").toString
    val dayUs = 86400000000L
    def ev(day: Long, n: Int): Seq[(java.sql.Timestamp, Long, String, Double)] =
      (0 until n).map(i =>
        (new java.sql.Timestamp(day * 86400000L + i * 1000L), i.toLong, "view", 1.0))
    ev(19723L, 50).toDF("ts", "user_id", "event_type", "value")
      .coalesce(1).write.parquet(s"$dir/events.parquet")
    // base mirror: day 19723 only
    assert(graft.sources.LayoutStore.sorted(spark, dir).count() == 50)
    // append the next day WITHOUT rewriting the base
    val baseFiles = graft.sources.LayoutStore.sorted(spark, dir).inputFiles.toSet
    graft.sources.LayoutStore.appendBatch(spark, dir,
      ev(19724L, 30).toDF("ts", "user_id", "event_type", "value"))
    val after = graft.sources.LayoutStore.sorted(spark, dir)
    assert(after.count() == 80)
    assert(baseFiles.subsetOf(after.inputFiles.toSet), "append must not rewrite base files")
    // the slice over the appended day sees exactly the increment
    val day2 = java.time.LocalDate.ofEpochDay(19724L)
    val slice = graft.ops.EventAnalytics.eventsDaySlice(spark, dir, day2).collect()
    assert(slice.length == 1 && slice.head.getLong(1) == 30L,
      s"appended-day slice must count the increment: ${slice.mkString(",")}")
  }

  test("z-order mirror prunes BOTH day and user slices; ts-sort only day") {
    import spark.implicits._
    def scanRows(df: org.apache.spark.sql.DataFrame): Long = {
      df.collect()
      df.queryExecution.executedPlan.collectLeaves()
        .map(_.metrics("numOutputRows").value).sum
    }
    spark.conf.set("parquet.block.size", (16 * 1024).toString)
    val corpus = java.nio.file.Files.createTempDirectory("graft-zorder").toString
    // 30 days × 64 users, deterministic spread
    (0 until 6000).map { i =>
      (new java.sql.Timestamp(
        java.time.LocalDate.of(2024, 1, 1 + i % 30).toEpochDay * 86400000L + i * 3L),
        (i % 64).toLong, "view", 1.0)
    }.toDF("ts", "user_id", "event_type", "value")
      .coalesce(1).write.parquet(s"$corpus/events.parquet")
    try {
      val day = lit(java.time.LocalDate.of(2024, 1, 15).toEpochDay.toInt)
      val z = graft.sources.LayoutStore.zOrdered(spark, corpus)
      val total = z.count()
      val zUser = scanRows(z.filter(col("user_id") === 7L))
      val zDay = scanRows(z.filter(col("ts_day") === day))
      val tUser = scanRows(
        graft.sources.LayoutStore.sorted(spark, corpus).filter(col("user_id") === 7L))
      assert(zUser < total / 2, s"z-order must prune the user slice: $zUser of $total")
      assert(zDay < total / 2, s"z-order must prune the day slice too: $zDay of $total")
      assert(tUser > total / 2,
        s"the ts-sorted mirror cannot prune a user slice ($tUser of $total) — " +
          "that contrast is the z-order story")
      // and the registered query's rows are layout-independent
      val got = graft.ops.EventAnalytics.eventsUserSlice(spark, corpus).collect()
      assert(got.map(_.getLong(2)).sum == (0 until 6000).count(_ % 64 == 7),
        "the slice must count exactly user 7's rows")
    } finally spark.conf.unset("parquet.block.size")
  }

  test("plan gates: every plan-shape verdict holds") {
    val rows = graft.ops.PlanGates.planGates(spark, sfDir).collect()
      .map(r => r.getString(0) -> r.getBoolean(1))
    assert(rows.length == 59)
    val failed = rows.filterNot(_._2).map(_._1)
    assert(failed.isEmpty, s"plan-shape regressions: ${failed.mkString(", ")}")
  }

  test("fuzzy key pairs: pigeonhole equi-join equals brute-force hamming") {
    val keyed = spark.read.parquet(s"$sfDir/documents.parquet")
      .filter(length(trim(coalesce(col("text"), lit("")))) > 0)
      .select(col("doc_id"), rpad(lower(substring(col("text"), 1, 24)), 24, "\u0001").as("key"))
      .collect().map(r => (r.getLong(0), r.getString(1)))
    val brute = (for {
      (ida, ka) <- keyed; (idb, kb) <- keyed if ida < idb
      d = ka.zip(kb).count { case (x, y) => x != y } if d <= 2
    } yield (ida, idb, d)).toSet
    val got = NearDup.fuzzyKeyPairs(spark, sfDir).collect()
      .map(r => (r.getLong(0), r.getLong(1), r.getInt(2))).toSet
    assert(got == brute,
      s"pigeonhole join must be exact: missing ${(brute -- got).take(3)}, extra ${(got -- brute).take(3)}")
    assert(brute.nonEmpty, "corpus should contain fuzzy-key pairs or the test is vacuous")
  }

  test("fuzzy key pairs: distance boundary and the shift blind spot") {
    import spark.implicits._
    val dir = java.nio.file.Files.createTempDirectory("graft-fuzzy").toString
    val base = "the quick brown fox jump" // exactly 24 chars
    Seq(
      (0L, "en", "s", base + " extra tail"),
      (1L, "en", "s", "thE quick brown fox jump"), // dist 1 (case-folded: 0... lower() folds E->e => dist 0)
      (2L, "en", "s", "the quick crown fax jump"), // 2 substitutions
      (3L, "en", "s", "the quack crewn fax jomp"), // 4 substitutions — out
      (4L, "en", "s", "xthe quick brown fox jum") // 1-char SHIFT: hamming-far by design
    ).toDF("doc_id", "lang", "source", "text")
      .coalesce(1).write.parquet(s"$dir/documents.parquet")
    val got = NearDup.fuzzyKeyPairs(spark, dir).collect()
      .map(r => ((r.getLong(0), r.getLong(1)), r.getInt(2))).toMap
    assert(got.get((0L, 1L)).contains(0), "case flip folds to distance 0")
    assert(got.get((0L, 2L)).contains(2), "two substitutions kept at the boundary")
    assert(!got.keySet.exists(p => p._1 == 3L || p._2 == 3L), "distance 4 excluded")
    assert(!got.contains((0L, 4L)),
      "a positional shift is OUT of scope for the hamming tier (shingle tiers own it)")
  }

  test("fuzzy key pairs: random tiny-alphabet corpora keep pigeonhole exact") {
    import spark.implicits._
    // alphabet {a,b,c} over short strings maximizes boundary cases:
    // many pairs sit exactly at distance 2 and 3, and shared chunks
    // are common — the regime where a blocking bug would show
    (0 until 4).foreach { sample =>
      val rng = new java.util.Random(1000L + sample)
      val docs = (0 until 40).map { i =>
        val len = 6 + rng.nextInt(24)
        val s = Array.fill(len)(('a' + rng.nextInt(3)).toChar).mkString
        (i.toLong, "en", "s", s)
      }
      val dir = java.nio.file.Files.createTempDirectory(s"graft-fzp$sample").toString
      docs.toDF("doc_id", "lang", "source", "text")
        .coalesce(1).write.parquet(s"$dir/documents.parquet")
      val keyed = docs.map { case (id, _, _, t) =>
        (id, t.toLowerCase.take(24).padTo(24, '\u0001').mkString)
      }
      val brute = (for {
        (ida, ka) <- keyed; (idb, kb) <- keyed if ida < idb
        d = ka.zip(kb).count { case (x, y) => x != y } if d <= 2
      } yield (ida, idb, d)).toSet
      val got = NearDup.fuzzyKeyPairs(spark, dir).collect()
        .map(r => (r.getLong(0), r.getLong(1), r.getInt(2))).toSet
      assert(got == brute, s"sample $sample: missing ${(brute -- got).take(3)}, " +
        s"extra ${(got -- brute).take(3)}")
    }
  }

  test("stratified sample: random skewed strata keep two-phase ≡ naive") {
    import spark.implicits._
    import org.apache.spark.sql.expressions.Window
    (0 until 3).foreach { sample =>
      val rng = new java.util.Random(2000L + sample)
      // skewed stratum sizes (1 to ~200 docs) across few strata — the
      // shape where phase-1 salting must not lose a true top-n row
      val docs = (0 until 3).flatMap { li =>
        (0 until 1 + rng.nextInt(4)).flatMap { si =>
          val size = 1 + rng.nextInt(if (si == 0) 200 else 20)
          (0 until size).map { _ =>
            (rng.nextLong().abs, s"l$li", s"s$si",
              Array.fill(8)(('a' + rng.nextInt(26)).toChar).mkString)
          }
        }
      }
      val dir = java.nio.file.Files.createTempDirectory(s"graft-ssp$sample").toString
      docs.toDF("doc_id", "lang", "source", "text")
        .coalesce(2).write.parquet(s"$dir/documents.parquet")
      val n = 1 + rng.nextInt(6)
      val got = graft.ops.Curation.stratifiedSample(spark, dir, n = n, salts = 5)
        .collect().map(r => (r.getString(0), r.getString(1), r.getInt(2), r.getLong(3))).toSet
      val w = Window.partitionBy(col("lang"), col("source"))
        .orderBy(col("rk"), col("doc_id"))
      val want = spark.read.parquet(s"$dir/documents.parquet")
        .select(col("doc_id"), col("lang"), col("source"),
          md5(concat(coalesce(col("text"), lit("")), lit("|"),
            col("doc_id").cast("string"))).as("rk"))
        .withColumn("sample_rank", row_number().over(w))
        .filter(col("sample_rank") <= n)
        .collect().map(r => (r.getString(1), r.getString(2), r.getInt(4), r.getLong(0))).toSet
      assert(got == want, s"sample $sample n=$n: diverged")
    }
  }

  test("stratified sample: salted two-phase top-n equals the naive global rank") {
    import org.apache.spark.sql.expressions.Window
    val got = graft.ops.Curation.stratifiedSample(spark, sfDir, n = 10).collect()
      .map(r => (r.getString(0), r.getString(1), r.getInt(2), r.getLong(3)))
    // the naive form the oracle runs: one global rank per stratum
    val w = Window.partitionBy(col("lang"), col("source"))
      .orderBy(col("rk"), col("doc_id"))
    val want = spark.read.parquet(s"$sfDir/documents.parquet")
      .select(col("doc_id"), col("lang"), col("source"),
        md5(concat(coalesce(col("text"), lit("")), lit("|"),
          col("doc_id").cast("string"))).as("rk"))
      .withColumn("sample_rank", row_number().over(w))
      .filter(col("sample_rank") <= 10)
      .collect()
      .map(r => (r.getString(1), r.getString(2), r.getInt(4), r.getLong(0)))
    assert(got.toSet == want.toSet,
      s"two-phase and naive rank diverge: ${(got.toSet -- want.toSet).take(3)} vs ${(want.toSet -- got.toSet).take(3)}")
    // exactly min(n, |stratum|) rows per stratum, ranks 1..k contiguous
    got.groupBy(t => (t._1, t._2)).foreach { case (_, rows) =>
      assert(rows.map(_._3).sorted.sameElements(1 to rows.length))
      assert(rows.length <= 10)
    }
  }

  test("stratified sample: a stratum smaller than n returns all its rows") {
    import spark.implicits._
    val dir = java.nio.file.Files.createTempDirectory("graft-strat").toString
    // stratum (en, tiny) has 3 docs < n=5; (en, big) has 20
    val rows = (0 until 3).map(i => (i.toLong, "en", "tiny", s"doc $i text")) ++
      (100 until 120).map(i => (i.toLong, "en", "big", s"doc $i text"))
    rows.toDF("doc_id", "lang", "source", "text")
      .coalesce(1).write.parquet(s"$dir/documents.parquet")
    val got = graft.ops.Curation.stratifiedSample(spark, dir, n = 5, salts = 4).collect()
      .map(r => (r.getString(1), r.getInt(2), r.getLong(3)))
    assert(got.count(_._1 == "tiny") == 3, "undersized stratum keeps everything")
    assert(got.count(_._1 == "big") == 5)
  }

  test("time-sorted mirror prunes row groups a shuffled layout must decode") {
    def scanRows(df: org.apache.spark.sql.DataFrame): Long = {
      df.collect()
      df.queryExecution.executedPlan.collectLeaves()
        .map(_.metrics("numOutputRows").value).sum
    }
    // own temp CORPUS (sharing the sf0.001 mirror races with whichever
    // test builds it first under a different block size — the LayoutStore
    // memo is per (app, corpus)) + small row groups so 3000 rows span
    // many groups
    import spark.implicits._
    spark.conf.set("parquet.block.size", (16 * 1024).toString)
    val corpus = java.nio.file.Files.createTempDirectory("graft-prune").toString
    (0 until 3000).map { i =>
      (new java.sql.Timestamp(
        java.time.LocalDate.of(2024, 1, 1 + i % 30).toEpochDay * 86400000L + i * 7L),
        i.toLong, "view", 1.0)
    }.toDF("ts", "user_id", "event_type", "value")
      .coalesce(1).write.parquet(s"$corpus/events.parquet")
    val shuffledDir = java.nio.file.Files.createTempDirectory("graft-layout").toString + "/ev"
    try {
      graft.sources.LayoutStore.sorted(spark, corpus)
        // deliberately destroy the time order, keep everything else
        .repartition(4, col("user_id"))
        .write.parquet(shuffledDir)
      val day = lit(java.time.LocalDate.of(2024, 1, 15).toEpochDay.toInt)
      val slice = graft.ops.EventAnalytics.eventsDaySlice(spark, corpus)
      val sortedScan = scanRows(
        graft.sources.LayoutStore.sorted(spark, corpus).filter(col("ts_day") === day))
      val shuffledScan = scanRows(
        spark.read.parquet(shuffledDir).filter(col("ts_day") === day))
      val total = graft.sources.LayoutStore.sorted(spark, corpus).count()
      // the filter must reach the parquet reader to prune at all
      val plan = slice.queryExecution.executedPlan.toString
      assert(plan.contains("PushedFilters") && plan.contains("ts_day"),
        s"day predicate must be pushed to the scan:\n$plan")
      assert(sortedScan < total / 2,
        s"sorted layout must row-group-prune: scan decoded $sortedScan of $total")
      assert(sortedScan < shuffledScan,
        s"sorted scan ($sortedScan rows) must beat the shuffled layout ($shuffledScan)")
    } finally spark.conf.unset("parquet.block.size")
  }

  test("cusum flags a planted level shift at its onset and stays quiet on a steady series") {
    import spark.implicits._
    // 30 days, 4 events/day; prefix = first 12 days. "steady" alternates
    // 10/11 forever (σ0 = 0.5, |z| = 1 → the ±0.5 drift never
    // accumulates past h = 5); "shift" jumps to 60 on day 21 → z = 99
    // crosses the decision interval the same day
    val dir = java.nio.file.Files.createTempDirectory("graft-cusum-test").toString
    val rows = for {
      el <- Seq("steady", "shift"); d <- 1 to 30; r <- 1 to 4
    } yield {
      val base = 10.0 + (d % 2)
      val v = if (el == "shift" && d > 20) 60.0 else base
      ((el.hashCode.toLong * 1000 + d * 10 + r),
        java.sql.Timestamp.valueOf(f"2024-03-${d}%02d 12:00:00"),
        1L, el, v, "{}")
    }
    rows.toDF("event_id", "ts", "user_id", "event_type", "value", "props")
      .write.mode("overwrite").parquet(s"$dir/events.parquet")
    val out = graft.ops.EventAnalytics.cusumShifts(spark, dir).collect()
      .map(r => (r.getString(0), r.getDate(1).toLocalDate.getDayOfMonth,
        r.getBoolean(5)))
    assert(out.count(_._1 == "shift") == 18 && out.count(_._1 == "steady") == 18,
      s"18 scored days per element, got ${out.length}")
    val firstFlag = out.filter(t => t._1 == "shift" && t._3).map(_._2).min
    assert(firstFlag == 21, s"shift onset day 21 must flag immediately, got $firstFlag")
    assert(out.filter(t => t._1 == "shift" && t._2 < 21).forall(!_._3),
      "no flag before the planted shift")
    assert(out.filter(_._1 == "steady").forall(!_._3),
      "the alternating steady series must never flag")
  }

  test("incremental agg: maintained store ≡ full recompute; compaction is a semantic no-op") {
    val maintained = graft.ops.IncrementalAgg.maintainedDailyAgg(spark, sfDir)
    val direct = {
      val ev = graft.sources.Tables.events(spark, sfDir)
      ev.filter(col("ts").isNotNull)
        .groupBy(col("event_type"), graft.sources.Tables.tsDay("ts").as("day"))
        .agg(count(lit(1)).cast("long").as("n"),
          round(sum(col("value").cast("decimal(18,4)")).cast("double"), 6).as("total"))
        .orderBy("event_type", "day")
    }
    val m = maintained.collect().map(_.toSeq)
    assert(m.length == direct.count().toInt && m.sameElements(direct.collect().map(_.toSeq)),
      "maintained partials must be indistinguishable from a full recompute")
    // compaction folds the multi-batch store to one partial set without
    // moving a bit (exact types + distributive aggregates)
    val store = java.nio.file.Files.createTempDirectory("graft-incr-test").toString
    val ev = graft.sources.Tables.events(spark, sfDir).filter(col("ts").isNotNull)
      .select(col("event_type"), graft.sources.Tables.tsDay("ts").as("day"), col("value"))
    // five appends of interleaved slices (modulus on the day ordinal)
    (0 until 5).foreach { k =>
      ev.filter(unix_date(col("day")) % 5 === k)
        .groupBy(col("event_type"), col("day"))
        .agg(count(lit(1)).cast("long").as("pn"),
          sum(col("value").cast("decimal(18,4)")).cast("decimal(30,4)").as("psum"))
        .write.mode("append").parquet(graft.ops.IncrementalAgg.genPath(store))
    }
    def readMerged() = spark.read.parquet(graft.ops.IncrementalAgg.genPath(store))
      .groupBy(col("event_type"), col("day"))
      .agg(sum(col("pn")).cast("long").as("n"),
        round(sum(col("psum")).cast("double"), 6).as("total"))
      .orderBy("event_type", "day").collect().map(_.toSeq)
    def partFiles() = new java.io.File(graft.ops.IncrementalAgg.genPath(store))
      .listFiles().count(_.getName.endsWith(".parquet"))
    val before = readMerged()
    val filesBefore = partFiles()
    graft.ops.IncrementalAgg.compact(spark, store)
    val filesAfter = partFiles()
    assert(readMerged().sameElements(before), "compaction must not change the merged view")
    assert(filesAfter < filesBefore,
      s"compaction must shrink the partial store ($filesBefore → $filesAfter files)")
  }

  test("scd2 merge: every branch pinned — unchanged, no-op re-send, update, delete, insert") {
    import spark.implicits._
    def cust(rows: Seq[(Long, String, Integer, java.lang.Double, String)]) =
      rows.toDF("c_custkey", "c_name", "c_nationkey", "c_acctbal", "c_mktsegment")
    val base = cust(Seq(
      (1L, "a", 1, 10.0, "S"),          // untouched
      (2L, "b", 2, 20.0, "S"),          // no-op re-send (identical)
      (3L, "c", null, 30.0, "S"),       // no-op with a NULL attribute
      (4L, "d", 4, 40.0, "S"),          // genuine update
      (5L, "e", 5, 50.0, "S")))         // tombstoned
    val changes = cust(Seq(
      (2L, "b", 2, 20.0, "S"),
      (3L, "c", null, 30.0, "S"),
      (4L, "d", 4, 41.0, "S"),
      (6L, "f", 6, 60.0, "S")))         // insert
      .withColumn("op", when(col("c_custkey") === 5L, "delete").otherwise("upsert"))
      .unionByName(cust(Seq((5L, null, null, null, null)))
        .withColumn("op", lit("delete")))
    val out = graft.ops.Scd.applyScd2(base, changes)
      .collect().map(r => (r.getLong(0), r.getInt(5), r.getLong(6),
        if (r.isNullAt(7)) -1L else r.getLong(7), r.getBoolean(8)))
    val expected = Seq(
      (1L, 1, 0L, -1L, true),           // untouched current
      (2L, 1, 0L, -1L, true),           // no-op: still ONE current row
      (3L, 1, 0L, -1L, true),           // null <=> null is no change
      (4L, 1, 0L, 1L, false), (4L, 2, 1L, -1L, true), // closed + reopened
      (5L, 1, 0L, 1L, false),           // closed, no successor
      (6L, 1, 1L, -1L, true))           // inserted at the batch epoch
    assert(out.toSeq == expected, s"got ${out.mkString(",")}")
    // the updated attribute must actually carry the new value
    val v2 = graft.ops.Scd.applyScd2(base, changes)
      .filter(col("c_custkey") === 4L && col("version") === 2).collect()(0)
    assert(v2.getDouble(3) == 41.0)
  }

  test("dq checks: planted violations are counted; budgets cross-multiply exactly") {
    import spark.implicits._
    // 20 rows: 1 null key, keys {1,1,2..17} (one duplicated pair), 1
    // null text — exactly AT the 5% budget boundary (1·20 ≤ 20), which
    // must pass; a second corpus with 2 nulls must fail it
    val atBudget = ((null.asInstanceOf[java.lang.Long], "t") +:
      (1L to 18L).map(i => (java.lang.Long.valueOf(if (i == 18L) 1L else i), "t")) :+
      (java.lang.Long.valueOf(19L), null.asInstanceOf[String]))
      .toDF("id", "text")
    val rows = graft.ops.DataQuality.checksFor(atBudget, "id", Some("text"))
      .collect().map(r => r.getString(0) -> ((r.getLong(1), r.getBoolean(2)))).toMap
    assert(rows("id_null") == ((1L, false)), s"got ${rows("id_null")}")
    // 20 rows, 18 distinct non-null keys → 2 unaccounted (1 null + 1 dup)
    assert(rows("id_dup") == ((2L, false)), s"got ${rows("id_dup")}")
    assert(rows("text_null_budget") == ((1L, true)),
      s"1/20 nulls is AT the 5% budget and must pass: ${rows("text_null_budget")}")
    val overBudget = (1L to 18L).map(i => (i, "t")).toDF("id", "text")
      .unionByName(Seq((19L, null.asInstanceOf[String]),
        (20L, null.asInstanceOf[String])).toDF("id", "text"))
    val over = graft.ops.DataQuality.checksFor(overBudget, "id", Some("text"))
      .collect().map(r => r.getString(0) -> ((r.getLong(1), r.getBoolean(2)))).toMap
    assert(over("text_null_budget") == ((2L, false)),
      s"2/20 nulls must bust the 5% budget: ${over("text_null_budget")}")
  }

  test("dq checks: the shipped store validates clean, one fused aggregate per table") {
    val out = graft.ops.DataQuality.dqChecks(spark, sfDir)
    val rows = out.collect()
    assert(rows.length == 20, s"expected 20 checks, got ${rows.length}")
    val failed = rows.filter(!_.getBoolean(2)).map(_.getString(0))
    assert(failed.isEmpty, s"clean store must pass all checks; failed: ${failed.mkString(",")}")
    // the one-scan-per-table contract: no check multiplies table reads —
    // customer appears in exactly 2 plans (its fused agg + the RI dim
    // side), so the whole suite stays O(#tables) scans, and nothing
    // falls back to a non-equi join
    val plan = out.queryExecution.executedPlan.toString
    assert(!plan.contains("CartesianProduct") && !plan.contains("BroadcastNestedLoopJoin"),
      s"RI checks must stay equi-anti-joins:\n$plan")
  }

  test("order-count histogram: ON-clause predicate keeps filtered-out customers at count 0") {
    import spark.implicits._
    // customer 1: two qualifying orders; customer 2: ONLY a 5-LOW order
    // (must survive with count 0 — the ON-vs-WHERE distinction);
    // customer 3: no orders at all
    val dir = java.nio.file.Files.createTempDirectory("graft-q13-test").toString
    Seq((1L, "a", 0, 0.0, "S"), (2L, "b", 0, 0.0, "S"), (3L, "c", 0, 0.0, "S"))
      .toDF("c_custkey", "c_name", "c_nationkey", "c_acctbal", "c_mktsegment")
      .write.mode("overwrite").parquet(s"$dir/customer.parquet")
    Seq((10L, 1L, "O", 1.0, java.sql.Timestamp.valueOf("2024-01-01 00:00:00"), "1-URGENT"),
      (11L, 1L, "O", 1.0, java.sql.Timestamp.valueOf("2024-01-02 00:00:00"), "2-HIGH"),
      (12L, 2L, "O", 1.0, java.sql.Timestamp.valueOf("2024-01-03 00:00:00"), "5-LOW"))
      .toDF("o_orderkey", "o_custkey", "o_orderstatus", "o_totalprice", "o_orderdate", "o_orderpriority")
      .write.mode("overwrite").parquet(s"$dir/orders.parquet")
    val out = SparkEntry.queries("sql_order_count_histogram")(spark, dir).collect()
      .map(r => r.getLong(0) -> r.getLong(1)).toMap
    assert(out == Map(2L -> 1L, 0L -> 2L),
      s"low-only customer 2 and orderless customer 3 must land in the 0 bucket: $out")
  }

  /** Basket fixture for the A-Priori operators: needs > 1000 orders so
    * the 0.1% cross-multiplied item floor can actually prune (at 10
    * orders every count-1 item clears `1 * 1000 >= 10`). Filler part
    * 999 rides every order; parts 101/102 co-occur in orders 1-5; part
    * 104 appears once (1 * 1000 < 1200 → pruned before any pair). */
  private def writeBasketFixture(): String = {
    import spark.implicits._
    val dir = java.nio.file.Files.createTempDirectory("graft-basket-test").toString
    val rows =
      (1 to 1200).map(ok => (ok.toLong, 999L)) ++
        (1 to 5).flatMap(ok => Seq((ok.toLong, 101L), (ok.toLong, 102L))) ++
        Seq((6L, 101L), (6L, 104L))
    rows.toDF("l_orderkey", "l_partkey")
      .write.mode("overwrite").parquet(s"$dir/lineitem.parquet")
    dir
  }

  test("part affinity: item floor prunes before pairing; metrics are exact single divisions") {
    val dir = writeBasketFixture()
    val out = graft.ops.Affinity.partAffinity(spark, dir).collect()
      .map(r => (r.getLong(0), r.getLong(1)) ->
        ((r.getLong(2), r.getLong(3), r.getLong(4), r.getDouble(5), r.getDouble(6), r.getDouble(7))))
      .toMap
    assert(!out.keys.exists(k => k._1 == 104L || k._2 == 104L),
      s"count-1 part 104 must be item-pruned before any pair: ${out.keys}")
    assert(out.keySet == Set((101L, 102L), (101L, 999L), (102L, 999L)),
      s"exactly the three frequent pairs: ${out.keys}")
    // (101,102): n_a=6 (orders 1-5 + order 6), n_b=5, n_ab=5, N=1200
    val (na, nb, nab, support, confidence, lift) = out((101L, 102L))
    assert((na, nb, nab) == ((6L, 5L, 5L)))
    assert(support == 5.0 / 1200.0 && confidence == 5.0 / 6.0,
      s"single-division metrics must be IEEE-exact: $support, $confidence")
    assert(lift == (1200.0 * 5.0) / (6.0 * 5.0), s"lift: $lift")
  }

  test("triangle counting: planted triangle found once, pendant edge excluded") {
    import spark.implicits._
    // triangle {201,202,203} (each pair co-occurs twice), pendant edge
    // 201–204; filler keeps the corpus >1000 orders for the item floor
    val dir = java.nio.file.Files.createTempDirectory("graft-tri-test").toString
    val pairs = Seq((201L, 202L), (201L, 203L), (202L, 203L), (201L, 204L))
    val star = pairs.zipWithIndex.flatMap { case ((a, b), i) =>
      Seq(2 * i + 1, 2 * i + 2).flatMap(ok => Seq((ok.toLong, a), (ok.toLong, b)))
    }
    val filler = (9 to 1100).map(ok => (ok.toLong, 999L))
    (star ++ filler).toDF("l_orderkey", "l_partkey")
      .write.mode("overwrite").parquet(s"$dir/lineitem.parquet")
    val got = graft.ops.Graph.partTriangles(spark, dir).collect()
      .map(r => r.getLong(0) -> r.getLong(1)).toMap
    assert(got == Map(201L -> 1L, 202L -> 1L, 203L -> 1L),
      s"exactly the planted triangle, each member once, 204 absent: $got")
  }

  test("join skew report: a planted hot key flips the flag and crushes entropy") {
    import spark.implicits._
    val dir = java.nio.file.Files.createTempDirectory("graft-skew-test").toString
    // orderkey: 1000 keys once each + one key 1000 times → skew 500x;
    // partkey/suppkey stay uniform
    ((1 to 1000).map(i => (i.toLong, (i % 50).toLong, (i % 20).toLong)) ++
      (1 to 1000).map(_ => (7777L, 1L, 1L)))
      .toDF("l_orderkey", "l_partkey", "l_suppkey")
      .write.mode("overwrite").parquet(s"$dir/lineitem.parquet")
    val rows = Relational.joinSkewReport(spark, dir).collect()
      .map(r => r.getString(0) -> r).toMap
    val ok = rows("l_orderkey")
    assert(ok.getLong(3) == 1000L && ok.getBoolean(7),
      s"hot key must dominate max_freq and flip the flag: $ok")
    assert(!rows("l_suppkey").getBoolean(7), "uniform key must not flag")
    // closed form: H = 0.5·ln(2000) + 0.5·ln(2) ≈ 4.147 — far below the
    // uniform ceiling ln(1001) ≈ 6.909 the same keys would score unskewed
    assert(math.abs(ok.getDouble(6) - 4.147025) < 1e-5,
      s"hand-computed entropy expected: ${ok.getDouble(6)}")
    assert(ok.getDouble(6) < math.log(ok.getLong(2).toDouble) - 2.0,
      "hot key must crush entropy below the uniform ceiling")
  }

  test("k-core: the planted triangle survives peeling, the pendant chain does not") {
    import spark.implicits._
    // triangle {201,202,203} plus a pendant chain 201–204–205: the chain
    // peels away in two rounds (205 first, then 204), the triangle is
    // the 2-core with every member at within-core degree 2
    val dir = java.nio.file.Files.createTempDirectory("graft-kcore-test").toString
    val pairs = Seq((201L, 202L), (201L, 203L), (202L, 203L), (201L, 204L), (204L, 205L))
    val star = pairs.zipWithIndex.flatMap { case ((a, b), i) =>
      Seq(2 * i + 1, 2 * i + 2).flatMap(ok => Seq((ok.toLong, a), (ok.toLong, b)))
    }
    val filler = (11 to 1100).map(ok => (ok.toLong, 999L))
    (star ++ filler).toDF("l_orderkey", "l_partkey")
      .write.mode("overwrite").parquet(s"$dir/lineitem.parquet")
    val got = graft.ops.Graph.kCore(spark, dir).collect()
      .map(r => r.getLong(0) -> r.getLong(1)).toMap
    assert(got == Map(201L -> 2L, 202L -> 2L, 203L -> 2L),
      s"2-core must be exactly the triangle at degree 2: $got")
  }

  test("streaming heavy hitters: MG state survives batches, survivors cover heavy keys") {
    import spark.implicits._
    implicit val sq = spark.sqlContext
    val mem = MemoryStream[Long]
    // batch 1: key 7 heavy, noise spread; batch 2: key 9 surges — the
    // counter table must carry ACROSS micro-batches to see the total
    val b1 = Seq.fill(300)(7L) ++ (100L to 199L) ++ Seq.fill(80)(9L)
    val b2 = Seq.fill(220)(9L) ++ (200L to 299L) ++ Seq.fill(50)(7L)
    val q = EventIngest.heavyHitterStream(mem.toDS(), phi = 0.05, nShards = 4)
      .writeStream.format("memory").queryName("hh_out").outputMode("append").start()
    try {
      mem.addData(b1: _*); q.processAllAvailable()
      mem.addData(b2: _*); q.processAllAvailable()
      val rows = spark.table("hh_out").collect()
        .map(r => (r.getInt(0), r.getLong(1), r.getLong(2), r.getLong(3)))
      // latest emission per shard = the final counter tables
      val lastSeq = rows.groupBy(_._1).map { case (s, rs) => s -> rs.map(_._2).max }
      val fin = rows.filter(t => t._2 == lastSeq(t._1)).map(t => t._3 -> t._4).toMap
      val n = (b1.length + b2.length).toDouble
      // 7: 350 and 9: 300 both exceed phi*n = 52.5 → MUST survive, with
      // lower-bound counts never exceeding the true counts
      assert(fin.contains(7L) && fin.contains(9L), s"heavy keys must survive: $fin")
      assert(fin(7L) <= 350L && fin(9L) <= 300L, s"MG counts are lower bounds: $fin")
      assert(fin.size <= 4 * math.ceil(2.0 / 0.05).toInt, "state stays bounded")
      assert(fin.keys.forall(k => k == 7L || k == 9L || k >= 100L), s"no phantom keys: $fin")
    } finally q.stop()
  }

  test("streaming drift monitor: single-pass replay equals batch value_psi bit-for-bit") {
    val batch = graft.ops.EventAnalytics.valuePsi(spark, sfDir).collect()
      .map(r => r.getString(0) -> r.getDouble(1)).toMap
    val stream = EventIngest.driftMonitorAvailableNow(spark, sfDir).collect()
      .map(r => (r.getString(0), r.getLong(1), r.getDouble(3)))
    assert(stream.nonEmpty && stream.forall(_._2 == 1L),
      s"one file-source batch => exactly seq 1 per element: ${stream.mkString}")
    stream.foreach { case (el, _, psi) =>
      assert(psi == batch(el),
        s"stream psi for $el must equal batch value_psi: $psi vs ${batch(el)}")
    }
    assert(stream.map(_._1).toSet == batch.keySet)
  }

  test("streaming drift monitor: per-batch PSI stays flat then spikes on a planted shift") {
    import spark.implicits._
    implicit val sq = spark.sqlContext
    // frozen reference: deciles of 0..99 with uniform smoothed shares
    val refEdges = (1 to 9).map(i => i * 10.0 - 1.0).toArray
    val ref = Map("m" -> EventIngest.DriftRef(refEdges,
      Array.fill(10)((10L + 1L).toDouble / (100L + 10L).toDouble)))
    val mem = MemoryStream[(String, Double)]
    val q = EventIngest.driftStream(mem.toDS(), ref)
      .writeStream.format("memory").queryName("drift_out").outputMode("append").start()
    try {
      // batch 1 re-samples the reference distribution; batch 2 collapses
      // onto the top decile; batch 3 ("q") has no frozen reference
      mem.addData((0 until 100).map(i => ("m", i.toDouble)): _*)
      q.processAllAvailable()
      mem.addData((0 until 100).map(_ => ("m", 99.0)) ++ Seq(("q", 5.0)): _*)
      q.processAllAvailable()
      val rows = spark.table("drift_out").collect()
        .map(r => (r.getString(0), r.getLong(1), r.getLong(2), r.getDouble(3)))
      assert(rows.map(t => (t._1, t._2)).toSet == Set(("m", 1L), ("m", 2L)),
        s"seq must advance per batch and unknown elements stay silent: ${rows.mkString}")
      val psi = rows.map(t => t._2 -> t._4).toMap
      assert(psi(1L) == 0.0, s"identical distribution must score PSI 0, got ${psi(1L)}")
      assert(psi(2L) > 1.0, s"a collapsed distribution must spike PSI, got ${psi(2L)}")
    } finally q.stop()
  }

  test("cross-source dup matrix: count algebra matches hand-computed cells") {
    import spark.implicits._
    val dir = java.nio.file.Files.createTempDirectory("graft-xsrc-test").toString
    // norm group "alpha beta": 2 copies in s1 + 1 in s2 → within(s1)=1,
    // across(s1,s2)=2; group "gamma delta": 2 in s2 → within(s2)=1;
    // case/whitespace differences must normalize away
    val rows = Seq(
      (1L, "en", "s1", "alpha beta"), (2L, "en", "s1", "Alpha  Beta"),
      (3L, "en", "s2", "alpha beta"),
      (4L, "en", "s2", "gamma delta"), (5L, "en", "s2", "gamma delta"),
      (6L, "en", "s1", "unrelated text entirely"))
      .map { case (id, l, s, t) => (id, l, s, t, t.length.toLong) }
    rows.toDF("doc_id", "lang", "source", "text", "n_chars")
      .coalesce(1).write.parquet(s"$dir/documents.parquet")
    val got = graft.ops.Dedup.crossSourceDupMatrix(spark, dir).collect()
      .map(r => (r.getString(0), r.getString(1)) -> ((r.getLong(2), r.getLong(3)))).toMap
    assert(got(("s1", "s1"))._1 == 1L, s"within-s1 exact cell: $got")
    assert(got(("s1", "s2"))._1 == 2L, s"cross s1×s2 exact cell: $got")
    assert(got(("s2", "s2"))._1 == 1L, s"within-s2 exact cell: $got")
    // the exact copies are also jaccard-1 near pairs WITHIN a source
    // block; the cross-source cell stays exact-only (blocking)
    assert(got(("s1", "s2"))._2 == 0L, s"near tier is source-blocked: $got")
  }

  test("embedding spectrum: planted anisotropy concentrates the top component") {
    import spark.implicits._
    val dir = java.nio.file.Files.createTempDirectory("graft-spec-test").toString
    // dim 0 carries ~400× the variance of dim 1; dims 2-3 are constant
    val rows = (0 until 40).map { i =>
      (i.toLong, Seq((i - 20).toFloat, (i % 3) * 0.1f, 1.0f, 0.0f), 0)
    }
    rows.toDF("vec_id", "embedding", "label")
      .coalesce(1).write.parquet(s"$dir/embeddings.parquet")
    val out = graft.ops.Similarity.embeddingSpectrum(spark, dir, topK = 4).collect()
      .map(r => (r.getLong(0), r.getDouble(1), r.getDouble(2), r.getDouble(3)))
    assert(out.length == 4, s"4 components: ${out.mkString(",")}")
    assert(out.map(_._2).sameElements(out.map(_._2).sorted.reverse),
      s"eigenvalues descending: ${out.mkString(",")}")
    assert(out.head._3 > 0.95, s"planted dominant direction owns the variance: ${out.head}")
    assert(math.abs(out.last._4 - 1.0) < 1e-6,
      s"4 components exhaust a rank-2 spectrum: ${out.last}")
  }

  test("embedding whiten: whitened moments are mean 0 / var 1 / cross-cov 0") {
    // the real store: every reported component must whiten correctly
    val rows = graft.ops.Similarity.embeddingWhiten(spark, sfDir).collect()
      .map(r => (r.getLong(0), r.getDouble(2), r.getDouble(3), r.getDouble(4)))
    assert(rows.nonEmpty, "the store's embeddings must produce components")
    rows.foreach { case (c, m, v, x) =>
      assert(math.abs(m) <= 0.01, s"component $c whitened mean $m drifts from 0")
      assert(math.abs(v - 1.0) <= 0.05, s"component $c whitened variance $v is not 1")
      assert(math.abs(x) <= 0.05, s"component $c cross-covariance $x is not 0")
    }
    // planted anisotropy (same fixture family as the spectrum test):
    // whitening must equalize the 400x variance ratio to 1/1
    import spark.implicits._
    val dir = java.nio.file.Files.createTempDirectory("graft-whiten-test").toString
    (0 until 40).map { i =>
      (i.toLong, Seq((i - 20).toFloat, (i % 3) * 0.1f, 1.0f, 0.0f), 0)
    }.toDF("vec_id", "embedding", "label")
      .coalesce(1).write.parquet(s"$dir/embeddings.parquet")
    val planted = graft.ops.Similarity.embeddingWhiten(spark, dir, topK = 2).collect()
      .map(r => r.getLong(0) -> r.getDouble(3)).toMap
    assert(planted.size == 2 &&
      planted.values.forall(v => math.abs(v - 1.0) <= 0.01),
      s"whitening must equalize the planted 400x anisotropy: $planted")
  }

  test("shesd: planted spike in a seasonal series is rank-1; clean seasonal stays quiet") {
    import spark.implicits._
    val dir = java.nio.file.Files.createTempDirectory("graft-shesd-test").toString
    // 63 days of a strong weekly cycle + small deterministic period-5
    // jitter (so residual MAD is nonzero); "spiky" adds +40 on day 33 —
    // EWMA/MAD-style detectors would also fire on the ±6 weekly swing,
    // S-H-ESD must fire ONLY on the spike
    val rows = for {
      el <- Seq("clean", "spiky"); d <- 1 to 63; r <- 1 to 2
    } yield {
      val base = 10.0 + 6.0 * math.sin(2.0 * math.Pi * (d % 7) / 7.0) + ((d * 7) % 5) * 0.1
      val v = if (el == "spiky" && d == 33) base + 40.0 else base
      ((el.hashCode.toLong * 1000 + d * 10 + r),
        java.sql.Timestamp.valueOf(
          java.time.LocalDate.of(2024, 1, 1).plusDays(d - 1).atTime(12, 0)),
        1L, el, v, "{}")
    }
    rows.toDF("event_id", "ts", "user_id", "event_type", "value", "props")
      .write.mode("overwrite").parquet(s"$dir/events.parquet")
    val out = graft.ops.EventAnalytics.shEsdAnomalies(spark, dir).collect()
      .map(r => (r.getString(0), r.getDate(1).toLocalDate, r.getLong(5)))
    assert(out.forall(_._1 == "spiky"), s"clean seasonal series must not flag: ${out.mkString(",")}")
    val rank1 = out.filter(_._3 == 1L)
    assert(rank1.length == 1 && rank1.head._2 == java.time.LocalDate.of(2024, 2, 2),
      s"the planted spike (day 33 = 2024-02-02) must be the rank-1 anomaly: ${out.mkString(",")}")
  }

  test("heavy hitters: MG + exact recount equals brute force on a skewed fixture") {
    import spark.implicits._
    val dir = java.nio.file.Files.createTempDirectory("graft-hh-test").toString
    // key 7: 40% of 10k rows; keys 1..6: 1000 each; tail: singletons
    val rows = Seq.fill(4000)(7L) ++ (1L to 6L).flatMap(Seq.fill(1000)(_)) ++
      (1000L until 1000L + 0).map(identity)
    rows.toDF("l_partkey").repartition(8)
      .write.mode("overwrite").parquet(s"$dir/lineitem.parquet")
    val got = graft.ops.Sketches.heavyHitters(spark, dir, phi = 0.05).collect()
      .map(r => r.getLong(0) -> r.getLong(1)).toMap
    assert(got == Map(7L -> 4000L, 1L -> 1000L, 2L -> 1000L, 3L -> 1000L,
      4L -> 1000L, 5L -> 1000L, 6L -> 1000L),
      s"exactly the >5% keys with exact counts: $got")
  }

  test("fuzzy eval contamination: verbatim and near copies flag, unrelated doc doesn't") {
    import spark.implicits._
    import graft.ops.Curation
    val dir = java.nio.file.Files.createTempDirectory("graft-fuzzy-eval").toString
    val base = (1 to 40).map(i => s"tok$i").mkString(" ")
    val near = ((1 to 40).map(i => s"tok$i") ++ Seq("edit1", "edit2")).mkString(" ")
    val other = (1 to 40).map(i => s"zzz$i").mkString(" ")
    Seq((1L, base), (40L, base), (50L, near), (60L, other))
      .map { case (id, t) => (id, "en", "s", t, t.length.toLong) }
      .toDF("doc_id", "lang", "source", "text", "n_chars")
      .coalesce(1).write.parquet(s"$dir/documents.parquet")
    val rows = Curation.evalContaminationFuzzy(spark, dir).collect()
      .map(r => (r.getLong(0), r.getLong(1)) -> r.getDouble(2)).toMap
    // eval set = 3 lowest long-enough ids = {1, 40, 50}; the verbatim
    // pair is guaranteed (identical signatures ⇒ every band collides)
    assert(rows.contains((1L, 40L)) && rows((1L, 40L)) == 1.0,
      s"verbatim copy must flag with est 1.0: $rows")
    assert(rows.contains((1L, 50L)) && rows((1L, 50L)) >= 0.5,
      s"near copy (jaccard 0.952) must flag under the fixed hash family: $rows")
    assert(!rows.keys.exists(_._2 == 60L), s"unrelated doc must not flag: $rows")
  }

  test("graph distances: path graph hops exact, disconnected component unreached") {
    import spark.implicits._
    // path 201–202–203–204 from seed 201; {501,502} is a separate
    // component the BFS must never reach; filler clears the item floor
    val dir = java.nio.file.Files.createTempDirectory("graft-bfs-test").toString
    val pairs = Seq((201L, 202L), (202L, 203L), (203L, 204L), (501L, 502L))
    val star = pairs.zipWithIndex.flatMap { case ((a, b), i) =>
      Seq(2 * i + 1, 2 * i + 2).flatMap(ok => Seq((ok.toLong, a), (ok.toLong, b)))
    }
    val filler = (9 to 1100).map(ok => (ok.toLong, 999L))
    (star ++ filler).toDF("l_orderkey", "l_partkey")
      .write.mode("overwrite").parquet(s"$dir/lineitem.parquet")
    val got = graft.ops.Graph.graphDistances(spark, dir).collect()
      .map(r => r.getLong(0) -> r.getLong(1)).toMap
    assert(got == Map(201L -> 0L, 202L -> 1L, 203L -> 2L, 204L -> 3L),
      s"exact hop counts from seed 201 only: $got")
  }

  test("clustering coefficients: triangle members 1 or 1/3, pendant node 0") {
    import spark.implicits._
    val dir = java.nio.file.Files.createTempDirectory("graft-cc-test").toString
    val pairs = Seq((201L, 202L), (201L, 203L), (202L, 203L), (201L, 204L))
    val star = pairs.zipWithIndex.flatMap { case ((a, b), i) =>
      Seq(2 * i + 1, 2 * i + 2).flatMap(ok => Seq((ok.toLong, a), (ok.toLong, b)))
    }
    val filler = (9 to 1100).map(ok => (ok.toLong, 999L))
    (star ++ filler).toDF("l_orderkey", "l_partkey")
      .write.mode("overwrite").parquet(s"$dir/lineitem.parquet")
    val got = graft.ops.Graph.clusteringCoefficients(spark, dir).collect()
      .map(r => r.getLong(0) -> ((r.getLong(1), r.getLong(2), r.getDouble(3)))).toMap
    assert(got(201L) == ((3L, 1L, 1.0 / 3.0)), s"hub: ${got(201L)}")
    assert(got(202L) == ((2L, 1L, 1.0)) && got(203L) == ((2L, 1L, 1.0)))
    assert(got(204L) == ((1L, 0L, 0.0)), s"degree-1 pendant: ${got(204L)}")
  }

  test("part triples: level-3 candidates only from frequent pairs") {
    import spark.implicits._
    val dir = java.nio.file.Files.createTempDirectory("graft-tri3-test").toString
    // {301,302,303} co-ordered twice → one frequent triple; {304,305}
    // twice → a frequent pair that must NOT extend to any triple
    val triple = Seq(1L, 2L).flatMap(ok => Seq((ok, 301L), (ok, 302L), (ok, 303L)))
    val duo = Seq(3L, 4L).flatMap(ok => Seq((ok, 304L), (ok, 305L)))
    val filler = (5 to 1100).map(ok => (ok.toLong, 999L))
    (triple ++ duo ++ filler).toDF("l_orderkey", "l_partkey")
      .write.mode("overwrite").parquet(s"$dir/lineitem.parquet")
    val got = graft.ops.Affinity.partTriples(spark, dir).collect()
      .map(r => ((r.getLong(0), r.getLong(1), r.getLong(2)), r.getLong(3)))
    assert(got.toSeq == Seq(((301L, 302L, 303L), 2L)), s"got: ${got.toSeq}")
  }

  test("winsorize: nearest-rank bounds clamp exactly the planted tails") {
    import spark.implicits._
    val dir = java.nio.file.Files.createTempDirectory("graft-wins-test").toString
    // n=40, values 1..40: lo_rank = ceil(40/20) = 2 → p05 = 2,
    // hi_rank = ceil(19*40/20) = 38 → p95 = 38
    val rows = (1 to 40).map(i => (i.toLong,
      java.sql.Timestamp.valueOf("2024-03-01 12:00:00"), 1L, "m", i.toDouble, "{}"))
    rows.toDF("event_id", "ts", "user_id", "event_type", "value", "props")
      .write.mode("overwrite").parquet(s"$dir/events.parquet")
    val out = graft.ops.EventAnalytics.valueWinsorize(spark, dir).collect()
      .map(r => r.getLong(0) -> ((r.getDouble(3), r.getDouble(4), r.getDouble(5), r.getBoolean(6))))
      .toMap
    assert(out.size == 40)
    assert(out(1L) == ((2.0, 38.0, 2.0, true)), s"low tail: ${out(1L)}")
    assert(out(40L) == ((2.0, 38.0, 38.0, true)) && out(39L)._4,
      "both high-tail values clamp to 38")
    assert(out(2L) == ((2.0, 38.0, 2.0, false)), "boundary value is not clipped")
    assert((3L to 38L).forall(i => !out(i)._4), "interior untouched")
  }

  test("grouping sets: region rows and priority rows each partition the same order total") {
    val rows = SparkEntry.queries("sql_grouping_sets")(spark, sfDir).collect()
      .map(r => (r.getString(0), r.getString(1), r.getLong(2)))
    val byRegion = rows.filter(r => r._1 != "ALL" && r._2 == "ALL")
    val byPriority = rows.filter(r => r._1 == "ALL" && r._2 != "ALL")
    assert(byRegion.nonEmpty && byPriority.nonEmpty,
      s"both grouping sets must appear: ${rows.toSeq}")
    assert(rows.forall(r => (r._1 == "ALL") != (r._2 == "ALL")),
      "every row belongs to exactly one grouping set")
    assert(byRegion.map(_._3).sum == byPriority.map(_._3).sum,
      "the two groupings partition the same joined row set")
  }

  test("daily percentiles: nearest-rank p50/p95 selected from a planted day") {
    import spark.implicits._
    val dir = java.nio.file.Files.createTempDirectory("graft-dpct-test").toString
    val rows = (1 to 40).map(i => (i.toLong,
      java.sql.Timestamp.valueOf("2024-03-01 12:00:00"), 1L, "m", i.toDouble, "{}"))
    rows.toDF("event_id", "ts", "user_id", "event_type", "value", "props")
      .write.mode("overwrite").parquet(s"$dir/events.parquet")
    val out = graft.ops.EventAnalytics.dailyValuePercentiles(spark, dir).collect()
    assert(out.length == 1)
    val r = out.head
    assert((r.getLong(2), r.getDouble(3), r.getDouble(4)) == ((40L, 20.0, 38.0)),
      s"n/p50/p95: ${(r.getLong(2), r.getDouble(3), r.getDouble(4))}")
  }

  test("event transitions: lead pairs with microsecond+id tiebreak, probabilities exact") {
    import spark.implicits._
    val dir = java.nio.file.Files.createTempDirectory("graft-trans-test").toString
    // user 1: view(id=1) and click(id=2) at the SAME instant (tie →
    // event_id order), then purchase; user 2: view → view
    val t0 = java.sql.Timestamp.valueOf("2024-03-01 12:00:00")
    val t1 = java.sql.Timestamp.valueOf("2024-03-01 12:01:00")
    Seq((1L, t0, 1L, "view", 1.0, "{}"), (2L, t0, 1L, "click", 1.0, "{}"),
      (3L, t1, 1L, "purchase", 1.0, "{}"),
      (4L, t0, 2L, "view", 1.0, "{}"), (5L, t1, 2L, "view", 1.0, "{}"))
      .toDF("event_id", "ts", "user_id", "event_type", "value", "props")
      .write.mode("overwrite").parquet(s"$dir/events.parquet")
    val got = graft.ops.EventAnalytics.eventTransitions(spark, dir).collect()
      .map(r => (r.getString(0), r.getString(1)) -> ((r.getLong(2), r.getLong(3), r.getDouble(4))))
      .toMap
    assert(got.keySet == Set(("view", "click"), ("click", "purchase"), ("view", "view")),
      s"tie must pair view→click by event_id: ${got.keySet}")
    assert(got(("view", "click")) == ((1L, 2L, 0.5)) && got(("view", "view")) == ((1L, 2L, 0.5)))
    assert(got(("click", "purchase")) == ((1L, 1L, 1.0)))
  }

  test("label centroids: orthogonal/parallel/negative cosines exact") {
    import spark.implicits._
    val dir = java.nio.file.Files.createTempDirectory("graft-centroid-test").toString
    Seq((1L, Seq(1.0f, 0.0f), 0), (2L, Seq(1.0f, 0.0f), 0),
      (3L, Seq(0.0f, 1.0f), 1), (4L, Seq(2.0f, 0.0f), 2),
      (5L, Seq(-1.0f, 0.0f), 3))
      .toDF("vec_id", "embedding", "label")
      .write.mode("overwrite").parquet(s"$dir/embeddings.parquet")
    val got = graft.ops.Similarity.labelCentroidSimilarity(spark, dir).collect()
      .map(r => (r.getInt(0), r.getInt(1)) -> r.getDouble(2)).toMap
    assert(got((0, 1)) == 0.0 && got((0, 2)) == 1.0 && got((0, 3)) == -1.0,
      s"orthogonal/parallel/opposite centroids: $got")
    assert(got.size == 6, s"all label pairs emitted: ${got.keySet}")
  }

  test("column correlations: perfect linear pair hits 1.0, all pairs bounded") {
    import spark.implicits._
    val dir = java.nio.file.Files.createTempDirectory("graft-corr-test").toString
    // extendedprice = 3·quantity (corr exactly 1); discount constant +
    // alternating tax (uncorrelated with the linear pair)
    (1 to 50).map(i => (i.toLong, 1L, 1L, 1, i.toDouble, 3.0 * i,
        if (i % 2 == 0) 0.1 else 0.2, if (i % 3 == 0) 0.05 else 0.07,
        "N", "O", java.sql.Timestamp.valueOf("2024-01-01 00:00:00")))
      .toDF("l_orderkey", "l_partkey", "l_suppkey", "l_linenumber", "l_quantity",
        "l_extendedprice", "l_discount", "l_tax", "l_returnflag", "l_linestatus", "l_shipdate")
      .write.mode("overwrite").parquet(s"$dir/lineitem.parquet")
    val got = graft.ops.Relational.columnCorrelations(spark, dir).collect()
      .map(r => (r.getString(0), r.getString(1)) -> r.getDouble(3)).toMap
    assert(got.size == 6)
    assert(got.get(("l_extendedprice", "l_quantity")).contains(1.0) ||
      got.get(("l_quantity", "l_extendedprice")).contains(1.0),
      s"perfect linear pair: $got")
    assert(got.values.forall(c => c >= -1.0 && c <= 1.0), s"bounded: $got")
  }

  test("croston: intermittent recursion replayed by hand, zeros never chase the level") {
    import spark.implicits._
    val dir = java.nio.file.Files.createTempDirectory("graft-croston-test").toString
    // demands on days 1,4,6 of a 6-day window: 5, 8, 3 (gaps are exact
    // zero-demand days)
    val rows = Seq((1, 5.0), (4, 8.0), (6, 3.0)).map { case (d, v) =>
      (d.toLong, java.sql.Timestamp.valueOf(f"2024-03-0$d%d 12:00:00"), 1L, "m", v, "{}")
    }
    rows.toDF("event_id", "ts", "user_id", "event_type", "value", "props")
      .write.mode("overwrite").parquet(s"$dir/events.parquet")
    val out = graft.models.Croston.forecast(spark, dir).collect()
      .map(r => (r.getLong(1), r.getDouble(2)))
    // replay with the SAME IEEE sequence: d1 x=5 → z=5, p=1, q=1;
    // d2,d3 zeros → q=3; d4 x=8 (interval 3); d5 zero → q=2; d6 x=3
    var z = 5.0; var p = 1.0
    p = p + 0.1 * (3.0 - p); z = z + 0.1 * (8.0 - z)
    p = p + 0.1 * (2.0 - p); z = z + 0.1 * (3.0 - z)
    val expected = BigDecimal(z / p).setScale(6, BigDecimal.RoundingMode.HALF_UP).toDouble
    assert(out.length == 7 && out.forall(_._2 == expected),
      s"flat z/p forecast at $expected: ${out.toSeq}")
    assert(out.map(_._1).sorted.toSeq == (1L to 7L), "7 horizon steps")
    // bias-corrected variants: one constant multiply over the same z/p
    val variants = graft.models.Croston.forecastVariants(spark, dir).collect()
      .map(r => (r.getString(1), r.getLong(2)) -> r.getDouble(3)).toMap
    assert(variants.size == 21, "3 variants x 7 steps")
    def q6(x: Double) = BigDecimal(x).setScale(6, BigDecimal.RoundingMode.HALF_UP).toDouble
    (1L to 7L).foreach { s =>
      assert(variants(("CROSTON", s)) == expected, "classic variant = fc_croston")
      assert(variants(("SBA", s)) == q6((1.0 - 0.1 / 2.0) * (z / p)),
        s"SBA = (1 - a/2) z/p: ${variants(("SBA", s))}")
      assert(variants(("SBJ", s)) == q6((1.0 - 0.1 / (2.0 - 0.1)) * (z / p)),
        s"SBJ = (1 - a/(2-a)) z/p: ${variants(("SBJ", s))}")
      assert(variants(("SBJ", s)) <= variants(("SBA", s)) &&
        variants(("SBA", s)) <= variants(("CROSTON", s)),
        "bias corrections shrink a positive forecast monotonically")
    }
  }

  test("TSB: probability smooths every period, forecast decays after demand stops") {
    import spark.implicits._
    val dir = java.nio.file.Files.createTempDirectory("graft-tsb-test").toString
    // same fixture as the croston test (demands 5, 8, 3 on days 1, 4, 6)
    // plus a DYING element: all demand in the first 3 of 12 days — the
    // obsolescence regime croston freezes on and TSB decays on
    val m = Seq((1, "m", 5.0), (4, "m", 8.0), (6, "m", 3.0))
    val dying = Seq((1, "dying", 10.0), (2, "dying", 10.0), (3, "dying", 10.0),
      (12, "dying", 0.0)) // day-12 zero-value row only extends the calendar
    (m ++ dying).zipWithIndex.map { case ((d, el, v), i) =>
      (i.toLong, java.sql.Timestamp.valueOf(f"2024-03-$d%02d 12:00:00"), 1L, el, v, "{}")
    }.toDF("event_id", "ts", "user_id", "event_type", "value", "props")
      .write.mode("overwrite").parquet(s"$dir/events.parquet")
    val out = graft.models.Croston.forecastTsb(spark, dir).collect()
      .map(r => (r.getString(0), r.getLong(1)) -> r.getDouble(2)).toMap
    // hand replay, literal IEEE order: p updates EVERY day, z on demand
    var z = 5.0; var p = 1.0
    p = p + 0.1 * (0.0 - p)                          // day 2
    p = p + 0.1 * (0.0 - p)                          // day 3
    p = p + 0.1 * (1.0 - p); z = z + 0.1 * (8.0 - z) // day 4
    p = p + 0.1 * (0.0 - p)                          // day 5
    p = p + 0.1 * (1.0 - p); z = z + 0.1 * (3.0 - z) // day 6
    val expected = BigDecimal(z * p).setScale(6, BigDecimal.RoundingMode.HALF_UP).toDouble
    (1L to 7L).foreach(s => assert(out(("m", s)) == expected,
      s"TSB flat z·p forecast: ${out(("m", s))} vs $expected"))
    // the dying stream: 9 demand-free days decay p by 0.9^9 — the TSB
    // forecast must sit far below croston's frozen-interval forecast
    val cro = graft.models.Croston.forecast(spark, dir).collect()
      .map(r => (r.getString(0), r.getLong(1)) -> r.getDouble(2)).toMap
    assert(out(("dying", 1L)) < 0.5 * cro(("dying", 1L)),
      s"TSB decays on obsolescence: tsb=${out(("dying", 1L))} croston=${cro(("dying", 1L))}")
  }

  test("demand classes: planted quadrants land where Syntetos–Boylan puts them") {
    import spark.implicits._
    val dir = java.nio.file.Files.createTempDirectory("graft-sbclass-test").toString
    // "smooth": demand every day, constant size (ADI 1, CV² 0);
    // "lumpy": demand every 3rd day with wildly varying sizes
    val smooth = (1 to 12).map(d => (d, "smooth", 10.0))
    val lumpy = Seq(1, 4, 7, 10).zip(Seq(1.0, 100.0, 1.0, 100.0))
      .map { case (d, v) => (d, "lumpy", v) }
    (smooth ++ lumpy).zipWithIndex.map { case ((d, el, v), i) =>
      (i.toLong, java.sql.Timestamp.valueOf(f"2024-03-$d%02d 12:00:00"), 1L, el, v, "{}")
    }.toDF("event_id", "ts", "user_id", "event_type", "value", "props")
      .write.mode("overwrite").parquet(s"$dir/events.parquet")
    val got = graft.ops.EventAnalytics.demandClasses(spark, dir).collect()
      .map(r => r.getString(0) ->
        ((r.getDouble(3), r.getString(5), r.getBoolean(6), r.getString(7)))).toMap
    assert(got("smooth") == ((1.0, "smooth", false, "SES")),
      s"daily constant demand: ${got("smooth")}")
    val (adi, cls, risk, rec) = got("lumpy")
    assert(adi == 2.5 && cls == "lumpy" && !risk && rec == "SBA",
      s"sparse erratic demand: ${got("lumpy")}")
  }

  test("demand classes: a dying stream flags obsolescence and routes to TSB") {
    import spark.implicits._
    val dir = java.nio.file.Files.createTempDirectory("graft-obsolete-test").toString
    // demand days 1-5 then silence through day 20 (calendar extended by
    // a zero-value row): early half 5 demand days, late half 0 — the
    // exact-integer screen (2·nd_late < nd_early) must flag and route
    // to TSB regardless of quadrant
    val rows = (1 to 5).map(d => (d, 7.0 + d)) :+ ((20, 0.0))
    rows.zipWithIndex.map { case ((d, v), i) =>
      (i.toLong, java.sql.Timestamp.valueOf(f"2024-03-$d%02d 12:00:00"), 1L, "fade", v, "{}")
    }.toDF("event_id", "ts", "user_id", "event_type", "value", "props")
      .write.mode("overwrite").parquet(s"$dir/events.parquet")
    val r = graft.ops.EventAnalytics.demandClasses(spark, dir).collect()
    assert(r.length == 1)
    assert(r(0).getBoolean(6), "obsolescence must flag")
    assert(r(0).getString(7) == "TSB", s"routing must be TSB: ${r(0)}")
  }

  test("sorted-neighborhood: prefix-variant docs pair, banded set equals the direct window") {
    import spark.implicits._
    val dir = java.nio.file.Files.createTempDirectory("graft-snm-test").toString
    val docs = Seq(
      (1L, "alpha beta gamma delta epsilon one"),
      (2L, "alpha beta gamma delta epsilon two"),
      (3L, "zulu yankee xray whiskey victor"),
      (4L, "alpha beta gamma delta epsilon two!"),
      (5L, "mike november oscar papa quebec"))
      .map { case (id, t) => (id, t, "en", "s", t.length.toLong) }
    docs.toDF("doc_id", "text", "lang", "source", "n_chars")
      .write.mode("overwrite").parquet(s"$dir/documents.parquet")
    val got = graft.ops.NearDup.sortedNeighborhoodPairs(spark, dir).collect()
      .map(r => (r.getLong(0), r.getLong(1)) -> r.getLong(3)).toMap
    assert(got.contains((1L, 2L)) && got.contains((2L, 4L)) && got.contains((1L, 4L)),
      s"the three alpha-prefix variants must pair: ${got.keySet}")
    assert(!got.keys.exists(k => k._1 == 3L || k._2 == 3L),
      s"the zulu doc is over the lev threshold against all neighbors: ${got.keySet}")
    // banded formation ≡ the direct windowed self-join on the same rank
    val keyed = docs.map { case (id, t, _, _, _) =>
      (id, t.toLowerCase.trim.replaceAll("\\s+", " ").take(40))
    }.sortBy(p => (p._2, p._1)).zipWithIndex.map { case ((id, k), i) => (id, k, i + 1) }
    val direct = (for {
      (ida, ka, ra) <- keyed; (idb, kb, rb) <- keyed
      if rb > ra && rb - ra <= 4
      lev = {
        val dp = Array.tabulate(ka.length + 1, kb.length + 1) { (i, j) =>
          if (i == 0) j else if (j == 0) i else 0 }
        for (i <- 1 to ka.length; j <- 1 to kb.length)
          dp(i)(j) = math.min(math.min(dp(i - 1)(j) + 1, dp(i)(j - 1) + 1),
            dp(i - 1)(j - 1) + (if (ka(i - 1) == kb(j - 1)) 0 else 1))
        dp(ka.length)(kb.length)
      } if lev <= 10
    } yield (ida, idb) -> lev.toLong).toMap
    assert(got == direct, s"banded pairs must equal the direct window: $got vs $direct")
  }

  test("eval contamination: source docs self-flag, a verbatim copy flags, clean doc doesn't") {
    import spark.implicits._
    val dir = java.nio.file.Files.createTempDirectory("graft-contam-test").toString
    val words = (1 to 20).map(i => s"w$i").mkString(" ") // 20 tokens
    val other = (21 to 40).map(i => s"w$i").mkString(" ")
    val third = (41 to 60).map(i => s"w$i").mkString(" ")
    val docs = Seq(
      (1L, words), (2L, other), (3L, third),
      // doc 4 embeds doc 1's first 13 tokens verbatim mid-text
      (4L, "prefix tokens here " + (1 to 13).map(i => s"w$i").mkString(" ") + " suffix"),
      (5L, (61 to 80).map(i => s"w$i").mkString(" ")))
      .map { case (id, t) => (id, t, "en", "s", t.length.toLong) }
    docs.toDF("doc_id", "text", "lang", "source", "n_chars")
      .write.mode("overwrite").parquet(s"$dir/documents.parquet")
    val got = graft.ops.Curation.evalContamination(spark, dir).collect()
      .map(r => (r.getLong(0), r.getLong(1)) -> r.getLong(2)).toMap
    assert(got.keySet == Set((1L, 1L), (2L, 2L), (3L, 3L), (1L, 4L)),
      s"three self-hits plus the planted copy: ${got.keySet}")
    assert(got((1L, 4L)) == 1L, "one verbatim gram hit in the copy")
  }

  test("nearest click join: closest-either-side wins, equidistant tie takes the earlier click") {
    import spark.implicits._
    val dir = java.nio.file.Files.createTempDirectory("graft-nearest-test").toString
    val base = 1700000000000000L // µs
    def tsOf(us: Long) = new java.sql.Timestamp(us / 1000)
    // purchase at T: clicks at T−30m (id 10) and T+30m (id 11) —
    // equidistant, earlier click 10 must win; purchase 2 has only a
    // LATER click at +10m (as-of would miss it); purchase 3 unmatched
    val rows = Seq(
      (1L, tsOf(base), 1L, "purchase"), (10L, tsOf(base - 1800000000L), 1L, "click"),
      (11L, tsOf(base + 1800000000L), 1L, "click"),
      (2L, tsOf(base), 2L, "purchase"), (20L, tsOf(base + 600000000L), 2L, "click"),
      (3L, tsOf(base), 3L, "purchase"))
      .map { case (id, t, u, et) => (id, t, u, et, 1.0, "{}") }
    rows.toDF("event_id", "ts", "user_id", "event_type", "value", "props")
      .write.mode("overwrite").parquet(s"$dir/events.parquet")
    val got = graft.ops.EventAnalytics.nearestClickJoin(spark, dir).collect()
      .map(r => r.getLong(0) ->
        (if (r.isNullAt(3)) None else Some((r.getLong(3), r.getLong(5))))).toMap
    assert(got(1L).contains((10L, -1800000000L)),
      s"equidistant tie must take the earlier click: ${got(1L)}")
    assert(got(2L).contains((20L, 600000000L)),
      s"a LATER click within tolerance must match (non-as-of semantics): ${got(2L)}")
    assert(got(3L).isEmpty, "unmatched purchase survives with NULLs")
  }

  test("quality resample: deterministic coin, keep rate tracks mean quality") {
    val a = graft.ops.Curation.qualityResample(spark, sfDir).collect()
      .map(r => (r.getLong(0), r.getDouble(3), r.getBoolean(5)))
    val b = graft.ops.Curation.qualityResample(spark, sfDir).collect()
      .map(r => (r.getLong(0), r.getDouble(3), r.getBoolean(5)))
    assert(a.toSeq == b.toSeq, "content-hash coin must be run-deterministic")
    val meanQ = a.map(_._2).sum / a.length
    val keepRate = a.count(_._3).toDouble / a.length
    assert(math.abs(keepRate - meanQ) < 0.2,
      s"keep rate $keepRate must track mean quality $meanQ")
    assert(a.filter(_._2 == 0.0).forall(!_._3), "zero-quality docs never keep")
  }

  test("with-ties top-k keeps boundary ties; percentile tops at 1.0 and respects order") {
    import spark.implicits._
    val dir = java.nio.file.Files.createTempDirectory("graft-ties-test").toString
    // 9 distinct high values + THREE orders tied at the 10th price
    val prices = (1 to 9).map(i => 1000.0 - i) ++ Seq(100.0, 100.0, 100.0) ++
      (1 to 5).map(i => 10.0 + i)
    prices.zipWithIndex.map { case (p, i) =>
      (i.toLong, 1L, "O", p, java.sql.Timestamp.valueOf("2024-01-01 00:00:00"), "1-URGENT")
    }.toDF("o_orderkey", "o_custkey", "o_orderstatus", "o_totalprice", "o_orderdate", "o_orderpriority")
      .write.mode("overwrite").parquet(s"$dir/orders.parquet")
    val top = graft.ops.Relational.topOrdersWithTies(spark, dir).collect()
    assert(top.length == 12, s"9 + 3 boundary ties must all emit: ${top.length}")
    assert(top.count(_.getDouble(1) == 100.0) == 3, "all three tied orders kept")
    val pct = graft.ops.Relational.orderValuePercentile(spark, dir).collect()
      .map(r => (r.getDouble(1), r.getDouble(2)))
    assert(pct.map(_._2).max == 1.0, "largest value has percentile 1.0")
    assert(pct.filter(_._1 == 100.0).map(_._2).distinct.length == 1,
      "tied values share one percentile")
    val sorted = pct.sortBy(_._1)
    assert(sorted.zip(sorted.tail).forall { case ((_, a), (_, b)) => a <= b },
      "percentile monotone in value")
  }

  test("ship latency stats: known day-diffs give exact mean and nearest-rank cuts") {
    import spark.implicits._
    val dir = java.nio.file.Files.createTempDirectory("graft-lat-test").toString
    val d0 = java.time.LocalDate.of(2024, 1, 1)
    (1 to 20).map { i =>
      (i.toLong, 1L, 1L, 1, 1.0, 1.0, 0.0, 0.0, "N", "O",
        java.sql.Timestamp.valueOf(d0.plusDays(i).atStartOfDay()))
    }.toDF("l_orderkey", "l_partkey", "l_suppkey", "l_linenumber", "l_quantity",
      "l_extendedprice", "l_discount", "l_tax", "l_returnflag", "l_linestatus", "l_shipdate")
      .write.mode("overwrite").parquet(s"$dir/lineitem.parquet")
    (1 to 20).map(i => (i.toLong, 1L, "O", 1.0,
        java.sql.Timestamp.valueOf(d0.atStartOfDay()), "1-URGENT"))
      .toDF("o_orderkey", "o_custkey", "o_orderstatus", "o_totalprice", "o_orderdate", "o_orderpriority")
      .write.mode("overwrite").parquet(s"$dir/orders.parquet")
    val r = graft.ops.Relational.shipLatencyStats(spark, dir).collect()
    assert(r.length == 1)
    // latencies 1..20: mean 10.5, p50 = rank ceil(20/2)=10 → 10,
    // p95 = rank ceil(380/20)=19 → 19
    assert((r.head.getLong(1), r.head.getDouble(2), r.head.getLong(3), r.head.getLong(4)) ==
      ((20L, 10.5, 10L, 19L)), s"got: ${r.head}")
  }

  test("user streaks: islands split on gap days, longest run exact") {
    import spark.implicits._
    val dir = java.nio.file.Files.createTempDirectory("graft-streak-test").toString
    // user 1 active days 1,2,3, 5,6, 9 → streaks 3,2,1; user 2 day 1 only
    val days = Seq((1L, 1), (1L, 2), (1L, 3), (1L, 5), (1L, 6), (1L, 9), (2L, 1))
    days.zipWithIndex.map { case ((u, d), i) =>
      (i.toLong, new java.sql.Timestamp(d.toLong * 86400000L + 1000L), u, "view", 1.0, "{}")
    }.toDF("event_id", "ts", "user_id", "event_type", "value", "props")
      .write.mode("overwrite").parquet(s"$dir/events.parquet")
    val got = graft.ops.EventAnalytics.userStreaks(spark, dir).collect()
      .map(r => r.getLong(0) -> ((r.getLong(1), r.getLong(2), r.getLong(3)))).toMap
    assert(got(1L) == ((6L, 3L, 3L)), s"6 active days, longest 3, 3 streaks: ${got(1L)}")
    assert(got(2L) == ((1L, 1L, 1L)))
  }

  test("user churn: absent-next-week anti join, trailing week excluded") {
    import spark.implicits._
    val dir = java.nio.file.Files.createTempDirectory("graft-churn-test").toString
    // u1 active weeks 0,1,2; u2 week 0 only; u3 week 1 only
    def ts(wk: Long) = new java.sql.Timestamp(wk * 604800000L + 1000L)
    Seq((1L, ts(0), 1L), (2L, ts(1), 1L), (3L, ts(2), 1L),
      (4L, ts(0), 2L), (5L, ts(1), 3L))
      .map { case (id, t, u) => (id, t, u, "view", 1.0, "{}") }
      .toDF("event_id", "ts", "user_id", "event_type", "value", "props")
      .write.mode("overwrite").parquet(s"$dir/events.parquet")
    val got = graft.ops.EventAnalytics.userChurn(spark, dir).collect()
      .map(r => r.getLong(0) -> ((r.getLong(1), r.getLong(2), r.getDouble(3)))).toMap
    assert(got.keySet == Set(0L, 1L), s"trailing week 2 must be excluded: ${got.keySet}")
    assert(got(0L) == ((2L, 1L, 0.5)) && got(1L) == ((2L, 1L, 0.5)), s"got: $got")
  }

  test("value histogram: integer binning maps each cent value to its own bin") {
    import spark.implicits._
    val dir = java.nio.file.Files.createTempDirectory("graft-hist-test").toString
    // cents 1..20 → lo=1, hi=20, range=20: bin = c-1, one row each
    (1 to 20).map(i => (i.toLong, 1L, "O", i / 100.0,
        java.sql.Timestamp.valueOf("2024-01-01 00:00:00"), "1-URGENT"))
      .toDF("o_orderkey", "o_custkey", "o_orderstatus", "o_totalprice", "o_orderdate", "o_orderpriority")
      .write.mode("overwrite").parquet(s"$dir/orders.parquet")
    val got = graft.ops.Relational.valueHistogram(spark, dir).collect()
      .map(r => (r.getLong(0), r.getLong(1), r.getLong(2)))
    assert(got.length == 20 && got.forall(_._3 == 1L), s"20 singleton bins: ${got.toSeq}")
    assert(got.forall { case (bin, lo, _) => lo == bin + 1 },
      s"bin_lo_cents must be exact: ${got.toSeq}")
  }

  test("mad anomalies: spike day flags, alternating baseline and constant series stay quiet") {
    import spark.implicits._
    val dir = java.nio.file.Files.createTempDirectory("graft-mad-test").toString
    val rows = for {
      el <- Seq("spiky", "flat"); d <- 1 to 30; r <- 1 to 4
    } yield {
      val v =
        if (el == "flat") 10.0
        else if (d == 30) 60.0
        else 10.0 + (d % 2) // alternating 11/10 baseline
      ((el.hashCode.toLong * 1000 + d * 10 + r),
        java.sql.Timestamp.valueOf(f"2024-03-${d}%02d 12:00:00"),
        1L, el, v, "{}")
    }
    rows.toDF("event_id", "ts", "user_id", "event_type", "value", "props")
      .write.mode("overwrite").parquet(s"$dir/events.parquet")
    val out = graft.ops.EventAnalytics.madAnomalies(spark, dir).collect()
      .map(r => (r.getString(0), r.getDate(1).toLocalDate.getDayOfMonth,
        r.getLong(3), r.getBoolean(7)))
    val spikyFlags = out.filter(t => t._1 == "spiky" && t._4).map(_._2)
    assert(spikyFlags.toSeq == Seq(30), s"only the spike day may flag: ${spikyFlags.toSeq}")
    assert(out.filter(_._1 == "flat").forall(!_._4),
      "a constant series (MAD 0, dev 0) must never flag")
    // integer decision path: the spike's deviation is exactly 99e6 of
    // doubled micro-units against med2 = 21e6
    val spikeRow = out.find(t => t._1 == "spiky" && t._2 == 30).get
    assert(spikeRow._3 == 60000000L, s"spike mean_micro: ${spikeRow._3}")
  }

  test("doc length histogram: group-local bounds, singleton source degenerates to bin 0") {
    import spark.implicits._
    val dir = java.nio.file.Files.createTempDirectory("graft-dlh-test").toString
    // source A: lengths 1..10 on local bounds → one per bin;
    // source B: a single doc → exactly bin 0
    val docs = (1 to 10).map(i => (i.toLong, "x", "en", "A", i.toLong)) :+
      ((11L, "y", "en", "B", 500L))
    docs.toDF("doc_id", "text", "lang", "source", "n_chars")
      .write.mode("overwrite").parquet(s"$dir/documents.parquet")
    val got = graft.ops.DataQuality.docLengthHistogram(spark, dir).collect()
      .map(r => (r.getString(0), r.getLong(1), r.getLong(3)))
    assert(got.count(_._1 == "A") == 10 && got.filter(_._1 == "A").forall(_._3 == 1L),
      s"ten singleton bins on A's local bounds: ${got.toSeq}")
    assert(got.filter(_._1 == "B").toSeq == Seq(("B", 0L, 1L)),
      s"single-length source degenerates to bin 0: ${got.toSeq}")
  }

  test("k-anonymity: singleton QI group flags, populous group passes") {
    import spark.implicits._
    val dir = java.nio.file.Files.createTempDirectory("graft-kanon-test").toString
    val docs = (1 to 6).map(i => (i.toLong, s"text $i", "en", "web", 100L)) :+
      ((7L, "loner", "fr", "web", 100L))
    docs.toDF("doc_id", "text", "lang", "source", "n_chars")
      .write.mode("overwrite").parquet(s"$dir/documents.parquet")
    val out = graft.ops.DataQuality.kAnonymityReport(spark, dir).collect()
      .map(r => (r.getString(0), r.getLong(3), r.getBoolean(4)))
    assert(out.toSet == Set(("en", 6L, false), ("fr", 1L, true)), s"got: ${out.toSeq}")
  }

  test("association rules: confidence is directional, the 10% floor cross-multiplies") {
    val dir = writeBasketFixture()
    val got = graft.ops.Affinity.associationRules(spark, dir).collect()
      .map(r => (r.getLong(0), r.getLong(1)) -> ((r.getLong(2), r.getDouble(3)))).toMap
    // (101,102): n_ab=5, n_101=6, n_102=5 → 102⇒101 confidence 1.0,
    // 101⇒102 confidence 5/6; 999⇒101 fails the floor (6·10 < 1200)
    assert(got((102L, 101L)) == ((5L, 1.0)), s"${got.get((102L, 101L))}")
    assert(got((101L, 102L)) == ((5L, 5.0 / 6.0)), s"${got.get((101L, 102L))}")
    assert(!got.contains((999L, 101L)),
      s"filler antecedent must fail the 10% confidence floor: ${got.keySet}")
    assert(got.contains((101L, 999L)), "6/6 orders with 101 contain 999: confidence 1")
  }

  test("part pagerank: scaled-BIGINT recursion matches a reference replay; hub dominates") {
    import spark.implicits._
    // star graph: hub 500 co-occurs with each leaf in 2 orders; >1000
    // total orders keep every star part frequent under the 0.1% floor
    val dir = java.nio.file.Files.createTempDirectory("graft-pr-test").toString
    val leaves = Seq(501L, 502L, 503L, 504L)
    val star = leaves.zipWithIndex.flatMap { case (leaf, i) =>
      Seq(2 * i + 1, 2 * i + 2).flatMap(ok => Seq((ok.toLong, 500L), (ok.toLong, leaf)))
    }
    val filler = (9 to 1100).map(ok => (ok.toLong, 999L))
    (star ++ filler).toDF("l_orderkey", "l_partkey")
      .write.mode("overwrite").parquet(s"$dir/lineitem.parquet")
    val got = graft.ops.Affinity.partPagerank(spark, dir).collect()
      .map(r => r.getLong(0) -> r.getLong(1)).toMap
    // reference replay of the exact integer recursion (Long arithmetic
    // mirrors Spark's DIV and the oracle's // on non-negative values)
    val scale = graft.ops.Affinity.RankScale
    val nodes = 500L +: leaves
    val outdeg = Map(500L -> 4L) ++ leaves.map(_ -> 1L)
    val edges = leaves.flatMap(l => Seq((500L, l), (l, 500L)))
    var r = nodes.map(_ -> scale / nodes.size).toMap
    for (_ <- 1 to graft.ops.Affinity.Iterations) {
      val in = edges.groupBy(_._2).map { case (dst, es) =>
        dst -> es.map { case (src, _) => r(src) / outdeg(src) }.sum
      }
      r = nodes.map(n => n -> (scale * 15L / 100L / nodes.size +
        85L * in.getOrElse(n, 0L) / 100L)).toMap
    }
    assert(got == r, s"integer recursion must replay exactly: got $got, want $r")
    assert(leaves.forall(l => got(500L) > got(l)), s"hub must out-rank leaves: $got")
    // mass sanity: ranks are positive and bounded by the total scale
    assert(got.values.forall(v => v > 0L && v < scale))
  }

  test("codepoint entropy: closed-form values through codegen, empty/null handling") {
    import spark.implicits._
    val got = Seq("aaaa", "abab", "abcd", "", "aab")
      .toDF("s")
      .select(graft.functions.ScaleFunctions.codepoint_entropy(col("s")).as("h"))
      .collect().map(_.getDouble(0))
    // H(aaaa)=0, H(abab)=1 bit, H(abcd)=2 bits, H("")=0 by contract,
    // H(aab) = log2(3) - (2·log2 2)/3
    val aab = math.log(3.0) / math.log(2.0) - 2.0 / 3.0
    assert(got(0) == 0.0 && got(1) == 1.0 && got(2) == 2.0 && got(3) == 0.0)
    assert(math.abs(got(4) - aab) < 1e-12, s"H(aab)=${got(4)} want $aab")
    // null in → null out (nullIntolerant)
    val n = Seq(Option.empty[String]).toDF("s")
      .select(graft.functions.ScaleFunctions.codepoint_entropy(col("s")).as("h"))
      .collect()(0)
    assert(n.isNullAt(0), "null text must yield null entropy")
    // the expression and the static helper agree (codegen ≡ eval path)
    assert(graft.functions.TextEntropy.entropyBits(
      org.apache.spark.unsafe.types.UTF8String.fromString("abab")) == 1.0)
  }

  test("bloom_might_contain: zero false negatives, bounded false positives") {
    import spark.implicits._
    val keys = (1L to 2000L).toDF("k")
    val bloom = keys.stat.bloomFilter("k", 2000L, 0.03)
    val probe = (1L to 6000L).toDF("k")
      .select(col("k"),
        graft.functions.ScaleFunctions.bloom_might_contain(bloom, col("k")).as("hit"))
      .collect().map(r => r.getLong(0) -> r.getBoolean(1)).toMap
    assert((1L to 2000L).forall(probe(_)), "bloom must never reject an inserted key")
    val fp = (2001L to 6000L).count(probe(_))
    assert(fp <= 4000 * 0.10, s"false-positive count $fp exceeds 10% of 4000 probes")
  }

  test("bloom-pruned join equals the plain join exactly") {
    val pruned = graft.ops.ScalePatterns.bloomPruneJoin(spark, sfDir).collect()
    val dim = spark.read.parquet(s"$sfDir/customer.parquet")
      .filter(col("c_mktsegment") === "BUILDING").select("c_custkey")
    val plain = spark.read.parquet(s"$sfDir/orders.parquet")
      .join(dim, col("o_custkey") === col("c_custkey"))
      .groupBy(col("o_orderpriority"))
      .agg(count(lit(1)).as("n_orders"),
        sum(col("o_totalprice").cast("decimal(18,4)")).cast("double").as("revenue"))
      .orderBy(col("o_orderpriority")).collect()
    assert(pruned.toSeq == plain.toSeq,
      s"bloom prune changed the result: ${pruned.toSeq} vs ${plain.toSeq}")
  }

  test("salted join equals the unsalted join exactly") {
    val salted = graft.ops.ScalePatterns.saltedSkewJoin(spark, sfDir).collect()
    val plain = graft.sources.Tables.events(spark, sfDir)
      .join(spark.read.parquet(s"$sfDir/customer.parquet"),
        col("user_id") === col("c_custkey"))
      .groupBy(col("c_mktsegment"))
      .agg(count(lit(1)).as("n_events"),
        count_distinct(col("user_id")).as("n_users"),
        sum(col("value").cast("decimal(18,4)")).cast("double").as("total_value"))
      .orderBy(col("c_mktsegment")).collect()
    assert(salted.toSeq == plain.toSeq,
      s"salting changed the result: ${salted.toSeq} vs ${plain.toSeq}")
  }

  test("snapshot diff replays the mutation rules (independent Scala replay)") {
    val orders = spark.read.parquet(s"$sfDir/orders.parquet")
      .select(col("o_orderkey"), col("o_orderstatus"), col("o_totalprice"),
        date_format(col("o_orderdate"), "yyyy-MM-dd").as("d"))
      .collect()
      .map(r => (r.getLong(0), r.getString(1), r.getDouble(2), r.getString(3)))
    val c1 = "1999-01-01"; val c2 = "2000-01-01"
    val old = orders.filter(_._4 < c1).map(o => o._1 -> ((o._2, o._3))).toMap
    val neu = orders.filter(o => o._4 < c2 && o._1 % 23 != 5).map { o =>
      val st = if (o._1 % 17 == 2) "X" else o._2
      val pr = if (o._1 % 17 == 3) o._3 + 10.0 else o._3
      o._1 -> ((st, pr))
    }.toMap
    val keys = old.keySet ++ neu.keySet
    val want = keys.toSeq.map { k =>
      (old.get(k), neu.get(k)) match {
        case (None, Some(_)) => "added"
        case (Some(_), None) => "removed"
        case (Some(a), Some(b)) => if (a == b) "unchanged" else "changed"
        case _ => sys.error("unreachable")
      }
    }.groupBy(identity).map { case (kls, v) => kls -> v.size.toLong }
    val got = graft.ops.ScalePatterns.snapshotDiff(spark, sfDir).collect()
      .map(r => r.getString(0) -> r.getLong(1)).toMap
    assert(got == want, s"diff classes: got $got want $want")
  }

  test("bloom cascade equals the plain 3-table join exactly") {
    val cascaded = graft.ops.ScalePatterns.bloomCascadeRevenue(spark, sfDir).collect()
    val dec = "decimal(18,4)"
    val plain = spark.read.parquet(s"$sfDir/lineitem.parquet")
      .join(spark.read.parquet(s"$sfDir/orders.parquet"),
        col("l_orderkey") === col("o_orderkey"))
      .join(spark.read.parquet(s"$sfDir/customer.parquet")
        .filter(col("c_mktsegment") === "BUILDING"),
        col("o_custkey") === col("c_custkey"))
      .groupBy(col("o_orderpriority"))
      .agg(count(lit(1)).as("n_items"),
        sum(col("l_extendedprice").cast(dec) *
          (lit(1).cast(dec) - col("l_discount").cast(dec)))
          .cast("double").as("revenue"))
      .orderBy(col("o_orderpriority")).collect()
    assert(cascaded.toSeq == plain.toSeq,
      s"cascade changed the result: ${cascaded.toSeq} vs ${plain.toSeq}")
  }

  test("phrase search: planted adjacencies, 0-based positions, no substring match") {
    import spark.implicits._
    val dir = java.nio.file.Files.createTempDirectory("graft-phrase-test").toString
    Seq(
      (1L, "x table hash y table hash"),  // hits at token pos 1 and 4
      (2L, "table x hash"),               // non-adjacent: no hit
      (3L, "notatable hashy table-hash"), // tokenizes to [notatable,hashy,table,hash]: hit
      (4L, "table hash"),                 // hit at 0
      (5L, "")                            // empty: no hit, no crash
    ).toDF("doc_id", "text").write.mode("overwrite")
      .parquet(s"$dir/documents.parquet")
    val got = TextAnalysis.phraseSearch(spark, dir).collect()
      .map(r => r.getLong(0) -> ((r.getLong(1), r.getLong(2)))).toMap
    assert(got == Map(1L -> ((2L, 1L)), 3L -> ((1L, 2L)), 4L -> ((1L, 0L))),
      s"got $got")
  }

  test("token PMI: hand-computed counts and quantized value on a tiny corpus") {
    import spark.implicits._
    val dir = java.nio.file.Files.createTempDirectory("graft-pmi-test").toString
    // 5 docs of "a b", 5 docs of "b a c" →
    // unigrams: a=10 b=10 c=5, N=25; bigrams: (a,b)=5 (b,a)=5 (a,c)=5, M=15
    val docs = (1 to 5).map(i => (i.toLong, "a b")) ++
      (6 to 10).map(i => (i.toLong, "b a c"))
    docs.toDF("doc_id", "text").write.mode("overwrite")
      .parquet(s"$dir/documents.parquet")
    val got = graft.ops.TextAnalysis.tokenPmi(spark, dir).collect()
      .map(r => (r.getString(0), r.getString(1)) ->
        ((r.getLong(2), r.getLong(3), r.getLong(4), r.getLong(5)))).toMap
    def pmiQ(cab: Long, ca: Long, cb: Long): Long =
      math.floor(math.log((cab / 15.0) / ((ca / 25.0) * (cb / 25.0))) * 1e6 + 0.5).toLong
    assert(got == Map(
      ("a", "b") -> ((5L, 10L, 10L, pmiQ(5, 10, 10))),
      ("b", "a") -> ((5L, 10L, 10L, pmiQ(5, 10, 10))),
      ("a", "c") -> ((5L, 10L, 5L, pmiQ(5, 10, 5)))), s"got $got")
  }

  test("TWAP: hand-computed step-function average, null rows dropped") {
    import spark.implicits._
    val dir = java.nio.file.Files.createTempDirectory("graft-twap-test").toString
    val day = "2024-03-01"
    Seq(
      (1L, java.sql.Timestamp.valueOf(s"$day 00:00:00"), "buy", Some(10.0)),
      (2L, java.sql.Timestamp.valueOf(s"$day 12:00:00"), "buy", Some(20.0)),
      (3L, java.sql.Timestamp.valueOf(s"$day 06:00:00"), "buy", None), // dropped
      (4L, java.sql.Timestamp.valueOf(s"$day 18:00:00"), "view", Some(4.0))
    ).toDF("event_id", "ts", "event_type", "value")
      .withColumn("props", lit(null).cast("string"))
      .withColumn("user_id", lit(1L))
      .write.mode("overwrite").parquet(s"$dir/events.parquet")
    val got = graft.ops.EventAnalytics.twapDaily(spark, dir).collect()
      .map(r => r.getString(0) -> ((r.getLong(2), r.getDouble(3)))).toMap
    // buy: 10 holds 12h, 20 holds 12h → 15; view: 4 holds 6h of 6h → 4
    assert(got == Map("buy" -> ((2L, 15.0)), "view" -> ((1L, 4.0))), s"got $got")
  }

  test("min-cost supplier: every emitted price is the part's true minimum") {
    val rows = SparkEntry.queries("sql_min_cost_supplier")(spark, sfDir).collect()
    assert(rows.nonEmpty, "p_size=15 must select parts at sf0.001")
    val trueMin = spark.read.parquet(s"$sfDir/lineitem.parquet")
      .groupBy(col("l_partkey")).agg(min(col("l_extendedprice")).as("m"))
      .collect().map(r => r.getLong(0) -> r.getDouble(1)).toMap
    rows.foreach { r =>
      assert(r.getDouble(3) == trueMin(r.getLong(0)),
        s"part ${r.getLong(0)}: ${r.getDouble(3)} != ${trueMin(r.getLong(0))}")
    }
  }

  test("deletion audit replays the cascade rules (independent Scala replay)") {
    val cust = spark.read.parquet(s"$sfDir/customer.parquet")
      .select("c_custkey").collect().map(_.getLong(0))
    val orders = spark.read.parquet(s"$sfDir/orders.parquet")
      .select("o_orderkey", "o_custkey").collect()
      .map(r => (r.getLong(0), r.getLong(1)))
    val items = spark.read.parquet(s"$sfDir/lineitem.parquet")
      .select("l_orderkey").collect().map(_.getLong(0))
    val events = spark.read.parquet(s"$sfDir/events.parquet")
      .select("user_id").collect().map(r => if (r.isNullAt(0)) -1L else r.getLong(0))
    val tomb = cust.filter(_ % 97 == 13).toSet
    val delOrders = orders.filter(o => tomb(o._2)).map(_._1).toSet
    val want = Map(
      "customer" -> ((cust.length.toLong, tomb.size.toLong)),
      "orders" -> ((orders.length.toLong, delOrders.size.toLong)),
      "lineitem" -> ((items.length.toLong, items.count(delOrders).toLong)),
      "events" -> ((events.length.toLong, events.count(tomb).toLong)))
    val got = graft.ops.DataQuality.deletionAudit(spark, sfDir).collect()
      .map(r => r.getString(0) -> ((r.getLong(1), r.getLong(2)))).toMap
    assert(got == want, s"audit: got $got want $want")
    graft.ops.DataQuality.deletionAudit(spark, sfDir).collect().foreach(r =>
      assert(r.getLong(3) == r.getLong(1) - r.getLong(2), "n_after must reconcile"))
  }

  test("FD audit: PK-determined FDs hold, multi-line FDs are violated") {
    val got = graft.ops.DataQuality.fdViolations(spark, sfDir).collect()
      .map(r => r.getString(0) ->
        ((r.getLong(1), r.getLong(2), r.getLong(3), r.getBoolean(4)))).toMap
    assert(got("nation.n_nationkey->n_regionkey")._4, "PK FD must hold")
    assert(got("orders.o_orderkey->o_orderpriority")._4, "PK FD must hold")
    assert(!got("lineitem.l_orderkey->l_shipdate")._4,
      "multi-line orders must violate the shipdate FD")
    assert(!got("customer.c_nationkey->c_mktsegment")._4,
      "25 nations x 5 segments cannot be functional")
    got.values.foreach { case (nLhs, nViol, maxFan, holds) =>
      assert(holds == (nViol == 0L) && maxFan >= 1L && nViol <= nLhs,
        s"internal consistency: $nLhs $nViol $maxFan $holds")
    }
  }

  test("HLL rolling MAU tracks the exact rolling distinct within 5%") {
    val exact = graft.ops.EventAnalytics.rollingActiveUsers(spark, sfDir, 28)
      .collect().map(r => r.getDate(0).toString -> r.getLong(1)).toMap
    val est = graft.ops.EventAnalytics.rollingMauSketch(spark, sfDir, 28)
      .collect().map(r => r.getDate(0).toString -> r.getLong(1)).toMap
    assert(est.keySet == exact.keySet, "sketch and exact must cover the same days")
    est.foreach { case (day, e) =>
      val x = exact(day)
      assert(math.abs(e - x) <= math.max(1L, (x * 0.05).toLong),
        s"day $day: estimate $e vs exact $x drifts past 5%")
    }
  }

  test("revenue cube: all four granularities reconcile to the grand total") {
    val rows = graft.ops.Relational.revenueCube(spark, sfDir).collect()
      .map(r => (r.getString(0), r.getString(1), r.getLong(2), r.getLong(3)))
    val gids = rows.map(_._3).toSet
    assert(gids == Set(0L, 1L, 2L, 3L), s"cube must emit 4 granularities: $gids")
    val grand = rows.filter(_._3 == 3L)
    assert(grand.length == 1 && grand.head._1 == "ALL" && grand.head._2 == "ALL")
    val total = grand.head._4
    Seq(0L, 1L, 2L).foreach { gid =>
      assert(rows.filter(_._3 == gid).map(_._4).sum == total,
        s"granularity $gid must reconcile to the grand total $total")
    }
  }

  test("language confusion: planted mislabel lands in the right cell, totals reconcile") {
    import spark.implicits._
    val dir = java.nio.file.Files.createTempDirectory("graft-conf-test").toString
    Seq(
      (1L, "en", "the cat and the dog of note"),
      (2L, "en", "der hund und die katze und der vogel"), // German text labeled en
      (3L, "de", "der und die der und die")
    ).toDF("doc_id", "lang", "text").write.mode("overwrite")
      .parquet(s"$dir/documents.parquet")
    val got = TextAnalysis.langConfusion(spark, dir).collect()
      .map(r => (r.getString(0), r.getString(1)) -> r.getLong(2)).toMap
    assert(got == Map(("en", "en") -> 1L, ("en", "de") -> 1L, ("de", "de") -> 1L),
      s"got $got")
  }

  test("dominant period: a planted period-5 activity cycle is detected") {
    import spark.implicits._
    val dir = java.nio.file.Files.createTempDirectory("graft-period-test").toString
    val t0 = 86400000L * 19000
    // 30 days: 'cycle' spikes every 5th day (10 events vs 1); 'flat' is constant
    val rows = (0 until 30).flatMap { d =>
      val nCycle = if (d % 5 == 0) 10 else 1
      (0 until nCycle).map(i => (new java.sql.Timestamp(t0 + d * 86400000L + i * 1000L),
        "cycle", (d * 100 + i).toLong, 1L, 1.0, "{}")) ++
        Seq((new java.sql.Timestamp(t0 + d * 86400000L), "flat",
          (100000 + d).toLong, 1L, 1.0, "{}"))
    }
    rows.toDF("ts", "event_type", "event_id", "user_id", "value", "props")
      .coalesce(1).write.parquet(s"$dir/events.parquet")
    val got = graft.ops.EventAnalytics.dominantPeriod(spark, dir).collect()
      .map(r => r.getString(0) -> ((r.getLong(1), r.getBoolean(3)))).toMap
    assert(got("cycle")._1 == 5L, s"planted period 5, got ${got("cycle")}")
    assert(!got("cycle")._2, "period 5 is not weekly")
  }

  test("tfidf cosine: identical docs score 1.0, disjoint docs emit no pair") {
    import spark.implicits._
    val dir = java.nio.file.Files.createTempDirectory("graft-tfidf-test").toString
    val a = "alpha beta gamma delta epsilon zeta eta theta"
    Seq((1L, a), (2L, a), (3L, "one two three four five six seven"))
      .toDF("doc_id", "text").write.mode("overwrite")
      .parquet(s"$dir/documents.parquet")
    val got = NearDup.tfidfCosinePairs(spark, dir).collect()
      .map(r => (r.getLong(0), r.getLong(1)) -> r.getDouble(2)).toMap
    assert(got.keySet == Set((1L, 2L)), s"only the identical pair: ${got.keySet}")
    assert(got((1L, 2L)) == 1.0, s"identical docs must score 1.0: ${got((1L, 2L))}")
  }

  test("trigram_tf kernel equals the legacy posexplode+lead lineage row-for-row") {
    import spark.implicits._
    // the fused kernel replaced a corpus-scale posexplode + per-doc
    // lead window + (doc, gram) groupBy (round 15); parity must hold
    // over BOTH a planted edge-case corpus and the real store
    def kernelFrame(df: org.apache.spark.sql.DataFrame) = df
      .select(col("doc_id"), graft.functions.ScaleFunctions.trigram_tf(
        lower(trim(coalesce(col("text"), lit(""))))).as("k"))
      .select(col("doc_id"), col("k.dl").as("dl"), explode(col("k.grams")).as("gt"))
      .select(col("doc_id"), col("dl"), col("gt.g").as("g"), col("gt.tf").as("tf"))
    def legacyFrame(df: org.apache.spark.sql.DataFrame) = {
      import org.apache.spark.sql.expressions.Window
      val toks = df
        .select(col("doc_id"),
          split(lower(trim(coalesce(col("text"), lit("")))), "\\s+").as("ws"))
        .select(col("doc_id"), col("ws"), size(col("ws")).as("dl"))
        .filter(col("dl") >= 3)
      val w = Window.partitionBy(col("doc_id")).orderBy(col("pos"))
      toks
        .select(col("doc_id"), col("dl"), posexplode(col("ws")).as(Seq("pos", "w0")))
        .select(col("doc_id"), col("dl"), col("pos"), concat_ws(" ",
          col("w0"), lead(col("w0"), 1).over(w), lead(col("w0"), 2).over(w)).as("g"),
          lead(col("w0"), 2).over(w).isNotNull.as("full"))
        .filter(col("full"))
        .groupBy(col("doc_id"), col("dl"), col("g"))
        .agg(count(lit(1)).as("tf"))
    }
    def rows(df: org.apache.spark.sql.DataFrame) = df.collect()
      .map(r => (r.getLong(0), r.getInt(1), r.getString(2), r.getLong(3))).toSet
    val edge = Seq(
      (1L, "a b c a b c a b"),              // repeated trigrams: tf > 1
      (2L, "  Mixed   CASE\ttabs\nand  newlines here  "), // \s+ classes + trim
      (3L, "two tokens"),                    // dl < 3: no rows
      (4L, null.asInstanceOf[String]),       // null text
      (5L, ""),                              // empty text
      (6L, "Ünïcode ÜNÏCODE ünïcode Ünïcode")) // lowercase fold + dup grams
      .toDF("doc_id", "text")
    assert(rows(kernelFrame(edge)) == rows(legacyFrame(edge)),
      "kernel must equal the legacy lineage on the edge-case corpus")
    val docs = spark.read.parquet(s"$sfDir/documents.parquet")
    val k = rows(kernelFrame(docs))
    val l = rows(legacyFrame(docs))
    assert(k == l, s"kernel vs legacy on the store: ${(k -- l).take(3)} / ${(l -- k).take(3)}")
  }

  test("BPE merges: hand-derived rules on a tiny corpus, overlap counting and run parity") {
    import spark.implicits._
    val dir = java.nio.file.Files.createTempDirectory("graft-bpe-test").toString
    // words: aaab ×2, ab ×1.
    // step 1: (a,a) weighted 2·2=4 (overlap-counted) beats (a,b)=3 → merge
    //   left-to-right: aaab → [aa, a, b]
    // step 2: (a,b) = 2+1 = 3 beats (aa,a)=2 → aaab → [aa, ab]; ab → [ab]
    // step 3: (aa,ab) = 2 → aaab → [aaab]
    // step 4: no pairs remain → training stops at 3 rules
    Seq((1L, "aaab ab aaab")).toDF("doc_id", "text")
      .write.mode("overwrite").parquet(s"$dir/documents.parquet")
    val got = graft.ops.Bpe.bpeMerges(spark, dir).collect()
      .map(r => (r.getLong(0), r.getString(1), r.getString(2), r.getLong(3)))
    assert(got.toSeq == Seq(
      (1L, "a", "a", 4L), (2L, "a", "b", 3L), (3L, "aa", "ab", 2L)),
      s"got ${got.toSeq}")
    // perRoundCap=1 degenerates the batched trainer to the exact
    // textbook loop — same rules, same counts, one round per rule
    val batched1 = graft.ops.Bpe.bpeMergesBatched(spark, dir,
        targetMerges = 3, maxRounds = 8, perRoundCap = 1).collect()
      .map(r => (r.getLong(0), r.getLong(1), r.getString(2), r.getString(3), r.getLong(4)))
    assert(batched1.toSeq == Seq(
      (1L, 1L, "a", "a", 4L), (2L, 2L, "a", "b", 3L), (3L, 3L, "aa", "ab", 2L)),
      s"cap=1 batched must equal the exact loop: ${batched1.toSeq}")
  }

  test("batched BPE: >= 64 merges in <= 8 rounds, rounds non-interacting, cap=1 equals exact on the store") {
    // the production path's contract: a real vocabulary's worth of
    // merges in O(rounds), not O(merges), driver round-trips
    val rows = graft.ops.Bpe.bpeMergesBatched(spark, sfDir).collect()
      .map(r => (r.getLong(0), r.getLong(1), r.getString(2), r.getString(3), r.getLong(4)))
    assert(rows.length >= 64, s"expected >= 64 merges, got ${rows.length}")
    assert(rows.map(_._1).max <= 8L, s"rounds used: ${rows.map(_._1).max}")
    assert(rows.map(_._2).toSeq == (1L to rows.length).toSeq, "steps must be dense rank order")
    // within a round, accepted pairs must not CHAIN (round-13 relaxed
    // the all-symbols-disjoint rule to the exact interaction
    // condition): no pair's right symbol may be another's left — the
    // only relation that lets two matches be adjacent — and no pair
    // may consume or produce another's merged concat
    rows.groupBy(_._1).foreach { case (round, rs) =>
      val pairs = rs.map(r => (r._3, r._4))
      val lefts = pairs.map(_._1).toSet
      val rights = pairs.map(_._2).toSet
      val concats = pairs.map(p => p._1 + p._2).toSet
      pairs.foreach { case (a, b) =>
        // self-chain (a, a) is the one legal case — single-pair runs
        // are what the parity logic exists for
        assert(!lefts.contains(b) || a == b,
          s"round $round: right symbol '$b' chains into an accepted left")
        assert(!rights.contains(a) || a == b,
          s"round $round: left symbol '$a' chains into an accepted right")
        assert(!concats.contains(a) && !concats.contains(b),
          s"round $round: ($a,$b) consumes another pair's merged symbol")
        assert(!lefts.contains(a + b) && !rights.contains(a + b),
          s"round $round: ($a,$b) produces a symbol another pair consumes")
      }
    }
    // cap=1 over the real store replays the exact loop's first 6 rules
    val exact = graft.ops.Bpe.bpeMerges(spark, sfDir).collect()
      .map(r => (r.getLong(0), r.getString(1), r.getString(2), r.getLong(3)))
    val cap1 = graft.ops.Bpe.bpeMergesBatched(spark, sfDir,
        targetMerges = 6, maxRounds = 6, perRoundCap = 1).collect()
      .map(r => (r.getLong(1), r.getString(2), r.getString(3), r.getLong(4)))
    assert(cap1.toSeq == exact.toSeq,
      s"cap=1 batched must equal the exact loop on the store: ${cap1.toSeq} vs ${exact.toSeq}")
  }

  test("stationary distribution: planted 2-state alternating chain settles at 50/50") {
    import spark.implicits._
    val dir = java.nio.file.Files.createTempDirectory("graft-stat-test").toString
    val t0 = 86400000L * 19000
    // one user alternating a b a b ... -> P(a->b)=P(b->a)=1; the even
    // iteration count returns the uniform start exactly: pi = (1/2, 1/2)
    val rows = (0 until 40).map { i =>
      (new java.sql.Timestamp(t0 + i * 60000L), if (i % 2 == 0) "a" else "b",
        i.toLong, 1L, 1.0, "{}")
    }
    rows.toDF("ts", "event_type", "event_id", "user_id", "value", "props")
      .coalesce(1).write.parquet(s"$dir/events.parquet")
    val got = graft.ops.EventAnalytics.transitionStationary(spark, dir).collect()
      .map(r => r.getString(0) -> r.getLong(1)).toMap
    val half = graft.ops.EventAnalytics.StatScale / 2
    assert(got == Map("a" -> half, "b" -> half), s"got $got")
    // the real store: total stationary mass never exceeds the scale
    // (floor divisions only drain), every state appears exactly once
    val real = graft.ops.EventAnalytics.transitionStationary(spark, sfDir).collect()
    assert(real.map(_.getString(0)).distinct.length == real.length)
    assert(real.map(_.getLong(1)).sum <= graft.ops.EventAnalytics.StatScale)
  }

  test("rollup shares: region shares sum to 1, total shares sum to 1") {
    val rows = graft.ops.Relational.rollupShares(spark, sfDir).collect()
      .map(r => (r.getString(0), r.getDouble(4), r.getDouble(5)))
    assert(rows.nonEmpty)
    rows.groupBy(_._1).foreach { case (region, rs) =>
      val s = rs.map(_._2).sum
      assert(math.abs(s - 1.0) < 1e-4, s"region $region shares sum $s")
    }
    val t = rows.map(_._3).sum
    assert(math.abs(t - 1.0) < 1e-4, s"total shares sum $t")
  }

  test("JSONL source tier round-trips the events store row-for-row") {
    val pq = graft.sources.Tables.events(spark, sfDir)
      .select("event_id", "ts", "user_id", "event_type", "value", "props")
      .collect().map(_.toSeq).toSet
    val js = graft.sources.JsonStore.eventsFromJson(spark, sfDir)
      .select("event_id", "ts", "user_id", "event_type", "value", "props")
      .collect().map(_.toSeq).toSet
    assert(js == pq,
      s"JSON round-trip lost rows: pq=${pq.size} json=${js.size}, " +
        s"diff sample=${(pq -- js).take(2)} / ${(js -- pq).take(2)}")
    // CSV sibling: RFC-4180 quoting of the embedded-JSON props included
    val cs = graft.sources.JsonStore.eventsFromCsv(spark, sfDir)
      .select("event_id", "ts", "user_id", "event_type", "value", "props")
      .collect().map(_.toSeq).toSet
    assert(cs == pq,
      s"CSV round-trip lost rows: pq=${pq.size} csv=${cs.size}, " +
        s"diff sample=${(pq -- cs).take(2)} / ${(cs -- pq).take(2)}")
    // ORC sibling: columnar type mapping (no text round-trip to prove)
    val oc = graft.sources.JsonStore.eventsFromOrc(spark, sfDir)
      .select("event_id", "ts", "user_id", "event_type", "value", "props")
      .collect().map(_.toSeq).toSet
    assert(oc == pq,
      s"ORC round-trip lost rows: pq=${pq.size} orc=${oc.size}, " +
        s"diff sample=${(pq -- oc).take(2)} / ${(oc -- pq).take(2)}")
  }

  test("CSV mirror keeps NULL and empty string distinguishable") {
    // Spark's default CSV writes both null and '' as an empty field, so
    // without the \N sentinel an empty-string props/event_type comes
    // back NULL — silently dropping the row from IS NOT NULL-guarded
    // aggregates. The generator happens to emit no empty strings; this
    // fixture plants them so the parity contract is load-bearing.
    import spark.implicits._
    val dir = java.nio.file.Files.createTempDirectory("graft-csv-null").toString
    val ts = java.sql.Timestamp.valueOf("2024-03-01 10:00:00")
    Seq(
      (1L, ts, 10L, "view", 1.5, Some("""{"k":"v"}""")),
      (2L, ts, 11L, "view", 2.5, Some("")),   // EMPTY props, not null
      (3L, ts, 12L, "", 3.5, None),            // empty type, NULL props
      (4L, ts, 13L, null.asInstanceOf[String], 4.5, Some("x")))
      .map { case (i, t, u, e, v, p) => (i, t, u, e, v, p.orNull) }
      .toDF("event_id", "ts", "user_id", "event_type", "value", "props")
      .coalesce(1).write.parquet(s"$dir/events.parquet")
    val pq = graft.sources.Tables.events(spark, dir)
      .select("event_id", "ts", "user_id", "event_type", "value", "props")
      .collect().map(_.toSeq).toSet
    val cs = graft.sources.JsonStore.eventsFromCsv(spark, dir)
      .select("event_id", "ts", "user_id", "event_type", "value", "props")
      .collect().map(_.toSeq).toSet
    assert(cs == pq,
      s"null/empty must round-trip bit-for-bit: pq=$pq csv=$cs")
    val byId = cs.map(s => s.head -> s).toMap
    assert(byId(2L)(5) == "", "empty-string props must stay ''")
    assert(byId(3L)(5) == null, "null props must stay NULL")
    assert(byId(3L)(3) == "", "empty-string event_type must stay ''")
    assert(byId(4L)(3) == null, "null event_type must stay NULL")
  }

  test("latency trend: a perfectly linear planted latency has slope exactly 1.0") {
    import spark.implicits._
    val dir = java.nio.file.Files.createTempDirectory("graft-trend-test").toString
    // month k (1..6): one order whose single lineitem ships k days later
    val orders = (1 to 6).map(k => (k.toLong, 1L, "O", 10.0,
      java.sql.Timestamp.valueOf(f"2024-$k%02d-01 00:00:00"), "1-URGENT"))
    orders.toDF("o_orderkey", "o_custkey", "o_orderstatus", "o_totalprice",
      "o_orderdate", "o_orderpriority").write.parquet(s"$dir/orders.parquet")
    (1 to 6).map(k => (k.toLong, 1L, 1L, 1, 1.0, 1.0, 0.0, 0.0, "N", "O",
      java.sql.Timestamp.valueOf(f"2024-$k%02d-0${k + 1}%d 00:00:00")))
      .toDF("l_orderkey", "l_partkey", "l_suppkey", "l_linenumber", "l_quantity",
        "l_extendedprice", "l_discount", "l_tax", "l_returnflag", "l_linestatus",
        "l_shipdate")
      .write.parquet(s"$dir/lineitem.parquet")
    val got = graft.ops.Relational.latencyTrend(spark, dir).collect()
    assert(got.length == 1 && got(0).getDouble(2) == 1.0 && got(0).getBoolean(3),
      s"planted +1 day/month: ${got.toSeq}")
  }

  test("supplier HHI: a sole supplier scores exactly 1.0 and flags concentrated") {
    import spark.implicits._
    val dir = java.nio.file.Files.createTempDirectory("graft-hhi-test").toString
    Seq((1L, "solo", "Brand#1", "MONO", 1, 1.0),
        (2L, "duo", "Brand#1", "DUO", 1, 1.0))
      .toDF("p_partkey", "p_name", "p_brand", "p_type", "p_size", "p_retailprice")
      .write.parquet(s"$dir/part.parquet")
    Seq((1L, 1L, 7L, 1, 1.0, 100.0, 0.0, 0.0, "N", "O",
        java.sql.Timestamp.valueOf("2024-01-01 00:00:00")),
      (2L, 2L, 7L, 1, 1.0, 50.0, 0.0, 0.0, "N", "O",
        java.sql.Timestamp.valueOf("2024-01-01 00:00:00")),
      (3L, 2L, 8L, 1, 1.0, 50.0, 0.0, 0.0, "N", "O",
        java.sql.Timestamp.valueOf("2024-01-01 00:00:00")))
      .toDF("l_orderkey", "l_partkey", "l_suppkey", "l_linenumber", "l_quantity",
        "l_extendedprice", "l_discount", "l_tax", "l_returnflag", "l_linestatus",
        "l_shipdate")
      .write.parquet(s"$dir/lineitem.parquet")
    val got = graft.ops.Relational.supplierHhi(spark, dir).collect()
      .map(r => r.getString(0) -> ((r.getLong(1), r.getDouble(2), r.getBoolean(3)))).toMap
    assert(got("MONO") == ((1L, 1.0, true)), s"${got("MONO")}")
    assert(got("DUO") == ((2L, 0.5, true)), s"50/50 split HHI: ${got("DUO")}")
  }

  test("repurchase intervals: bucket totals reconcile with per-customer gap counts") {
    val orders = spark.read.parquet(s"$sfDir/orders.parquet")
      .groupBy(col("o_custkey")).agg(count(lit(1)).as("n"))
      .collect().map(_.getLong(1))
    val wantGaps = orders.map(n => math.max(0L, n - 1)).sum
    val got = graft.ops.Relational.repurchaseIntervals(spark, sfDir).collect()
    assert(got.map(_.getLong(1)).sum == wantGaps,
      s"gap total must be sum(orders-1) per customer: ${got.toSeq} vs $wantGaps")
  }

  test("language entropy per source: single-lang is 0, 50/50 mix is ln 2") {
    import spark.implicits._
    val dir = java.nio.file.Files.createTempDirectory("graft-lent-test").toString
    Seq((1L, "en", "mono", "x"), (2L, "en", "mono", "y"),
        (3L, "en", "mix", "x"), (4L, "de", "mix", "y"))
      .toDF("doc_id", "lang", "source", "text")
      .write.parquet(s"$dir/documents.parquet")
    val got = TextAnalysis.langEntropyBySource(spark, dir).collect()
      .map(r => r.getString(0) -> r.getDouble(3)).toMap
    assert(got("mono") == 0.0, s"${got("mono")}")
    assert(math.abs(got("mix") - math.log(2.0)) < 1e-6, s"${got("mix")}")
  }

  test("dup cluster histogram reconciles with the corpus and the label table") {
    val docs = spark.read.parquet(s"$sfDir/documents.parquet").count()
    val rows = graft.ops.Dedup.dupClusterHistogram(spark, sfDir).collect()
      .map(r => (r.getLong(0), r.getLong(1), r.getLong(2), r.getLong(3)))
    assert(rows.map(_._3).sum == docs, s"histogram docs must cover the corpus: ${rows.toSeq}")
    rows.foreach { case (size, nc, nd, dropped) =>
      assert(nd == nc * size && dropped == nd - nc,
        s"per-row identity broken: ($size, $nc, $nd, $dropped)")
    }
  }

  test("char_entropy query: flag consistent with the quantized value, one row per doc") {
    val docs = spark.read.parquet(s"$sfDir/documents.parquet").count()
    val rows = graft.ops.ScalePatterns.charEntropy(spark, sfDir).collect()
    assert(rows.length == docs.toInt, s"${rows.length} rows for $docs docs")
    rows.foreach { r =>
      val q = r.getLong(3); val low = r.getBoolean(4)
      assert(q >= 0L, s"negative entropy for doc ${r.getLong(0)}")
      assert(low == (q < 2000000L),
        s"low_entropy flag disagrees with entropy_q=$q for doc ${r.getLong(0)}")
    }
  }

  /** RocksDB checkpoint artifacts anywhere under `dir` (changelog
    * deltas / zip snapshots — the heap provider writes .delta/.snapshot
    * instead). */
  private def rocksArtifacts(dir: java.io.File): Boolean = {
    val cs = Option(dir.listFiles()).getOrElse(Array.empty[java.io.File])
    cs.exists(f =>
      (f.isFile && (f.getName.endsWith(".changelog") || f.getName.endsWith(".zip"))) ||
        (f.isDirectory && rocksArtifacts(f)))
  }

  test("custom flatMapGroupsWithState state survives micro-batches on RocksDB, bit-equal to the heap provider") {
    import spark.implicits._
    val t0 = 86400000L * 19000
    def run(provider: String): (Set[(Double, Double, Boolean)], Boolean) = {
      val ss = spark.newSession()
      ss.conf.set("spark.sql.shuffle.partitions", "4")
      EventIngest.applyStateStore(ss, provider)
      implicit val sq = ss.sqlContext
      import ss.implicits._
      val mem = MemoryStream[(String, java.sql.Timestamp, Double)]
      def ev(i: Int, v: Double) = ("a", new java.sql.Timestamp(t0 + i * 1000L), v)
      mem.addData((1 to 20).map(i => ev(i, 10.0 + (if (i % 2 == 0) 0.1 else -0.1))): _*)
      val ckpt = java.nio.file.Files.createTempDirectory(s"graft-rocks-$provider").toString
      val sink = s"rocks_anom_$provider"
      val q = EventIngest.anomalyStream(
          mem.toDF().toDF("event_type", "ts", "value"), alpha = 0.1, zThreshold = 3.0)
        .writeStream.format("memory").queryName(sink).outputMode("append")
        .option("checkpointLocation", ckpt).start()
      try {
        q.processAllAvailable()
        // batch 2 scores against state carried across the batch boundary
        mem.addData(ev(21, 1000.0), ev(22, 10.0))
        q.processAllAvailable()
        val rows = ss.table(sink).select("value", "zscore", "isAnomaly").collect()
          .map(r => (r.getDouble(0), r.getDouble(1), r.getBoolean(2))).toSet
        (rows, rocksArtifacts(new java.io.File(s"$ckpt/state")))
      } finally q.stop()
    }
    val (heapRows, heapArts) = run("hdfs")
    val (rocksRows, rocksArts) = run("rocksdb")
    assert(heapRows.size == 22 && heapRows == rocksRows,
      s"provider parity broken: ${heapRows.diff(rocksRows)} vs ${rocksRows.diff(heapRows)}")
    assert(rocksArts, "RocksDB run left no RocksDB checkpoint artifacts — provider not engaged")
    assert(!heapArts, "heap run unexpectedly produced RocksDB artifacts")
    assert(rocksRows.exists(r => r._1 == 1000.0 && r._3), "spike must flag on RocksDB state")
  }

  test("file-source stream resumes from its checkpoint: run 2 reads only new files, parquet sink stays exactly-once") {
    import spark.implicits._
    val root = java.nio.file.Files.createTempDirectory("graft-restart").toString
    val inDir = s"$root/in"; val outDir = s"$root/out"; val ckpt = s"$root/ck"
    val t0 = 86400000L * 19600
    def land(days: Range): Unit =
      days.flatMap(d => (0 until 10).map(i =>
          (new java.sql.Timestamp(t0 + d * 86400000L + i * 60000L), s"el${i % 2}", d + i * 0.5)))
        .toDF("ts", "event_type", "value").coalesce(1)
        .write.mode("append").parquet(inDir)
    def runOnce(): Long = {
      val ss = spark.newSession()
      ss.conf.set("spark.sql.shuffle.partitions", "4")
      val src = ss.readStream
        .schema("ts TIMESTAMP, event_type STRING, value DOUBLE").parquet(inDir)
      val q = EventIngest.dailyAggregate(src)
        .writeStream.format("parquet").option("path", outDir)
        .option("checkpointLocation", ckpt).outputMode("append")
        .trigger(org.apache.spark.sql.streaming.Trigger.AvailableNow()).start()
      q.awaitTermination()
      q.recentProgress.map(_.numInputRows).sum
    }
    land(0 until 10)
    assert(runOnce() == 100L, "run 1 must ingest the first file's 100 events")
    land(10 until 20)
    val in2 = runOnce()
    assert(in2 == 100L,
      s"run 2 must process ONLY the new file (100 rows), reprocessed: read $in2")
    val out = spark.read.parquet(outDir)
    val n = out.count()
    assert(n == out.select("element", "day_start").distinct().count(),
      "a (element, day) window was emitted twice across the restart — sink not exactly-once")
    // run 1 closes days 0..7 (wm = day9+9min − 1d), run 2 closes 8..17: 18 days × 2 elements
    assert(n == 36L, s"watermark-closed set wrong across restart: $n rows")
    def del(f: java.io.File): Unit = {
      Option(f.listFiles()).getOrElse(Array.empty[java.io.File]).foreach(del)
      f.delete(); ()
    }
    del(new java.io.File(root))
  }

  test("line-level dedup: planted banner stripped, order kept, whitespace variants one identity, no window") {
    import spark.implicits._
    val dir = java.nio.file.Files.createTempDirectory("graft-lines").toString
    val banner = "COOKIE Notice  accept all"        // normalizes to one identity
    val bannerVar = "cookie notice ACCEPT   ALL"    // whitespace/case variant
    val docs = Seq(
      (1L, s"$banner\nunique first body\nshared footer"),
      (2L, s"$bannerVar\nsecond body line\nshared footer"),
      (3L, s"third body only\nanother private line"),
      (4L, banner),                                 // pure boilerplate
      (5L, null.asInstanceOf[String]))
    docs.map { case (id, t) =>
        (id, "en", "s" + (id % 2), t, Option(t).map(_.length.toLong).getOrElse(0L)) }
      .toDF("doc_id", "lang", "source", "text", "n_chars")
      .coalesce(1).write.parquet(s"$dir/documents.parquet")

    val census = graft.ops.Curation.boilerplateLines(spark, dir).collect()
      .map(r => r.getString(0) -> (r.getLong(1), r.getLong(2))).toMap
    // identity is corpus-global and normalized: 3 distinct docs carry
    // the banner (two sources, one as a whitespace/case variant)
    assert(census("cookie notice accept all") == ((3L, 3L)), s"census: $census")
    assert(census("shared footer") == ((2L, 2L)), s"census: $census")
    assert(census.size == 2, s"private lines must not appear: $census")

    val clean = graft.ops.Curation.lineDedupClean(spark, dir)
    assert(!clean.queryExecution.executedPlan.toString.contains("Window"),
      "line dedup must not use a window over the line key")
    val got = clean.collect().map(r => r.getLong(0) ->
      ((r.getLong(1), r.getLong(2), if (r.isNullAt(3)) null else r.getString(3)))).toMap
    assert(got(1L) == ((3L, 1L, "unique first body")), s"doc 1: ${got(1L)}")
    assert(got(2L) == ((3L, 1L, "second body line")), s"doc 2: ${got(2L)}")
    assert(got(3L) == ((2L, 2L, "third body only\nanother private line")),
      s"doc 3 must keep BOTH lines in original order: ${got(3L)}")
    assert(got(4L) == ((1L, 0L, "")), s"pure-boilerplate doc empties: ${got(4L)}")
    assert(got(5L) == ((0L, 0L, null)), s"null text passes through: ${got(5L)}")
  }

  test("streaming line-clean serve: foreachBatch + broadcast census equals the batch cleaner") {
    import spark.implicits._
    val dir = java.nio.file.Files.createTempDirectory("graft-lcstream").toString
    val banner = "cookie notice accept all"
    (0L until 40L).map { id =>
        val t =
          if (id % 7 == 0) null.asInstanceOf[String]
          else s"$banner\nbody $id one\nshared footer\nbody $id two"
        (id, if (t == null) null else "en", s"s${id % 3}", t,
          Option(t).map(_.length.toLong).getOrElse(0L))
      }.toDF("doc_id", "lang", "source", "text", "n_chars")
      .coalesce(2).write.parquet(s"$dir/documents.parquet")
    val census = graft.ops.Curation.boilerplateLines(spark, dir)
    // the serve sink is a COMPLETE copy of the corpus slice: null-text
    // docs come back as (0, 0, NULL), exactly like batch lineDedupClean
    val expected = graft.ops.Curation.lineDedupClean(spark, dir)
      .collect().map(r => (r.getLong(0), r.getLong(1), r.getLong(2), r.getString(3))).toSet
    val got = EventIngest.lineCleanAvailableNow(
        spark, s"$dir/documents.parquet", census, s"$dir/out")
      .collect().map(r => (r.getLong(0), r.getLong(1), r.getLong(2), r.getString(3))).toSet
    assert(expected.nonEmpty && got == expected,
      s"stream-served cleaning must equal batch: missing ${expected.diff(got).take(3)}, extra ${got.diff(expected).take(3)}")
    assert(got.count { case (_, nl, nk, ct) => nl == 0L && nk == 0L && ct == null } == 6,
      "all 6 null-text docs must survive as (0, 0, NULL)")
    assert(got.forall { case (id, nl, nk, ct) =>
      ct == null || (nl == 4L && nk == 2L && ct == s"body $id one\nbody $id two") },
      "every served non-null doc must keep exactly its two private lines in order")
  }

  test("streaming line-clean serve runs under the RocksDB state-store config") {
    // the at-scale posture (SPARK_GRAFT_STATE_STORE=rocksdb) must carry
    // the serve sink too: the path is stateless foreachBatch, so the
    // provider class rides along without state files — the pin is that
    // the lifecycle completes and matches batch under that config
    import spark.implicits._
    val dir = java.nio.file.Files.createTempDirectory("graft-lcrocks").toString
    (0L until 12L).map { id =>
        val t = if (id % 5 == 0) null.asInstanceOf[String]
          else s"shared banner line\nonly $id here"
        (id, "en", "s0", t, Option(t).map(_.length.toLong).getOrElse(0L))
      }.toDF("doc_id", "lang", "source", "text", "n_chars")
      .coalesce(1).write.parquet(s"$dir/documents.parquet")
    val census = graft.ops.Curation.boilerplateLines(spark, dir)
    val expected = graft.ops.Curation.lineDedupClean(spark, dir)
      .collect().map(r => (r.getLong(0), r.getLong(1), r.getLong(2), r.getString(3))).toSet
    System.setProperty("graft.stream.stateStore", "rocksdb")
    try {
      val got = EventIngest.lineCleanAvailableNow(
          spark, s"$dir/documents.parquet", census, s"$dir/out")
        .collect().map(r => (r.getLong(0), r.getLong(1), r.getLong(2), r.getString(3))).toSet
      assert(expected.nonEmpty && got == expected,
        s"RocksDB-config serve must equal batch: missing ${expected.diff(got).take(3)}, extra ${got.diff(expected).take(3)}")
    } finally System.clearProperty("graft.stream.stateStore")
  }

  test("checkpoint restart under a switched state-store provider: checkpoint wins, state continues") {
    // Spark persists STATE_STORE_PROVIDER_CLASS in the offset log and
    // restores it on restart — the gate proves the restarted query
    // continues the original provider's state (first + resumed rows ==
    // a fresh full lifecycle) and leaves no RocksDB artifacts behind
    assert(graft.ops.SketchStreamGates.providerSwitchPinned(spark),
      "provider-switch restart must continue cleanly on the checkpointed provider")
  }

  test("sessionization + streaks property: random event corpora match independent references") {
    import spark.implicits._
    val gapUs = 30L * 60L * 1000000L
    for (seed <- Seq(31L, 32L, 33L)) {
      val rng = new java.util.Random(seed)
      val t0 = 86400000L * 19500 // ms, UTC midnight
      val rows = scala.collection.mutable.ArrayBuffer.empty[(java.sql.Timestamp, String, Long, java.lang.Long, Double, String)]
      var eid = 0L
      for (u <- 1L to 15L; _ <- 0 until (5 + rng.nextInt(12))) {
        val day = rng.nextInt(10)
        val ms = t0 + day * 86400000L + rng.nextInt(86400000)
        def add(m: Long): Unit = {
          rows += ((new java.sql.Timestamp(m), "click", eid,
            java.lang.Long.valueOf(u), (rng.nextInt(10000)) / 100.0, "{}"))
          eid += 1
        }
        add(ms)
        rng.nextInt(4) match {
          case 0 => add(ms)                    // exact-timestamp collision
          case 1 => add(ms + gapUs / 1000L)    // exactly prev+gap: MERGES
          case 2 => add(ms + gapUs / 1000L + 1L) // 1 ms past the gap: SPLITS
          case _ => ()
        }
      }
      rows += ((null, "click", eid, java.lang.Long.valueOf(99L), 1.0, "{}")); eid += 1
      rows += ((new java.sql.Timestamp(t0), "click", eid, null, 1.0, "{}"))
      val dir = java.nio.file.Files.createTempDirectory(s"graft-sessprop$seed").toString
      rows.toSeq.toDF("ts", "event_type", "event_id", "user_id", "value", "props")
        .coalesce(1).write.parquet(s"$dir/events.parquet")

      // in-memory references over (user, micros, value)
      val evs = rows.collect { case (ts, _, _, u, v, _) if ts != null && u != null =>
        (u.longValue(), ts.getTime * 1000L, v) }.toSeq
      val refSessions = evs.groupBy(_._1).toSeq.flatMap { case (u, es) =>
        val sorted = es.map(e => (e._2, e._3)).sortBy(_._1)
        val out = scala.collection.mutable.ArrayBuffer.empty[(Long, Long, Long, Long, Double)]
        var (start, last, n) = (sorted.head._1, sorted.head._1, 1L)
        var sum = BigDecimal(sorted.head._2).setScale(4)
        for ((t, v) <- sorted.tail) {
          if (t <= last + gapUs) { last = t; n += 1; sum += BigDecimal(v).setScale(4) }
          else {
            out += ((u, start, last + gapUs, n, sum.toDouble))
            start = t; last = t; n = 1L; sum = BigDecimal(v).setScale(4)
          }
        }
        out += ((u, start, last + gapUs, n, sum.toDouble))
        out.toSeq
      }.toSet
      val gotSessions = Relational.userSessions(spark, dir).collect()
        .map(r => (r.getLong(0), r.getLong(1), r.getLong(2), r.getLong(3), r.getDouble(4)))
        .toSet
      assert(gotSessions == refSessions,
        s"seed $seed sessions: missing ${refSessions.diff(gotSessions).take(2)}, " +
          s"extra ${gotSessions.diff(refSessions).take(2)}")

      val refStreaks = evs.map(e => (e._1, e._2 / 86400000000L)).distinct
        .groupBy(_._1).map { case (u, ds) =>
          val days = ds.map(_._2).sorted
          val runs = scala.collection.mutable.ArrayBuffer(1L)
          days.sliding(2).foreach {
            case Seq(a, b) => if (b == a + 1) runs(runs.length - 1) += 1 else runs += 1L
            case _ => ()
          }
          u -> ((days.length.toLong, runs.max, runs.length.toLong))
        }
      val gotStreaks = graft.ops.EventAnalytics.userStreaks(spark, dir).collect()
        .map(r => r.getLong(0) -> ((r.getLong(1), r.getLong(2), r.getLong(3)))).toMap
      assert(gotStreaks == refStreaks,
        s"seed $seed streaks mismatch: ${gotStreaks.toSet.diff(refStreaks.toSet).take(3)}")

      // concurrency sweep-line over the SAME reference sessions: hour
      // deltas (+1 at start hour, -1 at (end-1) DIV hour + 1), net != 0,
      // running prefix sum
      val hourUs = 3600L * 1000000L
      val refConc = {
        val deltas = scala.collection.mutable.HashMap.empty[Long, Long].withDefaultValue(0L)
        refSessions.foreach { case (_, s, e, _, _) =>
          deltas(s / hourUs) += 1L
          deltas((e - 1) / hourUs + 1) -= 1L
        }
        val hs = deltas.toSeq.filter(_._2 != 0L).sortBy(_._1)
        var run = 0L
        hs.map { case (h, net) => run += net; (h * hourUs, net, run) }.toSet
      }
      val gotConc = graft.ops.EventAnalytics.sessionConcurrency(spark, dir).collect()
        .map(r => (r.getLong(0), r.getLong(1), r.getLong(2))).toSet
      assert(gotConc == refConc,
        s"seed $seed concurrency: missing ${refConc.diff(gotConc).take(2)}, " +
          s"extra ${gotConc.diff(refConc).take(2)}")
    }
  }

  test("retention property: random cohorts match an independent matrix reference") {
    import spark.implicits._
    for (seed <- Seq(61L, 62L)) {
      val rng = new java.util.Random(seed)
      val t0ms = 86400000L * 19900
      val rows = (1L to 20L).flatMap { u =>
        (0 until (1 + rng.nextInt(8))).map { _ =>
          val day = rng.nextInt(12)
          (new java.sql.Timestamp(t0ms + day * 86400000L + rng.nextInt(86400000)),
            "c", u * 1000 + rng.nextInt(1000), java.lang.Long.valueOf(u),
            1.0, "{}")
        }
      }
      val dir = java.nio.file.Files.createTempDirectory(s"graft-retprop$seed").toString
      rows.toDF("ts", "event_type", "event_id", "user_id", "value", "props")
        .coalesce(1).write.parquet(s"$dir/events.parquet")
      val userDays: Map[Long, Set[Long]] = rows
        .groupBy(_._4.longValue())
        .map { case (u, es) => u -> es.map(_._1.getTime / 86400000L).toSet }
      val ref = userDays.toSeq
        .flatMap { case (_, ds) => val c = ds.min; ds.map(d => (c, d - c)) }
        .groupBy(identity).map { case (k, v) => k -> v.size.toLong }
      val refWithRate = ref.map { case ((c, off), n) =>
        (c, off) -> ((n, n.toDouble / ref((c, 0L)).toDouble))
      }
      val got = graft.ops.EventAnalytics.userRetention(spark, dir).collect()
        .map(r => (r.getDate(0).toLocalDate.toEpochDay, r.getLong(1)) ->
          ((r.getLong(2), r.getDouble(3)))).toMap
      assert(got == refWithRate,
        s"seed $seed retention: ${got.toSet.diff(refWithRate.toSet).take(3)} vs " +
          s"${refWithRate.toSet.diff(got.toSet).take(3)}")
    }
  }

  test("twap property: random intra-day streams match an independent step-function reference") {
    import spark.implicits._
    for (seed <- Seq(41L, 42L)) {
      val rng = new java.util.Random(seed)
      val t0ms = 86400000L * 19800
      val rows = scala.collection.mutable.ArrayBuffer.empty[(java.sql.Timestamp, String, Long, java.lang.Long, Double, String)]
      var eid = 0L
      for (ty <- Seq("a", "b"); day <- 0 until 3; _ <- 0 until (3 + rng.nextInt(8))) {
        val ms = t0ms + day * 86400000L + rng.nextInt(86400000)
        val v = rng.nextInt(100000) / 100.0
        rows += ((new java.sql.Timestamp(ms), ty, eid, java.lang.Long.valueOf(1L), v, "{}"))
        eid += 1
        if (rng.nextInt(3) == 0) { // same-timestamp pair: earlier id gets duration 0
          rows += ((new java.sql.Timestamp(ms), ty, eid, java.lang.Long.valueOf(1L),
            rng.nextInt(100000) / 100.0, "{}"))
          eid += 1
        }
      }
      val dir = java.nio.file.Files.createTempDirectory(s"graft-twapprop$seed").toString
      rows.toSeq.toDF("ts", "event_type", "event_id", "user_id", "value", "props")
        .coalesce(1).write.parquet(s"$dir/events.parquet")
      val ref = rows.groupBy(r => (r._2, r._1.getTime * 1000L / 86400000000L)).map {
        case ((ty, day), es) =>
          val sorted = es.map(r => (r._1.getTime * 1000L, r._3,
            math.floor(r._5 * 10000.0 + 0.5).toLong)).sortBy(e => (e._1, e._2))
          val endUs = (day + 1) * 86400000000L
          var (sumVw, sumW) = (BigInt(0), BigInt(0))
          sorted.zipWithIndex.foreach { case ((tus, _, vq), i) =>
            val nxt = if (i + 1 < sorted.length) sorted(i + 1)._1 else endUs
            sumVw += BigInt(vq) * (nxt - tus); sumW += BigInt(nxt - tus)
          }
          (ty, day) -> ((sorted.length.toLong,
            sumVw.toDouble / sumW.toDouble / 10000.0))
      }
      val got = graft.ops.EventAnalytics.twapDaily(spark, dir).collect()
        .map(r => (r.getString(0), r.getDate(1).toLocalDate.toEpochDay) ->
          ((r.getLong(2), r.getDouble(3)))).toMap
      assert(got.keySet == ref.keySet, s"seed $seed day/type sets differ")
      ref.foreach { case (k, (n, tw)) =>
        assert(got(k)._1 == n, s"seed $seed $k count: ${got(k)._1} vs $n")
        assert(math.abs(got(k)._2 - tw) < 1e-9, s"seed $seed $k twap: ${got(k)._2} vs $tw")
      }
    }
  }

  test("open-orders sweep property: random order/lineitem intervals match a day-scan reference") {
    import spark.implicits._
    for (seed <- Seq(51L, 52L)) {
      val rng = new java.util.Random(seed)
      val orders = (1L to 40L).map { ok =>
        (ok, java.sql.Date.valueOf(java.time.LocalDate.ofEpochDay(19000L + rng.nextInt(20))))
      }
      // 0-3 lineitems per order; orders with none must vanish (inner join)
      val lines = orders.flatMap { case (ok, d0) =>
        (0 until rng.nextInt(4)).map { _ =>
          (ok, java.sql.Date.valueOf(d0.toLocalDate.plusDays(rng.nextInt(15))))
        }
      }
      val dir = java.nio.file.Files.createTempDirectory(s"graft-openprop$seed").toString
      orders.toDF("o_orderkey", "o_orderdate")
        .coalesce(1).write.parquet(s"$dir/orders.parquet")
      lines.toDF("l_orderkey", "l_shipdate")
        .coalesce(1).write.parquet(s"$dir/lineitem.parquet")
      val intervals = orders.flatMap { case (ok, d0) =>
        val ship = lines.filter(_._1 == ok).map(_._2.toLocalDate.toEpochDay)
        if (ship.isEmpty) None
        else Some((d0.toLocalDate.toEpochDay, ship.max))
      }
      val lo = math.min(intervals.map(_._1).min, intervals.map(_._2 + 1).min)
      val hi = math.max(intervals.map(_._1).max, intervals.map(_._2 + 1).max)
      val ref = (lo to hi).map { day =>
        day -> intervals.count { case (a, b) => a <= day && day <= b }.toLong
      }.toMap
      val got = Relational.openOrdersDaily(spark, dir).collect()
        .map(r => r.getDate(0).toLocalDate.toEpochDay -> r.getLong(1)).toMap
      assert(got == ref,
        s"seed $seed open-orders: ${got.toSet.diff(ref.toSet).take(3)} vs ref ${ref.toSet.diff(got.toSet).take(3)}")
    }
  }

  test("line dedup property: random multi-line corpora match an independent in-memory reference") {
    import spark.implicits._
    // reference normalization mirrors the op EXACTLY: lower, collapse
    // \s+ to one space, THEN strip spaces (Spark trim() is space-only,
    // which suffices because the collapse already turned any edge
    // whitespace into plain spaces)
    def stripSp(s: String) = s.dropWhile(_ == ' ').reverse.dropWhile(_ == ' ').reverse
    def norm(l: String) =
      stripSp(l.toLowerCase(java.util.Locale.ROOT).replaceAll("\\s+", " "))
    val pool = Seq("Cookie Notice Accept All", "shared footer line",
      "subscribe to our newsletter", "terms of service apply", "nav home about")
    for (seed <- Seq(11L, 12L, 13L)) {
      val rng = new java.util.Random(seed)
      def perturb(s: String): String = {
        val cased = s.map(c => if (rng.nextBoolean()) c.toUpper else c.toLower)
        val spaced = cased.replace(" ", if (rng.nextBoolean()) "  " else " ")
        // edge whitespace includes tab and CR (a CRLF corpus's '\r'
        // lands at line end after the '\n' split) — all must collapse
        // to the same identity as the clean form
        val edges = Seq("", " ", "\t", "\r")
        edges(rng.nextInt(4)) + " " * rng.nextInt(3) + spaced +
          " " * rng.nextInt(3) + edges(rng.nextInt(4))
      }
      val docs: Seq[(Long, String)] = (0L until 30L).map { id =>
        if (rng.nextInt(10) == 0) (id, null)
        else {
          val n = 1 + rng.nextInt(6)
          val lines = (0 until n).map { i =>
            if (rng.nextDouble() < 0.4) perturb(pool(rng.nextInt(pool.size)))
            else s"unique line $id-$i ${rng.nextInt(1000)}"
          }
          (id, lines.mkString("\n"))
        }
      }
      val dir = java.nio.file.Files.createTempDirectory(s"graft-lprop$seed").toString
      docs.map { case (id, t) =>
          (id, "en", "s", t, Option(t).map(_.length.toLong).getOrElse(0L)) }
        .toDF("doc_id", "lang", "source", "text", "n_chars")
        .coalesce(1).write.parquet(s"$dir/documents.parquet")
      // in-memory reference
      val split: Map[Long, Array[String]] = docs.collect {
        case (id, t) if t != null => id -> t.split("\n", -1)
      }.toMap
      val df: Map[String, Set[Long]] = split.toSeq
        .flatMap { case (id, ls) => ls.map(l => norm(l) -> id) }
        .groupBy(_._1).map { case (k, v) => k -> v.map(_._2).toSet }
      val refCensus = df.filter(_._2.size >= 2).map { case (k, ids) =>
        k -> (ids.size.toLong,
          split.toSeq.map(_._2.count(l => norm(l) == k)).sum.toLong)
      }
      val refClean: Map[Long, (Long, Long, String)] = docs.map { case (id, t) =>
        if (t == null) id -> ((0L, 0L, null: String))
        else {
          val ls = split(id)
          val kept = ls.filter(l => df(norm(l)).size < 2)
          id -> ((ls.length.toLong, kept.length.toLong, kept.mkString("\n")))
        }
      }.toMap
      val gotCensus = graft.ops.Curation.boilerplateLines(spark, dir).collect()
        .map(r => r.getString(0) -> ((r.getLong(1), r.getLong(2)))).toMap
      assert(gotCensus == refCensus, s"seed $seed census: got $gotCensus vs $refCensus")
      val gotClean = graft.ops.Curation.lineDedupClean(spark, dir).collect()
        .map(r => r.getLong(0) ->
          ((r.getLong(1), r.getLong(2), if (r.isNullAt(3)) null else r.getString(3)))).toMap
      assert(gotClean == refClean,
        s"seed $seed clean mismatch: ${gotClean.toSet.diff(refClean.toSet).take(3)}")
    }
  }

  test("pii redact property: no residual entities after redaction, planted counts exact") {
    import spark.implicits._
    val email = "[A-Za-z0-9._%+-]+@[A-Za-z0-9.-]+\\.[A-Za-z][A-Za-z]+"
    val url = "https?://[^ \\t\\n]+"
    val num = "[0-9]{9,}"
    for (seed <- Seq(21L, 22L)) {
      val rng = new java.util.Random(seed)
      val docs = (0L until 25L).map { id =>
        val nE = rng.nextInt(3); val nU = rng.nextInt(3); val nN = rng.nextInt(3)
        val toks = Seq.fill(nE)(s"user${rng.nextInt(99)}@site${rng.nextInt(9)}.com") ++
          Seq.fill(nU)(s"https://host${rng.nextInt(9)}.org/p/${rng.nextInt(999)}x") ++
          Seq.fill(nN)((100000000L + rng.nextInt(1000000)).toString) ++
          Seq.fill(3 + rng.nextInt(5))(s"word${rng.nextInt(50)}")
        val text = new scala.util.Random(rng.nextLong()).shuffle(toks).mkString(" ")
        (id, text, nE.toLong, nU.toLong, nN.toLong)
      }
      val dir = java.nio.file.Files.createTempDirectory(s"graft-pprop$seed").toString
      docs.map { case (id, t, _, _, _) => (id, "en", "s", t, t.length.toLong) }
        .toDF("doc_id", "lang", "source", "text", "n_chars")
        .coalesce(1).write.parquet(s"$dir/documents.parquet")
      val got = graft.ops.TextAnalysis.piiRedact(spark, dir)
        .withColumn("res_e", regexp_count(col("redacted"), lit(email)))
        .withColumn("res_u", regexp_count(col("redacted"), lit(url)))
        .withColumn("res_n", regexp_count(col("redacted"), lit(num)))
        .collect().map(r => r.getLong(0) ->
          ((r.getLong(1), r.getLong(2), r.getLong(3),
            r.getInt(5), r.getInt(6), r.getInt(7)))).toMap
      docs.foreach { case (id, _, nE, nU, nN) =>
        val (ge, gu, gn, re, ru, rn) = got(id)
        assert((ge, gu, gn) == ((nE, nU, nN)),
          s"seed $seed doc $id planted counts: got ($ge,$gu,$gn) want ($nE,$nU,$nN)")
        assert((re, ru, rn) == ((0, 0, 0)),
          s"seed $seed doc $id residual entities after redaction: ($re,$ru,$rn)")
      }
    }
  }

  test("pii redact: entities rewritten in contract order, counts match scan, clean text untouched") {
    import spark.implicits._
    val dir = java.nio.file.Files.createTempDirectory("graft-pii").toString
    Seq(
      (1L, "contact bob@example.com or see https://ex.com/a?id=1234567890 ref 9876543210 end"),
      (2L, "plain text with short 1234 number"),
      (3L, null.asInstanceOf[String]))
      .map { case (id, t) => (id, "en", "s", t, Option(t).map(_.length.toLong).getOrElse(0L)) }
      .toDF("doc_id", "lang", "source", "text", "n_chars")
      .coalesce(1).write.parquet(s"$dir/documents.parquet")
    val got = graft.ops.TextAnalysis.piiRedact(spark, dir).collect()
      .map(r => r.getLong(0) -> r).toMap
    val r1 = got(1L)
    assert((r1.getLong(1), r1.getLong(2), r1.getLong(3)) == ((1L, 1L, 2L)),
      s"counts: $r1")
    // the URL's digit run disappears INTO <URL> (url pass precedes the
    // digit pass), the bare run becomes <NUM>
    assert(r1.getString(4) == "contact <EMAIL> or see <URL> ref <NUM> end",
      s"redacted: ${r1.getString(4)}")
    assert(got(2L).getString(4) == "plain text with short 1234 number",
      "clean text must be byte-identical")
    assert(got(3L).isNullAt(4), "null text stays null")
  }

  test("C4 line filter: planted fixture docs hit every rule branch, counters partition n_lines") {
    val rows = graft.ops.Curation.c4LineFilters(spark, sfDir).collect()
    val byId = rows.map(r => r.getLong(0) -> r).toMap
    // (n_lines, n_kept, n_short, n_no_punct, n_brace, n_badword, keep)
    def tup(id: Long) = {
      val r = byId(id)
      (r.getLong(1), r.getLong(2), r.getLong(3), r.getLong(4), r.getLong(5),
        r.getLong(6), r.getBoolean(7))
    }
    assert(tup(graft.ops.Curation.FixtureIdBase + 1L) == ((6L, 2L, 1L, 1L, 1L, 1L, false)), s"mixed doc: ${tup(graft.ops.Curation.FixtureIdBase + 1L)}")
    assert(tup(graft.ops.Curation.FixtureIdBase + 2L) == ((3L, 3L, 0L, 0L, 0L, 0L, true)), s"clean doc: ${tup(graft.ops.Curation.FixtureIdBase + 2L)}")
    assert(tup(graft.ops.Curation.FixtureIdBase + 3L) == ((3L, 0L, 0L, 0L, 0L, 3L, false)), s"badword doc: ${tup(graft.ops.Curation.FixtureIdBase + 3L)}")
    assert(tup(graft.ops.Curation.FixtureIdBase + 4L) == ((1L, 1L, 0L, 0L, 0L, 0L, false)),
      s"terminal double-quote keeps the line: ${tup(graft.ops.Curation.FixtureIdBase + 4L)}")
    // every line lands in exactly one class; corpus docs are all
    // single-line and punctuation-free so they classify no_punct
    rows.foreach { r =>
      assert(r.getLong(1) == r.getLong(2) + r.getLong(3) + r.getLong(4) +
        r.getLong(5) + r.getLong(6), s"partition: $r")
    }
    val corpus = rows.filter(_.getLong(0) < graft.ops.Curation.FixtureIdBase)
    assert(corpus.nonEmpty && corpus.forall(r => r.getLong(4) == r.getLong(1)),
      "sf corpus lines are punctuation-free => all no_punct")
  }

  test("hard negatives: band membership, hardest-first contiguous ranks, dup-regime excluded") {
    val rows = Similarity.hardNegatives(spark, sfDir).collect()
    assert(rows.nonEmpty)
    val byAnchor = rows.groupBy(_.getLong(0))
    byAnchor.foreach { case (a, rs) =>
      val sorted = rs.sortBy(_.getLong(1))
      assert(sorted.map(_.getLong(1)).toSeq == (1L to sorted.length).toSeq,
        s"ranks contiguous for anchor $a")
      val sims = sorted.map(_.getDouble(3))
      assert(sims.sameElements(sims.sorted.reverse), s"hardest-first for $a")
      sims.foreach(s => assert(s >= 0.1499 && s < 0.4001, s"band: $s"))
      sorted.foreach(r => assert(r.getLong(2) != a, "a vector is not its own negative"))
      assert(sorted.length <= 5)
    }
    // independent reference: brute-force the band + rank in plain Scala
    // for three anchors and demand the exact same (negative, rank) list
    val vecs = spark.read.parquet(s"$sfDir/embeddings.parquet")
      .filter(col("embedding").isNotNull)
      .select(col("vec_id"), col("embedding")).collect()
      .map(r => r.getLong(0) -> r.getSeq[Float](1).map(_.toDouble).toArray).toMap
    def cos(a: Array[Double], b: Array[Double]): Double = {
      var d = 0.0; var na = 0.0; var nb = 0.0; var i = 0
      while (i < a.length) { d += a(i) * b(i); na += a(i) * a(i); nb += b(i) * b(i); i += 1 }
      d / (math.sqrt(na) * math.sqrt(nb))
    }
    byAnchor.keys.take(3).foreach { a =>
      val ref = vecs.toSeq.filter(_._1 != a)
        .map { case (id, v) => (id, cos(vecs(a), v)) }
        .filter { case (_, s) => s >= 0.15 && s < 0.40 }
        .sortBy { case (id, s) => (-s, id) }.take(5).map(_._1)
      val got = byAnchor(a).sortBy(_.getLong(1)).map(_.getLong(2)).toSeq
      assert(got == ref, s"anchor $a: $got vs $ref")
    }
  }

  test("real media decode: every verdict gate ok, dims vary with the id arithmetic") {
    val gates = graft.ops.MediaDecode.mediaDecodeGates(spark, sfDir).collect()
      .map(r => r.getString(0) -> r.getBoolean(1)).toMap
    assert(gates.size == 9)
    val bad = gates.filter(!_._2).keys.toSeq
    assert(bad.isEmpty, s"failing media decode gates: $bad")
    // the features surface reads real PNG/JPEG headers: three distinct
    // heights (56/64/72) and a constant 9-block width must come back on
    // every decodable row; the three planted corrupt blobs surface as
    // quarantine rows (null dims/sig, non-null decode_error)
    val feats = graft.ops.MediaDecode.mediaRealFeatures(spark, sfDir).collect()
    assert(feats.length == graft.ops.MediaDecode.NumImages +
      graft.ops.MediaDecode.NumJpegTwins + graft.ops.MediaDecode.CorruptIds.size)
    val (quar, okRows) = feats.partition(r => !r.isNullAt(5))
    assert(quar.map(_.getLong(0)).sorted.toSeq == graft.ops.MediaDecode.CorruptIds,
      "quarantine ids")
    assert(quar.forall(r => r.isNullAt(2) && r.isNullAt(3) && r.isNullAt(4)),
      "quarantine rows carry null dims/sig")
    assert(okRows.map(_.getLong(3)).distinct.sorted.toSeq == Seq(56L, 64L, 72L),
      "decoded heights")
    assert(okRows.forall(_.getLong(2) == 72L), "decoded width")
    assert(feats.forall(_.getLong(1) >= 0L), "real byte counts")
  }

  test("retrieval quality: independent in-memory IR reference reproduces nDCG/MRR/P@5") {
    val got = Similarity.retrievalQuality(spark, sfDir).collect()
      .map(r => r.getLong(0) -> ((r.getLong(1), r.getDouble(2), r.getDouble(3), r.getDouble(4))))
      .toMap
    assert(got.nonEmpty)
    // plain-Scala reference: brute-force cosine top-5, label relevance,
    // the same integer weight table
    val rows = spark.read.parquet(s"$sfDir/embeddings.parquet")
      .filter(col("embedding").isNotNull).collect()
    val vecs = rows.map(r => r.getLong(0) -> r.getSeq[Float](
      r.fieldIndex("embedding")).map(_.toDouble).toArray).toMap
    val labs = rows.filter(!_.isNullAt(2)).map(r => r.getLong(0) -> r.getInt(2).toLong).toMap
    def cos(a: Array[Double], b: Array[Double]): Double = {
      var d = 0.0; var na = 0.0; var nb = 0.0; var i = 0
      while (i < a.length) { d += a(i) * b(i); na += a(i) * a(i); nb += b(i) * b(i); i += 1 }
      d / (math.sqrt(na) * math.sqrt(nb))
    }
    val w = Similarity.dcgWeights(5)
    val idcg = w.scanLeft(0L)(_ + _).drop(1)
    val labelSizes = labs.values.groupBy(identity).view.mapValues(_.size.toLong).toMap
    def r6(x: Double): Double =
      BigDecimal(x).setScale(6, BigDecimal.RoundingMode.HALF_UP).toDouble
    val ref = labs.toSeq.filter { case (_, l) => labelSizes(l) > 1 }
      .groupBy(_._2).map { case (label, qs) =>
        var sdcg = 0L; var srr = 0L; var shits = 0L
        qs.foreach { case (q, _) =>
          val top = vecs.toSeq.filter(_._1 != q)
            .map { case (id, v) => (id, cos(vecs(q), v)) }
            .sortBy { case (id, s) => (-s, id) }.take(5).map(_._1)
          val rels = top.zipWithIndex.map { case (id, i) =>
            (i, labs.get(id).contains(label)) }
          sdcg += rels.collect { case (i, true) => w(i) }.sum
          srr += rels.find(_._2).map(p => 1000000L / (p._1 + 1)).getOrElse(0L)
          shits += rels.count(_._2)
        }
        val n = qs.size.toLong
        val ideal = idcg(math.min(labelSizes(label) - 1, 5L).toInt - 1)
        label -> ((n, r6(sdcg.toDouble / (n * ideal)),
          r6(srr.toDouble / (n * 1000000L)), r6(shits.toDouble / (n * 5L))))
      }
    assert(got == ref, s"IR metrics diverge: ${got.toSeq.sortBy(_._1).take(3)} vs ${ref.toSeq.sortBy(_._1).take(3)}")
  }

  test("cell balance report: real quantizer balanced, planted degenerate quantizer flagged") {
    import spark.implicits._
    // real store: the fitted quantizer's ratio sits under the soak
    // ceiling and every allocated cell count is coherent
    val r = graft.ops.Similarity.cellBalanceReport(spark, sfDir).collect().head
    assert(r.getAs[Long]("n_vectors") > 0)
    assert(r.getAs[Long]("n_occupied") <= r.getAs[Long]("n_cells"))
    assert(r.getAs[Long]("max_occ") >= r.getAs[Long]("n_vectors") / r.getAs[Long]("n_cells"))
    info(f"real-store balance ratio: ${r.getAs[Double]("balance_ratio")}%.2f")
    assert(r.getAs[Double]("balance_ratio") <= 8.0,
      s"real quantizer busts the soak ceiling: $r")
    // planted DEGENERATE quantizer: 100 vectors piled into one of 16
    // allocated cells — the occupied set alone looks perfectly
    // "balanced" (one cell, ratio 1 against occupied-mean), and only
    // the allocated-cell denominator exposes it: ratio = 16
    val degenerate = spark.range(100).select(col("id").as("vec_id"), lit(0).as("cell"))
    val d = graft.ops.Similarity.cellBalanceOver(degenerate, nCells = 16).collect().head
    assert(d.getAs[Long]("n_occupied") == 1L)
    assert(d.getAs[Double]("balance_ratio") == 16.0, s"degenerate ratio: $d")
    assert(d.getAs[Double]("balance_ratio") > 8.0, "the soak gate must flag this")
  }

  test("exact O(n^2) tiers refuse an over-threshold corpus loudly") {
    import spark.implicits._
    // a corpus one row past ExactTierMaxRows (tiny d=2 vectors keeps the
    // parquet write cheap); the guard must fire BEFORE any pair scan
    val n = graft.ops.Similarity.ExactTierMaxRows + 1
    val dir = java.nio.file.Files.createTempDirectory("graft-guard").toString
    spark.range(n).select(col("id").as("vec_id"),
        array((col("id") % 7).cast("float"), lit(1.0f)).as("embedding"),
        (col("id") % 3).cast("int").as("label"))
      .write.parquet(s"$dir/embeddings.parquet")
    val ex = intercept[IllegalArgumentException] {
      graft.ops.Similarity.cosineTopK(spark, dir).count()
    }
    assert(ex.getMessage.contains("ivf"), s"guard message should point at the scale tier: ${ex.getMessage}")
    val ex2 = intercept[IllegalArgumentException] {
      graft.ops.Similarity.hardNegatives(spark, dir).count()
    }
    assert(ex2.getMessage.contains("exact O(n^2)"), ex2.getMessage)
    val ex3 = intercept[IllegalArgumentException] {
      graft.ops.Dedup.semanticDedup(spark, dir).count()
    }
    assert(ex3.getMessage.contains("semanticDedup"), ex3.getMessage)
    // embeddingNearDup guards its LARGEST LABEL BLOCK: 3 labels of ~43k
    // rows each stay under the ceiling, so the call must NOT throw —
    // the guard's aggregate runs eagerly at plan-construction time, so
    // a non-throwing call plus a schema check proves it without paying
    // the ~5.7e9-row zero-survivor pair scan (review finding)
    assert(graft.ops.NearDup.embeddingNearDup(spark, dir, threshold = 2.0)
      .columns.toSeq == Seq("vec_a", "vec_b", "cosine"))
    // ...and refuse when one block exceeds it (all rows one label)
    val dir2 = java.nio.file.Files.createTempDirectory("graft-guard2").toString
    spark.range(n).select(col("id").as("vec_id"),
        array(lit(1.0f), lit(1.0f)).as("embedding"), lit(0).as("label"))
      .write.parquet(s"$dir2/embeddings.parquet")
    val ex4 = intercept[IllegalArgumentException] {
      graft.ops.NearDup.embeddingNearDup(spark, dir2).count()
    }
    assert(ex4.getMessage.contains("label block"), ex4.getMessage)
  }

  test("hard negatives IVF path: per-anchor agreement with the exact band tier") {
    def pairs(df: org.apache.spark.sql.DataFrame): Set[(Long, Long)] =
      df.collect().map(r => (r.getLong(0), r.getLong(2))).toSet
    val exact = pairs(Similarity.hardNegatives(spark, sfDir))
    val ivf = pairs(Similarity.hardNegativesIvf(spark, sfDir))
    assert(exact.nonEmpty)
    val agree = ivf.intersect(exact).size.toDouble / exact.size
    info(f"hard-negative IVF agreement at sf0.001: $agree%.4f (${ivf.size} ivf vs ${exact.size} exact)")
    assert(agree >= 0.9, f"IVF semi-hard agreement $agree%.4f below the 0.9 gate")
    // and at sf0.1 — the regime where cells multiply (auto nlist 45)
    // and a boundary-crossing band pair has real chances to be missed
    val dir01 = "/root/testdata/sf0.1"
    if (new java.io.File(dir01).isDirectory) {
      val exact01 = pairs(Similarity.hardNegatives(spark, dir01))
      val ivf01 = pairs(Similarity.hardNegativesIvf(spark, dir01))
      val agree01 = ivf01.intersect(exact01).size.toDouble / exact01.size
      info(f"hard-negative IVF agreement at sf0.1: $agree01%.4f (${exact01.size} exact)")
      assert(agree01 >= 0.9, f"IVF semi-hard agreement $agree01%.4f below the 0.9 gate at sf0.1")
    }
  }

  test("Gopher + C4 property: random mixed corpora match independent references") {
    import spark.implicits._
    val ws = "[ \t\n\f\r]+"
    val stop8 = Set("the", "be", "to", "of", "and", "that", "have", "with")
    val phrases = Seq("lorem ipsum", "javascript", "cookie policy", "terms of use")
    val vocab = Seq("alpha", "bravo", "x9", "42", "the", "and", "of", "zz#zz",
      "dots...", "mid#dle", "a", "entropy", "seventeenletters!", "q")
    for (seed <- Seq(71L, 72L, 73L)) {
      val rng = new java.util.Random(seed)
      val docs = (1L to 40L).map { id =>
        val nLines = 1 + rng.nextInt(5)
        val lines = (0 until nLines).map { _ =>
          val nw = rng.nextInt(9) // 0..8 words, so short AND long lines occur
          val base = (0 until nw).map(_ => vocab(rng.nextInt(vocab.size)))
            .mkString(if (rng.nextBoolean()) " " else "\t ")
          val decorated = rng.nextInt(6) match {
            case 0 => base + "."
            case 1 => base + "?"
            case 2 => base + " { x }"
            case 3 => base + " " + phrases(rng.nextInt(phrases.size)) + " tail."
            case 4 => "  " + base // leading spaces, no terminal punct
            case _ => base
          }
          decorated
        }
        (id, lines.mkString("\n"))
      } :+ ((41L, "")) :+ ((42L, " \t\n ")) :+
        ((43L, null: String)) // empty + whitespace-only + null docs
      val dir = java.nio.file.Files.createTempDirectory(s"graft-filtprop$seed").toString
      docs.toDF("doc_id", "text")
        .select(col("doc_id"), col("text"), lit("en").as("lang"),
          lit("prop").as("source"), length(col("text")).cast("long").as("n_chars"))
        .coalesce(1).write.parquet(s"$dir/documents.parquet")

      // ---- independent Gopher reference (planted doc filtered out)
      def words(t: String): Seq[String] =
        t.toLowerCase.split(ws, -1).toSeq.filter(_.nonEmpty)
      def r6(x: Double): Double =
        BigDecimal(x).setScale(6, BigDecimal.RoundingMode.HALF_UP).toDouble
      val gotG = graft.ops.Curation.gopherQualityFlags(spark, dir).collect()
        .filter(_.getLong(0) < graft.ops.Curation.FixtureIdBase)
        .map(r => r.getLong(0) -> ((r.getLong(3), r.getDouble(4), r.getDouble(5),
          r.getDouble(6), r.getLong(7), r.getBoolean(8)))).toMap
      val refG = docs.filter(d => d._2 != null && words(d._2).nonEmpty).map { case (id, t) =>
        val w = words(t)
        val n = w.size.toDouble
        val wordChars = t.replaceAll(ws, "").length.toDouble
        val nHash = t.count(_ == '#').toDouble
        val nEll = ((t.length - t.replace("...", "").length) / 3).toDouble
        val meanLen = wordChars / n
        val sym = (nHash + nEll) / n
        val alpha = w.count(_.exists(c => c >= 'a' && c <= 'z')) / n
        val hits = w.toSet.intersect(stop8).size.toLong
        val keep = w.size >= 50 && w.size <= 100000 && meanLen >= 3.0 &&
          meanLen <= 10.0 && sym <= 0.1 && alpha >= 0.8 && hits >= 2
        id -> ((w.size.toLong, r6(meanLen), r6(sym), r6(alpha), hits, keep))
      }.toMap
      assert(gotG == refG, s"gopher mismatch at seed $seed: " +
        s"${(gotG.toSet diff refG.toSet).take(3)} vs ${(refG.toSet diff gotG.toSet).take(3)}")

      // ---- independent C4 reference (fixture docs filtered out)
      def cls(line: String): String = {
        val low = line.toLowerCase
        if (phrases.exists(low.contains)) "badword"
        else if (line.contains("{")) "brace"
        else if (line.trim.split(ws, -1).count(_.nonEmpty) < 5) "short"
        else if (!Set('.', '!', '?', '"').contains(line.trim.last)) "no_punct"
        else "kept"
      }
      val gotC = graft.ops.Curation.c4LineFilters(spark, dir).collect()
        .filter(_.getLong(0) < graft.ops.Curation.FixtureIdBase)
        .map(r => r.getLong(0) -> ((r.getLong(1), r.getLong(2), r.getLong(3),
          r.getLong(4), r.getLong(5), r.getLong(6), r.getBoolean(7)))).toMap
      val refC = docs.filter(_._2 != null).map { case (id, t) =>
        val cs = t.split("\n", -1).toSeq.map(cls)
        def c(k: String) = cs.count(_ == k).toLong
        id -> ((cs.size.toLong, c("kept"), c("short"), c("no_punct"),
          c("brace"), c("badword"), c("kept") >= 3L))
      }.toMap
      assert(gotC == refC, s"c4 mismatch at seed $seed: " +
        s"${(gotC.toSet diff refC.toSet).take(3)} vs ${(refC.toSet diff gotC.toSet).take(3)}")

      // ---- independent Gopher-repetition reference
      val gotR = graft.ops.Curation.gopherRepetitionFlags(spark, dir).collect()
        .map(r => r.getLong(0) -> ((r.getLong(1), r.getDouble(2), r.getDouble(3),
          r.getDouble(4), r.getDouble(5), r.getDouble(6), r.getBoolean(7)))).toMap
      val refR = docs.filter(d => d._2 != null && words(d._2).nonEmpty).map { case (id, t) =>
        val lines = t.split("\n", -1).toSeq
        val lc = lines.groupBy(identity).toSeq
          .map { case (l, os) => (l.length.toLong, os.size.toLong) }
        val nLines = lines.size.toLong
        val lineChars = lc.map { case (len, cnt) => len * cnt }.sum
        val dupChars = lc.collect { case (len, cnt) if cnt > 1 => len * cnt }.sum
        val w = words(t)
        val wordChars = t.replaceAll(ws, "").length.toLong
        def cover(n: Int): Long =
          if (w.size < n) 0L
          else w.sliding(n).toSeq.map(_.mkString("\u0001"))
            .groupBy(identity).map { case (g, os) =>
              os.size.toLong * (g.length - (n - 1)) }.max
        val dupLine = 1.0 - lc.size.toDouble / nLines
        val dupLineChar = if (lineChars > 0) dupChars.toDouble / lineChars else 0.0
        val (t2, t3, t4) = (cover(2).toDouble / wordChars,
          cover(3).toDouble / wordChars, cover(4).toDouble / wordChars)
        val keep = dupLine <= 0.30 && dupLineChar <= 0.20 &&
          t2 <= 0.20 && t3 <= 0.18 && t4 <= 0.16
        id -> ((nLines, r6(dupLine), r6(dupLineChar), r6(t2), r6(t3), r6(t4), keep))
      }.toMap
      assert(gotR == refR, s"repetition mismatch at seed $seed: " +
        s"${(gotR.toSet diff refR.toSet).take(3)} vs ${(refR.toSet diff gotR.toSet).take(3)}")
    }
  }

  test("Gopher flags: planted doc passes every rule, corpus fails on stopword diversity") {
    // the seeded GATE variant (round-14 name split): the fixture row
    // lives only there; the public surface serves the corpus as-is
    val rows = graft.ops.Curation.gopherQualityFlagsSeeded(spark, sfDir).collect()
    val byId = rows.map(r => r.getLong(0) -> r).toMap
    val p = byId(graft.ops.Curation.FixtureIdBase + 101L)
    assert(p.getLong(3) == 60L, s"planted n_words: ${p.getLong(3)}")
    assert(p.getLong(7) == 5L, s"planted distinct stop hits: ${p.getLong(7)}")
    assert(p.getBoolean(8), "planted doc must pass all five Gopher rules")
    val corpus = rows.filter(_.getLong(0) < graft.ops.Curation.FixtureIdBase)
    assert(corpus.nonEmpty)
    corpus.foreach { r =>
      assert(r.getLong(7) <= 1L, "synthetic vocabulary carries at most 'the'")
      assert(!r.getBoolean(8), "corpus docs fail the stopword-diversity rule")
      assert(r.getDouble(6) == 1.0, "all-alphabetic words => alpha_frac 1.0")
      assert(r.getDouble(5) == 0.0, "no # or ... in the corpus")
    }
  }
}
