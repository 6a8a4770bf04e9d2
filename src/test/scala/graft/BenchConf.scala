package graft

import org.apache.spark.sql.SparkSession

/** Conf-variant A/B harness for the optimization rounds: times a
  * representative query subset min-of-2 under named runtime-conf variants
  * in ONE JVM (guide §1.3 — isolate the variable; JIT/session caches are
  * shared so only the conf differs between variants). The first and last
  * variant should both be "base" so window drift over the run is visible.
  *
  * Run: SPARK_GRAFT_SF_DIR=/root/testdata/sf0.1 SPARK_GRAFT_CPUS=32 \
  *   SPARK_GRAFT_CONF_QUERIES=a,b,c \
  *   sbt "Test/runMain graft.BenchConf base splitlo aqefloor both base"
  */
object BenchConf {

  /** Runtime-settable conf variants. Every variant lists ALL keys the
    * experiment touches so switching variants fully resets state. */
  val variants: Map[String, Map[String, String]] = Map(
    "base" -> Map(
      "spark.sql.files.maxPartitionBytes" -> "134217728",
      "spark.sql.files.openCostInBytes" -> "4194304",
      "spark.sql.adaptive.coalescePartitions.minPartitionSize" -> "1048576",
      "spark.sql.adaptive.coalescePartitions.initialPartitionNum" -> "32"),
    // finer file splits: a 32-core session should not scan a 40 MB fact
    // table in 3 tasks (guide §6.2) — 4 MB target / 256 KB open cost
    "splitlo" -> Map(
      "spark.sql.files.maxPartitionBytes" -> "4194304",
      "spark.sql.files.openCostInBytes" -> "262144",
      "spark.sql.adaptive.coalescePartitions.minPartitionSize" -> "1048576",
      "spark.sql.adaptive.coalescePartitions.initialPartitionNum" -> "32"),
    // lower AQE coalesce floor: stop byte-blind coalescing of tiny but
    // compute-amplified shuffles down to ONE task (guide §2.4)
    "aqefloor" -> Map(
      "spark.sql.files.maxPartitionBytes" -> "134217728",
      "spark.sql.files.openCostInBytes" -> "4194304",
      "spark.sql.adaptive.coalescePartitions.minPartitionSize" -> "65536",
      "spark.sql.adaptive.coalescePartitions.initialPartitionNum" -> "32"),
    "both" -> Map(
      "spark.sql.files.maxPartitionBytes" -> "4194304",
      "spark.sql.files.openCostInBytes" -> "262144",
      "spark.sql.adaptive.coalescePartitions.minPartitionSize" -> "65536",
      "spark.sql.adaptive.coalescePartitions.initialPartitionNum" -> "32"),
    // more AQE headroom: start shuffles wider than the core count and
    // let coalescing shrink them (scale shape: initial ∝ data, not cores)
    "wide" -> Map(
      "spark.sql.files.maxPartitionBytes" -> "4194304",
      "spark.sql.files.openCostInBytes" -> "262144",
      "spark.sql.adaptive.coalescePartitions.minPartitionSize" -> "65536",
      "spark.sql.adaptive.coalescePartitions.initialPartitionNum" -> "128"))

  def main(args: Array[String]): Unit = {
    val sfDir = sys.env.getOrElse("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    val cpus = sys.env.getOrElse("SPARK_GRAFT_CPUS", "32")
    val spark = SparkSession.builder()
      .master(s"local[$cpus]")
      .config("spark.sql.shuffle.partitions", cpus)
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("WARN")

    graft.sources.SeriesStore.ensurePartitioned(spark, sfDir)
    graft.sources.BucketStore.ensureBucketed(spark, sfDir)
    graft.sources.LayoutStore.ensureSorted(spark, sfDir)
    graft.sources.LayoutStore.ensureZOrdered(spark, sfDir)
    graft.ops.Similarity.ensureIvfIndex(spark, sfDir)
    graft.ops.Lexical.ensureLexIndex(spark, sfDir)

    val names: Seq[String] = sys.env.get("SPARK_GRAFT_CONF_QUERIES") match {
      case Some(s) => s.split(",").map(_.trim).filter(_.nonEmpty).toSeq
      case None => Seq("tfidf_cosine_pairs", "sql_part_concentration",
        "column_correlations", "sql_large_orders", "open_orders_daily",
        "doc_perplexity", "minhash_candidates", "snm_candidates")
    }
    val missing = names.filterNot(SparkEntry.queries.contains)
    require(missing.isEmpty, s"not registered: ${missing.mkString(",")}")

    def spinMs(): Double = {
      var x = 0x9e3779b97f4a7c15L; var i = 0L
      val t0 = System.nanoTime()
      while (i < 800000000L) { x ^= x << 13; x ^= x >>> 7; x ^= x << 17; i += 1 }
      if (x == 42L) println("")
      (System.nanoTime() - t0) / 1e6
    }

    def timeOne(name: String): Double = {
      val t0 = System.nanoTime()
      try { SparkEntry.queries(name)(spark, sfDir).count() }
      catch { case _: Throwable => return -1.0 }
      (System.nanoTime() - t0) / 1e9
    }

    val order = if (args.nonEmpty) args.toSeq else Seq("base", "both", "base")
    order.zipWithIndex.foreach { case (v, idx) =>
      val conf = variants.getOrElse(v, sys.error(s"unknown variant $v"))
      conf.foreach { case (k, value) => spark.conf.set(k, value) }
      val spin0 = spinMs()
      val times = names.map(n => n -> timeOne(n))
      val best = times.map { case (n, t1) => n -> math.min(t1, timeOne(n)) }
      val spin1 = spinMs()
      val total = best.map(_._2).sum
      println(f"%n### variant=$v idx=$idx total=$total%.3f s spin=${spin0}%.0f/${spin1}%.0f ms")
      best.sortBy(-_._2).foreach { case (n, t) => println(f"  $t%8.4f  $n") }
    }
    spark.stop()
  }
}
