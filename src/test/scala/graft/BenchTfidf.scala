package graft

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/** Standalone kernel-vs-legacy evidence for `tfidf_cosine_pairs`
  * (round-16 verdict ask #3): the round-15 TrigramTf codegen kernel
  * replaced the corpus-scale posexplode + per-doc `lead` window + (doc,
  * gram) groupBy tf lineage, but the promised bench win was never
  * isolated from window noise. This main times, min-of-2 in one JVM at
  * `SPARK_GRAFT_SF_DIR`:
  *
  *  - `tf_kernel_build_s` / `tf_legacy_build_s`: the tf-frame stage
  *    alone, fresh persist + count each run (the stage the kernel
  *    actually replaced);
  *  - `pairs_on_cached_tf_s`: the downstream weighting + postings join
  *    over an already-cached tf frame (the cost the kernel CANNOT
  *    touch — the inherent remainder of the exact weighted tier);
  *  - `e2e_kernel_s` / `e2e_legacy_s`: tf build + pairs, uncached.
  *
  * Spin-loop steal calibration as in [[graft.Bench]]. Test scope on
  * purpose: the legacy lineage lives here (with OpsSpec's parity test),
  * not in production code.
  *
  * Run: SPARK_GRAFT_SF_DIR=/root/testdata/sf0.1 SPARK_GRAFT_CPUS=32 \
  *   sbt "Test/runMain graft.BenchTfidf"
  */
object BenchTfidf {

  private def kernelTf(spark: SparkSession, sfDir: String): DataFrame =
    spark.read.parquet(s"$sfDir/documents.parquet")
      .select(col("doc_id"), graft.functions.ScaleFunctions.trigram_tf(
        lower(trim(coalesce(col("text"), lit(""))))).as("k"))
      .select(col("doc_id"), col("k.dl").as("dl"), explode(col("k.grams")).as("gt"))
      .select(col("doc_id"), col("dl"), col("gt.g").as("g"), col("gt.tf").as("tf"))

  private def legacyTf(spark: SparkSession, sfDir: String): DataFrame = {
    val toks = spark.read.parquet(s"$sfDir/documents.parquet")
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

  def main(args: Array[String]): Unit = {
    val sfDir = sys.env.getOrElse("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    val cpus = sys.env.getOrElse("SPARK_GRAFT_CPUS", "32")
    val spark = SparkSession.builder()
      .master(s"local[$cpus]")
      .config("spark.sql.shuffle.partitions", cpus)
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("WARN")

    def spinMs(): Double = {
      var x = 0x9e3779b97f4a7c15L; var i = 0L
      val t0 = System.nanoTime()
      while (i < 800000000L) { x ^= x << 13; x ^= x >>> 7; x ^= x << 17; i += 1 }
      if (x == 42L) println("")
      (System.nanoTime() - t0) / 1e6
    }

    def timed(f: => Unit): Double = {
      val t0 = System.nanoTime(); f; (System.nanoTime() - t0) / 1e9
    }
    def min2(f: => Unit): Double = math.min(timed(f), timed(f))

    // warm-up: JIT + codegen + parquet footers off the timed passes
    kernelTf(spark, sfDir).count()
    legacyTf(spark, sfDir).count()

    val spinBefore = spinMs()
    def buildOnce(mk: => DataFrame): Unit = {
      val df = mk.persist(org.apache.spark.storage.StorageLevel.MEMORY_AND_DISK)
      df.count()
      df.unpersist(blocking = true)
      ()
    }
    val tfKernel = min2(buildOnce(kernelTf(spark, sfDir)))
    val tfLegacy = min2(buildOnce(legacyTf(spark, sfDir)))

    val cached = kernelTf(spark, sfDir)
      .persist(org.apache.spark.storage.StorageLevel.MEMORY_AND_DISK)
    cached.count()
    val pairsCached = min2 {
      graft.ops.NearDup.tfidfCosinePairsFrom(cached).count(); ()
    }
    cached.unpersist(blocking = true)

    def e2e(mk: => DataFrame): Unit = {
      val tf = mk.persist(org.apache.spark.storage.StorageLevel.MEMORY_AND_DISK)
      tf.count() // the production operator persists its tf frame too
      graft.ops.NearDup.tfidfCosinePairsFrom(tf).count()
      tf.unpersist(blocking = true)
      ()
    }
    val e2eKernel = min2(e2e(kernelTf(spark, sfDir)))
    val e2eLegacy = min2(e2e(legacyTf(spark, sfDir)))
    val spinAfter = spinMs()

    println(f"""{"sf_dir":"$sfDir","tf_kernel_build_s":$tfKernel%.3f,""" +
      f""""tf_legacy_build_s":$tfLegacy%.3f,""" +
      f""""pairs_on_cached_tf_s":$pairsCached%.3f,""" +
      f""""e2e_kernel_s":$e2eKernel%.3f,"e2e_legacy_s":$e2eLegacy%.3f,""" +
      f""""spin_before_ms":$spinBefore%.0f,"spin_after_ms":$spinAfter%.0f}""")
    spark.stop()
  }
}
