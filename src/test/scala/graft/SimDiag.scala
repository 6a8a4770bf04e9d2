package graft

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions._
import graft.ops.NearDup

/** Scratch diagnostic (deleted before commit): hamming distribution of
  * the exact J>=0.95 pairs' simhash signatures. */
object SimDiag {
  def main(args: Array[String]): Unit = {
    val spark = SparkSession.builder().master("local[8]")
      .config("spark.sql.shuffle.partitions", 8)
      .config("spark.ui.enabled", false).appName("simdiag").getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
    val dir = "/root/testdata/sf0.01"
    val exact = NearDup.blockedJaccard(spark, dir, 0.95).select("doc_a", "doc_b")
    val sigs = NearDup.simhash(spark, dir).select(col("doc_id"), col("simhash"))
    val withH = exact
      .join(sigs.withColumnRenamed("doc_id", "doc_a").withColumnRenamed("simhash", "sa"), "doc_a")
      .join(sigs.withColumnRenamed("doc_id", "doc_b").withColumnRenamed("simhash", "sb"), "doc_b")
      .withColumn("hamming", expr("bit_count(sa ^ sb)"))
    withH.groupBy("hamming").count().orderBy("hamming").show(70)
    // background: ALL-pairs hamming distribution (percentiles)
    val sa = sigs.select(col("doc_id").as("da"), col("simhash").as("sa"))
    val sb = sigs.select(col("doc_id").as("db"), col("simhash").as("sb"))
    sa.join(sb, col("da") < col("db"))
      .withColumn("hamming", expr("bit_count(sa ^ sb)"))
      .agg(count(lit(1)).as("pairs"),
        expr("percentile(hamming, array(0.001, 0.01, 0.05, 0.25, 0.5))").as("pcts"),
        sum(when(col("hamming") <= 11, 1).otherwise(0)).as("le11"),
        sum(when(col("hamming") <= 7, 1).otherwise(0)).as("le7"),
        sum(when(col("hamming") <= 3, 1).otherwise(0)).as("le3")).show(false)
    // doc token-length context
    spark.read.parquet(s"$dir/documents.parquet")
      .select(size(split(lower(trim(col("text"))), "\\s+")).as("ntok"))
      .agg(min("ntok"), expr("percentile(ntok, 0.5)"), max("ntok")).show()
    spark.stop()
  }
}
