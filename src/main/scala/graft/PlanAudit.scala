package graft

import java.io.{File, PrintWriter}

import org.apache.spark.sql.SparkSession

/** Dumps the formatted physical plan of each registered query to a file —
  * the scale-review artifact (PLANS.md summarizes findings). Run:
  * `sbt "runMain graft.PlanAudit /root/testdata/sf0.01 /tmp/plans"`.
  */
object PlanAudit {
  def main(args: Array[String]): Unit = {
    val Array(sfDir, outDir) = args
    val spark = SparkSession.builder()
      .master("local[4]")
      .config("spark.sql.shuffle.partitions", "4")
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("ERROR")
    new File(outDir).mkdirs()
    SparkEntry.queries.foreach { case (name, fn) =>
      try {
        val plan = fn(spark, sfDir).queryExecution.explainString(
          org.apache.spark.sql.execution.FormattedMode)
        val pw = new PrintWriter(s"$outDir/$name.txt")
        pw.write(plan); pw.close()
      } catch { case e: Throwable => System.err.println(s"$name: $e") }
    }
    spark.stop()
  }
}
