package graft

import scala.collection.mutable
import org.apache.spark.scheduler.{SparkListener, SparkListenerJobStart, SparkListenerJobEnd, SparkListenerStageCompleted}
import org.apache.spark.sql.SparkSession

/** Per-query stage attribution for the optimization rounds: runs the named
  * registered queries (or, with no args, a built-in hot list) min-of-2 and
  * prints, for the SECOND (warm) pass, every Spark job and stage with wall
  * time, task count, shuffle read/write bytes and spill — the evidence the
  * bench total cannot give (guide §1: decide whether time goes to shuffle,
  * compute or scheduling before touching anything).
  *
  * Run: SPARK_GRAFT_SF_DIR=/root/testdata/sf0.1 SPARK_GRAFT_CPUS=32 \
  *   sbt "Test/runMain graft.BenchProfile <query> <query> ..."
  */
object BenchProfile {

  final case class StageRow(jobId: Int, stageId: Int, name: String, tasks: Int,
      runMs: Long, shufReadMB: Double, shufWriteMB: Double, spillMB: Double,
      inputMB: Double)

  def main(args: Array[String]): Unit = {
    val sfDir = sys.env.getOrElse("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    val cpus = sys.env.getOrElse("SPARK_GRAFT_CPUS", "32")
    val spark = SparkSession.builder()
      .master(s"local[$cpus]")
      .config("spark.sql.shuffle.partitions", cpus)
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("WARN")

    val names: Seq[String] =
      if (args.nonEmpty) args.toSeq
      else Seq("tfidf_cosine_pairs", "fc_hybrid", "minhash_candidates",
        "snm_candidates", "fc_arima", "sql_part_concentration",
        "column_correlations", "sql_large_orders", "open_orders_daily",
        "session_concurrency", "doc_perplexity", "ann_ivf_pq_topk_filtered",
        "ann_lsh_topk")

    // stage bookkeeping: job start/end wall-clock + per-stage task metrics
    val stages = mutable.ArrayBuffer.empty[StageRow]
    val jobOfStage = mutable.Map.empty[Int, Int]
    val jobWall = mutable.Map.empty[Int, (Long, Long)]
    var collecting = false
    val listener = new SparkListener {
      override def onJobStart(j: SparkListenerJobStart): Unit = if (collecting) {
        j.stageIds.foreach(s => jobOfStage(s) = j.jobId)
        jobWall(j.jobId) = (j.time, 0L)
      }
      override def onJobEnd(j: SparkListenerJobEnd): Unit = if (collecting) {
        jobWall.get(j.jobId).foreach { case (s, _) => jobWall(j.jobId) = (s, j.time) }
      }
      override def onStageCompleted(sc: SparkListenerStageCompleted): Unit = if (collecting) {
        val si = sc.stageInfo
        val m = si.taskMetrics
        stages += StageRow(
          jobOfStage.getOrElse(si.stageId, -1), si.stageId,
          si.name.takeWhile(_ != '\n').take(80), si.numTasks,
          (for {c <- si.completionTime; s <- si.submissionTime} yield c - s).getOrElse(-1L),
          m.shuffleReadMetrics.totalBytesRead / 1e6,
          m.shuffleWriteMetrics.bytesWritten / 1e6,
          m.diskBytesSpilled / 1e6,
          m.inputMetrics.bytesRead / 1e6)
      }
    }
    spark.sparkContext.addSparkListener(listener)

    graft.sources.SeriesStore.ensurePartitioned(spark, sfDir)
    graft.sources.BucketStore.ensureBucketed(spark, sfDir)
    graft.sources.LayoutStore.ensureSorted(spark, sfDir)
    graft.sources.LayoutStore.ensureZOrdered(spark, sfDir)
    graft.ops.Similarity.ensureIvfIndex(spark, sfDir)
    graft.ops.Lexical.ensureLexIndex(spark, sfDir)

    def timeOne(name: String): Double = {
      val t0 = System.nanoTime()
      SparkEntry.queries(name)(spark, sfDir).count()
      (System.nanoTime() - t0) / 1e9
    }

    names.foreach { name =>
      SparkEntry.queries.get(name) match {
        case None => println(s"== $name: NOT REGISTERED"); case Some(_) =>
          val cold = timeOne(name)          // pass 1: cold (session caches build)
          stages.clear(); jobOfStage.clear(); jobWall.clear()
          collecting = true
          val warm = timeOne(name)          // pass 2: warm — what the bench min reports
          collecting = false
          // give listener events a moment to drain
          Thread.sleep(300)
          println(f"%n== $name cold=$cold%.3f warm=$warm%.3f s  (warm pass detail)")
          val byJob = stages.groupBy(_.jobId).toSeq.sortBy(_._1)
          byJob.foreach { case (jid, ss) =>
            val wall = jobWall.get(jid).collect { case (s, e) if e > 0 => (e - s) / 1e3 }.getOrElse(-1.0)
            println(f"  job $jid%3d wall=$wall%7.3f s")
            ss.sortBy(_.stageId).foreach { r =>
              println(f"    stage ${r.stageId}%4d ${r.runMs}%6d ms tasks=${r.tasks}%3d " +
                f"in=${r.inputMB}%7.1f MB sr=${r.shufReadMB}%7.2f MB sw=${r.shufWriteMB}%7.2f MB " +
                f"spill=${r.spillMB}%6.1f MB  ${r.name}%s")
            }
          }
          val totJob = jobWall.values.collect { case (s, e) if e > 0 => e - s }.sum / 1e3
          println(f"  jobs=${byJob.size} sum_job_wall=$totJob%.3f s  (gap to warm = driver/plan time)")
      }
    }
    spark.stop()
  }
}
