package graft

import java.nio.file.Files

import org.apache.spark.sql.SparkSession
import org.scalatest.BeforeAndAfterAll
import org.scalatest.funsuite.AnyFunSuite

import graft.core.Methods
import graft.engine.{Engine, Names}

/** The generic wrapper skeleton (R:104-124): 3-branch cache logic, warm
  * cache on train, horizon>14 persist rule, name sanitization.
  */
class EngineSpec extends AnyFunSuite with BeforeAndAfterAll {

  private val sfDir = "/root/testdata/sf0.001"
  private lazy val spark: SparkSession = SparkSession.builder()
    .master("local[4]")
    .config("spark.sql.shuffle.partitions", "4")
    .config("spark.ui.enabled", "false")
    .getOrCreate()

  override def afterAll(): Unit = spark.stop()

  test("sanitize strips non-alphanumerics exactly like gsub('[^[:alnum:] ]','') (R:43)") {
    assert(Names.sanitize("a.b-c_d e!") == "abcd e")
    assert(Names.sanitize(Names.sanitize("x@y")) == Names.sanitize("x@y"), "idempotent")
  }

  test("wrapper: miss → train+warm cache; hit → slice; stale → re-forecast from params") {
    val base = Files.createTempDirectory("graft-engine").toString
    val eng = new Engine(spark, base)
    val name = "purchase"
    val idx = eng.indexName(sfDir)

    // (c) miss: trains, warms a 14-step cache
    assert(!eng.models.exists(name, idx, Methods.THETA))
    val first = eng.forecast(name, sfDir, Methods.THETA, 7, 10).collect()
    assert(first.length == 10)
    assert(eng.models.exists(name, idx, Methods.THETA))
    assert(eng.cache.isValid(name, idx, Methods.THETA, 14), "train warms cacheLength steps (R:92-93)")

    // (a) hit with valid cache: pure slice, identical prefix values
    val sliced = eng.forecast(name, sfDir, Methods.THETA, 7, 5).collect()
    assert(sliced.length == 5)
    val firstByStep = first.map(r => r.getAs[Int]("step") -> r.getAs[Double]("mean")).toMap
    sliced.foreach(r =>
      assert(r.getAs[Double]("mean") == firstByStep(r.getAs[Int]("step")),
        "cache-hit slice must equal the fresh forecast prefix (R:110 vs R:113)"))

    // (b) stale cache (horizon beyond cached length): re-forecast from the
    // SAVED params — no refit — and refresh the cache
    val long = eng.forecast(name, sfDir, Methods.THETA, 7, 20).collect()
    assert(long.length == 20)
    assert(eng.cache.isValid(name, idx, Methods.THETA, 20), "stale path refreshes the cache")
    long.filter(_.getAs[Int]("step") <= 10).foreach(r =>
      assert(r.getAs[Double]("mean") == firstByStep(r.getAs[Int]("step")),
        "re-forecast from persisted params must reproduce the prefix"))
  }

  test("branch (a) is a genuine store read, not a silent recompute") {
    // For SES a fresh h=7 forecast is row-identical to the h=14 cache
    // slice, so value equality alone cannot prove the slice path runs.
    // Overwrite the persisted cache with sentinel values after training:
    // if the second call re-derived the forecast it would return SES
    // numbers; the sentinels coming back prove the rows were READ from
    // the store (R:110).
    import spark.implicits._
    val base = Files.createTempDirectory("graft-engine-sentinel").toString
    val eng = new Engine(spark, base)
    val name = "purchase"
    val idx = eng.indexName(sfDir)

    eng.forecast(name, sfDir, Methods.SES, 7, 14).collect()
    val sentinels = (1 to 14).map(st =>
      graft.core.ForecastPoint(name, Methods.SES, st, -1, -2, 123.456, 2, 1)).toDF()
    eng.cache.save(name, idx, Methods.SES, sentinels)

    val out = eng.forecast(name, sfDir, Methods.SES, 7, 7).collect()
    assert(out.length == 7)
    out.foreach { r =>
      assert(r.getAs[Double]("mean") == 123.456,
        "cache hit must serve the stored rows verbatim — slice, no model math")
      assert(r.getAs[Int]("step") <= 7, "slice bound (R:110)")
    }
  }

  test("wrapper train → params → cache round-trips every registered method") {
    val base = Files.createTempDirectory("graft-engine-all").toString
    val eng = new Engine(spark, base)
    val idx = eng.indexName(sfDir)
    // HYBRID excluded: full CV per method × tiny CI budget; covered by
    // ModelFamiliesSpec + the fc_hybrid driver query
    Methods.all.filterNot(_ == Methods.HYBRID).foreach { m =>
      val out = eng.forecast("click", sfDir, m, 7, 6).collect()
      assert(out.length == 6, s"$m horizon rows")
      assert(eng.models.exists("click", idx, m), s"$m model persisted")
      // second call is a cache slice of the warm cache — same prefix
      val again = eng.forecast("click", sfDir, m, 7, 3).collect()
      assert(again.length == 3, s"$m cache slice")
    }
  }

  test("ingest→cache invalidation: a streamed append flips forecast() to branch (c); parity mode serves stale") {
    // round-14 extension (round-13 verdict ask #3). Two engines over the
    // same mutable store: the parity engine (flag off, R:64-82) must keep
    // serving the pre-append cache; the invalidation engine must detect
    // the changed observation window and retrain. Branch detection uses
    // the sentinel trick: overwrite the cache after training — a served
    // sentinel proves branch (a), a non-sentinel answer after the append
    // proves the cache (and model) were invalidated.
    import spark.implicits._
    val store = Files.createTempDirectory("graft-ingest-store").toString
    val stage = Files.createTempDirectory("graft-ingest-stage").toString
    val ckpt = Files.createTempDirectory("graft-ingest-ckpt").toString
    val name = "metric"
    val epoch0 = java.time.Instant.parse("2024-01-01T00:00:00Z")
    def eventRows(ids: Range): org.apache.spark.sql.DataFrame =
      ids.map { i =>
        (i.toLong, epoch0.plusSeconds(i.toLong * 3600), // strictly increasing
          null.asInstanceOf[java.lang.Long], name, 10.0 + (i % 5).toDouble, "{}")
      }.toDF("event_id", "ts", "user_id", "event_type", "value", "props")
    // the store is STREAM-maintained from the start (the file sink's
    // _spark_metadata log owns the directory's file listing — mixing a
    // batch-written seed with streamed appends would shadow the seed),
    // so both the seed batch and the later append ride the same
    // checkpointed AvailableNow writer — the live observation-store
    // shape of EventIngest.start
    def streamAppend(batch: org.apache.spark.sql.DataFrame, batchDir: String): Unit = {
      batch.write.mode("overwrite").parquet(batchDir)
      val q = spark.readStream
        .schema("event_id BIGINT, ts TIMESTAMP, user_id BIGINT, event_type STRING, value DOUBLE, props STRING")
        .parquet(stage + "/*")
        .writeStream.outputMode("append")
        .option("checkpointLocation", ckpt)
        .format("parquet").option("path", s"$store/events.parquet")
        .trigger(org.apache.spark.sql.streaming.Trigger.AvailableNow()).start()
      q.awaitTermination()
    }
    streamAppend(eventRows(0 until 40), s"$stage/b0")

    val parity = new Engine(spark, Files.createTempDirectory("graft-ing-par").toString)
    val invalidating = new Engine(spark, Files.createTempDirectory("graft-ing-inv").toString)
    invalidating.invalidateOnIngest = true
    val idx = parity.indexName(store)

    Seq(parity, invalidating).foreach { eng =>
      eng.forecast(name, store, Methods.SES, 7, 7).collect()
      val sentinels = (1 to 14).map(st =>
        graft.core.ForecastPoint(name, Methods.SES, st, -1, -2, 987.654, 2, 1)).toDF()
      eng.cache.save(name, idx, Methods.SES, sentinels)
      // pre-append: BOTH engines serve the cache (stamp matches)
      val hit = eng.forecast(name, store, Methods.SES, 7, 5).collect()
      assert(hit.forall(_.getAs[Double]("mean") == 987.654),
        "pre-append call must be a cache hit in both modes")
    }

    // the streamed append: new raw events land in the observation store
    // through the same checkpointed writer
    streamAppend(eventRows(40 until 55), s"$stage/b1")

    // parity engine: reference-faithful STALE serve (R:64-82 — horizon-
    // only validity; new data changes nothing until manual deletion)
    val stale = parity.forecast(name, store, Methods.SES, 7, 5).collect()
    assert(stale.forall(_.getAs[Double]("mean") == 987.654),
      "parity mode must serve the stale cache after ingest")

    // invalidation engine: stamp mismatch ⇒ branch (c) — sentinels gone,
    // a REAL SES forecast over the 55-point series comes back, and the
    // new stamp covers the appended window
    val fresh = invalidating.forecast(name, store, Methods.SES, 7, 5).collect()
    assert(fresh.length == 5)
    assert(fresh.forall(_.getAs[Double]("mean") != 987.654),
      "invalidation mode must retrain after a streamed append")
    // max ts of the FULL 55-row window, in the engine's epoch-nanos
    // contract: id 54 at epoch0 + 54 h
    val maxNanos = (epoch0.getEpochSecond + 54L * 3600L) * 1000000000L
    assert(invalidating.stamps.matches(name, idx, Methods.SES, 55L, maxNanos),
      "retrain records the post-append observation stamp")
  }

  test("availableMethods mirrors the reference registry byte-for-byte (R:6-7)") {
    val eng = new Engine(spark, Files.createTempDirectory("graft-engine2").toString)
    assert(eng.availableMethods == Seq("ARIMA", "ARIMA_FORCE_SEASONALITY", "THETA", "ETS",
      "ETSDAMPED", "BAGGEDETS", "STL", "NN", "HYBRID", "PROPHET"))
  }

  test("ping probes the store (R:16-21 semantics)") {
    val eng = new Engine(spark, Files.createTempDirectory("graft-engine3").toString)
    assert(eng.ping(sfDir))
    assert(!eng.ping("/nonexistent/store"))
  }
}
