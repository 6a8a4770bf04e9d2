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
