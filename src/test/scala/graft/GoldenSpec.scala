package graft

import org.scalatest.funsuite.AnyFunSuite

import graft.core.Forecasts

/** Golden-output regression net for the SEEDED stochastic forecast paths
  * (SURVEY.md §5.4): NN simulation prediction intervals, bagged-ETS
  * bootstrap replicates, and Prophet's changepoint-simulation intervals
  * are all deterministic given `Optim.seedOf(series)` — but none of them
  * is DuckDB-oracle-checkable, so without frozen outputs a silent
  * RNG-ordering regression would pass every other test. These fixtures
  * pin the exact doubles (full `Double.toString` precision) on the
  * FIXTURES.md §4 `trend_season` / `ar1` seeded series.
  *
  * Regenerate intentionally (after an on-purpose numeric change) with:
  *   sbt "Test/runMain graft.GoldenRegen"
  * and review the diff — an UNINTENDED diff here is a regression.
  */
object Golden {
  val H = 14
  val Freq = 7

  /** FIXTURES.md §4 `trend_season`: linear + weekly sine + seeded noise. */
  def trendSeason(n: Int = 120): Array[Double] = {
    val rng = new java.util.Random(42L)
    Array.tabulate(n)(t =>
      2.0 + 0.5 * t + 3.0 * math.sin(2 * math.Pi * t / 7.0) + 0.5 * rng.nextGaussian())
  }

  /** FIXTURES.md §4 `ar1`: φ = 0.7, seeded innovations. */
  def ar1(n: Int = 120): Array[Double] = {
    val rng = new java.util.Random(42L)
    val y = new Array[Double](n)
    var prev = 0.0
    var i = 0
    while (i < n) { prev = 0.7 * prev + rng.nextGaussian(); y(i) = prev; i += 1 }
    y
  }

  /** The frozen paths: name → forecast producer. The seeded stochastic
    * families (NN/bagged/Prophet) catch RNG-ordering regressions; the
    * DETERMINISTIC families (ARIMA/ETS/Theta/STL/TBATS/hybrid) catch
    * silent numeric drift — their invariant tests would pass a fit that
    * quietly changed, these fixtures will not. */
  def cases: Seq[(String, () => Forecasts)] = Seq(
    "nn_trend_season" -> (() =>
      graft.models.NNar.NNFamily.fit(trendSeason(), Freq).forecast(H)),
    "nn_ar1" -> (() =>
      graft.models.NNar.NNFamily.fit(ar1(), Freq).forecast(H)),
    "bagged_trend_season" -> (() =>
      graft.models.Bagged.BaggedFamily.fit(trendSeason(), Freq).forecast(H)),
    "prophet_trend_season" -> (() =>
      graft.models.ProphetLite.ProphetFamily.fit(trendSeason(), Freq).forecast(H)),
    "arima_trend_season" -> (() =>
      graft.models.Arima.ArimaFamily.fit(trendSeason(), Freq).forecast(H)),
    "arima_ar1" -> (() =>
      graft.models.Arima.ArimaFamily.fit(ar1(), Freq).forecast(H)),
    "arima_force_seasonal_trend_season" -> (() =>
      graft.models.Arima.ArimaForceSeasonalFamily.fit(trendSeason(), Freq).forecast(H)),
    "theta_trend_season" -> (() =>
      graft.models.Theta.ThetaFamily.fit(trendSeason(), Freq).forecast(H)),
    "ets_trend_season" -> (() =>
      graft.models.Ets.EtsFamily.fit(trendSeason(), Freq).forecast(H)),
    "etsdamped_trend_season" -> (() =>
      graft.models.Ets.EtsDampedFamily.fit(trendSeason(), Freq).forecast(H)),
    "stl_trend_season" -> (() =>
      graft.models.Stl.StlFamily.fit(trendSeason(), Freq).forecast(H)),
    "tbats_trend_season" -> (() =>
      graft.models.Tbats.TbatsFamily.fit(trendSeason(), Freq).forecast(H)),
    "tbats_ar1" -> (() =>
      graft.models.Tbats.TbatsFamily.fit(ar1(), Freq).forecast(H)),
    "hybrid_trend_season" -> (() =>
      graft.models.Hybrid.HybridFamily.fit(trendSeason(), Freq).forecast(H)))

  def render(f: Forecasts): String =
    (0 until f.length).map { j =>
      Seq(j + 1, f.lower1(j), f.lower2(j), f.mean(j), f.upper1(j), f.upper2(j))
        .mkString(",")
    }.mkString("\n") + "\n"

  val dir = "src/test/resources/golden"
}

/** Writes the golden files — run ONLY for an intentional regeneration. */
object GoldenRegen {
  def main(args: Array[String]): Unit = {
    val d = new java.io.File(Golden.dir)
    d.mkdirs()
    Golden.cases.foreach { case (name, fc) =>
      val out = new java.io.File(d, s"$name.csv")
      java.nio.file.Files.writeString(out.toPath, Golden.render(fc()))
      println(s"wrote ${out.getPath}")
    }
  }
}

class GoldenSpec extends AnyFunSuite {

  Golden.cases.foreach { case (name, fc) =>
    test(s"golden: $name matches the frozen seeded output bit-exactly") {
      val res = getClass.getResourceAsStream(s"/golden/$name.csv")
      assert(res != null,
        s"missing golden fixture $name.csv — run sbt \"Test/runMain graft.GoldenRegen\" and commit it")
      val expected = new String(res.readAllBytes(), java.nio.charset.StandardCharsets.UTF_8)
      val actual = Golden.render(fc())
      assert(actual == expected,
        s"$name seeded output drifted from the committed fixture — if intentional, regenerate")
    }
  }
}
