package graft

import org.scalacheck.Gen
import org.scalacheck.rng.Seed
import org.scalatest.funsuite.AnyFunSuite

import graft.core.Methods
import graft.engine.{Families, Names}

/** Property-based invariants of the flist contract (SURVEY.md §5.2),
  * checked across random series for every method family:
  *  ∀ method, h: exactly h steps; lower2 ≤ lower1 ≤ mean ≤ upper1 ≤
  *  upper2 (80⊂95 nesting, R:99-100); single-band methods duplicate
  *  their band (R:216-217, R:381-382); cache-slice ≡ fresh prefix
  *  (R:110 vs R:113); constant series ⇒ constant point forecast;
  *  sanitize idempotent (R:43).
  */
class ContractPropertiesSpec extends AnyFunSuite {

  /** Deterministic sampling driver over a ScalaCheck generator
    * (scalatestplus bridge not in the offline cache — raw Gen instead). */
  private def forAll[T](gen: Gen[T], samples: Int = 8)(f: T => Unit): Unit =
    (0 until samples).foreach { i =>
      f(gen.apply(Gen.Parameters.default, Seed(42L + i))
        .getOrElse(fail(s"generator returned no value for sample $i")))
    }

  private def forAll[A, B](ga: Gen[A], gb: Gen[B])(f: (A, B) => Unit): Unit =
    forAll(Gen.zip(ga, gb))(t => f(t._1, t._2))

  /** Positive, bounded, varied series — every family accepts these
    * (multiplicative classes need positivity). */
  private val seriesGen: Gen[Array[Double]] = for {
    n <- Gen.choose(30, 90)
    base <- Gen.choose(10.0, 100.0)
    slope <- Gen.choose(-0.3, 0.3)
    amp <- Gen.choose(0.0, 5.0)
    seed <- Gen.choose(0L, Long.MaxValue)
  } yield {
    val rng = new java.util.Random(seed)
    Array.tabulate(n)(i =>
      math.max(0.5, base + slope * i + amp * math.sin(2 * math.Pi * (i % 7) / 7.0)
        + rng.nextGaussian() * 0.5))
  }

  // HYBRID excluded here: it is a composition of the tested families and
  // runs its full CV per sample (covered separately in ModelFamiliesSpec)
  private val fastMethods = Methods.all.filterNot(_ == Methods.HYBRID)

  test("∀ method, series: h rows, finite, nested 80⊂95 bands") {
    forAll(seriesGen) { y =>
      fastMethods.foreach { m =>
        val f = Families.byMethod(m).fit(y, 7).forecast(10)
        assert(f.length == 10, s"$m length")
        (0 until 10).foreach { j =>
          assert(java.lang.Double.isFinite(f.mean(j)), s"$m mean finite")
          assert(f.lower2(j) <= f.lower1(j) + 1e-9, s"$m nesting l2<=l1 at $j")
          assert(f.lower1(j) <= f.mean(j) + 1e-9, s"$m nesting l1<=mean at $j")
          assert(f.mean(j) <= f.upper1(j) + 1e-9, s"$m nesting mean<=u1 at $j")
          assert(f.upper1(j) <= f.upper2(j) + 1e-9, s"$m nesting u1<=u2 at $j")
        }
      }
    }
  }

  test("∀ method: degenerate series (tiny, constant, negative) still honor the contract") {
    // below-minimum lengths exercise every family's fallback; negative
    // values exercise the Box-Cox-ineligible paths (Guerrero/log guards)
    val degenerates: Seq[Array[Double]] = Seq(
      Array(5.0),
      Array(2.0, 2.0, 2.0),
      Array(1.0, 4.0, 2.0, 8.0, 5.0),
      Array.fill(40)(7.5),                         // constant, fit-length
      Array.tabulate(60)(i => -20.0 + 0.3 * i))    // crosses zero
    degenerates.foreach { y =>
      fastMethods.foreach { m =>
        val f = Families.byMethod(m).fit(y, 7).forecast(6)
        assert(f.length == 6, s"$m on n=${y.length}: length")
        (0 until 6).foreach { j =>
          assert(java.lang.Double.isFinite(f.mean(j)), s"$m on n=${y.length}: mean finite at $j")
          assert(java.lang.Double.isFinite(f.lower2(j)) && java.lang.Double.isFinite(f.upper2(j)),
            s"$m on n=${y.length}: bands finite at $j")
          assert(f.lower2(j) <= f.mean(j) + 1e-9 && f.mean(j) <= f.upper2(j) + 1e-9,
            s"$m on n=${y.length}: band order at $j")
        }
      }
    }
  }

  test("∀ series: single-band methods duplicate their band (R:216-217, R:381-382)") {
    forAll(seriesGen) { y =>
      Seq(Methods.BAGGEDETS, Methods.PROPHET).foreach { m =>
        val f = Families.byMethod(m).fit(y, 7).forecast(6)
        (0 until 6).foreach { j =>
          assert(f.lower1(j) == f.lower2(j), s"$m lower duplicated")
          assert(f.upper1(j) == f.upper2(j), s"$m upper duplicated")
        }
      }
    }
  }

  test("∀ method, series: slice(h) equals the fresh-forecast prefix (R:110)") {
    forAll(seriesGen) { y =>
      fastMethods.foreach { m =>
        val model = Families.byMethod(m).fit(y, 7)
        val long = model.forecast(12)
        val sliced = long.slice(5)
        (0 until 5).foreach { j =>
          assert(sliced.mean(j) == long.mean(j), s"$m slice prefix")
          assert(sliced.lower2(j) == long.lower2(j))
        }
      }
    }
  }

  test("constant series ⇒ (near-)constant point forecast for level models") {
    forAll(Gen.choose(1.0, 50.0), Gen.choose(20, 60)) { (c, n) =>
      val y = Array.fill(n)(c)
      Seq(Methods.ETS, Methods.THETA, Methods.NAIVE, Methods.MEANF).foreach { m =>
        val f = Families.byMethod(m).fit(y, 7).forecast(8)
        f.mean.foreach(v => assert(math.abs(v - c) < 1e-4, s"$m constant: $v vs $c"))
      }
    }
  }

  test("∀ method, series: params round-trip preserves the forecast bit-exactly") {
    forAll(seriesGen) { y =>
      fastMethods.filterNot(_ == Methods.NN).foreach { m => // NN: 20-net payload, tested in ModelFamiliesSpec
        val family = Families.byMethod(m)
        val model = family.fit(y, 7)
        val restored = family.fromParams(model.params)
        val a = model.forecast(6); val b = restored.forecast(6)
        (0 until 6).foreach { j =>
          assert(a.mean(j) == b.mean(j), s"$m round-trip mean")
          assert(a.lower2(j) == b.lower2(j), s"$m round-trip band")
        }
      }
    }
  }

  test("sanitize is idempotent and keeps only [A-Za-z0-9 ] (R:43)") {
    forAll(Gen.asciiPrintableStr) { s =>
      val once = Names.sanitize(s)
      assert(Names.sanitize(once) == once)
      assert(once.forall(c => c.isLetterOrDigit && c < 128 || c == ' '))
    }
  }
}
