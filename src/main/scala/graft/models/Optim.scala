package graft.models

/** Small numeric kernels shared by the model families. Everything here
  * runs inside a single executor task on one series (≤10k points —
  * TimeSeriesFunctions_GPL_0.5.1.R:28 caps series length), so plain
  * arrays + scalar loops are the right tool: no driver round-trips, no
  * allocation churn, JIT-friendly.
  */
object Optim {

  /** Nelder–Mead simplex minimizer with box-penalty support. The
    * reference's model fits delegate to R `optim`'s Nelder–Mead (inside
    * forecast::ets etc.); this is the same classic algorithm
    * (reflection/expansion/contraction/shrink, standard 1/2/0.5/0.5
    * coefficients).
    *
    * @param f     objective; return Double.MaxValue-ish for infeasible
    * @param x0    starting point
    * @param step  initial simplex step per coordinate
    */
  def nelderMead(
      f: Array[Double] => Double,
      x0: Array[Double],
      step: Array[Double],
      maxIter: Int = 500,
      tol: Double = 1e-8): (Array[Double], Double) = {
    val n = x0.length
    if (n == 0) return (x0, f(x0))
    // build initial simplex
    val xs = Array.tabulate(n + 1) { i =>
      val p = x0.clone()
      if (i > 0) p(i - 1) += step(i - 1)
      p
    }
    val fs = xs.map(f)
    var iter = 0
    while (iter < maxIter) {
      // order
      val idx = fs.indices.sortBy(fs)
      val best = idx.head; val worst = idx.last; val second = idx(idx.length - 2)
      if (math.abs(fs(worst) - fs(best)) <= tol * (math.abs(fs(best)) + tol)) {
        return (xs(best), fs(best))
      }
      // centroid of all but worst
      val c = new Array[Double](n)
      var i = 0
      while (i <= n) {
        if (i != worst) { var j = 0; while (j < n) { c(j) += xs(i)(j); j += 1 } }
        i += 1
      }
      var j = 0; while (j < n) { c(j) /= n; j += 1 }
      def combine(a: Array[Double], b: Array[Double], t: Double): Array[Double] = {
        val out = new Array[Double](n)
        var k = 0; while (k < n) { out(k) = a(k) + t * (b(k) - a(k)); k += 1 }
        out
      }
      val xr = combine(c, xs(worst), -1.0) // reflection
      val fr = f(xr)
      if (fr < fs(best)) {
        val xe = combine(c, xs(worst), -2.0) // expansion
        val fe = f(xe)
        if (fe < fr) { xs(worst) = xe; fs(worst) = fe }
        else { xs(worst) = xr; fs(worst) = fr }
      } else if (fr < fs(second)) {
        xs(worst) = xr; fs(worst) = fr
      } else {
        val xc = combine(c, xs(worst), 0.5) // contraction
        val fc = f(xc)
        if (fc < fs(worst)) { xs(worst) = xc; fs(worst) = fc }
        else {
          // shrink toward best
          var i2 = 0
          while (i2 <= n) {
            if (i2 != best) {
              xs(i2) = combine(xs(best), xs(i2), 0.5)
              fs(i2) = f(xs(i2))
            }
            i2 += 1
          }
        }
      }
      iter += 1
    }
    val bi = fs.indices.minBy(fs)
    (xs(bi), fs(bi))
  }

  /** Ordinary least squares y ~ 1 + t on (0-based) index — returns
    * (intercept, slope). Closed form; used by Theta's drift (R:129
    * semantics: drift = half the lm slope). */
  def olsLine(y: Array[Double]): (Double, Double) = {
    val n = y.length
    if (n < 2) return (if (n == 1) y(0) else 0.0, 0.0)
    var st = 0.0; var sy = 0.0; var stt = 0.0; var sty = 0.0
    var i = 0
    while (i < n) { st += i; sy += y(i); stt += i.toDouble * i; sty += i * y(i); i += 1 }
    val slope = (n * sty - st * sy) / (n * stt - st * st)
    val inter = (sy - slope * st) / n
    (inter, slope)
  }

  /** Deterministic 64-bit mix of a series — seeds simulation-based
    * prediction intervals so golden tests are reproducible (SURVEY.md
    * §5.4). */
  def seedOf(y: Array[Double]): Long = {
    var h = 0x9e3779b97f4a7c15L
    var i = 0
    while (i < y.length) {
      var x = java.lang.Double.doubleToLongBits(y(i))
      x = (x ^ (x >>> 30)) * 0xbf58476d1ce4e5b9L
      x = (x ^ (x >>> 27)) * 0x94d049bb133111ebL
      h ^= x ^ (x >>> 31); h *= 0x2545f4914f6cdd1dL
      i += 1
    }
    h
  }
}
