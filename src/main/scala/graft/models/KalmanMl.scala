package graft.models

/** Exact ARMA likelihood via the Kalman filter — the `auto.arima`
  * estimation the reference requests with `approximation = FALSE`
  * (TimeSeriesFunctions_GPL_0.5.1.R:90). The CSS objective conditions on
  * pre-sample values and drops the first max(p,q) terms; near unit roots
  * and on short seasonal series that approximation changes which order
  * wins AICc. This module scores candidates by the EXACT gaussian
  * likelihood in Harvey's companion state space:
  *
  *   α_t = T α_{t-1} + R ε_t,   z_t = μ + e₁'α_t,
  *   T = companion(φ₁..φ_r),  R = (1, θ₁, …, θ_{r-1})',  r = max(p, q+1)
  *
  * with the stationary initial covariance P₀ solved from
  * vec(P) = (I − T⊗T)⁻¹ vec(RR'), and σ² concentrated out
  * (σ̂² = n⁻¹ Σ v_t²/F_t). The companion structure makes every filter
  * step O(r²), so a full pass is O(n·r²) — single-task work on one
  * series, fanned out per candidate by the engine.
  *
  * Used as a REFINEMENT stage: CSS (fast, in PACF space) scores the
  * exhaustive grid, the top [[RescoreTop]] candidates are re-optimized
  * under the exact likelihood warm-started from the CSS solution, and
  * the final model is the exact-AICc argmin. This bounds the added cost
  * to a constant number of exact fits per series while capturing the
  * near-boundary order flips exact ML exists to catch.
  */
object KalmanMl {

  /** How many CSS-ranked candidates get an exact-ML refit. */
  val RescoreTop = 5

  /** Gaussian elimination with partial pivoting (shared small-system
    * solver; dimension ≤ (p+mP 'r')² ≈ 121 here). Mutates its inputs. */
  def solveInPlace(a: Array[Array[Double]], b: Array[Double]): Array[Double] = {
    val n = b.length
    var col = 0
    while (col < n) {
      var piv = col
      var r = col + 1
      while (r < n) { if (math.abs(a(r)(col)) > math.abs(a(piv)(col))) piv = r; r += 1 }
      if (math.abs(a(piv)(col)) < 1e-300) return null
      val tmp = a(col); a(col) = a(piv); a(piv) = tmp
      val tb = b(col); b(col) = b(piv); b(piv) = tb
      r = col + 1
      while (r < n) {
        val f = a(r)(col) / a(col)(col)
        if (f != 0.0) {
          var c = col
          while (c < n) { a(r)(c) -= f * a(col)(c); c += 1 }
          b(r) -= f * b(col)
        }
        r += 1
      }
      col += 1
    }
    val x = new Array[Double](n)
    var row = n - 1
    while (row >= 0) {
      var s = b(row)
      var c = row + 1
      while (c < n) { s -= a(row)(c) * x(c); c += 1 }
      x(row) = s / a(row)(row)
      row -= 1
    }
    x
  }

  /** Stationary state covariance: vec(P) from (I − T⊗T) vec(P) = vec(RR')
    * for the companion T built from `phi` (σ² = 1 units). Returns null
    * when the AR polynomial is (numerically) non-stationary. */
  def stationaryP0(phi: Array[Double], rvec: Array[Double]): Array[Array[Double]] = {
    val r = phi.length
    val n2 = r * r
    // T(i)(j): phi(i) at j = 0, plus shifted identity (i, i+1)
    def tAt(i: Int, j: Int): Double =
      (if (j == 0) phi(i) else 0.0) + (if (j == i + 1) 1.0 else 0.0)
    val a = Array.fill(n2)(new Array[Double](n2))
    val b = new Array[Double](n2)
    var i = 0
    while (i < r) {
      var j = 0
      while (j < r) {
        val row = i * r + j
        b(row) = rvec(i) * rvec(j)
        var k = 0
        while (k < r) {
          var l = 0
          while (l < r) {
            val col = k * r + l
            a(row)(col) = (if (row == col) 1.0 else 0.0) - tAt(i, k) * tAt(j, l)
            l += 1
          }
          k += 1
        }
        j += 1
      }
      i += 1
    }
    val v = solveInPlace(a, b)
    if (v == null) return null
    val out = Array.fill(r)(new Array[Double](r))
    i = 0
    while (i < r) {
      var j = 0
      while (j < r) { out(i)(j) = v(i * r + j); j += 1 }
      i += 1
    }
    // a stationary covariance has positive diagonal; reject blow-ups
    i = 0
    while (i < r) {
      if (!java.lang.Double.isFinite(out(i)(i)) || out(i)(i) <= 0 || out(i)(i) > 1e8) return null
      i += 1
    }
    out
  }

  /** Exact −2·log-likelihood (σ² concentrated; full constants included
    * so values are AICc-comparable with the CSS scoring formula) for the
    * ARMA defined by the expanded lag polynomials `arFull` (1, −φ₁, …)
    * and `maFull` (1, θ₁, …) on the mean-`mu` series z. Returns
    * (negTwoLogLik, sigma2Hat), or null on numeric failure. */
  def exactNegLogLik(z: Array[Double], mu: Double,
      arFull: Array[Double], maFull: Array[Double]): (Double, Double) = {
    val n = z.length
    if (n == 0) return null
    val p = arFull.length - 1
    val q = maFull.length - 1
    val r = math.max(math.max(p, q + 1), 1)
    val phi = Array.tabulate(r)(i => if (i < p) -arFull(i + 1) else 0.0)
    val rvec = Array.tabulate(r)(j => if (j == 0) 1.0 else if (j <= q) maFull(j) else 0.0)
    var bigP = stationaryP0(phi, rvec)
    if (bigP == null) return null
    val a = new Array[Double](r)
    val ta = new Array[Double](r)
    val tp = Array.fill(r)(new Array[Double](r))
    val tpt = Array.fill(r)(new Array[Double](r))
    val kvec = new Array[Double](r)
    var sumLogF = 0.0
    var ssq = 0.0
    var t = 0
    while (t < n) {
      val v = z(t) - mu - a(0)
      val f = bigP(0)(0)
      if (!java.lang.Double.isFinite(f) || f <= 1e-300) return null
      sumLogF += math.log(f)
      ssq += v * v / f
      // companion-structured updates: everything O(r²)
      // TP(i)(j) = phi(i)·P(0)(j) + P(i+1)(j)
      var i = 0
      while (i < r) {
        var j = 0
        while (j < r) {
          tp(i)(j) = phi(i) * bigP(0)(j) + (if (i + 1 < r) bigP(i + 1)(j) else 0.0)
          j += 1
        }
        i += 1
      }
      // K = T P e₁ / F
      i = 0
      while (i < r) { kvec(i) = tp(i)(0) / f; i += 1 }
      // a ← T a + K v
      i = 0
      while (i < r) { ta(i) = phi(i) * a(0) + (if (i + 1 < r) a(i + 1) else 0.0); i += 1 }
      i = 0
      while (i < r) { a(i) = ta(i) + kvec(i) * v; i += 1 }
      // P ← T P T' − K K' F + R R'
      i = 0
      while (i < r) {
        var j = 0
        while (j < r) {
          tpt(i)(j) = phi(j) * tp(i)(0) + (if (j + 1 < r) tp(i)(j + 1) else 0.0)
          j += 1
        }
        i += 1
      }
      i = 0
      while (i < r) {
        var j = 0
        while (j < r) {
          bigP(i)(j) = tpt(i)(j) - kvec(i) * kvec(j) * f + rvec(i) * rvec(j)
          j += 1
        }
        i += 1
      }
      t += 1
    }
    val sigma2 = ssq / n
    if (!java.lang.Double.isFinite(sigma2) || sigma2 <= 0) return null
    val negTwoLl = n * math.log(2 * math.Pi) + n * math.log(sigma2) + sumLogF + n
    (negTwoLl, sigma2)
  }

  /** Durand–Kerner simultaneous root iteration for the lag polynomial
    * c(0) + c(1)x + … + c(deg)x^deg (degree ≤ p+mP ≈ 10 here). Returns
    * the minimum root modulus — `auto.arima` rejects fits whose AR or MA
    * roots come within 1% of the unit circle ("close to non-stationary /
    * non-invertible"), and the exact/CSS scoring mirrors that check. */
  def minRootModulus(c: Array[Double]): Double = {
    var deg = c.length - 1
    while (deg > 0 && math.abs(c(deg)) < 1e-12) deg -= 1
    if (deg <= 0) return Double.PositiveInfinity
    // roots of Σ c_i x^i, normalized to monic
    val a = Array.tabulate(deg + 1)(i => c(i) / c(deg))
    val re = new Array[Double](deg)
    val im = new Array[Double](deg)
    var i = 0
    while (i < deg) {
      // standard distinct starting points on a spiral
      re(i) = 0.4 * math.cos(0.9 * i + 0.5)
      im(i) = 0.4 * math.sin(0.9 * i + 0.5) + 0.9
      i += 1
    }
    var it = 0
    var maxDelta = 1.0
    while (it < 200 && maxDelta > 1e-10) {
      maxDelta = 0.0
      i = 0
      while (i < deg) {
        // p(z_i) via Horner (monic poly with coefficients a)
        var pr = 1.0; var pi = 0.0
        var k = deg - 1
        while (k >= 0) {
          val nr = pr * re(i) - pi * im(i) + a(k)
          val ni = pr * im(i) + pi * re(i)
          pr = nr; pi = ni
          k -= 1
        }
        // denominator Π_{j≠i} (z_i − z_j)
        var dr = 1.0; var di = 0.0
        var j = 0
        while (j < deg) {
          if (j != i) {
            val xr = re(i) - re(j); val xi = im(i) - im(j)
            val nr = dr * xr - di * xi
            val ni = dr * xi + di * xr
            dr = nr; di = ni
          }
          j += 1
        }
        val dd = dr * dr + di * di
        if (dd > 1e-300) {
          val qr = (pr * dr + pi * di) / dd
          val qi = (pi * dr - pr * di) / dd
          re(i) -= qr; im(i) -= qi
          val delta = math.sqrt(qr * qr + qi * qi)
          if (delta > maxDelta) maxDelta = delta
        }
        i += 1
      }
      it += 1
    }
    var minMod = Double.PositiveInfinity
    i = 0
    while (i < deg) {
      val m = math.sqrt(re(i) * re(i) + im(i) * im(i))
      if (m < minMod) minMod = m
      i += 1
    }
    minMod
  }

  /** Inverse Durbin–Levinson: stationary AR coefficients → partial
    * autocorrelations (the inverse of `Arima.pacfToCoef`), for warm-
    * starting the exact fit at the CSS optimum. */
  def coefToPacf(phiIn: Array[Double]): Array[Double] = {
    val p = phiIn.length
    val r = new Array[Double](p)
    var cur = phiIn.clone()
    var k = p - 1
    while (k >= 0) {
      r(k) = cur(k)
      if (k > 0) {
        val prev = new Array[Double](k)
        val den = 1.0 - r(k) * r(k)
        if (math.abs(den) < 1e-12) {
          // boundary pacf: flatten the remaining lags to zero
          var i = 0
          while (i < k) { prev(i) = 0.0; i += 1 }
        } else {
          var i = 0
          while (i < k) { prev(i) = (cur(i) + r(k) * cur(k - 1 - i)) / den; i += 1 }
        }
        cur = prev
      }
      k -= 1
    }
    r
  }
}
