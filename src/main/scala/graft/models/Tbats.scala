package graft.models

import graft.core.{Forecasts, Methods, Stats}

/** TBATS — Trigonometric seasonality, Box-Cox, ARMA errors, Trend,
  * Seasonal components (De Livera, Hyndman & Snyder 2011) — the sixth
  * component of `forecastHybrid`'s default model set, which the
  * reference's HYBRID method uses via `hybridModel(ts, ...)` with no
  * `models=` argument (TimeSeriesFunctions_GPL_0.5.1.R:324-332).
  *
  * Innovations state space on the (optionally Box-Cox-transformed)
  * series w:
  *
  *   w_t   = ℓ_{t-1} + φ·b_{t-1} + Σ_j s_j,{t-1} + d_t
  *   d_t   = Σ_i φ_i·d_{t-i} + Σ_j θ_j·ε_{t-j} + ε_t  (ARMA(p,q), p,q ≤ 2)
  *   ℓ_t   = ℓ_{t-1} + φ·b_{t-1} + α·ε_t
  *   b_t   = φ·b_{t-1} + β·ε_t
  *   s_j,t  =  s_j,{t-1}·cos λ_j + s*_j,{t-1}·sin λ_j + γ₁·ε_t
  *   s*_j,t = −s_j,{t-1}·sin λ_j + s*_j,{t-1}·cos λ_j + γ₂·ε_t
  *
  * with λ_j = 2πj/m for harmonics j = 1..k. Box-Cox ω is selected by
  * Guerrero's method (grid-minimized coefficient of variation across
  * period-length subseries); {useBoxCox, k, damped, (p,q)} are selected
  * sequentially by AICc, mirroring `tbats`' stepwise component search.
  * Smoothing/ARMA parameters and initial level/trend are optimized by
  * Nelder–Mead on the gaussian innovations likelihood; initial
  * trigonometric states come from a harmonic-regression warm start and
  * are held fixed (same documented simplification as the ETS seasonal
  * init — bit-matching CRAN is a non-goal, SURVEY.md §7).
  *
  * The model is LINEAR in the states given ω, so h-step forecast
  * variance is exact via the impulse response: var_h = σ²·Σ_{i≤h} c_i²
  * with c_i the response of ŵ_{t+i} to a unit innovation. Interval
  * bands are built in the transformed space and mapped through the
  * inverse Box-Cox (monotone), matching `forecast::tbats`'
  * `biasadj = FALSE` default.
  *
  * Runs on one series (≤10k points, R:28 cap) inside a single executor
  * task: plain arrays, no allocation in the filter loop.
  */
object Tbats {

  /** Discrete model structure (what AICc selects). */
  final case class Config(useBoxCox: Boolean, damped: Boolean, k: Int, p: Int, q: Int) {
    override def toString: String =
      s"${if (useBoxCox) 1 else 0},${if (damped) 1 else 0},$k,$p,$q"
  }
  object Config {
    def parse(s: String): Config = {
      val a = s.split(',')
      Config(a(0) == "1", a(1) == "1", a(2).toInt, a(3).toInt, a(4).toInt)
    }
  }

  // ---------------------------------------------------------------- //
  //  Box-Cox                                                          //
  // ---------------------------------------------------------------- //

  def boxCox(y: Array[Double], lambda: Double): Array[Double] =
    if (math.abs(lambda) < 1e-10) y.map(math.log)
    else y.map(v => (math.pow(v, lambda) - 1.0) / lambda)

  def invBoxCox(w: Double, lambda: Double): Double =
    if (math.abs(lambda) < 1e-10) math.exp(w)
    else math.pow(math.max(lambda * w + 1.0, 1e-10), 1.0 / lambda)

  /** Guerrero's λ: split the tail of the series into period-length
    * subseries, and pick the λ (grid over [0, 1], tbats' default box)
    * minimizing the coefficient of variation of sd_i / mean_i^(1-λ)
    * across subseries. Requires strictly positive data and ≥ 2 full
    * periods; returns 1.0 (identity) otherwise. */
  def guerreroLambda(y: Array[Double], m: Int): Double = {
    val period = math.max(2, m)
    val nsub = y.length / period
    if (nsub < 2 || y.exists(_ <= 0)) return 1.0
    val start = y.length - nsub * period
    val mus = new Array[Double](nsub)
    val sds = new Array[Double](nsub)
    var i = 0
    while (i < nsub) {
      val sub = java.util.Arrays.copyOfRange(y, start + i * period, start + (i + 1) * period)
      mus(i) = Stats.mean(sub)
      sds(i) = Stats.stddevSamp(sub)
      i += 1
    }
    var bestLambda = 1.0
    var bestCv = Double.PositiveInfinity
    var g = 0
    while (g <= 100) {
      val lam = g / 100.0
      val r = Array.tabulate(nsub)(j => sds(j) / math.pow(mus(j), 1.0 - lam))
      val mu = Stats.mean(r)
      val cv = if (math.abs(mu) > 1e-12) Stats.stddevSamp(r) / mu else Double.PositiveInfinity
      if (cv < bestCv) { bestCv = cv; bestLambda = lam }
      g += 1
    }
    bestLambda
  }

  // ---------------------------------------------------------------- //
  //  Warm start: harmonic regression  w ~ 1 + t + Σ cos/sin            //
  // ---------------------------------------------------------------- //

  /** Solve the small normal-equations system X'X β = X'y by Gaussian
    * elimination with partial pivoting (2 + 2k ≤ 8 unknowns). */
  private def solve(a: Array[Array[Double]], b: Array[Double]): Array[Double] = {
    val n = b.length
    var col = 0
    while (col < n) {
      var piv = col
      var r = col + 1
      while (r < n) { if (math.abs(a(r)(col)) > math.abs(a(piv)(col))) piv = r; r += 1 }
      if (math.abs(a(piv)(col)) < 1e-12) { a(piv)(col) = 1e-12 }
      val tmp = a(col); a(col) = a(piv); a(piv) = tmp
      val tb = b(col); b(col) = b(piv); b(piv) = tb
      r = col + 1
      while (r < n) {
        val f = a(r)(col) / a(col)(col)
        var c2 = col
        while (c2 < n) { a(r)(c2) -= f * a(col)(c2); c2 += 1 }
        b(r) -= f * b(col)
        r += 1
      }
      col += 1
    }
    val x = new Array[Double](n)
    var r2 = n - 1
    while (r2 >= 0) {
      var s = b(r2)
      var c2 = r2 + 1
      while (c2 < n) { s -= a(r2)(c2) * x(c2); c2 += 1 }
      x(r2) = s / a(r2)(r2)
      r2 -= 1
    }
    x
  }

  /** OLS of w_t on [1, t, cos(λ_j t), sin(λ_j t)] over the first
    * min(n, 10m) points → (ℓ0, b0, A_j, B_j). The trig states rotate by
    * λ_j per step, so s_j,init = A_j, s*_j,init = B_j reproduces the
    * regression phase at t = 0. */
  def harmonicInit(w: Array[Double], m: Int, k: Int): (Double, Double, Array[Double], Array[Double]) = {
    val use = math.min(w.length, math.max(10, 10 * math.max(m, 1)))
    val nvar = 2 + 2 * k
    val xtx = Array.fill(nvar)(new Array[Double](nvar))
    val xty = new Array[Double](nvar)
    val row = new Array[Double](nvar)
    var t = 0
    while (t < use) {
      row(0) = 1.0
      row(1) = t.toDouble
      var j = 0
      while (j < k) {
        val lam = 2.0 * math.Pi * (j + 1) / m
        row(2 + 2 * j) = math.cos(lam * t)
        row(3 + 2 * j) = math.sin(lam * t)
        j += 1
      }
      var i = 0
      while (i < nvar) {
        xty(i) += row(i) * w(t)
        var j2 = 0
        while (j2 < nvar) { xtx(i)(j2) += row(i) * row(j2); j2 += 1 }
        i += 1
      }
      t += 1
    }
    val beta = solve(xtx, xty)
    (beta(0), beta(1),
      Array.tabulate(k)(j => beta(2 + 2 * j)),
      Array.tabulate(k)(j => beta(3 + 2 * j)))
  }

  // ---------------------------------------------------------------- //
  //  Innovations filter                                               //
  // ---------------------------------------------------------------- //

  /** End state of a filtered pass. Histories are most-recent-first:
    * dHist = (d_t, d_{t-1}, …), epsHist = (ε_t, ε_{t-1}, …). */
  final case class FilterOut(
      sse: Double, level: Double, trend: Double,
      s: Array[Double], ss: Array[Double], dHist: Array[Double], epsHist: Array[Double])

  /** Shift a most-recent-first history right by one and insert `v` at
    * the front (length ≤ 2, so the shift is a couple of moves). */
  private def push(h: Array[Double], v: Double): Unit = {
    var i = h.length - 1
    while (i > 0) { h(i) = h(i - 1); i -= 1 }
    if (h.length > 0) h(0) = v
  }

  private def armaDot(c: Array[Double], h: Array[Double]): Double = {
    var s = 0.0
    var i = 0
    while (i < c.length) { s += c(i) * h(i); i += 1 }
    s
  }

  def filter(
      w: Array[Double], m: Int, cfg: Config,
      alpha: Double, beta: Double, phiD: Double, g1: Double, g2: Double,
      arPhi: Array[Double], maTheta: Array[Double],
      l0: Double, b0: Double, s0: Array[Double], ss0: Array[Double]): FilterOut = {
    val n = w.length
    val k = cfg.k
    val cosL = Array.tabulate(k)(j => math.cos(2.0 * math.Pi * (j + 1) / m))
    val sinL = Array.tabulate(k)(j => math.sin(2.0 * math.Pi * (j + 1) / m))
    var l = l0
    var b = b0
    val s = s0.clone()
    val ss = ss0.clone()
    val dHist = new Array[Double](arPhi.length)
    val epsHist = new Array[Double](maTheta.length)
    var sse = 0.0
    var t = 0
    while (t < n) {
      var seas = 0.0
      var j = 0
      while (j < k) { seas += s(j); j += 1 }
      val dhat = armaDot(arPhi, dHist) + armaDot(maTheta, epsHist)
      val what = l + phiD * b + seas + dhat
      val eps = w(t) - what
      if (!java.lang.Double.isFinite(eps))
        return FilterOut(Double.PositiveInfinity, l, b, s, ss, dHist, epsHist)
      sse += eps * eps
      // state updates
      val lNew = l + phiD * b + alpha * eps
      val bNew = phiD * b + beta * eps
      j = 0
      while (j < k) {
        val sj = s(j); val ssj = ss(j)
        s(j) = sj * cosL(j) + ssj * sinL(j) + g1 * eps
        ss(j) = -sj * sinL(j) + ssj * cosL(j) + g2 * eps
        j += 1
      }
      l = lNew; b = bNew
      push(dHist, dhat + eps)
      push(epsHist, eps)
      t += 1
    }
    FilterOut(sse, l, b, s, ss, dHist, epsHist)
  }

  // ---------------------------------------------------------------- //
  //  Fit                                                              //
  // ---------------------------------------------------------------- //

  final case class Fitted(
      cfg: Config, m: Int, lambda: Double,
      alpha: Double, beta: Double, phiD: Double, g1: Double, g2: Double,
      arPhi: Array[Double], maTheta: Array[Double],
      level: Double, trend: Double, s: Array[Double], ss: Array[Double],
      dHist: Array[Double], epsHist: Array[Double],
      sigma2: Double, aicc: Double)

  /** AR stationarity with a 0.95 margin for orders ≤ 2: |φ₁| box at
    * order 1; the stationarity triangle (φ₁+φ₂ < 1, φ₂−φ₁ < 1,
    * |φ₂| < 1) at order 2. MA invertibility is the mirrored region
    * (θ ↔ −φ in the characteristic polynomial). */
  private def arRegionOk(c: Array[Double]): Boolean = c.length match {
    case 0 => true
    case 1 => math.abs(c(0)) <= 0.95
    case _ => c(0) + c(1) <= 0.95 && c(1) - c(0) <= 0.95 && math.abs(c(1)) <= 0.95
  }
  private def maRegionOk(c: Array[Double]): Boolean = arRegionOk(c.map(-_))

  /** Free-parameter count for AICc: α, β, γ₁, γ₂ (if k>0), φ (damped),
    * φ₁/θ₁ (ARMA), λ (Box-Cox), ℓ0, b0, 2k trig states, σ². */
  def nParams(cfg: Config): Int =
    2 + (if (cfg.k > 0) 2 + 2 * cfg.k else 0) + (if (cfg.damped) 1 else 0) +
      cfg.p + cfg.q + (if (cfg.useBoxCox) 1 else 0) + 2 + 1

  /** Optimize the continuous parameters of one Config (λ held fixed —
    * the tbats shape: λ from Guerrero, re-scored per structure).
    * `maxIter` trims the NM budget for CV-fold refits, which need a
    * comparable error scale rather than a converged deployable fit
    * (same posture as the hybrid's reduced NN fold refits). */
  def fitConfig(y: Array[Double], m: Int, cfg: Config, lambda: Double,
      maxIter: Int = 500): Option[Fitted] = {
    val n = y.length
    if (n < 8) return None
    if (cfg.k > 0 && (m <= 1 || n < 2 * m + 2)) return None
    if (cfg.useBoxCox && y.exists(_ <= 0)) return None
    val w = if (cfg.useBoxCox) boxCox(y, lambda) else y
    val (l0w, b0w, s0, ss0) =
      if (cfg.k > 0) harmonicInit(w, m, cfg.k)
      else { val (a, b) = Optim.olsLine(java.util.Arrays.copyOfRange(w, 0, math.min(n, 70))); (a, b, Array.empty[Double], Array.empty[Double]) }
    val wScale = math.max(1e-8, Stats.stddevSamp(w))

    // free vector: alpha, beta, [g1, g2], [phiD], arPhi×p, maTheta×q, l0, b0
    final case class Params(a: Double, b: Double, gg1: Double, gg2: Double,
      ph: Double, ar: Array[Double], ma: Array[Double], l: Double, bb: Double)
    def unpack(x: Array[Double]): Params = {
      var i = 0
      val a = x(i); i += 1
      val b = x(i); i += 1
      val (gg1, gg2) = if (cfg.k > 0) { val v1 = x(i); val v2 = x(i + 1); i += 2; (v1, v2) } else (0.0, 0.0)
      val ph = if (cfg.damped) { val v = x(i); i += 1; v } else 1.0
      val ar = Array.tabulate(cfg.p) { j => x(i + j) }; i += cfg.p
      val ma = Array.tabulate(cfg.q) { j => x(i + j) }; i += cfg.q
      val l = x(i); i += 1
      val bb = x(i)
      Params(a, b, gg1, gg2, ph, ar, ma, l, bb)
    }
    def objective(x: Array[Double]): Double = {
      val p = unpack(x)
      if (p.a <= 1e-4 || p.a >= 0.9999) return 1e12
      if (p.b <= 1e-6 || p.b >= p.a) return 1e12
      if (cfg.k > 0 && (math.abs(p.gg1) > 0.5 || math.abs(p.gg2) > 0.5)) return 1e12
      if (cfg.damped && (p.ph < 0.8 || p.ph > 0.98)) return 1e12
      if (!arRegionOk(p.ar) || !maRegionOk(p.ma)) return 1e12
      val st = filter(w, m, cfg, p.a, p.b, p.ph, p.gg1, p.gg2, p.ar, p.ma, p.l, p.bb, s0, ss0)
      if (!java.lang.Double.isFinite(st.sse) || st.sse <= 0) 1e12
      else n * math.log(st.sse)
    }
    val x0 = {
      val buf = scala.collection.mutable.ArrayBuffer[Double](0.1, 0.01)
      if (cfg.k > 0) { buf += 0.001; buf += 0.001 }
      if (cfg.damped) buf += 0.95
      // higher-order ARMA terms start nearer zero: the first lag
      // carries most of the signal, and a small second-lag start keeps
      // the simplex inside the stationarity margin
      (0 until cfg.p).foreach(j => buf += (if (j == 0) 0.1 else 0.02))
      (0 until cfg.q).foreach(j => buf += (if (j == 0) 0.1 else 0.02))
      buf += l0w; buf += b0w
      buf.toArray
    }
    val nFree = x0.length
    val step = x0.zipWithIndex.map { case (v, i) =>
      if (i >= nFree - 2) math.max(math.abs(v) * 0.1, wScale * 0.1) else 0.05
    }
    val (xb, fb) = Optim.nelderMead(objective, x0, step, maxIter = maxIter, tol = 1e-6)
    if (fb >= 1e12) return None
    val p = unpack(xb)
    val st = filter(w, m, cfg, p.a, p.b, p.ph, p.gg1, p.gg2, p.ar, p.ma, p.l, p.bb, s0, ss0)
    if (!java.lang.Double.isFinite(st.sse) || st.sse <= 0) return None
    val kp = nParams(cfg)
    val negLL = n * math.log(st.sse)
    val aicc =
      if (n - kp - 1 <= 0) Double.PositiveInfinity
      else negLL + 2.0 * kp + 2.0 * kp * (kp + 1.0) / (n - kp - 1.0)
    Some(Fitted(cfg, m, if (cfg.useBoxCox) lambda else 1.0,
      p.a, p.b, p.ph, p.gg1, p.gg2, p.ar, p.ma,
      st.level, st.trend, st.s, st.ss, st.dHist, st.epsHist,
      st.sse / n, aicc))
  }

  /** Highest ARMA order the stepwise error search will consider (R
    * `tbats` delegates to a full auto.arima on the residuals, which
    * searches to order ~5). The stepwise escalation only fits a +1
    * extension when the current order actually improved AICc, so the
    * cap is a safety bound, not a per-fit cost: order-3 fits happen
    * only on series whose order-2 error model already won. A
    * deliberately-constructed ARMA(3,1)-error series escalating past
    * (2,2) is fixture-tested in ModelFamiliesSpec. */
  val MaxArmaOrder = 3

  /** Sequential AICc structure search (the `tbats` shape):
    *  1. harmonic count k (and useBoxCox if data is positive) on the
    *     plain damped=false, ARMA(0,0) skeleton;
    *  2. damped-trend choice on the winner;
    *  3. stepwise ARMA(p,q) escalation on the damped winner: seed with
    *     (1,0)/(0,1)/(1,1), then repeatedly try the +1-lag extensions
    *     of the current best until AICc stops improving or the
    *     [[MaxArmaOrder]] cap — so an ARMA(2,1) error structure is
    *     reachable without fitting the full grid every time. */
  def fitAuto(y: Array[Double], m: Int): Option[Fitted] = {
    val lambda = guerreroLambda(y, m)
    val seasonalOk = m > 1 && y.length >= 2 * m + 2
    val kMax = if (seasonalOk) math.min(3, (m - 1) / 2) else 0
    val boxCoxChoices = if (y.forall(_ > 0)) Seq(false, true) else Seq(false)
    val base = for {
      bc <- boxCoxChoices
      k <- 0 to kMax
      f <- fitConfig(y, m, Config(bc, damped = false, k, 0, 0), lambda)
    } yield f
    if (base.isEmpty) return None
    val b0 = base.minBy(_.aicc)
    val bd = (b0 +: fitConfig(y, m, b0.cfg.copy(damped = true), lambda).toSeq).minBy(_.aicc)
    val seeds = Seq((1, 0), (0, 1), (1, 1))
      .flatMap { case (p, q) => fitConfig(y, m, bd.cfg.copy(p = p, q = q), lambda) }
    var best = (bd +: seeds).minBy(_.aicc)
    // only escalate when an ARMA seed actually won — the +1 extensions
    // of (0,0) are the seeds themselves
    var improved = best.cfg.p + best.cfg.q > 0
    while (improved && (best.cfg.p < MaxArmaOrder || best.cfg.q < MaxArmaOrder)) {
      val ext = Seq(
        best.cfg.copy(p = best.cfg.p + 1), best.cfg.copy(q = best.cfg.q + 1))
        .filter(c => c.p <= MaxArmaOrder && c.q <= MaxArmaOrder)
        .flatMap(c => fitConfig(y, m, c, lambda))
      improved = ext.nonEmpty && ext.minBy(_.aicc).aicc < best.aicc
      if (improved) best = ext.minBy(_.aicc)
    }
    Some(best)
  }

  // ---------------------------------------------------------------- //
  //  Forecast                                                         //
  // ---------------------------------------------------------------- //

  /** Impulse response of the measurement to a unit innovation at step 1:
    * c_1 = 1; c_i (i ≥ 2) = ŵ response of the zero state after the
    * unit-ε update, propagated noise-free. Exact because the model is
    * linear in the states. */
  def impulseResponse(f: Fitted, h: Int): Array[Double] = {
    val k = f.cfg.k
    val m = f.m
    val cosL = Array.tabulate(k)(j => math.cos(2.0 * math.Pi * (j + 1) / m))
    val sinL = Array.tabulate(k)(j => math.sin(2.0 * math.Pi * (j + 1) / m))
    val c = new Array[Double](h)
    c(0) = 1.0
    // state after the unit innovation
    var l = f.alpha
    var b = f.beta
    val s = Array.fill(k)(f.g1)
    val ss = Array.fill(k)(f.g2)
    val dHist = new Array[Double](f.arPhi.length)
    val epsHist = new Array[Double](f.maTheta.length)
    push(dHist, 1.0)  // d_t picked up the innovation
    push(epsHist, 1.0)
    var i = 1
    while (i < h) {
      var seas = 0.0
      var j = 0
      while (j < k) { seas += s(j); j += 1 }
      val dhat = armaDot(f.arPhi, dHist) + armaDot(f.maTheta, epsHist)
      c(i) = l + f.phiD * b + seas + dhat
      // noise-free propagation
      val lNew = l + f.phiD * b
      val bNew = f.phiD * b
      j = 0
      while (j < k) {
        val sj = s(j); val ssj = ss(j)
        s(j) = sj * cosL(j) + ssj * sinL(j)
        ss(j) = -sj * sinL(j) + ssj * cosL(j)
        j += 1
      }
      l = lNew; b = bNew
      push(dHist, dhat)
      push(epsHist, 0.0)
      i += 1
    }
    c
  }

  def forecast(f: Fitted, h: Int): Forecasts = {
    val k = f.cfg.k
    val m = f.m
    val cosL = Array.tabulate(k)(j => math.cos(2.0 * math.Pi * (j + 1) / m))
    val sinL = Array.tabulate(k)(j => math.sin(2.0 * math.Pi * (j + 1) / m))
    val meanW = new Array[Double](h)
    var l = f.level
    var b = f.trend
    val s = f.s.clone()
    val ss = f.ss.clone()
    val dHist = f.dHist.clone()
    val epsHist = f.epsHist.clone()
    var i = 0
    while (i < h) {
      var seas = 0.0
      var j = 0
      while (j < k) { seas += s(j); j += 1 }
      val dhat = armaDot(f.arPhi, dHist) + armaDot(f.maTheta, epsHist)
      meanW(i) = l + f.phiD * b + seas + dhat
      val lNew = l + f.phiD * b
      val bNew = f.phiD * b
      j = 0
      while (j < k) {
        val sj = s(j); val ssj = ss(j)
        s(j) = sj * cosL(j) + ssj * sinL(j)
        ss(j) = -sj * sinL(j) + ssj * cosL(j)
        j += 1
      }
      l = lNew; b = bNew
      push(dHist, dhat)
      push(epsHist, 0.0)
      i += 1
    }
    val c = impulseResponse(f, h)
    val seW = new Array[Double](h)
    var cum = 0.0
    i = 0
    while (i < h) { cum += c(i) * c(i); seW(i) = math.sqrt(f.sigma2 * cum); i += 1 }
    if (!f.cfg.useBoxCox) Forecasts.gaussian(meanW, seW)
    else {
      // bands in transformed space, mapped through the monotone inverse
      val lam = f.lambda
      def band(z: Double): Array[Double] =
        Array.tabulate(h)(j => invBoxCox(meanW(j) + z * seW(j), lam))
      Forecasts(band(-Stats.Z80), band(-Stats.Z95),
        Array.tabulate(h)(j => invBoxCox(meanW(j), lam)),
        band(Stats.Z80), band(Stats.Z95))
    }
  }

  // ---------------------------------------------------------------- //
  //  ModelFamily wiring                                               //
  // ---------------------------------------------------------------- //

  final case class TbatsModel(fitted: Fitted) extends SeriesModel {
    def method: String = Methods.TBATS
    def forecast(h: Int): Forecasts = Tbats.forecast(fitted, h)
    def params: ModelParams = ModelParams(
      Map(
        "coef" -> Array(fitted.lambda, fitted.alpha, fitted.beta, fitted.phiD,
          fitted.g1, fitted.g2, fitted.level, fitted.trend,
          fitted.sigma2, fitted.aicc, fitted.m.toDouble),
        "s" -> (if (fitted.s.isEmpty) Array(0.0) else fitted.s),
        "ss" -> (if (fitted.ss.isEmpty) Array(0.0) else fitted.ss),
        // variable-order ARMA vectors (cfg carries the true lengths;
        // Array(0.0) placeholders keep the store schema non-empty)
        "arphi" -> (if (fitted.arPhi.isEmpty) Array(0.0) else fitted.arPhi),
        "matheta" -> (if (fitted.maTheta.isEmpty) Array(0.0) else fitted.maTheta),
        "dhist" -> (if (fitted.dHist.isEmpty) Array(0.0) else fitted.dHist),
        "epshist" -> (if (fitted.epsHist.isEmpty) Array(0.0) else fitted.epsHist)),
      Map("cfg" -> fitted.cfg.toString, "method" -> Methods.TBATS))
  }

  def fromParams(p: ModelParams): TbatsModel = {
    val c = p.d("coef")
    val cfg = Config.parse(p.s("cfg"))
    val s = if (cfg.k > 0) p.d("s") else Array.empty[Double]
    val ss = if (cfg.k > 0) p.d("ss") else Array.empty[Double]
    def vec(key: String, len: Int): Array[Double] =
      if (len > 0) p.d(key).take(len) else Array.empty[Double]
    TbatsModel(Fitted(cfg, c(10).toInt, c(0), c(1), c(2), c(3), c(4), c(5),
      vec("arphi", cfg.p), vec("matheta", cfg.q),
      c(6), c(7), s, ss, vec("dhist", cfg.p), vec("epshist", cfg.q),
      c(8), c(9)))
  }

  /** Degenerate-series fallback: level-only state space on the raw
    * scale (the same posture as `Ets.fallback`). */
  def fallback(y: Array[Double]): Fitted = {
    val lvl = if (y.nonEmpty) y.last else 0.0
    val sse = if (y.length > 1) Stats.diff(y).map(x => x * x).sum else 0.0
    Fitted(Config(useBoxCox = false, damped = false, 0, 0, 0), 1, 1.0,
      0.9999, 1e-4, 1.0, 0.0, 0.0, Array.empty, Array.empty, lvl, 0.0,
      Array.empty, Array.empty, Array.empty, Array.empty,
      if (y.length > 1) sse / y.length else 0.0, Double.PositiveInfinity)
  }

  object TbatsFamily extends ModelFamily {
    val method: String = Methods.TBATS
    def fit(y: Array[Double], frequency: Int): SeriesModel =
      TbatsModel(fitAuto(y, frequency).getOrElse(fallback(y)))
    def fromParams(p: ModelParams): SeriesModel = Tbats.fromParams(p)
  }
}
