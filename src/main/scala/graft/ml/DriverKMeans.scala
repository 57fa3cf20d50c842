package graft.ml

/** Seeded driver-side Lloyd iterations over a BOUNDED sample — the fit
  * half of d11's hierarchical cluster assignment (Dedup.semClusters).
  *
  * Why not the MLlib fit: SemDeDup's cell count scales with the corpus
  * (k = n / targetCluster — the dial that keeps within-cell candidate
  * volume near-linear), so a FLAT fit/assign is quadratic in n: the
  * sf100 decade measured d11 at 1187 s (exponent ~1.75 from sf10) with
  * ~800 G multiply-adds in the sample×k fit and another n×k×d in the
  * nearest-centroid scan. Splitting k into coarse×fine √k levels makes
  * fit and assignment cost 2√k·d per point; both levels fit here, on
  * the driver, over the ≤100k-row sample (single-digit Gflops,
  * parallelized over the common pool) — no MLlib job overhead per
  * fine cell.
  *
  * Determinism: callers pass the sample SORTED (by vec_id), init picks
  * a seeded shuffle of point indices, parallel assignment is per-point
  * independent, and the center recompute accumulates sequentially in
  * index order — layout-independent and reproducible. */
object DriverKMeans {

  /** Lloyd with `iters` iterations; returns min(k, points) centers.
    * Empty clusters keep their previous center (standard Lloyd). */
  def fit(points: Array[Array[Float]], k: Int, iters: Int,
      seed: Long): Array[Array[Double]] = {
    val n = points.length
    require(n > 0, "DriverKMeans.fit on an empty sample")
    val dim = points(0).length
    val kk = math.max(1, math.min(k, n))
    val idx = new scala.util.Random(seed)
      .shuffle((0 until n).toVector).take(kk).toArray
    var centers = idx.map(i => points(i).map(_.toDouble))
    val assign = new Array[Int](n)
    var it = 0
    while (it < iters) {
      val cs = centers
      java.util.stream.IntStream.range(0, n).parallel().forEach { p =>
        assign(p) = nearest(points(p), cs)
      }
      val sums = Array.ofDim[Double](kk, dim)
      val cnt = new Array[Int](kk)
      var p = 0
      while (p < n) {
        val c = assign(p)
        cnt(c) += 1
        val v = points(p)
        val s = sums(c)
        var i = 0
        while (i < dim) { s(i) += v(i); i += 1 }
        p += 1
      }
      centers = Array.tabulate(kk) { c =>
        if (cnt(c) > 0) sums(c).map(_ / cnt(c)) else centers(c)
      }
      it += 1
    }
    centers
  }

  /** Index of the squared-L2-nearest center (float−double arithmetic
    * identical to the assignment closure in Dedup.semClusters). */
  def nearest(v: Array[Float], centers: Array[Array[Double]]): Int = {
    var best = 0
    var bd = Double.MaxValue
    var ci = 0
    while (ci < centers.length) {
      val ctr = centers(ci)
      // a vector shorter than the centroid is a malformed embedding —
      // fail loudly (the old UDF threw IndexOutOfBounds) rather than
      // silently scoring a truncated distance
      if (v.length < ctr.length) throw new IllegalArgumentException(
        s"DriverKMeans.nearest: embedding dim ${v.length} < centroid " +
          s"dim ${ctr.length} — malformed input vector")
      var d = 0.0
      var i = 0
      while (i < ctr.length) {
        val df = v(i) - ctr(i); d += df * df; i += 1
      }
      if (d < bd) { bd = d; best = ci }
      ci += 1
    }
    best
  }
}
