package graft.multimodal

/** ViT-style patch extraction over a decoded gray raster (the plumbing
  * half of patch embedding: Dosovitskiy et al. 2021 split an image into
  * fixed p×p patches before any learned projection). Only FULL patches
  * count (⌊h/p⌋ × ⌊w/p⌋ grid — the ViT convention is resize-to-multiple;
  * here edge remainders are dropped instead, deterministically). One
  * imperative pass per raster, O(1) state beyond the output scalars —
  * the same per-blob kernel shape as [[Audio]]/m9. */
object Patches {

  /** Per-raster patch census: (n_pr, n_pc, total, max_patch,
    * argmax_patch, n_zero) where patches index row-major
    * (idx = pr·n_pc + pc), max ties break to the SMALLEST index (strict
    * `>` in the scan), and a raster with no full patch returns
    * (·, ·, 0, 0, -1, 0). `px` is row-major w×h (the
    * [[ImageCodec.decodeGrayPng]] layout). */
  def patchStats(px: Array[Int], w: Int, h: Int, p: Int): (Int, Int, Long, Long, Int, Long) = {
    require(p >= 1, s"patch size must be >= 1 (got $p)")
    require(px.length >= w * h, s"pixel buffer ${px.length} smaller than $w x $h")
    val nPr = h / p; val nPc = w / p
    var total = 0L; var maxSum = -1L; var argmax = -1; var nZero = 0L
    var pr = 0
    while (pr < nPr) {
      var pc = 0
      while (pc < nPc) {
        var s = 0L
        var i = 0
        while (i < p) {
          val base = (pr * p + i) * w + pc * p
          var j = 0
          while (j < p) { s += px(base + j); j += 1 }
          i += 1
        }
        if (s > maxSum) { maxSum = s; argmax = pr * nPc + pc }
        if (s == 0L) nZero += 1
        total += s
        pc += 1
      }
      pr += 1
    }
    (nPr, nPc, total, if (maxSum < 0) 0L else maxSum, argmax, nZero)
  }
}
