package graft.multimodal

/** Audio-shaped per-blob kernels (the m8/m10 family): one imperative
  * pass, O(1) state per blob — the scan shape a real PCM decoder feeds.
  * Kept as plain functions so the Spark side stays a `mapPartitions`
  * over binary columns and the kernels are unit-testable off-cluster. */
object Audio {

  /** Voice-activity segmentation by energy threshold: frames of
    * `frameLen` bytes (samples centered at 64, the m8 convention), a
    * frame is ACTIVE when its integer energy Σ(s²) exceeds `thr`, and
    * consecutive active frames merge into segments (gaps-and-islands).
    * Returns (n_frames, n_active, n_segs, max_run). */
  def vadStats(b: Array[Byte], frameLen: Int, thr: Long): (Int, Long, Long, Long) = {
    val frames = b.length / frameLen
    var nAct = 0L; var nSeg = 0L; var maxRun = 0L; var run = 0L
    var f = 0
    while (f < frames) {
      var e = 0L
      var i = f * frameLen; val end = i + frameLen
      while (i < end) { val v = (b(i) & 0xff) - 64; e += v.toLong * v; i += 1 }
      if (e > thr) {
        nAct += 1; run += 1
        if (run == 1L) nSeg += 1
        if (run > maxRun) maxRun = run
      } else run = 0
      f += 1
    }
    (frames, nAct, nSeg, maxRun)
  }
}
