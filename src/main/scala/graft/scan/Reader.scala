package graft.scan

import graft.core.Window

/** The leaf scan operator: read a pixel window from one single-band raster
  * asset. Mirrors the reference `Reader` protocol
  * (`stackstac/reader_protocol.py:24-103`): constructed from asset
  * metadata, returns a row-major array for the requested window, must be
  * serializable (reference readers are pickled to dask workers,
  * `rio_reader.py:447-465`; ours are closed over by Spark tasks).
  *
  * Values use NaN as the in-tile nodata marker regardless of source
  * dtype; the engine fills/masks at the edges like
  * `rio_reader.py:382-429`.
  */
trait Reader extends Serializable {
  /** Read `window` (grid coordinates of the output [[graft.core.RasterSpec]]),
    * returning `window.width * window.height` doubles, row-major. */
  def read(window: Window): Array[Double]
  def close(): Unit = ()
}

/** Deterministic pseudo-random reader for tests and benchmarks — the analog
  * of the reference `FakeReader` (`reader_protocol.py:106-127`), but
  * deterministic per (url, pixel) so distributed results are reproducible.
  * Values are uniform in [0, 128) like the reference oracle fixture
  * (`tests/test_to_dask.py:96-117`).
  */
final case class FakeReader(url: String) extends Reader {
  private val seed = FakeReader.mix64(url.hashCode.toLong)
  def read(window: Window): Array[Double] = {
    val out = new Array[Double](window.width * window.height)
    var i = 0
    var r = window.rowOff
    while (r < window.rowEnd) {
      var c = window.colOff
      while (c < window.colEnd) {
        val h = FakeReader.mix64(seed ^ (r.toLong << 32) ^ (c.toLong & 0xffffffffL))
        out(i) = (h >>> 11).toDouble / (1L << 53).toDouble * 128.0
        i += 1; c += 1
      }
      r += 1
    }
    out
  }
}

object FakeReader {
  /** SplitMix64 finalizer (public domain; Steele et al. 2014). */
  def mix64(z0: Long): Long = {
    var z = z0 + 0x9e3779b97f4a7c15L
    z = (z ^ (z >>> 30)) * 0xbf58476d1ce4e5b9L
    z = (z ^ (z >>> 27)) * 0x94d4a885291e2cbdL
    z ^ (z >>> 31)
  }
}

/** Closed-form deterministic reader: value = globalRow * stride +
  * globalCol. Integer-valued doubles (exact below 2^53), so downstream
  * geometry (scan windows, mosaics, reprojection sampling) can be
  * recomputed bit-exactly by an external SQL oracle. */
final case class RampReader(stride: Int) extends Reader {
  def read(window: Window): Array[Double] = {
    val out = new Array[Double](window.width * window.height)
    var i = 0
    var r = window.rowOff
    while (r < window.rowEnd) {
      var c = window.colOff
      while (c < window.colEnd) {
        out(i) = (r.toLong * stride + c).toDouble
        i += 1; c += 1
      }
      r += 1
    }
    out
  }
}

/** Closed-form NONLINEAR reader: value = (r² + c²) mod `m`. Bicubic
  * interpolation reproduces any linear field exactly, so a linear ramp
  * cannot distinguish cubic from bilinear — this fixture can. Values are
  * small integers (< m), keeping every convolution term an exact dyadic
  * double recomputable bit-for-bit by a SQL oracle. */
final case class ModRampReader(m: Int) extends Reader {
  def read(window: Window): Array[Double] = {
    val out = new Array[Double](window.width * window.height)
    var i = 0
    var r = window.rowOff
    while (r < window.rowEnd) {
      var c = window.colOff
      while (c < window.colEnd) {
        out(i) = ((r.toLong * r + c.toLong * c) % m).toDouble
        i += 1; c += 1
      }
      r += 1
    }
    out
  }
}

/** Closed-form CATEGORICAL reader: value = (r/dr + c/dc) mod k (integer
  * division — axis-aligned plateaus of dr x dc pixels). The fixture for
  * majority-vote resampling: class ids, not intensities, so the right
  * answer is a vote and any interpolating kernel would fabricate classes
  * that exist nowhere in the source. */
final case class CategoricalReader(dr: Int, dc: Int, k: Int) extends Reader {
  def read(window: Window): Array[Double] = {
    val out = new Array[Double](window.width * window.height)
    var i = 0
    var r = window.rowOff
    while (r < window.rowEnd) {
      var c = window.colOff
      while (c < window.colEnd) {
        out(i) = ((r / dr + c / dc) % k).toDouble
        i += 1; c += 1
      }
      r += 1
    }
    out
  }
}

/** Constant-fill reader: the errors-as-nodata substitute
  * (`stackstac/nodata_reader.py:14-43`). */
final case class NodataReader(fill: Double = Double.NaN) extends Reader {
  def read(window: Window): Array[Double] =
    Array.fill(window.width * window.height)(fill)
}

/** Error-handling policy: which exceptions turn a read into nodata
  * (reference `exception_matches`, `nodata_reader.py:46-64`; defaults
  * `stack.py:48-50`). */
final case class ErrorsAsNodata(patterns: Seq[(Class[_ <: Throwable], String)])
    extends Serializable {
  def matches(e: Throwable): Boolean = patterns.exists { case (cls, regex) =>
    cls.isInstance(e) && (regex.isEmpty || regex.r.findFirstIn(Option(e.getMessage).getOrElse("")).isDefined)
  }
}
object ErrorsAsNodata {
  val none: ErrorsAsNodata = ErrorsAsNodata(Nil)
}
