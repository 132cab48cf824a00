package graft.scan

import graft.core.RasterSpec

/** Chunk-spec grammar — the reference accepts ints, "auto", byte strings,
  * tuples, and dicts for `chunksize` and normalizes them against the 4-D
  * (time, band, y, x) shape (`stackstac/to_dask.py:208-231`, via dask's
  * `normalize_chunks` with a previous-chunks hint of 1 along time/band).
  * Same surface here, as a small ADT + string parser:
  *
  *  - `1024`        -> (1, 1, 1024, 1024)
  *  - `(cy, cx)`    -> (1, 1, cy, cx) — spatial-only tuple
  *  - `-1`          -> whole dimension (one spatial chunk)
  *  - `"auto"`      -> square spatial edge from the byte budget
  *                     (default 128 MiB, like dask's array.chunk-size)
  *  - `"64 MiB"`    -> "auto" with that budget
  *  - full 4-tuples -> per-dimension control (time/band batching)
  *
  * Auto edges snap DOWN to a power of two (dask prefers "nice" shapes),
  * never below 1, never above the dimension.
  */
sealed trait ChunkDim
object ChunkDim {
  final case class Fixed(n: Int) extends ChunkDim { require(n > 0, s"chunk $n must be > 0") }
  case object Full extends ChunkDim // -1: the whole dimension in one chunk
  case object Auto extends ChunkDim // size to the byte budget
}

sealed trait ChunksParam
object ChunksParam {
  final case class Square(edge: Int) extends ChunksParam
  final case class Spatial(y: ChunkDim, x: ChunkDim) extends ChunksParam
  final case class Full4(time: ChunkDim, band: ChunkDim, y: ChunkDim, x: ChunkDim)
      extends ChunksParam
  final case class Bytes(budget: Long) extends ChunksParam

  private val BytesRe = """(?i)\s*(\d+(?:\.\d+)?)\s*([kmgt]i?b)\s*""".r

  /** Parse the string/int forms: "auto", "-1", "2048", "128 MiB", "1GiB". */
  def parse(s: String): ChunksParam = s.trim.toLowerCase match {
    case "auto" => Spatial(ChunkDim.Auto, ChunkDim.Auto)
    case "-1"   => Spatial(ChunkDim.Full, ChunkDim.Full)
    case BytesRe(num, unit) =>
      val mult = unit.toLowerCase match {
        case "kb" => 1000L;        case "kib" => 1L << 10
        case "mb" => 1000000L;     case "mib" => 1L << 20
        case "gb" => 1000000000L;  case "gib" => 1L << 30
        case "tb" => 1000000000000L; case _ => 1L << 40
      }
      Bytes((num.toDouble * mult).toLong)
    case n => Square(n.toInt)
  }
}

object Chunks {

  /** dask's default `array.chunk-size`. */
  val DefaultBudget: Long = 128L << 20

  /** Largest power of two <= n (min 1). */
  private def pow2Floor(n: Long): Int =
    if (n <= 1) 1 else Integer.highestOneBit(math.min(n, Int.MaxValue.toLong).toInt)

  /** Resolve one dimension spec to an edge length. `autoEdge` is the
    * byte-budget-derived edge for Auto dims. */
  private def edgeOf(d: ChunkDim, dim: Int, autoEdge: Int): Int = d match {
    case ChunkDim.Fixed(n) => math.min(n, dim)
    case ChunkDim.Full     => dim
    case ChunkDim.Auto     => math.max(1, math.min(autoEdge, dim))
  }

  /** Run-length expansion of an edge over a dimension (dask chunk tuple):
    * `runs(10, 4) == Vector(4, 4, 2)`. */
  def runs(dim: Int, edge: Int): Vector[Int] = {
    require(edge > 0 && dim >= 0)
    Vector.tabulate((dim + edge - 1) / edge)(i => math.min(edge, dim - i * edge))
  }

  /** Normalize a chunk spec against the 4-D (time, band, y, x) shape into
    * per-dimension chunk tuples, the reference's return shape
    * (`to_dask.py:208-231`). Time/band default to 1 (the reference's
    * previous-chunks hint: widen spatially before bundling items). */
  def normalize(p: ChunksParam, shape: (Int, Int, Int, Int),
                cellBytes: Int = 8, budget: Long = DefaultBudget)
      : (Vector[Int], Vector[Int], Vector[Int], Vector[Int]) = {
    val (nt, nb, ny, nx) = shape
    val (td, bd, yd, xd) = p match {
      case ChunksParam.Square(e)        => (ChunkDim.Fixed(1), ChunkDim.Fixed(1),
                                            ChunkDim.Fixed(e), ChunkDim.Fixed(e))
      case ChunksParam.Spatial(y, x)    => (ChunkDim.Fixed(1), ChunkDim.Fixed(1), y, x)
      case ChunksParam.Full4(t, b, y, x) => (t, b, y, x)
      case ChunksParam.Bytes(_)         => (ChunkDim.Fixed(1), ChunkDim.Fixed(1),
                                            ChunkDim.Auto, ChunkDim.Auto)
    }
    val bud = p match { case ChunksParam.Bytes(b) => b; case _ => budget }
    // Auto: spread the cell budget over the auto spatial dims; a fixed
    // companion dim divides the budget first.
    val cells = math.max(1L, bud / cellBytes)
    val autoY = (yd, xd) match {
      case (ChunkDim.Auto, ChunkDim.Auto) => pow2Floor(math.sqrt(cells.toDouble).toLong)
      case (ChunkDim.Auto, other)         => pow2Floor(cells / edgeOf(other, nx, 1))
      case _                              => 1
    }
    val autoX = (yd, xd) match {
      case (ChunkDim.Auto, ChunkDim.Auto) => autoY
      case (other, ChunkDim.Auto)         => pow2Floor(cells / edgeOf(other, ny, 1))
      case _                              => 1
    }
    (runs(nt, edgeOf(td, nt, 1)), runs(nb, edgeOf(bd, nb, 1)),
     runs(ny, edgeOf(yd, ny, autoY)), runs(nx, edgeOf(xd, nx, autoX)))
  }

  /** Resolved (chunkY, chunkX) edges for a raster spec — the adapter into
    * [[TileScan.scan]]. */
  def spatialEdges(p: ChunksParam, spec: RasterSpec,
                   cellBytes: Int = 8, budget: Long = DefaultBudget): (Int, Int) = {
    val (h, w) = spec.shape
    val (_, _, ys, xs) = normalize(p, (1, 1, h, w), cellBytes, budget)
    (ys.head, xs.head)
  }
}
