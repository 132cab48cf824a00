package graft.ops

import org.apache.spark.sql.Dataset
import graft.scan.Tile

/** Block-aggregate spatial downsampling — xarray's `.coarsen(y=b, x=b)
  * .mean()/.sum()` verb, the CHUNK-ALIGNED answer to the >2× downsample
  * regime (the per-pixel warp kernels' own scale notes point here: a
  * 100× downsample makes a warp footprint huge, but a block aggregate is
  * one pass).
  *
  * The alignment contract IS the scale design: `b` must divide the chunk
  * size, so every b×b block lives inside exactly one chunk and the
  * reduction never crosses a task boundary — no halo, no pixel join. One
  * key-shuffle co-locates a chunk's sparse fragments (the same
  * fragment-splice contract as [[Focal]]; on an already-dense composite
  * layer this is the op's only data movement) and the output is b²×
  * smaller. Misaligned factors are refused loudly — re-chunk the scan or
  * use the warp `Resampling.Average` footprint kernel, which exists for
  * exactly that case.
  *
  * NaN semantics: a block reduces over its VALID pixels only (the
  * NaN-aware composite convention); a block with zero valid pixels is
  * NaN under Sum/Mean and 0 under Count. Edge blocks clipped by the
  * raster boundary reduce over the clipped extent.
  */
object Coarsen {

  sealed trait Stat
  case object Sum extends Stat
  case object Count extends Stat
  case object Mean extends Stat

  def coarsen(tiles: Dataset[Tile], chunkY: Int, chunkX: Int,
              gridH: Int, gridW: Int, b: Int, stat: Stat = Mean): Dataset[Tile] = {
    require(b >= 2, s"Coarsen: block factor b=$b (use the identity for 1)")
    require(chunkY % b == 0 && chunkX % b == 0,
      s"Coarsen: block $b must divide the chunk (${chunkY}x$chunkX) so every " +
      "block lives inside one chunk and the reduction stays task-local; " +
      "re-chunk the scan, or use Resampling.Average (the warp footprint " +
      "kernel) for grid-misaligned factors")
    val spark = tiles.sparkSession
    import spark.implicits._
    val statCode = stat match { case Sum => 0; case Count => 1; case Mean => 2 }

    tiles.groupByKey(t => (t.band, t.yChunk, t.xChunk)).mapGroups {
      (key: (String, Int, Int), it: Iterator[Tile]) =>
        val (band, yc, xc) = key
        val inH = math.min(chunkY, gridH - yc * chunkY)
        val inW = math.min(chunkX, gridW - xc * chunkX)
        val buf = Array.fill(inH * inW)(Double.NaN)
        // fragment splice, ascending layer: higher itemIdx wins per cell
        it.toArray.sortBy(t => (t.itemIdx, t.rowOff, t.colOff)).foreach { t =>
          var r = 0
          while (r < t.height) {
            var c = 0
            while (c < t.width) {
              val v = t.pixels(r * t.width + c)
              if (!v.isNaN && t.rowOff + r < inH && t.colOff + c < inW)
                buf((t.rowOff + r) * inW + (t.colOff + c)) = v
              c += 1
            }
            r += 1
          }
        }
        val outH = (inH + b - 1) / b
        val outW = (inW + b - 1) / b
        val out = new Array[Double](outH * outW)
        var br = 0
        while (br < outH) {
          var bc = 0
          while (bc < outW) {
            var s = 0.0
            var n = 0
            var r = br * b
            val rEnd = math.min(r + b, inH)
            while (r < rEnd) {
              var c = bc * b
              val cEnd = math.min(c + b, inW)
              while (c < cEnd) {
                val v = buf(r * inW + c)
                if (!v.isNaN) { s += v; n += 1 }
                c += 1
              }
              r += 1
            }
            out(br * outW + bc) = statCode match {
              case 0 => if (n == 0) Double.NaN else s
              case 1 => n.toDouble
              case _ => if (n == 0) Double.NaN else s / n
            }
            bc += 1
          }
          br += 1
        }
        Tile(-1, 0, band, 0L, yc, xc, 0, 0, outH, outW, out)
    }
  }
}
