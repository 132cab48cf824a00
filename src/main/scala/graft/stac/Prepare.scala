package graft.stac

import graft.core.{AffineTransform, Bounds, Proj, RasterSpec}
import graft.scan.AssetRow

/** Planner options — the `stack(...)` knobs that shape the grid
  * (reference `stackstac/stack.py:26-267`). */
final case class PrepareOptions(
    assets: Option[Seq[String]] = None,        // explicit asset ids (P1)
    mimetypes: Option[Seq[String]] = None,     // mimetype patterns (P2)
    epsg: Option[Int] = None,
    resolution: Option[(Double, Double)] = None,
    bounds: Option[Bounds] = None,             // in output CRS
    boundsLatLon: Option[Bounds] = None,
    snapBounds: Boolean = true,
    sortbyDate: Boolean = true,
    sortDescending: Boolean = false)

final case class PrepareResult(assetTable: Seq[AssetRow], spec: RasterSpec,
                               assetIds: Seq[String], items: Seq[StacItem],
                               nativeGrids: Map[String, (AffineTransform, Int)] = Map.empty)

/** The metadata-only planning phase: the analog of `prepare_items`
  * (reference `stackstac/prepare.py:59-395`). Everything here is
  * driver-side arithmetic over item metadata — the same decision the
  * reference makes (its planner is single-threaded NumPy over ≤1e5
  * items); pixel IO cost dwarfs this by many orders of magnitude, and the
  * output (the asset table) is broadcast-sized even for 100 TB of pixels
  * (1e7 assets × ~100 B ≈ 1 GB worst case; at that point the same steps
  * run as the equivalent DataFrame program — each step below is a
  * select/filter/agg).
  */
object Prepare {

  def apply(itemsIn: Seq[StacItem], opts: PrepareOptions = PrepareOptions()): PrepareResult = {
    require(itemsIn.nonEmpty, "empty item list")
    val items0 =
      if (opts.sortbyDate) Stac.sortByDate(itemsIn, opts.sortDescending) else itemsIn

    // -- Asset selection (P1/P2, reference prepare.py:83-122) -------------
    val assetIds0: Seq[String] = (opts.assets, opts.mimetypes) match {
      case (Some(ids), _) => ids
      case (None, Some(pats)) =>
        // ids whose every observed mimetype matches an allowed pattern
        val byId = items0.flatMap(_.assets.toSeq).groupMap(_._1)(_._2)
        byId.collect { case (id, as)
          if as.flatMap(_.mimetype).nonEmpty &&
             as.flatMap(_.mimetype).forall(mt => pats.exists(Stac.mimetypeMatches(_, mt)))
          => id }.toSeq.sorted
      case (None, None) =>
        // "item with most assets" heuristic (prepare.py:84-85)
        items0.maxBy(_.assets.size).assets.keys.toSeq.sorted
    }
    require(assetIds0.nonEmpty, "no assets selected")

    // -- Per-asset resolution of epsg/bounds/res (prepare.py:146-333) -----
    final case class Planned(itemIdx: Int, assetIdx: Int, band: String,
                             timeMicros: Long, url: String, outBounds: Option[Bounds],
                             res: Option[(Double, Double)], scale: Double, offset: Double,
                             epsg: Option[Int] = None,
                             native: Option[(AffineTransform, Int)] = None)

    // CRS unification (prepare.py:188-203): error on mixed without target.
    val assetEpsgs = for {
      item <- items0; (_, a) <- item.assets
      e <- a.epsg.orElse(item.epsg)
    } yield e
    val outEpsg: Int = opts.epsg.getOrElse {
      val distinct = assetEpsgs.distinct
      require(distinct.size == 1,
        s"Cannot pick a common CRS among ${distinct.sorted.mkString(",")}; pass epsg=")
      distinct.head
    }

    val requestedBounds: Option[Bounds] =
      opts.bounds.orElse(opts.boundsLatLon.map(Proj.reprojectBounds(_, 4326, outEpsg)))

    val planned: Seq[Planned] =
      for ((item, itemIdx) <- items0.zipWithIndex; (band, assetIdx) <- assetIds0.zipWithIndex) yield {
        val timeMicros = item.datetime.map(Stac.parseDatetimeMicros).getOrElse(Long.MinValue)
        item.assets.get(band) match {
          case None =>
            // Missing asset => null url => fill tile (P3, prepare.py:141-144)
            Planned(itemIdx, assetIdx, band, timeMicros, null, None, None, 1.0, 0.0)
          case Some(a) =>
            val aEpsg = a.epsg.orElse(item.epsg)
            val aTransform = a.transform.orElse(item.transform).filter(_.isRectilinear)
            val aShape = a.shape.orElse(item.shape)
            val aBbox = a.bbox.orElse(None)
            // 3-level bbox fallback chain (prepare.py:220-266): proj:bbox in
            // matching CRS, else transform+shape reprojected envelope, else
            // proj:bbox reprojected, else item lat/lon bbox.
            val outBounds: Option[Bounds] =
              (aEpsg, aBbox, aTransform, aShape) match {
                case (Some(e), Some(bb), _, _) if e == outEpsg => Some(bb)
                case (Some(e), _, Some(tf), Some((h, w))) =>
                  Some(Proj.boundsFromAffine(tf, h, w, e, outEpsg))
                case (Some(e), Some(bb), _, _) => Some(Proj.reprojectBounds(bb, e, outEpsg))
                case _ => item.bboxLatLon.map(Proj.reprojectBounds(_, 4326, outEpsg))
              }
            // Resolution inference (prepare.py:269-333): native res if CRS
            // matches; else reproject a 1-pixel box at the asset's center.
            val res: Option[(Double, Double)] = aTransform.flatMap { tf =>
              aEpsg.map { e =>
                if (e == outEpsg) (tf.xres, tf.yres)
                else {
                  val cb = aBbox.getOrElse(aShape.map { case (h, w) => tf.rasterBounds(h, w) }
                    .getOrElse(Bounds(tf.c, tf.f - tf.yres, tf.c + tf.xres, tf.f)))
                  val cx = (cb.minx + cb.maxx) / 2; val cy = (cb.miny + cb.maxy) / 2
                  val px = Proj.reprojectBounds(
                    Bounds(cx, cy, cx + tf.xres, cy + tf.yres), e, outEpsg)
                  (px.width, px.height)
                }
              }
            }
            Planned(itemIdx, assetIdx, band, timeMicros, a.href, outBounds, res, a.scale, a.offset,
                    epsg = aEpsg,
                    native = for { tf <- aTransform; e <- aEpsg } yield (tf, e))
        }
      }

    // -- Spatial overlap pruning vs requested bounds (P4, prepare.py:355-361)
    val pruned = requestedBounds match {
      case Some(rb) => planned.map { p =>
        if (p.url != null && p.outBounds.exists(_.overlaps(rb))) p
        else p.copy(url = null)
      }
      // without explicit bounds an asset with no determinable footprint
      // cannot participate in the union -> degrade to missing (fill)
      case None => planned.map(p =>
        if (p.url != null && p.outBounds.isEmpty) p.copy(url = null) else p)
    }

    // -- Bounds: requested or union of asset bounds (A4, prepare.py:338-354).
    // Assets whose footprint cannot be determined at all were degraded to
    // missing above (the reference raises for them, prepare.py:253-266) —
    // distinguish that failure from a genuine non-overlap.
    require(pruned.exists(_.url != null),
      if (planned.exists(p => p.url != null && p.outBounds.isEmpty))
        "cannot determine asset footprints (no proj:bbox/transform/shape or item bbox) — fix the metadata or drop those assets"
      else "no assets overlap the requested bounds")
    val liveBounds = pruned.filter(_.url != null).flatMap(_.outBounds)
    val unsnapped = requestedBounds.getOrElse(Bounds.union(liveBounds))

    // -- Resolution: requested or min-fold (prepare.py:325-333) -----------
    val (xres, yres) = opts.resolution.getOrElse {
      val rs = pruned.filter(_.url != null).flatMap(_.res)
      require(rs.nonEmpty, "cannot infer resolution; pass resolution=")
      (rs.map(_._1).min, rs.map(_._2).min)
    }

    // Snap only auto-computed bounds (prepare.py:376-377, stack.py:161-167).
    val outBounds =
      if (opts.snapBounds && opts.bounds.isEmpty) unsnapped.snapped(xres, yres)
      else unsnapped
    val spec = RasterSpec(outEpsg, outBounds, xres, yres)

    // -- Drop all-null items / asset ids (P5, prepare.py:384-393) ---------
    val liveItems  = pruned.filter(_.url != null).map(_.itemIdx).toSet
    val liveBands  = pruned.filter(_.url != null).map(_.band).toSet
    val itemRemap  = items0.indices.filter(liveItems).zipWithIndex.toMap
    val keptBands  = assetIds0.filter(liveBands)
    val bandRemap  = keptBands.zipWithIndex.toMap

    val table = pruned
      .filter(p => itemRemap.contains(p.itemIdx) && bandRemap.contains(p.band))
      .map { p =>
        val b = p.outBounds.getOrElse(Bounds(0, 0, 0, 0))
        AssetRow(itemRemap(p.itemIdx), bandRemap(p.band), p.band, p.timeMicros,
                 p.url, b.minx, b.miny, b.maxx, b.maxy, p.scale, p.offset,
                 epsg = p.epsg.getOrElse(0))
      }

    // Native georeferencing for mixed-CRS reads (WarpedVRT-lite,
    // `rio_reader.py:344-360`): url -> (native affine, native epsg).
    val nativeGrids = pruned.collect {
      case p if p.url != null && p.native.isDefined => p.url -> p.native.get
    }.toMap

    PrepareResult(table, spec, keptBands,
                  items0.zipWithIndex.collect { case (it, i) if itemRemap.contains(i) => it },
                  nativeGrids)
  }
}
