package graft.viz

/** Colormap application (F14) — the reference hands any matplotlib cmap to
  * the renderer (`show.py:940-948`); here a cmap is a 256-entry ARGB LUT,
  * built from anchor colors (linear interpolation), a user-supplied LUT,
  * or one of the registered standards. Anchor colors below are the widely
  * published matplotlib control points for each map.
  */
final case class Colormap(lut: Array[Int]) {
  require(lut.length == 256, s"LUT must have 256 entries, got ${lut.length}")

  /** ARGB for a normalized value in [0,1]; NaN -> 0 (transparent). */
  def apply(v: Double): Int =
    if (v.isNaN) 0
    else lut(math.max(0, math.min(255, (v * 255).round.toInt)))

  def reversed: Colormap = Colormap(lut.reverse)
}

object Colormap {

  /** Build a LUT by linearly interpolating (position, (r,g,b)) anchors —
    * the construction the repo's original viridis used, generalized. */
  def fromAnchors(anchors: Seq[(Double, (Int, Int, Int))]): Colormap = {
    val sorted = anchors.sortBy(_._1)
    val lut = (0 until 256).map { i =>
      val x = i / 255.0
      val ((x0, c0), (x1, c1)) = sorted.zip(sorted.tail)
        .find { case ((a, _), (b, _)) => x >= a && x <= b }
        .getOrElse((sorted(sorted.size - 2), sorted.last))
      val f = if (x1 == x0) 0.0 else (x - x0) / (x1 - x0)
      def mix(a: Int, b: Int) = (a + (b - a) * f).round.toInt
      (255 << 24) | (mix(c0._1, c1._1) << 16) | (mix(c0._2, c1._2) << 8) | mix(c0._3, c1._3)
    }.toArray
    Colormap(lut)
  }

  val viridis: Colormap = fromAnchors(Seq(
    (0.0, (68, 1, 84)), (0.25, (59, 82, 139)), (0.5, (33, 145, 140)),
    (0.75, (94, 201, 98)), (1.0, (253, 231, 37))))

  val magma: Colormap = fromAnchors(Seq(
    (0.0, (0, 0, 4)), (0.25, (81, 18, 124)), (0.5, (183, 55, 121)),
    (0.75, (252, 137, 97)), (1.0, (252, 253, 191))))

  val inferno: Colormap = fromAnchors(Seq(
    (0.0, (0, 0, 4)), (0.25, (87, 16, 110)), (0.5, (188, 55, 84)),
    (0.75, (249, 142, 9)), (1.0, (252, 255, 164))))

  val plasma: Colormap = fromAnchors(Seq(
    (0.0, (13, 8, 135)), (0.25, (126, 3, 168)), (0.5, (204, 71, 120)),
    (0.75, (248, 149, 64)), (1.0, (240, 249, 33))))

  val gray: Colormap = fromAnchors(Seq((0.0, (0, 0, 0)), (1.0, (255, 255, 255))))

  /** Diverging blue-white-red (matplotlib coolwarm control colors). */
  val coolwarm: Colormap = fromAnchors(Seq(
    (0.0, (59, 76, 192)), (0.5, (221, 221, 221)), (1.0, (180, 4, 38))))

  private val registry: Map[String, Colormap] = Map(
    "viridis" -> viridis, "magma" -> magma, "inferno" -> inferno,
    "plasma" -> plasma, "gray" -> gray, "greys_r" -> gray, "coolwarm" -> coolwarm)

  /** Look up by matplotlib-style name; `<name>_r` reverses. */
  def named(name: String): Colormap = {
    val k = name.toLowerCase
    registry.get(k)
      .orElse(if (k.endsWith("_r")) registry.get(k.dropRight(2)).map(_.reversed) else None)
      .getOrElse(throw new IllegalArgumentException(
        s"unknown colormap '$name'; have ${registry.keys.toSeq.sorted.mkString(", ")}"))
  }
}
