package graft.operators

import java.awt.{BasicStroke, Color, RenderingHints}
import java.awt.geom.{Ellipse2D, Line2D}
import java.awt.image.BufferedImage
import java.io.File
import javax.imageio.ImageIO
import org.apache.spark.sql.DataFrame

/** Raster PNG export of the three reference graph views (reference
  * `src/draw_graphs.py:77-89`: `graph_<name>_hub.png`,
  * `graph_<name>_authorities.png`, `graph_<name>_HubAndAuthorities.png`)
  * — pure-JDK (`BufferedImage` + `ImageIO`), no native or third-party
  * image dependency.
  *
  * Like the reference, rendering is a DRIVER-side step over a bounded
  * sample: the inputs are the same seeded node/edge samples plus top-k
  * sides that `draw_graphs.py` collects into networkx, so the collect
  * here is bounded by the caller's fractions, not the corpus (at 100 TB
  * one renders a sample — there are more nodes than pixels).
  *
  * Documented divergence: networkx `spring_layout` is randomized per
  * run; here the layout is a DETERMINISTIC sunflower (phyllotaxis)
  * spiral — nodes sorted by (rank-color, size, id) from the center out,
  * golden-angle spacing — so the same scores render byte-identical
  * PNGs on every engine and run. Colors, node sizing (∝ score × 10000,
  * default 500) and the three view semantics are the reference's.
  */
object GraphRender {

  private def colorOf(name: String): Color = name match {
    case "red" => new Color(0xd6, 0x2b, 0x2b)
    case "blue" => new Color(0x2b, 0x5f, 0xd6)
    case "purple" => new Color(0x8e, 0x2b, 0xd6)
    case _ => new Color(0xb0, 0xb0, 0xb0)
  }

  /** Deterministic sunflower layout: node i of n lands at radius
    * `maxR*sqrt((i+0.5)/n)`, angle `i * goldenAngle` — uniform density,
    * no RNG, big/ranked nodes first (center). */
  private def layout(n: Int, maxR: Double): IndexedSeq[(Double, Double)] = {
    val golden = math.Pi * (3.0 - math.sqrt(5.0))
    (0 until n).map { i =>
      val r = maxR * math.sqrt((i + 0.5) / n)
      val t = i * golden
      (r * math.cos(t), r * math.sin(t))
    }
  }

  /** Render one view to `file`. `nodes` = (id, color, width) as produced
    * by [[RankOutput.renderModel]]; `edges` = the sampled (src, dst). */
  def renderPng(nodes: Seq[(String, String, Double)],
      edges: Seq[(String, String)], file: File, size: Int = 1200): Unit = {
    // center-out order: ranked colors before grey, bigger first, id tiebreak
    val colorRank = Map("purple" -> 0, "red" -> 1, "blue" -> 2, "grey" -> 3)
    val ordered = nodes.sortBy { case (id, c, w) =>
      (colorRank.getOrElse(c, 4), -w, id)
    }
    val margin = size * 0.05
    val pos = layout(ordered.size, size / 2.0 - margin)
    val cx = size / 2.0
    val at = ordered.zipWithIndex.map { case ((id, c, w), i) =>
      id -> (cx + pos(i)._1, cx + pos(i)._2, c, w)
    }.toMap

    val img = new BufferedImage(size, size, BufferedImage.TYPE_INT_RGB)
    val g = img.createGraphics()
    try {
      g.setRenderingHint(RenderingHints.KEY_ANTIALIASING,
        RenderingHints.VALUE_ANTIALIAS_ON)
      g.setColor(Color.WHITE)
      g.fillRect(0, 0, size, size)
      // edges under nodes, thin translucent grey
      g.setColor(new Color(0x60, 0x60, 0x60, 0x50))
      g.setStroke(new BasicStroke(1.0f))
      edges.foreach { case (s, d) =>
        (at.get(s), at.get(d)) match {
          case (Some((x1, y1, _, _)), Some((x2, y2, _, _))) =>
            g.draw(new Line2D.Double(x1, y1, x2, y2))
          case _ => ()
        }
      }
      // radius ∝ sqrt(reference node_size), clamped to a readable band
      def radius(w: Double): Double =
        math.min(22.0, math.max(3.0, math.sqrt(math.max(w, 0.0)) * 0.45))
      ordered.foreach { case (id, c, w) =>
        val (x, y, _, _) = at(id)
        val r = radius(w)
        g.setColor(colorOf(c))
        g.fill(new Ellipse2D.Double(x - r, y - r, 2 * r, 2 * r))
      }
    } finally g.dispose()
    file.getParentFile match { case null => (); case p => p.mkdirs() }
    ImageIO.write(img, "png", file)
  }

  /** Three-PNG export mirroring the reference's three files per run
    * (`draw_graphs.py:23,45,73`), driven by the same render model as
    * the DOT export. */
  def writePngGraphs(edges: DataFrame, hubs: DataFrame, auths: DataFrame,
      dir: String, name: String, k: Int = 50, nodeFraction: Double = 0.01,
      edgeFraction: Double = 0.004, seed: Long = 81L,
      size: Int = 1200): Unit =
    Seq("hub" -> "hub", "auth" -> "authorities",
        "both" -> "HubAndAuthorities").foreach { case (mode, suffix) =>
      val (nodesDf, edgesDf) = RankOutput.renderModel(
        edges, hubs, auths, mode, k, nodeFraction, edgeFraction, seed)
      val nodes = nodesDf.collect()
        .map(r => (r.getString(0), r.getString(1), r.getDouble(2))).toSeq
      val sampled = edgesDf.collect()
        .map(r => (r.getString(0), r.getString(1))).toSeq
      renderPng(nodes, sampled,
        new File(s"$dir/graph_${name}_$suffix.png"), size)
    }
}
