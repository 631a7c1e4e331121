package graft.operators

import java.awt.image.BufferedImage
import java.awt.{BasicStroke, Color, RenderingHints}

import org.apache.spark.sql.DataFrame

/** Raster PNG graph render — the engine-side equivalent of the
  * reference's networkx/matplotlib PNGs (reference
  * `src/draw_graphs.py:4-89`): three views per run (hub / authorities /
  * HubAndAuthorities), nodes colored by rank membership and sized by
  * score, spring-laid-out, written as real PNG files.
  *
  * Rendering is a DRIVER-side step over the BOUNDED sampled view —
  * exactly like the reference, which `collect()`s the sampled graph into
  * networkx. The distributed part (top-k, seeded samples, the annotated
  * node model) is [[RankOutput.renderModel]]; only the final ≤`maxNodes`
  * rows ever reach the driver, and the cap fails loudly rather than
  * OOMing it. JDK-only (java.awt headless + javax.imageio) — no native
  * or third-party graphics dependency.
  */
object GraphRender {

  /** Hard bound on driver-side render size: a render is a picture of a
    * sample, never of the corpus — at 100 TB the samples still collapse
    * to thousands of rows before `collect`. */
  val DefaultMaxNodes = 20000

  private val palette = Map(
    "red" -> new Color(0xd6, 0x2a, 0x2a),
    "blue" -> new Color(0x2a, 0x5c, 0xd6),
    "purple" -> new Color(0x8e, 0x2a, 0xd6),
    "grey" -> new Color(0xb0, 0xb0, 0xb0))

  /** Deterministic node layout in the unit square. Seeded
    * Fruchterman–Reingold for graphs small enough for the O(n²·iters)
    * repulsion pass; beyond that a golden-angle spiral ordered by node
    * width (big nodes central) — O(n), still deterministic. Node order
    * is fixed (sorted id) before any randomness so layout is a pure
    * function of (graph, seed). */
  private[graft] def layout(ids: Array[String],
      edges: Array[(Int, Int)], seed: Long,
      widths: Array[Double]): Array[(Double, Double)] = {
    val n = ids.length
    if (n == 0) return Array.empty
    if (n <= 1500) {
      val rnd = new java.util.Random(seed)
      val xs = Array.fill(n)(rnd.nextDouble())
      val ys = Array.fill(n)(rnd.nextDouble())
      val k = math.sqrt(1.0 / n) // FR optimal pair distance
      val iters = 60
      for (it <- 0 until iters) {
        val t = 0.1 * (1.0 - it.toDouble / iters) // cooling
        val dx = new Array[Double](n)
        val dy = new Array[Double](n)
        var i = 0
        while (i < n) { // repulsion, O(n^2)
          var j = i + 1
          while (j < n) {
            val ddx = xs(i) - xs(j); val ddy = ys(i) - ys(j)
            val d2 = math.max(ddx * ddx + ddy * ddy, 1e-8)
            val f = k * k / d2
            dx(i) += ddx * f; dy(i) += ddy * f
            dx(j) -= ddx * f; dy(j) -= ddy * f
            j += 1
          }
          i += 1
        }
        edges.foreach { case (a, b) => // attraction along edges
          val ddx = xs(a) - xs(b); val ddy = ys(a) - ys(b)
          val d = math.sqrt(math.max(ddx * ddx + ddy * ddy, 1e-8))
          val f = d / k * 0.01
          dx(a) -= ddx * f; dy(a) -= ddy * f
          dx(b) += ddx * f; dy(b) += ddy * f
        }
        i = 0
        while (i < n) { // bounded displacement, clamp to unit square
          val d = math.sqrt(math.max(dx(i) * dx(i) + dy(i) * dy(i), 1e-12))
          val step = math.min(d, t) / d
          xs(i) = math.min(1.0, math.max(0.0, xs(i) + dx(i) * step))
          ys(i) = math.min(1.0, math.max(0.0, ys(i) + dy(i) * step))
          i += 1
        }
      }
      Array.tabulate(n)(i => (xs(i), ys(i)))
    } else {
      // Golden-angle spiral: node rank (by width desc, id asc) r maps to
      // radius sqrt(r/n)/2 and angle r·2π(1−1/φ) around the center.
      val order = (0 until n).sortBy(i => (-widths(i), ids(i)))
      val pos = new Array[(Double, Double)](n)
      val golden = math.Pi * (3.0 - math.sqrt(5.0))
      order.zipWithIndex.foreach { case (node, r) =>
        val rad = 0.5 * math.sqrt((r + 0.5) / n)
        pos(node) = (0.5 + rad * math.cos(r * golden),
          0.5 + rad * math.sin(r * golden))
      }
      pos
    }
  }

  /** Render one annotated view to a PNG file. `nodes` are
    * `(id, color, width)` rows from [[RankOutput.renderModel]];
    * `edges` are the sampled `(src, dst)` pairs. Pure function of its
    * inputs + seed: identical calls produce byte-identical PNGs. */
  def renderPng(nodes: Seq[(String, String, Double)],
      edges: Seq[(String, String)], file: java.io.File, sizePx: Int = 1200,
      seed: Long = 81L): Unit = {
    val sorted = nodes.sortBy(_._1).toArray
    val ids = sorted.map(_._1)
    val widths = sorted.map(_._3)
    val index = ids.zipWithIndex.toMap
    // Endpoints outside the node model (can't happen via renderModel,
    // whose universe includes all sampled endpoints) are dropped.
    val eIdx = edges.iterator.flatMap { case (s, d) =>
      for (a <- index.get(s); b <- index.get(d)) yield (a, b)
    }.toArray
    val pos = layout(ids, eIdx, seed, widths)

    val img = new BufferedImage(sizePx, sizePx, BufferedImage.TYPE_INT_RGB)
    val g = img.createGraphics()
    try {
      g.setRenderingHint(RenderingHints.KEY_ANTIALIASING,
        RenderingHints.VALUE_ANTIALIAS_ON)
      g.setColor(Color.WHITE)
      g.fillRect(0, 0, sizePx, sizePx)
      val margin = sizePx * 0.05
      val span = sizePx - 2 * margin
      def px(p: (Double, Double)) =
        (margin + p._1 * span, margin + p._2 * span)
      // Edges first (thin, translucent grey), nodes on top.
      g.setColor(new Color(120, 120, 120, 90))
      g.setStroke(new BasicStroke(1f))
      eIdx.foreach { case (a, b) =>
        val (x1, y1) = px(pos(a)); val (x2, y2) = px(pos(b))
        g.drawLine(x1.toInt, y1.toInt, x2.toInt, y2.toInt)
      }
      // Reference node_size is a matplotlib AREA (score·10⁴ or 500,
      // draw_graphs.py:16,38,65-67) — radius goes by sqrt, rescaled so
      // the largest node is ~2% of the image.
      val maxW = math.sqrt(math.max(widths.foldLeft(0.0)(math.max), 1e-9))
      val rScale = sizePx * 0.02 / maxW
      sorted.zipWithIndex.foreach { case ((_, color, w), i) =>
        val (x, y) = px(pos(i))
        val r = math.max(2.0, math.sqrt(math.max(w, 0.0)) * rScale)
        g.setColor(palette.getOrElse(color, palette("grey")))
        g.fillOval((x - r).toInt, (y - r).toInt, (2 * r).toInt, (2 * r).toInt)
        g.setColor(new Color(40, 40, 40))
        g.drawOval((x - r).toInt, (y - r).toInt, (2 * r).toInt, (2 * r).toInt)
      }
    } finally g.dispose()
    Option(file.getParentFile).foreach(_.mkdirs())
    javax.imageio.ImageIO.write(img, "png", file)
  }

  /** The reference's three PNGs per run (`graph_<name>_hub.png`,
    * `_authorities.png`, `_HubAndAuthorities.png` —
    * `draw_graphs.py:23,45,73`), from the same distributed render model
    * as [[RankOutput.writeDotGraphs]]. Collects only the sampled view;
    * refuses (loudly) above `maxNodes`. */
  def writePngGraphs(edges: DataFrame, hubs: DataFrame, auths: DataFrame,
      dir: String, name: String, k: Int = 50, nodeFraction: Double = 0.01,
      edgeFraction: Double = 0.004, seed: Long = 81L, sizePx: Int = 1200,
      maxNodes: Int = DefaultMaxNodes): Unit = {
    new java.io.File(dir).mkdirs()
    Seq("hub" -> "hub", "auth" -> "authorities",
        "both" -> "HubAndAuthorities").foreach { case (mode, suffix) =>
      val (nodeDf, edgeDf) = RankOutput.renderModel(edges, hubs, auths,
        mode, k, nodeFraction, edgeFraction, seed)
      val rows = nodeDf.limit(maxNodes + 1).collect()
      require(rows.length <= maxNodes,
        s"render view '$mode' exceeds $maxNodes nodes — lower the sample " +
          "fractions; a render is a picture of a sample, not the corpus")
      val ns = rows.map(r => (r.getString(0), r.getString(1), r.getDouble(2)))
      val maxEdges = maxNodes * 10
      val eRows = edgeDf.limit(maxEdges + 1).collect()
      require(eRows.length <= maxEdges,
        s"render view '$mode' exceeds $maxEdges sampled edges — lower " +
          "edgeFraction")
      val es = eRows.map(r => (r.getString(0), r.getString(1)))
      renderPng(ns.toSeq, es.toSeq,
        new java.io.File(dir, s"graph_${name}_$suffix.png"), sizePx, seed)
    }
  }
}
