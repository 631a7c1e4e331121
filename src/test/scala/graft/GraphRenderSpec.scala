package graft

import java.nio.file.Files

import graft.operators.GraphRender

/** Raster PNG export (SURVEY.md §2 S5): the three reference views render
  * to valid, deterministic PNG files with the right colors present. */
class GraphRenderSpec extends SparkSuite {

  private def fixture = {
    import spark.implicits._
    val hubs = Seq(("h", 0.9), ("hb", 0.8), ("z", 0.001)).toDF("id", "score")
    val auths = Seq(("a", 0.7), ("hb", 0.6)).toDF("id", "score")
    val edges = Seq(("h", "a", 1.0), ("z", "q", 1.0))
      .toDF("src", "dst", "weight")
    (edges, hubs, auths)
  }

  test("writePngGraphs emits the reference's three valid PNG views") {
    val (edges, hubs, auths) = fixture
    val dir = Files.createTempDirectory("graft-png").toFile
    GraphRender.writePngGraphs(edges, hubs, auths, dir.toString, "test",
      k = 2, nodeFraction = 1.0, edgeFraction = 1.0, sizePx = 300)
    Seq("hub", "authorities", "HubAndAuthorities").foreach { suffix =>
      val f = new java.io.File(dir, s"graph_test_$suffix.png")
      assert(f.isFile, s"$f missing")
      val img = javax.imageio.ImageIO.read(f)
      assert(img != null, s"$f is not a decodable image")
      assert(img.getWidth == 300 && img.getHeight == 300)
    }
  }

  test("the both-view raster contains all four reference colors") {
    val (edges, hubs, auths) = fixture
    val dir = Files.createTempDirectory("graft-png").toFile
    GraphRender.writePngGraphs(edges, hubs, auths, dir.toString, "c",
      k = 2, nodeFraction = 1.0, edgeFraction = 1.0, sizePx = 300)
    val img = javax.imageio.ImageIO.read(
      new java.io.File(dir, "graph_c_HubAndAuthorities.png"))
    val pixels = for {
      x <- 0 until img.getWidth; y <- 0 until img.getHeight
    } yield img.getRGB(x, y) & 0xffffff
    val seen = pixels.toSet
    // exact palette fills survive antialiased edges: the node interiors
    // are solid
    assert(seen.contains(0xd62a2a), "no red (top hub) pixel") // h
    assert(seen.contains(0x2a5cd6), "no blue (top auth) pixel") // a
    assert(seen.contains(0x8e2ad6), "no purple (both) pixel") // hb
    assert(seen.contains(0xb0b0b0), "no grey (unranked) pixel") // z, q
    assert(pixels.count(_ == 0xffffff) > pixels.size / 2,
      "background not white")
  }

  test("renders are byte-identical across runs (pure function of input)") {
    val (edges, hubs, auths) = fixture
    val d1 = Files.createTempDirectory("graft-png").toFile
    val d2 = Files.createTempDirectory("graft-png").toFile
    Seq(d1, d2).foreach(d => GraphRender.writePngGraphs(edges, hubs, auths,
      d.toString, "d", k = 2, nodeFraction = 1.0, edgeFraction = 1.0,
      sizePx = 300))
    Seq("hub", "authorities", "HubAndAuthorities").foreach { s =>
      val b1 = Files.readAllBytes(
        new java.io.File(d1, s"graph_d_$s.png").toPath)
      val b2 = Files.readAllBytes(
        new java.io.File(d2, s"graph_d_$s.png").toPath)
      assert(java.util.Arrays.equals(b1, b2), s"$s render not deterministic")
    }
  }

  test("node cap fails loudly instead of collecting an oversized view") {
    val (edges, hubs, auths) = fixture
    val dir = Files.createTempDirectory("graft-png").toFile
    val e = intercept[IllegalArgumentException] {
      GraphRender.writePngGraphs(edges, hubs, auths, dir.toString, "e",
        k = 2, nodeFraction = 1.0, edgeFraction = 1.0, maxNodes = 2)
    }
    assert(e.getMessage.contains("exceeds 2 nodes"))
  }

  test("spiral fallback lays out large graphs deterministically") {
    val ids = Array.tabulate(2000)(i => f"n$i%04d")
    val widths = Array.tabulate(2000)(i => 2000.0 - i)
    val pos = GraphRender.layout(ids, Array((0, 1), (1, 2)), 81L, widths)
    assert(pos.length == 2000)
    assert(pos.forall { case (x, y) =>
      x >= 0.0 && x <= 1.0 && y >= 0.0 && y <= 1.0 })
    // widest node sits nearest the center
    val d0 = math.hypot(pos(0)._1 - 0.5, pos(0)._2 - 0.5)
    assert(pos.drop(1).forall { case (x, y) =>
      math.hypot(x - 0.5, y - 0.5) >= d0 - 1e-12 })
  }
}
