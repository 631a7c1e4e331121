package graft

import graft.pipelines.{ImageIoCodec, Images, Multimodal}
import org.apache.spark.sql.functions._

/** Real-codec path: javax.imageio PNG encode/decode, 2-D resize, and
  * the codec's integration with the existing MediaCodec operators. */
class ImagesSpec extends SparkSuite {

  private def bytes(n: Int, seed: Int): Array[Byte] = {
    val rnd = new scala.util.Random(seed)
    Array.fill(n)(rnd.nextInt(256).toByte)
  }

  test("gray-8 PNG round trip is lossless with zero-padded geometry") {
    val b = bytes(37, 1) // 37 bytes -> 16 x 3 image, 11 padded zeros
    val png = Images.encodeGrayPng(b)
    // a real PNG: magic bytes
    assert((png(0) & 0xff) == 0x89 && png(1) == 'P'.toByte)
    val Some((w, h, px)) = Images.decodeGray(png)
    assert(w == 16 && h == 3 && px.length == 48)
    assert(px.take(37).toSeq == b.toSeq)
    assert(px.drop(37).forall(_ == 0))
  }

  test("empty payload encodes to a 16x1 black image") {
    val Some((w, h, px)) = Images.decodeGray(Images.encodeGrayPng(Array.empty))
    assert(w == 16 && h == 1 && px.forall(_ == 0))
  }

  test("undecodable bytes: decodeGray None, codec empty, resize passthrough") {
    val junk = "definitely not an image".getBytes("UTF-8")
    assert(Images.decodeGray(junk).isEmpty)
    assert(ImageIoCodec.decode(junk).isEmpty)
    assert(Images.resizePng(junk, 2).toSeq == junk.toSeq)
    // RECOGNIZED but truncated payloads (valid magic, cut-off body) hit
    // the decoder proper — whatever it throws, the corrupt-tail posture
    // is None/empty, never a crashed task
    val truncPng = Images.encodeGrayPng(bytes(64, 3)).take(30)
    assert(Images.decodeGray(truncPng).isEmpty)
    assert(Images.resizePng(truncPng, 2).toSeq == truncPng.toSeq)
    val truncGif = Images.encodeAnimatedGif(bytes(600, 4)).take(40)
    assert(Images.decodeFrames(truncGif).isEmpty ||
      Images.decodeFrames(truncGif).forall(_._3.nonEmpty))
  }

  test("resizePng: nearest-neighbor 2-D downsample, exact samples") {
    // 16x4 gradient: pixel (x, y) = y*16 + x
    val src = Array.tabulate(64)(i => i.toByte)
    val resized = Images.resizePng(Images.encodeGrayPng(src), 2)
    val Some((w, h, px)) = Images.decodeGray(resized)
    assert(w == 8 && h == 2)
    // sample (x, y) of the result = source (2x, 2y)
    for (y <- 0 until 2; x <- 0 until 8)
      assert(px(y * 8 + x) == src(2 * y * 16 + 2 * x),
        s"mismatch at ($x,$y)")
  }

  test("RGB PNG decodes through the gray conversion path") {
    val img = new java.awt.image.BufferedImage(5, 4,
      java.awt.image.BufferedImage.TYPE_INT_RGB)
    for (y <- 0 until 4; x <- 0 until 5) img.setRGB(x, y, 0xffffff)
    val bos = new java.io.ByteArrayOutputStream()
    javax.imageio.ImageIO.write(img, "png", bos)
    val Some((w, h, px)) = Images.decodeGray(bos.toByteArray)
    assert(w == 5 && h == 4)
    assert(px.forall(b => (b & 0xff) == 255)) // white stays white
  }

  test("ImageIoCodec drives extractFeatures over real PNG payloads") {
    import spark.implicits._
    val rows = Seq(1L, 2L).map { id =>
      (id, "image/png", Images.encodeGrayPng(bytes(20, id.toInt)))
    }
    val payloads = rows.toDF("doc_id", "mime", "payload")
    val got = Multimodal.extractFeatures(spark, payloads, ImageIoCodec)
      .collect().map(f => f.doc_id -> f).toMap
    // decoded length = full 16 x 2 pixel raster, not the payload size
    assert(got(1L).n_bytes == 32 && got(2L).n_bytes == 32)
    // byte_mean over decoded pixels (20 random bytes + 12 zeros)
    rows.foreach { case (id, _, png) =>
      val px = Images.decodeGray(png).get._3
      val want = px.map(_ & 0xff).sum.toDouble / px.length
      assert(math.abs(got(id).byte_mean - want) < 1e-9)
    }
  }

  test("ImageIoCodec.resize halves both dimensions through the codec " +
      "trait (real 2-D resampler, not a byte stride)") {
    // 16x4 gradient through the TRAIT entry point (what resizeAll
    // drives): dimensions halve and samples come from the (2x, 2y)
    // pick grid — a 1-D byte stride would keep a 16-wide geometry.
    val src = Array.tabulate(64)(i => i.toByte)
    val out = ImageIoCodec.resize(Images.encodeGrayPng(src), 2)
    val Some((w, h, px)) = Images.decodeGray(out)
    assert(w == 8 && h == 2, s"expected halved dimensions, got ${w}x$h")
    for (y <- 0 until 2; x <- 0 until 8)
      assert(px(y * 8 + x) == src(2 * y * 16 + 2 * x))
    // and through the distributed resizeAll pass
    import spark.implicits._
    val payloads = Seq((1L, "image/png", Images.encodeGrayPng(src)))
      .toDF("doc_id", "mime", "payload")
    val rz = Multimodal.resizeAll(spark, payloads, 2, ImageIoCodec)
      .collect().head
    assert(Images.decodeGray(rz.payload).exists {
      case (ww, hh, _) => ww == 8 && hh == 2 })
  }

  test("animated GIF: multi-frame encode/decode is lossless; frame " +
      "sampling keeps every stride-th frame") {
    val b = bytes(16 * 16 * 3 + 10, 7) // 3 full frames + a padded 4th
    val gif = Images.encodeAnimatedGif(b)
    assert(gif.take(3).map(_.toChar).mkString == "GIF")
    val frames = Images.decodeFrames(gif)
    assert(frames.length == 4)
    assert(frames.forall { case (w, h, px) =>
      w == 16 && h == 16 && px.length == 256 })
    // lossless: concatenated frame pixels = zero-padded payload
    val all = frames.flatMap(_._3).toArray
    assert(all.take(b.length).toSeq == b.toSeq)
    assert(all.drop(b.length).forall(_ == 0))
    // single-frame GIF of undecodable-junk size still decodes; junk in
    // is Seq.empty out
    assert(Images.decodeFrames("not a gif".getBytes("UTF-8")).isEmpty)
    // sampling: stride 2 over 4 frames keeps frames 0 and 2
    import spark.implicits._
    val docs = Seq((1L, new String(Array.fill(16 * 16 * 3 + 10)('a'))))
      .toDF("doc_id", "text")
    val got = Images.frameSample(spark, docs, stride = 2).collect()
    assert(got.map(_.getLong(1)).toSeq == Seq(0L, 2L))
    assert(got.forall(r => r.getInt(2) == 16 && r.getInt(3) == 16))
    // frame 0 is all 'a' (97): mean 97; frame 2 likewise
    assert(got.forall(r => r.getDouble(4) == 97.0))
  }

  test("imageRoundTrip matches a direct byte computation") {
    import spark.implicits._
    val docs = Seq((1L, "hello world"), (2L, ""), (3L, "x" * 40))
      .toDF("doc_id", "text")
    val got = Images.imageRoundTrip(spark, docs).collect()
      .map(r => (r.getLong(0), (r.getInt(1), r.getInt(2), r.getLong(3),
        r.getDouble(4)))).toMap
    assert(got(1L) == ((16, 1, 16L,
      BigDecimal("hello world".getBytes("UTF-8").map(_ & 0xff).sum / 16.0)
        .setScale(6, BigDecimal.RoundingMode.HALF_UP).toDouble)))
    assert(got(2L) == ((16, 1, 16L, 0.0)))
    assert(got(3L)._1 == 16 && got(3L)._2 == 3 && got(3L)._3 == 48L)
  }
}
