package graft

import java.awt.image.BufferedImage
import java.io.ByteArrayOutputStream

import org.apache.spark.sql.functions.col

import graft.functions.ImageCodec

/** The real-image decode chain: the codec against JVM-encoded images
  * (ImageIO.write — an encoder the stdlib-Python corpus generator
  * shares no code with), then the whole committed corpus against the
  * pixel-formula sidecar — two independent routes to the same pixels.
  */
class ImageCodecSpec extends SparkTestBase {

  private def pngOf(w: Int, h: Int, px: (Int, Int) => (Int, Int, Int)): Array[Byte] = {
    val img = new BufferedImage(w, h, BufferedImage.TYPE_INT_RGB)
    for (y <- 0 until h; x <- 0 until w) {
      val (r, g, b) = px(x, y)
      img.setRGB(x, y, (r << 16) | (g << 8) | b)
    }
    val bos = new ByteArrayOutputStream()
    javax.imageio.ImageIO.write(img, "png", bos)
    bos.toByteArray
  }

  test("round-trip: JVM-encoded PNG decodes to exact integer stats") {
    val w = 20; val h = 12
    val bytes = pngOf(w, h, (x, y) => ((x * 9 + y) % 256, (y * 7) % 256, (x + y * 3) % 256))
    val d = ImageCodec.decode(bytes).get
    assert(d.width == w && d.height == h)
    var sr = 0L; var sg = 0L; var sb = 0L
    for (y <- 0 until h; x <- 0 until w) {
      sr += (x * 9 + y) % 256; sg += (y * 7) % 256; sb += (x + y * 3) % 256
    }
    assert((d.sumR, d.sumG, d.sumB) == ((sr, sg, sb)))
  }

  test("phash: uniform image has no bright bits; half-bright has 32") {
    val flat = ImageCodec.decode(pngOf(16, 16, (_, _) => (100, 100, 100))).get
    assert(flat.nBright == 0L && flat.phashLo == 0L && flat.phashHi == 0L)
    // left half dark, right half bright: 4 of 8 thumbnail columns
    // bright -> exactly 32 bits, all in the right-half bit positions
    val split = ImageCodec.decode(
      pngOf(16, 16, (x, _) => if (x < 8) (0, 0, 0) else (200, 200, 200))).get
    assert(split.nBright == 32L,
      s"half-bright should set 32 bits: ${split.nBright}")
  }

  test("BMP round-trips through the same decode path (magic-sniffed)") {
    // encode with the JVM's own BMP writer — shares no code with the
    // stdlib-Python generator that built the committed .bmp corpus
    val img = new BufferedImage(20, 12, BufferedImage.TYPE_INT_RGB)
    for (y <- 0 until 12; x <- 0 until 20)
      img.setRGB(x, y, ((x * 9 + y) % 256 << 16) | ((y * 7) % 256 << 8) | (x + y * 3) % 256)
    val bos = new ByteArrayOutputStream()
    javax.imageio.ImageIO.write(img, "bmp", bos)
    val d = ImageCodec.decode(bos.toByteArray).get
    val png = ImageCodec.decode(
      pngOf(20, 12, (x, y) => ((x * 9 + y) % 256, (y * 7) % 256, (x + y * 3) % 256))).get
    assert(d == png, "identical pixels through BMP and PNG must give identical stats")
  }

  test("corrupt containers decode to None, never throw") {
    assert(ImageCodec.decode("not an image at all".getBytes).isEmpty)
    assert(ImageCodec.decode(Array.empty[Byte]).isEmpty)
    val good = pngOf(16, 16, (x, y) => (x, y, x + y))
    assert(ImageCodec.decode(good.take(good.length / 2)).isEmpty,
      "truncated stream must fail cleanly")
  }

  test("committed corpus matches the pixel-formula sidecar row-for-row") {
    val got = operators.Multimodal.mmImageDecode(spark, sfDir).collect()
    val want = spark.read
      .parquet(operators.Multimodal.imagesDir + "/expected.parquet")
      .select(col("file_name"), col("img_ok"), col("width"), col("height"),
        col("n_pixels"), col("sum_r"), col("sum_g"), col("sum_b"),
        col("phash_lo"), col("phash_hi"), col("n_bright"))
      .orderBy(col("file_name")).collect()
    assert(got.length == want.length && got.length == 67,
      s"corpus should be 67 files (50 PNG leg + 17 BMP leg): " +
        s"got=${got.length} want=${want.length}")
    got.zip(want).foreach { case (g, w) =>
      assert(g == w, s"decode diverged from sidecar:\n  got  $g\n  want $w")
    }
  }
}
