package graft

import java.nio.file.{Files, Paths}

import graft.functions.OcrCodec

/** The real-OCR recognition chain at TEST time (the Verify oracle
  * already pins it at verify time): the whole committed scanned-PNG
  * corpus against the expected-text sidecar — which tools/gen_scans.py
  * derives from its OWN formulas (source text with '?' at destroyed
  * cells, confidence from the flipped-bit count), never from this
  * matcher, so the comparison is two independent routes to the same
  * recognition. Plus the structural failure contract the corpus's
  * corrupt leg can't reach from inside a valid PNG.
  */
class OcrCodecSpec extends SparkTestBase {

  private val dir = operators.FundEtl.statementsOcrDir

  test("committed corpus: character-exact AND confidence-exact vs the sidecar") {
    val expected = spark.read.parquet(s"$dir/expected.parquet")
      .collect()
      .map(r => (r.getAs[String]("file_name"), r.getAs[String]("batch_date"),
        r.getAs[Boolean]("ocr_ok"), r.getAs[String]("content"),
        r.getAs[Long]("ocr_conf_ppm")))
    assert(expected.length >= 50)
    var clean = 0; var noisy = 0; var destroyed = 0; var corrupt = 0
    expected.foreach { case (name, date, ok, text, conf) =>
      val bytes = Files.readAllBytes(Paths.get(dir, date, name))
      val got = OcrCodec.recognize(bytes)
      if (!ok) {
        // corrupt leg (bad magic / truncated / corrupt IDAT): decode
        // failure surfaces as None, never a thrown scan
        assert(got.isEmpty, s"$name should fail to decode")
        corrupt += 1
      } else {
        assert(got.isDefined, s"$name failed to decode")
        assert(got.get.text == text,
          s"$name text mismatch:\n${got.get.text}\nvs\n$text")
        assert(got.get.confPpm == conf,
          s"$name confidence mismatch: ${got.get.confPpm} vs $conf")
        if (text.contains('?')) {
          // destroyed leg: the scribbled cell is beyond the rejection
          // threshold from every template — '?' , never a guess, and
          // the file's confidence drops by at least that cell's 256
          destroyed += 1
          assert(conf < 1000000L, s"$name: rejected cell must cost confidence")
        }
        if (conf == 1000000L) clean += 1 else noisy += 1
      }
    }
    // the corpus exercises all four legs
    assert(clean >= 15, s"clean=$clean")
    assert(noisy >= 20, s"noisy=$noisy") // every odd-index file flips >=1 bit
    assert(destroyed >= 3, s"destroyed=$destroyed")
    assert(corrupt == 3, s"corrupt=$corrupt")
  }

  test("the font atlas itself recognizes to the charmap at full confidence") {
    // the atlas IS a valid scan of the charmap text (32 glyphs per
    // row): recognizing the matcher's own model through the public
    // entry point pins segmentation, exact-hash lookup and
    // trailing-space trimming in one shot — every cell hits the exact
    // path, so confidence is exactly 1e6
    val charmap = new String(
      Files.readAllBytes(Paths.get(dir, "font", "charmap.txt")),
      java.nio.charset.StandardCharsets.UTF_8)
    val atlas = Files.readAllBytes(Paths.get(dir, "font", "atlas.png"))
    val got = OcrCodec.recognize(atlas)
    assert(got.isDefined)
    assert(got.get.text == charmap.grouped(32).mkString("\n"))
    assert(got.get.confPpm == 1000000L)
  }

  test("the committed atlas stays inside ImageCodec's decode contract") {
    // loadFont FAIL-LOUDLY sys.errors from executor tasks if atlas.png
    // ever falls outside the self-contained decoder's narrowed contract
    // (8-bit gray/truecolor, non-interlaced, no palette). That is
    // acceptable for a trusted committed asset ONLY if contract drift
    // is caught here at commit time — a regenerated palette/interlaced
    // atlas must fail this spec, never a 1000-executor scan at runtime.
    val atlas = Files.readAllBytes(Paths.get(dir, "font", "atlas.png"))
    val decoded = graft.functions.ImageCodec.decodeRgb(atlas)
    assert(decoded.isDefined,
      "data/statements_ocr/font/atlas.png no longer decodes via " +
        "ImageCodec.decodeRgb — regenerate it as 8-bit gray/truecolor " +
        "non-interlaced PNG or widen the decoder before shipping")
    // and its geometry still matches the 16px glyph-cell grid loadFont
    // slices (a resized atlas would mis-segment every glyph)
    assert(decoded.get.width % 16 == 0 && decoded.get.height % 16 == 0,
      s"atlas ${decoded.get.width}x${decoded.get.height} is off the 16px cell grid")
  }

  test("failure contract: bad magic, off-grid dimensions, blank page") {
    assert(OcrCodec.recognize("GIF89a nope".getBytes("UTF-8")).isEmpty)
    assert(OcrCodec.recognize(Array[Byte]()).isEmpty)
    def png(w: Int, h: Int): Array[Byte] = {
      val img = new java.awt.image.BufferedImage(
        w, h, java.awt.image.BufferedImage.TYPE_BYTE_GRAY)
      val g = img.createGraphics()
      g.setColor(java.awt.Color.WHITE); g.fillRect(0, 0, w, h); g.dispose()
      val bos = new java.io.ByteArrayOutputStream()
      javax.imageio.ImageIO.write(img, "png", bos)
      bos.toByteArray
    }
    // a valid PNG whose dimensions are not a whole number of 16px
    // glyph cells is not this scanner's output
    assert(OcrCodec.recognize(png(10, 16)).isEmpty)
    assert(OcrCodec.recognize(png(16, 40)).isEmpty)
    // a grid-aligned but all-background page has no recognizable glyph
    assert(OcrCodec.recognize(png(32, 16)).isEmpty)
  }
}
