package graft.functions

import java.io.ByteArrayInputStream

/** Real image decode, JDK-only (`javax.imageio` — PNG/BMP/GIF ship
  * with every JRE, no jar): closes the "real image decode" half of the
  * multimodal gap the mm_* stub decoders plumb around. The reference's
  * OCR front door (`manual_dividen_extractor.py:74-96`) opens real
  * images before recognition; this is that open/decode step, minus the
  * env-blocked recognition model.
  *
  * Output statistics are ALL-INTEGER (channel sums, a 1000-scaled
  * integer luma, the mm_phash average-hash over an 8×8 NN thumbnail
  * with the same index math) so results are exact across engines and
  * execution orders — the committed-corpus oracle hash-matches against
  * a sidecar derived from the generator's pixel formulas, never from
  * this decoder.
  *
  * Decode failures (bad magic, truncated/corrupt streams) return None
  * — surfaced as img_ok=false rows, never a thrown scan, matching the
  * etl_pdf_text / etl_xlsx_ingest failure contract.
  */
object ImageCodec {

  // same rationale as OcrCodec: the shared /tmp ImageIO disk cache can
  // race under concurrent decodes and surface as a silent decode
  // failure through the broad catch; byte-array sources don't need it
  javax.imageio.ImageIO.setUseCache(false)

  final case class Decoded(
      width: Int, height: Int,
      sumR: Long, sumG: Long, sumB: Long,
      phashLo: Long, phashHi: Long, nBright: Long)

  /** Decoded luma raster plus channel sums: the shared decode step
    * behind both the stats summary ([[decode]]) and raster consumers
    * like the real NN resize (Multimodal.mmResize), which needs the
    * pixels themselves, not their aggregates.
    */
  final case class Raster(
      width: Int, height: Int, luma: Array[Int],
      sumR: Long, sumG: Long, sumB: Long)

  private val out = 8

  def decodeRaster(bytes: Array[Byte]): Option[Raster] =
    try {
      // ImageIO sniffs the container by magic, not file name; a
      // headless JVM decodes PNG fine (no display pipeline involved)
      val img = javax.imageio.ImageIO.read(new ByteArrayInputStream(bytes))
      if (img == null) None
      else {
        val w = img.getWidth
        val h = img.getHeight
        if (w <= 0 || h <= 0) None
        else {
          var sumR = 0L; var sumG = 0L; var sumB = 0L
          // one bulk getRGB into an int[] — same sRGB conversion as
          // the per-pixel call, minus a ColorModel virtual call per
          // pixel on this per-partition hot path
          val argbs = img.getRGB(0, 0, w, h, null, 0, w)
          // integer luma raster: (299r + 587g + 114b) / 1000 — exact
          // on 8-bit sRGB channels, which getRGB returns losslessly
          // for the 8-bit truecolor PNGs/BMPs under test
          val luma = new Array[Int](w * h)
          var p = 0
          while (p < argbs.length) {
            val argb = argbs(p)
            val r = (argb >> 16) & 0xff
            val g = (argb >> 8) & 0xff
            val b = argb & 0xff
            sumR += r; sumG += g; sumB += b
            luma(p) = (r * 299 + g * 587 + b * 114) / 1000
            p += 1
          }
          Some(Raster(w, h, luma, sumR, sumG, sumB))
        }
      }
    } catch { case _: Exception => None }

  /** Nearest-neighbor resize of a luma raster to outW×outH: output
    * pixel (y, x) samples source (y·h/outH, x·w/outW) — all-integer,
    * so cross-engine exact.
    */
  def resizeLuma(r: Raster, outW: Int, outH: Int): Array[Int] = {
    val t = new Array[Int](outW * outH)
    var y = 0
    while (y < outH) {
      val sy = y * r.height / outH
      var x = 0
      while (x < outW) {
        t(y * outW + x) = r.luma(sy * r.width + x * r.width / outW)
        x += 1
      }
      y += 1
    }
    t
  }

  def decode(bytes: Array[Byte]): Option[Decoded] =
    decodeRaster(bytes).map { r =>
      // 8×8 NN thumbnail + average-hash, the mm_phash math over
      // real pixels (bit i set iff thumb(i)·64 > Σthumb)
      val thumb = resizeLuma(r, out, out)
      var tsum = 0L
      var i = 0
      while (i < 64) { tsum += thumb(i); i += 1 }
      var lo = 0L; var hi = 0L; var nBright = 0L
      i = 0
      while (i < 64) {
        if (thumb(i).toLong * 64 > tsum) {
          nBright += 1
          if (i < 32) lo |= 1L << i else hi |= 1L << (i - 32)
        }
        i += 1
      }
      Decoded(r.width, r.height, r.sumR, r.sumG, r.sumB, lo, hi, nBright)
    }
}
