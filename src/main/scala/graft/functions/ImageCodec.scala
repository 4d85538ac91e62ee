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

  final case class Decoded(
      width: Int, height: Int,
      sumR: Long, sumG: Long, sumB: Long,
      phashLo: Long, phashHi: Long, nBright: Long)

  private val out = 8

  def decode(bytes: Array[Byte]): Option[Decoded] =
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
          // 8×8 NN thumbnail + average-hash, the mm_phash math over
          // real pixels (bit i set iff thumb(i)·64 > Σthumb)
          val thumb = new Array[Long](out * out)
          var tsum = 0L
          var y = 0
          while (y < out) {
            val sy = y * h / out
            var x = 0
            while (x < out) {
              val v = luma(sy * w + x * w / out).toLong
              thumb(y * out + x) = v
              tsum += v
              x += 1
            }
            y += 1
          }
          var lo = 0L; var hi = 0L; var nBright = 0L
          var i = 0
          while (i < 64) {
            if (thumb(i) * 64 > tsum) {
              nBright += 1
              if (i < 32) lo |= 1L << i else hi |= 1L << (i - 32)
            }
            i += 1
          }
          Some(Decoded(w, h, sumR, sumG, sumB, lo, hi, nBright))
        }
      }
    } catch { case _: Exception => None }
}
