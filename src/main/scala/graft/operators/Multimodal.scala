package graft.operators

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._
import graft.sources.Tables

/** §2.F — multimodal column plumbing.
  *
  * Images/audio/video ride through the engine as opaque `binary`
  * columns with typed metadata structs; decode/feature-extraction runs
  * batch-wise per partition (the same shape a vectorized/pandas-style
  * decode batch takes on a cluster). The decoder itself is a
  * deterministic STUB — the image/audio codecs aren't in this
  * container — but the Spark-side plumbing (binary payloads, metadata
  * struct schema, partition-batched extraction, typed output schema)
  * is real and oracle-able by row count.
  */
object Multimodal {
  private type Q = (SparkSession, String) => DataFrame

  /** Build payload+meta, then "decode" per-partition: byte-histogram
    * features stand in for pixel statistics.
    */
  val mmDecodeMeta: Q = (s, d) => {
    import s.implicits._
    val base = Tables.documents(s, d).select(
      col("doc_id"),
      // synthetic opaque payload — in production this is the image bytes
      encode(col("text"), "UTF-8").as("payload"),
      ((col("doc_id") % 32) + 16).cast("int").as("width"),
      ((col("doc_id") % 24) + 12).cast("int").as("height"),
      lit("fake/rgb8").as("format"))
    base
      .select(col("doc_id"), col("payload"), col("width"), col("height"), col("format"))
      .as[(Long, Array[Byte], Int, Int, String)]
      .mapPartitions { batch =>
        batch.map { case (id, bytes, w, h, fmt) =>
          // STUB decoder (deterministic): byte histogram mod 4. A real
          // deployment swaps this body for the codec call; the
          // partition-batched iterator shape is what matters at scale.
          val hist = new Array[Long](4)
          var i = 0
          while (i < bytes.length) { hist((bytes(i) & 0xff) % 4) += 1; i += 1 }
          (id, w, h, fmt, bytes.length.toLong, hist(0), hist(1), hist(2), hist(3))
        }
      }
      .toDF("doc_id", "width", "height", "format", "n_bytes", "h0", "h1", "h2", "h3")
      .orderBy(col("doc_id"))
  }

  /** REAL frame sampling over a multi-frame container: decode the
    * committed WAV/AU corpus ([[graft.functions.AudioCodec]], real
    * RIFF/AU PCM parse), split the waveform into fixed 128-sample
    * block frames, keep every 2nd frame, and emit one row per sampled
    * frame with all-integer per-frame statistics (signed sum, abs
    * peak) — an iterator-EXPANDING mapPartitions (one clip in → many
    * frame rows out), the batch shape a real frame-decoder pipeline
    * uses. The oracle reads a sidecar derived from the generator's
    * sample formulas (tools/gen_audio.py), so a decoder bug cannot
    * self-confirm. Corrupt/undecodable files yield no frames (their
    * clip-level failure rows live in mm_audio_decode). Map-only:
    * binaryFile scan → per-partition decode, no shuffle before the
    * final presentation sort.
    */
  val mmFrameSample: Q = (s, _) => frameSample(s, audioDir)

  /** Dir-parameterized frame-sampling pass behind [[mmFrameSample]] —
    * Profile --codec-scale points it at a factor-scaled corpus.
    */
  private[graft] def frameSample(s: SparkSession, dir: String): DataFrame = {
    import s.implicits._
    val frameSize = 128
    val stride = 2
    graft.sources.BinaryFiles.scan(s, "*.{wav,au}", dir)
      .select(col("file_name"), col("content"))
      .as[(String, Array[Byte])]
      .mapPartitions { batch =>
        batch.flatMap { case (name, bytes) =>
          graft.functions.AudioCodec.decodeSamples(bytes) match {
            case Some(clip) =>
              val xs = clip.samples
              val nFrames = xs.length / frameSize
              (0 until nFrames by stride).iterator.map { f =>
                var sum = 0L
                var peak = 0L
                var i = f * frameSize
                val end = i + frameSize
                while (i < end) {
                  val v = xs(i).toLong
                  sum += v
                  val a = math.abs(v)
                  if (a > peak) peak = a
                  i += 1
                }
                (name, f.toLong, sum, peak)
              }
            case None => Iterator.empty
          }
        }
      }
      .toDF("file_name", "frame_idx", "frame_sum", "frame_peak")
      .orderBy(col("file_name"), col("frame_idx"))
  }

  /** REAL nearest-neighbor resize over decoded corpus luma: decode the
    * committed PNG/BMP corpus ([[graft.functions.ImageCodec]], real
    * container parse via javax.imageio), NN-resize the integer luma
    * raster to a 10×10 thumbnail (output pixel (y,x) samples source
    * (⌊y·h/10⌋, ⌊x·w/10⌋)), and emit all-integer thumbnail statistics
    * — sum, min, max, plus a position-weighted sum Σ thumb(i)·(i+1)
    * that pins EVERY output pixel's value and position, not just the
    * aggregate. The oracle reads a sidecar computed from the
    * generator's pixel formulas (tools/gen_images.py), never from this
    * decoder. Corrupt files surface as img_ok=false rows. One file in
    * → one thumbnail row out, map-only partition-batched decode.
    */
  val mmResize: Q = (s, _) => {
    import s.implicits._
    val outW = 10
    val outH = 10
    graft.sources.BinaryFiles.scan(s, "*.{png,bmp}", imagesDir)
      .select(col("file_name"), col("content"))
      .as[(String, Array[Byte])]
      .mapPartitions { batch =>
        batch.map { case (name, bytes) =>
          graft.functions.ImageCodec.decodeRaster(bytes) match {
            case Some(r) =>
              val t = graft.functions.ImageCodec.resizeLuma(r, outW, outH)
              var sum = 0L
              var wsum = 0L
              var mn = Long.MaxValue
              var mx = Long.MinValue
              var i = 0
              while (i < t.length) {
                val v = t(i).toLong
                sum += v
                wsum += v * (i + 1)
                if (v < mn) mn = v
                if (v > mx) mx = v
                i += 1
              }
              (name, true, outW, outH, sum, mn, mx, wsum)
            case None => (name, false, 0, 0, 0L, 0L, 0L, 0L)
          }
        }
      }
      .toDF("file_name", "img_ok", "out_w", "out_h",
        "thumb_sum", "thumb_min", "thumb_max", "thumb_wsum")
      .orderBy(col("file_name"))
  }

  /** Per-payload feature extraction — the byte-level statistics a
    * training pipeline computes per asset before filtering (mean
    * level, energy, dynamic range, alphabet size). Stub stands in for
    * a codec-backed extractor; batch shape and typed output schema are
    * the real thing.
    */
  val mmFeatureExtract: Q = (s, d) => {
    import s.implicits._
    Tables.documents(s, d)
      .select(col("doc_id"), encode(col("text"), "UTF-8").as("payload"))
      .as[(Long, Array[Byte])]
      .mapPartitions { batch =>
        batch.map { case (id, bytes) =>
          val seen = new Array[Boolean](256)
          var sum = 0L
          var sumSq = 0L
          var mn = 255
          var mx = 0
          var i = 0
          while (i < bytes.length) {
            val v = bytes(i) & 0xff
            seen(v) = true
            sum += v
            sumSq += v.toLong * v
            if (v < mn) mn = v
            if (v > mx) mx = v
            i += 1
          }
          val n = bytes.length.max(1)
          val nDistinct = seen.count(identity).toLong
          val mean = math.floor(sum.toDouble / n * 10000 + 0.5) / 10000.0
          val energy = math.floor(sumSq.toDouble / n * 10000 + 0.5) / 10000.0
          (id, bytes.length.toLong, mean, energy, (mx - mn).toLong, nDistinct)
        }
      }
      .toDF("doc_id", "n_bytes", "mean_level", "energy", "dyn_range", "alphabet")
      .orderBy(col("doc_id"))
  }

  /** Perceptual average-hash over the 8×8 NN thumbnail (same index
    * math as mmResize): bit i set iff pixel i is strictly brighter
    * than the thumbnail mean — compared as `pixel·64 > sum` so the
    * mean never becomes a float. Emitted as two 32-bit halves
    * (lo = bits 0..31): a 2^63 bit in one BIGINT would wrap in Spark
    * but ERROR in DuckDB's checked arithmetic, and the split also
    * hands downstream banding its chunks for free. This is the stored
    * artifact of image near-dup dedup; candidate pairing over it is
    * the dd_simhash chunk-band shape (hamming ≤ r pairs share an
    * exact 16-bit band by pigeonhole). Map-only, partition-batched.
    */
  val mmPhash: Q = (s, d) => {
    import s.implicits._
    val out = 8
    Tables.documents(s, d)
      .select(col("doc_id"), encode(col("text"), "UTF-8").as("payload"),
        ((col("doc_id") % 32) + 16).cast("int").as("width"),
        ((col("doc_id") % 24) + 12).cast("int").as("height"))
      .as[(Long, Array[Byte], Int, Int)]
      .mapPartitions { batch =>
        batch.map { case (id, bytes, w, h) =>
          val thumb = new Array[Long](out * out)
          var sum = 0L
          var y = 0
          while (y < out) {
            val sy = y * h / out
            var x = 0
            while (x < out) {
              val sx = x * w / out
              val idx = sy * w + sx
              val v: Long = if (idx < bytes.length) (bytes(idx) & 0xff).toLong else 0L
              thumb(y * out + x) = v
              sum += v
              x += 1
            }
            y += 1
          }
          var lo = 0L
          var hi = 0L
          var nBright = 0L
          var i = 0
          while (i < 64) {
            if (thumb(i) * 64 > sum) {
              nBright += 1
              if (i < 32) lo |= 1L << i else hi |= 1L << (i - 32)
            }
            i += 1
          }
          (id, lo, hi, nBright)
        }
      }
      .toDF("doc_id", "phash_lo", "phash_hi", "n_bright")
      .orderBy(col("doc_id"))
  }

  private[graft] val imagesDir = "/root/repo/data/images"

  /** REAL image decode over a committed corpus of true PNG files —
    * the non-stub sibling of mmDecodeMeta/mmPhash, closing the image
    * half of the multimodal gap JDK-only:
    * [[graft.functions.ImageCodec]] parses the PNG container via
    * javax.imageio (magic-sniffed, not extension-trusted), emits
    * all-integer channel sums and the mm_phash average-hash over the
    * REAL luma raster (same 8×8 NN index math). The corpus was written
    * by an independent stdlib-Python generator (tools/gen_images.py —
    * no shared code with the reader), and the oracle reads its
    * pixel-formula-derived sidecar, so a decoder bug cannot
    * self-confirm. Corrupt files (bad magic, truncated stream) surface
    * as img_ok=false rows, never a thrown scan. Plan shape: binaryFile
    * scan (distributed listing) → per-partition decode, map-only —
    * the 100 TB posture is one decode pass, no driver involvement,
    * no shuffle.
    */
  val mmImageDecode: Q = (s, _) => imageDecode(s, imagesDir)

  /** Dir-parameterized decode pass behind [[mmImageDecode]] — Profile
    * --codec-scale points it at a factor-scaled generated corpus to
    * measure binaryFile listing amortization.
    */
  private[graft] def imageDecode(s: SparkSession, dir: String): DataFrame = {
    import s.implicits._
    graft.sources.BinaryFiles.scan(s, "*.{png,bmp}", dir)
      .select(col("file_name"), col("content"))
      .as[(String, Array[Byte])]
      .mapPartitions { batch =>
        batch.map { case (name, bytes) =>
          graft.functions.ImageCodec.decode(bytes) match {
            case Some(d) =>
              (name, true, d.width, d.height, d.width.toLong * d.height,
                d.sumR, d.sumG, d.sumB, d.phashLo, d.phashHi, d.nBright)
            case None =>
              (name, false, 0, 0, 0L, 0L, 0L, 0L, 0L, 0L, 0L)
          }
        }
      }
      .toDF("file_name", "img_ok", "width", "height", "n_pixels",
        "sum_r", "sum_g", "sum_b", "phash_lo", "phash_hi", "n_bright")
      .orderBy(col("file_name"))
  }

  private[graft] val audioDir = "/root/repo/data/audio"

  /** REAL audio decode over a committed corpus of true WAV files —
    * the audio sibling of [[mmImageDecode]], same contract:
    * [[graft.functions.AudioCodec]] parses the RIFF/PCM container via
    * javax.sound.sampled, emits all-integer clip statistics (abs-sum,
    * energy, peak, zero crossings); the corpus comes from an
    * independent stdlib-Python generator (tools/gen_audio.py, `wave`
    * module) and the oracle reads its sample-formula sidecar. Corrupt
    * files → audio_ok=false rows. binaryFile scan + per-partition
    * decode, map-only.
    */
  val mmAudioDecode: Q = (s, _) => audioDecode(s, audioDir)

  /** Dir-parameterized decode pass behind [[mmAudioDecode]] — Profile
    * --codec-scale points it at a factor-scaled corpus.
    */
  private[graft] def audioDecode(s: SparkSession, dir: String): DataFrame = {
    import s.implicits._
    graft.sources.BinaryFiles.scan(s, "*.{wav,au}", dir)
      .select(col("file_name"), col("content"))
      .as[(String, Array[Byte])]
      .mapPartitions { batch =>
        batch.map { case (name, bytes) =>
          graft.functions.AudioCodec.decode(bytes) match {
            case Some(d) =>
              (name, true, d.nChannels, d.sampleRate, d.nSamples,
                d.sumAbs, d.energy, d.peak, d.zeroCrossings)
            case None =>
              (name, false, 0, 0, 0L, 0L, 0L, 0L, 0L)
          }
        }
      }
      .toDF("file_name", "audio_ok", "n_channels", "sample_rate",
        "n_samples", "sum_abs", "energy", "peak", "zero_crossings")
      .orderBy(col("file_name"))
  }

  /** Content-addressed dedup over the opaque binary payload — the
    * storage layout move for media corpora: digest the raw bytes
    * (md5 here; production uses sha256), keep one canonical asset per
    * digest, account the savings. Unlike dd_exact (normalized TEXT),
    * this hashes the payload bytes verbatim — the digest IS the
    * storage key. Partial-aggregating groupBy: one row per digest to
    * the shuffle.
    */
  val mmDedupBytes: Q = (s, d) =>
    Tables.documents(s, d)
      .select(col("doc_id"), encode(col("text"), "UTF-8").as("payload"))
      .groupBy(md5(col("payload")).as("digest"))
      .agg(min(col("doc_id")).as("canonical_id"),
        count(lit(1)).as("ref_count"),
        max(length(col("payload"))).cast("long").as("n_bytes"))
      .withColumn("bytes_saved", (col("ref_count") - 1) * col("n_bytes"))
      .orderBy(col("digest"))

  val queries: Map[String, Q] = Map(
    "mm_phash" -> mmPhash,
    "mm_dedup_bytes" -> mmDedupBytes,
    "mm_decode_meta" -> mmDecodeMeta,
    "mm_image_decode" -> mmImageDecode,
    "mm_audio_decode" -> mmAudioDecode,
    "mm_frame_sample" -> mmFrameSample,
    "mm_resize" -> mmResize,
    "mm_feature_extract" -> mmFeatureExtract)

  /** The byte histogram is computable in SQL for ASCII text, so this
    * gets a real oracle despite the mapPartitions implementation.
    */
  val oracles: Map[String, String] = Map(
    "mm_phash" ->
      """SELECT doc_id,
        | CAST(list_sum(list_transform(range(1, 33), i ->
        |   CASE WHEN thumb[i] * 64 > list_sum(thumb) THEN (CAST(1 AS BIGINT) << (i - 1)) ELSE 0 END)) AS BIGINT) AS phash_lo,
        | CAST(list_sum(list_transform(range(33, 65), i ->
        |   CASE WHEN thumb[i] * 64 > list_sum(thumb) THEN (CAST(1 AS BIGINT) << (i - 33)) ELSE 0 END)) AS BIGINT) AS phash_hi,
        | CAST(len(list_filter(thumb, v -> v * 64 > list_sum(thumb))) AS BIGINT) AS n_bright
        |FROM (
        | SELECT doc_id,
        |  list_transform(range(0, 64), i ->
        |    CASE WHEN ((i // 8) * h // 8) * w + ((i % 8) * w // 8) < strlen(text)
        |         THEN bytes[((i // 8) * h // 8) * w + ((i % 8) * w // 8) + 1]
        |         ELSE 0 END) AS thumb
        | FROM (
        |  SELECT doc_id, doc_id % 32 + 16 AS w, doc_id % 24 + 12 AS h,
        |   text, list_transform(string_split(text, ''), c -> ascii(c)) AS bytes
        |  FROM documents) r) t
        |ORDER BY doc_id""".stripMargin,
    "mm_image_decode" ->
      s"""SELECT file_name, img_ok,
        | CAST(width AS INT) AS width, CAST(height AS INT) AS height,
        | n_pixels, sum_r, sum_g, sum_b, phash_lo, phash_hi, n_bright
        |FROM read_parquet('$imagesDir/expected.parquet')
        |ORDER BY file_name""".stripMargin,
    "mm_audio_decode" ->
      s"""SELECT file_name, audio_ok,
        | CAST(n_channels AS INT) AS n_channels,
        | CAST(sample_rate AS INT) AS sample_rate,
        | n_samples, sum_abs, energy, peak, zero_crossings
        |FROM read_parquet('$audioDir/expected.parquet')
        |ORDER BY file_name""".stripMargin,
    "mm_dedup_bytes" ->
      """SELECT md5(text) AS digest, min(doc_id) AS canonical_id,
        | CAST(count(*) AS BIGINT) AS ref_count,
        | CAST(max(strlen(text)) AS BIGINT) AS n_bytes,
        | CAST((count(*) - 1) * max(strlen(text)) AS BIGINT) AS bytes_saved
        |FROM documents GROUP BY 1 ORDER BY digest""".stripMargin,
    "mm_decode_meta" ->
      """SELECT doc_id,
        | CAST(doc_id % 32 + 16 AS INT) AS width,
        | CAST(doc_id % 24 + 12 AS INT) AS height,
        | 'fake/rgb8' AS format,
        | CAST(strlen(text) AS BIGINT) AS n_bytes,
        | len(list_filter(list_transform(string_split(text, ''), c -> ascii(c) % 4), v -> v = 0)) AS h0,
        | len(list_filter(list_transform(string_split(text, ''), c -> ascii(c) % 4), v -> v = 1)) AS h1,
        | len(list_filter(list_transform(string_split(text, ''), c -> ascii(c) % 4), v -> v = 2)) AS h2,
        | len(list_filter(list_transform(string_split(text, ''), c -> ascii(c) % 4), v -> v = 3)) AS h3
        |FROM documents ORDER BY doc_id""".stripMargin,
    "mm_frame_sample" ->
      s"""SELECT file_name, frame_idx, frame_sum, frame_peak
        |FROM read_parquet('$audioDir/expected_frames.parquet')
        |ORDER BY file_name, frame_idx""".stripMargin,
    "mm_resize" ->
      s"""SELECT file_name, img_ok,
        | CAST(r10_w AS INT) AS out_w, CAST(r10_h AS INT) AS out_h,
        | r10_sum AS thumb_sum, r10_min AS thumb_min,
        | r10_max AS thumb_max, r10_wsum AS thumb_wsum
        |FROM read_parquet('$imagesDir/expected.parquet')
        |ORDER BY file_name""".stripMargin,
    "mm_feature_extract" ->
      """SELECT doc_id,
        | CAST(strlen(text) AS BIGINT) AS n_bytes,
        | floor(list_sum(bytes) * 1.0 / greatest(strlen(text), 1) * 10000 + 0.5) / 10000.0 AS mean_level,
        | floor(list_sum(list_transform(bytes, v -> v * v)) * 1.0 / greatest(strlen(text), 1) * 10000 + 0.5) / 10000.0 AS energy,
        | CAST(list_max(bytes) - list_min(bytes) AS BIGINT) AS dyn_range,
        | CAST(len(list_distinct(bytes)) AS BIGINT) AS alphabet
        |FROM (
        | SELECT doc_id, text,
        |  list_transform(string_split(text, ''), c -> ascii(c)) AS bytes
        | FROM documents) t
        |ORDER BY doc_id""".stripMargin)
}
