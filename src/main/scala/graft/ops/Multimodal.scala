package graft.ops

import org.apache.spark.sql.{DataFrame, Dataset, SparkSession}
import org.apache.spark.sql.functions._

/** Multimodal-column plumbing: image/audio/video payloads travel as
  * opaque BINARY columns with a typed metadata struct; decode /
  * feature-extract / frame-sample are per-partition batch operators.
  *
  * The actual media decoding is STUBBED (no image/audio libraries in
  * this environment): [[MediaDecoder.Fake]] produces deterministic
  * pseudo-features from the raw bytes. Everything around the stub —
  * schema, binary handling, partition-batched execution, the 1→N
  * frame-sample generator — is real and tested, so swapping in a real
  * decoder is a one-class change.
  *
  * Scale posture: payloads never enter a shuffle key; feature
  * extraction is a pure projection (or mapPartitions) so it pipelines
  * with the scan; frame sampling is a generator (explode), the same
  * physical shape Spark uses for any 1→N expansion.
  */
object Multimodal {

  /** Typed per-partition decoder contract. `decode` sees one batch
    * (partition iterator) at a time — the batch shape a vectorized
    * decode library wants. */
  trait MediaDecoder extends Serializable {
    def decode(payload: Array[Byte]): MediaFeatures
  }

  final case class MediaFeatures(
      width: Int, height: Int, n_frames: Int, brightness: Double)

  object MediaDecoder {
    /** Deterministic fake: derives features from byte stats. Kept for
      * the oracle-gated queries (its arithmetic is SQL-expressible);
      * [[JdkImageIO]] is the real-bytes implementation. */
    object Fake extends MediaDecoder {
      def decode(payload: Array[Byte]): MediaFeatures = {
        val n = payload.length
        val first = if (n > 0) payload(0) & 0xFF else 0
        MediaFeatures(
          width = 64 + n % 896,
          height = 64 + (n * 31) % 896,
          n_frames = 1 + n % 10,
          brightness = first / 255.0)
      }
    }

    /** REAL image decoder on `javax.imageio` (JDK built-in, headless,
      * zero extra dependencies): decodes actual PNG/JPEG/GIF/BMP
      * payload bytes. `width`/`height` come from the decoded raster,
      * `n_frames` is 1 (still images), `brightness` is the mean
      * Rec. 601 luma over a bounded ≤64×64 sample grid (so a 100 MP
      * image costs the same as a thumbnail — per-row work must stay
      * bounded in a 100 TB scan). Undecodable bytes degrade to
      * `(0, 0, 0, NaN)` rather than killing the job — the curation
      * posture everywhere else in this engine: flag and filter
      * malformed rows downstream, don't crash the pipeline on them. */
    object JdkImageIO extends MediaDecoder {
      def decode(payload: Array[Byte]): MediaFeatures = {
        // NonFatal, not just IOException: the JDK image plugins throw
        // unchecked exceptions on some corrupt headers (IllegalArgument,
        // CMMException, NegativeArraySize…) and one pathological payload
        // must degrade, not fail the task on every retry.
        val img =
          try javax.imageio.ImageIO.read(new java.io.ByteArrayInputStream(payload))
          catch { case scala.util.control.NonFatal(_) => null }
        if (img == null) MediaFeatures(0, 0, 0, Double.NaN)
        else {
          val w = img.getWidth
          val h = img.getHeight
          val sx = math.max(1, w / 64)
          val sy = math.max(1, h / 64)
          var sum = 0.0
          var cnt = 0
          var y = 0
          while (y < h) {
            var x = 0
            while (x < w) {
              val rgb = img.getRGB(x, y)
              sum += 0.299 * ((rgb >> 16) & 0xFF) +
                0.587 * ((rgb >> 8) & 0xFF) + 0.114 * (rgb & 0xFF)
              cnt += 1
              x += sx
            }
            y += sy
          }
          MediaFeatures(w, h, 1, sum / cnt / 255.0)
        }
      }
    }
  }

  final case class MediaRow(
      media_id: Long, mime: String, source: String, payload: Array[Byte])
  final case class MediaWithFeatures(
      media_id: Long, mime: String, source: String, n_bytes: Int,
      width: Int, height: Int, n_frames: Int, brightness: Double)

  /** Wrap the documents table as a media table: text bytes stand in
    * for an encoded payload (BINARY), with typed metadata columns. */
  def mediaFromDocuments(docs: DataFrame): DataFrame =
    docs.select(
      col("doc_id").as("media_id"),
      lit("text/plain").as("mime"),
      col("source"),
      col("text").cast("binary").as("payload"))

  /** Partition-batched decode: the imperative path (mapPartitions over
    * typed rows) that a real decoder library plugs into. */
  def extractFeatures(media: DataFrame, decoder: MediaDecoder): Dataset[MediaWithFeatures] = {
    val spark = media.sparkSession
    import spark.implicits._
    media.as[MediaRow].mapPartitions { it =>
      it.map { m =>
        val f = decoder.decode(m.payload)
        MediaWithFeatures(m.media_id, m.mime, m.source, m.payload.length,
          f.width, f.height, f.n_frames, f.brightness)
      }
    }
  }

  /** Declarative twin of [[extractFeatures]] with the Fake decoder:
    * same output, pure column expressions (codegen'd, oracle-testable
    * in SQL). Demonstrates that stub features stay in the optimizer's
    * reach when they don't need library calls. */
  def extractFeaturesSql(media: DataFrame): DataFrame = {
    val n = octet_length(col("payload"))
    media.select(
      col("media_id"), col("mime"), col("source"),
      n.as("n_bytes"),
      (lit(64) + n % 896).as("width"),
      (lit(64) + (n * 31) % 896).as("height"),
      (lit(1) + n % 10).as("n_frames"),
      (ascii(col("payload").cast("string").substr(1, 1)).cast("double") / 255.0)
        .as("brightness"))
  }

  final case class ResizedMedia(
      media_id: Long, width: Int, height: Int,
      out_width: Int, out_height: Int, payload: Array[Byte])

  /** Resize to fit a bounding box, preserving aspect ratio. The
    * geometry (output dims from the decoded dims) is exact and
    * declarative; the pixel work is the stubbed per-partition decoder
    * path (a real implementation swaps the payload transform). Output
    * payload here is a deterministic fake: the input truncated
    * proportionally to the area ratio — enough to test that bytes flow
    * through mapPartitions untouched by shuffles. */
  def resize(media: DataFrame, maxW: Int, maxH: Int,
      decoder: MediaDecoder = MediaDecoder.Fake): Dataset[ResizedMedia] = {
    val spark = media.sparkSession
    import spark.implicits._
    media.select(col("media_id"), col("mime"), col("source"), col("payload"))
      .as[MediaRow].mapPartitions { it =>
        it.map { m =>
          val f = decoder.decode(m.payload)
          val scale = math.min(1.0,
            math.min(maxW.toDouble / f.width, maxH.toDouble / f.height))
          val ow = math.max(1, math.round(f.width * scale).toInt)
          val oh = math.max(1, math.round(f.height * scale).toInt)
          val outLen = math.max(1,
            (m.payload.length * (scale * scale)).toInt.min(m.payload.length))
          ResizedMedia(m.media_id, f.width, f.height, ow, oh,
            java.util.Arrays.copyOf(m.payload, outLen))
        }
      }
  }

  /** Frame sampling: one output row per sampled frame index — the 1→N
    * generator shape (explode over a sequence whose length is data).
    * Output: (media_id, frame_idx). */
  def sampleFrames(media: DataFrame, everyNth: Int = 1): DataFrame = {
    val nFrames = lit(1) + octet_length(col("payload")) % 10
    media.select(col("media_id"),
      explode(sequence(lit(0), nFrames - 1, lit(everyNth))).as("frame_idx"))
  }

  /** Perceptual-hash near-duplicate media pairs — the image-side
    * sibling of [[Dedup.simhashPairs]]: each payload gets a 64-bit
    * dHash (row-gradient bits over a 9×8 sample grid), candidates come
    * from 16-bit banded bucket equi-joins (a true near-dup disagrees
    * on ≤ `maxHamming` bits, so at maxHamming ≤ 15 at least one of
    * the four bands matches exactly — never an all-pairs compare),
    * and kept pairs verify full-fingerprint Hamming ≤ `maxHamming`.
    * Output: (id_a, id_b, hamming), id_a < id_b — [[Dedup.components]]
    * consumes it directly for cluster/keep-one parity with the text
    * side.
    *
    * This entry point is the SYNTHETIC tier (the [[MediaDecoder.Fake]]
    * posture, like [[extractFeaturesSql]]): bands come from
    * [[graft.functions.dhash_bands]]'s deterministic codepoint grid
    * over the payload-as-string, so the full band/bucket/Hamming
    * pipeline is oracle-replayable in ANSI SQL. Real decoded-pixel
    * dedup is [[dhashPairsDecoded]] — identical machinery behind the
    * decode.
    *
    * Scale posture: one native projection per payload (binary never a
    * shuffle key — only (media_id, 4 ints) travel), the banded
    * candidate join of the simhash family, and a twice-joined
    * verification against the persisted 4-int fingerprint frame. */
  def dhashPairs(media: DataFrame, maxHamming: Int = 8,
      persist: Persistence = Persistence.Local): DataFrame =
    Dedup.bandedHammingPairs(
      media.repartition(col("media_id"))
        .select(col("media_id").as("doc_id"),
          graft.functions.dhash_bands(col("payload").cast("string")).as("bands"))
        .filter(col("bands").isNotNull)
        .select(col("doc_id") +:
          (0 until 4).map(k => element_at(col("bands"), k + 1).as(s"band$k")): _*),
      maxHamming, persist)

  /** Caption-conflict audit for image-text training pairs: perceptual
    * near-duplicate images ([[dhashPairs]] / [[dhashPairsDecoded]]
    * edges) whose CAPTIONS disagree — the same picture teaching the
    * model two different things. In web-scraped pair corpora these
    * are label-noise candidates (one caption is alt-text spam, a
    * watermark, or the wrong language); the rows a caption-cleaning
    * pass reviews first. The complementary reading also holds: a
    * near-dup image pair whose captions AGREE is a true duplicate the
    * image dedup alone already catches.
    *
    * `pairs` is any (id_a, id_b, hamming) frame from the dhash
    * machinery; `captions` maps media_id → caption text. Disagreement
    * is distinct-word-token Jaccard ≤ `maxCaptionJaccard` (exact
    * integer set counts, one IEEE division, rounded at 6dp — the
    * cross-engine spelling the dedup gates pin). Two empty captions
    * read Jaccard 1 (identical — no conflict).
    *
    * Scale shape: two keyed equi-joins of the (selectivity-tiny) pair
    * frame against the caption map, then per-ROW token-set HOFs — no
    * shuffle beyond the pair machinery's own, no token explode. */
  def captionConflicts(pairs: DataFrame, captions: DataFrame,
      maxCaptionJaccard: Double = 0.3): DataFrame = {
    val cap = captions.select(col("media_id"), col("caption"))
    def toks(c: org.apache.spark.sql.Column) =
      array_distinct(graft.functions.word_tokens(c))
    pairs
      .join(cap.select(col("media_id").as("id_a"),
        col("caption").as("cap_a")), "id_a")
      .join(cap.select(col("media_id").as("id_b"),
        col("caption").as("cap_b")), "id_b")
      .withColumn("ta", toks(col("cap_a")))
      .withColumn("tb", toks(col("cap_b")))
      .withColumn("n_union",
        size(array_union(col("ta"), col("tb"))))
      .withColumn("caption_jaccard",
        round(when(col("n_union") === 0, lit(1.0))
          .otherwise(size(array_intersect(col("ta"), col("tb")))
            .cast("double") / col("n_union")), 6))
      .filter(col("caption_jaccard") <= maxCaptionJaccard)
      .select(col("id_a"), col("id_b"), col("hamming"),
        col("caption_jaccard"))
  }

  /** [[dhashPairs]] over REAL decoded pixels: payloads decode via
    * `javax.imageio` (per-partition batch, the [[extractFeatures]]
    * path), the decoded raster is point-sampled to the 9×8 Rec. 601
    * luma grid (bounded work per image — a 100 MP payload costs 72
    * probes, not a full scan), and the same band packing / banded
    * candidate join / Hamming verification runs downstream.
    * Undecodable payloads drop from dedup (flag-and-filter posture —
    * they can't be near-duplicates of anything decodable). dHash's
    * comparisons are invariant under uniform brightness/contrast
    * shifts and survive re-encoding — the perceptual property the
    * spec pins with planted PNG near-duplicates. */
  def dhashPairsDecoded(media: DataFrame, maxHamming: Int = 8,
      persist: Persistence = Persistence.Local): DataFrame = {
    val spark = media.sparkSession
    import spark.implicits._
    val bands = media
      .select(col("media_id"), col("mime"), col("source"), col("payload"))
      .as[MediaRow].mapPartitions { it =>
        it.flatMap { m =>
          val g = decodedLumaGrid(m.payload)
          if (g == null) Iterator.empty
          else {
            val b = org.apache.spark.sql.graft.DhashImpl.bandsOfGrid(g)
            Iterator.single((m.media_id, b.getInt(0), b.getInt(1),
              b.getInt(2), b.getInt(3)))
          }
        }
      }.toDF("doc_id", "band0", "band1", "band2", "band3")
    Dedup.bandedHammingPairs(bands.repartition(col("doc_id")), maxHamming, persist)
  }

  /** The 72-cell (8 rows × 9 cols, row-major) point-sampled luma grid
    * of an encoded image, or null when the payload doesn't decode.
    * Cell (r, c) probes the pixel at the cell center — bounded per-row
    * work regardless of image size, the same budget rule as
    * [[MediaDecoder.JdkImageIO]]'s brightness sample. */
  private[ops] def decodedLumaGrid(payload: Array[Byte]): Array[Int] = {
    val img =
      try javax.imageio.ImageIO.read(new java.io.ByteArrayInputStream(payload))
      catch { case scala.util.control.NonFatal(_) => null }
    if (img == null) null
    else {
      val w = img.getWidth
      val h = img.getHeight
      val grid = new Array[Int](72)
      var r = 0
      while (r < 8) {
        var c = 0
        while (c < 9) {
          val x = math.min(w - 1, ((2 * c + 1) * w) / 18)
          val y = math.min(h - 1, ((2 * r + 1) * h) / 16)
          val rgb = img.getRGB(x, y)
          grid(r * 9 + c) = ((299 * ((rgb >> 16) & 0xFF) +
            587 * ((rgb >> 8) & 0xFF) + 114 * (rgb & 0xFF)) / 1000)
          c += 1
        }
        r += 1
      }
      grid
    }
  }

  /** Audio near-duplicate candidate pairs `(id_a, id_b, hamming)` by
    * Haitsma–Kalker robust fingerprint: four 12-bit band keys per
    * payload via the one-pass native
    * [[graft.functions.audio_fp_bands]] (17 overlapping frames, 4
    * energy bands, sign-of-second-derivative bits — gain-invariant by
    * construction), then the SAME banded candidate join + Hamming
    * verification the dHash/SimHash families run
    * ([[Dedup.bandedHammingPairs]]). The synthetic-decode tier
    * (payload codepoints as the signal) keeps the whole pipeline
    * oracle-replayable in ANSI SQL; real decoded-PCM dedup is
    * [[audioPairsDecoded]] — identical machinery behind the decode.
    *
    * Scale posture: one native projection per payload (binary never a
    * shuffle key — only (media_id, 4 ints) travel), banded equi-join
    * candidates, twice-joined verification against the persisted
    * 4-int fingerprint frame. */
  def audioPairs(media: DataFrame, maxHamming: Int = 8,
      persist: Persistence = Persistence.Local): DataFrame =
    Dedup.bandedHammingPairs(
      media.repartition(col("media_id"))
        .select(col("media_id").as("doc_id"),
          graft.functions.audio_fp_bands(col("payload").cast("string")).as("bands"))
        .filter(col("bands").isNotNull)
        .select(col("doc_id") +:
          (0 until 4).map(k => element_at(col("bands"), k + 1).as(s"band$k")): _*),
      maxHamming, persist)

  /** [[audioPairs]] over REAL decoded audio: payloads decode via
    * `javax.sound.sampled` (JDK built-in — WAV/AIFF/AU PCM, headless,
    * zero extra dependencies) per-partition, the PCM stream is
    * converted to signed 16-bit mono-equivalent samples (first
    * channel), point-sampled to the 140-slot signal grid (bounded
    * work per payload — a 3-hour recording costs 140 probes over the
    * decoded prefix, capped at `maxDecodedSamples` so per-row decode
    * work is bounded in a 100 TB scan), and the same band packing /
    * banded candidate join / Hamming verification runs downstream.
    * Undecodable payloads drop from dedup (flag-and-filter posture).
    * The fingerprint's gain invariance is real here: re-leveled
    * copies of a recording produce identical band keys (spec-pinned
    * with planted WAV near-duplicates). */
  def audioPairsDecoded(media: DataFrame, maxHamming: Int = 8,
      maxDecodedSamples: Int = 1 << 18,
      persist: Persistence = Persistence.Local): DataFrame = {
    val spark = media.sparkSession
    import spark.implicits._
    val cap = maxDecodedSamples
    val bands = media
      .select(col("media_id"), col("mime"), col("source"), col("payload"))
      .as[MediaRow].mapPartitions { it =>
        it.flatMap { m =>
          val sig = decodedPcmGrid(m.payload, cap)
          if (sig == null) Iterator.empty
          else {
            val b = org.apache.spark.sql.graft.AudioFpImpl.bandsOfGrid(sig)
            Iterator.single((m.media_id, b.getInt(0), b.getInt(1),
              b.getInt(2), b.getInt(3)))
          }
        }
      }.toDF("doc_id", "band0", "band1", "band2", "band3")
    Dedup.bandedHammingPairs(bands.repartition(col("doc_id")), maxHamming, persist)
  }

  /** The 140-slot point-sampled signed-16-bit PCM signal grid of an
    * encoded audio payload (first channel), or null when the payload
    * doesn't decode. Decoding stops after `maxDecodedSamples` frames
    * so per-row work stays bounded regardless of recording length —
    * the same budget rule as [[MediaDecoder.JdkImageIO]]'s luma
    * sample. */
  private[ops] def decodedPcmGrid(payload: Array[Byte],
      maxDecodedSamples: Int): Array[Int] = {
    import javax.sound.sampled.{AudioFormat, AudioSystem}
    val pcm: Array[Int] =
      try {
        val in = AudioSystem.getAudioInputStream(
          new java.io.ByteArrayInputStream(payload))
        try {
          val src = in.getFormat
          val fmt = new AudioFormat(AudioFormat.Encoding.PCM_SIGNED,
            src.getSampleRate, 16, src.getChannels,
            2 * src.getChannels, src.getSampleRate, false)
          val dec = AudioSystem.getAudioInputStream(fmt, in)
          val frameBytes = fmt.getFrameSize
          val buf = new Array[Byte](frameBytes * 1024)
          val out = new scala.collection.mutable.ArrayBuilder.ofInt
          var total = 0
          var read = dec.read(buf)
          while (read > 0 && total < maxDecodedSamples) {
            var off = 0
            while (off + 1 < read && total < maxDecodedSamples) {
              // little-endian 16-bit, first channel of each frame
              out += ((buf(off + 1) << 8) | (buf(off) & 0xFF))
              total += 1
              off += frameBytes
            }
            read = if (total < maxDecodedSamples) dec.read(buf) else -1
          }
          out.result()
        } finally in.close()
      } catch { case scala.util.control.NonFatal(_) => null }
    if (pcm == null || pcm.isEmpty) null
    else {
      val sig = new Array[Int](org.apache.spark.sql.graft.AudioFpImpl.Samples)
      val n = pcm.length
      var k = 0
      while (k < sig.length) {
        sig(k) = pcm((k * n) / sig.length)
        k += 1
      }
      sig
    }
  }
}
