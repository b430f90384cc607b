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
}
