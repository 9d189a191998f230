package graft.functions

import org.apache.spark.sql.{DataFrame, Dataset}

import graft.model.PageRow

/** Multimodal-column plumbing: opaque `binary` payloads + typed metadata.
  *
  * The real decoders (image/audio codecs) are NOT in this container, so the
  * decode step is a clearly-marked deterministic STUB; everything Spark-side —
  * schema, per-partition batching shape (the batch-of-crops pattern from
  * tools/infer/predict_rec.py:569-601: accumulate a fixed-size batch, process,
  * scatter back), partitioning, column types — is real and tested.
  */
object MultimodalFunctions {

  final case class MediaMeta(
      url: String,
      n_bytes: Long,
      kind: String, // "png"|"jpeg"|"gif"|"bmp"|"pdf"|"html"|"empty"|"other" — magic-byte sniff
      content_md5: String,
      width: Int, // REAL header-parse dims for image containers; stub otherwise
      height: Int,
      feature: Array[Float] // STUB embedding (8-dim)
  )

  /** Batch size for the (stubbed) decoder — the real decoder would want dense
    * batches, like the reference's rec_batch_num=6 crop batches. */
  val decodeBatch = 64

  private def sniff(b: Array[Byte]): String =
    if (b == null || b.isEmpty) "empty"
    else if (ImageHeaders.isPng(b)) "png"
    else if (ImageHeaders.isGif(b)) "gif"
    else if (ImageHeaders.isJpeg(b)) "jpeg"
    else if (b.length >= 4 && b(0) == '%' && b(1) == 'P' && b(2) == 'D' && b(3) == 'F') "pdf"
    else if (b.length >= 1 && (b(0) == '<' || b(0) == 0xef.toByte)) "html"
    else if (ImageHeaders.isBmp(b)) "bmp" // after html: 'B' can't open a tag
    else "other"

  /** Decode step: image-container dimensions are REAL header reads (PNG IHDR,
    * JPEG SOFn, GIF screen descriptor, BMP info header — see ImageHeaders; no
    * codec involved, exactly what the reference's DecodeImage reports,
    * ppocr/data/imaug/operators.py:29-61). Pixels/features stay a
    * clearly-labeled deterministic STUB (no codecs in this environment); the
    * batch signature (batch in → per-item dims + feature vector out) is the
    * real contract. Non-image payloads keep digest-derived stub dims. */
  private def stubDecode(batch: Array[(String, Array[Byte], String, Array[Byte])])
      : Array[MediaMeta] =
    batch.map { case (url, payload, kind, digest) =>
      val (w, h) = ImageHeaders.dims(payload) match {
        case Some(d) => (d.width, d.height)
        case None => (64 + (digest(0) & 0x7f) * 16, 64 + (digest(1) & 0x7f) * 16)
      }
      val feat = Array.tabulate(8)(i => (digest(i) & 0xff).toFloat / 255.0f)
      MediaMeta(url, if (payload == null) 0L else payload.length.toLong, kind,
        digest.map("%02x".format(_)).mkString, w, h, feat)
    }

  /** Resize planning on media metadata — the EXACT arithmetic of the
    * reference's DetResizeForTest type-0 path (limit the long side to
    * `limitSideLen`; truncate the scaled dims like Python's int(); round to
    * the nearest multiple of 32 with HALF_EVEN — Python 3 round() IS
    * banker's rounding — floor 32; ppocr/data/imaug/operators.py:198-325).
    * The pixels are stubbed elsewhere; this arithmetic is real and
    * spec-tested against hand-computed reference values. Pure column
    * expressions — row-local, no shuffle. */
  def resizePlan(meta: DataFrame, limitSideLen: Int = 960): DataFrame = {
    import org.apache.spark.sql.functions._
    val w = col("width").cast("double")
    val h = col("height").cast("double")
    val ratio = when(greatest(w, h) > limitSideLen, lit(limitSideLen.toDouble) / greatest(w, h))
      .otherwise(lit(1.0))
    def snap32(c: org.apache.spark.sql.Column) = {
      val truncated = floor(c) // int(h * ratio): positive values truncate = floor
      greatest(bround(truncated / 32) * 32, lit(32)).cast("int") // bround = HALF_EVEN
    }
    meta.select(col("url"), col("width"), col("height"),
      snap32(w * ratio).as("out_w"), snap32(h * ratio).as("out_h"))
  }

  /** STUB frame sampling for video-ish payloads: one row per sampled frame
    * (url, frame_idx, frame_ts_ms, feature) — the real Spark shape of
    * frame extraction (explode to per-frame rows that downstream ops join
    * or embed) with a deterministic fake decoder (no codecs in sandbox).
    * Frame count = min(maxFrames, 1 + n_bytes/strideBytes); features derive
    * from md5(payload digest ++ frame_idx). No shuffle: scan → mapPartitions
    * → rows. */
  def frameSample(pages: Dataset[PageRow], strideBytes: Int = 4096,
                  maxFrames: Int = 8): DataFrame = {
    import pages.sparkSession.implicits._
    pages.mapPartitions { it =>
      val md = java.security.MessageDigest.getInstance("MD5")
      it.flatMap { p =>
        val payload = if (p.html == null) Array.emptyByteArray else p.html
        md.reset()
        val digest = md.digest(payload)
        val nFrames = math.min(maxFrames, 1 + payload.length / strideBytes)
        (0 until nFrames).map { i =>
          md.reset()
          md.update(digest)
          md.update(i.toByte)
          val fd = md.digest()
          val feat = Array.tabulate(8)(k => (fd(k) & 0xff).toFloat / 255.0f)
          (p.url, i, i.toLong * 40L, feat) // 40ms ≈ 25fps frame spacing
        }
      }
    }.toDF("url", "frame_idx", "frame_ts_ms", "feature")
  }

  /** Metadata + stub-decoded features for every page payload, batched per
    * partition. No shuffle: scan → mapPartitions → rows. */
  def mediaMeta(pages: Dataset[PageRow]): DataFrame = {
    import pages.sparkSession.implicits._
    pages.mapPartitions { it =>
      val md = java.security.MessageDigest.getInstance("MD5")
      it.grouped(decodeBatch).flatMap { group =>
        val batch = group.map { p =>
          md.reset()
          val digest = md.digest(if (p.html == null) Array.emptyByteArray else p.html)
          (p.url, p.html, sniff(p.html), digest)
        }.toArray
        stubDecode(batch)
      }
    }.toDF()
  }
}
