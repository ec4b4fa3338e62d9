package graft.operators

import org.apache.spark.sql.{DataFrame, Dataset, Encoders}
import org.apache.spark.sql.functions._
import graft.core.hash.XXH3

/** Typed metadata for an opaque media blob. */
case class MediaMeta(
    doc_id: Long,
    media_bytes: Long,
    checksum: String,      // xxh3-64 hex of the blob
    kind: String,          // sniffed container kind
    width: Int,            // decode stub output
    height: Int,
    n_frames: Int)

/**
 * Multimodal-column plumbing: image/audio/video travel as opaque `binary`
 * columns with typed metadata. The Spark side — schema, batch iteration,
 * partition-parallel decode — is real. IMAGE decode is real too (JDK
 * ImageIO: PNG/JPEG/GIF/BMP dimensions need no external jar); audio/video
 * decode remains STUBBED behind [[decodeStub]] (no codec libraries in this
 * container), producing a deterministic fake so tests can pin outputs.
 *
 * Batch shape mirrors `mapInPandas`: each partition is processed as an
 * iterator of rows, the decoder is invoked once per blob inside the
 * partition loop (amortizing any per-batch codec setup), and the output is
 * a typed Dataset with a stable schema.
 */
object Multimodal {

  /** Real image decode via the JDK's ImageIO: returns (width, height, 1)
    * for blobs whose container ImageIO can read; None otherwise. Header
    * decode only — `getWidth/getHeight` read the metadata, not the pixels. */
  private[operators] def decodeImage(blob: Array[Byte]): Option[(Int, Int, Int)] = {
    val in = javax.imageio.ImageIO.createImageInputStream(
      new java.io.ByteArrayInputStream(blob))
    try {
      val readers = javax.imageio.ImageIO.getImageReaders(in)
      if (!readers.hasNext) None
      else {
        val reader = readers.next()
        try {
          reader.setInput(in)
          Some((reader.getWidth(0), reader.getHeight(0), 1))
        } finally reader.dispose()
      }
    } catch {
      case _: Exception => None // corrupt/truncated image: fall to the stub
    } finally in.close()
  }

  /** REMAINING DECODER SEAM (audio/video): swap for a real codec (e.g.
    * JCodec) when available. Deterministic fake: dimensions are a pure
    * function of the checksum, so results are stable across partitions
    * and retries. */
  private def decodeStub(blob: Array[Byte], checksum: Long): (Int, Int, Int) = {
    // ??? <- real audio/video decode goes here; deterministic fake below
    val w = 160 + (java.lang.Long.remainderUnsigned(checksum, 8L) * 80).toInt
    val h = 120 + (java.lang.Long.remainderUnsigned(checksum >>> 16, 6L) * 60).toInt
    val frames = 1 + (java.lang.Long.remainderUnsigned(checksum >>> 32, 24L)).toInt
    (w, h, frames)
  }

  /** Cheap container sniff from magic bytes (real logic — works on real
    * files too). */
  def sniffKind(blob: Array[Byte]): String = {
    if (blob.length >= 8 &&
        (blob(0) & 0xff) == 0x89 && blob(1) == 'P' && blob(2) == 'N' && blob(3) == 'G') "png"
    else if (blob.length >= 3 && (blob(0) & 0xff) == 0xff && (blob(1) & 0xff) == 0xd8) "jpeg"
    else if (blob.length >= 12 && blob(4) == 'f' && blob(5) == 't' && blob(6) == 'y' && blob(7) == 'p') "mp4"
    else if (blob.length >= 4 && blob(0) == 'R' && blob(1) == 'I' && blob(2) == 'F' && blob(3) == 'F') "wav"
    else "bin"
  }

  /**
   * Extract typed metadata from a binary media column, partition-parallel.
   * Input: df with (idCol LONG, binCol BINARY). Output: Dataset[MediaMeta].
   */
  def mediaMeta(df: DataFrame, idCol: String = "doc_id", binCol: String = "media"): Dataset[MediaMeta] = {
    val pruned = df.select(col(idCol).cast("long").as("id"), col(binCol).as("blob"))
    implicit val enc = Encoders.product[MediaMeta]
    pruned.mapPartitions { rows =>
      // per-partition decoder setup would go here (once, not per row)
      rows.map { r =>
        val id = r.getLong(0)
        val blob = if (r.isNullAt(1)) null else r.getAs[Array[Byte]](1)
        if (blob == null) {
          // docs without media are normal in real page tables: emit typed
          // null-metadata instead of killing the task
          MediaMeta(id, 0L, "", "none", 0, 0, 0)
        } else {
          val ck = XXH3.hash(blob)
          val kind = sniffKind(blob)
          // real ImageIO decode for image containers; stub for the rest
          val (w, h, f) =
            (if (kind == "png" || kind == "jpeg") decodeImage(blob) else None)
              .getOrElse(decodeStub(blob, ck))
          MediaMeta(id, blob.length.toLong, java.lang.Long.toHexString(ck), kind, w, h, f)
        }
      }
    }
  }

  /** Deterministic frame-sample positions for a media blob (video-style
    * `n` evenly spaced frame indexes) — the plumbing half of frame
    * sampling; the pixel decode is behind the same stub seam. */
  def frameSamplePositions(nFrames: Int, sample: Int): Seq[Int] = {
    if (nFrames <= 0 || sample <= 0) Seq.empty
    else if (nFrames <= sample) 0 until nFrames
    else (0 until sample).map(i => (i.toLong * nFrames / sample).toInt)
  }
}
