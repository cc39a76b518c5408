package graft.operators

import graft.Tables
import org.apache.spark.sql.{DataFrame, Dataset, SparkSession}
import org.apache.spark.sql.functions._

/** Multimodal-column pipeline: media payloads as opaque `binary` columns
  * with typed metadata (SURVEY §2 `mm_meta`).
  *
  * The corpus has no real image/audio bytes, so the *payload* is the UTF-8
  * encoding of the document text and the *decoder* is a deterministic stub —
  * but the Spark-side plumbing is the real shape a 100 TB media pipeline
  * needs: a typed `Dataset[MediaRecord]`, batched per-partition decode (the
  * seam where an Arrow/pandas-style vectorized library call goes), explicit
  * batch size, and a columnar metadata result that joins back by id.
  * Decode never shuffles; it is a map-only pass over the binary column.
  */
object Multimodal {

  // `ImageIO` defaults to DISK-backed stream caches: every
  // `ImageIO.read(InputStream)` and `createImageOutputStream` spools the
  // payload through a temp FILE, so a 32-thread decode stage becomes
  // hundreds of thousands of create/write/delete round-trips against the
  // scratch filesystem — real disk I/O and kernel metadata contention on
  // a path that is otherwise pure CPU over in-memory byte arrays. The
  // payloads here are already fully in memory (binary column batches),
  // so the memory-backed cache is strictly better at any scale. Runs in
  // the object initializer: executors initialize this object when the
  // first decode-seam closure touches it, so the setting reaches every
  // JVM that decodes, not just the driver.
  javax.imageio.ImageIO.setUseCache(false)

  /** Opaque media payload row (what an ingest table of images would hold). */
  case class MediaRecord(doc_id: Long, payload: Array[Byte])

  /** Typed decode result; in a real pipeline `width/height/frames` come
    * from the media library, here from the deterministic stub. */
  case class MediaMeta(
      doc_id: Long,
      n_bytes: Int,
      magic: String,
      width: Int,
      height: Int,
      frames: Int)

  /** Media-library batch size: the decode seam processes payloads in fixed
    * batches, the shape a vectorized (Arrow) decode call expects. */
  final val DecodeBatchSize = 64

  /** STUB DECODER — deterministic fake standing in for an image/audio
    * library call (none is installed in this environment). Derives plausible
    * (width, height, frames) purely from the payload length so the DuckDB
    * oracle can reproduce it. A real deployment swaps only this function. */
  def stubDecodeBatch(batch: Array[MediaRecord]): Array[MediaMeta] =
    batch.map { r =>
      val n = r.payload.length
      MediaMeta(
        doc_id = r.doc_id,
        n_bytes = n,
        magic = r.payload.take(4).map(b => f"$b%02X").mkString,
        width = 16 * (1 + n % 64),
        height = 16 * (1 + (n / 64) % 64),
        frames = 1 + n % 30)
    }

  /** REAL image decoder over the same batch seam: `javax.imageio` reads
    * the actual payload bytes (PNG/BMP/GIF/JPEG — whatever the JRE's
    * registered readers handle) and returns the true raster geometry.
    * This is the function a production pipeline swaps in for
    * [[stubDecodeBatch]]; the graded `mm_*` queries keep the stub because
    * the test corpus's payloads are text bytes, not media — but the
    * plumbing (batching, schema, partitioning) is identical and
    * spec-exercised against real generated PNG/BMP bytes
    * (ImageDecodeSpec). Decode failures surface as a zero-geometry row
    * rather than a task crash — at 100 TB some crawled bytes are always
    * corrupt, and one bad asset must not kill a 10⁶-row partition. */
  def imageDecodeBatch(batch: Array[MediaRecord]): Array[MediaMeta] =
    batch.map { r =>
      val magic = r.payload.take(4).map(b => f"$b%02X").mkString
      // NonFatal, not just IOException: ImageIO dispatches to every
      // classpath-registered reader SPI, and third-party plugin readers
      // throw RuntimeExceptions on corrupt bytes
      val img =
        try javax.imageio.ImageIO.read(new java.io.ByteArrayInputStream(r.payload))
        catch { case scala.util.control.NonFatal(_) => null }
      if (img == null)
        MediaMeta(r.doc_id, r.payload.length, magic, 0, 0, 0)
      else
        MediaMeta(r.doc_id, r.payload.length, magic,
          img.getWidth, img.getHeight, 1)
    }

  /** Deterministic real-container image encoder (PNG/BMP via the JRE's
    * `javax.imageio` writers — zero extra dependencies). The pixel fill
    * varies per coordinate so no encoder can collapse the raster to a
    * degenerate constant plane. Shared by [[realMediaTable]] and
    * ImageDecodeSpec so the graded path and the spec exercise the same
    * bytes-producing function. */
  /** The shared raster fill: per-coordinate varying pixels (+ a per-frame
    * offset for animated containers) through the backing int buffer —
    * same stored values as per-pixel setRGB on TYPE_INT_RGB, without its
    * per-call colormodel conversion (the measured encode hotspot at 50k
    * images/sweep). One implementation for both the still and the
    * multi-frame encoder so the fill contract cannot diverge. */
  private def filledImage(w: Int, h: Int, frame: Int): java.awt.image.BufferedImage = {
    val img = new java.awt.image.BufferedImage(
      w, h, java.awt.image.BufferedImage.TYPE_INT_RGB)
    val data = img.getRaster.getDataBuffer
      .asInstanceOf[java.awt.image.DataBufferInt].getData
    var y = 0
    while (y < h) {
      var x = 0
      while (x < w) {
        data(y * w + x) = (x * 31 + y * 17 + frame * 101) & 0xffffff
        x += 1
      }
      y += 1
    }
    img
  }

  def encodeImage(w: Int, h: Int, format: String): Array[Byte] = {
    val img = filledImage(w, h, frame = 0)
    val out = new java.io.ByteArrayOutputStream()
    if (!javax.imageio.ImageIO.write(img, format, out))
      throw new IllegalStateException(s"no $format image writer in this JRE")
    out.toByteArray
  }

  /** REAL-bytes media table: every document gets an actual PNG or BMP
    * container encoded in-pipeline, geometry derived from `doc_id` by
    * arithmetic the oracle replays. The corpus ships no media payloads,
    * so the bytes are born here — but they are true container formats
    * round-tripped through a real codec, not the stub's length
    * arithmetic: the decode stage cannot pass by construction, only by
    * actually parsing the container. Map-only: encode and decode live in
    * the same partition, nothing shuffles. */
  def realMediaTable(spark: SparkSession, sfDir: String): Dataset[MediaRecord] = {
    import spark.implicits._
    Tables.documents(spark, sfDir)
      .select(col("doc_id")).as[Long]
      // the codec round-trip is ~10 ms/image of real CPU while the input
      // is an 8-byte id — a 50 MB id scan arrives as 1-2 parquet splits,
      // which would serialize 50k encodes onto 2 cores. Spreading the
      // slim id frame across the cluster first costs a shuffle of ids
      // only and makes the encode/decode width the cluster's, not the
      // scan's.
      .repartition(spark.sparkContext.defaultParallelism)
      .mapPartitions { it =>
        // the ENCODE side is synthetic payload GENERATION (geometry is
        // id-arithmetic with 13·7·2 distinct classes), not the stage
        // under test — memoize it per partition so the table's cost is
        // the decode under test, not repeated generation of identical
        // bytes. Executor-local, no shuffle, no shared state; the DECODE
        // side still parses every row's container individually.
        val cache = collection.mutable.HashMap.empty[(Int, Int, String), Array[Byte]]
        it.map { id =>
          val w = 16 + (id % 13).toInt * 3
          val h = 9 + (id % 7).toInt * 5
          val fmt = if (id % 2 == 0) "png" else "bmp"
          MediaRecord(id,
            cache.getOrElseUpdate((w, h, fmt), encodeImage(w, h, fmt)))
        }
      }
  }

  /** `mm_meta_real` query: the REAL `javax.imageio` decoder
    * ([[imageDecodeBatch]]) over real generated container bytes, graded —
    * the oracle predicts the true raster geometry from `doc_id`, so a
    * hash match proves the decode stage parsed every container correctly
    * (a failed decode surfaces as a zero-geometry row and breaks the
    * hash). `magic_ok` additionally pins the container signature bytes
    * (PNG's fixed 8-byte magic prefix, BMP's "BM"). */
  def metaReal(spark: SparkSession, sfDir: String): DataFrame =
    decodeSeam(realMediaTable(spark, sfDir), imageDecodeBatch)
      .toDF()
      .select(col("doc_id"),
        when(col("doc_id") % 2 === 0, "png").otherwise("bmp").as("fmt"),
        col("width"), col("height"), col("frames"),
        when(col("doc_id") % 2 === 0, col("magic") === "89504E47")
          .otherwise(col("magic").startsWith("424D")).as("magic_ok"))

  /** `mm_resize_real` query: the decode → resize composition on REAL
    * bytes — the aspect-preserving fit-to-box planner runs downstream of
    * the real `javax.imageio` decode, so the geometry it plans from is
    * what the codec actually parsed, not stub arithmetic. The oracle
    * derives the same plan from the doc_id geometry: a hash match proves
    * decode and planning composed correctly end to end. */
  def resizeReal(spark: SparkSession, sfDir: String, box: Int = 224): DataFrame = {
    import spark.implicits._
    decodeSeam(realMediaTable(spark, sfDir), imageDecodeBatch)
      .mapPartitions { it =>
        it.grouped(DecodeBatchSize).flatMap(g => stubResizeBatch(g.toArray, box))
      }
      .toDF()
  }

  /** One decoded-and-sampled frame of a multi-frame container: the frame
    * count the reader reported, the sampled index, and the frame's TRUE
    * raster geometry (what [[gifFramesBatch]] actually parsed). */
  case class FrameMeta(
      doc_id: Long, n_frames: Int, frame_idx: Int, width: Int, height: Int)

  /** Deterministic real animated-GIF encoder (`javax.imageio`'s sequence
    * writer — zero extra dependencies): `nFrames` full-size frames whose
    * pixel fill varies per frame so no encoder can collapse the sequence
    * to one stored raster. Shared by [[gifMediaTable]] and the specs. */
  def encodeAnimatedGif(w: Int, h: Int, nFrames: Int): Array[Byte] = {
    val out = new java.io.ByteArrayOutputStream()
    val ios = javax.imageio.ImageIO.createImageOutputStream(out)
    val writer = javax.imageio.ImageIO.getImageWritersByFormatName("gif").next()
    try {
      writer.setOutput(ios)
      writer.prepareWriteSequence(null)
      var f = 0
      while (f < nFrames) {
        writer.writeToSequence(
          new javax.imageio.IIOImage(filledImage(w, h, f), null, null), null)
        f += 1
      }
      writer.endWriteSequence()
    } finally {
      writer.dispose()
      ios.close()
    }
    out.toByteArray
  }

  /** REAL multi-frame decoder + frame sampler over the batch seam:
    * `javax.imageio`'s reader API reads the container's true frame count
    * (`getNumImages`) and each sampled frame's raster (`read(i)`) — the
    * multi-frame analog of [[imageDecodeBatch]]. The sampling contract is
    * IDENTICAL to [[stubFrameBatch]]: up to `k` uniform indices
    * `floor(j·frames/k)`, deduplicated for short clips. Decode failure
    * (unreadable container, truncated frame) emits one zero-geometry row
    * — the same per-row failure signal as the whole media pipeline. */
  def gifFramesBatch(batch: Array[MediaRecord], k: Int): Array[FrameMeta] =
    batch.flatMap { r =>
      try {
        val iis = javax.imageio.ImageIO.createImageInputStream(
          new java.io.ByteArrayInputStream(r.payload))
        try {
          val readers = javax.imageio.ImageIO.getImageReaders(iis)
          if (!readers.hasNext) Seq(FrameMeta(r.doc_id, 0, 0, 0, 0))
          else {
            val reader = readers.next()
            try {
              reader.setInput(iis)
              val n = reader.getNumImages(true)
              (0 until k).map(j => j * n / k).distinct.map { idx =>
                val img = reader.read(idx)
                FrameMeta(r.doc_id, n, idx, img.getWidth, img.getHeight)
              }
            } finally reader.dispose()
          }
        } finally iis.close()
      } catch {
        // NonFatal for the same reason as imageDecodeBatch: plugin reader
        // SPIs throw RuntimeExceptions on corrupt bytes
        case scala.util.control.NonFatal(_) =>
          Seq(FrameMeta(r.doc_id, 0, 0, 0, 0))
      }
    }

  /** REAL-bytes multi-frame media table: every document gets an actual
    * animated GIF encoded in-pipeline — frame count AND geometry derived
    * from `doc_id` by arithmetic the oracle replays (the [[realMediaTable]]
    * construction extended to the time axis). Same codec-seam repartition:
    * the input is an 8-byte id, the work is a real multi-frame encode. */
  def gifMediaTable(spark: SparkSession, sfDir: String): Dataset[MediaRecord] = {
    import spark.implicits._
    Tables.documents(spark, sfDir)
      .select(col("doc_id")).as[Long]
      .repartition(spark.sparkContext.defaultParallelism)
      .mapPartitions { it =>
        // same per-partition generation memo as [[realMediaTable]]: 11·5·7
        // geometry classes; the multi-frame DECODE still parses every
        // row's frame directory and rasters individually
        val cache = collection.mutable.HashMap.empty[(Int, Int, Int), Array[Byte]]
        it.map { id =>
          val w = 12 + (id % 11).toInt * 2
          val h = 8 + (id % 5).toInt * 3
          val nf = 1 + (id % 7).toInt
          MediaRecord(id,
            cache.getOrElseUpdate((w, h, nf), encodeAnimatedGif(w, h, nf)))
        }
      }
  }

  /** `mm_frames_real` query: frame sampling through a REAL multi-frame
    * decode — animated GIF containers born in-pipeline, frame count and
    * per-frame geometry read back by the actual `javax.imageio` reader.
    * The oracle predicts (n_frames, sampled indices, geometry) from
    * doc_id arithmetic, so a hash match proves the reader parsed every
    * container's frame directory and rasters; a decode failure's
    * zero-geometry row breaks the hash. Sampling contract identical to
    * [[frames]]. */
  def framesReal(spark: SparkSession, sfDir: String, k: Int = 4): DataFrame = {
    import spark.implicits._
    gifMediaTable(spark, sfDir)
      .mapPartitions { it =>
        it.grouped(DecodeBatchSize).flatMap(g => gifFramesBatch(g.toArray, k))
      }
      .toDF()
  }

  /** The binary ingest table: documents' text bytes standing in for media
    * payloads. */
  def mediaTable(spark: SparkSession, sfDir: String): Dataset[MediaRecord] = {
    import spark.implicits._
    Tables.documents(spark, sfDir)
      .select(col("doc_id"), col("text").cast("binary").as("payload"))
      .as[MediaRecord]
  }

  /** The batched per-partition decode seam over ANY record set and ANY
    * vectorized decoder — map-only, explicit batch size, no shuffle. The
    * decoder argument is where an Arrow/pandas-style media library call
    * goes; [[imageDecodeBatch]] is the real-bytes implementation. */
  def decodeSeam(
      records: Dataset[MediaRecord],
      decoder: Array[MediaRecord] => Array[MediaMeta]): Dataset[MediaMeta] = {
    import records.sparkSession.implicits._
    records.mapPartitions { it =>
      it.grouped(DecodeBatchSize).flatMap(g => decoder(g.toArray))
    }
  }

  /** Batched per-partition decode of the corpus media table with the
    * deterministic stub (the oracle-checkable path). */
  def decodeMeta(spark: SparkSession, sfDir: String): Dataset[MediaMeta] =
    decodeSeam(mediaTable(spark, sfDir), stubDecodeBatch)

  /** `mm_meta` query: decoded metadata, oracle-checkable because the stub
    * is a pure function of the payload bytes. */
  def meta(spark: SparkSession, sfDir: String): DataFrame =
    decodeMeta(spark, sfDir).toDF()

  /** Exact content-hash dedup of the media assets — the standard FIRST
    * pass of a multimodal pipeline (bitwise-identical images/clips
    * re-crawled under different ids dedupe before any decode happens).
    * One md5-keyed hash aggregate, map-side partial; the payload bytes
    * never shuffle — only (hash, id) pairs do. Keeper = smallest doc_id
    * per content group, every asset gets a verdict. */
  def contentDedup(spark: SparkSession, sfDir: String): DataFrame = {
    import org.apache.spark.sql.functions._
    val hashed = mediaTable(spark, sfDir).toDF()
      .select(col("doc_id"), md5(col("payload")).as("content_md5"))
    val groups = hashed
      .groupBy(col("content_md5"))
      .agg(min(col("doc_id")).as("keep_id"), count(lit(1)).as("n_copies"))
    hashed.join(groups, "content_md5")
      .select(col("doc_id"), col("content_md5"), col("keep_id"),
        col("n_copies"), (col("doc_id") === col("keep_id")).as("keep"))
  }

  /** One sampled video frame: index + a (stub) extracted scalar feature. */
  case class FrameSample(doc_id: Long, frame_idx: Int, brightness: Int)

  /** STUB FRAME EXTRACTOR — uniform sampling of up to `k` frame indices
    * (`floor(j·frames/k)`, deduplicated for short clips) with a
    * deterministic per-frame feature standing in for the pixel-level
    * extraction a media library would do. Pure function of the decoded
    * metadata, so the oracle reproduces it. */
  def stubFrameBatch(batch: Array[MediaMeta], k: Int): Array[FrameSample] =
    batch.flatMap { m =>
      (0 until k).map(j => j * m.frames / k).distinct.map { idx =>
        FrameSample(m.doc_id, idx, (m.n_bytes * 131 + idx) % 256)
      }
    }

  /** Resize plan for a decoded image: aspect-preserving fit into a target
    * box (the standard vision-model preprocessing step). */
  case class ResizePlan(
      doc_id: Long, width: Int, height: Int,
      target_w: Int, target_h: Int, scale_pct: Int)

  /** STUB RESIZE PLANNER — computes the aspect-preserving target geometry
    * for a `box`×`box` model input (the actual pixel resample is the media
    * library's job; the geometry arithmetic, the part a pipeline audits,
    * is exact and oracle-checkable). Integer math throughout: scale is
    * expressed in basis points to stay exact. */
  def stubResizeBatch(batch: Array[MediaMeta], box: Int): Array[ResizePlan] =
    batch.map { m =>
      // a failed decode arrives as a zero-geometry row (the
      // imageDecodeBatch contract): forward it as a zero plan instead of
      // dividing by max(0, 0) and killing the task — decode failure must
      // stay a per-row signal all the way down the media pipeline
      if (m.width <= 0 || m.height <= 0)
        ResizePlan(m.doc_id, m.width, m.height, 0, 0, 0)
      else {
        // scale = box / max(w, h) in basis points, floor — never upscale
        val scaleBp = math.min(10000L, 10000L * box / math.max(m.width, m.height))
        ResizePlan(
          doc_id = m.doc_id,
          width = m.width,
          height = m.height,
          target_w = math.max(1, (m.width * scaleBp / 10000L).toInt),
          target_h = math.max(1, (m.height * scaleBp / 10000L).toInt),
          scale_pct = scaleBp.toInt)
      }
    }

  /** `mm_resize` query: the resize stage of the media pipeline — batched,
    * map-only, downstream of decode like [[frames]]. */
  def resize(spark: SparkSession, sfDir: String, box: Int = 224): DataFrame = {
    import spark.implicits._
    decodeMeta(spark, sfDir)
      .mapPartitions { it =>
        it.grouped(DecodeBatchSize).flatMap(g => stubResizeBatch(g.toArray, box))
      }
      .toDF()
  }

  /** `mm_frames` query: frame sampling as the second batched decode stage —
    * decode metadata, then per-partition batched frame extraction (the
    * row-expanding seam: output rows ≫ input rows, still map-only, no
    * shuffle until the caller aggregates). */
  def frames(spark: SparkSession, sfDir: String, k: Int = 4): DataFrame = {
    import spark.implicits._
    decodeMeta(spark, sfDir)
      .mapPartitions { it =>
        it.grouped(DecodeBatchSize).flatMap(g => stubFrameBatch(g.toArray, k))
      }
      .toDF()
  }
}
