package graft.ops

import org.apache.spark.sql.{DataFrame, Dataset, SparkSession}
import org.apache.spark.sql.functions._

/** One multimodal asset: opaque binary payload + typed metadata. */
final case class MediaAsset(
    doc_id: Long,
    media_type: String, // image | audio | video
    payload: Array[Byte],
    width: Int,
    height: Int,
    sample_rate: Int)

/** Extracted (fake-decoded) features for one asset. */
final case class MediaFeatures(
    doc_id: Long,
    media_type: String,
    n_bytes: Long,
    byte_sum: Long,
    feature: Array[Float])

/**
 * Multimodal-column plumbing: images/audio/video as opaque `binary` columns
 * with typed metadata, decoded/feature-extracted per-partition.
 *
 * The Spark-side machinery is REAL and load-bearing at scale: binary
 * payloads ride parquet byte arrays, the decode stage is a typed
 * `mapPartitions` that amortizes (stubbed) codec initialization per
 * partition and streams batches — exactly the shape a JNI/FFI image codec
 * or an `mapInPandas` Python decoder plugs into.
 *
 * The DECODE ITSELF IS A STUB: no image/audio libraries exist in this
 * container, so [[decodeStub]] derives deterministic fake features from the
 * payload bytes (documented; swap for a real codec by replacing one
 * function). Payloads are synthesized deterministically from document
 * content (md5 bytes), so every stage is reproducible and oracle-checkable
 * down to byte length.
 */
object Multimodal {

  /** Deterministic fake media corpus derived from `documents`. */
  def synthesizeAssets(spark: SparkSession, docs: DataFrame): Dataset[MediaAsset] = {
    import spark.implicits._
    docs.select(
      col("doc_id"),
      element_at(array(lit("image"), lit("audio"), lit("video")),
        (col("doc_id") % 3 + 1).cast("int")).as("media_type"),
      unhex(md5(col("text"))).as("payload"),
      (col("doc_id") % 64 + 1).cast("int").as("width"),
      (col("doc_id") % 48 + 1).cast("int").as("height"),
      lit(16000).as("sample_rate")).as[MediaAsset]
  }

  /**
   * STUB decoder — stands in for the real image/audio decode (???) which
   * needs codec libraries absent from this container. Deterministic:
   * features are byte statistics of the payload. Signature and batching are
   * the real contract.
   */
  private def decodeStub(asset: MediaAsset): MediaFeatures = {
    val bytes = asset.payload
    var sum = 0L
    var i = 0
    while (i < bytes.length) { sum += bytes(i) & 0xff; i += 1 }
    // fake 4-dim feature: normalized byte stats (a real decoder emits e.g. CLIP embeddings)
    val f = Array(
      bytes.length.toFloat,
      sum.toFloat / math.max(bytes.length, 1),
      (bytes.headOption.map(_ & 0xff).getOrElse(0)).toFloat,
      (bytes.lastOption.map(_ & 0xff).getOrElse(0)).toFloat)
    MediaFeatures(asset.doc_id, asset.media_type, bytes.length.toLong, sum, f)
  }

  /**
   * Feature extraction over the binary column: per-partition batched decode.
   * One "codec" init per partition (stubbed as a no-op), then streaming map.
   */
  def extractFeatures(assets: Dataset[MediaAsset]): Dataset[MediaFeatures] = {
    import assets.sparkSession.implicits._
    assets.mapPartitions { it =>
      // real impl: val codec = HeavyCodec.open() — amortized per partition
      it.map(decodeStub)
    }
  }

  /**
   * STUB resize — the real implementation calls the codec's scaler; the
   * stub keeps the contract (per-partition batching, metadata rewrite,
   * deterministic payload transform: proportional byte subsample).
   */
  def resizeStub(assets: Dataset[MediaAsset], width: Int, height: Int): Dataset[MediaAsset] = {
    import assets.sparkSession.implicits._
    assets.mapPartitions { it =>
      // real impl: val scaler = codec.scaler(width, height) — per partition
      it.map { a =>
        val srcArea = math.max(a.width * a.height, 1)
        val n = math.max(1, math.min(a.payload.length,
          (a.payload.length.toLong * width * height / srcArea).toInt))
        a.copy(payload = a.payload.take(n), width = width, height = height)
      }
    }
  }

  /** One sampled video frame: 1→N explode of the video payload. */
  final case class MediaFrame(
      doc_id: Long, frame_idx: Int, payload: Array[Byte], width: Int, height: Int)

  /**
   * STUB frame sampling over the SYNTHETIC md5-payload assets — emits
   * `nFrames` deterministic byte-rotations. Kept for the legacy synthetic
   * corpus; the REAL path is [[frameSampleMp4]], which reads true sample
   * offsets out of the MP4 box tables (stsz/stco) and slices actual sample
   * bytes. The 1→N flatMap here is the same plumbing shape: frame rows fan
   * out executor-side with no shuffle.
   */
  def frameSample(assets: Dataset[MediaAsset], nFrames: Int): Dataset[MediaFrame] = {
    import assets.sparkSession.implicits._
    assets.filter(_.media_type == "video").flatMap { a =>
      val len = math.max(a.payload.length, 1)
      (0 until nFrames).map { f =>
        val rot = new Array[Byte](a.payload.length)
        var i = 0
        while (i < rot.length) { rot(i) = a.payload((i + f) % len); i += 1 }
        MediaFrame(a.doc_id, f, rot, a.width, a.height)
      }
    }
  }

  /** Metadata projection (oracle-checkable: byte length from md5 payload). */
  def assetMetadata(assets: Dataset[MediaAsset]): DataFrame =
    assets.toDF().select(
      col("doc_id"), col("media_type"),
      length(col("payload")).cast("long").as("n_bytes"),
      col("width").cast("long").as("width"),
      col("height").cast("long").as("height"))

  /** A spec-valid media file as an opaque binary column. */
  final case class ContainerAsset(doc_id: Long, fmt: String, payload: Array[Byte])

  /** Byte-level-decoded container metadata (REAL parse, not a stub).
    * Fields inapplicable to a format are 0, not NULL — oracle comparators
    * sort whole rows and mixed NULL/numeric ordering is comparator-defined. */
  final case class ContainerMeta(
      doc_id: Long, fmt: String, payload_bytes: Long,
      sample_rate: Long, n_samples: Long,
      width: Long, height: Long, bpp: Long)

  /**
   * REAL container corpus: even doc_ids carry a spec-valid PCM WAV, odd a
   * spec-valid 24-bpp BMP ([[MediaContainers]] — pure byte layout, zero
   * codec libraries), with all parameters deterministic functions of
   * doc_id so the decode below is oracle-checkable by arithmetic.
   */
  def containerAssets(spark: SparkSession, docs: DataFrame): Dataset[ContainerAsset] = {
    import spark.implicits._
    docs.select(col("doc_id")).as[Long].map { id =>
      if (id % 2 == 0)
        ContainerAsset(id, "wav", MediaContainers.wavBytes(
          (8000 + (id / 2 % 3) * 4000).toInt, (id % 32 + 8).toInt, id))
      else
        ContainerAsset(id, "bmp", MediaContainers.bmpBytes(
          (id % 16 + 1).toInt, (id % 12 + 1).toInt, id))
    }
  }

  /**
   * The real decode step for WAV/BMP: per-partition batched byte-level
   * header parsing ([[MediaContainers.parseWav]]/[[MediaContainers.parseBmp]]
   * — magic-validated, chunk-walked). Same plumbing shape as
   * [[extractFeatures]], but nothing here is stubbed: the values come out
   * of the payload bytes, and the oracle recomputes them arithmetically
   * from doc_id — a writer or parser bug breaks the hash match.
   */
  def decodeContainers(assets: Dataset[ContainerAsset]): Dataset[ContainerMeta] = {
    import assets.sparkSession.implicits._
    assets.mapPartitions { it =>
      it.map { a =>
        if (a.fmt == "wav") {
          val w = MediaContainers.parseWav(a.payload)
          ContainerMeta(a.doc_id, a.fmt, w.totalBytes.toLong,
            w.sampleRate.toLong, w.nSamples.toLong, 0L, 0L, 0L)
        } else {
          val b = MediaContainers.parseBmp(a.payload)
          ContainerMeta(a.doc_id, a.fmt, b.totalBytes.toLong,
            0L, 0L, b.width.toLong, b.height.toLong, b.bitsPerPixel.toLong)
        }
      }
    }
  }

  // ------------------------------------------------------------- MP4 demux

  /** One demuxed MP4 sample: byte range located via stsz/stco, raw codec
    * bytes sliced out of mdat. Doc-level box fields ride along so the demux
    * surface is one flat frame. */
  final case class Mp4Sample(
      doc_id: Long, sample_idx: Long, sample_size: Long, sample_offset: Long,
      n_samples: Long, duration_ticks: Long, timescale: Long,
      width: Long, height: Long, payload: Array[Byte])

  /**
   * Deterministic MP4 corpus over the "video" documents (`doc_id % 3 == 2`,
   * the same assignment as [[synthesizeAssets]]): every parameter — track
   * dims, sample count, per-sample sizes, timescale/delta — is an
   * arithmetic function of doc_id, so the box-level demux below is
   * oracle-checkable by recomputation (the [[containerAssets]] pattern).
   */
  def mp4Assets(spark: SparkSession, docs: DataFrame): Dataset[ContainerAsset] = {
    import spark.implicits._
    docs.select(col("doc_id")).where(col("doc_id") % 3 === 2).as[Long].map { id =>
      val n = (id % 13 + 3).toInt
      val sizes = Array.tabulate(n)(i => ((id + 7 * i) % 24 + 8).toInt)
      ContainerAsset(id, "mp4", MediaContainers.mp4Bytes(
        width = ((id % 16 + 1) * 16).toInt, height = ((id % 9 + 1) * 16).toInt,
        sampleSizes = sizes, timescale = 600,
        sampleDelta = (40 + (id % 5) * 20).toInt, seed = id))
    }
  }

  /**
   * REAL video-container demux ([[MediaContainers.parseMp4]] — the
   * round-6 upgrade of the frame-sampling story): sample byte ranges come
   * out of the parsed stsz/stco tables (`offset_i = chunkOffset +
   * Σ_{j<i} size_j`), and each emitted row carries the ACTUAL sample bytes
   * sliced from mdat — no synthesized indices anywhere. Per-partition
   * batched like every binary-column op; the 1→N fan-out is executor-side,
   * no shuffle. Sample DECODE (bytes → pixels) still needs codec libraries
   * and stays stubbed downstream.
   */
  def demuxMp4Samples(assets: Dataset[ContainerAsset]): Dataset[Mp4Sample] = {
    import assets.sparkSession.implicits._
    assets.mapPartitions { it =>
      it.flatMap { a =>
        val m = MediaContainers.parseMp4(a.payload)
        var off = m.chunkOffset
        (0 until m.sampleCount).map { i =>
          val sz = m.sampleSizes(i)
          val sampleOff = off
          off += sz
          Mp4Sample(a.doc_id, i.toLong, sz.toLong, sampleOff.toLong,
            m.sampleCount.toLong, m.durationTicks.toLong, m.timescale.toLong,
            m.width.toLong, m.height.toLong,
            java.util.Arrays.copyOfRange(a.payload, sampleOff, sampleOff + sz))
        }
      }
    }
  }

  /** [[frameSample]] upgraded to real containers: frames are the demuxed
    * MP4 samples (true byte ranges from the box tables), shaped as
    * [[MediaFrame]] rows so downstream image ops consume them uniformly. */
  def frameSampleMp4(assets: Dataset[ContainerAsset]): Dataset[MediaFrame] = {
    import assets.sparkSession.implicits._
    demuxMp4Samples(assets).map(s =>
      MediaFrame(s.doc_id, s.sample_idx.toInt, s.payload, s.width.toInt, s.height.toInt))
  }
}
