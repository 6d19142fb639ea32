package graft.multimodal

import org.apache.spark.sql.{DataFrame, Row}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types._

/** Multimodal-column plumbing: image/audio/video as opaque `binary` columns
  * with typed metadata, processed by per-partition batch functions.
  *
  * The container has no image/audio codecs, so the decode step is a
  * clearly-marked deterministic fake ([[fakeDecodeFeatures]]) — but the
  * Spark-side plumbing is real and what matters at scale:
  *
  *  - payloads travel as `BinaryType` inside rows (columnar parquet keeps
  *    them out of the scan unless projected);
  *  - metadata is a typed struct column, filterable *without* touching
  *    bytes (predicate pushdown on `meta.kind` prunes payload IO);
  *  - heavy per-item work runs via `mapPartitions` on an iterator — the
  *    Scala analogue of `mapInPandas`: batch-shaped, no per-row UDF setup,
  *    arbitrary native-lib calls allowed inside the partition closure;
  *  - feature output is a fixed-width `array<double>` ready for the
  *    [[graft.similarity.KNN]] path.
  */
object Multimodal {

  val mediaSchema: StructType = StructType(Seq(
    StructField("media_id", LongType, nullable = false),
    StructField("payload", BinaryType, nullable = true),
    StructField("meta", StructType(Seq(
      StructField("kind", StringType, nullable = false),   // image|audio|video
      StructField("n_bytes", LongType, nullable = false),
      StructField("source", StringType, nullable = true)
    )), nullable = false)
  ))

  /** Build a media table from the documents table: payload = UTF-8 bytes of
    * the text (a deterministic stand-in for real image/audio bytes).
    */
  def fromDocuments(docs: DataFrame): DataFrame =
    docs.select(
      col("doc_id").as("media_id"),
      encode(col("text"), "UTF-8").as("payload"),
      struct(
        // deterministic fake modality from the id
        element_at(array(lit("image"), lit("audio"), lit("video")), (pmod(col("doc_id"), lit(3)) + 1).cast("int")).as("kind"),
        // octet length of the payload, not character length — the payload
        // is bytes, and the decode stub measures bytes
        length(encode(col("text"), "UTF-8")).cast("long").as("n_bytes"),
        col("source").as("source")
      ).as("meta")
    )

  /** STUB — deterministic fake for the decode/feature-extract step.
    *
    * In production this closure would call the real codec (JPEG decode,
    * resample, frame-sample) on each payload; the container ships no codecs,
    * so features are derived arithmetically from the bytes: feature j of an
    * n-byte payload is the byte-sum of the j-th of 8 equal chunks — exact
    * integers, so the oracle compare is immune to fp formatting. The
    * Spark-side plumbing (binary columns, typed metadata, mapPartitions
    * batch shape, fixed-width feature output) is the real deliverable.
    */
  val FeatureDim = 8

  def fakeDecodeFeatures(media: DataFrame): DataFrame = {
    val spark = media.sparkSession
    val outSchema = StructType(Seq(
      StructField("media_id", LongType, nullable = false),
      StructField("kind", StringType, nullable = true),
      StructField("n_bytes", LongType, nullable = true),
      StructField("features", ArrayType(DoubleType, containsNull = false), nullable = true)
    ))
    val rdd = media.select(col("media_id"), col("payload"), col("meta.kind")).rdd.mapPartitions { rows =>
      // batch shape: the whole partition is one iterator — codec/session
      // setup (the expensive part with a real decoder) happens once here.
      rows.map { r =>
        val id = r.getLong(0)
        val bytes = if (r.isNullAt(1)) Array.empty[Byte] else r.getAs[Array[Byte]](1)
        val kind = r.getString(2)
        val n = bytes.length
        val feats = (0 until FeatureDim).map { j =>
          val lo = j * n / FeatureDim
          val hi = math.max(lo + 1, math.min((j + 1) * n / FeatureDim, n))
          var s = 0L
          var i = lo
          while (i < hi && i < n) { s += (bytes(i) & 0xff); i += 1 }
          s.toDouble
        }.toArray
        Row(id, kind, n.toLong, feats)
      }
    }
    spark.createDataFrame(rdd, outSchema)
  }

  /** Frame sampling: cut the payload into fixed-size frames and keep every
    * `everyK`-th (a video keyframe-sampling shape; with a real codec the
    * frame boundary comes from the container format instead of a fixed
    * stride). One output row per sampled frame: index, byte length, and
    * the 48-bit content hash (exact integers — oracle-comparable without
    * binary-blob compare).
    *
    * Fully DECLARATIVE like [[frameAHash]]: sequence+explode for the 1→N
    * fan-out and `md5(substring(payload, …))` + a 12-hex-digit `conv` for
    * the hash — the parquet scan stays in the pipeline and the whole row
    * is whole-stage codegen. The `.rdd` escape hatch
    * ([[sampleFramesRdd]], the parity-spec'd reference) is reserved for
    * real-codec stubs that genuinely need per-partition session setup;
    * slicing and hashing bytes is not that.
    */
  def sampleFrames(media: DataFrame, frameBytes: Int, everyK: Int): DataFrame = {
    require(frameBytes > 0 && everyK > 0, "frameBytes and everyK must be positive")
    val len = length(col("payload")).cast("long")
    val n = (len + lit(frameBytes - 1).cast("long")).divide(lit(frameBytes)).cast("long")
    val lo = col("frame_idx") * lit(frameBytes.toLong)
    media.select(col("media_id"), col("payload"))
      .withColumn("frame_idx",
        explode(when(n > 0, sequence(lit(0L), n - 1, lit(everyK.toLong)))
          .otherwise(array().cast("array<bigint>"))))
      .select(
        col("media_id"),
        col("frame_idx"),
        least(lit(frameBytes.toLong), len - lo).as("frame_len"),
        // first 6 digest bytes as a big-endian long = first 12 hex chars
        // of md5 — exactly Hash48F.first48(md.digest())
        conv(substring(md5(col("payload").substr((lo + 1).cast("int"), lit(frameBytes))), 1, 12),
          16, 10).cast("long").as("frame_hash"))
  }

  /** The `mapPartitions` form [[sampleFrames]] replaced — kept (not dead
    * code) as the cross-checkable semantic reference: `MultimodalSpec`
    * asserts the codegen pipeline is row-identical to this on real
    * payloads plus the null/empty/ragged-tail edges.
    */
  private[graft] def sampleFramesRdd(media: DataFrame, frameBytes: Int, everyK: Int): DataFrame = {
    require(frameBytes > 0 && everyK > 0, "frameBytes and everyK must be positive")
    val spark = media.sparkSession
    val outSchema = StructType(Seq(
      StructField("media_id", LongType, nullable = false),
      StructField("frame_idx", LongType, nullable = false),
      StructField("frame_len", LongType, nullable = false),
      StructField("frame_hash", LongType, nullable = false)
    ))
    val rdd = media.select(col("media_id"), col("payload")).rdd.mapPartitions { rows =>
      val md = java.security.MessageDigest.getInstance("MD5")
      rows.flatMap { r =>
        val id = r.getLong(0)
        val bytes = if (r.isNullAt(1)) Array.empty[Byte] else r.getAs[Array[Byte]](1)
        val nFrames = (bytes.length + frameBytes - 1) / frameBytes
        (0 until nFrames).iterator.collect {
          case f if f % everyK == 0 =>
            val lo = f * frameBytes
            val hi = math.min(lo + frameBytes, bytes.length)
            md.reset()
            md.update(bytes, lo, hi - lo)
            Row(id, f.toLong, (hi - lo).toLong, graft.plans.Hash48F.first48(md.digest()))
        }
      }
    }
    spark.createDataFrame(rdd, outSchema)
  }

  /** Per-frame PERCEPTUAL hash (aHash shape): cut the payload into
    * `frameBytes` frames (every `everyK`-th kept, like [[sampleFrames]])
    * and hash each frame's first 48 "pixels" by mean threshold — bit `j`
    * set iff pixel `j` exceeds the frame's pixel mean (integer division;
    * bytes past the frame end count 0). With a real codec the pixels
    * would come from an 8×6 grayscale downsample of the DECODED frame;
    * the stub reads raw payload bytes (unsigned), which preserves the
    * property that matters for the pipeline: NEARBY frames get NEARBY
    * hashes, so small payload edits leave the hash within a small
    * hamming radius — the locality a perceptual dedup needs and an
    * exact content hash ([[sampleFrames]]' `frame_hash`) destroys.
    *
    * Emits `fid = media_id · 2^20 + frame_idx` alongside: a single
    * sortable frame identity for the pair machinery
    * ([[graft.dedup.Dedup.hammingPairs]]). Payloads are capped at 2^20
    * frames, loudly.
    */
  def frameAHash(media: DataFrame, frameBytes: Int, everyK: Int): DataFrame = {
    require(frameBytes > 0 && everyK > 0, "frameBytes and everyK must be positive")
    // frame-index generation and the per-frame hash both stay inside
    // whole-stage codegen: sequence+explode for the 1→N frame fan-out and
    // the AHash48F kernel for the pure arithmetic ([[frameAHashRdd]] is
    // the parity-spec'd reference). The `.rdd` escape hatch is reserved
    // for the real-codec stubs — an aHash is just byte math.
    val nRaw = (length(col("payload")).cast("long") + lit(frameBytes - 1).cast("long"))
      .divide(lit(frameBytes)).cast("long")
    val n = when(nRaw >= lit(1L << 20),
        raise_error(concat(lit("media "), col("media_id").cast("string"),
          lit(": "), nRaw.cast("string"), lit(" frames exceeds the 2^20 fid budget")))
          .cast("long"))
      .otherwise(nRaw)
    media.select(col("media_id"), col("payload"))
      .withColumn("frame_idx",
        explode(when(n > 0, sequence(lit(0L), n - 1, lit(everyK.toLong)))
          .otherwise(array().cast("array<bigint>"))))
      .select(
        col("media_id"),
        col("frame_idx"),
        (col("media_id") * lit(1L << 20) + col("frame_idx")).as("fid"),
        graft.plans.AHash48F.column(col("payload"), col("frame_idx"), frameBytes).as("ahash48"))
  }

  /** SHOT-BOUNDARY detection over sampled frames: consecutive SAMPLED
    * frames of a media whose perceptual-hash hamming distance reaches
    * `minHamming` mark a cut — the video-segmentation primitive a frame
    * pipeline runs before picking representative frames per shot (one
    * keyframe per shot instead of every k-th frame cuts the downstream
    * embed/dedup volume by the shot length). The aHash is locality-
    * preserving ([[frameAHash]]), so within-shot motion stays under the
    * threshold while a hard cut lands far away — with the real-codec
    * caveat documented there (the stub hashes raw payload bytes; the
    * BOUNDARY MACHINERY — framing, ordering, lag, hamming, threshold —
    * is the real, tested part).
    *
    * Scale shape: the frame fan-out and hashing are the codegen
    * [[frameAHash]] pipeline; the lag rides a window KEYED BY MEDIA
    * (bounded by one media's sampled-frame count — never a global
    * window), and the threshold filter is a pure row predicate.
    *
    * @return (media_id, from_idx, to_idx, hamming ≥ minHamming) — one
    *         row per detected cut between adjacent sampled frames
    */
  def shotBoundaries(
      media: DataFrame,
      frameBytes: Int,
      everyK: Int,
      minHamming: Int): DataFrame = {
    require(minHamming >= 1 && minHamming <= 48,
      s"minHamming must be in [1, 48]: $minHamming")
    val w = org.apache.spark.sql.expressions.Window
      .partitionBy(col("media_id")).orderBy(col("frame_idx"))
    frameAHash(media, frameBytes, everyK)
      .select(col("media_id"), col("frame_idx"), col("ahash48"),
        lag(col("frame_idx"), 1).over(w).as("from_idx"),
        lag(col("ahash48"), 1).over(w).as("prev_hash"))
      .where(col("prev_hash").isNotNull)
      .select(col("media_id"), col("from_idx"), col("frame_idx").as("to_idx"),
        bit_count(col("ahash48").bitwiseXOR(col("prev_hash"))).cast("long").as("hamming"))
      .where(col("hamming") >= minHamming)
  }

  /** The `mapPartitions` form [[frameAHash]] replaced — kept (not dead
    * code) as the cross-checkable semantic reference: `Round11Spec`
    * asserts the codegen pipeline is row-identical to this on real
    * payloads plus the null/empty/short-frame edges.
    */
  private[graft] def frameAHashRdd(media: DataFrame, frameBytes: Int, everyK: Int): DataFrame = {
    require(frameBytes > 0 && everyK > 0, "frameBytes and everyK must be positive")
    val spark = media.sparkSession
    val outSchema = StructType(Seq(
      StructField("media_id", LongType, nullable = false),
      StructField("frame_idx", LongType, nullable = false),
      StructField("fid", LongType, nullable = false),
      StructField("ahash48", LongType, nullable = false)
    ))
    val rdd = media.select(col("media_id"), col("payload")).rdd.mapPartitions { rows =>
      rows.flatMap { r =>
        val id = r.getLong(0)
        val bytes = if (r.isNullAt(1)) Array.empty[Byte] else r.getAs[Array[Byte]](1)
        val nFrames = (bytes.length + frameBytes - 1) / frameBytes
        require(nFrames < (1 << 20), s"media $id: $nFrames frames exceeds the 2^20 fid budget")
        (0 until nFrames).iterator.collect {
          case f if f % everyK == 0 =>
            val lo = f * frameBytes
            val px = Array.tabulate(48) { j =>
              if (lo + j < bytes.length) bytes(lo + j) & 0xFF else 0
            }
            val mean = px.sum / 48
            var h = 0L
            var j = 0
            while (j < 48) {
              if (px(j) > mean) h |= 1L << j
              j += 1
            }
            Row(id, f.toLong, id * (1L << 20) + f, h)
        }
      }
    }
    spark.createDataFrame(rdd, outSchema)
  }

  /** Overlapping audio analysis windows — the STFT framing shape
    * (win/hop in milliseconds over a PCM byte stream): one output row
    * per FULL window (`windowBytes = winMs·sampleRate·bytesPerSample /
    * 1000`, stride `hopBytes` likewise; both must divide exactly —
    * fractional-byte windows are a config error, loudly). Emitted per
    * window: index, start byte, 48-bit content hash, and the byte-sum
    * `energy` (the exact-integer stand-in for RMS — a real pipeline
    * decodes samples and computes float energy here; the container
    * ships no codecs, same stub discipline as [[fakeDecodeFeatures]]).
    * Rows with `meta.kind != 'audio'` are ignored — the modality
    * metadata is the dispatch, which is the point of carrying it.
    *
    * The 1→N explosion runs in `mapPartitions` (a real resampler/DSP
    * frontend initializes once per partition); overlap means the output
    * is `win/hop ×` the payload bytes — the factor is explicit in the
    * parameters, the same honest-blowup contract as sliding windows.
    */
  def audioWindows(
      media: DataFrame,
      sampleRate: Int,
      bytesPerSample: Int,
      winMs: Int,
      hopMs: Int
  ): DataFrame = {
    require(sampleRate > 0 && bytesPerSample > 0 && winMs > 0 && hopMs > 0,
      "audio window parameters must be positive")
    def bytesOf(ms: Int, what: String): Int = {
      val num = ms.toLong * sampleRate * bytesPerSample
      require(num % 1000 == 0,
        s"$what of ${ms}ms at ${sampleRate}Hz x $bytesPerSample B/sample is not a whole byte count")
      val b = num / 1000
      require(b > 0 && b <= Int.MaxValue, s"$what byte size out of range: $b")
      b.toInt
    }
    val winBytes = bytesOf(winMs, "window")
    val hopBytes = bytesOf(hopMs, "hop")
    val spark = media.sparkSession
    val outSchema = StructType(Seq(
      StructField("media_id", LongType, nullable = false),
      StructField("window_idx", LongType, nullable = false),
      StructField("start_byte", LongType, nullable = false),
      StructField("window_hash", LongType, nullable = false),
      StructField("energy", LongType, nullable = false)
    ))
    val rdd = media
      .where(col("meta.kind") === "audio")
      .select(col("media_id"), col("payload")).rdd.mapPartitions { rows =>
        val md = java.security.MessageDigest.getInstance("MD5")
        rows.flatMap { r =>
          val id = r.getLong(0)
          val bytes = if (r.isNullAt(1)) Array.empty[Byte] else r.getAs[Array[Byte]](1)
          val nWin =
            if (bytes.length < winBytes) 0
            else (bytes.length - winBytes) / hopBytes + 1
          (0 until nWin).iterator.map { w =>
            val lo = w * hopBytes
            md.reset()
            md.update(bytes, lo, winBytes)
            var e = 0L
            var i = lo
            while (i < lo + winBytes) { e += (bytes(i) & 0xff); i += 1 }
            Row(id, w.toLong, lo.toLong, graft.plans.Hash48F.first48(md.digest()), e)
          }
        }
      }
    spark.createDataFrame(rdd, outSchema)
  }

  /** Resize stub: decimate the payload by keeping every `factor`-th byte —
    * the deterministic stand-in for an image/audio downsample (a real
    * implementation calls the codec's scaler here; the Spark-side contract
    * — binary in, smaller binary out, metadata updated — is what's real).
    */
  def resizeStub(media: DataFrame, factor: Int): DataFrame = {
    require(factor > 0, "resize factor must be positive")
    val spark = media.sparkSession
    val rdd = media.select(col("media_id"), col("payload"), col("meta.kind"), col("meta.source"))
      .rdd.mapPartitions { rows =>
        rows.map { r =>
          if (r.isNullAt(1)) {
            // missing media stays missing — an empty binary would assert a
            // real 0-byte object and hide the row from payload.isNull
            Row(r.getLong(0), null, Row(r.getString(2), 0L, r.getString(3)))
          } else {
            val bytes = r.getAs[Array[Byte]](1)
            val out = Array.tabulate((bytes.length + factor - 1) / factor)(i => bytes(i * factor))
            Row(r.getLong(0), out, Row(r.getString(2), out.length.toLong, r.getString(3)))
          }
        }
      }
    spark.createDataFrame(rdd, mediaSchema)
  }
}
