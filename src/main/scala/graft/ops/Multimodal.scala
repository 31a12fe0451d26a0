package graft.ops

import org.apache.spark.sql.{DataFrame, Dataset, SparkSession}
import org.apache.spark.sql.functions._

import graft.Tables

/** Multimodal-column plumbing: image/audio/video as opaque `binary` columns
  * with typed metadata, processed partition-wise.
  *
  * The actual codecs (JPEG decode, resampling, frame extraction) are NOT on
  * this classpath — each `decode*` body below is a clearly-marked
  * DETERMINISTIC STUB that fabricates plausible outputs from the payload
  * bytes. Everything around the stub is real and load-bearing: the binary
  * schema, the `Dataset[T]`/`mapPartitions` batch shape (one iterator per
  * partition — the Scala twin of `mapInPandas`: amortize per-batch codec
  * init across rows, never collect to the driver), and the
  * partitioning/pruning behavior.
  *
  * Scale notes: payloads dominate row size, so ops project metadata-only
  * columns wherever the payload isn't needed (column pruning keeps the
  * binary out of the scan). Feature extraction emits fixed-width
  * Array[Float] — the shape the SimilarityOps ANN path consumes.
  */
object Multimodal {

  /** A media row: opaque payload + typed metadata. */
  case class MediaRecord(
      media_id: Long, kind: String, fmt: String, payload: Array[Byte])

  /** Decoded-image metadata (stub output). */
  case class ImageInfo(
      media_id: Long, width: Int, height: Int, n_channels: Int, n_bytes: Long)

  /** Extracted feature vector. */
  case class MediaFeature(media_id: Long, feature: Array[Float])

  /** Fabricate a media table from `documents`: payload = utf-8 text bytes,
    * kind/fmt derived deterministically. Stands in for a real media scan
    * (parquet with a binary column) — same schema, same pruning behavior.
    */
  def mediaTable(s: SparkSession, d: String): Dataset[MediaRecord] = {
    import s.implicits._
    Tables.documents(s, d)
      .select(col("doc_id").as("media_id"),
        element_at(array(lit("image"), lit("audio"), lit("video")),
          (pmod(col("doc_id"), lit(3)) + 1).cast("int")).as("kind"),
        element_at(array(lit("jpeg"), lit("wav"), lit("mp4")),
          (pmod(col("doc_id"), lit(3)) + 1).cast("int")).as("fmt"),
        encode(col("text"), "UTF-8").as("payload"))
      .as[MediaRecord]
  }

  /** "Decode" images partition-wise. STUB: a real implementation hands each
    * partition's payloads to a codec (e.g. libjpeg via JNI) inside this
    * same mapPartitions; here dimensions are fabricated from byte content,
    * deterministically. The iterator-in/iterator-out shape is the real
    * contract: one codec context per partition, streaming, no
    * driver-side materialization.
    */
  def decodeImages(media: Dataset[MediaRecord]): Dataset[ImageInfo] = {
    import media.sparkSession.implicits._
    media.filter(_.kind == "image").mapPartitions { it =>
      // [real codec init would go here, once per partition]
      it.map { m =>
        val n = m.payload.length
        val h = byteFold(m.payload)
        ImageInfo(m.media_id,
          width = 64 + (h % 1024).toInt,
          height = 64 + ((h >>> 10) % 1024).toInt,
          n_channels = 3,
          n_bytes = n.toLong)
      }
    }
  }

  /** Raw per-media feature histogram: payload bytes folded into `dim`
    * integer buckets (bucket = byte % dim). The un-normalized integer stage
    * of [[extractFeatures]] — exposed separately because integer counts are
    * engine-reproducible bit-for-bit (the driver gate hashes them against a
    * DuckDB twin), while the normalized floats are only comparable up to
    * rounding.
    */
  case class MediaHistogram(media_id: Long, hist: Array[Long])

  def rawHistogram(media: Dataset[MediaRecord], dim: Int = 64): Dataset[MediaHistogram] = {
    import media.sparkSession.implicits._
    media.mapPartitions { it =>
      // [real encoder batch-init would go here, once per partition]
      it.map { m =>
        val acc = new Array[Long](dim)
        var i = 0
        while (i < m.payload.length) {
          acc((m.payload(i) & 0xFF) % dim) += 1L
          i += 1
        }
        MediaHistogram(m.media_id, acc)
      }
    }
  }

  /** Fixed-width feature extraction for any media kind. STUB embedding:
    * [[rawHistogram]] L2-normalized to float — deterministic, fixed-width,
    * the schema a real vision/audio encoder would emit. Output feeds
    * SimilarityOps (ANN over Array[Float]).
    */
  def extractFeatures(media: Dataset[MediaRecord], dim: Int = 64): Dataset[MediaFeature] = {
    import media.sparkSession.implicits._
    rawHistogram(media, dim).map { mh =>
      val acc = mh.hist.map(_.toFloat)
      val nrm = math.sqrt(acc.foldLeft(0.0)((s, v) => s + v * v)).toFloat
      val out = if (nrm > 0) acc.map(_ / nrm) else acc
      MediaFeature(mh.media_id, out)
    }
  }

  /** Gate-facing twin of [[extractFeatures]]: the feature content exploded
    * to hash-comparable scalars (media_id, pos, cnt), integer-exact so any
    * SQL engine reproduces it. Zero buckets dropped (the counts that remain
    * sum to the payload length, which pins them). The normalized float view
    * stays available as the typed [[extractFeatures]] API for the ANN path.
    */
  def featureHistogram(s: SparkSession, d: String, dim: Int = 64): DataFrame = {
    rawHistogram(mediaTable(s, d), dim).toDF()
      .select(col("media_id"), posexplode(col("hist")))
      .filter(col("col") > 0)
      .select(col("media_id"), col("pos"), col("col").as("cnt"))
      .orderBy("media_id", "pos")
  }

  /** Frame sampling for video payloads: every `stride`-th 256-byte block
    * stands in for a frame. STUB for codec frame extraction; emits
    * (media_id, frame_idx, frame_bytes) — the explode shape real
    * frame-sampling produces.
    */
  def sampleFrames(media: Dataset[MediaRecord], stride: Int = 4): DataFrame = {
    import media.sparkSession.implicits._
    media.filter(_.kind == "video").flatMap { m =>
      frameSlices(m.payload, stride).map { case (f, from, until) =>
        (m.media_id, f, java.util.Arrays.copyOfRange(m.payload, from, until))
      }
    }.toDF("media_id", "frame_idx", "frame_bytes")
  }

  /** Gate-comparable view of [[sampleFrames]]: the frame payload is folded
    * to (frame_len, checksum) scalars — a binary column cannot be
    * hash-compared by the driver gate — and the checksum folds the actual
    * sliced bytes ([[byteFold]]), so the oracle verifies the slice content,
    * not just its shape. The typed frame-bytes API above stays for callers
    * that feed frames onward (decode, feature extraction).
    */
  def sampleFrameStats(media: Dataset[MediaRecord], stride: Int = 4)
      : DataFrame = {
    import media.sparkSession.implicits._
    media.filter(_.kind == "video").flatMap { m =>
      frameSlices(m.payload, stride).map { case (f, from, until) =>
        (m.media_id, f, (until - from).toLong,
          byteFold(java.util.Arrays.copyOfRange(m.payload, from, until)))
      }
    }.toDF("media_id", "frame_idx", "frame_len", "checksum")
  }

  /** (frame_idx, from, until) byte ranges for the stub frame sampler. */
  private def frameSlices(payload: Array[Byte], stride: Int)
      : Seq[(Long, Int, Int)] = {
    val frameSize = 256
    val nFrames = math.max(1, payload.length / frameSize)
    (0 until nFrames by stride).map { f =>
      val from = f * frameSize
      (f.toLong, from, math.min(payload.length, from + frameSize))
    }
  }

  /** Resized-image record (stub): nearest-neighbor byte resample. */
  case class ResizedImage(media_id: Long, src_bytes: Long, out_w: Int,
      out_h: Int, out_bytes: Long, checksum: Long)

  /** "Resize" images partition-wise. STUB for the codec scaler: the
    * resized payload is a nearest-neighbor resample of the source bytes
    * onto an outW×outH single-channel grid (out[j] = src[⌊j·n/target⌋]) —
    * deterministic byte arithmetic standing in for real interpolation,
    * with the same iterator contract (scaler init once per partition, no
    * driver materialization). `checksum` folds the actual resampled bytes
    * ([[byteFold]]) so the oracle verifies the resample, not just shapes.
    * Empty payloads are dropped (nothing to sample).
    */
  def resizeImages(media: Dataset[MediaRecord], outW: Int = 32,
      outH: Int = 32): Dataset[ResizedImage] = {
    import media.sparkSession.implicits._
    media.filter(m => m.kind == "image" && m.payload.nonEmpty)
      .mapPartitions { it =>
        // [real scaler context would init here, once per partition]
        it.map { m =>
          val n = m.payload.length
          val target = outW * outH
          val out = new Array[Byte](target)
          var j = 0
          while (j < target) {
            out(j) = m.payload(((j.toLong * n) / target).toInt)
            j += 1
          }
          ResizedImage(m.media_id, n.toLong, outW, outH, target.toLong,
            byteFold(out))
        }
      }
  }

  /** Metadata-only media stats — written so the parquet scan never touches
    * the payload column (length carried in metadata at write time; here
    * recomputed via the decoded info to keep the fixture simple).
    */
  def mediaStats(s: SparkSession, d: String): DataFrame = {
    val media = mediaTable(s, d)
    media.toDF()
      .select(col("media_id"), col("kind"), col("fmt"),
        length(col("payload")).cast("long").as("n_bytes"))
      .groupBy("kind", "fmt")
      .agg(count(lit(1)).as("n_media"), sum("n_bytes").as("total_bytes"))
      .orderBy("kind", "fmt")
  }

  /** Per-kind payload-size quantile profile — the media sizing page
    * batch shaping reads before decode: exact p25/p50/p75/p95 of the
    * blob byte length per media kind (a long-tailed p95 forces smaller
    * decode batches; a drifting p50 flags an upstream format change).
    * [[mediaStats]]' sums say how much; this says how it's SHAPED.
    *
    * Exactness: byte lengths are integers and the quantiles are ONE
    * partial-merged [[graft.functions.ExactQuantiles]] count-map per
    * kind (exact order statistics, the integer rank rule — no
    * interpolation). Scale: one scan that reads ONLY the length (the
    * binary column prunes away), then a |kinds|-bounded aggregate whose
    * shuffled state is count-map partials, state ∝ distinct lengths.
    */
  def sizeQuantiles(s: SparkSession, d: String): DataFrame = {
    import graft.functions.ExactQuantiles.exactQuantiles
    mediaTable(s, d).toDF()
      .select(col("kind"), length(col("payload")).cast("long").as("nb"))
      .groupBy("kind")
      .agg(count(lit(1)).as("n_media"),
        exactQuantiles(col("nb").cast("double"), Seq(25, 50, 75, 95), 100)
          .as("qs"))
      .select(col("kind"), col("n_media"),
        col("qs").getItem(0).cast("long").as("p25_bytes"),
        col("qs").getItem(1).cast("long").as("p50_bytes"),
        col("qs").getItem(2).cast("long").as("p75_bytes"),
        col("qs").getItem(3).cast("long").as("p95_bytes"))
      .orderBy("kind")
  }

  /** Perceptual-hash image fingerprint (pHash shape). STUB decode: payload
    * bytes fold into an 8×8 "luma grid" — cell c accumulates the bytes at
    * positions ≡ c (mod 64); a real implementation decodes, resizes to 8×8
    * and DCTs inside this same mapPartitions. Bit c is set iff the cell
    * clears the grid mean, integer cross-multiplied (cell·64 > total) so
    * no float mean decides a bit. 8 bytes of dedup state per image — the
    * image twin of [[graft.ops.DedupOps.simhash]].
    */
  def imagePhash(media: Dataset[MediaRecord]): DataFrame = {
    import media.sparkSession.implicits._
    media.filter(_.kind == "image").mapPartitions { it =>
      // [real codec init would go here, once per partition]
      it.map { m =>
        val cells = new Array[Long](64)
        var i = 0
        while (i < m.payload.length) {
          cells(i % 64) += (m.payload(i) & 0xFFL)
          i += 1
        }
        var total = 0L
        var c = 0
        while (c < 64) { total += cells(c); c += 1 }
        var hash = 0L
        c = 0
        while (c < 64) {
          if (cells(c) * 64 > total) hash |= (1L << c)
          c += 1
        }
        (m.media_id, hash)
      }
    }.toDF("media_id", "phash")
  }

  /** Gate-facing [[imagePhash]] over the fixture media table. */
  def phash(s: SparkSession, d: String): DataFrame =
    imagePhash(mediaTable(s, d)).orderBy("media_id")

  /** Near-duplicate image pairs: band the 64-bit perceptual hash into
    * 4×16-bit chunks (pigeonhole: Hamming ≤ 3 ⇒ at least one equal chunk),
    * bucket-join, verify `bit_count(a^b) <= maxHamming` — the same
    * scale-safe shape as [[graft.ops.DedupOps.simhashPairs]]: candidates
    * scale with near-dup density, never corpus². Both self-join sides
    * recompute the narrow zero-shuffle fingerprint scan; at 100 TB the
    * durable form is a materialized (media_id, phash) parquet table.
    */
  def phashPairs(s: SparkSession, d: String, maxHamming: Int = 3): DataFrame =
    phashPairsFrom(imagePhash(mediaTable(s, d)), maxHamming)

  /** [[phashPairs]] core over an explicit (media_id, phash) frame — the
    * Sf1BandingSpec measurement hook (candidate growth at 10×).
    */
  private[graft] def phashPairsFrom(fp: DataFrame,
      maxHamming: Int = 3): DataFrame = {
    def banded(df: DataFrame) = df
      .select(col("media_id"), col("phash"),
        posexplode(array((0 until 4).map(b =>
          shiftright(col("phash"), b * 16).bitwiseAND(0xFFFFL)): _*)))
      .withColumnsRenamed(Map("pos" -> "band", "col" -> "chunk"))
    banded(fp).as("x").join(banded(fp).as("y"), Seq("band", "chunk"))
      .filter(col("x.media_id") < col("y.media_id"))
      .select(col("x.media_id").as("media_a"),
        col("y.media_id").as("media_b"),
        bit_count(col("x.phash").bitwiseXOR(col("y.phash"))).as("hamming"))
      .distinct()
      .filter(col("hamming") <= maxHamming)
      .orderBy("media_a", "media_b")
  }

  /** DISTINCT banded candidate-pair count (pre-Hamming-verify) for an
    * arbitrary (media_id, phash) frame — what the 10× banding audit
    * measures: the quantity that must stay ~linear for the banded join
    * to survive scale.
    */
  private[graft] def phashBandCandidates(fp: DataFrame): Long = {
    def banded(df: DataFrame) = df
      .select(col("media_id"),
        posexplode(array((0 until 4).map(b =>
          shiftright(col("phash"), b * 16).bitwiseAND(0xFFFFL)): _*)))
      .withColumnsRenamed(Map("pos" -> "band", "col" -> "chunk"))
    banded(fp).as("x").join(banded(fp).as("y"), Seq("band", "chunk"))
      .filter(col("x.media_id") < col("y.media_id"))
      .select(col("x.media_id"), col("y.media_id"))
      .distinct().count()
  }

  /** Audio frame energy + silence profile. STUB decode: payload bytes
    * read as signed 8-bit PCM; a real implementation decodes the codec
    * to PCM inside this same mapPartitions. Per `frameLen`-sample frame:
    * energy = Σ sample² (integer — bit-stable on any engine). A frame is
    * silent iff its MEAN square is below `silenceFloor`, integer
    * cross-multiplied (energy < floor·n) so no float division decides
    * membership. Emits one row per media: frame counts, silent-frame
    * count, total energy — the signals an ASR-corpus silence/quality
    * filter cuts on. Zero shuffle except the presentation sort.
    */
  def audioEnergy(media: Dataset[MediaRecord], frameLen: Int = 256,
      silenceFloor: Long = 9600L): DataFrame = {
    import media.sparkSession.implicits._
    media.filter(_.kind == "audio").mapPartitions { it =>
      // [real codec init would go here, once per partition]
      it.map { m =>
        val p = m.payload
        val nFrames = (p.length + frameLen - 1) / frameLen
        var silent = 0L
        var total = 0L
        var f = 0
        while (f < nFrames) {
          val start = f * frameLen
          val end = math.min(start + frameLen, p.length)
          var e = 0L
          var i = start
          while (i < end) { val s = p(i).toLong; e += s * s; i += 1 }
          total += e
          if (e < silenceFloor * (end - start)) silent += 1
          f += 1
        }
        (m.media_id, nFrames.toLong, silent, total)
      }
    }.toDF("media_id", "n_frames", "n_silent", "total_energy")
      .orderBy("media_id")
  }

  /** Gate-facing [[audioEnergy]] over the fixture media table. */
  def audioStats(s: SparkSession, d: String): DataFrame =
    audioEnergy(mediaTable(s, d))

  /** Image near-dup clusters: connected components over [[phashPairs]]
    * (min-id labels, pointer-jumping fixpoint — see
    * [[graft.ops.DedupOps.connectedComponents]]), rolled up to one row per
    * cluster. Composition proof that the dedup decision layer is
    * modality-agnostic: the same CC operator consumes text shingle pairs
    * and image perceptual-hash pairs unchanged.
    */
  def phashClusters(s: SparkSession, d: String): DataFrame =
    graft.ops.DedupOps.connectedComponents(
        phashPairs(s, d).select(col("media_a").as("doc_a"),
          col("media_b").as("doc_b")))
      .groupBy("cluster_id")
      .agg(count(lit(1)).as("n_members"),
        concat_ws(",", transform(sort_array(collect_list(col("doc_id"))),
          _.cast("string"))).as("members"))
      .orderBy("cluster_id")

  /** Per-frame intensity stats at stride 1 for [[sceneDetect]] — same
    * iterator contract and frame slicing as [[sampleFrameStats]], but
    * emitting the exact byte SUM (the stub for a decoded frame's mean
    * luma) instead of the fold checksum.
    */
  private[graft] def sceneFrameStats(media: Dataset[MediaRecord])
      : DataFrame = {
    import media.sparkSession.implicits._
    media.filter(_.kind == "video").flatMap { m =>
      frameSlices(m.payload, 1).map { case (f, from, until) =>
        var sum = 0L
        var i = from
        while (i < until) { sum += (m.payload(i) & 0xFF); i += 1 }
        (m.media_id, f, (until - from).toLong, sum)
      }
    }.toDF("media_id", "frame_idx", "frame_len", "byte_sum")
  }

  /** Shot/scene-boundary detection — the classic adjacent-frame
    * intensity-delta cut detector (the mean-luma special case of
    * pixel-difference shot detection, cf. Boreczky & Rowe 1996,
    * "Comparison of video shot boundary detection techniques"): a cut
    * is declared where |mean_luma(f) − mean_luma(f−1)| > threshold,
    * and every video's first frame opens a scene. STUB boundary is the
    * decode only (mean luma ≙ mean payload byte, same substitution as
    * every codec stub here); the slicing, per-partition streaming, and
    * the detector algebra are real.
    *
    * Exactness: byte sums and lengths are exact integers; each luma is
    * ONE division, the delta ONE subtraction — correctly-rounded IEEE
    * ops on identical inputs, so flags and values are engine-exact.
    *
    * Scale shape: frames stream out of `mapPartitions` (no driver
    * materialization); the lag window partitions by media_id — state
    * is one video's frame list, never a global sort.
    */
  def sceneDetect(s: SparkSession, d: String,
      threshold: Double = 1.0): DataFrame = {
    val w = org.apache.spark.sql.expressions.Window
      .partitionBy("media_id").orderBy("frame_idx")
    sceneFrameStats(mediaTable(s, d))
      .withColumn("luma",
        col("byte_sum").cast("double") / col("frame_len").cast("double"))
      .withColumn("delta", abs(col("luma") - lag(col("luma"), 1).over(w)))
      .withColumn("is_cut", coalesce(col("delta") > threshold, lit(true)))
      .select(col("media_id"), col("frame_idx"), col("luma"),
        col("delta"), col("is_cut"))
      .orderBy("media_id", "frame_idx")
  }

  private def byteFold(b: Array[Byte]): Long = {
    var h = 1125899906842597L
    var i = 0
    while (i < b.length) { h = 31 * h + (b(i) & 0xFF); i += 1 }
    h & Long.MaxValue
  }
}
