package graft.operators

import org.apache.spark.sql.{Column, DataFrame, Dataset, SparkSession}
import org.apache.spark.sql.functions._

/** Typed multimodal column handling: media payloads ride as opaque
  * `binary` columns with a typed metadata struct; decode/feature-extract
  * runs partition-batched via `mapPartitions` (the Scala analog of
  * arrow-batched Python UDFs — one iterator per partition, no per-row
  * driver involvement, scales with executor count).
  *
  * The actual media decode is a STUB (`fakeDecode`): the environment has
  * no image/audio codecs, so the decode step is a deterministic fake over
  * the raw bytes. Everything around it — binary packing, schema,
  * partitioning, batch iteration, feature schema — is real and tested.
  */
object Multimodal {

  final case class MediaMeta(format: String, width: Int, height: Int, nFrames: Int)
  final case class MediaRecord(doc_id: Long, content: Array[Byte], meta: MediaMeta)
  final case class MediaFeatures(
      doc_id: Long,
      nBytes: Long,
      byteHistogram: Array[Long], // 16 buckets over byte values
      embedding: Array[Float]     // 8-dim fake content embedding
  )

  /** Pack text documents as a media table: content bytes + typed metadata
    * derived deterministically (stand-in for real image/audio ingest). */
  def packMedia(documents: DataFrame)(implicit spark: SparkSession): Dataset[MediaRecord] = {
    import spark.implicits._
    documents
      .select(
        col("doc_id"),
        encode(col("text"), "utf-8").as("content"),
        struct(
          lit("fake/raw").as("format"),
          (length(encode(col("text"), "utf-8")) % 640).cast("int").as("width"),
          ((length(encode(col("text"), "utf-8")) * 7) % 480).cast("int").as("height"),
          (length(encode(col("text"), "utf-8")) % 16 + 1).cast("int").as("nFrames")
        ).as("meta")
      )
      .as[MediaRecord]
  }

  /** STUB decode: a real implementation would hand `bytes` to a codec;
    * here we produce a deterministic fake so the distributed plumbing is
    * testable without media libraries. */
  private[operators] def fakeDecode(bytes: Array[Byte]): (Array[Long], Array[Float]) = {
    val hist = new Array[Long](16)
    var acc = 7L
    var i = 0
    while (i < bytes.length) {
      hist((bytes(i) & 0xff) >> 4) += 1
      acc = (acc * 31 + (bytes(i) & 0xff)) % 1000000007L
      i += 1
    }
    val emb = new Array[Float](8)
    var j = 0
    var h = acc
    while (j < 8) {
      h = (h * 1103515245L + 12345L) % 2147483648L
      emb(j) = (h.toDouble / 2147483648.0).toFloat - 0.5f
      j += 1
    }
    (hist, emb)
  }

  /** Partition-batched feature extraction: one `mapPartitions` pass, no
    * shuffle; at 100 TB this parallelizes over input splits. */
  def extractFeatures(media: Dataset[MediaRecord])(implicit spark: SparkSession): Dataset[MediaFeatures] = {
    import spark.implicits._
    media.mapPartitions { records =>
      records.map { r =>
        val (hist, emb) = fakeDecode(r.content)
        MediaFeatures(r.doc_id, r.content.length.toLong, hist, emb)
      }
    }
  }

  final case class Frame(doc_id: Long, frame_idx: Int, frame: Array[Byte])

  /** Frame sampling: treat the payload as `meta.nFrames` fixed-size frames
    * and emit every `everyN`-th one — the video-frame-sampling shape
    * (chunked slices of an opaque byte payload, exploded to one row per
    * kept frame). A real codec would replace the byte-slicing STUB; the
    * partition-batched explode is the scalable part. */
  def frameSample(media: Dataset[MediaRecord], everyN: Int)(implicit spark: SparkSession): Dataset[Frame] = {
    import spark.implicits._
    media.mapPartitions { records =>
      records.flatMap { r =>
        val n = math.max(r.meta.nFrames, 1)
        val size = math.max(r.content.length / n, 1)
        (0 until n by everyN).iterator.map { i =>
          val from = i * size
          val until = math.min(from + size, r.content.length)
          Frame(r.doc_id, i, r.content.slice(from, math.max(from, until)))
        }
      }
    }
  }

  /** 64-bit perceptual hash per media row
    * ([[graft.functions.BlockHashUtil]]'s block-mean law over the raw
    * payload bytes — the decode-free stand-in; a real deployment hashes
    * decoded luma with the identical downstream plan). One codegen'd
    * O(bytes) expression inside the scan projection: no shuffle, no
    * intermediate array, 8 output bytes per row. */
  def perceptualHashes(media: DataFrame, idCol: String, binCol: String): DataFrame = {
    graft.functions.BlockHashFunctions.ensureRegistered(media.sparkSession)
    media.select(col(idCol), expr(s"block_hash64($binCol)").as("phash"))
  }

  /** Real-decode hook: when a decoder exists upstream (a `mapInPandas`
    * / codec stage producing a grayscale plane), pass its output as a
    * pre-decoded `lumaCol` (binary) and the block-mean hash runs over
    * the LUMA bytes — the actual perceptual-hash definition — while
    * rows the decoder skipped (NULL luma) fall back to the raw payload,
    * so a partially-decoded corpus still hashes every row. Everything
    * downstream ([[perceptualNearDups]] banding, the streaming gate) is
    * byte-identical: same expression, same 8-byte signature, same
    * plan. */
  def perceptualHashes(media: DataFrame, idCol: String, binCol: String,
      lumaCol: String): DataFrame = {
    graft.functions.BlockHashFunctions.ensureRegistered(media.sparkSession)
    media.select(col(idCol),
      expr(s"block_hash64(coalesce($lumaCol, $binCol))").as("phash"))
  }

  /** Perceptual near-dup pairs within `maxHamming` bits of the 64-bit
    * [[perceptualHashes]] signature — image/video near-dup without a
    * codec, the binary-column twin of `Dedup.simhashHammingPairs`.
    *
    * Blocking: the signature splits into 8 byte-bands; by pigeonhole a
    * pair within Hamming ≤ 7 agrees on at least one whole band, so
    * candidate generation is an equi-join on (band, byte) with recall
    * 1.0 for `maxHamming <= 7` — never an all-pairs comparison, and the
    * guard refuses thresholds the blocking can't honor. Candidates are
    * verified exactly with `bit_count(xor)`. Like the SimHash form, the
    * band join runs on DISTINCT signatures (identical payloads collapse
    * to one node; each unordered doc pair emerges exactly once from its
    * ordered signature pair), so re-encoded template assets compress the
    * join instead of exploding it. Band extraction is an arithmetic
    * shift + 0xFF mask — sign-safe under two's complement in both
    * engines, so bit 0 (the sign bit) needs no special case. */
  def perceptualNearDups(media: DataFrame, idCol: String, binCol: String,
      maxHamming: Int = 7): DataFrame =
    perceptualNearDupsFromSigs(perceptualHashes(media, idCol, binCol),
      idCol, maxHamming)

  /** [[perceptualNearDups]] over the real-decode hook: signatures come
    * from [[perceptualHashes]]' luma overload, the pair plan is the
    * same code. */
  def perceptualNearDups(media: DataFrame, idCol: String, binCol: String,
      lumaCol: String, maxHamming: Int): DataFrame =
    perceptualNearDupsFromSigs(perceptualHashes(media, idCol, binCol, lumaCol),
      idCol, maxHamming)

  private def perceptualNearDupsFromSigs(sigs: DataFrame, idCol: String,
      maxHamming: Int): DataFrame = {
    require(maxHamming >= 0 && maxHamming <= 7,
      s"8-band blocking guarantees recall only for maxHamming in [0,7], got $maxHamming")
    val distinctSigs = sigs.select(col("phash").as("siga")).distinct()
    val bandBytes: Int => Column =
      b => shiftright(col("siga"), 8 * b).bitwiseAND(255)
    val keyed = distinctSigs.select(col("siga"),
      posexplode(array((0 until 8).map(bandBytes): _*)).as(Seq("band", "bb")))
    val sigPairs = keyed
      .join(keyed.select(col("siga").as("sigb"), col("band"), col("bb")),
        Seq("band", "bb"))
      .filter(col("siga") <= col("sigb")) // = keeps same-signature groups
      .select(col("siga"), col("sigb"),
        expr("CAST(bit_count(siga ^ sigb) AS BIGINT)").as("hamming"))
      .filter(col("hamming") <= maxHamming)
      .distinct() // signature-pair-sized, not doc-pair-sized
    val da = sigs.select(col(idCol).as("doc_a"), col("phash").as("siga"))
    val db = sigs.select(col(idCol).as("doc_b"), col("phash").as("sigb"))
    sigPairs.join(da, "siga").join(db, "sigb")
      .filter(col("siga") =!= col("sigb") || col("doc_a") < col("doc_b"))
      .select(least(col("doc_a"), col("doc_b")).as("doc_a"),
        greatest(col("doc_a"), col("doc_b")).as("doc_b"), col("hamming"))
  }

  /** Resize STUB: deterministic byte subsampling to a target "resolution"
    * (every `step`-th byte so the output has ~targetBytes = targetW ×
    * targetH / 256 bytes), with metadata updated to the target
    * dimensions — the image-resize shape without a codec.
    *
    * Pure Catalyst since round 14 (was `mapPartitions`): the kept
    * indices are `sequence(0, m-1)`; each kept byte is an O(1)
    * one-byte binary `substr` at `i·step`, hex-encoded (O(1) on one
    * byte — encoding inside the lambda keeps every per-element step
    * constant-time, where hex-ing the whole payload outside it would
    * be re-evaluated per element once CollapseProject inlines the
    * alias into the lambda); `array_join` reassembles the hex pairs
    * linearly and `unhex` restores bytes. Everything is codegen'd
    * builtins inside the scan projection — column pruning and
    * whole-stage codegen apply, and the operator composes with
    * filters/joins without an analysis barrier, which the old
    * `mapPartitions` (an opaque `SerializeFromObject` wall) blocked. */
  def resize(media: Dataset[MediaRecord], targetW: Int, targetH: Int)(implicit spark: SparkSession): Dataset[MediaRecord] = {
    import spark.implicits._
    val targetBytes = math.max(targetW * targetH / 256, 1)
    val len = length(col("content")) // byte length of the binary payload
    val step = greatest(floor(len / lit(targetBytes)).cast("int"), lit(1))
    // kept indices 0, step, 2·step, … < len  →  m = ⌊(len−1)/step⌋ + 1
    val m = (floor((len - 1) / step) + 1).cast("int")
    val resized = when(len === 0, col("content")).otherwise(
      unhex(array_join(
        transform(sequence(lit(0), m - 1), i =>
          hex(col("content").substr(i * step + 1, lit(1)))),
        "")))
    media.toDF().select(
      col("doc_id"),
      resized.as("content"),
      struct(
        col("meta.format").as("format"),
        lit(targetW).as("width"),
        lit(targetH).as("height"),
        col("meta.nFrames").as("nFrames")).as("meta")
    ).as[MediaRecord]
  }
}
