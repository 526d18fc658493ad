package graft.multimodal

import org.apache.spark.sql.{DataFrame, Dataset, SparkSession}
import org.apache.spark.sql.functions._

import graft.queries.GraftQuery
import graft.sources.Tables

/** Multimodal-column plumbing: image/audio/video payloads ride through
  * the engine as opaque `binary` columns with typed metadata, and
  * decode / feature-extract / frame-sample run as distributed
  * per-partition transforms.
  *
  * The container has no codec libraries, so `decodeStub` is a clearly
  * marked deterministic fake — but everything around it (schema, batch
  * shape, partition-local iteration, frame-offset math) is the real
  * plumbing a codec would plug into: swap `decodeStub`'s body for a
  * JNI/codec call and nothing else changes.
  */
object Multimodal {

  /** An opaque media payload + typed metadata. */
  case class MediaRecord(media_id: Long, payload: Array[Byte], format: String, meta_len: Long)

  /** Output of the (stubbed) decoder. */
  case class DecodedMedia(media_id: Long, width: Int, height: Int, n_bytes: Long, checksum: Long)

  /** STUB — a real implementation calls an image/audio codec here
    * (e.g. libjpeg / ffmpeg via JNI). The container lacks those libs,
    * so we derive deterministic fake dimensions from the payload. The
    * signature and batch shape are the real contract.
    */
  def decodeStub(rec: MediaRecord): DecodedMedia = {
    val bytes = rec.payload
    val checksum = bytes.foldLeft(0L)((acc, b) => (acc * 31 + (b & 0xff)) % 1000000007L)
    DecodedMedia(
      media_id = rec.media_id,
      width = 64 + (checksum % 1024).toInt,
      height = 64 + ((checksum / 1024) % 1024).toInt,
      n_bytes = bytes.length.toLong,
      checksum = checksum)
  }

  /** Frame-sample offsets (1-based): every `stride` bytes, up to
    * `maxFrames`, as long as a full `frameSize` fits.
    */
  def frameOffsets(payloadLen: Long, frameSize: Int, stride: Int, maxFrames: Int): Seq[Long] =
    (0 until maxFrames).map(k => 1L + k.toLong * stride)
      .filter(_ + frameSize - 1 <= payloadLen)

  /** Documents re-materialized as media records (payload = UTF-8 bytes
    * of the text — a stand-in blob with realistic size distribution).
    */
  def mediaFromDocuments(spark: SparkSession, dir: String): Dataset[MediaRecord] = {
    import spark.implicits._
    Tables.documents(spark, dir)
      .select(
        col("doc_id").as("media_id"),
        encode(col("text"), "UTF-8").as("payload"),
        col("lang").as("format"),
        col("n_chars").cast("long").as("meta_len"))
      .as[MediaRecord]
  }

  /** Distributed decode: partition-local iterator transform — the Scala
    * analogue of a vectorized decode UDF. No data ever concentrates on
    * the driver; each partition decodes its own slice.
    */
  def decodeAll(ds: Dataset[MediaRecord]): Dataset[DecodedMedia] = {
    import ds.sparkSession.implicits._
    ds.mapPartitions(_.map(decodeStub))
  }

  /** STUB resize — a real implementation calls the codec's scaler
    * (e.g. libswscale). The deterministic fake keeps every `factor`-th
    * payload byte: the output payload shrinks by ~factor while all
    * metadata rides along unchanged. (Dimensions are not stored on
    * [[MediaRecord]] — decode derives fake dimensions from the payload
    * checksum, so post-resize dimensions are whatever the thinned
    * payload hashes to, with no factor relationship.)
    */
  def resizeStub(rec: MediaRecord, factor: Int): MediaRecord = {
    require(factor >= 1, s"resize factor must be >= 1, got $factor")
    val resized = rec.payload.zipWithIndex.collect {
      case (b, i) if i % factor == 0 => b
    }
    rec.copy(payload = resized)
  }

  /** Distributed resize: partition-local, one codec-scaler call per
    * record (batch with [[batched]] when the scaler amortizes setup).
    */
  def resizeAll(ds: Dataset[MediaRecord], factor: Int): Dataset[MediaRecord] = {
    import ds.sparkSession.implicits._
    ds.mapPartitions(_.map(resizeStub(_, factor)))
  }

  /** Batch a partition-local iterator into fixed-size record groups —
    * the exact shape an Arrow-batched decode UDF receives (PySpark's
    * `mapInPandas` / a JNI codec that amortizes per-call setup over a
    * batch). Exposed separately so the batch contract is testable:
    * every batch except the last has exactly `batchSize` records, order
    * is preserved, and results are independent of where batch
    * boundaries fall.
    */
  def batched[T](it: Iterator[T], batchSize: Int): Iterator[Seq[T]] =
    it.grouped(batchSize)

  /** Batched decode: one stub-codec call PER BATCH (the real codec
    * would pin buffers / set up the decoder once per batch, not per
    * record). Identical output to [[decodeAll]] — batch boundaries are
    * an execution detail, never a semantic one.
    */
  def decodeAllBatched(ds: Dataset[MediaRecord], batchSize: Int = 64): Dataset[DecodedMedia] = {
    import ds.sparkSession.implicits._
    ds.mapPartitions { it =>
      batched(it, batchSize).flatMap { batch =>
        // per-batch setup would live here (decoder init, buffer pool)
        batch.map(decodeStub)
      }
    }
  }

  // ------------------------------------------------- real in-engine codec
  /** A decoded PPM-subset image — the output of [[parsePpm]]. */
  final case class PpmDecoded(media_id: Long, width: Long, height: Long,
      maxval: Long, n_body: Long, byte_sum: Long, body_md5: String)

  /** REAL byte-level decode of the binary-PPM (P6) container: verify
    * the magic bytes, parse the three ASCII header integers
    * (width/height/maxval), require the single whitespace terminator,
    * then walk the raw body computing length, byte sum and digest —
    * the same parse a libnetpbm-style loader performs. This replaces
    * the earlier checksum stub on the decode path: malformed payloads
    * (wrong magic, truncated body, missing terminator) are REJECTED,
    * not hashed — proven on handcrafted payloads in PipelineOpsSpec.
    */
  def parsePpm(mediaId: Long, payload: Array[Byte]): PpmDecoded = {
    require(payload.length >= 2 && payload(0) == 'P' && payload(1) == '6',
      s"media $mediaId: bad magic")
    var i = 2
    def readInt(): Long = {
      while (i < payload.length && (payload(i) == ' ' || payload(i) == '\n')) i += 1
      var v = 0L
      val start = i
      while (i < payload.length && payload(i) >= '0' && payload(i) <= '9') {
        v = v * 10 + (payload(i) - '0'); i += 1
      }
      require(i > start, s"media $mediaId: expected ASCII integer in header")
      v
    }
    val w = readInt(); val h = readInt(); val mv = readInt()
    require(i < payload.length && payload(i) == '\n',
      s"media $mediaId: missing header terminator")
    i += 1
    val body = java.util.Arrays.copyOfRange(payload, i, payload.length)
    require(body.length == w * h * 3,
      s"media $mediaId: body ${body.length} bytes, header promises ${w * h * 3}")
    var sum = 0L
    var j = 0
    while (j < body.length) { sum += body(j) & 0xff; j += 1 }
    val md = java.security.MessageDigest.getInstance("MD5").digest(body)
    PpmDecoded(mediaId, w, h, mv, body.length.toLong, sum,
      md.map("%02x".format(_)).mkString)
  }

  // ------------------------------------------------------------ queries
  /** Payload-level features via pure column expressions (byte length,
    * content digest, head digest) — the part of the multimodal path
    * that stays inside whole-stage codegen.
    */
  private def multimodalFeatures(spark: SparkSession, dir: String): DataFrame = {
    Tables.documents(spark, dir)
      .withColumn("payload", encode(col("text"), "UTF-8"))
      .select(
        col("doc_id"),
        length(col("payload")).cast("long").as("byte_len"),
        md5(col("payload")).as("payload_md5"),
        md5(encode(substring(col("text"), 1, 16), "UTF-8")).as("head_md5"))
  }

  private val featuresOracle =
    """SELECT doc_id, CAST(strlen(text) AS BIGINT) AS byte_len,
      |       md5(text) AS payload_md5, md5(substr(text, 1, 16)) AS head_md5
      |FROM documents""".stripMargin

  /** Frame sampling as a relational plan: explode deterministic frame
    * offsets (32-byte frame every 64 bytes, max 8), digest each frame.
    * This is the shape video frame-extraction takes — offsets from
    * metadata, per-frame work distributed by the explode.
    */
  private def multimodalFrames(spark: SparkSession, dir: String): DataFrame = {
    Tables.documents(spark, dir)
      .select(col("doc_id"), col("text"), explode(sequence(lit(0), lit(7))).as("k"))
      .withColumn("off", lit(1) + col("k") * 64)
      .filter(col("off") + 31 <= length(col("text")))
      .select(
        col("doc_id"),
        col("k").cast("long").as("frame_idx"),
        md5(encode(expr("substring(text, off, 32)"), "UTF-8")).as("frame_md5"))
  }

  private val framesOracle =
    """SELECT doc_id, CAST(g.k AS BIGINT) AS frame_idx,
      |       md5(substr(text, 1 + g.k * 64, 32)) AS frame_md5
      |FROM documents CROSS JOIN generate_series(0, 7) g(k)
      |WHERE 1 + g.k * 64 + 31 <= length(text)""".stripMargin

  /** End-to-end encode→decode through the REAL codec: wrap each doc's
    * bytes in a binary-PPM container (8 pixels wide, height from the
    * byte budget, docs under one pixel row skipped — mirrored in the
    * oracle), then [[parsePpm]] executes the actual byte-level parse in
    * a partition-local transform. The oracle recomputes the expected
    * header fields and body digest from the source text, so a decoder
    * that shortcuts the parse (or a builder emitting a malformed
    * container) hash-mismatches.
    */
  private def multimodalDecode(spark: SparkSession, dir: String): DataFrame = {
    import spark.implicits._
    Tables.documents(spark, dir)
      .withColumn("h", expr("length(text) div 24"))
      .filter(col("h") >= 1)
      .withColumn("payload", concat(
        encode(concat(concat_ws(" ", lit("P6"), lit(8), col("h"), lit(255)),
          lit("\n")), "UTF-8"),
        encode(expr("substring(text, 1, CAST(h * 24 AS INT))"), "UTF-8")))
      .select(col("doc_id"), col("payload"))
      .as[(Long, Array[Byte])]
      .mapPartitions(_.map { case (id, p) => parsePpm(id, p) })
      .toDF()
  }

  private val decodeOracle =
    """WITH m AS (
      |  SELECT doc_id, strlen(text) // 24 AS h,
      |         substr(text, 1, (strlen(text) // 24) * 24) AS body
      |  FROM documents WHERE strlen(text) // 24 >= 1)
      |SELECT doc_id AS media_id, CAST(8 AS BIGINT) AS width,
      |       CAST(h AS BIGINT) AS height, CAST(255 AS BIGINT) AS maxval,
      |       CAST(strlen(body) AS BIGINT) AS n_body,
      |       CAST(list_aggregate(list_transform(range(1, strlen(body) + 1),
      |            i -> ord(substr(body, i, 1))), 'sum') AS BIGINT) AS byte_sum,
      |       md5(body) AS body_md5
      |FROM m""".stripMargin

  val queries: Seq[GraftQuery] = Seq(
    GraftQuery("multimodal_features", Some(featuresOracle), multimodalFeatures),
    GraftQuery("multimodal_frames", Some(framesOracle), multimodalFrames),
    GraftQuery("multimodal_decode", Some(decodeOracle), multimodalDecode),
  )
}
