package graft.ops

import java.security.MessageDigest

import org.apache.spark.sql.{DataFrame, Dataset, SparkSession}
import org.apache.spark.sql.functions._
import graft.Tables

/** Multimodal-column plumbing for training-data pipelines: media
  * payloads ride as opaque `binary` columns next to typed metadata,
  * and decode/feature-extraction runs as a typed, batched
  * `mapPartitions` pass (the JVM analogue of an Arrow-batched
  * `mapInPandas` decode stage).
  *
  * The decode itself is a STUB — no image/audio codecs exist in this
  * environment — implemented as deterministic byte arithmetic
  * (length, md5 checksum, metadata-derived "resize"). Everything
  * around it is real and load-bearing: the binary schema, the typed
  * Encoders, the micro-batch shape (`grouped(decodeBatchSize)` ==
  * one vectorized decode call per batch), partition preservation,
  * and the frame-sampling explode. Swapping the stub body for a real
  * codec changes no plan shape.
  *
  * The `media` view derives deterministically from `documents`
  * (payload = utf-8 bytes of `text`), so every query here remains
  * DuckDB-oracle-checkable.
  */
object MultimodalOps {

  /** One media row: payload + declared (not decoded) metadata. */
  final case class MediaRow(
      media_id: Long,
      media_type: String,
      payload: Array[Byte],
      declared_w: Int,
      declared_h: Int)

  /** Decoded features (stub): byte stats + checksum + "resized" dims. */
  final case class MediaFeatures(
      media_id: Long,
      media_type: String,
      n_bytes: Long,
      checksum: String,
      out_w: Int,
      out_h: Int)

  val decodeBatchSize = 32
  val targetSize = 224 // fake "resize to model input" edge

  /** The media table: documents re-typed as binary payloads with
    * metadata. media_type cycles image/audio/video on doc_id; the
    * declared dims derive from n_chars (metadata travels with the
    * payload, as a real ingest would carry container headers). */
  def media(s: SparkSession, dir: String): Dataset[MediaRow] = {
    import s.implicits._
    Tables.documents(s, dir)
      .select(
        $"doc_id".as("media_id"),
        element_at(array(lit("image"), lit("audio"), lit("video")),
          ($"doc_id" % 3).cast("int") + 1).as("media_type"),
        $"text".cast("binary").as("payload"),
        (lit(64) + pmod($"n_chars", lit(512))).cast("int").as("declared_w"),
        (lit(64) + pmod($"n_chars" * 7, lit(512))).cast("int").as("declared_h"))
      .as[MediaRow]
  }

  /** The batched decode pass. Each `grouped` slice models one
    * vectorized decoder invocation (one Arrow batch / one GPU call);
    * rows never leave their partition. */
  def decodeFeatures(rows: Dataset[MediaRow]): Dataset[MediaFeatures] = {
    import rows.sparkSession.implicits._
    rows.mapPartitions { it =>
      it.grouped(decodeBatchSize).flatMap { batch =>
        // ---- stub decode: deterministic stand-in for codec work ----
        batch.map { m =>
          val md = MessageDigest.getInstance("MD5")
          val checksum = md.digest(m.payload).map("%02x".format(_)).mkString
          // fake "resize": clamp declared dims to the model edge,
          // preserving the declared aspect only via integer math
          val outW = math.min(m.declared_w, targetSize)
          val outH = math.min(m.declared_h, targetSize)
          MediaFeatures(m.media_id, m.media_type, m.payload.length.toLong,
            checksum, outW, outH)
        }
      }
    }
  }

  // ---------------------------------------------------------------- q75
  /** Full decode pipeline over the media view. The md5-of-payload
    * checksum makes the stub oracle-checkable byte-for-byte. */
  def q75MediaFeatures(s: SparkSession, dir: String): DataFrame = {
    import s.implicits._
    decodeFeatures(media(s, dir)).toDF().orderBy($"media_id")
  }

  private val q75Oracle =
    """SELECT doc_id AS media_id,
      |  CASE doc_id % 3 WHEN 0 THEN 'image' WHEN 1 THEN 'audio' ELSE 'video' END
      |    AS media_type,
      |  CAST(strlen(text) AS BIGINT) AS n_bytes,
      |  md5(text) AS checksum,
      |  LEAST(64 + n_chars % 512, 224) AS out_w,
      |  LEAST(64 + (n_chars * 7) % 512, 224) AS out_h
      |FROM documents ORDER BY media_id""".stripMargin

  // ---------------------------------------------------------------- q76
  /** Frame sampling for "video" payloads: one 16-byte frame every
    * `frameStride` bytes, exploded to (media_id, frame_idx, frame
    * hash). Runs as a relational explode so frame extraction stays
    * parallel and pushes no payload through a driver loop; at scale
    * the explode factor is bounded by payload size / stride. */
  val frameLen = 16
  val frameStride = 64

  def q76FrameSample(s: SparkSession, dir: String): DataFrame = {
    import s.implicits._
    media(s, dir).toDF()
      .where($"media_type" === "video")
      .select($"media_id", $"payload".cast("string").as("content"))
      .where(length($"content") >= frameLen)
      .select($"media_id", $"content",
        posexplode(transform(
          sequence(lit(0), ((length($"content") - frameLen) / frameStride).cast("int")),
          i => $"content".substr(i * frameStride + 1, lit(frameLen)))))
      .select($"media_id", col("pos").as("frame_idx"),
        md5(col("col")).as("frame_hash"))
      .orderBy($"media_id", $"frame_idx")
  }

  private val q76Oracle =
    s"""WITH v AS (
       |  SELECT doc_id AS media_id, text AS content FROM documents
       |  WHERE doc_id % 3 = 2 AND length(text) >= $frameLen),
       |f AS (
       |  SELECT media_id, content,
       |    unnest(range(0, (length(content) - $frameLen) // $frameStride + 1))
       |      AS frame_idx
       |  FROM v)
       |SELECT media_id, frame_idx,
       |  md5(substr(content, CAST(frame_idx * $frameStride AS INT) + 1, $frameLen))
       |    AS frame_hash
       |FROM f ORDER BY media_id, frame_idx""".stripMargin

  // ---------------------------------------------------------------- q123
  /** Frame-level dedup — the multimodal twin of q64's content dedup:
    * a frame repeated across (or within) videos marks shared footage
    * (intros, slates, loops), and per-video duplicated-frame share is
    * the signal a video-corpus curator drops on. Composes q76's
    * frame extraction with the dedup family's count-then-classify
    * shape: one hash-agg over frame hashes (16-byte keys — payloads
    * never shuffle), a broadcast-sized hot-hash side joined back,
    * then a per-video rollup. The 31-token corpus repeats 16-byte
    * slices heavily, so both the dup and unique branches are
    * exercised without planting. */
  def q123FrameDedup(s: SparkSession, dir: String): DataFrame = {
    import s.implicits._
    val frames = q76FrameSample(s, dir)
      .select($"media_id", $"frame_hash")
    val occ = frames.groupBy($"frame_hash")
      .agg(count(lit(1)).as("n_occ"))
    frames.join(occ, Seq("frame_hash"))
      .groupBy($"media_id")
      .agg(count(lit(1)).as("n_frames"),
        sum(when($"n_occ" >= 2, 1L).otherwise(0L)).as("n_dup_frames"))
      .select($"media_id", $"n_frames", $"n_dup_frames",
        ($"n_dup_frames".cast("double") / $"n_frames").as("dup_ratio"))
      .orderBy($"media_id")
  }

  private val q123Oracle =
    s"""WITH v AS (
       |  SELECT doc_id AS media_id, text AS content FROM documents
       |  WHERE doc_id % 3 = 2 AND length(text) >= $frameLen),
       |f AS (
       |  SELECT media_id,
       |    md5(substr(content, CAST(i * $frameStride AS INT) + 1, $frameLen))
       |      AS frame_hash
       |  FROM (
       |    SELECT media_id, content,
       |      unnest(range(0, (length(content) - $frameLen) // $frameStride + 1)) AS i
       |    FROM v)),
       |occ AS (SELECT frame_hash, count(*) AS n_occ FROM f GROUP BY 1)
       |SELECT media_id, count(*) AS n_frames,
       |  CAST(sum(CASE WHEN n_occ >= 2 THEN 1 ELSE 0 END) AS BIGINT)
       |    AS n_dup_frames,
       |  CAST(sum(CASE WHEN n_occ >= 2 THEN 1 ELSE 0 END) AS DOUBLE) / count(*)
       |    AS dup_ratio
       |FROM f JOIN occ USING (frame_hash)
       |GROUP BY media_id ORDER BY media_id""".stripMargin

  val queries: Map[String, (SparkSession, String) => DataFrame] = Map(
    "q75_media_features" -> (q75MediaFeatures _),
    "q76_frame_sample"   -> (q76FrameSample _),
    "q123_frame_dedup"   -> (q123FrameDedup _),
  )

  val oracles: Map[String, String] = Map(
    "q75_media_features" -> q75Oracle,
    "q76_frame_sample"   -> q76Oracle,
    "q123_frame_dedup"   -> q123Oracle,
  )
}
