package graft.ops

import org.apache.spark.sql.{DataFrame, Dataset, SparkSession}
import org.apache.spark.sql.functions._

/** Multimodal-column plumbing (north-star extension): media payloads are
  * opaque BINARY columns with typed metadata, and per-batch feature
  * extraction runs as a batched partition transform — the same schema /
  * partitioning / batch shape a real decoder (image resize, audio
  * feature, video frame-sample) would use. The decode kernel itself is a
  * clearly-marked DETERMINISTIC STUB (no codec libraries in this
  * environment): it derives fake dimensions from the payload bytes, so
  * the full pipeline is testable end-to-end and oracle-checkable.
  *
  * At 100 TB the payload column dominates storage: every transform here
  * projects metadata before shuffling, and the batched iterator keeps
  * per-row overhead amortized exactly as an Arrow-batched UDF would.
  */
object Multimodal {

  final case class MediaRow(doc_id: Long, kind: String, payload: Array[Byte])
  final case class MediaFeatures(
      doc_id: Long, kind: String, n_bytes: Long,
      width: Long, height: Long, frames: Long)

  /** Build the media table: documents' text bytes stand in for the
    * opaque payload (binary column + kind metadata). */
  def mediaTable(spark: SparkSession, sfDir: String): Dataset[MediaRow] = {
    import spark.implicits._
    spark.read.parquet(s"$sfDir/documents.parquet")
      .select(col("doc_id"),
        element_at(array(lit("image"), lit("audio"), lit("video")),
          (col("doc_id") % 3 + 1).cast("int")).as("kind"),
        encode(col("text"), "UTF-8").as("payload"))
      .as[MediaRow]
  }

  /** ====== STUB DECODER ======
    * Stands in for a real image/audio/video decode. Deterministic pure
    * function of (kind, payload length) so the surrounding pipeline is
    * fully verifiable; swap this body for a codec call in production. */
  def decodeStub(kind: String, payload: Array[Byte]): (Long, Long, Long) = {
    val n = payload.length.toLong
    kind match {
      case "image" => (16 + n % 640, 16 + (n * 7) % 480, 1L)
      case "audio" => (1L, 1L, n % 48000)          // "frames" = fake sample count
      case "video" => (16 + n % 640, 16 + (n * 7) % 480, 1 + n % 24)
      case _       => (0L, 0L, 0L)
    }
  }

  val BatchSize = 64

  /** Batched feature extraction: the partition iterator is consumed in
    * fixed-size batches (the Arrow-batch shape of a pandas-style UDF) and
    * the stub decode runs once per row inside the batch loop. */
  def extractFeatures(spark: SparkSession, media: Dataset[MediaRow]): Dataset[MediaFeatures] = {
    import spark.implicits._
    media.mapPartitions { it =>
      it.grouped(BatchSize).flatMap { batch =>
        batch.map { r =>
          val (w, h, f) = decodeStub(r.kind, r.payload)
          MediaFeatures(r.doc_id, r.kind, r.payload.length.toLong, w, h, f)
        }
      }
    }
  }

  /** The registered query: media build → batched decode → metadata-only
    * projection (payload never survives past the decode stage). */
  def mediaFeatures(spark: SparkSession, sfDir: String): DataFrame =
    extractFeatures(spark, mediaTable(spark, sfDir))
      .toDF()
      .orderBy("doc_id")
}
