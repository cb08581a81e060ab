package graft.multimodal

import org.apache.spark.sql.{DataFrame, Dataset}
import org.apache.spark.sql.functions._
import org.apache.spark.util.LongAccumulator

/** Multimodal decode / feature-extract plumbing (north-star scope): media
  * rides as opaque `binary` payloads with typed metadata; decoding runs as a
  * per-partition pipeline so the expensive codec initialization happens once
  * per PARTITION, not once per row — the Scala analogue of a batched
  * `mapInPandas` decode stage.
  *
  * The codec itself is a clearly-marked deterministic STUB (this container
  * has no image/audio libraries): it derives pseudo width/height/frame-count
  * from payload bytes. Everything around it — the row schema, the
  * mapPartitions batch shape, the per-partition init amortization, the typed
  * output — is the real thing a production decode stage needs; swapping the
  * stub for a JNI codec changes one function.
  */
object MediaDecode {

  /** One media item: id + mime + opaque payload (+ source partition key). */
  case class MediaRow(doc_id: Long, mime: String, payload: Array[Byte])

  /** Extracted features. `checksum` is a deterministic payload digest so
    * tests can pin outputs; width/height/n_frames come from the stub codec. */
  case class MediaFeatures(
      doc_id: Long, mime: String, n_bytes: Int,
      checksum: Long, width: Int, height: Int, n_frames: Int)

  /** The stand-in for a real decoder handle (libjpeg/ffmpeg context, model
    * weights, …): expensive to construct, reused across a partition. */
  final class StubCodec {
    /** One pass over the payload: FNV-1a digest, from which the fake
      * dimensions derive — decode and checksum share the hash instead of
      * scanning the bytes twice. */
    def checksum(payload: Array[Byte]): Long = {
      var h = 1469598103934665603L // FNV-1a 64
      var i = 0
      while (i < payload.length) { h = (h ^ (payload(i) & 0xff)) * 1099511628211L; i += 1 }
      h
    }
    def decodeFromDigest(h: Long): (Int, Int, Int) = {
      val w = 64 + (Math.floorMod(h, 1024L)).toInt
      val ht = 64 + (Math.floorMod(h >>> 10, 1024L)).toInt
      val frames = 1 + (Math.floorMod(h >>> 20, 30L)).toInt
      (w, ht, frames)
    }
    def decode(payload: Array[Byte]): (Int, Int, Int) = decodeFromDigest(checksum(payload))
  }

  /** Decode + feature-extract over a typed media dataset. `initCounter`
    * (optional, for tests) counts codec constructions — it must equal the
    * PARTITION count, never the row count. */
  def extractFeatures(media: Dataset[MediaRow],
                      initCounter: Option[LongAccumulator] = None): Dataset[MediaFeatures] = {
    val spark = media.sparkSession
    import spark.implicits._
    media.mapPartitions { rows =>
      val codec = new StubCodec        // once per partition — the whole point
      initCounter.foreach(_.add(1L))
      rows.map { r =>
        val digest = codec.checksum(r.payload)
        val (w, h, f) = codec.decodeFromDigest(digest)
        MediaFeatures(r.doc_id, r.mime, r.payload.length, digest, w, h, f)
      }
    }
  }

  /** Build the media dataset from the documents fixture: text bytes stand in
    * for the opaque payload (schema/partitioning/batch shape are what is
    * under test, not the codec). */
  def mediaFromDocuments(docs: DataFrame): Dataset[MediaRow] = {
    val spark = docs.sparkSession
    import spark.implicits._
    docs.select(col("doc_id"), lit("application/octet-stream").as("mime"),
        encode(col("text"), "UTF-8").as("payload"))
      .as[MediaRow]
  }
}
