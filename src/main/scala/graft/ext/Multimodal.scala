package graft.ext

import java.security.MessageDigest

import org.apache.spark.sql.{Dataset, SparkSession}
import org.apache.spark.sql.functions._
import graft.Tables
import graft.queries.QueryDef

/** Multimodal-column plumbing: treat media payloads as opaque `binary`
  * columns with typed metadata, and run decode / feature-extraction as a
  * per-partition imperative pass (`mapPartitions`) — the shape a real
  * image/audio pipeline takes on Spark (decoder or model initialized once
  * per partition/executor, rows streamed through it in batches).
  *
  * STUB: no media codecs exist in this environment, so [[FakeMediaDecoder]]
  * derives deterministic "features" from an md5 of the bytes. The Spark
  * plumbing — binary schema, typed output encoder, per-partition decoder
  * lifecycle, frame-sample fan-out — is real and oracle-checked; swap
  * `FakeMediaDecoder.decode` for a codec call in production.
  */
object Multimodal {

  /** Input: an opaque media payload + metadata. */
  final case class MediaDoc(doc_id: Long, mime: String, content: Array[Byte])

  /** Output of the decode/feature-extract pass. Features are scalar
    * doubles (not an array) so the oracle compare is representation-proof.
    */
  final case class MediaFeatures(
      doc_id: Long, mime: String, n_bytes: Int,
      width: Int, height: Int, n_frames: Int,
      feat0: Double, feat1: Double, feat2: Double, feat3: Double)

  /** Deterministic stand-in for an image/video decoder. One instance per
    * partition (MessageDigest is stateful/non-thread-safe — exactly like a
    * real codec context).
    */
  final class FakeMediaDecoder {
    private val md = MessageDigest.getInstance("MD5")

    private def hex4(h: String, at: Int): Int =
      Integer.parseInt(h.substring(at, at + 4), 16)

    def decode(d: MediaDoc): MediaFeatures = {
      md.reset()
      val h = md.digest(d.content).map("%02x".format(_)).mkString
      MediaFeatures(
        doc_id = d.doc_id,
        mime = d.mime,
        n_bytes = d.content.length,
        width = hex4(h, 0) % 640 + 16,
        height = hex4(h, 4) % 480 + 16,
        n_frames = Integer.parseInt(h.substring(8, 10), 16) % 30 + 1,
        feat0 = hex4(h, 10) / 65535.0,
        feat1 = hex4(h, 14) / 65535.0,
        feat2 = hex4(h, 18) / 65535.0,
        feat3 = hex4(h, 22) / 65535.0)
    }
  }

  /** The decode pass: one decoder per partition, rows streamed through. */
  def decodeFeatures(docs: Dataset[MediaDoc]): Dataset[MediaFeatures] = {
    import docs.sparkSession.implicits._
    docs.mapPartitions { it =>
      val decoder = new FakeMediaDecoder()
      it.map(decoder.decode)
    }
  }

  /** documents.text reinterpreted as an opaque binary payload — the
    * testdata has no real media column; utf-8 bytes stand in.
    */
  def mediaDocs(s: SparkSession, dir: String): Dataset[MediaDoc] = {
    import s.implicits._
    Tables.documents(s, dir)
      .select(col("doc_id"), lit("text/plain").as("mime"),
        encode(col("text"), "UTF-8").as("content"))
      .as[MediaDoc]
  }

  /** Oracle mirror of [[FakeMediaDecoder.decode]]'s arithmetic. */
  private val duckFeatures =
    """SELECT doc_id, 'text/plain' AS mime,
      |  CAST(octet_length(CAST(text AS BLOB)) AS INT) AS n_bytes,
      |  CAST(CAST('0x' || substr(h, 1, 4) AS INT) % 640 + 16 AS INT) AS width,
      |  CAST(CAST('0x' || substr(h, 5, 4) AS INT) % 480 + 16 AS INT) AS height,
      |  CAST(CAST('0x' || substr(h, 9, 2) AS INT) % 30 + 1 AS INT) AS n_frames,
      |  CAST('0x' || substr(h, 11, 4) AS INT) / 65535.0 AS feat0,
      |  CAST('0x' || substr(h, 15, 4) AS INT) / 65535.0 AS feat1,
      |  CAST('0x' || substr(h, 19, 4) AS INT) / 65535.0 AS feat2,
      |  CAST('0x' || substr(h, 23, 4) AS INT) / 65535.0 AS feat3
      |FROM (SELECT doc_id, text, md5(text) AS h FROM documents)""".stripMargin

  // -- decode + feature extraction over binary payloads ---------------------
  val q_multimodal_features: QueryDef = QueryDef(
    s"""$duckFeatures
       |ORDER BY doc_id""".stripMargin) { (s, dir) =>
    decodeFeatures(mediaDocs(s, dir)).toDF().orderBy(col("doc_id"))
  }

  // -- frame sampling: every 2nd frame of each decoded payload --------------
  // The fan-out shape of video frame extraction: per-row explode bounded by
  // n_frames (<= 30) — no shuffle, fan-out factor known and small.
  val q_frame_sample: QueryDef = QueryDef(
    s"""SELECT doc_id, CAST(f.frame_id AS INT) AS frame_id,
       |  md5(doc_id || ':' || f.frame_id) AS frame_hash
       |FROM ($duckFeatures) d, (SELECT unnest(range(0, 30, 2)) AS frame_id) f
       |WHERE f.frame_id < d.n_frames
       |ORDER BY doc_id, frame_id""".stripMargin) { (s, dir) =>
    decodeFeatures(mediaDocs(s, dir))
      .select(col("doc_id"),
        explode(sequence(lit(0), col("n_frames") - 1, lit(2))).as("frame_id"))
      .withColumn("frame_hash",
        md5(concat(col("doc_id").cast("string"), lit(":"), col("frame_id").cast("string"))))
      .orderBy(col("doc_id"), col("frame_id"))
  }

  val all: Map[String, QueryDef] = Map(
    "q_multimodal_features" -> q_multimodal_features,
    "q_frame_sample" -> q_frame_sample)
}
