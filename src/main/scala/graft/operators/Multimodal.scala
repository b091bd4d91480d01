package graft.operators

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._
import graft.Tables

/** Multimodal column plumbing (SURVEY.md §2.10): media payloads as
  * opaque `binary` columns with typed metadata, decoded/feature-
  * extracted per partition.
  *
  * The decode step is a clearly-marked STUB (image/audio codecs are
  * not in this container): it derives deterministic fake metadata from
  * the bytes. Everything around it is the real Spark plumbing — typed
  * Dataset schema, `mapPartitions` batch shape (the Scala analog of
  * `mapInPandas`: one iterator per partition, record-at-a-time map
  * with per-partition setup amortized), partitioning preserved, no
  * driver collection.
  */
object Multimodal {

  /** Input record: media payload as opaque bytes. */
  case class MediaRecord(doc_id: Long, payload: Array[Byte])

  /** Decoded metadata. */
  case class MediaMeta(doc_id: Long, n_bytes: Int, width: Int, height: Int,
      format: String, head_hex: String, n_frames: Int)

  private val formats = Array("jpeg", "png", "webp")

  /** STUB decode: a real implementation would parse the codec header
    * here (per-partition codec init amortized across the iterator).
    * The fake is a pure function of (bytes, id) so tests and the
    * DuckDB oracle can reproduce it.
    */
  def decodeStub(it: Iterator[MediaRecord]): Iterator[MediaMeta] =
    it.map { r =>
      val n = r.payload.length
      MediaMeta(
        doc_id = r.doc_id,
        n_bytes = n,
        width = n % 640,
        height = (r.doc_id % 480).toInt,
        format = formats(n % 3),
        head_hex = r.payload.take(8).map("%02X".format(_)).mkString,
        n_frames = n / 16)
    }

  /** Binary ingest → partition-wise decode → typed metadata table.
    * The payload column is built from `documents.text` (UTF-8 bytes)
    * because the testdata has no real media; swap the source, keep the
    * pipeline.
    */
  def decodeMeta(s: SparkSession, dir: String): DataFrame = {
    import s.implicits._
    Tables.documents(s, dir)
      .select(col("doc_id"), col("text").cast("binary").as("payload"))
      .as[MediaRecord]
      .mapPartitions(decodeStub)
      .toDF()
      .orderBy("doc_id")
  }

  /** Resize stage (STUB decode → scale dims → sample payload): halves
    * the fake decoded dimensions and keeps every 4th byte — the
    * partition shape of a real thumbnailer (decode, transform, re-encode
    * per record with per-partition codec reuse).
    */
  def resize(s: SparkSession, dir: String): DataFrame = {
    import s.implicits._
    Tables.documents(s, dir)
      .select(col("doc_id"), col("text").cast("binary").as("payload"))
      .as[MediaRecord]
      .mapPartitions { it =>
        decodeStub(it).map { m => // decode, then scale dims + sample size
          (m.doc_id, m.width, m.height, m.width / 2, m.height / 2,
            (m.n_bytes + 3) / 4)
        }
      }
      .toDF("doc_id", "width", "height", "out_width", "out_height",
        "n_sample_bytes")
      .orderBy("doc_id")
  }

  /** Feature extraction (STUB): deterministic per-record features from
    * the raw bytes — 4-bin byte histogram (as four scalar columns, so
    * downstream sort/compare tooling never sees an array cell) + mean
    * byte value. The real version would run an encoder per partition;
    * the batch shape (iterator in, iterator of fixed-width vectors out)
    * is identical.
    */
  def featureExtract(s: SparkSession, dir: String): DataFrame = {
    import s.implicits._
    Tables.documents(s, dir)
      .select(col("doc_id"), col("text").cast("binary").as("payload"))
      .as[MediaRecord]
      .mapPartitions { it =>
        it.map { r =>
          val hist = new Array[Long](4)
          var sum = 0L
          r.payload.foreach { b =>
            val v = b & 0xff
            hist(v >> 6) += 1
            sum += v
          }
          val n = math.max(r.payload.length, 1)
          (r.doc_id, hist(0), hist(1), hist(2), hist(3), sum.toDouble / n)
        }
      }
      .toDF("doc_id", "hist0", "hist1", "hist2", "hist3", "mean_byte")
      .orderBy("doc_id")
  }

  /** Frame sampling over the binary payload: every 16th byte is a
    * "frame"; sample up to 4 frames/doc with their offsets — the
    * partition/batch shape of a video frame-sampler.
    */
  def frameSample(s: SparkSession, dir: String): DataFrame = {
    import s.implicits._
    Tables.documents(s, dir)
      .select(col("doc_id"), col("text").cast("binary").as("payload"))
      .as[MediaRecord]
      .flatMap { r =>
        val n = r.payload.length
        (0 until math.min(4, n / 16)).map { f =>
          (r.doc_id, f, f * 16, "%02X".format(r.payload(f * 16)))
        }
      }
      .toDF("doc_id", "frame_no", "byte_offset", "frame_byte_hex")
      .orderBy("doc_id", "frame_no")
  }
}
