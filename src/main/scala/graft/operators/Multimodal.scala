package graft.operators

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

import graft.Tables

/** Binary payload + typed metadata row (the multimodal column shape). */
case class BinDoc(doc_id: Long, payload: Array[Byte])

/** Extracted (stub) feature row. */
case class BinFeat(doc_id: Long, n_bytes: Int, mean_byte: Double,
    max_byte: Int, feat_hash: Long)

/** Multimodal-column plumbing (SURVEY.md §2.G): treat media as opaque
  * `binary` columns with typed metadata, and run "decode → feature
  * extract" as batched per-partition processing. The container has no
  * image/audio codecs, so the decode step is a clearly-marked
  * deterministic stub — the Spark-side shape (binary column, schema,
  * partition batching, feature output) is real and tested.
  */
object Multimodal {

  /** STUB decode: stands in for an image/audio decoder. Deterministic
    * byte statistics so specs can assert exact values. */
  private[graft] def decodeStub(payload: Array[Byte]): (Double, Int, Long) = {
    var sum = 0L
    var mx = 0
    var h = 1469598103934665603L
    payload.foreach { b =>
      val u = b & 0xff
      sum += u
      if (u > mx) mx = u
      h = (h ^ u) * 1099511628211L
    }
    val mean = if (payload.isEmpty) 0.0 else sum.toDouble / payload.length
    (math.rint(mean * 1e6) / 1e6, mx, h)
  }

  /** m1_binary_meta — binary payload column + per-partition batched
    * feature extraction (mapPartitions = the Scala shape of a
    * mapInPandas batch UDF). */
  def m1BinaryMeta(s: SparkSession, dir: String): DataFrame = {
    import s.implicits._
    Tables.documents(s, dir)
      .select(col("doc_id"), col("text").cast("binary").as("payload"))
      .as[BinDoc]
      .mapPartitions { it =>
        it.map { d =>
          val (mean, mx, h) = decodeStub(d.payload)
          BinFeat(d.doc_id, d.payload.length, mean, mx, h)
        }
      }
      .toDF()
      .orderBy("doc_id")
  }
}
