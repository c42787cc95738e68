package graft.queries

import org.apache.spark.sql.functions._

import graft.{QueryDef, QuerySet, Tables}
import graft.multimodal.Multimodal

/** Multimodal plumbing correctness: text bytes stand in for media
  * blobs; the batched mapPartitions decode path produces features a
  * DuckDB oracle recomputes directly from the text (the stub kernel is
  * intentionally SQL-expressible so the full binary → batch → kernel →
  * typed-result pipeline is hash-checked, not just smoke-tested). */
object MultimodalQueries extends QuerySet {

  private val features = QueryDef(
    "multimodal_features",
    Some("""SELECT doc_id, octet_length(encode(text))::BIGINT AS n_bytes,
           |  octet_length(encode(text))::DOUBLE AS f0,
           |  ascii(substr(text, 1, 1))::DOUBLE AS f1,
           |  ascii(substr(text, -1, 1))::DOUBLE AS f2
           |FROM documents ORDER BY doc_id""".stripMargin),
    (s, dir) => {
      val media = Multimodal.mediaFromText(
        Tables.table(s, dir, "documents"), "doc_id", "text")
      Multimodal.extractFeatures(s, media)
        .toDF("doc_id", "n_bytes", "f0", "f1", "f2")
        .orderBy("doc_id")
    })

  private val frames = QueryDef(
    "multimodal_frame_sample",
    None, // byte-slice frames are not expressible in DuckDB SQL —
          // rows-only check; the slice logic is unit-tested.
    (s, dir) => {
      val media = Multimodal.mediaFromText(
        Tables.table(s, dir, "documents"), "doc_id", "text")
      Multimodal.frameSample(media, n = 4)
        .select(col("id").as("doc_id"), size(col("frames")).as("n_frames"))
        .orderBy("doc_id")
    })

  override val defs: Seq[QueryDef] = Seq(features, frames)
}
