package graft.server

import java.util.Base64

import com.fasterxml.jackson.databind.ObjectMapper
import org.apache.spark.sql.Row
import org.apache.spark.sql.types.{BinaryType, StructType}

/** Typed MCP content items (reference mcp_content_types.cpp
  * ContentBuilder): a tool whose endpoint declares a binary result mime
  * emits image/audio/embedded-resource content instead of JSON text —
  * the serving-side mate of the multimodal column layer, so a binary
  * column (thumbnail, waveform, artifact) reaches an AI client as
  * first-class MCP content. The JDK Base64 codec replaces the
  * reference's hand-rolled encoder; non-binary columns ride alongside
  * as ONE JSON text item so row metadata isn't lost.
  */
object McpContent {

  private val mapper = new ObjectMapper()
  private def q(s: String): String = mapper.writeValueAsString(s)

  def isBinaryMime(m: String): Boolean =
    m.startsWith("image/") || m.startsWith("audio/") ||
      m == "application/octet-stream"

  /** Render collected rows as an MCP content array. The FIRST binary
    * column becomes one typed item per row (image/audio for media
    * mimes, an embedded resource with a `blob` field otherwise, per
    * the MCP content model); remaining columns become a single JSON
    * text item. Rows are already plan-level-capped by the caller. */
  def render(rows: Seq[Row], schema: StructType, mime: String,
      toolName: String): String = {
    val binIdx = schema.fields.indexWhere(_.dataType == BinaryType)
    val kind =
      if (mime.startsWith("image/")) "image"
      else if (mime.startsWith("audio/")) "audio"
      else "resource"
    val items = scala.collection.mutable.ListBuffer.empty[String]
    rows.zipWithIndex.foreach { case (r, i) =>
      if (binIdx >= 0 && !r.isNullAt(binIdx)) {
        val b64 = Base64.getEncoder.encodeToString(r.getAs[Array[Byte]](binIdx))
        items += (kind match {
          case "image" | "audio" =>
            s"""{"type":"$kind","data":${q(b64)},"mimeType":${q(mime)}}"""
          case _ =>
            s"""{"type":"resource","resource":{"uri":${q(s"graft://$toolName/$i")},"mimeType":${q(mime)},"blob":${q(b64)}}}"""
        })
      }
    }
    // non-binary columns as one JSON text item (omitted when the
    // result was binary-only), serialized through the SAME wire codec
    // as text results — a bare Jackson mapper has no serializers for
    // Spark Rows/Scala collections (array/struct/map columns) and
    // renders timestamps inconsistently with the REST path
    val metaIdx = schema.fields.zipWithIndex.filter(_._1.dataType != BinaryType).map(_._2)
    if (metaIdx.nonEmpty) {
      val metaSchema = StructType(metaIdx.map(schema.fields(_)))
      val metaRows = rows.iterator.map(r => Row.fromSeq(metaIdx.map(r.get).toSeq))
      val arr = graft.serialize.JsonWire.rows(metaSchema, metaRows).mkString("[", ",", "]")
      items += s"""{"type":"text","text":${q(arr)}}"""
    }
    items.mkString("[", ",", "]")
  }
}
