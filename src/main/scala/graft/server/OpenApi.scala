package graft.server

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.types._

import graft.api.TemplatePipeline
import graft.template.{ParamClassifier, SqlParamType}

/** OpenAPI 3 document generation. The reference infers each endpoint's
  * response schema by running `DESCRIBE SELECT * FROM (<rendered>)`
  * and mapping type names (database_manager.cpp:678-724); here the
  * analyzed plan's `df.schema` gives the same thing without executing.
  * Request parameters come from the declared fields' validator types.
  */
object OpenApi {

  private def paramType(tpe: Option[SqlParamType.Value]): String = tpe match {
    case Some(SqlParamType.IntegerT) => "integer"
    case Some(SqlParamType.DoubleT) => "number"
    case Some(SqlParamType.BooleanT) => "boolean"
    case _ => "string"
  }

  def sparkTypeToOpenApi(dt: DataType): String = dt match {
    case ByteType | ShortType | IntegerType | LongType => "integer"
    case FloatType | DoubleType | _: DecimalType => "number"
    case BooleanType => "boolean"
    case _: ArrayType => "array"
    case _: StructType | _: MapType => "object"
    case _ => "string" // dates/timestamps/binary serialize as strings
  }

  /** Response schema via plan analysis (no execution): render the
    * template with defaults-only params; endpoints whose templates
    * cannot render without concrete params are listed without a
    * response schema, like the reference's DESCRIBE failures. */
  private def responseSchema(
      spark: SparkSession, ep: ServedEndpoint): Option[StructType] =
    try {
      TemplatePipeline.prepare(ep.config, ep.template, Map.empty, ep.connProps) match {
        case Right((sql, args)) =>
          val df = if (args.isEmpty) spark.sql(sql) else spark.sql(sql, args)
          Some(df.schema)
        case Left(_) => None
      }
    } catch { case _: Exception => None }

  def generate(spark: SparkSession, endpoints: Seq[ServedEndpoint],
               title: String = "graft"): String = {
    val b = new StringBuilder
    b.append(s"""{"openapi":"3.0.0","info":{"title":"$title","version":"0.1"},"paths":{""")
    var firstPath = true
    endpoints.foreach { ep =>
      if (!firstPath) b.append(',')
      firstPath = false
      // :param path segments → {param} per OpenAPI
      val path = ep.config.urlPath.replaceAll(":([^/]+)", "{$1}")
      b.append(s""""$path":{"${ep.config.method.toLowerCase}":{""")
      // parameters
      b.append(""""parameters":[""")
      var firstParam = true
      ep.config.requestFields.foreach { f =>
        if (!firstParam) b.append(',')
        firstParam = false
        val in = if (f.fieldIn == "path") "path" else "query"
        val t = paramType(ParamClassifier.classify(f))
        b.append(s"""{"name":"${f.fieldName}","in":"$in","required":${f.required},""")
        b.append(s""""description":${jsonStr(f.description)},"schema":{"type":"$t"}}""")
      }
      b.append(']')
      // response
      b.append(""","responses":{"200":{"description":"OK"""")
      responseSchema(spark, ep).foreach { schema =>
        b.append(""","content":{"application/json":{"schema":{"type":"object","properties":{"data":{"type":"array","items":{"type":"object","properties":{""")
        var firstCol = true
        schema.fields.foreach { f =>
          if (!firstCol) b.append(',')
          firstCol = false
          b.append(s""""${f.name}":{"type":"${sparkTypeToOpenApi(f.dataType)}"}""")
        }
        b.append("""}}},"next":{"type":"string","nullable":true},"total_count":{"type":"integer"}}}}}""")
      }
      b.append("}}}}") // 200, responses, method, path
    }
    b.append("}}")
    b.toString
  }

  private def jsonStr(s: String): String = {
    val b = new StringBuilder
    graft.serialize.JsonWire.appendString(b, s)
    b.toString
  }
}
