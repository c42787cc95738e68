package graft.config

import java.nio.file.Paths

import org.scalatest.funsuite.AnyFunSuite

/** Config portability gate: the reference's REAL endpoint YAMLs —
  * include composition and all — must bind into our config model with
  * the fields an operator relies on intact. */
class ReferenceConfigSpec extends AnyFunSuite {

  private val base = "/root/reference/examples/sqls"

  test("customers-rest.yaml loads with includes, cache block, validators") {
    val ep = YamlConfig.loadEndpoint(
      Paths.get(base, "customers/customers-rest.yaml"))
    assert(ep.urlPath == "/customers/")
    assert(ep.withPagination)
    // includes pulled the shared request fields from customer-common.yaml
    val byName = ep.requestFields.map(f => f.fieldName -> f).toMap
    assert(byName.contains("id") && byName.contains("segment")
      && byName.contains("email") && byName.contains("registration_date"))
    assert(byName("segment").validators.exists(v =>
      v.tpe == "enum" && v.allowedValues.contains("MACHINERY")))
    // date validator bounds spelled as plain min/max bind as dates
    val dateV = byName("registration_date").validators.find(_.tpe == "date").get
    assert(dateV.minDate == "2000-01-01")
    assert(dateV.maxDate == "2025-12-31")
    // cache block: singular primary-key spelling + cursor + retention
    assert(ep.cache.enabled)
    assert(ep.cache.table == "customers_rest_cache")
    assert(ep.cache.primaryKeys == Seq("id"))
    assert(ep.cache.cursor.exists(c => c.column == "registration_date" && c.tpe == "date"))
    assert(ep.cache.retention.keepLastSnapshots.contains(3))
    assert(ep.cache.retention.maxSnapshotAge.contains("7d"))
    // auth + rate-limit blocks (via include) bind for the serving layer
    val auth = ep.auth.get
    assert(auth.enabled && auth.tpe == "basic")
    assert(auth.users.exists(u => u.username == "admin" && u.roles.contains("admin")))
    val rl = ep.rateLimit.get
    assert(rl.enabled && rl.max == 100 && rl.intervalSeconds == 60)
    assert(rl.requestsPerMinute == 100)
  }

  test("northwind products-create.yaml binds as a write endpoint") {
    val ep = YamlConfig.loadEndpoint(
      Paths.get(base, "northwind/products-create.yaml"))
    assert(ep.urlPath == "/northwind/products/")
    assert(ep.method == "POST")
    assert(ep.isWrite) // both operation.type: write and method: POST say so
    assert(ep.returnsData) // operation.returns-data: true
    val req = ep.requestFields.map(_.fieldName)
    assert(req.contains("product_name") && req.contains("supplier_id"))
    val name = ep.requestFields.find(_.fieldName == "product_name").get
    assert(name.required)
    assert(name.fieldIn == "body")
    assert(name.validators.exists(v => v.tpe == "string" && v.min == 1 && v.max == 100))
  }

  test("MCP tool/resource/prompt YAMLs bind (no url-path needed)") {
    val tool = YamlConfig.loadEndpoint(
      Paths.get(base, "customers/customers-mcp-tool.yaml"))
    assert(tool.mcpTool.exists(_.name == "customer_lookup"))
    assert(tool.urlPath == "/mcp/customer_lookup")
    assert(tool.requestFields.map(_.fieldName).contains("segment")) // via include

    val res = YamlConfig.loadEndpoint(
      Paths.get(base, "customers/customers-mcp-resource.yaml"))
    assert(res.mcpResource.exists(r =>
      r.name == "customer_schema" && r.mimeType == "application/json"))
    assert(res.templateSource == "customer-mcp-resource-schema.sql")

    val prompt = YamlConfig.loadEndpoint(
      Paths.get(base, "customers/customers-mcp-prompt.yaml"))
    val p = prompt.mcpPrompt.get
    assert(p.name == "customer_data_analysis")
    assert(p.arguments == Seq("customer_id", "segment", "analysis_type",
      "time_period", "include_schema"))
    assert(p.template.contains("customer data analyst"))
  }

  test("every reference example YAML with a url-path loads without error") {
    for (dir <- Seq("customers", "northwind", "taxi", "sap", "publicis", "recommendations")) {
      val eps = YamlConfig.discoverEndpoints(s"$base/$dir")
      // discovery skips non-endpoint yamls; any endpoint file that
      // THROWS would be silently dropped, so assert known counts
      if (dir == "northwind") assert(eps.size >= 5, s"northwind lost endpoints: ${eps.map(_.urlPath)}")
    }
  }
}
