package graft.write

import java.sql.DriverManager

import org.scalatest.BeforeAndAfterAll
import org.scalatest.funsuite.AnyFunSuite

import graft.config._

/** JDBC write passthrough (D2/D3/D5) against Derby: the northwind
  * CRUD shape — INSERT with bound params, UPDATE, DELETE, trailing
  * SELECT, and transactional rollback on mid-batch failure. */
class JdbcWriteSpec extends AnyFunSuite with BeforeAndAfterAll {

  private val url = "jdbc:derby:memory:graftcrud;create=true"

  private def ep(fields: (String, String)*): EndpointConfig = EndpointConfig(
    urlPath = "/products", method = "POST", templateSource = "p.sql",
    isWrite = true,
    requestFields = fields.map { case (n, t) =>
      RequestFieldConfig(n, validators = Seq(ValidatorConfig(t)))
    })

  override def beforeAll(): Unit = {
    val c = DriverManager.getConnection(url)
    c.createStatement().execute(
      "CREATE TABLE products (id INT PRIMARY KEY, name VARCHAR(64), price DOUBLE)")
    c.close()
  }

  test("insert with bound params + trailing SELECT returns data") {
    val r = JdbcWriteExecutor.executeWrite(url,
      ep("id" -> "int", "name" -> "string", "price" -> "number"),
      """INSERT INTO products (id, name, price)
        |VALUES ({{params.id}}, {{params.name}}, {{params.price}});
        |SELECT id, name FROM products WHERE id = {{params.id}}""".stripMargin,
      Map("id" -> "1", "name" -> "Chai", "price" -> "18.5"))
    assert(r.rowsAffected == 1L)
    assert(r.returnedData.get.head("NAME") == "Chai")
  }

  test("update and delete report affected rows (D2/D3)") {
    val upd = JdbcWriteExecutor.executeWrite(url,
      ep("id" -> "int", "price" -> "number"),
      "UPDATE products SET price = {{params.price}} WHERE id = {{params.id}}",
      Map("id" -> "1", "price" -> "20.0"), returnsData = false)
    assert(upd.rowsAffected == 1L)
    val del = JdbcWriteExecutor.executeWrite(url,
      ep("id" -> "int"),
      "DELETE FROM products WHERE id = {{params.id}}",
      Map("id" -> "1"), returnsData = false)
    assert(del.rowsAffected == 1L)
  }

  test("mid-batch failure rolls the whole transaction back (D5)") {
    intercept[Exception] {
      JdbcWriteExecutor.executeWrite(url,
        ep("id" -> "int"),
        """INSERT INTO products (id, name, price) VALUES ({{params.id}}, 'x', 1.0);
          |INSERT INTO no_such_table VALUES (1)""".stripMargin,
        Map("id" -> "77"), returnsData = false)
    }
    // the first INSERT must NOT have survived
    val c = DriverManager.getConnection(url)
    val rs = c.createStatement().executeQuery("SELECT count(*) AS n FROM products WHERE id = 77")
    rs.next()
    assert(rs.getInt("n") == 0)
    c.close()
  }

  test("injection payload binds as a literal over JDBC too") {
    // heuristic off (as in the reference corpus) — the prepared bind
    // itself is the boundary under test
    val epNoHeuristic = EndpointConfig(
      urlPath = "/products", method = "POST", templateSource = "p.sql",
      isWrite = true,
      requestFields = Seq(RequestFieldConfig("name",
        validators = Seq(ValidatorConfig("string", preventSqlInjection = false)))))
    val r = JdbcWriteExecutor.executeWrite(url,
      epNoHeuristic,
      """INSERT INTO products (id, name, price) VALUES (99, {{params.name}}, 1.0);
        |SELECT name FROM products WHERE id = 99""".stripMargin,
      Map("name" -> "x'); DROP TABLE products; --"))
    assert(r.returnedData.get.head("NAME") == "x'); DROP TABLE products; --")
    // table still exists
    val c = DriverManager.getConnection(url)
    c.createStatement().executeQuery("SELECT 1 FROM products").close()
    c.createStatement().execute("DELETE FROM products WHERE id = 99")
    c.close()
  }
}
