package graft

import org.apache.spark.sql.SparkSession
import org.json4s._
import org.json4s.jackson.JsonMethods
import org.scalatest.funsuite.AnyFunSuite

/** SET/DROP/SHOW EXTENSION — typed table metadata with schema
  * validation (reference extensions.rs; DDL round-trip
  * runtime.rs:841-907, replayed here assertion-for-assertion). */
class ExtensionsSpec extends AnyFunSuite {

  lazy val spark: SparkSession = GraftSession.build("local[2]", 2)
  lazy val wh: String = java.nio.file.Files.createTempDirectory("graft-ext-wh").toString
  lazy val engine: GraftEngine = GraftEngine(spark, wh)

  private def shown(table: String = "ext"): JValue = {
    val rows = engine.sql(s"SHOW EXTENSIONS FOR $table").collect()
    assert(rows.length == 1, "SHOW EXTENSIONS returns one row")
    JsonMethods.parse(rows(0).getString(0))
  }

  test("SQL round trip: set → show → reject unknown column → drop empties") {
    engine.sql("CREATE TABLE ext AS SELECT CAST(id AS BIGINT) lat, CAST(id*2 AS BIGINT) depth FROM range(10)")
    engine.sql("""SET EXTENSION 'preset' FOR ext TO
      '{"presets":[{"name":"shallow","filters":[{"column":"depth","op":"<=","value":10}]}]}'""")
    assert((shown() \ "preset" \ "presets")(0) \ "name" == JString("shallow"))
    // an extension over a non-existent column is rejected by validation
    val rejected = intercept[IllegalArgumentException] {
      engine.sql("""SET EXTENSION 'preset' FOR ext TO
        '{"presets":[{"name":"x","filters":[{"column":"ghost","op":"=","value":1}]}]}'""")
    }
    assert(rejected.getMessage.contains("ghost"))
    // the rejected SET must not have clobbered the good document
    assert((shown() \ "preset" \ "presets")(0) \ "name" == JString("shallow"))
    engine.sql("DROP EXTENSION 'preset' FOR ext")
    assert(shown() == JObject(Nil), "dropping the only extension leaves an empty document")
  }

  test("mcp kind: tool-name and exposed-column rules; kinds are independent") {
    engine.sql("""SET EXTENSION 'mcp' FOR ext TO
      '{"enabled":true,"tool_name":"query_ocean","exposed_columns":["lat",{"name":"depth","description":"meters"}],"guardrails":{"recommended_row_limit":10000}}'""")
    assert(shown() \ "mcp" \ "tool_name" == JString("query_ocean"))
    assert(intercept[IllegalArgumentException] {
      engine.sql("""SET EXTENSION 'mcp' FOR ext TO '{"tool_name":"bad name!"}'""")
    }.getMessage.contains("tool_name"))
    assert(intercept[IllegalArgumentException] {
      engine.sql("""SET EXTENSION 'mcp' FOR ext TO '{"exposed_columns":["ghost"]}'""")
    }.getMessage.contains("ghost"))
    // a second kind rides beside the first
    engine.sql("""SET EXTENSION 'preset' FOR ext TO
      '{"presets":[{"name":"deep","filters":[{"column":"depth","op":">","value":10}]}]}'""")
    val doc = shown()
    assert((doc \ "mcp" \ "tool_name") == JString("query_ocean"))
    assert((doc \ "preset" \ "presets")(0) \ "name" == JString("deep"))
    // unknown kind rejected with the expected-kinds message
    assert(intercept[IllegalArgumentException] {
      engine.sql("""SET EXTENSION 'bogus' FOR ext TO '{}'""")
    }.getMessage.contains("mcp, preset"))
  }

  test("preset op/value validation: between/in shapes, duplicate names") {
    assert(intercept[IllegalArgumentException] {
      engine.sql("""SET EXTENSION 'preset' FOR ext TO
        '{"presets":[{"name":"b","filters":[{"column":"lat","op":"between","value":3}]}]}'""")
    }.getMessage.contains("between"))
    assert(intercept[IllegalArgumentException] {
      engine.sql("""SET EXTENSION 'preset' FOR ext TO
        '{"presets":[{"name":"b","filters":[{"column":"lat","op":"~","value":3}]}]}'""")
    }.getMessage.contains("op '~'"))
    assert(intercept[IllegalArgumentException] {
      engine.sql("""SET EXTENSION 'preset' FOR ext TO
        '{"presets":[{"name":"d","filters":[{"column":"lat","op":"=","value":1}]},
                     {"name":"d","filters":[{"column":"lat","op":"=","value":2}]}]}'""")
    }.getMessage.contains("duplicate"))
  }

  test("preset applies downstream as a WHERE clause") {
    engine.sql("""SET EXTENSION 'preset' FOR ext TO
      '{"presets":[{"name":"band","filters":[{"column":"depth","op":"between","value":[4,10]},
                                             {"column":"lat","op":"in","value":[2,3,4,9]}]}]}'""")
    val where = graft.catalog.TableExtensions.presetWhereSql(wh, "ext", "band")
    val got = engine.sql(s"SELECT lat FROM ext WHERE $where ORDER BY lat")
      .collect().map(_.getLong(0)).toSeq
    assert(got == Seq(2L, 3L, 4L)) // depth = 2*lat ∈ [4,10] ∧ lat ∈ {2,3,4,9}
  }

  test("DROP TABLE removes the sidecar") {
    assert(graft.sources.io.ByteStore.exists(
      graft.catalog.TableExtensions.sidecar(wh, "ext")))
    engine.sql("DROP TABLE ext")
    assert(!graft.sources.io.ByteStore.exists(
      graft.catalog.TableExtensions.sidecar(wh, "ext")))
  }
}
