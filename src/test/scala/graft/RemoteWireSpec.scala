package graft

import org.scalatest.funsuite.AnyFunSuite
import org.json4s._

import graft.remote.RemoteWire

/** Pure unit coverage of the wire codec: framing, the typed-literal
  * tags, and the closed filter algebra — the serialization layer both
  * ends of an ATTACH 'graft://host:port' mount must agree on. */
class RemoteWireSpec extends AnyFunSuite {

  test("frames round-trip and reject absurd lengths") {
    val buf = new java.io.ByteArrayOutputStream()
    val msg = JObject("op" -> JString("handshake"), "n" -> JLong(42L))
    RemoteWire.writeFrame(buf, msg)
    val in = new java.io.ByteArrayInputStream(buf.toByteArray)
    // json4s reparses integers as JInt; compare the rendered forms
    import org.json4s.jackson.JsonMethods
    assert(JsonMethods.compact(JsonMethods.render(RemoteWire.readFrame(in))) ==
      JsonMethods.compact(JsonMethods.render(msg)))
    // a corrupt length prefix fails loudly instead of allocating it
    val bad = new java.io.ByteArrayInputStream(
      Array[Byte](0x7F, -1, -1, -1, 0, 0))
    intercept[IllegalArgumentException] { RemoteWire.readFrame(bad) }
  }

  test("typed literals round-trip with their types") {
    def rt(v: Any): Any =
      RemoteWire.valueFromJson(RemoteWire.valueToJson(v).get)
    assert(rt("x") == "x")
    assert(rt(java.lang.Boolean.TRUE) == true)
    assert(rt(java.lang.Long.valueOf(7L)) == 7L)
    assert(rt(java.lang.Integer.valueOf(7)) == 7L) // widened, compares equal
    assert(rt(java.lang.Double.valueOf(1.5)) == 1.5)
    val ts = java.sql.Timestamp.valueOf("2024-03-01 12:34:56.789")
    assert(rt(ts) == ts)
    val d = java.sql.Date.valueOf("2024-03-01")
    assert(rt(d) == d)
    assert(rt(null) == null)
    // a type outside the algebra refuses to serialize (filter stays
    // client-side) rather than mangling
    assert(RemoteWire.valueToJson(new Object).isEmpty)
  }

  test("the filter algebra is closed: expressible push, the rest stay home") {
    import org.apache.spark.sql.sources._
    def ok(f: Filter): Boolean = RemoteWire.filterToJson(f).isDefined
    assert(ok(EqualTo("a", 1)))
    assert(ok(And(GreaterThan("a", 1), In("b", Array("x", "y")))))
    assert(ok(Not(StringStartsWith("s", "pre"))))
    assert(ok(Or(IsNull("a"), IsNotNull("b"))))
    // nested fields and exotic values stay client-side
    assert(!ok(EqualTo("a.b", 1)))
    assert(!ok(EqualTo("a", new Object)))
    assert(!ok(And(EqualTo("a", 1), EqualTo("b.c", 2))), "And is all-or-nothing")
    // server reconstruction evaluates like the original predicate
    val spark = GraftSession.build("local[2]", 2)
    import spark.implicits._
    val df = Seq((1, "xy"), (2, "zz"), (3, "xq")).toDF("a", "s")
    val j = RemoteWire.filterToJson(
      And(GreaterThan("a", 1), StringStartsWith("s", "x"))).get
    val got = df.where(RemoteWire.filterFromJson(j)).collect().map(_.getInt(0))
    assert(got.toSeq == Seq(3))
  }
}
