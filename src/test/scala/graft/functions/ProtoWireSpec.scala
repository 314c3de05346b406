package graft.functions

import graft.SparkSuite
import graft.functions.ProtoWire._
import graft.functions.ProtoWire.PType._
import org.apache.spark.sql.functions._
import org.apache.spark.unsafe.types.UTF8String

/** Pins the codec to golden byte strings hand-derived from the public wire
  * format spec (protobuf.dev/programming-guides/encoding) — the canonical
  * `08 96 01` examples — so compatibility is against real protobuf, not
  * just self-consistency. Roundtrip tests then cover the full type surface
  * through the codegen'd expressions. */
class ProtoWireSpec extends SparkSuite {

  private def bytes(xs: Int*): Array[Byte] = xs.map(_.toByte).toArray

  private val test1 = ProtoMessage("Test1", Seq(ProtoField(1, "a", PInt32)))

  test("golden: varint field (spec's Test1 a=150 ⇒ 08 96 01), both ways") {
    val wire = bytes(0x08, 0x96, 0x01)
    val row = ProtoWire.decode(wire, test1)
    assert(row.getInt(0) == 150)
    val enc = ProtoWire.encode(row, test1)
    assert(enc.sameElements(wire))
  }

  test("golden: string field (spec's Test2 b=\"testing\" ⇒ 12 07 …)") {
    val msg = ProtoMessage("Test2", Seq(ProtoField(2, "b", PString)))
    val wire = bytes(0x12, 0x07) ++ "testing".getBytes("UTF-8")
    val row = ProtoWire.decode(wire, msg)
    assert(row.getUTF8String(0).toString == "testing")
    assert(ProtoWire.encode(row, msg).sameElements(wire))
  }

  test("golden: nested message (spec's Test3 c.a=150 ⇒ 1A 03 08 96 01)") {
    val msg = ProtoMessage("Test3", Seq(ProtoField(3, "c", PMsg(test1))))
    val wire = bytes(0x1a, 0x03, 0x08, 0x96, 0x01)
    val row = ProtoWire.decode(wire, msg)
    assert(row.getStruct(0, 1).getInt(0) == 150)
    assert(ProtoWire.encode(row, msg).sameElements(wire))
  }

  test("golden: packed repeated int32 (spec's Test4 [3,270,86942] ⇒ " +
      "22 06 03 8E 02 9E A7 05)") {
    val msg = ProtoMessage("Test4",
      Seq(ProtoField(4, "d", PInt32, repeated = true)))
    val wire = bytes(0x22, 0x06, 0x03, 0x8e, 0x02, 0x9e, 0xa7, 0x05)
    val row = ProtoWire.decode(wire, msg)
    assert(row.getArray(0).toIntArray().toSeq == Seq(3, 270, 86942))
    assert(ProtoWire.encode(row, msg).sameElements(wire))
  }

  test("golden: negative int32 is a 10-byte two's-complement varint") {
    // -2 ⇒ 08 FE FF FF FF FF FF FF FF FF 01
    val wire = bytes(0x08, 0xfe, 0xff, 0xff, 0xff, 0xff, 0xff, 0xff, 0xff,
      0xff, 0x01)
    val row = ProtoWire.decode(wire, test1)
    assert(row.getInt(0) == -2)
    assert(ProtoWire.encode(row, test1).sameElements(wire))
  }

  test("golden: zigzag sint32/sint64 (spec table: 0⇒0, -1⇒1, 1⇒2, -2⇒3)") {
    val m32 = ProtoMessage("S32", Seq(ProtoField(1, "v", PSInt32)))
    val r = ProtoWire.decode(bytes(0x08, 0x01), m32)
    assert(r.getInt(0) == -1)
    assert(ProtoWire.encode(r, m32).sameElements(bytes(0x08, 0x01)))
    assert(ProtoWire.decode(bytes(0x08, 0x02), m32).getInt(0) == 1)
    val m64 = ProtoMessage("S64", Seq(ProtoField(1, "v", PSInt64)))
    val r64 = ProtoWire.decode(bytes(0x08, 0x03), m64)
    assert(r64.getLong(0) == -2L)
    assert(ProtoWire.encode(r64, m64).sameElements(bytes(0x08, 0x03)))
  }

  test("golden: sfixed32/sfixed64 are little-endian two's-complement") {
    val m = ProtoMessage("F", Seq(
      ProtoField(1, "a", PSFixed32), ProtoField(2, "b", PSFixed64)))
    val wire = bytes(0x0d, 0xfe, 0xff, 0xff, 0xff,
      0x11, 0x2a, 0, 0, 0, 0, 0, 0, 0)
    val row = ProtoWire.decode(wire, m)
    assert(row.getInt(0) == -2 && row.getLong(1) == 42L)
    assert(ProtoWire.encode(row, m).sameElements(wire))
  }

  test("golden: enum decodes to its symbol name; unknown numbers are " +
      "preserved as decimal strings (proto3 open enums) and re-encode") {
    val q = PEnum("Q", Map(0 -> "UNSPECIFIED", 1 -> "GOOD", 2 -> "BAD"))
    val m = ProtoMessage("E", Seq(ProtoField(1, "q", q)))
    assert(ProtoWire.decode(bytes(0x08, 0x01), m)
      .getUTF8String(0).toString == "GOOD")
    assert(ProtoWire.decode(Array.emptyByteArray, m)
      .getUTF8String(0).toString == "UNSPECIFIED")
    val unk = ProtoWire.decode(bytes(0x08, 0x07), m)
    assert(unk.getUTF8String(0).toString == "7")
    assert(ProtoWire.encode(unk, m).sameElements(bytes(0x08, 0x07)))
    // default (0) omitted on encode, like every proto3 scalar
    val good = ProtoWire.decode(bytes(0x08, 0x01), m)
    assert(ProtoWire.encode(
      ProtoWire.decode(Array.emptyByteArray, m), m).isEmpty)
    assert(ProtoWire.encode(good, m).sameElements(bytes(0x08, 0x01)))
  }

  test("golden: map field = repeated {1:key,2:value} entries; duplicate " +
      "keys last-win; defaulted key/value omitted in the entry and " +
      "restored on decode") {
    val m = ProtoMessage("M", Seq(ProtoField(1, "kv", PMap(PString, PInt32))))
    val wire = bytes(0x0a, 0x05, 0x0a, 0x01, 0x61, 0x10, 0x01) // {"a": 1}
    val row = ProtoWire.decode(wire, m)
    val md = row.getMap(0)
    assert(md.numElements() == 1)
    assert(md.keyArray.getUTF8String(0).toString == "a")
    assert(md.valueArray.getInt(0) == 1)
    assert(ProtoWire.encode(row, m).sameElements(wire))
    // second entry for the same key: protobuf merge keeps the last value
    val dup = wire ++ bytes(0x0a, 0x05, 0x0a, 0x01, 0x61, 0x10, 0x07)
    val rowDup = ProtoWire.decode(dup, m)
    assert(rowDup.getMap(0).numElements() == 1)
    assert(rowDup.getMap(0).valueArray.getInt(0) == 7)
    // zero-length entry = default key + default value
    val rowDef = ProtoWire.decode(bytes(0x0a, 0x00), m)
    assert(rowDef.getMap(0).keyArray.getUTF8String(0).toString == "")
    assert(rowDef.getMap(0).valueArray.getInt(0) == 0)
    // absent map field decodes to an empty map, encodes to nothing
    val rowEmpty = ProtoWire.decode(Array.emptyByteArray, m)
    assert(rowEmpty.getMap(0).numElements() == 0)
    assert(ProtoWire.encode(rowEmpty, m).isEmpty)
  }

  test("proto3 defaults: absent scalars decode to 0/\"\"; defaults are " +
      "omitted on encode; unknown fields are skipped") {
    val msg = ProtoMessage("M", Seq(
      ProtoField(1, "a", PInt32), ProtoField(2, "b", PString),
      ProtoField(3, "ok", PBool), ProtoField(4, "x", PDouble)))
    val row = ProtoWire.decode(Array.emptyByteArray, msg)
    assert(row.getInt(0) == 0 && row.getUTF8String(1).toString == ""
      && !row.getBoolean(2) && row.getDouble(3) == 0.0)
    assert(ProtoWire.encode(row, msg).isEmpty)
    // unknown field 9 (varint) + known field 1
    val wire = bytes(0x48, 0x7f, 0x08, 0x05)
    assert(ProtoWire.decode(wire, msg).getInt(0) == 5)
  }

  test("malformed bytes decode to null: invalid wire type, truncated " +
      "varint, overlong length") {
    assert(ProtoWire.decode(bytes(0x0f), test1) == null) // wire type 7
    assert(ProtoWire.decode(bytes(0x08, 0x96), test1) == null) // varint EOF
    assert(ProtoWire.decode(bytes(0x12, 0x7f, 0x61), // len 127 > remaining
      ProtoMessage("S", Seq(ProtoField(2, "b", PString)))) == null)
  }

  test("google.protobuf.Struct wire bytes flatten to JSON (M2)") {
    // Struct{"a": 1.5, "b": "x"} hand-encoded per struct.proto:
    //   entry a: key 0A 01 61, value 12 09 (11 + f64le(1.5))
    //   entry b: key 0A 01 62, value 12 03 (1A 01 78)
    val oneAndHalf = java.lang.Double.doubleToLongBits(1.5)
    val f64 = (0 until 8).map(i => ((oneAndHalf >>> (8 * i)) & 0xff).toInt)
    val entryA = bytes(0x0a, 0x01, 0x61, 0x12, 0x09, 0x11) ++ bytes(f64: _*)
    val entryB = bytes(0x0a, 0x01, 0x62, 0x12, 0x03, 0x1a, 0x01, 0x78)
    val wire = bytes(0x0a, entryA.length) ++ entryA ++
      bytes(0x0a, entryB.length) ++ entryB
    val json = ProtoWire.decodeStructJson(wire)
    assert(json.toString == """{"a":1.5,"b":"x"}""")
    // integral numbers render without a trailing .0; malformed → null
    assert(ProtoWire.decodeStructJson(bytes(0x0f)) == null)
  }

  test("duplicate Struct keys follow protobuf map-merge: the LAST entry " +
      "wins (streaming entries rendered {\"a\":1,\"a\":2}, and " +
      "get_json_object on duplicate keys returns the FIRST — inverting " +
      "the protobuf answer)") {
    // Struct{"a":1.0, "a":2.0} — legal wire, map merge keeps 2
    def numEntry(d: Double): Array[Byte] = {
      val b = java.lang.Double.doubleToLongBits(d)
      val f64 = (0 until 8).map(i => ((b >>> (8 * i)) & 0xff).toInt)
      bytes(0x0a, 0x01, 0x61, 0x12, 0x09, 0x11) ++ bytes(f64: _*)
    }
    val e1 = numEntry(1.0); val e2 = numEntry(2.0)
    val wire = bytes(0x0a, e1.length) ++ e1 ++ bytes(0x0a, e2.length) ++ e2
    assert(ProtoWire.decodeStructJson(wire).toString == """{"a":2}""")
  }

  test("the corrupt-tag aliasing guard covers the Struct-JSON readers " +
      "too: a tag past 2^32 inside a Struct nulls the decode instead of " +
      "aliasing onto field 1 and rendering garbage") {
    // varint of ((2^32+1) << 3 | 2): would alias to (field 1, wire 2) —
    // the fields entry — through a bare .toInt
    val tag = (((1L << 32) + 1L) << 3) | 2L
    val w = scala.collection.mutable.ArrayBuffer.empty[Int]
    var v = tag
    while ((v & ~0x7fL) != 0) { w += ((v & 0x7f) | 0x80).toInt; v >>>= 7 }
    w += v.toInt
    w += 0x00 // zero-length slice payload
    assert(ProtoWire.decodeStructJson(bytes(w.toSeq: _*)) == null,
      "out-of-range field number inside a Struct must be malformed")
  }

  test("null elements in a repeated field are OMITTED on encode, not an " +
      "NPE (strings) or a garbage packed 0 (numerics): ProtoEncode " +
      "deliberately accepts containsNull arrays — repeated proto fields " +
      "have no null notion") {
    val sess = spark
    val msg = ProtoMessage("m", Seq(
      ProtoField(1, "tags", PString, repeated = true),
      ProtoField(2, "ns", PInt64, repeated = true)))
    val df = sess.sql(
      "SELECT named_struct('tags', array('a', CAST(NULL AS STRING), 'b')," +
        " 'ns', array(7L, CAST(NULL AS BIGINT), 9L)) AS s")
    val encoded = df.select(
      graft.functions.ProtoFunctions.protoEncode(
        org.apache.spark.sql.functions.col("s"), msg).as("w"))
      .head.getAs[Array[Byte]]("w")
    val back = sess.createDataFrame(
      java.util.List.of(org.apache.spark.sql.Row(encoded)),
      org.apache.spark.sql.types.StructType(Seq(
        org.apache.spark.sql.types.StructField("w",
          org.apache.spark.sql.types.BinaryType))))
      .select(graft.functions.ProtoFunctions.protoDecode(
        org.apache.spark.sql.functions.col("w"), msg).as("d"))
      .head.getStruct(0)
    assert(back.getSeq[String](0) == Seq("a", "b"),
      s"null string element must be omitted: ${back.getSeq[String](0)}")
    assert(back.getSeq[Long](1) == Seq(7L, 9L),
      s"null numeric element must be omitted: ${back.getSeq[Long](1)}")
  }

  test("corrupt tags and pathological nesting are MALFORMED, not crashes: " +
      "a field number past 2^29-1 nulls out instead of aliasing through " +
      ".toInt, and a deeply nested Struct nulls out instead of " +
      "StackOverflowError") {
    // tag with fieldNo = 2^32 + 1, wire 0: varint of ((2^32+1) << 3 | 0).
    // Pre-fix, (tag >>> 3).toInt aliased this onto field 1 and decoded
    // the payload into the wrong column.
    val tag = ((1L << 32) + 1L) << 3
    val w = scala.collection.mutable.ArrayBuffer.empty[Int]
    var v = tag
    while ((v & ~0x7fL) != 0) { w += ((v & 0x7f) | 0x80).toInt; v >>>= 7 }
    w += v.toInt
    w += 0x01 // the varint payload that would have landed in field 1
    assert(ProtoWire.decode(bytes(w.toSeq: _*), test1) == null,
      "out-of-range field number must be malformed")
    // struct_value nesting 300 deep (cap: 100): each level is one map
    // entry {key "k", value = struct_value{...}} built inside-out
    var struct = Array.emptyByteArray
    for (_ <- 0 until 300) {
      val value = bytes(0x2a, struct.length) ++ struct // 5:struct_value
      val entry = bytes(0x0a, 0x01, 0x6b, 0x12, value.length) ++ value
      struct = bytes(0x0a, entry.length) ++ entry
    }
    assert(ProtoWire.decodeStructJson(struct) == null,
      "over-deep Struct must be malformed (DLQ), not a task-killing " +
        "StackOverflowError")
    // a legal depth still decodes
    var ok = Array.emptyByteArray
    for (_ <- 0 until 5) {
      val value = bytes(0x2a, ok.length) ++ ok
      val entry = bytes(0x0a, 0x01, 0x6b, 0x12, value.length) ++ value
      ok = bytes(0x0a, entry.length) ++ entry
    }
    assert(ProtoWire.decodeStructJson(ok) != null)

    // the exact cap edge (varint-correct lengths, since frames past ~18
    // levels exceed one length byte): depth counts container DESCENTS,
    // so root + 100 nested structs decodes, one more is malformed —
    // pre-fix the counter bumped twice per level and cut off at ~50
    def varint(n: Int): Array[Byte] = {
      val b = scala.collection.mutable.ArrayBuffer.empty[Byte]
      var v = n
      while ((v & ~0x7f) != 0) { b += ((v & 0x7f) | 0x80).toByte; v >>>= 7 }
      (b += v.toByte).toArray
    }
    def nested(levels: Int): Array[Byte] = {
      var s = Array.emptyByteArray
      for (_ <- 0 until levels) {
        val value = 0x2a.toByte +: (varint(s.length) ++ s)
        val entry = Array[Byte](0x0a, 0x01, 0x6b, 0x12) ++
          varint(value.length) ++ value
        s = 0x0a.toByte +: (varint(entry.length) ++ entry)
      }
      s
    }
    // nested(n) has n+1 container levels (the innermost empty
    // struct_value is itself a container): nested(100) is root + 100
    // descents — protobuf's limit — and nested(101) is one too many
    assert(ProtoWire.decodeStructJson(nested(100)) != null,
      "root + 100 nested container levels is within protobuf's limit")
    assert(ProtoWire.decodeStructJson(nested(101)) == null,
      "the 101st descent must be malformed")
  }

  test("a null map VALUE (valueContainsNull inputs pass the type check) " +
      "encodes as an omitted value field — decodes to the proto3 default") {
    import org.apache.spark.sql.Row
    import org.apache.spark.sql.types.{MapType, StringType, StructField,
      StructType}
    val msg = ProtoMessage("M",
      Seq(ProtoField(1, "m", PMap(PString, PString))))
    val schema = StructType(Seq(StructField("m",
      MapType(StringType, StringType, valueContainsNull = true))))
    val df = spark.createDataFrame(
      java.util.List.of(Row(Map("a" -> "x", "b" -> null))), schema)
    val out = df.select(
        ProtoFunctions.protoDecode(
          ProtoFunctions.protoEncode(struct(col("m")), msg), msg)
          .as("r"))
      .selectExpr("r.m as m").head().getMap[String, String](0)
    assert(out("a") == "x")
    assert(out("b") == "", "null value must decode as the proto3 default")
  }

  test("expression roundtrip over a DataFrame covers the full type surface " +
      "inside codegen") {
    import graft.functions.ProtoFunctions._
    val msg = ProtoMessage("all", Seq(
      ProtoField(1, "i32", PInt32), ProtoField(2, "i64", PInt64),
      ProtoField(3, "flag", PBool), ProtoField(4, "d", PDouble),
      ProtoField(5, "f", PFloat), ProtoField(6, "s", PString),
      ProtoField(7, "raw", PBytes),
      ProtoField(8, "tags", PString, repeated = true),
      ProtoField(9, "nums", PInt64, repeated = true),
      ProtoField(10, "sub", PMsg(test1))))
    val sess = spark
    import sess.implicits._
    val df = Seq(
      (7, 1L << 40, true, 2.5, 1.5f, "héllo → 世界", Array[Byte](1, 2),
        Seq("a", "b"), Seq(-1L, 0L, 300L), 150),
      (0, 0L, false, 0.0, 0.0f, "", Array.emptyByteArray,
        Seq.empty[String], Seq.empty[Long], 0),
      (-3, -9L, true, -0.25, -2f, "x", Array[Byte](-1),
        Seq(""), Seq(Long.MinValue, Long.MaxValue), -2))
      .toDF("i32", "i64", "flag", "d", "f", "s", "raw", "tags", "nums", "a")
    val in = df.select(struct(col("i32"), col("i64"), col("flag"), col("d"),
      col("f"), col("s"), col("raw"), col("tags"), col("nums"),
      struct(col("a")).as("sub")).as("m"))
    val out = in.select(
      protoDecode(protoEncode(col("m"), msg), msg).as("m2"), col("m"))
    val rows = out.collect()
    rows.foreach { r =>
      val (m2, m) = (r.getStruct(0), r.getStruct(1))
      assert(m2.getInt(0) == m.getInt(0) && m2.getLong(1) == m.getLong(1))
      assert(m2.getBoolean(2) == m.getBoolean(2))
      assert(m2.getDouble(3) == m.getDouble(3) && m2.getFloat(4) == m.getFloat(4))
      assert(m2.getString(5) == m.getString(5))
      assert(m2.getAs[Array[Byte]](6).sameElements(m.getAs[Array[Byte]](6)))
      assert(m2.getSeq[String](7) == m.getSeq[String](7))
      assert(m2.getSeq[Long](8) == m.getSeq[Long](8))
      assert(m2.getStruct(9).getInt(0) == m.getStruct(9).getInt(0))
    }
  }
}
