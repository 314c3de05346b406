package graft.functions

import graft.functions.ProtoWire._
import graft.functions.ProtoWire.PType._
import org.apache.spark.sql.catalyst.expressions.GenericInternalRow
import org.apache.spark.sql.catalyst.util.GenericArrayData
import org.apache.spark.unsafe.types.UTF8String
import org.scalacheck.{Gen, Prop, Test => SCTest}
import org.scalatest.funsuite.AnyFunSuite

/** Property tests: decode ∘ encode ≡ id over the whole value space the
  * codec supports — extreme ints, NaN-free doubles, arbitrary unicode,
  * arbitrary bytes, empty and large repeated fields. proto3 default
  * omission means "roundtrip" is exact for every representable value
  * (defaults encode to nothing and decode back to defaults). Uses
  * scalacheck's engine directly (no scalatestplus bridge in this build). */
class ProtoWirePropSpec extends AnyFunSuite {

  private def check(p: Prop): Unit = {
    val res = SCTest.check(SCTest.Parameters.default.withMinSuccessfulTests(300), p)
    assert(res.passed, res.status.toString)
  }

  private val msg = ProtoMessage("prop", Seq(
    ProtoField(1, "i32", PInt32),
    ProtoField(2, "i64", PInt64),
    ProtoField(3, "flag", PBool),
    ProtoField(4, "d", PDouble),
    ProtoField(5, "f", PFloat),
    ProtoField(6, "s", PString),
    ProtoField(7, "raw", PBytes),
    ProtoField(8, "nums", PInt64, repeated = true),
    ProtoField(9, "tags", PString, repeated = true)))

  private val genRow = for {
    i32 <- Gen.oneOf(Gen.choose(Int.MinValue, Int.MaxValue),
      Gen.oneOf(0, -1, 1, Int.MinValue, Int.MaxValue))
    i64 <- Gen.oneOf(Gen.choose(Long.MinValue, Long.MaxValue),
      Gen.oneOf(0L, -1L, Long.MinValue, Long.MaxValue))
    flag <- Gen.oneOf(true, false)
    d <- Gen.oneOf(Gen.choose(-1e300, 1e300),
      Gen.oneOf(0.0, -0.0, Double.MinPositiveValue, 1.0 / 3.0))
    f <- Gen.choose(-1e30f, 1e30f)
    s <- Gen.oneOf(Gen.asciiPrintableStr,
      Gen.listOf(Gen.oneOf('中', '→', 'ß', 'π', 'a', ' ')).map(_.mkString))
    raw <- Gen.containerOf[Array, Byte](Gen.choose(Byte.MinValue, Byte.MaxValue))
    nums <- Gen.listOf(Gen.choose(Long.MinValue, Long.MaxValue))
    tags <- Gen.listOf(Gen.asciiPrintableStr)
  } yield new GenericInternalRow(Array[Any](
    i32, i64, flag, d, f, UTF8String.fromString(s), raw,
    new GenericArrayData(nums.toArray[Any]),
    new GenericArrayData(tags.map(t =>
      UTF8String.fromString(t): Any).toArray)))

  test("decode(encode(row)) reproduces every field exactly") {
    check(Prop.forAll(genRow) { row =>
      val back = ProtoWire.decode(ProtoWire.encode(row, msg), msg)
      back != null &&
        back.getInt(0) == row.getInt(0) &&
        back.getLong(1) == row.getLong(1) &&
        back.getBoolean(2) == row.getBoolean(2) &&
        java.lang.Double.compare(back.getDouble(3), row.getDouble(3)) == 0 &&
        java.lang.Float.compare(back.getFloat(4), row.getFloat(4)) == 0 &&
        back.getUTF8String(5) == row.getUTF8String(5) &&
        java.util.Arrays.equals(back.getBinary(6), row.getBinary(6)) &&
        back.getArray(7).toLongArray().toSeq ==
          row.getArray(7).toLongArray().toSeq &&
        (0 until back.getArray(8).numElements()).map(
          back.getArray(8).getUTF8String) ==
          (0 until row.getArray(8).numElements()).map(
            row.getArray(8).getUTF8String)
    })
  }

  // ---- round 4: zigzag / signed-fixed / enum / map type matrix ----

  private val quality = PEnum("quality",
    Map(0 -> "UNSPECIFIED", 1 -> "GOOD", 2 -> "BAD", 5 -> "UGLY"))

  private val msg2 = ProtoMessage("prop2", Seq(
    ProtoField(1, "si32", PSInt32),
    ProtoField(2, "si64", PSInt64),
    ProtoField(3, "sf32", PSFixed32),
    ProtoField(4, "sf64", PSFixed64),
    ProtoField(5, "q", quality),
    ProtoField(6, "attrs", PMap(PString, PInt64)),
    ProtoField(7, "names", PMap(PInt32, PString)),
    ProtoField(8, "zigs", PSInt64, repeated = true),
    ProtoField(9, "quals", quality, repeated = true)))

  /** Enum strings that survive name→number→name: known symbols, or decimal
    * renderings of numbers with no symbol (proto3 open-enum preservation).
    * "1" or "0" would canonicalize to a name, so they are excluded. */
  private val genEnumStr = Gen.oneOf(
    Gen.oneOf("UNSPECIFIED", "GOOD", "BAD", "UGLY"),
    Gen.oneOf(Gen.choose(6, 10000), Gen.choose(-10000, -1)).map(_.toString))

  private def mapData(pairs: Seq[(Any, Any)]) =
    org.apache.spark.sql.catalyst.util.ArrayBasedMapData(
      pairs.map(_._1).toArray, pairs.map(_._2).toArray)

  private val genRow2 = for {
    si32 <- Gen.oneOf(Gen.choose(Int.MinValue, Int.MaxValue),
      Gen.oneOf(0, -1, 1, Int.MinValue, Int.MaxValue))
    si64 <- Gen.oneOf(Gen.choose(Long.MinValue, Long.MaxValue),
      Gen.oneOf(0L, -1L, Long.MinValue, Long.MaxValue))
    sf32 <- Gen.choose(Int.MinValue, Int.MaxValue)
    sf64 <- Gen.choose(Long.MinValue, Long.MaxValue)
    q <- genEnumStr
    attrs <- Gen.mapOf(Gen.zip(Gen.asciiPrintableStr,
      Gen.choose(Long.MinValue, Long.MaxValue)))
    names <- Gen.mapOf(Gen.zip(Gen.choose(Int.MinValue, Int.MaxValue),
      Gen.asciiPrintableStr))
    zigs <- Gen.listOf(Gen.choose(Long.MinValue, Long.MaxValue))
    quals <- Gen.listOf(genEnumStr)
  } yield new GenericInternalRow(Array[Any](
    si32, si64, sf32, sf64, UTF8String.fromString(q),
    mapData(attrs.toSeq.map { case (k, v) =>
      (UTF8String.fromString(k): Any, v: Any) }),
    mapData(names.toSeq.map { case (k, v) =>
      (k: Any, UTF8String.fromString(v): Any) }),
    new GenericArrayData(zigs.toArray[Any]),
    new GenericArrayData(quals.map(s =>
      UTF8String.fromString(s): Any).toArray)))

  private def strLongPairs(m: org.apache.spark.sql.catalyst.util.MapData) =
    (0 until m.numElements()).map(i =>
      m.keyArray.getUTF8String(i).toString -> m.valueArray.getLong(i))

  private def intStrPairs(m: org.apache.spark.sql.catalyst.util.MapData) =
    (0 until m.numElements()).map(i =>
      m.keyArray.getInt(i) -> m.valueArray.getUTF8String(i).toString)

  test("zigzag/sfixed/enum/map round-trip: decode(encode(row)) reproduces " +
      "every field exactly") {
    check(Prop.forAll(genRow2) { row =>
      val back = ProtoWire.decode(ProtoWire.encode(row, msg2), msg2)
      back != null &&
        back.getInt(0) == row.getInt(0) &&
        back.getLong(1) == row.getLong(1) &&
        back.getInt(2) == row.getInt(2) &&
        back.getLong(3) == row.getLong(3) &&
        back.getUTF8String(4) == row.getUTF8String(4) &&
        strLongPairs(back.getMap(5)) == strLongPairs(row.getMap(5)) &&
        intStrPairs(back.getMap(6)) == intStrPairs(row.getMap(6)) &&
        back.getArray(7).toLongArray().toSeq ==
          row.getArray(7).toLongArray().toSeq &&
        (0 until back.getArray(8).numElements()).map(
          back.getArray(8).getUTF8String) ==
          (0 until row.getArray(8).numElements()).map(
            row.getArray(8).getUTF8String)
    })
  }

  test("decode never throws on arbitrary byte garbage over the extended " +
      "type matrix (returns row or null)") {
    check(Prop.forAll(
      Gen.containerOf[Array, Byte](Gen.choose(Byte.MinValue, Byte.MaxValue))) {
      bytes =>
        ProtoWire.decode(bytes, msg2) match {
          case _ => true
        }
    })
  }

  test("decode never throws on arbitrary byte garbage (returns row or null)") {
    check(Prop.forAll(
      Gen.containerOf[Array, Byte](Gen.choose(Byte.MinValue, Byte.MaxValue))) {
      bytes =>
        ProtoWire.decode(bytes, msg) match {
          case _ => true // any non-throwing outcome is the contract
        }
    })
  }

  test("struct-json decode never throws on arbitrary bytes and always " +
      "yields valid-shaped JSON or null") {
    check(Prop.forAll(
      Gen.containerOf[Array, Byte](Gen.choose(Byte.MinValue, Byte.MaxValue))) {
      bytes =>
        val j = ProtoWire.decodeStructJson(bytes)
        j == null || {
          val s = j.toString
          s.startsWith("{") && s.endsWith("}")
        }
    })
  }
}
