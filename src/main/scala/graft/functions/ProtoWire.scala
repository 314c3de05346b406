package graft.functions

import org.apache.spark.sql.catalyst.InternalRow
import org.apache.spark.sql.catalyst.expressions.GenericInternalRow
import org.apache.spark.sql.catalyst.util.{ArrayData, GenericArrayData}
import org.apache.spark.sql.types._
import org.apache.spark.unsafe.types.UTF8String
import scala.collection.mutable

/** Descriptor-driven protobuf **wire-format** codec — the real decode behind
  * the proto middleware (reference middleware/default.clj:36-85), built
  * directly on the public wire format ("Protocol Buffers Encoding",
  * protobuf.dev/programming-guides/encoding) because neither protobuf-java
  * nor spark-protobuf ships in this container. The descriptor model plays
  * the role of a compiled `Descriptors.Descriptor`: a user ports a message
  * by listing (field number, name, type), and decode/encode honor varint,
  * fixed32/64, and length-delimited wire types with proto3 default/omission
  * semantics, unknown-field skipping, nested messages, and packed or
  * unpacked repeated scalars.
  *
  * Malformed input returns null (never throws) — the E9 deserialization-
  * failure path, so corrupt records flow to the DLQ with raw bytes intact.
  *
  * Values are produced directly in Catalyst internal form (UTF8String,
  * GenericInternalRow, GenericArrayData): the [[ProtoDecode]] expression
  * hands bytes straight from the scan to this decoder inside codegen with
  * no external-row conversion.
  */
object ProtoWire {

  sealed trait PType
  object PType {
    /** varint, two's-complement negatives (canonical int32/int64/bool). */
    case object PInt32 extends PType
    case object PInt64 extends PType
    case object PBool extends PType
    /** length-delimited */
    case object PString extends PType
    case object PBytes extends PType
    /** fixed64 / fixed32 */
    case object PDouble extends PType
    case object PFloat extends PType
    /** length-delimited nested message */
    final case class PMsg(msg: ProtoMessage) extends PType
  }
  import PType._

  final case class ProtoField(number: Int, name: String, ptype: PType,
      repeated: Boolean = false)

  final case class ProtoMessage(name: String, fields: Seq[ProtoField]) {
    require(fields.map(_.number).distinct.size == fields.size,
      s"duplicate field numbers in $name")
    @transient lazy val byNumber: Map[Int, (ProtoField, Int)] =
      fields.zipWithIndex.map { case (f, i) => f.number -> (f, i) }.toMap
    @transient lazy val sparkType: StructType = StructType(fields.map { f =>
      val base: DataType = f.ptype match {
        case PInt32 => IntegerType
        case PInt64 => LongType
        case PBool => BooleanType
        case PString => StringType
        case PBytes => BinaryType
        case PDouble => DoubleType
        case PFloat => FloatType
        case PMsg(m) => m.sparkType
      }
      StructField(f.name,
        if (f.repeated) ArrayType(base, containsNull = false) else base)
    })
  }

  private final class Malformed extends Exception(null, null, false, false)
  private def fail(): Nothing = throw new Malformed

  // ---------------------------------------------------------------- decode

  private final class Reader(buf: Array[Byte], var pos: Int, val end: Int) {
    def hasMore: Boolean = pos < end
    def readByte(): Int = {
      if (pos >= end) fail()
      val b = buf(pos); pos += 1; b & 0xff
    }
    def readVarint(): Long = {
      var shift = 0; var res = 0L
      while (shift < 64) {
        val b = readByte()
        res |= (b & 0x7fL) << shift
        if ((b & 0x80) == 0) return res
        shift += 7
      }
      fail()
    }
    def readFixed64(): Long = {
      if (pos + 8 > end) fail()
      var res = 0L; var i = 0
      while (i < 8) { res |= (buf(pos + i) & 0xffL) << (8 * i); i += 1 }
      pos += 8; res
    }
    def readFixed32(): Int = {
      if (pos + 4 > end) fail()
      var res = 0; var i = 0
      while (i < 4) { res |= (buf(pos + i) & 0xff) << (8 * i); i += 1 }
      pos += 4; res
    }
    def readSlice(): (Int, Int) = {
      val len = readVarint()
      if (len < 0 || len > end - pos) fail()
      val off = pos; pos += len.toInt; (off, len.toInt)
    }
    def skip(wire: Int): Unit = wire match {
      case 0 => readVarint()
      case 1 => if (pos + 8 > end) fail() else pos += 8
      case 2 => readSlice()
      case 5 => if (pos + 4 > end) fail() else pos += 4
      case _ => fail() // groups (3/4) and invalid wire types
    }
  }

  /** Decode one message; null on malformed input (E9 corrupt path). */
  def decode(bytes: Array[Byte], msg: ProtoMessage): InternalRow =
    try decodeAt(bytes, 0, bytes.length, msg)
    catch { case _: Malformed => null }

  private def scalarOf(r: Reader, buf: Array[Byte], t: PType, wire: Int): Any =
    t match {
      case PInt32 => if (wire != 0) fail() else r.readVarint().toInt
      case PInt64 => if (wire != 0) fail() else r.readVarint()
      case PBool => if (wire != 0) fail() else r.readVarint() != 0L
      case PDouble => if (wire != 1) fail()
        else java.lang.Double.longBitsToDouble(r.readFixed64())
      case PFloat => if (wire != 5) fail()
        else java.lang.Float.intBitsToFloat(r.readFixed32())
      case PString => if (wire != 2) fail() else {
        val (off, len) = r.readSlice()
        UTF8String.fromBytes(buf, off, len)
      }
      case PBytes => if (wire != 2) fail() else {
        val (off, len) = r.readSlice()
        java.util.Arrays.copyOfRange(buf, off, off + len)
      }
      case PMsg(m) => if (wire != 2) fail() else {
        val (off, len) = r.readSlice()
        decodeAt(buf, off, off + len, m)
      }
    }

  /** Packed numeric element reader (wire type 2 carrying a scalar run). */
  private def packedOf(r: Reader, t: PType): Any = t match {
    case PInt32 => r.readVarint().toInt
    case PInt64 => r.readVarint()
    case PBool => r.readVarint() != 0L
    case PDouble => java.lang.Double.longBitsToDouble(r.readFixed64())
    case PFloat => java.lang.Float.intBitsToFloat(r.readFixed32())
    case _ => fail()
  }

  private def isPackable(t: PType): Boolean = t match {
    case PInt32 | PInt64 | PBool | PDouble | PFloat => true
    case _ => false
  }

  private def decodeAt(buf: Array[Byte], off: Int, end: Int,
      msg: ProtoMessage): InternalRow = {
    val r = new Reader(buf, off, end)
    val values = new Array[Any](msg.fields.length)
    var repeated: mutable.LongMap[mutable.ArrayBuffer[Any]] = null
    while (r.hasMore) {
      val tag = r.readVarint()
      val fieldNo = (tag >>> 3).toInt
      val wire = (tag & 7).toInt
      if (fieldNo <= 0) fail()
      msg.byNumber.get(fieldNo) match {
        case None => r.skip(wire)
        case Some((f, i)) if f.repeated =>
          if (repeated == null) repeated = new mutable.LongMap
          val acc = repeated.getOrElseUpdate(i.toLong, new mutable.ArrayBuffer)
          if (wire == 2 && isPackable(f.ptype)) {
            // packed run: parse elements to the end of the slice
            val (soff, slen) = r.readSlice()
            val pr = new Reader(buf, soff, soff + slen)
            while (pr.hasMore) acc += packedOf(pr, f.ptype)
          } else acc += scalarOf(r, buf, f.ptype, wire)
        case Some((f, i)) =>
          // last-one-wins for repeated occurrences of a singular field
          values(i) = scalarOf(r, buf, f.ptype, wire)
      }
    }
    // proto3 defaults for absent fields (what protobuf-java getField yields)
    var i = 0
    while (i < msg.fields.length) {
      val f = msg.fields(i)
      if (f.repeated) {
        val acc = if (repeated == null) None else repeated.get(i.toLong)
        values(i) = new GenericArrayData(
          acc.map(_.toArray).getOrElse(Array.empty[Any]))
      } else if (values(i) == null) {
        values(i) = f.ptype match {
          case PInt32 => 0
          case PInt64 => 0L
          case PBool => false
          case PDouble => 0.0
          case PFloat => 0.0f
          case PString => UTF8String.EMPTY_UTF8
          case PBytes => Array.emptyByteArray
          case PMsg(_) => null // absent sub-message stays null
        }
      }
      i += 1
    }
    new GenericInternalRow(values)
  }

  // ---------------------------------------------------------------- encode

  private final class Writer {
    private var buf = new Array[Byte](64)
    private var len = 0
    private def ensure(n: Int): Unit =
      if (len + n > buf.length)
        buf = java.util.Arrays.copyOf(buf, math.max(buf.length * 2, len + n))
    def writeByte(b: Int): Unit = { ensure(1); buf(len) = b.toByte; len += 1 }
    def writeVarint(v0: Long): Unit = {
      var v = v0
      while ((v & ~0x7fL) != 0) { writeByte(((v & 0x7f) | 0x80).toInt); v >>>= 7 }
      writeByte(v.toInt)
    }
    def writeTag(fieldNo: Int, wire: Int): Unit =
      writeVarint((fieldNo.toLong << 3) | wire)
    def writeFixed64(v: Long): Unit = {
      ensure(8); var i = 0
      while (i < 8) { buf(len + i) = ((v >>> (8 * i)) & 0xff).toByte; i += 1 }
      len += 8
    }
    def writeFixed32(v: Int): Unit = {
      ensure(4); var i = 0
      while (i < 4) { buf(len + i) = ((v >>> (8 * i)) & 0xff).toByte; i += 1 }
      len += 4
    }
    def writeBytes(b: Array[Byte], off: Int, n: Int): Unit = {
      ensure(n); System.arraycopy(b, off, buf, len, n); len += n
    }
    def toArray: Array[Byte] = java.util.Arrays.copyOf(buf, len)
  }

  /** Encode a Catalyst struct row per the descriptor — proto3 semantics:
    * scalar fields at their default (0 / "" / false / empty) and null
    * sub-messages are omitted; repeated numeric fields are packed. */
  def encode(row: InternalRow, msg: ProtoMessage): Array[Byte] = {
    val w = new Writer
    encodeInto(w, row, msg)
    w.toArray
  }

  private def encodeInto(w: Writer, row: InternalRow, msg: ProtoMessage): Unit = {
    var i = 0
    while (i < msg.fields.length) {
      val f = msg.fields(i)
      if (!row.isNullAt(i)) {
        if (f.repeated) {
          val arr = row.getArray(i)
          if (arr.numElements() > 0) encodeRepeated(w, arr, f)
        } else encodeScalar(w, row, i, f)
      }
      i += 1
    }
  }

  private def encodeScalar(w: Writer, row: InternalRow, i: Int,
      f: ProtoField): Unit = f.ptype match {
    case PInt32 => val v = row.getInt(i)
      if (v != 0) { w.writeTag(f.number, 0); w.writeVarint(v.toLong) }
    case PInt64 => val v = row.getLong(i)
      if (v != 0L) { w.writeTag(f.number, 0); w.writeVarint(v) }
    case PBool => if (row.getBoolean(i)) { w.writeTag(f.number, 0); w.writeVarint(1L) }
    case PDouble => val v = row.getDouble(i)
      // raw-bits zero check (proto3 rule): -0.0 != +0.0 and IS serialized
      if (java.lang.Double.doubleToRawLongBits(v) != 0L) {
        w.writeTag(f.number, 1)
        w.writeFixed64(java.lang.Double.doubleToLongBits(v)) }
    case PFloat => val v = row.getFloat(i)
      if (java.lang.Float.floatToRawIntBits(v) != 0) {
        w.writeTag(f.number, 5)
        w.writeFixed32(java.lang.Float.floatToIntBits(v)) }
    case PString => val s = row.getUTF8String(i)
      if (s.numBytes() > 0) { w.writeTag(f.number, 2)
        w.writeVarint(s.numBytes().toLong)
        w.writeBytes(s.getBytes, 0, s.numBytes()) }
    case PBytes => val b = row.getBinary(i)
      if (b.length > 0) { w.writeTag(f.number, 2)
        w.writeVarint(b.length.toLong); w.writeBytes(b, 0, b.length) }
    case PMsg(m) =>
      val sub = new Writer
      encodeInto(sub, row.getStruct(i, m.fields.length), m)
      val b = sub.toArray
      w.writeTag(f.number, 2); w.writeVarint(b.length.toLong)
      w.writeBytes(b, 0, b.length)
  }

  private def encodeRepeated(w: Writer, arr: ArrayData, f: ProtoField): Unit = {
    val n = arr.numElements()
    if (isPackable(f.ptype)) {
      val sub = new Writer
      var i = 0
      while (i < n) {
        f.ptype match {
          case PInt32 => sub.writeVarint(arr.getInt(i).toLong)
          case PInt64 => sub.writeVarint(arr.getLong(i))
          case PBool => sub.writeVarint(if (arr.getBoolean(i)) 1L else 0L)
          case PDouble =>
            sub.writeFixed64(java.lang.Double.doubleToLongBits(arr.getDouble(i)))
          case PFloat =>
            sub.writeFixed32(java.lang.Float.floatToIntBits(arr.getFloat(i)))
          case _ => ()
        }
        i += 1
      }
      val b = sub.toArray
      w.writeTag(f.number, 2); w.writeVarint(b.length.toLong)
      w.writeBytes(b, 0, b.length)
    } else {
      var i = 0
      while (i < n) {
        f.ptype match {
          case PString => val s = arr.getUTF8String(i)
            w.writeTag(f.number, 2); w.writeVarint(s.numBytes().toLong)
            w.writeBytes(s.getBytes, 0, s.numBytes())
          case PBytes => val b = arr.getBinary(i)
            w.writeTag(f.number, 2); w.writeVarint(b.length.toLong)
            w.writeBytes(b, 0, b.length)
          case PMsg(m) =>
            val sub = new Writer
            encodeInto(sub, arr.getStruct(i, m.fields.length), m)
            val b = sub.toArray
            w.writeTag(f.number, 2); w.writeVarint(b.length.toLong)
            w.writeBytes(b, 0, b.length)
          case _ => ()
        }
        i += 1
      }
    }
  }

  // -------------------------------------------- google.protobuf.Struct → JSON

  /** M2 Struct flatten (reference middleware/default.clj:9-34): decode
    * `google.protobuf.Struct` wire bytes into a JSON string column. Struct's
    * Value is recursively dynamic (struct/list members), which a static
    * Spark schema cannot express — JSON is the idiomatic Spark carrier for
    * that shape; query it with get_json_object/from_json downstream. Null on
    * malformed input. Struct/Value/ListValue field numbers per
    * google/protobuf/struct.proto (public). */
  def decodeStructJson(bytes: Array[Byte]): UTF8String =
    try {
      val out = new java.lang.StringBuilder
      structJson(bytes, 0, bytes.length, out)
      UTF8String.fromString(out.toString)
    } catch { case _: Malformed => null }

  /** Struct { map<string, Value> fields = 1 } — map entry {1:key, 2:value}. */
  private def structJson(buf: Array[Byte], off: Int, end: Int,
      out: java.lang.StringBuilder): Unit = {
    val r = new Reader(buf, off, end)
    out.append('{')
    var first = true
    while (r.hasMore) {
      val tag = r.readVarint()
      if ((tag >>> 3).toInt == 1 && (tag & 7) == 2) {
        val (eoff, elen) = r.readSlice()
        if (!first) out.append(',')
        first = false
        entryJson(buf, eoff, eoff + elen, out)
      } else r.skip((tag & 7).toInt)
    }
    out.append('}')
  }

  private def entryJson(buf: Array[Byte], off: Int, end: Int,
      out: java.lang.StringBuilder): Unit = {
    val r = new Reader(buf, off, end)
    var key: String = ""
    var voff = -1; var vend = -1
    while (r.hasMore) {
      val tag = r.readVarint()
      ((tag >>> 3).toInt, (tag & 7).toInt) match {
        case (1, 2) => val (o, l) = r.readSlice()
          key = new String(buf, o, l, java.nio.charset.StandardCharsets.UTF_8)
        case (2, 2) => val (o, l) = r.readSlice(); voff = o; vend = o + l
        case (_, w) => r.skip(w)
      }
    }
    jsonString(key, out)
    out.append(':')
    if (voff < 0) out.append("null") else valueJson(buf, voff, vend, out)
  }

  /** Value oneof: 1 null_value, 2 number_value, 3 string_value,
    * 4 bool_value, 5 struct_value, 6 list_value. */
  private def valueJson(buf: Array[Byte], off: Int, end: Int,
      out: java.lang.StringBuilder): Unit = {
    val r = new Reader(buf, off, end)
    var rendered = "null" // empty Value → null
    var complex: (Int, Int, Boolean) = null // (off, end, isList)
    while (r.hasMore) {
      val tag = r.readVarint()
      ((tag >>> 3).toInt, (tag & 7).toInt) match {
        case (1, 0) => r.readVarint(); rendered = "null"; complex = null
        case (2, 1) =>
          val d = java.lang.Double.longBitsToDouble(r.readFixed64())
          rendered = renderNumber(d); complex = null
        case (3, 2) => val (o, l) = r.readSlice()
          val sb = new java.lang.StringBuilder
          jsonString(new String(buf, o, l,
            java.nio.charset.StandardCharsets.UTF_8), sb)
          rendered = sb.toString; complex = null
        case (4, 0) =>
          rendered = if (r.readVarint() != 0L) "true" else "false"
          complex = null
        case (5, 2) => val (o, l) = r.readSlice()
          complex = (o, o + l, false)
        case (6, 2) => val (o, l) = r.readSlice()
          complex = (o, o + l, true)
        case (_, w) => r.skip(w)
      }
    }
    if (complex != null) {
      val (o, e, isList) = complex
      if (isList) listJson(buf, o, e, out) else structJson(buf, o, e, out)
    } else out.append(rendered)
  }

  /** ListValue { repeated Value values = 1 }. */
  private def listJson(buf: Array[Byte], off: Int, end: Int,
      out: java.lang.StringBuilder): Unit = {
    val r = new Reader(buf, off, end)
    out.append('[')
    var first = true
    while (r.hasMore) {
      val tag = r.readVarint()
      if ((tag >>> 3).toInt == 1 && (tag & 7) == 2) {
        val (o, l) = r.readSlice()
        if (!first) out.append(',')
        first = false
        valueJson(buf, o, o + l, out)
      } else r.skip((tag & 7).toInt)
    }
    out.append(']')
  }

  private def renderNumber(d: Double): String =
    if (d == math.rint(d) && !d.isInfinite && math.abs(d) < 9.007199254740992e15)
      d.toLong.toString
    else d.toString

  private def jsonString(s: String, out: java.lang.StringBuilder): Unit = {
    out.append('"')
    var i = 0
    while (i < s.length) {
      val c = s.charAt(i)
      c match {
        case '"' => out.append("\\\"")
        case '\\' => out.append("\\\\")
        case '\b' => out.append("\\b")
        case '\f' => out.append("\\f")
        case '\n' => out.append("\\n")
        case '\r' => out.append("\\r")
        case '\t' => out.append("\\t")
        case _ if c < 0x20 => out.append(f"\\u${c.toInt}%04x")
        case _ => out.append(c)
      }
      i += 1
    }
    out.append('"')
  }
}
