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
  * by listing (field number, name, type), and decode/encode honor varint
  * (two's-complement and zigzag sint32/64), fixed32/64 (float/double and
  * signed sfixed32/64), and length-delimited wire types with proto3
  * default/omission semantics, unknown-field skipping, nested messages,
  * open enums, map fields, and packed or unpacked repeated scalars.
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
    /** varint, zigzag-coded (`sint32`/`sint64` — negatives stay short). */
    case object PSInt32 extends PType
    case object PSInt64 extends PType
    /** fixed-width signed (`sfixed32` wire 5 / `sfixed64` wire 1). */
    case object PSFixed32 extends PType
    case object PSFixed64 extends PType
    /** length-delimited */
    case object PString extends PType
    case object PBytes extends PType
    /** fixed64 / fixed32 */
    case object PDouble extends PType
    case object PFloat extends PType
    /** Open enum (proto3): decoded to the symbol name as a string column;
      * unknown numbers keep their decimal rendering (proto3 preserves
      * unrecognized enum values), so decode∘encode is lossless for them
      * too. Default (0) follows scalar omission rules. */
    final case class PEnum(name: String,
        symbols: Map[Int, String]) extends PType {
      @transient lazy val byName: Map[String, Int] = symbols.map(_.swap)
      def symbolOf(n: Int): String = symbols.getOrElse(n, n.toString)
      /** Number for a symbol; unknown symbols round-trip via their decimal
        * form, anything else encodes as 0 (omitted). */
      def numberOf(s: String): Int = byName.getOrElse(s,
        try s.toInt catch { case _: NumberFormatException => 0 })
    }
    /** `map<k,v>` — wire = repeated `{1: key, 2: value}` entries; last
      * occurrence of a key wins (protobuf merge semantics). Singular only
      * (maps cannot be `repeated` in proto). */
    final case class PMap(key: PType, value: PType) extends PType {
      require(key match {
        case PInt32 | PInt64 | PSInt32 | PSInt64 | PSFixed32 | PSFixed64 |
             PBool | PString => true
        case _ => false
      }, "proto map keys must be integral, bool, or string")
      require(value match {
        case _: PMap => false
        case _ => true
      }, "proto map values cannot be maps")
    }
    /** length-delimited nested message */
    final case class PMsg(msg: ProtoMessage) extends PType
  }
  import PType._

  private def sparkTypeOf(t: PType): DataType = t match {
    case PInt32 | PSInt32 | PSFixed32 => IntegerType
    case PInt64 | PSInt64 | PSFixed64 => LongType
    case PBool => BooleanType
    case PString => StringType
    case PBytes => BinaryType
    case PDouble => DoubleType
    case PFloat => FloatType
    case _: PEnum => StringType
    case PMap(k, v) =>
      MapType(sparkTypeOf(k), sparkTypeOf(v), valueContainsNull = false)
    case PMsg(m) => m.sparkType
  }

  final case class ProtoField(number: Int, name: String, ptype: PType,
      repeated: Boolean = false) {
    require(!(repeated && ptype.isInstanceOf[PMap]),
      s"map field $name cannot be repeated")
  }

  final case class ProtoMessage(name: String, fields: Seq[ProtoField]) {
    require(fields.map(_.number).distinct.size == fields.size,
      s"duplicate field numbers in $name")
    @transient lazy val byNumber: Map[Int, (ProtoField, Int)] =
      fields.zipWithIndex.map { case (f, i) => f.number -> (f, i) }.toMap
    @transient lazy val sparkType: StructType = StructType(fields.map { f =>
      val base = sparkTypeOf(f.ptype)
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

  /** Zigzag decode (shared 32/64-bit shape; callers truncate for 32). */
  private def unzigzag(z: Long): Long = (z >>> 1) ^ -(z & 1L)

  private def scalarOf(r: Reader, buf: Array[Byte], t: PType, wire: Int): Any =
    t match {
      case PInt32 => if (wire != 0) fail() else r.readVarint().toInt
      case PInt64 => if (wire != 0) fail() else r.readVarint()
      case PBool => if (wire != 0) fail() else r.readVarint() != 0L
      case PSInt32 => if (wire != 0) fail()
        else unzigzag(r.readVarint()).toInt
      case PSInt64 => if (wire != 0) fail() else unzigzag(r.readVarint())
      case PSFixed32 => if (wire != 5) fail() else r.readFixed32()
      case PSFixed64 => if (wire != 1) fail() else r.readFixed64()
      case PDouble => if (wire != 1) fail()
        else java.lang.Double.longBitsToDouble(r.readFixed64())
      case PFloat => if (wire != 5) fail()
        else java.lang.Float.intBitsToFloat(r.readFixed32())
      case e: PEnum => if (wire != 0) fail()
        else UTF8String.fromString(e.symbolOf(r.readVarint().toInt))
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
      case _: PMap => fail() // map entries are parsed at field level
    }

  /** Packed numeric element reader (wire type 2 carrying a scalar run). */
  private def packedOf(r: Reader, t: PType): Any = t match {
    case PInt32 => r.readVarint().toInt
    case PInt64 => r.readVarint()
    case PBool => r.readVarint() != 0L
    case PSInt32 => unzigzag(r.readVarint()).toInt
    case PSInt64 => unzigzag(r.readVarint())
    case PSFixed32 => r.readFixed32()
    case PSFixed64 => r.readFixed64()
    case PDouble => java.lang.Double.longBitsToDouble(r.readFixed64())
    case PFloat => java.lang.Float.intBitsToFloat(r.readFixed32())
    case e: PEnum => UTF8String.fromString(e.symbolOf(r.readVarint().toInt))
    case _ => fail()
  }

  private def isPackable(t: PType): Boolean = t match {
    case PInt32 | PInt64 | PBool | PDouble | PFloat |
         PSInt32 | PSInt64 | PSFixed32 | PSFixed64 | (_: PEnum) => true
    case _ => false
  }

  /** One `map<k,v>` entry slice → (key, value); absent key/value take the
    * proto3 default (protobuf-java's map merge behavior). */
  /** Field number from a tag, with the aliasing guard: proto field
    * numbers max out at 2^29 − 1, and a corrupt tag past 2^32 would
    * alias onto a small valid number through a bare `.toInt` and decode
    * garbage into the wrong column instead of nulling the record out.
    * The ONE copy of the check — decodeAt had it and the five other
    * readers (map entries and the whole Struct-JSON family) did not. */
  private def fieldOf(tag: Long): Int = {
    val f = tag >>> 3
    if (f <= 0 || f > ((1L << 29) - 1)) fail()
    f.toInt
  }

  private def mapEntryOf(buf: Array[Byte], off: Int, end: Int,
      pm: PMap): (Any, Any) = {
    val r = new Reader(buf, off, end)
    var k: Any = null; var v: Any = null
    while (r.hasMore) {
      val tag = r.readVarint()
      val wire = (tag & 7).toInt
      fieldOf(tag) match {
        case 1 => k = scalarOf(r, buf, pm.key, wire)
        case 2 => v = scalarOf(r, buf, pm.value, wire)
        case _ => r.skip(wire)
      }
    }
    (if (k == null) defaultOf(pm.key) else k,
      if (v == null) defaultOf(pm.value) else v)
  }

  private def defaultOf(t: PType): Any = t match {
    case PInt32 | PSInt32 | PSFixed32 => 0
    case PInt64 | PSInt64 | PSFixed64 => 0L
    case PBool => false
    case PDouble => 0.0
    case PFloat => 0.0f
    case PString => UTF8String.EMPTY_UTF8
    case PBytes => Array.emptyByteArray
    case e: PEnum => UTF8String.fromString(e.symbolOf(0))
    case _: PMap => org.apache.spark.sql.catalyst.util.ArrayBasedMapData(
      Array.empty[Any], Array.empty[Any])
    // absent sub-message stays null; a map VALUE sub-message defaults to
    // the empty message (protobuf-java's default instance)
    case PMsg(m) => decodeAt(Array.emptyByteArray, 0, 0, m)
  }

  private def decodeAt(buf: Array[Byte], off: Int, end: Int,
      msg: ProtoMessage): InternalRow = {
    val r = new Reader(buf, off, end)
    val values = new Array[Any](msg.fields.length)
    var repeated: mutable.LongMap[mutable.ArrayBuffer[Any]] = null
    var maps: mutable.LongMap[mutable.LinkedHashMap[Any, Any]] = null
    while (r.hasMore) {
      val tag = r.readVarint()
      val wire = (tag & 7).toInt
      val fieldNo = fieldOf(tag)
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
        case Some((f, i)) => f.ptype match {
          case pm: PMap =>
            if (wire != 2) fail()
            val (eoff, elen) = r.readSlice()
            if (maps == null) maps = new mutable.LongMap
            val acc = maps.getOrElseUpdate(i.toLong, new mutable.LinkedHashMap)
            val (k, v) = mapEntryOf(buf, eoff, eoff + elen, pm)
            acc.put(k, v) // last entry wins; key keeps first-seen position
          case _ =>
            // last-one-wins for repeated occurrences of a singular field
            values(i) = scalarOf(r, buf, f.ptype, wire)
        }
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
      } else if (f.ptype.isInstanceOf[PMap]) {
        val acc = if (maps == null) None else maps.get(i.toLong)
        values(i) = acc match {
          case Some(m) => org.apache.spark.sql.catalyst.util.ArrayBasedMapData(
            m.keys.toArray, m.values.toArray)
          case None => defaultOf(f.ptype)
        }
      } else if (values(i) == null) {
        values(i) = f.ptype match {
          case PMsg(_) => null // absent singular sub-message stays null
          case t => defaultOf(t)
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
        } else f.ptype match {
          case pm: PMap => encodeMapEntries(w, f.number, pm, row.getMap(i))
          case _ => encodeScalar(w, row, i, f.number, f.ptype)
        }
      }
      i += 1
    }
  }

  /** Zigzag encode; the 32-bit form masks to an unsigned 32-bit varint
    * (what protobuf-java's writeSInt32NoTag emits). */
  private def zigzag64(v: Long): Long = (v << 1) ^ (v >> 63)
  private def zigzag32(v: Int): Long = ((v << 1) ^ (v >> 31)).toLong & 0xffffffffL

  /** Encode one singular value with proto3 default omission. `g` is either
    * the enclosing row or a map entry's key/value array (both are
    * SpecializedGetters, so map entries reuse the scalar rules). */
  private def encodeScalar(w: Writer,
      g: org.apache.spark.sql.catalyst.expressions.SpecializedGetters, i: Int,
      number: Int, t: PType): Unit = t match {
    case PInt32 => val v = g.getInt(i)
      if (v != 0) { w.writeTag(number, 0); w.writeVarint(v.toLong) }
    case PInt64 => val v = g.getLong(i)
      if (v != 0L) { w.writeTag(number, 0); w.writeVarint(v) }
    case PBool => if (g.getBoolean(i)) { w.writeTag(number, 0); w.writeVarint(1L) }
    case PSInt32 => val v = g.getInt(i)
      if (v != 0) { w.writeTag(number, 0); w.writeVarint(zigzag32(v)) }
    case PSInt64 => val v = g.getLong(i)
      if (v != 0L) { w.writeTag(number, 0); w.writeVarint(zigzag64(v)) }
    case PSFixed32 => val v = g.getInt(i)
      if (v != 0) { w.writeTag(number, 5); w.writeFixed32(v) }
    case PSFixed64 => val v = g.getLong(i)
      if (v != 0L) { w.writeTag(number, 1); w.writeFixed64(v) }
    case PDouble => val v = g.getDouble(i)
      // raw-bits zero check (proto3 rule): -0.0 != +0.0 and IS serialized
      if (java.lang.Double.doubleToRawLongBits(v) != 0L) {
        w.writeTag(number, 1)
        w.writeFixed64(java.lang.Double.doubleToLongBits(v)) }
    case PFloat => val v = g.getFloat(i)
      if (java.lang.Float.floatToRawIntBits(v) != 0) {
        w.writeTag(number, 5)
        w.writeFixed32(java.lang.Float.floatToIntBits(v)) }
    case e: PEnum => val n = e.numberOf(g.getUTF8String(i).toString)
      if (n != 0) { w.writeTag(number, 0); w.writeVarint(n.toLong) }
    case PString => val s = g.getUTF8String(i)
      if (s.numBytes() > 0) { w.writeTag(number, 2)
        w.writeVarint(s.numBytes().toLong)
        w.writeBytes(s.getBytes, 0, s.numBytes()) }
    case PBytes => val b = g.getBinary(i)
      if (b.length > 0) { w.writeTag(number, 2)
        w.writeVarint(b.length.toLong); w.writeBytes(b, 0, b.length) }
    case PMsg(m) =>
      val sub = new Writer
      encodeInto(sub, g.getStruct(i, m.fields.length), m)
      val b = sub.toArray
      w.writeTag(number, 2); w.writeVarint(b.length.toLong)
      w.writeBytes(b, 0, b.length)
    case _: PMap => () // handled by encodeMapEntries at field level
  }

  /** Each map entry is one length-delimited `{1: key, 2: value}` message;
    * default-valued keys/values are omitted inside the entry (decode
    * restores them), matching protobuf-java's proto3 map serialization. */
  private def encodeMapEntries(w: Writer, number: Int, pm: PMap,
      map: org.apache.spark.sql.catalyst.util.MapData): Unit = {
    val ka = map.keyArray()
    val va = map.valueArray()
    var j = 0
    while (j < map.numElements()) {
      val sub = new Writer
      encodeScalar(sub, ka, j, 1, pm.key)
      // a null map value (valueContainsNull inputs) encodes as an
      // OMITTED value field — the decoder yields the proto3 default,
      // the closest wire-representable meaning (proto map values have
      // no null)
      if (!va.isNullAt(j)) encodeScalar(sub, va, j, 2, pm.value)
      val b = sub.toArray
      w.writeTag(number, 2); w.writeVarint(b.length.toLong)
      w.writeBytes(b, 0, b.length)
      j += 1
    }
  }

  private def encodeRepeated(w: Writer, arr: ArrayData, f: ProtoField): Unit = {
    val n = arr.numElements()
    // null elements are OMITTED, the same rule the map-value encoder
    // applies: ProtoEncode's type check deliberately accepts
    // containsNull=true arrays (repeated proto fields have no null
    // notion), and an unchecked slot NPE'd on string/bytes/message
    // elements while a packed numeric silently encoded a garbage 0
    if (isPackable(f.ptype)) {
      val sub = new Writer
      var i = 0
      while (i < n) {
        if (!arr.isNullAt(i)) f.ptype match {
          case PInt32 => sub.writeVarint(arr.getInt(i).toLong)
          case PInt64 => sub.writeVarint(arr.getLong(i))
          case PBool => sub.writeVarint(if (arr.getBoolean(i)) 1L else 0L)
          case PSInt32 => sub.writeVarint(zigzag32(arr.getInt(i)))
          case PSInt64 => sub.writeVarint(zigzag64(arr.getLong(i)))
          case PSFixed32 => sub.writeFixed32(arr.getInt(i))
          case PSFixed64 => sub.writeFixed64(arr.getLong(i))
          case PDouble =>
            sub.writeFixed64(java.lang.Double.doubleToLongBits(arr.getDouble(i)))
          case PFloat =>
            sub.writeFixed32(java.lang.Float.floatToIntBits(arr.getFloat(i)))
          case e: PEnum =>
            sub.writeVarint(e.numberOf(arr.getUTF8String(i).toString).toLong)
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
        if (!arr.isNullAt(i)) f.ptype match {
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
      structJson(bytes, 0, bytes.length, out, 0)
      UTF8String.fromString(out.toString)
    } catch { case _: Malformed => null }

  /** Struct nesting cap (protobuf's own default recursion limit):
    * deeper input is treated as MALFORMED — returns null for the DLQ
    * like any other corrupt record. Unbounded, a ~100 KB blob encoding
    * tens of thousands of struct_value levels would recurse to
    * StackOverflowError, an Error the Malformed catch cannot contain —
    * killing the task deterministically on every retry instead of
    * dead-lettering the record. Depth counts CONTAINER descents: it is
    * incremented exactly once per descent into a nested Struct or
    * ListValue (the valueJson→structJson/listJson edges only), so a
    * payload with 100 nested container levels below the root decodes
    * and the 101st descent is malformed (ProtoWireSpec pins the edge). */
  private val MaxStructDepth = 100

  /** Struct { map<string, Value> fields = 1 } — map entry {1:key, 2:value}. */
  private def structJson(buf: Array[Byte], off: Int, end: Int,
      out: java.lang.StringBuilder, depth: Int): Unit = {
    if (depth > MaxStructDepth) fail()
    val r = new Reader(buf, off, end)
    // protobuf map-merge semantics: a repeated key keeps the LAST
    // entry's value (same rule decodeAt applies via its LinkedHashMap).
    // Streaming entries straight to the output rendered duplicate JSON
    // keys — {"a":1,"a":2} — where get_json_object returns the FIRST,
    // inverting the protobuf answer. Key keeps first-seen position.
    val entries = new mutable.LinkedHashMap[String, String]
    while (r.hasMore) {
      val tag = r.readVarint()
      if (fieldOf(tag) == 1 && (tag & 7) == 2) {
        val (eoff, elen) = r.readSlice()
        val (k, v) = entryRendered(buf, eoff, eoff + elen, depth)
        entries.put(k, v)
      } else r.skip((tag & 7).toInt)
    }
    out.append('{')
    var first = true
    entries.foreach { case (k, v) =>
      if (!first) out.append(',')
      first = false
      jsonString(k, out)
      out.append(':')
      out.append(v)
    }
    out.append('}')
  }

  private def entryRendered(buf: Array[Byte], off: Int, end: Int,
      depth: Int): (String, String) = {
    val r = new Reader(buf, off, end)
    var key: String = ""
    var voff = -1; var vend = -1
    while (r.hasMore) {
      val tag = r.readVarint()
      (fieldOf(tag), (tag & 7).toInt) match {
        case (1, 2) => val (o, l) = r.readSlice()
          key = new String(buf, o, l, java.nio.charset.StandardCharsets.UTF_8)
        case (2, 2) => val (o, l) = r.readSlice(); voff = o; vend = o + l
        case (_, w) => r.skip(w)
      }
    }
    val sb = new java.lang.StringBuilder
    if (voff < 0) sb.append("null")
    else valueJson(buf, voff, vend, sb, depth)
    (key, sb.toString)
  }

  /** Value oneof: 1 null_value, 2 number_value, 3 string_value,
    * 4 bool_value, 5 struct_value, 6 list_value. */
  private def valueJson(buf: Array[Byte], off: Int, end: Int,
      out: java.lang.StringBuilder, depth: Int): Unit = {
    if (depth > MaxStructDepth) fail()
    val r = new Reader(buf, off, end)
    var rendered = "null" // empty Value → null
    var complex: (Int, Int, Boolean) = null // (off, end, isList)
    while (r.hasMore) {
      val tag = r.readVarint()
      (fieldOf(tag), (tag & 7).toInt) match {
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
      if (isList) listJson(buf, o, e, out, depth + 1)
      else structJson(buf, o, e, out, depth + 1)
    } else out.append(rendered)
  }

  /** ListValue { repeated Value values = 1 }. */
  private def listJson(buf: Array[Byte], off: Int, end: Int,
      out: java.lang.StringBuilder, depth: Int): Unit = {
    if (depth > MaxStructDepth) fail()
    val r = new Reader(buf, off, end)
    out.append('[')
    var first = true
    while (r.hasMore) {
      val tag = r.readVarint()
      if (fieldOf(tag) == 1 && (tag & 7) == 2) {
        val (o, l) = r.readSlice()
        if (!first) out.append(',')
        first = false
        valueJson(buf, o, o + l, out, depth)
      } else r.skip((tag & 7).toInt)
    }
    out.append(']')
  }

  private def renderNumber(d: Double): String =
    if (d.isNaN) "\"NaN\""
    else if (d.isInfinite) { if (d > 0) "\"Infinity\"" else "\"-Infinity\"" }
    else if (d == math.rint(d) && math.abs(d) < 9.007199254740992e15)
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
