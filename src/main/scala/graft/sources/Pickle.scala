package graft.sources

import java.io.{BufferedOutputStream, FileOutputStream}
import java.nio.{ByteBuffer, ByteOrder}
import java.nio.charset.StandardCharsets
import java.nio.file.{Files, Paths}
import java.sql.Timestamp

import scala.collection.mutable

import org.apache.spark.sql.{DataFrame, Row, SparkSession}
import org.apache.spark.sql.types._

import graft.api.PsDataFrame

/** Python-pickle ingestion/egress — the Spark face of the reference's
  * `read_pickle` / `to_pickle` (reference: pandasql/io.py:37-40,
  * core.py:640), previously the one declared out-of-scope reference API.
  *
  * The pickle wire format is public (CPython's pickletools documents
  * every opcode; PEPs 307/3154/574 cover protocols 2/4/5), and a pandas
  * `DataFrame` pickle is a deterministic composition of a handful of
  * public constructors: `DataFrame.__reduce__` → NEWOBJ + BUILD with a
  * state dict whose `_mgr` is `BlockManager(blocks, axes)`, each block
  * `_unpickle_block(ndarray, placement, ndim)`, each ndarray
  * `_reconstruct` + BUILD with `(version, shape, dtype, fortran, data)`.
  * This file implements (a) a stack-machine unpickler for the protocol
  * 0-5 opcode subset those pickles use, (b) handlers for the
  * numpy/pandas reconstruction globals, and (c) a protocol-2 pickler
  * that emits a `pandas.core.frame.DataFrame(dict_of_lists)` constructor
  * call, so files we write unpickle to a genuine DataFrame wherever
  * pandas is installed.
  *
  * Like `read_numpy` (Npy.scala) and the reference's own
  * `pd.read_pickle`, a pickle is an inherently LOCAL, single-machine
  * artifact: decode happens on the driver and rows enter the plan
  * through the same local-relation path as `fromLocal`. This is an
  * ingestion facade for model-side objects (eval frames, label tables,
  * small lookups) — corpus-scale data belongs in parquet where scans
  * split and prune.
  *
  * Column dtypes supported on read: i1/i2/i4/i8, u1/u2/u4, f4/f8, b1,
  * M8[s|ms|us|ns] (NaT → null), and object columns of
  * str/int/float/bool/None (column type inferred from the non-null
  * values). Consolidated multi-column blocks, slice and array
  * placements, C and Fortran item order, and both '<' and '>' byte
  * orders are handled. On write: Byte/Short/Int/Long/Float/Double/
  * String/Boolean/Timestamp/Date columns, plus Decimal emitted as
  * exact `decimal.Decimal` digit strings (read back as strings —
  * never a rounded double in either direction). Timestamps travel as
  * UTC wall clock on both sides, so round trips are zone-independent.
  */
object Pickle {

  // ---------------------------------------------------------------------
  // Decoded-value model. Mutable nodes (list/dict/ndarray/obj) are filled
  // in place because BUILD/APPENDS arrive after the memo reference is
  // taken — sharing via BINGET must observe the completed object.
  // ---------------------------------------------------------------------
  private[sources] sealed trait PV
  private case object PNone extends PV
  private case object PMark extends PV // stack sentinel, never memoized
  private final case class PBool(b: Boolean) extends PV
  private final case class PLong(v: BigInt) extends PV
  private final case class PDouble(v: Double) extends PV
  private final case class PStr(s: String) extends PV
  private final case class PBytes(b: Array[Byte]) extends PV
  private final case class PTuple(items: Vector[PV]) extends PV
  private final class PList(val buf: mutable.ArrayBuffer[PV]) extends PV
  private final class PDict(val m: mutable.LinkedHashMap[PV, PV]) extends PV
  private final case class PGlobal(module: String, name: String) extends PV
  private final case class PSlice(start: Long, stop: Long, step: Long) extends PV
  private final class PNdArray extends PV {
    var shape: Vector[Int] = Vector.empty
    var dtype: PDtype = new PDtype("O", '|', None)
    var fortran: Boolean = false
    var data: PV = PNone // PBytes for numeric, PList for object dtype
  }
  private final class PDtype(var kind: String, var byteorder: Char,
      var unit: Option[String]) extends PV
  /** Any constructed object we don't model natively: class + ctor args,
    * with whatever BUILD later assigns as `state`. */
  private final class PObj(val cls: PGlobal, val args: PV) extends PV {
    var state: PV = PNone
  }
  private final case class PBlock(values: PV, placement: PV) extends PV
  private final case class PMgr(blocks: Vector[PV], axes: Vector[PV]) extends PV
  private final case class PDateTime(micros: Long) extends PV
  private final case class PDate(days: Int) extends PV

  // ---------------------------------------------------------------------
  // Unpickler: a stack machine over the documented opcode set.
  // ---------------------------------------------------------------------
  private[sources] def parse(bytes: Array[Byte]): PV = {
    val in = ByteBuffer.wrap(bytes).order(ByteOrder.LITTLE_ENDIAN)
    val stack = mutable.ArrayBuffer.empty[PV]
    val memo = mutable.ArrayBuffer.empty[PV]
    def push(v: PV): Unit = stack += v
    def pop(): PV = stack.remove(stack.length - 1)
    def popMark(): Vector[PV] = {
      val idx = stack.lastIndexOf(PMark)
      require(idx >= 0, "pickle: MARK not found")
      val items = stack.slice(idx + 1, stack.length).toVector
      stack.remove(idx, stack.length - idx)
      items
    }
    def readLine(): String = {
      val sb = new StringBuilder
      var c = in.get()
      while (c != '\n') { sb.append(c.toChar); c = in.get() }
      sb.toString
    }
    def readBytes(n: Int): Array[Byte] = {
      val a = new Array[Byte](n); in.get(a); a
    }
    def u1(): Int = in.get() & 0xFF
    def u2(): Int = in.getShort() & 0xFFFF
    def i4(): Int = in.getInt()
    def u4(): Long = in.getInt().toLong & 0xFFFFFFFFL
    def u8(): Long = in.getLong()
    def str(n: Int): String = new String(readBytes(n), StandardCharsets.UTF_8)
    def longFromLE(b: Array[Byte]): BigInt =
      if (b.isEmpty) BigInt(0) else BigInt(b.reverse) // two's complement big-endian

    var done = false
    while (!done) {
      val op = in.get() & 0xFF
      (op: @annotation.switch) match {
        case 0x80 => u1() // PROTO
        case 0x95 => u8() // FRAME (length hint only)
        case '.' => done = true // STOP
        case '(' => push(PMark)
        case '0' => pop() // POP
        case '1' => popMark() // POP_MARK
        case '2' => push(stack.last) // DUP
        case 'N' => push(PNone)
        case 0x88 => push(PBool(true)) // NEWTRUE
        case 0x89 => push(PBool(false)) // NEWFALSE
        case 'K' => push(PLong(u1())) // BININT1
        case 'M' => push(PLong(u2())) // BININT2
        case 'J' => push(PLong(i4())) // BININT
        case 'I' => // INT (text): also encodes bools as 00/01
          readLine() match {
            case "00" => push(PBool(false))
            case "01" => push(PBool(true))
            case s => push(PLong(BigInt(s)))
          }
        case 'L' => push(PLong(BigInt(readLine().stripSuffix("L")))) // LONG
        case 0x8A => push(PLong(longFromLE(readBytes(u1())))) // LONG1
        case 0x8B => push(PLong(longFromLE(readBytes(i4())))) // LONG4
        case 'F' => push(PDouble(readLine().toDouble)) // FLOAT
        case 'G' => // BINFLOAT: 8-byte big-endian IEEE
          push(PDouble(java.lang.Double.longBitsToDouble(
            ByteBuffer.wrap(readBytes(8)).order(ByteOrder.BIG_ENDIAN).getLong)))
        case 'U' => push(PBytes(readBytes(u1()))) // SHORT_BINSTRING (latin-1 era)
        case 'T' => push(PBytes(readBytes(i4()))) // BINSTRING
        case 'C' => push(PBytes(readBytes(u1()))) // SHORT_BINBYTES
        case 'B' => push(PBytes(readBytes(i4()))) // BINBYTES
        case 0x8E => // BINBYTES8
          val n = u8(); require(n <= Int.MaxValue, "pickle: bytes too large")
          push(PBytes(readBytes(n.toInt)))
        case 0x96 => // BYTEARRAY8 (protocol 5)
          val n = u8(); require(n <= Int.MaxValue, "pickle: bytearray too large")
          push(PBytes(readBytes(n.toInt)))
        case 0x8C => push(PStr(str(u1()))) // SHORT_BINUNICODE
        case 'X' => push(PStr(str(i4()))) // BINUNICODE
        case 0x8D => // BINUNICODE8
          val n = u8(); require(n <= Int.MaxValue, "pickle: string too large")
          push(PStr(str(n.toInt)))
        case 'V' => push(PStr(readLine())) // UNICODE (raw-unicode-escape approx)
        case ')' => push(PTuple(Vector.empty))
        case 0x85 => val a = pop(); push(PTuple(Vector(a))) // TUPLE1
        case 0x86 => // TUPLE2
          val b = pop(); val a = pop(); push(PTuple(Vector(a, b)))
        case 0x87 => // TUPLE3
          val c = pop(); val b = pop(); val a = pop()
          push(PTuple(Vector(a, b, c)))
        case 't' => push(PTuple(popMark())) // TUPLE
        case ']' => push(new PList(mutable.ArrayBuffer.empty))
        case 'l' => push(new PList(mutable.ArrayBuffer.from(popMark()))) // LIST
        case 'a' => // APPEND
          val v = pop()
          stack.last.asInstanceOf[PList].buf += v
        case 'e' => // APPENDS
          val items = popMark()
          stack.last.asInstanceOf[PList].buf ++= items
        case '}' => push(new PDict(mutable.LinkedHashMap.empty))
        case 'd' => // DICT
          val items = popMark()
          val d = new PDict(mutable.LinkedHashMap.empty)
          items.grouped(2).foreach { kv => d.m(kv(0)) = kv(1) }
          push(d)
        case 's' => // SETITEM
          val v = pop(); val k = pop()
          stack.last.asInstanceOf[PDict].m(k) = v
        case 'u' => // SETITEMS
          val items = popMark()
          val d = stack.last.asInstanceOf[PDict]
          items.grouped(2).foreach { kv => d.m(kv(0)) = kv(1) }
        case 0x8F => push(new PList(mutable.ArrayBuffer.empty)) // EMPTY_SET (as list)
        case 0x90 => // ADDITEMS
          val items = popMark()
          stack.last.asInstanceOf[PList].buf ++= items
        case 0x91 => push(new PList(mutable.ArrayBuffer.from(popMark()))) // FROZENSET
        case 'c' => // GLOBAL (text form)
          val module = readLine(); val name = readLine()
          push(PGlobal(module, name))
        case 0x93 => // STACK_GLOBAL
          val name = pop(); val module = pop()
          push(PGlobal(asStr(module), asStr(name)))
        case 'q' => memoPut(memo, u1(), stack.last) // BINPUT
        case 'r' => memoPut(memo, i4(), stack.last) // LONG_BINPUT
        case 0x94 => memo += stack.last // MEMOIZE
        case 'p' => memoPut(memo, readLine().toInt, stack.last) // PUT
        case 'h' => push(memo(u1())) // BINGET
        case 'j' => push(memo(i4())) // LONG_BINGET
        case 'g' => push(memo(readLine().toInt)) // GET
        case 'R' => // REDUCE
          val args = pop(); val callable = pop()
          push(applyCall(callable, args))
        case 0x81 => // NEWOBJ: cls.__new__(cls, *args)
          val args = pop(); val cls = pop()
          push(applyCall(cls, args))
        case 0x92 => // NEWOBJ_EX: (cls, args, kwargs)
          val _kw = pop(); val args = pop(); val cls = pop()
          push(applyCall(cls, args))
        case 'b' => // BUILD
          val state = pop()
          setState(stack.last, state)
        case 0x97 => // NEXT_BUFFER / unsupported out-of-band
          sys.error("pickle: out-of-band buffers not supported")
        case other =>
          sys.error(f"pickle: unsupported opcode 0x$other%02x at ${in.position() - 1}")
      }
    }
    require(stack.length == 1, s"pickle: stack not reduced (${stack.length})")
    stack.head
  }

  private def memoPut(memo: mutable.ArrayBuffer[PV], idx: Int, v: PV): Unit = {
    while (memo.length <= idx) memo += PNone
    memo(idx) = v
  }

  private def asStr(v: PV): String = v match {
    case PStr(s) => s
    case PBytes(b) => new String(b, StandardCharsets.UTF_8)
    case other => sys.error(s"pickle: expected string, got $other")
  }

  /** Dispatch REDUCE/NEWOBJ on the known public constructors; anything
    * unrecognized becomes a generic PObj so a container of exotica still
    * parses (we only fail later if the frame itself needs it). */
  private def applyCall(callable: PV, argsV: PV): PV = {
    val args: Vector[PV] = argsV match {
      case PTuple(items) => items
      case other => Vector(other)
    }
    callable match {
      case PGlobal(m, "_reconstruct")
          if m == "numpy.core.multiarray" || m == "numpy._core.multiarray" =>
        new PNdArray // filled by BUILD
      case PGlobal(m, "scalar")
          if m == "numpy.core.multiarray" || m == "numpy._core.multiarray" =>
        numpyScalar(args(0).asInstanceOf[PDtype], args(1))
      case PGlobal(m, "_frombuffer")
          if m == "numpy.core.numeric" || m == "numpy._core.numeric" =>
        // protocol-5 ndarray form: _frombuffer(data, dtype, shape, order)
        val nd = new PNdArray
        nd.data = args(0) match {
          case b: PBytes => b
          case other => sys.error(s"pickle: _frombuffer data $other")
        }
        nd.dtype = args(1).asInstanceOf[PDtype]
        nd.shape = args(2) match {
          case PTuple(dims) => dims.map(d => longOf(d).toInt)
          case d => Vector(longOf(d).toInt)
        }
        nd.fortran = args.length > 3 && (args(3) match {
          case PStr(s) => s == "F"; case _ => false
        })
        nd
      case PGlobal("numpy", "dtype") =>
        dtypeOf(asStr(args(0)))
      case PGlobal("builtins", "slice") | PGlobal("__builtin__", "slice") =>
        PSlice(longOf(args(0)), longOf(args(1)),
          if (args.length > 2 && args(2) != PNone) longOf(args(2)) else 1L)
      case PGlobal("pandas._libs.internals", "_unpickle_block") =>
        PBlock(args(0), args(1))
      case g @ PGlobal("pandas.core.internals.managers", "BlockManager")
          if args.isEmpty =>
        // pandas 1.x: NEWOBJ with no args + BUILD(legacy state) — keep
        // generic; decodeFrame normalizes via legacyMgr
        new PObj(g, argsV)
      case PGlobal("pandas.core.internals.managers", "BlockManager") =>
        val blocks = args(0) match {
          case PTuple(bs) => bs
          case l: PList => l.buf.toVector
          case other => Vector(other)
        }
        val axes = args(1) match {
          case l: PList => l.buf.toVector
          case PTuple(as) => as
          case other => Vector(other)
        }
        PMgr(blocks, axes)
      case PGlobal("pandas.core.indexes.base", "_new_Index") =>
        // args = (index_cls, state_dict); normalize to a PObj of that cls
        val o = new PObj(args(0).asInstanceOf[PGlobal], PTuple(Vector.empty))
        o.state = args(1)
        o
      case PGlobal("pandas._libs.arrays", "__pyx_unpickle_NDArrayBacked") =>
        // (cls, checksum, state) — state may come via BUILD instead
        val o = new PObj(args(0) match {
          case g: PGlobal => g
          case _ => PGlobal("pandas", "NDArrayBacked")
        }, PTuple(Vector.empty))
        if (args.length > 2 && args(2) != PNone) o.state = args(2)
        o
      case PGlobal("_codecs", "encode") =>
        // protocol <= 2 has no bytes opcode: bytes travel as
        // _codecs.encode(latin1_string, 'latin1')
        PBytes(asStr(args(0)).toCharArray.map(c => (c.toInt & 0xFF).toByte))
      case PGlobal("builtins", "bytearray") | PGlobal("builtins", "bytes") =>
        args.headOption match {
          case Some(b: PBytes) => b
          case Some(PStr(s)) => PBytes(s.getBytes(StandardCharsets.ISO_8859_1))
          case _ => PBytes(Array.emptyByteArray)
        }
      case PGlobal("decimal", "Decimal") | PGlobal("_pydecimal", "Decimal") =>
        // surfaced as the exact digit string (no binary float detour)
        PStr(asStr(args(0)))
      case PGlobal("datetime", "datetime") =>
        PDateTime(datetimePayloadMicros(args(0)))
      case PGlobal("datetime", "date") =>
        PDate(datePayloadDays(args(0)))
      case g: PGlobal =>
        new PObj(g, argsV)
      case o: PObj =>
        // e.g. functools.partial objects being called — keep generic
        new PObj(o.cls, argsV)
      case other =>
        sys.error(s"pickle: cannot call $other")
    }
  }

  private def setState(target: PV, state: PV): Unit = target match {
    case nd: PNdArray =>
      // (version, shape, dtype, fortran, data)
      val PTuple(s) = (state: @unchecked)
      nd.shape = s(1) match {
        case PTuple(dims) => dims.map(d => longOf(d).toInt)
        case d => Vector(longOf(d).toInt)
      }
      nd.dtype = s(2).asInstanceOf[PDtype]
      nd.fortran = s(3) match { case PBool(b) => b; case _ => false }
      nd.data = s(4)
    case dt: PDtype =>
      // (version, byteorder, subdescr, names, fields, elsize, align,
      //  flags[, metadata]) — we need byteorder and the datetime unit
      state match {
        case PTuple(s) if s.length > 1 =>
          s(1) match { case PStr(bo) if bo.nonEmpty => dt.byteorder = bo.head
                       case _ => () }
          // M8/m8 dtypes carry (unit, (num, den, ...)) trailing metadata
          s.foreach {
            case PTuple(Vector(u, _*)) if dt.kind.startsWith("M") ||
                dt.kind.startsWith("m") =>
              u match {
                case PStr(unit) => dt.unit = Some(unit)
                case PBytes(b) => dt.unit = Some(new String(b, StandardCharsets.UTF_8))
                case _ => ()
              }
            case _ => ()
          }
        case _ => ()
      }
    case o: PObj =>
      o.state = state
    case d: PDict =>
      state match {
        case s: PDict => s.m.foreach { case (k, v) => d.m(k) = v }
        case _ => ()
      }
    case _: PList | _: PTuple | PNone => () // tolerated no-ops
    case other => sys.error(s"pickle: BUILD on unexpected $other")
  }

  private def dtypeOf(s: String): PDtype = {
    // forms: 'i8', 'f8', 'O8', 'b1', 'M8[ns]', '<i4', '>f8', '|b1'
    var str = s
    var bo = '<'
    if (str.nonEmpty && "<>|=".contains(str.head)) { bo = str.head; str = str.tail }
    val unit = "\\[(\\w+)\\]".r.findFirstMatchIn(str).map(_.group(1))
    val kind = str.takeWhile(_ != '[')
    new PDtype(kind, bo, unit)
  }

  /** Exact BigInt -> Long; a Python int outside Long range must fail
    * loudly, not wrap (silent corruption beats every other error here). */
  private def toLongExact(b: BigInt): Long =
    if (b.isValidLong) b.toLong
    else sys.error(s"pickle: integer $b exceeds 64-bit signed range")

  private def longOf(v: PV): Long = v match {
    case PLong(b) => toLongExact(b)
    case PBool(b) => if (b) 1L else 0L
    case PNone => 0L
    case other => sys.error(s"pickle: expected int, got $other")
  }

  private def numpyScalar(dt: PDtype, data: PV): PV = {
    val bytes = data match { case PBytes(b) => b; case other => return other }
    val bb = ByteBuffer.wrap(bytes)
      .order(if (dt.byteorder == '>') ByteOrder.BIG_ENDIAN else ByteOrder.LITTLE_ENDIAN)
    dt.kind match {
      case "i1" => PLong(bb.get().toInt)
      case "i2" => PLong(bb.getShort().toInt)
      case "i4" => PLong(bb.getInt())
      case "i8" => PLong(bb.getLong())
      case "f4" => PDouble(bb.getFloat().toDouble)
      case "f8" => PDouble(bb.getDouble())
      case "b1" => PBool(bb.get() != 0)
      case _ => PBytes(bytes)
    }
  }

  /** CPython datetime pickles as a 10-byte payload:
    * year(2, big-endian) month day hour minute second microsecond(3). */
  private def datetimePayloadMicros(arg: PV): Long = {
    val b = arg match {
      case PBytes(bs) => bs
      case PStr(s) => s.toCharArray.map(_.toByte) // latin-1 fallback
      case other => sys.error(s"pickle: bad datetime payload $other")
    }
    val year = ((b(0) & 0xFF) << 8) | (b(1) & 0xFF)
    val us = ((b(7) & 0xFF) << 16) | ((b(8) & 0xFF) << 8) | (b(9) & 0xFF)
    val ldt = java.time.LocalDateTime.of(year, b(2) & 0xFF, b(3) & 0xFF,
      b(4) & 0xFF, b(5) & 0xFF, b(6) & 0xFF, us * 1000)
    ldt.toEpochSecond(java.time.ZoneOffset.UTC) * 1000000L + us
  }

  /** CPython date pickles as 4 bytes: year(2, big-endian) month day. */
  private def datePayloadDays(arg: PV): Int = {
    val b = arg match {
      case PBytes(bs) => bs
      case PStr(s) => s.toCharArray.map(_.toByte)
      case other => sys.error(s"pickle: bad date payload $other")
    }
    val year = ((b(0) & 0xFF) << 8) | (b(1) & 0xFF)
    java.time.LocalDate.of(year, b(2) & 0xFF, b(3) & 0xFF).toEpochDay.toInt
  }

  // ---------------------------------------------------------------------
  // pandas-object graph -> (schema, rows)
  // ---------------------------------------------------------------------

  /** A decoded column: Spark type + value per row (null allowed). */
  private final case class Col(name: String, dt: DataType, values: Array[Any])

  private[sources] def decodeFrame(root: PV): (StructType, Seq[Row]) = {
    val mgr = root match {
      case o: PObj if o.cls == PGlobal("pandas.core.frame", "DataFrame") =>
        o.state match {
          case d: PDict =>
            d.m.get(PStr("_mgr")).orElse(d.m.get(PStr("_data"))) match {
              case Some(m: PMgr) => m
              case Some(po: PObj) => legacyMgr(po)
              case other => sys.error(s"pickle: DataFrame state has no BlockManager ($other)")
            }
          case PNone =>
            // our own writer's format: DataFrame(dict_of_lists)
            return decodeCtorFrame(o.args)
          case other => sys.error(s"pickle: unexpected DataFrame state $other")
        }
      case o: PObj if o.cls == PGlobal("pandas.core.series", "Series") =>
        // the reference accepts any pandas object DataFrame() can wrap
        // (io.py:39-40); a Series becomes a one-column frame named after
        // the series (pandas names an anonymous series' column "0").
        // The values ndarray is the only BARE ndarray in the
        // SingleBlockManager state — Index axes sit inside _new_Index
        // objects, which the search does not enter.
        val st = o.state match {
          case d: PDict => d.m
          case other => sys.error(s"pickle: unexpected Series state $other")
        }
        val mgr = st.getOrElse(PStr("_mgr"), st.getOrElse(PStr("_data"),
          sys.error("pickle: Series state has no manager")))
        val name = st.get(PStr("name")).orElse(st.get(PStr("_name"))) match {
          case Some(PStr(s)) => s
          case Some(PLong(v)) => v.toString // pandas allows non-string names
          case Some(PDouble(v)) => v.toString
          case _ => "0"
        }
        val nd = unwrapNdArray(mgr)
        val n = nd.shape.product
        val (sparkType, grid) = materialize(nd, 1, n)
        val (dt, vals) =
          if (sparkType == NullType) inferObjectCol(grid(0)) else (sparkType, grid(0))
        return (StructType(Seq(StructField(name, dt, nullable = true))),
          (0 until n).map(i => Row(vals(i))))
      case m: PMgr => m
      case d: PDict => return decodeDictOfLists(d)
      case other => sys.error(s"pickle: not a DataFrame pickle (root $other)")
    }

    val colNames = indexValues(mgr.axes.head).map {
      case PStr(s) => s
      case PLong(v) => v.toString
      case PDouble(v) => v.toString
      case other => other.toString
    }
    val nCols = colNames.length

    val cols = new Array[Col](nCols)
    mgr.blocks.foreach { blockPv =>
      val PBlock(valuesPv, placementPv) = (blockPv: @unchecked)
      val placement: Int => Int = placementPv match {
        case PSlice(st, _, step) => j => (st + j * step).toInt
        case p => val idx = unwrapNdArray(p); val vals = numericArray(idx)
          j => vals(j).asInstanceOf[Number].intValue()
      }
      valuesPv match {
        // Categorical blocks FIRST: their state tuple leads with the
        // i1/i2 codes ndarray, so the generic ndarray search would
        // silently decode codes (with -1 for null) as the column values
        case o: PObj if o.cls.name == "Categorical" =>
          val vals = decodeCategorical(o)
          val colIdx = placement(0)
          val (dt, vals2) = inferObjectCol(vals)
          cols(colIdx) = Col(colNames(colIdx), dt, vals2)
        // nullable extension arrays (Int64/Float64/boolean dtypes) are
        // (_data, _mask) pairs: without the mask, the _data slots under
        // nulls hold plausible-looking garbage values
        case o: PObj if MaskedArrayClasses(o.cls.name) =>
          val (dt, vals) = decodeMasked(o)
          val colIdx = placement(0)
          cols(colIdx) = Col(colNames(colIdx), dt, vals)
        case _ =>
          val nd = unwrapNdArray(valuesPv)
          val (k, n) = nd.shape match {
            case Vector(a, b) => (a, b)
            case Vector(b) => (1, b)
            case other => sys.error(s"pickle: unsupported block shape $other")
          }
          val (sparkType, grid) = materialize(nd, k, n)
          var j = 0
          while (j < k) {
            val colIdx = placement(j)
            val vals = new Array[Any](n)
            var i = 0
            while (i < n) { vals(i) = grid(j)(i); i += 1 }
            val (dt2, vals2) =
              if (sparkType == NullType) inferObjectCol(vals) else (sparkType, vals)
            cols(colIdx) = Col(colNames(colIdx), dt2, vals2)
            j += 1
          }
      }
    }

    val nRows = cols.collectFirst { case c if c != null => c.values.length }.getOrElse(0)
    val fields = cols.zipWithIndex.map { case (c, i) =>
      if (c == null) StructField(colNames(i), StringType, nullable = true)
      else StructField(c.name, c.dt, nullable = true)
    }
    val rows = (0 until nRows).map { i =>
      Row.fromSeq(cols.toIndexedSeq.map(c => if (c == null) null else c.values(i)))
    }
    (StructType(fields.toIndexedSeq), rows)
  }

  /** pandas 1.x pickled BlockManager via NEWOBJ + BUILD with a legacy
    * state tuple whose tail carries the versioned compat dict
    * `{'0.14.1': {'axes': [...], 'blocks': [{'values', 'mgr_locs'}]}}`
    * (pandas core/internals __getstate__, still read by pandas 2's
    * compat shim). Normalize that shape to the modern PMgr. */
  private def legacyMgr(o: PObj): PMgr = {
    def findCompat(pv: PV): Option[PDict] = pv match {
      case d: PDict
          if d.m.contains(PStr("blocks")) && d.m.contains(PStr("axes")) =>
        Some(d)
      case d: PDict => d.m.values.view.flatMap(findCompat).headOption
      case PTuple(items) => items.view.flatMap(findCompat).headOption
      case l: PList => l.buf.view.flatMap(findCompat).headOption
      case _ => None
    }
    val compat = findCompat(o.state).getOrElse(
      sys.error(s"pickle: ${o.cls} has no modern args and no legacy compat dict"))
    def asSeq(pv: PV): Vector[PV] = pv match {
      case l: PList => l.buf.toVector
      case PTuple(items) => items
      case other => Vector(other)
    }
    val axes = asSeq(compat.m(PStr("axes")))
    val blocks = asSeq(compat.m(PStr("blocks"))).map {
      case bd: PDict =>
        PBlock(bd.m(PStr("values")), bd.m(PStr("mgr_locs"))): PV
      case other => sys.error(s"pickle: unexpected legacy block $other")
    }
    PMgr(blocks, axes)
  }

  /** Axis values from a `_new_Index(cls, state)` object (Index with an
    * object ndarray of labels, or RangeIndex with start/stop/step) — or,
    * in legacy pickles, a raw label ndarray. */
  private def indexValues(axis: PV): Vector[PV] = axis match {
    case nd: PNdArray =>
      nd.data match {
        case l: PList => l.buf.toVector
        case _: PBytes =>
          val n = nd.shape.product
          val (_, grid) = materialize(nd, 1, n)
          grid(0).map {
            case l: Long => PLong(BigInt(l))
            case d: Double => PDouble(d)
            case s: String => PStr(s)
            case other => PStr(String.valueOf(other))
          }.toVector
        case other => sys.error(s"pickle: unsupported axis ndarray data $other")
      }
    case o: PObj =>
      val st = o.state match {
        case d: PDict => d.m
        case _ => mutable.LinkedHashMap.empty[PV, PV]
      }
      if (o.cls.name == "RangeIndex") {
        val start = longOf(st.getOrElse(PStr("start"), PLong(0)))
        val stop = longOf(st.getOrElse(PStr("stop"), PLong(0)))
        val step = longOf(st.getOrElse(PStr("step"), PLong(1)))
        (start until stop by step).map(v => PLong(BigInt(v)): PV).toVector
      } else {
        st.get(PStr("data")) match {
          case Some(nd) =>
            val arr = unwrapNdArray(nd)
            arr.data match {
              case l: PList => l.buf.toVector
              case _: PBytes =>
                val n = arr.shape.product
                val (_, grid) = materialize(arr, 1, n)
                grid(0).map {
                  case l: Long => PLong(BigInt(l))
                  case d: Double => PDouble(d)
                  case s: String => PStr(s)
                  case other => PStr(String.valueOf(other))
                }.toVector
              case other => sys.error(s"pickle: unsupported index data $other")
            }
          case None => sys.error(s"pickle: Index state without data: ${o.cls}")
        }
      }
    case other => sys.error(s"pickle: unsupported axis $other")
  }

  /** A Categorical extension block: NDArrayBacked state is
    * `(codes_ndarray, CategoricalDtype)` where the dtype object's state
    * dict carries `categories` (an Index) and `ordered`. Codes are
    * narrow ints indexing the category labels; -1 marks null. */
  private def decodeCategorical(o: PObj): Array[Any] = {
    val st = o.state match {
      case PTuple(items) => items
      case other => sys.error(s"pickle: unexpected Categorical state $other")
    }
    val codes = numericArray(st.collectFirst { case nd: PNdArray => nd }
      .getOrElse(sys.error("pickle: Categorical without codes ndarray")))
    val catDtype = st.collectFirst {
      case d: PObj if d.cls.name == "CategoricalDtype" => d
    }.getOrElse(sys.error("pickle: Categorical without CategoricalDtype"))
    val categoriesPv = catDtype.state match {
      case d: PDict => d.m.getOrElse(PStr("categories"),
        sys.error("pickle: CategoricalDtype without categories"))
      case other => sys.error(s"pickle: unexpected CategoricalDtype state $other")
    }
    val labels: Vector[Any] = indexValues(categoriesPv).map {
      case PStr(s) => s
      case PLong(v) => toLongExact(v)
      case PDouble(d) => d
      case PBool(b) => b
      case PNone => null
      case other => String.valueOf(other)
    }
    codes.map { c =>
      val idx = c.asInstanceOf[Number].intValue()
      if (idx < 0) null
      else if (idx < labels.length) labels(idx)
      else sys.error(s"pickle: categorical code $idx out of range")
    }
  }

  private val MaskedArrayClasses =
    Set("IntegerArray", "FloatingArray", "BooleanArray")

  /** A masked extension block (pandas Int64/Float64/boolean dtypes):
    * state dict holds `_data` (the values ndarray, garbage under nulls)
    * and `_mask` (b1 ndarray, true = null). */
  private def decodeMasked(o: PObj): (DataType, Array[Any]) = {
    val st = o.state match {
      case d: PDict => d.m
      case other => sys.error(s"pickle: unexpected ${o.cls.name} state $other")
    }
    def nd(key: String): PNdArray = st.get(PStr(key)) match {
      case Some(a: PNdArray) => a
      case other => sys.error(s"pickle: ${o.cls.name} missing $key ($other)")
    }
    val data = nd("_data")
    val mask = nd("_mask")
    val n = data.shape.product
    require(mask.shape.product == n, "pickle: mask/data length mismatch")
    val (dt, grid) = materialize(data, 1, n)
    val (_, maskGrid) = materialize(mask, 1, n)
    val vals = new Array[Any](n)
    var i = 0
    while (i < n) {
      vals(i) =
        if (maskGrid(0)(i).asInstanceOf[Boolean]) null else grid(0)(i)
      i += 1
    }
    (dt, vals)
  }

  /** Block values may be a plain ndarray or an NDArrayBacked extension
    * array (DatetimeArray, TimedeltaArray) whose state holds the ndarray. */
  private def unwrapNdArray(v: PV): PNdArray = v match {
    case nd: PNdArray => nd
    case o: PObj =>
      def findNd(pv: PV): Option[PNdArray] = pv match {
        case nd: PNdArray => Some(nd)
        case PTuple(items) => items.view.flatMap(findNd).headOption
        case l: PList => l.buf.view.flatMap(findNd).headOption
        case d: PDict => d.m.values.view.flatMap(findNd).headOption
        case _ => None
      }
      findNd(o.state).getOrElse(
        sys.error(s"pickle: no ndarray inside ${o.cls} state"))
    case other => sys.error(s"pickle: expected ndarray, got $other")
  }

  private def numericArray(nd: PNdArray): Array[Any] = {
    val n = nd.shape.product
    val (_, grid) = materialize(nd, 1, n)
    grid(0)
  }

  /** Decode an ndarray of k rows × n columns (numpy block layout: one
    * block row per frame column) into JVM values + the Spark type. For
    * object dtype the per-column Spark type is inferred later, so
    * NullType is returned as a sentinel. */
  private def materialize(nd: PNdArray, k: Int, n: Int): (DataType, Array[Array[Any]]) = {
    val grid = Array.ofDim[Any](k, n)
    def fill(itemGet: Int => Any): Unit = {
      var j = 0
      while (j < k) {
        var i = 0
        while (i < n) {
          // C order: element (j, i) is j*n + i; Fortran: i*k + j
          val flat = if (nd.fortran) i * k + j else j * n + i
          grid(j)(i) = itemGet(flat)
          i += 1
        }
        j += 1
      }
    }
    nd.data match {
      case l: PList =>
        fill { flat =>
          l.buf(flat) match {
            case PNone => null
            // pandas' NA/NaT singletons pickle as bare globals
            case PGlobal(m, "NA") if m.startsWith("pandas") => null
            case PGlobal(m, "NaT") if m.startsWith("pandas") => null
            case PStr(s) => s
            case PLong(v) => toLongExact(v)
            case PDouble(d) => d
            case PBool(b) => b
            case PDateTime(us) =>
              val ts = new Timestamp(Math.floorDiv(us, 1000000L) * 1000L)
              ts.setNanos((Math.floorMod(us, 1000000L) * 1000L).toInt)
              ts
            case PDate(days) => java.sql.Date.valueOf(java.time.LocalDate.ofEpochDay(days))
            case PBytes(b) => new String(b, StandardCharsets.UTF_8)
            case other => String.valueOf(other)
          }
        }
        (NullType, grid) // sentinel: infer per column
      case PBytes(raw) =>
        val order = if (nd.dtype.byteorder == '>') ByteOrder.BIG_ENDIAN
                    else ByteOrder.LITTLE_ENDIAN
        val bb = ByteBuffer.wrap(raw).order(order)
        nd.dtype.kind match {
          case "i1" => fill(f => bb.get(f)); (ByteType, grid)
          case "i2" => fill(f => bb.getShort(f * 2)); (ShortType, grid)
          case "i4" => fill(f => bb.getInt(f * 4)); (IntegerType, grid)
          case "i8" => fill(f => bb.getLong(f * 8)); (LongType, grid)
          case "u1" => fill(f => (bb.get(f) & 0xFF).toShort); (ShortType, grid)
          case "u2" => fill(f => bb.getShort(f * 2) & 0xFFFF); (IntegerType, grid)
          case "u4" => fill(f => bb.getInt(f * 4).toLong & 0xFFFFFFFFL); (LongType, grid)
          case "f4" => fill(f => bb.getFloat(f * 4)); (FloatType, grid)
          case "f8" => fill(f => bb.getDouble(f * 8)); (DoubleType, grid)
          case "b1" => fill(f => bb.get(f) != 0); (BooleanType, grid)
          case "M8" =>
            val toMicros: Long => Long = nd.dtype.unit.getOrElse("ns") match {
              case "ns" => _ / 1000L
              case "us" => identity
              case "ms" => _ * 1000L
              case "s" => _ * 1000000L
              case u => sys.error(s"pickle: unsupported datetime unit $u")
            }
            fill { f =>
              val v = bb.getLong(f * 8)
              if (v == Long.MinValue) null // NaT
              else {
                val us = toMicros(v)
                val ts = new Timestamp(Math.floorDiv(us, 1000000L) * 1000L)
                ts.setNanos((Math.floorMod(us, 1000000L) * 1000L).toInt)
                ts
              }
            }
            (TimestampType, grid)
          case other => sys.error(s"pickle: unsupported block dtype $other")
        }
      case other => sys.error(s"pickle: unsupported ndarray data $other")
    }
  }

  /** Infer a Spark type for an object-dtype column from its non-null
    * values; mixed unrepresentable columns degrade to string. */
  private def inferObjectCol(vals: Array[Any]): (DataType, Array[Any]) = {
    val nonNull = vals.filter(_ != null)
    if (nonNull.isEmpty) (StringType, vals)
    else if (nonNull.forall(_.isInstanceOf[String])) (StringType, vals)
    else if (nonNull.forall(_.isInstanceOf[Boolean])) (BooleanType, vals)
    else if (nonNull.forall(_.isInstanceOf[Long])) (LongType, vals)
    else if (nonNull.forall(v => v.isInstanceOf[Long] || v.isInstanceOf[Double]))
      (DoubleType, vals.map {
        case l: Long => l.toDouble; case other => other })
    else if (nonNull.forall(_.isInstanceOf[Timestamp])) (TimestampType, vals)
    else if (nonNull.forall(_.isInstanceOf[java.sql.Date])) (DateType, vals)
    else (StringType, vals.map(v => if (v == null) null else String.valueOf(v)))
  }

  /** Our writer's shape: DataFrame({col: [v, ...], ...}) constructor call. */
  private def decodeCtorFrame(args: PV): (StructType, Seq[Row]) = args match {
    case PTuple(Vector(d: PDict, _*)) => decodeDictOfLists(d)
    case other => sys.error(s"pickle: unexpected DataFrame ctor args $other")
  }

  private def decodeDictOfLists(d: PDict): (StructType, Seq[Row]) = {
    val cols = d.m.toVector.map { case (k, v) =>
      val name = asStr(k)
      val raw: Vector[PV] = v match {
        case l: PList => l.buf.toVector
        case PTuple(items) => items
        case nd: PNdArray => numericArray(nd).map {
          case null => PNone
          case l: Long => PLong(BigInt(l)); case dd: Double => PDouble(dd)
          case s: String => PStr(s); case b: Boolean => PBool(b)
          case other => PStr(String.valueOf(other))
        }.toVector
        case other => sys.error(s"pickle: column $name is not a list ($other)")
      }
      val vals: Array[Any] = raw.map {
        case PNone => null
        case PStr(s) => s
        case PLong(x) => toLongExact(x)
        case PDouble(x) => x
        case PBool(b) => b
        case PDateTime(us) =>
          val ts = new Timestamp(Math.floorDiv(us, 1000000L) * 1000L)
          ts.setNanos((Math.floorMod(us, 1000000L) * 1000L).toInt); ts
        case PDate(days) => java.sql.Date.valueOf(java.time.LocalDate.ofEpochDay(days))
        case other => String.valueOf(other)
      }.toArray
      val (dt, vals2) = inferObjectCol(vals)
      Col(name, dt, vals2)
    }
    val nRows = cols.headOption.map(_.values.length).getOrElse(0)
    val schema = StructType(cols.map(c => StructField(c.name, c.dt, nullable = true)))
    val rows = (0 until nRows).map(i => Row.fromSeq(cols.map(_.values(i))))
    (schema, rows)
  }

  // ---------------------------------------------------------------------
  // Public API
  // ---------------------------------------------------------------------

  /** Read a pickled pandas DataFrame (or dict-of-lists) into a frame.
    * Driver-side decode + local relation, like `read_numpy`. gzip
    * payloads (pandas `to_pickle('*.pkl.gz')`) are detected by magic
    * and decompressed transparently. */
  def readPickle(spark: SparkSession, path: String): PsDataFrame = {
    val raw = Files.readAllBytes(Paths.get(path))
    val bytes =
      if (raw.length > 2 && raw(0) == 0x1F.toByte && raw(1) == 0x8B.toByte) {
        val in = new java.util.zip.GZIPInputStream(
          new java.io.ByteArrayInputStream(raw))
        try in.readAllBytes() finally in.close()
      } else raw
    val (schema, rows) = decodeFrame(parse(bytes))
    PsDataFrame(spark.createDataFrame(
      spark.sparkContext.parallelize(rows.toSeq, math.max(1, math.min(8, rows.length))),
      schema))
  }

  /** Write a frame as a pickle that unpickles (with pandas installed) to
    * `pandas.core.frame.DataFrame({col: [values...]})` — a genuine
    * DataFrame with the same column order and values. Collects to the
    * driver: this is a local-object egress codec (reference to_pickle,
    * core.py:640), not a distributed sink — corpus-scale output belongs
    * in `to_parquet`. Protocol 2, so any Python 2.3+/3.x can read it. */
  def toPickle(df: DataFrame, path: String): Unit = {
    val schema = df.schema
    schema.fields.foreach { f =>
      require(writable(f.dataType),
        s"toPickle: unsupported column type ${f.dataType} for '${f.name}'")
    }
    val rows = df.collect()
    // pandas infers gzip from the extension on both read and write;
    // mirror that so a '.pkl.gz' handed to pd.read_pickle just works
    val fileOut = new FileOutputStream(path)
    val out = new BufferedOutputStream(
      if (path.endsWith(".gz")) new java.util.zip.GZIPOutputStream(fileOut)
      else fileOut)
    try {
      val w = new PickleWriter(out)
      w.proto2()
      w.global("pandas.core.frame", "DataFrame")
      w.emptyDict()
      schema.fields.zipWithIndex.foreach { case (f, ci) =>
        w.unicode(f.name)
        w.emptyList()
        w.mark()
        var i = 0
        while (i < rows.length) {
          w.value(rows(i).get(ci), f.dataType)
          i += 1
        }
        w.appends()
        w.setitem()
      }
      w.tuple1()
      w.reduce()
      w.stop()
    } finally out.close()
  }

  private def writable(dt: DataType): Boolean = dt match {
    case ByteType | ShortType | IntegerType | LongType | FloatType |
         DoubleType | StringType | BooleanType | TimestampType | DateType => true
    case _: DecimalType => true
    case _ => false
  }

  /** Minimal protocol-2 pickle emitter (opcodes per CPython pickletools). */
  private final class PickleWriter(out: java.io.OutputStream) {
    private def b(v: Int): Unit = out.write(v)
    private def raw(a: Array[Byte]): Unit = out.write(a)
    private def le4(v: Int): Unit = {
      b(v & 0xFF); b((v >> 8) & 0xFF); b((v >> 16) & 0xFF); b((v >>> 24) & 0xFF)
    }
    def proto2(): Unit = { b(0x80); b(2) }
    def stop(): Unit = b('.')
    def mark(): Unit = b('(')
    def emptyDict(): Unit = b('}')
    def emptyList(): Unit = b(']')
    def appends(): Unit = b('e')
    def setitem(): Unit = b('s')
    def tuple1(): Unit = b(0x85)
    def reduce(): Unit = b('R')
    def none(): Unit = b('N')
    def global(module: String, name: String): Unit = {
      b('c')
      raw(module.getBytes(StandardCharsets.US_ASCII)); b('\n')
      raw(name.getBytes(StandardCharsets.US_ASCII)); b('\n')
    }
    def bool(v: Boolean): Unit = b(if (v) 0x88 else 0x89)
    def int(v: Long): Unit = {
      if (v >= 0 && v <= 0xFF) { b('K'); b(v.toInt) }
      else if (v >= 0 && v <= 0xFFFF) { b('M'); b(v.toInt & 0xFF); b((v.toInt >> 8) & 0xFF) }
      else if (v >= Int.MinValue && v <= Int.MaxValue) { b('J'); le4(v.toInt) }
      else { // LONG1: little-endian two's complement
        val bytes = BigInt(v).toByteArray.reverse
        b(0x8A); b(bytes.length); raw(bytes)
      }
    }
    def double(v: Double): Unit = {
      b('G')
      val bits = java.lang.Double.doubleToLongBits(v)
      var i = 7
      while (i >= 0) { b(((bits >>> (i * 8)) & 0xFF).toInt); i -= 1 }
    }
    def unicode(s: String): Unit = {
      val bytes = s.getBytes(StandardCharsets.UTF_8)
      b('X'); le4(bytes.length); raw(bytes)
    }
    def shortBytesLatin1(payload: Array[Byte]): Unit = {
      // protocol-2 datetime payloads travel as latin-1 str via UNICODE;
      // emit as BINUNICODE of the latin-1 codepoints (CPython accepts it)
      val s = new String(payload.map(x => (x & 0xFF).toChar))
      unicode(s)
    }
    def datetime(ts: Timestamp): Unit = {
      // UTC wall clock, matching the reader's UTC interpretation of the
      // payload — Timestamp.toLocalDateTime would bake in the JVM's
      // default zone and shift every value on a non-UTC machine
      val ldt = ts.toInstant.atZone(java.time.ZoneOffset.UTC).toLocalDateTime
      val us = ldt.getNano / 1000
      val payload = Array[Byte](
        ((ldt.getYear >> 8) & 0xFF).toByte, (ldt.getYear & 0xFF).toByte,
        ldt.getMonthValue.toByte, ldt.getDayOfMonth.toByte,
        ldt.getHour.toByte, ldt.getMinute.toByte, ldt.getSecond.toByte,
        ((us >> 16) & 0xFF).toByte, ((us >> 8) & 0xFF).toByte, (us & 0xFF).toByte)
      global("datetime", "datetime")
      shortBytesLatin1(payload)
      tuple1(); reduce()
    }
    def date(d: java.sql.Date): Unit = {
      val ld = d.toLocalDate
      val payload = Array[Byte](
        ((ld.getYear >> 8) & 0xFF).toByte, (ld.getYear & 0xFF).toByte,
        ld.getMonthValue.toByte, ld.getDayOfMonth.toByte)
      global("datetime", "date")
      shortBytesLatin1(payload)
      tuple1(); reduce()
    }
    def value(v: Any, dt: DataType): Unit =
      if (v == null) none()
      else dt match {
        case ByteType => int(v.asInstanceOf[Byte].toLong)
        case ShortType => int(v.asInstanceOf[Short].toLong)
        case IntegerType => int(v.asInstanceOf[Int].toLong)
        case LongType => int(v.asInstanceOf[Long])
        case FloatType => double(v.asInstanceOf[Float].toDouble)
        case DoubleType => double(v.asInstanceOf[Double])
        case StringType => unicode(v.asInstanceOf[String])
        case BooleanType => bool(v.asInstanceOf[Boolean])
        case TimestampType => datetime(v.asInstanceOf[Timestamp])
        case DateType => date(v.asInstanceOf[java.sql.Date])
        case _: DecimalType =>
          // exact: pandas receives decimal.Decimal('<digits>'), never a
          // rounded double (38-digit decimals exceed double precision)
          global("decimal", "Decimal")
          unicode(v.asInstanceOf[java.math.BigDecimal].toPlainString)
          tuple1(); reduce()
        case other => sys.error(s"toPickle: unsupported type $other")
      }
  }
}
