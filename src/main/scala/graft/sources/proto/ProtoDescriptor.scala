package graft.sources.proto

import scala.collection.mutable

/** Schema autogen from protobuf descriptors (SURVEY §2.A A5) — the role
  * the reference delegates to bufarrow's proto→Arrow derivation
  * (/root/reference/main.go:203, README.md:6). Two entry points:
  *
  *  - [[parseFileDescriptorSet]] / [[messageSchema]]: read a serialized
  *    `FileDescriptorSet` (what `protoc --descriptor_set_out` emits;
  *    `descriptor.proto` is public spec) and derive the [[PMessage]] /
  *    Spark `StructType` tree mechanically. A new topic schema is a new
  *    descriptor file, not hand-written Scala.
  *  - [[parseProtoText]] + [[encodeFileDescriptorSet]]: a mini-protoc
  *    front end for the proto3 subset the engine speaks (flat messages,
  *    scalar + repeated fields, well-known Timestamp import), used to
  *    produce descriptor files in environments without protoc.
  *
  * Only the descriptor fields the schema needs are decoded; everything
  * else (options, reserved ranges, json_name…) is skipped wire-type-
  * correctly, so descriptors produced by real protoc parse fine.
  */
object ProtoDescriptor {

  // descriptor.proto FieldDescriptorProto.Type values (public spec)
  private val TYPE_FLOAT = 2
  private val TYPE_INT64 = 3
  private val TYPE_INT32 = 5
  private val TYPE_BOOL = 8
  private val TYPE_STRING = 9
  private val TYPE_MESSAGE = 11
  // FieldDescriptorProto.Label
  private val LABEL_REPEATED = 3

  final case class FieldDesc(name: String, number: Int, label: Int,
                             tpe: Int, typeName: String)
  final case class MessageDesc(name: String, fields: Seq[FieldDesc])
  final case class FileDesc(name: String, pkg: String,
                            messages: Seq[MessageDesc])

  /** google.protobuf.Timestamp, the one well-known import the data
    * model uses — stored as {seconds, nanos}, not a native timestamp
    * (SURVEY §1.3). */
  val wellKnownTimestamp: PMessage = PMessage("Timestamp", Seq(
    PField(1, "seconds", PInt64), PField(2, "nanos", PInt32)))

  // ---------------------------------------------------------------- wire

  private final class Cursor(var pos: Int)

  private def readVarint(b: Array[Byte], c: Cursor): Long = {
    var shift = 0
    var out = 0L
    while (shift < 64) {
      val x = b(c.pos)
      c.pos += 1
      out |= (x & 0x7fL) << shift
      if ((x & 0x80) == 0) return out
      shift += 7
    }
    throw new IllegalArgumentException("malformed varint")
  }

  private def readBytes(b: Array[Byte], c: Cursor): Array[Byte] = {
    val n = readVarint(b, c).toInt
    val out = java.util.Arrays.copyOfRange(b, c.pos, c.pos + n)
    c.pos += n
    out
  }

  private def skip(b: Array[Byte], c: Cursor, wireType: Int): Unit =
    wireType match {
      case 0 => readVarint(b, c)
      case 1 => c.pos += 8
      case 2 => val n = readVarint(b, c).toInt; c.pos += n
      case 5 => c.pos += 4
      case w => throw new IllegalArgumentException(s"wire type $w")
    }

  /** Generic length-delimited message walk: calls `onField(no, wt)` with
    * the cursor at the value; the callback must consume it. */
  private def walk(b: Array[Byte], c: Cursor, end: Int)(
      onField: (Int, Int) => Boolean): Unit =
    while (c.pos < end) {
      val tag = readVarint(b, c)
      val no = (tag >>> 3).toInt
      val wt = (tag & 7).toInt
      if (!onField(no, wt)) skip(b, c, wt)
    }

  private def str(b: Array[Byte]): String =
    new String(b, java.nio.charset.StandardCharsets.UTF_8)

  /** Parse a serialized FileDescriptorSet (protoc's output format). */
  def parseFileDescriptorSet(bytes: Array[Byte]): Seq[FileDesc] = {
    val files = mutable.ArrayBuffer.empty[FileDesc]
    val c = new Cursor(0)
    walk(bytes, c, bytes.length) { (no, wt) =>
      if (no == 1 && wt == 2) { files += parseFile(readBytes(bytes, c)); true }
      else false
    }
    files.toSeq
  }

  private def parseFile(b: Array[Byte]): FileDesc = {
    var name = ""
    var pkg = ""
    val msgs = mutable.ArrayBuffer.empty[MessageDesc]
    val c = new Cursor(0)
    walk(b, c, b.length) { (no, wt) =>
      (no, wt) match {
        case (1, 2) => name = str(readBytes(b, c)); true
        case (2, 2) => pkg = str(readBytes(b, c)); true
        case (4, 2) => msgs += parseMessage(readBytes(b, c)); true
        case _      => false
      }
    }
    FileDesc(name, pkg, msgs.toSeq)
  }

  private def parseMessage(b: Array[Byte]): MessageDesc = {
    var name = ""
    val fields = mutable.ArrayBuffer.empty[FieldDesc]
    val c = new Cursor(0)
    walk(b, c, b.length) { (no, wt) =>
      (no, wt) match {
        case (1, 2) => name = str(readBytes(b, c)); true
        case (2, 2) => fields += parseField(readBytes(b, c)); true
        case _      => false
      }
    }
    MessageDesc(name, fields.toSeq)
  }

  private def parseField(b: Array[Byte]): FieldDesc = {
    var name = ""
    var number = 0
    var label = 1
    var tpe = 0
    var typeName = ""
    val c = new Cursor(0)
    walk(b, c, b.length) { (no, wt) =>
      (no, wt) match {
        case (1, 2) => name = str(readBytes(b, c)); true
        case (3, 0) => number = readVarint(b, c).toInt; true
        case (4, 0) => label = readVarint(b, c).toInt; true
        case (5, 0) => tpe = readVarint(b, c).toInt; true
        case (6, 2) => typeName = str(readBytes(b, c)); true
        case _      => false
      }
    }
    FieldDesc(name, number, label, tpe, typeName)
  }

  // ------------------------------------------------------- PMessage link

  /** Resolve one message of a parsed descriptor file into the engine's
    * [[PMessage]] tree. Fails loudly on recursion (the columnar model
    * has no recursive types) and unknown types. */
  def toPMessage(file: FileDesc, msgName: String): PMessage = {
    val byName = file.messages.map(m => m.name -> m).toMap
    val done = mutable.Map.empty[String, PMessage]
    val visiting = mutable.Set.empty[String]
    def build(name: String): PMessage = done.get(name).getOrElse {
      require(!visiting(name), s"recursive message $name unsupported")
      visiting += name
      val m = byName.getOrElse(name,
        throw new IllegalArgumentException(s"unknown message $name"))
      val built = PMessage(m.name, m.fields.map { fd =>
        val t: PType = fd.tpe match {
          case TYPE_STRING  => PString
          case TYPE_INT32   => PInt32
          case TYPE_INT64   => PInt64
          case TYPE_FLOAT   => PFloat
          case TYPE_BOOL    => PBool
          case TYPE_MESSAGE =>
            val tn = fd.typeName.stripPrefix(".")
            if (tn == "google.protobuf.Timestamp") wellKnownTimestamp
            else {
              val local =
                if (file.pkg.nonEmpty && tn.startsWith(file.pkg + "."))
                  tn.drop(file.pkg.length + 1)
                else tn
              build(local)
            }
          case other =>
            throw new IllegalArgumentException(
              s"unsupported descriptor type $other for field ${fd.name}")
        }
        PField(fd.number, fd.name, t, repeated = fd.label == LABEL_REPEATED)
      })
      visiting -= name
      done(name) = built
      built
    }
    build(msgName)
  }

  /** One-call path: serialized FileDescriptorSet + message name →
    * PMessage (searches all files in the set). */
  def messageSchema(descriptorSet: Array[Byte], msgName: String): PMessage = {
    val files = parseFileDescriptorSet(descriptorSet)
    files.find(_.messages.exists(_.name == msgName)) match {
      case Some(f) => toPMessage(f, msgName)
      case None => throw new IllegalArgumentException(
        s"message $msgName not found in descriptor set " +
          s"(files: ${files.map(_.name).mkString(", ")})")
    }
  }

  /** Load a descriptor bundled on the classpath. */
  def loadResource(resource: String, msgName: String): PMessage = {
    val in = getClass.getResourceAsStream(resource)
    require(in != null, s"descriptor resource $resource missing")
    try messageSchema(in.readAllBytes(), msgName) finally in.close()
  }

  // ----------------------------------------------------------- encoding

  private final class Writer {
    private var buf = new Array[Byte](256)
    private var len = 0
    private def ensure(n: Int): Unit =
      if (len + n > buf.length)
        buf = java.util.Arrays.copyOf(buf, math.max(buf.length * 2, len + n))
    def varint(v0: Long): Unit = {
      ensure(10)
      var v = v0
      while ((v & ~0x7fL) != 0) { buf(len) = ((v & 0x7f) | 0x80).toByte; len += 1; v >>>= 7 }
      buf(len) = v.toByte; len += 1
    }
    def tag(no: Int, wt: Int): Unit = varint((no.toLong << 3) | wt)
    def strField(no: Int, s: String): Unit =
      if (s.nonEmpty) bytesField(no, s.getBytes(java.nio.charset.StandardCharsets.UTF_8))
    def bytesField(no: Int, b: Array[Byte]): Unit = {
      tag(no, 2); varint(b.length); ensure(b.length)
      System.arraycopy(b, 0, buf, len, b.length); len += b.length
    }
    def intField(no: Int, v: Long): Unit = { tag(no, 0); varint(v) }
    def toBytes: Array[Byte] = java.util.Arrays.copyOf(buf, len)
  }

  /** Serialize files as a FileDescriptorSet protoc would accept: local
    * message references resolve to fully-qualified `.pkg.Name`. */
  def encodeFileDescriptorSet(files: Seq[FileDesc]): Array[Byte] = {
    val w = new Writer
    files.foreach { f => w.bytesField(1, encodeFile(f)) }
    w.toBytes
  }

  private def encodeFile(f: FileDesc): Array[Byte] = {
    val w = new Writer
    w.strField(1, f.name)
    w.strField(2, f.pkg)
    f.messages.foreach { m =>
      val mw = new Writer
      mw.strField(1, m.name)
      m.fields.foreach { fd =>
        val fw = new Writer
        fw.strField(1, fd.name)
        fw.intField(3, fd.number)
        fw.intField(4, fd.label)
        fw.intField(5, fd.tpe)
        if (fd.tpe == TYPE_MESSAGE) {
          val tn =
            if (fd.typeName.startsWith(".")) fd.typeName
            else if (fd.typeName.contains(".")) "." + fd.typeName
            else if (f.pkg.nonEmpty) s".${f.pkg}.${fd.typeName}"
            else "." + fd.typeName
          fw.strField(6, tn)
        }
        mw.bytesField(2, fw.toBytes)
      }
      w.bytesField(4, mw.toBytes)
    }
    w.strField(12, "proto3")
    w.toBytes
  }

  // -------------------------------------------------- proto3 text parse

  private val scalarTypes: Map[String, Int] = Map(
    "string" -> TYPE_STRING, "int32" -> TYPE_INT32, "int64" -> TYPE_INT64,
    "float" -> TYPE_FLOAT, "bool" -> TYPE_BOOL)

  /** Mini-protoc front end for the proto3 subset the engine speaks:
    * flat (non-nested) messages, scalar/message/repeated fields, dotted
    * well-known type references. Options, enums, oneofs, maps and
    * nested messages are rejected loudly rather than mis-parsed. */
  def parseProtoText(text: String, fileName: String = "inline.proto"): FileDesc = {
    val noComments = text
      .replaceAll("(?s)/\\*.*?\\*/", " ")
      .replaceAll("//[^\n]*", " ")
    val toks = noComments
      .replace("{", " { ").replace("}", " } ")
      .replace(";", " ; ").replace("=", " = ")
      .split("\\s+").filter(_.nonEmpty).toList

    var pkg = ""
    val msgs = mutable.ArrayBuffer.empty[MessageDesc]
    var rest = toks
    def fail(what: String) =
      throw new IllegalArgumentException(s"proto parse: $what near " +
        rest.take(5).mkString(" "))
    while (rest.nonEmpty) rest match {
      case "syntax" :: "=" :: s :: ";" :: t =>
        require(s.contains("proto3"), s"only proto3 ($s)")
        rest = t
      case "package" :: p :: ";" :: t =>
        pkg = p; rest = t
      case "import" :: _ :: ";" :: t =>
        rest = t // imports resolve via well-known types at link time
      case "message" :: name :: "{" :: t =>
        val fields = mutable.ArrayBuffer.empty[FieldDesc]
        var body = t
        while (body.nonEmpty && body.head != "}") body match {
          case "repeated" :: tpe :: fname :: "=" :: num :: ";" :: bt =>
            fields += field(tpe, fname, num.toInt, LABEL_REPEATED); body = bt
          case tpe :: fname :: "=" :: num :: ";" :: bt
              if tpe != "message" && tpe != "enum" && tpe != "oneof" &&
                !tpe.startsWith("map") && tpe != "option" &&
                !tpe.contains("<") && tpe.forall(ch =>
                  ch.isLetterOrDigit || ch == '_' || ch == '.') =>
            fields += field(tpe, fname, num.toInt, 1); body = bt
          case bad =>
            rest = bad; fail(s"unsupported construct in message $name")
        }
        if (body.isEmpty) fail(s"unterminated message $name")
        msgs += MessageDesc(name, fields.toSeq)
        rest = body.tail
      case "option" :: _ => rest = rest.dropWhile(_ != ";").drop(1)
      case _ => fail("unsupported top-level construct")
    }
    FileDesc(fileName, pkg, msgs.toSeq)
  }

  private def field(tpe: String, name: String, num: Int, label: Int): FieldDesc =
    scalarTypes.get(tpe) match {
      case Some(t) => FieldDesc(name, num, label, t, "")
      case None    => FieldDesc(name, num, label, TYPE_MESSAGE, tpe)
    }
}
