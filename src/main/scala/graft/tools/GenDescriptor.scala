package graft.tools

import java.nio.file.{Files, Paths}

import graft.sources.proto.ProtoDescriptor

/** Mini-protoc: compile a .proto file (the engine's proto3 subset) into
  * a serialized FileDescriptorSet, for environments without protoc.
  *
  *   runMain graft.tools.GenDescriptor <in.proto> <out.desc>
  */
object GenDescriptor {
  def main(args: Array[String]): Unit = {
    require(args.length == 2, "usage: GenDescriptor <in.proto> <out.desc>")
    val text = new String(Files.readAllBytes(Paths.get(args(0))),
      java.nio.charset.StandardCharsets.UTF_8)
    val file = ProtoDescriptor.parseProtoText(
      text, Paths.get(args(0)).getFileName.toString)
    val bytes = ProtoDescriptor.encodeFileDescriptorSet(Seq(file))
    Files.createDirectories(Paths.get(args(1)).getParent)
    Files.write(Paths.get(args(1)), bytes)
    println(s"[gendesc] ${args(1)}: ${bytes.length} bytes, " +
      s"${file.messages.length} messages, package ${file.pkg}")
  }
}
