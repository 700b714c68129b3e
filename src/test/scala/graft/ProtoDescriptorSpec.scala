package graft

import org.scalatest.funsuite.AnyFunSuite

import graft.sources.proto.{BidRequestSchema, ProtoDescriptor, ProtoSchema}

/** Descriptor-file schema autogen (SURVEY A5): the bundled compiled
  * descriptor must reproduce the independently hand-declared 22-message
  * tree exactly, and the mini-protoc text front end must roundtrip
  * through the binary FileDescriptorSet format.
  */
class ProtoDescriptorSpec extends AnyFunSuite {

  test("bundled descriptor derives the exact hand-declared message tree") {
    val fromDesc = BidRequestSchema.bidrequest // loaded from .desc resource
    assert(fromDesc == BidRequestSchema.declared)
    assert(ProtoSchema.toStructType(fromDesc) ==
      ProtoSchema.toStructType(BidRequestSchema.declared))
  }

  test("proto text -> descriptor set -> PMessage roundtrips") {
    val text =
      """syntax = "proto3";
        |package a.b;
        |import "google/protobuf/timestamp.proto";
        |// a comment
        |message Inner { string id = 1; repeated int32 xs = 2; }
        |message Outer {
        |  string name = 1;       /* inline comment */
        |  repeated Inner inner = 2;
        |  google.protobuf.Timestamp ts = 3;
        |  float score = 4;
        |  bool flag = 5;
        |  int64 big = 6;
        |}""".stripMargin
    val file = ProtoDescriptor.parseProtoText(text, "t.proto")
    assert(file.pkg == "a.b")
    assert(file.messages.map(_.name) == Seq("Inner", "Outer"))
    val bytes = ProtoDescriptor.encodeFileDescriptorSet(Seq(file))
    val back = ProtoDescriptor.parseFileDescriptorSet(bytes)
    assert(back.length == 1)
    val m = ProtoDescriptor.messageSchema(bytes, "Outer")
    import graft.sources.proto._
    assert(m == PMessage("Outer", Seq(
      PField(1, "name", PString),
      PField(2, "inner", PMessage("Inner", Seq(
        PField(1, "id", PString),
        PField(2, "xs", PInt32, repeated = true))), repeated = true),
      PField(3, "ts", ProtoDescriptor.wellKnownTimestamp),
      PField(4, "score", PFloat),
      PField(5, "flag", PBool),
      PField(6, "big", PInt64))))
  }

  test("unknown descriptor fields are skipped, recursion is rejected") {
    // recursion guard
    val rec = ProtoDescriptor.parseProtoText(
      "syntax = \"proto3\"; message A { A a = 1; }")
    val bytes = ProtoDescriptor.encodeFileDescriptorSet(Seq(rec))
    val e = intercept[IllegalArgumentException] {
      ProtoDescriptor.messageSchema(bytes, "A")
    }
    assert(e.getMessage.contains("recursive"))
    // unsupported constructs fail loudly instead of mis-parsing
    intercept[IllegalArgumentException] {
      ProtoDescriptor.parseProtoText(
        "syntax = \"proto3\"; message A { map<string,int32> m = 1; }")
    }
  }
}
