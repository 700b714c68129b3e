package graft

import org.apache.spark.sql.SparkSession
import org.scalatest.funsuite.AnyFunSuite

import graft.sources.proto.{ProtoDecode, ProtoEncode}

/** Extension surface: SQL-registered codec functions and the
  * encode→decode roundtrip elimination rule.
  */
class GraftExtensionsSpec extends AnyFunSuite {

  // the shared test session already exists, so the config-time
  // extensions path can't apply — use the live-session installer
  private lazy val spark: SparkSession = {
    val s = SparkTestSession.spark
    GraftExtensions.install(s)
    GraftExtensions.installRoundtripElimination(s)
    s
  }

  test("SQL users can decode bidrequests via registered function") {
    val frames = graft.operators.ProtoPipeline
      .framedMessages(spark, SparkTestSession.sf0001).limit(5)
    frames.createOrReplaceTempView("frames")
    val out = spark.sql(
      """SELECT graft_decode_bidrequest(
        |         substring(value, 7, length(value) - 14)).id AS id,
        |       graft_le_uint64(value) AS event_tm
        |FROM frames""".stripMargin).collect()
    assert(out.length == 5)
    assert(out.forall(r => r.getString(0).nonEmpty && r.getLong(1) > 0))
  }

  test("optimizer eliminates encode(decode) roundtrips") {
    val df = spark.sql(
      """SELECT graft_decode_bidrequest(
        |         graft_encode_bidrequest(
        |           named_struct('id', 'x'))) IS NOT NULL AS ok""".stripMargin)
    // the roundtrip rule fires only when schemas match; here encode takes
    // the full schema, so check the plan via an exact-schema roundtrip:
    val frames = graft.operators.ProtoPipeline
      .framedMessages(spark, SparkTestSession.sf0001).limit(1)
    frames.createOrReplaceTempView("frames2")
    val rt = spark.sql(
      """SELECT graft_encode_bidrequest(
        |         graft_decode_bidrequest(
        |           substring(value, 7, length(value) - 14))) AS re
        |FROM frames2""".stripMargin)
    // decode(encode(x)) is the eliminable direction:
    val elim = spark.sql(
      """SELECT graft_decode_bidrequest(
        |         graft_encode_bidrequest(
        |           graft_decode_bidrequest(
        |             substring(value, 7, length(value) - 14)))).id AS id
        |FROM frames2""".stripMargin)
    val optimized = elim.queryExecution.optimizedPlan
    // traverse every plan node; the frames view legitimately contains one
    // writer-schema encode — the full-schema decode(encode(·)) pair must
    // be gone, leaving exactly one decode
    val codec = optimized.collect { case p =>
      p.expressions.flatMap(_.collect {
        case e: ProtoDecode => e
        case e: ProtoEncode => e
      })
    }.flatten
    assert(codec.count(_.isInstanceOf[ProtoDecode]) == 1,
      s"expected single decode after roundtrip elimination, got $codec")
    assert(!codec.exists {
      case ProtoEncode(_, m) =>
        m == graft.sources.proto.BidRequestSchema.bidrequest
      case _ => false
    }, "full-schema encode should have been eliminated")
    assert(elim.collect().nonEmpty && rt.collect().nonEmpty && df != null)
  }
}
