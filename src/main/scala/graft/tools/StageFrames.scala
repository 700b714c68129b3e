package graft.tools
import org.apache.spark.sql.functions._
import graft.operators.ProtoPipeline
import graft.sources.proto.ProtoFunctions
object StageFrames {
  def main(a: Array[String]): Unit = {
    val spark = graft.GraftSession.create(32, "stage-frames")
    ProtoPipeline.framedMessages(spark, "/root/testdata/sf0.1")
      .select(col("value"), ProtoFunctions.leUint64(col("value")).as("tm"))
      .select(expr("substring(value, 1, length(value) - 8)").as("value"),
        timestamp_millis(col("tm")).as("timestamp"))
      .coalesce(8).write.mode("overwrite").parquet("/tmp/graft_frames")
    spark.stop()
  }
}
