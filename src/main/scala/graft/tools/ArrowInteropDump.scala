package graft.tools

import graft.GraftSession
import graft.operators.ArrowInterchange

/** Dumps the nested interop fixture (dev/driver tool): exports the
  * nested frame `q_arrow_nested` rides (struct-of-struct +
  * list&lt;struct&gt; over documents — the shape of the reference's
  * bufarrow data plane, /root/reference/main.go:203) as plain Arrow
  * IPC under `outDir`, for `tools/check_arrow_interop.py` to open with
  * pyarrow and query in DuckDB. The cross-language read is the
  * interchange contract the operator exists for; the python side
  * additionally flattens the nested columns to prove they are
  * queryable, not just parseable, outside the JVM.
  *
  * Usage: `runMain graft.tools.ArrowInteropDump [sfDir] [outDir]`
  */
object ArrowInteropDump {
  def main(args: Array[String]): Unit = {
    val dir = args.headOption.getOrElse(
      sys.env.getOrElse("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.01"))
    val out = args.lift(1).getOrElse("/tmp/graft-arrow-interop")
    val spark = GraftSession.create(8, "graft-arrow-interop")
    ArrowInterchange.exportArrow(
      ArrowInterchange.nestedFrame(spark, dir), s"$out/nested")
    // the optional IPC body compression must stay standard: the same
    // nested fixture, zstd-compressed, read by the same pyarrow check
    ArrowInterchange.exportArrow(
      ArrowInterchange.nestedFrame(spark, dir), s"$out/nested_zstd",
      compression = "zstd")
    println(s"nested .arrows exports at $out — verify with: " +
      s"python3 tools/check_arrow_interop.py $out/nested && " +
      s"python3 tools/check_arrow_interop.py $out/nested_zstd")
    spark.stop()
  }
}
