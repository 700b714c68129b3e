package graft.operators

import org.apache.hadoop.fs.{FileSystem, Path}

/** UTF-8 whole-file read over Hadoop FS, draining to EOF — a single
  * read() may legally return short on HCFS streams, and the small
  * control files this reads (lease, markers, stats manifests) would be
  * silently torn by a one-shot read. The single copy of the loop
  * (commit markers, writer leases, stats manifests all read through
  * here). */
private[graft] object HadoopText {
  def readUtf8(fs: FileSystem, p: Path): String = {
    val in = fs.open(p)
    try {
      val bytes = new java.io.ByteArrayOutputStream()
      val buf = new Array[Byte](1 << 16)
      var n = in.read(buf)
      while (n >= 0) { bytes.write(buf, 0, n); n = in.read(buf) }
      new String(bytes.toByteArray, java.nio.charset.StandardCharsets.UTF_8)
    } finally in.close()
  }
}
