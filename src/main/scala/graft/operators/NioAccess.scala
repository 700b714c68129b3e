package graft.operators

/** Arrow's off-heap memory layer (`MemoryUtil`) needs `java.base` to
  * open `java.nio` to it — reflective access to the DirectByteBuffer
  * internals that back every ArrowBuf. Under spark-submit, sbt, or any
  * launcher that injects Spark's standard JDK-17 `--add-opens` set,
  * the package is already open and [[ensureOpen]] is a no-op. Under a
  * bare `java -cp` launch (the round harness's invocation shape) it is
  * not, and Arrow fails at first allocation — so this opens the
  * package at runtime: `Module.implAddOpens` invoked with its access
  * check disarmed via `Unsafe.putBoolean` on `Method.override` (the
  * long-standing pattern from lombok/burningwave; `override` is
  * AccessibleObject's only instance boolean, so a decoy class with one
  * boolean field yields its exact offset on any HotSpot layout — no
  * magic constants). Every step is verified before the next: a wrong
  * offset fails the `isAccessible` probe and surfaces the official
  * `--add-opens` advice instead of corrupting anything further.
  */
private[graft] object NioAccess {

  /** Decoy with AccessibleObject's field layout (one instance boolean,
    * no other instance fields) — its field offset IS `override`'s. */
  private final class Decoy { var flag: Boolean = false }

  private val advice =
    "start Java with --add-opens=java.base/java.nio=ALL-UNNAMED " +
      "(Arrow's off-heap buffers need reflective java.nio access)"

  /** Open `java.nio` to `target`'s module if the JVM wasn't launched
    * with the flag. Idempotent — concurrent first calls may both run
    * the open, which is benign (implAddOpens is itself idempotent);
    * throws with the official advice when the runtime route is
    * unavailable. */
  def ensureOpen(target: Class[_]): Unit = {
    val javaBase = classOf[Object].getModule
    val mod = target.getModule
    if (!javaBase.isOpen("java.nio", mod)) {
      try {
        val uc = Class.forName("sun.misc.Unsafe")
        val f = uc.getDeclaredField("theUnsafe")
        f.setAccessible(true)
        val u = f.get(null)
        val off = uc.getMethod("objectFieldOffset", classOf[java.lang.reflect.Field])
          .invoke(u, classOf[Decoy].getDeclaredField("flag"))
          .asInstanceOf[java.lang.Long].longValue()
        val implAddOpens = classOf[Module]
          .getDeclaredMethod("implAddOpens", classOf[String], classOf[Module])
        uc.getMethod("putBoolean", classOf[Object], java.lang.Long.TYPE,
            java.lang.Boolean.TYPE)
          .invoke(u, implAddOpens, java.lang.Long.valueOf(off),
            java.lang.Boolean.TRUE)
        @annotation.nowarn("cat=deprecation")
        def armed = implAddOpens.isAccessible
        if (!armed)
          throw new IllegalStateException("override offset probe failed")
        implAddOpens.invoke(javaBase, "java.nio", mod)
      } catch {
        case e: Throwable =>
          throw new IllegalStateException(s"$advice — runtime open failed", e)
      }
      if (!javaBase.isOpen("java.nio", mod))
        throw new IllegalStateException(advice)
    }
  }
}
