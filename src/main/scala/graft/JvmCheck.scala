package graft

/** Launch-environment probe for the standalone mains (Bench / Verify /
  * ScaleCheck / PlanProbe).
  *
  * Spark 4 on JDK 17+ needs the `--add-opens` module options that
  * `spark-submit` (and this repo's `build.sbt` for sbt-forked JVMs) inject —
  * see `org.apache.spark.launcher.JavaModuleOptions`. A plain `java -cp ...`
  * launch without them works for MOST plans, which is exactly what makes the
  * gap dangerous: the first code path that instantiates Kryo — in practice a
  * memory-pressed run spilling a cached block whose class tag auto-picks the
  * Kryo serializer — dies mid-query with an opaque
  * `Unable to create serializer ... for class: java.nio.HeapByteBuffer`
  * (Kryo's FieldSerializer needs reflective access into `java.nio`, and
  * `KryoSerializer.newKryo` registers ByteBuffer classes unconditionally, so
  * ANY first Kryo use fails). Round 10 hit this 15 minutes into an sf100
  * bench on d11's spilling decontam cache; small-sf runs never spill, so the
  * launch-flag gap had been invisible for ten rounds.
  *
  * The probe performs the same kind of reflective access Kryo needs and warns
  * ONCE at startup with the fix, instead of letting the run fail an hour in.
  * It deliberately does not abort: closed modules are harmless for runs that
  * never touch Kryo, and the warning names the exact condition under which
  * they are not.
  */
object JvmCheck {
  /** True when `java.base/java.nio` is open to the unnamed module (the
    * representative of the full option set — all of Spark's add-opens travel
    * together in every sane launch).
    */
  private[graft] def nioOpen: Boolean =
    try {
      // the same shape of access Kryo's FieldSerializer needs: a private
      // field of a java.base/java.nio class made accessible from here
      val f = classOf[java.nio.Buffer].getDeclaredField("address")
      f.setAccessible(true)
      true
    } catch { case _: Throwable => false }

  /** Print a one-line actionable warning to stderr when the JVM was launched
    * without Spark's JDK module options. Call once from each standalone main.
    */
  def warnIfModulesClosed(): Unit =
    if (!nioOpen)
      System.err.println(
        "[graft] WARNING: this JVM lacks Spark's JDK17 module options " +
          "(--add-opens java.base/java.nio=ALL-UNNAMED etc.). Plans that " +
          "touch the Kryo serializer - e.g. a memory-pressed run spilling a " +
          "cached block - will fail mid-query. Launch through sbt, or add " +
          "$(org.apache.spark.launcher.JavaModuleOptions.defaultModuleOptions()) " +
          "to the java command line.")
}
