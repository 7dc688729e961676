package graft

import org.scalatest.funsuite.AnyFunSuite

/** The launch-flag probe must agree with the build: sbt-forked JVMs carry the
  * `--add-opens` set from build.sbt, so `nioOpen` must be true HERE — if this
  * fails, either build.sbt lost the module options (and every Spark test is
  * one Kryo touch away from the opaque HeapByteBuffer failure JvmCheck
  * documents) or the probe itself broke and the standalone mains would warn
  * spuriously on correctly-launched JVMs.
  */
class JvmCheckSpec extends AnyFunSuite {
  test("sbt-forked test JVM has java.nio open (probe and build.sbt agree)") {
    assert(JvmCheck.nioOpen,
      "java.base/java.nio is not open to the unnamed module in the test JVM — " +
        "build.sbt's jdk17AddOpens and JvmCheck.nioOpen disagree")
  }
}
