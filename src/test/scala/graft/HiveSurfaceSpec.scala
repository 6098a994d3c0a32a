package graft

import org.scalatest.funsuite.AnyFunSuite

/** Launches graft.HiveCheck in its OWN JVM: the hive session catalog is a
  * SharedState-static choice, so it can only be proven in a JVM whose first
  * SparkSession enables it — which a shared test JVM can't guarantee (the
  * in-suite hive test in GraftSessionSpec self-cancels for that reason).
  * Working dir is a scratch temp dir so the derby metastore + warehouse of
  * the permanent-function test never pollute the repo. */
class HiveSurfaceSpec extends AnyFunSuite {

  private val addOpens = Seq(
    "java.base/java.lang", "java.base/java.lang.invoke",
    "java.base/java.lang.reflect", "java.base/java.io",
    "java.base/java.net", "java.base/java.nio",
    "java.base/java.util", "java.base/java.util.concurrent",
    "java.base/java.util.concurrent.atomic",
    "java.base/sun.nio.ch", "java.base/sun.nio.cs",
    "java.base/sun.security.action", "java.base/sun.util.calendar",
  ).flatMap(p => Seq("--add-opens", s"$p=ALL-UNNAMED"))

  test("hive UDF + UDAF (both styles) + GenericUDTF + permanent function (forked JVM)") {
    val javaBin = new java.io.File(
      new java.io.File(System.getProperty("java.home"), "bin"), "java").getAbsolutePath
    val cp = System.getProperty("java.class.path")
    val scratch = java.nio.file.Files.createTempDirectory("graft-hivecheck").toFile
    val cmd = (Seq(javaBin) ++ addOpens ++ Seq(
      "-Xmx2g",
      "-Dspark.ui.enabled=false",
      "-Dspark.sql.session.timeZone=UTC",
      s"-Dderby.system.home=${scratch.getAbsolutePath}",
      "-cp", cp, "graft.HiveCheck")).toArray
    val pb = new ProcessBuilder(cmd: _*)
    pb.directory(scratch)
    pb.redirectErrorStream(true)
    val p = pb.start()
    // drain concurrently — readAllBytes before waitFor deadlocks if the
    // child fills the pipe; and bound the wait so a wedged Spark/Derby init
    // fails THIS test instead of hanging the whole suite
    val drained = new java.util.concurrent.CompletableFuture[String]()
    val drainer = new Thread(() =>
      drained.complete(new String(p.getInputStream.readAllBytes(), "UTF-8")))
    drainer.setDaemon(true)
    drainer.start()
    val finished = p.waitFor(300, java.util.concurrent.TimeUnit.SECONDS)
    if (!finished) p.destroyForcibly()
    val out =
      try drained.get(10, java.util.concurrent.TimeUnit.SECONDS)
      catch { case _: Throwable => "<output drain timed out>" }
    try {
      assert(finished, s"HiveCheck timed out after 300s, tail:\n${out.takeRight(6000)}")
      assert(p.exitValue() == 0 && out.contains("HIVECHECK OK"),
        s"HiveCheck rc=${p.exitValue()}, tail:\n${out.takeRight(6000)}")
    } finally {
      def rm(f: java.io.File): Unit = {
        Option(f.listFiles()).foreach(_.foreach(rm)); f.delete()
      }
      rm(scratch)
    }
  }
}
