package graft.delta

import graft.SparkTestBase
import java.nio.file.Files
import scala.jdk.CollectionConverters._

/**
 * Forks [[DriverSoak]] in a child JVM capped at `-Xmx1g` and requires it to
 * survive a ~10⁶-file table through scan → DML → checkpoint roll-forward →
 * vacuum. Any path that materializes the full file list on the driver
 * (10⁶ AddFiles + parse garbage is multiple GB) OOMs the child and fails
 * the test — this converts the "designed for 100×" claim about the
 * distributed snapshot/checkpoint/vacuum/DML-tail paths into evidence.
 */
class DriverSoakSpec extends SparkTestBase {

  private val addOpens = Seq(
    "java.base/java.lang", "java.base/java.lang.invoke",
    "java.base/java.lang.reflect", "java.base/java.io",
    "java.base/java.net", "java.base/java.nio",
    "java.base/java.util", "java.base/java.util.concurrent",
    "java.base/java.util.concurrent.atomic",
    "java.base/sun.nio.ch", "java.base/sun.nio.cs",
    "java.base/sun.security.action", "java.base/sun.util.calendar",
  ).flatMap(p => Seq("--add-opens", s"$p=ALL-UNNAMED"))

  test("1M-file log survives scan/DML/checkpoint/vacuum under -Xmx1g") {
    val dir = Files.createTempDirectory("graft-soak").toString
    val javaBin = s"${System.getProperty("java.home")}/bin/java"
    val cmd = Seq(javaBin, "-Xmx1g", "-cp", System.getProperty("java.class.path")) ++
      addOpens ++ Seq("graft.delta.DriverSoak", dir, "1000000")
    val out = new StringBuilder
    val t0 = System.currentTimeMillis()
    val proc = new ProcessBuilder(cmd.asJava).redirectErrorStream(true).start()
    val reader = new java.io.BufferedReader(
      new java.io.InputStreamReader(proc.getInputStream))
    var line = reader.readLine()
    while (line != null) {
      out.append(line).append('\n')
      line = reader.readLine()
    }
    val code = proc.waitFor()
    val secs = (System.currentTimeMillis() - t0) / 1000
    val text = out.toString
    info(s"soak wall-clock: ${secs}s")
    text.linesIterator.filter(l =>
      l.startsWith("SOAK OK") || l.startsWith("maxHeapMiB")).foreach(info(_))
    assert(code == 0, s"soak JVM exited $code:\n${text.takeRight(4000)}")
    assert(text.contains("SOAK OK"), s"no SOAK OK marker:\n${text.takeRight(4000)}")
    // prove the cap was real: the child's max heap must be ~1 GiB
    val heap = text.linesIterator
      .collectFirst { case l if l.startsWith("maxHeapMiB=") =>
        l.stripPrefix("maxHeapMiB=").trim.toLong }
    assert(heap.exists(_ <= 1100), s"child heap cap not applied: $heap MiB")
  }
}
