package graft.functions

import graft.SparkTestBase
import java.nio.file.Files
import scala.jdk.CollectionConverters._

/**
 * Forks [[CorpusSoak]] in a child JVM capped at `-Xmx1536m` and requires
 * the whole curation family (exact dedup, minhash near-dup, DISTRIBUTED
 * connected components, classifier/Gopher scoring, DSIR weighting,
 * incremental batch dedup) to survive a 100k-document corpus — 20× the
 * sf0.1 gate corpus — with every phase's output cardinality asserted
 * inside the child. A stage that materializes a per-corpus-size structure
 * in one place OOMs the child and fails here.
 */
class CorpusSoakSpec extends SparkTestBase {

  private val addOpens = Seq(
    "java.base/java.lang", "java.base/java.lang.invoke",
    "java.base/java.lang.reflect", "java.base/java.io",
    "java.base/java.net", "java.base/java.nio",
    "java.base/java.util", "java.base/java.util.concurrent",
    "java.base/java.util.concurrent.atomic",
    "java.base/sun.nio.ch", "java.base/sun.nio.cs",
    "java.base/sun.security.action", "java.base/sun.util.calendar",
  ).flatMap(p => Seq("--add-opens", s"$p=ALL-UNNAMED"))

  test("100k-doc corpus survives the curation family under -Xmx1536m") {
    val dir = Files.createTempDirectory("graft-corpus-soak").toString
    val javaBin = s"${System.getProperty("java.home")}/bin/java"
    val cmd = Seq(javaBin, "-Xmx1536m", "-cp", System.getProperty("java.class.path")) ++
      addOpens ++ Seq("graft.functions.CorpusSoak", dir, "100000")
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
    val heap = text.linesIterator
      .collectFirst { case l if l.startsWith("maxHeapMiB=") =>
        l.stripPrefix("maxHeapMiB=").trim.toLong }
    assert(heap.exists(_ <= 1600), s"child heap cap not applied: $heap MiB")
  }
}
