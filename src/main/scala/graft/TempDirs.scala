package graft

/** JVM-exit cleanup for process-lifetime temp directories (bucketed-table
  * warehouses, streaming source dirs): helpers that create a temp path once
  * per process register it here so long-lived sessions don't strand /tmp
  * copies after exit. Registration is idempotent; deletion is best-effort
  * (a half-deleted tree on a dirty shutdown is still garbage-collected by
  * the OS tmp reaper). */
object TempDirs {
  private val paths = scala.collection.mutable.LinkedHashSet.empty[String]
  private lazy val hook: Unit = Runtime.getRuntime.addShutdownHook(new Thread {
    override def run(): Unit = paths.synchronized {
      paths.foreach { p =>
        try deleteRecursively(new java.io.File(p)) catch { case _: Throwable => () }
      }
    }
  })

  def deleteOnExit(path: String): Unit = paths.synchronized {
    hook
    paths += path
  }

  private def deleteRecursively(f: java.io.File): Unit = {
    val children = f.listFiles()
    if (children != null) children.foreach(deleteRecursively)
    f.delete()
    ()
  }
}
