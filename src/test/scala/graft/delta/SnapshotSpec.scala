package graft.delta

import org.scalatest.funsuite.AnyFunSuite

/** Within-commit reconciliation rules (reference: src/delta/table.ts:602-639
  * — the last action per path wins, so remove-then-add keeps the file and
  * add-then-remove drops it; latest metaData/protocol win across commits). */
class SnapshotSpec extends AnyFunSuite {

  private def add(p: String, size: Long = 1L) = AddFile(p, Map.empty, size, 0L)
  private def rm(p: String) = RemoveFile(p, 1L)

  test("remove then add in one commit: the add wins") {
    val s = Snapshot.replay(Snapshot.empty,
      Iterator(0L -> Seq[Action](rm("a"), add("a"))))
    assert(s.activeFiles.map(_.path) == Seq("a"))
    assert(!s.tombstones.exists(_.path == "a"))
  }

  test("add then remove in one commit: the remove wins") {
    val s = Snapshot.replay(Snapshot.empty,
      Iterator(0L -> Seq[Action](add("a"), rm("a"))))
    assert(s.activeFiles.isEmpty)
    assert(s.tombstones.map(_.path) == Seq("a"))
  }

  test("multiple adds for a path: the last one wins") {
    val s = Snapshot.replay(Snapshot.empty,
      Iterator(0L -> Seq[Action](add("a", 1), add("a", 2), add("a", 3))))
    assert(s.activeFiles.map(f => (f.path, f.size)) == Seq(("a", 3L)))
  }

  test("re-add across commits clears the tombstone") {
    val s = Snapshot.replay(Snapshot.empty, Iterator(
      0L -> Seq[Action](add("a", 1)),
      1L -> Seq[Action](rm("a")),
      2L -> Seq[Action](add("a", 9))))
    assert(s.activeFiles.map(f => (f.path, f.size)) == Seq(("a", 9L)))
    assert(!s.tombstones.exists(_.path == "a"))
    assert(s.version == 2L)
  }

  test("latest metaData and protocol win across commits") {
    val m1 = TableMetadata("id1", schemaString = "{\"type\":\"struct\",\"fields\":[]}")
    val m2 = m1.copy(id = "id2")
    val s = Snapshot.replay(Snapshot.empty, Iterator(
      0L -> Seq[Action](Protocol(1, 1), m1),
      1L -> Seq[Action](m2, Protocol(1, 2))))
    assert(s.metadata.map(_.id).contains("id2"))
    assert(s.protocol.map(_.minWriterVersion).contains(2))
  }
}
