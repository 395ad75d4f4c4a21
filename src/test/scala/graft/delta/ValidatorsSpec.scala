package graft.delta

import org.json4s.jackson.JsonMethods.parse
import org.scalatest.funsuite.AnyFunSuite

/** Validation guards over foreign log JSON (reference validators.ts
  * semantics: required fields typed, optional fields typed when present,
  * unknown fields ignored, never throws). */
class ValidatorsSpec extends AnyFunSuite {
  import Validators._

  test("schema guards") {
    assert(isValidSchema(parse(
      """{"type":"struct","fields":[{"name":"id","type":"long","nullable":true,"metadata":{}}]}""")))
    assert(isValidSchema(parse("""{"type":"struct","fields":[]}""")))
    // complex type object is a legal field type
    assert(isValidSchemaField(parse(
      """{"name":"m","type":{"type":"map","keyType":"string","valueType":"string","valueContainsNull":true}}""")))
    assert(!isValidSchemaField(parse("""{"name":"x"}"""))) // missing type
    assert(!isValidSchemaField(parse("""{"name":7,"type":"long"}""")))
    assert(!isValidSchemaField(parse("""{"name":"x","type":"long","nullable":"yes"}""")))
    assert(!isValidSchema(parse("""{"type":"struct","fields":[{"name":1}]}""")))
    assert(!isValidSchema(parse(""""struct"""")))
  }

  test("last-checkpoint guard") {
    assert(isValidLastCheckpoint(parse("""{"version":10,"size":120}""")))
    assert(isValidLastCheckpoint(parse("""{"version":10,"size":120,"parts":3}""")))
    assert(!isValidLastCheckpoint(parse("""{"version":"10","size":120}""")))
    assert(!isValidLastCheckpoint(parse("""{"version":10}""")))
    // explicit null is NOT a valid optional (reference: typeof null passes
    // no typed branch of `f === undefined || typeof f === 'number'`)
    assert(!isValidLastCheckpoint(parse("""{"version":10,"size":120,"parts":null}""")))
    assert(!isValidLastCheckpoint(parse("""{"version":10,"size":1,"parts":"3"}""")))
  }

  test("partition values and stats guards") {
    assert(isValidPartitionValues(parse("""{"k":"1","d":"2024-01-01"}""")))
    assert(isValidPartitionValues(parse("{}")))
    assert(!isValidPartitionValues(parse("""{"k":1}""")))
    assert(!isValidPartitionValues(parse("""["k"]""")))
    assert(isValidFileStats(parse(
      """{"numRecords":5,"minValues":{"id":1},"maxValues":{"id":9},"nullCount":{"id":0}}""")))
    assert(!isValidFileStats(parse(
      """{"numRecords":5,"minValues":{},"maxValues":{},"nullCount":{"id":"0"}}""")))
    assert(!isValidFileStats(parse("""{"numRecords":5}""")))
  }

  test("action payload guards") {
    assert(isValidAddAction(parse(
      """{"path":"p.parquet","size":10,"modificationTime":1,"dataChange":true,
         "partitionValues":{"k":"1"},"stats":"{\"numRecords\":1}"}""")))
    assert(!isValidAddAction(parse(
      """{"path":"p.parquet","size":"10","modificationTime":1,"dataChange":true}""")))
    assert(!isValidAddAction(parse(
      """{"path":"p.parquet","size":10,"modificationTime":1}"""))) // no dataChange
    assert(!isValidAddAction(parse(
      """{"path":"p","size":10,"modificationTime":1,"dataChange":true,"stats":{}}""")))
    assert(isValidRemoveAction(parse(
      """{"path":"p","deletionTimestamp":5,"dataChange":true,"size":10}""")))
    assert(!isValidRemoveAction(parse("""{"path":"p","dataChange":true}""")))
    assert(isValidMetadataAction(parse(
      """{"id":"t","schemaString":"{}","partitionColumns":[],
         "format":{"provider":"parquet"},"configuration":{}}""")))
    assert(!isValidMetadataAction(parse(
      """{"id":"t","schemaString":"{}","partitionColumns":[],"format":{}}""")))
    assert(isValidProtocolAction(parse("""{"minReaderVersion":1,"minWriterVersion":2}""")))
    assert(!isValidProtocolAction(parse("""{"minReaderVersion":1}""")))
    assert(isValidCommitInfoAction(parse("""{"timestamp":1,"operation":"WRITE"}""")))
    assert(!isValidCommitInfoAction(parse("""{"timestamp":1}""")))
  }

  test("wrapped-action guard + string convenience") {
    assert(isValidActionJson(
      """{"add":{"path":"p","size":1,"modificationTime":1,"dataChange":true}}"""))
    assert(isValidActionJson("""{"protocol":{"minReaderVersion":1,"minWriterVersion":2}}"""))
    assert(!isValidActionJson("""{"add":{"path":"p"}}"""))
    assert(!isValidActionJson("""{"unknownAction":{}}"""))
    assert(!isValidActionJson("""[1,2]"""))
    assert(!isValidActionJson("not json at all"))
    // the engine's OWN rendered actions all pass the guard (round-trip)
    val rendered = Seq[Action](
      AddFile("k=1/p.parquet", Map("k" -> "1"), 10L, 1L,
        stats = Some("""{"numRecords":1}""")),
      RemoveFile("k=1/p.parquet", 5L),
      TableMetadata("t", """{"type":"struct","fields":[]}""", Seq("k")),
      Protocol(1, 2),
      CommitInfo(1L, "WRITE", Map("numFiles" -> "1")))
    rendered.foreach { a =>
      val line = org.json4s.jackson.JsonMethods.compact(
        org.json4s.jackson.JsonMethods.render(a.wrap))
      assert(isValidActionJson(line), s"engine-rendered action failed guard: $line")
    }
  }
}
