package graft.delta

import org.json4s._
import org.json4s.jackson.JsonMethods

/**
 * Public validation guards over FOREIGN log JSON (reference:
 * src/delta/validators.ts:29-283) — the "is this JSON a structurally valid
 * action/schema/checkpoint pointer?" API that log-inspection and interop
 * tooling needs. The engine's own read path stays the typed json4s parsers
 * in [[Actions]] (malformed input throws there, the idiomatic Scala shape);
 * these guards never throw — they answer false on anything malformed,
 * matching the reference's type-guard semantics field for field: required
 * fields must be present with the right JSON type, optional fields must
 * have the right type WHEN present, unknown extra fields are ignored.
 */
object Validators {

  private def isNum(j: JValue): Boolean = j match {
    case _: JInt | _: JLong | _: JDouble | _: JDecimal => true
    case _ => false
  }
  private def isStr(j: JValue): Boolean = j.isInstanceOf[JString]
  private def isBool(j: JValue): Boolean = j.isInstanceOf[JBool]
  private def isObj(j: JValue): Boolean = j.isInstanceOf[JObject]
  /** Optional field: valid when ABSENT, type-checked when present. An
    * explicit JSON `null` fails the check for EVERY optional: the
    * reference's scalar branches reject it via `typeof` (null is not
    * 'number'/'string'/'boolean'), and its object-typed branches carry an
    * explicit `|| obj.f === null` rejection precisely because
    * `typeof null === 'object'` (validators.ts:38,181,183,197,219,243). */
  private def opt(j: JValue)(check: JValue => Boolean): Boolean = j match {
    case JNothing => true
    case JNull => false
    case v => check(v)
  }

  /** Schema field: name + type required; type is a string (primitive) or an
    * object (struct/array/map); nullable/metadata optional
    * (validators.ts:29-40). */
  def isValidSchemaField(j: JValue): Boolean = j match {
    case o: JObject =>
      isStr(o \ "name") &&
        ((o \ "type") match { case JNothing | JNull => false
                              case t => isStr(t) || isObj(t) }) &&
        opt(o \ "nullable")(isBool) && opt(o \ "metadata")(isObj)
    case _ => false
  }

  /** Struct schema: type string + every field valid (validators.ts:45-56). */
  def isValidSchema(j: JValue): Boolean = j match {
    case o: JObject =>
      isStr(o \ "type") && ((o \ "fields") match {
        case JArray(fs) => fs.forall(isValidSchemaField)
        case _ => false
      })
    case _ => false
  }

  /** `_last_checkpoint` pointer (validators.ts:64-75). */
  def isValidLastCheckpoint(j: JValue): Boolean = j match {
    case o: JObject =>
      isNum(o \ "version") && isNum(o \ "size") &&
        opt(o \ "parts")(isNum) && opt(o \ "sizeInBytes")(isNum) &&
        opt(o \ "numOfAddFiles")(isNum)
    case _ => false
  }

  /** Partition values: flat string→string map (validators.ts:84-93). */
  def isValidPartitionValues(j: JValue): Boolean = j match {
    case JObject(fields) => fields.forall { case (_, v) => isStr(v) }
    case _ => false
  }

  /** Parsed per-file stats (validators.ts:97-110). */
  def isValidFileStats(j: JValue): Boolean = j match {
    case o: JObject =>
      isNum(o \ "numRecords") && isObj(o \ "minValues") &&
        isObj(o \ "maxValues") && ((o \ "nullCount") match {
          case JObject(fields) => fields.forall { case (_, v) => isNum(v) }
          case _ => false
        })
    case _ => false
  }

  /** Inner `add` payload (validators.ts:173-186). */
  def isValidAddAction(j: JValue): Boolean = j match {
    case o: JObject =>
      isStr(o \ "path") && isNum(o \ "size") &&
        isNum(o \ "modificationTime") && isBool(o \ "dataChange") &&
        opt(o \ "partitionValues")(isObj) && opt(o \ "stats")(isStr) &&
        opt(o \ "tags")(isObj)
    case _ => false
  }

  /** Inner `remove` payload (validators.ts:190-202). */
  def isValidRemoveAction(j: JValue): Boolean = j match {
    case o: JObject =>
      isStr(o \ "path") && isNum(o \ "deletionTimestamp") &&
        isBool(o \ "dataChange") && opt(o \ "partitionValues")(isObj) &&
        opt(o \ "extendedFileMetadata")(isBool) && opt(o \ "size")(isNum)
    case _ => false
  }

  /** Inner `metaData` payload (validators.ts:206-222). */
  def isValidMetadataAction(j: JValue): Boolean = j match {
    case o: JObject =>
      isStr(o \ "id") && isStr(o \ "schemaString") &&
        (o \ "partitionColumns").isInstanceOf[JArray] &&
        ((o \ "format") match {
          case f: JObject => isStr(f \ "provider")
          case _ => false
        }) &&
        opt(o \ "name")(isStr) && opt(o \ "description")(isStr) &&
        opt(o \ "createdTime")(isNum) && opt(o \ "configuration")(isObj)
    case _ => false
  }

  /** Inner `protocol` payload (validators.ts:226-231). */
  def isValidProtocolAction(j: JValue): Boolean = j match {
    case o: JObject =>
      isNum(o \ "minReaderVersion") && isNum(o \ "minWriterVersion")
    case _ => false
  }

  /** Inner `commitInfo` payload (validators.ts:237-248). */
  def isValidCommitInfoAction(j: JValue): Boolean = j match {
    case o: JObject =>
      isNum(o \ "timestamp") && isStr(o \ "operation") &&
        opt(o \ "operationParameters")(isObj) &&
        opt(o \ "readVersion")(isNum) &&
        opt(o \ "isolationLevel")(isStr) &&
        opt(o \ "isBlindAppend")(isBool)
    case _ => false
  }

  /** Complete wrapped action — the single-key `{"add": {...}}` NDJSON line
    * form — validating both wrapper and payload (validators.ts:254-276). */
  def isValidAction(j: JValue): Boolean = j match {
    case o: JObject =>
      (o \ "add") match { case JNothing => (o \ "remove") match {
        case JNothing => (o \ "metaData") match {
          case JNothing => (o \ "protocol") match {
            case JNothing => (o \ "commitInfo") match {
              case JNothing => false
              case ci => isValidCommitInfoAction(ci)
            }
            case p => isValidProtocolAction(p)
          }
          case m => isValidMetadataAction(m)
        }
        case r => isValidRemoveAction(r)
      }
      case a => isValidAddAction(a) }
    case _ => false
  }

  /** String-input convenience: parse + guard, never throws. */
  def isValidActionJson(json: String): Boolean =
    try isValidAction(JsonMethods.parse(json))
    catch { case scala.util.control.NonFatal(_) => false }
}
