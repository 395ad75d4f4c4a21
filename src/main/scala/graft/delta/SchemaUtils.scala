package graft.delta

import org.apache.spark.sql.types._

final class SchemaValidationException(msg: String) extends RuntimeException(msg)

/**
 * Additive schema evolution with numeric widening, mirroring the reference's
 * `validateAndMergeSchemas` / `areTypesCompatible`
 * (reference: src/delta/table.ts:1239-1280,1393-1404): new fields merge in as
 * nullable, missing fields backfill as null, numeric↔numeric promotes to the
 * wider type, and any other type change is a validation error.
 */
object SchemaUtils {

  private def numericRank(dt: DataType): Option[Int] = dt match {
    case ByteType => Some(0)
    case ShortType => Some(1)
    case IntegerType => Some(2)
    case LongType => Some(3)
    case FloatType => Some(4)
    case DoubleType => Some(5)
    case _ => None
  }

  /** Widest common type for compatible pairs; None if incompatible. */
  def widen(a: DataType, b: DataType): Option[DataType] = (a, b) match {
    case (x, y) if x == y => Some(x)
    case (x: StructType, y: StructType) => scala.util.Try(merge(x, y)).toOption
    case (ArrayType(xe, xn), ArrayType(ye, yn)) =>
      widen(xe, ye).map(e => ArrayType(e, xn || yn))
    case (MapType(xk, xv, xn), MapType(yk, yv, yn)) =>
      for { k <- widen(xk, yk); v <- widen(xv, yv) } yield MapType(k, v, xn || yn)
    case (x, y) =>
      (numericRank(x), numericRank(y)) match {
        case (Some(rx), Some(ry)) => Some(if (rx >= ry) x else y)
        case _ => None
      }
  }

  /** Merge `incoming` into `existing`; throws on incompatible field types. */
  def merge(existing: StructType, incoming: StructType): StructType = {
    val existingNames = existing.fieldNames.toSet
    val merged = existing.fields.map { ef =>
      incoming.fields.find(_.name == ef.name) match {
        case None => ef
        case Some(inf) => widen(ef.dataType, inf.dataType) match {
          case Some(w) => ef.copy(dataType = w, nullable = ef.nullable || inf.nullable)
          case None => throw new SchemaValidationException(
            s"incompatible type change for column '${ef.name}': " +
              s"${ef.dataType.simpleString} vs ${inf.dataType.simpleString}")
        }
      }
    }
    // New columns append as nullable (backfilled null for old files).
    val added = incoming.fields.filterNot(f => existingNames.contains(f.name))
      .map(_.copy(nullable = true))
    StructType(merged ++ added)
  }
}
