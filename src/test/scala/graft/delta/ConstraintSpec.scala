package graft.delta

import graft.SparkTestBase
import java.nio.file.Files

/** CHECK constraints: enforced on every write path, violation fails
  * before commit, staged files cleaned up. */
class ConstraintSpec extends SparkTestBase {
  import spark.implicits._

  private def tmpTable(): DeltaTable =
    DeltaTable.forPath(spark, Files.createTempDirectory("graft-ck").toString)

  test("constraint rejects violating writes before commit; valid writes pass") {
    val t = tmpTable()
    t.write(Seq((1, 10.0), (2, 20.0)).toDF("id", "price"))
    t.addCheckConstraint("price_pos", "price > 0")
    val vBefore = t.version
    val e = intercept[ValidationException](
      t.write(Seq((3, -5.0), (4, 30.0)).toDF("id", "price")))
    assert(e.getMessage.contains("price_pos"))
    assert(t.version == vBefore)    // nothing committed
    assert(t.toDF().count() == 2)   // nothing visible
    t.write(Seq((5, 50.0)).toDF("id", "price")) // valid rows still flow
    assert(t.toDF().count() == 3)
  }

  test("adding a constraint existing data violates is rejected") {
    val t = tmpTable()
    t.write(Seq((1, -1.0)).toDF("id", "price"))
    intercept[ValidationException](t.addCheckConstraint("price_pos", "price > 0"))
    // after cleaning the data it can be added, then dropped
    t.delete("""{"id":1}""")
    t.write(Seq((2, 2.0)).toDF("id", "price"))
    t.addCheckConstraint("price_pos", "price > 0")
    t.dropCheckConstraint("price_pos")
    t.write(Seq((3, -3.0)).toDF("id", "price")) // allowed again
    assert(t.toDF().count() == 2)
    intercept[ValidationException](t.dropCheckConstraint("nope"))
  }

  test("sparse appends omitting a constrained column evaluate CHECK over NULL") {
    val t = tmpTable()
    t.write(Seq((1, 10.0)).toDF("id", "price"))
    t.addCheckConstraint("price_pos", "price > 0")
    // omitted column → NULL → CHECK passes per SQL semantics (Delta parity):
    // this is a legal schema-evolution write and must not fail analysis
    t.write(Seq(2, 3).toDF("id"))
    assert(t.toDF().count() == 3)
    assert(t.toDF().filter($"price".isNull).count() == 2)
    // a null-REJECTING constraint over the omitted column still fails
    val t2 = tmpTable()
    t2.write(Seq((1, 10.0)).toDF("id", "price"))
    t2.addCheckConstraint("price_set", "price IS NOT NULL")
    intercept[ValidationException](t2.write(Seq(9).toDF("id")))
    assert(t2.toDF().count() == 1)
  }

  test("CoW and MoR updates cannot write rows that violate a constraint") {
    val t = tmpTable()
    t.write(Seq((1, 10.0), (2, 20.0)).toDF("id", "price"))
    t.addCheckConstraint("price_pos", "price > 0")
    intercept[ValidationException](
      t.update("""{"id":1}""", """{"price": -9}"""))
    intercept[ValidationException](
      t.updateWithDV("""{"id":2}""", """{"price": -9}"""))
    assert(t.toDF().filter($"price" < 0).isEmpty)
    assert(t.toDF().count() == 2)
    // merge images are checked too
    intercept[ValidationException](
      t.mergeWithDV(Seq((1, -4.0)).toDF("id", "price"), Seq("id")))
    assert(t.toDF().filter($"price" < 0).isEmpty)
  }
}
