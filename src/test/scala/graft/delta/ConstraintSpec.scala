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

  test("streaming writeStream.toTable enforces CHECK task-side per epoch") {
    // Round-12: constraint tables no longer refuse the direct streaming
    // sink — each task evaluates the violation predicate per row.
    import graft.plans.GraftSql
    import org.apache.spark.sql.streaming.Trigger
    val cat = GraftSql.ensure(spark)
    spark.sql(s"CREATE NAMESPACE IF NOT EXISTS $cat.ck")
    val tbl = s"$cat.ck.stream1"
    spark.sql(s"CREATE TABLE $tbl (id BIGINT)")
    spark.sql(s"ALTER TABLE $tbl SET TBLPROPERTIES ('delta.constraints.pos' = 'id >= 0')")
    def streamOnce(dir: String): Option[Throwable] = {
      val src = spark.readStream.schema(
        org.apache.spark.sql.types.StructType(Seq(
          org.apache.spark.sql.types.StructField("id",
            org.apache.spark.sql.types.LongType)))).parquet(dir)
      val q = src.writeStream.trigger(Trigger.AvailableNow())
        .option("checkpointLocation",
          Files.createTempDirectory("graft-ck-cp").toString)
        .toTable(tbl)
      try { q.awaitTermination(); None }
      catch { case e: Throwable => Some(e) }
    }
    val good = Files.createTempDirectory("graft-ck-good").toString
    Seq(1L, 2L).toDF("id").write.mode("overwrite").parquet(good)
    assert(streamOnce(good).isEmpty)
    assert(spark.sql(s"SELECT count(*) FROM $tbl").head().getLong(0) == 2)
    val bad = Files.createTempDirectory("graft-ck-bad").toString
    Seq(3L, -1L).toDF("id").write.mode("overwrite").parquet(bad)
    assert(streamOnce(bad).isDefined, "violating epoch must fail the stream")
    assert(spark.sql(s"SELECT count(*) FROM $tbl").head().getLong(0) == 2,
      "a violating epoch must not commit")
  }

  test("ADD CONSTRAINT racing a violating append: constraint never records a lie") {
    // Round-11 advisor item 8: ADD CONSTRAINT validates against one
    // snapshot; a concurrent violating append must either lose (conflict /
    // violation) or land BEFORE the validation sees it (constraint add
    // then refuses). Invariant: at no point does the table hold both the
    // constraint and a violating row.
    import java.util.concurrent.{CountDownLatch, Executors, TimeUnit}
    (0 until 4).foreach { _ =>
      val t = tmpTable()
      t.write(Seq((1, 10.0)).toDF("id", "price"))
      val gate = new CountDownLatch(1)
      val pool = Executors.newFixedThreadPool(2)
      val addF = pool.submit { () =>
        gate.await(10, TimeUnit.SECONDS)
        try Right(t.addCheckConstraint("price_pos", "price > 0"))
        catch { case e: ValidationException => Left(e) }
      }
      val writeF = pool.submit { () =>
        gate.await(10, TimeUnit.SECONDS)
        try Right(t.write(Seq((2, -5.0)).toDF("id", "price")))
        catch { case e: ValidationException => Left(e) }
      }
      gate.countDown()
      val (addR, writeR) = (addF.get(60, TimeUnit.SECONDS),
        writeF.get(60, TimeUnit.SECONDS))
      pool.shutdown()
      val hasConstraint = t.metaSnapshot().configuration
        .contains("delta.constraints.price_pos")
      val hasViolation = !t.toDF().filter($"price" <= 0).isEmpty
      assert(!(hasConstraint && hasViolation),
        s"constraint recorded over violating data: add=$addR write=$writeR")
    }
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
