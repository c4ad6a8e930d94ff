package graft.sources

import org.apache.spark.sql.{functions => F}
import org.scalatest.funsuite.AnyFunSuite
import org.scalatest.matchers.should.Matchers

import graft.SparkSpec

/** CDC read contract of [[AvroMaintenance.readChanges]]: net row-level
  * changes between snapshot versions. Additive ranges take the
  * zero-shuffle fast path (only added files scanned, no Except in the
  * plan); any history with deletes/overwrites falls back to the
  * semantic diff; in-place rewrites with identical values net to no
  * change.
  */
class CdcSpec extends AnyFunSuite with SparkSpec with Matchers {

  private def tmp(): String = graft.operators.Catalog.tempDir("graft_cdc")

  test("additive range: fast path, insert-only, no Except in the plan") {
    val dir = tmp()
    spark.range(0, 10).toDF("k").coalesce(1)
      .write.format("graft-avro").mode("overwrite").save(dir)   // v1
    spark.range(10, 15).toDF("k").coalesce(1)
      .write.format("graft-avro").mode("append").save(dir)      // v2
    spark.range(15, 18).toDF("k").coalesce(1)
      .write.format("graft-avro").mode("append").save(dir)      // v3
    val ch = AvroMaintenance.readChanges(spark, dir, 1L, 3L)
    ch.queryExecution.optimizedPlan.toString should not include "Except"
    val rows = ch.orderBy("k").collect()
    rows.map(_.getLong(0)) shouldBe (10L until 18L).toArray
    rows.map(_.getString(1)).distinct shouldBe Array("insert")
  }

  test("delete in range: semantic diff yields net inserts AND deletes") {
    val dir = tmp()
    spark.range(0, 10).toDF("k").coalesce(1)
      .write.format("graft-avro").mode("overwrite").save(dir)   // v1
    spark.range(10, 15).toDF("k").coalesce(1)
      .write.format("graft-avro").mode("append").save(dir)      // v2
    AvroMaintenance.deleteWhere(spark, dir, "k", Seq(3L, 12L))  // v3
    val ch = AvroMaintenance.readChanges(spark, dir, 1L, 3L)
      .orderBy("_change_type", "k").collect()
    // k=12 appended then deleted nets to NOTHING; k=3 was in v1 -> delete
    ch.map(r => (r.getString(1), r.getLong(0))) shouldBe Array(
      ("delete", 3L),
      ("insert", 10L), ("insert", 11L), ("insert", 13L), ("insert", 14L))
  }

  test("identical rewrite nets to no change; full overwrite diffs exactly") {
    val dir = tmp()
    spark.range(0, 8).toDF("k").coalesce(1)
      .write.format("graft-avro").mode("overwrite").save(dir)   // v1
    // overwrite with the same values + one change: only the change nets
    spark.range(0, 8).toDF("k")
      .withColumn("k", F.when(F.col("k") === 7, 100L).otherwise(F.col("k")))
      .coalesce(1)
      .write.format("graft-avro").mode("overwrite").save(dir)   // v2
    val ch = AvroMaintenance.readChanges(spark, dir, 1L, 2L)
      .orderBy("_change_type", "k").collect()
    ch.map(r => (r.getString(1), r.getLong(0))) shouldBe Array(
      ("delete", 7L), ("insert", 100L))
  }

  test("guards: bad range and vanished versions fail loudly") {
    val dir = tmp()
    spark.range(0, 5).toDF("k")
      .write.format("graft-avro").mode("overwrite").save(dir)
    an[IllegalArgumentException] should be thrownBy
      AvroMaintenance.readChanges(spark, dir, 2L, 1L)
  }
}
