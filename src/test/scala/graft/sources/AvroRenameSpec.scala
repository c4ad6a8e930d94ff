package graft.sources

import graft.SparkSpec
import org.apache.spark.sql.{functions => F}
import org.scalatest.funsuite.AnyFunSuite
import org.scalatest.matchers.should.Matchers

/** Column RENAME without rewriting data: `_graft_colmap` lines translate
  * per-file (birth-version-aware), old files decode through Avro
  * reader-field aliases, new files carry the new name natively. The
  * re-added-name case must stay unambiguous: an old file's renamed-away
  * field never serves a new same-named column.
  */
class AvroRenameSpec extends AnyFunSuite with SparkSpec with Matchers {

  private def tmp() = graft.operators.Catalog.tempDir("graft_rename")

  test("rename surfaces the new name; data and filters stay exact") {
    val dir = tmp()
    spark.range(100).selectExpr("id as k", "id * 2 as v").coalesce(1)
      .write.format("graft-avro").mode("overwrite").save(dir)
    AvroMaintenance.renameColumn(spark, dir, "v", "val")
    val back = spark.read.format("graft-avro").load(dir)
    back.schema.fieldNames.toSeq shouldBe Seq("k", "val")
    back.agg(F.sum("val")).head().getLong(0) shouldBe (0L until 100L).map(_ * 2).sum
    // pushed filter on the NEW name must hit the aliased old data
    back.filter(F.col("val") === 42L).select("k").head().getLong(0) shouldBe 21L
  }

  test("appends after the rename align into one column") {
    val dir = tmp()
    spark.range(50).selectExpr("id as k", "id as v").coalesce(1)
      .write.format("graft-avro").mode("overwrite").save(dir)
    AvroMaintenance.renameColumn(spark, dir, "v", "val")
    spark.range(50, 100).selectExpr("id as k", "id as val").coalesce(1)
      .write.format("graft-avro").mode("append").save(dir)
    val back = spark.read.format("graft-avro").load(dir)
    back.schema.fieldNames.toSeq shouldBe Seq("k", "val")
    back.count() shouldBe 100
    back.agg(F.sum("val")).head().getLong(0) shouldBe (0L until 100L).sum
  }

  test("re-adding the old name creates a NEW column; old rows read null") {
    val dir = tmp()
    spark.range(10).selectExpr("id as k", "id + 100 as v").coalesce(1)
      .write.format("graft-avro").mode("overwrite").save(dir)
    AvroMaintenance.renameColumn(spark, dir, "v", "val")
    spark.range(10, 20)
      .selectExpr("id as k", "id + 100 as val", "id + 500 as v").coalesce(1)
      .write.format("graft-avro").mode("append").save(dir)
    val back = spark.read.format("graft-avro").load(dir)
    back.schema.fieldNames.sorted.toSeq shouldBe Seq("k", "v", "val")
    // val spans both generations
    back.agg(F.sum("val")).head().getLong(0) shouldBe
      (0L until 20L).map(_ + 100).sum
    // the NEW v exists only in the new files; old rows are null, and the
    // old files' physical 'v' field must NOT leak into it
    back.filter(F.col("k") < 10).filter(F.col("v").isNotNull).count() shouldBe 0
    back.filter(F.col("k") >= 10).agg(F.sum("v")).head().getLong(0) shouldBe
      (10L until 20L).map(_ + 500).sum
  }

  test("chained renames compose across generations") {
    val dir = tmp()
    spark.range(10).selectExpr("id as k", "id as a").coalesce(1)
      .write.format("graft-avro").mode("overwrite").save(dir)
    AvroMaintenance.renameColumn(spark, dir, "a", "b")
    spark.range(10, 20).selectExpr("id as k", "id as b").coalesce(1)
      .write.format("graft-avro").mode("append").save(dir)
    AvroMaintenance.renameColumn(spark, dir, "b", "c")
    spark.range(20, 30).selectExpr("id as k", "id as c").coalesce(1)
      .write.format("graft-avro").mode("append").save(dir)
    val back = spark.read.format("graft-avro").load(dir)
    back.schema.fieldNames.toSeq shouldBe Seq("k", "c")
    back.agg(F.sum("c")).head().getLong(0) shouldBe (0L until 30L).sum
  }

  test("verified sort claim follows the renamed column") {
    val dir = tmp()
    spark.range(100).selectExpr("id as k", "id as v")
      .coalesce(1).sortWithinPartitions("k")
      .write.format("graft-avro").option("sortedBy", "k")
      .mode("overwrite").save(dir)
    AvroMaintenance.renameColumn(spark, dir, "k", "key")
    AvroFileSource.sortedColumnOf(new java.io.File(dir)) shouldBe Some("key")
    val back = spark.read.format("graft-avro").load(dir)
    back.agg(F.min("key"), F.max("key")).head() match {
      case r => (r.getLong(0), r.getLong(1)) shouldBe (0L, 99L)
    }
  }

  test("invalid renames fail loudly") {
    val dir = tmp()
    spark.range(5).selectExpr("id as k", "id as v").coalesce(1)
      .write.format("graft-avro").mode("overwrite").save(dir)
    intercept[IllegalArgumentException] {
      AvroMaintenance.renameColumn(spark, dir, "nope", "x")
    }
    intercept[IllegalArgumentException] {
      AvroMaintenance.renameColumn(spark, dir, "v", "k")
    }
  }
}
