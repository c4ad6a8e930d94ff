package graft.sources

import graft.SparkSpec
import org.apache.spark.sql.{DataFrame, functions => F}
import org.scalatest.funsuite.AnyFunSuite
import org.scalatest.matchers.should.Matchers

/** CDC changes read (AvroMaintenance.changes): the net row-level diff
  * between two snapshot versions as insert/delete-tagged rows, served
  * from exactly the delta files via the versionAsOf machinery. Guards:
  * changed equality deletes and pending positional deletes refuse
  * loudly; an intra-range append+overwrite nets out to nothing.
  */
class AvroChangesSpec extends AnyFunSuite with SparkSpec with Matchers {

  private def tmp() = graft.operators.Catalog.tempDir("graft_cdc")

  private def byType(df: DataFrame): Map[String, Set[Long]] =
    df.collect()
      .groupBy(_.getAs[String]("_change_type"))
      .map { case (t, rows) => t -> rows.map(_.getAs[Long]("k")).toSet }

  test("append-only range yields inserts only") {
    val dir = tmp()
    spark.range(10).selectExpr("id as k")
      .write.format("graft-avro").mode("overwrite").save(dir) // v1
    spark.range(10, 15).selectExpr("id as k")
      .write.format("graft-avro").mode("append").save(dir) // v2
    val got = byType(AvroMaintenance.changes(spark, dir, 1, 2))
    got shouldBe Map("insert" -> (10L until 15L).toSet)
  }

  test("overwrite surfaces deletes; intra-range churn nets out") {
    val dir = tmp()
    spark.range(10).selectExpr("id as k")
      .write.format("graft-avro").mode("overwrite").save(dir) // v1: A
    spark.range(10, 15).selectExpr("id as k")
      .write.format("graft-avro").mode("append").save(dir) // v2: +B
    spark.range(100, 103).selectExpr("id as k")
      .write.format("graft-avro").mode("overwrite").save(dir) // v3: C
    // net diff v1 -> v3: B appeared AND vanished inside the range
    byType(AvroMaintenance.changes(spark, dir, 1, 3)) shouldBe Map(
      "insert" -> (100L until 103L).toSet,
      "delete" -> (0L until 10L).toSet)
    byType(AvroMaintenance.changes(spark, dir, 2, 3)) shouldBe Map(
      "insert" -> (100L until 103L).toSet,
      "delete" -> (0L until 15L).toSet)
    // from the beginning: everything at v3 is an insert
    byType(AvroMaintenance.changes(spark, dir, 0, 3)) shouldBe Map(
      "insert" -> (100L until 103L).toSet)
  }

  test("equality-delete deltas emit the newly-hidden rows as deletes") {
    val dir = tmp()
    spark.range(10).selectExpr("id as k", "cast(id as string) as s")
      .write.format("graft-avro").mode("overwrite").save(dir) // v1
    AvroMaintenance.deleteWhere(spark, dir, "k", Seq(3L, 7L)) // v2: deletes
    byType(AvroMaintenance.changes(spark, dir, 1, 2)) shouldBe Map(
      "delete" -> Set(3L, 7L))
    // after the delete, an append carries the SAME sidecar: the range
    // v2 -> v3 is insert-only, and the snapshot's deletes apply to the
    // insert side (k=3 was in v1's files, not the delta — irrelevant)
    spark.range(20, 23).selectExpr("id as k", "cast(id as string) as s")
      .write.format("graft-avro").mode("append").save(dir) // v3
    byType(AvroMaintenance.changes(spark, dir, 2, 3)) shouldBe Map(
      "insert" -> (20L until 23L).toSet)
    // spanning both: the net diff carries the v2 deletes AND v3 inserts
    byType(AvroMaintenance.changes(spark, dir, 1, 3)) shouldBe Map(
      "delete" -> Set(3L, 7L), "insert" -> (20L until 23L).toSet)
    // stamp gating: re-insert k=3 (born after the stamp), then delete
    // k=0 — the range (3, 5] must emit ONLY k=0 as a delete (the new
    // k=3 row survives its older entry) and k=3 as the insert
    spark.range(3, 4).selectExpr("id as k", "cast(id as string) as s")
      .write.format("graft-avro").mode("append").save(dir) // v4
    AvroMaintenance.deleteWhere(spark, dir, "k", Seq(0L)) // v5
    byType(AvroMaintenance.changes(spark, dir, 3, 5)) shouldBe Map(
      "insert" -> Set(3L), "delete" -> Set(0L))
  }

  test("rollback across a deleteWhere re-surfaces rows as inserts") {
    val dir = tmp()
    spark.range(5).selectExpr("id as k")
      .write.format("graft-avro").mode("overwrite").save(dir) // v1
    AvroMaintenance.deleteWhere(spark, dir, "k", Seq(2L)) // v2
    AvroMaintenance.rollbackTo(dir, 1L) // v3: entry disappears
    byType(AvroMaintenance.changes(spark, dir, 2, 3)) shouldBe Map(
      "insert" -> Set(2L))
    // net across the whole arc: nothing changed
    AvroMaintenance.changes(spark, dir, 1, 3).collect() shouldBe empty
  }

  test("positional deletes emit as row-level delete deltas") {
    val dir = tmp()
    spark.range(10).selectExpr("id as k")
      .coalesce(1)
      .write.format("graft-avro").mode("overwrite").save(dir) // v1
    val rel = AvroFileSource.listLive(new java.io.File(dir)).head._1
    val relName = new java.io.File(dir).getAbsoluteFile.toPath
      .relativize(rel.getAbsoluteFile.toPath).toString
    AvroMaintenance.deleteAtPositions(dir, relName, Seq(0L, 7L)) // v2
    byType(AvroMaintenance.changes(spark, dir, 1, 2)) shouldBe Map(
      "delete" -> Set(0L, 7L))
    // net from the beginning: position-deleted rows never insert
    byType(AvroMaintenance.changes(spark, dir, 0, 2)) shouldBe Map(
      "insert" -> ((0L until 10L).toSet -- Set(0L, 7L)))
    // second posdel batch: only the NEW positions emit for (2, 3]
    AvroMaintenance.deleteAtPositions(dir, relName, Seq(3L)) // v3
    byType(AvroMaintenance.changes(spark, dir, 2, 3)) shouldBe Map(
      "delete" -> Set(3L))
    // a LEGACY (unjournaled) overlay still refuses loudly
    AvroFileSource.writePosdelSidecar(new java.io.File(dir),
      AvroFileSource.readPosdel(new java.io.File(dir)) +
        (relName -> Array(0L, 3L, 5L, 7L)))
    val ex = intercept[IllegalArgumentException] {
      AvroMaintenance.changes(spark, dir, 1, 2)
    }
    ex.getMessage should include("unjournaled")
  }

  test("compaction surfaces as equal-row delete+insert pairs") {
    val dir = tmp()
    spark.range(10).selectExpr("id as k").repartition(4)
      .write.format("graft-avro").mode("overwrite").save(dir) // v1
    AvroMaintenance.compactInPlace(spark, dir, 512L * 1024 * 1024) // v2
    val got = byType(AvroMaintenance.changes(spark, dir, 1, 2))
    got("insert") shouldBe (0L until 10L).toSet
    got("delete") shouldBe (0L until 10L).toSet
  }

  test("delete side null-fills columns added inside the range") {
    val dir = tmp()
    spark.range(5).selectExpr("id as k")
      .write.format("graft-avro").mode("overwrite").save(dir) // v1
    spark.range(50, 53).selectExpr("id as k", "id * 2 as extra")
      .write.format("graft-avro").mode("overwrite").save(dir) // v2
    val ch = AvroMaintenance.changes(spark, dir, 1, 2)
    ch.columns.toSeq shouldBe Seq("k", "extra", "_change_type")
    val rows = ch.collect().map(r => (r.getAs[String]("_change_type"),
      r.getAs[Long]("k"), Option(r.get(r.fieldIndex("extra"))))).toSet
    rows.filter(_._1 == "delete").foreach(_._3 shouldBe None)
    rows.filter(_._1 == "insert")
      .map(t => t._2 -> t._3) shouldBe
      (50L until 53L).map(k => k -> Some(k * 2)).toSet
  }

  test("deleteWhere on a column ADDED inside the range: delete side empty") {
    // the gained entry parses against the TO schema (where the delete
    // was issued); visible-at-from rows null-default the added column,
    // so the entry matches nothing on the delete side — the changeset
    // must be the appended rows minus the deleted one, never a parse
    // failure on the from-schema
    val dir = tmp()
    spark.range(5).selectExpr("id as k")
      .write.format("graft-avro").mode("overwrite").save(dir) // v1
    AvroMaintenance.addColumn(dir, org.apache.spark.sql.types
      .StructField("extra", org.apache.spark.sql.types.LongType)) // v2
    spark.range(50, 53).selectExpr("id as k", "id * 2 as extra")
      .write.format("graft-avro").mode("append").save(dir) // v3
    AvroMaintenance.deleteWhere(spark, dir, "extra", Seq(100L)) // v4
    val got = byType(AvroMaintenance.changes(spark, dir, 1, 4))
    got shouldBe Map("insert" -> Set(51L, 52L))
  }

  test("bad versions and unjournaled dirs refuse") {
    val dir = tmp()
    spark.range(3).selectExpr("id as k")
      .write.format("graft-avro").mode("overwrite").save(dir)
    intercept[IllegalArgumentException] {
      AvroMaintenance.changes(spark, dir, 1, 1)
    }
    intercept[IllegalArgumentException] {
      AvroMaintenance.changes(spark, dir, 0, 99)
    }
  }
}
