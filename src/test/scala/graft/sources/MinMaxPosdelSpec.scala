package graft.sources

import graft.SparkSpec
import org.apache.spark.sql.{DataFrame, functions => F}
import org.scalatest.funsuite.AnyFunSuite
import org.scalatest.matchers.should.Matchers

/** HYBRID metadata MIN/MAX under positional deletes (verdict task 2):
  * a posdel sidecar used to stand the whole metadata-aggregate path
  * down; now a pure MIN/MAX aggregation folds manifest cells over the
  * posdel-FREE files and re-scans ONLY the posdel-bearing files as
  * real partial aggregates under the overlay — the zero-decode path
  * survives on the common mostly-clean table, and a dead row can never
  * contribute an extreme.
  */
class MinMaxPosdelSpec extends AnyFunSuite with SparkSpec with Matchers {

  private def tmp() = graft.operators.Catalog.tempDir("graft_mmposdel")

  private def plan(df: DataFrame): String =
    df.queryExecution.executedPlan.toString

  /** Two single-file generations: A = 0..99, B = 100..199, both sorted
    * so ordinals are ranks.
    */
  private def writeTwo(dir: String): String = {
    spark.range(0, 100).selectExpr("id as k",
      "concat('s', lpad(cast(id as string), 4, '0')) as s")
      .coalesce(1).sortWithinPartitions("k")
      .write.format("graft-avro").mode("overwrite").save(dir)
    spark.range(100, 200).selectExpr("id as k",
      "concat('s', lpad(cast(id as string), 4, '0')) as s")
      .coalesce(1).sortWithinPartitions("k")
      .write.format("graft-avro").mode("append").save(dir)
    val d = new java.io.File(dir)
    val base = d.getAbsoluteFile.toPath
    // the rel of generation B (holds k = 100..199: its file contains
    // the global max at ordinal 99)
    AvroFileSource.listLive(d).map(_._1)
      .map(f => base.relativize(f.getAbsoluteFile.toPath).toString)
      .find { rel =>
        spark.read.format("graft-avro").load(dir)
          .select(F.col(AvroFileSource.MetaFile).as("f"), F.col("k"))
          .filter(F.col("k") === 199L).head().getString(0) == rel
      }.get
  }

  test("dead extreme never serves: hybrid fold stays pushed and exact") {
    val dir = tmp()
    val relB = writeTwo(dir)
    // kill the global max (k=199, ordinal 99 of B) and k=150 (ordinal 50)
    AvroMaintenance.deleteAtPositions(dir, relB, Seq(99L, 50L))
    val df = spark.read.format("graft-avro").load(dir)
      .agg(F.min("k").as("mn"), F.max("k").as("mx"),
        F.min("s").as("smn"), F.max("s").as("smx"))
    plan(df) should include("PushedAggregation")
    val r = df.collect().head
    r.getLong(0) shouldBe 0L
    r.getLong(1) shouldBe 198L // NOT the dead 199 a naive cell fold serves
    r.getString(2) shouldBe "s0000"
    r.getString(3) shouldBe "s0198"
  }

  test("a fully-deleted dirty file contributes nothing") {
    val dir = tmp()
    val relB = writeTwo(dir)
    AvroMaintenance.deleteAtPositions(dir, relB, 0L until 100L)
    val df = spark.read.format("graft-avro").load(dir)
      .agg(F.min("k").as("mn"), F.max("k").as("mx"))
    plan(df) should include("PushedAggregation")
    val r = df.collect().head
    r.getLong(0) shouldBe 0L
    r.getLong(1) shouldBe 99L // the whole B generation is dead
  }

  test("every file dirty: partials alone still answer exactly") {
    val dir = tmp()
    val relB = writeTwo(dir)
    val d = new java.io.File(dir)
    val base = d.getAbsoluteFile.toPath
    val relA = AvroFileSource.listLive(d).map(_._1)
      .map(f => base.relativize(f.getAbsoluteFile.toPath).toString)
      .find(_ != relB).get
    AvroMaintenance.deleteAtPositions(dir, relA, Seq(0L)) // kills k=0
    AvroMaintenance.deleteAtPositions(dir, relB, Seq(99L)) // kills k=199
    val df = spark.read.format("graft-avro").load(dir)
      .agg(F.min("k").as("mn"), F.max("k").as("mx"))
    plan(df) should include("PushedAggregation")
    val r = df.collect().head
    r.getLong(0) shouldBe 1L
    r.getLong(1) shouldBe 198L
  }

  test("SUM/COUNT mixes under posdel still stand down (and stay exact)") {
    val dir = tmp()
    val relB = writeTwo(dir)
    AvroMaintenance.deleteAtPositions(dir, relB, Seq(99L))
    val df = spark.read.format("graft-avro").load(dir)
      .agg(F.min("k").as("mn"), F.sum("k").as("s"))
    (plan(df) should not).include("PushedAggregation")
    val r = df.collect().head
    r.getLong(0) shouldBe 0L
    r.getLong(1) shouldBe (0L until 199L).sum
  }
}
