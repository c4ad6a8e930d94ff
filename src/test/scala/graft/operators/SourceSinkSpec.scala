package graft.operators

import java.nio.file.Files

import org.apache.spark.sql.{functions => F}
import org.apache.spark.sql.execution.FileSourceScanExec
import org.scalatest.matchers.should.Matchers
import org.scalatest.wordspec.AnyWordSpec

import graft.SparkSpec

/** Source/sink surface: csv + json round trips, and the partition-pruning
  * contract for partitioned parquet — at 100 TB, a date-partitioned layout
  * plus a partition filter is the difference between reading one day and
  * reading the lake.
  */
class SourceSinkSpec extends AnyWordSpec with Matchers with SparkSpec {

  "file sources" should {
    "round-trip csv and json with schemas" in {
      import spark.implicits._
      val dir = graft.operators.Catalog.tempDir("graft_src")
      val df = Seq((1L, "a", 1.5), (2L, "b", -2.0)).toDF("id", "name", "v")

      df.write.mode("overwrite").option("header", "true").csv(s"$dir/csv")
      val csv = spark.read.option("header", "true")
        .schema(df.schema).csv(s"$dir/csv")
      csv.orderBy("id").collect() shouldBe df.orderBy("id").collect()

      df.write.mode("overwrite").json(s"$dir/json")
      val json = spark.read.schema(df.schema).json(s"$dir/json")
      json.orderBy("id").collect() shouldBe df.orderBy("id").collect()
    }

    "prune partitions on a partitioned parquet layout" in {
      import spark.implicits._
      val dir = graft.operators.Catalog.tempDir("graft_part")
      val df = (0 until 1000)
        .map(i => (i.toLong, s"2024-01-${"%02d".format(i % 10 + 1)}", i * 1.0))
        .toDF("id", "day", "v")
      df.write.mode("overwrite").partitionBy("day").parquet(dir)

      val read = spark.read.parquet(dir).filter(F.col("day") === "2024-01-03")
      read.count() shouldBe 100

      // the scan must carry the partition filter and touch 1 of 10 dirs
      val scan = read.queryExecution.executedPlan.collect {
        case s: FileSourceScanExec => s
      }.head
      scan.partitionFilters.map(_.toString).mkString should include("day")
      scan.relation.location.listFiles(scan.partitionFilters, Nil)
        .map(_.files.size).sum shouldBe
        scan.relation.location.listFiles(Nil, Nil)
          .map(_.files.size).sum / 10
    }
  }
}
