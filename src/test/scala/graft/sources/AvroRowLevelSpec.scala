package graft.sources

import graft.SparkSpec
import org.apache.spark.sql.{functions => F}
import org.scalatest.funsuite.AnyFunSuite
import org.scalatest.matchers.should.Matchers

/** Group-based copy-on-write row-level SQL: UPDATE, MERGE INTO, and
  * non-equality DELETE rewrite ONLY the files containing matches (the
  * dynamic `_graft_file` group filter), archive them, and publish the
  * rewrites as one snapshot — untouched files keep their bytes.
  */
class AvroRowLevelSpec extends AnyFunSuite with SparkSpec with Matchers {

  private lazy val root = graft.operators.Catalog.tempDir("graft_rl_root")

  private def init(): Unit = {
    spark.conf.set("spark.sql.catalog.graft_rl",
      classOf[GraftCatalog].getName)
    spark.conf.set("spark.sql.catalog.graft_rl.root", root)
    spark.sql("CREATE NAMESPACE IF NOT EXISTS graft_rl.lab")
  }

  private def fileSet(dir: String): Set[String] =
    AvroFileSource.listAvro(new java.io.File(dir)).map(_.getName).toSet

  test("UPDATE rewrites only the matching file; others keep their bytes") {
    init()
    spark.sql("DROP TABLE IF EXISTS graft_rl.lab.u")
    spark.sql("CREATE TABLE graft_rl.lab.u (k BIGINT, v BIGINT)")
    // two files with disjoint key ranges
    spark.range(0, 50).selectExpr("id as k", "id as v").coalesce(1)
      .write.format("graft-avro").mode("append").save(s"$root/lab/u")
    spark.range(50, 100).selectExpr("id as k", "id as v").coalesce(1)
      .write.format("graft-avro").mode("append").save(s"$root/lab/u")
    val before = fileSet(s"$root/lab/u")
    before.size shouldBe 2

    spark.sql("UPDATE graft_rl.lab.u SET v = v * 10 WHERE k < 10")
    val after = fileSet(s"$root/lab/u")
    // the k>=50 file survived untouched; the k<50 file was replaced
    (before intersect after).size shouldBe 1
    val t = spark.sql("SELECT * FROM graft_rl.lab.u")
    t.count() shouldBe 100
    t.filter(F.col("k") < 10).agg(F.sum("v")).head().getLong(0) shouldBe
      (0L until 10L).map(_ * 10).sum
    t.filter(F.col("k") >= 10).agg(F.sum("v")).head().getLong(0) shouldBe
      (10L until 100L).sum
  }

  test("non-equality DELETE falls back to copy-on-write and is exact") {
    init()
    spark.sql("DROP TABLE IF EXISTS graft_rl.lab.d")
    spark.sql("CREATE TABLE graft_rl.lab.d AS " +
      "SELECT id AS k, id * 2 AS v FROM range(100)")
    spark.sql("DELETE FROM graft_rl.lab.d WHERE k >= 90")
    val t = spark.sql("SELECT count(*) c, sum(k) s FROM graft_rl.lab.d").head()
    t.getLong(0) shouldBe 90
    t.getLong(1) shouldBe (0L until 90L).sum
  }

  test("MERGE INTO updates matches and inserts the rest") {
    init()
    spark.sql("DROP TABLE IF EXISTS graft_rl.lab.m")
    spark.sql("CREATE TABLE graft_rl.lab.m AS " +
      "SELECT id AS k, CAST(0 AS BIGINT) AS v FROM range(10)")
    spark.range(5, 15).selectExpr("id as k", "id * 100 as v")
      .createOrReplaceTempView("m_updates")
    spark.sql("""MERGE INTO graft_rl.lab.m t USING m_updates s ON t.k = s.k
                |WHEN MATCHED THEN UPDATE SET v = s.v
                |WHEN NOT MATCHED THEN INSERT (k, v) VALUES (s.k, s.v)
                |""".stripMargin)
    val rows = spark.sql("SELECT k, v FROM graft_rl.lab.m ORDER BY k")
      .collect().map(r => (r.getLong(0), r.getLong(1)))
    rows.length shouldBe 15
    rows.take(5).map(_._2).toSeq shouldBe Seq(0L, 0L, 0L, 0L, 0L)
    rows.drop(5).map(_._2).toSeq shouldBe (5L until 15L).map(_ * 100)
  }

  test("row-level history is versioned: pre-UPDATE snapshot reads intact") {
    init()
    spark.sql("DROP TABLE IF EXISTS graft_rl.lab.h")
    spark.sql("CREATE TABLE graft_rl.lab.h AS " +
      "SELECT id AS k, id AS v FROM range(20)")
    spark.sql("UPDATE graft_rl.lab.h SET v = -1 WHERE k % 2 = 0")
    spark.sql("SELECT sum(v) FROM graft_rl.lab.h VERSION AS OF 1")
      .head().getLong(0) shouldBe (0L until 20L).sum
    spark.sql("SELECT sum(v) FROM graft_rl.lab.h").head().getLong(0) shouldBe
      (0L until 20L).filter(_ % 2 == 1).sum - 10
  }
}
