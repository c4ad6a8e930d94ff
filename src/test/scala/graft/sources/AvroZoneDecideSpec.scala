package graft.sources

import graft.SparkSpec
import org.apache.spark.sql.execution.FilterExec
import org.apache.spark.sql.{DataFrame, functions => F}
import org.scalatest.funsuite.AnyFunSuite
import org.scalatest.matchers.should.Matchers

/** Zone/partition-DECIDED full filter pushdown: when the column-zone
  * manifest (or hive partition values) proves every live file either
  * all-matches or none-matches a filter, the filter is accepted as
  * fully pushed — no post-scan Filter node — and a residual-free
  * filtered COUNT(*) answers from block headers alone. Soundness
  * stand-downs: nullable columns, interior (undecided) predicates,
  * missing manifests.
  */
class AvroZoneDecideSpec extends AnyFunSuite with SparkSpec with Matchers {

  private def tmp() = graft.operators.Catalog.tempDir("graft_zdecide")

  /** 4 single-file appends with disjoint k ranges: [0,99] [100,199]
    * [200,299] [300,399] — exact, deterministic per-file zone bounds.
    */
  private def rangedTable(): String = {
    val dir = tmp()
    (0 until 4).foreach { b =>
      spark.range(b * 100L, b * 100L + 100L)
        .selectExpr("id as k", "id * 2 as v").coalesce(1)
        .write.format("graft-avro")
        .mode(if (b == 0) "overwrite" else "append").save(dir)
    }
    dir
  }

  private def load(dir: String): DataFrame =
    spark.read.format("graft-avro").load(dir)

  private def filterNodes(df: DataFrame): Seq[FilterExec] =
    df.queryExecution.sparkPlan.collect { case f: FilterExec => f }

  test("boundary predicate fully pushes: no Filter node, exact rows") {
    val dir = rangedTable()
    val df = load(dir).filter("k < 200")
    filterNodes(df) shouldBe empty // every file decided -> nothing residual
    df.count() shouldBe 200
    df.agg(F.sum("k")).head().getLong(0) shouldBe (0L until 200L).sum
    // >= boundary from the other side
    val hi = load(dir).filter("k >= 300")
    filterNodes(hi) shouldBe empty
    hi.agg(F.sum("v")).head().getLong(0) shouldBe (300L until 400L).map(_ * 2).sum
    // conjunction of two decided filters
    val mid = load(dir).filter("k >= 100 AND k <= 299")
    filterNodes(mid) shouldBe empty
    mid.count() shouldBe 200
  }

  test("filtered COUNT(*) serves from block headers when decided") {
    val dir = rangedTable()
    val counted = load(dir).filter("k <= 199").agg(F.count(F.lit(1)))
    counted.queryExecution.executedPlan.toString should
      include("PushedAggregation: [COUNT(*)]")
    counted.head().getLong(0) shouldBe 200L
  }

  test("interior predicate stays residual: Filter node present, count unfused") {
    val dir = rangedTable()
    val df = load(dir).filter("k < 150") // cuts inside file [100,199]
    filterNodes(df) should not be empty
    df.count() shouldBe 150
    val counted = load(dir).filter("k < 150").agg(F.count(F.lit(1)))
    (counted.queryExecution.executedPlan.toString should not)
      .include("PushedAggregation")
    counted.head().getLong(0) shouldBe 150L
  }

  test("nullable columns never decide (null rows match no compare)") {
    val dir = tmp()
    // n is nullable WITH nulls; every non-null n < 1000, so a wrong
    // all-match claim would resurrect the null rows
    spark.range(100)
      .selectExpr("id as k", "if(id % 10 = 0, cast(null as long), id) as n")
      .coalesce(1).write.format("graft-avro").mode("overwrite").save(dir)
    val df = load(dir).filter("n < 1000")
    filterNodes(df) should not be empty
    df.count() shouldBe 90
  }

  test("missing zone manifest stands down") {
    val dir = rangedTable()
    AvroFileSource.colZoneFile(new java.io.File(dir)).delete() shouldBe true
    val df = load(dir).filter("k < 200")
    filterNodes(df) should not be empty
    df.count() shouldBe 200
  }

  test("partition values decide any predicate on the partition column") {
    val dir = tmp()
    spark.range(300)
      .selectExpr("id as k", "concat('p', cast(id % 3 as string)) as p")
      .write.format("graft-avro").option("partitionBy", "p")
      .mode("overwrite").save(dir)
    val eq = load(dir).filter("p = 'p1'")
    filterNodes(eq) shouldBe empty
    eq.count() shouldBe 100
    val in = load(dir).filter("p IN ('p0', 'p2')")
    filterNodes(in) shouldBe empty
    in.count() shouldBe 200
    val counted = load(dir).filter("p = 'p0'").agg(F.count(F.lit(1)))
    counted.queryExecution.executedPlan.toString should
      include("PushedAggregation: [COUNT(*)]")
    counted.head().getLong(0) shouldBe 100L
  }

  test("decided COUNT(*) subtracts positional deletes of KEPT files only") {
    val dir = rangedTable()
    val base = new java.io.File(dir)
    val byName = AvroFileSource.listAvro(base)
      .map(f => f -> {
        // first k in the file identifies its range bucket
        val df = spark.read.format("graft-avro").load(dir)
          .filter(F.col("_graft_file") === f.getName)
        df.agg(F.min("k")).head().getLong(0)
      }).toMap
    val kept = byName.collectFirst { case (f, mn) if mn == 0L => f }.get
    val pruned = byName.collectFirst { case (f, mn) if mn == 300L => f }.get
    AvroMaintenance.deleteAtPositions(dir, kept.getName, Seq(1L, 2L))
    AvroMaintenance.deleteAtPositions(dir, pruned.getName, Seq(5L))
    val counted = load(dir).filter("k < 200").agg(F.count(F.lit(1)))
    counted.queryExecution.executedPlan.toString should
      include("PushedAggregation: [COUNT(*)]")
    counted.head().getLong(0) shouldBe 198L // 200 - the 2 kept-file deads
    // unfiltered count still subtracts all three
    load(dir).agg(F.count(F.lit(1))).head().getLong(0) shouldBe 397L
  }

  test("equality deletes compose with decided row scans, refuse count pushdown") {
    val dir = rangedTable()
    AvroMaintenance.deleteWhere(spark, dir, "k", Seq(50L, 350L))
    val df = load(dir).filter("k < 200")
    filterNodes(df) shouldBe empty // subset of an all-match file still all-matches
    df.count() shouldBe 199
    val counted = load(dir).filter("k < 200").agg(F.count(F.lit(1)))
    (counted.queryExecution.executedPlan.toString should not)
      .include("PushedAggregation")
    counted.head().getLong(0) shouldBe 199L
  }

  test("row-level UPDATE/DELETE with a decided predicate stays group-exact") {
    // fully-pushed filters restrict a row-level op's scan to the decided
    // keep-set; pruned (none-match) files must survive untouched and
    // kept files rewrite completely — the group contract
    val root = tmp()
    spark.conf.set("spark.sql.catalog.gzd",
      classOf[GraftCatalog].getName)
    spark.conf.set("spark.sql.catalog.gzd.root", root)
    spark.sql("DROP TABLE IF EXISTS gzd.ns.t")
    spark.sql("CREATE TABLE gzd.ns.t (k BIGINT NOT NULL, v BIGINT)")
    // two disjoint-range single-file generations: [0,99], [100,199]
    spark.range(100).selectExpr("id as k", "id as v").coalesce(1)
      .writeTo("gzd.ns.t").append()
    spark.range(100, 200).selectExpr("id as k", "id as v").coalesce(1)
      .writeTo("gzd.ns.t").append()
    spark.sql("UPDATE gzd.ns.t SET v = v + 1000 WHERE k < 100")
    val after = spark.sql("SELECT k, v FROM gzd.ns.t ORDER BY k")
      .collect().map(r => (r.getLong(0), r.getLong(1)))
    after shouldBe (0L until 200L).map(k =>
      (k, if (k < 100) k + 1000 else k)).toArray
    spark.sql("DELETE FROM gzd.ns.t WHERE k >= 100 AND k <= 199")
    spark.sql("SELECT count(*) FROM gzd.ns.t").head().getLong(0) shouldBe 100
    spark.sql("SELECT sum(v) FROM gzd.ns.t").head().getLong(0) shouldBe
      (0L until 100L).map(_ + 1000).sum
  }

  test("zone-decided DELETE is metadata-only: files archive, no rewrite") {
    val root = tmp()
    spark.conf.set("spark.sql.catalog.gzdd",
      classOf[GraftCatalog].getName)
    spark.conf.set("spark.sql.catalog.gzdd.root", root)
    spark.sql("DROP TABLE IF EXISTS gzdd.ns.t")
    spark.sql("CREATE TABLE gzdd.ns.t (k BIGINT NOT NULL, v BIGINT)")
    (0 until 4).foreach { b =>
      spark.range(b * 100L, b * 100L + 100L)
        .selectExpr("id as k", "id as v").coalesce(1)
        .writeTo("gzdd.ns.t").append()
    }
    val dir = new java.io.File(root, "ns/t")
    val before = AvroFileSource.listAvro(dir)
      .map(f => f.getName -> f.lastModified()).toMap
    before should have size 4
    val verPre = AvroFileSource.readSnapshots(dir).last.version

    spark.sql("DELETE FROM gzdd.ns.t WHERE k >= 200") // decided: 2 files
    val after = AvroFileSource.listAvro(dir)
      .map(f => f.getName -> f.lastModified()).toMap
    after should have size 2
    // survivors are the SAME files, byte-untouched (no rewrite)
    after.foreach { case (n, m) => before(n) shouldBe m }
    AvroFileSource.archiveDir(dir)
      .listFiles().count(_.getName.endsWith(".avro")) shouldBe 2
    spark.sql("SELECT count(*), sum(v) FROM gzdd.ns.t").head() match {
      case r => (r.getLong(0), r.getLong(1)) shouldBe
        ((200L, (0L until 200L).sum))
    }
    // a version was minted; time travel to the pre-delete state works
    AvroFileSource.readSnapshots(dir).last.version shouldBe (verPre + 1)
    spark.read.format("graft-avro")
      .option("versionAsOf", verPre.toString).load(dir.getPath)
      .count() shouldBe 400
    // positional deletes of dropped files died with them; kept ones hold
    spark.sql("DELETE FROM gzdd.ns.t WHERE k < 100") // decided: 1 file
    spark.sql("SELECT count(*) FROM gzdd.ns.t").head().getLong(0) shouldBe 100
  }

  test("undecided DELETE predicate falls back to the group rewrite") {
    val root = tmp()
    spark.conf.set("spark.sql.catalog.gzdu",
      classOf[GraftCatalog].getName)
    spark.conf.set("spark.sql.catalog.gzdu.root", root)
    spark.sql("DROP TABLE IF EXISTS gzdu.ns.t")
    spark.sql("CREATE TABLE gzdu.ns.t (k BIGINT NOT NULL, v BIGINT)")
    (0 until 2).foreach { b =>
      spark.range(b * 100L, b * 100L + 100L)
        .selectExpr("id as k", "id as v").coalesce(1)
        .writeTo("gzdu.ns.t").append()
    }
    // 150 is interior to file [100,199]: not decidable -> rewrite path
    spark.sql("DELETE FROM gzdu.ns.t WHERE k >= 150")
    spark.sql("SELECT count(*), sum(k) FROM gzdu.ns.t").head() match {
      case r => (r.getLong(0), r.getLong(1)) shouldBe
        ((150L, (0L until 150L).sum))
    }
  }

  test("zone-decided DELETE drops posdel entries of dropped files only") {
    val root = tmp()
    spark.conf.set("spark.sql.catalog.gzdp",
      classOf[GraftCatalog].getName)
    spark.conf.set("spark.sql.catalog.gzdp.root", root)
    spark.sql("DROP TABLE IF EXISTS gzdp.ns.t")
    spark.sql("CREATE TABLE gzdp.ns.t (k BIGINT NOT NULL)")
    (0 until 2).foreach { b =>
      spark.range(b * 100L, b * 100L + 100L).selectExpr("id as k")
        .coalesce(1).writeTo("gzdp.ns.t").append()
    }
    val dir = new java.io.File(root, "ns/t")
    // identify files by their min k
    val byMin = AvroFileSource.listAvro(dir).map { f =>
      val mn = spark.read.format("graft-avro").load(dir.getPath)
        .filter(F.col("_graft_file") === f.getName)
        .agg(F.min("k")).head().getLong(0)
      mn -> f.getName
    }.toMap
    AvroMaintenance.deleteAtPositions(dir.getPath, byMin(0L), Seq(3L))
    AvroMaintenance.deleteAtPositions(dir.getPath, byMin(100L), Seq(7L))
    spark.sql("DELETE FROM gzdp.ns.t WHERE k >= 100")
    // dropped file's entry is gone, kept file's still applies
    AvroFileSource.readPosdel(dir).keySet shouldBe Set(byMin(0L))
    spark.sql("SELECT count(*) FROM gzdp.ns.t").head().getLong(0) shouldBe 99
  }

  test("metadata MIN/MAX serves under a fully-DECIDED filter (r18)") {
    // every file of the ranged table decides k >= 200, so the kept
    // files all-match and their full-file bounds ARE the matching-row
    // bounds — the fold restricts to the keep-set (AvroSumMetaSpec
    // covers the residual-filter stand-down and the SUM variants)
    val dir = rangedTable()
    val agg = load(dir).filter("k >= 200").agg(F.min("v"), F.max("v"))
    agg.queryExecution.executedPlan.toString should
      include("PushedAggregation: [MIN")
    agg.head() match {
      case r => (r.getLong(0), r.getLong(1)) shouldBe ((400L, 798L))
    }
  }
}
