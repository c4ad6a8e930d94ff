package graft.sources

import graft.SparkSpec
import org.apache.spark.sql.{functions => F}
import org.scalatest.funsuite.AnyFunSuite
import org.scalatest.matchers.should.Matchers

/** Merge-on-read row-level ops (SupportsDelta): with the
  * `_graft_rowlevel` sidecar set to `merge-on-read`, SQL DELETE turns
  * matched rows into `_graft_posdel` positions (data files
  * byte-untouched) and UPDATE/MERGE pair those position deletes with
  * plain appended files — O(changed rows), not O(rewritten files).
  * Metadata DELETE paths (equality sidecar, zone-decided file drop)
  * still win in either mode; `copy-on-write` (default) keeps the group
  * rewrite.
  */
class AvroMorDeltaSpec extends AnyFunSuite with SparkSpec with Matchers {

  private def freshTable(cat: String): java.io.File = {
    val root = graft.operators.Catalog.tempDir(s"graft_mor_$cat")
    spark.conf.set(s"spark.sql.catalog.$cat",
      classOf[GraftCatalog].getName)
    spark.conf.set(s"spark.sql.catalog.$cat.root", root)
    spark.sql(s"DROP TABLE IF EXISTS $cat.ns.t")
    spark.sql(s"CREATE TABLE $cat.ns.t (k BIGINT NOT NULL, v BIGINT)")
    (0 until 2).foreach { b =>
      spark.range(b * 100L, b * 100L + 100L)
        .selectExpr("id as k", "id as v").coalesce(1)
        .writeTo(s"$cat.ns.t").append()
    }
    spark.sql(s"CALL $cat.system.set_row_level_mode('ns.t', " +
      "'merge-on-read')")
    new java.io.File(root, "ns/t")
  }

  private def dataFiles(dir: java.io.File): Map[String, Long] =
    AvroFileSource.listAvro(dir).map(f => f.getName -> f.length()).toMap

  test("MoR DELETE writes positions, leaves every data file untouched") {
    val dir = freshTable("mord")
    val before = dataFiles(dir)
    before should have size 2
    // k % 7 = 3: not equality-translatable, not zone-decidable
    spark.sql("DELETE FROM mord.ns.t WHERE k % 7 = 3")
    dataFiles(dir) shouldBe before // same names, same bytes
    val pd = AvroFileSource.readPosdel(dir)
    pd.values.map(_.length).sum shouldBe (0 until 200).count(_ % 7 == 3)
    spark.sql("SELECT count(*) AS n, sum(v) AS s FROM mord.ns.t")
      .head() match {
      case r =>
        val kept = (0 until 200).filterNot(_ % 7 == 3)
        (r.getLong(0), r.getLong(1)) shouldBe
          ((kept.size.toLong, kept.map(_.toLong).sum))
    }
    // a second MoR delete merges into the same sidecar
    spark.sql("DELETE FROM mord.ns.t WHERE k % 7 = 5")
    dataFiles(dir) shouldBe before
    spark.sql("SELECT count(*) FROM mord.ns.t").head().getLong(0) shouldBe
      (0 until 200).count(k => k % 7 != 3 && k % 7 != 5).toLong
  }

  test("MoR UPDATE = position deletes + appended replacement rows") {
    val dir = freshTable("moru")
    val before = dataFiles(dir)
    val verPre = AvroFileSource.readSnapshots(dir).last.version
    spark.sql("UPDATE moru.ns.t SET v = v + 1000 WHERE k % 10 = 0")
    val after = dataFiles(dir)
    // originals byte-untouched, replacement file(s) appended
    before.foreach { case (n, len) => after(n) shouldBe len }
    after.size should be > before.size
    AvroFileSource.readPosdel(dir).values.map(_.length).sum shouldBe 20
    AvroFileSource.readSnapshots(dir).last.version shouldBe (verPre + 1)
    val got = spark.sql("SELECT k, v FROM moru.ns.t").collect()
      .map(r => r.getLong(0) -> r.getLong(1)).toMap
    got should have size 200
    (0 until 200).foreach { k =>
      got(k.toLong) shouldBe (if (k % 10 == 0) k + 1000L else k.toLong)
    }
  }

  test("MoR MERGE INTO: matched updates and unmatched inserts") {
    val dir = freshTable("morm")
    spark.range(190L, 210L).selectExpr("id as k", "id * 100 as v")
      .createOrReplaceTempView("mor_src")
    spark.sql("""MERGE INTO morm.ns.t t USING mor_src s ON t.k = s.k
                |WHEN MATCHED THEN UPDATE SET v = s.v
                |WHEN NOT MATCHED THEN INSERT (k, v) VALUES (s.k, s.v)
                |""".stripMargin)
    val got = spark.sql("SELECT k, v FROM morm.ns.t").collect()
      .map(r => r.getLong(0) -> r.getLong(1)).toMap
    got should have size 210
    (0 until 210).foreach { k =>
      got(k.toLong) shouldBe (if (k >= 190) k * 100L else k.toLong)
    }
    // matched rows (190..199) died positionally; nothing rewrote files
    AvroFileSource.readPosdel(dir).values.map(_.length).sum shouldBe 10
  }

  test("equality DELETE still takes the metadata sidecar path under MoR") {
    val dir = freshTable("more")
    val before = dataFiles(dir)
    spark.sql("DELETE FROM more.ns.t WHERE k = 42")
    dataFiles(dir) shouldBe before
    AvroFileSource.readPosdel(dir) shouldBe empty // NOT positional
    AvroFileSource.deleteFile(dir).isFile shouldBe true
    spark.sql("SELECT count(*) FROM more.ns.t").head().getLong(0) shouldBe 199
  }

  test("mode round-trips: copy-on-write restores the group rewrite") {
    val dir = freshTable("morc")
    spark.sql("CALL morc.system.set_row_level_mode('ns.t', " +
      "'copy-on-write')")
    AvroFileSource.rowLevelMode(dir) shouldBe AvroFileSource.CopyOnWrite
    val before = dataFiles(dir)
    spark.sql("UPDATE morc.ns.t SET v = v + 1 WHERE k % 10 = 0")
    // group rewrite: both files replaced, no positional sidecar
    AvroFileSource.readPosdel(dir) shouldBe empty
    dataFiles(dir).keySet.intersect(before.keySet) shouldBe empty
    spark.sql("SELECT sum(v) FROM morc.ns.t").head().getLong(0) shouldBe
      ((0 until 200).map(_.toLong).sum + 20)
    an[IllegalArgumentException] should be thrownBy
      AvroMaintenance.setRowLevelMode(dir.getPath, "read-on-merge")
  }

  test("CHECK constraints veto MoR update inserts, nothing published") {
    val dir = freshTable("morx")
    spark.sql("CALL morx.system.add_constraint('ns.t', 'v_cap', " +
      "'v < 500')")
    val before = dataFiles(dir)
    intercept[Exception] {
      spark.sql("UPDATE morx.ns.t SET v = v + 1000 WHERE k % 10 = 0")
    }
    dataFiles(dir) shouldBe before
    AvroFileSource.readPosdel(dir) shouldBe empty
    spark.sql("SELECT sum(v) FROM morx.ns.t").head().getLong(0) shouldBe
      (0 until 200).map(_.toLong).sum
  }

  test("MoR deletes compose with filters, splits, and compaction") {
    val dir = freshTable("morf")
    spark.sql("DELETE FROM morf.ns.t WHERE k % 3 = 1")
    // filtered scan over posdel-bearing files
    val kept = (0 until 200).filterNot(_ % 3 == 1)
    spark.sql("SELECT count(*) FROM morf.ns.t WHERE k >= 100").head()
      .getLong(0) shouldBe kept.count(_ >= 100).toLong
    // COUNT(*) pushdown stays correct (posdel adjust partition)
    spark.sql("SELECT count(*) FROM morf.ns.t").head()
      .getLong(0) shouldBe kept.size.toLong
    // compaction materializes the deletes and clears the sidecar
    AvroMaintenance.compactInPlace(spark, dir.getPath, 64L * 1024 * 1024)
    AvroFileSource.readPosdel(dir) shouldBe empty
    spark.sql("SELECT count(*), sum(v) FROM morf.ns.t").head() match {
      case r => (r.getLong(0), r.getLong(1)) shouldBe
        ((kept.size.toLong, kept.map(_.toLong).sum))
    }
  }
}
