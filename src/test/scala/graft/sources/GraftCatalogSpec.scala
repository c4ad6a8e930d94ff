package graft.sources

import graft.SparkSpec
import org.apache.spark.sql.{functions => F}
import org.scalatest.funsuite.AnyFunSuite
import org.scalatest.matchers.should.Matchers

/** The SQL surface end-to-end through [[GraftCatalog]]: namespaces, DDL,
  * CTAS, INSERT INTO, SELECT, metadata DELETE FROM, RENAME, DROP — every
  * statement through plain `spark.sql`, every table an ordinary
  * graft-avro directory underneath.
  */
class GraftCatalogSpec extends AnyFunSuite with SparkSpec with Matchers {

  private lazy val root = graft.operators.Catalog.tempDir("graft_cat_root")

  private def init(): Unit = {
    spark.conf.set("spark.sql.catalog.graft_t",
      classOf[GraftCatalog].getName)
    spark.conf.set("spark.sql.catalog.graft_t.root", root)
  }

  test("DDL + insert + select + metadata delete round trip in SQL") {
    init()
    spark.sql("CREATE NAMESPACE IF NOT EXISTS graft_t.lab")
    spark.sql("DROP TABLE IF EXISTS graft_t.lab.ev")
    spark.sql("CREATE TABLE graft_t.lab.ev (k BIGINT, v STRING)")
    spark.sql("INSERT INTO graft_t.lab.ev " +
      "SELECT id, concat('x', id) FROM range(100)")
    spark.sql("SELECT count(*) FROM graft_t.lab.ev")
      .head().getLong(0) shouldBe 100
    // metadata DELETE: equality predicates land in the sidecar
    spark.sql("DELETE FROM graft_t.lab.ev WHERE k IN (1, 5, 9)")
    AvroFileSource.deleteFile(
      new java.io.File(s"$root/lab/ev")).isFile shouldBe true
    spark.sql("SELECT count(*), sum(k) FROM graft_t.lab.ev").head() match {
      case r =>
        r.getLong(0) shouldBe 97
        r.getLong(1) shouldBe (0L until 100L).sum - 15
    }
    // non-translatable DELETE falls back to group-based copy-on-write
    // (AvroRowLevelSpec) — and stays exact
    spark.sql("DELETE FROM graft_t.lab.ev WHERE k > 50")
    spark.sql("SELECT count(*) FROM graft_t.lab.ev")
      .head().getLong(0) shouldBe 48
  }

  test("CTAS, rename, drop") {
    init()
    spark.sql("CREATE NAMESPACE IF NOT EXISTS graft_t.lab2")
    spark.sql("DROP TABLE IF EXISTS graft_t.lab2.src")
    spark.sql("DROP TABLE IF EXISTS graft_t.lab2.dst")
    spark.sql("CREATE TABLE graft_t.lab2.src AS " +
      "SELECT id AS k, id * 2 AS v FROM range(50)")
    spark.sql("SELECT sum(v) FROM graft_t.lab2.src")
      .head().getLong(0) shouldBe (0L until 50L).map(_ * 2).sum
    // the target identifier is resolved WITHIN the source's catalog
    spark.sql("ALTER TABLE graft_t.lab2.src RENAME TO lab2.dst")
    spark.sql("SHOW TABLES IN graft_t.lab2").collect()
      .map(_.getString(1)).toSeq shouldBe Seq("dst")
    spark.sql("DROP TABLE graft_t.lab2.dst")
    spark.sql("SHOW TABLES IN graft_t.lab2").count() shouldBe 0
  }

  test("partitioned DDL table writes hive dirs from its DDL spec") {
    init()
    spark.sql("CREATE NAMESPACE IF NOT EXISTS graft_t.lab3")
    spark.sql("DROP TABLE IF EXISTS graft_t.lab3.pt")
    spark.sql("CREATE TABLE graft_t.lab3.pt (k BIGINT, part STRING) " +
      "PARTITIONED BY (part)")
    spark.sql("INSERT INTO graft_t.lab3.pt " +
      "SELECT id, concat('p', id % 2) FROM range(20)")
    val dirs = new java.io.File(s"$root/lab3/pt").listFiles()
      .filter(_.isDirectory).map(_.getName).filterNot(_.startsWith("_graft"))
    dirs.sorted.toSeq shouldBe Seq("part=p0", "part=p1")
    // partition pruning straight from SQL
    spark.sql("SELECT count(*) FROM graft_t.lab3.pt WHERE part = 'p0'")
      .head().getLong(0) shouldBe 10
  }

  test("SQL time travel: VERSION AS OF, tags, and TIMESTAMP AS OF") {
    init()
    spark.sql("CREATE NAMESPACE IF NOT EXISTS graft_t.lab5")
    spark.sql("DROP TABLE IF EXISTS graft_t.lab5.tt")
    spark.sql("CREATE TABLE graft_t.lab5.tt AS SELECT id AS k FROM range(10)")
    val dir = s"$root/lab5/tt"
    AvroMaintenance.tag(dir, "first", 1L)
    spark.sql("INSERT INTO graft_t.lab5.tt SELECT id FROM range(10, 30)")
    spark.sql("SELECT count(*) FROM graft_t.lab5.tt").head().getLong(0) shouldBe 30
    spark.sql("SELECT count(*) FROM graft_t.lab5.tt VERSION AS OF 1")
      .head().getLong(0) shouldBe 10
    spark.sql("SELECT count(*) FROM graft_t.lab5.tt VERSION AS OF 'first'")
      .head().getLong(0) shouldBe 10
    // a timestamp far in the future resolves to the latest version
    spark.sql("SELECT count(*) FROM graft_t.lab5.tt " +
      "TIMESTAMP AS OF '2099-01-01'").head().getLong(0) shouldBe 30
    // travel tables are read-only
    intercept[Exception] {
      spark.sql("INSERT INTO graft_t.lab5.tt VERSION AS OF 1 VALUES (99)")
    }
  }

  test("TRUNCATE TABLE is versioned: current empty, history intact") {
    init()
    spark.sql("CREATE NAMESPACE IF NOT EXISTS graft_t.lab6")
    spark.sql("DROP TABLE IF EXISTS graft_t.lab6.tr")
    spark.sql("CREATE TABLE graft_t.lab6.tr AS SELECT id AS k FROM range(25)")
    spark.sql("TRUNCATE TABLE graft_t.lab6.tr")
    spark.sql("SELECT count(*) FROM graft_t.lab6.tr").head().getLong(0) shouldBe 0
    // the pre-truncate snapshot still reads in full
    spark.sql("SELECT count(*) FROM graft_t.lab6.tr VERSION AS OF 1")
      .head().getLong(0) shouldBe 25
    // and the table accepts new data afterwards
    spark.sql("INSERT INTO graft_t.lab6.tr SELECT id FROM range(5)")
    spark.sql("SELECT count(*) FROM graft_t.lab6.tr").head().getLong(0) shouldBe 5
  }

  test("empty created table reads as empty with its DDL schema") {
    init()
    spark.sql("CREATE NAMESPACE IF NOT EXISTS graft_t.lab4")
    spark.sql("DROP TABLE IF EXISTS graft_t.lab4.e")
    spark.sql("CREATE TABLE graft_t.lab4.e (a INT, b STRING)")
    val df = spark.sql("SELECT * FROM graft_t.lab4.e")
    df.schema.fieldNames.toSeq shouldBe Seq("a", "b")
    df.count() shouldBe 0
  }

  test("ALTER TABLE ADD/RENAME/DROP COLUMN on a data-backed table") {
    init()
    spark.sql("CREATE NAMESPACE IF NOT EXISTS graft_t.lab7")
    spark.sql("DROP TABLE IF EXISTS graft_t.lab7.ev")
    spark.sql("CREATE TABLE graft_t.lab7.ev AS " +
      "SELECT id AS k, id * 2 AS v, CAST(id % 3 AS INT) AS m FROM range(10)")
    // ADD: pre-ALTER rows read null, post-ALTER inserts carry values
    spark.sql("ALTER TABLE graft_t.lab7.ev ADD COLUMN bonus BIGINT")
    spark.sql("INSERT INTO graft_t.lab7.ev " +
      "SELECT id, id * 2, CAST(id % 3 AS INT), id * 100 FROM range(10, 15)")
    spark.sql("SELECT count(*) FROM graft_t.lab7.ev WHERE bonus IS NULL")
      .head().getLong(0) shouldBe 10
    spark.sql("SELECT sum(bonus) FROM graft_t.lab7.ev")
      .head().getLong(0) shouldBe (10L until 15L).map(_ * 100).sum
    // RENAME: pre-rename files decode through the alias
    spark.sql("ALTER TABLE graft_t.lab7.ev RENAME COLUMN v TO twice")
    spark.sql("SELECT sum(twice) FROM graft_t.lab7.ev")
      .head().getLong(0) shouldBe (0L until 15L).map(_ * 2).sum
    // DROP: hidden live, name retired
    spark.sql("ALTER TABLE graft_t.lab7.ev DROP COLUMN m")
    spark.sql("SELECT * FROM graft_t.lab7.ev").schema.fieldNames.toSeq shouldBe
      Seq("k", "twice", "bonus")
    intercept[Exception] {
      spark.sql("ALTER TABLE graft_t.lab7.ev ADD COLUMN m INT")
    }
    // pre-drop history still serves the column (the ALTER minted v-1)
    val evoV = AvroFileSource
      .readSnapshots(new java.io.File(s"$root/lab7/ev")).last.version
    spark.sql(s"SELECT sum(m) FROM graft_t.lab7.ev VERSION AS OF ${evoV - 1}")
      .head().getLong(0) shouldBe (0L until 15L).map(_ % 3).sum
  }

  test("ALTER TABLE on an empty DDL table rewrites the schema sidecar") {
    init()
    spark.sql("CREATE NAMESPACE IF NOT EXISTS graft_t.lab8")
    spark.sql("DROP TABLE IF EXISTS graft_t.lab8.e")
    spark.sql("CREATE TABLE graft_t.lab8.e (a INT, b STRING)")
    spark.sql("ALTER TABLE graft_t.lab8.e ADD COLUMN c BIGINT")
    spark.sql("ALTER TABLE graft_t.lab8.e RENAME COLUMN b TO label")
    spark.sql("ALTER TABLE graft_t.lab8.e DROP COLUMN a")
    spark.sql("SELECT * FROM graft_t.lab8.e").schema.fieldNames.toSeq shouldBe
      Seq("label", "c")
    // the evolved DDL schema governs the first insert
    spark.sql("INSERT INTO graft_t.lab8.e VALUES ('x', 7)")
    spark.sql("SELECT label, c FROM graft_t.lab8.e").head() match {
      case r => r.getString(0) shouldBe "x"; r.getLong(1) shouldBe 7L
    }
  }

  test("CALL procedures: rollback, tags, constraints, expiry through SQL") {
    init()
    spark.sql("CREATE NAMESPACE IF NOT EXISTS graft_t.lab10")
    spark.sql("DROP TABLE IF EXISTS graft_t.lab10.pr")
    spark.sql("CREATE TABLE graft_t.lab10.pr AS " +
      "SELECT id AS k FROM range(10)")                               // v1
    spark.sql("INSERT INTO graft_t.lab10.pr SELECT id FROM range(10, 30)") // v2
    val r = spark
      .sql("CALL graft_t.system.rollback_to_version('lab10.pr', 1)").head()
    r.getLong(0) shouldBe 1L  // restored_version
    r.getLong(1) shouldBe 3L  // current_version (history append-only)
    spark.sql("SELECT count(*) FROM graft_t.lab10.pr")
      .head().getLong(0) shouldBe 10
    // tag the pre-rollback state and travel to it by name
    spark.sql("CALL graft_t.system.create_tag('lab10.pr', 'fat', 2)")
    spark.sql("SELECT count(*) FROM graft_t.lab10.pr VERSION AS OF 'fat'")
      .head().getLong(0) shouldBe 30
    // constraint lifecycle through CALL
    spark.sql("CALL graft_t.system.add_constraint('lab10.pr', 'pos', 'k >= 0')")
    intercept[Exception] {
      spark.sql("INSERT INTO graft_t.lab10.pr VALUES (-1)")
    }
    spark.sql("SELECT count(*) FROM graft_t.lab10.pr")
      .head().getLong(0) shouldBe 10
    spark.sql("CALL graft_t.system.drop_constraint('lab10.pr', 'pos')")
    spark.sql("INSERT INTO graft_t.lab10.pr VALUES (-1)")
    spark.sql("SELECT count(*) FROM graft_t.lab10.pr")
      .head().getLong(0) shouldBe 11
    // vacuum: tagged v2 must survive an aggressive keep_last=1
    spark.sql("CALL graft_t.system.drop_tag('lab10.pr', 'fat')")
    spark.sql("CALL graft_t.system.expire_snapshots('lab10.pr', 1)")
      .head().getLong(0) should be >= 0L
    // error contracts: unknown procedure, unknown table
    intercept[Exception] {
      spark.sql("CALL graft_t.system.nope('lab10.pr')")
    }
    intercept[Exception] {
      spark.sql("CALL graft_t.system.create_tag('lab10.ghost', 't', 1)")
    }
  }

  test("ALTER TABLE guards: NOT NULL add, positioned add, nested names") {
    init()
    spark.sql("CREATE NAMESPACE IF NOT EXISTS graft_t.lab9")
    spark.sql("DROP TABLE IF EXISTS graft_t.lab9.g")
    spark.sql("CREATE TABLE graft_t.lab9.g AS SELECT id AS k FROM range(5)")
    intercept[Exception] {
      spark.sql("ALTER TABLE graft_t.lab9.g ADD COLUMN nn BIGINT NOT NULL")
    }
    intercept[Exception] {
      spark.sql("ALTER TABLE graft_t.lab9.g ADD COLUMN f BIGINT FIRST")
    }
  }
}
