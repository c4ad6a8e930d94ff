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
    // time-based retention through CALL: a far-future cutoff expires
    // everything but the current version
    spark.sql("CALL graft_t.system.expire_snapshots_older_than(" +
      s"'lab10.pr', ${System.currentTimeMillis() + 3600L * 1000})")
      .head().getLong(0) should be >= 0L
    AvroFileSource.readSnapshots(
      new java.io.File(root, "lab10/pr")).size shouldBe 1
    spark.sql("SELECT count(*) FROM graft_t.lab10.pr")
      .head().getLong(0) shouldBe 11
    // error contracts: unknown procedure, unknown table
    intercept[Exception] {
      spark.sql("CALL graft_t.system.nope('lab10.pr')")
    }
    intercept[Exception] {
      spark.sql("CALL graft_t.system.create_tag('lab10.ghost', 't', 1)")
    }
  }

  test("SQL metadata tables: history, files, refs, constraints suffixes") {
    init()
    spark.sql("CREATE NAMESPACE IF NOT EXISTS graft_t.lab11")
    spark.sql("DROP TABLE IF EXISTS graft_t.lab11.mt")
    spark.sql("CREATE TABLE graft_t.lab11.mt AS SELECT id AS k FROM range(10)")
    spark.sql("INSERT INTO graft_t.lab11.mt SELECT id FROM range(10, 20)")
    spark.sql("DELETE FROM graft_t.lab11.mt WHERE k IN (1)")
    spark.sql("CALL graft_t.system.create_tag('lab11.mt', 'v1', 1)")
    spark.sql("CALL graft_t.system.add_constraint('lab11.mt', 'pos', 'k >= 0')")

    val hist = spark.sql("SELECT version, kind, has_deletes " +
      "FROM graft_t.lab11.mt.history ORDER BY version").collect()
    hist.map(_.getLong(0)).toSeq shouldBe Seq(1L, 2L, 3L)
    hist.map(_.getString(1)).toSeq shouldBe Seq("append", "append", "delete")
    hist.map(_.getBoolean(2)).toSeq shouldBe Seq(false, false, true)

    val nFiles = spark.sql("SELECT count(*), sum(bytes) " +
      "FROM graft_t.lab11.mt.files").head()
    nFiles.getLong(0) should be >= 1L
    nFiles.getLong(1) should be > 0L

    spark.sql("SELECT name, version FROM graft_t.lab11.mt.refs").collect()
      .map(r => (r.getString(0), r.getLong(1))).toSeq shouldBe
      Seq(("v1", 1L))
    spark.sql("SELECT name, expr FROM graft_t.lab11.mt.constraints")
      .collect().map(r => (r.getString(0), r.getString(1))).toSeq shouldBe
      Seq(("pos", "k >= 0"))

    // a real table named like a suffix is never shadowed
    spark.sql("DROP TABLE IF EXISTS graft_t.lab11.history")
    spark.sql("CREATE TABLE graft_t.lab11.history AS " +
      "SELECT id AS h FROM range(3)")
    spark.sql("SELECT count(*) FROM graft_t.lab11.history")
      .head().getLong(0) shouldBe 3
  }

  test("partitions metadata table: per-partition file counts, URL-decoded") {
    init()
    spark.sql("CREATE NAMESPACE IF NOT EXISTS graft_t.lab11p")
    spark.sql("DROP TABLE IF EXISTS graft_t.lab11p.pt")
    // 'a b' forces a URL-encoded directory segment (space → '+')
    spark.sql("""CREATE TABLE graft_t.lab11p.pt PARTITIONED BY (g) AS
                |SELECT /*+ REPARTITION(1) */ id AS k,
                |       CASE WHEN id % 2 = 0 THEN 'a b' ELSE 'c' END AS g
                |FROM range(10)""".stripMargin)
    spark.sql("""INSERT INTO graft_t.lab11p.pt
                |SELECT /*+ REPARTITION(1) */ id, 'c' FROM range(5)
                |""".stripMargin)
    val parts = spark.sql("SELECT part, n_files, bytes " +
      "FROM graft_t.lab11p.pt.partitions ORDER BY part").collect()
    parts.map(r => (r.getString(0), r.getInt(1))).toSeq shouldBe
      Seq(("g=a b", 1), ("g=c", 2))
    all(parts.map(_.getLong(2))) should be > 0L
  }

  test("stats metadata table: sidecar coverage + ANN attribution (r20)") {
    init()
    spark.sql("CREATE NAMESPACE IF NOT EXISTS graft_t.lab20s")
    spark.sql("DROP TABLE IF EXISTS graft_t.lab20s.st")
    spark.sql("""CREATE TABLE graft_t.lab20s.st (k BIGINT NOT NULL, s STRING)
                |TBLPROPERTIES ('graft.bloomFor' = 'k',
                |  'graft.trigramFor' = 's')""".stripMargin)
    spark.sql("INSERT INTO graft_t.lab20s.st " +
      "SELECT /*+ REPARTITION(2) */ id, concat('txt', id) FROM range(100)")
    val rows = spark.sql("SELECT kind, name, n_files, n_live " +
      "FROM graft_t.lab20s.st.stats").collect()
      .map(r => (r.getString(0), r.getString(1), r.getInt(2), r.getInt(3)))
      .toSet
    rows should contain(("bloom", "k", 2, 2))
    rows should contain(("trigram", "s", 2, 2))
    rows should contain(("zones", "k", 2, 2))
    rows should contain(("null_cells", "s", 2, 2))
    rows should contain(("sum_cells", "k", 2, 2))
    rows should contain(("rows", "", 2, 2))

    // ANN attribution: an index built over emb surfaces in EMB's stats
    // (name + source detail), never in an unrelated table's
    spark.sql("DROP TABLE IF EXISTS graft_t.lab20s.emb")
    spark.sql("DROP TABLE IF EXISTS graft_t.lab20s.sidx_centroids")
    spark.sql("DROP TABLE IF EXISTS graft_t.lab20s.sidx_assign")
    spark.sql("CREATE TABLE graft_t.lab20s.emb AS SELECT id AS vec_id, " +
      "array(cast(id as float), cast((id * 7) % 13 as float)) AS embedding " +
      "FROM range(64)")
    spark.sql("CALL graft_t.system.build_ivf_index(" +
      "'lab20s.emb', 'vec_id', 'embedding', 'lab20s.sidx')")
    val ann = spark.sql("SELECT name, detail FROM graft_t.lab20s.emb.stats " +
      "WHERE kind = 'ann_ivf'").collect()
    ann.map(_.getString(0)).toSeq shouldBe Seq("sidx")
    ann.head.getString(1) should include("source=lab20s.emb")
    ann.head.getString(1) should include("built@v1 live@v1")
    spark.sql("SELECT count(*) FROM graft_t.lab20s.st.stats " +
      "WHERE kind LIKE 'ann%'").head().getLong(0) shouldBe 0L
    // the corpus moves past the index: built@ lags, live@ advances —
    // the staleness signal a 100 TB pipeline reads before trusting ANN
    spark.sql("INSERT INTO graft_t.lab20s.emb SELECT id + 64, " +
      "array(cast(id as float), cast(id as float)) FROM range(8)")
    spark.sql("SELECT detail FROM graft_t.lab20s.emb.stats " +
      "WHERE kind = 'ann_ivf'").head().getString(0) should
      include("built@v1 live@v2")
    // append_ivf_assignments re-stamps: lag closed
    spark.sql("CALL graft_t.system.append_ivf_assignments(" +
      "'lab20s.sidx', 64, -1)")
    spark.sql("SELECT detail FROM graft_t.lab20s.emb.stats " +
      "WHERE kind = 'ann_ivf'").head().getString(0) should
      include("built@v2 live@v2")
  }

  test("CALL cluster: in-place z-order re-layout, rows intact, travelable") {
    init()
    spark.sql("CREATE NAMESPACE IF NOT EXISTS graft_t.lab11z")
    spark.sql("DROP TABLE IF EXISTS graft_t.lab11z.zc")
    spark.sql("""CREATE TABLE graft_t.lab11z.zc AS
                |SELECT id AS a, (id * 37) % 1000 AS b, id * 2 AS v
                |FROM range(2000)""".stripMargin)
    val before = spark.sql(
      "SELECT CAST(sum(a) AS BIGINT), CAST(sum(v) AS BIGINT), count(*) " +
        "FROM graft_t.lab11z.zc").head()
    val n = spark.sql(
      "CALL graft_t.system.cluster('lab11z.zc', 'a', 'b', 4, 'z')").head()
    n.getLong(0) shouldBe 4L
    spark.sql(
      "SELECT CAST(sum(a) AS BIGINT), CAST(sum(v) AS BIGINT), count(*) " +
        "FROM graft_t.lab11z.zc").head() shouldBe before
    // the re-layout is its own snapshot: travel to v1 still serves the
    // pre-cluster generation
    spark.sql("SELECT count(*) FROM graft_t.lab11z.zc VERSION AS OF 1")
      .head().getLong(0) shouldBe 2000L
    spark.sql("SELECT count(*) FROM graft_t.lab11z.zc.files")
      .head().getLong(0) shouldBe 4L
    intercept[Exception] {
      spark.sql(
        "CALL graft_t.system.cluster('lab11z.zc', 'a', 'b', 4, 'peano')")
    }.getMessage should include("curve")
  }

  test("CALL compact: in-place bin-pack materializes deletes, history intact") {
    init()
    spark.sql("CREATE NAMESPACE IF NOT EXISTS graft_t.lab12")
    spark.sql("DROP TABLE IF EXISTS graft_t.lab12.cp")
    spark.sql("CREATE TABLE graft_t.lab12.cp AS SELECT id AS k FROM range(100)")
    spark.sql("INSERT INTO graft_t.lab12.cp SELECT id FROM range(100, 200)")
    spark.sql("DELETE FROM graft_t.lab12.cp WHERE k IN (5, 105)")
    val dir = s"$root/lab12/cp"
    AvroMaintenance.dataFiles(dir) should be > 1
    val written = spark
      .sql("CALL graft_t.system.compact('lab12.cp', 1000000000)")
      .head().getLong(0)
    written shouldBe 1L
    AvroMaintenance.dataFiles(dir) shouldBe 1
    // deletes applied physically, sidecar gone
    AvroFileSource.deleteFile(new java.io.File(dir)).isFile shouldBe false
    spark.sql("SELECT count(*), sum(k) FROM graft_t.lab12.cp").head() match {
      case r =>
        r.getLong(0) shouldBe 198
        r.getLong(1) shouldBe (0L until 200L).sum - 5 - 105
    }
    // the pre-compact generation still travels (files archived, not lost)
    spark.sql("SELECT count(*) FROM graft_t.lab12.cp VERSION AS OF 2")
      .head().getLong(0) shouldBe 200
  }

  test("ADD COLUMN DEFAULT: old rows serve it, INSERT column lists fill it") {
    init()
    spark.sql("CREATE NAMESPACE IF NOT EXISTS graft_t.lab13")
    spark.sql("DROP TABLE IF EXISTS graft_t.lab13.df")
    spark.sql("CREATE TABLE graft_t.lab13.df AS SELECT id AS k FROM range(5)")
    spark.sql("ALTER TABLE graft_t.lab13.df " +
      "ADD COLUMN tier STRING DEFAULT 'basic'")
    // pre-ALTER files lack the column physically; decode synthesizes
    // the declared default, not null
    spark.sql("SELECT count(*) FROM graft_t.lab13.df WHERE tier = 'basic'")
      .head().getLong(0) shouldBe 5
    // INSERT with an explicit column list fills the default via
    // Spark's CURRENT_DEFAULT resolution
    spark.sql("INSERT INTO graft_t.lab13.df (k) VALUES (100)")
    spark.sql("SELECT tier FROM graft_t.lab13.df WHERE k = 100")
      .head().getString(0) shouldBe "basic"
    // explicit values still win
    spark.sql("INSERT INTO graft_t.lab13.df VALUES (101, 'pro')")
    spark.sql("SELECT count(*) FROM graft_t.lab13.df WHERE tier = 'basic'")
      .head().getLong(0) shouldBe 6
    spark.sql("SELECT count(*) FROM graft_t.lab13.df WHERE tier = 'pro'")
      .head().getLong(0) shouldBe 1
    // numeric default on a second ALTER: every existing row (incl. the
    // post-first-ALTER inserts) serves 7
    spark.sql("ALTER TABLE graft_t.lab13.df ADD COLUMN score BIGINT DEFAULT 7")
    spark.sql("SELECT sum(score) FROM graft_t.lab13.df")
      .head().getLong(0) shouldBe 7L * 7
    // travel to before the first ALTER still lacks both columns
    spark.sql("SELECT * FROM graft_t.lab13.df VERSION AS OF 1")
      .schema.fieldNames.toSeq shouldBe Seq("k")
  }

  test("SQL ADD CONSTRAINT CHECK: stored, enforced, droppable, described") {
    init()
    spark.sql("CREATE NAMESPACE IF NOT EXISTS graft_t.lab14")
    spark.sql("DROP TABLE IF EXISTS graft_t.lab14.cc")
    spark.sql("CREATE TABLE graft_t.lab14.cc AS SELECT id AS k FROM range(10)")
    spark.sql("ALTER TABLE graft_t.lab14.cc " +
      "ADD CONSTRAINT k_small CHECK (k < 1000)")
    // stored in the sidecar, surfaced through Table.constraints
    AvroFileSource.readConstraints(
      new java.io.File(s"$root/lab14/cc")).map(_._1) shouldBe Seq("k_small")
    // enforced on write
    intercept[Exception] {
      spark.sql("INSERT INTO graft_t.lab14.cc VALUES (5000)")
    }
    spark.sql("SELECT count(*) FROM graft_t.lab14.cc")
      .head().getLong(0) shouldBe 10
    // adding a constraint existing data violates is refused
    intercept[Exception] {
      spark.sql("ALTER TABLE graft_t.lab14.cc " +
        "ADD CONSTRAINT impossible CHECK (k > 100)")
    }
    spark.sql("ALTER TABLE graft_t.lab14.cc DROP CONSTRAINT k_small")
    spark.sql("INSERT INTO graft_t.lab14.cc VALUES (5000)")
    spark.sql("SELECT count(*) FROM graft_t.lab14.cc")
      .head().getLong(0) shouldBe 11
  }

  test("persistent views: CALL create_view, live SELECT through, drop") {
    init()
    spark.sql("CREATE NAMESPACE IF NOT EXISTS graft_t.lab15")
    spark.sql("DROP TABLE IF EXISTS graft_t.lab15.base")
    GraftViews.viewFile(
      new java.io.File(s"$root/lab15"), "v").delete()
    spark.sql("CREATE TABLE graft_t.lab15.base AS " +
      "SELECT id AS k, id % 3 AS m FROM range(30)")
    spark.sql("CALL graft_t.system.create_view('lab15.v', " +
      "'SELECT m, count(*) AS n, sum(k) AS s " +
      "FROM graft_t.lab15.base GROUP BY m')")
    spark.sql("SELECT * FROM graft_t.lab15.v ORDER BY m").collect()
      .map(r => (r.getLong(0), r.getLong(1))).toSeq shouldBe
      Seq((0L, 10L), (1L, 10L), (2L, 10L))
    // views are LIVE over the base table: re-analyzed at every read
    spark.sql("INSERT INTO graft_t.lab15.base VALUES (90, 0)")
    spark.sql("SELECT n FROM graft_t.lab15.v WHERE m = 0")
      .head().getLong(0) shouldBe 11
    // views compose: a view over the view
    spark.sql("CALL graft_t.system.create_view('lab15.v2', " +
      "'SELECT sum(n) AS total FROM graft_t.lab15.v')")
    spark.sql("SELECT total FROM graft_t.lab15.v2")
      .head().getLong(0) shouldBe 31
    // create-time validation: a broken definition never stores
    intercept[Exception] {
      spark.sql("CALL graft_t.system.create_view('lab15.bad', " +
        "'SELECT nope FROM graft_t.lab15.base')")
    }
    GraftViews.viewFile(
      new java.io.File(s"$root/lab15"), "bad").isFile shouldBe false
    // duplicate create refused; drop re-opens the name
    intercept[Exception] {
      spark.sql("CALL graft_t.system.create_view('lab15.v', 'SELECT 1')")
    }
    spark.sql("CALL graft_t.system.drop_view('lab15.v2')")
    intercept[Exception] { spark.sql("SELECT * FROM graft_t.lab15.v2") }
    spark.sql("CALL graft_t.system.drop_view('lab15.v')")
    // unqualified references (temp-view capture hazard) are refused at
    // create; CTE-local names are exempt
    spark.range(3).toDF("z").createOrReplaceTempView("leaky_tmp")
    intercept[Exception] {
      spark.sql("CALL graft_t.system.create_view('lab15.bad2', " +
        "'SELECT z FROM leaky_tmp')")
    }
    spark.sql("CALL graft_t.system.create_view('lab15.cte_ok', " +
      "'WITH w AS (SELECT k FROM graft_t.lab15.base) " +
      "SELECT count(*) AS n FROM w')")
    spark.sql("SELECT n FROM graft_t.lab15.cte_ok")
      .head().getLong(0) shouldBe 31
    spark.sql("CALL graft_t.system.drop_view('lab15.cte_ok')")
  }

  test("readStream.table tails a catalog table exactly-once across runs") {
    init()
    spark.sql("CREATE NAMESPACE IF NOT EXISTS graft_t.lab16")
    spark.sql("DROP TABLE IF EXISTS graft_t.lab16.st")
    spark.sql("CREATE TABLE graft_t.lab16.st AS SELECT id AS k FROM range(10)")
    val out = graft.operators.Catalog.tempDir("graft_cat_stream_out")
    val ckpt = graft.operators.Catalog.tempDir("graft_cat_stream_ckpt")
    def drain(): Unit = {
      val q = spark.readStream.table("graft_t.lab16.st")
        .writeStream.format("parquet")
        .option("path", out).option("checkpointLocation", ckpt)
        .trigger(org.apache.spark.sql.streaming.Trigger.AvailableNow())
        .start()
      q.awaitTermination(60000)
      ()
    }
    drain()
    spark.read.parquet(out).count() shouldBe 10L
    // second run over the SAME checkpoint: only the new append lands
    spark.sql("INSERT INTO graft_t.lab16.st SELECT id FROM range(10, 25)")
    drain()
    val got = spark.read.parquet(out)
    got.count() shouldBe 25L
    got.agg(F.sum("k")).head().getLong(0) shouldBe (0L until 25L).sum
  }

  test("a view-definition cycle fails with a diagnosis, not a stack overflow") {
    init()
    spark.sql("CREATE NAMESPACE IF NOT EXISTS graft_t.lab18")
    spark.sql("DROP TABLE IF EXISTS graft_t.lab18.b")
    spark.sql("CREATE TABLE graft_t.lab18.b AS SELECT id AS k FROM range(3)")
    val nsD = new java.io.File(s"$root/lab18")
    GraftViews.viewFile(nsD, "va").delete()
    GraftViews.viewFile(nsD, "vb").delete()
    spark.sql("CALL graft_t.system.create_view('lab18.va', " +
      "'SELECT k FROM graft_t.lab18.b')")
    spark.sql("CALL graft_t.system.create_view('lab18.vb', " +
      "'SELECT k FROM graft_t.lab18.va')")
    // craft the cycle by rewriting va's sidecar behind the procedure's
    // validation (a hostile/corrupted metadata scenario)
    val ia = org.apache.spark.sql.connector.catalog.Identifier
      .of(Array("lab18"), "va")
    GraftViews.write(nsD,
      new org.apache.spark.sql.connector.catalog.ViewInfo(ia,
        "SELECT k FROM graft_t.lab18.vb", "graft_t", Array("lab18"),
        new org.apache.spark.sql.types.StructType()
          .add("k", org.apache.spark.sql.types.LongType),
        Array("k"), Array.empty, Array.empty,
        new java.util.HashMap[String, String]()))
    val err = intercept[Exception] {
      spark.sql("SELECT * FROM graft_t.lab18.vb").collect()
    }
    val msgs = Iterator.iterate(err: Throwable)(_.getCause)
      .takeWhile(_ != null).map(e => Option(e.getMessage).getOrElse(""))
      .mkString("; ")
    msgs should include("recursive view")
    spark.sql("CALL graft_t.system.drop_view('lab18.vb')")
    spark.sql("CALL graft_t.system.drop_view('lab18.va')")
  }

  test("TRUNCATE keeps evolved columns (evo journal replays over the sidecar)") {
    init()
    spark.sql("CREATE NAMESPACE IF NOT EXISTS graft_t.lab17")
    spark.sql("DROP TABLE IF EXISTS graft_t.lab17.tv")
    spark.sql("CREATE TABLE graft_t.lab17.tv AS SELECT id AS k FROM range(5)")
    spark.sql("ALTER TABLE graft_t.lab17.tv ADD COLUMN tag STRING")
    spark.sql("TRUNCATE TABLE graft_t.lab17.tv")
    // the empty table still shows the evolved shape, and inserts use it
    spark.sql("SELECT * FROM graft_t.lab17.tv").schema.fieldNames.toSeq shouldBe
      Seq("k", "tag")
    spark.sql("INSERT INTO graft_t.lab17.tv VALUES (1, 'x')")
    spark.sql("SELECT tag FROM graft_t.lab17.tv WHERE k = 1")
      .head().getString(0) shouldBe "x"
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

  test("CALL compact preserves a Hive-partitioned layout") {
    init()
    spark.sql("CREATE NAMESPACE IF NOT EXISTS graft_t.lab20")
    spark.sql("DROP TABLE IF EXISTS graft_t.lab20.pc")
    spark.sql("CREATE TABLE graft_t.lab20.pc (k BIGINT, p BIGINT) " +
      "PARTITIONED BY (p)")
    spark.sql("INSERT INTO graft_t.lab20.pc " +
      "SELECT id, id % 3 FROM range(90)")
    spark.sql("INSERT INTO graft_t.lab20.pc " +
      "SELECT id, id % 3 FROM range(90, 180)")
    val dir = s"$root/lab20/pc"
    def partKeys(): Set[String] =
      AvroFileSource.listPartitioned(new java.io.File(dir))
        .flatMap(_._2.keySet).toSet
    partKeys() shouldBe Set("p")
    spark.sql("CALL graft_t.system.compact('lab20.pc', 1000000000)")
    // the layout survived the rewrite: still k=v dirs, still prunable
    partKeys() shouldBe Set("p")
    AvroFileSource.listPartitioned(new java.io.File(dir))
      .map(_._2("p")).toSet shouldBe Set("0", "1", "2")
    spark.sql("SELECT count(*) FROM graft_t.lab20.pc WHERE p = 1")
      .head().getLong(0) shouldBe 60
    spark.sql("SELECT count(*) FROM graft_t.lab20.pc")
      .head().getLong(0) shouldBe 180
  }

  test("CREATE TABLE and RENAME refuse to shadow a persistent view") {
    init()
    spark.sql("CREATE NAMESPACE IF NOT EXISTS graft_t.lab21")
    spark.sql("DROP TABLE IF EXISTS graft_t.lab21.base")
    spark.sql("CREATE TABLE graft_t.lab21.base AS " +
      "SELECT id AS k FROM range(5)")
    spark.sql("CALL graft_t.system.create_view('lab21.vshadow', " +
      "'SELECT k FROM graft_t.lab21.base')")
    val e1 = intercept[Exception] {
      spark.sql("CREATE TABLE graft_t.lab21.vshadow AS " +
        "SELECT id AS k FROM range(3)")
    }
    e1.getMessage should include("view")
    spark.sql("DROP TABLE IF EXISTS graft_t.lab21.other")
    spark.sql("CREATE TABLE graft_t.lab21.other AS " +
      "SELECT id AS k FROM range(3)")
    val e2 = intercept[Exception] {
      spark.sql("ALTER TABLE graft_t.lab21.other RENAME TO lab21.vshadow")
    }
    e2.getMessage should include("view")
    // the view still resolves
    spark.sql("SELECT count(*) FROM graft_t.lab21.vshadow")
      .head().getLong(0) shouldBe 5
  }

  test("CALL remove_orphans sweeps unjournaled files through SQL") {
    init()
    spark.sql("CREATE NAMESPACE IF NOT EXISTS graft_t.lab23")
    spark.sql("DROP TABLE IF EXISTS graft_t.lab23.o")
    spark.sql("CREATE TABLE graft_t.lab23.o AS SELECT id AS k FROM range(10)")
    val dir = new java.io.File(s"$root/lab23/o")
    val donor = AvroFileSource.listAvro(dir).head
    java.nio.file.Files.copy(donor.toPath,
      new java.io.File(dir, "zz_orphan.avro").toPath)
    spark.sql("CALL graft_t.system.remove_orphans('lab23.o')")
      .head().getLong(0) shouldBe 1L
    spark.sql("SELECT count(*) FROM graft_t.lab23.o")
      .head().getLong(0) shouldBe 10L
  }

  test("empty DDL table refuses to drop its last column") {
    init()
    spark.sql("CREATE NAMESPACE IF NOT EXISTS graft_t.lab22")
    spark.sql("DROP TABLE IF EXISTS graft_t.lab22.e")
    spark.sql("CREATE TABLE graft_t.lab22.e (a BIGINT, b STRING)")
    spark.sql("ALTER TABLE graft_t.lab22.e DROP COLUMN b")
    val e = intercept[Exception] {
      spark.sql("ALTER TABLE graft_t.lab22.e DROP COLUMN a")
    }
    e.getMessage should include("last column")
  }
}
