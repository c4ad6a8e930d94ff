package graft.sources

import java.io.File

import org.apache.spark.sql.connector.expressions.Expressions
import org.apache.spark.sql.connector.expressions.filter.Predicate
import org.apache.spark.sql.connector.read.SupportsRuntimeV2Filtering
import org.apache.spark.sql.{functions => F}
import org.scalatest.funsuite.AnyFunSuite
import org.scalatest.matchers.should.Matchers

import graft.SparkSpec

/** Driver-memory contract of the bloom sidecars at file scale: decoded
  * bloom bits are 4 KB per (file, column), so a 100k-file table must
  * never load them wholesale. Pinned here:
  *  - a scan with NO equality/IN filter never reads the manifest at all
  *    (zero driver bytes, not just fewer);
  *  - decoding restricts to the columns the query's filters reference;
  *  - the per-scan entry cap degrades to no-pruning (sound), never to
  *    an OOM;
  *  - runtime join-key sets arriving AFTER planning still re-resolve
  *    the bloom cache (the lazy-load regression this design invites).
  */
class BloomScaleSpec extends AnyFunSuite with SparkSpec with Matchers {

  private def tmp(): String = graft.operators.Catalog.tempDir("graft_bloomsc")

  private def writeTwoCol(dir: String): Unit =
    spark.range(0, 800).toDF("k")
      .withColumn("tag", F.concat(F.lit("t"), F.col("k").cast("string")))
      .withColumn("payload", F.md5(F.col("k").cast("string")))
      .repartition(8, F.col("k"))
      .write.format("graft-avro").option("bloomFor", "k,tag")
      .mode("overwrite").save(dir)

  private def planned(dir: String,
      filters: Seq[org.apache.spark.sql.sources.Filter] = Nil): Int = {
    val schema = spark.read.format("graft-avro").load(dir).schema
    val sb = new AvroScanBuilder(dir, schema)
    if (filters.nonEmpty) sb.pushFilters(filters.toArray)
    sb.build().toBatch.planInputPartitions().length
  }

  test("a filterless scan never reads the bloom manifest") {
    val dir = tmp()
    writeTwoCol(dir)
    val before = AvroFileSource.bloomManifestReads.get()
    planned(dir) shouldBe 8
    // range/sort predicates cannot use membership bits either
    import org.apache.spark.sql.sources.GreaterThan
    planned(dir, Seq(GreaterThan("k", 10L))) shouldBe 8
    AvroFileSource.bloomManifestReads.get() shouldBe before
    // an equality filter is what finally pays the one manifest read
    import org.apache.spark.sql.sources.EqualTo
    planned(dir, Seq(EqualTo("k", 42L))) should be <= 2
    AvroFileSource.bloomManifestReads.get() shouldBe (before + 1)
  }

  test("decoding restricts to the filtered columns") {
    val dir = tmp()
    writeTwoCol(dir)
    val d = new File(dir)
    val schema = spark.read.format("graft-avro").load(dir).schema
    val all = AvroFileSource.readBlooms(
      AvroFileSource.bloomFile(d), d, schema)
    all.values.flatMap(_.keySet).toSet shouldBe Set("k", "tag")
    val only = AvroFileSource.readBlooms(
      AvroFileSource.bloomFile(d), d, schema, cols = Set("k"))
    only.values.flatMap(_.keySet).toSet shouldBe Set("k")
    only.size shouldBe 8 // one entry per file, 4 KB each — not 2x
  }

  test("the entry cap degrades to no-pruning, never an OOM") {
    val dir = tmp()
    writeTwoCol(dir)
    val d = new File(dir)
    val schema = spark.read.format("graft-avro").load(dir).schema
    // 8 files x 2 columns = 16 entries; a cap of 3 refuses them all —
    // and the refusal must happen BEFORE any Base64 materialization
    // (the count pass short-circuits; a 100k-file manifest costs O(cap)
    // line parses on the driver, not ~400 MB of decoded bit arrays)
    val decodedBefore = AvroFileSource.bloomEntriesDecoded.get()
    AvroFileSource.readBlooms(AvroFileSource.bloomFile(d), d, schema,
      maxEntries = 3) shouldBe Map.empty
    AvroFileSource.bloomEntriesDecoded.get() shouldBe decodedBefore
    // an under-cap read decodes exactly the filtered entries
    AvroFileSource.readBlooms(AvroFileSource.bloomFile(d), d, schema,
      cols = Set("k")).size shouldBe 8
    AvroFileSource.bloomEntriesDecoded.get() shouldBe (decodedBefore + 8)
    // scans stay correct without pruning (absence => scan)
    spark.read.format("graft-avro").load(dir)
      .filter(F.col("k") === 42L).count() shouldBe 1
  }

  test("runtime join-key sets arriving after planning still load blooms") {
    val dir = tmp()
    writeTwoCol(dir)
    val schema = spark.read.format("graft-avro").load(dir).schema
    val scan = new AvroScanBuilder(dir, schema).build()
    // first plan: no filters -> nothing loaded, all files planned
    scan.toBatch.planInputPartitions().length shouldBe 8
    // runtime IN on k arrives (broadcast join build side), re-plan:
    // the bloom cache must re-resolve for the new column set
    scan.asInstanceOf[SupportsRuntimeV2Filtering].filter(Array(
      new Predicate("IN", Array[
          org.apache.spark.sql.connector.expressions.Expression](
        Expressions.column("k"), Expressions.literal(7L)))))
    scan.toBatch.planInputPartitions().length should be <= 2
  }
}
