package graft.sources

import java.nio.file.Files

import org.apache.spark.sql.{DataFrame, Row}
import org.apache.spark.sql.types._
import org.apache.spark.sql.{functions => F}
import org.scalacheck.{Gen, Prop, Properties, Test}
import org.scalacheck.Prop.propBoolean

import graft.SparkTestSession

/** ScalaCheck laws for the graft-avro DataSource V2 and the minhash4
  * sketch aggregate: random schemas and rows, invariants the formats
  * guarantee. Every case runs real write + read Spark jobs, so cases are
  * kept small.
  */
object SourceLaws extends Properties("SourceLaws") {

  override def overrideParameters(p: Test.Parameters): Test.Parameters =
    p.withMinSuccessfulTests(10)

  private lazy val spark = SparkTestSession.spark

  private val namePool =
    Vector("alpha", "bravo", "carol", "delta", "echo", "fox")

  private val leafGen: Gen[DataType] =
    Gen.oneOf(IntegerType, LongType, DoubleType, StringType, BooleanType,
      DateType, TimestampType, DecimalType(10, 2))

  private def valueGen(dt: DataType): Gen[Any] = dt match {
    case IntegerType => Gen.frequency(9 -> Gen.chooseNum(-1000, 1000), 1 -> Gen.const(null))
    case LongType => Gen.frequency(9 -> Gen.chooseNum(-100000L, 100000L), 1 -> Gen.const(null))
    case DoubleType => Gen.chooseNum(-100, 100).map(_ / 4.0)
    case StringType => Gen.alphaNumStr.map(_.take(8))
    case BooleanType => Gen.oneOf(true, false)
    case DateType => Gen.chooseNum(0, 20000)
      .map(d => java.sql.Date.valueOf(java.time.LocalDate.ofEpochDay(d.toLong)))
    case TimestampType => Gen.chooseNum(0L, 1700000000L)
      .map(s => java.sql.Timestamp.from(java.time.Instant.ofEpochSecond(s, 123456000L)))
    case d: DecimalType => Gen.chooseNum(-999999L, 999999L)
      .map(u => new java.math.BigDecimal(java.math.BigInteger.valueOf(u), d.scale))
    case s: StructType =>
      Gen.sequence[Seq[Any], Any](s.fields.toSeq.map(f => valueGen(f.dataType)))
        .map(Row.fromSeq)
    case ArrayType(et, _) =>
      Gen.chooseNum(0, 3).flatMap(n => Gen.listOfN(n, valueGen(et)))
    case _ => Gen.const(null)
  }

  private case class Case(schema: StructType, rows: Seq[Row])

  private val caseGen: Gen[Case] = for {
    n <- Gen.chooseNum(1, 4)
    names <- Gen.pick(n, namePool)
    types <- Gen.listOfN(n, Gen.frequency(
      6 -> leafGen,
      2 -> leafGen.map(t => StructType(Seq(
        StructField("x", t, nullable = true),
        StructField("y", StringType, nullable = true)))),
      2 -> leafGen.map(t => ArrayType(t, containsNull = false))))
    schema = StructType(names.toSeq.zip(types).map { case (nm, t) =>
      // array elements are non-null; the field itself stays nullable
      StructField(nm, t, nullable = true)
    })
    nRows <- Gen.chooseNum(1, 5)
    rows <- Gen.listOfN(nRows,
      Gen.sequence[Seq[Any], Any](schema.fields.toSeq.map { f =>
        f.dataType match {
          case _: ArrayType => valueGen(f.dataType) // keep arrays non-null
          case dt => valueGen(dt)
        }
      }))
  } yield Case(schema, rows.map(Row.fromSeq))

  private def df(c: Case): DataFrame = {
    import scala.jdk.CollectionConverters._
    spark.createDataFrame(c.rows.asJava, c.schema)
  }

  private def canon(d: DataFrame): Seq[String] =
    d.collect().toSeq.map(_.toString).sorted

  // Law: writing any schema/rows through graft-avro and reading back is
  // the identity on the row multiset (schema names preserved in order).
  property("graft-avro round trip is the identity") = Prop.forAll(caseGen) { c =>
    val dir = graft.operators.Catalog.tempDir("graft_avro_law")
    val in = df(c)
    in.write.format("graft-avro").mode("append").save(dir)
    val back = spark.read.format("graft-avro").load(dir)
    (back.schema.fieldNames.toSeq == c.schema.fieldNames.toSeq) :| "names" &&
      (canon(back) == canon(in)) :| s"rows: ${canon(back)} vs ${canon(in)}"
  }

  // ---- filter-pushdown soundness ------------------------------------
  // The decode-time skip (AvroFilterEval) may only drop rows the query
  // drops: for ANY predicate, filtering the avro read must equal
  // filtering the in-memory original. Catches one-sided errors the
  // residual re-evaluation cannot (a wrongly skipped row is unrecoverable).

  private val fpSchema = StructType(Seq(
    StructField("i", IntegerType, nullable = true),
    StructField("l", LongType, nullable = false),
    StructField("s", StringType, nullable = true),
    StructField("d", DoubleType, nullable = false)))

  private val fpRowGen: Gen[Row] = for {
    i <- Gen.frequency(4 -> Gen.chooseNum(-5, 5).map(Int.box), 1 -> Gen.const(null))
    l <- Gen.chooseNum(-50L, 50L)
    s <- Gen.frequency(4 -> Gen.oneOf("ab", "ba", "abc", "", "zz", "a"), 1 -> Gen.const(null))
    d <- Gen.chooseNum(-20, 20).map(_ / 4.0)
  } yield Row(i, l, s, d)

  private val leafPredGen: Gen[(String, org.apache.spark.sql.Column)] = {
    val cmps = for {
      (c, lit) <- Gen.oneOf(
        Gen.chooseNum(-5, 5).map(v => ("i", F.lit(v))),
        Gen.chooseNum(-50L, 50L).map(v => ("l", F.lit(v))),
        Gen.chooseNum(-20, 20).map(v => ("d", F.lit(v / 4.0))))
      op <- Gen.oneOf("=", "<", ">", "<=", ">=")
    } yield (s"$c $op $lit", op match {
      case "="  => F.col(c) === lit
      case "<"  => F.col(c) < lit
      case ">"  => F.col(c) > lit
      case "<=" => F.col(c) <= lit
      case ">=" => F.col(c) >= lit
    })
    Gen.frequency(
      5 -> cmps,
      1 -> Gen.oneOf("ab", "a", "z").map(p => (s"s like $p%", F.col("s").startsWith(p))),
      1 -> Gen.oneOf("b", "c").map(p => (s"s contains $p", F.col("s").contains(p))),
      1 -> Gen.oneOf("i", "s").map(c => (s"$c is null", F.col(c).isNull)),
      1 -> Gen.oneOf("i", "s").map(c => (s"$c is not null", F.col(c).isNotNull)),
      1 -> Gen.chooseNum(1, 5).flatMap(k =>
        Gen.pick(k, Seq("ab", "ba", "abc", "zz", "miss", "a"))).map { vs0 =>
        val vs = vs0.toList // string In → hash-set fast path
        (s"s in $vs", F.col("s").isin(vs: _*))
      },
      1 -> Gen.chooseNum(1, 4).flatMap(k =>
        Gen.pick(k, Seq(-5, -1, 0, 1, 3, 5))).map { vs0 =>
        val vs = vs0.toList // numeric In → widening may-match path
        (s"i in $vs", F.col("i").isin(vs.map(Int.box): _*))
      })
  }

  private def predGen(depth: Int): Gen[(String, org.apache.spark.sql.Column)] =
    if (depth <= 0) leafPredGen
    else Gen.frequency(
      3 -> leafPredGen,
      2 -> Gen.zip(predGen(depth - 1), predGen(depth - 1)).map { case ((da, a), (db, b)) =>
        (s"($da AND $db)", a && b) },
      2 -> Gen.zip(predGen(depth - 1), predGen(depth - 1)).map { case ((da, a), (db, b)) =>
        (s"($da OR $db)", a || b) },
      1 -> predGen(depth - 1).map { case (d, p) => (s"NOT $d", !p) })

  property("filter pushdown never changes filter semantics") =
    Prop.forAll(Gen.listOfN(12, fpRowGen), predGen(2)) { (rows, dp) =>
      val (desc, pred) = dp
      import scala.jdk.CollectionConverters._
      val dir = graft.operators.Catalog.tempDir("graft_avro_fp")
      val in = spark.createDataFrame(rows.asJava, fpSchema)
      in.write.format("graft-avro").mode("append").save(dir)
      val avro = spark.read.format("graft-avro").schema(fpSchema).load(dir)
      val got = canon(avro.filter(pred))
      val want = canon(in.filter(pred))
      (got == want) :| s"$desc: avro=$got expected=$want"
    }

  // Law: sync-marker splitting is invisible — ANY split size yields the
  // same row multiset as the unsplit read (ranges partition the blocks
  // exactly). One shared 5000-row single-file dataset; random sizes span
  // sub-block to whole-file.
  private lazy val splitDir: String = {
    val dir = graft.operators.Catalog.tempDir("graft_avro_split_law")
    spark.range(5000).selectExpr("id", "md5(cast(id as string)) as h")
      .coalesce(1).write.format("graft-avro").mode("append").save(dir)
    dir
  }

  property("sync-marker splits preserve the row multiset") =
    Prop.forAll(Gen.chooseNum(512L, 300000L)) { splitBytes =>
      val d = spark.read.format("graft-avro")
        .option("maxSplitBytes", splitBytes).load(splitDir)
      val agg = d.agg(F.count(F.lit(1)), F.sum("id")).head()
      (agg.getLong(0) == 5000L && agg.getLong(1) == (0L until 5000L).sum) :|
        s"splitBytes=$splitBytes parts=${d.rdd.getNumPartitions}"
    }

  // Law: partition-directory pruning is invisible — a partitioned-layout
  // read under ANY predicate equals the in-memory filter. This is the
  // path where an unsound prune silently LOSES data (a skipped directory
  // never reaches Spark's re-evaluation), so it gets its own law.
  private lazy val prunedCase: (String, org.apache.spark.sql.DataFrame) = {
    val rows = Gen.listOfN(40, fpRowGen).sample.get
    import scala.jdk.CollectionConverters._
    val in = spark.createDataFrame(rows.asJava, fpSchema)
    val dir = graft.operators.Catalog.tempDir("graft_avro_prune_law")
    in.write.format("graft-avro").option("partitionBy", "s")
      .mode("append").save(dir)
    (dir, in)
  }

  property("partition pruning never changes filter results") =
    Prop.forAll(predGen(2)) { case (desc, pred) =>
      val (dir, in) = prunedCase
      val got = canon(spark.read.format("graft-avro").schema(fpSchema)
        .load(dir).filter(pred))
      val want = canon(in.filter(pred))
      (got == want) :| s"$desc: avro=$got expected=$want"
    }

  // Law: minhash4 lanes are monotone non-increasing under set growth —
  // a superset's signature is element-wise <= the subset's.
  /** Model-based exactly-once law for the streaming registry: random
    * interleavings of file arrival (names deliberately interleaving
    * lexicographically), batch consumption, epoch commits, RETENTION
    * (deleting committed source files), and driver RESTARTS (new stream
    * instance over the same checkpoint journal), with compaction forced
    * low — every created file must be planned into exactly one batch.
    */
  private case class StreamStep(newFiles: Int, restart: Boolean, deleteFrac: Double)

  private val stepGen: Gen[StreamStep] = for {
    n <- Gen.chooseNum(0, 3)
    r <- Gen.prob(0.3)
    d <- Gen.oneOf(0.0, 0.5, 1.0)
  } yield StreamStep(n, r, d)

  property("journal compaction preserves exactly-once across restarts") =
    Prop.forAll(Gen.listOfN(8, stepGen)) { steps =>
      import org.apache.spark.sql.connector.read.streaming.ReadLimit
      val dir = new java.io.File(graft.operators.Catalog.tempDir("graft_law_stream"))
      val ckpt = graft.operators.Catalog.tempDir("graft_law_ckpt")
      val schema = new StructType().add("id", LongType)
      def mkStream() =
        new AvroMicroBatchStream(dir.getPath, schema, schema, ckpt,
          maxFilesPerTrigger = None, compactAfter = 3)
      var stream = mkStream()
      var cur = stream.initialOffset()
      var counter = 0
      val created = scala.collection.mutable.ListBuffer.empty[String]
      val planned = scala.collection.mutable.ListBuffer.empty[String]
      val committed = scala.collection.mutable.ListBuffer.empty[String]
      steps.foreach { step =>
        if (step.restart) {
          stream = mkStream() // rebuild from the journal
          cur = stream.deserializeOffset(cur.json())
        }
        (1 to step.newFiles).foreach { _ =>
          counter += 1
          // (counter*37)%100 makes later names sort BETWEEN earlier ones
          val f = new java.io.File(dir,
            f"f-${(counter * 37) % 100}%02d-$counter.avro")
          java.nio.file.Files.write(f.toPath, Array.emptyByteArray)
          created += f.getAbsolutePath
        }
        val end = stream.latestOffset(cur, ReadLimit.allAvailable())
        val batch = stream.planInputPartitions(cur, end)
          .map(_.asInstanceOf[AvroInputPartition].file)
        planned ++= batch
        stream.commit(end)
        committed ++= batch
        cur = end
        // retention: delete a fraction of the committed files
        val k = (committed.size * step.deleteFrac).toInt
        committed.take(k).foreach(p => new java.io.File(p).delete())
      }
      // drain whatever is left, then compare multisets
      val end = stream.latestOffset(cur, ReadLimit.allAvailable())
      planned ++= stream.planInputPartitions(cur, end)
        .map(_.asInstanceOf[AvroInputPartition].file)
      val ok = planned.sorted == created.sorted
      if (!ok) println(s"created=${created.size} planned=${planned.size}")
      ok
    }

  property("minhash4 lanes shrink monotonically under union") =
    Prop.forAll(Gen.nonEmptyListOf(Gen.alphaNumStr.map(_.take(6))),
      Gen.nonEmptyListOf(Gen.alphaNumStr.map(_.take(6)))) { (a, b) =>
      import spark.implicits._
      graft.functions.VectorFunctions.register(spark)
      def sig(xs: Seq[String]): Seq[Long] =
        xs.toDF("s").agg(
          graft.functions.VectorFunctions.minhash4(F.col("s")).as("sig"))
          .head().getSeq[Long](0)
      val sa = sig(a)
      val sab = sig(a ++ b)
      sab.zip(sa).forall { case (u, x) => u <= x }
    }
}
