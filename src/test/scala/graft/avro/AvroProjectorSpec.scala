package graft.avro

import org.apache.avro.SchemaBuilder
import org.apache.avro.generic.GenericData
import org.scalatest.matchers.should.Matchers
import org.scalatest.wordspec.AnyWordSpec

import graft.SparkSpec

import scala.jdk.CollectionConverters._

class AvroProjectorSpec extends AnyWordSpec with Matchers with SparkSpec {

  private val streetSchema = SchemaBuilder.record("Street").namespace("fix")
    .fields().requiredString("name").endRecord()
  private val addressSchema = SchemaBuilder.record("Address").namespace("fix")
    .fields()
    .name("street").`type`(streetSchema).noDefault()
    .name("street2").`type`().optional().`type`(streetSchema)
    .requiredString("city")
    .endRecord()
  private val personSchema = SchemaBuilder.record("Person").namespace("fix")
    .fields()
    .requiredString("name")
    .name("address").`type`(addressSchema).noDefault()
    .requiredInt("age")
    .endRecord()

  private def mk(i: Int) = {
    val st = new GenericData.Record(streetSchema)
    st.put("name", s"Street $i")
    val ad = new GenericData.Record(addressSchema)
    ad.put("street", st)
    ad.put("street2", null)
    ad.put("city", s"City ${i % 7}")
    val p = new GenericData.Record(personSchema)
    p.put("name", s"P$i"); p.put("address", ad); p.put("age", 20 + i % 60)
    p
  }

  "AvroProjector" should {
    "agree with the one-row-DataFrame record.sql path" in {
      import AvroSql.implicits._
      implicit val s: org.apache.spark.sql.SparkSession = spark
      val q = "SELECT name, address.street.name as streetName, age"
      val proj = new AvroProjector(spark, personSchema, q)
      (0 until 20).foreach { i =>
        val viaProjector = proj(mk(i))
        val viaJob = mk(i).sql(q)
        viaProjector.toString shouldBe viaJob.toString
        viaProjector.getSchema shouldBe viaJob.getSchema
      }
    }

    "handle withstructure and nullable parents" in {
      val proj = new AvroProjector(spark, personSchema,
        "SELECT name, address.street2.name as s2")
      val out = proj(mk(1))
      out.get("s2") shouldBe null
      out.getSchema.getField("s2").schema().getType shouldBe
        org.apache.avro.Schema.Type.UNION
      val ws = new AvroProjector(spark, personSchema,
        "SELECT address.city FROM t withstructure")
      ws(mk(3)).get("address").asInstanceOf[GenericData.Record]
        .get("city").toString shouldBe "City 3"
    }

    "null in, null out" in {
      val proj = new AvroProjector(spark, personSchema, "SELECT name")
      proj(null) shouldBe null
    }

    "beat per-record job dispatch by orders of magnitude (plan once)" in {
      val q = "SELECT name, address.street.name as streetName, age"
      val proj = new AvroProjector(spark, personSchema, q)
      val recs = (0 until 5000).map(mk)
      proj(recs.head) // warm codegen
      val t0 = System.nanoTime()
      var i = 0
      while (i < recs.length) { proj(recs(i)); i += 1 }
      val perRecordMicros = (System.nanoTime() - t0) / 1e3 / recs.length
      info(f"compiled projector: $perRecordMicros%.1f us/record")
      // a one-row Spark job costs ~10-100 ms; the projector must be far
      // under a millisecond per record
      perRecordMicros should be < 1000.0
    }
  }
}
