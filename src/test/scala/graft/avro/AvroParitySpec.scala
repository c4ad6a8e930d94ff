package graft.avro

import org.apache.avro.SchemaBuilder
import org.apache.avro.generic.GenericData
import org.scalatest.matchers.should.Matchers
import org.scalatest.wordspec.AnyWordSpec

import graft.SparkSpec

import scala.jdk.CollectionConverters._

/** The reference's withstructure behavioural suite, run VERBATIM through
  * the Avro surface (reference: AvroSqlWithRetainStructureTest.scala —
  * each case cites its line). Assertions pin output field order, nested
  * schema shape and values simultaneously, mirroring the reference's
  * schema-JSON + record-toString compare (its `compare` helper, :12-21).
  */
class AvroParitySpec extends AnyWordSpec with Matchers with SparkSpec {

  import AvroSql.implicits._
  implicit lazy val s: org.apache.spark.sql.SparkSession = spark

  private val ingredientSchema = SchemaBuilder.record("Ingredient")
    .namespace("fix").fields()
    .requiredString("name").requiredDouble("sugar").requiredDouble("fat")
    .endRecord()

  private val pizzaSchema = SchemaBuilder.record("Pizza").namespace("fix")
    .fields()
    .requiredString("name")
    .name("ingredients").`type`().array().items(ingredientSchema).noDefault()
    .requiredBoolean("vegetarian")
    .requiredLong("vegan")
    .requiredInt("calories")
    .endRecord()

  private def pizza() = {
    def ing(n: String, su: Double, f: Double) = {
      val r = new GenericData.Record(ingredientSchema)
      r.put("name", n); r.put("sugar", su); r.put("fat", f); r
    }
    val p = new GenericData.Record(pizzaSchema)
    p.put("name", "pepperoni")
    val arr = new java.util.ArrayList[Any]()
    arr.add(ing("pepperoni", 12.0, 4.4)); arr.add(ing("onions", 1.0, 0.4))
    p.put("ingredients", arr)
    p.put("vegetarian", false)
    p.put("vegan", 0L)
    p.put("calories", 98)
    p
  }

  private def fieldNames(r: org.apache.avro.generic.GenericRecord) =
    r.getSchema.getFields.asScala.map(_.name()).toSeq

  private def ingredients(r: org.apache.avro.generic.GenericRecord) =
    r.get("ingredients").asInstanceOf[java.util.Collection[Any]].asScala.toSeq
      .map(_.asInstanceOf[org.apache.avro.generic.GenericRecord])

  "withstructure parity at the Avro surface" should {

    "SELECT * — identity (ref :72)" in {
      val out = pizza().sql("SELECT * FROM topic withstructure")
      fieldNames(out) shouldBe
        Seq("name", "ingredients", "vegetarian", "vegan", "calories")
      out.toString shouldBe pizza().toString
    }

    "SELECT *, name as fieldName — renamed field lands AFTER the star remainder (ref :83-97)" in {
      val out = pizza().sql("SELECT *, name as fieldName FROM topic withstructure")
      fieldNames(out) shouldBe
        Seq("ingredients", "vegetarian", "vegan", "calories", "fieldName")
      out.get("fieldName").toString shouldBe "pepperoni"
    }

    "SELECT *, ingredients as stuff — rename a complex field (ref :99-113)" in {
      val out = pizza().sql("SELECT *, ingredients as stuff FROM topic withstructure")
      fieldNames(out) shouldBe
        Seq("name", "vegetarian", "vegan", "calories", "stuff")
      out.get("stuff").asInstanceOf[java.util.Collection[Any]] should have size 2
    }

    "SELECT name as fieldName, * — explicit first, star expands rest (ref :115)" in {
      val out = pizza().sql("SELECT name as fieldName, * FROM topic withstructure")
      fieldNames(out) shouldBe
        Seq("fieldName", "ingredients", "vegetarian", "vegan", "calories")
    }

    "SELECT vegan — single cherry-pick (ref :130)" in {
      val out = pizza().sql("SELECT vegan FROM topic withstructure")
      fieldNames(out) shouldBe Seq("vegan")
      out.get("vegan") shouldBe 0L
    }

    "SELECT ingredients.name — array element projection (ref :158)" in {
      val out = pizza().sql("SELECT ingredients.name FROM topic withstructure")
      fieldNames(out) shouldBe Seq("ingredients")
      val ings = ingredients(out)
      ings.map(fieldNames) shouldBe Seq(Seq("name"), Seq("name"))
      ings.map(_.get("name").toString) shouldBe Seq("pepperoni", "onions")
    }

    "SELECT ingredients.name as fieldName, ingredients.sugar as fieldSugar (ref :188)" in {
      val out = pizza().sql(
        "SELECT ingredients.name as fieldName, ingredients.sugar as fieldSugar FROM topic withstructure")
      val ings = ingredients(out)
      ings.head |> { i =>
        fieldNames(i) shouldBe Seq("fieldName", "fieldSugar")
        i.get("fieldName").toString shouldBe "pepperoni"
        i.get("fieldSugar") shouldBe 12.0
      }
    }

    "element star with renames before it (ref :204)" in {
      val out = pizza().sql(
        "SELECT ingredients.*, ingredients.name as fieldName, ingredients.sugar as fieldSugar FROM topic withstructure")
      fieldNames(ingredients(out).head) shouldBe Seq("fat", "fieldName", "fieldSugar")
    }

    "element star between renames (ref :218)" in {
      val out = pizza().sql(
        "SELECT ingredients.name as fieldName, ingredients.*, ingredients.sugar as fieldSugar FROM topic withstructure")
      fieldNames(ingredients(out).head) shouldBe Seq("fieldName", "fat", "fieldSugar")
    }

    "full interleaved query (ref :264)" in {
      val out = pizza().sql(
        "SELECT name, ingredients.name as fieldName, ingredients.sugar as fieldSugar, ingredients.*, calories as cals FROM topic withstructure")
      fieldNames(out) shouldBe Seq("name", "ingredients", "cals")
      fieldNames(ingredients(out).head) shouldBe Seq("fieldName", "fieldSugar", "fat")
      out.get("cals") shouldBe 98
    }
  }

  private implicit class Pipe[A](a: A) { def |>[B](f: A => B): B = f(a) }

  // --- flatten suite (reference AvroSqlTest.scala) -----------------------

  private val simpleAddressSchema = SchemaBuilder.record("SimpleAddress")
    .namespace("fix").fields()
    .requiredString("street").requiredString("city").requiredString("state")
    .requiredString("zip").requiredString("country")
    .endRecord()

  private def simpleAddress() = {
    val r = new GenericData.Record(simpleAddressSchema)
    r.put("street", "1911 Musselman"); r.put("city", "Altoona")
    r.put("state", "PA"); r.put("zip", "16601"); r.put("country", "US")
    r
  }

  "flatten parity at the Avro surface" should {

    "SELECT name, vegan, calories (ref :75)" in {
      val out = pizza().sql("SELECT name, vegan, calories")
      fieldNames(out) shouldBe Seq("name", "vegan", "calories")
      out.get("name").toString shouldBe "pepperoni"
      out.get("vegan") shouldBe 0L
      out.get("calories") shouldBe 98
    }

    "SELECT name as fieldName, vegan as V, calories as C (ref :90)" in {
      val out = pizza().sql("SELECT name as fieldName, vegan as V, calories as C")
      fieldNames(out) shouldBe Seq("fieldName", "V", "C")
    }

    "SELECT calories as C, vegan as V, name as fieldName — reorder (ref :105)" in {
      val out = pizza().sql("SELECT calories as C ,vegan as V ,name as fieldName FROM topic")
      fieldNames(out) shouldBe Seq("C", "V", "fieldName")
      out.get("C") shouldBe 98
    }

    "SELECT * FROM simpleAddress — identity (ref :251)" in {
      val out = simpleAddress().sql("SELECT * FROM simpleAddress")
      out.toString shouldBe simpleAddress().toString
    }

    "rename with order preserved (ref :262)" in {
      val out = simpleAddress().sql(
        "SELECT street as S, city, state, zip as Z, country as C FROM simpleAddress")
      fieldNames(out) shouldBe Seq("S", "city", "state", "Z", "C")
      out.get("S").toString shouldBe "1911 Musselman"
    }

    "SELECT zip as Z, * — explicit ahead of star (ref :277)" in {
      val out = simpleAddress().sql("SELECT zip as Z, * FROM simpleAddress")
      fieldNames(out) shouldBe Seq("Z", "street", "city", "state", "country")
    }

    "SELECT zip as Z, *, state as S — interleaved (ref :292)" in {
      val out = simpleAddress().sql("SELECT zip as Z, *, state as S FROM simpleAddress")
      fieldNames(out) shouldBe Seq("Z", "street", "city", "country", "S")
      out.get("S").toString shouldBe "PA"
    }
  }
}
