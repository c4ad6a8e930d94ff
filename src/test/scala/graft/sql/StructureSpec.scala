package graft.sql

import graft.SparkSpec
import graft.sql.GraftSql.implicits._
import org.apache.spark.sql.{DataFrame, Row}
import org.apache.spark.sql.types.{ArrayType, StructType, MapType}
import org.scalatest.matchers.should.Matchers
import org.scalatest.wordspec.AnyWordSpec

/** withstructure-mode parity suite — mirrors the reference behaviours in
  * AvroSqlWithRetainStructureTest.scala:23-291, re-expressed on DataFrames.
  */
class StructureSpec extends AnyWordSpec with Matchers with SparkSpec {
  import Fixtures._

  private def pizzaDf: DataFrame = {
    import spark.implicits._
    Seq(pepperoni).toDF()
  }

  private def ingredientFields(df: DataFrame, col: String): Seq[String] =
    df.schema(col).dataType.asInstanceOf[ArrayType]
      .elementType.asInstanceOf[StructType].fieldNames.toSeq

  "withstructure mode" should {
    "be the identity on 'SELECT *' (ref :72)" in {
      val out = pizzaDf.sql("SELECT *FROM topic withstructure")
      out.schema shouldBe pizzaDf.schema
      out.collect() shouldBe pizzaDf.collect()
    }

    "move an explicitly renamed field after the star (ref :83)" in {
      val out = pizzaDf.sql("SELECT *, name as fieldName FROM topic withstructure")
      out.columns.toSeq shouldBe Seq("ingredients", "vegetarian", "vegan", "calories", "fieldName")
      out.collect().head.toSeq shouldBe Seq(
        Seq(Row("pepperoni", 12.0, 4.4), Row("onions", 1.0, 0.4)),
        false, false, 98, "pepperoni")
    }

    "rename a complex (array) field 'ingredients as stuff' (ref :99)" in {
      val out = pizzaDf.sql("SELECT *, ingredients as stuff FROM topic withstructure")
      out.columns.toSeq shouldBe Seq("name", "vegetarian", "vegan", "calories", "stuff")
      ingredientFields(out, "stuff") shouldBe Seq("name", "sugar", "fat")
      out.collect().head.getSeq[Row](4) shouldBe
        Seq(Row("pepperoni", 12.0, 4.4), Row("onions", 1.0, 0.4))
    }

    "reorder via explicit-then-star (ref :115)" in {
      val out = pizzaDf.sql("SELECT name as fieldName, * FROM topic withstructure")
      out.columns.toSeq shouldBe Seq("fieldName", "ingredients", "vegetarian", "vegan", "calories")
      out.collect().head.getString(0) shouldBe "pepperoni"
    }

    "cherry-pick a single field 'SELECT vegan' (ref :130)" in {
      val out = pizzaDf.sql("SELECT vegan FROM topic withstructure")
      out.columns.toSeq shouldBe Seq("vegan")
      out.collect().head.toSeq shouldBe Seq(false)
    }

    "cherry-pick with rename 'SELECT vegan as veganA' (ref :144)" in {
      val out = pizzaDf.sql("SELECT vegan as veganA FROM topic withstructure")
      out.columns.toSeq shouldBe Seq("veganA")
      out.collect().head.toSeq shouldBe Seq(false)
    }

    "project inside array elements 'SELECT ingredients.name' (ref :158)" in {
      val out = pizzaDf.sql("SELECT ingredients.name FROM topic withstructure")
      out.columns.toSeq shouldBe Seq("ingredients")
      ingredientFields(out, "ingredients") shouldBe Seq("name")
      out.collect().head.getSeq[Row](0) shouldBe Seq(Row("pepperoni"), Row("onions"))
    }

    "project two fields inside array elements (ref :173)" in {
      val out = pizzaDf.sql("SELECT ingredients.name, ingredients.sugar FROM topic withstructure")
      ingredientFields(out, "ingredients") shouldBe Seq("name", "sugar")
      out.collect().head.getSeq[Row](0) shouldBe
        Seq(Row("pepperoni", 12.0), Row("onions", 1.0))
    }

    "rename fields inside array elements (ref :188)" in {
      val out = pizzaDf.sql(
        "SELECT ingredients.name as fieldName, ingredients.sugar as fieldSugar FROM topic withstructure")
      ingredientFields(out, "ingredients") shouldBe Seq("fieldName", "fieldSugar")
      out.collect().head.getSeq[Row](0) shouldBe
        Seq(Row("pepperoni", 12.0), Row("onions", 1.0))
    }

    "expand element-level star before renamed fields (ref :204)" in {
      val out = pizzaDf.sql(
        "SELECT ingredients.*,ingredients.name as fieldName, ingredients.sugar as fieldSugar FROM topic withstructure")
      ingredientFields(out, "ingredients") shouldBe Seq("fat", "fieldName", "fieldSugar")
      out.collect().head.getSeq[Row](0) shouldBe
        Seq(Row(4.4, "pepperoni", 12.0), Row(0.4, "onions", 1.0))
    }

    "expand element-level star between renamed fields (ref :218)" in {
      val out = pizzaDf.sql(
        "SELECT ingredients.name as fieldName,ingredients.*, ingredients.sugar as fieldSugar FROM topic withstructure")
      ingredientFields(out, "ingredients") shouldBe Seq("fieldName", "fat", "fieldSugar")
      out.collect().head.getSeq[Row](0) shouldBe
        Seq(Row("pepperoni", 4.4, 12.0), Row("onions", 0.4, 1.0))
    }

    "expand element-level star after renamed fields (ref :233)" in {
      val out = pizzaDf.sql(
        "SELECT ingredients.name as fieldName, ingredients.sugar as fieldSugar, ingredients.* FROM topic withstructure")
      ingredientFields(out, "ingredients") shouldBe Seq("fieldName", "fieldSugar", "fat")
      out.collect().head.getSeq[Row](0) shouldBe
        Seq(Row("pepperoni", 12.0, 4.4), Row("onions", 1.0, 0.4))
    }

    "drop unmentioned top-level fields when a selection exists (ref :249)" in {
      val out = pizzaDf.sql(
        "SELECT name, ingredients.name as fieldName, ingredients.sugar as fieldSugar, ingredients.* FROM topic withstructure")
      out.columns.toSeq shouldBe Seq("name", "ingredients")
      ingredientFields(out, "ingredients") shouldBe Seq("fieldName", "fieldSugar", "fat")
    }

    "order top-level fields by first mention (ref :264)" in {
      val out = pizzaDf.sql(
        "SELECT name, ingredients.name as fieldName, ingredients.sugar as fieldSugar, ingredients.*, calories as cals FROM topic withstructure")
      out.columns.toSeq shouldBe Seq("name", "ingredients", "cals")
      out.collect().head.toSeq shouldBe Seq("pepperoni",
        Seq(Row("pepperoni", 12.0, 4.4), Row("onions", 1.0, 0.4)), 98)
    }

    "pin the traversed segment at its first mention even with interleaved fields (ref :278)" in {
      val out = pizzaDf.sql(
        "SELECT name, ingredients.name as fieldName, calories as cals, ingredients.sugar as fieldSugar, ingredients.* FROM topic withstructure")
      out.columns.toSeq shouldBe Seq("name", "ingredients", "cals")
      out.collect().head.toSeq shouldBe Seq("pepperoni",
        Seq(Row("pepperoni", 12.0, 4.4), Row("onions", 1.0, 0.4)), 98)
    }

    "null-safe rebuild of a nullable nested struct" in {
      import spark.implicits._
      val df = Seq(Outer(1, Some(Inner(7))), Outer(2, None)).toDF()
      val out = df.sql("SELECT id, inner.n FROM t withstructure")
      out.columns.toSeq shouldBe Seq("id", "inner")
      out.collect().map(_.toSeq).toSeq shouldBe
        Seq(Seq(1, Row(7)), Seq(2, null))
    }

    "cherry-pick and rename map keys (O11, ref AvroSql.scala:246-278)" in {
      import spark.implicits._
      val df = Seq(
        MapHolder(1, Map("a" -> TagVal(1, "x"), "b" -> TagVal(2, "y")))).toDF()
      val out = df.sql("SELECT id, tags.a as A FROM t withstructure")
      out.columns.toSeq shouldBe Seq("id", "tags")
      out.schema("tags").dataType shouldBe a[MapType]
      out.collect().head.getMap[String, Row](1).toMap shouldBe
        Map("A" -> Row(1, "x"))
    }

    "keep all map keys with star" in {
      import spark.implicits._
      val df = Seq(
        MapHolder(1, Map("a" -> TagVal(1, "x"), "b" -> TagVal(2, "y")))).toDF()
      val out = df.sql("SELECT id, tags.* FROM t withstructure")
      out.collect().head.getMap[String, Row](1).toMap shouldBe
        Map("a" -> Row(1, "x"), "b" -> Row(2, "y"))
    }

    "project inside a map value reached by key (deep path)" in {
      import spark.implicits._
      val df = Seq(
        MapHolder(1, Map("a" -> TagVal(1, "x"), "b" -> TagVal(2, "y")))).toDF()
      val out = df.sql("SELECT id, tags.a.b FROM t withstructure")
      out.collect().head.getMap[String, Row](1).toMap shouldBe
        Map("a" -> Row("x"))
    }
  }
}
