package graft.sql

import graft.SparkSpec
import graft.sql.GraftSql.implicits._
import org.apache.spark.sql.DataFrame
import org.scalatest.matchers.should.Matchers
import org.scalatest.wordspec.AnyWordSpec

/** Flatten-mode parity suite — each case mirrors one reference behaviour
  * (AvroSqlTest.scala:26-306), re-expressed against DataFrames.
  */
class FlattenSpec extends AnyWordSpec with Matchers with SparkSpec {
  import Fixtures._

  private def pizzaDf: DataFrame = {
    import spark.implicits._
    Seq(pepperoni).toDF()
  }
  private def personDf: DataFrame = {
    import spark.implicits._
    Seq(rick).toDF()
  }
  private def addrDf: DataFrame = {
    import spark.implicits._
    Seq(simpleAddress).toDF()
  }

  private def check(df: DataFrame, cols: Seq[String], rows: Seq[Seq[Any]]): Unit = {
    df.columns.toSeq shouldBe cols
    df.collect().map(_.toSeq.map {
      case s: Seq[_] => s
      case x => x
    }).toSeq shouldBe rows
  }

  "flatten mode" should {
    "handle 'SELECT name,vegan, calories' (ref :75)" in {
      check(pizzaDf.sql("SELECT name,vegan, calories"),
        Seq("name", "vegan", "calories"),
        Seq(Seq("pepperoni", false, 98)))
    }

    "handle aliases 'SELECT name as fieldName,vegan as V, calories as C' (ref :90)" in {
      check(pizzaDf.sql("SELECT name as fieldName,vegan as V, calories as C"),
        Seq("fieldName", "V", "C"),
        Seq(Seq("pepperoni", false, 98)))
    }

    "handle reordering 'SELECT calories as C,vegan as V,name as fieldName' (ref :105)" in {
      check(pizzaDf.sql("SELECT  calories as C,vegan as V,name as fieldName"),
        Seq("C", "V", "fieldName"),
        Seq(Seq(98, false, "pepperoni")))
    }

    "throw when star expansion pulls in an array (ref :120)" in {
      an[IllegalArgumentException] should be thrownBy
        pizzaDf.sql("SELECT *, name as fieldName")
    }

    "suffix colliding names _1 'SELECT name, address.street.name' (ref :132)" in {
      check(personDf.sql("SELECT name, address.street.name"),
        Seq("name", "name_1"),
        Seq(Seq("Rick", "Rock St")))
    }

    "handle nested alias 'SELECT name, address.street.name as streetName' (ref :146)" in {
      check(personDf.sql("SELECT name, address.street.name as streetName"),
        Seq("name", "streetName"),
        Seq(Seq("Rick", "Rock St")))
    }

    "null-safe navigate nullable parents (ref :160)" in {
      val out = personDf.sql(
        "SELECT name, address.street.name as streetName, address.street2.name as streetName2")
      check(out, Seq("name", "streetName", "streetName2"),
        Seq(Seq("Rick", "Rock St", null)))
      out.schema("streetName2").nullable shouldBe true
    }

    "expand a path-qualified star 'address.street.*' (ref :174)" in {
      check(personDf.sql(
        "SELECT name, address.street.*, address.street2.name as streetName2"),
        Seq("name", "name_1", "streetName2"),
        Seq(Seq("Rick", "Rock St", null)))
    }

    "expand two stars with _N suffixes (ref :188)" in {
      check(personDf.sql("SELECT name, address.street.*, address.street2.*"),
        Seq("name", "name_1", "name_2"),
        Seq(Seq("Rick", "Rock St", null)))
    }

    "keep select-list order for nested paths (ref :210)" in {
      check(personDf.sql("SELECT address.state, address.city,name, address.street.name"),
        Seq("state", "city", "name", "name_1"),
        Seq(Seq("CA", "MtV", "Rick", "Rock St")))
    }

    "keep select-list order with aliases (ref :224)" in {
      check(personDf.sql("SELECT address.state as S, address.city as C,name, address.street.name"),
        Seq("S", "C", "name", "name_1"),
        Seq(Seq("CA", "MtV", "Rick", "Rock St")))
    }

    "throw on a missing field (ref :238)" in {
      an[IllegalArgumentException] should be thrownBy
        personDf.sql("SELECT address.bam, address.city,name, address.street.name")
    }

    "be the identity on 'SELECT * FROM simpleAddress' (ref :251)" in {
      val out = addrDf.sql("SELECT * FROM simpleAddress")
      out.schema shouldBe addrDf.schema
      out.collect() shouldBe addrDf.collect()
    }

    "rename with order preserved (ref :262)" in {
      check(addrDf.sql("SELECT street as S, city, state, zip as Z, country as C  FROM simpleAddress"),
        Seq("S", "city", "state", "Z", "C"),
        Seq(Seq("Rock St", "MtV", "CA", "94041", "USA")))
    }

    "move an explicitly selected field ahead of star expansion (ref :277)" in {
      check(addrDf.sql("SELECT zip as Z, * FROM simpleAddress"),
        Seq("Z", "street", "city", "state", "country"),
        Seq(Seq("94041", "Rock St", "MtV", "CA", "USA")))
    }

    "interleave explicit fields around the star (ref :292)" in {
      check(addrDf.sql("SELECT zip as Z, *, state as S FROM simpleAddress"),
        Seq("Z", "street", "city", "country", "S"),
        Seq(Seq("94041", "Rock St", "MtV", "USA", "CA")))
    }

    "reject duplicate unaliased selection of the same field (ref AvroSchemaSql.scala:145)" in {
      an[IllegalArgumentException] should be thrownBy
        addrDf.sql("SELECT city, city")
    }

    "propagate nullability through a nullable parent (ref AvroSchemaSql.scala:361)" in {
      import spark.implicits._
      // a non-nullable int reached through an optional struct
      val df = Seq(Outer(1, Some(Inner(7))), Outer(2, None)).toDF()
      val out = df.sql("SELECT id, inner.n as nn")
      out.schema("nn").nullable shouldBe true
      check(out, Seq("id", "nn"), Seq(Seq(1, 7), Seq(2, null)))
    }
  }
}
