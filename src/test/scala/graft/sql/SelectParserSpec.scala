package graft.sql

import org.scalatest.wordspec.AnyWordSpec
import org.scalatest.matchers.should.Matchers

class SelectParserSpec extends AnyWordSpec with Matchers {

  "SelectParser" should {
    "parse a bare star" in {
      SelectParser.parse("SELECT *") shouldBe
        SelectQuery(Seq(Field("*", "*", Nil)), None, withStructure = false)
    }

    "parse star with no space before FROM (reference test :79)" in {
      SelectParser.parse("SELECT *FROM topic withstructure") shouldBe
        SelectQuery(Seq(Field("*", "*", Nil)), Some("topic"), withStructure = true)
    }

    "parse plain fields and aliases" in {
      SelectParser.parse("SELECT name,vegan, calories as C") shouldBe
        SelectQuery(Seq(Field("name"), Field("vegan"),
          Field("calories", "C", Nil)), None, withStructure = false)
    }

    "parse dotted paths" in {
      SelectParser.parse("SELECT name, address.street.name as streetName") shouldBe
        SelectQuery(Seq(Field("name"),
          Field("name", "streetName", Seq("address", "street"))),
          None, withStructure = false)
    }

    "parse path-qualified stars" in {
      SelectParser.parse("SELECT name, address.street.*, address.street2.name") shouldBe
        SelectQuery(Seq(Field("name"),
          Field("*", "*", Seq("address", "street")),
          Field("name", "name", Seq("address", "street2"))),
          None, withStructure = false)
    }

    "detect the trailing withstructure keyword case-insensitively" in {
      SelectParser.parse("select vegan from topic WITHSTRUCTURE").withStructure shouldBe true
      SelectParser.parse("select vegan").withStructure shouldBe false
    }

    "parse FROM and keep it decorative" in {
      SelectParser.parse("SELECT * FROM simpleAddress").from shouldBe Some("simpleAddress")
      SelectParser.parse("SELECT *").from shouldBe None
    }

    "parse backtick-quoted identifiers" in {
      SelectParser.parse("SELECT `weird name`.`x` as `out col`") shouldBe
        SelectQuery(Seq(Field("x", "out col", Seq("weird name"))),
          None, withStructure = false)
    }

    "reject non-SELECT and malformed input" in {
      an[IllegalArgumentException] should be thrownBy SelectParser.parse("INSERT INTO t")
      an[IllegalArgumentException] should be thrownBy SelectParser.parse("SELECT")
      an[IllegalArgumentException] should be thrownBy SelectParser.parse("SELECT a,")
      an[IllegalArgumentException] should be thrownBy SelectParser.parse("")
      an[IllegalArgumentException] should be thrownBy SelectParser.parse(null)
    }

    "reject trailing garbage" in {
      an[IllegalArgumentException] should be thrownBy
        SelectParser.parse("SELECT a FROM t WHERE x = 1")
    }
  }
}
