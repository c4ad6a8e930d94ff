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

    "accept and ignore WHERE / ORDER BY / LIMIT tails (reference reads only the select list)" in {
      SelectParser.parse("SELECT a, b FROM t WHERE x > 1") shouldBe
        SelectQuery(Seq(Field("a"), Field("b")), Some("t"),
          withStructure = false)
      SelectParser.parse("SELECT a FROM t ORDER BY a DESC LIMIT 10") shouldBe
        SelectQuery(Seq(Field("a")), Some("t"), withStructure = false)
      SelectParser.parse(
        "SELECT a FROM t GROUP BY a HAVING count(x) > 2") shouldBe
        SelectQuery(Seq(Field("a")), Some("t"), withStructure = false)
      // the tail never swallows the terminal withstructure marker
      SelectParser.parse("SELECT a FROM t WHERE x = 1 withstructure") shouldBe
        SelectQuery(Seq(Field("a")), Some("t"), withStructure = true)
    }

    "still reject trailing garbage that is no known clause" in {
      an[IllegalArgumentException] should be thrownBy
        SelectParser.parse("SELECT a FROM t bogus trailing words")
    }

    "reject clause keywords as bare aliases" in {
      an[IllegalArgumentException] should be thrownBy
        SelectParser.parse("SELECT a AS where")
    }

    "enforce the 250-char identifier cap (reference AvroSql.scala:49)" in {
      val ok = "a" * 250
      SelectParser.parse(s"SELECT $ok").fields.head.name shouldBe ok
      an[IllegalArgumentException] should be thrownBy
        SelectParser.parse("SELECT " + "a" * 251)
      an[IllegalArgumentException] should be thrownBy
        SelectParser.parse("SELECT `" + "a" * 251 + "`")
    }
  }
}
