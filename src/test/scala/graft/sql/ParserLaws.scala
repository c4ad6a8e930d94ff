package graft.sql

import org.scalacheck.{Gen, Prop, Properties, Test}

/** Round-trip law for the select-list parser: any Field list we can
  * print as a query parses back to exactly that list (pure — no Spark).
  */
object ParserLaws extends Properties("ParserLaws") {

  override def overrideParameters(p: Test.Parameters): Test.Parameters =
    p.withMinSuccessfulTests(200)

  private val identGen: Gen[String] = for {
    h <- Gen.alphaChar
    t <- Gen.listOfN(5, Gen.alphaNumChar)
    s = (h :: t).mkString
    if !Set("select", "from", "as", "withstructure").contains(s.toLowerCase)
  } yield s

  private val fieldGen: Gen[Field] = for {
    parents <- Gen.chooseNum(0, 3).flatMap(n => Gen.listOfN(n, identGen))
    star <- Gen.prob(0.2)
    name <- if (star) Gen.const("*") else identGen
    aliased <- Gen.prob(0.5)
    alias <- if (star || !aliased) Gen.const(name) else identGen
  } yield Field(name, alias, parents)

  private def print(f: Field): String = {
    val path = (f.parents :+ f.name).mkString(".")
    if (f.isStar || f.alias == f.name) path else s"$path as ${f.alias}"
  }

  property("print-parse round trip") =
    Prop.forAll(Gen.nonEmptyListOf(fieldGen), Gen.prob(0.5), Gen.prob(0.5)) {
      (fields, withFrom, ws) =>
        val q = "SELECT " + fields.map(print).mkString(", ") +
          (if (withFrom) " FROM topic" else "") +
          (if (ws) " withstructure" else "")
        val parsed = SelectParser.parse(q)
        parsed.fields == fields && parsed.withStructure == ws &&
          parsed.from == (if (withFrom) Some("topic") else None)
    }

  property("garbage is rejected with IllegalArgumentException") =
    Prop.forAll(Gen.oneOf("", "SELEC name", "SELECT", "DROP TABLE t",
      "SELECT a b c", "SELECT a,, b")) { bad =>
      Prop.throws(classOf[IllegalArgumentException])(SelectParser.parse(bad))
    }
}
