package graft.sources

import org.apache.spark.sql.Row
import org.apache.spark.sql.sources.In
import org.apache.spark.sql.types._
import org.scalatest.funsuite.AnyFunSuite
import org.scalatest.matchers.should.Matchers

/** Direct specs for the decode-time In compile paths: the all-string
  * hash-set fast path (one set probe per row, exact semantics) and the
  * numeric/mixed widening may-match path.
  */
class AvroFilterEvalSpec extends AnyFunSuite with Matchers {

  private val schema = StructType(Seq(
    StructField("s", StringType, nullable = true),
    StructField("i", IntegerType, nullable = true)))

  test("string In compiles to an exact hash-set probe (10k-value set)") {
    val vals: Array[Any] = (0 until 10000).map(i => s"v$i": Any).toArray
    val p = AvroFilterEval.build(schema, Array(In("s", vals)))
    p(Row("v0", 1)) shouldBe true
    p(Row("v9999", 1)) shouldBe true
    p(Row("nope", 1)) shouldBe false
    p(Row(null, 1)) shouldBe false
    // every set member hits regardless of list position — set semantics,
    // not first-match linear semantics
    (0 until 10000 by 97).foreach(i => p(Row(s"v$i", 0)) shouldBe true)
  }

  test("string In agrees with the linear reference predicate") {
    val vals: Array[Any] = Array("ab", "ba", "zz")
    val p = AvroFilterEval.build(schema, Array(In("s", vals)))
    val ref = (x: String) => x != null && vals.contains(x)
    for (x <- Seq("ab", "ba", "zz", "a", "", "miss", null))
      p(Row(x, 0)) shouldBe ref(x)
  }

  test("null values in the list are ignored; null cell never matches") {
    val p = AvroFilterEval.build(schema, Array(In("s", Array("a", null))))
    p(Row("a", 1)) shouldBe true
    p(Row("b", 1)) shouldBe false
    p(Row(null, 1)) shouldBe false
    // all-null list: nothing can match (both paths agree)
    val q = AvroFilterEval.build(schema, Array(In("s", Array(null))))
    q(Row("a", 1)) shouldBe false
    q(Row(null, 1)) shouldBe false
  }

  test("numeric and mixed In stay on the widening may-match path") {
    val p = AvroFilterEval.build(schema,
      Array(In("i", Array(1, 2L, 3.0))))
    p(Row("x", 2)) shouldBe true // Int cell vs Long literal: widened equal
    p(Row("x", 3)) shouldBe true // vs Double literal
    p(Row("x", 4)) shouldBe false
    p(Row("x", null)) shouldBe false
    // mixed string+numeric list must NOT take the set path: an Int cell
    // against a string literal is undecidable → may match (kept)
    val m = AvroFilterEval.build(schema, Array(In("i", Array("1", 5))))
    m(Row("x", 5)) shouldBe true
    m(Row("x", 7)) shouldBe true // undecidable vs "1" → sound keep
  }
}
