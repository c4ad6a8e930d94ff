package graft

import org.scalatest.funsuite.AnyFunSuite
import org.scalatest.matchers.should.Matchers

/** Driver-contract guards: every gate has exactly one definition and one
  * oracle. A duplicated name across catalogs would silently shadow a gate
  * in `toMap`; a queries/oracles key mismatch would demote a gate to the
  * driver's weaker rows-only check without anything failing locally.
  */
class SparkEntrySpec extends AnyFunSuite with Matchers {

  test("gate names are unique across catalogs (no silent shadowing)") {
    val all = SparkEntry.allQueryNames
    val dups = all.groupBy(identity).collect { case (n, g) if g.size > 1 => n }
    dups shouldBe empty
    all.size shouldBe SparkEntry.queries.size
  }

  test("oracle names are unique across catalogs (no wrong-oracle pairing)") {
    val all = SparkEntry.allOracleNames
    val dups = all.groupBy(identity).collect { case (n, g) if g.size > 1 => n }
    dups shouldBe empty
    all.size shouldBe SparkEntry.oracleSql.size
  }

  test("every query has an oracle and every oracle has a query") {
    SparkEntry.queries.keySet shouldBe SparkEntry.oracleSql.keySet
  }

  test("no oracle references a table the testdata does not ship") {
    val tables = Set("region", "nation", "customer", "supplier", "part",
      "orders", "lineitem", "events", "documents", "embeddings")
    SparkEntry.oracleSql.foreach { case (name, sql) =>
      // capture the whole relation list after FROM/JOIN up to the next
      // clause keyword, then take the first word of each comma-separated
      // relation — `FROM top t, total` checks BOTH top and total.
      // (House style: comma-relations only directly after FROM; elsewhere
      // spell CROSS JOIN so this guard sees the reference.)
      val seg = ("(?is)\\b(?:FROM|JOIN)\\s+([^()]*?)(?=\\bWHERE\\b|" +
        "\\bGROUP\\b|\\bORDER\\b|\\bJOIN\\b|\\bON\\b|\\bUSING\\b|" +
        "\\bLIMIT\\b|$)").r
      val segFroms = seg.findAllMatchIn(sql)
        .flatMap(_.group(1).split(',').iterator.map(_.trim)
          .filter(_.nonEmpty).map(_.split("\\s+").head.toLowerCase))
        .filter(_.matches("[a-z_][a-z_0-9]*")).toSet
      // the segment regex cannot see INSIDE parenthesized derived tables
      // (`FROM (SELECT ... FROM documnets)` — [^()] stops at the paren and
      // the inner ref's terminator is `)`, not a clause keyword). A second
      // paren-blind scan takes the single word right after each FROM/JOIN
      // anywhere in the string; the union covers both shapes. (Would
      // false-positive on `extract(x FROM col)` syntax — house style bans
      // it; use epoch()/date_part() instead.)
      val bareFroms =
        "(?is)\\b(?:FROM|JOIN)\\s+([a-zA-Z_][a-zA-Z_0-9]*)".r
          .findAllMatchIn(sql).map(_.group(1).toLowerCase).toSet
      val froms = segFroms ++ bareFroms
      // CTE names: `name AS (` — anything FROM/JOIN-referenced that is
      // neither a CTE nor a known table is a typo the driver hits first
      // optional (col, ...) list covers recursive-CTE declarations
      val ctes =
        "(?i)([a-zA-Z_][a-zA-Z_0-9]*)\\s*(?:\\([^)]*\\))?\\s+AS\\s*\\(".r
        .findAllMatchIn(sql).map(_.group(1).toLowerCase).toSet
      val unknown = froms.filterNot(t => tables(t) || ctes(t))
      withClue(s"$name: $unknown") { unknown shouldBe empty }
    }
  }
}
