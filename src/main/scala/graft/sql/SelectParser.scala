package graft.sql

import scala.util.parsing.combinator.RegexParsers

/** Parser for the projection dialect the reference exercises
  * (reference: AvroSql.scala:44-65 — Calcite MYSQL lex, case-insensitive,
  * with a hand-stripped trailing `withstructure` keyword).
  *
  * Grammar (case-insensitive keywords, `identifier` = bare or backtick-quoted):
  * {{{
  *   query  := SELECT item (',' item)* (FROM identifier)? (WITHSTRUCTURE)?
  *   item   := '*'
  *           | path '.' '*'
  *           | path (AS? identifier)?
  *   path   := identifier ('.' identifier)*
  * }}}
  *
  * Only the select list carries semantics — FROM is accepted and recorded but
  * never filters anything, matching the reference (tests pass `FROM topic` or
  * omit it interchangeably, AvroSqlTest.scala:258 vs 82). `SELECT *FROM t`
  * (no space) must parse (AvroSqlWithRetainStructureTest.scala:79).
  *
  * Any parse failure or non-SELECT input → IllegalArgumentException, matching
  * the reference's error contract (AvroSql.scala:58-63).
  */
object SelectParser extends RegexParsers {

  override def skipWhitespace = true

  private def kw(s: String): Parser[String] = ("(?i)" + s + "\\b").r ^^ (_ => s)

  private val bareIdent: Parser[String] = "[A-Za-z_][A-Za-z0-9_]*".r ^? (
    { case id if !reserved(id.toLowerCase) => id },
    id => s"reserved word '$id' cannot be used as an identifier"
  )
  private val quotedIdent: Parser[String] =
    "`" ~> "[^`]+".r <~ "`" | "\"" ~> "[^\"]+".r <~ "\""
  private val ident: Parser[String] = quotedIdent | bareIdent

  private val reserved = Set("select", "from", "as", "withstructure")

  private val path: Parser[List[String]] = rep1sep(ident, ".")

  private val star: Parser[Field] = "*" ^^ (_ => Field("*", "*", Nil))

  private val pathStar: Parser[Field] =
    path <~ "." <~ "*" ^^ (p => Field("*", "*", p))

  private val pathField: Parser[Field] =
    path ~ opt(opt(kw("as")) ~> ident) ^^ { case p ~ alias =>
      Field(p.last, alias.getOrElse(p.last), p.init)
    }

  private val item: Parser[Field] = pathStar | star | pathField

  private val query: Parser[SelectQuery] =
    kw("select") ~> rep1sep(item, ",") ~
      opt(kw("from") ~> ident) ~
      opt(kw("withstructure")) ^^ { case items ~ from ~ ws =>
      SelectQuery(items, from, ws.isDefined)
    }

  /** Parse or throw IllegalArgumentException (the reference's contract). */
  def parse(sql: String): SelectQuery = {
    require(sql != null && sql.trim.nonEmpty, "query cannot be null or empty")
    parseAll(query, sql) match {
      case Success(q, _) => q
      case failure: NoSuccess =>
        throw new IllegalArgumentException(
          s"Invalid query: ${failure.msg} in `$sql`")
    }
  }
}
