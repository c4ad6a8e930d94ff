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
  * Trailing WHERE / GROUP BY / HAVING / ORDER BY / LIMIT clauses are
  * ACCEPTED AND IGNORED: the reference parses with full Calcite and then
  * reads only the select list (AvroSql.scala:75,79 — `Field.from(select)`),
  * so a Kafka-Connect user's `SELECT a FROM t WHERE x > 1` projects and
  * silently drops the filter. We parse-and-discard the tail (everything up
  * to the optional terminal `withstructure`) rather than re-implementing
  * Calcite's clause grammar — same observable behavior for any query the
  * reference accepts.
  *
  * Identifiers are capped at 250 chars, the reference's configured Calcite
  * limit (AvroSql.scala:49 `setIdentifierMaxLength(250)`).
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
  // 250 = the reference's Calcite identifier cap (AvroSql.scala:49)
  private val ident: Parser[String] = (quotedIdent | bareIdent) ^? (
    { case id if id.length <= 250 => id },
    id => s"identifier exceeds the 250-character limit: '${id.take(40)}…'"
  )

  // clause keywords are reserved like Calcite's MYSQL lex does — an
  // unquoted `where`/`limit`/… can never be captured as an alias, so the
  // discarded-tail grammar below stays unambiguous
  private val reserved = Set("select", "from", "as", "withstructure",
    "where", "group", "having", "order", "limit")

  private val path: Parser[List[String]] = rep1sep(ident, ".")

  private val star: Parser[Field] = "*" ^^ (_ => Field("*", "*", Nil))

  private val pathStar: Parser[Field] =
    path <~ "." <~ "*" ^^ (p => Field("*", "*", p))

  private val pathField: Parser[Field] =
    path ~ opt(opt(kw("as")) ~> ident) ^^ { case p ~ alias =>
      Field(p.last, alias.getOrElse(p.last), p.init)
    }

  private val item: Parser[Field] = pathStar | star | pathField

  // discarded clause tail (WHERE/GROUP BY/HAVING/ORDER BY/LIMIT …): any
  // token run up to — but never including — the terminal `withstructure`
  private val tailTok: Parser[String] = "(?i)(?!withstructure\\b)\\S+".r
  private val ignoredTail: Parser[Unit] =
    (kw("where") | kw("group") | kw("having") | kw("order") |
      kw("limit")) ~ rep(tailTok) ^^ (_ => ())

  private val query: Parser[SelectQuery] =
    kw("select") ~> rep1sep(item, ",") ~
      opt(kw("from") ~> ident) ~
      opt(ignoredTail) ~
      opt(kw("withstructure")) ^^ { case items ~ from ~ _ ~ ws =>
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
