package graft.sources

import java.math.{BigDecimal => JBigDecimal}

import org.apache.spark.sql.Row
import org.apache.spark.sql.sources._
import org.apache.spark.sql.types.StructType

/** Decode-time filter evaluation for the graft-avro source
  * (`SupportsPushDownFilters`). A row-oriented container has no column
  * statistics, so "pushdown" here means: evaluate the predicate on the
  * decoded external Row and skip the Catalyst serialization (the
  * expensive half of the read path) for rows that cannot match. Spark
  * ALWAYS re-evaluates the full predicate post-scan — `pushFilters`
  * returns every filter as residual — so this layer only needs to be
  * sound in one direction: never drop a row the query keeps.
  *
  * Soundness rules:
  *  - `Not` and unknown Filter nodes are rejected at acceptance time
  *    (a may-match over-approximation does not survive negation);
  *    nested struct paths ARE supported, navigated null-safely like
  *    Catalyst's GetStructField;
  *  - with no `Not`, evaluating leaf comparisons as SQL does at the top
  *    of a WHERE (null operand → false) and composing And/Or
  *    monotonically reproduces Catalyst's Filter result exactly;
  *  - any comparison the evaluator cannot decide confidently (type
  *    mismatch it does not understand) answers "may match" (true).
  */
private[sources] object AvroFilterEval {

  /** Can `f` be evaluated at decode time? Attributes must resolve in
    * the table schema — top-level fields or dotted struct paths — and
    * only null-intolerant node shapes are allowed.
    */
  def accepts(full: StructType, f: Filter): Boolean = f match {
    case And(l, r) => accepts(full, l) && accepts(full, r)
    case Or(l, r)  => accepts(full, l) && accepts(full, r)
    case EqualTo(a, _)            => topLevel(full, a)
    case EqualNullSafe(a, _)      => topLevel(full, a)
    case GreaterThan(a, _)        => topLevel(full, a)
    case GreaterThanOrEqual(a, _) => topLevel(full, a)
    case LessThan(a, _)           => topLevel(full, a)
    case LessThanOrEqual(a, _)    => topLevel(full, a)
    case In(a, _)                 => topLevel(full, a)
    case IsNull(a)                => topLevel(full, a)
    case IsNotNull(a)             => topLevel(full, a)
    case StringStartsWith(a, _)   => topLevel(full, a)
    case StringEndsWith(a, _)     => topLevel(full, a)
    case StringContains(a, _)     => topLevel(full, a)
    case _ => false // Not, AlwaysTrue/False, nested V2 predicates, …
  }

  private def topLevel(full: StructType, attr: String): Boolean =
    pathOf(full, attr).isDefined

  /** May a file whose `col` values (non-null) all lie in [mn, mx] contain
    * a row matching `f`? Zone-map file pruning — the over-approximation
    * must be sound in one direction only (never prune a file with a
    * matching row), so every undecidable comparison, filter over another
    * column, or unknown node answers true. Note the zone covers only
    * non-null values and a verified-sorted file stores nulls FIRST, so
    * IsNull must always may-match.
    */
  def zoneMayMatch(col: String, mn: Any, mx: Any, f: Filter): Boolean = {
    // cmp undecidable → treat the bound as unknown → may match
    def le(a: Any, b: Any) = cmp(a, b).forall(_ <= 0)
    def lt(a: Any, b: Any) = cmp(a, b).forall(_ < 0)
    def inRange(v: Any) = v == null || (le(mn, v) && le(v, mx))
    f match {
      case And(l, r) => zoneMayMatch(col, mn, mx, l) && zoneMayMatch(col, mn, mx, r)
      case Or(l, r)  => zoneMayMatch(col, mn, mx, l) || zoneMayMatch(col, mn, mx, r)
      case EqualTo(a, v) if a == col        => inRange(v)
      case EqualNullSafe(a, v) if a == col  => inRange(v)
      case GreaterThan(a, v) if a == col    => cmp(mx, v).forall(_ > 0)
      case GreaterThanOrEqual(a, v) if a == col => cmp(mx, v).forall(_ >= 0)
      case LessThan(a, v) if a == col       => lt(mn, v)
      case LessThanOrEqual(a, v) if a == col => le(mn, v)
      case In(a, vs) if a == col            => vs.isEmpty || vs.exists(inRange)
      case StringStartsWith(a, p) if a == col =>
        // matching strings lie in [p, pNext) where pNext bumps p's last
        // char; the upper bound stays OPEN (true) whenever the bump is
        // not a provable +1 code-point step: empty/maxed prefixes, any
        // trailing surrogate (a high surrogate's pair completes to
        // >= U+10000 above the bump; bumping away a LOW surrogate
        // orphans the preceding high one), and 0xD7FF (whose successor
        // 0xD800 is itself a lone surrogate — UTF8String renders lone
        // surrogates as '?', which would collapse the bound BELOW p and
        // wrongly prune files holding matches).
        val lower = cmp(mx, p).forall(_ >= 0)
        val bumpable = p.nonEmpty && (p.last < 0xD7FF ||
          (p.last >= 0xE000 && p.last < Char.MaxValue))
        val upper = !bumpable || lt(mn, p.init + (p.last + 1).toChar)
        lower && upper
      case _ => true // IsNull (nulls sort first, outside the zone),
                     // IsNotNull (zone exists ⇒ non-nulls exist), other
                     // columns, contains/endsWith, unknown nodes
    }
  }

  /** Tri-state FILE decision for full filter pushdown: Some(true) =
    * EVERY row of the file matches `f`, Some(false) = NO row matches,
    * None = undecided. `boundsOf(col)` yields the file's exact-ordered
    * [mn, mx] over ALL rows of that column; the CALLER guarantees the
    * column holds no nulls in this file (non-nullable schema field, or
    * a partition-path point value, which is constant by construction) —
    * columns without that guarantee must answer None.
    *
    * Sound under WIDENED bounds (truncated string zones record
    * mn' <= true-min and mx' >= true-max): every all-match rule below
    * derives "true-min/max clears v" from the recorded bound on the
    * conservative side (mn' > v ⇒ true-min > v; mx' < v ⇒ true-max < v;
    * mn' = mx' = v pinches every value to v), and every none-match rule
    * is ordinary zone pruning. Undecidable comparisons (cmp = None)
    * answer None.
    */
  def zoneDecides(boundsOf: String => Option[(Any, Any)], f: Filter,
      nullStateOf: String => Option[(Boolean, Boolean)] = _ => None)
      : Option[Boolean] = {
    // lower-bound decision: `all` answers from cmp(mn, v), `none` from
    // cmp(mx, v) (GreaterThan shapes); `hi = true` swaps the roles
    // (LessThan shapes answer `all` from the max bound)
    def range(a: String, v: Any, hi: Boolean)(
        all: Int => Boolean, none: Int => Boolean): Option[Boolean] =
      if (v == null) None
      else boundsOf(a).flatMap { case (mn, mx) =>
        val (cAll, cNone) =
          if (hi) (cmp(mx, v), cmp(mn, v)) else (cmp(mn, v), cmp(mx, v))
        if (cAll.exists(all)) Some(true)
        else if (cNone.exists(none)) Some(false)
        else None
      }
    // EqualTo: all iff both bounds pin v; none iff v surely outside
    def point(a: String, v: Any): Option[Boolean] =
      if (v == null) None
      else boundsOf(a).flatMap { case (mn, mx) =>
        (cmp(mn, v), cmp(mx, v)) match {
          case (Some(c1), Some(c2)) =>
            if (c1 == 0 && c2 == 0) Some(true)
            else if (c1 > 0 || c2 < 0) Some(false)
            else None
          case (Some(c1), _) if c1 > 0 => Some(false)
          case (_, Some(c2)) if c2 < 0 => Some(false)
          case _ => None
        }
      }
    def d(f: Filter): Option[Boolean] = f match {
      case And(l, r) => (d(l), d(r)) match {
        case (Some(false), _) | (_, Some(false)) => Some(false)
        case (Some(true), x) => x
        case (x, Some(true)) => x
        case _ => None
      }
      case Or(l, r) => (d(l), d(r)) match {
        case (Some(true), _) | (_, Some(true)) => Some(true)
        case (Some(false), x) => x
        case (x, Some(false)) => x
        case _ => None
      }
      case EqualTo(a, v)       => point(a, v)
      case EqualNullSafe(a, v) =>
        if (v == null) nullStateOf(a) match {
          // <=> NULL matches exactly the null rows
          case Some((noNulls, allNulls)) =>
            if (allNulls) Some(true)
            else if (noNulls) Some(false)
            else None
          // bounds presence still implies the no-null guarantee
          case None => boundsOf(a).map(_ => false)
        } else point(a, v)
      case GreaterThan(a, v) =>
        range(a, v, hi = false)(all = _ > 0, none = _ <= 0)
      case GreaterThanOrEqual(a, v) =>
        range(a, v, hi = false)(all = _ >= 0, none = _ < 0)
      case LessThan(a, v) =>
        range(a, v, hi = true)(all = _ < 0, none = _ >= 0)
      case LessThanOrEqual(a, v) =>
        range(a, v, hi = true)(all = _ <= 0, none = _ > 0)
      case In(a, vs0) =>
        val vs = Option(vs0).map(_.filter(_ != null)).getOrElse(Array.empty[Any])
        if (vs.isEmpty) boundsOf(a).map(_ => false)
        else boundsOf(a).flatMap { case (mn, mx) =>
          // all: the file is a single point and some value hits it
          if (cmp(mn, mx).contains(0) && vs.exists(v => cmp(v, mn).contains(0)))
            Some(true)
          // none: every value lies surely outside [mn, mx]
          else if (vs.forall(v => cmp(v, mn).exists(_ < 0) ||
                                  cmp(v, mx).exists(_ > 0)))
            Some(false)
          else None
        }
      case IsNotNull(a) => nullStateOf(a) match {
        case Some((noNulls, allNulls)) =>
          if (noNulls) Some(true)
          else if (allNulls) Some(false)
          else None
        case None => boundsOf(a).map(_ => true) // no-null guarantee
      }
      case IsNull(a) => nullStateOf(a) match {
        case Some((noNulls, allNulls)) =>
          if (allNulls) Some(true)
          else if (noNulls) Some(false)
          else None
        case None => boundsOf(a).map(_ => false)
      }
      case _ => None // Not, string matchers, unknown nodes: undecided
    }
    d(f)
  }

  /** The data type `attr` resolves to under the same resolution rule as
    * [[pathOf]] — exact top-level name first, then a dotted struct walk.
    * Shared with the all-column zone manifest (write AND read side must
    * agree on the leaf a dotted name denotes).
    */
  private[sources] def leafType(schema: StructType, attr: String)
      : Option[org.apache.spark.sql.types.DataType] =
    pathOf(schema, attr).map { path =>
      path.foldLeft(schema: org.apache.spark.sql.types.DataType) {
        case (st: StructType, i) => st.fields(i).dataType
        case (other, _) => other // unreachable: pathOf walks structs only
      }
    }

  /** Resolve `attr` to a field-index path: an exact top-level name wins
    * (a column literally named "a.b"), else a dotted walk through
    * nested structs. None if it does not resolve (filter not accepted).
    */
  private def pathOf(schema: StructType, attr: String): Option[List[Int]] = {
    if (schema.fieldNames.contains(attr))
      return Some(List(schema.fieldIndex(attr)))
    if (!attr.contains('.') || attr.contains('`')) return None
    var cur: org.apache.spark.sql.types.DataType = schema
    val out = List.newBuilder[Int]
    for (seg <- attr.split('.')) cur match {
      case st: StructType if st.fieldNames.contains(seg) =>
        val i = st.fieldIndex(seg)
        out += i
        cur = st.fields(i).dataType
      case _ => return None
    }
    Some(out.result())
  }

  /** Compile accepted filters into one Row predicate (conjunction).
    * `schema` is the read schema the decoded Row conforms to — Spark
    * includes every filter-referenced column in it because all filters
    * are reported residual.
    */
  def build(schema: StructType, filters: Array[Filter]): Row => Boolean = {
    val preds = filters.map(compile(schema, _))
    row => preds.forall(p => p(row))
  }

  private def compile(schema: StructType, f: Filter): Row => Boolean = f match {
    case And(l, r) =>
      val (pl, pr) = (compile(schema, l), compile(schema, r))
      row => pl(row) && pr(row)
    case Or(l, r) =>
      val (pl, pr) = (compile(schema, l), compile(schema, r))
      row => pl(row) || pr(row)
    case IsNull(a)    => at(schema, a)(_ == null)
    case IsNotNull(a) => at(schema, a)(_ != null)
    case EqualTo(a, v)       => at(schema, a)(x => x != null && eq0(x, v))
    case EqualNullSafe(a, v) =>
      at(schema, a)(x => if (x == null || v == null) x == null && v == null
                         else eq0(x, v))
    case In(a, vs) =>
      // All-string value lists compile to ONE hash-set probe per row
      // (dictionary-style pushdown) — exact semantics, since string
      // equality needs no numeric widening. Anything else (numeric,
      // date, mixed) stays on the linear may-match path where eq0's
      // BigDecimal widening and undecidable→true soundness live.
      val strs = vs.filter(_ != null)
      if (strs.nonEmpty && strs.forall(_.isInstanceOf[String])) {
        val set = new java.util.HashSet[String](strs.length * 2)
        strs.foreach(v => set.add(v.asInstanceOf[String]))
        at(schema, a) {
          case s: String => set.contains(s)
          case null      => false
          case _         => true // non-string decoded value: may match
        }
      } else
        at(schema, a)(x => x != null && vs.exists(v => v != null && eq0(x, v)))
    case GreaterThan(a, v)        => cmpAt(schema, a, v)(_ > 0)
    case GreaterThanOrEqual(a, v) => cmpAt(schema, a, v)(_ >= 0)
    case LessThan(a, v)           => cmpAt(schema, a, v)(_ < 0)
    case LessThanOrEqual(a, v)    => cmpAt(schema, a, v)(_ <= 0)
    case StringStartsWith(a, p) => str(schema, a)(_.startsWith(p))
    case StringEndsWith(a, p)   => str(schema, a)(_.endsWith(p))
    case StringContains(a, p)   => str(schema, a)(_.contains(p))
    case _ => _ => true // unreachable if accepts() gated; keep = sound
  }

  /** Accessor for `attr` in rows of `schema`; nested paths navigate
    * null-safely (null parent → null value, Catalyst GetStructField
    * semantics).
    */
  private def at(schema: StructType, attr: String)(p: Any => Boolean): Row => Boolean =
    pathOf(schema, attr) match {
      case Some(i :: Nil) => row => p(row.get(i))
      case Some(path) => row => {
        var v: Any = row
        for (i <- path) v = v match {
          case null => null
          case r: Row => r.get(i)
          case _ => null // schema mismatch: treat as null → may not match
        }
        p(v)
      }
      case None => _ => true // unresolvable (shouldn't pass accepts): keep
    }

  private def str(schema: StructType, attr: String)(p: String => Boolean): Row => Boolean =
    at(schema, attr) {
      case s: String => p(s)
      case null      => false
      case _         => true // not a string we understand: may match
    }

  private def cmpAt(schema: StructType, attr: String, v: Any)(
      keep: Int => Boolean): Row => Boolean =
    at(schema, attr)(x => x != null && (cmp(x, v) match {
      case Some(c) => keep(c)
      case None    => true // undecidable: may match
    }))

  private def eq0(x: Any, v: Any): Boolean = (x, v) match {
    case (a: Array[Byte], b: Array[Byte]) => java.util.Arrays.equals(a, b)
    case (a: Number, b: Number) if !nonFinite(a) && !nonFinite(b) =>
      num(a).compareTo(num(b)) == 0
    case _ => cmp(x, v) match {
      case Some(c) => c == 0
      case None    => true // undecidable equality: may match
    }
  }

  /** Total-order compare when both sides are understood; None otherwise.
    * Shared with the write-side `sortedBy` order verification.
    */
  private[sources] def cmp(x: Any, v: Any): Option[Int] = (x, v) match {
    case (a: Number, b: Number) =>
      // NaN/±Inf have no BigDecimal form (num() would throw) and no
      // useful total order vs finite values: answer may-match.
      if (nonFinite(a) || nonFinite(b)) None
      else Some(num(a).compareTo(num(b)))
    case (a: String, b: String)   =>
      // UTF-8 byte order, matching Spark's UTF8String binary comparison —
      // String.compareTo (UTF-16 code units) diverges for supplementary
      // chars vs U+E000–U+FFFF, which would make zone pruning unsound.
      Some(org.apache.spark.unsafe.types.UTF8String.fromString(a)
        .compareTo(org.apache.spark.unsafe.types.UTF8String.fromString(b)))
    case (a: Boolean, b: Boolean) => Some(a.compareTo(b))
    case (a: java.sql.Date, b: java.sql.Date)           => Some(a.compareTo(b))
    case (a: java.sql.Timestamp, b: java.sql.Timestamp) => Some(a.compareTo(b))
    case (a: java.sql.Date, b: java.time.LocalDate) =>
      Some(a.toLocalDate.compareTo(b))
    case (a: java.sql.Timestamp, b: java.time.Instant) =>
      Some(a.toInstant.compareTo(b))
    case (a: java.time.LocalDateTime, b: java.time.LocalDateTime) =>
      Some(a.compareTo(b))
    case _ => None
  }

  private def nonFinite(n: Number): Boolean = n match {
    case d: java.lang.Double => d.isNaN || d.isInfinite
    case f: java.lang.Float  => f.isNaN || f.isInfinite
    case _                   => false
  }

  /** Exact numeric widening: Long/Int/Short/Byte and Float/Double and
    * BigDecimal all convert to BigDecimal without loss (callers guard
    * non-finite doubles/floats via nonFinite first).
    */
  private def num(n: Number): JBigDecimal = n match {
    case d: JBigDecimal => d
    case d: java.lang.Double => new JBigDecimal(d.doubleValue())
    case f: java.lang.Float  => new JBigDecimal(f.floatValue().toDouble)
    case d: scala.math.BigDecimal => d.bigDecimal
    case i => JBigDecimal.valueOf(i.longValue())
  }
}
