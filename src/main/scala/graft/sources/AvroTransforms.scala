package graft.sources

import java.io.File

import org.apache.spark.sql.catalyst.util.DateTimeUtils
import org.apache.spark.sql.sources._
import org.apache.spark.sql.types._

/** One hidden-partition TRANSFORM spec: rows route to
  * `<col>_<kind>=<v>` directory segments where `v` is the transform of
  * the column value (the Iceberg `days/months/hours/years/truncate`
  * partition transforms; reference tables are almost always laid out
  * `PARTITIONED BY (days(ts))`). `arg` is the truncate width (0 for
  * the temporal kinds).
  */
case class Xform(col: String, kind: String, arg: Int) {
  def segName: String = s"${col}_$kind"
  def render: String =
    if (kind == "trunc") s"$col:$kind:$arg" else s"$col:$kind"
}

/** Temporal + truncate hidden partition transforms — the machinery
  * mirrors the hash-bucket layout exactly (see the `_graft_bucket`
  * scaladoc in [[AvroFileSource]]): a stamped `_graft_xform` sidecar
  * immutable per column, writer-side routing to hidden segments,
  * scan-side pruning that maps RAW-COLUMN predicates to transform-value
  * ranges (every kind here is monotone non-decreasing, so
  * `ts >= X  ⇒  day(ts) >= day(X)` — range pruning is sound, which is
  * strictly more than buckets can do), and travel-read resolution
  * through the establishing stamps.
  *
  * All temporal math is on the UTC instant (epoch micros), matching
  * Iceberg's transform spec: `day = floorDiv(us, 86_400e6)`,
  * `hour = floorDiv(us, 3_600e6)`, `month = 12·(y−1970)+(m−1)`,
  * `year = y − 1970`. `trunc(W, int)` floors to a multiple of W
  * (`floorDiv(v, W)·W` — exact for negatives); `trunc(W, string)` is
  * the first W chars, never splitting a surrogate pair (an unpaired
  * surrogate would URL-encode lossily and break writer/pruner
  * agreement).
  */
object AvroTransforms {

  val TemporalKinds: Set[String] = Set("year", "month", "day", "hour")
  val Kinds: Set[String] = TemporalKinds + "trunc"

  private val DayMicros = 86400000000L
  private val HourMicros = 3600000000L

  def xformFile(d: File): File = new File(d, "_graft_xform")

  /** Parse a `col:kind[:arg][,col:kind[:arg]…]` option string. */
  def parse(s: String): Seq[Xform] =
    s.split(',').toSeq.map(_.trim).filter(_.nonEmpty).map { part =>
      part.split(':') match {
        case Array(c, k) if c.trim.nonEmpty && TemporalKinds(k.trim) =>
          Xform(c.trim, k.trim, 0)
        case Array(c, k, w) if c.trim.nonEmpty && k.trim == "trunc" &&
            w.trim.matches("[0-9]+") && w.trim.toInt > 0 =>
          Xform(c.trim, "trunc", w.trim.toInt)
        case _ => throw new IllegalArgumentException(
          s"graft-avro: bad transformBy entry '$part' — expected " +
            "col:year|month|day|hour or col:trunc:width")
      }
    }

  def render(spec: Seq[Xform]): String = spec.map(_.render).mkString(",")

  /** Spec entries with the journal version each column's transform was
    * ESTABLISHED at — the same stamp contract as
    * [[AvroFileSource.readBucketSpecStamped]]: immutable per column,
    * replaced wholesale by truncate, so a live entry with `since <= v`
    * is exactly the spec snapshot `v`'s segment-bearing files were
    * routed under. Malformed sidecar → empty (pruning off is sound).
    */
  def readStamped(d: File): Seq[(Xform, Long)] = {
    val f = xformFile(d)
    if (!f.isFile) return Nil
    try {
      val src = scala.io.Source.fromFile(f, "UTF-8")
      try src.getLines().flatMap { line =>
        line.split('\t') match {
          case Array(c, k, w, v) if Kinds(k) && w.matches("[0-9]+") &&
              v.matches("[0-9]+") =>
            Some((Xform(java.net.URLDecoder.decode(c, "UTF-8"), k, w.toInt),
              v.toLong))
          case _ => None
        }
      }.toSeq
      finally src.close()
    } catch { case _: Exception => Nil }
  }

  def read(d: File): Seq[Xform] = readStamped(d).map(_._1)

  private[sources] def write(d: File, spec: Seq[(Xform, Long)]): Unit = {
    val f = xformFile(d)
    if (spec.isEmpty) { f.delete(); return }
    val tmp = new File(f.getPath + ".staging")
    java.nio.file.Files.write(tmp.toPath,
      spec.map { case (x, v) =>
        java.net.URLEncoder.encode(x.col, "UTF-8") +
          "\t" + x.kind + "\t" + x.arg + "\t" + v
      }.mkString("\n").getBytes("UTF-8"))
    if (!tmp.renameTo(f)) throw new java.io.IOException(
      s"graft-avro: rename failed $tmp -> $f")
  }

  /** Merge a write's transform spec under the commit lock — the
    * [[AvroFileSource.mergeBucketSpec]] contract verbatim: a column
    * already specced must agree exactly (mixed transforms over one
    * column's segments would make predicate→segment resolution
    * ambiguous); `replace` (truncate) installs wholesale, preserving
    * the establishing stamp when the spec is unchanged.
    */
  private[sources] def merge(d: File, spec: Seq[Xform],
      replace: Boolean): Unit = {
    lazy val stamp = AvroFileSource.readSnapshots(d).lastOption
      .map(_.version + 1).getOrElse(1L)
    if (replace) {
      val prior = readStamped(d).map { case (x, v) => x -> v }.toMap
      write(d, spec.map(x =>
        (x, prior.get(x).filter(_ >= 1L).getOrElse(stamp))))
      return
    }
    if (spec.isEmpty) return
    val prior = readStamped(d)
    val priorByCol = prior.map { case (x, _) => x.col -> x }.toMap
    spec.foreach { x =>
      priorByCol.get(x.col).foreach(px => require(px == x,
        s"graft-avro: transform '${x.render}' conflicts with the " +
          s"table's established spec '${px.render}' — a column's " +
          "transform is immutable (truncate to re-partition)"))
    }
    val fresh = spec.filterNot(x => priorByCol.contains(x.col))
      .map(x => (x, stamp))
    if (fresh.nonEmpty) write(d, prior ++ fresh)
  }

  // ---- value → transform value ---------------------------------------

  /** EXTERNAL JVM value → epoch micros (UTC instant); None = not a
    * timestamp representation.
    */
  def microsOf(v: Any): Option[Long] = v match {
    case t: java.sql.Timestamp => Some(DateTimeUtils.fromJavaTimestamp(t))
    case i: java.time.Instant => Some(DateTimeUtils.instantToMicros(i))
    case l: java.time.LocalDateTime =>
      Some(DateTimeUtils.localDateTimeToMicros(l))
    case _ => None
  }

  /** EXTERNAL JVM value → epoch days; None = not a date. */
  def epochDaysOf(v: Any): Option[Long] = v match {
    case d: java.sql.Date => Some(d.toLocalDate.toEpochDay)
    case d: java.time.LocalDate => Some(d.toEpochDay)
    case _ => None
  }

  def fromMicros(kind: String, us: Long): Long = kind match {
    case "day" => Math.floorDiv(us, DayMicros)
    case "hour" => Math.floorDiv(us, HourMicros)
    case "month" =>
      val ld = java.time.LocalDate.ofEpochDay(Math.floorDiv(us, DayMicros))
      (ld.getYear - 1970).toLong * 12L + (ld.getMonthValue - 1)
    case "year" =>
      java.time.LocalDate.ofEpochDay(Math.floorDiv(us, DayMicros))
        .getYear.toLong - 1970L
    case other => throw new IllegalArgumentException(
      s"graft-avro: not a temporal transform kind: $other")
  }

  def fromEpochDays(kind: String, ed: Long): Option[Long] = kind match {
    case "day" => Some(ed)
    case "month" =>
      val ld = java.time.LocalDate.ofEpochDay(ed)
      Some((ld.getYear - 1970).toLong * 12L + (ld.getMonthValue - 1))
    case "year" =>
      Some(java.time.LocalDate.ofEpochDay(ed).getYear.toLong - 1970L)
    case _ => None // hour of a date is undefined
  }

  def truncLong(w: Int, v: Long): Long = Math.floorDiv(v, w.toLong) * w

  def truncStr(w: Int, s: String): String =
    if (s.length <= w) s
    else {
      val cut = if (Character.isHighSurrogate(s.charAt(w - 1))) w - 1 else w
      s.substring(0, cut)
    }

  /** Transform of an EXTERNAL value — the writer-routing entry point.
    * Long for every kind except string-trunc (String). None = value
    * representation this transform does not cover (the write builder's
    * type guard makes that unreachable for real writes).
    */
  def applyExternal(x: Xform, v: Any): Option[Any] = x.kind match {
    case "trunc" => v match {
      case s: String => Some(truncStr(x.arg, s))
      case n @ (_: java.lang.Long | _: java.lang.Integer |
                _: java.lang.Short | _: java.lang.Byte) =>
        Some(truncLong(x.arg, n.asInstanceOf[Number].longValue()))
      case _ => None
    }
    case "hour" => microsOf(v).map(fromMicros("hour", _))
    case k => microsOf(v).map(fromMicros(k, _))
      .orElse(epochDaysOf(v).flatMap(fromEpochDays(k, _)))
  }

  /** Directory segment string of a transform value (same encode rule as
    * identity partition segments, including the literal-"__null__"
    * force-encode).
    */
  def encodeSeg(s: String): String = {
    val e = java.net.URLEncoder.encode(s, "UTF-8")
    if (e == "__null__") "%5F_null__" else e
  }

  def segValue(x: Xform, v: Any): String =
    if (v == null) "__null__"
    else applyExternal(x, v) match {
      case Some(t) => encodeSeg(t.toString)
      case None => throw new IllegalArgumentException(
        s"graft-avro: transform ${x.render} cannot map value " +
          s"'$v' (${v.getClass.getName})")
    }

  /** Is `dt` a column type this transform kind supports? The same
    * canonical-stability reasoning as bucketing: the transform value is
    * computed from the external value at write AND from the filter
    * literal at read — both sides must agree bit-exactly.
    */
  def typeOk(kind: String, dt: DataType): Boolean = kind match {
    case "hour" => dt == TimestampType || dt == TimestampNTZType
    case "year" | "month" | "day" =>
      dt == TimestampType || dt == TimestampNTZType || dt == DateType
    case "trunc" => dt match {
      case StringType | IntegerType | LongType | ShortType | ByteType => true
      case _ => false
    }
    case _ => false
  }

  // ---- predicate → segment pruning ------------------------------------

  /** Transform of a pushed-filter LITERAL (external JVM value); None =
    * representation not covered → that conjunct cannot prune (sound).
    */
  private def litXform(x: Xform, v: Any): Option[Any] =
    if (v == null) None else applyExternal(x, v)

  private def litLong(x: Xform, v: Any): Option[Long] =
    litXform(x, v).collect { case l: Long => l }

  /** Like [[litLong]] but with the literal nudged by `delta` in its
    * finest representable unit FIRST (micros / days / integer steps) —
    * the EXACT mapping for strict compares: `ts < X  ⟺  ts <= X−1µs  ⇒
    * day(ts) <= day(X−1µs)`, so a bound landing exactly on a segment
    * boundary excludes the boundary segment instead of keeping it.
    * None on overflow or a non-numeric kind (caller falls back to the
    * inclusive widening).
    */
  private def litLongAdj(x: Xform, v: Any, delta: Long): Option[Long] =
    if (v == null) None
    else scala.util.Try {
      x.kind match {
        case "trunc" => v match {
          case n @ (_: java.lang.Long | _: java.lang.Integer |
                    _: java.lang.Short | _: java.lang.Byte) =>
            Some(truncLong(x.arg,
              Math.addExact(n.asInstanceOf[Number].longValue(), delta)))
          case _ => None
        }
        case "hour" => microsOf(v).map(us =>
          fromMicros("hour", Math.addExact(us, delta)))
        case k => microsOf(v).map(us =>
          fromMicros(k, Math.addExact(us, delta)))
          .orElse(epochDaysOf(v).flatMap(d =>
            fromEpochDays(k, Math.addExact(d, delta))))
      }
    }.toOption.flatten

  /** Per transformed SEGMENT name: predicates over the file's RAW
    * segment string, ANDed. Built once per scan from the pushed V1
    * filters; a file lacking the segment is always kept (pre-transform
    * data / partition evolution) — the caller handles absence.
    *
    * Soundness: every kind is monotone non-decreasing in the column
    * value, so `c ⋈ v` maps to `t(c) ⋈' t(v)` with > and >= both
    * widening to >= (rows above v share v's transform value), < and <=
    * to <=. A `__null__` segment holds only null values: it fails every
    * compare (pruned — null never matches) and answers IS [NOT] NULL
    * exactly. An undecodable non-null segment keeps the file.
    */
  def checksFor(spec: Seq[Xform], filters: Seq[Filter])
      : Map[String, Seq[String => Boolean]] = {
    if (spec.isEmpty || filters.isEmpty) return Map.empty
    val byCol: Map[String, Seq[Xform]] = spec.groupBy(_.col)
    def conjuncts(f: Filter): Seq[Filter] = f match {
      case And(a, b) => conjuncts(a) ++ conjuncts(b)
      case x => Seq(x)
    }
    def numPred(cmp: Long => Boolean): String => Boolean = raw =>
      if (raw == "__null__") false
      else scala.util.Try(raw.toLong).toOption.forall(cmp)
    def strEq(allowed: Set[String]): String => Boolean = raw =>
      raw != "__null__" && allowed.contains(raw)
    val checks: Seq[(String, String => Boolean)] =
      filters.flatMap(conjuncts).flatMap {
        case EqualTo(c, v) => byCol.getOrElse(c, Nil).flatMap { x =>
          litXform(x, v).map {
            case l: Long => x.segName -> numPred(_ == l)
            case s: String => x.segName -> strEq(Set(encodeSeg(s)))
          }
        }
        case EqualNullSafe(c, null) => byCol.getOrElse(c, Nil)
          .map(x => x.segName -> ((raw: String) => raw == "__null__"))
        case EqualNullSafe(c, v) => byCol.getOrElse(c, Nil).flatMap { x =>
          litXform(x, v).map {
            case l: Long => x.segName -> numPred(_ == l)
            case s: String => x.segName -> strEq(Set(encodeSeg(s)))
          }
        }
        case In(c, vs) => byCol.getOrElse(c, Nil).flatMap { x =>
          // null elements never match; a non-convertible element
          // disables the conjunct (sound); empty/all-null → matches
          // nothing → every valued segment prunes
          val ts = vs.toSeq.filter(_ != null).map(litXform(x, _))
          if (!ts.forall(_.isDefined)) None
          else {
            val longs = ts.flatten.collect { case l: Long => l }.toSet
            val strs = ts.flatten.collect { case s: String =>
              encodeSeg(s) }.toSet
            Some(x.segName -> ((raw: String) =>
              if (raw == "__null__") false
              else scala.util.Try(raw.toLong).toOption match {
                case Some(l) => longs.contains(l) || strs.contains(raw)
                case None => strs.contains(raw)
              }))
          }
        }
        case GreaterThan(c, v) => byCol.getOrElse(c, Nil).flatMap(x =>
          litLongAdj(x, v, 1L).orElse(litLong(x, v))
            .map(t => x.segName -> numPred(_ >= t)))
        case GreaterThanOrEqual(c, v) => byCol.getOrElse(c, Nil).flatMap(x =>
          litLong(x, v).map(t => x.segName -> numPred(_ >= t)))
        case LessThan(c, v) => byCol.getOrElse(c, Nil).flatMap(x =>
          litLongAdj(x, v, -1L).orElse(litLong(x, v))
            .map(t => x.segName -> numPred(_ <= t)))
        case LessThanOrEqual(c, v) => byCol.getOrElse(c, Nil).flatMap(x =>
          litLong(x, v).map(t => x.segName -> numPred(_ <= t)))
        case IsNull(c) => byCol.getOrElse(c, Nil)
          .map(x => x.segName -> ((raw: String) => raw == "__null__"))
        case IsNotNull(c) => byCol.getOrElse(c, Nil)
          .map(x => x.segName -> ((raw: String) => raw != "__null__"))
        case StringStartsWith(c, p) => byCol.getOrElse(c, Nil).collect {
          // prefix at least as long as the width pins the segment
          // exactly; a shorter prefix keeps segments that start with it
          case x if x.kind == "trunc" && p != null =>
            if (p.length >= x.arg) {
              val want = encodeSeg(truncStr(x.arg, p))
              x.segName -> ((raw: String) => raw == want)
            } else {
              x.segName -> ((raw: String) => raw != "__null__" && {
                val dec = scala.util.Try(
                  java.net.URLDecoder.decode(raw, "UTF-8")).toOption
                dec.forall(_.startsWith(p))
              })
            }
        }
        case _ => Nil
      }
    checks.groupMap(_._1)(_._2)
  }

  /** Transform of a Catalyst-INTERNAL literal (runtime join-key IN-sets
    * arrive internal) → the target segment's raw string. None = type
    * not covered (skip — never prune).
    */
  def internalSeg(x: Xform, dt: DataType, v: Any): Option[String] = {
    if (v == null) return None
    val t: Option[Any] = (x.kind, dt) match {
      case (k, TimestampType) if TemporalKinds(k) =>
        Some(fromMicros(k, v.asInstanceOf[Long]))
      case (k, TimestampNTZType) if TemporalKinds(k) =>
        Some(fromMicros(k, v.asInstanceOf[Long]))
      case (k, DateType) if TemporalKinds(k) =>
        fromEpochDays(k, v.asInstanceOf[Int].toLong)
      case ("trunc", IntegerType) =>
        Some(truncLong(x.arg, v.asInstanceOf[Int].toLong))
      case ("trunc", LongType) =>
        Some(truncLong(x.arg, v.asInstanceOf[Long]))
      case ("trunc", ShortType) =>
        Some(truncLong(x.arg, v.asInstanceOf[Short].toLong))
      case ("trunc", ByteType) =>
        Some(truncLong(x.arg, v.asInstanceOf[Byte].toLong))
      case ("trunc", StringType) =>
        Some(truncStr(x.arg, v.toString))
      case _ => None
    }
    t.map {
      case s: String => encodeSeg(s)
      case l => l.toString
    }
  }
}
