package graft.ql

/** Render an AST back to parseable InfluxQL — the inverse of Parser, used to
  * persist continuous-query definitions in the durable metadata catalog
  * (the reference stores CQ statements as text in InfluxDB meta and replays
  * them on import, `/root/reference/syncing/importer.go:310-333`; here the
  * catalog file stores `render(sel)` and the Engine re-parses on restart).
  *
  * Guarantee: `Parser.parse(render(s)) == s` for any statement the Parser
  * itself produced (parser-built `Bin` trees already respect precedence, and
  * user parentheses survive as `Paren` nodes, so no extra parentheses are
  * introduced). For hand-built ASTs the rendering is semantically equivalent
  * but may normalize (e.g. unary minus becomes `-1 * x` on re-parse).
  */
object Render {

  private val plainIdent = "^[A-Za-z_][A-Za-z0-9_]*$".r

  /** Quote identifiers the lexer couldn't re-tokenize bare. (The lexer drops
    * quoting before the parser sees tokens, so quoting cannot shield grammar
    * keywords — but the parser can't accept those as identifiers anyway.) */
  def ident(name: String): String =
    if (plainIdent.matches(name)) name else "\"" + name + "\""

  /** µs → the largest duration unit that divides evenly (lexer TDur shape). */
  def duration(us: Long): String =
    if (us == 0L) "0s"
    else Seq("w" -> 604800000000L, "d" -> 86400000000L, "h" -> 3600000000L,
      "m" -> 60000000L, "s" -> 1000000L, "ms" -> 1000L, "us" -> 1L)
      .collectFirst { case (u, f) if us % f == 0 => s"${us / f}$u" }.get

  private def prec(op: String): Int = op match {
    case "OR"  => 1
    case "AND" => 2
    case "=" | "!=" | "<>" | "<" | "<=" | ">" | ">=" | "=~" | "!~" => 3
    case "+" | "-" => 4
    case _         => 5 // * / %
  }

  def expr(e: Expr): String = e match {
    case Ident(n)    => ident(n)
    case NumLit(v)   => // must keep a '.' so the lexer re-reads it as NumLit
      val s = BigDecimal(v).bigDecimal.stripTrailingZeros.toPlainString
      if (s.contains('.')) s else s + ".0"
    case IntLit(v)   => v.toString
    case StrLit(v)   => "'" + v + "'"
    case RegexLit(p) => "/" + p.replace("/", "\\/") + "/"
    case DurLit(us)  => duration(us)
    case BoolLit(v)  => v.toString
    case NowLit      => "now()"
    case Wildcard    => "*"
    case TypedIdent(n, h)  => s"${ident(n)}::$h"
    case TypedWildcard(h)  => s"*::$h"
    case Call(n, a)  => s"$n(${a.map(expr).mkString(", ")})"
    case Paren(e0)   => s"(${expr(e0)})"
    case Bin(op, l, r) =>
      // children needing parens only arise in hand-built ASTs; parser output
      // encodes user parens as Paren and is left-associative at equal prec
      val ls = l match {
        case Bin(lo, _, _) if prec(lo) < prec(op) => s"(${expr(l)})"
        case _                                    => expr(l)
      }
      val rs = r match {
        case Bin(ro, _, _) if prec(ro) <= prec(op) => s"(${expr(r)})"
        case _                                     => expr(r)
      }
      s"$ls $op $rs"
  }

  def field(f: Field): String =
    expr(f.expr) + f.alias.map(a => s" AS ${ident(a)}").getOrElse("")

  def source(src: Source): String = src match {
    case FromMeasurement(n)      => ident(n)
    case FromMeasurementRegex(p) => "/" + p.replace("/", "\\/") + "/"
    case FromMulti(ns)           => ns.map(ident).mkString(", ")
    case FromSubquery(sub)       => s"(${select(sub)})"
  }

  def select(s: SelectStmt): String = {
    val sb = new StringBuilder("SELECT ")
    sb ++= s.fields.map(field).mkString(", ")
    s.into.foreach { t =>
      val q = s.intoDbRp.map {
        case ("", rp) => s"${ident(rp)}." // current-db form round-trips bare
        case (db, rp) => s"${ident(db)}.${ident(rp)}."
      }.getOrElse("")
      sb ++= s" INTO $q${ident(t)}"
    }
    sb ++= " FROM " + source(s.from)
    s.where.foreach(w => sb ++= s" WHERE ${expr(w)}")
    val gb = s.groupByTime.map { iv =>
      if (s.groupByTimeOffset != 0L)
        s"time(${duration(iv)}, ${duration(s.groupByTimeOffset)})"
      else s"time(${duration(iv)})"
    }.toList ++ (if (s.groupByAllTags) List("*") else s.groupByTags.map(ident))
    val fill = s.fill match {
      case FillNone     => None
      case FillNull     => Some("fill(null)")
      case FillPrevious => Some("fill(previous)")
      case FillLinear   => Some("fill(linear)")
      case FillValue(v) =>
        Some(s"fill(${if (v == v.toLong.toDouble) v.toLong.toString else v.toString})")
    }
    if (gb.nonEmpty || fill.isDefined) {
      sb ++= " GROUP BY " + (gb ++ (if (gb.isEmpty) fill.toList else Nil)).mkString(", ")
      if (gb.nonEmpty) fill.foreach(f => sb ++= " " + f)
    }
    if (s.orderDesc) sb ++= " ORDER BY time DESC"
    s.limit.foreach(n => sb ++= s" LIMIT $n")
    s.offset.foreach(n => sb ++= s" OFFSET $n")
    s.slimit.foreach(n => sb ++= s" SLIMIT $n")
    s.soffset.foreach(n => sb ++= s" SOFFSET $n")
    s.tz.foreach(z => sb ++= s" tz('$z')")
    sb.toString
  }

  /** Full CREATE CONTINUOUS QUERY text (SHOW CONTINUOUS QUERIES shape),
    * RESAMPLE clause included — re-parseable like select(). */
  def cq(name: String, db: String, sel: SelectStmt,
      everyUs: Long = 0L, forUs: Long = 0L): String = {
    val resample =
      if (everyUs == 0L && forUs == 0L) ""
      else "RESAMPLE " +
        (if (everyUs > 0) s"EVERY ${duration(everyUs)} " else "") +
        (if (forUs > 0) s"FOR ${duration(forUs)} " else "")
    s"CREATE CONTINUOUS QUERY ${ident(name)} ON ${ident(db)} " +
      s"${resample}BEGIN ${select(sel)} END"
  }
}
