package graft.ql

import scala.collection.mutable.ListBuffer

/** Hand-rolled lexer + recursive-descent parser for the InfluxQL subset
  * (grammar induced from the reference's usage: SELECT/SHOW statements under
  * `/root/reference/service/`; admin DSL trie in
  * `service/clusterql/language.go:7-63`). No external parser deps.
  */
object Lexer {
  sealed trait Tok { def text: String }
  final case class TIdent(text: String) extends Tok
  final case class TNum(text: String) extends Tok
  final case class TDur(text: String) extends Tok
  final case class TStr(text: String) extends Tok   // already unquoted
  final case class TRegex(text: String) extends Tok // /pattern/, undelimited
  final case class TSym(text: String) extends Tok
  case object TEnd extends Tok { val text = "<end>" }

  private val sym2 = Set("<=", ">=", "!=", "<>", "=~", "!~", "::")
  private val sym1 = Set("(", ")", ",", "=", "<", ">", "+", "-", "*", "/", "%", ".", ";")
  private val durUnit = "(ns|us|µs|ms|s|m|h|d|w)"
  private val durRe = s"^\\d+$durUnit".r

  def tokenize(s: String): Vector[Tok] = {
    val out = ListBuffer.empty[Tok]
    var i = 0
    while (i < s.length) {
      val c = s(i)
      if (c.isWhitespace) i += 1
      else if (c == '\'') {
        val j = s.indexOf('\'', i + 1)
        if (j < 0) throw ParseException(s"unterminated string at $i")
        out += TStr(s.substring(i + 1, j)); i = j + 1
      } else if (c == '"') { // quoted identifier
        val j = s.indexOf('"', i + 1)
        if (j < 0) throw ParseException(s"unterminated identifier at $i")
        out += TIdent(s.substring(i + 1, j)); i = j + 1
      } else if (c.isDigit) {
        var j = i
        while (j < s.length && (s(j).isDigit || s(j) == '.')) j += 1
        // duration suffix?
        var k = j
        while (k < s.length && s(k).isLetter) k += 1
        val full = s.substring(i, k)
        if (durRe.findFirstIn(full).contains(full)) { out += TDur(full); i = k }
        else { out += TNum(s.substring(i, j)); i = j }
      } else if (c.isLetter || c == '_') {
        var j = i
        while (j < s.length && (s(j).isLetterOrDigit || s(j) == '_')) j += 1
        out += TIdent(s.substring(i, j)); i = j
      } else if (c == '/' && out.lastOption.exists {
        // regex literal: valid after a match operator, or in operand-start
        // position (after SELECT / FROM / ','), which disambiguates it from
        // division — '/' as DIVISION only ever follows a complete operand
        case TSym("=~") | TSym("!~") | TSym(",") => true
        case TIdent(x) => x.equalsIgnoreCase("SELECT") || x.equalsIgnoreCase("FROM")
        case _ => false
      }) {
        var j = i + 1
        while (j < s.length && !(s(j) == '/' && s(j - 1) != '\\')) j += 1
        if (j >= s.length) throw ParseException(s"unterminated regex at $i")
        out += TRegex(s.substring(i + 1, j).replace("\\/", "/")); i = j + 1
      } else if (i + 1 < s.length && sym2(s.substring(i, i + 2))) {
        out += TSym(s.substring(i, i + 2)); i += 2
      } else if (sym1(c.toString)) {
        out += TSym(c.toString); i += 1
      } else throw ParseException(s"unexpected character '$c' at $i")
    }
    out += TEnd
    out.toVector
  }

  def durationUs(text: String): Long = {
    val num = text.takeWhile(_.isDigit).toLong
    text.dropWhile(_.isDigit) match {
      case "ns"        => num / 1000
      case "us" | "µs" => num
      case "ms"        => num * 1000L
      case "s"         => num * 1000000L
      case "m"         => num * 60000000L
      case "h"         => num * 3600000000L
      case "d"         => num * 86400000000L
      case "w"         => num * 604800000000L
      case u           => throw ParseException(s"bad duration unit '$u'")
    }
  }
}

final class Parser(tokens: Vector[Lexer.Tok]) {
  import Lexer._
  private var pos = 0
  private def peek: Tok = tokens(pos)
  private def next(): Tok = { val t = tokens(pos); pos += 1; t }
  private def isKw(t: Tok, kw: String): Boolean = t match {
    case TIdent(x) => x.equalsIgnoreCase(kw)
    case _         => false
  }
  private def acceptKw(kw: String): Boolean =
    if (isKw(peek, kw)) { pos += 1; true } else false
  private def expectKw(kw: String): Unit =
    if (!acceptKw(kw)) throw ParseException(s"expected $kw, found ${peek.text}")
  private def acceptSym(sy: String): Boolean = peek match {
    case TSym(`sy`) => pos += 1; true
    case _          => false
  }
  private def expectSym(sy: String): Unit =
    if (!acceptSym(sy)) throw ParseException(s"expected '$sy', found ${peek.text}")
  private def ident(): String = next() match {
    case TIdent(x) => x
    case t         => throw ParseException(s"expected identifier, found ${t.text}")
  }
  private def durationArg(): Long = next() match {
    case TDur(t)   => Lexer.durationUs(t)
    case TNum("0") => 0L // infinite retention
    case t         => throw ParseException(s"expected duration, found ${t.text}")
  }
  private def intArg(): Int = next() match {
    case TNum(x) => x.toInt
    case t       => throw ParseException(s"expected number, found ${t.text}")
  }

  private def parseOne(): Statement =
    if (isKw(peek, "SELECT")) parseSelect()
    else if (isKw(peek, "SHOW")) parseShow()
    else if (isKw(peek, "DELETE")) {
      pos += 1; expectKw("FROM")
      val m = ident()
      DeleteSeries(m, if (acceptKw("WHERE")) Some(parseExpr(0)) else None)
    }
    else if (isKw(peek, "GRANT") || isKw(peek, "REVOKE")) parseGrantRevoke()
    else if (isKw(peek, "ALTER")) {
      pos += 1; expectKw("RETENTION"); expectKw("POLICY")
      val name = ident(); expectKw("ON"); val db = ident()
      var dur: Option[Long] = None; var repl: Option[Int] = None; var dflt = false
      var more = true
      while (more) {
        if (acceptKw("DURATION")) dur = Some(durationArg())
        else if (acceptKw("REPLICATION")) repl = Some(intArg())
        else if (acceptKw("SHARD")) { expectKw("DURATION"); durationArg() } // accepted, no-op
        else if (acceptKw("DEFAULT")) dflt = true
        else more = false
      }
      AlterRetentionPolicy(name, db, dur, repl, dflt)
    }
    else if (isKw(peek, "KILL")) {
      pos += 1; expectKw("QUERY")
      next() match {
        case TNum(n) => KillQuery(n.toLong)
        case t       => throw ParseException(s"expected query id after KILL QUERY, found ${t.text}")
      }
    }
    else if (isKw(peek, "CREATE") || isKw(peek, "DROP") ||
             isKw(peek, "REMOVE") || isKw(peek, "SET")) Admin.parse(this)
    else throw ParseException(s"unsupported statement start: ${peek.text}")

  // GRANT ALL|READ|WRITE ON db TO user / REVOKE ... ON db FROM user
  private def parseGrantRevoke(): AuthStmt = {
    val isGrant = acceptKw("GRANT")
    if (!isGrant) expectKw("REVOKE")
    val priv = ident().toUpperCase match {
      case p @ ("ALL" | "READ" | "WRITE") => acceptKw("PRIVILEGES"); p
      case p => throw ParseException(s"unknown privilege $p")
    }
    expectKw("ON"); val db = ident()
    if (isGrant) { expectKw("TO"); Grant(priv, db, ident()) }
    else { expectKw("FROM"); Revoke(priv, db, ident()) }
  }

  def parseStatement(): Statement = {
    val st = parseOne()
    acceptSym(";")
    peek match {
      case TEnd => st
      case t    => throw ParseException(s"trailing input: ${t.text}")
    }
  }

  /** Multiple ';'-separated statements per request, like the reference's
    * per-statement result accumulation (query_handler.go:43-47,84-87). */
  def parseStatements(): Seq[Statement] = {
    val out = scala.collection.mutable.ListBuffer(parseOne())
    while (acceptSym(";") && peek != TEnd) out += parseOne()
    peek match {
      case TEnd => out.toSeq
      case t    => throw ParseException(s"trailing input: ${t.text}")
    }
  }

  // -------- SELECT
  private def parseSelect(): SelectStmt = {
    expectKw("SELECT")
    val fields = ListBuffer(parseField())
    while (acceptSym(",")) fields += parseField()
    // measurement names may be db.rp-qualified: "db"."rp"."m", rp.m
    // (current db), db..m (default rp) — influxql fully-qualified form.
    // Returns (measurement, Some(db → rp)) for qualified names.
    def qualifiedName(): (String, Option[(String, String)]) = {
      val p1 = ident()
      if (!acceptSym(".")) (p1, None)
      else if (acceptSym(".")) (ident(), Some((p1, "autogen"))) // db..m
      else {
        val p2 = ident()
        if (acceptSym(".")) (ident(), Some((p1, p2)))           // db.rp.m
        else (p2, Some(("", p1))) // rp.m: "" = the statement's current db
      }
    }
    val (into, intoDbRp) =
      if (acceptKw("INTO")) { val (n, q) = qualifiedName(); (Some(n), q) }
      else (None, None)
    expectKw("FROM")
    // single source (reference: first-measurement assumption); subqueries
    // are the reference's declared future work, supported here
    val from: Source =
      if (acceptSym("(")) {
        val sub = parseSelect()
        expectSym(")")
        FromSubquery(sub)
      } else peek match {
        case TRegex(p) => pos += 1; FromMeasurementRegex(p)
        case _ =>
          val first = qualifiedName()._1 // db.rp qualifier names, not routes
          if (!acceptSym(",")) FromMeasurement(first)
          else { // FROM m1, m2, ... — union scan over the named measurements
            val more = ListBuffer(first, qualifiedName()._1)
            while (acceptSym(",")) more += qualifiedName()._1
            FromMulti(more.toList)
          }
      }
    val where = if (acceptKw("WHERE")) Some(parseExpr(0)) else None
    var gbTime: Option[Long] = None
    var gbTimeOffset = 0L
    var gbTags = ListBuffer.empty[String]
    var gbAll = false
    var fill: Fill = FillNone
    if (acceptKw("GROUP")) {
      expectKw("BY")
      do {
        if (acceptSym("*")) gbAll = true
        else {
          val nm = peek
          if (isKw(nm, "time")) {
            pos += 1; expectSym("(")
            val d = next() match {
              case TDur(t) => durationUs(t)
              case t       => throw ParseException(s"expected duration in time(), found ${t.text}")
            }
            if (acceptSym(",")) { // time(interval, offset) — shifted buckets
              gbTimeOffset = next() match {
                case TDur(t) => durationUs(t)
                case t => throw ParseException(s"expected duration offset in time(), found ${t.text}")
              }
            }
            expectSym(")")
            gbTime = Some(d)
          } else if (isKw(nm, "fill")) {
            pos += 1; expectSym("(")
            fill = next() match {
              case TIdent(x) if x.equalsIgnoreCase("none")     => FillNone
              case TIdent(x) if x.equalsIgnoreCase("null")     => FillNull
              case TIdent(x) if x.equalsIgnoreCase("previous") => FillPrevious
              case TIdent(x) if x.equalsIgnoreCase("linear")   => FillLinear
              case TNum(n)                                     => FillValue(n.toDouble)
              case t => throw ParseException(s"bad fill argument ${t.text}")
            }
            expectSym(")")
          } else gbTags += ident()
        }
      } while (acceptSym(","))
      // fill(...) follows the GROUP BY list without a comma (InfluxQL)
      if (isKw(peek, "fill")) {
        pos += 1; expectSym("(")
        fill = next() match {
          case TIdent(x) if x.equalsIgnoreCase("none")     => FillNone
          case TIdent(x) if x.equalsIgnoreCase("null")     => FillNull
          case TIdent(x) if x.equalsIgnoreCase("previous") => FillPrevious
          case TIdent(x) if x.equalsIgnoreCase("linear")   => FillLinear
          case TNum(n)                                     => FillValue(n.toDouble)
          case t => throw ParseException(s"bad fill argument ${t.text}")
        }
        expectSym(")")
      }
    }
    var desc = false
    if (acceptKw("ORDER")) {
      expectKw("BY")
      val c = ident()
      if (!c.equalsIgnoreCase("time"))
        throw ParseException("only ORDER BY time is supported") // influxql semantics
      if (acceptKw("DESC")) desc = true else acceptKw("ASC")
    }
    def intAfter(kw: String): Option[Int] =
      if (acceptKw(kw)) next() match {
        case TNum(n) => Some(n.toInt)
        case t       => throw ParseException(s"expected integer after $kw, found ${t.text}")
      } else None
    val limit = intAfter("LIMIT")
    val offset = intAfter("OFFSET")
    val slimit = intAfter("SLIMIT")
    val soffset = intAfter("SOFFSET")
    // trailing tz('Zone') — InfluxQL's timezone clause; local-aligned
    // GROUP BY time buckets (the proxy passes it through to InfluxDB)
    val tz =
      if (isKw(peek, "tz") && tokens(pos + 1) == TSym("(")) {
        pos += 2
        val z = next() match {
          case TStr(s) => s
          case t => throw ParseException(s"expected quoted zone in tz(), found ${t.text}")
        }
        expectSym(")")
        Some(z)
      } else None
    SelectStmt(fields.toList, from, where, gbTime, gbTags.toList, gbAll,
      fill, desc, limit, offset, slimit, soffset, into, gbTimeOffset, tz,
      intoDbRp)
  }

  private def parseField(): Field = {
    val e = parseExpr(0)
    val alias = if (acceptKw("AS")) Some(ident()) else None
    Field(e, alias)
  }

  // -------- expressions (precedence climbing)
  private def prec(op: String): Int = op match {
    case "OR"                                      => 1
    case "AND"                                     => 2
    case "=" | "!=" | "<>" | "<" | "<=" | ">" | ">=" | "=~" | "!~" => 3
    case "+" | "-"                                 => 4
    case "*" | "/" | "%"                           => 5
    case _                                         => -1
  }

  private def peekOp: Option[String] = peek match {
    case TSym(s) if prec(s) > 0  => Some(s)
    case TIdent(x) if x.equalsIgnoreCase("AND") => Some("AND")
    case TIdent(x) if x.equalsIgnoreCase("OR")  => Some("OR")
    case _ => None
  }

  def parseExpr(minPrec: Int): Expr = {
    var lhs = parseUnary()
    var continue = true
    while (continue) {
      peekOp match {
        case Some(op) if prec(op) >= minPrec =>
          pos += 1
          val rhs = parseExpr(prec(op) + 1)
          lhs = Bin(op.toUpperCase, lhs, rhs)
        case _ => continue = false
      }
    }
    lhs
  }

  private def parseUnary(): Expr = next() match {
    case TNum(n) if n.contains('.') => NumLit(n.toDouble)
    case TNum(n)                    => IntLit(n.toLong)
    case TDur(d)                    => DurLit(Lexer.durationUs(d))
    case TStr(s)                    => StrLit(s)
    case TRegex(p)                  => RegexLit(p)
    case TSym("(")                  =>
      val e = parseExpr(0); expectSym(")"); Paren(e)
    case TSym("-")                  => Bin("*", IntLit(-1), parseUnary())
    case TSym("*")                  =>
      if (acceptSym("::")) TypedWildcard(typeHint(kinds = Set("field", "tag")))
      else Wildcard
    case TIdent(x) if x.equalsIgnoreCase("true")  => BoolLit(true)
    case TIdent(x) if x.equalsIgnoreCase("false") => BoolLit(false)
    case TIdent(x) if x.equalsIgnoreCase("now") && acceptSym("(") =>
      expectSym(")"); NowLit
    case TIdent(x) =>
      if (acceptSym("(")) {
        val args = ListBuffer.empty[Expr]
        if (!acceptSym(")")) {
          args += parseExpr(0)
          while (acceptSym(",")) args += parseExpr(0)
          expectSym(")")
        }
        Call(x.toLowerCase, args.toList)
      } else if (acceptSym("::")) TypedIdent(x, typeHint())
      else Ident(x)
    case t => throw ParseException(s"unexpected token ${t.text}")
  }

  /** The kind after `::` — field/tag disambiguation or a cast type
    * (influxql SELECT-list type selectors). */
  private def typeHint(kinds: Set[String] =
      Set("field", "tag", "integer", "float", "string", "boolean")): String = {
    val h = ident().toLowerCase
    if (!kinds(h)) throw ParseException(
      s"invalid type selector ::$h (want ${kinds.toSeq.sorted.mkString("|")})")
    h
  }

  // -------- SHOW
  private def parseShow(): Statement = {
    expectKw("SHOW")
    // admin DSL first: SHOW PARTITION KEYS / SHOW NODES
    if (acceptKw("PARTITION")) {
      expectKw("KEYS")
      val on = if (acceptKw("ON")) Some(ident()) else None
      return ShowPartitionKeys(on)
    }
    if (acceptKw("NODES")) return ShowNodes
    if (acceptKw("GRANTS")) { expectKw("FOR"); return ShowGrantsStmt(ident()) }
    if (acceptKw("QUERIES")) return ShowQueriesStmt
    // [EXACT] CARDINALITY suffix (influxql; the non-EXACT estimate answers
    // with the exact count — a strict upgrade, like exact mode/stddev)
    def cardinality(base: String): String = {
      val exact = acceptKw("EXACT")
      if (acceptKw("CARDINALITY")) base + " CARDINALITY"
      else if (exact) throw ParseException("expected CARDINALITY after EXACT")
      else base
    }
    val what = ident().toUpperCase match {
      case "RETENTION" => expectKw("POLICIES"); "RETENTION POLICIES"
      case "CONTINUOUS" => expectKw("QUERIES"); "CONTINUOUS QUERIES"
      case "TAG" =>
        if (acceptKw("KEYS")) "TAG KEYS"
        else if (acceptKw("KEY")) { // SHOW TAG KEY [EXACT] CARDINALITY
          acceptKw("EXACT"); expectKw("CARDINALITY"); "TAG KEY CARDINALITY"
        }
        else { expectKw("VALUES"); cardinality("TAG VALUES") }
      case "FIELD" =>
        if (acceptKw("KEYS")) "FIELD KEYS"
        else { expectKw("KEY"); acceptKw("EXACT"); expectKw("CARDINALITY"); "FIELD KEY CARDINALITY" }
      case "MEASUREMENT" => acceptKw("EXACT"); expectKw("CARDINALITY"); "MEASUREMENT CARDINALITY"
      case "SERIES" => cardinality("SERIES")
      case w @ ("DATABASES" | "MEASUREMENTS" | "USERS" | "SUBSCRIPTIONS") => w
      case w => throw ParseException(s"unsupported SHOW $w")
    }
    val on = if (acceptKw("ON")) Some(ident()) else None
    // SHOW … [ON db] [FROM m] — FROM restricts the meta scan (influxql)
    val from = if (acceptKw("FROM")) Some(ident()) else None
    // SHOW TAG VALUES [ON db] [FROM m] WITH KEY = k (influxql surface)
    val withKey =
      if (what.startsWith("TAG VALUES") && acceptKw("WITH")) {
        expectKw("KEY"); expectSym("="); Some(ident())
      } else if (what == "MEASUREMENTS" && acceptKw("WITH")) {
        // SHOW MEASUREMENTS WITH MEASUREMENT = m | =~ /re/ (the Grafana
        // form); encoded "=name" / "~pattern" in the withKey slot
        expectKw("MEASUREMENT")
        if (acceptSym("=~")) next() match {
          case TRegex(p) => Some("~" + p)
          case t => throw ParseException(s"expected /regex/, found ${t.text}")
        } else { expectSym("="); Some("=" + ident()) }
      } else None
    // SHOW … WHERE <tag predicate> — the meta-filter form Grafana issues
    // (influxql; predicates over tags with = != =~ !~ AND OR)
    val where = if (acceptKw("WHERE")) Some(parseExpr(0)) else None
    val stmt = ShowStmt(what, on, withKey, from, where)
    // SHOW … LIMIT n [OFFSET m] — meta pagination (series.go:69-70 analog)
    def intAfter(kw: String): Option[Int] =
      if (acceptKw(kw)) next() match {
        case TNum(n) => Some(n.toInt)
        case t       => throw ParseException(s"expected integer after $kw, found ${t.text}")
      } else None
    val lim = intAfter("LIMIT")
    val off = intAfter("OFFSET")
    if (lim.isDefined || off.isDefined) ShowLimited(stmt, lim, off) else stmt
  }

  // -------- admin DSL (clusterql) + catalog DDL (routing.go:13-41)
  private object Admin {
    def parse(p: Parser): Statement = {
      if (p.acceptKw("CREATE")) {
        if (p.acceptKw("DATABASE")) {
          val n = p.ident()
          // CREATE DATABASE x WITH [DURATION d] [REPLICATION n]
          //   [SHARD DURATION d] [NAME rp] — influxql's inline initial RP
          if (!p.acceptKw("WITH")) return CreateDatabase(n)
          var dur = 0L; var repl = 1; var rpName = "autogen"
          var more = true
          while (more) {
            if (p.acceptKw("DURATION")) dur = p.durationArg()
            else if (p.acceptKw("REPLICATION")) repl = p.intArg()
            else if (p.acceptKw("SHARD")) { p.expectKw("DURATION"); p.durationArg() } // accepted, storage-layer no-op
            else if (p.acceptKw("NAME")) rpName = p.ident()
            else more = false
          }
          return CreateDatabase(n, Some((rpName, dur, repl)))
        }
        if (p.acceptKw("USER")) {
          val name = p.ident()
          p.expectKw("WITH"); p.expectKw("PASSWORD")
          val pw = p.next() match {
            case TStr(s) => s
            case t       => throw ParseException(s"expected quoted password, found ${t.text}")
          }
          val admin = p.acceptKw("WITH") && {
            p.expectKw("ALL"); p.expectKw("PRIVILEGES"); true
          }
          return CreateUser(name, pw, admin)
        }
        if (p.acceptKw("RETENTION")) {
          p.expectKw("POLICY")
          val name = p.ident()
          p.expectKw("ON"); val db = p.ident()
          p.expectKw("DURATION")
          val dur = p.next() match {
            case TDur(t) => Lexer.durationUs(t)
            case TNum("0") => 0L // infinite retention
            case t => throw ParseException(s"expected duration, found ${t.text}")
          }
          p.expectKw("REPLICATION")
          val n = p.next() match {
            case TNum(x) => x.toInt
            case t       => throw ParseException(s"expected number, found ${t.text}")
          }
          val dflt = p.acceptKw("DEFAULT")
          return CreateRetentionPolicy(name, db, dur, n, dflt)
        }
        if (p.acceptKw("CONTINUOUS")) {
          p.expectKw("QUERY"); val name = p.ident()
          p.expectKw("ON"); val db = p.ident()
          // RESAMPLE [EVERY <dur>] [FOR <dur>] (influxql advanced CQ)
          var (everyUs, forUs) = (0L, 0L)
          if (p.acceptKw("RESAMPLE")) {
            def dur(): Long = p.next() match {
              case TDur(t) => Lexer.durationUs(t)
              case t => throw ParseException(s"expected duration, found ${t.text}")
            }
            if (p.acceptKw("EVERY")) everyUs = dur()
            if (p.acceptKw("FOR")) forUs = dur()
            if (everyUs == 0L && forUs == 0L)
              throw ParseException("RESAMPLE requires EVERY and/or FOR")
          }
          p.expectKw("BEGIN")
          val sel = p.parseSelect()
          if (sel.into.isEmpty)
            throw ParseException("continuous query requires SELECT ... INTO")
          p.expectKw("END")
          return CreateContinuousQuery(name, db, sel, everyUs, forUs)
        }
        if (p.acceptKw("SUBSCRIPTION")) {
          // CREATE SUBSCRIPTION "name" ON db.rp DESTINATIONS ALL|ANY 'url'[, 'url']
          val name = p.ident()
          p.expectKw("ON")
          val (db, rp) = p.dbMsmt() match {
            case (d, Some(r)) => (d, r)
            case _ => throw ParseException("subscription requires ON db.rp")
          }
          p.expectKw("DESTINATIONS")
          val mode =
            if (p.acceptKw("ALL")) "ALL"
            else { p.expectKw("ANY"); "ANY" }
          val dests = ListBuffer(p.next() match {
            case TStr(s) => s
            case t => throw ParseException(s"expected quoted destination, found ${t.text}")
          })
          while (p.acceptSym(",")) dests += (p.next() match {
            case TStr(s) => s
            case t => throw ParseException(s"expected quoted destination, found ${t.text}")
          })
          return CreateSubscription(name, db, rp, mode, dests.toList)
        }
        p.expectKw("PARTITION"); p.expectKw("KEY")
        // two argument orders accepted (language.go:15-36):
        //   CREATE PARTITION KEY t1,t2 ON db[.msmt]
        //   CREATE PARTITION KEY ON db[.msmt] WITH t1,t2  (normalized form)
        if (p.acceptKw("ON")) {
          val (db, m) = p.dbMsmt()
          p.expectKw("WITH")
          CreatePartitionKey(p.tagList(), db, m)
        } else {
          val tags = p.tagList()
          p.expectKw("ON")
          val (db, m) = p.dbMsmt()
          CreatePartitionKey(tags, db, m)
        }
      } else if (p.acceptKw("DROP")) {
        if (p.acceptKw("DATABASE")) return DropDatabase(p.ident())
        if (p.acceptKw("USER")) return DropUser(p.ident())
        if (p.acceptKw("MEASUREMENT")) return DropMeasurement(p.ident())
        if (p.acceptKw("SERIES")) {
          p.expectKw("FROM")
          val m = p.ident()
          return DeleteSeries(m,
            if (p.acceptKw("WHERE")) Some(p.parseExpr(0)) else None)
        }
        if (p.acceptKw("RETENTION")) {
          p.expectKw("POLICY"); val name = p.ident()
          p.expectKw("ON")
          return DropRetentionPolicy(name, p.ident())
        }
        if (p.acceptKw("CONTINUOUS")) {
          p.expectKw("QUERY"); val name = p.ident()
          p.expectKw("ON")
          return DropContinuousQuery(name, p.ident())
        }
        if (p.acceptKw("SUBSCRIPTION")) {
          val name = p.ident()
          p.expectKw("ON")
          return p.dbMsmt() match {
            case (d, Some(r)) => DropSubscription(name, d, r)
            case _ => throw ParseException("subscription requires ON db.rp")
          }
        }
        p.expectKw("PARTITION"); p.expectKw("KEY"); p.expectKw("ON")
        val (db, m) = p.dbMsmt()
        DropPartitionKey(db, m)
      } else if (p.acceptKw("REMOVE")) {
        p.expectKw("NODE")
        RemoveNode(p.ident())
      } else if (p.acceptKw("SET")) {
        if (p.acceptKw("PASSWORD")) {
          p.expectKw("FOR")
          val name = p.ident()
          p.expectSym("=")
          return p.next() match {
            case TStr(s) => SetPassword(name, s)
            case t       => throw ParseException(s"expected quoted password, found ${t.text}")
          }
        }
        p.expectKw("REPLICATION"); p.expectKw("FACTOR")
        val n = p.next() match {
          case TNum(x) => x.toInt
          case t       => throw ParseException(s"expected number, found ${t.text}")
        }
        if (p.acceptKw("ON")) { val (db, m) = p.dbMsmt(); SetReplicationFactor(n, Some(db), m) }
        else SetReplicationFactor(n, None, None)
      } else throw ParseException(s"unsupported admin statement: ${p.peek.text}")
    }
  }

  private def dbMsmt(): (String, Option[String]) = {
    val db = ident()
    if (acceptSym(".")) (db, Some(ident())) else (db, None)
  }
  private def tagList(): List[String] = {
    val tags = ListBuffer(ident())
    while (acceptSym(",")) tags += ident()
    tags.toList
  }
}

object Parser {
  def parse(q: String): Statement = new Parser(Lexer.tokenize(q)).parseStatement()
  def parseAll(q: String): Seq[Statement] = new Parser(Lexer.tokenize(q)).parseStatements()
}
