package graft.ql

import org.apache.spark.sql.{Column, DataFrame, SparkSession}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/** InfluxQL AST → DataFrame plan. The Spark-native replacement for the
  * reference's coordinator + merge tree (`service/coordinator.go:172-249`,
  * `service/merge/query_merge.go`): where the reference hand-rolls
  * partial-aggregate rewrite + k-way merge, we emit one declarative plan and
  * let Catalyst do partial/final aggregation, pushdown, and ordering.
  *
  * Semantics notes (divergences are deliberate, SURVEY §7.0):
  *   - Aggregates are EXACT (the reference's weighted merges of stddev/
  *     percentile/median are HTTP-merge approximations).
  *   - percentile() is nearest-rank (an actual point value), matching
  *     InfluxQL; median() interpolates like InfluxQL's even-count mean.
  *   - Division by zero yields 0 and `%` runs over integer casts — the
  *     reference's test-pinned shims (`query_merge.go:326-332`).
  *   - A bare field reference combined with GROUP BY time errors, like the
  *     reference's 400 (`service/query_handler_test.go:45-49`).
  *   - Output time column is epoch-µs LONG named `time`, bucket-aligned to
  *     the epoch (InfluxQL GROUP BY time alignment).
  *
  * Scale notes: every path is groupBy/window over the shuffled group keys —
  * no driver-side loops; fixed-point fields aggregate as exact integers so
  * results don't depend on partitioning.
  */
final class Translator(df: DataFrame, meta: TableMeta) {

  private val AGGS = Set("count", "sum", "mean", "min", "max", "spread", "stddev",
    "median", "percentile", "mode", "first", "last", "integral", "distinct")
  private val MULTIROW = Set("top", "bottom", "sample", "distinct", "mode", "percentile")
  private val TRANSFORMS = Set("derivative", "non_negative_derivative", "difference",
    "cumulative_sum", "moving_average", "elapsed", "holt_winters",
    "holt_winters_with_fit") ++
    SeriesAnalytics.FOLD_FNS

  private def time: Column = col(meta.timeCol)

  // tz('Zone') in effect for this query: time STRING literals are local
  // wall-clock in the zone (InfluxQL semantics), GROUP BY time buckets
  // align to local boundaries, fill spines step in local space
  private var tzZone: Option[String] = None

  // identifiers the current query references that this measurement does
  // not declare — bound to null columns (dialect empty-result behavior,
  // see run); operand() types the null per comparison context
  private var unknownNames: Set[String] = Set.empty

  // ---------------- entry

  def run(sel0: SelectStmt): DataFrame = {
    // field-wildcard aggregates: mean(*) expands to one call per declared
    // NUMERIC field, named <fn>_<field> (InfluxQL expands wildcards over
    // fields the function can aggregate — string/boolean columns would
    // fail analysis)
    val sel1 = sel0.copy(
      fields = sel0.fields.flatMap {
        case Field(Call(fn, List(Wildcard)), None) if AGGS(fn) =>
          meta.fields.filter(f => f.ftype == "float" || f.ftype == "integer")
            .map(f => Field(Call(fn, List(Ident(f.name))), Some(s"${fn}_${f.name}"))).toList
        case f => List(f.copy(expr = normTyped(f.expr)))
      },
      where = sel0.where.map(normTyped))
    // every named reference must resolve against this measurement NOW: an
    // unknown identifier that reaches Catalyst surfaces as a Spark
    // AnalysisException (an HTTP 500), not a dialect behavior (found by
    // TranslatorPropSpec's generated queries). InfluxDB 1.x answers
    // queries over nonexistent fields/tags with an EMPTY result and HTTP
    // 200 (only syntax errors are the 400 class), so the default here is
    // that dialect behavior: bind each unknown name to a typed-null
    // column (predicates and aggregates over it evaluate to null), and
    // when the SELECT references no known field at all, return the
    // translated schema with zero rows. `spark.graft.strictIdentifiers`
    // =true opts into a hard 400 instead (a lint mode for migrations —
    // a deliberate divergence, off by default to keep dashboards that
    // query fields absent from some measurements working).
    val knownNames = meta.fields.map(_.name).toSet ++ meta.tags +
      "time" + meta.timeCol
    val unknown = (sel1.fields.map(_.expr) ++ sel1.where).flatMap(collectIdents)
      .filterNot(knownNames).distinct
    if (unknown.nonEmpty &&
        df.sparkSession.conf.get("spark.graft.strictIdentifiers", "false").toBoolean)
      throw ParseException(s"unknown field or tag: '${unknown.head}'")
    val selIdents = sel1.fields.map(_.expr).flatMap(collectIdents)
      .filterNot(n => n.equalsIgnoreCase("time") || n == meta.timeCol)
    val emptyBySchema = selIdents.nonEmpty && selIdents.forall(unknown.contains)
    // Spark resolves withColumn case-INsensitively (caseSensitive stays
    // default-false session-wide) but InfluxQL identifiers are
    // case-sensitive: injecting a null for unknown 'Value' would silently
    // REPLACE a declared 'value' column. Bind case-colliding unknowns
    // under a reserved internal name and rewrite the query AST to
    // reference it — pinning each touched field's output alias to the
    // user's spelling first, so result column names are unchanged.
    val ren: Map[String, String] = unknown
      .filter(n => df.columns.exists(_.equalsIgnoreCase(n)))
      .map(n => n -> s"__unk_$n").toMap
    def renamed(e: Expr): Expr = e match {
      case Ident(n) if ren.contains(n)         => Ident(ren(n))
      case TypedIdent(n, h) if ren.contains(n) => TypedIdent(ren(n), h)
      case Call(f, a)   => Call(f, a.map(renamed))
      case Bin(o, l, r) => Bin(o, renamed(l), renamed(r))
      case Paren(x)     => Paren(renamed(x))
      case x            => x
    }
    val sel = if (ren.isEmpty) sel1 else sel1.copy(
      fields = sel1.fields.map { f =>
        if (collectIdents(f.expr).exists(ren.contains))
          Field(renamed(f.expr), Some(f.alias.getOrElse(exprName(f.expr))))
        else f
      },
      where = sel1.where.map(renamed))
    unknownNames = unknown.map(n => ren.getOrElse(n, n)).toSet
    val dfu = unknownNames.foldLeft(df)((d, n) =>
      d.withColumn(n, lit(null).cast("double")))
    tzZone = sel.tz // literals below parse under the query's zone
    val filtered0 = sel.where.map(w => dfu.where(predicate(w))).getOrElse(dfu)
    // durable time-bucket pruning: rebind the WHERE's constant time bounds
    // onto the `_tb` directory-partition column so a time-ranged query
    // reads only the shard-group buckets it touches (PartitionFilters at
    // the scan — the 100 TB path: a 1-day query over a year of data lists
    // one bucket directory, not 365). `_tb` is physical layout, never a
    // query-visible column — dropped here, before any projection logic.
    val filtered = meta.bucketUs.filter(_ => df.columns.contains("_tb")) match {
      case Some(b) =>
        val (loB, hiB) = whereTimeBounds(sel.where)
        val d1 = loB.map(v => filtered0.where(col("_tb") >= Math.floorDiv(v, b)))
          .getOrElse(filtered0)
        val d2 = hiB.map(v => d1.where(col("_tb") <= Math.floorDiv(v, b))).getOrElse(d1)
        d2.drop("_tb")
      case None =>
        if (df.columns.contains("_tb")) filtered0.drop("_tb") else filtered0
    }
    // tz('Zone'): GROUP BY time buckets align to LOCAL boundaries. The
    // WHERE filter above runs in UTC space (string literals already
    // resolved to the zone's UTC instants; epoch literals are absolute);
    // then the time axis shifts to wall-clock µs for all bucket math
    // (shift-compute-unshift — the integer bucket arithmetic is untouched),
    // and the output `time` unshifts back to the UTC instant of each local
    // boundary. DST is honored per row by from/to_utc_timestamp.
    val tzShift = sel.tz.filter(_ => sel.groupByTime.isDefined)
    val base0 = tzShift match {
      case Some(z) => filtered.withColumn(meta.timeCol,
        unix_micros(from_utc_timestamp(timestamp_micros(time), z)))
      case None => filtered
    }
    val tags = if (sel.groupByAllTags) meta.tags.toList else sel.groupByTags
    tags.foreach(t => if (!meta.isTag(t)) throw ParseException(s"'$t' is not a tag"))

    val calls = sel.fields.flatMap(f => collectCalls(f.expr))
    val hasAgg = calls.exists(c => AGGS(c.name) || MULTIROW(c.name))
    val hasTransform = calls.exists(c => TRANSFORMS(c.name))
    // derivative(mean(v), …): collectCalls stops at the transform, so look
    // one level into its arguments for the agg→transform pipeline form
    val aggInsideTransform = calls.exists(c => TRANSFORMS(c.name) &&
      c.args.exists { case Call(n, _) => AGGS(n); case _ => false })
    val bare = sel.fields.exists(f => collectIdents(f.expr).exists(n => !meta.isTag(n)) &&
      collectCalls(f.expr).isEmpty)

    val out =
      if (hasTransform) {
        if (aggInsideTransform && sel.groupByTime.isDefined)
          aggTransformSelect(base0, sel, tags) // derivative(mean(v)) GROUP BY time
        else if (hasAgg || aggInsideTransform || sel.groupByTime.isDefined)
          throw ParseException("transform functions cannot be combined with aggregates or time buckets")
        else transformSelect(base0, sel, tags)
      } else if (hasAgg) {
        if (bare) throw ParseException(
          "mixing aggregate and non-aggregate queries is not supported") // reference 400
        sel.fields match {
          case List(Field(Call(n @ ("top" | "bottom"), args), alias)) =>
            topBottom(base0, sel, tags, n, args, alias)
          case List(Field(Call("distinct", List(Ident(f))), alias)) =>
            distinctSelect(base0, sel, tags, f, alias)
          case List(Field(Call("sample", List(Ident(f), IntLit(n))), alias)) =>
            sampleSelect(base0, sel, tags, f, n.toInt, alias)
          case List(Field(Call("mode", List(Ident(f))), alias)) =>
            modeSelect(base0, sel, tags, f, alias)
          case List(Field(Call("percentile", List(Ident(f), p)), alias)) =>
            percentileSelect(base0, sel, tags, f, p, alias)
          case List(Field(Call("integral", args), alias)) =>
            integralSelect(base0, sel, tags, args, alias)
          case Field(Call(n @ ("max" | "min" | "first" | "last"), List(Ident(f))), alias)
              :: tagFields if tagFields.nonEmpty && tagFields.forall {
                case Field(Ident(t), _) => meta.isTag(t)
                case _                  => false } =>
            selectorWithTags(base0, sel, tags, n, f, alias,
              // collect, not map: the guard above proves every tagField is
              // Field(Ident, _), which the exhaustivity checker can't see
              tagFields.collect { case Field(Ident(t), a) => (t, a.getOrElse(t)) })
          case _ => aggSelect(base0, sel, tags)
        }
      } else rawSelect(base0, sel, tags)

    val unshifted = tzShift match {
      case Some(z) if out.columns.contains("time") =>
        out.withColumn("time",
          unix_micros(to_utc_timestamp(timestamp_micros(col("time")), z)))
      case _ => out
    }
    // positional safety net for paths that assemble their own output
    // (raw select, transforms): duplicate names break the stable-order
    // sort and the JSON serializer — rename later occurrences `_k`
    val deduped =
      if (unshifted.columns.distinct.length == unshifted.columns.length) unshifted
      else unshifted.toDF(uniquify(unshifted.columns.toSeq): _*)
    val sorted = sortLimit(deduped, sel, tags)
    val res = slimit(sorted, sel, tags)
    // no known field contributes to the SELECT → the dialect's empty
    // result, with the schema the query would have had (see above)
    if (emptyBySchema) res.where(lit(false)) else res
  }

  // ---------------- predicates

  /** Public WHERE-predicate translation (DELETE/DROP SERIES reuse it). */
  def wherePredicate(e: Expr): Column = predicate(e)

  private def predicate(e: Expr): Column = e match {
    case Bin("AND", l, r) => predicate(l) && predicate(r)
    case Bin("OR", l, r)  => predicate(l) || predicate(r)
    case Paren(x)         => predicate(x)
    case Bin("=~", l, r @ RegexLit(p)) => operand(l, other = r).rlike(p)
    case Bin("!~", l, r @ RegexLit(p)) => !operand(l, other = r).rlike(p)
    // time comparisons against constants additionally emit a REDUNDANT
    // bound on the raw parquet time column: the semantic filter on the
    // derived µs column cannot convert to a parquet predicate, so
    // row-group/partition pruning on the time axis — the dominant pruning
    // at scale — only happens via the raw bound. Which column is physical
    // depends on the file encoding (Tables): µs-TIMESTAMP files take exact
    // TIMESTAMP bounds on `ts` itself; ns-LONG files take ns bounds on
    // `ts_ns` (widened ±999 ns because ns is finer than the µs semantics).
    case Bin(op, l, r) if isTimeRef(l)
        && (meta.rawTimeTsUs.isDefined || meta.rawTimeNs.isDefined)
        && constTimeUs(r).isDefined =>
      val v = constTimeUs(r).get
      val base = compareOp(op, time, lit(v))
      val push = meta.rawTimeTsUs match {
        case Some(rawTs) =>
          val c = col(rawTs)
          val tv = timestamp_micros(lit(v)) // foldable → parquet-pushable literal
          op match {
            case ">=" => c >= tv
            case ">"  => c > tv
            case "<"  => c < tv
            case "<=" => c <= tv
            case "="  => c === tv
            case _    => lit(true)
          }
        case None =>
          val raw = col(meta.rawTimeNs.get)
          op match {
            case ">=" => raw >= v * 1000L
            case ">"  => raw > v * 1000L + 999L
            case "<"  => raw < v * 1000L
            case "<=" => raw <= v * 1000L + 999L
            case "="  => raw >= v * 1000L && raw <= v * 1000L + 999L
            case _    => lit(true)
          }
      }
      base && push
    case Bin(op, l, r)    =>
      // two KNOWN identifiers of conflicting type classes (numeric field
      // vs string tag, boolean vs string …) answer the dialect's empty
      // result — comparing the columns directly would implicitly cast
      // and fold into a runtime ANSI cast error (the HTTP-500 class)
      (identClass(l), identClass(r)) match {
        case (Some(a), Some(b)) if a != b => lit(null).cast("boolean")
        case _ =>
          val (lc, rc) = (operand(l, other = r), operand(r, other = l))
          op match {
            case "="         => lc === rc
            case "!=" | "<>" => lc =!= rc
            case "<"         => lc < rc
            case "<="        => lc <= rc
            case ">"         => lc > rc
            case ">="        => lc >= rc
            case o           => throw ParseException(s"unsupported predicate operator $o")
          }
      }
    case x => throw ParseException(s"unsupported WHERE expression $x")
  }

  /** Declared type class of a KNOWN identifier operand — None for
    * literals, time, expressions, and unknown (null-bound) names. */
  private def identClass(e: Expr): Option[String] = e match {
    case Ident(n) if unknownNames(n) || n.equalsIgnoreCase("time") => None
    case Ident(n) if meta.isTag(n) => Some("string")
    case Ident(n) if meta.fields.exists(_.name == n) =>
      Some(meta.field(n).ftype match {
        case "string"  => "string"
        case "boolean" => "boolean"
        case _         => "number"
      })
    case Paren(x) => identClass(x)
    case _        => None
  }

  private def isTimeRef(e: Expr): Boolean = e match {
    case Ident(n) => n.equalsIgnoreCase("time")
    case _        => false
  }

  private def compareOp(op: String, lc: Column, rc: Column): Column = op match {
    case "="         => lc === rc
    case "!=" | "<>" => lc =!= rc
    case "<"         => lc < rc
    case "<="        => lc <= rc
    case ">"         => lc > rc
    case ">="        => lc >= rc
    case o           => throw ParseException(s"unsupported predicate operator $o")
  }

  /** Constant-fold a time-comparison operand to epoch µs. */
  private def constTimeUs(e: Expr): Option[Long] = e match {
    case StrLit(s)      => Some(parseTimeUs(s))
    case IntLit(v)      => Some(v)
    case DurLit(us)     => Some(us)
    case NowLit         => Some(System.currentTimeMillis() * 1000L)
    case Bin("+", l, r) => for (a <- constTimeUs(l); b <- constTimeUs(r)) yield a + b
    case Bin("-", l, r) => for (a <- constTimeUs(l); b <- constTimeUs(r)) yield a - b
    case Paren(x)       => constTimeUs(x)
    case _              => None
  }

  /** `::` selectors: field/tag hints validate against the measurement's
    * declared kinds and then erase to plain identifiers (a tag and a field
    * can never share a column name here, so the hint is a compatibility
    * check, not a resolution step); cast hints survive to the leaf sites,
    * which wrap the column in the requested cast. */
  private def normTyped(e: Expr): Expr = e match {
    case TypedIdent(n, "field") =>
      if (!meta.fields.exists(_.name == n))
        throw ParseException(s"'$n' is not a field")
      Ident(n)
    case TypedIdent(n, "tag") =>
      if (!meta.isTag(n)) throw ParseException(s"'$n' is not a tag")
      Ident(n)
    case t: TypedIdent => t // cast hint — applied where the leaf resolves
    case Call(n, a)    => Call(n, a.map(normTyped))
    case Bin(o, l, r)  => Bin(o, normTyped(l), normTyped(r))
    case Paren(x)      => Paren(normTyped(x))
    case x             => x
  }

  private val CastTypes = Map(
    "integer" -> "long", "float" -> "double",
    "string" -> "string", "boolean" -> "boolean")

  /** WHERE operand; when the opposite side is `time`, literals become µs. */
  private def operand(e: Expr, other: Expr): Column = e match {
    case Ident(n) if n.equalsIgnoreCase("time") => time
    // unknown identifiers resolve to null (dialect empty-result behavior,
    // see run). Type the null from the OTHER side of the comparison: the
    // injected column is DOUBLE, and under ANSI a double-vs-string
    // comparison would fold `CAST('h0' AS DOUBLE)` into a runtime error
    // instead of the null-comparison the dialect needs.
    case Ident(n) if unknownNames(n) => other match {
      case StrLit(_) | RegexLit(_) => lit(null).cast("string")
      case BoolLit(_)              => lit(null).cast("boolean")
      // known-identifier comparand (WHERE nope = host): type the null from
      // ITS declared type — leaving it DOUBLE would implicitly cast the
      // string/boolean column and fold into a runtime ANSI cast error
      case Ident(k) if meta.isTag(k) => lit(null).cast("string")
      case Ident(k) if meta.fields.exists(_.name == k) =>
        meta.field(k).ftype match {
          case "string" | "boolean" => lit(null).cast(meta.field(k).ftype)
          case _                    => lit(null).cast("double")
        }
      case _                       => lit(null).cast("double")
    }
    case Ident(n)    => col(n)
    case TypedIdent(n, h) => col(n).cast(CastTypes(h))
    case StrLit(s) if isTimeRef(other) => lit(parseTimeUs(s))
    case StrLit(s)   => lit(s)
    case BoolLit(b)  => lit(b)
    case NumLit(v)   => lit(v)
    case IntLit(v)   => lit(v)
    case DurLit(us)  => lit(us)
    case NowLit      => lit(System.currentTimeMillis() * 1000L)
    case Bin("+", l, r) => operand(l, other) + operand(r, other)
    case Bin("-", l, r) => operand(l, other) - operand(r, other)
    case Paren(x)    => operand(x, other)
    case x           => throw ParseException(s"unsupported operand $x")
  }

  /** 'YYYY-MM-DD[ HH:MM:SS[.fff]]' or RFC3339 → epoch µs (UTC). */
  private def parseTimeUs(s: String): Long = {
    import java.time._
    val norm = s.replace("T", " ").stripSuffix("Z")
    val ldt =
      if (norm.length <= 10) LocalDate.parse(norm).atStartOfDay()
      else LocalDateTime.parse(norm.replace(" ", "T"))
    // under tz('Zone') a time string is LOCAL wall-clock (InfluxQL);
    // otherwise UTC. An explicit trailing Z means UTC either way.
    val instant = tzZone match {
      case Some(z) if !s.endsWith("Z") => ldt.atZone(ZoneId.of(z)).toInstant
      case _                           => ldt.toInstant(ZoneOffset.UTC)
    }
    instant.toEpochMilli * 1000L + (instant.getNano / 1000) % 1000
  }

  /** UTC µs → wall-clock µs in the query's zone (plan-time constants: the
    * fill spine steps in shifted space, so its bounds must shift too). */
  private def toWallUs(us: Long): Long = tzZone match {
    case Some(z) =>
      val zone = java.time.ZoneId.of(z)
      us + zone.getRules.getOffset(java.time.Instant.ofEpochMilli(us / 1000L))
        .getTotalSeconds * 1000000L
    case None => us
  }

  // ---------------- helpers

  private def collectCalls(e: Expr): List[Call] = e match {
    case c @ Call(n, args) if AGGS(n) || MULTIROW(n) || TRANSFORMS(n) => List(c)
    case Call(_, args) => args.flatMap(collectCalls)
    case Bin(_, l, r)  => collectCalls(l) ++ collectCalls(r)
    case Paren(x)      => collectCalls(x)
    case _             => Nil
  }

  private def collectIdents(e: Expr): List[String] = e match {
    case Ident(n)      => List(n)
    case TypedIdent(n, _) => List(n)
    case Call(_, args) => args.flatMap(collectIdents)
    case Bin(_, l, r)  => collectIdents(l) ++ collectIdents(r)
    case Paren(x)      => collectIdents(x)
    case _             => Nil
  }

  private def scaleOf(f: String): Option[Long] =
    // unknown identifiers (null-bound, see run) have no fixed-point scale;
    // a TAG in a field position still hits meta.field's 400 below
    if (unknownNames(f)) None else meta.field(f).scale

  /** Exact integer representation of a fixed-point field. */
  private def fx(f: String): Column = scaleOf(f) match {
    case Some(k) => round(col(f) * k).cast("long")
    case None    => col(f).cast("long")
  }
  private def unscale(c: Column, f: String): Column =
    c.cast("double") / scaleOf(f).getOrElse(1L).toDouble

  /** `SELECT max(v), host [, tag…]` — a bare SELECTOR alongside tag keys
    * returns the SELECTED ROW's tag values (influxql selector semantics;
    * the same per-row carry top/bottom already do). One argmin/argmax per
    * group via a lexicographic struct extremum: (value, time, tags…) for
    * max/min, (time, value, tags…) for first/last — the full struct makes
    * the chosen row deterministic under ties at any partitioning. */
  private def selectorWithTags(base: DataFrame, sel: SelectStmt, tags: List[String],
      fn: String, f: String, alias: Option[String],
      outTags: List[(String, String)]): DataFrame = {
    val withB = sel.groupByTime.map(withBucket(base, _, sel.groupByTimeOffset)).getOrElse(base)
    val groupCols = (if (sel.groupByTime.isDefined) List(bucket) else Nil) ++ tags.map(col)
    val key = fn match {
      case "max" | "min" => struct(col(f) +: time +: outTags.map(t => col(t._1)): _*)
      case _             => struct(time +: col(f) +: outTags.map(t => col(t._1)): _*)
    }
    val picked = fn match {
      case "max" | "last" => max(key)
      case _              => min(key)
    }
    val name = alias.getOrElse(fn)
    val best = col("__best")
    withB.groupBy(groupCols: _*).agg(picked.as("__best"))
      .select(((if (sel.groupByTime.isDefined) List(col("time")) else Nil)
        ++ tags.map(col)
        :+ best.getField(f).as(name))
        ++ outTags.map { case (t, a) => best.getField(t).as(a) }: _*)
  }

  private def bucket: Column = col("time")

  private def withBucket(d: DataFrame, iv: Long, off: Long): DataFrame =
    // epoch-aligned (optionally offset) bucket via exact integer
    // arithmetic: Column./ is double division and epoch-µs values exceed
    // 2^53, so (t/iv)*iv would corrupt bucket boundaries at µs resolution
    d.withColumn("time", time - pmod(time - lit(off), lit(iv)))

  // ---------------- raw path

  private def rawSelect(base: DataFrame, sel: SelectStmt, tags: List[String]): DataFrame = {
    if (sel.groupByTime.isDefined)
      throw ParseException("GROUP BY time requires an aggregate function") // reference 400
    val cols = sel.fields.flatMap {
      case Field(Wildcard, _) => // SELECT * expands to all tags + fields
        (meta.tags.filterNot(tags.contains) ++ meta.fields.map(_.name)).map(col)
      case Field(RegexLit(p), _) => // SELECT /re/ — unanchored match over tag+field keys
        val re = java.util.regex.Pattern.compile(p)
        val matched = (meta.tags.filterNot(tags.contains) ++ meta.fields.map(_.name))
          .filter(n => re.matcher(n).find())
        if (matched.isEmpty) throw ParseException(s"no field or tag key matches /$p/")
        matched.map(col)
      case Field(TypedWildcard("field"), _) => meta.fields.map(f => col(f.name))
      case Field(TypedWildcard("tag"), _) =>
        meta.tags.filterNot(tags.contains).map(col)
      case Field(Ident(n), alias) => Seq(col(n).as(alias.getOrElse(n)))
      case Field(TypedIdent(n, h), alias) =>
        Seq(col(n).cast(CastTypes(h)).as(alias.getOrElse(n)))
      case Field(e, alias)        => Seq(scalarCol(e, col(_)).as(alias.getOrElse(exprName(e))))
    }
    base.select((time.as("time") +: tags.map(col)) ++ cols: _*)
  }

  // ---------------- aggregate path

  private def aggSelect(base: DataFrame, sel: SelectStmt, tags: List[String]): DataFrame = {
    val withB = sel.groupByTime.map(withBucket(base, _, sel.groupByTimeOffset)).getOrElse(base)
    val groupCols = (if (sel.groupByTime.isDefined) List(bucket) else Nil) ++ tags.map(col)

    var aggIdx = 0
    var aggExprs = Vector.empty[Column]
    def addAgg(c: Column): Column = {
      val nm = s"__agg$aggIdx"; aggIdx += 1
      aggExprs :+= c.as(nm)
      col(nm)
    }

    // first pass: register aggregate sub-expressions, remember post-agg expr
    val outCols = sel.fields.map { case Field(e, alias) =>
      val post = buildAgg(e, addAgg)
      (post, alias.getOrElse(exprName(e)))
    }

    val grouped =
      if (groupCols.isEmpty) withB.agg(aggExprs.head, aggExprs.tail: _*)
      else withB.groupBy(groupCols: _*).agg(aggExprs.head, aggExprs.tail: _*)

    // InfluxDB dedupes repeated output names (two mean(...) fields emit
    // `mean`, `mean_1`) — without it the fill/sort references below are
    // ambiguous and die in analysis (found by TranslatorPropSpec)
    // seed with the group-by output names ("time" bucket + tags): an
    // aliased aggregate like `SELECT mean(v) AS host … GROUP BY host`
    // must not collide with the tag column it groups by, or applyFill's
    // references become ambiguous and die in analysis
    val reserved = (if (sel.groupByTime.isDefined) List("time") else Nil) ++ tags
    val outNames = uniquify(outCols.map(_._2), reserved)
    val projected = grouped.select(
      (groupCols.map {
        c => c
      } ++ outCols.zip(outNames).map { case ((c, _), n) => c.as(n) }): _*)

    applyFill(projected, sel, tags, outNames)
  }

  /** First occurrence keeps its name; later duplicates get `_1`, `_2`, …
    * (InfluxDB's duplicate-column convention). `reserved` names count as
    * already seen — the first occurrence in `names` renames to `_1`. */
  private def uniquify(names: Seq[String], reserved: Seq[String] = Nil): Seq[String] = {
    val seen = scala.collection.mutable.Map.empty[String, Int]
    reserved.foreach(r => seen(r) = 1)
    names.map { n =>
      val k = seen.getOrElse(n, 0); seen(n) = k + 1
      if (k == 0) n else s"${n}_$k"
    }
  }

  /** Translate an expression over aggregates; `reg` registers an aggregate
    * column and returns its post-aggregation reference. */
  private def buildAgg(e: Expr, reg: Column => Column): Column = e match {
    // count(distinct f): exact distributed distinct-count (expands to a
    // two-phase partial/final aggregate under Catalyst)
    case Call("count", List(Call("distinct", List(Ident(f))))) =>
      reg(count_distinct(col(f)))
    case Call("count", List(Ident(f)))  => reg(count(col(f)))
    case Call("count", List(Wildcard))  => reg(count(lit(1)))
    case Call("sum", List(Ident(f))) => scaleOf(f) match {
      case Some(_) => unscale(reg(sum(fx(f))), f) // exact fixed-point path
      case None    => reg(sum(col(f)))            // unscaled: raw sum
    }
    case Call("mean", List(Ident(f))) => scaleOf(f) match {
      case Some(k) => reg(sum(fx(f))).cast("double") / (lit(k.toDouble) * reg(count(col(f))))
      case None    => reg(avg(col(f)))
    }
    case Call("min", List(Ident(f)))    => reg(min(col(f)))
    case Call("max", List(Ident(f)))    => reg(max(col(f)))
    case Call("spread", List(Ident(f))) => reg(max(col(f))) - reg(min(col(f)))
    case Call("first", List(Ident(f))) =>
      reg(min_by(col(f), struct(time, col(f))))
    case Call("last", List(Ident(f))) =>
      reg(max_by(col(f), struct(time, col(f))))
    case Call("stddev", List(Ident(f))) => scaleOf(f) match {
      case Some(k) =>
        // exact sample stddev from integer moments; squared sum in
        // DECIMAL(38,0) so it cannot wrap at scale (EventAggs e_stddev)
        val s1 = reg(sum(fx(f))).cast("double")
        val s2 = reg(sum(fx(f).cast("decimal(38,0)") * fx(f))).cast("double")
        val n = reg(count(col(f)))
        sqrt((s2 / (k.toDouble * k) - (s1 / k) * (s1 / k) / n.cast("double"))
          / (n - 1).cast("double"))
      case None => reg(stddev_samp(col(f)))
    }
    case Call("percentile", List(Ident(f), pArg)) => // multi-row selector: only valid alone (percentileSelect)
      throw ParseException("percentile() cannot be combined with other fields") // reference 400
    case Call("median", List(Ident(f))) => scaleOf(f) match {
      // exact interpolation over fixed-point integers (k or k+0.5 exactly)
      case Some(_) => unscale(reg(expr(s"percentile(${fxSql(f)}, 0.5)")), f)
      case None    => reg(expr(s"percentile($f, 0.5)"))
    }
    case Call("integral", _) => // multi-row transform: only valid alone (integralSelect)
      throw ParseException("integral() cannot be combined with other fields") // reference 400
    case Bin(op, l, r) =>
      val (lc, rc) = (buildAgg(l, reg), buildAgg(r, reg))
      op match {
        case "+" => lc + rc
        case "-" => lc - rc
        case "*" => lc * rc
        case "/" => when(rc === 0, lit(0.0)).otherwise(lc / rc) // div-by-zero→0 shim
        case "%" => when(rc.cast("long") === 0, lit(0L))
          .otherwise(lc.cast("long") % rc.cast("long"))
        case o => throw ParseException(s"unsupported operator $o on aggregates")
      }
    case Paren(x)  => buildAgg(x, reg)
    case NumLit(v) => lit(v)
    case IntLit(v) => lit(v)
    case Call(fn, List(arg)) if ScalarFns.contains(fn) =>
      ScalarFns(fn)(buildAgg(arg, reg))
    case Call(fn, List(a, b)) if ScalarFns2.contains(fn) =>
      ScalarFns2(fn)(buildAgg(a, reg), buildAgg(b, reg))
    case x => throw ParseException(s"unsupported aggregate expression $x")
  }

  private def fxSql(f: String): String = scaleOf(f) match {
    case Some(k) => s"CAST(round($f * $k) AS BIGINT)"
    case None    => s"CAST($f AS BIGINT)"
  }

  /** Scalar function surface (query_merge.go:211-267) + extras. */
  private val ScalarFns: Map[String, Column => Column] = Map(
    "abs" -> ((c: Column) => abs(c)), "acos" -> ((c: Column) => acos(c)),
    "asin" -> ((c: Column) => asin(c)), "atan" -> ((c: Column) => atan(c)),
    "ceil" -> ((c: Column) => ceil(c)), "cos" -> ((c: Column) => cos(c)),
    "floor" -> ((c: Column) => floor(c)), "log" -> ((c: Column) => log(c)),
    "log2" -> ((c: Column) => log2(c)), "log10" -> ((c: Column) => log10(c)),
    "round" -> ((c: Column) => round(c, 0)), "sin" -> ((c: Column) => sin(c)),
    "sqrt" -> ((c: Column) => sqrt(c)), "tan" -> ((c: Column) => tan(c)),
    "exp" -> ((c: Column) => exp(c)), "ln" -> ((c: Column) => log(c)))

  /** Two-argument scalar surface (influxql 1.x math: pow(x, y),
    * atan2(y, x), log(x, b) = log base b). log resolves via ln(x)/ln(b) —
    * the same IEEE double sequence the oracle spells out, sidestepping
    * DuckDB's reversed log(b, x) argument order. */
  private val ScalarFns2: Map[String, (Column, Column) => Column] = Map(
    "pow"   -> ((a: Column, b: Column) => pow(a, b)),
    "atan2" -> ((a: Column, b: Column) => atan2(a, b)),
    "log"   -> ((a: Column, b: Column) => log(a) / log(b)))

  private def scalarCol(e: Expr, leaf: String => Column): Column = e match {
    case Ident(n)  => leaf(n)
    case TypedIdent(n, h) => leaf(n).cast(CastTypes(h))
    case NumLit(v) => lit(v)
    case IntLit(v) => lit(v)
    case Paren(x)  => scalarCol(x, leaf)
    case Call(fn, List(arg)) if ScalarFns.contains(fn) => ScalarFns(fn)(scalarCol(arg, leaf))
    case Call(fn, List(a, b)) if ScalarFns2.contains(fn) =>
      ScalarFns2(fn)(scalarCol(a, leaf), scalarCol(b, leaf))
    case Bin(op, l, r) =>
      val (lc, rc) = (scalarCol(l, leaf), scalarCol(r, leaf))
      op match {
        case "+" => lc + rc
        case "-" => lc - rc
        case "*" => lc * rc
        case "/" => when(rc === 0, lit(0.0)).otherwise(lc / rc)
        case "%" => when(rc.cast("long") === 0, lit(0L))
          .otherwise(lc.cast("long") % rc.cast("long"))
        case o => throw ParseException(s"unsupported operator $o")
      }
    case x => throw ParseException(s"unsupported scalar expression $x")
  }

  private def exprName(e: Expr): String = e match {
    case Call(n, _) => n // InfluxDB names output columns after the function
    case Ident(n)   => n
    case TypedIdent(n, _) => n
    case Bin(_, l, _) => exprName(l)
    case Paren(x)   => exprName(x)
    case _          => "expr"
  }

  // ---------------- multi-row aggregates

  /** Shared GROUP BY time(iv[,off]) handling for the multi-row selectors
    * (top/bottom/distinct/mode/percentile/sample/integral): the reference
    * merges these WITHIN each time step (`service/coordinator.go:128-161`;
    * `service/merge/calls.go:46-73,252-333`), so the window/group partition
    * must include the offset-aware bucket. Returns (frame with `__bucket`,
    * partition columns, output time prefix). */
  private def multirowBucket(base: DataFrame, sel: SelectStmt, tags: List[String])
      : (DataFrame, Seq[Column], Seq[Column]) = sel.groupByTime match {
    case Some(iv) =>
      val d = base.withColumn("__bucket",
        time - pmod(time - lit(sel.groupByTimeOffset), lit(iv)))
      (d, col("__bucket") +: tags.map(col), Seq(col("__bucket").as("time")))
    case None => (base, tags.map(col), Nil)
  }

  private def topBottom(base: DataFrame, sel: SelectStmt, tags: List[String],
      fn: String, args: List[Expr], alias: Option[String]): DataFrame = {
    val (f, tagKeys, n) = args match {
      case List(Ident(x), IntLit(k)) => (x, Nil, k.toInt)
      case _ => // tag-qualified form: top(field, tag_key…, N)
        val idents = args.collect { case Ident(x) => x }
        val k = args.lastOption.collect { case IntLit(k) => k.toInt }
          .getOrElse(throw ParseException(s"$fn(field[, tag_key…], N) expected"))
        if (idents.length < 2 || args.length != idents.length + 1)
          throw ParseException(s"$fn(field[, tag_key…], N) expected")
        (idents.head, idents.tail, k)
    }
    tagKeys.foreach(t => if (!meta.isTag(t)) throw ParseException(s"'$t' is not a tag"))
    // GROUP BY time(iv) selects top/bottom N PER BUCKET (InfluxQL)
    val (bucketed, parts, _) = multirowBucket(base, sel, tags)
    // deterministic total order: value, then time, then the tag values
    val ord = (if (fn == "top") Seq(col(f).desc, time.asc) else Seq(col(f).asc, time.asc)) ++
      tagKeys.map(col(_).asc)
    val name = alias.getOrElse(fn)
    if (tagKeys.isEmpty) {
      val w = Window.partitionBy(parts: _*).orderBy(ord: _*)
      bucketed.withColumn("__rn", row_number().over(w))
        .where(col("__rn") <= n)
        .select(time.as("time") +: tags.map(col) :+ col(f).as(name): _*)
    } else {
      // InfluxQL tag-qualified selection: the extreme value PER DISTINCT
      // TAG COMBINATION first, then top/bottom N among those — each tag
      // combo appears at most once per bucket, and the tag columns join
      // the output. Stage 1 is a rank window partitioned by the tag
      // combination (one shuffle, rank limit pushed as WindowGroupLimit).
      // Stage 2 without GROUP BY is a GLOBAL top-N: ord extended by the
      // tag keys is a total order over the per-combo survivors, so
      // orderBy(ord).limit(n) plans as TakeOrdered — per-partition top-n
      // + one tiny merge, no global window, no extra exchange, at any tag
      // cardinality (VERDICT r15 #8: the SLIMIT discipline). Under
      // GROUP BY the rank window keeps the bucket partition (already
      // partitioned — lint-clean).
      val w1 = Window.partitionBy(parts ++ tagKeys.map(col): _*).orderBy(ord: _*)
      val perCombo =
        bucketed.withColumn("__rn1", row_number().over(w1)).where(col("__rn1") === 1)
      val picked =
        if (parts.isEmpty) perCombo.orderBy(ord: _*).limit(n)
        else {
          val w2 = Window.partitionBy(parts: _*).orderBy(ord: _*)
          perCombo.withColumn("__rn2", row_number().over(w2))
            .where(col("__rn2") <= n)
        }
      picked.select((time.as("time") +: tags.map(col)) ++
        (col(f).as(name) +: tagKeys.map(col)): _*)
    }
  }

  private def distinctSelect(base: DataFrame, sel: SelectStmt, tags: List[String],
      f: String, alias: Option[String]): DataFrame = {
    val (d, _, timeOut) = multirowBucket(base, sel, tags)
    d.select(timeOut ++ tags.map(col) :+ col(f).as(alias.getOrElse("distinct")): _*)
      .distinct()
  }

  /** Exact mode with deterministic (count DESC, value ASC) tie-break —
    * strictly better than the reference's mode-of-modes (calls.go:305-333);
    * per time bucket under GROUP BY time (calls.go:305-333 runs inside the
    * coordinator's per-step merge, coordinator.go:128-161). */
  private def modeSelect(base: DataFrame, sel: SelectStmt, tags: List[String],
      f: String, alias: Option[String]): DataFrame = {
    val (d, parts, timeOut) = multirowBucket(base, sel, tags)
    val counted = d.groupBy((parts :+ col(f)): _*).agg(count(lit(1)).as("__cnt"))
    val w = Window.partitionBy(parts: _*).orderBy(col("__cnt").desc, col(f).asc)
    val name = alias.getOrElse("mode")
    val out = counted.withColumn("__rn", row_number().over(w)).where(col("__rn") === 1)
      .select(timeOut ++ tags.map(col) :+ col(f).as(name): _*)
    applyFill(out, sel, tags, Seq(name)) // single row per bucket → fillable
  }

  /** InfluxQL percentile: nearest-rank, returns an actual point value —
    * one per (bucket, tags) partition under GROUP BY time. */
  private def percentileSelect(base: DataFrame, sel: SelectStmt, tags: List[String],
      f: String, p: Expr, alias: Option[String]): DataFrame = {
    val pv = p match {
      case IntLit(v) => v.toDouble
      case NumLit(v) => v
      case _ => throw ParseException("percentile(field, N) expected")
    }
    val (d, parts, timeOut) = multirowBucket(base, sel, tags)
    val w = Window.partitionBy(parts: _*).orderBy(col(f).asc, time.asc)
    val wAll = Window.partitionBy(parts: _*)
    val name = alias.getOrElse("percentile")
    val out = d.withColumn("__rn", row_number().over(w))
      .withColumn("__n", count(lit(1)).over(wAll))
      .where(col("__rn") === ceil(lit(pv) / 100.0 * col("__n")).cast("long"))
      .select(timeOut ++ tags.map(col) :+ col(f).as(name): _*)
    applyFill(out, sel, tags, Seq(name)) // single row per bucket → fillable
  }

  /** Trapezoidal integral per series in units of field·unit (EventAggs
    * e_integral; exact integer terms, DECIMAL accumulation). Under
    * GROUP BY time the partition includes the bucket, so each bucket
    * integrates only its own consecutive-point pairs (boundary-crossing
    * pairs contribute to neither bucket — documented divergence from
    * InfluxQL's boundary interpolation; the reference rejects integral in
    * its merge layer outright, query_merge.go:171-184). */
  private def integralSelect(base: DataFrame, sel: SelectStmt, tags: List[String],
      args: List[Expr], alias: Option[String]): DataFrame = {
    val f = args.headOption match {
      case Some(Ident(x)) => x
      case _ => throw ParseException("integral(field[, unit]) expected")
    }
    val unitUs = args.collectFirst { case DurLit(us) => us }.getOrElse(1000000L)
    val (d, parts, timeOut) = multirowBucket(base, sel, tags)
    val series = Window.partitionBy(parts: _*).orderBy(time.asc)
    val aggCol = scaleOf(f) match {
      case Some(k) => // exact integer trapezoid terms, DECIMAL accumulation
        sum((fx(f) + col("__pc")).cast("decimal(38,0)") * (time - col("__pt")))
          .cast("double") / (2.0 * k * unitUs)
      case None =>
        sum((col(f) + col("__pc")) * (time - col("__pt")).cast("double")) / (2.0 * unitUs)
    }
    val name = alias.getOrElse("integral")
    val out = d
      .withColumn("__pc", scaleOf(f) match {
        case Some(_) => lag(fx(f), 1).over(series)
        case None    => lag(col(f), 1).over(series)
      })
      .withColumn("__pt", lag(time, 1).over(series))
      .where(col("__pt").isNotNull)
      .groupBy(parts: _*)
      .agg(aggCol.as(name))
      .select(timeOut ++ tags.map(col) :+ col(name): _*)
    applyFill(out, sel, tags, Seq(name)) // single row per bucket → fillable
  }

  /** Cross-engine deterministic draw key for sample(): the Lehmer/MINSTD
    * scramble (ts mod M)·48271 mod M with M = 2³¹−1. sample() is
    * non-deterministic by spec (calls.go:136-151), so ANY fixed uniform
    * choice is valid — this one is chosen because every SQL engine
    * computes the pure-BIGINT arithmetic identically (making the draw
    * oracle-checkable, like the md5 key it replaces) at two integer ops
    * per row instead of a string hash: the md5 form measured 1.25–1.45×
    * on the sample gates at the ×100-events decade. Products stay ≤ 2⁴⁷,
    * far from either engine's BIGINT overflow. Ties (same timestamp)
    * break on the sampled value, so equal sort keys imply equal output
    * tuples. */
  private def sampleKey: Column =
    time % 2147483647L * 48271L % 2147483647L

  private def sampleSelect(base: DataFrame, sel: SelectStmt, tags: List[String],
      f: String, n: Int, alias: Option[String]): DataFrame = {
    // seeded-deterministic pseudo-random sample: md5-hash order (see
    // sampleKey); N drawn per (bucket, tags) partition under GROUP BY time
    val (d, parts, _) = multirowBucket(base, sel, tags)
    if (parts.isEmpty)
      // ungrouped: same hash order + same N, but through orderBy().limit()
      // — Spark's distributed TakeOrdered (per-partition top-N + driver
      // merge of N-row heads) instead of a single-task global window
      d.orderBy(sampleKey, time, col(f))
        .limit(n)
        .select(time.as("time") +: tags.map(col) :+ col(f).as(alias.getOrElse("sample")): _*)
    else {
      val w = Window.partitionBy(parts: _*).orderBy(sampleKey, time, col(f))
      d.withColumn("__rn", row_number().over(w))
        .where(col("__rn") <= n)
        .select(time.as("time") +: tags.map(col) :+ col(f).as(alias.getOrElse("sample")): _*)
    }
  }

  // ---------------- transform-over-aggregate (derivative(mean(v)) GROUP BY time)

  /** InfluxQL's agg→transform pipeline: aggregate per (bucket, tags) first,
    * then run the transform over the BUCKET series. The unit argument
    * defaults to the GROUP BY time interval (InfluxQL semantics for
    * transforms over aggregates). The reference's merge layer rejects
    * transforms entirely (query_merge.go:171-184) — first-class here. */
  private def aggTransformSelect(base: DataFrame, sel: SelectStmt,
      tags: List[String]): DataFrame = sel.fields match {
    case List(Field(Call(tfn, tArgs), alias)) if TRANSFORMS(tfn) =>
      val inner = tArgs.headOption match {
        case Some(c @ Call(n, _)) if AGGS(n) => c
        case _ => throw ParseException(
          s"$tfn(<aggregate>(field)[, args]) expected under GROUP BY time")
      }
      val aggSel = SelectStmt(List(Field(inner, Some("__v"))), sel.from, sel.where,
        sel.groupByTime, sel.groupByTags, sel.groupByAllTags, FillNone,
        orderDesc = false, None, None, None, None, None, sel.groupByTimeOffset)
      val agged = aggSelect(base, aggSel, tags)
      // analytics recurrences (EMA family, RSI, CMO, Kaufman, Holt-Winters)
      // run as per-series folds over the bucket series — SeriesAnalytics
      if (SeriesAnalytics.FOLD_FNS(tfn)) {
        val n = tArgs.collectFirst { case IntLit(k) => k.toInt }
          .getOrElse(throw ParseException(s"$tfn(agg(field), N) expected"))
        return SeriesAnalytics(agged, tags, "__v", tfn, n, alias.getOrElse(tfn))
      }
      if (tfn == "holt_winters" || tfn == "holt_winters_with_fit") {
        val ints = tArgs.collect { case IntLit(k) => k.toInt }
        if (ints.length != 2)
          throw ParseException(s"$tfn(agg(field), N, S) expected")
        return SeriesAnalytics.applyHoltWinters(agged, tags, "__v",
          ints(0), ints(1), sel.groupByTime.get, alias.getOrElse(tfn),
          withFit = tfn == "holt_winters_with_fit")
      }
      // cumulative_sum over sum(<scaled field>) (VERDICT r15 #8): the
      // bucket series can hold millions of rows (time(1s) over a year ≈
      // 31M buckets) and the generic window below would single-task it
      // when there are no tags. The inner sum of a fixed-point field is
      // an exact integer per bucket, and integer addition is order-free —
      // so the prefix sum chunks by bucket-key range (per-chunk
      // PARTITIONED windows + broadcast chunk-total offsets, the
      // chunkedCumSum shape) with a bit-identical result at any chunking.
      // The oracle replays the same integer form (cumsum cents, divide
      // once at the end).
      if (tfn == "cumulative_sum") {
        val scaledSum = inner match {
          case Call("sum", List(Ident(f))) => scaleOf(f)
          case _ => None
        }
        scaledSum.flatMap(k =>
          chunkedAggCumSum(agged, tags, k, alias.getOrElse(tfn)))
          .foreach(return _)
      }
      val unitUs = tArgs.collectFirst { case DurLit(us) => us }
        .getOrElse(sel.groupByTime.get)
      def tcolFor(series: org.apache.spark.sql.expressions.WindowSpec): Column = {
        lazy val dv = (col("__v") - lag(col("__v"), 1).over(series)).cast("double")
        lazy val dt = (col("time") - lag(col("time"), 1).over(series)).cast("double") / unitUs
        tfn match {
          case "difference" => dv
          case "derivative" => when(dt > 0, dv / dt)
          case "non_negative_derivative" => when(dt > 0 && dv / dt >= 0, dv / dt)
          case "cumulative_sum" =>
            sum(col("__v")).over(series.rowsBetween(Window.unboundedPreceding, 0))
          case "moving_average" =>
            val n = tArgs.collectFirst { case IntLit(k) => k.toInt }
              .getOrElse(throw ParseException("moving_average(agg(field), N) expected"))
            avg(col("__v")).over(series.rowsBetween(-(n - 1), 0))
          case "elapsed" =>
            ((col("time") - lag(col("time"), 1).over(series)) / unitUs).cast("long")
          case o => throw ParseException(s"unsupported transform $o over aggregates")
        }
      }
      val name = alias.getOrElse(tfn)
      // the bucket series can hold millions of rows (time(1s) over a year
      // ≈ 31M buckets) — same chunked fold as raw transforms for the
      // bounded-lookback family; cumulative_sum stays sequential
      val lookback = tfn match {
        case "difference" | "derivative" | "non_negative_derivative" | "elapsed" =>
          Some(1)
        case "moving_average" =>
          tArgs.collectFirst { case IntLit(n) => math.max(n.toInt - 1, 1) }
        case _ => None
      }
      lookback.foreach { k =>
        chunkedFold(agged, tags, "time", k, w => Seq((tcolFor(w), name)))
          .foreach(return _)
      }
      val series = Window.partitionBy(tags.map(col): _*).orderBy(col("time").asc)
      agged.select((col("time") +: tags.map(col)) :+ tcolFor(series).as(name): _*)
        .where(col(name).isNotNull)
    case _ => throw ParseException(
      "a transform over an aggregate must be the only selected field")
  }

  // ---------------- transform path (derivative & friends)

  private def transformSelect(base: DataFrame, sel: SelectStmt, tags: List[String]): DataFrame = {
    // analytics recurrences over the raw series: per-series fold (input =
    // the stored double values, identical bits on any engine)
    sel.fields match {
      case List(Field(Call(fn, args), alias)) if SeriesAnalytics.FOLD_FNS(fn) =>
        val f = args.headOption match {
          case Some(Ident(x)) => x
          case _ => throw ParseException(s"$fn(field, N) expected")
        }
        val n = args.collectFirst { case IntLit(k) => k.toInt }
          .getOrElse(throw ParseException(s"$fn(field, N) expected"))
        val in = base.select(time.as("time") +: tags.map(col) :+ col(f).cast("double").as("__v"): _*)
        return SeriesAnalytics(in, tags, "__v", fn, n, alias.getOrElse(fn))
      case List(Field(Call("holt_winters", _), _)) =>
        throw ParseException("holt_winters requires an aggregate and GROUP BY time")
      case _ =>
    }
    // Scalable fold path. A per-series window parallelizes only as far as
    // the SERIES COUNT: Window.partitionBy() with no partitions funnels
    // the whole measurement through ONE task (Spark warns "No Partition
    // Defined"), and GROUP BY over a low-cardinality tag caps at a
    // handful of tasks no matter the cluster width. For the bounded-
    // lookback folds (lag-1 family + moving_average's n-row frame) the
    // fold at any row depends on at most k predecessors, so each series
    // can be cut into P time-range chunks folded in parallel, with only
    // the rows whose frame straddles a chunk boundary repaired against
    // the per-chunk k-tails afterwards. Bit-exact vs the sequential
    // window: lag reads the same neighbor, and a sliding frame folds the
    // same n rows in the same order — no arithmetic is re-associated.
    // (Bit-exactness assumes (series, time) is unique — the store's
    // duplicate-point semantics guarantee it. With duplicate timestamps
    // BOTH paths — sequential window included — read an arbitrary tied
    // neighbor, so the chunked path matches the sequential one only up to
    // the same tie nondeterminism.)
    // cumulative_sum has unbounded lookback, so the k-tail repair doesn't
    // apply — but over a FIXED-POINT field the running sum is a BIGINT
    // prefix sum, which IS associative, so a two-pass chunked prefix
    // (in-chunk prefix + broadcast per-chunk offsets) reproduces the
    // sequential fold bit-exactly (chunkedCumSum below). Unscaled double
    // fields keep the sequential window: chunk-prefix addition would
    // re-associate double summation.
    sel.fields match {
      case List(Field(Call("cumulative_sum", List(Ident(f))), alias))
          if scaleOf(f).isDefined =>
        chunkedCumSum(base, tags, f, alias.getOrElse("cumulative_sum"))
          .foreach(return _)
      case _ =>
    }
    val lookbacks = sel.fields.map {
      case Field(Call(fn, args), _) => fn match {
        case "difference" | "derivative" | "non_negative_derivative" | "elapsed" =>
          Some(1)
        case "moving_average" =>
          args.collectFirst { case IntLit(k) => math.max(k.toInt - 1, 1) }
        case _ => None
      }
      case _ => None
    }
    if (lookbacks.forall(_.isDefined)) {
      val mk = (w: org.apache.spark.sql.expressions.WindowSpec) => sel.fields.map {
        case Field(Call(fn, args), alias) =>
          (transformCol(fn, args, w), alias.getOrElse(fn))
        case f => throw ParseException(s"unsupported field in transform query: $f")
      }
      chunkedFold(base, tags, meta.timeCol, lookbacks.flatten.max, mk)
        .foreach(return _)
    }
    val series = Window.partitionBy(tags.map(col): _*).orderBy(time.asc)
    val outs = sel.fields.map {
      case Field(c @ Call(fn, args), alias) =>
        val name = alias.getOrElse(fn)
        (transformCol(fn, args, series), name)
      case f => throw ParseException(s"unsupported field in transform query: $f")
    }
    val projected = base.select(
      (time.as("time") +: tags.map(col)) ++ outs.map { case (c, n) => c.as(n) }: _*)
    projected.where(outs.map { case (_, n) => col(n).isNotNull }.reduce(_ && _))
  }

  /** Chunked bounded-lookback series fold (see transformSelect notes):
    * cut each series into P time-range chunks, fold per (series, chunk)
    * in parallel, repair only the first-k rows of each chunk against the
    * per-chunk k-tails in a miniature second window. `mk` builds the fold
    * columns for a given WindowSpec; `timeName` is the LONG time column
    * the chunk ids derive from. Returns None when chunking is disabled,
    * the input is below the size gate, or the time range is degenerate —
    * callers then fall back to the sequential per-series window. */
  private def chunkedFold(input: DataFrame, tags: List[String], timeName: String,
      k: Int, mk: org.apache.spark.sql.expressions.WindowSpec => Seq[(Column, String)])
      : Option[DataFrame] = {
    val sess = input.sparkSession
    // size gate (same spirit as the broadcast threshold): for a series
    // that fits one task comfortably, the direct window is faster than
    // chunking's extra min/max pass + shuffles — measured +0.3 s on a 10k-
    // row series. Catalyst's sizeInBytes estimate is free and errs large.
    // The chunk count itself is size-gated too (VERDICT r18 #6 — widens
    // with input bytes; see SeriesChunks.chunkCount).
    val minBytes = sess.conf
      .get("graft.seriesFold.minBytes", (64L * 1024 * 1024).toString).toLong
    val bytes = input.queryExecution.optimizedPlan.stats.sizeInBytes
    val chunks = graft.queries.SeriesChunks.chunkCount(sess, bytes)
    if (chunks <= 1 || bytes < minBytes) return None
    val tc = col(timeName)
    val b = input.agg(min(tc), max(tc)).head()
    if (b.isNullAt(0) || b.getLong(1) <= b.getLong(0)) return None
    val minT = b.getLong(0)
    val span = math.max(1L, (b.getLong(1) - minT) / chunks + 1L)
    // SQL `div`, not Column `/`: the latter is ALWAYS double division,
    // and ns deltas beyond 2^53 would round a boundary row into the
    // wrong chunk — chunk ids must be exact integral arithmetic
    val d = input.withColumn("__chunk",
        expr(s"(`$timeName` - ${minT}L) div ${span}L"))
      // explicit count pins the exchange against AQE coalescing
      .repartition(chunks, tags.map(col) :+ col("__chunk"): _*)
    // ONE heavy pass per (series, chunk): the window sorts in parallel;
    // __rn and __cnt share its partitioning (no extra shuffle/sort), and
    // the fold columns share its sort. Fold values are already correct at
    // every row with ≥k in-chunk predecessors.
    val parts = tags.map(col) :+ col("__chunk")
    val series = Window.partitionBy(parts: _*).orderBy(tc.asc)
    val outs = mk(series)
    val marked = d
      .withColumn("__rn", row_number().over(series))
      .withColumn("__cnt", count(lit(1)).over(Window.partitionBy(parts: _*)))
    val folded = marked.select(Seq(tc.as("time"), col("__rn")) ++
      tags.map(col) ++ outs.map { case (c, n) => c.as(n) }: _*)
    val inner = folded.where(col("__rn") > k).drop("__rn")
    // Boundary correction on a MINIATURE set (≤ 2·k·chunks rows per
    // series): the first-k rows of each chunk (whose windows straddle a
    // boundary) plus the last-k of each chunk (the true in-series
    // predecessors of any later boundary row — a last-k-before-a-boundary
    // row has <k successors in its own chunk, so it is in its chunk's
    // tail; this cascades across EMPTY/thin chunks for free). Inside this
    // set, every boundary row's k-neighborhood is present and
    // time-contiguous per series, so one tiny per-series fold over it is
    // exact; values the set computes at tail rows are discarded. Tagged
    // queries partition the repair by the tags; the untagged case needs a
    // single-value key, which must be column-DERIVED (pmod(__chunk, 1)) —
    // a literal gets constant-folded out of the partition spec and the
    // window degrades back to the unpartitioned form.
    val smallParts =
      if (tags.nonEmpty) tags.map(col) else Seq(pmod(col("__chunk"), lit(1L)))
    val smallSeries = Window.partitionBy(smallParts: _*).orderBy(tc.asc)
    val outsSmall = mk(smallSeries)
    val boundary = marked
      .where(col("__rn") <= k || col("__rn") > col("__cnt") - k)
      .select(Seq(tc.as("time"), col("__rn")) ++
        tags.map(col) ++ outsSmall.map { case (c, n) => c.as(n) }: _*)
      .where(col("__rn") <= k).drop("__rn")
    Some(inner.unionByName(boundary)
      .where(outs.map { case (_, n) => col(n).isNotNull }.reduce(_ && _)))
  }

  /** Chunk-parallel cumulative_sum over a FIXED-POINT field (VERDICT r7
    * item 2). The sequential path computes `unscale(sum(fx(f)) OVER
    * (series ROWS UNBOUNDED PRECEDING))` — a BIGINT prefix sum divided by
    * the scale once at the end. BIGINT addition is associative, so the
    * same integers can be produced in parallel: cut each series into P
    * time-range chunks, compute the in-chunk BIGINT prefix per
    * (series, chunk) window, aggregate per-chunk totals (a tiny set:
    * series × chunks rows), prefix those into per-chunk offsets with a
    * miniature window, broadcast-join them back, and add. The final
    * integer at every row equals the sequential fold's bit-for-bit, so
    * the one double division yields the identical double.
    *
    * Null fields follow the window-sum semantics exactly: a row's result
    * is null iff NO non-null value precedes it in the whole series
    * (tracked with the matching non-null-count prefix + offsets).
    *
    * Returns None (→ sequential fallback) below the size gate, on a
    * degenerate time range, or when the approximate series count is high
    * enough that (a) the per-series window already parallelizes and
    * (b) the offset set would be too big to broadcast. */
  private def chunkedCumSum(input: DataFrame, tags: List[String], f: String,
      name: String): Option[DataFrame] = {
    val sess = input.sparkSession
    val minBytes = sess.conf
      .get("graft.seriesFold.minBytes", (64L * 1024 * 1024).toString).toLong
    // size-gated chunk width (VERDICT r18 #6; see SeriesChunks.chunkCount)
    val bytes = input.queryExecution.optimizedPlan.stats.sizeInBytes
    val chunks = graft.queries.SeriesChunks.chunkCount(sess, bytes)
    if (chunks <= 1 || bytes < minBytes) return None
    val tc = time
    // one pass: time bounds + (tagged only) approximate series count
    val aggs = Seq(min(tc), max(tc)) ++
      (if (tags.nonEmpty) Seq(approx_count_distinct(struct(tags.map(col): _*))) else Nil)
    val b = input.agg(aggs.head, aggs.tail: _*).head()
    if (b.isNullAt(0) || b.getLong(1) <= b.getLong(0)) return None
    if (tags.nonEmpty && b.getLong(2) * chunks > 4L * 1000 * 1000) return None
    val minT = b.getLong(0)
    val span = math.max(1L, (b.getLong(1) - minT) / chunks + 1L)
    // exact integral chunk ids (SQL div, not double /) — see chunkedFold
    val d = input
      .withColumn("__chunk", expr(s"(`${meta.timeCol}` - ${minT}L) div ${span}L"))
      .withColumn("__fx", fx(f))
      .repartition(chunks, tags.map(col) :+ col("__chunk"): _*)
    val parts = tags.map(col) :+ col("__chunk")
    val w = Window.partitionBy(parts: _*).orderBy(tc.asc)
      .rowsBetween(Window.unboundedPreceding, 0)
    val local = d
      .withColumn("__ps", sum(col("__fx")).over(w))
      .withColumn("__pc", count(col("__fx")).over(w))
    // per-(series, chunk) totals → per-chunk exclusive-prefix offsets; the
    // untagged window key must be column-DERIVED (a literal would be
    // constant-folded out of the partition spec — see chunkedFold)
    val offParts =
      if (tags.nonEmpty) tags.map(col) else Seq(pmod(col("__chunk"), lit(1L)))
    val offW = Window.partitionBy(offParts: _*).orderBy(col("__chunk").asc)
      .rowsBetween(Window.unboundedPreceding, -1)
    val offs = d.groupBy(parts: _*)
      .agg(sum(col("__fx")).as("__tot"), count(col("__fx")).as("__tc"))
      .withColumn("__off", coalesce(sum(col("__tot")).over(offW), lit(0L)))
      .withColumn("__offc", coalesce(sum(col("__tc")).over(offW), lit(0L)))
      .select(parts :+ col("__off") :+ col("__offc"): _*)
    val joined = local.join(broadcast(offs), tags :+ "__chunk")
    val out = when(col("__pc") + col("__offc") > 0,
      unscale(coalesce(col("__ps"), lit(0L)) + col("__off"), f))
    Some(joined
      .select(tc.as("time") +: tags.map(col) :+ out.as(name): _*)
      .where(col(name).isNotNull))
  }

  /** Chunked exact-integer running sum over an aggregated bucket frame
    * `agged(time, tags…, __v)` where `__v` is the unscaled result of
    * `sum(<field scaled by k>)` — i.e. `round(__v·k)` recovers the exact
    * integer bucket total. Chunks the bucket-key range, runs a
    * PARTITIONED per-(series, chunk) prefix window, and adds broadcast
    * exclusive-prefix chunk totals — bit-identical to the sequential
    * window because every addition is integer. None on an empty frame
    * (caller falls back to the generic path). */
  private def chunkedAggCumSum(agged: DataFrame, tags: List[String],
      k: Long, name: String): Option[DataFrame] = {
    val sess = agged.sparkSession
    val chunks = math.max(1, sess.conf.get("graft.seriesFold.chunks",
      sess.conf.get("spark.sql.shuffle.partitions", "32")).toInt)
    val b = agged.agg(min(col("time")), max(col("time"))).head()
    if (b.isNullAt(0)) return None
    val minT = b.getLong(0)
    val span = math.max(1L, (b.getLong(1) - minT) / chunks + 1L)
    val d = agged
      .withColumn("__vc", round(col("__v") * k).cast("long"))
      .withColumn("__chunk", expr(s"(time - ${minT}L) div ${span}L"))
    val parts = tags.map(col) :+ col("__chunk")
    val w = Window.partitionBy(parts: _*).orderBy(col("time").asc)
      .rowsBetween(Window.unboundedPreceding, 0)
    // untagged offset window keys on a column-DERIVED constant (a literal
    // would be constant-folded out of the spec — chunkedCumSum precedent)
    val offParts =
      if (tags.nonEmpty) tags.map(col) else Seq(pmod(col("__chunk"), lit(1L)))
    val offW = Window.partitionBy(offParts: _*).orderBy(col("__chunk").asc)
      .rowsBetween(Window.unboundedPreceding, -1)
    val offs = d.groupBy(parts: _*).agg(sum(col("__vc")).as("__tot"))
      .withColumn("__off", coalesce(sum(col("__tot")).over(offW), lit(0L)))
      .select(parts :+ col("__off"): _*)
    Some(d.join(broadcast(offs), tags :+ "__chunk")
      .select(col("time") +: tags.map(col) :+
        ((sum(col("__vc")).over(w) + col("__off")).cast("double") / k.toDouble)
          .as(name): _*))
  }

  private def transformCol(fn: String, args: List[Expr],
      series: org.apache.spark.sql.expressions.WindowSpec): Column = {
    def f: String = args.headOption match {
      case Some(Ident(x)) => x
      case _ => throw ParseException(s"$fn(field, ...) expected")
    }
    def unitUs: Long = args.collectFirst { case DurLit(us) => us }.getOrElse(1000000L)
    val scaled = scaleOf(f).isDefined
    // fixed-point fields difference in exact integers; unscaled fields in raw doubles
    lazy val dv =
      if (scaled) (fx(f) - lag(fx(f), 1).over(series)).cast("double") /
        scaleOf(f).get.toDouble
      else (col(f) - lag(col(f), 1).over(series)).cast("double")
    lazy val dt = (time - lag(time, 1).over(series)).cast("double") / unitUs.toDouble
    fn match {
      case "difference" => dv
      case "derivative" => when(dt > 0, dv / dt)
      case "non_negative_derivative" => when(dt > 0 && dv / dt >= 0, dv / dt)
      case "cumulative_sum" =>
        if (scaled)
          unscale(sum(fx(f)).over(series.rowsBetween(Window.unboundedPreceding, 0)), f)
        else sum(col(f)).over(series.rowsBetween(Window.unboundedPreceding, 0))
      case "moving_average" =>
        val n = args.collectFirst { case IntLit(k) => k.toInt }
          .getOrElse(throw ParseException("moving_average(field, N) expected"))
        val w = series.rowsBetween(-(n - 1), 0)
        if (scaled)
          sum(fx(f)).over(w).cast("double") /
            (lit(scaleOf(f).get.toDouble) * count(fx(f)).over(w))
        else avg(col(f)).over(w)
      case "elapsed" =>
        // integer division in the requested unit (InfluxQL semantics)
        ((time - lag(time, 1).over(series)) / unitUs).cast("long").cast("long")
      case o => throw ParseException(s"unsupported transform $o")
    }
  }

  // ---------------- fill

  /** Constant time bounds implied by the WHERE conjuncts: (lo, hi), both
    * INCLUSIVE µs (exclusive ops are shifted by 1). A disjunction anywhere
    * means no single range → (None, None); non-time conjuncts contribute
    * nothing. Drives the fill() spine per InfluxQL: an explicit queried
    * range is filled end-to-end, not just the observed data span. */
  private def whereTimeBounds(w: Option[Expr]): (Option[Long], Option[Long]) = {
    def walk(e: Expr): Option[(Option[Long], Option[Long])] = e match {
      case Bin("AND", l, r) =>
        for ((l1, h1) <- walk(l); (l2, h2) <- walk(r)) yield (
          (l1 ++ l2).reduceOption(_ max _),
          (h1 ++ h2).reduceOption(_ min _))
      case Bin("OR", _, _) => None
      case Paren(x)        => walk(x)
      case Bin(op, l, r) if isTimeRef(l) && constTimeUs(r).isDefined =>
        val v = constTimeUs(r).get
        op match {
          case ">=" => Some((Some(v), None))
          case ">"  => Some((Some(v + 1), None))
          case "<"  => Some((None, Some(v - 1)))
          case "<=" => Some((None, Some(v)))
          case "="  => Some((Some(v), Some(v)))
          case _    => Some((None, None))
        }
      case _ => Some((None, None))
    }
    w.flatMap(walk).getOrElse((None, None))
  }

  private def applyFill(d: DataFrame, sel: SelectStmt, tags: List[String],
      valueCols: Seq[String]): DataFrame = {
    if (sel.groupByTime.isEmpty || sel.fill == FillNone) return d
    val iv = sel.groupByTime.get
    val off = sel.groupByTimeOffset
    def align(t: Long): Long = t - (((t - off) % iv) + iv) % iv
    // under tz the agg output's time axis is wall-clock (see run) — the
    // spine bounds shift from UTC to the same space before aligning
    val (loB, hiB) = whereTimeBounds(sel.where)
    val (spineLo, spineHi) = (loB.map(toWallUs).map(align), hiB.map(toWallUs).map(align))
    val span = (spineLo, spineHi) match {
      case (Some(l), Some(h)) => // fully-bounded range: no pass over the data
        d.sparkSession.range(1)
          .select(explode(sequence(lit(l), lit(h), lit(iv))).as("time"))
      case _ => // unbounded side(s) come from the observed bucket span
        d.agg(min("time").as("lo"), max("time").as("hi"))
          .select(explode(sequence(
            spineLo.map(lit).getOrElse(col("lo")),
            spineHi.map(lit).getOrElse(col("hi")), lit(iv))).as("time"))
    }
    val spine =
      if (tags.isEmpty) span
      else span.crossJoin(d.select(tags.map(col): _*).distinct())
    val joined = spine.join(d, "time" :: tags, "left")
    sel.fill match {
      case FillNull => joined
      case FillValue(v) =>
        valueCols.foldLeft(joined)((acc, c) => acc.withColumn(c, coalesce(col(c), lit(v))))
      case FillPrevious =>
        val w = Window.partitionBy(tags.map(col): _*).orderBy("time")
          .rowsBetween(Window.unboundedPreceding, 0)
        valueCols.foldLeft(joined)((acc, c) =>
          acc.withColumn(c, last(col(c), ignoreNulls = true).over(w)))
      case FillLinear =>
        val back = Window.partitionBy(tags.map(col): _*).orderBy("time")
          .rowsBetween(Window.unboundedPreceding, 0)
        val fwd = Window.partitionBy(tags.map(col): _*).orderBy("time")
          .rowsBetween(0, Window.unboundedFollowing)
        valueCols.foldLeft(joined) { (acc, c) =>
          val pv = last(col(c), ignoreNulls = true).over(back)
          val pt = last(when(col(c).isNotNull, col("time")), ignoreNulls = true).over(back)
          val nv = first(col(c), ignoreNulls = true).over(fwd)
          val nt = first(when(col(c).isNotNull, col("time")), ignoreNulls = true).over(fwd)
          acc.withColumn(c, when(col(c).isNotNull, col(c))
            .otherwise(pv + (nv - pv) * (col("time") - pt) / (nt - pt)))
        }
      case _ => joined
    }
  }

  // ---------------- ordering, limits, series limits

  private def sortLimit(d: DataFrame, sel: SelectStmt, tags: List[String]): DataFrame = {
    val hasTime = d.columns.contains("time")
    val rest = d.columns.filterNot(_ == "time").toSeq.map(col)
    val sorted =
      if (hasTime) {
        val t = if (sel.orderDesc) col("time").desc else col("time").asc
        d.orderBy(t +: rest.map(_.asc): _*) // stable total order for LIMIT
      } else d
    val off = sel.offset.map(o => sorted.offset(o)).getOrElse(sorted)
    sel.limit.map(off.limit).getOrElse(off)
  }

  private def slimit(d: DataFrame, sel: SelectStmt, tags: List[String]): DataFrame = {
    if (sel.slimit.isEmpty && sel.soffset.isEmpty) return d
    if (tags.isEmpty) throw ParseException("SLIMIT requires GROUP BY tags")
    val lo = sel.soffset.getOrElse(0)
    val hi = lo + sel.slimit.getOrElse(Int.MaxValue - lo)
    // a measurement can hold millions of series — never rank them all in
    // one task. With SLIMIT n only the first lo+n series in tag order can
    // survive, and orderBy(tags).limit(hi) plans as TakeOrdered (per-
    // partition top-hi + one tiny merge); a single-partition window then
    // ranks ≤ hi rows. SOFFSET without SLIMIT has no such bound and falls
    // back to the distributed full rank (Ranks.globalRank; over a
    // distinct set dense_rank ≡ row_number, so both paths reproduce the
    // original global dense_rank exactly). Kept slice broadcasts back
    // (EventAggs e_slimit).
    val distinctSeries = d.select(tags.map(col): _*).distinct()
    val ser = sel.slimit match {
      case Some(_) =>
        // the rank window's input is ≤ hi rows: orderBy.limit plans as a
        // TakeOrderedAndProject, which IS the in-plan bound PlanLint
        // verifies under the single-task rank window (VERDICT r16 #4)
        distinctSeries.orderBy(tags.map(col(_).asc): _*).limit(hi)
          .withColumn("__srank",
            row_number().over(Window.orderBy(tags.map(col): _*)))
          .where(col("__srank") > lo)
          .drop("__srank")
      case None =>
        graft.queries.Ranks
          .globalRank(distinctSeries, tags.map(col), "__srank")
          .where(col("__srank") + 1 > lo && col("__srank") + 1 <= hi)
          .drop("__srank")
    }
    d.join(broadcast(ser), tags)
  }
}

object Translator {
  /** Parse and run an InfluxQL SELECT against the measurement catalog. */
  def query(spark: SparkSession, sfDir: String, influxql: String): DataFrame =
    Parser.parse(influxql) match {
      case sel: SelectStmt =>
        val (df, meta) = resolve(sel.from, Catalog.load(spark, sfDir, _))
        new Translator(df, meta).run(sel)
      case ShowStmt(what, _, key, from, where) =>
        Meta.show(spark, sfDir, what, key, from, where)
      case ShowLimited(ShowStmt(what, _, key, from, where), lim, off) =>
        // meta pagination: lexicographic sort → deterministic pages
        val df = Meta.show(spark, sfDir, what, key, from, where)
        val sorted = df.orderBy(df.columns.map(col(_)): _*)
        val shifted = off.map(sorted.offset).getOrElse(sorted)
        lim.map(shifted.limit).getOrElse(shifted)
      case other => throw ParseException(s"not a query statement: $other")
    }

  /** Resolve a FROM source: measurement via `loadMeasurement`, or run the
    * nested SELECT and treat its output as a derived measurement (the
    * reference's unimplemented subquery path, README.md:188-191). */
  def resolve(src: Source,
      loadMeasurement: String => (DataFrame, TableMeta),
      listMeasurements: () => Seq[String] = () => Seq(Catalog.events.measurement))
      : (DataFrame, TableMeta) =
    src match {
      case FromMeasurement(n) => loadMeasurement(n)
      case FromMeasurementRegex(p) =>
        // FROM /re/: unanchored match over the measurement catalog; multiple
        // matches union by name with null-padding for fields one measurement
        // lacks (reference left it TODO at query_merge.go:128)
        val re = java.util.regex.Pattern.compile(p)
        val hits = listMeasurements().distinct.filter(n => re.matcher(n).find())
        if (hits.isEmpty) throw ParseException(s"no measurement matches /$p/")
        unionLoaded(hits.map(loadMeasurement), src)
      case FromMulti(names) =>
        // FROM m1, m2: union scan (the reference's merge layer takes only
        // the FIRST measurement, query_merge.go:44-47 — full InfluxQL here);
        // heterogeneous schemas null-pad missing fields like InfluxQL
        unionLoaded(names.map(loadMeasurement), src)
      case FromSubquery(sub) =>
        val (df, meta) = resolve(sub.from, loadMeasurement, listMeasurements)
        val out0 = new Translator(df, meta).run(sub)
        // tag-only aggregates have no time column; attach epoch 0 like
        // InfluxQL's aggregate timestamps
        val out = if (out0.columns.contains("time")) out0
          else out0.withColumn("time", lit(0L))
        val tags = (if (sub.groupByAllTags) meta.tags.toList else sub.groupByTags)
          .filter(out.columns.contains)
        val fields = out.columns.toSeq
          .filterNot(c => c == "time" || tags.contains(c))
          .map(c => FieldMeta(c, None)) // derived values: raw double/long path
        (out, TableMeta(measurementName(src), "time", tags, fields))
    }

  /** Union several loaded measurements into one derived measurement:
    * `unionByName(allowMissingColumns = true)` null-pads fields a
    * measurement lacks (InfluxQL semantics for multi-measurement scans),
    * and the merged TableMeta carries the union of tags and fields. The
    * raw-ns pushdown column survives only when every branch declares the
    * same one — otherwise a null-padded ns column would break the
    * redundant time bounds. */
  private def unionLoaded(loaded: Seq[(DataFrame, TableMeta)], src: Source)
      : (DataFrame, TableMeta) = {
    val metas = loaded.map(_._2)
    val head = metas.head
    if (metas.exists(_.timeCol != head.timeCol))
      throw ParseException(
        s"multi-measurement FROM requires a common time column, got ${metas.map(_.timeCol).distinct.mkString(", ")}")
    val df = loaded.map(_._1).reduce(_.unionByName(_, allowMissingColumns = true))
    val tags = metas.flatMap(_.tags).distinct
    val fields = metas.flatMap(_.fields).distinctBy(_.name)
    val rawNs = if (metas.forall(_.rawTimeNs == head.rawTimeNs)) head.rawTimeNs else None
    val rawTs = if (metas.forall(_.rawTimeTsUs == head.rawTimeTsUs)) head.rawTimeTsUs else None
    (df, TableMeta(measurementName(src), head.timeCol, tags, fields, rawNs,
      rawTimeTsUs = rawTs))
  }

  def measurementName(src: Source): String = src match {
    case FromMeasurement(n)      => n
    case FromMeasurementRegex(p) => p
    case FromMulti(names)        => names.head
    case FromSubquery(sub)       => measurementName(sub.from)
  }
}
