package graft.api

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types._

/** Compiler from the ServiceNow *encoded query* language (the `sysparm_query`
  * parameter of the Table API — the only query language the reference
  * integration can send) to Catalyst predicates.
  *
  * Public grammar (ServiceNow REST Table API docs):
  *
  *   query       := alt ( "^NQ" alt )*           -- NQ: independent OR'd query
  *   alt         := group ( "^" group )*         -- ^ joins groups with AND
  *   group       := condition ( "^OR" condition )*  -- adjacent ORs bind first
  *   condition   := field op value? | "ORDERBY" field | "ORDERBYDESC" field
  *
  * i.e. `priority=1^ORpriority=2^category=software` parses as
  * `(priority=1 OR priority=2) AND category=software` — adjacent `^OR`
  * conditions group with their left neighbor, and `^` joins the groups.
  *
  * Operators: = != > < >= <= IN NOT IN LIKE NOTLIKE STARTSWITH ENDSWITH
  * ISEMPTY ISNOTEMPTY BETWEEN (value `a@b`), and the relative-date terms
  * a CMDB sync poll lives on: `ONToday`, `ON<yyyy-MM-dd>` (whole-day
  * range), `RELATIVEGT|RELATIVEGE|RELATIVELT|RELATIVELE@<minute|hour|day>
  * @<ago|ahead>@<n>` ("updated in the last N days" =
  * `sys_updated_onRELATIVEGT@day@ago@N`). Relative terms compile against
  * an explicit `now` parameter — deterministic, never wall-clock.
  *
  * Values arrive as strings (Table-API convention); [[applyTo]] resolves each
  * field against the DataFrame schema and casts the literal to the column
  * type, so `o_totalprice>100000` is a numeric comparison, not a string one.
  * The whole result is a single Catalyst predicate tree — filter pushdown,
  * constant folding, and codegen all apply as if it had been written with the
  * DataFrame API directly (the reference pushes the same string to the server;
  * we push it to the optimizer).
  */
object EncodedQuery {

  sealed trait Cond
  final case class Cmp(field: String, op: String, value: String) extends Cond
  /** groups: OR-of-ANDs-of-OR-groups, per the grammar above. */
  final case class Parsed(
      alternatives: Seq[Seq[Seq[Cmp]]],
      orderBy: Seq[(String, Boolean)]) // (field, descending)

  private val opsByLength: Seq[String] = Seq(
    "RELATIVEGT", "RELATIVEGE", "RELATIVELT", "RELATIVELE",
    "NOT IN", "ISNOTEMPTY", "STARTSWITH", "ENDSWITH", "NOTLIKE", "BETWEEN",
    "ONToday", "ISEMPTY", "LIKE", "IN", "ON", ">=", "<=", "!=", "=", ">", "<")

  /** Parse an encoded query string into its condition tree + sort spec. */
  def parse(q: String): Parsed = {
    var orderBy = Vector.empty[(String, Boolean)]
    val alternatives = q.split("\\^NQ").toSeq.map { alt =>
      // Split on ^ but keep ^OR markers attached to their condition.
      val tokens = alt.split("\\^").filter(_.nonEmpty).toSeq
      val groups = scala.collection.mutable.ArrayBuffer[Vector[Cmp]]()
      tokens.foreach { tok =>
        if (tok.startsWith("ORDERBYDESC")) {
          orderBy :+= (tok.stripPrefix("ORDERBYDESC"), true)
        } else if (tok.startsWith("ORDERBY")) {
          orderBy :+= (tok.stripPrefix("ORDERBY"), false)
        } else if (tok.startsWith("OR") && groups.nonEmpty) {
          groups(groups.size - 1) :+= parseCond(tok.stripPrefix("OR"))
        } else {
          groups += Vector(parseCond(tok))
        }
      }
      groups.toSeq.map(_.toSeq)
    }
    Parsed(alternatives, orderBy)
  }

  private def parseCond(s: String): Cmp = {
    // ServiceNow field names are lowercase snake_case (dot-walk with '.');
    // operators are uppercase words or symbols, so the field is the leading
    // lowercase run. Longer operators first so ISNOTEMPTY beats IN, >= > >.
    val fieldEnd = s.indexWhere(c =>
      !(c.isDigit || c == '_' || c == '.' || (c.isLetter && c.isLower)))
    require(fieldEnd > 0, s"encoded query condition has no operator: '$s'")
    val field = s.substring(0, fieldEnd)
    val rest = s.substring(fieldEnd)
    val op = opsByLength.find(rest.startsWith(_)).getOrElse(
      throw new IllegalArgumentException(s"unknown operator in '$s'"))
    Cmp(field, op, rest.stripPrefix(op))
  }

  /** Literal cast to the column's type so comparisons are type-correct.
    * Dot-walked fields (`cust_ref.value` — the ServiceNow reference-field
    * traversal) resolve through nested struct schemas.
    *
    * The literal is validated at compile time: a runtime cast of an
    * unparseable literal (`prio>abc` on a numeric column) yields NULL and
    * silently filters out every row, which would be inconsistent with the
    * compiler's fail-loudly behavior for unknown fields and operators. */
  private def typed(df: DataFrame, field: String, v: String): Column = {
    val dt = fieldType(df.schema, field)
    // Validate by running the ACTUAL ANSI cast on the literal, not a
    // re-implementation of its parse rules (a hand parser drifts: it
    // rejected zone-less ISO 'T' timestamps and 't'/'yes' booleans that the
    // runtime cast accepts). Evaluating the foldable Cast here is exactly
    // what the optimizer would do; a failing literal surfaces at compile
    // time with the field name instead of mid-job from codegen. Timestamp
    // casts are zone-sensitive — the session zone is UTC everywhere in this
    // library (SparkSession builders pin spark.sql.session.timeZone).
    val castable = dt match {
      case StringType => true
      case _ =>
        import org.apache.spark.sql.catalyst.expressions.{Cast, EvalMode, Literal}
        scala.util.Try(
          Cast(Literal(v), dt, Some("UTC"), EvalMode.ANSI).eval(null)).isSuccess
    }
    require(castable,
      s"encoded query literal '$v' does not cast to $dt for field '$field'")
    lit(v).cast(dt)
  }

  private def fieldType(schema: StructType, path: String): DataType =
    path.split('.').foldLeft(schema: DataType) {
      case (st: StructType, name) =>
        st.find(_.name == name)
          .getOrElse(throw new IllegalArgumentException(
            s"encoded query references unknown field '$path'"))
          .dataType
      case (dt, name) =>
        throw new IllegalArgumentException(
          s"encoded query dot-walks through non-struct '$name' in '$path' ($dt)")
    }

  /** Relative-date terms (`ONToday`, `ON<date>`, `RELATIVE??@unit@dir@n`)
    * compile against an EXPLICIT `now` — never wall-clock (the library's
    * Date.now discipline: a query must plan identically on every executor
    * and every re-run). All boundaries are computed driver-side in UTC
    * (the pinned session zone) and fold to plain timestamp literals, so
    * predicate pushdown sees ordinary range filters. */
  private def requireNow(now: Option[java.time.Instant], c: Cmp): java.time.Instant =
    now.getOrElse(throw new IllegalArgumentException(
      s"relative-date operator '${c.op}' on field '${c.field}' needs an " +
        "explicit now (pass it to applyTo/tableApi — never wall-clock)"))

  private def tsLit(i: java.time.Instant): Column =
    lit(java.sql.Timestamp.from(i)).cast(TimestampType)

  /** `ON` day-range semantics: [midnight, next midnight) in the session
    * zone — midnight itself matches the day STARTING at it, never the day
    * ending there (boundary inclusivity pinned by EncodedQuerySpec). */
  private def onDay(f: Column, dt: DataType, day: java.time.LocalDate,
      field: String): Column = dt match {
    case DateType => f === lit(java.sql.Date.valueOf(day))
    case TimestampType =>
      val start = day.atStartOfDay(java.time.ZoneOffset.UTC).toInstant
      val end = day.plusDays(1).atStartOfDay(java.time.ZoneOffset.UTC).toInstant
      f >= tsLit(start) && f < tsLit(end)
    case other => throw new IllegalArgumentException(
      s"ON needs a date/timestamp field, '$field' is $other")
  }

  private def condColumn(df: DataFrame, c: Cmp,
      now: Option[java.time.Instant]): Column = {
    val f = col(c.field)
    c.op match {
      case "ONToday" =>
        val day = requireNow(now, c).atZone(java.time.ZoneOffset.UTC).toLocalDate
        onDay(f, fieldType(df.schema, c.field), day, c.field)
      case "ON" =>
        val day = try java.time.LocalDate.parse(c.value) catch {
          case _: java.time.format.DateTimeParseException =>
            throw new IllegalArgumentException(
              s"ON needs a yyyy-MM-dd date, got '${c.value}' for field '${c.field}'")
        }
        onDay(f, fieldType(df.schema, c.field), day, c.field)
      case op if op.startsWith("RELATIVE") =>
        // RELATIVEGT@hour@ago@2 — field strictly after the instant 2 hours
        // before `now`; ahead mirrors forward. Units are fixed spans
        // (minute/hour/day = 60 s/3600 s/86400 s — UTC has no DST).
        val parts = c.value.stripPrefix("@").split("@", -1)
        require(parts.length == 3,
          s"$op needs @unit@ago|ahead@n, got '${c.value}' for field '${c.field}'")
        val Array(unit, dir, nStr) = parts
        val secs = unit match {
          case "minute" => 60L
          case "hour"   => 3600L
          case "day"    => 86400L
          case u => throw new IllegalArgumentException(
            s"unknown relative-date unit '$u' in '${c.value}' (minute|hour|day)")
        }
        val n = try nStr.toLong catch { case _: NumberFormatException =>
          throw new IllegalArgumentException(
            s"relative-date amount must be an integer, got '$nStr'") }
        require(n >= 0, s"relative-date amount must be >= 0, got $n")
        val base = requireNow(now, c)
        val boundary = dir match {
          case "ago"   => base.minusSeconds(n * secs)
          case "ahead" => base.plusSeconds(n * secs)
          case d => throw new IllegalArgumentException(
            s"relative-date direction must be ago|ahead, got '$d'")
        }
        require(fieldType(df.schema, c.field) == TimestampType,
          s"$op needs a timestamp field, '${c.field}' is " +
            fieldType(df.schema, c.field))
        op match {
          case "RELATIVEGT" => f > tsLit(boundary)
          case "RELATIVEGE" => f >= tsLit(boundary)
          case "RELATIVELT" => f < tsLit(boundary)
          case "RELATIVELE" => f <= tsLit(boundary)
        }
      case "="          => f === typed(df, c.field, c.value)
      case "!="         => f =!= typed(df, c.field, c.value)
      case ">"          => f > typed(df, c.field, c.value)
      case "<"          => f < typed(df, c.field, c.value)
      case ">="         => f >= typed(df, c.field, c.value)
      case "<="         => f <= typed(df, c.field, c.value)
      case "IN" =>
        require(c.value.nonEmpty, s"empty IN list for field '${c.field}'")
        c.value.split(",").map(v => f === typed(df, c.field, v)).reduce(_ || _)
      case "NOT IN" =>
        require(c.value.nonEmpty, s"empty NOT IN list for field '${c.field}'")
        c.value.split(",").map(v => f =!= typed(df, c.field, v)).reduce(_ && _)
      case "LIKE"       => f.contains(c.value)
      case "NOTLIKE"    => !f.contains(c.value)
      case "STARTSWITH" => f.startsWith(c.value)
      case "ENDSWITH"   => f.endsWith(c.value)
      case "ISEMPTY"    => f.isNull || f === lit("")
      case "ISNOTEMPTY" => f.isNotNull && f =!= lit("")
      case "BETWEEN" =>
        c.value.split("@", 2) match {
          case Array(a, b) => f >= typed(df, c.field, a) && f <= typed(df, c.field, b)
          case _ => throw new IllegalArgumentException(
            s"BETWEEN needs 'lo@hi', got '${c.value}' for field '${c.field}'")
        }
    }
  }

  /** Compile to a single Catalyst predicate against `df`'s schema. An
    * alternative with no conditions (e.g. `x=1^NQORDERBYfoo`, where the
    * second alternative is only a sort spec) is match-all — ORed with the
    * rest, the whole predicate folds to TRUE, matching the Table API's
    * behavior for a condition-free query. */
  def toPredicate(df: DataFrame, q: String,
      now: Option[java.time.Instant] = None): Column = {
    val p = parse(q)
    if (p.alternatives.exists(_.isEmpty)) lit(true)
    else p.alternatives.map { groups =>
      groups.map(g => g.map(condColumn(df, _, now)).reduce(_ || _)).reduce(_ && _)
    }.reduce(_ || _)
  }

  /** Apply filter + ORDERBY spec — the full server-side-query emulation. */
  def applyTo(df: DataFrame, q: String,
      now: Option[java.time.Instant] = None): DataFrame = {
    val p = parse(q)
    val filtered =
      if (p.alternatives.exists(_.isEmpty)) df else df.filter(toPredicate(df, q, now))
    if (p.orderBy.isEmpty) filtered
    else filtered.orderBy(p.orderBy.map { case (f, desc) =>
      if (desc) col(f).desc else col(f).asc
    }: _*)
  }

  /** The complete Table-API request emulation: `sysparm_query` +
    * `sysparm_fields` (projection) + `sysparm_offset`/`sysparm_limit`
    * (pagination). Everything stays declarative — the filter and projection
    * reach the parquet scan, and offset/limit compile to Spark's
    * Offset/Limit operators (a `sysparm_limit`-style page never needs a
    * full materialization). Pagination requires a total order: pass an
    * ORDERBY in the query, or the key column to page on via `pageKey`
    * (pages are nondeterministic otherwise, exactly like the real API
    * without ORDERBY).
    */
  def tableApi(df: DataFrame, q: String, fields: Seq[String] = Nil,
      offset: Int = 0, limit: Int = -1, pageKey: Option[String] = None,
      now: Option[java.time.Instant] = None): DataFrame = {
    val p = parse(q)
    val base = applyTo(df, q, now)
    val ordered = (p.orderBy, pageKey) match {
      case (Nil, Some(k)) => base.orderBy(col(k))
      case (Nil, None) if offset > 0 || limit >= 0 =>
        throw new IllegalArgumentException(
          "pagination needs ORDERBY in the query or a pageKey")
      case _ => base
    }
    val projected = if (fields.isEmpty) ordered else ordered.select(fields.map(col): _*)
    val off = if (offset > 0) projected.offset(offset) else projected
    if (limit >= 0) off.limit(limit) else off
  }

  /** Key-cursor pagination — the deep-page form of [[tableApi]]. A page is
    * "the first `limit` rows with `pageKey` beyond `afterKey`", so the cost
    * of page N is O(scan + limit) via a pushed-down range filter and a
    * top-k (TakeOrderedAndProject), never O(offset) — `offset(1e9)` must
    * materialize and discard a billion rows, a cursor never does. This is
    * also how the real Table API is paged at depth (sysparm_query
    * `key>last_seen` + sysparm_limit). The cursor for the next page is the
    * last row's `pageKey` value. */
  def pageAfter(df: DataFrame, q: String, pageKey: String,
      afterKey: Option[Any], limit: Int): DataFrame = {
    require(limit > 0, "pageAfter needs a positive page size")
    val base = applyTo(df, q)
    val from = afterKey match {
      case Some(k) => base.filter(col(pageKey) > lit(k))
      case None => base
    }
    from.orderBy(col(pageKey)).limit(limit)
  }

  /** A reference-field edge for cross-TABLE dot-walking: following `name`
    * from a record joins `childKey` to `parentKey` of `dim` and exposes
    * every dim column under the `name.` prefix — the ServiceNow reference
    * field (`{"value": sys_id}` → another table) that `sysparm_query`
    * dot-walks server-side (`location.name=X` joins cmdb_ci to
    * cmn_location before filtering). `refs` nests further hops
    * (`nation.region.r_name` = two edges deep). */
  final case class Ref(name: String, childKey: String, dim: DataFrame,
      parentKey: String, refs: Seq[Ref] = Nil, display: String = "")

  /** Resolve reference edges by packing each (broadcast-joined) dim as a
    * nested STRUCT column named after the edge — after which the existing
    * struct dot-walk in [[fieldType]]/[[condColumn]] resolves any
    * `ref.ref.field` path with no further compiler changes. The join is a
    * LEFT join: a dangling reference (CMDB reality) yields a NULL struct,
    * so `ref.field ISEMPTY` is true for orphans — the same answer the
    * Table API gives for a broken reference. Dims broadcast (the dot-walk
    * cost at 100 TB is precisely a dim join per hop; nested hops resolve
    * dim-side first, so each hop broadcasts one already-walked dim). */
  def resolveRefs(df: DataFrame, refs: Seq[Ref]): DataFrame =
    refs.foldLeft(df) { (acc, r) =>
      val dimR = resolveRefs(r.dim, r.refs)
      val packed = dimR.select(col(r.parentKey).as("__graft_pk"),
        struct(dimR.columns.toIndexedSeq.map(col): _*).as(r.name))
      acc.join(org.apache.spark.sql.functions.broadcast(packed),
          acc(r.childKey) === packed("__graft_pk"), "left")
        .drop("__graft_pk")
    }

  /** [[tableApi]] over a dot-walked view: the full `sysparm_query` +
    * reference-traversal emulation in one call. */
  def tableApiWalked(df: DataFrame, refs: Seq[Ref], q: String,
      fields: Seq[String] = Nil, offset: Int = 0, limit: Int = -1,
      pageKey: Option[String] = None): DataFrame =
    tableApi(resolveRefs(df, refs), q, fields, offset, limit, pageKey)

  /** The Table API's THIRD rendering mode — `sysparm_display_value=true`:
    * every reference field comes back as the referenced record's DISPLAY
    * value (its `display` column) instead of the raw key. Rendering is
    * RESPONSE-ONLY, exactly like the real API: `sysparm_query` conditions,
    * ORDERBY, and pagination all evaluate against raw values first (a
    * query on `c_nationkey=3` still matches the key, never the name), and
    * only the surviving page has its reference columns rewritten. A
    * dangling reference renders NULL (the walked struct is NULL), the
    * API's broken-reference answer. Each edge costs the same broadcast dim
    * join the dot-walk already pays — display rendering adds zero
    * shuffles. */
  def tableApiDisplay(df: DataFrame, refs: Seq[Ref], q: String,
      fields: Seq[String] = Nil, offset: Int = 0, limit: Int = -1,
      pageKey: Option[String] = None): DataFrame = {
    refs.foreach(r => require(r.display.nonEmpty,
      s"display rendering needs a display column for edge '${r.name}'"))
    val paged = tableApi(resolveRefs(df, refs), q, Nil, offset, limit, pageKey)
    val rendered = refs.foldLeft(paged) { (acc, r) =>
      acc.withColumn(r.childKey, col(s"${r.name}.${r.display}"))
    }
    // return the TABLE's shape (walked structs were render scaffolding)
    val shaped = refs.foldLeft(rendered)((acc, r) => acc.drop(r.name))
    if (fields.isEmpty) shaped else shaped.select(fields.map(col): _*)
  }

  /** `sysparm_display_value=all` — the Table API's remaining rendering
    * mode: every reference field comes back as BOTH the raw key and the
    * referenced record's display value, side by side (the REST response's
    * `{"value": …, "display_value": …}` pair, flattened here to the raw
    * column plus a `<field>_display` column — columnar responses have no
    * nested envelope to hide it in). Query semantics are identical to the
    * other two modes: `sysparm_query` conditions, ORDERBY, and pagination
    * all bind to RAW values (rendering is response-only), a dangling
    * reference renders a NULL display next to its orphaned raw key, and
    * the cost is the same one broadcast dim join per edge the dot-walk
    * already pays — mode `all` adds zero work over mode `true`, it just
    * keeps both columns. */
  def tableApiDisplayAll(df: DataFrame, refs: Seq[Ref], q: String,
      fields: Seq[String] = Nil, offset: Int = 0, limit: Int = -1,
      pageKey: Option[String] = None,
      now: Option[java.time.Instant] = None): DataFrame = {
    refs.foreach(r => require(r.display.nonEmpty,
      s"display rendering needs a display column for edge '${r.name}'"))
    val paged = tableApi(resolveRefs(df, refs), q, Nil, offset, limit, pageKey, now)
    val rendered = refs.foldLeft(paged) { (acc, r) =>
      acc.withColumn(s"${r.childKey}_display", col(s"${r.name}.${r.display}"))
    }
    val shaped = refs.foldLeft(rendered)((acc, r) => acc.drop(r.name))
    if (fields.isEmpty) shaped else shaped.select(fields.map(col): _*)
  }

  /** The Aggregate API (`GET /api/now/stats/{table}`) emulation — the
    * reference's OTHER query surface beside the Table API:
    * `sysparm_query` compiles through the same encoded-query predicate,
    * and `sysparm_group_by` / `sysparm_count` / `sysparm_sum_fields` /
    * `sysparm_avg_fields` / `sysparm_min_fields` / `sysparm_max_fields`
    * map to one grouped Catalyst aggregate (partial+final, map-side
    * combine — one shuffle of group-count-sized partials at any scale).
    * Measure fields are 2-decimal in the CMDB money model, so sums/avgs
    * fold as exact integer cents (`ExactNum`) — associative and therefore
    * identical under any partitioning or engine; min/max are exact by
    * nature. Column naming mirrors the API's response structure
    * (`count`, `sum_<f>`, `avg_<f>`, …) flattened to columns. */
  def statsApi(df: DataFrame, q: String = "", groupBy: Seq[String] = Nil,
      countRecords: Boolean = true, sumFields: Seq[String] = Nil,
      avgFields: Seq[String] = Nil, minFields: Seq[String] = Nil,
      maxFields: Seq[String] = Nil, having: String = ""): DataFrame = {
    import graft.functions.ExactNum.{sum2, avg2}
    val filtered = if (q.isEmpty) df else df.filter(toPredicate(df, q))
    def aggFor(agg: String, fld: String): Column = agg match {
      case "count" => count(lit(1)).as("count")
      case "sum"   => sum2(col(fld)).as(s"sum_$fld")
      case "avg"   => avg2(col(fld)).as(s"avg_$fld")
      case "min"   => min(col(fld)).as(s"min_$fld")
      case "max"   => max(col(fld)).as(s"max_$fld")
    }
    val requested: Seq[(String, Column)] =
      (if (countRecords) Seq("count" -> aggFor("count", "")) else Nil) ++
        sumFields.map(f => s"sum_$f" -> aggFor("sum", f)) ++
        avgFields.map(f => s"avg_$f" -> aggFor("avg", f)) ++
        minFields.map(f => s"min_$f" -> aggFor("min", f)) ++
        maxFields.map(f => s"max_$f" -> aggFor("max", f))
    require(requested.nonEmpty, "statsApi needs at least one aggregate")
    // `sysparm_having` — the Aggregate API's post-aggregate condition list:
    // comma-separated clauses of `aggregate^field^operator^value`
    // (count with field `*` or empty targets the record count). A clause
    // may reference an aggregate that is NOT requested for display — the
    // API still evaluates it — so the plan aggregates the union and drops
    // the having-only columns after the filter. Compiles to a Catalyst
    // Filter above the one grouped aggregate: still partial+final,
    // map-side-combined, one shuffle.
    val clauses = if (having.isEmpty) Nil else having.split(",").toSeq.map { cl =>
      val p = cl.split("\\^", -1).toSeq
      require(p.length == 4,
        s"sysparm_having clause must be aggregate^field^operator^value, got '$cl'")
      val Seq(agg, fld, op, value) = p
      require(Set("count", "sum", "avg", "min", "max")(agg),
        s"unknown aggregate '$agg' in sysparm_having clause '$cl'")
      require(Set("=", "!=", ">", "<", ">=", "<=")(op),
        s"unknown operator '$op' in sysparm_having clause '$cl'")
      val name = if (agg == "count" && (fld.isEmpty || fld == "*")) "count"
        else s"${agg}_$fld"
      (name, agg, fld, op, value)
    }
    val extras = clauses.filterNot(c => requested.exists(_._1 == c._1))
      .distinctBy(_._1).map(c => c._1 -> aggFor(c._2, c._3))
    val aggs = (requested ++ extras).map(_._2)
    val grouped =
      if (groupBy.isEmpty) filtered.agg(aggs.head, aggs.tail: _*)
      else filtered.groupBy(groupBy.map(col): _*).agg(aggs.head, aggs.tail: _*)
    val kept = clauses.foldLeft(grouped) { case (acc, (name, _, _, op, value)) =>
      val c = col(name)
      val v = lit(value).cast(grouped.schema(name).dataType)
      acc.filter(op match {
        case "="  => c === v
        case "!=" => c =!= v
        case ">"  => c > v
        case "<"  => c < v
        case ">=" => c >= v
        case "<=" => c <= v
      })
    }
    extras.map(_._1).foldLeft(kept)(_ drop _)
  }
}
