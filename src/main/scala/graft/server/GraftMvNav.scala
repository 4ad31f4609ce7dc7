package graft.server

import java.sql.Timestamp

import org.apache.spark.sql.SparkSession

import graft.bitemporal.{BitemporalDml, BitemporalSql, SqlText}

/** Transparent aggregate navigation (the classic materialized-view
  * QUERY REWRITE): a plain `SELECT g…, AGG(…)… FROM fact [JOIN dim ON
  * fk = dim._id…] [WHERE …] GROUP BY g… [ORDER BY …] [LIMIT n]` over a
  * graft-REGISTERED table is answered from a registered matview's
  * maintained state when — and only when — the rewrite is provably
  * observationally identical:
  *
  *   - **definition subsumption**: same fact, same join spokes (dim,
  *     fk, INNER/LEFT), WHERE texts normalized-equal, the query's
  *     GROUP BY a (non-strict) subset of the view's, every aggregate
  *     matched by kind + normalized argument against metadata recorded
  *     AT CREATE from the DDL parse itself (never re-derived from
  *     text, so the two sides cannot drift);
  *   - **freshness**: the view's recorded watermark covers every log's
  *     last tx (one directory listing per log, [[graft.bitemporal
  *     .Matview.isFresh]]) — an unrefreshed view NEVER serves a
  *     base-table query, so the rewrite is invisible to staleness;
  *   - **basis**: a `FOR APPLICATION_TIME AS OF <ts>` (SQL:2011
  *     valid-time) query rewriting onto a
  *     view with `valid_at = <ts>` is exact by construction; a BARE
  *     `FROM fact` serves the CURRENT basis, which a fixed-basis view
  *     cannot prove it matches — those rewrite only when the view was
  *     created `WITH (rewrite = 'trusted')`, the user's standing
  *     assertion that the basis serves their current-basis queries
  *     (Oracle's QUERY REWRITE trust model; the same assertion made by
  *     querying the view by name);
  *   - **exactness**: aggregates whose served value could differ from
  *     a from-scratch computation in the last ulps are excluded —
  *     float/double SUM/AVG state (order-sensitive sums, checked
  *     against the raw state schema), the VARIANCE/STDDEV family
  *     (served by formula where Spark computes Welford), percentiles
  *     (double-cast members) and APPROX_COUNT_DISTINCT (a different
  *     sketch than Spark's); COUNT/SUM/MIN/MAX/AVG over exact types
  *     and the exact DISTINCT family rewrite freely;
  *   - **schema gate**: the final backstop ANALYZES both texts and
  *     requires identical column names and types — any case the
  *     matcher missed (AVG's decimal-vs-double spelling, dialect
  *     corners) falls back to the base plan rather than ship a
  *     schema-drifted result.
  *
  * GROUP-BY-subset queries re-aggregate the state (`SUM(n)`,
  * `SUM(sum_x)` cast back to the state's type, `MIN(min_x)`,
  * AVG = Σsum/Σcnt — needs the view to also serve SUM and COUNT of the
  * argument); DISTINCT aggregates never roll up (distinct counts are
  * not additive across merged groups). The payoff at scale is the
  * whole point of matviews made transparent: a dashboard aggregate
  * over a 100 TB fact table becomes a scan of ∝-groups state with
  * [[graft.plans.MvBucketPrune]] still applying underneath.
  *
  * Kill switch: `SET spark.graft.matview.rewrite = false` (session
  * conf, checked per statement). A failed or missed match is never an
  * error — the statement just runs on the base path.
  */
object GraftMvNav {
  import GraftMatviews.{NavKey, Handle, navSrc, normText, unqualify}

  private val inNav = new ThreadLocal[Boolean] {
    override def initialValue(): Boolean = false
  }

  /** Attempt the rewrite; None = run the statement on the base path. */
  def rewrite(session: SparkSession, sql: String): Option[String] = {
    if (inNav.get()) return None
    val handles = GraftMatviews.navHandles
    if (handles.isEmpty) return None
    if (session.conf.get("spark.graft.matview.rewrite", "true")
        .equalsIgnoreCase("false")) return None
    val text = SqlText.stripLeadingComments(sql).trim
    if (!text.take(6).equalsIgnoreCase("SELECT")) return None
    // cheap pre-gate for the hot wire path: a statement that does not
    // even CONTAIN a candidate fact table's name can never match —
    // skip all parsing (the substring test over-admits, the full
    // matcher below decides)
    locally {
      val lower = text.toLowerCase
      if (!handles.exists(h => lower.contains(h.nav.fact))) return None
    }
    if (BitemporalDml.splitTopLevel(text, ';').size != 1) return None
    inNav.set(true)
    try attempt(session, sql, text.stripSuffix(";").trim, handles)
    catch { case _: Exception => None } // a miss is never an error
    finally inNav.set(false)
  }

  // ---- query-side parsing -------------------------------------------

  /** `FROM fact FOR APPLICATION_TIME AS OF [TIMESTAMP] '<ts>'` — the
    * one temporal clause navigation understands (the SQL:2011
    * valid-time pin, the spelling [[BitemporalSql]] parses; it pins
    * the basis the view can match EXACTLY). Any other temporal clause
    * skips. */
  private val forValidRe =
    ("(?is)\\bFROM\\s+([A-Za-z_]\\w*)\\s+FOR\\s+APPLICATION_TIME\\s+" +
      "AS\\s+OF\\s+(?:TIMESTAMP\\s+)?'([^']+)'").r
  private val anyForRe =
    "(?i)\\bFOR\\s+(?:ALL\\s+)?(?:SYSTEM_TIME|APPLICATION_TIME)\\b".r

  private final case class QGroup(src: String, out: String)
  private final case class QAgg(key: NavKey, out: String)

  private def attempt(session: SparkSession, original: String,
                      text: String, handles: Seq[Handle]): Option[String] = {
    // split a trailing top-level ORDER BY / LIMIT off the core
    val spans = SqlText.maskedSpans(text)
    val depth = {
      val d = new Array[Int](math.max(text.length, 1))
      var k = 0; var i = 0
      while (i < text.length) {
        d(i) = k
        if (!SqlText.masked(spans, i)) {
          val c = text.charAt(i)
          if (c == '(') k += 1 else if (c == ')') k = math.max(0, k - 1)
        }
        i += 1
      }
      d
    }
    val tailM = "(?i)\\b(ORDER\\s+BY|LIMIT)\\b".r.findAllMatchIn(text)
      .find(m => !SqlText.masked(spans, m.start) && depth(m.start) == 0)
    val (core0, tail) = tailM match {
      case None => (text, "")
      case Some(m) =>
        (text.substring(0, m.start).trim, text.substring(m.start).trim)
    }

    // the FOR VALID_TIME basis pin, if present (exactly one, nothing
    // else temporal)
    var forTs: Option[Timestamp] = None
    val core = forValidRe.findFirstMatchIn(core0) match {
      case Some(m) if !SqlText.masked(SqlText.maskedSpans(core0), m.start) =>
        forTs = Some(
          try Timestamp.valueOf(m.group(2))
          catch { case _: IllegalArgumentException => return None })
        core0.substring(0, m.start) + s"FROM ${m.group(1)}" +
          core0.substring(m.end)
      case _ => core0
    }
    if (anyForRe.findFirstMatchIn(core).exists(m =>
        !SqlText.masked(SqlText.maskedSpans(core), m.start))) return None

    val (list, factName, joinSpecs, whereOpt, groupBy, havingOpt) =
      try GraftMatviews.splitSelect(core)
      catch { case _: IllegalArgumentException => return None }
    if (havingOpt.isDefined) return None // view HAVING/query HAVING: base path

    // query join spokes, canonicalized like the DDL's
    val qJoins: Seq[(String, String, Boolean)] = joinSpecs.map {
      case (dim, on, left) =>
        val sides = BitemporalDml.splitTopLevel(on, '=').map(_.trim)
        if (sides.length != 2) return None
        val dimIdSide = sides.indexWhere(s =>
          unqualify(s).equalsIgnoreCase("_id") &&
            (!s.contains(".") ||
              s.toLowerCase.startsWith(dim.toLowerCase + ".")))
        if (dimIdSide < 0) return None
        (dim.toLowerCase, unqualify(sides(1 - dimIdSide)).toLowerCase, left)
    }

    val qGroupSrcs = BitemporalDml.splitTopLevel(groupBy).map(_.trim)
      .filter(_.nonEmpty).map(navSrc)
    if (qGroupSrcs.isEmpty || qGroupSrcs.distinct.size != qGroupSrcs.size)
      return None
    val qGroupSet = qGroupSrcs.toSet

    // classify every select item; any unclassifiable item = base path
    val items: Seq[Either[QGroup, QAgg]] =
      BitemporalDml.splitTopLevel(list).map(_.trim).filter(_.nonEmpty)
        .map { raw =>
          classify(raw, qGroupSet) match {
            case Some(it) => it
            case None => return None
          }
        }
    // every query group must be projected (else output loses a key the
    // base query would also lose — fine — but matching is simpler and
    // safer requiring the usual shape); aggregates need ≥1 to be a
    // rewrite worth doing
    if (!items.exists(_.isRight)) return None

    val whereNorm = whereOpt.map(normText)
    val fact = factName.toLowerCase

    // candidate views, cheapest gates first; freshness (a directory
    // listing) and the schema analyses only for full structural matches
    val ordered = handles
      .filter(h => h.nav.fact == fact && h.having.isEmpty &&
        h.nav.joins == qJoins && h.nav.whereNorm == whereNorm &&
        qGroupSet.subsetOf(h.nav.groupOut.map(_._1).toSet) &&
        (forTs match {
          case Some(t) => t.equals(h.nav.validAt)
          case None => h.nav.trusted
        }))
      .sortBy(h => (if (h.nav.groupOut.size == qGroupSet.size) 0 else 1,
        h.nav.groupOut.size))

    ordered.iterator.flatMap { h =>
      build(session, original, h, items, qGroupSrcs, tail)
    }.nextOption()
  }

  /** One select item → group ref or aggregate key (query side), via
    * the SAME regexes and desugar the DDL dispatch uses. Aggregates
    * need an explicit alias (the rewrite must reproduce the query's
    * output names; Spark's auto-names for unaliased aggregates are not
    * worth replicating). */
  private def classify(raw: String, qGroups: Set[String])
      : Option[Either[QGroup, QAgg]] = {
    import GraftMatviews._
    val item = desugarFilter(raw) // may throw: caught by rewrite()
    item match {
      case apdRe(arg, alias) if alias != null =>
        Some(Right(QAgg(NavKey.Agg("apd", navSrc(arg)), alias)))
      case pctRe(fn0, arg, frac, alias) if alias != null =>
        val fn = fn0.toUpperCase
        val p = (fn, Option(frac)) match {
          case ("MEDIAN", None) => 0.5
          case ("MEDIAN", Some(_)) => return None
          case (_, None) => return None
          case (_, Some(f)) => f.toDouble
        }
        Some(Right(QAgg(
          NavKey.Pct(navSrc(arg), p, fn == "APPROX_PERCENTILE"), alias)))
      case vsRe(fn0, arg, alias) if alias != null =>
        val fn = fn0.toUpperCase
        val kind = (if (fn.startsWith("STDDEV")) "std" else "var") +
          (if (fn.endsWith("_POP")) "p" else "")
        Some(Right(QAgg(NavKey.Agg(kind, navSrc(arg)), alias)))
      case aggDistRe(fn0, arg, alias) if alias != null =>
        val kind = fn0.toUpperCase match {
          case "MIN" => "min"
          case "MAX" => "max"
          case "COUNT" => "cntd"
          case "SUM" => "sumd"
          case "AVG" => "avgd"
        }
        Some(Right(QAgg(NavKey.Agg(kind, navSrc(arg)), alias)))
      case aggRe(fn0, arg0, alias) if alias != null =>
        val fn = fn0.toUpperCase
        val arg = arg0.trim
        if (fn == "COUNT" && arg == "*")
          Some(Right(QAgg(NavKey.Agg("n", ""), alias)))
        else if (arg == "*" || arg.equalsIgnoreCase("distinct")) None
        else Some(Right(QAgg(
          NavKey.Agg(fn.toLowerCase match {
            case "count" => "cnt"
            case k => k
          }, navSrc(arg)), alias)))
      case identRe(g, alias) if qGroups.contains(navSrc(g)) =>
        Some(Left(QGroup(navSrc(g), Option(alias).getOrElse(unqualify(g)))))
      case aggExprRe(fn0, arg, alias) if alias != null =>
        val fn = fn0.toUpperCase.toLowerCase match {
          case "count" => "cnt"
          case k => k
        }
        Some(Right(QAgg(NavKey.Agg(fn, navSrc(arg)), alias)))
      case exprAliasRe(body, alias) if qGroups.contains(normText(body)) =>
        Some(Left(QGroup(normText(body), alias)))
      case _ => None
    }
  }

  /** The per-kind exactness/rollup rules (see the object doc). */
  private val directKinds =
    Set("n", "cnt", "sum", "avg", "min", "max", "cntd", "sumd", "avgd")
  private val rollupKinds = Set("n", "cnt", "sum", "avg", "min", "max")

  private def build(session: SparkSession, original: String, h: Handle,
                    items: Seq[Either[QGroup, QAgg]],
                    qGroupSrcs: Seq[String], tail: String)
      : Option[String] = {
    // the staleness gate LAST among the structural checks (it lists a
    // log directory per backing table): an unrefreshed view never
    // serves a base-table query
    if (!h.nav.fresh()) return None

    val vGroup = h.nav.groupOut.toMap
    val vAgg = h.nav.aggOut.toMap
    val equal = h.nav.groupOut.size == qGroupSrcs.size
    def bt(id: String) = "`" + id + "`"

    // resolve every aggregate item against the view, applying the
    // exactness matrix — one miss sends the query to the base path
    val aggAliases = items.collect { case Right(QAgg(key, _)) => key }
      .map { key =>
        val kindOk = key match {
          case NavKey.Agg(k, _) =>
            if (equal) directKinds.contains(k) else rollupKinds.contains(k)
          case _: NavKey.Pct => false // double-cast members: ulp drift
        }
        if (!kindOk) return None
        vAgg.get(key) match {
          case Some(a) => key -> a
          case None => return None
        }
      }.toMap

    // float/double sums are order-sensitive: the incremental value can
    // differ from a from-scratch SUM in the last ulps, so the rewrite
    // (which promises bit-identical answers) refuses them
    lazy val stateSchema = h.read(session).schema
    val sumExact = aggAliases.forall { case (key, alias) =>
      val needsCheck = key match {
        case NavKey.Agg(k, _) => k == "sum" || k == "avg" ||
          k == "sumd" || k == "avgd"
        case _ => false
      }
      !needsCheck || h.nav.sumState.get(alias).forall { stateCol =>
        stateSchema.find(_.name == stateCol).forall(f =>
          f.dataType != org.apache.spark.sql.types.DoubleType &&
            f.dataType != org.apache.spark.sql.types.FloatType)
      }
    }
    if (!sumExact) return None

    // rollup AVG needs the view to ALSO serve SUM and COUNT of the arg
    if (!equal) {
      val avgOk = items.forall {
        case Right(QAgg(NavKey.Agg("avg", arg), _)) =>
          vAgg.contains(NavKey.Agg("sum", arg)) &&
            vAgg.contains(NavKey.Agg("cnt", arg))
        case _ => true
      }
      if (!avgOk) return None
    }

    // the rewritten text references the view by name: bind it in this
    // session first (same registration refreshReferenced performs)
    GraftMatviews.bindForNav(session, h)
    lazy val servedSchema = session.table(h.name).schema

    val sel = items.map {
      case Left(QGroup(src, out)) =>
        s"${bt(vGroup(src))} AS ${bt(out)}"
      case Right(QAgg(key, out)) =>
        val a = aggAliases(key)
        if (equal) s"${bt(a)} AS ${bt(out)}"
        else key match {
          case NavKey.Agg("n" | "cnt", _) => s"SUM(${bt(a)}) AS ${bt(out)}"
          case NavKey.Agg("min", _) => s"MIN(${bt(a)}) AS ${bt(out)}"
          case NavKey.Agg("max", _) => s"MAX(${bt(a)}) AS ${bt(out)}"
          case NavKey.Agg("sum", _) =>
            // cast the re-aggregated sum back to the state's type so
            // decimal widening can't drift the output schema
            val typ = servedSchema.find(_.name == a) match {
              case Some(f) => f.dataType.sql
              case None => return None
            }
            s"CAST(SUM(${bt(a)}) AS $typ) AS ${bt(out)}"
          case NavKey.Agg("avg", arg) =>
            val sa = vAgg(NavKey.Agg("sum", arg))
            val ca = vAgg(NavKey.Agg("cnt", arg))
            s"CASE WHEN SUM(${bt(ca)}) > 0 THEN " +
              s"CAST(SUM(${bt(sa)}) AS DOUBLE) / SUM(${bt(ca)}) END " +
              s"AS ${bt(out)}"
          case _ => return None
        }
    }
    val groupTail =
      if (equal) ""
      else " GROUP BY " + qGroupSrcs.map(s => bt(vGroup(s))).mkString(", ")

    // trailing ORDER BY / LIMIT ride along only when they provably
    // reference the query's own output columns
    val outNames = items.map {
      case Left(QGroup(_, o)) => o.toLowerCase
      case Right(QAgg(_, o)) => o.toLowerCase
    }.toSet
    if (!tailOk(tail, outNames)) return None

    val rewritten = s"SELECT ${sel.mkString(", ")} FROM ${h.name}" +
      groupTail + (if (tail.isEmpty) "" else " " + tail)

    // the schema backstop: both texts must analyze to identical column
    // names AND types, or the base plan stands
    val refMap = GraftServer.registered.collect {
      case (n, t) if java.util.regex.Pattern
          .compile(s"(?i)\\b${java.util.regex.Pattern.quote(n)}\\b")
          .matcher(original).find() => n -> t.rectangles(session)
    }.toMap
    val origSchema =
      try BitemporalSql.sql(session, original, refMap).schema
      catch { case _: Exception => return None }
    val rwSchema =
      try session.sql(rewritten).schema
      catch { case _: Exception => return None }
    val same = origSchema.length == rwSchema.length &&
      origSchema.zip(rwSchema).forall { case (a, b) =>
        a.name == b.name && a.dataType == b.dataType
      }
    if (same) Some(rewritten) else None
  }

  private val tailRe =
    "(?is)^(?:ORDER\\s+BY\\s+([\\s\\S]+?))?\\s*(?:LIMIT\\s+(\\d+))?$".r
  private val orderItemRe =
    ("(?is)^([A-Za-z_]\\w*)(?:\\s+(?:ASC|DESC))?" +
      "(?:\\s+NULLS\\s+(?:FIRST|LAST))?$").r

  private def tailOk(tail: String, outNames: Set[String]): Boolean =
    tail.isEmpty || (tail match {
      case tailRe(ob, _) =>
        Option(ob).forall(t =>
          BitemporalDml.splitTopLevel(t).forall(it => it.trim match {
            case orderItemRe(id) => outNames.contains(id.toLowerCase)
            case _ => false
          }))
      case _ => false
    })
}
