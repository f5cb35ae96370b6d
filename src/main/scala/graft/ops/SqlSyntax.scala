package graft.ops

import org.apache.spark.sql.{DataFrame, SparkSession}

/** SQL clause extensions Spark's parser lacks, rewritten to plain
  * Spark SQL before parsing (SURVEY §2.10; the reference's SQL surface
  * grew the same clauses in its DataFusion lineage, and DuckDB — the
  * oracle engine — executes both natively, so each query ships ONE
  * text to both engines):
  *
  *  - `QUALIFY <pred>` — filter on window-function results without a
  *    hand-written subquery (Snowflake/BigQuery/DuckDB lineage). The
  *    predicate becomes a synthetic boolean column over the wrapped
  *    query, filtered then dropped, which is exactly the plan the
  *    manual subquery form produces — so Spark's InferWindowGroupLimit
  *    and the engine's WindowTopKRewriteRule still bound per-partition
  *    work when the predicate is a rank cutoff.
  *  - `SELECT DISTINCT ON (keys) …` — first row per key group in ORDER
  *    BY order (Postgres/DuckDB lineage). Rewritten to the
  *    `row_number() = 1` idiom; with the rank column dropped this is
  *    the shape WindowTopKRewriteRule plans as the bounded-heap
  *    TopKPerGroup operator (k=1), so at 100 TB it costs one shuffle
  *    and O(groups) memory, never a per-group sort materialization.
  *
  * Both scanners are paren-depth and string-literal aware (the LogSql
  * escape conventions): a QUALIFY inside a quoted literal or a
  * subquery is NOT a clause of this statement and must not trigger the
  * rewrite. Keyword misfires on identifiers (`SELECT qualify`, a CTE
  * named `ties`) are guarded structurally and — for QUALIFY — by an
  * abstain-on-analysis-failure fallback that reruns the original text.
  *
  * All structural scanning here rides [[LogSql.codeMask]]: keywords,
  * parens, separators and comparisons are read only at CODE positions
  * — never inside single-/double-quoted literals, backtick-quoted
  * identifiers, `-- …` line comments or (nested) bracketed comments —
  * and a multi-word keyword may be separated by comments exactly as
  * SQL lexes it (ORDER BY with a bracketed comment between the two
  * words is still the keyword). Honest residual scope: the
  * ANCHORED clause-head regexes (`SELECT * EXCLUDE(…)`, `SELECT
  * DISTINCT ON (…)`, the `LIMIT n WITH TIES` statement tail) match
  * raw text, so a comment sitting INSIDE those fixed heads/tails
  * simply means the extension doesn't trigger (the text then fails in
  * Spark's parser loudly, exactly as it would without the rewrite);
  * and these remain preprocessor extensions for the engine's own
  * clause surface, not a general parser.
  */
object SqlSyntax {

  /** Entry point used by [[graft.Session.sql]] for non-lakehouse text. */
  def run(s: SparkSession, text: String): DataFrame = {
    val t0 = rewriteAsofJoin(text).getOrElse(text)
    val t1 = rewriteDistinctOn(t0).getOrElse(t0)
    val t2 = rewriteOrderByAll(t1).getOrElse(t1)
    rewriteExclude(s, t2).orElse(rewriteReplace(s, t2))
      .orElse(rewriteLimitTies(s, t2))
      .orElse(rewriteQualify(s, t2)).getOrElse(s.sql(t2))
  }

  private val LimitTiesRe = """(?is)^\s*(\d+)\s+WITH\s+TIES\s*$""".r

  /** `… ORDER BY obs LIMIT n WITH TIES` (ANSI FETCH FIRST … WITH TIES
    * semantics): keep every row tying with the n-th on the FULL sort
    * key. Rewritten to the rank()-cutoff idiom; the window has no
    * PARTITION BY, but Spark's InferWindowGroupLimit bounds each input
    * partition to its local top-n before the singleton-partition rank,
    * so the global window sees O(n·partitions) rows, never the table.
    *
    * The clause is recognized ONLY as the exact statement tail
    * `LIMIT <digits> WITH TIES` — anchoring on the trailing text (not
    * on the words WITH TIES anywhere) keeps a CTE or table named
    * `ties` from triggering the rewrite. Ordinal sort keys are refused
    * loudly: inside the window spec an ordinal is a CONSTANT, which
    * would silently rank every row 1 and return the whole table. */
  private[graft] def rewriteLimitTies(s: SparkSession, text: String): Option[DataFrame] =
    findTopLevel(text, "LIMIT").flatMap { case (ls, le) =>
      LimitTiesRe.findFirstMatchIn(text.substring(le)).map { m =>
        val n = m.group(1)
        val (os, oe) = findTopLevel(text, "ORDER BY").getOrElse(
          throw new IllegalArgumentException(
            "LIMIT … WITH TIES requires ORDER BY (ties are defined by the sort key)"))
        require(os < ls, "LIMIT … WITH TIES: ORDER BY must precede LIMIT")
        val head = text.substring(0, os).trim
        require(findTopLevel(head, "QUALIFY").isEmpty,
          "LIMIT … WITH TIES cannot compose with QUALIFY in one statement — " +
            "put the QUALIFY query in a subquery")
        val obs = text.substring(oe, ls).trim
        LogSql.splitTop(obs, ',').foreach { it =>
          require(!it.matches(
            """(?is)^\d+(\s+(ASC|DESC))?(\s+NULLS\s+(FIRST|LAST))?$"""),
            s"LIMIT … WITH TIES: name the sort column — ordinal `$it` would " +
              "be a constant inside the rank window")
        }
        // user-derived fragments are newline-padded before structural
        // tokens wherever a trailing `-- …` line comment could
        // otherwise swallow them (the convention every rewrite here
        // follows)
        s.sql(s"SELECT * FROM (SELECT *, rank() OVER (ORDER BY\n$obs\n) AS __rk " +
          s"FROM (\n$head\n) __t) __tt WHERE __rk <= $n ORDER BY\n$obs")
          .drop("__rk")
      }
    }

  private val ExcludeRe = """(?is)^(\s*SELECT\s+\*)\s+EXCLUDE\s*\(""".r

  /** `SELECT * EXCLUDE (cols) FROM …` (DuckDB star modifier) — the
    * star runs as-is and the listed columns are dropped from the
    * result, AFTER the trailing clauses (an ORDER BY may still sort on
    * an excluded column, exactly DuckDB's semantics; a projection
    * after the sort preserves row order). Column pruning still
    * reaches the scan: Catalyst prunes through the final drop, so the
    * excluded columns are never read unless a trailing clause needs
    * them. */
  private[graft] def rewriteExclude(s: SparkSession, text: String): Option[DataFrame] =
    ExcludeRe.findFirstMatchIn(text).map { m =>
      val open = m.end - 1
      val close = LogSql.matchParen(text, open)
      val cols = LogSql.splitTop(text.substring(open + 1, close), ',')
      require(cols.nonEmpty, "EXCLUDE requires at least one column")
      // recurse through run() so the remaining text may still carry
      // another extension clause (… EXCLUDE (c) … LIMIT n WITH TIES)
      run(s, m.group(1) + text.substring(close + 1)).drop(cols: _*)
    }

  private val ReplaceRe = """(?is)^\s*SELECT\s+\*\s+REPLACE\s*\(""".r

  /** `SELECT * REPLACE (expr AS col, …) FROM …` (DuckDB star
    * modifier): the star expands to the source's column list with the
    * named columns swapped for their expressions IN PLACE — position
    * and name preserved, so downstream clauses (ORDER BY on a replaced
    * column included) see the replaced value, exactly DuckDB's
    * semantics. Expansion needs the source schema, which is resolved
    * analysis-only (`LIMIT 0` — no execution) against the FROM body up
    * to the first trailing ORDER BY/LIMIT. */
  private[graft] def rewriteReplace(s: SparkSession, text: String): Option[DataFrame] =
    ReplaceRe.findFirstMatchIn(text).map { m =>
      val open = m.end - 1
      val close = LogSql.matchParen(text, open)
      val items = LogSql.splitTop(text.substring(open + 1, close), ',').map { it =>
        val am = """(?is)^(.*\S)\s+AS\s+(\w+)\s*$""".r
        it match {
          case am(e, c) => (c.toLowerCase, e)
          case _ => throw new IllegalArgumentException(
            s"REPLACE item must be `expr AS col`: $it")
        }
      }.toMap
      val rest = text.substring(close + 1)
      val (fs, _) = findTopLevel(rest, "FROM").getOrElse(
        throw new IllegalArgumentException("REPLACE: no FROM clause"))
      val cut = Seq(findTopLevel(rest, "ORDER BY"), findTopLevel(rest, "LIMIT"))
        .flatten.map(_._1).minOption.getOrElse(rest.length)
      val body = rest.substring(fs, cut) // FROM … [WHERE …]
      val cols = s.sql(s"SELECT * $body\nLIMIT 0").columns
      val unknown = items.keySet -- cols.map(_.toLowerCase).toSet
      require(unknown.isEmpty, s"REPLACE names absent columns: $unknown")
      val sel = cols.map { c =>
        items.get(c.toLowerCase).map(e => s"(\n$e\n) AS $c").getOrElse(c)
      }.mkString(", ")
      // recurse: the trailing clauses may carry another extension
      run(s, s"SELECT $sel\n$rest")
    }

  /** `SELECT … QUALIFY pred [ORDER BY …] [LIMIT …]`: the predicate is
    * SPLICED into the head's own select list as a synthetic boolean
    * column, then filtered and dropped — so it evaluates over the FROM
    * rows (DuckDB/Snowflake QUALIFY semantics: a predicate may
    * reference columns the select list does not project), not over the
    * projected output. Dropping via the DataFrame API keeps the
    * rewrite independent of the head's column list; the projection
    * after the ORDER BY preserves row order.
    *
    * Misfire guards: the clause sits after the FROM, so a column
    * actually NAMED `qualify` in the select list never triggers; and
    * if the spliced text fails to parse/analyze (the matched word was
    * an identifier in some other position, e.g. `WHERE qualify = 1`),
    * the rewrite abstains and the ORIGINAL text runs unmodified. */
  private[graft] def rewriteQualify(s: SparkSession, text: String): Option[DataFrame] =
    findTopLevel(text, "QUALIFY").flatMap { case (qs, qe) =>
      val fromBefore = findTopLevel(text, "FROM").exists(_._1 < qs)
      if (!fromBefore) None
      else {
        val head = text.substring(0, qs).trim
        val rest = text.substring(qe)
        val cut = Seq(findTopLevel(rest, "ORDER BY"), findTopLevel(rest, "LIMIT"))
          .flatten.map(_._1).minOption.getOrElse(rest.length)
        val pred = rest.substring(0, cut).trim
        val tail = rest.substring(cut).trim
        if (pred.isEmpty) None // `ORDER BY qualify` — a column, not the clause
        else {
          val (fs, _) = findTopLevel(head, "FROM").get
          // newline-padded: the head may end in a line comment, and
          // pred may carry one — neither may swallow the splice
          val spliced = head.substring(0, fs).trim +
            s"\n, (\n$pred\n) AS __qualify__\n" + head.substring(fs)
          try Some(
            s.sql(s"SELECT * FROM (\n$spliced\n) __q WHERE __qualify__\n$tail")
              .drop("__qualify__"))
          catch {
            // not the clause after all — run the original text untouched
            case _: org.apache.spark.sql.catalyst.parser.ParseException |
                 _: org.apache.spark.sql.AnalysisException => None
          }
        }
      }
    }

  private val DistinctOnRe = """(?is)^\s*SELECT\s+DISTINCT\s+ON\s*\(""".r

  /** `SELECT DISTINCT ON (keys) sel FROM … ORDER BY obs [LIMIT n]` →
    * `SELECT sel FROM (SELECT *, row_number() OVER (PARTITION BY keys
    * ORDER BY obs) AS __rn FROM …) WHERE __rn = 1 ORDER BY obs …`.
    * ORDER BY is required: without it "first row per key" is
    * nondeterministic, which a distributed engine must refuse rather
    * than silently vary by partitioning (DuckDB permits it; we don't). */
  private[graft] def rewriteDistinctOn(text: String): Option[String] =
    DistinctOnRe.findFirstMatchIn(text).map { m =>
      val open = m.end - 1
      val close = LogSql.matchParen(text, open)
      val keys = text.substring(open + 1, close).trim
      val rest = text.substring(close + 1)
      val (fs, _) = findTopLevel(rest, "FROM").getOrElse(
        throw new IllegalArgumentException("DISTINCT ON: no FROM clause"))
      val sel = rest.substring(0, fs).trim
      val afterSel = rest.substring(fs) // "FROM …" onward
      val (os, oe) = findTopLevel(afterSel, "ORDER BY").getOrElse(
        throw new IllegalArgumentException(
          "DISTINCT ON requires ORDER BY (first-row-per-key is undefined without it)"))
      val body = afterSel.substring(0, os).trim
      val afterOrder = afterSel.substring(oe)
      val (obs, limit) = findTopLevel(afterOrder, "LIMIT") match {
        case Some((ls, _)) => (afterOrder.substring(0, ls).trim, afterOrder.substring(ls).trim)
        case None          => (afterOrder.trim, "")
      }
      // a star ITEM would leak the synthetic rank; an asterisk inside
      // an arithmetic expression (`a * 2 AS b`) is fine
      require(!LogSql.splitTop(sel, ',').exists(i => i == "*" || i.endsWith(".*")),
        "DISTINCT ON: select list must be explicit (a * would leak the synthetic rank)")
      s"SELECT $sel\nFROM (SELECT *, row_number() OVER (PARTITION BY\n$keys\n" +
        s"ORDER BY\n$obs\n) AS __rn\n$body\n) __d WHERE __rn = 1 " +
        s"ORDER BY\n$obs\n$limit"
    }

  /** `ORDER BY ALL [ASC|DESC]` (DuckDB lineage; the ordering twin of
    * Spark's native GROUP BY ALL) → `ORDER BY 1 …, 2 …, …, n …` over
    * the top-level select-list arity. NULLS LAST is pinned on every
    * ordinal: DuckDB's default null order is nulls-last while Spark's
    * ASC default is nulls-first — without the pin the two engines
    * would order null keys differently on the same text. Top-level
    * queries only (a CTE body's ORDER BY ALL sits inside parens and
    * is left alone). */
  private[graft] def rewriteOrderByAll(text: String): Option[String] =
    findTopLevel(text, "ORDER BY ALL").map { case (os, oe) =>
      val (_, se) = findTopLevel(text, "SELECT").getOrElse(
        throw new IllegalArgumentException("ORDER BY ALL: no top-level SELECT"))
      val (fs, _) = findTopLevel(text, "FROM").getOrElse(
        throw new IllegalArgumentException("ORDER BY ALL: no top-level FROM"))
      require(se < fs, "ORDER BY ALL: malformed SELECT … FROM")
      val arity = LogSql.splitTop(text.substring(se, fs), ',').length
      val after = text.substring(oe)
      val dirM = """(?is)^\s*(ASC|DESC)\b""".r.findFirstMatchIn(after)
      val dir = dirM.map(_.group(1).toUpperCase).getOrElse("ASC")
      val rest = dirM.map(m => after.substring(m.end)).getOrElse(after)
      val ords = (1 to arity).map(i => s"$i $dir NULLS LAST").mkString(", ")
      text.substring(0, os) + s"ORDER BY $ords" + rest
    }

  // ---- ASOF JOIN -----------------------------------------------------------

  /** `FROM l ASOF [LEFT] JOIN r ON l.k = r.k AND l.t >= r.t` (DuckDB /
    * Snowflake lineage; the SQL clause form of the engine's
    * [[Temporal.asofJoin]]). For each left row: the single right row
    * whose time is NEAREST-BEHIND (or nearest-ahead — the inequality's
    * direction decides) among equal-key rows. Spark's parser lacks the
    * clause AND its decorrelated-LATERAL rendition plans a
    * BroadcastNestedLoopJoin on the inequality (measured — a
    * scale-killer), so the rewrite goes straight to the engine's
    * distributed as-of idiom in SQL text:
    *
    *   1. a PAIRS subquery unions only the (key, time) columns of both
    *      sides (column pruning reaches both scans), tags sides, and
    *      computes each left row's matched right time with one
    *      `last(.., true)` window over the key partition — one shuffle,
    *      zero inequality joins;
    *   2. the original relations then equi-join back onto the DISTINCT
    *      pairs — plain hash joins.
    *
    * Direction × strictness from the one inequality: `l.t >= r.t`
    * (backward inclusive), `>` (backward strict), `<=` (forward
    * inclusive), `<` (forward strict). Ties at equal time are
    * inclusive/exclusive exactly per the operator, via the side-tag
    * sort order inside the window.
    *
    * Honest scope (refusals are loud): both operands must be NAMED
    * relations (table/view/CTE, optional alias) — no subquery
    * operands; exactly one inequality plus zero-or-more equi-key
    * conjuncts, every operand alias-qualified; a single ASOF JOIN per
    * statement (no further JOINs in the FROM); no bare `*` select list
    * (it would leak the synthetic pair columns — `alias.*` is fine).
    * The right side must be unique per (key, time) — same contract as
    * [[Temporal.asofJoin]] and DuckDB itself. NULL keys group with
    * NULL keys (window-partition semantics) rather than matching
    * nothing; null-sensitive inputs should filter first.
    *
    * Scale note (plan-audited): a trailing WHERE conjunct that is a
    * pure function of one side's equi-KEY expressions is REPLICATED
    * into both pairs-union legs (the opposite leg via the paired key
    * expressions), and a left-side conjunct over keys + the left TIME
    * expression into the left leg — so a selective key filter prunes
    * every scan of the plan, not just the probe sides. Safety: the
    * window partitions by key, so rows such a conjunct removes could
    * only produce or influence output rows the outer WHERE drops
    * anyway (left rows influence no other row's match — they
    * contribute NULL to the `last(.., true)` window). Anything the
    * replicator cannot PROVE key-local (references to non-key
    * columns, both aliases, backticked identifiers, function calls)
    * is conservatively left alone — the pairs union then windows
    * over all keys, and the CTE pre-filter idiom (operands are any
    * NAMED relation) remains the manual escape hatch. */
  /** Spec hook: with replication off the rewrite emits the plain
    * pairs-union form (leg filters and the rOn injection are a pure
    * OPTIMIZATION, so on==off result equality is the soundness
    * oracle the differential property fuzz asserts). */
  @volatile private[graft] var replicateLegFilters = true

  private[graft] def rewriteAsofJoin(text: String): Option[String] = {
    val hit = findTopLevel(text, "ASOF LEFT JOIN").map((_, true))
      .orElse(findTopLevel(text, "ASOF JOIN").map((_, false)))
    hit.map { case ((as, ae), isLeft) =>
      val (fStart, fe) = findTopLevel(text, "FROM").filter(_._2 <= as).getOrElse(
        throw new IllegalArgumentException("ASOF JOIN: no top-level FROM before it"))
      val leftTxt = text.substring(fe, as).trim
      val after = text.substring(ae)
      val (ons, one) = findTopLevel(after, "ON").getOrElse(
        throw new IllegalArgumentException("ASOF JOIN requires an ON clause"))
      val rightTxt = after.substring(0, ons).trim
      val afterOn = after.substring(one)
      val cut = Seq("WHERE", "GROUP BY", "ORDER BY", "LIMIT", "HAVING",
        "QUALIFY", "WINDOW", "UNION", "INTERSECT", "EXCEPT")
        .flatMap(k => findTopLevel(afterOn, k).map(_._1))
        .minOption.getOrElse(afterOn.length)
      val cond = afterOn.substring(0, cut).trim
      require(findTopLevel(cond, "JOIN").isEmpty &&
        findTopLevel(leftTxt, "JOIN").isEmpty &&
        LogSql.splitTop(leftTxt, ',').length == 1,
        "ASOF JOIN: one ASOF pair per statement — no further joins in the FROM")

      val Rel = """(?is)^([A-Za-z_][\w.]*)(?:\s+(?:AS\s+)?([A-Za-z_]\w*))?$""".r
      def parseRel(t: String, side: String): (String, String) = t match {
        case Rel(ident, alias) =>
          (ident, Option(alias).getOrElse(ident.split('.').last))
        case _ => throw new IllegalArgumentException(
          s"ASOF JOIN: the $side operand must be a named table/view/CTE " +
            s"(optionally aliased), got: `$t`")
      }
      val (lIdent, lAlias) = parseRel(leftTxt, "left")
      val (rIdent, rAlias) = parseRel(rightTxt, "right")

      // select list may not be a bare star — it would leak the pair cols
      val (_, se) = findTopLevel(text, "SELECT").get
      val selList = text.substring(se, fStart).trim
      require(!LogSql.splitTop(selList, ',')
        .exists(i => i.stripSuffix(";").trim == "*"),
        "ASOF JOIN: name the select columns (or use alias.*) — a bare * " +
          "would leak the rewrite's pair columns")

      import java.util.regex.Pattern
      val lRef = ("(?i)\\b" + Pattern.quote(lAlias) + "\\.").r
      val rRef = ("(?i)\\b" + Pattern.quote(rAlias) + "\\.").r
      def sideOf(e: String): Boolean = { // true = left-side expression
        // probe the MASKED text: an alias-lookalike inside a string
        // literal or comment is not a side reference
        val masked = LogSql.maskNonCode(e)
        val hasL = lRef.findFirstIn(masked).isDefined
        val hasR = rRef.findFirstIn(masked).isDefined
        require(hasL != hasR, "ASOF JOIN: every ON operand must reference " +
          s"exactly one side's alias ($lAlias / $rAlias), got: `$e`")
        hasL
      }
      var eqs = Vector.empty[(String, String)] // (leftExpr, rightExpr)
      var ineq: Option[(String, String, String)] = None
      splitTopWord(cond, "AND").foreach { cj =>
        val (idx, op) = findTopComparison(cj).getOrElse(
          throw new IllegalArgumentException(
            s"ASOF JOIN: ON conjunct is not a comparison: `$cj`"))
        require(op != "<>" && op != "!=",
          "ASOF JOIN: <>/!= is not a valid ON comparison")
        val a = cj.substring(0, idx).trim
        val b = cj.substring(idx + op.length).trim
        val aLeft = sideOf(a)
        require(aLeft != sideOf(b),
          s"ASOF JOIN: ON conjunct must compare the two sides: `$cj`")
        if (op == "=") eqs :+= (if (aLeft) (a, b) else (b, a))
        else {
          require(ineq.isEmpty,
            "ASOF JOIN: exactly ONE inequality defines the as-of time")
          val flip = Map(">=" -> "<=", "<=" -> ">=", ">" -> "<", "<" -> ">")
          ineq = if (aLeft) Some((a, b, op)) else Some((b, a, flip(op)))
        }
      }
      val (ltE, rtE, op) = ineq.getOrElse(throw new IllegalArgumentException(
        "ASOF JOIN: the ON clause needs exactly one time inequality"))
      // op relates LEFT to RIGHT (`l.t op r.t`); backward = match in
      // the past. Tie handling rides the side-tag sort: rights first =
      // inclusive, lefts first = strict.
      val (tDir, srcDir) = op match {
        case ">=" => ("ASC", "ASC")
        case ">"  => ("ASC", "DESC")
        case "<=" => ("DESC", "ASC")
        case "<"  => ("DESC", "DESC")
      }
      val ks = eqs.indices.map(i => s"__asof_k$i")
      // key-local trailing-WHERE conjuncts replicate into the pairs
      // legs (see the scale note) so a selective key filter prunes
      // both legs' scans, not just the probe sides
      val (legL, legR) = legFilters(afterOn.substring(cut), eqs, ltE,
        lAlias, rAlias, isLeft)
      def legWhere(fs: Seq[String]): String =
        if (fs.isEmpty) ""
        else fs.map(f => s"(\n$f\n)").mkString(" WHERE ", " AND ", "")
      // user-derived expressions are newline-padded before every
      // structural token they precede (AS/operator/comma), so an ON
      // operand carrying a trailing `-- …` comment cannot swallow the
      // construction — the same convention as the other rewrites
      val lKeySel = eqs.map(_._1).zip(ks).map { case (e, k) => s"$e\nAS $k" }
      val part =
        if (ks.isEmpty) "" else s"PARTITION BY ${ks.mkString(", ")} "
      val pairs =
        s"(SELECT DISTINCT ${(ks :+ "__asof_t" :+ "__asof_rt").mkString(", ")} FROM (" +
          s"SELECT ${(ks :+ "__asof_t" :+ "__asof_src").mkString(", ")}, " +
          "last(CASE WHEN __asof_src = 0 THEN __asof_t END, true) OVER (" +
          s"${part}ORDER BY __asof_t $tDir, __asof_src $srcDir " +
          "ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) AS __asof_rt " +
          "FROM (" +
          s"SELECT ${(lKeySel :+ s"$ltE\nAS __asof_t" :+ "1 AS __asof_src").mkString("\n, ")} " +
          s"FROM $lIdent $lAlias${legWhere(legL)}" +
          " UNION ALL " +
          s"SELECT ${(eqs.map(_._2) :+ rtE :+ "0").mkString("\n, ")} " +
          s"FROM $rIdent $rAlias${legWhere(legR)}" +
          ") __asof_u) __asof_w WHERE __asof_src = 1) __asof"
      val lOn = (eqs.map(_._1).zip(ks).map { case (e, k) => s"$e\n<=> __asof.$k" } :+
        s"$ltE\n<=> __asof.__asof_t").mkString("\nAND ")
      // the right PROBE side also gets the key-only conjuncts (legR is
      // exactly their right-side renditions), inside its ON condition:
      // matched rows satisfy r.key = l.key, so the predicate agrees
      // with the outer WHERE on every surviving row — and under ASOF
      // LEFT JOIN an ON-condition predicate can only null matches the
      // outer WHERE drops anyway. Catalyst cannot infer this through
      // the null-safe (<=>) pairs equality, so the rewrite states it.
      val rOn = ((eqs.map(_._2).zip(ks).map { case (e, k) => s"$e\n<=> __asof.$k" } :+
        s"$rtE\n= __asof.__asof_rt") ++ legR.map(f => s"(\n$f\n)"))
        .mkString("\nAND ")
      val jt = if (isLeft) "LEFT JOIN" else "JOIN"
      text.substring(0, fe) +
        s" $lIdent $lAlias JOIN $pairs ON $lOn $jt $rIdent $rAlias ON $rOn " +
        afterOn.substring(cut)
    }
  }

  /** Conjuncts of `tail`'s leading WHERE clause that are provably
    * local to one side's equi-key expressions (left side: keys + the
    * time expression), returned as (leftLegFilters, rightLegFilters)
    * for [[rewriteAsofJoin]]'s pairs legs. The proof is AST-LEVEL:
    * the body is parsed with Catalyst's expression parser, split on
    * the `And` tree root (so BETWEEN, CASE and OR can never be cut
    * mid-construct — the parser already placed every AND), and each
    * conjunct is verified by a tree walk in [[astLegFilters]]. A
    * conjunct replicates only when every node is either (a) a subtree
    * structurally equal — modulo identifier case — to one allowed key
    * expression, (b) a literal, or (c) an operator from a closed
    * null-strict whitelist (AND/OR/NOT, comparisons, IN over
    * literals, LIKE, arithmetic, ||; IS [NOT] NULL and <=> only when
    * the null-rejection guard is off). Anything else — function
    * calls, subqueries, CASE, foreign columns — refuses the conjunct.
    *
    * Key-only conjuncts replicate into BOTH legs (the opposite leg is
    * RENDERED from the AST with each key subtree swapped for its
    * paired expression — never string-spliced, so comment/precedence
    * hazards are structurally impossible); time-using left conjuncts
    * replicate into the left leg only.
    *
    * Under ASOF LEFT JOIN a RIGHT-side conjunct additionally needs
    * the null-rejection guard: the outer WHERE sees NULLs for the
    * right side of preserved rows, and a null-satisfied predicate
    * (`b.k IS NULL`, `NOT (b.k <=> 5)`) is exactly the anti-join
    * idiom the rewrite must leave alone. With the guard on, IS
    * [NOT] NULL, <=>, boolean and NULL literals are banned and every
    * matched key must be a BARE `alias.column` (a non-null-strict key
    * expression like `coalesce(b.k, 0)` is non-NULL on the preserved
    * row, so a conjunct over it could be TRUE there); the surviving
    * row-dependent atoms are null-strict, so on the preserved row's
    * all-NULL right side the conjunct is NULL — or, by Kleene
    * monotonicity, a constant that also holds on every matched row —
    * never a filter that disagrees with the outer WHERE. LEFT-side
    * conjuncts need no guard: preserved rows carry real left
    * values. */
  private def legFilters(tail: String, eqs: Vector[(String, String)],
      ltE: String, lAlias: String, rAlias: String, isLeft: Boolean)
      : (Seq[String], Seq[String]) = {
    if (!replicateLegFilters) return (Nil, Nil)
    val whereHit = findTopLevel(tail, "WHERE").filter(_._1 == 0)
    if (whereHit.isEmpty) return (Nil, Nil)
    val rest = tail.substring(whereHit.get._2)
    val bodyEnd = Seq("GROUP BY", "ORDER BY", "LIMIT", "HAVING",
      "QUALIFY", "WINDOW", "UNION", "INTERSECT", "EXCEPT")
      .flatMap(k => findTopLevel(rest, k).map(_._1))
      .minOption.getOrElse(rest.length)
    // drop a statement-terminating semicolon (and trailing space) —
    // it is not part of the predicate and would poison the legs
    val body = {
      var b = rest.substring(0, bodyEnd)
      var n = b.length
      while (n > 0 && (b.charAt(n - 1) == ';' ||
        Character.isWhitespace(b.charAt(n - 1)))) n -= 1
      b.substring(0, n)
    }
    astLegFilters(body, eqs, ltE, lAlias, rAlias, isLeft)
  }

  /** The AST half of [[legFilters]]: parse, split on `And` roots,
    * verify each conjunct's purity by tree walk, and render the
    * replicated forms back to SQL text from the (possibly
    * key-swapped) tree. Every returned string is `Expression.sql`
    * output — canonical, comment-free, fully parenthesized — so the
    * splice into the rewritten query cannot change meaning. Any parse
    * failure (engine-foreign syntax) abstains entirely. */
  private def astLegFilters(body: String, eqs: Vector[(String, String)],
      ltE: String, lAlias: String, rAlias: String, isLeft: Boolean)
      : (Seq[String], Seq[String]) = {
    import org.apache.spark.sql.catalyst.analysis.{UnresolvedAttribute, UnresolvedFunction}
    import org.apache.spark.sql.catalyst.expressions._
    import org.apache.spark.sql.catalyst.parser.CatalystSqlParser
    import org.apache.spark.sql.types.BooleanType
    import scala.util.control.NonFatal

    def parse(s: String): Option[Expression] =
      try Some(CatalystSqlParser.parseExpression(s))
      catch { case NonFatal(_) => None }
    // structural equality modulo identifier / function-name case
    def norm(e: Expression): Expression = e.transformUp {
      case a: UnresolvedAttribute =>
        UnresolvedAttribute(a.nameParts.map(_.toLowerCase))
      case f: UnresolvedFunction =>
        f.copy(nameParts = f.nameParts.map(_.toLowerCase))
    }
    def isBareCol(e: Expression): Boolean = e match {
      case a: UnresolvedAttribute => a.nameParts.length == 2
      case _ => false
    }
    // BETWEEN parses to the `between` function (Spark resolves it to
    // its >=/<= form later) — expand it up front so the And-root
    // split sees plain conjuncts and the whitelist never has to trust
    // an opaque function node (NOT BETWEEN rides the same transform
    // under Not)
    val bodyE = parse(body).map(_.transformUp {
      case b: Between => b.replacement
      case f: UnresolvedFunction
          if f.nameParts.map(_.toLowerCase) == Seq("between") &&
            f.arguments.length == 3 && !f.isDistinct && f.filter.isEmpty =>
        And(GreaterThanOrEqual(f.arguments(0), f.arguments(1)),
          LessThanOrEqual(f.arguments(0), f.arguments(2)))
    }).getOrElse(return (Nil, Nil))
    val lKeys = eqs.map(p => parse(p._1))
    val rKeys = eqs.map(p => parse(p._2))
    val ltK = parse(ltE)
    if ((lKeys ++ rKeys :+ ltK).exists(_.isEmpty)) return (Nil, Nil)
    // pattern to match (normalized), swap target (None for the left
    // TIME expression: it has no right-side rendition), bare-column?
    case class Allowed(pat: Expression, swap: Option[Expression], bare: Boolean)
    val lAllowed = lKeys.zip(rKeys).map { case (k, s) =>
      Allowed(norm(k.get), Some(s.get), isBareCol(k.get))
    } :+ Allowed(norm(ltK.get), None, isBareCol(ltK.get))
    val rAllowed = rKeys.zip(lKeys).map { case (k, s) =>
      Allowed(norm(k.get), Some(s.get), isBareCol(k.get))
    }
    def conjuncts(e: Expression): Seq[Expression] = e match {
      case And(l, r) => conjuncts(l) ++ conjuncts(r)
      case x => Seq(x)
    }
    val lFs = Seq.newBuilder[String]
    val rFs = Seq.newBuilder[String]
    conjuncts(bodyE).foreach { cj =>
      // side references anywhere in the conjunct tree (subquery plans
      // are not traversed, but any subquery NODE refuses the walk)
      val sides = cj.collect {
        case a: UnresolvedAttribute if a.nameParts.length >= 2 =>
          a.nameParts.head.toLowerCase
      }.toSet
      val hasL = sides.contains(lAlias.toLowerCase)
      val hasR = sides.contains(rAlias.toLowerCase)
      if (hasL != hasR) {
        val allowed = if (hasL) lAllowed else rAllowed
        val reject = isLeft && hasR
        var matched = false
        var swappable = true
        def walk(e: Expression): Option[Expression] =
          allowed.find(a => norm(e) == a.pat) match {
            case Some(a) =>
              // see scaladoc: under the null-rejection guard a matched
              // key must be a bare alias.column or the null-strictness
              // argument collapses
              if (reject && !a.bare) None
              else {
                matched = true
                a.swap match {
                  case Some(sw) => Some(sw)
                  case None => swappable = false; Some(e)
                }
              }
            case None => e match {
              case l: Literal =>
                if (reject && (l.value == null || l.dataType == BooleanType))
                  None // NULL/TRUE/FALSE atoms break null-strictness
                else Some(l)
              case (_: IsNull | _: IsNotNull | _: EqualNullSafe) if reject =>
                None // null-satisfiable — the anti-join idioms
              case _: And | _: Or | _: Not | _: EqualTo | _: EqualNullSafe |
                   _: LessThan | _: LessThanOrEqual | _: GreaterThan |
                   _: GreaterThanOrEqual | _: In | _: Like | _: IsNull |
                   _: IsNotNull | _: Add | _: Subtract | _: Multiply |
                   _: Divide | _: Remainder | _: UnaryMinus |
                   _: UnaryPositive | _: Concat =>
                val kids = e.children.map(walk)
                if (kids.exists(_.isEmpty)) None
                else if (e.children.isEmpty) Some(e)
                else Some(e.withNewChildren(kids.map(_.get)))
              case _ => None // function, subquery, CASE, foreign column
            }
          }
        walk(cj) match {
          case Some(swapped) if matched =>
            val same = cj.sql
            if (hasL) {
              lFs += same
              if (swappable) rFs += swapped.sql
            } else {
              rFs += same
              if (swappable) lFs += swapped.sql
            }
          case _ => () // impure or key-free: leave it to the outer WHERE
        }
      }
    }
    (lFs.result(), rFs.result())
  }

  /** Split on a top-level keyword (whole-word, depth-0, outside
    * literals); each returned part is trimmed. */
  private[graft] def splitTopWord(t: String, word: String): Seq[String] = {
    val hits = findAllTopLevel(t, word)
    (0 +: hits.map(_._2)).zip(hits.map(_._1) :+ t.length)
      .map { case (s, e) => t.substring(s, e).trim }
  }

  /** First top-level comparison operator in a conjunct: (index, op).
    * Two-char ops win over their one-char prefixes. Literal-,
    * backtick- and comment-aware via [[LogSql.codeMask]]. */
  private def findTopComparison(c: String): Option[(Int, String)] = {
    val code = LogSql.codeMask(c)
    var depth = 0; var i = 0
    while (i < c.length) {
      val ch = c.charAt(i)
      if (code(i)) ch match {
        case '(' => depth += 1
        case ')' => depth -= 1
        case '<' | '>' | '=' | '!' if depth == 0 =>
          val two = if (i + 1 < c.length && code(i + 1)) c.substring(i, i + 2) else ""
          if (two == ">=" || two == "<=" || two == "<>" || two == "!=")
            return Some((i, two))
          if (ch == '<' || ch == '>' || ch == '=')
            return Some((i, ch.toString))
        case _ =>
      }
      i += 1
    }
    None
  }

  /** First top-level (paren-depth 0, outside literals, backticked
    * identifiers and comments — [[LogSql.codeMask]]) case-insensitive
    * occurrence of `keyword` (words separated by any whitespace
    * and/or comments, as SQL lexes them) as whole identifier words;
    * Some((start, end)). */
  private[graft] def findTopLevel(text: String, keyword: String): Option[(Int, Int)] =
    scanTopLevel(text, keyword, firstOnly = true).headOption

  /** Every non-overlapping top-level occurrence of `keyword` as
    * (start, end) spans — ONE lex pass over `text`, so repeat-scan
    * loops (`from += end; substring; rescan`) are never needed. */
  private[graft] def findAllTopLevel(text: String, keyword: String): Seq[(Int, Int)] =
    scanTopLevel(text, keyword, firstOnly = false)

  private def scanTopLevel(text: String, keyword: String,
      firstOnly: Boolean): Seq[(Int, Int)] = {
    val words = keyword.split(' ')
    val (code, spans) = LogSql.lexMask(text)
    val commentAt = spans.toMap
    val out = Seq.newBuilder[(Int, Int)]
    var depth = 0; var i = 0
    while (i < text.length) {
      if (code(i)) text.charAt(i) match {
        case '(' => depth += 1
        case ')' => depth -= 1
        case _ if depth == 0 && (i == 0 || (!isIdent(text.charAt(i - 1)) &&
            text.charAt(i - 1) != '.')) => // a.where is a column, not WHERE
          val end = matchWords(text, code, commentAt, i, words)
          if (end >= 0) {
            out += ((i, end))
            if (firstOnly) return out.result()
            // a keyword span carries no code parens — skip past it
            i = end - 1
          }
        case _ =>
      }
      i += 1
    }
    out.result()
  }

  private def isIdent(c: Char): Boolean =
    Character.isLetterOrDigit(c) || c == '_'

  /** End index when `words` match at `i` (each a whole word of CODE
    * characters, separated by whitespace and/or comments — SQL lexes
    * `ORDER /*x*/ BY` as the two-word keyword); -1 otherwise.
    * `commentAt` maps comment-span starts to their exact ends
    * ([[LogSql.lexMask]]): the separator consumer advances comment BY
    * comment, never across a whole non-code run — a literal abutting a
    * comment (`ORDER/*c*/'x'/*d*/BY`) therefore breaks the keyword
    * instead of being lexed over. */
  private def matchWords(text: String, code: Array[Boolean],
      commentAt: Map[Int, Int], i: Int, words: Array[String]): Int = {
    var p = i
    var w = 0
    while (w < words.length) {
      if (w > 0) {
        val sp = p
        var advanced = true
        while (advanced) {
          advanced = false
          while (p < text.length && code(p) &&
            Character.isWhitespace(text.charAt(p))) { p += 1; advanced = true }
          commentAt.get(p).foreach { e => p = e; advanced = true }
        }
        if (p == sp) return -1
      }
      val word = words(w)
      if (p + word.length > text.length ||
        !text.regionMatches(true, p, word, 0, word.length)) return -1
      var q = p
      while (q < p + word.length) { // every keyword char must be CODE
        if (!code(q)) return -1
        q += 1
      }
      p += word.length
      w += 1
    }
    if (p < text.length && code(p) &&
      (isIdent(text.charAt(p)) || text.charAt(p) == '.')) -1 else p
  }
}
