package graft

import org.scalatest.funsuite.AnyFunSuite

/** Static oracle-cliff lint (r16 verdict #3): six oracle-evaluation
  * cliff classes cost r15/r16 expensive scale verifies to find; the
  * pattern-shaped four are enforced here as a static scan over
  * `SparkEntry.oracleSql`, and the plan-shaped two (a filter above an
  * inequality join that the engine cannot push, equality bound to the
  * wrong table in a multi-join) by the dynamic EXPLAIN ANALYZE probe in
  * scripts/oracle_lint.py — whose seeded self-test proves the probe
  * fires on exactly those shapes.
  *
  * Adjudication lives in ONE place: the ORACLE_ALLOW block in
  * scripts/oracle_lint.py (this spec parses it, the ExchAuditSpec ←
  * plan_gate.py pattern, so there is no second list to drift). Both
  * directions are machine-checked — every static hit must carry an
  * allow row with a why, and every allow row must still hit (a fixed
  * oracle leaves a dead allow row, which fails until removed).
  */
class OracleLintSpec extends AnyFunSuite {

  // ---------- the rules ----------

  private def stripStrings(s: String): String =
    s.replaceAll("'[^']*'", "''")

  /** Rule 1 — all-pairs list-fn self-join: a list-similarity function
    * applied to the SAME column from two different aliases (the r15
    * dedup-oracle all-pairs shape; the fix is an inverted-index pair
    * base where the function sees pre-grouped candidate columns). */
  def allpairsListSelfJoin(sql: String): Boolean = {
    val p = """(?i)list_(?:intersect|has_any|jaccard)\(\s*(\w+)\.(\w+)\s*,\s*(\w+)\.(\w+)\s*\)""".r
    p.findAllMatchIn(stripStrings(sql)).exists(m =>
      m.group(1) != m.group(3) && m.group(2) == m.group(4))
  }

  /** Balanced-paren CTE definitions: (name, materialized, bodyStart, bodyEnd). */
  private def cteDefs(s: String): Seq[(String, Boolean, Int, Int)] = {
    val p = """(?i)(\w+)\s+AS\s+(MATERIALIZED\s+)?\(""".r
    p.findAllMatchIn(s).map { m =>
      var i = m.end - 1; var depth = 0; var end = s.length
      var done = false
      while (i < s.length && !done) {
        s(i) match {
          case '(' => depth += 1
          case ')' => depth -= 1; if (depth == 0) { end = i; done = true }
          case _ =>
        }
        i += 1
      }
      (m.group(1), m.group(2) != null, m.end, end)
    }.toSeq
  }

  /** Rule 2 — plain-CTE exponential re-inline: DuckDB 1.0 instantiates a
    * non-MATERIALIZED CTE once per reference, so chains of
    * multiply-referenced CTEs multiply body copies. Computes the
    * inline-copies count per CTE (main query = 1 copy; a MATERIALIZED
    * referrer contributes 1 regardless of its own copies) and flags a
    * non-materialized CTE with >= 32 copies whose body contains a join
    * (the body-cost proxy: 32 copies of a scan are noise, 32 copies of
    * a join are the sim_mmr ~78 GB spill class). */
  def cteReinline(sql: String, copiesBar: Int = 32): Seq[String] = {
    val s = stripStrings(sql)
    val defs = cteDefs(s)
    if (defs.isEmpty) return Nil
    val names = defs.map(_._1)
    val span = defs.map(d => d._1 -> (d._3, d._4)).toMap
    val mat = defs.map(d => d._1 -> d._2).toMap
    val main = s.substring(defs.map(_._4).max)
    def refs(text: String, x: String): Int =
      ("""(?i)\b(?:FROM|JOIN|,)\s+""" + x + """\b""").r.findAllIn(text).size
    val copies = scala.collection.mutable.Map.empty[String, Int]
    names.reverse.foreach { x =>
      var c = refs(main, x)
      names.foreach { y =>
        if (y != x) {
          val (b0, b1) = span(y)
          val r = refs(s.substring(b0, b1), x)
          if (r > 0 && copies.getOrElse(y, 0) > 0)
            c += r * (if (mat(y)) 1 else copies(y))
        }
      }
      copies(x) = c
    }
    names.filter { x =>
      val (b0, b1) = span(x)
      val body = s.substring(b0, b1)
      !mat(x) && copies(x) >= copiesBar &&
        ("""(?i)\bJOIN\b""".r.findFirstIn(body).isDefined ||
          """(?i)\bFROM\s+\w+(\s+\w+)?\s*,""".r.findFirstIn(body).isDefined)
    }
  }

  /** Rule 3 tripwire — a JOIN whose ON clause carries ONLY inequalities
    * (no equality key): every such join is all-pairs within its frame
    * and must be adjudicated as bounded (group-pair stats, calendar
    * series, a fenced eval truth side) or rewritten. The unpushed-filter
    * variant of this class is the probe's job. */
  def pureInequalityJoin(sql: String): Boolean = {
    val p = ("""(?is)\bJOIN\s+[\w.]+(?:\s+\w+)?\s+ON\b(.{0,240}?)""" +
      """(?=\bJOIN\b|\bWHERE\b|\bGROUP\b|\bLEFT\b|\bRIGHT\b|\bORDER\b|\bQUALIFY\b|\)|$)""").r
    p.findAllMatchIn(stripStrings(sql)).exists { m =>
      val c = m.group(1).replace("<=", "§").replace(">=", "§").replace("<>", "")
      (c.contains('<') || c.contains('>') || c.contains('§')) && !c.contains('=')
    }
  }

  /** Rule 5 — narrow-DECIMAL product inside a SUM: DECIMAL(<=18) factors
    * multiplied under an aggregate are the silent-width class (the
    * an_gumbel_maxima sf1 overflow): the width must be certified to the
    * verify horizon or widened. */
  def narrowDecimalProduct(sql: String): Boolean = {
    val s = stripStrings(sql)
    """(?i)SUM\s*\(""".r.findAllMatchIn(s).exists { m =>
      var i = m.end - 1; var depth = 0; val body = new StringBuilder
      var done = false
      while (i < s.length && !done) {
        s(i) match {
          case '(' => depth += 1; body += s(i)
          case ')' => depth -= 1; if (depth == 0) done = true else body += s(i)
          case ch => body += ch
        }
        i += 1
      }
      val b = body.toString
      b.contains('*') &&
        """(?i)DECIMAL\s*\(\s*(1[0-8]|[0-9])\s*[,)]""".r.findFirstIn(b).isDefined
    }
  }

  /** Rule 6 — unrounded double SUM emitted as a high-scale DECIMAL: a
    * double sum whose absolute value grows with SF, cast to
    * DECIMAL(_, >=6) without ROUND or a normalizing division, drifts
    * past the cast scale's ulp at some SF (the an_anova class; the r16
    * emission contract is ROUND k or a scale-stable ratio). */
  def unroundedDoubleSum(sql: String): Boolean = {
    val s = stripStrings(sql)
    """(?i)CAST\s*\(""".r.findAllMatchIn(s).exists { m =>
      var j = m.end - 1; var depth = 0; var end = -1
      while (j < s.length && end < 0) {
        s(j) match {
          case '(' => depth += 1
          case ')' => depth -= 1; if (depth == 0) end = j
          case _ =>
        }
        j += 1
      }
      if (end < 0) false
      else {
        val inner = s.substring(m.end, end)
        val dm = """(?i)AS\s+DECIMAL\s*\(\s*\d+\s*,\s*(\d+)\s*\)""".r.findFirstMatchIn(inner)
        dm.exists(_.group(1).toInt >= 6) && {
          val expr = inner.split("(?i)AS\\s+DECIMAL")(0)
          """(?i)\bSUM\s*\(""".r.findFirstIn(expr).isDefined &&
            """(?i)\bROUND\s*\(""".r.findFirstIn(expr).isEmpty &&
            !expr.contains('/') &&
            """(?i)DECIMAL|BIGINT|::\s*INT""".r.findFirstIn(expr).isEmpty
        }
      }
    }
  }

  private val RuleFns: Seq[(String, String => Seq[String])] = Seq(
    "allpairs-list-selfjoin" -> (s => if (allpairsListSelfJoin(s)) Seq("") else Nil),
    "cte-reinline" -> (s => cteReinline(s)),
    "pure-inequality-join" -> (s => if (pureInequalityJoin(s)) Seq("") else Nil),
    "narrow-decimal-product" -> (s => if (narrowDecimalProduct(s)) Seq("") else Nil),
    "unrounded-double-sum" -> (s => if (unroundedDoubleSum(s)) Seq("") else Nil))

  // ---------- the shared adjudication list ----------

  /** (key, rule) -> why, parsed out of scripts/oracle_lint.py's
    * ORACLE_ALLOW block — the single adjudication source. */
  private lazy val allow: Map[(String, String), String] = {
    val text = new String(
      java.nio.file.Files.readAllBytes(java.nio.file.Paths.get("scripts/oracle_lint.py")),
      java.nio.charset.StandardCharsets.UTF_8)
    val block = text.split("# ORACLE_ALLOW_BEGIN")(1).split("# ORACLE_ALLOW_END")(0)
    val entry = """(?s)"(\w+)":\s*\{(.*?)\}""".r
    val pair = """"([\w-]+)":\s*"([^"]*)"""".r
    entry.findAllMatchIn(block).flatMap { m =>
      val key = m.group(1)
      pair.findAllMatchIn(m.group(2)).map(p => (key, p.group(1)) -> p.group(2))
    }.toMap
  }

  // ---------- the gate ----------

  test("every static cliff-rule hit on the oracle board is adjudicated, and no allow row is dead") {
    val hits = for {
      (key, sql) <- SparkEntry.oracleSql.toSeq
      (rule, fn) <- RuleFns
      if fn(sql).nonEmpty
    } yield (key, rule)
    val unadjudicated = hits.filterNot(allow.contains)
    assert(unadjudicated.isEmpty,
      s"unadjudicated oracle-cliff hits (add an ORACLE_ALLOW row with a why, " +
        s"or fix the oracle): ${unadjudicated.sorted.mkString(", ")}")
    val staticAllows = allow.keys.filterNot(_._2 == "probe")
    val dead = staticAllows.filterNot(hits.contains).toSeq
    assert(dead.isEmpty,
      s"dead ORACLE_ALLOW rows (the oracle no longer hits the rule — remove them): " +
        s"${dead.sorted.mkString(", ")}")
    val noKey = allow.keys.map(_._1).filterNot(SparkEntry.oracleSql.contains).toSeq
    assert(noKey.isEmpty, s"ORACLE_ALLOW rows for unregistered keys: $noKey")
  }

  // ---------- seeded violations: each rule must fire ----------

  test("seeded violation: allpairs-list-selfjoin fires") {
    assert(allpairsListSelfJoin(
      """SELECT a.id, len(list_intersect(a.grams, b.grams)) AS ov
         FROM g a JOIN g b ON a.id < b.id"""))
    assert(!allpairsListSelfJoin(
      "SELECT len(list_intersect(d.grams, c.cand_grams)) FROM d JOIN c ON d.tok = c.tok"))
  }

  test("seeded violation: cte-reinline fires on a 2^6 plain chain and not on its MATERIALIZED twin") {
    def chain(mat: String) =
      "WITH c0 AS (SELECT a.x FROM t a JOIN t b ON a.x = b.x), " +
        (1 to 6).map(i =>
          s"c$i AS $mat(SELECT p.x FROM c${i - 1} p JOIN c${i - 1} q ON p.x = q.x)")
          .mkString(", ") +
        " SELECT count(*) FROM c6"
    assert(cteReinline(chain("")).nonEmpty)
    assert(cteReinline(chain("MATERIALIZED ")).isEmpty)
  }

  test("seeded violation: pure-inequality-join fires") {
    assert(pureInequalityJoin(
      "SELECT count(*) FROM t a JOIN t b ON a.ts < b.ts GROUP BY 1"))
    assert(!pureInequalityJoin(
      "SELECT count(*) FROM t a JOIN t b ON a.k = b.k AND a.ts < b.ts"))
  }

  test("seeded violation: narrow-decimal-product fires") {
    assert(narrowDecimalProduct(
      "SELECT SUM(CAST(v AS DECIMAL(18,4)) * CAST(w AS DECIMAL(18,4))) FROM t"))
    assert(!narrowDecimalProduct(
      "SELECT SUM(CAST(v AS DECIMAL(38,8)) * CAST(w AS DECIMAL(38,8))) FROM t"))
  }

  test("seeded violation: unrounded-double-sum fires") {
    assert(unroundedDoubleSum(
      "SELECT CAST(SUM(x * x) AS DECIMAL(24,8)) FROM t"))
    assert(!unroundedDoubleSum(
      "SELECT CAST(ROUND(SUM(x * x), 6) AS DECIMAL(24,8)) FROM t"))
    assert(!unroundedDoubleSum(
      "SELECT CAST(SUM(x * x) / SUM(y) AS DECIMAL(24,8)) FROM t"))
  }
}
