package graft

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

/** Mechanized family-level statistical invariances (r18 verdict #5) —
  * the board-level defense against the same-hand-oracle hazard that
  * per-key recompute pins cannot give: a semantic error shared by the
  * Scala and the oracle SQL (written by the same hand) survives the
  * hash compare, but it cannot survive the MATHEMATICS the statistic
  * contracts. For every declared two-sample rank/location key this
  * spec re-runs the REGISTERED query (same entry point the driver
  * verifies) against perturbed copies of the testdata and asserts:
  *
  *  - '''label-swap antisymmetry''': exchanging the two group labels
  *    negates z-type statistics (t → −t, δ → −δ, p̂ → 1−p̂), fixes
  *    symmetric ones (Cucconi C, Lepage L, runs z, χ²), and swaps the
  *    group counts;
  *  - '''shift invariance''': adding a constant to the value column of
  *    BOTH groups leaves every rank statistic bit-identical (ranks are
  *    preserved, so the integer scan is identical — this one is exact,
  *    not approximate) and location outputs equivariant (Mood's median
  *    grand_median shifts by exactly the constant);
  *  - '''scale equivariance''': multiplying the value column by a
  *    positive constant preserves ranks (rank statistics bit-identical)
  *    and scales location outputs.
  *
  * The perturbed inputs are REAL parquet directories (symlinked tables
  * + the one transformed table rewritten with its original schema), so
  * each key runs through its full registered plan — scan, casts,
  * PrefixSum, the lot — not a unit-test shortcut. The +137 shift and ×3
  * scale stay exact through the engine's DECIMAL(24,2) cents cast: a
  * 2-dp value is never at the half-cent rounding boundary, and the
  * double add/mul error (≤ ulp ≈ 3e-11 at these magnitudes) is far
  * inside the 0.005 guard.
  */
class RankInvariantsSpec extends SparkSpec {

  import Invariance._

  /** The declared family. Every entry names a registered key; the spec
    * fails if one goes stale. swap = the label exchange the key's
    * grouping contracts (None when groups are not label-defined, e.g.
    * parity groups); shifted/scaled name the value table+column. */
  private val board = Seq(
    // key, swap transform, value transform target, per-column contracts
    Decl("an_mannwhitney", swap = Some(SwapPrio),
      value = OrdersPrice,
      swapChecks = Seq(Neg("z"), Swapped("n1", "n2")),
      shiftIdentical = true, scaleIdentical = true),
    Decl("an_cliffs_delta", swap = Some(SwapSeg),
      value = OrdersPrice,
      swapChecks = Seq(Neg("cliffs_delta"), Swapped("n_a", "n_b"), Swapped("gt", "lt")),
      shiftIdentical = true, scaleIdentical = true),
    Decl("an_brunner_munzel", swap = Some(SwapSeg),
      value = OrdersPrice,
      swapChecks = Seq(Neg("w_bm"), Compl("p_hat"),
        Swapped("n_building", "n_automobile")),
      shiftIdentical = true, scaleIdentical = true),
    Decl("an_ansari_bradley", swap = Some(SwapSeg),
      value = OrdersPrice,
      swapChecks = Seq(Neg("z"), Swapped("n_building", "n_automobile")),
      shiftIdentical = true, scaleIdentical = true),
    Decl("an_mood_scale", swap = Some(SwapSeg),
      value = CustomerBal,
      swapChecks = Seq(Neg("z"), Swapped("n1", "n2")),
      shiftIdentical = true, scaleIdentical = true),
    Decl("an_cucconi", swap = Some(SwapSeg),
      value = CustomerBal,
      swapChecks = Seq(Same("c_stat"), Swapped("n1", "n2")),
      shiftIdentical = true, scaleIdentical = true),
    Decl("an_lepage", swap = Some(SwapSeg),
      value = CustomerBal,
      swapChecks = Seq(Neg("wilcoxon_z"), Neg("ansari_z"), Same("lepage_l"),
        Swapped("n1", "n2")),
      shiftIdentical = true, scaleIdentical = true),
    Decl("an_wald_wolfowitz", swap = Some(SwapSeg),
      value = CustomerBal,
      swapChecks = Seq(Same("runs"), Same("z_runs"), Swapped("n1", "n0")),
      shiftIdentical = true, scaleIdentical = true),
    Decl("an_welch_ttest", swap = Some(SwapSegMach),
      value = OrdersPrice,
      swapChecks = Seq(Neg("t_welch"), Same("df_welch"), Swapped("n1", "n2")),
      shiftIdentical = false, scaleIdentical = false,
      shiftChecks = Seq(Same("t_welch"), Same("df_welch")),
      scaleChecks = Seq(Same("t_welch"), Same("df_welch"))),
    Decl("an_cohens_d", swap = None,
      value = OrdersPrice,
      swapChecks = Nil,
      shiftIdentical = false, scaleIdentical = false,
      shiftChecks = Seq(Same("cohens_d"), ShiftedBy("mean_1_usd", 137.0),
        ShiftedBy("mean_0_usd", 137.0)),
      scaleChecks = Seq(Same("cohens_d"), ScaledBy("mean_1_usd", 3.0),
        ScaledBy("mean_0_usd", 3.0))))

  private def one(df: DataFrame): Map[String, Any] = {
    val rows = df.collect()
    assert(rows.length == 1, s"expected a 1-row statistic frame, got ${rows.length}")
    df.columns.zip(rows.head.toSeq).toMap
  }

  private def num(m: Map[String, Any], c: String): Double = m(c) match {
    case d: Double => d
    case l: Long => l.toDouble
    case i: Int => i.toDouble
    case d: java.math.BigDecimal => d.doubleValue
    case x => fail(s"non-numeric stat column $c: $x")
  }

  private val Tol = 2e-6 // stat outputs round at 6 dp; unrounded doubles are far tighter

  board.foreach { d =>
    val fn = SparkEntry.queries.getOrElse(d.key,
      fail(s"RankInvariantsSpec declares unregistered key ${d.key}"))

    d.swap.foreach { sw =>
      test(s"${d.key}: label-swap ${sw.name}") {
        val base = one(fn(spark, sfDir))
        val got = one(fn(spark, Invariance.dir(spark, sfDir, sw)))
        d.swapChecks.foreach {
          case Neg(c) => assert(math.abs(num(base, c) + num(got, c)) <= Tol,
            s"$c must negate under label swap: ${base(c)} vs ${got(c)}")
          case Same(c) => assert(math.abs(num(base, c) - num(got, c)) <= Tol,
            s"$c must be label-symmetric: ${base(c)} vs ${got(c)}")
          case Compl(c) => assert(math.abs(num(base, c) + num(got, c) - 1.0) <= Tol,
            s"$c must complement to 1 under label swap: ${base(c)} vs ${got(c)}")
          case Swapped(a, b) =>
            assert(num(base, a) == num(got, b) && num(base, b) == num(got, a),
              s"counts must exchange: base($a=${base(a)},$b=${base(b)}) got($a=${got(a)},$b=${got(b)})")
          case other => fail(s"unexpected swap check $other")
        }
      }
    }

    test(s"${d.key}: shift invariance (+137 on ${d.value.col})") {
      val base = fn(spark, sfDir)
      val got = fn(spark, Invariance.dir(spark, sfDir, Shift(d.value, 137.0)))
      if (d.shiftIdentical) assertIdentical(d.key, base, got)
      else checkCols(d.key, one(base), one(got), d.shiftChecks, shiftBy = 137.0)
    }

    test(s"${d.key}: scale equivariance (×3 on ${d.value.col})") {
      val base = fn(spark, sfDir)
      val got = fn(spark, Invariance.dir(spark, sfDir, Scale(d.value, 3.0)))
      if (d.scaleIdentical) assertIdentical(d.key, base, got)
      else checkCols(d.key, one(base), one(got), d.scaleChecks, scaleBy = 3.0)
    }
  }

  // Mood's median is k-sample (one row per priority class): the swap
  // permutes two labels' rows, χ² and the count multiset are fixed, and
  // the grand median is shift-equivariant / scale-equivariant exactly.
  test("an_moods_median: label permutation fixes chi2 and the count multiset; grand_median is shift/scale-equivariant") {
    val fn = SparkEntry.queries("an_moods_median")
    def rows(df: DataFrame) =
      df.select("o_orderpriority", "n_le", "n_gt", "grand_median", "chi2").collect()
        .map(r => (r.getString(0), r.getLong(1), r.getLong(2),
          num(Map("m" -> r.get(3)), "m"), r.getDouble(4))).toSeq
    val base = rows(fn(spark, sfDir))
    val swapped = rows(fn(spark, Invariance.dir(spark, sfDir, SwapPrio)))
    assert(base.map(_._5).toSet == swapped.map(_._5).toSet, "chi2 changed under a label permutation")
    assert(base.map(t => (t._2, t._3)).sorted == swapped.map(t => (t._2, t._3)).sorted,
      "per-group count multiset changed under a label permutation")
    // the two exchanged labels carry each other's counts
    val bm = base.map(t => t._1 -> ((t._2, t._3))).toMap
    val sm = swapped.map(t => t._1 -> ((t._2, t._3))).toMap
    assert(bm("1-URGENT") == sm("5-LOW") && bm("5-LOW") == sm("1-URGENT"))
    val shifted = rows(fn(spark, Invariance.dir(spark, sfDir, Shift(OrdersPrice, 137.0))))
    assert(shifted.map(t => (t._1, t._2, t._3, t._5)) == base.map(t => (t._1, t._2, t._3, t._5)),
      "counts/chi2 must be shift-invariant")
    assert(shifted.map(_._4) == base.map(_._4 + 137.0), "grand_median must shift by exactly +137")
    val scaled = rows(fn(spark, Invariance.dir(spark, sfDir, Scale(OrdersPrice, 3.0))))
    assert(scaled.map(t => (t._1, t._2, t._3, t._5)) == base.map(t => (t._1, t._2, t._3, t._5)),
      "counts/chi2 must be scale-invariant")
    assert(scaled.map(_._4) == base.map(_._4 * 3.0), "grand_median must scale by exactly ×3")
  }

  private def assertIdentical(key: String, a: DataFrame, b: DataFrame): Unit = {
    val ha = Metamorphic.contentHash(a)
    val hb = Metamorphic.contentHash(b)
    assert(ha == hb,
      s"$key: rank statistic must be BIT-identical under a rank-preserving value transform: $ha vs $hb")
  }

  private def checkCols(key: String, base: Map[String, Any], got: Map[String, Any],
                        checks: Seq[Check], shiftBy: Double = 0.0, scaleBy: Double = 1.0): Unit =
    checks.foreach {
      case Same(c) => assert(math.abs(num(base, c) - num(got, c)) <= Tol,
        s"$key.$c must be invariant: ${base(c)} vs ${got(c)}")
      case ShiftedBy(c, by) => assert(math.abs(num(base, c) + by - num(got, c)) <= Tol,
        s"$key.$c must shift by $by: ${base(c)} vs ${got(c)}")
      // cents-rounded outputs: round2(mean)×k and round2(k×mean) differ
      // by up to k×half-a-cent — equivariance holds at that granularity
      case ScaledBy(c, by) =>
        assert(math.abs(num(base, c) * by - num(got, c)) <= 0.005 * by + Tol,
          s"$key.$c must scale by $by: ${base(c)} vs ${got(c)}")
      case other => fail(s"unexpected value-transform check $other for $key")
    }
}

/** Perturbed-testdata machinery for [[RankInvariantsSpec]]: a transform
  * renders as a parquet directory with every table symlinked from the
  * source SF dir except the transformed table, rewritten with its
  * original schema. Dirs are memoized per (sfDir, transform). */
object Invariance {
  sealed trait Check
  final case class Neg(col: String) extends Check
  final case class Same(col: String) extends Check
  final case class Compl(col: String) extends Check
  final case class Swapped(a: String, b: String) extends Check
  final case class ShiftedBy(col: String, by: Double) extends Check
  final case class ScaledBy(col: String, by: Double) extends Check

  final case class ValueCol(table: String, col: String)
  val OrdersPrice: ValueCol = ValueCol("orders", "o_totalprice")
  val CustomerBal: ValueCol = ValueCol("customer", "c_acctbal")

  sealed trait Transform {
    def name: String
    def table: String
    def apply(df: DataFrame): DataFrame
  }
  /** customer: BUILDING ↔ AUTOMOBILE */
  case object SwapSeg extends Transform {
    val name = "BUILDING↔AUTOMOBILE"; val table = "customer"
    def apply(df: DataFrame): DataFrame = df.withColumn("c_mktsegment",
      when(col("c_mktsegment") === "BUILDING", "AUTOMOBILE")
        .when(col("c_mktsegment") === "AUTOMOBILE", "BUILDING")
        .otherwise(col("c_mktsegment")))
  }
  /** customer: BUILDING ↔ MACHINERY (the an_welch_ttest pair) */
  case object SwapSegMach extends Transform {
    val name = "BUILDING↔MACHINERY"; val table = "customer"
    def apply(df: DataFrame): DataFrame = df.withColumn("c_mktsegment",
      when(col("c_mktsegment") === "BUILDING", "MACHINERY")
        .when(col("c_mktsegment") === "MACHINERY", "BUILDING")
        .otherwise(col("c_mktsegment")))
  }
  /** orders: 1-URGENT ↔ 5-LOW */
  case object SwapPrio extends Transform {
    val name = "1-URGENT↔5-LOW"; val table = "orders"
    def apply(df: DataFrame): DataFrame = df.withColumn("o_orderpriority",
      when(col("o_orderpriority") === "1-URGENT", "5-LOW")
        .when(col("o_orderpriority") === "5-LOW", "1-URGENT")
        .otherwise(col("o_orderpriority")))
  }
  final case class Shift(v: ValueCol, by: Double) extends Transform {
    val name = s"${v.col}+$by"; val table: String = v.table
    def apply(df: DataFrame): DataFrame = df.withColumn(v.col, col(v.col) + lit(by))
  }
  final case class Scale(v: ValueCol, by: Double) extends Transform {
    val name = s"${v.col}x$by"; val table: String = v.table
    def apply(df: DataFrame): DataFrame = df.withColumn(v.col, col(v.col) * lit(by))
  }

  final case class Decl(key: String, swap: Option[Transform], value: ValueCol,
                        swapChecks: Seq[Check],
                        shiftIdentical: Boolean, scaleIdentical: Boolean,
                        shiftChecks: Seq[Check] = Nil, scaleChecks: Seq[Check] = Nil)

  private val memo = scala.collection.concurrent.TrieMap.empty[(String, String), String]

  def dir(spark: org.apache.spark.sql.SparkSession, sfDir: String, t: Transform): String =
    memo.getOrElseUpdate((sfDir, t.name + ":" + t.table), {
      val out = java.nio.file.Files.createTempDirectory("graft_inv_").toFile
      out.deleteOnExit()
      val tables = Seq("region", "nation", "customer", "supplier", "part",
        "orders", "lineitem", "events", "documents", "embeddings")
      tables.foreach { tab =>
        val src = java.nio.file.Paths.get(s"$sfDir/$tab.parquet")
        val dst = java.nio.file.Paths.get(s"${out.getAbsolutePath}/$tab.parquet")
        if (tab == t.table) {
          val df = spark.read.parquet(src.toString)
          val schema = df.schema
          val outDf = t(df)
          require(outDf.schema.map(f => (f.name, f.dataType)) ==
            schema.map(f => (f.name, f.dataType)),
            s"transform ${t.name} changed the schema of $tab")
          outDf.write.mode("overwrite").parquet(dst.toString)
        } else java.nio.file.Files.createSymbolicLink(dst, src)
      }
      out.getAbsolutePath
    })
}
