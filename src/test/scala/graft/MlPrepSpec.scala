package graft

import org.apache.spark.sql.functions._

/** Toy/invariant pins for the ML-prep and drift queries (the oracle
  * checks exact values at sf0.01; these pin the SEMANTICS). */
class MlPrepSpec extends SparkSpec {
  import spark.implicits._

  test("kfold encoding excludes exactly the row's own fold") {
    val got = SparkEntry.queries("etl_kfold_encode")(spark, sfDir)
      .select("cat", "fold", "n_f", "pos_f", "n_out", "pos_out")
      .as[(String, Long, Long, Long, Long, Long)].collect()
    // per category: n_out + n_f is the same total for every fold, and
    // pos_out + pos_f the same positive total — i.e. each fold's
    // encoding saw the whole category MINUS itself, never itself
    got.groupBy(_._1).foreach { case (cat, rows) =>
      val totals = rows.map(r => (r._3 + r._5, r._4 + r._6)).distinct
      assert(totals.length == 1, s"$cat: folds disagree on the category total: $totals")
      rows.foreach { r =>
        assert(r._5 == totals.head._1 - r._3, s"$cat fold ${r._2}: own rows leaked")
      }
    }
  }

  test("feature hashing stays in [0, 32) and conserves rows") {
    val nCust = Tables.customer(spark, sfDir).count()
    val got = SparkEntry.queries("etl_feature_hash")(spark, sfDir)
      .select("bucket", "n").as[(Long, Long)].collect()
    assert(got.forall(r => r._1 >= 0 && r._1 < 32))
    assert(got.map(_._2).sum == 2 * nCust, "every (row, feature) must land in a bucket")
  }

  test("cdc compaction: deletes drop every 7th key, updates win over inserts") {
    val keys = Tables.orders(spark, sfDir).select("o_orderkey").as[Long].collect().toSet
    val got = SparkEntry.queries("etl_cdc_compact")(spark, sfDir)
      .select("st", "n", "key_sum").as[(String, Long, Long)].collect()
    val surviving = keys.filterNot(_ % 7 == 0)
    assert(got.map(_._2).sum == surviving.size.toLong,
      "compacted state must hold exactly the non-deleted keys")
    assert(got.map(_._3).sum == surviving.sum,
      "compacted key space must be exactly the non-deleted keys")
    val uRow = got.find(_._1 == "U").get
    assert(uRow._2 == surviving.count(_ % 5 == 0).toLong,
      "every surviving %5 key must carry the update's status, not the insert's")
  }

  test("attribution credits reconcile to purchase cents exactly") {
    val purchases = Tables.events(spark, sfDir)
      .filter(col("event_type") === "purchase")
      .select((col("value").cast("decimal(24,2)") * 100).cast("bigint"))
      .as[Long].collect().sum
    val got = SparkEntry.queries("an_attribution")(spark, sfDir)
      .select("credit_cents").as[Long].collect()
    assert(got.sum == purchases,
      "integer linear attribution must conserve every cent")
  }

  test("concurrency curve never goes negative and peaks above the floor") {
    val got = SparkEntry.queries("an_concurrency")(spark, sfDir)
      .select("max_conc", "min_conc").as[(Long, Long)].collect()
    assert(got.nonEmpty)
    got.foreach { case (mx, mn) =>
      assert(mn >= 0, "open-hold count can never be negative")
      assert(mx >= mn)
    }
  }

  test("weighted median matches a driver-side weighted brute force") {
    val rows = Tables.lineitem(spark, sfDir)
      .select(col("l_returnflag"),
        (col("l_extendedprice").cast("decimal(24,2)") * 100).cast("bigint"),
        col("l_quantity").cast("bigint"))
      .as[(String, Long, Long)].collect()
    val want = rows.groupBy(_._1).map { case (g, rs) =>
      val expanded = rs.sortBy(_._2) // (flag, cents, weight) ascending by value
      val total = rs.map(_._3).sum
      def at(rank: Long): Long = {
        var cum = 0L
        expanded.find { r => cum += r._3; cum >= rank }.get._2
      }
      g -> (at((total + 1) / 2) + at(total / 2 + 1))
    }
    val got = SparkEntry.queries("an_weighted_median")(spark, sfDir)
      .select("l_returnflag", "wmedian").as[(String, Double)].collect()
    got.foreach { case (g, wm) =>
      assert(wm == math.rint(want(g).toDouble / 200.0 * 1e6) / 1e6 ||
        math.abs(wm - want(g).toDouble / 200.0) < 1e-9, s"flag $g")
    }
  }

  test("merkle diff flags exactly the buckets containing corrupted keys") {
    val keys = Tables.orders(spark, sfDir).select("o_orderkey").as[Long].collect()
    val dirty = keys.filter(k => k % 101 == 0 || k % 997 == 0).map(_ % 64).toSet
    val got = SparkEntry.queries("etl_merkle_diff")(spark, sfDir)
      .select("bucket", "in_sync").as[(Long, Boolean)].collect()
    assert(got.length == 64)
    got.foreach { case (b, sync) =>
      assert(sync == !dirty.contains(b), s"bucket $b")
    }
  }

  test("pii audit finds every injected email/phone and nothing in clean docs") {
    val got = SparkEntry.queries("text_pii_audit")(spark, sfDir)
      .select("doc_id", "n_email", "n_phone", "len_drop")
      .as[(Long, Long, Long, Long)].collect()
    got.foreach { case (id, ne, np, drop) =>
      assert(ne == (if (id % 3 == 0) 1L else 0L), s"doc $id email")
      assert(np == (if (id % 5 == 0) 1L else 0L), s"doc $id phone")
      if (id % 3 != 0 && id % 5 != 0) assert(drop == 0L, s"doc $id clean")
      else assert(drop > 0L, s"doc $id must shrink under redaction")
    }
  }

  test("bigram logprob is non-positive and covers every multi-token doc") {
    val got = SparkEntry.queries("an_bigram_logprob")(spark, sfDir)
      .select("mean_logprob").as[Double].collect()
    assert(got.length == Tables.documents(spark, sfDir).count().toInt)
    got.foreach(lp => assert(lp <= 0.0, "transition probabilities are <= 1"))
  }

  test("scd2 lookup routes every order to exactly one dimension version") {
    val n = Tables.orders(spark, sfDir).count()
    val got = SparkEntry.queries("q_scd2_lookup")(spark, sfDir)
      .select("n").as[Long].collect()
    assert(got.sum == n, "interval membership must partition the fact table")
  }

  test("weekday seasonality deviations sum to zero exactly") {
    val got = SparkEntry.queries("an_seasonal_dow")(spark, sfDir)
      .select("dow", "dev_num").as[(Long, Long)].collect()
    assert(got.map(_._1).toSet.subsetOf((1L to 7L).toSet))
    assert(got.map(_._2).sum == 0L,
      "rev·total_days − total_rev·n_days must cancel over the week")
  }

  test("KS drift statistic is maximal and within [0, 1]") {
    val row = SparkEntry.queries("an_ks_drift")(spark, sfDir).collect().head
    val (n1, n2, dNum) = (row.getLong(0), row.getLong(1), row.getLong(2))
    val d = row.getDouble(4)
    assert(d >= 0.0 && d <= 1.0)
    assert(dNum <= n1 * n2, "numerator cannot exceed the ECDF scale")
    graft.operators.PrefixSum.releaseCaches()
  }

  test("chi-square drift deviations cancel and parts are nonnegative") {
    val got = SparkEntry.queries("an_chi2_drift")(spark, sfDir)
      .select("r", "dev_num", "chi2_part")
      .as[(Long, Long, Option[Double])].collect()
    assert(got.map(_._2).sum == 0L, "c·R − r·C must cancel over categories")
    assert(got.flatMap(_._3).forall(_ >= 0.0))
    assert(got.map(_._1).sum > 0L, "the reference window must not be empty")
  }

  test("profile drift emits every metric with a nonempty reference") {
    val got = SparkEntry.queries("an_profile_drift")(spark, sfDir)
      .select("metric", "ref", "cur").as[(String, Double, Double)].collect()
    assert(got.map(_._1).toSet ==
      Set("n_rows", "nd_priority", "nd_status", "mean_cents"))
    assert(got.forall(r => r._2 > 0.0 && r._3 > 0.0))
  }

  test("k-anonymity generalization: k never shrinks when bands merge") {
    val k = SparkEntry.queries("etl_kanon_generalize")(spark, sfDir)
      .select("width", "k").as[(Long, Long)].collect().toMap
    // 1000/2000/5000-bands are unions of 500-bands (and 2000 of 1000,
    // 5000 of 1000): merged groups can only grow
    assert(k(1000L) >= k(500L) && k(2000L) >= k(1000L) && k(5000L) >= k(1000L),
      s"coarsening must not lower k: $k")
  }

  test("dyadic EWMA numerator equals the explicit 20-tap dot product") {
    val daily = Tables.lineitem(spark, sfDir)
      .groupBy(date_trunc("day", col("l_shipdate")).as("day"))
      .agg((sum((col("l_extendedprice") * (lit(1.0) - col("l_discount")))
          .cast("decimal(24,8)")).cast("decimal(24,2)") * 100)
        .cast("bigint").as("rev_c"))
      .orderBy("day").as[(java.sql.Timestamp, Long)].collect()
    val want = daily.sliding(20).map { w =>
      (w.last._1, w.zipWithIndex.map { case ((_, v), i) => v * (1L << i) }.sum)
    }.toMap
    val got = SparkEntry.queries("an_ewma")(spark, sfDir)
      .select("day", "ewma_num").as[(java.sql.Timestamp, Long)].collect()
    assert(got.nonEmpty && got.forall { case (d, n) => want(d) == n },
      "window dot product must match the driver-side recomputation")
  }

  test("exact order statistics are ordered and sit at their ranks") {
    val got = SparkEntry.queries("q_exact_median")(spark, sfDir)
      .select("pct", "rank", "n", "value").as[(Long, Long, Long, Long)].collect()
      .sortBy(_._1)
    assert(got.map(_._1).toSeq == Seq(25L, 50L, 75L))
    assert(got.map(_._4).toSeq == got.map(_._4).sorted.toSeq, "quartiles must be ordered")
    val n = got.head._3
    assert(got.map(_._2).toSeq == Seq((n + 3) / 4, (n + 1) / 2, (3 * n + 3) / 4))
    graft.operators.PrefixSum.releaseCaches()
  }

  test("pseudonymization preserves joinability with zero collisions") {
    val r = SparkEntry.queries("etl_pseudonymize")(spark, sfDir).collect().head
    assert(r.getAs[Long]("n_collisions") == 0L, "salted md5 tokens must stay distinct")
    assert(r.getAs[Long]("n_orders_joined") == r.getAs[Long]("n_orders"),
      "every fact row must still join its masked dimension row")
  }

  test("a/b z-statistic is finite and reconstructible from the counts") {
    val r = SparkEntry.queries("an_abtest")(spark, sfDir).collect().head
    val (n1, c1, n2, c2, z) = (r.getLong(0), r.getLong(1), r.getLong(2), r.getLong(3),
      r.getDouble(4))
    val (p1, p2, pp) = (c1.toDouble / n1, c2.toDouble / n2,
      (c1 + c2).toDouble / (n1 + n2))
    val want = (p1 - p2) / math.sqrt(pp * (1.0 - pp) * (1.0 / n1 + 1.0 / n2))
    assert(!z.isNaN && !z.isInfinite && math.abs(z - want) < 1e-12)
  }

  test("entropy is positive and normalized entropy is at most 1") {
    val got = SparkEntry.queries("an_entropy")(spark, sfDir)
      .select("dim", "h_nats", "h_norm").as[(String, Double, Double)].collect()
    assert(got.map(_._1).toSet == Set("source", "lang"))
    got.foreach { case (d, h, hn) =>
      assert(h >= 0.0 && hn >= 0.0 && hn <= 1.0 + 1e-9, s"$d: h=$h h_norm=$hn")
    }
  }

  test("zipf slope of natural-ish text is negative") {
    val slope = SparkEntry.queries("text_zipf")(spark, sfDir)
      .collect().head.getDouble(1)
    assert(slope < 0.0, s"frequency must fall with rank: $slope")
  }

  test("user growth curve is monotone and ends at the user count") {
    val nUsers = Tables.events(spark, sfDir).select("user_id").distinct().count()
    val got = SparkEntry.queries("an_user_growth")(spark, sfDir)
      .select("day", "new_users", "cum_users")
      .as[(java.sql.Timestamp, Long, Long)].collect().sortBy(_._1.getTime)
    assert(got.map(_._3).toSeq == got.map(_._3).sorted.toSeq)
    assert(got.map(_._2).sum == nUsers && got.last._3 == nUsers)
    graft.operators.PrefixSum.releaseCaches()
  }

  test("cusum brackets zero: the excursion returns home because deviations cancel") {
    val r = SparkEntry.queries("an_cusum")(spark, sfDir).collect().head
    assert(r.getAs[Long]("max_cusum") >= 0L && r.getAs[Long]("min_cusum") <= 0L,
      "sum of (rev·n − S) over all days is exactly zero, so 0 is always attained")
    graft.operators.PrefixSum.releaseCaches()
  }

  test("cohort LTV is monotone within each cohort and ends at its total") {
    val got = SparkEntry.queries("an_cohort_ltv")(spark, sfDir)
      .select("cohort_day", "age", "rev_c", "ltv_c")
      .as[(java.sql.Timestamp, Long, Long, Long)].collect()
    got.groupBy(_._1).foreach { case (_, rows) =>
      val sorted = rows.sortBy(_._2)
      assert(sorted.map(_._4).toSeq == sorted.map(_._3).scanLeft(0L)(_ + _).tail.toSeq,
        "running LTV must be the prefix sum of the cohort's per-age revenue")
    }
  }

  test("seasonal-naive backtest covers the 28-day holdout") {
    val r = SparkEntry.queries("an_forecast_naive")(spark, sfDir).collect().head
    assert(r.getAs[Long]("n") == 28L)
    assert(r.getAs[Double]("rel_err") >= 0.0)
  }

  test("markov transition rows are proper probability distributions") {
    val got = SparkEntry.queries("an_markov")(spark, sfDir)
      .select("from_type", "n", "row_total", "p")
      .as[(String, Long, Long, Double)].collect()
    got.groupBy(_._1).foreach { case (ft, rows) =>
      assert(rows.map(_._2).sum == rows.head._3, s"$ft: counts must sum to the row total")
      assert(math.abs(rows.map(_._4).sum - 1.0) < 1e-9, s"$ft: probabilities must sum to 1")
    }
  }

  test("rfm assigns every customer and keeps quintiles in 1..5") {
    val nCust = Tables.orders(spark, sfDir).select("o_custkey").distinct().count()
    val got = SparkEntry.queries("an_rfm")(spark, sfDir)
      .select("rq", "fq", "mq", "n_customers").as[(Long, Long, Long, Long)].collect()
    assert(got.map(_._4).sum == nCust, "segmentation must partition the customers")
    assert(got.forall(r => Seq(r._1, r._2, r._3).forall(q => q >= 1 && q <= 5)))
    graft.operators.PrefixSum.releaseCaches()
  }

  test("lorenz deciles: shares sum to one, cumulative share is monotone to 1.0") {
    val got = SparkEntry.queries("an_lorenz")(spark, sfDir)
      .select("decile", "share", "cum_share").as[(Long, Double, Double)].collect()
      .sortBy(_._1)
    assert(math.abs(got.map(_._2).sum - 1.0) < 1e-9)
    assert(got.map(_._3).toSeq == got.map(_._3).sorted.toSeq)
    assert(math.abs(got.last._3 - 1.0) < 1e-12)
    graft.operators.PrefixSum.releaseCaches()
  }

  test("dp counts are reproducible and actually noised") {
    val a = SparkEntry.queries("etl_dp_counts")(spark, sfDir)
      .as[(String, Double)].collect().toMap
    val b = SparkEntry.queries("etl_dp_counts")(spark, sfDir)
      .as[(String, Double)].collect().toMap
    assert(a == b, "seeded DP must replay the exact same release")
    val raw = Tables.customer(spark, sfDir).groupBy("c_mktsegment").count()
      .as[(String, Long)].collect().toMap
    assert(a.exists { case (k, v) => math.abs(v - raw(k)) > 1e-6 },
      "the Laplace mechanism must actually perturb")
  }

  test("srm chi-square reconstructs from the variant counts") {
    val r = SparkEntry.queries("an_ab_srm")(spark, sfDir).collect().head
    val (n0, n1) = (r.getAs[Long]("n0"), r.getAs[Long]("n1"))
    val want = math.pow((n0 - n1).toDouble, 2) / (n0 + n1).toDouble
    assert(math.abs(r.getAs[Double]("chi2") - want) < 1e-12)
  }

  test("time rollup: levels are the rollup lattice and the grand total matches") {
    val nOrders = Tables.orders(spark, sfDir).count()
    val got = SparkEntry.queries("q_time_rollup")(spark, sfDir)
      .select("lvl", "n").as[(Long, Long)].collect()
    assert(got.map(_._1).toSet.subsetOf(Set(0L, 1L, 3L, 7L)))
    assert(got.filter(_._1 == 7L).map(_._2).toSeq == Seq(nOrders))
    // every level partitions the same row universe
    Seq(0L, 1L, 3L).foreach { l =>
      assert(got.filter(_._1 == l).map(_._2).sum == nOrders, s"level $l")
    }
  }

  test("coercion audit counts exactly the corrupted keys") {
    val expect = Tables.orders(spark, sfDir)
      .filter(col("o_orderkey") % 97 === 0).count()
    val r = SparkEntry.queries("etl_coerce_audit")(spark, sfDir).collect().head
    assert(r.getAs[Long]("n_coerced") == expect)
    assert(r.getAs[Long]("n") == Tables.orders(spark, sfDir).count())
  }

  test("table fingerprint matches a driver-side recomputation") {
    val md = java.security.MessageDigest.getInstance("MD5")
    val rows = Tables.orders(spark, sfDir)
      .select("o_orderkey", "o_orderstatus", "o_orderpriority")
      .as[(Long, String, String)].collect()
    // BigInt accumulation mirrors the query's DECIMAL(38,0) sum (a Long
    // sum of uniform 48-bit terms wraps past ~65K rows)
    val want = rows.map { case (k, st, pr) =>
      val h = md.digest(s"$k|$st|$pr".getBytes("UTF-8"))
        .map("%02x".format(_)).mkString
      BigInt(java.lang.Long.parseLong(h.take(12), 16))
    }.sum
    val r = SparkEntry.queries("etl_table_fingerprint")(spark, sfDir).collect().head
    assert(r.getAs[Long]("n") == rows.length.toLong)
    assert(BigInt(r.getAs[String]("fingerprint")) == want,
      "the md5-derived 48-bit row hashes must sum identically")
  }

  test("wau dominates dau and stickiness stays in (0, 1]") {
    val got = SparkEntry.queries("an_dau_wau")(spark, sfDir)
      .select("dau", "wau", "stickiness").as[(Long, Long, Double)].collect()
    got.foreach { case (dau, wau, st) =>
      assert(wau >= dau, "a day's actives are a subset of its trailing week's")
      assert(st >= 0.0 && st <= 1.0)
    }
  }

  test("keep-best dedup keeps the highest-quality doc of every cluster") {
    val keep = SparkEntry.queries("dedup_keep_best")(spark, sfDir)
      .select("cluster_id", "keeper_id", "n_docs")
      .as[(Long, Long, Long)].collect()
    val clusters = SparkEntry.queries("dedup_clusters")(spark, sfDir)
      .as[(Long, Long)].collect().groupBy(_._2).view.mapValues(_.map(_._1).toSet).toMap
    keep.foreach { case (cid, kid, n) =>
      assert(clusters(cid).contains(kid) && clusters(cid).size.toLong == n,
        s"keeper must come from its own cluster: $cid")
    }
    graft.dedup.Dedup.releaseCaches()
  }

  test("normalized dedup merges at least as much as raw hashing") {
    val r = SparkEntry.queries("dedup_normalized")(spark, sfDir).collect().head
    assert(r.getAs[Long]("n_norm_distinct") <= r.getAs[Long]("n_raw_distinct"))
    assert(r.getAs[Long]("n_raw_distinct") <= r.getAs[Long]("n_docs"))
  }

  test("mde reconstructs from the pooled proportion and shrinks with n") {
    val r = SparkEntry.queries("an_power")(spark, sfDir).collect().head
    val (n1, c1, n2, c2) = (r.getLong(0), r.getLong(1), r.getLong(2), r.getLong(3))
    val p = (c1 + c2).toDouble / (n1 + n2)
    val want = (1.959963985 + 0.841621234) *
      math.sqrt(2.0 * p * (1.0 - p) / ((n1 + n2).toDouble / 2.0))
    assert(math.abs(r.getAs[Double]("mde") - want) < 1e-12)
    assert(r.getAs[Double]("mde") > 0.0)
  }

  test("heatmap covers only valid calendar cells and conserves events") {
    val nEvents = Tables.events(spark, sfDir).count()
    val got = SparkEntry.queries("an_heatmap")(spark, sfDir)
      .select("dow", "hod", "n").as[(Long, Long, Long)].collect()
    assert(got.forall(r => r._1 >= 1 && r._1 <= 7 && r._2 >= 0 && r._2 <= 23))
    assert(got.map(_._3).sum == nEvents)
  }

  test("new + returning actives reconcile with the growth curve") {
    val growth = SparkEntry.queries("an_user_growth")(spark, sfDir)
      .select("day", "new_users").as[(java.sql.Timestamp, Long)].collect().toMap
    val got = SparkEntry.queries("an_new_returning")(spark, sfDir)
      .select("day", "n_new", "n_returning")
      .as[(java.sql.Timestamp, Long, Long)].collect()
    got.foreach { case (d, nNew, _) =>
      assert(growth.getOrElse(d, 0L) == nNew,
        s"$d: per-day new users must equal the growth curve's")
    }
    graft.operators.PrefixSum.releaseCaches()
  }

  test("conversion lags are nonnegative and bounded by converters") {
    val funnel = SparkEntry.queries("an_funnel")(spark, sfDir).collect().head
    val got = SparkEntry.queries("an_conversion_lag")(spark, sfDir)
      .select("lag_days", "n_users").as[(Long, Long)].collect()
    assert(got.forall(_._1 >= 0L))
    // view→purchase-after-view converters are a SUPERSET of the strict
    // view→click→purchase funnel's final stage
    assert(got.map(_._2).sum >= funnel.getAs[Long]("n_view_click_purchase"))
  }

  test("partition audit: envelope brackets the mean and skew >= 1") {
    val r = SparkEntry.queries("etl_partition_audit")(spark, sfDir).collect().head
    val (n, mn, mx, tot) = (r.getLong(0), r.getLong(1), r.getLong(2), r.getLong(3))
    assert(mn * n <= tot && tot <= mx * n)
    assert(r.getAs[Double]("skew_ratio") >= 1.0)
  }

  test("basket pairs reconstruct lift from the marginals") {
    val got = SparkEntry.queries("an_basket")(spark, sfDir).collect()
    val nOrders = Tables.lineitem(spark, sfDir)
      .select("l_orderkey").distinct().count()
    got.foreach { r =>
      val want = r.getAs[Long]("n_ab").toDouble * nOrders /
        (r.getAs[Long]("n_a").toDouble * r.getAs[Long]("n_b"))
      assert(math.abs(r.getAs[Double]("lift") - want) < 1e-12)
      assert(r.getAs[Long]("part_a") < r.getAs[Long]("part_b"))
    }
  }

  test("threshold sweep is monotone nonincreasing") {
    val got = SparkEntry.queries("dedup_threshold_sweep")(spark, sfDir)
      .select("threshold", "n_pairs").as[(Double, Long)].collect().sortBy(_._1)
    assert(got.map(_._2).toSeq == got.map(_._2).sorted.reverse.toSeq,
      "raising the cutoff can only drop pairs")
    graft.dedup.Dedup.releaseCaches()
  }

  test("pareto crossings are monotone in the target share") {
    val got = SparkEntry.queries("an_pareto")(spark, sfDir)
      .select("target_pct", "n_customers", "pct_customers")
      .as[(Long, Long, Double)].collect().sortBy(_._1)
    assert(got.map(_._1).toSeq == Seq(50L, 80L, 90L))
    assert(got.map(_._2).toSeq == got.map(_._2).sorted.toSeq,
      "more revenue share needs at least as many customers")
    assert(got.forall(r => r._3 > 0.0 && r._3 <= 1.0))
    graft.operators.PrefixSum.releaseCaches()
  }

  test("source matrix pair counts reconcile with the pair list total") {
    val docs = Tables.documents(spark, sfDir)
    val nPairs = graft.dedup.Dedup
      .ngramJaccardPairs(docs, "text", "doc_id", k = 3, tau = 0.05).count()
    val got = SparkEntry.queries("dedup_source_matrix")(spark, sfDir)
      .select("source_x", "source_y", "n_pairs").as[(String, String, Long)].collect()
    assert(got.map(_._3).sum == nPairs, "every near-dup pair lands in one cell")
    assert(got.forall(r => r._1 <= r._2), "matrix must be undirected-normalized")
    graft.dedup.Dedup.releaseCaches()
  }

  test("repeat-purchase gaps conserve the consecutive-pair count") {
    val purchases = Tables.events(spark, sfDir)
      .filter(col("event_type") === "purchase")
      .groupBy("user_id").count().as[(Long, Long)].collect()
    val wantPairs = purchases.map(r => math.max(0L, r._2 - 1)).sum
    val got = SparkEntry.queries("an_repeat_purchase")(spark, sfDir)
      .select("gap_days", "n_gaps").as[(Long, Long)].collect()
    assert(got.map(_._2).sum == wantPairs, "one gap per consecutive purchase pair")
    assert(got.forall(_._1 >= 0L))
  }

  test("mom growth reconstructs from the revenue columns") {
    val got = SparkEntry.queries("q_mom_growth")(spark, sfDir)
      .select("rev_c", "prev_c", "growth").as[(Long, Long, Double)].collect()
    got.foreach { case (rev, prev, g) =>
      assert(math.abs(g - (rev.toDouble / prev - 1.0)) < 1e-12)
    }
    assert(got.nonEmpty)
  }

  test("gini of a uniform distribution is ~0 and of one-winner is ~1") {
    // invariant check straight from the rank formula the query uses
    def gini(xs: Seq[Long]): Double = {
      val s = xs.sorted; val n = s.length.toLong
      val w = s.zipWithIndex.map { case (x, i) => x * (i + 1L) }.sum
      (2.0 * w - (n + 1.0) * s.sum) / (n.toDouble * s.sum)
    }
    assert(math.abs(gini(Seq.fill(100)(5L))) < 1e-9)
    assert(gini(Seq.fill(99)(0L) :+ 1000L) > 0.97)
    val g = SparkEntry.queries("an_gini")(spark, sfDir).collect().head.getDouble(3)
    assert(g > 0.0 && g < 1.0, s"spend concentration out of range: $g")
    graft.operators.PrefixSum.releaseCaches()
  }

  test("one-hot rows carry exactly one priority and one status indicator") {
    val got = SparkEntry.queries("etl_onehot")(spark, sfDir)
    val prio = got.columns.filter(_.startsWith("prio_"))
    val status = got.columns.filter(_.startsWith("status_"))
    assert(prio.length == 5 && status.length == 3)
    val sums = got.select(
      prio.map(col).reduce(_ + _).as("p"),
      status.map(col).reduce(_ + _).as("st"))
      .groupBy("p", "st").count().as[(Int, Int, Long)].collect()
    assert(sums.length == 1 && sums.head._1 == 1 && sums.head._2 == 1,
      "every category value must hit exactly one indicator")
  }

  test("scaling: per-segment z-scores center on 0, min-max spans [0,1]") {
    val got = SparkEntry.queries("etl_scale")(spark, sfDir)
    val bySeg = got.groupBy("c_mktsegment")
      .agg(avg("z"), min("minmax"), max("minmax"), count(lit(1)))
      .as[(String, Double, Double, Double, Long)].collect()
    assert(bySeg.nonEmpty)
    bySeg.foreach { case (seg, zbar, mn, mx, n) =>
      assert(math.abs(zbar) < 1e-6, s"$seg: z-mean $zbar (n=$n)")
      assert(mn == 0.0 && mx == 1.0, s"$seg: minmax range [$mn, $mx]")
    }
  }

  test("winsorized mean matches a driver-side clip at exact p10/p90 ranks") {
    val rows = Tables.orders(spark, sfDir)
      .select(col("o_orderpriority"),
        (col("o_totalprice").cast("decimal(24,2)") * 100).cast("bigint"))
      .as[(String, Long)].collect()
    val want = rows.groupBy(_._1).map { case (g, rs) =>
      val s = rs.map(_._2).sorted
      val n = s.length
      val lo = s((n + 9) / 10 - 1)        // type-1 quantile, 1-based rank
      val hi = s((9 * n + 9) / 10 - 1)
      val clipped = s.map(v => math.max(lo, math.min(hi, v)))
      g -> (s.count(v => v < lo || v > hi).toLong,
        clipped.sum.toDouble / n / 100.0)
    }
    val got = SparkEntry.queries("an_winsorize")(spark, sfDir)
      .select("o_orderpriority", "n_clipped", "wmean")
      .as[(String, Long, Double)].collect()
    got.foreach { case (g, nc, wm) =>
      assert((nc, wm) == want(g), s"$g: ($nc, $wm) vs ${want(g)}")
    }
    graft.operators.PrefixSum.releaseCaches()
  }

  test("decile lift covers every customer and closes at lift 1.0") {
    val got = SparkEntry.queries("an_decile_lift")(spark, sfDir)
      .select("decile", "n_cust", "n_churn", "churn_rate", "cum_lift")
      .as[(Long, Long, Long, Double, Double)].collect().sortBy(_._1)
    assert(got.map(_._1).toSeq == (1L to 10L), "exactly deciles 1..10")
    assert(got.map(_._2).sum == Tables.customer(spark, sfDir).count())
    got.foreach { case (d, n, c, r, _) =>
      assert(c <= n && math.abs(r - c.toDouble / n) < 1e-15, s"decile $d")
    }
    assert(got.last._5 == 1.0,
      "cumulative lift over all deciles IS the base rate — exactly 1")
    // ties aside, deciles are near-equal sized
    val sizes = got.map(_._2)
    assert(sizes.max <= sizes.min * 2, s"decile sizes skewed: ${sizes.toSeq}")
    graft.operators.PrefixSum.releaseCaches()
  }

  private def dailyRevCents(): Array[(Long, Long)] =
    Tables.lineitem(spark, sfDir)
      .groupBy(date_trunc("day", col("l_shipdate")).as("day"))
      .agg((sum((col("l_extendedprice") * (lit(1.0) - col("l_discount")))
          .cast("decimal(24,8)")).cast("decimal(24,2)") * 100)
        .cast("bigint").as("rev_c"))
      .select(datediff(col("day"), lit("1992-01-01").cast("date")).cast("long"),
        col("rev_c"))
      .as[(Long, Long)].collect().sortBy(_._1)

  test("rolling 7-day distinct users matches the brute-force window count") {
    val active = Tables.events(spark, sfDir)
      .select(col("user_id"),
        datediff(date_trunc("day", col("ts")), lit("1970-01-01").cast("date")).cast("long"))
      .distinct().as[(Long, Long)].collect()
    val (lo, hi) = (active.map(_._2).min, active.map(_._2).max)
    val want = (lo to hi).map { d =>
      d -> active.filter(a => a._2 >= d - 6 && a._2 <= d).map(_._1).distinct.length.toLong
    }.toMap
    val got = SparkEntry.queries("an_rolling_distinct")(spark, sfDir)
      .select(datediff(col("day"), lit("1970-01-01").cast("date")).cast("long"),
        col("n_active_7d"))
      .as[(Long, Long)].collect()
    assert(got.length == (hi - lo + 1), "one row per day of the span, quiet days included")
    got.foreach { case (d, n) => assert(n == want(d), s"day $d: $n vs ${want(d)}") }
    graft.operators.PrefixSum.releaseCaches()
  }

  test("peak detection matches a driver-side flank scan") {
    val series = dailyRevCents()
    val byDi = series.toMap
    val want = series.flatMap { case (di, rc) =>
      val ml = (di - 3 to di - 1).flatMap(byDi.get)
      val mr = (di + 1 to di + 3).flatMap(byDi.get)
      if (ml.nonEmpty && mr.nonEmpty && rc > ml.max && rc > mr.max &&
        20L * (rc - math.max(ml.max, mr.max)) > rc)
        Some(di -> (rc - math.max(ml.max, mr.max)))
      else None
    }.toMap
    val got = SparkEntry.queries("an_peaks")(spark, sfDir)
      .select(datediff(col("day"), lit("1992-01-01").cast("date")).cast("long"),
        col("prominence_c"))
      .as[(Long, Long)].collect().toMap
    assert(got == want, s"peaks differ: got ${got.size}, want ${want.size}")
    assert(got.nonEmpty, "a noisy daily series must produce some peaks")
  }

  test("runs test reconstructs from the direction sequence") {
    val series = dailyRevCents().map(_._2)
    val moves = series.sliding(2).collect {
      case Array(a, b) if a != b => b > a
    }.toSeq
    val runs = 1 + moves.sliding(2).count {
      case Seq(a, b) => a != b
      case _ => false
    }
    val row = SparkEntry.queries("an_runs_test")(spark, sfDir).head()
    assert(row.getAs[Long]("n_up") == moves.count(identity).toLong)
    assert(row.getAs[Long]("n_down") == moves.count(!_).toLong)
    assert(row.getAs[Long]("n_runs") == runs.toLong)
    val (u, d) = (moves.count(identity).toDouble, moves.count(!_).toDouble)
    val mu = 2.0 * u * d / (u + d) + 1.0
    assert(math.abs(row.getAs[Double]("expected_runs") - mu) < 1e-9)
  }

  test("seasonal decomposition matches a driver-side recompute exactly") {
    val daily = Tables.lineitem(spark, sfDir)
      .groupBy(date_trunc("day", col("l_shipdate")).as("day"))
      .agg((sum((col("l_extendedprice") * (lit(1.0) - col("l_discount")))
          .cast("decimal(24,8)")).cast("decimal(24,2)") * 100)
        .cast("bigint").as("rev_c"))
      .select(datediff(col("day"), lit("1992-01-01").cast("date")).cast("long"),
        col("rev_c"),
        (weekday(col("day")) + 1).cast("long"))
      .as[(Long, Long, Long)].collect().sortBy(_._1)
    val byDi = daily.map(r => r._1 -> r).toMap
    val interior = daily.flatMap { case (di, rc, dow) =>
      val win = (di - 3 to di + 3).flatMap(byDi.get)
      if (win.length == 7) Some((dow, rc, win.map(_._2).sum)) else None
    }
    val want = interior.groupBy(_._1).map { case (dow, rs) =>
      val n = rs.length
      dow -> (n.toLong,
        rs.map(_._2).sum.toDouble / n / 100.0,
        rs.map(r => 7L * r._2 - r._3).sum.toDouble / n / 700.0)
    }
    val got = SparkEntry.queries("an_seasonal_decompose")(spark, sfDir)
      .select("dow", "n_days", "mean_rev", "seasonal")
      .as[(Long, Long, Double, Double)].collect()
    assert(got.length == 7)
    got.foreach { case (dow, n, mr, se) =>
      assert((n, mr, se) == want(dow), s"dow $dow: ($n,$mr,$se) vs ${want(dow)}")
    }
  }

  test("price elasticity tracks a plain-double OLS recompute per brand") {
    val cells = Tables.lineitem(spark, sfDir)
      .join(Tables.part(spark, sfDir), col("l_partkey") === col("p_partkey"))
      .groupBy(col("p_brand"), col("l_discount"), col("l_quantity"))
      .agg(count(lit(1)).as("cnt"))
      .as[(String, Double, Double, Long)].collect()
    val want = cells.groupBy(_._1).map { case (b, rs) =>
      val n = rs.map(_._4).sum.toDouble
      def s(f: (Double, Double) => Double) =
        rs.map(r => r._4 * f(math.log(1.0 - r._2), math.log(r._3))).sum
      val (sx, sy) = (s((x, _) => x), s((_, y) => y))
      val (sxx, sxy) = (s((x, _) => x * x), s((x, y) => x * y))
      b -> (n * sxy - sx * sy) / (n * sxx - sx * sx)
    }
    val got = SparkEntry.queries("an_price_elasticity")(spark, sfDir)
      .select("p_brand", "elasticity").as[(String, Double)].collect()
    assert(got.length == want.size)
    got.foreach { case (b, e) =>
      assert(math.abs(e - want(b)) < 1e-6 * (1 + math.abs(want(b))), s"$b: $e vs ${want(b)}")
    }
  }

  test("kaplan-meier curve is monotone and risk sets shrink") {
    val got = SparkEntry.queries("an_kaplan_meier")(spark, sfDir)
      .select("t", "n_risk", "d", "surv").as[(Long, Long, Long, Double)].collect()
    assert(got.nonEmpty)
    got.sliding(2).foreach {
      case Array((t1, r1, _, s1), (t2, r2, _, s2)) =>
        assert(t1 < t2, "event times strictly increase")
        assert(r2 < r1, "the risk set loses at least the previous events")
        assert(s2 <= s1 + 1e-12, s"survival must not increase: $s1 -> $s2")
      case _ =>
    }
    got.foreach { case (t, r, d, sv) =>
      assert(d >= 1 && d <= r, s"t=$t: events $d must fit the risk set $r")
      assert(sv >= 0.0 && sv <= 1.0)
    }
    val total = Tables.orders(spark, sfDir)
      .select(count_distinct(col("o_custkey"))).as[Long].head()
    assert(got.head._2 <= total, "first risk set is at most every customer")
  }

  test("corr matrix agrees with Spark's built-in corr on every pair") {
    val got = SparkEntry.queries("an_corr_matrix")(spark, sfDir)
      .select("col_a", "col_b", "corr").as[(String, String, Double)].collect()
    assert(got.length == 6, "4 measures must yield 6 unordered pairs")
    val li = Tables.lineitem(spark, sfDir)
    val name = Map("qty" -> "l_quantity", "price" -> "l_extendedprice",
      "disc" -> "l_discount", "tax" -> "l_tax")
    got.foreach { case (a, b, c) =>
      assert(c >= -1.0 && c <= 1.0, s"($a,$b) out of range: $c")
      val want = li.agg(corr(col(name(a)), col(name(b)))).head().getDouble(0)
      assert(math.abs(c - want) < 1e-5, s"($a,$b): $c vs built-in $want")
    }
  }

  test("shard packing conserves bytes and respects the next-fit cap") {
    val cap = 32768L
    val docs = Tables.documents(spark, sfDir)
      .select(octet_length(col("text")).cast("long")).as[Long].collect()
    val got = SparkEntry.queries("mm_shard_pack")(spark, sfDir)
      .select("shard_id", "n_docs", "shard_bytes").as[(Long, Long, Long)].collect()
    assert(got.map(_._3).sum == docs.sum, "every byte lands in exactly one shard")
    assert(got.map(_._2).sum == docs.length.toLong, "every doc lands in exactly one shard")
    val ids = got.map(_._1).sorted
    assert(ids.head == 0 && ids.last == ids.length - 1, "shard ids must be contiguous")
    // next-fit: a shard holds docs whose START offsets fall inside its
    // cap window, so its size is < cap + the largest straddling doc
    got.foreach { case (id, _, bytes) =>
      assert(bytes < cap + docs.max, s"shard $id overflows: $bytes")
    }
    graft.operators.PrefixSum.releaseCaches()
  }

  test("early facts split exactly into matched + inferred") {
    val got = SparkEntry.queries("etl_early_fact")(spark, sfDir)
      .select("n_facts", "n_matched", "n_inferred", "n_inferred_members")
      .as[(Long, Long, Long, Long)].collect()
    assert(got.nonEmpty)
    got.foreach { case (f, m, i, im) =>
      assert(m + i == f, "matched and inferred must partition the facts")
      assert(im <= i, "distinct missing members cannot exceed inferred fact rows")
      assert(i > 0, "the md5 dim subset must leave some facts unmatched")
    }
    assert(got.map(_._1).sum == Tables.orders(spark, sfDir).count())
  }

  test("churn partitions every customer into active/churned/never") {
    val got = SparkEntry.queries("an_churn_rate")(spark, sfDir)
      .select("n_customers", "n_active", "n_churned", "n_never", "churn_rate")
      .as[(Long, Long, Long, Long, Double)].collect()
    assert(got.nonEmpty)
    got.foreach { case (n, a, c, nv, rate) =>
      assert(a + c + nv == n, "the three states must partition the segment")
      assert(rate == (c + nv).toDouble / n)
    }
    val total = Tables.customer(spark, sfDir).count()
    assert(got.map(_._1).sum == total, "every customer lands in a segment row")
  }

  test("ANOVA emits consistent scale-stable statistics (eta_sq recomposes F)") {
    val got = SparkEntry.queries("an_anova")(spark, sfDir)
      .select("k", "n", "eta_sq", "f_stat")
      .as[(Long, Long, Double, Double)].head()
    val (k, n, eta, f) = got
    assert(k == 5, "TPC-H has 5 market segments")
    assert(n == Tables.orders(spark, sfDir).count())
    assert(eta >= 0 && eta <= 1, s"eta_sq out of [0,1]: $eta")
    assert(f >= 0 && !f.isNaN, s"F out of range: $f")
    // F and eta² describe the same decomposition: F = (eta/(1−eta)) ·
    // (n−k)/(k−1) — both are ROUND 6 emissions, so the recomposition
    // holds to the rounding resolution amplified by the ratio's
    // sensitivity at small eta (|dF/deta| ≈ F/eta)
    val fWant = (eta / (1.0 - eta)) * ((n - k).toDouble / (k - 1).toDouble)
    assert(math.abs(f - fWant) <= 2e-6 * (fWant / eta).max(1.0),
      s"F $f must recompose from eta_sq (want ~$fWant)")
  }

  test("Mann-Whitney U matches a driver-side midrank brute force") {
    val got = SparkEntry.queries("an_mannwhitney")(spark, sfDir)
      .select("n1", "n2", "u1", "z").as[(Long, Long, Double, Double)].head()
    graft.operators.PrefixSum.releaseCaches()
    val rows = Tables.orders(spark, sfDir)
      .filter(col("o_orderpriority").isin("1-URGENT", "5-LOW"))
      .select((col("o_orderpriority") === "1-URGENT").cast("boolean"),
        (col("o_totalprice").cast("decimal(24,2)") * 100).cast("bigint"))
      .as[(Boolean, Long)].collect()
    assert(got._1 == rows.count(_._1) && got._2 == rows.count(!_._1))
    // midranks the quadratic way: rank = #smaller + (#equal + 1) / 2
    val r1 = rows.filter(_._1).map { case (_, v) =>
      rows.count(_._2 < v) + (rows.count(_._2 == v) + 1) / 2.0
    }.sum
    val u1Want = r1 - got._1 * (got._1 + 1) / 2.0
    assert(got._3 == u1Want, s"U1 ${got._3} vs brute force $u1Want")
    assert(!got._4.isNaN)
  }

  test("Kruskal-Wallis H matches a driver-side midrank brute force") {
    val got = SparkEntry.queries("an_kruskal")(spark, sfDir)
      .select("k", "n", "h_stat").as[(Long, Long, Double)].head()
    graft.operators.PrefixSum.releaseCaches()
    assert(got._1 == 5, "TPC-H has 5 order priorities")
    val rows = Tables.orders(spark, sfDir)
      .select(col("o_orderpriority"),
        (col("o_totalprice").cast("decimal(24,2)") * 100).cast("bigint"))
      .as[(String, Long)].collect()
    assert(got._2 == rows.length)
    val n = rows.length.toDouble
    val rank = rows.map { case (_, v) =>
      rows.count(_._2 < v) + (rows.count(_._2 == v) + 1) / 2.0
    }
    val dev = rows.map(_._1).zip(rank).groupBy(_._1).values.map { grp =>
      val rs = grp.map(_._2).sum
      (rs - grp.length * (n + 1) / 2.0) * (rs - grp.length * (n + 1) / 2.0) / grp.length
    }.sum
    val ties = rows.groupBy(_._2).values
      .map(g => g.length.toDouble * g.length * g.length - g.length).sum
    val hWant = 12.0 / (n * (n + 1)) * dev / (1.0 - ties / (n * n * n - n))
    assert(math.abs(got._3 - hWant) < 1e-6, s"H ${got._3} vs brute force $hWant")
  }

  test("degree histogram obeys the handshake lemma") {
    val got = SparkEntry.queries("q_degree_hist")(spark, sfDir)
      .select("degree", "n_parts").as[(Long, Long)].collect()
    val li = Tables.lineitem(spark, sfDir)
      .select(col("l_orderkey"), col("l_partkey")).as[(Long, Long)].collect()
      .groupBy(_._1).values
    val edges = li.flatMap { grp =>
      val ps = grp.map(_._2).distinct.sorted
      for (i <- ps.indices; j <- i + 1 until ps.length) yield (ps(i), ps(j))
    }.toSet
    assert(got.map(r => r._1 * r._2).sum == 2L * edges.size,
      "sum of degrees must be twice the edge count")
    assert(got.map(_._2).sum == edges.flatMap(e => Seq(e._1, e._2)).size,
      "every connected part appears in exactly one degree bucket")
    assert(got.forall(_._1 >= 1), "degree-0 nodes cannot appear")
  }
}
