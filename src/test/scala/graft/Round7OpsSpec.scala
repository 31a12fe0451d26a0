package graft

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

import graft.ops.GraphOps

/** Round-7 operators: the bucketed-layout PageRank (exchange-free
  * supersteps) and its equality contract with the plain loop.
  */
class Round7OpsSpec extends AnyFunSuite {

  lazy val spark: SparkSession = TestSpark.session
  private val d = TestSpark.sf001

  test("pageRankBucketed is BIT-identical to pageRank (layout is pure " +
      "physics; the scaled-integer supersteps leave no room for drift)") {
    val plain = GraphOps.pageRank(spark, d).collect().toSeq
    val bucketed = GraphOps.pageRankBucketed(spark, d).collect().toSeq
    assert(bucketed === plain)
  }

  test("bucketed superstep: the rank⋈edges SortMergeJoin subtree has " +
      "ZERO Exchange — both sides are bucket-aligned sorted scans — and " +
      "the only shuffle in the whole superstep is the inherent dst-keyed " +
      "inbox routing") {
    // layout must exist: run the bucketed variant once at this sf
    GraphOps.pageRankBucketed(spark, d, iters = 1).collect()
    val oldAqe = spark.conf.get("spark.sql.adaptive.enabled")
    val oldBc = spark.conf.get("spark.sql.autoBroadcastJoinThreshold")
    spark.conf.set("spark.sql.adaptive.enabled", "false")
    // at 100 TB neither side broadcasts — the config under which the
    // layout matters; without it the sf-sized rank table would broadcast
    spark.conf.set("spark.sql.autoBroadcastJoinThreshold", "-1")
    // report the (one-file-per-bucket) scans' sort order — the flag the
    // operator itself sets for its loop
    spark.conf
      .set("spark.sql.legacy.bucketedTableScan.outputOrdering", "true")
    try {
      val pfx = GraphOps.tablePrefixFor(d)
      val step = GraphOps.superstep(spark, s"${pfx}_edges_bkt",
        s"${pfx}_nodes_bkt", s"${pfx}_rank_0", 1L)
      val plan = step.queryExecution.executedPlan
      val smj = plan.collectFirst {
        case j: org.apache.spark.sql.execution.joins.SortMergeJoinExec
          if j.joinType == org.apache.spark.sql.catalyst.plans.Inner &&
             j.rightKeys.map(_.sql).exists(_.contains("src")) => j
      }.getOrElse(fail(s"expected the rank⋈edges SortMergeJoin:\n$plan"))
      val shuffles = smj.collect {
        case e: org.apache.spark.sql.execution.exchange.ShuffleExchangeExec => e
      }
      assert(shuffles.isEmpty,
        s"bucketed superstep join still shuffles below the SMJ:\n$smj")
      // one-file-per-bucket writes ⇒ the scans come back provably
      // sorted ⇒ the SMJ needs no per-round re-sort on either side
      val sorts = smj.collect {
        case e: org.apache.spark.sql.execution.SortExec => e
      }
      assert(sorts.isEmpty,
        s"bucketed superstep join still re-sorts below the SMJ:\n$smj")
      val scanStr = smj.collectLeaves().map(_.toString).mkString("\n")
      assert(scanStr.contains("Bucketed: true"),
        s"bucketed layout not used by the superstep scans:\n$scanStr")
      // the whole superstep's shuffle count: exactly the inbox routing
      // (groupBy dst) + the rank-sized re-alignment for the nodes left
      // join — never an edge-table shuffle
      val all = plan.collect {
        case e: org.apache.spark.sql.execution.exchange.ShuffleExchangeExec => e
      }
      assert(all.size <= 2, s"unexpected shuffles in the superstep:\n$plan")
    } finally {
      spark.conf.set("spark.sql.adaptive.enabled", oldAqe)
      spark.conf.set("spark.sql.autoBroadcastJoinThreshold", oldBc)
      spark.conf
        .unset("spark.sql.legacy.bucketedTableScan.outputOrdering")
    }
  }

  test("r_storage_partitioned_join (registered entry): the SPJ self-join " +
      "SortMergeJoin subtree has ZERO Exchange (source-reported " +
      "KeyGroupedPartitioning co-locates both sides) and matches a " +
      "plain shuffled recount") {
    val oldAqe = spark.conf.get("spark.sql.adaptive.enabled")
    val oldBc = spark.conf.get("spark.sql.autoBroadcastJoinThreshold")
    spark.conf.set("spark.sql.adaptive.enabled", "false")
    spark.conf.set("spark.sql.autoBroadcastJoinThreshold", "-1")
    try {
      val df = graft.ops.Relational.storagePartitionedJoinAgg(spark)
      val smj = df.queryExecution.executedPlan.collectFirst {
        case j: org.apache.spark.sql.execution.joins.SortMergeJoinExec => j
      }.getOrElse(fail("expected the SPJ SortMergeJoin:\n" +
        df.queryExecution.executedPlan))
      val shuffles = smj.collect {
        case e: org.apache.spark.sql.execution.exchange.ShuffleExchangeExec => e
      }
      assert(shuffles.isEmpty,
        s"storage-partitioned join still shuffles below the SMJ:\n$smj")
      val rows = df.collect()
      assert(rows.length == 20) // 5000 ids / 250 per bucket
      rows.foreach { r =>
        val b = r.getLong(0)
        assert(r.getLong(1) == 250L)
        assert(r.getLong(2) == b * 250 && r.getLong(3) == b * 250 + 249)
      }
    } finally {
      spark.conf.set("spark.sql.adaptive.enabled", oldAqe)
      spark.conf.set("spark.sql.autoBroadcastJoinThreshold", oldBc)
    }
  }

  test("bpeMerges reproduces Sennrich et al. 2016 §3.2 on the worked " +
      "example vocabulary {low:5, lower:2, newest:6, widest:3}: es → " +
      "est → lo → low, with deterministic (count desc, pair) tie-breaks") {
    import spark.implicits._
    val vocab = Seq(("low", 5L), ("lower", 2L), ("newest", 6L),
      ("widest", 3L)).toDF("word", "wf")
    val rows = graft.ops.TextOps.bpeMergesFrom(spark, vocab, 6)
      .collect()
      .map(r => (r.getInt(0), r.getString(1), r.getString(2),
        r.getString(3), r.getLong(4)))
    assert(rows.toSeq == Seq(
      (1, "e", "s", "es", 9L),
      (2, "es", "t", "est", 9L),
      (3, "l", "o", "lo", 7L),
      (4, "lo", "w", "low", 7L),
      (5, "e", "w", "ew", 6L),
      (6, "ew", "est", "ewest", 6L)))
  }

  test("quantileRollupDaily: merged hourly KLL partials land within the " +
      "rank tolerance on every day (flags all true), exact quantiles " +
      "reconcile with a brute per-day recompute, and day counts " +
      "partition the fact table") {
    import graft.ops.EventOps
    val rows = EventOps.quantileRollupDaily(spark, d).collect()
    assert(rows.nonEmpty)
    rows.foreach { r =>
      assert(r.getBoolean(4) && r.getBoolean(5),
        s"KLL estimate outside the rank tolerance: $r")
      assert(r.getDouble(2) <= r.getDouble(3),
        s"p50 above p90: $r")
    }
    assert(rows.map(_.getLong(1)).sum ==
      Tables.events(spark, d).count())
    // brute recompute for the first day: ceil-rank convention
    val day0 = rows.head.getTimestamp(0)
    val vals = Tables.events(spark, d)
      .filter(date_trunc("day", col("ts")) === day0)
      .select("value").collect().map(_.getDouble(0)).sorted
    def q(p: Int) = vals(math.max(1, (p * vals.length + 99) / 100) - 1)
    assert(rows.head.getDouble(2) == q(50) && rows.head.getDouble(3) == q(90))
  }

  test("slidingQuantile: audited windows (every 3rd) carry exact p50 + " +
      "an in-tolerance rank flag, unaudited windows carry NULLs, and " +
      "the audited exact values match a brute window recompute") {
    import graft.ops.EventOps
    val rows = EventOps.slidingQuantile(spark, d).collect()
    assert(rows.nonEmpty)
    rows.foreach { r =>
      val audited = r.getLong(0) % 3 == 0
      assert(r.isNullAt(2) == !audited, s"audit sampling off: $r")
      if (audited) assert(r.getBoolean(3), s"rank flag false: $r")
    }
    // brute recompute for the first audited window
    val w0 = rows.find(_.getLong(0) % 3 == 0).get
    val vals = Tables.events(spark, d)
      .selectExpr("unix_timestamp(ts) div 3600 AS h", "value")
      .filter(col("h").between(w0.getLong(0) - 5, w0.getLong(0)))
      .select("value").collect().map(_.getDouble(0)).sorted
    assert(w0.getLong(1) == vals.length.toLong)
    assert(w0.getDouble(2) ==
      vals(math.max(1, (50 * vals.length + 99) / 100) - 1))
  }

  test("segmentOverlap: exact pairwise overlaps reconcile with a brute " +
      "per-pair recount, all type pairs present, and theta stays within " +
      "bound at fixture cardinality (exact regime)") {
    import graft.ops.EventOps
    val rows = EventOps.segmentOverlap(spark, d).collect()
    val types = Tables.events(spark, d).select("event_type").distinct()
      .collect().map(_.getString(0)).sorted
    assert(rows.length == types.length * (types.length - 1) / 2)
    assert(rows.forall(_.getBoolean(3)),
      "theta estimate outside bound in its exact regime")
    // brute recount for the lexicographically first pair
    val (ta, tb) = (rows.head.getString(0), rows.head.getString(1))
    val ua = Tables.events(spark, d).filter(col("event_type") === ta)
      .select("user_id").distinct().collect().map(_.getLong(0)).toSet
    val ub = Tables.events(spark, d).filter(col("event_type") === tb)
      .select("user_id").distinct().collect().map(_.getLong(0)).toSet
    assert(rows.head.getLong(2) == ua.intersect(ub).size.toLong)
  }

  test("CmsUnion: sketch merged from per-language shard partials is " +
      "BIT-identical to the sketch built directly over the whole corpus " +
      "(counter addition is grouping-invariant), and the rollup entry's " +
      "bound flags all hold") {
    import graft.functions.CmsUnion.cmsUnion
    import graft.ops.TextOps
    val terms = Tables.documents(spark, d)
      .select(col("lang"),
        explode(TextOps.tokens(lower(col("text")))).as("term"))
    val merged = terms.groupBy("lang")
      .agg(expr("count_min_sketch(term, 0.001D, 0.99D, 42)").as("cms"))
      .agg(cmsUnion(col("cms")))
      .collect()(0).getAs[Array[Byte]](0)
    val direct = terms
      .agg(expr("count_min_sketch(term, 0.001D, 0.99D, 42)"))
      .collect()(0).getAs[Array[Byte]](0)
    assert(java.util.Arrays.equals(merged, direct),
      "shard-merged CMS differs from the directly built sketch")
    val rows = TextOps.termFreqRollup(spark, d).collect()
    assert(rows.length == 30)
    assert(rows.forall(_.getBoolean(2)),
      "a merged-sketch estimate broke the CMS promise")
    // never-undercount, concretely: estimates from the merged sketch
    // dominate the exact counts for every queried term
    val sk = org.apache.spark.util.sketch.CountMinSketch
      .readFrom(new java.io.ByteArrayInputStream(merged))
    rows.foreach(r =>
      assert(sk.estimateCount(r.getString(0)) >= r.getLong(1)))
  }

  test("segmentExclusive completes the theta triple: per ordered pair, " +
      "|A\\B| reconciles as |A| - overlap(A,B) against segmentOverlap's " +
      "own gated numbers, and the difference-sketch flag holds") {
    import graft.ops.EventOps
    val excl = EventOps.segmentExclusive(spark, d).collect()
      .map(r => (r.getString(0), r.getString(1)) -> r.getLong(2)).toMap
    val over = EventOps.segmentOverlap(spark, d).collect()
      .map(r => (r.getString(0), r.getString(1)) -> r.getLong(2)).toMap
    val nd = Tables.events(spark, d).select("user_id", "event_type")
      .distinct().collect().groupBy(_.getString(1))
      .map { case (t, rs) => t -> rs.length.toLong }
    assert(excl.nonEmpty)
    excl.foreach { case ((a, b), onlyA) =>
      val both = over.getOrElse((a, b), over.getOrElse((b, a), 0L))
      assert(onlyA == nd(a) - both, s"($a,$b)")
    }
    assert(EventOps.segmentExclusive(spark, d).collect()
      .forall(_.getBoolean(3)), "difference sketch outside bound")
  }

  test("bpeTrain final representations encode the Sennrich example as " +
      "the paper does: low→[low], lower→[low,e,r], newest→[n,ewest], " +
      "widest→[w,i,d,est]; bpeEncode invariants hold on the corpus") {
    import spark.implicits._
    val vocab = Seq(("low", 5L), ("lower", 2L), ("newest", 6L),
      ("widest", 3L)).toDF("word", "wf")
    val (_, fin) = graft.ops.TextOps.bpeTrain(spark, vocab, 6)
    val reprs = fin.collect()
      .map(r => r.getString(0) -> r.getString(2)).toMap
    assert(reprs("low") == "<low>")
    assert(reprs("lower") == "<low><e><r>")
    assert(reprs("newest") == "<n><ewest>")
    assert(reprs("widest") == "<w><i><d><est>")
    // corpus-side invariants: every word contributes >= 1 subword and
    // <= its character count; fertility sits in [1, max word length]
    val rows = graft.ops.TextOps.bpeEncode(spark, d).collect()
    assert(rows.nonEmpty)
    rows.foreach { r =>
      val (nw, ns, f) = (r.getLong(1), r.getLong(2), r.getDouble(3))
      assert(ns >= nw, s"fewer subwords than words: $r")
      assert(f >= 1.0 && f < 64.0, s"implausible fertility: $r")
    }
  }

  test("bpeMerges greedy non-overlap semantics: pair (a,a) over 'aaaa' " +
      "merges twice, over 'aaa' merges once — replace consumes matches " +
      "left-to-right without rescanning its own output") {
    import spark.implicits._
    val vocab = Seq(("aaaa", 1L), ("aaa", 1L)).toDF("word", "wf")
    val rows = graft.ops.TextOps.bpeMergesFrom(spark, vocab, 2)
      .collect()
      .map(r => (r.getInt(0), r.getString(3), r.getLong(4)))
    // round 1: pairs (a,a) appear 3 + 2 = 5 times; merge (a,a) → aa
    // round 2: 'aaaa' → [aa, aa] (ONE pair), 'aaa' → [aa, a] (one pair
    // (aa,a)) — greedy non-overlap leaves exactly these
    assert(rows(0) == ((1, "aa", 5L)))
    assert(rows(1) == ((2, "aa", 1L)) || rows(1) == ((2, "aaa", 1L)),
      s"unexpected round-2 merge: ${rows(1)}")
    // tie-break is (cnt desc, a, b): (aa,a) sorts before (aa,aa)
    assert(rows(1)._2 == "aaa")
  }

  test("lmScoreBigram: n_bigrams = n_tokens - 1 for every multi-token " +
      "doc, scores strictly negative (add-one smoothing keeps p < 1), " +
      "and single-token docs are absent") {
    import graft.ops.TextOps
    val big = TextOps.lmScoreBigram(spark, d).collect()
      .map(r => r.getLong(0) -> (r.getLong(1), r.getDouble(2))).toMap
    assert(big.nonEmpty)
    big.values.foreach { case (n, lp) =>
      assert(n >= 1)
      assert(lp < 0, s"smoothed bigram logprob must be negative: $lp")
    }
    val tok = TextOps.tokenCount(spark, d).collect()
      .map(r => r.getLong(0) -> r.getLong(1)).toMap
    tok.foreach { case (id, n) =>
      if (n >= 2) assert(big(id)._1 == n - 1,
        s"doc $id: ${big(id)._1} bigrams for $n tokens")
      else assert(!big.contains(id), s"doc $id with $n tokens has a score")
    }
  }

  test("ccnetBucketsBigram: per language, head-bucket mean beats the " +
      "tail-bucket mean (the cut orders by the score it reports), and " +
      "doc counts reconcile with the scored population") {
    import graft.ops.TextOps
    val rows = TextOps.ccnetBucketsBigram(spark, d).collect()
    assert(rows.nonEmpty)
    val byLang = rows.groupBy(_.getString(0))
    byLang.foreach { case (lang, rs) =>
      val m = rs.map(r => r.getString(1) -> r.getDouble(4)).toMap
      assert(m("head") > m("tail"),
        s"$lang: head ${m("head")} !> tail ${m("tail")}")
    }
    val scoredDocs = TextOps.lmScoreBigram(spark, d).count()
    assert(rows.map(_.getLong(2)).sum == scoredDocs)
  }

  test("pageRankBucketed conserves rank mass within integer-quantization " +
      "loss: sum(r) ≤ 1e12, and the cumulative floor-division loss over " +
      "10 supersteps stays far below 1% of the mass") {
    import graft.sources.Sinks
    val pfx = GraphOps.tablePrefixFor(d)
    GraphOps.pageRankBucketed(spark, d).collect() // 10 iters → rank_0 final
    val total = spark.table(s"${pfx}_rank_0")
      .agg(sum(col("r")).as("t")).collect().head.getLong(0)
    assert(total <= 1_000_000_000_000L, s"rank mass exceeds unity: $total")
    assert(total > 990_000_000_000L,
      s"quantization loss implausibly large: $total")
    Seq(s"${pfx}_edges_bkt", s"${pfx}_nodes_bkt",
      s"${pfx}_rank_0", s"${pfx}_rank_1")
      .foreach(Sinks.resetManagedTable(spark, _))
  }
}
