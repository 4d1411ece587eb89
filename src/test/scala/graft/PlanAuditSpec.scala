package graft

import org.apache.spark.sql.SparkSession
import org.scalatest.funsuite.AnyFunSuite

/** Plan-shape regression gates: the scale claims in SURVEY.md §5
  * ("filters pushed to the scan", "column pruning reaches parquet",
  * "dims broadcast") asserted against the actual PHYSICAL plans, so a
  * refactor that silently loses a pushdown fails CI instead of
  * shipping a full-scan at 100 TB.
  */
class PlanAuditSpec extends AnyFunSuite {
  lazy val spark: SparkSession = GraftSession.local(4)
  private val dir = "/root/testdata/sf0.001"

  /** Formatted physical plan (scan details incl. PushedFilters /
    * ReadSchema), not the parsed/logical sections — those print the
    * full relation schema and would false-negative pruning checks. */
  private def planOf(name: String): String =
    SparkEntry.queries(name)(spark, dir).queryExecution.explainString(
      org.apache.spark.sql.execution.FormattedMode)

  test("fn_search pushes the contains filter into the parquet scan") {
    val p = planOf("fn_search")
    assert(p.contains("StringContains(p_name,gear)"),
      s"contains filter not pushed:\n$p")
  }

  test("q6_forecast pushes every predicate and prunes to the 4 needed columns") {
    val p = planOf("q6_forecast")
    assert(p.contains("GreaterThanOrEqual(l_shipdate") &&
      p.contains("LessThan(l_quantity,30.0)"),
      s"range predicates not pushed:\n$p")
    val read = "ReadSchema: struct<([^>]*)>".r.findFirstMatchIn(p).map(_.group(1))
    assert(read.exists(s => !s.contains("l_comment") && !s.contains("l_orderkey")
      && s.split(",").length == 4),
      s"scan reads more than the 4 needed columns: $read")
  }

  test("fixed-k samplers compile to TakeOrderedAndProject, not a global sort") {
    // the scale contract of D91/D92: a per-partition top-k heap + one
    // k·partitions-row reduce — a Sort+Limit pair instead would
    // shuffle the whole corpus to order it
    Seq("sample_fixed_k", "sample_weighted_k").foreach { q =>
      val p = planOf(q)
      assert(p.contains("TakeOrderedAndProject"),
        s"$q lost the top-k shape:\n$p")
    }
  }

  test("refresh_compose broadcasts every delta-derived side (no store shuffle joins)") {
    // the A8 scale contract: term df, corpus meta, and the per-doc
    // join tails are broadcast; the only exchanges over the corpus
    // are the postings/signature aggregations themselves
    val p = planOf("refresh_compose")
    assert(p.contains("BroadcastHashJoin") || p.contains("BroadcastNestedLoopJoin"),
      s"no broadcast in refresh_compose:\n$p")
    assert(!p.contains("CartesianProduct"),
      s"cartesian product in refresh_compose:\n$p")
  }

  test("streamed near-dup rerank: broadcast joins only, no pair-sized exchange") {
    // the r12 sf10 lesson: past the pair budget, the ONLY acceptable
    // rerank shape (when vectors fit the broadcast clamp) streams
    // candidates map-side through BroadcastHashJoins — a sort-merge
    // rerank would shuffle array-carrying pair rows (the 100-min
    // killed form); the sole non-broadcast join allowed is the
    // signature-sized (band, bucket) self-join
    sys.props("graft.emb.pair.budget") = "1"
    try {
      val p = planOf("dedup_embedding")
      assert("BroadcastHashJoin".r.findAllIn(p).size >= 2,
        s"rerank not broadcast:\n$p")
      assert("SortMergeJoin".r.findAllIn(p).size
        + "ShuffledHashJoin".r.findAllIn(p).size <= 1,
        s"pair-sized shuffle join in streamed rerank:\n$p")
      assert(!p.contains("CartesianProduct"))
    } finally sys.props.remove("graft.emb.pair.budget")
  }

  test("ngram prefix ranking never plans a corpus-wide window sort") {
    // the r13 cut of the sf10 top board line (459 s): the rarity
    // prefix must come from per-doc array_sort inside a hash
    // aggregate — a row_number() window re-introduces a corpus-sized
    // range sort of the (doc, shingle, df) frame
    val docs = Tables.documentsShared(spark, dir)
    val p = pipeline.Dedup.ngramJaccardPrefixForced(docs)
      .queryExecution.explainString(org.apache.spark.sql.execution.FormattedMode)
    assert(!p.contains("Window"),
      s"prefix ranking regressed to a window sort:\n$p")
    assert(p.contains("HashAggregate") || p.contains("ObjectHashAggregate"),
      s"expected the per-doc aggregate form:\n$p")
  }

  test("cooccurrence projection is join-free: pairs expand inline from per-item arrays") {
    // the r13 cosupply cut: the item-keyed self-join (entity frame
    // shuffled twice + two SMJ sorts) must not come back — pair rows
    // are born from nested transform over each item's sorted entity
    // array, inside the stage whose (a,b) partial aggregate folds them
    import spark.implicits._
    val pairs = Seq((1L, 10L), (2L, 10L), (3L, 10L), (1L, 20L), (2L, 20L))
      .toDF("entity", "item")
    val p = graph.Ranking.cooccurrence(pairs)
      .queryExecution.explainString(org.apache.spark.sql.execution.FormattedMode)
    assert(!p.contains("Join"),
      s"cooccurrence regressed to a self-join:\n$p")
    assert(p.contains("Generate"), // the explode of the inline pair arrays
      s"expected inline pair expansion (explode):\n$p")
  }

  test("q1_pricing prunes unused lineitem columns from the scan") {
    val p = planOf("q1_pricing")
    val read = "ReadSchema: struct<([^>]*)>".r.findFirstMatchIn(p).map(_.group(1))
    assert(read.exists(s => !s.contains("l_partkey") && !s.contains("l_suppkey")),
      s"aggregation scan not pruned: $read")
  }

  test("q3_topk never broadcasts the orders fact side (only the customer dim hint)") {
    // With auto-broadcast disabled, the only BroadcastHashJoin left must be
    // the explicit customer-dim hint; orders⋈lineitem has to shuffle. A
    // broadcast() hint on the date-filtered orders side would survive this
    // conf and show up as a second BroadcastHashJoin — the 100×-scale OOM.
    val key = "spark.sql.autoBroadcastJoinThreshold"
    val prev = spark.conf.get(key)
    try {
      spark.conf.set(key, "-1")
      val p = planOf("q3_topk")
      // FormattedMode prints each node twice (tree + numbered detail
      // section); count only the numbered detail entries.
      val broadcasts = """\(\d+\) BroadcastHashJoin""".r.findAllIn(p).size
      assert(broadcasts == 1,
        s"expected exactly the customer-dim broadcast, got $broadcasts:\n$p")
      assert("SortMergeJoin".r.findFirstIn(p).isDefined,
        s"orders⋈lineitem should shuffle when auto-broadcast is off:\n$p")
    } finally spark.conf.set(key, prev)
  }

  test("q5_star broadcasts every dimension") {
    val p = planOf("q5_star")
    val broadcasts = "BroadcastHashJoin".r.findAllIn(p).size
    assert(broadcasts >= 3, s"expected all 3 dims broadcast, got $broadcasts:\n$p")
  }

  test("decontaminate broadcasts the benchmark gram set") {
    val p = planOf("decontaminate")
    assert("BroadcastHashJoin LeftSemi".r.findFirstIn(p).isDefined,
      s"bench gram semi join not broadcast:\n$p")
  }

  test("q4_priority runs the EXISTS as a LEFT SEMI join with both filters pushed") {
    val p = planOf("q4_priority")
    assert("LeftSemi".r.findFirstIn(p).isDefined,
      s"EXISTS did not plan as a semi join:\n$p")
    // the returned-flag filter must reach the lineitem scan, the date
    // range the orders scan — neither side scans its full table
    assert(p.contains("EqualTo(l_returnflag,R)"),
      s"l_returnflag filter not pushed:\n$p")
    assert(p.contains("GreaterThanOrEqual(o_orderdate"),
      s"o_orderdate range not pushed:\n$p")
  }

  test("q19_brand pushes per-side disjunct envelopes to both scans") {
    val p = planOf("q19_brand")
    // the OR of each side's own conjuncts must reach the scans: part
    // reads only the three brands' size envelope, lineitem only the
    // qty envelope — NOT a full-table scan feeding a post-join filter
    assert("""Or\(.*p_brand""".r.findFirstIn(p).isDefined ||
      p.contains("Or(EqualTo(p_brand"),
      s"part-side disjunction not pushed:\n$p")
    assert("""Or\(.*l_quantity""".r.findFirstIn(p).isDefined ||
      p.contains("Or(And(GreaterThanOrEqual(l_quantity"),
      s"lineitem qty envelope not pushed:\n$p")
    assert("BroadcastHashJoin".r.findFirstIn(p).isDefined,
      s"filtered part dim should broadcast:\n$p")
  }

  test("q10_returns joins customer AFTER the per-customer aggregation") {
    // the c_custkey join must consume the aggregated revenue frame
    // (≤1 row per customer), never the raw return lineitems — join
    // order is the difference between a dim-sized and fact-sized
    // shuffle of customer rows. Assert STRUCTURALLY: every physical
    // join keyed on c_custkey must have a HashAggregate somewhere in
    // one of its subtrees (the revenue agg feeding the join).
    import org.apache.spark.sql.execution.SparkPlan
    import org.apache.spark.sql.execution.aggregate.HashAggregateExec
    import org.apache.spark.sql.execution.joins.BaseJoinExec
    val df = SparkEntry.queries("q10_returns")(spark, dir)
    // the pre-AQE physical plan: no adaptive wrappers/query stages to
    // hide subtrees from the traversal
    val plan = df.queryExecution.sparkPlan
    def subtree(p: SparkPlan): Seq[SparkPlan] = p +: p.children.flatMap(subtree)
    val custJoins = subtree(plan).collect {
      case j: BaseJoinExec
        if (j.leftKeys ++ j.rightKeys).exists(
          _.references.exists(_.name == "c_custkey")) => j
    }
    assert(custJoins.nonEmpty, s"no c_custkey join found:\n$plan")
    custJoins.foreach { j =>
      val hasAgg = j.children.exists(c => subtree(c).exists(_.isInstanceOf[HashAggregateExec]))
      assert(hasAgg,
        s"customer join consumes raw lineitems (no aggregate below it):\n$j")
    }
    val p = planOf("q10_returns")
    assert(p.contains("EqualTo(l_returnflag,R)"),
      s"returnflag filter not pushed to lineitem scan:\n$p")
  }

  test("q22_prospects plans the no-recent-orders test as an anti join on filtered orders") {
    val p = planOf("q22_prospects")
    assert("LeftAnti".r.findFirstIn(p).isDefined,
      s"NOT EXISTS did not plan as an anti join:\n$p")
    assert(p.contains("GreaterThanOrEqual(o_orderdate"),
      s"lapsed-window filter not pushed to the orders scan:\n$p")
  }

  test("q8_market_share shuffles the fact-fact join and the region semi join (no fact broadcast)") {
    // only the three true dims (region-filtered nation set, supplier⋈
    // nation, customer-key membership build) may ride explicit hints;
    // lineitem⋈orders and the o_custkey region test must shuffle when
    // auto-broadcast is off — a hint on either is the q3-class OOM.
    val key = "spark.sql.autoBroadcastJoinThreshold"
    val prev = spark.conf.get(key)
    try {
      spark.conf.set(key, "-1")
      val p = planOf("q8_market_share")
      // tree section prints "SortMergeJoin <type> (N)"; the numbered
      // detail section drops the join type — match the tree form.
      assert("SortMergeJoin LeftSemi".r.findFirstIn(p).isDefined,
        s"region membership should be a shuffle semi join (customer is a fact):\n$p")
      assert("SortMergeJoin Inner".r.findFirstIn(p).isDefined,
        s"lineitem⋈orders should shuffle:\n$p")
    } finally spark.conf.set(key, prev)
  }

  test("q9_profit pushes the part name pattern into the scan") {
    val p = planOf("q9_profit")
    assert(p.contains("StringContains(p_name,gear)"),
      s"name pattern not pushed:\n$p")
  }

  test("q11_important_parts scans lineitem ONCE (scalar total rides the checkpointed aggregate)") {
    // value feeds both the output rows and the 1-row total; Catalyst
    // does NOT reuse the exchange across the broadcast boundary, so
    // the operator checkpoints the ≤|part|-row aggregate — both
    // consumers must scan the materialized RDD, zero lineitem scans
    // in the final query.
    val p = planOf("q11_important_parts")
    assert("Scan ExistingRDD".r.findAllIn(p).size >= 2,
      s"total branch re-derives the per-part aggregate:\n$p")
    assert(!p.contains("lineitem.parquet"),
      s"final query still scans the fact table:\n$p")
  }

  test("q_rollup expands grouping sets over ONE fact scan (no per-level union)") {
    // rollup must plan as Expand → partial agg → one exchange; a
    // self-union of three aggregates would show three lineitem scans.
    val p = planOf("q_rollup")
    assert("""\(\d+\) Expand""".r.findFirstIn(p).isDefined,
      s"no Expand node — rollup lost its grouping-sets plan:\n$p")
    assert("""\(\d+\) Scan parquet""".r.findAllIn(p).size == 1,
      s"rollup scans the fact table more than once:\n$p")
  }

  test("q12_shipmode prunes both fact scans to the needed columns") {
    val p = planOf("q12_shipmode")
    val reads = "ReadSchema: struct<([^>]*)>".r.findAllMatchIn(p).map(_.group(1)).toSeq
    assert(reads.exists(s => s.contains("l_linestatus") && s.split(",").length == 3),
      s"lineitem scan not pruned to 3 columns: $reads")
    assert(reads.exists(s => s.contains("o_orderpriority") && s.split(",").length == 3),
      s"orders scan not pruned to 3 columns: $reads")
  }

  test("q13_order_dist outer-joins customer against the AGGREGATED order counts") {
    // same structural contract as q10: the c_custkey join must consume
    // a HashAggregate subtree (one row per customer), never raw orders.
    import org.apache.spark.sql.execution.SparkPlan
    import org.apache.spark.sql.execution.aggregate.HashAggregateExec
    import org.apache.spark.sql.execution.joins.BaseJoinExec
    val df = SparkEntry.queries("q13_order_dist")(spark, dir)
    val plan = df.queryExecution.sparkPlan
    def subtree(p: SparkPlan): Seq[SparkPlan] = p +: p.children.flatMap(subtree)
    val joins = subtree(plan).collect { case j: BaseJoinExec => j }
    assert(joins.nonEmpty, s"no join found:\n$plan")
    joins.foreach { j =>
      val hasAgg = j.children.exists(c =>
        subtree(c).exists(_.isInstanceOf[HashAggregateExec]))
      assert(hasAgg,
        s"customer outer join consumes raw orders (no aggregate below it):\n$j")
    }
  }

  test("q15_top_supplier computes the max over the checkpointed revenue aggregate") {
    // same contract as q11: one fact scan at checkpoint time, the
    // scalar max and the output rows both ride the materialized RDD.
    val p = planOf("q15_top_supplier")
    assert("Scan ExistingRDD".r.findAllIn(p).size >= 2,
      s"max-revenue scalar re-derives the per-supplier aggregate:\n$p")
    assert(!p.contains("lineitem.parquet"),
      s"final query still scans the fact table:\n$p")
  }

  test("q16_supplier_cnt broadcasts the 6-key supplier exclusion as an anti join") {
    val p = planOf("q16_supplier_cnt")
    assert("BroadcastHashJoin LeftAnti".r.findFirstIn(p).isDefined,
      s"negative-balance exclusion not a broadcast anti join:\n$p")
    assert("""In\(p_size""".r.findFirstIn(p).isDefined,
      s"size list not pushed to the part scan:\n$p")
  }

  test("q17_small_qty pre-filters lineitem through a broadcast semi join on the brand's parts") {
    val p = planOf("q17_small_qty")
    assert("BroadcastHashJoin LeftSemi".r.findFirstIn(p).isDefined,
      s"brand partkey filter not a broadcast semi join:\n$p")
    assert(p.contains("EqualTo(p_brand,Brand#23)"),
      s"brand filter not pushed to the part scan:\n$p")
  }

  test("q21_waiting plans EXISTS/NOT EXISTS as semi + anti joins") {
    val p = planOf("q21_waiting")
    assert("""LeftSemi""".r.findAllIn(p).size >= 2,
      s"nation/order membership + other-supplier EXISTS should be semi joins:\n$p")
    assert("LeftAnti".r.findFirstIn(p).isDefined,
      s"no-other-returner NOT EXISTS should be an anti join:\n$p")
    assert(p.contains("EqualTo(l_returnflag,R)"),
      s"returnflag filter not pushed:\n$p")
  }

  test("customer_rfm scans orders once: histograms and scoring read the checkpoint") {
    // the per-customer metric frame is checkpointed, so the three
    // quartile histograms and the final scoring pass must consume RDD
    // scans of it — a parquet scan in this plan means orders is being
    // re-read per histogram (4 fact scans at 100 TB)
    val p = planOf("customer_rfm")
    assert(!p.contains("Scan parquet"),
      s"orders re-scanned instead of reading the checkpointed metrics:\n$p")
    assert("BroadcastNestedLoopJoin|BroadcastExchange".r.findFirstIn(p).isDefined,
      s"the 1-row cuts frame should broadcast:\n$p")
  }

  test("q_pareto aggregates orders in a single scan") {
    val p = planOf("q_pareto")
    assert("""\(\d+\) Scan parquet""".r.findAllIn(p).size == 1,
      s"the Pareto histogram must come from ONE orders scan:\n$p")
  }

  test("q_yoy self-join reads the checkpointed month aggregate, not orders twice") {
    val p = planOf("q_yoy")
    assert(!p.contains("Scan parquet") &&
      "Scan ExistingRDD".r.findAllIn(p).size >= 2,
      s"YoY join must consume the month aggregate twice, never re-scan orders:\n$p")
  }

  test("graph_neighbor_sim never re-expands hub pairs past the cap (plan sanity)") {
    // the capped edge set must be the input to BOTH the sizes agg and
    // the pair self-join — i.e. the in-degree cap happens before the
    // quadratic stage, not after. The localCheckpoint materializes the
    // capped frame; the pair join must consume an RDD scan of it, not
    // a fresh lineitem scan.
    val df = SparkEntry.queries("graph_neighbor_sim")(spark, dir)
    val p = df.queryExecution.explainString(
      org.apache.spark.sql.execution.FormattedMode)
    assert("Scan ExistingRDD".r.findAllIn(p).size >= 2,
      s"pair join re-derives the capped edges instead of reusing them:\n$p")
  }

  test("shard_plan scans documents once: the total rides the checkpointed shard aggregate") {
    val p = planOf("shard_plan")
    assert("""\(\d+\) Scan parquet""".r.findAllIn(p).size <= 1 &&
      "Scan ExistingRDD".r.findAllIn(p).size >= 2,
      s"share denominator re-scans the corpus instead of the 64-row aggregate:\n$p")
  }

  test("source_profile scans documents once (the (source, lang) frame serves everything)") {
    val p = planOf("source_profile")
    assert(!p.contains("Scan parquet") &&
      "Scan ExistingRDD".r.findAllIn(p).size >= 2,
      s"profile re-scans the corpus instead of the checkpointed (source, lang) agg:\n$p")
  }

  test("events_heavy verifies candidates through a broadcast semi join") {
    val p = planOf("events_heavy")
    assert("BroadcastHashJoin.*LeftSemi".r.findFirstIn(p).isDefined ||
      "BroadcastHashJoin LeftSemi".r.findFirstIn(p).isDefined,
      s"candidate filter must be a broadcast semi join, never a shuffle:\n$p")
  }

  test("events_hll_overlap builds registers in ONE corpus pass (spine from the aggregate)") {
    val p = planOf("events_hll_overlap")
    assert("""\(\d+\) Scan parquet""".r.findAllIn(p).size <= 1,
      s"register algebra must not re-scan events:\n$p")
  }

  test("sim_range broadcasts the query side over one corpus pass") {
    val p = planOf("sim_range")
    assert(p.contains("BroadcastNestedLoopJoin") || p.contains("BroadcastHashJoin"),
      s"queries must broadcast against the corpus scan:\n$p")
    assert("""\(\d+\) Scan parquet""".r.findAllIn(p).size <= 2,
      s"radius search must not multi-scan the embeddings:\n$p")
  }

  test("table_checksum folds in a single scan with no shuffle beyond the 1-row agg") {
    val p = planOf("table_checksum")
    assert("""\(\d+\) Scan parquet""".r.findAllIn(p).size == 1,
      s"checksum must be one pass:\n$p")
    assert(!p.contains("SortMergeJoin") && !p.contains("BroadcastHashJoin"),
      s"checksum plans no joins:\n$p")
  }

  test("events_benford and events_calendar are one-scan map-combinable aggs") {
    for (q <- Seq("events_benford", "events_calendar")) {
      val p = planOf(q)
      assert("""\(\d+\) Scan parquet""".r.findAllIn(p).size <= 1,
        s"$q must scan events once (share total rides the checkpointed histogram):\n$p")
    }
  }
  test("dedup_head is a single-scan map-side aggregate (no joins)") {
    val plan = planOf("dedup_head")
    assert(!plan.contains("Join"), s"dedup_head grew a join:\n$plan")
    assert(plan.contains("HashAggregate") || plan.contains("SortAggregate"),
      s"dedup_head lost its aggregate:\n$plan")
  }

  test("split_assign's only join is the 1-row totals broadcast") {
    // D94 scale contract: one corpus scan into a combinable agg; the
    // share denominator rides a broadcast 1-row cross join, never a
    // shuffled join
    val plan = planOf("split_assign")
    assert(!plan.contains("SortMergeJoin") && !plan.contains("ShuffledHashJoin"),
      s"split_assign shuffles a join:\n$plan")
    assert("BroadcastNestedLoopJoin Cross".r.findAllIn(plan).size == 1,
      s"expected exactly the totals cross broadcast:\n$plan")
  }

  test("events_lag_features pays ONE user_id exchange: all window frames share it") {
    // E65 scale contract: lag1/lag2 and the trailing-3 frame are over
    // the same (user_id | ms, event_id) partitioning, so exactly one
    // hash exchange on user_id may appear
    val plan = planOf("events_lag_features")
    val n = "hashpartitioning\\(user_id".r.findAllIn(plan).size
    assert(n == 1, s"expected 1 user_id hash exchange, got $n:\n$plan")
  }

}
