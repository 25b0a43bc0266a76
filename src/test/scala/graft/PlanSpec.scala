package graft

import org.apache.spark.sql.DataFrame
import org.scalatest.funsuite.AnyFunSuite

/** Physical-plan assertions: the scale properties the operators are
  * designed around (pushdown, pruning, broadcast, top-k) must survive
  * refactors. Checked against the driver's smallest dataset. */
class PlanSpec extends AnyFunSuite {
  private lazy val spark = SparkTestBase.spark
  private val dir = "/root/testdata/sf0.001"

  private def planOf(q: String): String = {
    val df: DataFrame = SparkEntry.queries(q)(spark, dir)
    df.queryExecution.explainString(org.apache.spark.sql.execution.FormattedMode)
  }

  test("q01: filter pushed to parquet scan, columns pruned") {
    val plan = planOf("q01_agg")
    assert(plan.contains("PushedFilters"), "no pushed filters")
    assert(plan.contains("LessThanOrEqual(l_shipdate"), "shipdate filter not pushed")
    // pruned scan: partkey/suppkey/linenumber are not read
    assert(!plan.contains("l_partkey"), "scan reads unused column l_partkey")
  }

  test("q15: broadcast hash join for the small supplier side") {
    val plan = planOf("q15_join_broadcast")
    assert(plan.contains("BroadcastHashJoin"), s"no BHJ in plan")
    assert(plan.contains("BroadcastExchange"))
  }

  test("q21: top-k plans as TakeOrderedAndProject (no global sort)") {
    val plan = planOf("q21_topk")
    assert(plan.contains("TakeOrderedAndProject"), "top-k is a full sort")
  }

  test("q34: bucket cap is partial-agg + join-back, never a window") {
    // Banding.capBuckets (round 8): a degenerate hot bucket must collapse
    // map-side under partial aggregation — a count-over-Window cap would
    // put the whole bucket into one task. Locks the skew-hardening.
    val plan = planOf("q34_dedup_minhash")
    assert(!plan.contains("Window"),
      "bucket cap must not plan as a window over the bucket key")
    assert("HashAggregate".r.findAllIn(plan).size >= 2,
      "expected partial+final aggregate for the bucket occupancy count")
  }

  test("q55: star joins broadcast the dimensions at small scale") {
    val plan = planOf("q55_tpch5")
    assert("BroadcastHashJoin".r.findAllIn(plan).size >= 3,
      "expected the dimension joins to broadcast")
  }

  test("q38: corpus scans once — queries side is broadcast") {
    val plan = planOf("q38_knn_brute")
    assert(plan.contains("BroadcastNestedLoopJoin") || plan.contains("BroadcastHashJoin"),
      "knn queries side is not broadcast")
    // the top-k rank filter must push a partial WindowGroupLimit below
    // the exchange (map-side cap: k rows per query per partition cross
    // the wire, not the full scored cross product)
    assert(plan.contains("WindowGroupLimit"),
      "rank-limit pushdown missing — scored pairs would shuffle uncapped")
  }

  test("q73: broadcast upsert never shuffles the base (anti join builds on delta)") {
    val plan = planOf("q73_upsert")
    assert(plan.contains("BroadcastHashJoin LeftAnti") ||
      (plan.contains("LeftAnti") && plan.contains("BroadcastExchange")),
      s"upsert's anti join is not broadcast:\n$plan")
    assert(!plan.contains("SortMergeJoin"), "upsert fell back to a shuffle join")
  }

  test("q69: bloom pruning filters the big side before the semi join") {
    val plan = planOf("q69_bloom_join")
    assert(plan.contains("LeftSemi"), "no semi join in bloom join plan")
    // the scrub join should broadcast the (distinct) small key side here
    assert(plan.contains("BroadcastExchange"), "semi-join small side not broadcast")
  }

  test("q37: portable LSH candidates are an equi-join on (band, bucket), never all-pairs") {
    val plan = planOf("q37_dedup_embedding")
    assert(plan.contains("portable_vec_simhash"), "portable signature kernel missing")
    assert(!plan.contains("CartesianProduct"), "LSH degenerated to a cartesian product")
    assert(!plan.contains("BroadcastNestedLoopJoin"), "LSH degenerated to a loop join")
  }

  test("q113: semantic dedup pairs only within codebook cells, never all-pairs") {
    val plan = planOf("q113_semantic_dedup")
    assert(plan.contains("portable_cluster"), "portable codebook kernel missing")
    assert(!plan.contains("CartesianProduct"), "pairing degenerated to a cartesian product")
    assert(!plan.contains("BroadcastNestedLoopJoin"), "pairing degenerated to a loop join")
  }

  test("q317: IVF candidate scan is cell-filtered — a hash join on the " +
      "probed cell key, never the all-pairs loop of pqKnn") {
    val plan = planOf("q317_ivf_recall")
    // the routing/encode kernels must appear (corpus side is one narrow
    // projection — no join, no shuffle before the cell equi-join)
    assert(plan.contains("codebook_probes"), "coarse routing kernel missing")
    assert(plan.contains("codebook_pq_codes"), "PQ encode kernel missing")
    // the candidate join is an EQUI-join keyed on the probed cell; the
    // brute-force half of the recall comparison is the only legitimate
    // loop join in this plan, and it does not carry the ADC kernel
    assert(plan.contains("BroadcastHashJoin"),
      "cell-keyed candidate join is not a broadcast hash join")
    assert(!plan.contains("CartesianProduct"),
      "IVF candidates degenerated to a cartesian product")
    // the ADC scorer must sit on the hash-join (cell-filtered) side:
    // no pq_adc_score may appear in any BroadcastNestedLoopJoin subtree
    val adcIdx = plan.indexOf("pq_adc_score")
    assert(adcIdx >= 0, "ADC scoring kernel missing")
    // formatted explain lists operators top-down; the scored subtree is
    // the section between the candidate BHJ and the shortlist window —
    // assert the scored path has a WindowGroupLimit cap like q38
    assert(plan.contains("WindowGroupLimit"),
      "shortlist rank-limit pushdown missing — probed candidates would " +
        "shuffle uncapped")
  }

  test("q114: DSIR scoring joins the broadcast prob tables, never a cartesian") {
    val plan = planOf("q114_dsir")
    assert(plan.contains("BroadcastHashJoin"),
      "bucket log-prob tables should broadcast into the gram scorer")
    assert(!plan.contains("CartesianProduct"), "scoring degenerated to a cartesian product")
  }

  test("q118: BM25 broadcasts the query terms into the postings, never a cartesian") {
    val plan = planOf("q118_bm25")
    assert(plan.contains("BroadcastHashJoin"),
      "query-term match should be a broadcast hash join on term")
    assert(!plan.contains("CartesianProduct"), "scoring degenerated to a cartesian product")
  }

  test("q76: small-vocab corpus takes the dense banded path (hash join, no n² loop join)") {
    val plan = planOf("q76_tfidf")
    assert(plan.contains("double_vec_dot"), "dense path's native dot kernel missing")
    assert(plan.contains("BroadcastHashJoin"),
      "dense pair scoring should be a broadcast HASH join on the band-prune bucket")
    assert(!plan.contains("BroadcastNestedLoopJoin"),
      "dense pair scoring degenerated back to the n² loop join")
    assert(!plan.contains("SortMergeJoin"), "unexpected shuffle join in dense path")
  }

  test("q102: span dedup shuffles gram hashes, rebuilds with the native merge walk") {
    val plan = planOf("q102_span_dedup")
    assert(plan.contains("word_shingle_hashes"), "native positional gram hasher missing")
    assert(plan.contains("keep_tokens_except"), "native merge-walk token filter missing")
    assert(!plan.contains("CartesianProduct") && !plan.contains("BroadcastNestedLoopJoin"),
      "span dedup must stay equi-joins (gram hash, then id)")
  }

  test("q107/q108/q109: the new TPC-H shapes broadcast dimensions and plan top-k") {
    val p14 = planOf("q107_tpch14")
    assert(p14.contains("BroadcastHashJoin"), "part dimension not broadcast in Q14")
    assert(p14.contains("GreaterThanOrEqual(l_shipdate") ||
      p14.contains("IsNotNull(l_shipdate"),
      "ship-month filter not pushed into the Q14 lineitem scan")
    val p18 = planOf("q108_tpch18")
    assert(p18.contains("TakeOrderedAndProject"), "Q18 top-100 is a full sort")
    val p7 = planOf("q109_tpch7")
    assert("BroadcastHashJoin".r.findAllIn(p7).size >= 2,
      "Q7's nation/customer/supplier dimensions should broadcast")
    assert(!p7.contains("CartesianProduct"))
  }

  test("q171/q172/q173: the deep TPC-H shapes stay broadcast + decorrelated") {
    val p9 = planOf("q171_tpch9")
    assert("BroadcastHashJoin".r.findAllIn(p9).size >= 2,
      "Q9's part/supplier/nation dimensions should broadcast")
    assert(!p9.contains("CartesianProduct"))
    assert(p9.contains("StringContains(p_name") || p9.contains("IsNotNull(p_partkey"),
      "part-name filter not pushed toward the part scan")
    val p22 = planOf("q172_tpch22")
    // the 1-row threshold frame joins without shuffling the customer side
    assert(p22.contains("BroadcastNestedLoopJoin") || p22.contains("BroadcastHashJoin"),
      "scalar threshold should broadcast, never shuffle customers")
    assert(p22.contains("LeftAnti"), "NOT EXISTS must plan as a left-anti join")
    val p21 = planOf("q173_tpch21")
    assert(p21.contains("LeftSemi"), "EXISTS must plan as a left-semi join")
    assert(!p21.contains("CartesianProduct") && !p21.contains("BroadcastNestedLoopJoin"),
      "the decorrelated Q21 must stay on equi-joins — no per-row correlated probe")
    assert(p21.contains("TakeOrderedAndProject"), "Q21 top-10 is a full sort")
  }

  test("q174-q178: the round-8 TPC-H shapes — broadcast stars, pushed disjunction") {
    val p8 = planOf("q174_tpch8")
    assert("BroadcastHashJoin".r.findAllIn(p8).size >= 4,
      "Q8's dimension fan (part, supplier, nation, customer-region semi) should broadcast")
    assert(p8.contains("LeftSemi"),
      "the ASIA-customer membership must plan as a semi join, not a row-multiplying inner")
    assert(!p8.contains("CartesianProduct"))
    assert(p8.contains("EqualTo(p_type,PROMO"), "part-type filter not pushed to the scan")
    val p13 = planOf("q175_tpch13")
    assert(p13.contains("LeftOuter") || p13.contains("BroadcastHashJoin"),
      "Q13's customer⟕orders join missing")
    assert(!p13.contains("CartesianProduct") && !p13.contains("BroadcastNestedLoopJoin"),
      "the join-condition priority predicate must not degrade the join to a BNLJ")
    val p15 = planOf("q176_tpch15")
    assert(p15.contains("BroadcastNestedLoopJoin") || p15.contains("BroadcastHashJoin"),
      "the scalar max must broadcast back, never shuffle the revenue view")
    val p17 = planOf("q177_tpch17")
    assert(p17.contains("LeftSemi"), "the brand prune should semi-join before aggregating")
    assert(!p17.contains("CartesianProduct"),
      "the decorrelated per-part threshold must stay an equi-join")
    val p19 = planOf("q178_tpch19")
    assert(p19.contains("Or(Or(And(GreaterThanOrEqual(l_quantity"),
      "Q19's quantity-envelope disjunction must push to the lineitem scan")
    assert(p19.contains("EqualTo(p_brand,Brand#12"),
      "Q19's brand/size disjunction must push to the part scan")
    assert(p19.contains("BroadcastHashJoin"), "part side should broadcast")
  }

  test("q179: MMR scores against a broadcast query set with a map-side shortlist cap") {
    val plan = planOf("q179_mmr_select")
    assert(plan.contains("BroadcastExchange"), "queries must broadcast — never shuffle the corpus")
    assert(plan.contains("WindowGroupLimit"),
      "the shortlist cap must push map-side (partial WindowGroupLimit) so only capped rows shuffle")
    assert(plan.contains("MapGroups"), "the greedy runs per query group over the bounded shortlist")
    assert(!plan.contains("CartesianProduct"))
  }

  test("q103: packing is one group shuffle plus the native sequential pass") {
    val plan = planOf("q103_pack")
    assert(plan.contains("pack_bins_next_fit"), "native next-fit kernel missing")
    assert(!plan.contains("Window"),
      "packing must not use a window — the sequential scan lives in the kernel")
    assert(!plan.contains("CartesianProduct") && !plan.contains("BroadcastNestedLoopJoin"))
  }

  test("q104: chunking is a pure per-row explode — no shuffle below the gate sort") {
    val plan = planOf("q104_chunk")
    // the only exchange allowed is the gate's own ORDER BY range exchange
    val exchanges = "Exchange".r.findAllIn(plan).size
    assert(exchanges <= 2, s"chunking should not shuffle (found $exchanges exchanges):\n$plan")
    assert(!plan.contains("SortMergeJoin") && !plan.contains("BroadcastHashJoin"),
      "chunking must not join")
  }

  test("q76: large-vocab/sparse path remains a term equi-join with no cross join") {
    // force the sparse strategy the way a realistic vocabulary would
    val docs = spark.read.parquet(s"$dir/documents.parquet")
    val sparse = graft.operators.TfIdf.similarPairs(
      docs, "text", "doc_id", threshold = 0.95, denseMaxVocab = 0).get
    val plan = sparse.queryExecution.explainString(
      org.apache.spark.sql.execution.FormattedMode)
    assert(!plan.contains("CartesianProduct") && !plan.contains("BroadcastNestedLoopJoin"),
      "sparse path must stay an equi-join on term")
  }

  test("q143: frequent n-grams partial-aggregate map-side and plan top-k") {
    val plan = planOf("q143_frequent_ngrams")
    assert(plan.contains("TakeOrderedAndProject"), "top-k is a full sort")
    assert(plan.contains("partial_count"),
      "no map-side partial aggregation before the n-gram shuffle")
    assert(!plan.contains("CartesianProduct"))
  }

  test("q144: group centroids are ONE partial aggregate — corpus vectors never posexplode") {
    val plan = planOf("q144_group_centroids")
    // Summarizer.mean is a TypedImperativeAggregate: partial per-partition
    // fold, one shuffle of (key, dim-sized state)
    assert(plan.contains("ObjectHashAggregate"), "mean did not plan as an object agg")
    assert(plan.toLowerCase.contains("partial"), "no partial aggregation")
    // the posexplode in the gate flattening sits ABOVE the agg (it explodes
    // #groups x dim rows), never below it (corpus x dim). Formatted-mode
    // operator ids grow from the leaves toward the root, so Generate's id
    // must exceed every ObjectHashAggregate id.
    val ids = (name: String) =>
      (name + """ \((\d+)\)""").r.findAllMatchIn(plan).map(_.group(1).toInt).toSeq
    val gen = ids("Generate")
    val agg = ids("ObjectHashAggregate")
    assert(gen.nonEmpty && agg.nonEmpty)
    assert(gen.min > agg.max,
      s"posexplode (ids $gen) must sit above the mean aggregate (ids $agg)")
  }

  test("q142: blocklist filter never shuffles the corpus text with the match machinery") {
    val plan = planOf("q142_domain_blocklist")
    assert(!plan.contains("CartesianProduct"))
    assert(plan.contains("BroadcastHashJoin"),
      "blocklist semi/anti joins should broadcast at this scale")
  }

  test("q238: link prediction pairs via wedge equi-joins, never all-pairs") {
    val plan = planOf("q238_link_predict")
    assert(!plan.contains("CartesianProduct"), "all-pairs join in link predict")
    assert(!plan.contains("BroadcastNestedLoopJoin"),
      "non-equi join in link predict")
  }

  test("q234: louvain label passes are equi-joins + partitioned windows") {
    // louvainMove materializes per-pass checkpoints at construction, so
    // this also exercises the 4-pass pipeline end to end
    val plan = planOf("q234_louvain_bipartite")
    assert(!plan.contains("CartesianProduct"))
    assert(!plan.contains("ntile"), "louvain must not plan an ntile window")
  }

  test("q241: holt is one key exchange + the sequential scan — no windows") {
    val plan = planOf("q241_holt")
    assert(!plan.contains("CartesianProduct"))
    // the smoothing itself is mapPartitions over one hash exchange; no
    // window machinery should appear below the gate's output sort
    assert(plan.contains("hashpartitioning(event_type"),
      "holt lost its key repartition")
  }

  test("q249: levene medians window BY GROUP, never a single partition") {
    // the per-group value-grid windows must stay partitioned on the
    // group key — a global-sort median would serialize the whole input
    val plan = planOf("q249_levene")
    assert(plan.contains("hashpartitioning(__g"),
      "levene lost its per-group grid partitioning")
    // the 1-row final reduction may exchange to a single partition; a
    // WINDOW without the group key in its spec may not
    assert(!"windowspecdefinition\\(__v".r.findFirstIn(plan).isDefined,
      "levene plans an unpartitioned (row-level global) window")
  }

  test("q253: credits ride ONE entity exchange; no joins below the agg") {
    val plan = planOf("q253_attribution_credits")
    assert(!plan.contains("CartesianProduct"))
    // all four window passes share the user-key exchange; the only
    // hash exchanges are the entity key and the final channel agg
    // (formatted mode puts the partitioning in an Arguments: line —
    // the old "Exchange hashpartitioning" pattern matched nothing)
    val exchanges = "Arguments: hashpartitioning".r
      .findAllIn(plan).length
    assert(exchanges >= 1 && exchanges <= 3,
      s"credits should need 1..3 hash exchanges, found $exchanges")
  }

  test("q252: contamination joins on the gram key, never all-pairs") {
    val plan = planOf("q252_contamination")
    assert(!plan.contains("CartesianProduct"), "all-pairs in contamination")
    assert(!plan.contains("BroadcastNestedLoopJoin"),
      "non-equi join in contamination")
  }

  test("q261: linkage candidates come from a block equi-join, never all-pairs") {
    val plan = planOf("q261_record_linkage")
    assert(!plan.contains("CartesianProduct"), "all-pairs in linkage")
    assert(!plan.contains("BroadcastNestedLoopJoin"),
      "non-equi candidate join in linkage")
    // the JW kernel is a codegen'd expression, not a UDF
    assert(plan.contains("jaro_winkler"), "kernel missing from plan")
    assert(!plan.contains("BatchEvalPython") && !plan.contains("ScalaUDF"),
      "linkage scoring fell off codegen into a UDF")
  }

  test("q276: RAKE is per-document windows + equi-joins, never all-pairs") {
    val plan = planOf("q276_rake_keywords")
    assert(!plan.contains("CartesianProduct"), "all-pairs in rake")
    assert(!plan.contains("BroadcastNestedLoopJoin"),
      "non-equi join in rake")
  }

  test("q268: theil-sen pairs ride the key equi-join; windows partitioned") {
    val plan = planOf("q268_theil_sen")
    assert(!plan.contains("CartesianProduct"), "all-pairs in theil-sen")
    assert(!plan.contains("BroadcastNestedLoopJoin"),
      "non-equi pair join in theil-sen")
  }

  test("q246: quantile-drift bins are a branch-free projection + tiny agg") {
    // the bin assignment must stay an expression over the scan (the
    // edge list is folded into the plan), never a per-row join against
    // an edge table
    val plan = planOf("q246_quantile_drift")
    assert(!plan.contains("CartesianProduct"))
    assert(!plan.contains("BroadcastNestedLoopJoin"),
      "range-join bin assignment in quantile drift")
  }

  test("q282: kendall-tau quadratic is BROADCAST over the cell grid") {
    // the pair join is quadratic in distinct CELLS and must be a
    // broadcast nested loop (the grid fits by the maxCells contract),
    // never a cartesian shuffle of the cells
    val plan = planOf("q282_kendall_tau")
    assert(plan.contains("BroadcastNestedLoopJoin"),
      "kendall grid pair join lost its broadcast")
    assert(!plan.contains("CartesianProduct"),
      "kendall pairs via cartesian shuffle")
  }

  test("q283/q286: rank-sum grids window over values, one partition OK") {
    // the δ/HL grids are DISTINCT-VALUE frames — the single global
    // window over the grid is by design (grid ≪ rows); what must NOT
    // appear is any row-level window
    val plan = planOf("q283_cliffs_delta")
    assert(!plan.contains("CartesianProduct"))
    val planHl = planOf("q286_hodges_lehmann")
    assert(planHl.contains("BroadcastNestedLoopJoin"),
      "HL difference grid lost its broadcast cross")
  }

  test("q289: mann-kendall pairs ride the key equi-join; no all-pairs") {
    val plan = planOf("q289_mann_kendall")
    assert(!plan.contains("CartesianProduct"), "all-pairs in mann-kendall")
    assert(!plan.contains("BroadcastNestedLoopJoin"),
      "non-equi pair join in mann-kendall")
  }

  test("q290: readability is a pure projection — no shuffle at all") {
    val plan = planOf("q290_readability")
    assert(!plan.contains("Exchange hashpartitioning"),
      "readability should not shuffle")
    assert(!plan.contains("Join"), "readability should not join")
  }

  test("q292: DTW runs inside whole-stage codegen over a broadcast pair join") {
    val plan = planOf("q292_dtw_pairs")
    assert(plan.contains("BroadcastNestedLoopJoin"),
      "DTW pair join lost its broadcast")
    // the kernel is a native expression, not a UDF
    assert(!plan.toLowerCase.contains("batchevalpython") &&
      !plan.contains("ScalaUDF"), "DTW fell back to a UDF")
  }

  test("q293: textrank edges come from position equi-joins, never all-pairs") {
    val plan = planOf("q293_textrank")
    assert(!plan.contains("CartesianProduct"), "all-pairs in textrank")
    assert(!plan.contains("BroadcastNestedLoopJoin"),
      "non-equi token pair join in textrank")
  }

  test("planAudit: counters agree with the explain string on known plans") {
    import graft.physical.Optimise
    val clean = SparkEntry.queries("q01_agg")(spark, dir)
    val m = Optimise.planAudit(clean).get.collect()
      .map(r => r.getString(0) -> r.getLong(1)).toMap
    assert(m("cartesian_products") == 0 && m("bnl_joins") == 0)
    assert(m("parquet_scans") >= 1 && m("shuffle_exchanges") >= 1 &&
      m("hash_exchanges") >= 1)
    assert(m("scans_with_pushdown") >= 1,
      "q01's shipdate filter must reach the scan")
    // a quadratic grid plan audits its broadcast nested loop
    val grid = SparkEntry.queries("q282_kendall_tau")(spark, dir)
    val g = Optimise.planAudit(grid).get.collect()
      .map(r => r.getString(0) -> r.getLong(1)).toMap
    assert(g("bnl_joins") >= 1)
  }

  test("Cdc.chunks is SHUFFLE-FREE: zero exchanges, zero joins — the " +
      "whole kernel is a per-row projection + posexplode") {
    import spark.implicits._
    val df = Seq((1L, "a" * 200), (2L, "b" * 50)).toDF("doc_id", "text")
    val chunks = graft.operators.Cdc.chunks(df, "text", "doc_id").get
    val plan = chunks.queryExecution
      .explainString(org.apache.spark.sql.execution.FormattedMode)
    val exchanges = "Exchange".r.findAllIn(plan).size
    assert(exchanges == 0,
      s"CDC chunking must never shuffle (found $exchanges):\n$plan")
    assert(!plan.contains("SortMergeJoin") &&
      !plan.contains("BroadcastHashJoin") && !plan.contains("Window"),
      "CDC chunking must not join or window")
  }

  test("q349: the gate plan's only exchange is its own ORDER BY; " +
      "q348 waterfill sample joins the caps grid by broadcast") {
    val plan = planOf("q349_cdc_chunks")
    // FormattedMode prints each node in the tree AND a detail block,
    // so ONE exchange node = 2 textual hits (the q104 precedent)
    val exchanges = "Exchange".r.findAllIn(plan).size
    assert(exchanges <= 2,
      s"q349 should only range-exchange for the gate sort: $exchanges")
    val wf = planOf("q348_waterfill_sample")
    assert(wf.contains("BroadcastHashJoin"),
      "caps grid (key-count-sized) must broadcast, not shuffle the corpus")
  }

  test("q357: KMV bottom-k caps the distinct shuffle map-side " +
      "(WindowGroupLimit), never a global sort") {
    val plan = planOf("q357_kmv_distinct")
    assert(plan.contains("WindowGroupLimit"),
      "bottom-k must push a partial WindowGroupLimit below the shuffle")
    assert(!plan.contains("GlobalLimit") || !plan.contains("Sort ["),
      "bottom-k must never plan a global sort of hashes")
  }

  test("q360: kNN outlier self-join broadcasts one side and caps " +
      "ranks map-side") {
    val plan = planOf("q360_knn_outlier")
    assert(plan.contains("BroadcastNestedLoopJoin") ||
      plan.contains("BroadcastExchange"),
      "the contract-named brute self-join should broadcast a side")
    assert(plan.contains("WindowGroupLimit"),
      "rank-at-k must push a partial WindowGroupLimit")
  }

  test("q361: mSPRT is one window pass — a single key exchange, no joins") {
    val plan = planOf("q361_msprt")
    assert(!plan.contains("Join"), "mSPRT must not join")
    val exchanges = "Exchange".r.findAllIn(plan).size
    // one hash exchange for the key partition + the gate's range sort,
    // each printed twice in FormattedMode (q349 precedent)
    assert(exchanges <= 4,
      s"mSPRT should exchange once for keys + once for the gate sort: " +
        s"$exchanges\n$plan")
  }

  test("q368: the bootstrap is explode + ONE aggregation — no join of " +
      "the corpus") {
    val plan = planOf("q368_poisson_bootstrap")
    // the only joins are the 1-row CI picks onto the 1-row stats —
    // those plan as broadcast loop joins over SCALAR frames; what must
    // never appear is a shuffled join of the replicated corpus
    assert(!plan.contains("SortMergeJoin") &&
      !plan.contains("CartesianProduct") &&
      !plan.contains("ShuffledHashJoin"),
      "replicate counters must not shuffle-join the corpus")
    assert(plan.contains("Generate"),
      "the nBoot replicates must ride a map-side explode")
  }

  test("q382: MMD pairs via equi-joins on (bucket, rank) — never a " +
      "kernel matrix") {
    val plan = planOf("q382_mmd")
    assert(!plan.contains("CartesianProduct") &&
      !plan.contains("BroadcastNestedLoopJoin"),
      "linear MMD must never plan an all-pairs kernel matrix")
  }
}
