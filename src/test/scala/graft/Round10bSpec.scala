package graft

import graft.operators.{ClusterOps, Round10bOps}

/** Specs for the round-10 second widening: BFS distances, label
  * propagation, association rules, gini split search — each pinned
  * against a hand-computed closed form on planted inputs. */
class Round10bSpec extends SparkSuite {

  private def sym(pairs: Seq[(Long, Long)]) = {
    import spark.implicits._
    (pairs ++ pairs.map(p => (p._2, p._1))).toDF("a", "b")
  }

  test("graph_shortest_paths: planted chain gets exact hop counts, unseeded component absent") {
    // chain 13-1-2-3-4-5 (13 is the only % 13 == 0 seed) plus an
    // unseeded component 7-8; hop cap 4 leaves node 5 unreached
    val edges = sym(Seq((13L, 1L), (1L, 2L), (2L, 3L), (3L, 4L),
      (4L, 5L), (7L, 8L)))
    val got = Round10bOps.bfsPipeline(edges, maxHops = 4).collect()
      .map(r => (r.getLong(0), r.getInt(1))).toMap
    assert(got == Map(13L -> 0, 1L -> 1, 2L -> 2, 3L -> 3, 4L -> 4),
      s"got $got")
  }

  test("graph_weighted_paths: cheap two-hop path beats the expensive direct edge BFS would pick") {
    import spark.implicits._
    // 13→1 costs 10 direct, but 13→2→1 costs 3+3=6; hop-BFS reaches
    // 1 in one hop — min-plus must return 6, not 10
    val pairs = Seq((13L, 1L, 10L), (13L, 2L, 3L), (2L, 1L, 3L))
    val edges = (pairs ++ pairs.map(p => (p._2, p._1, p._3)))
      .toDF("a", "b", "w")
    val got = Round10bOps.weightedPathsPipeline(edges, rounds = 4)
      .collect().map(r => (r.getLong(0), r.getLong(1))).toMap
    assert(got == Map(13L -> 0L, 2L -> 3L, 1L -> 6L), s"got $got")
  }

  test("graph_clustering_coeff: triangle scores 1, the hub stitching it to a pendant scores below, pendant absent") {
    import spark.implicits._
    // triangle {1,2,3} + pendant edge 3-4: nodes 1,2 → deg 2, 1
    // triangle → 10⁶ ppm; node 3 → deg 3, 1 triangle → 2·10⁶/6 =
    // 333333; node 4 → deg 1, coefficient undefined → absent
    val pairs = Seq((1L, 2L), (1L, 3L), (2L, 3L), (3L, 4L))
      .toDF("id1", "id2")
    val got = Round10bOps.clusteringCoeffPipeline(pairs).collect()
      .map(r => (r.getLong(0), (r.getLong(1), r.getLong(2), r.getLong(3))))
      .toMap
    assert(got == Map(
      1L -> ((2L, 1L, 1000000L)),
      2L -> ((2L, 1L, 1000000L)),
      3L -> ((3L, 1L, 333333L))), s"got $got")
  }

  test("graph_label_prop: bridged triangles split into two communities where CC merges them") {
    // two triangles {1,2,3} and {4,5,6} bridged by 3-4: ONE connected
    // component, but majority vote confines each triangle's label —
    // the community structure CC is blind to. 3 synchronous rounds
    // with (count desc, label asc) tie-breaks, hand-simulated.
    val pairs = Seq((1L, 2L), (1L, 3L), (2L, 3L),
      (4L, 5L), (4L, 6L), (5L, 6L), (3L, 4L))
    val got = Round10bOps.labelPropPipeline(sym(pairs), rounds = 3)
      .collect().map(r => (r.getLong(0), r.getLong(1))).toMap
    assert(got == Map(1L -> 1L, 2L -> 1L, 3L -> 1L,
      4L -> 3L, 5L -> 3L, 6L -> 3L), s"got $got")
    // the contrast: connected components sees a single cluster
    import spark.implicits._
    val cc = ClusterOps.connectedComponents(
      pairs.toDF("id1", "id2")).collect()
    assert(cc.map(_.getLong(1)).distinct.length == 1)
  }

  test("q_assoc_rules: planted baskets give closed-form support/confidence/lift") {
    import spark.implicits._
    // baskets: o1{1,2} o2{1,2} o3{1,2,3} o4{1,3} o5{2,3} →
    // supp(1)=4 supp(2)=4 supp(3)=3, supp(1,2)=3 (the only pair ≥ 3),
    // N=5 → conf(1→2)=3/4, lift=5·3/(4·4)=0.9375 (symmetric)
    val baskets = Seq((1L, 1L), (1L, 2L), (2L, 1L), (2L, 2L),
      (3L, 1L), (3L, 2L), (3L, 3L), (4L, 1L), (4L, 3L),
      (5L, 2L), (5L, 3L)).toDF("o", "p")
    val got = Round10bOps.assocRulesPipeline(baskets, minSupp = 3)
      .collect()
      .map(r => (r.getLong(0), r.getLong(1), r.getLong(2),
        r.getDouble(3), r.getDouble(4))).toSet
    assert(got == Set((1L, 2L, 3L, 0.75, 0.9375),
      (2L, 1L, 3L, 0.75, 0.9375)), s"got $got")
  }

  test("q_gini_split: perfectly separating threshold scores 0, interior split matches closed form") {
    import spark.implicits._
    // q=1 → 4 negatives, q=2 → 4 positives, q=3 → 2 positives:
    // split ≤1 is pure both sides (gini 0); split ≤2 mixes the left
    // (4 pos, 4 neg → 0.5) against a pure right: (8·0.5 + 2·0)/10 = 0.4
    val labeled = (Seq.fill(4)((1L, 0L)) ++ Seq.fill(4)((2L, 1L)) ++
      Seq.fill(2)((3L, 1L))).toDF("q", "y")
    val got = Round10bOps.giniSplitPipeline(labeled).collect()
      .map(r => (r.getLong(0), r.getLong(1), r.getLong(2),
        r.getDouble(3))).toSet
    assert(got == Set((1L, 0L, 4L, 0.0), (2L, 4L, 8L, 0.4)), s"got $got")
  }

  test("text_phrase_search: planted docs get exact phrase frequencies, non-matches absent") {
    import spark.implicits._
    // d1 contains "a b" twice (non-overlapping), d2 once, d3 has both
    // tokens but never adjacent in order — bag-of-words would match it
    val docs = Seq((1L, "a b a b c"), (2L, "x a b"), (3L, "b a"))
      .toDF("doc_id", "text")
    val got = Round10bOps
      .phraseSearchPipeline(docs, Seq(("q", "a", "b"))).collect()
      .map(r => (r.getString(0), r.getLong(1), r.getLong(2), r.getLong(3)))
      .toSet
    assert(got == Set(("q", 1L, 1L, 2L), ("q", 2L, 2L, 1L)), s"got $got")
  }

  test("etl_fd_discovery: key and hierarchy FDs hold, segment->key does not") {
    val fds = Round10bOps.etlFdDiscovery(spark, sf).collect()
      .map(r => ((r.getString(0), r.getString(1)), r.getBoolean(4))).toMap
    assert(fds.size == 30)
    // the planted warehouse hierarchy: key determines all, nation
    // determines its name/region/region-name, region its name
    assert(fds(("c_custkey", "c_mktsegment")))
    assert(fds(("c_custkey", "r_name")))
    assert(fds(("c_nationkey", "n_name")))
    assert(fds(("c_nationkey", "r_name")))
    assert(fds(("n_regionkey", "r_name")))
    // a 5-value segment over thousands of customers cannot determine
    // the key; a region spans many nations
    assert(!fds(("c_mktsegment", "c_custkey")))
    assert(!fds(("r_name", "n_name")))
  }

  test("q_item_cf: planted baskets give the closed-form cosine, infrequent item pruned") {
    import spark.implicits._
    // supp(1)=3 supp(2)=2 supp(3)=1 (pruned at minSupp 2);
    // supp(1,2)=2 → cos = 2/√(3·2) = 0.816497
    val baskets = Seq((1L, 1L), (1L, 2L), (2L, 1L), (2L, 2L),
      (3L, 1L), (3L, 3L)).toDF("o", "p")
    val got = Round10bOps.itemCfPipeline(baskets, minSupp = 2, k = 5)
      .collect()
      .map(r => (r.getLong(0), r.getLong(1), r.getLong(2), r.getDouble(3)))
      .toSet
    assert(got == Set((1L, 1L, 2L, 0.816497), (2L, 1L, 1L, 0.816497)),
      s"got $got")
  }

  test("q_tree_depth2: root splits on quantity, left child separates perfectly, leaf child absent") {
    import spark.implicits._
    // q=1: two (dd=1, y=0) + two (dd=2, y=1); q=9: four (dd=1, y=1).
    // Root thr q≤1: (4·0.5 + 4·0)/8 = 0.25; left child separates on
    // dd≤1 (gini 0); right child has ONE dd value → leaf, no row.
    val rows = Seq((1L, 1L, 0L), (1L, 1L, 0L), (1L, 2L, 1L), (1L, 2L, 1L),
      (9L, 1L, 1L), (9L, 1L, 1L), (9L, 1L, 1L), (9L, 1L, 1L))
      .toDF("q", "dd", "y")
    val got = Round10bOps.treeDepth2Pipeline(rows).collect()
      .map(r => (r.getString(0), r.getString(1), r.getLong(2),
        r.getDouble(3))).toSet
    assert(got == Set(("root", "l_quantity", 1L, 0.25),
      ("left", "l_discount", 1L, 0.0)), s"got $got")
  }

  test("graph_hits: planted star matches an exact integer simulation, sinks get zero hub") {
    import spark.implicits._
    // 1 → {2, 3}, 4 → 2: node 1 is the stronger hub, 2 the stronger
    // authority; 2/3 have no out-edges (hub 0), 1/4 no in-edges (auth 0)
    val edges = Seq((1L, 2L), (1L, 3L), (4L, 2L))
    def simulate(rounds: Int): Map[Long, (Long, Long)] = {
      val nodes = (edges.map(_._1) ++ edges.map(_._2)).distinct
      var h = nodes.map(_ -> 1000000L).toMap
      var a = Map.empty[Long, Long]
      (1 to rounds).foreach { _ =>
        val ar = edges.groupBy(_._2)
          .map { case (d, es) => d -> es.map(e => h(e._1)).sum }
        val am = ar.values.max
        a = ar.map { case (k, v) => k -> v * 1000000L / am }
        val hr = edges.groupBy(_._1)
          .map { case (s, es) => s -> es.map(e => a(e._2)).sum }
        val hm = hr.values.max
        h = hr.map { case (k, v) => k -> v * 1000000L / hm }
      }
      nodes.map(n => n -> (h.getOrElse(n, 0L), a.getOrElse(n, 0L))).toMap
    }
    val got = Round10bOps.hitsPipeline(edges.toDF("src", "dst"), 4)
      .collect().map(r => (r.getLong(0), (r.getLong(1), r.getLong(2))))
      .toMap
    assert(got == simulate(4), s"got $got expected ${simulate(4)}")
    assert(got(1L)._1 == 1000000L && got(2L)._2 == 1000000L)
    assert(got(2L)._1 == 0L && got(1L)._2 == 0L)
  }

  test("mix_epoch_caps: capped source's excess redistributes, budget fully placed") {
    import spark.implicits._
    // A: 100 tokens, cap 200; B: 1000 tokens, cap 2000; equal weights,
    // budget 1100. Round 1 gives A min(200, 550)=200 (capped) and
    // B 550; round 2 places the 150 excess entirely on B → 900.
    val init = Seq(("A", 100L, 200L, 1L), ("B", 1000L, 2000L, 1L))
      .toDF("source", "avail", "cap", "w")
    val got = Round10bOps.waterFill(init, rounds = 4).collect()
      .map(r => (r.getString(0), (r.getLong(1), r.getLong(2),
        r.getLong(3), r.getLong(4)))).toMap
    assert(got == Map(
      "A" -> ((100L, 200L, 200L, 2000000L)),
      "B" -> ((1000L, 2000L, 900L, 900000L))), s"got $got")
    assert(got.values.map(_._3).sum == 1100L, "budget not fully placed")
  }

  test("q_seq_patterns: gapped pairs counted, adjacent-only miner would miss them") {
    import spark.implicits._
    // user 1: a b c a b — (b,a) occurs at gap 2; user 2: b a — gap 1.
    // (b,a) support must be 2 users even though it is adjacent only
    // for user 2; (a,a) needs gap 3 (invisible to B49 transitions).
    val ev = Seq((1L, 1L, 1L, "a"), (1L, 2L, 2L, "b"), (1L, 3L, 3L, "c"),
      (1L, 4L, 4L, "a"), (1L, 5L, 5L, "b"),
      (2L, 1L, 6L, "b"), (2L, 2L, 7L, "a"))
      .toDF("user_id", "ts", "event_id", "event_type")
    val got = Round10bOps.seqPatternsPipeline(ev).collect()
      .map(r => ((r.getString(0), r.getString(1)),
        (r.getLong(2), r.getLong(3)))).toMap
    assert(got(("b", "a")) == ((2L, 2L)), s"got $got")
    assert(got(("a", "a")) == ((1L, 1L)))
    assert(got(("a", "b")) == ((2L, 1L)))
    assert(got(("c", "b")) == ((1L, 1L)))
  }

  test("q_roc_auc: perfect ranker scores AUC 1, uninformative score scores 1/2") {
    import spark.implicits._
    val perfect = (Seq.fill(2)((2L, 1L)) ++ Seq.fill(3)((1L, 0L)))
      .toDF("s", "y")
    val gotP = Round10bOps.rocAucPipeline(perfect).collect()
      .map(r => (r.getLong(0), r.getLong(1), r.getLong(2), r.getLong(3),
        r.getLong(4), r.getLong(5))).toSet
    assert(gotP == Set((2L, 2L, 0L, 1000000L, 0L, 1000000L),
      (1L, 2L, 3L, 1000000L, 1000000L, 1000000L)), s"got $gotP")
    // one score bucket with mixed labels: the curve is the diagonal
    val flat = (Seq.fill(2)((1L, 1L)) ++ Seq.fill(2)((1L, 0L)))
      .toDF("s", "y")
    val gotF = Round10bOps.rocAucPipeline(flat).collect()
      .map(r => r.getLong(5)).toSet
    assert(gotF == Set(500000L), s"got $gotF")
    // single-class input: the greatest(…, 1) guard keeps the rates
    // defined (all 0) instead of nulling (Spark) / erroring (DuckDB) —
    // the round-10 advisor's engine-divergence class
    val onlyPos = Seq((2L, 1L), (1L, 1L)).toDF("s", "y")
    val gotO = Round10bOps.rocAucPipeline(onlyPos).collect()
    assert(gotO.forall(r => !r.anyNull), s"nulls in $gotO")
    assert(gotO.forall(r => r.getLong(4) == 0L && r.getLong(5) == 0L))
  }

  test("mix_epoch_caps: water-fill invariants hold across uneven weight/cap configurations") {
    import spark.implicits._
    // deterministic uneven scenario: weights 1..5, availability
    // spanning 3 orders of magnitude, caps at 2 epochs
    val init = (1 to 5).map { i =>
      (s"s$i", (math.pow(10, 1 + i % 3) * i).toLong,
        (math.pow(10, 1 + i % 3) * i).toLong * 2, i.toLong)
    }.toDF("source", "avail", "cap", "w")
    val b = (1 to 5).map(i => (math.pow(10, 1 + i % 3) * i).toLong).sum
    val rows = Round10bOps.waterFill(init, rounds = 4).collect()
      .map(r => (r.getString(0), r.getLong(1), r.getLong(2), r.getLong(3)))
    // invariants: alloc never exceeds cap; total never exceeds budget;
    // the shortfall is bounded by integer flooring (< |sources| per
    // round) unless every source is saturated
    rows.foreach { case (s, _, cap, alloc) =>
      assert(alloc <= cap, s"$s allocated past its epoch cap") }
    val total = rows.map(_._4).sum
    assert(total <= b, "over-allocated the budget")
    val allSaturated = rows.forall { case (_, _, cap, alloc) => alloc == cap }
    assert(allSaturated || b - total < 4L * rows.length,
      s"unplaced budget ${b - total} exceeds the flooring bound")
  }

  test("q_roc_auc: trapezoid AUC equals the brute-force pairwise Mann-Whitney count") {
    import spark.implicits._
    // deterministic mixed data with heavy ties: score = i % 7,
    // label = (i % 3 == 0). AUC·2PN must equal
    // 2·#(pos.score > neg.score) + #(pos.score == neg.score).
    val data = (1 to 60).map(i => ((i % 7).toLong, if (i % 3 == 0) 1L else 0L))
    val pos = data.filter(_._2 == 1L).map(_._1)
    val neg = data.filter(_._2 == 0L).map(_._1)
    val expectedNum = pos.map(p =>
      2L * neg.count(n => p > n) + neg.count(n => p == n)).sum
    val expectedAucPpm = expectedNum * 1000000L / (2L * pos.size * neg.size)
    val got = Round10bOps.rocAucPipeline(data.toDF("s", "y")).collect()
      .map(r => r.getLong(5)).distinct
    assert(got.toSeq == Seq(expectedAucPpm),
      s"got $got expected $expectedAucPpm")
  }

  test("phrase_standing: equals the rebuild-from-text C28, index side probes Exchange-free") {
    import org.apache.spark.sql.functions.col
    val standing = graft.operators.Round10bOps.phraseStanding(spark, sf)
      .collect()
      .map(r => (r.getString(0), r.getLong(1), r.getLong(2), r.getLong(3)))
      .toSet
    val rebuilt = graft.operators.Round10bOps.textPhraseSearch(spark, sf)
      .collect()
      .map(r => (r.getString(0), r.getLong(1), r.getLong(2), r.getLong(3)))
      .toSet
    assert(standing.nonEmpty)
    assert(standing == rebuilt, "standing positional index diverged from rebuild")

    val store = graft.operators.Round10bOps.phraseStore(spark, sf)
    assert(store.segments.size == 2, "expected 2 positional segments")

    // Exchange-free index side under forced SMJ: no Exchange directly
    // above a positional-segment bucketed scan in the probe plan
    val abt = "spark.sql.autoBroadcastJoinThreshold"
    val prior = spark.conf.getOption(abt)
    spark.conf.set(abt, "-1")
    try {
      import spark.implicits._
      val probe = store.probe(
        Seq("order", "fast").toDF("tok"),
        _.select(col("tok"), col("doc_id"), col("pos")))
      val plan = probe.queryExecution.executedPlan.toString
      val indexSideExchanges =
        "Exchange[^\\n]*\\n[^\\n]*graft_phrase_post".r.findAllMatchIn(plan).size
      assert(indexSideExchanges == 0, s"index side shuffled:\n$plan")
    } finally prior.fold(spark.conf.unset(abt))(spark.conf.set(abt, _))
  }
}
