package graft

import org.apache.spark.sql.functions._
import org.scalacheck.Gen

import graft.operators._

/** Second-batch round-9 invariants: idempotence of the URL
  * canonicalization kernel, the l-diversity bound, and the
  * prefix-filter theorem (recall 1.0 vs brute force) for D24. */
class Round9bSpec extends SparkSuite {

  test("etl_url_canonical: kernel is idempotent and the report conserves the corpus") {
    val rep = Round9bOps.etlUrlCanonical(spark, sf)
    // canonical URLs survive a second canonicalization unchanged —
    // the property that lets a frontier mix raw and canonical input
    val notFixed = rep
      .select(col("canon_url"),
        Round9bOps.canonicalizeUrl(col("canon_url")).as("twice"))
      .filter(col("canon_url") =!= col("twice"))
      .count()
    assert(notFixed == 0L, s"$notFixed canonical URLs not a fixpoint")
    // conservation: every doc lands in exactly one canonical bucket
    val (nRaw, nDocs) = (
      rep.agg(sum("n_raw")).collect()(0).getLong(0),
      Tables.documents(spark, sf).count())
    assert(nRaw == nDocs, s"report covers $nRaw raws for $nDocs docs")
    // variants collapse: fan-in is real (some page has >1 raw spelling)
    assert(rep.filter(col("n_variants") > 1).count() > 0,
      "derivation produced no actual URL variety")
    // domains are case-folded and port-stripped
    assert(rep.filter(col("domain").rlike("[A-Z]|:80$")).count() == 0)
  }

  test("etl_url_canonical: property — spellings differing only in case/port/order/tracking/fragment/slash canonicalize equal") {
    import spark.implicits._
    case class U(scheme: String, host: String, segs: List[String],
      params: List[String], utm1: List[String], utm2: List[String])
    val g: Gen[U] = for {
      scheme <- Gen.oneOf("http", "https")
      host <- Gen.oneOf("site.example.com", "a-b.example.org", "x.test")
      segs <- Gen.listOfN(2, Gen.oneOf("Page", "p", "Q7", "idx"))
        .map(_.take(2))
      n <- Gen.choose(0, 3)
      params <- Gen.pick(n, Seq("a=1", "b=2", "v=9", "zz=0")).map(_.toList)
      utm1 <- Gen.someOf(Seq("utm_source=x", "utm_campaign=y")).map(_.toList)
      utm2 <- Gen.someOf(Seq("utm_medium=z")).map(_.toList)
    } yield U(scheme, host, segs, params, utm1, utm2)
    def render(u: U, upcase: Boolean, port: Boolean, slash: Boolean,
        frag: Boolean, utm: List[String], order: Boolean): String = {
      val ps = (if (order) u.params.reverse else u.params) ++ utm
      (if (upcase) u.scheme.toUpperCase else u.scheme) + "://" +
        (if (upcase) u.host.toUpperCase else u.host) +
        // the SCHEME'S default port (the only one canonicalization may
        // strip): :80 under http, :443 under https — https://host:80
        // is a distinct origin and must NOT fold (advisor fix)
        (if (port) (if (u.scheme == "https") ":443" else ":80") else "") +
        u.segs.map("/" + _).mkString +
        (if (slash && u.segs.nonEmpty) "/" else "") +
        (if (ps.nonEmpty) "?" + ps.mkString("&") else "") +
        (if (frag) "#frag" else "")
    }
    val cases = Gen.listOfN(150, g).sample.getOrElse(Nil)
    assert(cases.size >= 100)
    val rows = cases.map { u =>
      (render(u, upcase = false, port = false, slash = false, frag = false,
        u.utm1, order = false),
        render(u, upcase = true, port = true, slash = true, frag = true,
          u.utm2, order = true))
    }
    val out = rows.toDF("u1", "u2").select(
      Round9bOps.canonicalizeUrl(col("u1")).as("c1"),
      Round9bOps.canonicalizeUrl(col("u2")).as("c2"),
      Round9bOps.canonicalizeUrl(Round9bOps.canonicalizeUrl(col("u1")))
        .as("cc1"),
      col("u1"))
      .collect()
    out.foreach { r =>
      assert(r.getString(0) == r.getString(1),
        s"${r.getString(3)}: ${r.getString(0)} != ${r.getString(1)}")
      assert(r.getString(0) == r.getString(2), s"not idempotent: $r")
    }
  }

  test("etl_url_canonical: non-default ports are distinct origins") {
    import spark.implicits._
    val rows = Seq("https://host.example:80/p", "http://host.example:443/p",
      "http://host.example:8080/p", "https://host.example:443/p",
      "http://host.example:80/p")
      .toDF("u")
      .select(col("u"), Round9bOps.canonicalizeUrl(col("u")).as("c"))
      .collect().map(r => r.getString(0) -> r.getString(1)).toMap
    // the scheme's OWN default port folds...
    assert(rows("https://host.example:443/p") == "https://host.example/p")
    assert(rows("http://host.example:80/p") == "http://host.example/p")
    // ...but a non-default port (even another scheme's default) survives
    assert(rows("https://host.example:80/p") == "https://host.example:80/p")
    assert(rows("http://host.example:443/p") == "http://host.example:443/p")
    assert(rows("http://host.example:8080/p") == "http://host.example:8080/p")
  }

  test("q_l_diversity: l bounded by class size and the sensitive domain") {
    val rows = Round9bOps.qLDiversity(spark, sf).collect()
    assert(rows.nonEmpty)
    rows.foreach { r =>
      val (size, l, ok) = (r.getAs[Long]("class_size"),
        r.getAs[Long]("l_distinct"), r.getAs[Long]("l_ok"))
      assert(l >= 1 && l <= size, s"l=$l outside [1, $size]")
      assert(l <= 5, s"l=$l exceeds the 5-value priority domain")
      assert(ok == (if (l >= 3) 1L else 0L))
    }
  }

  test("q_gini: closed forms — uniform values give exactly 0; one concentrated value gives (n-1)/n") {
    import spark.implicits._
    // uniform: 2*sum(r*x) = x*n*(n+1) = (n+1)*sum(x) -> numerator exactly 0
    val uniform = (1 to 100).map(i => ("u", 500L, i.toLong))
      .toDF("seg", "cents", "tie")
    val u = Round9bOps.giniPipeline(uniform).collect().head
    assert(u.getAs[Long]("gini_ppm") == 0L)
    // all mass on one order: G = (n-1)/n exactly; ppm floor of 99/100
    val spike = (1 to 99).map(i => ("s", 0L, i.toLong)) :+ (("s", 700L, 100L))
    val s = Round9bOps.giniPipeline(spike.toDF("seg", "cents", "tie"))
      .collect().head
    assert(s.getAs[Long]("gini_ppm") == 990000L, s.toString)
    // real data: all segments in [0, 1e6)
    Round9bOps.qGini(spark, sf).collect().foreach { r =>
      val g = r.getAs[Long]("gini_ppm")
      assert(g >= 0L && g < 1000000L, s"gini out of range: $r")
    }
  }

  test("streaming_url_frontier: emitted set equals the batch distinct canonical pages") {
    val got = graft.streaming.StreamingTwins.streamingUrlFrontier(spark, sf)
    val batch = Round9bOps.etlUrlCanonical(spark, sf)
      .select("canon_url", "domain")
    assert(got.exceptAll(batch).isEmpty, "streamed a non-existent page")
    assert(batch.exceptAll(got).isEmpty, "frontier missed a canonical page")
    // dedup is real: fewer emitted rows than raw docs
    assert(got.count() < Tables.documents(spark, sf).count())
  }

  test("q_bootstrap_ci: 32 replicates, ordered CI bracketing the sample mean, replicate sizes near n/2") {
    val r = Round9bOps.qBootstrapCi(spark, sf).collect().head
    val (n, mean, lo, hi) = (r.getAs[Long]("n"), r.getAs[Double]("mean"),
      r.getAs[Double]("ci_lo"), r.getAs[Double]("ci_hi"))
    assert(r.getAs[Long]("n_resamples") == 32L)
    assert(lo <= hi)
    // half-sample replicate means concentrate around the sample mean;
    // on this corpus the 94% interval brackets it (deterministic)
    assert(lo <= mean && mean <= hi, s"CI [$lo, $hi] misses mean $mean")
    assert(n > 0)
  }

  test("sample_coreset: top-64 by recomputed priority, Duffield weights, no duplicate draws") {
    val out = Round9bOps.sampleCoreset(spark, sf).collect()
    assert(out.length == 64)
    assert(out.map(_.getAs[Long]("vec_id")).distinct.length == 64)
    // independently recompute every vector's priority and check the
    // selected set IS the top-64 (deterministic draw, no RNG)
    import org.apache.spark.sql.functions.{broadcast => bc}
    val emb = Tables.embeddings(spark, sf)
    val cents = AnnOps.ivfCentroids(emb)
    val quant = transform(col("embedding"),
      x => floor(x.cast("double") * lit(1000000.0)).cast("long"))
    val pri = emb.crossJoin(bc(cents))
      .withColumn("dist2", graft.functions.gf.l2sq_long(
        quant, col("centroid_q")))
      .groupBy(col("vec_id"))
      .agg(min(col("dist2")).as("d2"))
      .withColumn("h", graft.functions.gf.h32(
        concat(lit("core:"), col("vec_id"))))
      .withColumn("p", (col("d2") + 1).cast("double")
        / ((col("h") + 1).cast("double") / lit(4294967296.0)))
      .collect().map(r => (r.getAs[Long]("vec_id"), r.getAs[Double]("p")))
    val top64 = pri.sortBy { case (id, p) => (-p, id) }.take(64)
      .map(_._1).toSet
    assert(out.map(_.getAs[Long]("vec_id")).toSet == top64)
    // Duffield estimator: est_weight = max(w, tau) >= w, and every
    // selected priority is >= tau (the 65th)
    val tau = pri.sortBy { case (id, p) => (-p, id) }.apply(64)._2
    out.foreach { r =>
      val w = r.getAs[Long]("d2") + 1.0
      assert(r.getAs[Double]("est_weight") == math.max(w, tau))
    }
  }

  test("etl_crawl_schedule: conservation, sequential in-slot finish times, telescoped load balance") {
    val rows = Round9bOps.etlCrawlSchedule(spark, sf).collect()
      .map(r => (r.getAs[String]("domain"), r.getAs[Long]("n_pages"),
        r.getAs[Int]("crawler"), r.getAs[Long]("crawl_s"),
        r.getAs[Long]("finish_s")))
    // every frontier domain scheduled exactly once, on a valid slot
    val nDomains = Round9bOps.etlUrlCanonical(spark, sf)
      .select("domain").distinct().count()
    assert(rows.length == nDomains)
    assert(rows.map(_._3).forall(c => c >= 0 && c < 4))
    // within a slot, finish times are the cumulative sequential plan
    rows.groupBy(_._3).foreach { case (_, slot) =>
      val ordered = slot.sortBy(_._5)
      assert(ordered.map(_._4).scanLeft(0L)(_ + _).tail.toSeq
        == ordered.map(_._5).toSeq)
    }
    // round-robin over the size-descending order: max-min slot load
    // bounded by one largest domain's crawl seconds
    val loads = rows.groupBy(_._3).view.mapValues(_.map(_._4).sum).values
    assert(loads.max - loads.min <= rows.map(_._4).max,
      s"imbalance ${loads.max - loads.min}")
  }

  test("q_rfm_segmentation: scores in 1..5, near-quintile balance, segment labels derive from scores") {
    val rows = Round9bOps.qRfmSegmentation(spark, sf).collect()
    assert(rows.nonEmpty)
    val n = rows.length
    rows.foreach { r =>
      val (rs, fs, ms) = (r.getAs[Long]("r_score"), r.getAs[Long]("f_score"),
        r.getAs[Long]("m_score"))
      Seq(rs, fs, ms).foreach(s => assert(s >= 1 && s <= 5))
      val seg = r.getAs[String]("segment")
      val expect =
        if (rs >= 4 && fs >= 4 && ms >= 4) "champion"
        else if (rs >= 4 && fs >= 3) "loyal"
        else if (rs <= 2 && fs >= 4) "at_risk"
        else if (rs <= 2 && fs <= 2) "hibernating"
        else "regular"
      assert(seg == expect, s"$r")
    }
    // monetary has no mass ties at cents granularity: each m-score
    // bucket holds ~n/5 (strict-inequality scoring shifts boundaary
    // ties down a bucket, so allow slack)
    val mCounts = rows.groupBy(_.getAs[Long]("m_score")).view
      .mapValues(_.size).toMap
    (1L to 5L).foreach { s =>
      assert(mCounts.getOrElse(s, 0) > n / 10,
        s"m-score $s holds ${mCounts.getOrElse(s, 0)} of $n")
    }
  }

  test("q_grid_knn_join: grid candidates reproduce the all-pairs bounded-NN exactly (3x3 containment theorem)") {
    import spark.implicits._
    val got = Round9bOps.qGridKnnJoin(spark, sf).collect()
      .map(r => (r.getLong(0), r.getLong(1), r.getDouble(2))).sortBy(_._1)
    // brute force in Spark: full cross, same derived coordinates
    def coord(prefix: String, id: org.apache.spark.sql.Column) =
      (graft.functions.gf.h32(concat(lit(prefix), id)) % 4096)
        .cast("double") * lit(100.0) / lit(4096.0)
    val s = Tables.supplier(spark, sf).select($"s_suppkey",
      coord("gx:s", $"s_suppkey").as("sx"), coord("gy:s", $"s_suppkey").as("sy"))
    val c = Tables.customer(spark, sf).select($"c_custkey",
      coord("gx:c", $"c_custkey").as("cx"), coord("gy:c", $"c_custkey").as("cy"))
    val brute = s.crossJoin(broadcast(c))
      .withColumn("d2", ($"sx" - $"cx") * ($"sx" - $"cx")
        + ($"sy" - $"cy") * ($"sy" - $"cy"))
      .filter($"d2" <= 25.0)
      .groupBy($"s_suppkey")
      .agg(min(struct($"d2".as("d2"), $"c_custkey".as("c_custkey"))).as("m"))
      .select($"s_suppkey", $"m.c_custkey", $"m.d2").collect()
      .map(r => (r.getLong(0), r.getLong(1), r.getDouble(2))).sortBy(_._1)
    assert(got.toSeq == brute.toSeq,
      "grid-bucketed result diverges from all-pairs brute force")
    assert(got.nonEmpty)
    assert(got.forall(_._3 <= 25.0))
  }

  test("mm_size_anomaly: every flag is a plant, every truncation flags, small-base concats honestly pass") {
    val flagged = MultimodalOps.mmSizeAnomaly(spark, sf).collect()
      .map(r => (r.getAs[Long]("doc_id"), r.getAs[Double]("robust_z")))
    assert(flagged.nonEmpty)
    // zero false positives: only planted ids may flag
    flagged.foreach { case (id, z) =>
      assert(id % 97 == 0 || id % 89 == 0, s"unplanted doc $id flagged z=$z")
    }
    // the low side always flags: truncation to 16 bytes is extreme on
    // the log scale for every base size
    val truncated = Tables.documents(spark, sf)
      .filter(col("doc_id") % 97 === 0)
      .select("doc_id").collect().map(_.getLong(0)).toSet
    val flaggedIds = flagged.map(_._1).toSet
    assert(truncated.subsetOf(flaggedIds),
      s"missed truncations: ${truncated -- flaggedIds}")
    truncated.foreach(id =>
      assert(flagged.find(_._1 == id).get._2 < -3.5))
  }

  test("q_ks_test: closed-form D on a constructed pair; bounds on real data") {
    import spark.implicits._
    // A={1,2,3,4}, B={3,4,5,6}: D=0.5, first attained at v=2
    val ab = (Seq(1, 2, 3, 4).map(v => ("purchase", v.toDouble)) ++
      Seq(3, 4, 5, 6).map(v => ("click", v.toDouble)))
      .toDF("event_type", "value")
    val r = Round9bOps.ksPipeline(ab).collect().head
    assert(r.getAs[Long]("n_a") == 4 && r.getAs[Long]("n_b") == 4)
    assert(r.getAs[Long]("d_num") == 8L)
    assert(r.getAs[Double]("ks") == 0.5)
    assert(r.getAs[Double]("ks_at") == 2.0)
    // real data: 0 <= ks <= 1, d_num <= n_a*n_b
    val real = Round9bOps.qKsTest(spark, sf).collect().head
    val (na, nb) = (real.getAs[Long]("n_a"), real.getAs[Long]("n_b"))
    assert(real.getAs[Long]("d_num") <= na * nb)
    val ks = real.getAs[Double]("ks")
    assert(ks >= 0.0 && ks <= 1.0)
  }

  test("streaming_coreset: streamed top-65 state reproduces the batch coreset exactly (weighted mergeability)") {
    val stream = graft.streaming.StreamingTwins.streamingCoreset(spark, sf)
    val batch = Round9bOps.sampleCoreset(spark, sf)
    assert(stream.exceptAll(batch).isEmpty && batch.exceptAll(stream).isEmpty,
      "streamed weighted sample diverged from the batch draw")
    assert(stream.count() == 64)
  }

  test("dedup_cc_twostar: two-star contraction equals label propagation on chain, star, clique, and the real pair graph") {
    import spark.implicits._
    def labels(df: org.apache.spark.sql.DataFrame) =
      df.collect().map(r => r.getLong(0) -> r.getLong(1)).toMap
    // chain 1-2-3-4-5 (diameter stress), star 10<-{11,12,13},
    // clique {20,21,22}, pair {30,31}
    val shapes = Seq((1L, 2L), (2L, 3L), (3L, 4L), (4L, 5L),
      (10L, 11L), (10L, 12L), (10L, 13L),
      (20L, 21L), (20L, 22L), (21L, 22L), (30L, 31L))
      .toDF("id1", "id2")
    val two = labels(Round9bOps.twoStarComponents(shapes))
    val prop = labels(ClusterOps.connectedComponents(shapes))
    assert(two == prop, s"two-star $two vs propagation $prop")
    assert(two(5L) == 1L && two(13L) == 10L && two(22L) == 20L)
    // real graph: both algorithms produce the identical labeling
    val pairs = DedupOps.dedupMinhashLsh(spark, sf).select("id1", "id2")
      .persist()
    try {
      val a = Round9bOps.twoStarComponents(pairs)
      val b = ClusterOps.connectedComponents(pairs)
      assert(a.exceptAll(b).isEmpty && b.exceptAll(a).isEmpty)
    } finally pairs.unpersist()
  }

  test("dedup_bbit_minhash: exact-duplicate bucket estimates 1.0 on both axes; b-bit tracks full within its variance") {
    val rows = Round9bOps.dedupBbitMinhash(spark, sf).collect()
      .map(r => (r.getAs[Long]("bucket"), r.getAs[Long]("n_pairs"),
        r.getAs[Double]("mean_full_est"), r.getAs[Double]("mean_bbit_est")))
      .sortBy(_._1)
    assert(rows.nonEmpty)
    // planted exact duplicates: the top bucket (all 128 match) exists
    // and both estimators read exactly 1.0 there
    val top = rows.last
    assert(top._1 == 10L && top._3 == 1.0 && top._4 == 1.0, top.toString)
    // b = 1 loses information, never gains: per bucket, the b-bit
    // mean can exceed the full mean only within sampling noise of the
    // 128-bit estimator (3 sigma ~ 0.13 at n=1)
    rows.foreach { case (b, n, full, bbit) =>
      assert(math.abs(bbit - full) <= 0.14 + 0.5 / math.sqrt(n.toDouble),
        s"bucket $b: b-bit $bbit vs full $full at n=$n")
    }
  }

  test("dedup_prefix_join: exactly the brute-force Jaccard>=0.8 pairs (prefix-filter recall is 1.0 by theorem)") {
    import graft.functions.gf
    val docs = DedupOps.corpus(Tables.documents(spark, sf))
    val post = docs.select(col("doc_id"),
      explode(array_distinct(gf.shingle_md5_h32(col("text"), 3))).as("h"))
    val sized = post.groupBy("doc_id").agg(count(lit(1)).as("n"))
    // brute force: every pair sharing >=1 shingle, exact Jaccard
    val inter = post.as("a").join(post.as("b"),
        col("a.h") === col("b.h") && col("a.doc_id") < col("b.doc_id"))
      .groupBy(col("a.doc_id").as("id1"), col("b.doc_id").as("id2"))
      .agg(count(lit(1)).as("i"))
    val brute = inter
      .join(sized.select(col("doc_id").as("id1"), col("n").as("n1")), "id1")
      .join(sized.select(col("doc_id").as("id2"), col("n").as("n2")), "id2")
      .filter(col("i").cast("double") / (col("n1") + col("n2") - col("i"))
        >= 0.8)
      .select("id1", "id2")
    val got = Round9bOps.dedupPrefixJoin(spark, sf).select("id1", "id2")
    assert(got.exceptAll(brute).isEmpty, "false positives vs brute force")
    assert(brute.exceptAll(got).isEmpty,
      "missed pairs — prefix filter must have recall 1.0")
    assert(got.count() > 0, "corpus has planted dups; result must be non-empty")
  }
}
