package graft

import org.apache.spark.sql.functions._
import graft.operators.{ClusterOps, DedupOps}

class ClusterSpec extends SparkSuite {
  import spark.implicits._

  /** Brute-force union-find for ground truth. */
  private def unionFind(pairs: Seq[(Long, Long)]): Map[Long, Long] = {
    val parent = scala.collection.mutable.Map[Long, Long]()
    def find(x: Long): Long = {
      val p = parent.getOrElseUpdate(x, x)
      if (p == x) x else { val r = find(p); parent(x) = r; r }
    }
    pairs.foreach { case (a, b) =>
      val (ra, rb) = (find(a), find(b))
      if (ra != rb) parent(math.max(ra, rb)) = math.min(ra, rb)
    }
    parent.keys.map(k => k -> find(k)).toMap
  }

  test("connected components match union-find on a crafted graph") {
    // components: {1,2,3,4} (chain), {10,11}, {20,21,22} (triangle+tail)
    val pairs = Seq((1L, 2L), (2L, 3L), (3L, 4L), (10L, 11L),
      (20L, 21L), (21L, 22L), (20L, 22L))
    val got = ClusterOps.connectedComponents(pairs.toDF("id1", "id2"))
      .collect().map(r => r.getLong(0) -> r.getLong(1)).toMap
    val want = unionFind(pairs)
    assert(got == want)
    assert(got(4L) == 1L && got(11L) == 10L && got(22L) == 20L)
  }

  test("connected components match union-find on seeded random graphs") {
    val rnd = new scala.util.Random(421L)
    for (trial <- 1 to 3) {
      val n = 60 + trial * 40 // nodes
      val m = n * 3 / 2       // edges: supercritical, mixed components
      val pairs = Seq.fill(m) {
        val a = rnd.nextInt(n).toLong
        val b = rnd.nextInt(n).toLong
        (math.min(a, b), math.max(a, b))
      }.filter(p => p._1 != p._2).distinct
      val got = ClusterOps.connectedComponents(pairs.toDF("id1", "id2"))
        .collect().map(r => r.getLong(0) -> r.getLong(1)).toMap
      assert(got == unionFind(pairs), s"trial $trial (n=$n) mismatch")
    }
  }

  test("long chain converges (worst-case diameter)") {
    val chain = (0L until 12L).map(i => (i, i + 1))
    val got = ClusterOps.connectedComponents(chain.toDF("id1", "id2"), maxIter = 20)
      .collect().map(r => r.getLong(0) -> r.getLong(1)).toMap
    assert(got.values.toSet == Set(0L))
    assert(got.size == 13)
  }

  test("diameter-300 chain converges within default maxIter via pointer-jumping") {
    // one-hop propagation alone needs ~300 rounds here; pointer-jumping
    // closes it in O(log d). Would previously exit unconverged at 10.
    val chain = (0L until 300L).map(i => (i, i + 1))
    val got = ClusterOps.connectedComponents(chain.toDF("id1", "id2"))
      .collect().map(r => r.getLong(0) -> r.getLong(1)).toMap
    assert(got.values.toSet == Set(0L))
    assert(got.size == 301)
  }

  test("diameter-4000 chain: maxIter knob extends reach; guard throws below it") {
    // A 4000-long chain (well past the 50k-edge threshold is NOT hit —
    // 8k directed edges — so this also exercises the two-squaring
    // branch on a pathological graph). Pointer-jumping doubles reach
    // per round, so maxIter=16 gives 2^16 ≫ 4000; the default 10 is
    // sized for dedup graphs, and the convergence guard must throw —
    // not silently return a partial labeling — when a graph exceeds it.
    val chain = (0L until 4000L).map(i => (i, i + 1))
    val got = ClusterOps.connectedComponents(chain.toDF("id1", "id2"),
      maxIter = 16)
      .collect().map(r => r.getLong(0) -> r.getLong(1)).toMap
    assert(got.values.toSet == Set(0L))
    assert(got.size == 4001)
    intercept[IllegalStateException] {
      ClusterOps.connectedComponents(chain.toDF("id1", "id2"), maxIter = 2)
        .collect()
    }
  }

  test("dedup_clusters equals union-find closure of the minhash pairs") {
    val pairs = DedupOps.minhashPipeline(
      DedupOps.corpus(Tables.documents(spark, sf)), 0.5)
      .select("id1", "id2").collect()
      .map(r => (r.getLong(0), r.getLong(1))).toSeq
    val truth = unionFind(pairs).groupBy(_._2).view
      .mapValues(_.keys.toSeq.sorted.mkString(",")).toMap
    val got = ClusterOps.dedupClusters(spark, sf).collect()
      .map(r => r.getAs[Long]("cluster_id") -> r.getAs[String]("members")).toMap
    assert(got == truth.filter(_._2.contains(",")),
      s"cluster count got=${got.size} want=${truth.count(_._2.contains(","))}")
  }
}
