package graft.ext

import org.apache.spark.sql.functions._
import graft.SparkSpec

class GraphOpsSpec extends SparkSpec {
  import spark.implicits._

  test("connected components merges transitive chains and leaves " +
      "islands apart") {
    // two chains (1-2-3, 7-8) and an isolated edge (20-21)
    val edges = Seq((1L, 2L), (2L, 3L), (7L, 8L), (20L, 21L))
      .toDF("src", "dst")
    val got = ConnectedComponents.components(edges, "src", "dst")
      .as[(Long, Long)].collect().toMap
    assert(got == Map(1L -> 1L, 2L -> 1L, 3L -> 1L,
      7L -> 7L, 8L -> 7L, 20L -> 20L, 21L -> 20L))
  }

  test("star contraction handles a 100-node path in logarithmic rounds") {
    // diameter-99 chain — O(diameter) label propagation would need
    // ~100 rounds; star contraction must finish well within 50
    val edges = (0L until 99L).map(i => (i, i + 1)).toDF("src", "dst")
    val got = ConnectedComponents.components(edges, "src", "dst")
      .as[(Long, Long)].collect()
    assert(got.length == 100)
    assert(got.forall(_._2 == 0L))
  }

  test("BFS distances: branch + cycle fixture gets exact min-hop " +
      "labels from the smallest node; disconnected nodes are absent") {
    // source = min node (1). Shape: 1-2-3-4 path, branch 2-10,
    // cycle 3-11-12-1 (12 reaches 1 directly → dist(12)=1 via the
    // cycle, NOT 3 via the path), island 50-51 (unreachable).
    val edges = Seq((1L, 2L), (2L, 3L), (3L, 4L), (2L, 10L),
      (3L, 11L), (11L, 12L), (12L, 1L), (50L, 51L))
      .toDF("src", "dst")
    val got = Bfs.distances(edges, "src", "dst")
      .as[(Long, Long)].collect().toMap
    assert(got == Map(1L -> 0L, 2L -> 1L, 12L -> 1L, 3L -> 2L,
      10L -> 2L, 11L -> 2L, 4L -> 3L),
      s"got $got")
    // a long path exercises the round loop well past depth 1
    val chain = (0L until 15L).map(i => (i, i + 1)).toDF("src", "dst")
    val chainGot = Bfs.distances(chain, "src", "dst")
      .as[(Long, Long)].collect().toMap
    assert(chainGot == (0L to 15L).map(i => i -> i).toMap)
  }

  test("BFS over the bucketed adjacency index: identical distances " +
      "to the cached-frame form, empty edges, and layout reclaimed") {
    val edges = Seq((1L, 2L), (2L, 3L), (3L, 4L), (2L, 10L),
      (3L, 11L), (11L, 12L), (12L, 1L), (50L, 51L))
      .toDF("src", "dst")
    val want = Bfs.distances(edges, "src", "dst")
      .as[(Long, Long)].collect().toMap
    val got = Bfs.distancesIndexed(edges, "src", "dst")
      .as[(Long, Long)].collect().toMap
    assert(got == want, s"indexed BFS drifted: $got vs $want")
    // the run-scoped adjacency table must not survive the call
    assert(!spark.catalog.listTables()
      .collect().exists(_.name.startsWith("graft_bfs_adj")),
      "adjacency table leaked")
    // empty edge set: same guard as the cached form
    val none = Seq.empty[(Long, Long)].toDF("src", "dst")
    assert(Bfs.distancesIndexed(none, "src", "dst").isEmpty)
    // a random graph for non-trivial fan-out equality
    val rnd = new scala.util.Random(7)
    val re = Seq.fill(120)((rnd.nextInt(50).toLong,
      rnd.nextInt(50).toLong)).filter(e => e._1 != e._2)
      .toDF("src", "dst")
    val w2 = Bfs.distances(re, "src", "dst")
      .as[(Long, Long)].collect().toMap
    val g2 = Bfs.distancesIndexed(re, "src", "dst")
      .as[(Long, Long)].collect().toMap
    assert(g2 == w2)
  }

  test("components match brute-force closure on a random graph") {
    val rnd = new scala.util.Random(4242)
    val edges = Seq.fill(60)((rnd.nextInt(40).toLong,
      rnd.nextInt(40).toLong)).filter(e => e._1 != e._2)
    val got = ConnectedComponents.components(
      edges.toDF("src", "dst"), "src", "dst")
      .as[(Long, Long)].collect().toMap
    // reference: driver-side union-find
    val parent = scala.collection.mutable.Map[Long, Long]()
    def find(x: Long): Long = {
      val p = parent.getOrElseUpdate(x, x)
      if (p == x) x else { val r = find(p); parent(x) = r; r }
    }
    edges.foreach { case (a, b) =>
      val (ra, rb) = (find(a), find(b))
      if (ra != rb) parent(math.max(ra, rb)) = math.min(ra, rb)
    }
    val want = edges.flatMap(e => Seq(e._1, e._2)).distinct
      .map(n => n -> find(n)).toMap
    assert(got == want)
  }

  test("interval join finds exactly the in-tolerance pairs across " +
      "band boundaries") {
    def ts(sec: Int) = java.sql.Timestamp.valueOf(
      f"2024-01-01 00:${sec / 60}%02d:${sec % 60}%02d")
    // tolerance 60s; pairs: (1,2) 59s apart spanning a band boundary,
    // (3,4) 61s apart must NOT match, (5,6) same instant
    val a = Seq((1L, 9L, ts(59)), (3L, 9L, ts(120)), (5L, 9L, ts(300)))
      .toDF("id_a", "user_id", "ts_a")
    val b = Seq((2L, 9L, ts(118)), (4L, 9L, ts(181)), (6L, 9L, ts(300)))
      .toDF("id_b", "user_id", "ts_b")
    val got = RangeJoin.intervalJoin(a, b, "user_id", "ts_a", "ts_b",
      60L * 1000000)
      .select("id_a", "id_b").as[(Long, Long)].collect().toSet
    // (1,2): 59s apart across a band boundary; (3,2): 2s apart;
    // (5,6): same instant; (3,4) at 61s must NOT match
    assert(got == Set((1L, 2L), (3L, 2L), (5L, 6L)))
  }

  test("interval join emits each qualifying pair exactly once") {
    val ev = graft.Tables.events(spark, sf0001)
      .select(col("event_id"), col("user_id"), col("ts"))
    val a = ev.select(col("user_id"), col("event_id").as("ea"),
      col("ts").as("ts_a"))
    val b = ev.select(col("user_id"), col("event_id").as("eb"),
      col("ts").as("ts_b"))
    val pairs = RangeJoin.intervalJoin(a, b, "user_id", "ts_a", "ts_b",
      300L * 1000000).filter(col("ea") < col("eb"))
    assert(pairs.count() ==
      pairs.select("ea", "eb").distinct().count())
  }

  test("pagerank keeps zero-in-degree nodes and their outgoing " +
      "contributions on directed graphs (hand-computed 2-iteration " +
      "fixture)") {
    // 1⇄2 plus 3→1: node 3 has no in-edges but every node is a src
    val edges = Seq((1L, 2L), (2L, 1L), (3L, 1L)).toDF("src", "dst")
    val got = PageRank.pagerank(edges, iters = 2)
      .as[(Long, Long)].collect().toMap
    assert(got.size == 3, "zero-in-degree node must not vanish")
    // n=3: base = 150000000000//3; p0 = 10^12//3 each
    // iter1: pr(1)=base+85%*(p0(2)+p0(3)), pr(2)=base+85%*p0(1),
    //        pr(3)=base
    // iter2: pr(1)=base+85%*(pr1(2)+pr1(3)) — 3 still contributes
    assert(got(3L) == 50000000000L)
    assert(got(1L) == 375833333333L, s"got $got")
    assert(got(2L) == 574166666666L, s"got $got")
  }
  test("pagerank iteration shape: the dst-partitioned edge layout " +
      "serves the contribution aggregate with NO shuffle exchange " +
      "(broadcast rank join preserves partitioning through the alias)") {
    // rebuild exactly the in-loop frame pagerank constructs so the
    // physical plan is inspectable (inside pagerank the per-iteration
    // localCheckpoint hides it)
    val e0 = graft.Tables.lineitem(spark, sf0001)
      .join(graft.Tables.orders(spark, sf0001),
        col("l_orderkey") === col("o_orderkey"))
      .select((col("o_custkey") * 2).as("src"),
        (col("l_suppkey") * 2 + 1).as("dst"))
      .distinct()
    val deg = e0.groupBy(col("src")).agg(count(lit(1)).as("deg"))
    val e = e0.join(deg, "src").repartition(col("dst"))
      .persist(org.apache.spark.storage.StorageLevel.MEMORY_AND_DISK_SER)
    e.count() // partitioning is exposed once the cache materializes
    val pr = deg.select(col("src").as("node"), lit(1000L).as("pr_pico"))
    val contrib = e
      .join(broadcast(pr.select(col("node").as("src"), col("pr_pico"))),
        "src")
      .select(col("dst").as("node"), expr("pr_pico div deg").as("c"))
    val agg = contrib.groupBy(col("node")).agg(sum(col("c")).as("s"))
    val plan = agg.queryExecution.executedPlan.toString
    // everything ABOVE the cached layout scan (aggregate, project,
    // join) must be exchange-free; the cached subtree itself prints
    // its one-time build exchanges, which is the point of the layout
    val aboveScan = plan.split("InMemoryTableScan")(0)
    assert(plan.contains("InMemoryTableScan"), s"layout not cached:\n$plan")
    assert(!aboveScan.contains("Exchange hashpartitioning"),
      s"contribution aggregate must reuse the layout's partitioning:\n$plan")
    assert(aboveScan.contains("BroadcastHashJoin"),
      "rank side must broadcast, never shuffle the edge layout")
    e.unpersist()
  }

  test("triangle counts: K4-clique + hub star + chain — per-node " +
      "counts match hand enumeration; hub wedges close nothing") {
    // K4 on {1,2,3,4} (4 triangles, each node in 3); hub 10 joined to
    // leaves 11..15 (star: many wedges at the hub, zero triangles);
    // chain 20-21-22 (one open wedge, no triangle). Mixed edge
    // orientations + a duplicate + a self-loop exercise normalization.
    val k4 = for (a <- 1L to 4L; b <- (a + 1) to 4L) yield (a, b)
    val star = (11L to 15L).map(l => (10L, l))
    val extra = Seq((21L, 20L), (21L, 22L), (2L, 1L), (7L, 7L))
    val edges = (k4 ++ star ++ extra).toDF("src", "dst")
    val got = Triangles.triangleCounts(edges, "src", "dst")
      .select($"node", $"n_tri", $"deg").as[(Long, Long, Long)]
      .collect().map(t => t._1 -> ((t._2, t._3))).toMap
    for (n <- 1L to 4L) assert(got(n) == ((3L, 3L)), s"node $n")
    assert(got(10L) == ((0L, 5L)))
    for (l <- 11L to 15L) assert(got(l) == ((0L, 1L)))
    assert(got(21L) == ((0L, 2L)))
    assert(got(20L) == ((0L, 1L)) && got(22L) == ((0L, 1L)))
    assert(!got.contains(7L)) // self-loop dropped entirely
  }

  test("triangle counts equal the naive unoriented enumeration on a " +
      "random graph (degree orientation is result-neutral)") {
    val rnd = new scala.util.Random(20260814)
    val edges = (0 until 260).map(_ =>
      (rnd.nextInt(40).toLong, rnd.nextInt(40).toLong))
      .filter(e => e._1 != e._2).toDF("src", "dst")
    val got = Triangles.triangleCounts(edges, "src", "dst")
      .select($"node", $"n_tri").as[(Long, Long)].collect().toMap
    // naive: id-ordered distinct edges, enumerate x<y<z triangles
    val und = edges.select(least($"src", $"dst").as("a"),
        greatest($"src", $"dst").as("b")).distinct()
      .as[(Long, Long)].collect().toSet
    val ns = und.flatMap(e => Seq(e._1, e._2))
    val naive = (for (x <- ns; y <- ns if x < y; z <- ns if y < z
        if und((x, y)) && und((x, z)) && und((y, z)))
      yield (x, y, z)).toSeq
    val perNode = naive.flatMap(t => Seq(t._1, t._2, t._3))
      .groupBy(identity).map { case (n, l) => n -> l.size.toLong }
    for (n <- ns)
      assert(got(n) == perNode.getOrElse(n, 0L), s"node $n")
  }
}
