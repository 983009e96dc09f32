package graft

import graft.queries.GraphQueries
import org.apache.spark.sql.functions.{col, count, lit}
import org.scalatest.funsuite.AnyFunSuite

/** PageRank invariants the SQL oracle's hash match does not state
  * explicitly: probability-mass conservation and bipartite coverage. */
class GraphSpec extends AnyFunSuite {
  private lazy val spark = TestSession.spark

  test("indexed pagerank equals the in-memory pass and storage-" +
      "partitions its rank join (edge side never re-exchanged)") {
    val mem = GraphQueries.pageRank(spark, TestSession.Sf)
      .collect().map(r => (r.getLong(0), r.getDouble(1)))
    val idx = GraphQueries.pageRankIndexed(spark, TestSession.Sf)
    // plan shape under deterministic (non-adaptive) planning: every
    // rank-iteration SortMergeJoin reads the bucketed layout directly
    // — exchanges exist only on the rank/aggregate side, never
    // directly above a BatchScan of the edge index
    val prev = Seq("spark.sql.autoBroadcastJoinThreshold",
      "spark.sql.adaptive.enabled")
      .map(k => k -> spark.conf.getOption(k))
    try {
      spark.conf.set("spark.sql.autoBroadcastJoinThreshold", "-1")
      spark.conf.set("spark.sql.adaptive.enabled", "false")
      val planned = GraphQueries.pageRankIndexed(spark, TestSession.Sf)
      val plan = planned.queryExecution.executedPlan.toString
      assert(plan.contains("SortMergeJoin"), plan)
      assert(!plan.matches(
        "(?s).*Exchange hashpartitioning\\(src#[0-9]+L.*"),
        s"edge side of the rank join was re-exchanged:\n$plan")
    } finally prev.foreach { case (k, v) =>
      v.fold(spark.conf.unset(k))(spark.conf.set(k, _))
    }
    assert(idx.collect().map(r => (r.getLong(0), r.getDouble(1)))
      .sameElements(mem),
      "bucketed-index pagerank diverged from the in-memory pass")
  }

  test("rank loop conserves mass on an arbitrary synthetic symmetric graph") {
    // a deterministic pseudo-random sparse graph on ~500 nodes — the
    // conservation invariant must hold for ANY symmetric graph, not
    // just the fixture's trading relation
    val e0 = spark.range(0, 3000)
      .select((col("id") * 2654435761L % 500).as("a"),
        (col("id") * 40503L % 500).as("b"))
      .filter(col("a") =!= col("b")).distinct()
    val edges = e0.select(col("a").as("src"), col("b").as("dst"))
      .unionAll(e0.select(col("b").as("src"), col("a").as("dst")))
      .distinct()
    val deg = edges.groupBy(col("src")).agg(count(lit(1)).as("d"))
    val w = edges.join(deg, "src")
      .select(col("src"), col("dst"), (lit(1.0) / col("d")).as("w"))
    val n = w.select(col("src")).distinct().count().toDouble
    val ranks = GraphQueries.rankLoop(w, n).collect()
    assert(ranks.length == n.toLong)
    val total = ranks.map(_.getDouble(1)).sum
    assert(math.abs(total - 1.0) <= 5e-7 * n,
      s"synthetic graph rank mass $total drifted from 1.0")
    assert(ranks.forall(_.getDouble(1) > 0.0))
  }

  test("pagerank conserves probability mass and covers both node kinds") {
    val rows = GraphQueries.pageRank(spark, TestSession.Sf).collect()
    assert(rows.nonEmpty)
    val n = rows.length
    // a symmetric graph has no dangling mass: Σ rank = 1, up to the
    // 6dp output rounding (±5e-7 per node)
    val total = rows.map(_.getDouble(1)).sum
    assert(math.abs(total - 1.0) <= 5e-7 * n,
      s"rank mass $total drifted from 1.0 over $n nodes")
    // both sides of the bipartite graph are ranked (customers offset
    // by 10^12), and every rank is positive (teleport floor)
    assert(rows.exists(_.getLong(0) >= 1000000000000L))
    assert(rows.exists(_.getLong(0) < 1000000000000L))
    assert(rows.forall(_.getDouble(1) > 0.0))
  }

  test("triangle counts are exact on known synthetic graphs") {
    import spark.implicits._
    // K4 (4-clique): 4 triangles total, each node in exactly 3;
    // a disjoint path 10-11-12-13: triangle-free, contributes nothing
    val k4 = for {
      i <- 0L to 3L; j <- 0L to 3L if i < j
    } yield (i, j)
    val path = Seq((10L, 11L), (11L, 12L), (12L, 13L))
    val e = (k4 ++ path).toDF("x", "y")
    val got = GraphQueries.triangleCounts(e).collect()
      .map(r => (r.getLong(0), r.getLong(1))).toSeq
    assert(got == Seq((0L, 3L), (1L, 3L), (2L, 3L), (3L, 3L)),
      s"K4+path triangle counts wrong: $got")
    // a hub star (no triangles) plus one closed fan blade: degree
    // orientation must not miscount around the hub
    val star = (1L to 8L).map(i => (0L, i)) :+ ((1L, 2L))
    val gotStar = GraphQueries.triangleCounts(star.toDF("x", "y"))
      .collect().map(r => (r.getLong(0), r.getLong(1))).toSeq
    assert(gotStar == Seq((0L, 1L), (1L, 1L), (2L, 1L)),
      s"star+blade triangle counts wrong: $gotStar")
  }

  test("triangle closure above the broadcast edge limit takes the " +
      "shuffled-hash path and still counts exactly") {
    // the broadcast() hint is honored UNCONDITIONALLY by Spark — above
    // the gate the closure must degrade to a shuffled hash join, not
    // die on the broadcast ceiling at 100× edges (VERDICT r12 #2).
    // broadcastLimit=0 forces every edge set down the fallback path.
    import spark.implicits._
    val k5 = for {
      i <- 0L to 4L; j <- 0L to 4L if i < j
    } yield (i, j)
    val e = (k5 ++ Seq((20L, 21L), (21L, 22L))).toDF("x", "y")
    val res = GraphQueries.triangleCounts(e, broadcastLimit = 0L)
    // the degree/orientation joins may legitimately broadcast (tiny
    // stat-planned sides); the gated join is the CLOSURE on (b, c) —
    // that one must be shuffled-hash, never a broadcast of the edges
    val plan = res.queryExecution.executedPlan.toString
    assert(plan.matches("(?s).*ShuffledHashJoin \\[b#\\d+L, c#\\d+L\\].*"),
      s"closure join is not shuffled-hash:\n$plan")
    assert(!plan.matches("(?s).*BroadcastHashJoin \\[b#\\d+L, c#\\d+L\\].*"),
      s"forced-fallback triangle closure still broadcasts:\n$plan")
    val got = res.collect().map(r => (r.getLong(0), r.getLong(1))).toSeq
    // K5: C(4,2)=6 triangles per node; the path is triangle-free
    assert(got == (0L to 4L).map(i => (i, 6L)),
      s"K5 shuffled-path triangle counts wrong: $got")
  }
}
