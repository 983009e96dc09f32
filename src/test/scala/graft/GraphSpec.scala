package graft

import graft.queries.GraphQueries
import org.scalatest.funsuite.AnyFunSuite

/** PageRank invariants the SQL oracle's hash match does not state
  * explicitly: probability-mass conservation and bipartite coverage. */
class GraphSpec extends AnyFunSuite {
  private lazy val spark = TestSession.spark

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
    // by 1,000,000), and every rank is positive (teleport floor)
    assert(rows.exists(_.getLong(0) >= 1000000L))
    assert(rows.exists(_.getLong(0) < 1000000L))
    assert(rows.forall(_.getDouble(1) > 0.0))
  }
}
