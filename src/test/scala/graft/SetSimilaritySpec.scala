package graft

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

import graft.queries.{JoinQueries, RelationalQueries}

/** The exact-threshold operators added in round 13, pinned against
  * their brute-force formulations: prefix-filtered set-similarity
  * join (AllPairs/PPJoin) and the two-phase prefix-max skyline. The
  * declared queries carry independent/restated DuckDB oracles; these
  * tests prove the PRUNING is lossless on inputs chosen to stress the
  * edges (threshold boundaries, ties, duplicates, bucket spans). */
class SetSimilaritySpec extends AnyFunSuite {
  private lazy val spark = TestSession.spark

  private def bagEqual(a: DataFrame, b: DataFrame): Boolean =
    a.exceptAll(b).isEmpty && b.exceptAll(a).isEmpty

  test("prefix-filtered pair set equals brute-force all-pairs on the " +
      "fixture corpus slice") {
    val tok = Tables.documents(spark, TestSession.Sf)
      .filter(col("doc_id") % 10 === 0)
      .select(col("doc_id"),
        explode(array_distinct(split(col("text"), " "))).as("token"))
      .filter(col("token") =!= "")
    val filtered = JoinQueries.setSimilarityPairs(tok)
    // brute force: every doc pair sharing ANY token, exact verify
    val sz = tok.groupBy(col("doc_id")).agg(count(lit(1)).as("sz"))
    val t1 = tok.join(sz, "doc_id")
      .select(col("doc_id").as("da"), col("token"), col("sz").as("na"))
    val t2 = tok.join(sz, "doc_id")
      .select(col("doc_id").as("db"), col("token"), col("sz").as("nb"))
    val brute = t1.join(t2,
        t1("token") === t2("token") && col("da") < col("db"))
      .groupBy(col("da"), col("db"), col("na"), col("nb"))
      .agg(count(lit(1)).as("inter"))
      .filter(lit(8) * col("inter") >= lit(3) * (col("na") + col("nb")))
      .select(col("da"), col("db"),
        round(col("inter").cast("double") /
          (col("na") + col("nb") - col("inter")), 6).as("jaccard"))
    assert(bagEqual(filtered, brute),
      "prefix filtering dropped or fabricated a qualifying pair")
  }

  test("prefix filtering is exact at the threshold boundary " +
      "(jaccard exactly 3/5 must stay IN)") {
    import spark.implicits._
    // A={a,b,c,x1,x2,x3}, B={a,b,c,y1,y2,y3}: inter=3, union=9 → 1/3 OUT
    // C={c1..c6}, D={c1..c4,z1,z2}: wait — build jac exactly 0.6:
    // |A|=|B|=6, inter=4.5 impossible; use |A|=5,|B|=5,inter=... need
    // i/(10-i)=3/5 → i=3.75; |A|=4,|B|=4: i/(8-i)=3/5 → i=3 ✓
    val docs = Seq(
      (10L, Seq("a", "b", "c", "p")), // ∩ {a,b,c} with 20 → jac 3/5
      (20L, Seq("a", "b", "c", "q")),
      (30L, Seq("a", "m", "n", "r"))) // jac(10,30)=1/7, jac(20,30)=1/7
    val tok = docs.flatMap { case (d, ts) => ts.map(d -> _) }
      .toDF("doc_id", "token")
    val got = JoinQueries.setSimilarityPairs(tok)
      .select(col("da"), col("db"), col("jaccard"))
      .collect().map(r => (r.getLong(0), r.getLong(1), r.getDouble(2)))
      .toSeq
    assert(got == Seq((10L, 20L, 0.6)),
      s"boundary pair handling wrong: $got")
  }

  test("prefix filtering equals brute force on a seeded RANDOM " +
      "universe (tiny sets, size-ratio and prefix-length boundaries)") {
    import spark.implicits._
    // 200 docs, set sizes 1..12 over a 40-token vocabulary: dense
    // enough that candidates collide constantly, small enough that
    // every size-ratio/prefix-length edge case (sz = 1..5, where the
    // integer ceil matters most) occurs many times
    val rnd = new scala.util.Random(8675309L)
    val docs = (1 to 200).map { d =>
      val sz = 1 + rnd.nextInt(12)
      d.toLong -> Seq.fill(sz)(s"t${rnd.nextInt(40)}").distinct
    }
    val tok = docs.flatMap { case (d, ts) => ts.map(d -> _) }
      .toDF("doc_id", "token")
    val filtered = JoinQueries.setSimilarityPairs(tok)
    val sz = tok.groupBy(col("doc_id")).agg(count(lit(1)).as("sz"))
    val t1 = tok.join(sz, "doc_id")
      .select(col("doc_id").as("da"), col("token"), col("sz").as("na"))
    val t2 = tok.join(sz, "doc_id")
      .select(col("doc_id").as("db"), col("token"), col("sz").as("nb"))
    val brute = t1.join(t2,
        t1("token") === t2("token") && col("da") < col("db"))
      .groupBy(col("da"), col("db"), col("na"), col("nb"))
      .agg(count(lit(1)).as("inter"))
      .filter(lit(8) * col("inter") >= lit(3) * (col("na") + col("nb")))
      .select(col("da"), col("db"),
        round(col("inter").cast("double") /
          (col("na") + col("nb") - col("inter")), 6).as("jaccard"))
    assert(bagEqual(filtered, brute),
      "prefix filter diverged from brute force on the random universe")
    assert(brute.count() > 0,
      "random universe produced no qualifying pairs — widen the mix")
  }

  test("skyline equals brute-force dominance on synthetic frontiers " +
      "with ties, duplicates, and bucket-spanning prices") {
    import spark.implicits._
    // crafted: strictly improving frontier, equal-price group, an
    // exact duplicate pair (both stay), dominated interior points,
    // prices spread so the 16 range buckets all populate
    val rows = (1L to 400L).map { i =>
      val price = (i % 40) * 25.0 + (i % 7)
      val size = ((i * 13) % 50 + (if (i % 11 == 0) 60 else 0)).toInt
      (i, price, size)
    } ++ Seq(
      (1001L, 0.0, 100), (1002L, 0.0, 100), // duplicate pair, both in
      (1003L, 0.0, 99)) // same price, smaller size: dominated
    val p = rows.toDF("p_partkey", "p_retailprice", "p_size")
    val got = RelationalQueries.skylineOf(p)
    val q = p.select(col("p_partkey").as("qk"),
      col("p_retailprice").as("qp"), col("p_size").as("qs"))
    val dominated = p.join(q,
        col("qp") <= col("p_retailprice") && col("qs") >= col("p_size") &&
          (col("qp") < col("p_retailprice") || col("qs") > col("p_size")),
        "left_semi")
    val brute = p.exceptAll(dominated)
      .orderBy(col("p_retailprice"), col("p_partkey"))
    assert(bagEqual(got, brute),
      "two-phase skyline diverged from brute-force dominance")
    val keys = got.select(col("p_partkey"))
      .collect().map(_.getLong(0)).toSet
    assert(keys(1001L) && keys(1002L) && !keys(1003L),
      "equal-(price,size) duplicates must both stay; the smaller-size " +
        "same-price point must not")
  }

  test("skyline equals brute-force dominance on seeded RANDOM " +
      "universes (duplicate-heavy, bucket-edge, and single-bucket " +
      "price distributions)") {
    import spark.implicits._
    for (seed <- Seq(42L, 271828L, 314159L)) {
      val rnd = new scala.util.Random(seed)
      val n = 150 + rnd.nextInt(150)
      // three adversarial price shapes per seed: (0) a tiny grid where
      // most prices duplicate, (1) a 6.25-step grid whose values land
      // exactly on range-bucket boundaries, (2) a sub-unit cluster
      // whose whole span fits inside ONE bucket's width
      for (shape <- 0 to 2) {
        val rows = (1 to n).map { i =>
          val price = shape match {
            case 0 => rnd.nextInt(33).toDouble
            case 1 => rnd.nextInt(160) * 6.25
            case _ => 100.0 + rnd.nextInt(4) * 0.25
          }
          (i.toLong + shape * 10000L, price, rnd.nextInt(60))
        }
        val p = rows.toDF("p_partkey", "p_retailprice", "p_size")
        val got = RelationalQueries.skylineOf(p)
        val q = p.select(col("p_partkey").as("qk"),
          col("p_retailprice").as("qp"), col("p_size").as("qs"))
        val dominated = p.join(q,
          col("qp") <= col("p_retailprice") &&
            col("qs") >= col("p_size") &&
            (col("qp") < col("p_retailprice") ||
              col("qs") > col("p_size")),
          "left_semi")
        val brute = p.exceptAll(dominated)
        assert(bagEqual(got, brute),
          s"skyline diverged from brute force (seed=$seed shape=$shape)")
        assert(got.count() > 0,
          s"empty skyline on a non-empty input (seed=$seed shape=$shape)")
      }
    }
  }
}
