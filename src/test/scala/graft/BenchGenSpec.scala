package graft

import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

/** Smoke tests for the bench corpus generators — the bench mains are not
  * otherwise exercised by `sbt test`, and a generator regression would
  * silently invalidate the recorded BENCH/BASELINE.md numbers. */
class BenchGenSpec extends AnyFunSuite {
  private lazy val spark = TestSpark.spark
  import spark.implicits._

  test("DedupBench corpus: planted tiers have the documented shingle Jaccard") {
    val docs = DedupBench.synthesize(spark, 1000).cache()
    assert(docs.count() == 1000)
    val texts = docs.where($"doc_id".isin(0L, 8L, 9L, 3L)).collect()
      .map(r => r.getLong(0) -> r.getString(1)).toMap
    def shingleSet(t: String) = t.split(" ").sliding(3).map(_.mkString(" ")).toSet
    def jac(a: String, b: String) = {
      val (x, y) = (shingleSet(a), shingleSet(b))
      (x & y).size.toDouble / (x | y).size
    }
    // easy tier: last word changed -> 47/49
    assert(math.abs(jac(texts(0L), texts(9L)) - 47.0 / 49) < 1e-9)
    // hard tier: last 5 words changed -> 43/53
    assert(math.abs(jac(texts(0L), texts(8L)) - 43.0 / 53) < 1e-9)
    // unrelated docs are far below any threshold
    assert(jac(texts(0L), texts(3L)) < 0.1)
    // deterministic
    val again = DedupBench.synthesize(spark, 1000)
    assert(docs.exceptAll(again).count() == 0)
    docs.unpersist()
  }

  test("AnnBench corpus: clustered, deterministic, right shape") {
    val emb = AnnBench.synthesize(spark, 1000, nCells = 16).cache()
    assert(emb.count() == 1000)
    val row = emb.where($"vec_id" === 17).collect()(0)
    assert(row.getSeq[Double](1).size == AnnBench.Dim)
    // same cluster (i % nCells) => high cosine; different clusters => lower
    def vec(id: Long) = emb.where($"vec_id" === id).collect()(0).getSeq[Double](1).toArray
    def cos(a: Array[Double], b: Array[Double]) = {
      val d = a.zip(b).map { case (x, y) => x * y }.sum
      d / math.sqrt(a.map(x => x * x).sum) / math.sqrt(b.map(x => x * x).sum)
    }
    val sameCluster = cos(vec(1), vec(17)) // 1 % 16 == 17 % 16
    val diffCluster = cos(vec(1), vec(8))
    assert(sameCluster > diffCluster, s"same=$sameCluster diff=$diffCluster")
    emb.unpersist()
  }
}
