package graft

import org.apache.spark.sql.DataFrame
import org.scalatest.funsuite.AnyFunSuite

import graft.functions.VectorFunctions._
import graft.operators.Similarity

class SimilaritySpec extends AnyFunSuite {
  lazy val spark = SharedSpark.spark

  test("vector kernels: dot, norm, cosine on known values") {
    import spark.implicits._
    val df = Seq(
      (Array(1f, 0f, 0f), Array(0f, 1f, 0f)), // orthogonal
      (Array(1f, 2f, 3f), Array(1f, 2f, 3f)), // identical
      (Array(1f, 1f, 0f), Array(1f, 0f, 0f))  // 45 degrees
    ).toDF("a", "b")
    val rows = df.select(vecDot($"a", $"b"), vecCosine($"a", $"b"), vecNorm($"a")).collect()
    assert(rows(0).getDouble(0) == 0.0 && rows(0).getDouble(1) == 0.0)
    assert(rows(1).getDouble(0) == 14.0 && math.abs(rows(1).getDouble(1) - 1.0) < 1e-12)
    assert(math.abs(rows(2).getDouble(1) - math.sqrt(0.5)) < 1e-12)
    assert(math.abs(rows(2).getDouble(2) - math.sqrt(2.0)) < 1e-12)
  }

  test("mismatched lengths compute over the common prefix (total function)") {
    import spark.implicits._
    val df = Seq((Array(3f, 4f), Array(1f, 0f, 9f))).toDF("a", "b")
    assert(df.select(vecDot($"a", $"b")).head.getDouble(0) == 3.0)
  }

  test("brute force topk: k rows per query, descending, self excluded") {
    val got = Similarity.bruteForceTopK(Tables.embeddings(spark, SharedSpark.sf), 4, 5).collect()
    val byQuery = got.groupBy(_.getLong(0))
    assert(byQuery.keySet == Set(0L, 1L, 2L, 3L))
    byQuery.values.foreach { rows =>
      assert(rows.length == 5)
      val cosines = rows.sortBy(_.getLong(3)).map(_.getDouble(2))
      assert(cosines.zip(cosines.tail).forall { case (a, b) => a >= b })
      assert(!rows.exists(r => r.getLong(1) == r.getLong(0)), "self match excluded")
    }
  }

  test("ANN recall vs brute force is usable (>= 0.5 at 24 planes / 8 bands)") {
    val emb = Tables.embeddings(spark, SharedSpark.sf)
    val exact = Similarity.bruteForceTopK(emb, 8, 10).collect()
      .map(r => (r.getLong(0), r.getLong(1))).toSet
    val ann = Similarity.annTopK(emb, 8, 10).collect()
      .map(r => (r.getLong(0), r.getLong(1))).toSet
    val recall = (exact intersect ann).size.toDouble / exact.size
    assert(recall >= 0.5, s"ANN recall $recall")
  }

  test("embedding near-dup finds planted duplicates at 0.9 and nothing else") {
    import spark.implicits._
    val rnd = new scala.util.Random(7)
    def vec(): Array[Float] = Array.fill(64)(rnd.nextGaussian().toFloat)
    val v0 = vec()
    // v1 = v0 + tiny noise (near-dup); v2.. random
    val v1 = v0.map(x => x + 0.01f * rnd.nextGaussian().toFloat)
    val rows = Seq((0L, v0), (1L, v1)) ++ (2L to 40L).map(i => (i, vec()))
    val df = rows.toDF("vec_id", "embedding")
    val pairs = Similarity.embeddingNearDup(df, 0.9).collect()
      .map(r => (r.getLong(0), r.getLong(1))).toSet
    assert(pairs == Set((0L, 1L)))
  }
}
