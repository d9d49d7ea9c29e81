package graft

import org.scalatest.funsuite.AnyFunSuite

import org.apache.spark.sql.graftvec.GraftFunctionRegistration

/** The native vector expressions must be callable from SQL once
  * registered (SparkSessionExtensions deployment path, or imperative
  * registration on a live session).
  */
class ExtensionsSpec extends AnyFunSuite {
  lazy val spark = SharedSpark.spark

  test("vec_dot / vec_cosine usable from spark.sql after registration") {
    GraftFunctionRegistration.registerAll(spark)
    val r = spark.sql(
      """SELECT vec_dot(array(CAST(1.0 AS FLOAT), CAST(2.0 AS FLOAT)),
        |               array(CAST(3.0 AS FLOAT), CAST(4.0 AS FLOAT))) AS d,
        |       vec_cosine(array(CAST(1.0 AS FLOAT), CAST(0.0 AS FLOAT)),
        |                  array(CAST(1.0 AS FLOAT), CAST(0.0 AS FLOAT))) AS c
        |""".stripMargin).head
    assert(r.getDouble(0) == 11.0)
    assert(math.abs(r.getDouble(1) - 1.0) < 1e-12)
  }

  test("registered functions run over the embeddings table in SQL") {
    GraftFunctionRegistration.registerAll(spark)
    Tables.embeddings(spark, SharedSpark.sf).createOrReplaceTempView("emb")
    val n = spark.sql(
      "SELECT vec_cosine(embedding, embedding) AS c FROM emb")
      .filter("abs(c - 1.0) < 1e-9").count()
    assert(n == Tables.embeddings(spark, SharedSpark.sf).count())
  }
}
