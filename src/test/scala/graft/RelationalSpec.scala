package graft

import org.scalatest.funsuite.AnyFunSuite

import graft.operators.Relational

class RelationalSpec extends AnyFunSuite {
  lazy val spark = SharedSpark.spark
  lazy val sf = SharedSpark.sf

  test("q1 groups to the flag pairs with positive sums") {
    val rows = Relational.q1PricingSummary(Tables.lineitem(spark, sf)).collect()
    assert(rows.nonEmpty && rows.length <= 9)
    rows.foreach { r =>
      assert(r.getDouble(r.fieldIndex("sum_qty")) > 0)
      assert(r.getLong(r.fieldIndex("count_order")) > 0)
    }
  }

  test("q1 count_order sums to the filtered row count") {
    import org.apache.spark.sql.functions._
    val li = Tables.lineitem(spark, sf)
    val total = Relational.q1PricingSummary(li)
      .agg(sum("count_order")).head.getLong(0)
    val expected = li.filter(col("l_shipdate") <= to_timestamp(lit("1998-09-01 00:00:00"))).count()
    assert(total == expected)
  }
}
