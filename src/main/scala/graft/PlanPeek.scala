package graft
// dev aid: print one query's formatted plan (not part of the library)
object PlanPeek {
  def main(args: Array[String]): Unit = {
    val spark = GraftSession.local()
    println(SparkEntry.queries(args(0))(spark, args(1))
      .queryExecution.explainString(
        org.apache.spark.sql.execution.ExplainMode.fromString("formatted")))
    spark.stop()
  }
}
