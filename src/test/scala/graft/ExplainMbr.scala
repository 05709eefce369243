// scratch: where does the scope left_semi land in mbr1's physical plan?
package graft
object ExplainMbr {
  def main(args: Array[String]): Unit = {
    val spark = TestSpark.spark
    spark.sparkContext.setLogLevel("WARN")
    val plan = graft.queries.Members.byClub(spark, "/root/testdata/sf0.01", 7)
      .queryExecution.optimizedPlan.toString
    // print join order summary: lines with Join/LeftSemi/Filter/Relation
    plan.split("\n").filter(l => l.contains("Join") || l.contains("Relation")
      || l.contains("semi") || l.contains("Semi")).take(40).foreach(println)
    spark.stop()
  }
}
