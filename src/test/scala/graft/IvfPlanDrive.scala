package graft

/** Manual drive: show the IvfTopKRewrite-optimized plan of knn_ivf_plan
  * against real testdata. Run: sbt "testOnly graft.IvfPlanDrive" */
class IvfPlanDrive extends SparkSpec {
  test("drive") {
    val df = SparkEntry.queries("knn_ivf_plan")(spark, "/root/testdata/sf0.001")
    println(df.queryExecution.optimizedPlan)
    df.collect().foreach(println)
  }
}
