package graft.tools

/** Throwaway harness for running one SparkEntry query by name from sbt:
  * `runMain graft.tools.Scratch <query> <sfDir>`.
  */
object Scratch {
  def main(args: Array[String]): Unit = {
    val name = args(0)
    val sfDir = if (args.length > 1) args(1) else "/root/testdata/sf0.001"
    val spark = graft.Engine.session()
    val df = graft.SparkEntry.queries(name)(spark, sfDir)
    df.show(10, truncate = false)
    println(s"rows=${df.count()}")
    spark.stop()
  }
}
