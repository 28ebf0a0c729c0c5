package graft
import org.apache.spark.sql.SparkSession
// throwaway profiling harness (deleted before commit)
object Prof {
  def main(args: Array[String]): Unit = {
    val sfDir = sys.env.getOrElse("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    val cpus = sys.env.getOrElse("SPARK_GRAFT_CPUS", "32")
    val spark = SparkSession.builder().master(s"local[$cpus]")
      .config("spark.sql.shuffle.partitions", cpus)
      .config("spark.ui.enabled", "false").getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
    try SparkEntry.entry(spark).count() catch { case _: Throwable => () }
    for (q <- args(0).split(",")) {
      for (i <- 1 to 3) {
        val t0 = System.nanoTime()
        val df = SparkEntry.queries(q)(spark, sfDir)
        val t1 = System.nanoTime()
        df.count()
        val t2 = System.nanoTime()
        println(f"[prof] $q pass$i construct=${(t1-t0)/1e9}%.3f count=${(t2-t1)/1e9}%.3f")
      }
    }
    spark.stop()
  }
}
