package graft.tmp
import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types._
object DlqProbe {
  def main(args: Array[String]): Unit = {
    val spark = SparkSession.builder().master("local[32]")
      .config("spark.sql.shuffle.partitions", "32")
      .config("spark.ui.enabled", "false").getOrCreate()
    spark.sparkContext.setLogLevel("ERROR")
    val d = "/root/testdata/sf0.1"
    def time(name: String)(f: => Long): Unit = {
      f; f
      val t0 = System.nanoTime; val n = f
      println(f"$name%-30s ${(System.nanoTime - t0)/1e9}%.3f s  (rows=$n)")
    }
    import graft.cdc.Debezium
    val pruned = StructType(Seq(
      StructField("after", StringType),
      StructField("source", StructType(Seq(StructField("ts_ms", LongType)))),
      StructField("op", StringType)))
    def coded() = Debezium.synthEnvelope(spark, d)
      .withColumn("parsed", from_json(col("cdc_event"), pruned))
      .selectExpr(
        """CASE WHEN NOT (parsed.source.ts_ms >= 1500000000000) THEN 1 ELSE 0 END
          | + CASE WHEN NOT (CASE parsed.op WHEN 'c' THEN 'INSERT' WHEN 'u' THEN 'UPDATE' WHEN 'd' THEN 'DELETE' WHEN 'r' THEN 'SNAPSHOT' ELSE parsed.op END = 'DELETE'
          |     OR CAST(get_json_object(parsed.after, '$.user_id') AS BIGINT) IS NULL
          |     OR CAST(get_json_object(parsed.after, '$.user_id') AS BIGINT) < 10) THEN 2 ELSE 0 END AS code""".stripMargin)
    time("code + global agg") {
      coded().agg(
          sum(when(col("code") === 1, 1L).otherwise(0L)).as("so"),
          sum(when(col("code") === 2, 1L).otherwise(0L)).as("bo"),
          sum(when(col("code") === 3, 1L).otherwise(0L)).as("sb")).count()
    }
    time("code.groupBy(code)") { coded().groupBy("code").count().count() }
    spark.stop()
  }
}
