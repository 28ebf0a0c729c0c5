package graft

import org.apache.spark.sql.functions._
import graft.operators.Forget

/** Right-to-be-forgotten: the selective-rewrite contract — doomed keys
  * vanish, affected partitions rewrite, and every OTHER partition keeps
  * its files byte-identical (the property that makes the op viable on a
  * 100 TB store).
  */
class ForgetSpec extends SparkSpec {

  private def partFiles(root: String): Map[String, Set[(String, Long, Long)]] =
    new java.io.File(root).listFiles().filter(_.isDirectory).map { d =>
      d.getName -> d.listFiles().filter(_.getName.startsWith("part-"))
        .map(f => (f.getName, f.length(), f.lastModified())).toSet
    }.toMap

  test("forgetKeys deletes only doomed keys and only rewrites affected partitions") {
    import spark.implicits._
    val root = java.nio.file.Files.createTempDirectory("forget_spec").toString
    val store = s"$root/store"
    // three days; the doomed user appears on days 1 and 3 only
    val dayUs = 86400000000L
    val rows = Seq(
      (1L, 100L, 1L * dayUs), (2L, 200L, 1L * dayUs + 5),
      (3L, 300L, 2L * dayUs), (4L, 400L, 2L * dayUs + 5),
      (5L, 100L, 3L * dayUs), (6L, 500L, 3L * dayUs + 5))
      .toDF("event_id", "user_id", "ts_us")
    Tables.writeDatePartitioned(rows, "ts_us", store)
    val before = partFiles(store)
    assert(before.size == 3)

    val out = Forget.forgetKeys(spark, store, "user_id", Seq(100L))
      .collect().map(r => r.getString(0) -> (r.getLong(1), r.getLong(2))).toMap
    // accounting: only the two affected days reported, one row dropped each
    assert(out.size == 2 && out.values.forall { case (b, a) => b == 2 && a == 1 })

    val after = partFiles(store)
    // user 100 is gone; other rows survive
    val remaining = spark.read.parquet(store)
    assert(remaining.filter(col("user_id") === 100L).count() == 0)
    assert(remaining.count() == 4)
    // day 2 (never contained user 100) kept byte-identical files
    val untouchedDay = before.keys.find(d => after(d) == before(d))
    assert(untouchedDay.isDefined, "no partition survived untouched")
    assert(before.count { d => after(d._1) != d._2 } == 2,
      "expected exactly the two affected partitions to be rewritten")

    // forgetting a key nobody has is a no-op with empty accounting
    val noop = Forget.forgetKeys(spark, store, "user_id", Seq(999999L))
    assert(noop.count() == 0)
    assert(partFiles(store) == after, "no-op forget rewrote files")
    org.apache.commons.io.FileUtils.deleteDirectory(new java.io.File(root))
  }

  test("dsar export covers every subject and matches direct counts") {
    val out = Forget.dsarExport(spark, sf).collect()
    val expected = Tables.customer(spark, sf)
      .filter(col("c_custkey") % 100 === 7)
      .collect().map(_.getAs[Long]("c_custkey")).toSet
    assert(expected.nonEmpty)
    // every subject appears with exactly one customer row
    val custRows = out.filter(_.getAs[String]("tbl") == "customer")
    assert(custRows.map(_.getAs[Long]("subject")).toSet === expected)
    custRows.foreach(r => assert(r.getAs[Long]("n_rows") === 1L))
    // orders accounting matches a direct filter for each subject present
    val orderRows = out.filter(_.getAs[String]("tbl") == "orders")
      .map(r => r.getAs[Long]("subject") -> r.getAs[Long]("n_rows")).toMap
    val direct = Tables.orders(spark, sf)
      .filter(col("o_custkey") % 100 === 7)
      .groupBy("o_custkey").count().collect()
      .map(r => r.getAs[Long]("o_custkey") -> r.getAs[Long]("count")).toMap
    assert(orderRows === direct)
    // held time ranges are ordered
    out.filter(r => !r.isNullAt(r.fieldIndex("first_us"))).foreach { r =>
      assert(r.getAs[Long]("first_us") <= r.getAs[Long]("last_us")) }
  }

  test("forget cascade: children delete first, churn counted per table") {
    import spark.implicits._
    val dir = java.nio.file.Files.createTempDirectory("cascade").toString
    Seq((7L, "a"), (8L, "b")).toDF("c_custkey", "c_name")
      .write.parquet(s"$dir/customer.parquet")
    Seq((1L, 7L), (2L, 7L), (3L, 8L)).toDF("o_orderkey", "o_custkey")
      .write.parquet(s"$dir/orders.parquet")
    Seq((1L, 1L), (1L, 2L), (2L, 1L), (3L, 1L))
      .toDF("l_orderkey", "l_linenumber").write.parquet(s"$dir/lineitem.parquet")
    val out = graft.operators.Forget.forgetCascade(spark, dir).collect()
      .map(r => r.getAs[String]("tbl") -> r).toMap
    assert(out("lineitem").getAs[Long]("delete_order") === 1L)
    assert(out("orders").getAs[Long]("delete_order") === 2L)
    assert(out("customer").getAs[Long]("delete_order") === 3L)
    assert(out("lineitem").getAs[Long]("n_rows_affected") === 3L)
    assert(out("lineitem").getAs[Long]("churn_ppm") === 750000L)
    assert(out("orders").getAs[Long]("n_rows_affected") === 2L)
    assert(out("orders").getAs[Long]("churn_ppm") === 666666L)
    assert(out("customer").getAs[Long]("n_rows_affected") === 1L)
    assert(out("customer").getAs[Long]("churn_ppm") === 500000L)
    assert(out.values.forall(_.getAs[Long]("n_subjects") === 1L))
  }
}
