package graft.catalog

import graft.SparkSpec
import org.apache.spark.sql.functions._

class CatalogOpsSpec extends SparkSpec {
  import spark.implicits._

  test("location lookup, partition recovery, analyze statistics") {
    val dir = tmp("cat") + "/t"
    Seq((1, "p1"), (2, "p2")).toDF("v", "p")
      .write.partitionBy("p").parquet(dir)
    spark.sql("DROP TABLE IF EXISTS cat_t")
    spark.sql(
      s"CREATE TABLE cat_t (v INT, p STRING) USING parquet PARTITIONED BY (p) LOCATION '$dir'")
    // table starts with no partition metadata → empty scan
    spark.table("cat_t").count() shouldBe 0
    CatalogOps.recoverPartitionsNative(spark, "cat_t")
    spark.table("cat_t").count() shouldBe 2
    CatalogOps.tableLocation(spark, "cat_t") should include("/t")
    // custom recovery path: add a new partition dir, register explicitly
    Seq((3, "p3")).toDF("v", "p").write.mode("append")
      .partitionBy("p").parquet(dir)
    CatalogOps.recoverPartitionsCustom(spark, "cat_t", Seq(Seq("p" -> "p3")))
    spark.table("cat_t").count() shouldBe 3
    CatalogOps.computeStatistics(spark, "cat_t", perPartition = true,
      partitionColumns = Seq("p"))
    // CBO stats recorded
    spark.sql("DESCRIBE EXTENDED cat_t").filter($"col_name" === "Statistics")
      .count() shouldBe 1
    CatalogOps.refresh(spark, "cat_t")
    spark.sql("DROP TABLE cat_t")
  }
}
