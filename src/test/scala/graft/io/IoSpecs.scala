package graft.io

import graft.SparkSpec
import graft.fsops.FsOps
import org.apache.spark.sql.functions._

class AtomicWriterSpec extends SparkSpec {
  import spark.implicits._

  private def fsOps = new FsOps(spark.sparkContext.hadoopConfiguration)

  test("OverwriteTable replaces content atomically") {
    val dir = tmp("aw") + "/t"
    val w = new AtomicWriter(fsOps, Seq.empty, Some(2))
    w.write(Seq((1, "a")).toDF("k", "v"), DataFormat.Parquet, dir,
      LoadMode.OverwriteTable)
    w.write(Seq((2, "b"), (3, "c")).toDF("k", "v"), DataFormat.Parquet, dir,
      LoadMode.OverwriteTable)
    spark.read.parquet(dir).as[(Int, String)].collect().sorted shouldBe
      Array((2, "b"), (3, "c"))
  }

  test("OverwritePartitions touches only incoming partitions") {
    val dir = tmp("aw") + "/t"
    val w = new AtomicWriter(fsOps, Seq("p"), None)
    w.write(Seq((1, "p1"), (2, "p2")).toDF("v", "p"), DataFormat.Parquet,
      dir, LoadMode.OverwritePartitions)
    w.write(Seq((99, "p2")).toDF("v", "p"), DataFormat.Parquet,
      dir, LoadMode.OverwritePartitions)
    spark.read.option("basePath", dir).parquet(dir)
      .select($"v", $"p".cast("string")).as[(Int, String)].collect()
      .sorted shouldBe Array((1, "p1"), (99, "p2"))
  }

  test("AppendUnionPartitions unions with existing partition content") {
    val dir = tmp("aw") + "/t"
    val w = new AtomicWriter(fsOps, Seq("p"), None)
    w.write(Seq((1, "p1"), (5, "p2")).toDF("v", "p"), DataFormat.Parquet,
      dir, LoadMode.OverwritePartitions)
    w.write(Seq((2, "p1")).toDF("v", "p"), DataFormat.Parquet,
      dir, LoadMode.AppendUnionPartitions)
    spark.read.option("basePath", dir).parquet(dir)
      .select($"v", $"p".cast("string")).as[(Int, String)].collect()
      .sorted shouldBe Array((1, "p1"), (2, "p1"), (5, "p2"))
  }

  test("AppendJoinPartitions full-outer joins with existing content") {
    val dir = tmp("aw") + "/t"
    val w = new AtomicWriter(fsOps, Seq("p"), None)
    w.write(Seq((1, "old1", "p1")).toDF("k", "a", "p"), DataFormat.Parquet,
      dir, LoadMode.OverwritePartitions)
    // same key gains column b; new key 2 appears with null a
    w.write(Seq((1, "new1", "p1"), (2, "new2", "p1")).toDF("k", "b", "p"),
      DataFormat.Parquet, dir, LoadMode.AppendJoinPartitions)
    val out = spark.read.option("basePath", dir).parquet(dir)
      .select($"k", $"a", $"b").as[(Int, Option[String], Option[String])]
      .collect().sortBy(_._1)
    out shouldBe Array((1, Some("old1"), Some("new1")), (2, None, Some("new2")))
  }

  test("OverwritePartitionsWithAddedColumns aligns schemas") {
    val dir = tmp("aw") + "/t"
    val w = new AtomicWriter(fsOps, Seq("p"), None)
    w.write(Seq((1, "x", "p1")).toDF("v", "extra", "p"), DataFormat.Parquet,
      dir, LoadMode.OverwritePartitions)
    w.write(Seq((2, "p1")).toDF("v", "p"), DataFormat.Parquet,
      dir, LoadMode.OverwritePartitionsWithAddedColumns)
    val out = spark.read.option("basePath", dir).parquet(dir)
    out.columns.toSet shouldBe Set("v", "extra", "p")
    out.select("extra").collect().head.isNullAt(0) shouldBe true
  }
}

class DataFormatSpec extends SparkSpec {
  import spark.implicits._

  test("DSV roundtrip with delimiter and schema") {
    val dir = tmp("dsv")
    val df = Seq((1, "a|b embedded? no", 2.5)).toDF("i", "s", "d")
    DataFormat.Dsv(";").write(df.write.mode("overwrite"), dir + "/out")
    val back = DataFormat.Dsv(";").read(spark, Map("mode" -> "FAILFAST"),
      Some(df.schema), dir + "/out")
    assertSameRows(back, df)
  }

  test("ORC roundtrip with pushdown-capable schema") {
    val dir = tmp("orc")
    val df = Seq((1, "a", 2.5), (2, "b", 3.5)).toDF("i", "s", "d")
    DataFormat.Orc.write(df.write.mode("overwrite"), dir + "/out")
    assertSameRows(
      DataFormat.Orc.read(spark, Map.empty, Some(df.schema), dir + "/out"), df)
  }

  test("JSON roundtrip") {
    val dir = tmp("json")
    val df = Seq((1, "x"), (2, "y")).toDF("i", "s")
    DataFormat.Json.write(df.write.mode("overwrite"), dir + "/out")
    assertSameRows(
      DataFormat.Json.read(spark, Map.empty, Some(df.schema), dir + "/out"), df)
  }

  test("DROPMALFORMED drops bad rows, FAILFAST throws") {
    val dir = tmp("dsvm")
    java.nio.file.Files.writeString(
      java.nio.file.Paths.get(dir, "data.csv"), "1|a\nnotanint|b\n3|c\n")
    val schema = org.apache.spark.sql.types.StructType(Seq(
      org.apache.spark.sql.types.StructField("i",
        org.apache.spark.sql.types.IntegerType),
      org.apache.spark.sql.types.StructField("s",
        org.apache.spark.sql.types.StringType)))
    val dropped = DataFormat.Dsv("|").read(spark,
      Map("mode" -> "DROPMALFORMED"), Some(schema), dir)
    // note: count() without materializing columns does NOT drop malformed
    // rows on Spark 4 even with csv columnPruning disabled — rows are only
    // judged malformed when their columns are actually parsed
    dropped.collect().length shouldBe 2
    an[Exception] should be thrownBy
      DataFormat.Dsv("|").read(spark, Map("mode" -> "FAILFAST"),
        Some(schema), dir).collect()
  }
}
