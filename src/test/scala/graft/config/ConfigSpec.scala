package graft.config

import graft.SparkSpec
import graft.core.AlgoRegistry
import graft.fsops.FsOps

class JsonConfigSpec extends SparkSpec {
  test("parses typed values, lists and nested maps") {
    val c = JsonConfig.parse(
      """{"s":"x","i":5,"b":true,"l":["a","b"],"m":{"k":1},"d":2.5}""")
    c.getString("s") shouldBe "x"
    c.getInt("i") shouldBe 5
    c.getBoolean("b") shouldBe true
    c.getSeq[String]("l") shouldBe Seq("a", "b")
    c.getOpt[Map[String, Any]]("m").get("k") shouldBe 1
    c.getIntOpt("missing") shouldBe None
    an[NoSuchElementException] should be thrownBy c.get[String]("nope")
    // required getDouble: a missing key fails with the KEY NAME, not a
    // downstream sentinel-validation message
    c.getDouble("d") shouldBe 2.5
    c.getDouble("i") shouldBe 5.0
    val e = intercept[NoSuchElementException] {
      c.getDouble("budget_per_group")
    }
    e.getMessage should include("budget_per_group")
  }

  test("TokenBudgetMix without budget_per_group fails naming the key") {
    import org.apache.spark.sql.functions.col
    val spark2 = spark
    import spark2.implicits._
    val src = tmp("cfg_tbm_src") + "/t"
    Seq((1L, "g", 10)).toDF("doc_id", "grp", "w").write.parquet(src)
    val tgt = tmp("cfg_tbm_tgt") + "/t"
    val algo = AlgoRegistry.create("TokenBudgetMix", spark,
      new FsOps(spark.sparkContext.hadoopConfiguration), JsonConfig.parse(
        s"""{"source_dir":"$src","target_dir":"$tgt",
           |"id_column":"doc_id","group_column":"grp",
           |"weight_column":"w"}""".stripMargin.replaceAll("\n", "")))
    val e = intercept[NoSuchElementException] { algo.run() }
    e.getMessage should include("budget_per_group")
  }
}

class AlgoRegistrySpec extends SparkSpec {
  import spark.implicits._

  test("FullLoad built from a params JSON runs end to end") {
    val landing = tmp("reg_landing")
    val target = tmp("reg_tgt") + "/t"
    java.nio.file.Files.writeString(
      java.nio.file.Paths.get(landing, "d.psv"), "1|20200605\n")
    val config = JsonConfig.parse(
      s"""{"source_dir":"$landing","target_dir":"$target",
         |"file_format":"dsv","delimiter":"|",
         |"partition_column":"date","partition_column_format":"yyyyMMdd",
         |"target_partitions":["year","month"],
         |"target_schema":{"type":"struct","fields":[
         |  {"name":"id","type":"integer","nullable":true,"metadata":{}},
         |  {"name":"date","type":"string","nullable":true,"metadata":{}},
         |  {"name":"year","type":"short","nullable":true,"metadata":{}},
         |  {"name":"month","type":"short","nullable":true,"metadata":{}}]}}
         |""".stripMargin.replaceAll("\n", ""))
    AlgoRegistry.create("FullLoad", spark,
      new FsOps(spark.sparkContext.hadoopConfiguration), config).run()
    val out = spark.read.option("basePath", target).parquet(target)
    out.select($"id", $"year".cast("int"), $"month".cast("int"))
      .as[(Int, Int, Int)].collect() shouldBe Array((1, 2020, 6))
  }

  test("Transpose and SQLRunner and QueryMaterialization from params JSON") {
    val fsOps = new FsOps(spark.sparkContext.hadoopConfiguration)
    // Transpose
    val src = tmp("reg2_src") + "/t"; val tgt = tmp("reg2_tgt") + "/t"
    Seq((1, "a", 10), (1, "b", 20)).toDF("id", "key", "v").write.parquet(src)
    AlgoRegistry.create("Transpose", spark, fsOps, JsonConfig.parse(
      s"""{"source_dir":"$src","target_dir":"$tgt","file_format":"parquet",
         |"group_by_column":["id"],"pivot_column":"key",
         |"pivot_values":["a","b"],"aggregation_column":"v"}"""
        .stripMargin.replaceAll("\n", ""))).run()
    spark.read.parquet(tgt).collect().head.toSeq shouldBe Seq(1, 10, 20)
    // SQLRunner
    AlgoRegistry.create("SQLRunner", spark, fsOps, JsonConfig.parse(
      """{"steps":2,
        |"1":"CREATE OR REPLACE TEMPORARY VIEW reg_sql AS SELECT 7 AS x",
        |"2":"SELECT x FROM reg_sql"}""".stripMargin.replaceAll("\n", ""))).run()
    // QueryMaterialization
    val msrc = tmp("reg3_src") + "/t"; val mtgt = tmp("reg3_tgt")
    Seq((1, "F"), (2, "O")).toDF("v", "st").write.partitionBy("st").parquet(msrc)
    AlgoRegistry.create("QueryMaterialization", spark, fsOps, JsonConfig.parse(
      s"""{"source_dir":"$msrc","target_dir":"$mtgt",
         |"select_conditions":[["st=F"]],"target_partitions":["st"]}"""
        .stripMargin.replaceAll("\n", ""))).run()
    val ver = fsOps.ls(mtgt).filter(_.startsWith("data_")).sorted.last
    spark.read.option("basePath", s"$mtgt/$ver").parquet(s"$mtgt/$ver")
      .select($"v").as[Int].collect() shouldBe Array(1)
  }
}
