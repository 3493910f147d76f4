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
}
