package graft.core

import graft.SparkSpec
import graft.algos.SQLRunner
import org.apache.spark.sql.types._

class JobRunnerSpec extends SparkSpec {
  import spark.implicits._

  test("main() runs FullLoad end-to-end from a params file (spark-submit parity)") {
    val landing = tmp("jr_landing")
    val target = tmp("jr_tgt") + "/t"
    java.nio.file.Files.writeString(
      java.nio.file.Paths.get(landing, "data.psv"),
      "1|20160601|x|5\n2|20170215|y|6\n")
    val schema = StructType(Seq(
      StructField("id", IntegerType), StructField("date", StringType),
      StructField("name", StringType), StructField("amount", IntegerType),
      StructField("year", ShortType), StructField("month", ShortType)))
    val params =
      s"""{
         |  "source_dir": "$landing",
         |  "target_dir": "$target",
         |  "file_format": "dsv",
         |  "delimiter": "|",
         |  "has_header": false,
         |  "target_schema": ${schema.json},
         |  "partition_column": "date",
         |  "target_partitions": ["year", "month"],
         |  "output_files_num": 1
         |}""".stripMargin
    val paramsPath = tmp("jr_params") + "/params.json"
    java.nio.file.Files.writeString(
      java.nio.file.Paths.get(paramsPath), params)
    // simulate the harness case: a session already exists before main()
    spark.sparkContext
    JobRunner.main(Array("FullLoad", paramsPath))
    // under a harness, main() must not tear down the shared session
    spark.sparkContext.isStopped shouldBe false
    val out = spark.read.option("basePath", target).parquet(target)
    out.count() shouldBe 2
    out.filter($"id" === 1).select($"year".cast("int"), $"month".cast("int"))
      .collect().head.toSeq shouldBe Seq(2016, 6)
  }

  test("unknown algorithm names are rejected") {
    val paramsPath = tmp("jr_bad") + "/params.json"
    java.nio.file.Files.writeString(
      java.nio.file.Paths.get(paramsPath), "{}")
    an[IllegalArgumentException] should be thrownBy
      JobRunner.execute(spark, "NoSuchAlgo", paramsPath)
  }
}

class SqlRunnerBoundSpec extends SparkSpec {

  test("intermediate SELECT over a large relation is driver-bounded") {
    spark.range(500000).createOrReplaceTempView("jr_big")
    // step 1's full result (500k rows) must NOT be collected: the runner
    // caps intermediate actions at limit(1000), like the reference's
    // show(1000) — Catalyst plans CollectLimit, not a full materialization
    val out = SQLRunner.run(spark, Seq(
      "SELECT * FROM jr_big",
      "SELECT count(*) AS n FROM jr_big"))
    out.collect().head.getLong(0) shouldBe 500000L
  }
}
