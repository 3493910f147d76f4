package graft.expr

import graft.SparkSpec
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types._

class DateComponentsSpec extends SparkSpec {
  import spark.implicits._

  private def derive(values: Seq[String], format: String,
      targets: Seq[String]): Seq[Seq[Any]] = {
    val df = values.toDF("d")
    DateComponents.withComponents(df, "d", format, targets)
      .orderBy("d").drop("d").collect().toSeq.map(_.toSeq)
  }

  test("yyyyMMdd valid and sentinel") {
    val out = derive(Seq("20160601", "garbage"), "yyyyMMdd",
      Seq("year", "month", "day", "week"))
    // 2016-06-01 is day-of-year 153 → aligned week ((153-1)/7)+1 = 22
    out should contain(Seq(2016.toShort, 6.toShort, 1.toShort, 22.toShort))
    out should contain(Seq(9999.toShort, 99.toShort, 99.toShort, 99.toShort))
  }

  test("aligned week differs from ISO week") {
    // 2016-01-01 is a Friday: ISO week is 53 (of 2015); aligned week is 1
    val out = derive(Seq("20160101"), "yyyyMMdd", Seq("week"))
    out.head shouldBe Seq(1.toShort)
  }

  test("yyyyMM valid / invalid month") {
    derive(Seq("201609", "201613"), "yyyyMM", Seq("year", "month")) should
      contain theSameElementsAs Seq(
        Seq(2016.toShort, 9.toShort), Seq(9999.toShort, 99.toShort))
  }

  test("yyyyww keeps literal week, month is sentinel") {
    derive(Seq("201653", "201654"), "yyyyww", Seq("year", "month", "week")) should
      contain theSameElementsAs Seq(
        Seq(2016.toShort, 99.toShort, 53.toShort),
        Seq(9999.toShort, 99.toShort, 99.toShort))
  }

  test("yyyywwe day-of-week digit") {
    derive(Seq("2016531"), "yyyywwe", Seq("year", "week", "day")).head shouldBe
      Seq(2016.toShort, 53.toShort, 1.toShort)
  }

  test("MM/dd/yyyy and timestamp formats") {
    derive(Seq("06/15/2017"), "MM/dd/yyyy", Seq("year", "month", "day")).head shouldBe
      Seq(2017.toShort, 6.toShort, 15.toShort)
    derive(Seq("2017-06-15 13:14:15"), "yyyy-MM-dd HH:mm:ss",
      Seq("year", "month", "day")).head shouldBe
      Seq(2017.toShort, 6.toShort, 15.toShort)
  }
}

class PartitionCriteriaSpec extends SparkSpec {
  import spark.implicits._

  private val df = Seq((2016, 6, "a"), (2016, 7, "b"), (2017, 6, "c"))
    .toDF("year", "month", "v")

  test("OR of ANDs selects matching rows") {
    val crit = Seq(Seq("year" -> 2016, "month" -> 6), Seq("year" -> 2017))
    df.filter(PartitionCriteria.toColumn(crit.map(_.map(x => (x._1, x._2: Any)))))
      .select("v").as[String].collect().sorted shouldBe Array("a", "c")
  }

  test("empty criteria selects nothing, empty conjunction everything") {
    df.filter(PartitionCriteria.toColumn(Seq.empty)).count() shouldBe 0
    df.filter(PartitionCriteria.toColumn(Seq(Seq.empty))).count() shouldBe 3
  }

  test("null criteria values match null-partition rows (null-safe equality)") {
    val withNull = Seq((Some("p1"), "a"), (None, "b"), (Some("p2"), "c"))
      .toDF("p", "v")
    withNull.filter(PartitionCriteria.toColumn(Seq(Seq("p" -> null))))
      .select("v").as[String].collect() shouldBe Array("b")
    // mixed OR: null partition + a concrete one
    withNull.filter(PartitionCriteria.toColumn(
        Seq(Seq("p" -> null), Seq("p" -> "p2"))))
      .select("v").as[String].collect().sorted shouldBe Array("b", "c")
  }

  test("partitionDirName maps null/empty to the Hive default partition dir") {
    PartitionCriteria.partitionDirName("p", null) shouldBe
      "p=__HIVE_DEFAULT_PARTITION__"
    PartitionCriteria.partitionDirName("p", "") shouldBe
      "p=__HIVE_DEFAULT_PARTITION__"
    PartitionCriteria.partitionDirName("p", 7) shouldBe "p=7"
  }
}

class SchemaOpsSpec extends SparkSpec {
  import spark.implicits._

  test("addMissingColumns adds typed nulls, enforce casts and reorders") {
    val df = Seq((1, "x")).toDF("b", "a")
    val target = StructType(Seq(StructField("a", StringType),
      StructField("b", LongType), StructField("c", DoubleType)))
    val out = SchemaOps.enforce(df, target, addMissing = true)
    out.schema.fields.map(f => (f.name, f.dataType)) shouldBe
      Array(("a", StringType), ("b", LongType), ("c", DoubleType))
    out.collect().head.toSeq shouldBe Seq("x", 1L, null)
  }

  test("flatten expands structs and explodes arrays, preserving empties") {
    val df = Seq((1, ("s1", 10), Seq(1, 2)), (2, ("s2", 20), Seq.empty[Int]))
      .toDF("id", "m", "arr")
    val out = SchemaOps.flatten(df)
    out.columns.toSet shouldBe Set("id", "arr", "m___1", "m___2")
    // explode_outer keeps the empty-array row as null
    out.filter($"id" === 2).count() shouldBe 1
    out.filter($"id" === 1).count() shouldBe 2
  }

  test("side-flatten turns arrays into indexed columns") {
    val df = Seq((1, Seq("a", "b", "c"))).toDF("id", "arr")
    val out = SchemaOps.flatten(df, sideFlatten = Map("arr" -> 2))
    out.columns.toSet shouldBe Set("id", "arr__0", "arr__1")
    out.collect().head.toSeq shouldBe Seq(1, "a", "b")
  }

  test("flattenMap expands discovered keys to name__key columns, nulls " +
      "for missing keys") {
    val df = Seq(
      (1, Map("color" -> "red", "size" -> "xl")),
      (2, Map("color" -> "blue")),
      (3, Map.empty[String, String]))
      .toDF("id", "attrs")
    val out = SchemaOps.flattenMap(df, "attrs")
    out.columns.toSeq shouldBe Seq("id", "attrs__color", "attrs__size")
    out.orderBy($"id").collect().map(_.toSeq) shouldBe Array(
      Seq(1, "red", "xl"), Seq(2, "blue", null), Seq(3, null, null))
    // explicit keys skip discovery (no job) and fix the projection
    val explicit = SchemaOps.flattenMap(df, "attrs",
      keys = Seq("size", "brand"))
    explicit.columns.toSeq shouldBe Seq("id", "attrs__size", "attrs__brand")
    explicit.filter($"id" === 1).collect().head.toSeq shouldBe
      Seq(1, "xl", null)
  }

  test("flattenMap sanitizes key renderings and bounds discovery by maxKeys") {
    val df = Seq((1, Map("a.b:c" -> 5, "ok" -> 6))).toDF("id", "m")
    val out = SchemaOps.flattenMap(df, "m")
    out.columns.toSet shouldBe Set("id", "m__a_b_c", "m__ok")
    intercept[IllegalArgumentException] {
      SchemaOps.flattenMap(df, "m", maxKeys = 1)
    }
    intercept[IllegalArgumentException] {
      SchemaOps.flattenMap(df, "id") // not a map column
    }
  }

  test("flattenMap fails fast on post-sanitization name collisions") {
    // 'a.b' and 'a_b' both sanitize to a_b — ambiguous columns later
    val df = Seq((1, Map("a.b" -> 5, "a_b" -> 6))).toDF("id", "m")
    val e = intercept[IllegalArgumentException] {
      SchemaOps.flattenMap(df, "m")
    }
    e.getMessage should include("a.b")
    e.getMessage should include("a_b")
    // an expanded name colliding with an existing column also fails fast
    val df2 = Seq((1, Map("k" -> 5), "x")).toDF("id", "m", "m__k")
    val e2 = intercept[IllegalArgumentException] {
      SchemaOps.flattenMap(df2, "m")
    }
    e2.getMessage should include("m__k")
  }

  test("NestedFlattener mapFlatten opts a struct-nested map into key " +
      "expansion (reference silently ignores MapType)") {
    val df = Seq((1, ("n1", Map("k1" -> 10, "k2" -> 20))))
      .toDF("id", "s")
    // default: the map survives flatten untouched (reference parity)
    val parity = graft.algos.NestedFlattener(df)
    parity.columns.toSet shouldBe Set("id", "s___1", "s___2")
    parity.schema("s___2").dataType.typeName shouldBe "map"
    // opt-in: the struct-nested map surfaces as s___2, then expands
    val out = graft.algos.NestedFlattener(df, mapFlatten = Seq("s___2"))
    out.columns.toSet shouldBe Set("id", "s___1", "s___2__k1", "s___2__k2")
    out.collect().head.toSeq shouldBe Seq(1, "n1", 10, 20)
  }

  test("cleanNames scrubs nested field names without rdd round-trip") {
    val df = spark.createDataFrame(
      java.util.List.of(org.apache.spark.sql.Row(org.apache.spark.sql.Row("v"))),
      StructType(Seq(StructField("outer",
        StructType(Seq(StructField("bad.name#x", StringType)))))))
    val out = SchemaOps.cleanNames(df)
    out.schema.fields.head.dataType.asInstanceOf[StructType]
      .fieldNames.head shouldBe "bad_name_x"
  }
}
