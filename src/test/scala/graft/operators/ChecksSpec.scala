package graft.operators

import graft.SparkSpec
import org.apache.spark.sql.functions._

/** [[Checks]] — declarative data-quality validation. */
class ChecksSpec extends SparkSpec {
  import spark.implicits._

  private def frame = Seq(
    (Some(1L), Some(10.0), Some("A")),
    (Some(2L), Some(200.0), Some("B")), // out of range, bad flag
    (Some(2L), None, Some("A")),        // dup id, null value
    (None, Some(5.0), None))            // null id, null flag
    .toDF("id", "v", "flag")

  test("each rule class counts its violations; passed = zero") {
    val dim = Seq(1L, 2L).toDF("k")
    val out = Checks.run(frame, Seq(
      Checks.notNull("id"),
      Checks.inRange("v", 0, 100),
      Checks.matches("flag", "^[AB]$"),
      Checks.unique("id"),
      Checks.referential("id", dim, "k")))
      .collect().map(r => r.getString(0) ->
        (r.getLong(1), r.getLong(2), r.getBoolean(3))).toMap
    out("not_null(id)") shouldBe ((1L, 4L, false))
    out("in_range(v,0.0,100.0)") shouldBe ((2L, 4L, false)) // 200 + null
    out("matches(flag)") shouldBe ((1L, 4L, false))         // null flag
    out("unique(id)") shouldBe ((1L, 4L, false))            // one extra 2
    out("referential(id)") shouldBe ((1L, 4L, false))       // the null id
  }

  test("clean data passes everything; allPassed gates") {
    val clean = Seq((1L, 5.0), (2L, 6.0)).toDF("id", "v")
    val res = Checks.run(clean,
      Seq(Checks.notNull("id"), Checks.inRange("v", 0, 10),
        Checks.unique("id")))
    res.collect().map(_.getBoolean(3)).forall(identity) shouldBe true
    Checks.allPassed(res) shouldBe true
    Checks.allPassed(Checks.run(clean,
      Seq(Checks.inRange("v", 0, 1)))) shouldBe false
  }

  test("satisfies: arbitrary predicate, null predicate counts violated") {
    val out = Checks.run(frame,
      Seq(Checks.satisfies("v_lt_flagless", $"v" < 100)))
      .collect().head
    // 200 violates; the null v row's predicate is null -> violated
    out.getLong(1) shouldBe 2L
  }

  test("all row-level rules fold into one aggregation pass") {
    val res = Checks.run(frame, Seq(
      Checks.notNull("id"), Checks.inRange("v", 0, 100),
      Checks.matches("flag", "^[AB]$"), Checks.satisfies("p", $"v" > 0)))
    // 4 rules, 1 scan: exactly one scan of the input in the plan
    val scans = res.queryExecution.executedPlan.toString
      .linesIterator.count(_.contains("LocalTableScan"))
    scans shouldBe 1
  }

  test("columnProfile: one row per column with null counts and exact " +
      "distincts from a single pass") {
    val df = Seq(
      (Some(1L), Some("en")), (Some(2L), Some("en")),
      (Some(2L), None), (None, Some("fr")))
      .toDF("id", "lang")
    val out = Checks.columnProfile(df, Seq("id", "lang"))
      .as[(String, Long, Long, Long, Option[Double])].collect()
      .map(r => r._1 -> r).toMap
    out("id") shouldBe (("id", 4L, 1L, 2L, Some(0.25)))
    out("lang") shouldBe (("lang", 4L, 1L, 2L, Some(0.25)))
  }

  test("keyReconciliation: distinct keys per side, shared and orphan " +
      "counts in both directions, null keys excluded") {
    val left = Seq(Some(1L), Some(2L), Some(2L), Some(3L), None)
      .toDF("doc_id")
    val right = Seq(Some(2L), Some(3L), Some(3L), Some(9L), None)
      .toDF("vec_id")
    val out = Checks.keyReconciliation(left, right, "doc_id", "vec_id")
      .as[(Long, Long, Long, Long, Long)].head()
    // left keys {1,2,3}, right keys {2,3,9}: shared {2,3}
    out shouldBe ((3L, 3L, 2L, 1L, 1L))
  }

  test("kAnonymityReport: hand-computed class sizes, nulls form their " +
      "own class, min_class_size >= k iff no risky class") {
    val df = Seq(
      (Some("en"), "web"), (Some("en"), "web"), (Some("en"), "web"),
      (Some("de"), "web"), (Some("de"), "web"),
      (Some("fr"), "book"),          // singleton -> risky at k=2
      (None, "web"), (None, "web"))  // null lang groups together
      .toDF("lang", "source")
    val out = Checks.kAnonymityReport(df, Seq("lang", "source"), k = 2)
      .as[(Long, Long, Long, Long, Long, Option[Double])].head()
    // classes: en/web=3, de/web=2, fr/book=1, null/web=2
    out shouldBe ((8L, 4L, 1L, 1L, 1L, Some(0.125)))
    // k above every class size: everything risky
    val all = Checks.kAnonymityReport(df, Seq("lang", "source"), k = 10)
      .as[(Long, Long, Long, Long, Long, Option[Double])].head()
    all shouldBe ((8L, 4L, 1L, 4L, 8L, Some(1.0)))
    // anonymized-enough data: zero risky classes
    val safe = Checks.kAnonymityReport(df.filter($"lang" === "en"),
      Seq("lang", "source"), k = 2)
      .as[(Long, Long, Long, Long, Long, Option[Double])].head()
    safe shouldBe ((3L, 1L, 3L, 0L, 0L, Some(0.0)))
    an[IllegalArgumentException] should be thrownBy
      Checks.kAnonymityReport(df, Seq("lang", "source"), k = 1)
    an[IllegalArgumentException] should be thrownBy
      Checks.kAnonymityReport(df, Seq("lang", "lang"), k = 2)
  }

  test("fkMatrix: per-edge orphan keys vs orphan rows, null child keys " +
      "excluded, intact edge reports zeros") {
    val parent = Seq(1L, 2L).toDF("pk")
    val child = Seq(Some(1L), Some(1L), Some(2L), Some(9L), Some(9L),
      Some(9L), None).toDF("fk")
    val out = Checks.fkMatrix(Seq(
      Checks.FkEdge("bad", child, "fk", parent, "pk"),
      Checks.FkEdge("good", parent, "pk", parent, "pk")))
      .as[(String, Long, Long, Long, Long)].collect()
      .map(r => r._1 -> (r._2, r._3, r._4, r._5)).toMap
    // keys {1,2,9}: 9 is orphaned with 3 rows; the null fk never counts
    out("bad") shouldBe ((6L, 3L, 1L, 3L))
    out("good") shouldBe ((2L, 2L, 0L, 0L))
    an[IllegalArgumentException] should be thrownBy
      Checks.fkMatrix(Seq(
        Checks.FkEdge("x", child, "fk", parent, "pk"),
        Checks.FkEdge("x", child, "fk", parent, "pk")))
  }

  test("lDiversityReport: homogeneous class is risky even when k-anonymous;" +
      " null sensitive values add no diversity") {
    val df = Seq(
      // class A: 3 rows, 3 distinct diagnoses -> diverse
      ("en", "a", Some("flu")), ("en", "a", Some("cold")),
      ("en", "a", Some("cough")),
      // class B: 3 rows (k-anonymous at k=3) but ONE diagnosis -> risky
      ("de", "b", Some("flu")), ("de", "b", Some("flu")),
      ("de", "b", Some("flu")),
      // class C: 2 distinct + a null (null must not count as a value)
      ("fr", "c", Some("flu")), ("fr", "c", Some("cold")),
      ("fr", "c", None))
      .toDF("lang", "source", "diag")
    val out = Checks.lDiversityReport(df, Seq("lang", "source"), "diag",
      l = 3).as[(Long, Long, Long, Long, Long, Option[Double])].head()
    // diversities: A=3, B=1, C=2 -> risky classes B and C; risky ROWS
    // count class sizes (C's null-diagnosis row is still a row): 3+3=6
    out shouldBe ((9L, 3L, 1L, 2L, 6L, Some(BigDecimal(6.0 / 9)
      .setScale(6, BigDecimal.RoundingMode.HALF_UP).toDouble)))
    val safe = Checks.lDiversityReport(df, Seq("lang", "source"), "diag",
      l = 2).as[(Long, Long, Long, Long, Long, Option[Double])].head()
    safe._4 shouldBe 1L // only the homogeneous class stays risky at l=2
    an[IllegalArgumentException] should be thrownBy
      Checks.lDiversityReport(df, Seq("lang", "diag"), "diag", l = 2)
    an[IllegalArgumentException] should be thrownBy
      Checks.lDiversityReport(df, Seq("lang"), "diag", l = 1)
  }

  test("LDiversity runs through the params surface") {
    val base = tmp("ldiv_params")
    Seq(("en", "flu"), ("en", "cold"), ("de", "flu"), ("de", "flu"))
      .toDF("lang", "diag").write.parquet(s"$base/rows")
    val f = java.nio.file.Paths.get(base, "LDiversity.json")
    java.nio.file.Files.writeString(f,
      s"""{"source_dir": "$base/rows", "target_dir": "$base/out",
         | "quasi_columns": ["lang"], "sensitive_column": "diag",
         | "l": 2}""".stripMargin)
    graft.core.JobRunner.execute(spark, "LDiversity", f.toString)
    val got = spark.read.parquet(s"$base/out")
    got.select($"n_risky_classes").head.getLong(0) shouldBe 1L
  }

  test("parseRule round-trips the params-JSON surface") {
    Checks.parseRule("not_null:id").name shouldBe "not_null(id)"
    Checks.parseRule("in_range:v:0:100").name shouldBe
      "in_range(v,0.0,100.0)"
    Checks.parseRule("matches:flag:^[A:B]$").name shouldBe "matches(flag)"
    Checks.parseRule("unique:a,b").name shouldBe "unique(a,b)"
    an[IllegalArgumentException] should be thrownBy
      Checks.parseRule("nope:x")
  }
}
