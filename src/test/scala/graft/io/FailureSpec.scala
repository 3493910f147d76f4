package graft.io

import graft.SparkSpec
import graft.fsops.FsOps

/** Mid-write failure injection: the write must leave the target exactly as
  * it was (reference behavior: FailFastIntegrationTest — metadata and data
  * safety on failure).
  */
class AtomicWriterFailureSpec extends SparkSpec {
  import spark.implicits._

  /** FsOps that throws on the FIRST move whose destination matches —
    * one-shot, so the subsequent rollback moves succeed (a persistent FS
    * outage would defeat any restore logic).
    */
  private class FailingFsOps(failOnDest: String)
      extends FsOps(spark.sparkContext.hadoopConfiguration) {
    private var fired = false
    override def move(src: String, dest: String): Unit = {
      if (!fired && dest.contains(failOnDest)) {
        fired = true
        throw new java.io.IOException(s"injected failure moving to $dest")
      }
      super.move(src, dest)
    }
  }

  private def readTarget(dir: String) =
    spark.read.option("basePath", dir).parquet(dir)
      .select($"v", $"p".cast("string")).as[(Int, String)].collect().sorted

  test("partition merge failure restores backed-up partitions") {
    val dir = tmp("awf") + "/t"
    val good = new AtomicWriter(
      new FsOps(spark.sparkContext.hadoopConfiguration), Seq("p"), None)
    good.write(Seq((1, "p1"), (5, "p2")).toDF("v", "p"), DataFormat.Parquet,
      dir, LoadMode.OverwritePartitions)
    // fail when installing the new p=p2 partition dir (p=p1 already swapped)
    val failing = new AtomicWriter(new FailingFsOps(s"$dir/p=p2"),
      Seq("p"), None)
    an[Exception] should be thrownBy failing.write(
      Seq((2, "p1"), (99, "p2")).toDF("v", "p"), DataFormat.Parquet,
      dir, LoadMode.OverwritePartitions)
    // target content unchanged: both original partitions restored
    readTarget(dir) shouldBe Array((1, "p1"), (5, "p2"))
  }

  test("failure rollback also removes freshly installed NEW partitions") {
    val dir = tmp("awf3") + "/t"
    val good = new AtomicWriter(
      new FsOps(spark.sparkContext.hadoopConfiguration), Seq("p"), None)
    good.write(Seq((1, "p1")).toDF("v", "p"), DataFormat.Parquet,
      dir, LoadMode.OverwritePartitions)
    // incoming has existing p1 + brand-new p2; fail installing p1 so p2
    // (whatever the install order) must not survive as a partial commit
    val failing = new AtomicWriter(new FailingFsOps(s"$dir/p=p1"),
      Seq("p"), None)
    an[Exception] should be thrownBy failing.write(
      Seq((2, "p1"), (99, "p2")).toDF("v", "p"), DataFormat.Parquet,
      dir, LoadMode.OverwritePartitions)
    readTarget(dir) shouldBe Array((1, "p1"))
  }

  test("whole-table overwrite failure restores the previous table") {
    val dir = tmp("awf2") + "/t"
    val fsOps = new FsOps(spark.sparkContext.hadoopConfiguration)
    val good = new AtomicWriter(fsOps, Seq.empty, Some(1))
    good.write(Seq((1, "a")).toDF("k", "x"), DataFormat.Parquet, dir,
      LoadMode.OverwriteTable)
    // fail only the first move of tmp -> target (dest == exact target dir);
    // the rollback's backup -> target move must then succeed
    val failing = new AtomicWriter(
      new FsOps(spark.sparkContext.hadoopConfiguration) {
        private var fired = false
        override def move(src: String, dest: String): Unit =
          if (!fired && dest == dir) {
            fired = true; throw new java.io.IOException("injected")
          } else super.move(src, dest)
      }, Seq.empty, Some(1))
    an[Exception] should be thrownBy failing.write(
      Seq((2, "b")).toDF("k", "x"), DataFormat.Parquet, dir,
      LoadMode.OverwriteTable)
    spark.read.parquet(dir).as[(Int, String)].collect() shouldBe
      Array((1, "a"))
  }
}
