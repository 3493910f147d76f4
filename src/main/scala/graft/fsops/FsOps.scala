package graft.fsops

import org.apache.hadoop.conf.Configuration
import org.apache.hadoop.fs.{FileSystem, Path}
import java.time.format.DateTimeFormatter
import java.time.{ZoneOffset, ZonedDateTime}
import scala.collection.parallel.CollectionConverters._

/** Hadoop FileSystem choreography: the reference concentrates its
  * transactional value in driver-side FS moves
  * (reference: src/main/scala/com/adidas/analytics/util/HadoopLoadHelper.scala,
  * util/DFSWrapper.scala). This is the equivalent surface: list, move-all,
  * backup/restore of partition directories, timestamped dir naming,
  * ordered-version retention. Moves of sibling dirs are parallelized on the
  * driver (renames are O(1) metadata ops on HDFS/posix; the parallelism is
  * for many-partition loads where serial RPC latency dominates).
  */
class FsOps(conf: Configuration) {

  def fs(path: Path): FileSystem = path.getFileSystem(conf)

  def exists(p: String): Boolean = { val pp = new Path(p); fs(pp).exists(pp) }

  def mkdirs(p: String): Unit = { val pp = new Path(p); fs(pp).mkdirs(pp) }

  def deleteAll(p: String): Unit = {
    val pp = new Path(p)
    val f = fs(pp)
    if (f.exists(pp)) f.delete(pp, true)
  }

  /** Immediate children (names) of a directory. */
  def ls(p: String): Seq[String] = {
    val pp = new Path(p)
    val f = fs(pp)
    if (!f.exists(pp)) Seq.empty
    else f.listStatus(pp).toSeq.map(_.getPath.getName)
  }

  def listFilesRecursive(p: String): Seq[String] = {
    val pp = new Path(p)
    val f = fs(pp)
    if (!f.exists(pp)) return Seq.empty
    val it = f.listFiles(pp, true)
    val buf = scala.collection.mutable.ArrayBuffer.empty[String]
    while (it.hasNext) buf += it.next().getPath.toString
    buf.toSeq
  }

  /** Move src dir/file to dest (dest parent created). Fails if dest exists. */
  def move(src: String, dest: String): Unit = {
    val s = new Path(src); val d = new Path(dest)
    val f = fs(s)
    if (!f.exists(d.getParent)) f.mkdirs(d.getParent)
    if (!f.rename(s, d))
      throw new java.io.IOException(s"rename failed: $src -> $dest")
  }

  /** Move every named child from srcRoot to destRoot, in parallel. */
  def moveChildren(children: Seq[String], srcRoot: String,
      destRoot: String): Unit =
    children.par.foreach(c => move(s"$srcRoot/$c", s"$destRoot/$c"))

  def writeFile(p: String, content: String): Unit = {
    val pp = new Path(p)
    val out = fs(pp).create(pp, true)
    try out.write(content.getBytes("UTF-8")) finally out.close()
  }

  def readFile(p: String): String = {
    val pp = new Path(p)
    val in = fs(pp).open(pp)
    try new String(in.readAllBytes(), "UTF-8") finally in.close()
  }

  /** Timestamped sibling dir name, reference's ordered-version scheme
    * (reference: HadoopLoadHelper.scala:14-27).
    */
  def timestampedDir(base: String): String =
    base + "_" + ZonedDateTime.now(ZoneOffset.UTC)
      .format(DateTimeFormatter.ofPattern("yyyyMMddHHmmssSSS"))

  /** Keep the newest `retain` ordered version dirs matching `prefix_`,
    * delete the rest (reference: HadoopLoadHelper.scala:99-117).
    */
  def cleanupOldVersions(parent: String, prefix: String, retain: Int): Unit = {
    val versions = ls(parent).filter(_.startsWith(prefix + "_")).sorted
    versions.dropRight(retain).foreach(v => deleteAll(s"$parent/$v"))
  }
}
