package graft.config

import com.fasterxml.jackson.databind.ObjectMapper
import com.fasterxml.jackson.module.scala.DefaultScalaModule
import graft.fsops.FsOps

/** Algorithm parameter files ("acon" JSON in the reference,
  * reference: src/main/scala/com/adidas/analytics/config/shared/ConfigurationContext.scala:13-17,
  * util/ConfigReader.scala:8-49). The reference parses with
  * `scala.util.parsing.json` (removed from the 2.13 stdlib); we use the
  * jackson-scala module that ships with Spark. Values are a plain
  * `Map[String, Any]` with typed accessors, same access pattern as the
  * reference's ConfigReader.
  */
final class JsonConfig(val values: Map[String, Any]) {

  def get[T](key: String): T =
    values.getOrElse(key, throw new NoSuchElementException(
      s"missing config key: $key")).asInstanceOf[T]

  def getOpt[T](key: String): Option[T] =
    values.get(key).map(_.asInstanceOf[T])

  def getString(key: String): String = get[Any](key).toString
  def getStringOpt(key: String): Option[String] =
    values.get(key).map(_.toString)

  def getInt(key: String): Int = get[Any](key) match {
    case n: Int => n
    case n: Number => n.intValue()
    case s: String => s.toInt
  }
  def getIntOpt(key: String): Option[Int] =
    values.get(key).map { case n: Number => n.intValue(); case s => s.toString.toInt }

  /** Required long (token budgets overflow Int at corpus scale). */
  def getLong(key: String): Long = get[Any](key) match {
    case n: Number => n.longValue()
    case s: String => s.toLong
  }

  def getDouble(key: String, default: Double): Double =
    values.get(key).map {
      case n: Number => n.doubleValue()
      case s => s.toString.toDouble
    }.getOrElse(default)

  /** Required double — a missing key fails with the key name, not with
    * whatever downstream validation rejects a sentinel default.
    */
  def getDouble(key: String): Double = get[Any](key) match {
    case n: Number => n.doubleValue()
    case s => s.toString.toDouble
  }

  def getBoolean(key: String, default: Boolean = false): Boolean =
    values.get(key).map {
      case b: Boolean => b
      case s => s.toString.toBoolean
    }.getOrElse(default)

  def getSeq[T](key: String): Seq[T] = values.get(key) match {
    case Some(l: Seq[_]) => l.asInstanceOf[Seq[T]]
    case Some(l: java.util.List[_]) =>
      scala.jdk.CollectionConverters.ListHasAsScala(l).asScala.toSeq
        .asInstanceOf[Seq[T]]
    case None => Seq.empty
    case Some(other) => throw new IllegalArgumentException(
      s"$key is not a list: $other")
  }
}

object JsonConfig {
  private val mapper = new ObjectMapper().registerModule(DefaultScalaModule)

  def parse(json: String): JsonConfig =
    new JsonConfig(mapper.readValue(json, classOf[Map[String, Any]]))

  def fromFile(fsOps: FsOps, path: String): JsonConfig =
    parse(fsOps.readFile(path))
}
