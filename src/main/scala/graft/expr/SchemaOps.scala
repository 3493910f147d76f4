package graft.expr

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types._

/** Schema alignment / enforcement / flattening helpers.
  *
  * Covers the reference's schema plumbing:
  *  - add-missing-columns-as-typed-nulls
  *    (reference: src/main/scala/com/adidas/analytics/util/DataFrameUtils.scala:88-95)
  *  - select-and-cast enforcement
  *    (reference: src/main/scala/com/adidas/analytics/algo/shared/DataReshapingTask.scala:44-52)
  *  - nested name cleanup + struct/array flattening
  *    (reference: src/main/scala/com/adidas/analytics/algo/NestedFlattener.scala:64-205)
  *
  * All pure Column/select based — no `df.rdd` round-trips (the reference
  * rebuilds the DataFrame via `spark.createDataFrame(df.rdd, newSchema)`,
  * which breaks lineage-based optimizations and forces deserialization).
  */
object SchemaOps {

  /** Append typed null columns for every target field absent from df. */
  def addMissingColumns(df: DataFrame, target: StructType): DataFrame = {
    val present = df.columns.map(_.toLowerCase).toSet
    target.fields.filterNot(f => present(f.name.toLowerCase)).foldLeft(df) {
      (d, f) => d.withColumn(f.name, lit(null).cast(f.dataType))
    }
  }

  /** Project df onto the target schema: keep target columns in target order,
    * cast to target types, drop extras; absent columns are skipped unless
    * `addMissing` (then typed nulls).
    */
  def enforce(df: DataFrame, target: StructType,
      addMissing: Boolean = false): DataFrame = {
    val base = if (addMissing) addMissingColumns(df, target) else df
    val present = base.columns.map(_.toLowerCase).toSet
    val cols = target.fields.toSeq
      .filter(f => present(f.name.toLowerCase))
      .map(f => col(f.name).cast(f.dataType).as(f.name))
    base.select(cols: _*)
  }

  /** Lowercase all top-level column names
    * (reference: algo/loads/DeltaLakeLoad.scala:36).
    */
  def lowercaseColumns(df: DataFrame): DataFrame =
    df.toDF(df.columns.map(_.toLowerCase).toIndexedSeq: _*)

  /** Replace chars-to-replace in nested field names and apply explicit
    * renames, recursively through structs/arrays — implemented as a single
    * select of cast-free expressions (`Column.as`), not an rdd rebuild.
    */
  def cleanNames(df: DataFrame, charsToReplace: String = "[.:#]+",
      replacement: String = "_",
      renames: Map[String, String] = Map.empty): DataFrame = {

    def cleaned(name: String): String =
      renames.getOrElse(name, name.replaceAll(charsToReplace, replacement))

    def rewrite(dt: DataType): DataType = dt match {
      case s: StructType =>
        StructType(s.fields.map(f =>
          f.copy(name = cleaned(f.name), dataType = rewrite(f.dataType))))
      case a: ArrayType => a.copy(elementType = rewrite(a.elementType))
      case other => other
    }

    val cols = df.schema.fields.map { f =>
      col(s"`${f.name}`").cast(rewrite(f.dataType)).as(cleaned(f.name))
    }
    df.select(cols.toIndexedSeq: _*)
  }

  /** Fully flatten: structs become `parent__child` columns (iterated to a
    * fixpoint), arrays are exploded with explode_outer (null/empty-preserving,
    * reference: NestedFlattener.scala:132-140), or side-flattened to indexed
    * columns when `sideFlatten` lists the column.
    */
  def flatten(df: DataFrame, sep: String = "__",
      sideFlatten: Map[String, Int] = Map.empty): DataFrame = {
    var cur = df
    var done = false
    while (!done) {
      val fields = cur.schema.fields
      fields.find(f => f.dataType.isInstanceOf[StructType] ||
          f.dataType.isInstanceOf[ArrayType]) match {
        case None => done = true
        case Some(f) => f.dataType match {
          case st: StructType =>
            val others = fields.filterNot(_.name == f.name)
              .map(x => col(s"`${x.name}`"))
            val expanded = st.fields.map(sf =>
              col(s"`${f.name}`.`${sf.name}`").as(s"${f.name}$sep${sf.name}"))
            cur = cur.select((others ++ expanded).toIndexedSeq: _*)
          case _: ArrayType if sideFlatten.contains(f.name) =>
            val n = sideFlatten(f.name)
            val others = fields.filterNot(_.name == f.name)
              .map(x => col(s"`${x.name}`"))
            val idx = (0 until n).map(i =>
              col(s"`${f.name}`").getItem(i).as(s"${f.name}$sep$i"))
            cur = cur.select((others ++ idx).toIndexedSeq: _*)
          case _: ArrayType =>
            cur = cur.withColumn(f.name, explode_outer(col(s"`${f.name}`")))
        }
      }
    }
    cur
  }

  /** Flatten a MapType column into one `mapCol__<key>` column per key —
    * an opt-in EXCEED over the reference, which silently ignores MapType
    * (reference: algo/NestedFlattener.scala:73-93 — maps match neither the
    * struct nor the array case and pass through untouched).
    *
    * Keys: pass them explicitly (pure — no Spark job), or leave empty to
    * DISCOVER them with one distinct over the column-pruned map keys. The
    * discovery is a deliberate driver-side action whose result size is
    * bounded by the KEY-SPACE cardinality (and `maxKeys`), not by row
    * count — right for config/attribute-style maps, wrong for unbounded
    * per-row key spaces (pass explicit keys there). Missing keys yield
    * typed nulls (`GetMapValue` is null-safe, ANSI mode included). Key
    * renderings are sanitized to identifier chars for the column name;
    * the key order (sorted) fixes the column order deterministically.
    */
  def flattenMap(df: DataFrame, mapCol: String, keys: Seq[Any] = Nil,
      sep: String = "__", maxKeys: Int = 1000): DataFrame = {
    val field = df.schema(mapCol)
    require(field.dataType.isInstanceOf[MapType],
      s"$mapCol is not a MapType column: ${field.dataType.simpleString}")
    val ks: Seq[Any] =
      if (keys.nonEmpty) keys
      else {
        val found = df
          .select(explode(map_keys(col(s"`$mapCol`"))).as("k"))
          .distinct().orderBy("k").limit(maxKeys + 1)
          .collect().map(_.get(0)).toSeq
        require(found.size <= maxKeys,
          s"$mapCol has over $maxKeys distinct keys; pass keys explicitly")
        found
      }
    val others = df.schema.fields.filterNot(_.name == mapCol)
      .map(x => col(s"`${x.name}`")).toSeq
    def clean(k: Any): String = k.toString.replaceAll("[^A-Za-z0-9_]", "_")
    // sanitization is lossy ('a.b' and 'a_b' both render a_b) — fail here
    // with the colliding keys, not later with an ambiguous-column error
    val names = ks.map(k => s"$mapCol$sep${clean(k)}")
    val dupes = ks.zip(names).groupBy(_._2).filter(_._2.size > 1)
    require(dupes.isEmpty, s"map keys collide after sanitization: " +
      dupes.map { case (n, kv) => s"$n <- ${kv.map(_._1).mkString(", ")}" }
        .mkString("; "))
    val clash = names.toSet.intersect(
      df.schema.fields.filterNot(_.name == mapCol).map(_.name).toSet)
    require(clash.isEmpty,
      s"expanded map columns collide with existing columns: " +
        clash.mkString(", "))
    val expanded = ks.zip(names).map { case (k, n) =>
      col(s"`$mapCol`").getItem(k).as(n) }
    df.select((others ++ expanded): _*)
  }
}
