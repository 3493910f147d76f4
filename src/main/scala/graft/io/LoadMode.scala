package graft.io

/** Write dispositions (reference: src/main/scala/com/adidas/analytics/util/LoadMode.scala:9-30).
  * Semantics applied by [[AtomicWriter]]:
  *  - OverwriteTable: replace the whole target directory.
  *  - OverwritePartitions: replace only the partition dirs present in the
  *    incoming data; untouched partitions survive.
  *  - OverwritePartitionsWithAddedColumns: same, but incoming data is first
  *    union-aligned with the existing schema (new columns allowed).
  *  - AppendJoinPartitions: full-outer-join incoming with existing content
  *    of the affected partitions on all common columns.
  *  - AppendUnionPartitions: union incoming with existing content of the
  *    affected partitions.
  */
sealed trait LoadMode
object LoadMode {
  case object OverwriteTable extends LoadMode
  case object OverwritePartitions extends LoadMode
  case object OverwritePartitionsWithAddedColumns extends LoadMode
  case object AppendJoinPartitions extends LoadMode
  case object AppendUnionPartitions extends LoadMode

  def apply(name: String): LoadMode = name match {
    case "OverwriteTable" => OverwriteTable
    case "OverwritePartitions" => OverwritePartitions
    case "OverwritePartitionsWithAddedColumns" => OverwritePartitionsWithAddedColumns
    case "AppendJoinPartitions" => AppendJoinPartitions
    case "AppendUnionPartitions" => AppendUnionPartitions
    case other => throw new IllegalArgumentException(s"load mode: $other")
  }
}
