package graft.engine

import org.apache.spark.sql.types.{ArrayType, DataType, MapType, StructType}

/** Shared type predicates (r16 — one definition, two doors: the
  * as-of broadcast rewrite's "can this sort?" and ANALYZE's "can
  * count(distinct) group this?" are the same Spark fact, MAP anywhere
  * in a type makes it un-orderable/un-groupable). */
object Schemas {

  /** True when `dt` carries no MapType anywhere — the Spark
    * orderability/groupability boundary: maps cannot sort, group, or
    * `count(distinct)`. */
  private[graft] def mapFree(dt: DataType): Boolean = dt match {
    case _: MapType => false
    case s: StructType => s.fields.forall(f => mapFree(f.dataType))
    case a: ArrayType => mapFree(a.elementType)
    case _ => true
  }
}
