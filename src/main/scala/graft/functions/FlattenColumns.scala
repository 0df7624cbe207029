package graft.functions

import org.apache.spark.sql.Column
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types._

/** Record flattening as a Catalyst select-list (reference utils.py:34-62).
  *
  * Nested structs expand into `parent__child` columns; arrays become their
  * Python-repr string (see [[PyRepr]]); scalars pass through. Because this
  * is pure column projection, Catalyst prunes unread nested fields at the
  * parquet scan and the whole flatten runs inside WholeStageCodegen (except
  * the array-repr UDF cell) — no per-row driver work, fully partition-
  * parallel at any scale.
  */
object FlattenColumns {
  val Sep = "__"

  /** Select-list flattening `root` (a struct column with `schema`). */
  def columns(root: Column, schema: StructType, parentKey: String = ""): Seq[Column] =
    schema.fields.toSeq.flatMap { f =>
      val name = if (parentKey.isEmpty) f.name else parentKey + Sep + f.name
      val child = root.getField(f.name)
      f.dataType match {
        case st: StructType => columns(child, st, name)
        case _: ArrayType => Seq(PyRepr.pyRepr(child).as(name))
        case _: MapType => Seq(PyRepr.pyRepr(child).as(name))
        case _ => Seq(child.as(name))
      }
    }

  /** Flattened output schema (for tests / downstream planning). */
  def flatSchema(schema: StructType, parentKey: String = ""): StructType =
    StructType(schema.fields.toSeq.flatMap { f =>
      val name = if (parentKey.isEmpty) f.name else parentKey + Sep + f.name
      f.dataType match {
        case st: StructType => flatSchema(st, name).fields
        case _: ArrayType | _: MapType => Seq(StructField(name, StringType, nullable = true))
        case dt => Seq(StructField(name, dt, nullable = true))
      }
    })
}
