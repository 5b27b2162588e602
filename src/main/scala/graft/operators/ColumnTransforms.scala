package graft.operators

import graft.model.{CdcColumn, CdcEvent}

/** §2.10: the reference DECLARES a table/column transformation surface
  * (TableMapping, ColumnTransformation, TransformationType, excluded
  * columns — config.rs:238-293,516-522,698-744) but never wires it into
  * the pipeline. Here the declared API is made real: event-level
  * transforms applied between source and sink, where `withColumn`-style
  * logic would sit in a flat pipeline.
  *
  * Operating on the event images (not flattened columns) keeps the
  * engine schema-fluid — one transform config serves every table shape.
  */
sealed trait ColumnTransform extends Serializable {
  def apply(value: String): String
}
object ColumnTransform {
  case object Identity extends ColumnTransform { def apply(v: String): String = v }
  case object Uppercase extends ColumnTransform {
    def apply(v: String): String = if (v == null) null else v.toUpperCase
  }
  case object Lowercase extends ColumnTransform {
    def apply(v: String): String = if (v == null) null else v.toLowerCase
  }
  final case class StaticValue(value: String) extends ColumnTransform {
    def apply(v: String): String = value
  }
  case object Nullify extends ColumnTransform { def apply(v: String): String = null }
  /** TransformationType::Function analog: arbitrary pure fn. */
  final case class Fn(f: String => String) extends ColumnTransform {
    def apply(v: String): String = f(v)
  }
}

/** Per-table mapping: rename target, excluded columns, column transforms
  * (TableMapping in config.rs:238-293). */
final case class TableMapping(
    targetSchema: Option[String] = None,
    targetTable: Option[String] = None,
    excludedColumns: Set[String] = Set.empty,
    transforms: Map[String, ColumnTransform] = Map.empty) extends Serializable

object ColumnTransforms {

  /** Bulk-path (Column DSL) form of the mapping, for DataFrame pipelines
    * where rows must stay rows: a codegen'd `filter` + `transform` over
    * an envelope image column (array<struct<name, value, isBinary>>) —
    * exclusions drop elements, per-column transforms rewrite values via
    * a folded CASE on the column name. No UDF, no deserialization.
    * `Fn` transforms carry arbitrary Scala and stay event-level — they
    * are rejected here. */
  def imageColumn(img: org.apache.spark.sql.Column,
                  m: TableMapping): org.apache.spark.sql.Column = {
    require(!m.transforms.values.exists(_.isInstanceOf[ColumnTransform.Fn]),
      "Fn transforms are event-level only (arbitrary Scala cannot codegen)")
    if (m.excludedColumns.isEmpty && m.transforms.isEmpty) return img
    // one native codegen'd pass (graft.expressions.ImageTransform) —
    // the previous `filter` + `transform` higher-order pair was
    // CodegenFallback, interpreted per element per row (~60% of
    // cdc_transforms' wall time at sf0.1); element semantics are
    // identical, null corners included
    val specs = m.transforms.toSeq.collect {
      case (n, ColumnTransform.Uppercase) => (n, 1, None)
      case (n, ColumnTransform.Lowercase) => (n, 2, None)
      case (n, ColumnTransform.StaticValue(v)) => (n, 3, Option(v))
      case (n, ColumnTransform.Nullify) => (n, 4, None)
      // Identity entries fold to the element's own value — omit
    }
    org.apache.spark.sql.GraftColumnBridge.column(
      graft.expressions.ImageTransform(
        org.apache.spark.sql.GraftColumnBridge.expression(img),
        m.excludedColumns.toSeq, specs.map(_._1), specs.map(_._2),
        specs.map(_._3)))
  }

  private def transformImage(cols: Seq[CdcColumn], m: TableMapping): Seq[CdcColumn] =
    cols.filterNot(c => m.excludedColumns.contains(c.name)).map { c =>
      m.transforms.get(c.name) match {
        case Some(t) => c.copy(value = t(c.value))
        case None => c
      }
    }

  /** Apply the configured mapping for the event's (schema, table), if
    * any; identity otherwise. Key format "schema.table" or "table". */
  def apply(mappings: Map[String, TableMapping])(e: CdcEvent): CdcEvent = {
    val key = Option(e.schema).map(s => s"$s.${e.table}").getOrElse(e.table)
    mappings.get(key).orElse(mappings.get(e.table)) match {
      case None => e
      case Some(m) =>
        e.copy(
          schema = m.targetSchema.getOrElse(e.schema),
          table = m.targetTable.getOrElse(e.table),
          before = transformImage(e.before, m),
          after = transformImage(e.after, m))
    }
  }
}
