package graft.mutation

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types._

/** Read a table written across schema eras under ONE current schema.
  *
  * Parquet `mergeSchema` only handles the additive case (new nullable
  * column); the reference's fact table carries a `data_version` column
  * (`documents/wifi_measurement_s3_table_schema.md`) precisely because its
  * schema also evolved by RENAME (read-time mapping, no rewrite) and by
  * WIDENING (a value range outgrowing its type, e.g. INT → BIGINT). This
  * reader normalizes each era to the union schema:
  *
  *  - renames: per-era old→new column mapping, applied before unification;
  *  - widening: for a column present in several eras at different numeric
  *    types, every era is cast UP the standard promotion lattice
  *    (byte < short < int < long < float < double) — never down, so no
  *    era loses values;
  *  - additions: columns missing from an era surface as NULL of the final
  *    type (the `mergeSchema` case, handled uniformly).
  *
  * 100 TB shape: this is a read-side view — old partitions are never
  * rewritten. Each era scan keeps its own pushdown/pruning (the casts and
  * renames are projections on top of the scan), and the union is a no-op
  * for execution layout: downstream shuffles see one schema.
  */
object SchemaEvolution {

  /** One schema era of a table.
    * @param path    parquet directory of this era
    * @param renames old-name → new-name read mapping for this era
    * @param tag     value for the era-tag column (e.g. a data_version) */
  final case class Era(
      path: String,
      renames: Map[String, String] = Map.empty,
      tag: String)

  private val rank: Map[DataType, Int] = Map(
    ByteType -> 1, ShortType -> 2, IntegerType -> 3, LongType -> 4,
    FloatType -> 5, DoubleType -> 6)

  /** Widest of two types up the numeric promotion lattice; non-numeric
    * types must agree exactly. */
  private[mutation] def widen(a: DataType, b: DataType): DataType =
    if (a == b) a
    else (rank.get(a), rank.get(b)) match {
      case (Some(ra), Some(rb)) => if (ra >= rb) a else b
      case _ => throw new IllegalArgumentException(
        s"cannot unify era column types ${a.simpleString} and ${b.simpleString}")
    }

  /** Read every era and union them under the widened target schema, with
    * `tagCol` carrying each era's tag. Column order is first-appearance
    * order across eras (tag column last). */
  def readUnified(
      spark: SparkSession,
      eras: Seq[Era],
      tagCol: String = "data_version"): DataFrame = {
    require(eras.nonEmpty, "need at least one era")
    val renamed = eras.map { e =>
      e.renames.foldLeft(spark.read.parquet(e.path)) {
        case (df, (from, to)) => df.withColumnRenamed(from, to)
      }
    }
    val target = scala.collection.mutable.LinkedHashMap.empty[String, DataType]
    renamed.foreach(_.schema.fields.foreach { f =>
      target(f.name) = target.get(f.name).map(widen(_, f.dataType)).getOrElse(f.dataType)
    })
    renamed.zip(eras).map { case (df, era) =>
      val present = df.columns.toSet
      val cols = target.toSeq.map { case (name, dt) =>
        if (present(name)) col(name).cast(dt).as(name)
        else lit(null).cast(dt).as(name)
      } :+ lit(era.tag).as(tagCol)
      df.select(cols: _*)
    }.reduce(_.unionByName(_))
  }
}
