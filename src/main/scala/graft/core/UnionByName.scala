package graft.core

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions.{col, lit}
import org.apache.spark.sql.types._

/** UNION ALL BY NAME with supercast widening — the reference's key
  * heterogeneous-archive operator (union_by_name.rs:45-119; SQL surface
  * docs sql/union-by-name.md).
  *
  * Spark's `unionByName(allowMissingColumns = true)` does name matching
  * and NULL-fill but refuses type widening; here each input is projected
  * to the merged super-schema (cast where the type differs, typed NULL
  * where the column is missing) and then unioned positionally. The
  * projections are narrow `Project` nodes over each child — Catalyst
  * still pushes filters/pruning through them, and no shuffle is
  * introduced (union is a no-shuffle operator in Spark).
  */
object UnionByName {

  def apply(dfs: Seq[DataFrame]): DataFrame = {
    require(dfs.nonEmpty, "unionByNameSupercast of no inputs")
    val merged = SuperType.superTypeSchema(dfs.map(_.schema))
    dfs.map(project(_, merged)).reduce(_ union _)
  }

  /** Project df onto the merged schema: pass-through, cast, or typed NULL. */
  def project(df: DataFrame, merged: StructType): DataFrame = {
    val present = df.schema.fields.map(f => f.name -> f.dataType).toMap
    val cols = merged.fields.map { target =>
      present.get(target.name) match {
        case Some(t) if t == target.dataType => col(quote(target.name))
        case Some(_) => col(quote(target.name)).cast(target.dataType).as(target.name)
        case None    => lit(null).cast(target.dataType).as(target.name)
      }
    }
    df.select(cols.toIndexedSeq: _*)
  }

  /** Column names may contain dots (ND attribute columns like
    * "temperature.units" — SURVEY §1.3); always backtick-quote. */
  private def quote(name: String): String = "`" + name.replace("`", "``") + "`"
}
