package graft.nd

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.catalyst.expressions.{Expression, UnaryExpression}
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.graft.ColumnBridge
import org.apache.spark.sql.types._

/** Table → grid pivot: the core of the reference's `ndnetcdf` output
  * (query/output.rs:205-221): chosen columns become output dimensions,
  * remaining numeric columns become variables on the dense grid built
  * from the distinct dimension values.
  *
  * Two-pass, Spark-idiomatic replacement for the reference's
  * UniqueValuesExec side channel (unique_values.rs): pass 1 collects
  * the distinct values per dimension column (sorted ascending — these
  * become the coordinate variables and are small by construction);
  * pass 2 maps every row to its C-order grid slot. Cells the table
  * doesn't cover stay NaN (→ _FillValue on write); duplicate coverage
  * resolves to the max value per cell (deterministic — collect order
  * is partition-dependent, so "last write wins" would not be).
  *
  * The gather in pass 2 runs distributed; only the (dims + values)
  * pairs collect to the driver, sized by the grid — the same bound the
  * reference accepts for its NetCDF writer (single-file writers are
  * inherently driver-side, SURVEY §7.3.6).
  */
object NdPivot {

  def pivot(df: DataFrame, dimCols: Seq[String]): NdDataset = {
    require(dimCols.nonEmpty, "ndnetcdf needs at least one dimension column")
    val varCols = df.schema.fields
      .filterNot(f => dimCols.contains(f.name))
      .filter(f => f.dataType.isInstanceOf[NumericType])
      .map(_.name).toSeq
    require(varCols.nonEmpty, "no numeric variable columns to pivot")

    // pass 1: distinct coordinate values per dimension (sorted). NULL
    // coordinates are rejected explicitly — a null has no grid slot, and
    // letting it through would NPE deep in the gather.
    val coords: Seq[Array[Double]] = dimCols.map { d =>
      val rows = df.select(col(d).cast(DoubleType)).distinct()
        .orderBy(col(d)).collect()
      if (rows.exists(_.isNullAt(0)))
        throw new IllegalArgumentException(
          s"ndnetcdf dimension column '$d' contains NULL values; " +
            "filter them out or choose a complete column")
      rows.map(_.getDouble(0))
    }
    val sizes = coords.map(_.length)
    val n = sizes.map(_.toLong).product
    require(n < Int.MaxValue, s"grid too large to materialize: $n cells")

    // pass 2: row → C-order slot; gather executes distributed, only the
    // slot/value pairs land on the driver
    val strides = new Array[Long](dimCols.length)
    var acc = 1L
    for (i <- dimCols.indices.reverse) { strides(i) = acc; acc *= sizes(i) }

    // coordinate → slot index is a codegen binary search over the sorted
    // coordinate array (a codegen reference object) — no per-row udf
    // boxing, and the whole gather projection stays in WholeStageCodegen
    val slotExpr = dimCols.zipWithIndex.map { case (d, i) =>
      ColumnBridge.column(SortedIndexOf(
        ColumnBridge.expression(col(d).cast(DoubleType)), coords(i))) * strides(i)
    }.reduce(_ + _)

    // duplicate grid coverage resolves deterministically (max per cell)
    // — collect() order is partition-dependent, so "last row wins" would
    // be nondeterministic across runs
    val gathered = df
      .select(slotExpr.cast(LongType).as("__slot") +:
        varCols.map(c => col(c).cast(DoubleType).as(c)): _*)
      .groupBy(col("__slot"))
      .agg(varCols.map(c => max(col(c)).as(c)).head,
        varCols.map(c => max(col(c)).as(c)).tail: _*)
      .collect()

    val arrays = varCols.map(_ => Array.fill(n.toInt)(Double.NaN))
    gathered.foreach { row =>
      val slot = row.getLong(0)
      if (slot >= 0) {
        var i = 0
        while (i < varCols.length) {
          if (!row.isNullAt(i + 1)) arrays(i)(slot.toInt) = row.getDouble(i + 1)
          i += 1
        }
      }
    }

    val dimDefs = dimCols.zip(sizes)
    val coordVars = dimCols.zip(coords).map { case (d, c) => NdVariable(d, Seq(d), c) }
    val dataVars = varCols.zip(arrays).map { case (name, data) =>
      NdVariable(name, dimCols, data,
        attrs = Map("_FillValue" -> "NaN"))
    }
    NdDataset(dimDefs, coordVars ++ dataVars)
  }

  /** Index of `child` in the sorted distinct coordinate array, -1 when
    * absent — `java.util.Arrays.binarySearch` on a codegen reference
    * object: O(log n) per row at any dimension cardinality, and (unlike
    * the ScalaUDF it replaces) it keeps the pivot's gather projection
    * inside WholeStageCodegen. */
  private[graft] case class SortedIndexOf(child: Expression, sorted: Array[Double])
      extends UnaryExpression {
    override def dataType: DataType = IntegerType
    override def prettyName: String = "sorted_index_of"
    override def nullSafeEval(v: Any): Any = {
      val i = java.util.Arrays.binarySearch(sorted, v.asInstanceOf[Double])
      if (i >= 0) i else -1
    }
    override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode = {
      val arr = ctx.addReferenceObj("sortedCoords", sorted, "double[]")
      nullSafeCodeGen(ctx, ev, v => {
        val i = ctx.freshName("i")
        s"""
          int $i = java.util.Arrays.binarySearch($arr, $v);
          ${ev.value} = $i >= 0 ? $i : -1;
        """
      })
    }
    override protected def withNewChildInternal(c: Expression): Expression =
      copy(child = c)
  }
}
