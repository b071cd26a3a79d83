/* Lives under org.apache.spark.sql to reach private[sql] plumbing:
 * Dataset.ofRows and the HadoopFsRelation/LogicalRelation constructors.
 * Used by table-format sources (Delta) to plan a log-defined file set as
 * ONE parquet relation whose partition pruning runs against an in-memory
 * manifest instead of a per-partition Union fan. */
package org.apache.spark.sql.graft

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.catalyst.plans.logical.LogicalPlan
import org.apache.spark.sql.classic
import org.apache.spark.sql.execution.datasources.{FileIndex, HadoopFsRelation, LogicalRelation}
import org.apache.spark.sql.execution.datasources.parquet.ParquetFileFormat
import org.apache.spark.sql.types.StructType

object RelationBridge {

  def ofRows(spark: SparkSession, plan: LogicalPlan): DataFrame =
    classic.Dataset.ofRows(spark.asInstanceOf[classic.SparkSession], plan)

  /** One parquet `HadoopFsRelation` over an explicit [[FileIndex]].
    * Output columns are `dataSchema ++ partitionSchema` (partition values
    * come from the index, not the files). Plan size is O(1) in both file
    * and partition count; partition filters reach
    * `FileIndex.listFiles(partitionFilters, _)` for pruning.
    */
  def parquetRelation(
      spark: SparkSession,
      index: FileIndex,
      partitionSchema: StructType,
      dataSchema: StructType,
      options: Map[String, String] = Map.empty): DataFrame = {
    val relation = HadoopFsRelation(
      location = index,
      partitionSchema = partitionSchema,
      dataSchema = dataSchema,
      bucketSpec = None,
      fileFormat = new ParquetFileFormat,
      options = options)(spark)
    ofRows(spark, LogicalRelation(relation, isStreaming = false))
  }
}
