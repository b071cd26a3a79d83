package graft.nd

/** In-memory model of an N-dimensional container (≈ one NetCDF/Zarr/
  * HDF5 dataset): named dimensions, variables over ordered dimension
  * subsets, per-variable and global attributes.
  *
  * Semantics re-expressed from the reference's arrays→tables model
  * (docs/2.0.0-rc2/arrays-to-tables.md; beacon-file-formats/
  * beacon-nd-array/src/dataset). This model is the format-agnostic
  * core: file readers (NetCDF/Zarr/…) produce an [[NdDataset]] (or, at
  * scale, a chunk-partitioned DataSourceV2 sharing [[NdFlatten]]'s
  * stride math); the flattening rule is independent of the container.
  */
final case class NdVariable(
    name: String,
    dims: Seq[String],                 // ordered, each must be a dataset dim
    data: Array[Double],               // flat, C-order over `dims` (null for string vars)
    attrs: Map[String, String] = Map.empty,
    sdata: Array[String] = null) {     // string variables (decoded char matrices)
  def isString: Boolean = sdata != null
  def length: Int = if (isString) sdata.length else data.length
}

final case class NdDataset(
    dims: Seq[(String, Int)],          // ordered named dimensions
    variables: Seq[NdVariable],
    globalAttrs: Map[String, String] = Map.empty) {

  def dimSize(name: String): Int =
    dims.find(_._1 == name).map(_._2)
      .getOrElse(throw new IllegalArgumentException(s"unknown dimension: $name"))

  def variable(name: String): NdVariable =
    variables.find(_.name == name)
      .getOrElse(throw new IllegalArgumentException(s"unknown variable: $name"))

  /** volume (element count) of a variable */
  def volume(v: NdVariable): Long =
    v.dims.map(d => dimSize(d).toLong).product

  // zero variables is legal: a fully column-pruned scan (count(*)
  // shape) still has a row count — the product of the grid dims.
  // zero-LENGTH variables are the metadata-only parse (schema/grid
  // planning never touches data) — legal unless the dims say empty too.
  variables.foreach { v =>
    val expect = v.dims.map(d => dimSize(d).toLong).product
    require(v.length == expect || v.length == 0,
      s"variable ${v.name}: data length ${v.length} != dim product $expect")
  }
}
