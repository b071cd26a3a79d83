package graft.nd

/** Post-decode slicing of one variable along a named axis — the
  * fallback path of region-restricted container reads for variables
  * that carry the split dimension somewhere OTHER than axis 0 (axis-0
  * slices are read range-restricted at the byte level by the parsers
  * and never decode the excluded rows). */
object NdSlice {

  /** restrict `v` to [start,end) along `dim`; `fullSizes` are the
    * UNsliced dimension sizes the variable's data was decoded with.
    * Variables not carrying `dim` pass through unchanged. */
  def sliceAxis(v: NdVariable, fullSizes: Map[String, Int], dim: String,
      start: Int, end: Int): NdVariable = {
    val k = v.dims.indexOf(dim)
    if (k < 0) return v
    val shape = v.dims.map(fullSizes(_))
    val outer = shape.take(k).product.toLong
    val inner = shape.drop(k + 1).product.toLong
    val keep = (end - start).toLong
    val block = (keep * inner).toInt
    if (v.isString) {
      val out = new Array[String]((outer * block).toInt)
      var o = 0L
      var w = 0
      while (o < outer) {
        var j = (o * shape(k) + start) * inner
        val stop = j + block
        while (j < stop) { out(w) = v.sdata(j.toInt); w += 1; j += 1 }
        o += 1
      }
      v.copy(sdata = out)
    } else {
      val out = new Array[Double]((outer * block).toInt)
      var o = 0L
      var w = 0
      while (o < outer) {
        System.arraycopy(v.data, ((o * shape(k) + start) * inner).toInt, out, w, block)
        w += block
        o += 1
      }
      v.copy(data = out)
    }
  }
}
