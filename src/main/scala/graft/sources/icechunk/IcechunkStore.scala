package graft.sources.icechunk

import java.nio.charset.StandardCharsets
import java.nio.file.{Files, Path, Paths}

import scala.jdk.CollectionConverters._

import org.json4s._
import org.json4s.jackson.JsonMethods

import graft.nd.{NdDataset, NdVariable}
import graft.sources.io.ByteStore
import graft.sources.zarr.ZarrStore

/** `read_icechunk` — versioned Zarr: a repository whose METADATA lives
  * in immutable snapshots rather than `zarr.json` objects, with
  * branches, tags and snapshot ids selecting which version a query
  * reads (semantics per the reference's beacon-icechunk crate:
  * repository.rs version resolution, table_function.rs read surface —
  * a branch tip moves as commits land; a tag or snapshot id is fixed).
  *
  * Repository layout follows the public icechunk spec:
  *  - `refs/branch.<name>/<seq>.json` — branch generation files whose
  *    name is Crockford-base32 of (2^32−1 − generation), so the
  *    lexicographically FIRST file is the branch tip; content names the
  *    snapshot id.
  *  - `refs/tag.<name>/ref.json` — fixed tag → snapshot id.
  *  - `snapshots/<id>` — the version: one node per array, carrying the
  *    array's Zarr v3 metadata and its chunk-manifest id; ids are
  *    random 12-byte Crockford-base32 (20 chars).
  *  - `manifests/<id>` — chunk coordinate → (chunk object id, byte
  *    offset, length) references.
  *  - `chunks/<id>` — codec-encoded chunk payloads (the Zarr codec
  *    pipeline, [[ZarrStore.decodeChunkBytes]], applies on read).
  *
  * Snapshot and manifest payloads are zstd-compressed FlatBuffers
  * (hand-rolled wire format, [[FlatBuf]]; table schema + the remaining
  * compatibility caveat documented in [[IcechunkFb]]), with legacy JSON
  * payloads still readable via content sniffing.
  */
object IcechunkStore {

  final case class ChunkRef(id: String, offset: Long, length: Long)
  final case class Node(array: ZarrStore.ZarrArray, chunks: Map[String, ChunkRef])
  final case class Repo(root: String, snapshotId: String, parentId: Option[String],
      nodes: Seq[Node], attrs: Map[String, String]) {
    def node(n: String): Node = nodes.find(_.array.name == n).getOrElse(
      throw new IllegalArgumentException(s"icechunk node '$n' not in snapshot $snapshotId"))
    def dimSizes: Seq[(String, Int)] = {
      val out = scala.collection.mutable.LinkedHashMap.empty[String, Int]
      nodes.foreach { n =>
        n.array.dims.zip(n.array.shape).foreach { case (d, s) =>
          out.get(d) match {
            case Some(prev) => require(prev == s.toInt, s"dimension $d: $prev vs $s")
            case None => out(d) = s.toInt
          }
        }
      }
      out.toSeq
    }
  }

  /** at most one of branch / tag / snapshot — the reference errors on
    * two selectors rather than silently preferring one */
  final case class Version(branch: Option[String] = None, tag: Option[String] = None,
      snapshot: Option[String] = None) {
    require(Seq(branch, tag, snapshot).flatten.size <= 1,
      "an Icechunk table reads one version: set at most one of 'branch', 'tag' or 'snapshot'")
    def render: String =
      branch.map("branch:" + _).orElse(tag.map("tag:" + _))
        .orElse(snapshot.map("snapshot:" + _)).getOrElse("branch:main")
  }

  def isRepository(path: String): Boolean =
    ByteStore.isDirectory(ByteStore.resolve(path, "refs")) &&
      ByteStore.isDirectory(ByteStore.resolve(path, "snapshots"))

  // --------------------------------------------------- crockford base32

  private val Crockford = "0123456789ABCDEFGHJKMNPQRSTVWXYZ"

  /** MSB-first base32 of the byte string (ids: 12 bytes → 20 chars) */
  def crockford(bytes: Array[Byte]): String = {
    val sb = new StringBuilder
    var acc = 0L
    var nBits = 0
    bytes.foreach { b =>
      acc = (acc << 8) | (b & 0xFFL); nBits += 8
      while (nBits >= 5) {
        sb.append(Crockford(((acc >> (nBits - 5)) & 0x1F).toInt)); nBits -= 5
      }
    }
    if (nBits > 0) sb.append(Crockford(((acc << (5 - nBits)) & 0x1F).toInt))
    sb.toString
  }

  def newId(): String = {
    val b = new Array[Byte](12)
    java.security.SecureRandom.getInstanceStrong.nextBytes(b)
    crockford(b)
  }

  /** branch sequence filename: base32 of (2^32−1 − gen), zero-padded so
    * the lexicographically first listing entry is the newest commit */
  private[graft] def seqName(gen: Long): String = {
    val v = 0xFFFFFFFFL - gen
    val s = java.lang.Long.toString(v, 32).toUpperCase
      .map(c => Crockford("0123456789abcdefghijklmnopqrstuv".indexOf(c.toLower)))
    ("0" * (7 - s.length)) + s
  }
  private[graft] def seqGen(name: String): Long = {
    val v = name.stripSuffix(".json").foldLeft(0L)((acc, c) => acc * 32 + Crockford.indexOf(c))
    0xFFFFFFFFL - v
  }

  // ----------------------------------------------------------- resolve

  private def listDir(dir: String): Seq[String] =
    if (!ByteStore.isDirectory(dir)) Nil else ByteStore.list(dir)

  /** a version selector → the snapshot id it names right now */
  def resolve(root: String, v: Version): String = {
    def refSnapshot(p: String): String =
      (JsonMethods.parse(ByteStore.readString(p)) \ "snapshot") match {
        case JString(s) => s
        case other => throw new IllegalArgumentException(s"bad ref file $p: $other")
      }
    v match {
      case Version(_, _, Some(id)) => id
      case Version(_, Some(tag), _) =>
        val p = ByteStore.resolve(root, s"refs/tag.$tag/ref.json")
        require(ByteStore.exists(p), s"icechunk tag '$tag' not found at $root")
        refSnapshot(p)
      case _ =>
        val branch = v.branch.getOrElse("main")
        val dir = ByteStore.resolve(root, s"refs/branch.$branch")
        val tip = listDir(dir).filter(_.endsWith(".json"))
          .sortBy(ByteStore.fileName).headOption // first = newest generation
          .getOrElse(throw new IllegalArgumentException(
            s"icechunk branch '$branch' not found at $root"))
        refSnapshot(tip)
    }
  }

  // -------------------------------------------------------------- open

  val metadataParses = new java.util.concurrent.atomic.AtomicLong(0)
  private val repoCache =
    new java.util.concurrent.ConcurrentHashMap[(String, String), Repo]()

  /** per-JVM cache keyed by (root, RESOLVED snapshot id): ref resolution
    * re-lists (branch tips move), the immutable snapshot parse does not */
  def openCached(path: String, v: Version = Version()): Repo = {
    val root = ByteStore.toLocal(path)
    val snapId = resolve(root, v)
    if (repoCache.size > 64) repoCache.clear()
    repoCache.computeIfAbsent((root, snapId), _ => open(root, snapId))
  }

  def open(root: String, snapshotId: String): Repo = {
    metadataParses.incrementAndGet()
    val snap = readSnapshotJson(root, snapshotId)
    val parent = (snap \ "parent_id") match { case JString(p) => Some(p); case _ => None }
    val attrs = (snap \ "attributes") match {
      case JObject(fs) => fs.collect { case (k, JString(s)) => k -> s }.toMap
      case _ => Map.empty[String, String]
    }
    val nodes = (snap \ "nodes") match {
      case JArray(ns) => ns.map { n =>
        val JString(name) = (n \ "name"): @unchecked
        val arr = ZarrStore.parseArray(name, root, n \ "zarr")
        val JString(manifestId) = (n \ "manifest"): @unchecked
        val mf = IcechunkFb.decodeManifest(ByteStore.readAll(
          ByteStore.resolve(root, s"manifests/$manifestId")))
        val chunks = (mf \ "chunks" \ name) match {
          case JObject(cs) => cs.map { case (key, r) =>
            val JString(cid) = (r \ "id"): @unchecked
            def lng(f: String) = (r \ f) match {
              case JInt(x) => x.toLong; case JLong(x) => x; case _ => 0L
            }
            key -> ChunkRef(cid, lng("offset"), lng("length"))
          }.toMap
          case _ => Map.empty[String, ChunkRef]
        }
        Node(arr, chunks)
      }
      case _ => Nil
    }
    Repo(root, snapshotId, parent, nodes, attrs)
  }

  private def readSnapshotJson(root: String, id: String): JValue = {
    val p = ByteStore.resolve(root, s"snapshots/$id")
    require(ByteStore.exists(p), s"icechunk snapshot $id not found at $root")
    IcechunkFb.decodeSnapshot(ByteStore.readAll(p))
  }

  // -------------------------------------------------------------- read

  def readChunk(repo: Repo, node: Node, idx: Array[Int]): Array[Double] = {
    val n = node.array.chunkShape.map(_.toLong).product.toInt
    node.chunks.get(idx.mkString(".")) match {
      case None => Array.fill(n)(node.array.fillValue)
      case Some(ref) =>
        // positioned range read of the chunk object (remote-capable)
        val bytes = ByteStore.readRange(
          ByteStore.resolve(repo.root, s"chunks/${ref.id}"), ref.offset, ref.length.toInt)
        ZarrStore.decodeChunkBytes(node.array, bytes)
    }
  }

  /** region [start, end) per dim — same odometer walk as the Zarr reader */
  def readRegion(repo: Repo, node: Node, start: Array[Long], end: Array[Long]): Array[Double] = {
    val a = node.array
    val rank = a.shape.length
    val rdims = Array.tabulate(rank)(i => (end(i) - start(i)).toInt)
    val n = math.max(rdims.map(_.toLong).product.toInt, 0)
    val out = new Array[Double](n)
    if (n == 0) return out
    if (rank == 0) return readChunk(repo, node, Array.empty)
    val c0 = Array.tabulate(rank)(i => (start(i) / a.chunkShape(i)).toInt)
    val c1 = Array.tabulate(rank)(i => ((end(i) - 1) / a.chunkShape(i)).toInt)
    val cidx = c0.clone()
    var done = false
    while (!done) {
      ZarrStore.copyOverlap(readChunk(repo, node, cidx), a.chunkShape, cidx,
        out, rdims, start, end)
      var d = rank - 1
      var carry = true
      while (carry && d >= 0) {
        cidx(d) += 1
        if (cidx(d) > c1(d)) { cidx(d) = c0(d); d -= 1 } else carry = false
      }
      if (carry) done = true
    }
    out
  }

  /** one version restricted to a region, as the shared ND model */
  def regionDataset(repo: Repo, region: Seq[(String, Long, Long)],
      keep: String => Boolean = _ => true): NdDataset = {
    val bounds = region.map { case (d, a, b) => d -> (a, b) }.toMap
    val dims = region.map { case (d, a, b) => d -> (b - a).toInt } ++
      repo.dimSizes.filterNot { case (d, _) => bounds.contains(d) }
    val vars = repo.nodes.filter(n => keep(n.array.name)).map { n =>
      val a = n.array
      val start = a.dims.map(d => bounds.get(d).map(_._1).getOrElse(0L)).toArray
      val end = a.dims.zip(a.shape).map { case (d, s) =>
        bounds.get(d).map(_._2).getOrElse(s)
      }.toArray
      NdVariable(a.name, a.dims, readRegion(repo, n, start, end), a.attrs)
    }
    NdDataset(dims, vars, repo.attrs)
  }

  /** metadata-only model for schema/grid planning (no chunk opens) */
  def metaDataset(repo: Repo): NdDataset =
    NdDataset(repo.dimSizes,
      repo.nodes.map(n => NdVariable(n.array.name, n.array.dims, Array.empty[Double], n.array.attrs)),
      repo.attrs)

  // ------------------------------------------------------------- write

  /** Fixture/egress writer: commit the ND model as a new snapshot on a
    * branch (creating branch + repository as needed); returns the new
    * snapshot id. Chunks are written `bytes`-codec little-endian
    * float64, one chunk object per chunk, all referenced by one
    * manifest per commit. */
  object Writer {

    def commit(root: Path, nd: NdDataset, branch: String = "main",
        message: String = "commit", chunkSizes: Map[String, Int] = Map.empty): String = {
      Files.createDirectories(root.resolve("snapshots"))
      Files.createDirectories(root.resolve("manifests"))
      Files.createDirectories(root.resolve("chunks"))
      val dimMap = nd.dims.toMap
      val snapId = newId()
      val manifestId = newId()

      val chunkEntries = scala.collection.mutable.ListBuffer.empty[(String, String, ChunkRef)]
      val nodesJson = nd.variables.map { v =>
        require(!v.isString, "icechunk writer supports numeric arrays")
        val shape = v.dims.map(dimMap(_).toLong)
        val chunks = v.dims.map(d => math.min(chunkSizes.getOrElse(d, 1024), dimMap(d)))
        val rank = shape.length
        val nChunks = Array.tabulate(rank)(i =>
          ((shape(i) + chunks(i) - 1) / chunks(i)).toInt)
        val strides = new Array[Long](rank)
        var acc = 1L
        for (i <- (0 until rank).reverse) { strides(i) = acc; acc *= shape(i) }
        val cidx = new Array[Int](rank)
        var done = rank == 0 && { // rank-0: single chunk
          writeChunkObject(root, v, Array.empty, Array.empty, chunks.toArray,
            shape.toArray, strides, chunkEntries, v.name)
          true
        }
        while (!done) {
          val start = Array.tabulate(rank)(i => cidx(i).toLong * chunks(i))
          writeChunkObject(root, v, cidx.clone(), start, chunks.toArray,
            shape.toArray, strides, chunkEntries, v.name)
          var d = rank - 1
          var carry = true
          while (carry && d >= 0) {
            cidx(d) += 1
            if (cidx(d) >= nChunks(d)) { cidx(d) = 0; d -= 1 } else carry = false
          }
          if (carry) done = true
        }
        JObject(
          "name" -> JString(v.name),
          "manifest" -> JString(manifestId),
          "zarr" -> JObject(
            "zarr_format" -> JInt(3),
            "node_type" -> JString("array"),
            "shape" -> JArray(shape.toList.map(s => JLong(s))),
            "data_type" -> JString("float64"),
            "chunk_grid" -> JObject("name" -> JString("regular"),
              "configuration" -> JObject("chunk_shape" -> JArray(chunks.toList.map(c => JInt(c))))),
            "chunk_key_encoding" -> JObject("name" -> JString("default"),
              "configuration" -> JObject("separator" -> JString("/"))),
            "fill_value" -> JString("NaN"),
            "codecs" -> JArray(List(JObject("name" -> JString("bytes"),
              "configuration" -> JObject("endian" -> JString("little"))))),
            "dimension_names" -> JArray(v.dims.toList.map(JString(_))),
            "attributes" -> JObject(v.attrs.toList.sortBy(_._1).map {
              case (k, s) => k -> JString(s)
            })))
      }

      val manifest = JObject("id" -> JString(manifestId),
        "chunks" -> JObject(chunkEntries.groupBy(_._1).toList.sortBy(_._1).map {
          case (node, es) => node -> JObject(es.toList.map { case (_, key, r) =>
            key -> (JObject("id" -> JString(r.id),
              "offset" -> JLong(r.offset), "length" -> JLong(r.length)): JValue)
          })
        }))
      Files.write(root.resolve("manifests").resolve(manifestId),
        IcechunkFb.encodeManifest(manifest))

      val branchDir = root.resolve("refs").resolve(s"branch.$branch")
      val gens = listDir(branchDir.toString).map(p => seqGen(ByteStore.fileName(p)))
      val parent: Option[String] =
        if (gens.isEmpty) None
        else Some(resolve(root.toString, Version(branch = Some(branch))))
      val snap = JObject(
        "id" -> JString(snapId),
        "parent_id" -> parent.map(JString(_): JValue).getOrElse(JNull),
        "message" -> JString(message),
        "attributes" -> JObject(nd.globalAttrs.toList.sortBy(_._1).map {
          case (k, s) => k -> (JString(s): JValue)
        }),
        "nodes" -> JArray(nodesJson.toList))
      Files.write(root.resolve("snapshots").resolve(snapId),
        IcechunkFb.encodeSnapshot(snap))

      Files.createDirectories(branchDir)
      val gen = if (gens.isEmpty) 0L else gens.max + 1
      Files.write(branchDir.resolve(seqName(gen) + ".json"),
        s"""{"snapshot":"$snapId"}""".getBytes(StandardCharsets.UTF_8))
      snapId
    }

    def tag(root: Path, name: String, snapshotId: String): Unit = {
      val dir = root.resolve("refs").resolve(s"tag.$name")
      Files.createDirectories(dir)
      val p = dir.resolve("ref.json")
      require(!Files.exists(p), s"icechunk tag '$name' already exists (tags are immutable)")
      Files.write(p, s"""{"snapshot":"$snapshotId"}""".getBytes(StandardCharsets.UTF_8))
    }

    /** one chunk → one chunk object (bytes codec, little-endian f64).
      * Payload is the FULL declared chunk shape — edge chunks pad NaN,
      * the zarr chunk contract the shared decode expects. */
    private def writeChunkObject(root: Path, v: NdVariable, cidx: Array[Int],
        start: Array[Long], chunks: Array[Int], shape: Array[Long],
        strides: Array[Long],
        entries: scala.collection.mutable.ListBuffer[(String, String, ChunkRef)],
        node: String): Unit = {
      val rank = start.length
      val vol = if (rank == 0) 1 else chunks.map(_.toLong).product.toInt
      val buf = java.nio.ByteBuffer.allocate(vol * 8).order(java.nio.ByteOrder.LITTLE_ENDIAN)
      if (rank == 0) buf.putDouble(v.data(0))
      else {
        val local = new Array[Int](rank)
        var i = 0
        while (i < vol) {
          var rem = i
          var k = rank - 1
          while (k >= 0) { local(k) = rem % chunks(k); rem /= chunks(k); k -= 1 }
          var inBounds = true
          var g = 0L
          k = 0
          while (k < rank) {
            val gi = start(k) + local(k)
            if (gi >= shape(k)) inBounds = false
            g += gi * strides(k)
            k += 1
          }
          buf.putDouble(if (inBounds) v.data(g.toInt) else Double.NaN)
          i += 1
        }
      }
      val id = newId()
      val bytes = buf.array()
      Files.write(root.resolve("chunks").resolve(id), bytes)
      entries += ((node, if (rank == 0) "0" else cidx.mkString("."),
        ChunkRef(id, 0L, bytes.length.toLong)))
    }
  }
}
