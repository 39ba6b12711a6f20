package graft.sources

import ProtoEntityChanges.{Reader, Writer}

/** Substreams package (.spkg) module-graph reader — the manifest
  * surface the reference's `run`/`tocsv` commands consume (reference
  * cmd/substreams-sink-graph-load/run.go:70-71 takes `<manifest>
  * <module>`, resolves the package's module graph through the sink
  * library, and refuses any module whose output type is not the
  * EntityChanges message, run.go:113-117). Built from public
  * knowledge only: the protobuf wire format and the public substreams
  * `sf/substreams/v1/{package,modules}.proto` descriptors, reusing
  * the repo's hand-rolled wire primitives
  * ([[ProtoEntityChanges.Reader]]/[[ProtoEntityChanges.Writer]] — no
  * proto runtime, no generated code).
  *
  * Decoded layout (proto3, field numbers from the public descriptors;
  * unknown fields — binaries, proto_files, sink config, network —
  * skip losslessly so future package revisions still parse):
  * {{{
  * Package  { uint64 version = 5; Modules modules = 6;
  *            repeated PackageMetadata package_meta = 8; }
  * PackageMetadata { string version = 1; string url = 2;
  *                   string name = 3; }
  * Modules  { repeated Module modules = 1; }
  * Module   { string name = 1;
  *            oneof kind { KindMap kind_map = 2 { string output_type = 1; }
  *                         KindStore kind_store = 3; }
  *            repeated Input inputs = 6;
  *            Output output = 7 { string type = 1; }
  *            uint64 initial_block = 8; }
  * Input    { oneof { Source source = 1 { string type = 1; }
  *                    Map map = 2        { string module_name = 1; }
  *                    Store store = 3    { string module_name = 1; }
  *                    Params params = 4  { string value = 1; } } }
  * }}}
  *
  * What the sink needs from all this is exactly three things, each
  * modeled here: (1) find the named module and verify it is a MAP
  * with the EntityChanges output type (legacy prefix accepted,
  * `proto:` prefix stripped — run.go:24-25,113); (2) the module's
  * transitive input closure in execution order, because a request
  * for one output module schedules its whole upstream DAG; (3) the
  * initial block, the floor for cursor-less starts. */
object SpkgManifest {

  /** Output types the sink accepts (run.go:24-25), unprefixed. */
  val SupportedModuleType = "sf.substreams.sink.entity.v1.EntityChanges"
  val LegacyModuleType = "sf.substreams.entity.v1.EntityChanges"

  case class ModuleInput(kind: String, ref: String)
  case class SpkgModule(name: String, kind: String, outputType: String,
                        initialBlock: Long, inputs: Seq[ModuleInput]) {
    /** `proto:`-stripped output type (sink.OutputModuleTypeUnprefixed). */
    def outputTypeUnprefixed: String = outputType.stripPrefix("proto:")
  }
  case class Spkg(version: Long, packageName: String,
                  packageVersion: String, modules: Seq[SpkgModule])

  // ---- decode --------------------------------------------------------

  private def decodeInput(r: Reader): ModuleInput = {
    var in = ModuleInput("unset", "")
    while (r.hasMore) {
      val tag = r.varint()
      ((tag >> 3).toInt, (tag & 7).toInt) match {
        case (1, 2) => in = ModuleInput("source", subStr(r, 1))
        case (2, 2) => in = ModuleInput("map", subStr(r, 1))
        case (3, 2) => in = ModuleInput("store", subStr(r, 1))
        case (4, 2) => in = ModuleInput("params", subStr(r, 1))
        case (_, wt) => r.skip(wt)
      }
    }
    in
  }

  /** Read a length-delimited submessage and return its single string
    * field `f` ("" when absent) — the shape of Source/Map/Store/
    * Params/Output/KindMap leaves. */
  private def subStr(r: Reader, f: Int): String = {
    val (s, e) = r.lenDelim()
    val inner = new Reader(r.buf, s, e)
    var out = ""
    while (inner.hasMore) {
      val tag = inner.varint()
      ((tag >> 3).toInt, (tag & 7).toInt) match {
        case (`f`, 2) => out = inner.str()
        case (_, wt) => inner.skip(wt)
      }
    }
    out
  }

  private def decodeModule(r: Reader): SpkgModule = {
    var name = ""; var kind = "unknown"
    var initialBlock = 0L
    // KindMap.output_type (field 2) doubles the Output field (field 7)
    // in current packages. Precedence is by FIELD, not wire byte order
    // (a legally-serialized package may put field 7 before field 2):
    // each is tracked separately and Output wins after the loop.
    var kindMapType = ""; var outputFieldType = ""
    val inputs = Seq.newBuilder[ModuleInput]
    while (r.hasMore) {
      val tag = r.varint()
      ((tag >> 3).toInt, (tag & 7).toInt) match {
        case (1, 2) => name = r.str()
        case (2, 2) => kind = "map"
          val t = subStr(r, 1); if (t.nonEmpty) kindMapType = t
        case (3, 2) => kind = "store"; r.lenDelim(): Unit
        case (6, 2) =>
          val (s, e) = r.lenDelim(); inputs += decodeInput(new Reader(r.buf, s, e))
        case (7, 2) => val t = subStr(r, 1); if (t.nonEmpty) outputFieldType = t
        case (8, 0) => initialBlock = r.varint()
        case (_, wt) => r.skip(wt)
      }
    }
    val outputType = if (outputFieldType.nonEmpty) outputFieldType else kindMapType
    SpkgModule(name, kind, outputType, initialBlock, inputs.result())
  }

  def decode(bytes: Array[Byte]): Spkg = {
    val r = new Reader(bytes, 0, bytes.length)
    var version = 0L; var pkgName = ""; var pkgVersion = ""
    val modules = Seq.newBuilder[SpkgModule]
    while (r.hasMore) {
      val tag = r.varint()
      ((tag >> 3).toInt, (tag & 7).toInt) match {
        case (5, 0) => version = r.varint()
        case (6, 2) =>
          val (s, e) = r.lenDelim()
          val ms = new Reader(r.buf, s, e)
          while (ms.hasMore) {
            val t2 = ms.varint()
            ((t2 >> 3).toInt, (t2 & 7).toInt) match {
              case (1, 2) =>
                val (s2, e2) = ms.lenDelim()
                modules += decodeModule(new Reader(ms.buf, s2, e2))
              case (_, wt) => ms.skip(wt)
            }
          }
        case (8, 2) =>
          val (s, e) = r.lenDelim()
          val pm = new Reader(r.buf, s, e)
          while (pm.hasMore) {
            val t2 = pm.varint()
            ((t2 >> 3).toInt, (t2 & 7).toInt) match {
              case (1, 2) => pkgVersion = pm.str()
              case (3, 2) => pkgName = pm.str()
              case (_, wt) => pm.skip(wt)
            }
          }
        case (_, wt) => r.skip(wt)
      }
    }
    Spkg(version, pkgName, pkgVersion, modules.result())
  }

  // ---- the three sink questions ---------------------------------------

  /** Resolve the requested output module exactly the way run.go does:
    * must exist, must be a map, and its unprefixed output type must be
    * the EntityChanges message (current or legacy name) — the error
    * strings carry the same facts run.go:116's does. */
  def outputModule(pkg: Spkg, name: String): Either[String, SpkgModule] =
    pkg.modules.find(_.name == name) match {
      case None =>
        Left(s"module ${'"'}$name${'"'} not found in package")
      case Some(m) if m.kind != "map" =>
        Left(s"sink only supports map modules but ${'"'}$name${'"'} is a ${m.kind}")
      case Some(m)
        if m.outputTypeUnprefixed != SupportedModuleType &&
           m.outputTypeUnprefixed != LegacyModuleType =>
        Left(s"sink only supports map module with output type " +
          s"${'"'}$SupportedModuleType${'"'} (or ${'"'}$LegacyModuleType${'"'}) " +
          s"but selected module ${'"'}$name${'"'} output type is " +
          s"${'"'}${m.outputTypeUnprefixed}${'"'}")
      case Some(m) => Right(m)
    }

  /** The module's transitive input closure in a deterministic
    * execution order (dependencies before dependents; siblings in
    * first-encountered order), `source:`/`params:` inputs excluded —
    * the upstream DAG a request for `root` schedules. Left on a
    * missing module or a dependency cycle. */
  def moduleGraph(pkg: Spkg, root: String): Either[String, Seq[String]] = {
    val byName = pkg.modules.map(m => m.name -> m).toMap
    val order = Seq.newBuilder[String]
    val done = scala.collection.mutable.Set.empty[String]
    val onPath = scala.collection.mutable.Set.empty[String]
    def visit(n: String): Option[String] = {
      if (done(n)) None
      else if (onPath(n)) Some(s"dependency cycle through module ${'"'}$n${'"'}")
      else byName.get(n) match {
        case None => Some(s"module ${'"'}$n${'"'} not found in package")
        case Some(m) =>
          onPath += n
          val err = m.inputs.iterator
            .filter(i => i.kind == "map" || i.kind == "store")
            .map(i => visit(i.ref)).collectFirst { case Some(e) => e }
          onPath -= n
          if (err.isEmpty) { done += n; order += n }
          err
      }
    }
    visit(root) match {
      case Some(e) => Left(e)
      case None => Right(order.result())
    }
  }

  /** Start floor for a cursor-less run: the output module's own
    * initial block (the sink passes range resolution down from it). */
  def startBlock(pkg: Spkg, name: String): Either[String, Long] =
    outputModule(pkg, name).map(_.initialBlock)

  // ---- encode (fixture construction + round-trip gate) ----------------

  private def encodeInput(in: ModuleInput): Array[Byte] = {
    val w = new Writer
    val leaf = new Writer
    leaf.str(1, in.ref)
    in.kind match {
      case "source" => w.sub(1, leaf.bytes)
      case "map" => w.sub(2, leaf.bytes)
      case "store" => w.sub(3, leaf.bytes)
      case "params" => w.sub(4, leaf.bytes)
      case k => throw new IllegalArgumentException(s"unknown input kind $k")
    }
    w.bytes
  }

  private def encodeModule(m: SpkgModule): Array[Byte] = {
    val w = new Writer
    w.str(1, m.name)
    m.kind match {
      case "map" =>
        val km = new Writer
        km.str(1, m.outputType)
        w.sub(2, km.bytes)
      case "store" => w.sub(3, Array.emptyByteArray)
      case k => throw new IllegalArgumentException(s"unknown module kind $k")
    }
    m.inputs.foreach(i => w.sub(6, encodeInput(i)))
    if (m.outputType.nonEmpty && m.kind == "map") {
      val out = new Writer
      out.str(1, m.outputType)
      w.sub(7, out.bytes)
    }
    if (m.initialBlock != 0) { w.tag(8, 0); w.varint(m.initialBlock) }
    w.bytes
  }

  /** Encode a package (proto3 canonical: number order, defaults
    * omitted) — the specs' fixture builder and round-trip gate. */
  def encode(pkg: Spkg): Array[Byte] = {
    val w = new Writer
    if (pkg.version != 0) { w.tag(5, 0); w.varint(pkg.version) }
    val ms = new Writer
    pkg.modules.foreach(m => ms.sub(1, encodeModule(m)))
    w.sub(6, ms.bytes)
    if (pkg.packageName.nonEmpty || pkg.packageVersion.nonEmpty) {
      val pm = new Writer
      if (pkg.packageVersion.nonEmpty) pm.str(1, pkg.packageVersion)
      if (pkg.packageName.nonEmpty) pm.str(3, pkg.packageName)
      w.sub(8, pm.bytes)
    }
    w.bytes
  }
}
