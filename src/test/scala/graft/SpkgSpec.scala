package graft

import graft.sources.SpkgManifest
import graft.sources.SpkgManifest.{ModuleInput, Spkg, SpkgModule}

/** Gates for the .spkg module-graph reader (§2 reference-manifest
  * surface, reference run.go:70-117): the encoder is pinned to
  * HAND-DERIVED bytes, decode ∘ encode is identity, unknown package
  * fields (binaries, proto_files, sink config) skip losslessly, and
  * the three sink questions — output-module validation, transitive
  * module graph, start block — answer the way run.go's checks do. */
class SpkgSpec extends SparkSpec {

  private val EC = "proto:" + SpkgManifest.SupportedModuleType

  private val pkg = Spkg(1L, "graph_load_test", "v0.1.0", Seq(
    SpkgModule("store_totals", "store", "", 0L,
      Seq(ModuleInput("source", "sf.ethereum.type.v2.Block"))),
    SpkgModule("map_events", "map", "proto:test.Events", 5L,
      Seq(ModuleInput("source", "sf.ethereum.type.v2.Block"),
        ModuleInput("params", "addr=0xabc"))),
    SpkgModule("graph_out", "map", EC, 12L,
      Seq(ModuleInput("map", "map_events"),
        ModuleInput("store", "store_totals")))))

  test("encoder matches hand-derived wire bytes for a minimal package") {
    // Package{ version(5)=1, modules(6)=Modules{ modules(1)=[
    //   Module{ name(1)="m", kind_map(2){output_type(1)=t},
    //           output(7){type(1)=t}, initial_block(8)=3 }]}}
    val t = "proto:x.Y"
    val one = Spkg(1L, "", "", Seq(SpkgModule("m", "map", t, 3L, Nil)))
    val tb = t.getBytes("UTF-8") // 9 bytes
    val module = Array[Int](
      0x0A, 0x01, 'm', // name
      0x12, 0x0B, 0x0A, 0x09) ++ tb.map(_.toInt) ++ Array[Int]( // kind_map
      0x3A, 0x0B, 0x0A, 0x09) ++ tb.map(_.toInt) ++ Array[Int]( // output
      0x40, 0x03) // initial_block
    val want = (Array[Int](0x28, 0x01, // version
      0x32, module.length + 2, 0x0A, module.length) ++ module).map(_.toByte)
    assert(SpkgManifest.encode(one).toSeq === want.toSeq)
  }

  test("decode ∘ encode is identity on the three-module fixture") {
    assert(SpkgManifest.decode(SpkgManifest.encode(pkg)) === pkg)
  }

  test("unknown package/module fields skip losslessly") {
    val bytes = SpkgManifest.encode(pkg)
    // prepend proto_files(1, wt2), append network(11?, wt2) and a
    // fixed64 field — all unknown to the reader
    val noise1 = Array(0x0A, 0x03, 1, 2, 3).map(_.toByte)
    val noise2 = Array(0x5A, 0x02, 'h', 'i').map(_.toByte)
    val noise3 = Array(0x61, 8, 7, 6, 5, 4, 3, 2, 1).map(_.toByte)
    val got = SpkgManifest.decode(noise1 ++ bytes ++ noise2 ++ noise3)
    assert(got === pkg)
  }

  test("malformed bytes fail loudly; empty packages parse to empty") {
    // truncated varint and a length running past the buffer — the
    // shared Reader's guards, inherited from the EntityChanges codec
    intercept[Exception](SpkgManifest.decode(Array(0x32, 0xFF).map(_.toByte)))
    intercept[Exception](SpkgManifest.decode(Array(0x32, 0x7F, 0x0A).map(_.toByte)))
    val empty = SpkgManifest.decode(Array.emptyByteArray)
    assert(empty === Spkg(0L, "", "", Nil))
    assert(SpkgManifest.outputModule(empty, "x").swap.exists(_.contains("not found")))
  }

  test("output-module validation mirrors run.go's three refusals") {
    assert(SpkgManifest.outputModule(pkg, "graph_out").map(_.initialBlock)
      === Right(12L))
    // legacy type name accepted
    val legacy = pkg.copy(modules = pkg.modules.map(m =>
      if (m.name == "graph_out")
        m.copy(outputType = "proto:" + SpkgManifest.LegacyModuleType)
      else m))
    assert(SpkgManifest.outputModule(legacy, "graph_out").isRight)
    assert(SpkgManifest.outputModule(pkg, "nope").swap.exists(_.contains("not found")))
    assert(SpkgManifest.outputModule(pkg, "store_totals").swap
      .exists(_.contains("map modules")))
    val bad = SpkgManifest.outputModule(pkg, "map_events").swap.getOrElse("")
    assert(bad.contains(SpkgManifest.SupportedModuleType) &&
      bad.contains("test.Events"), bad)
  }

  test("module graph: dependencies before dependents, diamonds once, cycles refused") {
    assert(SpkgManifest.moduleGraph(pkg, "graph_out")
      === Right(Seq("map_events", "store_totals", "graph_out")))
    // diamond: two paths into one upstream module appear once
    val diamond = pkg.copy(modules = pkg.modules :+
      SpkgModule("fan_in", "map", EC, 0L,
        Seq(ModuleInput("map", "map_events"),
          ModuleInput("map", "graph_out"))))
    assert(SpkgManifest.moduleGraph(diamond, "fan_in")
      === Right(Seq("map_events", "store_totals", "graph_out", "fan_in")))
    // missing dependency
    val dangling = pkg.copy(modules = pkg.modules :+
      SpkgModule("broken", "map", EC, 0L, Seq(ModuleInput("map", "ghost"))))
    assert(SpkgManifest.moduleGraph(dangling, "broken").swap
      .exists(_.contains("not found")))
    // cycle
    val cyclic = Spkg(1L, "", "", Seq(
      SpkgModule("a", "map", EC, 0L, Seq(ModuleInput("map", "b"))),
      SpkgModule("b", "map", EC, 0L, Seq(ModuleInput("map", "a")))))
    assert(SpkgManifest.moduleGraph(cyclic, "a").swap
      .exists(_.contains("cycle")))
  }

  test("start block comes from the validated output module") {
    assert(SpkgManifest.startBlock(pkg, "graph_out") === Right(12L))
    assert(SpkgManifest.startBlock(pkg, "store_totals").isLeft)
  }
}
