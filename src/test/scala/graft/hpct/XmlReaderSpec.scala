package graft.hpct

import java.io.ByteArrayInputStream
import java.nio.charset.StandardCharsets
import org.scalatest.funsuite.AnyFunSuite

/** Parser-semantics tests on a tiny synthetic experiment XML: callsite skipping,
  * max_depth pruning, location inheritance, strict unknown-tag handling — the
  * behaviors the reference implements at HD.py:233-289.
  */
class XmlReaderSpec extends AnyFunSuite {

  private val doc =
    """<?xml version="1.0"?>
      |<HPCToolkitExperiment>
      |<SecCallPathProfile n="t">
      |<SecHeader>
      |  <MetricTable>
      |    <Metric i="2" n="CPUTIME (usec):Sum (I)" v="final" t="inclusive"/>
      |    <Metric i="3" n="CPUTIME (usec):Mean (I)" v="derived-incr" t="inclusive">
      |      <MetricFormula t="combine" frm="sum($3, $3)"/>
      |      <MetricFormula t="finalize" frm="$2 / 2"/>
      |      <MetricFormula t="finalize" frm="$2 / 4"/>
      |    </Metric>
      |  </MetricTable>
      |  <LoadModuleTable><LoadModule i="7" n="/lib/a.so"/></LoadModuleTable>
      |  <FileTable><File i="8" n="/src/f.c"/></FileTable>
      |  <ProcedureTable>
      |    <Procedure i="9" n="main"/>
      |    <Procedure i="10" n="leaffn"/>
      |  </ProcedureTable>
      |</SecHeader>
      |<SecCallPathProfileData>
      |  <PF i="2" lm="7" f="8" l="10" n="9">
      |    <M n="2" v="100.0"/>
      |    <C i="3" l="11">
      |      <M n="2" v="999.0"/>
      |      <PF i="4" n="10" l="20">
      |        <M n="2" v="40.0"/>
      |        <S i="5" l="21"><M n="2" v="7.5"/></S>
      |      </PF>
      |    </C>
      |  </PF>
      |</SecCallPathProfileData>
      |</SecCallPathProfile>
      |</HPCToolkitExperiment>""".stripMargin

  private def parseDoc(maxDepth: Option[Int] = None, skipCallsites: Boolean = true) =
    XmlReader.parse(new ByteArrayInputStream(doc.getBytes(StandardCharsets.UTF_8)),
      "synthetic.xml", maxDepth, skipCallsites)

  test("flattens the tree with root pseudo-node and materialized callpaths") {
    val p = parseDoc()
    assert(p.rows.map(_.id) === Seq(-1L, 2L, 4L, 5L))
    val byId = p.rows.map(r => r.id -> r).toMap
    assert(byId(-1L).callpath.toSeq === Nil)
    assert(byId(-1L).nodeType === "root")
    assert(byId(-1L).line === 0L)
    // callsite skipped: id 3 emits no row, contributes no callpath segment
    assert(byId(4L).callpath.toSeq === Seq(2L, 4L))
    assert(byId(5L).callpath.toSeq === Seq(2L, 4L, 5L))
  }

  test("callsite measurements are dropped; others land in metric slots") {
    val p = parseDoc()
    val sumSlot = 0 // metric id 2 -> slot 0 (ascending-id order)
    val byId = p.rows.map(r => r.id -> r).toMap
    assert(byId(2L).metrics(sumSlot) === 100.0)
    assert(byId(4L).metrics(sumSlot) === 40.0) // 999.0 from the C node is dropped
    assert(byId(5L).metrics(sumSlot) === 7.5)
    assert(byId(2L).metrics(1) === null) // no Mean measurement
  }

  test("location inheritance: children inherit module/file/procedure from scope") {
    val byId = parseDoc().rows.map(r => r.id -> r).toMap
    assert(byId(2L).module === "a.so" && byId(2L).file === "f.c" && byId(2L).procedure === "main")
    assert(byId(2L).line === 10L)
    // PF i=4 overrides procedure + line, inherits module/file; C's l=11 is skipped with it
    assert(byId(4L).procedure === "leaffn" && byId(4L).module === "a.so" && byId(4L).file === "f.c")
    assert(byId(4L).line === 20L)
    // S i=5 overrides only line
    assert(byId(5L).procedure === "leaffn" && byId(5L).line === 21L)
  }

  test("keeping callsites emits their rows and extends callpaths") {
    val p = parseDoc(skipCallsites = false)
    assert(p.rows.map(_.id) === Seq(-1L, 2L, 3L, 4L, 5L))
    val byId = p.rows.map(r => r.id -> r).toMap
    assert(byId(3L).nodeType === "callsite")
    assert(byId(3L).metrics(0) === 999.0)
    assert(byId(4L).callpath.toSeq === Seq(2L, 3L, 4L))
  }

  test("maxDepth prunes subtrees at parse time; callsites don't consume depth") {
    // depth budget 1: PF(2) at depth 1 emits, its children (below budget) pruned;
    // the C frame is transparent so PF(4) would be depth 2.
    val p1 = parseDoc(maxDepth = Some(1))
    assert(p1.rows.map(_.id) === Seq(-1L, 2L))
    val p2 = parseDoc(maxDepth = Some(2))
    assert(p2.rows.map(_.id) === Seq(-1L, 2L, 4L))
  }

  test("first finalize formula wins; combine formulas are ignored") {
    val meta = parseDoc().meta
    assert(meta.metricsFormulas === Map("CPUTIME (usec):Mean (I)" -> "$2 / 2"))
  }

  test("header dimension tables are extracted") {
    val meta = parseDoc().meta
    assert(meta.metricsById === Seq(2 -> "CPUTIME (usec):Sum (I)", 3 -> "CPUTIME (usec):Mean (I)"))
    assert(meta.modulesById === Map(7 -> "/lib/a.so"))
    assert(meta.filesById === Map(8 -> "/src/f.c"))
    assert(meta.proceduresById === Map(9 -> "main", 10 -> "leaffn"))
    assert(meta.percentageColumn === "CPUTIME (usec):Mean (I)")
    assert(meta.hotPathColumn === "CPUTIME (usec):Mean (I) ratio of total")
  }

  test("unknown measurement tags are a hard error (strict mode)") {
    val bad = doc.replace("<S i=\"5\" l=\"21\">", "<Zz i=\"5\" l=\"21\">")
      .replace("</S>", "</Zz>")
    val ex = intercept[IllegalArgumentException] {
      XmlReader.parse(new ByteArrayInputStream(bad.getBytes(StandardCharsets.UTF_8)),
        "bad.xml", None, skipCallsites = true)
    }
    assert(ex.getMessage.contains("not recognized"))
  }
}
