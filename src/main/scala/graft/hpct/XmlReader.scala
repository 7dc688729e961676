package graft.hpct

import java.io.{InputStream, BufferedInputStream, FileInputStream}
import javax.xml.stream.{XMLInputFactory, XMLStreamConstants, XMLStreamReader}
import scala.collection.mutable

/** Streaming (StAX) parser for HPCToolkit experiment XML databases.
  *
  * One pass over the document produces the header dimension tables (metric / load-module /
  * file / procedure id->name maps; reference hpctoolkit_dataframe.py:164-185), the finalize
  * formulas (ibid:63-76), and the calling-context tree flattened to one row per node with a
  * materialized `callpath` array (ibid:233-289). The reference DOM-parses and recurses; this
  * parser is a single streaming pass with an explicit stack, so memory stays proportional to
  * tree depth + row output, not the XML DOM — the per-file unit of work in the distributed
  * loader ([[ProfileLoad.loadMany]]), where each executor task parses whole files.
  *
  * Faithful semantics carried over:
  *  - callsite (`C`) nodes are skipped by default: no row, no callpath segment, no depth
  *    consumption, and their own `M` measurements are dropped (ibid:147-148, 266-269);
  *  - `maxDepth` prunes child subtrees at parse time; a node at the depth budget still emits
  *    its row with metrics (ibid:256-257), and skipped `C` nodes don't consume depth;
  *  - children inherit module/file/line/procedure from the enclosing scope, overriding only
  *    the attributes present (ibid:271-278);
  *  - the root pseudo-node has id=-1, empty callpath, line=0, type='root' (ibid:48, 247);
  *  - unknown measurement tags are a hard error (strict mode, ibid:260-264).
  */
object XmlReader {

  /** One flattened CCT node. `metrics` is aligned to [[ProfileMeta.metricsById]] order
    * (ascending metric id); absent measurements are null.
    */
  final case class NodeRow(
      id: Long,
      callpath: Array[Long],
      nodeType: String,
      modulePath: String,
      module: String,
      filePath: String,
      file: String,
      line: Long,
      procedure: String,
      metrics: Array[java.lang.Double])

  final case class Parsed(meta: ProfileMeta, rows: IndexedSeq[NodeRow])

  def parse(path: String, maxDepth: Option[Int] = None, skipCallsites: Boolean = true): Parsed = {
    val in = new BufferedInputStream(new FileInputStream(path), 1 << 16)
    try parse(in, path, maxDepth, skipCallsites)
    finally in.close()
  }

  /** Header-only parse (stops before the measurement tree) — used by the distributed
    * loader to build the union schema cheaply on the driver.
    */
  def parseHeader(path: String): ProfileMeta = {
    val in = new BufferedInputStream(new FileInputStream(path), 1 << 16)
    try new StreamParser(in, path, None, skipCallsites = true, headerOnly = true).run().meta
    finally in.close()
  }

  def parse(in: InputStream, pathLabel: String, maxDepth: Option[Int],
      skipCallsites: Boolean): Parsed =
    new StreamParser(in, pathLabel, maxDepth, skipCallsites, headerOnly = false).run()

  private def basename(p: String): String = {
    val i = p.lastIndexOf('/')
    if (i < 0) p else p.substring(i + 1)
  }

  /** pathlib-equivalent normalization: the reference stores module/file names as
    * `pathlib.Path` (HD.py:40-43), whose str() drops `.` segments and duplicate
    * slashes (`./src/x` -> `src/x`) while keeping `..` — the golden frames carry the
    * normalized form.
    */
  private[hpct] def normalizePath(p: String): String = {
    if (p == null || p.isEmpty) return p
    val absolute = p.startsWith("/")
    val parts = p.split("/").filter(s => s.nonEmpty && s != ".")
    val joined = parts.mkString("/")
    if (absolute) "/" + joined
    else if (joined.isEmpty) "."
    else joined
  }

  /** Inheritable location state (reference `location` dict, ibid:246-247, 271-278). */
  private final case class Location(
      modulePath: String, module: String, filePath: String, file: String,
      line: Long, procedure: String, id: Long, callpath: List[Long])

  /** Per-tree-frame state: row's metric slot array (null for skipped callsites /
    * pruned), the inheritable location, and the remaining depth budget. Top-level
    * (not nested in StreamParser) so the synthesized case-class equals needs no
    * outer-instance check.
    */
  private final case class Frame(
      slots: Array[java.lang.Double], location: Location, remaining: Option[Int])

  private final class StreamParser(in: InputStream, pathLabel: String,
      maxDepth: Option[Int], skipCallsites: Boolean, headerOnly: Boolean) {

    private val factory = {
      val f = XMLInputFactory.newInstance()
      f.setProperty(XMLInputFactory.SUPPORT_DTD, java.lang.Boolean.FALSE)
      f.setProperty(XMLInputFactory.IS_VALIDATING, java.lang.Boolean.FALSE)
      // zero egress + untrusted input: never resolve external entities
      f.setProperty(XMLInputFactory.IS_SUPPORTING_EXTERNAL_ENTITIES, java.lang.Boolean.FALSE)
      f
    }

    // header accumulators
    private val metricsById = mutable.LinkedHashMap.empty[Int, String]
    private val formulas = mutable.LinkedHashMap.empty[String, String]
    private val modulesById = mutable.HashMap.empty[Int, String]
    private val filesById = mutable.HashMap.empty[Int, String]
    private val proceduresById = mutable.HashMap.empty[Int, String]
    private var currentMetricName: String = null

    // tree accumulators
    private val rows = mutable.ArrayBuffer.empty[NodeRow]
    private var metricIndex: Map[Int, Int] = null // metric id -> array slot (ascending-id order)
    private var metricCount = 0

    def run(): Parsed = {
      val r = factory.createXMLStreamReader(in)
      try runLoop(r)
      finally r.close()
    }

    private def attr(r: XMLStreamReader, name: String): String = {
      var i = 0
      while (i < r.getAttributeCount) {
        if (r.getAttributeLocalName(i) == name) return r.getAttributeValue(i)
        i += 1
      }
      null
    }

    private def runLoop(r: XMLStreamReader): Parsed = {
      val stack = mutable.ArrayDeque.empty[Frame]
      var inData = false
      var pruneDepth = 0 // >0: inside a max_depth-pruned subtree; swallow events

      while (r.hasNext) {
        r.next() match {
          case XMLStreamConstants.START_ELEMENT =>
            val tag = r.getLocalName
            if (pruneDepth > 0) { pruneDepth += 1 }
            else if (!inData) tag match {
              case "Metric" =>
                val id = attr(r, "i").toInt
                currentMetricName = attr(r, "n")
                metricsById(id) = currentMetricName
              case "MetricFormula" =>
                // first t="finalize" per metric wins (reference ibid:69-75 `break`)
                if (currentMetricName != null && attr(r, "t") == "finalize" &&
                  !formulas.contains(currentMetricName)) {
                  formulas(currentMetricName) = attr(r, "frm")
                }
              case "LoadModule" => modulesById(attr(r, "i").toInt) = normalizePath(attr(r, "n"))
              case "File"       => filesById(attr(r, "i").toInt) = normalizePath(attr(r, "n"))
              case "Procedure"  => proceduresById(attr(r, "i").toInt) = attr(r, "n")
              case "SecCallPathProfileData" =>
                if (headerOnly) return Parsed(buildMeta(), rows.toIndexedSeq)
                inData = true
                prepareMetricIndex()
                // root pseudo-node (reference ibid:247)
                val rootLoc = Location(null, null, null, null, 0L, null, Model.RootId, Nil)
                val slots = new Array[java.lang.Double](metricCount)
                emit(slots, rootLoc, "root")
                stack.append(Frame(slots, rootLoc, maxDepth))
              case _ => // other header elements: ignore
            }
            else tag match {
              case "M" =>
                val top = stack.last
                if (top.slots != null) {
                  val mid = attr(r, "n").toInt
                  metricIndex.get(mid) match {
                    case Some(slot) => top.slots(slot) = java.lang.Double.valueOf(attr(r, "v"))
                    case None => throw new IllegalArgumentException(
                      s"$pathLabel: measurement references unknown metric id $mid")
                  }
                }
                // M under a skipped callsite frame is dropped (add_local=False, ibid:268)
              case t if Model.MeasurementTypes.contains(t) =>
                val parent = stack.last
                if (parent.remaining.exists(_ <= 0)) {
                  pruneDepth = 1 // prune the whole child subtree (reference ibid:256-257)
                } else if (skipCallsites && t == "C") {
                  // transparent frame: same location, same budget, no row (ibid:266-269)
                  stack.append(Frame(null, parent.location, parent.remaining))
                } else {
                  val loc0 = parent.location
                  val lm = attr(r, "lm"); val f = attr(r, "f"); val l = attr(r, "l")
                  val n = attr(r, "n"); val i = attr(r, "i")
                  require(i != null, s"$pathLabel: <$t> without id attribute")
                  val id = i.toLong
                  val loc = Location(
                    modulePath = if (lm != null) modulesById(lm.toInt) else loc0.modulePath,
                    module = if (lm != null) basename(modulesById(lm.toInt)) else loc0.module,
                    filePath = if (f != null) filesById(f.toInt) else loc0.filePath,
                    file = if (f != null) basename(filesById(f.toInt)) else loc0.file,
                    line = if (l != null) l.toLong else loc0.line,
                    procedure = if (n != null) proceduresById(n.toInt) else loc0.procedure,
                    id = id,
                    callpath = id :: loc0.callpath) // reversed; materialized at emit
                  val slots = new Array[java.lang.Double](metricCount)
                  emit(slots, loc, Model.MeasurementTypes(t))
                  stack.append(Frame(slots, loc, parent.remaining.map(_ - 1)))
                }
              case other =>
                throw new IllegalArgumentException(
                  s"$pathLabel: measurement type '$other' not recognized") // strict (ibid:260-264)
            }

          case XMLStreamConstants.END_ELEMENT =>
            if (pruneDepth > 0) pruneDepth -= 1
            else if (inData) {
              val tag = r.getLocalName
              if (tag == "SecCallPathProfileData") inData = false
              else if (tag == "M") () // self-contained
              else if (Model.MeasurementTypes.contains(tag)) stack.removeLast()
            } else if (r.getLocalName == "Metric") currentMetricName = null

          case _ => // characters/comments: ignore
        }
      }
      val ids = rows.map(_.id)
      require(ids.distinct.size == ids.size, s"$pathLabel: duplicate node ids") // ibid:208
      Parsed(buildMeta(), rows.toIndexedSeq)
    }

    private def prepareMetricIndex(): Unit = {
      val sortedIds = metricsById.keys.toArray.sorted
      metricIndex = sortedIds.zipWithIndex.toMap
      metricCount = sortedIds.length
    }

    private def emit(slots: Array[java.lang.Double], loc: Location, typ: String): Unit = {
      rows += NodeRow(loc.id, loc.callpath.reverseIterator.toArray, typ,
        loc.modulePath, loc.module, loc.filePath, loc.file, loc.line, loc.procedure, slots)
    }

    private def buildMeta(): ProfileMeta = {
      val sorted = metricsById.toSeq.sortBy(_._1) // columns ordered by metric id (ibid:190)
      val names = sorted.map(_._2)
      val pct = Model.determinePercentageColumnBase(names)
      ProfileMeta(
        dbPath = pathLabel,
        metricsById = sorted,
        metricsFormulas = formulas.toMap,
        modulesById = modulesById.toMap,
        filesById = filesById.toMap,
        proceduresById = proceduresById.toMap,
        percentageColumn = pct,
        hotPathColumn = pct + Model.HotPathColumnSuffix,
        compactColumns =
          Model.CompactColumnSuffixes.map(pct + _) ++ Model.CompactLocationColumns)
    }
  }
}
