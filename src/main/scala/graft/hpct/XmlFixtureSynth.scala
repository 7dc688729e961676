package graft.hpct

import java.nio.charset.StandardCharsets.UTF_8
import java.nio.file.{Files, Path, Paths}

/** Deterministic many-file experiment-XML corpus for the distributed load path
  * (SURVEY A1 — the reference's production shape is one experiment database per
  * run directory, many runs per study): variant copies of a reference fixture
  * whose metric FAMILY is renamed per variant, so a multi-file load sees
  * genuinely disjoint metric families and must exercise the union-schema path
  * (per-file slots, per-file formulas, per-db percentage bases) rather than
  * coalescing 50 identical schemas.
  *
  * The rename is a byte-level replace of the family prefix (the text before
  * ':' in every `Metric n="FAMILY:agg (I|E)"` declaration, e.g.
  * "CPUTIME (usec)" → "F03~CPUTIME (usec)"). Node measurements reference
  * metrics by id (`<M n="2" …>`), so the tree bytes are untouched and every
  * per-db computation — formulas, root fix, ratio walk-ups — must reproduce
  * the source fixture's VALUES under the renamed columns; the loadmany
  * ScaleCheck step and LoadManySpec pin exactly that.
  */
object XmlFixtureSynth {

  private val FamilyPattern = """<Metric\s+i="\d+"\s+n="([^":]+):""".r

  /** The metric-family prefix of the fixture at `src` (from its first Metric
    * declaration). Fails loudly on a file with no named metrics — renaming
    * nothing would silently degrade the corpus to identical copies.
    */
  def familyOf(src: String): String = {
    val head = new String(Files.readAllBytes(Paths.get(src)), UTF_8)
    FamilyPattern.findFirstMatchIn(head).map(_.group(1)).getOrElse(
      throw new IllegalArgumentException(s"no Metric n= declaration found in $src"))
  }

  /** Write `n` variant copies of `src` into `dir`, cycling `families` distinct
    * renamed metric families (variant j gets family `F{j % families}~{orig}`).
    * `families` < `n` deliberately makes some variants SHARE a renamed family:
    * the shared-name path (loadMany keeps the first file's formula for a name
    * seen twice) gets exercised alongside the disjoint path. Returns
    * (path, renamedFamily) per variant, in variant order.
    */
  def variants(src: String, dir: Path, n: Int, families: Int,
      prefix: String = "exp"): Seq[(String, String)] = {
    require(n > 0 && families > 0 && families <= n,
      s"need 0 < families <= n, got n=$n families=$families")
    val fam = familyOf(src)
    val content = new String(Files.readAllBytes(Paths.get(src)), UTF_8)
    // The rename below is a GLOBAL byte replace; the documented "tree bytes
    // untouched" invariant holds only while the family string appears solely
    // in `Metric n="FAMILY:…"` declarations. A fixture whose family text also
    // occurs in the tree (a procedure/file/module name) would silently mutate
    // measurement rows — so count both and fail loudly on any stray occurrence.
    // Non-overlapping count (indexOf stepping by fam.length), matching
    // replace()'s semantics — a sliding() count would tally overlapping
    // occurrences of a self-overlapping family string and false-fail the
    // guard on a clean fixture (and is O(len × fam) besides).
    val totalOccurrences = {
      var i = content.indexOf(fam); var n = 0
      while (i >= 0) { n += 1; i = content.indexOf(fam, i + fam.length) }
      n
    }
    val declOccurrences =
      (" n=\"" + java.util.regex.Pattern.quote(fam) + ":").r
        .findAllMatchIn(content).size
    require(totalOccurrences == declOccurrences,
      s"family '$fam' occurs $totalOccurrences times in $src but only " +
        s"$declOccurrences times as a Metric n= declaration — a global " +
        "replace would mutate tree bytes; scope the fixture's family string")
    Files.createDirectories(dir)
    (0 until n).map { j =>
      val renamed = f"F${j % families}%02d~$fam"
      val p = dir.resolve(f"${prefix}_$j%03d.xml")
      Files.write(p, content.replace(fam, renamed).getBytes(UTF_8))
      (p.toString, renamed)
    }
  }
}
