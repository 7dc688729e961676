package graft.queries

import org.scalatest.funsuite.AnyFunSuite
import org.apache.spark.sql.functions._
import graft.SparkTestBase.spark

/** d11 decontamination: the probe must normalize (lowercase + punctuation-strip)
  * before shingling — contamination hides behind case/punctuation trivially, and a
  * raw-text probe would miss it.
  */
class DecontamSpec extends AnyFunSuite {

  private def docsDf(rows: (Long, String)*) = {
    val s = spark
    import s.implicits._
    s.sparkContext.parallelize(rows).toDF("doc_id", "text")
  }

  test("a case- and punctuation-differing contaminated doc is caught") {
    // doc 13 is on the eval side (13 % 13 == 0); doc 1 carries the same sentence
    // re-cased and re-punctuated — zero raw shingles in common, full overlap
    // after normalization
    val docs = docsDf(
      13L -> "The Quick, Brown Fox! Jumps Over The Lazy Dog.",
      1L -> "the quick brown fox jumps over the lazy dog",
      2L -> "an entirely different document about something else here")
    val out = TextOps.decontaminateFrom(TextOps.decontamShinglesOf(docs))
      .collect().map(r => r.getLong(0) -> r.getLong(1)).toMap
    // 9 normalized tokens -> 7 trigrams, all shared
    assert(out === Map(1L -> 7L))
  }

  test("the broadcastEval=false shuffle-join path returns identical rows") {
    // the r10 footprint gate routes corpus-scale inputs (and unknown
    // footprints) through the non-broadcast branch — every large input serves
    // from this plan, so its parity with the broadcast path must be CI-pinned,
    // not an sf100-manual-run assumption
    val docs = docsDf(
      0L -> "alpha beta gamma delta epsilon zeta",
      13L -> "The Quick, Brown Fox! Jumps Over The Lazy Dog.",
      1L -> "the quick brown fox jumps over the lazy dog",
      2L -> "alpha beta gamma delta epsilon zeta eta theta",
      3L -> "an entirely different document about something else here")
    val dsh = TextOps.decontamShinglesOf(docs)
    val viaBroadcast = TextOps.decontaminateFrom(dsh, broadcastEval = true).collect().toSeq
    val viaShuffle = TextOps.decontaminateFrom(dsh, broadcastEval = false).collect().toSeq
    assert(viaShuffle === viaBroadcast)
    assert(viaShuffle.nonEmpty)
  }

  test("the raw-shingle probe would NOT have caught it (the fix is load-bearing)") {
    val docs = docsDf(
      13L -> "The Quick, Brown Fox! Jumps Over The Lazy Dog.",
      1L -> "the quick brown fox jumps over the lazy dog")
    // same pipeline minus normalization: no shingle matches across the pair
    val raw = docs.select(col("doc_id"), split(col("text"), " ").as("tk"))
      .select(col("doc_id"), col("tk"),
        explode(sequence(lit(1), size(col("tk")) - 2)).as("i"))
      .select(col("doc_id"), concat_ws(" ", slice(col("tk"), col("i"), lit(3))).as("shingle"))
      .distinct()
    val evalSh = raw.filter(col("doc_id") % 13 === 0).select("shingle")
    val hits = raw.filter(col("doc_id") % 13 =!= 0).join(evalSh, Seq("shingle")).count()
    assert(hits === 0L)
  }

  test("the pushed-down corpus-scale plan (decontaminateDocs) is row-identical") {
    // the footprint gate routes every large corpus through decontaminateDocs,
    // so its parity with the shared-frame form must be CI-pinned — including
    // the doc-id-filter-commutes-with-explode equivalence it relies on
    val docs = docsDf(
      0L -> "alpha beta gamma delta epsilon zeta",
      13L -> "The Quick, Brown Fox! Jumps Over The Lazy Dog.",
      26L -> "shared trigram sentence held out twice over",
      1L -> "the quick brown fox jumps over the lazy dog",
      2L -> "alpha beta gamma delta epsilon zeta eta theta",
      3L -> "shared trigram sentence held out twice over and more",
      4L -> "an entirely different document about something else here")
    val viaShared = TextOps.decontaminateFrom(
      TextOps.decontamShinglesOf(docs), broadcastEval = false).collect().toSeq
    val viaPushed = TextOps.decontaminateDocs(docs, broadcastEval = false)
      .collect().toSeq
    val viaPushedBc = TextOps.decontaminateDocs(docs, broadcastEval = true)
      .collect().toSeq
    assert(viaPushed === viaShared)
    assert(viaPushedBc === viaShared)
    assert(viaPushed.nonEmpty)
  }
}
