package graft.hpct

import org.scalatest.funsuite.AnyFunSuite
import graft.SparkTestBase.spark

/** A13 `seqFilter` (reference `_str_or_regex_sequence_filter`, HD.py:95-120 — dead
  * code there, surfaced here for API completeness). Semantics pinned against the
  * reference's Python: prefix/suffix alignment, equality vs regex FULLmatch (not
  * substring search), length guards, and the fragments NotImplementedError.
  */
class SeqFilterSpec extends AnyFunSuite {
  import spark.implicits._
  import Ops.{Exact, Re}

  private def df = Seq(
    (1L, Seq("main", "solve", "kernel_a")),
    (2L, Seq("main", "solve", "kernel_b")),
    (3L, Seq("main", "io", "write")),
    (4L, Seq("main")),
    (5L, Seq.empty[String])).toDF("id", "frames")

  private def ids(out: org.apache.spark.sql.DataFrame): Seq[Long] =
    out.select("id").collect().map(_.getLong(0)).toSeq.sorted

  test("exact prefix keeps aligned matches only, with the length guard") {
    assert(ids(Ops.seqFilter(df, "frames", prefix = Seq(Exact("main"), Exact("solve"))))
      === Seq(1L, 2L))
    // prefix longer than the sequence -> excluded (HD.py:106-107), incl. empty seq
    assert(ids(Ops.seqFilter(df, "frames",
      prefix = Seq(Exact("main"), Exact("io"), Exact("write"), Exact("x")))) === Nil)
  }

  test("regex elements use fullmatch semantics, not substring search") {
    // 'kernel' alone would SUBSTRING-match kernel_a/kernel_b; fullmatch must not
    assert(ids(Ops.seqFilter(df, "frames", suffix = Seq(Re("kernel")))) === Nil)
    assert(ids(Ops.seqFilter(df, "frames", suffix = Seq(Re("kernel_[ab]")))) === Seq(1L, 2L))
  }

  test("suffix aligns from the end; mixed exact + regex") {
    assert(ids(Ops.seqFilter(df, "frames",
      suffix = Seq(Exact("solve"), Re("kernel_.")))) === Seq(1L, 2L))
    assert(ids(Ops.seqFilter(df, "frames", suffix = Seq(Exact("main")))) === Seq(4L))
  }

  test("prefix and suffix combine conjunctively; empty patterns keep everything") {
    assert(ids(Ops.seqFilter(df, "frames",
      prefix = Seq(Exact("main")), suffix = Seq(Re("write|kernel_a")))) === Seq(1L, 3L))
    assert(ids(Ops.seqFilter(df, "frames")) === Seq(1L, 2L, 3L, 4L, 5L))
  }

  test("fragments raise, mirroring the reference (HD.py:100)") {
    intercept[IllegalArgumentException] {
      Ops.seqFilter(df, "frames", fragments = Seq(Seq(Exact("main"))))
    }
  }
}
