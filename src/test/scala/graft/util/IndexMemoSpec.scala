package graft.util

import scala.collection.mutable.ArrayBuffer

import org.scalatest.funsuite.AnyFunSuite

import graft.SparkFixture

class IndexMemoSpec extends AnyFunSuite with SparkFixture {

  test("bounded LRU: hit refreshes recency, overflow evicts + releases oldest, invalidate releases") {
    val released = ArrayBuffer.empty[String]
    val memo = new IndexMemo[String](2)(released += _)
    assert(memo.getOrElseUpdate(spark, "a")("va") == "va")
    assert(memo.getOrElseUpdate(spark, "b")("vb") == "vb")
    assert(memo.getOrElseUpdate(spark, "a")("WRONG") == "va") // memo hit, refreshes LRU
    assert(memo.getOrElseUpdate(spark, "c")("vc") == "vc")    // evicts b, not a
    assert(released.toSeq == Seq("vb"))
    assert(memo.getOrElseUpdate(spark, "a")("WRONG2") == "va") // a survived
    assert(memo.getOrElseUpdate(spark, "b")("vb2") == "vb2")   // b rebuilt
    memo.invalidate(spark, "b")
    assert(released.contains("vb2"))
    assert(memo.getOrElseUpdate(spark, "b")("vb3") == "vb3")
    assert(memo.size <= 2)
  }
}
