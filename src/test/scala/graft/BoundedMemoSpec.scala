package graft

import graft.core.BoundedMemo
import org.scalatest.funsuite.AnyFunSuite

class BoundedMemoSpec extends AnyFunSuite {

  test("LRU: eldest-by-access entry evicts at the cap and recomputes on next touch") {
    val memo = new BoundedMemo[String, Int](3)
    var computes = 0
    def get(k: String): Int = memo.getOrElseUpdate(k, { computes += 1; k.length })
    get("a"); get("bb"); get("ccc")
    assert(computes == 3 && memo.size == 3)
    get("a") // refresh "a" — "bb" is now eldest
    get("dddd") // cap exceeded → evicts "bb"
    assert(memo.size == 3)
    assert(memo.keysInAccessOrder == Seq("ccc", "a", "dddd"))
    get("a"); get("ccc"); get("dddd")
    assert(computes == 4, "survivors must not recompute")
    get("bb")
    assert(computes == 5, "evicted entry must recompute")
  }

  test("evictIf sweeps matching entries; get/put probe path respects the cap") {
    val memo = new BoundedMemo[String, Int](4)
    for (k <- Seq("s1", "s2", "d1", "d2")) memo.put(k, k.length)
    memo.evictIf((k, _) => k.startsWith("d")) // the dead-session sweep shape
    assert(memo.size == 2 && memo.get("d1").isEmpty && memo.get("s1").contains(2))
    for (k <- Seq("x1", "x2", "x3")) memo.put(k, 0)
    assert(memo.size == 4, "put must honor the LRU cap")
  }

  test("null-tolerant contains semantics: a computed null is cached, not recomputed") {
    val memo = new BoundedMemo[String, String](2)
    var computes = 0
    def get(): String = memo.getOrElseUpdate("k", { computes += 1; null })
    assert(get() == null && get() == null && computes == 1)
  }
}
