package graft.mr

import org.scalatest.funsuite.AnyFunSuite

/** Edge cases matching the reference's maxsplit=1 + drop-malformed
  * semantics (/root/reference/client/scripts/reducer.py:9-27). */
class KVCodecSpec extends AnyFunSuite {
  test("no tab → malformed, dropped") {
    assert(KVCodec.decode("no tab here").isEmpty)
  }
  test("value may contain tabs (maxsplit=1)") {
    assert(KVCodec.decode("k\tv1\tv2").contains(("k", "v1\tv2")))
  }
  test("empty value") {
    assert(KVCodec.decode("k\t").contains(("k", "")))
  }
  test("empty key") {
    assert(KVCodec.decode("\tv").contains(("", "v")))
  }
  test("round trip") {
    val kv = ("word", "1")
    assert(KVCodec.decode(KVCodec.encode(kv)).contains(kv))
  }
}
