package graft.mr

/** Tab-separated key/value line codec — the reference's only intermediate
  * record format (SURVEY.md §1.1): key = bytes before the FIRST tab, value =
  * remainder (which may itself contain tabs; `maxsplit=1` semantics of
  * /root/reference/client/scripts/reducer.py:9-11). Lines with no tab are
  * malformed; the reference reducer silently drops them (reducer.py:25-27),
  * so `decode` returns None and callers drop.
  */
object KVCodec {
  val Sep = '\t'

  def encode(kv: (String, String)): String = kv._1 + Sep + kv._2

  def decode(line: String): Option[(String, String)] = {
    val i = line.indexOf(Sep)
    if (i < 0) None else Some((line.substring(0, i), line.substring(i + 1)))
  }
}
