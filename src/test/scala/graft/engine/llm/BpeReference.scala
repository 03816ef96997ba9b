package graft.engine.llm

/** Single-threaded reference BPE shared by TokenizerSpec and
  * SparkPropertySpec — ONE definition of the semantics the distributed
  * trainer is pinned against (classic leftmost non-overlapping merges,
  * (freq desc, pair asc) tie-break, the `[a-z]+|[0-9]+` length>=2 word
  * extraction of `Tokenizer.trainBpeMerges`). */
object BpeReference {

  def applyMerge(p: List[String], a: String, b: String): List[String] =
    p match {
      case x :: y :: rest if x == a && y == b =>
        (a + b) :: applyMerge(rest, a, b)
      case x :: rest => x :: applyMerge(rest, a, b)
      case Nil => Nil
    }

  def train(texts: Seq[String], n: Int): List[(String, String)] = {
    val wordRe = "[a-z]+|[0-9]+".r
    val wf = scala.collection.mutable.Map.empty[String, Long]
    texts.foreach(t => wordRe.findAllIn(t.toLowerCase).filter(_.length >= 2)
      .foreach(w => wf(w) = wf.getOrElse(w, 0L) + 1L))
    var state = wf.toMap.map { case (w, f) => (w.map(_.toString).toList, f) }
    val out = scala.collection.mutable.ListBuffer.empty[(String, String)]
    var r = 0
    var done = false
    while (r < n && !done) {
      val cnt = scala.collection.mutable.Map.empty[(String, String), Long]
      state.foreach { case (p, f) =>
        p.zip(p.drop(1)).foreach(pr => cnt(pr) = cnt.getOrElse(pr, 0L) + f)
      }
      if (cnt.isEmpty) done = true
      else {
        val ((a, b), _) = cnt.minBy { case ((a, b), c) => (-c, a, b) }
        out += ((a, b))
        state = state.map { case (p, f) => (applyMerge(p, a, b), f) }
        r += 1
      }
    }
    out.toList
  }
}
