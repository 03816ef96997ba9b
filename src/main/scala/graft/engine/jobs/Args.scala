package graft.engine.jobs

/** Hand-rolled CLI parsing (M3 in SURVEY.md §2.4): scopt is not resolvable
  * offline, and ~180 LoC of parser boilerplate was the reference's largest
  * single chunk — a `--key value` loop covers the same surface.
  * Bare `--flag` (no value, or followed by another option) parses as "true".
  */
object Args {
  def parse(args: Array[String]): Map[String, String] = {
    @annotation.tailrec
    def loop(rest: List[String], acc: Map[String, String]): Map[String, String] =
      rest match {
        case Nil => acc
        case key :: tail if key.startsWith("--") =>
          val k = key.stripPrefix("--")
          tail match {
            case v :: more if !v.startsWith("--") => loop(more, acc + (k -> v))
            case _ => loop(tail, acc + (k -> "true"))
          }
        case other :: _ =>
          throw new IllegalArgumentException(s"unexpected argument: $other")
      }
    loop(args.toList, Map.empty)
  }

  def required(opts: Map[String, String], key: String): String =
    opts.getOrElse(key,
      throw new IllegalArgumentException(s"missing required option --$key"))
}
