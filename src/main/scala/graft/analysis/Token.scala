package graft.analysis

/** One analyzed token.
  *
  * Mirrors the attribute bundle of the reference's token stream
  * (term text, position increment, offsets, type — see
  * /root/reference/src/core/analysis/tokenattributes and
  * /root/reference/src/core/analysis/standard/StandardTokenizer.cpp:85-118)
  * as a plain immutable value, which is what a Spark `mapPartitions`
  * pipeline wants.
  *
  * @param term    token text after all filters
  * @param posIncr position increment relative to the previous emitted token
  *                (>1 when stop words / over-long tokens were skipped)
  * @param start   start character offset in the source text
  * @param end     end character offset (exclusive)
  * @param tpe     token type id (TokenType constants)
  */
final case class Token(term: String, posIncr: Int, start: Int, end: Int, tpe: Int,
    payload: Array[Byte] = null)

/** Token type ids — same numbering as the reference
  * (/root/reference/src/core/analysis/standard/StandardTokenizer.cpp:18-28). */
object TokenType {
  val ALPHANUM = 0
  val APOSTROPHE = 1
  val ACRONYM = 2
  val COMPANY = 3
  val EMAIL = 4
  val HOST = 5
  val NUM = 6
  val CJ = 7
  /** Deprecated host-with-trailing-dot match; re-emitted as HOST with the
    * trailing '.' stripped (StandardTokenizer.cpp:103-110). */
  val ACRONYM_DEP = 8

  val names: Array[String] = Array(
    "<ALPHANUM>", "<APOSTROPHE>", "<ACRONYM>", "<COMPANY>",
    "<EMAIL>", "<HOST>", "<NUM>", "<CJ>", "<ACRONYM_DEP>")
}
