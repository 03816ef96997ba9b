package graft.engine.functions

import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite
import graft.SparkTestSession

/** Pins the [[Md5WindowKeys]] kernel BIT-IDENTICAL to the built-in
  * three-operator formulation it replaced in `Dedup.windowKeys`
  * (`explode(sequence) + substring + md5`) — the published-model tables
  * store these keys without window text, so any divergence would silently
  * desync every later trim against an already-published model. */
class Md5WindowKeysSpec extends AnyFunSuite {
  private lazy val spark = SparkTestSession.spark
  import spark.implicits._

  private val len = 7

  private def builtin(t: org.apache.spark.sql.Column) = t

  test("kernel == md5(substring) for ASCII, multibyte, and 4-byte code points") {
    val docs = Seq(
      (1L, "the quick brown fox jumps over the lazy dog"),
      (2L, "=== subscribe to our newsletter === twice === subscribe ==="),
      (3L, "héllo wörld — ünïcode tëxt with àccénts ànd môre héllo wörld"),
      (4L, "emoji 😀 four-byte 🦄 code points 😀 again"),
      (5L, "exactly7"), // one char over the window
      (6L, "exact7!"), // exactly the window length -> one window
      (7L, "short"), // below the window length -> no windows
      (8L, "") // empty -> no windows
    ).toDF("doc_id", "t")

    val kernel = docs
      .filter(length($"t") >= len)
      .select($"doc_id", posexplode(F.md5WindowKeys($"t", len)).as(Seq("pos", "wk")))
    val reference = docs
      .filter(length($"t") >= len)
      .select($"doc_id",
        explode(sequence(lit(0), length($"t") - len)).as("pos"), $"t")
      .select($"doc_id", $"pos", md5($"t".substr($"pos" + 1, lit(len))).as("wk"))

    assert(kernel.exceptAll(reference).isEmpty &&
      reference.exceptAll(kernel).isEmpty)
    // docs 7 and 8 contribute zero windows; doc 6 exactly one
    val byDoc = kernel.groupBy($"doc_id").count().as[(Long, Long)]
      .collect().toMap
    assert(!byDoc.contains(7L) && !byDoc.contains(8L) && byDoc(6L) == 1L)
  }

  test("malformed UTF-8 leading bytes: kernel == Spark's own length/" +
      "substring/md5 expressions (0xC0/0xC1 and 0xF5-0xFF advance 1 byte)") {
    import org.apache.spark.sql.catalyst.expressions.{Cast, Length, Literal, Md5, Substring}
    import org.apache.spark.sql.catalyst.util.ArrayData
    import org.apache.spark.sql.types.{BinaryType, StringType}
    import org.apache.spark.unsafe.types.UTF8String
    val wlen = 3
    val cases: Seq[Array[Byte]] = Seq(
      Array[Int](0xC0, 'a', 'b', 'c', 0xC1, 'd'), // overlong 2-byte leads
      Array[Int](0xF5, 'x', 'y', 'z', 0xFF, 'w', 'v'), // beyond U+10FFFF
      Array[Int]('a', 0x80, 'b', 'c', 'd'), // bare continuation byte
      Array[Int](0xE2, 0x82, 0xAC, 'a', 'b', 'c') // valid 3-byte control
    ).map(_.map(_.toByte))
    cases.foreach { bytes =>
      val lit = Literal(UTF8String.fromBytes(bytes), StringType)
      val n = Length(lit).eval(null).asInstanceOf[Int]
      val expected = (0 to n - wlen).map { pos =>
        Md5(Cast(Substring(lit, Literal(pos + 1), Literal(wlen)),
          BinaryType)).eval(null).asInstanceOf[UTF8String].toString
      }
      val arr = Md5WindowKeys(lit, wlen).eval(null).asInstanceOf[ArrayData]
      val got = (0 until arr.numElements())
        .map(i => arr.getUTF8String(i).toString)
      assert(got == expected,
        s"diverged on bytes ${bytes.map(b => f"${b & 0xff}%02x").mkString(" ")}")
    }
  }

  test("window count is chars - len + 1 and keys are 32-char lowercase hex") {
    val out = Seq("abcdefghij").toDF("t")
      .select(F.md5WindowKeys($"t", 3).as("wks"))
      .select(explode($"wks").as("wk")).as[String].collect()
    assert(out.length == 8)
    assert(out.forall(_.matches("[0-9a-f]{32}")))
  }
}
