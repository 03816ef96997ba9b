package graft.engine.sources

import java.nio.charset.StandardCharsets
import java.nio.file.Files

import org.apache.spark.sql.functions._
import org.apache.spark.sql.types.{LongType, StringType, StructType}
import org.scalatest.funsuite.AnyFunSuite
import graft.SparkTestSession.spark

class JsonlSpec extends AnyFunSuite {
  import spark.implicits._

  private val schema = new StructType()
    .add("id", LongType).add("text", StringType)

  test("round-trip preserves hostile text: newlines, quotes, unicode, tabs") {
    val rows = Seq(
      (1L, "plain"),
      (2L, "line1\nline2\r\nline3"),          // raw newlines must be escaped
      (3L, """quotes " and \ backslashes"""),
      (4L, "unicode é中文 😀 and\ttabs"),
      (5L, ""))
    val dir = Files.createTempDirectory("jsonl_rt").toString
    Jsonl.writeJsonl(rows.toDF("id", "text"), s"$dir/t")
    val (clean, bad) = Jsonl.readJsonlClean(spark, s"$dir/t", schema)
    assert(bad.count() == 0)
    val got = clean.collect().map(r => (r.getLong(0), r.getString(1))).toSet
    assert(got == rows.toSet, "round-trip must be byte-faithful")
  }

  test("PERMISSIVE read quarantines malformed lines, keeps the good ones") {
    val dir = Files.createTempDirectory("jsonl_bad")
    val f = dir.resolve("part-0.json")
    Files.write(f, Seq(
      """{"id": 1, "text": "ok"}""",
      """{"id": 2 "text": "missing comma"}""",   // malformed
      """not json at all""",                     // malformed
      """{"id": 3, "text": "also ok"}"""
    ).mkString("\n").getBytes(StandardCharsets.UTF_8))
    val (clean, bad) = Jsonl.readJsonlClean(spark, dir.toString, schema)
    assert(clean.select("id").collect().map(_.getLong(0)).toSet == Set(1L, 3L))
    val raw = bad.collect().map(_.getString(0))
    assert(raw.length == 2)
    assert(raw.exists(_.contains("missing comma")))
    assert(raw.exists(_.contains("not json at all")))
  }

  test("blank lines and bare null literals are quarantined, empty object is clean") {
    val dir = Files.createTempDirectory("jsonl_blank")
    Files.write(dir.resolve("part-0.json"), Seq(
      """{"id": 1, "text": "ok"}""",
      "",                               // blank line — quarantine
      "   ",                            // whitespace line — quarantine
      "null",                           // bare null literal — quarantine
      "{}"                              // valid empty object — CLEAN all-null
    ).mkString("\n").getBytes(StandardCharsets.UTF_8))
    val (clean, bad) = Jsonl.readJsonlClean(spark, dir.toString, schema)
    val cleanRows = clean.collect()
    assert(cleanRows.length == 2, s"got ${cleanRows.mkString(";")}")
    assert(cleanRows.count(_.isNullAt(0)) == 1) // the {} row
    assert(bad.count() == 3, "blank, whitespace, and null lines quarantined")
  }

  test("type mismatch under the declared schema is quarantined, not coerced") {
    val dir = Files.createTempDirectory("jsonl_type")
    Files.write(dir.resolve("part-0.json"), Seq(
      """{"id": "not-a-number", "text": "x"}""",
      """{"id": 7, "text": "y"}"""
    ).mkString("\n").getBytes(StandardCharsets.UTF_8))
    val (clean, bad) = Jsonl.readJsonlClean(spark, dir.toString, schema)
    assert(clean.select("id").collect().map(_.getLong(0)).toSet == Set(7L))
    assert(bad.count() == 1)
  }
}
