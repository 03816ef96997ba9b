package graft.engine.relational

import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite
import graft.SparkTestSession.spark

/** Bucketed/SMB contracts: zero shuffle exchanges on a co-bucketed join,
  * value equality with the plain join, and the refusals that keep a
  * silently-degraded (re-shuffling) join from masquerading as SMB. */
class BucketedSpec extends AnyFunSuite {
  import spark.implicits._

  private val pid = ProcessHandle.current().pid()
  private def tbl(s: String) = s"bucketed_spec_${s}_$pid"

  private lazy val facts = (1L to 2000L)
    .map(i => (i % 97, i, (i % 13).toDouble)).toDF("k", "row_id", "v")
  private lazy val dims = (0L until 97L).map(k => (k, s"grp${k % 5}"))
    .toDF("k", "grp")

  test("co-bucketed join: zero shuffles, same values as the plain join") {
    Bucketed.publishTable(facts, tbl("facts"), nBuckets = 8, keyCols = Seq("k"))
    Bucketed.publishTable(dims, tbl("dims"), nBuckets = 8, keyCols = Seq("k"))
    val joined = Bucketed.smbJoin(spark, tbl("facts"), tbl("dims"), Seq("k"))
    assert(Bucketed.shuffleCount(joined) == 0,
      s"SMB join must add no exchange:\n${joined.queryExecution.executedPlan}")
    val smb = joined.groupBy("grp").agg(count(lit(1)).as("n"))
      .collect().map(r => r.getString(0) -> r.getLong(1)).toMap
    val plain = facts.join(dims, Seq("k")).groupBy("grp")
      .agg(count(lit(1)).as("n"))
      .collect().map(r => r.getString(0) -> r.getLong(1)).toMap
    assert(smb == plain && smb.values.sum == 2000L)
  }

  test("mismatched bucket counts are refused") {
    Bucketed.publishTable(facts, tbl("f8"), nBuckets = 8, keyCols = Seq("k"))
    Bucketed.publishTable(dims, tbl("d4"), nBuckets = 4, keyCols = Seq("k"))
    val ex = intercept[IllegalArgumentException] {
      Bucketed.smbJoin(spark, tbl("f8"), tbl("d4"), Seq("k"))
    }
    assert(ex.getMessage.contains("re-shuffle"))
  }

  test("joining on non-bucket keys or unbucketed tables is refused") {
    Bucketed.publishTable(facts, tbl("fk"), nBuckets = 4, keyCols = Seq("k"))
    Bucketed.publishTable(dims, tbl("dk"), nBuckets = 4, keyCols = Seq("k"))
    val keyMismatch = intercept[IllegalArgumentException] {
      Bucketed.smbJoin(spark, tbl("fk"), tbl("dk"), Seq("row_id"))
    }
    assert(keyMismatch.getMessage.contains("co-location"))
    dims.write.mode(org.apache.spark.sql.SaveMode.Overwrite)
      .saveAsTable(tbl("flat"))
    val unbucketed = intercept[IllegalArgumentException] {
      Bucketed.smbJoin(spark, tbl("fk"), tbl("flat"), Seq("k"))
    }
    assert(unbucketed.getMessage.contains("not bucketed"))
  }
}
