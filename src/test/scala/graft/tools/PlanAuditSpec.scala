package graft.tools

import org.apache.spark.sql.functions._
import org.apache.spark.sql.expressions.{Window => W}
import org.scalatest.funsuite.AnyFunSuite
import graft.SparkTestSession.{sfDir, spark}
import graft.engine.{Registry, Tables}

/** Automated scale audit: every registered query's plan is checked for the
  * shapes that are correct on testdata but die at 100 TB (see PlanAudit).
  * Runs with autoBroadcastJoinThreshold = -1 so a dim join passes only via
  * an EXPLICIT broadcast hint — the sf0.001 fixture sizes would otherwise
  * auto-broadcast everything and the check would test nothing. */
class PlanAuditSpec extends AnyFunSuite {

  /** Build plans in a strict, hint-only planning regime, then restore. */
  private def strictPlanning[A](body: => A): A = {
    val conf = spark.conf
    val aqe = conf.get("spark.sql.adaptive.enabled", "true")
    val thresh = conf.get("spark.sql.autoBroadcastJoinThreshold", "10485760")
    conf.set("spark.sql.adaptive.enabled", "false")
    conf.set("spark.sql.autoBroadcastJoinThreshold", "-1")
    try body
    finally {
      conf.set("spark.sql.adaptive.enabled", aqe)
      conf.set("spark.sql.autoBroadcastJoinThreshold", thresh)
    }
  }

  test("the audit catches a planted cartesian product") {
    strictPlanning {
      val a = Tables.nation(spark, sfDir)
      val b = Tables.region(spark, sfDir)
      val bad = a.crossJoin(b) // no broadcast hint, threshold -1
      assert(PlanAudit.violations(bad).exists(_.contains("CartesianProduct")))
      // hinted cross join (the brute-force-scoring pattern) is allowed
      val ok = a.crossJoin(broadcast(b))
      assert(!PlanAudit.violations(ok).exists(_.contains("CartesianProduct")))
    }
  }

  test("the audit catches a planted global window over raw rows") {
    strictPlanning {
      val bad = Tables.lineitem(spark, sfDir)
        .withColumn("rn", row_number().over(W.orderBy(col("l_orderkey"))))
      assert(PlanAudit.violations(bad).exists(_.contains("no PARTITION BY")))
      // a global window over an aggregate (bounded input) is allowed
      val ok = Tables.lineitem(spark, sfDir)
        .groupBy(col("l_returnflag")).agg(sum(col("l_quantity")).as("s"))
        .withColumn("rn", row_number().over(W.orderBy(col("s"))))
      assert(!PlanAudit.violations(ok).exists(_.contains("no PARTITION BY")))
    }
  }

  test("the audit catches a planted sort-merge join against a fixed-size dim") {
    strictPlanning {
      val bad = Tables.customer(spark, sfDir)
        .join(Tables.nation(spark, sfDir),
          col("c_nationkey") === col("n_nationkey"))
      assert(PlanAudit.violations(bad).exists(_.contains("nation")))
      val ok = Tables.customer(spark, sfDir)
        .join(broadcast(Tables.nation(spark, sfDir)),
          col("c_nationkey") === col("n_nationkey"))
      assert(!PlanAudit.violations(ok).exists(_.contains("nation")))
    }
  }

  test("no registered query carries a scale-killer plan shape") {
    strictPlanning {
      // Queries that execute eagerly inside run() (harness summaries that
      // collect tiny results) still RETURN a final DataFrame — that plan is
      // what lands downstream and is what gets audited. Eager internals run
      // at sf0.001, so the sweep stays fast.
      val failures = Registry.all.flatMap { q =>
        try PlanAudit.violations(q.run(spark, sfDir)).map(v => s"${q.name}: $v")
        catch { case e: Throwable => Seq(s"${q.name}: audit errored: $e") }
      }
      assert(failures.isEmpty, failures.mkString("\n"))
    }
  }
}
