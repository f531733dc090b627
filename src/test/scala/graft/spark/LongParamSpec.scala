package graft.spark

import org.scalatest.funsuite.AnyFunSuite
import org.apache.spark.sql.catalyst.expressions.codegen.CodegenContext

/** LongParam: a plan parameter whose generated source text is identical
  * across values, so per-wave constants (wave number, penalty horizon)
  * stop forcing whole-stage-codegen recompiles every wave of the crawl
  * loop. These tests pin the three load-bearing properties.
  */
class LongParamSpec extends AnyFunSuite {
  private lazy val spark = graft.engine.EngineSpec.spark

  test("evaluates to its value") {
    assert(LongParam(42L).eval(null) == 42L)
    assert(LongParam(Long.MinValue).eval(null) == Long.MinValue)
  }

  test("generated source text is value-independent (codegen cache hit across waves)") {
    // Fresh contexts, different values: the emitted Java must be
    // byte-identical — the value travels via ctx.references, not the
    // source text. This is the whole point of the expression: Janino's
    // class cache keys on source text, and `lit(wave)` misses it every
    // wave.
    def src(v: Long): String = {
      val ctx = new CodegenContext
      LongParam(v).genCode(ctx).code.toString
    }
    assert(src(1L) == src(999999L))
  }

  test("non-foldable: constant folding cannot inline it back into the source") {
    assert(!LongParam(7L).foldable)
  }

  test("end-to-end through a projection and a filter") {
    import spark.implicits._
    import org.apache.spark.sql.functions._
    val df = Seq(1L, 5L, 9L).toDF("x")
    val out = df.select($"x", LongParam.col(3L).as("w"))
      .filter($"x" > LongParam.col(4L))
      .collect()
    assert(out.map(_.getLong(0)).sorted.sameElements(Array(5L, 9L)))
    assert(out.forall(_.getLong(1) == 3L))
  }
}
