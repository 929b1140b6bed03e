package graft.plans

import org.scalatest.funsuite.AnyFunSuite

/** The sums-list splitter's contract: top-level commas separate specs;
  * parentheses and SQL string literals (with BOTH the doubled-quote
  * and the default backslash escape) are opaque; malformed input
  * refuses instead of silently misparsing persisted fold rules. */
class LakeViewSqlParseSpec extends AnyFunSuite {

  test("sumSpecs: top-level commas only; parens nest; literals opaque") {
    assert(LakeViewSql.sumSpecs("a,b:CAST(x AS DECIMAL(18,2)),c") ==
      Seq("a", "b:CAST(x AS DECIMAL(18,2))", "c"))
    assert(LakeViewSql.sumSpecs("l:concat(x, ',', y),m") ==
      Seq("l:concat(x, ',', y)", "m"))
    // doubled-quote escape: the ( and , inside stay literal content
    assert(LakeViewSql.sumSpecs("l:replace(x, 'it''s, (', y),m") ==
      Seq("l:replace(x, 'it''s, (', y)", "m"))
    // backslash escape (Spark's default parser): \' stays inside the
    // literal — the scan must not exit the quote state early
    assert(LakeViewSql.sumSpecs("""l:replace(x, 'it\'s, (', y),m""") ==
      Seq("""l:replace(x, 'it\'s, (', y)""", "m"))
    // escaped backslash before the closing quote: '\\' ENDS the literal
    assert(LakeViewSql.sumSpecs("""l:replace(x, 'a\\', y),m""") ==
      Seq("""l:replace(x, 'a\\', y)""", "m"))
  }

  test("sumSpecs: unbalanced parens and unterminated literals refuse") {
    intercept[IllegalArgumentException](LakeViewSql.sumSpecs("a:f(x"))
    intercept[IllegalArgumentException](LakeViewSql.sumSpecs("a:f)x("))
    intercept[IllegalArgumentException](
      LakeViewSql.sumSpecs("a:'unterminated"))
    intercept[IllegalArgumentException](
      LakeViewSql.sumSpecs("""a:'ends escaped\'"""))
  }
}
