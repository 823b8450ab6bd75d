package graft

import org.scalatest.funsuite.AnyFunSuite
import graft.rime.RimeSpec

class RimeCompilerSpec extends AnyFunSuite {

  test("parses terms, stokes and corrs") {
    val s = RimeSpec.parse("(Gp,Kpq,Bpq,Gq): [I,Q,U,V] -> [XX,XY,YX,YY]")
    assert(s.terms === Seq('G', 'K', 'B', 'G'))
    assert(s.stokes === Seq("I", "Q", "U", "V"))
    assert(s.corrs === Seq("XX", "XY", "YX", "YY"))
  }

  test("tolerates whitespace and subscript variants") {
    val s = RimeSpec.parse(" ( Kpq , Bpq ) : [ I ] -> [ XX , YY ] ")
    assert(s.terms === Seq('K', 'B'))
    assert(s.stokes === Seq("I"))
    assert(s.corrs === Seq("XX", "YY"))
  }

  test("rejects malformed specs") {
    assertThrows[IllegalArgumentException](RimeSpec.parse("Kpq,Bpq"))
    assertThrows[IllegalArgumentException](
      RimeSpec.parse("(Zpq): [I] -> [XX]"))
    assertThrows[IllegalArgumentException](
      RimeSpec.parse("(Kpq): [W] -> [XX]"))
    assertThrows[IllegalArgumentException](
      RimeSpec.parse("(Kpq): [I] -> [AA]"))
  }

  test("implicit-zero stokes: [I] alone gives XX == YY") {
    import org.apache.spark.sql.functions._
    val spark = TestSpark.spark
    val src = graft.queries.SyntheticMs.sources(spark, TestSpark.sf, 3)
      .withColumn("i", col("flux"))
    val out = graft.rime.RimeCompiler.plan("(Kpq,Bpq): [I] -> [XX,YY]",
      src, graft.queries.SyntheticMs.uvwRows(spark, TestSpark.sf, 64),
      graft.queries.SyntheticMs.channels(spark, TestSpark.sf, 2))
    val bad = out.filter(col("xx_re") =!= col("yy_re") ||
      col("xx_im") =!= col("yy_im")).count()
    assert(bad === 0)
  }
}
