package graft

import org.scalatest.funsuite.AnyFunSuite
import graft.rime.RimeSpec

class RimeCompilerSpec extends AnyFunSuite {

  test("parses sided terms, stokes and corrs") {
    val s = RimeSpec.parse("(Gp,Kpq,Bpq,Gq): [I,Q,U,V] -> [XX,XY,YX,YY]")
    assert(s.terms.map(_.letter) === Seq('G', 'K', 'B', 'G'))
    assert(s.terms.map(_.side) === Seq("p", "pq", "pq", "q"))
    assert(s.stokes === Seq("I", "Q", "U", "V"))
    assert(s.corrs === Seq("XX", "XY", "YX", "YY"))
    assert(s.feed === "linear")
    assert(s.leftDie === Seq('G') && s.rightDie === Seq('G'))
  }

  test("tolerates whitespace and subscript variants") {
    val s = RimeSpec.parse(" ( Kpq , Bpq ) : [ I ] -> [ XX , YY ] ")
    assert(s.terms.map(_.letter) === Seq('K', 'B'))
    assert(s.stokes === Seq("I"))
    assert(s.corrs === Seq("XX", "YY"))
  }

  test("feed type is inferred from the correlation basis") {
    assert(RimeSpec.parse("(Kpq,Bpq): [I,V] -> [RR,LL]").feed === "circular")
    assertThrows[IllegalArgumentException](
      RimeSpec.parse("(Kpq,Bpq): [I] -> [XX,RR]")) // mixed bases
  }

  test("G and L combine in spec order; DDE terms are sided") {
    val s = RimeSpec.parse("(Gp,Lp,Kpq,Bpq,Lq,Gq): [I,Q] -> [XX,XY,YX,YY]")
    assert(s.leftDie === Seq('G', 'L') && s.rightDie === Seq('L', 'G'))
    val e = RimeSpec.parse("(Ep,Kpq,Bpq,Eq): [I,Q] -> [XX,XY,YX,YY]")
    assert(e.leftDde === Seq('E') && e.rightDde === Seq('E'))
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
