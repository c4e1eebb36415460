package graft

import org.scalacheck.{Gen, Prop, Test => SCTest}
import org.scalatest.funsuite.AnyFunSuite

import graft.selector.Selector
import graft.selector.Selector.DbInfo

/** Property-based hardening of the selection DSL
  * (ref IntegrityChecks_VLDB.sql:300-349): SelectorSpec pins the
  * reference's examples; these pin the ALGEBRA for arbitrary catalogs and
  * include/exclude sets. */
class SelectorPropertySpec extends AnyFunSuite {

  private def check(prop: Prop): Unit = {
    val res = SCTest.check(SCTest.Parameters.default, prop)
    assert(res.passed, res.status.toString)
  }

  private val genDbName: Gen[String] =
    Gen.choose(1, 6).flatMap(n => Gen.stringOfN(n, Gen.alphaLowerChar))

  private val genCatalog: Gen[Seq[DbInfo]] =
    Gen.listOf(genDbName).map(_.distinct.map(n => DbInfo(n)))

  private val genPattern: Gen[String] = Gen.oneOf(
    genDbName,                                  // exact literal
    genDbName.map(_.take(2) + "%"),             // prefix wildcard
    Gen.const("%"))                             // match-all

  test("exclusion always wins over any inclusion") {
    check(Prop.forAll(genCatalog, genPattern, genPattern) { (cat, inc, exc) =>
      val selected =
        Selector.selectedNames(cat, s"$inc, -$exc").toSet
      val excluded = cat.filter(db =>
        Selector.likeToRegex(exc).matcher(db.name).matches())
      excluded.forall(db => !selected(db.name))
    })
  }

  test("selection is monotone in inclusions and a subset of the catalog") {
    check(Prop.forAll(genCatalog, genPattern, genPattern) { (cat, p1, p2) =>
      val s1 = Selector.selectedNames(cat, p1).toSet
      val s12 = Selector.selectedNames(cat, s"$p1, $p2").toSet
      s1.subsetOf(s12) && s12.subsetOf(cat.map(_.name).toSet)
    })
  }

  test("ALL_DATABASES minus X equals ALL_DATABASES with X excluded") {
    check(Prop.forAll(genCatalog, genPattern) { (cat, p) =>
      val viaDsl = Selector.selectedNames(cat, s"ALL_DATABASES, -$p").toSet
      val all = Selector.selectedNames(cat, "ALL_DATABASES").toSet
      val matchedByP = cat.map(_.name)
        .filter(n => Selector.likeToRegex(p).matcher(n).matches()).toSet
      viaDsl == (all -- matchedByP)
    })
  }

  test("check order is deterministic: same DSL, same catalog, same order") {
    check(Prop.forAll(genCatalog, genPattern) { (cat, p) =>
      Selector.selectedNames(cat, p) ==
        Selector.selectedNames(cat.reverse, p)
    })
  }
}
