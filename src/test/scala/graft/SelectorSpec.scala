package graft

import org.scalatest.funsuite.AnyFunSuite
import org.scalacheck.Gen

import graft.selector.Selector
import graft.selector.Selector.{DbInfo, ObjectRef}
import graft.functions.Strings

/** Selection-DSL cases from FIXTURES.md §A (reference README.md:8-22 +
  * IntegrityChecks_VLDB.sql:300-349) + property tests (SURVEY.md §5). */
class SelectorSpec extends AnyFunSuite {

  /** Minimal property harness over scalacheck Gens (scalatestplus is not
    * in the offline cache; 200 samples per property). */
  private def forSamples[A](g: Gen[A], n: Int = 200)(f: A => Unit): Unit = {
    val seed0 = org.scalacheck.rng.Seed(42L)
    (0 until n).foldLeft(seed0) { (seed, _) =>
      g.apply(Gen.Parameters.default, seed).foreach(f)
      seed.next
    }
  }

  val catalog = Seq(
    DbInfo("master", isSystem = true),
    DbInfo("msdb", isSystem = true),
    DbInfo("model", isSystem = true),
    DbInfo("tempdb", isSystem = true),
    DbInfo("Db1"), DbInfo("Db2"), DbInfo("MyDb"),
    DbInfo("odd_name"), DbInfo("oddXname"),
    DbInfo("snap1", isSnapshot = true))

  def sel(dsl: String): Seq[String] = Selector.selectedNames(catalog, dsl)

  test("ALL_DATABASES selects all but tempdb and snapshots") {
    assert(sel("ALL_DATABASES") ===
      Seq("Db1", "Db2", "master", "model", "msdb", "MyDb", "odd_name",
        "oddXname").sortBy(_.toLowerCase))
  }
  test("SYSTEM_DATABASES selects system dbs minus tempdb") {
    assert(sel("SYSTEM_DATABASES").toSet === Set("master", "msdb", "model"))
  }
  test("USER_DATABASES selects user dbs") {
    assert(sel("USER_DATABASES").toSet ===
      Set("Db1", "Db2", "MyDb", "odd_name", "oddXname"))
  }
  test("explicit name") { assert(sel("Db1") === Seq("Db1")) }
  test("two names keep DSL order") { assert(sel("Db2, Db1") === Seq("Db2", "Db1")) }
  test("exclusion wins (USER_DATABASES, -Db1)") {
    assert(sel("USER_DATABASES, -Db1").toSet ===
      Set("Db2", "MyDb", "odd_name", "oddXname"))
  }
  // Matching is case-insensitive like the reference's default collation,
  // so '%Db%' also matches 'msdb'.
  test("wildcard %Db%") {
    assert(sel("%Db%").toSet === Set("Db1", "Db2", "MyDb", "msdb"))
  }
  test("wildcard include with exclude (%Db%, -Db1)") {
    assert(sel("%Db%, -Db1").toSet === Set("Db2", "MyDb", "msdb"))
  }
  test("ALL_DATABASES, -%Db% removes matching") {
    assert(sel("ALL_DATABASES, -%Db%").toSet ===
      Set("master", "model", "odd_name", "oddXname"))
  }
  test("bracketed [odd_name]") { assert(sel("[odd_name]") === Seq("odd_name")) }
  test("literal underscore does not act as wildcard (ref IC:304)") {
    // 'odd_name' must NOT match 'oddXname'
    assert(sel("odd_name") === Seq("odd_name"))
  }
  test("tempdb requires exact name (ref IC:307)") {
    assert(!sel("ALL_DATABASES").contains("tempdb"))
    assert(!sel("%db%").contains("tempdb"))
    assert(sel("tempdb") === Seq("tempdb"))
  }
  test("snapshot requires exact name (ref IC:318)") {
    assert(!sel("ALL_DATABASES").contains("snap1"))
    assert(sel("snap1") === Seq("snap1"))
  }
  test("case-insensitive matching") { assert(sel("DB1") === Seq("Db1")) }
  test("CR/LF and spacing normalized (ref IC:233-239)") {
    assert(sel(" Db1 ,\r\n Db2 ") === Seq("Db1", "Db2"))
  }
  test("order assignment follows StartPosition then name (ref IC:343-349)") {
    val r = Selector.resolve(catalog, "Db2, Db1, MyDb").filter(_.selected)
    assert(r.map(_.name) === Seq("Db2", "Db1", "MyDb"))
    assert(r.map(_.order) === Seq(1, 2, 3))
  }

  // --- properties
  val nameGen: Gen[String] = Gen.nonEmptyListOf(Gen.alphaNumChar).map(_.mkString)

  test("property: exclusion always wins over inclusion") {
    forSamples(Gen.nonEmptyListOf(nameGen)) { names =>
      val cat = names.distinct.map(DbInfo(_))
      cat.foreach { db =>
        val r = Selector.selectedNames(cat, s"ALL_DATABASES, -${db.name}")
        assert(!r.contains(db.name))
      }
    }
  }
  test("property: selected set is monotone under adding includes") {
    forSamples(Gen.zip(Gen.nonEmptyListOf(nameGen), nameGen)) {
      case (names, extra) =>
        val cat = names.distinct.map(DbInfo(_))
        val base = Selector.selectedNames(cat, names.head).toSet
        val more = Selector.selectedNames(cat, s"${names.head}, $extra").toSet
        assert(base.subsetOf(more))
    }
  }
  test("property: resolve is deterministic") {
    forSamples(Gen.listOf(nameGen)) { names =>
      val cat = names.distinct.map(DbInfo(_))
      val a = Selector.resolve(cat, "ALL_DATABASES")
      val b = Selector.resolve(cat, "ALL_DATABASES")
      assert(a === b)
    }
  }

  // --- 3-part object DSL (ref DIC:645-692)
  val inv = Seq(
    ObjectRef("testdb", "main", "lineitem"),
    ObjectRef("testdb", "main", "orders"),
    ObjectRef("testdb", "aux", "lineitem"),
    ObjectRef("proddb", "main", "lineitem"))

  test("3-part object include") {
    assert(Selector.resolveObjects(inv, "testdb.main.lineitem") ===
      Right(Seq(ObjectRef("testdb", "main", "lineitem"))))
  }
  test("3-part wildcard + exclude") {
    assert(Selector.resolveObjects(inv, "testdb.%.%, -testdb.aux.%") ===
      Right(Seq(ObjectRef("testdb", "main", "lineitem"),
        ObjectRef("testdb", "main", "orders"))))
  }
  test("non-3-part item rejected (ref DIC:869-880)") {
    assert(Selector.resolveObjects(inv, "main.lineitem").isLeft)
  }
  test("bracketed parts with dots") {
    assert(Selector.splitParts("[a.b].main.t") === Seq("a.b", "main", "t"))
  }

  // --- string helpers (ref IC:523, DIC:682-684)
  test("quoteName doubles closing brackets") {
    assert(Strings.quoteName("a]b") === "[a]]b]")
  }
  test("parseName indexes from the right, NULL past end") {
    assert(Strings.parseName("db.sch.obj", 1) === Some("obj"))
    assert(Strings.parseName("db.sch.obj", 3) === Some("db"))
    assert(Strings.parseName("sch.obj", 3) === None)
  }
}
