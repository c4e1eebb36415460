package graft.selector

import java.util.regex.Pattern

/** The reference's selection DSL (ref IntegrityChecks_VLDB.sql:213-349,
  * "LOVINGLY STOLEN FROM OLA" — ola/DatabaseIntegrityCheck.sql:350-474),
  * re-expressed as a pure-Scala resolver.
  *
  * Grammar: comma-separated items; `-` prefix excludes; keywords
  * ALL_DATABASES / SYSTEM_DATABASES / USER_DATABASES; `%` wildcard;
  * `[bracketed]` names; literal `_` (the reference escapes `_` before its
  * LIKE, ref IC:304). Exclude always wins (runs second, ref IC:311-319).
  * tempdb/snapshot databases match only when named exactly (ref IC:307,318).
  *
  * Work lists are tiny (one row per database), so resolution is driver-side
  * Scala — the same semantics at DataFrame scale is the theta-LIKE join
  * (graft.operators.Relational.q10ThetaLike). Matching is case-insensitive
  * like the reference's default collation.
  */
object Selector {

  /** Catalog row under selection (ref sys.databases scan, IC:288-297). */
  final case class DbInfo(
      name: String,
      isSystem: Boolean = false,
      isSnapshot: Boolean = false)

  /** One parsed DSL item. */
  final case class Item(
      raw: String,
      pattern: String, // LIKE pattern after keyword/bracket rewrite
      include: Boolean,
      dbtypeFilter: Option[String], // Some("S")/Some("U") from keywords
      exactLiteral: Boolean, // no wildcard → may select tempdb/snapshot
      startPosition: Int)

  /** Resolution result (ref @tmpDatabases row, IC:82-106). */
  final case class Resolved(
      name: String,
      dbtype: String,
      selected: Boolean,
      startPosition: Int,
      order: Int)

  /** Tokenize: strip CR/LF, split on commas, trim (ref IC:233-253 — the
    * recursive-CTE splitter collapsed to a split, SURVEY §2.7 U1). */
  def tokenize(dsl: String): Seq[Item] = {
    val cleaned = dsl.replace("\r", "").replace("\n", "")
    cleaned.split(",").map(_.trim).filter(_.nonEmpty).zipWithIndex.map {
      case (tok, idx) => classify(tok, idx + 1)
    }.toSeq
  }

  /** Classify one token (ref IC:256-276). */
  private def classify(tok: String, pos: Int): Item = {
    val include = !tok.startsWith("-")
    val body0 = if (include) tok else tok.substring(1).trim
    val unbracketed =
      if (body0.startsWith("[") && body0.endsWith("]") && body0.length >= 2)
        body0.substring(1, body0.length - 1).replace("]]", "]")
      else body0
    val (pattern, typeFilter) = unbracketed.toUpperCase match {
      case "ALL_DATABASES"    => ("%", None)
      case "SYSTEM_DATABASES" => ("%", Some("S"))
      case "USER_DATABASES"   => ("%", Some("U"))
      case _                  => (unbracketed, None)
    }
    Item(tok, pattern, include, typeFilter,
      exactLiteral = !pattern.contains("%"), startPosition = pos)
  }

  /** SQL LIKE (with `%`, literal `_`) → compiled case-insensitive regex. */
  def likeToRegex(pattern: String): Pattern = {
    val sb = new StringBuilder("(?i)^")
    pattern.foreach {
      case '%' => sb.append(".*")
      case c   => sb.append(Pattern.quote(c.toString))
    }
    Pattern.compile(sb.append("$").toString)
  }

  private def dbtype(db: DbInfo): String = if (db.isSystem) "S" else "U"

  /** True when `item` matches `db`, honoring the type filter and the
    * tempdb/snapshot guard (ref IC:304-307: a snapshot or tempdb is only
    * selectable when the item names it exactly). */
  def matches(item: Item, db: DbInfo): Boolean = {
    val typeOk = item.dbtypeFilter.forall(_ == dbtype(db))
    val nameOk = likeToRegex(item.pattern).matcher(db.name).matches()
    val guarded = db.name.equalsIgnoreCase("tempdb") || db.isSnapshot
    val guardOk = !guarded ||
      (item.exactLiteral && item.pattern.equalsIgnoreCase(db.name))
    typeOk && nameOk && guardOk
  }

  /** Two-pass include/exclude resolution + start-position assignment +
    * ROW_NUMBER ordering (ref IC:300-349). */
  def resolve(catalog: Seq[DbInfo], dsl: String): Seq[Resolved] = {
    val items = tokenize(dsl)
    val includes = items.filter(_.include)
    val excludes = items.filterNot(_.include)
    val resolved = catalog.map { db =>
      val matchedInc = includes.filter(matches(_, db))
      val selected = matchedInc.nonEmpty && !excludes.exists(matches(_, db))
      val startPos =
        if (matchedInc.nonEmpty) matchedInc.map(_.startPosition).min
        else Int.MaxValue // ref IC:322-333 grouped-MIN join
      Resolved(db.name, dbtype(db), selected, startPos, order = 0)
    }
    // ROW_NUMBER() OVER (ORDER BY StartPosition, name) on selected rows
    // (ref IC:343-349).
    val ordered = resolved.filter(_.selected)
      .sortBy(r => (r.startPosition, r.name.toLowerCase))
      .zipWithIndex.map { case (r, i) => r.copy(order = i + 1) }
    val orderByName = ordered.map(r => r.name -> r).toMap
    resolved.map(r => orderByName.getOrElse(r.name, r))
      .sortBy(r => (if (r.selected) 0 else 1, r.order, r.name.toLowerCase))
  }

  /** Names selected, in check order. */
  def selectedNames(catalog: Seq[DbInfo], dsl: String): Seq[String] =
    resolve(catalog, dsl).filter(_.selected).map(_.name)

  // ---- 3-part object selection (ref ola/DatabaseIntegrityCheck.sql:645-692)

  final case class ObjectRef(db: String, schema: String, name: String)
  final case class ObjectItem(db: String, schema: String, name: String,
      include: Boolean, startPosition: Int)

  /** Parse `db.schema.object` items, bracket-aware per part (the reference
    * uses PARSENAME, position-indexed from the right, ref DIC:682-684).
    * Items with a part count other than 3 are rejected (ref DIC:869-880
    * error list semantics) — returned as Left. */
  def tokenizeObjects(dsl: String): Either[String, Seq[ObjectItem]] = {
    val toks = dsl.replace("\r", "").replace("\n", "")
      .split(",").map(_.trim).filter(_.nonEmpty)
    val parsed = toks.zipWithIndex.map { case (tok, idx) =>
      val include = !tok.startsWith("-")
      val body = if (include) tok else tok.substring(1).trim
      splitParts(body) match {
        case Seq(db, sch, obj) =>
          Right(ObjectItem(db, sch, obj, include, idx + 1))
        case parts =>
          Left(s"object item '$tok' has ${parts.size} parts, expected 3")
      }
    }
    parsed.collectFirst { case Left(e) => e } match {
      case Some(e) => Left(e)
      case None    => Right(parsed.collect { case Right(i) => i }.toSeq)
    }
  }

  /** Split on `.` outside `[...]` brackets, unbracketing each part. */
  def splitParts(s: String): Seq[String] = {
    val parts = scala.collection.mutable.ArrayBuffer.empty[String]
    val cur = new StringBuilder
    var inBracket = false
    s.foreach {
      case '[' if !inBracket => inBracket = true
      case ']' if inBracket  => inBracket = false
      case '.' if !inBracket => parts += cur.toString; cur.clear()
      case c                 => cur.append(c)
    }
    parts += cur.toString
    parts.toSeq
  }

  /** Include/exclude resolution over a concrete object inventory. */
  def resolveObjects(inventory: Seq[ObjectRef], dsl: String)
      : Either[String, Seq[ObjectRef]] =
    tokenizeObjects(dsl).map { items =>
      def m(i: ObjectItem, o: ObjectRef): Boolean =
        likeToRegex(i.db).matcher(o.db).matches() &&
          likeToRegex(i.schema).matcher(o.schema).matches() &&
          likeToRegex(i.name).matcher(o.name).matches()
      inventory.filter { o =>
        items.filter(_.include).exists(m(_, o)) &&
          !items.filterNot(_.include).exists(m(_, o))
      }
    }
}
