package graft.core

/**
 * Identifier normalization/sanitization kernel.
 *
 * Re-implements, with verbatim quirk preservation, the reference's
 * identifier rules (reference: lib/core_ext/string.rb:5-89,
 * lib/cartodb-importer/importer.rb:12,505-507,553-575).
 *
 * Quirks preserved on purpose (each is observable product behavior):
 *  - `downcase` in the reference Ruby (pre-2.4) is ASCII-only, so uppercase
 *    accented characters survive the initial downcase and hit the
 *    case-insensitive "uppercase" transliteration rows — including the buggy
 *    ones: Ñ-class → 'M', Ò-class → 'N', Ķ/ĸ → 'J' (string.rb:59-62) and
 *    Ą → 'Q' / ą → 'q' (string.rb:41,63).
 *  - blank header cells become `unknow_name_<n>` (sic, importer.rb:505-507).
 *  - reserved-word test uses the ORIGINAL name upcased, not the sanitized
 *    one (string.rb:84).
 */
object Identifier {

  /** PostgreSQL reserved words (string.rb:5-11). */
  val PostgresReservedWords: Set[String] = Set(
    "ALL", "ANALYSE", "ANALYZE", "AND", "ANY", "ARRAY", "AS", "ASC",
    "ASYMMETRIC", "AUTHORIZATION", "BETWEEN", "BINARY", "BOTH", "CASE",
    "CAST", "CHECK", "COLLATE", "COLUMN", "CONSTRAINT", "CREATE", "CROSS",
    "CURRENT_DATE", "CURRENT_ROLE", "CURRENT_TIME", "CURRENT_TIMESTAMP",
    "CURRENT_USER", "DEFAULT", "DEFERRABLE", "DESC", "DISTINCT", "DO",
    "ELSE", "END", "EXCEPT", "FALSE", "FOR", "FOREIGN", "FREEZE", "FROM",
    "FULL", "GRANT", "GROUP", "HAVING", "ILIKE", "IN", "INITIALLY", "INNER",
    "INTERSECT", "INTO", "IS", "ISNULL", "JOIN", "LEADING", "LEFT", "LIKE",
    "LIMIT", "LOCALTIME", "LOCALTIMESTAMP", "NATURAL", "NEW", "NOT",
    "NOTNULL", "NULL", "OFF", "OFFSET", "OLD", "ON", "ONLY", "OR", "ORDER",
    "OUTER", "OVERLAPS", "PLACING", "PRIMARY", "REFERENCES", "RIGHT",
    "SELECT", "SESSION_USER", "SIMILAR", "SOME", "SYMMETRIC", "TABLE",
    "THEN", "TO", "TRAILING", "TRUE", "UNION", "UNIQUE", "USER", "USING",
    "VERBOSE", "WHEN", "WHERE")

  /** PostgreSQL system column names that must be `_`-prefixed
    * (importer.rb:12,553-556). */
  val ReservedColumnNames: Set[String] =
    Set("oid", "tableoid", "xmin", "cmin", "xmax", "cmax", "ctid")

  /** `blank?` — nil or whitespace-only (core_ext/blank.rb, string.rb:14-16). */
  def isBlank(s: String): Boolean = s == null || !s.exists(!_.isWhitespace)

  /** ASCII-only lowercase, matching Ruby <2.4 `String#downcase`. */
  private def asciiDowncase(s: String): String =
    s.map(c => if (c >= 'A' && c <= 'Z') (c + 32).toChar else c)

  // Transliteration table, built from string.rb:26-72. The lowercase rows
  // run first in the reference (consuming lowercase accents), then the
  // case-insensitive "uppercase" rows consume what survives ASCII downcase.
  // A sequential gsub chain whose outputs are never re-matched is equivalent
  // to a single-pass character map with lowercase rows taking precedence.
  private val translit: Map[Char, String] = {
    val b = Map.newBuilder[Char, String]
    def row(chars: String, repl: String): Unit =
      chars.foreach(c => b += (c -> repl))
    // lowercase rows (string.rb:26-49)
    row("àáâãäåāă", "a"); row("æ", "ae"); row("ďđ", "d"); row("çćčĉċ", "c")
    row("èéêëēęěĕė", "e"); row("ƒ", "f"); row("ĝğġģ", "g"); row("ĥħ", "h")
    row("ìíîïīĩĭ", "i"); row("įıĳĵ", "j"); row("ķĸ", "k"); row("łľĺļŀ", "l")
    row("ñńňņŉŋ", "n"); row("òóôõöøōőŏ", "o"); row("œ", "oe"); row("ą", "q")
    row("ŕřŗ", "r"); row("śšşŝș", "s"); row("ťţŧț", "t")
    row("ùúûüūůűŭũų", "u"); row("ŵ", "w"); row("ýÿŷ", "y"); row("žżź", "z")
    // uppercase /i rows (string.rb:50-72) — only the uppercase forms are
    // still unconsumed at this point. Buggy rows reproduced verbatim:
    // Ñ-class→'M', Ò-class→'N', Ķ/ĸ→'J', Ą→'Q'.
    row("ÀÁÂÃÄÅĀĂ", "A"); row("Æ", "AE"); row("ĎĐ", "D"); row("ÇĆČĈĊ", "C")
    row("ÈÉÊËĒĘĚĔĖ", "E"); row("Ƒ", "F"); row("ĜĞĠĢ", "G"); row("ĤĦ", "H")
    row("ÌÍÎÏĪĨĬ", "I"); row("ĲĴ", "J")
    row("Ķ", "J") // string.rb:59 — ĸ itself was consumed by the ķĸ→k row
    row("ŁĽĹĻĿ", "L"); row("ÑŃŇŅŊ", "M"); row("ÒÓÔÕÖØŌŐŎ", "N")
    row("Œ", "OE"); row("Ą", "Q"); row("ŔŘŖ", "R"); row("ŚŠŞŜȘ", "S")
    row("ŤŢŦȚ", "T"); row("ÙÚÛÜŪŮŰŬŨŲ", "U"); row("Ŵ", "W"); row("ÝŸŶ", "Y")
    row("ŽŻŹ", "Z")
    b.result()
  }

  /** Diacritic transliteration (`String#normalize`, string.rb:22-73).
    * Blank input → "". */
  def normalize(s: String): String = {
    val str = asciiDowncase(s)
    if (isBlank(str)) ""
    else {
      val sb = new StringBuilder(str.length)
      str.foreach(c => sb.append(translit.getOrElse(c, c.toString)))
      sb.toString
    }
  }

  /** `String#sanitize` (string.rb:75-80): strip HTML, transliterate,
    * lowercase, entities→`-`, non-alnum→`-`, collapse runs, `-`→`_`.
    * Blank input → null (Ruby `return if blank?`). */
  def sanitize(s: String): String = {
    if (isBlank(s)) return null
    var t = s.replaceAll("(?s)<[^>]+>", "")   // /m in Ruby = dotall
    t = asciiDowncase(normalize(t))           // .normalize.downcase
    t = t.replaceAll("&.+?;", "-")
    t = t.replaceAll("[^a-z0-9 _-]", "-")
    t = t.trim
    t = t.replaceAll("\\s+", "-")
    t = t.replaceAll("-+", "-")
    t = t.replace('-', ' ').trim
    t = t.replace(' ', '-')
    t.replace('-', '_')
  }

  /** `String#sanitize_column_name` (string.rb:82-89): sanitize + `_` prefix
    * when the result doesn't start with `[a-zA-Z_]` or the ORIGINAL name
    * (upcased) is a PostgreSQL reserved word. */
  def sanitizeColumnName(s: String): String = {
    val t = Option(sanitize(s)).getOrElse("")
    if (!t.headOption.exists(c => c.isLetter && c < 128 || c == '_') ||
        PostgresReservedWords.contains(s.toUpperCase))
      "_" + t
    else t
  }

  /** Header row → final column names: blank cells become
    * `unknow_name_<n>` (sic — importer.rb:505-507; counter increments only
    * on blanks), others are sanitized, and PostgreSQL system column names
    * get a `_` prefix (importer.rb:553-556). */
  def sanitizeHeader(names: Seq[String]): Seq[String] = {
    var unknown = 0
    names.map { c =>
      val n =
        if (isBlank(c)) { unknown += 1; s"unknow_name_$unknown" }
        else sanitizeColumnName(c)
      if (ReservedColumnNames.contains(n)) "_" + n else n
    }
  }

  private val LeadingNumber = "\\A[+-]?\\d+?(\\.\\d+)?\\Z".r

  /** Table-name validation minus the catalog probe (importer.rb:562-566):
    * `_`-prefix names whose first character is numeric. */
  def prefixIfLeadingNumber(name: String): String =
    if (name.nonEmpty && LeadingNumber.matches(name.take(1))) "_" + name
    else name

  /** Collision resolution (importer.rb:567-575): suffix `_1, _2, …` until
    * the name is free. `existing` stands in for `pg_stat_user_tables`. */
  def resolveCollision(name0: String, existing: Set[String]): String = {
    val name = prefixIfLeadingNumber(name0)
    if (!existing.contains(name)) name
    else Iterator.from(1).map(n => s"${name}_$n").find(!existing.contains(_)).get
  }

  /** Exporter-side variant (exporter.rb:177-189): increment the max
    * existing `_<n>` suffix among names starting with `name`. */
  def resolveExportCollision(name: String, existing: Set[String]): String =
    if (!existing.contains(name)) name
    else {
      val maxN = existing.iterator
        .filter(_.startsWith(name + "_"))
        .map(_.drop(name.length + 1))
        .filter(s => s.nonEmpty && s.forall(_.isDigit))
        .map(_.toInt)
        .maxOption.getOrElse(0)
      s"${name}_${maxN + 1}"
    }

  /** File path → suggested table name (importer.rb:66,78: basename minus
    * extension, downcased, sanitized). */
  def suggestTableName(path: String): String = {
    val base = new java.io.File(path).getName
    val dot = base.lastIndexOf('.')
    val stem = if (dot > 0) base.substring(0, dot) else base
    Option(sanitize(asciiDowncase(stem))).getOrElse("")
  }
}
