package graft.core

import org.scalatest.funsuite.AnyFunSuite
import graft.PropHelper
import org.scalacheck.Gen

/** Golden + property tests for the identifier kernel (reference:
  * lib/core_ext/string.rb; spec/import_spec.rb:72-104). */
class IdentifierSpec extends AnyFunSuite with PropHelper {
  import Identifier._

  test("twitters.csv header golden (import_spec.rb:84-87)") {
    assert(sanitizeHeader(Seq("URL", "login", "Country", "Followers count", "")) ==
      Seq("url", "login", "country", "followers_count", "unknow_name_1"))
  }

  test("embedded space (clubbing.csv 'direccion completa')") {
    assert(sanitizeColumnName("direccion completa") == "direccion_completa")
  }

  test("reserved system columns get _ prefix (importer.rb:553-556)") {
    assert(sanitizeHeader(Seq("xmin", "name", "ctid")) == Seq("_xmin", "name", "_ctid"))
  }

  test("postgres reserved words get _ prefix on the ORIGINAL name (string.rb:84)") {
    assert(sanitizeColumnName("select") == "_select")
    assert(sanitizeColumnName("Order") == "_order")
    // sanitized form collides with a reserved word but original doesn't → no prefix
    assert(sanitizeColumnName("sel ect") == "sel_ect")
  }

  test("non-letter start gets _ prefix") {
    assert(sanitizeColumnName("123abc") == "_123abc")
  }

  test("diacritics transliterate (string.rb:22-49)") {
    assert(sanitize("Año") == "ano")
    assert(sanitize("œuvre æon") == "oeuvre_aeon")
    assert(sanitize("ą") == "q") // string.rb:41 quirk, verbatim
  }

  test("uppercase quirk rows are live through ASCII-only downcase (string.rb:59-62)") {
    // Ruby <2.4 downcase leaves Ñ/Ò/Ķ/Ą untouched → buggy uppercase rows hit
    assert(normalize("Ñ") == "M")
    assert(normalize("Ò") == "N")
    assert(normalize("Ķ") == "J")
    assert(normalize("Ą") == "Q")
    // …then sanitize's second downcase lowers them
    assert(sanitize("Ñam") == "mam")
    // lowercase forms keep the correct rows
    assert(normalize("ñ") == "n")
    assert(normalize("ò") == "o")
  }

  test("HTML tags stripped, entities to separator (string.rb:76)") {
    assert(sanitize("<b>Bold</b> name") == "bold_name")
    assert(sanitize("Gal&#xe1;pagos") == "gal_pagos")
  }

  test("table name from path (importer.rb:66)") {
    assert(suggestTableName("/tmp/Food Security Aid Map_projects.csv") ==
      "food_security_aid_map_projects")
    assert(suggestTableName("/a/b/TM_WORLD_BORDERS.zip") == "tm_world_borders")
  }

  test("collision resolution importer-style (import_spec.rb:54-70)") {
    assert(resolveCollision("prefered_name", Set()) == "prefered_name")
    assert(resolveCollision("prefered_name", Set("prefered_name")) == "prefered_name_1")
    assert(resolveCollision("prefered_name",
      Set("prefered_name", "prefered_name_1")) == "prefered_name_2")
    assert(resolveCollision("29barcelona", Set()) == "_29barcelona")
  }

  test("collision resolution exporter-style (exporter.rb:177-189)") {
    assert(resolveExportCollision("t", Set("t", "t_3", "t_7")) == "t_8")
    assert(resolveExportCollision("t", Set()) == "t")
  }

  test("sanitize output is always a valid identifier") {
    forAllG(Gen.asciiPrintableStr) { s =>
      val out = sanitizeColumnName(s)
      assert(out.matches("^[a-zA-Z_][a-z0-9_]*$") || out == "_")
    }
  }

  test("sanitize is idempotent on its own output") {
    forAllG(Gen.alphaNumStr.suchThat(_.nonEmpty)) { s =>
      val once = Option(sanitize(s)).getOrElse("")
      if (once.nonEmpty) assert(sanitize(once) == once)
    }
  }
}
