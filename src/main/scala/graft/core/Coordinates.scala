package graft.core

/**
 * Lat/lon column detection + coordinate-validity rules for the georeference
 * dataflow (reference: lib/cartodb-importer/importer.rb:297-334).
 */
object Coordinates {

  /** Case-insensitive latitude column synonyms (importer.rb:299). */
  val LatitudeNames: Set[String] =
    Set("latitude", "lat", "latitudedecimal", "latitud", "lati")

  /** Case-insensitive longitude column synonyms (importer.rb:300). */
  val LongitudeNames: Set[String] =
    Set("longitude", "lon", "lng", "longitudedecimal", "longitud", "long")

  /** Longitude validity regex, verbatim (importer.rb:327): integer part
    * 0-179 (or exactly ±180), optional decimals. */
  val LonRegex: String =
    "^(([-+]?(([0-9]|[1-9][0-9]|1[0-7][0-9])(\\.[0-9]+)?))|[-+]?180)$"

  /** Latitude validity regex, verbatim (importer.rb:329): integer part
    * 0-89 (or exactly ±90), optional decimals. */
  val LatRegex: String =
    "^(([-+]?(([0-9]|[1-8][0-9])(\\.[0-9]+)?))|[-+]?90)$"

  /** First column (in schema order) whose lowercased name is a latitude
    * synonym — mirrors the `LIMIT 1` information_schema probe
    * (importer.rb:302-306). */
  def findLatitude(columns: Seq[String]): Option[String] =
    columns.find(c => LatitudeNames.contains(c.toLowerCase))

  /** Longitude twin (importer.rb:308-312). */
  def findLongitude(columns: Seq[String]): Option[String] =
    columns.find(c => LongitudeNames.contains(c.toLowerCase))
}
