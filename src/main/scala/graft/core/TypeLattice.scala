package graft.core

/**
 * CSV type-inference lattice, re-implementing `guess_schema`'s per-column
 * fold (reference: lib/cartodb-importer/importer.rb:518-557).
 *
 * Reference semantics, preserved verbatim:
 *  - first non-blank value decides the initial type: float-looking → float,
 *    `/^[0-9]+$/` → integer (NO sign allowed — "-5" is varchar), else
 *    varchar (importer.rb:527-535).
 *  - the float regex is `/^\-?[0-9]+[\.|\,][0-9]+$/` — the separator class
 *    `[\.|\,]` matches '.', ',' AND '|' (importer.rb:528). Comma decimals
 *    ("3,14") and pipe decimals ("3|14") are floats. Reproduced verbatim.
 *  - only the "integer" state ever transitions (importer.rb:538-548):
 *    a non-integer value demotes to float (if float-looking) or varchar;
 *    a value > 2147483647 (int32 overflow) demotes to float. Float and
 *    varchar are STICKY — a float column stays float even if "abc" appears
 *    later (there is no `when "float"` branch). Reproduced verbatim.
 *  - blank cells never affect inference (importer.rb:520).
 *  - columns never seen non-blank default to varchar (importer.rb:557).
 *
 * Distribution note (documented divergence): the reference folds rows
 * strictly in file order. The fold here is re-expressed as an associative
 * state merge (first-seen kind + first integer-breaking kind) so Spark can
 * run it as a partial/final aggregate; it is order-exact when partials are
 * merged in row order, which holds for single-file reads and is the only
 * case the reference supports at all.
 */
object TypeLattice {

  sealed trait ColType
  case object TInteger extends ColType
  case object TFloat extends ColType
  case object TVarchar extends ColType

  // Reference patterns, kept as the executable spec (TypeLatticeSpec
  // cross-checks the loops below against them property-style):
  private[core] val FloatRe = "^\\-?[0-9]+[.|,][0-9]+$".r   // [\.|\,] verbatim
  private[core] val IntRe = "^[0-9]+$".r

  private[core] def isFloatLookingRe(v: String): Boolean = FloatRe.matches(v)
  private[core] def isIntLookingRe(v: String): Boolean = IntRe.matches(v)

  /** Hand-rolled twins of the regexes: inference visits every cell of the
    * input once, and the regex engine was the dominant cost of the
    * type_infer benchmark (~2.4M matches at sf0.1). */
  def isFloatLooking(v: String): Boolean = {
    val n = v.length
    var i = if (n > 0 && v.charAt(0) == '-') 1 else 0
    val d0 = i
    while (i < n && v.charAt(i) >= '0' && v.charAt(i) <= '9') i += 1
    if (i == d0 || i >= n) return false // 1+ integer digits, then separator
    val c = v.charAt(i)
    if (c != '.' && c != '|' && c != ',') return false
    i += 1
    val d1 = i
    while (i < n && v.charAt(i) >= '0' && v.charAt(i) <= '9') i += 1
    i == n && i > d1 // 1+ fraction digits, nothing trailing
  }

  def isIntLooking(v: String): Boolean = {
    val n = v.length
    if (n == 0) return false
    var i = 0
    while (i < n && v.charAt(i) >= '0' && v.charAt(i) <= '9') i += 1
    i == n
  }

  /** `line[i].to_i > 2147483647` (importer.rb:544) for an all-digit string. */
  def overflowsInt32(digits: String): Boolean = {
    val t = digits.dropWhile(_ == '0')
    t.length > 10 || (t.length == 10 && t > "2147483647")
  }

  /** Kind of one non-blank cell, plus whether it breaks "integer". */
  private def kindOf(v: String): ColType =
    if (isFloatLooking(v)) TFloat
    else if (isIntLooking(v)) TInteger
    else TVarchar

  /**
   * Per-column inference state.
   *  - `first`: kind of the first non-blank value. NOTE the int32-overflow
   *    check does NOT apply to the first value (importer.rb:527-535 has no
   *    overflow test) — a column whose first value is "9999999999" starts
   *    as integer; only a LATER big value demotes it (importer.rb:544).
   *  - `firstAsBreaker`: the demotion this state's first value would cause
   *    if it were a non-first value of an integer column (used when merging
   *    a later partition into an earlier one).
   *  - `break_`: demotion caused by the first non-first value that breaks
   *    "integer": float-looking or int32-overflow → TFloat, else TVarchar.
   */
  final case class State(
      first: Option[ColType],
      firstAsBreaker: Option[ColType],
      break_ : Option[ColType]) {

    def update(v: String): State =
      if (v == null || Identifier.isBlank(v)) this
      else {
        val k = kindOf(v)
        val breaker: Option[ColType] = k match {
          case TFloat   => Some(TFloat)
          case TVarchar => Some(TVarchar)
          case TInteger => if (overflowsInt32(v)) Some(TFloat) else None
        }
        if (first.isEmpty) State(Some(k), breaker, None)
        else if (break_.isEmpty && breaker.nonEmpty) copy(break_ = breaker)
        else this
      }

    /** Associative, left-biased merge (left = earlier rows). */
    def merge(r: State): State =
      if (first.isEmpty) r
      else if (break_.nonEmpty) this
      else copy(break_ = r.firstAsBreaker.orElse(r.break_))

    def result: ColType = first match {
      case None           => TVarchar              // importer.rb:557
      case Some(TFloat)   => TFloat                // sticky
      case Some(TVarchar) => TVarchar              // sticky
      case Some(TInteger) => break_.getOrElse(TInteger)
    }
  }

  object State { val empty: State = State(None, None, None) }

  /** Sequential fold — the exact reference semantics, for testing. */
  def inferColumn(values: Iterable[String]): ColType =
    values.foldLeft(State.empty)(_.update(_)).result
}
