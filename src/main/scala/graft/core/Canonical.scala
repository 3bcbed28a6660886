package graft.core

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types._

/** Canonical string rendering of scalar values.
  *
  * Mirrors the reference engine's comparison semantics (mydatasyncer
  * `dbsync.go:57-129` `convertValueToString`): NULL renders as the empty
  * string, booleans as `true`/`false`, floats with integral values drop
  * the decimal point (`3.0` -> `"3"`), and timestamps render RFC3339.
  * The reference compares file values against DB values *string*-wise
  * (`compareRecords`, `dbsync.go:695-715`), so the differ ([[Differ]])
  * joins and change-detects on these canonical strings.
  *
  * Everything here is composed from codegen'd built-in functions — no
  * UDFs — so expressions stay inside whole-stage codegen and scale to
  * arbitrarily large inputs.
  *
  * The COLUMN path ([[canonical]]) keeps Java's scientific rendering
  * for non-integral doubles outside [1e-3, 1e7) (`1.0E-4` vs Go `'g'`'s
  * `0.0001`) — diff correctness is unaffected since both renderings are
  * injective, so equality verdicts agree. Where strings are surfaced
  * verbatim to users (dry-run ExecutionPlan samples), the DRIVER-side
  * [[goString]] renders byte-for-byte like the reference's
  * `convertValueToString` (`dbsync.go:57-129`), including Go `'g'`
  * float formatting.
  */
object Canonical {

  /** Null-like string literals (reference `primary_key_validator.go:151-161`),
    * matched case-insensitively after trimming. `\\n` is the literal
    * two-character backslash-n string — the reference's Go source spells it
    * `"\\n"` inside an already-quoted string, so it matches e.g. a CSV cell
    * containing the characters `\` `n`, not a newline.
    */
  val NullLikeLiterals: Seq[String] =
    Seq("", "null", "nil", "\\n", "n/a", "na", "none", "undefined")

  /** Character class matching everything Go `unicode.IsSpace` trims:
    * ASCII whitespace plus NEL, NBSP, and the Unicode Zs space separators.
    */
  private val GoSpaceClass =
    "[\\s\\u0085\\u00A0\\u1680\\u2000-\\u200A\\u2028\\u2029\\u202F\\u205F\\u3000]"

  /** Trim with Go `strings.TrimSpace` semantics. Spark's `trim` removes only
    * ASCII spaces; the reference trims tabs/newlines/Unicode spaces too.
    */
  def trimWs(c: Column): Column =
    regexp_replace(c, s"^$GoSpaceClass+|$GoSpaceClass+$$", "")

  /** Largest double below Long.MaxValue that is safe to cast. */
  private val LongSafeBound = 9.223372036854775e18

  /** Canonical rendering of `c` which has Catalyst type `dt`. */
  def canonical(c: Column, dt: DataType): Column = {
    val rendered = dt match {
      case StringType  => c
      // two `when`s, no `otherwise`: NULL must fall through to the
      // coalesce below, not render as "false"
      case BooleanType => when(c, lit("true")).when(!c, lit("false"))
      case DoubleType | FloatType =>
        val d = c.cast(DoubleType)
        when(d === floor(d) && abs(d) < lit(LongSafeBound),
          d.cast(LongType).cast(StringType))
          .otherwise(d.cast(StringType))
      case TimestampType | TimestampNTZType =>
        date_format(c, "yyyy-MM-dd'T'HH:mm:ssXXX")
      case DateType       => date_format(c, "yyyy-MM-dd")
      case _: NumericType => c.cast(StringType)
      case _              => c.cast(StringType)
    }
    coalesce(rendered, lit(""))
  }

  /** Canonical rendering of column `name` of `df`, using its schema type. */
  def canonical(df: DataFrame, name: String): Column =
    canonical(df(name), df.schema(name).dataType).as(s"${name}_c")

  /** Null-like detection (reference `primary_key_validator.go:151-161`):
    * SQL NULL, the exact empty string, or a trimmed lowercase match of the
    * non-empty [[NullLikeLiterals]]. Order matters: the reference checks
    * `value == ""` *before* trimming and its nullValues list does not
    * contain `""`, so a whitespace-only key (`"\t"`, `"\n"`, NBSP…) is NOT
    * null-like — it falls through to [[invalidPkFormat]] and is reported
    * as a format violation instead.
    */
  def isNullOrEmpty(c: Column): Column =
    c.isNull || c === "" ||
      lower(trimWs(c)).isin(NullLikeLiterals.filterNot(_.isEmpty): _*)

  /** Driver-side Go `strconv.FormatFloat(v, 'g', -1, bits)` with the
    * reference's integral fast path (`dbsync.go:93-98`): integral
    * values drop the point, otherwise shortest round-trip digits,
    * scientific only when the decimal exponent is < -4 or >= 21, and
    * a two-digit signed exponent (`1e-05`, `1.5e+21`). The shortest
    * digits come from `Double.toString`/`Float.toString` (Java's
    * uniquely-distinguishing decimal), reformatted to Go's layout.
    */
  private def goFloatDigits(digitsSrc: String, v: Double): String = {
    if (v.isNaN) return "NaN"
    if (v.isInfinite) return if (v > 0) "+Inf" else "-Inf"
    if (v == v.toLong.toDouble && math.abs(v) < LongSafeBound)
      return v.toLong.toString
    val bd = new java.math.BigDecimal(digitsSrc).abs.stripTrailingZeros()
    val digits = bd.unscaledValue.toString
    val exp = digits.length - 1 - bd.scale // exponent of the leading digit
    val s =
      if (exp < -4 || exp >= 21) {
        val mant =
          if (digits.length == 1) digits
          else s"${digits.head}.${digits.tail}"
        val es = "%s%02d".format(if (exp < 0) "-" else "+", math.abs(exp))
        s"${mant}e$es"
      } else if (exp >= 0) {
        if (digits.length > exp + 1)
          s"${digits.take(exp + 1)}.${digits.drop(exp + 1)}"
        else digits + ("0" * (exp + 1 - digits.length))
      } else {
        "0." + ("0" * (-exp - 1)) + digits
      }
    if (v < 0) "-" + s else s
  }

  def goString(d: Double): String =
    goFloatDigits(java.lang.Double.toString(math.abs(d)), d)

  def goString(f: Float): String =
    goFloatDigits(java.lang.Float.toString(math.abs(f)), f.toDouble)

  /** Driver-side mirror of the reference's `convertValueToString`
    * (`dbsync.go:57-129`) for values plucked from collected Rows —
    * the rendering dry-run plan samples surface to users.
    */
  def goString(v: Any): String = v match {
    case null                  => ""
    case s: String             => s
    case b: Boolean            => if (b) "true" else "false"
    case d: Double             => goString(d)
    case f: Float              => goString(f)
    case d: java.math.BigDecimal => goString(d.doubleValue)
    case d: BigDecimal         => goString(d.doubleValue)
    case t: java.sql.Timestamp =>
      // Go time.Time.Format(time.RFC3339); Spark session zone is UTC
      java.time.format.DateTimeFormatter.ISO_OFFSET_DATE_TIME
        .withZone(java.time.ZoneOffset.UTC)
        .format(t.toInstant.truncatedTo(java.time.temporal.ChronoUnit.SECONDS))
    case i: java.time.Instant  =>
      java.time.format.DateTimeFormatter.ISO_OFFSET_DATE_TIME
        .withZone(java.time.ZoneOffset.UTC)
        .format(i.truncatedTo(java.time.temporal.ChronoUnit.SECONDS))
    case other                 => other.toString
  }

  /** Primary-key format violations (reference
    * `primary_key_validator.go:164-185`): control characters, length
    * over 255, or untrimmed whitespace.
    */
  def invalidPkFormat(c: Column): Column =
    length(c) > 255 || c =!= trimWs(c) ||
      c.contains("\n") || c.contains("\r") || c.contains("\t")
}
