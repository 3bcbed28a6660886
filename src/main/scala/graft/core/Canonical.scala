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
  * Known divergence from the reference: non-integral doubles outside
  * [1e-3, 1e7) render in Java scientific notation (`1.0E-4`) where Go's
  * `strconv 'g'` would emit `0.0001`. Diff correctness is unaffected —
  * both renderings are injective, so equality verdicts agree — it only
  * matters if canonical strings are surfaced verbatim to users.
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

  /** Primary-key format violations (reference
    * `primary_key_validator.go:164-185`): control characters, length
    * over 255, or untrimmed whitespace.
    */
  def invalidPkFormat(c: Column): Column =
    length(c) > 255 || c =!= trimWs(c) ||
      c.contains("\n") || c.contains("\r") || c.contains("\t")
}
