package graft.ops.ext

import org.apache.spark.sql.Column
import org.apache.spark.sql.functions._

/** PII redaction for training corpora (SURVEY §2.12 adjunct): mask
  * emails, URLs, IPv4 addresses and phone-like digit runs with typed
  * placeholders — the standard pre-training hygiene scrub.
  *
  * All patterns live in the RE2 ∩ java.util.regex common subset (no
  * lookaround, no backreferences) so the exact same pattern strings run
  * in Spark's codegen'd regexp_replace AND in the DuckDB oracle — the
  * redacted text is engine-portable, not just the counts.
  *
  * Scale shape: chained regexp_replace / regexp_extract_all are narrow
  * per-row expressions — no shuffle, full scan parallelism.
  */
object TextClean {

  /** Redaction order matters: URLs first (an email-looking userinfo or
    * an IP inside a URL must redact as part of the URL), then emails,
    * IPs, and phone-like runs last (so they cannot eat digits out of
    * the structured forms).
    */
  val Patterns: Seq[(String, String, String)] = Seq(
    ("url", "https?://[^ ]+", "[URL]"),
    ("email", "[A-Za-z0-9._%+-]+@[A-Za-z0-9.-]+\\.[A-Za-z]{2,}", "[EMAIL]"),
    ("ipv4", "\\b[0-9]{1,3}\\.[0-9]{1,3}\\.[0-9]{1,3}\\.[0-9]{1,3}\\b", "[IP]"),
    ("phone", "\\+?[0-9][0-9() .-]{6,}[0-9]", "[PHONE]"))

  /** Text with all pattern matches replaced by their placeholders. */
  def redact(text: Column): Column =
    Patterns.foldLeft(text) { case (acc, (_, pat, repl)) =>
      regexp_replace(acc, pat, repl)
    }

  /** One `n_<kind>` count column per pattern, measured on the
    * progressively-redacted text so the counts match what `redact`
    * actually replaced (an IP inside a URL counts as URL, not IP).
    */
  def matchCounts(text: Column): Seq[Column] = {
    val stages = Patterns.scanLeft(text) { case (acc, (_, pat, repl)) =>
      regexp_replace(acc, pat, repl)
    }
    Patterns.zip(stages).map { case ((kind, pat, _), stageIn) =>
      size(regexp_extract_all(stageIn, lit(pat), lit(0))).as(s"n_$kind")
    }
  }

  /** Unicode text normalization for training corpora — the cleanup
    * pass that runs before tokenization so cosmetic variants don't
    * fragment the vocabulary: strip zero-width characters and C0
    * controls, fold curly quotes / typographic dashes / ellipsis to
    * ASCII, collapse space-tab runs. Patterns use `\x{...}` escapes
    * only (ASCII-safe strings, same semantics in java.util.regex and
    * RE2 — the [[Patterns]] portability contract). Order matters:
    * invisibles are stripped before the whitespace collapse so a
    * zero-width char cannot keep two spaces apart.
    */
  val NormRules: Seq[(String, String, String)] = Seq(
    ("zero_width", "[\\x{200B}\\x{200C}\\x{200D}\\x{FEFF}]", ""),
    ("control", "[\\x00-\\x08\\x0B\\x0C\\x0E-\\x1F]", ""),
    ("curly_single", "[\\x{2018}\\x{2019}]", "'"),
    ("curly_double", "[\\x{201C}\\x{201D}]", "\""),
    ("dash", "[\\x{2013}\\x{2014}]", "-"),
    ("ellipsis", "\\x{2026}", "..."),
    ("tab", "\\t", " "),
    ("ws_run", " {2,}", " "))

  /** Text with every normalization rule applied, in declaration order. */
  def normalize(text: Column): Column =
    NormRules.foldLeft(text) { case (acc, (_, pat, repl)) =>
      regexp_replace(acc, pat, repl)
    }

  /** One `n_<rule>` match-count column per normalization rule,
    * measured on the progressively-normalized text (the
    * [[matchCounts]] convention — a control char inside a zero-width
    * run counts once, for the rule that actually consumed it).
    */
  def normCounts(text: Column): Seq[Column] = {
    val stages = NormRules.scanLeft(text) { case (acc, (_, pat, repl)) =>
      regexp_replace(acc, pat, repl)
    }
    NormRules.zip(stages).map { case ((rule, pat, _), stageIn) =>
      size(regexp_extract_all(stageIn, lit(pat), lit(0))).as(s"n_$rule")
    }
  }
}
