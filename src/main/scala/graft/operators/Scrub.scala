package graft.operators

import org.apache.spark.sql.Column
import org.apache.spark.sql.functions._

/** Pattern scrubbing / normalization — the redaction pass a training
  * corpus runs before materialization (PII masking, number
  * normalization). Mirrors the reference's per-record transform
  * stage shape (`/root/reference/gst-detection-tf.py` P-ops): pure
  * declarative regexp expressions, codegen'd and row-local, so at
  * 100 TB the scrub is a narrow map folded into the text scan —
  * zero shuffle, zero UDFs.
  *
  * Patterns stay inside the RE2-compatible subset (no lookaround,
  * no backreferences): the same rule set runs unchanged on RE2-based
  * engines and restates 1:1 in the DuckDB oracle (x17_scrub).
  */
object Scrub {

  /** One scrub rule: every match of `pattern` becomes `replacement`.
    * Rule ORDER is part of the contract — an earlier rule's mask
    * hides its text from later patterns (e.g. the email rule must
    * run before a bare-number rule eats the digits in a local part). */
  final case class ScrubRule(name: String, pattern: String, replacement: String)

  /** Digit-run normalization: `"k": 69` → `"k": [NUM]`. */
  val NumberRule: ScrubRule = ScrubRule("number", "[0-9]+", "[NUM]")

  /** PII masking rules: email, IPv4, international phone. */
  val PiiRules: Seq[ScrubRule] = Seq(
    ScrubRule("email",
      "[A-Za-z0-9._%+-]+@[A-Za-z0-9.-]+\\.[A-Za-z]{2,}", "[EMAIL]"),
    ScrubRule("ipv4",
      "\\b[0-9]{1,3}\\.[0-9]{1,3}\\.[0-9]{1,3}\\.[0-9]{1,3}\\b", "[IP]"),
    ScrubRule("phone",
      "\\+[0-9]{1,3}[ -][0-9]{2,4}[ -][0-9]{3,4}[ -]?[0-9]{0,4}", "[PHONE]"))

  /** Apply rules left to right over `text`. */
  def scrub(text: Column, rules: Seq[ScrubRule]): Column =
    rules.foldLeft(text)((t, r) => regexp_replace(t, r.pattern, r.replacement))

  /** Total match count of one rule's pattern in `text`. */
  def matchCount(text: Column, rule: ScrubRule): Column =
    regexp_count(text, lit(rule.pattern))
}
