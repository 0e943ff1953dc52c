package graft.functions

import org.apache.spark.sql.Column
import org.apache.spark.sql.functions._

/** PII redaction — the standard pretraining scrub pass (emails, phone
  * numbers, IP addresses → typed placeholder tokens; north-star
  * operator, the reference has no corpus hygiene). A rule is data:
  * (name, pattern, replacement), applied as one codegen'd
  * regexp_replace cascade in a fixed fold order, so callers can extend
  * the set and any SQL mirror replays it exactly.
  *
  * Patterns are deliberately restricted to the common dialect of Java
  * regex and RE2 (no lookarounds, no backreferences) — the same
  * portability contract as the rest of TextFunctions' mirrors.
  *
  * Detection envelope of the SEED rules (rules are data — production
  * corpora extend the set rather than patching these): `phone` matches
  * only the NNN-NNN-NNNN form — parenthesized `(555) 123-4567`,
  * `+1`-prefixed, dotted, and bare-digit forms pass unredacted (false
  * negatives). `ip` accepts out-of-range octets (`999.1.1.1`) and,
  * having no word-boundary anchors (kept anchor-free for engine
  * portability), matches INSIDE longer dotted-numeric runs — a version
  * string like `10.2.3.4000` gets its prefix redacted (false
  * positives). `email` is the pragmatic RFC-lite form: no quoted
  * local parts, no IP-literal domains.
  */
object PiiRules {

  /** (name, pattern, replacement), applied in order — email first so an
    * address's dotted-numeric domain can never be half-eaten by the IP
    * rule.
    */
  val rules: Seq[(String, String, String)] = Seq(
    ("email",
      "[A-Za-z0-9._%+-]+@[A-Za-z0-9.-]+\\.[A-Za-z][A-Za-z]+", "[EMAIL]"),
    ("phone", "\\d{3}-\\d{3}-\\d{4}", "[PHONE]"),
    ("ip", "\\d{1,3}\\.\\d{1,3}\\.\\d{1,3}\\.\\d{1,3}", "[IP]"))

  /** Text with every rule's matches replaced by its placeholder. */
  def redact(c: Column): Column =
    rules.foldLeft(c) { case (acc, (_, p, r)) =>
      regexp_replace(acc, p, r)
    }

  /** Per-rule match counts over the ORIGINAL text (audit columns:
    * how much PII a slice carries decides quarantine vs redact-and-keep).
    */
  def counts(c: Column): Seq[(String, Column)] =
    rules.map { case (n, p, _) =>
      s"n_$n" -> size(regexp_extract_all(c, lit(p), lit(0))).cast("long")
    }

  /** LITERAL-term companion to the pattern rules: redact a blocklist
    * of exact terms (names, addresses, project codewords — the
    * thousands-of-literals case where a regex alternation is both
    * slow and order-sensitive) via the Aho–Corasick kernel
    * ([[TextFunctions.redactTerms]]): ONE automaton pass regardless
    * of term count, and the UNION of match intervals is cut — so
    * overlapping/nested/adjacent terms can never re-expose a partial
    * term the way a sequential per-term replace cascade can. Run it
    * BEFORE [[redact]] when composing (a literal term containing an
    * `@` must not be half-eaten by the email rule first).
    */
  def redactBlocklist(c: Column, terms: Seq[String],
                      placeholder: String = "[REDACTED]"): Column =
    TextFunctions.redactTerms(c, terms, placeholder)
}
