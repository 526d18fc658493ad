package graft.functions

import org.apache.spark.sql.Column
import org.apache.spark.sql.functions._

/** Column-level text-pipeline primitives for large-scale corpus
  * preparation (language ID, quality scoring, token stats, shingling,
  * fingerprinting). Everything composes codegen'd built-ins
  * (`split`/`transform`/`aggregate`/`md5`) — no UDFs, so whole-stage
  * codegen spans the full expression and the work distributes with the
  * scan.
  *
  * Cross-engine determinism: hashing goes through md5 (identical hex in
  * every engine) instead of engine-private hash functions, so each
  * operator has an exact DuckDB oracle.
  */
object TextFunctions {

  /** Whitespace tokens of trimmed text. */
  def tokens(text: Column): Column = split(trim(text), " ")

  /** Marker-word stopword list used for quality scoring. */
  val Stopwords: Seq[String] = Seq("the", "a", "of", "to", "and", "in", "is")

  private def inList(words: Seq[String]): String =
    words.map(w => s"'$w'").mkString("(", ", ", ")")

  /** Count of tokens (occurrences, not distinct) in `words`. */
  def markerCount(toksCol: String, words: Seq[String]): Column =
    expr(s"size(filter($toksCol, t -> t IN ${inList(words)}))").cast("long")

  /** Word k-shingles (k consecutive tokens joined by a space); empty
    * array when the document has fewer than k tokens OR the input is
    * NULL (never returns NULL — safe for size()/aggregation
    * consumers). Fused custom expression — see
    * graft.plans.TextExpressions for why the composed-builtin form is
    * quadratic.
    */
  def wordShingles(toksCol: String, k: Int): Column =
    graft.plans.TextExpressions.wordShingles(expr(toksCol), k)

  /** Character n-grams of trimmed text; empty array when shorter than
    * n or NULL (never returns NULL).
    */
  def charNgrams(textCol: String, n: Int): Column =
    graft.plans.TextExpressions.charNgrams(trim(expr(textCol)), n)

  /** First 32 bits of md5(token) as a non-negative long — the shared
    * cross-engine token hash (DuckDB: `CAST('0x' || substr(md5(t),1,8)
    * AS UBIGINT)`).
    */
  val tokenHashSql: String = "CAST(conv(substr(md5(t), 1, 8), 16, 10) AS LONG)"

  /** Order-sensitive rolling (polynomial) fingerprint over the token
    * stream: fold acc -> (acc*31 + h(token)) mod 1e9+7. Stays within
    * Long range on both engines (no overflow wrap dependence).
    */
  def rollingFingerprint(toksCol: String): Column =
    expr(s"aggregate($toksCol, 0L, (acc, t) -> (acc * 31 + $tokenHashSql) % 1000000007)")

  /** PII patterns — RE2-safe (no lookaround, no \d/\s class shorthands
    * whose unicode scope differs between engines), so Spark's Java
    * regex and DuckDB's RE2 match the identical spans.
    */
  val EmailPattern: String = "[A-Za-z0-9._%+-]+@[A-Za-z0-9.-]+\\.[A-Za-z]{2,}"
  val PhonePattern: String = "\\+[0-9]{1,2}-[0-9]{3}-[0-9]{4}"

  /** Redact emails then phones with typed placeholder tokens. */
  def scrubPii(text: Column): Column =
    regexp_replace(regexp_replace(text, EmailPattern, "<EMAIL>"), PhonePattern, "<PHONE>")

  /** Pre-scrub match counts for the audit columns. */
  def countEmails(text: Column): Column =
    size(regexp_extract_all(text, lit(EmailPattern), lit(0))).cast("long")
  def countPhones(text: Column): Column =
    size(regexp_extract_all(text, lit(PhonePattern), lit(0))).cast("long")
}
