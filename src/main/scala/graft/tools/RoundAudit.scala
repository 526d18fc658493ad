package graft.tools

import java.nio.file.{Files, Path, Paths}
import scala.jdk.CollectionConverters._

/** Executable drift guard for the native-`round` float contract
  * (VERDICT r15 item 3). ROUND_AUDIT.md's four-class rule — QRound on
  * every rational-valued rounding surface, native `round` only for
  * transcendental-valued (S3), pre-quantized-identity (S2) and
  * non-finite-capable (S4) surfaces — was prose only: nothing stopped a
  * new unclassified `round(` site from landing (r16 itself found three
  * missed U3 sites this way: chars_per_token, train_acc/pred_pos_rate,
  * the KMV estimator trio, plus the streaming dedup jaccard).
  *
  * This object extracts every native `round(` call site under
  * `src/main` (comment-stripped; `qround`/`bround` excluded, oracle SQL
  * strings INCLUDED — both engines' sites are contract surfaces) and
  * keys each by `file § whitespace-normalized-line`. RoundAuditSpec
  * compares the extraction against the committed classification list at
  * `src/test/resources/round_audit_sites.tsv` and fails on any
  * unlisted, stale, or UNCLASSIFIED entry.
  *
  * Regenerate the list after an intentional change with:
  * {{{ sbt "runMain graft.tools.RoundAudit --write" }}}
  * (preserves existing class labels, marks new sites UNCLASSIFIED —
  * classify them in ROUND_AUDIT.md first, then here).
  */
object RoundAudit {
  val SourceRoot = "src/main/scala"
  val ResourcePath = "src/test/resources/round_audit_sites.tsv"

  /** Classes a native site may carry (ROUND_AUDIT.md taxonomy). U-class
    * sites must be QRound'd, never listed; TOOL covers diagnostic-only
    * mains whose output is never oracle-compared. */
  val AllowedClasses: Set[String] = Set("S2", "S3", "S4", "U1-accepted", "TOOL")

  final case class Site(file: String, snippet: String) {
    def key: String = s"$file§$snippet"
  }

  /** (site -> occurrence count) over every .scala file under root. */
  def extract(root: String = SourceRoot): Map[Site, Int] =
    listScala(Paths.get(root)).flatMap { p =>
      extractFrom(p.toString.replace('\\', '/'),
        new String(Files.readAllBytes(p), "UTF-8"))
    }.groupBy(identity).view.mapValues(_.size).toMap

  /** One file's sites; separated from IO so the spec can red-test the
    * detector on synthetic content. */
  def extractFrom(file: String, content: String): Seq[Site] = {
    val call = raw"\bround\(".r
    var inBlock = false
    content.linesIterator.flatMap { raw =>
      var s = raw
      if (inBlock) {
        val i = s.indexOf("*/")
        if (i < 0) s = ""
        else { s = s.substring(i + 2); inBlock = false }
      }
      var open = s.indexOf("/*")
      while (open >= 0) {
        val close = s.indexOf("*/", open + 2)
        if (close < 0) { s = s.substring(0, open); inBlock = true; open = -1 }
        else { s = s.substring(0, open) + s.substring(close + 2); open = s.indexOf("/*") }
      }
      val line = s.indexOf("//") match {
        case -1 => s
        case i  => s.substring(0, i)
      }
      val hits = call.findAllMatchIn(line).count { m =>
        // \b already rejects qround(/bround(; keep math.round( and SQL
        // round( — both are native rounding surfaces under audit
        val before = line.substring(0, m.start)
        !before.endsWith("q") && !before.endsWith("b")
      }
      if (hits == 0) Nil
      else Seq.fill(hits)(Site(file, normalize(line)))
    }.toSeq
  }

  private def normalize(line: String): String =
    line.trim.replaceAll("\\s+", " ")

  private def listScala(root: Path): Seq[Path] =
    Files.walk(root).iterator.asScala
      .filter(p => p.toString.endsWith(".scala") && Files.isRegularFile(p))
      .toSeq.sortBy(_.toString)

  final case class Entry(clazz: String, count: Int, site: Site)

  def readList(path: String = ResourcePath): Seq[Entry] =
    Files.readAllLines(Paths.get(path)).asScala.toSeq
      .filterNot(l => l.startsWith("#") || l.trim.isEmpty)
      .map { l =>
        val Array(c, n, f, snip) = l.split("\t", 4)
        Entry(c, n.toInt, Site(f, snip))
      }

  def main(args: Array[String]): Unit = {
    val current = extract()
    if (args.contains("--write")) {
      val existing: Map[String, String] =
        if (Files.exists(Paths.get(ResourcePath)))
          readList().map(e => e.site.key -> e.clazz).toMap
        else Map.empty
      val header =
        """|# Native-round call-site classification (machine-readable twin of
           |# ROUND_AUDIT.md; validated by RoundAuditSpec).
           |# class<TAB>count<TAB>file<TAB>normalized-line
           |# Classes: S2 pre-quantized identity | S3 transcendental/bounded-count
           |# | S4 non-finite-capable (native REQUIRED) | U1-accepted bounded
           |# iterative | TOOL diagnostic-only main. A new site lands as
           |# UNCLASSIFIED and must be classified (or QRound'd) before the
           |# spec goes green.
           |""".stripMargin
      val body = current.toSeq
        .sortBy { case (s, _) => (s.file, s.snippet) }
        .map { case (s, n) =>
          s"${existing.getOrElse(s.key, "UNCLASSIFIED")}\t$n\t${s.file}\t${s.snippet}"
        }.mkString("", "\n", "\n")
      Files.writeString(Paths.get(ResourcePath), header + body)
      println(s"[round-audit] wrote ${current.size} sites to $ResourcePath")
    } else {
      current.toSeq.sortBy { case (s, _) => (s.file, s.snippet) }
        .foreach { case (s, n) => println(s"$n\t${s.file}\t${s.snippet}") }
      println(s"[round-audit] ${current.size} distinct sites")
    }
  }
}
