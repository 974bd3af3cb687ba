package graft

import java.nio.file.{Files, Path, Paths}
import scala.jdk.CollectionConverters._
import org.scalatest.funsuite.AnyFunSuite

/** Citation discipline gate: every backtick-quoted `*.py[:lines]`
  * reference citation in `src/main` must resolve against the read-only
  * reference checkout at `/root/reference`, and any cited line range
  * must lie within the file. Guards against phantom paths (the r12
  * verdict found four hallucinated ones) staying out of the tree.
  */
class CitationSpec extends AnyFunSuite {

  private val refRoot  = Paths.get("/root/reference")
  private val mainRoot = Paths.get("src/main/scala")

  // `kds_example/lbd/common.py:7-33` | `tests/test_lbd_to_s3.py:11-22` | `lambda_app/app.py`
  private val Cite = "`([A-Za-z0-9_./-]+\\.py)(?::(\\d+)(?:-(\\d+))?)?`".r

  private def scalaFiles(root: Path): Seq[Path] =
    Files.walk(root).iterator().asScala.filter(_.toString.endsWith(".scala")).toSeq

  test("every reference .py citation in src/main resolves, with valid line ranges") {
    assume(Files.isDirectory(refRoot), "reference checkout not present")
    val problems = scala.collection.mutable.ArrayBuffer.empty[String]
    for (f <- scalaFiles(mainRoot)) {
      val text = new String(Files.readAllBytes(f), java.nio.charset.StandardCharsets.UTF_8)
      for (m <- Cite.findAllMatchIn(text)) {
        val rel    = m.group(1)
        val target = refRoot.resolve(rel)
        if (!Files.isRegularFile(target)) {
          problems += s"$f cites `$rel` — no such file under $refRoot"
        } else if (m.group(2) != null) {
          val nLines = Files.readAllLines(target).size()
          val last   = Option(m.group(3)).getOrElse(m.group(2)).toInt
          val first  = m.group(2).toInt
          if (first < 1 || last > nLines || first > last)
            problems += s"$f cites `${m.matched}` but ${rel} has $nLines lines"
        }
      }
    }
    assert(problems.isEmpty, problems.mkString("\n"))
  }
}
