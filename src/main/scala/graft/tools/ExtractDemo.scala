package graft.tools

import graft.extract.{Extract, PageInput}
import graft.canon.Canon

/** CLI surface for the extraction + canonicalization pipeline:
  * reads an HTML/CSS/JSON/XML file, runs the full extractor dispatch, and
  * prints the canonicalized outlinks/assets — what one crawl-wave row sees.
  *
  * Usage: runMain graft.tools.ExtractDemo <file> <pageUrl> [contentType]
  */
object ExtractDemo {
  def main(args: Array[String]): Unit = {
    if (args.length < 2) {
      System.err.println("usage: ExtractDemo <file> <pageUrl> [contentType]")
      sys.exit(2)
    }
    val body = new String(java.nio.file.Files.readAllBytes(java.nio.file.Paths.get(args(0))), "UTF-8")
    val pageUrl = args(1)
    val ct = if (args.length > 2) args(2) else "text/html"
    val r = Extract.page(PageInput(pageUrl, ct, body = body))
    def canonLine(raw: String): String =
      Canon.canonicalize(raw, Some(pageUrl)) match {
        case Right(c) => s"  $raw\n    -> ${c.href}  [host=${c.host} hash=${Canon.fnv64a(c.href)}]"
        case Left(rej) => s"  $raw\n    -> REJECTED (${rej.code})"
      }
    println(s"page: $pageUrl ($ct)")
    println(s"outlinks (${r.outlinks.size}):")
    r.outlinks.foreach(o => println(canonLine(o)))
    println(s"assets (${r.assets.size}):")
    r.assets.foreach(a => println(canonLine(a)))
    if (r.atImports.nonEmpty) {
      println(s"css @imports (${r.atImports.size}):")
      r.atImports.foreach(a => println(canonLine(a)))
    }
  }
}
