package graft.output

/** DOT-graph sink (S7/F4/G8, SURVEY.md §2.1/§2.6): renders a collected
  * result graph as GraphViz DOT text. Driver-side by design — result
  * graphs are bounded (≤4 expansion levels) so this is presentation,
  * not a distributed operator (same stance as the survey: graph.erl /
  * graphviz.erl are formatting, not dataflow).
  */
object Dot {

  /** F4: node-id sanitizer — the reference's exact character class
    * `[^A-Za-z1-9]` (graph.erl:30; note the class omits `0`). */
  def sanitizeId(s: String): String = s.replaceAll("[^A-Za-z1-9]", "_")

  /** O2: surname sort key — last space-separated token (graph.erl:93-98). */
  def surnameKey(name: String): String = {
    val ts = name.split(" ")
    if (ts.isEmpty) name else ts.last
  }

  /** Render `(src, dst)` vertex edges rooted at `root`. Children are
    * ordered alphabetically for movies (O1) / by surname for actors
    * (O2), mirroring graph.erl:92-98. */
  def render(root: String, edges: Seq[(String, String)], actors: Boolean): String = {
    val key: String => String = if (actors) surnameKey else identity
    val sb = new StringBuilder
    sb.append("digraph G {\n")
    sb.append(s"""  ${sanitizeId(root)} [label="${escape(root)}", shape=box];\n""")
    val vertices = (edges.flatMap(e => Seq(e._1, e._2)).toSet - root).toSeq.sortBy(key)
    vertices.foreach { v =>
      sb.append(s"""  ${sanitizeId(v)} [label="${escape(v)}"];\n""")
    }
    edges.sortBy(e => (key(e._1), key(e._2))).foreach { case (a, b) =>
      sb.append(s"  ${sanitizeId(a)} -> ${sanitizeId(b)};\n")
    }
    sb.append("}\n")
    sb.toString
  }

  private def escape(s: String): String =
    s.replace("\\", "\\\\").replace("\"", "\\\"")

  def writeFile(path: String, content: String): Unit = {
    java.nio.file.Files.writeString(java.nio.file.Paths.get(path), content)
    ()
  }

  /** True iff the GraphViz `dot` binary is on PATH. */
  def dotAvailable: Boolean =
    sys.env.getOrElse("PATH", "").split(java.io.File.pathSeparator)
      .exists(p => java.nio.file.Files.isExecutable(
        java.nio.file.Paths.get(p, "dot")))

  /** S7 PNG parity (graph.erl:47-58, graphviz.erl:94-100: the reference
    * shells `dot -Tpng` and opens the image): render DOT text to a PNG
    * file via the `dot` binary. Returns the PNG path, or None when
    * `dot` is not installed (graceful skip — DOT text is still the
    * canonical sink). */
  def renderPng(dotText: String, pngPath: String): Option[String] = {
    if (!dotAvailable) return None
    val dotFile = java.nio.file.Files.createTempFile("graft", ".dot")
    try {
      java.nio.file.Files.writeString(dotFile, dotText)
      val p = new ProcessBuilder("dot", "-Tpng", dotFile.toString, "-o", pngPath)
        .redirectErrorStream(true).start()
      val rc = p.waitFor()
      if (rc == 0 && java.nio.file.Files.exists(java.nio.file.Paths.get(pngPath)))
        Some(pngPath)
      else None
    } finally java.nio.file.Files.deleteIfExists(dotFile)
  }
}
