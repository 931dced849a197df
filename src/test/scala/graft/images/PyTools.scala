package graft.images

/** Shared resolution + invocation for the repo's python oracle tools
  * (the libwebp ctypes scripts under `tools/`) — one place for the
  * repo-root walk and the exit-42 "native lib absent" skip protocol,
  * so a resolution fix never has to land twice
  * ([[Vp8ConformanceSpec]], [[Vp8QualitySpec]]). */
object PyTools {

  /** Resolve `tools/<name>` from the REPO ROOT — the first ancestor
    * of the JVM's CWD carrying build.sbt (a forked test JVM may start
    * arbitrarily deep, and anchoring on the build marker can't be
    * shadowed by a stray copy in an unrelated ancestor). */
  def repoTool(name: String): Either[String, java.io.File] =
    Iterator.iterate(
        new java.io.File(sys.props("user.dir")).getAbsoluteFile)(_
        .getParentFile)
      .takeWhile(_ != null)
      .find(d => new java.io.File(d, "build.sbt").exists)
      .map(d => new java.io.File(d, s"tools/$name"))
      .filter(_.exists)
      .toRight(s"tools/$name not found under the repo root above " +
        sys.props("user.dir"))

  /** Run a python tool; returns (exitCode, combined output). Exit 42
    * is the tools' shared "libwebp unavailable" convention — callers
    * cancel loudly on it. */
  def runPython(tool: java.io.File, args: String*): (Int, String) = {
    val out = new StringBuilder
    val rc = scala.sys.process.Process(
      Seq("python3", tool.getAbsolutePath) ++ args)
      .!(scala.sys.process.ProcessLogger(l => out.append(l).append('\n')))
    (rc, out.toString)
  }
}
