package graft.config

import scala.io.Source

/** Config-as-query-plan (SURVEY.md §2.1 S5, §3.1): the reference drives the
  * entire pipeline from a YAML file (`main.py:13`, the `configs/` yml
  * files) — stage toggles, filter predicates, limits, transformation
  * chain, sink paths.
  *
  * Mirrored here as typed case classes plus a minimal YAML-subset loader
  * (2-space nesting, `key: value` scalars, `- ` list items — exactly the
  * shapes the reference configs use; no external deps by design).
  */
final case class RunToggles(extract: Boolean = true,
                            transform: Boolean = true,
                            load: Boolean = true)

final case class FilterCfg(columnId: String,
                           min: Option[Double], max: Option[Double])

final case class TransformCfg(name: String,
                              params: Map[String, String] = Map.empty)

final case class PipelineConfig(
    run: RunToggles = RunToggles(),
    inputPath: String = "",
    separator: String = "\\|\\|\\|",
    shuffleSeed: Option[Long] = None,
    maxSamples: Option[Int] = None,
    posTagStats: Boolean = true,
    readabilityScores: Boolean = true,
    // reference `metadata_generator_backend` (utils.py:39-43, selected in
    // configs/*.yml:15) — typed, not a String, so an invalid backend is
    // unrepresentable: fromYaml validates at parse time and direct
    // construction can only name a real profile
    metadataGeneratorBackend: graft.enrich.MetadataBackend =
      graft.enrich.MetadataBackend.Spacy,
    filters: Seq[FilterCfg] = Nil,
    downloadEnabled: Boolean = false,
    nWorkers: Int = 8,
    transformations: Seq[TransformCfg] = Nil,
    outputDir: String = "")

object PipelineConfig {

  /** Parse the reference-shaped YAML subset into a raw tree. Supports
    * nested maps by 2-space indent and lists of scalars or flat maps. */
  private[config] def parseYaml(text: String): Map[String, Any] = {
    val lines = text.linesIterator
      .map(_.replaceAll("#.*$", ""))
      .filter(_.trim.nonEmpty).toVector

    def indentOf(l: String): Int = l.takeWhile(_ == ' ').length

    def scalar(v: String): Any = {
      val s = v.trim.stripPrefix("\"").stripSuffix("\"")
        .stripPrefix("'").stripSuffix("'")
      s
    }

    // recursive descent over the indented block starting at `from`
    def block(from: Int, until: Int, indent: Int): Any = {
      val first = lines(from).trim
      if (first.startsWith("- ")) { // list
        var items = Vector.empty[Any]
        var i = from
        while (i < until) {
          if (indentOf(lines(i)) == indent && lines(i).trim.startsWith("- ")) {
            val head = lines(i).trim.drop(2)
            var j = i + 1
            while (j < until && !(indentOf(lines(j)) == indent &&
              lines(j).trim.startsWith("- "))) j += 1
            if (head.contains(":")) { // list of maps; inline first pair
              val Array(k, v) = head.split(":", 2)
              val rest =
                if (i + 1 < j) block(i + 1, j, indentOf(lines(i + 1)))
                  .asInstanceOf[Map[String, Any]]
                else Map.empty[String, Any]
              items :+= (rest + (k.trim -> scalar(v)))
            } else items :+= scalar(head)
            i = j
          } else i += 1
        }
        items
      } else { // map
        var m = Map.empty[String, Any]
        var i = from
        while (i < until) {
          if (indentOf(lines(i)) == indent) {
            // tolerate colon-less junk lines instead of MatchError
            val parts = lines(i).trim.split(":", 2)
            val (k, v) =
              if (parts.length == 2) (parts(0), parts(1)) else (parts(0), "")
            var j = i + 1
            while (j < until && indentOf(lines(j)) > indent) j += 1
            if (v.trim.nonEmpty) m += k.trim -> scalar(v)
            else if (j > i + 1)
              m += k.trim -> block(i + 1, j, indentOf(lines(i + 1)))
            else m += k.trim -> ""
            i = j
          } else i += 1
        }
        m
      }
    }
    if (lines.isEmpty) Map.empty
    else block(0, lines.length, indentOf(lines.head))
      .asInstanceOf[Map[String, Any]]
  }

  private def bool(v: Any, dflt: Boolean): Boolean = v match {
    case s: String if s.nonEmpty => s.toLowerCase == "true"
    case _ => dflt
  }

  def fromYaml(text: String): PipelineConfig = {
    val root = parseYaml(text)
    def sub(k: String): Map[String, Any] = root.get(k) match {
      case Some(m: Map[_, _]) => m.asInstanceOf[Map[String, Any]]
      case _ => Map.empty
    }
    val run = sub("run")
    val input = sub("input")
    val extraction = sub("extraction")
    val output = sub("output")
    val filters = extraction.get("filters") match {
      case Some(xs: Vector[_]) => xs.collect { case m: Map[_, _] =>
        val mm = m.asInstanceOf[Map[String, Any]]
        FilterCfg(mm.getOrElse("columnId", "").toString,
          mm.get("min").map(_.toString.toDouble),
          mm.get("max").map(_.toString.toDouble))
      }
      case _ => Nil
    }
    val transforms = sub("transformations").get("chain") match {
      case Some(xs: Vector[_]) => xs.collect {
        case s: String => TransformCfg(s)
        case m: Map[_, _] =>
          val mm = m.asInstanceOf[Map[String, Any]]
          TransformCfg(mm.getOrElse("name", "").toString,
            (mm - "name").map { case (k, v) => k.toString -> v.toString })
      }
      case _ => Nil
    }
    PipelineConfig(
      run = RunToggles(
        bool(run.getOrElse("extract", ""), dflt = true),
        bool(run.getOrElse("transform", ""), dflt = true),
        bool(run.getOrElse("load", ""), dflt = true)),
      inputPath = input.getOrElse("path", "").toString,
      separator = input.getOrElse("separator", "\\|\\|\\|").toString,
      shuffleSeed = extraction.get("shuffle_seed").map(_.toString.toLong),
      maxSamples = extraction.get("max_samples").map(_.toString.toInt),
      posTagStats = bool(extraction.getOrElse("pos_tag_stats", ""), dflt = true),
      readabilityScores =
        bool(extraction.getOrElse("readability_scores", ""), dflt = true),
      metadataGeneratorBackend = graft.enrich.MetadataBackend.fromName(
        extraction.getOrElse("metadata_generator_backend", "spacy")
          .toString match { case "" => "spacy"; case s => s }),
      filters = filters,
      downloadEnabled = bool(extraction.getOrElse("download", ""), dflt = false),
      nWorkers = extraction.get("n_workers")
        .map(_.toString.toInt).getOrElse(8),
      transformations = transforms,
      outputDir = output.getOrElse("dir", "").toString)
  }

  def fromFile(path: String): PipelineConfig = {
    val src = Source.fromFile(path, "UTF-8")
    try fromYaml(src.mkString) finally src.close()
  }
}
