package graft.config

import graft.SparkSpec

class PipelineConfigSpec extends SparkSpec {

  val yaml: String =
    """# mirrors configs/config_localhost_test_spacy.yml
      |run:
      |  extract: true
      |  transform: false
      |  load: true
      |input:
      |  path: /tmp/raw.txt
      |  separator: "\|\|\|"
      |extraction:
      |  max_samples: 300
      |  shuffle_seed: 1312
      |  pos_tag_stats: true
      |  readability_scores: false
      |  metadata_generator_backend: spacy  # can be polyglot, spacy or nltk
      |  download: false
      |  n_workers: 4
      |  filters:
      |    - columnId: num_tok
      |      min: 10
      |      max: 150
      |    - columnId: min_sent_len
      |      min: 5
      |transformations:
      |  chain:
      |    - name: resize
      |      max_width: 640
      |      max_height: 640
      |    - name: compress
      |output:
      |  dir: /tmp/out
      |""".stripMargin

  test("full reference-shaped config parses to typed plan") {
    val c = PipelineConfig.fromYaml(yaml)
    c.run shouldBe RunToggles(extract = true, transform = false, load = true)
    c.inputPath shouldBe "/tmp/raw.txt"
    c.maxSamples shouldBe Some(300)
    c.shuffleSeed shouldBe Some(1312L)
    c.readabilityScores shouldBe false
    c.posTagStats shouldBe true
    c.nWorkers shouldBe 4
    c.filters shouldBe Seq(
      FilterCfg("num_tok", Some(10.0), Some(150.0)),
      FilterCfg("min_sent_len", Some(5.0), None)) // absent max → default
    c.transformations.map(_.name) shouldBe Seq("resize", "compress")
    c.transformations.head.params("max_width") shouldBe "640"
    c.outputDir shouldBe "/tmp/out"
    c.metadataGeneratorBackend shouldBe graft.enrich.MetadataBackend.Spacy
  }

  test("metadata_generator_backend: all three reference values accepted, " +
    "absent key defaults to spacy, unknown value fails the parse") {
    import graft.enrich.MetadataBackend
    def withBackend(v: String): String =
      s"extraction:\n  metadata_generator_backend: $v\n"
    PipelineConfig.fromYaml(withBackend("nltk"))
      .metadataGeneratorBackend shouldBe MetadataBackend.Nltk
    PipelineConfig.fromYaml(withBackend("polyglot"))
      .metadataGeneratorBackend shouldBe MetadataBackend.Polyglot
    PipelineConfig.fromYaml(withBackend("SPACY"))
      .metadataGeneratorBackend shouldBe MetadataBackend.Spacy // case-insens
    PipelineConfig.fromYaml("run:\n  extract: true\n")
      .metadataGeneratorBackend shouldBe MetadataBackend.Spacy
    // the reference errors on an unknown enum value; silently defaulting
    // would mislabel the produced metadata
    an[IllegalArgumentException] should be thrownBy
      PipelineConfig.fromYaml(withBackend("stanza"))
  }

  test("empty/missing sections give reference defaults") {
    val c = PipelineConfig.fromYaml("run:\n  extract: true\n")
    c.run.transform shouldBe true
    c.maxSamples shouldBe None
    c.filters shouldBe Nil
    c.transformations shouldBe Nil
  }

  test("colon-less junk lines are tolerated, not MatchError") {
    val c = PipelineConfig.fromYaml(
      "run:\n  extract: true\njunkline\noutput:\n  dir: /tmp/x\n")
    c.outputDir shouldBe "/tmp/x"
  }
}
