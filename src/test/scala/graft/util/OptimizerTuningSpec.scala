package graft.util

import graft.SparkSpec

class OptimizerTuningSpec extends SparkSpec {

  private val confKey = "spark.sql.optimizer.excludedRules"

  test("excludeRule appends without clobbering existing exclusions") {
    val saved = spark.conf.getOption(confKey)
    try {
      spark.conf.set(confKey, "a.b.SomeRule")
      OptimizerTuning.tune(spark)
      val v = spark.conf.get(confKey)
      v.split(",").map(_.trim).toSet shouldBe
        Set("a.b.SomeRule", OptimizerTuning.InferFiltersFromGenerate)
      // idempotent: calling again must not duplicate the entry
      OptimizerTuning.tune(spark)
      spark.conf.get(confKey) shouldBe v
    } finally saved match {
      case Some(v) => spark.conf.set(confKey, v)
      case None => spark.conf.unset(confKey)
    }
  }

  test("tune from empty conf sets exactly the engine exclusion") {
    val saved = spark.conf.getOption(confKey)
    try {
      spark.conf.unset(confKey)
      OptimizerTuning.tune(spark)
      spark.conf.get(confKey) shouldBe OptimizerTuning.InferFiltersFromGenerate
    } finally saved match {
      case Some(v) => spark.conf.set(confKey, v)
      case None => spark.conf.unset(confKey)
    }
  }
}
