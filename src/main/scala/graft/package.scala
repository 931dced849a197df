package object graft {
  /** Canonical table names in the driver testdata (TESTDATA.md). */
  val TestTables: Seq[String] = Seq(
    "region", "nation", "customer", "supplier", "part",
    "orders", "lineitem", "events", "documents", "embeddings")
}
