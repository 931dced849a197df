package graft.analytics

import graft.SparkSpec
import org.apache.spark.sql.functions._

class LayoutSpec extends SparkSpec {

  test("bucketed tables join without a shuffle exchange") {
    // warehouse dir is a static conf — bucketed tables land in the
    // default ./spark-warehouse (gitignored); dropped after the test
    val li = spark.read.parquet(s"$sf0001/lineitem.parquet")
      .select("l_orderkey", "l_quantity")
    val o = spark.read.parquet(s"$sf0001/orders.parquet")
      .select("o_orderkey", "o_totalprice")
    Layout.writeBucketed(li, "li_b", "l_orderkey", 8)
    Layout.writeBucketed(o, "o_b", "o_orderkey", 8)
    // disable broadcast so the join strategy must rely on the bucket
    // layout; restore the SAVED value after (shared-session contract)
    val savedThreshold = spark.conf.get("spark.sql.autoBroadcastJoinThreshold")
    spark.conf.set("spark.sql.autoBroadcastJoinThreshold", "-1")
    try {
      val joined = spark.table("li_b")
        .join(spark.table("o_b"),
          col("l_orderkey") === col("o_orderkey"))
      val plan = joined.queryExecution.executedPlan.toString
      // co-located: no shuffle on either side of the join
      plan should not include "Exchange hashpartitioning"
      joined.count() shouldBe li.count() // every lineitem has its order
    } finally {
      spark.conf.set("spark.sql.autoBroadcastJoinThreshold", savedThreshold)
      spark.sql("DROP TABLE IF EXISTS li_b")
      spark.sql("DROP TABLE IF EXISTS o_b")
    }
  }

  test("salted aggregation equals the plain aggregation") {
    val li = spark.read.parquet(s"$sf0001/lineitem.parquet")
    val salted = Layout.saltedSumCount(li, "l_returnflag", "l_quantity", 16)
      .orderBy("l_returnflag").collect()
    val plain = li.groupBy("l_returnflag")
      .agg(sum(col("l_quantity").cast("decimal(24,6)")).cast("double")
        .as("sum_l_quantity"), count(lit(1)).as("n"))
      .orderBy("l_returnflag").collect()
    salted.map(r => (r.getString(0), r.getDouble(1), r.getLong(2))) shouldBe
      plain.map(r => (r.getString(0), r.getDouble(1), r.getLong(2)))
  }
}
