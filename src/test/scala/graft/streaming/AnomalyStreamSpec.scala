package graft.streaming

import graft.SparkSpec
import org.apache.spark.sql.execution.streaming.runtime.MemoryStream
import org.apache.spark.sql.streaming.OutputMode

class AnomalyStreamSpec extends SparkSpec {
  import spark.implicits._

  private val RocksDb =
    "org.apache.spark.sql.execution.streaming.state.RocksDBStateStoreProvider"
  private val ProviderKey = "spark.sql.streaming.stateStore.providerClass"

  private def run(name: String, z: Double, minHistory: Long)(
      batches: Seq[(String, Long)]*): Seq[Anomaly] = {
    implicit val sq = spark.sqlContext
    val prev = spark.conf.getOption(ProviderKey)
    spark.conf.set(ProviderKey, RocksDb)
    try {
      val input = MemoryStream[(String, Long)]
      val query = AnomalyStream(input.toDS(), z, minHistory)
        .writeStream.format("memory").queryName(name)
        .outputMode(OutputMode.Append).start()
      try {
        batches.foreach { b => input.addData(b); query.processAllAvailable() }
        spark.table(name).as[Anomaly].collect().toSeq
      } finally query.stop()
    } finally {
      prev match {
        case Some(v) => spark.conf.set(ProviderKey, v)
        case None => spark.conf.unset(ProviderKey)
      }
    }
  }

  test("spike after a warm history is flagged with the batch-formula z-score") {
    // history: 45..55 cents-ish band, 22 obs; then a 500 spike
    val hist = (1 to 22).map(i => ("A", 45L + (i % 11)))
    val got = run("an1", z = 3.0, minHistory = 20)(hist, Seq(("A", 500L)))
    assert(got.map(_.value) == Seq(500L))
    val a = got.head
    assert(a.key == "A" && a.n_history == 22L)
    // exact same formula as Stats.zscoreOutliers over the history
    val vs = hist.map(_._2)
    val n = vs.size.toDouble
    val mean = vs.sum.toDouble / n
    val std = math.sqrt((vs.map(v => v * v).sum.toDouble
      - (vs.sum.toDouble * vs.sum.toDouble) / n) / n)
    assert(a.z_micro == math.round((500.0 - mean) / std * 1e6))
  }

  test("cold start below minHistory never emits; keys are isolated") {
    val got = run("an2", z = 2.0, minHistory = 10)(
      (1 to 5).map(i => ("cold", i * 1000L)), // wild values, but n < 10
      (1 to 12).map(i => ("warm", 100L + (i % 3))),
      Seq(("warm", 9999L), ("cold", 1L)))
    assert(got.map(g => (g.key, g.value)) == Seq(("warm", 9999L)))
  }

  test("constant history: a differing value flags at the infinity pin, then absorbs") {
    val got = run("an3", z = 3.0, minHistory = 5)(
      (1 to 6).map(_ => ("c", 7L)),
      Seq(("c", 7L), ("c", 8L), ("c", 3L)))
    // 8 is scored against 7 constant sevens (std=0 -> +inf pin); 3 is then
    // scored against {7 x7, 8} which has real variance
    val vs = Seq.fill(7)(7L) :+ 8L
    val n = vs.size.toDouble
    val mean = vs.sum.toDouble / n
    val std = math.sqrt((vs.map(v => v * v).sum.toDouble
      - (vs.sum.toDouble * vs.sum.toDouble) / n) / n)
    assert(got.map(g => (g.value, g.z_micro)) ==
      Seq((8L, 1000000000L), (3L, math.round((3.0 - mean) / std * 1e6))))
  }

  test("outlier burst: every member is flagged, then history absorbs them") {
    val got = run("an4", z = 3.0, minHistory = 10)(
      (1 to 30).map(i => ("b", 50L + (i % 5))),
      Seq(("b", 400L), ("b", 401L)))  // same batch: both scored pre-update
    assert(got.map(_.value) == Seq(400L, 401L))
    assert(got(1).n_history == 31L) // second saw the first in its history
  }
}
