package graft

import java.nio.file.Files

import org.apache.spark.sql.execution.streaming.runtime.MemoryStream
import org.scalatest.funsuite.AnyFunSuite

import graft.streaming.StreamingSemDeDup

final case class VecDoc(vec_id: Long, embedding: Seq[Double])

/** Streaming semantic dedup against the admitted-representative state:
  * kept vectors gate future batches, dropped vectors never do, and a
  * replayed batch cannot grow the state (self-idempotent admission).
  */
class StreamingSemDeDupSpec extends AnyFunSuite {
  lazy val spark = SparkTestSession.spark
  import spark.implicits._

  private val cents = Seq(0L -> Array(1.0, 0.0), 1L -> Array(0.0, 1.0))

  private def cos(a: Seq[Double], b: Seq[Double]): Double = {
    val d = a.zip(b).map { case (x, y) => x * y }.sum
    val r = d / (math.sqrt(a.map(x => x * x).sum) * math.sqrt(b.map(x => x * x).sum))
    BigDecimal(r).setScale(6, BigDecimal.RoundingMode.HALF_UP).toDouble
  }

  // cell-1 geometry where near-dup transitivity FAILS at τ = 0.95
  // (~18°): v20 at 90°, v21 at 75° (matches v20), v31 at 60° (matches
  // v21 but NOT v20) — the kept-reps-only semantics hinge on v31
  private val v20 = Seq(0.0, 1.0)
  private val v21 = Seq(math.cos(math.toRadians(75)), math.sin(math.toRadians(75)))
  private val v31 = Seq(math.cos(math.toRadians(60)), math.sin(math.toRadians(60)))

  test("batches gate against kept representatives only; dropped vectors never gate") {
    implicit val sqlCtx = spark.sqlContext
    val dir = Files.createTempDirectory("stream-semdedup").toString
    val (stateDir, decDir) = (s"$dir/state", s"$dir/decisions")

    val stream = MemoryStream[VecDoc]
    val q = StreamingSemDeDup.start(stream.toDF(), "vec_id", "embedding",
      cents, threshold = 0.95, stateDir, decDir, s"$dir/ck")
    try {
      // batch 0: v10 keeps (cell 0), v20 keeps (cell 1), v21 drops vs v20
      stream.addData(VecDoc(10L, Seq(1.0, 0.0)), VecDoc(20L, v20),
        VecDoc(21L, v21))
      q.processAllAvailable()
      // batch 1: v30 drops vs rep v10; v31 matches only the DROPPED v21
      // (cos v31·v20 ≈ .866 < .95, cos v31·v21 ≈ .966) -> KEPT, because
      // the state holds representatives, not history
      stream.addData(VecDoc(30L, Seq(2.0, 0.0)), VecDoc(31L, v31))
      q.processAllAvailable()
    } finally q.stop()

    assert(cos(v20, v21) >= 0.95 && cos(v21, v31) >= 0.95 && cos(v20, v31) < 0.95,
      "fixture geometry must break transitivity at the threshold")
    val dec = spark.read.parquet(decDir)
      .select("vec_id", "cluster", "nn_sim", "keep", "batch_id")
      .as[(Long, Long, Option[Double], Boolean, Long)]
      .collect().map(r => r._1 -> r).toMap
    assert(dec.keySet == Set(10L, 20L, 21L, 30L, 31L))
    assert(dec(10L) == ((10L, 0L, None, true, 0L)))
    assert(dec(20L) == ((20L, 1L, None, true, 0L)))
    assert(dec(21L) == ((21L, 1L, Some(cos(v20, v21)), false, 0L)))
    assert(dec(30L) == ((30L, 0L, Some(1.0), false, 1L)))
    assert(dec(31L) == ((31L, 1L, Some(cos(v20, v31)), true, 1L)),
      "a vector matching only a dropped one must be admitted")
    // state holds exactly the kept representatives WITH their cell
    // assignment (paid once at admission, never re-swept per batch)
    assert(spark.read.parquet(stateDir).select("vec_id", "cluster")
      .as[(Long, Long)].collect().toSet ==
      Set((10L, 0L), (20L, 1L), (31L, 1L)))
  }

  test("state admission is self-idempotent under batch replay") {
    val dir = Files.createTempDirectory("stream-semdedup-replay").toString
    val (stateDir, decDir) = (s"$dir/state", s"$dir/decisions")
    val batch = Seq((10L, Seq(1.0, 0.0)), (20L, v20)).toDF("vec_id", "embedding")
    StreamingSemDeDup.gateBatch(batch, "vec_id", "embedding", cents,
      threshold = 0.95, stateDir, decDir, batchId = 0L)
    val once = spark.read.parquet(stateDir)
      .as[(Long, Seq[Double], Long)].collect().toSet
    assert(once.map(_._1) == Set(10L, 20L))
    // the crash-before-checkpoint-commit replay re-delivers batch 0:
    // each kept vector meets its own admitted copy at cosine 1.0 and is
    // NOT re-admitted — state is exactly-once with no log
    StreamingSemDeDup.gateBatch(batch, "vec_id", "embedding", cents,
      threshold = 0.95, stateDir, decDir, batchId = 0L)
    assert(spark.read.parquet(stateDir)
      .as[(Long, Seq[Double], Long)].collect().toSet == once)
    // decisions are the documented at-least-once append log: the replay
    // re-emits batch 0's rows (as drops against their own copies);
    // consumers dedup on (batch_id, id) keeping the first write
    val dec = spark.read.parquet(decDir)
      .select("vec_id", "batch_id").as[(Long, Long)].collect()
    assert(dec.count(_ == ((10L, 0L))) == 2)
  }
}
