package graft

import org.apache.spark.sql.SparkSession

/** Benchmark entry: runs every SparkEntry query against
  * SPARK_GRAFT_SF_DIR and prints ONE compact JSON line with per-query
  * seconds.
  *
  * Hard constraints learned from rounds 2-3 (BENCH_r02/r03 both had
  * `parsed: null`):
  *   - The harness keeps only the LAST ~2000 chars of combined
  *     stdout+stderr and parses the JSON line out of THAT tail. A final
  *     line longer than the tail arrives front-truncated and unparseable
  *     (r02: rc=0 but parsed=null). So the line must stay well under
  *     2000 chars: query keys are shortened to their unique "qNN"
  *     prefix and times use centisecond precision.
  *   - The harness also enforces an external wall timeout (r03: rc=124,
  *     no output at all). So the query loop honors an internal budget
  *     (SPARK_GRAFT_BENCH_BUDGET_S, default 480 s wall from JVM start)
  *     and a per-query watchdog (cancelJobGroup) — when time runs out,
  *     remaining queries are skipped and the final line still prints.
  *   - Nothing may print AFTER the final line (it would push the JSON
  *     out of the tail): logging is forced OFF and spark.stop() runs
  *     BEFORE the println.
  *
  * Full-precision, full-name results are additionally written to the
  * file given by SPARK_GRAFT_BENCH_OUT (default
  * /root/repo/bench_full.json), rewritten after EVERY query so even a
  * hard kill leaves complete partial numbers on disk.
  *
  * Resume: SPARK_GRAFT_BENCH_RESUME=<path-to-prior-bench_full.json>
  * (or "1" for the SPARK_GRAFT_BENCH_OUT path itself) carries the prior
  * run's measured per-query timings forward and re-runs ONLY queries
  * that prior artifact did not measure (its skipped + failed lists, and
  * anything new). A budget-truncated run is then completed by a second
  * invocation instead of being re-measured from scratch; the merged
  * artifact records the carried names under "carried" so provenance is
  * explicit. Carried timings are dropped when the prior run used a
  * different SF dir — merging timings across scale factors would
  * fabricate a number no single run produced.
  *
  * Methodology: AQE on; a warm-up action first so JIT/codegen/session
  * startup don't land in the first measured query; results are fully
  * materialized through the noop sink (count() would let Spark prune
  * work that a real consumer pays for). One timed run per query — the
  * min-of-2 hedge from r02 cost more wall than the noise it removed.
  */
object Bench {

  /** How a query that threw should be recorded. Pure so the bench
    * artifact's failure taxonomy is unit-testable:
    *   - `skipped`: the watchdog cancelled it because the round's WALL
    *     budget ran out mid-query — rerun next time, not a code bug;
    *   - `capped`: the watchdog cancelled it because it exceeded its
    *     own per-query cap while wall budget remained — slow, maybe
    *     environment, maybe a regression, but NOT a thrown error
    *     (r07 recorded exactly this case as "failed" for q61, which
    *     passed standalone minutes later: a cap-kill on a degraded VM
    *     is not an exception and must not land in the list the next
    *     round triages for real breakage);
    *   - `failed`: a genuine exception out of the query itself.
    */
  /** Measurement order, pure for testing: the priority block first
    * (one representative per operator family — even a truncated run
    * yields a cross-family regression table), then queries with NO
    * prior timing (new this round — they must get measured), then the
    * rest HEAVIEST-first by the prior artifact's timings (ties by
    * name). A wall-budget truncation then drops only the trivial
    * tail, and late-run VM degradation inflates the cheap end least.
    * Names absent from `names` fall out of the priority block (a
    * rename degrades to the sorted tail, never lost).
    */
  def orderQueries(
      names: Seq[String],
      priority: Seq[String],
      priorTimes: Map[String, Double]): Seq[String] = {
    val nameSet = names.toSet
    val rest = names.filterNot(priority.contains)
    val (known, unknown) = rest.partition(priorTimes.contains)
    priority.filter(nameSet.contains) ++ unknown ++
      known.sortBy(n => (-priorTimes(n), n))
  }

  def classifyFailure(
      e: Throwable, budgetLimited: Boolean, watchdogFired: Boolean): String = {
    // `watchdogFired` is whether OUR TimerTask actually cancelled the
    // job group: a cancellation message alone is not proof the
    // watchdog did it (a SparkContext shutdown after an executor OOM
    // also surfaces as "cancelled"), and such genuine breakage must
    // stay in `failed`, the list the next round triages.
    val cancelled = Iterator.iterate(e)(_.getCause)
      .takeWhile(_ != null).take(8)
      .exists(t => Option(t.getMessage).exists(_.toLowerCase.contains("cancel")))
    if (!(cancelled && watchdogFired)) "failed"
    else if (budgetLimited) "skipped"
    else "capped"
  }

  /** Parse a bench artifact: (sf dir, per-query numeric timings,
    * vm_health). None if unreadable or unparseable. One parser shared
    * by resume (timing carry) and the heavy-first ordering read, so
    * the two cannot drift on numeric shapes.
    */
  private[graft] def readArtifact(
      path: String): Option[(String, Map[String, Double], Option[Double])] = try {
    import org.json4s._
    val j = org.json4s.jackson.JsonMethods.parse(
      java.nio.file.Files.readString(java.nio.file.Paths.get(path)))
    def num(v: JValue): Option[Double] = v match {
      case JDouble(x) => Some(x)
      case JDecimal(x) => Some(x.toDouble)
      case JInt(x) => Some(x.toDouble)
      case _ => None
    }
    val sf = (j \ "sf") match { case JString(s) => s; case _ => "" }
    val qs = (j \ "queries") match {
      case JObject(fields) =>
        fields.flatMap { case (k, v) => num(v).map(k -> _) }.toMap
      case _ => Map.empty[String, Double]
    }
    Some((sf, qs, num(j \ "vm_health")))
  } catch { case _: Throwable => None }

  /** Probe-series normalization, pure so BenchClassifySpec can replay a
    * recorded vm_health_series (BENCH_r12's taint is the pinned
    * regression case).
    *
    * Round-12 lesson: the reference level must NOT be the run median —
    * in the r12 artifact the degraded plateau WAS the median (13 of 19
    * probes at 0.57-0.75s vs a 0.35-0.42s healthy floor), so
    * `value_normalized == value` and five 4-6x-inflated queries passed
    * silently. Detection is now referenced to the run's HEALTHY FLOOR
    * (min probe): a probe is degraded when it exceeds DegradedBand x
    * floor. Guard: the floor must RECUR — at least max(2, n/6) probes
    * within FloorCorrob x of it — before it is trusted as the run's
    * healthy level. Two failure modes demand this: (a) one outlier low
    * sample on a jittery-but-healthy run, and (b) the bookend effect
    * observed end-to-end at sf0.001 — the startup and closing probes
    * run in a systematically quieter context (no residual GC/cache
    * pressure from a just-finished query) and came in at ~0.5x the
    * uniform interior level, so a 2-probe corroboration flagged 160 of
    * 173 queries on a healthy run and fabricated a 41% normalized
    * speedup. An uncorroborated floor falls back to the old median
    * reference (which correctly says "nothing to normalize" for both
    * modes). The SCALING reference is the median of the healthy
    * (in-band) probes, not the floor itself, so corrections deflate to
    * typical-health terms rather than best-case terms.
    */
  private[graft] val DegradedBand = 1.5
  private[graft] val FloorCorrob = 1.25

  /** (degraded-threshold, scaling-reference) for a probe series. */
  private[graft] def probeBandRef(ts: Seq[Double]): (Double, Double) = {
    val floor = ts.min
    val median = { val s = ts.sorted; s(s.size / 2) }
    val needed = math.max(2, math.ceil(ts.size / 6.0).toInt)
    val corroborated = ts.count(_ <= FloorCorrob * floor) >= needed
    val band = DegradedBand * (if (corroborated) floor else median)
    val healthy = ts.filter(_ <= band).sorted
    val ref = if (healthy.isEmpty) median else healthy(healthy.size / 2)
    (band, ref)
  }

  /** Normalization factor for the query at measurement position `i`:
    * ref/nearest when its nearest probe is degraded, else 1. Carried
    * queries and <2-probe runs are never normalized.
    */
  private[graft] def probeFactor(series: Seq[(Int, Double)], i: Int): Double =
    if (series.size < 2) 1.0
    else {
      val (band, ref) = probeBandRef(series.map(_._2))
      val nearest = series.minBy { case (n, _) => math.abs(n - i) }._2
      if (nearest > band) ref / nearest else 1.0
    }

  /** Measured query names whose nearest probe sits in a degraded
    * window — emitted as `degraded_window_queries` so a tainted run is
    * visible in the artifact itself, not only via cross-round diffs.
    */
  private[graft] def degradedWindowQueries(
      series: Seq[(Int, Double)], measured: Seq[String]): Seq[String] =
    if (series.size < 2) Nil
    else measured.zipWithIndex.collect {
      case (n, i) if probeFactor(series, i) < 1.0 => n
    }

  /** SUSTAINED-degradation flag (round 16): queries above
    * `SustainedBand` x their committed warm reference
    * (BENCH_SCALING.json's `warm_sf0.1`, regenerated by
    * tools/warm_ref.py from certified-clean closes). The probe series
    * catches degradation SPIKES relative to the run's own floor, but a
    * run that is uniformly ~2x its true warm level probes flat and
    * passed as "clean" (the r15 artifact of record carried untouched
    * queries at 2x their r14 levels this way). The reference comes
    * from OUTSIDE the run, so a uniformly-slow window can no longer
    * certify itself.
    *
    * The absolute guard (`ref + MinExcessS`) keeps sub-second queries
    * from flagging on scheduler jitter: a 0.3 s query at 0.9 s is
    * noise, a 6 s query at 13 s is the r15 incident. Values judged are
    * the probe-NORMALIZED ones — a spike the probe series already
    * corrected must not double-flag.
    */
  private[graft] val SustainedBand = 2.0
  private[graft] val MinExcessS = 1.0

  private[graft] def sustainedDegraded(
      normByName: Seq[(String, Double)],
      refs: Map[String, Double]): Seq[String] =
    normByName.collect {
      case (n, v) if refs.get(n).exists(r =>
        v > math.max(SustainedBand * r, r + MinExcessS)) => n
    }

  /** The stdout line's sdq fragment, CAPPED (ADVICE r16): a badly
    * degraded run can flag dozens of queries, and an uncapped inline
    * list would push the final JSON past the harness parse tail exactly
    * when the flag matters. `nsdq` carries the true count whenever the
    * list is truncated (certification reads emptiness, which capping
    * never changes); the full flagged list with norm/ref values lives
    * in bench_full.json. Pure so BenchClassifySpec can budget-test the
    * worst-case non-empty rendering.
    */
  private[graft] val SdqInlineCap = 12

  private[graft] def sdqInline(shortNames: Seq[String]): String = {
    val list = shortNames.take(SdqInlineCap)
      .map("\"" + _ + "\"").mkString("[", ",", "]")
    val count =
      if (shortNames.size > SdqInlineCap) s""","nsdq":${shortNames.size}"""
      else ""
    s""""sdq":$list$count"""
  }

  /** Parse a bench artifact as an AUTO-CARRY source (round 17 — the
    * r16 truncation fix): per-query timings usable to fill a
    * budget-truncated run's skipped tail, returned ONLY when the
    * artifact is a complete certified-clean close at the same SF —
    * empty failure taxonomy, empty degraded-window and
    * sustained-degradation flags, not tainted, nothing carried into it
    * (no chains of carries), ≥ 150 measured queries, ≥ 10 probes. The
    * criteria mirror tools/warm_ref.py's clean-close definition plus
    * the r16 sdq flag. Returns (timings, vm_health) or empty.
    */
  private[graft] def readCleanCarrySource(
      path: String, sfDir: String): (Map[String, Double], Option[Double]) = try {
    import org.json4s._
    val j = org.json4s.jackson.JsonMethods.parse(
      java.nio.file.Files.readString(java.nio.file.Paths.get(path)))
    def num(v: JValue): Option[Double] = v match {
      case JDouble(x) => Some(x)
      case JDecimal(x) => Some(x.toDouble)
      case JInt(x) => Some(x.toDouble)
      case _ => None
    }
    def arrEmpty(k: String): Boolean = (j \ k) match {
      case JArray(xs) => xs.isEmpty
      case JNothing => true
      case _ => false
    }
    val sfOk = (j \ "sf") match { case JString(s) => s == sfDir; case _ => false }
    val clean = sfOk &&
      arrEmpty("failed") && arrEmpty("skipped") && arrEmpty("capped") &&
      arrEmpty("carried") && arrEmpty("degraded_window_queries") &&
      arrEmpty("sustained_degraded_queries") &&
      ((j \ "tainted") == JNothing) &&
      ((j \ "vm_health_series") match {
        case JArray(xs) => xs.size >= 10; case _ => false
      })
    if (!clean) (Map.empty, None)
    else (j \ "queries") match {
      case JObject(fields) if fields.size >= 150 =>
        (fields.flatMap { case (k, v) => num(v).map(k -> _) }.toMap,
          num(j \ "vm_health"))
      case _ => (Map.empty, None)
    }
  } catch { case _: Throwable => (Map.empty[String, Double], None) }

  /** Split a truncated run's skipped tail into (carried-now,
    * still-skipped) against a clean carry source — pure for
    * BenchClassifySpec. A skipped query with a clean prior timing is
    * carried with explicit provenance; one the source never measured
    * (a new query) stays genuinely skipped.
    */
  private[graft] def autoCarrySplit(
      skipped: Seq[String],
      source: Map[String, Double]): (Seq[(String, Double)], Seq[String]) = {
    val (have, miss) = skipped.partition(source.contains)
    (have.map(n => n -> source(n)), miss)
  }

  /** The committed warm-reference map for sustained-degradation
    * flagging — `warm_sf0.1` in BENCH_SCALING.json. Empty when the
    * file or key is missing (new checkouts must not fail the bench)
    * or when the run's SF dir is not the sf0.1 scoreboard scale the
    * references were measured at.
    */
  private[graft] def readWarmRefs(path: String, sfDir: String): Map[String, Double] =
    if (!sfDir.replaceAll("/+$", "").endsWith("sf0.1")) Map.empty
    else try {
      import org.json4s._
      val j = org.json4s.jackson.JsonMethods.parse(
        java.nio.file.Files.readString(java.nio.file.Paths.get(path)))
      (j \ "warm_sf0.1") match {
        case JObject(fields) => fields.flatMap {
          case (k, JDouble(x)) => Some(k -> x)
          case (k, JDecimal(x)) => Some(k -> x.toDouble)
          case (k, JInt(x)) => Some(k -> x.toDouble)
          case _ => None
        }.toMap
        case _ => Map.empty
      }
    } catch { case _: Throwable => Map.empty[String, Double] }

  def main(args: Array[String]): Unit = {
    val jvmStart = System.nanoTime()
    val sfDir = sys.env.getOrElse("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    val cpus = sys.env.getOrElse("SPARK_GRAFT_CPUS", "4")
    val budgetS = sys.env.getOrElse("SPARK_GRAFT_BENCH_BUDGET_S", "480").toDouble
    val queryCapS = sys.env.getOrElse("SPARK_GRAFT_BENCH_QUERY_CAP_S", "60").toDouble
    val outPath = sys.env.getOrElse("SPARK_GRAFT_BENCH_OUT", "/root/repo/bench_full.json")
    val refPath = sys.env.getOrElse("SPARK_GRAFT_BENCH_REF", "/root/repo/BENCH_SCALING.json")
    // committed warm references for the sustained-degradation flag —
    // empty (flag disabled) off the sf0.1 scoreboard scale
    val warmRefs = readWarmRefs(refPath, sfDir)
    val spark = SparkSession.builder()
      .master(s"local[$cpus]")
      .appName("graft-bench")
      .config("spark.sql.shuffle.partitions", cpus)
      .config("spark.sql.adaptive.enabled", "true")
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    val sc = spark.sparkContext
    sc.setLogLevel("ERROR")
    // The inter-query unpersist scrub races straggler task completions:
    // DAGScheduler then logs "attempted to access non-existent
    // accumulator" stacks at ERROR, flooding the bounded output tail
    // (this buried the r03 diagnostics). Benign for results — silence
    // that one logger for the bench process.
    org.apache.logging.log4j.core.config.Configurator.setLevel(
      "org.apache.spark.scheduler.DAGScheduler",
      org.apache.logging.log4j.Level.FATAL)

    def elapsedS: Double = (System.nanoTime() - jvmStart) / 1e9
    def fmt3(v: Double): String =
      String.format(java.util.Locale.ROOT, "%.3f", Double.box(v))
    def fmt2(v: Double): String =
      String.format(java.util.Locale.ROOT, "%.2f", Double.box(v))

    // Warm up: session machinery, parquet footer reads, and JIT/codegen
    // for the operator classes the queries use (hash agg, sort-merge +
    // broadcast join, window, explode) — measured numbers then reflect
    // steady state rather than first-use compilation. Footer reads are
    // schema-only (no job): a full count() per table cost ~200 s of the
    // budget on a slow-VM day for no extra warmth.
    Tables.All.foreach(t => Tables.load(spark, sfDir, t).schema)
    // On a pathological-VM day (JVM+session init alone can take
    // minutes here; see memory/PLANS notes) the numbers are noise
    // regardless — skip the JIT warmup and spend the budget on
    // covering queries instead.
    // Set when a timed-out warmup lane never drains despite the
    // cancel+await loop: measurement may then overlap warmup jobs, and
    // the artifact carries `"tainted":true` so the run can't be
    // mistaken for a clean one (r12 shipped exactly that overlap
    // silently).
    var warmupTainted = false
    if (elapsedS <= 120) locally {
      import org.apache.spark.sql.expressions.Window
      import org.apache.spark.sql.functions._
      // Family warmup legs in TWO LANES (round 11). Serially the legs
      // cost ~60s of pre-measurement elapsed; the first cut of this
      // round ran all seven CONCURRENTLY and measured the opposite of
      // the intent — 7 legs × 32-partition jobs = ~224 runnable tasks
      // thrashing 32 cores (cascade 78s parallel vs ~12s serial, PQ
      // 59s vs ~5s, on a HEALTHY-probing VM). Full-size legs are
      // CPU-bound, so their wall doesn't overlap; what does overlap is
      // one heavy lane against one cheap lane (~2x oversubscription):
      //   heavy lane: cascade → near-dup → ensemble (the full-size
      //               AQE-shaped pipelines, in cold-tax order)
      //   cheap lane: base synthetics → TPC-H shapes → PQ → codecs
      // Lanes are sequential inside, so each leg's elapsed gate
      // re-evaluates at ITS start — the serial design's adaptive
      // warmth-vs-coverage shedding, kept. Shared rules:
      //  - each leg releases ONLY its own cached handles; the GLOBAL
      //    scrub (clearCache + unpersist-all) runs ONCE after the
      //    join — a mid-flight global scrub would release the other
      //    lane's localCheckpoint blocks (truncated lineage, cannot
      //    recompute);
      //  - a leg failure is swallowed: warmup must never kill the
      //    bench (the measured query pays its own cold tax instead).
      val docsWarm = Tables.load(spark, sfDir, "documents")
      val legT0 = System.nanoTime()
      val legNames = scala.collection.mutable.ArrayBuffer[String]()
      final case class Leg(name: String, gateS: Double, body: () => Unit)
      def leg(name: String, gateS: Double)(body: => Unit): Leg = {
        legNames += name
        Leg(name, gateS, () => body)
      }
      def runLane(lane: Seq[Leg]): Unit = lane.foreach { l =>
        if (elapsedS > l.gateS)
          System.err.println(s"[bench] warmup leg ${l.name} gate-skipped at ${fmt2(elapsedS)}s")
        else try {
          // job group per leg so the lane-join timeout below can
          // CANCEL whatever is still in flight on a degraded day
          sc.setJobGroup(s"warmup-${l.name}", s"warmup-${l.name}",
            interruptOnCancel = true)
          l.body()
          System.err.println(s"[bench] warmup leg ${l.name} done at ${fmt2(elapsedS)}s")
        } catch { case e: Throwable =>
          System.err.println(s"[bench] warmup leg ${l.name} ABORTED: ${e.getMessage}")
        } finally sc.clearJobGroup()
      }
      // generic operator classes (hash agg, joins, window, explode,
      // md5) + the full parquet scan path — previously the serial
      // pre-leg block; a leg since round 11 so only the schema loads
      // stay on the main thread before the pool
      val leg_base = leg("base", 120) {
        Tables.load(spark, sfDir, "lineitem").count()
        val r = spark.range(100000).select(
          col("id"), (col("id") % 97).as("k"), (col("id") % 7).cast("double").as("v"))
        val w = Window.partitionBy("k").orderBy("id")
        r.groupBy("k").agg(sum(col("v").cast("decimal(18,2)")), count(lit(1))).count()
        r.join(r.select(col("k"), col("v").as("v2")).limit(1000), Seq("k")).count()
        r.withColumn("rn", row_number().over(w))
          .withColumn("run", sum("v").over(w.rowsBetween(Window.unboundedPreceding, 0)))
          .filter(col("rn") <= 2).count()
        r.select(explode(split(concat_ws(" ", col("k"), col("v"), lit("x")), " "))).count()
        r.select(md5(concat(lit("s:"), col("id").cast("string")))).count()
      }
      // The incremental-curation cascade (q137's family): the widest
      // plan in the suite (~800 physical nodes) — warm its codegen so
      // the first in-bench execution doesn't pay ~25-30s compilation
      // (r9 driver run: q137 42.8s gate-skipped vs 12.6s steady).
      // FULL-SIZE: AQE shapes full-size plans differently, so 40-doc
      // state did not transfer.
      // The stored-INPUT artifacts (q137 state, q134/q143/q41 family
      // tables) build BEFORE the lanes fork: input tables a production
      // run reads, not result memos (which warmup must never fill; the
      // measured queries still run all their own joins/gates against
      // these), and three legs warm the exact artifact-reading plans,
      // so the build must not race across lanes.
      SparkEntry.prewarmStoredInputs(spark, sfDir)
      System.err.println(s"[bench] stored-input prewarm done at ${fmt2(elapsedS)}s")
      // The curate family (q134/q143) has NO result memo — each
      // evaluation re-runs its joins — so running the real q134 here
      // warms the curate-tail classes (clusters, decon, manifest)
      // without skipping any measured work; without it, whichever
      // family member measures first pays ~6s of cold codegen
      // (t1 run: q143-first 9.2s vs q134-later 3.1s).
      val leg_curate = leg("curate", 90) {
        // q143 = q134 + the model gate, so warming the superset plan
        // covers both members (q134-only warming left q143's scoreExpr
        // class cold: 6.2s first vs 3.3s warm in the t1 run)
        SparkEntry.queries("q143_curate_model")(spark, sfDir)
          .write.format("noop").mode("overwrite").save()
      }
      val leg_cascade = leg("cascade", 90) {
        // warm the cascade's ~800-node plan by running the REAL
        // q137 shape (parquet-state joins + local-relation planted
        // batch): the previous computed-state approximation stopped
        // matching the measured plan's generated classes when the
        // state moved to a stored table, and the cold tax returned
        // (r13 run1: 12.9s vs 4.7s warm). No result memo exists for
        // q137 — the measured run still does all its own work.
        SparkEntry.queries("q137_curate_increment")(spark, sfDir)
          .write.format("noop").mode("overwrite").save()
      }
      // the FULL verified near-dup path (q22/q23/q63/q100/q121/q126):
      // shingle -> md5 -> minhash -> LSH self-join -> jaccard verify ->
      // cluster probe; without it the family's first execution pays
      // 5-8x steady (q63 19.7s cold vs ~5s warm). Full-size for the
      // same AQE-shape reason as the cascade.
      val leg_neardup = leg("neardup", 90) {
        // the measured family reads the stored shingle/signature
        // tables (nearDupArtifactsFromSigs) — warm exactly that plan;
        // the pair/cluster RESULT memo stays unfilled, so the measured
        // payer still runs the whole pipeline, just warm
        val art = SparkEntry.curationFamilyArtifacts(spark, sfDir)
        val a = operators.Dedup.nearDupArtifactsFromSigs(
          art.shingles, art.sigs, "doc_id", bands = 3, threshold = 0.5)
        operators.Dedup.dupClusters(
          docsWarm.select(col("doc_id")), a.pairs.select("d1", "d2"), "doc_id").count()
        a.unpersist()
      }
      // the ENSEMBLE family (q152/q155): SNM (sort + rank-band +
      // threshold-levenshtein) and SimHash-pair blockers share
      // generated classes with NOTHING above — unwarmed, the payer
      // query eats their full-size cold tax (q155 25.3s vs 11.8s
      // warm). The memoized artifact is NOT filled here, so the
      // measured payer still runs the whole pipeline — just warm.
      val leg_ensemble = leg("ensemble", 90) {
        // same discipline: the measured q152 reads the stored
        // per-document tables, so warm the FromSigs plan; the result
        // is discarded and the ensemble pair memo stays unfilled
        val art = SparkEntry.curationFamilyArtifacts(spark, sfDir)
        val ensWarm = operators.Dedup.ensembleNearDupFromSigsCached(
          art.annotated, art.shingles, art.sigs, art.simhash64,
          "doc_id", "text")
        ensWarm.df.count()
        ensWarm.unpersist()
      }
      // REAL-TABLE TPC-H shapes: the synthetic range warmup compiles
      // operator classes but NOT the full-size parquet-scan +
      // decimal-agg + join plans — the first measured TPC-H query
      // paid ~10s residual (r9: q01 13.5s vs 1.2s steady).
      val leg_tpch = leg("tpch", 120) {
        import org.apache.spark.sql.functions.{avg => favg, sum => fsum}
        val li = Tables.load(spark, sfDir, "lineitem")
        li.groupBy(col("l_returnflag"), col("l_linestatus"))
          .agg(fsum(col("l_quantity").cast("decimal(18,2)")),
            favg(col("l_extendedprice")), count(lit(1))).count()
        li.join(Tables.load(spark, sfDir, "orders"),
            li("l_orderkey") === col("o_orderkey"))
          .groupBy(col("o_orderpriority")).agg(count(lit(1))).count()
      }
      // codec JIT (javax.imageio / javax.sound / majority reassembly):
      // the mapPartitions codec paths JIT once for ANY size — a
      // handful of fixture rows warms them
      val leg_codecs = leg("codecs", 120) {
        val codecIds = docsWarm.select(col("doc_id")).limit(10)
        multimodal.Multimodal.imageGridHash(
          multimodal.Multimodal.gridFixtureImages(codecIds, "doc_id", 120L),
          "doc_id").count()
        multimodal.Multimodal.audioEnergyHash(
          multimodal.Multimodal.audioGridFixtures(codecIds, "doc_id", 120L),
          "doc_id").count()
        multimodal.Multimodal.majorityHash(
          multimodal.Multimodal.imageGridHash(
            multimodal.Multimodal.videoNearDupFixtures(
                codecIds, "doc_id", 120L, nFrames = 2, everyMs = 250L)
              .select((col("doc_id") * 500L + col("frame_ms")).as("fk"),
                col("bytes")),
            "fk").select(expr("fk div 500").as("doc_id"), col("simhash")),
          "doc_id").count()
      }
      // PQ training/search: the fused expressions hold codebooks as
      // reference objects, so a SMALL corpus with the same m/ks/dims
      // compiles the exact classes full-size training runs — the
      // cheap warmup that DOES transfer. Covers q144/q149/q165/q169's
      // ~12s first-training tax; the full-width k-means + cell-probed
      // search covers the q76/q113/q149/q170 IVF layer.
      val leg_pq = leg("pq", 120) {
        val embWarm = Tables.load(spark, sfDir, "embeddings").limit(60)
        val warmBooks = operators.Similarity.pqCodebooks(
          embWarm, "vec_id", "embedding", dims = 64, m = 4, ks = 16, iters = 1)
        operators.Similarity.pqTopKWithBooks(
          embWarm.limit(5), embWarm, "vec_id", "embedding",
          dims = 64, warmBooks, k = 2, refine = 2).count()
        val warmCents = operators.Similarity.kmeansCentroids(
          embWarm, "vec_id", "embedding", k = 8, iters = 1)
        operators.Similarity.ivfPqTopKWithIndex(
          embWarm.limit(5), embWarm, "vec_id", "embedding", dims = 64,
          warmCents, warmBooks, nProbe = 2, k = 2, refine = 2).count()
      }
      // classifier-training codegen (q162/q167/q171/q174/q175's GD
      // loop): one epoch at full corpus size under a throwaway seed —
      // warms the featurize/epoch generated classes WITHOUT touching
      // the trained-model result memos (different seed, result
      // discarded), so the measured payer still pays its real
      // training (r13 run1: q175 11.1s cold vs ~4.5s warm)
      val leg_train = leg("train", 120) {
        operators.QualityClassifier.trainHashed(
          docsWarm, "doc_id", "text",
          label = array_contains(
            operators.TextAnalysis.tokens(col("text")), "spark"),
          buckets = 64, seed = "warm:", epochs = 1, lrNum = 20L, lrDen = 1L)
        ()
      }
      // three lanes: the ensemble (the single longest leg, ~15-23s)
      // rides alone so the heavy lane's wall is max(cascade+neardup,
      // ensemble, cheap) ≈ ~25s instead of their 37s sum; 3 lanes ≈
      // 3x oversubscription worst case, measured safe (the thrash
      // case was 7 concurrent full-size legs)
      val pool = java.util.concurrent.Executors.newFixedThreadPool(3)
      pool.submit(new Runnable { def run(): Unit =
        runLane(Seq(leg_cascade, leg_neardup, leg_curate)) })
      pool.submit(new Runnable { def run(): Unit =
        runLane(Seq(leg_ensemble)) })
      pool.submit(new Runnable { def run(): Unit =
        // cheap lane order = how early measurement reaches the family:
        // TPC-H feeds the first four priority queries, codecs feeds
        // q136 (priority block), PQ's queries order mid-run
        runLane(Seq(leg_base, leg_tpch, leg_codecs, leg_pq, leg_train)) })
      pool.shutdown()
      // bounded join: warmth must never outbid coverage. On a healthy
      // day the lanes join in ~35-40s; if 120s pass the VM is degraded
      // enough that the remaining warmth is worth less than the
      // measurement budget it's eating — cancel the in-flight leg jobs
      // (lane bodies swallow the cancellation and their own gates shed
      // later legs) and move on. The global scrub below must not run
      // while a lane is still mid-flight (localCheckpoint blocks can't
      // recompute), hence the second await after the cancels.
      if (!pool.awaitTermination(120, java.util.concurrent.TimeUnit.SECONDS)) {
        System.err.println(
          s"[bench] warmup join timed out at ${fmt2(elapsedS)}s — cancelling in-flight legs")
        // cancel+await UNTIL the pool actually drains: cancelJobGroup
        // only kills jobs RUNNING at that moment (an AQE leg launches a
        // job per re-planned stage), so one cancel volley can let the
        // next stage's job through and a lane thread keeps running
        // warmup work into the measurement window — exactly the taint
        // mode of the degraded days this path targets (r12). The global
        // scrub and measurement start are gated on pool.isTerminated;
        // if the lane never drains inside the bounded wait, the
        // artifact is stamped "tainted" so the overlap can never pass
        // silently again.
        legNames.foreach(n => sc.cancelJobGroup(s"warmup-$n"))
        pool.shutdownNow()
        var waitedS = 0
        while (!pool.isTerminated && waitedS < 60) {
          legNames.foreach(n => sc.cancelJobGroup(s"warmup-$n"))
          pool.awaitTermination(10, java.util.concurrent.TimeUnit.SECONDS)
          waitedS += 10
        }
        if (!pool.isTerminated) {
          warmupTainted = true
          System.err.println(
            "[bench] WARNING: a warmup lane never drained — measurement may " +
              "overlap warmup jobs; artifact stamped tainted")
        }
      }
      System.err.println(
        s"[bench] warmup legs joined in ${fmt2((System.nanoTime() - legT0) / 1e9)}s (${fmt2(elapsedS)}s elapsed)")
      spark.catalog.clearCache()
      spark.sparkContext.getPersistentRDDs.values.foreach(_.unpersist(false))
    }

    // VM-health calibration: a fixed in-memory agg+shuffle, identical
    // every run and independent of the SF dir. Per-query times divided
    // by this separate a code regression from a degraded VM (the r05
    // artifact's 2.9x "slowdown" on byte-identical code) — ~0.5-2 s on
    // a healthy day here, 10x+ when the VM is pathological.
    //
    // One probe at startup cannot attribute MID-run degradation (the
    // r06 artifact: vm_health 1.04 yet a contiguous 4-10x inflation
    // band later in the run), so the SAME probe re-runs every
    // `ProbeEvery` measured queries; `vmSeries` records (queries
    // measured so far, probe seconds) and the dump emits a per-query
    // normalization against the NEAREST probe. On a pathological-VM
    // day the probes are skipped entirely — they'd be 10x+ slow
    // exactly when budget is scarcest — and vm_health carries the -1
    // sentinel (enablement logic below).
    val ProbeEvery = 10
    val vmSeries = scala.collection.mutable.ArrayBuffer[(Int, Double)]()
    def runProbeJobN(rows: Long): Double = {
      val t0 = System.nanoTime()
      spark.range(rows)
        .select((org.apache.spark.sql.functions.col("id") % 97).as("k"),
          org.apache.spark.sql.functions.col("id").as("v"))
        .groupBy("k")
        .agg(org.apache.spark.sql.functions.sum("v"))
        .write.format("noop").mode("overwrite").save()
      (System.nanoTime() - t0) / 1e9
    }
    def runProbeJob(): Double = runProbeJobN(20000000L)
    // Probe enablement is decided by the probe's OWN first (untimed,
    // JIT-warming) execution, not by total warmup elapsed: the warmup
    // now carries three full-size family legs whose legitimate cost
    // can push elapsed past any fixed cutoff on a mildly degraded day,
    // and losing the whole normalization series to that (r10 run 3:
    // vh=-1 on a run that measured everything) costs far more than the
    // probes do. A pathological VM still disables probing — there the
    // warm-in probe itself runs 10x+ slow (healthy 0.2-0.5s), which is
    // the exact signal the old elapsed proxy approximated. The elapsed
    // check is kept only as a TRULY-pathological short-circuit (init
    // alone has taken minutes here) so the gate doesn't spend minutes
    // running its own 20M-row probe to learn what the clock already
    // says; 300s >> any legitimate warmup (healthy ~45s, 2x day ~100s).
    // (The untimed first run also absorbs the probe's codegen/JIT:
    // without it the first recorded probes ran ~2x slow — 0.48 -> 0.25s
    // over a healthy run's first probes — and the normalization
    // mistook probe warm-up for VM degradation.)
    // The gate itself must stay cheap on a bad day: the old gate ran
    // the full 20M-row probe with no bound, so a badly degraded VM
    // inside the 300s window could burn minutes learning probes should
    // be off. A 2M-row mini-probe first — NOT the same generated class
    // as the 20M probe (Range codegen embeds its bounds as literals),
    // so it gates on VM weather only, never stands in for the full
    // probe's JIT warm-in: ~0.03s healthy, and
    // even a 20x-degraded VM pays well under its 2.0s threshold's
    // order of magnitude before the full warm-in probe is attempted.
    val probesEnabled = elapsedS <= 300 &&
      runProbeJobN(2000000L) <= 2.0 && runProbeJob() <= 5.0
    def vmProbe(afterN: Int): Unit = if (probesEnabled)
      vmSeries += afterN -> runProbeJob()
    vmProbe(0)
    val vmHealthS = vmSeries.headOption.map(_._2).getOrElse(-1.0)
    System.err.println(
      s"[bench] measurement starts at ${fmt2(elapsedS)}s (vh=${fmt2(vmHealthS)})")
    // "q63_dup_clusters" → "63": unique across all queries, keeps the
    // final JSON line inside the parse tail at 170+ queries (the "q"
    // prefix alone was ~170 chars of the budget; full names live in
    // bench_full.json).
    def shortName(name: String): String =
      name.takeWhile(_ != '_').stripPrefix("q")

    val failed = scala.collection.mutable.ArrayBuffer[String]()
    val skipped = scala.collection.mutable.ArrayBuffer[String]()
    // watchdog cap-kills with wall budget remaining: (name, seconds it
    // ran before the cancel landed) — its own artifact category
    val capped = scala.collection.mutable.ArrayBuffer[(String, Double)]()
    val results = scala.collection.mutable.ArrayBuffer[(String, Double)]()

    // Prior-run timings carried into this artifact (resume mode); their
    // queries are not re-run. Sorted into `results` at dump time so the
    // merged artifact is indistinguishable in shape from a single run.
    // Only names still present in SparkEntry.queries are carried — a
    // renamed or deleted query's stale timing would otherwise be merged
    // into `value` indefinitely. The prior run's vm_health rides along
    // as `carried_vm_health`: carried timings were measured under THAT
    // VM state, not this run's, so the two must stay distinguishable.
    val carried = scala.collection.mutable.LinkedHashMap[String, Double]()
    var carriedVmHealth: Option[Double] = None
    sys.env.get("SPARK_GRAFT_BENCH_RESUME").foreach { rp =>
      val path = if (rp == "1" || rp.equalsIgnoreCase("auto")) outPath else rp
      readArtifact(path) match {
        case None =>
          System.err.println(s"[bench] resume: unreadable $path")
        case Some((sf, _, _)) if sf != sfDir =>
          System.err.println(
            s"[bench] resume: ignoring $path (sf mismatch, carried nothing)")
        case Some((_, qs, vh)) =>
          val known = SparkEntry.queries.keySet
          val (keep, dropped) = qs.partition { case (k, _) => known.contains(k) }
          keep.toSeq.sortBy(_._1).foreach { case (k, v) => carried += k -> v }
          if (dropped.nonEmpty) System.err.println(
            s"[bench] resume: dropped ${dropped.size} stale names not in SparkEntry.queries: ${dropped.keys.toSeq.sorted.mkString(",")}")
          carriedVmHealth = vh
      }
      if (carried.nonEmpty)
        System.err.println(s"[bench] resume: carrying ${carried.size} measured queries from $path")
    }

    def merged: Seq[(String, Double)] =
      (carried.toSeq ++ results.toSeq).sortBy(_._1)

    // Per-query normalization against the NEAREST probe, referenced to
    // the run's healthy floor (see Bench.probeFactor scaladoc for the
    // r12 majority-degraded-median lesson). Carried queries are NOT
    // normalized (measured under a different VM state, recorded via
    // carried_vm_health); with fewer than two probes every factor is 1.
    def probeFactor(i: Int): Double = Bench.probeFactor(vmSeries.toSeq, i)

    def writeFullFile(): Unit = try {
      val m = merged
      val qs = m.map { case (k, v) => "\"" + k + "\":" + fmt3(v) }
        .mkString("{", ",", "}")
      val f = failed.map("\"" + _ + "\"").mkString("[", ",", "]")
      val s = skipped.map("\"" + _ + "\"").mkString("[", ",", "]")
      val cap = capped
        .map { case (n, t) => s"""{"name":"$n","ran_s":${fmt3(t)}}""" }
        .mkString("[", ",", "]")
      val c = carried.keys.map("\"" + _ + "\"").mkString("[", ",", "]")
      val series = vmSeries
        .map { case (n, t) => s"""{"after_n":$n,"t":${fmt3(t)}}""" }
        .mkString("[", ",", "]")
      val normByName = results.zipWithIndex
        .map { case ((k, v), i) => k -> v * probeFactor(i) }.toMap
      val qsNorm = m
        .map { case (k, v) => "\"" + k + "\":" + fmt3(normByName.getOrElse(k, v)) }
        .mkString("{", ",", "}")
      val totalNorm = m.map { case (k, v) => normByName.getOrElse(k, v) }.sum
      val cvh = carriedVmHealth.map(v => s""","carried_vm_health":${fmt3(v)}""").getOrElse("")
      val dwq = degradedWindowQueries(vmSeries.toSeq, results.map(_._1).toSeq)
        .map("\"" + _ + "\"").mkString("[", ",", "]")
      val taint = if (warmupTainted) ""","tainted":true""" else ""
      // sustained-degradation flag: normalized values vs the committed
      // warm references (carried values judged as carried — they were
      // measured in a prior, usually certified, run)
      val sdqFull = sustainedDegraded(
        m.map { case (k, v) => k -> normByName.getOrElse(k, v) }, warmRefs)
        .map(n => s"""{"name":"$n","norm_s":${fmt3(normByName.getOrElse(n, carried.getOrElse(n, 0.0)))},"ref_s":${fmt3(warmRefs(n))}}""")
        .mkString("[", ",", "]")
      java.nio.file.Files.writeString(java.nio.file.Paths.get(outPath),
        s"""{"metric":"total","value":${fmt3(m.map(_._2).sum)},"unit":"sec","queries":$qs,"failed":$f,"skipped":$s,"capped":$cap,"carried":$c$cvh,"vm_health":${fmt3(vmHealthS)},"vm_health_series":$series,"queries_normalized":$qsNorm,"value_normalized":${fmt3(totalNorm)},"degraded_window_queries":$dwq,"sustained_degraded_queries":$sdqFull$taint,"elapsed":${fmt3(elapsedS)},"sf":"$sfDir"}""")
    } catch { case _: Throwable => () } // bench must not die on a dump

    // Prior-run per-query seconds, read from the LAST committed
    // artifact at outPath BEFORE this run overwrites it — used ONLY to
    // order this run, never merged into results (that's resume's job,
    // with its sf guard). Ordering tolerates an sf mismatch: relative
    // query cost is what matters.
    val priorTimes: Map[String, Double] =
      readArtifact(outPath).map(_._2).getOrElse(Map.empty)

    // AUTO-CARRY source (round 17): the same committed artifact,
    // admitted only if it is a complete certified-clean close at this
    // SF. A wall-budget truncation then self-heals — skipped queries
    // with a clean prior measurement are carried (with provenance)
    // instead of left unmeasured, so a mediocre window can no longer
    // produce a 126-of-198 artifact of record (the r16 failure). New
    // queries with no clean history stay genuinely skipped. Disable
    // with SPARK_GRAFT_BENCH_CARRY=0.
    val (carrySource, carrySourceVh) =
      if (sys.env.getOrElse("SPARK_GRAFT_BENCH_CARRY", "1") == "0")
        (Map.empty[String, Double], None)
      else readCleanCarrySource(outPath, sfDir)
    if (carrySource.nonEmpty) System.err.println(
      s"[bench] auto-carry source armed: ${carrySource.size} clean prior timings")

    // On a pathological-VM day the wall budget truncates the run — in
    // name order that times q01..q1x and skips whole operator families.
    // Time one representative per family FIRST so even a short run
    // yields a cross-family regression table; the rest follow in name
    // order. Names, not prefixes: a rename silently falls out of the
    // priority block and back into the sorted tail (never lost).
    val priority = Seq(
      "q01_pricing_summary", "q03_join_agg", "q06_diff_insert",
      "q09_dup_detect", "q20_dedup_exact", "q22_minhash_lsh",
      "q63_dup_clusters", "q26_embed_topk", "q32_ivf_topk",
      "q113_ivf_kmeans", "q116_int8_rescore", "q44_heavy_hitters",
      "q51_cms_bound", "q57_gopher_quality", "q67_approx_quantile",
      "q73_token_budget", "q83_bm25", "q30_stream_hourly",
      "q107_token_budget", "q111_template_detect",
      "q114_segment_dedup", "q115_domain_mix", "q117_repeated_spans",
      "q118_editdist_neardup", "q120_threshold_sweep",
      "q122_interval_overlap", "q126_leakage_split",
      "q136_image_decode", "q137_curate_increment",
      // sparse-similarity family: q139 is the representative AND the
      // family warmer; q140 — the suite's single heaviest query —
      // rides immediately after it so its measurement is family-warm
      // instead of absorbing the whole family's cold tax at
      // tail-start (the third-round q140 ask: 9.4 s in-suite vs
      // 7.45 s proven warm was position, not plan)
      "q139_sparse_allpairs", "q140_weighted_jaccard",
      // memo-family attribution pins (round 17): the ensemble
      // verified-pair table, the full-corpus classifier train and the
      // held-out-fold train are JVM RESULT memos, deliberately never
      // prewarmed — someone must be measured paying each build. But
      // ordering by prior-artifact timings shifted WHO between rounds
      // (r16 close: q152 paid 2.9 s, q155 rode 0.2 s; next run: q155
      // paid 3.1 s, q152 rode 0.1 s), so every member's warm level is
      // bimodal and the sustained-degradation references meaningless
      // for the whole family. Pin payer -> riders: the designated
      // payer (the query whose NAME is the build: the pair table, the
      // train) always measures paying, riders always measure
      // family-warm. Warm-ref history for all eight is invalidated at
      // this commit (tools/warm_ref.py PLAN_CHANGED_AT).
      "q152_ensemble_neardup", "q155_ensemble_recall",
      "q162_train_quality", "q167_train_gate",
      "q174_eval_report", "q175_gate_select", "q176_select_gate",
      "q178_calibration")
    val all = SparkEntry.queries.toSeq.sortBy(_._1)
      .filterNot(q => carried.contains(q._1))
    val byName = all.toMap
    val ordered = orderQueries(all.map(_._1), priority, priorTimes)
      .map(n => n -> byName(n))
    val timer = new java.util.Timer("bench-watchdog", true)
    ordered.foreach { case (name, fn) =>
      val remaining = budgetS - elapsedS
      if (remaining < 10) { skipped += name }
      else {
        // Watchdog: a single wedged query must not eat the whole budget
        // and suppress the final line. cancelJobGroup only kills jobs
        // RUNNING at that moment — an AQE query launches a job per
        // re-planned stage, and a one-shot cancel lets the next stage's
        // job through (observed: a query surviving 107 s past a 90 s
        // cap). Repeat the cancel until the query thread returns.
        val capMs = (math.min(queryCapS, remaining) * 1000).toLong
        // when the WALL budget (not the query's own cap) bounds the
        // run, a watchdog kill means "ran out of round time", not "this
        // query is broken" — record it as skipped so the next round's
        // failed-list triage only chases real regressions
        val budgetLimited = remaining < queryCapS
        sc.setJobGroup(name, name, interruptOnCancel = true)
        val watchdogFired = new java.util.concurrent.atomic.AtomicBoolean(false)
        val task = new java.util.TimerTask {
          def run(): Unit = { watchdogFired.set(true); sc.cancelJobGroup(name) }
        }
        timer.scheduleAtFixedRate(task, capMs, 2000L)
        val t0 = System.nanoTime()
        try {
          fn(spark, sfDir).write.format("noop").mode("overwrite").save()
          val secs = (System.nanoTime() - t0) / 1e9
          results += name -> secs
          System.err.println(
            s"[bench] $name ${fmt3(secs)}s (${results.size + failed.size}/${ordered.size}, ${fmt2(elapsedS)}s elapsed)")
        } catch {
          case e: Throwable =>
            val ranS = (System.nanoTime() - t0) / 1e9
            classifyFailure(e, budgetLimited, watchdogFired.get()) match {
              case "skipped" =>
                skipped += name
                System.err.println(s"[bench] $name SKIPPED (wall budget) after ${fmt2(ranS)}s")
              case "capped" =>
                capped += name -> ranS
                System.err.println(s"[bench] $name CAPPED (query cap) after ${fmt2(ranS)}s")
              case _ =>
                failed += name
                System.err.println(s"[bench] $name FAILED after ${fmt2(ranS)}s: ${e.getMessage}")
            }
        } finally {
          task.cancel()
          sc.clearJobGroup()
        }
        // queries that persist() intermediates (the LSH family) would
        // otherwise pin blocks across the whole run and squeeze later
        // queries' execution memory. localCheckpoint blocks (dup-cluster
        // edges) are RDD-level and invisible to clearCache — release
        // those explicitly too.
        spark.catalog.clearCache()
        sc.getPersistentRDDs.values.foreach(_.unpersist(false))
        // interleaved health probe: same fixed job as the startup one,
        // every ProbeEvery measured queries, so a mid-run degradation
        // window lands BETWEEN two probes and the normalization can
        // attribute it. Guarded by remaining budget — a probe must
        // never displace a measurable query.
        if (results.size % ProbeEvery == 0 && results.nonEmpty &&
            budgetS - elapsedS > 30) vmProbe(results.size)
        writeFullFile()
      }
    }
    timer.cancel()
    // auto-carry migration: wall-budget skips with a clean prior
    // timing become carried entries (same artifact semantics as
    // resume — listed under "carried", judged as carried by the sdq
    // flag, vm_health of the source recorded)
    if (skipped.nonEmpty && carrySource.nonEmpty) {
      val known = SparkEntry.queries.keySet
      val (carryNow, stillSkipped) =
        autoCarrySplit(skipped.toSeq.filter(known.contains), carrySource)
      if (carryNow.nonEmpty) {
        skipped.clear()
        skipped ++= stillSkipped
        carryNow.sortBy(_._1).foreach { case (k, v) => carried += k -> v }
        if (carriedVmHealth.isEmpty) carriedVmHealth = carrySourceVh
        System.err.println(
          s"[bench] auto-carry: ${carryNow.size} budget-skipped queries " +
            s"carried from the clean prior close; ${stillSkipped.size} remain skipped")
      }
    }
    // closing probe: bounds the last window so end-of-run degradation
    // is attributable too
    if (probesEnabled && vmSeries.lastOption.exists(_._1 < results.size))
      vmProbe(results.size)
    writeFullFile()

    // Compact final line. The harness parses the JSON from only the
    // LAST ~2000 chars of stdout, and sbt's trailing "[success] Total
    // time" line consumes ~75 of those — so the line must stay under
    // ~1900 chars. At 167 queries the old 2-decimal format measured
    // 2063 chars and the r9 driver artifact recorded parsed:null.
    // Diet: 1-decimal per-query values (full 3-decimal precision stays
    // in bench_full.json), taxonomy lists only when nonempty, numeric
    // sf, vhx only in the full file. 167 queries ≈ 1830 chars.
    def fmt1(v: Double): String =
      String.format(java.util.Locale.ROOT, "%.1f", Double.box(v))
    // stdout per-query values: 1 decimal below 10s (the suite's bulk,
    // where a tenth matters), integer seconds at 10s+ (0.5% worst-case
    // rounding on numbers that large is noise; the saved char per
    // heavy query keeps a degraded all-slow run inside the tail)
    def fmtQ(v: Double): String =
      if (v >= 9.95) String.format(java.util.Locale.ROOT, "%.0f", Double.box(v))
      else fmt1(v)
    val finalResults = merged
    // Round-15 diet: the stdout map carries the TOP 170 queries by
    // cost; the remainder (the trivial sub-tail — in a healthy run
    // everything it holds is <~0.5 s) aggregates into "rest" with its
    // count in "nrest", so the cap is self-describing, never silent.
    // Rationale: at 195 queries the all-entries format hit the
    // harness's ~2000-char stdout parse tail (measured: line budget =
    // 2000 - 73 sbt suffix chars; worst-case all-entries line = 1920).
    // Full 3-decimal per-query values for EVERY query stay in
    // bench_full.json, which is committed alongside.
    // secondary name key: tied timings must land in shown vs rest
    // deterministically, or the stdout map churns across identical runs
    val (shown, hidden) = finalResults.toSeq
      .sortBy { case (k, v) => (-v, k) }.splitAt(170)
    val qs = shown.sortBy(_._1)
      .map { case (k, v) => "\"" + shortName(k) + "\":" + fmtQ(v) }
      .mkString("{", ",", "}")
    val restField =
      if (hidden.isEmpty) ""
      else s""","rest":${fmt1(hidden.map(_._2).sum)},"nrest":${hidden.size}"""
    val failedJson = failed.map("\"" + shortName(_) + "\"").mkString("[", ",", "]")
    val skippedJson = skipped.map("\"" + shortName(_) + "\"").mkString("[", ",", "]")
    val cappedJson = capped.map(c => "\"" + shortName(c._1) + "\"").mkString("[", ",", "]")
    val total = finalResults.map(_._2).sum
    // vh = first probe; worst probe (vhx) and the full series live in
    // bench_full.json; vn = nearest-probe-normalized total
    val normTotal = carried.values.sum +
      results.zipWithIndex.map { case ((_, v), i) => v * probeFactor(i) }.sum
    val sfNum = "sf([0-9.]+)/?$".r.findFirstMatchIn(sfDir)
      .map(_.group(1).stripSuffix(".")).getOrElse("\"" + sfDir + "\"")
    val taxonomy =
      (if (failed.nonEmpty) s""","failed":$failedJson""" else "") +
      (if (skipped.nonEmpty) s""","skipped":$skippedJson""" else "") +
      (if (capped.nonEmpty) s""","capped":$cappedJson""" else "") +
      // carried-count provenance on the stdout line (names + source
      // vm_health live in bench_full.json): a self-healed truncation
      // must be distinguishable from a fully-measured run
      (if (carried.nonEmpty) s""","ncar":${carried.size}""" else "")
    // sustained-degradation flag, ALWAYS present on the stdout line
    // (the certification criterion is "present and empty", so its
    // absence must be distinguishable from a clean run); normalized
    // values vs the committed warm references
    val normByNameFinal = results.zipWithIndex
      .map { case ((k, v), i) => k -> v * probeFactor(i) }.toMap
    val sdqNames = sustainedDegraded(
      finalResults.map { case (k, v) => k -> normByNameFinal.getOrElse(k, v) },
      warmRefs)
    val sdqFragment = sdqInline(sdqNames.map(shortName))
    // round-11 diet: vh/vn moved OFF the stdout line (to stderr here,
    // full precision in bench_full.json) — at 171 queries the line was
    // back inside ~50 chars of the 1900-char parse-tail budget
    System.err.println(
      s"[bench] vh=${fmt2(vmHealthS)} vn=${fmt1(normTotal)} elapsed=${fmt2(elapsedS)}s")
    val line =
      s"""{"metric":"total","value":${fmt2(total)},"unit":"sec","queries":$qs$restField$taxonomy,$sdqFragment,"sf":$sfNum}"""
    if (line.length > 1900) System.err.println(
      s"[bench] WARNING: final JSON line ${line.length} chars — may overflow the harness parse tail")
    // Quiesce BEFORE printing: spark.stop() and shutdown hooks log to
    // stderr, and anything after the JSON line pushes it out of the
    // parse tail. Force logging off, stop Spark, then print last.
    org.apache.logging.log4j.core.config.Configurator.setRootLevel(
      org.apache.logging.log4j.Level.OFF)
    org.apache.logging.log4j.core.config.Configurator.setLevel(
      "org.apache.spark", org.apache.logging.log4j.Level.OFF)
    spark.stop()
    println(line)
    System.out.flush()
  }
}
