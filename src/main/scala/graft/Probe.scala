package graft

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._
import graft.queries.SimSearch

/** Dev-only component timer for the semdedup/IVF assign family:
  * `runMain graft.Probe <probe[,probe...]> <sfDir>`. Each probe isolates
  * one stage of q_dedup_semdedup so a full-query wall number can be
  * attributed. RESOLVED r10: the r9 sf100 inversion (two-level 482 s vs
  * flat 255 s) was BUCKET SKEW, not assign cost — assign2l measured
  * 26.6 s at 2M vectors, but skew2l showed the prefix-stand-in two-level
  * assign filling only 2000 of 31250 buckets (Σsize² 8.6e9 vs uniform
  * 1.3e8), inflating the in-bucket pair join ~66×. The trained assign
  * (skewtrained/pairstrained) restores near-uniform occupancy and is what
  * q_dedup_semdedup now ships. Results print as PROBE=<name> SEC=<s> plus
  * probe-specific stats. Not part of the driver surface; no oracle.
  */
object Probe {
  private def session(): SparkSession = {
    val cpus = sys.env.getOrElse("SPARK_GRAFT_CPUS", "32")
    val spark = SparkSession.builder()
      .master(s"local[$cpus]")
      .config("spark.sql.shuffle.partitions", cpus)
      .config("spark.sql.session.timeZone", "UTC")
      // object-agg sort fallback stays at Spark's spill-safe default;
      // bounded-buffer udafs get hash mode per-operator via the
      // BoundedAggFallback query-stage prep rule (GraftExtensions)
      .config("spark.ui.enabled", "false")
      .config("spark.sql.extensions", "graft.GraftExtensions")
      .config("spark.sql.legacy.parquet.nanosAsLong", "true")
      .getOrCreate()
    spark.sparkContext.setLogLevel("ERROR")
    spark
  }

  def main(args: Array[String]): Unit = {
    val names = args(0).split(',').map(_.trim).filter(_.nonEmpty)
    val d = args.lift(1).getOrElse("/root/testdata/sf0.1")
    val s = session()
    val e = SimSearch.embeds(s, d)
    val n = e.count()
    val C = math.max(SimSearch.NCentroids, (n / 64).toInt)
    val n1 = math.max(4, math.ceil(math.sqrt(C.toDouble)).toInt)
    println(s"PROBE=setup N=$n C=$C N1=$n1")

    def noop(df: DataFrame): Unit =
      df.write.mode("overwrite").format("noop").save()

    def timed(name: String)(body: => Unit): Unit = {
      val t0 = System.nanoTime()
      body
      println(s"PROBE=$name SEC=${(System.nanoTime() - t0) / 1e9}")
      s.catalog.clearCache()
    }

    // uniform stand-in assignment: occupancy ≈ 64 with hash-uniform
    // buckets — times the pair stage with ZERO assign cost and NO skew
    def uniformAssign: DataFrame =
      e.select(col("vec_id"), pmod(xxhash64(col("vec_id")), lit(C.toLong)).as("bucket"))

    // the semdedup tail (mvn join + in-bucket pair join + dedup agg)
    // over an arbitrary (vec_id, bucket) assign — isolates pair cost
    // (∝ Σ bucket-size²) from assign cost
    def semdedupTail(sess: SparkSession, dir: String, asg: DataFrame): Unit = {
      val mvn = asg.join(SimSearch.normEmbeds(sess, dir), Seq("vec_id")).cache()
      val dropped = mvn.as("a").join(mvn.as("b"),
          col("a.bucket") === col("b.bucket") &&
            col("a.vec_id") < col("b.vec_id"))
        .where(round(graft.llm.Vectors.dotFast(col("a.vn"), col("b.vn")), 6)
          >= SimSearch.NearDupThreshold)
        .select(col("b.vec_id").as("vec_id")).distinct()
      noop(mvn.join(dropped.withColumn("dup", lit(1L)), Seq("vec_id"), "left")
        .groupBy(col("bucket"))
        .agg(count(lit(1)).as("n_members"),
          count(when(col("dup").isNull, 1)).as("n_kept")))
    }

    def skewStats(asg: DataFrame, name: String): Unit = {
      val row = asg.groupBy(col("bucket")).agg(count(lit(1)).as("c"))
        .agg(sum(col("c") * col("c")).as("sumsq"), max(col("c")).as("mx"),
          count(lit(1)).as("nbuckets")).head()
      println(s"STATS=$name SUMSQ=${row.getLong(0)} MAXBUCKET=${row.getLong(1)} NBUCKETS=${row.getLong(2)}")
    }

    names.foreach {
      case "assignflat" => timed("assignflat") {
        noop(SimSearch.bucketAssign(e, C).select(col("vec_id"), col("bucket")))
      }
      case "assign2l" => timed("assign2l") {
        noop(SimSearch.bucketAssignTwoLevel(e, C, n1))
      }
      case "skewflat" => timed("skewflat") {
        skewStats(SimSearch.bucketAssign(e, C)
          .where(col("vec_id") >= C).select(col("vec_id"), col("bucket")), "skewflat")
      }
      case "skew2l" => timed("skew2l") {
        skewStats(SimSearch.bucketAssignTwoLevel(e, C, n1)
          .where(col("vec_id") >= C), "skew2l")
      }
      case "skewuniform" => timed("skewuniform") {
        skewStats(uniformAssign, "skewuniform")
      }
      case "pairsuniform" => timed("pairsuniform") {
        semdedupTail(s, d, uniformAssign)
      }
      case "skewtrained" => timed("skewtrained") {
        skewStats(SimSearch.trainedAssign(e).where(col("bucket").isNotNull),
          "skewtrained")
      }
      case "pairstrained" => timed("pairstrained") {
        semdedupTail(s, d,
          SimSearch.trainedAssign(e).where(col("bucket").isNotNull)
            .select(col("vec_id"), col("bucket")))
      }
      case "pairsrefetch" => timed("pairsrefetch") {
        // A/B half of pairstrained: the tail with the vn REMOVED from the
        // self-join (ids-only pair join + two vector re-fetch joins) —
        // re-tests the r6/r10 carry-norms rule in the TRAINED shape. The
        // pair frame here is Σ occupancy·n rows of 2 longs; each re-fetch
        // joins it against the n-row vn table (past broadcast at 2M).
        val asg = SimSearch.trainedAssign(e).where(col("bucket").isNotNull)
          .select(col("vec_id"), col("bucket")).cache()
        val en = SimSearch.normEmbeds(s, d)
        val pairs = asg.as("a").join(asg.as("b"),
            col("a.bucket") === col("b.bucket") &&
              col("a.vec_id") < col("b.vec_id"))
          .select(col("a.vec_id").as("v1"), col("b.vec_id").as("v2"),
            col("a.bucket").as("bucket"))
        val dropped = pairs
          .join(en.select(col("vec_id").as("v1"), col("vn").as("x")), Seq("v1"))
          .join(en.select(col("vec_id").as("v2"), col("vn").as("y")), Seq("v2"))
          .where(round(graft.llm.Vectors.dotFast(col("x"), col("y")), 6)
            >= SimSearch.NearDupThreshold)
          .select(col("v2").as("vec_id")).distinct()
        noop(asg.join(dropped.withColumn("dup", lit(1L)), Seq("vec_id"), "left")
          .groupBy(col("bucket"))
          .agg(count(lit(1)).as("n_members"),
            count(when(col("dup").isNull, 1)).as("n_kept")))
      }
      case "nndsplit" =>
        // Stage attribution + three-shape A/B for the NN-Descent round at
        // scale: base graph (the full trained probe-2 pipeline), the
        // NAIVE form (id-pair distinct then two vector re-fetch joins —
        // superlinear: the second re-fetch SMJ sorts the pair frame
        // wide), the r12 carry-vn form (vectors ride four edge-sized SMJ
        // sort sides — the ~13 GB spill cliff), and the SHIPPED r13
        // narrow-hop + broadcast-fetch form via the registered lambda.
        // Cumulative cold stages (timed() clears caches).
        // FAIRNESS (caught by the r12 self-review): every stage must
        // build its base by RE-INVOKING the registered lambda inside its
        // own timed block — a stale `val base` loses the lambda's
        // internal cache registrations after the first stage's
        // clearCache and never re-registers them, so later stages would
        // recompute the assign subtree twice (a shape no real caller
        // runs) and the naive-vs-shipped A/B would be skewed.
        def freshBase = SparkEntry.queries("q_sim_knn_graph_trained2")(s, d)
          .select(col("vec_id"), col("nbr"))
        def cand(b0: org.apache.spark.sql.DataFrame) = {
          val b = b0.cache()
          val und = b.select(col("vec_id").as("v"), col("nbr").as("u"))
            .union(b.select(col("nbr").as("v"), col("vec_id").as("u")))
            .distinct()
          und.as("a").join(und.as("b"),
              col("a.u") === col("b.v") && col("a.v") =!= col("b.u"))
            .select(col("a.v").as("vec_id"), col("b.u").as("nbr"))
            .union(b)
            .distinct()
        }
        timed("nnd_base") { noop(freshBase) }
        timed("nnd_cand") { noop(cand(freshBase)) }
        timed("nnd_full_distinct") {
          // the naive distinct-then-refetch full form (pre-r12 shape)
          val en = SimSearch.normEmbeds(s, d)
          noop(cand(freshBase)
            .join(en.select(col("vec_id"), col("vn").as("va")), Seq("vec_id"))
            .join(en.select(col("vec_id").as("nbr"), col("vn").as("vb")),
              Seq("nbr"))
            .select(col("vec_id"), col("nbr"),
              round(graft.llm.Vectors.dotFast(col("va"), col("vb")), 6)
                .as("cos"))
            .groupBy(col("vec_id"))
            .agg(graft.functions.TopKPairAgg
              .topK(col("cos"), col("nbr"), 3).as("t"))
            .select(col("vec_id"), posexplode(col("t"))))
        }
        timed("nnd_full_carryvn") {
          // the r12 shipped shape, inlined for the A/B record: both
          // vectors ride the EDGE-sized joins into the hop join (four
          // vector-laden edge-sized SMJ sort sides — the spill cliff the
          // r13 broadcast-fetch form deletes)
          val base = SparkEntry.queries("q_sim_knn_graph_trained2")(s, d)
            .select(col("vec_id"), col("nbr"), col("cos")).cache()
          val und = base.select(col("vec_id").as("v"), col("nbr").as("u"))
            .union(base.select(col("nbr").as("v"), col("vec_id").as("u")))
            .distinct()
          val en = SimSearch.normEmbeds(s, d)
          val undV = und
            .join(en.select(col("vec_id").as("v"), col("vn").as("vnv")), Seq("v"))
          val undW = und.select(col("v").as("u"), col("u").as("w"))
            .join(en.select(col("vec_id").as("w"), col("vn").as("vnw")), Seq("w"))
          val hopScored = undV.join(undW, Seq("u"))
            .where(col("v") =!= col("w"))
            .select(col("v").as("vec_id"), col("w").as("nbr"),
              round(graft.llm.Vectors.dotFast(col("vnv"), col("vnw")), 6)
                .as("cos"))
          noop(hopScored.union(base)
            .groupBy(col("vec_id"))
            .agg(graft.functions.TopKPairDistinctAgg
              .topK(col("cos"), col("nbr"), 3).as("t"))
            .select(col("vec_id"), posexplode(col("t"))))
        }
        timed("nnd_full") {
          noop(SparkEntry.queries("q_sim_knn_graph_nnd")(s, d))
        }
        val nb = freshBase.count()
        val ncd = cand(freshBase).count()
        println(s"STATS=nndvol NBASE=$nb NCAND=$ncd BOUND=${n * 39}")
        s.catalog.clearCache()
      case "train" => timed("train") {
        noop(SimSearch.trainedCentroidFrame(e, n))
      }
      case "assigntrainedonly" =>
        // trained materialized + cached OUTSIDE the timing: isolates the
        // corpus assign against already-built centroids
        val tr = SimSearch.trainedCentroidFrame(e, n).cache()
        noop(tr)
        timed("assigntrainedonly") {
          noop(SimSearch.assignTwoLevelAgainst(e, tr)
            .select(col("vec_id"), col("bucket")))
        }
      case "lshcand" => timed("lshcand") {
        // candidate stage of q_sim_ann_lsh_scaled alone (band self-join +
        // distinct) — attributes the scaled-LSH wall between candidate
        // generation and the broadcast verify
        val (pairs, _, _, _) = SimSearch.scaledLshCandidates(s, d)
        noop(pairs)
      }
      case "lshskew" => timed("lshskew") {
        // WHERE the scaled-LSH candidate mass lives: per-(band,bucket)
        // pair mass Σ C(size,2) + max pocket, and the signature-family
        // structure (vectors identical in EVERY band — the only shape a
        // rep-collapse can delete losslessly)
        val (banded, n, bits, bands) = SimSearch.scaledLshBanded(
          SimSearch.embeds(s, d))
        val bk = banded.cache()
        val m = bk.groupBy(col("band"), col("bucket"))
          .agg(count(lit(1)).as("c"))
          .agg(sum(shiftright(col("c") * (col("c") - 1), 1)).as("pairmass"),
            max(col("c")).as("mx"), count(lit(1)).as("nbuckets")).head()
        println(s"STATS=lshskew N=$n BITS=$bits BANDS=$bands " +
          s"PAIRMASS=${m.getLong(0)} MAXBUCKET=${m.getLong(1)} " +
          s"NBUCKETS=${m.getLong(2)}")
        val fams = bk.groupBy(col("vec_id"))
          .agg(array_sort(collect_list(concat_ws(":", col("band"), col("bucket"))))
            .as("sigkey"))
          .groupBy(col("sigkey")).agg(count(lit(1)).as("f"))
          .agg(count(when(col("f") > 1, 1)).as("nfams"),
            coalesce(sum(when(col("f") > 1, col("f"))), lit(0L)).as("nvecs_in_fams"),
            coalesce(sum(shiftright(col("f") * (col("f") - 1), 1)), lit(0L))
              .as("intra_pairs"),
            max(col("f")).as("maxfam")).head()
        println(s"STATS=lshskew_sigfams NFAMS=${fams.getLong(0)} " +
          s"NVECS=${fams.getLong(1)} INTRAPAIRS=${fams.getLong(2)} " +
          s"MAXFAM=${fams.getLong(3)}")
        bk.unpersist()
      }
      case "recallsampled" =>
        // Recall at scales where the O(n²) truth of the registered recall
        // gates is intractable: truth = brute-force top-3 against the FULL
        // corpus for a ~2000-vector hash-sampled query set (count-derived
        // uniform predicate — NEVER an id prefix, ScaleUp ids collapse
        // those to copy-0), found = each trained-kNN variant's edges for
        // the sampled queries. Prints probe-1 vs probe-2 recall — the
        // wall A/B's quality half.
        val en = SimSearch.normEmbeds(s, d).cache()
        val every = math.max(1L, n / 2000)
        val qs = en.where(pmod(xxhash64(concat(lit("rq|"),
            col("vec_id").cast("string"))), lit(every)) === 0)
          .select(col("vec_id").as("qid"), col("vn").as("qv"))
        val truth = qs
          .join(en.select(col("vec_id").as("nbr"), col("vn")),
            col("qid") =!= col("nbr"))
          .select(col("qid"), col("nbr"),
            graft.llm.Vectors.dotFast(col("qv"), col("vn")).as("cos"))
          .groupBy(col("qid"))
          .agg(graft.functions.TopKPairAgg.topK(col("cos"), col("nbr"), 3)
            .as("t"))
          .select(col("qid"), explode(col("t")).as("p"))
          .select(col("qid"), col("p._2").as("nbr"))
          .localCheckpoint()
        val nTrue = truth.count()
        for (q <- Seq("q_sim_knn_graph_trained", "q_sim_knn_graph_trained2",
            "q_sim_knn_graph_nnd")) {
          s.catalog.clearCache()
          timed(s"recall_$q") {
            val found = SparkEntry.queries(q)(s, d)
              .select(col("vec_id").as("qid"), col("nbr"))
              .join(truth.select(col("qid")).distinct(), Seq("qid"),
                "left_semi")
              .localCheckpoint()
            val hit = truth.join(found, Seq("qid", "nbr"), "left_semi").count()
            println(s"STATS=recall Q=$q N_TRUE=$nTrue N_HIT=$hit " +
              s"RECALL=${hit.toDouble / nTrue}")
          }
        }
      case "occupancy" =>
        // The THIRD recall lever, measured on the same axis as probe-2
        // and the NND round: target cell occupancy (C = n/occ). Fewer
        // vectors per cell ⇒ more cells ⇒ fewer candidates per probe ⇒
        // cheaper pair stage but lower recall; the registered default is
        // 64. Each occ runs the full probe-2 pipeline (train + assign +
        // tail) and scores against one shared brute-force truth sample.
        val en0 = SimSearch.normEmbeds(s, d).cache()
        val every = math.max(1L, n / 2000)
        val qs = en0.where(pmod(xxhash64(concat(lit("rq|"),
            col("vec_id").cast("string"))), lit(every)) === 0)
          .select(col("vec_id").as("qid"), col("vn").as("qv"))
        val truth = qs
          .join(en0.select(col("vec_id").as("nbr"), col("vn")),
            col("qid") =!= col("nbr"))
          .select(col("qid"), col("nbr"),
            graft.llm.Vectors.dotFast(col("qv"), col("vn")).as("cos"))
          .groupBy(col("qid"))
          .agg(graft.functions.TopKPairAgg.topK(col("cos"), col("nbr"), 3)
            .as("t"))
          .select(col("qid"), explode(col("t")).as("p"))
          .select(col("qid"), col("p._2").as("nbr"))
          .localCheckpoint()
        val nTrue = truth.count()
        for (occ <- Seq(32L, 64L, 128L)) {
          s.catalog.clearCache()
          timed(s"occ_$occ") {
            val assigned2 = SimSearch.trainedAssign(e, occ)
              .select(col("vec_id"), col("bucket"), col("bucket2")).cache()
            val found = SimSearch
              .knnWithinBucketsProbe2(s, d, assigned2, 3)
              .select(col("vec_id").as("qid"), col("nbr"))
              .join(truth.select(col("qid")).distinct(), Seq("qid"),
                "left_semi")
              .localCheckpoint()
            val hit = truth.join(found, Seq("qid", "nbr"), "left_semi").count()
            println(s"STATS=occupancy OCC=$occ N_TRUE=$nTrue N_HIT=$hit " +
              s"RECALL=${hit.toDouble / nTrue}")
          }
        }
        // do the levers STACK? best measured occupancy + probe-2 + one
        // NND round, against the same truth sample
        s.catalog.clearCache()
        timed("occ_128_nnd") {
          val assigned2 = SimSearch.trainedAssign(e, 128L)
            .select(col("vec_id"), col("bucket"), col("bucket2")).cache()
          val found = SimSearch.nndRound(s, d,
              SimSearch.knnWithinBucketsProbe2(s, d, assigned2, 3), 3)
            .select(col("vec_id").as("qid"), col("nbr"))
            .join(truth.select(col("qid")).distinct(), Seq("qid"),
              "left_semi")
            .localCheckpoint()
          val hit = truth.join(found, Seq("qid", "nbr"), "left_semi").count()
          println(s"STATS=occupancy OCC=128+nnd N_TRUE=$nTrue N_HIT=$hit " +
            s"RECALL=${hit.toDouble / nTrue}")
        }
      case "pipelinesplit" =>
        // Output-cost vs join-cost split for the drug-disease pipeline's
        // 1000× wall (r11 attributed ~1050 s to ~1G hypothesis rows, but
        // both measured forms materialized the full output): count()
        // keeps every join's cardinality work and drops the output
        // materialization; the selective variant (ae_score > 0.9) tells
        // a 100 TB user what a high-threshold run costs. Each timing
        // re-stages the scratch identically, so diffs isolate the tail.
        val q = SparkEntry.queries("q_pipeline_drug_disease")
        timed("pipeline_count") {
          println(s"STATS=pipelinesplit NROWS=${q(s, d).count()}")
        }
        timed("pipeline_selective") {
          noop(q(s, d).where(col("ae_score") > 0.9))
        }
        timed("pipeline_full") { noop(q(s, d)) }
      case "pipelinecount" => timed("pipelinecount") {
        // single-stage repeatable form of pipelinesplit's count case:
        // comma-batch it (pipelinecount,pipelinecount,pipelinefull) to
        // separate JIT-cold from warm-in-JVM — the fixed-order composite
        // probe always pays the ~1.5× JIT/page-cache premium on whichever
        // case runs first (measured r12: count-first 877.7 s vs the two
        // later cases at 578 s)
        println("STATS=pipelinecount NROWS=" +
          SparkEntry.queries("q_pipeline_drug_disease")(s, d).count())
      }
      case "pipelinefull" => timed("pipelinefull") {
        noop(SparkEntry.queries("q_pipeline_drug_disease")(s, d))
      }
      case "invidx" =>
        // q_text_inverted_index's two-consumer shingle explode: cache vs
        // recompute (r12 verdict task 5). Both forms run twice in ONE JVM
        // after a discarded warmup — the q_pipeline counter-case says
        // recompute can win, so measure, don't assume.
        def terms = graft.ops.Core.table(s, d, "documents")
          .select(col("doc_id"), explode(array_distinct(
            graft.llm.TextOps.shingles(col("text"), 2))).as("term"))
        def runInv(t: org.apache.spark.sql.DataFrame): Unit = {
          val df = t.groupBy(col("term")).agg(count(lit(1)).as("df"))
            .where(col("df").between(2, 20))
          noop(t.join(df, Seq("term")).groupBy(col("term"), col("df"))
            .agg(array_join(array_sort(collect_list(col("doc_id"))), ",")
              .as("postings")))
        }
        runInv(terms) // discarded JIT warmup
        s.catalog.clearCache()
        timed("invidx_uncached") { runInv(terms) }
        timed("invidx_cached") { runInv(terms.cache()) }
        timed("invidx_uncached2") { runInv(terms) }
        timed("invidx_cached2") { runInv(terms.cache()) }
      case "knnstore" =>
        // incremental maintenance vs full rebuild at scale: build on the
        // 1023/1024 hash base, fold the ~n/1024 arrival batch, then price
        // the full rebuild the increment replaces. Work for the add step
        // should be O(batch · occupancy · K) — corpus-size-independent.
        val root = s"${System.getProperty("java.io.tmpdir")}/graft_knnstore_probe"
        val cents = SimSearch.trainedCentroidFrame(e, n).localCheckpoint(true)
        val isArr = pmod(xxhash64(concat(lit("knnstore|"),
          col("vec_id").cast("string"))), lit(1024L)) === 0
        timed("knnstore_build") {
          graft.queries.KnnStore.build(s, e.where(!isArr), cents, root, 3)
        }
        timed("knnstore_add") {
          noop(graft.queries.KnnStore.addArrivals(s, e.where(isArr), cents,
            root, 3))
        }
        timed("knnstore_rebuild") {
          graft.queries.KnnStore.build(s, e, cents, s"${root}_full", 3)
        }
        Seq(root, s"${root}_full").foreach { p =>
          scala.reflect.io.Directory(new java.io.File(p)).deleteRecursively()
        }
      case "refspread" =>
        // r15 A/B: q_ref_associations with/without a spread of the fact
        // side before the broadcast join + TopKAgg partial agg (all of
        // which run in the single scan task on the fixture layout).
        def refForm(spread: Boolean): DataFrame = {
          val li0 = graft.ops.Core.table(s, d, "lineitem")
          val li = if (spread) graft.ops.Core.spread(li0) else li0
          val o = graft.ops.Core.table(s, d, "orders")
          val evs = li.join(o, li("l_orderkey") === o("o_orderkey"))
            .select(
              col("l_suppkey").as("target_id"),
              col("o_orderpriority").as("disease_id"),
              when(col("l_returnflag") === "R", col("l_discount"))
                .otherwise(lit(0.0)).as("genetics"),
              when(col("l_returnflag") =!= "R", col("l_discount"))
                .otherwise(lit(0.0)).as("europepmc"))
          evs.groupBy(col("target_id"), col("disease_id"))
            .agg(count(lit(1)).as("evidence_count"),
              graft.functions.TopKAgg.topK(col("genetics"), 100).as("g_topk"),
              graft.functions.TopKAgg.topK(col("europepmc"), 100).as("l_topk"))
            .select(col("target_id"), col("disease_id"), col("evidence_count"),
              graft.ops.Scoring.harmonicFold(col("g_topk")).as("g_h"),
              graft.ops.Scoring.harmonicFold(col("l_topk")).as("l_h"))
            .select(col("target_id"), col("disease_id"), col("evidence_count"),
              round(graft.ops.Scoring.harmonicCombine(col("g_h"), col("l_h")), 6)
                .as("harmonic"))
            .where(col("harmonic") > 0.1)
        }
        noop(refForm(true)); noop(refForm(false))
        timed("ref_spread1") { noop(refForm(true)) }
        timed("ref_plain1") { noop(refForm(false)) }
        timed("ref_spread2") { noop(refForm(true)) }
        timed("ref_plain2") { noop(refForm(false)) }
      case "trained2split" =>
        // r15: stage attribution of q_sim_knn_graph_trained2 at fixture
        // scale — (a) full query, (b) assign only (train + collect +
        // static assign scan), (c) the knn probe-2 tail alone over a
        // cached assign. Alternating after a warmup.
        def fullQ = SparkEntry.queries("q_sim_knn_graph_trained2")(s, d)
        def assignOnly = SimSearch.trainedAssign(e)
          .select(col("vec_id"), col("bucket"), col("bucket2"))
        noop(fullQ); s.catalog.clearCache()
        timed("t2_full1") { noop(fullQ) }
        timed("t2_assign1") { noop(assignOnly) }
        val asg = SimSearch.trainedAssign(e)
          .select(col("vec_id"), col("bucket"), col("bucket2")).cache()
        noop(asg)
        timed("t2_tail1") { noop(SimSearch.knnWithinBucketsProbe2(s, d, asg, 3)) }
        s.catalog.clearCache()
        timed("t2_full2") { noop(fullQ) }
      case "corpussig" =>
        // r15 A/B: minhash sigs + LSH pairs over a doc_id-layout
        // checkpointed frame (the corpus_prepare survivors shape):
        // spread (round-robin + gram-sized agg exchange) vs the
        // exchange-free doc_id-preserving form — alternating, one JVM.
        val docs0 = graft.ops.Core.table(s, d, "documents")
          .select(col("doc_id"), col("text"))
          .repartition(col("doc_id")).localCheckpoint()
        def pairsOf(spreadInput: Boolean): DataFrame = {
          val sigs = graft.llm.Dedup.minhashSigs(
            docs0, "doc_id", "text", 3, 0 until 8, spreadInput)
          graft.llm.Dedup.lshCandidatePairs(sigs, "doc_id",
            bands = 4, rowsPerBand = 2)
        }
        noop(pairsOf(true)); noop(pairsOf(false))
        timed("corpussig_spread1") { noop(pairsOf(true)) }
        timed("corpussig_plain1") { noop(pairsOf(false)) }
        timed("corpussig_spread2") { noop(pairsOf(true)) }
        timed("corpussig_plain2") { noop(pairsOf(false)) }
      case "deconform" =>
        // r15 A/B: decon_sized OLD shape (three shingle passes over src0,
        // bloom over per-doc grams) vs the shipped distinct-gram cached
        // form — alternating in one JVM after untimed warmups.
        val docs = graft.ops.Core.table(s, d, "documents")
        def gramHashes(df: DataFrame): DataFrame = df
          .select(col("doc_id"),
            explode(array_distinct(
              graft.llm.TextOps.shingles(col("text"), 5))).as("g"))
          .select(col("doc_id"), col("g"),
            graft.ops.Core.md5Hash64(col("g")).as("h1"),
            graft.ops.Core.md5Hash64(concat(lit("bl|"), col("g"))).as("h2"))
        def oldForm(): DataFrame = {
          val ref = docs.where(col("source") === "src0")
          val refGrams = ref.select(explode(array_distinct(
              graft.llm.TextOps.shingles(col("text"), 5))).as("g")).distinct()
          val nn = refGrams.count()
          val m = graft.ops.Bloom.bitsFor(nn, 0.01)
          val kk = graft.ops.Bloom.hashesFor(m, nn)
          val bits = gramHashes(ref)
            .agg(graft.functions.BloomAgg.bloom(col("h1"), col("h2"), m, kk)
              .as("bloom_bits"))
          gramHashes(docs.where(col("source") =!= "src0"))
            .crossJoin(broadcast(bits))
            .where(graft.ops.Bloom.mightContainHashes(
              col("bloom_bits"), col("h1"), col("h2"), m, kk))
            .select(col("doc_id"), col("g"))
            .join(broadcast(refGrams.withColumn("v", lit(1L))), Seq("g"), "left")
            .groupBy(col("doc_id"))
            .agg(count(lit(1)).as("n_bloom_hits"),
              sum(coalesce(col("v"), lit(0L))).as("n_verified"))
        }
        def newForm(): DataFrame =
          SparkEntry.queries("q_dedup_decon_sized")(s, d)
        noop(newForm()); s.catalog.clearCache()
        noop(oldForm()); s.catalog.clearCache()
        timed("decon_old1") { noop(oldForm()) }
        timed("decon_new1") { noop(newForm()) }
        timed("decon_old2") { noop(oldForm()) }
        timed("decon_new2") { noop(newForm()) }
      case "shinglespread" =>
        // r15 A/B: the dedup family's shingle+md5+minhash pipeline over a
        // spread (round-robin repartitioned) docs frame vs the raw 1-task
        // scan — alternating in one JVM after an untimed warmup.
        val docs = graft.ops.Core.table(s, d, "documents")
        def sigs(df: DataFrame): DataFrame = {
          val sh = df.select(col("doc_id"),
            explode(array_distinct(
              graft.llm.TextOps.shingles(col("text"), 3))).as("w"))
          val mins = (0 until 8).map(i =>
            min((lit(graft.llm.Dedup.hashA(i)) * col("hw") +
              lit(graft.llm.Dedup.hashB(i))) % graft.llm.Dedup.P).as(s"mh$i"))
          sh.select(col("doc_id"),
              (graft.ops.Core.md5Hash64(col("w")) % graft.llm.Dedup.P).as("hw"))
            .groupBy(col("doc_id")).agg(mins.head, mins.tail: _*)
        }
        def rawForm = sigs(docs)
        def spreadForm = sigs(graft.ops.Core.spread(docs))
        noop(rawForm); noop(spreadForm)
        timed("shingle_raw1") { noop(rawForm) }
        timed("shingle_spread1") { noop(spreadForm) }
        timed("shingle_raw2") { noop(rawForm) }
        timed("shingle_spread2") { noop(spreadForm) }
        timed("shingle_raw3") { noop(rawForm) }
        timed("shingle_spread3") { noop(spreadForm) }
      case "nndfetch" =>
        // r15 A/B: the nndRound candidate-cosine step as the old two
        // broadcast vector-fetch joins vs the CosBetween lookup against
        // the broadcast CosIndex — same base, same JVM, alternating runs
        // after an untimed warmup (the fixed-order premium rule).
        val base0 = SparkEntry.queries("q_sim_knn_graph_trained2")(s, d)
          .select(col("vec_id"), col("nbr"), col("cos")).localCheckpoint()
        val en = SimSearch.normEmbeds(s, d)
        val bc = SimSearch.cosIndex(s, d)
        def und0 = base0.select(col("vec_id").as("v"), col("nbr").as("u"))
          .union(base0.select(col("nbr").as("v"), col("vec_id").as("u")))
          .distinct()
        def cand0 = und0.as("a").join(und0.as("b"),
            col("a.u") === col("b.u") && col("a.v") =!= col("b.v"))
          .select(col("a.v").as("v1"), col("b.v").as("v2"))
        def tail(hop: DataFrame): DataFrame = hop.union(base0)
          .groupBy(col("vec_id"))
          .agg(graft.functions.TopKPairDistinctAgg
            .topK(col("cos"), col("nbr"), 3).as("t"))
          .select(col("vec_id"), posexplode(col("t")))
        def oldForm = tail(cand0
          .join(broadcast(en.select(col("vec_id").as("v1"), col("vn").as("a"))),
            Seq("v1"))
          .join(broadcast(en.select(col("vec_id").as("v2"), col("vn").as("b"))),
            Seq("v2"))
          .select(col("v1").as("vec_id"), col("v2").as("nbr"),
            round(graft.llm.Vectors.dotFast(col("a"), col("b")), 6).as("cos")))
        def newForm = tail(cand0
          .select(col("v1").as("vec_id"), col("v2").as("nbr"),
            org.apache.spark.sql.graft.GraftSql
              .cosBetween(col("v1"), col("v2"), bc).as("cos"))
          .where(col("cos").isNotNull))
        noop(newForm); noop(oldForm) // untimed warmup, both shapes
        timed("fetch_new1") { noop(newForm) }
        timed("fetch_old1") { noop(oldForm) }
        timed("fetch_new2") { noop(newForm) }
        timed("fetch_old2") { noop(oldForm) }
      case "nnd2form" =>
        // lazy two-round composition (registered) vs localCheckpoint-per-
        // round (nndGraphAfter): the lazy plan is ~170 exchanges analyzed
        // once; the ckpt form trades analysis size for eager round
        // materialization. A genuinely UNTIMED warmup pass absorbs the
        // JIT/page-cache premium (r13 ADVICE: the old first timed pair
        // read cold and could be A/B'd by mistake).
        noop(SparkEntry.queries("q_sim_knn_graph_nnd2")(s, d))
        s.catalog.clearCache()
        timed("nnd2_lazy") {
          noop(SparkEntry.queries("q_sim_knn_graph_nnd2")(s, d))
        }
        timed("nnd2_ckpt") { noop(SimSearch.nndGraphAfter(s, d, 3, 2)) }
        timed("nnd2_lazy2") {
          noop(SparkEntry.queries("q_sim_knn_graph_nnd2")(s, d))
        }
        timed("nnd2_ckpt2") { noop(SimSearch.nndGraphAfter(s, d, 3, 2)) }
      case "beamserve" =>
        // the beam walk as a SERVING operation: graph pre-built into the
        // KnnStore (untimed build), the undirected edge view loaded and
        // pinned once (the serving cache), then the per-query walk timed
        // alone — the latency a query actually pays once the index exists.
        val root = s"${System.getProperty("java.io.tmpdir")}/graft_beamserve"
        val cents = SimSearch.trainedCentroidFrame(e, n).localCheckpoint(true)
        graft.queries.KnnStore.build(s, e, cents, root, 3)
        val g = graft.queries.KnnStore.readGraph(s, root)
          .select(col("vec_id"), col("nbr"))
        val und = g.select(col("vec_id").as("v"), col("nbr").as("u"))
          .union(g.select(col("nbr").as("v"), col("vec_id").as("u")))
          .distinct().localCheckpoint(true)
        val en = SimSearch.normEmbeds(s, d).localCheckpoint(true)
        val every = math.max(1L, n / 8)
        def walk(qid: Long): Long = {
          val qv = en.where(col("vec_id") === qid)
            .select(col("vn")).head().getSeq[Double](0)
          val qvCol = array(qv.map(lit): _*)
          def score(ids: org.apache.spark.sql.DataFrame) = ids
            .join(en, Seq("vec_id"))
            .select(col("vec_id"),
              round(graft.llm.Vectors.dotFast(col("vn"), qvCol), 6).as("cos"))
          def topB(sc0: org.apache.spark.sql.DataFrame, b: Int) = sc0
            .withColumn("rn", row_number().over(
              org.apache.spark.sql.expressions.Window
                .orderBy(col("cos").desc, col("vec_id"))))
            .where(col("rn") <= b).drop("rn")
          val seeds = en.where(pmod(graft.ops.Core.md5Hash64(concat(
            lit("beam|"), col("vec_id").cast("string"))), lit(every)) === 0 &&
            col("vec_id") =!= qid).select(col("vec_id"))
          var frontier = topB(score(seeds), 8).localCheckpoint()
          (1 to 3).foreach { _ =>
            val expand = frontier.select(col("vec_id").as("v"))
              .join(und, Seq("v")).select(col("u").as("vec_id"))
              .union(frontier.select(col("vec_id")))
              .where(col("vec_id") =!= qid).distinct()
            frontier = topB(score(expand), 8).localCheckpoint()
          }
          frontier.count()
        }
        walk(0L) // discarded warmup
        timed("beamserve_10q") {
          val ids = e.select(col("vec_id")).limit(10)
            .collect().map(_.getLong(0))
          ids.foreach(q => walk(q))
        }
        scala.reflect.io.Directory(new java.io.File(root)).deleteRecursively()
      case "pipelinegate" => timed("pipelinegate") {
        // the r12-named 1000× lever, priced: the front-side pair-evidence
        // gate (pairs with >= 3 F-status fact rows) ahead of the candidate
        // expansion and mask joins. Comma-batch with pipelinecount
        // (pipelinecount,pipelinegate,pipelinecount) so the first case
        // absorbs the JIT/page-cache premium and the gate is judged
        // against a warm count run.
        println("STATS=pipelinegate NROWS=" +
          graft.queries.Reference.drugDiseasePipelineGated(s, d, 3L).count())
      }
      case "assignstatic" =>
        // A/B half of assigntrainedonly: the driver-decoded broadcast
        // index assign (TwoLevelAssign) against the same trained frame.
        // Build/collect/broadcast setup is INSIDE the timing on purpose —
        // a real caller pays it — but printed separately too.
        val tr = SimSearch.trainedCentroidFrame(e, n).cache()
        noop(tr)
        val t0 = System.nanoTime()
        val asg = SimSearch.assignTwoLevelAgainstStatic(e, tr)
        println(s"PROBE=assignstatic_setup SEC=${(System.nanoTime() - t0) / 1e9}")
        timed("assignstatic") {
          noop(asg.select(col("vec_id"), col("bucket")))
        }
      case "passagesplit" =>
        // Stage attribution for q_text_passage_dfcap's superlinear 1000×
        // row (r11's open weak). Each stage is timed COLD (timed()
        // clearCache's between runs) and includes its upstream, so
        // consecutive diffs are per-stage increments; the row counts tell
        // volume growth apart from per-row constants. Same builder the
        // registered query ships — no drift.
        val p = graft.queries.LlmOps.passageDfcapPlan(s, d)
        val nDocs = graft.ops.Core.table(s, d, "documents").count()
        println(s"STATS=passage NDOCS=$nDocs")
        timed("pd_passages") { noop(p.passages) }
        timed("pd_tf") { noop(p.tf) }
        timed("pd_df") { noop(p.df) }
        timed("pd_qdf") { noop(p.qdf) }
        timed("pd_scored") { noop(p.scored) }
        timed("pd_full") { noop(p.topk) }
        // volume profile (one pass, reuses the tf cache like production)
        val nPass = p.passages.count()
        val nTf = p.tf.count()
        val nDf = p.df.count()
        val nQdf = p.qdf.count()
        val nCand = p.tf.join(broadcast(p.qdf), Seq("w")).count()
        val nScored = p.scored.count()
        println(s"STATS=passagevol NPASSAGES=$nPass NTF=$nTf NDF=$nDf " +
          s"NQDF=$nQdf NCAND=$nCand NSCORED=$nScored")
        s.catalog.clearCache()
      case "knnstorevol" =>
        // r13 weak #1 follow-through: with the defense check pruned to
        // gaining homes, does addArrivals' READ volume track the BATCH
        // rather than the corpus? RunMetrics.inputRecords is the ground
        // truth across every file scan each step issues. The arrival
        // frame is checkpointed OUTSIDE the measurement so the corpus
        // fixture scan doesn't pollute the store-read number.
        val root =
          s"${System.getProperty("java.io.tmpdir")}/graft_knnstorevol_probe"
        val cents = SimSearch.trainedCentroidFrame(e, n).localCheckpoint(true)
        val isArr = pmod(xxhash64(concat(lit("knnstore|"),
          col("vec_id").cast("string"))), lit(1024L)) === 0
        // two batch sizes out of the same arrival pool (≈ m/8 and 7m/8):
        // the claim under test is reads TRACK the batch. The touch set is
        // min(batch · occupancy · 2, C) partitions per table, so a batch
        // near C/(2·occ) degenerates to all partitions — the small batch
        // sits well under that line, the large one near it.
        val isSmall = isArr && pmod(xxhash64(concat(lit("kv2|"),
          col("vec_id").cast("string"))), lit(64L)) === 0
        val small = e.where(isSmall).localCheckpoint(true)
        val rest = e.where(isArr && !isSmall).localCheckpoint(true)
        val bse = e.where(!isArr).localCheckpoint(true)
        val nSmall = small.count()
        val nRest = rest.count()
        timed("knnstorevol_build") {
          graft.queries.KnnStore.build(s, bse, cents, root, 3)
        }
        def addStep(tag: String, batch: DataFrame, m: Long): Unit = {
          val (_, mm) = org.apache.spark.sql.graft.RunMetrics.measure(s) {
            timed(s"knnstorevol_$tag") {
              noop(graft.queries.KnnStore.addArrivals(s, batch, cents,
                root, 3))
            }
          }
          println(s"STATS=knnstorevol STEP=$tag N=$n BATCH=$m " +
            s"INPUT_RECORDS=${mm.inputRecords} " +
            s"SHUFFLE_RECORDS=${mm.shuffleReadRecords}")
        }
        addStep("add_small", small, nSmall)
        addStep("add_rest", rest, nRest)
        val (_, mReb) = org.apache.spark.sql.graft.RunMetrics.measure(s) {
          timed("knnstorevol_rebuild") {
            graft.queries.KnnStore.build(s, e, cents, s"${root}_full", 3)
          }
        }
        println(s"STATS=knnstorevol STEP=rebuild N=$n BATCH=$n " +
          s"INPUT_RECORDS=${mReb.inputRecords} " +
          s"SHUFFLE_RECORDS=${mReb.shuffleReadRecords}")
        Seq(root, s"${root}_full").foreach { p =>
          scala.reflect.io.Directory(new java.io.File(p)).deleteRecursively()
        }
      case "beamstore" =>
        // the store-served walk (q_sim_graph_beam_stored's engine) as a
        // SERVING operation: store pre-built (untimed — offline index
        // work), then the walk timed alone with its read volume. The
        // claim under test: per-walk reads track the frontier (shard
        // row-group granules), not the corpus.
        val root = s"${System.getProperty("java.io.tmpdir")}/graft_beamstore"
        val cents = SimSearch.trainedCentroidFrame(e, n).localCheckpoint(true)
        graft.queries.KnnStore.build(s, e, cents, root, 3)
        val en = SimSearch.normEmbeds(s, d)
        val qvArr = en.where(col("vec_id") === 0)
          .select(col("vn")).head().getSeq[Double](0)
        val every = math.max(1L, n / 8)
        val seeds = en
          .where(pmod(graft.ops.Core.md5Hash64(concat(lit("beam|"),
            col("vec_id").cast("string"))), lit(every)) === 0 &&
            col("vec_id") =!= 0)
          .select(col("vec_id")).collect().map(_.getLong(0)).toSeq
        def walk(): Long = graft.queries.KnnStore
          .beamSearch(s, root, qvArr, 0L, 8, 3, seeds).count()
        walk() // discarded warmup
        val (_, mWalk) = org.apache.spark.sql.graft.RunMetrics.measure(s) {
          timed("beamstore_walk") { walk() }
        }
        println(s"STATS=beamstore N=$n SEEDS=${seeds.length} " +
          s"INPUT_RECORDS=${mWalk.inputRecords} " +
          s"SHUFFLE_RECORDS=${mWalk.shuffleReadRecords} " +
          s"TASKS=${mWalk.tasks}")
        timed("beamstore_walk2") { walk() }
        scala.reflect.io.Directory(new java.io.File(root)).deleteRecursively()
      case "nndshard" =>
        // r13 verdict task 4: price the sharded (beyond-broadcast) NND
        // round against the broadcast-fetch form at a scale where both
        // run — same JVM, discarded warmup, then A/B. Threshold n/2 and
        // n/4 model the just-past-broadcast regime (2 and 4 shards).
        val baseG = SparkEntry.queries("q_sim_knn_graph_trained2")(s, d)
          .select(col("vec_id"), col("nbr"), col("cos")).localCheckpoint()
        noop(SimSearch.nndRound(s, d, baseG, 3)) // discarded warmup
        s.catalog.clearCache()
        timed("nnd_round_broadcast") {
          noop(SimSearch.nndRound(s, d, baseG, 3))
        }
        timed("nnd_round_shard2") {
          noop(SimSearch.nndRound(s, d, baseG, 3, shardThreshold = n / 2))
        }
        timed("nnd_round_shard4") {
          noop(SimSearch.nndRound(s, d, baseG, 3, shardThreshold = n / 4))
        }
        timed("nnd_round_broadcast2") {
          noop(SimSearch.nndRound(s, d, baseG, 3))
        }
      case "nndconv" =>
        // the convergence certificate at scale (r13 verdict task 5):
        // bounded 3 rounds, per-round decay printed
        timed("nndconverge3") {
          val rows = SimSearch.nndConverge(s, d, 3, 3).collect()
          rows.foreach(r => println(s"STATS=nndconv ROUND=${r.getLong(0)} " +
            s"N_NEW=${r.getLong(1)} N_EDGES=${r.getLong(2)}"))
        }
      case "recallnnd23" =>
        // the sampled recall ladder extended past +1 round (r13 verdict
        // task 5's other half): rounds 2 and 3 against the same
        // hash-sampled brute-force truth as recallsampled
        val en = SimSearch.normEmbeds(s, d).cache()
        val every = math.max(1L, n / 2000)
        val qs = en.where(pmod(xxhash64(concat(lit("rq|"),
            col("vec_id").cast("string"))), lit(every)) === 0)
          .select(col("vec_id").as("qid"), col("vn").as("qv"))
        val truth = qs
          .join(en.select(col("vec_id").as("nbr"), col("vn")),
            col("qid") =!= col("nbr"))
          .select(col("qid"), col("nbr"),
            graft.llm.Vectors.dotFast(col("qv"), col("vn")).as("cos"))
          .groupBy(col("qid"))
          .agg(graft.functions.TopKPairAgg.topK(col("cos"), col("nbr"), 3)
            .as("t"))
          .select(col("qid"), explode(col("t")).as("p"))
          .select(col("qid"), col("p._2").as("nbr"))
          .localCheckpoint()
        val nTrue = truth.count()
        for (r <- Seq(2, 3)) {
          s.catalog.clearCache()
          timed(s"recall_nnd_r$r") {
            val found = SimSearch.nndGraphAfter(s, d, 3, r)
              .select(col("vec_id").as("qid"), col("nbr"))
              .join(truth.select(col("qid")).distinct(), Seq("qid"),
                "left_semi")
              .localCheckpoint()
            val hit = truth.join(found, Seq("qid", "nbr"), "left_semi")
              .count()
            println(s"STATS=recallnnd ROUNDS=$r N_TRUE=$nTrue N_HIT=$hit " +
              s"RECALL=${hit.toDouble / nTrue}")
          }
        }
      case "beamfam" =>
        // r13 verdict task 8: is there shareable work inside the beam
        // family's bench entries? Within ONE entry the trained2 graph is
        // already derived exactly once (the walk checkpoints it), so the
        // A/B is entry-vs-entry: beam alone, recall (walk + exact truth),
        // both repeated warm after a discarded first pass.
        noop(SparkEntry.queries("q_sim_graph_beam")(s, d)) // warmup
        s.catalog.clearCache()
        timed("beamfam_beam") {
          noop(SparkEntry.queries("q_sim_graph_beam")(s, d))
        }
        timed("beamfam_recall") {
          noop(SparkEntry.queries("q_sim_graph_beam_recall")(s, d))
        }
        timed("beamfam_beam2") {
          noop(SparkEntry.queries("q_sim_graph_beam")(s, d))
        }
        timed("beamfam_recall2") {
          noop(SparkEntry.queries("q_sim_graph_beam_recall")(s, d))
        }
        timed("beamfam_stored") {
          noop(SparkEntry.queries("q_sim_graph_beam_stored")(s, d))
        }
      case "knnremove" =>
        // removeVectors / upsert priced vs the rebuild they replace:
        // build(corpus), remove a ~n/1024 hash batch (timed +
        // RunMetrics), then the reference rebuild-without for the same
        // end state.
        val root =
          s"${System.getProperty("java.io.tmpdir")}/graft_knnremove_probe"
        val cents = SimSearch.trainedCentroidFrame(e, n).localCheckpoint(true)
        val isRm = pmod(xxhash64(concat(lit("knnstore|"),
          col("vec_id").cast("string"))), lit(1024L)) === 0
        val isRmSmall = isRm && pmod(xxhash64(concat(lit("kv2|"),
          col("vec_id").cast("string"))), lit(64L)) === 0
        val small = e.where(isRmSmall).select(col("vec_id"))
          .localCheckpoint(true)
        val rest = e.where(isRm && !isRmSmall).select(col("vec_id"))
          .localCheckpoint(true)
        timed("knnremove_build") {
          graft.queries.KnnStore.build(s, e, cents, root, 3)
        }
        def rmStep(tag: String, batch: DataFrame): Unit = {
          val m = batch.count()
          val (_, mRm) = org.apache.spark.sql.graft.RunMetrics.measure(s) {
            timed(s"knnremove_$tag") {
              noop(graft.queries.KnnStore.removeVectors(s, batch, root, 3))
            }
          }
          println(s"STATS=knnremove STEP=$tag N=$n BATCH=$m " +
            s"INPUT_RECORDS=${mRm.inputRecords} " +
            s"SHUFFLE_RECORDS=${mRm.shuffleReadRecords}")
        }
        rmStep("remove_small", small)
        rmStep("remove_rest", rest)
        timed("knnremove_rebuild_without") {
          graft.queries.KnnStore.build(s, e.where(!isRm), cents,
            s"${root}_ref", 3)
        }
        Seq(root, s"${root}_ref").foreach { p =>
          scala.reflect.io.Directory(new java.io.File(p)).deleteRecursively()
        }
      case "beamplan" =>
        // plan + per-read metrics for the store-backed walk's three read
        // shapes: is the literal isin a PartitionFilter, and how many
        // tasks does each pruned read schedule?
        val root = s"${System.getProperty("java.io.tmpdir")}/graft_beamplan"
        val cents = SimSearch.trainedCentroidFrame(e, n).localCheckpoint(true)
        graft.queries.KnnStore.build(s, e, cents, root, 3)
        val shards = graft.queries.KnnStore.readDirShards(s, root)
        val ids = e.select(col("vec_id")).limit(8).collect()
          .map(_.getLong(0)).toSeq
        val sh = ids.map(graft.queries.KnnStore.shardOfId(_, shards)).distinct
        val dirRead = graft.queries.KnnStore.readDir(s, root)
          .where(col("shard").isin(sh: _*) && col("vec_id").isin(ids: _*))
        println("=== dir read plan ===")
        println(dirRead.queryExecution.executedPlan.toString.take(2500))
        val (_, m1) = org.apache.spark.sql.graft.RunMetrics.measure(s) {
          dirRead.collect()
        }
        println(s"STATS=beamplan READ=dir TASKS=${m1.tasks} " +
          s"RECORDS=${m1.inputRecords}")
        val homes = dirRead.select(col("home")).distinct().collect()
          .map(_.getLong(0)).toSeq
        val memRead = graft.queries.KnnStore.readMembers(s, root)
          .where(col("bucket").isin(homes: _*) && col("vec_id").isin(ids: _*))
        println("=== member read plan ===")
        println(memRead.queryExecution.executedPlan.toString.take(2500))
        val (_, m2) = org.apache.spark.sql.graft.RunMetrics.measure(s) {
          memRead.collect()
        }
        println(s"STATS=beamplan READ=members TASKS=${m2.tasks} " +
          s"RECORDS=${m2.inputRecords}")
        val adjRead = graft.queries.KnnStore.readAdj(s, root)
          .where(col("shard").isin(sh: _*) && col("v").isin(ids: _*))
          .select(col("u")).distinct()
        val (_, m3) = org.apache.spark.sql.graft.RunMetrics.measure(s) {
          adjRead.collect()
        }
        println(s"STATS=beamplan READ=adj TASKS=${m3.tasks} " +
          s"RECORDS=${m3.inputRecords}")
        scala.reflect.io.Directory(new java.io.File(root)).deleteRecursively()
      case "beambatchstore" =>
        // r14 verdict task 3 evidence: per-round job count of the batch
        // walk must be FLAT in the serving-batch size (one readPart per
        // table per round for the whole batch) and read volume ∝ the
        // union frontier — plus the amortization baseline: the same
        // queries walked singly through beamSearch.
        val root =
          s"${System.getProperty("java.io.tmpdir")}/graft_beambatch_probe"
        val cents = SimSearch.trainedCentroidFrame(e, n).localCheckpoint(true)
        timed("beambatchstore_build") {
          graft.queries.KnnStore.build(s, e, cents, root, 3)
        }
        val en = SimSearch.normEmbeds(s, d)
        def picks(salt: String, expect: Long) = en
          .where(pmod(graft.ops.Core.md5Hash64(concat(lit(salt),
            col("vec_id").cast("string"))),
            lit(math.max(1L, n / expect))) === 0)
        val seeds = picks("beam|", 8).select(col("vec_id"))
          .collect().map(_.getLong(0)).toSeq
        def qset(expect: Long) = picks("bq|", expect)
          .select(col("vec_id"), col("vn"))
          .collect().map(r => (r.getLong(0), r.getSeq[Double](1))).toSeq
        // discarded warmup: JIT + page-cache premium on the first case
        // (hard-won rule: fixed-order composite probes)
        graft.queries.KnnStore.beamSearchBatch(s, root, qset(4), 8, 3, seeds)
        Seq(8L, 32L, 128L).foreach { qn =>
          val qs = qset(qn)
          val jobs = new java.util.concurrent.atomic.AtomicLong
          val jl = new org.apache.spark.scheduler.SparkListener {
            override def onJobStart(
                j: org.apache.spark.scheduler.SparkListenerJobStart): Unit =
              jobs.incrementAndGet()
          }
          s.sparkContext.addSparkListener(jl)
          val t0 = System.nanoTime()
          val (_, m) = org.apache.spark.sql.graft.RunMetrics.measure(s) {
            graft.queries.KnnStore.beamSearchBatch(s, root, qs, 8, 3, seeds)
          }
          val sec = (System.nanoTime() - t0) / 1e9
          s.sparkContext.removeSparkListener(jl)
          println(s"STATS=beambatchstore N=$n Q=${qs.size} " +
            s"JOBS=${jobs.get} TASKS=${m.tasks} " +
            s"INPUT_RECORDS=${m.inputRecords} SEC=$sec")
        }
        val qsSmall = qset(8)
        val t1 = System.nanoTime()
        val (_, mS) = org.apache.spark.sql.graft.RunMetrics.measure(s) {
          qsSmall.foreach { case (qid, qv) =>
            graft.queries.KnnStore.beamSearch(s, root, qv, qid, 8, 3,
              seeds).collect()
          }
        }
        println(s"STATS=beambatchstore N=$n SINGLES=${qsSmall.size} " +
          s"TASKS=${mS.tasks} INPUT_RECORDS=${mS.inputRecords} " +
          s"SEC=${(System.nanoTime() - t1) / 1e9}")
        scala.reflect.io.Directory(new java.io.File(root)).deleteRecursively()
      case "knnupsert" =>
        // r14 verdict task 4 A/B: the fused one-pass upsert vs the
        // remove ∘ add composition, identical batches on identically
        // built stores (each arm pays its own build; the builds also
        // serve as JIT warm-up so the cross-arm comparison is on warm
        // code). RunMetrics read volumes are the JIT-independent signal.
        val root =
          s"${System.getProperty("java.io.tmpdir")}/graft_knnupsert_probe"
        val cents = SimSearch.trainedCentroidFrame(e, n).localCheckpoint(true)
        val isUp = pmod(xxhash64(concat(lit("ups|"),
          col("vec_id").cast("string"))), lit(1024L)) === 0
        val isUpSmall = isUp && pmod(xxhash64(concat(lit("ups2|"),
          col("vec_id").cast("string"))), lit(64L)) === 0
        def reEmbed(pred: org.apache.spark.sql.Column) = e.where(pred)
          .select(col("vec_id"),
            transform(col("v"), x => -x).as("v"))
          .localCheckpoint(true)
        val small = reEmbed(isUpSmall)
        val rest = reEmbed(isUp && !isUpSmall)
        def upStep(tag: String, batch: DataFrame,
            f: (org.apache.spark.sql.SparkSession, DataFrame) => Unit)
            : Unit = {
          val m0 = batch.count()
          val (_, m) = org.apache.spark.sql.graft.RunMetrics.measure(s) {
            timed(s"knnupsert_$tag") { f(s, batch) }
          }
          println(s"STATS=knnupsert STEP=$tag N=$n BATCH=$m0 " +
            s"INPUT_RECORDS=${m.inputRecords} " +
            s"SHUFFLE_RECORDS=${m.shuffleReadRecords}")
        }
        timed("knnupsert_build_seq") {
          graft.queries.KnnStore.build(s, e, cents, root, 3)
        }
        upStep("seq_small", small, (ss, b) =>
          graft.queries.KnnStore.upsertSequential(ss, b, cents, root, 3))
        upStep("seq_rest", rest, (ss, b) =>
          graft.queries.KnnStore.upsertSequential(ss, b, cents, root, 3))
        timed("knnupsert_build_fused") {
          graft.queries.KnnStore.build(s, e, cents, root, 3)
        }
        upStep("fused_small", small, (ss, b) =>
          graft.queries.KnnStore.upsert(ss, b, cents, root, 3))
        upStep("fused_rest", rest, (ss, b) =>
          graft.queries.KnnStore.upsert(ss, b, cents, root, 3))
        scala.reflect.io.Directory(new java.io.File(root)).deleteRecursively()
      case "knndrift" =>
        // r14 verdict task 5: centroid-drift contract evidence. Arrival
        // batches drawn from a SHIFTED distribution (existing vectors
        // pulled hard toward one fixed direction) land in the few cells
        // nearest the new mode; occupancyAudit's Σsize² / max_cell
        // record the skew curve batch by batch — the rebuild-trigger
        // rule in the class doc derives from it.
        val root =
          s"${System.getProperty("java.io.tmpdir")}/graft_knndrift_probe"
        val cents = SimSearch.trainedCentroidFrame(e, n).localCheckpoint(true)
        timed("knndrift_build") {
          graft.queries.KnnStore.build(s, e, cents, root, 3)
        }
        def audit(tag: String): Unit = {
          val r = graft.queries.KnnStore.occupancyAudit(s, root).head()
          println(s"STATS=knndrift STEP=$tag N=$n " +
            s"NCELLS=${r.getLong(0)} NMEMBERS=${r.getLong(1)} " +
            s"SUMSQ=${r.getLong(2)} MAXCELL=${r.getLong(3)}")
        }
        audit("build")
        val drift = SimSearch.normEmbeds(s, d).orderBy(col("vec_id"))
          .select(col("vn")).head().getSeq[Double](0)
        val driftLit = array(drift.map(lit): _*)
        (1 to 5).foreach { b =>
          // unit vectors pulled 2 units toward the drift direction:
          // ~uniform pick of ids (hash, never prefix), fresh NEGATIVE
          // ids offset per batch (cannot collide with any fixture /
          // ScaleUp id)
          val batch = SimSearch.normEmbeds(s, d)
            .where(pmod(xxhash64(concat(lit(s"drift$b|"),
              col("vec_id").cast("string"))), lit(64L)) === 0)
            .select((-col("vec_id") - lit(b.toLong * (1L << 40))).as("vec_id"),
              zip_with(col("vn"), driftLit,
                (x, u) => x + lit(2.0) * u).as("v"))
          timed(s"knndrift_add$b") {
            graft.queries.KnnStore.addArrivals(s, batch, cents, root, 3)
          }
          audit(s"batch$b")
        }
        scala.reflect.io.Directory(new java.io.File(root)).deleteRecursively()
      case "bandstore" =>
        // r14 frontier #1 evidence: the stored streaming screen's probe
        // I/O must track the BATCH, never the corpus — run at sf10
        // (500k docs) and sf100 (5M) and compare INPUT_RECORDS per
        // batch size across the 10× corpus step.
        val root =
          s"${System.getProperty("java.io.tmpdir")}/graft_bandstore_probe"
        val docs = graft.ops.Core.table(s, d, "documents")
          .localCheckpoint(true)
        val corpus = docs.where(col("source") === "src0")
        val nArr = docs.where(col("source") =!= "src0").count()
        val seeds = 0 until 8
        timed("bandstore_build") {
          graft.streaming.BandStore.build(s, graft.llm.Dedup.bandKeys(
            graft.llm.Dedup.minhashSigs(corpus, "doc_id", "text", 3,
              seeds),
            "doc_id", bands = 4, rowsPerBand = 2).select(col("bk")), root)
        }
        println(s"STATS=bandstore SHARDS=" +
          graft.streaming.BandStore.readShards(s, root))
        // discarded warmup (JIT/page-cache premium on the first case)
        graft.streaming.BandStore.probe(s, root, Seq("0|1_2"))
        // batch sizes straddle the shard count: a batch whose key set
        // spans every shard reads the whole table (the S-floor regime,
        // same as KnnStore's adj shards at fixture scale); the ∝-batch
        // bound shows below S where touched shards < S
        Seq(5L, 25L, 100L, 1000L).foreach { bsz =>
          val batch = docs.where(col("source") =!= "src0")
            .where(pmod(graft.ops.Core.md5Hash64(concat(
              lit(s"bsz$bsz|"), col("doc_id").cast("string"))),
              lit(math.max(1L, nArr / bsz))) === 0)
            .localCheckpoint(true)
          val m0 = batch.count()
          val t0 = System.nanoTime()
          val (_, m) = org.apache.spark.sql.graft.RunMetrics.measure(s) {
            noop(graft.streaming.BandStore.lshTagBatch(s, root, batch,
              "doc_id", "text", 3, seeds, bands = 4, rowsPerBand = 2))
          }
          println(s"STATS=bandstore BATCH=$m0 TASKS=${m.tasks} " +
            s"INPUT_RECORDS=${m.inputRecords} " +
            s"SEC=${(System.nanoTime() - t0) / 1e9}")
        }
        // incremental fold: a serving-batch's worth of NEW keys merges
        // into its touched shards only — read volume ∝ batch, never
        // the vocabulary
        Seq(5L, 100L).foreach { bsz =>
          val newKeys = docs.where(col("source") =!= "src0")
            .where(pmod(graft.ops.Core.md5Hash64(concat(
              lit(s"addk$bsz|"), col("doc_id").cast("string"))),
              lit(math.max(1L, nArr / bsz))) === 0)
            .select(explode(array_distinct(
              graft.llm.TextOps.shingles(col("text"), 3))).as("g"))
            .select(concat(lit("nk|"), col("g")).as("bk"))
            .localCheckpoint(true)
          val nk = newKeys.distinct().count()
          val t0 = System.nanoTime()
          val (_, m) = org.apache.spark.sql.graft.RunMetrics.measure(s) {
            graft.streaming.BandStore.addKeys(s, newKeys, root)
          }
          println(s"STATS=bandstore_addkeys NEWKEYS=$nk TASKS=${m.tasks} " +
            s"INPUT_RECORDS=${m.inputRecords} " +
            s"SEC=${(System.nanoTime() - t0) / 1e9}")
        }
        scala.reflect.io.Directory(new java.io.File(root)).deleteRecursively()
      case "spreadrel" =>
        // r15 opt A/B: spread vs raw for the two single-scan-task
        // relational folds (countmin's 4 md5s/row, stats_corr's 14
        // decimal partial sums) — alternating same-JVM, both arms warmed.
        val li = graft.ops.Core.table(s, d, "lineitem")
        def countminForm(base: DataFrame): DataFrame = {
          val W = 256L
          val rowBuckets = explode(array((0 until 4).map(i =>
            struct(lit(i).as("r"), col(s"b$i").as("b"))): _*)).as("rb")
          val hashed = base.select(
            col("l_partkey") +: (0 until 4).map(i =>
              pmod(graft.ops.Core.md5Hash64(
                concat(lit(s"cms$i|"), col("l_partkey").cast("string"))),
                lit(W)).as(s"b$i")): _*)
            .persist()
          val counters = hashed.select(rowBuckets)
            .groupBy(col("rb.r").as("r"), col("rb.b").as("b"))
            .agg(count(lit(1)).as("c"))
          val keys = hashed
            .groupBy(col("l_partkey"), col("b0"), col("b1"), col("b2"),
              col("b3"))
            .agg(count(lit(1)).as("n_true"))
          keys.select(col("l_partkey"), col("n_true"), rowBuckets)
            .select(col("l_partkey"), col("n_true"),
              col("rb.r").as("r"), col("rb.b").as("b"))
            .join(broadcast(counters), Seq("r", "b"))
            .groupBy(col("l_partkey"))
            .agg(min(col("n_true")).as("n_true"), min(col("c")).as("est_cms"))
        }
        def corrForm(base: DataFrame): DataFrame = {
          val b = base.select(
            round(col("l_quantity")).cast("long").as("q"),
            round(col("l_extendedprice") * 100).cast("long").as("p"),
            round(col("l_discount") * 10000).cast("long").as("dd"),
            round(col("l_tax") * 10000).cast("long").as("t"))
          def dec(c: String) = col(c).cast("decimal(19,0)")
          val cols = Seq("q", "p", "dd", "t")
          val sums = cols.map(c => sum(dec(c)).as(s"s_$c"))
          val sqs = cols.map(c => sum(dec(c) * dec(c)).as(s"ss_$c"))
          val crosses = cols.combinations(2).toSeq.map { case Seq(x, y) =>
            sum(dec(x) * dec(y)).as(s"sx_${x}_$y")
          }
          b.agg(count(lit(1)).cast("decimal(38,0)").as("n"),
            (sums ++ sqs ++ crosses): _*)
        }
        def run(nm: String, mk: DataFrame => DataFrame): Unit = {
          noop(mk(li)); s.catalog.clearCache()
          noop(mk(graft.ops.Core.spread(li))); s.catalog.clearCache()
          (1 to 3).foreach { i =>
            timed(s"${nm}_raw$i") { noop(mk(li)) }
            timed(s"${nm}_spread$i") { noop(mk(graft.ops.Core.spread(li))) }
          }
        }
        run("cms", countminForm)
        run("corr", corrForm)
        def pctForm(base: DataFrame): DataFrame = base
          .groupBy(col("l_returnflag"))
          .agg(expr("percentile(l_extendedprice, array(0.5, 0.9))").as("ps"),
            count(lit(1)).as("n_rows"))
        run("pct", pctForm)
        val ord = graft.ops.Core.table(s, d, "orders")
        def diffForm(base: DataFrame): DataFrame = {
          val buckets = 64L
          val a = base
          val b = a.where(col("o_orderkey") % 101 =!= 0L)
            .withColumn("o_totalprice",
              when(col("o_orderkey") % 97 === 0L, col("o_totalprice") + 1.0)
                .otherwise(col("o_totalprice")))
          def fp(df: DataFrame) = df.select(
            col("o_orderkey"),
            (graft.ops.Core.md5Hash64(concat(lit("td|"),
              col("o_orderkey").cast("string"))) % buckets).as("bucket"),
            graft.ops.Core.md5Hash64(concat_ws("|", col("o_orderkey"),
              round(col("o_totalprice") * 100).cast("long"),
              col("o_orderstatus"))).as("rh"))
          val fa = fp(a)
          val fb = fp(b)
          def sketch(df: DataFrame) = df.groupBy(col("bucket"))
            .agg(count(lit(1)).as("n"),
              call_function("bit_xor", col("rh")).as("x"))
          val dif = sketch(fa).as("sa")
            .join(sketch(fb).as("sb"), Seq("bucket"), "full_outer")
            .where(coalesce(col("sa.n"), lit(-1L)) =!=
                coalesce(col("sb.n"), lit(-1L)) ||
              coalesce(col("sa.x"), lit(0L)) =!= coalesce(col("sb.x"), lit(0L)))
            .select(col("bucket"))
          val da = fa.join(broadcast(dif), Seq("bucket"))
            .select(col("o_orderkey"), col("rh").as("rh_a"))
          val db = fb.join(broadcast(dif), Seq("bucket"))
            .select(col("o_orderkey"), col("rh").as("rh_b"))
          da.join(db, Seq("o_orderkey"), "full_outer")
            .where(col("rh_a").isNull || col("rh_b").isNull ||
              col("rh_a") =!= col("rh_b"))
            .select(col("o_orderkey"),
              when(col("rh_b").isNull, "deleted")
                .when(col("rh_a").isNull, "inserted")
                .otherwise("changed").as("change_type"))
        }
        def runOrd(nm: String, mk: DataFrame => DataFrame): Unit = {
          noop(mk(ord)); s.catalog.clearCache()
          noop(mk(graft.ops.Core.spread(ord))); s.catalog.clearCache()
          (1 to 3).foreach { i =>
            timed(s"${nm}_raw$i") { noop(mk(ord)) }
            timed(s"${nm}_spread$i") { noop(mk(graft.ops.Core.spread(ord))) }
          }
        }
        runOrd("tdiff", diffForm)
      case "kcoreform" =>
        // r16 A/B: the OLD kcoreRounds (persist chain + per-round 1-row
        // checkpoints; edge lineage re-analyzed 3^r-fold — the two-star
        // trap) vs the NEW shape (localCheckpoint per edge generation +
        // collected scalar summaries). Alternating same-JVM over the full
        // q_graph_kcore input lineage (the planning cost under test IS
        // the upstream co-occurrence self-join, so no pre-checkpoint).
        import org.apache.spark.storage.StorageLevel
        def undK() = {
          val occ = graft.ops.Core.table(s, d, "events")
            .select(expr("unix_timestamp(ts) div 300").as("win"),
              col("event_type"), col("user_id"))
            .distinct()
          val eG = occ.as("a")
            .join(occ.as("b"),
              col("a.win") === col("b.win") &&
                col("a.event_type") === col("b.event_type") &&
                col("a.user_id") < col("b.user_id"))
            .select(col("a.user_id").as("src"), col("b.user_id").as("dst"))
            .distinct()
          eG.union(eG.select(col("dst").as("src"), col("src").as("dst")))
        }
        def oldPeel(edges: DataFrame, kf: DataFrame): (DataFrame, DataFrame) = {
          val alive = edges.groupBy(col("src")).agg(count(lit(1)).as("deg"))
            .crossJoin(broadcast(kf))
            .where(col("deg") >= col("k"))
            .select(col("src").as("node"))
          val next = edges
            .join(broadcast(alive.select(col("node").as("src"))), Seq("src"), "left_semi")
            .join(broadcast(alive.select(col("node").as("dst"))), Seq("dst"), "left_semi")
          (alive, next)
        }
        def oldRounds(): DataFrame = {
          var edges = undK().repartition(col("src"))
            .persist(StorageLevel.MEMORY_AND_DISK)
          val kf = edges
            .agg(count(lit(1)).as("m"), countDistinct(col("src")).as("nv"))
            .select(expr("CAST(m DIV nv AS BIGINT)").as("k"))
            .persist(StorageLevel.MEMORY_AND_DISK)
          val rws = (1 to 3).map { r =>
            val (alive, nextRaw) = oldPeel(edges, kf)
            val next = nextRaw.persist(StorageLevel.MEMORY_AND_DISK)
            val row = alive.agg(count(lit(1)).as("n_alive"))
              .crossJoin(broadcast(next.agg(count(lit(1)).as("n_edges"))))
              .crossJoin(broadcast(kf))
              .select(lit(r.toLong).as("round"), col("k"),
                col("n_alive"), col("n_edges"))
              .localCheckpoint()
            edges.unpersist(blocking = false)
            edges = next
            row
          }
          edges.unpersist(blocking = false)
          kf.unpersist(blocking = false)
          rws.reduce(_ unionByName _)
        }
        noop(oldRounds()); s.catalog.clearCache()
        noop(graft.ops.Graph.kcoreRounds(undK(), 3)); s.catalog.clearCache()
        (1 to 3).foreach { i =>
          timed(s"kcore_old$i") { noop(oldRounds()) }
          timed(s"kcore_new$i") { noop(graft.ops.Graph.kcoreRounds(undK(), 3)) }
        }
      case "qjobs" =>
        // per-JOB attribution for one query (second arg via env
        // GRAFT_QJOBS_QUERY, default nnd_converge): callsite + wall per
        // job, warm run — finds where a driver-job-bound query's jobs
        // come from.
        val qn = sys.env.getOrElse("GRAFT_QJOBS_QUERY", "q_sim_knn_nnd_converge")
        noop(SparkEntry.queries(qn)(s, d)); s.catalog.clearCache()
        val jobsLog =
          new java.util.concurrent.ConcurrentHashMap[Int, (String, Long)]()
        val jl = new org.apache.spark.scheduler.SparkListener {
          override def onJobStart(
              j: org.apache.spark.scheduler.SparkListenerJobStart): Unit = {
            val cs = Option(j.properties)
              .flatMap(p => Option(p.getProperty("callSite.short")))
              .getOrElse("?")
            jobsLog.put(j.jobId, (cs, j.time))
          }
          override def onJobEnd(
              j: org.apache.spark.scheduler.SparkListenerJobEnd): Unit = {
            val st = jobsLog.get(j.jobId)
            if (st != null)
              println(f"STATS=qjobs JOB=${j.jobId} MS=${j.time - st._2} " +
                s"SITE=${st._1}")
          }
        }
        s.sparkContext.addSparkListener(jl)
        val t0 = System.nanoTime()
        noop(SparkEntry.queries(qn)(s, d))
        println(f"STATS=qjobs TOTALSEC=${(System.nanoTime() - t0) / 1e9}%.2f")
        s.sparkContext.removeSparkListener(jl)
        s.catalog.clearCache()
      case "qprofile" =>
        // r15 opt-round attribution pass (guide §1): for each residual
        // top-cost bench query, JOBS (driver-scheduled actions), TASKS,
        // and total executor task time vs wall — many-jobs/low-task-time
        // = driver/scheduling-bound (iterative structure), few-jobs/high-
        // task-time = compute-bound (operator work). Second run timed
        // (JIT premium rule); cache cleared like the bench.
        // default set = the r15 opt round's residual top tier; override
        // with GRAFT_QPROFILE (comma-separated query names)
        val profiled = sys.env.get("GRAFT_QPROFILE")
          .map(_.split(',').map(_.trim).filter(_.nonEmpty).toSeq)
          .getOrElse(Seq(
            "q_dedup_lsh_quality", "q_corpus_prepare", "q_graph_kcore",
            "q_graph_bfs", "q_sim_knn_recall_nnd3", "q_sim_knn_nnd_converge",
            "q_sim_graph_beam_recall", "q_sim_graph_beam_batch_stored",
            "q_stream_lsh_sized", "q_stream_lsh_batch",
            "q_text_retrieval_eval", "q_stats_profile", "q_ref_associations",
            "q_pipeline_drug_disease", "q_sim_knn_graph_nnd",
            "q_sim_graph_beam_batch", "q_media_phash_dedup",
            "q_dedup_multipass", "q_sample_cluster_split"))
        profiled.foreach { qn =>
          noop(SparkEntry.queries(qn)(s, d)); s.catalog.clearCache()
          val jobs = new java.util.concurrent.atomic.AtomicLong
          val tasks = new java.util.concurrent.atomic.AtomicLong
          val taskMs = new java.util.concurrent.atomic.AtomicLong
          val jl = new org.apache.spark.scheduler.SparkListener {
            override def onJobStart(
                j: org.apache.spark.scheduler.SparkListenerJobStart): Unit =
              jobs.incrementAndGet()
            override def onTaskEnd(
                t: org.apache.spark.scheduler.SparkListenerTaskEnd): Unit = {
              tasks.incrementAndGet()
              if (t.taskInfo != null)
                taskMs.addAndGet(t.taskInfo.duration)
            }
          }
          s.sparkContext.addSparkListener(jl)
          val t0 = System.nanoTime()
          noop(SparkEntry.queries(qn)(s, d))
          val sec = (System.nanoTime() - t0) / 1e9
          s.sparkContext.removeSparkListener(jl)
          s.catalog.clearCache()
          println(f"STATS=qprofile Q=$qn SEC=$sec%.2f JOBS=${jobs.get} " +
            s"TASKS=${tasks.get} TASKSEC=${taskMs.get / 1000.0}")
        }
      case "qstages" =>
        // r16 per-STAGE attribution for compute-bound queries (guide §1.1
        // "pick the slowest stage"): stage name/callsite, task count, total
        // task-seconds, shuffle read/write bytes — finds the hot OPERATOR
        // where qprofile only says "compute-bound". Warm run (discarded
        // first pass), cache cleared like the bench.
        val qsq = sys.env.getOrElse("GRAFT_QSTAGES_QUERY", "q_dedup_lsh_quality")
        noop(SparkEntry.queries(qsq)(s, d)); s.catalog.clearCache()
        val sl = new org.apache.spark.scheduler.SparkListener {
          override def onStageCompleted(
              e: org.apache.spark.scheduler.SparkListenerStageCompleted): Unit = {
            val si = e.stageInfo
            val tm = si.taskMetrics
            if (tm != null)
              println(f"STATS=qstages STAGE=${si.stageId} " +
                f"TASKS=${si.numTasks} TASKSEC=${tm.executorRunTime / 1000.0}%.2f " +
                f"SHR=${tm.shuffleReadMetrics.totalBytesRead / 1048576.0}%.1fM " +
                f"SHW=${tm.shuffleWriteMetrics.bytesWritten / 1048576.0}%.1fM " +
                s"NAME=${si.name.takeWhile(_ != '\n')} DETAILS=${si.details.linesIterator.drop(1).take(2).mkString("<-").take(180)}")
          }
        }
        s.sparkContext.addSparkListener(sl)
        val tq0 = System.nanoTime()
        noop(SparkEntry.queries(qsq)(s, d))
        println(f"STATS=qstages Q=$qsq TOTALSEC=${(System.nanoTime() - tq0) / 1e9}%.2f")
        s.sparkContext.removeSparkListener(sl)
        s.catalog.clearCache()
      case "lshqsplit" =>
        // r16: decompose q_dedup_lsh_quality's wall (VERDICT item 2) into
        // its pipeline pieces — shingle build, prefix-filter candidates,
        // exact verify tail, minhash+banded candidates — each timed over a
        // fresh cache (comma-batch semantics), warmups discarded.
        import graft.llm.Dedup
        val docsL = graft.ops.Core.table(s, d, "documents")
        def shL() = Dedup.shingleTable(docsL, "doc_id", "text", 3).cache()
        // untimed warmup of the whole query once
        noop(SparkEntry.queries("q_dedup_lsh_quality")(s, d)); s.catalog.clearCache()
        (1 to 2).foreach { i =>
          timed(s"sh_only_$i") { noop(shL()) }
          timed(s"prefix_pairs_$i") {
            val sh = shL()
            noop(Dedup.prefixFilterPairs(sh, "doc_id", 1, 2))
          }
          timed(s"exact_truth_$i") {
            val sh = shL()
            noop(Dedup.exactSimilarPairs(sh, "doc_id", 1, 2))
          }
          timed(s"minhash_cand_$i") {
            val sh = shL()
            val sigs = Dedup.minhashSigsFromShingles(sh, "doc_id", graft.queries.LlmOps.MinhashSeeds)
            noop(Dedup.lshCandidatePairs(sigs, "doc_id", 4, 2))
          }
          timed(s"full_$i") {
            noop(SparkEntry.queries("q_dedup_lsh_quality")(s, d))
          }
        }
      case "prefixsplit" =>
        // r16: inside exactSimilarPairs(τ=1/2) — windows vs prefix join vs
        // verify tail. Replicates prefixFilterPairs' internals verbatim.
        import graft.llm.Dedup
        import org.apache.spark.sql.expressions.Window
        val docsP = graft.ops.Core.table(s, d, "documents")
        def shP() = Dedup.shingleTable(docsP, "doc_id", "text", 3).cache()
        def preP(sh: DataFrame, tauNum: Long, tauDen: Long): DataFrame = {
          val withDf = sh.select(col("doc_id"), col("w"),
            count(lit(1)).over(Window.partitionBy(col("w"))).as("df"))
          withDf
            .select(col("doc_id"), col("w"), col("df"),
              row_number().over(
                Window.partitionBy(col("doc_id")).orderBy(col("df"), col("w")))
                .cast("long").as("pos"),
              count(lit(1)).over(Window.partitionBy(col("doc_id"))).as("n"))
            .where(col("pos") <= col("n") + lit(1L) -
              floor((lit(tauNum) * col("n") + lit(tauDen - 1)) / lit(tauDen))
                .cast("long"))
        }
        noop(SparkEntry.queries("q_dedup_lsh_quality")(s, d)); s.catalog.clearCache()
        (1 to 2).foreach { i =>
          timed(s"windows_pre_$i") { noop(preP(shP(), 1, 2)) }
          timed(s"prefix_join_$i") { noop(Dedup.prefixFilterPairs(shP(), "doc_id", 1, 2)) }
          timed(s"verify_tail_$i") { noop(Dedup.exactSimilarPairs(shP(), "doc_id", 1, 2)) }
          timed(s"count_pairs_$i") {
            val n = Dedup.prefixFilterPairs(shP(), "doc_id", 1, 2).count()
            val nsh = shP().count()
            println(s"STATS=prefixsplit NPAIRS=$n NSH=$nsh")
          }
        }
      case "exactsimform" =>
        // r16 A/B over exactSimilarPairs' verify tail (τ=1/2, the
        // lsh_quality truth): (a) shipped relational verify; (b) n carried
        // out of the prefix join (sizes groupBy + 2 joins deleted);
        // (c) b + broadcast-gram-array verify (array_intersect against
        // sort_array(collect_list(w)) per doc — exact, map-only at
        // broadcast scale). Alternating, both arms warmed.
        import graft.llm.Dedup
        import org.apache.spark.sql.expressions.Window
        val docsE = graft.ops.Core.table(s, d, "documents")
        def shE() = Dedup.shingleTable(docsE, "doc_id", "text", 3).cache()
        def preE(sh: DataFrame, tauNum: Long, tauDen: Long): DataFrame = {
          val withDf = sh.select(col("doc_id"), col("w"),
            count(lit(1)).over(Window.partitionBy(col("w"))).as("df"))
          withDf
            .select(col("doc_id"), col("w"), col("df"),
              row_number().over(
                Window.partitionBy(col("doc_id")).orderBy(col("df"), col("w")))
                .cast("long").as("pos"),
              count(lit(1)).over(Window.partitionBy(col("doc_id"))).as("n"))
            .where(col("pos") <= col("n") + lit(1L) -
              floor((lit(tauNum) * col("n") + lit(tauDen - 1)) / lit(tauDen))
                .cast("long"))
        }
        def pairsN(sh: DataFrame, tauNum: Long, tauDen: Long): DataFrame = {
          val pre = preE(sh, tauNum, tauDen)
          val alpha = floor(
            (lit(tauNum) * (col("a.n") + col("b.n")) + lit(tauNum + tauDen - 1)) /
              lit(tauNum + tauDen)).cast("long")
          pre.as("a").join(pre.as("b"),
              col("a.w") === col("b.w") &&
                col("a.doc_id") < col("b.doc_id") &&
                lit(tauDen) * least(col("a.n"), col("b.n")) >=
                  lit(tauNum) * greatest(col("a.n"), col("b.n")) &&
                lit(1L) + least(col("a.n") - col("a.pos"),
                  col("b.n") - col("b.pos")) >= alpha)
            .select(col("a.doc_id").as("doc1"), col("b.doc_id").as("doc2"),
              col("a.n").as("n_a"), col("b.n").as("n_b"))
            .distinct()
        }
        def verifyB(sh: DataFrame, tauNum: Long, tauDen: Long): DataFrame = {
          val pairs = pairsN(sh, tauNum, tauDen)
          val inter = pairs
            .join(sh.as("x"), col("doc1") === col("x.doc_id"))
            .join(sh.as("y"),
              col("doc2") === col("y.doc_id") && col("x.w") === col("y.w"))
            .groupBy(col("doc1"), col("doc2"), col("n_a"), col("n_b"))
            .agg(count(lit(1)).as("n_inter"))
          inter
            .where(lit(tauDen) * col("n_inter") >=
              lit(tauNum) * (col("n_a") + col("n_b") - col("n_inter")))
            .select(col("doc1"), col("doc2"), col("n_a"), col("n_b"),
              col("n_inter"),
              round(col("n_inter").cast("double") /
                (col("n_a") + col("n_b") - col("n_inter")), 6).as("jacc"))
        }
        def verifyC(sh: DataFrame, tauNum: Long, tauDen: Long): DataFrame = {
          val pairs = pairsN(sh, tauNum, tauDen)
          val g = sh.groupBy(col("doc_id"))
            .agg(sort_array(collect_list(col("w"))).as("ws"))
          pairs
            .join(broadcast(g.select(col("doc_id").as("doc1"), col("ws").as("wa"))), Seq("doc1"))
            .join(broadcast(g.select(col("doc_id").as("doc2"), col("ws").as("wb"))), Seq("doc2"))
            .select(col("doc1"), col("doc2"), col("n_a"), col("n_b"),
              size(array_intersect(col("wa"), col("wb"))).cast("long").as("n_inter"))
            .where(lit(tauDen) * col("n_inter") >=
              lit(tauNum) * (col("n_a") + col("n_b") - col("n_inter")))
            .select(col("doc1"), col("doc2"), col("n_a"), col("n_b"),
              col("n_inter"),
              round(col("n_inter").cast("double") /
                (col("n_a") + col("n_b") - col("n_inter")), 6).as("jacc"))
        }
        // value check once: all three forms emit identical row sets
        {
          val sh = shE()
          val a = Dedup.exactSimilarPairs(sh, "doc_id", 1, 2)
          val b = verifyB(sh, 1, 2)
          val c = verifyC(sh, 1, 2)
          val ab = a.exceptAll(b).count() + b.exceptAll(a).count()
          val ac = a.exceptAll(c).count() + c.exceptAll(a).count()
          println(s"STATS=exactsimform AB_DIFF=$ab AC_DIFF=$ac NA=${a.count()}")
          s.catalog.clearCache()
        }
        (1 to 3).foreach { i =>
          timed(s"verify_a_$i") { noop(Dedup.exactSimilarPairs(shE(), "doc_id", 1, 2)) }
          timed(s"verify_b_$i") { noop(verifyB(shE(), 1, 2)) }
          timed(s"verify_c_$i") { noop(verifyC(shE(), 1, 2)) }
        }
        locally {
          val sh = shE()
          val pre = preE(sh, 1, 2)
          val alpha = floor(
            (lit(1L) * (col("a.n") + col("b.n")) + lit(1L + 2L - 1L)) /
              lit(1L + 2L)).cast("long")
          val raw = pre.as("a").join(pre.as("b"),
              col("a.w") === col("b.w") &&
                col("a.doc_id") < col("b.doc_id") &&
                lit(2L) * least(col("a.n"), col("b.n")) >=
                  lit(1L) * greatest(col("a.n"), col("b.n")) &&
                lit(1L) + least(col("a.n") - col("a.pos"),
                  col("b.n") - col("b.pos")) >= alpha)
          println(s"STATS=exactsimform RAWJOIN=${raw.count()} PRE=${pre.count()}")
          s.catalog.clearCache()
        }
      case "contspread" =>
        // r16 (VERDICT item 4): q_dedup_containment rode the r15 13-query
        // spread batch without an individual probe and the driver bench
        // read it ×0.75. A/B the full containment pipeline with and
        // without the spread (shingleTable's own spreadInput toggled too
        // — the outer Core.spread was redundant with it). Alternating,
        // both arms warmed.
        import graft.llm.Dedup
        val docsC = graft.ops.Core.table(s, d, "documents")
        def contArm(spreadIn: Boolean): DataFrame = {
          val sh = Dedup.shingleTable(docsC, "doc_id", "text", 3,
            spreadInput = spreadIn).cache()
          val sigs = Dedup.minhashSigsFromShingles(sh, "doc_id",
            graft.queries.LlmOps.MinhashSeeds)
          val pairs = Dedup
            .lshCandidatePairs(sigs, "doc_id", bands = 4, rowsPerBand = 2)
            .select(col("doc1"), col("doc2"))
          Dedup.containmentForPairs(pairs, sh, "doc_id")
        }
        noop(contArm(false)); s.catalog.clearCache()
        noop(contArm(true)); s.catalog.clearCache()
        (1 to 3).foreach { i =>
          timed(s"cont_raw$i") { noop(contArm(false)) }
          timed(s"cont_spread$i") { noop(contArm(true)) }
        }
      case "mpsplit" =>
        // r16: decompose q_dedup_multipass (the suite's largest task-sec
        // number, 141) — shingle cache, LSH cand, SNM cand, union verify,
        // components — each over a fresh cache, warmup discarded.
        import graft.llm.Dedup
        import org.apache.spark.sql.expressions.Window
        val docsM = graft.ops.Core.table(s, d, "documents")
        def shM() = Dedup.shingleTable(docsM, "doc_id", "text", 3).cache()
        def lshM(sh: DataFrame) = Dedup.lshCandidatePairs(
            Dedup.minhashSigsFromShingles(sh, "doc_id",
              graft.queries.LlmOps.MinhashSeeds), "doc_id", 4, 2)
          .select(col("doc1"), col("doc2"))
        def snmM() = {
          val rn = docsM.select(col("doc_id"), col("lang"),
              substring(col("text"), 1, 8).as("blk"), col("text"))
            .select(col("doc_id"), col("lang"), col("blk"),
              row_number().over(Window.partitionBy(col("lang"), col("blk"))
                .orderBy(col("text"), col("doc_id"))).cast("long").as("rn"))
          rn.as("a").join(rn.as("b"),
              col("a.lang") === col("b.lang") && col("a.blk") === col("b.blk") &&
                col("b.rn") > col("a.rn") && col("b.rn") <= col("a.rn") + lit(3L))
            .select(least(col("a.doc_id"), col("b.doc_id")).as("doc1"),
              greatest(col("a.doc_id"), col("b.doc_id")).as("doc2"))
        }
        noop(SparkEntry.queries("q_dedup_multipass")(s, d)); s.catalog.clearCache()
        (1 to 2).foreach { i =>
          timed(s"mp_lsh_$i") { noop(lshM(shM())) }
          timed(s"mp_snm_$i") { noop(snmM()) }
          timed(s"mp_cand_count_$i") {
            val sh = shM()
            val n = lshM(sh).unionByName(snmM()).distinct().count()
            println(s"STATS=mpsplit NCAND=$n")
          }
          timed(s"mp_verify_$i") {
            val sh = shM()
            val cand = lshM(sh).unionByName(snmM()).distinct()
            noop(Dedup.jaccardForPairs(cand, sh, "doc_id")
              .where(col("jaccard") >= 0.5).select(col("doc1"), col("doc2")))
          }
          timed(s"mp_full_$i") {
            noop(SparkEntry.queries("q_dedup_multipass")(s, d))
          }
        }
      case "cpsplit" =>
        // r16 (VERDICT item 5): decompose q_corpus_prepare — quality gate
        // + exact dedup (the survivors checkpoint), minhash+LSH pairs,
        // components, keeper resolution + final agg.
        import graft.llm.{Dedup, TextOps}
        import graft.queries.LlmOps.{MinhashSeeds, Stopwords}
        def survivorsCp(): DataFrame = graft.ops.Core
          .spread(graft.ops.Core.table(s, d, "documents"))
          .select(col("doc_id"), col("lang"), col("n_chars"), col("text"),
            TextOps.tokens(col("text")).as("toks"))
          .select(col("doc_id"), col("lang"), col("n_chars"), col("text"),
            size(col("toks")).cast("long").as("n_tokens"),
            round((length(col("text")) - size(col("toks")) + 1).cast("double")
              / size(col("toks")), 4).as("avg_token_len"),
            round(size(filter(col("toks"), t => t.isInCollection(Stopwords)))
              .cast("double") / size(col("toks")), 6).as("stopword_ratio"))
          .where(col("n_tokens").between(10, 1000) &&
            col("avg_token_len").between(2.0, 12.0) &&
            col("stopword_ratio") > 0.0)
          .groupBy(md5(col("text")).as("text_md5"))
          .agg(expr("min_by(struct(doc_id, lang, n_chars, text), doc_id)").as("r"))
          .select(col("r.doc_id").as("doc_id"), col("r.lang").as("lang"),
            col("r.n_chars").as("n_chars"), col("r.text").as("text"))
          .repartition(col("doc_id"))
          .localCheckpoint()
        noop(SparkEntry.queries("q_corpus_prepare")(s, d)); s.catalog.clearCache()
        (1 to 2).foreach { i =>
          timed(s"cp_survivors_$i") { survivorsCp() }
          timed(s"cp_pairs_$i") {
            val sv = survivorsCp()
            val sigs = Dedup.minhashSigs(sv, "doc_id", "text", 3, MinhashSeeds)
            noop(Dedup.lshCandidatePairs(sigs, "doc_id", 4, 2)
              .where(col("est_jaccard") >= 0.5)
              .select(col("doc1"), col("doc2")))
          }
          timed(s"cp_components_$i") {
            val sv = survivorsCp()
            val sigs = Dedup.minhashSigs(sv, "doc_id", "text", 3, MinhashSeeds)
            val pairs = Dedup.lshCandidatePairs(sigs, "doc_id", 4, 2)
              .where(col("est_jaccard") >= 0.5)
              .select(col("doc1"), col("doc2")).cache()
            noop(Dedup.components(pairs, iters = 4))
          }
          timed(s"cp_full_$i") {
            noop(SparkEntry.queries("q_corpus_prepare")(s, d))
          }
        }
      case "iterpersist" =>
        // r16: persist vs localCheckpoint for the iterated edge cache of
        // pagerank and label_prop (the kcore fix generalized — but these
        // two loops reference the edge frame only ONCE per round, so the
        // re-analysis saving may not pay the eager checkpoint write).
        // Alternating same-JVM, both arms warmed, full query lineage.
        import org.apache.spark.storage.StorageLevel
        def prEdges() = {
          val li = graft.ops.Core.table(s, d, "lineitem")
            .select(col("l_suppkey").as("src"),
              (col("l_partkey") + 1000000L).as("dst"))
          li.union(li.select(col("dst").as("src"), col("src").as("dst")))
            .distinct()
        }
        def lpEdges() = {
          val occ = graft.ops.Core.table(s, d, "events")
            .select(expr("unix_timestamp(ts) div 300").as("win"),
              col("event_type"), col("user_id"))
            .distinct()
          val eG = occ.as("a")
            .join(occ.as("b"),
              col("a.win") === col("b.win") &&
                col("a.event_type") === col("b.event_type") &&
                col("a.user_id") < col("b.user_id"))
            .select(col("a.user_id").as("src"), col("b.user_id").as("dst"))
            .distinct()
          eG.union(eG.select(col("dst").as("src"), col("src").as("dst")))
        }
        def prPersist(): DataFrame = {
          val e = prEdges().select(col("src"), col("dst"))
            .repartition(col("src")).persist(StorageLevel.MEMORY_AND_DISK)
          val deg = e.groupBy(col("src").as("node")).agg(count(lit(1)).as("deg"))
          val consts = deg.agg(count(lit(1)).as("n"))
            .select(expr("CAST(150000000 DIV n AS BIGINT)").as("base"),
              expr("CAST(1000000000 DIV n AS BIGINT)").as("s0"))
          val degc = deg.crossJoin(broadcast(consts))
            .persist(StorageLevel.MEMORY_AND_DISK)
          var score = degc
            .select(col("node"), col("deg"), col("base"), col("s0").as("score"))
          for (_ <- 1 to 3) {
            val m = score.join(e, score("node") === e("src"))
              .select(col("dst").as("node"), expr("score DIV deg").as("c"))
              .groupBy(col("node")).agg(sum(col("c")).as("m"))
            score = m.join(degc, Seq("node"))
              .select(col("node"), col("deg"), col("base"),
                (col("base") + expr("85 * m DIV 100")).as("score"))
          }
          score.select(col("node"), col("score").as("pr_fixed"))
        }
        (1 to 3).foreach { i =>
          if (i > 1) timed(s"pr_persist$i") { noop(prPersist()) }
          else { noop(prPersist()); s.catalog.clearCache() }
          if (i > 1) timed(s"pr_ckpt$i") { noop(graft.ops.Graph.pagerankFixed(prEdges(), 3)) }
          else { noop(graft.ops.Graph.pagerankFixed(prEdges(), 3)); s.catalog.clearCache() }
          if (i > 1) timed(s"lp_ckpt$i") { noop(graft.ops.Graph.labelPropagation(lpEdges(), 3)) }
          else { noop(graft.ops.Graph.labelPropagation(lpEdges(), 3)); s.catalog.clearCache() }
        }
      case "mediaspread" =>
        // r15 opt-round A/B: is Core.spread worth it on each media codec
        // spec frame? Per-row codec cost spans ~3 orders of magnitude
        // across the family (WAV header+PCM synth ~µs/row vs PNG
        // encode+decode+NN-resize+re-encode ~100s of µs/row), so the
        // §2.5 "per-row compute ≫ row width" test may pass for some and
        // fail for others. Alternating same-JVM runs, untimed warmups of
        // BOTH arms first (fixed-order premium rule).
        import s.implicits._
        val docs = graft.ops.Core.table(s, d, "documents")
        def specBase(raw: Boolean) =
          if (raw) docs else graft.ops.Core.spread(docs)
        def arm(nm: String, raw: Boolean): DataFrame = nm match {
          case "png" => graft.llm.Multimodal.pngRoundTrip(
            specBase(raw).select(
              col("doc_id").as("media_id"),
              (lit(16) + col("doc_id") % 16).cast("int").as("width"),
              (lit(16) + col("n_chars") % 16).cast("int").as("height"),
              (((col("doc_id") % lit(16777216L)) * lit(2654435761L)) %
                lit(16777216L)).cast("int").as("rgb"))
              .as[graft.llm.Multimodal.ImageSpec]).toDF()
          case "wavrt" => graft.llm.Multimodal.wavRoundTrip(
            specBase(raw).select(
              col("doc_id").as("media_id"),
              (lit(8000) + (col("doc_id") % 3) * 4000).cast("int")
                .as("sample_rate"),
              (lit(64) + col("n_chars") % 192).cast("int").as("n_samples"))
              .as[graft.llm.Multimodal.AudioSpec]).toDF()
          case "wavf" => graft.llm.Multimodal.wavFeatures(
            specBase(raw).select(
              col("doc_id").as("media_id"),
              (lit(8000) + (col("doc_id") % 3) * 4000).cast("int")
                .as("sample_rate"),
              (lit(64) + col("n_chars") % 192).cast("int").as("n_samples"))
              .as[graft.llm.Multimodal.AudioSpec]).toDF()
          case "gif" => graft.llm.Multimodal.gifFramesRoundTrip(
            specBase(raw).select(
              col("doc_id").as("media_id"),
              (lit(2) + col("doc_id") % 6).cast("int").as("width"),
              (lit(2) + col("n_chars") % 4).cast("int").as("height"),
              (lit(2) + col("doc_id") % 3).cast("int").as("n_frames"))
              .as[graft.llm.Multimodal.VideoSpec]).toDF()
          case "phash" => graft.llm.Multimodal.phashRoundTrip(
            specBase(raw).select(
              col("doc_id").as("media_id"),
              graft.ops.Core.md5Hash64(
                expr("(doc_id div 8)").cast("string")).as("pat"),
              ((col("doc_id") % 8) * 7 % 60).cast("int").as("flip_pos"))
              .as[graft.llm.Multimodal.PhashSpec]).toDF()
          case "resize" => graft.llm.Multimodal.resizeRoundTrip(
            specBase(raw).select(
              col("doc_id").as("media_id"),
              graft.ops.Core.md5Hash64(col("doc_id").cast("string"))
                .as("pat"),
              ((col("doc_id") * 7) % 60).cast("int").as("flip_pos"))
              .as[graft.llm.Multimodal.PhashSpec], k = 3).toDF()
        }
        Seq("png", "wavrt", "wavf", "gif", "phash", "resize").foreach { nm =>
          noop(arm(nm, raw = true)); noop(arm(nm, raw = false))
          (1 to 3).foreach { i =>
            timed(s"${nm}_raw$i") { noop(arm(nm, raw = true)) }
            timed(s"${nm}_spread$i") { noop(arm(nm, raw = false)) }
          }
        }
      case other => println(s"PROBE=$other SKIPPED=unknown")
    }
    s.stop()
  }
}
