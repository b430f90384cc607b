package graft

import org.scalatest.funsuite.AnyFunSuite

/** Plan-shape regression guard: the physical plans of every gate query
  * are built (not run) against sf0.001 and checked for the shapes that
  * must not silently regress at 100 TB:
  *
  *  - no CartesianProduct anywhere;
  *  - BroadcastNestedLoopJoin only where it is the declared design:
  *    sim_topk (broadcast bounded query vectors against the corpus),
  *    dedup_embedding (the exact all-pairs verification baseline; the
  *    LSH twin is the scale path). The CEP rule fan-out is NOT in this
  *    set anymore: the pivot-key spelling makes it a BroadcastHashJoin
  *    (O(M·R) predicate loop → O(M + matches) hash probes);
  *  - every one-pass/static CEP plan shuffles exactly once (the hash
  *    aggregation keyed like the reference's keyBy(groupId)); the
  *    stateless parse queries shuffle zero times. This pins both the
  *    single-shuffle promise AND that first-event alignment's window
  *    function reuses the aggregation's partitioning instead of adding
  *    an exchange.
  */
class PlanShapeSpec extends AnyFunSuite {
  private lazy val spark = SparkTestSession.spark

  private val sfDir = "/root/testdata/sf0.001"

  private lazy val plans: Map[String, String] =
    (SparkEntry.queries ++ SparkEntry.benchOnly).map { case (name, fn) =>
      name -> fn(spark, sfDir).queryExecution.executedPlan.toString
    }

  // sim_topk / dedup_embedding: broadcast bounded-build designs (see
  // class doc). profile_hot_keys / text_lm_score: a ONE-ROW broadcast
  // scalar (corpus total) cross-joined onto k winner rows / per-doc
  // aggregates — bounded by construction, not a data-path nested loop.
  // tfidf/bm25: the same one-row corpus-stats broadcast (N, avgdl).
  private val declaredBnlj =
    Set("sim_topk", "dedup_embedding", "profile_hot_keys", "text_lm_score",
      "text_tfidf", "text_tfidf_prod", "text_bm25_prod", "text_source_terms")

  test("the CEP rule fan-out is a broadcast HASH join on the pivot key") {
    for (q <- Seq("cep_multi_rule", "cep_multi_rule_first_aligned")) {
      assert(plans(q).contains("BroadcastHashJoin"),
        s"$q lost the hash-joinable pivot-key fan-out")
    }
  }

  test("no gate query plans a CartesianProduct") {
    val offenders = plans.collect {
      case (n, p) if p.contains("CartesianProduct") => n
    }
    assert(offenders.isEmpty, s"cartesian plans: $offenders")
  }

  test("BroadcastNestedLoopJoin appears exactly in the declared bounded-build queries") {
    val actual = plans.collect {
      case (n, p) if p.contains("BroadcastNestedLoopJoin") => n
    }.toSet
    assert(actual == declaredBnlj,
      s"BNLJ set drifted: got $actual, declared $declaredBnlj")
  }

  test("scans are column-pruned (projection reaches the parquet ReadSchema)") {
    def readSchemas(name: String): Seq[String] =
      "ReadSchema: ([^\\n]*)".r.findAllMatchIn(plans(name)).map(_.group(1)).toSeq
    // A 2-column projection must scan 2 columns, not the whole table.
    assert(readSchemas("text_tokens").forall(_.startsWith("struct<doc_id:bigint,text:string>")))
    assert(readSchemas("dedup_exact").forall(_.startsWith("struct<doc_id:bigint,text:string>")))
    assert(readSchemas("sim_topk").forall(_.startsWith("struct<vec_id:bigint,embedding:array<float>>")))
    // Wide tables: the unused columns must not reach the scan.
    assert(readSchemas("tpch_pricing").forall(s =>
      !s.contains("l_comment") && !s.contains("l_shipdate") && !s.contains("l_orderkey")))
    assert(readSchemas("join_topk_revenue").forall(s =>
      !s.contains("l_comment") && !s.contains("o_orderdate") && !s.contains("c_address")))
    // The metric adapter needs ts/event_type/user_id/value — but never
    // event_id, which must be pruned through the tag/measure maps.
    assert(readSchemas("cep_sum_tumbling_gt").forall(!_.contains("event_id")))
  }

  test("per-document text/curation projections plan ZERO exchanges") {
    // These carry the zero-shuffle design claim: per-doc statistics
    // computed by native expressions, never by explode→groupBy (which
    // would shuffle every gram occurrence of a 100 TB corpus). A
    // reintroduced aggregation or join here is an architecture
    // regression, not a tuning choice.
    val zeroShuffle = Seq("text_repetition", "curation_filter",
      "text_quality", "text_tokens", "text_langid", "text_langid_ngram",
      "text_fingerprint", "text_redact", "text_compress_ratio",
      "curation_sample", "curation_split", "curation_mixture",
      "mm_features", "mm_resize", "text_classifier_score")
    for (q <- zeroShuffle) {
      val n = "Exchange".r.findAllIn(plans(q)).size
      assert(n == 0, s"$q plans $n Exchange nodes; expected a pure projection")
    }
  }

  test("line-dedup winner selection map-side-combines (skew-safety plan pin)") {
    // The hot-boilerplate-line safety claim is a PLAN property: the
    // first-occurrence winner must be a partial-aggregated min (at most
    // one candidate per distinct line leaves each map task) — never a
    // window, which would colocate and sort every copy of a hot line
    // on one task. A partial_min below the line exchange is the proof;
    // a plan without it is the regression this test exists to catch.
    assert(plans("text_line_dedup").contains("partial_min"),
      s"expected map-side partial_min in:\n${plans("text_line_dedup")}")
    assert(!plans("text_line_dedup").contains("RunningWindowFunction") &&
      !plans("text_line_dedup").contains("Window ["),
      "line dedup must not use a window over the line key")
  }

  test("span dedup: combinable gram aggregate, one sort for both island windows") {
    for (q <- Seq("text_span_dedup", "text_span_cut")) {
      val plan = plans(q)
      // The cross-doc gram test must stay min/max (partial-aggregated:
      // two longs per gram leave each map task) — a countDistinct
      // spelling would shuffle a distinct-set per gram.
      assert(plan.contains("partial_min") && plan.contains("partial_max"),
        s"$q: expected map-side partial min/max gram aggregate in:\n$plan")
      // lag + running-sum islands must share ONE (doc_id, pos) sort;
      // a second Sort means the windows stopped chaining.
      val sorts = "(?m)^\\s*[+:]?-?\\s*\\*?\\(?\\d*\\)?\\s*Sort ".r
        .findAllIn(plan).size
      assert(sorts <= 1, s"$q: expected at most one Sort, got $sorts in:\n$plan")
    }
  }

  test("hotKeys computes its total from the counts frame via AQE exchange reuse (one input pass)") {
    // The share denominator re-aggregates the groupBy output instead of
    // re-scanning the raw input; the two plan branches sit on the same
    // canonical exchange and AQE's stage reuse must fuse them (the
    // static plan shows two scans — only the FINAL adaptive plan
    // proves the single pass, so this pin executes the query).
    import org.apache.spark.sql.functions.col
    val ev = spark.read.parquet(s"$sfDir/events.parquet")
    val hk = graft.ops.Profiling.hotKeys(ev, col("user_id"), 5)
    val qe = hk.queryExecution
    qe.toRdd.count()
    assert(qe.executedPlan.toString.contains("ReusedExchange"),
      s"hotKeys total branch no longer reuses the counts exchange:\n${qe.executedPlan}")
  }

  test("sourceOverlap's two aggregates share one corpus join via AQE exchange reuse") {
    // gramPairs and docHits both consume the same sh-join-gs subtree;
    // the corpus must be tokenized/shuffled once, with the second
    // consumer reading the reused exchange (final adaptive plan only).
    val docs = spark.read.parquet(s"$sfDir/documents.parquet")
    val qe = graft.ops.Profiling.sourceOverlap(docs, n = 3).queryExecution
    qe.toRdd.count()
    assert(qe.executedPlan.toString.contains("ReusedExchange"),
      s"sourceOverlap lost the shared-join exchange reuse:\n${qe.executedPlan}")
  }

  test("rolling index append derives every artifact from the batch alone (no base-index scan)") {
    // appendToDedupIndex's 100 TB contract: appending a day's survivors
    // re-scans NOTHING of the accumulated index — its three write jobs
    // read only the batch (the sole index read in the append path is
    // the one-row params guard). Pin: each artifact frame plans exactly
    // one parquet scan, and it is the batch table, never an index
    // artifact directory.
    import org.apache.spark.sql.functions.col
    val docs = spark.read.parquet(s"$sfDir/documents.parquet")
      .select(col("doc_id"), col("text"))
    val (sh, sig, banded) =
      graft.ops.Dedup.indexArtifactFrames(docs, 3, 64, 16, 64)
    for ((f, nm) <- Seq((sh, "shingles"), (sig, "sigs"), (banded, "bands"))) {
      val plan = f.queryExecution.executedPlan.toString
      val scans = "Scan parquet".r.findAllIn(plan).size
      assert(scans == 1, s"append artifact $nm plans $scans parquet scans:\n$plan")
      assert(plan.contains("documents.parquet"),
        s"append artifact $nm does not scan the batch table:\n$plan")
      for (art <- Seq("/shingles", "/sigs", "/bands"))
        assert(!plan.contains(art),
          s"append artifact $nm re-scans the base index ($art):\n$plan")
    }
  }

  test("bench-only queries produce rows (a silently-empty bench row times nothing)") {
    for ((name, fn) <- SparkEntry.benchOnly) {
      assert(fn(spark, sfDir).count() > 0, s"$name returned no rows at $sfDir")
    }
  }

  test("window/temporal gate plans shuffle minimally") {
    def exchanges(q: String): Int =
      "Exchange hashpartitioning".r.findAllIn(plans(q)).size
    // Sessionize + trailing agg: both window frames share one keyed
    // exchange — a second exchange means the two frames stopped
    // sharing a window spec.
    assert(exchanges("events_sessionize") == 1,
      s"events_sessionize: ${exchanges("events_sessionize")} exchanges")
    assert(exchanges("events_trailing") == 1,
      s"events_trailing: ${exchanges("events_trailing")} exchanges")
    // As-of: ONE exchange for the union window + one for the
    // right-side pre-aggregation — the operator's one-shuffle promise.
    assert(exchanges("join_asof") == 2,
      s"join_asof: ${exchanges("join_asof")} exchanges")
  }

  test("CEP plans shuffle exactly once (parse queries: zero)") {
    val shuffleCounts = plans.view.filterKeys(_.startsWith("cep_")).mapValues(p =>
      "Exchange hashpartitioning".r.findAllIn(p).size).toMap
    shuffleCounts.foreach { case (name, n) =>
      val expected = if (name.startsWith("cep_parse")) 0 else 1
      assert(n == expected, s"$name: $n shuffle exchanges, expected $expected")
    }
  }
}
