package graft.ops

import graft.SparkSpec
import org.apache.spark.sql.functions._

/** Text analysis: token counting, quality features, language-ID,
  * fingerprinting. */
class TextStatsSpec extends SparkSpec {
  import spark.implicits._

  test("token counts: whitespace and bpe-ish") {
    val df = Seq((1L, "Hello, world! 42 times")).toDF("doc_id", "text")
    val r = df.select(
      TextStats.tokenCount(col("text")).as("ws"),
      TextStats.bpeishTokenCount(col("text")).as("bpe")).collect().head
    assert(r.getInt(0) == 4) // Hello, | world! | 42 | times
    // Hello , world ! 4 2 times → 7
    assert(r.getInt(1) == 7)
  }

  test("assignSplit: exact partition, content-keyed, dup-safe, roughly proportional") {
    val docs = Tables.documents(spark, sfDir)
    val out = TextStats.assignSplit(docs).select("doc_id", "bucket", "split").collect()
    assert(out.length == docs.count())
    out.foreach { r =>
      val b = r.getLong(1); val s = r.getString(2)
      assert(b >= 0 && b < 100)
      assert(s == (if (b < 80) "train" else if (b < 90) "val" else "test"))
    }
    // hash-uniformity sanity on ~500 docs: train well clear of val+test
    val byS = out.groupBy(_.getString(2)).view.mapValues(_.length).toMap
    assert(byS.getOrElse("train", 0) > out.length / 2, byS.toString)
    // content-keyed: identical text always lands in the same split, so
    // exact dups can never straddle train/test
    val dup = Seq((1L, "same text here"), (2L, "same text here")).toDF("doc_id", "text")
    val splits = TextStats.assignSplit(dup).select("split").collect().map(_.getString(0))
    assert(splits(0) == splits(1))
  }

  test("assignSplitByComponent: near-dup clusters co-locate; singletons match assignSplit") {
    val docs = Tables.documents(spark, sfDir)
    val pairs = Dedup.ngramJaccard(docs, threshold = 0.5)
    assert(pairs.count() > 0, "fixture has no near-dup pairs — test is vacuous")
    val asg = TextStats.assignSplitByComponent(docs, pairs)
    assert(asg.count() == docs.count())
    // the property t7 cannot give: both ends of every near-dup pair (and
    // transitively, every component) get one split
    val straddlers = pairs
      .join(asg.select(col("doc_id").as("doc_a"), col("split").as("sa")), Seq("doc_a"))
      .join(asg.select(col("doc_id").as("doc_b"), col("split").as("sb")), Seq("doc_b"))
      .filter(col("sa") =!= col("sb")).count()
    assert(straddlers == 0L, s"$straddlers near-dup pairs straddle splits")
    val compSplits = asg.groupBy("component")
      .agg(countDistinct("split").as("ns")).filter(col("ns") > 1).count()
    assert(compSplits == 0L, "a component spans multiple splits")
    // docs in no pair keep their own-content t7 assignment exactly
    val inPair = pairs.select(col("doc_a").as("doc_id"))
      .union(pairs.select(col("doc_b").as("doc_id"))).distinct()
    val lone = asg.join(inPair, Seq("doc_id"), "left_anti")
      .select(col("doc_id"), col("bucket").as("cb"), col("split").as("cs"))
    val mismatches = TextStats.assignSplit(docs)
      .select(col("doc_id"), col("bucket"), col("split"))
      .join(lone, Seq("doc_id"))
      .filter(col("bucket") =!= col("cb") || col("split") =!= col("cs")).count()
    assert(mismatches == 0L, "a singleton's split differs from assignSplit")
  }

  test("scrubPii: emails and phones replaced, counts exact, clean text untouched") {
    val df = Seq(
      (1L, "contact alice.smith+spam@example.co.uk or call 555-123-4567 now"),
      (2L, "two mails a@b.io c@d.org and 800.555.1212"),
      (3L, "no pii here, just 12345 and version 2.0")
    ).toDF("doc_id", "text")
    val out = TextStats.scrubPii(df).orderBy("doc_id")
      .select("n_emails", "n_phones", "scrubbed").collect()
    assert(out(0).getLong(0) == 1 && out(0).getLong(1) == 1)
    assert(out(0).getString(2) == "contact <EMAIL> or call <PHONE> now")
    assert(out(1).getLong(0) == 2 && out(1).getLong(1) == 1)
    assert(out(1).getString(2) == "two mails <EMAIL> <EMAIL> and <PHONE>")
    assert(out(2).getLong(0) == 0 && out(2).getLong(1) == 0)
    assert(out(2).getString(2) == "no pii here, just 12345 and version 2.0")
  }

  test("repetitionSignals: known fractions, degenerate docs get 0") {
    val df = Seq(
      (1L, "a a a a"),          // 1 distinct of 4 tokens; bigrams: "a a"×3 → 1 of 3
      (2L, "w x y z"),          // no repetition
      (3L, "one"),              // single token: no bigrams
      (4L, "")                  // no tokens at all
    ).toDF("doc_id", "text")
    val out = TextStats.repetitionSignals(df).orderBy("doc_id")
      .select("dup_token_frac", "dup_2gram_frac").collect()
    assert(out(0).getDouble(0) == 0.75 && math.abs(out(0).getDouble(1) - 0.666667) < 1e-9)
    assert(out(1).getDouble(0) == 0.0 && out(1).getDouble(1) == 0.0)
    assert(out(2).getDouble(0) == 0.0 && out(2).getDouble(1) == 0.0)
    assert(out(3).getDouble(0) == 0.0 && out(3).getDouble(1) == 0.0)
  }

  test("mixCorpus: weight 0 drops the group, 1 keeps it, subset is deterministic") {
    val docs = Tables.documents(spark, sfDir)
    val zero = TextStats.mixCorpus(docs, Map("en" -> 0.0))
    assert(zero.filter(col("lang") === "en").count() == 0)
    assert(zero.filter(col("lang") =!= "en").count() ==
      docs.filter(col("lang") =!= "en").count()) // default weight 1 untouched
    assert(TextStats.mixCorpus(docs, Map.empty).count() == docs.count())
    val half = TextStats.mixCorpus(docs, Map("en" -> 0.5))
    val nEn = docs.filter(col("lang") === "en").count()
    val kept = half.filter(col("lang") === "en").count()
    assert(kept > 0 && kept < nEn, s"$kept of $nEn")
    // content-keyed: rerun yields the identical doc set, not a resample
    val ids1 = half.select("doc_id").collect().map(_.getLong(0)).toSet
    val ids2 = TextStats.mixCorpus(docs, Map("en" -> 0.5))
      .select("doc_id").collect().map(_.getLong(0)).toSet
    assert(ids1 == ids2)
  }

  test("packChunks: concat-and-chop token tape with exact global offsets") {
    val chunks = Seq(
      (1L, 0L, 300L), (1L, 1L, 300L), // doc 1: 600 tokens
      (2L, 0L, 100L),                 // doc 2: 100
      (3L, 0L, 500L), (3L, 1L, 24L)   // doc 3: 524
    ).toDF("doc_id", "chunk_id", "n_chunk_tokens")
    val out = TextStats.packChunks(chunks, budget = 512)
      .orderBy("doc_id", "chunk_id")
      .select("doc_id", "chunk_id", "token_start", "seq_id").collect()
      .map(r => (r.getLong(0), r.getLong(1), r.getLong(2), r.getLong(3)))
    assert(out.toSeq == Seq(
      (1L, 0L, 0L, 0L),     // tape [0,300)   → seq 0
      (1L, 1L, 300L, 0L),   // [300,600)      → starts in seq 0 (straddles)
      (2L, 0L, 600L, 1L),   // [600,700)      → seq 1
      (3L, 0L, 700L, 1L),   // [700,1200)     → seq 1
      (3L, 1L, 1200L, 2L))) // [1200,1224)    → seq 2
  }

  test("packChunks: offsets independent of input partitioning") {
    val base = (1L to 200L).map(i => (i, 0L, 10L + i % 7))
    for (np <- Seq(1, 3, 13)) {
      val chunks = base.toDF("doc_id", "chunk_id", "n_chunk_tokens").repartition(np)
      val out = TextStats.packChunks(chunks, budget = 64)
        .orderBy("doc_id").select("token_start").collect().map(_.getLong(0))
      // exact prefix sums of the token counts in doc order, any layout
      val want = base.map(_._3).scanLeft(0L)(_ + _).init
      assert(out.toSeq == want, s"np=$np")
    }
  }

  test("packChunks: pid join reads one pinned exchange — no range shuffle in the lazy plan") {
    // The determinism fix: the range exchange runs ONCE (eager
    // localCheckpoint) before the offsets/main branches fork. If a
    // RangePartitioning exchange reappears in the *returned* plan, the two
    // branches are back to racing independent partitioners.
    val chunks = (1L to 50L).map(i => (i, 0L, 10L)).toDF("doc_id", "chunk_id", "n_chunk_tokens")
    val p = TextStats.packChunks(chunks, budget = 64)
      .queryExecution.executedPlan.toString.toLowerCase
    assert(!p.contains("rangepartitioning"), s"unpinned range exchange in:\n$p")
    assert(p.contains("scan existingrdd"), s"expected checkpointed leaf in:\n$p")
  }

  test("packChunks: no dropped rows when shuffle partitions exceed rows (AQE coalesce)") {
    // Failure mode of the unpinned version: AQE coalesces the thin offsets
    // exchange differently from the wide one → inner join on pid silently
    // drops rows. Force the sparse-partition regime and assert survival.
    val prev = spark.conf.get("spark.sql.shuffle.partitions")
    try {
      spark.conf.set("spark.sql.shuffle.partitions", "128")
      val base = (1L to 40L).map(i => (i, 0L, 5L + i % 3))
      val out = TextStats.packChunks(
        base.toDF("doc_id", "chunk_id", "n_chunk_tokens").repartition(7), budget = 32)
      assert(out.count() == 40L)
      val starts = out.orderBy("doc_id").select("token_start").collect().map(_.getLong(0))
      assert(starts.toSeq == base.map(_._3).scanLeft(0L)(_ + _).init)
    } finally spark.conf.set("spark.sql.shuffle.partitions", prev)
  }

  test("bigramCrossEntropy: hand-computed smoothed LM on a tiny corpus") {
    // corpus: "a b a b" / "a b" / "x y" → C(a,b)=3, C(b,a)=1, C(x,y)=1,
    // C1: a=3, b=1, x=1; V=4; k=0.5:
    // P(b|a)=(3.5/5)=0.7, P(a|b)=1.5/3=0.5, P(y|x)=1.5/3=0.5
    val docs = Seq((1L, "a b a b"), (2L, "a b"), (3L, "x y"), (4L, "solo"))
      .toDF("doc_id", "text")
    val out = TextStats.bigramCrossEntropy(docs).orderBy("doc_id").collect()
      .map(r => (r.getLong(0), r.getLong(1), r.getDouble(2)))
    // doc 4 has one token → no bigrams → excluded
    assert(out.map(_._1).toSeq == Seq(1L, 2L, 3L))
    assert(out.map(_._2).toSeq == Seq(3L, 1L, 1L))
    // doc1: -(2·ln0.7 + ln0.5)/3 = 0.4688; doc2: -ln0.7 = 0.3567
    // (its one bigram is the corpus-dominant (a,b)); doc3: -ln0.5
    assert(out(0)._3 == 0.4688, out(0).toString)
    assert(out(1)._3 == 0.3567 && out(2)._3 == 0.6931, out.mkString(","))
    // fluency ordering: the pure-dominant-bigram doc is most predictable,
    // the one-off construction least
    assert(out(1)._3 < out(0)._3 && out(0)._3 < out(2)._3)
  }

  test("quality features on a known string") {
    val df = Seq((1L, "the cat sat on the mat")).toDF("doc_id", "text")
    val r = TextStats.qualityFeatures(df).collect().head
    assert(r.getAs[Long]("n_tokens") == 6)
    // 22 chars, 6 tokens → (22-5)/6 = 2.8333
    assert(math.abs(r.getAs[Double]("mean_token_len") - 2.8333) < 1e-9)
    assert(r.getAs[Double]("punct_ratio") == 0.0)
    // stopwords: the, on, the → 3/6 = 0.5
    assert(r.getAs[Double]("stopword_ratio") == 0.5)
  }

  test("quality score is in [0,1] and favors clean prose over noise") {
    val df = Seq(
      (1L, "the quick brown fox jumps over the lazy dog and it runs to the hills at dawn with a smile"),
      (2L, "@@@@ #### $$$$ 12345 67890 !!!! ???? %%%% ^^^^ &&&&")).toDF("doc_id", "text")
    val out = TextStats.qualityScore(df).orderBy("doc_id").collect()
    val clean = out(0).getAs[Double]("quality_score")
    val noise = out(1).getAs[Double]("quality_score")
    assert(clean >= 0.0 && clean <= 1.0 && noise >= 0.0 && noise <= 1.0)
    assert(clean > noise)
  }

  test("detectLang identifies obvious languages with alphabetic tie-break") {
    val df = Seq(
      (1L, "the cat and the dog is in the house that is big"),
      (2L, "der Hund und die Katze ist nicht in das Haus"),
      (3L, "le chat et le chien est dans les maisons que nous avons"),
      (4L, "el perro y el gato es de los grandes en una casa"),
      (5L, "我是一个学生，我的朋友是不在的，有和没有")).toDF("doc_id", "text")
    val out = df.select(col("doc_id"), TextStats.detectLang(col("text")).as("l"))
      .orderBy("doc_id").collect().map(_.getString(1)).toSeq
    assert(out == Seq("en", "de", "fr", "es", "zh"))
  }

  test("chunking: overlapping token windows cover the doc, short docs get one chunk") {
    val df = Seq(
      (1L, (1 to 100).map(i => s"t$i").mkString(" ")), // 100 tokens → 2 chunks
      (2L, "just a few tokens")                        // 4 tokens → 1 chunk
    ).toDF("doc_id", "text")
    val out = TextStats.chunk(df).orderBy("doc_id", "chunk_id").collect()
    val d1 = out.filter(_.getLong(0) == 1L)
    assert(d1.length == 2) // ceil((100-16)/48) = 2
    assert(d1(0).getAs[Long]("n_chunk_tokens") == 64) // tokens 1..64
    assert(d1(1).getAs[Long]("n_chunk_tokens") == 52) // tokens 49..100
    assert(d1(0).getAs[String]("chunk_text").startsWith("t1 t2 "))
    assert(d1(1).getAs[String]("chunk_text").startsWith("t49 t50 "))
    val d2 = out.filter(_.getLong(0) == 2L)
    assert(d2.length == 1 && d2(0).getAs[Long]("n_chunk_tokens") == 4)
  }

  test("fingerprint is deterministic and collision-free on distinct docs") {
    val docs = Tables.documents(spark, sfDir)
    val fp = docs.select(col("doc_id"), TextStats.fingerprint(col("text")).as("f"))
    val n = fp.select("f").distinct().count()
    val nTexts = docs.select("text").distinct().count()
    assert(n == nTexts) // xxhash64 collision on 500 docs: effectively impossible
    // deterministic across runs
    val a = fp.orderBy("doc_id").collect().map(_.getLong(1)).toSeq
    val b = fp.orderBy("doc_id").collect().map(_.getLong(1)).toSeq
    assert(a == b)
  }

  test("vocabCoverage: exact counts on a known corpus; final K covers everything") {
    val docs = Seq((1L, "a a a b"), (2L, "b c")).toDF("doc_id", "text")
    val out = TextStats.vocabCoverage(docs, ks = Seq(1, 2, 10)).collect()
      .map(r => (r.getLong(0), r.getLong(1), r.getLong(2), r.getDouble(3)))
    // freqs: a=3, b=2, c=1; total 6
    assert(out.toSeq == Seq(
      (1L, 1L, 3L, 0.5),
      (2L, 2L, 5L, 0.833333),
      (10L, 3L, 6L, 1.0)))
  }

  test("analyze: the one-pass composite agrees with the individual quality/lang/fingerprint ops") {
    val docs = Tables.documents(spark, sfDir).limit(50)
    val composite = TextStats.analyze(spark, sfDir)
      .select("doc_id", "quality_score", "detected_lang", "fingerprint")
      .filter(col("doc_id") < 50).collect()
      .map(r => r.getLong(0) -> (r.getDouble(1), r.getString(2), r.getLong(3))).toMap
    val single = docs.filter(col("doc_id") < 50)
      .select(col("doc_id"),
        TextStats.detectLang(col("text")).as("l"),
        TextStats.fingerprint(col("text")).as("f"))
      .collect().map(r => r.getLong(0) -> (r.getString(1), r.getLong(2))).toMap
    single.foreach { case (id, (l, f)) =>
      val (q, cl, cf) = composite(id)
      assert(cl == l && cf == f && q >= 0.0 && q <= 1.0)
    }
  }

  test("stratifiedSample: monotone in rate, untouched strata kept whole, repartition-stable") {
    val docs = Tables.documents(spark, sfDir)
    val ids40 = TextStats.stratifiedSample(docs, "lang", Map("en" -> 40))
      .select("doc_id").collect().map(_.getLong(0)).toSet
    val ids80 = TextStats.stratifiedSample(docs, "lang", Map("en" -> 80))
      .select("doc_id").collect().map(_.getLong(0)).toSet
    assert(ids40.subsetOf(ids80), "raising the rate must only ADD docs")
    // strata without a configured rate keep every row
    val nonEn = docs.filter(col("lang") =!= "en").count()
    val keptNonEn = TextStats.stratifiedSample(docs, "lang", Map("en" -> 40))
      .filter(col("lang") =!= "en").count()
    assert(keptNonEn == nonEn)
    // en is genuinely thinned
    assert(TextStats.stratifiedSample(docs, "lang", Map("en" -> 40))
      .filter(col("lang") === "en").count() < docs.filter(col("lang") === "en").count())
    // content-keyed: survivor set is independent of physical layout
    val idsRepart = TextStats.stratifiedSample(docs.repartition(7), "lang", Map("en" -> 40))
      .select("doc_id").collect().map(_.getLong(0)).toSet
    assert(idsRepart == ids40)
    // rate 0 drops the stratum entirely, rate 100 keeps it whole
    assert(TextStats.stratifiedSample(docs, "lang", Map("en" -> 0))
      .filter(col("lang") === "en").count() == 0)
    assert(TextStats.stratifiedSample(docs, "lang", Map.empty).count() == docs.count())
  }

  test("noveltyScore: duplicate of reference scores 0, disjoint text scores 1, bounds hold") {
    import spark.implicits._
    val ref = Seq((1L, "the quick brown fox jumps over the lazy dog"))
      .toDF("doc_id", "text")
    val batch = Seq(
      (11L, "the quick brown fox jumps over the lazy dog"), // exact dup
      (12L, "completely different words entirely here now"), // disjoint
      (13L, "the quick brown fox went somewhere else today")  // partial
    ).toDF("doc_id", "text")
    val out = TextStats.noveltyScore(batch, ref).collect()
      .map(r => r.getLong(0) -> (r.getLong(1), r.getLong(2), r.getDouble(3))).toMap
    assert(out(11L)._3 == 0.0, "reference duplicate must have zero novelty")
    assert(out(12L)._3 == 1.0, "disjoint text must be fully novel")
    val (n13, nov13, s13) = out(13L)
    assert(nov13 > 0 && nov13 < n13 && s13 > 0.0 && s13 < 1.0,
      s"partial overlap must land strictly inside (0,1): $s13")
    // corpus-level sanity: bounds on the real fixture
    val docs = Tables.documents(spark, sfDir)
    TextStats.noveltyScore(docs.filter(col("doc_id") % 2 === 1),
        docs.filter(col("doc_id") % 2 === 0)).collect().foreach { r =>
      assert(r.getLong(2) <= r.getLong(1) && r.getDouble(3) >= 0.0 && r.getDouble(3) <= 1.0)
    }
  }

  test("balanceWeights: weight mass equalized per stratum, corpus mean weight 1.0") {
    val docs = Tables.documents(spark, sfDir)
    val w = TextStats.balanceWeights(docs, "lang").collect()
      .map(r => (r.getString(0), r.getLong(1), r.getDouble(2)))
    assert(w.map(_._1).toSet == docs.select("lang").distinct()
      .collect().map(_.getString(0)).toSet)
    val total = w.map(_._2).sum.toDouble
    // each stratum's n·weight ≈ total / n_strata (equal mass)
    val target = total / w.length
    w.foreach { case (lang, n, wt) =>
      assert(wt > 0.0, s"$lang weight must be positive")
      assert(math.abs(n * wt - target) < 1e-3, s"$lang mass ${n * wt} != $target")
    }
    // sum of per-doc weights ≈ corpus size → mean weight 1.0
    assert(math.abs(w.map { case (_, n, wt) => n * wt }.sum - total) < 1e-2)
  }

  test("classifierScore: sigmoid bounds, weight direction, decision on rounded score") {
    val docs = Tables.documents(spark, sfDir)
    val scored = TextStats.classifierScore(docs)
      .select("doc_id", "clf_score", "clf_keep").collect()
    assert(scored.length == docs.count())
    scored.foreach { r =>
      val s = r.getDouble(1)
      assert(s > 0.0 && s < 1.0, s"sigmoid out of (0,1): $s")
      assert(r.getBoolean(2) == (s >= 0.5), "clf_keep must decide on the rounded score")
    }
    // direction: an all-punctuation doc must score below a clean doc
    import spark.implicits._
    val probe = Seq((1L, "the quick brown fox jumps over the lazy dog and that is fine"),
                    (2L, "!!! ??? ### $$$ %%% ^^^ &&& *** ((( )))")).toDF("doc_id", "text")
    val p = TextStats.classifierScore(probe).select("doc_id", "clf_score")
      .collect().map(r => r.getLong(0) -> r.getDouble(1)).toMap
    assert(p(1L) > p(2L), s"noise doc must score lower: ${p(1L)} vs ${p(2L)}")
  }

  test("bpeMerges: greedy application, lexicographic ties, known toy sequence") {
    import spark.implicits._
    // "aaab": pairs (a,a)x2, (a,b)x1 → merge0 = (a,a,2) → [aa,a,b];
    // round 1 ties (aa,a) vs (a,b) at 1 → lexicographic picks (a,b);
    // round 2 merges (aa,ab). Also pins overlap counting (2, not 1) and
    // that greedy replace turns "aaa" into [aa,a], never [a,aa].
    val docs = Seq((0L, "aaab")).toDF("doc_id", "text")
    val got = TextStats.bpeMerges(docs, k = 3).collect()
      .map(r => (r.getLong(0), r.getString(1), r.getString(2), r.getLong(3)))
    assert(got.toSeq == Seq((0L, "a", "a", 2L), (1L, "a", "b", 1L), (2L, "aa", "ab", 1L)))
  }

  test("bpeMerges: monotone counts, vocab growth, determinism under repartition") {
    val docs = Tables.documents(spark, sfDir)
    val merges = TextStats.bpeMerges(docs, k = 6).collect()
      .map(r => (r.getLong(0), r.getString(1), r.getString(2), r.getLong(3)))
    assert(merges.length == 6)
    // pair counts are non-increasing: merging the argmax can only leave
    // equal-or-smaller counts behind (a merged pair never creates more
    // occurrences of a better pair than existed before)
    merges.sliding(2).foreach { case Array(a, b) =>
      assert(b._4 <= a._4, s"pair count rose after merge: $a -> $b")
    }
    // each merge strictly reduces the total symbol count of the corpus:
    // every applied occurrence replaces two symbols with one
    assert(merges.forall(_._4 >= 1))
    // determinism: same merges regardless of partitioning
    val reparted = TextStats.bpeMerges(docs.repartition(13), k = 6).collect()
      .map(r => (r.getLong(0), r.getString(1), r.getString(2), r.getLong(3)))
    assert(reparted.toSeq == merges.toSeq)
  }

  test("bpeMergesBatched: m=1 coincides with sequential BPE exactly") {
    import spark.implicits._
    val toy = Seq((0L, "aaab")).toDF("doc_id", "text")
    def rows(df: org.apache.spark.sql.DataFrame) = df.collect()
      .map(r => (r.getLong(0), r.getString(1), r.getString(2), r.getLong(3))).toSeq
    // one selection per round with the same (count DESC, lhs, rhs)
    // argmax = the sequential chain, including the tie rounds
    assert(rows(TextStats.bpeMergesBatched(toy, rounds = 3, m = 1)) ==
           rows(TextStats.bpeMerges(toy, k = 3)))
    val docs = Tables.documents(spark, sfDir)
    assert(rows(TextStats.bpeMergesBatched(docs, rounds = 6, m = 1)) ==
           rows(TextStats.bpeMerges(docs, k = 6)))
  }

  test("bpeMergesBatched: disjoint selection, ≥10× fewer driver jobs at k=64") {
    val docs = Tables.documents(spark, sfDir)
    val (df, jobs, roundSizes) = TextStats.bpeMergesBatchedWithJobs(docs, rounds = 4, m = 16)
    val merges = df.collect()
      .map(r => (r.getLong(0), r.getString(1), r.getString(2), r.getLong(3)))
    assert(roundSizes.sum == merges.length && roundSizes.forall(_ <= 16))
    // within a round, selected pairs share no symbol (the disjointness
    // that makes simultaneous application order-free) — per-pair symbol
    // SETS: a self-pair like (g,g) uses one symbol, not a reuse
    var off = 0
    for (sz <- roundSizes) {
      val round = merges.slice(off, off + sz); off += sz
      val syms = round.flatMap(t => Set(t._2, t._3).toSeq)
      assert(syms.length == syms.distinct.length,
        s"round reused a symbol: ${round.toSeq}")
    }
    assert(merges.nonEmpty)
    // the headline: a 64-merge budget costs 4 pair-count collects, not
    // 64 — one per ROUND (sequential BPE = one per MERGE)
    assert(jobs == 4, s"expected 4 driver round-trips, got $jobs")
    assert(merges.length > jobs, "each round should buy multiple merges")
    // determinism under repartition (the t22 guarantee carries over)
    val reparted = TextStats.bpeMergesBatched(docs.repartition(13), rounds = 4, m = 16)
      .collect().map(r => (r.getLong(0), r.getString(1), r.getString(2), r.getLong(3)))
    assert(reparted.toSeq == merges.toSeq)
  }

  test("curriculumOrder: contiguous quality-ascending bands, rank is a permutation, deterministic") {
    val docs = Tables.documents(spark, sfDir).filter(col("text").isNotNull)
    val out = TextStats.curriculumOrder(docs).collect()
      .map(r => (r.getLong(0), r.getLong(1), r.getDouble(2), r.getLong(3)))
    val n = out.length
    assert(n == docs.count())
    // train_rank is exactly the permutation 1..N
    assert(out.map(_._4).sorted.toSeq == (1L to n).toSeq)
    // bands partition by the exact ntile cuts: first n%4 bands carry
    // ceil(n/4), the rest floor
    val sizes = out.groupBy(_._2).map { case (b, rs) => b -> rs.length }
    val (ceil, floor) = ((n + 3) / 4, n / 4)
    (1L to 4L).foreach { b =>
      val want = if (b <= n % 4) ceil else floor
      assert(sizes(b) == want, s"band $b size ${sizes(b)} != $want")
    }
    // the schedule is band-contiguous and quality-ascending across bands:
    // every band-b rank precedes every band-(b+1) rank, and the worst
    // quality in band b+1 is >= the best... (quality sorts INTO bands, so
    // max quality of band b <= min quality of band b+1 up to ties)
    val byBand = out.groupBy(_._2)
    (1L to 3L).foreach { b =>
      assert(byBand(b).map(_._4).max < byBand(b + 1).map(_._4).min,
        s"band $b ranks must precede band ${b + 1}")
      assert(byBand(b).map(_._3).max <= byBand(b + 1).map(_._3).min + 1e-12,
        s"band $b quality must not exceed band ${b + 1}")
    }
    // deterministic under repartition (distributed rank, not task order)
    val re = TextStats.curriculumOrder(docs.repartition(13)).collect()
      .map(r => (r.getLong(0), r.getLong(1), r.getDouble(2), r.getLong(3)))
    assert(re.sortBy(_._1).toSeq == out.sortBy(_._1).toSeq)
  }

  test("perplexityBuckets (c25): equals the single-window ntile formulation per language") {
    val docs = Tables.documents(spark, sfDir)
    val out = TextStats.perplexityBuckets(docs).collect()
      .map(r => (r.getLong(0), r.getString(1), r.getDouble(2), r.getLong(3), r.getBoolean(4)))
      .sortBy(_._1)
    // independent formulation: plain ntile window (single-task per lang
    // is fine at spec scale; the distributed-rank plan must match it)
    TextStats.bigramCrossEntropy(docs)
      .join(docs.select(col("doc_id"), col("lang")), "doc_id")
      .createOrReplaceTempView("c25_hand")
    val hand = spark.sql(
      """SELECT doc_id, lang, cross_entropy,
        |  CAST(ntile(3) OVER (PARTITION BY lang ORDER BY cross_entropy, doc_id) AS BIGINT) AS bucket
        |FROM c25_hand""".stripMargin)
      .selectExpr("doc_id", "lang", "cross_entropy", "bucket", "bucket < 3 AS keep")
      .collect()
      .map(r => (r.getLong(0), r.getString(1), r.getDouble(2), r.getLong(3), r.getBoolean(4)))
      .sortBy(_._1)
    assert(out.nonEmpty && out.toSeq == hand.toSeq)
    // the CE ordering is what banded: per lang, every head-bucket CE <=
    // every tail-bucket CE
    out.groupBy(_._2).foreach { case (lang, rs) =>
      val byB = rs.groupBy(_._4)
      for (b <- 1L to 2L if byB.contains(b) && byB.contains(b + 1))
        assert(byB(b).map(_._3).max <= byB(b + 1).map(_._3).min + 1e-12,
          s"$lang: bucket $b CE exceeds bucket ${b + 1}")
    }
    // deterministic under repartition
    val re = TextStats.perplexityBuckets(docs.repartition(13)).collect()
      .map(r => (r.getLong(0), r.getString(1), r.getDouble(2), r.getLong(3), r.getBoolean(4)))
      .sortBy(_._1)
    assert(re.toSeq == out.toSeq)
  }

  test("trainingManifest (c24): equals hand-chained curriculum->pack->shard; shards contiguous") {
    val docs = Tables.documents(spark, sfDir)
    val out = TextStats.trainingManifest(docs).collect()
      .map(r => (r.getLong(0), r.getLong(1), r.getLong(2), r.getLong(3),
                 r.getLong(4), r.getLong(5), r.getLong(6), r.getLong(7)))
      .sortBy(_._1)
    // independent hand-chain: the PUBLIC c23 stage over the packable
    // population, then a plain global-window SQL pack + ntile shard
    // (single-task windows are fine at spec scale — the operator's
    // distributed-rank plan must reproduce them exactly)
    val packable = docs.filter(col("text").isNotNull)
      .filter(TextStats.tokenCount(col("text")) > 0)
    TextStats.curriculumOrder(packable)
      .join(packable.select(col("doc_id"),
        TextStats.tokenCount(col("text")).cast("long").as("n_tokens")), "doc_id")
      .createOrReplaceTempView("c24_hand")
    val hand = spark.sql(
      """SELECT doc_id, band, train_rank, n_tokens,
        |  coalesce(sum(n_tokens) OVER (ORDER BY train_rank
        |    ROWS BETWEEN UNBOUNDED PRECEDING AND 1 PRECEDING), 0L) AS start_offset,
        |  ntile(8) OVER (ORDER BY train_rank) - 1L AS shard
        |FROM c24_hand""".stripMargin)
      .selectExpr("doc_id", "band", "train_rank", "n_tokens", "start_offset",
        "start_offset div 512 AS window_first",
        "(start_offset + n_tokens - 1) div 512 AS window_last",
        "CAST(shard AS BIGINT) AS shard")
      .collect()
      .map(r => (r.getLong(0), r.getLong(1), r.getLong(2), r.getLong(3),
                 r.getLong(4), r.getLong(5), r.getLong(6), r.getLong(7)))
      .sortBy(_._1)
    assert(out.nonEmpty && out.toSeq == hand.toSeq)
    // the shard manifest is exactly the per-doc table's aggregate, and
    // shards are CONTIGUOUS in train_rank (the schedule property c10's
    // shuffle-shard deliberately destroys)
    val man = TextStats.trainingShardManifest(docs).collect()
      .map(r => (r.getLong(0), r.getLong(1), r.getLong(2), r.getLong(3),
                 r.getLong(4), r.getLong(5), r.getLong(6)))
    assert(man.map(_._2).sum == out.length)
    assert(man.map(_._3).sum == out.map(_._4).sum)
    man.sliding(2).foreach {
      case Array(a, b) => assert(a._5 + 1 == b._4,
        s"shards not rank-contiguous: ${a._1} ends ${a._5}, ${b._1} starts ${b._4}")
      case _ =>
    }
    // deterministic under repartition
    val re = TextStats.trainingManifest(docs.repartition(13)).collect()
      .map(r => (r.getLong(0), r.getLong(1), r.getLong(2), r.getLong(3),
                 r.getLong(4), r.getLong(5), r.getLong(6), r.getLong(7)))
      .sortBy(_._1)
    assert(re.toSeq == out.toSeq)
  }

  test("bpeMergesBatched at m=64: jobs track ROUNDS (incl. the exhaustion probe), never merges") {
    // the production-merge-count claim: a round's collect is one driver
    // job no matter how many merges it yields, and when the vocab
    // saturates the trainer stops after ONE empty collect — jobs is
    // bounded by productive-rounds + 1, merges can exceed jobs many-fold
    val docs = Tables.documents(spark, sfDir)
    val (df, jobs, roundSizes) = TextStats.bpeMergesBatchedWithJobs(docs, rounds = 64, m = 64)
    val nMerges = df.count()
    assert(roundSizes.sum.toLong == nMerges && roundSizes.forall(_ <= 64))
    assert(jobs <= roundSizes.length + 1,
      s"jobs $jobs exceeded productive rounds ${roundSizes.length} + exhaustion probe")
    assert(nMerges > jobs, s"merges $nMerges should exceed driver jobs $jobs")
  }

  test("bpeEncode: toy exactness, zero-merge identity, determinism") {
    import spark.implicits._
    // tokens: "aaab" (x2), "cd" (x1). merge0 = (a,a,4); round 1 ties
    // (aa,a) and (a,b) at 2 → lex picks (a,b) → "aaab" = [aa, ab].
    val docs = Seq((0L, "aaab aaab cd")).toDF("doc_id", "text")
    val merges = TextStats.bpeMerges(docs, k = 2)
    val got = TextStats.bpeEncode(docs, merges).collect().head
    assert((got.getLong(0), got.getLong(1), got.getLong(2), got.getDouble(3)) ==
      (0L, 3L, 6L, 2.0), s"got $got") // 2 + 2 + 2 subwords over 3 words
    // zero merges → every word is its character sequence
    val none = Seq.empty[(Long, String, String, Long)]
      .toDF("merge_rank", "lhs", "rhs", "pair_count")
    val raw = TextStats.bpeEncode(docs, none).collect().head
    assert(raw.getLong(2) == 10L, s"chars: $raw") // 4+4+2
    // fixture corpus: more merges never increase the subword total, and
    // the result is partitioning-independent
    val corpus = Tables.documents(spark, sfDir)
    val m8 = TextStats.bpeMerges(corpus, k = 8)
    val enc = TextStats.bpeEncode(corpus, m8)
    val encR = TextStats.bpeEncode(corpus.repartition(13), m8)
    assert(enc.collect().toSeq == encR.collect().toSeq)
    val totRaw = TextStats.bpeEncode(corpus, none)
      .agg(sum("n_bpe_tokens")).collect().head.getLong(0)
    val totM = enc.agg(sum("n_bpe_tokens")).collect().head.getLong(0)
    assert(totM < totRaw, s"merges must shrink the corpus: $totM vs $totRaw")
  }

  test("tokenBudgetMix: take-until-full per language, overshoot <= one doc, re-shard stable") {
    val corpus = Tables.documents(spark, sfDir)
    val budgets = Map("en" -> 600L, "de" -> 200L)
    val out = TextStats.tokenBudgetMix(corpus, budgets, defaultBudget = 300L)
    val rows = out.collect()
    assert(rows.nonEmpty)
    // per lang: every kept doc STARTS under the budget (cum - n < budget),
    // and the final total overshoots by strictly less than its own tokens
    val byLang = rows.groupBy(_.getString(1))
    byLang.foreach { case (lang, rs) =>
      val b = budgets.getOrElse(lang, 300L)
      rs.foreach { r =>
        assert(r.getLong(3) - r.getLong(2) < b,
          s"$lang doc ${r.getLong(0)} starts past budget $b")
      }
      val last = rs.maxBy(_.getLong(3))
      assert(last.getLong(3) - last.getLong(2) < b && (
        last.getLong(3) >= b ||
        // budget not reached: then EVERY doc of the lang must be kept
        rs.length == corpus.filter(col("lang") === lang).count()),
        s"$lang fill stopped early: $last")
    }
    // deterministic under repartitioning (the distributed prefix sum must
    // not depend on the physical partition count)
    val r2 = TextStats.tokenBudgetMix(corpus.repartition(13), budgets,
      defaultBudget = 300L).collect()
    assert(r2.toSeq == rows.toSeq)
    // budget 0 keeps nothing; huge budget keeps everything
    assert(TextStats.tokenBudgetMix(corpus, Map.empty, defaultBudget = 0L).count() == 0L)
    assert(TextStats.tokenBudgetMix(corpus, Map.empty).count() == corpus.count())
    // NULL text is excluded by contract (not by null-propagation): a
    // null-text doc neither appears nor consumes budget
    import spark.implicits._
    val withNull = corpus.select(col("doc_id"), col("lang"), col("text"))
      .unionByName(Seq((-1L, "en", null: String)).toDF("doc_id", "lang", "text"))
    val r3 = TextStats.tokenBudgetMix(withNull, budgets, defaultBudget = 300L).collect()
    assert(!r3.exists(_.getLong(0) == -1L))
    def key(rs: Array[org.apache.spark.sql.Row]) =
      rs.map(r => (r.getLong(0), r.getString(1), r.getLong(2), r.getLong(3))).toSeq
    assert(key(r3) == key(rows))
  }

  test("unigramEncode: ML segmentation, char fallback, determinism") {
    import spark.implicits._
    // hand-built model: piece "ab" dominates → "abab" = [ab, ab] (2
    // pieces), "ba" has no 2-char piece → [b, a] (2 chars), "cc" has no
    // covering pieces at all ('c' absent) → char fallback (2)
    val vocab = Seq(("ab", 90L), ("a", 5L), ("b", 5L))
      .toDF("piece", "n_piece")
    val docs = Seq((0L, "abab ba cc")).toDF("doc_id", "text")
    val got = TextStats.unigramEncode(docs, vocab).collect().head
    assert((got.getLong(0), got.getLong(1), got.getLong(2), got.getDouble(3)) ==
      (0L, 3L, 6L, 2.0), s"got $got")
    // a word over the encode cap falls back to one piece per char
    val long = Seq((1L, ("a" * 20) + " ab")).toDF("doc_id", "text")
    val g2 = TextStats.unigramEncode(long, vocab).collect().head
    assert(g2.getLong(2) == 21L, s"20-char fallback + 1-piece ab: $g2")
    // fixture corpus with the trained t25 vocab: every doc accounted,
    // multi-char pieces beat the char baseline, partitioning-independent
    val corpus = Tables.documents(spark, sfDir)
    val tv = TextStats.unigramVocab(corpus)
    val enc = TextStats.unigramEncode(corpus, tv)
    val rows = enc.collect()
    assert(rows.length == corpus.filter(col("text").isNotNull).count())
    val charsOnly = tv.filter(length(col("piece")) === 1)
    val totChars = TextStats.unigramEncode(corpus, charsOnly)
      .agg(sum("n_unigram_tokens")).collect().head.getLong(0)
    val totML = enc.agg(sum("n_unigram_tokens")).collect().head.getLong(0)
    assert(totML < totChars, s"ML pieces must shrink the corpus: $totML vs $totChars")
    val r2 = TextStats.unigramEncode(corpus.repartition(13), tv).collect()
    assert(r2.toSeq == rows.toSeq)
  }

  test("importanceWeights: target direction, token accounting, determinism") {
    val docs = Tables.documents(spark, sfDir)
    val w = TextStats.importanceWeights(docs, targetLang = "en")
    val rows = w.collect()
    // every doc with >= 1 token appears, tokens match the shared contract
    val expected = docs.filter(col("text").isNotNull)
      .select(size(filter(split(lower(col("text")), "\\s+"), t => t =!= "")).as("n"))
      .filter(col("n") > 0).count()
    assert(rows.length == expected, s"${rows.length} vs $expected")
    // direction: the target-language slice must average a higher weight
    // than the rest (its hashed unigrams define the target distribution)
    val (en, rest) = rows.partition(_.getString(1) == "en")
    def mean(rs: Array[org.apache.spark.sql.Row]) =
      rs.map(_.getDouble(3)).sum / rs.length
    assert(en.nonEmpty && rest.nonEmpty)
    assert(mean(en) > mean(rest),
      s"en mean ${mean(en)} must exceed rest ${mean(rest)}")
    // partitioning-independence (exact DECIMAL sums, rounded-ln weights)
    val r2 = TextStats.importanceWeights(docs.repartition(13), targetLang = "en")
    assert(r2.collect().toSeq == rows.toSeq)
  }

  test("qualityGateOn(clf_score) == model-gated corpus; delegation keeps c6 intact") {
    val docs = Tables.documents(spark, sfDir)
    // generic gate over the classifier score: strictly-above-median per lang
    val gated = TextStats.qualityGateOn(
      TextStats.classifierScore(docs), "clf_score")
    val n = gated.count()
    assert(n > 0 && n < docs.count(), s"gate must be selective, kept $n")
    // the refactored qualityGate (now a qualityGateOn delegate) must agree
    // with the inlined original formulation
    val viaOn = TextStats.qualityGateOn(TextStats.qualityScore(docs), "quality_score")
    val viaGate = TextStats.qualityGate(docs)
    assert(viaOn.exceptAll(viaGate).count() == 0 && viaGate.exceptAll(viaOn).count() == 0)
  }

  test("corpusPipeline: funnel monotone per source, stages agree with the standalone ops") {
    val rep = TextStats.corpusPipeline(spark, sfDir).collect()
    assert(rep.nonEmpty)
    rep.foreach { r =>
      val (raw, dedup, gated, chunks) =
        (r.getAs[Long]("n_raw"), r.getAs[Long]("n_dedup"),
         r.getAs[Long]("n_gated"), r.getAs[Long]("n_chunks"))
      assert(raw >= dedup && dedup >= gated && gated >= 0, r.toString)
      assert(chunks >= gated, "every gated doc yields at least one chunk")
    }
    // cross-check the dedup stage against the standalone composition
    val docs = Tables.documents(spark, sfDir)
    val survCount = docs.join(
      TextStats.normalizeText(docs)
        .groupBy(xxhash64(col("normalized")).as("__h"))
        .agg(org.apache.spark.sql.functions.min(col("doc_id")).as("doc_id"))
        .select("doc_id"),
      Seq("doc_id"), "left_semi").count()
    assert(rep.map(_.getAs[Long]("n_dedup")).sum == survCount)
    assert(rep.map(_.getAs[Long]("n_raw")).sum == docs.count())
  }

  test("weightedSample: PPS coin — max-weight docs always kept, rate tracks weight, deterministic") {
    val docs = Tables.documents(spark, sfDir)
    val sampled = TextStats.weightedSample(docs)
    val rows = sampled.collect()
    assert(rows.nonEmpty && rows.length < docs.count())
    // u < 10^9 always, so a doc at max weight passes the cross-multiply
    // unconditionally — the PPS boundary condition
    val wMax = rows.map(_.getAs[Long]("n_tokens")).max
    val allByWeight = TextStats.weightedSample(docs) // deterministic rerun
    assert(allByWeight.collect().map(_.toSeq).toSeq == rows.map(_.toSeq).toSeq)
    val full = docs.select(col("doc_id"),
      TextStats.tokenCount(col("text")).cast("long").as("w"))
    val fullMax = full.agg(max("w")).collect().head.getLong(0)
    val maxDocs = full.filter(col("w") === fullMax).count()
    assert(rows.count(_.getAs[Long]("n_tokens") == fullMax) == maxDocs,
      "every max-weight doc is sampled")
    assert(wMax == fullMax)
    // inclusion frequency rises with weight: mean sampled weight must
    // exceed the corpus mean (PPS oversamples long docs)
    val meanAll = full.agg(avg("w")).collect().head.getDouble(0)
    val meanSampled = rows.map(_.getAs[Long]("n_tokens")).sum.toDouble / rows.length
    assert(meanSampled > meanAll, s"sampled mean $meanSampled vs corpus $meanAll")
  }

  test("unigramVocab: toy exactness, char conservation, determinism under repartition") {
    // ab(×3), b(×1): seed T=10 with p(a)=.3 p(b)=.4 p(ab)=.3; Viterbi
    // picks ab over a·b (0.3 > 0.12), so counts converge to ab=3, b=1,
    // a=0 — the single char survives at zero count
    val toy = Seq((1L, "ab ab ab b")).toDF("doc_id", "text")
    val v = TextStats.unigramVocab(toy).collect()
      .map(r => (r.getString(0), r.getLong(1)))
    assert(v.toSeq == Seq(("ab", 3L), ("b", 1L), ("a", 0L)))

    val docs = Tables.documents(spark, sfDir)
    val out = TextStats.unigramVocab(docs).collect()
      .map(r => (r.getString(0), r.getLong(1)))
    // every single char of every (length-capped) word survives pruning
    val chars = docs.select(explode(regexp_extract_all(col("text"), lit("\\S+"), lit(0))).as("w"))
      .filter(length(col("w")) <= 12)
      .select(explode(split(col("w"), "")).as("ch")).distinct()
      .as[String].collect().toSet
    assert(chars.subsetOf(out.map(_._1).toSet))
    // character mass is conserved pre-prune: every word's best
    // segmentation covers it, so Σ c·len(piece) = Σ n_w·len(w)
    val full = TextStats.unigramVocab(docs, keepTop = 100000).collect()
      .map(r => (r.getString(0), r.getLong(1)))
    val wordMass = docs
      .select(explode(regexp_extract_all(col("text"), lit("\\S+"), lit(0))).as("w"))
      .filter(length(col("w")) <= 12)
      .select(length(col("w")).cast("long")).as[Long].collect().sum
    assert(full.map { case (p, c) => c * p.length }.sum == wordMass)
    // deterministic under any input partitioning
    val re = TextStats.unigramVocab(docs.repartition(17)).collect()
      .map(r => (r.getString(0), r.getLong(1)))
    assert(re.toSeq == out.toSeq)
  }

  test("shuffleShard: exact NTILE cuts, re-shard stability, seed separability, manifest conservation") {
    val docs = Tables.documents(spark, sfDir)
    val n = docs.count()
    val nShards = 8
    val out = TextStats.shuffleShard(docs, nShards).collect()
      .map(r => (r.getAs[Long]("doc_id"), r.getAs[Long]("skey"),
                 r.getAs[Long]("rank"), r.getAs[Long]("shard")))
    assert(out.length == n)
    // ranks are a permutation of 0..N-1 following (skey, doc_id) order
    assert(out.map(_._3).sorted.toSeq == (0L until n).toSeq)
    val byRank = out.sortBy(_._3)
    assert(byRank.map(r => (r._2, r._1)).toSeq == out.map(r => (r._2, r._1)).sortBy(identity).toSeq)
    // NTILE: sizes differ by at most one, larger shards first, contiguous
    val sizes = out.groupBy(_._4).view.mapValues(_.length).toMap
    val (base, rem) = (n / nShards, n % nShards)
    (0 until nShards).foreach { s =>
      val want = if (s < rem) base + 1 else base
      assert(sizes.getOrElse(s.toLong, 0) == want, s"shard $s size")
    }
    // shard is monotone in rank (contiguous rank spans per shard)
    assert(byRank.map(_._4).toSeq == byRank.map(_._4).sorted.toSeq)
    // RE-SHARD STABILITY: the assignment is a pure function of
    // (doc_id, seed, N, nShards) — any input partitioning reproduces it
    val re = TextStats.shuffleShard(docs.repartition(13), nShards).collect()
      .map(r => (r.getAs[Long]("doc_id"), r.getAs[Long]("rank"), r.getAs[Long]("shard")))
      .sortBy(_._1)
    assert(re.toSeq == out.map(r => (r._1, r._3, r._4)).sortBy(_._1).toSeq)
    // a different seed is a genuinely different permutation
    val other = TextStats.shuffleShard(docs, nShards, seed = 7L).collect()
      .map(r => (r.getAs[Long]("doc_id"), r.getAs[Long]("rank"))).sortBy(_._1)
    assert(other.map(_._2).toSeq != out.map(r => (r._1, r._3)).sortBy(_._1).map(_._2).toSeq)
    // manifest: doc/token totals conserved, rank spans tile 0..N-1
    val man = TextStats.shardManifest(docs, nShards).collect()
    assert(man.map(_.getAs[Long]("n_docs")).sum == n)
    val totTok = docs.select(TextStats.tokenCount(col("text")).cast("long")).as[Long].collect().sum
    assert(man.map(_.getAs[Long]("n_tokens")).sum == totTok)
    val spans = man.sortBy(_.getAs[Long]("shard"))
      .map(r => (r.getAs[Long]("rank_first"), r.getAs[Long]("rank_last")))
    assert(spans.head._1 == 0L && spans.last._2 == n - 1)
    spans.sliding(2).foreach { case Array((_, l), (f, _)) => assert(f == l + 1); case _ => }
  }

  test("tfidfTopTerms: corpus-wide terms score 0, rare terms rank by tf*ln(N/df), ties on term") {
    import spark.implicits._
    val docs = Seq(
      (1L, "apple banana banana"),
      (2L, "apple cherry"),
      (3L, "apple")).toDF("doc_id", "text")
    val out = TextStats.tfidfTopTerms(docs, k = 5)
      .collect().map(r => (r.getLong(0), r.getLong(1), r.getString(2), r.getDouble(5)))
    val d1 = out.filter(_._1 == 1L).sortBy(_._2)
    // banana: tf=2, df=1 -> 2*ln(3); apple: df=N -> ln(1)=0
    assert(d1.head._3 == "banana")
    assert(math.abs(d1.head._4 - 2.0 * math.log(3.0)) < 1e-6)
    assert(d1.find(_._3 == "apple").get._4 == 0.0)
    // doc 2: cherry (ln 3) outranks apple (0); both present, k respected
    val d2 = out.filter(_._1 == 2L).sortBy(_._2)
    assert(d2.map(_._3).toSeq == Seq("cherry", "apple"))
    // equal scores tie-break on the term string
    val tie = TextStats.tfidfTopTerms(
      Seq((1L, "zebra yak"), (2L, "other")).toDF("doc_id", "text"), k = 2)
      .filter(col("doc_id") === 1L).orderBy("rank")
      .collect().map(_.getString(2)).toSeq
    assert(tie == Seq("yak", "zebra"))
  }

  test("importanceSample: max-weight doc always kept, survivors subset of weighted docs, re-shard stable") {
    val docs = spark.read.parquet(s"$sfDir/documents.parquet")
    val w = TextStats.importanceWeights(docs).cache()
    try {
      val kept = TextStats.importanceSample(docs).collect().map(_.getLong(0)).toSet
      val all = w.select("doc_id").collect().map(_.getLong(0)).toSet
      // a sample, not a pass-through — and never inventing docs
      assert(kept.nonEmpty && kept.size < all.size && kept.subsetOf(all))
      // the best-matched doc has thr = 10^9 > any coin value: always kept
      val best = w.orderBy(col("log_weight").desc).limit(1)
        .collect().head.getLong(0)
      assert(kept.contains(best))
      // content-hash coin -> identical verdicts at any partitioning
      val again = TextStats.importanceSample(docs.repartition(7))
        .collect().map(_.getLong(0)).toSet
      assert(again == kept)
    } finally w.unpersist()
  }

  test("random corpora: tfidfTopTerms == driver-side reference (property)") {
    import org.scalacheck.{Gen, Prop, Test => SCTest}
    def ref(docs: Seq[(Long, String)], k: Int): Set[(Long, Long, String, Long, Long, Double)] = {
      def toks(t: String) = t.toLowerCase.split("\\s+").filter(_.nonEmpty).toSeq
      val n = docs.size.toDouble
      val tf = docs.flatMap { case (id, t) => toks(t).map(id -> _) }
        .groupBy(identity).view.mapValues(_.size.toLong).toMap
      val dfq = tf.keys.groupBy(_._2).view.mapValues(_.size.toLong).toMap
      def r6(x: Double) = math.floor(x * 1e6 + 0.5) / 1e6
      tf.toSeq.map { case ((id, term), f) =>
        (id, term, f, dfq(term), r6(f.toDouble * math.log(n / dfq(term).toDouble)))
      }.groupBy(_._1).toSeq.flatMap { case (id, rows) =>
        rows.sortBy(r => (-r._5, r._2)).zipWithIndex.take(k).map {
          case ((i, term, f, d, sc), rank) => (i, rank + 1L, term, f, d, sc)
        }
      }.toSet
    }
    val word = Gen.oneOf("apple", "banana", "cherry", "dog", "emu", "fig")
    val doc = Gen.choose(0, 6).flatMap(n => Gen.listOfN(n, word)).map(_.mkString(" "))
    val corpus = Gen.choose(1, 8).flatMap(n => Gen.listOfN(n, doc))
      .map(_.zipWithIndex.map { case (t, i) => (i.toLong, t) })
    val prop = Prop.forAll(corpus) { docs =>
      val spark2 = spark; import spark2.implicits._
      val got = TextStats.tfidfTopTerms(docs.toDF("doc_id", "text"), k = 3)
        .collect().map(r => (r.getLong(0), r.getLong(1), r.getString(2),
          r.getLong(3), r.getLong(4), r.getDouble(5))).toSet
      got == ref(docs, 3)
    }
    val res = SCTest.check(SCTest.Parameters.default.withMinSuccessfulTests(8), prop)
    assert(res.passed, res.status.toString)
  }

  test("snapshotDiff: all four statuses classified; text never needs to match row content beyond the hash") {
    import spark.implicits._
    val oldSnap = Seq((1L, "a"), (2L, "b"), (3L, "c")).toDF("doc_id", "text")
    val newSnap = Seq((2L, "b"), (3L, "c2"), (4L, "d")).toDF("doc_id", "text")
    val got = TextStats.snapshotDiff(oldSnap, newSnap)
      .collect().map(r => r.getLong(0) -> r.getString(1)).toMap
    assert(got == Map(1L -> "removed", 2L -> "unchanged", 3L -> "changed", 4L -> "added"))
  }

  test("zipfReport: planted 1/rank corpus fits slope ~ -1; fixture row sane; repartition-invariant") {
    import spark.implicits._
    // term_i occurs floor(600/i) times, i = 1..40 → an exact-ish Zipf curve
    val planted = (1 to 40).flatMap(i => Seq.fill(600 / i)(f"w$i%02d"))
    val docs = planted.grouped(50).zipWithIndex
      .map { case (ws, i) => (i.toLong, ws.mkString(" ")) }.toSeq.toDF("doc_id", "text")
    val r = TextStats.zipfReport(docs, topN = 40).collect().head
    val slope = r.getDouble(3)
    assert(slope < -0.9 && slope > -1.1, s"planted 1/rank corpus must fit ~ -1, got $slope")
    assert(r.getLong(2) == 40L)
    // fixture: slope negative, heaps exponent strictly inside (0, 1)
    val f = TextStats.zipfReport(Tables.documents(spark, sfDir)).collect().head
    assert(f.getDouble(3) < 0.0)
    assert(f.getDouble(4) > 0.0 && f.getDouble(4) < 1.0)
    // partitioning must not wiggle the decimal-exact sums
    val re = TextStats.zipfReport(docs.repartition(9), topN = 40).collect().head
    assert(re.toSeq == r.toSeq)
  }

  test("readability: hand-counted words/sentences/vowel groups; sentence floor; harder text scores lower") {
    import spark.implicits._
    val docs = Seq(
      (1L, "Hello world. Foo!"),              // 3 words, 2 sentences, 4 vowel groups
      (2L, "no terminal punctuation here"),   // sentence floor = 1
      (3L, "The cat sat. The dog ran. It was fun."), // easy: short words/sentences
      (4L, "Extraordinarily complicated administrative bureaucratization prevails.")
    ).toDF("doc_id", "text")
    val out = TextStats.readability(docs).collect()
      .map(r => r.getLong(0) -> (r.getLong(1), r.getLong(2), r.getLong(3), r.getDouble(4))).toMap
    def flesch(w: Long, s: Long, sy: Long) = math.floor(
      (206.835 - 1.015 * (w.toDouble / s) - 84.6 * (sy.toDouble / w)) * 1e6 + 0.5) / 1e6
    assert(out(1L) == ((3L, 2L, 4L, flesch(3, 2, 4))))
    assert(out(2L)._2 == 1L) // floor guards the fragment
    assert(out(3L)._4 > out(4L)._4, "polysyllabic prose must score harder")
    // real fixture: every doc scored, counts positive
    val real = TextStats.readability(Tables.documents(spark, sfDir)).collect()
    assert(real.nonEmpty && real.forall(r => r.getLong(1) > 0 && r.getLong(2) > 0))
  }

  test("groupCap: k survivors per group matching the driver-side splitmix order; repartition-invariant") {
    import spark.implicits._
    import graft.functions.Splitmix
    val docs = Tables.documents(spark, sfDir)
    val out = TextStats.groupCap(docs, k = 7)
      .collect().map(r => (r.getLong(0), r.getString(1), r.getLong(2)))
    // at most 7 per group, rank dense from 0 within each group
    out.groupBy(_._2).foreach { case (_, rows) =>
      assert(rows.length <= 7)
      assert(rows.map(_._3).sorted.toSeq == (0L until rows.length.toLong).toSeq)
    }
    // driver-side reference: per group, k smallest (mix(mix(id)^42), id)
    val ref = docs.select("doc_id", "lang").collect()
      .map(r => (r.getLong(0), r.getString(1)))
      .groupBy(_._2).toSeq.flatMap { case (lang, rows) =>
        rows.map { case (id, _) => (Splitmix.mix(Splitmix.mix(id) ^ 42L), id) }
          .sorted.take(7).zipWithIndex
          .map { case ((_, id), i) => (id, lang, i.toLong) }
      }.sortBy(_._1)
    assert(out.sortBy(_._1).toSeq == ref.toSeq)
    // partitioning must not change the survivor set
    val re = TextStats.groupCap(docs.repartition(13), k = 7)
      .collect().map(r => (r.getLong(0), r.getString(1), r.getLong(2)))
    assert(re.sortBy(_._1).toSeq == out.sortBy(_._1).toSeq)
  }

  test("curationReport: skewed fixture — dup accounting, cap math, share sums to 1, quartiles ordered") {
    import spark.implicits._
    // source A dominates (16 docs, half exact dups), B is clean (4), C
    // tiny (2); one null-text row must neither count nor consume budget
    val rows =
      (0L until 16L).map(i => (i, s"alpha beta gamma doc ${i % 8}", "A")) ++
      (16L until 20L).map(i => (i, s"unique text body number $i with words", "B")) ++
      Seq((20L, "tiny one", "C"), (21L, "tiny two", "C"), (22L, null: String, "C"))
    val docs = rows.toDF("doc_id", "text", "source")
    val rep = TextStats.curationReport(docs, maxShareBp = 2500L).collect()
    assert(rep.map(_.getString(0)).toSeq == Seq("A", "B", "C"))
    val byS = rep.map(r => r.getString(0) -> r).toMap
    // A: 16 docs, 8 distinct texts -> dup_rate 0.5; total (non-null) = 22
    assert(byS("A").getAs[Long]("n_docs") == 16L)
    assert(byS("A").getAs[Long]("n_distinct_texts") == 8L)
    assert(byS("A").getAs[Double]("dup_rate") == 0.5)
    assert(byS("B").getAs[Double]("dup_rate") == 0.0)
    // null-text row excluded: C has 2 docs, total 22
    assert(byS("C").getAs[Long]("n_docs") == 2L)
    // cap = floor(22 * 0.25) = 5: A is over by 11, B and C are under
    assert(byS("A").getAs[Long]("cap_recommended") == 5L)
    assert(byS("A").getAs[Long]("n_over_cap") == 11L)
    assert(byS("B").getAs[Long]("cap_recommended") == 4L)
    assert(byS("B").getAs[Long]("n_over_cap") == 0L)
    assert(byS("C").getAs[Long]("n_over_cap") == 0L)
    // shares sum to 1 (6dp rounding slack) and quartiles are ordered
    val shareSum = rep.map(_.getAs[Double]("share")).sum
    assert(math.abs(shareSum - 1.0) < 1e-5, s"shares sum to $shareSum")
    rep.foreach { r =>
      assert(r.getAs[Double]("q25_quality") <= r.getAs[Double]("median_quality"))
      assert(r.getAs[Double]("median_quality") <= r.getAs[Double]("q75_quality"))
    }
    // n_tokens matches a driver-side recount of the non-null texts
    val expTok = rows.filter(r => r._2 != null && r._3 == "A")
      .map(_._2.split("\\s+").count(_.nonEmpty).toLong).sum
    assert(byS("A").getAs[Long]("n_tokens") == expTok)
    // cap keep-rule agreement: feeding the recommendation to groupCap
    // keeps exactly cap_recommended docs of A
    val capped = TextStats.groupCap(
      docs.filter(col("text").isNotNull), k = 5, groupCol = "source")
    assert(capped.filter(col("source") === "A").count() == 5L)
  }

  test("epochPlan: quality-ranked budget fill — clamp math, epoch/remainder identity, boundary budgets") {
    val docs = Tables.documents(spark, sfDir)
    val totalTokens = TextStats.qualityScore(docs)
      .agg(sum(col("n_tokens"))).head().getLong(0)
    val budget = totalTokens * 2 // mid-plan: some sources full, one marginal
    val plan = TextStats.epochPlan(docs, budget).collect()
    assert(plan.nonEmpty)
    // rank order follows (median_quality desc, source)
    val quals = plan.map(r => (r.getDouble(2), r.getString(0)))
    assert(quals.sliding(2).forall { case Array((qa, sa), (qb, sb)) =>
      qa > qb || (qa == qb && sa < sb) }, "rank order broken")
    // per-row clamp identity recomputed from the output itself
    var cum = 0L
    plan.foreach { r =>
      val (t, alloc, ef, rem) = (r.getLong(3), r.getLong(4), r.getLong(5), r.getLong(6))
      val expect = math.max(0L, math.min(budget - cum, t * 4))
      assert(alloc == expect, s"${r.getString(0)}: alloc $alloc != $expect")
      assert(alloc == ef * t + rem && rem >= 0 && rem < t && ef <= 4)
      cum += t * 4
    }
    // total granted = min(budget, 4 * total)
    assert(plan.map(_.getLong(4)).sum == math.min(budget, totalTokens * 4))
    // boundary budgets: zero grants nothing; huge grants 4 epochs everywhere
    assert(TextStats.epochPlan(docs, 0L).collect().forall(_.getLong(4) == 0L))
    val full = TextStats.epochPlan(docs, Long.MaxValue / 8).collect()
    assert(full.forall(r => r.getLong(5) == 4L && r.getLong(6) == 0L))
  }

  test("contextPack: offsets are one contiguous stream in splitmix order; window math; repartition-invariant") {
    import graft.functions.Splitmix
    val docs = Tables.documents(spark, sfDir)
    val L = 64L
    val out = TextStats.contextPack(docs, contextLen = L).collect()
      .map(r => (r.getLong(0), r.getLong(1), r.getLong(2), r.getLong(3),
        r.getLong(4), r.getLong(5), r.getLong(6)))
    assert(out.nonEmpty)
    // pack ranks are dense 0..n-1 and offsets are the running token sum
    // in (skey, id) order — the stream is contiguous, no gaps/overlaps
    val byRank = out.sortBy(_._2)
    assert(byRank.map(_._2).toSeq == (0L until out.length.toLong).toSeq)
    var off = 0L
    byRank.foreach { case (_, _, nt, start, wf, wl, nw) =>
      assert(start == off, s"gap at offset $off vs $start")
      assert(wf == start / L && wl == (start + nt - 1) / L && nw == wl - wf + 1)
      off += nt
    }
    // the order really is the seeded splitmix permutation
    val refOrder = docs.select("doc_id").collect().map(_.getLong(0))
      .map(id => (Splitmix.mix(Splitmix.mix(id) ^ 42L), id)).sorted.map(_._2)
    assert(byRank.map(_._1).toSeq == refOrder.toSeq)
    // boundary-split accounting: total windows = ceil(total/L) and every
    // window id in [0, that) is covered by some doc span
    val totalTok = byRank.map(_._3).sum
    val nWindows = (totalTok + L - 1) / L
    assert(byRank.map(_._6).max == nWindows - 1)
    // determinism under repartition
    val re = TextStats.contextPack(docs.repartition(13), contextLen = L).collect()
      .map(r => (r.getLong(0), r.getLong(1), r.getLong(2), r.getLong(3),
        r.getLong(4), r.getLong(5), r.getLong(6)))
    assert(re.sortBy(_._1).toSeq == out.sortBy(_._1).toSeq)
  }

  test("pretrainPipeline: composed plan equals the standalone stages chained by hand; funnel monotone") {
    val docs = Tables.documents(spark, sfDir)
    val out = TextStats.pretrainPipeline(spark, sfDir, capK = 7L, contextLen = 64L)
      .collect().map(_.toSeq)
    assert(out.nonEmpty)
    // hand-chain the standalone ops with the same parameters
    val capped = docs.join(TextStats.groupCap(docs, 7L).select("doc_id"),
      Seq("doc_id"), "left_semi")
    val gated = capped.join(TextStats.qualityGate(capped).select("doc_id"),
      Seq("doc_id"), "left_semi")
    val keep = gated.groupBy(xxhash64(col("text")).as("__h"))
      .agg(min(col("doc_id")).as("doc_id"))
    val deduped = gated.join(keep.select("doc_id"), Seq("doc_id"), "left_semi")
    val ref = TextStats.contextPack(deduped, 64L).collect().map(_.toSeq)
    assert(out.toSeq == ref.toSeq)
    // funnel monotone and non-vacuous: each stage strictly shrank here
    val (nDocs, nCap, nGate, nDedup) =
      (docs.count(), capped.count(), gated.count(), deduped.count())
    assert(nDocs >= nCap && nCap >= nGate && nGate >= nDedup)
    assert(nGate < nCap, "quality gate dropped nothing - vacuous")
    assert(out.length.toLong <= nDedup)
  }

  test("phraseSearch (t33): planted top trigram found per doc with counts, overlaps counted, partial phrase misses, case-folded") {
    val docs = Seq[(Long, String)](
      (1L, "Alpha beta gamma one two three alpha BETA gamma"), // 2 planted occurrences, mixed case
      (2L, "alpha beta gamma xx yy"),                          // 1 occurrence
      (3L, "alpha beta delta gamma"),                          // partial — must NOT match
      (4L, "rep rep rep rep"),                                 // overlapping: "rep rep rep" twice
      (5L, null)                                               // null text — ignored
    ).toDF("doc_id", "text")
    val out = TextStats.phraseSearch(docs).collect()
      .map(r => (r.getString(0), r.getLong(1)) -> r.getLong(2)).toMap
    // planted phrase is the global top (count 3) — found in docs 1 and 2 only
    assert(out(("alpha beta gamma", 1L)) == 2L)
    assert(out(("alpha beta gamma", 2L)) == 1L)
    assert(!out.contains(("alpha beta gamma", 3L)))
    // overlapping occurrences both counted through the index
    assert(out(("rep rep rep", 4L)) == 2L)
    // exactly topQ=5 distinct phrases in the answer set
    assert(out.keys.map(_._1).toSet.size == 5)
    // determinism under repartition (derivation ties, window, joins)
    val re = TextStats.phraseSearch(docs.repartition(7)).collect()
      .map(r => (r.getString(0), r.getLong(1)) -> r.getLong(2)).toMap
    assert(re == out)
  }

  test("bm25TopK (t34): hand-computed score, full match outranks partial, repartition-stable ranks") {
    val docs = Seq[(Long, String)](
      (1L, "alpha beta gamma one two three alpha beta gamma"), // all terms, tf=2 — dl 9
      (2L, "alpha beta gamma xx yy"),                          // all terms, tf=1 — dl 5
      (3L, "alpha n1 n2 n3 n4 n5 n6 n7"),                      // one term — dl 8
      (4L, "f1 f2 f3 f4 f5 f6")                                // no terms — dl 6
    ).toDF("doc_id", "text")
    val out = TextStats.bm25TopK(docs, k = 10).collect()
      .map(r => (r.getString(0), r.getLong(1)) -> (r.getLong(2), r.getDouble(3)))
    val planted = out.filter(_._1._1 == "alpha beta gamma").sortBy(_._1._2)
    // exactly the three docs holding >=1 query term, in descending score
    assert(planted.map(_._2._1).toSet == Set(1L, 2L, 3L))
    val scores = planted.map(_._2._2).toSeq
    assert(scores == scores.sorted.reverse)
    assert(planted.last._2._1 == 3L) // single-term doc ranks last
    // hand-computed doc-2 score: the exact engine arithmetic (6dp floor
    // rounding per term, then an exact decimal sum)
    def r6(x: Double) = math.floor(x * 1e6 + 0.5) / 1e6
    val (nDocs, tot) = (4.0, (9 + 5 + 8 + 6).toDouble)
    val avgdl = tot / nDocs
    def term(tf: Long, df: Long, dl: Long) = r6(
      math.log((nDocs - df + 0.5) / (df + 0.5) + 1.0) *
        ((tf * 2.2) / (tf + 1.2 * (0.25 + (0.75 * dl) / avgdl))))
    val expected2 =
      (BigDecimal(term(1, 3, 5)) + BigDecimal(term(1, 2, 5)) + BigDecimal(term(1, 2, 5))).toDouble
    val got2 = planted.find(_._2._1 == 2L).get._2._2
    assert(math.abs(got2 - expected2) < 1e-9, s"got $got2 expected $expected2")
    // determinism under repartition (the whole point of the decimal sum)
    val re = TextStats.bm25TopK(docs.repartition(7), k = 10).collect()
      .map(r => (r.getString(0), r.getLong(1)) -> (r.getLong(2), r.getDouble(3)))
    assert(re.toMap == out.toMap)
  }

  test("collocations: hand-computed PMI, min-count prune, positive for dependent and negative for anti-correlated pairs") {
    import spark.implicits._
    val docs = Seq((1L, "x y x y x y")).toDF("doc_id", "text")
    // bigrams: (x,y)x3, (y,x)x2, nbi=5; unigrams: x:3 y:3, nuni=6
    val byName = TextStats.collocations(docs, minCount = 1).collect()
      .map(r => ((r.getAs[String]("w1"), r.getAs[String]("w2")),
        (r.getAs[Long]("n_ab"), r.getAs[Double]("pmi")))).toMap
    def r6(x: Double) = math.floor(x * 1e6 + 0.5) / 1e6
    assert(byName(("x", "y"))._1 == 3L)
    assert(byName(("x", "y"))._2 == r6(math.log((3.0 / 5.0) / ((3.0 / 6.0) * (3.0 / 6.0)))))
    assert(byName(("y", "x"))._2 == r6(math.log((2.0 / 5.0) / ((3.0 / 6.0) * (3.0 / 6.0)))))
    // min-count prune: threshold 3 keeps only (x,y)
    val pruned = TextStats.collocations(docs, minCount = 3).collect()
    assert(pruned.length == 1 && pruned.head.getAs[String]("w1") == "x")
    // dependent pair scores high, anti-correlated pair scores negative
    val mix = Seq((1L, "a b a b a b a b"), (2L, "c d c d c d c d"),
      (3L, "a d c b a d c b")).toDF("doc_id", "text")
    val m = TextStats.collocations(mix, minCount = 2).collect()
      .map(r => ((r.getAs[String]("w1"), r.getAs[String]("w2")), r.getAs[Double]("pmi"))).toMap
    assert(m(("a", "b")) > 0.0 && m(("c", "d")) > 0.0)
  }

  test("hybridRrfTopK: fused score = RRF of the two component ranks; ranks contiguous; repartition-stable") {
    val docs = Tables.documents(spark, sfDir)
    val out = TextStats.hybridRrfTopK(docs).collect()
    assert(out.nonEmpty)
    def r6(x: Double) = math.floor(x * 1e6 + 0.5) / 1e6
    // every emitted score is exactly the RRF of the carried ranks
    out.foreach { r =>
      val rb = Option(r.getAs[java.lang.Long]("bm25_rank")).map(_.toLong)
      val rm = Option(r.getAs[java.lang.Long]("match_rank")).map(_.toLong)
      assert(rb.isDefined || rm.isDefined, "a fused row must come from >= 1 list")
      val expect = r6(rb.map(v => 1.0 / (60.0 + v)).getOrElse(0.0) +
        rm.map(v => 1.0 / (60.0 + v)).getOrElse(0.0))
      assert(r.getAs[Double]("rrf_score") == expect)
    }
    // ranks are 1..n per phrase, descending in score
    out.groupBy(_.getAs[String]("phrase")).foreach { case (_, rows) =>
      val ranked = rows.sortBy(_.getAs[Long]("rank"))
      assert(ranked.map(_.getAs[Long]("rank")).toSeq == (1L to ranked.length).toSeq)
      val scores = ranked.map(_.getAs[Double]("rrf_score")).toSeq
      assert(scores == scores.sorted.reverse)
    }
    // the carried component ranks agree with the rankers run standalone
    val bm = TextStats.bm25TopK(docs).collect()
      .map(r => (r.getString(0), r.getLong(2)) -> r.getLong(1)).toMap
    out.foreach { r =>
      val k = (r.getAs[String]("phrase"), r.getAs[Long]("doc_id"))
      Option(r.getAs[java.lang.Long]("bm25_rank")).foreach(v => assert(bm(k) == v.toLong))
    }
    val re = TextStats.hybridRrfTopK(docs.repartition(7)).collect()
    assert(out.map(_.toSeq).toSeq == re.map(_.toSeq).toSeq)
  }

  test("classifierCalibration: bins partition the corpus, rates are probabilities, gap is the recomputed |mean - obs|") {
    val docs = Tables.documents(spark, sfDir)
    val out = TextStats.classifierCalibration(docs).collect()
    assert(out.nonEmpty)
    assert(out.map(_.getAs[Long]("n_docs")).sum == docs.count())
    out.foreach { r =>
      val bin = r.getAs[Long]("bin")
      assert(bin >= 0L && bin <= 9L)
      val (m, o) = (r.getAs[Double]("mean_score"), r.getAs[Double]("obs_rate"))
      assert(m >= 0.0 && m <= 1.0 && o >= 0.0 && o <= 1.0)
      // mean predicted score sits inside its own bin's range
      assert(m >= bin / 10.0 - 1e-6 && m <= (bin + 1) / 10.0 + 1e-6)
      assert(r.getAs[Double]("calibration_gap") ==
        math.floor(math.abs(m - o) * 1e6 + 0.5) / 1e6)
    }
    // the report discriminates: higher-score bins pass the heuristic
    // gate at least as often overall (weak monotonicity on the fixture:
    // top bin beats bottom bin)
    val byBin = out.map(r => r.getAs[Long]("bin") -> r.getAs[Double]("obs_rate")).toMap
    assert(byBin(byBin.keys.max) >= byBin(byBin.keys.min))
  }

  test("indexLayoutReport: hand-computed varint gaps; ALL row sums; width thresholds at the 128^j boundaries") {
    import spark.implicits._
    val docs = Seq((0L, "a b"), (1L, "a"), (200L, "a c"))
      .toDF("doc_id", "text")
    val out = TextStats.indexLayoutReport(docs).collect()
      .map(r => r.getString(0) -> r).toMap
    // a: postings [0,1,200] → gaps [1,1,199] → varint [1,1,2] = 4 bytes
    assert(out("a").getAs[Long]("n_postings") == 3L)
    assert(out("a").getAs[Long]("raw_bytes") == 24L)
    assert(out("a").getAs[Long]("varint_bytes") == 4L)
    assert(out("a").getAs[Double]("compression") == 6.0)
    // b: [0] → gap 1 → 1 byte; c: [200] → first gap 201 → 2 bytes
    assert(out("b").getAs[Long]("varint_bytes") == 1L)
    assert(out("c").getAs[Long]("varint_bytes") == 2L)
    // ALL row is the exact column sums: 5 postings, 7 varint bytes
    assert(out("ALL").getAs[Long]("n_postings") == 5L)
    assert(out("ALL").getAs[Long]("varint_bytes") == 7L)
    assert(out("ALL").getAs[Double]("compression") ==
      math.floor((40.0 / 7.0) * 1e6 + 0.5) / 1e6)
    // boundary: gap exactly 16384 needs 3 bytes, 16383 needs 2
    val edge = Seq((0L, "x y"), (16384L, "x"), (16383L, "y"))
      .toDF("doc_id", "text")
    val eo = TextStats.indexLayoutReport(edge).collect()
      .map(r => r.getString(0) -> r.getAs[Long]("varint_bytes")).toMap
    assert(eo("x") == 1L + 3L) // gaps [1, 16384]
    assert(eo("y") == 1L + 2L) // gaps [1, 16383]
    // 64-bit widths (r15 ADVICE): gaps >= 2^35 were understated at a
    // capped 5 bytes; each 128^j boundary now steps the width up to the
    // 9-byte maximum for gaps >= 2^56
    val wide = Seq(1L << 35, (1L << 35) - 1, 1L << 42, 1L << 49, 1L << 56)
      .zipWithIndex
      .map { case (gap, i) =>
        val tok = s"t$i"
        Seq((0L, tok), (gap, tok)) // postings [0, gap] → gaps [1, gap]
      }
    val wdocs = wide.flatten.groupBy(_._1).map { case (id, ps) =>
      (id, ps.map(_._2).mkString(" "))
    }.toSeq.toDF("doc_id", "text")
    val wo = TextStats.indexLayoutReport(wdocs, topTerms = 50).collect()
      .map(r => r.getString(0) -> r.getAs[Long]("varint_bytes")).toMap
    assert(wo("t0") == 1L + 6L)  // gap 2^35 needs 6 bytes
    assert(wo("t1") == 1L + 5L)  // gap 2^35 - 1 still 5
    assert(wo("t2") == 1L + 7L)  // gap 2^42 → 7
    assert(wo("t3") == 1L + 8L)  // gap 2^49 → 8
    assert(wo("t4") == 1L + 9L)  // gap 2^56 → 9 (the cap)
  }

  test("indexAddReport: hand-computed scopes — varint layout, dictionary growth, compaction gain, drift rule") {
    import spark.implicits._
    // base (even ids): a:[0,20000] -> gaps [1,20000] -> [1,3] = 4B; b:[0] -> 1B
    // add  (odd ids):  a:[9999] -> first gap 10000 -> 2B; d:[9999] -> 2B (d is NEW)
    // merged: a:[0,9999,20000] -> gaps [1,9999,10001] -> [1,2,2] = 5B; b 1B; d 2B
    //   -> interleaving shrank a's 3-byte delta to two 2-byte ones: gain (5+4)-8 = 1
    val docs = Seq((0L, "a b"), (20000L, "a"), (9999L, "a d")).toDF("doc_id", "text")
    val (bTfs, _) = TextStats.indexSegment(docs.filter(col("doc_id") % 2 === 0))
    val (aTfs, _) = TextStats.indexSegment(docs.filter(col("doc_id") % 2 === 1))
    val out = TextStats.indexAddReport(bTfs, aTfs).collect()
      .map(r => r.getString(0) -> r).toMap
    def row(s: String) = {
      val r = out(s)
      (r.getAs[Long]("n_docs"), r.getAs[Long]("n_terms"), r.getAs[Long]("n_new_terms"),
       r.getAs[Long]("n_postings"), r.getAs[Long]("varint_bytes"),
       r.getAs[Long]("merge_gain_bytes"), r.getAs[Boolean]("rebuild_recommended"))
    }
    assert(row("base") == ((2L, 2L, 0L, 3L, 5L, 0L, false)))
    assert(row("add") == ((1L, 2L, 1L, 2L, 4L, 0L, false)))
    assert(row("merged") == ((3L, 3L, 1L, 5L, 8L, 1L, true))) // 4*2 >= 3
    // drift-rule boundary: base 9 postings; add 2 -> 8 < 9 stays false,
    // add 3 -> 12 >= 9 flips true
    val base9 = Seq((0L, "x y z"), (2L, "x y z"), (4L, "x y z")).toDF("doc_id", "text")
    val (b9, _) = TextStats.indexSegment(base9)
    def rec(addText: String) = TextStats.indexAddReport(b9,
        TextStats.indexSegment(Seq((1L, addText)).toDF("doc_id", "text"))._1)
      .filter(col("scope") === "merged").head().getAs[Boolean]("rebuild_recommended")
    assert(!rec("x y"))
    assert(rec("x y z"))
  }

  test("indexDeleteReport: hand-computed scopes, dictionary shrink, tombstone rule; subtracted stats serve == rebuild on retained") {
    import spark.implicits._
    // base: a:[0,2], b:[0], c:[6] -> 4 postings; delete {6} removes c
    // entirely (vanished term), after: a:[0,2], b:[0] -> 3 postings
    val docs = Seq((0L, "a b"), (2L, "a"), (6L, "c")).toDF("doc_id", "text")
    val (bTfs, _) = TextStats.indexSegment(docs)
    val out = TextStats.indexDeleteReport(bTfs,
        Seq(6L).toDF("doc_id"), rebuildDen = 8).collect()
      .map(r => r.getString(0) -> r).toMap
    def row(s: String) = { val r = out(s)
      (r.getAs[Long]("n_docs"), r.getAs[Long]("n_terms"), r.getAs[Long]("n_postings"),
       r.getAs[Long]("n_vanished_terms"), r.getAs[Boolean]("rewrite_recommended")) }
    assert(row("base") == ((3L, 3L, 4L, 0L, false)))
    assert(row("delete") == ((1L, 1L, 1L, 0L, false)))
    assert(row("after") == ((2L, 2L, 3L, 1L, true))) // 8*1 >= 4
    // below the threshold: 8 * |delete| < |base postings| -> tombstone
    val big = (10L to 50L by 2).map(i => (i, "a b c")).toDF("doc_id", "text")
    val (bigTfs, _) = TextStats.indexSegment(big)
    val r2 = TextStats.indexDeleteReport(bigTfs, Seq(10L).toDF("doc_id"))
      .filter(col("scope") === "after").head()
    assert(!r2.getAs[Boolean]("rewrite_recommended")) // 8*3 < 63
    // the subtraction claim: global stats of the retained index are the
    // exact DIFFERENCE of base and delete stats — serving with
    // subtracted (df, N, total dl) equals the rebuild on retained docs
    val full = Tables.documents(spark, sfDir)
    val retained = full.filter(col("doc_id") % 10 =!= 6)
    val deleted = full.filter(col("doc_id") % 10 === 6)
    val q = TextStats.bm25QueryToks(retained)
    val (fTfs, fLens) = TextStats.indexSegment(full)
    val (dTfs, dLens) = TextStats.indexSegment(deleted)
    val afTfs = fTfs.join(deleted.select("doc_id"), Seq("doc_id"), "left_anti")
    val afLens = fLens.join(deleted.select("doc_id"), Seq("doc_id"), "left_anti")
    val dfsSub = fTfs.groupBy("tok").agg(count(lit(1)).as("df_b"))
      .join(dTfs.groupBy("tok").agg(count(lit(1)).as("df_d")), Seq("tok"), "left")
      .select(col("tok"), (col("df_b") - coalesce(col("df_d"), lit(0L))).as("df"))
      .filter(col("df") > 0)
    val statsSub = fLens.agg(count(lit(1)).as("nb"), sum("dl").as("tb"))
      .crossJoin(dLens.agg(count(lit(1)).as("nd"), sum("dl").as("td")))
      .select((col("nb") - col("nd")).as("n_docs"), (col("tb") - col("td")).as("tot"))
    val viaSub = TextStats.bm25ScoreTopK(afTfs, dfsSub, afLens, statsSub, q, 10, "doc_id")
      .collect().map(_.toSeq).toSeq
    val rebuild = TextStats.bm25TopK(retained).collect().map(_.toSeq).toSeq
    assert(viaSub.nonEmpty && viaSub == rebuild)
  }

  test("phraseSearchFromSegments: add-then-phrase == rebuild-then-phrase; index-native derivation == topNgrams") {
    val docs = Tables.documents(spark, sfDir)
    val even = TextStats.positionalSegment(docs.filter(col("doc_id") % 2 === 0))
    val odd = TextStats.positionalSegment(docs.filter(col("doc_id") % 2 === 1))
    val viaSegs = TextStats.phraseSearchFromSegments(Seq(even, odd))
      .collect().map(_.toSeq).toSeq
    val rebuild = TextStats.phraseSearch(docs).collect().map(_.toSeq).toSeq
    assert(viaSegs.nonEmpty && viaSegs == rebuild)
    // the query-set derivation FROM the index (position-chain joins)
    // equals the text-scan derivation — counts, ties, ordering
    val fromIdx = TextStats.topNgramsFromPostings(even.unionByName(odd))
      .collect().map(_.toSeq).toSeq
    val fromText = TextStats.topNgrams(docs).collect().map(_.toSeq).toSeq
    assert(fromIdx == fromText)
  }

  test("phraseSearchTombstone: untouched segments + one anti-join == retained-corpus rebuild; deleted ids never match") {
    val docs = Tables.documents(spark, sfDir)
    val retained = docs.filter(col("doc_id") % 10 =!= 6)
    val out = TextStats.phraseSearchTombstone(
        Seq(TextStats.positionalSegment(docs.filter(col("doc_id") % 2 === 0)),
          TextStats.positionalSegment(docs.filter(col("doc_id") % 2 === 1))),
        docs.select("doc_id").filter(col("doc_id") % 10 === 6))
      .collect().map(_.toSeq).toSeq
    val rebuild = TextStats.phraseSearch(retained).collect().map(_.toSeq).toSeq
    assert(out.nonEmpty && out == rebuild)
    assert(out.forall(r => r(1).asInstanceOf[Long] % 10 != 6))
  }

  test("bm25TopKTombstone: untouched segments + serve-time skip + subtracted stats == retained-corpus rebuild") {
    val docs = Tables.documents(spark, sfDir)
    val retained = docs.filter(col("doc_id") % 10 =!= 6)
    val (bTfs, bLens) = TextStats.indexSegment(docs.filter(col("doc_id") % 2 === 0))
    val (aTfs, aLens) = TextStats.indexSegment(docs.filter(col("doc_id") % 2 === 1))
    val out = TextStats.bm25TopKTombstone(Seq((bTfs, bLens), (aTfs, aLens)),
        docs.select("doc_id").filter(col("doc_id") % 10 === 6),
        TextStats.bm25QueryToks(retained))
      .collect().map(_.toSeq).toSeq
    val rebuild = TextStats.bm25TopK(retained).collect().map(_.toSeq).toSeq
    assert(out.nonEmpty && out == rebuild)
    // right-to-erasure: a deleted doc can never surface in any ranking
    assert(out.forall(r => r(2).asInstanceOf[Long] % 10 != 6))
  }

  test("mergePolicy: integer-log2 tiers, population rule fires at exactly mergeFactor") {
    import spark.implicits._
    // postings 5/6/7 share tier 2 (bit-length 3), 9 is tier 3 alone
    val stats = Seq((0L, 3L, 5L), (1L, 3L, 6L), (2L, 4L, 7L), (3L, 5L, 9L))
      .toDF("seg_id", "n_docs", "n_postings")
    val out = TextStats.mergePolicy(stats, mergeFactor = 3).collect()
      .map(r => r.getLong(0) -> (r.getLong(3), r.getLong(4), r.getBoolean(5))).toMap
    assert(out(0L) == ((2L, 3L, true)) && out(1L) == ((2L, 3L, true)) &&
      out(2L) == ((2L, 3L, true)))
    assert(out(3L) == ((3L, 1L, false)))
    // drop one tier-2 member -> population 2 < mergeFactor -> no merge
    val out2 = TextStats.mergePolicy(stats.filter(col("seg_id") =!= 0L), mergeFactor = 3)
      .collect().map(_.getBoolean(5))
    assert(out2.forall(!_))
  }

  test("binPackShards: snake deal equalizes a geometric fixture exactly; partitioning-invariant") {
    import spark.implicits._
    // lengths 8..1 over 4 bins: pass 0 deals 8,7,6,5 L-to-R, pass 1
    // deals 4,3,2,1 R-to-L -> every bin totals 9
    val docs = (1L to 8L).map(i => (i, ("tok " * (9 - i).toInt).trim))
      .toDF("doc_id", "text")
    val out = TextStats.binPackShards(docs, nBins = 4).collect()
    assert(out.length == 4)
    out.foreach { r =>
      assert(r.getAs[Long]("total_tokens") == 9L, s"unbalanced: $r")
      assert(r.getAs[Long]("padding_tokens") == 0L)
      assert(r.getAs[Double]("fill") == 1.0)
    }
    val again = TextStats.binPackShards(docs.repartition(7), nBins = 4)
      .collect().map(_.toSeq).toSeq
    assert(again == out.map(_.toSeq).toSeq)
  }

  test("compactSegments + indexCompactReport: store content == segment union, hand-computed gain, query-equivalence after the act") {
    import spark.implicits._
    // the t37 hand fixture: base varint 5, add 4, merged 8 -> gain 1
    val docs = Seq((0L, "a b"), (20000L, "a"), (9999L, "a d")).toDF("doc_id", "text")
    val (bTfs, _) = TextStats.indexSegment(docs.filter(col("doc_id") % 2 === 0))
    val (aTfs, _) = TextStats.indexSegment(docs.filter(col("doc_id") % 2 === 1))
    val store = tmpDir("compact_store").toString
    TextStats.compactSegments(Seq(bTfs, aTfs)).write.mode("overwrite").parquet(store)
    val compacted = spark.read.parquet(store)
    // content-complete, nothing duplicated
    val union = bTfs.unionByName(aTfs)
    assert(compacted.count() == union.count())
    assert(compacted.exceptAll(union).isEmpty && union.exceptAll(compacted).isEmpty)
    val r = TextStats.indexCompactReport(compacted, Seq(bTfs, aTfs)).head()
    assert(r.toSeq == Seq(3L, 3L, 5L, 8L, 9L, 1L), s"got ${r.toSeq}")
    // the act preserves serving: BM25 through the compacted store ==
    // through the separate segments == the rebuild
    val full = Tables.documents(spark, sfDir)
    val q = TextStats.bm25QueryToks(full)
    val (fb, fbl) = TextStats.indexSegment(full.filter(col("doc_id") % 2 === 0))
    val (fa, fal) = TextStats.indexSegment(full.filter(col("doc_id") % 2 === 1))
    val store2 = tmpDir("compact_store_full").toString
    TextStats.compactSegments(Seq(fb, fa)).write.mode("overwrite").parquet(store2)
    val viaCompacted = TextStats.bm25TopKFromSegments(
      Seq((spark.read.parquet(store2), fbl.unionByName(fal))), q)
      .collect().map(_.toSeq).toSeq
    val rebuild = TextStats.bm25TopK(full).collect().map(_.toSeq).toSeq
    assert(viaCompacted.nonEmpty && viaCompacted == rebuild)
  }

  test("bm25TopKFromSegments: add-then-query == rebuild-then-query, at 2 and 3 segments") {
    val docs = Tables.documents(spark, sfDir)
    val q = TextStats.bm25QueryToks(docs)
    val full = TextStats.bm25TopK(docs).collect().map(_.toSeq).toSeq
    val two = Seq(
      TextStats.indexSegment(docs.filter(col("doc_id") % 2 === 0)),
      TextStats.indexSegment(docs.filter(col("doc_id") % 2 === 1)))
    assert(full.nonEmpty)
    assert(TextStats.bm25TopKFromSegments(two, q).collect().map(_.toSeq).toSeq == full)
    // any doc-disjoint segmentation serves the same ranks: global stats
    // are pure sums, scores decimal-summed 6dp partials
    val three = Seq(
      TextStats.indexSegment(docs.filter(col("doc_id") % 4 === 0)),
      TextStats.indexSegment(docs.filter(col("doc_id") % 4 === 1)),
      TextStats.indexSegment(docs.filter(col("doc_id") % 4 >= 2)))
    assert(TextStats.bm25TopKFromSegments(three, q).collect().map(_.toSeq).toSeq == full)
  }

  test("temperatureMix: budgets ∝ √tokens (flatter than natural shares), sum <= B, allocation == tokenBudgetMix on the derived budgets") {
    val docs = Tables.documents(spark, sfDir)
    val out = TextStats.temperatureMix(docs, totalBudget = 8000L).collect()
    assert(out.nonEmpty)
    // recompute the budget table the contract way
    val perLang = docs.filter(col("text").isNotNull)
      .select(col("lang"),
        size(regexp_extract_all(col("text"), lit("\\S+"), lit(0))).cast("long").as("n"))
      .groupBy("lang").agg(sum("n").as("n")).collect()
      .map(r => (r.getString(0), r.getLong(1))).sortBy(_._1)
    def r6(x: Double) = math.floor(x * 1e6 + 0.5) / 1e6
    val w = perLang.map { case (l, n) => (l, r6(math.sqrt(n.toDouble))) }
    val tot = w.map { case (_, r) =>
      new java.math.BigDecimal(r).setScale(6, java.math.RoundingMode.HALF_UP)
    }.foldLeft(java.math.BigDecimal.ZERO)(_ add _).doubleValue
    val budgets = w.map { case (l, r) => l -> math.floor((r * 8000.0) / tot).toLong }.toMap
    assert(budgets.values.sum <= 8000L)
    // temperature flattening: the dominant language's budget share is
    // STRICTLY below its natural token share (the point of α = 1/2)
    val totalTok = perLang.map(_._2).sum.toDouble
    val (bigLang, bigTok) = perLang.maxBy(_._2)
    assert(budgets(bigLang).toDouble / budgets.values.sum < bigTok / totalTok)
    // every emitted row carries its language budget and respects it
    out.foreach { r =>
      val b = budgets(r.getAs[String]("lang"))
      assert(r.getAs[Long]("lang_budget") == b)
      assert(r.getAs[Long]("cum_tokens") - r.getAs[Long]("n_tokens") < b)
    }
    // composition: identical rows to tokenBudgetMix fed the same budgets
    val chained = TextStats.tokenBudgetMix(docs, budgets, defaultBudget = 0L)
      .collect().map(_.toSeq).toSeq
    assert(out.map(_.toSeq.dropRight(1)).toSeq == chained)
  }
}
