#!/usr/bin/env python3
"""Isolated-process min-of-3 panel over the heaviest sf10 entries (r10
verdict item 2: the full fourth-decade drive is single-round and
JVM-state-contaminated; the record of truth for the heavy tail must be
min-of-3 with per-entry process isolation).

Each entry runs in its OWN plain-java JVM (no sbt parent, no cross-entry
heap/page-cache state) with SPARK_GRAFT_BENCH_ROUNDS=3 — Bench reports the
in-process min and median. Results aggregate to target/bench_<sf>_panel.json.

Usage: python3 tools/bench_panel.py [sfDir] [entry ...]
Must run on an otherwise idle box (timing fidelity).
"""
import json, os, subprocess, sys, time

# top-25 of the r10 full sf10 drive by single-round cost, plus q37 (q21's
# bounded-heap twin — the q21-fix comparison pair)
DEFAULT_ENTRIES = [
    "q17_product_affinity", "dd06_embedding_neardup_lsh", "dd02_ngram_jaccard",
    "ck02_token_chunking", "pp01_corpus_pipeline", "dd13_lsh_eval",
    "q15_market_basket", "dd11_dedup_policy", "pp03_curation_chain",
    "q21_top_parts_per_brand", "sp02_contamination_safe_split",
    "dd14_sampled_confirm", "ts01_sparse_text_cosine", "q35_rfm_scores",
    "dd07_dedup_survivors", "ts02_dedup_clusters", "sp01_leakage_safe_split",
    "cur01_curriculum_phases", "tx05_normalize", "st11_streaming_dedup",
    "dd01_exact_dedup", "mm07_real_frame_extract",
    "dc03_semantic_decontamination", "q01_pricing_summary",
    "q24_session_stats", "q37_topk_custom_operator",
    # r12: the kNN label-noise screen joins the panel as its SIZE-PINNED
    # twin (absolute ~2000-query audit, linear in corpus size) — knn01's 5%
    # rate slice is quadratic-class by construction and would dominate panel
    # growth at larger scales (r11 advisory; SCALE.md §0f.8)
    "knn02_knn_label_eval_pinned",
    # r12: the wide-geometry recall-dial twin (the heaviest LSH point shipped)
    "dd15_embedding_neardup_lsh_wide",
    # r13: the per-key sweep aggregate (certified 2.16x on the 3.33x fourth
    # decade, §0h.4) and the LTTB downsample (window input saturates with the
    # time range — the panel pins that it STAYS flat)
    "q56_interval_length_sum", "lt01_lttb_downsample",
]

ADD_OPENS = [f"--add-opens={p}=ALL-UNNAMED" for p in [
    "java.base/java.lang", "java.base/java.lang.invoke",
    "java.base/java.lang.reflect", "java.base/java.io", "java.base/java.net",
    "java.base/java.nio", "java.base/java.util",
    "java.base/java.util.concurrent", "java.base/java.util.concurrent.atomic",
    "java.base/sun.nio.ch", "java.base/sun.nio.cs",
    "java.base/sun.security.action", "java.base/sun.util.calendar"]]


def run_entry(sfdir, entry, xmx="100g"):
    sfname = os.path.basename(sfdir.rstrip("/"))
    filtered = f"target/bench_{sfname}_filtered.json"
    if os.path.exists(filtered):
        os.remove(filtered)
    env = dict(os.environ, SPARK_GRAFT_SF_DIR=sfdir,
               SPARK_GRAFT_BENCH_ONLY=entry, SPARK_GRAFT_BENCH_ROUNDS="3",
               SPARK_GRAFT_CPUS="32")
    cmd = (["java", f"-Xmx{xmx}"] + ADD_OPENS +
           ["-Dspark.ui.enabled=false", "-Dspark.sql.session.timeZone=UTC",
            "-cp", "target/scala-2.13/classes:/opt/spark/jars/*", "graft.Bench"])
    t0 = time.time()
    p = subprocess.run(cmd, env=env, capture_output=True, text=True)
    wall = time.time() - t0
    if p.returncode != 0 or not os.path.exists(filtered):
        print(f"FAIL {entry}: rc={p.returncode} stderr tail: {p.stderr[-500:]}",
              flush=True)
        return None
    d = json.load(open(filtered))
    rec = {"min": d["queries"][entry], "median": d["queries_median"][entry],
           "runs": d["runs"], "process_wall_sec": round(wall, 1),
           "codegen_fallbacks": d["codegen_fallbacks"]}
    # r13: each panel JVM runs the calibration canaries first (Bench §canary);
    # carrying the per-entry coefficients makes the panel protocol's same-day
    # box witness structural — an entry far above its class is box-attributable
    # on sight when its own JVM's box_mem_coef is inflated too.
    for k in ("canary_cpu_s", "canary_mem_s", "box_cpu_coef", "box_mem_coef"):
        if k in d:
            rec[k] = d[k]
    if d.get("streaming_setup_sec", -1) >= 0:
        rec["streaming_setup_sec"] = d["streaming_setup_sec"]
    # omit the box clause entirely for pre-canary / SKIP_CANARY runs rather
    # than rendering the literal string 'None' (r13 ADVICE)
    box = (f", box cpu={rec['box_cpu_coef']} mem={rec['box_mem_coef']}"
           if "box_cpu_coef" in rec and "box_mem_coef" in rec else "")
    print(f"PANEL {entry}: min={rec['min']} median={rec['median']} "
          f"(proc {wall:.0f}s{box})", flush=True)
    return rec


def main():
    sfdir = sys.argv[1] if len(sys.argv) > 1 else "target/testdata/sf10"
    entries = sys.argv[2:] or DEFAULT_ENTRIES
    sfname = os.path.basename(sfdir.rstrip("/"))
    out_path = f"target/bench_{sfname}_panel.json"
    # resume-friendly: keep already-measured entries
    results = {}
    if os.path.exists(out_path):
        results = json.load(open(out_path)).get("entries", {})
    for e in entries:
        if e in results:
            print(f"skip {e} (already in panel)", flush=True)
            continue
        rec = run_entry(sfdir, e)
        if rec:
            results[e] = rec
        json.dump({"sf": sfdir, "isolated_process": True,
                   "rounds_per_entry": 3, "entries": results},
                  open(out_path, "w"), indent=1)
    print(f"panel written: {out_path} ({len(results)} entries)", flush=True)


if __name__ == "__main__":
    main()
