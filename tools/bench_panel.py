#!/usr/bin/env python3
"""Isolated-process min-of-3 panel over the heaviest sf10 entries (r10
verdict item 2: the full fourth-decade drive is single-round and
JVM-state-contaminated; the record of truth for the heavy tail must be
min-of-3 with per-entry process isolation).

Each entry runs in its OWN plain-java JVM (no sbt parent, no cross-entry
heap/page-cache state) with SPARK_GRAFT_BENCH_ROUNDS=3 — Bench reports the
in-process min and median. Results aggregate to target/bench_<sf>_panel.json.

r14 additions (VERDICT r13 items 1b and 4):
  - cross-round cross-check: each entry carries prev_min (the prior round's
    committed panel min), ratio, and a `flag` that fires on ratio > 2 WITH
    healthy box coefficients — the exact signature that separated the §0h.5
    canary contamination from box bursts. Prior artifact auto-discovered
    from BENCH_<sf>_panel_r{N}.json in the repo root (override: --prev=...).
  - bimodal-entry protocol: when an entry's first JVM reads far above its
    prior round (ratio > 1.5) or is internally spread (median/min > 1.5),
    the entry re-runs in FRESH JVMs until the two smallest JVM mins agree
    within 20% (cap 4 JVMs). The artifact records every JVM min
    (`jvm_mins`), the `warm_floor` (min across JVMs — the number a reader
    can trust unaccompanied), and `stable`. The headline min/median are the
    floor JVM's.

Usage: python3 tools/bench_panel.py [sfDir] [entry ...] [--prev=path]
       python3 tools/bench_panel.py --selftest
Must run on an otherwise idle box (timing fidelity).
"""
import glob, json, os, re, subprocess, sys, time

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
    for k in ("canary_cpu_s", "canary_mem_s", "box_cpu_coef", "box_mem_coef",
              "canary_sched_s", "box_sched_coef"):
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


HEALTHY_COEF = 1.3   # box coefficient below this reads "healthy"
FLAG_RATIO = 2.0     # vs-prev ratio that must be explained
RERUN_RATIO = 1.5    # first-JVM-vs-prev (or median/min) spread that triggers re-runs
STABLE_TOL = 1.2     # two smallest JVM mins within this ratio = stable
MAX_JVMS = 4


def compare_prev(rec, prev_entry):
    """Attach prev_min / ratio / flag (pure function — exercised by --selftest).

    flag fires on warm_floor > FLAG_RATIO x prev min WITH healthy box
    coefficients: a slow entry whose own JVM's canaries read healthy is NOT
    box-attributable — that is the r13 §0h.5 contamination signature, and it
    must be investigated, not narrated.
    """
    if not prev_entry or "min" not in prev_entry or prev_entry["min"] <= 0:
        return rec
    prev_min = prev_entry["min"]
    floor = rec.get("warm_floor", rec["min"])
    rec["prev_min"] = prev_min
    rec["ratio"] = round(floor / prev_min, 3)
    # "Healthy box" needs POSITIVE EVIDENCE (ADVICE r14): absent keys or the
    # -1.0 SKIP_CANARY sentinel used to default-pass the `< HEALTHY_COEF`
    # check, so a run with no box evidence could fire the contamination flag.
    # Require every coefficient the artifact carries to be present and >= 0;
    # otherwise the record is box-unknown and the flag stays silent (an
    # unexplained slow entry without box evidence is re-run, not flagged).
    # box_sched_coef joins the rule (r14 Next #8): the r15 quiet-box
    # arbitration confirmed the sched axis and re-pinned its reference, so a
    # sched-inflated box is box-attributable like cpu/mem, not flag-worthy.
    coefs = [rec.get("box_cpu_coef"), rec.get("box_mem_coef")]
    if "box_sched_coef" in rec:
        coefs.append(rec.get("box_sched_coef"))
    if any(c is None or not isinstance(c, (int, float)) or c < 0 for c in coefs):
        rec["box_evidence"] = "unknown"
        return rec
    healthy = all(c < HEALTHY_COEF for c in coefs)
    if rec["ratio"] > FLAG_RATIO and healthy:
        rec["flag"] = "regression-or-contamination: ratio %.2f with healthy box" \
            % rec["ratio"]
    return rec


def needs_rerun(rec, prev_entry):
    """First-JVM verdict: re-run in fresh JVMs if the number is suspect."""
    if prev_entry and prev_entry.get("min", 0) > 0 \
            and rec["min"] > RERUN_RATIO * prev_entry["min"]:
        return True
    return rec["min"] > 0 and rec["median"] / rec["min"] > RERUN_RATIO


def stabilize(sfdir, entry, first_rec, prev_entry):
    """Bimodal protocol: fresh JVMs until the two smallest mins agree within
    STABLE_TOL (cap MAX_JVMS). Returns the floor JVM's record carrying
    jvm_mins / warm_floor / stable."""
    recs = [first_rec]
    jvm_mins = [first_rec["min"]]
    while len(recs) < MAX_JVMS:
        s = sorted(jvm_mins)
        if len(s) >= 2 and s[1] <= STABLE_TOL * s[0]:
            break
        print(f"  bimodal protocol: re-running {entry} "
              f"(jvm_mins so far {s})", flush=True)
        r = run_entry(sfdir, entry)
        if r is None:
            break
        recs.append(r)
        jvm_mins.append(r["min"])
    best = min(recs, key=lambda r: r["min"])
    s = sorted(jvm_mins)
    best["jvm_mins"] = [round(m, 3) for m in jvm_mins]
    best["warm_floor"] = round(s[0], 3)
    best["stable"] = len(s) >= 2 and s[1] <= STABLE_TOL * s[0]
    return best


def find_prev(sfname, argv):
    """Prior-round committed panel: --prev=path or highest BENCH_<sf>_panel_r{N}."""
    for a in argv:
        if a.startswith("--prev="):
            p = a.split("=", 1)[1]
            return (json.load(open(p)).get("entries", {}), p) if p else ({}, None)
    best_n, best_p = -1, None
    for p in glob.glob(f"BENCH_{sfname}_panel_r*.json"):
        m = re.search(r"_r(\d+)\.json$", p)
        if m and int(m.group(1)) > best_n:
            best_n, best_p = int(m.group(1)), p
    if best_p:
        return json.load(open(best_p)).get("entries", {}), best_p
    return {}, None


def selftest():
    # the flag fires: 2.5x regression under healthy coefs
    r = compare_prev({"min": 25.0, "median": 26.0, "box_cpu_coef": 0.9,
                      "box_mem_coef": 1.0}, {"min": 10.0})
    assert r["ratio"] == 2.5 and "flag" in r, r
    # no flag when the box itself is inflated (box-attributable)
    r = compare_prev({"min": 25.0, "median": 26.0, "box_cpu_coef": 0.9,
                      "box_mem_coef": 2.2}, {"min": 10.0})
    assert r["ratio"] == 2.5 and "flag" not in r, r
    # no flag without box EVIDENCE: absent coef -> box-unknown, not healthy
    r = compare_prev({"min": 25.0, "median": 26.0, "box_cpu_coef": 0.9},
                     {"min": 10.0})
    assert r["ratio"] == 2.5 and "flag" not in r \
        and r.get("box_evidence") == "unknown", r
    # nor with the -1.0 SKIP_CANARY sentinel
    r = compare_prev({"min": 25.0, "median": 26.0, "box_cpu_coef": -1.0,
                      "box_mem_coef": -1.0}, {"min": 10.0})
    assert "flag" not in r and r.get("box_evidence") == "unknown", r
    # sched coef joins the health rule when present: inflated sched -> no flag
    r = compare_prev({"min": 25.0, "median": 26.0, "box_cpu_coef": 0.9,
                      "box_mem_coef": 1.0, "box_sched_coef": 2.4}, {"min": 10.0})
    assert "flag" not in r, r
    r = compare_prev({"min": 25.0, "median": 26.0, "box_cpu_coef": 0.9,
                      "box_mem_coef": 1.0, "box_sched_coef": 0.8}, {"min": 10.0})
    assert "flag" in r, r
    # no flag inside the 2x band
    r = compare_prev({"min": 18.0, "median": 19.0, "box_cpu_coef": 0.9,
                      "box_mem_coef": 1.0}, {"min": 10.0})
    assert "flag" not in r, r
    # warm_floor (not the headline min) is what's compared
    r = compare_prev({"min": 30.0, "median": 31.0, "warm_floor": 11.0,
                      "box_cpu_coef": 0.9, "box_mem_coef": 1.0}, {"min": 10.0})
    assert r["ratio"] == 1.1 and "flag" not in r, r
    # rerun trigger: vs-prev and internal spread
    assert needs_rerun({"min": 16.0, "median": 17.0}, {"min": 10.0})
    assert needs_rerun({"min": 10.0, "median": 16.0}, None)
    assert not needs_rerun({"min": 11.0, "median": 12.0}, {"min": 10.0})
    print("selftest OK", flush=True)


def main():
    if "--selftest" in sys.argv:
        selftest()
        return
    args = [a for a in sys.argv[1:] if not a.startswith("--")]
    sfdir = args[0] if args else "target/testdata/sf10"
    entries = args[1:] or DEFAULT_ENTRIES
    sfname = os.path.basename(sfdir.rstrip("/"))
    out_path = f"target/bench_{sfname}_panel.json"
    prev, prev_path = find_prev(sfname, sys.argv[1:])
    if prev_path:
        print(f"cross-round baseline: {prev_path} ({len(prev)} entries)",
              flush=True)
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
            if needs_rerun(rec, prev.get(e)):
                rec = stabilize(sfdir, e, rec, prev.get(e))
            rec = compare_prev(rec, prev.get(e))
            if "flag" in rec:
                print(f"  FLAG {e}: {rec['flag']}", flush=True)
            results[e] = rec
        json.dump({"sf": sfdir, "isolated_process": True,
                   "rounds_per_entry": 3, "prev_panel": prev_path,
                   "entries": results},
                  open(out_path, "w"), indent=1)
    print(f"panel written: {out_path} ({len(results)} entries)", flush=True)


if __name__ == "__main__":
    main()
