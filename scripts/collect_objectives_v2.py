"""Collect the round-5 v2 ("markov") retrieval-objective grid into
results/train_10m_objectives_v2.json (DESIGN §11c round-5 rerun on data
with real preference/sequential structure; runs produced by
scripts/run_v2_objectives.sh)."""
import json
import re

RUNS = {
    "bce_k1": ("/tmp/r5v2_bce_k1",
               "control: reference objective (1-vs-1 BCE, uniform; "
               "src/train.py:86-93 semantics)"),
    "sm_k8_uni_sel": ("/tmp/r5v2_sm_k8_uni_sel",
                      "sampled softmax, K=8 uniform + "
                      "select_by=retrieval_hr retention"),
    "sm_k8_pop_sel": ("/tmp/r5v2_sm_k8_pop_sel",
                      "sampled softmax, K=8 popularity + logQ + "
                      "select_by=retrieval_hr (the production recipe)"),
    "sm_k8_pop_id": ("/tmp/r5v2_sm_k8_pop_id",
                     "recipe with --embedding id: the attr/ctx-machinery "
                     "ablation (src/carca.py:66-198 is what 'all' adds)"),
    # extensions (scripts/run_v2_ext.sh): probing the 0.115 Bayes ceiling
    "sm_k8_pop_cos": ("/tmp/r5v2_sm_k8_pop_cos",
                      "recipe + cosine LR decay over the 10 epochs"),
    "sm_k8_pop_lr3e4": ("/tmp/r5v2_sm_k8_pop_lr3e4",
                        "recipe at base lr 3e-4 (vs default 1e-3)"),
    "sm_k32_pop": ("/tmp/r5v2_sm_k32_pop",
                   "recipe with K=32 negatives (saturation probe on "
                   "non-saturated data)"),
}

out = {"preset": "synthetic10m", "synthetic_process": "markov",
       "epochs": 10, "early_stop": 20, "eval_retrieval_every": 1,
       "date": "2026-08-21",
       "hardware": "1 TPU v5e chip (axon tunnel)",
       "calibration": "results/oracle_markov_10m.json — popularity "
                      "baseline test-HR@10 0.0178, generative-Bayes "
                      "ceiling 0.1153 (6.5x headroom)",
       "note": ("identical v2 catalog/seed across runs. Offline rows are "
                "scripts/eval_retrieval_offline.py on the retained "
                "checkpoints (test split, k=10)."),
       "incidents": ("core-grid sm_k8_uni_sel hung >72 min in the "
                     "post-epoch-1 orbax latest-save D2H (relay stall "
                     "pattern, CLAUDE.md; documented envelope is "
                     "10-35 min) and was killed; its ep1 best checkpoint "
                     "committed and scored offline test-HR@10 0.0106 "
                     "before the retry run replaced it.")}
runs = {}
for name, (d, desc) in RUNS.items():
    try:
        log = open(d + ".log").read()
    except FileNotFoundError:
        continue
    curve = [
        {"epoch": int(m.group(1)), "hr": float(m.group(2)),
         "ndcg": float(m.group(3))}
        for m in re.finditer(
            r"Epoch (\d+): Retrieval@10 \(val\) HR = ([\d.]+), "
            r"NDCG = ([\d.]+)", log)]
    val = [
        {"epoch": int(m.group(1)), "hr": float(m.group(3)),
         "ndcg": float(m.group(4))}
        for m in re.finditer(
            r"Epoch (\d+): Val Loss = ([\d.]+) HR = ([\d.]+), "
            r"NDCG = ([\d.]+)", log)]
    rate = [int(m.group(1)) for m in re.finditer(r"\((\d+) ex/s\)", log)]
    fin = re.search(r"final: (\{.*\})", log)
    entry = {
        "objective": desc,
        "retrieval_val_hr_curve": {c["epoch"]: c["hr"] for c in curve},
        "retrieval_val_ndcg_curve": {c["epoch"]: c["ndcg"] for c in curve},
        "retrieval_val_peak_hr": max((c["hr"] for c in curve),
                                     default=None),
        "retrieval_val_last_hr": curve[-1]["hr"] if curve else None,
        "sampled_val_peak_ndcg": max((v["ndcg"] for v in val),
                                     default=None),
        "train_examples_per_sec_steady": max(rate) if rate else None,
    }
    if fin:
        # printed dict literal — parse as one, never execute (advisor)
        import ast
        try:
            entry["final"] = ast.literal_eval(fin.group(1))
        except (ValueError, SyntaxError):
            entry["final_unparsed"] = fin.group(1)
    try:
        offline = [json.loads(l) for l in open(d + ".offline.jsonl")]
        entry["offline_test"] = {o["which"]: o for o in offline}
    except FileNotFoundError:
        pass
    try:
        entry["retained_best_sidecar"] = json.load(
            open(d + "/ckpt/best/metrics.json"))
    except FileNotFoundError:
        pass
    runs[name] = entry
out["runs"] = runs
print(json.dumps(out, indent=1, default=str))
