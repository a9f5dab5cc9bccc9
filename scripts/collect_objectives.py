"""Collect the round-4 retrieval-objective experiment into
results/train_10m_objectives.json (DESIGN §11c measurements)."""
import json
import re

RUNS = {
    "bce_k1": ("/tmp/r3_obj_bce_k1",
               "control: reference objective (1-vs-1 BCE, uniform; "
               "src/train.py:86-93 semantics)"),
    "bce_k8": ("/tmp/r4_obj_bce_k8",
               "BCE, K=8 uniform negatives per positive"),
    "sm_k8_uni": ("/tmp/r4_obj_sm_k8_uni",
                  "sampled softmax, K=8 uniform"),
    "sm_k8_pop": ("/tmp/r4_obj_sm_k8_pop",
                  "sampled softmax, K=8 popularity + logQ correction"),
    "sm_k8_uni_sel": ("/tmp/r4_obj_sm_k8_uni_sel",
                      "sampled softmax, K=8 uniform + "
                      "select_by=retrieval_hr retention"),
    "sm_k32_pop": ("/tmp/r4_obj_sm_k32_pop",
                   "sampled softmax, K=32 popularity + logQ"),
    "sm_k8_pop_e20": ("/tmp/r4_obj_sm_k8_pop_e20",
                      "sampled softmax, K=8 popularity + logQ, 20 epochs"),
    "sm_k8_uni_e20": ("/tmp/r4_obj_sm_k8_uni_e20",
                      "sampled softmax, K=8 uniform, 20 epochs + "
                      "select_by=retrieval_hr"),
    "sm_k8_pop_cos": ("/tmp/r4_obj_sm_k8_pop_cos",
                      "sampled softmax, K=8 popularity + logQ, cosine lr "
                      "decay over the 10 epochs + select_by=retrieval_hr"),
}

out = {"preset": "synthetic10m", "epochs": 10, "early_stop": 20,
       "eval_retrieval_every": 1, "date": "2026-08-20",
       "hardware": "1 TPU v5e chip (axon tunnel)",
       "note": ("identical catalog/seed across runs; bce_k1 measured "
                "round 3 (same code path), the rest round 4. Offline "
                "rows are scripts/eval_retrieval_offline.py on the "
                "retained checkpoints (test split, k=10).")}
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
        # the "final: {...}" line is a printed dict literal — parse it as
        # one (ast.literal_eval cannot execute code, unlike eval; the log
        # file is not a trusted input channel)
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
        # retained-checkpoint sidecar (train/checkpoint.py): proves which
        # epoch retention kept and by which metric it was selected
        entry["retained_best_sidecar"] = json.load(
            open(d + "/ckpt/best/metrics.json"))
    except FileNotFoundError:
        pass
    runs[name] = entry
out["runs"] = runs
print(json.dumps(out, indent=1, default=str))
