"""A/B the jnp attention head-layout formulations (DESIGN §13 round-5).

Round-4 profiling attributed ~15% of flagship device time to layout-
repair copies around the [B,H,L,dh] head transposes (bf16 [512,50,2,32]
flips) plus ~4% RNG mask-layout copies. Per §13's isolate-first lesson,
this script measures each `models/attention._FORMULATION` twice:

1. ISOLATED: fwd+bwd of `masked_attention` alone at the flagship
   cross-attention shape ([2B, L, d], dropout 0.5), scanned to amortize
   the ~1.3–5 ms relay dispatch floor.
2. END-TO-END: the full flagship train step (bench.build_setup), the
   same protocol as bench.py (median of 5 windows).

Usage: python scripts/ab_attention_layout.py [--skip_e2e] [--windows 5]

Prints one JSON line per (formulation, mode). No reference counterpart
(the reference has a single torch formulation, src/carca.py:242-244).
"""

from __future__ import annotations

import argparse
import json
import os
import statistics
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import jax
import jax.numpy as jnp
import numpy as np

FORMULATIONS = ("bhqk", "blhd", "hb_fold")


def isolated(form: str, n_scan: int = 200, windows: int = 5):
    """fwd+bwd of masked_attention at the flagship decoder shape."""
    from carca_tpu.models import attention
    from carca_tpu.utils.timing import sync

    attention._FORMULATION = form
    b, l, d, h = 512, 50, 64, 2  # ca decoder: targets batch-folded to 2B
    rng = np.random.default_rng(0)
    q = jnp.asarray(rng.normal(size=(b, l, d)), jnp.float32)
    k = jnp.asarray(rng.normal(size=(b, l, d)), jnp.float32)
    v = jnp.asarray(rng.normal(size=(b, l, d)), jnp.float32)
    qm = jnp.ones((b, l), jnp.float32)
    km = jnp.ones((b, l), jnp.float32)

    def loss(q, k, v, key):
        out = attention.masked_attention(
            q, k, v, qm, km, n_heads=h, causal=-1, scale=(d / h) ** 0.5,
            dropout_rate=0.5, train=True, rng=key)
        return jnp.sum(out * out)

    grad = jax.grad(loss, argnums=(0, 1, 2))

    @jax.jit
    def scanned(q, k, v, key):
        def body(c, _):
            qc, kc, vc, key = c
            key, sub = jax.random.split(key)
            gq, gk, gv = grad(qc, kc, vc, sub)
            # feed grads back so the scan cannot be DCE'd or hoisted
            return (qc + 1e-9 * gq, kc + 1e-9 * gk, vc + 1e-9 * gv, key), ()
        (qo, _, _, _), _ = jax.lax.scan(body, (q, k, v, key), None,
                                        length=n_scan)
        return jnp.sum(qo)

    key = jax.random.PRNGKey(0)
    sync(scanned(q, k, v, key))  # compile + warm
    times = []
    for _ in range(windows):
        t0 = time.perf_counter()
        sync(scanned(q, k, v, key))
        times.append((time.perf_counter() - t0) / n_scan * 1e6)
    return statistics.median(times)  # us per fwd+bwd


def end_to_end(form: str, windows: int = 5):
    """Full flagship train step, bench.py protocol, in a SUBPROCESS —
    each formulation traces a different program and jit caches would
    otherwise let the previous build leak compile time into the next."""
    import subprocess
    code = f"""
import json, statistics, time, sys
sys.path.insert(0, {os.path.dirname(os.path.dirname(os.path.abspath(__file__)))!r})
from carca_tpu.models import attention
attention._FORMULATION = {form!r}
from bench import build_setup
from carca_tpu.utils.timing import sync
step, state, attrs, dd, chunks, inner, tc, mc = build_setup("flagship", 256)
for i in range(2):
    state, losses = step(state, attrs, dd.arrays, chunks[i % len(chunks)])
sync(losses)
n_calls = max(1, 100 // inner)
rates = []
for _ in range({windows}):
    t0 = time.perf_counter()
    for i in range(n_calls):
        state, losses = step(state, attrs, dd.arrays, chunks[i % len(chunks)])
    sync(losses)
    rates.append(n_calls * inner * tc.batch_size / (time.perf_counter() - t0))
print("RESULT " + json.dumps(sorted(rates)))
"""
    proc = subprocess.run([sys.executable, "-c", code], capture_output=True,
                          text=True, timeout=900)
    for line in proc.stdout.splitlines():
        if line.startswith("RESULT "):
            rates = json.loads(line[len("RESULT "):])
            return statistics.median(rates), rates
    raise RuntimeError(f"e2e subprocess failed for {form}:\n"
                       f"{proc.stdout[-1000:]}\n{proc.stderr[-2000:]}")


def main() -> None:
    ap = argparse.ArgumentParser()
    ap.add_argument("--skip_e2e", action="store_true")
    ap.add_argument("--skip_isolated", action="store_true")
    ap.add_argument("--windows", type=int, default=5)
    args = ap.parse_args()

    for form in FORMULATIONS:
        if not args.skip_isolated:
            us = isolated(form, windows=args.windows)
            print(json.dumps({"mode": "isolated_fwd_bwd", "form": form,
                              "us_per_call": round(us, 1)}), flush=True)
    for form in FORMULATIONS:
        if not args.skip_e2e:
            med, rates = end_to_end(form, windows=args.windows)
            print(json.dumps({"mode": "train_step", "form": form,
                              "examples_per_sec": round(med, 1),
                              "rates": [round(r, 1) for r in rates]}),
                  flush=True)


if __name__ == "__main__":
    main()
