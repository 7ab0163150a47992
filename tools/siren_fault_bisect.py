"""Root-cause the 500-step scanned-SIREN TPU worker fault (VERDICT r4 item 5).

Round-4 observation: `train_scan` with the SIREN field faults the TPU
worker at 500 steps but runs clean at 100; the MLP field runs 500-step
scans fine. Hypothesis under test: the fault is a PROGRAM-DURATION limit
of the tunneled runtime (a single XLA program running longer than some
watchdog), not a SIREN-specific miscompile — SIREN's step is ~2.4x the
MLP's, so 500 SIREN steps ~ 73 s of device time in ONE program while 500
MLP steps ~ 10 s.

Protocol: each probe runs in a SUBPROCESS (a worker fault must not kill
the harness) and scans N steps in one program for (field, N) points
chosen so the MLP crosses the SIREN-500 duration (~73 s): if MLP at
~4000 steps faults too, the trigger is duration, not the field. Probes
run in increasing-duration order and stop at the first fault (a faulted
worker can wedge the tunnel for subsequent processes — run this LAST in
a measurement session).

Writes docs/siren_fault.json.
Run (chip, LAST): python tools/siren_fault_bisect.py
"""
from __future__ import annotations

import json
import os
import subprocess
import sys
import time

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))

PROBE = r"""
import sys, time
import numpy as np, jax, jax.numpy as jnp
sys.path.insert(0, __REPO__)
from nerf_siren_tpu.config import NeRFConfig, RenderConfig, TrainConfig
from nerf_siren_tpu.training.system import NeRFSystem

field, steps = __FIELD__, __STEPS__
rng = np.random.default_rng(0)
n = 65536
d = rng.normal(size=(n, 3)).astype(np.float32)
d /= np.linalg.norm(d, axis=-1, keepdims=True)
rays = np.concatenate([np.zeros((n, 3), np.float32), d,
                       np.full((n, 1), 2, np.float32),
                       np.full((n, 1), 6, np.float32)], -1)
rgbs = rng.uniform(0, 1, (n, 3)).astype(np.float32)
system = NeRFSystem(
    RenderConfig(n_samples=64, n_importance=64, perturb=1.0, noise_std=1.0,
                 white_back=True),
    TrainConfig(lr=1e-4 if field == "siren" else 5e-4, batch_size=4096,
                decay_step=(100,), num_epochs=1),
    NeRFConfig(), steps_per_epoch=steps, field_type=field)
state = system.init_state(jax.random.PRNGKey(0))
rays_d, rgbs_d = jnp.asarray(rays), jnp.asarray(rgbs)
# warm a SHORT scan first so the long program's time is execution-dominated
state, m = system.train_scan(state, rays_d, rgbs_d, jax.random.PRNGKey(0), 10)
float(m["train/loss"])
t0 = time.perf_counter()
state, m = system.train_scan(state, rays_d, rgbs_d, jax.random.PRNGKey(1),
                             steps)
loss = float(m["train/loss"])
print(f"OK steps={steps} field={field} wall={time.perf_counter()-t0:.1f}s "
      f"loss={loss:.4f}", flush=True)
"""


def main():
    import argparse
    ap = argparse.ArgumentParser()
    ap.add_argument("--max_est", type=int, default=10**9,
                    help="skip probes whose estimated single-program device "
                    "time exceeds this many seconds. Use to bracket the "
                    "fault boundary from below WITHOUT triggering a fault "
                    "when a wedged tunnel is unaffordable (e.g. before a "
                    "driver bench run): --max_est 55 runs everything under "
                    "the known siren-500 fault (~73 s) and records the "
                    "skipped probes in the artifact.")
    args = ap.parse_args()
    results = {"probes": [], "skipped": []}
    # (field, steps, expected single-program device seconds @ r4 step times)
    probes = [
        ("mlp", 500, 10),       # known good
        ("siren", 100, 15),     # known good
        ("siren", 200, 29),
        ("mlp", 1500, 30),
        ("siren", 350, 51),
        ("mlp", 2500, 50),
        ("siren", 500, 73),     # known fault
        ("mlp", 4000, 80),      # duration-matched MLP probe
    ]
    for field, steps, est in probes:
        if est > args.max_est:
            results["skipped"].append(
                {"field": field, "steps": steps, "est_device_s": est,
                 "reason": f"est {est}s > --max_est {args.max_est}s "
                 "(fault-wedge risk deliberately not taken)"})
            print(f"{field:5s} steps={steps:5d} (~{est}s program): SKIPPED "
                  f"(--max_est {args.max_est})", flush=True)
            continue
        code = (PROBE.replace("__REPO__", repr(REPO))
                .replace("__FIELD__", repr(field))
                .replace("__STEPS__", str(steps)))
        t0 = time.time()
        p = subprocess.run([sys.executable, "-c", code], capture_output=True,
                           text=True, timeout=1800)
        row = {"field": field, "steps": steps, "est_device_s": est,
               "rc": p.returncode, "wall_s": round(time.time() - t0, 1),
               "stdout_tail": p.stdout[-300:],
               "stderr_tail": p.stderr[-600:] if p.returncode else ""}
        results["probes"].append(row)
        status = "OK" if p.returncode == 0 else f"FAULT rc={p.returncode}"
        print(f"{field:5s} steps={steps:5d} (~{est}s program): {status}",
              flush=True)
        with open(os.path.join(REPO, "docs/siren_fault.json"), "w") as f:
            json.dump(results, f, indent=1)
        if p.returncode != 0:
            print("stopping at first fault (wedge risk); stderr tail:",
                  flush=True)
            print(p.stderr[-600:], flush=True)
            break
    print("wrote docs/siren_fault.json", flush=True)


if __name__ == "__main__":
    main()
