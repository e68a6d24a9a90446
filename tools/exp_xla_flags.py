#!/usr/bin/env python
"""XLA:TPU flag sweep over the eval conv stack (VERDICT r3 item 1c).

Times the eval-mode R50 backbone (batch 32 @832x1344) in a fresh subprocess
per XLA_FLAGS candidate (flags are read once at backend init). Unknown flags
make XLA abort — those rows report FAIL and are dropped from consideration.

Usage: python tools/exp_xla_flags.py
"""

import os
import subprocess
import sys

WORKLOAD = r"""
import time
import jax, jax.numpy as jnp
from mxdetection_tpu.models.backbones.resnet import ResNet
model = ResNet(depth=50, train=False)
x = jnp.zeros((32, 832, 1344, 3), jnp.bfloat16)
v = model.init(jax.random.PRNGKey(0), x[:1])
f = jax.jit(lambda v, x: jnp.sum(model.apply(v, x)[-1].astype(jnp.float32)))
jax.device_get(f(v, x)); jax.device_get(f(v, x))
t0 = time.perf_counter()
jax.device_get([f(v, x) for _ in range(20)])
print(f"RESULT {(time.perf_counter() - t0) / 20 * 1000:.2f} ms")
"""

CANDIDATES = [
    ("baseline", ""),
    ("latency_hiding_sched", "--xla_tpu_enable_latency_hiding_scheduler=true"),
    ("scoped_vmem_64M", "--xla_tpu_scoped_vmem_limit_kib=65536"),
    ("scoped_vmem_96M", "--xla_tpu_scoped_vmem_limit_kib=98304"),
    ("no_rwb_fusion", "--xla_tpu_rwb_fusion=false"),
    ("aggressive_opt", "--xla_backend_optimization_level=3"),
]


def main():
    env_base = dict(os.environ)
    repo = os.path.join(os.path.dirname(__file__), "..")
    for name, flags in CANDIDATES:
        env = dict(env_base)
        if flags:
            env["XLA_FLAGS"] = (env.get("XLA_FLAGS", "") + " " + flags).strip()
        r = subprocess.run([sys.executable, "-c", WORKLOAD], env=env,
                           cwd=repo, capture_output=True, text=True,
                           timeout=900)
        line = [l for l in r.stdout.splitlines() if l.startswith("RESULT")]
        if r.returncode == 0 and line:
            print(f"{name:<24} {line[0].split()[1]:>8} ms   [{flags}]")
        else:
            tail = (r.stderr or r.stdout).strip().splitlines()[-1:]
            print(f"{name:<24}     FAIL   [{flags}] {tail}")


if __name__ == "__main__":
    main()
