"""Opt-in bf16-packed gradient gather (SPLATJAX_GRAD_GATHER=bf16).

Runs in a subprocess: the flag is read at trace time, and the main test
process must keep its default-f32 traces uncontaminated.
"""
import os
import subprocess
import sys

SCRIPT = r"""
import os
os.environ["SPLATJAX_GRAD_GATHER"] = "bf16"
import jax; jax.config.update("jax_platforms", "cpu")
import jax.numpy as jnp
import numpy as np
from splatjax.ops.binning import segment_sum_by_gid

rng = np.random.default_rng(5)
n, k, c = 50, 400, 16
gid = np.sort(rng.integers(0, n, k)).astype(np.int32)
count = np.bincount(gid, minlength=n).astype(np.int32)
cum = np.cumsum(count).astype(np.int32)
g = rng.normal(size=(c, k)).astype(np.float32)
perm = np.arange(n, dtype=np.int32)
out = np.asarray(segment_sum_by_gid(
    jnp.asarray(g), jnp.asarray(gid), jnp.asarray(cum), jnp.asarray(count),
    jnp.asarray(perm), jnp.asarray(cum.astype(np.float32)),
    jnp.asarray(count.astype(np.float32)), jnp.zeros((), jnp.int32)))
oracle = np.zeros((n, c), np.float32)
mag = np.zeros((n, c), np.float32)
for i in range(k):
    oracle[gid[i]] += g[:, i]
    mag[gid[i]] += np.abs(g[:, i])
err = np.abs(out - oracle)
# each gathered term is bf16-rounded (<= 2^-8 rel) before the f32 sum
assert (err <= 4e-3 * mag + 1e-6).all(), (err / (mag + 1e-6)).max()
print("BF16-GATHER-OK")
"""


def test_bf16_gather_matches_oracle_within_rounding():
    env = dict(os.environ, SPLATJAX_GRAD_GATHER="bf16")
    out = subprocess.run(
        [sys.executable, "-c", SCRIPT], env=env, capture_output=True,
        text=True, timeout=600,
        cwd=os.path.dirname(os.path.dirname(os.path.abspath(__file__))),
    )
    assert "BF16-GATHER-OK" in out.stdout, out.stdout + out.stderr
