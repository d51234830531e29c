import numpy as np, time, sys
import jax, jax.numpy as jnp
jax.config.update("jax_compilation_cache_dir", "/root/.jax_cache")
jax.config.update("jax_persistent_cache_min_compile_time_secs", 0.5)
sys.path.insert(0, "/root/repo")
from splatjax.ops.binning import _searchsorted_right_blocked
rng = np.random.default_rng(0)
a = np.sort(rng.integers(0, 3_000_000, 1_000_000)).astype(np.float32)
q = np.arange(0, 3_000_320, 2048).astype(np.float32)
aj, qj = jax.device_put(jnp.asarray(a)), jax.device_put(jnp.asarray(q))
print("data up", flush=True)
f1 = jax.jit(_searchsorted_right_blocked)
f2 = jax.jit(lambda a, q: jnp.searchsorted(a, q, side="right").astype(jnp.int32))
g1 = np.asarray(f1(aj, qj)); print("f1 compiled", flush=True)
g2 = np.asarray(f2(aj, qj)); print("f2 compiled", flush=True)
assert np.array_equal(g1, g2)
for name, f in (("blocked", f1), ("xla-searchsorted", f2)):
    float(f(aj, qj)[0])
    t0 = time.perf_counter()
    for _ in range(20):
        r = f(aj, qj)
    float(r[0]); dt = (time.perf_counter() - t0) / 20
    print(name, f"{dt*1e3:.3f} ms", flush=True)
