"""One-process TPU validation + measurement session (tunnel warmup is
expensive; do everything in one process).

Order: trivial-op probe -> parity gate (small scene, image + grads) ->
per-stage timings at 1M@1080p -> headline fwd / fwd+bwd.
"""
import os, sys, time, json
sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))
os.environ.setdefault("JAX_COMPILATION_CACHE_DIR", "/root/.jax_cache")
import jax, jax.numpy as jnp
jax.config.update("jax_compilation_cache_dir", "/root/.jax_cache")
jax.config.update("jax_persistent_cache_min_compile_time_secs", 0.5)
import numpy as np

t_start = time.time()
print("probe:", jnp.arange(8).sum(), f"{time.time()-t_start:.1f}s", flush=True)

from splatjax.camera import make_camera
from splatjax.io import synthetic_scene
from splatjax.render import render
from splatjax.reference import render_reference
from splatjax.scene import TrainableGaussians

# ---- parity gate ----
scene = synthetic_scene(3000, seed=5, extent=0.7, scale_range=(0.01, 0.05))
cam = make_camera((0.1, -0.2, 2.4), (0, 0, 0), width=256, height=192)
img = np.asarray(jax.block_until_ready(
    render(scene, cam, early_stop=0.0, alpha_clip=None)))
ref = np.asarray(render_reference(scene, cam))
err = float(np.abs(img - ref).max())
print(f"image max err vs reference: {err:.2e}", flush=True)
assert err < 1e-3, err

params = TrainableGaussians.from_scene(scene)
g = jax.grad(lambda p: jnp.mean(render(p.to_scene(), cam) ** 2))(params)
for name in ("means", "log_scales", "quats", "colors", "logit_opacities"):
    arr = np.asarray(getattr(g, name))
    assert np.isfinite(arr).all(), name
print("grads finite OK", flush=True)

# gradient parity ON HARDWARE: Pallas custom-VJP vs XLA autodiff of the
# pure-JAX reference rasterizer (both on the TPU, small scene)
small = synthetic_scene(400, seed=9, extent=0.6, scale_range=(0.02, 0.07))
scam = make_camera((0, 0, 2.3), (0, 0, 0), width=96, height=64)
sp = TrainableGaussians.from_scene(small)
tgt = jax.random.normal(jax.random.PRNGKey(2), (64, 96, 4))

g_pallas = jax.grad(
    lambda p: jnp.sum(render(p.to_scene(), scam, early_stop=0.0) * tgt)
)(sp)
g_ref = jax.grad(
    lambda p: jnp.sum(render_reference(p.to_scene(), scam) * tgt)
)(sp)
for name in ("means", "log_scales", "quats", "colors", "logit_opacities"):
    a = np.asarray(getattr(g_pallas, name)).ravel()
    r = np.asarray(getattr(g_ref, name)).ravel()
    scale = np.abs(r).max() + 1e-12
    err = np.abs(a - r).max() / scale
    print(f"grad parity {name}: rel {err:.2e}", flush=True)
    assert err < 5e-3, (name, err)
print("grad parity vs XLA autodiff OK", flush=True)

# sparse-cluster scene: drives the ring block-jump path on hardware
rng = np.random.default_rng(7)
centers = np.array([[-0.9, -0.7, 0], [0.9, 0.8, 0], [0.0, 0.0, 0.4]])
means = np.concatenate(
    [c + rng.normal(scale=0.02, size=(60, 3)) for c in centers]
).astype(np.float32)
n2 = means.shape[0]
from splatjax.scene import GaussianScene
qs = rng.normal(size=(n2, 4)).astype(np.float32)
qs /= np.linalg.norm(qs, axis=1, keepdims=True)
sp = GaussianScene(
    means=jnp.asarray(means),
    scales=jnp.asarray(rng.uniform(0.005, 0.02, (n2, 3)).astype(np.float32)),
    quats=jnp.asarray(qs),
    colors=jnp.asarray(rng.uniform(0.1, 1.0, (n2, 3)).astype(np.float32)),
    opacities=jnp.asarray(rng.uniform(0.5, 1.0, n2).astype(np.float32)),
)
cam2 = make_camera((0, 0, 2.5), (0, 0, 0), width=160, height=112)
i2 = np.asarray(render(sp, cam2, early_stop=0.0))
r2 = np.asarray(render_reference(sp, cam2, pixel_chunk=512))
err2 = float(np.abs(i2 - r2).max())
print(f"sparse-cluster (ring jumps) max err: {err2:.2e}", flush=True)
assert err2 < 1e-3, err2
print(f"== parity gate PASSED ({time.time()-t_start:.0f}s) ==", flush=True)

# ---- headline timing at 1M@1080p ----
n = 1_000_000
big = synthetic_scene(n, seed=7, extent=1.0, scale_range=(0.002, 0.008))
bcam = make_camera((0, 0, 2.8), (0, 0, 0), width=1920, height=1080)
bparams = jax.device_put(TrainableGaussians.from_scene(big))
kwargs = dict(capacity=3 * n, alpha_clip=0.999, early_stop=1e-4)

def fwd(p):
    return render(p.to_scene(), bcam, **kwargs)

grad_fn = jax.jit(jax.grad(lambda p: jnp.sum(fwd(p) ** 2)))
fwd_fn = jax.jit(lambda p: fwd(p))

def _sync(x):
    leaf = jax.tree_util.tree_leaves(x)[0]
    return float(jnp.ravel(leaf)[0])

tiny = jax.jit(lambda x: x + 1.0)
tt = jax.device_put(jnp.zeros((8, 128)))
_sync(tiny(tt))
t0 = time.perf_counter()
for _ in range(5):
    _sync(tiny(tt))
rtt = (time.perf_counter() - t0) / 5
print(f"rtt {rtt*1e3:.1f} ms", flush=True)

def timeit(f, *a, iters=10):
    _sync(f(*a))
    times = []
    for _ in range(iters):
        t0 = time.perf_counter()
        _sync(f(*a))
        times.append(time.perf_counter() - t0 - rtt)
    return float(np.median(times)) * 1e3

t_fwd = timeit(fwd_fn, bparams)
print(f"fwd  {t_fwd:.1f} ms  ({1e3/t_fwd:.1f} fps)", flush=True)
t_fb = timeit(grad_fn, bparams)
print(f"fwd+bwd {t_fb:.1f} ms  ({1920*1080/1e6/t_fb*1e3:.1f} Mpix/s)",
      flush=True)
print(json.dumps({"fwd_ms": round(t_fwd, 2), "fwd_bwd_ms": round(t_fb, 2),
                  "total_s": round(time.time() - t_start, 1)}), flush=True)
