"""Probe: does the attached TPU (axon) execute float64 at all, and at
what cost?  Decides the implementation route for TPU-resident
decision-grade band evaluation (VERDICT round-4 item 1):
  * native/emulated f64 supported -> run the band decision loop at f64;
  * unsupported -> software double-float (two-f32) arithmetic path.
Run on the TPU session (JAX_PLATFORMS=axon pinned).
"""
import json
import time

import jax
import jax.numpy as jnp
import numpy as np

out = {"backend": jax.default_backend(),
       "devices": [str(d) for d in jax.devices()]}

jax.config.update("jax_enable_x64", True)

# 1) does an f64 array land on device as f64?
try:
    x = jnp.asarray(np.array([1.0, 2.0], dtype=np.float64))
    out["f64_dtype_on_device"] = str(x.dtype)
except Exception as e:  # noqa: BLE001
    out["f64_dtype_on_device"] = f"ERROR: {e}"

# 2) elementwise chain + matmul + cholesky in f64
for name, fn in [
    ("elementwise", lambda a: jnp.sum(a * a + 3.0 * a - jnp.sqrt(jnp.abs(a)))),
    ("matmul", lambda a: jnp.sum(a @ a)),
    ("cholesky", lambda a: jnp.sum(jnp.linalg.cholesky(
        a @ a.T + 64.0 * jnp.eye(a.shape[0], dtype=a.dtype)))),
    ("divide", lambda a: jnp.sum(a / (a + 1000.0))),
]:
    try:
        a64 = jnp.asarray(np.random.default_rng(0).standard_normal(
            (64, 64)), dtype=jnp.float64)
        r = jax.jit(fn)(a64)
        v = float(r)
        out[f"{name}_f64"] = {"ok": True, "value": v}
    except Exception as e:  # noqa: BLE001
        out[f"{name}_f64"] = {"ok": False, "error": str(e)[:300]}

# 3) precision check: is it real f64 (not silently f32)?
try:
    eps_probe = jax.jit(lambda: jnp.asarray(1.0, jnp.float64)
                        + jnp.asarray(1e-12, jnp.float64)
                        - jnp.asarray(1.0, jnp.float64))()
    out["f64_precision_residual"] = float(eps_probe)  # 1e-12 if true f64, 0 if f32
except Exception as e:  # noqa: BLE001
    out["f64_precision_residual"] = f"ERROR: {e}"

# 4) relative cost f64 vs f32 on an elementwise-chain workload (band-loop-like)
def chain(a, iters):
    def body(c, _):
        c = c * 1.0000001 + 0.5 / (c + 2.0)
        c = jnp.sqrt(jnp.abs(c) + 1e-6)
        return c, None
    c, _ = jax.lax.scan(body, a, None, length=iters)
    return jnp.sum(c)

try:
    for dt, key in [(jnp.float32, "chain_f32_s"), (jnp.float64, "chain_f64_s")]:
        a = jnp.ones((8, 128), dt)
        f = jax.jit(lambda a: chain(a, 2000))
        float(f(a))  # compile+run
        t0 = time.perf_counter()
        for _ in range(3):
            float(f(a))  # axon: scalar readback forces sync
        out[key] = (time.perf_counter() - t0) / 3
    out["f64_over_f32_cost"] = out["chain_f64_s"] / out["chain_f32_s"]
except Exception as e:  # noqa: BLE001
    out["chain_err"] = str(e)[:300]

print(json.dumps(out, indent=1))
