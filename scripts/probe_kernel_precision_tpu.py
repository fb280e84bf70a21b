"""On-chip probe: is a Mosaic in-kernel f32 dot_general (precision=
HIGHEST) as accurate as XLA's f32 matmul at 'highest'?  Diagnoses the
whole-sim kernel's 0.07 trajectory deviation (PERF.md round-5): if the
in-kernel matvecs round like bf16 passes instead of f32, the f/h
assembly error is ~1e-3/op, not ~1e-7, and that (not association order)
drives the 6 WB decision flips.

Also probes the lane-batched VPU contraction (jnp.sum(M*x)) used for
Minv — and a one-hot MXU selection — against f64 truth.
"""
import pathlib
import sys
import functools

sys.path.insert(0, str(pathlib.Path(__file__).resolve().parents[1]))

import jax
import jax.numpy as jnp
import numpy as np
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu


def main():
    assert jax.default_backend() != "cpu"
    rng = np.random.default_rng(0)
    K, N, B = 128, 24, 512
    A = rng.standard_normal((N, K)).astype(np.float32)
    X = rng.standard_normal((K, B)).astype(np.float32)
    ref = (A.astype(np.float64) @ X.astype(np.float64))

    dn = (((1,), (0,)), ((), ()))

    def kern(prec, a_ref, x_ref, o_ref):
        o_ref[...] = jax.lax.dot_general(
            a_ref[...], x_ref[...], dn, precision=prec,
            preferred_element_type=jnp.float32)

    out = {}
    for name, prec in (("HIGHEST", jax.lax.Precision.HIGHEST),
                       ("DEFAULT", jax.lax.Precision.DEFAULT)):
        y = pl.pallas_call(
            functools.partial(kern, prec),
            out_shape=jax.ShapeDtypeStruct((N, B), jnp.float32),
        )(jnp.asarray(A), jnp.asarray(X))
        err = np.abs(np.asarray(y, np.float64) - ref).max() / np.abs(ref).max()
        out[f"pallas_{name}"] = float(err)

    for name, prec in (("highest", "highest"), ("default", "default")):
        with jax.default_matmul_precision(prec):
            y = jax.jit(lambda a, x: a @ x)(jnp.asarray(A), jnp.asarray(X))
        err = np.abs(np.asarray(y, np.float64) - ref).max() / np.abs(ref).max()
        out[f"xla_{name}"] = float(err)

    # lane-batched VPU contraction (the Minv pattern): (N,K,B)*(1,K,B)
    M3 = rng.standard_normal((N, K, B)).astype(np.float32) / np.sqrt(K)
    v = rng.standard_normal((K, B)).astype(np.float32)
    ref3 = np.einsum("nkb,kb->nb", M3.astype(np.float64), v.astype(np.float64))

    def kern_sum(m_ref, v_ref, o_ref):
        o_ref[...] = jnp.sum(m_ref[...] * v_ref[...][None, :, :], axis=1)

    y3 = pl.pallas_call(
        kern_sum, out_shape=jax.ShapeDtypeStruct((N, B), jnp.float32),
    )(jnp.asarray(M3), jnp.asarray(v))
    out["pallas_vpu_sum"] = float(
        np.abs(np.asarray(y3, np.float64) - ref3).max() / np.abs(ref3).max())
    y3x = jax.jit(lambda m, v: jnp.einsum("nkb,kb->nb", m, v,
                                          precision="highest"))(
        jnp.asarray(M3), jnp.asarray(v))
    out["xla_vpu_sum"] = float(
        np.abs(np.asarray(y3x, np.float64) - ref3).max() / np.abs(ref3).max())

    for k, vv in out.items():
        print(f"{k:20s} rel_err {vv:.3e}")


if __name__ == "__main__":
    main()
